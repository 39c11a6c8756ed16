package graft

import graft.metrics.BlockingEval

class BlockingEvalSpec extends SparkSuite {
  import spark.implicits._

  private case class Score(nEnt: Long, total: Long, cand: Long, dcand: Long,
      gold: Long, covered: Long, rr: Option[Double], pc: Option[Double],
      pq: Option[Double])

  private def score(blocks: Seq[(String, String)], gold: Seq[(String, String)]): Score = {
    val r = BlockingEval.evaluate(
      blocks.toDF("id", "block"), gold.toDF("a", "b")).head()
    Score(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5),
      if (r.isNullAt(6)) None else Some(r.getDouble(6)),
      if (r.isNullAt(7)) None else Some(r.getDouble(7)),
      if (r.isNullAt(8)) None else Some(r.getDouble(8)))
  }

  test("hand-computed scorecard: 4 entities, 2 blocks, 2 gold pairs") {
    // blocks {a,b,c} and {c,d}: candidates {ab,ac,bc,cd}; total C(4,2)=6
    val blocks = Seq("a" -> "B1", "b" -> "B1", "c" -> "B1", "c" -> "B2", "d" -> "B2")
    // gold: (a,b) covered, (a,d) NOT covered
    val s = score(blocks, Seq("a" -> "b", "a" -> "d"))
    assert(s == Score(4, 6, 4, 4, 2, 1,
      Some(0.333333), Some(0.5), Some(0.25))) // rr rounded to 6 dp
  }

  test("multi-block pair counts once in distinct_candidates, per-block in candidate_pairs") {
    // x,y share BOTH blocks: Σ C(n_b,2) = 2, distinct = 1
    val blocks = Seq("x" -> "B1", "y" -> "B1", "x" -> "B2", "y" -> "B2")
    val s = score(blocks, Seq("x" -> "y"))
    assert(s.cand == 2 && s.dcand == 1 && s.pc.contains(1.0) && s.pq.contains(1.0))
  }

  test("perfect blocking: RR high, PC = 1; empty gold yields null PC") {
    val blocks = (0 until 100).map(i => (s"e$i", s"blk${i / 2}"))
    val gold = (0 until 100 by 2).map(i => (s"e$i", s"e${i + 1}"))
    val s = score(blocks, gold)
    assert(s.total == 4950 && s.dcand == 50)
    assert(s.rr.contains(0.989899) && s.pc.contains(1.0) && s.pq.contains(1.0))
    assert(score(blocks, Seq.empty[(String, String)]).pc.isEmpty)
  }

  test("unordered gold: reversed and duplicate pairs collapse; self-pairs drop") {
    val blocks = Seq("a" -> "B", "b" -> "B")
    val s = score(blocks, Seq("b" -> "a", "a" -> "b", "a" -> "a"))
    assert(s.gold == 1 && s.covered == 1)
  }
}
