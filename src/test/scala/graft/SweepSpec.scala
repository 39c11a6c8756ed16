package graft

import graft.metrics.Sweep
import org.apache.spark.sql.functions.col

class SweepSpec extends SparkSuite {
  import spark.implicits._

  private def engine(scored: Seq[(String, String, Long)],
      gold: Seq[(String, String)])
      : Map[Long, (Long, Long, Long, Long, Option[Long], Option[Long])] =
    Sweep.thresholdSweep(
      scored.toDF("a", "b", "s").repartition(3), col("a"), col("b"), col("s"),
      gold.toDF("x", "y").repartition(2), col("x"), col("y"))
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  /** Independent reference: loops per threshold. */
  private def brute(scored: Seq[(String, String, Long)],
      gold: Seq[(String, String)])
      : Map[Long, (Long, Long, Long, Long, Option[Long], Option[Long])] = {
    def nrm(a: String, b: String) = if (a < b) (a, b) else (b, a)
    val s = scored.groupMapReduce(p => nrm(p._1, p._2))(_._3)(_ max _)
    val g = gold.map(p => nrm(p._1, p._2)).toSet
    val thresholds = s.values.toSeq.distinct
    thresholds.map { t =>
      val pred = s.filter(_._2 >= t).keySet
      val tp = (pred & g).size.toLong
      val fp = pred.size - tp
      val fn = g.size - tp
      val p = BigInt(1000000) * tp / (tp + fp)
      val r = if (g.nonEmpty) Some((BigInt(1000000) * tp / g.size).toLong)
        else None
      val f1 = if (g.nonEmpty)
        Some((BigInt(2000000) * tp / (2 * tp + fp + fn)).toLong) else None
      t -> ((tp, fp, fn, p.toLong, r, f1))
    }.toMap
  }

  test("hand curve: knee where precision trades against recall") {
    val scored = Seq(("a", "b", 90L), ("c", "d", 80L), ("e", "f", 70L),
      ("g", "h", 60L))
    val gold = Seq(("a", "b"), ("c", "d"), ("q", "z")) // one never scored
    val got = engine(scored, gold)
    assert(got === brute(scored, gold))
    // at 90: P=1, R=1/3; at 80: P=1, R=2/3 (the knee); at 70: P=2/3
    assert(got(90L) === ((1L, 0L, 2L, 1000000L, Some(333333L), Some(500000L))))
    assert(got(80L) === ((2L, 0L, 1L, 1000000L, Some(666666L), Some(800000L))))
    assert(got(70L)._4 === 666666L)
    // the never-scored gold pair stays FN at EVERY threshold
    assert(got.values.forall(_._3 >= 1L))
  }

  test("ties enter together; duplicate scored pairs keep max score") {
    val scored = Seq(("a", "b", 50L), ("c", "d", 50L), ("b", "a", 30L),
      ("e", "f", 50L))
    val got = engine(scored, Seq(("a", "b"), ("c", "d")))
    // (a,b) dedupes to score 50; threshold 50 admits all three at once
    assert(got.keySet === Set(50L))
    assert(got(50L) === ((2L, 1L, 0L, 666666L, Some(1000000L),
      Some(800000L))))
  }

  test("brute parity on random scored graphs; empty gold nulls r/f1") {
    val rnd = new scala.util.Random(83)
    val vs = (0 until 20).map(i => f"v$i%02d")
    val scored = (0 until 60).map(_ => (vs(rnd.nextInt(20)),
      vs(rnd.nextInt(20)), rnd.nextInt(10).toLong * 100))
      .filter(p => p._1 != p._2)
    val gold = (0 until 20).map(_ => (vs(rnd.nextInt(20)),
      vs(rnd.nextInt(20)))).filter(p => p._1 != p._2)
    assert(engine(scored, gold) === brute(scored, gold))
    val none = engine(scored, Seq.empty)
    assert(none === brute(scored, Seq.empty))
    assert(none.values.forall(v => v._5.isEmpty && v._6.isEmpty))
  }
}
