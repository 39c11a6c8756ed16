package graft

import graft.ops.Mmr
import org.apache.spark.sql.functions.col

class MmrSpec extends SparkSuite {
  import spark.implicits._

  private def run(docs: Seq[(String, String)], query: String, k: Int,
      parts: Int = 3): Seq[(Long, String, Long, Long, Long)] = {
    val tok = docs.flatMap { case (d, t) =>
      t.split("\\s+").filter(_.nonEmpty).map(w => (d, w))
    }
    Mmr.select(tok.toDF("id", "w").repartition(parts), col("id"), col("w"),
      query.split("\\s+").filter(_.nonEmpty).toSeq.toDF("w"), col("w"), k)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
  }

  /** Independent reference: plain sequential greedy over Scala sets. */
  private def naive(docs: Seq[(String, String)], query: String,
      k: Int): Seq[(Long, String, Long, Long, Long)] = {
    val toks = docs.map { case (d, t) =>
      d -> t.split("\\s+").filter(_.nonEmpty).toSet
    }.toMap
    val q = query.split("\\s+").filter(_.nonEmpty).toSet
    val chosen = scala.collection.mutable.ArrayBuffer.empty[String]
    val ms = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Long)]
    for (r <- 1 to math.min(k, toks.size)) {
      val cands = toks.keys.filterNot(chosen.contains).toSeq
      val best = cands.map { d =>
        val rel = (toks(d) & q).size.toLong
        (rel - ms(d), d)
      }.sortBy { case (s, d) => (-s, d) }.head
      val d = best._2
      val rel = (toks(d) & q).size.toLong
      out += ((r.toLong, d, rel, ms(d), rel - ms(d)))
      chosen += d
      for (c <- cands if c != d)
        ms(c) = math.max(ms(c), (toks(c) & toks(d)).size.toLong)
    }
    out.toSeq
  }

  test("first pick is pure relevance; near-duplicate is demoted") {
    val docs = Seq(
      ("a", "x y z w"),      // rel 4
      ("b", "x y z v"),      // rel 3, near-dup of a (sim 3 -> score 0)
      ("c", "u p q"))        // rel 1, disjoint from a (score stays 1)
    val got = run(docs, "x y z w u", 3)
    assert(got.map(_._2) === Seq("a", "c", "b"))
    assert(got.head === ((1L, "a", 4L, 0L, 4L)))
    assert(got(1) === ((2L, "c", 1L, 0L, 1L)))
    assert(got(2) === ((3L, "b", 3L, 3L, 0L)))
  }

  test("ties break to the smallest id (string ids: lexicographic)") {
    val docs = Seq(("d2", "x"), ("d1", "x"), ("d3", "y"))
    val got = run(docs, "x", 2)
    assert(got(0)._2 === "d1")
  }

  test("integral ids break ties numerically (10 after 2)") {
    val tok = Seq((2L, "x"), (10L, "x"), (9L, "y"))
      .toDF("id", "w")
    val got = Mmr.select(tok, col("id"), col("w"),
      Seq("x").toDF("w"), col("w"), 3)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0)._2 === "2")
  }

  test("k beyond corpus size returns every doc once") {
    val got = run(Seq(("a", "x"), ("b", "y")), "x", 10)
    assert(got.map(_._2).sorted === Seq("a", "b"))
  }

  test("parity with the sequential greedy on random corpora") {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 3) {
      val docs = (0 until 25).map { i =>
        (f"d$i%02d", Seq.fill(3 + rnd.nextInt(10))(
          vocab(rnd.nextInt(vocab.size))).distinct.mkString(" "))
      }
      val query = Seq.fill(4)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")
      assert(run(docs, query, 8, parts = 4) === naive(docs, query, 8),
        s"trial $trial")
    }
  }
}
