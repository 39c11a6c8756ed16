package graft

import graft.link.PhraseSpot
import org.apache.spark.sql.functions.col

class PhraseSpotSpec extends SparkSuite {
  import spark.implicits._

  private def run(docs: Seq[(String, String)], dict: Seq[String],
      parts: Int = 3): Set[(String, Long, Long, String)] =
    PhraseSpot.spot(
      docs.toDF("doc_id", "text").repartition(parts),
      col("doc_id"), col("text"), dict.toDF("phrase"))
      .as[(String, Long, Long, String)].collect().toSet

  /** Independent reference: the textbook sequential scanner — walk each
    * document token by token, at each position try the dictionary longest
    * first, jump past a hit (no n-grams, no joins, no folds). */
  private def naive(docs: Seq[(String, String)],
      dict: Seq[String]): Set[(String, Long, Long, String)] = {
    val keys = dict.map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+").toSeq).distinct
    val byLen = keys.map(k => k -> k.mkString(" ")).toMap
    val lens = keys.map(_.length).distinct.sorted.reverse
    val out = scala.collection.mutable.Set.empty[(String, Long, Long, String)]
    for ((id, text) <- docs if text != null && text.trim.nonEmpty) {
      val w = text.trim.split("\\s+").toSeq
      var i = 0
      while (i < w.length) {
        lens.find(l => i + l <= w.length && byLen.contains(w.slice(i, i + l))) match {
          case Some(l) =>
            out += ((id, (i + 1).toLong, l.toLong, w.slice(i, i + l).mkString(" ")))
            i += l
          case None => i += 1
        }
      }
    }
    out.toSet
  }

  private val dict = Seq("sort merge join", "merge join", "hash join",
    "table scan", "scan merge", "batch batch batch", "batch batch",
    "window window", "key order sort", "order sort")

  test("nested phrase: longest at a position wins") {
    val docs = Seq(("d1", "the sort merge join is fast"))
    val got = run(docs, dict)
    assert(got === Set(("d1", 2L, 3L, "sort merge join")))
  }

  test("consumed tokens suppress overlapping later candidates") {
    // "table scan merge": leftmost "table scan" consumes "scan", so
    // "scan merge" (which would start inside it) must not fire
    val got = run(Seq(("d1", "a table scan merge join b")), dict)
    // after "table scan" the cursor is at "merge" -> "merge join" fires
    assert(got === Set(("d1", 2L, 2L, "table scan"), ("d1", 4L, 2L, "merge join")))
  }

  test("adjacent and repeated matches all emitted") {
    val got = run(Seq(("d1", "hash join hash join batch batch batch")), dict)
    assert(got === Set(
      ("d1", 1L, 2L, "hash join"), ("d1", 3L, 2L, "hash join"),
      ("d1", 5L, 3L, "batch batch batch")))
  }

  test("leftmost-longest on the batch run: 5 batches = 3-gram + 2-gram") {
    val got = run(Seq(("d1", "batch batch batch batch batch x")), dict)
    assert(got === Set(
      ("d1", 1L, 3L, "batch batch batch"), ("d1", 4L, 2L, "batch batch")))
  }

  test("no-match documents produce no rows; empty dict matches nothing") {
    assert(run(Seq(("d1", "nothing here"), ("d2", "")), dict).isEmpty)
    assert(run(Seq(("d1", "hash join")), Seq.empty).isEmpty)
    assert(run(Seq(("d1", "hash join")), Seq("", "   ")).isEmpty)
  }

  test("whitespace normalization: multi-space text and phrases match") {
    val got = run(Seq(("d1", "a  hash   join b")), Seq("  hash  join "))
    assert(got === Set(("d1", 2L, 2L, "hash join")))
  }

  test("parity with the sequential scanner on a generated corpus") {
    val vocab = Vector("the", "sort", "merge", "join", "hash", "table",
      "scan", "batch", "window", "key", "order", "small", "agg")
    val rnd = new scala.util.Random(42)
    val docs = (0 until 120).map { i =>
      (f"doc$i%03d", Seq.fill(5 + rnd.nextInt(60))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = run(docs, dict, parts = 7)
    val want = naive(docs, dict)
    assert(want.nonEmpty, "fixture must actually contain matches")
    assert(got === want)
  }

  test("single-token phrases spot like keywords") {
    val got = run(Seq(("d1", "alpha beta gamma beta")), Seq("beta", "beta gamma"))
    // at pos 2 the 2-gram wins; the trailing lone "beta" still fires
    assert(got === Set(("d1", 2L, 2L, "beta gamma"), ("d1", 4L, 1L, "beta")))
  }
}
