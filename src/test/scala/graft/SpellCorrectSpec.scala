package graft

import graft.functions.Damerau
import graft.link.SpellCorrect
import org.apache.spark.sql.functions.col

class SpellCorrectSpec extends SparkSuite {
  import spark.implicits._

  private def engine(toks: Seq[String], dict: Seq[(String, Long)],
      maxDist: Int = 2, maxLen: Int = 24): Map[String, (String, Int, Long)] =
    SpellCorrect.symspell(
      toks.toDF("t").repartition(3), col("t"),
      dict.toDF("w", "f").repartition(2), col("w"), col("f"),
      maxDist, maxLen)
      .as[(String, String, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  /** Independent reference: the full cross join, verified with the same
    * public distance function, same total order. */
  private def brute(toks: Seq[String], dict: Seq[(String, Long)],
      maxDist: Int): Map[String, (String, Int, Long)] = {
    val terms = dict.groupMapReduce(_._1)(_._2)(_ max _).toSeq
    toks.distinct.flatMap { t =>
      val cands = terms.map { case (w, f) => (Damerau.distance(t, w), w, f) }
        .filter(_._1 <= maxDist)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy { case (d, w, f) => (d, -f, w) }
        Some(t -> ((best._2, best._1, best._3)))
      }
    }.toMap
  }

  test("deletion-neighborhood blocking loses nothing vs the cross join") {
    val rnd = new scala.util.Random(13)
    val alpha = "abcde"
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(5))).mkString
    val dict = (0 until 40).map(_ => word(3 + rnd.nextInt(6)))
      .distinct.map(w => (w, rnd.nextInt(100).toLong + 1))
    val toks = (0 until 60).map(_ => word(2 + rnd.nextInt(8)))
    assert(engine(toks, dict) === brute(toks, dict, 2))
  }

  test("hand anchors: transposition=1, substitution=1, two edits, miss") {
    val dict = Seq(("receive", 50L), ("invoice", 80L), ("total", 20L))
    val got = engine(Seq("recieve", "invoide", "ttoal", "recceve", "zzzzzz"),
      dict)
    assert(got("recieve") === (("receive", 1, 50L))) // one transposition
    assert(got("invoide") === (("invoice", 1, 80L))) // one substitution
    assert(got("ttoal") === (("total", 1, 20L))) // t[to]al -> t[ot]al
    assert(got("recceve") === (("receive", 2, 50L))) // two substitutions
    assert(!got.contains("zzzzzz"))
  }

  test("tie-break: distance first, then frequency, then term order") {
    // "cat" is 1 edit from both; higher-freq wins
    val got = engine(Seq("cat"), Seq(("cab", 5L), ("car", 90L), ("cart", 2L)))
    assert(got("cat") === (("car", 1, 90L)))
    // equal freq -> lexicographic term
    val got2 = engine(Seq("cat"), Seq(("cab", 7L), ("car", 7L)))
    assert(got2("cat") === (("cab", 1, 7L)))
    // exact dictionary hit beats any 1-edit neighbor regardless of freq
    val got3 = engine(Seq("car"), Seq(("car", 1L), ("cart", 999L)))
    assert(got3("car") === (("car", 0, 1L)))
  }

  test("duplicate dict rows keep max frequency; full-DL discriminator pair") {
    val got = engine(Seq("ca"), Seq(("abc", 3L), ("abc", 9L)))
    // full Damerau: DL(ca, abc) = 2 (OSA would say 3) — must be found
    assert(got("ca") === (("abc", 2, 9L)))
  }

  test("over-long strings dropped WITH accounting") {
    val long = "x" * 30
    val (got, warns) = Audit.capturing {
      engine(Seq(long, "cat"), Seq(("cat", 1L), (long, 5L)), maxLen = 24)
    }
    assert(got === Map("cat" -> (("cat", 0, 1L))))
    assert(warns.count(_.contains("longer than maxLen")) === 2, warns)
    val (_, quiet) = Audit.capturing {
      engine(Seq("cat"), Seq(("cat", 1L)), maxLen = 24)
    }
    assert(!quiet.exists(_.contains("longer than maxLen")), quiet)
  }
}
