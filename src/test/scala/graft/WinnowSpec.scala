package graft

import graft.ops.{TextOps, Winnow}
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSuite {
  import spark.implicits._

  private def fps(docs: Seq[(String, String)], k: Int = 5, w: Int = 4) =
    Winnow.fingerprints(docs.toDF("id", "text"), "id", "text", k, w)
      .as[(String, Int, Long)].collect()

  private val words = (i: Int) => s"w$i"
  private def doc(n: Int, seed: Int): String =
    (0 until n).map(i => words((i * 7 + seed * 13) % 50)).mkString(" ")

  test("winnowing guarantee: consecutive selected positions are at most " +
    "w apart, and every full window selects something") {
    val text = doc(120, 1)
    val sel = fps(Seq(("d", text))).sortBy(_._2)
    assert(sel.nonEmpty)
    val poss = sel.map(_._2)
    assert(poss.head <= 4) // first window covered
    poss.sliding(2).foreach { case Array(a, b) =>
      assert(b - a <= 4, s"gap $a→$b exceeds w")
    }
    // last window covered: n_grams = 120-5+1 = 116; last window start 113
    assert(poss.last >= 113)
  }

  test("engine equals an independent sequential replay (rightmost-min " +
    "rule) on a repetitive document") {
    val text = (0 until 60).map(i => words(i % 7)).mkString(" ")
    val k = 5; val w = 4
    val toks = text.split("\\s+")
    def phash(s: String): Long = {
      var h = 0L; s.foreach(c => h = (h * 31 + c.toLong) % 2147483647L); h
    }
    val grams = (0 to toks.length - k)
      .map(i => (i + 1, phash(toks.slice(i, i + k).mkString(" "))))
    val expect = (0 to grams.length - w).flatMap { j =>
      val win = grams.slice(j, j + w)
      val mh = win.map(_._2).min
      Some(win.filter(_._2 == mh).maxBy(_._1)) // rightmost minimal
    }.distinct.toSet
    val got = fps(Seq(("d", text)), k, w).map(r => (r._2, r._3)).toSet
    assert(got == expect)
  }

  test("copy detection: a shared run of >= w+k-1 tokens guarantees a " +
    "shared fingerprint; disjoint docs share nothing") {
    val shared = (0 until 12).map(i => s"c$i").mkString(" ") // 12 ≥ 4+5-1
    val a = doc(40, 2) + " " + shared + " " + doc(40, 3)
    val b = doc(35, 4) + " " + shared + " " + doc(30, 5)
    val f = Winnow.fingerprints(
      Seq(("a", a), ("b", b)).toDF("id", "text"), "id", "text", 5, 4)
    val m = Winnow.matches(f, minShared = 1)
      .as[(String, String, Long)].collect()
    assert(m.exists(r => r._1 == "a" && r._2 == "b" && r._3 >= 1))
    val disjointA = (0 until 30).map(i => s"x$i").mkString(" ")
    val disjointB = (0 until 30).map(i => s"y$i").mkString(" ")
    val f2 = Winnow.fingerprints(
      Seq(("a", disjointA), ("b", disjointB)).toDF("id", "text"),
      "id", "text", 5, 4)
    assert(Winnow.matches(f2, 1).count() == 0)
  }

  test("short/empty documents: below k tokens no grams; below k+w-1 no " +
    "full window; nulls don't crash") {
    val f = Winnow.fingerprints(
      Seq(("tiny", "a b c"), ("short", "a b c d e f"), ("nul", null),
        ("ok", (0 until 10).map("t" + _).mkString(" ")))
        .toDF("id", "text"), "id", "text", 5, 4)
      .as[(String, Int, Long)].collect()
    val byId = f.groupBy(_._1)
    assert(!byId.contains("tiny") && !byId.contains("nul"))
    assert(!byId.contains("short")) // 6 tokens → 2 grams < w, no window
    assert(byId.contains("ok"))     // 10 tokens → 6 grams → 3 windows
  }
}
