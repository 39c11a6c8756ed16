package graft

import graft.ops.{Profile, Trend}

class DriftDiversitySpec extends SparkSuite {
  import spark.implicits._

  test("gini-simpson: hand value 2+2 split = 666667 ppm; monoculture 0; " +
    "all-distinct 10^6; singleton null") {
    val rows = Seq(("g", "a"), ("g", "a"), ("g", "b"), ("g", "b"),
      ("m", "x"), ("m", "x"), ("m", "x"),
      ("u", "p"), ("u", "q"), ("u", "r"),
      ("s", "only"))
    val got = Profile.diversity(rows.toDF("grp", "cat"), "grp", "cat")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 4L, 2L, Some(666667L)))) // 1e6 - 4e6 div 12
    assert(got("m")._4.contains(0L))
    assert(got("u")._4.contains(1000000L))
    assert(got("s")._4.isEmpty)
  }

  test("chi-square drift: identical mixes score 0; a swapped mix scores " +
    "the hand-computed ppt; smoothing handles unseen categories") {
    def run(o: Seq[String], r: Seq[String]) =
      Trend.chiSquareDrift(o.toDF("cat"), r.toDF("cat"), "cat")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val same = run(Seq.fill(10)("a"), Seq.fill(10)("a"))
    assert(same.length == 1 && same.head._7 == 0L)
    // observed all-a vs reference all-b: union {a,b}, r_a=1, r_b=11,
    // n_o=10, n_r=12; term_a = 110²·1000 div 120 = 100833,
    // term_b = 110²·1000 div 1320 = 9166 → chi2 = 109999 ppt
    val moved = run(Seq.fill(10)("a"), Seq.fill(10)("b"))
      .map(r => r._1 -> r).toMap
    assert(moved("a")._4 == 100833L && moved("b")._4 == 9166L)
    assert(moved("a")._7 == 109999L)
    // mild drift scores well below the full swap
    val mild = run(Seq.fill(6)("a") ++ Seq.fill(4)("b"),
      Seq.fill(5)("a") ++ Seq.fill(5)("b"))
    assert(mild.head._7 < 20000L)
  }

  test("chi-square is order/layout independent (integer terms, exact " +
    "long sum)") {
    val o = (0 until 300).map(i => s"c${i % 7}")
    val r = (0 until 400).map(i => s"c${(i * 3) % 9}")
    val a = Trend.chiSquareDrift(o.toDF("cat"), r.toDF("cat"), "cat")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val b = Trend.chiSquareDrift(o.reverse.toDF("cat").repartition(13),
        r.toDF("cat").repartition(5), "cat")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
