package graft

import graft.ops.Curation

class SkylineSpec extends SparkSuite {
  import spark.implicits._

  test("frontier = exactly the non-dominated points") {
    // (1,9) (3,7) (5,5) frontier; (2,6) dominated by (3,7); (3,3) by (5,5)
    val df = Seq((1, 9), (3, 7), (5, 5), (2, 6), (3, 3), (0, 0))
      .toDF("x", "y")
    val out = Curation.skyline(df, "x", "y")
      .as[(Int, Int, Long)].collect().map { case (x, y, _) => (x, y) }.toSet
    assert(out == Set((1, 9), (3, 7), (5, 5)))
  }

  test("equal-x keeps only the max y; n_rows counts exact-point multiplicity") {
    val df = Seq((1, 5), (1, 9), (1, 9), (2, 3)).toDF("x", "y")
    val out = Curation.skyline(df, "x", "y")
      .as[(Int, Int, Long)].collect().toSet
    assert(out == Set((1, 9, 2L), (2, 3, 1L)))
  }

  test("a point dominating on both axes collapses the frontier to itself") {
    val df = Seq((10, 10), (1, 9), (9, 1), (5, 5)).toDF("x", "y")
    val out = Curation.skyline(df, "x", "y")
      .as[(Int, Int, Long)].collect().toSet
    assert(out == Set((10, 10, 1L)))
  }

  test("ties on one axis at the frontier: equal y at different x both survive") {
    // dominance needs a STRICT win somewhere: (1,5) vs (2,5) -> (2,5)
    // dominates (1,5) (x strictly better, y equal)
    val df = Seq((1, 5), (2, 5)).toDF("x", "y")
    val out = Curation.skyline(df, "x", "y")
      .as[(Int, Int, Long)].collect().toSet
    assert(out == Set((2, 5, 1L)))
  }

  test("matches a naive driver dominance scan on pseudo-random points") {
    val pts = (1 to 300).map { i =>
      val x = (i * 48271 % 97).toInt; val y = (i * 69621 % 89).toInt
      (x, y)
    }
    val naive = {
      val d = pts.distinct
      d.filter { case (x, y) => !d.exists { case (a, b) =>
        a >= x && b >= y && (a > x || b > y) } }.toSet
    }
    val out = Curation.skyline(pts.toDF("x", "y").repartition(7), "x", "y")
      .as[(Int, Int, Long)].collect().map { case (x, y, _) => (x, y) }.toSet
    assert(out == naive)
    // n_rows agrees with exact-point multiplicity
    val counts = pts.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val full = Curation.skyline(pts.toDF("x", "y"), "x", "y")
      .as[(Int, Int, Long)].collect()
    full.foreach { case (x, y, n) => assert(counts((x, y)) == n) }
  }

  test("null coordinates drop") {
    val df = Seq((Some(1), Some(2)), (None, Some(9)), (Some(9), None))
      .toDF("x", "y")
    val out = Curation.skyline(df, "x", "y")
      .as[(Int, Int, Long)].collect().toSet
    assert(out == Set((1, 2, 1L)))
  }
}
