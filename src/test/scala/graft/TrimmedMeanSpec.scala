package graft

import graft.ops.Profile

class TrimmedMeanSpec extends SparkSuite {
  import spark.implicits._

  private def tm(rows: Seq[(String, Long)], trim: Double) =
    Profile.trimmedMean(rows.toDF("g", "v"), Seq("g"), "v", trim)
      .as[(String, Long, Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("an outlier drags avg but not the trimmed mean") {
    val rows = (1L to 9L).map(v => ("g", v)) :+ ("g", 1000000L)
    val out = tm(rows, 0.1) // n=10, k=1: drop min (1) and max (1e6)
    assert(out("g") == (10L, 8L, Some((2L to 9L).sum), Some(5.5)))
  }

  test("hand case: k = floor(n*trim), both tails dropped") {
    val rows = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(("g", _))
    // trim 0.25, n=6 -> k=1: keep 2..5 -> mean 3.5
    assert(tm(rows, 0.25)("g") == (6L, 4L, Some(14L), Some(3.5)))
    // trim 0 keeps everything
    assert(tm(rows, 0.0)("g") == (6L, 6L, Some(21L), Some(3.5)))
  }

  test("over-trimmed tiny groups report null mean; groups are independent") {
    val rows = Seq(("small", 7L), ("small", 9L), ("big", 1L), ("big", 2L),
      ("big", 3L), ("big", 100L))
    val out = tm(rows, 0.49) // small: n=2, k=0 -> kept; big: n=4, k=1
    assert(out("small") == (2L, 2L, Some(16L), Some(8.0)))
    assert(out("big") == (4L, 2L, Some(5L), Some(2.5)))
    val overs = tm(Seq(("g", 1L), ("g", 2L)), 0.0) // sanity full keep
    assert(overs("g")._4.contains(1.5))
  }

  test("ties among equal values cannot change the mean; layout invariant") {
    val rows = (0 until 200).map(i => ("g", (i % 5).toLong + 1))
    val df1 = rows.toDF("g", "v").repartition(1)
    val df9 = rows.toDF("g", "v").repartition(9)
    val a = Profile.trimmedMean(df1, Seq("g"), "v", 0.2)
      .as[(String, Long, Long, Option[Long], Option[Double])].collect().toSet
    val b = Profile.trimmedMean(df9, Seq("g"), "v", 0.2)
      .as[(String, Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(a == b)
  }
}
