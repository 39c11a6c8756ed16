package graft

import graft.metrics.Calibration

class CalibrationSpec extends SparkSuite {
  import spark.implicits._

  private def rel(rows: Seq[(Double, Boolean)], bins: Int = 10) =
    Calibration.reliability(rows.toDF("conf", "ok"), "conf", "ok", bins)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("hand-computed bins: means, accuracy, and gaps in micro-units") {
    val rows = Seq((0.82, true), (0.86, true), (0.84, false), // bin 8
      (0.15, false), (0.15, true)) // bin 1
    val out = rel(rows)
    // bin 8: conf_avg = (820000+860000+840000) div 3 = 840000; acc = 2/3
    assert(out(8) == (3L, 840000L, 666666L, 840000L - 666666L))
    assert(out(1) == (2L, 150000L, 500000L, 350000L))
  }

  test("conf = 1.0 clamps into the top bin; perfect calibration gap is 0") {
    val out = rel(Seq((1.0, true), (0.95, true)), bins = 10)
    assert(out.keySet == Set(9))
    assert(out(9) == (2L, 975000L, 1000000L, 25000L))
    val perfect = Seq.fill(4)((0.5, true)) ++ Seq.fill(4)((0.5, false))
    assert(rel(perfect)(5)._4 == 0L)
  }

  test("ece is the n-weighted gap — exact integer, layout-independent") {
    val rows = (0 until 400).map(i =>
      ((i % 100) / 100.0, (i * 7) % 10 < 4)) // 40% accuracy everywhere
    val a = Calibration.ece(rows.toDF("conf", "ok").repartition(1), "conf", "ok")
    val b = Calibration.ece(rows.toDF("conf", "ok").repartition(13), "conf", "ok")
    assert(a == b && a > 0)
  }

  test("nulls drop; out-of-range confidence fails loudly") {
    val withNulls = Seq((Some(0.5), Some(true)), (None, Some(true)),
      (Some(0.5), None)).toDF("conf", "ok")
    assert(Calibration.reliability(withNulls, "conf", "ok").head().getLong(1) == 1L)
    val bad = Seq((1.5, true)).toDF("conf", "ok")
    intercept[Exception] {
      Calibration.reliability(bad, "conf", "ok").collect()
    }
  }

  test("quantile normalization: sources map onto one ppm grid") {
    import org.apache.spark.sql.functions.col
    // source A scores 10/20/30, source B scores 1000/9999
    val df = Seq(("A", 1L, 10.0), ("A", 2L, 20.0), ("A", 3L, 30.0),
      ("B", 4L, 1000.0), ("B", 5L, 9999.0), ("C", 6L, 7.0))
      .toDF("src", "id", "score")
    val out = Calibration.quantileNormalize(df, "src", "id", "score")
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(out(1L) == 0L && out(2L) == 500000L && out(3L) == 1000000L)
    assert(out(4L) == 0L && out(5L) == 1000000L)
    assert(out(6L) == 0L) // singleton source
    // ties get distinct adjacent quantiles via the id tiebreak
    val ties = Seq(("A", 1L, 5.0), ("A", 2L, 5.0), ("A", 3L, 5.0))
      .toDF("src", "id", "score")
    val t = Calibration.quantileNormalize(ties, "src", "id", "score")
      .as[(String, Long, Double, Long)].collect().map(r => r._2 -> r._4).toMap
    assert(t == Map(1L -> 0L, 2L -> 500000L, 3L -> 1000000L))
    // null scores drop
    val n = Calibration.quantileNormalize(
      Seq(("A", 1L, Some(1.0)), ("A", 2L, None)).toDF("src", "id", "score"),
      "src", "id", "score").count()
    assert(n == 1L)
  }
}
