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
}
