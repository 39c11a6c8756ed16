package graft

import graft.ops.Resample
import java.sql.Timestamp

class ResampleSpec extends SparkSuite {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2026-03-01 $h%02d:$m%02d:00")

  private def fill(rows: (String, Timestamp, Double)*) =
    Resample.locf(rows.toDF("k", "ts", "v"), Seq("k"), "ts", "v")
      .as[(String, Timestamp, Double, Boolean)].collect().toSet

  test("gaps fill forward on a dense per-key hourly grid") {
    val out = fill(("a", ts(1, 30), 10.0), ("a", ts(4, 10), 40.0))
    assert(out == Set(
      ("a", ts(1), 10.0, true),
      ("a", ts(2), 10.0, false),
      ("a", ts(3), 10.0, false),
      ("a", ts(4), 40.0, true)))
  }

  test("last observation in a bucket wins (latest ts)") {
    val out = fill(("a", ts(1, 10), 5.0), ("a", ts(1, 50), 7.0),
      ("a", ts(2, 0), 9.0))
    assert(out == Set(("a", ts(1), 7.0, true), ("a", ts(2), 9.0, true)))
  }

  test("grids are per key and span only the key's own window") {
    val out = fill(("a", ts(1), 1.0), ("a", ts(2), 2.0), ("b", ts(5), 5.0))
    assert(out == Set(
      ("a", ts(1), 1.0, true), ("a", ts(2), 2.0, true),
      ("b", ts(5), 5.0, true)))
  }

  test("null keys/ts/values drop; a single observation is its own grid") {
    val df = Seq(
      (Some("a"), Some(ts(3)), Some(2.5)),
      (None, Some(ts(1)), Some(1.0)),
      (Some("a"), None, Some(1.0)),
      (Some("a"), Some(ts(9)), None)).toDF("k", "ts", "v")
    val out = Resample.locf(df, Seq("k"), "ts", "v")
      .as[(String, Timestamp, Double, Boolean)].collect().toSet
    assert(out == Set(("a", ts(3), 2.5, true)))
  }

  test("layout invariance + every grid point carries a value (no null leaks)") {
    val rows = (1 to 50).map(i => (s"k${i % 5}", ts(i % 20 + 1, i % 60), i * 1.0))
    val a = Resample.locf(rows.toDF("k", "ts", "v").repartition(3),
      Seq("k"), "ts", "v").collect()
    val b = Resample.locf(rows.toDF("k", "ts", "v").repartition(13),
      Seq("k"), "ts", "v").collect()
    assert(a.toSet == b.toSet)
    assert(a.forall(!_.isNullAt(2)))
  }
}
