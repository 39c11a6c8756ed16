package graft

import graft.ops.Decay
import java.sql.Timestamp

class DecaySpec extends SparkSuite {
  import spark.implicits._

  private def ts(epochSec: Long) = new Timestamp(epochSec * 1000L)

  test("exact decay terms: now = full weight, one half-life = half") {
    val asOf = 1000000L
    val df = Seq(
      ("u1", ts(asOf), 1.0), // Δ=0 → 1000000
      ("u1", ts(asOf - 3600), 1.0), // Δ=hl → 500000
      ("u2", ts(asOf - 7200), 4.0)) // Δ=2hl → 4/4 → 1000000
      .toDF("user", "t", "v")
    val out = Decay.decayedSum(df, Seq("user"), "t", "v",
        halfLifeSec = 3600L, asOfEpochSec = asOf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map("u1" -> (1500000L, 2L), "u2" -> (1000000L, 1L)))
  }

  test("terms quantize BEFORE the sum — layout-independent exact integers") {
    val asOf = 2000000L
    val rows = (0 until 500).map(i => ("g" + i % 3, ts(asOf - i * 977L), 1.0 + i % 7))
    val df1 = rows.toDF("g", "t", "v").repartition(1)
    val df9 = rows.toDF("g", "t", "v").repartition(9)
    val a = Decay.decayedSum(df1, Seq("g"), "t", "v", 86400L, asOf)
      .as[(String, Long, Long)].collect().toSet
    val b = Decay.decayedSum(df9, Seq("g"), "t", "v", 86400L, asOf)
      .as[(String, Long, Long)].collect().toSet
    assert(a == b && a.size == 3)
  }

  test("null ts/value rows drop; null group keys keep their own row") {
    val asOf = 1000L
    val df = Seq(
      (Some("a"), Some(ts(asOf)), Some(2.0)),
      (Some("a"), None, Some(9.0)),
      (None, Some(ts(asOf)), Some(3.0)),
      (Some("b"), Some(ts(asOf)), None))
      .toDF("g", "t", "v")
    val out = Decay.decayedSum(df, Seq("g"), "t", "v", 60L, asOf)
      .as[(Option[String], Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map(Some("a") -> 2000000L, None -> 3000000L))
  }

  test("decay monotonicity: older events weigh strictly less") {
    val asOf = 5000000L
    val out = (1 to 10).map { k =>
      Decay.decayedSum(Seq(("g", ts(asOf - k * 1000L), 1.0)).toDF("g", "t", "v"),
        Seq("g"), "t", "v", 10000L, asOf)
        .as[(String, Long, Long)].head()._2
    }
    assert(out == out.sorted.reverse && out.distinct.size == 10)
  }
}
