package graft

import graft.ops.Profile
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSuite {
  import spark.implicits._

  test("percentile_disc definition: smallest value with cum fraction >= p") {
    // 1..10: p50 -> 5 (cum 5/10), p91 -> 10 (cum must reach 9.1), p99 -> 10
    val df = (1 to 10).map(v => ("g", v)).toDF("g", "v")
    val out = Profile.quantiles(df, Seq("g"), "v", Seq(0.5, 0.9, 0.91, 0.99, 1.0))
      .as[(String, Double, Long)].collect().map { case (_, p, v) => p -> v }.toMap
    assert(out == Map(0.5 -> 5L, 0.9 -> 9L, 0.91 -> 10L, 0.99 -> 10L, 1.0 -> 10L))
  }

  test("duplicated values weight the cumulative count") {
    // 1,1,1,1,9: p50 -> cum>=2.5 -> value 1; p90 -> cum>=4.5 -> 9
    val df = Seq(1, 1, 1, 1, 9).map(("g", _)).toDF("g", "v")
    val out = Profile.quantiles(df, Seq("g"), "v", Seq(0.5, 0.9))
      .as[(String, Double, Long)].collect().map { case (_, p, v) => p -> v }.toMap
    assert(out == Map(0.5 -> 1L, 0.9 -> 9L))
  }

  test("groups are independent; every group emits every p") {
    val df = ((1 to 100).map(v => ("a", v)) ++ Seq(("b", 7))).toDF("g", "v")
    val out = Profile.quantiles(df, Seq("g"), "v", Seq(0.5, 0.99))
      .as[(String, Double, Long)].collect().toSet
    assert(out == Set(("a", 0.5, 50L), ("a", 0.99, 99L),
      ("b", 0.5, 7L), ("b", 0.99, 7L)))
  }

  test("null keys and values drop; layout invariant") {
    val df = Seq((Some("g"), Some(1)), (Some("g"), Some(2)), (Some("g"), Some(3)),
      (None, Some(9)), (Some("g"), None)).toDF("g", "v")
    val out = Profile.quantiles(df, Seq("g"), "v", Seq(0.5))
      .as[(String, Double, Long)].collect().toSeq
    assert(out == Seq(("g", 0.5, 2L)))
    val big = (1 to 500).map(v => (s"g${v % 3}", v)).toDF("g", "v")
    val a = Profile.quantiles(big.repartition(2), Seq("g"), "v", Seq(0.25, 0.75))
      .collect().toSet
    val b = Profile.quantiles(big.repartition(17), Seq("g"), "v", Seq(0.25, 0.75))
      .collect().toSet
    assert(a == b)
  }

  test("invalid ps are rejected") {
    val df = Seq(("g", 1)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Profile.quantiles(df, Seq("g"), "v", Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Profile.quantiles(df, Seq("g"), "v", Seq(0.5, 0.5))
    }
  }
}
