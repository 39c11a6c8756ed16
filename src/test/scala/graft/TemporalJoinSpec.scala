package graft

import graft.ops.TemporalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSuite {
  import spark.implicits._

  // left: (id, key, ts); right: (key, rts, payload)
  private def L(rows: (Int, String, Double)*) = rows.toDF("id", "k", "ts")
  private def R(rows: (String, Double, String)*) = rows.toDF("k", "rts", "v")

  private def asof(l: DataFrame, r: DataFrame,
      tol: Option[Double] = None): Set[(Int, String, Double, Option[Double], Option[String])] =
    TemporalJoin.asofJoin(l, r, Seq("k"), "ts", "rts", Seq("v"), tolerance = tol)
      .select(col("id"), col("k"), col("ts"), col("asof_ts"), col("v"))
      .as[(Int, String, Double, Option[Double], Option[String])].collect().toSet

  test("asof: each left row gets the latest right at-or-before its ts") {
    val out = asof(
      L((1, "a", 5.0), (2, "a", 12.0), (3, "a", 30.0)),
      R(("a", 4.0, "r4"), ("a", 10.0, "r10"), ("a", 20.0, "r20")))
    assert(out == Set(
      (1, "a", 5.0, Some(4.0), Some("r4")),
      (2, "a", 12.0, Some(10.0), Some("r10")),
      (3, "a", 30.0, Some(20.0), Some("r20"))))
  }

  test("asof: equal timestamps match (>= tie rule, DuckDB/kdb semantics)") {
    val out = asof(L((1, "a", 10.0)), R(("a", 10.0, "r10"), ("a", 3.0, "r3")))
    assert(out == Set((1, "a", 10.0, Some(10.0), Some("r10"))))
  }

  test("asof: left rows with no prior right row keep nulls (left join)") {
    val out = asof(
      L((1, "a", 1.0), (2, "b", 9.0)),
      R(("a", 5.0, "r5")))
    assert(out == Set(
      (1, "a", 1.0, None, None),
      (2, "b", 9.0, None, None)))
  }

  test("asof: keys never cross-match") {
    val out = asof(
      L((1, "a", 10.0), (2, "b", 10.0)),
      R(("a", 2.0, "ra"), ("b", 8.0, "rb")))
    assert(out == Set(
      (1, "a", 10.0, Some(2.0), Some("ra")),
      (2, "b", 10.0, Some(8.0), Some("rb"))))
  }

  test("asof: tolerance nulls out matches older than the bound") {
    val out = asof(
      L((1, "a", 10.0), (2, "a", 100.0)),
      R(("a", 8.0, "r8")), tol = Some(5.0))
    assert(out == Set(
      (1, "a", 10.0, Some(8.0), Some("r8")), // 10-8=2 <= 5
      (2, "a", 100.0, None, None)))          // 100-8=92 > 5
  }

  test("asof: every left row appears exactly once regardless of right density") {
    val l = L((1 to 50).map(i => (i, "a", i.toDouble)): _*)
    val r = R((1 to 200).map(j => ("a", j / 10.0, s"r$j")): _*)
    val out = TemporalJoin.asofJoin(l, r, Seq("k"), "ts", "rts", Seq("v"))
    assert(out.count() == 50)
    assert(out.groupBy("id").count().where(col("count") =!= 1).count() == 0)
  }

  test("asof: matches a naive per-row argmax on random-ish data") {
    val l = L((1 to 40).map(i => (i, if (i % 3 == 0) "x" else "y",
      (i * 7 % 23).toDouble)): _*)
    val r = R((1 to 15).map(j => (if (j % 2 == 0) "x" else "y",
      (j * 3 % 19).toDouble, s"p$j")): _*)
    // naive: for each left row the right row with max rts <= ts (same key);
    // tie on equal rts impossible here (rts unique per key by construction)
    val naive = l.as[(Int, String, Double)].collect().map { case (id, k, ts) =>
      val cands = r.as[(String, Double, String)].collect()
        .filter(t => t._1 == k && t._2 <= ts)
      val best = if (cands.isEmpty) None else Some(cands.maxBy(_._2))
      (id, k, ts, best.map(_._2), best.map(_._3))
    }.toSet
    assert(asof(l, r) == naive)
  }

  test("asof: rejects a colliding output column name") {
    intercept[IllegalArgumentException] {
      TemporalJoin.asofJoin(L((1, "a", 1.0)).withColumnRenamed("ts", "asof_ts"),
        R(("a", 1.0, "r")), Seq("k"), "asof_ts", "rts", Seq("v"))
    }
    intercept[IllegalArgumentException] { // payload shadows a left column
      TemporalJoin.asofJoin(L((1, "a", 1.0)),
        R(("a", 1.0, "r")).withColumnRenamed("v", "id"),
        Seq("k"), "ts", "rts", Seq("id"))
    }
  }

  test("asof: null timestamps and null keys never match (oracle semantics)") {
    // a null-rts right row would sort NULLS FIRST and stick as a bogus
    // carry-forward match without the operator's null fence
    val r = Seq((Some("a"), None: Option[Double], "bad"),
      (Some("a"), Some(10.0), "ok"), (None, Some(1.0), "nullkey"))
      .toDF("k", "rts", "v")
    val l = Seq((1, Some("a"), Some(5.0)),   // before any real right: no match
      (2, Some("a"), Some(12.0)),            // matches the ts=10 row
      (3, Some("a"), None),                  // null left ts: kept, unmatched
      (4, None, Some(50.0)))                 // null left key: kept, unmatched
      .toDF("id", "k", "ts")
    val out = TemporalJoin.asofJoin(l, r, Seq("k"), "ts", "rts", Seq("v"))
      .select(col("id"), col("asof_ts"), col("v"))
      .as[(Int, Option[Double], Option[String])].collect().toSet
    assert(out == Set(
      (1, None, None),
      (2, Some(10.0), Some("ok")),
      (3, None, None),
      (4, None, None)))
  }

  // ---------------- intervalJoin ----------------

  private def P(rows: (Int, Double)*) = rows.toDF("id", "p")
  private def I(rows: (String, Double, Double)*) = rows.toDF("band", "lo", "hi")

  private def ij(l: DataFrame, r: DataFrame, w: Double): Set[(Int, String)] =
    TemporalJoin.intervalJoin(l, r, "p", "lo", "hi", Seq("band"), w)
      .select(col("id"), col("band")).as[(Int, String)].collect().toSet

  test("interval: point matches every containing interval, [lo, hi) half-open") {
    val out = ij(
      P((1, 5.0), (2, 10.0), (3, 0.0), (4, 20.0)),
      I(("a", 0.0, 10.0), ("b", 5.0, 15.0)), w = 4.0)
    // p=5: in a [0,10) and b [5,15) (lo closed); p=10: NOT in a (hi open),
    // in b; p=0: in a; p=20: nowhere
    assert(out == Set((1, "a"), (1, "b"), (2, "b"), (3, "a")))
  }

  test("interval: each matching pair is produced exactly once across buckets") {
    // interval spans many buckets (w much smaller than length): no dup pairs
    val out = TemporalJoin.intervalJoin(
      P((1, 50.0)), I(("wide", 0.0, 100.0)), "p", "lo", "hi", Seq("band"), 3.0)
    assert(out.count() == 1)
  }

  test("interval: matches the naive theta join on denser data") {
    val pts = P((1 to 60).map(i => (i, (i * 13 % 97).toDouble)): _*)
    val ivs = I((1 to 25).map(j =>
      (s"b$j", (j * 11 % 50).toDouble, (j * 11 % 50).toDouble + (j % 7 + 1) * 5)): _*)
    val naive = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("id"), col("band")).as[(Int, String)].collect().toSet
    assert(ij(pts, ivs, w = 8.0) == naive)
    assert(ij(pts, ivs, w = 1.0) == naive)  // bucket width never changes results
    assert(ij(pts, ivs, w = 500.0) == naive)
  }

  test("interval: degenerate and null intervals are dropped, null points skipped") {
    val pts = Seq((1, Some(5.0)), (2, None)).toDF("id", "p")
    val ivs = Seq(("ok", Some(0.0), Some(10.0)), ("empty", Some(5.0), Some(5.0)),
      ("inverted", Some(9.0), Some(1.0)), ("nul", None, Some(10.0)))
      .toDF("band", "lo", "hi")
    val out = TemporalJoin.intervalJoin(pts, ivs, "p", "lo", "hi", Seq("band"), 2.0)
      .select(col("id"), col("band")).as[(Int, String)].collect().toSet
    assert(out == Set((1, "ok")))
  }

  test("interval: plan is an equi join on the bucket, not a nested-loop scan") {
    val plan = TemporalJoin.intervalJoin(
      P((1, 5.0)), I(("a", 0.0, 10.0)), "p", "lo", "hi", Seq("band"), 4.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"theta-join degeneration:\n$plan")
  }

  test("interval: timestamp points against timestamp intervals (epoch cast)") {
    val pts = Seq((1, "2024-01-01 00:05:00"), (2, "2024-01-01 00:30:00"))
      .toDF("id", "tss").select(col("id"), col("tss").cast("timestamp").as("p"))
    val ivs = Seq(("w1", "2024-01-01 00:00:00", "2024-01-01 00:10:00"))
      .toDF("band", "los", "his")
      .select(col("band"), col("los").cast("timestamp").as("lo"),
        col("his").cast("timestamp").as("hi"))
    val out = TemporalJoin.intervalJoin(pts, ivs, "p", "lo", "hi", Seq("band"), 600.0)
      .select(col("id"), col("band")).as[(Int, String)].collect().toSet
    assert(out == Set((1, "w1")))
  }

  // ---------------- mergeIntervals ----------------

  private def MI(rows: (String, Double, Double)*) = rows.toDF("k", "lo", "hi")
  private def mi(df: org.apache.spark.sql.DataFrame): Set[(String, Double, Double, Long)] =
    TemporalJoin.mergeIntervals(df, Seq("k"), "lo", "hi")
      .as[(String, Double, Double, Long)].collect().toSet

  test("merge: overlapping and touching intervals coalesce, disjoint stay") {
    val out = mi(MI(("a", 1.0, 3.0), ("a", 2.0, 5.0),   // overlap
      ("a", 5.0, 6.0),                                  // touching: merges
      ("a", 8.0, 9.0),                                  // gap: separate
      ("b", 1.0, 2.0)))                                 // other key isolated
    assert(out == Set(("a", 1.0, 6.0, 3L), ("a", 8.0, 9.0, 1L),
      ("b", 1.0, 2.0, 1L)))
  }

  test("merge: containment folds in; degenerate/null intervals + null keys drop") {
    val rows = Seq((Some("a"), Some(1.0), Some(10.0)),
      (Some("a"), Some(2.0), Some(3.0)),     // contained
      (Some("a"), Some(4.0), Some(4.0)),     // empty: dropped
      (Some("a"), Some(9.0), Some(2.0)),     // inverted: dropped
      (Some("a"), None, Some(5.0)),          // null lo: dropped
      (None, Some(1.0), Some(2.0)),          // null KEY: dropped (unrelated
      (None, Some(50.0), Some(60.0)))        //  null keys must not merge)
      .toDF("k", "lo", "hi")
    assert(mi(rows) == Set(("a", 1.0, 10.0, 2L)))
  }

  test("merge: matches a naive driver sweep on pseudo-random intervals") {
    val rows = (1 to 80).map { i =>
      val lo = (i * 13 % 50).toDouble
      (if (i % 2 == 0) "x" else "y", lo, lo + (i % 7 + 1))
    }
    def naive(rs: Seq[(String, Double, Double)]): Set[(String, Double, Double, Long)] =
      rs.groupBy(_._1).flatMap { case (k, v) =>
        val sorted = v.map(t => (t._2, t._3)).sortBy(identity)
        val acc = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Long)]
        for ((l, h) <- sorted) {
          if (acc.nonEmpty && l <= acc.last._2)
            acc(acc.length - 1) = (acc.last._1, math.max(acc.last._2, h), acc.last._3 + 1)
          else acc += ((l, h, 1L))
        }
        acc.map(t => (k, t._1, t._2, t._3))
      }.toSet
    assert(mi(MI(rows: _*)) == naive(rows))
    assert(mi(MI(rows: _*).repartition(7)) == naive(rows)) // layout invariance
  }

  test("timestamp_ntz (parquet default) works for both joins incl tolerance") {
    // NTZ has no direct double cast — the operator must route it through LTZ
    val pts = Seq((1, "2024-01-01 00:05:00"), (2, "2024-01-01 02:00:00"))
      .toDF("id", "tss").select(col("id"), col("tss").cast("timestamp_ntz").as("p"))
    val ivs = Seq(("w1", "2024-01-01 00:00:00", "2024-01-01 00:10:00"))
      .toDF("band", "los", "his")
      .select(col("band"), col("los").cast("timestamp_ntz").as("lo"),
        col("his").cast("timestamp_ntz").as("hi"))
    val out = TemporalJoin.intervalJoin(pts, ivs, "p", "lo", "hi", Seq("band"), 600.0)
      .select(col("id"), col("band")).as[(Int, String)].collect().toSet
    assert(out == Set((1, "w1")))

    val l = pts.withColumnRenamed("p", "ts")
    val r = ivs.select(col("lo").as("rts"), col("band").as("v"))
    // keyless asof is disallowed by contract; a constant key is global asof
    val lk = l.withColumn("k", lit("g")); val rk = r.withColumn("k", lit("g"))
    val asofOut = TemporalJoin.asofJoin(lk, rk, Seq("k"), "ts", "rts", Seq("v"),
      tolerance = Some(3600.0))  // seconds after NTZ->epoch normalization
      .select(col("id"), col("v")).as[(Int, Option[String])].collect().toSet
    assert(asofOut == Set((1, Some("w1")), (2, None))) // 2h > 1h tolerance
  }
}
