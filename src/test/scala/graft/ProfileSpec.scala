package graft

import graft.ops.Profile

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a")), (Some(2L), Some("b")), (Some(2L), None),
    (None, Some("b"))).toDF("k", "v")

  test("per-column count/null/distinct/min/max in one long-format report") {
    val out = Profile.columns(df, Seq("k", "v"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSet
    assert(out == Set(
      ("k", 4L, 1L, 2L, Some("1"), Some("2")),
      ("v", 4L, 1L, 2L, Some("a"), Some("b"))))
  }

  test("an all-null column reports null min/max and zero distinct") {
    val d = Seq((Option.empty[String], "x")).toDF("a", "b")
    val out = Profile.columns(d, Seq("a"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSet
    assert(out == Set(("a", 1L, 1L, 0L, None, None)))
  }

  test("column order of the report follows the request order") {
    val cols = Profile.columns(df, Seq("v", "k"))
      .select("column").as[String].collect().toSeq
    assert(cols == Seq("v", "k"))
  }

  test("duplicate / empty requests are rejected") {
    intercept[IllegalArgumentException] { Profile.columns(df, Seq("k", "k")) }
    intercept[IllegalArgumentException] { Profile.columns(df, Seq.empty) }
  }

  test("plan: one aggregate pass (a single Expand, no per-column jobs)") {
    val plan = Profile.columns(df, Seq("k", "v"))
      .queryExecution.executedPlan.toString
    assert(plan.sliding("Expand".length).count(_ == "Expand") == 1, plan)
  }

  // ---- outliers ----

  private def O(rows: (String, Int)*) = rows.toDF("g", "v")

  test("outliers: |z| > threshold rows flagged with exact-moment z-scores") {
    // group g: nine 10s and one 100 — the 100 is the outlier
    val rows = (1 to 9).map(_ => ("g", 10)) :+ (("g", 100))
    val out = Profile.outliers(O(rows: _*), Seq("g"), "v", threshold = 2.0)
      .as[(String, Long, Double)].collect().toSet
    val n = 10.0; val s = 190.0; val sq = 9 * 100.0 + 10000.0
    val mu = s / n; val vr = (sq - s * s / n) / (n - 1)
    val z = BigDecimal((100 - mu) / math.sqrt(vr))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Set(("g", 100L, z)))
  }

  test("outliers: zero-variance and under-minN groups yield nothing") {
    val out = Profile.outliers(
      O(("a", 5), ("a", 5), ("a", 5), ("b", 99)), Seq("g"), "v")
    assert(out.count() == 0)
  }

  // ---- histogram ----

  test("histogram: integer-exact equi-width bins, empty bins emitted") {
    // values 0..9 and 95: span 96, 10 bins -> width ceil(96/10)=10 (wait:
    // (95-0+10) div 10 = 10); bins [0,10) holds 0..9, [90,100) holds 95
    val df = ((0 to 9) :+ 95).toDF("v")
    val out = Profile.histogram(df, "v", nBins = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out.size == 10)
    assert(out.contains((0L, 0L, 10L, 10L)))   // 0..9
    assert(out.contains((9L, 90L, 100L, 1L)))  // 95
    assert(out.count(_._4 == 0L) == 8)         // holes are emitted as 0
  }

  test("histogram: constant column yields one bin; trailing bins trim") {
    val one = Profile.histogram(Seq(7, 7, 7).toDF("v"), "v", nBins = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(one == Set((0L, 7L, 8L, 3L)))
  }

  test("outliers: groups are independent; layout invariant") {
    val rows = (1 to 50).map(i => (s"g${i % 3}", i * i % 37)) :+
      (("g0", 10000)) :+ (("g1", -5000))
    val a = Profile.outliers(O(rows: _*).repartition(3), Seq("g"), "v", 2.0)
      .collect().toSet
    val b = Profile.outliers(O(rows: _*).repartition(11), Seq("g"), "v", 2.0)
      .collect().toSet
    assert(a == b && a.nonEmpty)
    assert(a.exists(r => r.getString(0) == "g0" && r.getLong(1) == 10000L))
    assert(a.exists(r => r.getString(0) == "g1" && r.getLong(1) == -5000L))
  }

  test("benford: string-derived first digits, ppm shares, committed " +
    "expectations") {
    import graft.ops.Profile
    // 1000 values ~ exact Benford proportions by construction
    val vals = Profile.BenfordPpm.toSeq.flatMap { case (d, p) =>
      Seq.fill((p / 1000L).toInt)(d * 1000.0 + 137.5)
    }
    val out = Profile.benford(vals.toDF("v"), "v")
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == (1 to 9).toSet)
    out.foreach { case (d, (_, _, obs, exp, dev)) =>
      assert(dev == math.abs(obs - exp))
      assert(dev < 5000L, s"digit $d deviates $dev ppm") // built to conform
    }
    // fabricated uniform data flunks: digit 1 share ~11% vs 30.1%
    val uniform = (1 to 900).map(i => (i % 9 + 1) * 100.0 + i % 37)
    val bad = Profile.benford(uniform.toDF("v"), "v")
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(bad(1) > 150000L)
    // sub-1 magnitudes are excluded, negatives use |v|
    val edge = Profile.benford(Seq(0.5, -23.0, 0.0).toDF("v"), "v")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(edge.toSeq.map(_._1) == Seq(2))
  }
}
