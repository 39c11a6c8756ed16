package graft

import graft.ops.Sketch
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSuite {
  import spark.implicits._

  private def sketch(rows: Seq[(String, String)], k: Int) =
    Sketch.kmvDistinct(rows.toDF("g", "v").repartition(5), Seq("g"), "v", k)
      .as[(String, Long, Long, Double)].collect()
      .map { case (g, n, h, e) => g -> ((n, h, e)) }.toMap

  test("below k the count is exact") {
    val out = sketch(Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "z")), k = 16)
    assert(out("a")._1 == 2L && out("a")._3 == 2.0)
    assert(out("b")._1 == 1L && out("b")._3 == 1.0)
  }

  test("at or above k: estimate = (k-1) * M / h_k, within KMV error bounds") {
    val vals = (1 to 2000).map(i => ("g", s"value_$i"))
    val out = sketch(vals, k = 64)
    val (n, hk, est) = out("g")
    assert(n == 64L)
    val expected = BigDecimal(63.0 * 2147483647L / hk)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est == expected)
    // 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    assert(math.abs(est - 2000) / 2000.0 < 0.51, s"est=$est")
  }

  test("deterministic across partition layouts (pure function of the set)") {
    val vals = (1 to 500).map(i => ("g", s"v$i"))
    val a = Sketch.kmvDistinct(vals.toDF("g", "v").repartition(2), Seq("g"), "v", 32)
      .as[(String, Long, Long, Double)].collect().toSet
    val b = Sketch.kmvDistinct(vals.toDF("g", "v").repartition(13), Seq("g"), "v", 32)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("sketch is the k MINIMA of the portable scrambled hash (mergeable defn)") {
    val vals = (1 to 300).map(i => ("g", s"v$i"))
    val hashes = vals.map(_._2).distinct
      .map(v => spark.range(1).select(Sketch.kmvHash(lit(v))).head().getLong(0))
    val hkExpected = hashes.sorted.take(32).max
    val out = sketch(vals, k = 32)
    assert(out("g")._2 == hkExpected)
  }

  test("null values are ignored; null group keys keep their own row") {
    val df = Seq((Some("a"), Some("x")), (Some("a"), None),
      (None, Some("y")), (None, Some("y"))).toDF("g", "v")
    val out = Sketch.kmvDistinct(df, Seq("g"), "v", 8)
      .as[(Option[String], Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(out(Some("a")) == 1L && out(None) == 1L)
  }

  // ---- heavyHitters ----

  private def hh(keys: Seq[String], k: Int, parts: Int = 4) =
    Sketch.heavyHitters(keys.toDF("key").repartition(parts), "key", k)
      .as[(String, Long)].collect().toMap

  test("heavy hitters: exactly the keys with count*k > n, with exact counts") {
    // 400 'mega' (40%), 100 'mid' (10%), 500 unique tail keys
    val keys = Seq.fill(400)("mega") ++ Seq.fill(100)("mid") ++
      (0 until 500).map(i => s"tail$i")
    // n=1000: k=4 -> only mega (400*4 > 1000; 100*4 = 400 < 1000)
    assert(hh(keys, 4) == Map("mega" -> 400L))
    // k=12 -> mega and mid (100*12 = 1200 > 1000); no tail key qualifies
    assert(hh(keys, 12) == Map("mega" -> 400L, "mid" -> 100L))
  }

  test("heavy hitters: the threshold is STRICT (count*k == n is excluded)") {
    // 4 keys, 25% each, k=4: count*k == n exactly -> none qualify
    val keys = (0 until 100).map(i => s"k${i % 4}")
    assert(hh(keys, 4).isEmpty)
  }

  test("heavy hitters: output is layout-independent even though MG state is not") {
    val keys = Seq.fill(400)("hot") ++ (0 until 600).map(i => s"c${i % 97}")
    val a = hh(keys, 3, parts = 1) // 400*3 > 1000
    val b = hh(keys, 3, parts = 17)
    assert(a == b && a == Map("hot" -> 400L))
  }

  test("heavy hitters: nulls ignored, empty input is empty") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None).toDF("key")
    val out = Sketch.heavyHitters(df, "key", 2).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 3L)) // n = 3 non-null, 3*2 > 3
    assert(Sketch.heavyHitters(df.where("key IS NULL"), "key", 2).isEmpty)
  }

  test("hll: estimate within the published error band; duplicates free") {
    val n = 5000
    val vals = (0 until n).map(i => s"value_$i") ++ (0 until n).map(i => s"value_$i")
    val est = Sketch.hllEstimate(vals.toDF("v"), "v")
      .as[(Long, Long, Double)].collect().head
    // sigma = 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(est._3 - n) / n < 0.20, s"estimate ${est._3} for $n")
  }

  test("hll: linear-counting small-range correction path") {
    val est = Sketch.hllEstimate((0 until 50).map(i => s"x$i").toDF("v"), "v")
      .as[(Long, Long, Double)].collect().head
    assert(est._1 <= 50) // at most one bucket per value
    assert(math.abs(est._3 - 50) / 50 < 0.15, s"estimate ${est._3} for 50")
  }

  test("hll: registers merge by per-bucket MAX (sketch of union)") {
    val a = (0 until 800).map(i => s"a$i").toDF("v")
    val b = (400 until 1200).map(i => s"a$i").toDF("v")
    val union = Sketch.hllRegisters(a.unionByName(b), "v")
      .as[(Long, Int)].collect().toMap
    val merged = (Sketch.hllRegisters(a, "v").as[(Long, Int)].collect() ++
        Sketch.hllRegisters(b, "v").as[(Long, Int)].collect())
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(union == merged)
  }

  test("count-min: estimates are one-sided (never below the true count); " +
    "exact for a sparse key set") {
    val vals = (0 until 2000).flatMap(i => Seq.fill(i % 7 + 1)(s"k${i % 500}"))
    val probes = (0 until 500 by 50).map(i => s"k$i") :+ "never-seen"
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = Sketch.cmEstimate(vals.toDF("v"), "v",
        probes.toDF("key"), "key")
      .as[(String, Long)].collect().toMap
    probes.foreach { k =>
      assert(est(k) >= truth.getOrElse(k, 0L), s"$k under-estimated")
    }
    assert(est("never-seen") >= 0L)
    // 20 distinct keys in 4x1024 buckets: collisions are overwhelmingly
    // unlikely in at least one row -> min is exact
    val sparse = (0 until 20).flatMap(i => Seq.fill(i + 1)(s"s$i"))
    val es = Sketch.cmEstimate(sparse.toDF("v"), "v",
        (0 until 20).map(i => s"s$i").toDF("key"), "key")
      .as[(String, Long)].collect().toMap
    (0 until 20).foreach(i => assert(es(s"s$i") == i + 1L))
  }

  test("count-min: registers merge counter-wise; layout invariant") {
    val a = (0 until 600).map(i => s"k${i % 50}")
    val b = (0 until 400).map(i => s"k${i % 80}")
    val union = Sketch.cmRegisters((a ++ b).toDF("v"), "v")
      .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val merged = (Sketch.cmRegisters(a.toDF("v"), "v")
        .as[(Int, Long, Long)].collect() ++
        Sketch.cmRegisters(b.toDF("v"), "v").as[(Int, Long, Long)].collect())
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap
    assert(union == merged)
    val r1 = Sketch.cmRegisters(a.toDF("v").repartition(1), "v")
      .as[(Int, Long, Long)].collect().toSet
    val r7 = Sketch.cmRegisters(a.toDF("v").repartition(7), "v")
      .as[(Int, Long, Long)].collect().toSet
    assert(r1 == r7)
  }

  test("hll: layout invariant (exact registers at any partitioning)") {
    val vals = (0 until 3000).map(i => s"k${i % 1100}")
    val r1 = Sketch.hllRegisters(vals.toDF("v").repartition(1), "v")
      .as[(Long, Int)].collect().toSet
    val r9 = Sketch.hllRegisters(vals.toDF("v").repartition(9), "v")
      .as[(Long, Int)].collect().toSet
    assert(r1 == r9)
  }

  // ---- AMS F2 (tug-of-war) ----

  test("ams: single-key corpus estimates F2 EXACTLY (z = ±f in every row)") {
    val df = Seq.fill(7)("only").toDF("v")
    val Array((n, est)) = Sketch.amsF2(df, "v").as[(Long, Long)].collect()
    assert(n == 5L && est == 49L)
  }

  test("ams: registers merge counter-wise and are layout-invariant") {
    val a = (0 until 400).map(i => s"k${i % 23}")
    val b = (0 until 300).map(i => s"j${i % 17}")
    val regOf = (rows: Seq[String], parts: Int) =>
      Sketch.amsRegisters(rows.toDF("v").repartition(parts), "v")
        .as[(Int, Long)].collect().toMap
    val union = regOf(a ++ b, 3)
    val merged = (regOf(a, 1).toSeq ++ regOf(b, 5).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(union == merged)
    assert(regOf(a, 1) == regOf(a, 11))
  }

  test("ams: median-of-5 estimate lands in the right decade on a skewed corpus") {
    // 1 key x 1000 + 500 keys x 2: F2 = 10^6 + 2000; the heavy key
    // dominates, and each z_r = ±1000 + noise(|z|<~100), so every
    // z² ∈ [~0.8e6, ~1.25e6] — assert a generous 2x band
    val rows = Seq.fill(1000)("heavy") ++
      (1 to 500).flatMap(i => Seq(s"t$i", s"t$i"))
    val f2 = 1000L * 1000L + 500L * 4L
    val Array((_, est)) = Sketch.amsF2(rows.toDF("v"), "v")
      .as[(Long, Long)].collect()
    assert(est > f2 / 2 && est < f2 * 2, s"est=$est true=$f2")
  }

  test("ams: d must be odd (exact median), nulls ignored") {
    intercept[IllegalArgumentException] {
      Sketch.amsF2(Seq("x").toDF("v"), "v", d = 4)
    }
    val df = Seq(Some("x"), None, Some("x"), None).toDF("v")
    val Array((_, est)) = Sketch.amsF2(df, "v").as[(Long, Long)].collect()
    assert(est == 4L) // nulls never reach the registers
  }

  // ---- Count-Min join-size estimate ----

  test("cmJoinSize: exact on a single shared key, one-sided in general") {
    val a = Seq.fill(3)("k").toDF("v")
    val b = Seq.fill(5)("k").toDF("v")
    assert(Sketch.cmJoinSize(a, "v", b, "v").head().getLong(0) == 15L)
    // bigger corpus: estimate >= true join size (collisions only ADD)
    val ca = (0 until 2000).map(i => s"u${i % 90}").toDF("v")
    val cb = (0 until 1500).map(i => s"u${i % 70}").toDF("v")
    val est = Sketch.cmJoinSize(ca, "v", cb, "v").head().getLong(0)
    val truth = ca.groupBy("v").count().withColumnRenamed("count", "ca")
      .join(cb.groupBy("v").count().withColumnRenamed("count", "cb"), "v")
      .agg(sum(col("ca") * col("cb"))).head().getLong(0)
    assert(est >= truth, s"est=$est < truth=$truth")
    assert(est <= truth * 2, s"est=$est way over truth=$truth")
  }

  test("cmJoinSize: empty side estimates 0 (row spine keeps the MIN honest)") {
    val a = Seq("x", "y", "z").toDF("v")
    val b = Seq.empty[String].toDF("v")
    assert(Sketch.cmJoinSize(a, "v", b, "v").head().getLong(0) == 0L)
  }

  test("cmJoinSize: layout invariant") {
    val a = (0 until 800).map(i => s"u${i % 40}")
    val b = (0 until 600).map(i => s"u${i % 55}")
    val e1 = Sketch.cmJoinSize(a.toDF("v").repartition(1), "v",
      b.toDF("v").repartition(1), "v").head().getLong(0)
    val e9 = Sketch.cmJoinSize(a.toDF("v").repartition(9), "v",
      b.toDF("v").repartition(4), "v").head().getLong(0)
    assert(e1 == e9)
  }
}
