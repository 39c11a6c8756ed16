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
}
