package graft

import graft.ops.Sketch
import org.apache.spark.sql.Row

class KmvSetOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ops(a: Seq[String], b: Seq[String], k: Int = 256): Row =
    Sketch.kmvSetOps(a.toDF("v"), b.toDF("v"), "v", k).head()

  test("below k everything is exact: disjoint, identical, and known " +
    "overlap") {
    val r = ops((0 until 40).map("a" + _), (0 until 30).map("b" + _))
    assert(r.getLong(0) == 40 && r.getLong(1) == 30)
    assert(r.getLong(2) == 70 && r.getLong(4) == 0)
    assert(r.getDouble(5) == 70.0 && r.getDouble(6) == 0.0)
    assert(r.getLong(7) == 0L)
    val same = (0 until 25).map("x" + _)
    val rs = ops(same, same)
    assert(rs.getLong(2) == 25 && rs.getLong(4) == 25)
    assert(rs.getDouble(6) == 25.0 && rs.getLong(7) == 1000000L)
    // A = 0..49, B = 25..74: |A∪B| = 75, |A∩B| = 25, J = 25/75
    val ro = ops((0 until 50).map("k" + _), (25 until 75).map("k" + _))
    assert(ro.getLong(2) == 75 && ro.getLong(4) == 25)
    assert(ro.getLong(7) == 333333L)
  }

  test("at saturation the estimates land near truth (the 1/sqrt(k) " +
    "regime) and Jaccard tracks the true ratio") {
    // |A| = 3000, |B| = 3000, overlap 1500 → |A∪B| = 4500, J = 1/3
    val a = (0 until 3000).map("v" + _)
    val b = (1500 until 4500).map("v" + _)
    val r = ops(a, b, k = 256)
    assert(r.getLong(2) == 256) // saturated
    val unionEst = r.getDouble(5)
    assert(math.abs(unionEst - 4500) < 4500 * 0.25, s"union $unionEst")
    val j = r.getLong(7) / 1e6
    assert(math.abs(j - 1.0 / 3) < 0.12, s"jaccard $j")
    val interEst = r.getDouble(6)
    assert(math.abs(interEst - 1500) < 1500 * 0.45, s"inter $interEst")
  }

  test("mergeability invariant: the union sketch equals the sketch of the " +
    "concatenated input; dedup and layout no-ops") {
    val a = (0 until 500).map("p" + _)
    val b = (250 until 800).map("p" + _)
    val direct = Sketch.kmvSetOps((a ++ b).toDF("v"),
      (a ++ b).toDF("v"), "v", 128).head()
    val merged = ops(a ++ a, b ++ b, 128) // dup inputs, same sets
    // n_union_sketch and h_k agree between "sketch of A∪B" and "merged"
    assert(direct.getLong(2) == merged.getLong(2))
    assert(direct.getLong(3) == merged.getLong(3))
  }

  test("nulls are excluded; empty sides degrade gracefully") {
    val r = Sketch.kmvSetOps(
      Seq(Some("a"), None, Some("b")).toDF("v"),
      Seq.empty[String].toDF("v"), "v", 16).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 0)
    assert(r.getLong(2) == 2 && r.getLong(4) == 0 && r.getLong(7) == 0L)
  }
}
