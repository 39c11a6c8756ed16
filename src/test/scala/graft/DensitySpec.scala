package graft

import graft.ops.Density

class DensitySpec extends SparkSuite {
  import spark.implicits._

  private def run(pts: Seq[(Double, Double)], eps: Double, minPts: Long) =
    Density.gridClusters(pts.toDF("x", "y"), "x", "y", eps, minPts)
      .as[(String, Long, Long)].collect()
      .map { case (c, nc, np) => c -> ((nc, np)) }.toMap

  test("two well-separated blobs cluster separately; sparse noise cells " +
    "vanish") {
    // blob A: 12 points in cells (0,0)/(1,0); blob B: 8 points in (10,10);
    // noise: 2 lone points far away
    val a = (0 until 6).map(i => (0.1 + i * 0.01, 0.1)) ++
      (0 until 6).map(i => (1.1 + i * 0.01, 0.1))
    val b = (0 until 8).map(i => (10.1 + i * 0.01, 10.1))
    val noise = Seq((50.0, 50.0), (-60.0, 30.0))
    val got = run(a ++ b ++ noise, eps = 1.0, minPts = 3)
    assert(got.size == 2)
    assert(got("0|0") == ((2L, 12L))) // cells (0,0)+(1,0) joined, min key 0|0
    assert(got("10|10") == ((1L, 8L)))
  }

  test("diagonal (Chebyshev) adjacency connects corner-touching cells; " +
    "a gap of one sparse cell separates") {
    val c00 = (0 until 4).map(i => (0.5, 0.1 + i * 0.1))
    val c11 = (0 until 4).map(i => (1.5, 1.1 + i * 0.1)) // corner-adjacent
    val c33 = (0 until 4).map(i => (3.5, 3.1 + i * 0.1)) // gap at (2,2)
    val got = run(c00 ++ c11 ++ c33, eps = 1.0, minPts = 3)
    assert(got.keySet == Set("0|0", "3|3"))
    assert(got("0|0") == ((2L, 8L)) && got("3|3") == ((1L, 4L)))
  }

  test("negative coordinates snap with floor (not truncation): -0.5/eps=1 " +
    "lands in cell -1, and keys stay consistent") {
    val pts = Seq.fill(3)((-0.5, -0.5)) ++ Seq.fill(3)((0.5, 0.5))
    val got = run(pts, eps = 1.0, minPts = 3)
    // cells (-1,-1) and (0,0) are diagonal neighbors → one cluster,
    // min key by STRING compare: "-1|-1" < "0|0"
    assert(got.keySet == Set("-1|-1"))
    assert(got("-1|-1") == ((2L, 6L)))
  }

  test("minPts gates density: raising it dissolves the cluster; " +
    "layout/duplication invariance") {
    val pts = (0 until 5).map(i => (0.2 + i * 0.1, 0.3))
    assert(run(pts, 1.0, 6).isEmpty)
    val df = pts.toDF("x", "y").repartition(11)
    val got = Density.gridClusters(df, "x", "y", 1.0, 5)
      .as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("0|0", 1L, 5L)))
  }
}
