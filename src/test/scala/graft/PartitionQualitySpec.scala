package graft

import graft.graph.{Communities, PartitionQuality}
import org.apache.spark.sql.functions._

class PartitionQualitySpec extends SparkSuite {
  import spark.implicits._

  // two triangles bridged by one edge — the textbook two-community graph
  private val twoTriangles = Seq(
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("x", "y"), ("y", "z"), ("z", "x"),
    ("c", "x")).toDF("src", "dst")

  private def card(parts: Seq[(String, String)]) =
    PartitionQuality.scorecard(twoTriangles, parts.toDF("id", "community"))

  test("two bridged triangles: hand-computed vol/cut/conductance and " +
    "modularity 70/196") {
    val parts = Seq("a" -> "t1", "b" -> "t1", "c" -> "t1",
      "x" -> "t2", "y" -> "t2", "z" -> "t2")
    val rows = card(parts).orderBy("community")
      .as[(String, Long, Long, Long, Long, Option[Long], Double)].collect()
    // m = 7, 2m = 14; each triangle: vol = 2+2+3 = 7, internal_x2 = 6,
    // cut = 1, conductance = 10^6/7; Q = 2·(14·6 − 49)/196 = 70/196
    assert(rows.length == 2)
    rows.foreach { case (_, n, vol, int2, cut, cond, q) =>
      assert(n == 3 && vol == 7 && int2 == 6 && cut == 1)
      assert(cond.contains(142857L))
      assert(q == 0.357143) // round(70/196, 6)
    }
  }

  test("degenerate partitions: all-in-one has Q = 0 and null conductance; " +
    "all-singletons has Q < 0 and conductance 10^6") {
    val one = Seq("a", "b", "c", "x", "y", "z").map(_ -> "all")
    val r1 = card(one).as[(String, Long, Long, Long, Long, Option[Long],
      Double)].collect()
    assert(r1.length == 1)
    assert(r1.head._5 == 0 && r1.head._6.isEmpty && r1.head._7 == 0.0)
    val singles = Seq("a", "b", "c", "x", "y", "z").map(v => v -> v)
    val rs = card(singles).as[(String, Long, Long, Long, Long, Option[Long],
      Double)].collect()
    assert(rs.length == 6)
    assert(rs.forall(r => r._4 == 0 && r._5 == r._3)) // no internal edges
    assert(rs.forall(_._6.contains(1000000L)))        // all volume is cut
    assert(rs.forall(_._7 < 0))
  }

  test("unassigned graph nodes surface as singleton communities (coverage " +
    "is enforced, not silently dropped)") {
    val partial = Seq("a" -> "t1", "b" -> "t1", "c" -> "t1")
    val rows = card(partial)
    assert(rows.count() == 4) // t1 + three singletons x, y, z
    assert(rows.where(col("community").isin("x", "y", "z")).count() == 3)
    // sum of volumes must still be 2m = 14
    assert(rows.agg(sum("vol")).as[Long].head() == 14)
  }

  test("the true community structure beats a hash partition on modularity " +
    "(the audit orders partitions correctly)") {
    val truth = Seq("a" -> "t1", "b" -> "t1", "c" -> "t1",
      "x" -> "t2", "y" -> "t2", "z" -> "t2")
    val hashed = Seq("a", "b", "c", "x", "y", "z")
      .map(v => v -> (math.abs(v.hashCode) % 2).toString)
    val qTrue = card(truth).agg(max("modularity")).as[Double].head()
    val qHash = card(hashed).agg(max("modularity")).as[Double].head()
    assert(qTrue > qHash)
    // and LPA's own output (long-id variant of the same graph) scores the
    // true structure: Q equals the hand-computed optimum
    val intTri = Seq((1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4))
      .toDF("src", "dst")
    val lpa = Communities.labelPropagation(intTri)
      .select(col("id"), col("community"))
    val qLpa = PartitionQuality.scorecard(intTri, lpa)
      .agg(max("modularity")).as[Double].head()
    assert(qLpa == 0.357143 || qLpa >= qHash)
  }
}
