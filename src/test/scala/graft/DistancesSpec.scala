package graft

import graft.graph.Distances
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DistancesSpec extends SparkSuite {
  import spark.implicits._

  private def edges(rows: (String, String)*) = rows.toDF("src", "dst")
  private def lm(ids: String*) = ids.toDF("id")
  private def triples(df: DataFrame) =
    df.as[(String, String, Int)].collect().toSet

  test("chain: distances are hop counts from the landmark") {
    val out = triples(Distances.fromLandmarks(
      edges(("a", "b"), ("b", "c"), ("c", "d")), lm("a")))
    assert(out == Set(("a", "a", 0), ("b", "a", 1), ("c", "a", 2), ("d", "a", 3)))
  }

  test("diamond: two equal-length paths settle once at the min distance") {
    val out = triples(Distances.fromLandmarks(
      edges(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")), lm("a")))
    assert(out == Set(("a", "a", 0), ("b", "a", 1), ("c", "a", 1),
      ("d", "a", 2), ("e", "a", 3)))
  }

  test("shortcut beats the long way: first-seen IS the minimum") {
    // a→b→c→d and a direct a→d: d must settle at 1, not 3
    val out = triples(Distances.fromLandmarks(
      edges(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")), lm("a")))
    assert(out(("d", "a", 1)) && !out.exists(t => t._1 == "d" && t._3 == 3))
  }

  test("multi-source: k landmarks advance in one BFS, per-landmark rows") {
    val e = edges(("a", "b"), ("b", "c"), ("x", "b"))
    val out = triples(Distances.fromLandmarks(e, lm("a", "x")))
    assert(out == Set(("a", "a", 0), ("b", "a", 1), ("c", "a", 2),
      ("x", "x", 0), ("b", "x", 1), ("c", "x", 2)))
  }

  test("cycles terminate; unreachable nodes are absent, not infinite") {
    val e = edges(("a", "b"), ("b", "a"), ("b", "c"), ("z", "q"))
    val out = triples(Distances.fromLandmarks(e, lm("a")))
    assert(out == Set(("a", "a", 0), ("b", "a", 1), ("c", "a", 2)))
  }

  test("maxDepth bounds the frontier expansion") {
    val e = edges(("a", "b"), ("b", "c"), ("c", "d"))
    val out = triples(Distances.fromLandmarks(e, lm("a"), maxDepth = 2))
    assert(out == Set(("a", "a", 0), ("b", "a", 1), ("c", "a", 2)))
    val zero = triples(Distances.fromLandmarks(e, lm("a"), maxDepth = 0))
    assert(zero == Set(("a", "a", 0)))
  }

  test("a landmark missing from the graph still settles itself at 0") {
    val out = triples(Distances.fromLandmarks(edges(("a", "b")), lm("zz")))
    assert(out == Set(("zz", "zz", 0)))
  }

  test("partition-layout invariance and duplicate-edge tolerance") {
    val e = edges(("a", "b"), ("b", "c"), ("a", "b"), ("c", "d"), ("b", "c"))
    val one = triples(Distances.fromLandmarks(e.coalesce(1), lm("a", "b")))
    val many = triples(Distances.fromLandmarks(e.repartition(7), lm("b", "a")))
    assert(one == many)
    assert(one.size == 7)
  }
}
