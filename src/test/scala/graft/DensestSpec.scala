package graft

import graft.graph.Densest
import org.apache.spark.sql.functions._

class DensestSpec extends SparkSuite {
  import spark.implicits._

  private def peel(edges: Seq[(String, String)]) =
    Densest.peel(edges.toDF("src", "dst"))

  test("planted clique on a long path: peeling recovers exactly the " +
    "clique, with its exact density") {
    // path p0-…-p99 (density → 99/100) + K8 (density 28/8 = 3.5), bridged
    val path = (0 until 100).sliding(2).map(p => (s"p${p(0)}", s"p${p(1)}")).toSeq
    val k8 = for { u <- 0 until 8; v <- 0 until 8 if u < v }
      yield (s"k$u", s"k$v")
    val rows = peel(path ++ k8 ++ Seq(("p0", "k0")))
      .as[(String, Int, Long, Long, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == (0 until 8).map(i => s"k$i"))
    assert(rows.forall(r => r._3 == 8 && r._4 == 28 && r._5 == 3.5))
  }

  test("round 1 (the whole graph) wins when the graph is uniformly dense; " +
    "density is E/V at 6dp") {
    val k6 = for { u <- 0 until 6; v <- 0 until 6 if u < v }
      yield (s"c$u", s"c$v")
    val rows = peel(k6).as[(String, Int, Long, Long, Double)].collect()
    assert(rows.length == 6 && rows.forall(_._2 == 1))
    assert(rows.forall(r => r._4 == 15 && r._5 == 2.5))
  }

  test("2(1+eps) approximation holds against the exhaustive optimum on a " +
    "small mixed graph") {
    // optimum here: the K5 (density 2.0)
    val k5 = for { u <- 0 until 5; v <- 0 until 5 if u < v }
      yield (s"k$u", s"k$v")
    val star = (1 until 12).map(i => ("hub", s"s$i"))
    val got = peel(k5 ++ star ++ Seq(("k0", "hub")))
      .as[(String, Int, Long, Long, Double)].collect()
    val density = got.head._5
    assert(density >= 2.0 / 3.0) // 2(1+1/2) = 3-approx floor
    // peeling strips the degree-1 star leaves in wave 1; the best
    // subgraph is the clique plus the bridged hub: 11 edges on 6 nodes
    assert(got.map(_._1).sorted.toSeq ==
      "hub" +: (0 until 5).map(i => s"k$i"))
    assert(got.forall(r => r._3 == 6 && r._4 == 11 && r._5 == 1.833333))
  }

  test("degenerate inputs: empty edge list and self-loop-only input " +
    "return empty; duplicates and orientation do not matter") {
    assert(peel(Seq.empty[(String, String)]).count() == 0)
    assert(peel(Seq(("x", "x"))).count() == 0)
    val tri = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "b"))
    val rows = peel(tri).as[(String, Int, Long, Long, Double)].collect()
    assert(rows.length == 3 && rows.forall(r => r._4 == 3 && r._5 == 1.0))
  }
}
