package graft

import graft.canon.ConnectedComponents

class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def cc(edges: (String, String)*): Map[String, String] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(String, String)].collect().toMap

  /** Force the distributed large-star/small-star path. */
  private def ccDist(edges: (String, String)*): Map[String, String] =
    ConnectedComponents.run(edges.toDF("src", "dst"), smallThreshold = -1L)
      .as[(String, String)].collect().toMap

  test("driver union-find and distributed path agree on every shape") {
    val shapes: Seq[Seq[(String, String)]] = Seq(
      Seq(("b", "a"), ("c", "b"), ("y", "z")), // two components
      Seq(("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"), ("a", "b")), // chain
      Seq(("a", "b"), ("b", "c"), ("c", "a")), // cycle
      (1 to 30).map(i => (f"n$i%03d", "hub")), // star
      Seq(("a", "a"), ("a", "b"))) // self loop
    shapes.foreach { es =>
      assert(cc(es: _*) == ccDist(es: _*), s"paths disagree on $es")
    }
  }

  test("two disjoint components") {
    val m = cc(("b", "a"), ("c", "b"), ("y", "z"))
    assert(m == Map("a" -> "a", "b" -> "a", "c" -> "a", "y" -> "y", "z" -> "y"))
  }

  test("chain converges to min") {
    val m = cc(("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"), ("a", "b"))
    assert(m.values.toSet == Set("a"))
    assert(m.keySet == Set("a", "b", "c", "d", "e", "f"))
  }

  test("cycle") {
    val m = cc(("a", "b"), ("b", "c"), ("c", "a"))
    assert(m == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("star with high-degree hub (mega-vendor shape)") {
    val spokes = (1 to 50).map(i => (f"n$i%03d", "hub"))
    val m = cc(spokes: _*)
    assert(m.values.toSet == Set("hub")) // "hub" < "n001"
    assert(m.size == 51)
  }

  test("empty edge set") {
    val m = cc()
    assert(m.isEmpty)
  }

  test("self loops ignored") {
    val m = cc(("a", "a"), ("a", "b"))
    assert(m == Map("a" -> "a", "b" -> "a"))
  }

  test("idempotent: running CC twice gives identical labels") {
    val edges = Seq(("b", "a"), ("c", "b"), ("x", "w"))
    assert(cc(edges: _*) == cc(edges: _*))
  }

  test("canonicalMap picks highest count, then fewest digits, then longest") {
    val comps = Seq(("a", "a"), ("b", "a"), ("c", "a")).toDF("id", "component")
    val counts = Seq(("a", 1L), ("b", 5L), ("c", 2L)).toDF("id", "n")
    val m = ConnectedComponents.canonicalMap(comps, counts)
      .as[(String, String)].collect().toMap
    assert(m == Map("a" -> "b", "b" -> "b", "c" -> "b"))

    // tie on count: clean (no digits) beats noisy, longer beats truncated
    val comps2 = Seq(("atla5_tech", "atla5_tech"), ("atlas_tech", "atla5_tech"),
      ("atlas", "atla5_tech")).toDF("id", "component")
    val counts2 = Seq(("atla5_tech", 2L), ("atlas_tech", 2L), ("atlas", 2L)).toDF("id", "n")
    val m2 = ConnectedComponents.canonicalMap(comps2, counts2)
      .as[(String, String)].collect().toMap
    assert(m2.values.toSet == Set("atlas_tech"))
  }

  test("canonicalMap keeps singletons (ids absent from components)") {
    val comps = Seq(("a", "a"), ("b", "a")).toDF("id", "component")
    val counts = Seq(("a", 1L), ("b", 1L), ("solo", 3L)).toDF("id", "n")
    val m = ConnectedComponents.canonicalMap(comps, counts)
      .as[(String, String)].collect().toMap
    assert(m("solo") == "solo")
  }
}
