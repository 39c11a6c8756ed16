package graft

import graft.graph.Truss

class TrussSpec extends SparkSuite {
  import spark.implicits._

  private def truss(es: Seq[(String, String)], k: Int) =
    Truss.kTruss(es.toDF("src", "dst"), k)
      .as[(String, String, Long)].collect().toSet

  /** Independent oracle: sequential peel — naive per-edge triangle count
    * over driver sets, remove-below-threshold, loop to fixpoint. */
  private def peelSeq(es: Seq[(String, String)], k: Int): Set[(String, String, Long)] = {
    var edges = es.filter(e => e._1 != e._2)
      .map(e => if (e._1 <= e._2) e else e.swap).distinct.toSet
    def supports(s: Set[(String, String)]): Map[(String, String), Long] = {
      val adj = scala.collection.mutable.Map[String, Set[String]]().withDefaultValue(Set())
      s.foreach { case (u, v) => adj(u) += v; adj(v) += u }
      s.map { case (u, v) => (u, v) -> (adj(u) & adj(v)).size.toLong }.toMap
    }
    var stable = false
    while (!stable) {
      val sup = supports(edges)
      val kept = edges.filter(e => sup(e) >= k - 2)
      stable = kept == edges
      edges = kept
    }
    val supF = supports(edges)
    edges.map(e => (e._1, e._2, supF(e)))
  }

  test("K4: every edge closes 2 triangles — a 4-truss; its 5-truss is empty") {
    val k4 = for (i <- 0 until 4; j <- i + 1 until 4) yield (s"k$i", s"k$j")
    val out4 = truss(k4, 4)
    assert(out4.size == 6 && out4.forall(_._3 == 2L))
    assert(truss(k4, 5).isEmpty)
  }

  test("pendant edges drop from the 3-truss, the triangle survives") {
    val es = Seq("a" -> "b", "b" -> "c", "a" -> "c", "c" -> "tail")
    assert(truss(es, 3) ==
      Set(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 1L)))
  }

  test("peeling cascades: two triangles sharing an edge dissolve at k=4") {
    // shared edge (b,c) has support 2, the four outer edges support 1:
    // round 1 peels the outer edges, round 2 starves and peels (b,c)
    val es = Seq("a" -> "b", "a" -> "c", "b" -> "c", "b" -> "d", "c" -> "d")
    assert(truss(es, 4).isEmpty)
    // at k=3 everything survives (every edge in >= 1 triangle)
    assert(truss(es, 3).size == 5)
  }

  test("matches the sequential peel on a pseudo-random graph, several k") {
    val es = for {
      i <- 0 until 24; j <- i + 1 until 24
      if (i * 19 + j * 31) % 4 != 0
    } yield (s"t$i", s"t$j")
    for (k <- Seq(3, 4, 5, 6))
      assert(truss(es, k) == peelSeq(es, k), s"k=$k mismatch")
  }

  test("deterministic across partition layouts; direction/duplicates ignored") {
    val es = Seq("a" -> "b", "b" -> "a", "b" -> "c", "a" -> "c", "c" -> "a")
    val df1 = es.toDF("src", "dst").repartition(1)
    val df7 = es.toDF("src", "dst").repartition(7)
    val a = Truss.kTruss(df1, 3).as[(String, String, Long)].collect().toSet
    val b = Truss.kTruss(df7, 3).as[(String, String, Long)].collect().toSet
    assert(a == b && a == Set(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 1L)))
  }
}
