package graft

import graft.graph.Katz

class KatzSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], L: Int = 4, inv: Long = 4) =
    Katz.boundedKatz(edges.toDF("src", "dst"), L, inv)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("path graph: geometric level weights, exact fixed point") {
    val out = run(Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e"))
    assert(out("b") == (64L, 1L))            // one length-1 walk
    assert(out("c") == (64L + 16L, 2L))      // a->b->c adds 16
    assert(out("d") == (64L + 16L + 4L, 3L))
    assert(out("e") == (64L + 16L + 4L + 1L, 4L))
    assert(!out.contains("a"))               // no incoming walks
  }

  test("star: center collects one weight-64 walk per leaf") {
    val out = run((1 to 5).map(i => s"x$i" -> "hub"))
    assert(out == Map("hub" -> (5L * 64L, 5L)))
  }

  test("diamond: walk MULTIPLICITY counts (not reachability)") {
    val out = run(Seq("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d"))
    assert(out("d") == (2L * 64L + 2L * 16L, 4L)) // two level-1, two level-2
    assert(out("b") == (64L, 1L) && out("c") == (64L, 1L))
  }

  test("horizon truncates: L = 1 is weighted indegree") {
    val out = run(Seq("a" -> "b", "b" -> "c", "c" -> "d"), L = 1)
    assert(out == Map("b" -> (1L, 1L), "c" -> (1L, 1L), "d" -> (1L, 1L)))
  }
}
