package graft

import graft.graph.TransitiveReduction

class TransitiveReductionSpec extends SparkSuite {
  import spark.implicits._

  private def reduce(rows: (String, String)*) =
    TransitiveReduction.reduce(rows.toDF("src", "dst"))
      .as[(String, String)].collect().toSet

  /** Independent oracle: driver Floyd-Warshall reachability, then keep
    * edge (u,v) iff no intermediate w has u→w and w→v. */
  private def reduceSeq(rows: Seq[(String, String)]): Set[(String, String)] = {
    val es = rows.filter(e => e._1 != e._2).distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val reach = scala.collection.mutable.Set[(String, String)](es: _*)
    for (k <- nodes; i <- nodes; j <- nodes)
      if (reach((i, k)) && reach((k, j))) reach += ((i, j))
    es.filter { case (u, v) =>
      !nodes.exists(w => w != u && w != v && reach((u, w)) && reach((w, v)))
    }.toSet
  }

  test("the diamond shortcut drops, chain edges stay") {
    // a->b->c plus shortcut a->c: reduction is the chain
    assert(reduce("a" -> "b", "b" -> "c", "a" -> "c") ==
      Set("a" -> "b", "b" -> "c"))
  }

  test("multi-level taxonomy: every skip edge drops, tree edges survive") {
    val edges = Seq("root" -> "m1", "m1" -> "m2", "m2" -> "leaf",
      "root" -> "m2", "root" -> "leaf", "m1" -> "leaf")
    assert(reduce(edges: _*) ==
      Set("root" -> "m1", "m1" -> "m2", "m2" -> "leaf"))
  }

  test("already-reduced DAGs are fixpoints (diamond without shortcut)") {
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d")
    assert(reduce(edges: _*) == edges.toSet)
  }

  test("matches the Floyd-Warshall oracle on a layered pseudo-random DAG") {
    // 4 layers x 5 nodes; edges only to deeper layers (a DAG by layering),
    // selected deterministically
    val rows = for {
      l1 <- 0 until 3; i <- 0 until 5
      l2 <- (l1 + 1) to 3; j <- 0 until 5
      if (l1 * 7 + i * 13 + l2 * 3 + j * 11) % 4 == 0
    } yield (s"n${l1}_$i", s"n${l2}_$j")
    assert(reduce(rows: _*) == reduceSeq(rows))
  }

  test("duplicates and self-loops are ignored") {
    assert(reduce("a" -> "b", "a" -> "b", "a" -> "a", "b" -> "c", "a" -> "c") ==
      Set("a" -> "b", "b" -> "c"))
  }
}
