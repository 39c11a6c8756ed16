package graft

import graft.canon.CorrCluster

class CorrClusterSpec extends SparkSuite {
  import spark.implicits._

  /** Driver replica of the portable priority: TextOps.fingerprint pushed
    * through the two MINSTD LCG rounds (Sketch.kmvHash). */
  private def pri(s: String): (Long, String) = {
    var h = 0L
    s.foreach(ch => h = (h * 31 + ch.toInt) % 2147483647L)
    val r1 = (h * 48271 + 12345) % 2147483647L
    ((r1 * 69621 + 54321) % 2147483647L, s)
  }

  /** Independent reference: the SEQUENTIAL pivot scan, literally —
    * vertices in π order, unclustered vertex pivots and grabs its
    * unclustered neighbors. */
  private def sequential(edges: Seq[(String, String)]): Map[String, String] = {
    val nbrs = scala.collection.mutable.Map.empty[String, Set[String]]
      .withDefaultValue(Set.empty)
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      nbrs(a) += b; nbrs(b) += a
    }
    val order = nbrs.keys.toSeq.sortBy(pri)
    val cl = scala.collection.mutable.Map.empty[String, String]
    for (v <- order if !cl.contains(v)) {
      cl(v) = v
      nbrs(v).foreach(u => if (!cl.contains(u)) cl(u) = v)
    }
    cl.toMap
  }

  private def engine(edges: Seq[(String, String)]): Map[String, String] =
    CorrCluster.pivotClusters(edges.toDF("src", "dst").repartition(4))
      .as[(String, String)].collect().toMap

  test("parallel MIS+assign == sequential pivot scan on random graphs") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val vs = (0 until 50).map(i => f"s${seed}v$i%02d")
      val edges = for {
        i <- vs.indices; j <- (i + 1) until vs.length
        if rnd.nextDouble() < 0.06
      } yield (vs(i), vs(j))
      assert(engine(edges) === sequential(edges), s"seed=$seed")
    }
  }

  test("long chains (the round-local assignment trap surfaces on paths)") {
    // a later-round pivot can out-rank the first-round pivot that touches
    // a vertex; chains maximize pivot-delay depth, so sequential equality
    // here is what rules the greedy-round shortcut out
    for (tag <- Seq("a", "b", "c", "d")) {
      val vs = (0 until 40).map(i => f"$tag%sc$i%02d")
      val chain = vs.sliding(2).map(p => (p(0), p(1))).toSeq
      assert(engine(chain) === sequential(chain), s"chain $tag")
    }
  }

  test("pivot-cluster structural invariants") {
    val rnd = new scala.util.Random(99)
    val vs = (0 until 60).map(i => f"x$i%02d")
    val edges = (for {
      i <- vs.indices; j <- (i + 1) until vs.length
      if rnd.nextDouble() < 0.05
    } yield (vs(i), vs(j))).toSeq
    val cl = engine(edges)
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupMap(_._1)(_._2)
      .view.mapValues(_.toSet).toMap
    val pivots = cl.collect { case (v, c) if v == c => v }.toSet
    // every vertex appears exactly once, labeled by a pivot
    assert(cl.keySet === vs.toSet.filter(adj.contains))
    assert(cl.values.toSet.subsetOf(pivots))
    // members are DIRECT neighbors of their pivot (the anti-hairball rule)
    cl.foreach { case (v, c) => if (v != c) assert(adj(v)(c), s"$v -> $c") }
    // pivot set is independent and maximal
    pivots.foreach(p => assert((adj(p) & pivots).isEmpty, s"pivot edge at $p"))
    cl.foreach { case (v, _) =>
      if (!pivots(v)) assert((adj(v) & pivots).nonEmpty, s"$v unreached") }
  }

  test("degenerate inputs: self-loops dropped, empty graph, one edge") {
    assert(engine(Seq(("a", "a"))).isEmpty)
    assert(engine(Seq.empty).isEmpty)
    val one = engine(Seq(("u1", "u2")))
    assert(one === sequential(Seq(("u1", "u2"))))
    assert(one.values.toSet.size === 1)
  }
}
