package graft.canon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot correlation clustering (QuickCluster — Ailon, Charikar & Newman,
  * JACM 2008): cluster a similarity graph so that positive edges mostly
  * fall inside clusters and absent edges across them — the classic
  * 3-approximation for minimizing disagreements. The ER use: connected
  * components over-merge ("hairball" sameAs clusters chained through one
  * noisy match); a pivot cluster only ever contains DIRECT positive
  * neighbors of its pivot, so one bad edge contaminates one cluster
  * instead of bridging two — the standard repair step between candidate
  * matching and canonicalization.
  *
  * Sequential semantics (what the oracle replays pivot-by-pivot): scan
  * vertices in priority order π; an unclustered vertex becomes a PIVOT
  * and grabs all its still-unclustered positive neighbors. π here is the
  * portable fingerprint [[graft.ops.Sketch.kmvHash]] with the id as
  * tie-break — a total order any engine can recompute, so the result is
  * a pure function of the graph (the derandomization lever used across
  * this codebase; the approximation guarantee holds in expectation over
  * a random π, which the keyed hash emulates).
  *
  * Engine shape — NOT a sequential scan. Two facts decompose the
  * problem into operators this engine already has:
  *
  *   1. The pivot set is exactly the lexicographically-first MIS w.r.t.
  *      π: a vertex pivots iff no π-smaller neighbor pivots (if one
  *      does, it grabs this vertex first; grabbed vertices stop blocking
  *      others — the same removal rule the MIS local-min rounds apply).
  *      So pivots = [[graft.graph.Mis.maximalIndependentSet]] with π
  *      plugged in (parallel local-min rounds == the sequential greedy
  *      scan — Blelloch, Fineman & Shun, SPAA 2012).
  *   2. A non-pivot's cluster is the π-MINIMUM pivot among its
  *      neighbors: pivots are created in increasing π order, and the
  *      smallest adjacent one always finds the vertex still unclustered
  *      (any earlier grab would contradict that minimality). One
  *      edge-scale join + a node-keyed min aggregate.
  *
  * NOTE the round-local trap this avoids: assigning each vertex to the
  * π-minimum pivot of the round that first touches it is WRONG — a
  * π-smaller neighbor can become a pivot in a LATER round (delayed
  * behind its own smaller neighbor that ends up grabbed by a third
  * pivot) and sequential semantics give it the vertex.
  *
  * Output: (id, cluster) for every vertex of `edges`, cluster = pivot
  * id. Self-loops and nulls are dropped; isolated vertices never appear
  * in `edges` and are their own (implicit) singleton clusters. */
object CorrCluster {

  private def prio(c: Column): Column =
    struct(graft.ops.Sketch.kmvHash(c).as("h"), c.as("i"))

  def pivotClusters(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxRounds: Int = 200): DataFrame = {
    val und = edges
      .select(col(srcCol).cast("string").as("a"),
        col(dstCol).cast("string").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val pivots = graft.Materialize(
      graft.graph.Mis.maximalIndependentSet(und, "a", "b", maxRounds,
        prioOf = prio).select("id"),
      eager = false)
    // symmetric edge list so one pass sees every (vertex, neighbor) pair
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
    val grabbed = sym
      .join(pivots.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      .join(pivots.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
      .groupBy(col("a").as("id"))
      .agg(min(prio(col("b"))).getField("i").as("cluster"))
    pivots.select(col("id"), col("id").as("cluster")).union(grabbed)
  }
}
