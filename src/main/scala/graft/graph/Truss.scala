package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss extraction (Cohen, NSA TR 2008) — the maximal subgraph in
  * which every edge closes ≥ k−2 triangles WITHIN the subgraph. The
  * cohesion filter a KG consumer runs on the sameAs/co-occurrence graph:
  * a 2-core keeps long chains (one noisy link chains two entity clusters
  * together), a k-truss demands every surviving link be triangle-backed —
  * mutually corroborated — which is the strongest cheap guard against
  * transitive-closure contamination before canonicalization.
  *
  * Iterative peeling: compute per-edge support (triangles through the
  * edge, counted over the CURRENT edge set), drop edges under k−2,
  * repeat to the fixpoint — dropping an edge can starve its neighbors,
  * so one pass is not enough (the cascade is the algorithm). Per round:
  * triangle enumeration as two equi joins over the degree-ORIENTED edge
  * list (each triangle found exactly once from its lowest-order corner —
  * the standard distributed-triangle trick that bounds the wedge blowup
  * by Σ d_out², with out-degrees ≤ √(2E) under degree orientation), one
  * explode(3) + edge-keyed count aggregate, one anti join. Rounds ≤ the
  * peel depth (small for real graphs); the removal count driving the
  * loop is the round's one action. Deterministic: support counts are
  * exact, the threshold is a pure predicate — the fixpoint is unique
  * (the k-truss is a well-defined maximal object). */
object Truss {

  /** Edges of the k-truss of the UNDIRECTED graph (k ≥ 3): returns the
    * canonical surviving edge list (src < dst) with each edge's support
    * within the truss. Parallel edges and self-loops are dropped. */
  def kTruss(edges: DataFrame, k: Int, srcCol: String = "src",
      dstCol: String = "dst", maxRounds: Int = 100): DataFrame = {
    require(k >= 3, "kTruss: k must be >= 3 (k=2 is just the edge set)")
    require(maxRounds >= 1, "kTruss: maxRounds must be >= 1")
    val s = col(srcCol).cast("string")
    val d = col(dstCol).cast("string")
    var e = graft.Materialize(edges
      .where(s.isNotNull && d.isNotNull && s =!= d)
      .select(least(s, d).as("u"), greatest(s, d).as("v"))
      .distinct())
    val minSupport = k - 2
    var round = 0
    var done = false
    var support: DataFrame = null
    while (!done && round < maxRounds) {
      round += 1
      // degree orientation: order nodes by (degree, id); orient every edge
      // low→high so each triangle is one wedge at its lowest corner
      val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val ranked = e
        .join(deg.select(col("n").as("u"), struct(col("deg"), col("n")).as("ou")), "u")
        .join(deg.select(col("n").as("v"), struct(col("deg"), col("n")).as("ov")), "v")
      val oriented = graft.Materialize(ranked.select(
        when(col("ou") < col("ov"), col("u")).otherwise(col("v")).as("lo"),
        when(col("ou") < col("ov"), col("v")).otherwise(col("u")).as("hi")),
        eager = false)
      // wedges at the low corner, closed by the third edge (any orientation
      // — test both canonical slots via the original canonical list)
      val w1 = oriented.select(col("lo").as("a"), col("hi").as("b"))
      val w2 = oriented.select(col("lo").as("a"), col("hi").as("c"))
      val tris = w1.join(w2, "a").where(col("b") < col("c"))
        .join(e.select(col("u").as("bu"), col("v").as("bv")),
          col("bu") === col("b") && col("bv") === col("c"), "left_semi")
      // each triangle supports its three canonical edges
      val sup = tris.select(explode(array(
          struct(col("a").as("x"), col("b").as("y")), // a<b not guaranteed
          struct(col("a").as("x"), col("c").as("y")),
          struct(col("b").as("x"), col("c").as("y")))).as("t"))
        .select(least(col("t.x"), col("t.y")).as("u"),
          greatest(col("t.x"), col("t.y")).as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
      val kept = graft.Materialize(
        e.join(sup, Seq("u", "v"), "left")
          .select(col("u"), col("v"),
            coalesce(col("support"), lit(0L)).as("support")),
        eager = false)
      val counts = kept.agg(count(lit(1)).as("n"),
        sum(when(col("support") >= minSupport, 1L).otherwise(0L)).as("ok")).head()
      val (n, ok) = (counts.getLong(0), if (counts.isNullAt(1)) 0L else counts.getLong(1))
      if (ok == n) { // fixpoint — every surviving edge meets the threshold
        done = true
        support = kept
      } else {
        e = graft.Materialize(
          kept.where(col("support") >= minSupport).select("u", "v"),
          eager = false)
      }
    }
    if (!done)
      throw new IllegalStateException(
        s"kTruss did not reach the peel fixpoint in $maxRounds rounds")
    support.select(col("u").as("src"), col("v").as("dst"), col("support"))
  }
}
