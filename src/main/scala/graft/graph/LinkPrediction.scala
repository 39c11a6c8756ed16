package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction — the classic missing-edge scorer
  * a KG team runs over the constructed graph to PROPOSE candidate facts
  * (unrecorded vendor sameAs links, likely supplies/located-in edges) for
  * review or as entity-linking recall repair. For every non-adjacent node
  * pair at distance 2, the three standard scores from one wedge pass:
  *
  *   common        |Γ(a) ∩ Γ(b)|                  (common neighbors)
  *   jaccard       |Γ∩| / |Γ(a) ∪ Γ(b)|           (Jaccard overlap)
  *   adamic_adar   Σ_{w ∈ Γ∩} 1 / ln deg(w)       (Adamic–Adar 2003)
  *
  * Execution: canonical undirected edge set → degree table → wedges from a
  * shared neighbor `w` joined as (a ← w → b) with a < b (each common
  * neighbor contributes exactly one wedge row per pair) → anti join
  * against the edge set (predict only MISSING links) → one groupBy (a, b)
  * folding count + Σ1/ln(deg w) → degree join for the Jaccard denominator.
  * All equi joins and one pair-keyed aggregation; nothing driver-side.
  *
  * Scale: the wedge set is Σ_w deg(w)² — inherently quadratic in hub
  * degree (the known cost of CN-family scores). `maxHubDegree` is the
  * standard mitigation: neighbors with degree above the cap contribute no
  * wedges (a node adjacent to half the graph carries no signal about which
  * OTHER half-graph pairs are related — its 1/ln(deg) weight already says
  * so), and the drop is ACCOUNTED in-line via [[graft.Audit]] (the no-
  * silent-caps rule). With the cap, wedge rows ≤ m · maxHubDegree — linear
  * in edges. Adamic–Adar ignores capped hubs entirely rather than
  * approximating them; scores stay exact over the kept wedge set.
  *
  * Determinism: ln on doubles + a pair-keyed Σ; the sum folds over ≤ deg
  * values per pair in partition order, so cross-engine/layout equality is
  * guaranteed only at the emitted 6-dp rounding (same contract as
  * Similarity's cosine scores).
  */
object LinkPrediction {

  /** edges: undirected edge list (either/both directions; duplicates and
    * self-loops dropped). Returns (a, b, common, jaccard, adamic_adar)
    * with a < b, for non-adjacent pairs with ≥ `minCommon` common
    * neighbors. `maxHubDegree` ≤ 0 disables the hub cap. */
  def scores(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      minCommon: Int = 1, maxHubDegree: Int = 0): DataFrame = {
    require(minCommon >= 1, "linkPrediction: minCommon must be >= 1")
    val sc = col(srcCol).cast("string")
    val dc = col(dstCol).cast("string")
    val und = graft.Materialize(edges
      .select(least(sc, dc).as("a"), greatest(sc, dc).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct())
    // adjacency with degrees: one row per (node, neighbor)
    val adj = und.select(col("a").as("id"), col("b").as("nb"))
      .union(und.select(col("b").as("id"), col("a").as("nb")))
    val deg = adj.groupBy("id").agg(count(lit(1)).as("deg"))
    val hubs =
      if (maxHubDegree <= 0) deg
      else {
        // in-line cap accounting (the no-silent-caps rule): count what the
        // cap removes in the same pass that sizes the wedge side
        val stats = graft.Materialize(
          deg.where(col("deg") > maxHubDegree)
            .agg(count(lit(1)).as("n"), coalesce(sum("deg"), lit(0L)).as("edges")),
          eager = false)
        val row = stats.head()
        if (row.getLong(0) > 0)
          graft.Audit.warn(s"linkPrediction: hub cap dropped ${row.getLong(0)} " +
            s"node(s) of degree > $maxHubDegree from the wedge side " +
            s"(${row.getLong(1)} adjacency rows); pairs whose ONLY common " +
            s"neighbors are capped hubs are not scored")
        deg.where(col("deg") <= maxHubDegree)
      }
    // wedges a ← w → b with a < b, from each (kept) shared neighbor w
    val wedgeSide = adj.join(hubs.withColumnRenamed("id", "w")
        .withColumnRenamed("deg", "wdeg"),
      col("id") === col("w")).select(col("w"), col("nb"), col("wdeg"))
    val wedges = wedgeSide.as("l").join(wedgeSide.as("r"),
        col("l.w") === col("r.w") && col("l.nb") < col("r.nb"))
      .select(col("l.nb").as("a"), col("r.nb").as("b"), col("l.wdeg").as("wdeg"))
      // predict MISSING links only: drop pairs already adjacent
      .join(und, Seq("a", "b"), "left_anti")
    val paired = wedges.groupBy("a", "b")
      .agg(count(lit(1)).as("common"),
        sum(lit(1.0) / log(col("wdeg"))).as("aa_raw"))
      .where(col("common") >= minCommon)
    paired
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("common"),
        round(col("common") / (col("da") + col("db") - col("common")), 6).as("jaccard"),
        round(col("aa_raw"), 6).as("adamic_adar"))
  }
}
