package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bipartite co-occurrence projection — from (container, item) membership
  * rows to the weighted item–item graph: entities co-mentioned across
  * documents (the edge source link prediction and EL-coherence consume),
  * parts co-ordered, terms co-occurring in passages. The projection is the
  * standard first step from raw membership data to a homogeneous graph.
  *
  * Shape: dedup membership → container-keyed self-join (item_a < item_b) →
  * pair-keyed count, `minCount` filter. Every step is an equi join or a
  * map-side-combined aggregate. The hazard is the per-container QUADRATIC
  * (a container with d items emits d·(d−1)/2 pairs; one 10⁶-item container
  * is 5·10¹¹ rows): containers over `maxPerContainer` are EXCLUDED, with
  * the drop counted and warned in-operator (the no-silent-caps rule;
  * pathological containers — "the document every entity appears in" —
  * carry no pair signal anyway, the same argument as LinkPrediction's
  * maxHubDegree). The size gate reuses the same lazily-materialized
  * membership table the join reads, so accounting adds no extra job.
  */
object Cooccur {

  /** (item_a, item_b, n_common) with item_a < item_b (string order — cast
    * upstream for numeric ids if numeric order matters downstream; counts
    * are unaffected) and n_common ≥ minCount. */
  def project(df: DataFrame, containerCol: String, itemCol: String,
      minCount: Long = 2L, maxPerContainer: Int = 10000): DataFrame = {
    require(minCount >= 1, "Cooccur.project: minCount must be >= 1")
    require(maxPerContainer > 1, "Cooccur.project: maxPerContainer must be > 1")
    val m = graft.Materialize(df
      .select(col(containerCol).cast("string").as("c"),
        col(itemCol).cast("string").as("i"))
      .where(col("c").isNotNull && col("i").isNotNull)
      .distinct(), eager = false)
    val sizes = graft.Materialize(m.groupBy("c").count(), eager = false)
    graft.Audit.capAccounting(sizes, maxPerContainer, "Cooccur.project") {
      (nGroups, nRows) =>
        s"Cooccur.project: excluding $nGroups containers over " +
          s"$maxPerContainer items (covering $nRows membership rows); " +
          "their pairs are not counted — raise maxPerContainer if they " +
          "carry signal"
    }
    val kept = m.join(sizes.where(col("count") <= maxPerContainer), Seq("c"))
    kept.select(col("c"), col("i").as("item_a"))
      .join(kept.select(col("c"), col("i").as("item_b")), Seq("c"))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCount)
  }
}
