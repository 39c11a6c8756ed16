package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-constraint consistency audit — the owl:differentFrom check: a
  * canonicalization that merges by sameAs connected components is
  * CONSISTENT iff no differentFrom edge ends up INSIDE a component
  * (merging two entities asserted distinct means some sameAs chain is
  * wrong — usually one noisy match link gluing two real-world entities).
  * This is the audit a KG constructor runs between linking and
  * materialization; its output is the worklist for the repair operators
  * ([[CorrCluster]], [[graft.graph.TwoEdgeCC]], [[graft.graph.Bridges]]
  * — the violated component's bridges are the natural cut candidates).
  *
  * Shape: one [[ConnectedComponents]] run over the sameAs edges, two
  * label-resolve joins mapping each differentFrom edge to component
  * space (entities unseen by sameAs are their own singleton component),
  * one equality filter. Everything shuffles on entity keys; the
  * violation set is constraint-scale.
  *
  * Output: one row per VIOLATED differentFrom pair —
  * (entity_a, entity_b, component), a < b normalized, deduped; empty
  * output == consistent. Self-pairs in differentFrom are inherently
  * violated (a component always contains itself) and are reported with
  * the entity's component label. */
object Constraints {

  def differentFromViolations(sameAs: DataFrame,
      differentFrom: DataFrame): DataFrame = {
    val cc = ConnectedComponents.run(sameAs)
    val d = differentFrom
      .select(least(col("src").cast("string"), col("dst").cast("string"))
          .as("entity_a"),
        greatest(col("src").cast("string"), col("dst").cast("string"))
          .as("entity_b"))
      .where(col("entity_a").isNotNull && col("entity_b").isNotNull)
      .distinct()
    def resolve(c: String) =
      cc.select(col("id").as(c), col("component").as(s"__c_$c"))
    d.join(resolve("entity_a"), Seq("entity_a"), "left")
      .join(resolve("entity_b"), Seq("entity_b"), "left")
      .where(coalesce(col("__c_entity_a"), col("entity_a")) ===
        coalesce(col("__c_entity_b"), col("entity_b")))
      .select(col("entity_a"), col("entity_b"),
        coalesce(col("__c_entity_a"), col("entity_a")).as("component"))
  }
}
