package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triples → wide entity table: the first thing every downstream consumer
  * of the KG does (feature tables for link prediction, export to a
  * warehouse dimension, join-ready vendor attributes). One row per subj,
  * one column per REQUESTED predicate.
  *
  * Deliberately NOT `RelationalGroupedDataset.pivot()`: pivot without
  * explicit values runs a whole extra distinct-scan job over 10^12 triples
  * to discover the column set, and a KG's open pred vocabulary would
  * explode it. The caller names the preds; the operator compiles them to
  * conditional aggregates — `max(when(pred = p, obj))` — so the plan is a
  * single hash aggregate with map-side partial combine.
  *
  * Scale: the `pred IN (...)` pre-filter reaches the scan (over the
  * pred-partitioned triple store it prunes whole directories — only the
  * requested predicates are ever read); one exchange on hash(subj).
  * Multi-valued preds resolve deterministically to max(obj) — layout- and
  * cluster-size-independent, which is what makes a hash oracle possible;
  * use `nValsCol` to surface how much each row collapsed (no silent
  * many-to-one). Null subj/obj rows drop; a subj carrying none of the
  * requested preds is absent (this is a projection of the graph, not an
  * entity directory).
  */
object EntityTable {

  def entityTable(triples: DataFrame, preds: Seq[String],
      nValsCol: Option[String] = None): DataFrame = {
    require(preds.nonEmpty, "entityTable: preds must be non-empty")
    require(preds.distinct == preds, "entityTable: preds must be distinct")
    val base = triples
      .where(col("subj").isNotNull && col("obj").isNotNull &&
        col("pred").isin(preds: _*))
    val cols = preds.map(p => max(when(col("pred") === p, col("obj"))).as(p))
    val extra = nValsCol.map(c => count(lit(1)).as(c)).toSeq
    base.groupBy("subj").agg((cols ++ extra).head, (cols ++ extra).tail: _*)
  }
}
