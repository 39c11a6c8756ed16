package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural summaries of a triple graph — the statistics a KG engine
  * keeps beside the store for query planning and corpus QA.
  *
  * `characteristicSets` implements the characteristic-sets summary of
  * Neumann & Moerkotte (ICDE 2011, "Characteristic sets: Accurate
  * cardinality estimation for RDF queries with multiple joins"): subjects
  * are grouped by the SET of predicates they carry; each distinct set is
  * one "entity shape" with its subject count and total triple count. It
  * is simultaneously (a) the standard cardinality model for star-join
  * SPARQL planning, (b) an emergent schema of a schema-less graph, and
  * (c) the corpus-QA signal for malformed entities (a shape with a tiny
  * subject count and an unexpected predicate combination is usually an
  * extraction bug — complementary to Validate's declared shapes).
  *
  * Scale shape: two aggregations — subject-keyed (the same shuffle key as
  * every star join; map-side partial aggregation collapses each subject's
  * predicates before the exchange) then shape-keyed (output is the number
  * of DISTINCT SHAPES, tiny). The predicate set is emitted as a sorted
  * comma-joined string (`pred_set`) so downstream grouping/joining stays
  * codegen-friendly and storage-stable; predicate vocabularies are small
  * by construction, so the string is bounded.
  */
object GraphStats {

  /** triples: (subj, pred, ...) — extra columns ignored. Returns one row
    * per distinct predicate set: (pred_set: string — sorted,
    * comma-joined; n_subjects; n_triples). */
  def characteristicSets(triples: DataFrame): DataFrame =
    triples
      .groupBy("subj")
      .agg(array_join(array_sort(collect_set(col("pred"))), ",").as("pred_set"),
        count(lit(1)).as("nt"))
      .groupBy("pred_set")
      .agg(count(lit(1)).as("n_subjects"), sum("nt").as("n_triples"))
}
