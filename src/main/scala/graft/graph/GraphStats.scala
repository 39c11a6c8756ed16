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

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * (deg(src), deg(dst)) over the SYMMETRIZED edge multiset — do hubs
    * link to hubs (r > 0, social-network-shaped) or to leaves (r < 0,
    * web/KG-shaped)? One number that predicts how a KG partitions: a
    * disassortative graph shatters cleanly by hub, an assortative one
    * resists cutting.
    *
    * Computed from EXACT integer moment sums (n, Σx, Σxy, Σx² — one
    * edge-scale aggregate after two degree joins); symmetrization makes
    * the y-moments EQUAL the x-moments, so Pearson's denominator
    * √(nΣx²−(Σx)²)·√(nΣy²−(Σy)²) collapses to the integer nΣx²−(Σx)²
    * and the ONLY float operation is one final division — bit-stable at
    * any partition layout, replayed literally by the oracle:
    *   r = (nΣxy − (Σx)²) / (nΣx² − (Σx)²).
    * Returns one row: (n_edges, sum_x, sum_xy, sum_xx, assortativity).
    * Moment sums are exact longs while Σ deg(a)·deg(b) < 2^63 — beyond
    * (hub degrees near 2^31) switch the sums to DECIMAL(38,0). */
  def assortativity(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
    val deg = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
    val xy = sym
      .join(deg.select(col("id").as("a"), col("deg").as("x")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("y")), Seq("b"))
    xy.agg(count(lit(1)).as("n_edges"),
        sum(col("x")).as("sum_x"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_xx"))
      .select(col("n_edges"), col("sum_x"), col("sum_xy"), col("sum_xx"),
        round((col("n_edges") * col("sum_xy") - col("sum_x") * col("sum_x"))
            .cast("double") /
          (col("n_edges") * col("sum_xx") - col("sum_x") * col("sum_x"))
            .cast("double"), 6).as("assortativity"))
  }
}
