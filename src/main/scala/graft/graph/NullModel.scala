package graft.graph

import graft.ops.Sketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Configuration-model rewiring (Molloy & Reed 1995; Newman 2003 §4.1) —
  * the degree-preserving NULL MODEL every graph statistic is judged
  * against: "is the real assortativity / clustering / motif count a
  * structure signal, or just what any graph with these degrees looks
  * like?" Each node keeps its exact degree; the wiring is re-dealt by
  * pairing the degree stubs in a deterministic pseudo-random order.
  *
  * Determinism (so the DuckDB oracle replays it row for row): stub i of
  * node n keys as `portableHash(n || '#' || i)`; stubs sort globally by
  * (key, node, i) and consecutive stubs pair. Self-loops and multi-edges
  * are KEPT — that is the configuration model (collapsing them would
  * perturb the degree sequence). Input edges are treated as a SIMPLE
  * directed edge set (distinct applied; parallel input edges would make
  * the per-node stub index ambiguous).
  *
  * Scale: two row_number windows — per-node stub index (node-keyed) and
  * the global pairing order. The global window is the documented
  * entity-scale idiom (q129); at 10^12 edges, range-partition by key and
  * pair within partitions after rebalancing boundaries — same contract,
  * partition-local windows. */
object NullModel {

  /** Returns the rewired edge multiset, canonicalized (a ≤ b) with a
    * multiplicity count: (a, b, n). */
  def rewire(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val stubs = e.select(col("src").as("node"), col("dst").as("other"),
        lit(0).as("side"))
      .unionByName(e.select(col("dst").as("node"), col("src").as("other"),
        lit(1).as("side")))
    val stubIdx = row_number().over(
      Window.partitionBy("node").orderBy(col("other"), col("side")))
    val keyed = stubs.withColumn("i", stubIdx)
      .withColumn("key",
        Sketch.kmvHash(concat(col("node"), lit("#"), col("i"))))
    val gpos = row_number().over(
      Window.orderBy(col("key"), col("node"), col("i")))
    keyed.withColumn("g", gpos)
      .withColumn("pair", call_function("div", col("g") - 1, lit(2L)))
      .groupBy("pair")
      .agg(min("node").as("a"), max("node").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
  }
}
