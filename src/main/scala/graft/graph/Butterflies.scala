package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Butterfly census — (2,2)-biclique counting in bipartite graphs (Wang et
  * al., VLDB 2014; Sanei-Mehri et al., KDD 2018). The bipartite analogue
  * of triangle counting: a butterfly is two left nodes sharing two right
  * nodes — in the doc–entity graph, two documents that agree on TWO
  * entities, the minimal "these are not coincidentally related" motif.
  * The butterfly/wedge ratio is the bipartite clustering coefficient: high
  * means template/boilerplate structure (doc families stamped from one
  * form), low means organic citation — the audit signal for "should
  * near-dedup be looking at this corpus harder?"
  *
  * Exact integers, one pass each:
  *   n_wedges      = Σ_r C(deg(r), 2)       (right-keyed degree aggregate)
  *   cop(a,b)      = common right-neighbors per left pair (the wedge join)
  *   n_butterflies = Σ_{a<b} C(cop, 2)
  * Scale shape: the wedge join costs Σ deg(r)² — the triangle bound; the
  * hub treatment is upstream (cap/salt right-side hubs exactly as
  * Triangles/Cooccur do — a right node of degree 10^6 contributes 5·10^11
  * wedges and should be capped with accounting, not silently exploded).
  * Output is ONE row; nothing is collected. */
object Butterflies {

  /** edges: bipartite (leftCol, rightCol). One row out: (n_edges,
    * n_wedges, n_pairs, n_pairs_ge2, n_butterflies). */
  def census(edges: DataFrame, leftCol: String = "left",
      rightCol: String = "right"): DataFrame = {
    val e = graft.Materialize(edges
      .select(col(leftCol).cast("string").as("l"),
        col(rightCol).cast("string").as("r"))
      .where(col("l").isNotNull && col("r").isNotNull)
      .distinct())
    val idiv = (a: org.apache.spark.sql.Column, b: Long) =>
      call_function("div", a, lit(b))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    // r6: per-right sorted left arrays (the Cooccur/coOrderHalf shape) —
    // ONE right-keyed exchange feeds both the wedge-count aggregate
    // (d = array size) and the left-pair expansion (narrow suffix
    // explode), where the self-join shuffled e by r twice more. The
    // lefts are distinct per right (e is distinct), so sorted-array
    // suffix pairs ARE the la < lb pair set.
    val arr = graft.Materialize(
      e.groupBy("r").agg(sort_array(collect_list("l")).as("ls")),
      eager = false)
    val wedges = arr.select(size(col("ls")).cast("long").as("d"))
      .agg(coalesce(sum(idiv(col("d") * (col("d") - 1L), 2L)), lit(0L))
        .as("n_wedges"))
    val pairs = arr
      .select(posexplode(col("ls")).as(Seq("i", "la")), col("ls"))
      .select(col("la"), explode(expr("slice(ls, i + 2, size(ls))")).as("lb"))
      .groupBy("la", "lb").agg(count(lit(1)).as("cop"))
    val pa = pairs.agg(
      count(lit(1)).as("n_pairs"),
      coalesce(sum(when(col("cop") >= 2, 1L).otherwise(0L)), lit(0L))
        .as("n_pairs_ge2"),
      coalesce(sum(idiv(col("cop") * (col("cop") - 1L), 2L)), lit(0L))
        .as("n_butterflies"))
    nEdges.crossJoin(broadcast(wedges)).crossJoin(broadcast(pa))
  }
}
