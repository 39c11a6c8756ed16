package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition-quality scorecard — Newman–Girvan modularity (Newman 2004,
  * "Finding and evaluating community structure in networks") plus
  * per-community conductance (Kannan–Vempala–Vetta 2004). The KG build
  * runs community detection (q58 label propagation) and entity-dedup
  * clustering (q30 CC) as black boxes; this operator is the AUDIT that
  * says whether a given node→community assignment actually cuts the graph
  * where it is thin — the gate a pipeline runs before trusting a
  * clustering enough to, e.g., collapse entities or shard by community.
  *
  * EXACT INTEGER core (the q144/q150/q152 discipline — bit-stable across
  * layouts, replayable term-for-term by a SQL oracle):
  *   vol_c    = Σ_{v∈c} deg(v)            (over the deduped UNDIRECTED graph)
  *   int2_c   = 2 · |{edges inside c}|
  *   cut_c    = vol_c − int2_c
  *   cond_ppm = (cut_c · 10^6) div min(vol_c, 2m − vol_c)   (null if min = 0)
  *   Q        = Σ_c (2m · int2_c − vol_c²) / (2m)²
  * Only the final modularity ratio is a float (one division + 6dp round);
  * q_num and (2m)² stay exact while 2m < ~3·10⁹ — beyond that, flip the
  * final division to per-community doubles (the ordering audit stays exact
  * either way because conductance is reported in integer ppm).
  *
  * Scale shape: one distinct over the symmetrized edge list (the CC/LPA
  * input is usually already in this form), one node-keyed degree
  * aggregation, two node-keyed joins of the edge list against the
  * assignment (vertex-scale dimension — AQE broadcasts it when small,
  * shuffles otherwise), then ONE community-keyed aggregation whose output
  * is community-scale. The heavy edge table is touched twice, never
  * collected. Nodes present in the graph but missing from the assignment
  * would silently vanish through the inner joins, understating 2m's
  * relationship to Σvol — so coverage is enforced: unassigned graph nodes
  * are counted and reported as singleton communities of their own id
  * (exactly how LPA/CC label isolated nodes). */
object PartitionQuality {

  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** edges: (srcCol, dstCol) in any orientation; parts: (idCol, commCol).
    * Returns one row per community:
    * (community, n_nodes, vol, internal_x2, cut, conductance_ppm,
    *  modularity) — modularity is the GLOBAL Q repeated on every row (a
    * scorecard is read as a table; the global verdict rides along). */
  def scorecard(edges: DataFrame, parts: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      idCol: String = "id", commCol: String = "community"): DataFrame = {
    val sc = col(srcCol).cast("string")
    val dc = col(dstCol).cast("string")
    val und = graft.Materialize(edges
      .select(least(sc, dc).as("a"), greatest(sc, dc).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct())
    val adj = und.select(col("a").as("id"), col("b").as("nb"))
      .union(und.select(col("b").as("id"), col("a").as("nb")))
    val deg = adj.groupBy("id").agg(count(lit(1)).as("deg"))
    // coverage: unassigned graph nodes become singleton communities keyed
    // by their own id (LPA/CC isolated-node convention), so Σvol == 2m
    // holds by construction and the modularity denominator is honest
    val p = parts
      .select(col(idCol).cast("string").as("id"),
        col(commCol).cast("string").as("community"))
      .where(col("id").isNotNull && col("community").isNotNull)
    val assigned = deg.join(p, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("community"), col("id")).as("community"))
    val volC = assigned.groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("vol"))
    val withC = und
      .join(assigned.select(col("id").as("a"), col("community").as("ca")), Seq("a"))
      .join(assigned.select(col("id").as("b"), col("community").as("cb")), Seq("b"))
    val internal = withC.where(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg((count(lit(1)) * 2L).as("internal_x2"))
    val perC = volC.join(internal, Seq("community"), "left")
      .select(col("community"), col("n_nodes"), col("vol"),
        coalesce(col("internal_x2"), lit(0L)).as("internal_x2"))
      .withColumn("cut", col("vol") - col("internal_x2"))
    val totals = perC.agg(
      coalesce(sum("vol"), lit(0L)).as("two_m"),
      coalesce(sum(col("vol") * col("vol")), lit(0L)).as("sum_vol_sq"),
      coalesce(sum("internal_x2"), lit(0L)).as("sum_int2"))
    perC.crossJoin(broadcast(totals))
      .select(col("community"), col("n_nodes"), col("vol"),
        col("internal_x2"), col("cut"),
        when(least(col("vol"), col("two_m") - col("vol")) > 0,
          idiv(col("cut") * 1000000L,
            least(col("vol"), col("two_m") - col("vol"))))
          .as("conductance_ppm"),
        when(col("two_m") > 0,
          round((col("two_m") * col("sum_int2") - col("sum_vol_sq"))
            .cast("double") /
            (col("two_m") * col("two_m")).cast("double"), 6))
          .as("modularity"))
  }
}
