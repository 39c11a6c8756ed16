package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Densest-subgraph extraction by parallel peeling — Charikar's greedy
  * (APPROX 2000) in the Bahmani–Kumar–Vassilvitskii MapReduce form
  * (PVLDB 2012): repeatedly delete EVERY node of degree ≤ 2(1+ε)·E/V in
  * one wave; some intermediate subgraph is a 2(1+ε)-approximation of the
  * maximum-density subgraph. In the KG this is the hot-core detector: the
  * densest region of the entity co-occurrence graph is where hub
  * contamination, template boilerplate, and over-merged dedup clusters
  * concentrate — the audit looks THERE first.
  *
  * EXACT INTEGER control flow (bit-stable, oracle-replayable): with
  * ε = epsNum/epsDen, "deg ≤ 2(1+ε)E/V" is evaluated as
  *   deg · epsDen · V  ≤  2 · (epsDen + epsNum) · E
  * and "round i is denser than round j" as E_i·V_j > E_j·V_i — no float
  * enters until the single reported density division. Each wave removes at
  * least the ε/(1+ε) fraction of nodes (the BKV counting argument), so
  * rounds ≤ log_{1+ε} V — the loop is O(log V) jobs of one degree
  * aggregate + one semi-join each, the CC/k-core shape.
  *
  * Scale: the edge table shrinks monotonically; each round is two keyed
  * exchanges over the CURRENT subgraph only. V and E per round are the
  * only driver-side values (two counts — the lazy-count fusion pattern);
  * node sets stay distributed, and only the best round's nodes are
  * returned. */
object Densest {

  /** edges: any orientation. Returns the best round's nodes:
    * (id, best_round, n_nodes, n_edges, density) — density = E/V at 6dp,
    * the one float. Empty input → empty output. */
  def peel(edges: DataFrame, epsNum: Int = 1, epsDen: Int = 2,
      maxRounds: Int = 64): DataFrame = {
    require(epsNum >= 1 && epsDen >= 1, "densest: eps must be positive")
    val sc = col("src").cast("string")
    val dc = col("dst").cast("string")
    var e = graft.Materialize(edges
      .select(least(sc, dc).as("a"), greatest(sc, dc).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct())
    var v = graft.Materialize(
      e.select(col("a").as("id")).union(e.select(col("b").as("id"))).distinct())
    val thrMul = 2L * (epsDen + epsNum)
    var best: Option[(Int, Long, Long, DataFrame)] = None
    var round = 0
    var nV = v.count()
    var nE = e.count()
    while (nV > 0 && round < maxRounds) {
      round += 1
      val denser = best match {
        case None => true
        case Some((_, bv, be, _)) => nE * bv > be * nV
      }
      if (denser) best = Some((round, nV, nE, v))
      // one wave: degree over the CURRENT edge set, peel ≤-threshold nodes
      val deg = e.select(col("a").as("id")).union(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val kept = graft.Materialize(
        v.join(deg, Seq("id"), "left")
          .where(coalesce(col("deg"), lit(0L)) * epsDen * nV > thrMul * nE)
          .select(col("id")))
      e = graft.Materialize(
        e.join(kept.select(col("id").as("a")), Seq("a"), "left_semi")
          .join(kept.select(col("id").as("b")), Seq("b"), "left_semi")
          .select(col("a"), col("b")))
      v = kept
      nV = v.count()
      nE = e.count()
    }
    best match {
      case None => edges.sparkSession.emptyDataFrame
        .withColumn("id", lit("")).withColumn("best_round", lit(0))
        .withColumn("n_nodes", lit(0L)).withColumn("n_edges", lit(0L))
        .withColumn("density", lit(0.0)).limit(0)
      case Some((r, bv, be, nodes)) =>
        nodes.select(col("id"), lit(r).as("best_round"),
          lit(bv).as("n_nodes"), lit(be).as("n_edges"),
          org.apache.spark.sql.functions
            .round(lit(be).cast("double") / lit(bv).cast("double"), 6)
            .as("density"))
    }
  }
}
