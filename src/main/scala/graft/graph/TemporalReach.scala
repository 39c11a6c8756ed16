package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Earliest-arrival reachability on a TEMPORAL graph (time-respecting
  * paths — Holme & Saramäki 2012; Wu et al., VLDB'14): an edge
  * (u, v, t) can only extend a path that has already ARRIVED at u by
  * time t, so static reachability wildly over-reports influence/
  * diffusion — the provenance question a temporal KG answers
  * ("what could this fact have influenced, respecting timestamps?").
  *
  * Semantics: arrival(v) = min over hop-bounded time-respecting paths
  * from the seed set of the path's last edge time (seeds start at their
  * given t₀). Round r relaxes one more hop:
  *   cand_r(v) = min { t : (u,v,t) ∈ E, t ≥ arrival_{r−1}(u) }
  *   arrival_r  = per-node MIN of arrival_{r−1} ∪ cand_r
  * Monotone (arrivals only decrease), exact on timestamps — no floats
  * anywhere, so the DuckDB oracle unrolls the same rounds hash-exact.
  *
  * Scale shape per round: one (src-keyed) equi join of the edge list onto
  * the current arrival table with the time predicate as a join residual,
  * one dst-keyed MIN aggregate, one node-keyed MIN merge — the same
  * cost discipline as one BFS level; `hops` bounds the rounds exactly
  * like the bounded-horizon operators (q140). */
object TemporalReach {

  /** edges: (src, dst, t timestamp); seeds: (id, t0). Returns (id, arrival)
    * for every node reachable within `hops` time-respecting hops (seeds
    * included at their t0). */
  def earliestArrival(edges: DataFrame, seeds: DataFrame, hops: Int): DataFrame = {
    require(hops >= 1 && hops <= 16, s"hops 1..16, got $hops")
    val e = graft.Materialize(edges.select(col("src"), col("dst"), col("t")),
      eager = false)
    var arr = graft.Materialize(seeds.select(col("id"), col("t0").as("arrival"))
      .groupBy("id").agg(min("arrival").as("arrival")), eager = false)
    (1 to hops).foreach { _ =>
      // r6: checkpoint each round — `arr` feeds BOTH the relax join and
      // the min-merge, so as pure lineage every reference re-computed all
      // prior rounds (2^hops recomputes of round 1; the TruthDiscovery
      // chained-lineage finding). The round count that materializes the
      // checkpoint also gate-hints the node-scale arrival table into the
      // edge-scale join (§3.1); beyond the gate the SMJ round is
      // unchanged.
      val a = graft.Hints.bcastIf(arr, arr.count())
      val cand = e.join(a, e("src") === a("id") && e("t") >= a("arrival"))
        .groupBy(col("dst").as("id")).agg(min(col("t")).as("arrival"))
      arr = graft.Materialize(arr.unionByName(cand)
        .groupBy("id").agg(min("arrival").as("arrival")), eager = false)
    }
    arr
  }
}
