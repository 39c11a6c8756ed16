package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive reduction of a DAG — drop every edge implied by a longer
  * path (Aho, Garey & Ullman, SIAM J. Comput. 1972: for a DAG the
  * reduction is unique and is a subset of the edges). The KG hygiene pass
  * for taxonomy/subsumption predicates: ingestion unions `subClassOf` /
  * `partOf` edges from many sources, and redundant shortcuts (A→C next to
  * A→B→C) bloat every downstream closure and confuse depth-based
  * features; the reduction is the minimal edge set with the same
  * reachability.
  *
  * Relational form: an edge (u, v) is redundant iff some path of length
  * ≥ 2 connects u to v, i.e. iff (u, v) ∈ E ∘ closure(E). So the
  * reduction is one semi-naive closure ([[GraphQuery.reachable]] — the
  * engine's audited fixpoint loop), one edge-scale join composing E with
  * it, and one anti join. Worst-case closure size is quadratic in nodes —
  * the honest cost of reachability; taxonomy-shaped inputs (short, wide
  * DAGs) keep it near-linear, and `maxHops` bounds pathological depth.
  *
  * On a CYCLIC input the same algebra still removes exactly the edges
  * with an alternative ≥2-hop path (edges inside a cycle all imply each
  * other, so a cycle may dissolve) — the DAG contract is the caller's;
  * run [[Scc]] condensation first when cycles are possible. */
object TransitiveReduction {

  /** Returns the reduced edge set (src, dst), the subset of the distinct
    * input edges with no alternative path. */
  def reduce(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxHops: Int = Int.MaxValue): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("string").as("src"), col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
    val closure = GraphQuery.reachable(e, maxHops = maxHops)
    // paths of length >= 2: first hop in E, remainder (>= 1 hop) in the
    // closure
    val twoPlus = e.as("e").join(closure.as("c"), col("e.dst") === col("c.src"))
      .select(col("e.src").as("src"), col("c.dst").as("dst"))
      .distinct()
    e.join(twoPlus, Seq("src", "dst"), "left_anti")
  }
}
