package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Condensation + topological leveling — the step AFTER SCC: collapse each
  * strongly connected component to one node, then layer the resulting DAG
  * so dependency-shaped KG work (ontology import order, pipeline stage
  * scheduling, citation-generation strata) can run level-by-level, every
  * level fully parallel.
  *
  * `condense` is purely relational: two label joins + distinct, intra-SCC
  * edges dropped. The result is acyclic BY CONSTRUCTION (the condensation
  * theorem), which `levels` still verifies at runtime — a leftover cycle
  * means the labels weren't a true SCC map, and silently looping would be
  * worse than failing.
  *
  * `levels` is KAHN PEELING in data-parallel form: round r removes the
  * nodes whose every predecessor is already removed, so a node's round
  * index IS the length of the longest path reaching it from any source —
  * the canonical "earliest possible schedule slot". Per round: one anti
  * join to find sources, one to shrink the edge set — each a
  * lazily-materialized single job (the CC discipline); rounds = DAG depth.
  * No in-degree counter table to maintain (the textbook Kahn bookkeeping
  * serializes on decrements; the anti join recomputes membership, which
  * Spark does as one hash join pass).
  */
object Topo {

  /** Collapse `edges` by the (id, scc) map into distinct inter-component
    * edges. Nodes absent from `comps` are rejected by the inner join
    * contract (every node must be labeled — use Scc.components' output). */
  def condense(edges: DataFrame, comps: DataFrame,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val s = comps.select(col("id").as("__sid"), col("scc").as("csrc"))
    val d = comps.select(col("id").as("__did"), col("scc").as("cdst"))
    edges
      .join(s, col(srcCol) === col("__sid"))
      .join(d, col(dstCol) === col("__did"))
      .where(col("csrc") =!= col("cdst"))
      .select(col("csrc").as("src"), col("cdst").as("dst"))
      .distinct()
  }

  /** (id, level) for every node of the DAG; level = longest-path distance
    * from the source frontier (sources are level 0). Throws on cycles. */
  def levels(dagEdges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxDepth: Int = 10000): DataFrame = {
    val cleaned = dagEdges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    var remaining = graft.Materialize(cleaned
      .select(col("src").as("id")).union(cleaned.select(col("dst").as("id")))
      .distinct(), eager = false)
    var remEdges = graft.Materialize(cleaned, eager = false)
    var nRemaining = remaining.count()
    // r6: size-gated driver-local Kahn peel (the k-core local-peel
    // pattern). A node's level — the longest-path distance from the
    // source frontier — is a unique function of the DAG, so the local
    // indegree peel and the distributed anti-join rounds provably agree
    // (TopoSpec gate-forces both paths); at gate scale the distributed
    // loop is pure serial round latency (one join batch per DAG level).
    // Beyond the gate the anti-join rounds are unchanged.
    val sess = dagEdges.sparkSession
    val localMaxE = sess.conf
      .get("spark.graft.topo.localMaxEdges", "8000000").toLong
    if (remEdges.count() <= localMaxE) {
      val adj = new scala.collection.mutable.HashMap[String, scala.collection.mutable.ArrayBuffer[String]]
      val indeg = new scala.collection.mutable.HashMap[String, Int]
      remEdges.collect().foreach { r =>
        val s = r.getString(0); val d = r.getString(1)
        adj.getOrElseUpdate(s, new scala.collection.mutable.ArrayBuffer[String]) += d
        indeg(d) = indeg.getOrElse(d, 0) + 1
        if (!indeg.contains(s)) indeg(s) = indeg.getOrElse(s, 0)
      }
      var left = indeg.size
      var frontier = indeg.collect { case (v, 0) => v }.toList
      val out = new scala.collection.mutable.ArrayBuffer[(String, Int)]
      var lvl = 0
      while (left > 0) {
        if (lvl > maxDepth)
          throw new IllegalStateException(
            s"Topo.levels: depth exceeded $maxDepth — raise maxDepth")
        if (frontier.isEmpty)
          throw new IllegalStateException(
            s"Topo.levels: no sources with $left nodes left — the input " +
              "has a cycle; condense() with a true SCC map first")
        val next = new scala.collection.mutable.ArrayBuffer[String]
        frontier.foreach { v =>
          out += ((v, lvl))
          adj.get(v).foreach(_.foreach { w =>
            val d = indeg(w) - 1
            indeg(w) = d
            if (d == 0) next += w
          })
        }
        left -= frontier.length
        frontier = next.toList
        lvl += 1
      }
      import sess.implicits._
      return sess.createDataset(out.toSeq).toDF("id", "level")
    }
    var acc: DataFrame = null
    var level = 0
    while (nRemaining > 0) {
      if (level > maxDepth)
        throw new IllegalStateException(
          s"Topo.levels: depth exceeded $maxDepth — raise maxDepth")
      // r6: every anti join in the peel has a known-count node-scale
      // right side (≤ nRemaining rows) — gate-hint them (guide §3.1) so
      // a round's only exchange is the shrinking dst-distinct.
      def h(df: DataFrame): DataFrame = graft.Hints.bcastIf(df, nRemaining)
      val sources = graft.Materialize(
        remaining.join(h(remEdges.select(col("dst").as("id")).distinct()),
          Seq("id"), "left_anti"), eager = false)
      val nSources = sources.count()
      if (nSources == 0)
        throw new IllegalStateException(
          s"Topo.levels: no sources with $nRemaining nodes left — the input " +
            "has a cycle; condense() with a true SCC map first")
      val leveled = sources.select(col("id"), lit(level).as("level"))
      acc = if (acc == null) leveled else acc.union(leveled)
      remaining = graft.Materialize(
        remaining.join(h(sources), Seq("id"), "left_anti"), eager = false)
      remEdges = graft.Materialize(
        remEdges.join(h(sources.select(col("id").as("src"))), Seq("src"), "left_anti"),
        eager = false)
      nRemaining -= nSources
      level += 1
    }
    if (acc == null) {
      val spark = dagEdges.sparkSession
      import spark.implicits._
      spark.emptyDataset[(String, Int)].toDF("id", "level")
    } else acc
  }
}
