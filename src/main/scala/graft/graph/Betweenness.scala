package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Betweenness centrality by Brandes' dependency accumulation (Brandes,
  * J. Math. Sociol. 2001) from a SOURCE SAMPLE — the standard unbiased
  * estimator (Brandes & Pich 2007): exact betweenness needs all-sources
  * ($O(VE)$), a hashed source sample scales it to 10^12 nodes with the
  * same plan. On the KG this ranks broker entities — the vendors/accounts
  * every cross-cluster path funnels through, fraud analytics' favorite.
  *
  * Determinism (the family contract): shortest-path COUNTS σ are exact
  * long sums; dependency accumulation runs in fixed-point integer — each
  * edge term is floor(σ_u · (SCALE + δ_v) / σ_v), then exact long sums —
  * so scores are bit-identical across runs/layouts/cluster sizes and a
  * sequential replay is term-for-term possible. (True Brandes sums
  * rationals; the truncation error is ≤ #terms ulps at SCALE=10^6 —
  * irrelevant for ranking, essential for auditability.)
  *
  * Shape: one multi-source forward BFS with σ-accumulation (all sources
  * advance in the same joins — the [[Distances]] discipline; per level the
  * contribution aggregate runs BEFORE the settled anti join so σ sums
  * arrive complete), one shortest-path-DAG materialization (edges ⋈
  * settled² on dist_v = dist_u + 1), then descending-level backward rounds
  * (per level: one DAG-scale join + one keyed long-sum aggregate). Rounds
  * = 2 × eccentricity. Overflow bound: σ_max · (SCALE + δ_max) must fit a
  * long — lower `scale` for graphs with astronomically many shortest
  * paths.
  */
object Betweenness {

  /** Fixed-point betweenness contributions from `sources`: returns
    * (id, bc_fp, n_sources) for every non-source-role node with a nonzero
    * score, where bc_fp = Σ_s δ_s(id) in SCALE units (δ excludes s itself,
    * per Brandes). `n_sources` counts sources whose DAG reaches the node
    * with a nonzero dependency. */
  def fromSources(edges: DataFrame, sources: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      sourceCol: String = "id", scale: Long = 1000000L,
      maxDepth: Int = Int.MaxValue): DataFrame = {
    require(scale >= 1L, "fromSources: scale must be >= 1")
    val e = graft.Materialize(edges
      .select(col(srcCol).cast("string").as("src"), col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct())
    def barrier(df: DataFrame): DataFrame =
      df.where(col("s").isNotNull && col("id").isNotNull)
    // r6: size-gated driver-local Brandes replay (the k-core local-peel
    // pattern): σ counts are exact long sums and each dependency term is
    // the same truncating integer expression, both order-independent, so
    // the local per-source BFS + descending-level accumulation is
    // bit-identical to the join rounds (BetweennessSpec gate-forces
    // both). The settled (source, node) state can outgrow the driver
    // under the edge gate, so the local run aborts to the distributed
    // loop past the pair budget — the bounded-probe discipline.
    val sess = edges.sparkSession
    val localMaxE = sess.conf
      .get("spark.graft.betweenness.localMaxEdges", "8000000").toLong
    val localMaxPairs = sess.conf
      .get("spark.graft.betweenness.localMaxPairs", "4000000").toLong
    if (e.count() <= localMaxE) {
      import sess.implicits._
      val es = e.as[(String, String)].collect()
      val adj = new scala.collection.mutable.HashMap[String, scala.collection.mutable.ArrayBuffer[String]]
      es.foreach { case (u, v) =>
        adj.getOrElseUpdate(u, new scala.collection.mutable.ArrayBuffer[String]) += v
      }
      val srcs = sources.select(col(sourceCol).cast("string").as("s"))
        .where(col("s").isNotNull).distinct().as[String].collect()
      val bcFp = new scala.collection.mutable.LinkedHashMap[String, Long]
      val bcN = new scala.collection.mutable.HashMap[String, Long]
      var totalPairs = 0L
      var over = false
      var si = 0
      while (si < srcs.length && !over) {
        val s = srcs(si)
        val dist = new scala.collection.mutable.HashMap[String, Int]
        val sigma = new scala.collection.mutable.HashMap[String, Long]
        dist(s) = 0; sigma(s) = 1L
        val byLevel = new scala.collection.mutable.ArrayBuffer[Array[String]]
        byLevel += Array(s)
        var frontier = Array(s)
        var d = 0
        while (frontier.nonEmpty && d < maxDepth) {
          d += 1
          val acc = new scala.collection.mutable.LinkedHashMap[String, Long]
          frontier.foreach { u =>
            adj.get(u).foreach(_.foreach { v =>
              if (!dist.contains(v)) acc(v) = acc.getOrElse(v, 0L) + sigma(u)
            })
          }
          frontier = acc.keys.toArray
          frontier.foreach { v => dist(v) = d; sigma(v) = acc(v) }
          if (frontier.nonEmpty) byLevel += frontier
        }
        totalPairs += dist.size
        if (totalPairs > localMaxPairs) over = true
        else {
          // backward: strictly descending levels, δ_v final before its
          // predecessors; only δ > 0 rows exist (the distributed filter)
          val delta = new scala.collection.mutable.HashMap[String, Long]
          var lvl = byLevel.length - 2
          while (lvl >= 0) {
            byLevel(lvl).foreach { u =>
              var sum = 0L
              val du = dist(u)
              adj.get(u).foreach(_.foreach { v =>
                if (dist.getOrElse(v, -1) == du + 1)
                  sum += (sigma(u) * (scale + delta.getOrElse(v, 0L))) / sigma(v)
              })
              if (sum > 0L) delta(u) = sum
            }
            lvl -= 1
          }
          delta.foreach { case (u, del) =>
            if (u != s) {
              bcFp(u) = bcFp.getOrElse(u, 0L) + del
              bcN(u) = bcN.getOrElse(u, 0L) + 1L
            }
          }
        }
        si += 1
      }
      if (!over) {
        return bcFp.toSeq.map { case (id, fp) => (id, fp, bcN(id)) }
          .toDF("id", "bc_fp", "n_sources")
      } // else fall through to the distributed loop
    }
    // ---- forward: (s, id, dist, sigma) ----
    var settled = graft.Materialize(sources
      .select(col(sourceCol).cast("string").as("s"))
      .where(col("s").isNotNull).distinct()
      .select(col("s"), col("s").as("id"), lit(0).as("dist"), lit(1L).as("sigma")))
    var frontier = settled
    var depth = 0
    var done = depth >= maxDepth
    while (!done) {
      depth += 1
      // σ contributions COMBINE before the anti join — a node first seen
      // at this level must receive the sum over ALL its level-(d-1)
      // predecessors, not one of them
      val next = barrier(graft.Materialize(
        frontier.join(e, frontier("id") === e("src"))
          .groupBy(col("s"), col("dst").as("id"))
          .agg(sum("sigma").as("sigma"))
          .join(settled.select("s", "id"), Seq("s", "id"), "left_anti")
          .select(col("s"), col("id"), lit(depth).as("dist"), col("sigma")),
        eager = false))
      val n = next.count()
      if (n == 0 || depth >= maxDepth) done = true
      if (n != 0) {
        settled = graft.Materialize(settled.union(next), eager = false)
        frontier = next
      }
    }
    // ---- shortest-path DAG: (s, u, v, sigma_u, sigma_v, dist_u) ----
    val su = settled.select(col("s"), col("id").as("u"),
      col("dist").as("dist_u"), col("sigma").as("sigma_u"))
    val sv = settled.select(col("s").as("s2"), col("id").as("v"),
      col("dist").as("dist_v"), col("sigma").as("sigma_v"))
    val dag = graft.Materialize(
      su.join(e, su("u") === e("src"))
        .join(sv, col("s") === col("s2") && col("dst") === col("v") &&
          col("dist_v") === col("dist_u") + 1)
        .select(col("s"), col("u"), col("v"), col("sigma_u"), col("sigma_v"),
          col("dist_u")))
    // ---- backward: descending levels; delta rows exist only where > 0 ----
    val spark = edges.sparkSession
    import spark.implicits._
    var delta = graft.Materialize(
      Seq.empty[(String, String, Long)].toDF("s", "id", "delta"))
    var level = depth - 1
    while (level >= 0) {
      val dl = delta.select(col("s"), col("id").as("v"), col("delta"))
      val contrib = dag.where(col("dist_u") === level)
        .join(dl, Seq("s", "v"), "left")
        .groupBy(col("s"), col("u").as("id"))
        .agg(sum(
          // floor(sigma_u * (SCALE + delta_v) / sigma_v), exact long ops
          expr(s"(sigma_u * (${scale}L + coalesce(delta, 0L))) div sigma_v"))
          .as("delta"))
        .where(col("delta") > 0)
      delta = graft.Materialize(delta.union(
        contrib.select(col("s"), col("id"), col("delta"))), eager = false)
      level -= 1
    }
    delta.where(col("id") =!= col("s"))
      .groupBy("id")
      .agg(sum("delta").as("bc_fp"), count(lit(1)).as("n_sources"))
  }
}
