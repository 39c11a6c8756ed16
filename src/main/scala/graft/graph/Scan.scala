package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCAN structural graph clustering (Xu–Yuruk–Feng–Schweiger, KDD 2007) —
  * clusters by NEIGHBORHOOD AGREEMENT instead of mere connectivity, and,
  * unlike CC/LPA, explicitly separates the two node kinds a KG audit
  * cares about: HUBS (bridge ≥ 2 clusters — gazetteer words, template
  * boilerplate entities, over-shared attributes that glue unrelated
  * entities together and poison CC-based dedup) and OUTLIERS (attach
  * nowhere). Run it on the entity co-occurrence graph before trusting a
  * CC merge: every hub it names is a merge bridge to cut.
  *
  * Structural similarity per edge, with Γ(x) = N(x) ∪ {x}:
  *   σ(u,v) = |Γ(u)∩Γ(v)| / √(|Γ(u)|·|Γ(v)|) = (cn+2) / √((du+1)(dv+1))
  * An edge is an ε-edge iff σ ≥ ε — evaluated EXACTLY for rational
  * ε = epsNum/epsDen by cross-multiplied squares:
  *   epsDen² · (cn+2)²  ≥  epsNum² · (du+1) · (dv+1)
  * (integers throughout; fits long while epsDen·(Δ+2)² < 2⁶³ — Δ ≤ 2M at
  * the default 3/5). Cores have ≥ μ ε-edges; clusters = CC over
  * core–core ε-edges (isolated cores cluster alone); borders = non-core
  * nodes with an ε-edge to a core, labeled by the MIN adjacent core
  * cluster (deterministic tiebreak); remaining nodes are hubs if their
  * plain neighbors span ≥ 2 clusters, else outliers.
  *
  * Scale shape: the wedge join (adjacency self-joined on the shared
  * neighbor) dominates — Σ deg(w)² wedges, the triangle-counting cost;
  * cap/salt hub degrees upstream exactly as Triangles does. Everything
  * after is edge-keyed joins and one CC over the (much sparser) ε-core
  * subgraph. */
object Scan {

  /** edges: any orientation. Returns (id, role, cluster): role ∈
    * core/border/hub/outlier; cluster = min core id of the cluster (null
    * for hubs and outliers). */
  def cluster(edges: DataFrame, epsNum: Int = 3, epsDen: Int = 5,
      mu: Int = 2): DataFrame = {
    require(epsNum >= 1 && epsDen >= epsNum, "scan: need 0 < eps <= 1")
    require(mu >= 1, s"scan: mu >= 1, got $mu")
    val sc = col("src").cast("string")
    val dc = col("dst").cast("string")
    val und = graft.Materialize(edges
      .select(least(sc, dc).as("a"), greatest(sc, dc).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct())
    val adj = und.select(col("a").as("id"), col("b").as("nb"))
      .union(und.select(col("b").as("id"), col("a").as("nb")))
    val deg = adj.groupBy("id").agg(count(lit(1)).as("deg"))
    // wedges: common-neighbor counts for a < b pairs (only pairs that are
    // actual edges matter — inner-join back onto und)
    val cn = adj.select(col("id").as("a"), col("nb").as("w"))
      .join(adj.select(col("id").as("b"), col("nb").as("w")), Seq("w"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
    val eN2 = epsNum.toLong * epsNum
    val eD2 = epsDen.toLong * epsDen
    val epsEdges = graft.Materialize(und
      .join(cn, Seq("a", "b"), "left")
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(col("a"), col("b"),
        (coalesce(col("cn"), lit(0L)) + 2L).as("g"),
        (col("da") + 1L).as("ga"), (col("db") + 1L).as("gb"))
      .where(lit(eD2) * col("g") * col("g") >= lit(eN2) * col("ga") * col("gb"))
      .select(col("a"), col("b")))
    val epsAdj = epsEdges.select(col("a").as("id"), col("b").as("nb"))
      .union(epsEdges.select(col("b").as("id"), col("a").as("nb")))
    val cores = graft.Materialize(
      epsAdj.groupBy("id").agg(count(lit(1)).as("ne"))
        .where(col("ne") >= mu).select(col("id")))
    // clusters over the core–core ε-subgraph; isolated cores self-label
    val coreEdges = epsEdges
      .join(cores.select(col("id").as("a")), Seq("a"), "left_semi")
      .join(cores.select(col("id").as("b")), Seq("b"), "left_semi")
      .select(col("a").as("src"), col("b").as("dst"))
    val comp = graft.canon.ConnectedComponents.run(coreEdges)
    val coreCluster = graft.Materialize(cores
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster")))
    // borders: non-core with an ε-edge to a core → min adjacent cluster
    val border = epsAdj
      .join(cores.select(col("id")), Seq("id"), "left_anti")
      .join(coreCluster.select(col("id").as("nb"), col("cluster")), Seq("nb"))
      .groupBy("id").agg(min("cluster").as("cluster"))
      .select(col("id"), lit("border").as("role"), col("cluster"))
    val coreOut = coreCluster
      .select(col("id"), lit("core").as("role"), col("cluster"))
    val clustered = graft.Materialize(coreOut.unionByName(border))
    // the rest: hub iff plain neighbors span ≥ 2 clusters
    val rest = deg.select(col("id"))
      .join(clustered.select(col("id")), Seq("id"), "left_anti")
    val restOut = rest
      .join(adj, Seq("id"), "left")
      .join(clustered.select(col("id").as("nb"), col("cluster").as("nbc")),
        Seq("nb"), "left")
      .groupBy("id")
      .agg(countDistinct(col("nbc")).as("nclusters"))
      .select(col("id"),
        when(col("nclusters") >= 2, "hub").otherwise("outlier").as("role"),
        lit(null).cast("string").as("cluster"))
    clustered.unionByName(restOut)
  }
}
