package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Taxonomy / ontology hierarchy operators — ancestor closure, depth,
  * lowest common ancestor, and Wu–Palmer similarity over a parent forest
  * (the `skos:broader` / `rdfs:subClassOf` shape every KG carries).
  * LCA is the class-generalization primitive (the most specific type two
  * entities share) and Wu–Palmer `2·depth(lca)/(depth(a)+depth(b))` the
  * standard taxonomy similarity for type-aware entity blocking.
  *
  * Engine shape: ancestor chains by POINTER DOUBLING (the Bridges
  * root-chain machinery, depth-annotated): ceil(log2 depth) self-joins,
  * each concatenating a node's chain with its current top's chain — so a
  * forest of depth d costs log d rounds, not d. LCA of a pair is then
  * one join of the two exploded chains on the common ancestor plus a
  * max (common ancestors of a pair form ONE root chain, so the deepest
  * is unique). State is O(V·depth) chain entries — the right trade for
  * the shallow-wide hierarchies ontologies are; `maxDepth` fails fast on
  * degenerate deep chains.
  *
  * Input `parents`: one row per non-root node `(id, parent)` (roots
  * simply have no row; cycles violate the forest contract and are the
  * caller's bug — the doubling loop detects non-convergence and fails).
  * Depths count edges from the root (root depth 0). */
object Taxonomy {

  /** Ancestor closure: `(id, anc, anc_depth)` for every ancestor of every
    * node INCLUDING itself, plus `depth` (the node's own). */
  def ancestors(parents: DataFrame, id: Column, parent: Column,
      maxDepth: Int = 64): DataFrame = {
    val e = parents.select(id.cast("string").as("id"),
        parent.cast("string").as("p"))
      .where(col("id").isNotNull && col("p").isNotNull &&
        col("id") =!= col("p"))
      .distinct()
    val nodes = e.select("id").union(e.select(col("p").as("id"))).distinct()
    val emptyChain = array().cast("array<string>")
    var state = graft.Materialize(nodes.join(e, Seq("id"), "left")
      .select(col("id"), coalesce(col("p"), col("id")).as("top"),
        when(col("p").isNotNull, array(col("p")))
          .otherwise(emptyChain).as("chain")), eager = false)
    var total = state.agg(sum(size(col("chain")))).head().getLong(0)
    var rounds = 0
    var grown = true
    while (grown) {
      rounds += 1
      require(rounds <= maxDepth,
        s"Taxonomy.ancestors: no convergence after $rounds doubling " +
          s"rounds — cycle in the parent relation or depth > 2^$maxDepth")
      val s2 = state.select(col("id").as("__jid"), col("top").as("__top2"),
        col("chain").as("__chain2"))
      state = graft.Materialize(
        state.join(s2, col("top") === col("__jid"))
          .select(col("id"), col("__top2").as("top"),
            concat(col("chain"), col("__chain2")).as("chain")),
        eager = false)
      val t2 = state.agg(sum(size(col("chain")))).head().getLong(0)
      grown = t2 > total
      total = t2
    }
    val withDepth = state.select(col("id"), col("chain"),
      size(col("chain")).cast("long").as("depth"))
    withDepth.select(col("id"), col("id").as("anc"),
        col("depth").as("anc_depth"), col("depth"))
      .union(withDepth.select(col("id"),
        posexplode(col("chain")).as(Seq("__j", "anc")),
        col("depth"))
        .select(col("id"), col("anc"),
          (col("depth") - 1L - col("__j")).as("anc_depth"), col("depth")))
  }

  /** LCA + Wu–Palmer for query pairs `(a, b)`: returns
    * `(a, b, lca, depth_a, depth_b, depth_lca, wu_palmer_ppm)` — pairs
    * with an endpoint outside the forest are dropped; identical nodes
    * get similarity 1.0 (1000000 ppm) even at the root (depth 0). */
  def lcaPairs(parents: DataFrame, id: Column, parent: Column,
      pairs: DataFrame, a: Column, b: Column,
      maxDepth: Int = 64): DataFrame = {
    val anc = ancestors(parents, id, parent, maxDepth)
    val pa = pairs.select(a.cast("string").as("a"), b.cast("string").as("b"))
    val aa = anc.select(col("id").as("a"), col("anc"),
      col("anc_depth"), col("depth").as("depth_a"))
    val bb = anc.select(col("id").as("__b"), col("anc").as("__anc_b"),
      col("depth").as("depth_b"))
    pa.join(aa, Seq("a"))
      .join(bb, col("b") === col("__b") && col("anc") === col("__anc_b"))
      .drop("__b", "__anc_b")
      .groupBy("a", "b", "depth_a", "depth_b")
      .agg(max(struct(col("anc_depth"), col("anc"))).as("__m"))
      .select(col("a"), col("b"), col("__m.anc").as("lca"),
        col("depth_a"), col("depth_b"),
        col("__m.anc_depth").as("depth_lca"),
        when(col("depth_a") + col("depth_b") === 0, lit(1000000L))
          .otherwise(expr(
            "2000000 * __m.anc_depth div (depth_a + depth_b)"))
          .cast("long").as("wu_palmer_ppm"))
  }
}
