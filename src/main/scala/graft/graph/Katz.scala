package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-horizon Katz centrality (Katz 1953) with EXACT integer
  * arithmetic — the walk-counting prestige measure between degree (L = 1)
  * and eigenvector centrality (L → ∞): score(v) = Σ_{l=1..L} α^l·walks_l(v),
  * walks_l(v) = # directed walks of length l ENDING at v. With α = 1/invAlpha
  * the fixed-point form  katz_fp(v) = Σ_l walks_l(v)·invAlpha^(L−l)
  * (= invAlpha^L · score) stays in exact BIGINTs, so the DuckDB
  * recursive-CTE oracle can replay it hash-exact (the same trick as q114's
  * harmonic fixed-point).
  *
  * Scale shape: L rounds of (frontier ⋈ edges on src → groupBy dst, SUM) —
  * the textbook sparse matrix–vector chain. Each round is ONE shuffle keyed
  * by vertex with map-side partial sums; the per-level weighted frontiers
  * union into a single final vertex-keyed aggregate (one more shuffle, not
  * one per level). Walk counts grow ≤ maxOutDeg^L, so keep L small (4–6)
  * or counts overflow — exactly the bounded-horizon contract. */
object Katz {

  /** edges: (src, dst) directed. Returns (id, katz_fp, n_walks) for every
    * vertex with at least one incoming walk of length ≤ L. */
  def boundedKatz(edges: DataFrame, L: Int, invAlpha: Long): DataFrame = {
    require(L >= 1 && L <= 16, s"bounded horizon 1..16, got $L")
    require(invAlpha >= 2, s"invAlpha >= 2, got $invAlpha")
    val e = edges.select(col("src"), col("dst"))
    // walks_1: one per edge, grouped
    var frontier = e.groupBy(col("dst").as("v"))
      .agg(count(lit(1)).as("cnt"))
    def pow(k: Int): Long = { var r = 1L; (0 until k).foreach(_ => r *= invAlpha); r }
    var acc = frontier.select(col("v"),
      (col("cnt") * lit(pow(L - 1))).as("w"), col("cnt"))
    var l = 2
    while (l <= L) {
      frontier = frontier.join(e, frontier("v") === e("src"))
        .groupBy(col("dst").as("v")).agg(sum(col("cnt")).as("cnt"))
      acc = acc.unionByName(frontier.select(col("v"),
        (col("cnt") * lit(pow(L - l))).as("w"), col("cnt")))
      l += 1
    }
    acc.groupBy(col("v").as("id"))
      .agg(sum(col("w")).cast("long").as("katz_fp"),
        sum(col("cnt")).cast("long").as("n_walks"))
  }
}
