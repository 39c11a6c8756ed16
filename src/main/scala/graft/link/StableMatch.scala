package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stable matching (Gale–Shapley, proposer-optimal) — the 1:1 assignment
  * primitive for entity resolution when BOTH sides rank their candidates:
  * source records propose to target records (scored by match confidence),
  * targets hold their best offer, and the result is the unique
  * proposer-optimal STABLE matching — no unmatched pair prefers each
  * other over what they got, so no post-hoc "obviously better link" audit
  * finding is possible (the failure mode of independent per-row argmax
  * linking, which can assign one target to many sources or leave
  * blocking pairs).
  *
  * Engine shape: the ROUND-PARALLEL form — every free proposer proposes
  * to its best not-yet-rejecting target in the same round (one argmax
  * aggregate over the non-rejected preference table), targets keep the
  * best of current + new offers (one argmax per target), losers record a
  * rejection. All joins are key-equi on ids; per-round driver state is
  * one count. Rounds are data-dependent (≤ total preference rows, in
  * practice ~O(n)); by McVitie–Wilson the result equals the sequential
  * one-proposal-at-a-time execution, which is what the oracle replays.
  *
  * Input: the full preference table `(m, w, m_score, w_score)` — higher
  * is better; scores must be tie-free per node on each side (distinct
  * m_score within each m, distinct w_score within each w), or the
  * deterministic-uniqueness guarantee is the caller's to establish.
  * Output: `(m, w)` — one row per matched pair. */
object StableMatch {

  def matchPairs(prefs: DataFrame, maxRounds: Int = 100000): DataFrame = {
    val p = graft.Materialize(prefs.select(
      col("m").cast("string").as("m"), col("w").cast("string").as("w"),
      col("m_score").cast("long").as("ms"),
      col("w_score").cast("long").as("ws"))
      .where(col("m").isNotNull && col("w").isNotNull)
      .distinct(), eager = false)

    // rejected(m, w) grows; engaged(w, m) is the tentative matching
    var live = p // preference rows not yet rejected
    var engaged = graft.Materialize(
      p.select(col("w"), col("m")).limit(0), eager = false)
    var round = 0
    var done = false
    while (!done) {
      round += 1
      require(round <= maxRounds,
        s"StableMatch: $maxRounds rounds without convergence")
      // free proposers = those with live rows and no engagement
      val freeTop = live
        .join(engaged.select(col("m")), Seq("m"), "left_anti")
        .groupBy("m").agg(max(struct(col("ms"), col("w"))).as("__t"))
        .select(col("m"), col("__t.w").as("w"))
      val nProps = freeTop.count()
      if (nProps == 0L) done = true
      else {
        val offers = freeTop.join(p, Seq("m", "w"))
          .select(col("w"), col("m"), col("ws"))
          .union(engaged.join(p, Seq("w", "m"))
            .select(col("w"), col("m"), col("ws")))
        val newEngaged = graft.Materialize(offers
          .groupBy("w").agg(max(struct(col("ws"), col("m"))).as("__t"))
          .select(col("w"), col("__t.m").as("m")), eager = false)
        // every offer that did not win is now a standing rejection —
        // drop those preference rows for good (incl. displaced partners)
        val lost = offers.select("w", "m")
          .join(newEngaged, Seq("w", "m"), "left_anti")
        live = graft.Materialize(
          live.join(lost, Seq("m", "w"), "left_anti"), eager = false)
        engaged = newEngaged
      }
    }
    engaged.select(col("m"), col("w"))
  }
}
