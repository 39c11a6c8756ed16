package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent ordered-event patterns: mine the corpus for length-k
  * event-type sequences that many keys execute consecutively (behavior
  * motifs in a click log; repeated extraction-state trajectories in
  * pipeline telemetry) — the sequence twin of `Curation.repeatedPassages`
  * (same contract: discovery output is pattern-scale, not event-scale).
  *
  * Per key, events order by the caller's `orderCols` tuple (make it
  * unique — e.g. (ts, event_id) — or same-instant events would sort
  * nondeterministically), the ordered type sequence folds to its
  * consecutive k-grams with array HOFs (a mega-key is ONE wide row —
  * the RandomWalks argument — never an exploded self-join), and one
  * pattern-keyed aggregate counts total occurrences and DISTINCT keys.
  * Two exchanges: the per-key fold and the pattern count (both map-side
  * combinable except the distinct-key count, which Catalyst plans as a
  * two-phase Expand aggregate).
  *
  * Output: (pattern — types joined by '>', n_keys, n_occurrences),
  * n_keys ≥ minKeys. Null keys/types/order components drop.
  */
object Sequences {

  def frequentPatterns(events: DataFrame, keyCol: String,
      orderCols: Seq[String], typeCol: String, k: Int,
      minKeys: Long = 2L): DataFrame = {
    require(k >= 2, "frequentPatterns: k must be >= 2")
    require(orderCols.nonEmpty, "frequentPatterns: orderCols must be non-empty")
    val notNull = (orderCols :+ keyCol :+ typeCol)
      .map(col(_).isNotNull).reduce(_ && _)
    val ordered = events.where(notNull)
      .groupBy(col(keyCol).as("__g"))
      .agg(array_sort(collect_list(
        struct(orderCols.map(col) :+ col(typeCol).as("__t"): _*))).as("__ev"))
      .select(col("__g"), transform(col("__ev"), e => e("__t")).as("__types"))

    val grams = ordered.select(col("__g"),
      explode(when(size(col("__types")) >= k,
        transform(sequence(lit(1), size(col("__types")) - (k - 1)),
          i => array_join(slice(col("__types"), i, lit(k)), ">")))
        .otherwise(array().cast("array<string>"))).as("pattern"))

    grams.groupBy("pattern")
      .agg(countDistinct(col("__g")).as("n_keys"),
        count(lit(1)).as("n_occurrences"))
      .where(col("n_keys") >= minKeys)
  }
}
