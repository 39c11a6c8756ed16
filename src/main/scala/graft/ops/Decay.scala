package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed aggregates — the "recent activity counts
  * more" feature every freshness-aware ranking and fraud score needs:
  * decayed_sum(g) = Σ v·2^(−(asOf − t)/halfLife). Unlike a window cutoff
  * it never forgets abruptly, and unlike a stateful EMA it is a pure
  * AGGREGATE — decomposable, map-side combinable, replayable from the raw
  * event log at any `asOf`.
  *
  * Determinism (the q112 micro-nats discipline): a raw double Σ folds in
  * partition order and drifts in the last ulp — so each row's term
  * quantizes to integer MICRO-UNITS (round(v·2^(−Δ/hl)·10⁶) as long)
  * BEFORE the aggregate, and the per-group sum is exact integer
  * arithmetic: bit-identical across runs/layouts/cluster sizes, and
  * replayable term-for-term in any engine with IEEE doubles.
  *
  * Shape: one narrow Project (the decay term) + one keyed HashAggregate —
  * a single row-scale exchange of pre-combined partials. */
object Decay {

  /** Per-group decayed sum of `valueCol` with event-time `tsCol`
    * (timestamp), half-life in seconds, evaluated at `asOf` (epoch
    * seconds). Returns (group…, decayed_fp, n_events): decayed_fp is in
    * micro-units of the value's scale. Rows with null key columns form
    * their own group (profiling semantics); null ts/value rows are
    * dropped. Future rows (t > asOf) amplify by the same law — the caller
    * filters if that is unwanted. */
  def decayedSum(df: DataFrame, groupCols: Seq[String], tsCol: String,
      valueCol: String, halfLifeSec: Long, asOfEpochSec: Long): DataFrame = {
    require(halfLifeSec >= 1L, "decayedSum: halfLifeSec must be >= 1")
    val dt = (lit(asOfEpochSec) - unix_timestamp(col(tsCol))).cast("double")
    val term: Column = round(
      col(valueCol).cast("double") *
        pow(lit(2.0), -dt / lit(halfLifeSec.toDouble)) * lit(1000000.0))
      .cast("long")
    df.where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ term.as("__term"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum("__term").as("decayed_fp"), count(lit(1)).as("n_events"))
  }
}
