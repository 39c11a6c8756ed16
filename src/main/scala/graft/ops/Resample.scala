package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series resample + LOCF (last observation carried
  * forward): irregular observations → a dense fixed-step grid per key,
  * gaps filled with the latest preceding value (gauge telemetry into
  * training features; "state of the entity at every hour" views of a
  * sparse assertion stream — the regular-grid complement of
  * `History.validityIntervals`).
  *
  * Per (key, bucket = date_trunc(unit, ts)) the LAST observation wins —
  * `max(struct(ts, value))`, latest ts, value-ordered on an exact tie,
  * so the result is a pure function of the data, not the layout. The
  * grid spans each key's OWN [min bucket, max bucket] (`sequence` +
  * explode — a key's grid length is bounded by its observed span, and
  * the global grid row count by Σ spans / step, independent of the raw
  * observation density), observations join back on (key, bucket), and
  * one running `last(_, ignoreNulls)` frame per key fills forward
  * (WindowExec evaluates running frames incrementally and spills on
  * mega-keys).
  *
  * Exchanges: bucket aggregate, span aggregate (rides the bucket
  * exchange's key cluster), grid join, fill window — all hash(key...)
  * compatible; the only data-scale one is the first. Null key/ts rows
  * and null values drop (LOCF is defined over observed values).
  *
  * Output: (key..., bucket, value, observed) — `observed` marks grid
  * points backed by a real observation in that bucket.
  */
object Resample {

  def locf(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String, step: String = "1 hour",
      unit: String = "hour"): DataFrame = {
    require(keyCols.nonEmpty, "locf: keyCols must be non-empty")
    val k = keyCols.map(col)
    val base = df
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(tsCol).isNotNull && col(valCol).isNotNull)
      .select(k :+ date_trunc(unit, col(tsCol)).as("bucket") :+
        col(tsCol).as("__ts") :+ col(valCol).as("__v"): _*)

    // last observation per (key, bucket): latest ts, tie to max value
    val obs = base.groupBy(k :+ col("bucket"): _*)
      .agg(max(struct(col("__ts"), col("__v"))).getField("__v").as("value"))

    val grid = obs.groupBy(k: _*)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(k :+ explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $step"))).as("bucket"): _*)

    val w = Window.partitionBy(k: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, keyCols :+ "bucket", "left")
      .withColumn("observed", col("value").isNotNull)
      .withColumn("value", last(col("value"), ignoreNulls = true).over(w))
  }
}
