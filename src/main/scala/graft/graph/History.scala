package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal knowledge-graph history: collapse a (subj, pred, obj, ts)
  * assertion EVENT stream into validity INTERVALS — the SCD2 operator a
  * KG built from append-only extraction batches needs before any
  * "what did we believe at time T" query (the reference re-extracts and
  * overwrites; an interval table is the scalable representation of the
  * same fact timeline).
  *
  * Semantics: within each (subj, pred) timeline, events ordered by
  * (ts, obj) — the obj tie-break makes simultaneous conflicting
  * assertions deterministic — are grouped into maximal runs of one
  * unchanged obj; each run becomes one interval with
  * `valid_from` = the run's first ts, `valid_to` = the NEXT run's
  * valid_from (half-open, adjacent by construction), null for the
  * currently-believed fact, and `n_events` = how many re-assertions the
  * run folded (re-extraction confirmations compress instead of
  * multiplying rows — the whole point at 10^12 docs).
  *
  * Scale: ONE exchange — hash(subj, pred). The change-detect window, the
  * run aggregate (grouping keys extend the partition keys, so the
  * exchange is reused), and the valid_to lead window (partition keys
  * again) all ride the same shuffle; `.explain` shows a single Exchange.
  * A mega-entity timeline is one window partition — WindowExec spills,
  * and running frames evaluate incrementally. Null subj/pred/obj/ts rows
  * drop (a null timeline key would fold unrelated facts into one run).
  */
object History {

  def validityIntervals(events: DataFrame, subjCol: String = "subj",
      predCol: String = "pred", objCol: String = "obj",
      tsCol: String = "ts"): DataFrame = {
    val base = events
      .select(col(subjCol).as("subj"), col(predCol).as("pred"),
        col(objCol).as("obj"), col(tsCol).as("ts"))
      .where(col("subj").isNotNull && col("pred").isNotNull &&
        col("obj").isNotNull && col("ts").isNotNull)

    val w = Window.partitionBy("subj", "pred").orderBy("ts", "obj")
    // a run starts where obj differs from the previous event's obj
    val marked = base
      .withColumn("__chg",
        when(lag(col("obj"), 1).over(w).isNull ||
          lag(col("obj"), 1).over(w) =!= col("obj"), 1).otherwise(0))
      .withColumn("__run", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // one row per run; max(obj) is the run's constant obj
    val runs = marked.groupBy("subj", "pred", "__run")
      .agg(max(col("obj")).as("obj"), min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))

    // __run is the canonical within-timeline order (valid_from alone can
    // tie when simultaneous conflicting assertions split runs)
    val wNext = Window.partitionBy("subj", "pred").orderBy("__run")
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wNext))
      .select("subj", "pred", "obj", "valid_from", "valid_to", "n_events")
  }
}
