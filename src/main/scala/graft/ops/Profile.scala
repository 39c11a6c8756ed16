package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the data-quality report a pipeline runs
  * before pointing 10^12 docs at extraction (null fractions catch a
  * broken upstream export; distinct counts catch key collapse; min/max
  * catch sentinel garbage like 1970 timestamps or "" keys).
  *
  * One `agg` computes (count, nulls, exact distinct, min, max) for every
  * requested column; Catalyst plans the multi-distinct via a single
  * Expand + two-phase aggregate — one shuffle total, rows × #cols
  * intermediate, each partial map-side combined. min/max surface as
  * strings so the long-format report has one schema for mixed column
  * types (the cast is deterministic for string/integral columns; callers
  * profiling floats should pre-round if they need cross-engine stable
  * text).
  *
  * Output: one row per column — (column, n_rows, n_null, n_distinct,
  * min_val, max_val); n_distinct counts non-null values.
  */
object Profile {

  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.columns: cols must be non-empty")
    require(cols.distinct == cols, "Profile.columns: cols must be distinct")
    val metrics = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(metrics.head, metrics.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
