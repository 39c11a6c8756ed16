package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mann–Kendall trend test (Mann 1945; Kendall 1975) — the
  * distribution-free "is this metric drifting?" check a pipeline runs
  * over its own daily counters (ingest volume, dedup rate, extraction
  * yield): S = Σ_{i<j} sign(x_j − x_i) over the time-ordered series.
  * Monotone drift pushes S toward ±C(n,2); noise hovers near 0. No
  * means, no variances, no floats — S, the tie count, and the C(n,2)
  * bound are exact integers, so the verdict is bit-stable and the
  * oracle replays it as a plain self-join.
  *
  * Scale shape: the series is an AGGREGATE of the raw log (one keyed
  * count/sum shuffle, bucket-scale output ≤ days/hours, never
  * row-scale); the pairwise Σ is a self-join of that bucket table —
  * C(n_buckets, 2) pairs, thousands at most, broadcast territory. The
  * heavy data is touched exactly once. */
object Trend {

  /** series: (t ordinal, v measure) — one row per bucket. Output one row:
    * (n, s, n_pairs, n_ties, trend) with trend ∈ asc/desc/none. */
  def mannKendall(series: DataFrame, tCol: String, vCol: String): DataFrame = {
    val a = series.where(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(tCol).as("ta"), col(vCol).as("va"))
    val b = series.where(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(tCol).as("tb"), col(vCol).as("vb"))
    val pairs = a.join(b, col("ta") < col("tb"))
      .select(when(col("vb") > col("va"), 1L)
        .when(col("vb") < col("va"), -1L).otherwise(0L).as("sgn"))
    val n = a.agg(count(lit(1)).as("n"))
    pairs.agg(coalesce(sum(col("sgn")), lit(0L)).as("s"),
        count(lit(1)).as("n_pairs"),
        sum(when(col("sgn") === 0, 1L).otherwise(0L)).as("n_ties"))
      .crossJoin(broadcast(n))
      .select(col("n"), col("s"), col("n_pairs"),
        coalesce(col("n_ties"), lit(0L)).as("n_ties"),
        when(col("s") > 0, "asc").when(col("s") < 0, "desc")
          .otherwise("none").as("trend"))
  }
}
