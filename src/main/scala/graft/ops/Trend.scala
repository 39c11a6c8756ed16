package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** χ² categorical-drift test between an OBSERVED slice and a REFERENCE
    * slice (Pearson 1900) — "did the language/source/type mix move?", the
    * categorical complement of Mann–Kendall's numeric drift. With observed
    * counts o_i (total N_o) and Laplace-smoothed reference counts
    * r_i = raw_i + 1 (total N_r, smoothing over the UNION of categories so
    * a class absent from the reference cannot divide by zero), expected
    * e_i = N_o·r_i/N_r and each term
    *   (o_i − e_i)²/e_i = (o_i·N_r − N_o·r_i)² / (N_o·r_i·N_r)
    * is an exact integer ratio. Per term the engine emits
    * term_ppt = (numerator · 1000) div denominator — a truncating INTEGER
    * division (numerator ~ counts² · N_r² stays in long while
    * N_o·N_r < ~3·10⁷; beyond that, pre-aggregate or sample slices) — so
    * the χ² total in ppt (per-mille) is an exact long Σ, order-independent
    * and bit-stable across engines (a float Σ would differ in the last
    * ulp by accumulation order alone).
    *
    * Output: one row per union category (cat, o, r_smoothed, term_ppt)
    * plus the totals repeated (n_o, n_r, chi2_ppt) — the scorecard shape.
    * Scale: two category-keyed aggregates + one category-scale join. */
  def chiSquareDrift(observed: DataFrame, reference: DataFrame,
      catCol: String): DataFrame = {
    val idiv = (a: Column, b: Column) => call_function("div", a, b)
    def counts(df: DataFrame, as: String) =
      df.where(col(catCol).isNotNull)
        .groupBy(col(catCol).as("cat")).agg(count(lit(1)).as(as))
    val o = counts(observed, "o_raw")
    val r = counts(reference, "r_raw")
    val cats = o.join(r, Seq("cat"), "full_outer")
      .select(col("cat"),
        coalesce(col("o_raw"), lit(0L)).as("o"),
        (coalesce(col("r_raw"), lit(0L)) + 1L).as("r_smoothed"))
    val withTotals = cats.crossJoin(broadcast(cats.agg(
      coalesce(sum("o"), lit(0L)).as("n_o"),
      coalesce(sum("r_smoothed"), lit(0L)).as("n_r"))))
    val num = col("o") * col("n_r") - col("n_o") * col("r_smoothed")
    val terms = withTotals.select(col("cat"), col("o"), col("r_smoothed"),
      col("n_o"), col("n_r"),
      when(col("n_o") > 0,
        idiv(num * num * 1000L, col("n_o") * col("r_smoothed") * col("n_r")))
        .otherwise(0L).as("term_ppt"))
    terms.crossJoin(broadcast(
        terms.agg(coalesce(sum("term_ppt"), lit(0L)).as("chi2_ppt"))))
      .select(col("cat"), col("o"), col("r_smoothed"), col("term_ppt"),
        col("n_o"), col("n_r"), col("chi2_ppt"))
  }
}
