package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM'02; Beyer et al., SIGMOD'07) — the cardinality estimator for
  * when exact `count(distinct)` is too expensive to run per group over
  * 10^12 rows but the answer must still be DETERMINISTIC and auditable
  * (approx_count_distinct's HLL± is opaque and version-sensitive; a KMV
  * over a fixed hash is a pure function of the value set, bit-identical
  * across runs, partition layouts, and cluster sizes — which is what
  * makes a cross-engine hash oracle possible).
  *
  * Sketch = the k smallest DISTINCT values of the SCRAMBLED
  * `TextOps.fingerprint`: the raw rolling 31-hash clusters structured
  * keys ("value_0001"... differ only in low polynomial terms, so their
  * hashes sit in bands and the minima are biased), so two multiplicative
  * LCG rounds (MINSTD multipliers 48271/69621, each a bijection on
  * [0, M)) spread the bands across the space — still pure
  * `*`/`+`/`pmod` on BIGINT (no overflow: h·69621 < 2^48), so DuckDB
  * replays it term for term. Estimator: with fewer than k distinct hashes the
  * count is EXACT; otherwise the k-th minimum h_k estimates density and
  * the unbiased estimate is (k-1) · M / h_k. Mergeable by construction
  * (union the value sets, re-take the k minima) — the property that lets
  * per-partition sketches combine without a global shuffle of values.
  *
  * Scale: hash + per-group distinct (one shuffle), then a bounded
  * row_number window keeps ≤ k rows per group (rank frames evaluate
  * incrementally; a mega-group buffers only its sort run, which spills),
  * and a final per-group aggregate rides the same hash(group) exchange.
  * Relative error ≈ 1/sqrt(k-2) — k=256 gives ~6%.
  */
object Sketch {

  /** Uniformizing scramble over [0, M): two MINSTD LCG rounds on top of
    * the portable rolling fingerprint. Bijective, so distinctness is
    * preserved exactly. */
  def kmvHash(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val M = lit(2147483647L)
    val r1 = pmod(TextOps.fingerprint(value) * 48271L + 12345L, M)
    pmod(r1 * 69621L + 54321L, M)
  }

  /** Per-group distinct-count estimate of `valueCol`: (group...,
    * n_sketch, h_k, estimate). n_sketch = min(k, true distinct count);
    * estimate is exact (= n_sketch) below k. Null values are ignored;
    * null GROUP KEYS form their own group (a profiling operator reports
    * on the null slice rather than dropping it). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, "kmvDistinct: k must be >= 2")
    val M = 2147483647L // fingerprint hash space, 2^31 - 1
    val g = groupCols.map(col)
    val hashed = df
      .where(col(valueCol).isNotNull)
      .select(g :+ kmvHash(col(valueCol).cast("string")).as("__h"): _*)
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    hashed
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sketch"), max(col("__h")).as("h_k"))
      .withColumn("estimate",
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * M) / col("h_k"), 4)))
  }
}
