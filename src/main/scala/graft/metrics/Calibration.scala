package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Confidence-calibration scorecard (reliability diagram + expected
  * calibration error, Naeini et al. AAAI 2015) — the evaluation every
  * confidence the pipeline emits (linker match scores, OCR confidences,
  * validation tiers) should face before anything thresholds on it: bin
  * predictions by confidence and compare each bin's MEAN confidence to
  * its OBSERVED accuracy; the gap is how much the scores lie.
  *
  * Integer-exact (the family contract): confidences quantize to
  * micro-units on entry (round(conf·10⁶) — the q112/q125 discipline), so
  * per-bin sums are exact longs; per-bin means use truncating integer
  * division (replayable); the ECE itself is Σ n_b·gap_b div N — ALSO
  * pure integer, so the scalar is bit-stable at any layout. One narrow
  * Project + one ≤(bins)-group aggregate.
  */
object Calibration {

  /** Reliability table: (bin, n, conf_avg_fp, acc_fp, gap_fp) — bin =
    * floor(conf·bins) clamped so conf = 1.0 lands in the top bin;
    * conf_avg_fp / acc_fp / gap_fp in micro-units. Rows with null conf or
    * correctness are dropped; conf outside [0, 1] is a caller bug and
    * fails loudly. ECE = Σ n·gap div N over this table (one more
    * aggregate — [[ece]]). */
  def reliability(df: DataFrame, confCol: String, correctCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "reliability: bins must be >= 1")
    val base = df
      .where(col(confCol).isNotNull && col(correctCol).isNotNull)
      .select(col(confCol).cast("double").as("conf"),
        col(correctCol).cast("boolean").as("ok"))
    val checked = base.select(
      when(col("conf") < 0 || col("conf") > 1,
        raise_error(concat(lit("reliability: confidence out of [0,1]: "),
          col("conf").cast("string"))))
        .otherwise(col("conf")).as("conf"),
      col("ok"))
    checked
      .select(
        least(floor(col("conf") * bins).cast("int"), lit(bins - 1)).as("bin"),
        round(col("conf") * 1000000.0).cast("long").as("conf_fp"),
        when(col("ok"), 1L).otherwise(0L).as("hit"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum("conf_fp").as("sum_conf"),
        sum("hit").as("n_hit"))
      .select(col("bin"), col("n"),
        expr("sum_conf div n").as("conf_avg_fp"),
        expr("(1000000 * n_hit) div n").as("acc_fp"))
      .withColumn("gap_fp", abs(col("conf_avg_fp") - col("acc_fp")))
  }

  /** Expected calibration error in micro-units: Σ n_b·gap_b div N. */
  /** Quantile normalization of scores ACROSS SOURCES — the fusion
    * pre-step when extractors emit incomparable confidences (one's 0.9 is
    * another's 0.6): replace each score by its within-source rank quantile
    * q_ppm = (rank − 1)·10^6 div (n − 1), so every source maps onto the
    * same uniform [0, 10^6] grid and a downstream threshold means the same
    * thing everywhere. Ranks are row_number with an id tiebreak (ties get
    * DISTINCT adjacent quantiles — deterministic, layout-independent; the
    * averaged-rank variant would reintroduce float sums). A 1-row source
    * maps to 0.
    *
    * Scale: ONE source-keyed window (rank and count share its sort) —
    * the q135 single-exchange shape. */
  def quantileNormalize(df: DataFrame, sourceCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(sourceCol)
    val rank = row_number().over(w.orderBy(col(scoreCol).asc, col(idCol).asc))
    val n = count(lit(1)).over(w)
    df.where(col(scoreCol).isNotNull)
      .select(col(sourceCol), col(idCol), col(scoreCol),
        when(n > 1, call_function("div", (rank - 1).cast("long") * 1000000L,
          (n - 1).cast("long"))).otherwise(0L).as("q_ppm"))
  }

  def ece(df: DataFrame, confCol: String, correctCol: String,
      bins: Int = 10): Long = {
    val r = reliability(df, confCol, correctCol, bins)
      .agg(coalesce(expr("sum(n * gap_fp) div sum(n)"), lit(0L))).head()
    r.getLong(0)
  }
}
