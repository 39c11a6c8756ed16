package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Match-threshold sweep — the full precision/recall/F1 curve of a
  * scored candidate-pair table against gold matches, at EVERY distinct
  * score, in ONE pass: the ER tuning artifact ("pick the F1 knee, ship
  * that threshold") that otherwise costs one evaluation job per probed
  * threshold. Standard decision-threshold analysis (the PR-curve
  * construction of Davis & Goadrich, ICML 2006) on exact integers.
  *
  * Semantics: a pair counts as predicted-positive at threshold t iff
  * score ≥ t; thresholds = the distinct scores (every achievable
  * operating point, nothing else). TP(t) = predicted ∩ gold, FN(t) =
  * gold − TP(t) — gold pairs the scorer never emitted stay FN at every
  * threshold (a sweep that ignores them overstates recall — the classic
  * trap). Scores must be INTEGERS (the engine's scorers emit exact ppm
  * longs — q201 weights, q206 SoftTFIDF, q138 Fellegi–Sunter); float
  * scores would make threshold identity engine-dependent.
  *
  * Shape: pair normalization + one gold left-join (pair-keyed), one
  * score-keyed count aggregate (map-side combined: two longs per
  * distinct score), one cumulative window over the DISTINCT-SCORE table
  * (score-cardinality-scale, not pair-scale), exact ppm Projects.
  * Output: (threshold, tp, fp, fn, p_ppm, r_ppm, f1_ppm) sorted-free
  * (deterministic set), empty-gold ⇒ p defined, r/f1 null. */
object Sweep {

  def thresholdSweep(scored: DataFrame, a: Column, b: Column, score: Column,
      gold: DataFrame, ga: Column, gb: Column): DataFrame = {
    def norm(df: DataFrame, x: Column, y: Column, cols: Seq[Column]) =
      df.select((Seq(least(x.cast("string"), y.cast("string")).as("pa"),
        greatest(x.cast("string"), y.cast("string")).as("pb")) ++ cols): _*)
        .where(col("pa").isNotNull && col("pb").isNotNull)
    val s = norm(scored, a, b, Seq(score.cast("long").as("sc")))
      .groupBy("pa", "pb").agg(max("sc").as("sc"))
    val g = norm(gold, ga, gb, Seq.empty).distinct()
    val nGold = g.count()
    val labeled = s.join(g.withColumn("__g", lit(1L)), Seq("pa", "pb"), "left")
      .select(col("sc"), coalesce(col("__g"), lit(0L)).as("g"))
    val perScore = labeled.groupBy("sc")
      .agg(count(lit(1)).as("n"), sum("g").as("ng"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("sc").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    perScore
      .select(col("sc").as("threshold"),
        sum("ng").over(w).as("tp"),
        (sum("n").over(w) - sum("ng").over(w)).as("fp"))
      .select(col("threshold"), col("tp"), col("fp"),
        (lit(nGold) - col("tp")).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        floor(dec(lit(1000000L)) * dec(col("tp")) /
          dec(col("tp") + col("fp"))).cast("long").as("p_ppm"),
        when(lit(nGold) > 0, floor(dec(lit(1000000L)) * dec(col("tp")) /
          dec(lit(nGold))).cast("long")).as("r_ppm"),
        when(lit(nGold) > 0,
          floor(dec(lit(2000000L)) * dec(col("tp")) /
            dec(lit(2L) * col("tp") + col("fp") + col("fn"))).cast("long"))
          .as("f1_ppm"))
  }
}
