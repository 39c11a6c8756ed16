package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Precision/recall/F1 gates — the Spark form of the reference's evaluation
  * (vlm/evaluation.py:319-425: existence-match = semi-join, false positives /
  * negatives = anti-joins; amount tolerance <0.01 reduces to equality at
  * 2-decimal money).
  */
object Evaluation {

  final case class PR(precision: Double, recall: Double, f1: Double,
      tp: Long, fp: Long, fn: Long)

  /** Set-based P/R between predicted and expected triples (exact match on
    * (subj, pred, obj)). */
  def triplePR(predicted: DataFrame, expected: DataFrame): PR = {
    val p = predicted.select("subj", "pred", "obj").distinct()
    val e = expected.select("subj", "pred", "obj").distinct()
    val tp = p.join(e, Seq("subj", "pred", "obj"), "left_semi").count()
    val fp = p.join(e, Seq("subj", "pred", "obj"), "left_anti").count()
    val fn = e.join(p, Seq("subj", "pred", "obj"), "left_anti").count()
    val prec = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val rec = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
    PR(prec, rec, f1, tp, fp, fn)
  }

  /** Per-predicate P/R breakdown as a DataFrame (diagnostic). */
  def perPredicatePR(predicted: DataFrame, expected: DataFrame): DataFrame = {
    val p = predicted.select("subj", "pred", "obj").distinct()
    val e = expected.select("subj", "pred", "obj").distinct()
    val tp = p.join(e, Seq("subj", "pred", "obj"), "left_semi")
      .groupBy("pred").agg(count(lit(1)).as("tp"))
    val fp = p.join(e, Seq("subj", "pred", "obj"), "left_anti")
      .groupBy("pred").agg(count(lit(1)).as("fp"))
    val fn = e.join(p, Seq("subj", "pred", "obj"), "left_anti")
      .groupBy("pred").agg(count(lit(1)).as("fn"))
    tp.join(fp, Seq("pred"), "full").join(fn, Seq("pred"), "full")
      .na.fill(0L, Seq("tp", "fp", "fn"))
      .withColumn("precision", col("tp") / greatest(col("tp") + col("fp"), lit(1)))
      .withColumn("recall", col("tp") / greatest(col("tp") + col("fn"), lit(1)))
  }

  /** F14 — character error rate over (predicted, expected) text pairs:
    * Σ levenshtein / Σ length(expected)
    * (fine-tuning-ocr/.../trocr_finetuning.py:260-265). */
  def cer(pairs: DataFrame, predCol: String = "pred", expCol: String = "expected"): Double = {
    val row = pairs.agg(
      sum(levenshtein(col(predCol), col(expCol))).cast("double").as("errs"),
      sum(length(col(expCol))).cast("double").as("chars")).head()
    if (row.isNullAt(1) || row.getDouble(1) == 0) 0.0 else row.getDouble(0) / row.getDouble(1)
  }

  // ---- zone-level evaluation scorecard (vlm/evaluation.py:346-425) -------

  private def f1Of(p: Column, r: Column): Column =
    when(p + r > 0, lit(2) * p * r / (p + r)).otherwise(0.0)

  /** Binary per-zone P/R/F1 (evaluation.py:346-371
    * `_evaluate_zone_detection`), REFERENCE QUIRK INCLUDED: a true negative
    * (zone absent, not detected) scores precision = recall = 1.0 — absence
    * agreement counts as a perfect score, so corpus averages are inflated
    * on sparse zones exactly like the reference's are.
    * Returns struct(precision, recall, f1_score). */
  def zoneDetectionEval(detected: Column, expected: Column): Column = {
    val p = when(detected && expected, 1.0)
      .when(!detected && !expected, 1.0) // TN → P = R = 1.0 (:362-363)
      .otherwise(0.0)
    val r = p // identical case analysis in the reference
    struct(p.as("precision"), r.as("recall"), f1Of(p, r).as("f1_score"))
  }

  /** Count-based table evaluation (evaluation.py:373-396): TP approximated
    * as min(detected, expected); expected = 0 → recall 1 and precision 1
    * iff nothing was detected. */
  def tableCountEval(detectedCount: Column, expectedCount: Column): Column = {
    val d = detectedCount.cast("double")
    val e = expectedCount.cast("double")
    val tp = least(d, e)
    val p = when(e === 0, when(d === 0, 1.0).otherwise(0.0))
      .otherwise(when(d > 0, tp / d).otherwise(0.0))
    val r = when(e === 0, 1.0).otherwise(tp / e)
    struct(p.as("precision"), r.as("recall"), f1Of(p, r).as("f1_score"),
      detectedCount.cast("long").as("detected_count"),
      expectedCount.cast("long").as("expected_count"))
  }

  /** Value-match amount evaluation (evaluation.py:398-425): each EXPECTED
    * value that has ≥1 detected value within 0.01 counts one match
    * (inner break = per-expected, not per-pair); precision = matches /
    * |detected| (0 if none detected), recall = matches / |expected|
    * (1 if none expected). Array columns of double values. */
  def amountValuesEval(detectedValues: Column, expectedValues: Column): Column = {
    val matches = size(filter(expectedValues, e =>
      exists(detectedValues, d => abs(d - e) < 0.01))).cast("double")
    val p = when(size(detectedValues) > 0, matches / size(detectedValues)).otherwise(0.0)
    val r = when(size(expectedValues) > 0, matches / size(expectedValues)).otherwise(1.0)
    struct(p.as("precision"), r.as("recall"), f1Of(p, r).as("f1_score"),
      matches.cast("long").as("matches"),
      size(detectedValues).cast("long").as("detected_count"),
      size(expectedValues).cast("long").as("expected_count"))
  }

  /** Layout-quality accuracy (evaluation.py:427-440): proximity of the
    * measured overall layout score to the expected one (ground-truth
    * default 0.8), floored at 0. */
  def layoutQualityEval(score: Column, expected: Column): Column =
    greatest(lit(1.0) - abs(score - expected), lit(0.0))

  /** Corpus-level rollup of the per-document scorecard
    * (evaluation.py:441-487 `_calculate_global_metrics`): mean per-zone
    * precision/recall/F1 plus an overall F1. NOTE: the reference
    * initializes its zone_detection averages and never fills them (they
    * report 0.0 regardless of the data); the engine computes them — this
    * is a deliberate fix, not a parity break, and is documented here.
    * overall_f1 = mean of the four family F1 means. */
  def globalZoneMetrics(scorecard: DataFrame): DataFrame =
    scorecard.agg(
      avg("header_eval.precision").as("header_precision"),
      avg("header_eval.recall").as("header_recall"),
      avg("header_eval.f1_score").as("header_f1"),
      avg("footer_eval.precision").as("footer_precision"),
      avg("footer_eval.recall").as("footer_recall"),
      avg("footer_eval.f1_score").as("footer_f1"),
      avg("tables_eval.f1_score").as("table_f1"),
      avg("amounts_eval.f1_score").as("amount_f1"))
      .withColumn("overall_f1",
        (col("header_f1") + col("footer_f1") + col("table_f1") + col("amount_f1")) / 4.0)

  /** Full per-document zone scorecard (evaluation.py:319-343): joins the
    * detected zone report (ZoneDetector.detectZones output) with a ground
    * truth table (doc_id, header_present, footer_present, n_tables,
    * amounts array<double>) and emits the reference's evaluation shape. */
  def evaluateZones(zoneReport: DataFrame, truth: DataFrame): DataFrame =
    zoneReport.join(truth, "doc_id").select(
      col("doc_id"),
      zoneDetectionEval(col("header.detected"), col("header_present")).as("header_eval"),
      zoneDetectionEval(col("footer.detected"), col("footer_present")).as("footer_eval"),
      tableCountEval(col("table_zone.detected").cast("int"), col("n_tables")).as("tables_eval"),
      amountValuesEval(
        transform(col("footer.totals"), t => t.getField("value").cast("double")),
        col("amounts")).as("amounts_eval"))

  /** OCR text-level metrics (model_evaluation.py:283-353
    * `calculate_metrics`), reference semantics exactly:
    *  - exact_accuracy: share of pairs equal after lower + FULL whitespace
    *    strip (Python str.strip — not Spark's space-only trim);
    *  - avg_edit_distance: mean levenshtein over LOWERED texts;
    *  - avg_similarity: mean of 1 − dist/max(len(pred), len(gt)) with the
    *    reference QUIRK that an empty-vs-empty pair scores 0, not 1
    *    (`if max_len > 0 else 0` — unlike F13 editSimilarity, which gives
    *    1.0 there; both behaviors are deliberate and tested). */
  def ocrTextMetrics(pairs: DataFrame, predCol: String = "pred",
      expCol: String = "expected"): DataFrame = {
    def pyStrip(c: Column) = regexp_replace(c, "^\\s+|\\s+$", "")
    val dist = levenshtein(lower(col(predCol)), lower(col(expCol)))
    val maxLen = greatest(length(col(predCol)), length(col(expCol)))
    pairs.select(
        (lower(pyStrip(col(predCol))) === lower(pyStrip(col(expCol))))
          .cast("int").as("exact"),
        dist.as("dist"),
        when(maxLen > 0, lit(1.0) - dist.cast("double") / maxLen.cast("double"))
          .otherwise(0.0).as("sim"))
      .agg(
        avg("exact").as("exact_accuracy"),
        avg("dist").as("avg_edit_distance"),
        avg("sim").as("avg_similarity"),
        count(lit(1)).as("n_pairs"))
  }

  /** A2/A7-style corpus statistics: success rate, conf aggregates, block
    * counts (ocr_starter_final.py:457-483) over a mention table with
    * (doc_id, conf) columns. */
  def corpusStats(mentions: DataFrame): DataFrame =
    mentions.agg(
      countDistinct("doc_id").as("n_docs"),
      count(lit(1)).as("n_blocks"),
      avg("conf").as("avg_conf"),
      min("conf").as("min_conf"),
      max("conf").as("max_conf"),
      stddev("conf").as("std_conf"),
      (count(lit(1)).cast("double") / countDistinct("doc_id")).as("avg_blocks_per_doc"))
}
