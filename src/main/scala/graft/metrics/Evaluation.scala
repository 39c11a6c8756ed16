package graft.metrics

import org.apache.spark.sql.DataFrame
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
