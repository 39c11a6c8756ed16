package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** J2 as an ENRICHMENT operator — OCR⋈VLM amount cross-validation
  * (vlm/examples/ocr_integration.py:185-210 `_find_matching_amounts`,
  * :281-310 `_cross_validate_results`):
  *
  *  - every number (`\d+\.?\d*`, after comma→dot) in any OCR span text of
  *    the same document is a match candidate for a VLM-extracted amount;
  *  - a candidate matches when |number − amount| < 0.01;
  *  - amounts with ≥1 match get `validated_by_ocr = true` and a confidence
  *    boost of +0.2 capped at 1.0; the rest get `validated_by_ocr = false`.
  *
  * Scale shape: the tolerance predicate is NOT joined as a theta join
  * (which Spark would execute as a broadcast-nested-loop over all
  * (amount, number) pairs of a doc corpus). Both sides are keyed on
  * floor(value·100) in exact DECIMAL arithmetic and the amount side probes
  * keys {k−1, k, k+1} — every pair within 0.01 lands in a probed bucket
  * (|100a−100b| < 1 ⇒ floors differ by ≤ 1), so the equi-join carries the
  * whole candidate volume and the exact tolerance filter only sees
  * same-bucket pairs. One shuffle per side on (doc, key).
  */
object CrossValidate {

  /** All numbers in a text column, reference regex, comma-decimal
    * normalized, as exact DECIMAL(18,4). */
  def textNumbers(text: Column): Column =
    filter(
      transform(
        regexp_extract_all(regexp_replace(text, ",", "."), lit("\\d+\\.?\\d*"), lit(0)),
        s => s.cast(DecimalType(18, 4))),
      n => n.isNotNull)

  /** Enrich `vlmAmounts` (docCol, amountCol, confCol) with
    * `validated_by_ocr` + boosted confidence from `ocrSpans` (docCol,
    * textCol). Output = input columns + validated_by_ocr, with confCol
    * boosted per the reference rule. */
  def validateAmounts(vlmAmounts: DataFrame, ocrSpans: DataFrame,
      docCol: String = "doc_id", amountCol: String = "amount",
      confCol: String = "confidence", textCol: String = "text"): DataFrame = {
    val amt = col(amountCol).cast(DecimalType(18, 4))
    val key = floor(col("__n") * 100).cast("long")

    val ocrKeys = ocrSpans
      .select(col(docCol), explode(textNumbers(col(textCol))).as("__n"))
      .select(col(docCol), key.as("__k"), col("__n"))
      .distinct()

    val probes = vlmAmounts
      .select(col(docCol), amt.as("__a"))
      .distinct()
      .select(col(docCol), col("__a"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("__d"))
      .select(col(docCol), col("__a"),
        (floor(col("__a") * 100).cast("long") + col("__d")).as("__k"))

    // renamed output columns break the vlmAmounts→matched lineage so the
    // final enrichment join is not flagged as an ambiguous self-join
    // FLOAT64 comparison, deliberately: the reference
    // (_find_matching_amounts) compares Python floats, so decimal-boundary
    // pairs follow float64 rounding (|10.00−9.99| ≈ 0.00999... VALIDATES,
    // |1.01−1.00| ≈ 0.01000...9 does not). The ±1 banding above is computed
    // in exact decimal and still covers every float64 match: a float64 diff
    // < 0.01 implies a decimal diff ≤ 0.0100, i.e. a key distance ≤ 1.
    val matched = probes.join(ocrKeys, Seq(docCol, "__k"))
      .where(abs(col("__n").cast("double") - col("__a").cast("double")) < 0.01)
      .select(col(docCol).as("__mdoc"), col("__a").as("__mamt"))
      .distinct()
      .withColumn("__validated", lit(true))

    vlmAmounts
      .join(matched,
        vlmAmounts(docCol) === matched("__mdoc") && amt === matched("__mamt"), "left")
      .select(vlmAmounts.columns.toIndexedSeq.map(vlmAmounts(_)) :+ col("__validated"): _*)
      .withColumn("validated_by_ocr", coalesce(col("__validated"), lit(false)))
      .drop("__validated")
      .withColumn(confCol,
        when(col("validated_by_ocr"), least(col(confCol) + 0.2, lit(1.0)))
          .otherwise(col(confCol)))
  }

  // ---- integration / validation scoring (ocr_integration.py:250-310) ----

  /** `_calculate_integration_score` (:250-285): one point per zone family
    * that carries OCR data (header, footer, tables, matched amounts) plus
    * one for avg OCR confidence > 0.7, over a 5-point scale. */
  def integrationScore(headerHasOcr: Column, footerHasOcr: Column,
      tableHasOcr: Column, amountsMatched: Column, avgOcrConf: Column): Column =
    (headerHasOcr.cast("int") + footerHasOcr.cast("int") +
      tableHasOcr.cast("int") + amountsMatched.cast("int") +
      (avgOcrConf > 0.7).cast("int")).cast("double") / 5.0

  /** `_calculate_overall_confidence` (:312-318): 0.6·VLM + 0.4·integration. */
  def overallConfidence(vlmConf: Column, integration: Column): Column =
    vlmConf * 0.6 + integration * 0.4

  /** `_cross_validate_results` reliability tiers (:308-310). */
  def reliability(integration: Column): Column =
    when(integration > 0.7, "high")
      .when(integration > 0.4, "medium")
      .otherwise("low")
}
