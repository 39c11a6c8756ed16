package graft

import graft.link.CrossValidate
import org.apache.spark.sql.functions._

/** OCR⋈VLM amount cross-validation (ocr_integration.py:185-210, 281-310). */
class CrossValidateSpec extends SparkSuite {
  import spark.implicits._

  test("number extraction: reference regex, comma-decimal normalization") {
    val df = Seq(("Sous-total: 1234,50 DH et TVA 246.90", 1)).toDF("text", "x")
    val nums = df.select(CrossValidate.textNumbers($"text").cast("array<string>"))
      .as[Seq[String]].head()
    assert(nums == Seq("1234.5000", "246.9000"))
  }

  test("tolerance match <0.01, confidence +0.2 capped at 1.0, banded join == reference scan") {
    val vlm = Seq(
      (1L, BigDecimal("100.00"), 0.60), // exact text match → validated, 0.8
      (1L, BigDecimal("250.00"), 0.95), // within 0.009 → validated, capped 1.0
      (1L, BigDecimal("77.77"), 0.50),  // no number within 0.01 → not validated
      (2L, BigDecimal("100.00"), 0.40), // right number, WRONG doc → not validated
      (3L, BigDecimal("5.00"), 0.30))   // doc with no ocr rows at all
      .toDF("doc_id", "amount", "confidence")
    val ocr = Seq(
      (1L, "Total: 100,00 DH"),
      (1L, "montant 249.995 environ"), // |249.995 - 250.00| = 0.005 < 0.01, crosses the floor(×100) boundary
      (1L, "77.79 est trop loin"),     // diff 0.02 ≥ 0.01
      (2L, "rien d'utile ici"))
      .toDF("doc_id", "text")
    val out = CrossValidate.validateAmounts(vlm, ocr)
      .select($"doc_id", $"amount".cast("decimal(18,2)").cast("string"),
        round($"confidence", 4), $"validated_by_ocr")
      .as[(Long, String, Double, Boolean)].collect().toSet
    assert(out == Set(
      (1L, "100.00", 0.8, true),
      (1L, "250.00", 1.0, true),
      (1L, "77.77", 0.5, false),
      (2L, "100.00", 0.4, false),
      (3L, "5.00", 0.3, false)))
  }

  test("0.01-boundary pairs follow FLOAT64 rounding, exactly like the reference") {
    // the reference compares Python floats: |10.00−9.99| = 0.00999...787
    // VALIDATES, |1.01−1.00| = 0.01000...009 does not — decimal-exact
    // arithmetic would call both 0.0100 and reject both (ADVICE r2)
    val vlm = Seq(
      (1L, BigDecimal("10.00"), 0.5),
      (2L, BigDecimal("1.01"), 0.5)).toDF("doc_id", "amount", "confidence")
    val ocr = Seq((1L, "9.99 exactement"), (2L, "1.00 exactement")).toDF("doc_id", "text")
    val out = CrossValidate.validateAmounts(vlm, ocr)
      .select("doc_id", "validated_by_ocr").as[(Long, Boolean)].collect().toMap
    assert(out(1L), "float64 diff just below 0.01 must validate")
    assert(!out(2L), "float64 diff at/above 0.01 must not validate")
  }
}
