package graft

import graft.fixtures.InvoiceCorpus
import graft.metrics.Evaluation
import graft.run.Extract
import graft.tag.ZoneDetector
import org.apache.spark.sql.functions._

/** Zone-level evaluation scorecard (vlm/evaluation.py:346-425), including
  * the reference's true-negative quirk (:362-363). */
class ZoneEvalSpec extends SparkSuite {
  import spark.implicits._

  private def prf(c: org.apache.spark.sql.Column, df: org.apache.spark.sql.DataFrame) =
    df.select(c.as("e")).select("e.precision", "e.recall", "e.f1_score")
      .as[(Double, Double, Double)].head()

  test("binary zone detection: TP and TN both score P=R=F1=1 (reference quirk), FP/FN score 0") {
    val df = Seq((true, true), (true, false), (false, true), (false, false))
      .toDF("det", "exp")
    val rows = df.select($"det", $"exp",
        Evaluation.zoneDetectionEval($"det", $"exp").as("e"))
      .select($"det", $"exp", $"e.precision", $"e.recall", $"e.f1_score")
      .as[(Boolean, Boolean, Double, Double, Double)].collect().toSet
    assert(rows == Set(
      (true, true, 1.0, 1.0, 1.0),
      (true, false, 0.0, 0.0, 0.0),
      (false, true, 0.0, 0.0, 0.0),
      (false, false, 1.0, 1.0, 1.0))) // TN → perfect score, per the reference
  }

  test("count-based table eval: min() true-positive approximation and the expected=0 branches") {
    val df = Seq((0, 0), (2, 0), (3, 2), (1, 4)).toDF("d", "e")
    val rows = df.select($"d", $"e", Evaluation.tableCountEval($"d", $"e").as("x"))
      .select($"d", $"e", round($"x.precision", 4), round($"x.recall", 4), round($"x.f1_score", 4))
      .as[(Int, Int, Double, Double, Double)].collect().toSet
    assert(rows == Set(
      (0, 0, 1.0, 1.0, 1.0),
      (2, 0, 0.0, 1.0, 0.0),
      (3, 2, 0.6667, 1.0, 0.8),
      (1, 4, 1.0, 0.25, 0.4)))
  }

  test("amount value eval: per-expected matching within 0.01, empty-side conventions") {
    val df = Seq(
      (Seq(10.0, 20.005), Seq(20.0, 30.0)), // one expected matched → p=0.5 r=0.5
      (Seq.empty[Double], Seq(5.0)),        // nothing detected → p=0, r=0
      (Seq(1.0), Seq.empty[Double]),        // nothing expected → p=0, r=1 (reference convention)
      (Seq(7.0, 7.001), Seq(7.0)))          // both detected match ONE expected → matches=1, p=0.5, r=1
      .toDF("det", "exp")
    val got = df.select(Evaluation.amountValuesEval($"det", $"exp").as("x"))
      .select(round($"x.precision", 4), round($"x.recall", 4), $"x.matches")
      .as[(Double, Double, Long)].collect().toSeq
    assert(got == Seq((0.5, 0.5, 1L), (0.0, 0.0, 0L), (0.0, 1.0, 0L), (0.5, 1.0, 1L)))
  }

  test("layout-quality accuracy: proximity to expected, floored at 0") {
    val df = Seq((0.8, 0.8), (0.6, 0.8), (0.0, 0.8), (1.0, 0.0)).toDF("s", "e")
    val got = df.select(round(Evaluation.layoutQualityEval($"s", $"e"), 4))
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.8, 0.2, 0.0))
  }

  test("global metrics rollup averages the per-doc scorecard") {
    val tagged = Extract.tag(InvoiceCorpus.docs(spark, 12).toDF())
    val report = ZoneDetector.detectZones(tagged)
    val truth = report.select($"doc_id",
      lit(true).as("header_present"), lit(true).as("footer_present"),
      lit(1).as("n_tables"),
      transform($"footer.totals", t => t.getField("value").cast("double")).as("amounts"))
    val g = Evaluation.globalZoneMetrics(Evaluation.evaluateZones(report, truth))
      .select("header_precision", "amount_f1", "overall_f1")
      .as[(Double, Double, Double)].head()
    // detected zones agree with planted truth for header/amounts
    assert(g._1 == 1.0 && g._2 == 1.0)
    assert(g._3 > 0.0 && g._3 <= 1.0)
  }

  test("OCR text metrics: exact accuracy (py-strip), mean edit distance, empty-pair similarity quirk") {
    val pairs = Seq(
      ("Facture 42", "facture 42"),   // exact after lower (dist 2 on lowered? no — lowered equal → dist 0)
      ("\tFACTURE\n", "facture"),     // exact after python strip + lower
      ("abcd", "abxd"),               // dist 1, maxLen 4 → sim 0.75
      ("", ""))                       // reference quirk: sim 0, NOT 1
      .toDF("pred", "expected")
    val m = Evaluation.ocrTextMetrics(pairs)
      .select(round($"exact_accuracy", 4), round($"avg_edit_distance", 4),
        round($"avg_similarity", 4), $"n_pairs")
      .as[(Double, Double, Double, Long)].head()
    // exact: rows 1,2,4 (empty==empty) → 3/4; dists: 0, 2 ("\tfacture\n" vs
    // "facture" — levenshtein on LOWERED but UNSTRIPPED = 2), 1, 0 → avg
    // 0.75; sims: 1.0, 1−2/9, 0.75, 0 (quirk) → avg ≈ 0.6319
    assert(m == ((0.75, 0.75, 0.6319, 4L)), m)
  }

  test("end-to-end scorecard over the real zone report") {
    val tagged = Extract.tag(InvoiceCorpus.docs(spark, 20).toDF())
    val report = ZoneDetector.detectZones(tagged)
    // ground truth: every fixture invoice has a header, totals and a table
    val truth = report.select($"doc_id",
      lit(true).as("header_present"), lit(true).as("footer_present"),
      lit(1).as("n_tables"),
      transform($"footer.totals", t => t.getField("value").cast("double")).as("amounts"))
    val out = Evaluation.evaluateZones(report, truth)
    assert(out.count() == 20)
    // detected zones agree with the planted truth → perfect scores
    val f1s = out.select($"header_eval.f1_score", $"amounts_eval.f1_score")
      .as[(Double, Double)].collect()
    assert(f1s.forall(x => x._1 == 1.0 && x._2 == 1.0), f1s.toSeq.distinct)
  }
}
