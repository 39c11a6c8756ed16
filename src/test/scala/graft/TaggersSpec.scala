package graft

import graft.tag.Taggers
import org.apache.spark.sql.functions._

/** Unit tests for the tagger expression library — rule ORDER and reference
  * quirks included (SURVEY.md §7.4 risk 1). */
class TaggersSpec extends SparkSuite {
  import spark.implicits._

  private def classify(texts: String*): Seq[String] =
    texts.toDF("text").select(Taggers.classifyTextType(col("text"))).as[String].collect().toSeq

  test("F5 rule order and basic classes") {
    assert(classify("FACTURE") == Seq("header"))
    assert(classify("Facture N 123") == Seq("header")) // header wins over number
    assert(classify("123,45 DH") == Seq("amount"))
    assert(classify("total TTC") == Seq("amount"))
    assert(classify("16/04/2024") == Seq("date"))
    assert(classify("contact@x.ma") == Seq("email"))
    assert(classify("Tél: +212 0612") == Seq("phone"))
    assert(classify("Avenue Hassan II") == Seq("address"))
    assert(classify("12345") == Seq("number"))
    assert(classify("12.34") == Seq("number")) // dots stripped before isdigit
    assert(classify("12.34-56") == Seq("date")) // '-' + len<15 → date rule wins over number
    assert(classify("hello world") == Seq("text"))
  }

  test("F5 quirks reproduced, not fixed") {
    // "'/' or '-' and len<15" tags invoice numbers as date
    // (golden corpus annotation 2 — data_preparation.py:156)
    assert(classify("N' Fact-4796") == Seq("date"))
    // substring 'ht' fires the amount rule inside ordinary words
    assert(classify("lighting") == Seq("amount"))
    // substring '01'..'07' fires phone inside any number
    assert(classify("Rabat 10100") == Seq("phone"))
    // len>=15 disables the date rule even with '/'
    assert(classify("ab/cd efgh ijkl m") == Seq("text"))
  }

  test("F6 context enhancement") {
    val df = Seq(
      ("FACTURE", "header"), ("N 12345678", "header"),
      ("TOTAL TTC", "total"), ("1234,56", "total"),
      ("FACTURE", "footer")).toDF("text", "zone")
    val out = df.select(Taggers.enhanceTextType(col("text"), col("zone"))).as[String].collect()
    assert(out.toSeq == Seq("document_type", "document_number", "total_label",
      "total_amount", "header")) // footer FACTURE falls back to F5
  }

  test("A3 zone band edges (data_preparation.py:223-234)") {
    val rels = Seq(0.0, 0.19999, 0.2, 0.39999, 0.4, 0.6, 0.79, 0.8, 0.9499, 0.95, 1.0)
    val out = rels.toDF("r").select(Taggers.zoneOfRelPos(col("r"))).as[String].collect()
    assert(out.toSeq == Seq("header", "header", "company_info", "company_info",
      "client_info", "items", "items", "total", "total", "footer", "footer"))
  }

  test("F2 amount extraction: all matches, pattern order, duplicates kept") {
    val df = Seq("Total: 12,5 et 7.25 € et 3 EUR").toDF("text")
    val vals = df.select(Taggers.extractAmounts(col("text")).as("a"))
      .selectExpr("transform(a, x -> x.value_str) as v").as[Seq[String]].head()
    // pattern order: €-suffix first (7.25), EUR (3), Total-prefix (12,5)
    assert(vals == Seq("7.25", "3", "12,5"))
  }

  test("F3 normalization to DECIMAL(18,2)") {
    val out = Seq("1234,56", "12", "1 234,5", "junk").toDF("s")
      .select(Taggers.normalizeAmount(col("s")).cast("string")).as[String].collect()
    assert(out.toSeq == Seq("1234.56", "12.00", "1234.50", null))
  }

  test("F4 amount-type classifier order (zone_detector.py:283-296)") {
    val out = Seq("Total: 12", "TVA 20%", "montant HT", "somme TTC", "12 €")
      .toDF("c").select(Taggers.classifyAmountType(col("c"))).as[String].collect()
    // "somme TTC": total/somme rule fires FIRST (order-sensitive)
    assert(out.toSeq == Seq("total", "tax", "subtotal", "total", "amount"))
  }

  test("F13 edit similarity (model_evaluation.py:330-336)") {
    val out = Seq(("kitten", "sitting"), ("abc", "abc"), ("", ""))
      .toDF("a", "b")
      .select(round(Taggers.editSimilarity(col("a"), col("b")), 4)).as[Double].collect()
    assert(math.abs(out(0) - (1.0 - 3.0 / 7.0)) < 1e-3)
    assert(out(1) == 1.0)
    assert(out(2) == 1.0)
  }

  test("conf normalization percent/fraction duality (data_preparation.py:131)") {
    val out = Seq(85.0, 0.85, 1.0, 100.0).toDF("c")
      .select(Taggers.normalizeConf(col("c"))).as[Double].collect()
    assert(out.toSeq == Seq(0.85, 0.85, 1.0, 1.0))
  }

  test("F10 geometry: IoU, centers, distance") {
    val df = Seq((10, 10, 20, 20, 10, 10, 20, 20)).toDF("ax", "ay", "aw", "ah", "bx", "by", "bw", "bh")
      .select(struct(col("ax").as("x"), col("ay").as("y"), col("aw").as("w"), col("ah").as("h")).as("a"),
        struct(col("bx").as("x"), col("by").as("y"), col("bw").as("w"), col("bh").as("h")).as("b"))
    val iou = df.select(Taggers.bboxIoU(col("a"), col("b"))).as[Double].head()
    assert(math.abs(iou - 1.0) < 1e-9)
    val dist = df.select(Taggers.euclidean(lit(0.0), lit(0.0), lit(3.0), lit(4.0))).as[Double].head()
    assert(dist == 5.0) // quick_test.py geometry assert
  }
}
