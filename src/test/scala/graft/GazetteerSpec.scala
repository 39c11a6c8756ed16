package graft

import graft.fixtures.InvoiceCorpus
import graft.link.Gazetteer
import graft.metrics.Evaluation
import graft.tag.Taggers
import org.apache.spark.sql.functions._

class GazetteerSpec extends SparkSuite {
  import spark.implicits._

  test("J5 rlike-alternation keyword membership (regex metachars quoted)") {
    val out = Seq("grand TOTAL ici", "rien", "prix (ttc)", "a+b").toDF("t")
      .select(Gazetteer.containsAnyKeyword($"t", Seq("total", "ttc", "a+b")))
      .as[Boolean].collect().toSeq
    assert(out == Seq(true, false, true, true))
  }

  test("J5 keyword hit-ratio scoring (zone_detector threshold shape)") {
    val s = Seq("facture total montant").toDF("t")
      .select(Gazetteer.keywordScore($"t", Seq("facture", "total", "tva", "montant")))
      .as[Double].head()
    assert(s == 0.75)
  }

  test("J5 broadcast gazetteer match resolves surface forms to canon entries") {
    val gaz = InvoiceCorpus.companies.toDF("name")
    val surfaces = Seq(
      "Atlas Tech Solutions Sarl", // case variant → normalizes to same key
      "ATLAS TECH SOLUTIONS SARL",
      "UNKNOWN LLC").toDF("surface")
    val out = Gazetteer.matchAgainst(surfaces, "surface", gaz, "name")
      .select("surface", "gazetteer_match").as[(String, Option[String])]
      .collect().toMap
    assert(out("Atlas Tech Solutions Sarl").contains("ATLAS TECH SOLUTIONS SARL"))
    assert(out("UNKNOWN LLC").isEmpty)
  }

  test("F14 CER aggregate") {
    val pairs = Seq(("kitten", "sitting"), ("abc", "abc")).toDF("pred", "expected")
    val c = Evaluation.cer(pairs)
    assert(math.abs(c - 3.0 / 10.0) < 1e-9)
    assert(Evaluation.cer(Seq.empty[(String, String)].toDF("pred", "expected")) == 0.0)
  }

  test("F15 full text + zone-ordered text") {
    val docs = InvoiceCorpus.docs(spark, 2).toDF()
    val ft = docs.select(Taggers.fullText($"spans")).as[String].head()
    assert(ft.contains("FACT-") && ft.contains("TOTAL TTC") && !ft.contains("img://"))
    val tagged = graft.run.Extract.tag(docs)
    val zt = tagged.select(Taggers.zoneOrderedText($"tagged")).as[String].head()
    // zone order: header text before items, items before footer
    assert(zt.indexOf("Destinataire") < zt.indexOf("Description"))
    assert(zt.indexOf("TOTAL TTC") < zt.indexOf("Merci"))
  }

  test("A8 bounded max") {
    val out = Seq(5.0, 99.0, 100.0, 150.0).toDF("v")
      .agg(Taggers.boundedMax($"v", 100.0)).as[Double].head()
    assert(out == 99.0)
  }
}
