package graft

import graft.fixtures.InvoiceCorpus
import graft.run.Extract
import graft.tag.ZoneDetector
import org.apache.spark.sql.functions._

class ZoneDetectorSpec extends SparkSuite {
  import spark.implicits._

  test("keyword-indicator confidence: hits/total capped at 1, threshold 0.3") {
    val conf = Seq("facture numero 12 du date", "rien ici", "facture invoice devis numero date x")
      .toDF("t")
      .select(round(ZoneDetector.zoneConfidence($"t", ZoneDetector.headerKeywords), 2))
      .as[Double].collect().toSeq
    assert(conf == Seq(0.6, 0.0, 1.0))
  }

  test("fixture docs: header + footer detected, totals typed, addresses parsed") {
    val tagged = Extract.tag(InvoiceCorpus.docs(spark, 10).toDF())
    val z = ZoneDetector.detectZones(tagged).cache()
    // header: "facture" + "date" present in every fixture doc → conf ≥ 0.4
    assert(z.where(!$"header.detected").count() == 0)
    // footer: total/tva/ht/ttc all present → conf ≥ 0.8
    assert(z.where($"footer.confidence" < 0.8).count() == 0)
    // totals extracted and classified: every doc carries a subtotal amount
    val types = z.select(explode($"footer.totals.type").as("t"))
      .distinct().as[String].collect().toSet
    assert(types.contains("amount"))
    // address blocks: sender + receiver for docs whose address spans tag as
    // 'address' (street-keyword dependent), with 5-digit postal extracted
    val blocks = z.select(explode($"address_blocks").as("b"))
      .select($"b.type", $"b.postal_code")
      .as[(String, String)].collect()
    assert(blocks.nonEmpty)
    assert(blocks.forall(_._2.matches("\\d{5}")))
    assert(blocks.map(_._1).toSet.subsetOf(Set("sender", "receiver")))
  }

  test("layout quality: weighted composite in [0,1], complete docs score high") {
    val tagged = Extract.tag(InvoiceCorpus.docs(spark, 10).toDF())
    val q = ZoneDetector.layoutQuality(ZoneDetector.detectZones(tagged))
    val rows = q.select("clarity", "organization", "completeness", "overall_score")
      .as[(Double, Double, Double, Double)].collect()
    assert(rows.forall { case (c, o, cm, s) =>
      Seq(c, o, cm, s).forall(v => v >= 0.0 && v <= 1.0)
    })
    // fixture docs have header + amounts → completeness 1.0, overall ≥ 0.7
    assert(rows.forall(_._3 == 1.0))
    assert(rows.forall(_._4 >= 0.7))
  }

  test("table keywords absent from fixture template → not detected (threshold semantics)") {
    val tagged = Extract.tag(InvoiceCorpus.docs(spark, 5).toDF())
    val z = ZoneDetector.detectZones(tagged)
    assert(z.where($"table_zone.detected").count() == 0)
    // but a reference-vocabulary table IS detected
    val conf = Seq("designation quantite prix unitaire")
      .toDF("t").select(ZoneDetector.zoneConfidence($"t", ZoneDetector.tableKeywords))
      .as[Double].head()
    assert(conf > ZoneDetector.ConfidenceThreshold)
  }
}
