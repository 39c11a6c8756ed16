package graft

import graft.tag.Taggers
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-oracle parity gate (FIXTURES.md §4): the 7-document / 284-
  * annotation golden corpus committed from
  * /root/reference/Data/fine_tuning/annotations/ground_truth.json.
  * Our taggers must reproduce every `type`, `zone_type` and `enhanced_type`
  * — quirks included.
  */
class GoldenCorpusSpec extends SparkSuite {
  import spark.implicits._

  private lazy val golden = spark.read
    .json("src/test/resources/golden_annotations.jsonl")
    .cache()

  test("golden corpus loaded intact (284 annotations, 7 docs)") {
    assert(golden.count() == 284)
    assert(golden.select("doc").distinct().count() == 7)
  }

  test("F5 type parity: 284/284") {
    val mismatches = golden
      .withColumn("pred", Taggers.classifyTextType(col("text")))
      .where(col("pred") =!= col("type"))
    assert(mismatches.count() == 0, mismatches.select("text", "type", "pred").collect().mkString(","))
  }

  test("A3 zone parity: 284/284") {
    // reference recipe (data_preparation.py:197-236): y_center = mean of the
    // 4 polygon y's; total_height = max y over ALL annotations of the doc
    val tot = Window.partitionBy("doc")
    val yc = expr("aggregate(ys, 0L, (a, y) -> a + y)").cast("double") / size(col("ys"))
    val pred = golden
      .withColumn("tot_h", max(expr("aggregate(ys, 0L, (a, y) -> greatest(a, y))")).over(tot))
      .withColumn("rel", yc / col("tot_h"))
      .withColumn("pred_zone", Taggers.zoneOfRelPos(col("rel")))
    val mismatches = pred.where(col("pred_zone") =!= col("zone_type"))
    assert(mismatches.count() == 0,
      mismatches.select("text", "zone_type", "pred_zone", "rel").collect().mkString(","))
  }

  test("F6 enhanced_type parity: 284/284") {
    val tot = Window.partitionBy("doc")
    val yc = expr("aggregate(ys, 0L, (a, y) -> a + y)").cast("double") / size(col("ys"))
    val pred = golden
      .withColumn("tot_h", max(expr("aggregate(ys, 0L, (a, y) -> greatest(a, y))")).over(tot))
      .withColumn("zone", Taggers.zoneOfRelPos(yc / col("tot_h")))
      .withColumn("pred_e", Taggers.enhanceTextType(col("text"), col("zone")))
    val mismatches = pred.where(col("pred_e") =!= col("enhanced_type"))
    assert(mismatches.count() == 0,
      mismatches.select("text", "zone", "enhanced_type", "pred_e").collect().mkString(","))
  }

  test("type distribution matches dataset_statistics.json:4-13") {
    val dist = golden.groupBy("type").count().as[(String, Long)].collect().toMap
    assert(dist == Map("header" -> 7L, "date" -> 16L, "text" -> 147L, "phone" -> 36L,
      "amount" -> 58L, "email" -> 9L, "number" -> 7L, "address" -> 4L))
  }

  test("FastExtract scalar taggers agree with golden too") {
    val rows = golden.select("text", "type").as[(String, String)].collect()
    rows.foreach { case (text, expected) =>
      assert(graft.run.FastExtract.classifyTextType(text) == expected, s"text=$text")
    }
  }
}
