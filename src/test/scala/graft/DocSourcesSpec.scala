package graft

import graft.sources.DocSources
import org.apache.spark.sql.functions._
import java.nio.file.Files

class DocSourcesSpec extends SparkSuite {
  import spark.implicits._

  test("S3 OCR-JSON source: both schema variants, error rows dropped, conf normalized") {
    val dir = Files.createTempDirectory("graft_ocr_")
    // variant 1: parallel arrays, 4-point polygons, percent confidence
    Files.writeString(dir.resolve("enhanced_doc1_ocr.json"),
      """{"texts":["FACTURE","123,45 DH"],
        |"bboxes":[[[10,20],[110,20],[110,44],[10,44]],[[10,60],[90,60],[90,84],[10,84]]],
        |"confidences":[92.0,80.0]}""".stripMargin.replace("\n", ""))
    // variant 2: text_blocks with rect bboxes, fractional confidence
    Files.writeString(dir.resolve("doc2_ocr.json"),
      """{"text_blocks":[{"text":"Total: 9,99","confidence":0.7,
        |"bbox":{"x":5,"y":6,"width":50,"height":12}}]}""".stripMargin.replace("\n", ""))
    // error row → dropped (P3)
    Files.writeString(dir.resolve("doc3_ocr.json"), """{"error":"engine crashed"}""")

    val out = DocSources.readOcrJson(spark, dir.toString + "/*.json")
    val rows = out.select($"doc_id", explode($"spans").as("s"))
      .select($"doc_id", $"s.text", $"s.offset", $"s.conf",
        $"s.bbox.x", $"s.bbox.y", $"s.bbox.w", $"s.bbox.h")
      .as[(String, String, Int, Double, Int, Int, Int, Int)]
      .collect().sortBy(r => (r._1, r._3))

    assert(rows.map(_._1).distinct.toSeq == Seq("doc1", "doc2")) // J1 stem normalization
    assert(rows.length == 3)
    val (d1a, d1b, d2) = (rows(0), rows(1), rows(2))
    assert(d1a._2 == "FACTURE" && d1a._4 == 0.92) // percent → fraction
    assert((d1a._5, d1a._6, d1a._7, d1a._8) == ((10, 20, 100, 24))) // poly → rect
    assert(d1b._2 == "123,45 DH" && d1b._3 == 1)
    assert(d2._2 == "Total: 9,99" && d2._4 == 0.7 && (d2._5, d2._6, d2._7, d2._8) == ((5, 6, 50, 12)))
  }

  test("S3 variant 3: Google Vision text_annotations (vertices, sparse fields, defaults)") {
    val dir = Files.createTempDirectory("graft_vision_")
    // reference semantics (ocr_integration.py:120-139): bbox from vertices
    // [v0, _, v2, _] when ≥4, else zeros; confidence defaults 0.8; missing
    // vertex coordinates default 0
    Files.writeString(dir.resolve("ocr_doc9.json"),
      """{"text_annotations":[
        |{"description":"FACTURE N 42","confidence":0.95,
        | "bounding_poly":{"vertices":[{"x":10,"y":20},{"x":110,"y":20},{"x":110,"y":44},{"x":10,"y":44}]}},
        |{"description":"sans confiance",
        | "bounding_poly":{"vertices":[{"y":5},{"x":60,"y":5},{"x":60,"y":15},{"x":0,"y":15}]}},
        |{"description":"trois sommets",
        | "bounding_poly":{"vertices":[{"x":1,"y":1},{"x":2,"y":1},{"x":2,"y":2}]}}]}""".stripMargin.replace("\n", ""))

    val rows = DocSources.readOcrJson(spark, dir.toString + "/*.json")
      .select($"doc_id", explode($"spans").as("s"))
      .select($"doc_id", $"s.text", $"s.offset", $"s.conf",
        $"s.bbox.x", $"s.bbox.y", $"s.bbox.w", $"s.bbox.h")
      .as[(String, String, Int, Double, Int, Int, Int, Int)]
      .collect().sortBy(_._3)

    assert(rows.map(_._1).distinct.toSeq == Seq("doc9")) // ocr_<stem> normalization
    assert(rows.length == 3)
    assert(rows(0)._2 == "FACTURE N 42" && rows(0)._4 == 0.95)
    assert((rows(0)._5, rows(0)._6, rows(0)._7, rows(0)._8) == ((10, 20, 100, 24)))
    // missing confidence → 0.8; missing v0.x → 0 so w = v2.x − 0
    assert(rows(1)._4 == 0.8 && (rows(1)._5, rows(1)._6, rows(1)._7, rows(1)._8) == ((0, 5, 60, 10)))
    // < 4 vertices → zero bbox
    assert((rows(2)._5, rows(2)._6, rows(2)._7, rows(2)._8) == ((0, 0, 0, 0)))
  }

  test("P5 round trip: rect → poly → rect") {
    val df = Seq((3, 4, 10, 20)).toDF("x", "y", "w", "h")
      .select(struct($"x", $"y", $"w", $"h").as("r"))
    val back = df.select(DocSources.polyToRect(DocSources.rectToPoly($"r")).as("r2"))
      .select("r2.x", "r2.y", "r2.w", "r2.h").as[(Int, Int, Int, Int)].head()
    assert(back == ((3, 4, 10, 20)))
  }

  test("P7 coordinate normalization") {
    val df = Seq((100, 200, 50, 25)).toDF("x", "y", "w", "h")
      .select(struct($"x", $"y", $"w", $"h").as("r"))
    val n = df.select(DocSources.normalizeRect($"r", lit(1000), lit(1400)).as("n"))
      .select("n.x", "n.y", "n.w", "n.h").as[(Double, Double, Double, Double)].head()
    assert(n == ((0.1, 200.0 / 1400, 0.05, 25.0 / 1400)))
  }

  test("S7 TSV sink shape") {
    val dir = Files.createTempDirectory("graft_tsv_").toString + "/out"
    DocSources.writeTsv(Seq(("img1.png", """{"k":1}""")).toDF("k", "v"), "k", "v", dir)
    val lines = spark.read.option("sep", "\t").csv(dir).as[(String, String)].collect()
    assert(lines.toSeq == Seq(("img1.png", """{"k":1}""")))
  }

  test("bucketed sink: same-key same-bucket-count join runs with ZERO shuffle exchanges") {
    val docs = (0 until 500).map(i => (f"inv-$i%06d", i)).toDF("doc_id", "a")
    val derived = (0 until 500).map(i => (f"inv-$i%06d", i * 2)).toDF("doc_id", "b")
    DocSources.writeBucketed(docs, "bt_docs", "doc_id", nBuckets = 8)
    DocSources.writeBucketed(derived, "bt_triples", "doc_id", nBuckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bt_docs").join(spark.table("bt_triples"), "doc_id")
      assert(joined.count() == 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // bucket metadata supplies the partitioning — no Exchange anywhere
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bt_docs")
      spark.sql("DROP TABLE IF EXISTS bt_triples")
    }
  }
}
