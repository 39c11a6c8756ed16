package graft

import graft.fixtures.InvoiceCorpus
import graft.run.{FastExtract, Pipeline}
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds plus the KG
  * throughput headline (triples/sec on a freshly synthesized corpus —
  * generation is included in the timing; it's a narrow mapPartitions and
  * represents the scan cost of a real docs table). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val kgDocs = sys.env.getOrElse("SPARK_GRAFT_KG_DOCS", "100000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = time {
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
      }
    }

    // KG headline: mention-detect → triples (narrow path) and the full
    // pipeline (EL + CC + canonicalize + dedup); small unmeasured warmup
    // first so the headline reflects steady state, not JIT/codegen
    FastExtract.triples(
      InvoiceCorpus.docs(spark, 500).toDF()
        .selectExpr("doc_id", "page_w", "page_h", "spans").as[graft.model.OcrDoc]).count()
    val docs = InvoiceCorpus.docs(spark, kgDocs).toDF()
    var nTriples = 0L
    val tExtract = time {
      nTriples = FastExtract.triples(
        docs.selectExpr("doc_id", "page_w", "page_h", "spans")
          .as[graft.model.OcrDoc]).count()
    }
    var nGraph = 0L
    val tPipeline = time { nGraph = Pipeline.run(docs).count() }
    results("kg_extract") = tExtract
    results("kg_pipeline") = tPipeline

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.sum
    val extras = f""""kg_docs":$kgDocs,"kg_triples":$nTriples,"kg_graph_edges":$nGraph,""" +
      f""""extract_triples_per_sec":${nTriples / tExtract}%.1f,""" +
      f""""pipeline_triples_per_sec":${nGraph / tPipeline}%.1f,""" +
      f""""extract_docs_per_sec":${kgDocs / tExtract}%.1f,""" +
      s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$extras,"sf":"$sfDir"}""")
    spark.stop()
  }
}
