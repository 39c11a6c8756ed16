package graft.streaming

import graft.run.{Extract, Pipeline}
import graft.graph.TripleStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming facade over the batch engine.
  *
  * The reference has no streaming operators (SURVEY.md §2.9) — its
  * incremental unit is "per-file output written immediately" (resume =
  * reprocess). The Spark-native equivalents:
  *
  *  - docs ingestion: `readStream` over the docs table directory,
  *    `Trigger.AvailableNow` (drain-and-stop), `dropDuplicates("doc_id")`
  *    for idempotence, foreachBatch → the same Extract.triples batch code +
  *    TripleStore snapshot commit. Exactly-once per micro-batch via the
  *    snapshot manifest (batchId is the commit key).
  *  - event-time analytics: watermarked tumbling-window aggregation, the
  *    canonical late-data-tolerant shape for the corpus telemetry stream.
  */
object Streams {

  /** Input-contract schema (BASELINE.json input_hint), needed explicitly:
    * streaming sources don't infer. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("page_w", IntegerType),
    StructField("page_h", IntegerType),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("text", StringType),
      StructField("media_ref", StringType),
      StructField("offset", IntegerType),
      StructField("conf", DoubleType),
      StructField("bbox", StructType(Seq(
        StructField("x", IntegerType), StructField("y", IntegerType),
        StructField("w", IntegerType), StructField("h", IntegerType))))))))))

  /** Incrementally extract triples from parquet doc files landing in
    * `docsDir`, committing each micro-batch as a triple-store snapshot.
    * AvailableNow = process everything present, then stop (the batch-job
    * shape with streaming bookkeeping: new files only, checkpointed). */
  def ingestDocs(spark: SparkSession, docsDir: String, storeRoot: String,
      checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(docSchema)
      .parquet(docsDir)
      .dropDuplicates("doc_id")
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val triples = Extract.triples(batch).select("subj", "pred", "obj")
          TripleStore.commitBatch(triples, storeRoot, batchId.toInt,
            Map("stream_batch" -> batchId))
        }
        ()
      }
      .start()
  }

  /** Watermarked tumbling-window aggregation over an event stream
    * (ts, event_type, value): counts + sums per (window, type), tolerating
    * `lateness` out-of-order data. Works on any streaming DataFrame with
    * those columns (MemoryStream in tests, Kafka in production). */
  def windowedEventStats(events: DataFrame, window_ : String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
}
