package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata, exactly
  * as they'd arrive from `spark.read.format("binaryFile")` or an Iceberg
  * table with a blob column. The Spark-side mechanics — schema, batch-shaped
  * per-partition processing, partitioning discipline — are real and tested;
  * the codec calls themselves are STUBBED with deterministic fakes because
  * no image/audio libraries ship in this container (clearly marked below).
  * Swapping a stub for a real decoder changes ONE function body and no plan
  * shape.
  *
  * The batch-shaped processing mirrors the reference's per-image model
  * loop (ocr/ocr_starter_final.py:291-324) done right for a cluster:
  * heavyweight init once per PARTITION, rows streamed through in batches —
  * the `mapInPandas`/`mapPartitions` inference pattern (SURVEY.md §2.10).
  */
object Multimodal {

  final case class MediaRow(media_ref: String, kind: String, bytes: Array[Byte])
  final case class DecodedMedia(media_ref: String, kind: String,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** Deterministic fake payload for a media_ref — a stand-in for reading
    * the blob from object storage. Header encodes (w, h, frames). */
  def fakeBytes(mediaRef: String, kind: String): Array[Byte] = {
    val h = mediaRef.hashCode
    val w = 64 + math.abs(h % 192)
    val ht = 64 + math.abs((h / 7) % 192)
    val frames = if (kind == "video") 1 + math.abs((h / 31) % 48) else 1
    val header = Array[Byte](
      (w >> 8).toByte, w.toByte, (ht >> 8).toByte, ht.toByte, frames.toByte)
    val body = Array.tabulate[Byte](64)(i => ((h >> (i % 24)) & 0xff).toByte)
    header ++ body
  }

  /** Media table for a docs corpus: one row per media span, binary payload
    * attached. Repartitioned by media_ref so downstream per-partition
    * decoders see balanced work (payload sizes are skewed in real corpora —
    * hash-repartition on the ref, not the doc, is the right unit). */
  def mediaTable(docs: DataFrame, partitions: Int = 32): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(col("spans")).as("s"))
      .select(col("s.media_ref").as("media_ref"), col("s.kind").as("kind"))
      .where(col("kind") === "media" && col("media_ref") =!= "")
      .repartition(partitions, col("media_ref"))
      .as[(String, String)]
      .map { case (ref, _) =>
        // modality from the ref (deterministic): most media are images;
        // every 7th doc's logo slot carries a video clip so the
        // frame-sampling path has real multi-frame payloads to exercise
        val k = if (ref.endsWith("/logo") && math.abs(ref.hashCode) % 7 == 0) "video" else "image"
        MediaRow(ref, k, fakeBytes(ref, k))
      }
  }

  // =======================================================================
  // STUB: codec boundary. In production these call the real decoder
  // (libjpeg / ffmpeg / torchvision) inside the per-partition loop.
  // Deterministic fakes keep the pipeline testable end-to-end.
  // =======================================================================

  /** STUB — "decode" the 5-byte fake header into dimensions. A real
    * implementation would decode the image/container here. */
  private def decodeHeaderStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val w = ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff)
    val h = ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val frames = bytes(4) & 0xff
    (w, h, frames)
  }

  /** STUB — feature extraction: a deterministic 8-dim "embedding" from the
    * payload bytes. A real implementation runs the vision tower here. */
  private def featureStub(bytes: Array[Byte]): Array[Float] =
    Array.tabulate(8)(i => ((bytes(5 + i) & 0xff).toFloat / 255f) - 0.5f)

  /** Batch-shaped decode + feature-extract over the media table:
    * per-partition init happens ONCE (model load in production), rows are
    * processed in `batchSize` groups (the Arrow-batch shape of mapInPandas).
    */
  def decodeAndFeaturize(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition heavyweight init would go here (one model per
      // partition, not per row — unlike ocr_starter_final.py:129 which
      // re-creates the reader per image)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, f) = decodeHeaderStub(r.bytes)
          DecodedMedia(r.media_ref, r.kind, w, h, f, featureStub(r.bytes))
        }
      }
    }
  }

  /** Resize plumbing (vlm_processor.py:161-174 `_load_and_preprocess_image`):
    * PIL.thumbnail semantics on the metadata — only when EITHER dimension
    * exceeds the max box, scale by the single factor min(maxW/w, maxH/h)
    * (aspect preserved), floor to int with a 1-pixel minimum. The pixel
    * resample itself is the codec stub boundary (LANCZOS in production);
    * the dimension arithmetic — what every downstream layout computation
    * consumes — is real and exact. Pure Column expressions, narrow. */
  def withResizedDims(decoded: DataFrame, maxW: Int = 1024, maxH: Int = 1024): DataFrame = {
    val needs = col("width") > maxW || col("height") > maxH
    val scale = least(lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height"))
    decoded
      .withColumn("out_width",
        when(needs, greatest(floor(col("width") * scale).cast("int"), lit(1)))
          .otherwise(col("width")))
      .withColumn("out_height",
        when(needs, greatest(floor(col("height") * scale).cast("int"), lit(1)))
          .otherwise(col("height")))
  }

  /** Frame sampling plumbing for video payloads: every `everyN`th frame
    * index (decode itself stubbed). Demonstrates the explode shape: one
    * input row → N frame rows, still narrow. */
  def sampleFrames(decoded: Dataset[DecodedMedia], everyN: Int = 5): DataFrame =
    decoded.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(everyN))))
      .select("media_ref", "frame_idx", "width", "height")
}
