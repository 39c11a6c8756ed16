package graft.sources

import graft.tag.Taggers
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources and sinks (SURVEY.md §2.1).
  *
  * The reference probes OCR-JSON schemas defensively at runtime
  * (data_preparation.py:91-144 — three variants). The Spark-native form is
  * one EXPLICIT StructType covering all variants at the ingest boundary,
  * one canonicalization select, then a statically-typed table everywhere
  * else. Schema inference never runs in the engine path.
  */
object DocSources {

  /** Explicit ingest schema — superset of the reference's OCR-JSON variants:
    *  - "ancien format": parallel arrays texts/bboxes/confidences
    *    (data_preparation.py:96-109)
    *  - "nouveau format": text_blocks[{text, confidence, bbox{x,y,w,h}}]
    *    (data_preparation.py:111-139; ocr_starter_final.py:86-118)
    *  - Google Vision: text_annotations[{description, confidence?,
    *    bounding_poly.vertices[{x,y}]}] (ocr_integration.py:118-139)
    */
  val ocrJsonSchema: StructType = StructType(Seq(
    StructField("image_path", StringType),
    StructField("engine", StringType),
    StructField("error", StringType),
    // variant 1: parallel arrays (4-point polygons)
    StructField("texts", ArrayType(StringType)),
    StructField("bboxes", ArrayType(ArrayType(ArrayType(IntegerType)))),
    StructField("confidences", ArrayType(DoubleType)),
    // variant 2: structured blocks (rect bboxes)
    StructField("text_blocks", ArrayType(StructType(Seq(
      StructField("text", StringType),
      StructField("confidence", DoubleType),
      StructField("bbox", StructType(Seq(
        StructField("x", IntegerType), StructField("y", IntegerType),
        StructField("width", IntegerType), StructField("height", IntegerType)))))))),
    // variant 3: Google Vision annotations (vertex polygons, sparse fields)
    StructField("text_annotations", ArrayType(StructType(Seq(
      StructField("description", StringType),
      StructField("confidence", DoubleType),
      StructField("bounding_poly", StructType(Seq(
        StructField("vertices", ArrayType(StructType(Seq(
          StructField("x", IntegerType), StructField("y", IntegerType))))))))))))))

  /** P5 — 4-point polygon → rect struct<x,y,w,h>
    * (data_preparation.py:119-126, :396-400). */
  def polyToRect(poly: Column): Column = {
    val xs = transform(poly, p => element_at(p, 1))
    val ys = transform(poly, p => element_at(p, 2))
    struct(
      array_min(xs).as("x"), array_min(ys).as("y"),
      (array_max(xs) - array_min(xs)).as("w"),
      (array_max(ys) - array_min(ys)).as("h"))
  }

  /** P5 inverse — rect → 4-point polygon. */
  def rectToPoly(r: Column): Column = {
    val x = r.getField("x"); val y = r.getField("y")
    val x2 = x + r.getField("w"); val y2 = y + r.getField("h")
    array(array(x, y), array(x2, y), array(x2, y2), array(x, y2))
  }

  /** P7 — coordinate normalization to [0,1] (geometry_utils.py:362-403). */
  def normalizeRect(r: Column, pageW: Column, pageH: Column): Column =
    struct(
      (r.getField("x") / pageW.cast("double")).as("x"),
      (r.getField("y") / pageH.cast("double")).as("y"),
      (r.getField("w") / pageW.cast("double")).as("w"),
      (r.getField("h") / pageH.cast("double")).as("h"))

  /** S3 — OCR-JSON source: read both schema variants, drop error rows (P3),
    * zip parallel arrays positionally (J4 — arrays_zip + posexplode shape),
    * normalize bboxes to rects and confidences to [0,1], derive doc_id from
    * the filename stem (J1 normalization), emit the canonical span table:
    * (doc_id, spans: array<struct<kind,text,media_ref,offset,conf,bbox>>).
    */
  def readOcrJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.schema(ocrJsonSchema).json(path)
      .withColumn("doc_id",
        Taggers.normalizeDocId(
          regexp_replace(element_at(split(input_file_name(), "/"), -1), "\\.json$", "")))
      .where(col("error").isNull) // P3 (ocr_starter_final.py:460-461)

    // variant 1 → blocks via positional zip of the parallel arrays
    val v1Blocks = zip_with(
      col("texts"),
      zip_with(col("bboxes"), col("confidences"), (b, c) => struct(b.as("b"), c.as("c"))),
      (t, bc) => struct(
        t.as("text"),
        bc.getField("c").as("confidence"),
        polyToRect(bc.getField("b")).as("bbox")))
    // variant 2 → blocks with bbox field renames
    val v2Blocks = transform(col("text_blocks"), b => struct(
      b.getField("text").as("text"),
      b.getField("confidence").as("confidence"),
      struct(
        b.getField("bbox").getField("x").as("x"),
        b.getField("bbox").getField("y").as("y"),
        b.getField("bbox").getField("width").as("w"),
        b.getField("bbox").getField("height").as("h")).as("bbox")))

    // variant 3 → blocks with the reference's exact Vision semantics
    // (ocr_integration.py:120-139): bbox = [v0.x, v0.y, v2.x, v2.y] when ≥4
    // vertices else zeros; missing vertex coords default 0; confidence
    // defaults 0.8; description defaults ''
    val v3Blocks = transform(col("text_annotations"), a => {
      val vs = a.getField("bounding_poly").getField("vertices")
      def vx(i: Int) = coalesce(element_at(vs, i + 1).getField("x"), lit(0))
      def vy(i: Int) = coalesce(element_at(vs, i + 1).getField("y"), lit(0))
      val ok = size(vs) >= 4
      struct(
        coalesce(a.getField("description"), lit("")).as("text"),
        coalesce(a.getField("confidence"), lit(0.8)).as("confidence"),
        struct(
          when(ok, vx(0)).otherwise(lit(0)).as("x"),
          when(ok, vy(0)).otherwise(lit(0)).as("y"),
          when(ok, vx(2) - vx(0)).otherwise(lit(0)).as("w"),
          when(ok, vy(2) - vy(0)).otherwise(lit(0)).as("h")).as("bbox"))
    })

    val blocks = when(col("texts").isNotNull, v1Blocks)
      .when(col("text_blocks").isNotNull, v2Blocks)
      .otherwise(v3Blocks)
    raw.select(col("doc_id"), blocks.as("blocks"))
      .select(col("doc_id"), transform(col("blocks"), (b, i) => struct(
        lit("text").as("kind"),
        b.getField("text").as("text"),
        lit("").as("media_ref"),
        i.cast("int").as("offset"),
        Taggers.normalizeConf(b.getField("confidence")).as("conf"),
        b.getField("bbox").as("bbox"))).as("spans"))
  }

  /** S1 — raw media scan: binary payloads with metadata, predicate-prunable.
    * (For directory trees of images; the engine's docs table references
    * media by `media_ref` instead of inlining payloads.) */
  def readBinaryMedia(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path").as("media_ref"), col("length"), col("content"))

  /** S4 — train/val/test split sink: deterministic seeded split, one
    * directory per split (data_preparation.py:258-297, seed 42). */
  def writeSplits(docs: DataFrame, outDir: String, seed: Long = 42L): Unit = {
    val Array(tr, va, te) = docs.randomSplit(Array(0.8, 0.1, 0.1), seed)
    tr.write.mode("overwrite").parquet(s"$outDir/train")
    va.write.mode("overwrite").parquet(s"$outDir/validation")
    te.write.mode("overwrite").parquet(s"$outDir/test")
  }

  /** S7 — TSV list sink (PaddleOCR det/rec list shape,
    * data_preparation.py:449-478): `key<TAB>value`. */
  def writeTsv(df: DataFrame, keyCol: String, valueCol: String, outDir: String): Unit =
    df.select(col(keyCol).cast("string"), col(valueCol).cast("string"))
      .write.mode("overwrite").option("sep", "\t").csv(outDir)

  /** Bucketed sink — the co-located-join layout for the 100 TB star joins:
    * two tables bucketed (and sorted) by the same key into the same bucket
    * count join with ZERO shuffle exchanges — at a 10^12-doc corpus the
    * doc_id join between the docs table and any per-doc derivative (triples,
    * zone reports, media features) is THE recurring join, and pre-bucketing
    * removes its full-corpus shuffle from every downstream job. Requires a
    * catalog table (bucket metadata lives in the catalog, not the files).
    * DocSourcesSpec asserts the shuffle-free plan. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      nBuckets: Int = 64): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
}
