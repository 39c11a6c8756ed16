package graft

import graft.fixtures.InvoiceCorpus
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = InvoiceCorpus.docs(spark, 25).toDF().cache()

  test("media table: one row per media span, payload attached, partitioned") {
    val media = Multimodal.mediaTable(docs, partitions = 8)
    val rows = media.collect()
    assert(rows.length == 50) // logo + stamp per doc
    assert(rows.forall(_.bytes.length == 69)) // 5-byte header + 64-byte body
    assert(media.rdd.getNumPartitions == 8)
    assert(rows.map(_.media_ref).distinct.length == 50)
  }

  test("decode stub: schema and deterministic dims") {
    val dec = Multimodal.decodeAndFeaturize(Multimodal.mediaTable(docs), batchSize = 16)
    val rows = dec.collect()
    assert(rows.forall(r => r.width >= 64 && r.width < 256 && r.height >= 64 && r.height < 256))
    assert(rows.forall(_.feature.length == 8))
    // determinism: same ref → same decode
    val twice = Multimodal.decodeAndFeaturize(Multimodal.mediaTable(docs)).collect()
    assert(rows.sortBy(_.media_ref).zip(twice.sortBy(_.media_ref))
      .forall { case (a, b) => a.width == b.width && a.feature.sameElements(b.feature) })
  }

  test("q34 expected-rows fixture is current (driver oracle drift guard)") {
    // the committed parquet at src/test/resources/expected IS the driver's
    // q34 oracle — if the decode stub or media-table plumbing changes, this
    // test forces the fixture (and the change) to be re-justified together
    val expected = spark.read.parquet("src/test/resources/expected/q34_media_decode.parquet")
    val actual = SparkEntry.queries("q34_media_decode")(spark, "/root/testdata/sf0.01")
    assert(actual.exceptAll(expected).count() == 0, "live rows missing from fixture")
    assert(expected.exceptAll(actual).count() == 0, "fixture rows missing from live output")
  }

  test("resize: PIL.thumbnail dimension semantics (single scale factor, only when over the box)") {
    val dims = Seq(
      (2048, 1024), // over on W → scale 0.5 → (1024, 512)
      (512, 4096),  // over on H → scale 0.25 → (128, 1024)
      (800, 600),   // inside the box → untouched
      (3000, 3000)) // both over → (1024, 1024)
      .toDF("width", "height")
    val out = Multimodal.withResizedDims(dims)
      .select("out_width", "out_height").as[(Int, Int)].collect().toSeq
    assert(out == Seq((1024, 512), (128, 1024), (800, 600), (1024, 1024)), out)
  }

  test("frame sampling explodes every Nth frame index") {
    val dec = Multimodal.decodeAndFeaturize(Multimodal.mediaTable(docs)).cache()
    val frames = Multimodal.sampleFrames(dec, everyN = 5)
    // images (1 frame) → 1 row; videos (n frames) → ceil(n/5) rows
    val expected = dec.collect().map(d => (d.n_frames - 1) / 5 + 1).sum
    assert(frames.count() == expected)
    // image rows only ever sample frame 0; videos reach beyond it
    val videoRefs = dec.filter(_.kind == "video").collect().map(_.media_ref).toSet
    val imgFrames = frames.where(!$"media_ref".isin(videoRefs.toSeq: _*))
      .select("frame_idx").distinct().as[Int].collect().toSet
    assert(imgFrames == Set(0))
    if (videoRefs.nonEmpty) {
      val vidMax = frames.where($"media_ref".isin(videoRefs.toSeq: _*))
        .agg(max("frame_idx")).as[Int].head()
      assert(vidMax >= 0)
    }
  }
}
