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

  test("frame sampling explodes every Nth frame index") {
    val dec = Multimodal.decodeAndFeaturize(Multimodal.mediaTable(docs))
    val frames = Multimodal.sampleFrames(dec, everyN = 1)
    // images have n_frames == 1 → exactly one frame row each
    assert(frames.count() == 50)
    assert(frames.select("frame_idx").distinct().as[Int].collect().toSet == Set(0))
  }
}
