package graft

import graft.fixtures.InvoiceCorpus
import graft.run.{Extract, FastExtract}

/** Equivalence contract between the declarative (Column-HOF) and typed
  * (mapPartitions) extraction paths — same triples, same vendor mentions,
  * on corpora with the OCR-noise channel ON and across seeds. */
class ExtractParitySpec extends SparkSuite {
  import spark.implicits._

  private def check(n: Long, seed: Long, noiseP: Double): Unit = {
    val docs = InvoiceCorpus.docs(spark, n, seed, noiseP).toDF().cache()
    try {
      val slow = Extract.triples(docs).select("subj", "pred", "obj")
      val fast = FastExtract.triples(
        docs.selectExpr("doc_id", "page_w", "page_h", "spans").as[graft.model.OcrDoc]).toDF()
      assert(slow.exceptAll(fast).count() == 0, s"slow-only triples (seed=$seed)")
      assert(fast.exceptAll(slow).count() == 0, s"fast-only triples (seed=$seed)")

      val vmSlow = Extract.vendorMentions(docs)
        .na.fill("", Seq("ice"))
        .select("doc_id", "role", "surface", "ice", "entity_key")
      val vmFast = FastExtract.vendorMentions(
        docs.selectExpr("doc_id", "page_w", "page_h", "spans").as[graft.model.OcrDoc]).toDF()
        .select("doc_id", "role", "surface", "ice", "entity_key")
      assert(vmSlow.exceptAll(vmFast).count() == 0, s"slow-only mentions (seed=$seed)")
      assert(vmFast.exceptAll(vmSlow).count() == 0, s"fast-only mentions (seed=$seed)")
    } finally docs.unpersist()
  }

  test("parity on default corpus (seed 42, noise 0.25)") { check(120, 42L, 0.25) }
  test("parity on alternate seed with heavy noise") { check(80, 7L, 0.9) }
  test("parity with noise off") { check(60, 99L, 0.0) }
}
