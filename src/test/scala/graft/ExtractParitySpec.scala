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

  test("adversarial parity: invalid calendar dates, tab/newline padding, decimal quantities") {
    // Inputs the fixture corpus never produces — the r1 divergences
    // (ADVICE): SMART-vs-STRICT date resolution ('31/02/2024'), Java-trim
    // vs Spark-trim ('\tX\t' in the P2 length filter), toIntOption vs
    // cast(int) (' 2 ', '2.5' quantities).
    import graft.model._
    def sp(text: String, offset: Int, y: Int, x: Int = 10, conf: Double = 0.9) =
      OcrSpan("text", text, null, offset, conf, BBox(x, y, 60, 10))
    val docs = Seq(
      // doc with pathological dates (zone irrelevant — date scan is global)
      OcrDoc("adv1", 800, 1000, Seq(
        sp("31/02/2024", 0, 10), // invalid: STRICT → null, SMART → 2024-02-29
        sp("29/02/2023", 1, 30), // invalid: non-leap year
        sp("29/02/2024", 2, 50), // valid leap day
        sp("00/01/2024", 3, 70), // invalid: day 0
        sp("FACT-12-345", 4, 90))),
      // doc with whitespace-padded mentions around the P2 length-2 boundary
      OcrDoc("adv2", 800, 1000, Seq(
        sp("\tA\t", 0, 10), // Java trim → "A" (len 1, dropped); Spark trim keeps tabs (len 3)
        sp(" B ", 1, 30), // both trims → len 1 → dropped
        sp("C\nD", 2, 50),
        sp("Vendor Co", 3, 250), // company_info zone
        sp("Client: X\t", 4, 450))),
      // doc with decimal / padded / signed quantity cells in the items zone
      OcrDoc("adv3", 800, 1000, Seq(
        sp("Widget", 0, 700, x = 10), // leader (y 700/1000 = items zone... rel .7)
        sp(" 2 ", 1, 700, x = 100), // cast(int) = 2; toIntOption = None
        sp("u", 2, 700, x = 200),
        sp("10,5", 3, 700, x = 300),
        sp("21,0", 4, 700, x = 400),
        sp("Gadget", 5, 720, x = 10),
        sp("2.5", 6, 720, x = 100), // decimal qty: both null
        sp("+3", 7, 740, x = 100))))
    val df = spark.createDataset(docs).toDF()
    val slow = Extract.triples(df).select("subj", "pred", "obj")
    val fast = FastExtract.triples(df.as[OcrDoc]).toDF()
    assert(slow.exceptAll(fast).count() == 0,
      s"slow-only: ${slow.exceptAll(fast).collect().mkString("; ")}")
    assert(fast.exceptAll(slow).count() == 0,
      s"fast-only: ${fast.exceptAll(slow).collect().mkString("; ")}")
    // and the STRICT contract itself: hasDate/hasDueDate come from date
    // slots 0/1, which hold the two INVALID dates — STRICT yields null for
    // both and the triples are dropped; a SMART resolver would fabricate
    // hasDate = 2024-02-29 out of "31/02/2024" (the r1 divergence)
    val dates = fast.where($"pred".isin("hasDate", "hasDueDate")).select("obj")
      .as[String].collect().toSet
    assert(dates.isEmpty, s"fabricated dates: $dates")
  }

  test("parity on NULL span text (legal interleaved input: media spans carry text=null)") {
    import graft.model._
    def sp(text: String, offset: Int, y: Int, x: Int = 10, kind: String = "text") =
      OcrSpan(kind, text, if (kind == "media") s"blob://$offset" else null,
        offset, 0.9, BBox(x, y, 60, 10))
    val docs = Seq(
      OcrDoc("nul1", 800, 1000, Seq(
        sp(null, 0, 10, kind = "media"), // media span, null text
        sp("FACT-77-123", 1, 30),
        sp("Vendor Co", 2, 250),
        sp(null, 3, 700), // null-text TEXT span in the items zone
        sp("Widget", 4, 720, x = 10),
        sp("2", 5, 720, x = 100))),
      OcrDoc("nul2", 800, 1000, Seq(sp(null, 0, 10)))) // only a null span
    val df = spark.createDataset(docs).toDF()
    // the declarative path null-propagates; the typed fast path must not
    // NPE and must emit the identical triple set
    val slow = Extract.triples(df).select("subj", "pred", "obj")
    val fast = FastExtract.triples(df.as[OcrDoc]).toDF()
    assert(slow.exceptAll(fast).count() == 0 && fast.exceptAll(slow).count() == 0,
      s"null-text divergence: slow-only ${slow.exceptAll(fast).collect().mkString(";")} " +
        s"fast-only ${fast.exceptAll(slow).collect().mkString(";")}")
    // mentionsOnly must not NPE either
    assert(FastExtract.mentionsOnly(docs.head).nonEmpty)
    assert(FastExtract.mentionsOnly(docs(1)).isEmpty)
  }
  test("q32 oracle contract: live raw extraction == generator-side ground truth (fixture current)") {
    // expectedRawTriples is derived from the records alone (surface keys,
    // no dedup) — independent of the extractor; the committed parquet at
    // src/test/resources/expected IS the driver's q32 oracle, so this test
    // gates both the extraction contract and the fixture's freshness.
    val docs = InvoiceCorpus.docs(spark, 200).toDF()
    val live = FastExtract.triples(
      docs.selectExpr("doc_id", "page_w", "page_h", "spans").as[graft.model.OcrDoc])
      .toDF().select("subj", "pred", "obj")
    val gen = InvoiceCorpus.expectedRawTriples(spark, 200).toDF().select("subj", "pred", "obj")
    assert(live.exceptAll(gen).count() == 0, "extractor emitted triples the generator does not predict")
    assert(gen.exceptAll(live).count() == 0, "extractor missed generator-predicted triples")
    val fixture = spark.read.parquet("src/test/resources/expected/q32_expected_raw.parquet")
      .select("subj", "pred", "obj")
    assert(gen.exceptAll(fixture).count() == 0 && fixture.exceptAll(gen).count() == 0,
      "committed q32 fixture is stale — rerun graft.tools.GenFixtures")
  }

}
