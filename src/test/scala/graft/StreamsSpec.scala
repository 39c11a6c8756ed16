package graft

import graft.fixtures.InvoiceCorpus
import graft.graph.TripleStore
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamsSpec extends SparkSuite {
  import spark.implicits._

  test("AvailableNow ingest: docs dir → committed triple snapshots, incremental on rerun") {
    val docsDir = Files.createTempDirectory("graft_docs_").toString
    val store = Files.createTempDirectory("graft_sstore_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString

    InvoiceCorpus.docs(spark, 20).toDF().write.mode("append").parquet(docsDir)
    val q1 = Streams.ingestDocs(spark, docsDir, store, ckpt)
    q1.awaitTermination()
    val n1 = TripleStore.read(spark, store).count()
    assert(n1 > 0)

    // rerun with NO new files: stream bookkeeping processes nothing new
    val q2 = Streams.ingestDocs(spark, docsDir, store, ckpt)
    q2.awaitTermination()
    assert(TripleStore.read(spark, store).count() == n1)

    // land new docs (NEW doc_ids — same ids would rightly be dropped by
    // dropDuplicates' cross-batch state) → only they are processed
    InvoiceCorpus.docs(spark, 30).toDF()
      .where($"doc_id" >= "inv-000020")
      .write.mode("append").parquet(docsDir)
    val q3 = Streams.ingestDocs(spark, docsDir, store, ckpt)
    q3.awaitTermination()
    val n3 = TripleStore.read(spark, store).count()
    assert(n3 > n1)
  }

  test("streaming canonical ingest: per-batch incremental canonicalization == batch rebuild") {
    val docsDir = Files.createTempDirectory("graft_cdocs_").toString
    val store = Files.createTempDirectory("graft_cstore_").toString
    val ckpt = Files.createTempDirectory("graft_cckpt_").toString

    // two landed files → with maxFilesPerTrigger=1, bootstrap + increment(s)
    InvoiceCorpus.docs(spark, 40).toDF()
      .coalesce(1).write.mode("append").parquet(docsDir)
    InvoiceCorpus.docsRange(spark, 40, 80).toDF()
      .coalesce(1).write.mode("append").parquet(docsDir)

    val q = Streams.ingestDocsCanonical(spark, docsDir, store, ckpt)
    q.awaitTermination()

    // after the stream drains, the store IS the canonical graph a full
    // batch rebuild over all 80 docs would produce
    val streamed = graft.run.Pipeline.readGraph(spark, store)
      .as[(String, String, String)].collect().toSet
    val batchRoot = Files.createTempDirectory("graft_cfull_").toString
    graft.run.Pipeline.runResumable(spark,
      InvoiceCorpus.docs(spark, 80).toDF(), batchRoot, nBatches = 1)
    val full = graft.run.Pipeline.readGraph(spark, batchRoot)
      .as[(String, String, String)].collect().toSet
    assert(streamed == full,
      s"streamed-only: ${(streamed diff full).take(3)}; full-only: ${(full diff streamed).take(3)}")

    // replay with no new files: exactly-once bookkeeping applies nothing
    val visible = TripleStore.visibleBatchIds(store)
    val q2 = Streams.ingestDocsCanonical(spark, docsDir, store, ckpt)
    q2.awaitTermination()
    assert(TripleStore.visibleBatchIds(store) == visible)
  }

  test("flatMapGroupsWithState sessionization: gap closes sessions by watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
    val out = Streams.sessionizeStream(events, gapSeconds = 1800)
    val query = out.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: two events 10 min apart (one session), then a 2h gap (new one)
    mem.addData((1L, t("2024-01-01 10:00:00"), 1.0), (1L, t("2024-01-01 10:10:00"), 2.0))
    query.processAllAvailable()
    mem.addData((1L, t("2024-01-01 12:30:00"), 5.0))
    query.processAllAvailable()
    // push the watermark far past everything → last session times out
    mem.addData((2L, t("2024-01-01 20:00:00"), 0.0))
    query.processAllAvailable()
    mem.addData((2L, t("2024-01-02 09:00:00"), 0.0))
    query.processAllAvailable()
    val rows = spark.table("sess_test")
      .select($"user_id", $"session_start".cast("string"), $"n_events", $"total_value")
      .as[(Long, String, Long, Double)].collect().toSet
    query.stop()
    assert(rows.contains((1L, "2024-01-01 10:00:00", 2L, 3.0)), rows)
    assert(rows.contains((1L, "2024-01-01 12:30:00", 1L, 5.0)), rows)
  }

  test("sessionization: a LATE in-gap event extends the session, never rewinds it") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "30 minutes") // late arrivals inside 30 min are legal
    val out = Streams.sessionizeStream(events, gapSeconds = 1800)
    val query = out.writeStream.format("memory").queryName("sess_late_test")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData((1L, t("2024-01-01 10:00:00"), 1.0), (1L, t("2024-01-01 10:20:00"), 2.0))
    query.processAllAvailable()
    // LATE but in-watermark, in-gap: 10:05 arrives after 10:20 was processed.
    // A rewound lastTs (10:05) would make the next event at 10:45 (40 min
    // after the rewound end, 25 min after the true end) start a NEW session.
    mem.addData((1L, t("2024-01-01 10:05:00"), 4.0))
    query.processAllAvailable()
    mem.addData((1L, t("2024-01-01 10:45:00"), 8.0))
    query.processAllAvailable()
    // close it: push the watermark far past the gap
    mem.addData((2L, t("2024-01-02 09:00:00"), 0.0))
    query.processAllAvailable()
    val rows = spark.table("sess_late_test")
      .select($"user_id", $"session_start".cast("string"), $"n_events", $"total_value")
      .as[(Long, String, Long, Double)].collect().toSet
    query.stop()
    assert(rows.contains((1L, "2024-01-01 10:00:00", 4L, 15.0)),
      s"late event split or rewound the session: $rows")
  }

  test("streaming dedup keeps the first arrival per text, drops in-watermark duplicates") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val out = Streams.dedupStream(docs)
    val query = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData(
      (t("2024-01-01 10:00:00"), 1L, "alpha"),
      (t("2024-01-01 10:01:00"), 2L, "alpha"), // dup within watermark → dropped
      (t("2024-01-01 10:02:00"), 3L, "beta"))
    query.processAllAvailable()
    mem.addData((t("2024-01-01 10:03:00"), 4L, "beta")) // dup, later batch, in window
    query.processAllAvailable()
    mem.addData((t("2024-01-01 12:00:00"), 5L, "gamma")) // advances watermark
    query.processAllAvailable()
    val ids = spark.table("dedup_test").select("doc_id").as[Long].collect().toSet
    query.stop()
    assert(ids == Set(1L, 3L, 5L), ids)
  }

  test("streaming near-dedup suppresses a MUTATED near-dup within the watermark") {
    implicit val sq = spark.sqlContext
    val base = "invoice total amount due thirty days net payment terms " +
      "vendor atlas tech solutions casablanca morocco reference number " +
      "four two seven nine delivery address boulevard hassan second floor"
    // pick a deterministic mutation whose simhash is a GENUINE near-dup
    // (0 < hamming ≤ 3) — precondition asserted, not assumed
    val candidates = Seq(
      base.replace("thirty", "sixty"), base.replace("atlas", "altas"),
      base.replace("four", "five"), base.replace("floor", "flor"),
      base.replace("net", "gross"))
    val h0 = graft.ops.Dedup.simhashScala(base)
    val mutated = candidates.find { c =>
      val h = java.lang.Long.bitCount(h0 ^ graft.ops.Dedup.simhashScala(c))
      h > 0 && h <= 3
    }
    assert(mutated.nonEmpty, "fixture problem: no candidate mutation within hamming 3")
    val far = "completely unrelated text about spark structured streaming " +
      "state stores watermarks and checkpoint directories growing unbounded"
    assert(java.lang.Long.bitCount(h0 ^ graft.ops.Dedup.simhashScala(far)) > 3)

    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val out = Streams.neardupStream(docs)
    val query = out.writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 10:00:00"), 1L, base))
    query.processAllAvailable()
    mem.addData(
      (t("2024-01-01 10:01:00"), 2L, mutated.get), // near-dup → suppressed
      (t("2024-01-01 10:02:00"), 3L, far))         // distinct → kept
    query.processAllAvailable()
    // the operator runs on an isolated session CLONE (where it disables the
    // stateful-operator correctness check its chained stages can't satisfy
    // statically) — the memory-sink view lives there, and the CALLER's
    // session keeps Spark's guard untouched
    val ids = out.sparkSession.table("neardup_test")
      .select("doc_id").as[Long].collect().toSet
    query.stop()
    assert(ids == Set(1L, 3L), ids)
    assert(spark.conf.get(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled",
      "true") == "true", "neardupStream leaked its conf flip to the caller's session")
  }

  test("streaming near-dedup: chunk-colliding FAR docs BOTH survive (exact verify)") {
    // find two texts whose simhashes agree on >= 1 pigeonhole chunk but are
    // > maxHamming apart — the false-suppression case of the r3
    // dropDuplicatesWithinWatermark chain; the exact-verify stage must keep
    // both. Search a deterministic pool for the collision (16-bit chunks →
    // ~2^-16 per pair per chunk; the pool has ~125k pairs).
    val words = Seq("invoice", "total", "amount", "vendor", "payment", "terms",
      "delivery", "reference", "number", "atlas", "casablanca", "services",
      "consulting", "solutions", "maroc", "facture", "montant", "livraison")
    val rnd = new scala.util.Random(13)
    val pool = (0 until 500).map { i =>
      (0 until 12).map(_ => words(rnd.nextInt(words.length))).mkString(" ") + s" uid$i"
    }
    val sigs = pool.map(t => t -> graft.ops.Dedup.simhashScala(t))
    def chunks(h: Long): Seq[Long] = (0 until 4).map(c => (h >>> (c * 16)) & 0xffffL)
    val collision = (for {
      i <- sigs.indices.iterator
      j <- (i + 1 until sigs.length).iterator
      if java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) > 3
      if chunks(sigs(i)._2).zip(chunks(sigs(j)._2)).exists { case (a, b) => a == b }
    } yield (sigs(i)._1, sigs(j)._1)).buffered.headOption
    assert(collision.nonEmpty, "fixture problem: no chunk collision in the pool")
    val (docA, docB) = collision.get

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val out = Streams.neardupStream(docs)
    val query = out.writeStream.format("memory").queryName("neardup_far_test")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 10:00:00"), 1L, docA))
    query.processAllAvailable()
    mem.addData((t("2024-01-01 10:01:00"), 2L, docB)) // collides on a chunk, far in hamming
    query.processAllAvailable()
    val ids = out.sparkSession.table("neardup_far_test")
      .select("doc_id").as[Long].collect().toSet
    query.stop()
    assert(ids == Set(1L, 2L), s"far doc falsely suppressed: $ids")
  }

  test("canonical bootstrap is ONE atomic snapshot; increments stack to the rebuild graph") {
    import graft.run.Pipeline
    val store = Files.createTempDirectory("graft_bstore_").toString
    val docs = InvoiceCorpus.docs(spark, 30).toDF()
    val id = Pipeline.runBootstrap(spark, docs, store,
      extraCounters = Map("stream_batch" -> 0L))
    // exactly one snapshot: no canon-committed/data-missing crash window
    // for the streaming replay to mistake for an incremental-ready store
    assert(id == 0 && TripleStore.committedBatches(store) == Set(0))
    assert(TripleStore.counterValue(store, 0, "stream_batch").contains(0L))
    val preds = TripleStore.read(spark, store)
      .select("pred").distinct().as[String].collect().toSet
    assert(preds("canonicalOf") && preds("_reg_n") && preds("hasVendor"),
      s"single snapshot must carry map+registry+doc triples, got $preds")
    // graph == the two-snapshot runResumable bootstrap over the same docs
    val rootB = Files.createTempDirectory("graft_bfull_").toString
    Pipeline.runResumable(spark, docs, rootB, nBatches = 2)
    val a = Pipeline.readGraph(spark, store).as[(String, String, String)].collect().toSet
    val b = Pipeline.readGraph(spark, rootB).as[(String, String, String)].collect().toSet
    assert(a == b, s"aOnly=${(a diff b).take(3)} bOnly=${(b diff a).take(3)}")
    // an increment on the bootstrap store reaches the full-rebuild graph
    Pipeline.runIncremental(spark, InvoiceCorpus.docsRange(spark, 30, 50).toDF(), store)
    val inc = Pipeline.readGraph(spark, store).as[(String, String, String)].collect().toSet
    val rootC = Files.createTempDirectory("graft_bfull50_").toString
    Pipeline.runResumable(spark, InvoiceCorpus.docs(spark, 50).toDF(), rootC, nBatches = 1)
    val full = Pipeline.readGraph(spark, rootC).as[(String, String, String)].collect().toSet
    assert(inc == full)
  }

  test("watermarked tumbling-window aggregation over a memory stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val out = Streams.windowedEventStats(events, "1 hour", "10 minutes")
    val query = out.writeStream.format("memory").queryName("win_test")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 10:05:00"), "click", 1.0),
      (t("2024-01-01 10:45:00"), "click", 2.0),
      (t("2024-01-01 11:10:00"), "view", 5.0))
    query.processAllAvailable()
    // advance watermark far enough to close the 10:00 window
    mem.addData((t("2024-01-01 13:00:00"), "view", 1.0))
    query.processAllAvailable()
    val rows = spark.table("win_test")
      .select($"window_start".cast("string"), $"event_type", $"n", $"total_value")
      .as[(String, String, Long, Double)].collect().toSet
    query.stop()
    assert(rows.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 11:00:00", "view", 1L, 5.0)))
  }
}
