package graft.streaming

import graft.run.{FastExtract, Pipeline}
import graft.graph.TripleStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *    for idempotence, foreachBatch → the production FastExtract batch code +
  *    TripleStore snapshot commit. Exactly-once per micro-batch via the
  *    snapshot manifest (batchId is the commit key).
  *  - event-time analytics: watermarked tumbling-window aggregation, the
  *    canonical late-data-tolerant shape for the corpus telemetry stream.
  */
object Streams {

  /** State record for sessionizeStream (top-level so Spark can derive its
    * Encoder). */
  final case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)

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
          // production extraction path (typed; parity with the declarative
          // form is ExtractParitySpec's contract) — also avoids re-running
          // Catalyst over the deep HOF tree for every micro-batch
          val spark = batch.sparkSession
          import spark.implicits._
          val triples = FastExtract.triples(
              batch.selectExpr("doc_id", "page_w", "page_h", "spans")
                .as[graft.model.OcrDoc]).toDF()
            .select("subj", "pred", "obj")
          // toIntExact: fail loudly if the stream ever outlives Int batch
          // ids instead of silently wrapping into an already-committed id
          TripleStore.commitBatch(triples, storeRoot, Math.toIntExact(batchId),
            Map("stream_batch" -> batchId))
        }
        ()
      }
      .start()
  }

  /** Streaming KG construction with GLOBAL canonicalization: each
    * micro-batch of documents lands as a fully canonical graph update —
    * the first batch bootstraps the store (canonical map + entity
    * registry via runResumable), every later batch extends it through
    * `Pipeline.runIncremental`, so after every micro-batch the store
    * equals a full batch rebuild over all documents seen so far
    * (IncrementalSpec's equality, applied streaming).
    *
    * Exactly-once: each applied batch stamps `stream_batch = <id>` into
    * its snapshot counters; a foreachBatch replay (crash after commit,
    * before the streaming checkpoint ack) finds the stamp and skips —
    * on top of runIncremental's own single-manifest atomicity (a crash
    * MID-update leaves the store byte-identical, so the replay applies
    * cleanly).
    *
    * Cost: each increment re-points the full store (see runIncremental's
    * cost model) — size micro-batches accordingly (Trigger.AvailableNow
    * or a generous processing-time trigger, not seconds-level cadence).
    */
  def ingestDocsCanonical(spark: SparkSession, docsDir: String,
      storeRoot: String, checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1) // one landed file = one increment
      .parquet(docsDir)
      .dropDuplicates("doc_id")
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          import org.apache.spark.sql.functions.col
          val docs = batch.select("doc_id", "page_w", "page_h", "spans")
          val alreadyApplied = TripleStore.counters(spark, storeRoot)
            .where(col("key") === "stream_batch" && col("value") === batchId)
            .limit(1).count() > 0
          if (!alreadyApplied) {
            val marker = Map("stream_batch" -> batchId)
            // bootstrap = ONE atomic snapshot (canon map + registry + doc
            // triples + marker): a crash anywhere before its manifest move
            // leaves the store EMPTY, so the foreachBatch replay re-enters
            // this branch instead of runIncremental-ing over the same docs
            // (the r3 double-count crash window, ADVICE #1)
            if (TripleStore.committedBatches(storeRoot).isEmpty)
              Pipeline.runBootstrap(spark, docs, storeRoot,
                extraCounters = marker)
            else
              Pipeline.runIncremental(spark, docs, storeRoot,
                extraCounters = marker)
          }
        }
        ()
      }
      .start()
  }

  /** Custom-state sessionization over a keyed event stream —
    * `flatMapGroupsWithState` with event-time timeout: a session closes
    * when no event arrives for `gapSeconds` (by watermark), emitting one
    * row per closed session. The arbitrary-stateful-processing shape of
    * SURVEY.md §2.9 / the builder mandate (mapGroupsWithState family).
    *
    * Input columns: (user_id: Long, ts: Timestamp, value: Double) with a
    * watermark already applied by the caller.
    */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._

    // the watermarked event-time column must survive to the stateful
    // operator unchanged (EventTimeTimeout requirement) — keep `ts` as-is
    val typed = events
      .selectExpr("user_id", "ts", "value")
      .as[(Long, java.sql.Timestamp, Double)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, (Long, java.sql.Timestamp, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the gap → close and emit the session
            val s = state.get
            state.remove()
            Iterator((userId, new java.sql.Timestamp(s.start * 1000), s.n, s.total))
          } else {
            val sorted = rows.map { case (u, t, v) => (u, t.getTime / 1000, v) }
              .toSeq.sortBy(_._2)
            var closed = List.empty[(Long, java.sql.Timestamp, Long, Double)]
            var cur = state.getOption
            sorted.foreach { case (_, ts, v) =>
              cur match {
                case Some(s) if ts - s.lastTs <= gapSeconds =>
                  // a LATE in-gap event (ts < lastTs, delivered inside the
                  // watermark) must extend the session's bounds, never
                  // rewind them — min/max, not assignment (a rewound lastTs
                  // both mis-splits later events and can push the timeout
                  // at or below the watermark, which Spark rejects)
                  cur = Some(s.copy(start = math.min(s.start, ts),
                    lastTs = math.max(s.lastTs, ts), n = s.n + 1, total = s.total + v))
                case Some(s) =>
                  closed ::= ((userId, new java.sql.Timestamp(s.start * 1000), s.n, s.total))
                  cur = Some(SessionState(ts, ts, 1, v))
                case None =>
                  cur = Some(SessionState(ts, ts, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(math.max((s.lastTs + gapSeconds) * 1000,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
      .toDF("user_id", "session_start", "n_events", "total_value")
  }

  /** Streaming exact dedup for a document stream: keep the FIRST arrival
    * per content key, tolerating out-of-order duplicates within the
    * watermark (`dropDuplicatesWithinWatermark` — state for a key is
    * dropped once the watermark passes it, so state size is bounded by the
    * lateness window instead of growing with the corpus, which is what
    * makes streaming dedup viable at 10^12 docs; the batch dedup family in
    * ops/Dedup is the full-corpus complement). Key defaults to the exact
    * text hash — swap in a simhash/minhash band for streaming NEAR-dedup. */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
      keyExpr: Column = xxhash64(col("text")), lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__key", keyExpr)
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__key")
      .drop("__key")

  /** Per-(chunk-value) LSH bucket state for neardupStream: the simhash
    * signatures of in-watermark arrivals that landed in this bucket, with
    * their event times (for watermark-based pruning). Top-level so Spark
    * derives its Encoder. */
  final case class HammingBucketState(reps: List[(Long, Long)])

  /** Streaming NEAR-dedup with EXACT verification: suppress documents whose
    * simhash is within `maxHamming` bits of an earlier in-watermark
    * arrival. Same pigeonhole construction as the batch
    * `Dedup.simhashNearDup`: the 64-bit signature splits into
    * (maxHamming+1) chunks and any hamming≤k pair agrees EXACTLY on ≥1
    * chunk — expressed as a chain of per-chunk `flatMapGroupsWithState`
    * stages (all append mode), each keyed on that chunk's value and holding
    * the bucket's representative SIGNATURES in state: a chunk match alone
    * suppresses nothing — only an exact `bitCount(xor) ≤ maxHamming`
    * against a stored representative does. This closes the r3 divergence
    * where far-apart docs colliding on one 16-bit chunk were falsely
    * suppressed (the dropDuplicatesWithinWatermark chain could not
    * re-compare against the representative it had dropped).
    *
    * Every arrival registers in ALL its chunk buckets (rows flow through
    * every stage carrying a `__hit` flag; the filter happens once at the
    * end), so the pigeonhole cover is complete and the semantics are
    * simple: a doc is suppressed iff it is within `maxHamming` bits of ANY
    * earlier arrival still inside the lateness window — suppressed or not.
    * State per bucket is pruned to the watermark and the whole bucket
    * times out (EventTimeTimeout) once the watermark passes its newest
    * representative + lateness, so state stays bounded by the window, not
    * the corpus — what makes this viable at 10^12 docs.
    *
    * The returned stream is bound to an isolated CLONE of the input's
    * session (`result.sparkSession`) where the stateful-operator static
    * correctness check is disabled — see the comment below; the caller's
    * session is never mutated. Memory-sink views and the `streams`
    * registry for queries started on the result live on that clone. */
  def neardupStream(docs: DataFrame, tsCol: String = "ts", maxHamming: Int = 3,
      lateness: String = "10 minutes", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    val latenessMs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(lateness))
      require(iv.months == 0, s"neardupStream: month-based lateness unsupported: $lateness")
      iv.days * 86400000L + iv.microseconds / 1000L
    }
    // Spark's global-watermark correctness check hard-blocks ANY stateful
    // operator downstream of flatMapGroupsWithState, because an arbitrary
    // user function COULD emit rows older than the watermark. This one
    // provably cannot: each stage emits exactly the current micro-batch's
    // rows with their original event times (state only changes the __hit
    // flag). The check is read at query START from the session conf — so
    // the whole chain is built on an isolated CLONE of the caller's
    // session (full conf copy) with the check off THERE, never on the
    // caller's session: unrelated streaming queries started afterwards
    // keep Spark's guard (Spark's own documented escape hatch, scoped).
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val (scoped, docsScoped) =
      org.apache.spark.sql.graft.SessionBridge.onClonedSession(docs)
    scoped.conf.set(checkKey, "false")
    val withSig = docsScoped
      .withColumn("__sig", graft.ops.Dedup.simhash(col(textCol)))
      .withColumn("__hit", lit(false))
      .withWatermark(tsCol, lateness)
    val schema = withSig.schema
    val sigIdx = schema.fieldIndex("__sig")
    val hitIdx = schema.fieldIndex("__hit")
    val tsIdx = schema.fieldIndex(tsCol)
    val rowEnc = Encoders.row(schema)
    val keyEnc = Encoders.scalaLong
    val stateEnc = Encoders.product[HammingBucketState]

    val staged = (0 until nChunks).foldLeft(withSig) { (d, c) =>
      d.groupByKey(r =>
          (r.getLong(sigIdx) >>> (c * chunkBits)) & ((1L << chunkBits) - 1))(keyEnc)
        .flatMapGroupsWithState[HammingBucketState, Row](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (_: Long, rows: Iterator[Row], state: GroupState[HammingBucketState]) =>
            if (state.hasTimedOut) { state.remove(); Iterator.empty }
            else {
              val wm = state.getCurrentWatermarkMs()
              // distinct signatures with their NEWEST event time: a flood of
              // identical docs (boilerplate crawls) keeps ONE entry instead
              // of one per arrival, so state is bounded by distinct sigs in
              // the window and the exact-verify scan stays O(distinct), not
              // O(arrivals). Semantics unchanged: "within maxHamming of ANY
              // earlier in-window arrival" — the newest occurrence of a sig
              // is itself such an arrival for every later row.
              val reps = scala.collection.mutable.LongMap.empty[Long]
              state.getOption.map(_.reps).getOrElse(Nil).foreach { case (s, t) =>
                if (t >= wm && t > reps.getOrElse(s, Long.MinValue)) reps(s) = t
              }
              // deterministic earlier/later order within the micro-batch:
              // equal event times tie-break on signature then full row
              // content, so which of two same-instant near-dups survives
              // does not depend on shuffle arrival order (replay-stable)
              val sorted = rows.toVector.sortBy(r =>
                (r.getTimestamp(tsIdx).getTime, r.getLong(sigIdx), r.mkString(" ")))
              val out = sorted.map { r =>
                val sig = r.getLong(sigIdx)
                val ts = r.getTimestamp(tsIdx).getTime
                val hit = r.getBoolean(hitIdx) || reps.keysIterator.exists(s =>
                  java.lang.Long.bitCount(s ^ sig) <= maxHamming) // EXACT verify
                if (ts > reps.getOrElse(sig, Long.MinValue)) reps(sig) = ts
                val vals = r.toSeq.toArray
                vals(hitIdx) = hit
                new GenericRowWithSchema(vals, schema): Row
              }
              state.update(HammingBucketState(reps.toList))
              state.setTimeoutTimestamp(
                math.max(reps.valuesIterator.max + latenessMs, wm + 1))
              out.iterator
            }
        }(stateEnc, rowEnc)
        // the stateful operator's output attributes lose the event-time
        // watermark metadata — re-mark the ts column so the NEXT stage's
        // EventTimeTimeout passes analysis (same events, same delay → the
        // multi-watermark min policy keeps one consistent query watermark)
        .withWatermark(tsCol, lateness)
    }
    staged.where(!col("__hit")).drop("__sig", "__hit")
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
