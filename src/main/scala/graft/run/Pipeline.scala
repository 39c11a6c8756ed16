package graft.run

import graft.canon.ConnectedComponents
import graft.graph.TripleStore
import graft.link.EntityLinker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG-construction pipeline:
  *
  *   docs ──(narrow)──► mention-detect + per-doc triples   [Extract]
  *        └─(narrow)──► vendor mentions ──► LSH blocking ──► candidate edges
  *                                                [EntityLinker]
  *                      edges ──► connected components ──► canonical map
  *                                                [ConnectedComponents]
  *   triples ⋈ canonical map ──► canonical graph + sameAs edges
  *
  * Shuffle inventory (the whole point at 100 TB):
  *   0 shuffles to raw triples (all per-doc array HOFs);
  *   1 groupBy(entity_key) over the SMALL mention projection;
  *   LSH block join + CC iterations over the MUCH smaller entity set;
  *   1 broadcast-able join to rewrite vendor/client objects;
  *   1 final repartition at write.
  */
object Pipeline {

  final case class Config(
      numHashes: Int = 8,
      jaccardMin: Double = 0.6,
      editSimMin: Double = 0.85,
      useIce: Boolean = true,
      /** typed mapPartitions extraction (FastExtract) vs declarative Column
        * HOFs (Extract) — semantically identical (ExtractParitySpec),
        * ~10× faster per core; requires the widened OcrDoc schema */
      fast: Boolean = true,
      /** canonical-map rewrite strategy: the map is broadcast when its row
        * count is ≤ this limit, otherwise the rewrite falls back to a
        * shuffled join (identical output — PipelineSpec forces the fallback
        * with limit=0). At 10^8+ entities a broadcast would blow the driver/
        * executor memory budget; the fallback trades 2 triple-stream
        * shuffles for that safety. */
      broadcastEntityLimit: Long = 10000000L,
      /** entity count below which the LSH→verify linking chain runs
        * driver-side (EntityLinker hybrid, LocalElParitySpec-identical);
        * 0 forces the distributed chain — what ScalingBench measures, since
        * the driver shortcut deliberately does NOT scale with executors. */
      elSmallThreshold: Long = 50000L)

  private val log = org.slf4j.LoggerFactory.getLogger("graft.run.Pipeline")

  /** Broadcast the canonical map only while it fits the broadcast budget;
    * log the choice either way (the 0-vs-2-full-corpus-shuffle decision is
    * worth a line in any run log). `mapRows` must be the map's exact row
    * count — callers have it for free because the map is materialized
    * (localCheckpoint) before use. */
  private def maybeBroadcast(m: DataFrame, mapRows: Long, limit: Long): DataFrame =
    if (mapRows <= limit) { log.info(s"canonical map: broadcast ($mapRows rows <= $limit)"); broadcast(m) }
    else { log.warn(s"canonical map: shuffled-join fallback ($mapRows rows > $limit)"); m }

  private def asOcrDocs(docs: DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("doc_id", "page_w", "page_h", "spans").as[graft.model.OcrDoc]
  }

  /** Canonical entity map from a (persisted) vendor-mention table. */
  def canonicalEntityMapFromMentions(vm: DataFrame, cfg: Config = Config()): DataFrame = {
    val edges = EntityLinker.candidateEdges(
      vm, cfg.numHashes, cfg.jaccardMin, cfg.editSimMin, cfg.useIce,
      smallThreshold = cfg.elSmallThreshold)
    val comps = ConnectedComponents.run(edges)
    // salted two-phase count: the mention distribution is Zipf-shaped
    // (mega-vendor holds ~30% of rows) — north_star's salted aggregation.
    // Salt = hash(doc_id, role): deterministic per mention row (retry-safe).
    val counts = graft.ops.Skew.saltedCount(vm, "entity_key",
        saltFrom = xxhash64(col("doc_id"), col("role")), salts = 16)
      .select(col("entity_key").as("id"), col("n"))
    ConnectedComponents.canonicalMap(comps, counts)
  }

  /** Canonical entity map (entity_key → canonical key) from the docs.
    * The doc-scale mention table is persisted (columnar cache — it's
    * rescanned by the entity build AND the salted count) only within this
    * call: the result is materialized (localCheckpoint) and the mention
    * cache released before returning, so nothing doc-scale outlives the
    * call (the r1 leak, ADVICE). */
  def canonicalEntityMap(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val vm = (
      if (cfg.fast) FastExtract.vendorMentions(asOcrDocs(docs)).toDF()
      else Extract.vendorMentions(docs)).persist()
    try graft.Materialize(canonicalEntityMapFromMentions(vm, cfg))
    finally vm.unpersist()
  }

  /** Rewrite surface vendor nodes to canonical ones and add sameAs edges.
    * The canonical map is tiny relative to the triples (entities, not docs)
    * but its size estimate is opaque to Catalyst (it comes through a window
    * over joins), so without the explicit hint the rewrite degrades to a
    * sort-merge join that shuffles ALL triples twice — broadcast() is the
    * difference between 0 and 2 full-corpus shuffles here. */
  def canonicalize(rawTriples: DataFrame, canonMap: DataFrame,
      broadcastEntityLimit: Long = 10000000L): DataFrame = {
    val mapped = canonMap.select(
      concat(lit("vendor:"), col("id")).as("surf_node"),
      concat(lit("vendor:"), col("canonical")).as("canon_node"))
    val m = maybeBroadcast(mapped, canonMap.count(), broadcastEntityLimit)

    // objects of hasVendor/hasClient and subjects of hasICE are vendor nodes
    val objRewritten = rawTriples
      .join(m, rawTriples("obj") === m("surf_node"), "left")
      .withColumn("obj",
        when(col("pred").isin("hasVendor", "hasClient"), coalesce(col("canon_node"), col("obj")))
          .otherwise(col("obj")))
      .drop("surf_node", "canon_node")
    val rewritten = objRewritten
      .join(m, objRewritten("subj") === m("surf_node"), "left")
      .withColumn("subj",
        when(col("pred") === "hasICE", coalesce(col("canon_node"), col("subj")))
          .otherwise(col("subj")))
      .drop("surf_node", "canon_node")

    val sameAs = m
      .where(col("surf_node") =!= col("canon_node"))
      .select(col("surf_node").as("subj"), lit("sameAs").as("pred"),
        col("canon_node").as("obj"))
      .withColumn("doc_id", lit(null).cast("string"))

    rewritten.unionByName(sameAs.select(rewritten.columns.toIndexedSeq.map(col): _*))
  }

  private def rawTriples(docs: DataFrame, cfg: Config): DataFrame =
    if (cfg.fast) FastExtract.triples(asOcrDocs(docs)).toDF()
    else Extract.triples(docs)

  /** Full run: docs → canonical triple graph (deduplicated).
    *
    * Plan shape (the 100 TB view):
    *  - docs are scanned exactly TWICE, both narrow: once for the raw
    *    triple stream, once for the tiny vendor-mention projection;
    *  - the raw triple stream flows through ONE broadcast join (canonical
    *    map) and is never shuffled, persisted, or scanned twice — doc-scoped
    *    subjects embed the doc_id and are duplicate-free by construction;
    *  - vendor-scoped triples (hasICE, sameAs) are REGENERATED from the
    *    entity table (entities × canonical map — thousands of rows), not
    *    deduplicated out of the full graph: dedup work is proportional to
    *    the number of entities, not the number of documents.
    */
  def run(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    // Cache discipline (r1 leak post-mortem, ADVICE): the DOC-SCALE mention
    // table is persist()ed — the columnar cache matters, it's rescanned by
    // the entity build and the salted count — but only for the duration of
    // this call: everything derived from it is ENTITY-scale and
    // materialized via self-cleaning localCheckpoint before `finally`
    // releases the cache. Nothing doc-scale outlives run().
    val vm = (
      if (cfg.fast) FastExtract.vendorMentions(asOcrDocs(docs)).toDF()
      else Extract.vendorMentions(docs)).persist()
    val (ents, canonMap, mapRows) = try {
      val ents = EntityLinker.entities(vm) // entity-scale, materialized inside
      val edges = EntityLinker.candidateEdgesFromEntities(
        ents, cfg.numHashes, cfg.jaccardMin, cfg.editSimMin, cfg.useIce,
        smallThreshold = cfg.elSmallThreshold)
      val comps = ConnectedComponents.run(edges)
      // salted two-phase count: the mention distribution is Zipf-shaped
      // (mega-vendor holds ~30% of rows) — north_star's salted aggregation.
      // Salt = hash(doc_id, role): deterministic per mention row (retry-safe).
      val counts = graft.ops.Skew.saltedCount(vm, "entity_key",
          saltFrom = xxhash64(col("doc_id"), col("role")), salts = 16)
        .select(col("entity_key").as("id"), col("n"))
      // LAZY materialize + count in ONE job (the count is the action that
      // computes and stores the map — no separate eager-checkpoint job);
      // the count must run inside the try, while the mention cache that the
      // map's lineage (and ents') reads is still live.
      val cm = graft.Materialize(
        ConnectedComponents.canonicalMap(comps, counts), eager = false)
      (ents, cm, cm.count())
    } finally vm.unpersist()

    val m = maybeBroadcast(
      canonMap.select(
        concat(lit("vendor:"), col("id")).as("surf_node"),
        concat(lit("vendor:"), col("canonical")).as("canon_node")),
      mapRows, cfg.broadcastEntityLimit)

    // doc-scoped stream: single pass, one broadcast join, no dedup needed
    val raw = rawTriples(docs, cfg)
    val docTriples = raw.where(col("pred") =!= "hasICE")
      .join(m, col("obj") === m("surf_node"), "left")
      .withColumn("obj",
        when(col("pred").isin("hasVendor", "hasClient"), coalesce(col("canon_node"), col("obj")))
          .otherwise(col("obj")))
      .select("subj", "pred", "obj")

    // vendor-scoped triples from the ENTITY table (not the doc stream):
    // hasICE per canonical vendor + sameAs per linked surface form
    val iceTriples = ents.where(col("ice").isNotNull)
      .join(canonMap, ents("entity_key") === canonMap("id"))
      .select(concat(lit("vendor:"), col("canonical")).as("subj"),
        lit("hasICE").as("pred"), col("ice").as("obj"))
      .distinct()
    val sameAs = canonMap.where(col("id") =!= col("canonical"))
      .select(concat(lit("vendor:"), col("id")).as("subj"),
        lit("sameAs").as("pred"),
        concat(lit("vendor:"), col("canonical")).as("obj"))

    docTriples.unionByName(iceTriples).unionByName(sameAs)
  }

  /** Resumable run: documents are split into `nBatches` deterministic
    * batches (hash of doc_id); each batch commits atomically to the triple
    * store with lineage counters; already-committed batches are skipped, so
    * a killed run resumes at the last committed snapshot.
    *
    * The canonical entity map is computed once over the full corpus and
    * checkpointed (batch id 1_000_000) before batch processing — entity
    * resolution must be global, per north_star.
    *
    * @param failAfterBatches test hook: throw after committing k batches.
    */
  def runResumable(spark: SparkSession, docs: DataFrame, storeRoot: String,
      nBatches: Int = 4, cfg: Config = Config(),
      failAfterBatches: Int = Int.MaxValue): Unit = {
    val CanonBatch = 1000000
    val committed = TripleStore.committedBatches(storeRoot)

    // stage 1: global canonical entity map (its own snapshot)
    if (!committed.contains(CanonBatch)) {
      val canonTriples = canonicalEntityMap(docs, cfg)
        .select(
          concat(lit("vendor:"), col("id")).as("subj"),
          lit("canonicalOf").as("pred"),
          concat(lit("vendor:"), col("canonical")).as("obj"))
      TripleStore.commitBatch(canonTriples, storeRoot, CanonBatch)
    }
    val canonMap = TripleStore.read(spark, storeRoot)
      .where(col("pred") === "canonicalOf")
      .select(
        regexp_replace(col("subj"), "^vendor:", "").as("id"),
        regexp_replace(col("obj"), "^vendor:", "").as("canonical"))

    var done = 0
    (0 until nBatches).foreach { b =>
      if (!TripleStore.committedBatches(storeRoot).contains(b)) {
        if (done >= failAfterBatches) throw new RuntimeException(s"injected failure before batch $b")
        val batchDocs = docs.where(pmod(xxhash64(col("doc_id")), lit(nBatches)) === b)
        val raw = rawTriples(batchDocs, cfg)
        val triples = canonicalize(raw, canonMap, cfg.broadcastEntityLimit)
          .select("subj", "pred", "obj").distinct()
        val nDocs = batchDocs.count()
        TripleStore.commitBatch(triples, storeRoot, b, Map("docs" -> nDocs))
        done += 1
      }
    }
  }

  /** Read back the materialized graph (sameAs rows appear once per batch →
    * distinct). */
  def readGraph(spark: SparkSession, storeRoot: String): DataFrame =
    TripleStore.read(spark, storeRoot)
      .where(col("pred") =!= "canonicalOf")
      .distinct()
}
