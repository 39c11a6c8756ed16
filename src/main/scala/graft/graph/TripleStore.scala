package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style partitioned triple store on plain parquet: data files plus a
  * `_snapshots/` JSON manifest log that makes every stage commit atomic and a
  * killed run resumable from the last committed snapshot (north_rule).
  *
  * Layout:
  *   <root>/data/pred=<p>/batch=<k>/...                 (micro-batch appends)
  *   <root>/cdata/pred=<p>/sbucket=<b>/batch=<k>/...    (compacted, bucketed)
  *   <root>/odata/pred=<p>/obucket=<b>/batch=<k>/...    (optional OBJECT
  *     permutation of the same compaction — the RDF-store SPO/POS split:
  *     `compact(objectIndex = true)` pays 2× storage so `?s pred obj`
  *     lookups prune like subject lookups do)
  *   <root>/_snapshots/snap-<k>.json            (manifest: batch id, counters)
  *
  * Append commits use the cheap (pred, batch) layout; `compact` rewrites the
  * visible store into the BUCKETED layout — `sbucket = pmod(xxhash64(subj),
  * filesPerPred)` as a partition directory, subj-sorted within files — which
  * is what makes single-subject lookups prune (`readForSubjects`): the
  * SURVEY §4 `bucket(256, subj)` promise, with the bucket count recorded in
  * the compaction manifest (`files_per_pred`). Exactly Iceberg's split:
  * appends land unsorted, rewrite-data-files applies the table's sort/bucket
  * spec.
  *
  * Write protocol per batch: (0) scrub partitions left by a CRASHED attempt
  * at this batch id (a retry may produce a different predicate set than the
  * crashed write — dynamic partition overwrite alone would leave the
  * orphaned predicates visible once the manifest lands, ADVICE r3);
  * (1) write parquet under batch=<k> partitions; (2) write manifest to a
  * temp file; (3) ATOMIC_MOVE into _snapshots/. A batch without its
  * manifest is invisible to readers (read path keeps only committed
  * batches), so a crash between (1) and (3) just leaves garbage files that
  * the next attempt scrubs — the reference's per-file resume unit
  * generalized to partitions (ocr/ocr_starter_final.py:416-435 →
  * SURVEY.md §2.9).
  *
  * Counters per commit (doc count, per-predicate triple counts) are the
  * per-partition lineage + metrics record; they live in the manifest and are
  * also queryable as a DataFrame via `counters`.
  */
object TripleStore {

  private def snapsDir(root: String): Path = Paths.get(root, "_snapshots")

  def committedBatches(root: String): Set[Int] = {
    val d = snapsDir(root)
    if (!Files.exists(d)) Set.empty
    else scala.util.Using.resource(Files.list(d)) { stream => // close the dir stream (fd leak under polling)
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("snap-") && s.endsWith(".json") =>
          s.stripPrefix("snap-").stripSuffix(".json").toInt
        }.toSet
    }
  }

  // Manifests are written AND read through Jackson (already on Spark's
  // classpath): counter keys are raw predicate strings from the data, so
  // string-built JSON would corrupt the manifest on a pred containing a
  // quote/backslash/newline, and regex reads could be spoofed by a pred
  // named like a structural field ("batch", "files_per_pred").
  private val json = new com.fasterxml.jackson.databind.ObjectMapper()

  private def manifestNodes(root: String): Map[Int, com.fasterxml.jackson.databind.JsonNode] = {
    val d = snapsDir(root)
    if (!Files.exists(d)) Map.empty
    else scala.util.Using.resource(Files.list(d)) { stream =>
      stream.iterator().asScala
        .filter(_.getFileName.toString.startsWith("snap-"))
        .flatMap { p =>
          val node = json.readTree(Files.readString(p))
          val b = node.path("batch")
          if (b.canConvertToInt) Some(b.asInt() -> node) else None
        }.toMap
    }
  }

  /** batch id → batches its manifest superseded (compaction snapshots). */
  private def replacedByOf(
      snaps: Map[Int, com.fasterxml.jackson.databind.JsonNode]): Map[Int, Set[Int]] =
    snaps.flatMap { case (b, node) =>
      val r = node.path("replaces")
      if (r.isArray) Some(b -> r.elements().asScala.map(_.asInt()).toSet) else None
    }

  private def replacedBy(root: String): Map[Int, Set[Int]] =
    replacedByOf(manifestNodes(root))

  /** batch id → bucket count, for batches written in the BUCKETED layout
    * (compactions): the `files_per_pred` their manifest recorded. */
  private def bucketedBatchesOf(
      snaps: Map[Int, com.fasterxml.jackson.databind.JsonNode]): Map[Int, Int] =
    snaps.flatMap { case (b, node) =>
      val f = node.path("files_per_pred")
      if (f.canConvertToInt) Some(b -> f.asInt()) else None
    }

  /** Compaction batches that also wrote the `odata` object permutation. */
  private def objectIndexedOf(
      snaps: Map[Int, com.fasterxml.jackson.databind.JsonNode]): Set[Int] =
    snaps.collect { case (b, node)
      if node.path("object_index").asInt(0) == 1 => b }.toSet

  /** One lineage counter of one committed snapshot, read driver-side from
    * its OWN manifest file (one read, not a directory scan — Pipeline's
    * batch loop calls this per batch). Looks ONLY inside the "counters"
    * object — a counter key equal to a structural field name cannot
    * shadow or be shadowed. */
  def counterValue(root: String, batchId: Int, key: String): Option[Long] = {
    val p = snapsDir(root).resolve(s"snap-$batchId.json")
    if (!Files.exists(p)) None
    else {
      val v = json.readTree(Files.readString(p)).path("counters").path(key)
      if (v.canConvertToLong) Some(v.asLong()) else None
    }
  }

  /** Batches visible to a reader as of snapshot `asOf` (MaxValue = latest):
    * committed ids ≤ asOf, minus those superseded by a compaction snapshot
    * that is itself ≤ asOf — so time travel BEFORE a compaction point still
    * sees the original micro-batches (until `vacuum` physically drops them,
    * the Iceberg expire-snapshots trade-off). */
  private def visibleBatchesOf(
      snaps: Map[Int, com.fasterxml.jackson.databind.JsonNode], asOf: Int): Set[Int] = {
    val committed = snaps.keySet.filter(_ <= asOf)
    val replaced = replacedByOf(snaps)
      .collect { case (b, r) if b <= asOf && committed(b) => r }
      .flatten.toSet
    committed -- replaced
  }

  private def visibleBatches(root: String, asOf: Int): Set[Int] =
    visibleBatchesOf(manifestNodes(root), asOf)

  /** Currently visible batch ids (committed minus compacted-away). */
  def visibleBatchIds(root: String): Set[Int] = visibleBatches(root, Int.MaxValue)

  private def deleteRecursive(p: Path): Unit =
    scala.util.Using.resource(Files.walk(p))(
      _.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete))

  /** Drop data partitions of a batch id that has NO manifest — garbage from
    * a crashed attempt. Without this, a retry whose output lacks a
    * predicate the crashed write produced would leave that predicate's
    * partition visible once the retry's manifest lands (ADVICE r3). */
  private def scrubUncommitted(root: String, batchId: Int): Unit = {
    if (committedBatches(root).contains(batchId)) return
    // list directory LEVELS of the two known layouts (data/pred=*/batch=<id>
    // and cdata/pred=*/sbucket=*/batch=<id>) instead of walking every file
    // of every batch — a per-commit full-tree walk would be O(total files)
    // and make a B-commit run O(B²), the pathology the manifest protocol
    // exists to avoid
    def subdirs(p: Path): Vector[Path] =
      if (!Files.isDirectory(p)) Vector.empty
      else scala.util.Using.resource(Files.list(p))(
        _.iterator().asScala.filter(Files.isDirectory(_)).toVector)
    val target = s"batch=$batchId"
    val stale =
      subdirs(Paths.get(root, "data")).flatMap(subdirs) ++
        subdirs(Paths.get(root, "cdata")).flatMap(pred => subdirs(pred).flatMap(subdirs)) ++
        subdirs(Paths.get(root, "odata")).flatMap(pred => subdirs(pred).flatMap(subdirs))
    stale.filter(_.getFileName.toString == target).foreach(deleteRecursive)
  }

  private def countersOf(df: DataFrame): Map[String, Long] =
    df.groupBy("pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def commitManifest(root: String, batchId: Int,
      counters: Map[String, Long], replaces: Set[Int],
      extraFields: Map[String, Long]): Unit = {
    val node = json.createObjectNode()
    node.put("batch", batchId)
    node.put("committed_at", java.time.Instant.now().toString)
    if (replaces.nonEmpty) {
      val arr = node.putArray("replaces")
      replaces.toSeq.sorted.foreach(arr.add)
    }
    extraFields.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    val cn = node.putObject("counters")
    counters.toSeq.sortBy(_._1).foreach { case (k, v) => cn.put(k, v) }
    Files.createDirectories(snapsDir(root))
    val tmp = snapsDir(root).resolve(s".snap-$batchId.json.tmp")
    Files.writeString(tmp, json.writeValueAsString(node))
    Files.move(tmp, snapsDir(root).resolve(s"snap-$batchId.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Append one batch of triples (must carry columns subj, pred, obj) and
    * commit it atomically with its lineage counters. Idempotent: re-running
    * a committed batch overwrites the same files and re-commits.
    * `replaces` (compaction / incremental-maintenance snapshots): batch ids
    * this snapshot atomically supersedes — they stop being visible the
    * instant the manifest lands. */
  def commitBatch(triples: DataFrame, root: String, batchId: Int,
      extraCounters: Map[String, Long] = Map.empty,
      replaces: Set[Int] = Set.empty): Unit = {
    scrubUncommitted(root, batchId)
    // Counters are computed from the batch DataFrame BEFORE the write (one
    // localCheckpoint pass feeding both): re-reading the store after every
    // commit re-lists all files — O(batches) listing per commit, O(B²)
    // for a run — and the listing, not the pruned read, dominates at scale.
    val df = graft.Materialize(triples.select("subj", "pred", "obj"))
    val counts = countersOf(df)
    // partition by predicate: per-predicate scans prune
    df.withColumn("batch", lit(batchId))
      .write
      .mode("overwrite")
      .partitionBy("pred", "batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$root/data")
    commitManifest(root, batchId, counts ++ extraCounters, replaces, Map.empty)
  }

  /** Snapshot time travel: read the store as of a given snapshot id —
    * only batches committed with id ≤ asOfBatch are visible (the
    * Iceberg-snapshot read semantics on the manifest log). */
  def readAsOf(spark: SparkSession, root: String, asOfBatch: Int): DataFrame = {
    val texts = manifestNodes(root)
    readBatches(spark, root, visibleBatchesOf(texts, asOfBatch),
      bucketedBatchesOf(texts).keySet)
  }

  /** Read only committed (and not compacted-away) batches. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val texts = manifestNodes(root)
    readBatches(spark, root, visibleBatchesOf(texts, Int.MaxValue),
      bucketedBatchesOf(texts).keySet)
  }

  private def emptyTriples(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, String)].toDF("subj", "pred", "obj")
  }

  /** Union of the plain (`data`) and bucketed (`cdata`) trees restricted to
    * `committed`, each side optionally further filtered (subject pruning). */
  private def readBatches(spark: SparkSession, root: String, committed: Set[Int],
      bucketedIds: Set[Int],
      extraPlain: Column = lit(true), extraBucketed: Column = lit(true)): DataFrame = {
    val bucketed = bucketedIds & committed
    val plain = committed -- bucketed
    val parts = Seq(
      Option.when(plain.nonEmpty)(
        spark.read.parquet(s"$root/data")
          .where(col("batch").isin(plain.toSeq: _*) && extraPlain)
          .select("subj", "pred", "obj")),
      Option.when(bucketed.nonEmpty)(
        spark.read.parquet(s"$root/cdata")
          .where(col("batch").isin(bucketed.toSeq: _*) && extraBucketed)
          .select("subj", "pred", "obj"))).flatten
    if (parts.isEmpty) emptyTriples(spark)
    else parts.reduce(_.unionByName(_))
  }

  /** Exact same xxhash64 the Column expression `xxhash64(col)` compiles to
    * (seed 42), evaluated driver-side so subject-bucket predicates are plain
    * integer literals — partition pruning needs no constant-fold help. */
  private def hashBucket(value: String, buckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val h = XxHash64Function.hash(UTF8String.fromString(value), StringType, 42L)
    (((h % buckets) + buckets) % buckets).toInt // pmod
  }

  /** Subject lookup with PRUNED reads — the first operation every graph
    * consumer does (SURVEY §4's `bucket(N, subj)` promise). Compacted
    * batches open only the `sbucket = pmod(xxhash64(subj), filesPerPred)`
    * partition directories of each predicate (1/filesPerPred of the
    * compacted files; subj-sorted files let parquet min/max prune further
    * within a bucket); not-yet-compacted micro-batches are filtered by
    * subject the ordinary way. Optionally restrict to `preds` for
    * (pred, subj) point lookups — pred is the outer partition directory,
    * so that prunes multiplicatively. */
  def readForSubjects(spark: SparkSession, root: String, subjects: Seq[String],
      preds: Seq[String] = Nil): DataFrame = {
    require(subjects.nonEmpty, "readForSubjects: no subjects given")
    // ONE manifest-directory read serves the whole lookup (visibility,
    // bucket layout, bucket counts) — a point-lookup API must not scan
    // _snapshots/ three times on a store with thousands of commits
    val texts = manifestNodes(root)
    val committed = visibleBatchesOf(texts, Int.MaxValue)
    if (committed.isEmpty) return emptyTriples(spark)
    val bucketedAll = bucketedBatchesOf(texts)
    val subjPred = col("subj").isin(subjects: _*)
    val predPred = if (preds.isEmpty) lit(true) else col("pred").isin(preds: _*)
    // every visible bucketed batch was written with the same filesPerPred
    // unless compact() was re-parameterized between compactions; the bucket
    // predicate is computed per distinct bucket count, so mixed layouts
    // still prune correctly
    val bucketedVisible = bucketedAll.filter(kv => committed(kv._1))
    val bucketPred =
      if (bucketedVisible.isEmpty) lit(true)
      else {
        val byCount = bucketedVisible.groupBy(_._2).view.mapValues(_.keySet.toSeq).toMap
        byCount.map { case (n, ids) =>
          col("batch").isin(ids: _*) &&
            col("sbucket").isin(subjects.map(hashBucket(_, n)).distinct: _*)
        }.reduce(_ || _)
      }
    readBatches(spark, root, committed, bucketedAll.keySet,
      extraPlain = subjPred && predPred,
      extraBucketed = bucketPred && subjPred && predPred)
  }

  /** Iceberg-style rewrite-data-files: fold all currently visible batches
    * into ONE new batch in the BUCKETED layout and commit a snapshot whose
    * manifest atomically supersedes them. At 10^12-doc scale a store
    * accumulates thousands of micro-batch commits — per-predicate reads
    * then union thousands of `batch=<k>` partitions of small files, and
    * file listing/open overhead (not bytes) dominates the scan; compaction
    * restores O(preds × filesPerPred) large files AND makes subject
    * lookups addressable: rows land under
    * `pred=<p>/sbucket=pmod(xxhash64(subj), filesPerPred)/` sorted by subj
    * within each file, so `readForSubjects` opens 1/filesPerPred of the
    * store and parquet min/max prunes inside what it opens. Crash-safe by
    * the same protocol as commitBatch (scrub → data files → manifest
    * ATOMIC_MOVE as the commit point). Readers of snapshots OLDER than the
    * compaction id still see the original micro-batches (time travel
    * unaffected) until `vacuum`.
    *
    * `filesPerPred` is the subject-bucket count per predicate (at a real
    * deployment derive it from store size / 128 MB). `objectIndex = true`
    * additionally writes the OBJECT permutation under `odata` (same bucket
    * count, obj-hashed and obj-sorted) — the SPO/POS storage-for-latency
    * trade every RDF store makes; both trees commit under ONE manifest, so
    * the permutations can never disagree about visibility.
    * Returns the new compacted batch id. */
  def compact(spark: SparkSession, root: String, filesPerPred: Int = 1,
      objectIndex: Boolean = false): Int = {
    val texts = manifestNodes(root)
    val visible = visibleBatchesOf(texts, Int.MaxValue)
    require(visible.nonEmpty, "compact: nothing committed")
    val newId = committedBatches(root).max + 1
    // scrub BEFORE reading: a crashed prior attempt at this id left
    // manifest-less partitions whose half-written files would otherwise be
    // listed (and possibly schema-sampled) by the store read below
    scrubUncommitted(root, newId)
    val df = readBatches(spark, root, visible, bucketedBatchesOf(texts).keySet)
      .withColumn("sbucket", pmod(xxhash64(col("subj")), lit(filesPerPred.toLong)))
      .withColumn("batch", lit(newId))
      // one task per (pred, sbucket) → one file per partition directory;
      // the sort puts rows in partition-column order FIRST (so the dynamic
      // write inserts no extra sort that could break subj order) and by
      // subj WITHIN each directory's file (parquet min/max pruning)
      .repartition(col("pred"), col("sbucket"))
      .sortWithinPartitions("pred", "sbucket", "batch", "subj")
    // materialize before writing: severs the read-from-the-directory-being-
    // written lineage and feeds counters + write in one pass
    val m = graft.Materialize(df)
    val counts = countersOf(m)
    m.write
      .mode("overwrite")
      .partitionBy("pred", "sbucket", "batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$root/cdata")
    if (objectIndex) {
      // second permutation from the SAME materialized rows (no re-read of
      // the input store): re-shuffle by (pred, obucket), obj-sorted files
      m.drop("sbucket")
        .withColumn("obucket",
          pmod(xxhash64(col("obj")), lit(filesPerPred.toLong)))
        .repartition(col("pred"), col("obucket"))
        .sortWithinPartitions("pred", "obucket", "batch", "obj")
        .write
        .mode("overwrite")
        .partitionBy("pred", "obucket", "batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$root/odata")
    }
    commitManifest(root, newId, counts, replaces = visible,
      extraFields = Map("files_per_pred" -> filesPerPred.toLong) ++
        (if (objectIndex) Map("object_index" -> 1L) else Map.empty))
    newId
  }

  /** Object lookup with PRUNED reads — the `?s pred obj` access path
    * (who links TO this entity?). Compactions written with
    * `objectIndex = true` open only the `obucket = pmod(xxhash64(obj),
    * filesPerPred)` partition directories of the `odata` permutation
    * (obj-sorted files add parquet min/max pruning); compactions without
    * the object index and plain micro-batches fall back to an ordinary
    * filtered scan of their trees, so the API is total either way. */
  def readForObjects(spark: SparkSession, root: String, objects: Seq[String],
      preds: Seq[String] = Nil): DataFrame = {
    require(objects.nonEmpty, "readForObjects: no objects given")
    val texts = manifestNodes(root)
    val committed = visibleBatchesOf(texts, Int.MaxValue)
    if (committed.isEmpty) return emptyTriples(spark)
    val bucketedAll = bucketedBatchesOf(texts)
    val oindexed = objectIndexedOf(texts).filter(committed)
    val objPred = col("obj").isin(objects: _*)
    val predPred = if (preds.isEmpty) lit(true) else col("pred").isin(preds: _*)
    // object-indexed compactions read from odata with bucket pruning…
    val fromOdata = Option.when(oindexed.nonEmpty) {
      val byCount = oindexed.toSeq.groupBy(bucketedAll)
      val bucketPred = byCount.map { case (n, ids) =>
        col("batch").isin(ids: _*) &&
          col("obucket").isin(objects.map(hashBucket(_, n)).distinct: _*)
      }.reduce(_ || _)
      spark.read.parquet(s"$root/odata")
        .where(bucketPred && objPred && predPred)
        .select("subj", "pred", "obj")
    }
    // …everything else scans its own tree under the ordinary filter
    val rest = committed -- oindexed
    val fromRest = Option.when(rest.nonEmpty)(
      readBatches(spark, root, rest, bucketedAll.keySet,
        extraPlain = objPred && predPred,
        extraBucketed = objPred && predPred))
    (fromOdata.toSeq ++ fromRest.toSeq)
      .reduceOption(_.unionByName(_))
      .getOrElse(emptyTriples(spark))
  }

  /** Physically delete data partitions of batches superseded by a committed
    * compaction snapshot (Iceberg expire-snapshots). After this, time
    * travel to pre-compaction snapshot ids no longer sees those rows —
    * the standard retention trade-off; run it once readers have moved past
    * the compaction point. Latest-snapshot `read` is unaffected. */
  def vacuum(root: String): Int = {
    val replaced = replacedBy(root).values.flatten.toSet
    if (replaced.isEmpty) return 0
    var removed = 0
    Seq("data", "cdata", "odata").map(Paths.get(root, _)).filter(Files.exists(_))
      .foreach { tree =>
        val targets = scala.util.Using.resource(Files.walk(tree)) { st =>
          st.iterator().asScala.filter { p =>
            val n = p.getFileName.toString
            Files.isDirectory(p) && n.startsWith("batch=") &&
              n.stripPrefix("batch=").toIntOption.exists(replaced)
          }.toVector
        }
        targets.foreach { b => deleteRecursive(b); removed += 1 }
      }
    removed
  }

  /** Lineage counters of all committed snapshots as a DataFrame. */
  def counters(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rows = manifestNodes(root).toSeq.flatMap { case (batch, node) =>
      node.path("counters").properties().asScala.toSeq
        .filter(_.getValue.canConvertToLong)
        .map(e => (batch, e.getKey, e.getValue.asLong()))
    }
    if (rows.isEmpty) Seq.empty[(Int, String, Long)].toDF("batch", "key", "value")
    else rows.toDF("batch", "key", "value")
  }
}
