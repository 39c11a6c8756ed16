package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style partitioned triple store on plain parquet: data files plus a
  * `_snapshots/` JSON manifest log that makes every stage commit atomic and a
  * killed run resumable from the last committed snapshot (north_rule).
  *
  * Layout:
  *   <root>/data/pred=<p>/batch=<k>/(parquet files)   (partition columns)
  *   <root>/_snapshots/snap-<k>.json            (manifest: batch id, counters)
  *
  * Write protocol per batch: (1) write parquet under batch=<k> partitions;
  * (2) write manifest to a temp file; (3) ATOMIC_MOVE into _snapshots/.
  * A batch without its manifest is invisible to readers (read path keeps
  * only committed batches), so a crash between (1) and (3) just leaves
  * garbage files that the rerun overwrites — exactly the reference's
  * per-file resume unit generalized to partitions
  * (ocr/ocr_starter_final.py:416-435 → SURVEY.md §2.9).
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

  /** batch id → batches its manifest superseded (compaction snapshots). */
  private def replacedBy(root: String): Map[Int, Set[Int]] = {
    val d = snapsDir(root)
    if (!Files.exists(d)) Map.empty
    else scala.util.Using.resource(Files.list(d)) { stream =>
      stream.iterator().asScala
        .filter(_.getFileName.toString.startsWith("snap-"))
        .flatMap { p =>
          val txt = Files.readString(p)
          val batch = "\"batch\":\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
          val repl = "\"replaces\":\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
            .map(_.group(1).split(",").iterator.map(_.trim).filter(_.nonEmpty).map(_.toInt).toSet)
          for (b <- batch; r <- repl) yield b -> r
        }.toMap
    }
  }

  /** Batches visible to a reader as of snapshot `asOf` (MaxValue = latest):
    * committed ids ≤ asOf, minus those superseded by a compaction snapshot
    * that is itself ≤ asOf — so time travel BEFORE a compaction point still
    * sees the original micro-batches (until `vacuum` physically drops them,
    * the Iceberg expire-snapshots trade-off). */
  private def visibleBatches(root: String, asOf: Int): Set[Int] = {
    val committed = committedBatches(root).filter(_ <= asOf)
    val replaced = replacedBy(root)
      .collect { case (b, r) if b <= asOf && committed(b) => r }
      .flatten.toSet
    committed -- replaced
  }

  /** Currently visible batch ids (committed minus compacted-away). */
  def visibleBatchIds(root: String): Set[Int] = visibleBatches(root, Int.MaxValue)

  /** Append one batch of triples (must carry columns subj, pred, obj) and
    * commit it atomically with its lineage counters. Idempotent: re-running
    * a committed batch overwrites the same files and re-commits.
    * `replaces` (compaction / incremental-maintenance snapshots): batch ids
    * this snapshot atomically supersedes — they stop being visible the
    * instant the manifest lands. */
  def commitBatch(triples: DataFrame, root: String, batchId: Int,
      extraCounters: Map[String, Long] = Map.empty,
      replaces: Set[Int] = Set.empty): Unit = {
    // Counters are computed from the batch DataFrame BEFORE the write (one
    // localCheckpoint pass feeding both): re-reading the store after every
    // commit re-lists all files — O(batches) listing per commit, O(B²)
    // for a run — and the listing, not the pruned read, dominates at scale.
    val df = graft.Materialize(triples.select("subj", "pred", "obj"))
    val counts = df.groupBy("pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // partition by predicate: subject-lookups and per-predicate scans prune
    df.withColumn("batch", lit(batchId))
      .write
      .mode("overwrite")
      .partitionBy("pred", "batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$root/data")
    val all = counts ++ extraCounters
    val countersJson = all.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    val replacesJson =
      if (replaces.isEmpty) ""
      else s""" "replaces": ${replaces.toSeq.sorted.mkString("[", ", ", "]")},"""
    val manifest =
      s"""{"batch": $batchId, "committed_at": "${java.time.Instant.now()}",$replacesJson "counters": $countersJson}"""
    Files.createDirectories(snapsDir(root))
    val tmp = snapsDir(root).resolve(s".snap-$batchId.json.tmp")
    Files.writeString(tmp, manifest)
    Files.move(tmp, snapsDir(root).resolve(s"snap-$batchId.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Snapshot time travel: read the store as of a given snapshot id —
    * only batches committed with id ≤ asOfBatch are visible (the
    * Iceberg-snapshot read semantics on the manifest log). */
  def readAsOf(spark: SparkSession, root: String, asOfBatch: Int): DataFrame =
    readBatches(spark, root, visibleBatches(root, asOfBatch))

  /** Read only committed (and not compacted-away) batches. */
  def read(spark: SparkSession, root: String): DataFrame =
    readBatches(spark, root, visibleBatches(root, Int.MaxValue))

  private def readBatches(spark: SparkSession, root: String, committed: Set[Int]): DataFrame = {
    if (committed.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, String, String)].toDF("subj", "pred", "obj")
    } else {
      spark.read.parquet(s"$root/data")
        .where(col("batch").isin(committed.toSeq: _*))
        .select("subj", "pred", "obj")
    }
  }

  /** Iceberg-style rewrite-data-files: fold all currently visible batches
    * into ONE new batch partition and commit a snapshot whose manifest
    * atomically supersedes them. At 10^12-doc scale a store accumulates
    * thousands of micro-batch commits — per-predicate reads then union
    * thousands of `batch=<k>` partitions of small files, and file
    * listing/open overhead (not bytes) dominates the scan; compaction
    * restores O(preds) large files. Crash-safe by the same protocol as
    * commitBatch: data files land first, the manifest ATOMIC_MOVE is the
    * commit point — a crash mid-compaction leaves the old batches visible
    * and the half-written compacted files invisible garbage. Readers of
    * snapshots OLDER than the compaction id still see the original
    * micro-batches (time travel unaffected) until `vacuum`.
    *
    * `filesPerPred` bounds output files per predicate partition (at a real
    * deployment size by target bytes instead — parameterized so callers
    * derive it from store size / 128 MB).
    * Returns the new compacted batch id. */
  def compact(spark: SparkSession, root: String, filesPerPred: Int = 1): Int = {
    val visible = visibleBatches(root, Int.MaxValue)
    require(visible.nonEmpty, "compact: nothing committed")
    val newId = committedBatches(root).max + 1
    val df = readBatches(spark, root, visible)
      // spread within each predicate partition, bounded file count
      .repartition(filesPerPred, col("pred"), pmod(xxhash64(col("subj")), lit(filesPerPred)))
    // commitBatch materializes before writing, which both severs the
    // read-from-the-dir-being-written lineage and makes the manifest move
    // the single commit point
    commitBatch(df, root, newId, replaces = visible)
    newId
  }

  /** Physically delete data partitions of batches superseded by a committed
    * compaction snapshot (Iceberg expire-snapshots). After this, time
    * travel to pre-compaction snapshot ids no longer sees those rows —
    * the standard retention trade-off; run it once readers have moved past
    * the compaction point. Latest-snapshot `read` is unaffected. */
  def vacuum(root: String): Int = {
    val replaced = replacedBy(root).values.flatten.toSet
    val dataDir = Paths.get(root, "data")
    if (!Files.exists(dataDir) || replaced.isEmpty) return 0
    var removed = 0
    scala.util.Using.resource(Files.list(dataDir)) { preds =>
      preds.iterator().asScala.filter(Files.isDirectory(_)).foreach { predDir =>
        scala.util.Using.resource(Files.list(predDir)) { batches =>
          batches.iterator().asScala
            .filter { b =>
              val n = b.getFileName.toString
              n.startsWith("batch=") && replaced(n.stripPrefix("batch=").toInt)
            }
            .toVector.foreach { b =>
              scala.util.Using.resource(Files.walk(b))(
                _.sorted(java.util.Comparator.reverseOrder())
                  .iterator().asScala.foreach(Files.delete))
              removed += 1
            }
        }
      }
    }
    removed
  }

  /** Lineage counters of all committed snapshots as a DataFrame. */
  def counters(spark: SparkSession, root: String): DataFrame = {
    val d = snapsDir(root)
    import spark.implicits._
    if (!Files.exists(d)) return Seq.empty[(Int, String, Long)].toDF("batch", "key", "value")
    val rows = scala.util.Using.resource(Files.list(d)) { stream =>
      stream.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("snap-"))
        .flatMap { p =>
          val txt = Files.readString(p)
          val batch = "\"batch\":\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt).getOrElse(-1)
          "\"([^\"]+)\":\\s*(\\d+)".r.findAllMatchIn(txt)
            .filter(_.group(1) != "batch")
            .map(m => (batch, m.group(1), m.group(2).toLong))
        }.toSeq
    }
    rows.toDF("batch", "key", "value")
  }
}
