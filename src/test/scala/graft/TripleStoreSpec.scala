package graft

import graft.fixtures.InvoiceCorpus
import graft.graph.TripleStore
import graft.run.Pipeline
import java.nio.file.Files

/** Snapshot-commit semantics + the kill/resume equivalence property
  * (north_rule: "resumable from checkpoint with per-partition lineage").
  */
class TripleStoreSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_store_").toString

  test("commit, read back, counters") {
    val root = tmp()
    val df = Seq(("s1", "p1", "o1"), ("s2", "p2", "o2")).toDF("subj", "pred", "obj")
    TripleStore.commitBatch(df, root, 0, Map("docs" -> 2L))
    assert(TripleStore.committedBatches(root) == Set(0))
    assert(TripleStore.read(spark, root).count() == 2)
    val counters = TripleStore.counters(spark, root)
      .as[(Int, String, Long)].collect().toSet
    assert(counters.contains((0, "docs", 2L)))
    assert(counters.contains((0, "p1", 1L)))
  }

  test("manifest survives hostile predicate names (JSON-escaped counters, structural-field collisions)") {
    val root = tmp()
    // preds containing JSON metacharacters and one named like a structural
    // manifest field — commitBatch is a public API over arbitrary strings,
    // so the manifest must neither corrupt nor let a counter key shadow
    // (or be shadowed by) a top-level field
    val hostile = Seq(
      ("s1", "said \"hi\"", "o1"),
      ("s2", "back\\slash\nnewline", "o2"),
      ("s3", "batch", "o3"),
      ("s4", "files_per_pred", "o4"))
    TripleStore.commitBatch(hostile.toDF("subj", "pred", "obj"), root, 0)
    // the manifest parses; visibility and read-back are intact
    assert(TripleStore.visibleBatchIds(root) == Set(0))
    assert(TripleStore.read(spark, root).count() == 4)
    val counters = TripleStore.counters(spark, root)
      .as[(Int, String, Long)].collect().toSet
    assert(counters.contains((0, "said \"hi\"", 1L)))
    assert(counters.contains((0, "back\\slash\nnewline", 1L)))
    // counterValue reads ONLY the counters object: the pred named "batch"
    // returns its own count, not the structural batch id field
    assert(TripleStore.counterValue(root, 0, "batch").contains(1L))
    // a counter named files_per_pred must NOT make the batch look bucketed:
    // a second batch + compact still works and the store reads consistently
    TripleStore.commitBatch(Seq(("s9", "p9", "o9")).toDF("subj", "pred", "obj"), root, 1)
    assert(TripleStore.read(spark, root).count() == 5)
    TripleStore.compact(spark, root)
    assert(TripleStore.read(spark, root).count() == 5)
  }

  test("uncommitted batch is invisible; recommit is idempotent") {
    val root = tmp()
    val df = Seq(("s", "p", "o")).toDF("subj", "pred", "obj")
    // write data without manifest (simulated crash between write and commit)
    df.withColumn("batch", org.apache.spark.sql.functions.lit(7))
      .write.partitionBy("pred", "batch").mode("overwrite").parquet(s"$root/data")
    assert(TripleStore.read(spark, root).count() == 0)
    // now commit properly — same files, now visible exactly once
    TripleStore.commitBatch(df, root, 7)
    assert(TripleStore.read(spark, root).count() == 1)
    TripleStore.commitBatch(df, root, 7) // re-run the same batch
    assert(TripleStore.read(spark, root).count() == 1)
  }

  test("compact folds micro-batches into one snapshot; time travel + vacuum semantics") {
    val root = tmp()
    // 5 micro-batch commits of 3 triples each (distinct rows per batch)
    (0 until 5).foreach { b =>
      val df = (0 until 3).map(i => (s"s$b-$i", s"p${i % 2}", s"o$b-$i"))
        .toDF("subj", "pred", "obj")
      TripleStore.commitBatch(df, root, b)
    }
    val before = TripleStore.read(spark, root)
      .as[(String, String, String)].collect().sorted.toSeq
    assert(before.size == 15)

    val cid = TripleStore.compact(spark, root)
    assert(cid == 5)
    // latest read: identical triple multiset, but served from ONE batch
    val after = TripleStore.read(spark, root)
      .as[(String, String, String)].collect().sorted.toSeq
    assert(after == before)
    // physical check: the compacted batch lives in the BUCKETED tree
    // (cdata/pred=*/sbucket=*/batch=<cid>), one partition per (pred,
    // sbucket); filesPerPred = 1 → one bucket per predicate
    import scala.jdk.CollectionConverters._
    def batchDirs(tree: String): Seq[String] = {
      val p = java.nio.file.Paths.get(root, tree)
      if (!java.nio.file.Files.exists(p)) Seq.empty
      else scala.util.Using.resource(java.nio.file.Files.walk(p))(
        _.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("batch=")).toSeq)
    }
    assert(batchDirs("cdata").count(_ == s"batch=$cid") == 2) // one per (pred, sbucket)
    // time travel BEFORE the compaction id still reads the micro-batches
    assert(TripleStore.readAsOf(spark, root, 2).count() == 9)
    // as-of the compaction id == latest
    assert(TripleStore.readAsOf(spark, root, cid).count() == 15)

    // vacuum drops the superseded partitions; latest read unaffected
    val removed = TripleStore.vacuum(root)
    assert(removed == 10) // 5 batches × 2 pred partitions
    assert(batchDirs("data").isEmpty && batchDirs("cdata").toSet == Set(s"batch=$cid"))
    val postVacuum = TripleStore.read(spark, root)
      .as[(String, String, String)].collect().sorted.toSeq
    assert(postVacuum == before)
    // a fresh commit after compaction gets the next id and stacks normally
    TripleStore.commitBatch(Seq(("x", "p0", "y")).toDF("subj", "pred", "obj"), root, cid + 1)
    assert(TripleStore.read(spark, root).count() == 16)
  }

  test("model-based: random commit/compact/vacuum sequence == in-memory visibility model") {
    // The store backs resume, compaction AND incremental maintenance, so
    // its visibility semantics get a model check beyond the scripted
    // cases: a seeded random op sequence is replayed against a trivial
    // in-memory model of (batch → rows, replaced-set, vacuumed-set), and
    // read / readAsOf must agree at every step.
    val root = tmp()
    val rnd = new scala.util.Random(7)
    var nextId = 0
    val data = scala.collection.mutable.Map[Int, Set[(String, String, String)]]()
    val replacedBy = scala.collection.mutable.Map[Int, Set[Int]]() // snap → replaces
    val gone = scala.collection.mutable.Set[Int]() // vacuumed batch ids

    def committed: Set[Int] = data.keySet.toSet
    def visibleAt(asOf: Int): Set[Int] = {
      val vis = committed.filter(_ <= asOf)
      vis -- replacedBy.collect { case (b, r) if b <= asOf && vis(b) => r }.flatten
    }
    def expectedAt(asOf: Int): Set[(String, String, String)] =
      (visibleAt(asOf) -- gone).flatMap(data)
    def readSet(asOf: Option[Int]): Set[(String, String, String)] = {
      val df = asOf.map(TripleStore.readAsOf(spark, root, _))
        .getOrElse(TripleStore.read(spark, root))
      df.as[(String, String, String)].collect().toSet
    }

    val checkpoints = scala.collection.mutable.ArrayBuffer[Int]()
    (1 to 18).foreach { step =>
      rnd.nextInt(4) match {
        case 0 | 1 => // commit a small batch of fresh rows
          val rows = (0 until 1 + rnd.nextInt(3))
            .map(i => (s"s$step-$i", s"p${rnd.nextInt(2)}", s"o$step-$i")).toSet
          TripleStore.commitBatch(rows.toSeq.toDF("subj", "pred", "obj"), root, nextId)
          data(nextId) = rows; nextId += 1
        case 2 if committed.nonEmpty => // compact everything visible
          val vis = visibleAt(Int.MaxValue)
          val cid = TripleStore.compact(spark, root)
          assert(cid == committed.max + 1)
          data(cid) = (vis -- gone).flatMap(data)
          replacedBy(cid) = vis
          nextId = cid + 1
        case 3 if committed.nonEmpty => // vacuum superseded partitions
          TripleStore.vacuum(root)
          gone ++= replacedBy.values.flatten
        case _ => () // compact/vacuum on an empty store: no-op
      }
      assert(readSet(None) == expectedAt(Int.MaxValue), s"latest read diverged at step $step")
      if (committed.nonEmpty) checkpoints += committed.max
    }
    // time travel at every recorded snapshot id still matches the model
    // (including post-vacuum holes, which the model tracks via `gone`)
    checkpoints.distinct.foreach { snap =>
      assert(readSet(Some(snap)) == expectedAt(snap), s"as-of $snap diverged")
    }
  }

  test("readForSubjects: compacted lookups open 1/filesPerPred of the store (pruned scan)") {
    val root = tmp()
    // 4 micro-batches, 2 predicates, 40 distinct subjects
    (0 until 4).foreach { b =>
      val df = (0 until 10).map(i => (s"inv:${b * 10 + i}", s"p${i % 2}", s"o$b-$i"))
        .toDF("subj", "pred", "obj")
      TripleStore.commitBatch(df, root, b)
    }
    // expectations collected BEFORE compact/vacuum (the pre-compaction
    // file listing is stale afterwards)
    val expected17 = TripleStore.read(spark, root).where($"subj" === "inv:17")
      .as[(String, String, String)].collect().toSet
    val cid = TripleStore.compact(spark, root, filesPerPred = 8)
    assert(TripleStore.vacuum(root) > 0)

    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.metrics("numFiles").value).sum
    }
    val totalFiles = filesRead(TripleStore.read(spark, root))
    // ~2 preds x 8 buckets (a bucket can be hash-empty)
    assert(totalFiles >= 14 && totalFiles <= 16,
      s"expected ~2 preds x 8 buckets, got $totalFiles")

    // single-subject lookup: exactly one sbucket dir per predicate opens
    val one = TripleStore.readForSubjects(spark, root, Seq("inv:17"))
    assert(filesRead(one) == 2, "single-subject lookup must open 1/filesPerPred of each pred")
    assert(one.as[(String, String, String)].collect().toSet == expected17)
    // (pred, subj) point lookup prunes multiplicatively on the pred dir too
    val point = TripleStore.readForSubjects(spark, root, Seq("inv:17"), preds = Seq("p1"))
    assert(filesRead(point) == 1)
    // multi-subject lookup: union of the subjects' buckets, still pruned
    val two = TripleStore.readForSubjects(spark, root, Seq("inv:3", "inv:29"))
    assert(filesRead(two) <= 4 && two.count() == 2)

    // MIXED store: a fresh micro-batch after compaction is read the plain
    // way alongside the pruned bucketed scan
    TripleStore.commitBatch(
      Seq(("inv:17", "p0", "late"), ("inv:99", "p1", "x")).toDF("subj", "pred", "obj"),
      root, cid + 1)
    val mixed = TripleStore.readForSubjects(spark, root, Seq("inv:17"))
      .as[(String, String, String)].collect().toSet
    assert(mixed == expected17 + (("inv:17", "p0", "late")))
  }

  test("readForObjects: object permutation prunes like the subject one; " +
    "falls back to filtered scans where no odata exists") {
    val root = tmp()
    (0 until 4).foreach { b =>
      val df = (0 until 10).map(i => (s"inv:${b * 10 + i}", s"p${i % 2}", s"ent:${i % 5}"))
        .toDF("subj", "pred", "obj")
      TripleStore.commitBatch(df, root, b)
    }
    val expected = TripleStore.read(spark, root).where($"obj" === "ent:3")
      .as[(String, String, String)].collect().toSet
    assert(expected.size == 8) // 4 batches x 2 rows with i%5==3

    // BEFORE any object index: the API works as a filtered scan
    val pre = TripleStore.readForObjects(spark, root, Seq("ent:3"))
      .as[(String, String, String)].collect().toSet
    assert(pre == expected)

    val cid = TripleStore.compact(spark, root, filesPerPred = 8,
      objectIndex = true)
    assert(TripleStore.vacuum(root) > 0)

    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.metrics("numFiles").value).sum
    }
    // single-object lookup: one obucket dir per predicate opens
    val one = TripleStore.readForObjects(spark, root, Seq("ent:3"))
    assert(filesRead(one) == 2,
      "single-object lookup must open 1/filesPerPred of each pred")
    assert(one.as[(String, String, String)].collect().toSet == expected)
    // (pred, obj) point lookup prunes on the pred dir too
    val point = TripleStore.readForObjects(spark, root, Seq("ent:3"),
      preds = Seq("p1"))
    assert(filesRead(point) == 1)
    assert(point.as[(String, String, String)].collect().toSet ==
      expected.filter(_._2 == "p1"))

    // subject lookups still serve from cdata, untouched by the new tree
    val subj = TripleStore.readForSubjects(spark, root, Seq("inv:13"))
    assert(filesRead(subj) == 2)

    // a fresh micro-batch after compaction joins via the plain path
    TripleStore.commitBatch(
      Seq(("inv:99", "p0", "ent:3"), ("inv:98", "p1", "other"))
        .toDF("subj", "pred", "obj"), root, cid + 1)
    val mixed = TripleStore.readForObjects(spark, root, Seq("ent:3"))
      .as[(String, String, String)].collect().toSet
    assert(mixed == expected + (("inv:99", "p0", "ent:3")))

    // both permutations carry the SAME visible rows (one manifest)
    val viaS = TripleStore.read(spark, root)
      .as[(String, String, String)].collect().toSet
    val allObjs = viaS.map(_._3).toSeq
    val viaO = TripleStore.readForObjects(spark, root, allObjs)
      .as[(String, String, String)].collect().toSet
    assert(viaO == viaS)
  }

  test("counterValue: driver-side manifest counter lookup, no Spark job") {
    val root = tmp()
    TripleStore.commitBatch(
      Seq(("s1", "canonicalOf", "o1"), ("s2", "canonicalOf", "o2"), ("s3", "p", "o"))
        .toDF("subj", "pred", "obj"), root, 0, Map("docs" -> 9L))
    assert(TripleStore.counterValue(root, 0, "canonicalOf").contains(2L))
    assert(TripleStore.counterValue(root, 0, "docs").contains(9L))
    assert(TripleStore.counterValue(root, 0, "absent").isEmpty)
    assert(TripleStore.counterValue(root, 1, "docs").isEmpty)
  }

  test("crashed replaces-bearing write leaves no orphan predicate after retry (scrub)") {
    val root = tmp()
    TripleStore.commitBatch(Seq(("s", "p0", "a")).toDF("subj", "pred", "obj"), root, 0)
    TripleStore.commitBatch(Seq(("s", "p1", "b")).toDF("subj", "pred", "obj"), root, 1)
    // simulate a CRASHED compaction/incremental attempt at the next id that
    // wrote a predicate (pX) the later retry does not produce — data files
    // land, no manifest
    Seq(("s", "pX", "garbage"), ("s", "p0", "half")).toDF("subj", "pred", "obj")
      .withColumn("batch", org.apache.spark.sql.functions.lit(2))
      .write.partitionBy("pred", "batch").mode("append").parquet(s"$root/data")
    assert(TripleStore.read(spark, root).count() == 2) // garbage invisible
    // the retry at the same id produces only p0/p1 and supersedes 0 and 1;
    // without the pre-write scrub, pX/batch=2 would become visible the
    // moment this manifest lands (ADVICE r3)
    TripleStore.commitBatch(
      Seq(("s", "p0", "a"), ("s", "p1", "b")).toDF("subj", "pred", "obj"),
      root, 2, replaces = Set(0, 1))
    val rows = TripleStore.read(spark, root).as[(String, String, String)].collect().toSet
    assert(rows == Set(("s", "p0", "a"), ("s", "p1", "b")), s"got $rows")
  }

  test("kill/resume equivalence: interrupted run + resume == uninterrupted run") {
    val docs = InvoiceCorpus.docs(spark, 60).toDF().cache()
    val rootA = tmp() // interrupted then resumed
    val rootB = tmp() // uninterrupted
    intercept[RuntimeException] {
      Pipeline.runResumable(spark, docs, rootA, nBatches = 3, failAfterBatches = 1)
    }
    val committedMid = TripleStore.committedBatches(rootA)
    assert(committedMid.nonEmpty && committedMid.size < 5) // partial progress
    Pipeline.runResumable(spark, docs, rootA, nBatches = 3) // resume
    Pipeline.runResumable(spark, docs, rootB, nBatches = 3)
    val a = Pipeline.readGraph(spark, rootA)
    val b = Pipeline.readGraph(spark, rootB)
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
    // per-partition lineage counters present for every data batch
    val counters = TripleStore.counters(spark, rootA)
    assert(counters.where($"key" === "docs").count() == 3)

    // graph point lookup == filtered full read (and never leaks internal
    // predicates), on the raw store AND after compact+vacuum (pruned path)
    val subj = Pipeline.readGraph(spark, rootA)
      .where($"pred" === "hasVendor").select("subj").as[String].head()
    def lookup() = Pipeline.lookupSubjects(spark, rootA, Seq(subj))
      .as[(String, String, String)].collect().toSet
    val expected = Pipeline.readGraph(spark, rootA).where($"subj" === subj)
      .as[(String, String, String)].collect().toSet
    assert(lookup() == expected && expected.nonEmpty)
    assert(lookup().forall(t => !t._2.startsWith("_reg") && t._2 != "canonicalOf"))
    TripleStore.compact(spark, rootA, filesPerPred = 4)
    TripleStore.vacuum(rootA)
    assert(lookup() == expected, "pruned lookup diverged after compaction")
    val one = Pipeline.lookupSubjects(spark, rootA, Seq(subj), preds = Seq("hasVendor"))
      .as[(String, String, String)].collect().toSet
    assert(one == expected.filter(_._2 == "hasVendor"))
    // a preds restriction naming ONLY an internal bookkeeping predicate
    // must return the EMPTY set — not fall back to "no restriction" and
    // leak every public triple of the subject
    val canonSubj = TripleStore.read(spark, rootA)
      .where($"pred" === "canonicalOf").select("subj").as[String].head()
    assert(Pipeline.lookupSubjects(spark, rootA, Seq(canonSubj),
      preds = Seq("canonicalOf")).isEmpty)

    // object-side consumer parity (r4 verdict #9): lookupObjects ==
    // filtered full read, never leaks internals, and PRUNES through the
    // object permutation once the store is compacted with objectIndex
    val obj = Pipeline.readGraph(spark, rootA)
      .where($"pred" === "hasVendor").select("obj").as[String].head()
    def lookupO() = Pipeline.lookupObjects(spark, rootA, Seq(obj))
      .as[(String, String, String)].collect().toSet
    val expectedO = Pipeline.readGraph(spark, rootA).where($"obj" === obj)
      .as[(String, String, String)].collect().toSet
    assert(lookupO() == expectedO && expectedO.nonEmpty)
    assert(lookupO().forall(t => !t._2.startsWith("_reg") && t._2 != "canonicalOf"))
    TripleStore.compact(spark, rootA, filesPerPred = 4, objectIndex = true)
    TripleStore.vacuum(rootA)
    assert(lookupO() == expectedO, "pruned object lookup diverged after compaction")
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.metrics("numFiles").value).sum
    }
    val nPreds = TripleStore.read(spark, rootA).select("pred").distinct().count()
    val pruned = filesRead(Pipeline.lookupObjects(spark, rootA, Seq(obj)))
    val full = filesRead(TripleStore.read(spark, rootA))
    assert(pruned <= nPreds && pruned < full,
      s"object consumer lookup must open <= 1 obucket per pred " +
        s"(pruned=$pruned, preds=$nPreds, full=$full)")
    // a preds restriction naming ONLY an internal predicate: empty, no leak
    val canonObj = TripleStore.read(spark, rootA)
      .where($"pred" === "canonicalOf").select("obj").as[String].head()
    assert(Pipeline.lookupObjects(spark, rootA, Seq(canonObj),
      preds = Seq("canonicalOf")).isEmpty)
  }
}
