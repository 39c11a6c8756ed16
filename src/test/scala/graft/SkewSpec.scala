package graft

import graft.fixtures.InvoiceCorpus
import graft.functions.MinHashAgg
import graft.graph.TripleStore
import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted count == plain groupBy count on the Zipf-shaped corpus") {
    val vm = graft.run.FastExtract.vendorMentions(InvoiceCorpus.docs(spark, 150)).toDF()
    val plain = vm.groupBy("entity_key").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(vm, "entity_key",
        saltFrom = xxhash64(col("doc_id"), col("role")), salts = 16)
      .as[(String, Long)].collect().toMap
    assert(plain == salted)
  }

  test("salt is deterministic under re-evaluation (retry-safe by construction)") {
    // the r1 salt (monotonically_increasing_id) could re-salt rows between
    // task attempts; the fix hashes a row-identity column. Property: the
    // salted result is IDENTICAL across independent re-evaluations of a
    // recomputed (non-cached, multi-action) input, and equals plain groupBy.
    val vm = graft.run.FastExtract.vendorMentions(InvoiceCorpus.docs(spark, 120)).toDF()
    def salted() = Skew.saltedCount(vm, "entity_key",
        saltFrom = xxhash64(col("doc_id"), col("role")), salts = 8)
      .as[(String, Long)].collect().toMap
    val a = salted(); val b = salted()
    assert(a == b)
    val plain = vm.groupBy("entity_key").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(a == plain)
    // and the per-row salt itself is a pure function of the row
    val salts1 = vm.select(pmod(xxhash64(xxhash64(col("doc_id"), col("role"))), lit(8)))
      .as[Long].collect().sorted.toSeq
    val salts2 = vm.repartition(7).select(pmod(xxhash64(xxhash64(col("doc_id"), col("role"))), lit(8)))
      .as[Long].collect().sorted.toSeq
    assert(salts1 == salts2)
  }

  test("key profile surfaces the mega-vendor") {
    val vm = graft.run.FastExtract.vendorMentions(InvoiceCorpus.docs(spark, 300)).toDF()
    val top = Skew.keyProfile(vm, "entity_key", 3).as[(String, Long, Double)].collect()
    // company 0 gets ~30% of vendor mentions (~15% of all mentions) by design
    assert(top.head._1.startsWith("atlas_tech"), top.head)
    assert(top.head._3 > 0.08, top.head)
  }

  test("salted generic agg equals plain agg (sum)") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0)).toDF("k", "v")
    val out = Skew.saltedAgg(df, col("k"), saltFrom = xxhash64(col("v")), salts = 4)(
      Seq(sum("v").as("pv")), Seq(sum("pv").as("total")))
      .as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 6.0, "b" -> 4.0))
  }

  test("typed Aggregator: group minhash = elementwise min of member hashes") {
    val mh = MinHashAgg.of(8)
    val df = Seq(
      ("g1", Seq("a", "b")), ("g1", Seq("b", "c")), ("g2", Seq("a", "b", "c")))
      .toDF("g", "tokens")
    val sigs = df.groupBy("g").agg(mh(col("tokens")).as("sig"))
      .as[(String, Array[Long])].collect().toMap
    // g2's token set == union of g1's members → identical group signature
    assert(sigs("g1").toSeq == sigs("g2").toSeq)
    assert(sigs("g1").length == 8)
  }

  test("triple-store snapshot time travel") {
    val root = java.nio.file.Files.createTempDirectory("graft_tt_").toString
    TripleStore.commitBatch(Seq(("s1", "p", "o1")).toDF("subj", "pred", "obj"), root, 0)
    TripleStore.commitBatch(Seq(("s2", "p", "o2")).toDF("subj", "pred", "obj"), root, 1)
    assert(TripleStore.readAsOf(spark, root, 0).count() == 1)
    assert(TripleStore.readAsOf(spark, root, 1).count() == 2)
    assert(TripleStore.read(spark, root).count() == 2)
  }

  test("EL block-size audit exposes capped buckets") {
    val vm = graft.run.FastExtract.vendorMentions(InvoiceCorpus.docs(spark, 100)).toDF()
    val stats = graft.link.EntityLinker.blockStats(vm, maxBucket = 5)
    assert(stats.count() > 0)
    // with a tiny cap, the shared-token buckets show up as capped
    assert(stats.where($"capped").count() > 0)
    // with the production cap nothing is silently dropped on this corpus
    assert(graft.link.EntityLinker.blockStats(vm, maxBucket = 1000)
      .where($"capped").count() == 0)
  }
}