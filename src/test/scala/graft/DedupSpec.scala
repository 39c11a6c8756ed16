package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat today"), // near dup of 1
    (4L, "completely different words about spark shuffles and partitions here"),
    (5L, "unrelated short text")).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts duplicates") {
    val out = Dedup.exact(docs).as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("n-gram Jaccard finds exact and near dups with correct scores") {
    val pairs = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    // doc1/doc2: identical → jaccard 1.0
    assert(pairs.contains((1L, 2L, 1.0)))
    // doc1/doc3: 8 shingles each (10 words, k=3); "dog" at position 8 flips
    // shingles s6/s7 → common 6, union 10 → 0.6
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 3L && j == 0.6 })
    assert(!pairs.exists { case (a, b, _) => Set(a, b).contains(4L) })
  }

  test("q21 oracle contract: minhash pair set == exact-Jaccard pair set on the driver documents table") {
    // the driver's q21 DuckDB oracle IS the exact-Jaccard pair set (no df
    // cap) — valid because every LSH candidate is verified by exact Jaccard
    // and recall on this table is deterministically 1.0 (all true pairs sit
    // at j ≥ 0.875; band hashes are a fixed function of the data). This
    // test pins that contract to the actual table the driver runs on.
    val real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(real, k = 5, threshold = 0.2, maxDf = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    val mh = Dedup.minhashNearDup(real, k = 5, numHashes = 16, bands = 8, threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty)
    assert(mh == exact, s"missed: ${exact -- mh}; spurious: ${mh -- exact}")
    assert(exact.forall(_._3 >= 0.875), "planted-dup margin moved — re-check the oracle safety argument")
  }

  test("minhash near-dup recalls everything the exact jaccard op finds") {
    val exact = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashNearDup(docs, k = 3, numHashes = 16, bands = 8, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(mh), s"missed: ${exact -- mh}")
    // verify step guarantees precision too: every emitted pair is a true pair
    assert(mh.subsetOf(exact), s"spurious: ${mh -- exact}")
  }

  test("simhash: identical texts at distance 0, near dups within threshold") {
    val pairs = Dedup.simhashNearDup(docs, maxHamming = 12)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
    val nd = pairs.find { case (a, b, _) => a == 1L && b == 3L }
    assert(nd.nonEmpty && nd.get._3 > 0, s"1-3 should be near but not identical: $pairs")
  }

  test("fast (typed/XxHash64Function) signatures == Column xxhash64 signatures") {
    val texts = docs.select("doc_id", "text")
    val fast = Dedup.minhashSignaturesFast(texts, k = 3, numHashes = 16)
      .select("id", "sig").as[(Long, Seq[Long])].collect().toMap
    val col16 = texts
      .select($"doc_id".as("id"), Dedup.minhashSignature($"text", 3, 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fast.keySet == col16.keySet)
    fast.foreach { case (id, sig) => assert(sig == col16(id), s"id=$id") }
  }

  test("fast (typed) simhash == Column simhash") {
    val col64 = docs.select($"doc_id", Dedup.simhash($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    docs.select("doc_id", "text").as[(Long, String)].collect().foreach {
      case (id, t) => assert(Dedup.simhashScala(t) == col64(id), s"id=$id")
    }
  }

  test("typed twins == Column twins on trailing \\t/\\n/\\r text (split limit -1 semantics)") {
    // Spark's split(str, regex) keeps a trailing empty token after a
    // terminal line break the space-only trim leaves in place; Java's
    // default-limit split drops it — the typed twins must mirror Spark
    val texts = Seq(
      (1L, "alpha beta gamma delta epsilon\n"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "un deux trois quatre cinq six\t"),
      (4L, "\tun deux trois quatre cinq six"),
      (5L, "ligne un\r\nligne deux trois quatre"))
    val df = texts.toDF("doc_id", "text")
    // shingles: fast Scala twin vs Column expression
    df.as[(Long, String)].collect().foreach { case (id, t) =>
      val fast = Dedup.wordShinglesScala(t, 3).toSet
      val col3 = df.where($"doc_id" === id)
        .select(Dedup.wordShingles($"text", 3)).as[Seq[String]].head().toSet
      assert(fast == col3, s"doc $id shingle divergence: ${fast diff col3} / ${col3 diff fast}")
    }
    // simhash: fast Scala twin vs Column expression
    val colSig = df.select($"doc_id", Dedup.simhash($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    texts.foreach { case (id, t) =>
      assert(Dedup.simhashScala(t) == colSig(id), s"doc $id simhash divergence")
    }
  }

  test("tiny docs (< k words) are never false-positive duplicates") {
    val tiny = Seq((1L, "a b"), (2L, "x y"), (3L, "p q r s")).toDF("doc_id", "text")
    assert(Dedup.minhashNearDup(tiny, k = 5, threshold = 0.1).count() == 0)
    assert(Dedup.ngramJaccardPairs(tiny, k = 5, threshold = 0.1).count() == 0)
  }

  test("shingle document-frequency cap drops boilerplate blocks") {
    // 60 docs sharing one boilerplate sentence: with maxDf=50 the shared
    // shingles are dropped and no pairs survive on boilerplate alone
    val many = (1 to 60).map(i => (i.toLong, s"standard legal boilerplate notice applies here fully item$i"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(many, k = 3, threshold = 0.3, maxDf = 50)
    assert(pairs.count() == 0)
  }
  test("q22 oracle contract: pigeonhole blocking == naive all-pairs hamming (fixture current)") {
    // the committed parquet is GenFixtures' O(n^2) hamming scan over the
    // sf0.01 documents (independent of the chunk-join blocking under test;
    // the signature fn itself is parity-locked in the simhash tests above)
    // and IS the driver's q22 oracle
    val docsTable = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val live = Dedup.simhashNearDup(docsTable, maxHamming = 3)
      .select(col("id_a").cast("long"), col("id_b").cast("long"), col("hamming").cast("int"))
    val fixture = spark.read.parquet("src/test/resources/expected/q22_expected_pairs.parquet")
      .select(col("id_a").cast("long"), col("id_b").cast("long"), col("hamming").cast("int"))
    assert(live.exceptAll(fixture).count() == 0, "live pairs missing from fixture")
    assert(fixture.exceptAll(live).count() == 0, "fixture pairs missing from live output")
  }

  test("dupGroups: transitive closure over pair graph, min-id group labels") {
    // chain a~b, b~c must land in ONE group even though (a,c) was never a
    // mined pair; disjoint pair (x,y) stays its own group; singletons
    // (never paired) are absent by contract
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val groups = Dedup.dupGroups(pairs)
      .as[(String, String)].collect().toMap
    assert(groups == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
    // keep-one decision is one anti-join away: drop every row whose id is
    // not its group label
    val kept = Dedup.dupGroups(pairs).where($"id" === $"group_id")
      .select("id").as[String].collect().toSet
    assert(kept == Set("a", "x"))
  }

  test("minhashNearDup: over-cap bucket drops are WARNED in-operator, silent otherwise") {
    // 6 identical docs → every band bucket holds 6 ids; maxBucket=2 drops
    // them all (and the near-dup pairs with them) — that loss must be loud
    val dups = (0 until 6).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val (res, warned) = Audit.capturing {
      Dedup.minhashNearDup(dups, k = 5, numHashes = 16, bands = 8,
        threshold = 0.5, maxBucket = 2).count()
    }
    assert(res == 0L)
    assert(warned.exists(_.contains("over-cap band buckets")), s"got $warned")
    val (res2, silent) = Audit.capturing {
      Dedup.minhashNearDup(dups, k = 5, numHashes = 16, bands = 8,
        threshold = 0.5, maxBucket = 2000).count()
    }
    assert(res2 == 15L) // C(6,2) exact duplicates all mined
    assert(silent.isEmpty, s"unexpected warnings: $silent")
    // materialize=none: accounting would double-compute the banding
    // aggregate, so it is SKIPPED — but loudly, and the mined pairs are
    // unchanged (the cap still applies through the lazy size-gate join)
    spark.conf.set(graft.Materialize.ModeKey, "none")
    try {
      val (res3, noneWarn) = Audit.capturing {
        Dedup.minhashNearDup(dups, k = 5, numHashes = 16, bands = 8,
          threshold = 0.5, maxBucket = 2).count()
      }
      assert(res3 == 0L)
      assert(noneWarn.exists(_.contains("accounting skipped")), s"got $noneWarn")
      assert(!noneWarn.exists(_.contains("over-cap band buckets")))
    } finally spark.conf.unset(graft.Materialize.ModeKey)
  }

  test("dupGroups: integral ids get numeric-min labels without caller padding") {
    // 2 < 10 lexicographically fails ("10" < "2") — the r3 mislabeling
    // hazard; the operator must pad internally and return LONGS
    val pairs = Seq((10L, 2L), (2L, 100L), (7L, 30L)).toDF("id_a", "id_b")
    val out = Dedup.dupGroups(pairs)
    assert(out.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(out.schema("group_id").dataType == org.apache.spark.sql.types.LongType)
    val groups = out.as[(Long, Long)].collect().toMap
    assert(groups == Map(2L -> 2L, 10L -> 2L, 100L -> 2L, 7L -> 7L, 30L -> 7L))
    // negative (xxhash64-shaped) ids label correctly too — the shared
    // order-preserving codec (graft.ops.Ids), not plain zero-padding
    val neg = Seq((-1L, 2L), (-10L, -1L), (Long.MinValue, 5L))
      .toDF("id_a", "id_b")
    val gn = Dedup.dupGroups(neg).as[(Long, Long)].collect().toMap
    assert(gn == Map(-10L -> -10L, -1L -> -10L, 2L -> -10L,
      Long.MinValue -> Long.MinValue, 5L -> Long.MinValue))
  }

  test("decontamination: verbatim k-gram overlap vs an eval set, minHits knob") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains the eval 4-gram twice-shifted
      (2L, "zzz alpha beta gamma delta yyy"),      // one shared 4-gram (alpha..delta)
      (3L, "alpha beta gamma xxx delta epsilon"),  // max 3-word verbatim run → clean at k=4
      (4L, "totally unrelated words here now")).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, eval, k = 4)
      .as[(Long, Long, Boolean)].collect().toMap2
    // doc1 shares "alpha beta gamma delta" AND "beta gamma delta epsilon"
    assert(out(1L) == (2L, true))
    assert(out(2L) == (1L, true))
    assert(out(3L) == (0L, false)) // k-1 overlap is not contamination
    assert(out(4L) == (0L, false))
    // minHits=2: incidental single-gram overlap tolerated
    val strict = Dedup.contamination(corpus, eval, k = 4, minHits = 2L)
      .as[(Long, Long, Boolean)].collect().toMap2
    assert(strict(1L)._2 && !strict(2L)._2)
  }

  implicit private class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
