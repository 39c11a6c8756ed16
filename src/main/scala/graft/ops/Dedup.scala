package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpus curation, over a table with
  * (id, text) columns. Five strategies, cheapest→richest:
  *
  *  1. exact          — hash groupBy on the text (one shuffle)
  *  2. n-gram Jaccard — shingle-join blocking + exact Jaccard (deterministic,
  *                      SQL-expressible → DuckDB oracle)
  *  3. MinHash + LSH  — banded minhash signatures (the 10^12-doc path:
  *                      candidate volume is controlled by band count, not
  *                      corpus size)
  *  4. SimHash        — 64-bit signature + pigeonhole chunk join for
  *                      hamming-distance ≤ k
  *  5. embedding cosine — see Similarity.neardupPairs
  *
  * Scale notes: every strategy is blocking + verify — the cross join never
  * appears. Document-frequency caps bound the quadratic term per block:
  * sum_b f_b² with f_b ≤ maxDf. Skewed shingles (boilerplate) are dropped,
  * which is also what you want semantically.
  */
object Dedup {

  /** Exact dedup: one row per distinct text with the keeper id (min id) and
    * the duplicate count. */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.groupBy(textCol)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))

  /** Word k-gram shingles of a text column (distinct). Documents with fewer
    * than k words yield an EMPTY array — not [null]: a null element would
    * give every tiny doc the same LSH band hashes AND jaccard
    * intersect([null],[null]) = 1.0, i.e. false-positive duplicates. */
  def wordShingles(text: Column, k: Int): Column = {
    val words = split(trim(text), "\\s+")
    // r6: BIND the split array as a lambda variable before the sliding
    // transform — HOF lambdas are interpreted (no whole-stage codegen) and
    // a captured subexpression is RE-EVALUATED per element, so the
    // unbound form re-ran the regex split ~2·|words| times per document
    // (measured 5.0 s → 0.4 s for the corpus shingle expansion at sf0.1).
    // `transform(array(e), v -> body)` evaluates `e` exactly once per row.
    array_distinct(filter(
      flatten(transform(array(words), ws =>
        transform(sequence(lit(0), greatest(size(ws) - k, lit(0))),
          i => when(size(ws) >= k,
            array_join(slice(ws, i + lit(1), lit(k)), " "))))),
      s => s.isNotNull))
  }

  /** Near-dup pairs by exact n-gram Jaccard with shingle-join blocking.
    *
    * BLOCKING: candidate pairs share ≥1 shingle whose document frequency is
    * ≤ maxDf (boilerplate guard + quadratic bound — two docs overlapping
    * ONLY on boilerplate never become a candidate). SCORE: exact Jaccard
    * over the FULL shingle sets (candidate-bounded intersection join) —
    * the cap shapes candidate generation, never the score, so the output
    * agrees with minhashNearDup's exact-verify stage on shared pairs.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded 4dp.
    */
  def ngramJaccardPairs(df: DataFrame, k: Int = 5, threshold: Double = 0.5,
      maxDf: Int = 50, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Shingle explode — the expensive part — is computed ONCE and
    // materialized: it feeds `sizes`, the df-cap AND both self-join sides
    // (4 scan branches). localCheckpoint, not persist: blocks are
    // context-cleaned when the result goes out of scope, so repeated calls
    // in a long-lived session don't accumulate cached blocks.
    // Integral ids take the typed fast shingle path (Spark array HOFs are
    // interpreted; wordShinglesScala is parity-locked by MinhashParity).
    val idIsIntegral = df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    val sh0 =
      if (idIsIntegral) {
        val spark = df.sparkSession
        import spark.implicits._
        // null text drops BEFORE the typed map — the Column twin's null
        // shingle array explodes to zero rows, so this is exact parity
        // (and the tuple encoder would otherwise NPE)
        df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
          .where(col("text").isNotNull)
          .as[(Long, String)]
          .mapPartitions(_.flatMap { case (id, text) =>
            wordShinglesScala(text, k).map(s => (id, s)) })
          .toDF("id", "shingle")
      } else df.select(col(idCol).as("id"),
          explode(wordShingles(col(textCol), k)).as("shingle"))
        .where(col("shingle").isNotNull)
    val sh = graft.Materialize(sh0)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val dfCap = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val kept = sh.join(dfCap, "shingle").select("id", "shingle")
    val cand = kept.as("a").join(kept.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // exact FULL-set intersection, candidate-bounded: expand each rare
    // candidate pair by id_a's shingles, keep the ones id_b also has —
    // never a corpus² join, and the score is true Jaccard (a numerator
    // restricted to capped shingles over a full-set denominator would
    // deflate scores and miss true near-dups on boilerplate-heavy pairs)
    val inter = cand
      .join(sh.select(col("id").as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      // threshold on the UNROUNDED ratio (= what the DuckDB oracle filters
      // on); rounding happens only in the output projection
      .withColumn("jaccard_raw",
        col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .where(col("jaccard_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard_raw"), 4).as("jaccard"))
  }

  /** MinHash signature array from a PRE-COMPUTED shingle-array column:
    * sig[i] = min over shingles of xxhash64(shingle, seed=i).
    * Takes the shingles column (not the text) so the shingle build — the
    * expensive part — is evaluated once, not once per hash. */
  def minhashSignatureOf(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingles, s => xxhash64(s, lit(i))))): _*)

  /** MinHash signature from raw text (convenience; prefer the shingle-column
    * form in multi-use plans). */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column =
    minhashSignatureOf(wordShingles(text, k), numHashes)

  // ---- typed fast path (same story as FastExtract: Spark array HOFs are
  // interpreted; signature building is the curation hot loop) -------------

  /** Spark's trim() (0x20 SPACE only — Java String.trim also strips
    * tabs/newlines and would diverge) via the same UTF8String call the
    * StringTrim expression compiles to. */
  private def sparkTrim(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s).trim().toString

  /** Scala twin of wordShingles — MUST stay semantically identical
    * (DedupSpec's whitespace-parity test covers trailing \t/\n/\r).
    * split limit −1 mirrors Spark's `split(str, regex)` (which KEEPS a
    * trailing empty token after a terminal \n that the space-only trim
    * left in place — Java's default limit 0 drops it, silently changing
    * shingle-set sizes and Jaccard denominators vs the Column path and the
    * DuckDB oracle). null → no shingles (the Column twin's null array
    * explodes to zero rows). */
  def wordShinglesScala(text: String, k: Int): Seq[String] = {
    if (text == null) return Seq.empty
    val words = sparkTrim(text).split("\\s+", -1)
    if (words.length < k) Seq.empty
    else words.sliding(k).map(_.mkString(" ")).toVector.distinct
  }

  /** Scala twin of minhashSignatureOf with EXACT xxhash64 parity: calls the
    * same catalyst hash function the Column expression compiles to
    * (XxHash64Function), seeding with the hashed string like
    * `xxhash64(shingle, lit(i))` does. */
  def minhashSignatureScala(shingles: Seq[String], numHashes: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{IntegerType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val sigs = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { s =>
      val h1 = XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(i, IntegerType, h1)
        if (h < sigs(i)) sigs(i) = h
        i += 1
      }
    }
    sigs
  }

  /** (id, shingles, sig) via the typed fast path. Empty-shingle docs get an
    * empty sig (they can't participate in near-dup at this k). */
  def minhashSignaturesFast(df: DataFrame, k: Int, numHashes: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .where(col("text").isNotNull) // parity: null shingles explode to zero rows
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val sh = wordShinglesScala(text, k)
        (id, sh, if (sh.isEmpty) Array.empty[Long] else minhashSignatureScala(sh, numHashes))
      })
      .toDF("id", "shingles", "sig")
  }

  /** Near-dup candidate pairs via banded MinHash-LSH, verified by exact
    * shingle Jaccard. bands × rows must equal numHashes. Band keys are
    * hashes of signature slices; pairs agreeing on ANY band are candidates.
    */
  def minhashNearDup(df: DataFrame, k: Int = 5, numHashes: Int = 16,
      bands: Int = 8, threshold: Double = 0.5, maxBucket: Int = 2000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // shingles + signatures computed ONCE and persisted: the banding
    // self-join has 4 scan branches (2 sides × sizes/kept), and at 10^12
    // docs the signature table is exactly the stage you'd materialize.
    // Integral ids take the typed fast path (JIT-compiled signatures with
    // exact xxhash64 parity — MinhashParity test); other id types use the
    // Column-HOF path. Docs with no shingles (< k words) are dropped — they
    // cannot near-dup at this k, and keeping them would alias their empty
    // signatures into shared buckets.
    val idIsIntegral = df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    // localCheckpoint (not persist): materialized once for the 4 scan
    // branches, blocks context-cleaned when unreferenced — no CacheManager
    // leak across repeated calls (bench sweeps, resumable batch loops)
    val withSig = (
      if (idIsIntegral) minhashSignaturesFast(df, k, numHashes, idCol, textCol)
      else df
        .select(col(idCol).as("id"), wordShingles(col(textCol), k).as("shingles"))
        .withColumn("sig", minhashSignatureOf(col("shingles"), numHashes)))
      .where(size(col("shingles")) >= 1)
      .transform(d => graft.Materialize(d))
    // banding carries ONLY the id — the shingle arrays are kilobytes per
    // doc and the band explode multiplies them 8×; candidates are rare, so
    // shingles are joined back onto the (small) candidate pair set instead
    val banded = withSig.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows))): _*)).as(Seq("band", "bh")))
    // Bucket sizes are materialized once (they gate BOTH self-join sides)
    // and the cap's cost is accounted IN-OPERATOR (r3 verdict #3 — "no
    // silent caps"): dropped bucket/row counts go to Audit.warn from the
    // same tiny (band,bh)-scale table, so mining never silently loses
    // recall. Similarity.bucketStats remains the deep-dive audit.
    // Lazy checkpoint: the accounting agg below is the materializing action,
    // so sizing + accounting cost ONE serial job — deliberately run when the
    // operator is BUILT (the join needs the stored table anyway). Under
    // materialize=none the table is pure lineage and the accounting would
    // recompute the banding aggregate a second time, so it is skipped there
    // (warned, never silent).
    val sizes = graft.Materialize(banded.groupBy("band", "bh").count(), eager = false)
    if (graft.Materialize.accountingEnabled(df.sparkSession)) {
      val dropped = sizes.where(col("count") > maxBucket)
        .agg(count(lit(1)), coalesce(sum(col("count")), lit(0L))).head()
      if (dropped.getLong(0) > 0)
        graft.Audit.warn(s"minhashNearDup: dropping ${dropped.getLong(0)} " +
          s"over-cap band buckets covering ${dropped.getLong(1)} banded ids " +
          s"(maxBucket=$maxBucket); pairs found ONLY in dropped buckets are " +
          "not emitted — raise maxBucket or inspect Similarity.bucketStats")
    } else graft.Audit.warn("minhashNearDup: materialize=none — in-operator " +
      "cap accounting skipped (it would double-compute the banding " +
      "aggregate); audit caps via Similarity.bucketStats")
    val kept = banded.join(sizes.where(col("count") <= maxBucket), Seq("band", "bh"))
    val cand = kept.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(kept.select(col("band"), col("bh"), col("id").as("id_b")), Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    // verify candidates with exact shingle Jaccard (shingles joined back)
    val withShingles = cand
      .join(withSig.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(withSig.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
    val ja = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    // threshold on the unrounded ratio (matches the exact-Jaccard oracle);
    // round only in the output projection
    withShingles.withColumn("jaccard_raw", ja)
      .where(col("jaccard_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard_raw"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: bit i is the sign of
    * Σ_tokens (bit i of xxhash64(token) ? +1 : −1).
    * One pass over the tokens with an array<long> accumulator of 64 per-bit
    * set-counts, then one pack — not 64 passes. */
  def simhash(text: Column): Column = {
    val tokens = split(trim(lower(text)), "\\s+")
    val hashes = transform(tokens, t => xxhash64(t))
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    val zeros = array((0 until 64).map(_ => lit(0L)): _*)
    val bitCounts = aggregate(hashes, zeros,
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0, 1L).otherwise(0L)))
    // bit set iff count*2 >= n_tokens; pack disjoint bits by summation
    aggregate(
      zip_with(bitCounts, masks,
        (c, m) => when(c * 2 >= size(tokens), m).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** Scala twin of simhash — exact same bit votes via XxHash64Function
    * (xxhash64 single-arg = seed 42), JIT-compiled (SimhashParity test). */
  def simhashScala(text: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    // lower via UTF8String (what the Column `lower` compiles to) and split
    // limit −1 (Spark keeps a trailing empty token; Java's default drops
    // it, flipping the count*2 >= n majority at the margin)
    val tokens = sparkTrim(
      org.apache.spark.unsafe.types.UTF8String.fromString(text).toLowerCase.toString)
      .split("\\s+", -1)
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      val h = XxHash64Function.hash(UTF8String.fromString(t), StringType, 42L)
      var i = 0
      while (i < 64) { if (((h >>> i) & 1L) == 1L) counts(i) += 1; i += 1 }
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) * 2 >= tokens.length) sig |= (1L << i); i += 1 }
    sig
  }

  /** Near-dup pairs with hamming(simhash) ≤ maxHamming, found by the
    * pigeonhole principle: split the 64-bit signature into (maxHamming+1)
    * chunks — any pair within distance k agrees on ≥1 chunk exactly.
    * Integral ids take the typed fast signature path (parity-tested). */
  def simhashNearDup(df: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val idIsIntegral = df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    val withSig = (
      if (idIsIntegral) {
        val spark = df.sparkSession
        import spark.implicits._
        // null text drops here — the Column twin yields a null sig whose
        // (chunk, value) keys never equi-join, so the row can never pair
        df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
          .where(col("text").isNotNull)
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, t) => (id, simhashScala(t)) })
          .toDF("id", "sig")
      } else df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig")))
      .transform(d => graft.Materialize(d)) // config-gated materialization (see minhashNearDup)
    hammingPairs(withSig, maxHamming)
  }

  /** Collapse near-dup PAIRS into duplicate GROUPS — the step that turns
    * pair mining into an actionable dedup decision: connected components
    * over the pair graph (transitive closure: A~B ∧ B~C ⇒ one group of
    * {A,B,C}), each group labeled by its smallest member id ("keep the
    * label row, drop the rest" is then one join). Composes the existing CC
    * machinery; the input is pair-scale, not corpus-scale.
    *
    * CC propagates STRING labels under lexicographic order; integral id
    * columns are therefore encoded with the ORDER-PRESERVING sign-prefixed
    * padding (`Ids.encodeOrdered` — negatives included, unlike plain
    * zero-padding) and decoded back, so the group label is the NUMERIC
    * minimum and the output keeps the ids' integral type — callers cannot
    * silently mislabel unpadded or negative (xxhash64-shaped) ids
    * (r3 verdict #4; negative support added r4 with the Scc codec). */
  def dupGroups(pairs: DataFrame,
      idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val integral = graft.ops.Ids.integral(pairs, idA, idB)
    if (integral) {
      graft.canon.ConnectedComponents.run(
          pairs.select(graft.ops.Ids.encodeOrdered(col(idA)).as("src"),
            graft.ops.Ids.encodeOrdered(col(idB)).as("dst")))
        .select(graft.ops.Ids.decodeOrdered(col("id")).as("id"),
          graft.ops.Ids.decodeOrdered(col("component")).as("group_id"))
    } else
      graft.canon.ConnectedComponents.run(
          pairs.select(col(idA).as("src"), col(idB).as("dst")))
        .select(col("id"), col("component").as("group_id"))
  }

  /** Training-data DECONTAMINATION: flag corpus documents that share at
    * least `minHits` verbatim word k-grams with an evaluation/benchmark
    * corpus — the GPT-3 appendix-C / Pile protocol shape (13-gram overlap
    * against test sets), the step a training pipeline runs after dedup so
    * benchmark answers don't leak into the training set.
    *
    * Scale shape: the EVAL side is bounded (benchmark suites are ~10⁵–10⁷
    * n-grams, independent of corpus size) → distinct-hashed once and
    * `broadcast()` (set `broadcastEval=false` on an unusually large eval
    * corpus to let it shuffle). The CORPUS side is a narrow shingle
    * explode + hash — text never rides a shuffle, only (id, gram-hash) —
    * and the hit count partial-aggregates on the doc id. Gram identity is
    * xxhash64 (collision odds are ~n²·2⁻⁶⁴, deterministic); `minHits > 1`
    * implements the common "ignore incidental single-gram overlap" knob.
    *
    * Returns one row PER CORPUS DOC: (idCol, hits, contaminated). */
  def contamination(docs: DataFrame, evalDocs: DataFrame, k: Int = 13,
      minHits: Long = 1L, idCol: String = "doc_id", textCol: String = "text",
      evalTextCol: String = "text", broadcastEval: Boolean = true): DataFrame = {
    val evalGrams0 = evalDocs
      .select(explode(wordShingles(col(evalTextCol), k)).as("gram"))
      .select(xxhash64(col("gram")).as("gh"))
      .distinct()
    val evalGrams = if (broadcastEval) broadcast(evalGrams0) else evalGrams0
    val hits = docs
      .select(col(idCol).as("id"), explode(wordShingles(col(textCol), k)).as("gram"))
      .select(col("id"), xxhash64(col("gram")).as("gh"))
      .join(evalGrams, "gh")
      .groupBy("id").agg(count(lit(1)).as("hits"))
    docs.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) >= minHits).as("contaminated"))
  }

  /** Generic pigeonhole near-dup join over precomputed 64-bit signatures
    * `(id, sig)`: any pair at hamming ≤ maxHamming agrees EXACTLY on ≥1 of
    * the maxHamming+1 signature chunks, so candidates come from equi joins
    * on (chunk, value) — ids+sigs only ride the shuffle — and the bit_count
    * filter is exact. Shared by simhashNearDup (text) and
    * Multimodal.perceptualNearDup (dHash over decoded image rasters). */
  def hammingPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    val chunked = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until nChunks).map(c =>
        shiftrightunsigned(col("sig"), c * chunkBits)
          .bitwiseAND((1L << chunkBits) - 1)): _*)).as(Seq("chunk", "cv")))
    chunked.select(col("chunk"), col("cv"), col("id").as("id_a"), col("sig").as("sig_a"))
      .join(chunked.select(col("chunk"), col("cv"), col("id").as("id_b"), col("sig").as("sig_b")),
        Seq("chunk", "cv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Asymmetric CONTAINMENT near-dup — `c(a→b) = |S(a)∩S(b)| / |S(a)|`
    * over DISTINCT k-shingle sets: the subset/quote detector. A 100-token
    * excerpt inside a 10k-token page has Jaccard ≈ 0.01 (invisible to
    * `ngramJaccardPairs`) but containment 1.0 — exactly the duplication
    * mode that inflates training data when pages quote each other.
    *
    * Same scale shape as the Jaccard operator: df-capped shared-shingle
    * blocking (the cap bounds the block quadratic and drops boilerplate),
    * one candidate-bounded intersection count, then BOTH directions of
    * each unordered candidate are scored against their OWN set size.
    * Score is exact integer ppm (`floor(1e6·common / |S(id)|)`).
    * Returns directed rows `(id, other_id, common, n_shingles,
    * containment_ppm)` with containment ≥ thresholdPpm, id ≠ other_id. */
  def containmentPairs(df: DataFrame, k: Int = 5, thresholdPpm: Long = 500000L,
      maxDf: Int = 50, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = graft.Materialize(df
      .select(col(idCol).as("id"),
        explode(wordShingles(col(textCol), k)).as("shingle"))
      .where(col("shingle").isNotNull))
    // r6: dictionary-encode the shingles with a COLLISION-FREE integer
    // id (monotonically_increasing_id over the distinct-shingle table —
    // a bijection, so every df, blocking bucket, and co-occurrence count
    // below is unchanged); the blocking self-join and both intersection
    // joins then key on longs instead of k-token strings (§2.3).
    val vocab = graft.Materialize(
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .withColumn("tid", monotonically_increasing_id()), eager = false)
    val shT = graft.Materialize(
      sh.join(graft.Hints.bcastIf(vocab, vocab.count()), Seq("shingle"))
        .select(col("id"), col("tid"), col("df")), eager = false)
    // r6: per-doc tid ARRAYS (the SetSim verify shape) — the shingle sets
    // are distinct per doc, so |S(a)∩S(b)| is one codegen array_intersect
    // against the candidate pair instead of two shingle-scale shuffles of
    // shT (by id_a, then by (id_b, tid)) + a pair-keyed count (§2.3/§3.1).
    val rec = graft.Materialize(
      shT.groupBy("id").agg(collect_list("tid").as("tids"),
        count(lit(1)).as("sz")), eager = false)
    val nRec = rec.count()
    // records carry whole shingle arrays, so the broadcast gate is the
    // byte-aware record one (SetSim's), not Hints' narrow-row default;
    // beyond it both verify joins fall back to shuffled equi joins.
    val verifyMax = df.sparkSession.conf
      .get("spark.graft.containment.broadcastVerifyMaxRecords", "125000").toLong
    def hs(d: DataFrame): DataFrame =
      if (nRec <= verifyMax) broadcast(d) else d
    val kept = shT.where(col("df") <= maxDf).select("id", "tid")
    val cand = kept.as("a").join(kept.as("b"),
        col("a.tid") === col("b.tid") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val inter = cand
      .join(hs(rec.select(col("id").as("id_a"), col("tids").as("__ta"),
        col("sz").as("sz_a"))), "id_a")
      .join(hs(rec.select(col("id").as("id_b"), col("tids").as("__tb"),
        col("sz").as("sz_b"))), "id_b")
      .withColumn("common", size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
    val dirA = inter.select(col("id_a").as("id"), col("id_b").as("other_id"),
      col("common"), col("sz_a").as("n_shingles"))
    val dirB = inter.select(col("id_b").as("id"), col("id_a").as("other_id"),
      col("common"), col("sz_b").as("n_shingles"))
    dirA.union(dirB)
      .withColumn("containment_ppm",
        expr("1000000 * common div n_shingles").cast("long"))
      .where(col("containment_ppm") >= thresholdPpm)
  }
}
