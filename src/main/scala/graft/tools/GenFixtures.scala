package graft.tools

import graft.fixtures.InvoiceCorpus
import org.apache.spark.sql.functions._

/** Regenerates the committed expected-rows fixtures under
  * `src/test/resources/expected/` — the provenance record for every
  * fixture-parquet oracle in SparkEntry.oracleSql:
  *
  *  - q33_expected_sameas: the GENERATOR-side ground truth
  *    (InvoiceCorpus.expectedTriples — independent of the extractor/linker
  *    under test; PipelineSpec separately gates extractor-vs-generator
  *    f1 == 1.0 on this corpus).
  *  - q32_expected_raw: the GENERATOR-side ground truth for the RAW
  *    extraction (InvoiceCorpus.expectedRawTriples — surface keys, no
  *    dedup; ExtractParitySpec gates live extraction == this set).
  *  - q34_media_decode: output of the deterministic decode path (pure
  *    function of media_ref). Pins the media-table plumbing against drift;
  *    MultimodalSpec re-checks live output == fixture.
  *  - q42_expected_groups: an INDEPENDENT driver-side transcription of the
  *    reference's greedy proximity loop (geometry_utils.py:139-204 — a
  *    literal remaining-list while-loop, not the engine's groupGreedy array
  *    walk) over the generator's spans. ProximitySpec gates the engine
  *    against it.
  *  - q22_expected_pairs: a naive all-pairs hamming scan over the sf0.01
  *    documents' simhash signatures — verifies the distributed pigeonhole
  *    blocking independently (the signature function itself is separately
  *    parity-locked Column-vs-typed by SimhashParity). TIED to
  *    /root/testdata/sf0.01, the scale the driver's correctness gate runs.
  *
  * Run: sbt "runMain graft.tools.GenFixtures"
  */
object GenFixtures {

  /** Reference-literal greedy grouping (geometry_utils.py:139-204): seed a
    * group with the first REMAINING element, scan the remaining list once,
    * absorbing anything close to a current member; repeat. Kept structurally
    * distinct from tag.Proximity.groupGreedy on purpose — two independent
    * transcriptions of the same reference contract. */
  def greedyReference(centers: IndexedSeq[(Double, Double)], threshold: Double): Map[Int, Int] = {
    val remaining = scala.collection.mutable.LinkedHashSet(centers.indices: _*)
    val out = scala.collection.mutable.Map[Int, Int]()
    var g = 0
    while (remaining.nonEmpty) {
      val seed = remaining.head
      remaining.remove(seed)
      val members = scala.collection.mutable.ArrayBuffer(seed)
      out(seed) = g
      remaining.toVector.foreach { i =>
        val near = members.exists { m =>
          val dx = centers(i)._1 - centers(m)._1
          val dy = centers(i)._2 - centers(m)._2
          math.sqrt(dx * dx + dy * dy) <= threshold
        }
        if (near) { members += i; out(i) = g; remaining.remove(i) }
      }
      g += 1
    }
    out.toMap
  }

  /** Sequential-replay BPE count — the INDEPENDENT twin of
    * `ops.Bpe.Tokenizer` (which merges the lowest-rank pair present,
    * iteratively): this one replays the merge list in training order, one
    * full left-to-right pass per merge. The two strategies are provably
    * equivalent (a merge's output symbol only appears in later-ranked
    * pairs), so the committed q48 fixture computed here checks the
    * engine's encoder end to end (and BpeSpec cross-checks both on
    * adversarial strings). */
  def bpeTokensSequential(text: String, merges: Seq[(String, String)]): Vector[String] = {
    val toks = Vector.newBuilder[String]
    graft.ops.Bpe.PreTokenRegex.findAllIn(text).foreach { t =>
      if (t.length > 1 || Character.isLetter(t.charAt(0))) {
        var syms: List[String] = t.map(_.toString).toList
        merges.foreach { case (a, b) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case x :: y :: tl if x == a && y == b => out += a + b; rest = tl
            case x :: tl => out += x; rest = tl
          }
          syms = out.toList
        }
        toks ++= syms
      } else toks += t
    }
    toks.result()
  }

  def bpeCountSequential(text: String, merges: Seq[(String, String)]): Int =
    bpeTokensSequential(text, merges).length

  /** q139's tokenizer, sequentially: maximal lowercase [a-z]+ runs of the
    * lowercased text (a manual char scan, not the engine's regex). */
  def tokenizeAlpha(text: String): Vector[String] = {
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') cur.append(c)
      else if (cur.nonEmpty) { out += cur.toString(); cur.clear() }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString()
    out.result()
  }

  /** q139's independent American Soundex (Odell–Russell as in Knuth TAOCP
    * vol. 3 §6, the US-Census variant): first letter kept; B F P V→1,
    * C G J K Q S X Z→2, D T→3, L→4, M N→5, R→6; H and W are TRANSPARENT
    * (a letter with the same code as the letter before an intervening
    * h/w is still a duplicate and drops); vowels A E I O U Y carry no code
    * but BREAK runs; zero-padded/truncated to 4. Shares no code with
    * Spark's built-in soundex expression, which the engine path uses. */
  def soundexSequential(word: String): String = {
    def code(c: Char): Int = c match {
      case 'b' | 'f' | 'p' | 'v' => 1
      case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => 2
      case 'd' | 't' => 3
      case 'l' => 4
      case 'm' | 'n' => 5
      case 'r' => 6
      case _ => 0 // vowels + h w y
    }
    val w = word.toLowerCase(java.util.Locale.ROOT)
    require(w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'),
      s"soundexSequential expects an ascii-alpha word, got '$word'")
    val sb = new StringBuilder
    sb.append(w.charAt(0).toUpper)
    var last = code(w.charAt(0)) // the first letter's code seeds the run
    var i = 1
    while (i < w.length && sb.length < 4) {
      val c = w.charAt(i)
      val k = code(c)
      if (k != 0 && k != last) sb.append(('0' + k).toChar)
      if (c != 'h' && c != 'w') last = k // h/w transparent, vowels reset
      i += 1
    }
    while (sb.length < 4) sb.append('0')
    sb.toString()
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.run.Sessions.local(4, 8, "gen-fixtures")
    import spark.implicits._
    val out = "src/test/resources/expected"

    InvoiceCorpus.expectedTriples(spark, 200).toDF()
      .where(col("pred") === "sameAs")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q33_sameas_dir")

    InvoiceCorpus.expectedRawTriples(spark, 200).toDF()
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q32_raw_dir")

    graft.ops.Multimodal.decodeAndFeaturize(
        graft.fixtures.MediaFixtures.mediaTable(InvoiceCorpus.docs(spark, 200).toDF())).toDF()
      .select("media_ref", "kind", "width", "height", "n_frames")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q34_media_dir")

    // q42: reference-literal greedy over the generator's spans (driver-side,
    // 200 docs × tens of spans)
    val groups = (0L until 200L).flatMap { i =>
      val r = InvoiceCorpus.record(i)
      val spans = InvoiceCorpus.spansOf(r).sortBy(_.offset).toIndexedSeq
      val centers = spans.map(s => (s.bbox.x + s.bbox.w / 2.0, s.bbox.y + s.bbox.h / 2.0))
      val g = greedyReference(centers, 50.0)
      spans.indices.map(ix => (r.docId, spans(ix).offset, g(ix)))
    }
    spark.createDataset(groups).toDF("doc_id", "offset", "group_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q42_groups_dir")

    // q22: naive O(n²) hamming scan over sf0.01 documents (500 docs)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val sigs = docs.map { case (id, t) => (id, graft.ops.Dedup.simhashScala(t)) }
    val pairs = for {
      a <- sigs.indices.iterator
      b <- (a + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(a)._2 ^ sigs(b)._2)
      if h <= 3
    } yield (sigs(a)._1, sigs(b)._1, h)
    spark.createDataset(pairs.toVector).toDF("id_a", "id_b", "hamming")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q22_pairs_dir")

    // q48: independent sequential-replay BPE counts over the sf0.01
    // documents with the committed merge table (see bpeCountSequential)
    spark.createDataset(docs.map { case (id, t) =>
        (id, bpeCountSequential(t, graft.ops.Bpe.defaultMerges)) }.toVector)
      .toDF("doc_id", "n_tokens_bpe")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q48_bpe_dir")

    // q130: the same sequential replay, emitting the token SEQUENCES the
    // engine's greedy encoder must reproduce position for position
    spark.createDataset(docs.flatMap { case (id, t) =>
        bpeTokensSequential(t, graft.ops.Bpe.defaultMerges)
          .zipWithIndex.map { case (s130, i) => (id, i, s130) } }.toVector)
      .toDF("doc_id", "pos", "token")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q130_bpe_tokens_dir")

    // q45: live output of the P8 quality pipeline (pure fn of media_ref;
    // drift-guarded by ImageQualitySpec — q34's justification)
    graft.SparkEntry.queries("q45_image_quality")(spark, "/root/testdata/sf0.01")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q45_quality_dir")

    // q46: real audio/video decode outputs (pure fn of media_ref —
    // WAV/AVI payloads are; same justification as q34/q45)
    graft.SparkEntry.queries("q46_av_decode")(spark, "/root/testdata/sf0.01")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q46_av_dir")

    // q37/q24: the hyperplane LSH is fully DETERMINISTIC (xxhash64-parity
    // planes), so the expected outputs are computable by an independent
    // driver-side scan: buckets via lshBucketsScala (itself parity-locked
    // Column-vs-typed by LshParity), candidates by shared-bucket test over
    // ALL pairs, exact left-fold cosine — verifying the distributed band
    // join / dedup / rank plumbing against naive code.
    {
      import graft.ops.Similarity
      val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        s
      }
      def r4(x: Double): Double =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      def cos(a: Array[Float], na: Double, b: Array[Float], nb: Double): Double =
        if (na * nb == 0) 0.0 else dot(a, b) / (na * nb)
      val norms = emb.map { case (_, v) => math.sqrt(dot(v, v)) }

      // q37: neardupPairs(threshold=0.2, planes=2, tables=12)
      val s37 = Similarity.lshSignsMatrix(emb.head._2.length, 2, 12)
      val b37 = emb.map { case (_, v) => Similarity.lshBucketsScala(v, s37, 2, 12) }
      val pairs37 = for {
        i <- emb.indices.iterator
        j <- (i + 1) until emb.length
        if b37(i).zip(b37(j)).exists { case (x, y) => x == y }
        s = cos(emb(i)._2, norms(i), emb(j)._2, norms(j))
        if s >= 0.2
      } yield (emb(i)._1, emb(j)._1, r4(s))
      spark.createDataset(pairs37.toVector).toDF("id_a", "id_b", "sim")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q37_pairs_dir")

      // q24: lshTopK(k=5, planes=4, tables=4, queries = vec_id < 8)
      val s24 = Similarity.lshSignsMatrix(emb.head._2.length, 4, 4)
      val b24 = emb.map { case (_, v) => Similarity.lshBucketsScala(v, s24, 4, 4) }
      val top24 = emb.indices.filter(emb(_)._1 < 8).flatMap { qi =>
        val cands = emb.indices.filter(ci => ci != qi &&
          b24(qi).zip(b24(ci)).exists { case (x, y) => x == y })
        cands.map(ci => (emb(ci)._1, r4(cos(emb(qi)._2, norms(qi), emb(ci)._2, norms(ci)))))
          .sortBy { case (id, s) => (-s, id) }
          .take(5).zipWithIndex
          .map { case ((id, s), rk) => (emb(qi)._1, id, rk + 1, s) }
      }
      spark.createDataset(top24).toDF("query_id", "neighbor_id", "rank", "sim")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q24_topk_dir")

      // q43: ivfTopK(k=5, nCentroids=16, nprobe=4, deterministic
      // quantizer). The quantizer (driver Lloyd's, seeded, id-sorted
      // sample) is the shared SPEC of the codebook; the inverted-list
      // assignment, probe-set selection, exact rerank and ranking below
      // are an independent naive transcription of IVF search.
      val centers43 = Similarity.ivfCentroidsDeterministic(
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"), 16)
      def d2(a: Array[Float], c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val x = a(i) - c(i); s += x * x; i += 1 }
        s
      }
      val assign43 = emb.map { case (_, v) =>
        centers43.indices.minBy(c => (d2(v, centers43(c)), c))
      }
      val top43 = emb.indices.filter(emb(_)._1 < 8).flatMap { qi =>
        val probes = centers43.indices
          .sortBy(c => (d2(emb(qi)._2, centers43(c)), c)).take(4).toSet
        emb.indices.filter(ci => ci != qi && probes(assign43(ci)))
          .map(ci => (emb(ci)._1, r4(cos(emb(qi)._2, norms(qi), emb(ci)._2, norms(ci)))))
          .sortBy { case (id, s) => (-s, id) }
          .take(5).zipWithIndex
          .map { case ((id, s), rk) => (emb(qi)._1, id, rk + 1, s) }
      }
      spark.createDataset(top43).toDF("query_id", "neighbor_id", "rank", "sim")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q43_topk_dir")

      // q53: pqTopK(k=5, m=8, codebookSize=16, rerankFactor=3). The
      // codebooks (pqCodebooks — deterministic driver Lloyd's per subspace)
      // are the shared SPEC; the encode, ADC tables, shortlist selection
      // and exact rerank below are an independent naive transcription of
      // PQ search (plain loops over all rows, no DataFrames).
      val books53 = Similarity.pqCodebooks(
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"), 8, 16)
      val m53 = books53.length
      val sub53 = books53(0)(0).length
      def dsub(v: Array[Float], j: Int, c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < sub53) { val x = v(j * sub53 + i) - c(i); s += x * x; i += 1 }
        s
      }
      val codes53 = emb.map { case (_, v) =>
        Array.tabulate(m53)(j => books53(j).indices.minBy(c => (dsub(v, j, books53(j)(c)), c)))
      }
      def adcDot(q: Array[Float], ci: Int): Double = {
        // per-subspace subtotal THEN the outer sum — the same fp grouping
        // as the engine's lut(j) construction + Σ_j lut lookup, so boundary
        // candidates cannot flip on a 1-ulp summation-order difference
        var s = 0.0; var j = 0
        while (j < m53) {
          val cw = books53(j)(codes53(ci)(j))
          var d = 0.0; var x = 0
          while (x < sub53) { d += q(j * sub53 + x).toDouble * cw(x); x += 1 }
          s += d
          j += 1
        }
        s
      }
      val top53 = emb.indices.filter(emb(_)._1 < 8).flatMap { qi =>
        val qv = emb(qi)._2
        val adc = emb.indices.filter(_ != qi).map { ci =>
          val s = if (norms(qi) * norms(ci) == 0) 0.0
                  else adcDot(qv, ci) / (norms(qi) * norms(ci))
          (emb(ci)._1, ci, s)
        }
        adc.sortBy { case (id, _, s) => (-s, id) }.take(5 * 3)
          .map { case (id, ci, _) => (id, r4(cos(qv, norms(qi), emb(ci)._2, norms(ci)))) }
          .sortBy { case (id, s) => (-s, id) }
          .take(5).zipWithIndex
          .map { case ((id, s), rk) => (emb(qi)._1, id, rk + 1, s) }
      }
      spark.createDataset(top53).toDF("query_id", "neighbor_id", "rank", "sim")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q53_topk_dir")

      // q55: semdedup(threshold=0.2, nCentroids=8). The quantizer
      // (deterministic driver Lloyd's) is the shared SPEC of the
      // clustering; the assignment, within-cluster all-pairs cosine,
      // transitive closure (plain union-find) and lowest-centroid-cosine
      // keep rule below are an independent naive transcription of the
      // SemDeDup algorithm — no DataFrames, no shared engine plumbing.
      val centers55 = Similarity.ivfCentroidsDeterministic(
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"), 8)
      val assign55 = emb.map { case (_, v) =>
        centers55.indices.minBy(c => (d2(v, centers55(c)), c))
      }
      val csim55 = emb.indices.map { i =>
        val v = emb(i)._2; val ctr = centers55(assign55(i))
        var d = 0.0; var cq = 0.0; var x = 0
        while (x < v.length) { d += v(x).toDouble * ctr(x); cq += ctr(x) * ctr(x); x += 1 }
        val cn = math.sqrt(cq)
        if (norms(i) * cn == 0) 0.0 else d / (norms(i) * cn)
      }
      val parent55 = Array.tabulate(emb.length)(identity)
      def find55(x: Int): Int = {
        var r = x; while (parent55(r) != r) r = parent55(r)
        var c = x
        while (parent55(c) != r) { val n = parent55(c); parent55(c) = r; c = n }
        r
      }
      for {
        i <- emb.indices
        j <- (i + 1) until emb.length
        if assign55(i) == assign55(j) &&
          cos(emb(i)._2, norms(i), emb(j)._2, norms(j)) >= 0.2
      } {
        val (ri, rj) = (find55(i), find55(j))
        if (ri != rj) parent55(math.max(ri, rj)) = math.min(ri, rj)
      }
      val byGroup55 = emb.indices.groupBy(find55)
      val rows55 = emb.indices.map { i =>
        val members = byGroup55(find55(i))
        // group label = lowest member id; keeper = lowest (raw centroid
        // cosine, id) — the paper's diversity-preserving representative
        val gid = members.map(emb(_)._1).min
        val keeper = members.minBy(m => (csim55(m), emb(m)._1))
        (emb(i)._1, assign55(i), r4(csim55(i)), gid, i == keeper)
      }
      spark.createDataset(rows55)
        .toDF("vec_id", "cluster_id", "centroid_sim", "group_id", "keep")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q55_semdedup_dir")

      // q153: mutual-nearest-neighbor alignment of the even-id vs odd-id
      // halves — an independent naive double loop (best-in-B per a, best-
      // in-A per b, keep agreements); same r4 rounding + (sim desc, id asc)
      // tie rule as the engine's window ranks.
      {
        val aIdx = emb.indices.filter(i => emb(i)._1 % 2 == 0)
        val bIdx = emb.indices.filter(i => emb(i)._1 % 2 == 1)
        def best(from: Int, pool: Seq[Int]): Long =
          pool.map(p => (emb(p)._1, r4(cos(emb(from)._2, norms(from),
              emb(p)._2, norms(p)))))
            .minBy { case (id, s) => (-s, id) }._1
        val bestB = aIdx.map(i => emb(i)._1 -> best(i, bIdx)).toMap
        val bestA = bIdx.map(i => emb(i)._1 -> best(i, aIdx)).toMap
        val idToIdx = emb.indices.map(i => emb(i)._1 -> i).toMap
        val mutual = bestB.toSeq.collect {
          case (ia, ib) if bestA(ib) == ia =>
            val (i, j) = (idToIdx(ia), idToIdx(ib))
            (ia, ib, r4(cos(emb(i)._2, norms(i), emb(j)._2, norms(j))))
        }
        spark.createDataset(mutual.toVector).toDF("id_a", "id_b", "sim")
          .coalesce(1).write.mode("overwrite").parquet(s"$out/q153_mutual_dir")
      }
    }

    // q56: fixed-point PageRank over the part co-order graph. The engine's
    // arithmetic spec (PageRank scaladoc: truncating `div`, exact long
    // sums, in-plan dangling redistribution) is replayed here as plain
    // sequential loops over driver adjacency maps — an independent
    // implementation sharing no engine plumbing. Bit-equality is the
    // point: integer PageRank has exactly one correct answer.
    {
      val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
        .as[(Long, Long)].collect()
      val edges = li.groupBy(_._1).valuesIterator.flatMap { grp =>
        val parts = grp.map(_._2).toVector
        for (a <- parts; b <- parts; if a != b) yield (a, b)
      }.toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toVector.sorted
      val n = nodes.length.toLong
      val idx = nodes.zipWithIndex.toMap
      val outDeg = new Array[Long](nodes.length)
      edges.foreach { case (s56, _) => outDeg(idx(s56)) += 1L }
      val scale = 1000000000000L
      val init = scale / n
      val base = (15L * init) / 100L
      var rank = Array.fill(nodes.length)(init)
      for (_ <- 0 until 5) {
        val inSum = new Array[Long](nodes.length)
        edges.foreach { case (s56, d56) =>
          inSum(idx(d56)) += rank(idx(s56)) / outDeg(idx(s56))
        }
        var dangling = 0L
        nodes.indices.foreach(i => if (outDeg(i) == 0L) dangling += rank(i))
        val dShare = dangling / n
        rank = Array.tabulate(nodes.length)(i =>
          base + (85L * (inSum(i) + dShare)) / 100L)
      }
      spark.createDataset(nodes.indices.map(i => (nodes(i), rank(i))))
        .toDF("part_id", "rank_fp")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q56_pagerank_dir")
    }

    // q61: deterministic DeepWalk walks over the part co-order graph.
    // Independent sequential replay: driver adjacency maps + a plain while
    // loop. The step rule's hash (xxhash64 chain) is the engine-wide keyed
    // PRNG primitive — shared like q52's fingerprint — but the walk logic
    // (neighbor sorting, selection, halting) shares no engine plumbing.
    {
      import org.apache.spark.sql.catalyst.expressions.XxHash64Function
      import org.apache.spark.sql.types.LongType
      val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
        .as[(Long, Long)].collect()
      val edges = li.groupBy(_._1).valuesIterator.flatMap { grp =>
        val parts = grp.map(_._2).toVector
        for (a <- parts; b <- parts; if a != b) yield (a, b)
      }.toSet
      val adj = edges.groupBy(_._1)
        .map { case (k, v) => (k, v.map(_._2).toVector.sorted) }
      val startIds = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
        .select(col("p_partkey").cast("long")).as[Long].collect()
        .filter(_ % 40 == 0).distinct.sorted
      val seed = 7L
      val len = 8
      val rows = startIds.toSeq.flatMap { w =>
        val path = scala.collection.mutable.ArrayBuffer(w)
        var cur = w
        var s61 = 1
        var halted = false
        while (s61 <= len && !halted) {
          adj.get(cur) match {
            case Some(nbrs) =>
              var h = XxHash64Function.hash(seed, LongType, 42L)
              h = XxHash64Function.hash(w, LongType, h)
              h = XxHash64Function.hash(s61.toLong, LongType, h)
              cur = nbrs((((h % nbrs.length) + nbrs.length) % nbrs.length).toInt)
              path += cur
            case None => halted = true
          }
          s61 += 1
        }
        path.toSeq.zipWithIndex.map { case (node, i) => (w, i, node) }
      }
      spark.createDataset(rows).toDF("walk_id", "step", "node")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q61_walks_dir")
    }

    // q65: node2vec biased walks over the part co-order graph (p=4,
    // q=0.25, length 8, seed 7). Independent sequential replay: driver
    // adjacency maps + a directed edge SET for the neighbor-of-prev test
    // + Math.log Efraimidis–Spirakis argmax — plain loops, no engine
    // plumbing beyond the shared xxhash64 primitive.
    {
      import org.apache.spark.sql.catalyst.expressions.XxHash64Function
      import org.apache.spark.sql.types.LongType
      val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
        .as[(Long, Long)].collect()
      val dir = li.groupBy(_._1).valuesIterator.flatMap { grp =>
        val parts = grp.map(_._2).toVector
        for (a <- parts; b <- parts; if a != b) yield (a, b)
      }.toSet
      val adj = dir.groupBy(_._1)
        .map { case (k, v) => (k, v.map(_._2).toVector.distinct.sorted) }
      val startIds = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
        .select(col("p_partkey").cast("long")).as[Long].collect()
        .filter(_ % 40 == 0).distinct.sorted
      val (p65, q65, seed65, len65) = (4.0, 0.25, 7L, 8)
      val m65 = 1L << 52
      val rows65 = startIds.toSeq.flatMap { w =>
        val path = scala.collection.mutable.ArrayBuffer(w)
        var prev = w
        var cur = w
        var st = 1
        var halted = false
        while (st <= len65 && !halted) {
          adj.get(cur) match {
            case Some(nbrs) =>
              val best = nbrs.map { c =>
                var h = XxHash64Function.hash(seed65, LongType, 42L)
                h = XxHash64Function.hash(w, LongType, h)
                h = XxHash64Function.hash(st.toLong, LongType, h)
                h = XxHash64Function.hash(c, LongType, h)
                val u = (java.lang.Math.floorMod(h, m65) + 1).toDouble / m65.toDouble
                val wt = if (c == prev) 1.0 / p65
                         else if (dir((prev, c))) 1.0
                         else 1.0 / q65
                (math.log(u) / wt, c)
              }.max
              prev = cur; cur = best._2; path += cur
            case None => halted = true
          }
          st += 1
        }
        path.toSeq.zipWithIndex.map { case (node, i) => (w, i, node) }
      }
      spark.createDataset(rows65).toDF("walk_id", "step", "node")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q65_biased_dir")
    }

    // q68: coreness of the part co-order graph by the CLASSIC
    // Batagelj–Žaveršnik peeling (sequential min-degree removal, ties to
    // smallest id) — a genuinely different algorithm from the engine's
    // synchronous h-index iteration; both provably converge to coreness.
    {
      val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
        .as[(Long, Long)].collect()
      val und = li.groupBy(_._1).valuesIterator.flatMap { grp =>
        val parts = grp.map(_._2).toVector
        for (a <- parts; b <- parts; if a < b) yield (a, b)
      }.toSet
      val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
      und.foreach { case (x, y) =>
        adj.getOrElseUpdate(x, scala.collection.mutable.Set()) += y
        adj.getOrElseUpdate(y, scala.collection.mutable.Set()) += x
      }
      val core = scala.collection.mutable.Map[Long, Int]()
      var k = 0
      while (adj.nonEmpty) {
        val v = adj.keys.minBy(n => (adj(n).size, n))
        k = math.max(k, adj(v).size)
        core(v) = k
        adj(v).foreach { u => adj(u) -= v }
        adj -= v
      }
      spark.createDataset(core.toSeq).toDF("part_id", "coreness")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q68_coreness_dir")
    }

    // q64: deterministic synchronous label propagation over the part
    // co-order graph. Independent sequential replay: driver adjacency
    // maps, per-round neighbor-label vote counting with (max count, min
    // label) tie-break — no engine plumbing at all.
    {
      val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
        .as[(Long, Long)].collect()
      val und = li.groupBy(_._1).valuesIterator.flatMap { grp =>
        val parts = grp.map(_._2).toVector
        for (a <- parts; b <- parts; if a < b) yield (a, b)
      }.toSet
      val adj = (und.toSeq.map(e => (e._1, e._2)) ++ und.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).distinct) }
      var labels = adj.keys.map(k => (k, k)).toMap
      for (_ <- 0 until 4) {
        labels = adj.map { case (v, nbrs) =>
          val counts = nbrs.map(labels).groupBy(identity)
            .map { case (l, occ) => (l, occ.size) }
          (v, counts.toSeq.maxBy { case (l, n) => (n.toLong, -l) }._1)
        }
      }
      spark.createDataset(labels.toSeq).toDF("part_id", "community")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q64_communities_dir")
    }

    // q115: minimum spanning forest of the weighted customer graph. The
    // engine's Borůvka rounds are replayed by a sequential KRUSKAL under
    // the same (w, src, dst) total order — a genuinely different algorithm
    // (global edge sort + union-find, no component rounds); under a total
    // order the forest is unique, so the two must agree edge-for-edge.
    {
      val cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
        .select(col("c_custkey").cast("long")).as[Long].collect()
      val raw = cust.filter(_ > 1).map(k => (s"c${k / 2}", s"c$k", k % 7 + 1)) ++
        cust.filter(_ > 3).map(k => (s"c${k / 4}", s"c$k", k % 5 + 1))
      val es = raw.filter(e => e._1 != e._2)
        .map(e => if (e._1 <= e._2) e else (e._2, e._1, e._3))
        .groupBy(e => (e._1, e._2)).map { case (_, g) => g.minBy(_._3) }
        .toSeq.sortBy(e => (e._3, e._1, e._2))
      val parent = scala.collection.mutable.Map[String, String]()
      def find115(x: String): String = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find115(p); parent(x) = r; r }
      }
      val mst = es.filter { case (u, v, _) =>
        val (ru, rv) = (find115(u), find115(v))
        if (ru != rv) { parent(ru) = rv; true } else false
      }
      spark.createDataset(mst).toDF("src", "dst", "w")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q115_mst_dir")
    }

    // q116: integer HITS over the directed customer graph, replayed as a
    // plain sequential adjacency-map loop with the engine's arithmetic
    // spec (exact long sums; re-scale by q = max(1, max div SCALE) after
    // each half-step). Bit-equality is the point.
    {
      val cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
        .select(col("c_custkey").cast("long")).as[Long].collect()
      val es = (cust.filter(_ > 1).map(k => (s"c$k", s"c${k / 2}")) ++
        cust.filter(_ > 3).map(k => (s"c$k", s"c${k / 4}"))).distinct.toSeq
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val outN = es.groupBy(_._1)
      val inN = es.groupBy(_._2)
      val scale116 = 1000000L
      var hub = nodes.map(_ -> scale116).toMap
      var auth = hub
      def rescale116(m: Map[String, Long]): Map[String, Long] = {
        val mx = if (m.isEmpty) 0L else m.values.max
        val q = math.max(1L, mx / scale116)
        if (q == 1L) m else m.map { case (k, v) => k -> v / q }
      }
      for (_ <- 0 until 4) {
        auth = rescale116(nodes.map(v =>
          v -> inN.getOrElse(v, Seq.empty).map(e => hub(e._1)).sum).toMap)
        hub = rescale116(nodes.map(u =>
          u -> outN.getOrElse(u, Seq.empty).map(e => auth(e._2)).sum).toMap)
      }
      spark.createDataset(nodes.map(v => (v, hub(v), auth(v))))
        .toDF("id", "hub_fp", "auth_fp")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q116_hits_dir")
    }

    // q121/q122/q123 share the customer graph (tree child→parent +
    // grandparent shortcuts) — build it once, driver-side
    val custKeys = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select(col("c_custkey").cast("long")).as[Long].collect()
    val custEdges = (custKeys.filter(_ > 1).map(k => (s"c$k", s"c${k / 2}")) ++
      custKeys.filter(_ > 3).map(k => (s"c$k", s"c${k / 4}"))).distinct.toSeq

    // q121: sequential Brandes (per-source BFS + descending-level
    // accumulation over driver adjacency maps) with the engine's
    // fixed-point spec: exact long σ sums, per-edge term
    // floor(σ_u · (S + δ_v) / σ_v). Independent of the engine's
    // multi-source frontier loop; bit-equality is the point.
    {
      val S121 = 1000000L
      val sources = custKeys.filter(_ % 80 == 0).map(k => s"c$k").toSeq
      val adj = custEdges.groupBy(_._1).map { case (k, g) => k -> g.map(_._2) }
      val acc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val nSrc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for (s121 <- sources.distinct) {
        val dist = scala.collection.mutable.Map(s121 -> 0)
        val sigma = scala.collection.mutable.Map(s121 -> 1L)
        var frontier = Seq(s121)
        var d = 0
        while (frontier.nonEmpty) {
          d += 1
          val contrib = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
          frontier.foreach(u => adj.getOrElse(u, Nil).foreach { v =>
            if (!dist.contains(v)) contrib(v) += sigma(u)
          })
          frontier = contrib.keys.toSeq.sorted
          frontier.foreach { v => dist(v) = d; sigma(v) = contrib(v) }
        }
        val delta = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        val maxD = if (dist.isEmpty) 0 else dist.values.max
        for (level <- (maxD - 1) to 0 by -1;
             u <- dist.keys.toSeq.sorted if dist(u) == level;
             v <- adj.getOrElse(u, Nil) if dist.get(v).contains(level + 1))
          delta(u) += sigma(u) * (S121 + delta(v)) / sigma(v)
        delta.foreach { case (v, dl) =>
          if (v != s121 && dl > 0) { acc(v) += dl; nSrc(v) += 1L }
        }
      }
      spark.createDataset(acc.keys.toSeq.sorted.map(v => (v, acc(v), nSrc(v))))
        .toDF("id", "bc_fp", "n_sources")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q121_betweenness_dir")
    }

    // q122: sequential Luby replay — shares only the xxhash64 priority
    // VALUES (read back once through Spark, the engine-wide keyed PRNG);
    // the selection/removal logic is a plain driver loop.
    {
      val und = custEdges.flatMap(e => Seq(e, e.swap)).distinct
      val ids = und.map(_._1).distinct
      val prio = ids.toDF("id").select(col("id"), xxhash64(col("id")).as("h"))
        .as[(String, Long)].collect().toMap
      val tupleLt = Ordering.Tuple2[Long, String]
      var live = und.toSet
      val rounds = scala.collection.mutable.Map[String, Int]()
      var round = 0
      while (live.nonEmpty) {
        round += 1
        val winners = live.map(_._1).filter { a =>
          live.filter(_._1 == a).forall { case (_, b) =>
            tupleLt.lt((prio(a), a), (prio(b), b)) }
        }
        winners.foreach(w => rounds(w) = round)
        val dead = winners ++ live.filter(e => winners(e._1)).map(_._2)
        live = live.filter(e => !dead(e._1) && !dead(e._2))
      }
      ids.foreach { v =>
        if (!rounds.contains(v) &&
          !und.exists { case (a, b) => a == v && rounds.contains(b) })
          rounds(v) = 0
      }
      spark.createDataset(rounds.toSeq.sortBy(_._1)).toDF("id", "round")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q122_mis_dir")
    }

    // q123: sequential 3-truss peel — naive per-round triangle recount
    // over driver sets, remove-below-threshold to the fixpoint.
    {
      var edges123 = custEdges.map(e => if (e._1 <= e._2) e else e.swap).distinct.toSet
      def supports(s: Set[(String, String)]): Map[(String, String), Long] = {
        val adj = scala.collection.mutable.Map[String, Set[String]]().withDefaultValue(Set())
        s.foreach { case (u, v) => adj(u) += v; adj(v) += u }
        s.map { case (u, v) => (u, v) -> (adj(u) & adj(v)).size.toLong }.toMap
      }
      var stable = false
      while (!stable) {
        val sup = supports(edges123)
        val kept = edges123.filter(e => sup(e) >= 1) // k = 3 → support ≥ 1
        stable = kept == edges123
        edges123 = kept
      }
      val supF = supports(edges123)
      spark.createDataset(edges123.toSeq.sorted.map(e => (e._1, e._2, supF(e))))
        .toDF("src", "dst", "support")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q123_ktruss_dir")
    }

    // q139: independent sequential American Soundex (Odell & Russell's
    // patent rules as published in Knuth TAOCP vol. 3 §6 — code map,
    // H/W transparency, vowel separators, zero-pad to 4) over the distinct
    // lowercase alphabetic tokens of the sf0.01 documents; the engine path
    // uses Spark's BUILT-IN soundex expression, so the two implementations
    // share no code at all.
    {
      val tokens = docs.iterator.flatMap { case (_, t) =>
        tokenizeAlpha(t)
      }.filter(_.length >= 3).toVector.distinct.sorted
      spark.createDataset(tokens.map(w => (w, soundexSequential(w))))
        .toDF("token", "skey")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q139_soundex_dir")
    }

    // q142: independent sequential replay of the unigram-LM Viterbi
    // contract (ops.Subword doc): FORWARD DP with parent recording —
    // ascending j, strict improvement only, so the recorded parent is the
    // smallest j achieving the minimum (the engine reconstructs BACKWARD
    // under the same tie rule; same unique answer, different program).
    {
      val vocab = graft.ops.Subword.defaultVocab
      val maxLen = vocab.keys.map(_.length).max
      def segSeq(w: String): (String, Int, Long) = {
        val n = w.length
        val dp = Array.fill(n + 1)(Long.MaxValue / 2); dp(0) = 0L
        val parent = Array.fill(n + 1)(-1)
        for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
          val piece = w.substring(j, i)
          val c = vocab.get(piece) match {
            case Some(x) => x
            case None if piece.length == 1 => graft.ops.Subword.CharCost
            case None => Long.MaxValue / 4
          }
          if (c < Long.MaxValue / 4 && dp(j) + c < dp(i)) {
            dp(i) = dp(j) + c; parent(i) = j
          }
        }
        val ps = scala.collection.mutable.ListBuffer.empty[String]
        var i = n
        while (i > 0) { ps.prepend(w.substring(parent(i), i)); i = parent(i) }
        (ps.mkString("|"), ps.length, dp(n))
      }
      val toks = docs.iterator.flatMap(d => tokenizeAlpha(d._2))
        .filter(_.length >= 3).toVector.distinct.sorted
      spark.createDataset(toks.map { w =>
          val (p, np, c) = segSeq(w); (w, p, np, c) })
        .toDF("token", "pieces", "n_pieces", "cost_fp")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q142_subword_dir")
    }

    // q156: independent sequential replay of the local-min matching rule
    // over the customer graph — mutable edge list + per-node min scans
    // (the engine loops node-keyed MIN aggregates + anti joins); same
    // portable hash, same (p, a, b) tuple order, same unique fixpoint.
    {
      def phash(s: String): Long = {
        var h = 0L
        s.foreach(c => h = (h * 31 + c.toLong) % 2147483647L)
        h = (h * 48271L + 12345L) % 2147483647L
        (h * 69621L + 54321L) % 2147483647L
      }
      var live = custEdges.map(e => if (e._1 <= e._2) e else e.swap)
        .filter(e => e._1 != e._2).distinct
        .map { case (a, b) => (phash(s"$a|$b"), a, b) }
      val matched = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
      while (live.nonEmpty) {
        val nodeMin = scala.collection.mutable.Map.empty[String, (Long, String, String)]
        live.foreach { e =>
          Seq(e._2, e._3).foreach { n =>
            val cur = nodeMin.get(n)
            val key = (e._1, e._2, e._3)
            if (cur.isEmpty || Ordering[(Long, String, String)].lt(key, cur.get))
              nodeMin(n) = key
          }
        }
        val wins = live.filter(e =>
          nodeMin(e._2) == e && nodeMin(e._3) == e)
        matched ++= wins
        val gone = wins.flatMap(e => Seq(e._2, e._3)).toSet
        live = live.filterNot(e => gone(e._2) || gone(e._3))
      }
      spark.createDataset(matched.toVector.map(e => (e._2, e._3, e._1)))
        .toDF("a", "b", "priority")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q156_matching_dir")
    }

    // q165: independent sequential replay of Jones–Plassmann coloring —
    // the classic equivalence: greedy mex over already-colored neighbors
    // in DECREASING (priority, id) order computes exactly the parallel
    // rounds' result; round(v) = 1 + max round of v's higher-(p,id)
    // neighbors. Same portable node hash as the engine's priorities.
    {
      def phash(s: String): Long = {
        var h = 0L
        s.foreach(c => h = (h * 31 + c.toLong) % 2147483647L)
        h = (h * 48271L + 12345L) % 2147483647L
        (h * 69621L + 54321L) % 2147483647L
      }
      val und = custEdges.map(e => if (e._1 <= e._2) e else e.swap)
        .filter(e => e._1 != e._2).distinct
      val nbrs = und.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).toSet }
      val order = nbrs.keys.toVector.sortWith { (x, y) =>
        val px = phash(x); val py = phash(y)
        px > py || (px == py && x > y)
      }
      val color = scala.collection.mutable.Map.empty[String, Int]
      val wave = scala.collection.mutable.Map.empty[String, Int]
      order.foreach { v =>
        val done = nbrs(v).filter(color.contains) // exactly the higher nbrs
        val used = done.map(color)
        color(v) = Iterator.from(0).find(c => !used.contains(c)).get
        wave(v) = if (done.isEmpty) 1 else done.map(wave).max + 1
      }
      spark.createDataset(order.map(v => (v, color(v), wave(v))))
        .toDF("id", "color", "round")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/q165_coloring_dir")
    }

    // flatten the single part files to stable names
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    Seq("q33_sameas" -> "q33_expected_sameas.parquet",
        "q32_raw" -> "q32_expected_raw.parquet",
        "q34_media" -> "q34_media_decode.parquet",
        "q42_groups" -> "q42_expected_groups.parquet",
        "q22_pairs" -> "q22_expected_pairs.parquet",
        "q45_quality" -> "q45_image_quality.parquet",
        "q37_pairs" -> "q37_expected_pairs.parquet",
        "q24_topk" -> "q24_expected_topk.parquet",
        "q43_topk" -> "q43_expected_topk.parquet",
        "q53_topk" -> "q53_expected_topk.parquet",
        "q55_semdedup" -> "q55_expected_semdedup.parquet",
        "q56_pagerank" -> "q56_expected_pagerank.parquet",
        "q46_av" -> "q46_av_decode.parquet",
        "q48_bpe" -> "q48_expected_bpe.parquet",
        "q61_walks" -> "q61_expected_walks.parquet",
        "q64_communities" -> "q64_expected_communities.parquet",
        "q65_biased" -> "q65_expected_biased_walks.parquet",
        "q68_coreness" -> "q68_expected_coreness.parquet",
        "q115_mst" -> "q115_expected_mst.parquet",
        "q116_hits" -> "q116_expected_hits.parquet",
        "q121_betweenness" -> "q121_expected_betweenness.parquet",
        "q122_mis" -> "q122_expected_mis.parquet",
        "q123_ktruss" -> "q123_expected_ktruss.parquet",
        "q130_bpe_tokens" -> "q130_expected_bpe_tokens.parquet",
        "q139_soundex" -> "q139_expected_soundex.parquet",
        "q142_subword" -> "q142_expected_subword.parquet",
        "q153_mutual" -> "q153_expected_mutual.parquet",
        "q156_matching" -> "q156_expected_matching.parquet",
        "q165_coloring" -> "q165_expected_coloring.parquet").foreach { case (dir, name) =>
      val d = Paths.get(s"$out/${dir}_dir")
      val part = scala.util.Using.resource(Files.list(d))(
        _.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get)
      Files.copy(part, Paths.get(s"$out/$name"), StandardCopyOption.REPLACE_EXISTING)
      // clean the temp dir
      scala.util.Using.resource(Files.walk(d))(
        _.sorted(java.util.Comparator.reverseOrder()).iterator().asScala.foreach(Files.delete))
    }
    println(s"[gen-fixtures] wrote q33/q32/q34/q42/q22/q45/q37/q24/q43/q53 fixtures under $out")
    spark.stop()
  }
}
