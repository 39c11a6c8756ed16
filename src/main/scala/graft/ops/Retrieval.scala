package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus — the lexical search pass a
  * training-data pipeline runs for decontamination lookups ("which corpus
  * docs match this benchmark question"), targeted curation ("pull the docs
  * about X for re-weighting"), and passage-mining seed selection. Okapi
  * BM25 with the Lucene idf form:
  *
  *   idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   score(d)   = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Tokenization is the corpus-wide whitespace regime (`\s+` on trimmed
  * text, empty tokens dropped — the q82/TextOps contract), so df/tf/dl all
  * agree with the curation operators.
  *
  * Scale shape: the query-term set is tiny and known, so the corpus term
  * explode FILTERS to it immediately (the inverted-index probe, not a full
  * index build); df and idf live in a ≤|terms|-row table that broadcasts;
  * N and avgdl fold in via a 1-ROW cross join (the PageRank dangling
  * idiom — zero driver collects); per-doc scores are one doc-keyed
  * map-side-combined sum; the final top-k is a TakeOrdered, not a global
  * sort. Two narrow text scans total (token pass + doc-length pass).
  *
  * Determinism: scores round to 6 dp and the ranking orders by (rounded
  * score DESC, id ASC), so the cut and the rank column are reproducible
  * across layouts and match an independent re-derivation bit-for-bit.
  */
object Retrieval {

  private def toks(textCol: Column): Column =
    filter(split(trim(coalesce(textCol, lit(""))), "\\s+"),
      t => length(t) > 0)

  /** Top-k docs by BM25 over `queryTerms` (exact-match terms, the
    * whitespace-token regime). Returns (id, n_terms, score, rank):
    * matched-term count, 6-dp score, 1-based rank. Docs matching no term
    * never appear. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: query terms required")
    require(queryTerms.distinct.size == queryTerms.size,
      "bm25TopK: duplicate query terms")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bm25TopK: bad k1=$k1 b=$b")
    require(topK > 0, "bm25TopK: topK must be > 0")

    // doc lengths — EVERY doc rides into N and avgdl (empty text => dl 0).
    // dl and tf are both MULTI-CONSUMER (stats + the scoring join; df + the
    // contribution join): lazily materialized so each text scan happens
    // once, not once per consumer (the engine's multi-consumer discipline)
    val dl = graft.Materialize(docs.select(col(idCol).as("id"),
      size(toks(col(textCol))).cast("double").as("dl")), eager = false)
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      coalesce(avg(col("dl")), lit(0.0)).as("avgdl"))

    // inverted-index probe: explode filtered to the query terms only
    val tf = graft.Materialize(docs.select(col(idCol).as("id"),
        explode(toks(col(textCol))).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf")),
      eager = false)

    // ≤|terms| rows: df -> idf, with N folded in via the 1-row cross join
    val idf = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"),
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          .as("idf"),
        col("avgdl"))

    val contrib = tf
      .join(broadcast(idf), Seq("term"))
      .join(dl, Seq("id"))
      .select(col("id"), col("term"),
        (col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("c"))

    val scored = contrib.groupBy("id")
      .agg(count(lit(1)).as("n_terms"), round(sum(col("c")), 6).as("score"))
    scored.orderBy(col("score").desc, col("id").asc).limit(topK)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("id").asc)))
  }

  /** Positional inverted index — the MATERIALIZED artifact bm25TopK probes
    * on the fly: one posting row per (term, doc) with the term's 0-based
    * token offsets (joined to a string — the stable cross-engine array
    * form) and tf. Phrase/proximity search and highlighting read exactly
    * this table; at 10^12 docs it is written partitioned by term-hash and
    * becomes the retrieval join's pruned side. `minDf` drops hapax terms
    * (the long tail that doubles index size and matches nothing twice).
    * One explode + two keyed aggregates; positions are collected
    * per-(term, doc) — bounded by the document length, never corpus-scale
    * in one group. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int = 1): DataFrame = {
    require(minDf >= 1, "invertedIndex: minDf must be >= 1")
    val postings = docs
      .select(col(idCol).as("doc_id"),
        posexplode(toks(col(textCol))).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"),
        array_join(transform(array_sort(collect_list(col("pos"))),
          _.cast("string")), ",").as("positions"))
    if (minDf <= 1) postings
    else {
      val keep = postings.groupBy("term")
        .agg(count(lit(1)).as("df")).where(col("df") >= minDf)
      postings.join(keep.select("term"), Seq("term"), "left_semi")
    }
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * the standard way to combine heterogeneous rankings (BM25 lexical +
    * ANN semantic + recency) WITHOUT calibrating their scores:
    * rrf(d) = Σ_r 1/(k + rank_r(d)). Entirely in exact integer
    * fixed-point — each term is 10⁹ div (k + rank), a truncating integer
    * division replayable in any engine; the sum is an exact long — so the
    * fused ranking is bit-stable (the family determinism contract), and
    * ties break by id. Input rankings are (id, rank) frames; rank-scale
    * data throughout (one union + one keyed aggregate + a top-k cut). */
  /** Keyword-in-context (KWIC) concordance — every occurrence of `term`
    * with its ±`w`-token context: the corpus-inspection view an annotator
    * or prompt-engineer reads when deciding whether a term is signal or
    * boilerplate, and the provenance snippet retrieval UIs highlight.
    * Pure per-row Column HOFs over the whitespace tokens (the retrieval
    * family's rule): positions via a filtered index sequence, contexts
    * via bounded slices — ZERO shuffles, output one row per occurrence
    * (doc_id, pos, left_ctx, right_ctx). */
  def kwic(docs: DataFrame, idCol: String, textCol: String,
      term: String, w: Int = 5): DataFrame = {
    require(term.nonEmpty && !term.exists(_.isWhitespace),
      "kwic: term must be one non-empty whitespace-free token")
    require(w >= 0, "kwic: w must be >= 0")
    val tk = toks(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), tk.as("__t"))
      // guard: sequence(0, -1) DESCENDS in Spark — empty docs must not
      // reach it
      .where(size(col("__t")) > 0)
      .select(col("doc_id"), col("__t"),
        explode(filter(sequence(lit(0), size(col("__t")) - 1),
          i => element_at(col("__t"), i + 1) === term)).as("pos"))
      .select(col("doc_id"), col("pos"),
        array_join(slice(col("__t"),
          greatest(lit(1), col("pos") + 1 - w),
          least(col("pos"), lit(w))), " ").as("left_ctx"),
        array_join(slice(col("__t"), col("pos") + 2, lit(w)), " ").as("right_ctx"))
  }

  /** Ranked-retrieval evaluation — MAP / MRR / P@k / R@k per query in
    * EXACT integer ppm: the numbers that grade this engine's own
    * retrieval surfaces (bm25TopK, the ANN family, rrfFuse) against
    * relevance labels. All four metrics are RATIONALS in the hit ranks
    * (AP = (1/R)·Σ_{hits} precision@rank — a sum of fractions), so the
    * per-query fold runs in BigInt rationals and floors to ppm — no
    * float Σ whose accumulation order could flicker, which is what lets
    * an oracle replay the numbers fraction-for-fraction. NDCG is
    * deliberately absent: its log₂ discount has no cross-engine bit
    * guarantee (same reason LangModel.knBigrams avoids ln).
    *
    * Input: one row per (query, item) with the item's rank (1-based;
    * duplicate ranks rejected) and a relevance flag. Queries with zero
    * relevant items emit null metrics (reported, not dropped — a
    * benchmark that silently skips unanswerable queries overstates
    * itself). Per-query lists are bounded by `maxRank` fail-fast.
    * Output: (query, n_ranked, n_rel, mrr_ppm, ap_ppm, p_at_k_ppm,
    * r_at_k_ppm). Shape: one shuffle to co-locate a query's rows, a
    * typed in-group fold — queries embarrassingly parallel. */
  def evalRanking(df: DataFrame, query: Column, rank: Column,
      relevant: Column, k: Int = 5, maxRank: Int = 100000): DataFrame = {
    require(k >= 1, "evalRanking: k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(query.cast("string").as("q"), rank.cast("int").as("r"),
        relevant.cast("boolean").as("rel"))
      .where(col("q").isNotNull && col("r").isNotNull && col("rel").isNotNull)
      .as[(String, Int, Boolean)]
      .groupByKey(_._1)
      .mapGroups { (q, it) =>
        val rows = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        require(rows.length <= maxRank,
          s"evalRanking: query $q has ${rows.length} rows (> $maxRank)")
        require(rows.map(_._1).distinct.length == rows.length,
          s"evalRanking: query $q has duplicate ranks")
        // ranks are 1-based: a 0 rank would divide by zero in MRR and a
        // negative one silently yields nonsense ppm (r4 ADVICE)
        require(rows.isEmpty || rows.head._1 >= 1,
          s"evalRanking: query $q has rank ${rows.head._1} < 1 " +
            "(ranks are 1-based)")
        val nRel = rows.count(_._2).toLong
        if (nRel == 0L)
          (q, rows.length.toLong, 0L, None: Option[Long], None: Option[Long],
            None: Option[Long], None: Option[Long])
        else {
          var hits = 0L
          var apNum = BigInt(0); var apDen = BigInt(1)
          var firstHit = 0L
          var hitsAtK = 0L
          rows.foreach { case (r, rel) =>
            if (rel) {
              hits += 1
              if (firstHit == 0L) firstHit = r
              // ap += hits / r  (exact fraction accumulation)
              apNum = apNum * BigInt(r) + BigInt(hits) * apDen
              apDen = apDen * BigInt(r)
              if (r <= k) hitsAtK += 1
            }
          }
          val mrr = (BigInt(1000000) / BigInt(firstHit)).toLong
          val ap = (BigInt(1000000) * apNum / (apDen * BigInt(nRel))).toLong
          val pAtK = 1000000L * hitsAtK / k
          val rAtK = 1000000L * hitsAtK / nRel
          (q, rows.length.toLong, nRel, Some(mrr), Some(ap), Some(pAtK),
            Some(rAtK))
        }
      }
      .toDF("query", "n_ranked", "n_rel", "mrr_ppm", "ap_ppm",
        "p_at_k_ppm", "r_at_k_ppm")
  }

  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60, topK: Int = 10,
      idCol: String = "id", rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: at least one ranking")
    require(k >= 0, "rrfFuse: k must be >= 0")
    require(topK >= 1, "rrfFuse: topK must be >= 1")
    val all = rankings.map(_.select(col(idCol).cast("string").as("id"),
        col(rankCol).cast("long").as("rank"))
      .where(col("id").isNotNull && col("rank").isNotNull && col("rank") >= 1))
      .reduce(_ union _)
    all.select(col("id"), expr(s"1000000000L div ($k + rank)").as("term"))
      .groupBy("id")
      .agg(sum("term").as("rrf_fp"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_fp").desc, col("id").asc)
      .limit(topK)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_fp").desc, col("id").asc)))
  }
}
