package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval-corpus prep step
  * (RAG indexing, context-window packing of long documents, passage-level
  * dedup inputs): each document becomes overlapping windows of `window`
  * tokens advanced by `stride` tokens, so no answer span longer than
  * (window − stride) tokens is ever split across a chunk boundary without
  * also appearing whole in some chunk.
  *
  * Distinct from [[Curation.packSequences]] (which CONCATENATES documents
  * into fixed training sequences, no overlap, cross-doc): chunking stays
  * within the document, overlaps deliberately, and preserves provenance
  * (doc_id, token offset) per chunk — the retrieval unit, not the training
  * batch unit.
  *
  * Shape: pure per-row Column HOFs (split → sequence → transform →
  * posexplode) — ZERO shuffles at any corpus size; output size is
  * Σ ceil(max(nᵢ − window, 0)/stride + 1) rows, linear in corpus tokens
  * times the overlap factor window/stride. Tokenization is the engine's
  * whitespace rule (the dedup/decontamination family's split, with the
  * boundary trim widened to the full \s class so tab/newline-led docs
  * cannot grow a phantom empty token).
  */
object Chunker {

  // trim the FULL whitespace class on both ends (Spark's trim() strips
  // spaces only — a tab-led doc would otherwise grow a phantom "" token)
  private def wsTrim(text: Column): Column =
    regexp_replace(text, "^\\s+|\\s+$", "")

  private def words(text: Column): Column = {
    val t = wsTrim(text)
    when(text.isNull || length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** Chunk `textCol` of `df` into windows of `window` tokens every
    * `stride` tokens. Returns one row per chunk:
    * (…idCols, chunk_id, start_tok, n_tok, chunk_text) with chunk_id
    * 0-based in document order and start_tok the 0-based token offset.
    * Documents with no tokens yield no chunks. The final chunk may be
    * shorter than `window`; a start is emitted iff it is 0 or still has
    * ≥1 token, i.e. starts = 0, stride, …, the largest multiple of stride
    * < n. */
  def chunk(df: DataFrame, textCol: String, idCols: Seq[String],
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, "chunk: window must be >= 1")
    require(stride >= 1 && stride <= window,
      "chunk: stride must be in [1, window] (stride > window would drop tokens)")
    val w = words(col(textCol))
    val ids = idCols.map(col)
    // number of chunks for n tokens: 0 if n == 0 else floor((n-1)/stride)+1
    val nChunks = when(size(w) === 0, lit(0))
      .otherwise(floor((size(w) - 1) / stride).cast("int") + 1)
    df.select(ids :+ w.as("__w") :+ nChunks.as("__nc"): _*)
      .where(col("__nc") > 0)
      .select(ids :+ col("__w") :+
        posexplode(sequence(lit(0), col("__nc") - 1)).as(Seq("chunk_id", "__s")): _*)
      .select(ids ++ Seq(
        col("chunk_id"),
        (col("__s") * stride).as("start_tok"),
        least(lit(window), size(col("__w")) - col("__s") * stride).as("n_tok"),
        concat_ws(" ", slice(col("__w"), col("__s") * stride + 1, lit(window)))
          .as("chunk_text")): _*)
  }

  /** Topic-boundary detection — the TextTiling idea (Hearst, CL 1997)
    * made integer-exact: at every token gap g (full windows on both
    * sides), score the lexical cohesion of the w-token windows left and
    * right of g as SET-Jaccard in exact ppm — Hearst's count-vector
    * cosine needs a sqrt with no cross-engine bit guarantee, Jaccard is
    * a pure integer ratio with the same monotone "topic shift = lexical
    * dip" signal. A gap is a BOUNDARY iff its score is a strict-left /
    * lax-right local minimum (sim(g-1) > sim(g) ≤ sim(g+1) — the
    * asymmetry makes plateau minima resolve to their FIRST gap, a total
    * rule) and the one-step depth (sim(g-1)−sim(g)) + (sim(g+1)−sim(g))
    * clears `minDepthPpm`. Interior gaps only (g−1 and g+1 must exist).
    * The curation use: chunking for RAG at topic boundaries instead of
    * the fixed-stride [[chunk]] — splits land between template sections
    * instead of through them.
    *
    * Shape: per-doc typed map, zero shuffle; docs embarrassingly
    * parallel; `maxTokens` fail-fast (the gap scan is O(n·w)).
    * Output: (id, boundary_pos — the 1-based token index the boundary
    * FOLLOWS, sim_ppm, depth_ppm). */
  def topicBoundaries(df: DataFrame, idCol: Column, textCol: Column,
      w: Int = 10, minDepthPpm: Long = 100000L,
      maxTokens: Int = 65536): DataFrame = {
    require(w >= 1, "topicBoundaries: w must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol.cast("string").as("id"),
        coalesce(textCol, lit("")).as("t"))
      .where(col("id").isNotNull)
      .as[(String, String)]
      .flatMap { case (id, t) =>
        val toks = t.trim.split("\\s+").filter(_.nonEmpty)
        require(toks.length <= maxTokens,
          s"topicBoundaries: doc $id has ${toks.length} tokens " +
            s"(> $maxTokens); segment at a coarser unit first")
        val n = toks.length
        if (n < 2 * w + 2) Iterator.empty
        else {
          // sim(g) for g in w .. n-w (boundary after token g, 1-based)
          val gaps = (w to (n - w)).toArray
          val sim = gaps.map { g =>
            val l = toks.slice(g - w, g).toSet
            val r = toks.slice(g, g + w).toSet
            val inter = (l & r).size.toLong
            val union = (l | r).size.toLong
            1000000L * inter / union // union >= 1 (w >= 1)
          }
          (1 until gaps.length - 1).iterator.flatMap { i =>
            val depth = (sim(i - 1) - sim(i)) + (sim(i + 1) - sim(i))
            if (sim(i - 1) > sim(i) && sim(i) <= sim(i + 1) &&
                depth >= minDepthPpm)
              Iterator((id, gaps(i).toLong, sim(i), depth))
            else Iterator.empty
          }
        }
      }
      .toDF("id", "boundary_pos", "sim_ppm", "depth_ppm")
  }
}
