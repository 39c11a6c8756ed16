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
}
