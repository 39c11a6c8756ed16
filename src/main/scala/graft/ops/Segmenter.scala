package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentence segmentation + per-sentence language ID — the curation unit
  * below the document: web documents routinely interleave languages
  * (boilerplate in English, body in French), and a doc-level language
  * vote hides exactly the mixed-language documents a curation pipeline
  * must flag or split. Per-sentence LID over the same marker-word scorer
  * as [[TextOps.langId]] (q25's oracle-proven rule) makes the mix
  * visible and the flag deterministic.
  *
  * Splitting rule — deliberately RE2-compatible (no lookbehind, so the
  * exact rule replays in any regex engine): terminators [.!?] followed
  * by whitespace end a sentence; the split marker is injected by one
  * regexp_replace("([.!?])\s+" → "$1") and the text splits on the
  * control char. Blank fragments (leading/trailing/duplicate
  * terminators) are dropped. Pure per-row Column HOFs — zero shuffles.
  */
object Segmenter {

  /** The sentence array of a text column (trimmed fragments, blanks
    * dropped). */
  def sentences(text: Column): Column =
    filter(
      transform(
        split(regexp_replace(text, "([.!?])\\s+", "$1"), ""),
        s => regexp_replace(s, "^\\s+|\\s+$", "")),
      s => length(s) > 0)

  /** One row per sentence: (…idCols, sent_id, sentence, lang, n_tok) with
    * sent_id 0-based in document order. Null/blank docs emit nothing. */
  def sentenceTable(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame = {
    val ids = idCols.map(col)
    df.where(col(textCol).isNotNull)
      .select(ids :+ posexplode(sentences(col(textCol))).as(Seq("sent_id", "sentence")): _*)
      .withColumn("lang", TextOps.langId(col("sentence")))
      .withColumn("n_tok", TextOps.tokenCountWs(col("sentence")))
  }

  /** Doc-level mix report: dominant language by sentence count (ties by
    * language code), number of distinct sentence languages, and the
    * mixed flag (≥ 2 languages ignoring "und"). One sentence-scale
    * aggregate pair. */
  def languageMix(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sent = sentenceTable(df, textCol, Seq(idCol))
    val perLang = sent.groupBy(col(idCol), col("lang"))
      .agg(count(lit(1)).as("n"))
    perLang.groupBy(col(idCol))
      .agg(
        // deterministic dominant: max(struct(n, lang)) picks the highest
        // count, ties to the lexicographically LARGEST code — a total
        // order, documented
        max(struct(col("n"), col("lang"))).as("__m"),
        countDistinct(when(col("lang") =!= "und", col("lang"))).as("n_langs"))
      .select(col(idCol), col("__m.lang").as("dominant_lang"),
        col("__m.n").as("n_dominant"), col("n_langs"),
        (col("n_langs") >= 2).as("mixed"))
  }
}
