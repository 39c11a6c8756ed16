package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure Column expressions (codegen'd, shuffle-free, pushdown-friendly)
  * and deliberately expressible in ANSI SQL so the DuckDB oracle can replay
  * them 1:1.
  */
object TextOps {

  /** Stopword/marker lists per language for the n-gram language-ID
    * heuristic. Fixed, tiny, embedded in the plan as literals (a broadcast
    * gazetteer degenerates to constants at this size). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " to ", " in ", " is ", " that ", " it "),
    "fr" -> Seq(" le ", " la ", " les ", " de ", " et ", " est ", " que ", " une "),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", " nicht ", " ein ", " zu "),
    "es" -> Seq(" el ", " los ", " de ", " y ", " es ", " que ", " una ", " por "))

  private def padded(text: Column): Column = concat(lit(" "), lower(text), lit(" "))

  /** Marker-hit count for one language. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => when(padded(text).contains(m), 1).otherwise(0))
      .reduce(_ + _)

  /** CJK codepoint count (the zh signal). */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))

  /** Language-ID: argmax of marker scores, fixed priority order on ties
    * (en > fr > de > es), 'zh' when CJK chars dominate, 'und' when no
    * signal at all. Deterministic; same CASE chain exists in the oracle. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, ms) => l -> langScore(text, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val zh = cjkCount(text)
    scores.foldRight(
      when(zh > 0, "zh").otherwise("und"): Column) { case ((l, s), acc) =>
      when(s > 0 && s === best && zh <= s, l).otherwise(acc)
    }
  }

  /** Whitespace token count; 0 for blank text. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish pre-tokenizer count: letter runs, single digits, and single
    * non-alphanumeric marks — the shape GPT-2-style pre-tokenization
    * produces, as a cheap upper bound on token count. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation ratio in [0,1]. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(
        length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", "")).cast("double") /
          length(text).cast("double"))

  /** Stopword ratio: fraction of the combined marker vocabulary present. */
  def stopwordHitRatio(text: Column): Column = {
    val all = langMarkers.flatMap(_._2).distinct
    langScore(text, all).cast("double") / lit(all.size.toDouble)
  }

  /** Composite quality score in [0,1] — length saturation + stopword
    * presence − punctuation excess; the standard cheap pre-filter shape for
    * web-scale corpus curation. Rounded to 4dp for cross-engine equality. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val sw = stopwordHitRatio(text)
    val punct = punctRatio(text)
    round(greatest(lit(0.0),
      least(lit(1.0), lenScore * 0.5 + sw * 0.5 - greatest(punct - 0.2, lit(0.0)))), 4)
  }

  /** Rolling polynomial document fingerprint over codepoints:
    * h := (h*31 + code) mod (2^31-1). Order-sensitive (a true rolling hash),
    * engine-portable (same fold exists in DuckDB list_reduce). r6: native
    * codegen expression — the declarative `aggregate(split(text, ""), …)`
    * fold was interpreted and allocated a per-character array per row;
    * FingerprintParitySpec locks the bit-equivalence. */
  def fingerprint(text: Column): Column = graft.functions.Fingerprint.col(text)
}
