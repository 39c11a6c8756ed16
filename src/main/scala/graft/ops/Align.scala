package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-level longest-common-subsequence alignment — the sequence
  * alignment summary for paired texts: OCR output vs ground truth, two
  * near-duplicate revisions, extracted vs rendered text. Where
  * `levenshtein`/Damerau (q17/q159) give one scalar edit DISTANCE, the
  * LCS decomposition gives the alignment STRUCTURE: how many tokens the
  * two sides share in order (`lcs_len`), how many the left side must
  * drop (`n_del`) and the right side must add (`n_ins`) — token-level
  * precision/recall numerators for any diff-style evaluation
  * (`dist = n_del + n_ins` is exactly the token edit distance without
  * substitutions).
  *
  * Engine shape: one narrow typed map — each pair's DP is an in-row
  * O(n·m) computation over two rolling rows (ints, no O(n·m) table), the
  * pair dimension stays embarrassingly parallel, no shuffle anywhere.
  * `maxTokens` fails fast on pairs whose quadratic DP would be a silent
  * executor-killer; align longer documents at a coarser unit (sentences,
  * chunks) first. Whitespace tokenization, empty tokens dropped; null
  * text = empty. Output per input row:
  * `(key, n_left, n_right, lcs_len, n_del, n_ins)`. Deterministic. */
object Align {

  private[graft] def lcsLen(a: Array[String], b: Array[String]): Int = {
    val (s, t) = if (a.length >= b.length) (a, b) else (b, a)
    val m = t.length
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= s.length) {
      var j = 1
      while (j <= m) {
        cur(j) =
          if (s(i - 1) == t(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m)
  }

  def lcsTokens(df: DataFrame, key: Column, left: Column, right: Column,
      maxTokens: Int = 8192): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("k"),
        coalesce(left, lit("")).as("l"), coalesce(right, lit("")).as("r"))
      .as[(String, String, String)]
      .map { case (k, l, r) =>
        val a = l.trim.split("\\s+").filter(_.nonEmpty)
        val b = r.trim.split("\\s+").filter(_.nonEmpty)
        require(a.length <= maxTokens && b.length <= maxTokens,
          s"lcsTokens: pair $k has ${a.length}x${b.length} tokens " +
            s"(> $maxTokens); align at a coarser unit or raise maxTokens")
        val lcs = lcsLen(a, b)
        (k, a.length.toLong, b.length.toLong, lcs.toLong,
          (a.length - lcs).toLong, (b.length - lcs).toLong)
      }
      .toDF("key", "n_left", "n_right", "lcs_len", "n_del", "n_ins")
  }

  /** Smith–Waterman LOCAL alignment score (Smith & Waterman, JMB 1981) —
    * the best-matching contiguous region between two token sequences,
    * where LCS/edit distance score the WHOLE strings: the right measure
    * for "does this OCR line contain a corrupted copy of that field
    * value", quote-in-document detection at token granularity, template
    * fragments embedded in otherwise unrelated boilerplate. Scores are
    * integers (`matchScore` ≥ 0, `mismatch`/`gap` ≤ 0); H(i,j) =
    * max(0, diag + s(aᵢ,bⱼ), up + gap, left + gap); the zero floor is
    * what makes the alignment local. Output additionally localizes the
    * optimum: `end_left`/`end_right` are the 1-based token positions of
    * the best cell (ties → smallest i, then smallest j — the first cell
    * the row-major scan reaches, a total order so the result is
    * deterministic).
    *
    * Engine shape: same as [[lcsTokens]] — per-pair rolling-row DP in
    * one narrow typed map, pairs embarrassingly parallel, zero shuffle;
    * `maxTokens` fails fast on quadratic blowups. */
  def swLocal(df: DataFrame, key: Column, left: Column, right: Column,
      matchScore: Int = 2, mismatch: Int = -1, gap: Int = -1,
      maxTokens: Int = 8192): DataFrame = {
    require(matchScore >= 0 && mismatch <= 0 && gap <= 0,
      "swLocal: expected matchScore >= 0 and mismatch, gap <= 0")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("k"),
        coalesce(left, lit("")).as("l"), coalesce(right, lit("")).as("r"))
      .as[(String, String, String)]
      .map { case (k, l, r) =>
        val a = l.trim.split("\\s+").filter(_.nonEmpty)
        val b = r.trim.split("\\s+").filter(_.nonEmpty)
        require(a.length <= maxTokens && b.length <= maxTokens,
          s"swLocal: pair $k has ${a.length}x${b.length} tokens " +
            s"(> $maxTokens); align at a coarser unit or raise maxTokens")
        var best = 0; var bi = 0; var bj = 0
        val m = b.length
        var prev = new Array[Int](m + 1)
        var cur = new Array[Int](m + 1)
        var i = 1
        while (i <= a.length) {
          var j = 1
          while (j <= m) {
            val s = if (a(i - 1) == b(j - 1)) matchScore else mismatch
            var h = prev(j - 1) + s
            if (prev(j) + gap > h) h = prev(j) + gap
            if (cur(j - 1) + gap > h) h = cur(j - 1) + gap
            if (h < 0) h = 0
            cur(j) = h
            if (h > best) { best = h; bi = i; bj = j }
            j += 1
          }
          val tmp = prev; prev = cur; cur = tmp
          java.util.Arrays.fill(cur, 0)
          i += 1
        }
        (k, best.toLong, bi.toLong, bj.toLong, a.length.toLong, b.length.toLong)
      }
      .toDF("key", "best_score", "end_left", "end_right", "n_left", "n_right")
  }
}
