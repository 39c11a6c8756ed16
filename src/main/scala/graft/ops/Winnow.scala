package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken, SIGMOD
  * 2003 — the MOSS algorithm). Full k-gram hashing (q29's fingerprint)
  * stores one hash per token; winnowing keeps ~2/(w+1) of them with the
  * GUARANTEE full sampling lacks: every match of length ≥ w+k−1 tokens
  * still shares at least one selected fingerprint, and consecutive
  * selections are ≤ w positions apart. That is the plagiarism/copy-
  * detection index at corpus scale: a 50× smaller posting table, zero
  * recall loss above the noise threshold.
  *
  * Rule, exactly the paper's: hash every k-token gram (the portable
  * rolling fingerprint — cross-engine replayable), slide a w-gram window,
  * select the RIGHTMOST minimal hash per window, dedup selections. The
  * engine computes it as ONE window-function pass (min of (h, −pos)
  * structs over a w-row frame — the sort is per doc, spills on mega-docs);
  * the oracle replays it as a position-range self-join, a structurally
  * different evaluation of the same rule.
  *
  * Scale shape: tokenize+hash is narrow; the ONLY exchange is the doc-id
  * window partition, and the output is the deduped selection (≈ 2n/w
  * rows). Cross-doc matching is then a plain equi-join on (h). */
object Winnow {

  /** (id, pos, h) selected fingerprints; pos = 1-based position of the
    * selected k-gram, h its hash. Docs with fewer than k+w−1 tokens yield
    * whatever full windows exist (none below k+w−1... below k: nothing). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"winnow: k, w >= 1 (got $k, $w)")
    val t = coalesce(col(textCol), lit(""))
    val toks = when(length(trim(t)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(t), "\\s+"))
    // r6: winnowing is PER-DOCUMENT — the old doc-partitioned window pass
    // paid one exchange + sort into WindowExec (no codegen) plus a second
    // exchange for the global distinct, all keyed by (id, ...). Computed
    // instead as one narrow HOF pass per row: gram-hash array → sliding
    // `array_min` of (h, −pos) structs over each full w-window (the same
    // rightmost-minimum struct order) → per-doc `array_distinct` (the old
    // distinct's key included `id`, so it WAS per-doc) → explode only the
    // ≈2n/(w+1) selections. Zero exchanges (guide §2.4); values identical.
    // r6 follow-up: bind `toks` as a lambda variable before the sliding
    // transform — the captured split expression was re-evaluated per
    // element inside the interpreted HOF lambda (the wordShingles
    // finding), re-running the regex split ~|toks| times per document.
    val hs = transform(
      flatten(transform(array(toks), ts =>
        when(size(ts) < k, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(ts) - k + 1),
            i => array_join(slice(ts, i, lit(k)), " "))))),
      g => TextOps.fingerprint(g))
    df.select(col(idCol).as("id"), hs.as("hs"))
      .withColumn("sel",
        when(size(col("hs")) < w,
          array().cast("array<struct<h:bigint,np:int>>"))
          .otherwise(expr(
            s"""transform(sequence(1, size(hs) - ${w - 1}),
               |  i -> array_min(transform(sequence(i, i + ${w - 1}),
               |    j -> struct(element_at(hs, j) as h, -j as np))))""".stripMargin)))
      .select(col("id"), explode(array_distinct(col("sel"))).as("m"))
      .select(col("id"), (-col("m.np")).as("pos"), col("m.h").as("h"))
  }

  /** Cross-doc copy candidates: pairs sharing ≥ minShared fingerprints —
    * the MOSS match table. */
  def matches(fps: DataFrame, minShared: Long = 2): DataFrame =
    fps.select(col("id").as("id_a"), col("h"))
      .join(fps.select(col("id").as("id_b"), col("h")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(countDistinct(col("h")).as("n_shared"))
      .where(col("n_shared") >= minShared)
}
