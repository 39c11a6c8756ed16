package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus bigram language model + per-document average log-probability —
  * the classic cheap "does this text look like the corpus" quality score
  * (a perplexity proxy): boilerplate and template spam score HIGH
  * (predictable), OCR garbage and wrong-language contamination score LOW.
  * The standard curation complement to the heuristic quality scorer in
  * `TextOps` — model-based, no labels, one corpus pass to train.
  *
  * Model: add-one-smoothed bigram MLE over whitespace tokens,
  * P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁·)+V), V = distinct token count; each
  * document is scored by the mean log-probability of its own bigrams
  * (self-scoring, the usual in-corpus outlier setup).
  *
  * Determinism at scale: each bigram's ln quantizes to integer
  * MICRO-NATS (round(ln·10⁶) as long) BEFORE the per-doc aggregate, so
  * the per-doc sum is exact integer arithmetic — order-free across any
  * partition layout (a raw double Σln would make scores flicker at the
  * 6dp boundary with partitioning). The ln itself is codegen'd and
  * computed per occurrence row — cheaper than a distinct-bigram
  * pre-pass plus a second join would be.
  *
  * Shuffles: two count aggregates (bigram, context — both map-side
  * combined), one distinct for V (1-row broadcast), one row-scale join
  * of doc-bigrams → model, one per-doc aggregate. Docs with < 2 tokens
  * have no bigrams and emit nothing; null id/text drop.
  *
  * Output: (id, n_bigrams, avg_logprob@6dp) — avg_logprob ≤ 0, higher =
  * more corpus-typical.
  */
object LangModel {

  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenization parity-locked with the q20/q27 oracle idiom:
    // whitespace split of the trimmed, lowercased text
    val base = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        split(lower(trim(col(textCol))), "\\s+").as("__t"))
      .where(size(col("__t")) >= 2)

    // doc-bigram rows: (id, first token, bigram) — the single exploded
    // row-scale relation every stage below derives from
    val pairs = graft.Materialize(base.select(col("__id"),
      explode(expr("transform(sequence(0, size(__t) - 2), " +
        "i -> struct(__t[i] AS w1, concat(__t[i], ' ', __t[i + 1]) AS bg))"))
        .as("__b"))
      .select(col("__id"), col("__b.w1"), col("__b.bg")), eager = false)

    val bgCounts = pairs.groupBy("bg").agg(count(lit(1)).as("__nbg"))
    val ctxCounts = pairs.groupBy("w1").agg(count(lit(1)).as("__nctx"))
    val vocab = base.select(explode(col("__t")).as("__tok"))
      .agg(countDistinct(col("__tok")).as("__v"))

    val scoredPairs = pairs
      .join(bgCounts, Seq("bg"))
      .join(ctxCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("__id"),
        round(log((col("__nbg") + 1).cast("double") /
          (col("__nctx") + col("__v")).cast("double")) * lit(1e6), 0)
          .cast("long").as("__lp_micro"))

    scoredPairs.groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__lp_micro")).as("__s"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__s").cast("double") / lit(1e6) / col("n_bigrams"), 6)
          .as("avg_logprob"))
  }

  /** Interpolated Kneser–Ney smoothed bigram table (Kneser & Ney, ICASSP
    * 1995; Chen & Goodman 1998 — the n-gram smoothing of record, and the
    * reason "san francisco" does not make bare "francisco" a likely
    * continuation everywhere: the lower-order weight is CONTINUATION
    * count, how many distinct contexts a word follows, not raw
    * frequency):
    *
    *   P(w₂|w₁) = (max(c(w₁w₂)−D, 0) + D·N₁₊(w₁,·)·Pcont(w₂)) / c(w₁·)
    *   Pcont(w₂) = N₁₊(·,w₂) / N₁₊(··),  D = 3/4
    *
    * Exactness: with D = 3/4 every probability is the rational
    *   (max(4c₁₂−3,0)·NB + 3·T₁·R₂) / (4·c₁·NB)
    * over integer counts (NB = distinct bigram types, T₁ = distinct
    * continuations of w₁, R₂ = distinct left-contexts of w₂); `p_ppm` is
    * its exact floor in parts-per-million via decimal(38,0) — at corpus
    * scale 10⁶·c·NB wraps int64, and a float evaluation would disagree
    * across engines in the last ulp. The observed-only table is what a
    * scorer joins; unseen mass is reconstructible from the same counts
    * (the spec proves Σ_w₂∈V P(w₂|w₁) = 1 exactly).
    *
    * Shuffles: one exploded pair pass feeding four map-side-combined
    * aggregates (bigram, context, continuation, left-context) + a 1-row
    * type count; the result is vocabulary²-bounded, never corpus-scale.
    * Tokenization is bigramScore's (lowercased whitespace split).
    * Output: (w1, w2, n, p_ppm). */
  def knBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(split(lower(trim(col(textCol))), "\\s+").as("__t"))
      .where(size(col("__t")) >= 2)
    val pairs = graft.Materialize(base.select(
      explode(expr("transform(sequence(0, size(__t) - 2), " +
        "i -> struct(__t[i] AS w1, __t[i + 1] AS w2))")).as("__b"))
      .select(col("__b.w1"), col("__b.w2")), eager = false)
    val c12 = graft.Materialize(
      pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n")), eager = false)
    val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("__c1"))
    val t1 = c12.groupBy("w1").agg(count(lit(1)).as("__t1"))
    val r2 = c12.groupBy("w2").agg(count(lit(1)).as("__r2"))
    val nb = c12.agg(count(lit(1)).as("__nb"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    c12.join(c1, Seq("w1")).join(t1, Seq("w1")).join(r2, Seq("w2"))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("n"),
        floor(lit(1000000L).cast("decimal(38,0)") *
          (dec(greatest(lit(4) * col("n") - 3, lit(0))) * dec(col("__nb")) +
            dec(lit(3)) * dec(col("__t1")) * dec(col("__r2"))) /
          (dec(lit(4)) * dec(col("__c1")) * dec(col("__nb"))))
          .cast("long").as("p_ppm"))
  }
}
