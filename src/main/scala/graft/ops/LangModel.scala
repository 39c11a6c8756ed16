package graft.ops

import org.apache.spark.sql.DataFrame
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
}
