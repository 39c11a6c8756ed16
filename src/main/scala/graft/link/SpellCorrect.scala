package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SymSpell-style spelling correction (Garbe's symmetric-delete
  * algorithm): correct OCR/typo surface forms against a frequency-ranked
  * dictionary WITHOUT the |tokens|·|dict| cross join. Both sides expand
  * to their deletion neighborhoods — every string obtainable by deleting
  * up to `maxDist` characters — and candidates are the pairs sharing a
  * variant, verified with the TRUE Damerau–Levenshtein distance
  * ([[graft.functions.Damerau]], the native codegen expression).
  *
  * Completeness: if DL(s,t) ≤ d then s and t share a ≤d-deletion
  * variant — every unit op consumes at most one deletion per side
  * (substitution: one from each; transposition: keep one of the pair on
  * each side; insert/delete: one from one side) — so the equi join
  * loses NO candidate the cross join would verify; the spec pins this
  * against a brute cross join, and the q203 oracle replays the brute
  * form in DuckDB with ITS OWN damerau_levenshtein.
  *
  * Scale shape: the expansion is vocabulary-scale (a len-L string has
  * ~L²/2 ≤2-deletion variants — bounded by `maxLen`, over-long tokens
  * dropped WITH [[graft.Audit]] accounting), the join shuffles variant
  * rows, the verify is codegen'd, and the per-token argmin is one
  * map-side-combinable aggregate. Nothing is quadratic in either
  * vocabulary, and the corpus itself is never touched (callers join the
  * correction table back by token).
  *
  * Ranking: per token the candidate with (distance ASC, frequency DESC,
  * term ASC) — a total order, deterministic. Output: (token,
  * correction, dist, freq), only for tokens with ≥ 1 candidate within
  * `maxDist` (left-join the result for passthrough semantics). */
object SpellCorrect {

  /** All distinct strings obtainable from `s` by at most `d` single
    * character deletions (includes `s`). */
  private[link] def deletes(s: String, d: Int): Set[String] = {
    var cur = Set(s)
    var all = cur
    var k = 0
    while (k < d) {
      cur = cur.flatMap { v =>
        (0 until v.length).map(i => v.substring(0, i) + v.substring(i + 1))
      }
      all ++= cur
      k += 1
    }
    all
  }

  def symspell(tokens: DataFrame, tokCol: Column,
      dict: DataFrame, termCol: Column, freqCol: Column,
      maxDist: Int = 2, maxLen: Int = 24): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "symspell: maxDist must be in [0, 3] (variant fan-out is L^d)")
    val spark = tokens.sparkSession
    import spark.implicits._
    val toks = tokens.select(tokCol.cast("string").as("token"))
      .where(col("token").isNotNull).distinct()
    val terms = dict.select(termCol.cast("string").as("term"),
        freqCol.cast("long").as("freq"))
      .where(col("term").isNotNull && col("freq").isNotNull)
      .groupBy("term").agg(max("freq").as("freq"))
    // over-long strings explode the variant fan-out; drop WITH accounting
    def gate(df: DataFrame, c: String, op: String): DataFrame = {
      val sizes = df.select(col(c), length(col(c)).cast("long").as("count"))
      graft.Audit.capAccounting(sizes, maxLen, op) { (n, _) =>
        s"$op: dropping $n strings longer than maxLen=$maxLen chars " +
          "(deletion fan-out is quadratic in length); they get no " +
          "correction — raise maxLen deliberately"
      }
      df.where(length(col(c)) <= maxLen)
    }
    val tg = gate(toks, "token", "symspell.tokens")
    val dg = gate(terms, "term", "symspell.dict")
    val d = maxDist
    val tokVar = tg.as[String].flatMap(t => deletes(t, d).iterator.map((_, t)))
      .toDF("variant", "token")
    val dictVar = dg.select("term").as[String]
      .flatMap(t => deletes(t, d).iterator.map((_, t)))
      .toDF("variant", "term")
    val cand = tokVar.join(dictVar, Seq("variant"))
      .select("token", "term").distinct()
    // cheap guards BEFORE the quadratic scorer: length difference bounds
    // DL from below, so out-of-band pairs never reach the DP (in a dense
    // key space — sequential ids — the deletion blocking is weak and the
    // verify dominates; every skipped DP is ~|a|·|b| cells saved)
    val verified = cand
      .where(abs(length(col("token")) - length(col("term"))) <= d)
      .withColumn("dist",
        graft.functions.Damerau.distCol(col("token"), col("term")))
      .where(col("dist") <= d)
      .join(dg, Seq("term"))
    verified
      .groupBy("token")
      .agg(min(struct(col("dist"), (-col("freq")).as("nf"),
        col("term"))).as("best"))
      .select(col("token"),
        col("best.term").as("correction"),
        col("best.dist").as("dist"),
        (-col("best.nf")).as("freq"))
  }
}
