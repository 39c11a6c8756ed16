package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SoftTFIDF pair scoring (Cohen, Ravikumar & Fienberg, IIWeb 2003 —
  * their best-performing hybrid name matcher): score a candidate record
  * pair by the rare-token overlap where tokens match SOFTLY (per-token
  * best Jaro–Winkler ≥ θ), so "acme corporation" ≈ "acme corp." scores
  * high while shared boilerplate ("inc", "ltd") is idf-damped. This is
  * the pair scorer that sits downstream of blocking
  * ([[MetaBlocking]]/[[SortedNeighborhood]]) and upstream of the match
  * decision.
  *
  * Integer-exact variant: the classic formulation weights tokens with
  * log-idf and L2-normalizes — both log and the norm's sqrt are libm
  * calls with NO cross-engine bit guarantee. Here the weight of token w
  * is the exact rational tf·(1/df) and each matched-token term is
  *
  *   floor( tf_A(w) · tf_B(w') · jw_ppm(w,w') · 10⁶ / (df(w)·df(w')) )
  *
  * summed in decimal(38,0) and cast to long ONCE at the end — order-free,
  * bit-stable across engines, and overflow-proof for any realistic
  * corpus: with the single 10⁶ scale a term needs tf_A·tf_B/df² ≥ 9·10⁶
  * (a token repeated ~3000× in BOTH records with df=1) before even the
  * final cast saturates, and no intermediate ever leaves decimal. Only
  * jw itself is a double, and Jaro–Winkler is pure +,·,/ on small
  * rationals — IEEE-exact operations that DuckDB's implementation
  * reproduces bit-for-bit on ASCII (the q128-proven pair), so
  * jw_ppm = floor(10⁶·jw) agrees too. df comes from the record corpus
  * passed to `fit` (both sides unioned), N is deliberately NOT factored
  * in (a constant scale across pairs — ranking is what matters).
  *
  * Per A-token the best B-token is the (jw_ppm DESC, term ASC) argmax —
  * a total order; ties cannot flicker. Pairs score 0 rows dropped
  * (emit = matched pairs only; left-join for passthrough).
  *
  * Shapes: tokenization + df are corpus-scale aggregates; scoring joins
  * candidate-pair tokens A×B WITHIN a pair (Σ |A|·|B| per pair — the
  * candidate set is post-blocking, so this is the intended bounded
  * quadratic); one argmax aggregate per (pair, A-token); one sum per
  * pair. */
object SoftTfIdf {

  /** Whitespace-lowercase token counts per record: (id, tok, tf). */
  private def tokens(records: DataFrame, id: Column, text: Column): DataFrame =
    records.select(id.cast("string").as("id"),
        explode(split(lower(trim(text)), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))

  /** Score candidate pairs: `pairs` has (idA, idB); `records` maps id →
    * text for BOTH sides (the df corpus). Returns
    * (id_a, id_b, score, n_matched) with score the exact integer sum
    * above. θ is in ppm (default 900000 = the paper's 0.9). */
  def score(pairs: DataFrame, idACol: Column, idBCol: Column,
      records: DataFrame, idCol: Column, textCol: Column,
      thetaPpm: Long = 900000L): DataFrame = {
    val toks = graft.Materialize(tokens(records, idCol, textCol),
      eager = false)
    val df = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val tw = toks.join(df, Seq("tok"))
    val p = pairs.select(idACol.cast("string").as("id_a"),
      idBCol.cast("string").as("id_b")).distinct()
    val aTok = p.join(tw.select(col("id").as("id_a"), col("tok").as("ta"),
      col("tf").as("tfa"), col("df").as("dfa")), Seq("id_a"))
    val abTok = aTok.join(tw.select(col("id").as("id_b"), col("tok").as("tb"),
      col("tf").as("tfb"), col("df").as("dfb")), Seq("id_b"))
    val jwPpm = floor(graft.functions.JaroWinkler.jwCol(col("ta"), col("tb"))
      * lit(1000000L)).cast("long")
    // per (pair, A-token): the best soft match in B, total-ordered
    val best = abTok
      .withColumn("jw_ppm", jwPpm)
      .where(col("jw_ppm") >= thetaPpm)
      .groupBy("id_a", "id_b", "ta", "tfa", "dfa")
      .agg(min(struct((-col("jw_ppm")).as("njw"),
        col("tb"), col("tfb"), col("dfb"))).as("m"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val terms = best.select(col("id_a"), col("id_b"),
      floor(dec(col("tfa")) * dec(col("m.tfb")) * dec(-col("m.njw")) *
        dec(lit(1000000L)) /
        (dec(col("dfa")) * dec(col("m.dfb")))).as("term"))
    terms.groupBy("id_a", "id_b")
      .agg(sum("term").cast("long").as("score"),
        count(lit(1)).as("n_matched"))
  }
}
