package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance selection — the diversity-aware top-k for
  * training-data curation and RAG context assembly: greedily pick the
  * document that best matches the query AND least resembles what is
  * already picked, so k near-duplicates of one great document do not
  * crowd out coverage. Integer scoring (λ = 1/2, scaled out):
  * `score(d) = rel(d) − max_{s∈S} sim(d,s)` with `rel` = |tokens(d) ∩ Q|
  * and `sim` = |tokens(d) ∩ tokens(s)| — exact, hashable, no floats.
  * Ties break to the smallest id (numeric order for integral ids via the
  * `Ids` codec, lexicographic otherwise).
  *
  * Engine shape: the greedy is inherently sequential in k, so the loop
  * runs k DRIVER ROUNDS, each fully distributed: one TakeOrdered(1) for
  * the argmax (never a full sort), then one broadcast join of the
  * corpus's token table against the JUST-PICKED document's tokens
  * (bounded: one document) to fold the running max-similarity — the
  * corpus never moves, per-round state is (id, rel, ms). Driver state is
  * k rows. k is the product requirement ("give me 12 diverse docs"), so
  * the serial factor is bounded by construction.
  *
  * Output: `(rank, doc_id, rel, max_sim, score)` for the k picks (fewer
  * if the corpus runs out), rank 1-based in pick order. Deterministic. */
object Mmr {

  def select(docTokens: DataFrame, id: Column, token: Column,
      queryTokens: DataFrame, qtok: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 10000, s"Mmr.select: k=$k out of range [1,10000]")
    val spark = docTokens.sparkSession
    import spark.implicits._
    val idIsIntegral = docTokens.select(id).schema.head.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    def ord(c: Column): Column =
      if (idIsIntegral) graft.ops.Ids.encodeOrdered(c) else c

    val tok = graft.Materialize(docTokens
      .select(id.cast("string").as("id"), token.cast("string").as("w"))
      .where(col("id").isNotNull && col("w").isNotNull)
      .distinct(), eager = false)
    val q = broadcast(queryTokens.select(qtok.cast("string").as("w"))
      .where(col("w").isNotNull).distinct())
    val rel = tok.join(q, Seq("w"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("rel"))
    var state = graft.Materialize(tok.select("id").distinct()
      .join(rel, Seq("id"), "left")
      .select(col("id"), coalesce(col("rel"), lit(0L)).as("rel"),
        lit(0L).as("ms")), eager = false)

    val picks = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val top = state
        .orderBy((col("rel") - col("ms")).desc, ord(col("id")).asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pid = top(0).getString(0)
        val prel = top(0).getLong(1); val pms = top(0).getLong(2)
        picks += ((r.toLong, pid, prel, pms, prel - pms))
        val pickToks = tok.where(col("id") === pid).select("w")
        val simTo = tok.join(broadcast(pickToks), Seq("w"))
          .groupBy("id").agg(count(lit(1)).as("__s"))
        state = graft.Materialize(state.where(col("id") =!= pid)
          .join(simTo, Seq("id"), "left")
          .select(col("id"), col("rel"),
            greatest(col("ms"), coalesce(col("__s"), lit(0L))).as("ms")),
          eager = false)
        r += 1
      }
    }
    picks.toSeq.toDF("rank", "doc_id", "rel", "max_sim", "score")
  }
}
