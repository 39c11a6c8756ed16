package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event log — "of the users who did A,
  * how many later did B, then C": the conversion / drop-off measurement
  * behind acquisition analysis, and in a pipeline context the multi-stage
  * progress audit (ingested → extracted → linked → validated per doc).
  *
  * Semantics: strict-order, EARLIEST-COMPLETION funnel. Stage k is
  * reached iff an event of step k's type exists STRICTLY after the chosen
  * stage-(k−1) event; the chosen event is always the earliest eligible one
  * (greedy min — provably maximal: completing a prefix earlier only
  * enlarges the suffix's candidate set, so no other choice reaches more
  * stages). Equal timestamps do NOT advance the funnel (strict >, pinned
  * in spec). No conversion window — a windowed variant anchored at t1 is
  * expressible downstream as `last_ts - first_ts <= span`, and a SLIDING
  * window changes the optimal-anchor problem entirely (ClickHouse
  * windowFunnel semantics) — out of scope, documented not implied.
  *
  * Scale shape: one filtered scan per step feeding a user-keyed min
  * aggregate (map-side combined), chained by |steps|−1 equi joins on the
  * user key — every stage table is user-scale, co-keyed, AQE-skew-
  * splittable; nothing is corpus-scale after the first filters. Events
  * outside the step list are pruned at the scan (isin pushdown).
  */
object Funnel {

  /** (user, stages, first_ts, last_ts) for every user who reached stage 1;
    * stages = furthest 1-based stage index, first/last = the chosen stage
    * timestamps. */
  def stages(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: steps required")
    require(steps.distinct.size == steps.size,
      "funnel: repeated step types are ambiguous — disambiguate upstream")

    val base = events
      .select(col(userCol).as("user"), col(tsCol).as("ts"),
        col(typeCol).as("typ"))
      .where(col("user").isNotNull && col("ts").isNotNull &&
        col("typ").isin(steps: _*))

    def tk(k: Int) = s"__t$k"
    // t1 = earliest step-1 event per user
    var reached = base.where(col("typ") === steps.head)
      .groupBy("user").agg(min(col("ts")).as(tk(1)))
    // tk = earliest step-k event strictly after t(k-1), for users who have
    // t(k-1); LEFT join keeps earlier-stage users with null tk
    for (k <- 2 to steps.size) {
      val nxt = base.where(col("typ") === steps(k - 1))
        .join(reached.select(col("user"), col(tk(k - 1))), Seq("user"))
        .where(col("ts") > col(tk(k - 1)))
        .groupBy("user").agg(min(col("ts")).as(tk(k)))
      reached = reached.join(nxt, Seq("user"), "left")
    }

    val n = steps.size
    // when-chain checks the HIGHEST stage first
    val stage = (n to 2 by -1).foldRight(lit(1L): org.apache.spark.sql.Column) {
      (k, acc) => when(col(tk(k)).isNotNull, lit(k.toLong)).otherwise(acc)
    }
    reached.select(col("user"),
      stage.as("stages"),
      col(tk(1)).as("first_ts"),
      coalesce(((n to 2 by -1).map(k => col(tk(k))) :+ col(tk(1))): _*)
        .as("last_ts"))
  }
}
