package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative truth discovery over conflicting claims (the Sums/Hubs-
  * and-Authorities family — Pasternack & Roth 2010; TruthFinder, Yin
  * 2008): when multiple sources assert different values for the same
  * object, believe the value backed by the most RELIABLE sources, where a
  * source's reliability is in turn how often its claims win — the
  * fixpoint every KG fusion stage needs once extraction pulls the same
  * fact from many pages. Survivorship (q99) resolves by static rules;
  * this resolves by the data's own agreement structure.
  *
  * EXACT INTEGER fixed-point (the q114/q116 trick, so the DuckDB oracle
  * replays it hash-identically — note `div`, Spark's integral division,
  * NOT `/`, which silently promotes longs to double): trust is
  * parts-per-million, beliefs are trust sums, normalization/averaging
  * truncate:
  *   belief_t(o,v) = Σ_{s claims (o,v)} trust_{t-1}(s)
  *   norm_t(o,v)   = belief_t(o,v) · 10^6 div Σ_v' belief_t(o,v')
  *   trust_t(s)    = (Σ_{(o,v) ∈ claims(s)} norm_t(o,v)) div n_claims(s)
  * After T rounds each object resolves to its max-belief value (ties →
  * smallest value string; row_number, never rank).
  *
  * Scale shape per round: one (obj,val)-keyed SUM over claims ⋈ trust and
  * one src-keyed SUM back — two shuffles, claims-scale; the trust table is
  * sources-scale (tiny → broadcast). T is a fixed small constant, and each
  * round is pure lineage (nothing materializes mid-round). */
object TruthDiscovery {

  val Scale = 1000000L

  private def idiv(a: Column, b: Column): Column =
    call_function("div", a, b)

  private def cleaned(claims: DataFrame): DataFrame =
    claims.select(col("src").cast("string").as("src"),
        col("obj").cast("string").as("obj"),
        col("val").cast("string").as("val"))
      .where(col("src").isNotNull && col("obj").isNotNull &&
        col("val").isNotNull)
      .distinct()

  /** T rounds of the fixpoint: (final trust by src, final belief by
    * (obj,val)). `cl` must be the cleaned claim set. */
  private def iterate(cl: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val nClaims = cl.groupBy("src").agg(count(lit(1)).as("n_claims"))
    // r6: |norm| <= |claims| (one row per distinct (obj, val)), so the
    // cached claim count is a safe upper bound to gate-hint the
    // per-round trust join (guide §3.1).
    val nCl = cl.count()
    var trust = nClaims.select(col("src"), lit(Scale).as("trust_fp"))
    var belief: DataFrame = null
    (1 to rounds).foreach { _ =>
      belief = cl.join(broadcast(trust), Seq("src"))
        .groupBy("obj", "val").agg(sum("trust_fp").as("belief_fp"))
      val norm = belief.withColumn("tot_fp",
          sum(col("belief_fp")).over(Window.partitionBy("obj")))
        .select(col("obj"), col("val"),
          idiv(col("belief_fp") * Scale, col("tot_fp")).as("norm_fp"))
      // r6: checkpoint the (source-scale, tiny) trust table each round —
      // without it round t's broadcast build re-plans the whole chained
      // lineage of rounds 1..t-1 (a 5-round resolve carried a ~75 KB
      // physical plan with every window/join quintupled).
      trust = graft.Materialize(
        cl.join(graft.Hints.bcastIf(norm, nCl), Seq("obj", "val"))
          .groupBy("src").agg(sum("norm_fp").as("sum_norm"))
          .join(broadcast(nClaims), Seq("src"))
          .select(col("src"),
            idiv(col("sum_norm"), col("n_claims")).as("trust_fp")),
        eager = false)
    }
    (trust, belief)
  }

  /** claims: (src, obj, val) — duplicates collapse first (a source saying
    * a thing twice is one claim). Returns one row per object:
    * (obj, resolved_val, belief_fp, n_values, n_sources). */
  def resolve(claims: DataFrame, rounds: Int = 5): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds 1..20, got $rounds")
    val cl = cleaned(claims).cache()
    val (_, belief) = iterate(cl, rounds)
    val stats = cl.groupBy("obj").agg(
      countDistinct("val").as("n_values"),
      countDistinct("src").as("n_sources"))
    belief.withColumn("rk", row_number().over(
        Window.partitionBy("obj").orderBy(col("belief_fp").desc, col("val"))))
      .where(col("rk") === 1).drop("rk")
      .join(stats, Seq("obj"))
      .select(col("obj"), col("val").as("resolved_val"), col("belief_fp"),
        col("n_values"), col("n_sources"))
  }

  /** The final per-source reliability table (same iteration, exposed for
    * auditing which feeds are untrustworthy). */
  def sourceTrust(claims: DataFrame, rounds: Int = 5): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds 1..20, got $rounds")
    iterate(cleaned(claims).cache(), rounds)._1
  }
}
