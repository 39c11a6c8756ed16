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

  /** The static claim structure, pre-grouped ONCE (r6, guide §2.4): one
    * row per object carrying `entries = [(val, srcs[]), ...]` — vals
    * distinct within the object, srcs the claiming sources of that val.
    * The claims table never shuffles again after this: every round's
    * belief sum and normalization is a per-row HOF over `entries` with
    * the (sources-scale, tiny) trust table folded in as a one-row
    * broadcast map — the PageRank dangling idiom. The previous form paid
    * a claims-scale (obj,val) aggregate + an obj window + a claims-scale
    * join-back PER ROUND. */
  private def perObject(cl: DataFrame): (DataFrame, DataFrame) = {
    // r6 follow-up: collect_set dedups duplicate (src, obj, val) claims
    // INSIDE the first aggregation — the separate claims-scale distinct
    // exchange is gone; n_claims per source reads the checkpointed
    // per-(obj,val) sets narrowly instead of re-scanning the claims.
    val perVal = graft.Materialize(
      cl.groupBy("obj", "val").agg(collect_set("src").as("srcs")),
      eager = false)
    val perObj = graft.Materialize(
      perVal.groupBy("obj")
        .agg(collect_list(struct(col("val"), col("srcs"))).as("entries")),
      eager = false)
    val nClaims = perVal.select(explode(col("srcs")).as("src"))
      .groupBy("src").agg(count(lit(1)).as("n_claims"))
    (perObj, nClaims)
  }

  /** T rounds of the fixpoint: (final trust by src, final per-object
    * beliefs as `(obj, bent[(val, srcs, belief_fp)])`). */
  private def iterate(perObj: DataFrame, nClaims: DataFrame, rounds: Int)
      : (DataFrame, DataFrame) = {
    var trust = nClaims.select(col("src"), lit(Scale).as("trust_fp"))
    var beliefs: DataFrame = null
    (1 to rounds).foreach { _ =>
      // trust as a one-row map column, broadcast under every object row
      val tm = trust.agg(map_from_entries(
        collect_list(struct(col("src"), col("trust_fp")))).as("__tm"))
      // belief_t(o,v) = Σ_{s claims (o,v)} trust_{t-1}(s): exact long
      // adds inside a codegen HOF — summation order is irrelevant
      beliefs = perObj.crossJoin(broadcast(tm))
        .select(col("obj"), expr(
          "transform(entries, e -> struct(e.val as val, e.srcs as srcs, " +
            "aggregate(e.srcs, 0L, (a, s) -> a + element_at(__tm, s)) " +
            "as belief_fp))").as("bent"))
      // norm_t(o,v) = belief·10^6 div Σ_v' belief — both factors live in
      // the same row now, so the per-round obj window is gone; trust_t =
      // per-source mean of its claims' norms (explode → ≤|sources| rows
      // after map-side partial aggregation). Checkpoint the tiny trust
      // table so round t's broadcast build does not re-plan rounds
      // 1..t-1 (the chained-lineage finding, §5).
      trust = graft.Materialize(beliefs
        .withColumn("tot_fp",
          expr("aggregate(bent, 0L, (a, e) -> a + e.belief_fp)"))
        .select(explode(expr(
          s"transform(bent, e -> struct(e.srcs as srcs, " +
            s"(e.belief_fp * ${Scale}L) div tot_fp as norm_fp))")).as("e"))
        .select(explode(col("e.srcs")).as("src"), col("e.norm_fp").as("norm_fp"))
        .groupBy("src").agg(sum("norm_fp").as("sum_norm"))
        .join(broadcast(nClaims), Seq("src"))
        .select(col("src"),
          idiv(col("sum_norm"), col("n_claims")).as("trust_fp")),
        eager = false)
    }
    (trust, beliefs)
  }

  /** claims: (src, obj, val) — duplicates collapse first (a source saying
    * a thing twice is one claim). Returns one row per object:
    * (obj, resolved_val, belief_fp, n_values, n_sources). */
  def resolve(claims: DataFrame, rounds: Int = 5): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds 1..20, got $rounds")
    val (perObj, nClaims) = perObject(cleaned(claims))
    val (_, beliefs) = iterate(perObj, nClaims, rounds)
    // winner + stats are all per-row now: argmax by (belief desc, val
    // asc) — the exact row_number order, vals unique within the object —
    // via a struct sort; n_values = |entries|; n_sources = distinct
    // sources across the object's entries.
    beliefs
      .withColumn("__w", expr(
        "element_at(array_sort(transform(bent, " +
          "e -> struct(-e.belief_fp as nb, e.val as val, " +
          "e.belief_fp as belief_fp))), 1)"))
      .select(col("obj"), col("__w.val").as("resolved_val"),
        col("__w.belief_fp").as("belief_fp"),
        size(col("bent")).cast("long").as("n_values"),
        size(expr("array_distinct(flatten(transform(bent, e -> e.srcs)))"))
          .cast("long").as("n_sources"))
  }

  /** The final per-source reliability table (same iteration, exposed for
    * auditing which feeds are untrustworthy). */
  def sourceTrust(claims: DataFrame, rounds: Int = 5): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds 1..20, got $rounds")
    val (perObj, nClaims) = perObject(cleaned(claims))
    iterate(perObj, nClaims, rounds)._1
  }
}
