package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Horn-rule mining over the triple store — the AMIE composition
  * fragment (Galárraga et al., WWW 2013): discover
  * `r1(x,z) ∧ r2(z,y) ⇒ p(x,y)` with support and confidence, the rules
  * a KG-construction pipeline turns into [[Inference]] materialization
  * input ("order's customer's nation IS the order's nation, 90% of the
  * time") and into anomaly queries (the 10% violating a 0.99 rule are
  * extraction errors to audit).
  *
  * Definitions (pair-based, AMIE's): body pairs B(r1,r2) = distinct
  * (x,y) connected by some z; support(r1,r2⇒p) = |B ∩ pairs(p)|;
  * confidence = support/|B| (the CWA form); head coverage =
  * support/|pairs(p)|. All ratios exact integer ppm floors via
  * decimal(38,0) — 10⁶·support·|B| products wrap int64 at 10¹² triples.
  *
  * Shapes: one entity-keyed self-join builds paths (THE skew point — a
  * mega-hub z multiplies in×out; entities with in·out > `maxFanout`
  * are excluded from the join WITH [[graft.Audit]] accounting, the
  * no-silent-caps rule), two distinct-pair aggregates, one (x,y) join
  * against heads, all shuffles on entity or predicate-pair keys —
  * nothing driver-side, output is predicate³-bounded.
  *
  * Output: (r1, r2, head, support, body_pairs, conf_ppm, hc_ppm),
  * support ≥ minSupport and conf_ppm ≥ minConfPpm. Trivial heads are
  * NOT excluded (p=r1 composition hits are real discoveries, e.g.
  * transitivity); callers filter if unwanted. */
object RuleMiner {

  def pathRules(triples: DataFrame, subjCol: Column, predCol: Column,
      objCol: Column, minSupport: Long = 10L, minConfPpm: Long = 100000L,
      maxFanout: Long = 1000000L): DataFrame = {
    val t = graft.Materialize(triples
      .select(subjCol.cast("string").as("s"), predCol.cast("string").as("p"),
        objCol.cast("string").as("o"))
      .where(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
      .distinct())
    // hub gate: in(z) × out(z) bounds the path rows z generates
    val zin = t.groupBy(col("o").as("z")).agg(count(lit(1)).as("zi"))
    val zout = t.groupBy(col("s").as("z")).agg(count(lit(1)).as("zo"))
    // the in×out product is exact in decimal then saturated to long:
    // zi·zo wraps int64 once both sides pass ~3e9 (real at 10^12
    // triples), and a wrapped-negative product would silently pass the
    // gate on exactly the hubs it exists to exclude
    val prod = col("zi").cast("decimal(38,0)") * col("zo").cast("decimal(38,0)")
    val sizes = graft.Materialize(
      zin.join(zout, Seq("z"))
        .select(col("z"),
          when(prod > lit(Long.MaxValue).cast("decimal(38,0)"),
            lit(Long.MaxValue)).otherwise(prod.cast("long")).as("count")),
      eager = false)
    graft.Audit.capAccounting(sizes, maxFanout, "pathRules") { (n, rows) =>
      s"pathRules: excluding $n hub entities generating $rows potential " +
        s"path rows (maxFanout=$maxFanout); rules whose only groundings " +
        "route through hubs lose support — raise maxFanout deliberately"
    }
    val hubs = sizes.where(col("count") > maxFanout).select("z")
    // r6: the hub count is one cheap scan of the materialized sizes
    // table — with zero hubs the two anti joins are identities, so skip
    // them (exact); and the triple count gate-hints the path self-join
    // and the head-pair join (§3.1), keeping the (larger) body-pair
    // stream un-shuffled within the gate.
    val nHubs = hubs.count()
    val mid = if (nHubs == 0) t
      else t.join(hubs.withColumnRenamed("z", "o"), Seq("o"), "left_anti")
    val mid2 = if (nHubs == 0) t
      else t.join(hubs.withColumnRenamed("z", "s"), Seq("s"), "left_anti")
    val nT = t.count()
    def h(df: DataFrame): DataFrame = graft.Hints.bcastIf(df, nT)
    val body = mid.select(col("s").as("x"), col("p").as("r1"), col("o").as("z"))
      .join(h(mid2.select(col("s").as("z"), col("p").as("r2"),
        col("o").as("y"))), Seq("z"))
      .select("r1", "r2", "x", "y").distinct()
    val bodyN = body.groupBy("r1", "r2").agg(count(lit(1)).as("body_pairs"))
    val headN = t.groupBy(col("p").as("head"))
      .agg(count(lit(1)).as("head_pairs"))
    val support = body
      .join(h(t.select(col("s").as("x"), col("p").as("head"),
        col("o").as("y"))), Seq("x", "y"))
      .groupBy("r1", "r2", "head").agg(count(lit(1)).as("support"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    support.join(bodyN, Seq("r1", "r2")).join(headN, Seq("head"))
      .where(col("support") >= minSupport)
      .select(col("r1"), col("r2"), col("head"), col("support"),
        col("body_pairs"),
        floor(dec(lit(1000000L)) * dec(col("support")) /
          dec(col("body_pairs"))).cast("long").as("conf_ppm"),
        floor(dec(lit(1000000L)) * dec(col("support")) /
          dec(col("head_pairs"))).cast("long").as("hc_ppm"))
      .where(col("conf_ppm") >= minConfPpm)
  }
}
