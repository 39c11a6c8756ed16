package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bipartite co-occurrence projection — from (container, item) membership
  * rows to the weighted item–item graph: entities co-mentioned across
  * documents (the edge source link prediction and EL-coherence consume),
  * parts co-ordered, terms co-occurring in passages. The projection is the
  * standard first step from raw membership data to a homogeneous graph.
  *
  * Shape: dedup membership → container-keyed self-join (item_a < item_b) →
  * pair-keyed count, `minCount` filter. Every step is an equi join or a
  * map-side-combined aggregate. The hazard is the per-container QUADRATIC
  * (a container with d items emits d·(d−1)/2 pairs; one 10⁶-item container
  * is 5·10¹¹ rows): containers over `maxPerContainer` are EXCLUDED, with
  * the drop counted and warned in-operator (the no-silent-caps rule;
  * pathological containers — "the document every entity appears in" —
  * carry no pair signal anyway, the same argument as LinkPrediction's
  * maxHubDegree). The size gate reuses the same lazily-materialized
  * membership table the join reads, so accounting adds no extra job.
  */
object Cooccur {

  /** Deduped membership restricted to containers within the cap, as ONE
    * sorted item array per kept container (r6) — `collect_set` dedups
    * inside the aggregation, so the old `distinct` + `groupBy c count` +
    * join-back (three container-keyed exchanges) collapse into a single
    * groupBy; the cap filter and its accounting read the array sizes
    * narrowly. Shared by the raw projection and the association-scored
    * one (margins MUST come from the same kept set the pairs come from,
    * or the scores are inconsistent). */
  private def keptArrays(df: DataFrame, containerCol: String,
      itemCol: String, maxPerContainer: Int): DataFrame = {
    val arr = graft.Materialize(df
      .select(col(containerCol).cast("string").as("c"),
        col(itemCol).cast("string").as("i"))
      .where(col("c").isNotNull && col("i").isNotNull)
      .groupBy("c").agg(sort_array(collect_set(col("i"))).as("items")),
      eager = false)
    graft.Audit.capAccounting(
      arr.select(size(col("items")).cast("long").as("count")),
      maxPerContainer, "Cooccur.project") { (nGroups, nRows) =>
        s"Cooccur.project: excluding $nGroups containers over " +
          s"$maxPerContainer items (covering $nRows membership rows); " +
          "their pairs are not counted — raise maxPerContainer if they " +
          "carry signal"
    }
    arr.where(size(col("items")) <= maxPerContainer)
  }

  /** Per-container quadratic by sorted-array suffix expansion (narrow
    * until the pair aggregate — the container-keyed self-join shuffled
    * the kept membership twice more); `sort_array` makes item_a < item_b
    * by construction, the exact pair set of the old a<b join. */
  private def pairCounts(kept: DataFrame, minCount: Long): DataFrame =
    kept.select(posexplode(col("items")).as(Seq("i0", "item_a")), col("items"))
      .select(col("item_a"),
        explode(expr("slice(items, i0 + 2, size(items))")).as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCount)

  /** (item_a, item_b, n_common) with item_a < item_b (string order — cast
    * upstream for numeric ids if numeric order matters downstream; counts
    * are unaffected) and n_common ≥ minCount. */
  def project(df: DataFrame, containerCol: String, itemCol: String,
      minCount: Long = 2L, maxPerContainer: Int = 10000): DataFrame = {
    require(minCount >= 1, "Cooccur.project: minCount must be >= 1")
    require(maxPerContainer > 1, "Cooccur.project: maxPerContainer must be > 1")
    pairCounts(keptArrays(df, containerCol, itemCol, maxPerContainer),
      minCount)
  }

  /** The projection SCORED by association strength — raw counts rank
    * mega-popular items first regardless of affinity; lift/PMI normalize
    * by the margins (Church & Hanks 1990): over the kept membership,
    * lift = (n_ab·N) / (n_a·n_b) with N = distinct kept containers and
    * n_x = containers containing x, pmi = ln(lift). Margins, N, and the
    * pairs all derive from the SAME cap-filtered deduped membership (a
    * capped container is absent from every factor consistently).
    *
    * lift is two double products + one division of exactly-represented
    * integers — engine-reproducible without libm; pmi adds one `ln`
    * (rounded 6 dp, the importance-weights precedent). Margins are
    * item-scale; N folds in via a 1-row broadcast cross join (the
    * PageRank dangling idiom — no driver collect).
    *
    * Output: (item_a, item_b, n_common, lift@6dp, pmi@6dp). */
  def pmi(df: DataFrame, containerCol: String, itemCol: String,
      minCount: Long = 2L, maxPerContainer: Int = 10000): DataFrame = {
    require(minCount >= 1, "Cooccur.pmi: minCount must be >= 1")
    require(maxPerContainer > 1, "Cooccur.pmi: maxPerContainer must be > 1")
    val kept = keptArrays(df, containerCol, itemCol, maxPerContainer)
    val pairs = pairCounts(kept, minCount)
    val margins = kept.select(explode(col("items")).as("i"))
      .groupBy("i").agg(count(lit(1)).as("__n"))
    // one row per kept container, so N is a plain count
    val total = kept.agg(count(lit(1)).as("__N"))
    val lift = (col("n_common").cast("double") * col("__N").cast("double")) /
      (col("__na").cast("double") * col("__nb").cast("double"))
    pairs
      .join(margins.select(col("i").as("item_a"), col("__n").as("__na")),
        Seq("item_a"))
      .join(margins.select(col("i").as("item_b"), col("__n").as("__nb")),
        Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_common"),
        round(lift, 6).as("lift"), round(log(lift), 6).as("pmi"))
  }
}
