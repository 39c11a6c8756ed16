package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise clustering agreement — the standard external evaluation of an
  * entity-resolution / dedup clustering against a gold partition
  * (pairwise P/R/F1 and Adjusted Rand Index; Hubert & Arabie 1985):
  * "of the pairs my clustering merged, how many should be merged" is THE
  * metric that grades `Dedup.dupGroups` / `EntityLinker` output, because
  * it weights a wrongly-merged mega-cluster by its quadratic pair count
  * rather than one mistake.
  *
  * Scale: the naive definition enumerates O(Σ n_c²) intra-cluster pairs
  * — a single million-row cluster is 5·10¹¹ pairs. This computes every
  * pair count from the CONTINGENCY TABLE instead: one (pred, gold)
  * count aggregate (the only row-scale exchange, map-side combined),
  * then cluster sizes are row-sums/col-sums of the cells and every pair
  * total is Σ C(n,2) over cell-scale rows. Zero pair enumeration; the
  * result is identical because pairs agree iff they share a contingency
  * cell.
  *
  * All pair counts accumulate as exact longs (caller contract:
  * Σ C(n,2) < 2⁶³ — holds to ~4·10⁹-row clusters); the final ratios and
  * the ARI expected-index term are a fixed double expression rounded
  * @6dp. Rows with a null id/pred/gold drop; one row per item is the
  * caller's contract (duplicated ids would double-vote).
  *
  * Output (1 row): n_items, pred_pairs, gold_pairs, agree_pairs,
  * pair_precision, pair_recall, pair_f1, ari. Degenerate edges pinned:
  * no pred pairs → precision null; no gold pairs → recall null; f1 null
  * unless p+r > 0; ARI null when the denominator is 0 (both partitions
  * all-singletons or one cluster covering everything — agreement is
  * undefined, not 1.0).
  */
object ClusterEval {

  def pairwisePR(assign: DataFrame, idCol: String, predCol: String,
      goldCol: String): DataFrame = {
    // C(n,2) in exact long arithmetic: n(n-1) is even, so a right shift
    // halves exactly (Spark's `/` on longs would go through double and
    // lose exactness past 2^53)
    def c2(c: org.apache.spark.sql.Column) =
      shiftright((c * (c - 1)).cast("long"), 1)

    val cells = assign
      .where(col(idCol).isNotNull && col(predCol).isNotNull &&
        col(goldCol).isNotNull)
      .groupBy(col(predCol).as("__p"), col(goldCol).as("__g"))
      .agg(count(lit(1)).as("__n"))

    // cluster sizes = margins of the contingency table (cell-scale aggs)
    val predSizes = cells.groupBy("__p").agg(sum("__n").as("__a"))
    val goldSizes = cells.groupBy("__g").agg(sum("__n").as("__b"))

    val sums = cells.agg(sum("__n").as("n_items"),
        sum(c2(col("__n"))).as("agree_pairs"))
      .crossJoin(predSizes.agg(sum(c2(col("__a"))).as("pred_pairs")))
      .crossJoin(goldSizes.agg(sum(c2(col("__b"))).as("gold_pairs")))

    val total = c2(col("n_items")).cast("double")
    val idx = col("agree_pairs").cast("double")
    val ep = col("pred_pairs").cast("double")
    val eg = col("gold_pairs").cast("double")
    val expected = ep * eg / total
    val maxIdx = (ep + eg) / 2
    val p = when(col("pred_pairs") > 0, idx / ep)
    val r = when(col("gold_pairs") > 0, idx / eg)
    sums.select(
      coalesce(col("n_items"), lit(0L)).as("n_items"),
      coalesce(col("pred_pairs"), lit(0L)).as("pred_pairs"),
      coalesce(col("gold_pairs"), lit(0L)).as("gold_pairs"),
      coalesce(col("agree_pairs"), lit(0L)).as("agree_pairs"),
      round(p, 6).as("pair_precision"),
      round(r, 6).as("pair_recall"),
      round(when(p + r > 0, lit(2) * p * r / (p + r)), 6).as("pair_f1"),
      round(when(abs(maxIdx - expected) > 0,
        (idx - expected) / (maxIdx - expected)), 6).as("ari"))
  }
}
