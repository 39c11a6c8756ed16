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

  /** B-cubed precision/recall/F1 (Bagga & Baldwin 1998; Amigó et al. 2009
    * showed it is the ER metric satisfying all four clustering-evaluation
    * constraints) — the PER-ITEM complement of pairwisePR: each item i
    * scores precision |C(i)∩L(i)|/|C(i)| and recall |C(i)∩L(i)|/|L(i)|,
    * averaged over items. Unlike pair counting it does not let one
    * mega-cluster's quadratic pair mass drown every other error — the
    * metric of record for mention-level entity clustering.
    *
    * Same contingency-table trick as pairwisePR: every item in cell
    * (p, g, n) has the SAME per-item scores n/|p| and n/|g|, so the item
    * average is Σ_cells n · (n/size) / N — cell-scale arithmetic, zero
    * item enumeration. Exact-integer contract: per-item scores are
    * truncating ppm (n·10⁶ div size), summed as exact longs, then one
    * truncating div by N — bit-stable and oracle-replayable (a float mean
    * would drift by accumulation order); the systematic truncation bias
    * is < 1 ppm per stage. F1 = 2PR/(P+R) in the same truncating ppm.
    *
    * Output (1 row): n_items, bcubed_precision_ppm, bcubed_recall_ppm,
    * bcubed_f1_ppm — nulls when there are no items. Null id/pred/gold
    * rows drop; one row per item is the caller's contract. */
  def bcubed(assign: DataFrame, idCol: String, predCol: String,
      goldCol: String): DataFrame = {
    val idiv = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) => call_function("div", a, b)
    val cells = assign
      .where(col(idCol).isNotNull && col(predCol).isNotNull &&
        col(goldCol).isNotNull)
      .groupBy(col(predCol).as("__p"), col(goldCol).as("__g"))
      .agg(count(lit(1)).as("__n"))
    val withSizes = cells
      .join(cells.groupBy("__p").agg(sum("__n").as("__sp")), "__p")
      .join(cells.groupBy("__g").agg(sum("__n").as("__sg")), "__g")
    val sums = withSizes.agg(
      coalesce(sum("__n"), lit(0L)).as("n_items"),
      sum(col("__n") * idiv(col("__n") * 1000000L, col("__sp"))).as("__tp"),
      sum(col("__n") * idiv(col("__n") * 1000000L, col("__sg"))).as("__tr"))
    val p = when(col("n_items") > 0, idiv(col("__tp"), col("n_items")))
    val r = when(col("n_items") > 0, idiv(col("__tr"), col("n_items")))
    sums.select(col("n_items"),
        p.as("bcubed_precision_ppm"), r.as("bcubed_recall_ppm"))
      .select(col("n_items"), col("bcubed_precision_ppm"),
        col("bcubed_recall_ppm"),
        when(col("bcubed_precision_ppm") + col("bcubed_recall_ppm") > 0,
          idiv(lit(2L) * col("bcubed_precision_ppm") *
            col("bcubed_recall_ppm"),
            col("bcubed_precision_ppm") + col("bcubed_recall_ppm")))
          .as("bcubed_f1_ppm"))
  }
}
