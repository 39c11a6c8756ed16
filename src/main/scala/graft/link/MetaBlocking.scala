package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Meta-blocking — weighted-node pruning over a redundancy-positive
  * blocking collection (Papadakis et al., TKDE 2014): when records are
  * blocked by MANY weak keys (tokens, q-grams, soundex codes…), the
  * number of blocks two records SHARE is an ER signal in itself, and
  * pruning each record's candidate list against its own mean weight
  * removes the quadratic tail of coincidental pairs while keeping the
  * high-redundancy ones. This is the step between "cheap blocking keys"
  * and "expensive pair scoring" at corpus scale: the scorer's input
  * shrinks by orders of magnitude with near-total recall.
  *
  * Stages (every one an edge- or node-scale shuffle, nothing
  * driver-side):
  *
  *   1. block purging: blocks larger than `maxBlock` are dropped WITH
  *      in-operator accounting ([[graft.Audit]]) — an oversized block
  *      (stopword token) is quadratic cost and near-zero signal;
  *   2. CBS weighting: pairs co-occurring in a surviving block, counted
  *      once per SHARED block (the comparison-propagation dedup is the
  *      groupBy itself) — weight = |blocks(a) ∩ blocks(b)|;
  *   3. weighted-node pruning: each record keeps incident pairs with
  *      weight ≥ its own MEAN incident weight; a pair survives if
  *      EITHER endpoint keeps it (the redefined-WNP union rule). The
  *      mean test is integer-exact — w·deg(x) ≥ sum(x) — so retention
  *      is bit-stable with no float thresholds.
  *
  * Output: (rec_a, rec_b, weight) with rec_a < rec_b, deterministic. */
object MetaBlocking {

  def wnpPairs(df: DataFrame, record: Column, block: Column,
      maxBlock: Int = 1000): DataFrame = {
    val b = df.select(block.cast("string").as("blk"),
        record.cast("string").as("rec"))
      .where(col("blk").isNotNull && col("rec").isNotNull)
      .distinct()
    val sizes = graft.Materialize(b.groupBy("blk").count(), eager = false)
    graft.Audit.capAccounting(sizes, maxBlock, "metaBlocking") {
      (nb, rows) =>
        s"metaBlocking: purging $nb over-cap blocks covering $rows " +
          s"assignments (maxBlock=$maxBlock); pairs sharing ONLY purged " +
          "blocks are not candidates — raise maxBlock or add sharper keys"
    }
    val kept = b.join(sizes.where(col("count") <= maxBlock).select("blk"),
      Seq("blk"), "left_semi")
    // CBS: one row per (pair, shared block), collapsed to the weight
    val w = kept.select(col("blk"), col("rec").as("ra"))
      .join(kept.select(col("blk"), col("rec").as("rb")), Seq("blk"))
      .where(col("ra") < col("rb"))
      .groupBy("ra", "rb").count()
      .select(col("ra"), col("rb"), col("count").as("w"))
    // per-node degree + weight sum over the symmetric incidence list
    val inc = w.select(col("ra").as("rec"), col("w"))
      .unionAll(w.select(col("rb").as("rec"), col("w")))
    val node = inc.groupBy("rec")
      .agg(count(lit(1)).as("deg"), sum("w").as("wsum"))
    // redefined WNP: kept by a iff w*deg(a) >= wsum(a); pair survives if
    // either endpoint keeps it
    val na = node.select(col("rec").as("ra"), col("deg").as("dega"),
      col("wsum").as("suma"))
    val nb2 = node.select(col("rec").as("rb"), col("deg").as("degb"),
      col("wsum").as("sumb"))
    w.join(na, Seq("ra")).join(nb2, Seq("rb"))
      .where(col("w") * col("dega") >= col("suma") ||
        col("w") * col("degb") >= col("sumb"))
      .select(col("ra").as("rec_a"), col("rb").as("rec_b"),
        col("w").as("weight"))
  }
}
