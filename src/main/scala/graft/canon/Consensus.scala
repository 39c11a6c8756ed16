package graft.canon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Consensus (evidence-accumulation) clustering — Fred & Jain, TPAMI
  * 2005, the co-association majority vote: given K independent
  * clusterings of the same items (minhash groups, simhash groups,
  * embedding semdedup groups — each with its own failure mode), keep
  * the pairs co-clustered by at least `minVotes` DISTINCT methods and take
  * connected components. One method's false merge is outvoted; a true
  * duplicate pair missed by one signal survives on the other two. This
  * is the robust combiner a curation pipeline puts ABOVE its individual
  * near-dup operators before acting destructively (keep-one deletion).
  *
  * Shapes: per-method cluster self-joins generate co-association pairs
  * (Σ per-cluster C(n,2) — THE quadratic; clusters larger than
  * `maxCluster` are excluded WITH [[graft.Audit]] accounting, the
  * no-silent-caps rule), one pair-keyed vote count, a majority filter,
  * then [[ConnectedComponents]] over the surviving (batch-scale) edge
  * set; items in no surviving pair backfill as singletons so every
  * input item is labeled. Labels = min member id (CC's invariant).
  *
  * Output: (item, consensus) for every distinct input item. */
object Consensus {

  def majorityClusters(labels: DataFrame, method: Column, item: Column,
      label: Column, minVotes: Long, maxCluster: Int = 10000): DataFrame = {
    require(minVotes >= 1, "majorityClusters: minVotes must be >= 1")
    val l = labels.select(method.cast("string").as("m"),
        item.cast("string").as("i"), label.cast("string").as("g"))
      .where(col("m").isNotNull && col("i").isNotNull && col("g").isNotNull)
      .distinct()
    val sizes = graft.Materialize(l.groupBy("m", "g").count(), eager = false)
    graft.Audit.capAccounting(sizes, maxCluster, "majorityClusters") {
      (n, rows) =>
        s"majorityClusters: excluding $n over-cap clusters covering $rows " +
          s"memberships (maxCluster=$maxCluster); their co-association " +
          "votes are not cast — raise maxCluster or pre-split the method"
    }
    val kept = l.join(sizes.where(col("count") <= maxCluster)
      .select("m", "g"), Seq("m", "g"), "left_semi")
    // countDistinct, not count: a method with OVERLAPPING groups (e.g.
    // minhash band buckets — one pair co-bucketed in 3 bands) casts ONE
    // vote, so no single method can clear minVotes=2 alone and defeat
    // the cross-method majority (r4 ADVICE).
    val votes = kept.select(col("m"), col("g"), col("i").as("a"))
      .join(kept.select(col("m"), col("g"), col("i").as("b")), Seq("m", "g"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(countDistinct("m").as("votes"))
    val edges = votes.where(col("votes") >= minVotes)
      .select(col("a").as("src"), col("b").as("dst"))
    val cc = ConnectedComponents.run(edges)
    val items = l.select(col("i").as("id")).distinct()
    val singletons = items.join(cc, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    cc.union(singletons)
      .select(col("id").as("item"), col("component").as("consensus"))
  }
}
