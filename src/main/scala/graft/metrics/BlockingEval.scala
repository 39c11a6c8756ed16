package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocking-quality metrics for entity resolution (Christen, "Data
  * Matching", 2012 §7.5) — the numbers that justify a blocking strategy
  * BEFORE paying for the match step:
  *
  *  - reduction ratio  RR = 1 − |candidate pairs| / |all pairs|
  *    (how much of the quadratic the blocking removed);
  *  - pairs completeness PC = |gold matches ∩ candidates| / |gold|
  *    (recall of the blocking — the matches it can still find);
  *  - pairs quality     PQ = |gold ∩ candidates| / |candidates|
  *    (precision of the candidate set).
  *
  * The linker already exposes per-strategy audit counts
  * (EntityLinker.blockStats, Similarity.bucketStats); this operator is
  * the STRATEGY-AGNOSTIC scorecard — it takes any (id, block) assignment
  * plus a gold match-pair set and scores the blocking itself, which is
  * how you choose between LSH bands / sorted neighborhood / phonetic keys
  * on a labeled sample.
  *
  * Exact counting at scale, never pair enumeration for the denominators:
  * candidate pairs Σ C(n_b, 2) and total pairs C(n, 2) come from
  * block-size aggregates in exact long arithmetic (shiftright, the q109
  * discipline); only the PC/PQ numerator joins the (small, labeled) gold
  * pairs against the blocking — two broadcastable equi joins. A pair
  * sharing SEVERAL blocks counts once (the gold join is per-pair
  * distinct); Σ C(n_b,2) counts it per block, so `candidate_pairs` is the
  * work the matcher pays, not the distinct-candidate count — both reads
  * are documented here, the scorecard reports both. */
object BlockingEval {

  /** @param blocks (idCol, blockCol) — one row per entity-block membership
    * @param gold   (aCol, bCol) — labeled true-match pairs (unordered)
    * @return one row: (n_entities, total_pairs, candidate_pairs,
    *         distinct_candidates, gold_pairs, covered_gold, rr, pc, pq) */
  def evaluate(blocks: DataFrame, gold: DataFrame,
      idCol: String = "id", blockCol: String = "block",
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    val b = blocks
      .select(col(idCol).cast("string").as("id"), col(blockCol).cast("string").as("block"))
      .where(col("id").isNotNull && col("block").isNotNull)
      .distinct()
    // block sizes → Σ C(n_b, 2) and n → C(n, 2), exact longs
    val sizes = b.groupBy("block").agg(count(lit(1)).as("nb"))
    val candAgg = sizes.agg(
      coalesce(sum(expr("(nb * (nb - 1)) div 2")), lit(0L)).as("candidate_pairs"))
    val nEnt = b.select(countDistinct(col("id")).as("n_entities"))
    // canonical unordered gold pairs
    val g = gold
      .select(col(aCol).cast("string").as("x"), col(bCol).cast("string").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("x"), greatest(col("x"), col("y")).as("y"))
      .distinct()
    // a gold pair is covered iff both sides share some block
    val bx = b.select(col("id").as("x"), col("block"))
    val by = b.select(col("id").as("y"), col("block"))
    val covered = g.join(bx, Seq("x")).join(by, Seq("y", "block"), "left_semi")
      .select("x", "y").distinct()
    val nGold = g.count()
    val nCovered = covered.count()
    // distinct candidate pairs (for PQ). r6: when every entity carries
    // exactly ONE block (the common disjoint-blocking case — one cheap
    // membership aggregate detects it), a pair can share at most one
    // block, so the distinct-pair count IS Σ C(n_b, 2) — the quadratic
    // per-block pair enumeration + distinct (450M shuffled rows on a
    // 25-block nation blocking) is skipped with an identical value.
    // Overlapping blockings (LSH bands, multi-key) keep the enumeration:
    // there a pair can repeat across blocks and only dedup counts it.
    val maxBlocksPerId = b.groupBy("id").agg(count(lit(1)).as("c"))
      .agg(coalesce(max("c"), lit(0L))).head().getLong(0)
    val nDistinctCand =
      if (maxBlocksPerId <= 1L)
        candAgg.head().getLong(0)
      else b.as("l").join(b.as("r"), Seq("block"))
        .where(col("l.id") < col("r.id"))
        .select(col("l.id").as("x"), col("r.id").as("y"))
        .distinct().count()
    val row = nEnt.crossJoin(candAgg)
    row.select(
        col("n_entities"),
        expr("(n_entities * (n_entities - 1)) div 2").as("total_pairs"),
        col("candidate_pairs"),
        lit(nDistinctCand).as("distinct_candidates"),
        lit(nGold).as("gold_pairs"),
        lit(nCovered).as("covered_gold"))
      .withColumn("rr",
        when(col("total_pairs") === 0, lit(null).cast("double"))
          .otherwise(round(lit(1.0) - col("distinct_candidates").cast("double")
            / col("total_pairs"), 6)))
      .withColumn("pc",
        when(col("gold_pairs") === 0, lit(null).cast("double"))
          .otherwise(round(col("covered_gold").cast("double") / col("gold_pairs"), 6)))
      .withColumn("pq",
        when(col("distinct_candidates") === 0, lit(null).cast("double"))
          .otherwise(round(col("covered_gold").cast("double")
            / col("distinct_candidates"), 6)))
  }
}
