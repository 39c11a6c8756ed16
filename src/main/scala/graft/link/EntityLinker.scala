package graft.link

import graft.tag.Taggers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity linking of vendor/client surface forms.
  *
  * Blocking: MinHash-LSH over the name token set — k independent min-hashes
  * (xxhash64 with distinct seeds), banded b×1 for high recall at small
  * signature cost; pairs sharing any band bucket become candidates.
  * Re-scoring: token-set Jaccard + edit-distance similarity
  * (model_evaluation.py:312,330-336 semantics via built-in `levenshtein`).
  * An exact blocking key on the ICE identifier (the Moroccan VAT-id-class
  * field, complex_facture_generator.py:151) contributes additional edges —
  * standard identifier-based linking; the LSH path is exercised separately
  * in tests with `useIce = false`.
  *
  * The reference itself only ever matches exact gazetteer names
  * (complex_facture_generator.py:40-61 fixed pools); fuzzy EL is the
  * north_star extension (SURVEY.md §2.3 J6).
  *
  * Scale notes: the self-join is on (band, minhash) block keys, never a
  * cross join; pathological buckets (stop-token collisions) are capped at
  * `maxBucket` entities and dropped from LSH candidates (they are still
  * recoverable via the identifier key), bounding the quadratic blow-up.
  */
object EntityLinker {

  /** Distinct entities with blocking attributes from the mention table
    * produced by Extract.vendorMentions. One shuffle (groupBy entity_key). */
  def entities(mentions: DataFrame): DataFrame =
    mentions
      .groupBy("entity_key")
      .agg(
        min("surface").as("surface"),
        count(lit(1)).as("n_mentions"),
        min(when(col("ice") =!= "", col("ice"))).as("ice"))
      .withColumn("tokens", array_distinct(split(col("entity_key"), "_")))
      // reused by 4 scan branches (blocks × bucket sizes × 2 join sides);
      // localCheckpoint instead of persist: entity tables are small, the
      // blocks self-clean when unreferenced (no CacheManager leak across
      // repeated linker calls in a long-lived session)
      .localCheckpoint()

  /** Candidate sameAs edges (src < dst, entity_key level). */
  def candidateEdges(
      mentions: DataFrame,
      numHashes: Int = 8,
      jaccardMin: Double = 0.6,
      editSimMin: Double = 0.85,
      useIce: Boolean = true,
      maxBucket: Int = 1000): DataFrame =
    candidateEdgesFromEntities(entities(mentions), numHashes, jaccardMin,
      editSimMin, useIce, maxBucket)

  /** Same as candidateEdges but over a pre-built (persisted) entity table —
    * callers that also need the entities avoid computing them twice. */
  def candidateEdgesFromEntities(
      ents: DataFrame,
      numHashes: Int = 8,
      jaccardMin: Double = 0.6,
      editSimMin: Double = 0.85,
      useIce: Boolean = true,
      maxBucket: Int = 1000): DataFrame = {

    // MinHash signature: sig_i = min over tokens of xxhash64(token, seed=i)
    val sigs = (0 until numHashes).map { i =>
      array_min(transform(col("tokens"), t => xxhash64(t, lit(i))))
    }
    val blocks = ents
      .select(col("entity_key"), col("surface"), col("tokens"), col("ice"),
        posexplode(array(sigs: _*)).as(Seq("band", "h")))

    // cap pathological buckets
    val bucketSizes = blocks.groupBy("band", "h").count()
    val keptBlocks = blocks
      .join(bucketSizes.where(col("count") <= maxBucket), Seq("band", "h"))
      .drop("count")

    val l = keptBlocks.select(
      col("band"), col("h"), col("entity_key").as("src"),
      col("surface").as("s_surface"), col("tokens").as("s_tokens"), col("ice").as("s_ice"))
    val r = keptBlocks.select(
      col("band"), col("h"), col("entity_key").as("dst"),
      col("surface").as("d_surface"), col("tokens").as("d_tokens"), col("ice").as("d_ice"))

    val jaccard =
      size(array_intersect(col("s_tokens"), col("d_tokens"))).cast("double") /
        size(array_union(col("s_tokens"), col("d_tokens"))).cast("double")

    // Strong-identifier veto: two entities that BOTH carry a known ICE that
    // DISAGREES are never the same company, whatever their name similarity
    // ("RABAT BUILDING SOLUTIONS" ≁ "RABAT BUSINESS SOLUTIONS").
    val iceConflict =
      col("s_ice").isNotNull && col("d_ice").isNotNull && col("s_ice") =!= col("d_ice")

    val lshEdges = l.join(r, Seq("band", "h"))
      .where(col("src") < col("dst"))
      .where(!iceConflict)
      .where(jaccard >= jaccardMin ||
        Taggers.editSimilarity(col("s_surface"), col("d_surface")) >= editSimMin)
      .select("src", "dst")
      .distinct()

    if (!useIce) lshEdges
    else {
      val withIce = ents.where(col("ice").isNotNull)
      val iceEdges = withIce.select(col("ice"), col("entity_key").as("src"))
        .join(withIce.select(col("ice"), col("entity_key").as("dst")), "ice")
        .where(col("src") < col("dst"))
        .select("src", "dst")
      lshEdges.union(iceEdges).distinct()
    }
  }

  /** Bucket-size audit for the LSH blocking — "no silent caps": rows with
    * `capped = true` are the buckets candidateEdges drops at `maxBucket`.
    * Run this alongside linking to quantify (and log) what the cap costs. */
  def blockStats(mentions: DataFrame, numHashes: Int = 8,
      maxBucket: Int = 1000): DataFrame = {
    val ents = entities(mentions)
    val sigs = (0 until numHashes).map { i =>
      array_min(transform(col("tokens"), t => xxhash64(t, lit(i))))
    }
    ents.select(posexplode(array(sigs: _*)).as(Seq("band", "h")))
      .groupBy("band", "h").count()
      .withColumn("capped", col("count") > maxBucket)
  }
}
