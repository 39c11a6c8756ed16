package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), for training-data curation (near-dup mining, retrieval).
  *
  *  - bruteForceTopK: exact cosine top-k of a SMALL broadcast query set
  *    against the full corpus — the correctness baseline. One broadcast
  *    join, no shuffle of the corpus side, one per-query top-k.
  *  - lshTopK: random-hyperplane LSH bucketing — the 100 TB path: corpus is
  *    hashed once into buckets; queries probe only their own bucket.
  *  - neardupPairs: all-pairs cosine ≥ t within LSH buckets.
  *
  * Dot products fold left-to-right (functions.aggregate), so results are
  * bitwise-reproducible and match the oracle's sequential fold exactly.
  */
object Similarity {

  /** Left-fold dot product of two float-array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Exact cosine top-k: for each row of `queries`, the k nearest corpus
    * rows (excluding self-matches by id). Output:
    * (query_id, neighbor_id, rank, sim). Ties broken by neighbor id —
    * fully deterministic. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms precomputed on each side BEFORE the join — one pass per vector
    // instead of one per (query, corpus) pair
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(
        when(col("qn") * col("cn") === 0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * ±1 from xxhash64 parity — reproducible across any cluster layout. */
  private def planeSign(p: Column, d: Column): Column =
    when(pmod(xxhash64(p, d), lit(2)) === 0, 1.0).otherwise(-1.0)

  /** Random-hyperplane LSH bucket id: `planes` sign bits packed into a long.
    * sign bit p = sign of Σ_d v[d] · s(p,d). */
  def lshBucket(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, d) => v.cast("double") * planeSign(lit(p), d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Bucketed ANN top-k: queries probe only their own hyperplane bucket.
    * Recall < 1 by construction; verified against bruteForceTopK in tests.
    * At scale the corpus hash is computed once (narrow) and the join is a
    * shuffle on bucket id instead of a broadcast of the corpus. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), lshBucket(col(vecCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"), lshBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(
        when(col("qn") * col("cn") === 0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Embedding-cosine near-duplicate pairs (sim ≥ threshold), LSH-blocked:
    * only pairs sharing a bucket are scored. */
  def neardupPairs(corpus: DataFrame, threshold: Double, planes: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nm"), lshBucket(col(vecCol), planes).as("bucket"))
      .persist()
    c.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"), col("nm").as("n_a"))
      .join(c.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"), col("nm").as("n_b")),
        Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", round(
        when(col("n_a") * col("n_b") === 0, 0.0)
          .otherwise(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))), 4))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
      .distinct()
  }
}
