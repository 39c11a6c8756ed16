package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), for training-data curation (near-dup mining, retrieval).
  *
  *  - bruteForceTopK: exact cosine top-k of a SMALL broadcast query set
  *    against the full corpus — the correctness baseline. One broadcast
  *    join, no shuffle of the corpus side, one per-query top-k.
  *  - lshTopK / neardupPairs: banded random-hyperplane LSH — `tables`
  *    independent hash tables of `planes` sign bits each; a pair is a
  *    candidate if it agrees on ALL bits of ANY table (the AND-OR banding
  *    construction, same as minhashNearDup). Candidates are then verified
  *    with EXACT cosine, so precision is 1.0 and recall is governed by
  *    p = 1 − θ/π per bit:  recall(s) = 1 − (1 − p^planes)^tables
  *    (`recallEstimate` below — pick parameters against it, don't guess).
  *
  * Parameter guidance at scale: hyperplane LSH pays off when the threshold
  * is HIGH (θ small, p → 1): few planes prune hard at high recall. At low
  * thresholds (≥0.2 ≈ θ 78°) the true-pair set itself approaches a constant
  * fraction of all pairs — output is Θ(n²) and NO index beats a verified
  * scan by more than a constant; use more tables of fewer planes and treat
  * the candidate volume as the price of the recall target.
  *
  * Dot products fold left-to-right in double precision (native `vec_dot`
  * expression, codegen'd — graft.functions.VectorDot), so results are
  * bitwise-reproducible and match the oracle's sequential fold exactly.
  */
object Similarity {

  /** Left-fold dot product of two float-array columns in double precision
    * (native codegen expression; see VectorDot for the exact semantics).
    * Built directly from the Expression — works on ANY SparkSession, not
    * just ones with GraftExtensions installed; the `vec_dot` SQL
    * registration (Sessions.local) remains for SQL-string users. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.VectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Expected recall of the banded construction for a true pair at cosine
    * similarity `s`: bits agree independently with p = 1 − acos(s)/π. */
  def recallEstimate(s: Double, planes: Int, tables: Int): Double = {
    val p = 1.0 - math.acos(s) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, planes), tables)
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

  /** Hyperplane bucket id for one table: `planes` sign bits packed into a
    * long; table t uses the independent global planes
    * [t·planes, (t+1)·planes). sign bit p = sign of Σ_d v[d] · s(p,d). */
  private def bucketOf(vec: Column, planes: Int, table: Int): Column =
    (0 until planes).map { p =>
      val gp = table * planes + p
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, d) => v.cast("double") * planeSign(lit(gp), d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** All per-table bucket ids of a vector, as array<long> (index = table). */
  def lshBuckets(vec: Column, planes: Int, tables: Int): Column =
    array((0 until tables).map(t => bucketOf(vec, planes, t)): _*)

  /** Single-table bucket id (kept for bucket-audit queries). */
  def lshBucket(vec: Column, planes: Int): Column = bucketOf(vec, planes, 0)

  // ---- typed fast bucket path (same story as Dedup's fast minhash: the
  // Column form evaluates planes×tables interpreted aggregate() folds per
  // vector; this JIT loop computes all buckets + the norm in ONE pass, with
  // EXACT xxhash64 parity — LshParity test) ------------------------------

  /** ±1 sign matrix signs(globalPlane)(dim), the Scala twin of `planeSign`:
    * sign = +1 iff pmod(xxhash64(p, d), 2) == 0 with the same seed chain
    * the Column expression compiles to (seed 42, fold over args). */
  def lshSignsMatrix(dim: Int, planes: Int, tables: Int): Array[Array[Double]] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.IntegerType
    Array.tabulate(tables * planes) { gp =>
      val seedP = XxHash64Function.hash(gp, IntegerType, 42L)
      Array.tabulate(dim) { d =>
        val h = XxHash64Function.hash(d, IntegerType, seedP)
        if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** All per-table buckets of one vector against a precomputed sign matrix
    * (left-fold projection order = the Column form's aggregate). */
  def lshBucketsScala(vec: Array[Float], signs: Array[Array[Double]],
      planes: Int, tables: Int): Array[Long] =
    Array.tabulate(tables) { t =>
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val s = signs(t * planes + p)
        var proj = 0.0
        var d = 0
        while (d < vec.length) { proj += vec(d).toDouble * s(d); d += 1 }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }

  /** (id, v, nm, buckets) — typed single-pass when the id is integral
    * (JIT buckets + norm), Column HOFs otherwise. Identical output either
    * way (LshParity). */
  private def withBuckets(corpus: DataFrame, planes: Int, tables: Int,
      idCol: String, vecCol: String): DataFrame = {
    val idIsIntegral = corpus.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    if (idIsIntegral) {
      val spark = corpus.sparkSession
      import spark.implicits._
      // null embeddings drop BEFORE the typed map (the Column path's null
      // vector null-propagates out of every join) — parity, not an NPE
      corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
        .where(col("v").isNotNull)
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          var signs: Array[Array[Double]] = null
          it.map { case (id, v) =>
            if (signs == null || signs(0).length != v.length)
              signs = lshSignsMatrix(v.length, planes, tables)
            var sq = 0.0
            var d = 0
            while (d < v.length) { sq += v(d).toDouble * v(d).toDouble; d += 1 }
            (id, v, math.sqrt(sq), lshBucketsScala(v, signs, planes, tables))
          }
        }
        .toDF("id", "v", "nm", "buckets")
    } else
      corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("nm"),
        lshBuckets(col(vecCol), planes, tables).as("buckets"))
  }

  /** Bucketed ANN top-k: queries probe their bucket in each of `tables`
    * tables; candidates deduplicated, then scored with exact cosine.
    * Recall < 1 by construction — size it with `recallEstimate`; verified
    * against bruteForceTopK in SimilaritySpec. At scale the corpus hash is
    * computed once (narrow) and each table join is a shuffle on bucket id
    * instead of a broadcast of the corpus. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
      tables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = withBuckets(corpus, planes, tables, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("v").as("cv"), col("nm").as("cn"),
        posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val q = withBuckets(queries, planes, tables, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nm").as("qn"),
        posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val scored = c.join(q, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qv", "qn", "cv", "cn")
      .dropDuplicates("query_id", "neighbor_id") // a pair can agree in >1 table
      .withColumn("sim", round(
        when(col("qn") * col("cn") === 0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Embedding-cosine near-duplicate pairs (sim ≥ threshold), LSH-blocked:
    * candidate pairs share a bucket in ≥1 of `tables` tables; every
    * candidate is verified with exact cosine (precision 1.0). Defaults hit
    * recallEstimate(0.2, 2, 12) ≈ 0.99 at the lowest similarity of
    * interest — low-threshold mining needs many shallow tables (scale note
    * in the object doc). Bands carry ONLY ids; vectors join back onto the
    * deduplicated candidate set. */
  def neardupPairs(corpus: DataFrame, threshold: Double, planes: Int = 2,
      tables: Int = 12,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // materialized (config-gated, graft.Materialize): reused by the band
    // explode and both vector join-backs; default localCheckpoint blocks
    // self-clean when the result goes out of scope (no persist leak)
    val c = graft.Materialize(withBuckets(corpus, planes, tables, idCol, vecCol))
    val banded = c.select(col("id"),
      posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val cand = banded.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("tbl"), col("bucket"), col("id").as("id_b")),
        Seq("tbl", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(c.select(col("id").as("id_a"), col("v").as("v_a"), col("nm").as("n_a")), "id_a")
      .join(c.select(col("id").as("id_b"), col("v").as("v_b"), col("nm").as("n_b")), "id_b")
      .withColumn("sim_raw",
        when(col("n_a") * col("n_b") === 0, 0.0)
          .otherwise(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
      .where(col("sim_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim_raw"), 4).as("sim"))
  }

  /** Bucket-size audit — "no silent caps": the per-(table, bucket)
    * population that bounds the candidate volume Σ f². */
  def bucketStats(corpus: DataFrame, planes: Int, tables: Int,
      vecCol: String = "embedding"): DataFrame =
    corpus.select(posexplode(lshBuckets(col(vecCol), planes, tables)).as(Seq("tbl", "bucket")))
      .groupBy("tbl", "bucket").count()

  // ---- IVF (inverted-file) ANN — the second scale path of the builder
  // mandate ("an IVF or LSH-bucketed variant"). Coarse quantizer = MLlib
  // k-means (compose existing ops before building custom ones); inverted
  // lists = the corpus partitioned by centroid id; queries probe their
  // `nprobe` nearest centroids and rerank with exact cosine. -------------

  /** Train the coarse quantizer: k centroids over a SAMPLE of the corpus
    * embeddings (a 16–1024-centroid codebook does not need 10^9 rows —
    * k-means iterates maxIter times over its input, so at scale the fit
    * must see a bounded sample, not the corpus). `fitSampleRows` caps the
    * expected training size via the SAME id-hash-selected, id-sorted
    * sample the deterministic quantizer uses (deterministicFitSample —
    * layout-independent, so the training SET never changes with
    * partition layout; the MLlib fit itself remains the documented
    * non-deterministic step, its treeAggregate combine order injecting
    * fp noise into the centers). ≤ 0 disables sampling (fit on
    * everything). Returns the centers (small — they ride to executors in
    * closures). */
  def ivfCentroids(corpus: DataFrame, nCentroids: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L, fitSampleRows: Int = 100000): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val feats =
      if (fitSampleRows <= 0)
        corpus.select(
          array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      else
        deterministicFitSample(corpus, idCol, vecCol, seed, fitSampleRows)
          .toSeq.toDF("arr")
          .select(array_to_vector(col("arr")).as("features"))
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(10)
      .fit(feats)
    model.clusterCenters.map(_.toArray)
  }

  /** Deterministic coarse quantizer: Lloyd's iteration on the DRIVER over
    * a seeded, id-ordered sample. At 10^12 rows a 16–1024-centroid codebook
    * trains on a bounded sample regardless (see ivfCentroids), so the fit
    * is a driver-scale job — and running it sequentially over the
    * id-sorted sample makes the centers BIT-REPRODUCIBLE across runs,
    * partition layouts, and cluster sizes, unlike the distributed MLlib
    * fit whose treeAggregate combine order injects fp noise into the
    * centers (which then flips near-boundary inverted-list assignments —
    * the reason q43 could not be hash-oracled until this path existed).
    * Init = k-means++ with a seeded RNG; assignment ties break to the
    * lowest centroid index; means fold in sample order; empty clusters
    * keep their previous center. */
  def ivfCentroidsDeterministic(corpus: DataFrame, nCentroids: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L, fitSampleRows: Int = 100000,
      maxIter: Int = 10): Array[Array[Double]] = {
    val sample = deterministicFitSample(corpus, idCol, vecCol, seed, fitSampleRows)
    require(sample.nonEmpty, "ivfCentroidsDeterministic: empty corpus")
    lloydsDeterministic(sample, nCentroids, seed, maxIter)
  }

  /** Id-hash-selected, id-sorted fit sample (the bounded, layout-independent
    * training set every driver-side quantizer fit uses — see the
    * bit-reproducibility note on ivfCentroidsDeterministic). */
  private def deterministicFitSample(corpus: DataFrame, idCol: String,
      vecCol: String, seed: Long, fitSampleRows: Int): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pairs = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("v").isNotNull)
      .as[(Long, Array[Float])]
    val sampled =
      if (fitSampleRows <= 0) pairs
      else {
        val n = pairs.count()
        if (n <= fitSampleRows) pairs
        else {
          // Deterministic sample SELECTED BY ID HASH, not DataFrame.sample:
          // Bernoulli sampling seeds per PARTITION, so a different partition
          // layout yields a different sample set and different centers,
          // silently breaking the bit-reproducibility contract at scale
          // (ADVICE r3). pmod(xxhash64(id, seed)) < threshold keeps each id
          // with probability ~threshold/den independent of layout.
          val den = 1L << 20
          val thr = math.min(den,
            math.ceil(fitSampleRows.toDouble / n * 1.1 * den).toLong)
          pairs.toDF("id", "v")
            .where(pmod(xxhash64(col("id"), lit(seed)), lit(den)) < thr)
            .as[(Long, Array[Float])]
        }
      }
    sampled.collect().sortBy(_._1).map(_._2.map(_.toDouble))
  }

  /** Sequential seeded Lloyd's over an in-memory sample (bit-reproducible:
    * k-means++ init with a seeded RNG, ties to the lowest centroid index,
    * means fold in sample order, empty clusters keep their center). The
    * exact operation order of the pre-refactor ivfCentroidsDeterministic
    * body — the q43 fixture depends on it. */
  private def lloydsDeterministic(sample: Array[Array[Double]], nCentroids: Int,
      seed: Long, maxIter: Int): Array[Array[Double]] = {
    val k = math.min(nCentroids, sample.length)
    val dim = sample.head.length
    val rnd = new scala.util.Random(seed)
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    val init = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    init += sample(rnd.nextInt(sample.length))
    while (init.length < k) {
      val d2 = sample.map(p => init.iterator.map(c => dist2(p, c)).min)
      val total = d2.sum
      if (total == 0) init += sample(rnd.nextInt(sample.length))
      else {
        var r = rnd.nextDouble() * total
        var i = 0
        while (i < sample.length - 1 && r > d2(i)) { r -= d2(i); i += 1 }
        init += sample(i)
      }
    }
    var cs = init.toArray
    var iter = 0
    while (iter < maxIter) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { p =>
        var best = 0; var bd = dist2(p, cs(0)); var c = 1
        while (c < k) { val d = dist2(p, cs(c)); if (d < bd) { bd = d; best = c }; c += 1 }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      cs = Array.tabulate(k) { c =>
        if (counts(c) == 0L) cs(c) else sums(c).map(_ / counts(c))
      }
      iter += 1
    }
    cs
  }

  private def nearestCentroids(v: Array[Float], centers: Array[Array[Double]],
      n: Int): Array[Int] =
    centers.indices
      .map { c =>
        val ctr = centers(c)
        var d = 0.0
        var i = 0
        while (i < v.length) { val x = v(i) - ctr(i); d += x * x; i += 1 }
        (d, c)
      }
      .sortBy(identity) // distance, then centroid index — deterministic ties
      .take(n).map(_._2).toArray

  /** IVF ANN top-k: corpus rows live in the inverted list of their nearest
    * centroid; each query probes its `nprobe` nearest lists and reranks
    * with exact cosine. Recall is governed by nprobe/nCentroids (measured
    * against bruteForceTopK in SimilaritySpec). At scale: the quantizer
    * trains on a sample, assignment is one narrow pass, and the probe join
    * is an equi join on centroid id — per-query work is corpus·nprobe/k̄
    * instead of the full scan. Integral ids assumed (typed assignment). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      fitSampleRows: Int = 100000,
      deterministicQuantizer: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    val centers =
      if (deterministicQuantizer)
        ivfCentroidsDeterministic(corpus, nCentroids, idCol, vecCol,
          fitSampleRows = fitSampleRows)
      else ivfCentroids(corpus, nCentroids, idCol, vecCol,
        fitSampleRows = fitSampleRows)

    val c = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("v").isNotNull)
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        var sq = 0.0; var i = 0
        while (i < v.length) { sq += v(i).toDouble * v(i).toDouble; i += 1 }
        (id, v, math.sqrt(sq), nearestCentroids(v, centers, 1)(0))
      }).toDF("neighbor_id", "cv", "cn", "cid")

    val q = queries.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("v").isNotNull)
      .as[(Long, Array[Float])]
      .mapPartitions(_.flatMap { case (id, v) =>
        var sq = 0.0; var i = 0
        while (i < v.length) { sq += v(i).toDouble * v(i).toDouble; i += 1 }
        val nm = math.sqrt(sq)
        nearestCentroids(v, centers, nprobe).map(cid => (id, v, nm, cid))
      }).toDF("query_id", "qv", "qn", "cid")

    val scored = c.join(q, Seq("cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(
        when(col("qn") * col("cn") === 0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  // ---- product quantization (PQ) ----------------------------------------
  // The faiss-style memory-compression path for embedding search at scale:
  // a 64-dim float corpus is 256 B/row; its PQ codes (m=8, 16 codes) are
  // 8 B/row + one shared 8 KB codebook — a 32× smaller table to scan, which
  // is what makes a 10^12-row ANN sweep I/O-feasible. Search = ADC
  // (asymmetric distance computation): per query, precompute the m×|book|
  // table of sub-dot-products once, score each code row with m lookups,
  // shortlist, then exact-rerank the shortlist against the original vectors.

  /** Per-subspace PQ codebooks trained with the SAME deterministic
    * driver-Lloyd's as ivfCentroidsDeterministic (bit-reproducible across
    * runs, layouts and cluster sizes; subspace j uses seed+j so books are
    * independent). Returns books(subspace)(code)(subdim); requires the
    * vector dim to be divisible by `m`. */
  def pqCodebooks(corpus: DataFrame, m: Int, codebookSize: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L, fitSampleRows: Int = 100000,
      maxIter: Int = 10): Array[Array[Array[Double]]] = {
    require(codebookSize <= 256,
      s"pqCodebooks: codebookSize=$codebookSize exceeds the byte code range " +
        "(codes are 1 byte per subspace; indices above 255 would alias)")
    val sample = deterministicFitSample(corpus, idCol, vecCol, seed, fitSampleRows)
    require(sample.nonEmpty, "pqCodebooks: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"pqCodebooks: dim $dim not divisible by m=$m")
    val sub = dim / m
    Array.tabulate(m) { j =>
      val slice = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      lloydsDeterministic(slice, codebookSize, seed + j, maxIter)
    }
  }

  /** Nearest-code index per subspace (ties to the lowest code — the same
    * determinism rule as the IVF assignment). */
  def pqEncodeScala(v: Array[Float], books: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = books.length
    val sub = books(0)(0).length
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      var best = 0; var bd = Double.MaxValue; var c = 0
      while (c < book.length) {
        var d = 0.0; var i = 0
        while (i < sub) { val x = v(j * sub + i) - book(c)(i); d += x * x; i += 1 }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      codes(j) = (best & 0xFF).toByte
      j += 1
    }
    codes
  }

  /** Encode the corpus: (id, codes BINARY of m bytes, exact norm). One
    * narrow typed pass — the books ride to executors in the closure (m ×
    * |book| × subdim doubles, a few KB). The exact norm is stored at encode
    * time (the one moment the full vector is in hand) so cosine needs no
    * reconstruction-norm approximation at query time. */
  def pqEncode(corpus: DataFrame, books: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(books.forall(_.length <= 256),
      "pqEncode: codebooks over 256 codes would alias in the byte codes")
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("v").isNotNull)
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        var sq = 0.0; var i = 0
        while (i < v.length) { sq += v(i).toDouble * v(i).toDouble; i += 1 }
        (id, pqEncodeScala(v, books), math.sqrt(sq))
      }).toDF("id", "codes", "nm")
  }

  /** PQ ANN top-k with ADC scoring and exact rerank. The corpus side that
    * reaches the scoring join carries ONLY (id, m-byte codes, norm) — at
    * scale this is the point: the code table is ~32× smaller than the
    * vectors, scans from parquet at that fraction of the I/O, and the
    * original vectors are touched again only for the |queries|·k·rerank
    * shortlist rows (one broadcast semi-join back onto the corpus).
    * `rerankFactor` ≤ 0 skips the rerank and returns ADC-approximate sims
    * (rounded 4dp) directly. Deterministic end to end: deterministic books,
    * lowest-code ties, (score desc, id asc) orderings. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, codebookSize: Int = 16, rerankFactor: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      fitSampleRows: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = pqCodebooks(corpus, m, codebookSize, idCol, vecCol,
      fitSampleRows = fitSampleRows)
    val cbLen = books(0).length
    val sub = books(0)(0).length
    val enc = pqEncode(corpus, books, idCol, vecCol)

    // per-query ADC lookup table: lut(j*cbLen + c) = dot(q_sub_j, book_j_c)
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .where(col("qv").isNotNull)
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        var sq = 0.0; var i = 0
        while (i < v.length) { sq += v(i).toDouble * v(i).toDouble; i += 1 }
        val lut = new Array[Double](m * cbLen)
        var j = 0
        while (j < m) {
          var c = 0
          while (c < cbLen) {
            var d = 0.0; var x = 0
            while (x < sub) { d += v(j * sub + x).toDouble * books(j)(c)(x); x += 1 }
            lut(j * cbLen + c) = d
            c += 1
          }
          j += 1
        }
        (id, lut, math.sqrt(sq))
      }).toDF("query_id", "lut", "qn")

    val adc = enc.join(broadcast(q), col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"), col("codes"), col("nm"), col("lut"), col("qn"))
      .as[(Long, Long, Array[Byte], Double, Array[Double], Double)]
      .mapPartitions(_.map { case (qid, id, codes, nm, lut, qn) =>
        var s = 0.0; var j = 0
        while (j < m) { s += lut(j * cbLen + (codes(j) & 0xFF)); j += 1 }
        (qid, id, if (qn * nm == 0) 0.0 else s / (qn * nm))
      }).toDF("query_id", "neighbor_id", "adc")

    val w = Window.partitionBy("query_id").orderBy(col("adc").desc, col("neighbor_id").asc)
    if (rerankFactor <= 0) {
      adc.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("adc"), 4).as("sim"))
    } else {
      val shortlist = adc.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k * rerankFactor)
        .select("query_id", "neighbor_id")
      // exact rerank: shortlist ids pull their ORIGINAL vectors back in —
      // a broadcast join onto the corpus scan (shortlist is queries·k·f
      // rows), then the left-fold vec_dot for fixture-exact cosine. Norms
      // are computed AFTER the join, so only shortlist survivors pay them.
      val cv = corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("cv"))
      val qv = broadcast(queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qv2"), norm(col(vecCol)).as("qn2")))
      val exact = cv.join(broadcast(shortlist), Seq("neighbor_id"))
        .withColumn("cn", norm(col("cv")))
        .join(qv, Seq("query_id"))
        .withColumn("sim", round(
          when(col("qn2") * col("cn") === 0, 0.0)
            .otherwise(dot(col("qv2"), col("cv")) / (col("qn2") * col("cn"))), 4))
      val w2 = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
      exact.withColumn("rank", row_number().over(w2))
        .where(col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    }
  }

  // ---- SemDeDup — semantic deduplication over embeddings ----------------

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): remove SEMANTIC
    * duplicates — documents whose embeddings nearly coincide even when the
    * text does not (translations, templated rewrites, boilerplate
    * variants) — the curation pass a modern training-data pipeline runs
    * AFTER exact/minhash dedup, where string-level methods are blind.
    *
    * The paper's shape, re-expressed Spark-first:
    *   1) coarse-cluster the embeddings (deterministic driver-Lloyd's
    *      quantizer — bit-stable centers across runs/layouts/cluster
    *      sizes, see ivfCentroidsDeterministic);
    *   2) WITHIN each cluster only, mark pairs at cosine ≥ `threshold`
    *      (the paper uses ~0.95+ on web data);
    *   3) close the pairs transitively (Dedup.dupGroups — CC over the
    *      PAIR graph, pair-scale input, never corpus-scale);
    *   4) per duplicate group KEEP exactly one row — the paper keeps the
    *      example with the LOWEST cosine to its cluster centroid (the
    *      diversity-preserving representative); ties break to lowest id.
    *
    * Scale shape: never all-pairs. The quadratic is per-cluster — with
    * k ≈ √n clusters (the paper's regime) expected cluster size is √n and
    * pair work is Σ size² ≈ n. Assignment + norm + centroid-cosine is ONE
    * narrow typed pass (centers ride in the closure); pairing is ONE equi
    * self-join on cluster id (vectors ride the shuffle once per side);
    * the keep rule is a window over group id. Clusters over `maxCluster`
    * are EXEMPTED from pairing (their rows are all kept) and counted to
    * Audit.warn — the no-silent-caps rule; at 10^12 rows raise
    * `nCentroids` rather than the cap.
    *
    * Returns one row per input row:
    * (idCol, cluster_id, centroid_sim r4, group_id, keep). Rows with no
    * in-threshold partner keep group_id = own id and keep = true. */
  def semdedup(corpus: DataFrame, threshold: Double = 0.95,
      nCentroids: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding", fitSampleRows: Int = 100000,
      maxCluster: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    val centers = ivfCentroidsDeterministic(corpus, nCentroids, idCol, vecCol,
      fitSampleRows = fitSampleRows)

    // (id, v, norm, cluster, cosine-to-centroid) in one narrow pass;
    // materialized (config-gated) — reused by the size audit, both pair
    // sides, and the final join-back.
    val assigned = graft.Materialize(corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("v").isNotNull)
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        var sq = 0.0; var i = 0
        while (i < v.length) { sq += v(i).toDouble * v(i).toDouble; i += 1 }
        val nm = math.sqrt(sq)
        val cid = nearestCentroids(v, centers, 1)(0)
        val ctr = centers(cid)
        var d = 0.0; var cq = 0.0; i = 0
        while (i < v.length) { d += v(i).toDouble * ctr(i); cq += ctr(i) * ctr(i); i += 1 }
        val cn = math.sqrt(cq)
        (id, v, nm, cid, if (nm * cn == 0) 0.0 else d / (nm * cn))
      }).toDF("id", "v", "nm", "cid", "centroid_sim"))

    // No-silent-caps accounting: at most nCentroids rows, driver-bounded.
    val overCap = assigned.groupBy("cid").count()
      .where(col("count") > maxCluster)
      .select(col("cid"), col("count")).collect()
    if (overCap.nonEmpty)
      graft.Audit.warn(s"semdedup: ${overCap.length} cluster(s) over " +
        s"maxCluster=$maxCluster covering ${overCap.map(_.getLong(1)).sum} " +
        "rows are exempt from pairing (all their rows kept); raise " +
        "nCentroids to shrink clusters")
    val inPlay =
      if (overCap.isEmpty) assigned
      else assigned.where(!col("cid").isInCollection(overCap.map(_.getInt(0)).toSeq))

    val pairs = inPlay
      .select(col("cid"), col("id").as("id_a"), col("v").as("v_a"), col("nm").as("n_a"))
      .join(inPlay.select(col("cid"), col("id").as("id_b"),
        col("v").as("v_b"), col("nm").as("n_b")), Seq("cid"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim_raw",
        when(col("n_a") * col("n_b") === 0, 0.0)
          .otherwise(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
      .where(col("sim_raw") >= threshold)
      .select("id_a", "id_b")

    val groups = graft.ops.Dedup.dupGroups(pairs)

    // Keep rule on the RAW centroid cosine (rounding is display-only);
    // singletons coalesce to their own id and trivially win their window.
    val w = Window.partitionBy("group_id")
      .orderBy(col("centroid_sim").asc, col("id").asc)
    assigned.select("id", "cid", "centroid_sim")
      .join(groups, Seq("id"), "left")
      .withColumn("group_id", coalesce(col("group_id"), col("id")))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("id").as(idCol), col("cid").as("cluster_id"),
        round(col("centroid_sim"), 4).as("centroid_sim"),
        col("group_id"), col("keep"))
  }

  /** Mutual-nearest-neighbor alignment of two embedding sets (the
    * unsupervised bilingual-lexicon / cross-source entity-alignment
    * primitive — MUSE, Conneau 2018; VecMap): (a, b) is a match iff b is
    * a's top-1 in B AND a is b's top-1 in A. The mutuality constraint is
    * the precision filter — one-directional top-1 pairs every a with
    * SOMETHING; mutual pairs survive only where the geometry agrees both
    * ways.
    *
    * ONE scored cross product feeds BOTH direction ranks (two row_number
    * windows over the same table — not two scans), then a self-join keeps
    * rank-1×rank-1 agreements. Ties break (sim desc, id asc) like
    * bruteForceTopK. Scale: brute-force is the small-side path (broadcast
    * B); above memory, swap the scorer for the LSH/IVF candidate
    * generators in this file — the mutual filter is unchanged. */
  def mutualTopMatch(a: DataFrame, b: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val av = a.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val bv = broadcast(b.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb")))
    val scored = av.join(bv)
      .select(col("id_a"), col("id_b"), round(
        when(col("na") * col("nb") === 0, 0.0)
          .otherwise(dot(col("va"), col("vb")) / (col("na") * col("nb"))), 4)
        .as("sim"))
    import org.apache.spark.sql.expressions.Window
    val rankAB = row_number().over(Window.partitionBy("id_a")
      .orderBy(col("sim").desc, col("id_b").asc))
    val rankBA = row_number().over(Window.partitionBy("id_b")
      .orderBy(col("sim").desc, col("id_a").asc))
    val ranked = scored.withColumn("r_ab", rankAB).withColumn("r_ba", rankBA)
    ranked.where(col("r_ab") === 1 && col("r_ba") === 1)
      .select("id_a", "id_b", "sim")
  }
}
