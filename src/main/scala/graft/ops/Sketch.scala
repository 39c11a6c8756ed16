package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM'02; Beyer et al., SIGMOD'07) — the cardinality estimator for
  * when exact `count(distinct)` is too expensive to run per group over
  * 10^12 rows but the answer must still be DETERMINISTIC and auditable
  * (approx_count_distinct's HLL± is opaque and version-sensitive; a KMV
  * over a fixed hash is a pure function of the value set, bit-identical
  * across runs, partition layouts, and cluster sizes — which is what
  * makes a cross-engine hash oracle possible).
  *
  * Sketch = the k smallest DISTINCT values of the SCRAMBLED
  * `TextOps.fingerprint`: the raw rolling 31-hash clusters structured
  * keys ("value_0001"... differ only in low polynomial terms, so their
  * hashes sit in bands and the minima are biased), so two multiplicative
  * LCG rounds (MINSTD multipliers 48271/69621, each a bijection on
  * [0, M)) spread the bands across the space — still pure
  * `*`/`+`/`pmod` on BIGINT (no overflow: h·69621 < 2^48), so DuckDB
  * replays it term for term. Estimator: with fewer than k distinct hashes the
  * count is EXACT; otherwise the k-th minimum h_k estimates density and
  * the unbiased estimate is (k-1) · M / h_k. Mergeable by construction
  * (union the value sets, re-take the k minima) — the property that lets
  * per-partition sketches combine without a global shuffle of values.
  *
  * Scale: hash + per-group distinct (one shuffle), then a bounded
  * row_number window keeps ≤ k rows per group (rank frames evaluate
  * incrementally; a mega-group buffers only its sort run, which spills),
  * and a final per-group aggregate rides the same hash(group) exchange.
  * Relative error ≈ 1/sqrt(k-2) — k=256 gives ~6%.
  */
object Sketch {

  /** Uniformizing scramble over [0, M): two MINSTD LCG rounds on top of
    * the portable rolling fingerprint. Bijective, so distinctness is
    * preserved exactly. */
  def kmvHash(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val M = lit(2147483647L)
    val r1 = pmod(TextOps.fingerprint(value) * 48271L + 12345L, M)
    pmod(r1 * 69621L + 54321L, M)
  }

  /** Per-group distinct-count estimate of `valueCol`: (group...,
    * n_sketch, h_k, estimate). n_sketch = min(k, true distinct count);
    * estimate is exact (= n_sketch) below k. Null values are ignored;
    * null GROUP KEYS form their own group (a profiling operator reports
    * on the null slice rather than dropping it). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, "kmvDistinct: k must be >= 2")
    val M = 2147483647L // fingerprint hash space, 2^31 - 1
    val g = groupCols.map(col)
    val hashed = df
      .where(col(valueCol).isNotNull)
      .select(g :+ kmvHash(col(valueCol).cast("string")).as("__h"): _*)
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    hashed
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sketch"), max(col("__h")).as("h_k"))
      .withColumn("estimate",
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * M) / col("h_k"), 4)))
  }

  /** Exact heavy hitters with SKETCH-BOUNDED shuffle — every key whose
    * count strictly exceeds n/k, with its exact count. The naive plan
    * (groupBy key + HAVING) shuffles one combiner row per DISTINCT key;
    * over 10^12 rows of long-tail keys (URLs, vendor strings) that is the
    * job's dominant exchange. This operator caps it with Misra–Gries
    * (Misra & Gries, Sci. Comp. Prog. 1982; the Space-Saving family):
    *
    *  1. per-partition MG summaries of k−1 counters (narrow mapPartitions
    *     fold — the genuine per-partition-imperative case) emit candidate
    *     keys: any key with count_p > n_p/k in SOME partition survives
    *     there, and a global count > n/k forces count_p > n_p/k in at
    *     least one partition (averaging) — so the candidate set is a
    *     SUPERSET of the true heavy hitters, ≤ (k−1)·P keys total;
    *  2. one exact counting pass where only candidate keys keep their
    *     identity (broadcast membership; everything else collapses into a
    *     single "other" combiner per partition) — the shuffle carries
    *     ≤ (k−1)·P + P rows, independent of the distinct-key count; n
    *     falls out of the same aggregate, so the whole operator is the
    *     narrow sketch pass + ONE exchange;
    *  3. filter cnt·k > n.
    *
    * MG's internal state is arrival-order-dependent (so the CANDIDATE set
    * varies with partition layout), but step 3 makes the OUTPUT a pure
    * function of the data multiset — exact counts, deterministic across
    * runs and layouts. Null keys are ignored. */
  /** HyperLogLog registers over the SAME portable hash (Flajolet 2007 —
    * THE production cardinality sketch; KMV above keeps k values, HLL
    * keeps only 2^b max-rank bytes, constant space per group at any
    * cardinality). Registers, not a float state, are the sketch: bucket =
    * hash mod 2^b, w = hash div 2^b ∈ [0, 2^(31−b)), rank = leading-zero
    * count of w in its (31−b)-bit field + 1 (computed PORTABLY as
    * width+1 − bitlength via `bin()`, identical in Spark and DuckDB) —
    * so the register table is pure integer arithmetic and the oracle
    * replays it hash-exact. Mergeable: union = per-bucket MAX.
    *
    * Scale: one bucket-keyed MAX aggregate (map-side combinable; 2^b
    * rows out regardless of input size) — the reason HLL is the sketch
    * every engine ships. */
  def hllRegisters(df: DataFrame, valueCol: String, b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"hll precision b in 4..16, got $b")
    val m = 1 << b
    val width = 31 - b // bits left in w after the bucket is peeled off
    val h = kmvHash(col(valueCol).cast("string"))
    df.where(col(valueCol).isNotNull)
      .select(pmod(h, lit(m.toLong)).as("bucket"),
        call_function("div", h, lit(m.toLong)).as("__w"))
      .select(col("bucket"),
        when(col("__w") === 0, lit(width + 1))
          .otherwise(lit(width + 1) - length(bin(col("__w")))).as("rank"))
      .groupBy("bucket").agg(max("rank").cast("int").as("max_rank"))
  }

  /** One-row HLL estimate from the registers: exact-integer S_fp =
    * Σ_j 2^(width+1−M_j) (empty buckets contribute 2^(width+1)), then the
    * single float step E = α_m·m²·2^(width+1) / S_fp — one multiply chain
    * and one divide, bit-identical cross-engine. Linear-counting
    * small-range correction (E ≤ 2.5m and empty buckets exist →
    * m·ln(m/V)) included per the paper. */
  def hllEstimate(df: DataFrame, valueCol: String, b: Int = 8): DataFrame = {
    val m = 1 << b
    val width = 31 - b
    val regs = hllRegisters(df, valueCol, b)
    val alpha = m match {
      case 16 => lit(0.673)
      case 32 => lit(0.697)
      case 64 => lit(0.709)
      case _ => lit(0.7213) / (lit(1.0) + lit(1.079) / m)
    }
    regs.agg(
        count(lit(1)).as("n_buckets_used"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $width + 1 - max_rank)"))
          .as("__s_used"))
      .select(col("n_buckets_used"),
        (col("__s_used") +
          (lit(m.toLong) - col("n_buckets_used")) * lit(1L << (width + 1)))
          .as("s_fp"))
      .select(col("n_buckets_used"), col("s_fp"),
        (alpha * m * m * lit(math.pow(2.0, width + 1).toLong) /
          col("s_fp")).as("__e"))
      .select(col("n_buckets_used"), col("s_fp"),
        round(when(col("__e") <= 2.5 * m && col("n_buckets_used") < m,
            lit(m.toDouble) *
              log(lit(m.toDouble) / (lit(m.toLong) - col("n_buckets_used"))))
          .otherwise(col("__e")), 4).as("hll_estimate"))
  }

  /** Count–Min sketch (Cormode & Muthukrishnan 2005) — fixed-space
    * frequency estimation where MG heavy hitters (q120) answer only the
    * top-k question: d independent hash rows × w counters, point estimate
    * = MIN over rows of the probed counter, always ≥ the true count
    * (one-sided error ≤ e·N/w with prob 1−(1/2)^d... the textbook bound).
    * Rows reuse the portable scrambled hash re-mixed per row with distinct
    * MINSTD multipliers — pure `*`/`+`/`pmod` BIGINT arithmetic, so the
    * registers AND the probes replay cross-engine exactly.
    *
    * Scale: ONE (row, bucket)-keyed SUM over a d-way in-task fan-out —
    * d·w counter rows out regardless of input size; merge = counter-wise
    * add. */
  object CountMin {
    val M = 2147483647L
    // distinct odd multipliers per row (MINSTD family), applied on top of
    // the shared kmvHash value
    val RowMul = Vector(16807L, 48271L, 69621L, 40692L)
    val RowAdd = Vector(11L, 101L, 1009L, 10007L)

    def rowHash(h: org.apache.spark.sql.Column, row: Int, w: Int) =
      pmod(pmod(h * RowMul(row) + RowAdd(row), lit(M)), lit(w.toLong))
  }

  /** The d×w counter table of `valueCol`: (row, bucket, cnt). */
  def cmRegisters(df: DataFrame, valueCol: String, d: Int = 4,
      w: Int = 1024): DataFrame = {
    require(d >= 1 && d <= 4 && w >= 2, s"cm: d in 1..4, got $d; w >= 2")
    val h = kmvHash(col(valueCol).cast("string"))
    val rows = (0 until d).map(r =>
      struct(lit(r).as("row"), CountMin.rowHash(h, r, w).as("bucket")))
    df.where(col(valueCol).isNotNull)
      .select(explode(array(rows: _*)).as("e"))
      .groupBy(col("e.row").as("row"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` against the sketch of `df`:
    * (key, cm_estimate) with estimate = min over rows of the probed
    * counter. An ABSENT counter is 0 (left join + coalesce — an inner
    * join would silently drop the zero row and over-estimate unseen
    * keys); the d×w counter table broadcasts (it is sketch-sized by
    * construction, never input-sized). */
  def cmEstimate(df: DataFrame, valueCol: String, probes: DataFrame,
      probeCol: String, d: Int = 4, w: Int = 1024): DataFrame = {
    val regs = cmRegisters(df, valueCol, d, w)
    val h = kmvHash(col(probeCol).cast("string"))
    val rows = (0 until d).map(r =>
      struct(lit(r).as("row"), CountMin.rowHash(h, r, w).as("bucket")))
    val addrs = probes.where(col(probeCol).isNotNull)
      .select(col(probeCol).as("key"), explode(array(rows: _*)).as("e"))
      .select(col("key"), col("e.row").as("row"), col("e.bucket").as("bucket"))
    addrs.join(broadcast(regs), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_estimate"))
  }

  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, "heavyHitters: k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("key"))
      .where(col("key").isNotNull)
    val candidates = keys.as[String].mapPartitions { it =>
      // Misra–Gries fold, k-1 counters; decrement-all amortizes to O(1)
      // per row (each decrement pays back an earlier increment)
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        m.get(x) match {
          case Some(c) => m.update(x, c + 1L)
          case None if m.size < k - 1 => m.update(x, 1L)
          case None =>
            val dead = List.newBuilder[String]
            m.keysIterator.foreach { y =>
              val c = m(y) - 1L
              if (c == 0L) dead += y else m.update(y, c)
            }
            dead.result().foreach(m.remove)
        }
      }
      m.keysIterator
    }.toDF("key").distinct()
    // exact pass: candidates keep identity, the tail collapses per
    // partition into one combiner row; n = Σ over ALL groups of the same
    // aggregate (no second scan)
    val counted = keys
      .join(broadcast(candidates.withColumn("__cand", lit(true))), Seq("key"), "left")
      .groupBy(coalesce(col("__cand"), lit(false)).as("__cand"),
        when(col("__cand"), col("key")).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val m = graft.Materialize(counted, eager = false)
    val nRow = m.agg(sum("cnt")).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    m.where(col("__cand") && col("cnt") * k > n).select("key", "cnt")
  }

  /** θ-sketch-style SET-OPERATION estimates from two KMV sketches (the
    * Theta framework — Dasgupta/Lang/Rhodes/Thaler, "Data Sketching" /
    * DataSketches' theta union–intersection): |A∪B| from the k smallest
    * hashes of the MERGED sketches (KMV mergeability), |A∩B| and Jaccard
    * from membership of those k minima in each side's sketch — the
    * "how contaminated is corpus A by corpus B" / "how much do these two
    * crawls overlap" estimator that never joins the raw tables.
    *
    * Deterministic by the same argument as kmvDistinct: pure function of
    * the two value sets over the portable hash. One row out:
    * (n_a_sketch, n_b_sketch, n_union_sketch, h_k, n_inter_sketch,
    *  union_est, inter_est, jaccard_ppm). Below k everything is EXACT
    * (the sketches hold the full hash sets); at k the estimates carry the
    * usual 1/sqrt(k) error. jaccard_ppm is an exact integer ratio of
    * sketch counts; union/inter estimates fix the IEEE evaluation order
    * (one constant product, one division each) so the oracle replays them
    * bit-for-bit.
    *
    * Scale shape: two hash+distinct passes (one per input — the only
    * row-scale work), then everything is ≤ k rows; the k-min cuts ride
    * single-column TakeOrdered, and sketches merge associatively so
    * per-partition/per-source sketches combine without re-scanning. */
  def kmvSetOps(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, "kmvSetOps: k must be >= 2")
    val M = 2147483647L
    def kmin(df: DataFrame) = graft.Materialize(
      df.where(col(valueCol).isNotNull)
        .select(kmvHash(col(valueCol).cast("string")).as("h"))
        .distinct().orderBy("h").limit(k))
    val a = kmin(dfA)
    val b = kmin(dfB)
    // k-min of the union of the FULL hash sets == k-min of the merged
    // sketches (mergeability); membership flags for the θ intersection
    val u = a.union(b).distinct().orderBy("h").limit(k)
    val flags = u
      .join(a.select(col("h"), lit(true).as("ina")), Seq("h"), "left")
      .join(b.select(col("h"), lit(true).as("inb")), Seq("h"), "left")
    val agg = flags.agg(
      count(lit(1)).as("n_union_sketch"),
      max("h").as("h_k"),
      coalesce(sum(when(col("ina") && col("inb"), 1L).otherwise(0L)), lit(0L))
        .as("n_inter_sketch"))
    val na = a.agg(count(lit(1)).as("n_a_sketch"))
    val nb = b.agg(count(lit(1)).as("n_b_sketch"))
    val uRaw = lit((k - 1).toDouble * M) / col("h_k")
    agg.crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("n_a_sketch"), col("n_b_sketch"), col("n_union_sketch"),
        col("h_k"), col("n_inter_sketch"),
        when(col("n_union_sketch") < k,
          col("n_union_sketch").cast("double"))
          .otherwise(round(uRaw, 4)).as("union_est"),
        when(col("n_union_sketch") < k,
          col("n_inter_sketch").cast("double"))
          .otherwise(round(
            col("n_inter_sketch").cast("double") * uRaw /
              col("n_union_sketch"), 4)).as("inter_est"),
        when(col("n_union_sketch") > 0,
          call_function("div", col("n_inter_sketch") * 1000000L,
            col("n_union_sketch"))).as("jaccard_ppm"))
  }

  /** AMS "tug-of-war" second-moment sketch (Alon–Matias–Szegedy, STOC'96)
    * — estimates F2 = Σ_v f_v² (the SELF-JOIN SIZE / skew mass of a key
    * column) in d counters, without the per-distinct-key combiner rows a
    * `groupBy(key).count()` shuffles: row r keeps z_r = Σ_rows s_r(v),
    * s_r(v) ∈ {−1,+1} a 4-wise-ish sign from a per-row MINSTD re-mix of
    * the shared portable hash; E[z_r²] = F2. F2 is what sizes a self-join
    * or a skewed shuffle BEFORE running it (the salting decision in
    * `ops/Skew` wants exactly this number).
    *
    * All-integer end to end: signs are ±1 BIGINTs, z_r is an exact sum
    * (order-free, so any partition layout gives the same registers), the
    * estimate is the exact MEDIAN of the d squares (d odd ⇒ the middle
    * element of the sorted list — no interpolation), so DuckDB replays
    * every term. Registers merge counter-wise (z adds), the mergeability
    * that lets per-partition/per-source sketches combine.
    *
    * Scale: one d-way in-task fan-out + ONE global d-row aggregate — d
    * rows out regardless of input size. Nulls ignored (they join nothing). */
  object Ams {
    // d = 5 distinct MINSTD-family re-mixes (disjoint from CountMin's so
    // composed pipelines don't correlate rows)
    val RowMul = Vector(16807L, 48271L, 69621L, 40692L, 25173L)
    val RowAdd = Vector(13L, 211L, 2003L, 20011L, 30011L)
    val M = 2147483647L
  }

  /** The d sign-sum registers of `valueCol`: (row, z). */
  def amsRegisters(df: DataFrame, valueCol: String, d: Int = 5): DataFrame = {
    require(d >= 1 && d <= 5, s"ams: d in 1..5, got $d")
    val h = kmvHash(col(valueCol).cast("string"))
    val rows = (0 until d).map { r =>
      val sign = lit(1L) - lit(2L) *
        pmod(pmod(h * Ams.RowMul(r) + Ams.RowAdd(r), lit(Ams.M)), lit(2L))
      struct(lit(r).as("row"), sign.as("s"))
    }
    df.where(col(valueCol).isNotNull)
      .select(explode(array(rows: _*)).as("e"))
      .groupBy(col("e.row").as("row"))
      .agg(sum(col("e.s")).as("z"))
  }

  /** One-row F2 estimate: (n_rows, f2_estimate) with f2_estimate =
    * median of z_r² (d odd required — the median is then an exact
    * integer, bit-identical cross-engine). */
  def amsF2(df: DataFrame, valueCol: String, d: Int = 5): DataFrame = {
    require(d % 2 == 1, s"amsF2: d must be odd for an exact median, got $d")
    amsRegisters(df, valueCol, d)
      .agg(
        element_at(array_sort(collect_list(col("z") * col("z"))),
          d / 2 + 1).as("f2_estimate"),
        count(lit(1)).as("n_registers"))
      .select(col("n_registers"), col("f2_estimate"))
  }

  /** Equi-join SIZE estimate from two Count–Min sketches (Cormode &
    * Muthukrishnan '05 §4.2): |A ⋈_k B| = Σ_k fA(k)·fB(k), estimated as
    * min over rows r of Σ_b cA[r,b]·cB[r,b] — one-sided (≥ true size,
    * colliding keys only add), which is the safe direction for deciding
    * whether a shuffle join fits before LAUNCHING it. Never touches the
    * raw tables together: each side is sketched independently (d·w
    * counter rows each), the product is sketch×sketch.
    *
    * Exact integers end to end (counter sums of counts, one MIN), so the
    * oracle replays register-for-register. Overflow horizon: Σ_b cA·cB ≤
    * |A|·|B| — cast to DECIMAL(38,0) beyond ~3·10^9 rows per side. */
  def cmJoinSize(dfA: DataFrame, valueColA: String,
      dfB: DataFrame, valueColB: String,
      d: Int = 4, w: Int = 1024): DataFrame = {
    val ra = cmRegisters(dfA, valueColA, d, w)
      .withColumnRenamed("cnt", "cnt_a")
    val rb = cmRegisters(dfB, valueColB, d, w)
      .withColumnRenamed("cnt", "cnt_b")
    // inner join keeps only CO-OCCUPIED buckets (absent counters multiply
    // to 0 anyway), but a row with NO co-occupied bucket legitimately
    // estimates 0 — the row spine keeps it alive (dropping it would bias
    // the MIN upward exactly when the join is emptiest)
    val prod = ra.join(rb, Seq("row", "bucket"))
      .groupBy("row")
      .agg(sum(col("cnt_a") * col("cnt_b")).as("row_est"))
    ra.select("row").distinct()
      .join(prod, Seq("row"), "left")
      .agg(min(coalesce(col("row_est"), lit(0L))).as("cm_join_estimate"))
  }
}
