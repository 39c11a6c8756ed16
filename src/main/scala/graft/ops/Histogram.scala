package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V-optimal histogram construction (Jagadish et al., VLDB 1998) — the
  * B-bucket partition of an ordered series minimizing total within-bucket
  * SSE: the optimizer-statistics histogram of record (equi-width — q104 —
  * wastes buckets on empty ranges; equi-depth splits modes; v-optimal
  * provably minimizes the estimation error a selectivity estimator pays).
  * The engine use is its own: per-key value sketches for join-size /
  * skew estimation over 10¹²-row tables are built per PARTITION KEY,
  * embarrassingly parallel.
  *
  * Exactness: bucket SSE = (n·Σx² − (Σx)²)/n is a RATIONAL; the DP
  * carries (num, den) pairs in BigInt and compares by cross
  * multiplication — no floats anywhere, so the chosen boundary VECTOR is
  * bit-stable and the oracle can replay it with HUGEINT fractions.
  * Tie-break: scanning predecessors in ascending index order with strict
  * improvement keeps the EARLIEST argmin — the same rule spelled out in
  * the oracle's (cost, i) window order.
  *
  * Shape: one shuffle co-locates a key's points, a typed in-group
  * O(n²·B) DP per key ([[Scheduling]]'s family); `maxPoints` fails fast
  * on series whose quadratic DP would be an executor-killer — build
  * v-optimal sketches over pre-aggregated value histograms, not raw
  * 10⁹-point series.
  *
  * Output: one row per bucket — (key, bucket (1-based), start_pos,
  * end_pos, n, vsum, sse_ppm) with sse_ppm the exact floor of
  * 10⁶·SSE_bucket. Keys with fewer points than `nBuckets` emit one
  * bucket per point (zero SSE). */
object Histogram {

  def voptimal(df: DataFrame, key: Column, pos: Column, value: Column,
      nBuckets: Int, maxPoints: Int = 4096): DataFrame = {
    require(nBuckets >= 1, "voptimal: nBuckets must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(key.cast("string").as("k"),
        pos.cast("long").as("p"), value.cast("long").as("v"))
      .where(col("k").isNotNull && col("p").isNotNull && col("v").isNotNull)
      .as[(String, Long, Long)]
    pts.groupByKey(_._1).flatMapGroups { (k, it) =>
      val a = it.map(t => (t._2, t._3)).toArray.sorted // by pos, then value
      require(a.length <= maxPoints,
        s"voptimal: key $k has ${a.length} points (> $maxPoints); " +
          "pre-aggregate before sketching or raise maxPoints deliberately")
      val n = a.length
      val b = math.min(nBuckets, n)
      // prefix sums in BigInt: s1(i) = Σ v, s2(i) = Σ v² over first i
      val s1 = new Array[BigInt](n + 1); val s2 = new Array[BigInt](n + 1)
      s1(0) = BigInt(0); s2(0) = BigInt(0)
      var i = 0
      while (i < n) {
        val v = BigInt(a(i)._2)
        s1(i + 1) = s1(i) + v; s2(i + 1) = s2(i) + v * v
        i += 1
      }
      // sse(i, j] as (num, den): ((j-i)·ΔS2 − ΔS1², j-i)
      def sse(i: Int, j: Int): (BigInt, BigInt) = {
        val m = BigInt(j - i)
        (m * (s2(j) - s2(i)) - (s1(j) - s1(i)) * (s1(j) - s1(i)), m)
      }
      // dp(c)(j): best cost of splitting first j points into c buckets
      val NEG = (BigInt(-1), BigInt(0)) // sentinel: unreachable
      val dp = Array.fill(b + 1, n + 1)(NEG)
      val back = Array.fill(b + 1, n + 1)(-1)
      dp(0)(0) = (BigInt(0), BigInt(1))
      var c = 1
      while (c <= b) {
        var j = c
        while (j <= n) {
          var best = NEG; var bestI = -1
          var p0 = c - 1
          while (p0 < j) {
            val prev = dp(c - 1)(p0)
            if (prev._2 != BigInt(0)) {
              val seg = sse(p0, j)
              // cand = prev + seg (fractions)
              val cn = prev._1 * seg._2 + seg._1 * prev._2
              val cd = prev._2 * seg._2
              // strict improvement keeps the EARLIEST argmin
              if (bestI < 0 || cn * best._2 < best._1 * cd) {
                best = (cn, cd); bestI = p0
              }
            }
            p0 += 1
          }
          dp(c)(j) = best; back(c)(j) = bestI
          j += 1
        }
        c += 1
      }
      // reconstruct boundaries for dp(b)(n)
      val cuts = new Array[Int](b + 1)
      cuts(b) = n
      var cc = b
      while (cc >= 1) { cuts(cc - 1) = back(cc)(cuts(cc)); cc -= 1 }
      (1 to b).iterator.map { bi =>
        val (lo, hi) = (cuts(bi - 1), cuts(bi))
        val (num, den) = sse(lo, hi)
        val ssePpm = (BigInt(1000000) * num / den).toLong
        (k, bi, a(lo)._1, a(hi - 1)._1, (hi - lo).toLong,
          (s1(hi) - s1(lo)).toLong, ssePpm)
      }
    }.toDF("key", "bucket", "start_pos", "end_pos", "n", "vsum", "sse_ppm")
  }
}
