package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Longest strictly-increasing subsequence per key — the order-consistency
  * audit for sequenced data: how much of a series (prices over ship dates,
  * versions over time, offsets over pages) is already in sorted order.
  * `n - lis_len` is the minimum number of rows one must delete (or
  * re-stamp) to make the series monotone — the natural "out-of-order
  * fraction" for ingest QA, strictly sharper than Mann–Kendall's trend
  * direction (q162).
  *
  * Engine shape: the SECONDARY-SORT pattern — repartition by key,
  * sortWithinPartitions by (key, order), then one narrow partition walk
  * that runs the patience algorithm over each key's now-contiguous,
  * already-ordered run (tails array + binary search, O(n log n) per key;
  * only one key's values are ever buffered). No per-group collect, no
  * window, keys embarrassingly parallel. `maxRows` fails fast on
  * degenerate keys.
  *
  * ORDER CONTRACT: the order columns must be total per key (ties would
  * make the sequence, and therefore the LIS, ambiguous — pass a unique
  * tiebreaker). Strict increase: equal values do NOT extend a
  * subsequence. Output: `(key, n, lis_len)`. */
object Lis {

  private[graft] def patience(vs: Array[Long]): Int = {
    val tails = new Array[Long](vs.length)
    var len = 0
    var i = 0
    while (i < vs.length) {
      val v = vs(i)
      // lower_bound: first tail >= v (strict increase replaces equals)
      var lo = 0; var hi = len
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (tails(mid) < v) lo = mid + 1 else hi = mid
      }
      tails(lo) = v
      if (lo == len) len += 1
      i += 1
    }
    len
  }

  def longestRun(df: DataFrame, key: Column, order: Seq[Column],
      value: Column, maxRows: Int = 1000000): DataFrame = {
    require(order.nonEmpty, "Lis.longestRun: order columns required")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("k"), struct(order: _*).as("o"),
        value.cast("long").as("v"))
      .where(col("k").isNotNull && col("v").isNotNull)
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o"))
      .select(col("k"), col("v")).as[(String, Long)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        var curK: String = null
        val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
        def flush(): Unit = if (curK != null) {
          out += ((curK, buf.length.toLong, patience(buf.toArray).toLong))
          buf.clear()
        }
        for ((k, v) <- it) {
          if (k != curK) { flush(); curK = k }
          buf += v
          require(buf.length <= maxRows,
            s"Lis.longestRun: key $k exceeds $maxRows rows")
        }
        flush()
        out.iterator
      }
      .toDF("key", "n", "lis_len")
  }
}
