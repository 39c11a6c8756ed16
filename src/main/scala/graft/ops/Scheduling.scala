package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted interval scheduling — the OPTIMAL counterpart of PhraseSpot's
  * leftmost-longest greedy: per key, the maximum total weight of a set of
  * pairwise non-overlapping intervals (inclusive [start,end]; touching
  * counts as overlap, so a successor must start strictly after the
  * predecessor ends). The span-selection primitive wherever extraction
  * candidates carry confidences: picking the best non-conflicting mention
  * set per document, the best non-overlapping shipment plan per supplier —
  * the cases where greedy leftmost-longest is provably suboptimal.
  *
  * Engine shape: the classic O(n log n) dynamic program, run PER KEY — one
  * shuffle to co-locate a key's intervals, then a typed in-group fold
  * (sort by end + binary-searched predecessor). Per-group state is that
  * key's interval list: the same bound as any per-document reassembly, so
  * the corpus dimension (number of keys) stays embarrassingly parallel.
  * Keys with millions of intervals would need the segmented-DP variant;
  * `maxIntervals` fails fast instead of letting an executor die slowly.
  *
  * Output: `(key, best_weight, n_intervals)` — the optimum is unique even
  * when the argmax set is not, so the result is deterministic with no tie
  * rules. Rows with null fields or start > end are dropped. */
object Scheduling {

  def weightedIntervalBest(df: DataFrame, key: Column, start: Column,
      end: Column, weight: Column, maxIntervals: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val iv = df.select(key.cast("string").as("k"),
        start.cast("long").as("s"), end.cast("long").as("e"),
        weight.cast("long").as("w"))
      .where(col("k").isNotNull && col("s").isNotNull &&
        col("e").isNotNull && col("w").isNotNull && col("s") <= col("e"))
      .as[(String, Long, Long, Long)]
    iv.groupByKey(_._1).mapGroups { (k, it) =>
      val raw = it.map(t => (t._3, t._2, t._4)).toArray // (end, start, w)
      require(raw.length <= maxIntervals,
        s"weightedIntervalBest: key $k has ${raw.length} intervals " +
          s"(> $maxIntervals); raise maxIntervals deliberately")
      val a = raw.sorted
      val n = a.length
      val ends = a.map(_._1)
      val dp = new Array[Long](n + 1)
      var i = 0
      while (i < n) {
        val s = a(i)._2; val w = a(i)._3
        // rightmost prefix of ends strictly below s (ends is sorted asc)
        var lo = 0; var hi = i
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ends(mid) < s) lo = mid + 1 else hi = mid
        }
        dp(i + 1) = math.max(dp(i), w + dp(lo))
        i += 1
      }
      (k, dp(n), n.toLong)
    }.toDF("key", "best_weight", "n_intervals")
  }

  /** Optimal binary merge-schedule cost (Huffman, 1952) — per key, the
    * minimum total bytes moved when merging that key's files pairwise
    * down to one: each merge costs the sum of its inputs, and the
    * greedy "always merge the two smallest" is provably optimal. This
    * is compaction PLANNING for the triple store's (pred, sbucket)
    * partitions and any LSM-ish sink: merge_cost is the floor no merge
    * order beats, Σ size·depth in the Huffman tree. The COST is unique
    * across all optimal tie-breaks (only the tree shape can vary), so
    * the output needs no tie rules at all — any faithful greedy replay
    * agrees, which is what makes it oracle-able.
    *
    * Shape: one shuffle to co-locate a key's file sizes, then the
    * O(n log n) two-queue fold per key (sorted leaves + FIFO of merged
    * nodes — both queues are nondecreasing, so heads suffice);
    * `maxFiles` fails fast on absurd inputs. Sizes < 0 or null drop;
    * a single-file key reports cost 0.
    * Output: (key, n_files, total_size, merge_cost). */
  def huffmanMergeCost(df: DataFrame, key: Column, size: Column,
      maxFiles: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("k"), size.cast("long").as("sz"))
      .where(col("k").isNotNull && col("sz").isNotNull && col("sz") >= 0)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val a = it.map(_._2).toArray
        require(a.length <= maxFiles,
          s"huffmanMergeCost: key $k has ${a.length} files (> $maxFiles)")
        java.util.Arrays.sort(a)
        val merged = new java.util.ArrayDeque[Long]()
        var li = 0
        var cost = 0L
        def takeMin(): Long = {
          val fromLeaves = li < a.length &&
            (merged.isEmpty || a(li) <= merged.peekFirst())
          if (fromLeaves) { li += 1; a(li - 1) } else merged.pollFirst()
        }
        var remaining = a.length
        while (remaining >= 2) {
          val m = takeMin() + takeMin()
          cost += m
          merged.addLast(m)
          remaining -= 1
        }
        (k, a.length.toLong, a.sum, cost)
      }
      .toDF("key", "n_files", "total_size", "merge_cost")
  }
}
