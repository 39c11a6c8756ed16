package graft

import graft.ops.Scheduling
import org.apache.spark.sql.functions.col

class SchedulingSpec extends SparkSuite {
  import spark.implicits._

  private def run(iv: Seq[(String, Long, Long, Long)], parts: Int = 3) =
    Scheduling.weightedIntervalBest(
      iv.toDF("k", "s", "e", "w").repartition(parts),
      col("k"), col("s"), col("e"), col("w"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  /** Independent reference: exhaustive subset enumeration — no DP, no
    * sorting tricks; only feasible because fixtures are tiny. */
  private def brute(iv: Seq[(Long, Long, Long)]): Long = {
    val v = iv.toVector
    (0 until (1 << v.length)).map { m =>
      val sel = v.indices.filter(i => (m & (1 << i)) != 0).map(v)
      val ok = sel.combinations(2).forall {
        case Seq(a, b) => a._2 < b._1 || b._2 < a._1
        case _         => true
      }
      if (ok) sel.map(_._3).sum else Long.MinValue
    }.max.max(0L)
  }

  test("greedy-suboptimal case: one long heavy interval beats two light") {
    // [1,10] w=10 vs {[1,3] w=3, [5,10] w=4}: optimal takes the single 10
    val got = run(Seq(("a", 1, 10, 10), ("a", 1, 3, 3), ("a", 5, 10, 4)))
    assert(got("a") === ((10L, 3L)))
    // flip the weights: now the pair wins
    val got2 = run(Seq(("a", 1, 10, 5), ("a", 1, 3, 3), ("a", 5, 10, 4)))
    assert(got2("a") === ((7L, 3L)))
  }

  test("touching intervals conflict (inclusive ends)") {
    // [1,5] and [5,9] share point 5 -> only one can be taken
    assert(run(Seq(("a", 1, 5, 3), ("a", 5, 9, 4)))("a") === ((4L, 2L)))
    // [1,5] and [6,9] are compatible
    assert(run(Seq(("a", 1, 5, 3), ("a", 6, 9, 4)))("a") === ((7L, 2L)))
  }

  test("invalid and null rows dropped; per-key independence") {
    val got = run(Seq(("a", 9, 1, 100), ("a", 1, 2, 5), ("b", 1, 2, 7)))
    assert(got === Map("a" -> ((5L, 1L)), "b" -> ((7L, 1L))))
  }

  // ---- Huffman merge-schedule cost --------------------------------------

  private def huff(rows: Seq[(String, Long)]) =
    Scheduling.huffmanMergeCost(rows.toDF("k", "sz").repartition(3),
        col("k"), col("sz"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  /** Independent reference: exhaustive merge-order search (any pair each
    * step, not just the two smallest) — the true optimum. */
  private def bruteMerge(sizes: Seq[Long]): Long =
    if (sizes.length < 2) 0L
    else (for {
      i <- sizes.indices; j <- (i + 1) until sizes.length
    } yield {
      val m = sizes(i) + sizes(j)
      val rest = sizes.zipWithIndex
        .collect { case (v, x) if x != i && x != j => v }
      m + bruteMerge(rest :+ m)
    }).min

  test("huffman: greedy cost == exhaustive optimal merge order") {
    val rnd = new scala.util.Random(53)
    for (seed <- 1 to 3) {
      val sizes = Seq.fill(6)(rnd.nextInt(40).toLong + 1)
      val got = huff(sizes.map(("k", _)))("k")
      assert(got === ((6L, sizes.sum, bruteMerge(sizes))), s"seed=$seed")
    }
  }

  test("huffman: classic anchor, singleton, zero sizes") {
    // {1,2,3,4}: merges 1+2=3, 3+3=6, 6+4=10 -> cost 19
    assert(huff(Seq(("c", 1L), ("c", 2L), ("c", 3L), ("c", 4L)))("c") ===
      ((4L, 10L, 19L)))
    assert(huff(Seq(("s", 42L)))("s") === ((1L, 42L, 0L)))
    // zero-size files merge for free first
    assert(huff(Seq(("z", 0L), ("z", 0L), ("z", 5L)))("z") === ((3L, 5L, 5L)))
  }

  test("duplicates stack only if disjoint") {
    assert(run(Seq(("a", 1, 2, 5), ("a", 1, 2, 5)))("a") === ((5L, 2L)))
  }

  test("parity with exhaustive enumeration on random fixtures") {
    val rnd = new scala.util.Random(7)
    val keys = (0 until 12).map(i => f"k$i%02d")
    val iv = keys.flatMap { k =>
      (0 until (3 + rnd.nextInt(12))).map { _ =>
        val s = rnd.nextInt(40).toLong
        (k, s, s + rnd.nextInt(12).toLong, (1 + rnd.nextInt(20)).toLong)
      }
    }
    val got = run(iv, parts = 5)
    for (k <- keys) {
      val mine = iv.filter(_._1 == k).map(t => (t._2, t._3, t._4))
      assert(got(k)._1 === brute(mine), s"key $k")
      assert(got(k)._2 === mine.length.toLong)
    }
  }
}
