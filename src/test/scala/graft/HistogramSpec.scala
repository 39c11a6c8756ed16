package graft

import graft.ops.Histogram
import org.apache.spark.sql.functions.col

class HistogramSpec extends SparkSuite {
  import spark.implicits._

  private def engine(rows: Seq[(String, Long, Long)], b: Int,
      parts: Int = 3): Map[String, Seq[(Int, Long, Long, Long, Long, Long)]] =
    Histogram.voptimal(rows.toDF("k", "p", "v").repartition(parts),
        col("k"), col("p"), col("v"), b)
      .as[(String, Int, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5, r._6, r._7))
        .toSeq).toMap

  /** Independent reference: EXHAUSTIVE partition enumeration — returns
    * the optimal total SSE as an exact fraction. */
  private def bruteOpt(vs: Seq[Long], b: Int): (BigInt, BigInt) = {
    def sse(seg: Seq[Long]): (BigInt, BigInt) = {
      val n = BigInt(seg.length)
      val s1 = seg.map(BigInt(_)).sum
      val s2 = seg.map(v => BigInt(v) * v).sum
      (n * s2 - s1 * s1, n)
    }
    val n = vs.length
    val cuts = (1 until n).combinations(b - 1)
    cuts.map { c =>
      val bounds = (0 +: c) :+ n
      bounds.sliding(2).map(w => sse(vs.slice(w(0), w(1))))
        .reduce((a, x) => (a._1 * x._2 + x._1 * a._2, a._2 * x._2))
    }.reduce((a, x) => if (x._1 * a._2 < a._1 * x._2) x else a)
  }

  test("buckets achieve the exhaustive-optimum SSE on random series") {
    val rnd = new scala.util.Random(41)
    for (seed <- 1 to 3) {
      val vs = Seq.fill(12)(rnd.nextInt(50).toLong)
      val rows = vs.zipWithIndex.map { case (v, i) => (s"k$seed", i.toLong, v) }
      val got = engine(rows, 3)(s"k$seed")
      // engine buckets form a partition achieving the optimal SSE
      assert(got.map(_._2).head === 0L)
      assert(got.map(_._4).sum === 12L)
      val (on, od) = bruteOpt(vs, 3)
      val gotSse = got.map { g =>
        val seg = vs.slice(g._2.toInt, g._2.toInt + g._4.toInt)
        val n = BigInt(seg.length); val s1 = seg.map(BigInt(_)).sum
        val s2 = seg.map(v => BigInt(v) * v).sum
        (n * s2 - s1 * s1, n)
      }.reduce((a, x) => (a._1 * x._2 + x._1 * a._2, a._2 * x._2))
      assert(gotSse._1 * od === on * gotSse._2, s"seed=$seed suboptimal")
    }
  }

  test("hand case: two clear clusters split exactly; sse_ppm exact") {
    val rows = Seq(1L, 1L, 2L, 100L, 101L, 99L).zipWithIndex
      .map { case (v, i) => ("h", i.toLong, v) }
    val got = engine(rows, 2)("h")
    // bucket 1 = positions 0..2 (values 1,1,2), bucket 2 = 3..5
    assert(got(0) === ((1, 0L, 2L, 3L, 4L, 666666L))) // SSE 2/3 -> 666666
    assert(got(1) === ((2, 3L, 5L, 3L, 300L, 2000000L))) // SSE 2
  }

  test("fewer points than buckets -> one zero-SSE bucket per point") {
    val got = engine(Seq(("s", 1L, 7L), ("s", 2L, 9L)), 5)("s")
    assert(got === Seq((1, 1L, 1L, 1L, 7L, 0L), (2, 2L, 2L, 1L, 9L, 0L)))
  }

  test("deterministic across layouts; constant series is zero SSE") {
    val rows = (0 until 30).map(i => ("c", i.toLong, (i % 7).toLong * 3))
    assert(engine(rows, 4, parts = 2) === engine(rows, 4, parts = 13))
    val const = engine((0 until 10).map(i => ("z", i.toLong, 5L)), 3)("z")
    assert(const.forall(_._6 == 0L)) // every bucket SSE 0
    assert(const.map(_._5).sum === 50L) // vsums partition the total
    assert(const.map(_._4).sum === 10L)
  }
}
