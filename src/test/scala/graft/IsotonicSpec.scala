package graft

import graft.ops.Isotonic
import org.apache.spark.sql.functions.col

class IsotonicSpec extends SparkSuite {
  import spark.implicits._

  private def run(pts: Seq[(String, Long, Long)], parts: Int = 3) =
    Isotonic.fit(pts.toDF("s", "x", "y").repartition(parts),
      col("s"), col("x"), col("y"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap

  /** Independent reference: the minimax closed form
    * f_i = max_{j<=i} min_{k>=i} avg(y[j..k]) evaluated with exact
    * BigInt rationals — no pooling, no stacks, O(n^3). */
  private def minimax(ys: Seq[Long]): Seq[Long] = {
    val n = ys.length
    val pre = ys.scanLeft(0L)(_ + _) // pre(k) = sum of first k
    def avg(j: Int, k: Int): (BigInt, BigInt) = // 1-based inclusive
      (BigInt(pre(k) - pre(j - 1)), BigInt(k - j + 1))
    def lt(a: (BigInt, BigInt), b: (BigInt, BigInt)): Boolean =
      a._1 * b._2 < b._1 * a._2
    (1 to n).map { i =>
      val best = (1 to i).map { j =>
        (i to n).map(k => avg(j, k)).reduce((p, q) => if (lt(p, q)) p else q)
      }.reduce((p, q) => if (lt(p, q)) q else p)
      val (num, den) = best
      val scaled = num * 1000000
      val fd = if (scaled.sign * den.sign >= 0 || scaled % den == 0)
        scaled / den
      else scaled / den - 1 // floor division for negatives
      fd.toLong
    }
  }

  test("already monotone is unchanged; constant stays constant") {
    val got = run(Seq(("a", 1, 1), ("a", 2, 3), ("a", 3, 7),
      ("b", 1, 5), ("b", 2, 5)))
    assert(got(("a", 1)) === 1000000L)
    assert(got(("a", 2)) === 3000000L)
    assert(got(("a", 3)) === 7000000L)
    assert(got(("b", 1)) === 5000000L)
    assert(got(("b", 2)) === 5000000L)
  }

  test("single violation pools to the pair mean (exact half-ppm floor)") {
    val got = run(Seq(("a", 1, 4), ("a", 2, 3)))
    assert(got(("a", 1)) === 3500000L)
    assert(got(("a", 2)) === 3500000L)
  }

  test("strictly decreasing pools everything to the global mean") {
    val got = run(Seq(("a", 1, 9), ("a", 2, 5), ("a", 3, 1)))
    assert(got.values.toSet === Set(5000000L))
  }

  test("cascading pool: a late low point drags earlier blocks down") {
    // 1, 5, 4, 0 -> PAVA: [1], [5,4,0]->3 -> 1, 3, 3, 3
    val got = run(Seq(("a", 1, 1), ("a", 2, 5), ("a", 3, 4), ("a", 4, 0)))
    assert(got(("a", 1)) === 1000000L)
    assert(got(("a", 2)) === 3000000L)
    assert(got(("a", 3)) === 3000000L)
    assert(got(("a", 4)) === 3000000L)
  }

  test("negative values floor toward negative infinity") {
    val got = run(Seq(("a", 1, 0), ("a", 2, -1)))
    // pooled mean -1/2 -> floor(-500000.0) = -500000
    assert(got(("a", 1)) === -500000L)
    val got2 = run(Seq(("a", 1, 0), ("a", 2, -1), ("a", 3, -1)))
    // pooled mean -2/3 -> floor(-666666.66) = -666667
    assert(got2(("a", 1)) === -666667L)
  }

  test("parity with the exact-rational minimax closed form on random series") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 8) {
      val n = 5 + rnd.nextInt(25)
      val ys = Seq.fill(n)(rnd.nextInt(41).toLong - 10L)
      val pts = ys.zipWithIndex.map { case (y, i) => ("s", (i + 1).toLong, y) }
      val got = run(pts, parts = 4)
      val want = minimax(ys)
      for (i <- 1 to n)
        assert(got(("s", i.toLong)) === want(i - 1), s"trial $trial i=$i ys=$ys")
    }
  }
}
