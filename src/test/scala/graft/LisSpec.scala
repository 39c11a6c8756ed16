package graft

import graft.ops.Lis
import org.apache.spark.sql.functions.col

class LisSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], parts: Int = 3) =
    Lis.longestRun(rows.toDF("k", "x", "v").repartition(parts),
      col("k"), Seq(col("x")), col("v"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  /** Independent reference: the O(n^2) textbook DP
    * dp[i] = 1 + max(dp[j] : j < i, v[j] < v[i]) — no tails, no search. */
  private def quad(vs: Seq[Long]): Long = {
    if (vs.isEmpty) return 0L
    val dp = Array.fill(vs.length)(1)
    for (i <- vs.indices; j <- 0 until i if vs(j) < vs(i))
      dp(i) = math.max(dp(i), dp(j) + 1)
    dp.max.toLong
  }

  test("sorted, reverse, constant, classic") {
    val got = run(Seq(
      ("up", 1, 1), ("up", 2, 5), ("up", 3, 9),
      ("dn", 1, 9), ("dn", 2, 5), ("dn", 3, 1),
      ("eq", 1, 4), ("eq", 2, 4), ("eq", 3, 4),
      // 10 9 2 5 3 7 101 18 -> LIS 4 (2 5 7 18 or 2 3 7 101/18)
      ("cl", 1, 10), ("cl", 2, 9), ("cl", 3, 2), ("cl", 4, 5),
      ("cl", 5, 3), ("cl", 6, 7), ("cl", 7, 101), ("cl", 8, 18)))
    assert(got("up") === ((3L, 3L)))
    assert(got("dn") === ((3L, 1L)))
    assert(got("eq") === ((3L, 1L))) // strict: equals don't chain
    assert(got("cl") === ((8L, 4L)))
  }

  test("sequence follows the order column, not insertion order") {
    // values by x order: 1,2,3 -> LIS 3 even though rows arrive shuffled
    val got = run(Seq(("a", 3, 3), ("a", 1, 1), ("a", 2, 2)))
    assert(got("a") === ((3L, 3L)))
  }

  test("parity with the quadratic DP on random series") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 15).flatMap { s =>
      val n = 1 + rnd.nextInt(120)
      (0 until n).map(i => (f"s$s%02d", i.toLong, rnd.nextInt(40).toLong))
    }
    val got = run(rows, parts = 5)
    for ((k, grp) <- rows.groupBy(_._1)) {
      val vs = grp.sortBy(_._2).map(_._3)
      assert(got(k) === ((vs.length.toLong, quad(vs))), s"key $k")
    }
  }
}
