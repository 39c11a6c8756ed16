package graft

import graft.ops.StringSim
import org.apache.spark.sql.DataFrame

class StringSimSpec extends SparkSuite {
  import spark.implicits._

  private def t(rows: (Long, String)*) = rows.toDF("id", "name")
  private def run(df: DataFrame, k: Int = 1,
      cap: Int = 1000): Set[(String, String, Long)] =
    StringSim.editDistanceJoin(df, "id", "name", maxDist = k, maxBucket = cap)
      .as[(String, String, Long)].collect().toSet

  test("k=1 finds substitution, insertion, and deletion pairs exactly") {
    val rows = Seq((1L, "acme corp"), (2L, "acme corp."), // insertion vs 1
      (3L, "acme c0rp"),                                  // substitution vs 1
      (4L, "acme cor"),                                   // deletion vs 1
      (5L, "completely different"))
    val out = run(t(rows: _*))
    assert(out == naive(rows, 1))
    assert(out.contains(("1", "2", 1L)) && out.contains(("1", "3", 1L)) &&
      out.contains(("1", "4", 1L)) && !out.exists(p => p._1 == "5" || p._2 == "5"))
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def naive(rows: Seq[(Long, String)], k: Int): Set[(String, String, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia.toString < ib.toString && sa != null && sb != null
      d = lev(sa, sb) if d <= k
    } yield (ia.toString, ib.toString, d.toLong)).toSet

  test("k=1 and k=2 match the naive all-pairs scan on a pseudo-random set") {
    val alphabet = "abcde"
    val rows = (0L until 80L).map { i =>
      val len = 4 + (i % 4).toInt
      (i, (0 until len).map(j => alphabet(((i * 7 + j * 3) % 5).toInt)).mkString)
    }
    assert(run(t(rows: _*), k = 1, cap = 100000) == naive(rows, 1))
    assert(run(t(rows: _*), k = 2, cap = 100000) == naive(rows, 2))
  }

  test("identical strings pair at distance 0; nulls never pair") {
    val out = run(t((1L, "same"), (2L, "same"), (3L, null)))
    assert(out == Set(("1", "2", 0L)))
  }

  test("over-cap variant buckets drop WITH an in-operator warning") {
    // 30 strings all sharing the deletion variant "xx" (e.g. "axx","xax"..)
    // plus cap=5: cross-variant pairs must vanish and the warn must count
    val rows = (0L until 30L).map(i => (i, s"x${('a' + i % 26).toChar}x"))
    val (out, warned) = Audit.capturing {
      run(t(rows: _*), k = 1, cap = 5)
    }
    assert(warned.exists(_.contains("editDistanceJoin: dropping")))
    val full = run(t(rows: _*), k = 1, cap = 100000)
    assert(out.subsetOf(full) && out.size < full.size)
  }

  test("layout invariance") {
    val rows = (0L until 50L).map(i => (i, f"Customer#${i % 17}%03d"))
    val base = run(t(rows: _*))
    assert(run(t(rows: _*).repartition(11)) == base)
  }
}
