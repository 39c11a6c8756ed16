package graft

import graft.graph.Cooccur
import org.apache.spark.sql.DataFrame

class CooccurSpec extends SparkSuite {
  import spark.implicits._

  private def m(rows: (String, String)*) = rows.toDF("c", "i")
  private def run(df: DataFrame, minCount: Long = 2L,
      cap: Int = 10000): Set[(String, String, Long)] =
    Cooccur.project(df, "c", "i", minCount, cap)
      .as[(String, String, Long)].collect().toSet

  test("pairs count distinct shared containers; minCount filters") {
    val rows = m(("d1", "a"), ("d1", "b"), ("d1", "c"),
      ("d2", "a"), ("d2", "b"),
      ("d3", "a"), ("d3", "b"))
    assert(run(rows) == Set(("a", "b", 3L)))
    assert(run(rows, minCount = 1L) == Set(("a", "b", 3L),
      ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("duplicate membership rows count once per container") {
    val rows = m(("d1", "a"), ("d1", "a"), ("d1", "b"), ("d2", "a"), ("d2", "b"))
    assert(run(rows) == Set(("a", "b", 2L)))
  }

  test("over-cap containers are excluded WITH an in-operator warning") {
    val big = (1 to 20).map(k => ("huge", s"x$k"))
    val rows = m((big ++ Seq(("d1", "a"), ("d1", "b"), ("d2", "a"), ("d2", "b"))): _*)
    val (out, warned) = Audit.capturing { run(rows, cap = 10) }
    assert(warned.exists(_.contains("Cooccur.project: excluding 1 containers")))
    assert(out == Set(("a", "b", 2L))) // huge's pairs absent
    val (full, silent) = Audit.capturing { run(rows, cap = 100) }
    // under the cap: no warn; huge's singleton pairs fall to minCount anyway
    assert(!silent.exists(_.contains("excluding")) && full == Set(("a", "b", 2L)))
  }

  test("matches a naive driver projection on pseudo-random memberships") {
    val rows = (1 to 150).map(k => (s"d${k * 7 % 20}", s"i${k * 13 % 30}"))
    def naive(rs: Seq[(String, String)]): Set[(String, String, Long)] = {
      val byC = rs.distinct.groupBy(_._1).values
      byC.flatMap { ms =>
        val is = ms.map(_._2).sorted
        for (a <- is; b <- is if a < b) yield (a, b)
      }.groupBy(identity).map { case (p, v) => (p._1, p._2, v.size.toLong) }
        .filter(_._3 >= 2).toSet
    }
    assert(run(m(rows: _*)) == naive(rows))
    assert(run(m(rows: _*).repartition(9)) == naive(rows)) // layout invariance
  }

  test("pmi/lift: margins and N come from the SAME kept membership") {
    // a in d1,d2,d3; b in d1,d2,d4; ab co-occur in d1,d2; N=4 containers
    // (d4 carries c to keep it in N via its membership)
    val rows = m(("d1", "a"), ("d1", "b"), ("d2", "a"), ("d2", "b"),
      ("d3", "a"), ("d4", "b"))
    val out = Cooccur.pmi(rows, "c", "i", minCount = 2L)
      .as[(String, String, Long, Double, Double)].collect().toSet
    val lift = 2.0 * 4.0 / (3.0 * 3.0) // n_ab*N / (n_a*n_b)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Set(("a", "b", 2L, r6(lift), r6(math.log(lift)))))
  }

  test("pmi: independent items have lift ~1, affine items > 1") {
    // x and y always together (4 of 8 containers); u uniform everywhere
    val rows = (1 to 4).flatMap(d => Seq((s"p$d", "x"), (s"p$d", "y"), (s"p$d", "u"))) ++
      (1 to 4).map(d => (s"q$d", "u"))
    val out = Cooccur.pmi(m(rows: _*), "c", "i", minCount = 1L)
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out(("x", "y")) == 2.0)   // 4*8/(4*4): perfectly affine
    assert(out(("u", "x")) == 1.0)   // 4*8/(8*4): x independent of u
    // capped containers drop consistently from pairs AND margins
    val (capped, _) = Audit.capturing {
      Cooccur.pmi(m((rows ++ (1 to 30).map(k => ("mega", s"z$k"))): _*),
        "c", "i", minCount = 1L, maxPerContainer = 10)
        .as[(String, String, Long, Double, Double)].collect()
        .map(r => (r._1, r._2) -> r._4).toMap
    }
    assert(capped == out) // the mega container never entered any factor
  }
}
