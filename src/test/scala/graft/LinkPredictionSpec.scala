package graft

import graft.graph.LinkPrediction
import org.apache.spark.sql.functions._

class LinkPredictionSpec extends SparkSuite {
  import spark.implicits._

  private def edges(rows: (String, String)*) = rows.toDF("src", "dst")
  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, String, Long, Double, Double)].collect()
      .map { case (a, b, c, j, aa) => (a, b) -> ((c, j, aa)) }.toMap

  // path graph with a shared hub: a-h, b-h, a-x, b-y
  // candidates: (a,b) via h; (h,x) via a; (h,y) via b; (x non-adj y: no common)
  private val star = edges(("a", "h"), ("b", "h"), ("a", "x"), ("b", "y"))

  test("scores the three standard measures on a shared-hub wedge") {
    val out = rows(LinkPrediction.scores(star))
    // (a,b): common = {h}; deg a = 2, deg b = 2; jaccard = 1/(2+2-1)
    // adamic-adar = 1/ln(deg h) = 1/ln 2
    val (c, j, aa) = out(("a", "b"))
    assert(c == 1L)
    assert(j == math.rint(1.0 / 3.0 * 1e6) / 1e6)
    assert(aa == math.rint(1.0 / math.log(2.0) * 1e6) / 1e6)
    // (h,x) via a, (h,y) via b also distance-2 pairs
    assert(out.keySet == Set(("a", "b"), ("h", "x"), ("h", "y")))
  }

  test("adjacent pairs are never scored; duplicates/self-loops tolerated") {
    // triangle a-b-c plus pendant c-d: (a,d),(b,d) are the only distance-2
    // non-adjacent pairs (via c)
    val tri = edges(("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"),
      ("c", "d"), ("a", "a"))
    val out = rows(LinkPrediction.scores(tri))
    assert(out.keySet == Set(("a", "d"), ("b", "d")))
    val (c, j, aa) = out(("a", "d"))
    // common {c}; deg a = 2, deg d = 1; jaccard 1/(2+1-1); aa 1/ln(3)
    assert(c == 1L && j == 0.5)
    assert(aa == math.rint(1.0 / math.log(3.0) * 1e6) / 1e6)
  }

  test("two common neighbors accumulate count and adamic-adar") {
    // a and b share neighbors u (deg 2) and v (deg 3; extra edge v-w)
    val g = edges(("a", "u"), ("b", "u"), ("a", "v"), ("b", "v"), ("v", "w"))
    val (c, j, aa) = rows(LinkPrediction.scores(g, minCommon = 2))(("a", "b"))
    assert(c == 2L)
    assert(j == 1.0) // 2/(2+2-2): u and v are BOTH endpoints' whole neighborhoods
    val expected = 1.0 / math.log(2.0) + 1.0 / math.log(3.0)
    assert(aa == math.rint(expected * 1e6) / 1e6)
  }

  test("minCommon filters; layout invariance") {
    val g = edges(("a", "u"), ("b", "u"), ("a", "v"), ("b", "v"), ("v", "w"),
      ("c", "u"))
    // (a,b) share {u,v}; (u,v) are non-adjacent and share {a,b} — both pass
    val strict = LinkPrediction.scores(g.repartition(7), minCommon = 2)
    assert(rows(strict).keySet == Set(("a", "b"), ("u", "v")))
    val one = rows(LinkPrediction.scores(g.coalesce(1)))
    val many = rows(LinkPrediction.scores(g.repartition(8)))
    assert(one == many)
  }

  test("hub cap drops capped wedges WITH in-line accounting; silent when under cap") {
    // h has degree 4 (a,b,c,d); a and b also share low-degree neighbor u
    val g = edges(("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"),
      ("a", "u"), ("b", "u"))
    val (capped, warns) = Audit.capturing {
      rows(LinkPrediction.scores(g, maxHubDegree = 3))
    }
    // h is capped as an APEX: pairs whose only common neighbor is h
    // disappear ((a,c), (b,d), (c,d), ...); (a,b) survives via u, and
    // (h,u) survives via the low-degree apexes a and b
    assert(capped.keySet == Set(("a", "b"), ("h", "u")))
    assert(capped(("a", "b"))._1 == 1L)
    assert(capped(("a", "b"))._3 == math.rint(1.0 / math.log(2.0) * 1e6) / 1e6)
    assert(warns.exists(_.contains("hub cap dropped 1")))
    val (uncapped, silent) = Audit.capturing {
      rows(LinkPrediction.scores(g, maxHubDegree = 10))
    }
    assert(silent.isEmpty)
    assert(uncapped.keySet == Set(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("h", "u")))
    // jaccard denominators still use the TRUE degrees (cap affects wedges
    // only): (a,b) common {u}, deg a = deg b = 2 -> 1/(2+2-1)
    assert(capped(("a", "b"))._2 == math.rint(1.0 / 3.0 * 1e6) / 1e6)
  }

  test("empty graph and wedge-free graph yield empty results") {
    assert(LinkPrediction.scores(edges(("a", "b"))).count() == 0)
    assert(LinkPrediction.scores(
      Seq.empty[(String, String)].toDF("src", "dst")).count() == 0)
  }
}
