package graft

import graft.graph.Butterflies
import org.apache.spark.sql.Row

class ButterfliesSpec extends SparkSuite {
  import spark.implicits._

  private def census(edges: Seq[(String, String)]): Row =
    Butterflies.census(edges.toDF("l", "r"), "l", "r").head()

  test("one butterfly exactly: K_{2,2}; wedges and pair counts by hand") {
    val r = census(Seq(("d1", "e1"), ("d1", "e2"), ("d2", "e1"), ("d2", "e2")))
    // each right node has deg 2 → 1 wedge each; one pair (d1,d2) cop=2
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(r.getLong(2) == 1 && r.getLong(3) == 1 && r.getLong(4) == 1)
  }

  test("K_{3,3} has C(3,2)^2 = 9 butterflies; a star has none") {
    val k33 = for { d <- 1 to 3; e <- 1 to 3 } yield (s"d$d", s"e$e")
    val r = census(k33)
    // wedges: 3 right nodes × C(3,2) = 9; pairs: 3, each cop = 3 → 3·C(3,2)=9
    assert(r.getLong(1) == 9 && r.getLong(2) == 3)
    assert(r.getLong(3) == 3 && r.getLong(4) == 9)
    val star = (1 to 6).map(i => ("hub", s"e$i"))
    val rs = census(star)
    assert(rs.getLong(1) == 0 && rs.getLong(4) == 0)
  }

  test("independent brute-force parity on a pseudo-random bipartite graph") {
    val edges = (for {
      d <- 0 until 12; e <- 0 until 9
      if (d * 5 + e * 11) % 4 == 0
    } yield (s"d$d", s"e$e")).toSeq
    val r = census(edges)
    val byDoc = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val docs = byDoc.keys.toSeq.sorted
    var pairs = 0L; var ge2 = 0L; var bf = 0L
    for (i <- docs.indices; j <- (i + 1) until docs.size) {
      val c = (byDoc(docs(i)) & byDoc(docs(j))).size.toLong
      if (c >= 1) pairs += 1
      if (c >= 2) ge2 += 1
      bf += c * (c - 1) / 2
    }
    val wedges = edges.groupBy(_._2)
      .map { case (_, v) => val d = v.map(_._1).toSet.size.toLong; d * (d - 1) / 2 }
      .sum
    assert(r.getLong(0) == edges.distinct.size)
    assert(r.getLong(1) == wedges && r.getLong(2) == pairs)
    assert(r.getLong(3) == ge2 && r.getLong(4) == bf)
  }

  test("duplicate edges and nulls are cleaned before counting") {
    val r = Butterflies.census(
      Seq(("d1", Some("e1")), ("d1", Some("e1")), ("d1", None),
        ("d2", Some("e1")), ("d1", Some("e2")), ("d2", Some("e2")))
        .toDF("l", "r"), "l", "r").head()
    assert(r.getLong(0) == 4 && r.getLong(4) == 1)
  }
}
