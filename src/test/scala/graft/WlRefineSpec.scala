package graft

import graft.graph.WlRefine

class WlRefineSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], rounds: Int = 3) =
    WlRefine.refine(edges.toDF("src", "dst"), rounds)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("path a-b-c: the symmetric endpoints share a color, the center " +
    "does not") {
    val out = run(Seq("a" -> "b", "b" -> "c"))
    assert(out("a") == out("c"))
    assert(out("a")._2 != out("b")._2)
    assert(out("a")._1 == 1L && out("b")._1 == 2L)
  }

  test("star: all leaves one color, center another; refinement is stable") {
    (1 to 3).foreach { r =>
      val out = run((1 to 6).map(i => "hub" -> s"l$i"), rounds = r)
      val leafColors = (1 to 6).map(i => out(s"l$i")._2).distinct
      assert(leafColors.size == 1)
      assert(out("hub")._2 != leafColors.head)
    }
  }

  test("WL separates same-degree nodes with different neighborhoods") {
    // two 4-cycles glued at x: every node has degree 2 except x (4), but
    // nodes adjacent to x differ from nodes opposite x after 2 rounds
    val cyc = Seq("x" -> "a1", "a1" -> "b1", "b1" -> "c1", "c1" -> "x",
      "x" -> "a2", "a2" -> "b2", "b2" -> "c2", "c2" -> "x")
    val out = run(cyc, rounds = 2)
    assert(out("a1")._2 == out("a2")._2) // symmetric positions agree
    assert(out("b1")._2 == out("b2")._2)
    assert(out("a1")._2 != out("b1")._2) // x-adjacent vs x-opposite split
  }

  test("quotient collapses role classes and counts directed cross-class " +
    "edges") {
    import org.apache.spark.sql.functions.col
    // star: 6 leaves -> hub. Two classes; all 6 edges leaf-class -> hub-class
    val edges = (1 to 6).map(i => (s"l$i", "hub")).toDF("src", "dst")
    val q = graft.graph.WlRefine.quotient(edges, rounds = 2)
      .as[(Long, Long, Long)].collect()
    assert(q.length == 1 && q.head._3 == 6L)
    val lab = run((1 to 6).map(i => s"l$i" -> "hub"), rounds = 2)
    assert(q.head._1 == lab("l1")._2 && q.head._2 == lab("hub")._2)
    // direction preserved: reversing the edges swaps the class pair
    val rq = graft.graph.WlRefine.quotient(
      edges.select(col("dst").as("src"), col("src").as("dst")), rounds = 2)
      .as[(Long, Long, Long)].collect()
    assert(rq.length == 1 && rq.head._1 == q.head._2 && rq.head._2 == q.head._1)
  }

  test("multi-edges are real multiset multiplicity; layout invariant") {
    val single = run(Seq("a" -> "b", "b" -> "c"))
    val doubled = run(Seq("a" -> "b", "a" -> "b", "b" -> "c"))
    assert(doubled("a")._1 == 2L) // degree counts the parallel edge
    assert(doubled("c")._2 != single("c")._2) // and it propagates
    val e = (1 to 200).map(i => s"n$i" -> s"n${i / 2}")
    val a = WlRefine.refine(e.toDF("src", "dst").repartition(1), 3)
      .as[(String, Long, Long)].collect().toSet
    val b = WlRefine.refine(e.toDF("src", "dst").repartition(7), 3)
      .as[(String, Long, Long)].collect().toSet
    assert(a == b)
  }
}
