package graft

import graft.model.{BBox, OcrDoc, OcrSpan}
import graft.tag.Proximity

/** W6 per-document proximity grouping: reference-exact greedy semantics
  * (geometry_utils.py:139-204) + oracle property vs the distributed CC. */
class ProximitySpec extends SparkSuite {
  import spark.implicits._

  private def doc(id: String, pts: Seq[(Int, Int)]): OcrDoc =
    OcrDoc(id, 800, 1000, pts.zipWithIndex.map { case ((x, y), i) =>
      // w=h=0 so the center IS the point (keeps distances literal)
      OcrSpan("text", s"t$i", null, i, 0.9, BBox(x, y, 0, 0))
    })

  test("tight separated clusters: greedy == distributed connected components") {
    // three blobs of diameter ≤ 50, mutual separation > 50, across 2 docs
    val rng = new scala.util.Random(7)
    def blob(cx: Int, cy: Int, n: Int) =
      Seq.fill(n)((cx + rng.nextInt(20), cy + rng.nextInt(20)))
    val docs = Seq(
      doc("d1", blob(0, 0, 4) ++ blob(300, 0, 3) ++ blob(0, 500, 5)),
      doc("d2", blob(100, 100, 6) ++ blob(600, 600, 2)))
    val ds = spark.createDataset(docs)

    val greedy = Proximity.proximityGroups(ds, 50.0)
      .as[(String, Int, Int)].collect()
      .groupBy { case (d, _, g) => (d, g) }.values
      .map(_.map { case (d, o, _) => s"$d/$o" }.toSet).toSet

    val cc = graft.canon.ConnectedComponents.run(Proximity.proximityEdges(ds, 50.0))
      .as[(String, String)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet

    // CC omits isolated nodes (no edges) — compare multi-member groups, and
    // greedy singletons must be exactly the CC-isolated nodes
    val greedyMulti = greedy.filter(_.size > 1)
    assert(greedyMulti == cc, s"greedy=$greedyMulti cc=$cc")
    assert(greedy.flatten == docs.flatMap(d => d.spans.map(s => s"${d.doc_id}/${s.offset}")).toSet)
  }

  test("reference quirk: single-pass greedy splits a badly-ordered chain (CC would not)") {
    // A(0,0), B(0,90), C(0,45): AB=90 (far), AC=45, BC=45. Scan order A,B,C:
    // B is checked before C joins, never revisited → {A,C} + {B}, exactly
    // what geometry_utils.py's while-loop produces.
    val ds = spark.createDataset(Seq(doc("q", Seq((0, 0), (0, 90), (0, 45)))))
    val groups = Proximity.proximityGroups(ds, 50.0)
      .as[(String, Int, Int)].collect().map { case (_, o, g) => o -> g }.toMap
    assert(groups(0) == groups(2), "A and C share a group")
    assert(groups(1) != groups(0), "B was skipped before C joined — greedy quirk")
    // while CC on the same edges joins all three
    val cc = graft.canon.ConnectedComponents.run(Proximity.proximityEdges(ds, 50.0))
      .as[(String, String)].collect().map(_._2).toSet
    assert(cc.size == 1)
  }

  test("chain ordered favorably IS joined by the greedy (members grow during the scan)") {
    // A(0,0), C(0,45), B(0,90): C absorbs at i=1, then B chains through C
    val ds = spark.createDataset(Seq(doc("c", Seq((0, 0), (0, 45), (0, 90)))))
    val gs = Proximity.proximityGroups(ds, 50.0)
      .as[(String, Int, Int)].collect().map(_._3).toSet
    assert(gs.size == 1)
  }

  test("empty and singleton docs") {
    val ds = spark.createDataset(Seq(doc("e", Nil), doc("s", Seq((5, 5)))))
    val out = Proximity.proximityGroups(ds).as[(String, Int, Int)].collect()
    assert(out.toSeq == Seq(("s", 0, 0)))
  }
}
