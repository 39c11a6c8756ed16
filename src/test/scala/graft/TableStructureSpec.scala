package graft

import graft.tag.TableStructure
import org.apache.spark.sql.functions._

class TableStructureSpec extends SparkSuite {
  import spark.implicits._

  // a 3×3 printed table + one stray footer span
  private lazy val spans = Seq(
    // (doc_id, offset, xc, yc)
    ("d1", 0, 100.0, 100.0), ("d1", 1, 300.0, 102.0), ("d1", 2, 500.0, 98.0),
    ("d1", 3, 100.0, 150.0), ("d1", 4, 300.0, 151.0), ("d1", 5, 500.0, 149.0),
    ("d1", 6, 100.0, 200.0), ("d1", 7, 300.0, 200.0), ("d1", 8, 500.0, 200.0),
    ("d1", 9, 100.0, 400.0),
    ("d2", 0, 50.0, 10.0), ("d2", 1, 60.0, 10.0)).toDF("doc_id", "offset", "xc", "yc")

  test("W1 reading order: (y, x) with offset tiebreak") {
    val out = TableStructure.withReadingOrder(spans)
      .where($"doc_id" === "d1").orderBy("reading_order")
      .select("offset").as[Int].collect().toSeq
    assert(out == Seq(2, 0, 1, 5, 3, 4, 6, 7, 8, 9)) // within row: by xc... y asc first
  }

  test("W2 row grouping with tolerance 15") {
    val out = TableStructure.withRowIds(spans)
      .where($"doc_id" === "d1")
      .groupBy("row_id").agg(count(lit(1)).as("n")).orderBy("row_id")
      .select("n").as[Long].collect().toSeq
    assert(out == Seq(3, 3, 3, 1))
  }

  test("W3 column grouping with threshold 100") {
    val out = TableStructure.withColumnIds(spans.where($"doc_id" === "d1" && $"offset" < 9))
      .groupBy("col_id").agg(count(lit(1)).as("n")).orderBy("col_id")
      .select("n").as[Long].collect().toSeq
    assert(out == Seq(3, 3, 3))
  }

  test("table summary: rows, cols, regularity") {
    val s = TableStructure.tableSummary(spans.where($"offset" < 9 && $"doc_id" === "d1"))
      .as[(String, Long, Long, Boolean)].head()
    assert(s == (("d1", 3L, 3L, true)))
    val irregular = TableStructure.tableSummary(spans.where($"doc_id" === "d1"))
      .as[(String, Long, Long, Boolean)].head()
    assert(!irregular._4) // the stray footer row breaks regularity
  }

  test("greedy detect_table_structure == relational summary on separated rows; quirk pinned") {
    import graft.model.{BBox, OcrDoc, OcrSpan}
    def doc(id: String, ys: Seq[Int]) = OcrDoc(id, 800, 1000, ys.zipWithIndex.map {
      case (y, i) => OcrSpan("text", s"c$i", null, i, 0.9, BBox(i * 50, y, 0, 0))
    })
    // well-separated rows (gap > 2×tol): greedy == sessionization
    val sep = spark.createDataset(Seq(doc("s", Seq(0, 0, 0, 50, 50, 50, 100, 100))))
    val g = TableStructure.detectStructureGreedy(sep)
      .as[(String, Int, Int, Boolean)].head()
    assert(g == (("s", 3, 3, false))) // rows of 3,3,2 → irregular
    // the reference quirk: y = 0,14,28 — sessionization chains into ONE row
    // (adjacent gaps ≤ 15), the greedy anchors on the SEED so 28 splits off
    val chain = spark.createDataset(Seq(doc("q", Seq(0, 14, 28))))
    val gq = TableStructure.detectStructureGreedy(chain)
      .as[(String, Int, Int, Boolean)].head()
    assert(gq == (("q", 2, 2, false)), gq) // {0,14} + {28}
    val rel = TableStructure.tableSummary(
      chain.toDF().select($"doc_id", explode($"spans").as("s"))
        .select($"doc_id", $"s.offset".as("offset"),
          ($"s.bbox.x" + $"s.bbox.w" / 2.0).as("xc"),
          ($"s.bbox.y" + $"s.bbox.h" / 2.0).as("yc")))
      .as[(String, Long, Long, Boolean)].head()
    assert(rel._2 == 1L) // one chained row — the documented divergence
  }

  test("column layout: min-membership filter, final-short merge, all-short quirk") {
    def docOf(id: String, xs: Seq[Int]) = xs.zipWithIndex.map { case (x, i) =>
      (id, i, x.toDouble, 10.0 * i) // xc spread, yc arbitrary
    }
    val d = (
      // d1: cols at x≈0 (4 elems), x≈500 (3), x≈900 (2, FINAL, short → merges)
      docOf("d1", Seq(0, 5, 10, 15, 500, 505, 510, 900, 905)) ++
        // d2: two short cols (2+2), total ≥ 3 → non-final dropped, final short
        // with NO kept columns → zero columns (reference quirk)
        docOf("d2", Seq(0, 5, 500, 505)) ++
        // d3: fewer than minPerColumn in total → one catch-all column
        docOf("d3", Seq(0, 900))
      ).toDF("doc_id", "offset", "xc", "yc")
    val out = TableStructure.columnLayout(d)
      .as[(String, Int)].collect().toMap
    assert(out == Map("d1" -> 2, "d2" -> 0, "d3" -> 1), out)
  }

  test("F12 envelope") {
    val env = TableStructure.envelope(
      spans.where($"doc_id" === "d2"), Seq("doc_id"),
      $"xc" - 5, $"yc" - 5, $"xc" + 5, $"yc" + 5)
      .as[(String, Double, Double, Double, Double)].head()
    assert(env == (("d2", 45.0, 5.0, 65.0, 15.0)))
  }
}
