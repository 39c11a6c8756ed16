package graft

import graft.ops.Retrieval

class InvertedIndexSpec extends SparkSuite {
  import spark.implicits._

  private def index(docs: Seq[(String, String)], minDf: Int = 1) =
    Retrieval.invertedIndex(docs.toDF("id", "text"), "id", "text", minDf)
      .as[(String, String, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("postings carry tf and 0-based positions in document order") {
    val out = index(Seq(("d1", "to be or not to be"), ("d2", "be quick")))
    assert(out(("to", "d1")) == (2L, "0,4"))
    assert(out(("be", "d1")) == (2L, "1,5"))
    assert(out(("or", "d1")) == (1L, "2"))
    assert(out(("be", "d2")) == (1L, "0"))
  }

  test("minDf prunes hapax terms; empty/null docs emit nothing") {
    val docs = Seq(("d1", "alpha beta"), ("d2", "alpha gamma"),
      ("d3", ""), ("d4", null.asInstanceOf[String]))
    val out = index(docs, minDf = 2)
    assert(out.keySet.map(_._1) == Set("alpha"))
    assert(out(("alpha", "d1")) == (1L, "0") && out(("alpha", "d2")) == (1L, "0"))
  }

  test("whitespace rule matches the retrieval family; layout invariance") {
    val rows = (0 until 60).map(i => (s"d$i", s"w${i % 7}  w${(i * 3) % 7}\tw4"))
    val df = rows.toDF("id", "text")
    val a = Retrieval.invertedIndex(df.repartition(1), "id", "text")
      .as[(String, String, Long, String)].collect().toSet
    val b = Retrieval.invertedIndex(df.repartition(9), "id", "text")
      .as[(String, String, Long, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
