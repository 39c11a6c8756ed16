package graft

import graft.ops.Curation

class LeakageSplitSpec extends SparkSuite {
  import spark.implicits._

  test("every member of a duplicate group lands in the SAME split") {
    val docs = (1L to 300L).toDF("doc_id")
    // groups of 3: 1..3 -> 1, 4..6 -> 4, ...
    val groups = (1L to 300L).map(i => (i, ((i - 1) / 3) * 3 + 1))
      .toDF("id", "group_id")
    val out = Curation.leakageSafeSplit(docs, "doc_id", groups)
      .as[(Long, Long, String)].collect()
    out.groupBy(_._2).foreach { case (g, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"group $g split apart")
    }
  }

  test("docs without a group are singleton groups on their own id") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val groups = Seq((1L, 1L)).toDF("id", "group_id")
    val out = Curation.leakageSafeSplit(docs, "doc_id", groups)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("proportions track the per-mille cuts; assignment is hash-stable " +
    "(growing the corpus never moves an old group)") {
    val docs = (1L to 4000L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("id", "group_id")
    val out = Curation.leakageSafeSplit(docs, "doc_id", none)
      .as[(Long, Long, String)].collect()
    val frac = out.groupBy(_._3).view.mapValues(_.length / 4000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.03)
    assert(math.abs(frac("test") - 0.1) < 0.03)
    // stability: the first 2000 docs split identically within a larger corpus
    val small = Curation.leakageSafeSplit((1L to 2000L).toDF("doc_id"),
        "doc_id", none).as[(Long, Long, String)].collect().toSet
    assert(small.subsetOf(out.toSet))
  }

  test("cut points validate") {
    val docs = Seq(1L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("id", "group_id")
    intercept[IllegalArgumentException] {
      Curation.leakageSafeSplit(docs, "doc_id", none, 900, 900)
    }
  }
}
