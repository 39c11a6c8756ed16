package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._

class GroupSampleSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = (1 to 100).map(i => (s"g${i % 4}", i.toLong, s"payload$i"))

  test("exactly k per group (all rows when the group is smaller)") {
    val df = corpus.toDF("g", "id", "p")
    val out = Curation.groupSample(df, Seq("g"), col("id"), k = 5)
    assert(out.groupBy("g").count().as[(String, Long)].collect().toMap ==
      Map("g0" -> 5L, "g1" -> 5L, "g2" -> 5L, "g3" -> 5L))
    val tiny = Curation.groupSample(Seq(("g", 1L), ("g", 2L)).toDF("g", "id"),
      Seq("g"), col("id"), k = 10)
    assert(tiny.count() == 2)
  }

  test("deterministic across layouts and payload changes keep columns") {
    val a = Curation.groupSample(corpus.toDF("g", "id", "p").repartition(3),
      Seq("g"), col("id"), k = 7).select("g", "id").collect().toSet
    val b = Curation.groupSample(corpus.toDF("g", "id", "p").repartition(13),
      Seq("g"), col("id"), k = 7).select("g", "id").collect().toSet
    assert(a == b)
  }

  test("consistent under growth: a new id evicts at most one member") {
    val before = Curation.groupSample(corpus.toDF("g", "id", "p"),
      Seq("g"), col("id"), k = 6).select("g", "id")
      .as[(String, Long)].collect().toSet
    val grown = corpus :+ (("g0", 999L, "new"))
    val after = Curation.groupSample(grown.toDF("g", "id", "p"),
      Seq("g"), col("id"), k = 6).select("g", "id")
      .as[(String, Long)].collect().toSet
    assert((before -- after).size <= 1)
    assert((after -- before).size <= 1)
  }

  test("membership is the k smallest scrambled hashes (replayable defn)") {
    val ids = corpus.filter(_._1 == "g1").map(_._2)
    val hs = ids.map { i =>
      i -> spark.range(1)
        .select(graft.ops.Sketch.kmvHash(lit("gs:" + i.toString)))
        .head().getLong(0)
    }.sortBy { case (i, h) => (h, i) }.take(4).map(_._1).toSet
    val out = Curation.groupSample(corpus.toDF("g", "id", "p"),
      Seq("g"), col("id"), k = 4)
      .where(col("g") === "g1").select("id").as[Long].collect().toSet
    assert(out == hs)
  }

  test("null ids drop") {
    val df = Seq((Some(1L), "g"), (None, "g")).toDF("id", "g")
    assert(Curation.groupSample(df, Seq("g"), col("id"), k = 5).count() == 1)
  }
}
