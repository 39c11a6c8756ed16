package graft

import graft.ops.Ids
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class IdsSpec extends SparkSuite {
  import spark.implicits._

  private def encDec(vs: Seq[Long]): Seq[(Long, String, Long)] =
    vs.toDF("v")
      .select(col("v"), Ids.encodeOrdered(col("v")).as("e"))
      .select(col("v"), col("e"), Ids.decodeOrdered(col("e")).as("d"))
      .as[(Long, String, Long)].collect().toSeq

  test("encodeOrdered: string order == numeric order, decode round-trips" +
      " (seeded Gen incl. extremes)") {
    val g = Gen.listOfN(400, Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(-1000L, 1000L),
      Gen.oneOf(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
        Long.MaxValue - 1, Long.MaxValue)))
    val vs = g.apply(Gen.Parameters.default, Seed(7L)).get.distinct
    val rows = encDec(vs)
    rows.foreach { case (v, _, d) => assert(d == v, s"round-trip broke at $v") }
    val byNum = rows.sortBy(_._1).map(_._2)
    val byStr = rows.map(_._2).sorted
    assert(byNum == byStr, "string order diverged from numeric order")
    assert(rows.map(_._2).distinct.size == rows.size, "encoding not injective")
  }
}
