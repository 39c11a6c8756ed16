package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

class MutualAlignSpec extends SparkSuite {
  import spark.implicits._

  private def align(a: Seq[(Long, Seq[Float])], b: Seq[(Long, Seq[Float])]) =
    Similarity.mutualTopMatch(
        a.toDF("vec_id", "embedding"), b.toDF("vec_id", "embedding"))
      .as[(Long, Long, Double)].collect().toSet

  test("orthogonal bases align one-to-one") {
    val a = Seq(0L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val b = Seq(1L -> Seq(1f, 0.1f), 3L -> Seq(0.1f, 1f))
    val out = align(a, b)
    assert(out.map(p => (p._1, p._2)) == Set((0L, 1L), (2L, 3L)))
    assert(out.forall(_._3 > 0.99))
  }

  test("mutuality filters one-directional matches") {
    // both a-vectors point at b1; only the closer one is mutual
    val a = Seq(0L -> Seq(1f, 0f), 2L -> Seq(0.9f, 0.1f))
    val b = Seq(1L -> Seq(1f, 0f))
    val out = align(a, b)
    assert(out.map(p => (p._1, p._2)) == Set((0L, 1L)))
  }

  test("engine output == the committed independent double-loop fixture") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val engine = Similarity.mutualTopMatch(
        emb.where(col("vec_id") % 2 === 0), emb.where(col("vec_id") % 2 === 1))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val fixture = spark.read.parquet(
        "src/test/resources/expected/q153_expected_mutual.parquet")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(engine.nonEmpty && engine.toSeq == fixture.toSeq)
  }
}
