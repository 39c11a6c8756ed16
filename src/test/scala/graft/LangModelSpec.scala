package graft

import graft.ops.LangModel

class LangModelSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed add-one bigram probabilities on a 2-doc corpus") {
    // corpus: "a b a b" + "a b"  => bigrams: (a b)x3? no:
    // doc1: "a b a b" -> (a b), (b a), (a b); doc2: "a b" -> (a b)
    // c(a b)=3, c(b a)=1; ctx c(a .)=3, c(b .)=1... wait ctx counts are
    // bigram-first-token occurrences: a appears as w1 3 times, b once.
    // V = |{a, b}| = 2
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("id", "text")
    val pAB = math.log((3.0 + 1) / (3 + 2))   // c(a b)+1 / c(a .)+V
    val pBA = math.log((1.0 + 1) / (1 + 2))
    // mirror the engine's quantization exactly: HALF_UP both rounds
    def q(x: Double) =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
    def avg(ls: Seq[Double]) =
      BigDecimal(ls.map(q).sum / 1e6 / ls.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = LangModel.bigramScore(docs, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L)._1 == 3)
    assert(byId(1L)._2 == avg(Seq(pAB, pBA, pAB)))
    assert(byId(2L)._1 == 1)
    assert(byId(2L)._2 == avg(Seq(pAB)))
  }

  test("repetitive text scores higher than novel text") {
    val docs = ((1 to 20).map(i => (i.toLong, "the same boring line again")) :+
      (99L, "zq xv wk jj qqq")).toDF("id", "text")
    val out = LangModel.bigramScore(docs, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1L) > out(99L))
  }

  test("short docs (<2 tokens) and null ids/texts emit nothing") {
    val docs = Seq((Some(1L), Some("only")), (Some(2L), Some("  ")),
      (Some(3L), None), (None, Some("a b")), (Some(4L), Some("a b")))
      .toDF("id", "text")
    val out = LangModel.bigramScore(docs, "id", "text")
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSet == Set(4L))
  }

  test("case and edge whitespace normalize; layout invariant") {
    val a = LangModel.bigramScore(Seq((1L, "  A b  ")).toDF("id", "text"),
      "id", "text").as[(Long, Long, Double)].collect().head
    val b = LangModel.bigramScore(Seq((1L, "a b")).toDF("id", "text"),
      "id", "text").as[(Long, Long, Double)].collect().head
    assert(a == b)
    val big = (1 to 300)
      .map(i => (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}"))
      .toDF("id", "text")
    val x = LangModel.bigramScore(big.repartition(3), "id", "text")
      .collect().toSet
    val y = LangModel.bigramScore(big.repartition(19), "id", "text")
      .collect().toSet
    assert(x == y)
  }
}
