package graft

import graft.metrics.ClusterEval

class ClusterEvalSpec extends SparkSuite {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect()
    assert(r.length == 1)
    r.head
  }

  test("hand-computed pairwise P/R/F1 on a 6-item example") {
    // pred: {1,2,3} {4,5} {6}; gold: {1,2} {3,4,5} {6}
    // pred pairs: 3+1 = 4; gold pairs: 1+3 = 4
    // agreeing pairs: (1,2) from cell(p1,g1)=2 -> 1; (4,5) cell(p2,g2)=2 -> 1
    val df = Seq((1, "p1", "g1"), (2, "p1", "g1"), (3, "p1", "g2"),
      (4, "p2", "g2"), (5, "p2", "g2"), (6, "p3", "g3"))
      .toDF("id", "pred", "gold")
    val r = one(ClusterEval.pairwisePR(df, "id", "pred", "gold"))
    assert(r.getAs[Long]("n_items") == 6)
    assert(r.getAs[Long]("pred_pairs") == 4)
    assert(r.getAs[Long]("gold_pairs") == 4)
    assert(r.getAs[Long]("agree_pairs") == 2)
    assert(r.getAs[Double]("pair_precision") == 0.5)
    assert(r.getAs[Double]("pair_recall") == 0.5)
    assert(r.getAs[Double]("pair_f1") == 0.5)
  }

  test("identical partitions: P = R = F1 = ARI = 1") {
    val df = (1 to 40).map(i => (i, s"c${i % 5}", s"k${i % 5}"))
      .toDF("id", "pred", "gold")
    val r = one(ClusterEval.pairwisePR(df, "id", "pred", "gold"))
    assert(r.getAs[Double]("pair_precision") == 1.0)
    assert(r.getAs[Double]("pair_recall") == 1.0)
    assert(r.getAs[Double]("ari") == 1.0)
  }

  test("counting form equals the definitional pair enumeration") {
    val items = (1 to 120).map { i =>
      (i, s"p${i * 48271 % 7}", s"g${i * 69621 % 5}")
    }
    val r = one(ClusterEval.pairwisePR(items.toDF("id", "pred", "gold")
      .repartition(9), "id", "pred", "gold"))
    // naive driver enumeration
    val pairs = for {
      a <- items; b <- items if a._1 < b._1
    } yield (a._2 == b._2, a._3 == b._3)
    val predP = pairs.count(_._1).toLong
    val goldP = pairs.count(_._2).toLong
    val agree = pairs.count(p => p._1 && p._2).toLong
    assert(r.getAs[Long]("pred_pairs") == predP)
    assert(r.getAs[Long]("gold_pairs") == goldP)
    assert(r.getAs[Long]("agree_pairs") == agree)
    val n = items.size.toLong
    val total = n * (n - 1) / 2.0
    val expected = predP.toDouble * goldP / total
    val ari = (agree - expected) / ((predP + goldP) / 2.0 - expected)
    assert(math.abs(r.getAs[Double]("ari") - ari) < 1e-6)
  }

  test("degenerate edges: all-singleton pred gives null precision") {
    val df = (1 to 5).map(i => (i, s"p$i", "g1")).toDF("id", "pred", "gold")
    val r = one(ClusterEval.pairwisePR(df, "id", "pred", "gold"))
    assert(r.getAs[Long]("pred_pairs") == 0)
    assert(r.isNullAt(r.fieldIndex("pair_precision")))
    assert(r.isNullAt(r.fieldIndex("pair_f1")))
    // both all-singletons: ARI denominator 0 -> null, not 1.0
    val df2 = (1 to 5).map(i => (i, s"p$i", s"g$i")).toDF("id", "pred", "gold")
    val r2 = one(ClusterEval.pairwisePR(df2, "id", "pred", "gold"))
    assert(r2.isNullAt(r2.fieldIndex("ari")))
  }

  test("null id/pred/gold rows drop") {
    val df = Seq((Some(1), Some("p"), Some("g")), (Some(2), Some("p"), Some("g")),
      (None, Some("p"), Some("g")), (Some(3), None, Some("g")),
      (Some(4), Some("p"), None)).toDF("id", "pred", "gold")
    val r = one(ClusterEval.pairwisePR(df, "id", "pred", "gold"))
    assert(r.getAs[Long]("n_items") == 2)
    assert(r.getAs[Long]("agree_pairs") == 1)
  }
}
