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

  // ---- B-cubed ----

  test("bcubed: hand-computed 3-item example (exact truncating ppm)") {
    // pred {a,b},{c}; gold {a},{b,c}:
    // P(a)=1/2 P(b)=1/2 P(c)=1 -> mean 2/3; R(a)=1 R(b)=1/2 R(c)=1/2 -> 2/3
    val df = Seq((1, "p1", "g1"), (2, "p1", "g2"), (3, "p2", "g2"))
      .toDF("id", "pred", "gold")
    val r = one(ClusterEval.bcubed(df, "id", "pred", "gold"))
    assert(r.getAs[Long]("n_items") == 3)
    assert(r.getAs[Long]("bcubed_precision_ppm") == 666666L)
    assert(r.getAs[Long]("bcubed_recall_ppm") == 666666L)
    assert(r.getAs[Long]("bcubed_f1_ppm") == 666666L)
  }

  test("bcubed: identity = 10^6; singletons-vs-one-cluster shows the " +
    "P/R asymmetry pairwise counting hides") {
    val id = Seq((1, "x", "x"), (2, "x", "x"), (3, "y", "y"))
      .toDF("id", "pred", "gold")
    val ri = one(ClusterEval.bcubed(id, "id", "pred", "gold"))
    assert(ri.getAs[Long]("bcubed_precision_ppm") == 1000000L)
    assert(ri.getAs[Long]("bcubed_recall_ppm") == 1000000L)
    assert(ri.getAs[Long]("bcubed_f1_ppm") == 1000000L)
    // 4 singleton preds vs one gold cluster: P=1, R=1/4
    val sing = (1 to 4).map(i => (i, s"p$i", "g")).toDF("id", "pred", "gold")
    val rs = one(ClusterEval.bcubed(sing, "id", "pred", "gold"))
    assert(rs.getAs[Long]("bcubed_precision_ppm") == 1000000L)
    assert(rs.getAs[Long]("bcubed_recall_ppm") == 250000L)
    // F1 = 2*10^6*250000 / 1250000 = 400000
    assert(rs.getAs[Long]("bcubed_f1_ppm") == 400000L)
  }

  test("bcubed: a mega-cluster error is bounded per item (vs pairwise's " +
    "quadratic drowning), nulls drop, empty input -> null metrics") {
    // gold: 10 singletons; pred: one cluster of 10 -> per-item P = 1/10
    val mega = (1 to 10).map(i => (i, "p", s"g$i")).toDF("id", "pred", "gold")
    val rm = one(ClusterEval.bcubed(mega, "id", "pred", "gold"))
    assert(rm.getAs[Long]("bcubed_precision_ppm") == 100000L)
    assert(rm.getAs[Long]("bcubed_recall_ppm") == 1000000L)
    val withNulls = Seq((Some(1), Some("p"), Some("g")),
      (None, Some("p"), Some("g")), (Some(2), None, Some("g")))
      .toDF("id", "pred", "gold")
    assert(one(ClusterEval.bcubed(withNulls, "id", "pred", "gold"))
      .getAs[Long]("n_items") == 1)
    val empty = one(ClusterEval.bcubed(
      Seq.empty[(Int, String, String)].toDF("id", "pred", "gold"),
      "id", "pred", "gold"))
    assert(empty.getAs[Long]("n_items") == 0)
    assert(empty.isNullAt(empty.fieldIndex("bcubed_f1_ppm")))
  }
}
