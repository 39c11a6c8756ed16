package graft

import graft.graph.Propagate
import org.apache.spark.sql.functions._

class PropagateSpec extends SparkSuite {
  import spark.implicits._

  private def feats(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")
  private def edges(rows: (Long, Long)*) = rows.toDF("src", "dst")
  private def run(e: org.apache.spark.sql.DataFrame,
      f: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
    Propagate.neighborMean(e, f).as[(Long, Seq[Double])].collect().toMap

  test("mean of in-neighbor vectors, element-wise") {
    val f = feats((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f)), (3L, Seq(5f, 6f)))
    val out = run(edges((1L, 3L), (2L, 3L)), f)
    assert(out == Map(3L -> Seq(2.0, 3.0)))
  }

  test("direction matters; nodes without in-neighbors are absent") {
    val f = feats((1L, Seq(2f)), (2L, Seq(4f)))
    val out = run(edges((1L, 2L)), f)
    assert(out == Map(2L -> Seq(2.0)) && !out.contains(1L))
  }

  test("neighbors without features contribute nothing; all-missing => absent") {
    val f = feats((1L, Seq(6f)))
    val out = run(edges((1L, 9L), (7L, 9L), (7L, 8L)), f)
    // node 9: neighbor 1 has feats, 7 doesn't -> mean over {1} only;
    // node 8: only featureless 7 -> absent
    assert(out == Map(9L -> Seq(6.0)))
  }

  test("a cold-start node (no own feature) still receives a mean") {
    val f = feats((1L, Seq(1f, 1f)), (2L, Seq(3f, 3f)))
    val out = run(edges((1L, 99L), (2L, 99L)), f)
    assert(out == Map(99L -> Seq(2.0, 2.0)))
  }

  test("matches a naive driver mean on a pseudo-random graph + layouts") {
    val d = 5
    val f = (0L until 40L).map(i =>
      (i, (0 until d).map(j => ((i * 7 + j * 3) % 11).toFloat)))
    val e = (1 to 90).map(k => ((k * 13 % 40).toLong, (k * 29 % 40).toLong))
      .distinct.filter(p => p._1 != p._2)
    val naive = e.groupBy(_._2).map { case (dst, es) =>
      val vs = es.map(_._1).map(s => f(s.toInt)._2)
      (dst, (0 until d).map(j => vs.map(_(j).toDouble).sum / vs.size))
    }
    val out = run(edges(e: _*), feats(f: _*))
    def close(a: Map[Long, Seq[Double]], b: Map[Long, Seq[Double]]): Boolean =
      a.keySet == b.keySet && a.forall { case (k, v) =>
        v.zip(b(k)).forall { case (x, y) => math.abs(x - y) < 1e-9 } }
    assert(close(out, naive.toMap))
    assert(close(run(edges(e: _*).repartition(7), feats(f: _*)), naive.toMap))
  }

  test("double-typed features pass untruncated (multi-round stacking)") {
    // 0.1 is not float-representable: a silent float cast would shift it
    val f = Seq((1L, Seq(0.1, 0.3)), (2L, Seq(0.3, 0.1))).toDF("vec_id", "embedding")
    val out = Propagate.neighborMean(edges((1L, 9L), (2L, 9L)), f)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(9L) == Seq((0.1 + 0.3) / 2, (0.3 + 0.1) / 2))
    // and rounds stack: the double output feeds straight back in
    val out2 = Propagate.neighborMean(edges((9L, 10L)),
      out.toSeq.toDF("vec_id", "embedding")).as[(Long, Seq[Double])].collect().toMap
    assert(out2(10L) == out(9L))
  }

  test("vectors with null ELEMENTS are fenced (dropped, not a crash)") {
    val f = Seq((1L, Seq(Some(1f), None, Some(3f))), (2L, Seq(Some(4f), Some(6f), Some(8f))))
      .toDF("vec_id", "embedding")
    val out = run(edges((1L, 9L), (2L, 9L)), f)
    assert(out == Map(9L -> Seq(4.0, 6.0, 8.0))) // only the clean vector
  }

  test("dimension mismatch fails loudly") {
    val f = feats((1L, Seq(1f, 2f)), (2L, Seq(3f)))
    val e = intercept[Exception] {
      run(edges((1L, 9L), (2L, 9L)), f)
    }
    assert(e.getMessage != null)
  }
}
