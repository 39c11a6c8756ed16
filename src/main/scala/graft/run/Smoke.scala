package graft.run

import graft.fixtures.InvoiceCorpus
import graft.metrics.Evaluation

/** Dev smoke runner: corpus → pipeline → P/R vs expected triples, plus
  * Extract↔FastExtract parity and throughput. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100L
    val spark = Sessions.local(8)
    import spark.implicits._
    val docs = InvoiceCorpus.docs(spark, n).toDF().cache()
    docs.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[smoke] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // parity: declarative vs typed extraction must emit identical triple sets
    val slow = Extract.triples(docs).select("subj", "pred", "obj")
    val fastDs = FastExtract.triples(
      docs.selectExpr("doc_id", "page_w", "page_h", "spans").as[graft.model.OcrDoc]).toDF()
    time("extract (Column HOFs)")(slow.count())
    time("extract (typed fast)")(fastDs.count())
    val onlySlow = slow.exceptAll(fastDs).count()
    val onlyFast = fastDs.exceptAll(slow).count()
    println(s"[smoke] parity: onlySlow=$onlySlow onlyFast=$onlyFast " +
      (if (onlySlow == 0 && onlyFast == 0) "IDENTICAL" else "MISMATCH"))
    if (onlySlow + onlyFast > 0) {
      slow.exceptAll(fastDs).show(10, false)
      fastDs.exceptAll(slow).show(10, false)
    }

    val predicted = time("pipeline (fast)")(Pipeline.run(docs))
    val expected = InvoiceCorpus.expectedTriples(spark, n).toDF()
    val pr = Evaluation.triplePR(predicted, expected)
    println(s"[smoke] n=$n $pr")
    if (pr.f1 < 0.999) {
      Evaluation.perPredicatePR(predicted, expected).orderBy("pred").show(50, false)
      expected.except(predicted.select("subj", "pred", "obj")).show(20, false)
      predicted.select("subj", "pred", "obj").except(expected).show(20, false)
    }
    spark.stop()
  }
}
