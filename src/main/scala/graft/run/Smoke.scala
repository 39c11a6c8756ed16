package graft.run

import graft.fixtures.InvoiceCorpus
import graft.metrics.Evaluation

/** Dev smoke runner: corpus → pipeline → P/R vs expected triples. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100L
    val spark = Sessions.local(8)
    import spark.implicits._
    val docs = InvoiceCorpus.docs(spark, n).toDF()
    val predicted = Pipeline.run(docs)
    val expected = InvoiceCorpus.expectedTriples(spark, n).toDF()
    val pr = Evaluation.triplePR(predicted, expected)
    println(s"[smoke] n=$n $pr")
    if (pr.f1 < 0.999) {
      println("[smoke] per-predicate diagnostic:")
      Evaluation.perPredicatePR(predicted, expected).orderBy("pred").show(50, false)
      println("[smoke] sample mismatches (expected \\ predicted):")
      expected.except(predicted.select("subj", "pred", "obj")).show(20, false)
      println("[smoke] sample mismatches (predicted \\ expected):")
      predicted.select("subj", "pred", "obj").except(expected).show(20, false)
    }
    spark.stop()
  }
}
