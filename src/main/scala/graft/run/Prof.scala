package graft.run

import graft.fixtures.InvoiceCorpus
import graft.link.EntityLinker
import graft.canon.ConnectedComponents
import org.apache.spark.sql.functions._

/** Dev profiling scratch: pipeline phase breakdown. */
object Prof {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = Sessions.local(cores, cores)
    import spark.implicits._
    val docs = InvoiceCorpus.docs(spark, n).toDF()
    val ds = docs.selectExpr("doc_id", "page_w", "page_h", "spans").as[graft.model.OcrDoc]

    (1 to 2).foreach { iter =>
      println(s"[prof] --- iteration $iter (cores=$cores, docs=$n) ---")
      val raw = FastExtract.triples(ds).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("raw extract+persist")(raw.count())
      val vm = FastExtract.vendorMentions(ds).toDF().persist()
      time("vendor mentions+persist")(vm.count())
      val edges = time("EL edges (build plan)")(
        EntityLinker.candidateEdges(vm, 8, 0.6, 0.85, true))
      val edgesN = time("EL edges (count)")(edges.count())
      println(s"[prof] edges = $edgesN")
      val comps = time("CC")(ConnectedComponents.run(edges))
      time("CC materialize")(comps.count())
      val counts = vm.groupBy("entity_key").agg(count(lit(1)).as("n"))
        .select(col("entity_key").as("id"), col("n"))
      val canonMap = ConnectedComponents.canonicalMap(comps, counts)
      time("canonMap")(canonMap.count())
      val g = Pipeline.canonicalize(raw, canonMap).select("subj", "pred", "obj").distinct()
      time("canonicalize+distinct")(g.count())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
