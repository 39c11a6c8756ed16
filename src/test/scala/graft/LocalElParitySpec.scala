package graft

import graft.fixtures.InvoiceCorpus
import graft.link.EntityLinker
import graft.run.FastExtract

/** Hybrid entity linking: the driver-local LSH→verify chain must produce
  * the EXACT edge set of the distributed one (same band hashes via
  * XxHash64Function, same levenshtein, same bucket caps, same ICE veto). */
class LocalElParitySpec extends SparkSuite {
  import spark.implicits._

  private def edges(vm: org.apache.spark.sql.DataFrame, useIce: Boolean,
      threshold: Long): Set[(String, String)] =
    EntityLinker.candidateEdgesFromEntities(EntityLinker.entities(vm),
        useIce = useIce, smallThreshold = threshold)
      .as[(String, String)].collect().toSet

  test("local path == distributed path on the noisy fixture corpus (both ICE modes)") {
    val vm = FastExtract.vendorMentions(InvoiceCorpus.docs(spark, 250)).toDF().cache()
    try {
      for (useIce <- Seq(true, false)) {
        val local = edges(vm, useIce, threshold = Long.MaxValue)
        val dist = edges(vm, useIce, threshold = 0L) // force distributed
        assert(local.nonEmpty)
        assert(local == dist,
          s"useIce=$useIce localOnly=${local -- dist} distOnly=${dist -- local}")
      }
    } finally vm.unpersist()
  }

  test("local path == distributed path under heavy noise and a tight bucket cap") {
    val vm = FastExtract.vendorMentions(InvoiceCorpus.docs(spark, 150, 7L, 0.9)).toDF().cache()
    try {
      val ents = EntityLinker.entities(vm)
      val local = EntityLinker.candidateEdgesFromEntities(ents,
          maxBucket = 3, smallThreshold = Long.MaxValue)
        .as[(String, String)].collect().toSet
      val dist = EntityLinker.candidateEdgesFromEntities(ents,
          maxBucket = 3, smallThreshold = 0L)
        .as[(String, String)].collect().toSet
      assert(local == dist, s"localOnly=${local -- dist} distOnly=${dist -- local}")
    } finally vm.unpersist()
  }

  test("bucket-cap drops are WARNED in-operator on both paths, silent when uncapped") {
    val vm = FastExtract.vendorMentions(InvoiceCorpus.docs(spark, 150, 7L, 0.9)).toDF().cache()
    try {
      val ents = EntityLinker.entities(vm)
      for (threshold <- Seq(Long.MaxValue, 0L)) { // local, then distributed
        val (_, warned) = Audit.capturing {
          EntityLinker.candidateEdgesFromEntities(ents, maxBucket = 3,
            smallThreshold = threshold).count()
        }
        assert(warned.exists(_.contains("over-cap LSH buckets")),
          s"threshold=$threshold expected a cap warning, got $warned")
        val (_, silent) = Audit.capturing {
          EntityLinker.candidateEdgesFromEntities(ents, maxBucket = 100000,
            smallThreshold = threshold).count()
        }
        assert(silent.isEmpty, s"threshold=$threshold unexpected warnings: $silent")
      }
    } finally vm.unpersist()
  }
}
