package graft

import graft.fixtures.TextCorpus
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** At-scale benchmark for the corpus-curation ops (dedup family) with
  * planted ground truth: N docs with exact dups at idx%40==1 and near dups
  * at idx%40==2 (TextCorpus). Reports throughput and found-duplicate counts
  * so recall of the hash-based paths is visible, and runs at two
  * parallelism levels for a scaling line.
  *
  *   sbt "runMain graft.CurationBench 200000"
  */
object CurationBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val levels = Seq(
      sys.env.getOrElse("SPARK_GRAFT_BASE_CORES", "4").toInt,
      sys.env.getOrElse("SPARK_GRAFT_BASE_CORES", "4").toInt * 4)

    val rows = levels.map { cores =>
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-curation-$cores")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val docs = TextCorpus.docs(spark, n, partitions = cores * 2)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        docs.count() // materialize: dedup ops scan the corpus many times
        def time(f: => Long): (Double, Long) = {
          val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
        }
        val (tExact, exactGroups) = time(
          Dedup.exact(docs).where(col("n_dups") > 1).count())
        val (tMh, mhPairs) = time(
          Dedup.minhashNearDup(docs, k = 5, numHashes = 16, bands = 8,
            threshold = 0.5).count())
        val (tSh, shPairs) = time(
          Dedup.simhashNearDup(docs, maxHamming = 3).count())
        val expectedExact = n / 40 + (if (n % 40 >= 2) 1 else 0) // idx%40==1 sites
        println(f"""{"level":"local[$cores]","docs":$n,""" +
          f""""exact_sec":$tExact%.2f,"exact_dup_groups":$exactGroups,"expected_exact":$expectedExact,""" +
          f""""minhash_sec":$tMh%.2f,"minhash_pairs":$mhPairs,""" +
          f""""simhash_sec":$tSh%.2f,"simhash_pairs":$shPairs,""" +
          f""""exact_docs_per_sec":${n / tExact}%.0f,"minhash_docs_per_sec":${n / tMh}%.0f}""")
        (cores, tExact, tMh, tSh)
      } finally spark.stop()
    }
    val (c1, e1, m1, s1) = rows.head
    val (c2, e2, m2, s2) = rows.last
    val f = c2.toDouble / c1
    println(f"""{"scaling":"local[$c1]->local[$c2]","exact_eff":${e1 / e2 / f}%.3f,""" +
      f""""minhash_eff":${m1 / m2 / f}%.3f,"simhash_eff":${s1 / s2 / f}%.3f}""")
  }
}
