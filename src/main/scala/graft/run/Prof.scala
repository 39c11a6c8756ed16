package graft.run

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Dev profiling scratch. */
object Prof {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, 8)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs.cache().count()

    val k = 5; val numHashes = 16; val bands = 8; val rows = 2
    val withSig = docs.select(col("doc_id").as("id"), col("text"),
      Dedup.minhashSignature(col("text"), k, numHashes).as("sig"))
    time("signatures")(withSig.write.mode("overwrite").parquet("/tmp/prof_sig"))
    val sig2 = spark.read.parquet("/tmp/prof_sig")
    val banded = sig2.select(col("id"), col("text"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows))): _*)).as(Seq("band", "bh")))
    time("banding")(banded.count())
    val sizes = banded.groupBy("band", "bh").count()
    val kept = banded.join(sizes.where(col("count") <= 2000), Seq("band", "bh"))
    val cand = kept.select(col("band"), col("bh"), col("id").as("id_a"), col("text").as("t_a"))
      .join(kept.select(col("band"), col("bh"), col("id").as("id_b"), col("text").as("t_b")),
        Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "t_a", "t_b").distinct()
    println("[prof] candidates = " + time("cand")(cand.count()))
    val ja = {
      val a = Dedup.wordShingles(col("t_a"), k)
      val b = Dedup.wordShingles(col("t_b"), k)
      round(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"), 4)
    }
    time("verify")(cand.withColumn("jaccard", ja).where(col("jaccard") >= 0.2).count())
    time("full op")(Dedup.minhashNearDup(docs, 5, 16, 8, 0.2).count())
    spark.stop()
  }
}
