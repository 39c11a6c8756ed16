package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extra measurement harness for the r6 optimization round (guide §1.4):
  * isolates sub-steps of the heavy declared queries with the noop sink so
  * the computation is timed, not the sink, and labels every job. NOT part
  * of the driver contract — graft.Bench is the frozen harness; numbers
  * from here are cited in OPTIMIZATION_r06.md only.
  *
  * Usage: runMain graft.BenchExtra <step> [step ...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32). */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(df: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[benchextra] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
      spark.catalog.clearCache(); System.gc()
    }
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    def coDirected = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .where(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    def coHalf = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .where(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()

    args.foreach {
      case "co_edges_directed" => t("co_edges_directed")(coDirected)
      case "co_edges_half" => t("co_edges_half")(coHalf)
      case "kcore_full" => t("kcore_full")(graft.graph.KCore.coreness(coHalf))
      case "kcore_ce4" =>
        t("kcore_ce4")(graft.graph.KCore.coreness(coHalf, checkEvery = 4))
      case "pagerank_full" =>
        t("pagerank_full")(graft.graph.PageRank.run(coDirected, iters = 5))
      case "triangles_full" => t("triangles_full")(graft.graph.Triangles.perNode(coHalf))
      case other => System.err.println(s"[benchextra] unknown step: $other")
    }
    spark.stop()
  }
}
