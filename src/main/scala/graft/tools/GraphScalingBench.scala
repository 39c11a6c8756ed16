package graft.tools

import graft.graph.{Distances, KCore, PageRank}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-efficiency evidence for the ROUND-LOOP graph family (PageRank /
  * k-core / BFS) — the claim the per-query bench cannot test: "per-round
  * stage latency amortizes with graph size" (BASELINE.md, q56/q68/q63 plan
  * notes). Same protocol as ScalingBench (threads mode, N vs 4N cores,
  * adjacent substrate calibration, per-iteration steal-tick labels,
  * min-of-k), run over a deterministic Zipf-skewed synthetic graph — a
  * pure function of (nNodes, degree, seed), identical at every level, with
  * the hub skew real KGs have (dst ∝ 1/rank: node 1 is a mega-hub).
  *
  * Usage: SPARK_GRAFT_BASE_CORES=4 SPARK_GRAFT_SCALE_ITERS=2 \
  *   sbt "runMain graft.tools.GraphScalingBench 2000000 4"
  */
object GraphScalingBench {

  def main(args: Array[String]): Unit = {
    val nNodes = if (args.length > 0) args(0).toLong else 2000000L
    val degree = if (args.length > 1) args(1).toInt else 4
    val baseCores = sys.env.getOrElse("SPARK_GRAFT_BASE_CORES", "4").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_SCALE_ITERS", "2").toInt
    val levels = Seq(baseCores, baseCores * 4)

    def mixLoop(n: Long): Long = {
      var h = 0x9E3779B97F4A7C15L; var i = 0L
      while (i < n) { h = java.lang.Long.rotateLeft(h * 0x100000001B3L, 13) ^ i; i += 1 }
      h
    }
    mixLoop(20000000L)
    def calibSec(threads: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (1 to threads).map(_ => new Thread(() => {
        if (mixLoop(200000000L) == 42L) println("")
      }))
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    def stealTicks(): Long =
      scala.util.Using.resource(scala.io.Source.fromFile("/proc/stat")) { src =>
        val f = src.getLines().next().trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      }

    val results = levels.map { cores =>
      val spark = SparkSession.builder()
        .appName(s"graft-graph-scaling-$cores")
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        // deterministic Zipf-skewed digraph: node i sends `degree` edges,
        // the k-th to n/(1 + (xxhash64(i,k) mod n)) — in-degree ∝ 1/id, a
        // mega-hub at 1, the skew shape real entity graphs have
        val edges = spark.range(nNodes)
          .select(col("id").as("src"), explode(sequence(lit(1), lit(degree))).as("k"))
          .select(col("src"),
            (lit(nNodes) / (pmod(xxhash64(col("src"), col("k")), lit(nNodes)) + lit(1L)))
              .cast("long").as("dst"))
          .where(col("src") =!= col("dst"))
        val lm = spark.range(2).select(col("id"))

        def time(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        // warmup at 1/20 scale: JIT + codegen for all three loop bodies
        val warmN = math.max(nNodes / 20, 10000L)
        val warmE = edges.where(col("src") < warmN)
        PageRank.run(warmE, iters = 2).count()
        KCore.coreness(warmE, maxIters = 3).count()
        Distances.fromLandmarks(warmE, lm, maxDepth = 3).count()
        spark.sharedState.cacheManager.clearCache()
        System.gc()

        val meas = (1 to iters).map { it =>
          val c = calibSec(cores)
          val s0 = stealTicks()
          val tpr = time(PageRank.run(edges, iters = 5).count())
          val s1 = stealTicks()
          val tkc = time(KCore.coreness(edges, maxIters = 20).count())
          val s2 = stealTicks()
          val tbfs = time(Distances.fromLandmarks(edges, lm, maxDepth = 10).count())
          val s3 = stealTicks()
          spark.sharedState.cacheManager.clearCache()
          System.gc()
          System.err.println(f"[graph-scaling] cores=$cores iter $it " +
            f"pagerank=$tpr%.2f (steal ${s1 - s0}) kcore=$tkc%.2f (steal ${s2 - s1}) " +
            f"bfs=$tbfs%.2f (steal ${s3 - s2}) calib=$c%.2f s")
          (tpr, tkc, tbfs, c)
        }
        val best = (meas.map(_._1).min, meas.map(_._2).min, meas.map(_._3).min,
          meas.map(_._4).min)
        println(f"""{"phase":"level","cores":$cores,"pagerank_sec":${best._1}%.3f,""" +
          f""""kcore_sec":${best._2}%.3f,"bfs_sec":${best._3}%.3f,"calib_sec":${best._4}%.3f}""")
        best
      } finally spark.stop()
    }
    val (a, b) = (results.head, results.last)
    def eff(tN: Double, t4N: Double): Double = tN / t4N / 4.0
    println(f"""{"metric":"graph_scaling_eff","nodes":$nNodes,"degree":$degree,""" +
      f""""levels":[${levels.head},${levels.last}],""" +
      f""""pagerank_eff":${eff(a._1, b._1)}%.3f,"kcore_eff":${eff(a._2, b._2)}%.3f,""" +
      f""""bfs_eff":${eff(a._3, b._3)}%.3f,""" +
      f""""calib_ratio":${b._4 / a._4}%.3f}""")
  }
}
