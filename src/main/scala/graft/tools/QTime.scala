package graft.tools
import org.apache.spark.sql.SparkSession

/** Per-query wall timing in one warm session — the PLANS.md / BASELINE.md
  * per-query evidence tool. SPARK_GRAFT_SF_DIR picks the scale (default
  * sf0.01); SPARK_GRAFT_EXTRA_CONF ("k=v;k=v") injects session conf, e.g.
  * to reproduce the Bench session's AQE coalescing choices. */
object QTime {
  def main(args: Array[String]): Unit = {
    var builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", false)
      .config("spark.driver.memory", "8g")
      .appName("qtime")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder = builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    def mixLoop(iters: Long): Long = {
      var h = 0x9E3779B97F4A7C15L; var i = 0L
      while (i < iters) { h = java.lang.Long.rotateLeft(h * 0x100000001B3L, 13) ^ i; i += 1 }
      h
    }
    for (name <- args) {
      if (name == "calib") {
        mixLoop(20000000L)
        val t0 = System.nanoTime
        if (mixLoop(400000000L) == 42L) println("")
        println(f"[qtime] calib ${(System.nanoTime - t0) / 1e9}%.2f s (0 rows)")
      } else {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime
      val n = fn(spark, sf).count()
      println(f"[qtime] $name ${(System.nanoTime - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
