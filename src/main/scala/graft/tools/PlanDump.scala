package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump the formatted physical plan of named driver queries at sf0.001 —
  * the PLANS.md audit feed. Usage: runMain graft.tools.PlanDump q76_...
  * SPARK_GRAFT_EXTRA_CONF ("k=v;k=v") injects session conf — e.g.
  * spark.graft.materialize=none to expose the full per-round lineage of
  * iterative operators, or the local-path gates set to 0 to show the
  * beyond-gate distributed shape (the plans/r06 round-shape sections). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    var builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.ansi.enabled", false)
      .appName("plandump")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder = builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (sys.env.contains("SPARK_GRAFT_SF_DIR")) sys.env("SPARK_GRAFT_SF_DIR")
             else "/root/testdata/sf0.001"
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, sf)
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
