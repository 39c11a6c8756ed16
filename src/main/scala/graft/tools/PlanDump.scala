package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump the formatted physical plan of named driver queries at sf0.001 —
  * the PLANS.md audit feed. Usage: runMain graft.tools.PlanDump q76_... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.ansi.enabled", false)
      .appName("plandump").getOrCreate()
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
