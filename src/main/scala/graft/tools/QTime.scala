package graft.tools
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", false)
      .config("spark.driver.memory", "8g")
      .appName("qtime").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime
      val n = fn(spark, sf).count()
      println(f"[qtime] $name ${(System.nanoTime - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
