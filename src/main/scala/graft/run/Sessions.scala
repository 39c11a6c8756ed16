package graft.run

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration. */
object Sessions {
  def local(cores: Int, shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // null-on-error cast/extract semantics: the tagger probes free text
      // the way the reference does (try/except → skip), not fail-fast
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // coalesce small post-shuffle stages by SIZE, not parallelism: the
      // entity-scale stage chain (groupBy/join/CC over ~10^2-10^6 rows)
      // otherwise keeps shuffle.partitions-wide stages whose per-task
      // cross-process scheduling latency GROWS with executor count —
      // measured as the pipeline's main scaling-efficiency loss. Big
      // shuffles still get wide plans (size-based targets).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      // catalog tables (bucketed sinks) land in a temp warehouse, not ./
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
