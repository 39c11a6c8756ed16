package graft.tools

import java.nio.file.{Files, Paths}

/** Filtered Verify: dump only the SparkEntry queries whose name contains
  * one of the given substrings, plus the matching oracle_sql.json slice —
  * the fast inner loop for authoring a new query/oracle pair
  * (`scripts/check_oracle.py <sfDir> <outDir>` then compares just those).
  *
  * Usage: runMain graft.tools.QVerify <sfDir> <outDir> <substr> [substr…]
  */
object QVerify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QVerify <sfDir> <outDir> <substr>…")
    val sfDir = args(0); val outDir = args(1); val pats = args.drop(2).toSeq
    val spark = graft.run.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, 8, "graft-qverify")
    new java.io.File(outDir).mkdirs()
    val picked = graft.SparkEntry.queries.filter { case (n, _) =>
      pats.exists(n.contains)
    }
    picked.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[qverify] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter { case (k, _) => picked.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[qverify] dumped ${picked.size} quer(ies): " +
      picked.keys.toSeq.sorted.mkString(", "))
    spark.stop()
  }
}
