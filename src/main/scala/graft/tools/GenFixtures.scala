package graft.tools

import graft.fixtures.InvoiceCorpus
import org.apache.spark.sql.functions._

/** Regenerates the committed expected-rows fixtures under
  * `src/test/resources/expected/` — the provenance record for every
  * fixture-parquet oracle in SparkEntry.oracleSql:
  *
  *  - q33_expected_sameas: the GENERATOR-side ground truth
  *    (InvoiceCorpus.expectedTriples — independent of the extractor/linker
  *    under test; PipelineSpec separately gates extractor-vs-generator
  *    f1 == 1.0 on this corpus).
  *  - q34_media_decode: output of the deterministic decode stub (a pure
  *    function of media_ref; the codecs are stubbed by design). Pins the
  *    media-table plumbing against drift; MultimodalSpec re-checks live
  *    output == fixture.
  *
  * Run: sbt "runMain graft.tools.GenFixtures"
  */
object GenFixtures {
  def main(args: Array[String]): Unit = {
    val spark = graft.run.Sessions.local(4, 8, "gen-fixtures")
    val out = "src/test/resources/expected"

    InvoiceCorpus.expectedTriples(spark, 200).toDF()
      .where(col("pred") === "sameAs")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q33_sameas_dir")

    graft.ops.Multimodal.decodeAndFeaturize(
        graft.ops.Multimodal.mediaTable(InvoiceCorpus.docs(spark, 200).toDF())).toDF()
      .select("media_ref", "kind", "width", "height", "n_frames")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/q34_media_dir")

    // flatten the single part files to stable names
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    Seq("q33_sameas" -> "q33_expected_sameas.parquet",
        "q34_media" -> "q34_media_decode.parquet").foreach { case (dir, name) =>
      val d = Paths.get(s"$out/${dir}_dir")
      val part = scala.util.Using.resource(Files.list(d))(
        _.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get)
      Files.copy(part, Paths.get(s"$out/$name"), StandardCopyOption.REPLACE_EXISTING)
      // clean the temp dir
      scala.util.Using.resource(Files.walk(d))(
        _.sorted(java.util.Comparator.reverseOrder()).iterator().asScala.foreach(Files.delete))
    }
    println(s"[gen-fixtures] wrote $out/q33_expected_sameas.parquet and $out/q34_media_decode.parquet")
    spark.stop()
  }
}
