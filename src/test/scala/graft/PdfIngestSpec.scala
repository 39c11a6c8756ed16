package graft

import java.io.ByteArrayInputStream
import java.nio.file.Files
import javax.imageio.ImageIO

import graft.ops.Multimodal
import graft.sources.PdfIngest

/** S2 — PDF → page-images ingest: fixture "PDF" payloads through the
  * binaryFile scan → render boundary → page-image table → multimodal
  * decode bridge. */
class PdfIngestSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_pdfs_")
    Files.write(d.resolve("facture_a.pdf"), "fake-pdf-payload-A".getBytes)
    Files.write(d.resolve("Facture_B.PDF"), "fake-pdf-payload-B-longer".getBytes)
    Files.writeString(d.resolve("notes.txt"), "not a pdf — glob must skip it")
    d
  }

  test("scan + render: one doc per PDF, reference page naming, dpi-scaled A4 geometry") {
    val pages = PdfIngest.pageImageTable(spark, dir.toString, dpi = 18).collect()
    val byDoc = pages.groupBy(_.doc_id)
    assert(byDoc.keySet == Set("facture_a", "Facture_B")) // .txt skipped, .PDF case-insensitive
    // page numbering is 1-based and contiguous; naming mirrors
    // pdf_to_images.py's page_%03d.png under <stem>_images/
    byDoc.values.foreach { ps =>
      assert(ps.map(_.page).sorted.toSeq == (1 to ps.length))
      ps.foreach(p => assert(p.media_ref == f"${p.doc_id}_images/page_${p.page}%03d.png"))
    }
    // fitz.Matrix(dpi/72): A4 612×792 pts at dpi 18 → 153×198
    assert(pages.forall(p => p.width == 153 && p.height == 198))
    // determinism: same payload → same pages
    val again = PdfIngest.pageImageTable(spark, dir.toString, dpi = 18).collect()
    assert(pages.map(p => (p.media_ref, p.png.toSeq)).sortBy(_._1).toSeq ==
      again.map(p => (p.media_ref, p.png.toSeq)).sortBy(_._1).toSeq)
  }

  test("rendered pages are REAL PNGs, decodable end-to-end through the multimodal path") {
    val pages = PdfIngest.pageImageTable(spark, dir.toString, dpi = 18)
    val one = pages.head()
    val img = ImageIO.read(new ByteArrayInputStream(one.png))
    assert(img.getWidth == 153 && img.getHeight == 198)
    val decoded = Multimodal.decodeAndFeaturize(PdfIngest.toMediaRows(pages)).collect()
    assert(decoded.nonEmpty)
    assert(decoded.forall(d => d.width == 153 && d.height == 198 && d.n_frames == 1))
    assert(decoded.forall(_.feature.length == 8))
  }

  test("page sink round-trips partitioned by doc_id") {
    val out = Files.createTempDirectory("graft_pages_").toString + "/pages"
    val pages = PdfIngest.pageImageTable(spark, dir.toString, dpi = 18)
    PdfIngest.writePages(pages, out)
    val back = spark.read.parquet(out)
    assert(back.count() == pages.count())
    assert(back.columns.toSet ==
      Set("doc_id", "page", "media_ref", "width", "height", "png"))
  }
}
