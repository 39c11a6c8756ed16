package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.fixtures.InvoiceCorpus
import graft.ops.{ImageQuality, Multimodal}
import org.apache.spark.sql.functions._

/** P8 — image-quality metrics + quality-gated conditional enhancement
  * (image_enhancement.py:99-128, :291-358) on real decoded pixels. */
class ImageQualitySpec extends SparkSuite {
  import spark.implicits._

  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  private def gray(v: Int) = (v << 16) | (v << 8) | v

  test("metrics on a uniform image: zero contrast/sharpness/noise, exact brightness") {
    val img = ImageIO.read(new ByteArrayInputStream(png(64, 64)((_, _) => gray(200))))
    val m = ImageQuality.metricsOf(img)
    assert(m.contrast == 0.0 && m.sharpness == 0.0 && m.noise == 0.0)
    assert(m.brightness == 200.0)
    // all mass in one histogram bin: std = sqrt((255·(n/256)² + (n−n/256)²)/256)
    val n = 64.0 * 64; val hm = n / 256
    val expectedStd = math.sqrt((255 * hm * hm + (n - hm) * (n - hm)) / 256)
    assert(math.abs(m.histStd - expectedStd) < 1e-9)
    // score by the reference formula: 0 + 0 + (1−|200−128|/128)·20 + 15 + hist
    val expected = (1.0 - 72.0 / 128.0) * 20 + 15.0 + math.min(expectedStd / 50000, 1.0) * 10
    assert(math.abs(m.qualityScore - expected) < 1e-9)
  }

  test("gates follow the reference thresholds; a crisp checkerboard is conservative (>70)") {
    // uniform mid-gray: contrast 0 < 40, sharpness 0 < 800, noise 0 ≤ 8
    val flat = ImageQuality.enhanceOne("flat", png(64, 64)((_, _) => gray(128)))
    assert(flat.needs_contrast && flat.needs_sharpen && !flat.needs_denoise)
    assert(!flat.conservative)
    // full-contrast checkerboard: sharpness ~1020² (→30), contrast 127.5
    // (→25), brightness ~127.5 (→20) — lands above the 70 conservative bar
    val check = ImageQuality.enhanceOne("check",
      png(64, 64)((x, y) => if ((x + y) % 2 == 0) gray(0) else gray(255)))
    assert(check.quality_score > 70.0, check.quality_score)
    assert(check.conservative && !check.rolled_back)
    // conservative mode: output = input (no enhancement applied)
    val out = ImageIO.read(new ByteArrayInputStream(check.enhanced_png))
    assert(out.getRGB(3, 4) == ImageIO.read(
      new ByteArrayInputStream(png(64, 64)((x, y) => if ((x + y) % 2 == 0) gray(0) else gray(255))))
      .getRGB(3, 4))
  }

  test("contrast stretch maps the gray span to [0,255]") {
    val img = ImageIO.read(new ByteArrayInputStream(
      png(32, 32)((x, _) => if (x < 16) gray(100) else gray(150))))
    val m0 = ImageQuality.metricsOf(img)
    val stretched = ImageQuality.stretchContrast(img)
    val m1 = ImageQuality.metricsOf(stretched)
    assert(m1.contrast > m0.contrast * 3)
    assert((stretched.getRGB(0, 0) & 0xff) == 0 && (stretched.getRGB(31, 0) & 0xff) == 255)
  }

  test("rollback invariant: kept enhancements never lose more than 5 points") {
    val media = graft.fixtures.MediaFixtures.mediaTable(InvoiceCorpus.docs(spark, 25).toDF())
    val rows = ImageQuality.enhance(media).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.quality_score >= 0 && r.quality_score <= 100)
      if (!r.rolled_back && !r.conservative)
        assert(r.enhanced_score >= r.quality_score - 5.0,
          s"${r.media_ref}: ${r.quality_score} -> ${r.enhanced_score} kept without rollback")
      // every output is a decodable PNG of the original geometry
      val img = ImageIO.read(new ByteArrayInputStream(r.enhanced_png))
      assert(img != null && img.getWidth > 0)
    }
    // Column gate predicates agree with the typed row flags
    val df = rows.toSeq.toDF()
    ImageQuality.gateColumns.foreach { case (name, pred) =>
      assert(df.where(col(name) =!= pred).count() == 0, s"gate $name mismatch")
    }
  }

  test("q45 expected-rows fixture is current (driver oracle drift guard)") {
    val expected = spark.read.parquet("src/test/resources/expected/q45_image_quality.parquet")
    val actual = SparkEntry.queries("q45_image_quality")(spark, "/root/testdata/sf0.01")
    assert(actual.exceptAll(expected).count() == 0, "live rows missing from fixture")
    assert(expected.exceptAll(actual).count() == 0, "fixture rows missing from live output")
  }
}
