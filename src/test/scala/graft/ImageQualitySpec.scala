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

  test("PIL contrast: mean-gray extrapolating blend, hand-computed pixels") {
    // Pillow L of a pure gray is the gray value (19595+38470+7471 = 65536);
    // half 100 / half 200 → mean L = 150 → degenerate level int(150.5)=150.
    // factor 1.08 extrapolation: 150 + 1.08·(100−150) = 96.0 → 96;
    // 150 + 1.08·(200−150) = 204.0 → 204 (Blend.c truncating cast)
    val img = ImageIO.read(new ByteArrayInputStream(
      png(32, 32)((x, _) => if (x < 16) gray(100) else gray(200))))
    val out = ImageQuality.pilContrast(img, 1.08)
    assert((out.getRGB(0, 0) & 0xff) == 96 && (out.getRGB(31, 0) & 0xff) == 204)
    // uniform image: degenerate == image → contrast enhance is a no-op
    val flat = ImageIO.read(new ByteArrayInputStream(png(8, 8)((_, _) => gray(77))))
    assert(ImageQuality.pilContrast(flat, 1.15).getRGB(3, 3) == flat.getRGB(3, 3))
    // adaptive factor table: below 20 the pull is 1.15 (150+1.15·50 = 207.5 → 207)
    val strong = ImageQuality.adaptiveContrast(img, contrastLevel = 10.0)
    assert((strong.getRGB(31, 0) & 0xff) == 207)
  }

  test("bilateral(5,30,30): uniform fixed point; hand-computed impulse center; circular window") {
    // uniform image is a fixed point (weighted mean of equal values)
    val flat = ImageIO.read(new ByteArrayInputStream(png(16, 16)((_, _) => gray(100))))
    assert(ImageQuality.bilateral5(flat).getRGB(7, 7) == flat.getRGB(7, 7))
    // single impulse at (8,8): center output from the exact 13-tap formula
    val imp = ImageIO.read(new ByteArrayInputStream(
      png(17, 17)((x, y) => if (x == 8 && y == 8) gray(130) else gray(100))))
    val out = ImageQuality.bilateral5(imp)
    val cw = (d: Int) => math.exp(-d.toDouble * d / (2 * 30.0 * 30.0))
    val sw = (d2: Int) => math.exp(-d2.toDouble / (2 * 30.0 * 30.0))
    // neighbors: 4 at d²=1, 4 at d²=2, 4 at d²=4 (corners d²=8 and d²=5 are
    // OUTSIDE the circular radius-2 window); all differ by |Δ|=3·30=90
    val nw = (4 * sw(1) + 4 * sw(2) + 4 * sw(4)) * cw(90)
    val expectedCenter = math.rint((130.0 * 1.0 + 100.0 * nw) / (1.0 + nw)).toInt
    assert((out.getRGB(8, 8) & 0xff) == expectedCenter, (out.getRGB(8, 8) & 0xff))
    // circular-window proof: a pixel at offset (2,1) from the impulse
    // (√5 > 2) does not see it — stays exactly 100
    assert((out.getRGB(10, 9) & 0xff) == 100)
  }

  test("REFLECT_101 borders survive 1-2 px images (cv2 re-reflects; no negative index)") {
    // a 2-px-wide image puts radius-2 taps two reflections out: one-shot
    // reflection computed rx(3) = -1 and crashed — cv2's borderInterpolate
    // loops, and a 1-px dimension maps every index to 0
    for ((w, h) <- Seq((2, 9), (9, 2), (1, 5), (5, 1), (1, 1), (2, 2))) {
      val img = ImageIO.read(new ByteArrayInputStream(
        png(w, h)((x, y) => gray(60 + 20 * ((x + y) % 3)))))
      ImageQuality.bilateral5(img)     // must not throw
      ImageQuality.gentleSharpening(img)
      ImageQuality.metricsOf(img)
      // uniform fixed points still hold at tiny sizes
      val flat = ImageIO.read(new ByteArrayInputStream(png(w, h)((_, _) => gray(100))))
      assert(ImageQuality.bilateral5(flat).getRGB(0, 0) == flat.getRGB(0, 0))
      assert(ImageQuality.gentleSharpening(flat).getRGB(0, 0) == flat.getRGB(0, 0))
    }
  }

  test("gentle sharpening: unit-sum kernel fixes uniforms; hand-computed edge pixel") {
    val flat = ImageIO.read(new ByteArrayInputStream(png(16, 16)((_, _) => gray(90))))
    assert(ImageQuality.gentleSharpening(flat).getRGB(5, 5) == flat.getRGB(5, 5))
    // vertical step 100|200: at the last 100-column (x=7), filter2D sees
    // three 200s in its right column: 1.8·100 − 0.1·(5·100 + 3·200) =
    // 180 − 110 = 70; blend 0.7·100 + 0.3·70 = 91
    val step = ImageIO.read(new ByteArrayInputStream(
      png(16, 16)((x, _) => if (x < 8) gray(100) else gray(200))))
    val out = ImageQuality.gentleSharpening(step)
    assert((out.getRGB(7, 7) & 0xff) == 91, (out.getRGB(7, 7) & 0xff))
    // and the first 200-column mirrors: 1.8·200 − 0.1·(5·200 + 3·100) =
    // 360 − 130 = 230; 0.7·200 + 0.3·230 = 209
    assert((out.getRGB(8, 7) & 0xff) == 209, (out.getRGB(8, 7) & 0xff))
  }

  test("minimal enhancement (PIL Contrast 1.03 + Sharpness 1.05) is identity on uniforms") {
    val flat = ImageIO.read(new ByteArrayInputStream(png(12, 12)((_, _) => gray(140))))
    val out = ImageQuality.minimalEnhancement(flat)
    for (x <- 0 until 12; y <- 0 until 12)
      assert(out.getRGB(x, y) == flat.getRGB(x, y))
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

  test("CLAHE single tile: hand-computed clip/redistribute/LUT") {
    // 16x16, ONE tile (area 256): clip = max(1, 1.5*256/256) = 1.
    // Pixels: 252 at 100, four at 200. After clip both bins are 1,
    // clipped = 254, redistBatch = 0, residual = 254, step = 1 -> bins
    // 0..253 each +1. cumsum(<=100) = 101 + 1 = 102, lut[100] =
    // rint(102*255/256) = 102; cumsum(<=200) = 201 + 2 = 203, lut[200] =
    // rint(203*255/256) = 202. One tile -> output is the bare LUT.
    val src = Array.fill(256)(100)
    src(0) = 200; src(17) = 200; src(100) = 200; src(255) = 200
    val out = ImageQuality.claheL(src, 16, 16, clipLimit = 1.5,
      tilesX = 1, tilesY = 1)
    (0 until 256).foreach { i =>
      assert(out(i) == (if (src(i) == 100) 102 else 202), s"px $i")
    }
  }

  test("CLAHE bilinear interpolation: hand-computed two-tile blend with edge clamping") {
    // 8x4, grid 2x1 (tiles 4x4, area 16, clip = max(1,0) = 1). Left tile
    // all 50, right all 150. Redistribution: residual 15, step 17 ->
    // bins {0,17,...,238}. lut_left[50] = rint(4*255/16) = 64,
    // lut_left[150] = rint(10*255/16) = 159, lut_right[50] =
    // rint(3*255/16) = 48, lut_right[150] = 159. Interpolation (txf =
    // x/4 - 0.5): x<=2 pure left, x=3 -> 0.75L+0.25R, x=4 -> 0.5/0.5,
    // x=5 -> 0.25L+0.75R, x>=6 pure right.
    val src = Array.tabulate(32)(i => if (i % 8 < 4) 50 else 150)
    val out = ImageQuality.claheL(src, 8, 4, clipLimit = 1.5,
      tilesX = 2, tilesY = 1)
    val expectedRow = Array(64, 64, 64,
      math.rint(0.75 * 64 + 0.25 * 48).toInt, // 60
      159, 159, 159, 159)
    (0 until 4).foreach { y =>
      (0 until 8).foreach { x =>
        assert(out(y * 8 + x) == expectedRow(x), s"($x,$y)")
      }
    }
  }

  test("LAB roundtrip: grays are achromatic and monotone; color roundtrip tight in aggregate") {
    var prevL = -1
    for (v <- 0 to 255 by 5) {
      val (l, a, b) = ImageQuality.rgb2Lab8(gray(v))
      assert(a == 128 && b == 128, s"gray $v must be achromatic, got ($a,$b)")
      assert(l >= prevL, s"L must be monotone in gray level at $v")
      prevL = l
      val p = ImageQuality.lab82Rgb(l, a, b)
      Seq(16, 8, 0).foreach { sh =>
        assert(math.abs(((p >> sh) & 0xff) - v) <= 1, s"gray $v roundtrip")
      }
    }
    // 8-bit Lab is inherently lossy for dark saturated colors (the a/b
    // integer quantization is amplified by the steep sRGB encode slope at
    // low intensities — cv2's own 8u roundtrip has the same property), so
    // the per-channel bound is loose there; the AGGREGATE must stay tight (mean over 600 channel samples <= 1.5; observed ~0.9)
    val rnd = new scala.util.Random(7)
    var totalDelta = 0L
    val samples = 200
    (0 until samples).foreach { _ =>
      val c = rnd.nextInt(1 << 24)
      val (l, a, b) = ImageQuality.rgb2Lab8(c)
      val p = ImageQuality.lab82Rgb(l, a, b)
      Seq(16, 8, 0).foreach { sh =>
        val d = math.abs(((p >> sh) & 0xff) - ((c >> sh) & 0xff))
        assert(d <= 16, f"color $c%06x roundtrip channel delta $d")
        totalDelta += d
      }
    }
    assert(totalDelta.toDouble / (samples * 3) <= 1.5,
      s"mean roundtrip delta ${totalDelta.toDouble / (samples * 3)}")
  }

  test("gentleColorNormalization: pixel-wise (geometry preserved), gray stays near-gray") {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, gray(128))
    val out = ImageQuality.gentleColorNormalization(img)
    assert(out.getWidth == 64 && out.getHeight == 64)
    val p = out.getRGB(10, 10)
    val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    // uniform input -> every tile identical -> uniform output
    for (y <- 0 until 64; x <- 0 until 64) assert(out.getRGB(x, y) == p)
    // 0.8 blend keeps the result near the original; channels stay equal
    // within the LAB float-path 1-LSB tolerance
    assert(math.abs(r - 128) <= 8 && math.abs(g - 128) <= 8 && math.abs(b - 128) <= 8)
    assert(math.abs(r - g) <= 1 && math.abs(g - b) <= 1)
  }

  test("step-6 gate reproduces the Python precedence quirk; opt-in wiring changes bright images only") {
    // (normalize_colors and b < 100) or b > 200 — the quirk: with
    // normalize_colors=False the step still fires above 200
    assert(ImageQuality.colorNormalizeGate(false, 210.0))
    assert(!ImageQuality.colorNormalizeGate(false, 90.0))
    assert(ImageQuality.colorNormalizeGate(true, 90.0))
    assert(!ImageQuality.colorNormalizeGate(true, 150.0))
    // a flat bright image: score ~19 (not conservative), brightness 230
    // > 200 -> the opted-in run normalizes, the default run is unchanged
    val bright = png(64, 64)((_, _) => gray(230))
    val base = ImageQuality.enhanceOne("m", bright)
    val defaulted = ImageQuality.enhanceOne("m", bright, None)
    assert(base.enhanced_png.sameElements(defaulted.enhanced_png))
    val opted = ImageQuality.enhanceOne("m", bright, Some(false))
    assert(!opted.enhanced_png.sameElements(base.enhanced_png),
      "normalizeColors=Some(false) must fire on brightness > 200 (the quirk)")
    // dim image: Some(false) leaves the gate closed -> identical bytes
    val dim = png(64, 64)((x, y) => gray(60 + ((x + y) % 3)))
    assert(ImageQuality.enhanceOne("m", dim, Some(false)).enhanced_png
      .sameElements(ImageQuality.enhanceOne("m", dim).enhanced_png))
  }

  test("q45 expected-rows fixture is current (driver oracle drift guard)") {
    val expected = spark.read.parquet("src/test/resources/expected/q45_image_quality.parquet")
    val actual = SparkEntry.queries("q45_image_quality")(spark, "/root/testdata/sf0.01")
    assert(actual.exceptAll(expected).count() == 0, "live rows missing from fixture")
    assert(expected.exceptAll(actual).count() == 0, "fixture rows missing from live output")
  }
}
