package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.fixtures.PdfFixtures
import graft.sources.{PdfIngest, PdfRaster}
import org.scalatest.funsuite.AnyFunSuite

/** S2 — the built-in pure-JVM PDF rasterizer against self-contained
  * fixture documents from `PdfFixtures` (classic xref, Flate/raw streams,
  * path + text + image + form + clip + rotate content). Pixel probes pin
  * geometry and color exactly where rendering is exact (fills, images,
  * y-flip, dpi math) and structurally where the JVM font substitutes for
  * the PDF font program (ink presence / layout widths). */
class PdfRasterSpec extends AnyFunSuite {

  private def decode(p: (Int, Int, Array[Byte])) =
    ImageIO.read(new ByteArrayInputStream(p._3))

  private def inkBounds(img: java.awt.image.BufferedImage,
      x0: Int, y0: Int, x1: Int, y1: Int): Option[(Int, Int, Int, Int)] = {
    var minX = Int.MaxValue; var minY = Int.MaxValue; var maxX = -1; var maxY = -1
    (y0 until y1).foreach { y =>
      (x0 until x1).foreach { x =>
        val rgb = img.getRGB(x, y)
        if ((rgb & 0xffffff) != 0xffffff) {
          minX = math.min(minX, x); maxX = math.max(maxX, x)
          minY = math.min(minY, y); maxY = math.max(maxY, y)
        }
      }
    }
    if (maxX < 0) None else Some((minX, minY, maxX, maxY))
  }

  test("page geometry is PyMuPDF's dpi math; page count comes from the document") {
    val pdf = PdfFixtures.invoicePdf(seed = 7, nPages = 3)
    val at72 = PdfRaster.render(pdf, dpi = 72)
    assert(at72.length == 3)
    assert(at72.forall(p => p._1 == 612 && p._2 == 792))
    val at18 = PdfRaster.render(pdf, dpi = 18)
    assert(at18.forall(p => p._1 == 153 && p._2 == 198)) // round(612*0.25) × round(792*0.25)
  }

  test("fills, strokes, and the y-flip land on exact device pixels") {
    val img = decode(PdfRaster.render(PdfFixtures.invoicePdf(seed = 1, nPages = 1), 72).head)
    // header band: 36 724 540 40 re f with rgb(0.92,0.92,0.95)
    // → device x 36..576, y 792-764=28 .. 792-724=68; interior probe
    val band = new java.awt.Color(img.getRGB(560, 40)) // inside the band, right of the title run
    assert(band.getRed == 235 && band.getGreen == 235 && band.getBlue == 242,
      s"header band pixel was $band")
    // outside the band: white background
    assert((img.getRGB(5, 5) & 0xffffff) == 0xffffff)
    assert((img.getRGB(300, 10) & 0xffffff) == 0xffffff)
    // the blue rule: 2pt line at y_pdf 716 → device y ≈ 76
    val rule = new java.awt.Color(img.getRGB(300, 76))
    assert(rule.getBlue > 100 && rule.getBlue > rule.getRed + 50,
      s"rule pixel was $rule")
    // title ink inside the band region (glyph shapes are JVM-rendered —
    // probe presence, not shape): text at Td 50 736, fs 20 → device
    // baseline y ≈ 56, ascent above
    assert(inkBounds(img, 50, 30, 400, 60).exists { case (x0, _, x1, _) => x1 - x0 > 80 },
      "expected title ink across the header band")
  }

  test("FlateDecode: compressed and uncompressed documents render identical pixels") {
    val a = PdfRaster.render(PdfFixtures.invoicePdf(3, 2, compress = true), 36)
    val b = PdfRaster.render(PdfFixtures.invoicePdf(3, 2, compress = false), 36)
    assert(a.map(_._3.toSeq) == b.map(_._3.toSeq))
  }

  test("PDF 1.5 xref stream + object stream: same objects, identical pixels") {
    // the modern-writer layout: every non-stream object lives in ONE
    // /Type /ObjStm addressed by type-2 entries of a /Type /XRef stream
    // (W [1 4 2], Flate + PNG Up predictor); rendering must be bit-equal
    // to the classic-xref twin of the same document
    val classic = PdfRaster.render(PdfFixtures.invoicePdf(11, 2), 36)
    val modern = PdfRaster.render(
      PdfFixtures.invoicePdf(11, 2, layout = "xref-stream"), 36)
    assert(modern.length == 2)
    assert(modern.map(_._3.toSeq) == classic.map(_._3.toSeq))
    // the 1.5 layout also flows through the dispatch boundary un-warned
    val (pages, warned) = graft.Audit.capturing {
      PdfIngest.renderPdf(PdfFixtures.invoicePdf(11, 2, layout = "xref-stream"), 36)
    }
    assert(pages.length == 2 && warned.isEmpty, s"warned: $warned")
  }

  test("legacy stream filters (ASCIIHex/ASCII85/RunLength/LZW) render identical pixels") {
    val plain = PdfRaster.render(PdfFixtures.filteredPdf("none"), 72)
    for (f <- Seq("ASCIIHexDecode", "ASCII85Decode", "RunLengthDecode", "LZWDecode")) {
      val filtered = PdfRaster.render(PdfFixtures.filteredPdf(f), 72)
      assert(filtered.map(_._3.toSeq) == plain.map(_._3.toSeq), s"filter $f diverged")
    }
  }

  test("LZW width boundaries (511/1023/2047 + table reset) and >8KB Flate output decode exactly") {
    // ~130KB of varied content pushes the LZW table across every width
    // boundary and through a clear/reset — the interop-critical
    // EarlyChange timing a small stream never exercises — and gives the
    // Flate path a payload far beyond one 8KB inflate buffer
    val plain = PdfRaster.render(PdfFixtures.filteredPdf("none", nExtra = 4000), 36)
    for (f <- Seq("LZWDecode", "FlateDecode")) {
      val out = PdfRaster.render(PdfFixtures.filteredPdf(f, nExtra = 4000), 36)
      assert(out.map(_._3.toSeq) == plain.map(_._3.toSeq), s"$f diverged at scale")
    }
  }

  test("hybrid-reference file: /XRefStm is honored (classic table marks compressed objects free)") {
    // the hybrid fixture's classic table can NOT resolve any dict object
    // (all marked free) — rendering at all proves the trailer's /XRefStm
    // cross-reference stream was read, per the spec's precedence
    val classic = PdfRaster.render(PdfFixtures.invoicePdf(11, 2), 36)
    val hybrid = PdfRaster.render(
      PdfFixtures.invoicePdf(11, 2, layout = "hybrid"), 36)
    assert(hybrid.map(_._3.toSeq) == classic.map(_._3.toSeq))
  }

  test("image XObjects: raw DeviceRGB Flate bitmap and DCTDecode JPEG at exact rects") {
    val img = decode(PdfRaster.render(PdfFixtures.imagePdf(0xff0000, 0x0080ff), 72).head)
    assert(img.getWidth == 200 && img.getHeight == 100)
    // raw red image at cm [120 0 0 60 40 20] → device x 40..160, y 20..80
    val raw = new java.awt.Color(img.getRGB(100, 50))
    assert(raw.getRed == 255 && raw.getGreen == 0 && raw.getBlue == 0, s"raw image pixel $raw")
    // jpeg at (10,10)+(20×20) → device y 100-30=70..90; JPEG is lossy → near match
    val j = new java.awt.Color(img.getRGB(20, 80))
    assert(math.abs(j.getRed - 0) < 12 && math.abs(j.getGreen - 128) < 12 &&
      math.abs(j.getBlue - 255) < 12, s"jpeg pixel $j")
    // outside both rects: white
    assert((img.getRGB(195, 5) & 0xffffff) == 0xffffff)
  }

  test("inline images (BI/ID/EI): raw RGB by exact length, AHx gray by EI scan; dash patterns on/off") {
    val img = decode(PdfRaster.render(PdfFixtures.inlineImageDashPdf(), 72).head)
    assert(img.getWidth == 200 && img.getHeight == 100)
    // raw RGB 2×2 at cm [60 0 0 30 10 60] → device x 10..70, y 10..40;
    // rows are top-down: (red | green) over (blue | white)
    def px(x: Int, y: Int) = new java.awt.Color(img.getRGB(x, y))
    assert(px(25, 17).getRed == 255 && px(25, 17).getGreen == 0, s"${px(25, 17)}")
    assert(px(55, 17).getGreen == 255 && px(55, 17).getRed == 0, s"${px(55, 17)}")
    assert(px(25, 32).getBlue == 255 && px(25, 32).getRed == 0, s"${px(25, 32)}")
    // AHx gray 2×2 at cm [40 0 0 40 120 40] → device x 120..160, y 20..60
    assert((img.getRGB(125, 30) & 0xffffff) == 0x000000)
    assert((img.getRGB(155, 30) & 0xffffff) == 0xffffff)
    assert((img.getRGB(125, 50) & 0xffffff) == 0x808080)
    assert((img.getRGB(155, 50) & 0xffffff) == 0x282828)
    // dashed line at y_pdf 10 → device y 90, on-segments [10,22) [34,46)…
    // (square caps widen each on-run by ±2): x=16 inked, x=28 white, x=40
    // inked (strokes are antialiased → near-color probes)
    assert(px(16, 90).getRed > 200 && px(16, 90).getBlue < 60, s"${px(16, 90)}")
    assert((img.getRGB(28, 90) & 0xffffff) == 0xffffff, "dash gap must stay white")
    assert(px(40, 90).getRed > 200, s"${px(40, 90)}")
    // [] 0 d resets to solid: the blue line at device y 70 has no gaps
    (12 to 188 by 4).foreach { x =>
      assert(px(x, 70).getBlue > 200 && px(x, 70).getRed < 60, s"solid at $x: ${px(x, 70)}")
    }
  }

  test("/Widths array drives show-string advances (spec metrics beat JVM metrics)") {
    val withW = decode(PdfRaster.render(PdfFixtures.widthsPdf(withWidths = true), 72).head)
    val without = decode(PdfRaster.render(PdfFixtures.widthsPdf(withWidths = false), 72).head)
    val w1 = inkBounds(withW, 0, 0, 300, 100).map { case (x0, _, x1, _) => x1 - x0 }.get
    val w2 = inkBounds(without, 0, 0, 300, 100).map { case (x0, _, x1, _) => x1 - x0 }.get
    // five 'I' glyphs at 1000/1000 em, fs 20 → advances span 4*20=80pt +
    // final glyph; Helvetica 'I' is ~5.6pt at fs 20 → JVM layout is narrow
    assert(w1 > 80, s"widths-driven span was $w1")
    assert(w2 < 40, s"JVM-metrics span was $w2")
  }

  test("TJ displacement moves the following run by -adj/1000*fs") {
    val shifted = decode(PdfRaster.render(PdfFixtures.kerningPdf(adj = -2000), 72).head)
    val plain = decode(PdfRaster.render(PdfFixtures.kerningPdf(adj = 0), 72).head)
    val ws = inkBounds(shifted, 0, 0, 400, 100).map { case (x0, _, x1, _) => x1 - x0 }.get
    val wp = inkBounds(plain, 0, 0, 400, 100).map { case (x0, _, x1, _) => x1 - x0 }.get
    // -2000/1000 * fs(20) = +40pt extra gap
    assert(ws - wp > 30 && ws - wp < 50, s"shifted=$ws plain=$wp")
  }

  test("W clip restricts painting to the intersected region") {
    val img = decode(PdfRaster.render(PdfFixtures.clipPdf(), 72).head)
    // full-page red fill clipped to bottom-left 50×50pt → device y 742..792
    val in = new java.awt.Color(img.getRGB(25, 767))
    assert(in.getRed == 255 && in.getGreen == 0, s"clipped-in pixel $in")
    assert((img.getRGB(25, 700) & 0xffffff) == 0xffffff) // above the clip
    assert((img.getRGB(100, 767) & 0xffffff) == 0xffffff) // right of the clip
  }

  test("/Rotate 90 swaps the raster dimensions and rotates content") {
    val (w, h, png) = PdfRaster.render(PdfFixtures.rotatedPdf(), 72).head
    assert(w == 792 && h == 612)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    // the band along the page's left edge (x_pdf 0..60, full height) maps
    // under rotate-90 to the TOP edge of the device raster
    val top = new java.awt.Color(img.getRGB(400, 20))
    assert(top.getRed < 40 && top.getGreen < 40, s"rotated band pixel $top")
    assert((img.getRGB(400, 500) & 0xffffff) == 0xffffff)
  }

  test("outside the subset → Unsupported; renderPdf falls back to the stub with a warning") {
    val pdf = PdfFixtures.unsupportedPdf()
    val e = intercept[PdfRaster.Unsupported](PdfRaster.render(pdf, 72))
    assert(e.getMessage.contains("JBIG2Decode"))
    val (pages, warned) = Audit.capturing(PdfIngest.renderPdf(pdf, 18))
    assert(pages.nonEmpty && pages.forall(p => p._1 == 153 && p._2 == 198)) // stub geometry
    assert(warned.exists(_.contains("falling back")), s"got $warned")
    // in-subset documents produce NO fallback warning
    val (real, silent) = Audit.capturing(PdfIngest.renderPdf(PdfFixtures.invoicePdf(2, 2), 18))
    assert(real.length == 2 && silent.isEmpty)
  }

  test("determinism: same document renders bit-identical PNGs") {
    val pdf = PdfFixtures.invoicePdf(seed = 11, nPages = 2)
    val a = PdfRaster.render(pdf, 36).map(_._3.toSeq)
    val b = PdfRaster.render(pdf, 36).map(_._3.toSeq)
    assert(a == b)
  }

  test("cyclic indirect references surface as Unsupported, not a fatal stack overflow") {
    // 1 0 obj -> 2 0 R, 2 0 obj -> 1 0 R, catalog's /Pages enters the cycle.
    // Unsupported is catchable (renderPdf degrades to the warned stub); a
    // StackOverflowError is not NonFatal and would kill the ingest job.
    val b = new PdfFixtures.Builder
    val o1 = b.reserve(); val o2 = b.reserve()
    b.set(o1, s"$o2 0 R"); b.set(o2, s"$o1 0 R")
    val root = b.add(s"<< /Type /Catalog /Pages $o1 0 R >>")
    val ex = intercept[PdfRaster.Unsupported](PdfRaster.render(b.build(root), 72))
    assert(ex.getMessage.contains("chain too deep") || ex.getMessage.contains("cyclic"))
    // and the ingest seam degrades honestly: stub fallback + warning
    val (pages, warned) = Audit.capturing(PdfIngest.renderPdf(b.build(root), 72))
    assert(pages.nonEmpty && warned.exists(_.contains("falling back")))
  }

  test("incremental update freeing an object is honored — stale content is not resurrected") {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    val b = new PdfFixtures.Builder
    val content = b.addStream("", "0 0 0 rg 0 0 100 100 re f".getBytes(ISO_8859_1))
    val pagesN = b.reserve()
    val page = b.add(s"<< /Type /Page /Parent $pagesN 0 R /MediaBox [0 0 100 100] /Contents $content 0 R >>")
    b.set(pagesN, s"<< /Type /Pages /Kids [$page 0 R] /Count 1 >>")
    val root = b.add(s"<< /Type /Catalog /Pages $pagesN 0 R >>")
    val base = b.build(root)
    // base renders the full-page black rect
    val before = decode(PdfRaster.render(base, 72).head)
    assert((before.getRGB(50, 50) & 0xffffff) == 0x000000)
    // incremental update: newest xref section marks the content object FREE
    val origXref = """startxref\s+(\d+)""".r.findFirstMatchIn(
      new String(base, ISO_8859_1)).get.group(1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    val newXref = out.size()
    out.write((s"xref\n$content 1\n0000000000 65535 f \n" +
      s"trailer\n<< /Size ${root + 1} /Root $root 0 R /Prev $origXref >>\n" +
      s"startxref\n$newXref\n%%EOF\n").getBytes(ISO_8859_1))
    // a reference to a freed object resolves to null (spec 7.3.10): the
    // page renders EMPTY — drawing the deleted rect from the older
    // section's in-use entry would be silent resurrection
    val after = decode(PdfRaster.render(out.toByteArray, 72).head)
    assert((after.getRGB(50, 50) & 0xffffff) == 0xffffff)
  }
}
