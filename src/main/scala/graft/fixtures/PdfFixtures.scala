package graft.fixtures

import java.nio.charset.StandardCharsets.ISO_8859_1

import scala.collection.mutable

/** Deterministic minimal-PDF writer for the S2 ingest fixtures — the PDF
  * twin of `MediaFixtures` (which synthesizes PNG/WAV/AVI payloads). Emits
  * spec-valid PDF 1.4 with classic cross-reference tables, exercising
  * exactly the subset `sources/PdfRaster` documents: Flate or raw content
  * streams, path + text operators, image XObjects (raw RGB and DCTDecode
  * JPEG), form XObjects, clipping, /Rotate. Used by PdfRasterSpec /
  * PdfIngestSpec; a real deployment ingests externally produced PDFs.
  */
object PdfFixtures {

  /** Classic-xref PDF assembler: add (or reserve-then-set) objects, then
    * `build(root)`. `reserve` exists so forward references (a page's
    * /Parent) can name their object number before the body is written. */
  final class Builder {
    private val objs = mutable.ArrayBuffer[Array[Byte]]()
    private val streamObjs = mutable.HashSet[Int]() // stream objects by number

    /** Adds object body (the bytes between `N 0 obj` and `endobj`);
      * returns the 1-based object number. */
    def add(body: String): Int = { objs += body.getBytes(ISO_8859_1); objs.length }

    /** Reserves an object number to be filled by `set` later. */
    def reserve(): Int = { objs += Array.emptyByteArray; objs.length }
    def set(num: Int, body: String): Unit = objs(num - 1) = body.getBytes(ISO_8859_1)

    def addStream(dictEntries: String, data: Array[Byte]): Int = {
      val head = s"<< $dictEntries /Length ${data.length} >>\nstream\n".getBytes(ISO_8859_1)
      val tail = "\nendstream".getBytes(ISO_8859_1)
      val body = new Array[Byte](head.length + data.length + tail.length)
      System.arraycopy(head, 0, body, 0, head.length)
      System.arraycopy(data, 0, body, head.length, data.length)
      System.arraycopy(tail, 0, body, head.length + data.length, tail.length)
      objs += body
      streamObjs += objs.length
      objs.length
    }

    def build(rootObj: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
      w("%PDF-1.4\n%âãÏÓ\n")
      val offsets = objs.zipWithIndex.map { case (body, i) =>
        val off = out.size()
        w(s"${i + 1} 0 obj\n"); out.write(body); w("\nendobj\n")
        off
      }
      val xrefOff = out.size()
      w(s"xref\n0 ${objs.length + 1}\n")
      w("0000000000 65535 f \n")
      offsets.foreach(o => w(f"$o%010d 00000 n \n"))
      w(s"trailer\n<< /Size ${objs.length + 1} /Root $rootObj 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
      out.toByteArray
    }

    /** PDF 1.5 layout twin of `build`: the SAME objects, but every
      * non-stream object packed into ONE object stream (/Type /ObjStm)
      * referenced by type-2 entries, and the cross-reference emitted as an
      * xref STREAM (/Type /XRef, /W [1 4 2], FlateDecode + PNG Up
      * predictor /Columns 7) — the layout modern writers emit. Rendered
      * pixels must be identical to the classic build (PdfRasterSpec pins
      * that). */
    def buildXrefStream(rootObj: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
      w("%PDF-1.5\n%âãÏÓ\n")
      val (offsets, objStmNum, inStm, stmIdx) = emitModernBody(out)
      val xrefOff = emitXrefStreamObj(out, rootObj, offsets, objStmNum, inStm, stmIdx)
      w(s"startxref\n$xrefOff\n%%EOF\n")
      out.toByteArray
    }

    /** Hybrid-reference layout (PDF 1.5 §7.5.8.4): a CLASSIC table +
      * trailer whose /XRefStm names a cross-reference stream. The classic
      * table lists only the top-level stream objects and marks compressed
      * objects FREE (a classic-only reader would fail to resolve them), so
      * rendering this file at all proves the /XRefStm side was read — and
      * read BEFORE /Prev per the spec's precedence. */
    def buildHybrid(rootObj: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
      w("%PDF-1.5\n%âãÏÓ\n")
      val (offsets, objStmNum, inStm, stmIdx) = emitModernBody(out)
      val xrefStmOff = emitXrefStreamObj(out, rootObj, offsets, objStmNum, inStm, stmIdx)
      val size = objs.length + 3
      val tableOff = out.size().toLong
      w(s"xref\n0 $size\n")
      w("0000000000 65535 f \n")
      (1 to objs.length).foreach { n =>
        if (streamObjs.contains(n)) w(f"${offsets(n)}%010d 00000 n \n")
        else w("0000000000 00000 f \n") // only resolvable via /XRefStm
      }
      w(f"${offsets(objStmNum)}%010d 00000 n \n")
      w(f"$xrefStmOff%010d 00000 n \n")
      w(s"trailer\n<< /Size $size /Root $rootObj 0 R /XRefStm $xrefStmOff >>\n")
      w(s"startxref\n$tableOff\n%%EOF\n")
      out.toByteArray
    }

    /** Top-level stream objects + the single /Type /ObjStm holding every
      * non-stream object. Returns (object offsets incl. the ObjStm's,
      * ObjStm number, in-stream object numbers, their ObjStm indexes). */
    private def emitModernBody(out: java.io.ByteArrayOutputStream)
        : (mutable.HashMap[Int, Long], Int, Seq[Int], Map[Int, Int]) = {
      def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
      val objStmNum = objs.length + 1
      val inStm = (1 to objs.length).filterNot(streamObjs.contains)
      val stmIdx = inStm.zipWithIndex.toMap
      val offsets = mutable.HashMap[Int, Long]()
      // stream objects stay top-level (a stream can't live in an ObjStm)
      objs.zipWithIndex.foreach { case (body, i) =>
        if (streamObjs.contains(i + 1)) {
          offsets(i + 1) = out.size().toLong
          w(s"${i + 1} 0 obj\n"); out.write(body); w("\nendobj\n")
        }
      }
      // the object stream: header of (num, offset) pairs, then bodies
      val bodyBuf = new java.io.ByteArrayOutputStream()
      val pairs = inStm.map { n =>
        val off = bodyBuf.size()
        bodyBuf.write(objs(n - 1)); bodyBuf.write('\n')
        (n, off)
      }
      val header = pairs.map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
      val first = header.getBytes(ISO_8859_1).length
      val stmData = deflate(header.getBytes(ISO_8859_1) ++ bodyBuf.toByteArray)
      offsets(objStmNum) = out.size().toLong
      w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${inStm.length} /First $first " +
        s"/Filter /FlateDecode /Length ${stmData.length} >>\nstream\n")
      out.write(stmData); w("\nendstream\nendobj\n")
      (offsets, objStmNum, inStm, stmIdx)
    }

    /** The /Type /XRef stream object (its own entry included); returns its
      * byte offset. */
    private def emitXrefStreamObj(out: java.io.ByteArrayOutputStream, rootObj: Int,
        offsets: mutable.HashMap[Int, Long], objStmNum: Int,
        inStm: Seq[Int], stmIdx: Map[Int, Int]): Long = {
      def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
      val xrefNum = objs.length + 2
      val xrefOff = out.size().toLong
      val size = objs.length + 3 // obj 0 + bodies + ObjStm + the XRef stream itself
      val rows = new java.io.ByteArrayOutputStream()
      def row(t: Int, f2: Long, f3: Int): Unit = {
        rows.write(t)
        rows.write(((f2 >> 24) & 0xff).toInt); rows.write(((f2 >> 16) & 0xff).toInt)
        rows.write(((f2 >> 8) & 0xff).toInt); rows.write((f2 & 0xff).toInt)
        rows.write((f3 >> 8) & 0xff); rows.write(f3 & 0xff)
      }
      row(0, 0, 0xffff) // object 0: head of the free list
      (1 to objs.length).foreach { n =>
        if (streamObjs.contains(n)) row(1, offsets(n), 0)
        else row(2, objStmNum.toLong, stmIdx(n))
      }
      row(1, offsets(objStmNum), 0)
      row(1, xrefOff, 0)
      val xdata = deflate(pngUpPredict(rows.toByteArray, cols = 7))
      w(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [1 4 2] /Root $rootObj 0 R " +
        s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> " +
        s"/Length ${xdata.length} >>\nstream\n")
      out.write(xdata); w("\nendstream\nendobj\n")
      xrefOff
    }
  }

  /** PNG Up (tag 2) predictor over `cols`-byte rows — what real writers
    * apply to xref-stream payloads before Flate. */
  private def pngUpPredict(data: Array[Byte], cols: Int): Array[Byte] = {
    require(data.length % cols == 0, s"pngUpPredict: ${data.length} % $cols != 0")
    val nRows = data.length / cols
    val out = new Array[Byte]((cols + 1) * nRows)
    var r = 0
    while (r < nRows) {
      out(r * (cols + 1)) = 2
      var c = 0
      while (c < cols) {
        val prev = if (r == 0) 0 else data((r - 1) * cols + c)
        out(r * (cols + 1) + 1 + c) = (data(r * cols + c) - prev).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def contentStream(b: Builder, content: String, compress: Boolean): Int =
    if (compress) b.addStream("/Filter /FlateDecode", deflate(content.getBytes(ISO_8859_1)))
    else b.addStream("", content.getBytes(ISO_8859_1))

  /** Multi-page A4 invoice-shaped PDF: gray header bar, bold title, blue
    * rule, item lines, total block, and a shared form-XObject "logo".
    * `compress=true` Flate-encodes every content stream — the rendered
    * pixels must be IDENTICAL either way (PdfRasterSpec pins that). */
  def invoicePdf(seed: Int, nPages: Int = 2, compress: Boolean = true,
      layout: String = "classic"): Array[Byte] = {
    val b = new Builder
    val pagesObj = b.reserve()
    val fontRegular = b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val fontBold = b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")
    // "logo": 40×40 form — orange square + dark diagonal
    val logo = b.addStream("/Type /XObject /Subtype /Form /BBox [0 0 40 40]",
      ("1 0.6 0.1 rg 2 2 36 36 re f " +
       "0.2 0.2 0.2 RG 3 w 4 4 m 36 36 l S").getBytes(ISO_8859_1))
    val resources = b.add(
      s"<< /Font << /F1 $fontRegular 0 R /F2 $fontBold 0 R >> /XObject << /Logo $logo 0 R >> >>")
    val pageObjs = (1 to nPages).map { p =>
      val rnd = new scala.util.Random(seed * 1000 + p)
      val items = (1 to 3).map { i =>
        val qty = 1 + rnd.nextInt(9)
        val unit = 50 + rnd.nextInt(900)
        f"BT /F1 10 Tf 50 ${620 - i * 18} Td (Prestation $i%d - ref SRV-$seed%04d$i%d) Tj ET " +
          f"BT /F1 10 Tf 420 ${620 - i * 18} Td ($qty%d x $unit%d,00 DH) Tj ET "
      }.mkString
      val content =
        // header band + title (reading-order top zone)
        "q 0.92 0.92 0.95 rg 36 724 540 40 re f Q " +
        s"BT /F2 20 Tf 50 736 Td (FACTURE N FACT-2024-${1000 + seed}) Tj ET " +
        "0.2 0.2 0.6 RG 2 w 36 716 m 576 716 l S " +
        // parties
        "BT /F1 11 Tf 50 690 Td (Emetteur: TechnoSoft Solutions SARL) Tj " +
        "0 -14 Td (ICE: 001234567000089) Tj ET " +
        s"BT /F1 11 Tf 320 690 Td (Client: Atlas Distribution SA - page $p) Tj ET " +
        // items + total
        items +
        s"q 1 0 0 1 400 80 cm BT /F2 12 Tf 0 0 Td (Total TTC: ${200 + seed},40 DH) Tj ET Q " +
        // logo via form XObject, translated+scaled by cm
        "q 0.75 0 0 0.75 40 44 cm /Logo Do Q"
      val cs = contentStream(b, content, compress)
      b.add(s"<< /Type /Page /Parent $pagesObj 0 R /MediaBox [0 0 612 792] " +
        s"/Resources $resources 0 R /Contents $cs 0 R >>")
    }
    finish(b, pagesObj, pageObjs, layout)
  }

  /** 200×100pt page with two image XObjects: an 8×4 raw DeviceRGB
    * FlateDecode bitmap (solid `rawRgb`) at rect (40,20)+(120×60), and a
    * solid `jpegRgb` DCTDecode JPEG at rect (10,10)+(20×20). */
  def imagePdf(rawRgb: Int, jpegRgb: Int): Array[Byte] = {
    val b = new Builder
    val pagesObj = b.reserve()
    val (rw, rh) = (8, 4)
    val raw = new Array[Byte](rw * rh * 3)
    (0 until rw * rh).foreach { i =>
      raw(i * 3) = ((rawRgb >> 16) & 0xff).toByte
      raw(i * 3 + 1) = ((rawRgb >> 8) & 0xff).toByte
      raw(i * 3 + 2) = (rawRgb & 0xff).toByte
    }
    val rawImg = b.addStream(
      s"/Type /XObject /Subtype /Image /Width $rw /Height $rh " +
        "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode",
      deflate(raw))
    val jimg = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 16).foreach(x => jimg.setRGB(x, y, jpegRgb)))
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jimg, "jpg", jbos)
    val jpegObj = b.addStream(
      "/Type /XObject /Subtype /Image /Width 16 /Height 16 " +
        "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
      jbos.toByteArray)
    val resources = b.add(s"<< /XObject << /Im0 $rawImg 0 R /Im1 $jpegObj 0 R >> >>")
    val content = "q 120 0 0 60 40 20 cm /Im0 Do Q q 20 0 0 20 10 10 cm /Im1 Do Q"
    val cs = contentStream(b, content, compress = true)
    val page = b.add(s"<< /Type /Page /Parent $pagesObj 0 R /MediaBox [0 0 200 100] " +
      s"/Resources $resources 0 R /Contents $cs 0 R >>")
    finish(b, pagesObj, Seq(page))
  }

  /** Page exercising BI/ID/EI inline images (raw binary DeviceRGB — exact
    * computed-length slice — and ASCIIHex DeviceGray — EI sentinel scan)
    * plus dashed and solid strokes (r4 verdict #6 constructs). */
  def inlineImageDashPdf(): Array[Byte] = {
    val b = new Builder
    val pagesObj = b.reserve()
    // 4×4 RGB in 2×2 quadrants (top: red|green, bottom: blue|white) — 48
    // raw bytes; 4×4 keeps quadrant-center probes pure under the
    // renderer's bilinear image interpolation
    val quads = Seq(Seq(0xff, 0, 0), Seq(0, 0xff, 0), Seq(0, 0, 0xff),
      Seq(0xff, 0xff, 0xff))
    val rgbData = (0 until 4).flatMap { y =>
      (0 until 4).flatMap { x => quads((y / 2) * 2 + (x / 2)) }
    }.map(_.toChar).mkString
    val content =
      "q 60 0 0 30 10 60 cm BI /W 4 /H 4 /CS /RGB /BPC 8 ID " +
        rgbData + " EI Q " +
        // 4×4 gray via /AHx, quadrants (00 black | FF white) / (80 | 28)
        "q 40 0 0 40 120 40 cm BI /W 4 /H 4 /CS /G /BPC 8 /F /AHx ID " +
        "0000FFFF0000FFFF8080282880802828> EI Q " +
        // dashed red line (12 on / 12 off), then a reset-to-solid blue one
        "[12 12] 0 d 4 w 1 0 0 RG 10 10 m 190 10 l S " +
        "[] 0 d 0 0 1 RG 10 30 m 190 30 l S"
    val cs = contentStream(b, content, compress = false)
    val page = b.add(s"<< /Type /Page /Parent $pagesObj 0 R /MediaBox [0 0 200 100] " +
      s"/Contents $cs 0 R >>")
    finish(b, pagesObj, Seq(page))
  }

  /** Single page whose text uses an explicit /Widths array (1000/1000ths =
    * one em per glyph) — layout must follow the PDF metrics, not the JVM
    * font's. `withWidths=false` emits the same page without /Widths. */
  def widthsPdf(withWidths: Boolean): Array[Byte] = {
    val b = new Builder
    val pagesObj = b.reserve()
    val widths = if (withWidths)
      s" /FirstChar 32 /LastChar 126 /Widths [${Seq.fill(95)("1000").mkString(" ")}]"
    else ""
    val font = b.add(s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica$widths >>")
    val resources = b.add(s"<< /Font << /F1 $font 0 R >> >>")
    val content = "BT /F1 20 Tf 20 50 Td (IIIII) Tj ET"
    val cs = contentStream(b, content, compress = false)
    val page = b.add(s"<< /Type /Page /Parent $pagesObj 0 R /MediaBox [0 0 300 100] " +
      s"/Resources $resources 0 R /Contents $cs 0 R >>")
    finish(b, pagesObj, Seq(page))
  }

  /** TJ kerning page: `adj` is the TJ displacement element between two
    * glyph runs (negative moves the second run RIGHT by |adj|/1000·fs). */
  def kerningPdf(adj: Int): Array[Byte] = {
    val b = new Builder
    val pagesObj = b.reserve()
    val font = b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val resources = b.add(s"<< /Font << /F1 $font 0 R >> >>")
    val content = s"BT /F1 20 Tf 20 50 Td [(AB) $adj (CD)] TJ ET"
    val cs = contentStream(b, content, compress = false)
    val page = b.add(s"<< /Type /Page /Parent $pagesObj 0 R /MediaBox [0 0 400 100] " +
      s"/Resources $resources 0 R /Contents $cs 0 R >>")
    finish(b, pagesObj, Seq(page))
  }

  /** Full-page red fill clipped to the bottom-left 50×50pt square. */
  def clipPdf(): Array[Byte] = {
    val b = new Builder
    val pagesObj = b.reserve()
    val resources = b.add("<< >>")
    val content = "q 0 0 50 50 re W n 1 0 0 rg 0 0 612 792 re f Q"
    val cs = contentStream(b, content, compress = false)
    val page = b.add(s"<< /Type /Page /Parent $pagesObj 0 R /MediaBox [0 0 612 792] " +
      s"/Resources $resources 0 R /Contents $cs 0 R >>")
    finish(b, pagesObj, Seq(page))
  }

  /** A4 page with /Rotate 90 and a dark band along the page's left edge. */
  def rotatedPdf(): Array[Byte] = {
    val b = new Builder
    val pagesObj = b.reserve()
    val resources = b.add("<< >>")
    val content = "0.1 0.1 0.1 rg 0 0 60 792 re f"
    val cs = contentStream(b, content, compress = false)
    val page = b.add(s"<< /Type /Page /Parent $pagesObj 0 R /MediaBox [0 0 612 792] " +
      s"/Rotate 90 /Resources $resources 0 R /Contents $cs 0 R >>")
    finish(b, pagesObj, Seq(page))
  }

  /** Outside the supported subset: content stream behind /JBIG2Decode —
    * `PdfRaster` must throw `Unsupported` (and `PdfIngest.renderPdf` must
    * fall back to the stub with a warning). */
  def unsupportedPdf(): Array[Byte] = {
    val b = new Builder
    val pagesObj = b.reserve()
    val resources = b.add("<< >>")
    val cs = b.addStream("/Filter /JBIG2Decode", Array[Byte](0, 1, 2, 3))
    val page = b.add(s"<< /Type /Page /Parent $pagesObj 0 R /MediaBox [0 0 612 792] " +
      s"/Resources $resources 0 R /Contents $cs 0 R >>")
    finish(b, pagesObj, Seq(page))
  }

  /** Single 300×200 page — a fill, a stroke, a glyph run, and a long
    * repeated-rect tail (so RunLength/LZW actually compress) — with the
    * content stream encoded by `filter` (none | ASCIIHexDecode |
    * ASCII85Decode | RunLengthDecode | LZWDecode): rendering must equal
    * the unfiltered twin. */
  def filteredPdf(filter: String, nExtra: Int = 12): Array[Byte] = {
    val b = new Builder
    val pagesObj = b.reserve()
    val font = b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val resources = b.add(s"<< /Font << /F1 $font 0 R >> >>")
    // nExtra scales the varied-op tail: large values push an LZW encoder's
    // table across the 511/1023 width boundaries (the interop-critical
    // EarlyChange timing is only exercised by multi-KB streams)
    val content = ("0.9 0.3 0.1 rg 30 30 140 80 re f " +
      "0 0 0.8 RG 4 w 20 20 m 280 180 l S " +
      "BT /F1 18 Tf 40 150 Td (Filtre PDF) Tj ET " +
      (0 until nExtra).map(i =>
        s"0.2 0.7 0.3 rg ${(i * 7) % 270 + 10} ${(i * 13) % 150 + 20} 2 3 re f")
        .mkString(" "))
      .getBytes(ISO_8859_1)
    val cs = filter match {
      case "none" => b.addStream("", content)
      case "FlateDecode" => b.addStream("/Filter /FlateDecode", deflate(content))
      case "ASCIIHexDecode" => b.addStream("/Filter /ASCIIHexDecode",
        (content.map(c => f"$c%02x").mkString + ">").getBytes(ISO_8859_1))
      case "ASCII85Decode"   => b.addStream("/Filter /ASCII85Decode", a85Encode(content))
      case "RunLengthDecode" => b.addStream("/Filter /RunLengthDecode", runLengthEncode(content))
      case "LZWDecode"       => b.addStream("/Filter /LZWDecode", lzwEncode(content))
      case other             => throw new IllegalArgumentException(s"filter: $other")
    }
    val page = b.add(s"<< /Type /Page /Parent $pagesObj 0 R /MediaBox [0 0 300 200] " +
      s"/Resources $resources 0 R /Contents $cs 0 R >>")
    finish(b, pagesObj, Seq(page))
  }

  /** ASCII85 encoder (with the 'z' zero-group shorthand and `~>` EOD). */
  def a85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    def group(t0: Long, keep: Int): Unit = {
      var t = t0
      val cs = new Array[Char](5)
      var k = 4
      while (k >= 0) { cs(k) = ('!' + (t % 85).toInt).toChar; t /= 85; k -= 1 }
      sb.appendAll(cs, 0, keep)
    }
    var i = 0
    while (i + 4 <= data.length) {
      val t = ((data(i) & 0xffL) << 24) | ((data(i + 1) & 0xffL) << 16) |
        ((data(i + 2) & 0xffL) << 8) | (data(i + 3) & 0xffL)
      if (t == 0) sb.append('z') else group(t, 5)
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var t = 0L
      var k = 0
      while (k < 4) { t = (t << 8) | (if (i + k < data.length) data(i + k) & 0xffL else 0L); k += 1 }
      group(t, rem + 1)
    }
    sb.append("~>")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** RunLengthDecode encoder: runs of ≥3 as (257−n, byte), literals
    * otherwise, 128 EOD. */
  def runLengthEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var j = i
      while (j < data.length && data(j) == data(i) && j - i < 128) j += 1
      if (j - i >= 3) { out.write(257 - (j - i)); out.write(data(i)); i = j }
      else {
        var k = i
        while (k < data.length && k - i < 128 &&
          !(k + 2 < data.length && data(k) == data(k + 1) && data(k) == data(k + 2))) k += 1
        out.write(k - i - 1); out.write(data, i, k - i); i = k
      }
    }
    out.write(128)
    out.toByteArray
  }

  /** PDF LZW encoder (TIFF variant, /EarlyChange 1): 9→12-bit big-endian
    * codes, leading 256 clear, trailing 257 EOD; emits a clear + reset if
    * the table approaches the 12-bit cap. Width timing mirrors the
    * decoder: the reader constructs the encoder's entry one code later, so
    * the encoder grows when nextCode + early − 2 reaches 2^width. */
  def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val dict = mutable.HashMap[String, Int]()
    var nextCode = 258
    def reset(): Unit = {
      dict.clear()
      var i = 0
      while (i < 256) { dict(i.toChar.toString) = i; i += 1 }
      nextCode = 258
    }
    put(256); reset()
    var w = ""
    data.foreach { b =>
      val c = (b & 0xff).toChar
      val wc = w + c
      if (dict.contains(wc)) w = wc
      else {
        put(dict(w))
        if (nextCode >= 4093) { put(256); reset(); width = 9 }
        else {
          dict(wc) = nextCode; nextCode += 1
          // the decoder's table lags the encoder's by one (it constructs
          // this entry one code later): decoder grows at table size
          // 2^width − EarlyChange (511), encoder at nextCode − 1 == 511,
          // i.e. nextCode == 2^width
          if (nextCode >= (1 << width) && width < 12) width += 1
        }
        w = c.toString
      }
    }
    if (w.nonEmpty) put(dict(w))
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** Fill the reserved /Pages object, add the catalog, assemble — in the
    * classic-xref layout, the PDF 1.5 xref-stream + object-stream layout,
    * or the hybrid-reference layout. */
  private def finish(b: Builder, pagesObj: Int, pageObjs: Seq[Int],
      layout: String = "classic"): Array[Byte] = {
    b.set(pagesObj, s"<< /Type /Pages /Kids [${pageObjs.map(p => s"$p 0 R").mkString(" ")}] " +
      s"/Count ${pageObjs.length} >>")
    val catalog = b.add(s"<< /Type /Catalog /Pages $pagesObj 0 R >>")
    layout match {
      case "classic"     => b.build(catalog)
      case "xref-stream" => b.buildXrefStream(catalog)
      case "hybrid"      => b.buildHybrid(catalog)
      case other         => throw new IllegalArgumentException(s"layout: $other")
    }
  }
}
