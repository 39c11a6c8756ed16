package graft.sources

import java.awt.{BasicStroke, Color, Graphics2D, RenderingHints}
import java.awt.font.FontRenderContext
import java.awt.geom.{AffineTransform, Area, Path2D}
import java.awt.image.BufferedImage
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Inflater

import scala.collection.mutable

/** Built-in pure-JVM PDF rasterizer for a DOCUMENTED SUBSET of the format
  * (ISO 32000-1), closing the S2 render boundary
  * (`preprocessing/pdf_to_images.py:6-76` renders with PyMuPDF; no PDF
  * library ships in this sandbox's jars, so the reference call is
  * re-expressed directly on java.desktop). `PdfIngest.renderPdf` dispatches
  * PDFBox (when a jar is present) → this rasterizer → deterministic stub,
  * so anything outside the subset degrades honestly, never silently.
  *
  * Supported subset — chosen to cover what invoice-generation tooling
  * actually emits (vector text + rules + logos):
  *  - classic cross-reference tables (with /Prev chains), PDF 1.5+
  *    cross-reference STREAMS (/Type /XRef, /W-packed binary entries,
  *    /Index subsections, any supported /Filter+predictor) and object
  *    streams (/Type /ObjStm type-2 entries — the layout every modern
  *    writer emits), including hybrid-reference files (/XRefStm processed
  *    before /Prev); /Extends chains → `Unsupported`
  *  - filters: none, /FlateDecode, /LZWDecode (both with PNG predictors
  *    10–15 and TIFF predictor 2 at 8 bpc), /ASCIIHexDecode,
  *    /ASCII85Decode, /RunLengthDecode, /DCTDecode for image XObjects;
  *    everything else (JBIG2/JPX/CCITT/Crypt) → `Unsupported`
  *  - content: path construction (m l c v y h re), painting (S s f F f* B
  *    B* b b* n), clipping (W W*), graphics state (q Q cm w), device color
  *    spaces (g G rg RG k K, cs/CS + sc/scn/SC/SCN on /DeviceGray, RGB,
  *    CMYK), text (BT ET Tf Td TD Tm T* TL Tc Tw Tz Ts Tr Tj TJ ' "),
  *    image + form XObjects (Do), INLINE images (BI/ID/EI with the
  *    abbreviated keys, §8.9.7 — unfiltered data sliced by the exact
  *    computed length, filtered data by the EI sentinel scan; same
  *    color-space/bpc subset as image XObjects), dash patterns (d —
  *    user-space lengths/phase device-scaled with the line width),
  *    marked content ignored, BX/EX honored
  *  - simple fonts, mapped onto JVM logical fonts by /BaseFont name
  *    (Helvetica/Arial→SansSerif, Times→Serif, Courier→Monospaced); glyph
  *    ADVANCES use the font dict's /Widths array when present (spec-exact
  *    show-string layout) and the JVM font's metrics otherwise; glyph
  *    SHAPES are always the JVM font's — embedded font programs are not
  *    interpreted. Type0/CID and Type3 fonts → `Unsupported`
  *  - /Rotate 0/90/180/270, per-page MediaBox with page-tree inheritance
  *  - encryption, shadings, patterns, transparency groups, ExtGState
  *    side effects (soft masks, alpha) are out:
  *    encryption/shading/pattern → `Unsupported`; gs and join/cap/miter
  *    parameters are accepted and ignored (opaque rendering, JVM default
  *    caps/joins), documented divergence
  *
  * Geometry is PyMuPDF's: a page of W×H points renders to
  * `round(W·dpi/72) × round(H·dpi/72)` pixels (`fitz.Matrix(dpi/72)`),
  * white background, y-axis flipped (PDF origin is bottom-left).
  */
object PdfRaster {

  final class Unsupported(msg: String) extends RuntimeException(msg)

  // ---------------- object model ----------------
  sealed trait Obj
  final case class PNum(v: Double) extends Obj
  final case class PBool(v: Boolean) extends Obj
  case object PNull extends Obj
  final case class PStr(v: Array[Byte]) extends Obj
  final case class PName(v: String) extends Obj
  final case class PArr(v: Vector[Obj]) extends Obj
  final case class PDict(v: Map[String, Obj]) extends Obj
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  /** Render every page at `dpi`; returns (widthPx, heightPx, pngBytes) per
    * page. Throws `Unsupported` (or a parse exception) on anything outside
    * the subset — callers fall back (see `PdfIngest.renderPdf`). */
  def render(bytes: Array[Byte], dpi: Int): Seq[(Int, Int, Array[Byte])] = {
    val doc = new Doc(bytes)
    doc.pages.map { page =>
      val mb = page.mediaBox
      val wPts = mb(2) - mb(0)
      val hPts = mb(3) - mb(1)
      val scale = dpi / 72.0
      val rot = ((page.rotate % 360) + 360) % 360
      val (wPx, hPx) =
        if (rot == 90 || rot == 270)
          (math.round(hPts * scale).toInt.max(1), math.round(wPts * scale).toInt.max(1))
        else (math.round(wPts * scale).toInt.max(1), math.round(hPts * scale).toInt.max(1))
      val img = new BufferedImage(wPx, hPx, BufferedImage.TYPE_INT_RGB)
      val g2 = img.createGraphics()
      try {
        g2.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
        g2.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING, RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
        g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION, RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.setColor(Color.WHITE)
        g2.fillRect(0, 0, wPx, hPx)
        // page points → device pixels: flip y, honor /Rotate
        val base = new AffineTransform()
        rot match {
          case 90  => base.translate(wPx, 0); base.rotate(math.Pi / 2)
          case 180 => base.translate(wPx, hPx); base.rotate(math.Pi)
          case 270 => base.translate(0, hPx); base.rotate(-math.Pi / 2)
          case _   => ()
        }
        base.concatenate(new AffineTransform(scale, 0, 0, -scale, -mb(0) * scale, mb(3) * scale))
        val content = page.contents
        new Interp(doc, g2, base, page.resources, depth = 0).exec(content)
      } finally g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (wPx, hPx, bos.toByteArray)
    }
  }

  // ---------------- lexer ----------------
  private sealed trait Tok
  private case object TDictOpen extends Tok
  private case object TDictClose extends Tok
  private case object TArrOpen extends Tok
  private case object TArrClose extends Tok
  private final case class TName(v: String) extends Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TStr(v: Array[Byte]) extends Tok
  private final case class TKw(v: String) extends Tok
  private case object TEof extends Tok

  private final class Lexer(val bytes: Array[Byte], var pos: Int) {
    private var pushed: List[Tok] = Nil
    def push(t: Tok): Unit = pushed ::= t

    private def isWs(b: Int) = b == 0 || b == 9 || b == 10 || b == 12 || b == 13 || b == 32
    private def isDelim(b: Int) =
      b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'
    private def isRegular(b: Int) = !isWs(b) && !isDelim(b)

    // ---- inline-image raw byte access (BI…ID…EI, §8.9.7) ----
    /** The single whitespace byte the spec puts between ID and the data. */
    def skipOneWs(): Unit =
      if (pos < bytes.length && isWs(bytes(pos) & 0xff)) pos += 1
    def takeBytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > bytes.length)
        throw new Unsupported("inline image: truncated data")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
    /** Filtered inline-image data: scan for the EI sentinel (at data start
      * or after whitespace, followed by ws/delimiter/EOF); the single
      * whitespace before EI is not part of the data. */
    def scanEI(): Array[Byte] = {
      val start = pos
      var i = pos
      while (i + 1 < bytes.length) {
        if (bytes(i) == 'E' && bytes(i + 1) == 'I' &&
            (i == start || isWs(bytes(i - 1) & 0xff)) &&
            (i + 2 >= bytes.length || isWs(bytes(i + 2) & 0xff) ||
              isDelim(bytes(i + 2) & 0xff))) {
          val end = if (i > start && isWs(bytes(i - 1) & 0xff)) i - 1 else i
          val a = java.util.Arrays.copyOfRange(bytes, start, end)
          pos = i + 2
          return a
        }
        i += 1
      }
      throw new Unsupported("inline image: no EI terminator")
    }

    def skipWs(): Unit = {
      while (pos < bytes.length) {
        val b = bytes(pos) & 0xff
        if (isWs(b)) pos += 1
        else if (b == '%') { while (pos < bytes.length && bytes(pos) != '\n' && bytes(pos) != '\r') pos += 1 }
        else return
      }
    }

    def next(): Tok = {
      if (pushed.nonEmpty) { val t = pushed.head; pushed = pushed.tail; return t }
      skipWs()
      if (pos >= bytes.length) return TEof
      val b = bytes(pos) & 0xff
      b match {
        case '<' =>
          if (pos + 1 < bytes.length && bytes(pos + 1) == '<') { pos += 2; TDictOpen }
          else { pos += 1; TStr(hexString()) }
        case '>' =>
          if (pos + 1 < bytes.length && bytes(pos + 1) == '>') { pos += 2; TDictClose }
          else throw new Unsupported("stray '>'")
        case '[' => pos += 1; TArrOpen
        case ']' => pos += 1; TArrClose
        case '/' => pos += 1; TName(name())
        case '(' => pos += 1; TStr(litString())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          TNum(number())
        case _ =>
          val sb = new StringBuilder
          while (pos < bytes.length && isRegular(bytes(pos) & 0xff)) { sb.append((bytes(pos) & 0xff).toChar); pos += 1 }
          if (sb.isEmpty) throw new Unsupported(s"lex error at $pos (0x${b.toHexString})")
          TKw(sb.toString)
      }
    }

    private def name(): String = {
      val sb = new StringBuilder
      while (pos < bytes.length && isRegular(bytes(pos) & 0xff)) {
        val c = bytes(pos) & 0xff
        if (c == '#' && pos + 2 < bytes.length) {
          sb.append(Integer.parseInt(new String(bytes, pos + 1, 2, ISO_8859_1), 16).toChar)
          pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      sb.toString
    }

    private def number(): Double = {
      val start = pos
      if (bytes(pos) == '+' || bytes(pos) == '-') pos += 1
      while (pos < bytes.length && ((bytes(pos) >= '0' && bytes(pos) <= '9') || bytes(pos) == '.')) pos += 1
      new String(bytes, start, pos - start, ISO_8859_1).toDouble
    }

    private def hexString(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (pos < bytes.length && bytes(pos) != '>') {
        val c = bytes(pos) & 0xff
        val d = Character.digit(c, 16)
        if (d >= 0) { if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 } }
        pos += 1
      }
      if (hi >= 0) out.write(hi * 16)
      pos += 1 // '>'
      out.toByteArray
    }

    private def litString(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (pos < bytes.length && depth > 0) {
        val c = bytes(pos) & 0xff
        pos += 1
        c match {
          case '\\' if pos < bytes.length =>
            val e = bytes(pos) & 0xff; pos += 1
            e match {
              case 'n' => out.write('\n'); case 'r' => out.write('\r')
              case 't' => out.write('\t'); case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('('); case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (pos < bytes.length && bytes(pos) == '\n') pos += 1 // continuation
              case '\n' => () // continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 0
                while (k < 2 && pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '7') {
                  v = v * 8 + (bytes(pos) - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other)
            }
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case other => out.write(other)
        }
      }
      out.toByteArray
    }

    /** Parse one object at the current token position. */
    def parseObject(): Obj = next() match {
      case TDictOpen =>
        val m = mutable.LinkedHashMap[String, Obj]()
        var t = next()
        while (t != TDictClose) {
          t match {
            case TName(k) => m(k) = parseObject()
            case other    => throw new Unsupported(s"dict key expected, got $other")
          }
          t = next()
        }
        PDict(m.toMap)
      case TArrOpen =>
        val v = Vector.newBuilder[Obj]
        var t = next()
        while (t != TArrClose) { push(t); v += parseObject(); t = next() }
        PArr(v.result())
      case TName(n) => PName(n)
      case TStr(s)  => PStr(s)
      case TNum(n) =>
        // lookahead for "num gen R"
        val t2 = next()
        t2 match {
          case TNum(g) =>
            val t3 = next()
            t3 match {
              case TKw("R") => PRef(n.toInt, g.toInt)
              case other    => push(other); push(t2); PNum(n)
            }
          case other => push(other); PNum(n)
        }
      case TKw("true")  => PBool(true)
      case TKw("false") => PBool(false)
      case TKw("null")  => PNull
      case other => throw new Unsupported(s"unexpected token $other")
    }
  }

  // ---------------- document ----------------
  private final case class Page(mediaBox: Array[Double], rotate: Int,
      resources: PDict, contents: Array[Byte])

  /** Where an object lives: at a byte offset (classic / xref-stream type-1
    * entries) or inside an object stream (type-2 entries, PDF 1.5+). */
  private sealed trait XEntry
  private final case class XOffset(off: Long) extends XEntry
  private final case class XInStream(streamNum: Int, idx: Int) extends XEntry
  private case object XFree extends XEntry // deleted in a NEWER section: must shadow older in-use entries

  private final class Doc(bytes: Array[Byte]) {
    private val xref = mutable.HashMap[Int, XEntry]()
    private var trailer: PDict = PDict(Map.empty)
    loadXref()

    /** Follows the startxref chain. Each section is either a classic
      * `xref` table + `trailer` dict, or (PDF 1.5+) a cross-reference
      * STREAM whose dict doubles as the trailer. Sections are processed
      * newest-first with first-wins entry merging (an updated object's
      * newest location shadows older ones); a hybrid-reference file's
      * /XRefStm is processed before its /Prev, the spec's precedence. */
    private def loadXref(): Unit = {
      val tail = new String(bytes, math.max(0, bytes.length - 2048),
        math.min(2048, bytes.length), ISO_8859_1)
      val i = tail.lastIndexOf("startxref")
      if (i < 0) throw new Unsupported("no startxref")
      val off0 = """\d+""".r.findFirstIn(tail.substring(i + 9)).getOrElse(
        throw new Unsupported("bad startxref")).toLong
      var first = true
      val seen = mutable.HashSet[Long]()
      val pending = mutable.Queue[Long](off0)
      while (pending.nonEmpty) {
        val off = pending.dequeue()
        if (off >= 0 && seen.add(off)) {
          val lx = new Lexer(bytes, off.toInt)
          val tr = lx.next() match {
            case TKw("xref") =>
              // classic table: buffer the subsections, then record them
              // AFTER this section's own /XRefStm (if any) — in a hybrid
              // file the stream's entries take precedence over the classic
              // section that points at it (spec 7.5.8.4), and free entries
              // are tombstones under first-wins merging: an object deleted
              // by an incremental update must not be resurrected from an
              // older section's in-use entry
              val local = mutable.ArrayBuffer.empty[(Int, XEntry)]
              var t = lx.next()
              while (t != TKw("trailer")) {
                val start = t match { case TNum(n) => n.toInt; case o => throw new Unsupported(s"xref subsection: $o") }
                val count = lx.next() match { case TNum(n) => n.toInt; case o => throw new Unsupported(s"xref count: $o") }
                var k = 0
                while (k < count) {
                  val o = lx.next() match { case TNum(n) => n.toLong; case x => throw new Unsupported(s"xref entry: $x") }
                  lx.next() // gen
                  lx.next() match {
                    case TKw("n") => local += ((start + k, XOffset(o)))
                    case TKw("f") => local += ((start + k, XFree))
                    case x        => throw new Unsupported(s"xref flag: $x")
                  }
                  k += 1
                }
                t = lx.next()
              }
              val d = lx.parseObject() match {
                case d: PDict => d
                case o        => throw new Unsupported(s"trailer: $o")
              }
              d.v.get("XRefStm").foreach {
                case PNum(p) if p.toLong >= 0 && seen.add(p.toLong) =>
                  val xtr = parseXrefStreamAt(p.toLong)
                  if (xtr.v.contains("Encrypt")) throw new Unsupported("encrypted PDF")
                  xtr.v.get("Prev").foreach { case PNum(q) => pending.enqueue(q.toLong); case _ => () }
                case _ => ()
              }
              local.foreach { case (n, e) => if (!xref.contains(n)) xref(n) = e }
              d
            case TNum(_) => parseXrefStreamAt(off)
            case other   => throw new Unsupported(s"bad xref at $off: $other")
          }
          if (first) { trailer = tr; first = false }
          if (tr.v.contains("Encrypt")) throw new Unsupported("encrypted PDF")
          tr.v.get("Prev").foreach { case PNum(p) => pending.enqueue(p.toLong); case _ => () }
        }
      }
    }

    /** PDF 1.5+ cross-reference stream at `off` (`N G obj << /Type /XRef
      * /W [w1 w2 w3] ... >> stream`): binary rows of /W-sized big-endian
      * fields over the /Index subsections (default [0 /Size]); type 1 =
      * offset, type 2 = (object stream, index), others free/ignored. The
      * stream's own /Length and /Filter must be direct (they are by
      * construction — the xref isn't loaded yet). Returns the dict, which
      * is also the section's trailer. */
    private def parseXrefStreamAt(off: Long): PDict = {
      val lx = new Lexer(bytes, off.toInt)
      (lx.next(), lx.next(), lx.next()) match {
        case (TNum(_), TNum(_), TKw("obj")) => ()
        case other => throw new Unsupported(s"bad xref stream header at $off: $other")
      }
      val d = lx.parseObject() match {
        case d: PDict => d
        case o        => throw new Unsupported(s"xref stream dict: $o")
      }
      lx.next() match {
        case TKw("stream") => ()
        case o             => throw new Unsupported(s"xref stream body: $o")
      }
      var p = lx.pos
      if (p < bytes.length && bytes(p) == '\r') p += 1
      if (p < bytes.length && bytes(p) == '\n') p += 1
      val len = d.v.get("Length") match {
        case Some(PNum(n)) => n.toInt
        case _ => throw new Unsupported("xref stream: /Length must be direct")
      }
      val data = decoded(PStream(d, java.util.Arrays.copyOfRange(bytes, p, p + len)))
      val ws = d.v.get("W") match {
        case Some(PArr(a)) if a.length >= 3 =>
          a.take(3).map { case PNum(n) => n.toInt; case o => throw new Unsupported(s"/W: $o") }
        case o => throw new Unsupported(s"xref stream /W: $o")
      }
      val size = d.v.get("Size") match {
        case Some(PNum(n)) => n.toInt
        case o             => throw new Unsupported(s"xref stream /Size: $o")
      }
      val index: Vector[(Int, Int)] = d.v.get("Index") match {
        case Some(PArr(a)) =>
          a.map { case PNum(n) => n.toInt; case o => throw new Unsupported(s"/Index: $o") }
            .grouped(2).collect { case Vector(s, c) => (s, c) }.toVector
        case None => Vector((0, size))
        case o    => throw new Unsupported(s"xref stream /Index: $o")
      }
      var pos = 0
      def field(w: Int): Long = {
        var v = 0L; var j = 0
        while (j < w) { v = (v << 8) | (data(pos) & 0xff); pos += 1; j += 1 }
        v
      }
      val rowBytes = ws.sum
      for ((start, count) <- index; k <- 0 until count) {
        if (pos + rowBytes > data.length)
          throw new Unsupported("xref stream: truncated entry data")
        val typ = if (ws(0) == 0) 1L else field(ws(0)) // default type 1 per spec
        val f2 = field(ws(1))
        val f3 = field(ws(2))
        val num = start + k
        typ match {
          case 0 => if (!xref.contains(num)) xref(num) = XFree // free claims the slot (first-wins)
          case 1 => if (!xref.contains(num)) xref(num) = XOffset(f2)
          case 2 => if (!xref.contains(num)) xref(num) = XInStream(f2.toInt, f3.toInt)
          case _ => () // unknown types are to be ignored (spec 7.5.8.3)
        }
      }
      d
    }

    def resolve(o: Obj): Obj = {
      // iterative with a depth cap: `1 0 obj 2 0 R endobj` chains (or
      // cycles) in a corrupt/hostile file must surface as Unsupported —
      // which renderPdf catches and degrades to the warned stub — not as
      // a fatal StackOverflowError that kills the whole ingest job
      var cur = o
      var depth = 0
      while (cur.isInstanceOf[PRef]) {
        if (depth >= 64) throw new Unsupported("indirect reference chain too deep (cycle?)")
        cur = objectAt(cur.asInstanceOf[PRef].num)
        depth += 1
      }
      cur
    }

    // compute-then-put (NOT getOrElseUpdate): loading an object can recurse
    // into objectAt (indirect /Length, the object stream a type-2 entry
    // names), and nested modification inside getOrElseUpdate's callback is
    // undefined for mutable.HashMap. `loading` detects re-entrant loads of
    // an object whose OWN definition (indirect /Length, ObjStm chain)
    // cycles back to itself — Unsupported, not unbounded recursion.
    private val cache = mutable.HashMap[Int, Obj]()
    private val loading = mutable.HashSet[Int]()
    private def objectAt(num: Int): Obj = cache.get(num) match {
      case Some(o) => o
      case None =>
        if (!loading.add(num))
          throw new Unsupported(s"cyclic load of object $num")
        try {
          val v = xref.getOrElse(num, throw new Unsupported(s"unresolved object $num")) match {
            case XFree                    => PNull // deleted: references resolve to null (spec 7.3.10)
            case XOffset(off)             => objectAtOffset(off)
            case XInStream(streamNum, _)  =>
              objStmMembers(streamNum).getOrElse(num,
                throw new Unsupported(s"object $num not found in ObjStm $streamNum"))
          }
          cache(num) = v
          v
        } finally loading.remove(num)
    }

    private def objectAtOffset(off: Long): Obj = {
      val lx = new Lexer(bytes, off.toInt)
      (lx.next(), lx.next(), lx.next()) match {
        case (TNum(_), TNum(_), TKw("obj")) => ()
        case other => throw new Unsupported(s"bad object header at $off: $other")
      }
      val obj = lx.parseObject()
      lx.next() match {
        case TKw("stream") =>
          val d = obj match { case d: PDict => d; case o => throw new Unsupported(s"stream without dict: $o") }
          // exactly one EOL after 'stream'
          var p = lx.pos
          if (p < bytes.length && bytes(p) == '\r') p += 1
          if (p < bytes.length && bytes(p) == '\n') p += 1
          val len = resolve(d.v.getOrElse("Length", throw new Unsupported("stream missing /Length"))) match {
            case PNum(n) => n.toInt
            case o       => throw new Unsupported(s"/Length: $o")
          }
          PStream(d, java.util.Arrays.copyOfRange(bytes, p, p + len))
        case other => lx.push(other); obj
      }
    }

    /** Parsed members of one object stream (/Type /ObjStm, PDF 1.5+):
      * the first /First bytes of the decoded payload are /N (objNum,
      * byte-offset) integer pairs; each member object is parsed at
      * /First + offset. Members are plain objects (a stream can never
      * live inside an ObjStm — its xref entry must be type 1), and the
      * whole stream is decoded once and memoized. /Extends chains are out
      * of subset (→ Unsupported via the member-lookup miss). */
    private val objStmCache = mutable.HashMap[Int, Map[Int, Obj]]()
    private def objStmMembers(streamNum: Int): Map[Int, Obj] =
      objStmCache.get(streamNum) match {
        case Some(m) => m
        case None =>
          val s = objectAt(streamNum) match {
            case s: PStream => s
            case o => throw new Unsupported(s"ObjStm $streamNum is not a stream: $o")
          }
          val data = decoded(s)
          def intEntry(key: String): Int =
            resolve(s.dict.v.getOrElse(key, throw new Unsupported(s"ObjStm missing /$key"))) match {
              case PNum(n) => n.toInt
              case o       => throw new Unsupported(s"ObjStm /$key: $o")
            }
          val n = intEntry("N")
          val first = intEntry("First")
          val hdr = new Lexer(data, 0)
          val pairs = (0 until n).map { _ =>
            val num = hdr.next() match { case TNum(v) => v.toInt; case o => throw new Unsupported(s"ObjStm header: $o") }
            val off = hdr.next() match { case TNum(v) => v.toInt; case o => throw new Unsupported(s"ObjStm header: $o") }
            (num, off)
          }
          val m = pairs.map { case (num, off) =>
            num -> new Lexer(data, first + off).parseObject()
          }.toMap
          objStmCache(streamNum) = m
          m
      }

    /** Fully decoded stream payload (filters applied). */
    def decoded(s: PStream): Array[Byte] = {
      val filters = resolve(s.dict.v.getOrElse("Filter", PNull)) match {
        case PNull      => Vector.empty
        case PName(n)   => Vector(n)
        case PArr(a)    => a.map { case PName(n) => n; case o => throw new Unsupported(s"filter: $o") }
        case o          => throw new Unsupported(s"/Filter: $o")
      }
      val parms: Vector[Obj] = resolve(s.dict.v.getOrElse("DecodeParms", PNull)) match {
        case PNull     => Vector.fill(filters.length)(PNull)
        case d: PDict  => Vector(d)
        case PArr(a)   => a
        case o         => throw new Unsupported(s"/DecodeParms: $o")
      }
      filters.zipWithIndex.foldLeft(s.raw) { case (data, (f, i)) =>
        val parm = resolve(parms.applyOrElse(i, (_: Int) => PNull))
        def parmInt(key: String, dflt: Int): Int = parm match {
          case PDict(pm) => pm.get(key).map { case PNum(n) => n.toInt; case _ => dflt }.getOrElse(dflt)
          case _         => dflt
        }
        val decodedData = f match {
          case "FlateDecode"     => inflate(data)
          case "LZWDecode"       => lzwDecode(data, parmInt("EarlyChange", 1))
          case "ASCIIHexDecode"  => asciiHexDecode(data)
          case "ASCII85Decode"   => ascii85Decode(data)
          case "RunLengthDecode" => runLengthDecode(data)
          case other             => throw new Unsupported(s"filter /$other")
        }
        // predictors apply to FlateDecode AND LZWDecode payloads
        val pred = parmInt("Predictor", 1)
        if (pred <= 1) decodedData
        else {
          val cols = parmInt("Columns", 1)
          val colors = parmInt("Colors", 1)
          val bpc = parmInt("BitsPerComponent", 8)
          if (pred >= 10) pngUnpredict(decodedData, cols, colors, bpc)
          else if (pred == 2 && bpc == 8) tiffUnpredict(decodedData, cols, colors)
          else throw new Unsupported(s"predictor $pred (bpc $bpc)")
        }
      }
    }

    /** PDF LZW (TIFF variant): 9→12-bit big-endian codes, 256 = clear
      * table, 257 = EOD; with /EarlyChange 1 (the default) the code width
      * grows one code early. */
    private def lzwDecode(data: Array[Byte], earlyChange: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(data.length * 3)
      val dict = mutable.ArrayBuffer[Array[Byte]]()
      def resetDict(): Unit = {
        dict.clear()
        var i = 0
        while (i < 256) { dict += Array(i.toByte); i += 1 }
        dict += Array.emptyByteArray // 256 (clear) placeholder
        dict += Array.emptyByteArray // 257 (EOD) placeholder
      }
      resetDict()
      var bitPos = 0
      def nextCode(width: Int): Int =
        if (bitPos + width > data.length * 8) 257 // treat truncation as EOD
        else {
          var v = 0; var k = 0
          while (k < width) {
            val bi = bitPos + k
            v = (v << 1) | ((data(bi >> 3) >> (7 - (bi & 7))) & 1)
            k += 1
          }
          bitPos += width
          v
        }
      var width = 9
      var prev: Array[Byte] = null
      var done = false
      while (!done) {
        val code = nextCode(width)
        if (code == 257) done = true
        else if (code == 256) { resetDict(); width = 9; prev = null }
        else {
          val entry =
            if (code < dict.length) dict(code)
            else if (code == dict.length && prev != null) prev :+ prev(0)
            else throw new Unsupported(s"LZW: code $code beyond table ${dict.length}")
          out.write(entry)
          if (prev != null) dict += (prev :+ entry(0))
          prev = entry
          // spec/pdf.js/PDFBox timing: the width grows when the table size
          // reaches 2^width − EarlyChange (511 for 9→10 bits at the default
          // EarlyChange 1) — one code EARLIER than the naive 512 boundary;
          // a one-late decoder desyncs against every real encoder's stream
          if (dict.length + earlyChange >= (1 << width) && width < 12) width += 1
        }
      }
      out.toByteArray
    }

    private def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var i = 0
      var done = false
      while (i < data.length && !done) {
        val c = data(i) & 0xff
        if (c == '>') done = true
        else {
          val d = Character.digit(c, 16)
          if (d >= 0) { if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 } }
          else if (!(c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32))
            throw new Unsupported(s"ASCIIHexDecode: 0x${c.toHexString}")
        }
        i += 1
      }
      if (hi >= 0) out.write(hi * 16) // odd final digit: low nibble = 0
      out.toByteArray
    }

    private def ascii85Decode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var tuple = 0L; var count = 0
      var i = 0
      var done = false
      def emit(n: Int): Unit = {
        val b = Array(((tuple >> 24) & 0xff).toByte, ((tuple >> 16) & 0xff).toByte,
          ((tuple >> 8) & 0xff).toByte, (tuple & 0xff).toByte)
        out.write(b, 0, n)
        tuple = 0; count = 0
      }
      while (i < data.length && !done) {
        val c = data(i) & 0xff
        if (c == '~') done = true // '~>' EOD
        else if (c == 'z' && count == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
        else if (c >= '!' && c <= 'u') {
          tuple = tuple * 85 + (c - '!'); count += 1
          if (count == 5) emit(4)
        } else if (!(c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32))
          throw new Unsupported(s"ASCII85Decode: 0x${c.toHexString}")
        i += 1
      }
      if (count > 0) { // partial group: pad with 'u' (84), keep count-1 bytes
        val have = count
        while (count < 5) { tuple = tuple * 85 + 84; count += 1 }
        emit(have - 1)
      }
      out.toByteArray
    }

    private def runLengthDecode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(data.length * 2)
      var i = 0
      while (i < data.length) {
        val l = data(i) & 0xff; i += 1
        if (l == 128) i = data.length // EOD
        else if (l < 128) { out.write(data, i, math.min(l + 1, data.length - i)); i += l + 1 }
        else if (i < data.length) {
          val b = data(i) & 0xff; i += 1
          var k = 0
          while (k < 257 - l) { out.write(b); k += 1 }
        }
      }
      out.toByteArray
    }

    /** TIFF predictor 2 at 8 bits/component: horizontal differencing per
      * `cols`-pixel row, component-wise. */
    private def tiffUnpredict(data: Array[Byte], cols: Int, colors: Int): Array[Byte] = {
      val rowBytes = cols * colors
      var r = 0
      while ((r + 1) * rowBytes <= data.length) {
        var i = r * rowBytes + colors
        while (i < (r + 1) * rowBytes) {
          data(i) = (data(i) + data(i - colors)).toByte
          i += 1
        }
        r += 1
      }
      data
    }

    private def inflate(data: Array[Byte]): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      // loop on finished() ONLY: zlib can hold pending output after all
      // input bytes are absorbed into its bit buffer (needsInput() true),
      // so exiting on needsInput() would silently truncate payloads whose
      // final bytes land mid back-reference; n == 0 with needsInput is the
      // genuine truncation signal
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary())
          throw new Unsupported("flate: truncated")
      }
      inf.end()
      out.toByteArray
    }

    private def pngUnpredict(data: Array[Byte], cols: Int, colors: Int, bpc: Int): Array[Byte] = {
      val bpp = math.max(1, colors * bpc / 8)
      val rowLen = (cols * colors * bpc + 7) / 8
      val rows = data.length / (rowLen + 1)
      val out = new Array[Byte](rows * rowLen)
      var r = 0
      while (r < rows) {
        val tag = data(r * (rowLen + 1)) & 0xff
        val src = r * (rowLen + 1) + 1
        val dst = r * rowLen
        var i = 0
        while (i < rowLen) {
          val raw = data(src + i) & 0xff
          val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
          val up = if (r > 0) out(dst - rowLen + i) & 0xff else 0
          val ul = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
          val v = tag match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case t => throw new Unsupported(s"png predictor tag $t")
          }
          out(dst + i) = (v & 0xff).toByte
          i += 1
        }
        r += 1
      }
      out
    }

    def pages: Seq[Page] = {
      val root = resolve(trailer.v.getOrElse("Root", throw new Unsupported("no /Root"))) match {
        case d: PDict => d; case o => throw new Unsupported(s"/Root: $o")
      }
      val top = resolve(root.v.getOrElse("Pages", throw new Unsupported("no /Pages"))) match {
        case d: PDict => d; case o => throw new Unsupported(s"/Pages: $o")
      }
      val out = Vector.newBuilder[Page]
      def walk(node: PDict, mb: Option[Array[Double]], res: Option[PDict],
          rot: Int, depth: Int): Unit = {
        if (depth > 32) throw new Unsupported("page tree too deep")
        val mb2 = node.v.get("MediaBox").map(o => resolve(o) match {
          case PArr(a) if a.length == 4 =>
            a.map(x => resolve(x) match { case PNum(n) => n; case _ => throw new Unsupported("MediaBox") }).toArray
          case _ => throw new Unsupported("MediaBox")
        }).orElse(mb)
        val res2 = node.v.get("Resources").map(o => resolve(o) match {
          case d: PDict => d; case _ => throw new Unsupported("Resources")
        }).orElse(res)
        val rot2 = node.v.get("Rotate").map(o => resolve(o) match {
          case PNum(n) => n.toInt; case _ => 0
        }).getOrElse(rot)
        resolve(node.v.getOrElse("Type", PNull)) match {
          case PName("Page") =>
            val content = resolve(node.v.getOrElse("Contents", PNull)) match {
              case s: PStream => decoded(s)
              case PArr(a) =>
                val bos = new java.io.ByteArrayOutputStream()
                a.foreach { c =>
                  resolve(c) match {
                    case s: PStream => bos.write(decoded(s)); bos.write('\n')
                    case o          => throw new Unsupported(s"content: $o")
                  }
                }
                bos.toByteArray
              case PNull => Array.emptyByteArray
              case o     => throw new Unsupported(s"content: $o")
            }
            out += Page(mb2.getOrElse(Array(0d, 0d, 612d, 792d)), rot2,
              res2.getOrElse(PDict(Map.empty)), content)
          case _ =>
            resolve(node.v.getOrElse("Kids", PArr(Vector.empty))) match {
              case PArr(kids) => kids.foreach { k =>
                resolve(k) match {
                  case d: PDict => walk(d, mb2, res2, rot2, depth + 1)
                  case o        => throw new Unsupported(s"page kid: $o")
                }
              }
              case o => throw new Unsupported(s"/Kids: $o")
            }
        }
      }
      walk(top, None, None, 0, 0)
      out.result()
    }
  }

  // ---------------- content interpreter ----------------
  private final class GState {
    var ctm = new AffineTransform()
    var fill: Color = Color.BLACK
    var stroke: Color = Color.BLACK
    var lineWidth: Double = 1.0
    /** `d` dash pattern: (lengths in user space, phase); None = solid. */
    var dash: Option[(Array[Double], Double)] = None
    var clip: Option[Area] = None
    var fontName: String = "SansSerif"
    var fontStyle: Int = java.awt.Font.PLAIN
    var widths: Option[(Int, Array[Double])] = None // (firstChar, /Widths)
    var fs: Double = 0; var tc: Double = 0; var tw: Double = 0
    var th: Double = 1; var tl: Double = 0; var ts: Double = 0; var tr: Int = 0
    def copy(): GState = {
      val g = new GState()
      g.ctm = new AffineTransform(ctm); g.fill = fill; g.stroke = stroke
      g.lineWidth = lineWidth; g.clip = clip.map(a => new Area(a))
      g.dash = dash
      g.fontName = fontName; g.fontStyle = fontStyle; g.widths = widths
      g.fs = fs; g.tc = tc; g.tw = tw; g.th = th; g.tl = tl; g.ts = ts; g.tr = tr
      g
    }
  }

  private val Ignorable = Set("gs", "ri", "i", "j", "J", "M",
    "BMC", "BDC", "EMC", "MP", "DP")

  private final class Interp(doc: Doc, g2: Graphics2D, base: AffineTransform,
      resources: PDict, depth: Int) {
    if (depth > 8) throw new Unsupported("form XObject recursion too deep")
    private var st = new GState()
    private val stack = mutable.Stack[GState]()
    private var path = new Path2D.Double() // in PAGE space (ctm applied at construction)
    private var curX = 0.0; private var curY = 0.0
    private var startX = 0.0; private var startY = 0.0
    private var pendingClip: Option[Int] = None
    private var tm = new AffineTransform(); private var tlm = new AffineTransform()
    private var compat = 0
    private val frc = new FontRenderContext(null, true, true)

    def withInitial(g: GState): this.type = { st = g; this }

    private def resDict(kind: String): Map[String, Obj] =
      doc.resolve(resources.v.getOrElse(kind, PNull)) match {
        case PDict(m) => m
        case _        => Map.empty
      }

    private def num(o: Obj): Double = o match {
      case PNum(n) => n
      case other   => throw new Unsupported(s"number expected: $other")
    }

    private def tp(x: Double, y: Double): (Double, Double) = {
      val p = new java.awt.geom.Point2D.Double(x, y)
      st.ctm.transform(p, p)
      (p.getX, p.getY)
    }

    def exec(content: Array[Byte]): Unit = {
      val lx = new Lexer(content, 0)
      val ops = mutable.ArrayBuffer[Obj]()
      var tok = lx.next()
      while (tok != TEof) {
        tok match {
          case TKw(op)  => execOp(op, ops, lx); ops.clear()
          case other    => lx.push(other); ops += lx.parseObject()
        }
        tok = lx.next()
      }
    }

    private def execOp(op: String, o: mutable.ArrayBuffer[Obj], lx: Lexer): Unit = op match {
      // ---- graphics state ----
      case "q" => stack.push(st.copy())
      case "Q" => if (stack.nonEmpty) st = stack.pop()
      case "cm" =>
        st.ctm.concatenate(new AffineTransform(num(o(0)), num(o(1)), num(o(2)),
          num(o(3)), num(o(4)), num(o(5))))
      case "w" => st.lineWidth = num(o(0))
      case "d" =>
        // dash pattern [lengths] phase (user-space units, scaled with the
        // line width at stroke time); [] 0 — or an all-zero array, which
        // ISO 32000 treats as solid — resets
        val lens = o(0) match {
          case PArr(a) => a.map(num).toArray
          case x       => throw new Unsupported(s"d: $x")
        }
        st.dash =
          if (lens.isEmpty || lens.sum <= 0 || lens.exists(_ < 0)) None
          else Some((lens, num(o(1))))
      // ---- color ----
      case "g" => st.fill = gray(num(o(0)))
      case "G" => st.stroke = gray(num(o(0)))
      case "rg" => st.fill = rgb(num(o(0)), num(o(1)), num(o(2)))
      case "RG" => st.stroke = rgb(num(o(0)), num(o(1)), num(o(2)))
      case "k" => st.fill = cmyk(num(o(0)), num(o(1)), num(o(2)), num(o(3)))
      case "K" => st.stroke = cmyk(num(o(0)), num(o(1)), num(o(2)), num(o(3)))
      case "cs" | "CS" =>
        o(0) match {
          case PName("DeviceRGB") | PName("DeviceGray") | PName("DeviceCMYK") => ()
          case PName(other) => throw new Unsupported(s"color space /$other")
          case other        => throw new Unsupported(s"cs: $other")
        }
      case "sc" | "scn" | "SC" | "SCN" =>
        val c = o.length match {
          case 1 => gray(num(o(0)))
          case 3 => rgb(num(o(0)), num(o(1)), num(o(2)))
          case 4 => cmyk(num(o(0)), num(o(1)), num(o(2)), num(o(3)))
          case n => throw new Unsupported(s"$op with $n operands")
        }
        if (op.head.isLower) st.fill = c else st.stroke = c
      // ---- path construction (page-space; CTM applied as points are added) ----
      case "m" => val (x, y) = tp(num(o(0)), num(o(1))); path.moveTo(x, y); curX = num(o(0)); curY = num(o(1)); startX = curX; startY = curY
      case "l" => val (x, y) = tp(num(o(0)), num(o(1))); path.lineTo(x, y); curX = num(o(0)); curY = num(o(1))
      case "c" =>
        val (x1, y1) = tp(num(o(0)), num(o(1))); val (x2, y2) = tp(num(o(2)), num(o(3)))
        val (x3, y3) = tp(num(o(4)), num(o(5)))
        path.curveTo(x1, y1, x2, y2, x3, y3); curX = num(o(4)); curY = num(o(5))
      case "v" =>
        val (x0, y0) = tp(curX, curY)
        val (x2, y2) = tp(num(o(0)), num(o(1))); val (x3, y3) = tp(num(o(2)), num(o(3)))
        path.curveTo(x0, y0, x2, y2, x3, y3); curX = num(o(2)); curY = num(o(3))
      case "y" =>
        val (x1, y1) = tp(num(o(0)), num(o(1))); val (x3, y3) = tp(num(o(2)), num(o(3)))
        path.curveTo(x1, y1, x3, y3, x3, y3); curX = num(o(2)); curY = num(o(3))
      case "h" => path.closePath(); curX = startX; curY = startY
      case "re" =>
        val (x, y, w, h) = (num(o(0)), num(o(1)), num(o(2)), num(o(3)))
        val (ax, ay) = tp(x, y); val (bx, by) = tp(x + w, y); val (cx, cy) = tp(x + w, y + h); val (dx, dy) = tp(x, y + h)
        path.moveTo(ax, ay); path.lineTo(bx, by); path.lineTo(cx, cy); path.lineTo(dx, dy); path.closePath()
        curX = x; curY = y; startX = x; startY = y
      // ---- path painting ----
      case "n" => endPath(fill = false, stroke = false, evenOdd = false)
      case "f" | "F" => endPath(fill = true, stroke = false, evenOdd = false)
      case "f*" => endPath(fill = true, stroke = false, evenOdd = true)
      case "S" => endPath(fill = false, stroke = true, evenOdd = false)
      case "s" => path.closePath(); endPath(fill = false, stroke = true, evenOdd = false)
      case "B" => endPath(fill = true, stroke = true, evenOdd = false)
      case "B*" => endPath(fill = true, stroke = true, evenOdd = true)
      case "b" => path.closePath(); endPath(fill = true, stroke = true, evenOdd = false)
      case "b*" => path.closePath(); endPath(fill = true, stroke = true, evenOdd = true)
      case "W" => pendingClip = Some(Path2D.WIND_NON_ZERO)
      case "W*" => pendingClip = Some(Path2D.WIND_EVEN_ODD)
      // ---- text ----
      case "BT" => tm = new AffineTransform(); tlm = new AffineTransform()
      case "ET" => ()
      case "Tf" =>
        val fonts = resDict("Font")
        val fname = o(0) match { case PName(n) => n; case x => throw new Unsupported(s"Tf: $x") }
        doc.resolve(fonts.getOrElse(fname, throw new Unsupported(s"font /$fname not in resources"))) match {
          case PDict(fd) =>
            doc.resolve(fd.getOrElse("Subtype", PNull)) match {
              case PName("Type0") => throw new Unsupported("Type0/CID font")
              case PName("Type3") => throw new Unsupported("Type3 font")
              case _              => ()
            }
            val bf = doc.resolve(fd.getOrElse("BaseFont", PName("Helvetica"))) match {
              case PName(n) => n; case _ => "Helvetica"
            }
            val (nm, style) = mapBaseFont(bf)
            st.fontName = nm; st.fontStyle = style
            st.widths = (doc.resolve(fd.getOrElse("Widths", PNull)),
              doc.resolve(fd.getOrElse("FirstChar", PNull))) match {
              case (PArr(ws), PNum(fc)) =>
                Some((fc.toInt, ws.map(w => doc.resolve(w) match {
                  case PNum(n) => n; case _ => 0.0
                }).toArray))
              case _ => None
            }
          case other => throw new Unsupported(s"font object: $other")
        }
        st.fs = num(o(1))
      case "Td" => tlm.translate(num(o(0)), num(o(1))); tm = new AffineTransform(tlm)
      case "TD" => st.tl = -num(o(1)); tlm.translate(num(o(0)), num(o(1))); tm = new AffineTransform(tlm)
      case "Tm" =>
        tlm = new AffineTransform(num(o(0)), num(o(1)), num(o(2)), num(o(3)), num(o(4)), num(o(5)))
        tm = new AffineTransform(tlm)
      case "T*" => tlm.translate(0, -st.tl); tm = new AffineTransform(tlm)
      case "TL" => st.tl = num(o(0))
      case "Tc" => st.tc = num(o(0))
      case "Tw" => st.tw = num(o(0))
      case "Tz" => st.th = num(o(0)) / 100.0
      case "Ts" => st.ts = num(o(0))
      case "Tr" => st.tr = num(o(0)).toInt
      case "Tj" => showText(o(0) match { case PStr(s) => s; case x => throw new Unsupported(s"Tj: $x") })
      case "'" =>
        tlm.translate(0, -st.tl); tm = new AffineTransform(tlm)
        showText(o(0) match { case PStr(s) => s; case x => throw new Unsupported(s"': $x") })
      case "\"" =>
        st.tw = num(o(0)); st.tc = num(o(1))
        tlm.translate(0, -st.tl); tm = new AffineTransform(tlm)
        showText(o(2) match { case PStr(s) => s; case x => throw new Unsupported(s"\": $x") })
      case "TJ" =>
        o(0) match {
          case PArr(parts) => parts.foreach {
            case PStr(s) => showText(s)
            case PNum(adj) => tm.translate(-adj / 1000.0 * st.fs * st.th, 0)
            case x => throw new Unsupported(s"TJ element: $x")
          }
          case x => throw new Unsupported(s"TJ: $x")
        }
      // ---- XObjects ----
      case "Do" =>
        val xobjs = resDict("XObject")
        val nm = o(0) match { case PName(n) => n; case x => throw new Unsupported(s"Do: $x") }
        doc.resolve(xobjs.getOrElse(nm, throw new Unsupported(s"XObject /$nm not in resources"))) match {
          case s: PStream =>
            doc.resolve(s.dict.v.getOrElse("Subtype", PNull)) match {
              case PName("Image") => drawImage(s)
              case PName("Form")  => drawForm(s)
              case other          => throw new Unsupported(s"XObject subtype $other")
            }
          case other => throw new Unsupported(s"XObject: $other")
        }
      // ---- compatibility / markers ----
      case "BX" => compat += 1
      case "EX" => if (compat > 0) compat -= 1
      case "BI" => inlineImage(lx)
      case "sh" => throw new Unsupported("shading")
      case other =>
        if (compat > 0 || Ignorable(other)) () // accepted-and-ignored set (documented)
        else throw new Unsupported(s"operator '$other'")
    }

    private def gray(v: Double) = { val c = clamp(v); new Color(c, c, c) }
    private def rgb(r: Double, g: Double, b: Double) = new Color(clamp(r), clamp(g), clamp(b))
    private def cmyk(c: Double, m: Double, y: Double, k: Double) =
      new Color(clamp((1 - c) * (1 - k)), clamp((1 - m) * (1 - k)), clamp((1 - y) * (1 - k)))
    private def clamp(v: Double): Float = math.max(0.0, math.min(1.0, v)).toFloat

    private def applyClip(): Unit = g2.setClip(st.clip.orNull)

    private def endPath(fill: Boolean, stroke: Boolean, evenOdd: Boolean): Unit = {
      path.setWindingRule(if (evenOdd) Path2D.WIND_EVEN_ODD else Path2D.WIND_NON_ZERO)
      val device = base.createTransformedShape(path)
      applyClip()
      if (fill) { g2.setColor(st.fill); g2.fill(device) }
      if (stroke) {
        val det = math.abs(st.ctm.getDeterminant * base.getDeterminant)
        val sc = math.sqrt(det)
        val w = math.max(0.1, st.lineWidth * sc)
        val brush = st.dash match {
          case None => new BasicStroke(w.toFloat)
          // dash lengths/phase are user-space — device-scale them with the
          // same factor as the width; keep the solid path's JVM default
          // cap/join so dashed and solid strokes stay consistent
          case Some((lens, phase)) => new BasicStroke(w.toFloat,
            BasicStroke.CAP_SQUARE, BasicStroke.JOIN_MITER, 10.0f,
            lens.map(l => math.max(0.0, l * sc).toFloat),
            math.max(0.0, phase * sc).toFloat)
        }
        g2.setColor(st.stroke); g2.setStroke(brush); g2.draw(device)
      }
      pendingClip.foreach { rule =>
        path.setWindingRule(rule)
        val area = new Area(base.createTransformedShape(path))
        st.clip match { case Some(c) => c.intersect(area); case None => st.clip = Some(area) }
      }
      pendingClip = None
      path = new Path2D.Double()
    }

    /** Show-string: origins are spec-exact (Td/Tm/TJ and /Widths-driven
      * advances); glyph shapes and, absent /Widths, advances come from the
      * JVM font — the documented divergence. */
    private def showText(strBytes: Array[Byte]): Unit = {
      val s = new String(strBytes, ISO_8859_1)
      if (s.isEmpty) return
      val font = new java.awt.Font(st.fontName, st.fontStyle, 1).deriveFont(st.fs.toFloat)
      if (st.tr != 3 && st.fs != 0) {
        applyClip()
        g2.setColor(if (st.tr == 1) st.stroke else st.fill)
        g2.setFont(font)
        val t = new AffineTransform(base)
        t.concatenate(st.ctm); t.concatenate(tm)
        t.translate(0, st.ts); t.scale(st.th, -1)
        val saved = g2.getTransform
        g2.setTransform(t)
        if (st.widths.isEmpty && st.tc == 0 && st.tw == 0) g2.drawString(s, 0f, 0f)
        else {
          var x = 0.0
          s.foreach { ch =>
            g2.drawString(ch.toString, x.toFloat, 0f)
            x += charAdvance(ch, font) / st.th // t already scales by th
          }
        }
        g2.setTransform(saved)
      }
      var adv = 0.0
      s.foreach(ch => adv += charAdvance(ch, font))
      tm.translate(adv, 0)
    }

    /** Advance of one char in unscaled text space ×fs (+Tc/Tw), ×Th. */
    private def charAdvance(ch: Char, font: java.awt.Font): Double = {
      val w = st.widths match {
        case Some((fc, ws)) if ch.toInt >= fc && ch.toInt - fc < ws.length =>
          ws(ch.toInt - fc) / 1000.0 * st.fs
        case _ => font.getStringBounds(ch.toString, frc).getWidth
      }
      (w + st.tc + (if (ch == ' ') st.tw else 0.0)) * st.th
    }

    /** BI…ID…EI inline image (ISO 32000 §8.9.7): dict with abbreviated
      * keys up to ID, one whitespace byte, then the sample data. For
      * unfiltered data the exact byte length is ceil(W·comps·BPC/8)·H and
      * the EI keyword must follow; filtered data is delimited by the
      * ws-EI-ws sentinel scan (the decoders tolerate the byte-accurate
      * slice this yields). Keys/abbreviations are normalized to the full
      * XObject names and the image renders through drawImage — same
      * color-space/bpc subset, same unit-square placement. */
    private def inlineImage(lx: Lexer): Unit = {
      val abbrevKey = Map("W" -> "Width", "H" -> "Height",
        "BPC" -> "BitsPerComponent", "CS" -> "ColorSpace", "F" -> "Filter",
        "DP" -> "DecodeParms", "IM" -> "ImageMask", "D" -> "Decode",
        "I" -> "Interpolate", "L" -> "Length")
      val abbrevFilter = Map("AHx" -> "ASCIIHexDecode", "A85" -> "ASCII85Decode",
        "LZW" -> "LZWDecode", "Fl" -> "FlateDecode", "RL" -> "RunLengthDecode",
        "CCF" -> "CCITTFaxDecode", "DCT" -> "DCTDecode")
      val entries = mutable.Map[String, Obj]()
      var tok = lx.next()
      while (tok != TKw("ID")) {
        tok match {
          case TName(k) => entries(abbrevKey.getOrElse(k, k)) = lx.parseObject()
          case TEof     => throw new Unsupported("inline image: no ID")
          case other    => throw new Unsupported(s"inline image dict: $other")
        }
        tok = lx.next()
      }
      def normFilter(o: Obj): Obj = o match {
        case PName(n) => PName(abbrevFilter.getOrElse(n, n))
        case PArr(a)  => PArr(a.map(normFilter))
        case x        => x
      }
      entries.get("Filter").foreach(f => entries("Filter") = normFilter(f))
      entries.get("ColorSpace").foreach { cs =>
        entries("ColorSpace") = cs match {
          case PName("G")    => PName("DeviceGray")
          case PName("RGB")  => PName("DeviceRGB")
          case PName("CMYK") => PName("DeviceCMYK")
          case x             => x
        }
      }
      lx.skipOneWs()
      val filters = entries.get("Filter").toSeq.flatMap {
        case PName(n) => Seq(n); case PArr(a) => a.collect { case PName(n) => n }
        case _        => Nil
      }
      val data =
        if (filters.nonEmpty) lx.scanEI()
        else {
          def intOf(k: String, dflt: => Int): Int = entries.get(k) match {
            case Some(PNum(n)) => n.toInt
            case None          => dflt
            case Some(x)       => throw new Unsupported(s"inline image /$k: $x")
          }
          val w = intOf("Width", throw new Unsupported("inline image /Width"))
          val h = intOf("Height", throw new Unsupported("inline image /Height"))
          val mask = entries.get("ImageMask").contains(PBool(true))
          val bpc = intOf("BitsPerComponent", if (mask) 1 else 8)
          val comps = if (mask) 1 else entries.get("ColorSpace") match {
            case Some(PName("DeviceGray")) => 1
            case Some(PName("DeviceRGB"))  => 3
            case Some(PName("DeviceCMYK")) => 4
            case other => throw new Unsupported(s"inline image color space $other")
          }
          val d = lx.takeBytes(((w.toLong * comps * bpc + 7) / 8).toInt * h)
          lx.next() match {
            case TKw("EI") => ()
            case other     => throw new Unsupported(s"inline image: EI expected, got $other")
          }
          d
        }
      drawImage(PStream(PDict(entries.toMap), data))
    }

    private def drawImage(s: PStream): Unit = {
      val d = s.dict.v
      val filters = doc.resolve(d.getOrElse("Filter", PNull)) match {
        case PName(n) => Vector(n); case PArr(a) => a.collect { case PName(n) => n }
        case _        => Vector.empty
      }
      if (doc.resolve(d.getOrElse("ImageMask", PBool(false))) == PBool(true))
        throw new Unsupported("image mask")
      val img: BufferedImage =
        if (filters.contains("DCTDecode")) {
          val jpeg = if (filters == Vector("DCTDecode")) s.raw
            else throw new Unsupported(s"filter chain $filters before DCTDecode")
          val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
          if (im == null) throw new Unsupported("undecodable DCT image")
          im
        } else {
          val w = doc.resolve(d.getOrElse("Width", PNull)) match { case PNum(n) => n.toInt; case _ => throw new Unsupported("image /Width") }
          val h = doc.resolve(d.getOrElse("Height", PNull)) match { case PNum(n) => n.toInt; case _ => throw new Unsupported("image /Height") }
          val bpc = doc.resolve(d.getOrElse("BitsPerComponent", PNum(8))) match { case PNum(n) => n.toInt; case _ => 8 }
          if (bpc != 8) throw new Unsupported(s"image bpc $bpc")
          val comps = doc.resolve(d.getOrElse("ColorSpace", PNull)) match {
            case PName("DeviceRGB")  => 3
            case PName("DeviceGray") => 1
            case other               => throw new Unsupported(s"image color space $other")
          }
          val data = doc.decoded(s)
          if (data.length < w * h * comps) throw new Unsupported("image data short")
          val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = (y * w + x) * comps
              val rgbv = if (comps == 3)
                ((data(i) & 0xff) << 16) | ((data(i + 1) & 0xff) << 8) | (data(i + 2) & 0xff)
              else { val g = data(i) & 0xff; (g << 16) | (g << 8) | g }
              im.setRGB(x, y, rgbv)
              x += 1
            }
            y += 1
          }
          im
        }
      // image space: unit square [0,1]² under CTM; rows are top-down
      val t = new AffineTransform(base)
      t.concatenate(st.ctm)
      t.scale(1.0 / img.getWidth, -1.0 / img.getHeight)
      t.translate(0, -img.getHeight)
      applyClip()
      g2.drawImage(img, t, null)
    }

    private def drawForm(s: PStream): Unit = {
      val d = s.dict.v
      val inner = st.copy()
      doc.resolve(d.getOrElse("Matrix", PNull)) match {
        case PArr(a) if a.length == 6 =>
          val m = a.map(x => doc.resolve(x) match { case PNum(n) => n; case _ => 0.0 })
          inner.ctm.concatenate(new AffineTransform(m(0), m(1), m(2), m(3), m(4), m(5)))
        case _ => ()
      }
      doc.resolve(d.getOrElse("BBox", PNull)) match {
        case PArr(a) if a.length == 4 =>
          val b = a.map(x => doc.resolve(x) match { case PNum(n) => n; case _ => 0.0 })
          val r = new Path2D.Double()
          val pts = Seq((b(0), b(1)), (b(2), b(1)), (b(2), b(3)), (b(0), b(3)))
          pts.zipWithIndex.foreach { case ((x, y), i) =>
            val p = new java.awt.geom.Point2D.Double(x, y)
            inner.ctm.transform(p, p)
            if (i == 0) r.moveTo(p.getX, p.getY) else r.lineTo(p.getX, p.getY)
          }
          r.closePath()
          val area = new Area(base.createTransformedShape(r))
          inner.clip match { case Some(c) => c.intersect(area); case None => inner.clip = Some(area) }
        case _ => ()
      }
      val res = doc.resolve(d.getOrElse("Resources", PNull)) match {
        case pd: PDict => pd
        case _         => resources
      }
      new Interp(doc, g2, base, res, depth + 1).withInitial(inner).exec(doc.decoded(s))
    }

    private def mapBaseFont(bf: String): (String, Int) = {
      // strip subset prefix "ABCDEF+"
      val n = if (bf.length > 7 && bf(6) == '+') bf.substring(7) else bf
      val lower = n.toLowerCase
      val family =
        if (lower.contains("courier") || lower.contains("mono")) "Monospaced"
        else if (lower.contains("times") || lower.contains("serif") && !lower.contains("sans")) "Serif"
        else "SansSerif" // Helvetica, Arial, and the default
      var style = java.awt.Font.PLAIN
      if (lower.contains("bold")) style |= java.awt.Font.BOLD
      if (lower.contains("italic") || lower.contains("oblique")) style |= java.awt.Font.ITALIC
      (family, style)
    }
  }
}
