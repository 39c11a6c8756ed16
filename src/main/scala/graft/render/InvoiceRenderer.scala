package graft.render

import java.awt.{Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.model.OcrDoc
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Rendering operators — the last three reference components previously
  * scoped out as render-only, now REAL because `java.desktop` draws text
  * headless in this JVM (verified: logical fonts resolve without
  * fontconfig):
  *
  *  - F16 text wrap (`complex_facture_generator.py:749-766 _wrap_text`):
  *    greedy word wrap by CHARACTER COUNT, reproduced exactly — including
  *    the quirk that the fit check `len(current + " " + word) <= max`
  *    counts a joiner space even for the first word of a line, and that a
  *    word longer than `maxChars` still lands alone on its own line. Both
  *    a Scala function and a Column HOF twin (parity-tested).
  *  - W4 alternating row styling (`generate_synthetic_data.py:329-330`):
  *    odd item rows get the (248, 249, 250) fill behind them.
  *  - S8 rendered-image sink (`generate_synthetic_data.py:414-417`): one
  *    PNG per document. Cluster form: a narrow mapPartitions render pass →
  *    (doc_id, png) rows → partitioned parquet (the object-store layout);
  *    plus a driver-side directory dump with the reference's
  *    `invoice_%04d.png` naming for tooling parity.
  *
  * The renderer draws from the SPAN table (doc geometry), not from a
  * template: text spans at their bboxes with a real font, media spans as
  * outlined placeholder boxes, item-zone rows with the W4 fill, item
  * descriptions wrapped per F16 at the reference's 35-char / 2-line rule.
  */
object InvoiceRenderer {

  // ---- F16 — reference-exact greedy word wrap --------------------------

  def wrapText(text: String, maxChars: Int): Seq[String] = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    val lines = Vector.newBuilder[String]
    var cur = ""
    words.foreach { w =>
      // quirk preserved: the check concatenates " " even when cur is empty
      if ((cur + " " + w).length <= maxChars)
        cur = if (cur.isEmpty) w else cur + " " + w
      else {
        if (cur.nonEmpty) lines += cur
        cur = w
      }
    }
    if (cur.nonEmpty) lines += cur
    lines.result()
  }

  /** Column twin of `wrapText` (array<string>) — same greedy fold as a
    * HOF aggregate; parity with the Scala form is spec-gated. */
  def wrapTextCol(text: Column, maxChars: Int): Column = {
    val words = filter(split(text, "\\s+"), w => w =!= "")
    val zero = struct(
      array().cast("array<string>").as("lines"), lit("").as("cur"))
    aggregate(
      words, zero,
      (acc, w) => {
        val cur = acc.getField("cur")
        val lines = acc.getField("lines")
        val joined = concat(cur, lit(" "), w)
        val fits = length(joined) <= maxChars
        struct(
          when(fits || cur === "", lines)
            .otherwise(concat(lines, array(cur))).as("lines"),
          when(fits, when(cur === "", w).otherwise(joined))
            .otherwise(w).as("cur"))
      },
      acc => when(acc.getField("cur") === "", acc.getField("lines"))
        .otherwise(concat(acc.getField("lines"), array(acc.getField("cur")))))
  }

  // ---- W4 — alternating row predicate ----------------------------------

  /** generate_synthetic_data.py:329-330: odd row indices are styled. */
  def altRowStyled(rowIdx: Int): Boolean = rowIdx % 2 == 1

  val AltRowFill = new Color(248, 249, 250)

  // ---- renderer --------------------------------------------------------

  private val ItemZoneLo = 0.6
  private val ItemZoneHi = 0.8
  private val RowTol = 15.0

  /** Render one document's span table to a PNG at `scale`. Deterministic:
    * same doc → same bytes. */
  def renderDoc(doc: OcrDoc, scale: Double = 0.5): Array[Byte] = {
    val w = math.max(1, math.round(doc.page_w * scale).toInt)
    val h = math.max(1, math.round(doc.page_h * scale).toInt)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      // no antialiasing: glyph rasterization stays deterministic
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
        RenderingHints.VALUE_TEXT_ANTIALIAS_OFF)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, w, h)

      val totalH = if (doc.spans.isEmpty) 1.0
        else doc.spans.map(s => s.bbox.y + s.bbox.h).max.toDouble
      def relPos(yc: Double) = yc / totalH
      val items = doc.spans.filter { s =>
        val r = relPos(s.bbox.y + s.bbox.h / 2.0)
        s.kind == "text" && r >= ItemZoneLo && r < ItemZoneHi
      }

      // W4: group item spans into rows by y (tol 15), fill odd rows
      val rowYs = items.map(s => s.bbox.y + s.bbox.h / 2.0).distinct.sorted
        .foldLeft(Vector.empty[Double]) { (acc, y) =>
          if (acc.nonEmpty && y - acc.last <= RowTol) acc else acc :+ y
        }
      rowYs.zipWithIndex.foreach { case (yc, i) =>
        if (altRowStyled(i)) {
          g.setColor(AltRowFill)
          val y0 = math.round((yc - 12) * scale).toInt
          g.fillRect(0, y0, w, math.max(1, math.round(24 * scale).toInt))
        }
      }

      val font = new Font(Font.SANS_SERIF, Font.PLAIN,
        math.max(6, math.round(11 * scale * 2).toInt))
      g.setFont(font)
      doc.spans.foreach { s =>
        val x = math.round(s.bbox.x * scale).toInt
        val y = math.round((s.bbox.y + s.bbox.h * 0.75) * scale).toInt
        if (s.kind == "media") {
          g.setColor(Color.LIGHT_GRAY)
          g.drawRect(x, math.round(s.bbox.y * scale).toInt,
            math.max(4, math.round(s.bbox.w * scale).toInt),
            math.max(4, math.round(s.bbox.h * scale).toInt))
        } else if (s.text.nonEmpty) {
          g.setColor(Color.BLACK)
          val isItemDesc = items.contains(s) && s.bbox.x <= 100
          if (isItemDesc) {
            // F16 at the reference's parameters: wrap 35 chars, max 2 lines
            wrapText(s.text, 35).take(2).zipWithIndex.foreach { case (line, i) =>
              g.drawString(line, x, y + math.round(i * 12 * scale).toInt)
            }
          } else g.drawString(s.text, x, y)
        }
      }
    } finally g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** S8 — the distributed render pass: (doc_id, png) per document. */
  def renderedImages(docs: Dataset[OcrDoc], scale: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map(d => (d.doc_id, renderDoc(d, scale))))
      .toDF("doc_id", "png")
  }

  /** S8 sink, cluster form: partitioned parquet of PNG payloads. */
  def writeImages(rendered: DataFrame, outDir: String): Unit =
    rendered.write.mode("overwrite").parquet(outDir)

  /** S8 sink, reference-naming form (driver-side dump for tooling parity):
    * `invoice_%04d.png` in `dir`, ordered by doc_id — for bounded batches,
    * matching generate_synthetic_data.py:414-417. */
  def dumpImageDir(rendered: DataFrame, dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(dir))
    rendered.orderBy("doc_id").collect().zipWithIndex.foreach { case (r, i) =>
      Files.write(Paths.get(dir, f"invoice_${i + 1}%04d.png"),
        r.getAs[Array[Byte]]("png"))
    }
  }
}
