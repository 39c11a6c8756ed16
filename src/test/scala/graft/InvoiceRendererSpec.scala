package graft

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}
import javax.imageio.ImageIO

import graft.fixtures.InvoiceCorpus
import graft.render.InvoiceRenderer
import org.apache.spark.sql.functions._

/** F16 wrap, W4 alternating rows, S8 rendered-image sink — real pixels
  * (java.desktop draws headless in this JVM). */
class InvoiceRendererSpec extends SparkSuite {
  import spark.implicits._

  test("F16 wrap: reference-exact greedy char-count wrap incl. quirks") {
    import InvoiceRenderer.wrapText
    assert(wrapText("Developpement d'application web sur mesure", 35) ==
      Seq("Developpement d'application web sur", "mesure"))
    assert(wrapText("ab cd", 5) == Seq("ab cd")) // exactly maxChars fits
    assert(wrapText("abcd e", 5) == Seq("abcd", "e"))
    // first-word quirk: the fit check counts a joiner space even at line
    // start, so a maxChars-long first word takes the else-branch — output
    // is identical to python's (_wrap_text :749-766)
    assert(wrapText("abcde", 5) == Seq("abcde"))
    // an over-long word still lands alone on its own line
    assert(wrapText("hi abcdefghij yo", 5) == Seq("hi", "abcdefghij", "yo"))
    assert(wrapText("", 35) == Seq.empty)
    assert(wrapText("   ", 35) == Seq.empty)
  }

  test("F16 Column twin == Scala wrap on corpus texts") {
    val texts = InvoiceCorpus.services ++ Seq(
      "ab cd", "abcd e", "abcde", "hi abcdefghij yo", "", " un  deux   trois ")
    val df = texts.toDF("text")
      .select($"text", InvoiceRenderer.wrapTextCol($"text", 35).as("wrapped"))
    df.as[(String, Seq[String])].collect().foreach { case (t, w) =>
      assert(w == InvoiceRenderer.wrapText(t, 35), s"divergence on '$t'")
    }
    // and at the boundary width
    val df5 = texts.toDF("text")
      .select($"text", InvoiceRenderer.wrapTextCol($"text", 5).as("wrapped"))
    df5.as[(String, Seq[String])].collect().foreach { case (t, w) =>
      assert(w == InvoiceRenderer.wrapText(t, 5), s"divergence at 5 on '$t'")
    }
  }

  test("renderDoc: real decodable PNG, scaled geometry, deterministic, W4 fill present") {
    val doc = InvoiceCorpus.docs(spark, 3).collect().head
    val png = InvoiceRenderer.renderDoc(doc, scale = 0.5)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    assert(img.getWidth == 500 && img.getHeight == 705) // 1000×1409 at 0.5
    assert(InvoiceRenderer.renderDoc(doc, 0.5).sameElements(png), "nondeterministic render")
    // some ink on the page
    var nonWhite = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      if ((img.getRGB(x, y) & 0xffffff) != 0xffffff) nonWhite += 1
    assert(nonWhite > 500, s"blank render: $nonWhite non-white pixels")
    // W4: items-zone rows are (header@860, item0@900, item1@940, ...) —
    // row index 1 (item0, yc 912) is odd → filled band at the right edge
    // (no glyphs there), row 2 (item1, yc 952) is even → white
    val fill = InvoiceRenderer.AltRowFill.getRGB & 0xffffff
    val xProbe = img.getWidth - 3
    assert((img.getRGB(xProbe, ((912 - 12) * 0.5).toInt + 2) & 0xffffff) == fill,
      "odd item row not styled")
    assert((img.getRGB(xProbe, ((952 - 12) * 0.5).toInt + 2) & 0xffffff) == 0xffffff,
      "even item row wrongly styled")
  }

  test("S8 sink: one PNG row per doc; parquet round trip; reference naming dump") {
    val docs = InvoiceCorpus.docs(spark, 6)
    val rendered = InvoiceRenderer.renderedImages(docs, scale = 0.25)
    assert(rendered.count() == 6)
    val out = Files.createTempDirectory("graft_render_").toString + "/images"
    InvoiceRenderer.writeImages(rendered, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 6 && back.columns.toSet == Set("doc_id", "png"))
    // every payload decodes
    back.select("png").as[Array[Byte]].collect().foreach { b =>
      assert(ImageIO.read(new ByteArrayInputStream(b)) != null)
    }
    val dumpDir = Files.createTempDirectory("graft_render_dump_").toString
    InvoiceRenderer.dumpImageDir(rendered, dumpDir)
    val names = Files.list(Paths.get(dumpDir)).toArray.map(_.toString.split('/').last).sorted
    assert(names.toSeq == (1 to 6).map(i => f"invoice_$i%04d.png"))
  }
}
