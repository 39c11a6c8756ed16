package graft.model

/** Core data model of the KG-construction engine.
  *
  * The input contract (BASELINE.json `input_hint`) is a table of interleaved
  * text + media documents:
  *   (doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)
  *
  * The widened span adds the OCR-block fields the reference carries per text
  * block (conf in [0,1], rect bbox) — see
  * /root/reference/ocr/ocr_starter_final.py:100-113. The widened form is what
  * the fixture generator emits; the engine only *requires* the contract
  * columns and treats conf/bbox as optional enrichment.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span])

/** Rect bbox, the normalized form the reference converts 4-point polygons
  * into (data_preparation.py:119-126). */
final case class BBox(x: Int, y: Int, w: Int, h: Int)

final case class OcrSpan(
    kind: String,
    text: String,
    media_ref: String,
    offset: Int,
    conf: Double, // normalized to [0,1] at ingest (data_preparation.py:131)
    bbox: BBox)

final case class OcrDoc(doc_id: String, page_w: Int, page_h: Int, spans: Seq[OcrSpan])

/** A tagged mention: one span after field tagging + zone banding.
  * type/zone_type/enhanced_type mirror the reference annotation shape
  * (data_preparation.py:104-109,128-133,182-191). */
final case class Mention(
    doc_id: String,
    offset: Int,
    text: String,
    conf: Double,
    fieldType: String, // _classify_text_type output (F5)
    zone: String, // y-band zone (A3)
    enhancedType: String) // context-enhanced type (F6)

/** The engine's output unit: one edge of the knowledge graph. */
final case class Triple(subj: String, pred: String, obj: String)

object Vocab {
  // Predicate vocabulary — SURVEY.md §1.4, fixed by BASELINE.json north_star.
  val HasNumber = "hasNumber"
  val HasDate = "hasDate"
  val HasDueDate = "hasDueDate"
  val HasVendor = "hasVendor"
  val HasClient = "hasClient"
  val HasLineItem = "hasLineItem"
  val HasDescription = "hasDescription"
  val HasQuantity = "hasQuantity"
  val HasAmount = "hasAmount"
  val HasSubtotalHT = "hasSubtotalHT"
  val HasTVA = "hasTVA"
  val HasTotalTTC = "hasTotalTTC"
  val HasICE = "hasICE"
  val SameAs = "sameAs"
  val RdfType = "rdf:type"

  def invoiceNode(docId: String): String = s"invoice:$docId"
  def lineItemNode(docId: String, n: Int): String = s"lineItem:$docId/$n"
  def vendorNode(key: String): String = s"vendor:$key"
}
