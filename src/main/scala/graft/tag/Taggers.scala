package graft.tag

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Field-tagging expression library — the deterministic "mention detect"
  * semantics of the reference, expressed as pure Catalyst `Column`
  * expressions (whole-stage-codegen friendly, no UDFs).
  *
  * Every function documents the reference implementation whose observable
  * behavior it reproduces, INCLUDING its quirks (e.g. the date rule tagging
  * "N' Fact-4796" as `date`) — parity against the golden corpus requires the
  * quirks, not fixes. Citations are file:line in /root/reference.
  */
object Taggers {

  private def containsAny(tl: Column, words: Seq[String]): Column =
    words.map(w => tl.contains(lit(w))).reduce(_ || _)

  /** F5 — `_classify_text_type`
    * (fine-tuning-ocr/data_preparation/data_preparation.py:147-167).
    * Ordered rule chain over lower(trim(text)); `len(text)` in the date rule
    * is the length of the ORIGINAL text, and the digits-only rule strips only
    * '.' and '-' from the ORIGINAL text — both reproduced exactly.
    */
  def classifyTextType(text: Column): Column = {
    val tl = lower(trim(text))
    when(containsAny(tl, Seq("facture", "invoice", "bill")), "header")
      .when(containsAny(tl, Seq("€", "$", "eur", "usd", "ttc", "ht", "mad", "dh", "dhs")), "amount")
      .when(
        (tl.contains("date") || tl.contains("/") || tl.contains("-")) && length(text) < 15,
        "date")
      .when(tl.contains("@") || tl.contains("email"), "email")
      .when(
        containsAny(tl, Seq("tel", "phone", "+33", "01", "02", "03", "04", "05", "06", "07", "+212")),
        "phone")
      .when(containsAny(tl, Seq("rue", "avenue", "place", "boulevard")), "address")
      .when(regexp_replace(text, "[.\\-]", "").rlike("^[0-9]+$"), "number")
      .otherwise("text")
  }

  /** A3 — zone banding by relative y position
    * (data_preparation.py:197-236): y_center / total_height bands.
    */
  def zoneOfRelPos(relPos: Column): Column =
    when(relPos < 0.2, "header")
      .when(relPos < 0.4, "company_info")
      .when(relPos < 0.6, "client_info")
      .when(relPos < 0.8, "items")
      .when(relPos < 0.95, "total")
      .otherwise("footer")

  /** F6 — `_enhance_text_classification` (data_preparation.py:238-256).
    * Context-sensitive refinement; falls back to F5.
    */
  def enhanceTextType(text: Column, zone: Column): Column = {
    val tl = lower(trim(text))
    val hasDigit = text.rlike("[0-9]")
    when(
      zone === "header" && containsAny(tl, Seq("facture", "invoice", "devis", "quote")),
      "document_type")
      .when(zone === "header" && hasDigit && length(text) < 20, "document_number")
      .when(zone === "total" && containsAny(tl, Seq("total", "ttc", "ht")), "total_label")
      .when(zone === "total" && (text.contains("€") || hasDigit), "total_amount")
      .otherwise(classifyTextType(text))
  }

  /** F3 — decimal-comma normalization + money cast
    * (vlm/utils/zone_detector.py:269; vlm/examples/ocr_integration.py:193-196).
    * Money is DECIMAL(18,2) in the graph so tolerance-join J2 (<0.01 at
    * 2-decimal money) reduces to an exact equi-join on the decimal key.
    */
  def normalizeAmount(s: Column): Column =
    regexp_replace(regexp_replace(s, "\\s", ""), ",", ".").cast(DecimalType(18, 2))

  /** F2 — amount regex patterns (zone_detector.py:250-266), in reference
    * order, case-insensitive, ALL matches per pattern, duplicates across
    * patterns kept (the reference appends per-pattern finditer results).
    * Extended with the Moroccan-currency shapes of the fixture corpus
    * (complex_facture_generator.py currency "DH"/"Dhs") — same pattern
    * family, different currency token.
    */
  val amountPatterns: Seq[String] = Seq(
    "(\\d+[,.]?\\d*)\\s*€",
    "(\\d+[,.]?\\d*)\\s*EUR",
    "€\\s*(\\d+[,.]?\\d*)",
    "(\\d+[,.]?\\d*)\\s*euros?",
    "Total[:\\s]*(\\d+[,.]?\\d*)",
    "Montant[:\\s]*(\\d+[,.]?\\d*)",
    // corpus extension (DH / Dhs / MAD):
    "(\\d+[,.]?\\d*)\\s*(?:DHS|DH|MAD)"
  )

  /** Extract all amounts from a text column as
    * array<struct<context:string, value_str:string>> — context is the full
    * match (group 0, used by the F4 classifier), value_str is group 1.
    */
  def extractAmounts(text: Column): Column = {
    val perPattern = amountPatterns.map { p =>
      val ci = s"(?i)$p"
      arrays_zip(
        regexp_extract_all(text, lit(ci), lit(0)).as("context"),
        regexp_extract_all(text, lit(ci), lit(1)).as("value_str"))
    }
    flatten(array(perPattern: _*))
  }

  /** F4 — amount-type classifier on the match context
    * (zone_detector.py:283-296). Order-sensitive first-match chain.
    */
  def classifyAmountType(context: Column): Column = {
    val cl = lower(context)
    when(containsAny(cl, Seq("total", "somme")), "total")
      .when(containsAny(cl, Seq("tva", "tax")), "tax")
      .when(containsAny(cl, Seq("ht", "hors")), "subtotal")
      .when(containsAny(cl, Seq("ttc", "toutes")), "total_with_tax")
      .otherwise("amount")
  }

  /** F7 — postal-code extraction (zone_detector.py:348-351). */
  def postalCode(text: Column): Column =
    regexp_extract(text, "\\b(\\d{5})\\b", 1)

  /** F9 — filename sanitize (ocr/ocr_starter_final.py:423). */
  def sanitizeName(s: Column): Column =
    regexp_replace(s, "[^A-Za-z0-9 _-]", "")

  /** F13 — edit-distance similarity
    * (fine-tuning-ocr/evaluation/model_evaluation.py:312,330-336):
    * sim = 1 − levenshtein(lower(a),lower(b)) / max(len(a),len(b)).
    */
  def editSimilarity(a: Column, b: Column): Column = {
    val maxLen = greatest(length(a), length(b))
    when(maxLen === 0, 1.0)
      .otherwise(lit(1.0) - levenshtein(lower(a), lower(b)).cast("double") / maxLen.cast("double"))
  }

  /** J1 — doc-id normalization for the filename-stem join. All THREE stem
    * shapes the reference probes (vlm/evaluation.py:301-305:
    * `enhanced_<stem>_ocr.json`, `<stem>_ocr.json`, `ocr_<stem>.json`;
    * plus data_preparation.py:59's strip) normalize to the bare stem.
    */
  def normalizeDocId(stem: Column): Column =
    regexp_replace(stem, "^enhanced_|^ocr_|_ocr$", "")

  /** Confidence normalization to [0,1] (data_preparation.py:131):
    * conf/100 if conf > 1 else conf.
    */
  def normalizeConf(conf: Column): Column =
    when(conf > 1.0, conf / 100.0).otherwise(conf)

  // ---- geometry expressions (F10/F11, vlm/utils/geometry_utils.py:20-136) --

  /** Center of a rect bbox struct<x,y,w,h>. */
  def bboxCenterX(b: Column): Column = b.getField("x") + b.getField("w") / 2.0
  def bboxCenterY(b: Column): Column = b.getField("y") + b.getField("h") / 2.0

  def bboxArea(b: Column): Column =
    abs(b.getField("w") * b.getField("h")).cast("double")

  def euclidean(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    sqrt(pow(x1 - x2, 2) + pow(y1 - y2, 2))

  /** IoU of two rect bboxes, degenerate intersection → 0
    * (geometry_utils.py:60-96). */
  def bboxIoU(a: Column, b: Column): Column = {
    def x2(c: Column) = c.getField("x") + c.getField("w")
    def y2(c: Column) = c.getField("y") + c.getField("h")
    val ix = greatest(lit(0).cast("double"),
      least(x2(a), x2(b)) - greatest(a.getField("x"), b.getField("x")))
    val iy = greatest(lit(0).cast("double"),
      least(y2(a), y2(b)) - greatest(a.getField("y"), b.getField("y")))
    val inter = ix * iy
    val union = bboxArea(a) + bboxArea(b) - inter
    when(union <= 0, 0.0).otherwise(inter / union)
  }

  /** F11 — alignment predicates (geometry_utils.py:98-136). */
  def horizontallyAligned(y1: Column, y2: Column, tol: Double = 10.0): Column =
    abs(y1 - y2) <= tol
  def verticallyAligned(x1: Column, x2: Column, tol: Double = 10.0): Column =
    abs(x1 - x2) <= tol

  /** F15 — full-text assembly: span texts joined with ' ' in offset order
    * (ocr_starter_final.py:164,284). Expects the spans array in offset
    * order (the input contract). */
  def fullText(spans: Column): Column =
    array_join(transform(filter(spans, s => s.getField("kind") === "text"),
      s => s.getField("text")), " ")

  /** F15 zone-ordered variant (data_preparation.py:315-332): concat in the
    * fixed zone order header→company_info→client_info→items→total→footer,
    * offset order within a zone. Expects tagged spans with a `zone` field. */
  val zoneOrder: Seq[String] =
    Seq("header", "company_info", "client_info", "items", "total", "footer")

  def zoneRank(zone: Column): Column =
    zoneOrder.zipWithIndex.foldLeft(lit(99): Column) { case (acc, (z, i)) =>
      when(zone === z, i).otherwise(acc)
    }

  def zoneOrderedText(taggedSpans: Column): Column = {
    val sorted = array_sort(
      filter(taggedSpans, s => s.getField("kind") === "text"),
      (l, r) => {
        val zl = zoneRank(l.getField("zone")); val zr = zoneRank(r.getField("zone"))
        when(zl < zr, -1).when(zl > zr, 1)
          .when(l.getField("offset") < r.getField("offset"), -1)
          .when(l.getField("offset") > r.getField("offset"), 1)
          .otherwise(0).cast("int")
      })
    array_join(transform(sorted, s => s.getField("text")), " ")
  }

  /** A8 — bounded max: max of values strictly below a cap
    * (zone_detector.py:321-331 `<100`; layout_analyzer.py:311-322 `<=10`). */
  def boundedMax(c: Column, bound: Double): Column =
    max(when(c < bound, c))
}
