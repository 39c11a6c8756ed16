package graft.tag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Layout-analyzer sections + F18 Q→A MapType handling.
  *
  * The reference asks a VLM four fixed questions per invoice and stores the
  * answers as a question→answer dict (vlm/vlm_processor.py:186-196) that
  * downstream components ITERATE: zone detection boosts its header score
  * from en-tête answers (vlm/utils/zone_detector.py:94-98), and the layout
  * analyzer derives document_structure / spatial_organization /
  * visual_hierarchy / text_blocks / alignment_analysis from it
  * (vlm/utils/layout_analyzer.py:38-64).
  *
  * Engine mapping: the Q→A dict is a `map<string,string>` column
  * (`detailed_analysis`), iterated with `map_entries` + array HOFs /
  * `explode` — F18 in SURVEY.md §2.7. The VLM itself is a model call the
  * engine deliberately stubs (same policy as the Multimodal codecs):
  * `vlmAnalysisOf` synthesizes the answers DETERMINISTICALLY from the
  * document's own tagged spans + zone report, so every consumer of the map
  * runs real logic on a real map column, testable end to end.
  *
  * Everything here is a narrow per-row computation — no shuffles.
  */
object LayoutAnalyzer {

  /** The reference's fixed invoice questions (vlm_processor.py:186-191),
    * in insertion order (Python dicts preserve it; so does Spark's map). */
  val invoiceQuestions: Seq[String] = Seq(
    "Quelles sont les informations principales visibles sur cette facture?",
    "Où sont situés les montants et totaux?",
    "Y a-t-il des tableaux ou listes d'articles?",
    "Quelles sont les zones d'en-tête et de pied de page?")

  private def containsAny(tl: Column, words: Seq[String]): Column =
    words.map(w => tl.contains(lit(w))).reduce(_ || _)

  /** Deterministic VLM-analysis stub over Extract.tag output joined with the
    * zone report: (doc_id, basic_description, detailed_analysis). Answer
    * text is synthesized from the doc's own spans — the structure (which
    * questions carry amounts / table / header info) mirrors what the
    * reference's VLM returns for an invoice. */
  def vlmAnalysisOf(taggedDocs: DataFrame): DataFrame =
    vlmAnalysisWith(taggedDocs)
      .select("doc_id", "basic_description", "detailed_analysis")

  /** vlmAnalysisOf with the zone-report STRUCT columns kept in the output,
    * so analyzeLayout's section expressions read them directly — computing
    * the zone report once per call instead of once per consumer branch. */
  private def vlmAnalysisWith(taggedDocs: DataFrame): DataFrame = {
    val zones = ZoneDetector.detectZones(taggedDocs)
    val text = Taggers.fullText(col("tagged"))
    val withDesc = taggedDocs.select(col("doc_id"), text.as("basic_description"),
      col("tagged"))
    val joined = withDesc.join(zones, "doc_id")

    def firstZoneText(zone: String): Column =
      coalesce(
        get(filter(col("tagged"), s => s.getField("zone") === zone), lit(0))
          .getField("text"),
        lit(""))

    val amountsAnswer = concat(
      lit("Les montants et totaux: "),
      array_join(transform(col("footer.totals"), t => t.getField("context")), "; "))
    val tableAnswer = when(col("table_zone.detected"),
        lit("Oui, un tableau d'articles avec 5 colonnes"))
      .otherwise(lit("Pas de tableau détecté"))
    val headerAnswer = concat(
      when(col("header.detected"), lit("L'en-tête contient la facture et le numéro. "))
        .otherwise(lit("")),
      lit("Pied de page: "), firstZoneText("footer"))

    joined
      .withColumn("detailed_analysis", map(
        lit(invoiceQuestions(0)), concat(lit("Informations principales: "), firstZoneText("header")),
        lit(invoiceQuestions(1)), amountsAnswer,
        lit(invoiceQuestions(2)), tableAnswer,
        lit(invoiceQuestions(3)), headerAnswer))
      .drop("tagged")
  }

  /** F18 — map iteration as a relational view: one row per (question,
    * answer) entry, entry order preserved via posexplode. */
  def qaEntries(analysis: DataFrame, mapCol: String = "detailed_analysis"): DataFrame =
    analysis.select(col("doc_id"),
        posexplode(map_entries(col(mapCol))).as(Seq("q_index", "entry")))
      .select(col("doc_id"), col("q_index"),
        col("entry.key").as("question"), col("entry.value").as("answer"))

  /** zone_detector.py:94-98 — header-indicator boost from Q→A entries whose
    * QUESTION mentions the header: +2 per entry whose answer contains any
    * header keyword. */
  def headerIndicatorBoost(detailed: Column): Column =
    aggregate(
      map_entries(detailed), lit(0),
      (acc, e) => acc + when(
        (lower(e.getField("key")).contains("en-tête") ||
          lower(e.getField("key")).contains("header")) &&
          containsAny(lower(e.getField("value")), ZoneDetector.headerKeywords),
        2).otherwise(0))

  // ---- document_structure (layout_analyzer.py:66-110) --------------------

  private val sectionKeywords: Seq[(String, Seq[String])] = Seq(
    "header" -> Seq("en-tête", "header", "titre"),
    "sender_info" -> Seq("émetteur", "sender", "entreprise"),
    "recipient_info" -> Seq("destinataire", "recipient", "client"),
    "invoice_details" -> Seq("détails", "numéro", "date"),
    "items_table" -> Seq("tableau", "articles", "services"),
    "totals" -> Seq("total", "montant", "somme"),
    "footer" -> Seq("pied", "footer", "conditions"))

  /** All answer text + basic description, lowered — the `all_text` the
    * reference scans for sections (:407-412). */
  private def allText(basicDesc: Column, detailed: Column): Column =
    lower(concat(basicDesc,
      aggregate(map_entries(detailed), lit(""),
        (acc, e) => concat(acc, lit(" "), e.getField("value")))))

  def documentStructure(basicDesc: Column, detailed: Column): Column = {
    val bd = lower(basicDesc)
    val docType = when(containsAny(bd, Seq("facture", "invoice")), "invoice")
      .when(containsAny(bd, Seq("devis", "quote")), "quote")
      .when(containsAny(bd, Seq("commande", "order")), "order")
      .otherwise("unknown")
    val complexityIndicators =
      containsAny(bd, Seq("tableau", "table")).cast("int") +
        containsAny(bd, Seq("multiple", "plusieurs")).cast("int") +
        (size(map_entries(detailed)) > 5).cast("int")
    val complexity = when(complexityIndicators >= 2, "complex")
      .when(complexityIndicators === 1, "medium")
      .otherwise("simple")
    val at = allText(basicDesc, detailed)
    val sections = filter(
      array(sectionKeywords.map { case (s, _) => lit(s) }: _*),
      s => sectionKeywords.map { case (name, kws) =>
        (s === name) && containsAny(at, kws)
      }.reduce(_ || _))
    struct(docType.as("type"), lit("portrait").as("orientation"),
      sections.as("sections"), complexity.as("complexity"),
      lit("single_page").as("format"))
  }

  // ---- spatial_organization (layout_analyzer.py:112-145) -----------------

  /** zones_count over the engine's zone report columns: detected dict zones
    * (header, footer, table_zone) + list zones (address_blocks, totals). */
  def zonesCount: Column =
    col("header.detected").cast("int") +
      col("footer.detected").cast("int") +
      col("table_zone.detected").cast("int") +
      size(col("address_blocks")) +
      size(col("footer.totals"))

  /** Column-count estimate (:433-444): the reference scans answers
    * mentioning 'colonne' and returns on the FIRST one that also has
    * numbers (a number-free colonne-answer does NOT stop the scan), then
    * takes max of its numbers ≤ 10, else 1. (The reference raises
    * ValueError when that answer has numbers but none ≤ 10 — the engine
    * returns 1 there; library code must not crash on data.) */
  def estimateColumnCount(detailed: Column): Column = {
    val colAnswer = get(
      filter(map_entries(detailed), e =>
        lower(e.getField("value")).contains("colonne") &&
          e.getField("value").rlike("\\b\\d+\\b")),
      lit(0)).getField("value")
    val nums = filter(
      transform(regexp_extract_all(colAnswer, lit("\\b(\\d+)\\b"), lit(1)),
        s => s.cast("int")),
      n => n <= 10)
    coalesce(array_max(nums), lit(1))
  }

  def spatialOrganization(detailed: Column): Column = {
    val layoutType = when(zonesCount > 5, "complex")
      .when(zonesCount > 3, "structured")
      .otherwise("standard")
    struct(layoutType.as("layout_type"),
      estimateColumnCount(detailed).as("column_count"),
      lit("top_to_bottom").as("flow_direction"))
  }

  // ---- visual_hierarchy (layout_analyzer.py:147-174) ---------------------

  /** `_classify_element_type` (:351-364). */
  def classifyElementType(text: Column): Column = {
    val tl = lower(text)
    when(containsAny(tl, Seq("titre", "title")), "title")
      .when(containsAny(tl, Seq("total", "montant")), "amount")
      .when(tl.contains("date"), "date")
      .when(containsAny(tl, Seq("adresse", "address")), "address")
      .otherwise("text")
  }

  def visualHierarchy(basicDesc: Column, detailed: Column): Column = {
    val answers = transform(map_entries(detailed), e => e.getField("value"))
    val primary = transform(
      filter(answers, a =>
        containsAny(lower(a), Seq("titre", "total", "montant", "principal"))),
      a => struct(classifyElementType(a).as("type"), a.as("content"),
        lit("high").as("importance")))
    // the reference APPENDS per answer (duplicates kept, answer order)
    val emphasis = flatten(transform(answers, a => {
      val al = lower(a)
      filter(array(
        when(containsAny(al, Seq("gras", "bold", "grand", "large")), "bold_text"),
        when(containsAny(al, Seq("couleur", "color")), "color"),
        when(containsAny(al, Seq("encadré", "bordered")), "borders")),
        x => x.isNotNull)
    }))
    struct(primary.as("primary_elements"), emphasis.as("emphasis_techniques"),
      readabilityScore(basicDesc).as("readability_score"))
  }

  /** `_calculate_readability_score` (:401-419): 0.7 base ± description
    * cues, clamped to [0, 1]. */
  def readabilityScore(basicDesc: Column): Column = {
    val bd = lower(basicDesc)
    val score = lit(0.7) +
      when(containsAny(bd, Seq("claire", "clear", "lisible")), 0.2).otherwise(0.0) +
      when(containsAny(bd, Seq("organisé", "structured")), 0.1).otherwise(0.0) -
      when(containsAny(bd, Seq("flou", "blur", "illisible")), 0.3).otherwise(0.0) -
      when(containsAny(bd, Seq("désorganisé", "messy")), 0.2).otherwise(0.0)
    least(greatest(score, lit(0.0)), lit(1.0))
  }

  // ---- text_blocks (:176-191) + alignment (:193-218) ---------------------

  def textBlocks(detailed: Column): Column =
    transform(
      filter(map_entries(detailed), e => length(e.getField("value")) > 20),
      e => {
        val ql = lower(e.getField("key"))
        val al = lower(e.getField("value"))
        struct(
          e.getField("value").as("content"),
          when(containsAny(ql, Seq("en-tête", "header")), "header_text")
            .when(containsAny(ql, Seq("tableau", "table")), "table_text")
            .when(containsAny(ql, Seq("total", "montant")), "amount_text")
            .otherwise("body_text").as("type"),
          when(containsAny(ql, Seq("haut", "top", "en-tête")), "top")
            .when(containsAny(ql, Seq("bas", "bottom", "pied")), "bottom")
            .otherwise("middle").as("estimated_position"),
          when(containsAny(al, Seq("total", "montant", "facture", "invoice")), "high")
            .when(containsAny(al, Seq("date", "numéro", "reference")), "medium")
            .otherwise("low").as("importance"))
      })

  def alignmentAnalysis(basicDesc: Column): Column = {
    val bd = lower(basicDesc)
    struct(
      when(containsAny(bd, Seq("centré", "center")), "center")
        .when(containsAny(bd, Seq("droite", "right")), "right")
        .otherwise("left").as("main_alignment"),
      when(containsAny(bd, Seq("organisé", "structured", "aligné")), "excellent")
        .when(containsAny(bd, Seq("désorganisé", "messy")), "poor")
        .otherwise("good").as("consistency"))
  }

  /** `_calculate_layout_confidence` (:421-439): zone coverage × 0.7 plus
    * a 0.2 bonus for a substantial Q→A analysis, capped at 1. */
  def layoutConfidence(detailed: Column): Column =
    least(
      least(zonesCount.cast("double") / 5.0, lit(1.0)) * 0.7 +
        when(size(map_entries(detailed)) > 3, 0.2).otherwise(0.0),
      lit(1.0))

  /** Full layout analysis (layout_analyzer.py:38-64) over Extract.tag
    * output: zone report ⋈ VLM-analysis stub → one struct column per
    * section. Narrow end to end. */
  def analyzeLayout(taggedDocs: DataFrame): DataFrame = {
    // ONE zone report: vlmAnalysisWith keeps the zone struct columns in
    // its output, so no second detectZones evaluation and no re-join
    // (which doubled the narrow stage's per-doc cost)
    val vlm = vlmAnalysisWith(taggedDocs)
    vlm.select(
      col("doc_id"),
      documentStructure(col("basic_description"), col("detailed_analysis"))
        .as("document_structure"),
      spatialOrganization(col("detailed_analysis")).as("spatial_organization"),
      visualHierarchy(col("basic_description"), col("detailed_analysis"))
        .as("visual_hierarchy"),
      textBlocks(col("detailed_analysis")).as("text_blocks"),
      alignmentAnalysis(col("basic_description")).as("alignment_analysis"),
      layoutConfidence(col("detailed_analysis")).as("analysis_confidence"))
  }
}
