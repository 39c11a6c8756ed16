package graft.tag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone detection — the E2 stage of the reference
  * (vlm/utils/zone_detector.py:39-243): typed zone structs per document
  * scored by keyword indicators against a confidence threshold.
  *
  * The reference scores the VLM's text description; our engine scores the
  * document's own span text (the deterministic source the spans table
  * already carries). Semantics preserved:
  *  - indicator count = number of keyword hits (`kw in text`, substring);
  *  - confidence = min(indicators / |keywords|, 1.0) (:100-104,:148-152);
  *  - detected = confidence > threshold (config confidence_threshold 0.3,
  *    vlm_config.json:34);
  *  - footer zone carries the extracted amounts (F2/F4) as `totals`;
  *  - address blocks: sender/receiver by émetteur/destinataire position,
  *    postal code via F7.
  *
  * Keyword lists are the reference's own config values
  * (vlm_config.json:29-33).
  */
object ZoneDetector {

  val headerKeywords: Seq[String] = Seq("facture", "invoice", "devis", "numero", "date")
  val footerKeywords: Seq[String] = Seq("total", "tva", "ht", "ttc", "montant")
  val tableKeywords: Seq[String] = Seq("designation", "quantite", "prix", "unitaire", "ligne")
  val addressKeywords: Seq[String] = Seq("adresse", "rue", "ville", "code", "postal")
  val ConfidenceThreshold = 0.3

  /** indicator-ratio confidence for one keyword family. */
  def zoneConfidence(text: Column, keywords: Seq[String]): Column = {
    val tl = lower(text)
    val hits = keywords.map(k => when(tl.contains(k), 1).otherwise(0)).reduce(_ + _)
    least(hits.cast("double") / keywords.size, lit(1.0))
  }

  private def zoneStruct(text: Column, keywords: Seq[String]): Column = {
    val conf = zoneConfidence(text, keywords)
    struct((conf > ConfidenceThreshold).as("detected"), conf.as("confidence"))
  }

  /** Per-document zone report over the tagged docs table (Extract.tag
    * output): header/footer/table detection structs, footer totals
    * (amount value/type/context), and address blocks. One narrow select —
    * no shuffle. */
  def detectZones(taggedDocs: DataFrame): DataFrame = {
    val text = Taggers.fullText(col("tagged"))

    val totals = transform(Taggers.extractAmounts(text), a => struct(
      Taggers.normalizeAmount(a.getField("value_str")).as("value"),
      Taggers.classifyAmountType(a.getField("context")).as("type"),
      a.getField("context").as("context")))

    def addressBlock(zone: String, addrType: String): Column = {
      val spans = filter(col("tagged"), s =>
        s.getField("zone") === zone && s.getField("field_type") === "address")
      val first = get(spans, lit(0))
      when(size(spans) > 0, struct(
        lit(true).as("detected"),
        lit(0.7).as("confidence"), // reference base confidence (:205)
        first.getField("text").as("content"),
        Taggers.postalCode(first.getField("text")).as("postal_code"),
        lit(addrType).as("type")))
    }

    taggedDocs.select(
      col("doc_id"),
      zoneStruct(text, headerKeywords).as("header"),
      struct(
        (zoneConfidence(text, footerKeywords) > ConfidenceThreshold).as("detected"),
        zoneConfidence(text, footerKeywords).as("confidence"),
        totals.as("totals")).as("footer"),
      zoneStruct(text, tableKeywords).as("table_zone"),
      array_compact(array(
        addressBlock("company_info", "sender"),
        addressBlock("client_info", "receiver"))).as("address_blocks"))
  }

  /** Layout-quality assessment (layout_analyzer.py:218-284) over the zone
    * report: organization = detected zones / 5; completeness = required
    * elements (header, amounts) present / 2; clarity = base 0.8 (the
    * image-description adjustments don't apply to span input);
    * overall = 0.4·clarity + 0.4·organization + 0.2·completeness. */
  def layoutQuality(zones: DataFrame): DataFrame = {
    val clarity = lit(0.8)
    val detectedZones =
      col("header.detected").cast("int") +
        col("footer.detected").cast("int") +
        col("table_zone.detected").cast("int") +
        size(col("address_blocks")) +
        least(size(col("footer.totals")), lit(1))
    val organization = least(detectedZones.cast("double") / 5.0, lit(1.0))
    val completeness =
      (col("header.detected").cast("int") +
        (size(col("footer.totals")) > 0).cast("int")).cast("double") / 2.0
    zones.select(
      col("doc_id"),
      round(clarity, 4).as("clarity"),
      round(organization, 4).as("organization"),
      round(completeness, 4).as("completeness"),
      round(clarity * 0.4 + organization * 0.4 + completeness * 0.2, 4).as("overall_score"))
  }
}
