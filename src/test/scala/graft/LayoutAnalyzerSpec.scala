package graft

import graft.fixtures.InvoiceCorpus
import graft.run.Extract
import graft.tag.LayoutAnalyzer
import org.apache.spark.sql.functions._

/** F18 MapType Q→A handling + layout-analyzer sections
  * (vlm_processor.py:186-196, zone_detector.py:94-98,
  * layout_analyzer.py:38-64). */
class LayoutAnalyzerSpec extends SparkSuite {
  import spark.implicits._

  private def qa(desc: String, entries: (String, String)*) = {
    val m = map(entries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    Seq(("d1", desc)).toDF("doc_id", "basic_description")
      .withColumn("detailed_analysis", m)
  }

  test("F18: map_entries explode yields one row per Q→A entry, order preserved") {
    val df = qa("desc", "q one?" -> "a one", "q two?" -> "a two", "q three?" -> "a three")
    val rows = LayoutAnalyzer.qaEntries(df)
      .as[(String, Int, String, String)].collect().sortBy(_._2)
    assert(rows.map(r => (r._3, r._4)).toSeq ==
      Seq(("q one?", "a one"), ("q two?", "a two"), ("q three?", "a three")))
  }

  test("header-indicator boost: +2 per en-tête/header entry whose answer hits a keyword") {
    val df = qa("x",
      "Quelles zones d'en-tête?" -> "l'en-tête montre la facture", // +2 (keyword 'facture')
      "header layout?" -> "contains the numero",                   // +2 (keyword 'numero')
      "Où sont les montants?" -> "facture totale",                 // question not header → 0
      "autre en-tête?" -> "rien d'utile")                          // no keyword → 0
    val boost = df.select(LayoutAnalyzer.headerIndicatorBoost($"detailed_analysis"))
      .as[Int].head()
    assert(boost == 4)
  }

  test("document structure: type, complexity indicators, sections") {
    val df = qa("Facture claire avec tableau et plusieurs articles",
      "q1?" -> "le total et la date", "q2?" -> "a", "q3?" -> "b")
    val s = df.select(LayoutAnalyzer.documentStructure($"basic_description", $"detailed_analysis").as("s"))
      .select("s.type", "s.complexity", "s.sections", "s.orientation", "s.format")
      .as[(String, String, Seq[String], String, String)].head()
    assert(s._1 == "invoice")
    assert(s._2 == "complex") // tableau + plusieurs = 2 indicators
    // sections from all_text = desc + answers: items_table (tableau/articles),
    // totals (total), invoice_details (date)
    assert(s._3.contains("items_table") && s._3.contains("totals") && s._3.contains("invoice_details"))
    assert((s._4, s._5) == ("portrait", "single_page"))
  }

  test("column-count estimate: first 'colonne' answer, max number ≤ 10, default 1") {
    def cc(entries: (String, String)*): Int =
      qa("d", entries: _*).select(LayoutAnalyzer.estimateColumnCount($"detailed_analysis"))
        .as[Int].head()
    assert(cc("q?" -> "un tableau avec 5 colonnes et 3 lignes") == 5)
    assert(cc("q?" -> "pas de tableau") == 1)
    assert(cc("q?" -> "tableau de 25 colonnes") == 1) // >10 filtered (ref would crash)
    assert(cc("q1?" -> "2 colonnes ici", "q2?" -> "9 colonnes là") == 2) // FIRST answer wins
    // a number-free colonne-answer does NOT stop the scan — the reference
    // (_estimate_column_count :433-444) only returns when the answer has
    // digits, so the LATER numbered answer wins here
    assert(cc("q1?" -> "des colonnes, oui", "q2?" -> "7 colonnes") == 7)
    assert(cc("q1?" -> "des colonnes, oui", "q2?" -> "sans nombre") == 1)
  }

  test("visual hierarchy: primary elements classified, emphasis duplicates kept in order") {
    val df = qa("claire et organisé",
      "q1?" -> "le montant total en gras et en couleur",
      "q2?" -> "titre en gras",
      "q3?" -> "rien")
    val (primary, emphasis, readability) = df.select(
        LayoutAnalyzer.visualHierarchy($"basic_description", $"detailed_analysis").as("v"))
      .select("v.primary_elements", "v.emphasis_techniques", "v.readability_score")
      .as[(Seq[(String, String, String)], Seq[String], Double)].head()
    assert(primary.map(_._1) == Seq("amount", "title")) // classify per answer
    assert(primary.forall(_._3 == "high"))
    assert(emphasis == Seq("bold_text", "color", "bold_text")) // per-answer appends, dup kept
    assert(math.abs(readability - 1.0) < 1e-9) // 0.7 + 0.2 (claire) + 0.1 (organisé)
  }

  test("readability: negative cues subtract; reference substring quirks reproduced") {
    val r1 = qa("flou et messy")
      .select(LayoutAnalyzer.readabilityScore($"basic_description")).as[Double].head()
    assert(math.abs(r1 - (0.7 - 0.3 - 0.2)) < 1e-9, r1)
    // reference quirk (Python substring `in`): "illisible" contains
    // "lisible" (+0.2) and "désorganisé" contains "organisé" (+0.1), so the
    // worst-looking description scores 0.5, not 0.2 — parity kept
    val r2 = qa("flou et désorganisé et illisible")
      .select(LayoutAnalyzer.readabilityScore($"basic_description")).as[Double].head()
    assert(math.abs(r2 - 0.5) < 1e-9, r2)
  }

  test("text blocks: substantial answers only, typed by question, importance by answer") {
    val df = qa("d",
      "Quelles zones d'en-tête et pied?" -> "une réponse substantielle sur la facture ici",
      "court?" -> "non") // ≤ 20 chars → dropped
    val blocks = df.select(LayoutAnalyzer.textBlocks($"detailed_analysis").as("b"))
      .select(explode($"b").as("x")).select("x.type", "x.estimated_position", "x.importance")
      .as[(String, String, String)].collect().toSeq
    assert(blocks == Seq(("header_text", "top", "high")))
  }

  test("alignment analysis branches") {
    def al(desc: String) = qa(desc)
      .select(LayoutAnalyzer.alignmentAnalysis($"basic_description").as("a"))
      .select("a.main_alignment", "a.consistency").as[(String, String)].head()
    assert(al("texte centré et organisé") == ("center", "excellent"))
    assert(al("tout à droite, messy") == ("right", "poor"))
    // positive cues win the chain before negative ones (reference order)
    assert(al("aligné à droite, messy") == ("right", "excellent"))
    assert(al("rien de spécial") == ("left", "good"))
  }

  test("end-to-end analyzeLayout on the fixture corpus: real map column, full section shape") {
    // noise off: the OCR-noise channel can corrupt the FACTURE header token
    // itself, which is exactly what the type detector keys on
    val tagged = Extract.tag(InvoiceCorpus.docs(spark, 25, 42L, 0.0).toDF())
    val out = LayoutAnalyzer.analyzeLayout(tagged).cache()
    try {
      assert(out.count() == 25)
      val r = out.select(
        $"document_structure.type", $"spatial_organization.column_count",
        $"spatial_organization.layout_type", $"alignment_analysis.main_alignment",
        $"analysis_confidence")
        .as[(String, Int, String, String, Double)].collect()
      // the fixture corpus mixes FACTURE and DEVIS documents — both typed
      val types = r.map(_._1).toSet
      assert(types == Set("invoice", "quote"), types)
      assert(r.count(_._1 == "invoice") > r.length / 2)
      // the fixture table header row (Description/Qté/Unité/P.U./Total)
      // intentionally misses the reference tableKeywords (ZoneDetectorSpec
      // pins table_zone.detected == 0 here), so the table answer never says
      // "colonnes" and the estimate falls back to the default 1; the
      // detected path is unit-tested above with a crafted map
      assert(r.map(_._2).toSet == Set(1), r.map(_._2).toSet)
      assert(r.forall(x => x._5 >= 0.0 && x._5 <= 1.0))
      // alignment cues are substring-matched over the full document text
      // (reference semantics), so any of the three values can legitimately
      // appear; the branch logic itself is covered by the crafted cases below
      assert(r.map(_._4).toSet.subsetOf(Set("left", "center", "right")))
      // the Q→A map feeds zone detection's boost path with real > 0 values
      val boosts = LayoutAnalyzer.vlmAnalysisOf(tagged)
        .select(LayoutAnalyzer.headerIndicatorBoost($"detailed_analysis"))
        .as[Int].collect()
      assert(boosts.forall(_ >= 2), s"header answers must carry keywords: ${boosts.toSeq.distinct}")
    } finally out.unpersist()
  }
}
