package graft.run

import graft.tag.Taggers
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mention-detect + per-document triple assembly.
  *
  * Everything in this stage is a NARROW transformation: zone banding, field
  * tagging and line-item row grouping are computed with array higher-order
  * functions inside each `Doc` row (SURVEY.md §3/E2: "zero shuffles if
  * computed as array HOFs inside the row"). The first shuffle of the whole
  * pipeline happens later, at entity-linking.
  *
  * Semantics reproduced (citations into /root/reference):
  *  - P2 quality filter conf>0.5 && len(trim)>1 (data_preparation.py:103,127)
  *  - A3 zone banding on y_center/total_height (data_preparation.py:197-236)
  *  - F5/F6 taggers (data_preparation.py:147-167, 238-256)
  *  - F2/F3 amount extraction + normalization (zone_detector.py:245-296)
  *  - W1 reading order (geometry_utils.py:339-359) — `offset` is the contract
  *  - W2 row grouping with row_tolerance=15 (geometry_utils.py:260-319);
  *    the greedy anchored grouping is reproduced exactly when rows are
  *    separated by > 2×tolerance, which invoice table layouts guarantee.
  */
object Extract {

  private val RowTol = 15.0

  private def bb(s: Column): Column = s.getField("bbox")

  /** Widen each span with y/x centers, zone, field_type, enhanced_type.
    * Adds `total_h` (max y+h over spans — data_preparation.py:213-215) and
    * `tagged` (all spans, incl. media) + `mentions` (P2-filtered text spans).
    */
  def tag(docs: DataFrame): DataFrame = {
    val totalH = aggregate(
      col("spans"), lit(0),
      (acc, s) => greatest(acc, bb(s).getField("y") + bb(s).getField("h")))

    def widen(s: Column, totH: Column): Column = {
      val yc = bb(s).getField("y") + bb(s).getField("h") / 2.0
      val xc = bb(s).getField("x") + bb(s).getField("w") / 2.0
      val rel = when(totH > 0, yc / totH).otherwise(0.0)
      val zone = Taggers.zoneOfRelPos(rel)
      struct(
        s.getField("kind").as("kind"),
        s.getField("text").as("text"),
        s.getField("media_ref").as("media_ref"),
        s.getField("offset").as("offset"),
        s.getField("conf").as("conf"),
        bb(s).as("bbox"),
        yc.as("yc"),
        xc.as("xc"),
        zone.as("zone"),
        Taggers.classifyTextType(s.getField("text")).as("field_type"),
        Taggers.enhanceTextType(s.getField("text"), zone).as("enhanced_type"))
    }

    docs
      .withColumn("total_h", totalH)
      .withColumn("tagged", transform(col("spans"), s => widen(s, col("total_h"))))
      .withColumn("mentions",
        filter(col("tagged"),
          s => s.getField("conf") > 0.5 && length(trim(s.getField("text"))) > 1))
  }

  /** Mentions as a flat relational view (one row per tagged span) — the
    * engine's `Mention` table, used by parity tests and metrics. */
  def mentions(docs: DataFrame): DataFrame =
    tag(docs)
      .select(col("doc_id"), explode(col("mentions")).as("m"))
      .select(
        col("doc_id"),
        col("m.offset").as("offset"),
        col("m.text").as("text"),
        col("m.conf").as("conf"),
        col("m.field_type").as("field_type"),
        col("m.zone").as("zone"),
        col("m.enhanced_type").as("enhanced_type"))

  // ---- per-doc field selectors (layout-aware) ---------------------------

  private def inZone(arr: Column, zone: String): Column =
    filter(arr, s => s.getField("zone") === zone)

  private def firstAmountIn(span: Column): Column =
    Taggers.normalizeAmount(
      get(Taggers.extractAmounts(span.getField("text")), lit(0)).getField("value_str"))

  /** Assemble (subj, pred, obj) triples per document, then explode.
    * Vendor/client objects are SURFACE entity nodes (vendor:<slug of printed
    * name>); canonicalization to linked entities happens downstream
    * (EntityLinker + ConnectedComponents). */
  def triples(docs: DataFrame): DataFrame = {
    val t = tag(docs)

    val m = col("mentions")
    val inv = concat(lit("invoice:"), col("doc_id"))

    val dateSpans = filter(m, s => s.getField("text").rlike("^\\d{2}/\\d{2}/\\d{4}$"))
    val dateRaw = get(dateSpans, lit(0)).getField("text")
    val dueRaw = get(dateSpans, lit(1)).getField("text")
    def isoDate(c: Column): Column = date_format(to_date(c, "dd/MM/yyyy"), "yyyy-MM-dd")

    val numberSpan = get(filter(m, s => s.getField("text").rlike("FACT-\\d+-\\d+")), lit(0))
    val number = regexp_extract(numberSpan.getField("text"), "(FACT-\\d+-\\d+)", 1)

    def entitySlug(c: Column): Column =
      regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", "_"), "^_|_$", "")

    val vendorSurface = get(inZone(m, "company_info"), lit(0)).getField("text")
    val vendorNode = concat(lit("vendor:"), entitySlug(vendorSurface))
    val iceRe = "^ICE:\\s*(\\d+)$"
    def iceOf(zone: String): Column =
      regexp_extract(
        get(filter(m, s => s.getField("zone") === zone && s.getField("text").rlike(iceRe)), lit(0))
          .getField("text"), iceRe, 1)

    val clientCands = filter(m,
      s => s.getField("zone") === "client_info" && !s.getField("text").endsWith(":"))
    val clientSurface = get(clientCands, lit(0)).getField("text")
    val clientNode = concat(lit("vendor:"), entitySlug(clientSurface))

    def totalZoneAmount(labelKey: String): Column = {
      val span = get(filter(m, s =>
        s.getField("zone") === "total" && lower(s.getField("text")).contains(labelKey)), lit(0))
      firstAmountIn(span)
    }
    // label→predicate mapping is layout-aware (the F4 context classifier is
    // ambiguous on full label lines: "Sous-total HT" contains "total");
    // "total ttc" is matched before plain "total" by key specificity.
    val subtotal = totalZoneAmount("sous-total")
    val tva = totalZoneAmount("tva")
    val ttc = totalZoneAmount("total ttc")

    // ---- line items: W2 row grouping as array HOFs ----
    // Structure parsing runs on ALL text spans of the items zone, NOT the
    // P2-filtered mentions: the reference's table detection
    // (geometry_utils.py:260-319) takes raw elements with no quality filter,
    // and single-character cells ("2", unit "H") are legitimate table cells.
    val items = filter(col("tagged"), s =>
      s.getField("zone") === "items" && s.getField("kind") === "text" &&
        length(s.getField("text")) > 0)
    // row leaders = the leftmost span of each y-row (tolerance 15)
    val leaders = filter(items, s =>
      !exists(items, o =>
        abs(o.getField("yc") - s.getField("yc")) <= RowTol &&
          (o.getField("xc") < s.getField("xc") ||
            (o.getField("xc") === s.getField("xc") && o.getField("offset") < s.getField("offset")))))
    val leadersSorted = array_sort(leaders, (l, r) =>
      when(l.getField("yc") < r.getField("yc"), -1)
        .when(l.getField("yc") > r.getField("yc"), 1)
        .otherwise(0).cast("int"))
    // drop the table-header row ("Description | Qté | ...")
    val dataLeaders = filter(leadersSorted, s => s.getField("text") =!= "Description")

    val itemRows = transform(dataLeaders, (leader, idx) => {
      val cells = array_sort(
        filter(items, o => abs(o.getField("yc") - leader.getField("yc")) <= RowTol),
        (l, r) =>
          when(l.getField("xc") < r.getField("xc"), -1)
            .when(l.getField("xc") > r.getField("xc"), 1)
            .otherwise(0).cast("int"))
      // only the fields itemTriples reads — an extra normalizeAmount here
      // (two regexp_replaces + decimal cast per line item) would be dead
      // compute on this file's documented per-doc bottleneck
      struct(
        idx.as("n"),
        get(cells, lit(0)).getField("text").as("description"),
        get(cells, lit(1)).getField("text").cast("int").as("quantity"),
        Taggers.normalizeAmount(get(cells, lit(4)).getField("text")).as("total"))
    })

    def tr(subj: Column, pred: String, obj: Column): Column =
      struct(subj.as("subj"), lit(pred).as("pred"), obj.cast("string").as("obj"))

    val headTriples = array(
      tr(inv, "rdf:type", lit("facturai:Invoice")),
      tr(inv, "hasNumber", number),
      tr(inv, "hasDate", isoDate(dateRaw)),
      tr(inv, "hasDueDate", isoDate(dueRaw)),
      tr(inv, "hasVendor", vendorNode),
      tr(inv, "hasClient", clientNode),
      tr(vendorNode, "hasICE", iceOf("company_info")),
      tr(clientNode, "hasICE", iceOf("client_info")),
      tr(inv, "hasSubtotalHT", subtotal),
      tr(inv, "hasTVA", tva),
      tr(inv, "hasTotalTTC", ttc))

    val itemTriples = flatten(transform(itemRows, row => {
      val li = concat(lit("lineItem:"), col("doc_id"), lit("/"), row.getField("n").cast("string"))
      array(
        tr(inv, "hasLineItem", li),
        tr(li, "hasDescription", row.getField("description")),
        tr(li, "hasQuantity", row.getField("quantity")),
        tr(li, "hasAmount", row.getField("total")))
    }))

    val all = filter(concat(headTriples, itemTriples),
      x => x.getField("obj").isNotNull && length(x.getField("obj")) > 0 &&
        x.getField("subj").isNotNull)

    t.select(col("doc_id"), explode(all).as("t"))
      .select(col("doc_id"), col("t.subj").as("subj"), col("t.pred").as("pred"),
        col("t.obj").as("obj"))
  }

  /** Vendor-mention table for entity linking: one row per (doc, role) with
    * the surface form and its blocking-relevant attributes. */
  def vendorMentions(docs: DataFrame): DataFrame = {
    val t = tag(docs)
    val m = col("mentions")
    def entitySlug(c: Column): Column =
      regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", "_"), "^_|_$", "")
    val iceRe = "^ICE:\\s*(\\d+)$"
    def iceOf(zone: String): Column =
      regexp_extract(
        get(filter(m, s => s.getField("zone") === zone && s.getField("text").rlike(iceRe)), lit(0))
          .getField("text"), iceRe, 1)
    val vendorSurface = get(inZone(m, "company_info"), lit(0)).getField("text")
    val clientCands = filter(m,
      s => s.getField("zone") === "client_info" && !s.getField("text").endsWith(":"))
    val clientSurface = get(clientCands, lit(0)).getField("text")

    val v = t.select(col("doc_id"), lit("vendor").as("role"),
      vendorSurface.as("surface"), iceOf("company_info").as("ice"))
    val c = t.select(col("doc_id"), lit("client").as("role"),
      clientSurface.as("surface"), iceOf("client_info").as("ice"))
    v.unionByName(c)
      .where(col("surface").isNotNull)
      .withColumn("entity_key", entitySlug(col("surface")))
  }
}
