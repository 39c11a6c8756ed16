package graft.fixtures

import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import scala.util.Random

/** Deterministic synthetic invoice corpus — the *data half* of the reference
  * generators (data_generation/complex_facture_generator.py:36-305,
  * generate_synthetic_data.py:37-106), rendering skipped: spans are emitted
  * directly in the `input_hint` schema with synthetic bboxes following the
  * template geometry (header top, émetteur/destinataire blocks, items table,
  * récapitulatif, footer — complex_facture_generator.py:537-864) so the
  * relative-y zone banding of data_preparation.py:223-234 reproduces the
  * reference zone assignment.
  *
  * Every document is a PURE FUNCTION of (seed, doc index): generation is
  * distributed via `spark.range(n).mapPartitions` and is partition-layout
  * independent, so the same corpus can be synthesized at any scale on any
  * cluster with no data movement.
  *
  * Money is Long CENTS end-to-end (exact 2-decimal arithmetic, zero
  * BigDecimal allocation in the hot path); rendering is manual
  * StringBuilder work — the generator doubles as the benchmark input
  * producer, so its memory traffic is kept minimal.
  */
object InvoiceCorpus {

  val DefaultSeed = 42L

  // Gazetteer — fixed pools mirroring complex_facture_generator.py:40-69.
  // Re-drawing from a small fixed pool yields the mega-vendor skew the
  // engine's salting/AQE paths are exercised against (SURVEY.md §4).
  val companies: Vector[String] = Vector(
    "ATLAS TECH SOLUTIONS SARL", "MAGHREB DIGITAL SERVICES",
    "CASABLANCA IT CONSULTING", "RABAT SYSTEMS & NETWORKS",
    "MARRAKECH WEB SOLUTIONS", "FES CLOUD TECHNOLOGIES",
    "ENTREPRISE ATLAS CONSTRUCTION", "MAGHREB BATIMENT & TRAVAUX",
    "CASABLANCA CONSTRUCTION GROUP", "RABAT BUILDING SOLUTIONS",
    "MARRAKECH ARCHITECTURE & DESIGN", "FES CONSTRUCTION MODERNE",
    "ATLAS TRADING COMPANY", "MAGHREB IMPORT EXPORT",
    "CASABLANCA COMMERCIAL CENTER", "RABAT BUSINESS SOLUTIONS",
    "MARRAKECH TRADING GROUP", "FES COMMERCIAL SERVICES",
    "ATLAS CONSULTING GROUP", "MAGHREB SERVICES PROFESSIONNELS",
    "CASABLANCA CONSEIL & EXPERTISE", "RABAT SERVICES TECHNIQUES",
    "MARRAKECH SOLUTIONS BUSINESS", "FES EXPERTISE CONSEIL")

  val cities: Vector[String] = Vector(
    "Casablanca", "Rabat", "Marrakech", "Fes", "Tanger", "Settat",
    "Kenitra", "Safi", "Meknes", "Mohammedia")

  val streetTypes: Vector[String] = Vector("Avenue", "Boulevard", "Rue", "Place", "Quartier")
  val streetNames: Vector[String] =
    Vector("Mohammed V", "Hassan II", "Al Massira", "Zerktouni", "Moulay Youssef", "Anfa")

  val services: Vector[String] = Vector(
    "Developpement d'application web sur mesure",
    "Creation de plateforme e-commerce avec CMS",
    "Developpement d'API REST et integrations",
    "Application mobile native iOS Android",
    "Audit de securite informatique complet",
    "Conseil en transformation digitale",
    "Etude de faisabilite technique",
    "Formation equipe developpement",
    "Maintenance evolutive application",
    "Support technique niveau 2 et 3",
    "Supervision et monitoring 24 7",
    "Sauvegarde et archivage donnees",
    "Installation reseau entreprise",
    "Configuration serveurs dedies",
    "Mise en place solution cloud",
    "Deploiement infrastructure VPN")

  val units: Vector[String] = Vector("H", "Jour", "Forfait", "Mois", "Licence", "Unite")
  val docTypes: Vector[String] = Vector(
    "FACTURE", "FACTURE PROFORMA", "DEVIS", "FACTURE D'ACOMPTE", "FACTURE DE SOLDE")
  /** TVA rates in percent (complex_facture_generator.py:255). */
  val tvaRatesPct: Vector[Int] = Vector(20, 14, 10, 7)

  val ddmmyyyy: DateTimeFormatter = DateTimeFormatter.ofPattern("dd/MM/yyyy")

  final case class Company(name: String, address: String, city: String,
      phone: String, email: String, ice: String)

  final case class Item(description: String, quantity: Int, unit: String,
      unitPriceCents: Long, totalCents: Long)

  final case class InvoiceRecord(
      docId: String,
      number: String,
      docType: String,
      date: LocalDate,
      dueDate: LocalDate,
      vendor: Company,
      client: Company,
      vendorSurface: String, // possibly OCR-noised name as printed on the doc
      clientSurface: String,
      items: Seq[Item],
      subtotalCents: Long,
      tvaRatePct: Int,
      tvaCents: Long,
      timbreCents: Long,
      totalTtcCents: Long)

  /** Canonical entity key for a vendor surface form: lower + non-alnum → '_'. */
  def slug(name: String): String = {
    val sb = new java.lang.StringBuilder(name.length)
    var lastUnd = true // suppress leading underscore
    var i = 0
    while (i < name.length) {
      val c = Character.toLowerCase(name.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) { sb.append(c); lastUnd = false }
      else if (!lastUnd) { sb.append('_'); lastUnd = true }
      i += 1
    }
    var len = sb.length
    if (len > 0 && sb.charAt(len - 1) == '_') len -= 1
    sb.substring(0, len)
  }

  private def pad2(x: Long): String = if (x < 10) "0" + x else x.toString

  /** French-locale money rendering from cents: "1234,56". */
  def frMoney(cents: Long): String = (cents / 100).toString + "," + pad2(cents % 100)

  /** Dot-decimal money from cents: "1234.56" (triple object form,
    * = DECIMAL(18,2) cast-to-string). */
  def dotMoney(cents: Long): String = (cents / 100).toString + "." + pad2(cents % 100)

  /** Company name for pool index `idx`: the 24 reference-pool names, then
    * synthesized "<2 base tokens> <idx>" names for the entity-scale skew
    * fixture (unique per idx; the shared base tokens deliberately produce
    * giant LSH buckets — the cap/skew machinery is the thing under test).
    * The ICE still derives from the (clean) name, so noisy surface forms
    * of one vendor keep linking through the identifier star. */
  private def companyName(idx: Int): String =
    if (idx < companies.size) companies(idx)
    else {
      val parts = companies(idx % companies.size).split(' ')
      parts(0) + " " + parts(1) + " " + idx
    }

  private def genCompany(idx: Int, rng: Random): Company = {
    val name = companyName(idx)
    val city = cities(rng.nextInt(cities.size))
    val addr = streetTypes(rng.nextInt(streetTypes.size)) + " " +
      streetNames(rng.nextInt(streetNames.size)) + ", " + (10 + rng.nextInt(290)) + ", " +
      city + " " + (10000 + rng.nextInt(90000))
    val phone = "+212 0" + (5 + rng.nextInt(3)) + (10 + rng.nextInt(90)) +
      "-" + (10 + rng.nextInt(90)) + "-" + (10 + rng.nextInt(90)) + "-" + (10 + rng.nextInt(90))
    val email = "contact@" + slug(name).take(18) + ".ma"
    // ICE shape: "00" + 10 digits + "000" + 2 digits (complex_facture_generator.py:151)
    // idx % 90 keeps the 2-digit tail shape for pool-mode indices ≥ 90
    // (uniqueness rides the name-hash block)
    val ice = "00" + (1000000000L + (math.abs(name.hashCode.toLong) % 9000000000L)) +
      "000" + (10 + idx % 90)
    Company(name, addr, city, phone, email, ice)
  }

  /** OCR-noise channel for entity-linking: w.p. noiseP applies one of the
    * character-confusion / casing transforms
    * (fine-tuning-ocr/evaluation/model_evaluation.py:259-264 confusions
    * 0↔O, l↔1, S↔5). Returns a *variant surface form* of the same entity.
    */
  def noisyName(name: String, rng: Random, noiseP: Double): String = {
    if (rng.nextDouble() >= noiseP) name
    else rng.nextInt(3) match {
      case 0 => // title-case variant
        name.toLowerCase.split(' ').map(w => if (w.isEmpty) w else s"${w.head.toUpper}${w.tail}").mkString(" ")
      case 1 => // OCR confusion: O→0 and S→5 on the first token
        val ts = name.split(' ')
        (ts.head.replace('O', '0').replace('S', '5') +: ts.tail).mkString(" ")
      case _ => // dropped trailing token (truncated OCR read)
        val ts = name.split(' ')
        if (ts.length > 2) ts.init.mkString(" ") else name.toLowerCase
    }
  }

  /** Zipf(1) pool index via the closed-form log-uniform inverse transform:
    * X = e^{u·ln N} has density ∝ 1/x on [1, N), so floor(X)−1 draws index
    * k with P(k) ≈ ln((k+2)/(k+1))/ln N ∝ 1/(k+1) — the head entity gets
    * ~ln2/lnN of all mentions (≈5% at N=10⁶) and the tail is long. No
    * precomputed CDF table, so it stays allocation-free in the per-doc
    * hot path at any pool size. */
  private def zipfIdx(rng: Random, pool: Int): Int = {
    val x = math.exp(rng.nextDouble() * math.log(pool.toDouble + 1.0))
    math.min(pool - 1, math.max(0, x.toInt - 1))
  }

  /** Pure per-doc generator: everything derives from (seed, idx).
    * `vendorPool` > 0 switches to the entity-scale skew fixture (r4
    * verdict #5): vendors/clients draw Zipf(1) from a pool of that many
    * DISTINCT synthesized companies (10⁵–10⁶ typical) instead of the
    * 24-name reference gazetteer — the mode ScalingBench uses to measure
    * the entity-stage claim instead of extrapolating it. */
  def record(idx: Long, seed: Long = DefaultSeed, noiseP: Double = 0.25,
      vendorPool: Int = 0): InvoiceRecord = {
    val rng = new Random(seed * 1000003L + idx * 7919L)
    val docId = {
      val s = idx.toString
      "inv-" + ("0" * math.max(0, 6 - s.length)) + s
    }
    val number = "FACT-" + (2024 + rng.nextInt(2)) + "-" + (1000 + rng.nextInt(9000))
    val docType = docTypes(rng.nextInt(docTypes.size))
    val date = LocalDate.of(2023, 9, 1).plusDays(rng.nextInt(700).toLong)
    val dueDate = date.plusDays((15 + rng.nextInt(46)).toLong) // +15..60d (:283)
    // Zipf-ish vendor skew: 30% of invoices go to company 0 (the mega-vendor);
    // pool mode draws Zipf(1) over vendorPool distinct companies instead
    val vendorIdx =
      if (vendorPool > 0) zipfIdx(rng, vendorPool)
      else if (rng.nextDouble() < 0.30) 0 else rng.nextInt(companies.size)
    val clientIdx =
      if (vendorPool > 0) {
        val c = zipfIdx(rng, vendorPool)
        if (c == vendorIdx) (c + 1) % vendorPool else c
      } else {
        val c = rng.nextInt(companies.size - 1)
        if (c >= vendorIdx) c + 1 else c
      }
    val vendor = genCompany(vendorIdx, rng)
    val client = genCompany(clientIdx, rng)
    val vendorSurface = noisyName(vendor.name, rng, noiseP)
    val clientSurface = noisyName(client.name, rng, noiseP)
    val items = (0 until (2 + rng.nextInt(4))).map { _ =>
      val q = 1 + rng.nextInt(30)
      val upCents = 10000L + rng.nextInt(190001).toLong // 100.00 .. 2000.00
      Item(services(rng.nextInt(services.size)), q, units(rng.nextInt(units.size)),
        upCents, upCents * q)
    }
    val subtotal = items.iterator.map(_.totalCents).sum
    val ratePct = tvaRatesPct(rng.nextInt(tvaRatesPct.size))
    val tva = (subtotal * ratePct + 50) / 100 // HALF_UP at cents
    val timbre = 2000L
    InvoiceRecord(docId, number, docType, date, dueDate, vendor, client,
      vendorSurface, clientSurface, items, subtotal, ratePct, tva, timbre,
      subtotal + tva + timbre)
  }

  // --- span layout -----------------------------------------------------
  // Page 1000×1400; the "Merci" footer line is always last so total_height
  // (max y+h over spans, data_preparation.py:213-215) is the constant 1409
  // and band membership is stable. Bands at relpos thresholds
  // .2/.4/.6/.8/.95 of 1409 → y_center < 281.8 / 563.6 / 845.4 / 1127.2 /
  // 1338.5.
  private val H = 24 // standard span height

  private def fmtDate(d: LocalDate): String =
    pad2(d.getDayOfMonth.toLong) + "/" + pad2(d.getMonthValue.toLong) + "/" + d.getYear

  def spansOf(r: InvoiceRecord, seed: Long = DefaultSeed): Seq[OcrSpan] = {
    val rng = new Random(seed * 2000003L + r.docId.hashCode.toLong)
    def conf() = 0.75 + rng.nextDouble() * 0.24
    val b = Vector.newBuilder[(String, String, String, Int, Int)] // kind,text,ref,x,y
    def t(text: String, x: Int, y: Int): Unit = b += (("text", text, "", x, y))
    // header band
    b += (("media", "", "img://" + r.docId + "/logo", 60, 40))
    t(r.docType, 400, 60)
    t("N° " + r.number, 400, 110)
    t("Date:", 640, 60); t(fmtDate(r.date), 760, 60)
    t("Échéance:", 640, 110); t(fmtDate(r.dueDate), 790, 110)
    // company_info band (émetteur)
    t(r.vendorSurface, 80, 300)
    t(r.vendor.address, 80, 340)
    t("Tél: " + r.vendor.phone, 80, 380)
    t(r.vendor.email, 80, 420)
    t("ICE: " + r.vendor.ice, 80, 460)
    // client_info band (destinataire)
    t("Destinataire:", 80, 580)
    t(r.clientSurface, 80, 620)
    t(r.client.address, 80, 660)
    t("ICE: " + r.client.ice, 80, 700)
    // items band: header row + one row per item, 40px spacing (> 2×row_tol 15)
    t("Description", 80, 860); t("Qté", 480, 860); t("Unité", 560, 860)
    t("P.U.", 660, 860); t("Total", 820, 860)
    r.items.zipWithIndex.foreach { case (it, i) =>
      val y = 900 + 40 * i
      t(it.description, 80, y)
      t(it.quantity.toString, 480, y)
      t(it.unit, 560, y)
      t(frMoney(it.unitPriceCents), 660, y)
      t(frMoney(it.totalCents), 820, y)
    }
    // total band
    t("Sous-total HT: " + frMoney(r.subtotalCents) + " DH", 600, 1150)
    t("TVA (" + r.tvaRatePct + "%): " + frMoney(r.tvaCents) + " DH", 600, 1190)
    t("Timbre fiscal: " + frMoney(r.timbreCents) + " DH", 600, 1230)
    t("TOTAL TTC: " + frMoney(r.totalTtcCents) + " DH", 600, 1270)
    // footer band
    b += (("media", "", "img://" + r.docId + "/stamp", 80, 1340))
    t("Merci de votre confiance", 400, 1385)
    // reading order W1: sort by (y_center, x_center), offset = ordinal
    // (vlm/utils/geometry_utils.py:339-359); ties broken by x then text.
    val raw = b.result()
    raw.sortBy { case (_, _, _, x, y) => (y + H / 2, x + 1) }
      .zipWithIndex
      .map { case ((kind, text, ref, x, y), i) =>
        OcrSpan(kind, text, ref, i, math.min(conf(), 0.99),
          BBox(x, y, math.max(8 * text.length, 40), H))
      }
  }

  /** The corpus as a distributed Dataset — pure function of (seed, idx).
    * @param partitions explicit generation parallelism; 0 → cluster default.
    *        Explicit matters on a cluster: defaultParallelism is sampled at
    *        PLAN time, before all executors may have registered. */
  def docs(spark: SparkSession, n: Long, seed: Long = DefaultSeed,
      noiseP: Double = 0.25, partitions: Int = 0,
      vendorPool: Int = 0): Dataset[OcrDoc] =
    docsRange(spark, 0, n, seed, noiseP, partitions, vendorPool)

  /** Index slice [from, until) of the same deterministic corpus — an
    * increment of fresh documents disjoint from docs(spark, from)
    * (doc i is a pure function of (seed, i), independent of the range). */
  def docsRange(spark: SparkSession, from: Long, until: Long,
      seed: Long = DefaultSeed, noiseP: Double = 0.25,
      partitions: Int = 0, vendorPool: Int = 0): Dataset[OcrDoc] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(from, until, 1, p).mapPartitions { it =>
      it.map { i =>
        val r = record(i, seed, noiseP, vendorPool)
        OcrDoc(r.docId, 1000, 1409, spansOf(r, seed))
      }
    }
  }

  /** Ground-truth triples derived from the same records (the reference keeps
    * the same pairing: data JSON beside each rendered image,
    * complex_facture_generator.py:928-932). */
  def expectedTriples(spark: SparkSession, n: Long, seed: Long = DefaultSeed,
      noiseP: Double = 0.25): Dataset[Triple] = {
    import spark.implicits._
    import Vocab._
    spark.range(n).flatMap { i =>
      val r = record(i, seed, noiseP)
      val inv = invoiceNode(r.docId)
      val vKey = vendorNode(slug(r.vendor.name))
      val cKey = vendorNode(slug(r.client.name))
      val head = Seq(
        Triple(inv, RdfType, "facturai:Invoice"),
        Triple(inv, HasNumber, r.number),
        Triple(inv, HasDate, r.date.toString),
        Triple(inv, HasDueDate, r.dueDate.toString),
        Triple(inv, HasVendor, vKey),
        Triple(inv, HasClient, cKey),
        Triple(vKey, HasICE, r.vendor.ice),
        Triple(cKey, HasICE, r.client.ice),
        Triple(inv, HasSubtotalHT, dotMoney(r.subtotalCents)),
        Triple(inv, HasTVA, dotMoney(r.tvaCents)),
        Triple(inv, HasTotalTTC, dotMoney(r.totalTtcCents)))
      val itemTriples = r.items.zipWithIndex.flatMap { case (it, k) =>
        val li = lineItemNode(r.docId, k)
        Seq(
          Triple(inv, HasLineItem, li),
          Triple(li, HasDescription, it.description),
          Triple(li, HasQuantity, it.quantity.toString),
          Triple(li, HasAmount, dotMoney(it.totalCents)))
      }
      // sameAs ground truth: noisy surface forms are the same entity as the
      // clean gazetteer name (FIXTURES.md §3).
      val sameAs = Seq(
        (r.vendorSurface, r.vendor.name),
        (r.clientSurface, r.client.name)).collect {
        case (surf, clean) if slug(surf) != slug(clean) =>
          Triple(vendorNode(slug(surf)), SameAs, vendorNode(slug(clean)))
      }
      head ++ itemTriples ++ sameAs
    }.distinct()
  }

  /** Generator-side ground truth for the RAW (pre-entity-resolution)
    * extraction: what a correct extractor must produce from the printed
    * spans — SURFACE vendor keys (not canonical), no sameAs edges, no
    * dedup (vendor hasICE repeats across docs exactly as extraction emits
    * it). Derived from the records alone, independent of the extractor
    * under test; ExtractParitySpec gates FastExtract.triples == this set
    * (multiplicity included), which makes the committed q32 fixture a true
    * correctness oracle. */
  def expectedRawTriples(spark: SparkSession, n: Long, seed: Long = DefaultSeed,
      noiseP: Double = 0.25): Dataset[Triple] = {
    import spark.implicits._
    import Vocab._
    spark.range(n).flatMap { i =>
      val r = record(i, seed, noiseP)
      val inv = invoiceNode(r.docId)
      val vKey = vendorNode(slug(r.vendorSurface))
      val cKey = vendorNode(slug(r.clientSurface))
      Seq(
        Triple(inv, RdfType, "facturai:Invoice"),
        Triple(inv, HasNumber, r.number),
        Triple(inv, HasDate, r.date.toString),
        Triple(inv, HasDueDate, r.dueDate.toString),
        Triple(inv, HasVendor, vKey),
        Triple(inv, HasClient, cKey),
        Triple(vKey, HasICE, r.vendor.ice),
        Triple(cKey, HasICE, r.client.ice),
        Triple(inv, HasSubtotalHT, dotMoney(r.subtotalCents)),
        Triple(inv, HasTVA, dotMoney(r.tvaCents)),
        Triple(inv, HasTotalTTC, dotMoney(r.totalTtcCents))) ++
        r.items.zipWithIndex.flatMap { case (it, k) =>
          val li = lineItemNode(r.docId, k)
          Seq(
            Triple(inv, HasLineItem, li),
            Triple(li, HasDescription, it.description),
            Triple(li, HasQuantity, it.quantity.toString),
            Triple(li, HasAmount, dotMoney(it.totalCents)))
        }
    }
  }
}
