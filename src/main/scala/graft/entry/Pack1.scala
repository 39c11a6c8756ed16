package graft.entry

import graft.fixtures.InvoiceCorpus
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.run.{Extract, Pipeline}
import graft.tag.Taggers
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-contract query pack 1/5 — relational core, KG taggers, curation/dedup, KG pipeline.
  * Split from the former 6.8k-line SparkEntry (r4 verdict #4);
  * content is byte-moved, composed back in [[graft.SparkEntry]].
  * Shared helpers live in [[graft.entry.Q]]. */
private[graft] object Pack1 {
  import Q._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (SURVEY.md §2.2/2.3/2.4/2.5/2.6/2.7) ----
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_base"),
          sum(dec2(col("l_extendedprice")) * (lit(1.0) - col("l_discount")).cast(DecimalType(18, 4)))
            .cast("double").as("sum_disc"),
          count(lit(1)).as("n"))
    }),
    "q02_join_revenue" -> ((s, d) => {
      t(s, d, "orders").join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name").isin("AFRICA", "ASIA"))
        .groupBy("n_name")
        .agg(sumd(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    }),
    "q03_topk_orders" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")),
    "q04_filter_pushdown" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") && col("l_quantity") > 25)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          (dec2(col("l_extendedprice")) * (lit(1.0) - col("l_discount")).cast(DecimalType(18, 4)))
            .cast("double").as("disc_price"))),
    "q05_semi_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with"))
      val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without"))
      withO.join(withoutO, Seq("c_mktsegment"), "full")
        .na.fill(0L, Seq("n_with", "n_without"))
    }),
    "q06_distinct_union" -> ((s, d) => {
      val a = t(s, d, "lineitem").select(lit("lineitem").as("src"), col("l_returnflag").as("k"))
      val b = t(s, d, "orders").select(lit("orders").as("src"), col("o_orderstatus").as("k"))
      a.unionByName(b).distinct()
    }),
    "q07_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 2)
        .select("n_name", "c_custkey", "c_acctbal", "rk")
    }),
    "q08_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      t(s, d, "events")
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1).otherwise(0))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("new_session").as("n_sessions"))
    }),
    "q09_rollup_counters" -> ((s, d) =>
      t(s, d, "events")
        .rollup("event_type")
        .agg(count(lit(1)).as("n"), grouping(col("event_type")).cast("int").as("gid"))
        .withColumn("event_type", coalesce(col("event_type"), lit("ALL")))
        .select("event_type", "gid", "n")),
    "q10_percentiles" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("median_v"),
          round(expr("percentile(value, 0.9)"), 4).as("p90_v"))),
    "q11_decimal_key_join" -> ((s, d) => {
      // J2 tolerance join: <0.01 tolerance at 2-decimal money reduces to an
      // exact equi-join on the DECIMAL(18,2) key (SURVEY.md §2.3 J2)
      val l = t(s, d, "lineitem").select(col("l_orderkey"), dec2(col("l_extendedprice")).as("amt"))
      val o = t(s, d, "orders").select(col("o_orderkey"), dec2(col("o_totalprice")).as("amt"))
      l.join(o, "amt").select("l_orderkey", "o_orderkey").distinct()
    }),
    "q12_date_ops" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "dd/MM/yyyy").as("fr_date"),
        date_add(col("o_orderdate"), 30).as("due"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("mo"))),

    // ---- KG taggers on driver tables (F5/F6/F2/A3/W1/F13 parity) ----
    "q13_classify_text" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        Taggers.classifyTextType(col("text")).as("field_type"))),
    "q14_number_extract" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
        explode(regexp_extract_all(col("c_name"), lit("(\\d+)"), lit(1))).as("num"))),
    "q15_zone_band" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey")
      t(s, d, "lineitem")
        .withColumn("relpos",
          col("l_linenumber").cast("double") / max("l_linenumber").over(w).cast("double"))
        .withColumn("band", Taggers.zoneOfRelPos(col("relpos")))
        .groupBy("band").agg(count(lit(1)).as("n"))
    }),
    "q16_enhanced_tagger" -> ((s, d) => {
      val zone = element_at(
        array(lit("header"), lit("company_info"), lit("client_info"),
          lit("items"), lit("total"), lit("footer")),
        (pmod(col("doc_id"), lit(6)) + 1).cast("int"))
      t(s, d, "documents").select(col("doc_id"), zone.as("zone"),
        Taggers.enhanceTextType(col("text"), zone).as("enhanced_type"))
    }),
    "q17_edit_similarity" -> ((s, d) => {
      val c = t(s, d, "customer").where(col("c_custkey") < 100).select("c_name")
      val sup = t(s, d, "supplier").select("s_name")
      c.crossJoin(sup).select(col("c_name"), col("s_name"),
        round(Taggers.editSimilarity(col("c_name"), col("s_name")), 4).as("sim"))
    }),
    "q18_reading_order" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      t(s, d, "events").select(col("event_id"), col("user_id"),
        (row_number().over(w) - 1).as("offset"))
    }),

    // ---- corpus curation: dedup / similarity / text analysis ----
    "q19_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"))),
    "q20_ngram_jaccard_neardup" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), k = 5, threshold = 0.2, maxDf = 50)),
    "q21_minhash_neardup" -> ((s, d) =>
      // ORACLED (r2): candidates are verified by exact shingle Jaccard, so
      // the output equals the exact-Jaccard pair set whenever LSH recall is
      // 1.0 — which is deterministically checkable, not a coin flip: the
      // planted duplicates in `documents` all sit at jaccard ≥ 0.875
      // (measured), where missing all 8 bands has p < 3e-5 per pair and the
      // xxhash64 band hashes are a fixed function of the data. DedupSpec
      // asserts the pair-set equality as a property on the planted corpus.
      Dedup.minhashNearDup(t(s, d, "documents"), k = 5, numHashes = 16, bands = 8,
        threshold = 0.2)),
    "q22_simhash_neardup" -> ((s, d) =>
      Dedup.simhashNearDup(t(s, d, "documents"), maxHamming = 3)),
    "q23_cosine_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 8), k = 5)
    }),
    "q24_lsh_ann" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 8), k = 5, planes = 4)
    }),
    "q53_pq_ann" -> ((s, d) => {
      // product-quantization ANN: deterministic per-subspace codebooks,
      // 8-byte codes + stored exact norms on the scan side, per-query ADC
      // lookup tables, top-15 shortlist, exact-cosine rerank to top-5
      val emb = t(s, d, "embeddings")
      Similarity.pqTopK(emb, emb.where(col("vec_id") < 8), k = 5,
        m = 8, codebookSize = 16, rerankFactor = 3)
    }),
    "q57_graph_bgp" -> ((s, d) => {
      // SPARQL-style basic graph pattern over a triple-ized TPC-H star:
      // bindings for { ?c in_nation ?n . ?s supplies_nation ?n .
      // ?n in_region r0 } — each pattern is a filtered scan (constant
      // pred/obj push down; over the pred-partitioned store the pred
      // constant prunes whole directories), the conjunction folds into
      // equi joins on the shared variables. Oracle = the equivalent
      // relational join in DuckDB.
      val cust = t(s, d, "customer").select(
        concat(lit("c"), col("c_custkey")).as("subj"),
        lit("in_nation").as("pred"),
        concat(lit("n"), col("c_nationkey")).as("obj"))
      val supp = t(s, d, "supplier").select(
        concat(lit("s"), col("s_suppkey")).as("subj"),
        lit("supplies_nation").as("pred"),
        concat(lit("n"), col("s_nationkey")).as("obj"))
      val nat = t(s, d, "nation").select(
        concat(lit("n"), col("n_nationkey")).as("subj"),
        lit("in_region").as("pred"),
        concat(lit("r"), col("n_regionkey")).as("obj"))
      graft.graph.GraphQuery.bgp(cust.union(supp).union(nat), Seq(
        ("?c", "in_nation", "?n"),
        ("?s", "supplies_nation", "?n"),
        ("?n", "in_region", "r0")))
    }),
    "q56_pagerank" -> ((s, d) => {
      // fixed-point PageRank over the part co-order graph (parts sharing a
      // lineitem order; per-order quadratic is bounded by order size).
      // Long arithmetic end to end → bit-stable across layouts, which is
      // what makes a hash oracle possible; the oracle fixture is an
      // independent sequential adjacency-loop replay in tools.GenFixtures
      val edges = coOrderEdges(s, d)
      graft.graph.PageRank.run(edges, iters = 5)
        .select(col("id").as("part_id"), col("rank_fp"))
    }),
    "q66_bgp_optional" -> ((s, d) => {
      // SPARQL OPTIONAL + FILTER over a triple-ized orders graph: urgent
      // orders with their customer and priority, OPTIONALly the big-order
      // marker (only totalprice > 250000 orders carry one → ~half the
      // solutions keep a null-bound ?b). Oracle = the equivalent
      // relational LEFT-JOIN-shaped CASE on the BASE table — independent
      // of the triple-ization and the compiler.
      val ord = t(s, d, "orders")
      val subj = concat(lit("o"), col("o_orderkey"))
      val placedBy = ord.select(subj.as("subj"), lit("placed_by").as("pred"),
        concat(lit("c"), col("o_custkey")).as("obj"))
      val prio = ord.select(subj.as("subj"), lit("priority").as("pred"),
        col("o_orderpriority").as("obj"))
      val big = ord.where(col("o_totalprice") > 250000).select(
        subj.as("subj"), lit("size_class").as("pred"), lit("big").as("obj"))
      graft.graph.GraphQuery.bgpOpt(
        placedBy.union(prio).union(big),
        Seq(("?o", "placed_by", "?c"), ("?o", "priority", "?p")),
        optionals = Seq(Seq(("?o", "size_class", "?b"))),
        filters = Seq(col("p") === "1-URGENT"))
    }),
    "q67_characteristic_sets" -> ((s, d) => {
      // characteristic-sets summary (Neumann & Moerkotte) over a
      // triple-ized orders graph whose entity shapes vary by two planted
      // conditional predicates; oracle = DuckDB's list_sort(list(DISTINCT
      // pred)) re-implementation over the same construction
      val ord = t(s, d, "orders")
      val subj = concat(lit("o"), col("o_orderkey"))
      val placedBy = ord.select(subj.as("subj"), lit("placed_by").as("pred"),
        concat(lit("c"), col("o_custkey")).as("obj"))
      val prio = ord.select(subj.as("subj"), lit("priority").as("pred"),
        col("o_orderpriority").as("obj"))
      val big = ord.where(col("o_totalprice") > 250000).select(
        subj.as("subj"), lit("size_class").as("pred"), lit("big").as("obj"))
      val fin = ord.where(col("o_orderstatus") === "F").select(
        subj.as("subj"), lit("finished").as("pred"), lit("y").as("obj"))
      graft.graph.GraphStats.characteristicSets(
        placedBy.union(prio).union(big).union(fin))
    }),
    "q68_kcore" -> ((s, d) => {
      // core decomposition of the part co-order graph via synchronous
      // h-index iteration (converges exactly to coreness); the oracle
      // fixture is an INDEPENDENT Batagelj–Žaveršnik peeling replay in
      // tools.GenFixtures — a different algorithm, same fixpoint
      val e = coOrderHalf(s, d)
      graft.graph.KCore.coreness(e)
        .select(col("id").as("part_id"), col("coreness"))
    }),
    "q58_path_reachable" -> ((s, d) => {
      // SPARQL property path `reports_to+`: transitive closure over the
      // customer parent tree (c_custkey → c_custkey div 2 — depth ~log₂ n,
      // so the semi-naive loop runs a realistic number of rounds). Oracle
      // = DuckDB's recursive CTE, the sequential definition.
      val e = t(s, d, "customer").where(col("c_custkey") > 1).select(
        concat(lit("c"), col("c_custkey")).as("src"),
        concat(lit("c"), expr("c_custkey div 2")).as("dst"))
      graft.graph.GraphQuery.reachable(e)
    }),
    "q59_triangles" -> ((s, d) => {
      // per-node triangle counts over the part co-order graph via
      // degree-ordered orientation (compact-forward); the oracle is
      // DuckDB's id-ordered 3-way join — a genuinely different
      // orientation scheme that must find the same triangles
      val e = coOrderHalf(s, d)
      graft.graph.Triangles.perNode(e)
        .select(col("id").cast("long").as("part_id"), col("n_tri"))
    }),
    "q60_shape_validation" -> ((s, d) => {
      // SHACL-style shape validation over an order-triple graph with
      // violations PLANTED deterministically (missing placed_by at
      // key%97=0, a second status at %89=0, a malformed ref at %83=0, a
      // dangling vendor at %101=0); both engines build the same triples,
      // the oracle re-implements the checks as GROUP BY/HAVING + regex +
      // NOT IN in DuckDB
      import graft.graph.Validate, graft.graph.Validate.Shape
      val ord = t(s, d, "orders")
      val subj = concat(lit("o"), col("o_orderkey"))
      val placedBy = ord.where(col("o_orderkey") % 97 =!= 0).select(
        subj.as("subj"), lit("placed_by").as("pred"),
        concat(lit("c"),
          when(col("o_orderkey") % 101 === 0, lit(0)).otherwise(col("o_custkey"))).as("obj"))
      val status = ord.select(subj.as("subj"), lit("status").as("pred"),
        col("o_orderstatus").as("obj"))
      val statusDup = ord.where(col("o_orderkey") % 89 === 0).select(
        subj.as("subj"), lit("status").as("pred"),
        concat(col("o_orderstatus"), lit("?")).as("obj"))
      val ref = ord.select(subj.as("subj"), lit("ref").as("pred"),
        when(col("o_orderkey") % 83 === 0, col("o_orderkey").cast("string"))
          .otherwise(concat(lit("R"), col("o_orderkey"))).as("obj"))
      val triples = placedBy.union(status).union(statusDup).union(ref)
      val customers = t(s, d, "customer")
        .select(concat(lit("c"), col("c_custkey")).as("member"))
      Validate.validate(
        ord.select(subj.as("subj")), triples,
        Seq(
          Shape("placed_by", minCount = 1, maxCount = 1, objIn = Some(customers)),
          Shape("status", minCount = 1, maxCount = 1),
          Shape("ref", minCount = 1, maxCount = 1,
            objPattern = Some("^R[0-9]+$"))))
    }),
    "q61_random_walks" -> ((s, d) => {
      // deterministic DeepWalk walks over the (undirected) part co-order
      // graph: neighbor arrays sorted, step choice =
      // xxhash64(seed, walk_id, step) mod degree — bit-stable across
      // layouts, which is what makes a hash oracle possible; the fixture
      // is an independent sequential replay in tools.GenFixtures
      val e = coOrderEdges(s, d)
      val startsDf = t(s, d, "part").where(col("p_partkey") % 40 === 0)
        .select(col("p_partkey").as("id"))
      graft.graph.RandomWalks.walkSteps(e, startsDf, length = 8, seed = 7L)
    }),
    "q62_skipgram" -> ((s, d) => {
      // skip-gram (center, context) training pairs from the q61 walks —
      // engine expands the window per row with array HOFs (no self-join);
      // the oracle expands it RELATIONALLY in DuckDB (walk-id self-join
      // over the independently-replayed committed walk fixture)
      val e = coOrderEdges(s, d)
      val startsDf = t(s, d, "part").where(col("p_partkey") % 40 === 0)
        .select(col("p_partkey").as("id"))
      val w = graft.graph.RandomWalks.walks(e, startsDf, length = 8, seed = 7L)
      graft.graph.RandomWalks.skipGramPairs(w, window = 2)
    }),
    "q63_bfs_distances" -> ((s, d) => {
      // multi-source BFS over the customer parent tree, edges parent→child
      // so the roots fan out; landmark set {c1 (root), c5 (a subtree)} —
      // one BFS advances both. Oracle = DuckDB's recursive CTE with
      // min(dist), the sequential definition, independent of the engine's
      // first-seen semi-naive frontier.
      import s.implicits._
      val e = t(s, d, "customer").where(col("c_custkey") > 1).select(
        concat(lit("c"), expr("c_custkey div 2")).as("src"),
        concat(lit("c"), col("c_custkey")).as("dst"))
      graft.graph.Distances.fromLandmarks(e, Seq("c1", "c5").toDF("id"))
    }),
    "q65_node2vec_walks" -> ((s, d) => {
      // node2vec second-order biased walks (p=4 return-averse, q=0.25
      // outward-keen) over the part co-order graph; deterministic
      // Efraimidis–Spirakis choice keyed by xxhash64 — the fixture is an
      // independent sequential replay in tools.GenFixtures
      val e = coOrderEdges(s, d)
      val startsDf = t(s, d, "part").where(col("p_partkey") % 40 === 0)
        .select(col("p_partkey").as("id"))
      graft.graph.RandomWalks.walksBiased(e, startsDf, length = 8,
        p = 4.0, q = 0.25, seed = 7L)
        .select(col("walk_id"), posexplode(col("path")).as(Seq("step", "node")))
    }),
    "q64_communities" -> ((s, d) => {
      // deterministic synchronous label propagation over the part co-order
      // graph; the oracle fixture is an independent sequential replay
      // (driver adjacency maps, 4 rounds) in tools.GenFixtures
      val e = coOrderHalf(s, d)
      graft.graph.Communities.labelPropagation(e, iters = 4)
        .select(col("id").as("part_id"), col("community"))
    }),
    "q55_semdedup" -> ((s, d) =>
      // SemDeDup semantic dedup: deterministic-quantizer clustering →
      // within-cluster cosine pairs → CC groups → keep the member LEAST
      // similar to its centroid; the oracle fixture is an independent
      // naive transcription (all-pairs + union-find) in tools.GenFixtures
      Similarity.semdedup(t(s, d, "embeddings"), threshold = 0.2, nCentroids = 8)
        .select(col("vec_id"), col("cluster_id"), col("centroid_sim"),
          col("group_id"), col("keep").cast("int").as("keep"))),
    "q25_lang_id" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"), TextOps.langId(col("text")).as("pred_lang"))),
    "q26_quality_score" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"))),
    "q27_token_counts" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextOps.tokenCountWs(col("text")).as("n_ws"),
        TextOps.tokenCountBpe(col("text")).as("n_bpe"))),
    "q28_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))),
    "q48_bpe_tokens" -> ((s, d) =>
      // REAL vocab-driven BPE counts from the committed merge table
      // (ops.Bpe, iterative lowest-rank merging); the oracle fixture is the
      // independent sequential-replay implementation in tools.GenFixtures
      graft.ops.Bpe.tokenCounts(t(s, d, "documents"))),
    "q49_decontamination" -> ((s, d) => {
      // training-data decontamination: verbatim word-8-gram overlap vs an
      // "eval set" (every 20th document) — broadcast eval grams, narrow
      // corpus explode; oracle is the independent DuckDB list-slice SQL
      val docs = t(s, d, "documents")
      Dedup.contamination(docs, docs.where(col("doc_id") % 20 === 0), k = 8)
        .select(col("doc_id"), col("hits"), col("contaminated").cast("int").as("contaminated"))
    }),
    "q50_pii_redact" -> ((s, d) => {
      // PII detect/redact over a deterministic contact blob synthesized from
      // the customer table (both engines build the SAME text; the regex
      // detection + Luhn card validation + redaction are what's under test)
      import graft.ops.Curation
      val phone = format_string("%02d-%03d-%03d-%04d",
        lit(10L) + col("c_custkey") % 90, (col("c_custkey") * 7) % 1000,
        (col("c_custkey") * 13) % 1000, (col("c_custkey") * 37) % 10000)
      val handle = regexp_replace(lower(col("c_name")), "[^a-z0-9]", "")
      val card = lpad(
        ((col("c_custkey") * 1234567890123L + 4532015112830366L) % 10000000000000000L)
          .cast("string"), 16, "0")
      val text = concat_ws(" ", col("c_name"), lit("contact"), phone, lit("mail"),
        concat(handle, lit("@corp.example.com")), lit("ref"), card)
      Curation.piiScan(
        t(s, d, "customer").select(col("c_custkey"), text.as("pii_text")),
        col("pii_text"), col("c_custkey"))
    }),
    "q51_repetition" -> ((s, d) =>
      // Gopher-style repetition metrics: a single narrow projection (the
      // top-bigram count is a sorted-run fold per row, NOT an explode +
      // corpus-wide groupBy); the oracle is an independent unnest+GROUP BY
      graft.ops.Curation.repetitionMetrics(t(s, d, "documents"), col("text"), col("doc_id"))),
    "q52_stratified_sample" -> ((s, d) =>
      // deterministic per-language hash sampling: keep iff the q28-proven
      // rolling fingerprint of ('s:' || doc_id) mod 100 < the stratum rate —
      // seed-free, partition-layout-independent, idempotent across reruns
      graft.ops.Curation.stratifiedSample(
        t(s, d, "documents").select("doc_id", "lang"), col("doc_id"), col("lang"),
        Map("en" -> 30, "fr" -> 60, "de" -> 80, "es" -> 45, "zh" -> 15), defaultRate = 5)
        .select("doc_id", "lang", "bucket")),
    "q54_seq_packing" -> ((s, d) =>
      // concat-and-chunk sequence packing (GPT-style training layout): a
      // distributed prefix sum over id order — range exchange + within-
      // bucket window + bucket-count-bounded offset window; the oracle is
      // DuckDB's global window (the sequential definition)
      graft.ops.Curation.packSequences(
        t(s, d, "documents").select(col("doc_id"),
          TextOps.tokenCountWs(col("text")).as("n")),
        col("doc_id"), col("n"), budget = 512L)),
    "q29_salted_agg" -> ((s, d) => {
      // skew-safe two-phase aggregation (SURVEY.md §4): partial agg on
      // (key, salt), final agg on key — result identical to plain GROUP BY
      val salted = t(s, d, "events")
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)))
        .groupBy("event_type", "salt")
        .agg(sum(dec2(col("value"))).as("pv"), count(lit(1)).as("pn"))
      salted.groupBy("event_type")
        .agg(sum("pv").cast("double").as("total_value"), sum("pn").as("n"))
    }),
    "q30_entity_cc" -> ((s, d) => {
      // connected components on a deterministic star graph: nation→region
      val edges = t(s, d, "nation").select(
        format_string("n%03d", col("n_nationkey")).as("src"),
        format_string("r%03d", col("n_regionkey")).as("dst"))
      graft.canon.ConnectedComponents.run(edges)
    }),
    "q31_stream_window" -> ((s, d) =>
      // batch form of the streaming tumbling-window aggregation
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).cast("double").as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))),

    // ---- KG pipeline on the fixture corpus ----
    "q32_kg_triples" -> ((s, d) => {
      // production extraction path (typed FastExtract — the one Pipeline
      // uses); declarative-vs-fast parity is locked by ExtractParitySpec and
      // the declarative path stays driver-exercised via entry(). r1 ran the
      // interpreted-HOF path here: 32.7 s of the bench for 200 docs.
      import s.implicits._
      graft.run.FastExtract.triples(
        InvoiceCorpus.docs(s, 200).toDF()
          .selectExpr("doc_id", "page_w", "page_h", "spans")
          .as[graft.model.OcrDoc]).toDF()
    }),
    "q33_kg_entity_resolution" -> ((s, d) =>
      Pipeline.run(InvoiceCorpus.docs(s, 200).toDF())
        .where(col("pred") === "sameAs")),
    "q34_media_decode" -> ((s, d) =>
      Multimodal.decodeAndFeaturize(
        graft.fixtures.MediaFixtures.mediaTable(InvoiceCorpus.docs(s, 200).toDF())).toDF()
        .select("media_ref", "kind", "width", "height", "n_frames")),
    "q35_fieldtag_expr" -> ((s, d) =>
      // the fused custom Catalyst expression (doGenCode path) — same oracle
      // CASE as q13, so the driver gate itself proves expression parity
      t(s, d, "documents").select(col("doc_id"),
        call_function("invoice_field_tag", col("text")).as("field_type"))),
    "q36_embedding_neardup" -> ((s, d) => {
      // exact all-pairs cosine near-dup on a bounded id range (oracle-able);
      // the LSH-blocked scale path is q37
      val e = t(s, d, "embeddings").where(col("vec_id") < 200)
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"),
        Similarity.norm(col("embedding")).as("n_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"),
        Similarity.norm(col("embedding")).as("n_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("sim_raw",
          when(col("n_a") * col("n_b") === 0, 0.0)
            .otherwise(Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
        .where(col("sim_raw") >= 0.2) // filter on the unrounded value (= oracle)
        .select(col("id_a"), col("id_b"), round(col("sim_raw"), 4).as("sim"))
    }),
    "q37_embedding_neardup_lsh" -> ((s, d) =>
      // banded multi-table defaults (planes=2, tables=12): recall ≈ 0.99 at
      // the 0.2 threshold (SimilaritySpec gates ≥ 0.95); r1's single
      // 4-plane AND-bucket measured 72%
      Similarity.neardupPairs(t(s, d, "embeddings"), threshold = 0.2)),

    // ---- r2 operators: cross-validation, zone eval, F18, layout, W6 ----
    "q38_ocr_amount_validation" -> ((s, d) => {
      // OCR⋈VLM amount cross-validation (ocr_integration.py:185-210,
      // 281-310): orders play the VLM amounts, lineitem rows play the OCR
      // span texts of the same doc; banded decimal-key join inside
      val vlm = t(s, d, "orders").select(col("o_orderkey").as("doc_id"),
        dec2(col("o_totalprice")).as("amount"), lit(0.9).as("confidence"))
      val ocr = t(s, d, "lineitem").select(col("l_orderkey").as("doc_id"),
        concat(lit("Montant: "), dec2(col("l_extendedprice")).cast("string"),
          lit(" DH")).as("text"))
      graft.link.CrossValidate.validateAmounts(vlm, ocr)
        .select(col("doc_id"), col("amount").cast("double").as("amount"),
          round(col("confidence"), 4).as("confidence"), col("validated_by_ocr"))
    }),
    "q39_zone_eval" -> ((s, d) => {
      // zone-level evaluation formulas (evaluation.py:346-396) over
      // deterministic pseudo-detections — the formulas are the operator
      import graft.metrics.Evaluation
      val doc = t(s, d, "documents")
      val det = length(col("text")) % 2 === 0
      val exp_ = col("doc_id") % 3 === 0
      val detCnt = (col("doc_id") % 4).cast("int")
      val expCnt = (length(col("text")) % 3).cast("int")
      doc.select(col("doc_id"),
          Evaluation.zoneDetectionEval(det, exp_).as("z"),
          Evaluation.tableCountEval(detCnt, expCnt).as("tbl"))
        .select(col("doc_id"),
          col("z.precision").as("zp"), col("z.recall").as("zr"),
          round(col("z.f1_score"), 4).as("zf1"),
          round(col("tbl.precision"), 4).as("cp"),
          round(col("tbl.recall"), 4).as("cr"),
          round(col("tbl.f1_score"), 4).as("cf1"))
    }),
    "q40_qa_map_explode" -> ((s, d) => {
      // F18: Q→A MapType iteration (vlm_processor.py:193-196) — map built
      // from per-doc analysis columns, exploded entry-by-entry in order
      val doc = t(s, d, "documents")
      val m = map(
        lit("lang?"), TextOps.langId(col("text")),
        lit("len?"), length(col("text")).cast("string"),
        lit("tokens?"), TextOps.tokenCountWs(col("text")).cast("string"))
      graft.tag.LayoutAnalyzer.qaEntries(
        doc.select(col("doc_id"), m.as("detailed_analysis")))
    }),
    "q41_layout_sections" -> ((s, d) => {
      // layout-analyzer sections (layout_analyzer.py:38-64) over the
      // documents table: text plays the basic description, a constructed
      // Q→A map exercises the column-count path incl. the >10 fallback
      import graft.tag.LayoutAnalyzer
      val doc = t(s, d, "documents")
      val m = map(
        lit("Y a-t-il des tableaux ou listes d'articles?"),
        concat(lit("tableau avec "), (col("doc_id") % 12).cast("string"),
          lit(" colonnes")))
      doc.select(col("doc_id"),
          LayoutAnalyzer.documentStructure(col("text"), m).as("ds"),
          LayoutAnalyzer.estimateColumnCount(m).as("column_count"),
          round(LayoutAnalyzer.readabilityScore(col("text")), 4).as("readability"),
          LayoutAnalyzer.alignmentAnalysis(col("text")).as("al"))
        .select(col("doc_id"), col("ds.type").as("doc_type"),
          col("ds.complexity").as("complexity"),
          array_join(col("ds.sections"), ",").as("sections"),
          col("column_count"), col("readability"),
          col("al.main_alignment").as("main_alignment"),
          col("al.consistency").as("consistency"))
    }),
    "q42_proximity_groups" -> ((s, d) => {
      import s.implicits._
      graft.tag.Proximity.proximityGroups(
        InvoiceCorpus.docs(s, 200).toDF()
          .selectExpr("doc_id", "page_w", "page_h", "spans")
          .as[graft.model.OcrDoc], threshold = 50.0)
    }),
    "q43_ivf_ann" -> ((s, d) => {
      // deterministic quantizer (driver Lloyd's over the id-sorted sample)
      // makes the inverted lists — and so the probe results — bit-stable,
      // which lets this be hash-oracled against an independent driver scan
      val emb = t(s, d, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 8), k = 5,
        nCentroids = 16, nprobe = 4, deterministicQuantizer = true)
    }),
    "q44_validation_score" -> ((s, d) => {
      // integration/validation scoring (ocr_integration.py:250-318) over
      // deterministic pseudo-inputs — the scoring formulas are the operator
      import graft.link.CrossValidate
      val doc = t(s, d, "documents")
      val score = CrossValidate.integrationScore(
        col("doc_id") % 2 === 0, col("doc_id") % 3 === 0,
        length(col("text")) % 2 === 0, col("doc_id") % 5 === 0,
        (col("doc_id") % 100).cast("double") / 100.0)
      val vlmConf = (length(col("text")) % 10).cast("double") / 10.0
      doc.select(col("doc_id"),
        round(score, 4).as("integration_score"),
        round(CrossValidate.overallConfidence(vlmConf, score), 4).as("overall_confidence"),
        CrossValidate.reliability(score).as("reliability"))
    }),
    "q45_image_quality" -> ((s, d) => {
      // P8 — quality metrics + gated enhancement + rollback on REAL decoded
      // pixels (image_enhancement.py:99-128, :291-358); metrics are a pure
      // function of media_ref (its PNG payload is) → committed fixture
      // oracle, drift-guarded in ImageQualitySpec
      graft.ops.ImageQuality.enhance(
          graft.fixtures.MediaFixtures.mediaTable(InvoiceCorpus.docs(s, 200).toDF())).toDF()
        .select(col("media_ref"),
          round(col("sharpness"), 4).as("sharpness"),
          round(col("contrast"), 4).as("contrast"),
          round(col("brightness"), 4).as("brightness"),
          round(col("noise"), 4).as("noise"),
          round(col("quality_score"), 4).as("quality_score"),
          col("needs_contrast"), col("needs_denoise"), col("needs_sharpen"),
          col("conservative"), col("rolled_back"))
    }),
    "q47_dedup_groups" -> ((s, d) => {
      // pair mining → duplicate GROUPS (transitive closure over q21's
      // minhash pair graph). dupGroups handles the integral doc ids
      // internally (numeric-min group labels, long output — no caller-side
      // zero-padding shim); the DuckDB oracle recomputes the components
      // INDEPENDENTLY via a recursive CTE — a second, SQL-implemented
      // connected-components algorithm.
      Dedup.dupGroups(Dedup.minhashNearDup(t(s, d, "documents"), k = 5,
        numHashes = 16, bands = 8, threshold = 0.2))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('AFRICA','ASIA') GROUP BY n_name""".stripMargin,
    "q03_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q04_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        | CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS disc_price
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_quantity > 25""".stripMargin,
    "q05_semi_anti" ->
      """SELECT c_mktsegment,
        | CAST(SUM(CASE WHEN c_custkey IN (SELECT o_custkey FROM orders) THEN 1 ELSE 0 END) AS BIGINT) AS n_with,
        | CAST(SUM(CASE WHEN c_custkey IN (SELECT o_custkey FROM orders) THEN 0 ELSE 1 END) AS BIGINT) AS n_without
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q06_distinct_union" ->
      """SELECT DISTINCT * FROM (
        | SELECT 'lineitem' AS src, l_returnflag AS k FROM lineitem
        | UNION ALL SELECT 'orders' AS src, o_orderstatus AS k FROM orders)""".stripMargin,
    "q07_window_rank" ->
      """SELECT n_name, c_custkey, c_acctbal, rk FROM (
        | SELECT n_name, c_custkey, c_acctbal,
        |  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
        | FROM customer JOIN nation ON c_nationkey = n_nationkey) WHERE rk <= 2""".stripMargin,
    "q08_sessionize" ->
      """SELECT user_id, COUNT(*) AS n_events, CAST(SUM(new_session) AS BIGINT) AS n_sessions FROM (
        | SELECT user_id,
        |  CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
        | FROM (SELECT user_id, ts,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |       FROM events)) GROUP BY user_id""".stripMargin,
    "q09_rollup_counters" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        | CAST(grouping(event_type) AS INT) AS gid, COUNT(*) AS n
        |FROM events GROUP BY ROLLUP(event_type)""".stripMargin,
    "q10_percentiles" ->
      """SELECT event_type,
        | round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS median_v,
        | round(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS p90_v
        |FROM events GROUP BY event_type""".stripMargin,
    "q11_decimal_key_join" ->
      """SELECT DISTINCT l_orderkey, o_orderkey
        |FROM (SELECT l_orderkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS amt FROM lineitem) l
        |JOIN (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS amt FROM orders) o
        |USING (amt)""".stripMargin,
    "q12_date_ops" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%d/%m/%Y') AS fr_date,
        | CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due,
        | year(o_orderdate) AS y, month(o_orderdate) AS mo
        |FROM orders""".stripMargin,
    "q13_classify_text" ->
      s"SELECT doc_id, $classifySql AS field_type FROM documents",
    "q14_number_extract" ->
      """SELECT c_custkey, unnest(regexp_extract_all(c_name, '(\d+)', 1)) AS num
        |FROM customer""".stripMargin,
    "q15_zone_band" -> {
      val rel = "CAST(l_linenumber AS DOUBLE) / CAST(max_ln AS DOUBLE)"
      s"""SELECT band, COUNT(*) AS n FROM (
         | SELECT ${zoneBandSql(rel)} AS band FROM (
         |  SELECT l_linenumber, max(l_linenumber) OVER (PARTITION BY l_orderkey) AS max_ln
         |  FROM lineitem)) GROUP BY band""".stripMargin
    },
    "q16_enhanced_tagger" -> {
      val zone = "['header','company_info','client_info','items','total','footer'][CAST(doc_id % 6 AS INT) + 1]"
      s"""SELECT doc_id, $zone AS zone, ${enhanceSql(zone)} AS enhanced_type
         |FROM documents""".stripMargin
    },
    "q17_edit_similarity" ->
      """SELECT c_name, s_name,
        | round(CASE WHEN greatest(length(c_name), length(s_name)) = 0 THEN 1.0
        |  ELSE 1.0 - CAST(levenshtein(lower(c_name), lower(s_name)) AS DOUBLE)
        |         / greatest(length(c_name), length(s_name)) END, 4) AS sim
        |FROM (SELECT c_name FROM customer WHERE c_custkey < 100), (SELECT s_name FROM supplier)""".stripMargin,
    "q18_reading_order" ->
      """SELECT event_id, user_id,
        | row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) - 1 AS offset
        |FROM events""".stripMargin,
    "q19_dedup_exact" ->
      "SELECT min(doc_id) AS keep_id, COUNT(*) AS n_dups FROM documents GROUP BY text",
    "q20_ngram_jaccard_neardup" ->
      // df-capped shingles BLOCK (candidate pairs share ≥1 kept shingle);
      // the SCORE is exact Jaccard over the FULL shingle sets
      """WITH words AS (
        | SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT DISTINCT id, shingle FROM (
        |  SELECT id, array_to_string(w[i:i+4], ' ') AS shingle
        |  FROM words, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)
        |  WHERE len(w) >= 5)),
        |sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
        |kept AS (SELECT id, shingle FROM sh
        |         WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50)),
        |cand AS (
        | SELECT DISTINCT a.id AS id_a, b.id AS id_b
        | FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.id < b.id),
        |inter AS (
        | SELECT c.id_a, c.id_b, COUNT(*) AS i
        | FROM cand c
        | JOIN sh a ON a.id = c.id_a
        | JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
        | GROUP BY c.id_a, c.id_b)
        |SELECT id_a, id_b,
        | round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
        |FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
        |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.2""".stripMargin,
    // exact n-gram Jaccard pairs WITHOUT the df cap: equals the minhash-LSH
    // output because every candidate is verified by exact Jaccard and LSH
    // recall on the planted duplicates (all at j ≥ 0.875) is deterministic
    // (see the q21 query comment; DedupSpec asserts the set equality)
    "q21_minhash_neardup" ->
      """WITH words AS (
        | SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT DISTINCT id, shingle FROM (
        |  SELECT id, array_to_string(w[i:i+4], ' ') AS shingle
        |  FROM words, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)
        |  WHERE len(w) >= 5)),
        |sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
        |common AS (
        | SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
        | FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        | GROUP BY a.id, b.id)
        |SELECT id_a, id_b,
        | round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 4) AS jaccard
        |FROM common JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
        |WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.2""".stripMargin,
    "q23_cosine_topk" ->
      // zero-norm guard mirrors the Spark side's when(qn*cn === 0, 0.0)
      // (q36's oracle has the same guard; an unguarded x/0.0 would error
      // or produce inf on an all-zero embedding row)
      """WITH norms AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding]), (a,b) -> a+b)) AS nm
        | FROM embeddings),
        |scored AS (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  round(CASE WHEN q.nm * c.nm = 0 THEN 0.0 ELSE
        |   list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |     [CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) FOR p IN list_zip(q.embedding, c.embedding)]),
        |    (a, b) -> a + b) / (q.nm * c.nm) END, 4) AS sim
        | FROM (SELECT * FROM norms WHERE vec_id < 8) q, norms c
        | WHERE q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, rank, sim FROM (
        | SELECT query_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        | FROM scored) WHERE rank <= 5""".stripMargin,
    "q25_lang_id" -> s"SELECT doc_id, $langCaseSql AS pred_lang FROM ($langScoresFromDocs)",
    "q26_quality_score" -> {
      val all = TextOps.langMarkers.flatMap(_._2).distinct
      val hits = all.map(m => s"contains(' ' || lower(text) || ' ', '$m')::INT").mkString(" + ")
      s"""SELECT doc_id, round(greatest(0.0, least(1.0,
         |  least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.5
         |  + (CAST(($hits) AS DOUBLE) / ${all.size}.0) * 0.5
         |  - greatest(CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g')) AS DOUBLE)
         |           / length(text) END - 0.2, 0.0))), 4) AS q
         |FROM documents""".stripMargin
    },
    "q27_token_counts" ->
      """SELECT doc_id,
        | CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe
        |FROM documents""".stripMargin,
    "q28_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   [CAST(unicode(c) AS BIGINT) FOR c IN string_split(text, '')]),
        |  (h, c) -> (h * 31 + c) % 2147483647) AS fp
        |FROM documents""".stripMargin,
    "q48_bpe_tokens" ->
      """SELECT doc_id, n_tokens_bpe
        |FROM read_parquet('/root/repo/src/test/resources/expected/q48_expected_bpe.parquet')""".stripMargin,
    "q49_decontamination" ->
      """WITH words AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |g AS (
        | SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS gram
        | FROM words, unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS t(i)
        | WHERE len(w) >= 8),
        |e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
        |h AS (SELECT g.doc_id, COUNT(*) AS hits FROM g JOIN e USING (gram) GROUP BY 1)
        |SELECT d.doc_id, COALESCE(h.hits, 0) AS hits,
        |       CAST(COALESCE(h.hits, 0) >= 1 AS INTEGER) AS contaminated
        |FROM documents d LEFT JOIN h USING (doc_id)""".stripMargin,
    "q29_salted_agg" ->
      """SELECT event_type,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q30_entity_cc" ->
      """WITH nodes AS (
        | SELECT format('n{:03d}', n_nationkey) AS id, n_regionkey AS r FROM nation
        | UNION ALL SELECT DISTINCT format('r{:03d}', n_regionkey), n_regionkey FROM nation),
        |comp AS (SELECT r, min(id) AS component FROM nodes GROUP BY r)
        |SELECT id, component FROM nodes JOIN comp USING (r)""".stripMargin,
    "q31_stream_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        | COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // q33's oracle is the GENERATOR-side ground truth (the planted sameAs
    // edges of the fixture corpus, written by graft.tools.GenFixtures from
    // InvoiceCorpus.expectedTriples) — independent of the extractor+linker
    // under test, so this is a true correctness oracle, not an output pin.
    "q33_kg_entity_resolution" ->
      """SELECT subj, pred, obj
        |FROM read_parquet('/root/repo/src/test/resources/expected/q33_expected_sameas.parquet')""".stripMargin,
    // q32's oracle is likewise GENERATOR-side: expectedRawTriples derives
    // the raw extraction ground truth (surface keys, no dedup) from the
    // records alone; ExtractParitySpec gates live == fixture so this is a
    // true correctness oracle for the extraction contract.
    "q32_kg_triples" ->
      """SELECT subj, pred, obj
        |FROM read_parquet('/root/repo/src/test/resources/expected/q32_expected_raw.parquet')""".stripMargin,
    // q42's oracle is an INDEPENDENT driver-side transcription of the
    // reference greedy loop over the generator's spans (GenFixtures
    // .greedyReference); ProximitySpec gates the engine against it.
    "q42_proximity_groups" ->
      """SELECT doc_id, "offset", group_id
        |FROM read_parquet('/root/repo/src/test/resources/expected/q42_expected_groups.parquet')""".stripMargin,
    // q22's oracle is a naive all-pairs hamming scan over the sf0.01
    // documents' signatures (GenFixtures) — it verifies the distributed
    // pigeonhole blocking independently; the signature function itself is
    // parity-locked in SimhashParity. Tied to sf0.01, the driver's
    // correctness scale.
    "q22_simhash_neardup" ->
      """SELECT id_a, id_b, hamming
        |FROM read_parquet('/root/repo/src/test/resources/expected/q22_expected_pairs.parquet')""".stripMargin,
    // q37/q24: the hyperplane LSH is deterministic (xxhash64-parity
    // planes), so GenFixtures computes the expected outputs with an
    // INDEPENDENT all-pairs driver scan (shared-bucket test + exact
    // left-fold cosine) — verifying the distributed band join / dedup /
    // rank plumbing; drift-guarded in SimilaritySpec.
    "q37_embedding_neardup_lsh" ->
      """SELECT id_a, id_b, sim
        |FROM read_parquet('/root/repo/src/test/resources/expected/q37_expected_pairs.parquet')""".stripMargin,
    "q24_lsh_ann" ->
      """SELECT query_id, neighbor_id, rank, sim
        |FROM read_parquet('/root/repo/src/test/resources/expected/q24_expected_topk.parquet')""".stripMargin,
    // q43: with the deterministic driver-Lloyd's quantizer the inverted
    // lists are bit-stable, so the expected top-k is computable by an
    // independent naive driver scan (assignment loop + probe-set filter +
    // exact left-fold cosine rerank) in GenFixtures; drift-guarded in
    // SimilaritySpec (determinism across runs + recall gates).
    "q43_ivf_ann" ->
      """SELECT query_id, neighbor_id, rank, sim
        |FROM read_parquet('/root/repo/src/test/resources/expected/q43_expected_topk.parquet')""".stripMargin,
    // q53: deterministic PQ (driver-Lloyd's codebooks per subspace), so the
    // expected top-k comes from an independent naive driver transcription
    // of PQ search in GenFixtures (loop encode + ADC + shortlist + exact
    // rerank); drift-guarded in SimilaritySpec.
    "q53_pq_ann" ->
      """SELECT query_id, neighbor_id, rank, sim
        |FROM read_parquet('/root/repo/src/test/resources/expected/q53_expected_topk.parquet')""".stripMargin,
    // q55: deterministic quantizer → bit-stable clusters, so the expected
    // SemDeDup output comes from an independent naive transcription in
    // GenFixtures (assignment loop + within-cluster all-pairs cosine +
    // union-find closure + lowest-centroid-cosine keep rule);
    // drift-guarded in SimilaritySpec (planted duplicates, layout
    // invariance, cap accounting).
    "q55_semdedup" ->
      """SELECT vec_id, cluster_id, centroid_sim, group_id, CAST(keep AS INT) AS keep
        |FROM read_parquet('/root/repo/src/test/resources/expected/q55_expected_semdedup.parquet')""".stripMargin,
    // q56: fixed-point (integer) PageRank is bit-deterministic by
    // construction — exact long sums are layout-independent — so the
    // expected ranks come from an independent sequential adjacency-loop
    // replay in GenFixtures; drift-guarded in PageRankSpec (hand-computed
    // cycle fixpoint, structural star asserts, mass conservation, layout
    // invariance).
    "q56_pagerank" ->
      """SELECT part_id, rank_fp
        |FROM read_parquet('/root/repo/src/test/resources/expected/q56_expected_pagerank.parquet')""".stripMargin,
    // q57: a BGP is relational algebra — the oracle is DuckDB running the
    // equivalent star join directly on the base tables (fully independent
    // of the triple-ization and the bgp compiler).
    "q57_graph_bgp" ->
      """SELECT 'c' || c_custkey AS c, 'n' || c_nationkey AS n, 's' || s_suppkey AS s
        |FROM customer
        |JOIN supplier ON s_nationkey = c_nationkey
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE n_regionkey = 0""".stripMargin,
    // q66: the oracle answers the same question RELATIONALLY on the base
    // table (a CASE stands in for the left join against the planted
    // marker triples) — independent of the triple-ization, the pattern
    // compiler, and the left-join machinery.
    "q66_bgp_optional" ->
      """SELECT 'o' || o_orderkey AS o, 'c' || o_custkey AS c,
        |       o_orderpriority AS p,
        |       CASE WHEN o_totalprice > 250000 THEN 'big' END AS b
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    // q67: the oracle rebuilds the summary with DuckDB's own list
    // machinery (list(DISTINCT pred) + list_sort + array_to_string) over
    // the same planted triple construction.
    "q67_characteristic_sets" ->
      """WITH trip AS (
        |  SELECT 'o' || o_orderkey AS subj, 'placed_by' AS pred FROM orders
        |  UNION ALL
        |  SELECT 'o' || o_orderkey, 'priority' FROM orders
        |  UNION ALL
        |  SELECT 'o' || o_orderkey, 'size_class' FROM orders WHERE o_totalprice > 250000
        |  UNION ALL
        |  SELECT 'o' || o_orderkey, 'finished' FROM orders WHERE o_orderstatus = 'F'
        |), per_subj AS (
        |  SELECT subj,
        |         array_to_string(list_sort(list(DISTINCT pred)), ',') AS pred_set,
        |         count(*) AS nt
        |  FROM trip GROUP BY subj
        |)
        |SELECT pred_set, count(*) AS n_subjects,
        |       CAST(sum(nt) AS BIGINT) AS n_triples
        |FROM per_subj GROUP BY pred_set""".stripMargin,
    // q68: the fixture comes from the CLASSIC peeling algorithm
    // (sequential min-degree removal) — a genuinely different algorithm
    // from the engine's h-index iteration; both provably reach coreness.
    "q68_kcore" ->
      """SELECT part_id, coreness
        |FROM read_parquet('/root/repo/src/test/resources/expected/q68_expected_coreness.parquet')""".stripMargin,
    // q58: the oracle is DuckDB's recursive CTE — the sequential
    // definition of the transitive closure, independent of the engine's
    // semi-naive delta loop.
    "q58_path_reachable" ->
      """WITH RECURSIVE e AS (
        |  SELECT c_custkey AS s, c_custkey // 2 AS d FROM customer WHERE c_custkey > 1
        |), r AS (
        |  SELECT s, d FROM e
        |  UNION
        |  SELECT r.s, e.d FROM r JOIN e ON r.d = e.s
        |)
        |SELECT 'c' || s AS src, 'c' || d AS dst FROM r""".stripMargin,
    // q59: the oracle counts triangles by ID ordering (u < v < w, 3-way
    // join) — a different orientation scheme than the engine's
    // degree-ordered compact-forward; both must find the same triangles.
    "q59_triangles" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |), tri AS (
        |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |)
        |SELECT part_id, count(*) AS n_tri
        |FROM (SELECT x AS part_id FROM tri
        |      UNION ALL SELECT y FROM tri
        |      UNION ALL SELECT z FROM tri)
        |GROUP BY part_id""".stripMargin,
    // q60: the oracle re-implements the shape checks relationally
    // (GROUP BY + HAVING-style predicates, anchored regex, NOT IN) over
    // the same deterministically-planted triple construction.
    "q60_shape_validation" ->
      """WITH trip AS (
        |  SELECT 'o' || o_orderkey AS subj, 'placed_by' AS pred,
        |         'c' || (CASE WHEN o_orderkey % 101 = 0 THEN 0 ELSE o_custkey END) AS obj
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT 'o' || o_orderkey, 'status', o_orderstatus FROM orders
        |  UNION ALL
        |  SELECT 'o' || o_orderkey, 'status', o_orderstatus || '?'
        |  FROM orders WHERE o_orderkey % 89 = 0
        |  UNION ALL
        |  SELECT 'o' || o_orderkey, 'ref',
        |         CASE WHEN o_orderkey % 83 = 0 THEN CAST(o_orderkey AS VARCHAR)
        |              ELSE 'R' || o_orderkey END
        |  FROM orders
        |), shapes(pred, min_c, max_c) AS (
        |  SELECT * FROM (VALUES ('placed_by', 1, 1), ('status', 1, 1), ('ref', 1, 1))
        |), counts AS (
        |  SELECT subj, pred, count(*) AS n FROM trip GROUP BY 1, 2
        |), grid AS (
        |  SELECT 'o' || o_orderkey AS subj, s.pred, s.min_c, s.max_c
        |  FROM orders CROSS JOIN shapes s
        |)
        |SELECT g.subj, g.pred,
        |       CASE WHEN coalesce(c.n, 0) < g.min_c THEN 'min_count'
        |            ELSE 'max_count' END AS code,
        |       CAST(coalesce(c.n, 0) AS VARCHAR) AS detail
        |FROM grid g LEFT JOIN counts c ON g.subj = c.subj AND g.pred = c.pred
        |WHERE coalesce(c.n, 0) < g.min_c OR coalesce(c.n, 0) > g.max_c
        |UNION ALL
        |SELECT subj, pred, 'pattern', obj FROM trip
        |WHERE pred = 'ref' AND NOT regexp_matches(obj, '^R[0-9]+$')
        |UNION ALL
        |SELECT subj, pred, 'dangling_object', obj FROM trip
        |WHERE pred = 'placed_by'
        |  AND obj NOT IN (SELECT 'c' || c_custkey FROM customer)""".stripMargin,
    // q61: deterministic walks are a pure function of (graph, seed) —
    // xxhash64 is the engine-wide keyed PRNG primitive (same standing as
    // q52's fingerprint) — so the expected steps come from an independent
    // sequential replay in GenFixtures (driver adjacency maps + a plain
    // while loop); drift-guarded in RandomWalksSpec (in-spec replay,
    // edge-validity, halting, layout invariance).
    "q61_random_walks" ->
      """SELECT walk_id, step, node
        |FROM read_parquet('/root/repo/src/test/resources/expected/q61_expected_walks.parquet')""".stripMargin,
    // q62: the oracle expands the skip-gram window RELATIONALLY — a
    // walk-id self-join over the independently-replayed q61 walk fixture —
    // vs the engine's per-row array-HOF expansion (no join at all).
    "q62_skipgram" ->
      """WITH w AS (
        |  SELECT * FROM read_parquet('/root/repo/src/test/resources/expected/q61_expected_walks.parquet')
        |)
        |SELECT a.node AS center, b.node AS context, count(*) AS n_pairs
        |FROM w a JOIN w b
        |  ON a.walk_id = b.walk_id AND a.step <> b.step
        |  AND abs(a.step - b.step) <= 2
        |GROUP BY 1, 2""".stripMargin,
    // q63: the oracle is the sequential definition — a recursive CTE
    // carrying (node, landmark, dist) with min(dist) at the end — fully
    // independent of the engine's first-seen semi-naive frontier loop.
    "q63_bfs_distances" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'c' || (c_custkey // 2) AS s, 'c' || c_custkey AS d
        |  FROM customer WHERE c_custkey > 1
        |), lm(l) AS (SELECT * FROM (VALUES ('c1'), ('c5'))),
        |r AS (
        |  SELECT l AS id, l AS landmark, 0 AS dist FROM lm
        |  UNION
        |  SELECT e.d, r.landmark, r.dist + 1 FROM r JOIN e ON r.id = e.s
        |)
        |SELECT id, landmark, CAST(min(dist) AS INT) AS dist
        |FROM r GROUP BY 1, 2""".stripMargin,
    // q64: deterministic synchronous LPA is a pure function of the graph;
    // the committed fixture comes from an independent sequential replay
    // (driver adjacency maps + per-round vote counting) in GenFixtures.
    "q64_communities" ->
      """SELECT part_id, community
        |FROM read_parquet('/root/repo/src/test/resources/expected/q64_expected_communities.parquet')""".stripMargin,
    // q65: biased walks are a pure function of (graph, p, q, seed); the
    // committed fixture is an independent sequential replay in GenFixtures
    // (driver adjacency maps + edge set + Math.log argmax, no engine
    // plumbing beyond the shared xxhash64 primitive — q61's standing).
    "q65_node2vec_walks" ->
      """SELECT walk_id, step, node
        |FROM read_parquet('/root/repo/src/test/resources/expected/q65_expected_biased_walks.parquet')""".stripMargin,
    // q34's fake decode is a PURE function of media_ref (codec libs absent
    // by design — Multimodal.scala); the committed expected-rows fixture is
    // therefore a legitimate oracle: it pins the full decode plumbing
    // (media table build, batch shape, frame explode) against drift.
    // MultimodalSpec asserts the live output still equals this fixture.
    "q34_media_decode" ->
      """SELECT media_ref, kind, width, height, n_frames
        |FROM read_parquet('/root/repo/src/test/resources/expected/q34_media_decode.parquet')""".stripMargin,
    // q45: the metrics/gates are a pure function of media_ref (the PNG
    // payload is); committed live-output fixture, drift-guarded in
    // ImageQualitySpec — same pattern and justification as q34.
    "q45_image_quality" ->
      """SELECT media_ref, sharpness, contrast, brightness, noise, quality_score,
        | needs_contrast, needs_denoise, needs_sharpen, conservative, rolled_back
        |FROM read_parquet('/root/repo/src/test/resources/expected/q45_image_quality.parquet')""".stripMargin,
    // q47: a fully INDEPENDENT connected-components oracle — the duplicate
    // groups are recomputed in DuckDB by a recursive-CTE transitive closure
    // over the same exact-Jaccard pair set q21's oracle derives, i.e. a
    // second CC implementation in a different language checks the engine's
    // large-star/small-star + union-find hybrid end to end.
    "q47_dedup_groups" ->
      """WITH RECURSIVE words AS (
        | SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        | SELECT DISTINCT id, shingle FROM (
        |  SELECT id, array_to_string(w[i:i+4], ' ') AS shingle
        |  FROM words, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)
        |  WHERE len(w) >= 5)),
        |sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
        |common AS (
        | SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
        | FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        | GROUP BY a.id, b.id),
        |pairs AS (
        | SELECT id_a AS a, id_b AS b
        | FROM common JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
        | WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.2),
        |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |reach AS (
        | SELECT a AS id, b AS r FROM edges
        | UNION
        | SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r)
        |SELECT id, least(id, min(r)) AS group_id FROM reach GROUP BY id""".stripMargin,
    "q35_fieldtag_expr" ->
      s"SELECT doc_id, $classifySql AS field_type FROM documents",
    "q38_ocr_amount_validation" ->
      """SELECT o_orderkey AS doc_id,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
        | round(CASE WHEN v THEN least(0.9 + 0.2, 1.0) ELSE 0.9 END, 4) AS confidence,
        | v AS validated_by_ocr
        |FROM (
        | SELECT o_orderkey, o_totalprice,
        |  EXISTS (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o_orderkey
        |     AND abs(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
        |           - CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) < 0.01) AS v
        | FROM orders)""".stripMargin,
    "q39_zone_eval" ->
      """SELECT doc_id,
        | CASE WHEN agree THEN 1.0 ELSE 0.0 END AS zp,
        | CASE WHEN agree THEN 1.0 ELSE 0.0 END AS zr,
        | round(CASE WHEN agree THEN 1.0 ELSE 0.0 END, 4) AS zf1,
        | round(cp, 4) AS cp, round(cr, 4) AS cr,
        | round(CASE WHEN cp + cr > 0 THEN 2 * cp * cr / (cp + cr) ELSE 0.0 END, 4) AS cf1
        |FROM (
        | SELECT doc_id,
        |  (length(text) % 2 = 0) = (doc_id % 3 = 0) AS agree,
        |  CASE WHEN e = 0 THEN (CASE WHEN d = 0 THEN 1.0 ELSE 0.0 END)
        |       ELSE (CASE WHEN d > 0 THEN least(d, e) / d ELSE 0.0 END) END AS cp,
        |  CASE WHEN e = 0 THEN 1.0 ELSE least(d, e) / e END AS cr
        | FROM (SELECT doc_id, text,
        |        CAST(doc_id % 4 AS DOUBLE) AS d,
        |        CAST(length(text) % 3 AS DOUBLE) AS e FROM documents))""".stripMargin,
    "q40_qa_map_explode" -> {
      val tokens = """CASE WHEN length(trim(text)) = 0 THEN 0
                     | ELSE len(string_split_regex(trim(text), '\s+')) END""".stripMargin
      s"""WITH lang AS (SELECT doc_id, $langCaseSql AS pred_lang FROM ($langScoresFromDocs))
         |SELECT d.doc_id, 0 AS q_index, 'lang?' AS question, l.pred_lang AS answer
         | FROM documents d JOIN lang l ON d.doc_id = l.doc_id
         |UNION ALL SELECT doc_id, 1, 'len?', CAST(length(text) AS VARCHAR) FROM documents
         |UNION ALL SELECT doc_id, 2, 'tokens?', CAST(($tokens) AS VARCHAR) FROM documents""".stripMargin
    },
    "q41_layout_sections" -> {
      def anyOf(expr: String, words: Seq[String]): String = likeAny(expr, words)
      val bd = "lower(text)"
      val answer = "'tableau avec ' || CAST(doc_id % 12 AS VARCHAR) || ' colonnes'"
      val at = s"lower(text || ' ' || $answer)"
      val sections = Seq(
        "header" -> Seq("en-tête", "header", "titre"),
        "sender_info" -> Seq("émetteur", "sender", "entreprise"),
        "recipient_info" -> Seq("destinataire", "recipient", "client"),
        "invoice_details" -> Seq("détails", "numéro", "date"),
        "items_table" -> Seq("tableau", "articles", "services"),
        "totals" -> Seq("total", "montant", "somme"),
        "footer" -> Seq("pied", "footer", "conditions"))
        .map { case (n, kws) => s"CASE WHEN ${anyOf(at, kws)} THEN '$n' END" }
        .mkString("[", ", ", "]")
      val readability =
        s"""least(greatest(0.7
           | + CASE WHEN ${anyOf(bd, Seq("claire", "clear", "lisible"))} THEN 0.2 ELSE 0.0 END
           | + CASE WHEN ${anyOf(bd, Seq("organisé", "structured"))} THEN 0.1 ELSE 0.0 END
           | - CASE WHEN ${anyOf(bd, Seq("flou", "blur", "illisible"))} THEN 0.3 ELSE 0.0 END
           | - CASE WHEN ${anyOf(bd, Seq("désorganisé", "messy"))} THEN 0.2 ELSE 0.0 END,
           | 0.0), 1.0)""".stripMargin
      s"""SELECT doc_id,
         | CASE WHEN ${anyOf(bd, Seq("facture", "invoice"))} THEN 'invoice'
         |      WHEN ${anyOf(bd, Seq("devis", "quote"))} THEN 'quote'
         |      WHEN ${anyOf(bd, Seq("commande", "order"))} THEN 'order'
         |      ELSE 'unknown' END AS doc_type,
         | CASE WHEN ci >= 2 THEN 'complex' WHEN ci = 1 THEN 'medium' ELSE 'simple' END AS complexity,
         | array_to_string(list_filter($sections, x -> x IS NOT NULL), ',') AS sections,
         | CASE WHEN doc_id % 12 <= 10 THEN CAST(doc_id % 12 AS INT) ELSE 1 END AS column_count,
         | round($readability, 4) AS readability,
         | CASE WHEN ${anyOf(bd, Seq("centré", "center"))} THEN 'center'
         |      WHEN ${anyOf(bd, Seq("droite", "right"))} THEN 'right'
         |      ELSE 'left' END AS main_alignment,
         | CASE WHEN ${anyOf(bd, Seq("organisé", "structured", "aligné"))} THEN 'excellent'
         |      WHEN ${anyOf(bd, Seq("désorganisé", "messy"))} THEN 'poor'
         |      ELSE 'good' END AS consistency
         |FROM (SELECT doc_id, text,
         |  (${anyOf(bd, Seq("tableau", "table"))})::INT
         |   + (${anyOf(bd, Seq("multiple", "plusieurs"))})::INT AS ci
         | FROM documents)""".stripMargin
    },
    "q44_validation_score" ->
      """SELECT doc_id,
        | round(s, 4) AS integration_score,
        | round((CAST(length(text) % 10 AS DOUBLE) / 10.0) * 0.6 + s * 0.4, 4) AS overall_confidence,
        | CASE WHEN s > 0.7 THEN 'high' WHEN s > 0.4 THEN 'medium' ELSE 'low' END AS reliability
        |FROM (
        | SELECT doc_id, text,
        |  CAST((doc_id % 2 = 0)::INT + (doc_id % 3 = 0)::INT
        |     + (length(text) % 2 = 0)::INT + (doc_id % 5 = 0)::INT
        |     + (CAST(doc_id % 100 AS DOUBLE) / 100.0 > 0.7)::INT AS DOUBLE) / 5.0 AS s
        | FROM documents)""".stripMargin,
    "q36_embedding_neardup" -> {
      def dotSql(x: String, y: String) =
        s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
           | [CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) FOR p IN list_zip($x, $y)]),
           | (acc, v) -> acc + v)""".stripMargin
      s"""WITH e AS (SELECT vec_id, embedding,
         |  sqrt(${dotSql("embedding", "embedding")}) AS nm
         | FROM embeddings WHERE vec_id < 200)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         | round(CASE WHEN a.nm * b.nm = 0 THEN 0.0
         |   ELSE ${dotSql("a.embedding", "b.embedding")} / (a.nm * b.nm) END, 4) AS sim
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE CASE WHEN a.nm * b.nm = 0 THEN 0.0
         |  ELSE ${dotSql("a.embedding", "b.embedding")} / (a.nm * b.nm) END >= 0.2""".stripMargin
    },
    "q50_pii_redact" -> {
      // Luhn fold replayed in DuckDB list comprehension (right-to-left
      // digit walk, double-every-second, subtract 9 over 9, mod 10)
      val luhn = (x: String) =>
        s"""list_sum([CASE WHEN i % 2 = 0
           |  THEN (CASE WHEN 2*(ascii(reverse($x)[i])-48) > 9
           |        THEN 2*(ascii(reverse($x)[i])-48) - 9
           |        ELSE 2*(ascii(reverse($x)[i])-48) END)
           |  ELSE ascii(reverse($x)[i])-48 END
           | FOR i IN range(1, length($x)+1)]) % 10 = 0""".stripMargin
      s"""WITH base AS (
         | SELECT c_custkey AS id,
         |  c_name || ' contact ' ||
         |  printf('%02d-%03d-%03d-%04d', 10 + c_custkey % 90, (c_custkey*7) % 1000,
         |         (c_custkey*13) % 1000, (c_custkey*37) % 10000) ||
         |  ' mail ' || regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g') ||
         |  '@corp.example.com ref ' ||
         |  lpad(CAST((c_custkey*1234567890123 + 4532015112830366) % 10000000000000000
         |       AS VARCHAR), 16, '0') AS t
         | FROM customer)
         |SELECT id,
         | len(regexp_extract_all(t, '$emailReSql')) AS n_emails,
         | len(regexp_extract_all(t, '$phoneReSql')) AS n_phones,
         | len(regexp_extract_all(t, '$digitRunReSql')) AS n_digit_runs,
         | len(list_filter(regexp_extract_all(t, '$digitRunReSql'),
         |     x -> ${luhn("x")})) AS n_cards,
         | regexp_replace(regexp_replace(regexp_replace(t,
         |   '$emailReSql', '[EMAIL]', 'g'),
         |   '$phoneReSql', '[PHONE]', 'g'),
         |   '$digitRunReSql', '[NUM]', 'g') AS redacted
         |FROM base""".stripMargin
    },
    // q51's oracle is an INDEPENDENT implementation: unnest + GROUP BY for
    // the top-bigram count and list_distinct for the dup fractions, vs the
    // engine's per-row sorted-run fold — two algorithms, one contract.
    "q51_repetition" ->
      """WITH base AS (
        | SELECT doc_id AS id,
        |  CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |       ELSE string_split_regex(trim(text), '\s+') END AS w
        | FROM documents),
        |bg AS (
        | SELECT id, array_to_string(w[i:i+1], ' ') AS g
        | FROM base, unnest(range(1, len(w))) AS t(i)
        | WHERE len(w) >= 2),
        |top AS (
        | SELECT id, max(c) AS mc, sum(c) AS tot FROM (
        |  SELECT id, g, COUNT(*) AS c FROM bg GROUP BY id, g) GROUP BY id),
        |tg AS (
        | SELECT id, list(array_to_string(w[i:i+2], ' ')) AS l
        | FROM base, unnest(range(1, len(w) - 1)) AS t(i)
        | WHERE len(w) >= 3 GROUP BY id)
        |SELECT id, n_words, dup_word_frac, top_bigram_frac, dup_trigram_frac,
        | CAST(top_bigram_frac > 0.18 OR dup_trigram_frac > 0.30 AS INT) AS repetitive
        |FROM (
        | SELECT b.id, len(b.w) AS n_words,
        |  CASE WHEN len(b.w) = 0 THEN 0.0
        |       ELSE round(1.0 - CAST(len(list_distinct(b.w)) AS DOUBLE)/len(b.w), 4)
        |  END AS dup_word_frac,
        |  COALESCE(round(CAST(top.mc AS DOUBLE)/top.tot, 4), 0.0) AS top_bigram_frac,
        |  COALESCE(round(1.0 - CAST(len(list_distinct(tg.l)) AS DOUBLE)/len(tg.l), 4), 0.0)
        |   AS dup_trigram_frac
        | FROM base b LEFT JOIN top ON top.id = b.id LEFT JOIN tg ON tg.id = b.id)""".stripMargin,
    "q52_stratified_sample" ->
      """SELECT doc_id, lang, bucket FROM (
        | SELECT doc_id, lang,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(unicode(c) AS BIGINT)
        |     FOR c IN string_split('s:' || CAST(doc_id AS VARCHAR), '')]),
        |   (h, c) -> (h * 31 + c) % 2147483647) % 100 AS bucket,
        |  CASE lang WHEN 'en' THEN 30 WHEN 'fr' THEN 60 WHEN 'de' THEN 80
        |            WHEN 'es' THEN 45 WHEN 'zh' THEN 15 ELSE 5 END AS r
        | FROM documents)
        |WHERE bucket < r""".stripMargin,
    // q54: the sequential definition — one global window over id order
    // (fine in DuckDB at sf0.01; the Spark side distributes the same scan)
    "q54_seq_packing" ->
      """SELECT doc_id AS id, n AS n_tokens, start_off,
        | CAST(start_off // 512 AS BIGINT) AS seq_id,
        | CAST(start_off % 512 AS BIGINT) AS seq_off,
        | CAST(CASE WHEN n = 0 THEN 0
        |      ELSE (start_off + n - 1) // 512 - start_off // 512 + 1 END AS BIGINT) AS n_seqs
        |FROM (
        | SELECT doc_id, n,
        |  CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        | FROM (
        |  SELECT doc_id,
        |   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |        ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n
        |  FROM documents))""".stripMargin
  )
}
