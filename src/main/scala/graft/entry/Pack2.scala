package graft.entry

import graft.fixtures.InvoiceCorpus
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.run.{Extract, Pipeline}
import graft.tag.Taggers
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-contract query pack 2/5 — cross-validation, similarity/ANN, graph analytics (first band).
  * Split from the former 6.8k-line SparkEntry (r4 verdict #4);
  * content is byte-moved, composed back in [[graft.SparkEntry]].
  * Shared helpers live in [[graft.entry.Q]]. */
private[graft] object Pack2 {
  import Q._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_av_decode" -> ((s, d) => {
      // the REAL audio (WAV/AudioSystem) and video (MJPEG-AVI demux +
      // per-frame JPEG) decode paths in the driver gate; output is a pure
      // function of media_ref → committed fixture oracle (q34/q45's
      // justification), drift-guarded in MultimodalSpec
      Multimodal.decodeAndFeaturize(
          graft.fixtures.MediaFixtures.mediaTable(InvoiceCorpus.docs(s, 200).toDF()))
        .filter(r => r.kind != "image").toDF()
        .select(col("media_ref"), col("kind"), col("width"), col("height"),
          col("n_frames"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f_rms_or_r"),
          round(element_at(col("feature"), 3).cast("double"), 4).as("f_zcr_or_b"))
    }),
    "q69_rdfs_closure" -> ((s, d) => {
      // RDFS materialization (rdfs2/3/5/7/9/11, WebPIE rule order) over a
      // planted ontology: a subClassOf chain k2..k63 → k(c div 2), a
      // 2-deep subPropertyOf chain ordered ⊑ related ⊑ linked with
      // domain/range on `ordered`, type assertions on sampled customers,
      // `ordered` assertions on sampled orders. Oracle = an independent
      // relational re-derivation in DuckDB (recursive CTEs for the
      // hierarchies, plain joins for the rules).
      import s.implicits._
      val schemaSc = t(s, d, "customer")
        .where(col("c_custkey").between(2, 63))
        .select(concat(lit("k"), col("c_custkey")).as("subj"),
          lit("rdfs:subClassOf").as("pred"),
          concat(lit("k"), expr("c_custkey div 2")).as("obj"))
      val schemaRest = Seq(
        ("p:ordered", "rdfs:subPropertyOf", "p:related"),
        ("p:related", "rdfs:subPropertyOf", "p:linked"),
        ("p:ordered", "rdfs:domain", "k3"),
        ("p:ordered", "rdfs:range", "k5")).toDF("subj", "pred", "obj")
      val dataOrdered = t(s, d, "orders").where(col("o_orderkey") % 20 === 0)
        .select(concat(lit("c"), col("o_custkey")).as("subj"),
          lit("p:ordered").as("pred"),
          concat(lit("o"), col("o_orderkey")).as("obj"))
      val dataTypes = t(s, d, "customer").where(col("c_custkey") % 30 === 0)
        .select(concat(lit("c"), col("c_custkey")).as("subj"),
          lit("rdf:type").as("pred"),
          concat(lit("k"), col("c_custkey") % 62 + 2).as("obj"))
      graft.graph.Inference.rdfsClosure(
        schemaSc.unionByName(schemaRest).unionByName(dataOrdered).unionByName(dataTypes))
    }),
    "q70_bgp_union" -> ((s, d) => {
      // SPARQL UNION over the q66 triple-ized orders graph: big orders
      // with their customer, unioned with 5-LOW orders (no ?c binding →
      // null, as SPARQL leaves branch-absent variables unbound). Bag
      // semantics. Oracle = the relational UNION ALL on the base table.
      val ord = t(s, d, "orders")
      val subj = concat(lit("o"), col("o_orderkey"))
      val placedBy = ord.select(subj.as("subj"), lit("placed_by").as("pred"),
        concat(lit("c"), col("o_custkey")).as("obj"))
      val prio = ord.select(subj.as("subj"), lit("priority").as("pred"),
        col("o_orderpriority").as("obj"))
      val big = ord.where(col("o_totalprice") > 250000).select(
        subj.as("subj"), lit("size_class").as("pred"), lit("big").as("obj"))
      graft.graph.GraphQuery.bgpUnion(
        placedBy.union(prio).union(big),
        Seq(
          Seq(("?o", "placed_by", "?c"), ("?o", "size_class", "big")),
          Seq(("?o", "priority", "5-LOW"))))
    }),
    "q71_bgp_minus" -> ((s, d) => {
      // SPARQL MINUS on the same graph: every (order, customer, priority)
      // solution minus those with the big-order marker — a shared-?o anti
      // join (the spec's compatible-solution semantics; the no-shared-var
      // quirk and the NOT EXISTS divergence are spec-pinned). Oracle =
      // the relational anti condition on the base table.
      val ord = t(s, d, "orders")
      val subj = concat(lit("o"), col("o_orderkey"))
      val placedBy = ord.select(subj.as("subj"), lit("placed_by").as("pred"),
        concat(lit("c"), col("o_custkey")).as("obj"))
      val prio = ord.select(subj.as("subj"), lit("priority").as("pred"),
        col("o_orderpriority").as("obj"))
      val big = ord.where(col("o_totalprice") > 250000).select(
        subj.as("subj"), lit("size_class").as("pred"), lit("big").as("obj"))
      graft.graph.GraphQuery.bgpMinus(
        placedBy.union(prio).union(big),
        Seq(("?o", "placed_by", "?c"), ("?o", "priority", "?p")),
        Seq(("?o", "size_class", "big")))
    }),
    "q72_ntriples" -> ((s, d) => {
      // N-Triples serialization — one canonical line per triple across
      // all three object forms: a typed literal with every ECHAR special
      // injected (backslash/quote/newline/tab), an IRI object, and a
      // lang-tagged literal. Oracle = DuckDB rebuilds the lines with its
      // own replace() chain — an independent implementation of the
      // escaping and layout.
      val cust = t(s, d, "customer")
      val lines = graft.sources.NTriples.line(
          concat(lit("urn:c"), col("c_custkey")),
          lit("urn:p:comment"),
          concat(col("c_mktsegment"), lit("\"q\\\n\tz")),
          lit(false), lit(null), lit("urn:dt:s")).as("nt_line")
      val iriLines = graft.sources.NTriples.line(
          concat(lit("urn:c"), col("c_custkey")),
          lit("urn:p:nation"),
          concat(lit("urn:n"), col("c_nationkey")),
          lit(true)).as("nt_line")
      val langLines = graft.sources.NTriples.line(
          concat(lit("urn:c"), col("c_custkey")),
          lit("urn:p:name"),
          col("c_name"),
          lit(false), lit("en-GB")).as("nt_line")
      cust.select(lines).union(cust.select(iriLines)).union(cust.select(langLines))
    }),
    "q73_weighted_sssp" -> ((s, d) => {
      // weighted shortest paths (semi-naive Bellman-Ford, exact long
      // arithmetic) over the customer DAG: parent edges (c div 2 → c,
      // weight c%7+1) plus grandparent shortcuts (c div 4 → c, weight
      // c%5+1), so min-relaxation genuinely arbitrates path choices.
      // Oracle = DuckDB's recursive CTE enumerating all path sums with
      // min() at the end — the sequential definition.
      import s.implicits._
      val cust = t(s, d, "customer").select(col("c_custkey"))
      val parent = cust.where(col("c_custkey") > 1).select(
        concat(lit("c"), expr("c_custkey div 2")).as("src"),
        concat(lit("c"), col("c_custkey")).as("dst"),
        (col("c_custkey") % 7 + 1).cast("long").as("w"))
      val shortcut = cust.where(col("c_custkey") > 3).select(
        concat(lit("c"), expr("c_custkey div 4")).as("src"),
        concat(lit("c"), col("c_custkey")).as("dst"),
        (col("c_custkey") % 5 + 1).cast("long").as("w"))
      graft.graph.Distances.weighted(parent.union(shortcut), Seq("c1").toDF("id"))
    }),
    "q74_construct" -> ((s, d) => {
      // SPARQL CONSTRUCT over the q57 triple view: materialize the
      // derived customer→region relation (plus a type stamp) as new
      // triples — the vocabulary-mapping/reshape primitive. Oracle = the
      // relational join in DuckDB building the same triple set.
      val cust = t(s, d, "customer").select(
        concat(lit("c"), col("c_custkey")).as("subj"),
        lit("in_nation").as("pred"),
        concat(lit("n"), col("c_nationkey")).as("obj"))
      val nat = t(s, d, "nation").select(
        concat(lit("n"), col("n_nationkey")).as("subj"),
        lit("in_region").as("pred"),
        concat(lit("r"), col("n_regionkey")).as("obj"))
      graft.graph.GraphQuery.construct(cust.union(nat),
        patterns = Seq(("?c", "in_nation", "?n"), ("?n", "in_region", "?r")),
        template = Seq(("?c", "co_region", "?r"), ("?c", "rdf:type", "RegionalCustomer")))
    }),
    "q75_graph_diff" -> ((s, d) => {
      // graph diff between two derived snapshot versions: v1 = the order
      // graph before urgent orders got size markers, v2 = after a predicate
      // rename (placed_by → ordered_by for F-status orders) plus the new
      // markers — added/removed rows only. Oracle = DuckDB's FULL OUTER
      // re-derivation of the same two versions.
      val ord = t(s, d, "orders")
      val subj = concat(lit("o"), col("o_orderkey"))
      val v1 = ord.select(subj.as("subj"), lit("placed_by").as("pred"),
        concat(lit("c"), col("o_custkey")).as("obj"))
      val renamed = ord.select(subj.as("subj"),
        when(col("o_orderstatus") === "F", lit("ordered_by"))
          .otherwise(lit("placed_by")).as("pred"),
        concat(lit("c"), col("o_custkey")).as("obj"))
      val markers = ord.where(col("o_orderpriority") === "1-URGENT").select(
        subj.as("subj"), lit("urgency").as("pred"), lit("high").as("obj"))
      graft.graph.GraphQuery.diff(v1, renamed.union(markers))
    }),
    "q76_property_path" -> ((s, d) => {
      // SPARQL 1.1 property-path algebra: `child_of+/in_seg` — every
      // customer paired with each ANCESTOR's market segment (transitive
      // closure composed into a sequence step, set semantics). Oracle =
      // DuckDB's recursive CTE + join, the sequential definition.
      import graft.graph.PropertyPath._
      val cust = t(s, d, "customer")
      val childOf = cust.where(col("c_custkey") > 1).select(
        concat(lit("c"), col("c_custkey")).as("subj"),
        lit("child_of").as("pred"),
        concat(lit("c"), expr("c_custkey div 2")).as("obj"))
      val inSeg = cust.select(
        concat(lit("c"), col("c_custkey")).as("subj"),
        lit("in_seg").as("pred"),
        col("c_mktsegment").as("obj"))
      graft.graph.PropertyPath.pairs(childOf.union(inSeg),
        Seq2(Plus(Pred("child_of")), Pred("in_seg")))
    }),
    "q77_bgp_agg" -> ((s, d) => {
      // SPARQL GROUP BY over a BGP: per market segment, how many
      // child→parent links land on a parent of that segment and how many
      // distinct parents — aggregation over the solution BAG.
      val cust = t(s, d, "customer")
      val childOf = cust.where(col("c_custkey") > 1).select(
        concat(lit("c"), col("c_custkey")).as("subj"),
        lit("child_of").as("pred"),
        concat(lit("c"), expr("c_custkey div 2")).as("obj"))
      val inSeg = cust.select(
        concat(lit("c"), col("c_custkey")).as("subj"),
        lit("in_seg").as("pred"),
        col("c_mktsegment").as("obj"))
      graft.graph.GraphQuery.bgpAgg(childOf.union(inSeg),
        Seq(("?a", "child_of", "?p"), ("?p", "in_seg", "?seg")),
        groupVars = Seq("seg"),
        aggs = Seq(count(lit(1)).as("n_links"),
          countDistinct(col("p")).as("n_parents")))
    }),
    "q78_link_prediction" -> ((s, d) => {
      // neighborhood-overlap link prediction over the customer tree with
      // grandparent shortcuts (bounded degree ≤ 8, so the wedge set is
      // linear in nodes); minCommon = 2 keeps multi-witness pairs only
      graft.graph.LinkPrediction.scores(custGraph(s, d), minCommon = 2)
    }),
    "q79_clustering_coefficient" -> ((s, d) =>
      // local clustering coefficient on the same graph — the grandparent
      // shortcut makes (k, k div 2, k div 4) triangles everywhere
      graft.graph.Triangles.clusteringCoefficient(custGraph(s, d))),
    "q80_repeated_passages" -> ((s, d) =>
      // cross-document repeated 8-token passages (boilerplate mining)
      graft.ops.Curation.repeatedPassages(
        t(s, d, "documents"), col("doc_id"), col("text"), k = 8, minDocs = 2)),
    "q81_boilerplate_fraction" -> ((s, d) =>
      // per-doc share of corpus-repeated 8-token windows
      graft.ops.Curation.boilerplateFraction(
        t(s, d, "documents"), col("doc_id"), col("text"), k = 8, minDocs = 2)),
    "q82_importance_weights" -> ((s, d) =>
      // DSIR hashed-unigram importance weights, target = English docs
      graft.ops.Curation.importanceWeights(
        t(s, d, "documents"), col("doc_id"), col("text"),
        col("lang") === "en", buckets = 64)),
    "q83_asof_join" -> ((s, d) => {
      // "which gauge reading was in force when this click happened": clicks
      // as-of-joined to an hourly per-user max-value gauge built from view
      // events. One shuffle (union sort-merge), no row expansion; DuckDB's
      // native ASOF JOIN is the independent oracle.
      val ev = t(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val gauge = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("rts"))
        .agg(max("value").as("gauge"))
      graft.ops.TemporalJoin.asofJoin(clicks, gauge, Seq("user_id"),
        leftTs = "ts", rightTs = "rts", rightPayload = Seq("gauge"),
        asofTsCol = "asof_ts")
    }),
    "q84_interval_join" -> ((s, d) => {
      // point-in-interval: clicks that fall inside a 10-minute error window
      // [error ts, +10min). Bucketized equi join (width = window length), so
      // the plan never degenerates to a nested-loop theta join.
      val ev = t(s, d, "events")
      val windows = ev.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("lo"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("hi"))
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      graft.ops.TemporalJoin.intervalJoin(clicks, windows, point = "ts",
        lo = "lo", hi = "hi", rightCols = Seq("error_id"), width = 600.0)
    }),
    "q85_scc" -> ((s, d) => {
      // strongly connected components over a directed customer graph:
      // up-edges k -> k div 2 plus back-edges k div 2 -> k where k % 3 = 0
      // plant chains of mutually-reachable nodes (SCCs up to size ~10)
      // inside an otherwise DAG-shaped tree — the condensation-before-
      // scheduling / cycle-detection pass of a dependency KG
      val cust = t(s, d, "customer")
      val up = cust.where(col("c_custkey") > 1).select(
        col("c_custkey").as("src"), expr("c_custkey div 2").as("dst"))
      val back = cust.where(col("c_custkey") > 1 && col("c_custkey") % 3 === 0)
        .select(expr("c_custkey div 2").as("src"), col("c_custkey").as("dst"))
      graft.graph.Scc.components(up.union(back))
    }),
    "q86_bm25" -> ((s, d) =>
      // BM25 top-25 lexical retrieval over the documents corpus — the
      // decontamination/curation lookup; rank cast long for oracle parity
      graft.ops.Retrieval.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        Seq("spark", "join", "window"), topK = 25)
        .withColumn("rank", col("rank").cast("long")))
    ,
    "q87_condensation_levels" -> ((s, d) => {
      // SCC condensation of the q85 graph + Kahn topological leveling —
      // "collapse the cycles, then schedule": (scc, level) with level =
      // longest path from the source frontier of the condensed DAG
      val cust = t(s, d, "customer")
      val up = cust.where(col("c_custkey") > 1).select(
        col("c_custkey").as("src"), expr("c_custkey div 2").as("dst"))
      val back = cust.where(col("c_custkey") > 1 && col("c_custkey") % 3 === 0)
        .select(expr("c_custkey div 2").as("src"), col("c_custkey").as("dst"))
      val g = up.union(back)
      val dag = graft.graph.Topo.condense(g, graft.graph.Scc.components(g))
      graft.graph.Topo.levels(dag)
        .select(col("id").cast("long").as("scc"),
          col("level").cast("long").as("level"))
    }),
    "q88_editdist_join" -> ((s, d) =>
      // surface-form variant mining: all customer-name pairs within edit
      // distance 1 via FastSS deletion-neighborhood blocking + exact verify
      graft.ops.StringSim.editDistanceJoin(
        t(s, d, "customer"), "c_custkey", "c_name", maxDist = 1)),
    "q89_funnel" -> ((s, d) =>
      // strict-order earliest-completion funnel view -> click -> purchase
      graft.ops.Funnel.stages(t(s, d, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
        .withColumnRenamed("user", "user_id")),
    "q90_interval_merge" -> ((s, d) => {
      // per-user error-state uptime: coalesce overlapping 10-minute error
      // windows into maximal disjoint outage periods
      val ev = t(s, d, "events")
      val iv = ev.where(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("lo"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("hi"))
      graft.ops.TemporalJoin.mergeIntervals(iv, Seq("user_id"), "lo", "hi")
    }),
    "q91_priority_sample" -> ((s, d) =>
      // weighted sample-without-replacement ∝ n_chars (priority sampling:
      // k smallest u/w, u from the portable rolling fingerprint)
      graft.ops.Curation.prioritySample(
        t(s, d, "documents"), col("doc_id"), col("n_chars"), k = 50)
        .select("doc_id", "n_chars", "u", "priority")),
    "q92_neighbor_mean" -> ((s, d) => {
      // one round of mean message passing (GraphSAGE aggregation) over the
      // vec_id tree+shortcut graph; flattened to (id, dim, mean@6dp) rows
      val emb = t(s, d, "embeddings")
      val e1 = emb.where(col("vec_id") > 1)
        .select(col("vec_id").as("src"), expr("vec_id div 2").as("dst"))
      val e2 = emb.where(col("vec_id") > 3)
        .select(col("vec_id").as("src"), expr("vec_id div 4").as("dst"))
      graft.graph.Propagate.neighborMean(e1.union(e2), emb)
        .select(col("id"), posexplode(col("mean")).as(Seq("i", "v")))
        .select(col("id"), col("i").cast("long").as("i"),
          round(col("v"), 6).as("mean"))
    }),
    "q93_cooccurrence" -> ((s, d) =>
      // bipartite projection: parts co-ordered in >= 2 distinct orders
      // (the entities-co-mentioned edge builder), capped + audit-counted
      graft.graph.Cooccur.project(t(s, d, "lineitem"),
        "l_orderkey", "l_partkey", minCount = 2L)),
    "q94_validity_intervals" -> ((s, d) =>
      // temporal-KG SCD2: collapse each user's event-type assertion stream
      // into half-open validity intervals (open tail = current belief)
      graft.graph.History.validityIntervals(
        t(s, d, "events").select(col("user_id").as("subj"),
          lit("status").as("pred"), col("event_type").as("obj"), col("ts")))
        .withColumnRenamed("subj", "user_id")),
    "q95_entity_pivot" -> ((s, d) => {
      // triples -> wide entity table by conditional aggregation (no pivot
      // distinct-scan); ordered_part is multi-valued and resolves to
      // max(obj) with the collapse counted in n_vals
      val o = t(s, d, "orders")
      def subj(c: org.apache.spark.sql.Column) = concat(lit("o"), c)
      val tr = o.select(subj(col("o_orderkey")).as("subj"),
          lit("placed_by").as("pred"),
          concat(lit("c"), col("o_custkey")).as("obj"))
        .union(o.select(subj(col("o_orderkey")), lit("has_priority"),
          col("o_orderpriority")))
        .union(t(s, d, "lineitem").select(subj(col("l_orderkey")),
          lit("ordered_part"), concat(lit("p"), col("l_partkey"))))
      graft.graph.EntityTable.entityTable(tr,
        Seq("placed_by", "has_priority", "ordered_part"),
        nValsCol = Some("n_vals"))
    }),
    "q96_setsim_join" -> ((s, d) =>
      // EXACT jaccard >= 0.9 over distinct-word sets via prefix filtering
      // (AllPairs/PPJoin) — the zero-recall-loss twin of q21's minhash
      graft.ops.SetSim.jaccardJoin(
        t(s, d, "documents").select(col("doc_id"),
          array_distinct(split(trim(col("text")), "\\s+")).as("toks")),
        "doc_id", "toks", threshold = 0.9)),
    "q97_profile" -> ((s, d) =>
      // one-pass data-quality report (count/null/distinct/min/max per
      // column, single Expand aggregate — no per-column jobs)
      graft.ops.Profile.columns(t(s, d, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))),
    "q98_kmv_distinct" -> ((s, d) =>
      // per-language distinct-text cardinality via the deterministic KMV
      // sketch (exact below k; (k-1)*M/h_k above)
      graft.ops.Sketch.kmvDistinct(t(s, d, "documents"),
        Seq("lang"), "text", k = 64)),
    "q99_golden_record" -> ((s, d) =>
      // survivorship: one canonical record per customer entity by
      // majority vote over its order records (ties to the largest value)
      graft.canon.Survivorship.goldenRecord(t(s, d, "orders"),
        "o_custkey", Seq("o_orderpriority", "o_orderstatus"))),
    "q100_event_patterns" -> ((s, d) =>
      // frequent consecutive event-type trigrams across users (behavior
      // motifs; per-user sequence is ONE wide row, ordered by (ts, id))
      graft.ops.Sequences.frequentPatterns(t(s, d, "events"),
        "user_id", Seq("ts", "event_id"), "event_type", k = 3, minKeys = 5L)),
    "q101_resample_locf" -> ((s, d) =>
      // per-user hourly gauge grid with last-observation-carried-forward
      graft.ops.Resample.locf(t(s, d, "events"),
        Seq("user_id"), "ts", "value")),
    "q102_cooccur_pmi" -> ((s, d) =>
      // q93's co-order projection scored by association strength (lift +
      // PMI over margins from the same kept membership)
      graft.graph.Cooccur.pmi(t(s, d, "lineitem"),
        "l_orderkey", "l_partkey", minCount = 2L)),
    "q103_outliers" -> ((s, d) =>
      // per-language length outliers (|z| > 1.5) with exact integer moments
      graft.ops.Profile.outliers(t(s, d, "documents"),
        Seq("lang"), "n_chars", threshold = 1.5)),
    "q104_histogram" -> ((s, d) =>
      // integer-exact equi-width length histogram, holes emitted as 0
      graft.ops.Profile.histogram(t(s, d, "documents"), "n_chars", nBins = 20)),
    "q105_cdc_apply" -> ((s, d) => {
      // CDC mirror maintenance: earliest event seeds the base snapshot,
      // the rest replay as a typed feed (view→U, click→I, error→D);
      // time axis = exact integer microseconds (unix_micros)
      val ev = t(s, d, "events").where(col("user_id").isNotNull)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
      val first = ev.withColumn("__r", row_number().over(w))
      val base = first.where(col("__r") === 1).select(col("user_id"), col("value"))
      val feed = first.where(col("__r") > 1)
        .where(col("event_type").isin("view", "click", "error"))
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          when(col("event_type") === "view", "U")
            .when(col("event_type") === "click", "I")
            .otherwise("D").as("op"),
          col("value"))
      graft.ops.Cdc.applyChanges(base, feed, Seq("user_id"), "ts_us", "op",
        Seq("value"))
    }),
    "q106_group_sample" -> ((s, d) =>
      // deterministic fixed-size per-language eval sample (k smallest
      // scrambled hashes — consistent under corpus growth)
      graft.ops.Curation.groupSample(t(s, d, "documents"),
        Seq("lang"), col("doc_id"), k = 10)),
    "q107_quantiles" -> ((s, d) =>
      // exact per-language p50/p90/p99 length profile (percentile_disc;
      // heavy machinery at value-scale, not row-scale)
      graft.ops.Profile.quantiles(t(s, d, "documents"),
        Seq("lang"), "n_chars", Seq(0.5, 0.9, 0.99))),
    "q108_skyline" -> ((s, d) =>
      // Pareto frontier of parts by (size, retail price), both maximized
      graft.ops.Curation.skyline(t(s, d, "part"), "p_size", "p_retailprice")),
    "q109_cluster_agreement" -> ((s, d) =>
      // pairwise P/R/F1 + ARI between the nation partition and the
      // market-segment partition of customers — all from the contingency
      // table, zero pair enumeration
      graft.metrics.ClusterEval.pairwisePR(
        t(s, d, "customer").select(col("c_custkey"),
          col("c_nationkey").cast("string").as("pred"),
          col("c_mktsegment").as("gold")),
        "c_custkey", "pred", "gold")),
    "q110_inclusion" -> ((s, d) => {
      // FK-candidate discovery across the corpus star schema: forward
      // FKs (expect 1.0) plus reverse/heterogeneous probes (expect < 1)
      val li = t(s, d, "lineitem"); val ord = t(s, d, "orders")
      val pt = t(s, d, "part"); val cu = t(s, d, "customer")
      val na = t(s, d, "nation"); val ev = t(s, d, "events")
      graft.ops.Profile.inclusion(Seq(
        ("lineitem", li, "l_orderkey", "orders", ord, "o_orderkey"),
        ("lineitem", li, "l_partkey", "part", pt, "p_partkey"),
        ("orders", ord, "o_custkey", "customer", cu, "c_custkey"),
        ("customer", cu, "c_nationkey", "nation", na, "n_nationkey"),
        ("part", pt, "p_partkey", "lineitem", li, "l_partkey"),
        ("events", ev, "user_id", "customer", cu, "c_custkey")))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q46_av_decode" ->
      """SELECT media_ref, kind, width, height, n_frames, f_rms_or_r, f_zcr_or_b
        |FROM read_parquet('/root/repo/src/test/resources/expected/q46_av_decode.parquet')""".stripMargin,
    // q69: an independent relational re-derivation of the RDFS rules —
    // recursive CTEs for the two hierarchy closures, plain joins for
    // rdfs7 (subproperty entailment), literal constants for the planted
    // domain/range rules, a join for rdfs9 (type inheritance).
    "q69_rdfs_closure" ->
      """WITH RECURSIVE
        |sco AS (SELECT 'k'||c_custkey AS s, 'k'||(c_custkey//2) AS o
        |        FROM customer WHERE c_custkey BETWEEN 2 AND 63),
        |scp AS (SELECT s, o FROM sco
        |        UNION SELECT scp.s, sco.o FROM scp JOIN sco ON scp.o = sco.s),
        |spo(s, o) AS (SELECT * FROM (VALUES ('p:ordered','p:related'),
        |                                    ('p:related','p:linked'))),
        |spp AS (SELECT s, o FROM spo
        |        UNION SELECT spp.s, spo.o FROM spp JOIN spo ON spp.o = spo.s),
        |dat AS (SELECT 'c'||o_custkey AS s, 'p:ordered' AS p, 'o'||o_orderkey AS o
        |        FROM orders WHERE o_orderkey % 20 = 0),
        |typ0 AS (SELECT 'c'||c_custkey AS s, 'k'||(c_custkey % 62 + 2) AS c
        |         FROM customer WHERE c_custkey % 30 = 0),
        |props AS (SELECT s, p, o FROM dat
        |          UNION ALL SELECT dat.s, spp.o, dat.o FROM dat JOIN spp ON dat.p = spp.s),
        |types AS (SELECT s, c FROM typ0
        |          UNION ALL SELECT props.s, 'k3' FROM props WHERE props.p = 'p:ordered'
        |          UNION ALL SELECT props.o, 'k5' FROM props WHERE props.p = 'p:ordered'),
        |alltypes AS (SELECT s, c FROM types
        |             UNION ALL SELECT types.s, scp.o FROM types JOIN scp ON types.c = scp.s)
        |SELECT DISTINCT subj, pred, obj FROM (
        |  SELECT s AS subj, 'rdfs:subClassOf' AS pred, o AS obj FROM scp
        |  UNION ALL SELECT s, 'rdfs:subPropertyOf', o FROM spp
        |  UNION ALL SELECT * FROM (VALUES ('p:ordered','rdfs:domain','k3'),
        |                                  ('p:ordered','rdfs:range','k5'))
        |  UNION ALL SELECT s, p, o FROM props
        |  UNION ALL SELECT s, 'rdf:type', c FROM alltypes)""".stripMargin,
    // q70: UNION of the two branch shapes directly on the base table;
    // the second branch leaves ?c unbound → NULL.
    "q70_bgp_union" ->
      """SELECT 'o'||o_orderkey AS o, 'c'||o_custkey AS c
        |FROM orders WHERE o_totalprice > 250000
        |UNION ALL
        |SELECT 'o'||o_orderkey, NULL FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin,
    // q71: MINUS's compatible-solution removal is, on this graph, the
    // relational anti condition (the marker exists iff totalprice>250000).
    "q71_bgp_minus" ->
      """SELECT 'o'||o_orderkey AS o, 'c'||o_custkey AS c, o_orderpriority AS p
        |FROM orders WHERE o_totalprice <= 250000""".stripMargin,
    // q72: DuckDB rebuilds every N-Triples line with its own replace()
    // chain (backslash first) — an independent implementation of the
    // ECHAR escaping and the line layout.
    "q72_ntriples" ->
      """WITH esc AS (
        |  SELECT replace(replace(replace(replace(replace(
        |    c_mktsegment || '"q\' || chr(10) || chr(9) || 'z',
        |    '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t') AS lit_obj,
        |    c_custkey, c_nationkey, c_name
        |  FROM customer)
        |SELECT '<urn:c'||c_custkey||'> <urn:p:comment> "'||lit_obj||'"^^<urn:dt:s> .' AS nt_line FROM esc
        |UNION ALL
        |SELECT '<urn:c'||c_custkey||'> <urn:p:nation> <urn:n'||c_nationkey||'> .' FROM customer
        |UNION ALL
        |SELECT '<urn:c'||c_custkey||'> <urn:p:name> "'||c_name||'"@en-GB .' FROM customer""".stripMargin,
    // q73: the sequential definition — a recursive CTE enumerating every
    // path's weight sum over the DAG (parent + shortcut edges), min() in
    // the outer query; independent of the engine's delta-relaxation loop.
    "q73_weighted_sssp" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'c'||(c_custkey//2) AS s, 'c'||c_custkey AS d,
        |         CAST(c_custkey % 7 + 1 AS BIGINT) AS w
        |  FROM customer WHERE c_custkey > 1
        |  UNION ALL
        |  SELECT 'c'||(c_custkey//4), 'c'||c_custkey,
        |         CAST(c_custkey % 5 + 1 AS BIGINT)
        |  FROM customer WHERE c_custkey > 3
        |), r AS (
        |  SELECT 'c1' AS id, CAST(0 AS BIGINT) AS dist
        |  UNION ALL
        |  SELECT e.d, r.dist + e.w FROM r JOIN e ON e.s = r.id
        |)
        |SELECT id, 'c1' AS landmark, min(dist) AS dist FROM r GROUP BY 1""".stripMargin,
    // q74: the relational join builds the same constructed graph (set
    // semantics — CONSTRUCT merges instantiations into one RDF graph).
    "q74_construct" ->
      """SELECT DISTINCT subj, pred, obj FROM (
        |  SELECT 'c'||c_custkey AS subj, 'co_region' AS pred,
        |         'r'||n_regionkey AS obj
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT 'c'||c_custkey, 'rdf:type', 'RegionalCustomer' FROM customer)""".stripMargin,
    // q75: an independent FULL-OUTER re-derivation of the two versions —
    // present-in-one-side-only rows with the change class.
    "q75_graph_diff" ->
      """WITH v1 AS (
        |  SELECT 'o'||o_orderkey AS subj, 'placed_by' AS pred,
        |         'c'||o_custkey AS obj FROM orders
        |), v2 AS (
        |  SELECT 'o'||o_orderkey AS subj,
        |         CASE WHEN o_orderstatus = 'F' THEN 'ordered_by'
        |              ELSE 'placed_by' END AS pred,
        |         'c'||o_custkey AS obj FROM orders
        |  UNION ALL
        |  SELECT 'o'||o_orderkey, 'urgency', 'high' FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |)
        |SELECT coalesce(v1.subj, v2.subj) AS subj,
        |       coalesce(v1.pred, v2.pred) AS pred,
        |       coalesce(v1.obj, v2.obj) AS obj,
        |       CASE WHEN v1.subj IS NULL THEN 'added' ELSE 'removed' END AS change
        |FROM v1 FULL OUTER JOIN v2
        |  ON v1.subj = v2.subj AND v1.pred = v2.pred AND v1.obj = v2.obj
        |WHERE v1.subj IS NULL OR v2.subj IS NULL""".stripMargin,
    // q76: the sequential definition — a recursive CTE for the closure
    // composed with a join for the sequence step, DISTINCT for the
    // SPARQL path set semantics.
    "q76_property_path" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'c'||c_custkey AS s, 'c'||(c_custkey//2) AS d
        |  FROM customer WHERE c_custkey > 1
        |), r AS (
        |  SELECT s, d FROM e
        |  UNION
        |  SELECT r.s, e.d FROM r JOIN e ON r.d = e.s
        |), seg AS (
        |  SELECT 'c'||c_custkey AS s, c_mktsegment AS m FROM customer
        |)
        |SELECT DISTINCT r.s AS src, seg.m AS dst FROM r JOIN seg ON r.d = seg.s""".stripMargin,
    "q77_bgp_agg" ->
      """WITH e AS (
        |  SELECT 'c'||c_custkey AS a, 'c'||(c_custkey//2) AS p
        |  FROM customer WHERE c_custkey > 1
        |), seg AS (
        |  SELECT 'c'||c_custkey AS p, c_mktsegment AS seg FROM customer
        |)
        |SELECT seg.seg AS seg, count(*) AS n_links, count(DISTINCT e.p) AS n_parents
        |FROM e JOIN seg ON e.p = seg.p GROUP BY 1""".stripMargin,
    // q78/q79 share the tree+grandparent-shortcut graph; both oracles
    // rebuild the canonical undirected edge set from scratch
    "q78_link_prediction" ->
      """WITH raw AS (
        |  SELECT 'c'||c_custkey AS x, 'c'||(c_custkey//2) AS y
        |  FROM customer WHERE c_custkey > 1
        |  UNION ALL
        |  SELECT 'c'||c_custkey, 'c'||(c_custkey//4)
        |  FROM customer WHERE c_custkey > 3
        |), e AS (
        |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM raw WHERE x <> y
        |), adj AS (
        |  SELECT a AS id, b AS nb FROM e UNION ALL SELECT b, a FROM e
        |), deg AS (
        |  SELECT id, count(*) AS deg FROM adj GROUP BY 1
        |), wedges AS (
        |  SELECT l.nb AS a, r.nb AS b, l.id AS w
        |  FROM adj l JOIN adj r ON l.id = r.id AND l.nb < r.nb
        |), miss AS (
        |  SELECT w.a, w.b, w.w FROM wedges w
        |  LEFT JOIN e ON e.a = w.a AND e.b = w.b WHERE e.a IS NULL
        |), paired AS (
        |  SELECT m.a, m.b, count(*) AS common, sum(1.0 / ln(d.deg)) AS aa
        |  FROM miss m JOIN deg d ON d.id = m.w GROUP BY 1, 2
        |  HAVING count(*) >= 2
        |)
        |SELECT p.a, p.b, p.common,
        |       round(p.common / (da.deg + db.deg - p.common), 6) AS jaccard,
        |       round(p.aa, 6) AS adamic_adar
        |FROM paired p
        |JOIN deg da ON da.id = p.a
        |JOIN deg db ON db.id = p.b""".stripMargin,
    "q79_clustering_coefficient" ->
      """WITH raw AS (
        |  SELECT 'c'||c_custkey AS x, 'c'||(c_custkey//2) AS y
        |  FROM customer WHERE c_custkey > 1
        |  UNION ALL
        |  SELECT 'c'||c_custkey, 'c'||(c_custkey//4)
        |  FROM customer WHERE c_custkey > 3
        |), e AS (
        |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM raw WHERE x <> y
        |), adj AS (
        |  SELECT a AS id, b AS nb FROM e UNION ALL SELECT b, a FROM e
        |), deg AS (
        |  SELECT id, count(*) AS deg FROM adj GROUP BY 1
        |), tris AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |), pern AS (
        |  SELECT id, count(*) AS n_tri FROM (
        |    SELECT x AS id FROM tris
        |    UNION ALL SELECT y FROM tris
        |    UNION ALL SELECT z FROM tris) GROUP BY 1
        |)
        |SELECT d.id, d.deg, COALESCE(p.n_tri, 0) AS n_tri,
        |       round(CASE WHEN d.deg < 2 THEN 0.0
        |             ELSE COALESCE(p.n_tri, 0) * 2.0 / (d.deg * (d.deg - 1.0)) END,
        |             6) AS coeff
        |FROM deg d LEFT JOIN pern p USING (id)""".stripMargin,
    // q80/q81: the q49 window expansion (w[i:i+7] = 8-token slices); q80's
    // fp is the q28 rolling-hash replica applied to each repeated passage
    "q80_repeated_passages" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE length(trim(text)) > 0
        |), g AS (
        |  SELECT doc_id, array_to_string(w[i:i+7], ' ') AS passage
        |  FROM words, unnest(range(1, len(w) - 8 + 2)) AS t(i)
        |  WHERE len(w) >= 8
        |), r AS (
        |  SELECT passage, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
        |  FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |)
        |SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         [CAST(unicode(c) AS BIGINT) FOR c IN string_split(passage, '')]),
        |       (h, c) -> (h * 31 + c) % 2147483647) AS fp,
        |       passage, n_docs, n_occurrences
        |FROM r""".stripMargin,
    "q81_boilerplate_fraction" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE length(trim(text)) > 0
        |), g AS (
        |  SELECT doc_id, array_to_string(w[i:i+7], ' ') AS passage
        |  FROM words, unnest(range(1, len(w) - 8 + 2)) AS t(i)
        |  WHERE len(w) >= 8
        |), r AS (
        |  SELECT passage AS rp FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |), agg AS (
        |  SELECT g.doc_id, count(*) AS n_windows, count(r.rp) AS n_repeated
        |  FROM g LEFT JOIN r ON g.passage = r.rp GROUP BY 1
        |)
        |SELECT d.doc_id AS id,
        |       COALESCE(a.n_windows, 0) AS n_windows,
        |       COALESCE(a.n_repeated, 0) AS n_repeated,
        |       CASE WHEN a.n_windows IS NULL THEN 0.0
        |            ELSE round(a.n_repeated / CAST(a.n_windows AS DOUBLE), 4) END
        |         AS boilerplate_frac
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin,
    // q82: per-token q28 rolling hash -> 64 buckets; additive smoothing
    // alpha = 0.01 over target (lang = en) vs background distributions
    "q82_importance_weights" ->
      """WITH toks AS (
        |  SELECT d.doc_id, (d.lang = 'en') AS tgt,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           [CAST(unicode(c) AS BIGINT) FOR c IN string_split(u.tok, '')]),
        |          (h, c) -> (h * 31 + c) % 2147483647) % 64 AS bucket
        |  FROM documents d, unnest(string_split_regex(trim(d.text), '\s+')) AS u(tok)
        |  WHERE length(u.tok) > 0
        |), counts AS (
        |  SELECT bucket,
        |         sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS n_tgt,
        |         sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS n_bg
        |  FROM toks GROUP BY 1
        |), tot AS (
        |  SELECT sum(n_tgt) AS t_tgt, sum(n_bg) AS t_bg FROM counts
        |), ratios AS (
        |  SELECT bucket,
        |         ln((n_tgt + 0.01) / (t_tgt + 0.01 * 64)) -
        |         ln((n_bg + 0.01) / (t_bg + 0.01 * 64)) AS lr
        |  FROM counts, tot
        |), per AS (
        |  SELECT doc_id, sum(lr) AS w, count(*) AS n
        |  FROM toks JOIN ratios USING (bucket) GROUP BY 1
        |)
        |SELECT d.doc_id AS id, COALESCE(p.n, 0) AS n_tokens,
        |       round(COALESCE(p.w, 0.0), 6) AS weight
        |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id""".stripMargin,
    // q83: DuckDB's NATIVE ASOF JOIN is the oracle — a genuinely independent
    // implementation of the same semantics (largest rts <= ts per key, ties
    // match, unmatched lefts keep nulls)
    "q83_asof_join" ->
      """WITH gauge AS (
        |  SELECT user_id, date_trunc('hour', ts) AS rts, max(value) AS gauge
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts, g.rts AS asof_ts, g.gauge
        |FROM events l ASOF LEFT JOIN gauge g
        |  ON l.user_id = g.user_id AND l.ts >= g.rts
        |WHERE l.event_type = 'click'""".stripMargin,
    // q84: the raw inequality join IS the definition; DuckDB executes it
    // natively (IEJoin), the engine must reproduce it via bucketized equi join
    "q84_interval_join" ->
      """WITH ew AS (
        |  SELECT event_id AS error_id, ts AS lo, ts + INTERVAL 10 MINUTE AS hi
        |  FROM events WHERE event_type = 'error')
        |SELECT l.event_id, l.user_id, l.ts, ew.error_id
        |FROM events l JOIN ew ON l.ts >= ew.lo AND l.ts < ew.hi
        |WHERE l.event_type = 'click'""".stripMargin,
    // q85: the SEQUENTIAL definition — DuckDB's recursive-CTE reachability
    // closure, mutual pairs, min-member labels; independent of both the
    // engine's coloring loop and its driver Tarjan
    "q85_scc" ->
      """WITH RECURSIVE edges AS (
        |  SELECT c_custkey AS src, c_custkey // 2 AS dst
        |  FROM customer WHERE c_custkey > 1
        |  UNION ALL
        |  SELECT c_custkey // 2 AS src, c_custkey AS dst
        |  FROM customer WHERE c_custkey > 1 AND c_custkey % 3 = 0
        |), reach(s, d) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.s, e.dst FROM reach r JOIN edges e ON r.d = e.src
        |), nodes AS (
        |  SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges
        |), mutual AS (
        |  SELECT a.s AS x, a.d AS y FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
        |)
        |SELECT n.id, least(n.id, coalesce(min(m.y), n.id)) AS scc
        |FROM nodes n LEFT JOIN mutual m ON m.x = n.id
        |GROUP BY n.id""".stripMargin,
    // q86: DuckDB replays the BM25 arithmetic relationally end to end
    // (Lucene idf form, k1=1.2 b=0.75 folded as literals 2.2/0.25/0.75)
    "q86_bm25" ->
      """WITH dl AS (
        |  SELECT doc_id AS id,
        |    len(list_filter(string_split_regex(trim(coalesce(text,'')), '\s+'),
        |        t -> length(t) > 0)) AS dl
        |  FROM documents
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         CAST(avg(dl) AS DOUBLE) AS avgdl FROM dl
        |), tf AS (
        |  SELECT d.doc_id AS id, u.tok AS term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM documents d,
        |       unnest(string_split_regex(trim(coalesce(d.text,'')), '\s+')) AS u(tok)
        |  WHERE u.tok IN ('spark','join','window')
        |  GROUP BY 1, 2
        |), idf AS (
        |  SELECT term, ln(1.0 + (s.n_docs - count(*) + 0.5) / (count(*) + 0.5)) AS idf
        |  FROM tf, stats s GROUP BY term, s.n_docs
        |), scored AS (
        |  SELECT tf.id, count(*) AS n_terms,
        |    round(sum(idf.idf * tf.tf * 2.2 /
        |              (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 6) AS score
        |  FROM tf JOIN idf USING (term) JOIN dl ON dl.id = tf.id, stats s
        |  GROUP BY tf.id
        |)
        |SELECT id, n_terms, score,
        |       CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS BIGINT) AS rank
        |FROM scored ORDER BY score DESC, id ASC LIMIT 25""".stripMargin,
    // q87: DuckDB recomputes the SCC map (q85's CTE), condenses it
    // relationally, and derives longest-path levels by recursive path
    // enumeration + max — independent of the engine's Kahn peeling
    "q87_condensation_levels" ->
      """WITH RECURSIVE edges AS (
        |  SELECT c_custkey AS src, c_custkey // 2 AS dst
        |  FROM customer WHERE c_custkey > 1
        |  UNION ALL
        |  SELECT c_custkey // 2 AS src, c_custkey AS dst
        |  FROM customer WHERE c_custkey > 1 AND c_custkey % 3 = 0
        |), reach(s, d) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.s, e.dst FROM reach r JOIN edges e ON r.d = e.src
        |), nodes AS (
        |  SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges
        |), mutual AS (
        |  SELECT a.s AS x, a.d AS y FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
        |), scc AS (
        |  SELECT n.id, least(n.id, coalesce(min(m.y), n.id)) AS scc
        |  FROM nodes n LEFT JOIN mutual m ON m.x = n.id GROUP BY n.id
        |), cedges AS (
        |  SELECT DISTINCT s1.scc AS src, s2.scc AS dst
        |  FROM edges e JOIN scc s1 ON e.src = s1.id JOIN scc s2 ON e.dst = s2.id
        |  WHERE s1.scc <> s2.scc
        |), cnodes AS (
        |  SELECT src AS id FROM cedges UNION SELECT dst FROM cedges
        |), paths(id, d) AS (
        |  SELECT id, 0 FROM cnodes WHERE id NOT IN (SELECT dst FROM cedges)
        |  UNION
        |  SELECT c.dst, p.d + 1 FROM paths p JOIN cedges c ON p.id = c.src
        |)
        |SELECT id AS scc, CAST(max(d) AS BIGINT) AS level
        |FROM paths GROUP BY id""".stripMargin,
    // q88: the raw quadratic scan IS the definition — DuckDB's built-in
    // levenshtein over all ordered pairs, independent of the deletion-
    // neighborhood blocking under test
    "q88_editdist_join" ->
      """WITH n AS (SELECT CAST(c_custkey AS VARCHAR) AS id, c_name FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.id < b.id
        |  AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,
    // q89: the progressive min-chain IS the earliest-completion funnel
    // definition; DuckDB re-derives it with its own CTE chain
    "q89_funnel" ->
      """WITH e AS (
        |  SELECT user_id AS u, ts, event_type AS typ FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), t1 AS (
        |  SELECT u, min(ts) AS t1 FROM e WHERE typ = 'view' GROUP BY u
        |), t2 AS (
        |  SELECT e.u, min(e.ts) AS t2 FROM e JOIN t1 ON e.u = t1.u
        |  WHERE e.typ = 'click' AND e.ts > t1.t1 GROUP BY e.u
        |), t3 AS (
        |  SELECT e.u, min(e.ts) AS t3 FROM e JOIN t2 ON e.u = t2.u
        |  WHERE e.typ = 'purchase' AND e.ts > t2.t2 GROUP BY e.u
        |)
        |SELECT t1.u AS user_id,
        |       CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3
        |                 WHEN t2.t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stages,
        |       t1.t1 AS first_ts, coalesce(t3.t3, t2.t2, t1.t1) AS last_ts
        |FROM t1 LEFT JOIN t2 ON t1.u = t2.u LEFT JOIN t3 ON t1.u = t3.u""".stripMargin,
    // q90: DuckDB replays the running-max chain construction with its own
    // window machinery
    "q90_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, ts AS lo, ts + INTERVAL 10 MINUTE AS hi
        |  FROM events
        |  WHERE event_type = 'error' AND user_id IS NOT NULL AND ts IS NOT NULL
        |), marked AS (
        |  SELECT user_id, lo, hi,
        |    CASE WHEN max(hi) OVER w IS NULL OR lo > max(hi) OVER w
        |         THEN 1 ELSE 0 END AS new_c
        |  FROM iv
        |  WINDOW w AS (PARTITION BY user_id ORDER BY lo, hi
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |), chains AS (
        |  SELECT user_id, lo, hi,
        |    sum(new_c) OVER (PARTITION BY user_id ORDER BY lo, hi
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chain
        |  FROM marked
        |)
        |SELECT user_id, min(lo) AS lo, max(hi) AS hi, count(*) AS n_merged
        |FROM chains GROUP BY user_id, chain""".stripMargin,
    // q91: DuckDB replays u = (fp('w:'||id) mod 2^20 + 1)/2^20 with its own
    // list_reduce fold (the q52-proven portable hash) and the same single
    // IEEE division — bit-identical priorities, identical top-k cut
    "q91_priority_sample" ->
      """SELECT doc_id, n_chars, u, u / CAST(n_chars AS DOUBLE) AS priority
        |FROM (
        |  SELECT doc_id, n_chars,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(unicode(c) AS BIGINT)
        |       FOR c IN string_split('w:' || CAST(doc_id AS VARCHAR), '')]),
        |     (h, c) -> (h * 31 + c) % 2147483647) % 1048576 + 1 AS DOUBLE)
        |      / 1048576.0 AS u
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0)
        |ORDER BY priority ASC, doc_id ASC LIMIT 50""".stripMargin,
    // q92: DuckDB re-derives the neighbor mean relationally (zipped unnest
    // of index range + double-cast values, GROUP BY (node, dim) avg)
    "q92_neighbor_mean" ->
      """WITH e AS (
        |  SELECT vec_id AS src, vec_id // 2 AS dst FROM embeddings WHERE vec_id > 1
        |  UNION ALL
        |  SELECT vec_id AS src, vec_id // 4 AS dst FROM embeddings WHERE vec_id > 3
        |), msg AS (
        |  SELECT e.dst,
        |         unnest(range(len(f.embedding))) AS i,
        |         unnest([CAST(x AS DOUBLE) FOR x IN f.embedding]) AS v
        |  FROM e JOIN embeddings f ON f.vec_id = e.src
        |)
        |SELECT dst AS id, CAST(i AS BIGINT) AS i, round(avg(v), 6) AS mean
        |FROM msg GROUP BY 1, 2""".stripMargin,
    // q93: the definitional relational projection (ids compared as VARCHAR,
    // matching the operator's string id model)
    "q93_cooccurrence" ->
      """WITH m AS (
        |  SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS c,
        |         CAST(l_partkey AS VARCHAR) AS i
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL)
        |SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_common
        |FROM m a JOIN m b ON a.c = b.c AND a.i < b.i
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    // q94: DuckDB replays the run construction with its own window
    // machinery (lag change-detect -> running-sum run id -> run aggregate
    // -> lead), the q90 precedent for order-dependent operators
    "q94_validity_intervals" ->
      """WITH base AS (
        |  SELECT user_id, 'status' AS pred, event_type AS obj, ts
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
        |), marked AS (
        |  SELECT *, CASE WHEN lag(obj) OVER w IS NULL OR lag(obj) OVER w <> obj
        |                 THEN 1 ELSE 0 END AS chg
        |  FROM base WINDOW w AS (PARTITION BY user_id, pred ORDER BY ts, obj)
        |), runs AS (
        |  SELECT user_id, pred, obj, min(ts) AS valid_from, count(*) AS n_events, r
        |  FROM (SELECT *, sum(chg) OVER (PARTITION BY user_id, pred
        |          ORDER BY ts, obj ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
        |        FROM marked)
        |  GROUP BY user_id, pred, obj, r
        |)
        |SELECT user_id, pred, obj, valid_from,
        |       lead(valid_from) OVER (PARTITION BY user_id, pred ORDER BY r) AS valid_to,
        |       n_events
        |FROM runs""".stripMargin,
    // q95: the oracle answers RELATIONALLY on the base tables (orders +
    // a lineitem max/count rollup) — independent of the triple-ization
    // and the conditional-aggregation pivot under test
    "q95_entity_pivot" ->
      """SELECT 'o' || o_orderkey AS subj,
        |       'c' || o_custkey AS placed_by,
        |       o_orderpriority AS has_priority,
        |       lp.top_part AS ordered_part,
        |       CAST(2 + coalesce(lp.n_parts, 0) AS BIGINT) AS n_vals
        |FROM orders LEFT JOIN (
        |  SELECT l_orderkey, max('p' || l_partkey) AS top_part,
        |         count(*) AS n_parts
        |  FROM lineitem GROUP BY 1
        |) lp ON lp.l_orderkey = o_orderkey""".stripMargin,
    // q96: the raw quadratic scan IS the definition — DuckDB all-pairs
    // exact jaccard over distinct-word sets, independent of the prefix-
    // filtering blocking under test (the q88 oracle pattern)
    "q96_setsim_join" ->
      """WITH s AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS id,
        |         list_distinct(string_split_regex(trim(text), '\s+')) AS toks
        |  FROM documents WHERE text IS NOT NULL
        |), p AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |         len(list_intersect(a.toks, b.toks)) AS i,
        |         len(a.toks) AS sa, len(b.toks) AS sb
        |  FROM s a JOIN s b ON a.id < b.id
        |)
        |SELECT id_a, id_b,
        |       round(CAST(i AS DOUBLE) / (sa + sb - i), 4) AS jaccard
        |FROM p WHERE CAST(i AS DOUBLE) / (sa + sb - i) >= 0.9""".stripMargin,
    // q97: the report restated as five independent scalar aggregates
    "q97_profile" -> Seq("doc_id", "text", "lang", "source", "n_chars").map {
      c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val FROM documents""".stripMargin
    }.mkString("", "\nUNION ALL\n", ""),
    // q98: DuckDB replays the scrambled portable hash (the q28 fingerprint
    // fold + two MINSTD LCG rounds) and the same row_number/aggregate
    // construction — bit-identical h_k, identical IEEE estimate
    "q98_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT lang,
        |    (( (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          [CAST(unicode(c) AS BIGINT) FOR c IN string_split(text, '')]),
        |        (h, c) -> (h * 31 + c) % 2147483647)
        |       * 48271 + 12345) % 2147483647)
        |     * 69621 + 54321) % 2147483647 AS hv
        |  FROM documents WHERE text IS NOT NULL
        |), ranked AS (
        |  SELECT lang, hv,
        |         row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
        |  FROM h
        |), agg AS (
        |  SELECT lang, count(*) AS n_sketch, max(hv) AS h_k
        |  FROM ranked WHERE rn <= 64 GROUP BY lang
        |)
        |SELECT lang, n_sketch, h_k,
        |       CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
        |            ELSE round(63.0 * 2147483647 / h_k, 4) END AS estimate
        |FROM agg""".stripMargin,
    // q99: DuckDB replays the vote (melt -> count -> argmax window ->
    // conditional-agg pivot) with its own machinery
    "q99_golden_record" ->
      """WITH m AS (
        |  SELECT o_custkey AS g, f, v FROM (
        |    SELECT o_custkey, 'o_orderpriority' AS f,
        |           CAST(o_orderpriority AS VARCHAR) AS v FROM orders
        |    UNION ALL
        |    SELECT o_custkey, 'o_orderstatus',
        |           CAST(o_orderstatus AS VARCHAR) FROM orders)
        |  WHERE g IS NOT NULL AND v IS NOT NULL
        |), votes AS (
        |  SELECT g, f, v, count(*) AS n FROM m GROUP BY 1, 2, 3
        |), w AS (
        |  SELECT g, f, v, row_number() OVER (
        |    PARTITION BY g, f ORDER BY n DESC, v DESC) AS r
        |  FROM votes
        |), mem AS (
        |  SELECT o_custkey AS g, count(*) AS n_members FROM orders
        |  WHERE o_custkey IS NOT NULL GROUP BY 1
        |)
        |SELECT p.g AS o_custkey, p.p1 AS o_orderpriority,
        |       p.p2 AS o_orderstatus, mem.n_members
        |FROM (SELECT g,
        |        max(CASE WHEN f = 'o_orderpriority' THEN v END) AS p1,
        |        max(CASE WHEN f = 'o_orderstatus' THEN v END) AS p2
        |      FROM w WHERE r = 1 GROUP BY g) p
        |JOIN mem ON mem.g = p.g""".stripMargin,
    // q100: DuckDB re-derives the ordered sequences with list(ORDER BY)
    // and the q20 slice idiom for consecutive k-grams
    "q100_event_patterns" ->
      """WITH s AS (
        |  SELECT user_id AS g, list(event_type ORDER BY ts, event_id) AS t
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1
        |), grams AS (
        |  SELECT g, array_to_string(t[i:i+2], '>') AS pattern
        |  FROM s, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)
        |  WHERE len(t) >= 3
        |)
        |SELECT pattern, count(DISTINCT g) AS n_keys,
        |       count(*) AS n_occurrences
        |FROM grams GROUP BY 1 HAVING count(DISTINCT g) >= 5""".stripMargin,
    // q101: DuckDB rebuilds the grid with generate_series and fills with
    // its own IGNORE NULLS running frame
    "q101_resample_locf" ->
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket, ts, value
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        |), obs AS (
        |  SELECT user_id, bucket, value FROM (
        |    SELECT user_id, bucket, value, row_number() OVER (
        |      PARTITION BY user_id, bucket ORDER BY ts DESC, value DESC) AS r
        |    FROM b) WHERE r = 1
        |), grid AS (
        |  SELECT user_id,
        |         unnest(generate_series(min(bucket), max(bucket),
        |                INTERVAL 1 HOUR)) AS bucket
        |  FROM obs GROUP BY user_id
        |)
        |SELECT g.user_id, g.bucket,
        |       last_value(o.value IGNORE NULLS) OVER (
        |         PARTITION BY g.user_id ORDER BY g.bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |       o.value IS NOT NULL AS observed
        |FROM grid g LEFT JOIN obs o
        |  ON o.user_id = g.user_id AND o.bucket = g.bucket""".stripMargin,
    // q102: the definitional relational projection + margins in DuckDB;
    // lift is pure IEEE arithmetic on exact integers, pmi one ln at 6dp
    // (the q82 importance-weights precedent)
    "q102_cooccur_pmi" ->
      """WITH m AS (
        |  SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS c,
        |         CAST(l_partkey AS VARCHAR) AS i
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        |), pairs AS (
        |  SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_common
        |  FROM m a JOIN m b ON a.c = b.c AND a.i < b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), marg AS (SELECT i, count(*) AS n FROM m GROUP BY 1),
        |tot AS (SELECT count(DISTINCT c) AS n_total FROM m)
        |SELECT item_a, item_b, n_common,
        |  round((CAST(n_common AS DOUBLE) * CAST(n_total AS DOUBLE))
        |        / (CAST(ma.n AS DOUBLE) * CAST(mb.n AS DOUBLE)), 6) AS lift,
        |  round(ln((CAST(n_common AS DOUBLE) * CAST(n_total AS DOUBLE))
        |        / (CAST(ma.n AS DOUBLE) * CAST(mb.n AS DOUBLE))), 6) AS pmi
        |FROM pairs
        |JOIN marg ma ON ma.i = item_a
        |JOIN marg mb ON mb.i = item_b, tot""".stripMargin,
    // q103: DuckDB replays the exact-integer-moment z-scores (its BIGINT
    // sums are exact too; the double expression is term-for-term the same)
    "q103_outliers" ->
      """WITH b AS (
        |  SELECT lang, CAST(n_chars AS BIGINT) AS value FROM documents
        |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        |), st AS (
        |  SELECT lang, count(*) AS n, sum(value) AS s,
        |         sum(value * value) AS sq
        |  FROM b GROUP BY 1 HAVING count(*) >= 2
        |), st2 AS (
        |  SELECT lang, n, CAST(s AS DOUBLE) / n AS mu,
        |    (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
        |      / (n - 1) AS var
        |  FROM st
        |)
        |SELECT b.lang, b.value,
        |       round((CAST(b.value AS DOUBLE) - mu) / sqrt(var), 4) AS z
        |FROM b JOIN st2 ON b.lang = st2.lang
        |WHERE var > 0
        |  AND abs((CAST(b.value AS DOUBLE) - mu) / sqrt(var)) > 1.5""".stripMargin,
    // q104: DuckDB replays the integer bin math (`//` = Spark's `div` on
    // non-negative spans) and rebuilds the spine with range()
    "q104_histogram" ->
      """WITH b AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v FROM documents
        |  WHERE n_chars IS NOT NULL
        |), bounds AS (
        |  SELECT min(v) AS lo0, max(v) AS hi0,
        |         greatest((max(v) - min(v) + 20) // 20, 1) AS w
        |  FROM b
        |), binned AS (
        |  SELECT (b.v - bounds.lo0) // bounds.w AS bin, count(*) AS cnt
        |  FROM b, bounds GROUP BY 1
        |), spine AS (
        |  SELECT unnest(range(0, 20)) AS bin, lo0, hi0, w FROM bounds
        |)
        |SELECT s.bin, s.lo0 + s.bin * s.w AS lo,
        |       s.lo0 + (s.bin + 1) * s.w AS hi,
        |       coalesce(c.cnt, CAST(0 AS BIGINT)) AS n
        |FROM spine s LEFT JOIN binned c ON c.bin = s.bin
        |WHERE s.lo0 + s.bin * s.w <= s.hi0""".stripMargin,
    // q105: DuckDB replays seed/feed construction and the latest-change
    // argmax (epoch_us = unix_micros; -infinity seeds the base; D-first
    // at equal ts via op ASC; payload DESC NULLS LAST = struct desc)
    "q105_cdc_apply" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS r
        |  FROM events WHERE user_id IS NOT NULL
        |), base AS (
        |  SELECT user_id, CAST('-infinity' AS DOUBLE) AS tsd, 'I' AS op, value
        |  FROM ev WHERE r = 1
        |), feed AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS DOUBLE) AS tsd,
        |         CASE event_type WHEN 'view' THEN 'U'
        |              WHEN 'click' THEN 'I' ELSE 'D' END AS op,
        |         value
        |  FROM ev
        |  WHERE r > 1 AND event_type IN ('view', 'click', 'error')
        |    AND ts IS NOT NULL
        |), u AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM feed
        |)
        |SELECT user_id, value FROM (
        |  SELECT user_id, op, value, row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY tsd DESC, op ASC, value DESC NULLS LAST) AS r
        |  FROM u)
        |WHERE r = 1 AND op <> 'D'""".stripMargin,
    // q106: DuckDB replays the scrambled portable hash (the q98 KMV
    // uniformizer: fingerprint -> two MINSTD LCG rounds mod 2^31-1) and
    // the same per-group rank-<=k cut
    "q106_group_sample" ->
      """WITH h AS (
        |  SELECT doc_id, text, lang, source, n_chars,
        |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |       [CAST(unicode(c) AS BIGINT)
        |        FOR c IN string_split('gs:' || CAST(doc_id AS VARCHAR), '')]),
        |      (h, c) -> (h * 31 + c) % 2147483647)
        |     * 48271 + 12345) % 2147483647 AS r1
        |  FROM documents WHERE doc_id IS NOT NULL
        |)
        |SELECT doc_id, text, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY (r1 * 69621 + 54321) % 2147483647 ASC, doc_id ASC) AS rk
        |  FROM h)
        |WHERE rk <= 10""".stripMargin,
    // q107: DuckDB's NATIVE percentile_disc — an independent
    // implementation of the same SQL-standard definition (probed: its
    // edge semantics match smallest-value-with-cum-fraction >= p)
    "q107_quantiles" ->
      """WITH b AS (
        |  SELECT lang, CAST(n_chars AS BIGINT) AS value FROM documents
        |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        |), q AS (
        |  SELECT lang,
        |    percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS q0,
        |    percentile_disc(0.9)  WITHIN GROUP (ORDER BY value) AS q1,
        |    percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS q2
        |  FROM b GROUP BY 1
        |)
        |SELECT lang, CAST(0.5 AS DOUBLE) AS p, q0 AS value FROM q
        |UNION ALL SELECT lang, CAST(0.9 AS DOUBLE), q1 FROM q
        |UNION ALL SELECT lang, CAST(0.99 AS DOUBLE), q2 FROM q""".stripMargin,
    // q108: the DEFINITIONAL dominance test — a NOT EXISTS over all
    // distinct points (quadratic, fine at oracle scale; the engine's
    // window construction must select exactly this set)
    "q108_skyline" ->
      """WITH pts AS (
        |  SELECT p_size, p_retailprice, count(*) AS n_rows FROM part
        |  WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT p_size, p_retailprice, n_rows FROM pts r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts s
        |  WHERE s.p_size >= r.p_size AND s.p_retailprice >= r.p_retailprice
        |    AND (s.p_size > r.p_size OR s.p_retailprice > r.p_retailprice))""".stripMargin,
    // q109: the DEFINITIONAL pairwise scan — DuckDB enumerates actual
    // item pairs (id < id self-join) and counts agreements, the engine
    // derives identical totals from the contingency table
    "q109_cluster_agreement" ->
      """WITH a AS (
        |  SELECT c_custkey AS id, CAST(c_nationkey AS VARCHAR) AS p,
        |         c_mktsegment AS g
        |  FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
        |    AND c_mktsegment IS NOT NULL
        |), pr AS (
        |  SELECT count(*) AS n_items FROM a
        |), pairs AS (
        |  SELECT CAST(sum(CASE WHEN x.p = y.p THEN 1 ELSE 0 END) AS BIGINT)
        |           AS pred_pairs,
        |         CAST(sum(CASE WHEN x.g = y.g THEN 1 ELSE 0 END) AS BIGINT)
        |           AS gold_pairs,
        |         CAST(sum(CASE WHEN x.p = y.p AND x.g = y.g THEN 1 ELSE 0 END)
        |           AS BIGINT) AS agree_pairs
        |  FROM a x JOIN a y ON x.id < y.id
        |)
        |SELECT n_items, pred_pairs, gold_pairs, agree_pairs,
        |  round(CAST(agree_pairs AS DOUBLE) / pred_pairs, 6) AS pair_precision,
        |  round(CAST(agree_pairs AS DOUBLE) / gold_pairs, 6) AS pair_recall,
        |  round(2.0 * (CAST(agree_pairs AS DOUBLE) / pred_pairs)
        |      * (CAST(agree_pairs AS DOUBLE) / gold_pairs)
        |      / (CAST(agree_pairs AS DOUBLE) / pred_pairs
        |         + CAST(agree_pairs AS DOUBLE) / gold_pairs), 6) AS pair_f1,
        |  round((CAST(agree_pairs AS DOUBLE)
        |      - CAST(pred_pairs AS DOUBLE) * gold_pairs
        |        / (CAST(n_items AS DOUBLE) * (n_items - 1) / 2))
        |    / ((CAST(pred_pairs AS DOUBLE) + gold_pairs) / 2
        |      - CAST(pred_pairs AS DOUBLE) * gold_pairs
        |        / (CAST(n_items AS DOUBLE) * (n_items - 1) / 2)), 6) AS ari
        |FROM pairs, pr""".stripMargin,
    // q110: definitional distinct-value containment counts per candidate
    "q110_inclusion" ->
      """WITH probe AS (
        |  SELECT 'lineitem' AS fk_rel, 'l_orderkey' AS fk_col,
        |         'orders' AS pk_rel, 'o_orderkey' AS pk_col,
        |         (SELECT count(DISTINCT CAST(l_orderkey AS VARCHAR)) FROM lineitem
        |          WHERE l_orderkey IS NOT NULL) AS n_fk_distinct,
        |         (SELECT count(*) FROM
        |           (SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
        |            WHERE l_orderkey IS NOT NULL) f
        |          WHERE f.k NOT IN (SELECT CAST(o_orderkey AS VARCHAR) FROM orders
        |            WHERE o_orderkey IS NOT NULL)) AS n_missing
        |  UNION ALL
        |  SELECT 'lineitem', 'l_partkey', 'part', 'p_partkey',
        |         (SELECT count(DISTINCT CAST(l_partkey AS VARCHAR)) FROM lineitem
        |          WHERE l_partkey IS NOT NULL),
        |         (SELECT count(*) FROM
        |           (SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS k FROM lineitem
        |            WHERE l_partkey IS NOT NULL) f
        |          WHERE f.k NOT IN (SELECT CAST(p_partkey AS VARCHAR) FROM part
        |            WHERE p_partkey IS NOT NULL))
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey', 'customer', 'c_custkey',
        |         (SELECT count(DISTINCT CAST(o_custkey AS VARCHAR)) FROM orders
        |          WHERE o_custkey IS NOT NULL),
        |         (SELECT count(*) FROM
        |           (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k FROM orders
        |            WHERE o_custkey IS NOT NULL) f
        |          WHERE f.k NOT IN (SELECT CAST(c_custkey AS VARCHAR) FROM customer
        |            WHERE c_custkey IS NOT NULL))
        |  UNION ALL
        |  SELECT 'customer', 'c_nationkey', 'nation', 'n_nationkey',
        |         (SELECT count(DISTINCT CAST(c_nationkey AS VARCHAR)) FROM customer
        |          WHERE c_nationkey IS NOT NULL),
        |         (SELECT count(*) FROM
        |           (SELECT DISTINCT CAST(c_nationkey AS VARCHAR) AS k FROM customer
        |            WHERE c_nationkey IS NOT NULL) f
        |          WHERE f.k NOT IN (SELECT CAST(n_nationkey AS VARCHAR) FROM nation
        |            WHERE n_nationkey IS NOT NULL))
        |  UNION ALL
        |  SELECT 'part', 'p_partkey', 'lineitem', 'l_partkey',
        |         (SELECT count(DISTINCT CAST(p_partkey AS VARCHAR)) FROM part
        |          WHERE p_partkey IS NOT NULL),
        |         (SELECT count(*) FROM
        |           (SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS k FROM part
        |            WHERE p_partkey IS NOT NULL) f
        |          WHERE f.k NOT IN (SELECT CAST(l_partkey AS VARCHAR) FROM lineitem
        |            WHERE l_partkey IS NOT NULL))
        |  UNION ALL
        |  SELECT 'events', 'user_id', 'customer', 'c_custkey',
        |         (SELECT count(DISTINCT CAST(user_id AS VARCHAR)) FROM events
        |          WHERE user_id IS NOT NULL),
        |         (SELECT count(*) FROM
        |           (SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events
        |            WHERE user_id IS NOT NULL) f
        |          WHERE f.k NOT IN (SELECT CAST(c_custkey AS VARCHAR) FROM customer
        |            WHERE c_custkey IS NOT NULL))
        |)
        |SELECT fk_rel, fk_col, pk_rel, pk_col,
        |       CAST(n_fk_distinct AS BIGINT) AS n_fk_distinct,
        |       CAST(n_missing AS BIGINT) AS n_missing,
        |       CASE WHEN n_fk_distinct > 0 THEN
        |         round(CAST(n_fk_distinct - n_missing AS DOUBLE)
        |               / n_fk_distinct, 6) END AS containment
        |FROM probe""".stripMargin
  )
}
