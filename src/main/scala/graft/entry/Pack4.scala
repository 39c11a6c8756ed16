package graft.entry

import graft.fixtures.InvoiceCorpus
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.run.{Extract, Pipeline}
import graft.tag.Taggers
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-contract query pack 4/5 — centrality, sketches, temporal algebra, retrieval.
  * Split from the former 6.8k-line SparkEntry (r4 verdict #4);
  * content is byte-moved, composed back in [[graft.SparkEntry]].
  * Shared helpers live in [[graft.entry.Q]]. */
private[graft] object Pack4 {
  import Q._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q159_damerau" -> ((s, d) => {
      // full Damerau–Levenshtein (native codegen expression, Lowrance–
      // Wagner unrestricted transpositions) over corpus-vocabulary pairs;
      // oracle = DuckDB's INDEPENDENT damerau_levenshtein implementation
      val toks = t(s, d, "documents").where(col("text").isNotNull)
        .select(explode(expr(
          "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("tok"))
        .where(length(col("tok")) >= 3).distinct()
      val a = toks.select(col("tok").as("tok_a"))
      val b = toks.select(col("tok").as("tok_b"))
      a.join(b, col("tok_a") < col("tok_b"))
        .select(col("tok_a"), col("tok_b"),
          graft.functions.Damerau.distCol(col("tok_a"), col("tok_b"))
            .as("dl"))
        .where(col("dl") <= 3)
    }),
    "q160_eccentricity" -> ((s, d) => {
      // landmark eccentricities over the downward customer tree (the
      // diameter lower bound max-ecc estimates at 10^12 nodes via a
      // landmark sample); oracle = q114's recursive-CTE BFS + max
      val down = custGraph(s, d)
        .select(col("dst").as("src"), col("src").as("dst"))
      val lm = t(s, d, "customer").where(col("c_custkey") <= 3)
        .select(concat(lit("c"), col("c_custkey")).as("id"))
      graft.graph.Distances.fromLandmarks(down, lm)
        .groupBy("landmark")
        .agg(max("dist").as("eccentricity"), count(lit(1)).as("n_reached"))
    }),
    "q161_kappa" -> ((s, d) =>
      // Cohen's κ between the labeled lang column and the q25 language-ID
      // predictor — chance-corrected agreement from exact confusion
      // marginals, ONE float division; oracle = the same integer closed
      // form over DuckDB's replay of the predictor
      graft.metrics.Agreement.cohensKappa(
        t(s, d, "documents").select(col("lang").as("gold"),
          graft.ops.TextOps.langId(col("text")).as("pred")),
        "gold", "pred")),
    "q162_mann_kendall" -> ((s, d) =>
      // Mann–Kendall drift test over daily event counts — pure integer
      // sign sums on a bucket-scale self-join; oracle = the same pairwise
      // definition in DuckDB
      graft.ops.Trend.mannKendall(
        t(s, d, "events").groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events")),
        "day", "n_events")),
    "q163_partition_quality" -> ((s, d) =>
      // modularity + conductance scorecard of the nation partition over
      // the customer graph — exact integer vol/cut/ppm, one float Q;
      // oracle = the same joins and closed form in DuckDB
      graft.graph.PartitionQuality.scorecard(
        custGraph(s, d),
        t(s, d, "customer").select(
          concat(lit("c"), col("c_custkey")).as("id"),
          concat(lit("n"), col("c_nationkey")).as("community")))),
    "q164_simrank" -> ((s, d) => {
      // bounded-subgraph SimRank (custkey ≤ 150 — the candidate-block
      // deployment shape), 3 exact ppm rounds; oracle = the rounds
      // unrolled in DuckDB over the same G×G product walk
      val cust = t(s, d, "customer").where(col("c_custkey") <= 150)
      val e = cust.where(col("c_custkey") > 1).select(
          concat(lit("c"), col("c_custkey")).as("src"),
          concat(lit("c"), expr("c_custkey div 2")).as("dst"))
        .union(cust.where(col("c_custkey") > 3).select(
          concat(lit("c"), col("c_custkey")).as("src"),
          concat(lit("c"), expr("c_custkey div 4")).as("dst")))
      graft.graph.SimRank.similarity(e, rounds = 3)
    }),
    "q165_coloring" -> ((s, d) =>
      // Jones–Plassmann vertex coloring of the customer graph (conflict
      // schedule: color classes = parallel-safe merge waves); oracle =
      // committed fixture from the independent sequential greedy in
      // decreasing (priority, id) order — the JP equivalence
      graft.graph.Coloring.jonesPlassmann(custGraph(s, d))),
    "q166_densest" -> ((s, d) => {
      // densest-subgraph peeling (Charikar greedy, BKV parallel waves,
      // ε = 1/2) over the customer graph with a planted K20 — the best
      // wave recovers the dense core; oracle = the waves unrolled in
      // DuckDB with the same integer threshold and cross-multiplied argmax
      val small = t(s, d, "customer").where(col("c_custkey") <= 20)
        .select(col("c_custkey").as("k"))
      val clique = small.as("x").join(small.as("y"),
          col("x.k") < col("y.k"))
        .select(concat(lit("c"), col("x.k")).as("src"),
          concat(lit("c"), col("y.k")).as("dst"))
      graft.graph.Densest.peel(custGraph(s, d).unionByName(clique))
    }),
    "q167_bloom" -> ((s, d) => {
      // Bloom membership gate over the portable hash family: build on the
      // custkeys that HAVE orders, probe custkeys ≤ 50 — no false
      // negatives, designed-rate false positives; oracle = the same hash
      // fan-out, bit set, and all-k-hits probe in DuckDB
      val present = t(s, d, "orders")
        .select(concat(lit("c"), col("o_custkey")).as("v"))
      val probes = t(s, d, "customer").where(col("c_custkey") <= 50)
        .select(concat(lit("c"), col("c_custkey")).as("v"))
      val bits = graft.ops.Bloom.bits(present, "v", k = 4, mBits = 1 << 14)
      graft.ops.Bloom.probe(bits, probes, "v", k = 4, mBits = 1 << 14)
        .join(t(s, d, "orders")
          .select(concat(lit("c"), col("o_custkey")).as("key"))
          .distinct()
          .select(col("key"), lit(true).as("hit")), Seq("key"), "left")
        .select(col("key"), col("maybe_present"),
          coalesce(col("hit"), lit(false)).as("true_present"))
    }),
    "q168_critical_path" -> ((s, d) => {
      // DAG longest paths (critical-path/PERT bound) over the downward
      // customer tree with per-child integer weights; oracle = a recursive
      // path-enumeration CTE (structurally different computation)
      val cust = t(s, d, "customer")
      val down = cust.where(col("c_custkey") > 1).select(
          concat(lit("c"), expr("c_custkey div 2")).as("src"),
          concat(lit("c"), col("c_custkey")).as("dst"),
          (col("c_custkey") % 7 + 1).as("w"))
        .union(cust.where(col("c_custkey") > 3).select(
          concat(lit("c"), expr("c_custkey div 4")).as("src"),
          concat(lit("c"), col("c_custkey")).as("dst"),
          (col("c_custkey") % 7 + 1).as("w")))
      graft.graph.Dag.longestPaths(down)
    }),
    "q169_grid_density" -> ((s, d) =>
      // cell-histogram density clustering over the embedding projection —
      // ONE cell-keyed aggregate touches the points, everything after is
      // cell-scale (the no-pairwise-join DBSCAN); oracle = the same
      // IEEE floor-snap + recursive-CTE CC over Chebyshev-adjacent dense
      // cells in DuckDB
      graft.ops.Density.gridClusters(
        t(s, d, "embeddings").select(
          element_at(col("embedding"), 1).as("x"),
          element_at(col("embedding"), 2).as("y")),
        "x", "y", eps = 0.05, minPts = 3L)),
    "q170_kmv_setops" -> ((s, d) =>
      // θ-style union/intersection/Jaccard estimates between the open- and
      // finished-order customer populations from merged KMV sketches —
      // the two-corpus overlap estimator with no raw join; oracle = the
      // same k-min merge, membership flags, and fixed-order IEEE estimate
      graft.ops.Sketch.kmvSetOps(
        t(s, d, "orders").where(col("o_orderstatus") === "O")
          .select(concat(lit("c"), col("o_custkey")).as("v")),
        t(s, d, "orders").where(col("o_orderstatus") === "F")
          .select(concat(lit("c"), col("o_custkey")).as("v")),
        "v", k = 256)),
    "q171_scan" -> ((s, d) => {
      // SCAN structural clustering over the customer graph with a planted
      // K12 — cores/borders cluster by neighborhood agreement, HUBS (the
      // CC-merge bridges) and outliers are named explicitly; oracle = the
      // same integer ε-test, core gate, CC, and role rules in DuckDB
      val small = t(s, d, "customer").where(col("c_custkey") <= 12)
        .select(col("c_custkey").as("k"))
      val clique = small.as("x").join(small.as("y"),
          col("x.k") < col("y.k"))
        .select(concat(lit("c"), col("x.k")).as("src"),
          concat(lit("c"), col("y.k")).as("dst"))
      graft.graph.Scan.cluster(custGraph(s, d).unionByName(clique))
    }),
    "q172_widest_path" -> ((s, d) => {
      // maximin bottleneck paths from the root over the downward customer
      // tree — the best-derivation-chain confidence (max-min, not Σ);
      // oracle = recursive (id, bottleneck) state enumeration + MAX
      val cust = t(s, d, "customer")
      val down = cust.where(col("c_custkey") > 1).select(
          concat(lit("c"), expr("c_custkey div 2")).as("src"),
          concat(lit("c"), col("c_custkey")).as("dst"),
          (col("c_custkey") % 7 + 1).as("w"))
        .union(cust.where(col("c_custkey") > 3).select(
          concat(lit("c"), expr("c_custkey div 4")).as("src"),
          concat(lit("c"), col("c_custkey")).as("dst"),
          (col("c_custkey") % 7 + 1).as("w")))
      graft.graph.Widest.paths(down,
        cust.where(col("c_custkey") === 1)
          .select(concat(lit("c"), col("c_custkey")).as("id")))
    }),
    "q173_winnow" -> ((s, d) =>
      // winnowing (MOSS) fingerprints over the documents table — the
      // guaranteed-recall copy-detection index at ~2/(w+1) density; the
      // engine's one-window-pass rightmost-min vs the oracle's
      // position-range self-join replay of the same rule
      graft.ops.Winnow.fingerprints(
        t(s, d, "documents"), "doc_id", "text", k = 5, w = 4)),
    "q174_butterflies" -> ((s, d) =>
      // butterfly census of the order–part bipartite graph — the (2,2)-
      // biclique motif count behind the bipartite clustering coefficient;
      // oracle = the same exact integer census in DuckDB
      graft.graph.Butterflies.census(
        t(s, d, "lineitem").select(
          concat(lit("o"), col("l_orderkey")).as("l"),
          concat(lit("p"), col("l_partkey")).as("r")),
        "l", "r")),
    "q175_greedy_cover" -> ((s, d) =>
      // greedy max-coverage selection of 10 docs by distinct 5-gram
      // shingles — the (1−1/e) facility-location seed-set pick; oracle =
      // the 10 rounds unrolled in DuckDB (argmax by gain DESC, id ASC)
      graft.ops.Coverage.greedySelect(
        t(s, d, "documents").select(col("doc_id").as("id"),
          explode(graft.ops.Dedup.wordShingles(col("text"), 5)).as("item")),
        "id", "item", k = 10)),
    "q176_diversity" -> ((s, d) =>
      // Gini–Simpson language diversity per source — the no-logarithm
      // corpus-mix audit, exact integer ppm; oracle = the same closed form
      graft.ops.Profile.diversity(t(s, d, "documents"), "source", "lang")),
    "q177_chi2_drift" -> ((s, d) => {
      // χ² language-mix drift between even- and odd-id documents —
      // Laplace-smoothed reference, exact integer ppt terms and total;
      // oracle = the same integer closed forms
      val docs = t(s, d, "documents")
      graft.ops.Trend.chiSquareDrift(
        docs.where(pmod(col("doc_id"), lit(2)) === 0)
          .select(col("lang").as("cat")),
        docs.where(pmod(col("doc_id"), lit(2)) === 1)
          .select(col("lang").as("cat")), "cat")
    }),
    "q178_textrank" -> ((s, d) =>
      // TextRank keywords over the corpus co-occurrence graph — integer
      // PageRank (uniform restart) on adjacent-token edges, top-30 by
      // (rank DESC, word ASC); oracle = the word graph + the ppb rounds
      // unrolled in DuckDB (q152's replay shape)
      graft.ops.TextRank.keywords(t(s, d, "documents"), "doc_id", "text",
        rounds = 3, topK = 30)),
    "q179_ams_f2" -> ((s, d) => {
      // AMS tug-of-war F2 sketch (5 sign-sum registers over per-row
      // MINSTD re-mixes of the portable hash): the self-join-size /
      // skew-mass estimate that sizes a shuffle BEFORE running it; true
      // F2 joined for the error contract; oracle = the identical signs,
      // register sums, and exact integer median in DuckDB
      val li = t(s, d, "lineitem")
        .select(concat(lit("p"), col("l_partkey")).as("v"))
      val exact = li.groupBy("v").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("f2_exact"))
      graft.ops.Sketch.amsF2(li, "v").crossJoin(exact)
    }),
    "q180_cm_join_size" -> ((s, d) => {
      // equi-join SIZE estimate from two independent Count-Min sketches
      // (min over rows of the counter inner product — one-sided >= true):
      // clicks x views per user without ever joining the raw tables; true
      // join size joined for the contract; oracle = the identical register
      // builds + product mins in DuckDB
      val ev = t(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(concat(lit("u"), col("user_id")).as("v"))
      val views = ev.where(col("event_type") === "view")
        .select(concat(lit("u"), col("user_id")).as("v"))
      val truth = clicks.groupBy("v").agg(count(lit(1)).as("ca"))
        .join(views.groupBy("v").agg(count(lit(1)).as("cb")), Seq("v"))
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))
          .as("true_join_size"))
      graft.ops.Sketch.cmJoinSize(clicks, "v", views, "v")
        .crossJoin(truth)
    }),
    "q181_cusum" -> ((s, d) =>
      // CUSUM changepoint localization over the daily event counters —
      // q162's Mann-Kendall says IF the series drifts, this says WHEN:
      // argmax |n·prefix − i·total| (exact integers), tie → earliest day;
      // oracle = the same window arithmetic in DuckDB
      graft.ops.Trend.cusumChangepoint(
        t(s, d, "events").groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events")),
        "day", "n_events")),
    "q182_bcubed" -> ((s, d) =>
      // B-cubed P/R/F1 between the nation partition and the market-segment
      // partition (q109's pairwise complement — per-item averages from the
      // same contingency table, truncating ppm end to end); oracle = the
      // identical cell arithmetic in DuckDB
      graft.metrics.ClusterEval.bcubed(
        t(s, d, "customer").select(col("c_custkey"),
          col("c_nationkey").cast("string").as("pred"),
          col("c_mktsegment").as("gold")),
        "c_custkey", "pred", "gold")),
    "q183_repeated_spans" -> ((s, d) =>
      // exact-substring dedup LOCALIZATION (Lee et al. 2022): maximal
      // per-doc token spans covered by corpus-repeated 8-windows
      // (overlap-merged islands, gap <= k); oracle = the same windows,
      // repeated set, and variable-gap islands in DuckDB
      graft.ops.Curation.repeatedSpans(t(s, d, "documents"),
        col("doc_id"), col("text"), k = 8, minDocs = 2)
        .select(col("id"), col("start_tok").cast("long").as("start_tok"),
          col("end_tok").cast("long").as("end_tok"),
          col("n_tokens").cast("long").as("n_tokens"))),
    "q184_cut_spans" -> ((s, d) =>
      // the CUT transform: remove every token covered by a repeated span
      // and re-join the remainder (the ExactSubstr rewrite that keeps
      // unique prose around boilerplate); oracle = anti join + ordered
      // string_agg replay in DuckDB
      graft.ops.Curation.cutRepeatedSpans(t(s, d, "documents"),
        col("doc_id"), col("text"), k = 8, minDocs = 2)),
    "q185_owl_closure" -> ((s, d) => {
      // OWL pD* property rules (symmetric adjacentTo, inverse
      // locatedIn/contains + partOf/hasPart, transitive partOf) over a
      // customer-derived triple set — image-map expansion + one semi-naive
      // closure; oracle = the same rules as UNION branches + a recursive
      // CTE in DuckDB
      val cust = t(s, d, "customer")
      val inp = cust.where(col("c_custkey") <= 30 && col("c_custkey") % 2 === 0)
        .select(concat(lit("n"), col("c_custkey")).as("subj"),
          lit("adjacentTo").as("pred"),
          concat(lit("n"), col("c_custkey") + 1).as("obj"))
        .union(cust.where(col("c_custkey") <= 40)
          .select(concat(lit("c"), col("c_custkey")).as("subj"),
            lit("locatedIn").as("pred"),
            concat(lit("n"), col("c_nationkey")).as("obj")))
        .union(cust.where(col("c_custkey") > 1 && col("c_custkey") <= 64)
          .select(concat(lit("c"), col("c_custkey")).as("subj"),
            lit("partOf").as("pred"),
            concat(lit("c"), expr("c_custkey div 2")).as("obj")))
      graft.graph.Inference.owlPropertyClosure(inp,
        symmetric = Seq("adjacentTo"),
        inverses = Seq(("locatedIn", "contains"), ("partOf", "hasPart")),
        transitive = Seq("partOf"))
    }),
    "q186_bridges" -> ((s, d) => {
      // bridge (cut-edge) detection over the 256-node customer tree +
      // every-8th chord — the ER over-merge audit (a bridge in a sameAs
      // graph is ONE link fusing two clusters); engine = spanning-forest
      // + pointer-doubled root-chains + fundamental-cycle covering;
      // oracle = per-edge-exclusion product-graph BFS in DuckDB (a
      // structurally different definition: reachability without the edge)
      val cust = t(s, d, "customer").where(col("c_custkey") <= 256)
      val tree = cust.where(col("c_custkey") > 1).select(
        concat(lit("c"), col("c_custkey")).as("src"),
        concat(lit("c"), expr("c_custkey div 2")).as("dst"))
      val chords = cust
        .where(col("c_custkey") % 8 === 0 && col("c_custkey") > 1)
        .select(concat(lit("c"), col("c_custkey")).as("src"),
          concat(lit("c"), col("c_custkey") - 1).as("dst"))
      graft.graph.Bridges.bridges(tree.union(chords))
    }),
    "q187_phrase_spot" -> ((s, d) => {
      // leftmost-longest dictionary phrase spotting over running text —
      // multi-word gazetteer mention detection with the Aho-Corasick /
      // FlashText tie rule (nested "sort merge join" beats "merge join";
      // a match consumes its tokens). Engine = broadcast dict + declarative
      // l-gram candidates + per-doc aggregate-HOF greedy fold; oracle = a
      // recursive-CTE scan replaying the greedy pick-by-pick with a
      // NOT-EXISTS argmin (structurally different: sequential recursion vs
      // a sorted fold).
      import s.implicits._
      val dict = Seq("sort merge join", "merge join", "hash join",
        "table scan", "scan merge", "batch batch batch", "batch batch",
        "window window", "key order sort", "order sort").toDF("phrase")
      graft.link.PhraseSpot.spot(t(s, d, "documents"),
        col("doc_id"), col("text"), dict)
    }),
    "q188_interval_sched" -> ((s, d) => {
      // maximum-weight non-overlapping interval selection per supplier
      // (shipments as [shipday, shipday + qty%20] with weight qty) — the
      // OPTIMAL span-selection DP (q187's greedy is provably suboptimal
      // here). Engine = per-key typed O(n log n) DP (sort by end +
      // binary-searched predecessor); oracle = an index-recursion whose
      // state is the whole dp VECTOR carried as a list through a
      // recursive CTE (no binary search, predecessor by correlated count).
      val li = t(s, d, "lineitem")
        .where(col("l_suppkey") <= 20 && col("l_partkey") % 10 === 0)
        .select(col("l_suppkey"),
          datediff(to_date(col("l_shipdate")), to_date(lit("1970-01-01")))
            .cast("long").as("sday"),
          col("l_quantity").cast("long").as("qty"))
      graft.ops.Scheduling.weightedIntervalBest(li,
        col("l_suppkey"), col("sday"),
        col("sday") + col("qty") % 20, col("qty"))
    }),
    "q189_articulation" -> ((s, d) => {
      // articulation (cut-vertex) detection over q186's 256-node customer
      // tree + every-8th chord — the vertex form of the ER over-merge
      // audit (an articulation vertex in a sameAs graph is ONE entity
      // holding two clusters together). Engine = Tarjan–Vishkin block CC
      // over fundamental-cycle covers (shared Bridges machinery); oracle =
      // the DEFINITION, per-vertex-exclusion BFS: v cuts iff some
      // neighbor pair is disconnected without v.
      val cust = t(s, d, "customer").where(col("c_custkey") <= 256)
      val tree = cust.where(col("c_custkey") > 1).select(
        concat(lit("c"), col("c_custkey")).as("src"),
        concat(lit("c"), expr("c_custkey div 2")).as("dst"))
      val chords = cust
        .where(col("c_custkey") % 8 === 0 && col("c_custkey") > 1)
        .select(concat(lit("c"), col("c_custkey")).as("src"),
          concat(lit("c"), col("c_custkey") - 1).as("dst"))
      graft.graph.Articulation.articulationPoints(tree.union(chords))
    }),
    "q190_lcs_align" -> ((s, d) => {
      // token-level LCS alignment summary for consecutive document pairs
      // (first 40 tokens each): shared-in-order tokens + per-side
      // drop/add counts — the diff-style evaluation numerators. Engine =
      // narrow typed two-rolling-row DP per pair (no shuffle); oracle =
      // a recursive-CTE row-by-row DP whose state is the dp VECTOR as a
      // list, the in-row scan replayed with list_reduce.
      val docs = t(s, d, "documents")
        .where(col("doc_id") < 80 && col("text").isNotNull)
        .select(col("doc_id"), array_join(slice(filter(
          split(trim(col("text")), "\\s+"), w => w =!= ""),
          1, 40), " ").as("t40"))
      val pairs = docs.select(col("doc_id").as("pair_id"), col("t40").as("lt"))
        .join(docs.select((col("doc_id") - 1).as("pair_id"),
          col("t40").as("rt")), Seq("pair_id"))
      graft.ops.Align.lcsTokens(pairs, col("pair_id"),
        col("lt"), col("rt"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // q159: DuckDB's own damerau_levenshtein — an implementation the
    // engine shares nothing with (probe-verified full-DL semantics:
    // ca→abc = 2); ASCII vocabulary keeps the codepoint-vs-byte scoring
    // equivalent.
    "q159_damerau" ->
      """WITH tok AS (
        |  SELECT DISTINCT t AS tok
        |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z]+'))
        |    AS u(t)
        |  WHERE text IS NOT NULL AND length(t) >= 3)
        |SELECT a.tok AS tok_a, b.tok AS tok_b,
        |  CAST(damerau_levenshtein(a.tok, b.tok) AS INT) AS dl
        |FROM tok a JOIN tok b ON a.tok < b.tok
        |WHERE damerau_levenshtein(a.tok, b.tok) <= 3""".stripMargin,
    // q160: the q114 recursive-CTE BFS (min dist per node) + per-landmark
    // max/count over the downward tree.
    "q160_eccentricity" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'c' || (c_custkey // 2) AS src, 'c' || c_custkey AS dst
        |  FROM customer WHERE c_custkey > 1
        |  UNION ALL
        |  SELECT 'c' || (c_custkey // 4), 'c' || c_custkey
        |  FROM customer WHERE c_custkey > 3),
        |lm AS (SELECT 'c' || c_custkey AS l FROM customer
        |       WHERE c_custkey <= 3),
        |r AS (
        |  SELECT l AS id, l AS landmark, 0 AS dist FROM lm
        |  UNION
        |  SELECT e.dst, r.landmark, r.dist + 1 FROM r JOIN e ON r.id = e.src),
        |m AS (SELECT id, landmark, min(dist) AS dist FROM r GROUP BY 1, 2)
        |SELECT landmark, max(dist) AS eccentricity, count(*) AS n_reached
        |FROM m GROUP BY 1""".stripMargin,
    // q161: κ's integer closed form over the confusion marginals of
    // (labeled lang × the q25 predictor CASE).
    "q161_kappa" ->
      s"""WITH pred AS (
         |  SELECT doc_id, $langCaseSql AS b FROM ($langScoresFromDocs)),
         |j AS (
         |  SELECT d.lang AS a, p.b
         |  FROM documents d JOIN pred p USING (doc_id)
         |  WHERE d.lang IS NOT NULL AND p.b IS NOT NULL),
         |cells AS (SELECT a, b, count(*) AS nij FROM j GROUP BY 1, 2),
         |r AS (SELECT a, CAST(sum(nij) AS BIGINT) AS ri FROM cells GROUP BY 1),
         |c AS (SELECT b, CAST(sum(nij) AS BIGINT) AS ci FROM cells GROUP BY 1),
         |ch AS (SELECT CAST(coalesce(sum(ri * ci), 0) AS BIGINT)
         |         AS chance_num
         |       FROM r JOIN c ON c.b = r.a),
         |tot AS (
         |  SELECT CAST(sum(nij) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a = b THEN nij ELSE 0 END) AS BIGINT)
         |      AS n_agree
         |  FROM cells)
         |SELECT n, n_agree, chance_num,
         |  round(CAST(n * n_agree - chance_num AS DOUBLE) /
         |        CAST(n * n - chance_num AS DOUBLE), 6) AS kappa
         |FROM tot, ch""".stripMargin,
    // q162: the pairwise sign-sum definition over the same daily buckets.
    "q162_mann_kendall" ->
      """WITH s AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(*) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |p AS (
        |  SELECT CASE WHEN b.v > a.v THEN 1
        |              WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
        |  FROM s a JOIN s b ON a.day < b.day),
        |agg AS (
        |  SELECT CAST(coalesce(sum(sgn), 0) AS BIGINT) AS s,
        |    count(*) AS n_pairs,
        |    CAST(sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ties
        |  FROM p),
        |n AS (SELECT count(*) AS n FROM s)
        |SELECT n.n, agg.s, agg.n_pairs, coalesce(agg.n_ties, 0) AS n_ties,
        |  CASE WHEN agg.s > 0 THEN 'asc' WHEN agg.s < 0 THEN 'desc'
        |       ELSE 'none' END AS trend
        |FROM agg, n""".stripMargin,
    // q163: the same undirected dedup, node-keyed degree/assignment joins,
    // and integer vol/cut/ppm closed forms; one float division for Q.
    "q163_partition_quality" ->
      """WITH edir AS (
        |  SELECT 'c' || c_custkey AS src, 'c' || (c_custkey // 2) AS dst
        |  FROM customer WHERE c_custkey > 1
        |  UNION ALL
        |  SELECT 'c' || c_custkey, 'c' || (c_custkey // 4)
        |  FROM customer WHERE c_custkey > 3),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |        FROM edir WHERE src <> dst),
        |sym AS (SELECT a AS id, b AS nb FROM und UNION ALL SELECT b, a FROM und),
        |deg AS (SELECT id, count(*) AS deg FROM sym GROUP BY 1),
        |p AS (SELECT 'c' || c_custkey AS id, 'n' || c_nationkey AS community
        |      FROM customer),
        |asg AS (SELECT deg.id, deg.deg, coalesce(p.community, deg.id) AS community
        |        FROM deg LEFT JOIN p USING (id)),
        |volc AS (SELECT community, count(*) AS n_nodes,
        |           CAST(sum(deg) AS BIGINT) AS vol
        |         FROM asg GROUP BY 1),
        |inter AS (
        |  SELECT pa.community, 2 * count(*) AS internal_x2
        |  FROM und JOIN asg pa ON pa.id = und.a JOIN asg pb ON pb.id = und.b
        |  WHERE pa.community = pb.community GROUP BY 1),
        |perc AS (SELECT volc.community, n_nodes, vol,
        |    CAST(coalesce(internal_x2, 0) AS BIGINT) AS internal_x2,
        |    vol - CAST(coalesce(internal_x2, 0) AS BIGINT) AS cut
        |  FROM volc LEFT JOIN inter USING (community)),
        |tot AS (SELECT CAST(sum(vol) AS BIGINT) AS two_m,
        |    CAST(sum(vol * vol) AS BIGINT) AS sum_vol_sq,
        |    CAST(sum(internal_x2) AS BIGINT) AS sum_int2 FROM perc)
        |SELECT community, n_nodes, vol, internal_x2, cut,
        |  CASE WHEN least(vol, two_m - vol) > 0
        |       THEN (cut * 1000000) // least(vol, two_m - vol)
        |  END AS conductance_ppm,
        |  CASE WHEN two_m > 0
        |       THEN round(CAST(two_m * sum_int2 - sum_vol_sq AS DOUBLE) /
        |                  CAST(two_m * two_m AS DOUBLE), 6)
        |  END AS modularity
        |FROM perc, tot""".stripMargin,
    // q164: the 3 ppm rounds unrolled — per round the G×G product-graph
    // walk (two src-keyed joins), an (a,b)-keyed SUM, and the truncating
    // C = 4/5 division; the diagonal is re-pinned at 10^6 each round.
    "q164_simrank" -> {
      val roundCtes = (1 to 3).map { r =>
        s""",
           |n$r AS (
           |  SELECT e1.dst AS a, e2.dst AS b, CAST(sum(sp.s) AS BIGINT) AS num
           |  FROM s${r - 1} sp JOIN ed e1 ON e1.src = sp.x
           |                    JOIN ed e2 ON e2.src = sp.y
           |  GROUP BY 1, 2),
           |s$r AS (
           |  SELECT x, y, s FROM (
           |    SELECT n$r.a AS x, n$r.b AS y,
           |      (4 * num) // (5 * ia.ind * ib.ind) AS s
           |    FROM n$r JOIN ind ia ON ia.v = n$r.a
           |             JOIN ind ib ON ib.v = n$r.b
           |    WHERE n$r.a <> n$r.b)
           |  WHERE s > 0
           |  UNION ALL SELECT v, v, CAST(1000000 AS BIGINT) FROM nodes)""".stripMargin
      }.mkString
      s"""WITH ed AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT 'c' || c_custkey AS src, 'c' || (c_custkey // 2) AS dst
         |    FROM customer WHERE c_custkey > 1 AND c_custkey <= 150
         |    UNION ALL
         |    SELECT 'c' || c_custkey, 'c' || (c_custkey // 4)
         |    FROM customer WHERE c_custkey > 3 AND c_custkey <= 150)),
         |nodes AS (SELECT src AS v FROM ed UNION SELECT dst FROM ed),
         |ind AS (SELECT dst AS v, count(*) AS ind FROM ed GROUP BY 1),
         |s0 AS (SELECT v AS x, v AS y, CAST(1000000 AS BIGINT) AS s
         |       FROM nodes)$roundCtes
         |SELECT x AS a, y AS b, s AS s_ppm FROM s3 WHERE x < y""".stripMargin
    },
    // q165: committed fixture from the independent sequential greedy in
    // decreasing (priority, id) order (GenFixtures — the JP equivalence;
    // TIED to sf0.01, the driver's correctness scale).
    "q165_coloring" ->
      """SELECT id, color, round
        |FROM read_parquet(
        |  '/root/repo/src/test/resources/expected/q165_expected_coloring.parquet')""".stripMargin,
    // q166: the peeling waves unrolled — per wave one degree aggregate,
    // the integer threshold deg·2·V > 6·E (ε = 1/2), and the edge
    // restriction; argmax wave by cross-multiplied density, earliest wins.
    "q166_densest" -> {
      val waves = (1 to 24).map { r =>
        s""",
           |dg$r AS MATERIALIZED (SELECT id, count(*) AS deg FROM (
           |    SELECT a AS id FROM e${r - 1}
           |    UNION ALL SELECT b FROM e${r - 1}) GROUP BY 1),
           |st$r AS MATERIALIZED (SELECT (SELECT count(*) FROM v${r - 1}) AS nv,
           |                (SELECT count(*) FROM e${r - 1}) AS ne),
           |v$r AS MATERIALIZED (SELECT v.id FROM v${r - 1} v
           |  LEFT JOIN dg$r d USING (id), st$r
           |  WHERE coalesce(d.deg, 0) * 2 * st$r.nv > 6 * st$r.ne),
           |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
           |  WHERE a IN (SELECT id FROM v$r) AND b IN (SELECT id FROM v$r))""".stripMargin
      }.mkString
      val roundsUnion = (1 to 24)
        .map(r => s"SELECT $r AS r, nv, ne FROM st$r WHERE nv > 0")
        .mkString("\n  UNION ALL ")
      val nodesUnion = (1 to 24)
        .map(r => s"SELECT $r AS r, id FROM v${r - 1}")
        .mkString("\n  UNION ALL ")
      s"""WITH edir AS (
         |  SELECT 'c' || c_custkey AS src, 'c' || (c_custkey // 2) AS dst
         |  FROM customer WHERE c_custkey > 1
         |  UNION ALL
         |  SELECT 'c' || c_custkey, 'c' || (c_custkey // 4)
         |  FROM customer WHERE c_custkey > 3
         |  UNION ALL
         |  SELECT 'c' || x.c_custkey, 'c' || y.c_custkey
         |  FROM customer x JOIN customer y ON x.c_custkey < y.c_custkey
         |  WHERE x.c_custkey <= 20 AND y.c_custkey <= 20),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM edir WHERE src <> dst),
         |v0 AS MATERIALIZED (
         |  SELECT a AS id FROM e0 UNION SELECT b FROM e0)$waves,
         |rounds AS (
         |  $roundsUnion),
         |rn AS (
         |  $nodesUnion),
         |best AS (
         |  SELECT min(r) AS r FROM rounds a
         |  WHERE NOT EXISTS (SELECT 1 FROM rounds b
         |                    WHERE b.ne * a.nv > a.ne * b.nv))
         |SELECT rn.id, best.r AS best_round, rounds.nv AS n_nodes,
         |  rounds.ne AS n_edges,
         |  round(CAST(rounds.ne AS DOUBLE) / CAST(rounds.nv AS DOUBLE), 6)
         |    AS density
         |FROM rn JOIN best ON rn.r = best.r
         |        JOIN rounds ON rounds.r = best.r""".stripMargin
    },
    // q167: the same portable-hash fan-out (CountMin multiplier family
    // over the shared scrambled hash), DISTINCT bit set, and all-k-hits
    // probe — replayed term for term.
    "q167_bloom" -> {
      def fan(src: String, extra: String) =
        Seq((16807L, 11L), (48271L, 101L), (69621L, 1009L), (40692L, 10007L))
          .map { case (a, c) =>
            s"SELECT $extra((hv * $a + $c) % 2147483647) % 16384 AS bit FROM $src"
          }.mkString("\n  UNION ALL ")
      s"""WITH pres AS (
         |  SELECT ${kmvHashSql("'c' || o_custkey")} AS hv
         |  FROM orders WHERE o_custkey IS NOT NULL),
         |bits AS (SELECT DISTINCT bit FROM (
         |  ${fan("pres", "")})),
         |pk AS (
         |  SELECT 'c' || c_custkey AS key,
         |    ${kmvHashSql("'c' || c_custkey")} AS hv
         |  FROM customer WHERE c_custkey <= 50),
         |paddr AS (
         |  ${fan("pk", "key, ")}),
         |probe AS (
         |  SELECT key,
         |    count(CASE WHEN bits.bit IS NOT NULL THEN 1 END) = 4
         |      AS maybe_present
         |  FROM paddr LEFT JOIN bits USING (bit) GROUP BY 1),
         |truth AS (SELECT DISTINCT 'c' || o_custkey AS key FROM orders)
         |SELECT probe.key, probe.maybe_present,
         |  truth.key IS NOT NULL AS true_present
         |FROM probe LEFT JOIN truth USING (key)""".stripMargin
    },
    // q168: recursive path-sum enumeration with (id, d) dedup, then a
    // per-node MAX — independent of the engine's max-relax rounds.
    "q168_critical_path" ->
      """WITH RECURSIVE ed AS (
        |  SELECT 'c' || (c_custkey // 2) AS src, 'c' || c_custkey AS dst,
        |    CAST(c_custkey % 7 + 1 AS BIGINT) AS w
        |  FROM customer WHERE c_custkey > 1
        |  UNION ALL
        |  SELECT 'c' || (c_custkey // 4), 'c' || c_custkey,
        |    CAST(c_custkey % 7 + 1 AS BIGINT)
        |  FROM customer WHERE c_custkey > 3),
        |paths AS (
        |  SELECT src AS id, CAST(0 AS BIGINT) AS d FROM ed
        |  WHERE src NOT IN (SELECT dst FROM ed)
        |  UNION
        |  SELECT ed.dst, paths.d + ed.w FROM paths JOIN ed ON ed.src = paths.id)
        |SELECT id, max(d) AS dist FROM paths GROUP BY 1""".stripMargin,
    // q169: the same floor-snap on the same widened doubles, HAVING-gated
    // dense cells, Chebyshev cell join, q47's recursive-CTE CC, min-key
    // labels (byte-wise string min in both engines).
    "q169_grid_density" ->
      """WITH RECURSIVE pts AS (
        |  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05) AS BIGINT)
        |           AS cx,
        |         CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05) AS BIGINT)
        |           AS cy
        |  FROM embeddings
        |  WHERE embedding[1] IS NOT NULL AND embedding[2] IS NOT NULL),
        |cells AS (
        |  SELECT cx, cy, count(*) AS n_points FROM pts
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |ids AS (SELECT cx, cy,
        |          CAST(cx AS VARCHAR) || '|' || CAST(cy AS VARCHAR) AS id,
        |          n_points
        |        FROM cells),
        |ed AS (
        |  SELECT a.id AS src, b.id AS dst FROM ids a JOIN ids b
        |  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        |   AND a.id <> b.id),
        |reach AS (
        |  SELECT src AS id, dst AS r FROM ed
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN ed e ON e.src = reach.r),
        |comp AS (SELECT id, least(id, min(r)) AS component
        |         FROM reach GROUP BY id)
        |SELECT coalesce(comp.component, ids.id) AS cluster,
        |  count(*) AS n_cells, CAST(sum(n_points) AS BIGINT) AS n_points
        |FROM ids LEFT JOIN comp ON comp.id = ids.id
        |GROUP BY 1""".stripMargin,
    // q170: the same k-min sketches, merged k-min, membership flags, and
    // the estimate chain in the SAME IEEE order (constant product, one
    // division, fixed parenthesization).
    "q170_kmv_setops" ->
      s"""WITH ha AS (
         |  SELECT DISTINCT ${kmvHashSql("'c' || o_custkey")} AS h
         |  FROM orders WHERE o_orderstatus = 'O' AND o_custkey IS NOT NULL),
         |ka AS MATERIALIZED (SELECT h FROM ha ORDER BY h LIMIT 256),
         |hb AS (
         |  SELECT DISTINCT ${kmvHashSql("'c' || o_custkey")} AS h
         |  FROM orders WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL),
         |kb AS MATERIALIZED (SELECT h FROM hb ORDER BY h LIMIT 256),
         |ku AS (
         |  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
         |  ORDER BY h LIMIT 256),
         |fl AS (
         |  SELECT ku.h, ka.h IS NOT NULL AS ina, kb.h IS NOT NULL AS inb
         |  FROM ku LEFT JOIN ka ON ka.h = ku.h LEFT JOIN kb ON kb.h = ku.h),
         |agg AS (
         |  SELECT count(*) AS n_union_sketch, CAST(max(h) AS BIGINT) AS h_k,
         |    CAST(coalesce(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_inter_sketch
         |  FROM fl),
         |na AS (SELECT count(*) AS n_a_sketch FROM ka),
         |nb AS (SELECT count(*) AS n_b_sketch FROM kb)
         |SELECT n_a_sketch, n_b_sketch, n_union_sketch, h_k, n_inter_sketch,
         |  CASE WHEN n_union_sketch < 256 THEN CAST(n_union_sketch AS DOUBLE)
         |       ELSE round((CAST(255 AS DOUBLE) * 2147483647) / h_k, 4)
         |  END AS union_est,
         |  CASE WHEN n_union_sketch < 256 THEN CAST(n_inter_sketch AS DOUBLE)
         |       ELSE round((CAST(n_inter_sketch AS DOUBLE) *
         |              ((CAST(255 AS DOUBLE) * 2147483647) / h_k))
         |              / n_union_sketch, 4)
         |  END AS inter_est,
         |  CASE WHEN n_union_sketch > 0
         |       THEN (n_inter_sketch * 1000000) // n_union_sketch
         |  END AS jaccard_ppm
         |FROM agg, na, nb""".stripMargin,
    "q171_scan" -> scanOracleSql,
    // q172: recursive (id, bottleneck) state enumeration (states are
    // bounded: one per distinct weight per node) + per-node MAX — the
    // seed's sentinel never escapes (least() caps at the first hop).
    "q172_widest_path" ->
      """WITH RECURSIVE ed AS (
        |  SELECT 'c' || (c_custkey // 2) AS src, 'c' || c_custkey AS dst,
        |    CAST(c_custkey % 7 + 1 AS BIGINT) AS w
        |  FROM customer WHERE c_custkey > 1
        |  UNION ALL
        |  SELECT 'c' || (c_custkey // 4), 'c' || c_custkey,
        |    CAST(c_custkey % 7 + 1 AS BIGINT)
        |  FROM customer WHERE c_custkey > 3),
        |st AS (
        |  SELECT 'c1' AS id, CAST(9223372036854775807 AS BIGINT) AS b
        |  UNION
        |  SELECT ed.dst, least(st.b, ed.w) FROM st JOIN ed ON ed.src = st.id)
        |SELECT id, max(b) AS bottleneck FROM st WHERE id <> 'c1'
        |GROUP BY 1""".stripMargin,
    // q173: the same k-gram fingerprints (q151's slicing + the portable
    // fold), then the RULE replayed as a position-range self-join
    // (min per window, rightmost position of that min) instead of the
    // engine's window-frame struct-min — same selections.
    "q173_winnow" ->
      """WITH words AS (
        |  SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |g AS MATERIALIZED (
        |  SELECT id, CAST(i AS INTEGER) AS pos,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(unicode(c) AS BIGINT) FOR c IN
        |        string_split(array_to_string(w[i:i+4], ' '), '')]),
        |      (h, c) -> (h * 31 + c) % 2147483647) AS h
        |  FROM words, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)
        |  WHERE len(w) >= 5),
        |wmin AS MATERIALIZED (
        |  SELECT a.id, a.pos AS j, min(b.h) AS mh
        |  FROM g a JOIN g b ON b.id = a.id
        |   AND b.pos BETWEEN a.pos AND a.pos + 3
        |  GROUP BY 1, 2 HAVING count(*) = 4),
        |sel AS (
        |  SELECT w.id, max(b.pos) AS pos, w.mh AS h
        |  FROM wmin w JOIN g b ON b.id = w.id AND b.h = w.mh
        |   AND b.pos BETWEEN w.j AND w.j + 3
        |  GROUP BY w.id, w.j, w.mh)
        |SELECT DISTINCT id, pos, h FROM sel""".stripMargin,
    // q174: the same exact integer census — right-degree wedges, the
    // wedge join's per-pair common counts, Σ C(cop, 2).
    "q174_butterflies" ->
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT 'o' || l_orderkey AS l, 'p' || l_partkey AS r
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |ne AS (SELECT count(*) AS n_edges FROM e),
        |wd AS (
        |  SELECT CAST(coalesce(sum((d * (d - 1)) // 2), 0) AS BIGINT)
        |    AS n_wedges
        |  FROM (SELECT count(*) AS d FROM e GROUP BY r)),
        |pr AS (
        |  SELECT a.l AS la, b.l AS lb, count(*) AS cop
        |  FROM e a JOIN e b ON a.r = b.r AND a.l < b.l
        |  GROUP BY 1, 2),
        |pa AS (
        |  SELECT count(*) AS n_pairs,
        |    CAST(coalesce(sum(CASE WHEN cop >= 2 THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS n_pairs_ge2,
        |    CAST(coalesce(sum((cop * (cop - 1)) // 2), 0) AS BIGINT)
        |      AS n_butterflies
        |  FROM pr)
        |SELECT n_edges, n_wedges, n_pairs, n_pairs_ge2, n_butterflies
        |FROM ne, wd, pa""".stripMargin,
    // q175: the greedy rounds unrolled — per round a NOT-IN-covered count,
    // the (gain DESC, id ASC string order) argmax, and the covered-set
    // union; q151's shingle construction.
    "q175_greedy_cover" -> {
      val rounds = (2 to 10).map { r =>
        s""",
           |g$r AS (
           |  SELECT id, count(*) AS gain FROM it
           |  WHERE item NOT IN (SELECT item FROM c${r - 1})
           |  GROUP BY 1),
           |w$r AS MATERIALIZED (
           |  SELECT id, gain FROM g$r WHERE gain > 0
           |  ORDER BY gain DESC, id ASC LIMIT 1),
           |c$r AS MATERIALIZED (
           |  SELECT item FROM c${r - 1}
           |  UNION
           |  SELECT item FROM it JOIN w$r USING (id))""".stripMargin
      }.mkString
      val sel = (1 to 10)
        .map(r => s"SELECT $r AS rank, id, gain FROM w$r")
        .mkString("\n  UNION ALL ")
      s"""WITH words AS (
         |  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |it AS MATERIALIZED (
         |  SELECT DISTINCT CAST(id AS VARCHAR) AS id, shingle AS item FROM (
         |    SELECT id, array_to_string(w[i:i+4], ' ') AS shingle
         |    FROM words, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)
         |    WHERE len(w) >= 5)),
         |g1 AS (SELECT id, count(*) AS gain FROM it GROUP BY 1),
         |w1 AS MATERIALIZED (
         |  SELECT id, gain FROM g1 WHERE gain > 0
         |  ORDER BY gain DESC, id ASC LIMIT 1),
         |c1 AS MATERIALIZED (
         |  SELECT DISTINCT item FROM it JOIN w1 USING (id))$rounds
         |$sel""".stripMargin
    },
    // q176: the same two aggregates and the integer ppm closed form.
    "q176_diversity" ->
      """WITH c AS (
        |  SELECT source AS grp, lang AS cat, count(*) AS c FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
        |a AS (
        |  SELECT grp, CAST(sum(c) AS BIGINT) AS n_rows,
        |    count(*) AS n_categories,
        |    CAST(sum(c * (c - 1)) AS BIGINT) AS same2
        |  FROM c GROUP BY 1)
        |SELECT grp, n_rows, n_categories,
        |  CASE WHEN n_rows >= 2
        |       THEN 1000000 - (same2 * 1000000) // (n_rows * (n_rows - 1))
        |  END AS simpson_ppm
        |FROM a""".stripMargin,
    // q177: the same union-category smoothing and integer ppt terms.
    "q177_chi2_drift" ->
      """WITH o AS (
        |  SELECT lang AS cat, count(*) AS o_raw FROM documents
        |  WHERE doc_id % 2 = 0 AND lang IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT lang AS cat, count(*) AS r_raw FROM documents
        |  WHERE doc_id % 2 = 1 AND lang IS NOT NULL GROUP BY 1),
        |cats AS (
        |  SELECT coalesce(o.cat, r.cat) AS cat,
        |    CAST(coalesce(o_raw, 0) AS BIGINT) AS o,
        |    CAST(coalesce(r_raw, 0) + 1 AS BIGINT) AS r_smoothed
        |  FROM o FULL OUTER JOIN r ON o.cat = r.cat),
        |tot AS (
        |  SELECT CAST(sum(o) AS BIGINT) AS n_o,
        |    CAST(sum(r_smoothed) AS BIGINT) AS n_r
        |  FROM cats),
        |terms AS (
        |  SELECT cat, o, r_smoothed,
        |    CASE WHEN n_o > 0
        |         THEN ((o * n_r - n_o * r_smoothed) *
        |               (o * n_r - n_o * r_smoothed) * 1000)
        |              // (n_o * r_smoothed * n_r)
        |         ELSE 0 END AS term_ppt,
        |    n_o, n_r
        |  FROM cats, tot),
        |tt AS (SELECT CAST(sum(term_ppt) AS BIGINT) AS chi2_ppt FROM terms)
        |SELECT cat, o, r_smoothed, term_ppt, n_o, n_r, chi2_ppt
        |FROM terms, tt""".stripMargin,
    // q178: the word graph (doc-windowed adjacency of gated tokens) + the
    // integer ppb PageRank rounds unrolled (q152's shape, seeds = the
    // whole vocabulary) + the (r DESC, word ASC) top-30 cut.
    "q178_textrank" -> {
      val roundCtes = (1 to 3).map { r =>
        s""",
           |p$r AS (
           |  SELECT e.dst AS id,
           |    CAST(sum(((r${r - 1}.r * 8) // 10) // o.outd) AS BIGINT) AS r
           |  FROM r${r - 1} JOIN edir e ON e.src = r${r - 1}.id
           |  JOIN outd o ON o.src = e.src
           |  GROUP BY 1),
           |r$r AS (
           |  SELECT id, CAST(sum(r) AS BIGINT) AS r
           |  FROM (SELECT id, r FROM p$r UNION ALL SELECT id, r FROM rst)
           |  GROUP BY 1)""".stripMargin
      }.mkString
      s"""WITH words AS (
         |  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents WHERE text IS NOT NULL),
         |tk AS (
         |  SELECT id, i, w[i] AS raw
         |  FROM words, unnest(range(1, len(w) + 1)) AS u(i)),
         |kept AS (
         |  SELECT id, i, lower(raw) AS t FROM tk
         |  WHERE regexp_matches(raw, '^[A-Za-z]{3,}$$')),
         |seq AS MATERIALIZED (
         |  SELECT id, t, row_number() OVER (PARTITION BY id ORDER BY i)
         |    AS rn
         |  FROM kept),
         |pr AS (
         |  SELECT a.t AS x, b.t AS y
         |  FROM seq a JOIN seq b ON b.id = a.id AND b.rn = a.rn + 1),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
         |  FROM pr WHERE x <> y),
         |edir AS MATERIALIZED (
         |  SELECT a AS src, b AS dst FROM und
         |  UNION ALL SELECT b, a FROM und),
         |outd AS (SELECT src, count(*) AS outd FROM edir GROUP BY 1),
         |sd AS (SELECT DISTINCT src AS id FROM edir),
         |ns AS (SELECT count(*) AS ns FROM sd),
         |r0 AS (SELECT id, 1000000000 // ns AS r FROM sd, ns),
         |rst AS (SELECT id, ((1000000000 * 2) // 10) // ns AS r
         |        FROM sd, ns)$roundCtes
         |SELECT rank, word, ppr_fp FROM (
         |  SELECT CAST(row_number() OVER (ORDER BY r DESC, id ASC)
         |           AS INTEGER) AS rank,
         |    id AS word, CAST(r AS BIGINT) AS ppr_fp
         |  FROM r3 WHERE r > 0)
         |WHERE rank <= 30""".stripMargin
    },
    // q179: the identical AMS sign fan-out (5 MINSTD re-mixes of the
    // shared scrambled hash), register sums, and the exact integer
    // median-of-squares, replayed term for term.
    "q179_ams_f2" -> {
      val fan = Seq((0, 16807L, 13L), (1, 48271L, 211L), (2, 69621L, 2003L),
        (3, 40692L, 20011L), (4, 25173L, 30011L)).map { case (r, a, c) =>
        s"SELECT $r AS row, 1 - 2 * (((hv * $a + $c) % 2147483647) % 2) AS s FROM h"
      }.mkString("\n  UNION ALL ")
      s"""WITH h AS (
         |  SELECT ${kmvHashSql("'p' || l_partkey")} AS hv
         |  FROM lineitem WHERE l_partkey IS NOT NULL),
         |fan AS (
         |  $fan),
         |reg AS (SELECT row, CAST(sum(s) AS BIGINT) AS z FROM fan GROUP BY 1),
         |med AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_registers,
         |    CAST((list_sort(list(z * z)))[3] AS BIGINT) AS f2_estimate
         |  FROM reg),
         |ex AS (
         |  SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact
         |  FROM (SELECT count(*) AS c FROM lineitem
         |        WHERE l_partkey IS NOT NULL GROUP BY l_partkey))
         |SELECT n_registers, f2_estimate, f2_exact FROM med, ex""".stripMargin
    },
    // q180: both Count-Min register builds + the per-row counter inner
    // products + the spine-kept MIN, replayed register for register.
    "q180_cm_join_size" -> {
      def fan(src: String) =
        Seq((0, 16807L, 11L), (1, 48271L, 101L), (2, 69621L, 1009L),
          (3, 40692L, 10007L)).map { case (r, a, c) =>
          s"SELECT $r AS row, ((hv * $a + $c) % 2147483647) % 1024 AS bucket FROM $src"
        }.mkString("\n  UNION ALL ")
      s"""WITH ha AS (
         |  SELECT ${kmvHashSql("'u' || user_id")} AS hv
         |  FROM events WHERE event_type = 'click' AND user_id IS NOT NULL),
         |hb AS (
         |  SELECT ${kmvHashSql("'u' || user_id")} AS hv
         |  FROM events WHERE event_type = 'view' AND user_id IS NOT NULL),
         |fana AS (
         |  ${fan("ha")}),
         |fanb AS (
         |  ${fan("hb")}),
         |rega AS (SELECT row, bucket, count(*) AS cnt_a FROM fana GROUP BY 1, 2),
         |regb AS (SELECT row, bucket, count(*) AS cnt_b FROM fanb GROUP BY 1, 2),
         |prod AS (
         |  SELECT row, CAST(sum(cnt_a * cnt_b) AS BIGINT) AS row_est
         |  FROM rega JOIN regb USING (row, bucket) GROUP BY 1),
         |spine AS (SELECT DISTINCT row FROM rega),
         |est AS (
         |  SELECT CAST(min(coalesce(row_est, 0)) AS BIGINT)
         |    AS cm_join_estimate
         |  FROM spine LEFT JOIN prod USING (row)),
         |tru AS (
         |  SELECT CAST(coalesce(sum(x.c * y.c), 0) AS BIGINT)
         |    AS true_join_size
         |  FROM (SELECT user_id, count(*) AS c FROM events
         |        WHERE event_type = 'click' AND user_id IS NOT NULL
         |        GROUP BY 1) x
         |  JOIN (SELECT user_id, count(*) AS c FROM events
         |        WHERE event_type = 'view' AND user_id IS NOT NULL
         |        GROUP BY 1) y USING (user_id))
         |SELECT cm_join_estimate, true_join_size FROM est, tru""".stripMargin
    },
    // q181: the same prefix-window scaling (n·P_i − i·T), the endpoint
    // exclusion, and the (|S'| DESC, i ASC) argmax, replayed in DuckDB.
    "q181_cusum" ->
      """WITH s AS (
        |  SELECT CAST(ts AS DATE) AS t, CAST(count(*) AS BIGINT) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT)
        |    AS total
        |  FROM s),
        |pre AS (
        |  SELECT t, CAST(row_number() OVER (ORDER BY t) AS INTEGER) AS i,
        |    CAST(sum(v) OVER (ORDER BY t) AS BIGINT) AS p
        |  FROM s),
        |sc AS (
        |  SELECT pre.t, pre.i, tot.n, tot.total,
        |    tot.n * pre.p - pre.i * tot.total AS s_scaled
        |  FROM pre, tot WHERE pre.i < tot.n),
        |pk AS (SELECT * FROM sc ORDER BY abs(s_scaled) DESC, i ASC LIMIT 1)
        |SELECT n, total, CAST(t AS VARCHAR) AS cp_t, i AS cp_index,
        |  CAST(s_scaled AS BIGINT) AS s_scaled,
        |  CASE WHEN s_scaled > 0 THEN 'down' WHEN s_scaled < 0 THEN 'up'
        |       ELSE 'none' END AS shift
        |FROM pk""".stripMargin,
    // q182: the identical contingency cells, truncating per-item ppm, and
    // truncating means/F1 — integer-for-integer.
    "q182_bcubed" ->
      """WITH cells AS (
        |  SELECT c_nationkey AS p, c_mktsegment AS g,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
        |    AND c_mktsegment IS NOT NULL
        |  GROUP BY 1, 2),
        |sp AS (SELECT p, CAST(sum(n) AS BIGINT) AS sp FROM cells GROUP BY 1),
        |sg AS (SELECT g, CAST(sum(n) AS BIGINT) AS sg FROM cells GROUP BY 1),
        |t AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_items,
        |    CAST(sum(n * ((n * 1000000) // sp)) AS BIGINT) AS tp,
        |    CAST(sum(n * ((n * 1000000) // sg)) AS BIGINT) AS tr
        |  FROM cells JOIN sp USING (p) JOIN sg USING (g))
        |SELECT n_items,
        |  CAST(tp // n_items AS BIGINT) AS bcubed_precision_ppm,
        |  CAST(tr // n_items AS BIGINT) AS bcubed_recall_ppm,
        |  CAST(CASE WHEN (tp // n_items) + (tr // n_items) > 0
        |    THEN (2 * (tp // n_items) * (tr // n_items))
        |         // ((tp // n_items) + (tr // n_items)) END AS BIGINT)
        |    AS bcubed_f1_ppm
        |FROM t""".stripMargin,
    // q183/q184 share the span pipeline: k-windows (DuckDB list slices),
    // the >=2-distinct-docs repeated set, variable-gap (<= k) islands.
    "q183_repeated_spans" ->
      """WITH d AS (
        |  SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |wins AS (
        |  SELECT id, i AS pos, array_to_string(w[i:i+7], ' ') AS passage
        |  FROM d, unnest(range(1, len(w) - 6)) u(i)
        |  WHERE len(w) >= 8),
        |rep AS (
        |  SELECT passage FROM wins GROUP BY 1
        |  HAVING count(DISTINCT id) >= 2),
        |mk AS (SELECT id, pos FROM wins JOIN rep USING (passage)),
        |isl AS (
        |  SELECT id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos)
        |              <= 8
        |         THEN 0 ELSE 1 END AS nw
        |  FROM mk),
        |isl2 AS (
        |  SELECT id, pos,
        |    sum(nw) OVER (PARTITION BY id ORDER BY pos) AS grp
        |  FROM isl)
        |SELECT id, CAST(min(pos) AS BIGINT) AS start_tok,
        |  CAST(max(pos) + 7 AS BIGINT) AS end_tok,
        |  CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) AS n_tokens
        |FROM isl2 GROUP BY id, grp""".stripMargin,
    "q184_cut_spans" ->
      """WITH d AS (
        |  SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |tk AS (
        |  SELECT id, i AS p, w[i] AS tok
        |  FROM d, unnest(range(1, len(w) + 1)) u(i)),
        |wins AS (
        |  SELECT id, i AS pos, array_to_string(w[i:i+7], ' ') AS passage
        |  FROM d, unnest(range(1, len(w) - 6)) u(i)
        |  WHERE len(w) >= 8),
        |rep AS (
        |  SELECT passage FROM wins GROUP BY 1
        |  HAVING count(DISTINCT id) >= 2),
        |mk AS (SELECT id, pos FROM wins JOIN rep USING (passage)),
        |isl AS (
        |  SELECT id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos)
        |              <= 8
        |         THEN 0 ELSE 1 END AS nw
        |  FROM mk),
        |isl2 AS (
        |  SELECT id, pos,
        |    sum(nw) OVER (PARTITION BY id ORDER BY pos) AS grp
        |  FROM isl),
        |sp AS (
        |  SELECT id, min(pos) AS s, max(pos) + 7 AS e
        |  FROM isl2 GROUP BY id, grp),
        |cov AS (SELECT id, j AS p FROM sp, unnest(range(s, e + 1)) v(j)),
        |kept AS (
        |  SELECT tk.id, count(*) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY p) AS clean
        |  FROM tk ANTI JOIN cov USING (id, p) GROUP BY 1),
        |cnt AS (SELECT id, count(*) AS n_tok FROM tk GROUP BY 1),
        |docs AS (SELECT DISTINCT doc_id AS id FROM documents)
        |SELECT docs.id,
        |  CAST(coalesce(n_tok, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(n_tok, 0) - coalesce(n_kept, 0) AS BIGINT)
        |    AS n_cut,
        |  coalesce(clean, '') AS text_clean
        |FROM docs LEFT JOIN cnt ON cnt.id = docs.id
        |LEFT JOIN kept ON kept.id = docs.id""".stripMargin,
    // q185: the pD* rules as explicit UNION branches (symmetric copy,
    // inverse copies both ways) + a recursive CTE for the transitive pred
    // + the inverse image of the closure — a structurally different
    // evaluation (per-rule branches vs the engine's image-map join).
    "q185_owl_closure" ->
      """WITH RECURSIVE inp AS (
        |  SELECT 'n' || c_custkey AS s, 'adjacentTo' AS p,
        |    'n' || (c_custkey + 1) AS o
        |  FROM customer WHERE c_custkey <= 30 AND c_custkey % 2 = 0
        |  UNION ALL
        |  SELECT 'c' || c_custkey, 'locatedIn', 'n' || c_nationkey
        |  FROM customer WHERE c_custkey <= 40
        |  UNION ALL
        |  SELECT 'c' || c_custkey, 'partOf', 'c' || (c_custkey // 2)
        |  FROM customer WHERE c_custkey > 1 AND c_custkey <= 64),
        |exp AS (
        |  SELECT s, p, o FROM inp
        |  UNION ALL SELECT o, 'adjacentTo', s FROM inp
        |    WHERE p = 'adjacentTo'
        |  UNION ALL SELECT o, 'contains', s FROM inp WHERE p = 'locatedIn'
        |  UNION ALL SELECT s, 'locatedIn', o FROM inp WHERE p = 'contains'
        |  UNION ALL SELECT o, 'hasPart', s FROM inp WHERE p = 'partOf'
        |  UNION ALL SELECT s, 'partOf', o FROM inp WHERE p = 'hasPart'),
        |po AS (SELECT DISTINCT s, o FROM exp WHERE p = 'partOf'),
        |cl AS (
        |  SELECT s, o FROM po
        |  UNION
        |  SELECT cl.s, po.o FROM cl JOIN po ON po.s = cl.o)
        |SELECT DISTINCT subj, pred, obj FROM (
        |  SELECT s AS subj, p AS pred, o AS obj FROM exp
        |  UNION ALL SELECT s, 'partOf', o FROM cl
        |  UNION ALL SELECT o, 'hasPart', s FROM cl)""".stripMargin,
    // q186: the DEFINITION of a bridge, evaluated directly — for every
    // edge (a,b), BFS from a in the graph WITHOUT that edge (a product-
    // graph recursion keyed by the excluded edge, q164's trick); bridge
    // iff b is never reached. No spanning tree anywhere.
    "q186_bridges" ->
      """WITH RECURSIVE und AS (
        |  SELECT least('c' || c_custkey, 'c' || (c_custkey // 2)) AS a,
        |         greatest('c' || c_custkey, 'c' || (c_custkey // 2)) AS b
        |  FROM customer WHERE c_custkey > 1 AND c_custkey <= 256
        |  UNION
        |  SELECT least('c' || c_custkey, 'c' || (c_custkey - 1)),
        |         greatest('c' || c_custkey, 'c' || (c_custkey - 1))
        |  FROM customer
        |  WHERE c_custkey % 8 = 0 AND c_custkey > 1 AND c_custkey <= 256),
        |sym AS (SELECT a AS x, b AS y FROM und
        |        UNION ALL SELECT b, a FROM und),
        |r AS (
        |  SELECT a AS ea, b AS eb, a AS node FROM und
        |  UNION
        |  SELECT r.ea, r.eb, sym.y
        |  FROM r JOIN sym ON sym.x = r.node
        |  WHERE NOT (least(sym.x, sym.y) = r.ea
        |             AND greatest(sym.x, sym.y) = r.eb))
        |SELECT u.a, u.b FROM und u
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM r
        |  WHERE r.ea = u.a AND r.eb = u.b AND r.node = u.b)""".stripMargin,
    // q187: the greedy leftmost-longest scan replayed PICK BY PICK — a
    // recursive CTE whose state is the scan cursor, advancing to the
    // NOT-EXISTS-argmin candidate (min start >= cursor, max length) each
    // step. No sorted fold, no HOFs — sequential recursion vs the
    // engine's per-doc aggregate fold.
    "q187_phrase_spot" ->
      """WITH RECURSIVE dict(phrase, l) AS (
        |  VALUES ('sort merge join', 3), ('merge join', 2),
        |         ('hash join', 2), ('table scan', 2), ('scan merge', 2),
        |         ('batch batch batch', 3), ('batch batch', 2),
        |         ('window window', 2), ('key order sort', 3),
        |         ('order sort', 2)),
        |d AS (
        |  SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |cand AS MATERIALIZED (
        |  SELECT d.id, u.i AS start, dict.l AS len, dict.phrase
        |  FROM d, unnest(range(1, len(d.w) + 1)) u(i), dict
        |  WHERE u.i + dict.l - 1 <= len(d.w)
        |    AND array_to_string(d.w[u.i:u.i+dict.l-1], ' ') = dict.phrase),
        |pick AS (
        |  SELECT id, 0 AS start, 0 AS len, '' AS phrase, 1 AS cur
        |  FROM (SELECT DISTINCT id FROM cand)
        |  UNION ALL
        |  SELECT c.id, c.start, c.len, c.phrase, c.start + c.len
        |  FROM pick p JOIN cand c ON c.id = p.id AND c.start >= p.cur
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM cand c2
        |    WHERE c2.id = c.id AND c2.start >= p.cur
        |      AND (c2.start < c.start
        |           OR (c2.start = c.start AND c2.len > c.len))))
        |SELECT id AS doc_id, CAST(start AS BIGINT) AS start_tok,
        |  CAST(len AS BIGINT) AS n_tokens, phrase
        |FROM pick WHERE len > 0""".stripMargin,
    // q188: the same DP evaluated as an INDEX RECURSION — one recursive-CTE
    // row per (key, prefix length), carrying the full dp vector as a list;
    // the predecessor index is a correlated count (no sort-order binary
    // search anywhere).
    "q188_interval_sched" ->
      """WITH RECURSIVE iv AS (
        |  SELECT CAST(l_suppkey AS VARCHAR) AS key,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS s,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(l_shipdate AS DATE))
        |      + CAST(l_quantity AS BIGINT) % 20 AS BIGINT) AS e,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem WHERE l_suppkey <= 20 AND l_partkey % 10 = 0),
        |ivx AS MATERIALIZED (
        |  SELECT key, s, e, w,
        |    row_number() OVER (PARTITION BY key ORDER BY e, s, w) AS idx
        |  FROM iv),
        |pred AS MATERIALIZED (
        |  SELECT a.key, a.idx, a.w,
        |    (SELECT count(*) FROM ivx b
        |     WHERE b.key = a.key AND b.e < a.s) AS p
        |  FROM ivx a),
        |n AS (SELECT key, count(*) AS n FROM ivx GROUP BY 1),
        |dp AS (
        |  SELECT key, 0 AS i, [CAST(0 AS BIGINT)] AS v FROM n
        |  UNION ALL
        |  SELECT dp.key, dp.i + 1,
        |    list_append(dp.v, greatest(dp.v[dp.i + 1], pr.w + dp.v[pr.p + 1]))
        |  FROM dp JOIN pred pr ON pr.key = dp.key AND pr.idx = dp.i + 1)
        |SELECT dp.key, v[n.n + 1] AS best_weight, n.n AS n_intervals
        |FROM dp JOIN n ON n.key = dp.key WHERE dp.i = n.n""".stripMargin,
    // q189: the DEFINITION of a cut vertex, evaluated directly — for every
    // vertex v, BFS from v's minimum neighbor in the graph WITHOUT v (a
    // product-graph recursion keyed by the excluded vertex, q186's trick
    // vertex-wise); v cuts iff some neighbor is never reached. No spanning
    // forest, no blocks.
    "q189_articulation" ->
      """WITH RECURSIVE und AS (
        |  SELECT least('c' || c_custkey, 'c' || (c_custkey // 2)) AS a,
        |         greatest('c' || c_custkey, 'c' || (c_custkey // 2)) AS b
        |  FROM customer WHERE c_custkey > 1 AND c_custkey <= 256
        |  UNION
        |  SELECT least('c' || c_custkey, 'c' || (c_custkey - 1)),
        |         greatest('c' || c_custkey, 'c' || (c_custkey - 1))
        |  FROM customer
        |  WHERE c_custkey % 8 = 0 AND c_custkey > 1 AND c_custkey <= 256),
        |sym AS (SELECT a AS x, b AS y FROM und
        |        UNION ALL SELECT b, a FROM und),
        |nb AS (SELECT x AS v, y AS nb FROM sym),
        |seed AS (SELECT v, min(nb) AS s FROM nb GROUP BY 1),
        |r AS (
        |  SELECT v, s AS node FROM seed
        |  UNION
        |  SELECT r.v, sym.y FROM r JOIN sym ON sym.x = r.node
        |  WHERE sym.y <> r.v)
        |SELECT DISTINCT nb.v AS v FROM nb
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM r WHERE r.v = nb.v AND r.node = nb.nb)""".stripMargin,
    // q190: the same LCS recurrence evaluated ROW BY ROW in a recursive
    // CTE — state is the full dp row carried as a list, the sequential
    // in-row dependency (new[j-1]) replayed by a list_reduce whose
    // accumulator IS the row being built. No rolling arrays, no typed map.
    "q190_lcs_align" ->
      """WITH RECURSIVE t AS (
        |  SELECT CAST(x.doc_id AS VARCHAR) AS key,
        |    list_filter(string_split_regex(trim(x.text), '\s+'),
        |      w -> w <> '')[1:40] AS lt,
        |    list_filter(string_split_regex(trim(y.text), '\s+'),
        |      w -> w <> '')[1:40] AS rt
        |  FROM documents x JOIN documents y ON y.doc_id = x.doc_id + 1
        |  WHERE x.doc_id < 80 AND y.doc_id < 80
        |    AND x.text IS NOT NULL AND y.text IS NOT NULL),
        |dims AS MATERIALIZED (
        |  SELECT key, lt, rt, len(lt) AS n, len(rt) AS m FROM t),
        |dp AS (
        |  SELECT key, 0 AS i,
        |    list_transform(range(0, m + 1), z -> CAST(0 AS BIGINT)) AS v
        |  FROM dims
        |  UNION ALL
        |  SELECT d.key, dp.i + 1,
        |    list_reduce(
        |      list_prepend([CAST(0 AS BIGINT)],
        |        list_transform(range(1, d.m + 1), j ->
        |          [dp.v[j], dp.v[j + 1],
        |           CASE WHEN d.lt[dp.i + 1] = d.rt[j]
        |                THEN CAST(1 AS BIGINT)
        |                ELSE CAST(0 AS BIGINT) END])),
        |      (acc, x) -> list_append(acc,
        |        greatest(x[2], acc[-1], x[1] + x[3])))
        |  FROM dp JOIN dims d ON d.key = dp.key AND dp.i < d.n)
        |SELECT dp.key, CAST(d.n AS BIGINT) AS n_left,
        |  CAST(d.m AS BIGINT) AS n_right, v[d.m + 1] AS lcs_len,
        |  CAST(d.n AS BIGINT) - v[d.m + 1] AS n_del,
        |  CAST(d.m AS BIGINT) - v[d.m + 1] AS n_ins
        |FROM dp JOIN dims d ON d.key = dp.key WHERE dp.i = d.n""".stripMargin
  )
}
