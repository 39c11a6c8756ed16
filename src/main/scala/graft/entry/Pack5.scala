package graft.entry

import graft.fixtures.InvoiceCorpus
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.run.{Extract, Pipeline}
import graft.tag.Taggers
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-contract query pack 5/5 — curation continuation, ER audits, late additions.
  * Split from the former 6.8k-line SparkEntry (r4 verdict #4);
  * content is byte-moved, composed back in [[graft.SparkEntry]].
  * Shared helpers live in [[graft.entry.Q]]. */
private[graft] object Pack5 {
  import Q._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_isotonic" -> ((s, d) => {
      // isotonic (monotone non-decreasing) least-squares fit of monthly
      // order volumes per priority — the PAVA calibration primitive, in
      // exact integer ppm. Engine = per-series pool-adjacent-violators
      // stack fold (cross-multiplied rational compares, no floats);
      // oracle = the minimax closed form max_{j<=i} min_{k>=i}
      // avg(y[j..k]) evaluated as an O(n^3) integer triple join (floor
      // commutes with max/min, so the ppm floors agree exactly).
      val pts = t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("mon"))
        .agg(count(lit(1)).as("y"))
      graft.ops.Isotonic.fit(pts, col("prio"), col("mon"), col("y"))
    }),
    "q192_suffix_array" -> ((s, d) =>
      // distributed suffix array of the concatenated 12-document corpus —
      // prefix doubling as joins + Enumerate dense re-ranks (the
      // ExactSubstr index structure; no suffix string ever materialized).
      // Oracle = the O(n^2) DEFINITION: materialize every suffix of the
      // same concatenation and row_number it.
      graft.ops.SuffixArray.build(
        t(s, d, "documents").where(col("doc_id") < 12),
        col("doc_id"), col("text"))),
    "q193_taxonomy_lca" -> ((s, d) => {
      // lowest common ancestor + Wu–Palmer taxonomy similarity over the
      // 255-node customer parent tree for 99 query pairs (k, 201-k) —
      // the class-generalization primitive for type-aware blocking.
      // Engine = pointer-doubled depth-annotated ancestor chains (log d
      // rounds) + one chain-intersection join; oracle = a step-at-a-time
      // recursive ancestor walk with arg_max over common ancestors.
      val cust = t(s, d, "customer").where(col("c_custkey") <= 255)
      val parents = cust.where(col("c_custkey") > 1).select(
        concat(lit("c"), col("c_custkey")).as("id"),
        concat(lit("c"), expr("c_custkey div 2")).as("parent"))
      val pairs = cust
        .where(col("c_custkey") >= 2 && col("c_custkey") <= 100)
        .select(concat(lit("c"), col("c_custkey")).as("a"),
          concat(lit("c"), lit(201) - col("c_custkey")).as("b"))
      graft.graph.Taxonomy.lcaPairs(parents, col("id"), col("parent"),
        pairs, col("a"), col("b"))
    }),
    "q194_lis" -> ((s, d) => {
      // longest strictly-increasing price subsequence per supplier in
      // ship order — the order-consistency audit (n - lis_len = minimum
      // rows to delete for a monotone series). Engine = secondary-sort
      // partition walk + patience tails with binary search; oracle = the
      // O(n^2) textbook DP as a dp-vector recursive CTE (no tails
      // anywhere).
      val li = t(s, d, "lineitem")
        .where(col("l_suppkey") <= 30 && col("l_partkey") % 7 === 0)
        .select(col("l_suppkey"),
          datediff(to_date(col("l_shipdate")), to_date(lit("1970-01-01")))
            .as("sday"),
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      graft.ops.Lis.longestRun(li, col("l_suppkey"),
        Seq(col("sday"), col("l_orderkey"), col("l_linenumber")),
        col("cents"))
    }),
    "q195_mmr_select" -> ((s, d) => {
      // maximal-marginal-relevance diverse top-12 of docs 1..60 against
      // doc 0's tokens as the query — integer MMR (score = rel − max sim
      // to picked). Engine = k driver rounds, each a distributed
      // TakeOrdered(1) argmax + one broadcast fold of the picked doc's
      // tokens; oracle = a recursive CTE whose state is the FULL
      // candidate max-sim VECTOR plus the chosen list, pick replayed by
      // list argmax over a prebuilt similarity matrix.
      val docs = t(s, d, "documents").where(col("text").isNotNull)
      val tok = docs.where(col("doc_id").between(1, 60))
        .select(col("doc_id"), explode(filter(
          split(trim(col("text")), "\\s+"), w => w =!= "")).as("w"))
      val q = docs.where(col("doc_id") === 0)
        .select(explode(filter(
          split(trim(col("text")), "\\s+"), w => w =!= "")).as("w"))
      graft.ops.Mmr.select(tok, col("doc_id"), col("w"), q, col("w"), 12)
    }),
    "q196_stable_match" -> ((s, d) => {
      // proposer-optimal stable matching of 16 customers to 16 suppliers
      // under tie-free modular preference scores (5mw mod 251 / 7mw mod
      // 251) — the 1:1 ER assignment with no blocking pairs. Engine =
      // round-PARALLEL Gale–Shapley (all free proposers per round, argmax
      // holds, standing rejections); oracle = the SEQUENTIAL McVitie
      // replay, one proposal per recursion step with pointer/fiancé
      // vectors as list state — identical output by the McVitie–Wilson
      // proposal-order-independence theorem.
      val men = t(s, d, "customer")
        .where(col("c_custkey").between(1, 16)).select(col("c_custkey").as("mk"))
      val women = t(s, d, "supplier")
        .where(col("s_suppkey").between(1, 16)).select(col("s_suppkey").as("wk"))
      val prefs = men.crossJoin(women).select(
        concat(lit("c"), col("mk")).as("m"),
        concat(lit("s"), col("wk")).as("w"),
        (col("mk") * col("wk") * 5 % 251).as("m_score"),
        (col("mk") * col("wk") * 7 % 251).as("w_score"))
      graft.link.StableMatch.matchPairs(prefs)
    }),
    "q197_containment" -> ((s, d) => {
      // asymmetric shingle-containment near-dup over the corpus plus 15
      // planted 12-token excerpts (doc_id + 10000) — the quote/subset
      // duplication mode symmetric Jaccard cannot see (excerpt→source
      // containment 1.0, Jaccard ~0.05). Engine = df-capped shared-shingle
      // blocking + candidate-bounded intersection, both directions scored
      // in exact integer ppm; oracle = the same corpus scored by direct
      // all-candidate SQL (blocking replayed declaratively).
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val excerpts = docs.where(col("doc_id") < 15)
        .select((col("doc_id") + 10000).as("doc_id"),
          array_join(slice(filter(
            split(trim(col("text")), "\\s+"), w => w =!= ""),
            1, 12), " ").as("text"))
      graft.ops.Dedup.containmentPairs(docs.unionByName(excerpts),
        k = 5, thresholdPpm = 500000L, maxDf = 50)
    }),
    "q198_freq_itemsets" -> ((s, d) => {
      // frequent itemsets (sizes 1-3) over orders as baskets and part
      // categories (l_partkey mod 37) as items — the co-purchase mining
      // step of the product graph. Engine = level-wise Apriori (each
      // level counts only candidates whose sub-level survived, per-basket
      // streams projected to frequent items first); oracle = DIRECT
      // enumeration of every itemset by unpruned self-joins (downward
      // closure is what makes the two agree).
      val li = t(s, d, "lineitem").select(
        col("l_orderkey").as("bk"),
        concat(lit("p"), (col("l_partkey") % 37).cast("string")).as("it"))
      graft.ops.Itemsets.frequentItemsets(li, col("bk"), col("it"),
        minSupport = 30L)
    }),
    "q199_assoc_rules" -> ((s, d) => {
      // association rules x->y from the frequent category pairs with
      // integer-ppm confidence and lift (decimal-exact floor — int64
      // would wrap at corpus scale). Oracle = the definitional SQL with
      // HUGEINT-safe integer division.
      val li = t(s, d, "lineitem").select(
        col("l_orderkey").as("bk"),
        concat(lit("p"), (col("l_partkey") % 37).cast("string")).as("it"))
      graft.ops.Itemsets.associationRules(li, col("bk"), col("it"),
        minSupport = 60L, minConfPpm = 0L)
    }),
    "q200_corr_clustering" -> ((s, d) => {
      // pivot correlation clustering over the 256-node customer tree +
      // every-5th chord — the ER hairball repair (a cluster only holds
      // DIRECT neighbors of its pivot). Engine = lex-first MIS w.r.t.
      // the portable kmvHash priority (parallel local-min rounds) + one
      // min-pivot assignment join; oracle = the SEQUENTIAL pivot scan
      // replayed pivot-by-pivot in a list-state recursive CTE with the
      // same priority recomputed in SQL.
      val cust = t(s, d, "customer").where(col("c_custkey") <= 256)
      val tree = cust.where(col("c_custkey") > 1).select(
        concat(lit("c"), col("c_custkey")).as("src"),
        concat(lit("c"), expr("c_custkey div 2")).as("dst"))
      val chords = cust
        .where(col("c_custkey") % 5 === 0 && col("c_custkey") > 1)
        .select(concat(lit("c"), col("c_custkey")).as("src"),
          concat(lit("c"), col("c_custkey") - 1).as("dst"))
      graft.canon.CorrCluster.pivotClusters(tree.union(chords))
    }),
    "q201_meta_blocking" -> ((s, d) => {
      // meta-blocking (CBS weights + weighted-node pruning) over a
      // redundancy-positive blocking: three modular keys per customer,
      // so co-residual pairs share up to 3 blocks. Engine = block
      // purge + pair-count + integer-exact mean pruning; oracle = the
      // definitional SQL over the same keys.
      val c = t(s, d, "customer").where(col("c_custkey") <= 120)
      val asg = Seq(11, 13, 17).map { m =>
        c.select(concat(lit("c"), col("c_custkey")).as("rec"),
          concat(lit(s"k${m}_"), (col("c_custkey") % m).cast("string"))
            .as("blk"))
      }.reduce(_ unionByName _)
      graft.link.MetaBlocking.wnpPairs(asg, col("rec"), col("blk"))
    }),
    "q202_sw_local" -> ((s, d) => {
      // Smith–Waterman local alignment over doc pairs with a PLANTED
      // 7-token fragment of the left doc spliced into the right — the
      // embedded-copy detector global LCS/edit distance dilutes. Engine
      // = per-pair rolling-row DP, narrow typed map, row-major
      // first-tie argmax; oracle = row-by-row recursive-CTE DP carrying
      // the H row as a list (in-row dependency via list_reduce) + an
      // explicit (h DESC, i, j) rank over all cells.
      val docs = t(s, d, "documents")
        .where(col("doc_id") < 80 && col("text").isNotNull)
        .select(col("doc_id"), filter(
          split(trim(col("text")), "\\s+"), w => w =!= "").as("tok"))
      val pairs = docs.select(col("doc_id").as("pair_id"), col("tok").as("xt"))
        .join(docs.select((col("doc_id") - 1).as("pair_id"),
          col("tok").as("yt")), Seq("pair_id"))
        .select(col("pair_id"),
          array_join(slice(col("xt"), 1, 30), " ").as("lt"),
          array_join(concat(slice(col("yt"), 1, 10), slice(col("xt"), 12, 7),
            slice(col("yt"), 11, 5)), " ").as("rt"))
      graft.ops.Align.swLocal(pairs, col("pair_id"), col("lt"), col("rt"))
    }),
    "q204_two_edge_cc" -> ((s, d) => {
      // 2-edge-connected components over the 256-node customer tree +
      // every-6th chord — the evidence-redundancy classes of a sameAs
      // graph (split a merge along its bridges, keep redundantly
      // supported clusters). Engine = Bridges (spanning forest +
      // pointer-doubled chain covers) → anti join → ConnectedComponents
      // → singleton backfill; oracle = bridges BY DEFINITION (per-edge
      // exclusion BFS) + recursive-CTE reachability CC, min labels.
      val cust = t(s, d, "customer").where(col("c_custkey") <= 256)
      val tree = cust.where(col("c_custkey") > 1).select(
        concat(lit("c"), col("c_custkey")).as("src"),
        concat(lit("c"), expr("c_custkey div 2")).as("dst"))
      val chords = cust
        .where(col("c_custkey") % 6 === 0 && col("c_custkey") > 1)
        .select(concat(lit("c"), col("c_custkey")).as("src"),
          concat(lit("c"), col("c_custkey") - 1).as("dst"))
      graft.graph.TwoEdgeCC.components(tree.union(chords))
    }),
    "q203_spell_correct" -> ((s, d) => {
      // SymSpell correction of corrupted ENTITY IDS — every 11th
      // customer name with its last two digits transposed (the classic
      // swapped-digits invoice-id error) corrected against the full
      // 1500-id dictionary WITHOUT the tokens×dict cross join. Engine =
      // symmetric ≤2-deletion neighborhoods equi-joined + native
      // full-Damerau verify + (dist, freq DESC, term) argmin; oracle =
      // the brute cross join scored by DuckDB's OWN damerau_levenshtein
      // (the q159-proven cross-engine pair), same total order. A swap
      // like …10→…01 lands EXACTLY on another valid id (dist 0 beats
      // the dist-1 original) — both sides agree because the order is
      // total.
      // fixture capped at 2000 ids (constant across SF, the house rule
      // for fixture queries): sequential ids make a DENSE key space
      // where ~2300 dict entries share a deletion variant with every
      // token — at 15k ids the exact verify is 3M+ Damerau DPs. The
      // operator is the scale story (vocabulary-bounded); the fixture
      // need not be the worst case of its own blocking.
      val cust = t(s, d, "customer").where(col("c_custkey") <= 2000)
      val dict = cust.groupBy(col("c_name").as("w")).count()
      val toks = cust.where(col("c_custkey") % 11 === 0)
        .select(concat(substring(col("c_name"), 1, 16),
          substring(col("c_name"), 18, 1),
          substring(col("c_name"), 17, 1)).as("tok"))
      graft.link.SpellCorrect.symspell(toks, col("tok"),
        dict, col("w"), col("count"))
    }),
    "q205_kneser_ney" -> ((s, d) => {
      // interpolated Kneser–Ney smoothed bigram table over the documents
      // corpus, D = 3/4 — every probability the exact integer rational
      // (max(4c₁₂−3,0)·NB + 3·T₁·R₂)/(4·c₁·NB) floored to ppm in
      // decimal(38,0) (int64 wraps at corpus scale). Oracle = the
      // definitional SQL: the same four count aggregates + HUGEINT
      // arithmetic. The spec proves Σ_w₂ P(w₂|w₁) = 1 exactly.
      graft.ops.LangModel.knBigrams(t(s, d, "documents"),
        "doc_id", "text")
    }),
    "q206_soft_tfidf" -> ((s, d) => {
      // SoftTFIDF scoring of original-vs-corrupted part-name pairs
      // (2nd char of every word dropped — the OCR-mangled vendor-name
      // case): per-token best Jaro–Winkler ≥ 0.85 soft matches,
      // idf-damped by exact rational weights, every term an exact
      // integer floor (only jw is float — the q128-proven bit-identical
      // cross-engine computation). Oracle = the definitional SQL with
      // DuckDB's OWN jaro_winkler_similarity and HUGEINT floors.
      val part = t(s, d, "part")
      val originals = part.select(
        concat(lit("p"), col("p_partkey")).as("id"), col("p_name").as("text"))
      val mutated = part.where(col("p_partkey") % 3 === 0).select(
        concat(lit("m"), col("p_partkey")).as("id"),
        array_join(expr("transform(split(p_name, ' '), " +
          "w -> concat(substring(w, 1, 1), substring(w, 3)))"), " ")
          .as("text"))
      val recs = originals.unionByName(mutated)
      val pairs = part.where(col("p_partkey") % 3 === 0).select(
        concat(lit("p"), col("p_partkey")).as("a"),
        concat(lit("m"), col("p_partkey")).as("b"))
      graft.link.SoftTfIdf.score(pairs, col("a"), col("b"),
        recs, col("id"), col("text"), thetaPpm = 850000L)
    }),
    "q207_rule_mining" -> ((s, d) => {
      // AMIE composition-rule mining r1(x,z) ∧ r2(z,y) ⇒ p(x,y) over a
      // TPC-H-derived KG with two PLANTED soft rules: orderNation holds
      // for 9/10 orders (hasCustomer ∧ inNation ⇒ orderNation, conf
      // 900000 ppm) and custRegion for 4/5 customers (inNation ∧
      // inRegion ⇒ custRegion, 800000 ppm) — the rules a constructor
      // materializes and whose violations it audits. Engine = hub-gated
      // entity self-join + distinct-pair aggregates + exact ppm floors;
      // oracle = the definitional SQL over the same triple union.
      val ord = t(s, d, "orders"); val cust = t(s, d, "customer")
      val nat = t(s, d, "nation")
      val triples = ord.select(
          concat(lit("o"), col("o_orderkey")).as("s"),
          lit("hasCustomer").as("p"),
          concat(lit("c"), col("o_custkey")).as("o"))
        .unionAll(cust.select(concat(lit("c"), col("c_custkey")).as("s"),
          lit("inNation").as("p"),
          concat(lit("n"), col("c_nationkey")).as("o")))
        .unionAll(nat.select(concat(lit("n"), col("n_nationkey")).as("s"),
          lit("inRegion").as("p"),
          concat(lit("r"), col("n_regionkey")).as("o")))
        .unionAll(ord.where(col("o_orderkey") % 10 =!= 0)
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select(concat(lit("o"), col("o_orderkey")).as("s"),
            lit("orderNation").as("p"),
            concat(lit("n"), col("c_nationkey")).as("o")))
        .unionAll(cust.where(col("c_custkey") % 5 =!= 0)
          .join(nat, col("c_nationkey") === col("n_nationkey"))
          .select(concat(lit("c"), col("c_custkey")).as("s"),
            lit("custRegion").as("p"),
            concat(lit("r"), col("n_regionkey")).as("o")))
      // maxFanout is explicitly unbounded: the oracle SQL has no hub
      // gate, and nation entities carry ~SF·54k orderNation in-edges, so
      // the default 1e6 cap would silently diverge around SF≥20
      // (r4 ADVICE). The gate itself is exercised by RuleMinerSpec.
      graft.graph.RuleMiner.pathRules(triples,
        col("s"), col("p"), col("o"), minSupport = 50L,
        minConfPpm = 100000L, maxFanout = Long.MaxValue)
    }),
    "q208_incremental_cc" -> ((s, d) => {
      // incremental CC maintenance: a 4-tree customer forest labeled
      // once, then ONE batch (cross-tree chords + 30 brand-new vertices)
      // folded in via label contraction — the old edge set is never
      // re-read, the inner CC runs on the batch-bounded LABEL graph.
      // Oracle = one full reachability CC over the UNION (the
      // incremental == rebuild law, checked cross-engine).
      val cust = t(s, d, "customer")
      val k = col("c_custkey")
      val base = cust.where(k > 7 && k <= 200).select(
        concat(lit("c"), k).as("src"),
        concat(lit("c"), expr("c_custkey div 2")).as("dst"))
      val batch = cust.where(k % 9 === 0 && k > 7 && k <= 200)
        .select(concat(lit("c"), k).as("src"),
          concat(lit("c"), k - 2).as("dst"))
        .union(cust.where(k > 200 && k <= 230).select(
          concat(lit("c"), k).as("src"),
          concat(lit("c"), expr("c_custkey div 2")).as("dst")))
      val labels = graft.canon.ConnectedComponents.run(base)
      graft.canon.ConnectedComponents.incrementalUpdate(labels, batch)
    }),
    "q209_consensus_clusters" -> ((s, d) => {
      // 2-of-3 consensus over three independent customer clusterings
      // (nation, market segment, id-bucket) — the co-association
      // majority that outvotes any single near-dup signal's false
      // merges before destructive keep-one. Engine = per-method capped
      // cluster self-joins → pair vote count → majority filter → CC →
      // singleton backfill; oracle = the definitional vote SQL + a
      // reachability recursion, min labels.
      val cust = t(s, d, "customer").where(col("c_custkey") <= 600)
      val id = concat(lit("c"), col("c_custkey"))
      val rows = cust.select(lit("nat").as("m"), id.as("i"),
          concat(lit("n"), col("c_nationkey")).as("g"))
        .unionAll(cust.select(lit("seg").as("m"), id.as("i"),
          col("c_mktsegment").cast("string").as("g")))
        .unionAll(cust.select(lit("bkt").as("m"), id.as("i"),
          (col("c_custkey") % 40).cast("string").as("g")))
      graft.canon.Consensus.majorityClusters(rows,
        col("m"), col("i"), col("g"), minVotes = 2L)
    }),
    "q210_voptimal_hist" -> ((s, d) => {
      // v-optimal 4-bucket histograms of customer balances per nation —
      // the optimizer-statistics sketch (minimum-SSE bucketing beats
      // equi-width/equi-depth for selectivity error). Engine = per-key
      // typed O(n²B) DP over exact BigInt fractions (earliest-argmin
      // ties); oracle = the SAME DP unrolled as four join stages with
      // HUGEINT fraction arithmetic and NOT-EXISTS (cost, cut) argmins,
      // then a back-pointer walk. No floats on either side.
      graft.ops.Histogram.voptimal(
        t(s, d, "customer").where(col("c_custkey") <= 1000),
        concat(lit("n"), col("c_nationkey")), col("c_custkey"),
        floor(col("c_acctbal")), nBuckets = 4)
    }),
    "q211_retrieval_eval" -> ((s, d) => {
      // ranked-retrieval scorecard (MAP/MRR/P@3/R@3) in EXACT ppm over
      // order line rankings (rank = l_linenumber, relevant = partkey
      // divisible by 3) — the grading harness for this engine's own
      // bm25/ANN/rrf surfaces; zero-relevant queries report null
      // metrics, not silence. Engine = per-query BigInt-rational fold;
      // oracle = the same fractions accumulated by an associative
      // list_reduce fraction-add in HUGEINT.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_orderkey")
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"))
      val ranked = t(s, d, "lineitem").where(col("l_orderkey") <= 300)
        .withColumn("rk", row_number().over(w))
      graft.ops.Retrieval.evalRanking(ranked,
        col("l_orderkey"), col("rk"), col("l_partkey") % 3 === 0, k = 3)
    }),
    "q212_merge_plan" -> ((s, d) => {
      // compaction planning: optimal binary merge cost (Huffman) per
      // supplier over its line quantities as file sizes — the floor no
      // merge order beats for an LSM-ish sink; the COST is unique
      // across optimal tie-breaks, so no tie rules leak into the
      // result. Engine = per-key two-queue greedy fold; oracle = the
      // greedy replayed one merge per recursion step with a sorted
      // list-state.
      graft.ops.Scheduling.huffmanMergeCost(
        t(s, d, "lineitem").where(col("l_suppkey") <= 24),
        concat(lit("s"), col("l_suppkey")), col("l_quantity"))
    }),
    "q213_constraint_check" -> ((s, d) => {
      // owl:differentFrom consistency audit over a sameAs clustering:
      // chains of customers broken at multiples of 7 (the components),
      // differentFrom assertions (c, c-3) for every 5th customer — the
      // ones landing INSIDE a run are the violations a canonicalizer
      // must repair before materialization. Engine = CC + two
      // label-resolve joins + equality filter; oracle = recursive
      // reachability CC + the definitional join.
      val cust = t(s, d, "customer").where(col("c_custkey") <= 400)
      val k = col("c_custkey")
      val same = cust.where(k % 7 =!= 0 && k > 0).select(
        concat(lit("c"), k).as("src"), concat(lit("c"), k - 1).as("dst"))
      val diff = cust.where(k % 5 === 0 && k >= 3).select(
        concat(lit("c"), k).as("src"), concat(lit("c"), k - 3).as("dst"))
      graft.canon.Constraints.differentFromViolations(same, diff)
    }),
    "q214_topic_boundaries" -> ((s, d) => {
      // integer TextTiling over the documents corpus (w=8): lexical-dip
      // topic boundaries scored by exact set-Jaccard ppm (Hearst's
      // cosine needs a sqrt with no cross-engine bit guarantee) with
      // the strict-left/lax-right local-minimum rule and one-step
      // depth gate — RAG chunking at topic seams instead of through
      // them. Engine = per-doc typed scan, zero shuffle; oracle = the
      // same windows via DuckDB list slices + lag/lead.
      graft.ops.Chunker.topicBoundaries(t(s, d, "documents"),
        col("doc_id"), col("text"), w = 8, minDepthPpm = 100000L)
    }),
    "q215_threshold_sweep" -> ((s, d) => {
      // the ER tuning curve: P/R/F1 at EVERY distinct match score in
      // one pass, against a gold set that deliberately disagrees with
      // the score order (so the curve has a real knee) and includes
      // never-scored gold pairs (permanent FN — the recall trap).
      // Engine = pair-keyed label join + score-keyed counts + ONE
      // cumulative window over the distinct-score table; oracle = the
      // definitional per-threshold computation via the same window in
      // SQL.
      val cust = t(s, d, "customer").where(col("c_custkey") <= 300)
      val k = col("c_custkey")
      val right = cust.select(k.as("j"))
      val scored = cust.select(k.as("i")).join(right,
          col("j") > col("i") && col("j") - col("i") <= 4)
        .select(concat(lit("c"), col("i")).as("a"),
          concat(lit("c"), col("j")).as("b"),
          (lit(1000) - lit(7) * (col("j") - col("i")) * (col("j") - col("i"))
            + col("i") % 13).as("score"))
      val gold = cust.select(k.as("i")).join(right,
          col("j") > col("i") &&
          (col("j") - col("i") <= 2 ||
            (col("j") - col("i") === 3 && col("i") % 3 === 0) ||
            col("j") - col("i") === 6))
        .select(concat(lit("c"), col("i")).as("x"),
          concat(lit("c"), col("j")).as("y"))
      graft.metrics.Sweep.thresholdSweep(scored, col("a"), col("b"),
        col("score"), gold, col("x"), col("y"))
    }),
    "q216_clahe_lut" -> ((s, d) => {
      // declarative CLAHE LUTs (contrast-limited equalization as a Spark
      // aggregation — the corpus-scale image-normalization twin of the
      // imperative claheL, r5) over a deterministic 4-tile plane: pixels
      // are customers 1..1200, tile = (key−1) div 300 (4 tiles × 300 px),
      // gray = 128 for every 3rd pixel (the clipping spike) else
      // (key·37) mod 256. clipLimitMilli 4000 → clip = 4000·300/256000 = 4.
      // Engine = groupBy histogram → window clip/redistribute/cumsum →
      // half-even integer rounding; oracle = the same definition in SQL
      // (EqualizeSpec locks this definition against the imperative
      // OpenCV-transcribed LUTs on dyadic areas).
      val cust = t(s, d, "customer")
        .where(col("c_custkey").between(1, 1200))
      val px = cust.select(
        expr("(c_custkey - 1) div 300").cast("long").as("tile"),
        when(col("c_custkey") % 3 === 0, lit(128L))
          .otherwise((col("c_custkey") * 37) % 256).as("bin"))
      val hist = px.groupBy("tile", "bin").agg(count(lit(1)).as("cnt"))
      graft.ops.Equalize.claheLut(hist, Seq("tile"), "bin", "cnt",
        tileArea = 300L, clipLimitMilli = 4000L)
    }),
    "q217_clahe_apply" -> ((s, d) => {
      // END-TO-END declarative CLAHE: q216's LUT construction plus the
      // bilinear APPLY stage (OpenCV's −0.5-offset tile interpolation in
      // exact integer arithmetic — weights are rationals over 2tw/2th,
      // one half-even rounding of the blend polynomial over 4·tw·th).
      // Plane: customers 1..1200 as a 40×30 page, 2×2 tiles (tw 20,
      // th 15), same gray formula as q216. EqualizeSpec proves this
      // definition bit-identical to the imperative claheL on dyadic
      // tiles; the oracle replays the integer definition for this
      // non-dyadic geometry.
      val cust = t(s, d, "customer")
        .where(col("c_custkey").between(1, 1200))
      val px = cust.select(lit("pg1").as("img"),
        ((col("c_custkey") - 1) % 40).cast("long").as("x"),
        expr("(c_custkey - 1) div 40").cast("long").as("y"),
        when(col("c_custkey") % 3 === 0, lit(128L))
          .otherwise((col("c_custkey") * 37) % 256).as("v"))
      val hist = px.groupBy(col("img"),
          expr("y div 15").cast("long").as("tile_y"),
          expr("x div 20").cast("long").as("tile_x"),
          col("v").as("bin"))
        .agg(count(lit(1)).as("cnt"))
      val luts = graft.ops.Equalize.claheLut(hist,
        Seq("img", "tile_y", "tile_x"), "bin", "cnt",
        tileArea = 300L, clipLimitMilli = 4000L)
      graft.ops.Equalize.claheApply(px, "img", "x", "y", "v", luts,
        tileW = 20, tileH = 15, tilesX = 2, tilesY = 2)
    })
  )

  def oracleSql: Map[String, String] = Map(
    // q191: the MINIMAX closed form of isotonic regression — no pooling,
    // no stacks: f_i = max_{j<=i} min_{k>=i} avg(y[j..k]) over prefix
    // sums, all in BIGINT (values are non-negative counts, so DuckDB's
    // truncating // equals the engine's floorDiv).
    "q191_isotonic" ->
      """WITH pts AS (
        |  SELECT o_orderpriority AS series,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |      AS x,
        |    count(*) AS y
        |  FROM orders GROUP BY 1, 2),
        |idx AS MATERIALIZED (
        |  SELECT series, x, y,
        |    row_number() OVER (PARTITION BY series ORDER BY x) AS i,
        |    CAST(sum(y) OVER (PARTITION BY series ORDER BY x)
        |      AS BIGINT) AS pre
        |  FROM pts),
        |pre0 AS MATERIALIZED (
        |  SELECT series, 0 AS i, CAST(0 AS BIGINT) AS pre
        |  FROM (SELECT DISTINCT series FROM idx)
        |  UNION ALL SELECT series, i, pre FROM idx),
        |inner_mn AS (
        |  SELECT x.series, x.i, j.i AS j,
        |    min((1000000 * (k.pre - jm.pre)) // (k.i - j.i + 1)) AS v
        |  FROM idx x
        |  JOIN idx j ON j.series = x.series AND j.i <= x.i
        |  JOIN idx k ON k.series = x.series AND k.i >= x.i
        |  JOIN pre0 jm ON jm.series = x.series AND jm.i = j.i - 1
        |  GROUP BY 1, 2, 3),
        |fit AS (
        |  SELECT series, i, CAST(max(v) AS BIGINT) AS fitted_ppm
        |  FROM inner_mn GROUP BY 1, 2)
        |SELECT idx.series, idx.x, idx.y, fit.fitted_ppm
        |FROM idx JOIN fit ON fit.series = idx.series AND fit.i = idx.i"""
        .stripMargin,
    // q192: the DEFINITION of a suffix array — materialize every suffix
    // of the identical concatenation (id order, chr(1) separators) and
    // sort the strings. No doubling, no ranks-of-ranks.
    "q192_suffix_array" ->
      """WITH s AS (
        |  SELECT string_agg(text, chr(1) ORDER BY doc_id) || chr(1) AS str
        |  FROM documents WHERE doc_id < 12),
        |sa AS (
        |  SELECT u.i - 1 AS pos,
        |    row_number() OVER (ORDER BY substr(s.str, CAST(u.i AS INT)))
        |      - 1 AS rank
        |  FROM s, unnest(range(1, length(s.str) + 1)) u(i))
        |SELECT CAST(pos AS BIGINT) AS pos, CAST(rank AS BIGINT) AS rank
        |FROM sa""".stripMargin,
    // q193: LCA by step-at-a-time ancestor recursion — each node's full
    // ancestor closure grown one parent per recursion round, the pair's
    // deepest common ancestor picked by arg_max. No doubling, no chains.
    "q193_taxonomy_lca" ->
      """WITH RECURSIVE par AS (
        |  SELECT 'c' || c_custkey AS id, 'c' || (c_custkey // 2) AS parent
        |  FROM customer WHERE c_custkey > 1 AND c_custkey <= 255),
        |nodes AS (SELECT id FROM par UNION SELECT parent FROM par),
        |anc AS (
        |  SELECT id, id AS anc, 0 AS up FROM nodes
        |  UNION ALL
        |  SELECT anc.id, par.parent, anc.up + 1
        |  FROM anc JOIN par ON par.id = anc.anc),
        |dep AS (SELECT id, max(up) AS depth FROM anc GROUP BY 1),
        |pairs AS (
        |  SELECT 'c' || c_custkey AS a, 'c' || (201 - c_custkey) AS b
        |  FROM customer WHERE c_custkey BETWEEN 2 AND 100),
        |com AS (
        |  SELECT p.a, p.b, x.anc, da.depth AS depth_a, db.depth AS depth_b,
        |         dl.depth AS anc_depth
        |  FROM pairs p
        |  JOIN anc x ON x.id = p.a
        |  JOIN anc y ON y.id = p.b AND y.anc = x.anc
        |  JOIN dep da ON da.id = p.a
        |  JOIN dep db ON db.id = p.b
        |  JOIN dep dl ON dl.id = x.anc),
        |best AS (
        |  SELECT a, b, arg_max(anc, anc_depth) AS lca,
        |    CAST(max(depth_a) AS BIGINT) AS depth_a,
        |    CAST(max(depth_b) AS BIGINT) AS depth_b,
        |    CAST(max(anc_depth) AS BIGINT) AS depth_lca
        |  FROM com GROUP BY a, b)
        |SELECT a, b, lca, depth_a, depth_b, depth_lca,
        |  CAST(CASE WHEN depth_a + depth_b = 0 THEN 1000000
        |       ELSE (2000000 * depth_lca) // (depth_a + depth_b) END
        |    AS BIGINT) AS wu_palmer_ppm
        |FROM best""".stripMargin,
    // q194: the O(n^2) textbook LIS DP — dp[i] = 1 + max(dp[j] : j < i,
    // v[j] < v[i]) — carried as a dp-vector list through a recursive CTE,
    // the inner max replayed by list_transform over all previous indices.
    // No patience tails, no binary search.
    "q194_lis" ->
      """WITH RECURSIVE li AS (
        |  SELECT CAST(l_suppkey AS VARCHAR) AS k,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |      AS sday,
        |    l_orderkey, l_linenumber
        |  FROM lineitem WHERE l_suppkey <= 30 AND l_partkey % 7 = 0),
        |seq AS MATERIALIZED (
        |  SELECT k, list(v ORDER BY sday, l_orderkey, l_linenumber) AS vs,
        |    count(*) AS n
        |  FROM li GROUP BY 1),
        |dp AS (
        |  SELECT k, 0 AS i, CAST([] AS BIGINT[]) AS d FROM seq
        |  UNION ALL
        |  SELECT s.k, dp.i + 1,
        |    list_append(dp.d,
        |      1 + coalesce(list_max(list_transform(range(1, dp.i + 1),
        |        j -> CASE WHEN s.vs[j] < s.vs[dp.i + 1]
        |             THEN dp.d[j] ELSE CAST(0 AS BIGINT) END)), 0))
        |  FROM dp JOIN seq s ON s.k = dp.k AND dp.i < s.n)
        |SELECT dp.k AS key, CAST(s.n AS BIGINT) AS n,
        |  CAST(coalesce(list_max(dp.d), 0) AS BIGINT) AS lis_len
        |FROM dp JOIN seq s ON s.k = dp.k WHERE dp.i = s.n""".stripMargin,
    // q195: the greedy replayed as a recursive CTE whose state is ONE ROW
    // per round carrying the chosen list and the full candidate max-sim
    // vector; the pick is a pure list argmax (tie = min index = min id,
    // ids sorted ascending) against a prebuilt integer similarity matrix.
    "q195_mmr_select" ->
      """WITH RECURSIVE tok AS MATERIALIZED (
        |  SELECT DISTINCT doc_id AS id, t.w AS w
        |  FROM documents, unnest(list_filter(
        |    string_split_regex(trim(text), '\s+'), x -> x <> '')) t(w)
        |  WHERE doc_id BETWEEN 1 AND 60 AND text IS NOT NULL),
        |q AS (
        |  SELECT DISTINCT t.w AS w
        |  FROM documents, unnest(list_filter(
        |    string_split_regex(trim(text), '\s+'), x -> x <> '')) t(w)
        |  WHERE doc_id = 0),
        |ids AS MATERIALIZED (
        |  SELECT id, row_number() OVER (ORDER BY id) AS i
        |  FROM (SELECT DISTINCT id FROM tok)),
        |dims AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ids),
        |relt AS (
        |  SELECT ids.i, CAST(count(q.w) AS BIGINT) AS rel
        |  FROM ids JOIN tok ON tok.id = ids.id
        |  LEFT JOIN q ON q.w = tok.w GROUP BY 1),
        |relv AS (SELECT list(coalesce(relt.rel, 0) ORDER BY gi.i) AS rel
        |  FROM (SELECT i AS i FROM ids) gi LEFT JOIN relt ON relt.i = gi.i),
        |simt AS MATERIALIZED (
        |  SELECT a0.i AS x, b0.i AS y, CAST(count(*) AS BIGINT) AS s
        |  FROM tok a JOIN tok b ON a.w = b.w AND a.id <> b.id
        |  JOIN ids a0 ON a0.id = a.id JOIN ids b0 ON b0.id = b.id
        |  GROUP BY 1, 2),
        |simmat AS (
        |  SELECT list(row ORDER BY x) AS mat FROM (
        |    SELECT gx.i AS x,
        |      list(coalesce(simt.s, 0) ORDER BY gy.i) AS row
        |    FROM ids gx JOIN ids gy ON true
        |    LEFT JOIN simt ON simt.x = gx.i AND simt.y = gy.i
        |    GROUP BY 1)),
        |r AS (
        |  SELECT 0 AS round, CAST([] AS BIGINT[]) AS chosen,
        |    list_transform(range(1, m + 1), z -> CAST(0 AS BIGINT)) AS ms,
        |    CAST(NULL AS BIGINT) AS pick_made, CAST(NULL AS BIGINT) AS ms_at_pick
        |  FROM dims
        |  UNION ALL
        |  SELECT r.round + 1,
        |    list_append(r.chosen, list_min(list_filter(range(1, dims.m + 1), j -> NOT list_contains(r.chosen, j) AND relv.rel[j] - r.ms[j] = list_max(list_transform(range(1, dims.m + 1), j -> CASE WHEN list_contains(r.chosen, j) THEN NULL ELSE relv.rel[j] - r.ms[j] END))))),
        |    list_transform(range(1, dims.m + 1), j ->
        |      CASE WHEN list_contains(r.chosen, j) OR j = list_min(list_filter(range(1, dims.m + 1), j -> NOT list_contains(r.chosen, j) AND relv.rel[j] - r.ms[j] = list_max(list_transform(range(1, dims.m + 1), j -> CASE WHEN list_contains(r.chosen, j) THEN NULL ELSE relv.rel[j] - r.ms[j] END)))) THEN r.ms[j]
        |           ELSE greatest(r.ms[j], simmat.mat[list_min(list_filter(range(1, dims.m + 1), j -> NOT list_contains(r.chosen, j) AND relv.rel[j] - r.ms[j] = list_max(list_transform(range(1, dims.m + 1), j -> CASE WHEN list_contains(r.chosen, j) THEN NULL ELSE relv.rel[j] - r.ms[j] END))))][j]) END),
        |    list_min(list_filter(range(1, dims.m + 1), j -> NOT list_contains(r.chosen, j) AND relv.rel[j] - r.ms[j] = list_max(list_transform(range(1, dims.m + 1), j -> CASE WHEN list_contains(r.chosen, j) THEN NULL ELSE relv.rel[j] - r.ms[j] END)))),
        |    r.ms[list_min(list_filter(range(1, dims.m + 1), j -> NOT list_contains(r.chosen, j) AND relv.rel[j] - r.ms[j] = list_max(list_transform(range(1, dims.m + 1), j -> CASE WHEN list_contains(r.chosen, j) THEN NULL ELSE relv.rel[j] - r.ms[j] END))))]
        |  FROM r, dims, relv, simmat
        |  WHERE r.round < 12)
        |SELECT CAST(r.round AS BIGINT) AS rank,
        |  CAST(ids.id AS VARCHAR) AS doc_id,
        |  relv.rel[r.pick_made] AS rel, r.ms_at_pick AS max_sim,
        |  relv.rel[r.pick_made] - r.ms_at_pick AS score
        |FROM r, relv JOIN ids ON ids.i = r.pick_made
        |WHERE r.round >= 1""".stripMargin,
    // q196: the SEQUENTIAL McVitie replay — one proposal per recursion
    // step, the smallest free proposer inlined as a list argmin, pointer
    // and fiancé vectors carried as list state. No rounds, no argmax
    // aggregates.
    "q196_stable_match" ->
      """WITH RECURSIVE base AS (
        |  SELECT c.c_custkey AS mk, s.s_suppkey AS wk,
        |    (c.c_custkey * s.s_suppkey * 5) % 251 AS msc,
        |    (c.c_custkey * s.s_suppkey * 7) % 251 AS wsc
        |  FROM customer c, supplier s
        |  WHERE c.c_custkey BETWEEN 1 AND 16 AND s.s_suppkey BETWEEN 1 AND 16),
        |mp AS (SELECT mk, list(wk ORDER BY msc DESC) AS ws FROM base GROUP BY 1),
        |mpref AS (SELECT list(ws ORDER BY mk) AS mat FROM mp),
        |wv AS (SELECT wk, list(wsc ORDER BY mk) AS ms FROM base GROUP BY 1),
        |wmat AS (SELECT list(ms ORDER BY wk) AS mat FROM wv),
        |r AS (
        |  SELECT 0 AS step,
        |    list_transform(range(1, 17), z -> CAST(1 AS BIGINT)) AS nextv,
        |    list_transform(range(1, 17), z -> CAST(0 AS BIGINT)) AS fiance
        |  UNION ALL
        |  SELECT r.step + 1,
        |    list_transform(range(1, 17), i ->
        |      CASE WHEN i = list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16)) THEN r.nextv[i] + 1 ELSE r.nextv[i] END),
        |    CASE WHEN (r.fiance[mpref.mat[list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))][r.nextv[list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))]]] = 0 OR wmat.mat[mpref.mat[list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))][r.nextv[list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))]]][list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))] > wmat.mat[mpref.mat[list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))][r.nextv[list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))]]][r.fiance[mpref.mat[list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))][r.nextv[list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))]]]])
        |      THEN list_transform(range(1, 17), j ->
        |        CASE WHEN j = mpref.mat[list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))][r.nextv[list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16))]] THEN CAST(list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16)) AS BIGINT) ELSE r.fiance[j] END)
        |      ELSE r.fiance END
        |  FROM r, mpref, wmat
        |  WHERE list_min(list_filter(range(1, 17), i -> NOT list_contains(r.fiance, i) AND r.nextv[i] <= 16)) IS NOT NULL),
        |fin AS (SELECT fiance FROM r ORDER BY step DESC LIMIT 1)
        |SELECT 'c' || fiance[j] AS m, 's' || j AS w
        |FROM fin, unnest(range(1, 17)) u(j)
        |WHERE fiance[j] <> 0""".stripMargin,
    // q197: the same corpus (+ planted excerpts), blocking and directed
    // ppm scoring replayed declaratively in SQL — q20's shingle shapes
    // with an asymmetric denominator.
    "q197_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    array_to_string(list_filter(
        |      string_split_regex(trim(text), '\s+'),
        |      x -> x <> '')[1:12], ' ')
        |  FROM documents WHERE doc_id < 15),
        |words AS (
        |  SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS w
        |  FROM corpus),
        |sh AS (
        |  SELECT DISTINCT id, shingle FROM (
        |    SELECT id, array_to_string(w[i:i+4], ' ') AS shingle
        |    FROM words, unnest(range(1, greatest(len(w) - 4, 0) + 1))
        |      AS t(i)
        |    WHERE len(w) >= 5)),
        |sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
        |kept AS (SELECT id, shingle FROM sh
        |         WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle
        |                           HAVING COUNT(*) <= 50)),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM kept a JOIN kept b ON a.shingle = b.shingle
        |    AND a.id < b.id),
        |inter AS (
        |  SELECT c.id_a, c.id_b, COUNT(*) AS common, sa.sz AS sz_a,
        |    sb.sz AS sz_b
        |  FROM cand c
        |  JOIN sh a ON a.id = c.id_a
        |  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
        |  JOIN sizes sa ON sa.id = c.id_a JOIN sizes sb ON sb.id = c.id_b
        |  GROUP BY 1, 2, 4, 5),
        |dir AS (
        |  SELECT id_a AS id, id_b AS other_id, common, sz_a AS n_shingles
        |  FROM inter
        |  UNION ALL
        |  SELECT id_b, id_a, common, sz_b FROM inter)
        |SELECT id, other_id, common,
        |  CAST(n_shingles AS BIGINT) AS n_shingles,
        |  CAST((1000000 * common) // n_shingles AS BIGINT)
        |    AS containment_ppm
        |FROM dir
        |WHERE (1000000 * common) // n_shingles >= 500000""".stripMargin,
    // q198: every itemset of size 1-3 enumerated DIRECTLY by unpruned
    // self-joins and counted — no level-wise candidate generation, no
    // Apriori projection anywhere; downward closure is the theorem that
    // makes this agree with the engine's pruned level-wise walk.
    "q198_freq_itemsets" ->
      """WITH b AS (
        |  SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS bk,
        |    'p' || CAST(l_partkey % 37 AS VARCHAR) AS it
        |  FROM lineitem),
        |f1 AS (SELECT it, count(*) AS c FROM b GROUP BY 1),
        |p2 AS (SELECT x.it AS i1, y.it AS i2, count(*) AS c
        |       FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
        |       GROUP BY 1, 2),
        |p3 AS (SELECT x.it AS i1, y.it AS i2, z.it AS i3, count(*) AS c
        |       FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
        |            JOIN b z ON x.bk = z.bk AND y.it < z.it
        |       GROUP BY 1, 2, 3)
        |SELECT it AS itemset, CAST(1 AS INTEGER) AS size, c AS support
        |FROM f1 WHERE c >= 30
        |UNION ALL
        |SELECT i1 || '|' || i2, CAST(2 AS INTEGER), c FROM p2 WHERE c >= 30
        |UNION ALL
        |SELECT i1 || '|' || i2 || '|' || i3, CAST(3 AS INTEGER), c
        |FROM p3 WHERE c >= 30""".stripMargin,
    // q199: the rule scores computed definitionally — supports by direct
    // counting, conf/lift by HUGEINT-promoted integer floor division.
    "q199_assoc_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS bk,
        |    'p' || CAST(l_partkey % 37 AS VARCHAR) AS it
        |  FROM lineitem),
        |n AS (SELECT count(DISTINCT bk) AS n FROM b),
        |f1 AS (SELECT it, count(*) AS c FROM b GROUP BY 1),
        |p2 AS (SELECT x.it AS i1, y.it AS i2, count(*) AS c
        |       FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
        |       GROUP BY 1, 2 HAVING count(*) >= 60),
        |dir AS (SELECT i1 AS x, i2 AS y, c FROM p2
        |        UNION ALL SELECT i2, i1, c FROM p2)
        |SELECT dir.x AS antecedent, dir.y AS consequent, dir.c AS support,
        |  CAST((CAST(1000000 AS HUGEINT) * dir.c) // sx.c AS BIGINT)
        |    AS conf_ppm,
        |  CAST((CAST(1000000 AS HUGEINT) * dir.c * n.n) // (sx.c * sy.c)
        |    AS BIGINT) AS lift_ppm
        |FROM dir, n
        |JOIN f1 sx ON sx.it = dir.x
        |JOIN f1 sy ON sy.it = dir.y""".stripMargin,
    // q200: the SEQUENTIAL pivot scan, literally — vertices indexed once,
    // priorities and adjacency carried as lists, one recursion step per
    // pivot: the unassigned vertex with the minimum (hash, id) priority
    // pivots and its unassigned neighbors take its label. No MIS, no
    // rounds — the other side of the Blelloch–Fineman–Shun equivalence.
    "q200_corr_clustering" ->
      s"""WITH RECURSIVE edir AS (
        |  SELECT 'c' || c_custkey AS src, 'c' || (c_custkey // 2) AS dst
        |  FROM customer WHERE c_custkey > 1 AND c_custkey <= 256
        |  UNION ALL
        |  SELECT 'c' || c_custkey, 'c' || (c_custkey - 1)
        |  FROM customer
        |  WHERE c_custkey % 5 = 0 AND c_custkey > 1 AND c_custkey <= 256),
        |und AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
        |        FROM edir WHERE src <> dst),
        |v AS (SELECT DISTINCT id FROM
        |        (SELECT x AS id FROM und UNION ALL SELECT y FROM und)),
        |vid AS (SELECT id, CAST(row_number() OVER (ORDER BY id) AS BIGINT)
        |          AS ix FROM v),
        |nn AS (SELECT count(*) AS n FROM vid),
        |pr AS (SELECT list(${kmvHashSql("id")} ORDER BY ix) AS h,
        |              list(id ORDER BY ix) AS id FROM vid),
        |sym AS (SELECT x AS a, y AS b FROM und UNION ALL SELECT y, x FROM und),
        |adj0 AS (SELECT va.ix AS ai, list(vb.ix) AS nbs
        |         FROM sym JOIN vid va ON va.id = sym.a
        |              JOIN vid vb ON vb.id = sym.b
        |         GROUP BY 1),
        |am AS (SELECT list(nbs ORDER BY ai) AS nb FROM adj0),
        |r AS (
        |  SELECT 0 AS step,
        |    list_transform(range(1, nn.n + 1), z -> CAST(0 AS BIGINT)) AS cl
        |  FROM nn
        |  UNION ALL
        |  SELECT r.step + 1,
        |    list_transform(range(1, nn.n + 1), j ->
        |      CASE WHEN r.cl[j] <> 0 THEN r.cl[j]
        |           WHEN j = list_reduce(
        |               list_filter(range(1, nn.n + 1), i -> r.cl[i] = 0),
        |               (x, y) -> CASE WHEN pr.h[y] < pr.h[x]
        |                 OR (pr.h[y] = pr.h[x] AND pr.id[y] < pr.id[x])
        |                 THEN y ELSE x END)
        |             OR list_contains(am.nb[list_reduce(
        |               list_filter(range(1, nn.n + 1), i -> r.cl[i] = 0),
        |               (x, y) -> CASE WHEN pr.h[y] < pr.h[x]
        |                 OR (pr.h[y] = pr.h[x] AND pr.id[y] < pr.id[x])
        |                 THEN y ELSE x END)], j)
        |           THEN list_reduce(
        |               list_filter(range(1, nn.n + 1), i -> r.cl[i] = 0),
        |               (x, y) -> CASE WHEN pr.h[y] < pr.h[x]
        |                 OR (pr.h[y] = pr.h[x] AND pr.id[y] < pr.id[x])
        |                 THEN y ELSE x END)
        |           ELSE CAST(0 AS BIGINT) END)
        |  FROM r, nn, pr, am
        |  WHERE len(list_filter(range(1, nn.n + 1), i -> r.cl[i] = 0)) > 0),
        |fin AS (SELECT cl FROM r ORDER BY step DESC LIMIT 1)
        |SELECT pr.id[j] AS id, pr.id[fin.cl[j]] AS cluster
        |FROM fin, pr, nn, unnest(range(1, nn.n + 1)) u(j)""".stripMargin,
    // q201: the definitional meta-blocking SQL — distinct assignments,
    // block-size purge, pair CBS count, symmetric incidence aggregates,
    // the same integer-exact mean test.
    "q201_meta_blocking" ->
      """WITH a AS (
        |  SELECT 'c' || c_custkey AS rec,
        |    'k11_' || CAST(c_custkey % 11 AS VARCHAR) AS blk
        |  FROM customer WHERE c_custkey <= 120
        |  UNION ALL
        |  SELECT 'c' || c_custkey, 'k13_' || CAST(c_custkey % 13 AS VARCHAR)
        |  FROM customer WHERE c_custkey <= 120
        |  UNION ALL
        |  SELECT 'c' || c_custkey, 'k17_' || CAST(c_custkey % 17 AS VARCHAR)
        |  FROM customer WHERE c_custkey <= 120),
        |b AS (SELECT DISTINCT blk, rec FROM a),
        |keptb AS (SELECT blk FROM b GROUP BY 1 HAVING count(*) <= 1000),
        |k AS (SELECT b.blk, b.rec FROM b JOIN keptb USING (blk)),
        |w AS (SELECT x.rec AS ra, y.rec AS rb, count(*) AS w
        |      FROM k x JOIN k y ON x.blk = y.blk AND x.rec < y.rec
        |      GROUP BY 1, 2),
        |inc AS (SELECT ra AS rec, w FROM w UNION ALL SELECT rb, w FROM w),
        |nd AS (SELECT rec, count(*) AS deg, sum(w) AS s FROM inc GROUP BY 1)
        |SELECT w.ra AS rec_a, w.rb AS rec_b, w.w AS weight
        |FROM w JOIN nd na ON na.rec = w.ra JOIN nd nb ON nb.rec = w.rb
        |WHERE w.w * na.deg >= na.s OR w.w * nb.deg >= nb.s""".stripMargin,
    // q202: the same H recurrence evaluated ROW BY ROW in a recursive CTE
    // — one CTE row per DP row, the row carried as a list, the in-row
    // left-dependency replayed by a list_reduce whose accumulator IS the
    // row being built (q190's scaffold with the zero floor, gap arms and
    // an explicit all-cells (h DESC, i, j) rank for the argmax).
    "q202_sw_local" ->
      """WITH RECURSIVE t AS (
        |  SELECT CAST(x.doc_id AS VARCHAR) AS key,
        |    list_filter(string_split_regex(trim(x.text), '\s+'),
        |      w -> w <> '') AS xt,
        |    list_filter(string_split_regex(trim(y.text), '\s+'),
        |      w -> w <> '') AS yt
        |  FROM documents x JOIN documents y ON y.doc_id = x.doc_id + 1
        |  WHERE x.doc_id < 80 AND y.doc_id < 80
        |    AND x.text IS NOT NULL AND y.text IS NOT NULL),
        |dims AS MATERIALIZED (
        |  SELECT key, xt[1:30] AS lt,
        |    yt[1:10] || xt[12:18] || yt[11:15] AS rt,
        |    len(xt[1:30]) AS n,
        |    len(yt[1:10] || xt[12:18] || yt[11:15]) AS m
        |  FROM t),
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
        |                THEN CAST(2 AS BIGINT)
        |                ELSE CAST(-1 AS BIGINT) END])),
        |      (acc, x) -> list_append(acc,
        |        greatest(CAST(0 AS BIGINT), x[1] + x[3], x[2] - 1,
        |          acc[-1] - 1)))
        |  FROM dp JOIN dims d ON d.key = dp.key AND dp.i < d.n),
        |cells AS (
        |  SELECT dp.key, dp.i, j, dp.v[j + 1] AS h
        |  FROM dp JOIN dims d ON d.key = dp.key,
        |       unnest(range(1, d.m + 1)) u(j)
        |  WHERE dp.i >= 1),
        |best AS (
        |  SELECT key, i, j, h,
        |    row_number() OVER (PARTITION BY key
        |                       ORDER BY h DESC, i ASC, j ASC) AS rn
        |  FROM cells)
        |SELECT d.key, coalesce(CASE WHEN b.h > 0 THEN b.h END, 0)
        |    AS best_score,
        |  coalesce(CASE WHEN b.h > 0 THEN b.i END, 0) AS end_left,
        |  coalesce(CASE WHEN b.h > 0 THEN CAST(b.j AS BIGINT) END, 0)
        |    AS end_right,
        |  CAST(d.n AS BIGINT) AS n_left, CAST(d.m AS BIGINT) AS n_right
        |FROM dims d LEFT JOIN best b ON b.key = d.key AND b.rn = 1""".stripMargin,
    // q204: bridges evaluated BY DEFINITION (q186's per-edge-exclusion
    // product-graph BFS), deleted, then components by a plain
    // reachability recursion with min labels — no spanning forest, no
    // large/small stars anywhere.
    "q204_two_edge_cc" ->
      """WITH RECURSIVE und AS (
        |  SELECT least('c' || c_custkey, 'c' || (c_custkey // 2)) AS a,
        |         greatest('c' || c_custkey, 'c' || (c_custkey // 2)) AS b
        |  FROM customer WHERE c_custkey > 1 AND c_custkey <= 256
        |  UNION
        |  SELECT least('c' || c_custkey, 'c' || (c_custkey - 1)),
        |         greatest('c' || c_custkey, 'c' || (c_custkey - 1))
        |  FROM customer
        |  WHERE c_custkey % 6 = 0 AND c_custkey > 1 AND c_custkey <= 256),
        |sym AS (SELECT a AS x, b AS y FROM und
        |        UNION ALL SELECT b, a FROM und),
        |r AS (
        |  SELECT a AS ea, b AS eb, a AS node FROM und
        |  UNION
        |  SELECT r.ea, r.eb, sym.y
        |  FROM r JOIN sym ON sym.x = r.node
        |  WHERE NOT (least(sym.x, sym.y) = r.ea
        |             AND greatest(sym.x, sym.y) = r.eb)),
        |br AS (
        |  SELECT u.a, u.b FROM und u
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM r
        |    WHERE r.ea = u.a AND r.eb = u.b AND r.node = u.b)),
        |rest AS (
        |  SELECT u.a, u.b FROM und u
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM br WHERE br.a = u.a AND br.b = u.b)),
        |rsym AS (SELECT a AS x, b AS y FROM rest
        |         UNION ALL SELECT b, a FROM rest),
        |reach AS (
        |  SELECT x AS id, x AS node FROM rsym
        |  UNION
        |  SELECT reach.id, rsym.y FROM reach JOIN rsym ON rsym.x = reach.node),
        |comp AS (SELECT id, min(node) AS component FROM reach GROUP BY 1),
        |verts AS (SELECT DISTINCT id FROM
        |  (SELECT a AS id FROM und UNION ALL SELECT b FROM und))
        |SELECT v.id, coalesce(comp.component, v.id) AS component
        |FROM verts v LEFT JOIN comp ON comp.id = v.id""".stripMargin,
    // q203: the BRUTE cross join — every (token, term) pair scored by
    // DuckDB's independent damerau_levenshtein implementation, no
    // deletion neighborhood anywhere; the same (dist, freq DESC, term)
    // total order picks the correction.
    "q203_spell_correct" ->
      """WITH dict AS (
        |  SELECT c_name AS w, count(*) AS f FROM customer
        |  WHERE c_custkey <= 2000 GROUP BY 1),
        |tok AS (
        |  SELECT DISTINCT substr(c_name, 1, 16) || substr(c_name, 18, 1)
        |      || substr(c_name, 17, 1) AS token
        |  FROM customer WHERE c_custkey % 11 = 0 AND c_custkey <= 2000),
        |cand AS (
        |  SELECT t.token, d.w AS term,
        |    CAST(damerau_levenshtein(t.token, d.w) AS INTEGER) AS dist,
        |    d.f
        |  FROM tok t CROSS JOIN dict d
        |  WHERE damerau_levenshtein(t.token, d.w) <= 2),
        |best AS (
        |  SELECT token, term, dist, f,
        |    row_number() OVER (PARTITION BY token
        |                       ORDER BY dist, f DESC, term) AS rn
        |  FROM cand)
        |SELECT token, term AS correction, dist, f AS freq
        |FROM best WHERE rn = 1""".stripMargin,
    // q205: the Kneser–Ney table computed definitionally — token lists,
    // positional bigram pairs, the four count aggregates, and the exact
    // rational floored in HUGEINT. Same tokenization as the engine
    // (lowercased whitespace split, ≥ 2 tokens).
    "q205_kneser_ney" ->
      """WITH tk AS (
        |  SELECT string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |pairs AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM tk, unnest(range(1, len(t))) u(i)
        |  WHERE len(t) >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS n FROM pairs GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
        |t1 AS (SELECT w1, count(*) AS t1 FROM c12 GROUP BY 1),
        |r2 AS (SELECT w2, count(*) AS r2 FROM c12 GROUP BY 1),
        |nb AS (SELECT count(*) AS nb FROM c12)
        |SELECT c12.w1, c12.w2, c12.n,
        |  CAST((CAST(1000000 AS HUGEINT) *
        |        (greatest(4 * c12.n - 3, 0) * nb.nb
        |         + CAST(3 AS HUGEINT) * t1.t1 * r2.r2))
        |    // (CAST(4 AS HUGEINT) * c1.c1 * nb.nb) AS BIGINT) AS p_ppm
        |FROM c12
        |JOIN c1 USING (w1) JOIN t1 USING (w1) JOIN r2 USING (w2)
        |CROSS JOIN nb""".stripMargin,
    // q206: the definitional SoftTFIDF computation — token/df counts,
    // the jw_ppm gate and (jw DESC, token ASC) per-token argmax as a
    // window rank, HUGEINT term floors, plain integer sums; DuckDB's
    // own jaro_winkler_similarity supplies the float (bit-identical to
    // the engine's expression on ASCII, q128-proven).
    "q206_soft_tfidf" ->
      """WITH recs AS (
        |  SELECT 'p' || p_partkey AS id, p_name AS text FROM part
        |  UNION ALL
        |  SELECT 'm' || p_partkey,
        |    array_to_string(list_transform(string_split(p_name, ' '),
        |      w -> substr(w, 1, 1) || substr(w, 3)), ' ')
        |  FROM part WHERE p_partkey % 3 = 0),
        |toks AS (
        |  SELECT id, tok, count(*) AS tf FROM (
        |    SELECT id, unnest(string_split_regex(lower(trim(text)), '\s+'))
        |      AS tok FROM recs)
        |  WHERE tok <> '' GROUP BY 1, 2),
        |dfx AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1),
        |prs AS (
        |  SELECT 'p' || p_partkey AS id_a, 'm' || p_partkey AS id_b
        |  FROM part WHERE p_partkey % 3 = 0),
        |ab AS (
        |  SELECT p.id_a, p.id_b, a.tok AS ta, a.tf AS tfa, da.df AS dfa,
        |    b.tok AS tb, b.tf AS tfb, db.df AS dfb,
        |    CAST(floor(jaro_winkler_similarity(a.tok, b.tok) * 1000000)
        |      AS BIGINT) AS jw
        |  FROM prs p
        |  JOIN toks a ON a.id = p.id_a JOIN dfx da ON da.tok = a.tok
        |  JOIN toks b ON b.id = p.id_b JOIN dfx db ON db.tok = b.tok),
        |gated AS (
        |  SELECT *, row_number() OVER (PARTITION BY id_a, id_b, ta
        |      ORDER BY jw DESC, tb ASC) AS rn
        |  FROM ab WHERE jw >= 850000),
        |terms AS (
        |  SELECT id_a, id_b,
        |    (CAST(tfa AS HUGEINT) * tfb * jw * 1000000)
        |      // (CAST(dfa AS HUGEINT) * dfb) AS term
        |  FROM gated WHERE rn = 1)
        |SELECT id_a, id_b, CAST(sum(term) AS BIGINT) AS score,
        |  count(*) AS n_matched
        |FROM terms GROUP BY 1, 2""".stripMargin,
    // q207: the rule definitions evaluated directly — distinct triples,
    // z-join body pairs, pair-set intersections with every head, exact
    // HUGEINT ppm floors, same gates. No hub machinery (nothing exceeds
    // the engine's default cap on this KG, so the gate is identity).
    "q207_rule_mining" ->
      """WITH tr AS (
        |  SELECT DISTINCT * FROM (
        |    SELECT 'o' || o_orderkey AS s, 'hasCustomer' AS p,
        |      'c' || o_custkey AS o FROM orders
        |    UNION ALL
        |    SELECT 'c' || c_custkey, 'inNation', 'n' || c_nationkey
        |    FROM customer
        |    UNION ALL
        |    SELECT 'n' || n_nationkey, 'inRegion', 'r' || n_regionkey
        |    FROM nation
        |    UNION ALL
        |    SELECT 'o' || o_orderkey, 'orderNation', 'n' || c_nationkey
        |    FROM orders JOIN customer ON c_custkey = o_custkey
        |    WHERE o_orderkey % 10 <> 0
        |    UNION ALL
        |    SELECT 'c' || c_custkey, 'custRegion', 'r' || n_regionkey
        |    FROM customer JOIN nation ON n_nationkey = c_nationkey
        |    WHERE c_custkey % 5 <> 0)),
        |body AS (
        |  SELECT DISTINCT t1.p AS r1, t2.p AS r2, t1.s AS x, t2.o AS y
        |  FROM tr t1 JOIN tr t2 ON t2.s = t1.o),
        |bn AS (SELECT r1, r2, count(*) AS body_pairs FROM body GROUP BY 1, 2),
        |hn AS (SELECT p AS head, count(*) AS head_pairs FROM tr GROUP BY 1),
        |sup AS (
        |  SELECT b.r1, b.r2, h.p AS head, count(*) AS support
        |  FROM body b JOIN tr h ON h.s = b.x AND h.o = b.y
        |  GROUP BY 1, 2, 3)
        |SELECT sup.r1, sup.r2, sup.head, sup.support, bn.body_pairs,
        |  CAST((CAST(1000000 AS HUGEINT) * sup.support) // bn.body_pairs
        |    AS BIGINT) AS conf_ppm,
        |  CAST((CAST(1000000 AS HUGEINT) * sup.support) // hn.head_pairs
        |    AS BIGINT) AS hc_ppm
        |FROM sup JOIN bn USING (r1, r2) JOIN hn USING (head)
        |WHERE sup.support >= 50
        |  AND (CAST(1000000 AS HUGEINT) * sup.support) // bn.body_pairs
        |      >= 100000""".stripMargin,
    // q208: NO incrementality anywhere — one flat reachability recursion
    // over the union of base and batch edges, min labels; agreement IS
    // the incremental == full-rebuild law.
    "q208_incremental_cc" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'c' || c_custkey AS a, 'c' || (c_custkey // 2) AS b
        |  FROM customer WHERE c_custkey > 7 AND c_custkey <= 200
        |  UNION ALL
        |  SELECT 'c' || c_custkey, 'c' || (c_custkey - 2)
        |  FROM customer
        |  WHERE c_custkey % 9 = 0 AND c_custkey > 7 AND c_custkey <= 200
        |  UNION ALL
        |  SELECT 'c' || c_custkey, 'c' || (c_custkey // 2)
        |  FROM customer WHERE c_custkey > 200 AND c_custkey <= 230),
        |sym AS (SELECT a AS x, b AS y FROM e WHERE a <> b
        |        UNION ALL SELECT b, a FROM e WHERE a <> b),
        |reach AS (
        |  SELECT x AS id, x AS node FROM sym
        |  UNION
        |  SELECT reach.id, sym.y FROM reach JOIN sym ON sym.x = reach.node)
        |SELECT id, min(node) AS component FROM reach GROUP BY 1""".stripMargin,
    // q209: votes computed definitionally (per-method self-join + count),
    // the majority edge set closed by a reachability recursion, and
    // never-paired customers backfilled as singletons.
    "q209_consensus_clusters" ->
      """WITH RECURSIVE l AS (
        |  SELECT 'nat' AS m, 'c' || c_custkey AS i,
        |    'n' || c_nationkey AS g
        |  FROM customer WHERE c_custkey <= 600
        |  UNION ALL
        |  SELECT 'seg', 'c' || c_custkey, CAST(c_mktsegment AS VARCHAR)
        |  FROM customer WHERE c_custkey <= 600
        |  UNION ALL
        |  SELECT 'bkt', 'c' || c_custkey, CAST(c_custkey % 40 AS VARCHAR)
        |  FROM customer WHERE c_custkey <= 600),
        |votes AS (
        |  SELECT x.i AS a, y.i AS b, count(DISTINCT x.m) AS v
        |  FROM l x JOIN l y ON x.m = y.m AND x.g = y.g AND x.i < y.i
        |  GROUP BY 1, 2),
        |e AS (SELECT a, b FROM votes WHERE v >= 2),
        |sym AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
        |reach AS (
        |  SELECT x AS id, x AS node FROM sym
        |  UNION
        |  SELECT reach.id, sym.y FROM reach JOIN sym ON sym.x = reach.node),
        |comp AS (SELECT id, min(node) AS c FROM reach GROUP BY 1),
        |items AS (SELECT DISTINCT i FROM l)
        |SELECT items.i AS item, coalesce(comp.c, items.i) AS consensus
        |FROM items LEFT JOIN comp ON comp.id = items.i""".stripMargin,
    // q210: the identical DP evaluated as four UNROLLED join stages —
    // segment costs as HUGEINT fractions (num, den), each stage's
    // argmin the NOT-EXISTS cross-multiplied (cost, cut) rule (the
    // engine's earliest-argmin), boundaries recovered by a back-pointer
    // walk. Every key here has ≥ 4 points (≈40 customers per nation).
    "q210_voptimal_hist" ->
      """WITH pts AS (
        |  SELECT 'n' || c_nationkey AS k, CAST(c_custkey AS BIGINT) AS p,
        |    CAST(floor(c_acctbal) AS BIGINT) AS v
        |  FROM customer WHERE c_custkey <= 1000),
        |ord AS (SELECT k, p, v,
        |    CAST(row_number() OVER (PARTITION BY k ORDER BY p, v)
        |      AS BIGINT) AS i
        |  FROM pts),
        |cnt AS (SELECT k, count(*) AS nn FROM ord GROUP BY 1),
        |pre AS (SELECT k, i,
        |    sum(v) OVER w AS s1, sum(v * v) OVER w AS s2
        |  FROM ord
        |  WINDOW w AS (PARTITION BY k ORDER BY i
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |pre0 AS (SELECT k, i, s1, s2 FROM pre
        |         UNION ALL
        |         SELECT k, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |           CAST(0 AS BIGINT) FROM cnt),
        |seg AS (
        |  SELECT a.k, a.i AS lo, b.i AS hi,
        |    CAST(b.i - a.i AS HUGEINT) * (b.s2 - a.s2)
        |      - CAST(b.s1 - a.s1 AS HUGEINT) * (b.s1 - a.s1) AS num,
        |    CAST(b.i - a.i AS HUGEINT) AS den
        |  FROM pre0 a JOIN pre0 b ON b.k = a.k AND b.i > a.i),
        |dp1 AS (SELECT k, hi AS j, num, den FROM seg WHERE lo = 0),
        |c2 AS (SELECT d.k, s.hi AS j,
        |    d.num * s.den + s.num * d.den AS num, d.den * s.den AS den,
        |    d.j AS bk
        |  FROM dp1 d JOIN seg s ON s.k = d.k AND s.lo = d.j),
        |dp2 AS (SELECT * FROM c2 d WHERE NOT EXISTS (
        |  SELECT 1 FROM c2 e WHERE e.k = d.k AND e.j = d.j
        |    AND (e.num * d.den < d.num * e.den
        |         OR (e.num * d.den = d.num * e.den AND e.bk < d.bk)))),
        |c3 AS (SELECT d.k, s.hi AS j,
        |    d.num * s.den + s.num * d.den AS num, d.den * s.den AS den,
        |    d.j AS bk
        |  FROM dp2 d JOIN seg s ON s.k = d.k AND s.lo = d.j),
        |dp3 AS (SELECT * FROM c3 d WHERE NOT EXISTS (
        |  SELECT 1 FROM c3 e WHERE e.k = d.k AND e.j = d.j
        |    AND (e.num * d.den < d.num * e.den
        |         OR (e.num * d.den = d.num * e.den AND e.bk < d.bk)))),
        |c4 AS (SELECT d.k, s.hi AS j,
        |    d.num * s.den + s.num * d.den AS num, d.den * s.den AS den,
        |    d.j AS bk
        |  FROM dp3 d JOIN seg s ON s.k = d.k AND s.lo = d.j),
        |dp4 AS (SELECT * FROM c4 d WHERE NOT EXISTS (
        |  SELECT 1 FROM c4 e WHERE e.k = d.k AND e.j = d.j
        |    AND (e.num * d.den < d.num * e.den
        |         OR (e.num * d.den = d.num * e.den AND e.bk < d.bk)))),
        |walk AS (
        |  SELECT d4.k, d2.bk AS c1v, d3.bk AS c2v, d4.bk AS c3v
        |  FROM dp4 d4
        |  JOIN cnt ON cnt.k = d4.k AND d4.j = cnt.nn
        |  JOIN dp3 d3 ON d3.k = d4.k AND d3.j = d4.bk
        |  JOIN dp2 d2 ON d2.k = d3.k AND d2.j = d3.bk),
        |cuts AS (
        |  SELECT k, 1 AS bucket, CAST(0 AS BIGINT) AS lo, c1v AS hi
        |  FROM walk
        |  UNION ALL SELECT k, 2, c1v, c2v FROM walk
        |  UNION ALL SELECT k, 3, c2v, c3v FROM walk
        |  UNION ALL SELECT walk.k, 4, c3v, cnt.nn
        |  FROM walk JOIN cnt ON cnt.k = walk.k)
        |SELECT c.k AS key, CAST(c.bucket AS INTEGER) AS bucket,
        |  plo.p AS start_pos, phi.p AS end_pos,
        |  CAST(c.hi - c.lo AS BIGINT) AS n,
        |  CAST(shi.s1 - slo.s1 AS BIGINT) AS vsum,
        |  CAST((1000000 * s.num) // s.den AS BIGINT) AS sse_ppm
        |FROM cuts c
        |JOIN seg s ON s.k = c.k AND s.lo = c.lo AND s.hi = c.hi
        |JOIN ord plo ON plo.k = c.k AND plo.i = c.lo + 1
        |JOIN ord phi ON phi.k = c.k AND phi.i = c.hi
        |JOIN pre0 slo ON slo.k = c.k AND slo.i = c.lo
        |JOIN pre0 shi ON shi.k = c.k AND shi.i = c.hi""".stripMargin,
    // q211: the same rationals, accumulated differently — hit fractions
    // i/rank summed by an ASSOCIATIVE list_reduce fraction-add (engine:
    // a sequential BigInt fold), HUGEINT floors, LEFT JOIN nulls for
    // zero-relevant queries.
    "q211_retrieval_eval" ->
      """WITH li AS (
        |  SELECT CAST(l_orderkey AS VARCHAR) AS q,
        |    CAST(row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity)
        |      AS INTEGER) AS r,
        |    (l_partkey % 3 = 0) AS rel
        |  FROM lineitem WHERE l_orderkey <= 300),
        |agg AS (SELECT q, count(*) AS n_ranked FROM li GROUP BY 1),
        |hits AS (
        |  SELECT q, r, row_number() OVER (PARTITION BY q ORDER BY r) AS i
        |  FROM li WHERE rel),
        |hl AS (
        |  SELECT q, count(*) AS n_rel, min(r) AS first_hit,
        |    count(*) FILTER (WHERE r <= 3) AS hk,
        |    list({'n': CAST(i AS HUGEINT), 'd': CAST(r AS HUGEINT)}
        |      ORDER BY r) AS terms
        |  FROM hits GROUP BY 1),
        |apx AS (
        |  SELECT q, n_rel, first_hit, hk,
        |    list_reduce(
        |      list_prepend({'n': CAST(0 AS HUGEINT), 'd': CAST(1 AS HUGEINT)},
        |        terms),
        |      (a, b) -> {'n': a.n * b.d + b.n * a.d, 'd': a.d * b.d}) AS f
        |  FROM hl)
        |SELECT agg.q AS query, CAST(agg.n_ranked AS BIGINT) AS n_ranked,
        |  CAST(coalesce(apx.n_rel, 0) AS BIGINT) AS n_rel,
        |  CAST(1000000 // apx.first_hit AS BIGINT) AS mrr_ppm,
        |  CAST((CAST(1000000 AS HUGEINT) * (apx.f).n)
        |    // ((apx.f).d * apx.n_rel) AS BIGINT) AS ap_ppm,
        |  CAST(1000000 * apx.hk // 3 AS BIGINT) AS p_at_k_ppm,
        |  CAST(1000000 * apx.hk // apx.n_rel AS BIGINT) AS r_at_k_ppm
        |FROM agg LEFT JOIN apx USING (q)""".stripMargin,
    // q212: the greedy replayed LITERALLY — one merge per recursion
    // step over a sorted size-list state; cost uniqueness across
    // optimal tie-breaks is what makes the replay an oracle.
    "q212_merge_plan" ->
      """WITH RECURSIVE files AS (
        |  SELECT 's' || l_suppkey AS k, CAST(l_quantity AS BIGINT) AS sz
        |  FROM lineitem WHERE l_suppkey <= 24 AND l_quantity >= 0),
        |f AS (
        |  SELECT k, count(*) AS n_files, CAST(sum(sz) AS BIGINT)
        |      AS total_size, list(sz ORDER BY sz) AS l
        |  FROM files GROUP BY 1),
        |r AS (
        |  SELECT k, l, CAST(0 AS BIGINT) AS cost FROM f
        |  UNION ALL
        |  SELECT k, list_sort(list_append(l[3:], l[1] + l[2])),
        |    cost + l[1] + l[2]
        |  FROM r WHERE len(l) >= 2)
        |SELECT f.k AS key, f.n_files, f.total_size, r.cost AS merge_cost
        |FROM f JOIN r ON r.k = f.k AND len(r.l) = 1""".stripMargin,
    // q213: components by plain reachability recursion over the sameAs
    // chains, then the definitional join — a differentFrom pair is
    // violated iff both endpoints resolve to the same min-label (unseen
    // endpoints resolve to themselves).
    "q213_constraint_check" ->
      """WITH RECURSIVE same AS (
        |  SELECT 'c' || c_custkey AS a, 'c' || (c_custkey - 1) AS b
        |  FROM customer
        |  WHERE c_custkey % 7 <> 0 AND c_custkey > 0 AND c_custkey <= 400),
        |sym AS (SELECT a AS x, b AS y FROM same
        |        UNION ALL SELECT b, a FROM same),
        |reach AS (
        |  SELECT x AS id, x AS node FROM sym
        |  UNION
        |  SELECT reach.id, sym.y FROM reach JOIN sym ON sym.x = reach.node),
        |comp AS (SELECT id, min(node) AS c FROM reach GROUP BY 1),
        |d AS (
        |  SELECT DISTINCT
        |    least('c' || c_custkey, 'c' || (c_custkey - 3)) AS entity_a,
        |    greatest('c' || c_custkey, 'c' || (c_custkey - 3)) AS entity_b
        |  FROM customer
        |  WHERE c_custkey % 5 = 0 AND c_custkey >= 3 AND c_custkey <= 400)
        |SELECT d.entity_a, d.entity_b,
        |  coalesce(ca.c, d.entity_a) AS component
        |FROM d
        |LEFT JOIN comp ca ON ca.id = d.entity_a
        |LEFT JOIN comp cb ON cb.id = d.entity_b
        |WHERE coalesce(ca.c, d.entity_a) = coalesce(cb.c, d.entity_b)""".stripMargin,
    // q214: the same gap scores from DuckDB list slices
    // (list_distinct / list_intersect / concat-union), the local-min +
    // depth rule via lag/lead — no typed scan anywhere.
    "q214_topic_boundaries" ->
      """WITH tk AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x <> '') AS t
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |g AS (SELECT id, t, len(t) AS n FROM tk WHERE len(t) >= 18),
        |sims AS (
        |  SELECT id, gi,
        |    CAST(1000000 * len(list_intersect(
        |        list_distinct(t[gi - 7:gi]), list_distinct(t[gi + 1:gi + 8])))
        |      // len(list_distinct(t[gi - 7:gi] || t[gi + 1:gi + 8]))
        |      AS BIGINT) AS sim
        |  FROM g, unnest(range(8, n - 8 + 1)) u(gi)),
        |scan AS (
        |  SELECT id, gi, sim, lag(sim) OVER w AS pv, lead(sim) OVER w AS nx
        |  FROM sims WINDOW w AS (PARTITION BY id ORDER BY gi))
        |SELECT id, CAST(gi AS BIGINT) AS boundary_pos, sim AS sim_ppm,
        |  (pv - sim) + (nx - sim) AS depth_ppm
        |FROM scan
        |WHERE pv IS NOT NULL AND nx IS NOT NULL
        |  AND pv > sim AND sim <= nx
        |  AND (pv - sim) + (nx - sim) >= 100000""".stripMargin,
    // q215: the same curve computed definitionally — normalized pairs,
    // max-score dedup, gold flag join, per-score counts, one cumulative
    // window ordered by score DESC, HUGEINT ppm floors; never-scored
    // gold pairs enter only through the total-gold constant.
    "q215_threshold_sweep" ->
      """WITH c AS (SELECT c_custkey AS k FROM customer
        |           WHERE c_custkey <= 300),
        |scored0 AS (
        |  SELECT 'c' || i.k AS a, 'c' || j.k AS b,
        |    CAST(1000 - 7 * (j.k - i.k) * (j.k - i.k) + i.k % 13
        |      AS BIGINT) AS sc
        |  FROM c i JOIN c j ON j.k > i.k AND j.k - i.k <= 4),
        |scored AS (
        |  SELECT least(a, b) AS pa, greatest(a, b) AS pb, max(sc) AS sc
        |  FROM scored0 GROUP BY 1, 2),
        |gold AS (
        |  SELECT DISTINCT least('c' || i.k, 'c' || j.k) AS pa,
        |    greatest('c' || i.k, 'c' || j.k) AS pb
        |  FROM c i JOIN c j ON j.k > i.k
        |    AND (j.k - i.k <= 2 OR (j.k - i.k = 3 AND i.k % 3 = 0)
        |         OR j.k - i.k = 6)),
        |ng AS (SELECT count(*) AS n FROM gold),
        |lab AS (
        |  SELECT s.sc, CASE WHEN g.pa IS NULL THEN 0 ELSE 1 END AS g
        |  FROM scored s LEFT JOIN gold g ON g.pa = s.pa AND g.pb = s.pb),
        |per AS (SELECT sc, count(*) AS n, sum(g) AS ngs FROM lab GROUP BY 1),
        |cum AS (
        |  SELECT sc, sum(ngs) OVER w AS tp, sum(n) OVER w - sum(ngs) OVER w
        |      AS fp
        |  FROM per WINDOW w AS (ORDER BY sc DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT cum.sc AS threshold, CAST(cum.tp AS BIGINT) AS tp,
        |  CAST(cum.fp AS BIGINT) AS fp,
        |  CAST(ng.n - cum.tp AS BIGINT) AS fn,
        |  CAST((CAST(1000000 AS HUGEINT) * cum.tp) // (cum.tp + cum.fp)
        |    AS BIGINT) AS p_ppm,
        |  CAST((CAST(1000000 AS HUGEINT) * cum.tp) // ng.n AS BIGINT)
        |    AS r_ppm,
        |  CAST((CAST(2000000 AS HUGEINT) * cum.tp)
        |    // (2 * cum.tp + cum.fp + (ng.n - cum.tp)) AS BIGINT) AS f1_ppm
        |FROM cum CROSS JOIN ng""".stripMargin,
    // q216: the CLAHE LUT definition replayed relationally — dense
    // 256-bin grid per tile, integer clip 4, batch + residual-stepped
    // redistribution, windowed cumsum, exact half-even rounding of
    // cum·255/300 (DuckDB window sums are HUGEINT → cast at the end).
    "q216_clahe_lut" ->
      """WITH px AS (
        |  SELECT (c_custkey - 1) // 300 AS tile,
        |    CASE WHEN c_custkey % 3 = 0 THEN 128
        |         ELSE (c_custkey * 37) % 256 END AS bin
        |  FROM customer WHERE c_custkey BETWEEN 1 AND 1200),
        |h AS (SELECT tile, bin, count(*) AS cnt FROM px GROUP BY 1, 2),
        |bins AS (
        |  SELECT t.tile, b.bin
        |  FROM (SELECT DISTINCT tile FROM h) t
        |  CROSS JOIN (SELECT unnest(range(0, 256)) AS bin) b),
        |dense AS (
        |  SELECT bins.tile, bins.bin, coalesce(h.cnt, 0) AS cnt
        |  FROM bins LEFT JOIN h ON h.tile = bins.tile AND h.bin = bins.bin),
        |cl AS (
        |  SELECT tile, bin, least(cnt, 4) AS capped,
        |    sum(greatest(cnt - 4, 0)) OVER (PARTITION BY tile) AS clipped
        |  FROM dense),
        |rd AS (
        |  SELECT tile, bin, capped, clipped // 256 AS rb,
        |    clipped % 256 AS resid,
        |    greatest(256 // greatest(clipped % 256, 1), 1) AS step
        |  FROM cl),
        |h2 AS (
        |  SELECT tile, bin,
        |    capped + rb + CASE WHEN resid > 0 AND bin % step = 0
        |                        AND bin // step < resid THEN 1 ELSE 0 END
        |      AS hist2
        |  FROM rd),
        |cum AS (
        |  SELECT tile, bin,
        |    sum(hist2) OVER (PARTITION BY tile ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h2)
        |SELECT CAST(tile AS BIGINT) AS tile, CAST(bin AS BIGINT) AS bin,
        |  CAST(least(255, (cum * 255) // 300 +
        |    CASE WHEN (cum * 255) % 300 * 2 > 300 THEN 1
        |         WHEN (cum * 255) % 300 * 2 = 300
        |           THEN ((cum * 255) // 300) % 2
        |         ELSE 0 END) AS BIGINT) AS lut
        |FROM cum""".stripMargin,
    // q217: the full CLAHE definition relationally — LUTs as in q216 but
    // keyed (ty, tx), then the bilinear apply: floor-corner tile coords
    // (the only negative quotient is -1, handled by CASE so DuckDB's //
    // and Spark's div agree), positive remainders p/q as the exact
    // interpolation numerators, 4 LUT joins, one half-even rounding of
    // the blend polynomial over 1200.
    "q217_clahe_apply" ->
      """WITH px AS (
        |  SELECT 'pg1' AS img, (c_custkey - 1) % 40 AS x,
        |    (c_custkey - 1) // 40 AS y,
        |    CASE WHEN c_custkey % 3 = 0 THEN 128
        |         ELSE (c_custkey * 37) % 256 END AS v
        |  FROM customer WHERE c_custkey BETWEEN 1 AND 1200),
        |h AS (SELECT y // 15 AS ty, x // 20 AS tx, v AS bin,
        |        count(*) AS cnt
        |      FROM px GROUP BY 1, 2, 3),
        |bins AS (
        |  SELECT t.ty, t.tx, b.bin
        |  FROM (SELECT DISTINCT ty, tx FROM h) t
        |  CROSS JOIN (SELECT unnest(range(0, 256)) AS bin) b),
        |dense AS (
        |  SELECT bins.ty, bins.tx, bins.bin, coalesce(h.cnt, 0) AS cnt
        |  FROM bins LEFT JOIN h
        |    ON h.ty = bins.ty AND h.tx = bins.tx AND h.bin = bins.bin),
        |cl AS (
        |  SELECT ty, tx, bin, least(cnt, 4) AS capped,
        |    sum(greatest(cnt - 4, 0)) OVER (PARTITION BY ty, tx) AS clipped
        |  FROM dense),
        |rd AS (
        |  SELECT ty, tx, bin, capped, clipped // 256 AS rb,
        |    clipped % 256 AS resid,
        |    greatest(256 // greatest(clipped % 256, 1), 1) AS step
        |  FROM cl),
        |h2 AS (
        |  SELECT ty, tx, bin,
        |    capped + rb + CASE WHEN resid > 0 AND bin % step = 0
        |                        AND bin // step < resid THEN 1 ELSE 0 END
        |      AS hist2
        |  FROM rd),
        |cum AS (
        |  SELECT ty, tx, bin,
        |    sum(hist2) OVER (PARTITION BY ty, tx ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h2),
        |lut AS (
        |  SELECT ty, tx, bin,
        |    least(255, (cum * 255) // 300 +
        |      CASE WHEN (cum * 255) % 300 * 2 > 300 THEN 1
        |           WHEN (cum * 255) % 300 * 2 = 300
        |             THEN ((cum * 255) // 300) % 2
        |           ELSE 0 END) AS lut
        |  FROM cum),
        |g2 AS (
        |  SELECT img, x, y, v, 2 * x - 20 AS ax, 2 * y - 15 AS ay,
        |    CASE WHEN 2 * x - 20 < 0 THEN -1 ELSE (2 * x - 20) // 40 END
        |      AS tx1,
        |    CASE WHEN 2 * y - 15 < 0 THEN -1 ELSE (2 * y - 15) // 30 END
        |      AS ty1
        |  FROM px),
        |g3 AS (
        |  SELECT img, x, y, v, ax - tx1 * 40 AS p, ay - ty1 * 30 AS q,
        |    greatest(tx1, 0) AS tx1c, least(tx1 + 1, 1) AS tx2c,
        |    greatest(ty1, 0) AS ty1c, least(ty1 + 1, 1) AS ty2c
        |  FROM g2),
        |nn AS (
        |  SELECT g3.img, g3.x, g3.y,
        |    l11.lut * (40 - p) * (30 - q) + l12.lut * p * (30 - q) +
        |    l21.lut * (40 - p) * q + l22.lut * p * q AS n
        |  FROM g3
        |  JOIN lut l11 ON l11.ty = g3.ty1c AND l11.tx = g3.tx1c
        |    AND l11.bin = g3.v
        |  JOIN lut l12 ON l12.ty = g3.ty1c AND l12.tx = g3.tx2c
        |    AND l12.bin = g3.v
        |  JOIN lut l21 ON l21.ty = g3.ty2c AND l21.tx = g3.tx1c
        |    AND l21.bin = g3.v
        |  JOIN lut l22 ON l22.ty = g3.ty2c AND l22.tx = g3.tx2c
        |    AND l22.bin = g3.v)
        |SELECT img, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
        |  CAST(least(255, n // 1200 +
        |    CASE WHEN n % 1200 * 2 > 1200 THEN 1
        |         WHEN n % 1200 * 2 = 1200 THEN (n // 1200) % 2
        |         ELSE 0 END) AS BIGINT) AS out
        |FROM nn""".stripMargin
  )
}
