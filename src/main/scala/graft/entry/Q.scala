package graft.entry

import graft.fixtures.InvoiceCorpus
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.run.{Extract, Pipeline}
import graft.tag.Taggers
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the driver-contract query packs (moved verbatim
  * from SparkEntry when it was split — r4 verdict #4). */
private[graft] object Q {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def sumd(c: Column): Column = sum(dec2(c)).cast("double")

  /** Directed part co-order edge set — both orientations of every pair of
    * distinct parts sharing a lineitem order (q56/q61/q62/q65). r6: built
    * as one `distinct` over the a<b half, then unioned with its swap. The
    * two orientations are disjoint, so the union IS the old
    * `=!= ... distinct` set row-for-row — but the distinct exchange now
    * carries half the rows (guide §2.3 "shuffle fewer bytes"). */
  def coOrderEdges(s: SparkSession, d: String): DataFrame = {
    val half = coOrderHalf(s, d)
    half.union(half.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** The src<dst half of the co-order edge set — shared by q56/q59/q61/
    * q62/q64/q65/q68. r6: built by per-order pair EXPANSION (groupBy
    * order → sorted part array → posexplode × suffix explode) instead of
    * the lineitem self-join: the expansion's first exchange carries the
    * 600k membership rows where the join shuffled/probed 2× that, and
    * the pair stream stays narrow until the same final distinct
    * (measured 2.2 → 1.3 s warm at sf0.1). Pair SET is identical: same
    * src<dst pairs, same distinct. */
  def coOrderHalf(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
      .select(posexplode(col("ps")).as(Seq("i", "src")), col("ps"))
      .select(col("src"), explode(expr("slice(ps, i + 2, size(ps))")).as("dst"))
      .where(col("src") < col("dst"))
      .distinct()

  /** q171's SCAN oracle — the same integer ε-test (25·g² ≥ 9·ga·gb),
    * μ = 2 core gate, CC over the ε-core subgraph, min-cluster border
    * attachment, and ≥2-adjacent-clusters hub rule, replayed in DuckDB
    * over the customer graph + planted K12. */
  val scanOracleSql: String =
    """WITH RECURSIVE edir AS (
      |  SELECT 'c' || c_custkey AS src, 'c' || (c_custkey // 2) AS dst
      |  FROM customer WHERE c_custkey > 1
      |  UNION ALL
      |  SELECT 'c' || c_custkey, 'c' || (c_custkey // 4)
      |  FROM customer WHERE c_custkey > 3
      |  UNION ALL
      |  SELECT 'c' || x.c_custkey, 'c' || y.c_custkey
      |  FROM customer x JOIN customer y ON x.c_custkey < y.c_custkey
      |  WHERE x.c_custkey <= 12 AND y.c_custkey <= 12),
      |und AS MATERIALIZED (
      |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |  FROM edir WHERE src <> dst),
      |sym AS MATERIALIZED (
      |  SELECT a AS id, b AS nb FROM und UNION ALL SELECT b, a FROM und),
      |deg AS MATERIALIZED (SELECT id, count(*) AS deg FROM sym GROUP BY 1),
      |cn AS MATERIALIZED (
      |  SELECT x.id AS a, y.id AS b, count(*) AS cn
      |  FROM sym x JOIN sym y ON x.nb = y.nb AND x.id < y.id
      |  GROUP BY 1, 2),
      |eps AS MATERIALIZED (
      |  SELECT und.a, und.b FROM und
      |  LEFT JOIN cn ON cn.a = und.a AND cn.b = und.b
      |  JOIN deg da ON da.id = und.a JOIN deg db ON db.id = und.b
      |  WHERE 25 * (coalesce(cn.cn, 0) + 2) * (coalesce(cn.cn, 0) + 2)
      |     >= 9 * (da.deg + 1) * (db.deg + 1)),
      |eadj AS MATERIALIZED (
      |  SELECT a AS id, b AS nb FROM eps UNION ALL SELECT b, a FROM eps),
      |cores AS MATERIALIZED (
      |  SELECT id FROM eadj GROUP BY id HAVING count(*) >= 2),
      |ce AS MATERIALIZED (
      |  SELECT e.id AS src, e.nb AS dst FROM eadj e
      |  WHERE e.id IN (SELECT id FROM cores)
      |    AND e.nb IN (SELECT id FROM cores)),
      |reach AS (
      |  SELECT src AS id, dst AS r FROM ce
      |  UNION
      |  SELECT reach.id, ce.dst FROM reach JOIN ce ON ce.src = reach.r),
      |comp AS (SELECT id, least(id, min(r)) AS component
      |         FROM reach GROUP BY id),
      |corec AS MATERIALIZED (
      |  SELECT cores.id, coalesce(comp.component, cores.id) AS cluster
      |  FROM cores LEFT JOIN comp ON comp.id = cores.id),
      |border AS MATERIALIZED (
      |  SELECT e.id, min(corec.cluster) AS cluster
      |  FROM eadj e JOIN corec ON corec.id = e.nb
      |  WHERE e.id NOT IN (SELECT id FROM corec)
      |  GROUP BY 1),
      |clustered AS MATERIALIZED (
      |  SELECT id, 'core' AS role, cluster FROM corec
      |  UNION ALL SELECT id, 'border', cluster FROM border),
      |rest AS (
      |  SELECT d.id, count(DISTINCT c.cluster) AS nc
      |  FROM deg d JOIN sym s ON s.id = d.id
      |  LEFT JOIN clustered c ON c.id = s.nb
      |  WHERE d.id NOT IN (SELECT id FROM clustered)
      |  GROUP BY 1)
      |SELECT id, role, cluster FROM clustered
      |UNION ALL
      |SELECT id, CASE WHEN nc >= 2 THEN 'hub' ELSE 'outlier' END,
      |  CAST(NULL AS VARCHAR)
      |FROM rest""".stripMargin

  /** q78/q79's shared edge graph: the customer binary tree (k — k div 2)
    * plus grandparent shortcuts (k — k div 4), so every interior node sits
    * in (k, k div 2, k div 4) triangles and degrees stay ≤ 8. */
  def custGraph(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
    val tree = cust.where(col("c_custkey") > 1).select(
      concat(lit("c"), col("c_custkey")).as("src"),
      concat(lit("c"), expr("c_custkey div 2")).as("dst"))
    val hop2 = cust.where(col("c_custkey") > 3).select(
      concat(lit("c"), col("c_custkey")).as("src"),
      concat(lit("c"), expr("c_custkey div 4")).as("dst"))
    tree.union(hop2)
  }

  // ======================================================================
  // oracle SQL (DuckDB dialect) — generated from the same constants the
  // Spark expressions use, so rule lists/orders cannot drift
  // ======================================================================

  def likeAny(expr: String, words: Seq[String]): String =
    words.map(w => s"contains($expr, '$w')").mkString("(", " OR ", ")")

  /** F5 classifier as a DuckDB CASE chain (mirrors Taggers.classifyTextType).
    * The digits rule carries an explicit `\n?` before `$`: Java regex (and
    * the Python reference) let `$` match before a final newline, RE2
    * (DuckDB) matches end-of-text only — without it a digit-only text with
    * a trailing \n classifies 'number' in Spark but 'text' in the oracle. */
  val classifySql: String = {
    val tl = "lower(trim(text))"
    s"""CASE
       | WHEN ${likeAny(tl, Seq("facture", "invoice", "bill"))} THEN 'header'
       | WHEN ${likeAny(tl, Seq("€", "$$", "eur", "usd", "ttc", "ht", "mad", "dh", "dhs"))} THEN 'amount'
       | WHEN (contains($tl,'date') OR contains($tl,'/') OR contains($tl,'-')) AND length(text) < 15 THEN 'date'
       | WHEN contains($tl,'@') OR contains($tl,'email') THEN 'email'
       | WHEN ${likeAny(tl, Seq("tel", "phone", "+33", "01", "02", "03", "04", "05", "06", "07", "+212"))} THEN 'phone'
       | WHEN ${likeAny(tl, Seq("rue", "avenue", "place", "boulevard"))} THEN 'address'
       | WHEN regexp_matches(replace(replace(text,'.',''),'-',''), '^[0-9]+\n?$$') THEN 'number'
       | ELSE 'text' END""".stripMargin
  }

  /** F6 enhanced classifier given a zone expression. */
  def enhanceSql(zoneExpr: String): String = {
    val tl = "lower(trim(text))"
    s"""CASE
       | WHEN $zoneExpr = 'header' AND ${likeAny(tl, Seq("facture", "invoice", "devis", "quote"))} THEN 'document_type'
       | WHEN $zoneExpr = 'header' AND regexp_matches(text,'[0-9]') AND length(text) < 20 THEN 'document_number'
       | WHEN $zoneExpr = 'total' AND ${likeAny(tl, Seq("total", "ttc", "ht"))} THEN 'total_label'
       | WHEN $zoneExpr = 'total' AND (contains(text,'€') OR regexp_matches(text,'[0-9]')) THEN 'total_amount'
       | ELSE $classifySql END""".stripMargin
  }

  /** A3 zone banding CASE. */
  def zoneBandSql(rel: String): String =
    s"""CASE WHEN $rel < 0.2 THEN 'header' WHEN $rel < 0.4 THEN 'company_info'
       | WHEN $rel < 0.6 THEN 'client_info' WHEN $rel < 0.8 THEN 'items'
       | WHEN $rel < 0.95 THEN 'total' ELSE 'footer' END""".stripMargin

  /** Language-ID scores per language, as SQL sub-expressions. */
  val langScoreSql: Seq[(String, String)] =
    TextOps.langMarkers.map { case (l, ms) =>
      l -> ms.map(m => s"contains(' ' || lower(text) || ' ', '$m')::INT").mkString(" + ")
    }

  /** Inner SELECT producing (keys…, s_<lang>..., best, zh) from a source
    * relation whose text column is named `text`. */
  def langScoresFrom(keys: String, src: String): String = {
    val scores = langScoreSql.map { case (l, e) => s"($e) AS s_$l" }.mkString(", ")
    val best = langScoreSql.map("s_" + _._1).mkString("greatest(", ", ", ")")
    val zh = "length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))"
    s"SELECT $keys, $scores, $best AS best, $zh AS zh FROM $src"
  }

  val langScoresFromDocs: String = langScoresFrom("doc_id", "documents")

  /** The language decision CASE over the langScoresFromDocs columns. */
  val langCaseSql: String = {
    val chain = langScoreSql.map { case (l, _) =>
      s"WHEN s_$l > 0 AND s_$l = best AND zh <= s_$l THEN '$l'"
    }.mkString(" ")
    s"CASE $chain WHEN zh > 0 THEN 'zh' ELSE 'und' END"
  }

  /** PII regexes, shared verbatim with the engine (RE2 ∩ java.regex subset;
    * no single quotes, so safe to splice into SQL literals). */
  val emailReSql: String = graft.ops.Curation.emailRe
  val phoneReSql: String = graft.ops.Curation.phoneRe
  val digitRunReSql: String = graft.ops.Curation.digitRunRe


  /** The portable scrambled hash (ops.Sketch.kmvHash) as a DuckDB
    * expression over `inner` — rolling 31-fold + two MINSTD rounds. */
  def kmvHashSql(inner: String): String =
    s"""(( (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      [CAST(unicode(c) AS BIGINT) FOR c IN string_split($inner, '')]),
       |    (h, c) -> (h * 31 + c) % 2147483647)
       |   * 48271 + 12345) % 2147483647)
       | * 69621 + 54321) % 2147483647""".stripMargin

  /** q141/q146's WL oracle prefix: the symmetrized customer-graph edge
    * list (`e`), the DIRECTED original (`edir`), degree-init labels
    * (`l0`), and `rounds` unrolled (neighbor-sum ⋈ relabel) CTEs
    * (`n1`/`l1` … `n<r>`/`l<r>`) replaying graph.WlRefine's modular
    * arithmetic; `select` runs over the final `l<rounds>`. */
  def wlOracleSql(rounds: Int, select: String): String = {
    val roundCtes = (1 to rounds).map { r =>
      s""",
         |n$r AS (SELECT e.v, CAST(sum((l${r - 1}.l * 886151 + 54321) % 1048573)
         |               AS BIGINT) AS nb
         |       FROM e JOIN l${r - 1} ON l${r - 1}.v = e.u GROUP BY 1),
         |l$r AS (SELECT l${r - 1}.v, l${r - 1}.degree,
         |         (((l${r - 1}.l * 741103 + 12345) % 1048573) * 31 + n$r.nb)
         |           % 1048573 AS l
         |       FROM l${r - 1} JOIN n$r ON n$r.v = l${r - 1}.v)""".stripMargin
    }.mkString
    s"""WITH edir AS (
       |  SELECT 'c' || c_custkey AS src, 'c' || (c_custkey // 2) AS dst
       |  FROM customer WHERE c_custkey > 1
       |  UNION ALL
       |  SELECT 'c' || c_custkey, 'c' || (c_custkey // 4)
       |  FROM customer WHERE c_custkey > 3),
       |e AS (
       |  SELECT src AS v, dst AS u FROM edir
       |  UNION ALL
       |  SELECT dst, src FROM edir),
       |l0 AS (SELECT v, count(*) AS degree, count(*) % 1048573 AS l
       |       FROM e GROUP BY 1)$roundCtes
       |$select""".stripMargin
  }

  /** q144's oracle, built by unrolling the TruthDiscovery recurrence —
    * belief/normalize/trust per round as plain CTEs (aggregates are not
    * allowed inside a recursive CTE, so the fixed round count unrolls). */
  def truthOracleSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s""",
         |b$r AS (
         |  SELECT cl.obj, cl.val, CAST(sum(t${r - 1}.trust_fp) AS BIGINT)
         |    AS belief_fp
         |  FROM cl JOIN t${r - 1} ON t${r - 1}.src = cl.src GROUP BY 1, 2),
         |n$r AS (
         |  SELECT obj, val,
         |    CAST((belief_fp * 1000000) //
         |      CAST(sum(belief_fp) OVER (PARTITION BY obj) AS BIGINT)
         |      AS BIGINT) AS norm_fp
         |  FROM b$r),
         |t$r AS (
         |  SELECT s.src, CAST(s.sn // nc.n_claims AS BIGINT) AS trust_fp
         |  FROM (SELECT cl.src, CAST(sum(n.norm_fp) AS BIGINT) AS sn
         |        FROM cl JOIN n$r n ON n.obj = cl.obj AND n.val = cl.val
         |        GROUP BY 1) s
         |  JOIN nc ON nc.src = s.src)""".stripMargin
    }.mkString
    s"""WITH cl AS (
       |  SELECT DISTINCT 'src' || (o_orderkey % 7) AS src,
       |    'c' || o_custkey AS obj, o_orderpriority AS val
       |  FROM orders
       |  WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
       |    AND o_orderpriority IS NOT NULL),
       |nc AS (SELECT src, count(*) AS n_claims FROM cl GROUP BY 1),
       |t0 AS (SELECT src, CAST(1000000 AS BIGINT) AS trust_fp FROM nc)$roundCtes,
       |stats AS (
       |  SELECT obj, count(DISTINCT val) AS n_values,
       |         count(DISTINCT src) AS n_sources
       |  FROM cl GROUP BY 1),
       |win AS (
       |  SELECT obj, val, belief_fp,
       |    row_number() OVER (PARTITION BY obj
       |      ORDER BY belief_fp DESC, val) AS rk
       |  FROM b$rounds)
       |SELECT w.obj, w.val AS resolved_val, w.belief_fp,
       |       stats.n_values, stats.n_sources
       |FROM win w JOIN stats USING (obj) WHERE w.rk = 1""".stripMargin
  }
}
