package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SPARQL 1.1 property-path algebra — the full path-expression language
  * over the triple store, compiled compositionally to (src, dst) pair
  * tables: `p` / `^p` (inverse) / `a/b` (sequence) / `a|b` (alternative)
  * / `a+` / `a*` / `a?`. SPARQL evaluates non-trivial paths with SET
  * semantics (the ALP procedure deduplicates — a path query never
  * multiplies solutions by route count), so every node returns DISTINCT
  * pairs.
  *
  * Zero-length semantics (`a*` / `a?`): per the spec, a zero-length path
  * connects every graph TERM to itself — terms being everything that
  * appears in a subject or object position of the graph, independent of
  * the path's predicate. That is deliberately graph-wide (the spec's
  * choice, surprising but normative).
  *
  * Scale shape: each leaf is a predicate-pruned scan (one directory of
  * the pred-partitioned store); sequence = one equi join of pair tables;
  * alternative = union + the distinct every node already carries; `+` =
  * the semi-naive transitive closure (`GraphQuery.reachable` — delta-only
  * joins, one lazily-materialized job per round); `*`/`?` add one
  * node-scale scan for the identity pairs. Composition never leaves
  * DataFrames, so Catalyst reorders/broadcasts the joins like any
  * relational plan. */
object PropertyPath {

  sealed trait Path
  /** A direct predicate step. */
  final case class Pred(p: String) extends Path
  /** `^a` — inverse (swap src/dst). */
  final case class Inv(a: Path) extends Path
  /** `a/b` — sequence. */
  final case class Seq2(a: Path, b: Path) extends Path
  /** `a|b` — alternative. */
  final case class Alt(a: Path, b: Path) extends Path
  /** `a+` — one or more. */
  final case class Plus(a: Path) extends Path
  /** `a*` — zero or more (zero-length pairs over ALL graph terms). */
  final case class Star(a: Path) extends Path
  /** `a?` — zero or one. */
  final case class Opt(a: Path) extends Path

  /** All terms of the graph as (t, t) identity pairs — the SPARQL
    * zero-length path set. */
  private def identityPairs(triples: DataFrame): DataFrame =
    triples.select(col("subj").cast("string").as("t"))
      .union(triples.select(col("obj").cast("string").as("t")))
      .distinct()
      .select(col("t").as("src"), col("t").as("dst"))

  /** Evaluate `path` over triples (subj, pred, obj) → DISTINCT (src, dst). */
  def pairs(triples: DataFrame, path: Path): DataFrame = path match {
    case Pred(p) =>
      triples.where(col("pred") === p)
        .select(col("subj").cast("string").as("src"),
          col("obj").cast("string").as("dst")).distinct()
    case Inv(a) =>
      pairs(triples, a).select(col("dst").as("src"), col("src").as("dst"))
    case Seq2(a, b) =>
      val l = pairs(triples, a)
      val r = pairs(triples, b).select(col("src").as("m"), col("dst"))
      l.join(r, l("dst") === r("m"))
        .select(l("src").as("src"), r("dst").as("dst")).distinct()
    case Alt(a, b) =>
      pairs(triples, a).union(pairs(triples, b)).distinct()
    case Plus(a) =>
      GraphQuery.reachable(pairs(triples, a))
    case Star(a) =>
      pairs(triples, Plus(a)).union(identityPairs(triples)).distinct()
    case Opt(a) =>
      pairs(triples, a).union(identityPairs(triples)).distinct()
  }
}
