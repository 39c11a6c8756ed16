package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Basic-graph-pattern matching — the QUERY surface of a triple store.
  * A pattern is a (s, p, o) template where a term starting with `?` is a
  * variable and anything else is a constant; a BGP is a conjunction of
  * patterns sharing variables (the SPARQL `WHERE { ... }` core). The
  * result is one row per binding, one column per distinct variable in
  * first-appearance order, bag semantics (duplicate bindings preserved,
  * as SPARQL defines — wrap in `.distinct()` for set semantics).
  *
  * Execution is pure Catalyst: each pattern compiles to a filtered scan
  * of the triple table (constants → pushed-down equality predicates) and
  * the conjunction folds into equi joins on the shared variables (cross
  * join only when a pattern is genuinely disconnected). No custom
  * operator is needed — the optimizer reorders/broadcasts the joins like
  * any star query.
  *
  * Scale: feed it `Pipeline.readGraph` output — the store partitions by
  * `pred`, so a constant-predicate pattern prunes to one predicate
  * directory at the scan (the common case: real BGPs bind every
  * predicate), and a constant SUBJECT additionally routes through
  * `TripleStore.readForSubjects`-style bucket pruning when the caller
  * pre-restricts. A k-pattern BGP is k-1 joins of predicate-sized (not
  * store-sized) inputs — the same shape a relational star query has.
  */
object GraphQuery {
  private def isVar(t: String): Boolean = t.startsWith("?")

  /** triples: (subj, pred, obj) columns (string obj — the store model).
    * patterns: SPARQL-style templates, e.g.
    * `Seq(("?c", "in_nation", "?n"), ("?s", "supplies_nation", "?n"))`. */
  def bgp(triples: DataFrame, patterns: Seq[(String, String, String)]): DataFrame = {
    require(patterns.nonEmpty, "bgp: at least one pattern")
    val positions = Seq("subj", "pred", "obj")
    var result: DataFrame = null
    var bound = Vector.empty[String] // first-appearance order
    patterns.foreach { case (s, p, o) =>
      val terms = Seq(s, p, o).zip(positions)
      var scan = triples
      // constants → pushed-down filters
      terms.foreach { case (t, c) => if (!isVar(t)) scan = scan.where(col(c) === lit(t)) }
      // repeated variable WITHIN a pattern → positional equality
      val varPos = terms.collect { case (t, c) if isVar(t) => (t.drop(1), c) }
      varPos.groupBy(_._1).values.filter(_.length > 1).foreach { dup =>
        dup.sliding(2).foreach { w => scan = scan.where(col(w(0)._2) === col(w(1)._2)) }
      }
      val varsHere = varPos.map(_._1).distinct
      val projected = scan.select(varsHere.map { v =>
        col(varPos.find(_._1 == v).get._2).as(v)
      }: _*)
      if (result == null) result = projected
      else {
        val shared = bound.filter(varsHere.contains)
        result =
          if (shared.isEmpty) result.crossJoin(projected)
          else result.join(projected, shared)
      }
      bound = bound ++ varsHere.filterNot(bound.contains)
    }
    result.select(bound.map(col): _*)
  }
}
