package graft

import graft.graph.PropertyPath
import graft.graph.PropertyPath._
import org.apache.spark.sql.DataFrame

class PropertyPathSpec extends SparkSuite {
  import spark.implicits._

  private def triples(rows: (String, String, String)*): DataFrame =
    rows.toDF("subj", "pred", "obj")
  private def ev(g: DataFrame, p: Path) =
    PropertyPath.pairs(g, p).as[(String, String)].collect().toSet

  private val g = triples(
    ("a", "p", "b"), ("b", "p", "c"),          // p-chain a→b→c
    ("b", "q", "x"), ("c", "q", "y"),          // q off the chain
    ("a", "r", "x"))

  test("Pred scans one predicate; duplicates collapse (set semantics)") {
    val dup = triples(("a", "p", "b"), ("a", "p", "b"))
    assert(ev(dup, Pred("p")) == Set(("a", "b")))
    assert(ev(g, Pred("q")) == Set(("b", "x"), ("c", "y")))
  }

  test("Inv swaps direction; ^^p degenerates to p") {
    assert(ev(g, Inv(Pred("p"))) == Set(("b", "a"), ("c", "b")))
    assert(ev(g, Inv(Inv(Pred("p")))) == ev(g, Pred("p")))
  }

  test("Seq2 composes: p/q walks the chain then branches off") {
    assert(ev(g, Seq2(Pred("p"), Pred("q"))) == Set(("a", "x"), ("b", "y")))
  }

  test("Alt unions distinctly: p|r shares no duplicate pairs") {
    assert(ev(g, Alt(Pred("p"), Pred("r"))) ==
      Set(("a", "b"), ("b", "c"), ("a", "x")))
  }

  test("Plus is the transitive closure, set semantics on a diamond") {
    val d = triples(("a", "p", "b"), ("a", "p", "c"), ("b", "p", "d"), ("c", "p", "d"))
    assert(ev(d, Plus(Pred("p"))) ==
      Set(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")))
  }

  test("Star adds zero-length pairs over ALL graph terms (the spec quirk)") {
    val out = ev(g, Star(Pred("p")))
    val terms = Set("a", "b", "c", "x", "y") // every subject/object, any pred
    assert(out == Set(("a", "b"), ("b", "c"), ("a", "c")) ++ terms.map(t => (t, t)))
  }

  test("Opt is the path plus the identity set") {
    val out = ev(g, Opt(Pred("q")))
    assert(out(("b", "x")) && out(("c", "y")) && out(("a", "a")) && out(("y", "y")))
    assert(!out(("a", "c")))
  }

  test("composite: ^q/p+ — from q-objects back and forward along the chain") {
    // ^q: x→b, y→c; then p+ from b: c; from c: none
    assert(ev(g, Seq2(Inv(Pred("q")), Plus(Pred("p")))) == Set(("x", "c")))
  }

  test("cycle safety through Plus inside a sequence") {
    val c = triples(("a", "p", "b"), ("b", "p", "a"), ("a", "q", "z"))
    assert(ev(c, Seq2(Plus(Pred("p")), Pred("q"))) ==
      Set(("a", "z"), ("b", "z")))
  }

  test("partition-layout invariance") {
    val big = triples((1 to 60).map(i =>
      (s"n$i", if (i % 3 == 0) "p" else "q", s"n${i / 2}")): _*)
    val path = Alt(Seq2(Pred("p"), Pred("q")), Plus(Pred("q")))
    assert(ev(big.repartition(7), path) == ev(big.coalesce(1), path))
  }
}
