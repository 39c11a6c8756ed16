package graft

import graft.graph.Inference
import org.apache.spark.sql.DataFrame

class InferenceSpec extends SparkSuite {
  import spark.implicits._

  private def triples(rows: (String, String, String)*): DataFrame =
    rows.toDF("subj", "pred", "obj")
  private def set(df: DataFrame) =
    df.as[(String, String, String)].collect().toSet

  // a tiny ontology exercising every rule:
  //   classes:   Cat ⊑ Mammal ⊑ Animal
  //   properties: hasPet ⊑ keeps ⊑ relatedTo, with domain(hasPet)=Person,
  //               range(hasPet)=Animal
  //   data:      alice hasPet tom; tom type Cat
  private val onto = Seq(
    ("Cat", "rdfs:subClassOf", "Mammal"),
    ("Mammal", "rdfs:subClassOf", "Animal"),
    ("hasPet", "rdfs:subPropertyOf", "keeps"),
    ("keeps", "rdfs:subPropertyOf", "relatedTo"),
    ("hasPet", "rdfs:domain", "Person"),
    ("hasPet", "rdfs:range", "Animal"),
    ("alice", "hasPet", "tom"),
    ("tom", "rdf:type", "Cat"))

  test("hand-computed closure: every RDFS rule fires") {
    val out = set(Inference.rdfsClosure(triples(onto: _*)))
    val expected = onto.toSet ++ Set(
      ("Cat", "rdfs:subClassOf", "Animal"),            // rdfs11
      ("hasPet", "rdfs:subPropertyOf", "relatedTo"),   // rdfs5
      ("alice", "keeps", "tom"),                       // rdfs7
      ("alice", "relatedTo", "tom"),                   // rdfs7 (chained)
      ("alice", "rdf:type", "Person"),                 // rdfs2
      ("tom", "rdf:type", "Animal"),                   // rdfs3 — AND rdfs9
      ("tom", "rdf:type", "Mammal"))                   // rdfs9 via Cat
    assert(out == expected)
  }

  test("range-derived types inherit too: domain class in a hierarchy") {
    // domain(p)=B, B ⊑ A: (x p y) must give x type B AND x type A
    val out = set(Inference.rdfsClosure(triples(
      ("B", "rdfs:subClassOf", "A"),
      ("p", "rdfs:domain", "B"),
      ("x", "p", "y"))))
    assert(out.contains(("x", "rdf:type", "B")) && out.contains(("x", "rdf:type", "A")))
  }

  test("subproperty entailment feeds domain/range of the SUPERproperty") {
    // p ⊑ q, domain(q)=C: (x p y) entails (x q y) which entails x type C
    val out = set(Inference.rdfsClosure(triples(
      ("p", "rdfs:subPropertyOf", "q"),
      ("q", "rdfs:domain", "C"),
      ("x", "p", "y"))))
    assert(out.contains(("x", "q", "y")) && out.contains(("x", "rdf:type", "C")))
  }

  test("idempotence: the closure of a closure is itself") {
    val once = Inference.rdfsClosure(triples(onto: _*))
    val twice = Inference.rdfsClosure(once)
    assert(set(twice) == set(once))
  }

  test("cyclic subclass hierarchy terminates (A ⊑ B ⊑ A)") {
    val out = set(Inference.rdfsClosure(triples(
      ("A", "rdfs:subClassOf", "B"),
      ("B", "rdfs:subClassOf", "A"),
      ("x", "rdf:type", "A"))))
    // the cycle entails the self-edges and both memberships
    assert(out.contains(("x", "rdf:type", "B")))
    assert(out.contains(("A", "rdfs:subClassOf", "A")))
  }

  test("no schema: the closure is just the data, distinct") {
    val out = set(Inference.rdfsClosure(triples(
      ("a", "p", "b"), ("a", "p", "b"), ("c", "q", "d"))))
    assert(out == Set(("a", "p", "b"), ("c", "q", "d")))
  }

  test("partition-layout invariance") {
    val base = triples(onto: _*)
    val a = set(Inference.rdfsClosure(base.repartition(7)))
    val b = set(Inference.rdfsClosure(base.coalesce(1)))
    assert(a == b)
  }

  // ---- OWL property rules (pD* fragment) ----

  test("owl: symmetric and inverse rewrites, both directions") {
    val out = set(Inference.owlPropertyClosure(
      triples(("a", "adj", "b"), ("x", "in", "y"), ("q", "of", "r")),
      symmetric = Seq("adj"), inverses = Seq(("in", "of"))))
    assert(out == Set(
      ("a", "adj", "b"), ("b", "adj", "a"),
      ("x", "in", "y"), ("y", "of", "x"),
      ("q", "of", "r"), ("r", "in", "q")))
  }

  test("owl: transitive chain closes; the inverse image of the closure " +
    "is closed too (pD* without per-member declarations)") {
    val out = set(Inference.owlPropertyClosure(
      triples(("a", "partOf", "b"), ("b", "partOf", "c"),
        ("c", "partOf", "d")),
      inverses = Seq(("partOf", "hasPart")), transitive = Seq("partOf")))
    val po = out.filter(_._2 == "partOf").map(t => (t._1, t._3))
    val hp = out.filter(_._2 == "hasPart").map(t => (t._1, t._3))
    assert(po == Set(("a", "b"), ("b", "c"), ("c", "d"),
      ("a", "c"), ("a", "d"), ("b", "d")))
    assert(hp == po.map(_.swap)) // hasPart closure = reversed closure
  }

  test("owl: symmetric + transitive pred closes to undirected " +
    "reachability (incl. the reflexive pairs x→y→x entails)") {
    val out = set(Inference.owlPropertyClosure(
      triples(("a", "linked", "b"), ("b", "linked", "c")),
      symmetric = Seq("linked"), transitive = Seq("linked")))
    val pairs = out.map(t => (t._1, t._3))
    val all = for (x <- Seq("a", "b", "c"); y <- Seq("a", "b", "c")) yield (x, y)
    assert(pairs == all.toSet)
  }

  test("owl: chained image classes (p inverseOf q, q symmetric ⇒ all " +
    "four orientations); unrelated preds pass through; null rows drop") {
    val out = set(Inference.owlPropertyClosure(
      triples(("a", "p", "b"), ("m", "other", "n"),
        (null, "p", "z"), ("z", "p", null)),
      symmetric = Seq("q"), inverses = Seq(("p", "q"))))
    assert(out == Set(("a", "p", "b"), ("b", "q", "a"),
      ("a", "q", "b"), ("b", "p", "a"), ("m", "other", "n")))
  }

  test("owl: layout invariance") {
    val base = triples(("a", "partOf", "b"), ("b", "partOf", "c"),
      ("n1", "adj", "n2"), ("c", "in", "n1"))
    def run(df: DataFrame) = set(Inference.owlPropertyClosure(df,
      symmetric = Seq("adj"), inverses = Seq(("in", "of")),
      transitive = Seq("partOf")))
    assert(run(base.repartition(5)) == run(base.coalesce(1)))
  }
}
