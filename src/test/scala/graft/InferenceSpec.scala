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
}
