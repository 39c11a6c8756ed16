package graft

import graft.graph.Validate
import graft.graph.Validate.Shape
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSuite {
  import spark.implicits._

  private def triples(rows: (String, String, String)*) =
    rows.toDF("subj", "pred", "obj")
  private def focus(subjs: String*) = subjs.toDF("subj")
  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, String, String, String)].collect().toSet

  private val g = triples(
    ("inv1", "hasVendor", "v1"),
    ("inv1", "hasTotal", "100.00"),
    ("inv2", "hasVendor", "v1"),
    ("inv2", "hasVendor", "v2"), // max_count violation
    ("inv2", "hasTotal", "abc"), // pattern violation
    ("inv3", "hasTotal", "7.50"), // missing hasVendor -> min_count
    ("inv3", "hasVendor2", "x"), // unshaped predicate: ignored
    ("inv4", "hasVendor", "ghost"), // dangling object
    ("inv4", "hasTotal", "1.00"))

  private val vendors = Seq("v1", "v2").toDF("member")

  private val shapes = Seq(
    Shape("hasVendor", minCount = 1, maxCount = 1, objIn = Some(vendors)),
    Shape("hasTotal", minCount = 1, maxCount = 1,
      objPattern = Some("^[0-9]+\\.[0-9]{2}$")))

  test("cardinality, pattern and class-membership violations all surface") {
    val out = rows(Validate.validate(focus("inv1", "inv2", "inv3", "inv4"), g, shapes))
    assert(out == Set(
      ("inv2", "hasVendor", "max_count", "2"),
      ("inv3", "hasVendor", "min_count", "0"),
      ("inv2", "hasTotal", "pattern", "abc"),
      ("inv4", "hasVendor", "dangling_object", "ghost")))
  }

  test("a clean graph validates to an empty violation table") {
    val clean = triples(
      ("inv1", "hasVendor", "v1"), ("inv1", "hasTotal", "3.50"))
    assert(Validate.validate(focus("inv1"), clean, shapes).count() == 0)
  }

  test("only focus subjects are checked for cardinality") {
    // inv9 is in the graph but not in focus: its missing hasTotal must NOT
    // be reported; pattern/dangling checks still apply to its triples
    // (they are assertions about the triples themselves)
    val g2 = g.union(triples(("inv9", "hasVendor", "v1")))
    val out = rows(Validate.validate(focus("inv1"), g2, shapes))
    assert(out == Set(
      ("inv2", "hasTotal", "pattern", "abc"),
      ("inv4", "hasVendor", "dangling_object", "ghost")))
  }

  test("min_count 0 makes a predicate optional; detail carries the observed count") {
    val optional = Seq(
      Shape("hasVendor", minCount = 0, maxCount = 1, objIn = Some(vendors)))
    val out = rows(Validate.validate(focus("inv1", "inv2", "inv3"), g, optional))
    // inv3's missing hasVendor is now fine; inv4's dangling ghost triple is
    // still a violation of the triples themselves (focus-independent)
    assert(out == Set(
      ("inv2", "hasVendor", "max_count", "2"),
      ("inv4", "hasVendor", "dangling_object", "ghost")))
  }

  test("duplicate shape predicates are rejected") {
    intercept[IllegalArgumentException] {
      Validate.validate(focus("inv1"), g,
        Seq(Shape("hasVendor"), Shape("hasVendor")))
    }
  }

  test("partition-layout invariance") {
    val a = rows(Validate.validate(
      focus("inv1", "inv2", "inv3", "inv4"), g.repartition(7), shapes))
    val b = rows(Validate.validate(
      focus("inv1", "inv2", "inv3", "inv4"), g.coalesce(1), shapes))
    assert(a == b)
  }
}
