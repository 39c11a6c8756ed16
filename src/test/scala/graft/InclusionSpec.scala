package graft

import graft.ops.Profile

class InclusionSpec extends SparkSuite {
  import spark.implicits._

  test("containment fractions over distinct values, not rows") {
    // fk distinct {1,2,3,4}, pk {1,2,3} -> 3/4 even though value 4
    // appears in many rows
    val fk = Seq(1, 2, 3, 4, 4, 4, 4).toDF("k")
    val pk = Seq(1, 2, 3, 9).toDF("id")
    val r = Profile.inclusion(Seq(("f", fk, "k", "p", pk, "id"))).collect().head
    assert(r.getAs[Long]("n_fk_distinct") == 4)
    assert(r.getAs[Long]("n_missing") == 1)
    assert(r.getAs[Double]("containment") == 0.75)
  }

  test("a verified FK reports containment 1.0; empty fk side reports null") {
    val fk = Seq(1, 2).toDF("k")
    val pk = Seq(1, 2, 3).toDF("id")
    val empty = Seq.empty[Int].toDF("k")
    val out = Profile.inclusion(Seq(
      ("f", fk, "k", "p", pk, "id"),
      ("e", empty, "k", "p", pk, "id"))).collect()
    val byRel = out.map(r => r.getAs[String]("fk_rel") -> r).toMap
    assert(byRel("f").getAs[Double]("containment") == 1.0)
    assert(byRel("e").getAs[Long]("n_fk_distinct") == 0)
    assert(byRel("e").isNullAt(byRel("e").fieldIndex("containment")))
  }

  test("heterogeneous key types compare as strings; nulls drop") {
    val fk = Seq(Some(1L), Some(2L), None).toDF("k")       // bigint
    val pk = Seq("1", "3").toDF("id")                      // string
    val r = Profile.inclusion(Seq(("f", fk, "k", "p", pk, "id"))).collect().head
    assert(r.getAs[Long]("n_fk_distinct") == 2)
    assert(r.getAs[Long]("n_missing") == 1)  // "2" missing; null dropped
  }

  test("candidates are independent rows in request order columns") {
    val a = Seq(1).toDF("k"); val b = Seq(1).toDF("id")
    val out = Profile.inclusion(Seq(
      ("r1", a, "k", "p1", b, "id"),
      ("r2", a, "k", "p2", b, "id"))).collect()
    assert(out.map(_.getAs[String]("fk_rel")).toSet == Set("r1", "r2"))
    assert(out.forall(_.getAs[String]("fk_col") == "k"))
  }
}
