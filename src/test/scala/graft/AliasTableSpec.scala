package graft

import graft.canon.AliasTable

class AliasTableSpec extends SparkSuite {
  import spark.implicits._

  private val mentions = Seq(
    ("v1", "ACME"), ("v1", "ACME"), ("v1", "ACME"),
    ("v1", "Acme SARL"), ("v1", "Acme SARL"), ("v1", "acme"),
    ("v2", "Beta"))

  test("ranked top-k forms with counts and shares over ALL mentions") {
    val out = AliasTable.build(mentions.toDF("e", "f"), "e", "f", k = 2)
      .as[(String, String, Long, Double, Long)].collect().toSet
    // v1 total = 6; top-2 = ACME(3, 0.5), Acme SARL(2, 1/3); "acme" cut
    assert(out == Set(
      ("v1", "ACME", 3L, 0.5, 1L),
      ("v1", "Acme SARL", 2L, 0.333333, 2L),
      ("v2", "Beta", 1L, 1.0, 1L)))
  }

  test("shares of the kept k sum below 1 when the tail is truncated") {
    val out = AliasTable.build(mentions.toDF("e", "f"), "e", "f", k = 2)
      .as[(String, String, Long, Double, Long)].collect()
    val v1 = out.filter(_._1 == "v1").map(_._4).sum
    assert(v1 < 1.0)
  }

  test("ties rank deterministically by form ascending") {
    val df = Seq(("e", "zz"), ("e", "aa")).toDF("e", "f")
    val out = AliasTable.build(df, "e", "f", k = 2)
      .as[(String, String, Long, Double, Long)].collect().sortBy(_._5)
    assert(out.map(_._2).toSeq == Seq("aa", "zz"))
  }

  test("null entities/forms drop; layout invariant") {
    val df = Seq((Some("e"), Some("x")), (None, Some("y")), (Some("e"), None))
      .toDF("e", "f")
    val out = AliasTable.build(df, "e", "f").collect()
    assert(out.length == 1)
    val big = (1 to 400).map(i => (s"e${i % 5}", s"f${i % 13}")).toDF("e", "f")
    val a = AliasTable.build(big.repartition(3), "e", "f", k = 4).collect().toSet
    val b = AliasTable.build(big.repartition(23), "e", "f", k = 4).collect().toSet
    assert(a == b)
  }
}
