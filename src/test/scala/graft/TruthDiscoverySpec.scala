package graft

import graft.ops.TruthDiscovery

class TruthDiscoverySpec extends SparkSuite {
  import spark.implicits._

  private def resolve(claims: Seq[(String, String, String)], rounds: Int = 5) =
    TruthDiscovery.resolve(claims.toDF("src", "obj", "val"), rounds)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("equal-trust majority wins; duplicates from one source collapse") {
    val out = resolve(Seq(
      ("s1", "x", "a"), ("s2", "x", "a"), ("s2", "x", "a"), ("s3", "x", "b")))
    assert(out("x")._1 == "a")
    assert(out("x")._3 == 2L && out("x")._4 == 3L) // n_values, n_sources
  }

  test("learned reliability breaks a 1v1 dispute (hand-computed ppm " +
    "fixpoint)") {
    // s1 and s2 agree on o1..o4; s3 contradicts everywhere; d is s1 vs s3
    val claims =
      (1 to 4).flatMap(i => Seq(("s1", s"o$i", s"a$i"), ("s2", s"o$i", s"a$i"),
        ("s3", s"o$i", s"x$i"))) ++ Seq(("s1", "d", "good"), ("s3", "d", "bad"))
    // round 1: norms a_i = 666666, x_i = 333333, d split 500000/500000
    //   trust s1 = (4*666666+500000)/5 = 633332, s3 = 366666, s2 = 666666
    val trust = TruthDiscovery.sourceTrust(claims.toDF("src", "obj", "val"),
        rounds = 1)
      .as[(String, Long)].collect().toMap
    assert(trust == Map("s1" -> 633332L, "s2" -> 666666L, "s3" -> 366666L))
    val out = resolve(claims)
    assert(out("d")._1 == "good")
    (1 to 4).foreach(i => assert(out(s"o$i")._1 == s"a$i"))
  }

  test("symmetric tie resolves to the smallest value string") {
    val out = resolve(Seq(("s1", "x", "zeta"), ("s2", "x", "alpha")))
    assert(out("x")._1 == "alpha")
  }

  test("partition-layout invariant (exact integers, order-free sums)") {
    val claims = (0 until 300).map(i =>
      (s"s${i % 9}", s"o${i % 40}", s"v${(i * 7) % 3}"))
    val df1 = claims.toDF("src", "obj", "val").repartition(1)
    val df9 = claims.toDF("src", "obj", "val").repartition(9)
    val a = TruthDiscovery.resolve(df1).as[(String, String, Long, Long, Long)]
      .collect().toSet
    val b = TruthDiscovery.resolve(df9).as[(String, String, Long, Long, Long)]
      .collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
