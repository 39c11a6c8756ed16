package graft

import graft.graph.Ppr

class PprSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], seeds: Seq[String],
      rounds: Int) =
    Ppr.personalized(edges.toDF("src", "dst"), seeds.toDF("id"), rounds)
      .as[(String, Long)].collect().toMap

  test("hand-computed ppb chain (alpha = 0.2, truncating divs)") {
    val edges = Seq("a" -> "b", "b" -> "c")
    val r1 = run(edges, Seq("a"), 1)
    assert(r1 == Map("a" -> 200000000L, "b" -> 800000000L))
    val r2 = run(edges, Seq("a"), 2)
    // a: restart only; b: push from a (2e8*8/10); c: push from b (8e8*8/10)
    assert(r2 == Map("a" -> 200000000L, "b" -> 160000000L,
      "c" -> 640000000L))
  }

  test("seed mass splits by |S|; restart keeps seeds alive forever") {
    val edges = Seq("s1" -> "x", "s2" -> "x")
    val out = run(edges, Seq("s1", "s2"), 5)
    assert(out("s1") == out("s2") && out("s1") == 100000000L)
    assert(out("x") > 0)
  }

  test("dangling mass truncates away: total is monotonically non-increasing") {
    val edges = Seq("a" -> "b", "b" -> "c") // c dangles
    val totals = (1 to 4).map(r => run(edges, Seq("a"), r).values.sum)
    totals.sliding(2).foreach { case Seq(x, y) => assert(y <= x) }
  }

  test("locality: mass decays with distance from the seed (ranking sanity)") {
    // binary tree rooted at n1, seed n1: nearer levels outrank farther ones
    val edges = (2 to 31).map(i => s"n${i / 2}" -> s"n$i")
    val out = run(edges, Seq("n1"), 6)
    assert(out("n2") == out("n3"))
    assert(out("n2") > out("n4") && out("n4") > out("n8"))
  }

  test("layout invariant (exact integers)") {
    val edges = (2 to 200).map(i => s"n${i / 2}" -> s"n$i")
    val a = Ppr.personalized(edges.toDF("src", "dst").repartition(1),
      Seq("n1", "n7").toDF("id"), 4).as[(String, Long)].collect().toSet
    val b = Ppr.personalized(edges.toDF("src", "dst").repartition(9),
      Seq("n1", "n7").toDF("id"), 4).as[(String, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
