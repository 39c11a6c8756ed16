package graft

import graft.graph.Scan

class ScanSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], mu: Int = 2) =
    Scan.cluster(edges.toDF("src", "dst"), mu = mu)
      .as[(String, String, Option[String])].collect()
      .map { case (id, role, c) => id -> ((role, c)) }.toMap

  // two K4s joined through a single bridge node h — the paper's shape:
  // the cliques cluster, h bridges both
  private val twoCliquesHub = {
    val k = (p: String) => for { u <- 0 until 4; v <- 0 until 4 if u < v }
      yield (s"$p$u", s"$p$v")
    k("a") ++ k("b") ++ Seq(("a0", "h"), ("b0", "h"))
  }

  test("two cliques + bridge: clique members are cores in two clusters, " +
    "the bridge is a hub") {
    val got = run(twoCliquesHub)
    val aC = got("a1")._2
    val bC = got("b1")._2
    assert(aC.isDefined && bC.isDefined && aC != bC)
    for (p <- Seq("a", "b"); i <- 0 until 4)
      assert(got(s"$p$i")._1 == "core" &&
        got(s"$p$i")._2 == (if (p == "a") aC else bC))
    assert(got("h") == (("hub", None)))
  }

  test("a pendant off one cluster is an outlier (one adjacent cluster), " +
    "not a hub") {
    val got = run(twoCliquesHub ++ Seq(("a0", "x")))
    assert(got("x") == (("outlier", None)))
  }

  test("within-clique sigma = 1 passes any eps; a chain has no cores at " +
    "mu=2 under the default eps and every node is an outlier") {
    val chain = Seq(("c0", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c4"))
    // edge (c1,c2): cn=0, sigma = 2/sqrt(9) = 2/3 >= 3/5 → ε-edge; ends:
    // sigma = 2/sqrt(6) ≈ 0.816 → ε-edge. So interior nodes DO core.
    val got = run(chain)
    assert(got.values.count(_._1 == "core") >= 3) // c1, c2, c3
    // with a stricter eps = 9/10 nothing passes except nothing: all
    // non-core, no clustered neighbors → all outliers
    val strict = Scan.cluster(chain.toDF("src", "dst"),
        epsNum = 9, epsDen = 10, mu = 2)
      .as[(String, String, Option[String])].collect()
    assert(strict.forall(r => r._2 == "outlier" && r._3.isEmpty))
  }

  test("border attachment: a node with ONE eps-edge to a core joins that " +
    "core's cluster as border (mu excludes it from core-ness)") {
    val k4 = for { u <- 0 until 4; v <- 0 until 4 if u < v }
      yield (s"a$u", s"a$v")
    // t hangs off a0 AND a1: sigma(t,a0) with cn(t,a0) = 1 (a1), deg t = 2:
    // g = 3, sqrt(3·5)... 25·9 >= 9·15 → 225 >= 135 ✓ ε-edge; but only 2
    // eps-edges → with mu=3 t is a border, not core
    val got = Scan.cluster((k4 ++ Seq(("t", "a0"), ("t", "a1")))
        .toDF("src", "dst"), mu = 3)
      .as[(String, String, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("t")._1 == "border" && got("t")._2 == got("a0")._2)
    assert((0 until 4).forall(i => got(s"a$i")._1 == "core"))
  }
}
