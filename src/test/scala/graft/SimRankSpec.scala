package graft

import graft.graph.SimRank

class SimRankSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], rounds: Int) =
    SimRank.similarity(edges.toDF("src", "dst"), rounds)
      .as[(String, String, Long)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap

  test("in-twins score C = 0.8 after one round and stay there; " +
    "half-shared in-neighborhoods score C/2") {
    // i → a, i → b (twins); i → c, j → c (c shares only i with a)
    val e = Seq(("i", "a"), ("i", "b"), ("i", "c"), ("j", "c"))
    val s1 = run(e, 1)
    assert(s1(("a", "b")) == 800000L) // 4·10^6 div (5·1·1)
    assert(s1(("a", "c")) == 400000L) // 4·10^6 div (5·1·2)
    val s3 = run(e, 3)
    assert(s3(("a", "b")) == 800000L) // s(i,i) = 10^6 keeps twins at C
  }

  test("pairs with no in-neighbors on either side never score; " +
    "sources never pair") {
    val e = Seq(("r", "a"), ("r", "b"), ("s", "x"))
    val s = run(e, 3)
    // r and s have no in-edges: no (r,s) pair; a/b vs x share no in-nbr
    assert(!s.contains(("r", "s")) && !s.contains(("a", "x")))
    assert(s.keySet == Set(("a", "b")))
  }

  test("engine matches an independent sequential integer replay on a " +
    "dense little digraph, every round") {
    // deterministic 8-node digraph with varied in-degrees and a 2-cycle
    val n = 8
    val edges = (for {
      u <- 0 until n; v <- 0 until n
      if u != v && (u * 7 + v * 3) % 5 < 2
    } yield (s"n$u", s"n$v")).distinct
    // reference: dense matrix, nested loops, same ppm truncating division
    val idx = (0 until n).map(i => s"n$i")
    val in = idx.map(v => edges.filter(_._2 == v).map(_._1)).toArray
    var ref = Array.tabulate(n, n)((i, j) => if (i == j) 1000000L else 0L)
    for (r <- 1 to 3) {
      val nxt = Array.tabulate(n, n) { (i, j) =>
        if (i == j) 1000000L
        else {
          val ia = in(i); val jb = in(j)
          if (ia.isEmpty || jb.isEmpty) 0L
          else {
            var acc = 0L
            for (x <- ia; y <- jb)
              acc += ref(idx.indexOf(x))(idx.indexOf(y))
            (4L * acc) / (5L * ia.length * jb.length)
          }
        }
      }
      ref = nxt
      val got = run(edges, r)
      for (i <- 0 until n; j <- (i + 1) until n) {
        val expect = ref(i)(j)
        val key = (idx(i), idx(j))
        if (expect > 0) assert(got(key) == expect,
          s"round $r pair $key: got ${got.get(key)}, want $expect")
        else assert(!got.contains(key), s"round $r pair $key should be 0")
      }
    }
  }

  test("symmetry: reversing pair orientation in the edge list does not " +
    "change scores (state is maintained symmetrically)") {
    val e = Seq(("i", "a"), ("i", "b"), ("j", "a"), ("j", "b"), ("k", "b"))
    val s = run(e, 2)
    // a: in {i,j}; b: in {i,j,k}; round1 num = s0 diag hits = 2·10^6
    assert(s(("a", "b")) == (4L * 2000000L) / (5L * 2 * 3))
  }
}
