package graft

import graft.graph.Taxonomy
import org.apache.spark.sql.functions.col

class TaxonomySpec extends SparkSuite {
  import spark.implicits._

  private def runLca(parents: Seq[(String, String)],
      pairs: Seq[(String, String)], parts: Int = 3) =
    Taxonomy.lcaPairs(
      parents.toDF("id", "parent").repartition(parts),
      col("id"), col("parent"),
      pairs.toDF("a", "b"), col("a"), col("b"))
      .as[(String, String, String, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7)))
      .toMap

  /** Independent reference: per-node parent WALK (one step at a time —
    * no doubling), LCA by marking a's ancestor set then walking b up. */
  private def naive(parents: Seq[(String, String)],
      pairs: Seq[(String, String)]) = {
    val pm = parents.toMap
    def chain(x: String): List[String] = { // x up to root, inclusive
      var c = List(x); var cur = x
      while (pm.contains(cur)) { cur = pm(cur); c = cur :: c }
      c.reverse // x first ... root last
    }
    def depth(x: String): Long = chain(x).length - 1L
    val nodes = (parents.map(_._1) ++ parents.map(_._2)).toSet
    pairs.filter(p => nodes(p._1) && nodes(p._2)).flatMap { case (a, b) =>
      val ca = chain(a).toSet
      chain(b).find(ca) match {
        case Some(l) =>
          val (da, db, dl) = (depth(a), depth(b), depth(l))
          val wp = if (da + db == 0) 1000000L else 2000000L * dl / (da + db)
          Some((a, b) -> ((l, da, db, dl, wp)))
        case None => None // different trees: no common ancestor
      }
    }.toMap
  }

  test("chain: LCA is the shallower node; wu-palmer exact") {
    val par = Seq(("b", "a"), ("c", "b"), ("d", "c"))
    val got = runLca(par, Seq(("d", "b"), ("c", "d"), ("a", "d")))
    assert(got(("d", "b")) === (("b", 3L, 1L, 1L, 500000L)))
    assert(got(("c", "d")) === (("c", 2L, 3L, 2L, 800000L)))
    assert(got(("a", "d")) === (("a", 0L, 3L, 0L, 0L)))
  }

  test("siblings meet at the parent; cousins at the grandparent") {
    val par = Seq(("l1", "m1"), ("l2", "m1"), ("l3", "m2"), ("m1", "r"), ("m2", "r"))
    val got = runLca(par, Seq(("l1", "l2"), ("l1", "l3"), ("m1", "m2")))
    assert(got(("l1", "l2")) === (("m1", 2L, 2L, 1L, 500000L)))
    assert(got(("l1", "l3")) === (("r", 2L, 2L, 0L, 0L)))
    assert(got(("m1", "m2")) === (("r", 1L, 1L, 0L, 0L)))
  }

  test("identical nodes similarity 1.0, including the root (zero depths)") {
    val par = Seq(("b", "a"))
    val got = runLca(par, Seq(("b", "b"), ("a", "a")))
    assert(got(("b", "b")) === (("b", 1L, 1L, 1L, 1000000L)))
    assert(got(("a", "a")) === (("a", 0L, 0L, 0L, 1000000L)))
  }

  test("pairs across different trees or outside the forest are dropped") {
    val par = Seq(("b", "a"), ("y", "x"))
    val got = runLca(par, Seq(("b", "y"), ("b", "zzz"), ("b", "a")))
    assert(got.keySet === Set(("b", "a")))
  }

  test("parity with the sequential parent walk on random forests") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 4) {
      val n = 40 + rnd.nextInt(60)
      // two roots; each node's parent is a lower index (random shape)
      val par = (2 until n).map(i => (f"n$i%03d", f"n${rnd.nextInt(i)}%03d"))
      val pairs = (0 until 50).map { _ =>
        (f"n${rnd.nextInt(n)}%03d", f"n${rnd.nextInt(n)}%03d")
      }
      val got = runLca(par, pairs, parts = 4)
      val want = naive(par, pairs)
      // duplicate query pairs collapse identically on both sides
      assert(got === want, s"trial $trial n=$n")
    }
  }
}
