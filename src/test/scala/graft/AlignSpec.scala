package graft

import graft.ops.Align
import org.apache.spark.sql.functions.col

class AlignSpec extends SparkSuite {
  import spark.implicits._

  private def run(pairs: Seq[(String, String, String)], parts: Int = 3) =
    Align.lcsTokens(pairs.toDF("k", "l", "r").repartition(parts),
      col("k"), col("l"), col("r"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  /** Independent reference: recursive memoized LCS (top-down, no rolling
    * rows, no iteration order shared with the engine). */
  private def recLcs(a: Seq[String], b: Seq[String]): Int = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Int]
    def go(i: Int, j: Int): Int =
      if (i == 0 || j == 0) 0
      else memo.getOrElseUpdate((i, j),
        if (a(i - 1) == b(j - 1)) go(i - 1, j - 1) + 1
        else math.max(go(i - 1, j), go(i, j - 1)))
    go(a.length, b.length)
  }

  test("hand cases: identity, disjoint, classic interleave") {
    val got = run(Seq(
      ("same", "a b c", "a b c"),
      ("disj", "a b c", "x y"),
      ("mix", "a b c d e", "b x d c e"),
      ("empty", "", "a b"),
      ("both_empty", "  ", "")))
    assert(got("same") === ((3L, 3L, 3L, 0L, 0L)))
    assert(got("disj") === ((3L, 2L, 0L, 3L, 2L)))
    // LCS(abcde, bxdce) = b d e (or b c e) -> 3
    assert(got("mix") === ((5L, 5L, 3L, 2L, 2L)))
    assert(got("empty") === ((0L, 2L, 0L, 0L, 2L)))
    assert(got("both_empty") === ((0L, 0L, 0L, 0L, 0L)))
  }

  test("repeated tokens counted positionally, not as a set") {
    // LCS(a a b, a b a) = 2 ("a b" or "a a")
    assert(run(Seq(("r", "a a b", "a b a")))("r") === ((3L, 3L, 2L, 1L, 1L)))
  }

  test("null text treated as empty; whitespace runs collapse") {
    val got = run(Seq(("n", null, "a b"), ("w", " a   b ", "a b")))
    assert(got("n") === ((0L, 2L, 0L, 0L, 2L)))
    assert(got("w") === ((2L, 2L, 2L, 0L, 0L)))
  }

  test("parity with memoized recursion on random pairs (incl. asymmetric lengths)") {
    val vocab = Vector("a", "b", "c", "d", "e")
    val rnd = new scala.util.Random(5)
    val pairs = (0 until 60).map { i =>
      val n = rnd.nextInt(30); val m = rnd.nextInt(30)
      (f"p$i%02d", Seq.fill(n)(vocab(rnd.nextInt(5))).mkString(" "),
        Seq.fill(m)(vocab(rnd.nextInt(5))).mkString(" "))
    }
    val got = run(pairs, parts = 5)
    for ((k, l, r) <- pairs) {
      val (a, b) = (l.split(" ").filter(_.nonEmpty).toSeq,
        r.split(" ").filter(_.nonEmpty).toSeq)
      val want = recLcs(a, b)
      assert(got(k) === ((a.length.toLong, b.length.toLong, want.toLong,
        (a.length - want).toLong, (b.length - want).toLong)), s"pair $k")
    }
  }

  // ---- Smith–Waterman local alignment -----------------------------------

  private def runSw(pairs: Seq[(String, String, String)], parts: Int = 3) =
    Align.swLocal(pairs.toDF("k", "l", "r").repartition(parts),
      col("k"), col("l"), col("r"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  /** Independent reference: the FULL H table materialized, best cell by
    * explicit row-major argmax — no rolling rows. */
  private def swFull(a: Seq[String], b: Seq[String]): (Long, Long, Long) = {
    val h = Array.ofDim[Int](a.length + 1, b.length + 1)
    var best = 0; var bi = 0; var bj = 0
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val s = if (a(i - 1) == b(j - 1)) 2 else -1
      h(i)(j) = math.max(0, math.max(h(i - 1)(j - 1) + s,
        math.max(h(i - 1)(j) - 1, h(i)(j - 1) - 1)))
      if (h(i)(j) > best) { best = h(i)(j); bi = i; bj = j }
    }
    (best.toLong, bi.toLong, bj.toLong)
  }

  test("sw: embedded fragment scores locally where global measures dilute") {
    val got = runSw(Seq(
      ("frag", "x x x a b c y y y", "q a b c q q"),
      ("same", "a b c", "a b c"),
      ("disj", "a b", "x y"),
      ("empty", "", "a")))
    assert(got("frag") === ((6L, 6L, 4L))) // "a b c" ends at l-pos 6, r-pos 4
    assert(got("same") === ((6L, 3L, 3L)))
    assert(got("disj") === ((0L, 0L, 0L)))
    assert(got("empty") === ((0L, 0L, 0L)))
  }

  test("sw: gap bridging beats restart when the bridge is cheap") {
    // "a b c d" vs "a b x c d": match run resumes over one gap:
    // 2+2-1+2+2 = 7
    assert(runSw(Seq(("g", "a b c d", "a b x c d")))("g")._1 === 7L)
  }

  test("sw: full-table parity on random pairs incl. tie position law") {
    val vocab = Vector("a", "b", "c")
    val rnd = new scala.util.Random(11)
    val pairs = (0 until 50).map { i =>
      (f"p$i%02d", Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(3))).mkString(" "),
        Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(3))).mkString(" "))
    }
    val got = runSw(pairs, parts = 5)
    for ((k, l, r) <- pairs)
      assert(got(k) === swFull(l.split(" ").filter(_.nonEmpty).toSeq,
        r.split(" ").filter(_.nonEmpty).toSeq), s"pair $k")
  }
}
