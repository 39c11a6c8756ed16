package graft

import graft.ops.Chunker
import org.apache.spark.sql.functions.col

class ChunkerSpec extends SparkSuite {
  import spark.implicits._

  private def chunks(text: String, window: Int, stride: Int) =
    Chunker.chunk(Seq(("d1", text)).toDF("doc_id", "text"), "text",
        Seq("doc_id"), window, stride)
      .select("chunk_id", "start_tok", "n_tok", "chunk_text")
      .as[(Int, Int, Int, String)].collect().sortBy(_._1).toSeq

  test("overlapping windows with a short tail") {
    val text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    assert(chunks(text, window = 4, stride = 3) == Seq(
      (0, 0, 4, "t0 t1 t2 t3"),
      (1, 3, 4, "t3 t4 t5 t6"),
      (2, 6, 4, "t6 t7 t8 t9"),
      (3, 9, 1, "t9")))
  }

  test("stride == window tiles without overlap; exact multiple has no tail") {
    val text = "a b c d e f"
    assert(chunks(text, window = 3, stride = 3) == Seq(
      (0, 0, 3, "a b c"), (1, 3, 3, "d e f")))
  }

  test("doc shorter than the window is one whole chunk") {
    assert(chunks("only two", window = 64, stride = 48) ==
      Seq((0, 0, 2, "only two")))
  }

  test("empty, whitespace-only, and null docs yield no chunks") {
    val df = Seq(("a", ""), ("b", "   \t  "), ("c", null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Chunker.chunk(df, "text", Seq("doc_id"), 4, 2).isEmpty)
  }

  test("tokenization matches the curation-family whitespace rule") {
    // tabs/newlines/multi-space collapse; leading/trailing trimmed
    assert(chunks("  x\t\ty \n z  ", window = 2, stride = 2) == Seq(
      (0, 0, 2, "x y"), (1, 2, 1, "z")))
  }

  test("no span of <= window - stride tokens is split without a whole copy") {
    val n = 53; val window = 8; val stride = 5
    val text = (0 until n).map(i => s"w$i").mkString(" ")
    val out = chunks(text, window, stride)
    val covered = out.map(c => (c._2, c._2 + c._3)) // [start, end)
    val spanLen = window - stride
    (0 to n - spanLen).foreach { s =>
      assert(covered.exists { case (lo, hi) => lo <= s && s + spanLen <= hi },
        s"span [$s, ${s + spanLen}) appears whole in no chunk")
    }
  }

  // ---- topic boundaries (integer TextTiling) ----------------------------

  private def bounds(docs: Seq[(String, String)], w: Int = 5,
      minDepth: Long = 100000L): Map[String, Seq[(Long, Long, Long)]] =
    Chunker.topicBoundaries(docs.toDF("id", "text").repartition(3),
        col("id"), col("text"), w, minDepth)
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq).toMap

  /** Independent reference: sorted-array intersection sims + an explicit
    * rule scan (no shared code with the engine's Set-based path). */
  private def ref(text: String, w: Int, minDepth: Long): Seq[(Long, Long, Long)] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    if (n < 2 * w + 2) return Seq.empty
    val gaps = (w to (n - w)).toVector
    def uniq(a: Array[String]) = a.distinct.sorted
    val sim = gaps.map { g =>
      val l = uniq(toks.slice(g - w, g)); val r = uniq(toks.slice(g, g + w))
      val inter = l.count(x => java.util.Arrays.binarySearch(
        r.asInstanceOf[Array[AnyRef]], x) >= 0).toLong
      1000000L * inter / (l.length + r.length - inter)
    }
    for {
      i <- 1 until gaps.length - 1
      d = (sim(i - 1) - sim(i)) + (sim(i + 1) - sim(i))
      if sim(i - 1) > sim(i) && sim(i) <= sim(i + 1) && d >= minDepth
    } yield (gaps(i).toLong, sim(i), d)
  }

  test("topic: a planted two-topic seam is the deepest boundary") {
    val a = Seq.fill(4)("alpha beta gamma delta eps").mkString(" ")
    val b = Seq.fill(4)("omega psi chi phi tau").mkString(" ")
    val got = bounds(Seq(("d", s"$a $b")))("d")
    assert(got.nonEmpty)
    // the seam is after token 20; the deepest boundary sits at it
    val deepest = got.maxBy(_._3)
    assert(deepest._1 === 20L)
    assert(deepest._2 === 0L) // zero lexical overlap across the seam
  }

  test("topic: uniform text yields no boundary; short docs yield none") {
    val uni = Seq.fill(10)("a b c d e").mkString(" ")
    assert(bounds(Seq(("u", uni))).getOrElse("u", Seq.empty).isEmpty)
    assert(bounds(Seq(("s", "a b c"))).isEmpty)
    assert(bounds(Seq(("n", null))).isEmpty)
  }

  test("topic: independent-reference parity on random mixed docs") {
    val rnd = new scala.util.Random(71)
    val va = Vector("a1", "a2", "a3", "a4")
    val vb = Vector("b1", "b2", "b3", "b4")
    val docs = (0 until 15).map { i =>
      val parts = (0 until 3 + rnd.nextInt(3)).map { _ =>
        val v = if (rnd.nextBoolean()) va else vb
        Seq.fill(6 + rnd.nextInt(8))(v(rnd.nextInt(4))).mkString(" ")
      }
      (f"d$i%02d", parts.mkString(" "))
    }
    for (minDepth <- Seq(0L, 100000L, 400000L)) {
      val got = bounds(docs, w = 5, minDepth = minDepth)
      docs.foreach { case (id, t) =>
        assert(got.getOrElse(id, Seq.empty) === ref(t, 5, minDepth),
          s"doc $id depth $minDepth")
      }
    }
  }

  test("topic: plateau minima resolve to the FIRST gap (the lax-right rule)") {
    // construct sim plateau: identical windows around two adjacent gaps
    val t = "x x x x y y y y y x x x x"
    val got = bounds(Seq(("p", t)), w = 3, minDepth = 0L)
    val r = ref(t, 3, 0L)
    assert(got.getOrElse("p", Seq.empty) === r)
  }
}
