package graft

import graft.ops.Chunker

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
}
