package graft

import graft.ops.Retrieval

class KwicSpec extends SparkSuite {
  import spark.implicits._

  private def kwic(text: String, term: String, w: Int = 3) =
    Retrieval.kwic(Seq(("d", text)).toDF("id", "text"), "id", "text", term, w)
      .select("pos", "left_ctx", "right_ctx")
      .as[(Int, String, String)].collect().sortBy(_._1).toSeq

  test("every occurrence gets its bounded context") {
    val out = kwic("a b TERM c d e TERM f", "TERM", w = 2)
    assert(out == Seq(
      (2, "a b", "c d"),
      (6, "d e", "f")))
  }

  test("document edges truncate the window instead of failing") {
    assert(kwic("TERM x y", "TERM", w = 3) == Seq((0, "", "x y")))
    assert(kwic("x y TERM", "TERM", w = 3) == Seq((2, "x y", "")))
    assert(kwic("TERM", "TERM") == Seq((0, "", "")))
  }

  test("no occurrence, empty and null docs emit nothing") {
    assert(kwic("nothing here", "TERM").isEmpty)
    val df = Seq(("a", ""), ("b", null.asInstanceOf[String])).toDF("id", "text")
    assert(Retrieval.kwic(df, "id", "text", "TERM").isEmpty)
  }

  test("exact-token match only — substrings do not hit") {
    assert(kwic("TERMS TERM xTERM", "TERM", w = 1) ==
      Seq((1, "TERMS", "xTERM")))
  }
}
