package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("language ID on marker-bearing text") {
    val out = Seq(
      "the cat is on the mat and it is warm",
      "le chat est sur la table et la porte",
      "der hund ist nicht hier und das ist gut",
      "el problema es que los datos son grandes",
      "xyzzy plugh").toDF("text")
      .select(TextOps.langId($"text")).as[String].collect().toSeq
    assert(out == Seq("en", "fr", "de", "es", "und"))
  }

  test("token counts: whitespace and BPE-ish") {
    val out = Seq(("hello world, 42!", 3, 7), ("", 0, 0), ("  a  ", 1, 1))
      .toDF("text", "ws", "bpe")
      .select(TextOps.tokenCountWs($"text").as("ws2"), TextOps.tokenCountBpe($"text").as("bpe2"),
        $"ws", $"bpe")
      .as[(Int, Int, Int, Int)].collect()
    // "hello world, 42!": [hello][world][,][4][2][!] = 6 BPE-ish + ws=3
    out.zip(Seq((3, 6), (0, 0), (1, 1))).foreach { case ((ws2, bpe2, _, _), (ws, bpe)) =>
      assert(ws2 == ws && bpe2 == bpe, s"got ($ws2,$bpe2) want ($ws,$bpe)")
    }
  }

  test("fingerprint: rolling polynomial hash, order-sensitive") {
    val Seq(a, b, c) = Seq("abc", "acb", "abc").toDF("text")
      .select(TextOps.fingerprint($"text")).as[Long].collect().toSeq
    val expected = "abc".foldLeft(0L)((h, ch) => (h * 31 + ch.toLong) % 2147483647L)
    assert(a == expected)
    assert(a != b) // order matters
    assert(a == c) // deterministic
  }

  test("quality score bounds and monotonicity") {
    val scores = Seq(
      "the data is in the table and it is good and the set is big and all of it is here",
      "x",
      "!!!! ???? ;;;; ::::").toDF("text")
      .select(TextOps.qualityScore($"text")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1)) // real sentence beats single char
    assert(scores(0) > scores(2)) // and beats punctuation soup
  }
}
