package graft

import graft.ops.Segmenter

class SegmenterSpec extends SparkSuite {
  import spark.implicits._

  private def sents(text: String): Seq[(Int, String, String)] =
    Segmenter.sentenceTable(Seq(("d", text)).toDF("doc_id", "text"),
        "text", Seq("doc_id"))
      .select("sent_id", "sentence", "lang")
      .as[(Int, String, String)].collect().sortBy(_._1).toSeq

  test("terminator+whitespace splits; trailing terminator stays attached") {
    val out = sents("First one. Second!  Third one? tail without end")
    assert(out.map(_._2) == Seq("First one.", "Second!", "Third one?",
      "tail without end"))
    assert(out.map(_._1) == Seq(0, 1, 2, 3))
  }

  test("abbrev-free contract: dots WITHOUT following whitespace never split") {
    assert(sents("v1.2.3 stays whole. next").map(_._2) ==
      Seq("v1.2.3 stays whole.", "next"))
  }

  test("per-sentence language id sees the mix a doc-level vote hides") {
    val out = sents("The quick brown fox and the lazy dog. " +
      "Le montant de la facture est de la plus haute importance.")
    assert(out.map(_._3) == Seq("en", "fr"))
  }

  test("blank fragments drop; null/empty docs emit nothing") {
    assert(sents("   \t \n ").isEmpty)
    // punctuation-only fragments are non-blank: they survive as sentences
    assert(sents("..  .. ").map(_._2) == Seq("..", ".."))
    val df = Seq(("a", null.asInstanceOf[String]), ("b", "")).toDF("doc_id", "text")
    assert(Segmenter.sentenceTable(df, "text", Seq("doc_id")).isEmpty)
  }

  test("languageMix: dominant by count, mixed flag ignores 'und'") {
    val docs = Seq(
      ("mixed", "The quick brown fox jumps over the lazy dog. " +
        "Le montant de la facture est pour vous. " +
        "Et la somme est grande pour le client."),
      ("mono", "The quick brown fox. And the lazy dog again."),
      ("und", "zzz qqq. xxx www.")).toDF("doc_id", "text")
    val out = Segmenter.languageMix(docs, "text", "doc_id")
      .select("doc_id", "dominant_lang", "n_langs", "mixed")
      .as[(String, String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out("mixed") == ("fr", 2L, true))
    assert(out("mono") == ("en", 1L, false))
    assert(out("und") == ("und", 0L, false))
  }
}
