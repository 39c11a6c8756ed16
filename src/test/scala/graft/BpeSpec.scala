package graft

import graft.ops.Bpe

/** Vocab-driven BPE token counting: the iterative lowest-rank encoder
  * (engine) must agree with the sequential merge-replay twin (the q48
  * oracle's implementation), and behave sanely on adversarial inputs. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private val tok = new Bpe.Tokenizer(Bpe.defaultMerges)

  test("committed merge table loads: non-trivial, unique, well-formed") {
    val m = Bpe.defaultMerges
    assert(m.size >= 100, s"merge table too small: ${m.size}")
    assert(m.distinct.size == m.size, "duplicate merges")
    assert(m.forall { case (a, b) => a.nonEmpty && b.nonEmpty })
    // non-saturated: some corpus word still splits into multiple tokens
    assert(tok.encodeWord("antidisestablishment").length > 1)
    // and merges actually merge: a trained word compresses below char count
    assert(tok.encodeWord("montant").length < "montant".length)
  }

  test("iterative lowest-rank encoder == sequential merge replay (equivalence under test)") {
    val adversarial = Seq(
      "", " ", "aaaa", "aaaaaaa", "ababab", "hash hashhash rehash",
      "facture montant total ttc 1 234,56 MAD!!",
      "scan-scan_scan scan3scan", "ZZZZ unseen qqqq xyzzy",
      "merge partition shuffle broadcast join join join",
      "e r er err erer", "1234567890", "...,,,;;;")
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text").as[String].take(100).toSeq
    (adversarial ++ corpus).foreach { t =>
      assert(tok.countTokens(t) ==
        graft.tools.GenFixtures.bpeCountSequential(t, Bpe.defaultMerges),
        s"divergence on '${t.take(60)}'")
    }
  }

  test("counting properties: bounds, singleton classes, whitespace-invariance") {
    assert(tok.countTokens("") == 0)
    assert(tok.countTokens("   \t\n ") == 0)
    // digits and marks count 1 each, never merged
    assert(tok.countTokens("1 2 3") == 3)
    assert(tok.countTokens("12,34") == 5)
    // BPE count bounded by non-space char count, and >= pre-token count
    val s = "montant facture 123 total!"
    val chars = s.count(!_.isWhitespace)
    val pre = Bpe.PreTokenRegex.findAllIn(s).length
    val n = tok.countTokens(s)
    assert(n <= chars && n >= pre, s"n=$n chars=$chars pre=$pre")
    // the vocab cap: regex pre-tokenizer (TextOps.tokenCountBpe) is an
    // UPPER bound on words only when merges exist; full-text BPE count is
    // never below it... (BPE splits words the regex counts once) — so the
    // regex count is a LOWER bound
    assert(n >= pre)
  }

  test("distributed tokenCounts == driver loop; committed q48 fixture is current") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val live = graft.ops.Bpe.tokenCounts(docs)
      .as[(Long, Int)].collect().toMap
    val driver = docs.select($"doc_id".cast("long"), $"text").as[(Long, String)]
      .collect().map { case (id, t) => id -> tok.countTokens(t) }.toMap
    assert(live == driver)
    val fixture = spark.read
      .parquet("src/test/resources/expected/q48_expected_bpe.parquet")
      .as[(Long, Int)].collect().toMap
    assert(live == fixture, "committed q48 fixture drifted — rerun tools.GenFixtures")
  }

  test("tokenCounts preserves the id column's type (string ids pass through)") {
    val df = Seq(("inv-000042", "facture totale"), ("inv-000043", "montant du"))
      .toDF("doc_id", "text")
    val out = graft.ops.Bpe.tokenCounts(df)
    assert(out.schema("doc_id").dataType == org.apache.spark.sql.types.StringType)
    val m = out.as[(String, Int)].collect().toMap
    assert(m.keySet == Set("inv-000042", "inv-000043"))
    assert(m("inv-000042") == tok.countTokens("facture totale"))
    // null text counts as empty, not an NPE
    val withNull = Seq(("a", "x"), ("b", null)).toDF("doc_id", "text")
    assert(graft.ops.Bpe.tokenCounts(withNull).as[(String, Int)]
      .collect().toMap.apply("b") == 0)
  }
}
