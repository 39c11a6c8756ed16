package graft

import graft.ops.Subword
import org.apache.spark.sql.functions._

class SubwordSpec extends SparkSuite {
  import spark.implicits._

  test("viterbi picks the min-cost segmentation over the committed vocab") {
    val seg = new Subword.Segmenter(Subword.defaultVocab)
    assert(seg.segment("thedata") == (Vector("the", "data"), 95L + 130L))
    assert(seg.segment("sorting") == (Vector("sort", "ing"), 145L + 85L))
    // no whole-word piece -> stem + affix composition
    assert(seg.segment("customer") == (Vector("custom", "er"), 185L + 70L))
    assert(seg.segment("stream") == (Vector("str", "eam"), 95L + 95L))
    assert(seg.segment("order") == (Vector("or", "der"), 70L + 100L))
    // unknown word falls back to chars + any affixes that help
    assert(seg.segment("zq")._2 == 200L)
    assert(seg.segment("") == (Vector.empty, 0L))
  }

  test("equal-cost tie breaks to the smallest j (longest tail piece) at " +
    "every backward step") {
    val vocab = Map("ab" -> 50L, "bc" -> 50L)
    val seg = new Subword.Segmenter(vocab)
    // a|bc and ab|c both cost 150; smallest-j rule picks the 'bc' tail
    assert(seg.segment("abc") == (Vector("a", "bc"), 150L))
  }

  test("segmentTokens is the narrow per-row projection; engine output == " +
    "the committed independent forward-DP fixture") {
    val toks = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .where(col("text").isNotNull)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .as("token"))
      .where(length(col("token")) >= 3).distinct()
    val engine = Subword.segmentTokens(toks)
      .as[(String, String, Int, Long)].collect().sortBy(_._1)
    val fixture = spark.read.parquet(
        "src/test/resources/expected/q142_expected_subword.parquet")
      .as[(String, String, Int, Long)].collect().sortBy(_._1)
    assert(engine.nonEmpty)
    assert(engine.toSeq == fixture.toSeq)
  }
}
