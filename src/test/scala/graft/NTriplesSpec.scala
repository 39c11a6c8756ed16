package graft

import graft.sources.NTriples
import org.apache.spark.sql.functions._

class NTriplesSpec extends SparkSuite {
  import spark.implicits._

  private def lineOf(subj: String, pred: String, obj: String, isIri: Boolean,
      lang: String = null, dt: String = null): String =
    Seq((subj, pred, obj)).toDF("s", "p", "o")
      .select(NTriples.line(col("s"), col("p"), col("o"), lit(isIri),
        lit(lang), lit(dt)).as("l"))
      .as[String].head()

  test("IRI object line") {
    assert(lineOf("urn:a", "urn:p", "urn:b", isIri = true) ==
      "<urn:a> <urn:p> <urn:b> .")
  }

  test("plain, lang-tagged and typed literal lines") {
    assert(lineOf("urn:a", "urn:p", "hi", isIri = false) ==
      "<urn:a> <urn:p> \"hi\" .")
    assert(lineOf("urn:a", "urn:p", "hi", isIri = false, lang = "en-GB") ==
      "<urn:a> <urn:p> \"hi\"@en-GB .")
    assert(lineOf("urn:a", "urn:p", "5", isIri = false, dt = "urn:int") ==
      "<urn:a> <urn:p> \"5\"^^<urn:int> .")
  }

  test("every ECHAR escapes, backslash first (the double-escape trap)") {
    // raw: \n\t\r"\  — expect \\n \\t \\r \\" \\\\ in the emitted line
    val raw = "a\\b\"c\nd\re\tf"
    assert(lineOf("urn:a", "urn:p", raw, isIri = false) ==
      "<urn:a> <urn:p> \"a\\\\b\\\"c\\nd\\re\\tf\" .")
  }

  test("escape/unescape round-trips hostile literals") {
    val nasty = Seq("", "\\", "\\\\", "\\n", "a\nb", "\"", "\\\"", "tab\there",
      "mixed \\ \" \n \r \t end", "\\t", "trailing\\")
    val df = nasty.toDF("o")
    val back = df.select(NTriples.unescapeLiteral(NTriples.escapeLiteral(col("o"))).as("r"))
      .as[String].collect()
    assert(back.toSeq == nasty)
  }

  test("write/read round trip across all three object forms") {
    val dir = java.nio.file.Files.createTempDirectory("nt").toString + "/out"
    val rows = Seq(
      ("urn:a", "urn:p", "urn:b", true, null: String, null: String),
      ("urn:a", "urn:q", "plain text", false, null: String, null: String),
      ("urn:c", "urn:q", "bonjour \"le\\monde\"\n", false, "fr", null: String),
      ("urn:d", "urn:r", "42", false, null: String, "urn:int"))
    NTriples.writeNT(rows.toDF("subj", "pred", "obj", "obj_is_iri", "lang", "datatype"), dir)
    val back = NTriples.readNT(spark, dir)
    assert(back.where(col("bad_line").isNotNull).count() == 0)
    val got = back.select("subj", "pred", "obj", "obj_is_iri", "lang", "datatype")
      .as[(String, String, String, Boolean, Option[String], Option[String])]
      .collect().toSet
    assert(got == rows.map(r => (r._1, r._2, r._3, r._4, Option(r._5), Option(r._6))).toSet)
  }

  test("parser: comments and blank lines drop; garbage lands in bad_line") {
    val dir = java.nio.file.Files.createTempDirectory("nt").toString + "/in"
    val text = Seq(
      "# a comment",
      "",
      "   ",
      "<urn:a> <urn:p> \"ok\" .",
      "<urn:a> <urn:p> missing-brackets .",
      "<urn:a> <urn:p> \"unterminated .").toDF("value")
    text.coalesce(1).write.text(dir)
    val out = NTriples.readNT(spark, dir)
    assert(out.count() == 3) // comment + blanks dropped
    assert(out.where(col("bad_line").isNull).count() == 1)
    assert(out.where(col("bad_line").isNotNull).count() == 2)
    assert(out.where(col("obj") === "ok").count() == 1)
  }

  test("empty literal and whitespace-tolerant layout parse") {
    val dir = java.nio.file.Files.createTempDirectory("nt").toString + "/ws"
    Seq("  <urn:a>   <urn:p>  \"\"  .  ").toDF("value").coalesce(1).write.text(dir)
    val out = NTriples.readNT(spark, dir)
    val row = out.select("subj", "pred", "obj", "obj_is_iri").as[(String, String, String, Boolean)].head()
    assert(row == (("urn:a", "urn:p", "", false)))
  }
}
