package graft

import graft.tag.Taggers
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The fused Catalyst expression (invoice_field_tag) must be observably
  * identical to the declarative when-chain — on the golden corpus, on the
  * fixture corpus vocabulary, and on arbitrary generated strings
  * (ScalaCheck generators, fixed seed). Also exercises the
  * SparkSessionExtensions registration. */
class FieldTagSpec extends SparkSuite {
  import spark.implicits._

  test("registered via SparkSessionExtensions: usable from SQL") {
    val out = spark.sql("SELECT invoice_field_tag('FACTURE') AS t").as[String].head()
    assert(out == "header")
  }

  test("expression == when-chain on the golden corpus") {
    val golden = spark.read.json("src/test/resources/golden_annotations.jsonl")
    val bad = golden
      .withColumn("a", Taggers.classifyTextType(col("text")))
      .withColumn("b", call_function("invoice_field_tag", col("text")))
      .where(col("a") =!= col("b"))
    assert(bad.count() == 0)
  }

  test("property: expression == when-chain == scalar on arbitrary strings") {
    val interesting = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf("FACTURE", "12/04/2024", "a@b", "Tél 06", "rue X", "12.3-4",
        "", " ", "€", "ht", "N' Fact-4796", "Rabat 10100", "+212", "a/b"),
      Gen.listOf(Gen.oneOf('a', '1', '/', '-', '.', '@', '€', ' ', 'T'))
        .map(_.mkString))
    val texts = Gen.listOfN(500, interesting)
      .apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)
    assert(texts.size == 500)
    val rows = texts.toDF("text").select(
      col("text"),
      Taggers.classifyTextType(col("text")).as("chain"),
      call_function("invoice_field_tag", col("text")).as("expr"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getString(1) == r.getString(2), s"chain!=expr for '$t'")
      assert(r.getString(2) == graft.functions.FieldTag.classify(t), s"expr!=scalar for '$t'")
    }
  }

  test("codegen and interpreted paths agree (null handling included)") {
    val df = Seq(Some("FACTURE"), None, Some("")).toDF("text")
    val out = df.select(call_function("invoice_field_tag", col("text"))).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("header"), None, Some("text")))
  }
}
