package graft

import graft.functions.TextNorm
import org.apache.spark.sql.functions._

class TextNormSpec extends SparkSuite {
  import spark.implicits._

  private def norm(ss: String*): Seq[String] =
    ss.toDF("t").select(TextNorm.normCol(col("t"))).as[String].collect().toSeq

  test("accents strip, case folds — the linker-key fold") {
    assert(norm("Société Générale") == Seq("societe generale"))
    assert(norm("ÀÉÎÖÜ ç ñ Ruß") == Seq("aeiou c n ruß"))
    assert(norm("Zürich–Müller & Cie") == Seq("zurich–muller & cie"))
  }

  test("ASCII text only lowercases; empty survives; scalar == Column path") {
    assert(norm("Hello WORLD 42", "") == Seq("hello world 42", ""))
    Seq("Crème BRÛLÉE", "naïve", "x").foreach { s =>
      assert(norm(s) == Seq(TextNorm.normalize(s)))
    }
  }

  test("null-safe and registered in SQL via the session extension") {
    val out = Seq(Option("Ça Va"), None).toDF("t")
      .select(TextNorm.normCol(col("t"))).as[Option[String]].collect().toSet
    assert(out == Set(Some("ca va"), None))
    // GraftExtensions sessions can call it by name from SQL
    if (spark.catalog.functionExists("text_norm")) {
      val viaSql = spark.sql("SELECT text_norm('Déjà Vu')").as[String].head()
      assert(viaSql == "deja vu")
    }
  }

  test("idempotent: normalizing a normalized string is a no-op") {
    Seq("Société Générale", "ÀÉÎÖÜ", "plain").foreach { s =>
      val once = TextNorm.normalize(s)
      assert(TextNorm.normalize(once) == once)
    }
  }
}
