package graft

import graft.functions.JaroWinkler
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSuite {
  import spark.implicits._

  private def jw(a: String, b: String): Double = JaroWinkler.jaroWinkler(a, b)

  test("the canonical Winkler paper cases") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
  }

  test("the 0.7 boost threshold: a common prefix below it stays unboosted") {
    // jaro = 0.5352…, prefix 3 — DuckDB leaves this unboosted
    assert(math.abs(jw("abcxxxxx", "abcyyyyyyyyyy") - 0.5352564102564102) < 1e-12)
  }

  test("edges: empty sides are 0, equality is 1, window-0 disjoint is 0") {
    assert(jw("", "") == 0.0 && jw("abc", "") == 0.0)
    assert(jw("abcdef", "abcdef") == 1.0 && jw("a", "a") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window = 0: no cross-position matches
  }

  test("codepoint semantics: an accent is ONE edit (byte engines count two)") {
    // codepoint jaro = 0.763888…, prefix 4 → jw = 0.858333…; DuckDB's
    // byte-based scorer gives 0.8367 — the documented divergence
    assert(math.abs(jw("société générale", "societe generale")
      - 0.8583333333333333) < 1e-12)
  }

  test("Column path == scalar path, null-safe, symmetric") {
    val pairs = Seq(("martha", "marhta"), ("vendor sa", "vendor s.a."),
      ("acme corp", "acme corporation"))
    val viaCol = pairs.toDF("a", "b")
      .select(JaroWinkler.jwCol(col("a"), col("b"))).as[Double].collect()
    assert(viaCol.toSeq == pairs.map(p => jw(p._1, p._2)))
    pairs.foreach(p => assert(jw(p._1, p._2) == jw(p._2, p._1)))
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler.jwCol(col("a"), col("b"))).as[Option[Double]].head()
    assert(withNull.isEmpty)
  }
}
