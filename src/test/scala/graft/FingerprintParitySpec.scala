package graft

import org.apache.spark.sql.functions._

/** The native Fingerprint expression must agree with the declarative fold
  * it replaced (`aggregate(split(text, ""), 0, (h, c) -> pmod(h*31 +
  * ascii(c), 2^31-1))`) — the engine-wide PRNG every deterministic draw,
  * sample and sketch replays (q28-oracled). Checked on ASCII, empty,
  * whitespace, accented, CJK, astral (surrogate pairs), long, and
  * pipe-separated draw-key-shaped inputs. */
class FingerprintParitySpec extends SparkSuite {

  private def hofForm(c: org.apache.spark.sql.Column) =
    aggregate(split(c, ""), lit(0L),
      (h, ch) => pmod(h * 31 + ascii(ch), lit(2147483647L)))

  test("native fingerprint == interpreted HOF fold on a torture corpus") {
    import spark.implicits._
    val inputs = Seq(
      "", " ", "a", "hello world", "Invoice #42 — total: 1,234.56 €",
      "société générale", "ÀÉÎÕÜ çñß", "日本語テスト", "кириллица",
      "a😀b🎉c", "😀", "o123|hasCustomer|c45|0", "s:doc-000123",
      "x" * 500, ("word " * 100).trim, "tab\tand\nnewline",
      "mixed 混合 text ✓"
    ).toDF("s")
    val rows = inputs.select(col("s"),
        hofForm(col("s")).as("hof"),
        graft.functions.Fingerprint.col(col("s")).as("native"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"fingerprint mismatch on '${r.getString(0).take(40)}': " +
          s"hof=${r.getLong(1)} native=${r.getLong(2)}")
    }
  }

  test("null propagates as null") {
    import spark.implicits._
    val df = Seq(Some("a"), None).toDF("s")
      .select(graft.functions.Fingerprint.col(col("s")).as("fp"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSeq == Seq(Some(97L), None))
  }
}
