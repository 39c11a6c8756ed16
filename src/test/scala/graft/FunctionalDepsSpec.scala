package graft

import graft.ops.Profile

class FunctionalDepsSpec extends SparkSuite {
  import spark.implicits._

  private def fd(rows: Seq[(Option[String], Option[String], Option[String])],
      lhs: String, rhs: Seq[String]) =
    Profile.functionalDeps(rows.toDF("a", "b", "c"), lhs, rhs)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => r._2 -> (r._3, r._4, r._5)).toMap

  test("holds vs violated, counted per lhs value") {
    val rows = Seq(
      (Some("k1"), Some("x"), Some("p")),
      (Some("k1"), Some("x"), Some("q")), // c violates under k1
      (Some("k2"), Some("y"), Some("p")),
      (Some("k2"), Some("y"), Some("p")))
    val out = fd(rows, "a", Seq("b", "c"))
    assert(out("b") == (2L, 0L, true))  // a -> b holds
    assert(out("c") == (2L, 1L, false)) // k1 maps to {p,q}
  }

  test("null rhs values cannot witness a violation; null lhs rows drop") {
    val rows = Seq(
      (Some("k1"), Some("x"), Some("p")),
      (Some("k1"), Some("x"), None),    // null c: still one distinct value
      (None, Some("z"), Some("r")))     // null lhs ignored entirely
    val out = fd(rows, "a", Seq("b", "c"))
    assert(out("b") == (1L, 0L, true))
    assert(out("c") == (1L, 0L, true))
  }

  test("all-null rhs group counts zero distinct (no violation)") {
    val rows = Seq((Some("k"), None, None), (Some("k"), None, None))
    val out = fd(rows, "a", Seq("b"))
    assert(out("b") == (1L, 0L, true))
  }
}
