package graft

import graft.ops.Sequences

class SequencesSpec extends SparkSuite {
  import spark.implicits._

  // (user, ts, eid, type)
  private def E(rows: (String, Double, Int, String)*) =
    rows.toDF("u", "ts", "eid", "t")

  private def mine(df: org.apache.spark.sql.DataFrame, k: Int, minKeys: Long = 1L) =
    Sequences.frequentPatterns(df, "u", Seq("ts", "eid"), "t", k, minKeys)
      .as[(String, Long, Long)].collect().toSet

  test("consecutive k-grams of the per-key ordered type sequence") {
    val out = mine(E(
      ("u1", 1.0, 1, "view"), ("u1", 2.0, 2, "click"), ("u1", 3.0, 3, "buy"),
      ("u2", 1.0, 4, "view"), ("u2", 2.0, 5, "click"), ("u2", 3.0, 6, "exit")),
      k = 2)
    assert(out == Set(
      ("view>click", 2L, 2L), ("click>buy", 1L, 1L), ("click>exit", 1L, 1L)))
  }

  test("order comes from orderCols, not input order; ties break on eid") {
    val out = mine(E(
      ("u", 2.0, 9, "b"), ("u", 1.0, 5, "a"), ("u", 2.0, 8, "c")), k = 3)
    // sorted by (ts, eid): a(1.0,5) c(2.0,8) b(2.0,9)
    assert(out == Set(("a>c>b", 1L, 1L)))
  }

  test("n_occurrences counts repeats within a key; n_keys is distinct") {
    val out = mine(E(
      ("u", 1.0, 1, "x"), ("u", 2.0, 2, "y"),
      ("u", 3.0, 3, "x"), ("u", 4.0, 4, "y")), k = 2)
    assert(out == Set(("x>y", 1L, 2L), ("y>x", 1L, 1L)))
  }

  test("keys shorter than k contribute nothing; minKeys filters") {
    val df = E(
      ("u1", 1.0, 1, "a"), ("u1", 2.0, 2, "b"),
      ("u2", 1.0, 3, "a"), ("u2", 2.0, 4, "b"),
      ("u3", 1.0, 5, "a")) // too short for k=2
    assert(mine(df, k = 2, minKeys = 2L) == Set(("a>b", 2L, 2L)))
    assert(mine(df, k = 3) == Set.empty)
  }

  test("null key/type/order rows drop") {
    val df = Seq(
      (Some("u"), Some(1.0), Some(1), Some("a")),
      (Some("u"), Some(2.0), Some(2), Some("b")),
      (None, Some(3.0), Some(3), Some("x")),
      (Some("u"), None, Some(4), Some("x")),
      (Some("u"), Some(5.0), Some(5), None)).toDF("u", "ts", "eid", "t")
    assert(mine(df, k = 2) == Set(("a>b", 1L, 1L)))
  }

  test("layout invariance") {
    val rows = (1 to 80).map(i =>
      (s"u${i % 9}", (i % 13).toDouble, i, "t" + (i * i) % 4))
    val a = mine(rows.toDF("u", "ts", "eid", "t").repartition(3), k = 3)
    val b = mine(rows.toDF("u", "ts", "eid", "t").repartition(17), k = 3)
    assert(a == b && a.nonEmpty)
  }
}
