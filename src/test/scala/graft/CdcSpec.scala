package graft

import graft.ops.Cdc
import org.apache.spark.sql.DataFrame

class CdcSpec extends SparkSuite {
  import spark.implicits._

  private def B(rows: (String, String)*) = rows.toDF("k", "v")
  private def C(rows: (String, Double, String, String)*) =
    rows.toDF("k", "ts", "op", "v")

  private def apply(b: DataFrame, c: DataFrame): Set[(String, String)] =
    Cdc.applyChanges(b, c, Seq("k"), "ts", "op", Seq("v"))
      .as[(String, String)].collect().toSet

  test("latest change per key wins; untouched base keys survive") {
    val out = apply(
      B(("a", "old"), ("b", "keep")),
      C(("a", 1.0, "U", "mid"), ("a", 2.0, "U", "new"), ("c", 1.0, "I", "ins")))
    assert(out == Set(("a", "new"), ("b", "keep"), ("c", "ins")))
  }

  test("a final D removes the key, even one present in base") {
    val out = apply(
      B(("a", "x"), ("b", "y")),
      C(("a", 1.0, "D", "x"), ("b", 1.0, "D", "y"), ("b", 2.0, "I", "back")))
    assert(out == Set(("b", "back")))
  }

  test("same-instant conflicts: D outranks I/U (pinned, not layout luck)") {
    val out = apply(B(), C(("a", 5.0, "I", "x"), ("a", 5.0, "D", "x")))
    assert(out == Set.empty)
  }

  test("ops are case-insensitive; an invalid op fails loudly") {
    assert(apply(B(), C(("a", 1.0, "i", "x"))) == Set(("a", "x")))
    val e = intercept[Exception] {
      apply(B(), C(("a", 1.0, "UPSERT", "x")))
    }
    assert(e.getMessage.contains("invalid op") ||
      Option(e.getCause).exists(_.getMessage.contains("invalid op")))
  }

  test("null keys/ts drop; base with no feed passes through") {
    val c = Seq((Option.empty[String], Some(1.0), Some("U"), Some("x")),
      (Some("a"), None, Some("U"), Some("zzz"))).toDF("k", "ts", "op", "v")
    assert(apply(B(("a", "x")), c) == Set(("a", "x")))
  }

  test("replay parity: equals a sequential per-key fold; layout invariant") {
    val feed = (1 to 60).map { i =>
      (s"k${i % 7}", i.toDouble, Seq("I", "U", "D")(i % 3), s"v$i")
    }
    val base = (0 to 4).map(j => (s"k$j", s"base$j"))
    val naive = {
      val last = feed.groupBy(_._1).map { case (k, cs) => k -> cs.maxBy(_._2) }
      val baseKeys = base.toMap
      (baseKeys.keySet ++ last.keySet).flatMap { k =>
        last.get(k) match {
          case Some((_, _, "D", _)) => None
          case Some((_, _, _, v)) => Some((k, v))
          case None => Some((k, baseKeys(k)))
        }
      }.toSet
    }
    assert(apply(B(base: _*).repartition(3), C(feed: _*).repartition(5)) == naive)
  }
}
