package graft

import graft.ops.Cdc
import org.apache.spark.sql.functions._

class CdcDiffSpec extends SparkSuite {
  import spark.implicits._

  private def snap(rows: (String, String)*) = rows.toDF("k", "v")

  private def d(o: org.apache.spark.sql.DataFrame,
      n: org.apache.spark.sql.DataFrame) =
    Cdc.diff(o, n, Seq("k"), Seq("v"))
      .as[(String, String, Option[String])].collect().toSet

  test("I / U / D classification; identical rows emit nothing") {
    val out = d(
      snap(("a", "same"), ("b", "old"), ("c", "gone")),
      snap(("a", "same"), ("b", "new"), ("d", "born")))
    assert(out == Set(
      ("b", "U", Some("new")),
      ("c", "D", None),
      ("d", "I", Some("born"))))
  }

  test("null payload transitions are changes, not drops") {
    val o = Seq(("a", Some("x")), ("b", Option.empty[String]))
      .toDF("k", "v")
    val n = Seq(("a", Option.empty[String]), ("b", Option.empty[String]))
      .toDF("k", "v")
    val out = d(o, n)
    // a: value -> null is a U; b: null -> null is unchanged
    assert(out == Set(("a", "U", None)))
  }

  test("round-trip law: applyChanges(old, diff(old, new)) == new") {
    val oldSnap = (1 to 80).filter(_ % 5 != 0)
      .map(i => (s"k$i", s"v$i")).toDF("k", "v")
    val newSnap = (1 to 80).filter(_ % 7 != 0)
      .map(i => (s"k$i", if (i % 3 == 0) s"v$i'" else s"v$i")).toDF("k", "v")
    val feed = Cdc.diff(oldSnap, newSnap, Seq("k"), Seq("v"))
      .withColumn("ts", lit(1.0))
    val rebuilt = Cdc.applyChanges(oldSnap, feed, Seq("k"), "ts", "op", Seq("v"))
      .as[(String, String)].collect().toSet
    assert(rebuilt == newSnap.as[(String, String)].collect().toSet)
    // and the feed is change-scale: only touched keys appear
    val touched = (1 to 80).count(i =>
      (i % 5 == 0) != (i % 7 == 0) || (i % 5 != 0 && i % 7 != 0 && i % 3 == 0))
    assert(feed.count() == touched)
  }

  test("null keys drop; layout invariance") {
    val o = Seq((Some("a"), "1"), (None, "x")).toDF("k", "v")
    val n = Seq((Some("a"), "2"), (None, "y")).toDF("k", "v")
    assert(d(o, n) == Set(("a", "U", Some("2"))))
    val big1 = (1 to 200).map(i => (s"k$i", s"v${i % 9}")).toDF("k", "v")
    val big2 = (5 to 205).map(i => (s"k$i", s"v${i % 11}")).toDF("k", "v")
    val a = Cdc.diff(big1.repartition(3), big2.repartition(5), Seq("k"), Seq("v"))
      .collect().toSet
    val b = Cdc.diff(big1.repartition(17), big2, Seq("k"), Seq("v"))
      .collect().toSet
    assert(a == b)
  }
}
