package graft

import graft.canon.Survivorship

class SurvivorshipSpec extends SparkSuite {
  import spark.implicits._

  test("majority vote per field; n_members counts source rows") {
    val df = Seq(
      ("g1", "Acme Corp", "FR1"),
      ("g1", "Acme Corp", "FR2"),
      ("g1", "ACME", "FR2"),
      ("g2", "Burt", "DE9")).toDF("gid", "name", "vat")
    val out = Survivorship.goldenRecord(df, "gid", Seq("name", "vat"))
      .as[(String, String, String, Long)].collect().toSet
    assert(out == Set(
      ("g1", "Acme Corp", "FR2", 3L),
      ("g2", "Burt", "DE9", 1L)))
  }

  test("vote ties break to the largest value (deterministic)") {
    val df = Seq(("g", "a"), ("g", "b")).toDF("gid", "v")
    val out = Survivorship.goldenRecord(df, "gid", Seq("v"))
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("g", "b", 2L)))
  }

  test("nulls never vote; an all-null field yields null but keeps the row") {
    val df = Seq(
      ("g", Some("x"), Option.empty[String]),
      ("g", None, None),
      ("g", Some("x"), None)).toDF("gid", "a", "b")
    val out = Survivorship.goldenRecord(df, "gid", Seq("a", "b"))
      .as[(String, Option[String], Option[String], Long)].collect().toSet
    assert(out == Set(("g", Some("x"), None, 3L)))
  }

  test("majority beats value order (count outranks the tiebreak)") {
    val df = Seq(("g", "zzz"), ("g", "aaa"), ("g", "aaa")).toDF("gid", "v")
    val out = Survivorship.goldenRecord(df, "gid", Seq("v"))
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("g", "aaa", 3L)))
  }

  test("null group keys drop; mixed field types vote as strings") {
    val df = Seq(
      (Some("g"), 10, "x"), (Some("g"), 10, "y"), (None, 99, "z"))
      .toDF("gid", "num", "s")
    val out = Survivorship.goldenRecord(df, "gid", Seq("num", "s"))
      .as[(String, String, String, Long)].collect().toSet
    assert(out == Set(("g", "10", "y", 2L)))
  }

  test("layout invariance: pure function of the group's value multiset") {
    val rows = (1 to 60).map(i => (s"g${i % 7}", s"v${(i * i) % 5}", s"w${i % 3}"))
    val a = Survivorship.goldenRecord(rows.toDF("gid", "x", "y").repartition(3),
      "gid", Seq("x", "y")).collect().toSet
    val b = Survivorship.goldenRecord(rows.toDF("gid", "x", "y").repartition(11),
      "gid", Seq("x", "y")).collect().toSet
    assert(a == b)
    // and matches a naive driver vote
    val naive = rows.groupBy(_._1).map { case (g, rs) =>
      def vote(vs: Seq[String]) =
        vs.groupBy(identity).toSeq.map { case (v, o) => (o.size, v) }.max._2
      org.apache.spark.sql.Row(g, vote(rs.map(_._2)), vote(rs.map(_._3)), rs.size.toLong)
    }.toSet
    assert(a == naive)
  }
}
