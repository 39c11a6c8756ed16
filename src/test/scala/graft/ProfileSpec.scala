package graft

import graft.ops.Profile

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a")), (Some(2L), Some("b")), (Some(2L), None),
    (None, Some("b"))).toDF("k", "v")

  test("per-column count/null/distinct/min/max in one long-format report") {
    val out = Profile.columns(df, Seq("k", "v"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSet
    assert(out == Set(
      ("k", 4L, 1L, 2L, Some("1"), Some("2")),
      ("v", 4L, 1L, 2L, Some("a"), Some("b"))))
  }

  test("an all-null column reports null min/max and zero distinct") {
    val d = Seq((Option.empty[String], "x")).toDF("a", "b")
    val out = Profile.columns(d, Seq("a"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSet
    assert(out == Set(("a", 1L, 1L, 0L, None, None)))
  }

  test("column order of the report follows the request order") {
    val cols = Profile.columns(df, Seq("v", "k"))
      .select("column").as[String].collect().toSeq
    assert(cols == Seq("v", "k"))
  }

  test("duplicate / empty requests are rejected") {
    intercept[IllegalArgumentException] { Profile.columns(df, Seq("k", "k")) }
    intercept[IllegalArgumentException] { Profile.columns(df, Seq.empty) }
  }

  test("plan: one aggregate pass (a single Expand, no per-column jobs)") {
    val plan = Profile.columns(df, Seq("k", "v"))
      .queryExecution.executedPlan.toString
    assert(plan.sliding("Expand".length).count(_ == "Expand") == 1, plan)
  }
}
