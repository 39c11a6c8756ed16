package graft

import graft.graph.EntityTable
import org.apache.spark.sql.DataFrame

class EntityTableSpec extends SparkSuite {
  import spark.implicits._

  private def T(rows: (String, String, String)*) =
    rows.toDF("subj", "pred", "obj")

  test("one row per subj, one column per requested pred") {
    val out = EntityTable.entityTable(T(
      ("e1", "name", "Acme"), ("e1", "vat", "FR123"),
      ("e2", "name", "Burt")), Seq("name", "vat"))
      .as[(String, String, Option[String])].collect().toSet
    assert(out == Set(("e1", "Acme", Some("FR123")), ("e2", "Burt", None)))
  }

  test("multi-valued preds resolve to max(obj), counted via nValsCol") {
    val out = EntityTable.entityTable(T(
      ("e1", "name", "Acme"), ("e1", "name", "Acme Corp"),
      ("e1", "vat", "FR123")), Seq("name"), nValsCol = Some("n"))
      .as[(String, String, Long)].collect().toSet
    // n counts only the REQUESTED preds' triples (vat is pruned pre-agg)
    assert(out == Set(("e1", "Acme Corp", 2L)))
  }

  test("unrequested preds never surface; pred-less subjects are absent") {
    val out = EntityTable.entityTable(T(
      ("e1", "name", "Acme"), ("e2", "other", "x")), Seq("name"))
    assert(out.columns.toSeq == Seq("subj", "name"))
    assert(out.as[(String, String)].collect().toSet == Set(("e1", "Acme")))
  }

  test("null subj/obj rows drop") {
    val out = EntityTable.entityTable(Seq(
      (Some("e1"), Some("name"), Some("Acme")),
      (None, Some("name"), Some("zzz")),
      (Some("e1"), Some("vat"), None)).toDF("subj", "pred", "obj"),
      Seq("name", "vat"))
      .as[(String, String, Option[String])].collect().toSet
    assert(out == Set(("e1", "Acme", None)))
  }

  test("plan: single exchange, pred filter pushed to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("entity_pivot").toString
    T(("e1", "name", "Acme"), ("e1", "vat", "FR123")).write
      .mode("overwrite").parquet(dir)
    val df = EntityTable.entityTable(spark.read.parquet(dir), Seq("name", "vat"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1, plan)
    assert(plan.contains("PushedFilters: [IsNotNull(subj), IsNotNull(obj), " +
      "In(pred, [name,vat])]"), plan)
  }

  test("duplicate / empty pred lists are rejected") {
    intercept[IllegalArgumentException] {
      EntityTable.entityTable(T(("e1", "p", "x")), Seq("p", "p"))
    }
    intercept[IllegalArgumentException] {
      EntityTable.entityTable(T(("e1", "p", "x")), Seq.empty)
    }
  }
}
