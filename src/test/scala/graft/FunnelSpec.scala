package graft

import graft.ops.Funnel
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: (Long, Double, String)*) = rows.toDF("u", "ts", "typ")
  private def run(df: org.apache.spark.sql.DataFrame, steps: Seq[String]) =
    Funnel.stages(df, "u", "ts", "typ", steps)
      .select(col("user"), col("stages"), col("first_ts"), col("last_ts"))
      .as[(Long, Long, Double, Double)].collect().toSet

  test("stages advance only on strictly later events of the next step") {
    val out = run(ev(
      (1L, 1.0, "A"), (1L, 2.0, "B"), (1L, 3.0, "C"), // full funnel
      (2L, 1.0, "A"), (2L, 1.0, "B"),                 // equal ts: no advance
      (3L, 5.0, "B"), (3L, 6.0, "A"),                 // B before A: stage 1
      (4L, 9.0, "B")),                                // never did A: absent
      Seq("A", "B", "C"))
    assert(out == Set(
      (1L, 3L, 1.0, 3.0),
      (2L, 1L, 1.0, 1.0),
      (3L, 1L, 6.0, 6.0)))
  }

  test("earliest completion is chosen and is maximal") {
    // A at 1 and 4; B at 2; C at 3: greedy t1=1 -> B=2 -> C=3 reaches 3;
    // anchoring at A=4 would reach only stage 1
    val out = run(ev((1L, 1.0, "A"), (1L, 4.0, "A"), (1L, 2.0, "B"),
      (1L, 3.0, "C")), Seq("A", "B", "C"))
    assert(out == Set((1L, 3L, 1.0, 3.0)))
    // B exists only BEFORE the earliest A's successor window closes:
    // A=2, B=1 and B=3, C=4: t1=2, B=3, C=4
    val out2 = run(ev((1L, 2.0, "A"), (1L, 1.0, "B"), (1L, 3.0, "B"),
      (1L, 4.0, "C")), Seq("A", "B", "C"))
    assert(out2 == Set((1L, 3L, 2.0, 4.0)))
  }

  test("non-step event types are ignored; repeated steps rejected") {
    val out = run(ev((1L, 1.0, "A"), (1L, 1.5, "noise"), (1L, 2.0, "B")),
      Seq("A", "B"))
    assert(out == Set((1L, 2L, 1.0, 2.0)))
    intercept[IllegalArgumentException] {
      Funnel.stages(ev((1L, 1.0, "A")), "u", "ts", "typ", Seq("A", "A"))
    }
  }

  test("matches a naive sequential replay on pseudo-random events") {
    val types = Vector("A", "B", "C", "x")
    val rows = (0 until 400).map { i =>
      ((i % 23).toLong, (i * 7 % 101).toDouble + (i % 13) * 0.01,
        types((i * 11 % 4)))
    }
    val steps = Seq("A", "B", "C")
    val naive = rows.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.map(e => (e._2, e._3)).sortBy(_._1)
      var t = Double.NegativeInfinity
      var reached = 0
      var first = 0.0; var last = 0.0
      var k = 0
      var continue = true
      while (continue && k < steps.size) {
        sorted.find(e => e._2 == steps(k) &&
          (if (k == 0) true else e._1 > t)) match {
          case Some((ts, _)) if k == 0 || ts > t =>
            t = ts; reached = k + 1
            if (k == 0) first = ts
            last = ts; k += 1
          case _ => continue = false
        }
      }
      if (reached == 0) None else Some((u, reached.toLong, first, last))
    }.toSet
    assert(run(ev(rows: _*), steps) == naive)
  }

  test("layout invariance") {
    val rows = (0 until 200).map { i =>
      ((i % 11).toLong, (i * 13 % 97).toDouble, Vector("A", "B", "C")(i % 3))
    }
    val base = run(ev(rows: _*), Seq("A", "B", "C"))
    assert(run(ev(rows: _*).repartition(9), Seq("A", "B", "C")) == base)
  }
}
