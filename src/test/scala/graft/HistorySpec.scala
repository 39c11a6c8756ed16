package graft

import graft.graph.History
import org.apache.spark.sql.DataFrame

class HistorySpec extends SparkSuite {
  import spark.implicits._

  // (subj, pred, obj, ts) — doubles as ts keep fixtures terse
  private def E(rows: (String, String, String, Double)*) =
    rows.toDF("subj", "pred", "obj", "ts")

  private def iv(df: DataFrame): Set[(String, String, String, Double, Option[Double], Long)] =
    History.validityIntervals(df)
      .as[(String, String, String, Double, Option[Double], Long)]
      .collect().toSet

  test("runs collapse; intervals are adjacent half-open; last is open") {
    val out = iv(E(
      ("e1", "status", "new", 1.0),
      ("e1", "status", "new", 2.0),      // re-assertion folds
      ("e1", "status", "active", 3.0),
      ("e1", "status", "active", 4.0),
      ("e1", "status", "closed", 9.0)))
    assert(out == Set(
      ("e1", "status", "new", 1.0, Some(3.0), 2L),
      ("e1", "status", "active", 3.0, Some(9.0), 2L),
      ("e1", "status", "closed", 9.0, None, 1L)))
  }

  test("an obj REVISITED after an interruption opens a fresh interval") {
    val out = iv(E(
      ("e1", "p", "a", 1.0), ("e1", "p", "b", 2.0), ("e1", "p", "a", 3.0)))
    assert(out == Set(
      ("e1", "p", "a", 1.0, Some(2.0), 1L),
      ("e1", "p", "b", 2.0, Some(3.0), 1L),
      ("e1", "p", "a", 3.0, None, 1L)))
  }

  test("timelines are independent per (subj, pred)") {
    val out = iv(E(
      ("e1", "p", "a", 1.0), ("e1", "q", "x", 2.0), ("e2", "p", "b", 3.0)))
    assert(out == Set(
      ("e1", "p", "a", 1.0, None, 1L),
      ("e1", "q", "x", 2.0, None, 1L),
      ("e2", "p", "b", 3.0, None, 1L)))
  }

  test("simultaneous conflicting assertions split deterministically by obj") {
    // two objs at ts=5: (ts, obj) order puts 'a' first, 'b' second — 'b'
    // wins the open interval, 'a' closes at the same instant
    val out = iv(E(("e1", "p", "b", 5.0), ("e1", "p", "a", 5.0)))
    assert(out == Set(
      ("e1", "p", "a", 5.0, Some(5.0), 1L),
      ("e1", "p", "b", 5.0, None, 1L)))
  }

  test("null timeline components drop, never fold into a run") {
    val out = iv(Seq(
      (Some("e1"), Some("p"), Some("a"), Some(1.0)),
      (None, Some("p"), Some("zzz"), Some(2.0)),
      (Some("e1"), None, Some("zzz"), Some(3.0)),
      (Some("e1"), Some("p"), None, Some(4.0)),
      (Some("e1"), Some("p"), Some("zzz"), None))
      .toDF("subj", "pred", "obj", "ts"))
    assert(out == Set(("e1", "p", "a", 1.0, None, 1L)))
  }

  test("one exchange total: window, run aggregate, and lead share it") {
    val plan = History.validityIntervals(E(("e1", "p", "a", 1.0)))
      .queryExecution.executedPlan.toString
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1, plan)
  }

  test("replay property: matches a naive per-timeline fold") {
    val rows = for {
      s <- 1 to 7; i <- 1 to 11
    } yield (s"e$s", "p", "v" + ((s * 7 + i * i) % 3), (i * 13 % 17).toDouble + i * 0.01)
    val naive = rows.groupBy(r => (r._1, r._2)).toSeq.flatMap { case ((s, p), es) =>
      val sorted = es.sortBy(e => (e._4, e._3))
      val runs = sorted.foldLeft(Vector.empty[(String, Double, Long)]) {
        case (acc, (_, _, o, t)) =>
          if (acc.nonEmpty && acc.last._1 == o)
            acc.init :+ ((o, acc.last._2, acc.last._3 + 1))
          else acc :+ ((o, t, 1L))
      }
      runs.zipWithIndex.map { case ((o, from, n), k) =>
        (s, p, o, from, runs.lift(k + 1).map(_._2), n)
      }
    }.toSet
    assert(iv(rows.toDF("subj", "pred", "obj", "ts").repartition(5)) == naive)
  }
}
