package graft

import graft.graph.TemporalReach
import java.sql.Timestamp

class TemporalReachSpec extends SparkSuite {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  private def run(edges: Seq[(String, String, Timestamp)],
      seeds: Seq[(String, Timestamp)], hops: Int = 4) =
    TemporalReach.earliestArrival(
        edges.toDF("src", "dst", "t"), seeds.toDF("id", "t0"), hops)
      .as[(String, Timestamp)].collect().toMap

  test("an edge older than the arrival at its source cannot be used") {
    // a -> b at 10:00, then b -> c at 09:00 (BEFORE arrival at b): c
    // unreachable even though the static path a->b->c exists
    val out = run(
      Seq(("a", "b", ts(10)), ("b", "c", ts(9))),
      Seq(("a", ts(0))))
    assert(out == Map("a" -> ts(0), "b" -> ts(10)))
  }

  test("earliest arrival is a MIN over paths, not the shortest hop count") {
    // direct a->d at 20:00 vs a->b(1:00)->d(2:00): min arrival 02:00
    val out = run(
      Seq(("a", "d", ts(20)), ("a", "b", ts(1)), ("b", "d", ts(2))),
      Seq(("a", ts(0))))
    assert(out("d") == ts(2))
  }

  test("equal-time hops chain (t >= arrival is inclusive); hop bound cuts") {
    val chain = Seq(("a", "b", ts(5)), ("b", "c", ts(5)), ("c", "d", ts(5)),
      ("d", "e", ts(5)), ("e", "f", ts(5)))
    val all = run(chain, Seq(("a", ts(0))), hops = 5)
    assert(all.keySet == Set("a", "b", "c", "d", "e", "f"))
    val cut = run(chain, Seq(("a", ts(0))), hops = 2)
    assert(cut.keySet == Set("a", "b", "c"))
  }

  test("multiple seeds race; seed t0 gates its own outgoing edges") {
    val out = run(
      Seq(("a", "x", ts(3)), ("b", "x", ts(2)), ("b", "y", ts(1))),
      Seq(("a", ts(0)), ("b", ts(2))))
    assert(out("x") == ts(2)) // via b (t=2 >= t0=2, inclusive)
    assert(!out.contains("y")) // b's y-edge at 1:00 predates b's t0
  }
}
