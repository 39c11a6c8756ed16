package graft

import graft.canon.ConnectedComponents
import org.apache.spark.sql.DataFrame

class IncrementalCcSpec extends SparkSuite {
  import spark.implicits._

  private def df(edges: Seq[(String, String)]): DataFrame =
    edges.toDF("src", "dst").repartition(4)

  private def full(edges: Seq[(String, String)]): Map[String, String] =
    ConnectedComponents.run(df(edges)).as[(String, String)].collect().toMap

  test("one increment == full rebuild: merge, no-op, new-vertex cases") {
    val base = Seq(("a1", "a2"), ("a2", "a3"), ("b1", "b2"), ("c1", "c2"))
    val labels = ConnectedComponents.run(df(base))
    // merges a* with b*, adds new island d, adds a no-op edge inside a*
    val batch = Seq(("a3", "b1"), ("d1", "d2"), ("a1", "a3"), ("d2", "e9"))
    val got = ConnectedComponents
      .incrementalUpdate(labels, df(batch))
      .as[(String, String)].collect().toMap
    assert(got === full(base ++ batch))
  }

  test("stacked increments over random graphs == one full CC") {
    for (seed <- Seq(7, 8)) {
      val rnd = new scala.util.Random(seed)
      val vs = (0 until 60).map(i => f"s${seed}v$i%02d")
      def randEdges(n: Int) = (0 until n).map(_ =>
        (vs(rnd.nextInt(vs.length)), vs(rnd.nextInt(vs.length))))
        .filter(e => e._1 != e._2)
      val base = randEdges(40)
      var labels = ConnectedComponents.run(df(base))
      var acc = base
      for (_ <- 0 until 3) {
        val batch = randEdges(15)
        labels = graft.Materialize(
          ConnectedComponents.incrementalUpdate(labels, df(batch)))
        acc = acc ++ batch
        assert(labels.as[(String, String)].collect().toMap === full(acc),
          s"seed=$seed after batch")
      }
    }
  }

  test("labels stay min-member-id and untouched components pass through") {
    val base = Seq(("x1", "x2"), ("y1", "y2"))
    val labels = ConnectedComponents.run(df(base))
    val got = ConnectedComponents
      .incrementalUpdate(labels, df(Seq(("x2", "x0"))))
      .as[(String, String)].collect().toMap
    // x-component label updates to the NEW minimum x0; y untouched
    assert(got === Map("x0" -> "x0", "x1" -> "x0", "x2" -> "x0",
      "y1" -> "y1", "y2" -> "y1"))
  }

  test("empty batch is identity; batch of only-new edges is plain CC") {
    val base = Seq(("m1", "m2"))
    val labels = ConnectedComponents.run(df(base))
    val id = ConnectedComponents
      .incrementalUpdate(labels, df(Seq.empty))
      .as[(String, String)].collect().toMap
    assert(id === full(base))
    val fresh = ConnectedComponents
      .incrementalUpdate(labels, df(Seq(("n1", "n2"), ("n2", "n3"))))
      .as[(String, String)].collect().toMap
    assert(fresh === full(base ++ Seq(("n1", "n2"), ("n2", "n3"))))
  }
}
