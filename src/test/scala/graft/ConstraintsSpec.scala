package graft

import graft.canon.Constraints
import org.apache.spark.sql.functions.col

class ConstraintsSpec extends SparkSuite {
  import spark.implicits._

  private def engine(same: Seq[(String, String)], diff: Seq[(String, String)])
      : Set[(String, String, String)] =
    Constraints.differentFromViolations(
      same.toDF("src", "dst").repartition(3),
      diff.toDF("src", "dst").repartition(2))
      .as[(String, String, String)].collect().toSet

  /** Independent reference: union-find + loops. */
  private def brute(same: Seq[(String, String)], diff: Seq[(String, String)])
      : Set[(String, String, String)] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    same.filter(e => e._1 != e._2).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    diff.map(e => if (e._1 < e._2) e else e.swap).distinct
      .filter(e => find(e._1) == find(e._2))
      .map(e => (e._1, e._2, find(e._1))).toSet
  }

  test("a noisy chain gluing two asserted-distinct entities is caught") {
    val same = Seq(("a", "b"), ("b", "c"), ("x", "y"))
    val got = engine(same, Seq(("a", "c"), ("a", "x"), ("y", "x")))
    // a~c merged but asserted different -> violation; a vs x: different
    // components -> fine; x~y merged and asserted different -> violation
    assert(got === Set(("a", "c", "a"), ("x", "y", "x")))
    assert(got === brute(same, Seq(("a", "c"), ("a", "x"), ("y", "x"))))
  }

  test("empty output == consistent; entities unseen by sameAs are singletons") {
    assert(engine(Seq(("a", "b")), Seq(("a", "z"), ("z", "w"))).isEmpty)
    // self-pair is inherently violated even for an unseen entity
    assert(engine(Seq(("a", "b")), Seq(("q", "q"))) ===
      Set(("q", "q", "q")))
  }

  test("union-find parity on random constraint graphs") {
    for (seed <- Seq(61, 62)) {
      val rnd = new scala.util.Random(seed)
      val vs = (0 until 40).map(i => f"v$i%02d")
      def edges(n: Int) = (0 until n).map(_ =>
        (vs(rnd.nextInt(40)), vs(rnd.nextInt(40))))
      val same = edges(30).filter(e => e._1 != e._2)
      val diff = edges(25)
      assert(engine(same, diff) === brute(same, diff), s"seed=$seed")
    }
  }
}
