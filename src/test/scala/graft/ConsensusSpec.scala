package graft

import graft.canon.Consensus
import org.apache.spark.sql.functions.col

class ConsensusSpec extends SparkSuite {
  import spark.implicits._

  private def engine(rows: Seq[(String, String, String)], minVotes: Long,
      maxCluster: Int = 10000): Map[String, String] =
    Consensus.majorityClusters(
      rows.toDF("m", "i", "g").repartition(4),
      col("m"), col("i"), col("g"), minVotes, maxCluster)
      .as[(String, String)].collect().toMap

  /** Independent reference: sets, loops, and a union-find. */
  private def brute(rows: Seq[(String, String, String)], minVotes: Long,
      maxCluster: Int): Map[String, String] = {
    val r = rows.distinct
    val items = r.map(_._2).distinct
    val clusters = r.groupBy(x => (x._1, x._3)).values
      .filter(_.size <= maxCluster)
    val votes = scala.collection.mutable
      .Map.empty[(String, String), Set[String]].withDefaultValue(Set.empty)
    clusters.foreach { c =>
      val s = c.map(_._2).distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        votes((s(i), s(j))) += c.head._1
    }
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r0 = find(p); parent(x) = r0; r0 }
    }
    votes.collect { case ((a, b), ms) if ms.size >= minVotes =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    items.map(i => i -> find(i)).toMap
  }

  test("2-of-3 majority: one method's false merge is outvoted") {
    val rows = Seq(
      // methods A and B agree d1,d2 are dups; C splits them
      ("A", "d1", "g1"), ("A", "d2", "g1"), ("A", "d3", "g2"),
      ("B", "d1", "h1"), ("B", "d2", "h1"), ("B", "d3", "h2"),
      ("C", "d1", "k1"), ("C", "d2", "k2"), ("C", "d3", "k2"))
    val got = engine(rows, 2L)
    assert(got === Map("d1" -> "d1", "d2" -> "d1", "d3" -> "d3"))
    assert(got === brute(rows, 2L, 10000))
    // at minVotes=1 everything C glued joins too (d2,d3 share k2)
    assert(engine(rows, 1L).values.toSet === Set("d1"))
  }

  test("brute parity on random multi-clusterings") {
    val rnd = new scala.util.Random(23)
    val items = (0 until 30).map(i => f"i$i%02d")
    for (seed <- 1 to 3) {
      val rows = for {
        m <- Seq("m1", "m2", "m3")
        i <- items
      } yield (m, i, s"$m-g${rnd.nextInt(6)}")
      for (v <- Seq(1L, 2L, 3L))
        assert(engine(rows, v) === brute(rows, v, 10000),
          s"seed=$seed votes=$v")
    }
  }

  test("transitive consensus: majority pairs chain through CC") {
    // (x,y) votes A+B, (y,z) votes B+C, (x,z) only B -> one group anyway
    val rows = Seq(
      ("A", "x", "g"), ("A", "y", "g"), ("A", "z", "g2"),
      ("B", "x", "h"), ("B", "y", "h"), ("B", "z", "h"),
      ("C", "y", "k"), ("C", "z", "k"), ("C", "x", "k2"))
    val got = engine(rows, 2L)
    assert(got === Map("x" -> "x", "y" -> "x", "z" -> "x"))
  }

  test("overlapping groups in ONE method cast one vote, not two") {
    // r4 ADVICE regression: method A co-buckets (x,y) in TWO band
    // buckets (the minhash-bands shape). With per-(m,g) row counting
    // that was 2 votes and cleared minVotes=2 alone; distinct-method
    // counting keeps it at 1 and the pair needs a second METHOD.
    val rows = Seq(
      ("A", "x", "band1"), ("A", "y", "band1"),
      ("A", "x", "band2"), ("A", "y", "band2"),
      ("B", "x", "h1"), ("B", "y", "h2"))
    assert(engine(rows, 2L) === Map("x" -> "x", "y" -> "y"))
    assert(engine(rows, 2L) === brute(rows, 2L, 10000))
    // a genuine second method's agreement still merges
    val agree = rows.dropRight(2) ++ Seq(("B", "x", "h"), ("B", "y", "h"))
    assert(engine(agree, 2L) === Map("x" -> "x", "y" -> "x"))
  }

  test("over-cap cluster casts no votes, WITH accounting; singletons backfill") {
    val big = (0 until 6).map(i => ("A", s"b$i", "huge"))
    val rows = big ++ Seq(("B", "b0", "s"), ("B", "b1", "s"),
      ("A", "b0", "x0"), ("A", "b1", "x1"))
    val (got, warns) = Audit.capturing { engine(rows, 1L, maxCluster = 4) }
    // only method B's small cluster votes; b2..b5 become singletons
    assert(got === Map("b0" -> "b0", "b1" -> "b0", "b2" -> "b2",
      "b3" -> "b3", "b4" -> "b4", "b5" -> "b5"))
    assert(warns.exists(w => w.contains("excluding 1 over-cap clusters") &&
      w.contains("covering 6")), warns)
  }
}
