package graft

import graft.graph.RuleMiner
import org.apache.spark.sql.functions.col

class RuleMinerSpec extends SparkSuite {
  import spark.implicits._

  private def engine(ts: Seq[(String, String, String)], minSup: Long = 1L,
      minConf: Long = 0L, maxFanout: Long = 1000000L)
      : Map[(String, String, String), (Long, Long, Long, Long)] =
    RuleMiner.pathRules(ts.toDF("s", "p", "o").repartition(4),
        col("s"), col("p"), col("o"), minSup, minConf, maxFanout)
      .as[(String, String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6, r._7))).toMap

  /** Independent reference: sets and loops over the cleaned triple set. */
  private def brute(ts: Seq[(String, String, String)], minSup: Long,
      minConf: Long): Map[(String, String, String), (Long, Long, Long, Long)] = {
    val t = ts.distinct
    val preds = t.map(_._2).distinct
    val pairsOf = preds.map(p =>
      p -> t.filter(_._2 == p).map(x => (x._1, x._3)).toSet).toMap
    (for {
      r1 <- preds; r2 <- preds
      body = (for {
        (x, p1, z) <- t if p1 == r1
        (z2, p2, y) <- t if p2 == r2 && z2 == z
      } yield (x, y)).toSet
      if body.nonEmpty
      p <- preds
      sup = (body & pairsOf(p)).size.toLong
      if sup >= minSup
      conf = BigInt(1000000) * sup / body.size
      if conf >= minConf
    } yield (r1, r2, p) -> ((sup, body.size.toLong, conf.toLong,
      (BigInt(1000000) * sup / pairsOf(p).size).toLong))).toMap
  }

  test("hand fixture: 3-of-4 grandparent rule with exact ppm") {
    // parent chain a->b->c for 4 families; grandparent asserted for 3
    val tr = (1 to 4).flatMap { i =>
      Seq((s"a$i", "parent", s"b$i"), (s"b$i", "parent", s"c$i"))
    } ++ (1 to 3).map(i => (s"a$i", "grand", s"c$i"))
    val got = engine(tr)
    assert(got(("parent", "parent", "grand")) === ((3L, 4L, 750000L, 1000000L)))
    assert(got === brute(tr, 1L, 0L))
  }

  test("brute parity on random KGs incl. support/conf gates") {
    val rnd = new scala.util.Random(17)
    val ents = (0 until 25).map(i => s"e$i")
    val preds = Seq("p", "q", "r")
    val tr = (0 until 180).map(_ => (ents(rnd.nextInt(25)),
      preds(rnd.nextInt(3)), ents(rnd.nextInt(25))))
    assert(engine(tr) === brute(tr, 1L, 0L))
    assert(engine(tr, minSup = 3L, minConf = 200000L) ===
      brute(tr, 3L, 200000L))
  }

  test("transitivity shows up as p∧p⇒p; duplicates collapse") {
    val tr = Seq(("x", "sub", "y"), ("y", "sub", "z"), ("x", "sub", "z"),
      ("x", "sub", "z"))
    val got = engine(tr)
    assert(got(("sub", "sub", "sub")) === ((1L, 1L, 1000000L, 333333L)))
  }

  test("hub entities excluded WITH accounting; support drops accordingly") {
    // hub h: 4 in-edges x 4 out-edges = 16 potential paths > cap 10
    val hubby = (1 to 4).flatMap(i =>
      Seq((s"in$i", "a", "h"), ("h", "b", s"out$i"))) ++
      (1 to 4).flatMap(i => (1 to 4).map(j => (s"in$i", "c", s"out$j")))
    val (got, warns) = Audit.capturing { engine(hubby, maxFanout = 10L) }
    assert(!got.contains(("a", "b", "c"))) // only groundings route via h
    assert(warns.exists(w => w.contains("excluding 1 hub entities") &&
      w.contains("16 potential")), warns)
    val (got2, quiet) = Audit.capturing { engine(hubby, maxFanout = 16L) }
    assert(got2(("a", "b", "c")) === ((16L, 16L, 1000000L, 1000000L)))
    assert(!quiet.exists(_.contains("hub")), quiet)
  }
}
