package graft

import graft.link.MetaBlocking
import org.apache.spark.sql.functions.col

class MetaBlockingSpec extends SparkSuite {
  import spark.implicits._

  /** Independent reference: sets-and-loops WNP on the driver. */
  private def brute(asg: Seq[(String, String)], maxBlock: Int)
      : Map[(String, String), Long] = {
    val byBlock = asg.distinct.groupMap(_._2)(_._1)
      .filter(_._2.size <= maxBlock)
    val w = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    byBlock.values.foreach { recs =>
      val s = recs.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        w((s(i), s(j))) += 1L
    }
    val inc = scala.collection.mutable.Map.empty[String, (Long, Long)]
      .withDefaultValue((0L, 0L))
    w.foreach { case ((a, b), wt) =>
      Seq(a, b).foreach { r =>
        val (d, sm) = inc(r); inc(r) = (d + 1, sm + wt)
      }
    }
    w.filter { case ((a, b), wt) =>
      val (da, sa) = inc(a); val (db, sb) = inc(b)
      wt * da >= sa || wt * db >= sb
    }.toMap
  }

  private def engine(asg: Seq[(String, String)], maxBlock: Int = 1000)
      : Map[(String, String), Long] =
    MetaBlocking.wnpPairs(asg.toDF("rec", "blk").repartition(4),
        col("rec"), col("blk"), maxBlock)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  private def tokenBlocks(seed: Int, nRecs: Int, nKeys: Int,
      keysPer: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    for {
      i <- 0 until nRecs
      _ <- 0 until keysPer
    } yield (f"r$i%03d", f"k${rnd.nextInt(nKeys)}%02d")
  }

  test("WNP retention == driver reference on random token blockings") {
    for (seed <- Seq(1, 2, 3)) {
      val asg = tokenBlocks(seed, 40, 12, 4)
      assert(engine(asg) === brute(asg, 1000), s"seed=$seed")
    }
  }

  test("CBS weight counts SHARED blocks once, duplicates collapse") {
    val asg = Seq(
      ("a", "k1"), ("b", "k1"), ("a", "k2"), ("b", "k2"), ("a", "k2"),
      ("c", "k1"))
    val got = engine(asg)
    // w(a,b)=2 (k1,k2); w(a,c)=w(b,c)=1 (k1)
    assert(got === brute(asg, 1000))
    assert(got(("a", "b")) === 2L)
  }

  test("stopword-block purge drops its pairs WITH accounting") {
    // k_stop holds 5 records (> cap 4); only the sharp key k_s pairs survive
    val stop = (0 until 5).map(i => (s"r$i", "k_stop"))
    val sharp = Seq(("r0", "k_s"), ("r1", "k_s"))
    val (got, warns) = Audit.capturing { engine(stop ++ sharp, maxBlock = 4) }
    assert(got === Map(("r0", "r1") -> 1L))
    assert(warns.exists(w => w.contains("purging 1 over-cap blocks") &&
      w.contains("covering 5")), warns)
    val (_, w2) = Audit.capturing { engine(sharp, maxBlock = 4) }
    assert(!w2.exists(_.contains("over-cap")), w2)
  }

  test("mean pruning keeps every pair of a uniform-weight node") {
    // all weights equal -> w*deg == sum at every node -> nothing pruned
    val asg = Seq(("a", "k1"), ("b", "k1"), ("c", "k1"))
    assert(engine(asg).keySet ===
      Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}
