package graft

import graft.ops.Shard

class ShardSpec extends SparkSuite {
  import spark.implicits._

  private val shards4 = Seq("s-a", "s-b", "s-c", "s-d")
  private def keys(n: Int) = (0 until n).map(i => s"entity$i")

  private def assign(ks: Seq[String], shards: Seq[String]): Map[String, String] =
    Shard.assign(ks.toDF("k"), "k", shards)
      .as[(String, String)].collect().toMap

  /** Independent replay: same rolling fingerprint + MINSTD scramble,
    * plain argmax loop. */
  private def fp(s: String): Long = {
    val M = 2147483647L
    val h = s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % M)
    val r1 = (h * 48271L + 12345L) % M
    (r1 * 69621L + 54321L) % M
  }
  private def owner(k: String, shards: Seq[String]): String =
    shards.map(sh => ((fp(s"$sh|$k"), sh), sh)).maxBy(_._1)._2

  test("matches the sequential argmax replay; every shard gets keys") {
    val out = assign(keys(400), shards4)
    keys(400).foreach(k => assert(out(k) == owner(k, shards4)))
    assert(out.values.toSet == shards4.toSet)
    // rough balance: no shard owns more than half
    out.values.groupBy(identity).foreach { case (_, g) =>
      assert(g.size < 200, "pathological imbalance")
    }
  }

  test("minimal movement: adding a shard only moves keys TO the new shard") {
    val before = assign(keys(600), shards4)
    val after = assign(keys(600), shards4 :+ "s-new")
    val moved = keys(600).filter(k => before(k) != after(k))
    assert(moved.nonEmpty)
    moved.foreach(k => assert(after(k) == "s-new",
      s"$k moved between OLD shards — not rendezvous behavior"))
    // expectation ~1/5 of keys move; allow generous slack
    assert(moved.size < 600 / 2)
  }

  test("removing a shard only re-homes ITS keys") {
    val before = assign(keys(500), shards4)
    val after = assign(keys(500), shards4.filterNot(_ == "s-b"))
    keys(500).foreach { k =>
      if (before(k) != "s-b") assert(after(k) == before(k))
      else assert(after(k) != "s-b")
    }
  }

  test("deterministic across partition layouts; single shard owns all") {
    val df = keys(300).toDF("k")
    val a = Shard.assign(df.repartition(1), "k", shards4)
      .as[(String, String)].collect().toSet
    val b = Shard.assign(df.repartition(11), "k", shards4)
      .as[(String, String)].collect().toSet
    assert(a == b)
    assert(assign(keys(20), Seq("only")).values.toSet == Set("only"))
  }
}
