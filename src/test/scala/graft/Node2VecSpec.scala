package graft

import graft.graph.RandomWalks
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

class Node2VecSpec extends SparkSuite {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("src", "dst")
  private def starts(ids: Long*) = ids.toDF("id")
  private def bi(rows: (Long, Long)*): Seq[(Long, Long)] =
    rows.flatMap(e => Seq(e, e.swap))

  /** Independent sequential replay of the biased step rule: plain maps,
    * sets and Math.log — no DataFrames, no engine plumbing beyond the
    * shared XxHash64 primitive. */
  private def replay(es: Seq[(Long, Long)], start: Long, length: Int,
      p: Double, q: Double, seed: Long): Seq[Long] = {
    val dir = es.filter(e => e._1 != e._2).distinct
    val adj = dir.groupBy(_._1)
      .map { case (k, v) => (k, v.map(_._2).distinct.sorted.toIndexedSeq) }
    val eset = dir.toSet
    val m = 1L << 52
    val path = scala.collection.mutable.ArrayBuffer(start)
    var prev = start
    var cur = start
    var step = 1
    var halted = false
    while (step <= length && !halted) {
      adj.get(cur) match {
        case Some(nbrs) =>
          val best = nbrs.map { c =>
            var h = XxHash64Function.hash(seed, LongType, 42L)
            h = XxHash64Function.hash(start, LongType, h)
            h = XxHash64Function.hash(step.toLong, LongType, h)
            h = XxHash64Function.hash(c, LongType, h)
            val u = (java.lang.Math.floorMod(h, m) + 1).toDouble / m.toDouble
            val w = if (c == prev) 1.0 / p
                    else if (eset((prev, c))) 1.0
                    else 1.0 / q
            (math.log(u) / w, c)
          }.max // lexicographic: key, then larger candidate id
          prev = cur; cur = best._2; path += cur
        case None => halted = true
      }
      step += 1
    }
    path.toSeq
  }

  private val web = bi((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 5L), (4L, 5L))

  test("biased walks match an independent sequential replay on every start") {
    for ((p, q) <- Seq((0.25, 4.0), (4.0, 0.25), (1.0, 1.0))) {
      val out = RandomWalks.walksBiased(edges(web: _*), starts(1L, 2L, 3L, 4L, 5L),
        length = 10, p = p, q = q, seed = 7L)
        .as[(Long, Seq[Long])].collect().toMap
      for (s <- Seq(1L, 2L, 3L, 4L, 5L))
        assert(out(s) == replay(web, s, 10, p, q, 7L),
          s"biased walk from $s diverged at p=$p q=$q")
    }
  }

  test("tiny p forces immediate returns: chain walk oscillates") {
    // bidirectional chain 1-2-3-4: with w_return = 1/p astronomically
    // dominant, every step after the first returns to prev
    val chain = bi((1L, 2L), (2L, 3L), (3L, 4L))
    val out = RandomWalks.walksBiased(edges(chain: _*), starts(1L),
      length = 7, p = 1e-9, q = 1.0, seed = 3L)
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(1L, 2L, 1L, 2L, 1L, 2L, 1L, 2L))
  }

  test("tiny q forces outward exploration: chain walk runs straight") {
    // from node k with prev k-1, candidate k+1 is NOT a neighbor of prev
    // (chain), so w = 1/q dominates and the walk never backtracks
    val chain = bi((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val out = RandomWalks.walksBiased(edges(chain: _*), starts(1L),
      length = 5, p = 1.0, q = 1e-9, seed = 11L)
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("large p AND q keep the walk on triangle-closing moves") {
    // triangle {1,2,3} with a pendant 4 on 2: returns and non-neighbors
    // of prev are both crushed, so after the uniform first step the walk
    // stays inside the triangle and never immediately backtracks
    val g = bi((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L))
    val out = RandomWalks.walksBiased(edges(g: _*), starts(1L),
      length = 9, p = 1e9, q = 1e9, seed = 5L)
      .as[(Long, Seq[Long])].collect().toMap
    val path = out(1L)
    assert(path.length == 10)
    assert(!path.contains(4L), s"outward move taken: $path")
    path.sliding(3).foreach {
      case Seq(a, _, c) => assert(a != c, s"immediate return in $path")
      case _ =>
    }
  }

  test("first step is uniform (all weights 1): matches replay on a star") {
    val star = bi((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    val out = RandomWalks.walksBiased(edges(star: _*), starts(10L),
      length = 1, p = 9.0, q = 0.1, seed = 21L)
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(10L) == replay(star, 10L, 1, 9.0, 0.1, 21L))
  }

  test("sinks halt biased walks; length 0 emits the start") {
    val directed = Seq((1L, 2L), (2L, 3L)) // 3 is a sink
    val out = RandomWalks.walksBiased(edges(directed: _*), starts(1L),
      length = 8, p = 0.5, q = 2.0, seed = 1L)
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(1L, 2L, 3L))
    val zero = RandomWalks.walksBiased(edges(directed: _*), starts(2L),
      length = 0, seed = 1L).as[(Long, Seq[Long])].collect().toMap
    assert(zero(2L) == Seq(2L))
  }

  test("deterministic across partition layouts; seed-sensitive") {
    val a = RandomWalks.walksBiased(edges(web: _*).repartition(7),
      starts(1L, 2L, 3L).repartition(3), length = 8, p = 0.5, q = 2.0, seed = 9L)
      .as[(Long, Seq[Long])].collect().toMap
    val b = RandomWalks.walksBiased(edges(web: _*).coalesce(1),
      starts(1L, 2L, 3L), length = 8, p = 0.5, q = 2.0, seed = 9L)
      .as[(Long, Seq[Long])].collect().toMap
    assert(a == b)
    val c = RandomWalks.walksBiased(edges(web: _*), starts(1L, 2L, 3L),
      length = 8, p = 0.5, q = 2.0, seed = 10L)
      .as[(Long, Seq[Long])].collect().toMap
    assert(c != a)
  }
}
