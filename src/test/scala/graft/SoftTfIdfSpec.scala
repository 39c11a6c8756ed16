package graft

import graft.functions.JaroWinkler
import graft.link.SoftTfIdf
import org.apache.spark.sql.functions.col

class SoftTfIdfSpec extends SparkSuite {
  import spark.implicits._

  private def engine(pairs: Seq[(String, String)],
      recs: Seq[(String, String)], thetaPpm: Long = 900000L)
      : Map[(String, String), (Long, Long)] =
    SoftTfIdf.score(
      pairs.toDF("a", "b").repartition(3), col("a"), col("b"),
      recs.toDF("id", "text").repartition(2), col("id"), col("text"),
      thetaPpm)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  /** Independent reference: loops + BigInt for the exact floor. */
  private def brute(pairs: Seq[(String, String)],
      recs: Seq[(String, String)], thetaPpm: Long)
      : Map[(String, String), (Long, Long)] = {
    val toks = recs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val df = toks.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    pairs.distinct.flatMap { case (a, b) =>
      val terms = for {
        (ta, tfa) <- toks(a).toSeq
        cands = toks(b).toSeq.map { case (tb, tfb) =>
          (math.floor(JaroWinkler.jaroWinkler(ta, tb) * 1e6).toLong, tb, tfb)
        }.filter(_._1 >= thetaPpm)
        if cands.nonEmpty
      } yield {
        val (jw, tb, tfb) = cands.minBy(c => (-c._1, c._2))
        BigInt(tfa) * BigInt(tfb) * BigInt(jw) * BigInt(1000000L) /
          (BigInt(df(ta)) * BigInt(df(tb)))
      }
      if (terms.isEmpty) None
      else Some((a, b) -> ((terms.sum.toLong, terms.size.toLong)))
    }.toMap
  }

  test("soft match: abbreviation scores high, boilerplate is idf-damped") {
    val recs = Seq(
      ("r1", "acme corporation inc"), ("r2", "acme corp inc"),
      ("r3", "zenith widgets inc"), ("r4", "zenith widgets inc"),
      ("r5", "other trading inc"))
    val pairs = Seq(("r1", "r2"), ("r3", "r4"), ("r1", "r3"))
    val got = engine(pairs, recs)
    assert(got === brute(pairs, recs, 900000L))
    // exact-name pair outranks the abbreviation pair; unrelated pair has
    // only the "inc" boilerplate match, damped by df=5 on both sides
    assert(got(("r3", "r4"))._1 > got(("r1", "r2"))._1)
    assert(got(("r1", "r3"))._1 < got(("r1", "r2"))._1)
    assert(got(("r1", "r3"))._2 === 1L) // only "inc" matched
  }

  test("brute parity on random corpora across thetas") {
    val rnd = new scala.util.Random(31)
    val words = Vector("acme", "acne", "corp", "corporation", "zen",
      "zenith", "inc", "ink", "trading", "widget")
    val recs = (0 until 20).map(i => (f"r$i%02d",
      Seq.fill(1 + rnd.nextInt(4))(words(rnd.nextInt(words.length)))
        .mkString(" ")))
    val pairs = (0 until 30).map(_ =>
      (f"r${rnd.nextInt(20)}%02d", f"r${rnd.nextInt(20)}%02d"))
      .filter(p => p._1 != p._2)
    for (theta <- Seq(850000L, 900000L, 999999L))
      assert(engine(pairs, recs, theta) === brute(pairs, recs, theta),
        s"theta=$theta")
  }

  test("no-match pairs emit nothing; identical tokens score by 1/df^2") {
    val recs = Seq(("x", "unique"), ("y", "unique"), ("z", "qqqq"))
    val got = engine(Seq(("x", "y"), ("x", "z")), recs)
    // df(unique)=2: term = 1*1*1e6*1e6/(2*2)
    assert(got === Map(("x", "y") ->
      ((BigInt(1000000L) * BigInt(1000000L) / 4).toLong, 1L)))
  }

  test("high-tf rare tokens do not overflow: term stays exact in decimal") {
    // r4 ADVICE regression: with the old 10^12 scale and a per-term long
    // cast, tf_a·tf_b ≥ 10 at df=2 cast to null and was silently dropped.
    // 100 repetitions of a df=2 token → term = 100·100·10^6·10^6/4
    // = 2.5e15 per token — exact, present, and the sum of 30 such rare
    // tokens (7.5e16) is nowhere near the final long cast.
    val rare = (0 until 30).map(i => f"zqx$i%02d")
    val text = rare.flatMap(w => Seq.fill(100)(w)).mkString(" ")
    val recs = Seq(("a", text), ("b", text))
    val got = engine(Seq(("a", "b")), recs)
    val perTerm = BigInt(100) * 100 * 1000000L * 1000000L / 4
    assert(got === Map(("a", "b") -> (((perTerm * 30).toLong, 30L))))
  }
}
