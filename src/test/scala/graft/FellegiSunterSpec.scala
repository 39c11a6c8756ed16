package graft

import graft.link.FellegiSunter
import org.apache.spark.sql.functions._

class FellegiSunterSpec extends SparkSuite {
  import spark.implicits._

  test("weights are the log2 likelihood ratios") {
    val (wa, wd) = FellegiSunter.weights(0.9, 0.1)
    assert(math.abs(wa - math.log(9.0) / math.log(2.0)) < 1e-12)
    assert(math.abs(wd - math.log(0.1 / 0.9) / math.log(2.0)) < 1e-12)
  }

  test("score: chained sum + two-threshold decision") {
    val pairs = Seq(
      (1L, 2L, true, true, true),    // 1.5+2.25+4.5 = 8.25  -> match
      (1L, 3L, true, false, false),  // 1.5-0.2-0.05 = 1.25  -> possible
      (1L, 4L, false, false, false)  // -0.95               -> non_match
    ).toDF("a", "b", "agr_seg", "agr_bal", "agr_sfx")
    val out = FellegiSunter.score(pairs,
        Seq(("agr_seg", 1.5, -0.7), ("agr_bal", 2.25, -0.2),
          ("agr_sfx", 4.5, -0.05)), upper = 3.1, lower = -0.5)
      .select("b", "score", "decision").as[(Long, Double, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(2L) == (8.25, "match"))
    assert(out(3L) == (1.25, "possible"))
    assert(out(4L) == (-0.95, "non_match"))
  }

  // deterministic splitmix draw in [0,1)
  private def draw(seed: Long): Double = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble
  }

  private val mTrue = IndexedSeq(0.95, 0.85, 0.7)
  private val uTrue = IndexedSeq(0.25, 0.1, 0.05)

  private def synthPairs(n: Int): Seq[(Boolean, Boolean, Boolean)] =
    (0 until n).map { i =>
      val isMatch = i % 5 == 0 // p* = 0.2
      def agree(k: Int) =
        draw(i.toLong * 31 + k) < (if (isMatch) mTrue(k) else uTrue(k))
      (agree(0), agree(1), agree(2))
    }

  test("EM over distributed pattern counts recovers the planted m/u/p") {
    val pairs = synthPairs(20000).toDF("g0", "g1", "g2")
    val pat = FellegiSunter.patternCounts(pairs, Seq("g0", "g1", "g2"))
      .as[(Boolean, Boolean, Boolean, Long)].collect()
    assert(pat.length <= 8 && pat.map(_._4).sum == 20000L)
    val est = FellegiSunter.estimateMU(
      pat.map(r => (IndexedSeq(r._1, r._2, r._3), r._4)).toSeq, iters = 200)
    (0 until 3).foreach { k =>
      assert(math.abs(est.m(k) - mTrue(k)) < 0.05, s"m($k)=${est.m(k)}")
      assert(math.abs(est.u(k) - uTrue(k)) < 0.03, s"u($k)=${est.u(k)}")
    }
    assert(math.abs(est.p - 0.2) < 0.03, s"p=${est.p}")
  }

  test("pattern-aggregated EM == per-pair EM (independent replay)") {
    val raw = synthPairs(3000)
    val pat = raw.groupBy(identity).map { case (g, rows) =>
      (IndexedSeq(g._1, g._2, g._3), rows.size.toLong)
    }.toSeq
    val a = FellegiSunter.estimateMU(pat, iters = 40)
    // straightforward per-pair loop, no pattern collapsing
    var m = IndexedSeq.fill(3)(0.9); var u = IndexedSeq.fill(3)(0.1)
    var p = 0.1
    (0 until 40).foreach { _ =>
      val resp = raw.map { g =>
        val gv = IndexedSeq(g._1, g._2, g._3)
        val pm = gv.indices.foldLeft(p)((acc, f) =>
          acc * (if (gv(f)) m(f) else 1 - m(f)))
        val pu = gv.indices.foldLeft(1 - p)((acc, f) =>
          acc * (if (gv(f)) u(f) else 1 - u(f)))
        (gv, pm / (pm + pu))
      }
      val sumR = resp.map(_._2).sum
      def clamp(x: Double) = math.min(1 - 1e-9, math.max(1e-9, x))
      m = IndexedSeq.tabulate(3)(f =>
        clamp(resp.collect { case (g, r) if g(f) => r }.sum / sumR))
      u = IndexedSeq.tabulate(3)(f =>
        clamp(resp.collect { case (g, r) if g(f) => 1 - r }.sum /
          (raw.size - sumR)))
      p = clamp(sumR / raw.size)
    }
    (0 until 3).foreach { k =>
      assert(math.abs(a.m(k) - m(k)) < 1e-6)
      assert(math.abs(a.u(k) - u(k)) < 1e-6)
    }
    assert(math.abs(a.p - p) < 1e-6)
  }

  test("spark builtin soundex == independent sequential Odell-Russell on " +
    "the corpus vocabulary and the classic trap cases") {
    val traps = Seq("robert", "rupert", "ashcraft", "ashcroft", "tymczak",
      "pfister", "honeyman", "hayhoe", "boyd", "cayce", "sysy", "akyka",
      "bwb", "bhb", "burroughs", "burrows", "example", "ekzampul")
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").isNotNull)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .as("token"))
      .where(length(col("token")) >= 3).distinct()
      .as[String].collect().toSeq
    val all = (traps ++ corpus).distinct.toDF("w")
      .select(col("w"), soundex(col("w")).as("k")).as[(String, String)]
      .collect()
    all.foreach { case (w, k) =>
      assert(k == graft.tools.GenFixtures.soundexSequential(w),
        s"'$w': spark=$k seq=${graft.tools.GenFixtures.soundexSequential(w)}")
    }
  }
}
