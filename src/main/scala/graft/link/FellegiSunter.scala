package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969;
  * Winkler's EM estimation 1988) — the decision theory under every
  * production ER system (Splink, JedAI, …): each candidate pair gets a
  * log-likelihood-ratio score Σ_k w_k, where field k contributes
  * log2(m_k/u_k) on agreement and log2((1−m_k)/(1−u_k)) on disagreement
  * (m = P(agree | match), u = P(agree | non-match)), then two thresholds
  * split pairs into match / possible (clerical review) / non-match.
  *
  * Scale shape: scoring is a per-pair codegen'd expression over whatever
  * blocking produced the candidates — embarrassingly parallel, no shuffle
  * beyond the blocking join. Parameter estimation aggregates pairs to
  * AGREEMENT-PATTERN counts (≤ 2^K rows for K fields — one groupBy) and
  * runs EM on the driver over that tiny vector: the classic
  * "aggregate-then-solve" split that keeps the iterative part off the
  * cluster entirely, so it costs the same at 100 TB as at 100 MB. */
object FellegiSunter {

  /** (agreement weight, disagreement weight) from m/u probabilities. */
  def weights(m: Double, u: Double): (Double, Double) = {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"m,u in (0,1), got $m,$u")
    val log2 = math.log(2)
    (math.log(m / u) / log2, math.log((1 - m) / (1 - u)) / log2)
  }

  /** Score candidate pairs. `fields` = (boolean agreement column,
    * agreeWeight, disagreeWeight); score = the chained left-to-right sum
    * (fixed expression-tree order → bit-reproducible and replayable as the
    * identical SQL arithmetic); decision by open thresholds (callers pick
    * thresholds off the representable sums — see q138). */
  def score(pairs: DataFrame, fields: Seq[(String, Double, Double)],
            upper: Double, lower: Double): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(upper > lower, s"upper ($upper) must exceed lower ($lower)")
    val total = fields.map { case (c, wa, wd) =>
      when(col(c), lit(wa)).otherwise(lit(wd))
    }.reduceLeft(_ + _)
    pairs
      .withColumn("score", round(total, 6))
      .withColumn("decision",
        when(col("score") > upper, "match")
          .when(col("score") < lower, "non_match")
          .otherwise("possible"))
  }

  /** Distributed half of EM: collapse pairs to agreement-pattern counts.
    * Output ≤ 2^K rows: (γ_1 … γ_K booleans, n). */
  def patternCounts(pairs: DataFrame, agreeCols: Seq[String]): DataFrame =
    pairs.groupBy(agreeCols.map(col): _*).agg(count(lit(1)).as("n"))

  /** EM-estimated parameters: per-field m, u and the match prevalence p. */
  final case class FsEm(m: IndexedSeq[Double], u: IndexedSeq[Double], p: Double)

  /** Driver half of EM over pattern counts (Winkler 1988): latent match
    * indicator per PATTERN, conditional independence across fields.
    * Deterministic: fixed init, fixed iteration count, patterns processed
    * in lexicographic order. `patterns` = (γ vector, count). */
  def estimateMU(patterns: Seq[(IndexedSeq[Boolean], Long)], iters: Int = 50,
                 m0: Double = 0.9, u0: Double = 0.1, p0: Double = 0.1): FsEm = {
    require(patterns.nonEmpty, "no agreement patterns")
    val k = patterns.head._1.length
    require(patterns.forall(_._1.length == k), "ragged pattern vectors")
    val ordered = patterns.sortBy(_._1.map(b => if (b) '1' else '0').mkString)
    val total = ordered.map(_._2).sum.toDouble
    var m = IndexedSeq.fill(k)(m0)
    var u = IndexedSeq.fill(k)(u0)
    var p = p0
    var it = 0
    while (it < iters) {
      // E-step: posterior match responsibility per pattern
      val resp = ordered.map { case (g, n) =>
        var pm = p
        var pu = 1 - p
        var f = 0
        while (f < k) {
          pm *= (if (g(f)) m(f) else 1 - m(f))
          pu *= (if (g(f)) u(f) else 1 - u(f))
          f += 1
        }
        val r = if (pm + pu == 0) 0.0 else pm / (pm + pu)
        (g, n, r)
      }
      // M-step (clamped away from {0,1} so degenerate fields stay finite)
      val sumR = resp.map { case (_, n, r) => n * r }.sum
      val sumNR = total - sumR
      def clamp(x: Double) = math.min(1 - 1e-9, math.max(1e-9, x))
      m = IndexedSeq.tabulate(k) { f =>
        clamp(resp.map { case (g, n, r) => if (g(f)) n * r else 0.0 }.sum /
          math.max(sumR, 1e-300))
      }
      u = IndexedSeq.tabulate(k) { f =>
        clamp(resp.map { case (g, n, r) => if (g(f)) n * (1 - r) else 0.0 }.sum /
          math.max(sumNR, 1e-300))
      }
      p = clamp(sumR / total)
      it += 1
    }
    FsEm(m, u, p)
  }
}
