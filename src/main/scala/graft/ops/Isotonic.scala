package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) least-squares regression — PAVA.
  * The calibration primitive: fit the best monotone step function to a
  * noisy ordered series (score → empirical precision curves, time →
  * volume trends), the non-parametric step q133's calibration scorecard
  * bins by hand. The L2-optimal monotone fit pools "adjacent violators":
  * every maximal decreasing run is replaced by its (weighted) mean.
  *
  * Engine shape: one shuffle to co-locate a series, then a typed in-group
  * PAVA stack fold — sort by x, push each point as a (sum, count) block,
  * and while the top block's mean exceeds the new block's mean, POOL them
  * (exact comparison by cross-multiplication `sumA·cntB > sumB·cntA`, no
  * floating point anywhere); finally each block's points all take the
  * block mean. Per-series state is that series' point list (the
  * per-document reassembly bound); the series dimension stays
  * embarrassingly parallel. `maxPoints` fails fast on degenerate keys.
  *
  * Fitted means are emitted as exact integer ppm: `fitted_ppm =
  * floorDiv(1e6·sum, count)` — deterministic, hashable, and (because
  * floor is monotone, so it commutes with the max/min in the minimax
  * characterization `f_i = max_{j≤i} min_{k≥i} avg(y[j..k])`) exactly
  * reproducible by an independent integer evaluation of that closed
  * form. Input y must be integral (cast upstream; ppm-scale reals first).
  * Output: `(series, x, y, fitted_ppm)`, one row per input point. */
object Isotonic {

  /** PAVA over (y, 1)-weighted points in array order; returns the pooled
    * block mean per point as (sumNumerator, count) ppm floor. */
  private[graft] def pavaPpm(ys: Array[Long]): Array[Long] = {
    val n = ys.length
    val sum = new Array[Long](n); val cnt = new Array[Long](n)
    val start = new Array[Int](n)
    var top = -1
    var i = 0
    while (i < n) {
      top += 1; sum(top) = ys(i); cnt(top) = 1L; start(top) = i
      // pool while the previous block's mean exceeds the new block's
      while (top > 0 &&
          sum(top - 1) * cnt(top) > sum(top) * cnt(top - 1)) {
        sum(top - 1) += sum(top); cnt(top - 1) += cnt(top)
        top -= 1
      }
      i += 1
    }
    val out = new Array[Long](n)
    var b = 0
    while (b <= top) {
      val end = if (b == top) n else start(b + 1)
      val f = Math.floorDiv(1000000L * sum(b), cnt(b))
      var j = start(b)
      while (j < end) { out(j) = f; j += 1 }
      b += 1
    }
    out
  }

  def fit(df: DataFrame, series: Column, x: Column, y: Column,
      maxPoints: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(series.cast("string").as("s"), x.cast("long").as("x"),
        y.cast("long").as("y"))
      .where(col("s").isNotNull && col("x").isNotNull && col("y").isNotNull)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val pts = it.map(t => (t._2, t._3)).toArray
        require(pts.length <= maxPoints,
          s"Isotonic.fit: series $k has ${pts.length} points " +
            s"(> $maxPoints); raise maxPoints deliberately")
        val sorted = pts.sorted // by x, then y (duplicate x kept, y-ordered)
        val fitted = pavaPpm(sorted.map(_._2))
        sorted.iterator.zip(fitted.iterator).map {
          case ((xx, yy), f) => (k, xx, yy, f)
        }
      }
      .toDF("series", "x", "y", "fitted_ppm")
  }
}
