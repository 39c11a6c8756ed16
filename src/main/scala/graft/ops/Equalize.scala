package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative CLAHE LUT construction — contrast-limited histogram
  * equalization as a Spark aggregation, the corpus-scale twin of the
  * imperative per-image [[ImageQuality.claheL]] LUT step
  * (image_enhancement.py:259-261's cv2.createCLAHE, OpenCV clahe.cpp
  * semantics): a training-data pipeline normalizing millions of page
  * images computes per-tile histograms ONCE as a groupBy over the
  * (image, tile, bin) table and derives every tile's LUT with window
  * functions — no per-image driver loops, shuffles keyed by tile.
  *
  * Semantics per tile (OpenCV transcription, integer-exact):
  *   clip        = max(1, clipLimitMilli·tileArea / 256000)   [int div]
  *   capped      = min(cnt, clip); clipped = Σ max(cnt−clip, 0)
  *   redistBatch = clipped div 256; residual = clipped mod 256
  *   step        = max(256 div residual, 1)
  *   hist'       = capped + redistBatch + [bin mod step = 0 ∧
  *                                         bin div step < residual]
  *   lut(bin)    = roundHalfEven(cumsum(hist')·255 / tileArea)
  *
  * The ONE divergence from the imperative path: claheL rounds
  * `sum · (255f/area)` in FLOAT (OpenCV's lutScale). Here the rounding is
  * exact-integer half-even — bit-identical to float whenever 255/area is
  * a dyadic rational (tile areas that are powers of two, the common tile
  * shapes; EqualizeSpec locks that parity), and the DEFINITION the q216
  * oracle replays for arbitrary areas. Missing bins participate in
  * redistribution (the dense 256-bin grid is generated per tile).
  *
  * Input: one row per observed (tile, bin) with a count; `tileCols` is
  * the tile key (e.g. image_id, tile_y, tile_x). Output: 256 rows per
  * tile — (tileCols…, bin, lut). */
object Equalize {

  def claheLut(hist: DataFrame, tileCols: Seq[String], binCol: String,
      cntCol: String, tileArea: Long, clipLimitMilli: Long = 1500L): DataFrame = {
    require(tileCols.nonEmpty, "claheLut: tile key columns required")
    require(tileArea > 0, "claheLut: tileArea must be positive")
    val clip = math.max(1L, clipLimitMilli * tileArea / 256000L)
    val tk = tileCols.map(col)
    val tiles = hist.select(tk: _*).distinct()
    val dense = tiles
      .select(tk :+ explode(sequence(lit(0L), lit(255L))).as("bin"): _*)
      .join(hist.select(tk :+ col(binCol).cast("long").as("bin")
          :+ col(cntCol).cast("long").as("cnt"): _*),
        tileCols :+ "bin", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val wTile = Window.partitionBy(tk: _*)
    val wCum = Window.partitionBy(tk: _*).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRedist = dense
      .withColumn("clipped", sum(greatest(col("cnt") - clip, lit(0L))).over(wTile))
      .withColumn("redist_batch", expr("clipped div 256"))
      .withColumn("residual", col("clipped") % 256)
      .withColumn("step", greatest(expr("256 div residual"), lit(1L)))
      .withColumn("hist2",
        least(col("cnt"), lit(clip)) + col("redist_batch") +
          when(col("residual") > 0 && col("bin") % col("step") === 0 &&
            expr("bin div step") < col("residual"), 1L).otherwise(0L))
      .withColumn("cum", sum("hist2").over(wCum))
    // exact half-even rounding of cum·255/area in pure integer arithmetic
    withRedist
      .withColumn("v", col("cum") * 255)
      .withColumn("q", expr(s"v div $tileArea"))
      .withColumn("r", col("v") % tileArea)
      .withColumn("lut",
        least(lit(255L), col("q") +
          when(col("r") * 2 > tileArea, 1L)
            .when(col("r") * 2 === tileArea, col("q") % 2)
            .otherwise(0L)))
      .select(tk :+ col("bin") :+ col("lut"): _*)
  }

  /** The LUT APPLICATION stage of declarative CLAHE: per pixel, OpenCV's
    * −0.5-offset bilinear interpolation between the 4 neighbouring tile
    * LUTs, in EXACT integer arithmetic — the interpolation weights are the
    * rationals xa = ((2x − tw) mod 2tw)/2tw (ya likewise), so the blend is
    * a single integer polynomial N over denominator 4·tw·th, rounded
    * half-even once. Bit-identical to the imperative [[ImageQuality.claheL]]
    * whenever tw and th are powers of two (dyadic weights make the float
    * path exact — EqualizeSpec locks it); the integer form is the
    * definition the q217 oracle replays for arbitrary tile sizes.
    *
    * `pixels`: (imgCol, x, y, v); `luts`: (imgCol, tile_y, tile_x, bin,
    * lut) as produced by [[claheLut]] with tile keys (imgCol, tile_y,
    * tile_x) — imgCol is a single (composite if needed) image key.
    * Output: (img, x, y, out). One narrow pixel pass + 4 equi joins
    * against the (tiny, 256·tiles-rows-per-image) LUT table — at corpus
    * scale the LUT side broadcasts and the pixel stream never shuffles. */
  def claheApply(pixels: DataFrame, imgCol: String, xCol: String,
      yCol: String, vCol: String, luts: DataFrame,
      tileW: Int, tileH: Int, tilesX: Int, tilesY: Int): DataFrame = {
    require(tileW > 0 && tileH > 0 && tilesX > 0 && tilesY > 0,
      "claheApply: tile geometry must be positive")
    val tw2 = 2L * tileW; val th2 = 2L * tileH
    // floor division by hand: ax ∈ [−tw, 2·w−tw) so the only negative
    // quotient is −1 (Spark's `div` truncates toward zero — not floor)
    val px = pixels.select(col(imgCol).cast("string").as("img"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
        col(vCol).cast("long").as("v"))
      .withColumn("ax", col("x") * 2 - tileW)
      .withColumn("ay", col("y") * 2 - tileH)
      .withColumn("tx1", when(col("ax") < 0, -1L).otherwise(expr(s"ax div $tw2")))
      .withColumn("ty1", when(col("ay") < 0, -1L).otherwise(expr(s"ay div $th2")))
      .withColumn("p", col("ax") - col("tx1") * tw2)
      .withColumn("q", col("ay") - col("ty1") * th2)
      .withColumn("tx1c", greatest(col("tx1"), lit(0L)))
      .withColumn("tx2c", least(col("tx1") + 1, lit(tilesX - 1L)))
      .withColumn("ty1c", greatest(col("ty1"), lit(0L)))
      .withColumn("ty2c", least(col("ty1") + 1, lit(tilesY - 1L)))
    def corner(name: String, tyKey: String, txKey: String)(df: DataFrame) =
      df.join(
        luts.select(col(imgCol).cast("string").as("img"),
          col("tile_y").cast("long").as(tyKey),
          col("tile_x").cast("long").as(txKey),
          col("bin").cast("long").as("v"),
          col("lut").cast("long").as(name)),
        Seq("img", tyKey, txKey, "v"))
    val joined = corner("l22", "ty2c", "tx2c")(
      corner("l21", "ty2c", "tx1c")(
        corner("l12", "ty1c", "tx2c")(
          corner("l11", "ty1c", "tx1c")(px))))
    val den = tw2 * th2 // = 4·tw·th
    val n = col("l11") * (lit(tw2) - col("p")) * (lit(th2) - col("q")) +
      col("l12") * col("p") * (lit(th2) - col("q")) +
      col("l21") * (lit(tw2) - col("p")) * col("q") +
      col("l22") * col("p") * col("q")
    joined
      .withColumn("nsum", n)
      .withColumn("qd", expr(s"nsum div $den"))
      .withColumn("r", col("nsum") % den)
      .withColumn("out",
        least(lit(255L), col("qd") +
          when(col("r") * 2 > den, 1L)
            .when(col("r") * 2 === den, col("qd") % 2)
            .otherwise(0L)))
      .select(col("img"), col("x"), col("y"), col("out"))
  }
}
