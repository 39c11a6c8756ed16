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
}
