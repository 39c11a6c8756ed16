package graft

import graft.ops.{Equalize, ImageQuality}
import org.apache.spark.sql.functions._

/** Declarative CLAHE LUT (groupBy histogram + window redistribution +
  * half-even integer rounding) vs the imperative OpenCV-transcribed
  * claheL LUT table. Exact parity holds on dyadic tile areas (255/area
  * dyadic → the imperative float lutScale is exact); the declarative
  * integer rounding is the DEFINITION q216's oracle replays. */
class EqualizeSpec extends SparkSuite {
  import spark.implicits._

  private def lutMap(src: Array[Int], w: Int, h: Int, tx: Int, ty: Int,
      clipMilli: Long): Map[(Int, Int, Int), Int] = {
    val tw = w / tx; val th = h / ty
    val hist = (0 until h).flatMap(yy => (0 until w).map(xx =>
        ((yy / th), (xx / tw), src(yy * w + xx))))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b, v), c) => (a, b, v, c) }
    Equalize.claheLut(hist.toDF("ty", "tx", "bin", "cnt").repartition(3),
        Seq("ty", "tx"), "bin", "cnt", tileArea = tw.toLong * th,
        clipLimitMilli = clipMilli)
      .as[(Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3.toInt) -> r._4.toInt).toMap
  }

  test("declarative LUT == imperative claheLuts on dyadic tile areas (random skewed planes)") {
    val rnd = new scala.util.Random(5)
    for (seed <- 1 to 3) {
      val (w, h, tx, ty) = (32, 16, 2, 2) // tiles 16x8, area 128 (dyadic)
      // a third of the pixels pinned to one level forces real clipping
      val src = Array.tabulate(w * h)(i =>
        if (i % 3 == seed % 3) 77 else rnd.nextInt(256))
      val luts = ImageQuality.claheLuts(src, w, h, 1.5, tx, ty)
      val got = lutMap(src, w, h, tx, ty, 1500L)
      for (a <- 0 until ty; b <- 0 until tx; v <- 0 until 256)
        assert(got((a, b, v)) == luts(a)(b)(v), s"seed=$seed tile($a,$b) bin $v")
    }
  }

  test("hand-computed single tile: clip, stepped redistribution, cumulative LUT") {
    // the ImageQualitySpec hand case through the DECLARATIVE path:
    // area 256, clip 1, pixels {100:252, 200:4} -> lut[100]=102, lut[200]=202
    val src = Array.fill(256)(100)
    src(0) = 200; src(17) = 200; src(100) = 200; src(255) = 200
    val got = lutMap(src, 16, 16, 1, 1, 1500L)
    assert(got((0, 0, 100)) == 102 && got((0, 0, 200)) == 202)
    // bins OUTSIDE the observed values still get redistributed mass:
    // residual 254 steps +1 onto bins 0..253, so cum at bin 0 = 1 and
    // lut[0] = roundHalfEven(255/256) = 1 (not 0)
    assert(got((0, 0, 0)) == 1, got((0, 0, 0)))
  }

  test("full declarative CLAHE (LUT + bilinear apply) == imperative claheL on dyadic tiles") {
    val rnd = new scala.util.Random(9)
    val (w, h, tX, tY) = (32, 16, 2, 2); val tw = 16; val th = 8
    val src = Array.tabulate(w * h)(i => if (i % 4 == 0) 200 else rnd.nextInt(256))
    val expected = ImageQuality.claheL(src, w, h, 1.5, tX, tY)
    val pixels = (for (yy <- 0 until h; xx <- 0 until w)
      yield ("i1", xx, yy, src(yy * w + xx))).toDF("img", "x", "y", "v")
      .repartition(5).cache()
    val hist = pixels.groupBy(col("img"),
        expr(s"y div $th").cast("long").as("tile_y"),
        expr(s"x div $tw").cast("long").as("tile_x"),
        col("v").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val luts = Equalize.claheLut(hist, Seq("img", "tile_y", "tile_x"),
      "bin", "cnt", tileArea = tw.toLong * th)
    val got = Equalize.claheApply(pixels, "img", "x", "y", "v", luts,
        tw, th, tX, tY)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._2.toInt, r._3.toInt) -> r._4.toInt).toMap
    assert(got.size == w * h)
    for (yy <- 0 until h; xx <- 0 until w)
      assert(got((xx, yy)) == expected(yy * w + xx),
        s"($xx,$yy) v=${src(yy * w + xx)}")
    pixels.unpersist()
  }

  test("zero-clipping plane is plain equalization; uniform histogram is near-identity") {
    // one pixel per bin: no clipping (cnt=1=clip), cum(v)=v+1,
    // lut[v] = roundHalfEven((v+1)*255/256) which is v or v+1
    val src = Array.tabulate(256)(identity)
    val got = lutMap(src, 16, 16, 1, 1, 1500L)
    (0 until 256).foreach { v =>
      assert(math.abs(got((0, 0, v)) - v) <= 1, s"bin $v -> ${got((0, 0, v))}")
    }
    assert(got((0, 0, 255)) == 255)
  }
}
