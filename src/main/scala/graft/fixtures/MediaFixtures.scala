package graft.fixtures

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRow
import org.apache.spark.sql.{DataFrame, Dataset}

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Deterministic media PAYLOAD synthesis for tests, benchmarks and the
  * committed q34/q45/q46 oracles — the fixture-side stand-in for fetching a
  * blob from object storage. Split out of the engine operator (r3 verdict
  * #2): `Multimodal.mediaTable(docs, fetch)` takes the fetch function, and
  * a real deployment passes an object-store GET or uses
  * `Multimodal.fromBinary` over an Iceberg blob column; everything here is
  * test scaffolding whose bytes are nonetheless REAL codec output
  * (javax.imageio PNG/JPEG, javax.sound WAV, MJPEG-in-RIFF-AVI), so the
  * engine's decode paths are exercised on genuine payloads.
  *
  * Every payload is a pure function of the media_ref, so the committed
  * expected-row fixtures stay reproducible.
  */
object MediaFixtures {

  /** Deterministic dimensions for a media_ref — the stand-in for whatever
    * size the original asset had. */
  def dimsOf(mediaRef: String): (Int, Int) = {
    val h = mediaRef.hashCode
    (64 + math.abs(h % 192), 64 + math.abs((h / 7) % 192))
  }

  /** REAL PNG encode of a w×h deterministic pixel pattern (javax.imageio —
    * ships in the JDK). Shared with the S2 page-render stub
    * (sources.PdfIngest). */
  def encodePng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = new Array[Int](w * h)
    var i = 0
    while (i < rgb.length) {
      val x = i % w
      val y = i / w
      val v = seed * 31 + x * 7 + y * 13 // cheap deterministic pattern
      rgb(i) = ((v & 0xff) << 16) | (((v >> 4) & 0xff) << 8) | ((v >> 8) & 0xff)
      i += 1
    }
    img.setRGB(0, 0, w, h, rgb, 0, w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL PNG payload for a media_ref: a w×h image with a deterministic
    * pixel pattern. */
  def pngBytes(mediaRef: String): Array[Byte] = {
    val (w, h) = dimsOf(mediaRef)
    encodePng(w, h, mediaRef.hashCode)
  }

  /** REAL WAV payload for a media_ref: 16-bit PCM mono at 8 kHz, 400–1200
    * samples of a seeded sine + Gaussian-noise mix, written by
    * `javax.sound.sampled`'s actual WAV encoder. */
  def wavBytes(mediaRef: String): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val seed = mediaRef.hashCode
    val rnd = new scala.util.Random(seed)
    val n = 400 + math.abs(seed % 800)
    val freq = 200.0 + math.abs(seed % 1000)
    val samples = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = math.max(-32768, math.min(32767,
        (math.sin(2 * math.Pi * freq * i / 8000.0) * 12000 +
          rnd.nextGaussian() * 1500).toInt))
      samples(2 * i) = (v & 0xff).toByte // little-endian per the format below
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL AVI payload for a media_ref: 2–7 JPEG frames (each a shifted
    * deterministic pixel pattern, encoded by javax.imageio's JPEG codec)
    * muxed into the standard RIFF-AVI container (Multimodal.aviMux). */
  def aviBytes(mediaRef: String): Array[Byte] = {
    val seed = mediaRef.hashCode
    val (w, h) = dimsOf(mediaRef)
    val nFrames = 2 + math.abs((seed / 31) % 6)
    val frames = (0 until nFrames).map { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = y * 31 + x * 7 + (seed + f * 97) * 13
          img.setRGB(x, y, ((v & 0xff) << 16) | (((v >> 4) & 0xff) << 8) | ((v >> 8) & 0xff))
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    Multimodal.aviMux(frames, w, h)
  }

  /** The fixture fetch function: modality from the ref (deterministic) —
    * most media are images; every 7th doc's logo slot carries a video clip
    * (frame-sampling path), every 5th stamp slot a real WAV clip (audio
    * decode path). */
  def payloadFor(ref: String): MediaRow = {
    val k =
      if (ref.endsWith("/logo") && math.abs(ref.hashCode) % 7 == 0) "video"
      else if (ref.endsWith("/stamp") && math.abs(ref.hashCode) % 5 == 0) "audio"
      else "image"
    val payload = k match {
      case "video" => aviBytes(ref)
      case "audio" => wavBytes(ref)
      case _ => pngBytes(ref)
    }
    MediaRow(ref, k, payload)
  }

  /** The fixture media table: the PRODUCTION operator
    * (`Multimodal.mediaTable`) fed by the fixture fetch above. */
  def mediaTable(docs: DataFrame, partitions: Int = 0): Dataset[MediaRow] =
    Multimodal.mediaTable(docs, payloadFor _, partitions)
}
