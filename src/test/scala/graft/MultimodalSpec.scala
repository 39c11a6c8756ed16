package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.fixtures.InvoiceCorpus
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = InvoiceCorpus.docs(spark, 25).toDF().cache()

  test("media table: one row per media span, payload attached, partitioned") {
    val media = graft.fixtures.MediaFixtures.mediaTable(docs, partitions = 8)
    val rows = media.collect()
    assert(rows.length == 50) // logo + stamp per doc
    // image payloads are REAL PNGs, video payloads REAL RIFF-AVI
    // containers (magic bytes both)
    assert(rows.filter(_.kind == "image").forall(r =>
      (r.bytes(0) & 0xff) == 0x89 && r.bytes(1) == 'P' && r.bytes(2) == 'N' && r.bytes(3) == 'G'))
    assert(rows.filter(_.kind == "video").forall(r =>
      new String(r.bytes.take(4), "US-ASCII") == "RIFF" &&
        new String(r.bytes.slice(8, 12), "US-ASCII") == "AVI "))
    assert(media.rdd.getNumPartitions == 8)
    assert(rows.map(_.media_ref).distinct.length == 50)
  }

  test("media table derives partition width from the cluster when unset") {
    val media = graft.fixtures.MediaFixtures.mediaTable(docs)
    assert(media.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("image decode is real: ImageIO reads back the encoded dimensions and pixels") {
    val ref = "doc-000007/logo"
    val bytes = graft.fixtures.MediaFixtures.pngBytes(ref)
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val h = ref.hashCode
    assert(img.getWidth == 64 + math.abs(h % 192))
    assert(img.getHeight == 64 + math.abs((h / 7) % 192))
    // PNG is lossless: a decoded pixel equals the deterministic pattern
    val v = h * 31 + 3 * 7 + 2 * 13
    val expected = ((v & 0xff) << 16) | (((v >> 4) & 0xff) << 8) | ((v >> 8) & 0xff)
    assert((img.getRGB(3, 2) & 0xffffff) == expected)
  }

  test("decode: schema, deterministic dims, real pixel-stat features for images") {
    val dec = Multimodal.decodeAndFeaturize(graft.fixtures.MediaFixtures.mediaTable(docs), batchSize = 16)
    val rows = dec.collect()
    // visual rows carry pixel dims; audio rows carry (sampleRate, channels)
    assert(rows.filter(_.kind != "audio").forall(r =>
      r.width >= 64 && r.width < 256 && r.height >= 64 && r.height < 256))
    assert(rows.forall(_.feature.length == 8))
    // image features are raster statistics: means in [0,1], the 4-bin
    // luminance histogram sums to 1
    rows.filter(_.kind == "image").foreach { r =>
      assert(r.feature.forall(f => f >= 0f && f <= 1f), r.feature.mkString(","))
      assert(math.abs(r.feature.drop(4).map(_.toDouble).sum - 1.0) < 1e-5)
    }
    // determinism: same ref → same decode
    val twice = Multimodal.decodeAndFeaturize(graft.fixtures.MediaFixtures.mediaTable(docs)).collect()
    assert(rows.sortBy(_.media_ref).zip(twice.sortBy(_.media_ref))
      .forall { case (a, b) => a.width == b.width && a.feature.sameElements(b.feature) })
  }

  test("audio: real WAV payloads decode through AudioSystem with sample-exact features") {
    // force the audio route on a larger corpus (every 5th stamp slot)
    val media = graft.fixtures.MediaFixtures.mediaTable(InvoiceCorpus.docs(spark, 60).toDF())
    val audio = media.filter(_.kind == "audio").collect()
    assert(audio.nonEmpty, "fixture corpus should carry audio rows")
    // payload IS a RIFF/WAVE file (magic bytes), not a stub
    audio.foreach { r =>
      assert(new String(r.bytes.take(4), "US-ASCII") == "RIFF")
      assert(new String(r.bytes.slice(8, 12), "US-ASCII") == "WAVE")
    }
    val dec = Multimodal.decodeAndFeaturize(media).filter(_.kind == "audio").collect()
    dec.foreach { d =>
      assert(d.width == 8000 && d.height == 1, "width=sampleRate, height=channels")
      assert(d.n_frames >= 400 && d.n_frames < 1200)
      val f = d.feature
      assert(f.length == 8)
      assert(f(0) > 0.1f && f(0) < 0.6f, s"RMS of a 12k-amplitude sine: ${f(0)}")
      assert(f(1) > f(0), "peak >= RMS")
      assert(f(2) > 0f && f(2) < 0.5f, s"zero-crossing rate: ${f(2)}")
      assert(math.abs(f.drop(4).map(_.toDouble).sum - 1.0) < 1e-5,
        "amplitude histogram sums to 1")
    }
    // independent decode: AudioSystem on the raw payload agrees with the
    // distributed decode (frames + format)
    val one = audio.head
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(one.bytes))
    val decOne = dec.find(_.media_ref == one.media_ref).get
    assert(ais.getFrameLength == decOne.n_frames)
    assert(ais.getFormat.getSampleRate == 8000f)
  }

  test("audio: stereo and 8-bit WAVs are normalized, not garbage (r3 ADVICE)") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(fmt: AudioFormat, frames: Int)(sample: (Int, Int) => Int): Array[Byte] = {
      val bytesPerFrame = fmt.getSampleSizeInBits / 8 * fmt.getChannels
      val data = new Array[Byte](frames * bytesPerFrame)
      var f = 0
      while (f < frames) {
        var c = 0
        while (c < fmt.getChannels) {
          val v = sample(f, c)
          if (fmt.getSampleSizeInBits == 16) {
            val o = (f * fmt.getChannels + c) * 2
            data(o) = (v & 0xff).toByte; data(o + 1) = ((v >> 8) & 0xff).toByte
          } else data(f * fmt.getChannels + c) = (v & 0xff).toByte // 8-bit unsigned
          c += 1
        }
        f += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(data), fmt, frames.toLong), AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // stereo 16-bit: L = 12000·sin, R = 0 → downmix averages to 6000·sin
    val stereo = wav(new AudioFormat(8000f, 16, 2, true, false), 800)((f, c) =>
      if (c == 0) (math.sin(2 * math.Pi * 440 * f / 8000.0) * 12000).toInt else 0)
    // 8-bit unsigned mono flat silence at the midpoint (128 → 0 signed)
    val eightBit = wav(new AudioFormat(8000f, 8, 1, false, false), 500)((_, _) => 128)
    val media = Seq(
      Multimodal.MediaRow("x/stereo", "audio", stereo),
      Multimodal.MediaRow("x/8bit", "audio", eightBit)).toDS()
    val dec = Multimodal.decodeAndFeaturize(media).collect().map(d => d.media_ref -> d).toMap
    val st = dec("x/stereo")
    assert(st.height == 2 && st.n_frames == 800, "original channel count + frame count")
    val expRms = 6000.0 / math.sqrt(2) / 32768.0 // downmixed sine RMS
    assert(math.abs(st.feature(0) - expRms) < 0.01, s"stereo downmix RMS: ${st.feature(0)}")
    val eb = dec("x/8bit")
    assert(eb.height == 1 && eb.n_frames == 500)
    assert(eb.feature(0) < 0.01 && eb.feature(1) < 0.01, "8-bit midpoint silence → ~0 signal")
    // audioWindows on the same payloads: windows cover the mono frames
    val win = Multimodal.audioWindows(media, windowSamples = 256).collect()
    assert(win.filter(_.getString(0) == "x/stereo").map(_.getInt(2)).sum == 800)
    assert(win.filter(_.getString(0) == "x/8bit").map(_.getInt(2)).sum == 500)
  }

  test("video: real MJPEG-AVI containers round-trip through the RIFF demux and JDK JPEG codec") {
    val ref = "doc-000014/logo"
    val bytes = graft.fixtures.MediaFixtures.aviBytes(ref)
    // standard container magic
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "AVI ")
    val (w, h, jpegs) = Multimodal.aviDemux(bytes)
    val hh = ref.hashCode
    assert(w == 64 + math.abs(hh % 192) && h == 64 + math.abs((hh / 7) % 192))
    assert(jpegs.size >= 2 && jpegs.size <= 7)
    // every demuxed frame is a REAL JPEG the JDK codec decodes at the
    // container's declared dimensions
    jpegs.foreach { j =>
      assert((j(0) & 0xff) == 0xff && (j(1) & 0xff) == 0xd8, "JPEG SOI marker")
      val img = ImageIO.read(new ByteArrayInputStream(j))
      assert(img.getWidth == w && img.getHeight == h)
    }
    // distributed decode agrees with the direct demux
    val dec = Multimodal.decodeAndFeaturize(
      graft.fixtures.MediaFixtures.mediaTable(InvoiceCorpus.docs(spark, 60).toDF()))
      .filter(_.kind == "video").collect()
    assert(dec.nonEmpty, "fixture corpus should carry video rows")
    dec.foreach { d =>
      val (dw, dh, fr) = Multimodal.aviDemux(graft.fixtures.MediaFixtures.aviBytes(d.media_ref))
      assert(d.width == dw && d.height == dh && d.n_frames == fr.size)
      assert(d.feature.length == 8 && d.feature.forall(f => f >= 0f && f <= 1f))
      assert(math.abs(d.feature.drop(4).map(_.toDouble).sum - 1.0) < 1e-4,
        "mean per-frame luminance histogram still sums to 1")
    }
  }

  test("q34 expected-rows fixture is current (driver oracle drift guard)") {
    // the committed parquet at src/test/resources/expected IS the driver's
    // q34 oracle — if the decode path or media-table plumbing changes, this
    // test forces the fixture (and the change) to be re-justified together
    val expected = spark.read.parquet("src/test/resources/expected/q34_media_decode.parquet")
    val actual = SparkEntry.queries("q34_media_decode")(spark, "/root/testdata/sf0.01")
    assert(actual.exceptAll(expected).count() == 0, "live rows missing from fixture")
    assert(expected.exceptAll(actual).count() == 0, "fixture rows missing from live output")
  }

  test("q46 expected-rows fixture is current (audio/video decode drift guard)") {
    val expected = spark.read.parquet("src/test/resources/expected/q46_av_decode.parquet")
    val actual = SparkEntry.queries("q46_av_decode")(spark, "/root/testdata/sf0.01")
    assert(actual.exceptAll(expected).count() == 0, "live rows missing from fixture")
    assert(expected.exceptAll(actual).count() == 0, "fixture rows missing from live output")
  }

  test("audio windows: per-window PCM stats cover the clip exactly") {
    val media = graft.fixtures.MediaFixtures.mediaTable(InvoiceCorpus.docs(spark, 60).toDF())
    val dec = Multimodal.decodeAndFeaturize(media).filter(_.kind == "audio").collect()
    assert(dec.nonEmpty)
    val win = Multimodal.audioWindows(media, windowSamples = 256)
    val rows = win.collect()
    // every audio clip is fully tiled: windows per clip == ceil(samples/256)
    val perClip = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    dec.foreach { d =>
      assert(perClip(d.media_ref) == (d.n_frames + 255) / 256, d.media_ref)
    }
    // window sample counts per clip sum to the clip's total samples
    val sums = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getInt(2)).sum).toMap
    dec.foreach(d => assert(sums(d.media_ref) == d.n_frames))
    // stats are sane: rms in (0,1), peak >= rms, zcr in [0, 1)
    rows.foreach { r =>
      val (rms, peak, zcr) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(rms > 0 && rms < 1 && peak >= rms && zcr >= 0 && zcr < 1, r)
    }
  }

  test("perceptual image dedup: dHash pairs planted near-duplicates, separates distinct noise") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    def noiseImage(seed: Int, flipPixels: Int): Array[Byte] = {
      // block noise (16px cells) so the dHash grid sees STRUCTURE, plus an
      // optional small per-pixel perturbation for the near-dup copy
      val rnd = new scala.util.Random(seed)
      val img = new BufferedImage(128, 128, BufferedImage.TYPE_INT_RGB)
      val cells = Array.fill(8, 8)(rnd.nextInt(256))
      for (y <- 0 until 128; x <- 0 until 128) {
        val v = cells(y / 16)(x / 16)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val flip = new scala.util.Random(seed + 999)
      (0 until flipPixels).foreach { _ =>
        val (x, y) = (flip.nextInt(128), flip.nextInt(128))
        img.setRGB(x, y, 0xffffff)
      }
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // a/b: same structure, b has 40 flipped pixels (near-dup); c/d: other noise
    val media = Seq(
      Multimodal.MediaRow("img-a", "image", noiseImage(1, 0)),
      Multimodal.MediaRow("img-b", "image", noiseImage(1, 40)),
      Multimodal.MediaRow("img-c", "image", noiseImage(2, 0)),
      Multimodal.MediaRow("img-d", "image", noiseImage(3, 0))).toDS()
    val pairs = Multimodal.perceptualNearDup(media, maxHamming = 3)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(pairs.contains(("img-a", "img-b")), s"near-dup not found: $pairs")
    assert(!pairs.exists(p => p._1 == "img-c" || p._2 == "img-c"), pairs)
    assert(!pairs.exists(p => p._1 == "img-d" || p._2 == "img-d"), pairs)
    // the exact filter is trustworthy: recompute hamming on the driver
    val sigs = media.collect().map(r => r.media_ref ->
      Multimodal.dhash(javax.imageio.ImageIO.read(
        new ByteArrayInputStream(r.bytes)))).toMap
    assert(java.lang.Long.bitCount(sigs("img-a") ^ sigs("img-b")) <= 3)
    assert(java.lang.Long.bitCount(sigs("img-a") ^ sigs("img-c")) > 3)
  }

  test("resize: PIL.thumbnail round_aspect semantics (binding dim takes the box, other rounds to best aspect)") {
    val dims = Seq(
      (2048, 1024), // over on W, aspect 2 → (1024, 512)
      (512, 4096),  // over on H, aspect 0.125 → (128, 1024)
      (800, 600),   // inside the box → untouched
      (3000, 3000), // both over → (1024, 1024)
      (1001, 2000), // 1024·0.5005 = 512.512 → CEIL wins round_aspect → (513, 1024)
      (999, 2000),  // 1024·0.4995 = 511.488 → floor wins → (511, 1024)
      (2000, 1))    // degenerate: floor→0 has key 0, then 1-pixel min → (1024, 1)
      .toDF("width", "height")
    val out = Multimodal.withResizedDims(dims)
      .select("out_width", "out_height").as[(Int, Int)].collect().toSeq
    assert(out == Seq((1024, 512), (128, 1024), (800, 600), (1024, 1024),
      (513, 1024), (511, 1024), (1024, 1)), out)
  }

  test("frame sampling explodes every Nth frame index") {
    val dec = Multimodal.decodeAndFeaturize(graft.fixtures.MediaFixtures.mediaTable(docs)).cache()
    val frames = Multimodal.sampleFrames(dec, everyN = 2)
    // images (1 frame) → 1 row; videos (n frames) → ceil(n/2) rows; audio
    // rows are excluded (frame sampling is a visual op)
    val expected = dec.collect().filter(_.kind != "audio")
      .map(d => (d.n_frames - 1) / 2 + 1).sum
    assert(frames.count() == expected)
    // image rows only ever sample frame 0; multi-frame videos reach beyond
    val videoRefs = dec.filter(_.kind == "video").collect().map(_.media_ref).toSet
    val imgFrames = frames.where(!$"media_ref".isin(videoRefs.toSeq: _*))
      .select("frame_idx").distinct().as[Int].collect().toSet
    assert(imgFrames == Set(0))
    if (dec.collect().exists(d => d.kind == "video" && d.n_frames >= 3)) {
      val vidMax = frames.where($"media_ref".isin(videoRefs.toSeq: _*))
        .agg(max("frame_idx")).as[Int].head()
      assert(vidMax >= 2, "a >=3-frame AVI samples past frame 0")
    }
  }
}
