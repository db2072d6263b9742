package graft

import org.apache.spark.sql.functions._

import graft.operators.{MediaFixtures, Multimodal}

/** The batched mapPartitions decode path must agree with the
  * column-only mirror used by the oracle-gated query (same stub
  * arithmetic over the same bytes).
  */
class MultimodalSpec extends SparkSpec {

  test("mapPartitions decode plumbing matches column mirror") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
    val asBinary = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    val viaPartitions = Multimodal.extractMeta(spark, asBinary).toDF()
      .withColumnRenamed("id", "doc_id")
    val viaColumns = Multimodal.metaColumns(docs, "doc_id", "text")
    assert(viaPartitions.except(viaColumns).count() == 0)
    assert(viaColumns.except(viaPartitions).count() == 0)
    assert(viaColumns.count() == docs.count())
  }

  test("resize bounds payloads and recomputes dimensions") {
    import spark.implicits._
    val media = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    val resized = Multimodal.resize(spark, media, maxBytes = 64)
    val rows = resized.collect()
    assert(rows.nonEmpty && rows.forall(_.payload.length <= 64))
    assert(rows.forall(r => r.width >= 16 && r.height >= 16))
  }

  test("decodeImage recovers exact dimensions from real PNG bytes") {
    val img = new java.awt.image.BufferedImage(37, 21,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(5, 5, 0xa0b0c0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.decodeImage(bos.toByteArray) == (37L, 21L, 3L))
  }

  test("decodeImageFeatures sums exact channel values from real pixels") {
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, 0x102030) // r=16 g=32 b=48
    img.setRGB(1, 0, 0x010203) // r=1  g=2  b=3
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.decodeImageFeatures(bos.toByteArray) ==
      (2L, 17L, 34L, 51L))
  }

  test("distributed feature extraction reproduces the generation-time sums") {
    val dir = MediaFixtures.ensure()
    val got = Multimodal.imageFeatures(spark, dir)
    val want = spark.read.option("header", "true")
      .schema("media_id LONG, n_pixels LONG, sum_r LONG, sum_g LONG, " +
        "sum_b LONG")
      .csv(MediaFixtures.featuresCsv)
    assert(got.count() == MediaFixtures.Count.toLong + MediaFixtures.Count / 4)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "decoded per-channel sums must equal the sidecar exactly")
  }

  test("distributed PNG decode reproduces the generation-time sidecar") {
    val dir = MediaFixtures.ensure()
    val got = Multimodal.imageMeta(spark, dir)
    val want = spark.read.option("header", "true")
      .schema("media_id LONG, width LONG, height LONG, channels LONG, " +
        "n_bytes LONG")
      .csv(MediaFixtures.metaCsv)
    assert(got.count() == MediaFixtures.Count.toLong + MediaFixtures.Count / 4)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "decoded metadata must equal the sidecar exactly")
  }

  test("decodeAudio recovers exact format parameters from real WAV bytes") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(16000f, 16, 2, true, false)
    val pcm = new Array[Byte](300 * 2 * 2) // 300 frames, stereo, 16-bit
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 300L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.decodeAudio(bos.toByteArray) == (16000L, 2L, 300L))
  }

  test("decodeAudioFeatures sums exact channel values from known PCM") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 3 stereo frames with hand-picked samples: ch0 = 100, -200, 32767;
    // ch1 = -1, 0, -32768 (the abs(Short.MinValue) peak edge)
    val samples = Array[Short](100, -1, -200, 0, 32767, -32768)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 3L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.decodeAudioFeatures(bos.toByteArray) ==
      (3L, (100 - 200 + 32767).toLong, (-1 + 0 - 32768).toLong, 32768L))
  }

  test("distributed audio feature extraction reproduces the generation-time sums") {
    val dir = MediaFixtures.ensure()
    val got = Multimodal.audioFeatures(spark, dir)
    val want = spark.read.option("header", "true")
      .schema("media_id LONG, n_frames LONG, sum_ch0 LONG, " +
        "sum_ch1 LONG, peak LONG")
      .csv(MediaFixtures.audioFeaturesCsv)
    assert(got.count() == MediaFixtures.Count.toLong + MediaFixtures.Count / 4)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "decoded audio features must equal the sidecar exactly")
  }

  test("distributed WAV decode reproduces the generation-time sidecar") {
    val dir = MediaFixtures.ensure()
    val got = Multimodal.audioMeta(spark, dir)
    val want = spark.read.option("header", "true")
      .schema("media_id LONG, sample_rate LONG, channels LONG, " +
        "n_frames LONG, n_bytes LONG")
      .csv(MediaFixtures.audioCsv)
    assert(got.count() == MediaFixtures.Count.toLong + MediaFixtures.Count / 4)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "decoded audio metadata must equal the sidecar exactly")
  }

  test("decodeVideo walks real ISO-BMFF box trees, both mvhd layouts") {
    // hand-build a v1 (64-bit times) container with a largesize box and
    // an unknown box in the walk path — the parser must skip by size
    def u32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(typ.getBytes("ISO-8859-1"))
      payload.foreach(bb.put)
      bb.array()
    }
    val mvhdV1 = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.put(1.toByte).put(Array[Byte](0, 0, 0))
      bb.putLong(1L).putLong(2L).putInt(90000).putLong(7654321L)
      bb.putInt(0x00010000).putShort(0x0100.toShort)
      bb.put(new Array[Byte](10 + 36 + 24))
      bb.putInt(3)
      box("mvhd", bb.array())
    }
    val trak = box("trak", new Array[Byte](84))
    val bytes = box("ftyp", "mp42".getBytes, u32(0), "isom".getBytes) ++
      box("skip", new Array[Byte](5)) ++
      box("moov", mvhdV1, trak, trak)
    assert(Multimodal.decodeVideo(bytes) == ("mp42", 90000L, 7654321L, 2L))

    // truncated/corrupt container must be rejected loudly, not mis-read
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideo(bytes.take(bytes.length - 3))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideo("not a video at all".getBytes)
    }
  }

  test("distributed MP4 container parse reproduces the generation-time sidecar") {
    val dir = MediaFixtures.ensure()
    val got = Multimodal.videoMeta(spark, dir)
    val want = spark.read.option("header", "true")
      .schema("media_id LONG, brand STRING, timescale LONG, " +
        "duration LONG, n_tracks LONG, n_bytes LONG")
      .csv(MediaFixtures.videoCsv)
    assert(got.count() == MediaFixtures.Count.toLong)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "parsed container metadata must equal the sidecar exactly")
  }

  test("raw-codec frame decode recovers exact per-frame pixel sums") {
    val dir = MediaFixtures.ensure()
    val got = Multimodal.videoFrameFeatures(spark, dir)
    val want = spark.read.option("header", "true")
      .schema("media_id LONG, frame_id LONG, width LONG, height LONG, " +
        "sum_r LONG, sum_g LONG, sum_b LONG")
      .csv(MediaFixtures.videoFramesCsv)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "decoded frame features must equal the generation-time sidecar")
  }

  test("frame sampling fans one payload into strided frame records") {
    import spark.implicits._
    val oneVideo = Seq((1L, Array.fill[Byte](1000)(7))).toDS()
    val frames = Multimodal.sampleFrames(spark, oneVideo,
      frameBytes = 100, stride = 2).collect()
    assert(frames.length == 5) // offsets 0,200,...,800
    assert(frames.map(_.frame_idx).toSeq == (0L until 5L))
    assert(frames.forall(_.n_bytes == 100))
  }

  test("decode stub is deterministic per content") {
    val (w1, h1, c1) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val (w2, h2, c2) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert((w1, h1, c1) == (w2, h2, c2))
    assert(w1 >= 16 && w1 < 256 && h1 >= 16 && h1 < 256 && c1 == 3)
  }

  test("dhash is exactly brightness-invariant and locally sensitive") {
    val w = 40; val h = 32
    var seed = 99L
    val px = Array.fill(w * h) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 24) & 0xffffff) & 0xf8f8f8).toInt
    }
    val base = Multimodal.dhashFromPixels(w, h, (x, y) => px(y * w + x))
    // uniform +4 per channel (no clamp thanks to the 0xf8 mask): every
    // block-mean comparison shifts both sides equally -> identical hash
    val bright = px.map(_ + 0x040404)
    assert(Multimodal.dhashFromPixels(w, h, (x, y) => bright(y * w + x)) == base)
    // painting one grid block white flips at most the 2 comparisons
    // that touch it — never zero once neighbors are darker noise
    val edited = px.clone()
    for (y <- (3 * h / 8) until (4 * h / 8); x <- (2 * w / 9) until (3 * w / 9))
      edited(y * w + x) = 0xffffff
    val he = Multimodal.dhashFromPixels(w, h, (x, y) => edited(y * w + x))
    val d = java.lang.Long.bitCount(base ^ he)
    assert(d >= 1 && d <= 2, s"one-block edit moved $d bits")
  }

  test("audio fingerprint is exactly gain-invariant and locally sensitive") {
    var seed = 7L
    val ch0 = Array.fill(400) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 32).toShort.toInt & ~1 // even: exact halving below
    }
    val base = Multimodal.audioFingerprintFromSamples(ch0)
    // exact half volume: every window energy halves exactly -> same fp
    assert(Multimodal.audioFingerprintFromSamples(ch0.map(_ / 2)) == base)
    // muting one of the 65 windows flips at most its 2 comparisons
    val edited = ch0.clone()
    for (f <- (31 * 400 / 65) until (32 * 400 / 65)) edited(f) = 0
    // an edit can flip ONLY the window's two comparisons (possibly
    // zero, when both already pointed the way the mute pushes them)
    val d = java.lang.Long.bitCount(
      base ^ Multimodal.audioFingerprintFromSamples(edited))
    assert(d <= 2, s"one-window mute moved $d bits")
    // a far-louder window always wins both its comparisons: forcing
    // max amplitude flips deterministically when neighbors are quieter
    val loud = ch0.clone()
    for (f <- (10 * 400 / 65) until (11 * 400 / 65)) loud(f) = 32766
    val d2 = java.lang.Long.bitCount(
      base ^ Multimodal.audioFingerprintFromSamples(loud))
    assert(d2 >= 1 && d2 <= 2, s"max-amplitude window moved $d2 bits")
  }

  test("audio near-dup pairs are exactly the planted variants") {
    val dir = MediaFixtures.ensure()
    val pairs = Multimodal.audioNearDupPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (1 to MediaFixtures.Count).filter(_ % 4 == 0)
      .map(id => (id.toLong, 9000L + id)).toSet
    assert(pairs == planted)
  }

  test("image near-dup pairs are exactly the planted variants") {
    val dir = MediaFixtures.ensure()
    val pairs = Multimodal.imageNearDupPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (1 to MediaFixtures.Count).filter(_ % 4 == 0)
      .map(id => (id.toLong, 9000L + id)).toSet
    assert(pairs == planted)
  }

  test("MJPEG frame decode reproduces the generation-time sidecar " +
      "through the real JPEG bitstream") {
    val dir = MediaFixtures.ensureMjpeg()
    val got = Multimodal.videoFrameFeatures(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    val want = scala.io.Source.fromFile(MediaFixtures.mjpegFramesCsv)
      .getLines().drop(1).map { l =>
        val f = l.split(",")
        (f(0).toLong, f(1).toLong) ->
          ((f(2).toLong, f(3).toLong, f(4).toLong, f(5).toLong, f(6).toLong))
      }.toMap
    assert(want.nonEmpty && got == want,
      s"MJPEG decode drifted from the sidecar (${got.size} vs ${want.size})")
    // sanity: every asset contributed its frames, sums are non-trivial
    assert(got.keys.map(_._1).toSet.size == MediaFixtures.MjpegCount)
    assert(got.values.forall { case (w, h, r, g, b) =>
      w > 0 && h > 0 && r > 0 && g > 0 && b > 0 })
  }

  test("GIF frame decode reproduces the sidecar; the palette round-trip " +
      "is LOSSLESS (unlike JPEG); every stream is genuinely multi-frame") {
    val dir = MediaFixtures.ensureGif()
    val got = Multimodal.gifFrameFeatures(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    val want = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(MediaFixtures.gifFramesCsv))
      .toArray.map(_.toString).drop(1).map { l =>
        val f = l.split(",")
        (f(0).toLong, f(1).toLong) ->
          ((f(2).toLong, f(3).toLong, f(4).toLong, f(5).toLong, f(6).toLong))
      }.toMap
    assert(want.nonEmpty && got == want,
      s"GIF decode drifted from the sidecar (${got.size} vs ${want.size})")
    assert(got.keys.map(_._1).toSet.size == MediaFixtures.GifCount)
    // multi-frame law: the generator writes 2 + id % 4 frames per file
    val frameCounts = got.keys.groupBy(_._1).map { case (id, ks) =>
      id -> ks.size }
    assert(frameCounts.forall { case (id, n) => n == 2 + (id % 4) },
      s"frame counts off: $frameCounts")
    // LOSSLESS round-trip: frames were drawn on an exact 8-color
    // IndexColorModel, so the decoded sums must equal the pre-encode
    // sums recomputed from the generator's LCG — JPEG could never pass
    // this, which is exactly the codec difference the gate documents
    val pal = Array(0x000000, 0xE03131, 0x2F9E44, 0x1971C2,
      0xF08C00, 0x9C36B5, 0x0CA678, 0xFFFFFF)
    got.foreach { case ((id, fid), (w, h, r, g, b)) =>
      var seed = (id * 1000L + (fid - 1)) * 0x9E3779B97F4A7C15L
      var (er, eg, eb) = (0L, 0L, 0L)
      var i = 0L
      while (i < w * h) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        val c = pal((((seed >>> 32) % 8).toInt + 8) % 8)
        er += (c >> 16) & 0xff; eg += (c >> 8) & 0xff; eb += c & 0xff
        i += 1
      }
      assert((r, g, b) == ((er, eg, eb)),
        s"GIF round-trip not lossless for ($id, $fid)")
    }
  }
}
