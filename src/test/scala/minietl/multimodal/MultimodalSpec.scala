package minietl.multimodal

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "abc"), (3L, ""))
    .toDF("doc_id", "text")

  test("fakeMedia produces the media schema with payload bytes") {
    val m = Multimodal.fakeMedia(docs, "doc_id", "text")
    assert(m.schema.fieldNames.toSeq === Seq("media_id", "content", "meta"))
    val r = m.filter(col("media_id") === 1).select("content").collect()(0)
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") === "hello world")
  }

  test("decodeStub is deterministic and bounded in [-1, 1)") {
    val f1 = Multimodal.decodeStub("hello".getBytes, 8)
    val f2 = Multimodal.decodeStub("hello".getBytes, 8)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.forall(v => v >= -1.0 && v < 1.0))
    assert(Multimodal.decodeStub(null, 4).length === 4)
  }

  test("decodeStub slot math matches the documented strided rolling hash") {
    // "abc" at dim 2: slot0 folds bytes {a=97, c=99}: (97*131+99)=12806;
    // slot1 folds {b=98}: 98. Scale: n/2^19 - 1 (exact doubles).
    val f = Multimodal.decodeStub("abc".getBytes, 2)
    assert(f(0) === 12806.0 / 524288.0 - 1.0)
    assert(f(1) === 98.0 / 524288.0 - 1.0)
    // order-sensitive within a stride
    assert(Multimodal.decodeStub("cba".getBytes, 2)(0) !== f(0))
  }

  test("extractFeatures yields declared schema, n_bytes, fixed-dim features") {
    val out = Multimodal.extractFeatures(Multimodal.fakeMedia(docs, "doc_id", "text"), 16)
    assert(out.schema.fieldNames.toSeq === Seq("media_id", "n_bytes", "features"))
    val rows = out.orderBy("media_id").collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(11L, 3L, 0L))
    assert(rows.forall(_.getSeq[Double](2).size === 16))
  }

  test("resize emits fixed-size payloads with refreshed meta") {
    val m = Multimodal.fakeMedia(docs, "doc_id", "text")
    val out = Multimodal.resize(m, targetBytes = 4).orderBy("media_id").collect()
    // non-empty payloads resample to exactly targetBytes; empty stays empty
    assert(out.take(2).forall(_.getAs[Array[Byte]]("content").length === 4))
    assert(out(2).getAs[Array[Byte]]("content").length === 0)
    assert(out.forall(_.getStruct(2).getString(0) === "fake/resized"))
    // deterministic: first byte of "hello world" survives nearest-neighbor
    assert(out(0).getAs[Array[Byte]]("content")(0) === 'h'.toByte)
    // empty payload resamples to zeros without error
    assert(Multimodal.resize(m.filter(col("media_id") === 3), 4).count() === 1)
  }

  test("decodeImage recovers exact dims, channel sums and zero entropy from a solid PNG") {
    // 7×5 solid colour (40, 120, 200): every stat is closed-form.
    val png = Multimodal.checkerPng(7, 5, (40, 120, 200), (40, 120, 200))
    val st = Multimodal.decodeImage(png).get
    assert(st.width === 7 && st.height === 5 && st.nPixels === 35L)
    assert(st.rSum === 40L * 35 && st.gSum === 120L * 35 && st.bSum === 200L * 35)
    assert(st.entropy === 0.0)
  }

  test("decodeImage computes 1-bit entropy for an equal-count two-luminance checkerboard") {
    // 4×4 checker: 8 px at lum (10+10+10)/3=10, 8 px at lum (250+250+250)/3=250.
    val png = Multimodal.checkerPng(4, 4, (10, 10, 10), (250, 250, 250))
    val st = Multimodal.decodeImage(png).get
    assert(st.nPixels === 16L)
    assert(st.rSum === 10L * 8 + 250L * 8)
    assert(math.abs(st.entropy - 1.0) < 1e-12)
  }

  test("decodeImage rejects null, empty and non-image payloads") {
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImage("definitely not a png".getBytes("UTF-8")).isEmpty)
  }

  test("extractFeatures really decodes image/* payloads and stubs the rest") {
    val png = Multimodal.checkerPng(6, 3, (100, 100, 100), (100, 100, 100))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, png, org.apache.spark.sql.Row("image/png", 6, 3, null)),
        org.apache.spark.sql.Row(2L, "hello".getBytes("UTF-8"),
          org.apache.spark.sql.Row("audio/wav", null, null, 1000L)))),
      Multimodal.mediaSchema)
    val rows = Multimodal.extractFeatures(media, 16).orderBy("media_id").collect()
    // image row: [w, h, rMean, gMean, bMean, entropy, 0...]
    val img = rows(0).getSeq[Double](2)
    assert(img.take(6) === Seq(6.0, 3.0, 100.0, 100.0, 100.0, 0.0))
    assert(img.drop(6).forall(_ === 0.0) && img.size === 16)
    // audio row: unchanged stub path
    assert(rows(1).getSeq[Double](2) === Multimodal.decodeStub("hello".getBytes("UTF-8"), 16).toSeq)
  }

  test("syntheticImages → imageStats round-trip matches the documented closed form") {
    val ids = Seq(0L, 1L, 7L, 123L, 9999L)
    val out = Multimodal.imageStats(
        Multimodal.syntheticImages(ids.toDF("doc_id"), "doc_id"))
      .orderBy("media_id").collect()
    ids.sorted.zip(out).foreach { case (id, r) =>
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      val n1 = ((w + 1) / 2) * ((h + 1) / 2) + (w / 2) * (h / 2)
      val n2 = w * h - n1
      val (r1, r2) = ((id * 37 % 256), (id * 101 + 7) % 256)
      assert(r.getInt(1) === w && r.getInt(2) === h)
      assert(r.getLong(3) === r1 * n1 + r2 * n2)
      assert(r.getLong(6) === w.toLong * h)
    }
  }

  test("decodeAudio recovers exact frames/rate/sum/sumSq/peak from a generated WAV") {
    val samples = Array[Short](100, -200, 300, -400, 500)
    val wav = Multimodal.pcm16Wav(samples, 8000)
    val st = Multimodal.decodeAudio(wav).get
    assert(st.frames === 5L && st.channels === 1 && st.sampleRateHz === 8000L)
    assert(st.bitsPerSample === 16)
    assert(st.sampleSum === (100 - 200 + 300 - 400 + 500).toLong)
    assert(st.sumSq === samples.map(s => s.toLong * s).sum)
    assert(st.peakAbs === 500L)
  }

  test("decodeAudio handles full-range 16-bit extremes exactly") {
    val samples = Array[Short](Short.MaxValue, Short.MinValue, 0)
    val st = Multimodal.decodeAudio(Multimodal.pcm16Wav(samples, 44100)).get
    assert(st.sampleSum === 32767L - 32768L)
    assert(st.peakAbs === 32768L)
    assert(st.sumSq === 32767L * 32767 + 32768L * 32768)
  }

  test("decodeAudio rejects null, empty and non-audio payloads") {
    assert(Multimodal.decodeAudio(null).isEmpty)
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeAudio("definitely not a wav".getBytes("UTF-8")).isEmpty)
    // a PNG is parseable bytes but not an audio container
    assert(Multimodal.decodeAudio(Multimodal.checkerPng(2, 2, (0, 0, 0), (1, 1, 1))).isEmpty)
  }

  test("extractFeatures really decodes audio/* payloads") {
    val wav = Multimodal.pcm16Wav(Array[Short](10, -10, 10, -10), 16000)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, wav,
          org.apache.spark.sql.Row("audio/wav", null, null, 0L)))),
      Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(media, 16).collect()(0).getSeq[Double](2)
    // [frames, channels, rate, mean, meanSquare, peak, 0...]
    assert(feats.take(6) === Seq(4.0, 1.0, 16000.0, 0.0, 100.0, 10.0))
    assert(feats.drop(6).forall(_ === 0.0) && feats.size === 16)
  }

  test("syntheticWavs → audioStats round-trip matches the documented closed form") {
    val ids = Seq(0L, 1L, 7L, 123L, 9999L)
    val out = Multimodal.audioStats(
        Multimodal.syntheticWavs(ids.toDF("doc_id"), "doc_id"))
      .orderBy("media_id").collect()
    ids.sorted.zip(out).foreach { case (id, r) =>
      val n = (300 + id % 101).toInt
      val a1 = (131 * id) % 20001 - 10000
      val a2 = (257 * id + 19) % 20001 - 10000
      val n1 = (n + 1) / 2; val n2 = n / 2
      assert(r.getLong(1) === n.toLong, s"frames for id $id")
      assert(r.getLong(3) === 8000L + (id % 3) * 4000, s"rate for id $id")
      assert(r.getLong(5) === a1 * n1 + a2 * n2, s"sum for id $id")
      assert(r.getLong(6) === a1 * a1 * n1 + a2 * a2 * n2, s"sumSq for id $id")
      assert(r.getLong(7) === math.max(math.abs(a1), math.abs(a2)), s"peak for id $id")
    }
  }

  test("parseMp4Meta recovers every field from a real minimal container") {
    val bytes = Multimodal.mp4Container("mp42", 600L, 3000L,
      Seq(("vide", "avc1"), ("soun", "mp4a")), 640, 360)
    val m = Multimodal.parseMp4Meta(bytes).get
    assert(m.majorBrand === "mp42")
    assert(m.timescale === 600L && m.durationMs === 5000L) // 3000/600 s
    assert(m.nTracks === 2)
    assert(m.trackTypes === Seq("vide", "soun"))
    assert(m.codecs === Seq("avc1", "mp4a"))
    assert(m.width === Some(640) && m.height === Some(360))
  }

  test("parseMp4Meta rejects non-MP4 and corrupt payloads instead of guessing") {
    assert(Multimodal.parseMp4Meta(null).isEmpty)
    assert(Multimodal.parseMp4Meta(Array[Byte]()).isEmpty)
    assert(Multimodal.parseMp4Meta("not a container at all!!".getBytes).isEmpty)
    // PNG bytes: valid media, wrong container
    assert(Multimodal.parseMp4Meta(
      Multimodal.checkerPng(4, 4, (0, 0, 0), (255, 255, 255))).isEmpty)
    val good = Multimodal.mp4Container("isom", 1000L, 1000L, Seq(("vide", "avc1")), 16, 16)
    // truncate mid-moov: structural corruption → None, not a partial parse
    assert(Multimodal.parseMp4Meta(good.take(good.length - 5)).isEmpty)
    // box size smaller than its header → rejected
    val bad = good.clone()
    bad(0) = 0; bad(1) = 0; bad(2) = 0; bad(3) = 4
    assert(Multimodal.parseMp4Meta(bad).isEmpty)
  }

  test("parseMp4Meta never throws: random bytes, bit-flips, truncations") {
    val rnd = new scala.util.Random(7)
    // pure noise
    (1 to 500).foreach { _ =>
      Multimodal.parseMp4Meta(Array.fill(rnd.nextInt(256))(rnd.nextInt(256).toByte))
    }
    val good = Multimodal.mp4Container("isom", 1000L, 1000L,
      Seq(("vide", "avc1"), ("soun", "mp4a")), 64, 48)
    // single-bit corruption anywhere in a valid container
    (1 to 500).foreach { _ =>
      val b = good.clone()
      val p = rnd.nextInt(b.length)
      b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte
      Multimodal.parseMp4Meta(b) // Option either way, never an exception
    }
    // every truncation prefix
    (0 until good.length).foreach { n =>
      Multimodal.parseMp4Meta(java.util.Arrays.copyOf(good, n))
    }
    // the untouched container still parses (guards the fixture itself)
    assert(Multimodal.parseMp4Meta(good).exists(_.nTracks === 2))
  }

  test("syntheticMp4s → videoMeta round-trip matches the documented closed form") {
    val ids = Seq(0L, 1L, 2L, 3L, 7L, 1000L)
    val out = Multimodal.videoMeta(
        Multimodal.syntheticMp4s(ids.toDF("doc_id"), "doc_id"))
      .orderBy("media_id").collect()
    val brands = Array("isom", "mp42", "dash")
    val vcodecs = Array("avc1", "hvc1", "vp09", "av01")
    ids.sorted.zip(out).foreach { case (id, r) =>
      assert(r.getString(1) === brands((id % 3).toInt), s"brand for id $id")
      assert(r.getLong(3) === 5000L + (id % 997) * 10, s"duration for id $id")
      assert(r.getInt(4) === (if (id % 2 == 0) 2 else 1), s"n_tracks for id $id")
      assert(r.getString(5) === (if (id % 2 == 0) "vide,soun" else "vide"))
      assert(r.getString(6) ===
        (vcodecs((id % 4).toInt) + (if (id % 2 == 0) ",mp4a" else "")))
      assert(r.getInt(7) === 16 * (2 + id % 8).toInt, s"width for id $id")
      assert(r.getInt(8) === 16 * (1 + id % 6).toInt, s"height for id $id")
    }
  }

  test("syntheticAvis → videoFrames round-trip matches the closed form (real BI_RGB decode)") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 59L, 1000L)
    val out = Multimodal.videoFrames(
        Multimodal.syntheticAvis(ids.toDF("doc_id"), "doc_id"))
      .orderBy("media_id", "frame_idx").collect()
    def px(id: Long, f: Long, y: Long, x: Long, c: Long): Long =
      (id * 7 + f * 131 + y * 17 + x * 3 + c * 29) % 251
    val want = for {
      id <- ids.sorted
      w = 4 * (2 + id % 4); h = 2 + id % 5
      f <- 0L until (2 + id % 3)
    } yield {
      val vs = for (y <- 0L until h; x <- 0L until w; c <- 0L until 3)
        yield px(id, f, y, x, c)
      (id, f, w, h, vs.sum, vs.min, vs.max,
        (0L until 3).map(px(id, f, 0, 0, _)).sum)
    }
    assert(out.length === want.size)
    out.zip(want).foreach { case (r, (id, f, w, h, sum, mn, mx, tl)) =>
      assert((r.getLong(0), r.getLong(1)) === ((id, f)))
      assert((r.getLong(2), r.getLong(3)) === ((w, h)), s"dims id=$id f=$f")
      assert(r.getLong(4) === sum, s"byte_sum id=$id f=$f")
      assert((r.getLong(5), r.getLong(6)) === ((mn, mx)), s"min/max id=$id f=$f")
      assert(r.getLong(7) === tl, s"top_left_sum id=$id f=$f (bottom-up layout)")
    }
  }

  test("BI_RGB stride padding: a non-multiple-of-4 width decodes excluding pad bytes") {
    // w=3 → row bytes 9, stride 12: three 0xFF pad bytes per row must NOT
    // reach the stats
    val w = 3; val h = 2; val stride = 12
    val frame = Array.fill((stride * h))(0xff.toByte)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      frame(y * stride + x * 3 + c) = (y * 10 + x * 3 + c).toByte
    val avi = Multimodal.aviContainer(w, h, 40000L, None, Seq(frame))
    val parsed = Multimodal.parseAvi(avi).get
    assert(parsed.width === w && parsed.height === h)
    assert(parsed.compression === "BI_RGB" && parsed.frames.size === 1)
    val st = Multimodal.decodeAviFrame(parsed, parsed.frames.head).get
    val vals = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      yield y * 10 + x * 3 + c
    assert(st.byteSum === vals.sum.toLong, "pad bytes leaked into byte_sum")
    assert(st.byteMax === vals.max, "a 0xFF pad byte leaked into byte_max")
    // top-left = FILE row h-1 (bottom-up): y_top=0 is stored last
    assert(st.topLeftSum === (0 + 1 + 2) + 3 * 10)
  }

  test("MJPEG AVI frames decode through the JDK JPEG codec") {
    // two solid-color frames; JPEG is lossy but near-exact on solid color
    def jpegFrame(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    val (w, h) = (16, 8)
    val avi = Multimodal.aviContainer(w, h, 40000L, Some("MJPG"),
      Seq(jpegFrame(0x808080, w, h), jpegFrame(0x202020, w, h)))
    val parsed = Multimodal.parseAvi(avi).get
    assert(parsed.compression === "MJPG" && parsed.frames.size === 2)
    val stats = parsed.frames.map(Multimodal.decodeAviFrame(parsed, _).get)
    assert(stats.forall(s => s.width === w && s.height === h))
    val means = stats.map(s => s.byteSum.toDouble / (w * h * 3))
    assert(math.abs(means(0) - 0x80) <= 3.0, s"frame 0 mean ${means(0)}")
    assert(math.abs(means(1) - 0x20) <= 3.0, s"frame 1 mean ${means(1)}")
  }

  test("parseAvi never throws: random bytes, bit-flips, truncations") {
    val rnd = new scala.util.Random(11)
    (1 to 500).foreach { _ =>
      Multimodal.parseAvi(Array.fill(rnd.nextInt(256))(rnd.nextInt(256).toByte))
    }
    val good = Multimodal.aviContainer(8, 2, 40000L, None,
      Seq(new Array[Byte](48), new Array[Byte](48)))
    (1 to 500).foreach { _ =>
      val b = good.clone()
      val p = rnd.nextInt(b.length)
      b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte
      Multimodal.parseAvi(b) // Option either way, never an exception
    }
    (0 until good.length).foreach { n =>
      Multimodal.parseAvi(java.util.Arrays.copyOf(good, n))
    }
    assert(Multimodal.parseAvi(good).exists(_.frames.size === 2))
  }

  test("mjpegMp4 → parseMp4Samples round-trip: codec + exact sample bytes " +
    "through the stsc/stsz/stco walk (VERDICT r15 Next #4)") {
    // 1..5 frames covers every stsc shape: single-entry (nf <= 2) and the
    // two-entry run-length map (first chunk 2 samples, later chunks 1)
    for (nf <- 1 to 5) {
      val frames = (0 until nf).map(f => Multimodal.jpegTemplates(f % 6)._1)
      val mp4 = Multimodal.mjpegMp4(32, 24, 1000L, 40L * nf, frames)
      val parsed = Multimodal.parseMp4Samples(mp4)
      assert(parsed.isDefined, s"nf=$nf")
      val (codec, samples) = parsed.get
      assert(codec === "jpeg")
      assert(samples.size === nf, s"nf=$nf")
      samples.zip(frames).zipWithIndex.foreach { case ((got, want), i) =>
        assert(java.util.Arrays.equals(got, want), s"nf=$nf sample $i")
      }
      // the metadata walk still reads the same container
      val meta = Multimodal.parseMp4Meta(mp4).get
      assert(meta.codecs === Seq("jpeg") && meta.trackTypes === Seq("vide"))
      assert(meta.width === Some(32) && meta.height === Some(24))
    }
  }

  test("jpeg templates decode uniform: solid-gray survives the lossy codec " +
    "as a single value near the encoded gray") {
    val encoded = Seq(16, 64, 112, 160, 208, 240)
    Multimodal.jpegTemplates.zip(encoded).foreach { case ((_, st), v) =>
      assert(st.byteMin === st.byteMax,
        s"solid JPEG must decode uniform (gray $v): $st")
      assert(math.abs(st.byteMin - v) <= 4,
        s"decoded gray ${st.byteMin} too far from encoded $v")
      assert(st.byteSum === st.width.toLong * st.height * 3 * st.byteMin)
      assert(st.topLeftSum === 3 * st.byteMin)
    }
  }

  test("syntheticMjpegMp4s → mp4Frames matches the generator layout " +
    "(template stats per (clip, frame) slot)") {
    val ids = Seq(0L, 1L, 2L, 3L, 5L, 11L).toDF("doc_id")
    val out = Multimodal.mp4Frames(Multimodal.syntheticMjpegMp4s(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    for (id <- Seq(0L, 1L, 2L, 3L, 5L, 11L); f <- 0 until (1 + id % 4).toInt) {
      val st = Multimodal.jpegTemplates(((id + f) % 6).toInt)._2
      val r = out((id, f.toLong))
      assert(r.getLong(2) === st.width && r.getLong(3) === st.height, s"($id,$f)")
      assert(r.getLong(4) === st.byteSum && r.getLong(7) === st.topLeftSum)
    }
    assert(out.size === Seq(0L, 1L, 2L, 3L, 5L, 11L).map(1 + _ % 4).sum)
  }

  test("parseMp4Samples never throws or hangs: random bytes, bit-flips, " +
    "truncations of a real MJPEG-MP4") {
    val mp4 = Multimodal.mjpegMp4(32, 24, 1000L, 120L,
      (0 until 3).map(f => Multimodal.jpegTemplates(f)._1))
    assert(Multimodal.parseMp4Samples(null).isEmpty)
    assert(Multimodal.parseMp4Samples(Array[Byte]()).isEmpty)
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(400))(rnd.nextInt().toByte)
      Multimodal.parseMp4Samples(junk)
    }
    (0 until mp4.length).foreach { n =>
      Multimodal.parseMp4Samples(java.util.Arrays.copyOf(mp4, n))
      val flipped = mp4.clone(); flipped(n) = (flipped(n) ^ 0x5a).toByte
      // a corrupted payload may still parse (flip in a JPEG body) — it must
      // only never throw, hang, or mis-slice out of bounds
      Multimodal.parseMp4Samples(flipped).foreach { case (_, samples) =>
        samples.foreach(s => Multimodal.frameStatsOfJpeg(s))
      }
    }
  }

  test("parseMp4Samples rejects an unsigned-overflow stsc first_chunk " +
    "instead of truncating it negative and indexing out of bounds") {
    // two frames → a SINGLE stsc run: the run-monotonicity check is
    // vacuous, so the overflow value genuinely reaches the chunk walk
    val mp4 = Multimodal.mjpegMp4(32, 24, 1000L, 80L,
      (0 until 2).map(f => Multimodal.jpegTemplates(f)._1))
    assert(Multimodal.parseMp4Samples(mp4).isDefined) // sane baseline
    // patch the first stsc run's first_chunk to 0x80000002 — a value in
    // (2^31, 2^32) that a bare .toInt would truncate to a NEGATIVE chunk
    // index passing `chunk - 1 < nChunks`; the walker must return None,
    // never throw (the 0x5a bit-flip fuzz can't reach this range)
    val idx = mp4.indexOfSlice("stsc".getBytes("US-ASCII"))
    assert(idx > 0)
    val payload = idx + 4 // box payload: version/flags(4) count(4) runs...
    val patched = mp4.clone()
    patched(payload + 8) = 0x80.toByte
    patched(payload + 9) = 0x00
    patched(payload + 10) = 0x00
    patched(payload + 11) = 0x02
    assert(Multimodal.parseMp4Samples(patched).isEmpty)
    // and a merely-too-large (but positive-Int) first_chunk is also rejected
    val patched2 = mp4.clone()
    patched2(payload + 8) = 0x00
    patched2(payload + 9) = 0x00
    patched2(payload + 10) = 0x7f
    patched2(payload + 11) = 0x00
    assert(Multimodal.parseMp4Samples(patched2).isEmpty)
  }

  test("sampleFrames explodes fixed slices and drops empty payloads") {
    val m = Multimodal.fakeMedia(Seq((1L, "abcdefgh")).toDF("doc_id", "text"), "doc_id", "text")
    val frames = Multimodal.sampleFrames(m, frames = 4).orderBy("frame_idx").collect()
    assert(frames.length === 4)
    val joined = frames.map(r => new String(r.getAs[Array[Byte]]("frame_bytes"), "UTF-8")).mkString
    assert(joined === "abcdefgh")
  }
}
