package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: envelope schema, frame slicing, and the
  * partition-wise batched extraction shape.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcdefghij", "en", "s0", 10L),
    (1L, "klmnopqrstuvwx", "en", "s1", 14L),
    (2L, "yz", "en", "s2", 2L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("synthetic media envelope has the contract schema") {
    val m = Multimodal.syntheticMedia(docs)
    assert(m.schema.fieldNames.toSeq == Seq("id", "media", "meta"))
    assert(m.schema("media").dataType.typeName == "binary")
    val meta = m.select("meta.format", "meta.width", "meta.height", "meta.durationMs")
      .as[(String, Int, Int, Long)].collect().toSet
    assert(meta == Set(("img", 64, 64, 100L), ("aud", 65, 65, 140L), ("vid", 66, 66, 20L)))
  }

  test("frame sampling slices the payload without a UDF") {
    val frames = Multimodal
      .sampleFrames(Multimodal.syntheticMedia(docs), 4)
      .select($"id", $"frame_idx", $"frame".cast("string"))
      .as[(Long, Int, String)]
      .collect()
      .toSet
    // doc 0: len 10, flen 2 → ab cd ef gh (ij dropped)
    assert(frames.filter(_._1 == 0L).map(f => f._2 -> f._3) ==
      Set(0 -> "ab", 1 -> "cd", 2 -> "ef", 3 -> "gh"))
    // doc 2: len 2, flen 0 → all frames empty → filtered out
    assert(!frames.exists(_._1 == 2L))
  }

  test("resize emits target-dim payload AND propagates the new metadata") {
    val recs = Multimodal.asRecords(Multimodal.syntheticMedia(docs).repartition(2))
    val resized = Multimodal.resize(recs, dstW = 8, dstH = 4, batchSize = 2).collect()
    assert(resized.length == 3)
    assert(resized.forall(_.media.length == 8 * 4))
    // metadata must reflect the TARGET dims, not the source
    assert(resized.forall(r => r.meta.width == 8 && r.meta.height == 4))
    // format/duration untouched
    val src = recs.collect().map(r => r.id -> r.meta).toMap
    assert(resized.forall(r => r.meta.format == src(r.id).format &&
      r.meta.durationMs == src(r.id).durationMs))
    // deterministic kernel
    val again = Multimodal.resize(recs, dstW = 8, dstH = 4, batchSize = 2).collect()
    assert(resized.map(r => r.id -> r.media.toSeq).toSet ==
      again.map(r => r.id -> r.media.toSeq).toSet)
  }

  // ---- real JDK image kernels ---------------------------------------------

  test("grayPng round-trips raster samples exactly through the real codec") {
    val png = Multimodal.grayPng(5, 4, (x, y) => (x * 7 + y * 16) % 256)
    // a real PNG, not a stand-in: magic bytes present
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val img = Multimodal.decodeImage(png).get
    assert(img.getWidth == 5 && img.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 5)
      assert(img.getRaster.getSample(x, y, 0) == (x * 7 + y * 16) % 256)
  }

  test("rgbPng round-trips packed sRGB exactly") {
    val pix = (x: Int, y: Int) => (x * 40 << 16) | (y * 50 << 8) | (x + y)
    val png = Multimodal.rgbPng(3, 2, pix)
    val img = Multimodal.decodeImage(png).get
    for (y <- 0 until 2; x <- 0 until 3)
      assert((img.getRGB(x, y) & 0xffffff) == (pix(x, y) & 0xffffff))
  }

  test("decodeImage returns None for non-image payloads") {
    assert(Multimodal.decodeImage("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("resize takes the REAL bilinear path for PNG payloads") {
    // 2x2 gray [10 20; 30 40] -> 3x3 corner-aligned bilinear is exact
    val vals = Map((0, 0) -> 10, (1, 0) -> 20, (0, 1) -> 30, (1, 1) -> 40)
    val png = Multimodal.grayPng(2, 2, (x, y) => vals((x, y)))
    val recs = Seq(Multimodal.MediaRecord(7L, png, Multimodal.MediaMeta("img", 2, 2, 0L))).toDS()
    val out = Multimodal.resize(recs, dstW = 3, dstH = 3).collect().head
    assert(out.meta.width == 3 && out.meta.height == 3)
    val img = Multimodal.decodeImage(out.media).get // payload is still a real PNG
    assert(img.getWidth == 3 && img.getHeight == 3)
    val expected = Array(10, 15, 20, 20, 25, 30, 30, 35, 40)
    val got = for (y <- 0 until 3; x <- 0 until 3) yield img.getRaster.getSample(x, y, 0)
    assert(got.toSeq == expected.toSeq)
  }

  test("resize interpolates RGB payloads per channel") {
    val pix = (x: Int, y: Int) => ((x * 100 + 10) << 16) | ((y * 100 + 20) << 8) | 40
    val png = Multimodal.rgbPng(2, 2, pix)
    val recs = Seq(Multimodal.MediaRecord(8L, png, Multimodal.MediaMeta("img", 2, 2, 0L))).toDS()
    val out = Multimodal.resize(recs, dstW = 3, dstH = 3).collect().head
    val img = Multimodal.decodeImage(out.media).get
    // center pixel: r = mean(10,110,10,110) = 60, g = mean(20,20,120,120) = 70, b = 40
    assert((img.getRGB(1, 1) & 0xffffff) == ((60 << 16) | (70 << 8) | 40))
    // corners carry straight through
    assert((img.getRGB(0, 0) & 0xffffff) == (pix(0, 0) & 0xffffff))
    assert((img.getRGB(2, 2) & 0xffffff) == (pix(1, 1) & 0xffffff))
  }

  test("extractFeatures pools REAL decoded luminance for image payloads") {
    val samples = Array(0, 100, 200, 250)
    val png = Multimodal.grayPng(4, 1, (x, _) => samples(x))
    val recs = Seq(Multimodal.MediaRecord(9L, png, Multimodal.MediaMeta("img", 4, 1, 0L))).toDS()
    val f = Multimodal.extractFeatures(recs, dim = 2).collect().head.features
    assert(f.toSeq == Seq((50.0 / 255.0).toFloat, (225.0 / 255.0).toFloat))
    // the stub would NOT produce these pooled means
    assert(Multimodal.decodeFeaturesStub(png, 2).toSeq != f.toSeq)
  }

  test("decodeStats matches the closed-form oracle on synthetic PNG media") {
    val stats = Multimodal
      .decodeStats(Multimodal.syntheticPngMedia(docs.repartition(2)))
      .collect()
      .map(s => s.id -> s)
      .toMap
    assert(stats.keySet == Set(0L, 1L, 2L))
    for ((id, s) <- stats) {
      val w = (8 + id % 9).toInt
      val h = (8 + id % 7).toInt
      assert(s.width == w && s.height == h)
      val expectedSum = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + y * 16 + x * 7) % 256).sum
      assert(s.pixelSum == expectedSum)
    }
  }

  test("pcmWav round-trips samples exactly through the real RIFF/PCM codec") {
    val samples = Array(0, 1000, -1000, 32767, -32768, 7)
    val wav = Multimodal.pcmWav(samples.length, 8000, samples(_))
    // a real WAV container: RIFF....WAVE magic
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, n, decoded) = Multimodal.decodeAudio(wav).get
    assert(rate == 8000 && n == samples.length)
    assert(decoded.toSeq == samples.toSeq)
  }

  test("hand-rolled WAV fast path ≡ the JDK codec, both directions") {
    import java.io.ByteArrayInputStream
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val samples = Array(12, -7, 32767, -32768, 0, 255)
    // direction 1: the hand-built container must be a VALID WAV to the
    // JDK's own reader — identical rate, count, and samples
    val ours = Multimodal.pcmWav(samples.length, 8000, samples(_))
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(ours))
    assert(ais.getFormat.getSampleRate.toInt == 8000 &&
      ais.getFormat.getChannels == 1 && ais.getFormat.getSampleSizeInBits == 16)
    val raw = ais.readAllBytes()
    val jdkSamples = (0 until raw.length / 2).map(k => (raw(2 * k + 1) << 8) | (raw(2 * k) & 0xff))
    assert(jdkSamples == samples.toSeq)
    // direction 2: a WAV written BY the JDK parses through the
    // hand-rolled fast path with identical results
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, k) =>
      pcm(2 * k) = (s & 0xff).toByte; pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val (r2, n2, d2) = Multimodal.parseWavPcm(bos.toByteArray).get
    assert(r2 == 8000 && n2 == samples.length && d2.toSeq == samples.toSeq)
    // the fast path rejects what it cannot prove canonical (truncated,
    // non-RIFF) instead of guessing
    assert(Multimodal.parseWavPcm(ours.take(30)).isEmpty)
    assert(Multimodal.parseWavPcm("RIFFxxxxJUNK".getBytes("US-ASCII")).isEmpty)
    // hostile chunk size near Int.MaxValue: the payload+size bound must
    // be computed in Long — an Int sum wraps negative, passes the check,
    // and the data loop would throw or allocate ~4 GB instead of None
    val hostile = ours.clone()
    hostile(40) = 0xf0.toByte; hostile(41) = 0xff.toByte
    hostile(42) = 0xff.toByte; hostile(43) = 0x7f.toByte // data size 0x7ffffff0
    assert(Multimodal.parseWavPcm(hostile).isEmpty,
      "overflowing declared chunk size must reject, not crash")
  }

  test("decodeAudio returns None for non-audio payloads (including images)") {
    assert(Multimodal.decodeAudio("definitely not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(Multimodal.grayPng(4, 4, (_, _) => 1)).isEmpty)
    // and the image decoder rejects WAVs — the modality dispatch is clean
    assert(Multimodal.decodeImage(Multimodal.pcmWav(8, 8000, _ => 0)).isEmpty)
  }

  test("audioStats matches the closed-form oracle on synthetic WAV media") {
    val stats = Multimodal
      .audioStats(Multimodal.syntheticWavMedia(docs.repartition(2)))
      .collect()
      .map(s => s.id -> s)
      .toMap
    assert(stats.keySet == Set(0L, 1L, 2L))
    for ((id, s) <- stats) {
      val n = (64 + id % 64).toInt
      assert(s.nSamples == n && s.sampleRate == 8000)
      val expected = (0 until n).map(k => (id * 37 + k * 11) % 2003 - 1001).sum
      assert(s.sampleSum == expected)
    }
  }

  test("audioFrameFeatures: hand-computed energy/zero-crossings, in-frame crossings only") {
    val spark0 = spark
    import spark0.implicits._
    // samples [1,-1,2,-2, 3,3,-3,0]: frameSize 4 ⇒
    //  f0 = [1,-1,2,-2]: energy 1+1+4+4=10, crossings at k=1,2,3 ⇒ 3
    //  f1 = [3,3,-3,0]:  energy 9+9+9+0=27, crossings: 3→-3 flips, -3→0
    //  flips back (0 counts as non-negative) ⇒ 2; and the f0→f1 boundary
    //  (-2 → 3) must NOT count — crossings are per-frame
    val samples = Array(1, -1, 2, -2, 3, 3, -3, 0)
    val wav = Multimodal.pcmWav(samples.length, 8000, samples(_))
    val media = Seq(Multimodal.MediaRecord(7L, wav, Multimodal.MediaMeta("wav", 0, 0, 1L))).toDS()
    val out = Multimodal.audioFrameFeatures(media, frameSize = 4)
      .collect().sortBy(_.frameIdx)
      .map(f => (f.frameIdx, f.nSamples, f.energy, f.zeroCrossings)).toSeq
    assert(out == Seq((0, 4, 10L, 3), (1, 4, 27L, 2)))
    // a 1-sample tail frame has zero crossings by definition
    val wav2 = Multimodal.pcmWav(5, 8000, k => if (k % 2 == 0) 5 else -5)
    val media2 = Seq(Multimodal.MediaRecord(8L, wav2, Multimodal.MediaMeta("wav", 0, 0, 1L))).toDS()
    val tail = Multimodal.audioFrameFeatures(media2, frameSize = 4)
      .collect().sortBy(_.frameIdx).toSeq
    assert(tail.map(f => (f.frameIdx, f.nSamples, f.zeroCrossings)) == Seq((0, 4, 3), (1, 1, 0)))
    // non-audio payloads are dropped, never crash the kernel
    val junk = Seq(Multimodal.MediaRecord(9L, Array[Byte](1, 2, 3), Multimodal.MediaMeta("x", 0, 0, 0L))).toDS()
    assert(Multimodal.audioFrameFeatures(junk).collect().isEmpty)
  }

  test("extractFeatures runs batched per partition with stable output") {
    val recs = Multimodal.asRecords(Multimodal.syntheticMedia(docs).repartition(2))
    val feats = Multimodal.extractFeatures(recs, dim = 8, batchSize = 2).collect()
    assert(feats.length == 3)
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(_.features.forall(f => f >= 0.0f && f < 1.0f)))
    // deterministic: same input bytes → same features
    val again = Multimodal.extractFeatures(recs, dim = 8, batchSize = 2).collect()
    assert(feats.map(_.features.toSeq).toSet == again.map(_.features.toSeq).toSet)
  }

  test("mp4Container round-trips dims, timescale-scaled duration through the box walker") {
    // non-trivial timescale: 600 units/s, 1800 units → exactly 3000 ms
    val m = Multimodal.parseVideoMeta(7L, Multimodal.mp4Container(1920, 1080, 600, 1800L))
    assert(m.contains(Multimodal.VideoMeta(7L, "mp4", 1920, 1080, 3000L, 0L)))
    // truncating division is the contract (1000 units at 600/s = 1666 ms)
    val t = Multimodal.parseVideoMeta(1L, Multimodal.mp4Container(640, 480, 600, 1000L))
    assert(t.get.durationMs == 1666L)
  }

  test("mp4 v1 (64-bit time) headers parse identically to v0") {
    // muxers emit v1 mvhd/tkhd when durations/timestamps exceed 32 bits —
    // an ingest gate that only reads v0 silently drops real videos
    val v1 = Multimodal.parseVideoMeta(3L,
      Multimodal.mp4Container(3840, 2160, 600, 1800L, version = 1))
    assert(v1.contains(Multimodal.VideoMeta(3L, "mp4", 3840, 2160, 3000L, 0L)))
    // a duration that cannot fit 32 bits at all
    val long64 = Multimodal.parseVideoMeta(4L,
      Multimodal.mp4Container(640, 480, 1000, 5_000_000_000L, version = 1))
    assert(long64.get.durationMs == 5_000_000_000L)
  }

  test("aviContainer round-trips dims, frame count, µs-per-frame duration") {
    val m = Multimodal.parseVideoMeta(9L, Multimodal.aviContainer(1280, 720, 33333, 120L))
    // 33333 µs × 120 frames = 3999960 µs → 3999 ms (Long division)
    assert(m.contains(Multimodal.VideoMeta(9L, "avi", 1280, 720, 3999L, 120L)))
  }

  test("parseVideoMeta rejects non-video and truncated payloads, never throws") {
    assert(Multimodal.parseVideoMeta(1L, null).isEmpty)
    assert(Multimodal.parseVideoMeta(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseVideoMeta(1L, "not a container at all!!".getBytes).isEmpty)
    // a real image payload is not a video
    val png = Multimodal.grayPng(4, 4, (_, _) => 1)
    assert(Multimodal.parseVideoMeta(1L, png).isEmpty)
    // truncated mid-box: declared sizes run past the buffer → None, no throw
    val mp4 = Multimodal.mp4Container(640, 480, 1000, 1000L)
    assert(Multimodal.parseVideoMeta(1L, mp4.take(40)).isEmpty)
    val avi = Multimodal.aviContainer(640, 480, 33333, 24L)
    assert(Multimodal.parseVideoMeta(1L, avi.take(30)).isEmpty)
  }

  test("videoMeta kernel matches the synthetic closed form (mixed MP4/AVI)") {
    val metas = Multimodal
      .videoMeta(Multimodal.syntheticVideoMedia(docs), batchSize = 2)
      .collect()
      .map(m => m.id -> m)
      .toMap
    assert(metas.size == 3)
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val m = metas(id)
      assert(m.width == (160 + id % 320).toInt && m.height == (120 + id % 240).toInt)
      if (id % 2 == 0) {
        assert(m.container == "mp4" && m.durationMs == (id % 9000) + 1000 && m.nFrames == 0L)
      } else {
        val fr = (id % 240) + 24
        assert(m.container == "avi" && m.nFrames == fr &&
          m.durationMs == 33333L * fr / 1000L)
      }
    }
  }

  // ---- MJPEG-in-AVI pixel decode ------------------------------------------

  test("mjpegFrames walks the movi list and recovers every JPEG payload") {
    val f0 = Multimodal.grayJpeg(16, 16, 40)
    val f1 = Multimodal.grayJpeg(16, 16, 120)
    val avi = Multimodal.mjpegAvi(16, 16, 33333, Seq(f0, f1))
    val frames = Multimodal.mjpegFrames(avi)
    assert(frames.length == 2)
    assert(frames(0).toSeq == f0.toSeq && frames(1).toSeq == f1.toSeq)
  }

  test("mjpegFrames honors RIFF word alignment for odd-length frames") {
    // an odd-size chunk followed by another chunk: a walker that forgets
    // the RIFF pad byte misreads the second chunk's fourcc and loses it
    // (mjpegFrames doesn't decode, so raw non-JPEG payloads are fine here)
    val odd = Array[Byte](1, 2, 3) // 3 bytes → 1 pad byte
    val even = Array[Byte](9, 8, 7, 6)
    val avi = Multimodal.mjpegAvi(16, 16, 33333, Seq(odd, even))
    val frames = Multimodal.mjpegFrames(avi)
    assert(frames.length == 2)
    assert(frames(0).toSeq == odd.toSeq && frames(1).toSeq == even.toSeq)
  }

  test("mjpegFrames accepts 00db (uncompressed-flagged) chunks too") {
    val f = Multimodal.grayJpeg(16, 16, 88)
    val avi = Multimodal.mjpegAvi(16, 16, 33333, Seq(f))
    // rewrite the frame fourcc 00dc → 00db in place
    val idx = avi.indexOfSlice("00dc".getBytes("US-ASCII"))
    assert(idx > 0)
    avi(idx + 3) = 'b'.toByte
    val frames = Multimodal.mjpegFrames(avi)
    assert(frames.length == 1 && frames(0).toSeq == f.toSeq)
  }

  test("mjpegFrames returns empty on hostile input, never throws") {
    assert(Multimodal.mjpegFrames(null).isEmpty)
    assert(Multimodal.mjpegFrames(Array[Byte]()).isEmpty)
    assert(Multimodal.mjpegFrames("RIFF but not really an avi".getBytes).isEmpty)
    // a valid non-AVI container
    assert(Multimodal.mjpegFrames(Multimodal.mp4Container(640, 480, 1000, 1000L)).isEmpty)
    // truncations at every prefix of a real MJPEG AVI must not throw
    val avi = Multimodal.mjpegAvi(16, 16, 33333,
      Seq(Multimodal.grayJpeg(16, 16, 40), Multimodal.grayJpeg(16, 16, 56)))
    (0 until avi.length).foreach { n =>
      Multimodal.mjpegFrames(avi.take(n)) // must not throw
    }
    // chopping into the last frame's payload (3 bytes clears any pad byte)
    // drops the incomplete frame but keeps the intact one
    val full = Multimodal.mjpegFrames(avi)
    assert(full.length == 2)
    assert(Multimodal.mjpegFrames(avi.dropRight(3)).length == 1)
  }

  test("decodeVideoFrames round-trips the synthetic MJPEG closed form") {
    val out = Multimodal
      .decodeVideoFrames(Multimodal.syntheticMjpegMedia(docs), batchSize = 2)
      .collect()
      .map(f => (f.id, f.frameIdx) -> f)
      .toMap
    // Σ(2 + id%3) over ids 0,1,2 = 2 + 3 + 4 = 9 frames
    assert(out.size == 9)
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val n = (2 + id % 3).toInt
      (0 until n).foreach { f =>
        val vf = out((id, f))
        // dims come from the decoded RASTER, not the AVI header
        assert(vf.width == (16 + (id % 3) * 8).toInt)
        assert(vf.height == (16 + (id % 2) * 8).toInt)
        // mean gray snapped to the generator's 16-grid mid-bucket level
        assert(vf.lumaQ == (16 * (1 + (id + f) % 13) + 8).toInt)
      }
    }
  }

  test("decodeVideoFrames drops non-MJPEG payloads instead of failing") {
    import spark.implicits._
    val mixed = Seq(
      Multimodal.MediaRecord(50L, Multimodal.mp4Container(64, 48, 1000, 1000L),
        Multimodal.MediaMeta("mp4", 64, 48, 1000L)),
      Multimodal.MediaRecord(51L,
        Multimodal.mjpegAvi(16, 16, 33333, Seq(Multimodal.grayJpeg(16, 16, 40))),
        Multimodal.MediaMeta("avi", 16, 16, 33L)),
      Multimodal.MediaRecord(52L, "garbage payload".getBytes,
        Multimodal.MediaMeta("bin", 0, 0, 0L))
    ).toDS()
    val out = Multimodal.decodeVideoFrames(mixed).collect()
    assert(out.map(_.id).toSeq == Seq(51L))
    // level 40 = 16·2 + 8 is mid-bucket, so the lossy round-trip snaps back
    assert(out.head.width == 16 && out.head.lumaQ == 40)
  }

  test("imageDHash bits follow the adjacent-bucket law exactly") {
    // 4×1 gradient image, dim=4 → one pixel per bucket; descending
    // luminance sets every compare bit, ascending sets none
    val desc = Multimodal.grayPng(4, 1, (x, _) => 200 - x * 50)
    assert(Multimodal.imageDHash(desc, dim = 4).contains(7L)) // bits 0,1,2
    val asc = Multimodal.grayPng(4, 1, (x, _) => x * 50)
    assert(Multimodal.imageDHash(asc, dim = 4).contains(0L))
    // equal means produce a 0 bit (strict >): constant image hashes to 0
    val flat = Multimodal.grayPng(8, 8, (_, _) => 99)
    assert(Multimodal.imageDHash(flat, dim = 16).contains(0L))
    // the cross-multiplied compare is exact where a float mean would tie-
    // break unpredictably: buckets [3,1] vs [2] → means 2 vs 2 → bit 0
    val tie = Multimodal.grayPng(3, 1, (x, _) => Seq(3, 1, 2)(x))
    assert(Multimodal.imageDHash(tie, dim = 2).contains(0L))
    // non-image bytes decode to None, never throw
    assert(Multimodal.imageDHash("not a png".getBytes, dim = 16).isEmpty)
    // identical content → identical hash through the real codec round-trip
    val again = Multimodal.grayPng(4, 1, (x, _) => 200 - x * 50)
    assert(Multimodal.imageDHash(again, 4) == Multimodal.imageDHash(desc, 4))
  }

  test("perceptualHash buckets duplicate images together and drops junk") {
    import spark.implicits._
    val imgA1 = Multimodal.grayPng(6, 6, (x, y) => (x * 20 + y * 10) % 256)
    val imgA2 = Multimodal.grayPng(6, 6, (x, y) => (x * 20 + y * 10) % 256)
    val imgB = Multimodal.grayPng(6, 6, (x, y) => (250 - x * 30 + y) % 256)
    val ds = Seq(
      Multimodal.MediaRecord(1L, imgA1, Multimodal.MediaMeta("png", 6, 6, 0L)),
      Multimodal.MediaRecord(2L, imgA2, Multimodal.MediaMeta("png", 6, 6, 0L)),
      Multimodal.MediaRecord(3L, imgB, Multimodal.MediaMeta("png", 6, 6, 0L)),
      Multimodal.MediaRecord(4L, "junk".getBytes, Multimodal.MediaMeta("bin", 0, 0, 0L))
    ).toDS()
    val hashes = Multimodal.perceptualHash(ds, dim = 16).collect()
      .map(h => h.id -> h.dhash).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L), "junk payload must drop")
    assert(hashes(1L) == hashes(2L), "identical images must share a bucket")
    assert(hashes(1L) != hashes(3L), "different layout must split buckets")
  }

  test("q_media_scene_cuts: cuts land exactly on the generator's luma wraps") {
    // luma(f) = 16·(1 + (id+f) % 13) + 8 steps by 16 except at the %13
    // wrap, where it plunges by 16·12 = 192 — the only |Δ| ≥ 100. So the
    // REAL decode pipeline must flag exactly the frames with
    // (id+f) % 13 == 0, f ≥ 1.
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_media_scene_cuts")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val ids = graft.Tables.documents(spark, dir).select("doc_id")
      .collect().map(_.getLong(0))
    val want = for {
      id <- ids
      f <- 1 to (1 + (id % 3)).toInt
      if (id + f) % 13 == 0
    } yield (id, f)
    assert(got.map(r => (r._1, r._2)).sorted.toSeq == want.sorted.toSeq)
    got.foreach { case (id, f, prev, cur, delta) =>
      assert(prev == 16 * (1 + ((id + f - 1) % 13)).toInt + 8)
      assert(cur == 16 * (1 + ((id + f) % 13)).toInt + 8)
      assert(delta == 192, s"only the wrap clears the threshold, got $delta")
    }
  }

  test("imagePatches: ragged 4x4 grid pools exactly, pixels conserve") {
    val spark0 = spark
    import spark0.implicits._
    // 6×6 gradient: pixel(x,y) = y*6 + x, patches (2×2 grid, ragged edges)
    val png = Multimodal.grayPng(6, 6, (x, y) => y * 6 + x)
    val ds = Seq(
      Multimodal.MediaRecord(7L, png, Multimodal.MediaMeta("png", 6, 6, 0L)),
      Multimodal.MediaRecord(8L, "junk".getBytes, Multimodal.MediaMeta("bin", 0, 0, 0L))
    ).toDS()
    val got = Multimodal.imagePatches(ds, pw = 4, ph = 4).collect()
      .map(p => (p.id, p.pr, p.pc) -> ((p.nPix, p.lumaSum))).toMap
    assert(got.keys.forall(_._1 == 7L), "junk payload must drop")
    assert(got.size == 4)
    def sumOf(xs: Range, ys: Range) =
      (for { y <- ys; x <- xs } yield y * 6 + x).map(_.toLong).sum
    assert(got((7L, 0, 0)) == ((16L, sumOf(0 until 4, 0 until 4))))
    assert(got((7L, 0, 1)) == ((8L, sumOf(4 until 6, 0 until 4))))
    assert(got((7L, 1, 0)) == ((8L, sumOf(0 until 4, 4 until 6))))
    assert(got((7L, 1, 1)) == ((4L, sumOf(4 until 6, 4 until 6))))
    // conservation: patch masses recompose the full image
    assert(got.values.map(_._1).sum == 36L)
    assert(got.values.map(_._2).sum == (0 until 36).map(_.toLong).sum)
  }
}
