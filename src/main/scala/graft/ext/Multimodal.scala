package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column support for training-data pipelines (north-star EXT):
  * image/audio/video travel as opaque `binary` columns with typed metadata;
  * decode / feature-extraction is partition-wise batched compute.
  *
  * The image kernels are REAL, JDK-only: `javax.imageio.ImageIO` decodes
  * PNG/BMP/JPEG/GIF payloads, resize is a hand-rolled corner-aligned
  * bilinear resample (deterministic double arithmetic, per channel),
  * re-encode is ImageIO's PNG writer. Payloads that are NOT a decodable
  * image (audio/video — no JDK codec exists) fall back to the documented
  * deterministic stand-ins [[decodeFeaturesStub]] / [[resizeStub]], so the
  * same operator runs mixed-modality tables without a schema split.
  *
  * The Spark plumbing is the part that carries to 1000-executor scale:
  *  - the envelope schema (`media binary`, `meta struct<…>`),
  *  - column-level header parsing / frame slicing (binary substr — stays in
  *    codegen, no UDF),
  *  - the partition-wise batched-inference shape via `mapPartitions`:
  *    expensive init (a model / codec context) once per PARTITION, records
  *    processed in fixed-size batches — the JVM analog of pandas-batch
  *    UDFs, and the layout that keeps GPU/model amortization at scale,
  *  - explicit `repartition` control so batch compute parallelism is
  *    decoupled from upstream file splits.
  */
object Multimodal {

  // ImageIO's default stream cache writes temp FILES per decode — a
  // disk-IO tax per row in an executor hot loop. Heap streams only.
  ImageIO.setUseCache(false)

  /** Typed media envelope. */
  final case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRecord(id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(id: Long, format: String, features: Array[Float])

  /** Decoded-image statistics: dims read from the REAL decoded raster (not
    * the metadata — pixels are the truth), plus the band-0 sample sum.
    */
  final case class MediaStats(id: Long, width: Int, height: Int, pixelSum: Long)

  /** Deterministic synthetic media table derived from `documents` (the
    * container ships no real media; bytes = encoded text, metadata derived
    * from doc_id). The schema is the contract a real source would fill.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        element_at(array(lit("img"), lit("aud"), lit("vid")), (col("doc_id") % 3 + 1).cast("int"))
          .as("format"),
        (lit(64) + col("doc_id") % 192).cast("int").as("width"),
        (lit(64) + col("doc_id") % 128).cast("int").as("height"),
        (col("n_chars") * 10).as("durationMs")).as("meta"))

  /** Deterministic REAL-image media table: one 8-bit grayscale PNG per
    * document, dims and pixel values closed-form in `doc_id`
    * (`pixel(x,y) = (doc_id*31 + y*16 + x*7) mod 256`) so a SQL oracle can
    * recompute decoded-pixel statistics without any image code. Every
    * payload goes through the real ImageIO PNG encoder — downstream real
    * decode is exercised end-to-end.
    */
  def syntheticPngMedia(docs: DataFrame): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + id % 7).toInt
        val png = grayPng(w, h, (x, y) => (((id * 31 + y * 16L + x * 7L) % 256L)).toInt)
        MediaRecord(id, png, MediaMeta("png", w, h, 0L))
      }
    }
  }

  /** Column-level frame sampling: split the payload into `n` equal slices
    * (remainder dropped) and explode to (id, frame_idx, frame). Pure binary
    * substr — no UDF, stays in WholeStageCodegen; at scale this is the
    * pre-shuffle fan-out before per-frame feature extraction.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val len = length(col("media"))
    val flen = (len / n).cast("int")
    media
      .select(col("id"), col("media"), posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_idx", "_i")))
      .select(
        col("id"),
        col("frame_idx"),
        col("media").substr(col("frame_idx") * flen + 1, flen).as("frame"))
      .filter(length(col("frame")) > 0)
  }

  // ---- real JDK image kernels ---------------------------------------------

  /** Real image decode via the JDK's ImageIO (PNG/BMP/JPEG/GIF readers ship
    * in every JRE). Returns None for payloads no installed reader accepts —
    * the fallback-to-stub signal for non-image modalities.
    */
  def decodeImage(media: Array[Byte]): Option[BufferedImage] =
    if (media == null || media.length < 8) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(media)))
      catch { case _: java.io.IOException => None }

  /** Real PNG encode (lossless — the only sane re-encode target for a
    * deterministic pipeline; JPEG would re-quantize every hop).
    */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream(1024)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Build an 8-bit grayscale PNG from a pixel function. Writes raster
    * SAMPLES directly (setRGB on TYPE_BYTE_GRAY would round-trip through
    * sRGB color management and gamma-shift the values; raster access is the
    * exact path).
    */
  def grayPng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { r.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  /** Build an RGB PNG from a packed-0xRRGGBB pixel function (exact sRGB
    * round-trip: PNG truecolor carries the samples verbatim).
    */
  def rgbPng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, pixel(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  /** Corner-aligned bilinear resample of one channel (row-major Int
    * samples). Deterministic: IEEE double arithmetic + half-up rounding,
    * no AWT rendering pipeline involved (AffineTransformOp's rounding is
    * implementation-defined; this is not).
    */
  private[ext] def bilinear(
      src: Array[Int],
      srcW: Int,
      srcH: Int,
      dstW: Int,
      dstH: Int): Array[Int] = {
    val out = new Array[Int](dstW * dstH)
    var y = 0
    while (y < dstH) {
      val fy = if (dstH == 1) 0.0 else y.toDouble * (srcH - 1) / (dstH - 1)
      val y0 = math.min(fy.toInt, srcH - 1)
      val y1 = math.min(y0 + 1, srcH - 1)
      val wy = fy - y0
      var x = 0
      while (x < dstW) {
        val fx = if (dstW == 1) 0.0 else x.toDouble * (srcW - 1) / (dstW - 1)
        val x0 = math.min(fx.toInt, srcW - 1)
        val x1 = math.min(x0 + 1, srcW - 1)
        val wx = fx - x0
        val v = src(y0 * srcW + x0) * (1 - wy) * (1 - wx) +
          src(y0 * srcW + x1) * (1 - wy) * wx +
          src(y1 * srcW + x0) * wy * (1 - wx) +
          src(y1 * srcW + x1) * wy * wx
        out(y * dstW + x) = math.round(v).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real image resize: decode → per-channel bilinear → PNG re-encode.
    * Single-band rasters (grayscale) resample band 0 directly and re-encode
    * gray (avoiding any colorspace conversion); everything else goes
    * through packed sRGB per-channel. Returns None when the payload is not
    * a decodable image.
    */
  def resizeImage(media: Array[Byte], dstW: Int, dstH: Int): Option[Array[Byte]] =
    decodeImage(media).map { img =>
      val (sw, sh) = (img.getWidth, img.getHeight)
      if (img.getRaster.getNumBands == 1) {
        val src = new Array[Int](sw * sh)
        img.getRaster.getSamples(0, 0, sw, sh, 0, src)
        val dst = bilinear(src, sw, sh, dstW, dstH)
        val out = new BufferedImage(dstW, dstH, BufferedImage.TYPE_BYTE_GRAY)
        out.getRaster.setSamples(0, 0, dstW, dstH, 0, dst)
        encodePng(out)
      } else {
        val n = sw * sh
        val r = new Array[Int](n); val g = new Array[Int](n); val b = new Array[Int](n)
        var i = 0
        var y = 0
        while (y < sh) {
          var x = 0
          while (x < sw) {
            val p = img.getRGB(x, y)
            r(i) = (p >> 16) & 0xff; g(i) = (p >> 8) & 0xff; b(i) = p & 0xff
            i += 1; x += 1
          }
          y += 1
        }
        val (rr, gg, bb) =
          (bilinear(r, sw, sh, dstW, dstH), bilinear(g, sw, sh, dstW, dstH),
            bilinear(b, sw, sh, dstW, dstH))
        val out = new BufferedImage(dstW, dstH, BufferedImage.TYPE_INT_RGB)
        var j = 0
        var yy = 0
        while (yy < dstH) {
          var xx = 0
          while (xx < dstW) {
            out.setRGB(xx, yy, (rr(j) << 16) | (gg(j) << 8) | bb(j))
            j += 1; xx += 1
          }
          yy += 1
        }
        encodePng(out)
      }
    }

  /** Real feature extraction: decode → row-major luminance scan → mean-pool
    * into `dim` equal buckets, scaled to [0,1]. Luminance is the integer
    * ITU-R 601 weighting ((299r+587g+114b)/1000) for multi-band images,
    * the raw band-0 sample for grayscale. Returns None for non-images.
    */
  def imageFeatures(media: Array[Byte], dim: Int): Option[Array[Float]] =
    decodeImage(media).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val n = w * h
      val lum = new Array[Int](n)
      if (img.getRaster.getNumBands == 1) {
        img.getRaster.getSamples(0, 0, w, h, 0, lum)
      } else {
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            lum(i) = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
            i += 1; x += 1
          }
          y += 1
        }
      }
      val sums = new Array[Long](dim)
      val counts = new Array[Int](dim)
      var i = 0
      while (i < n) {
        val b = (i.toLong * dim / n).toInt
        sums(b) += lum(i); counts(b) += 1
        i += 1
      }
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        out(j) = if (counts(j) == 0) 0.0f else (sums(j).toDouble / counts(j) / 255.0).toFloat
        j += 1
      }
      out
    }

  /** Difference-hash (dHash) of a decoded image over `dim` flat-index
    * luminance buckets: bit j is set iff bucket j's mean luminance exceeds
    * bucket j+1's — the classic perceptual fingerprint for image near-dup
    * detection (brightness-invariant-ish, layout-sensitive). The
    * comparison is INTEGER cross-multiplication (`s_j·c_{j+1} >
    * s_{j+1}·c_j`), never a float divide, so an SQL oracle reproduces
    * every bit exactly and two JVMs can't disagree in the last ulp.
    * Pooling matches [[imageFeatures]] (bucket = i·dim/n over the
    * row-major flat index).
    */
  def imageDHash(media: Array[Byte], dim: Int): Option[Long] = {
    require(dim >= 2 && dim <= 64, "dim must be in [2, 64]")
    decodeImage(media).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val n = w * h
      val lum = new Array[Int](n)
      if (img.getRaster.getNumBands == 1) {
        img.getRaster.getSamples(0, 0, w, h, 0, lum)
      } else {
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            lum(i) = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
            i += 1; x += 1
          }
          y += 1
        }
      }
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < n) {
        val b = (i.toLong * dim / n).toInt
        sums(b) += lum(i); counts(b) += 1
        i += 1
      }
      var hash = 0L
      var j = 0
      while (j < dim - 1) {
        if (sums(j) * counts(j + 1) > sums(j + 1) * counts(j)) hash |= (1L << j)
        j += 1
      }
      hash
    }
  }

  /** Per-image id + dHash. */
  final case class ImageHash(id: Long, dhash: Long)

  /** Batched dHash over a media table — same map-only per-partition kernel
    * lifecycle as [[decodeStats]]; undecodable payloads are dropped.
    * Downstream, a plain `groupBy(dhash)` (or a window over it) turns the
    * fingerprints into near-dup buckets — the image analog of exact text
    * dedup, at one hash-keyed exchange over |images| rows.
    */
  def perceptualHash(media: Dataset[MediaRecord], dim: Int, batchSize: Int = 64)
      : Dataset[ImageHash] = {
    implicit val enc = Encoders.product[ImageHash]
    media.mapPartitions { rows =>
      val codecHandle = new Object
      rows.grouped(batchSize).flatMap { batch =>
        require(codecHandle != null)
        batch.iterator.flatMap(r => imageDHash(r.media, dim).map(ImageHash(r.id, _)))
      }
    }
  }

  /** One ViT-style patch: grid cell (pr, pc), its pixel count (edge
    * patches are ragged when dims don't divide), and the exact luminance
    * sum — the integer sufficient statistic downstream normalization
    * derives means from without float drift.
    */
  final case class ImagePatch(id: Long, pr: Int, pc: Int, nPix: Long, lumaSum: Long)

  /** Patch-grid extraction over REAL decoded images — the ViT / vision-
    * encoder data-prep primitive: each image splits into ph×pw cells and
    * each cell reduces to exact integer (count, luma-sum). Pooling runs
    * INSIDE the batched decode kernel (one pass over the raster, no
    * per-pixel rows ever hit Spark); the output is |images|·patches rows —
    * corpus-linear. Undecodable payloads drop, like every media kernel.
    */
  def imagePatches(media: Dataset[MediaRecord], pw: Int, ph: Int, batchSize: Int = 64)
      : Dataset[ImagePatch] = {
    require(pw >= 1 && ph >= 1, "patch dims must be positive")
    implicit val enc = Encoders.product[ImagePatch]
    media.mapPartitions { rows =>
      val codecHandle = new Object
      rows.grouped(batchSize).flatMap { batch =>
        require(codecHandle != null)
        batch.iterator.flatMap { r =>
          decodeImage(r.media).toSeq.flatMap { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            val (pcols, prows) = ((w + pw - 1) / pw, (h + ph - 1) / ph)
            val sums = new Array[Long](prows * pcols)
            val counts = new Array[Long](prows * pcols)
            val lum = new Array[Int](w * h)
            if (img.getRaster.getNumBands == 1) {
              img.getRaster.getSamples(0, 0, w, h, 0, lum)
            } else {
              var i = 0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  lum(i) =
                    (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
                  i += 1; x += 1
                }
                y += 1
              }
            }
            var y = 0
            var i = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val cell = (y / ph) * pcols + (x / pw)
                sums(cell) += lum(i); counts(cell) += 1
                i += 1; x += 1
              }
              y += 1
            }
            (0 until prows * pcols).map { c =>
              ImagePatch(r.id, c / pcols, c % pcols, counts(c), sums(c))
            }
          }
        }
      }
    }
  }

  // ---- real JDK audio kernels ---------------------------------------------

  /** Decoded PCM audio: sample count, rate, and the signed-sample sum —
    * the provenance stats a real audio pipeline validates before feature
    * extraction.
    */
  final case class AudioStats(id: Long, nSamples: Int, sampleRate: Int, sampleSum: Long)

  /** Build a mono 16-bit little-endian PCM WAV from a sample function —
    * a REAL RIFF/WAVE container through the JDK's `javax.sound.sampled`
    * writer (no codec needed: WAV PCM is the one audio format the JRE
    * fully round-trips).
    */
  def pcmWav(nSamples: Int, sampleRate: Int, sample: Int => Int): Array[Byte] = {
    // hand-built canonical RIFF/WAVE container (44-byte header + LE
    // PCM16 payload). AudioSystem.write produces the same format but
    // funnels EVERY call through JDK13Services' synchronized provider
    // cache — measured 2.8× over linear at ×100 under local[32] (500k
    // writes+reads serialize on one lock; BASELINE session-3). The
    // container is 44 fixed bytes; build it directly.
    // MultimodalSpec pins AudioSystem-compatibility of the output.
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // audio format: PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < nSamples) { buf.putShort(sample(k).toShort); k += 1 }
    buf.array()
  }

  /** Real audio decode: canonical PCM16-mono-LE WAVs parse through the
    * hand-rolled RIFF walker (the hot path — no shared lock, like the
    * AVI/MP4 parsers below); anything else falls back to the JDK's
    * `AudioSystem` reader (AIFF/AU/non-canonical WAV), whose
    * synchronized provider cache prices as an exception handler — the
    * same hot-path/fallback split as the charset-cascade ingest UDF.
    * Returns None for payloads neither path accepts (the non-audio
    * signal, mirroring [[decodeImage]]).
    */
  def decodeAudio(media: Array[Byte]): Option[(Int, Int, Array[Int])] =
    if (media == null || media.length < 12) None
    else parseWavPcm(media).orElse(decodeAudioJdk(media))

  /** Hand-rolled RIFF/WAVE chunk walk for the canonical PCM case:
    * requires `fmt ` declaring PCM, mono, 16-bit (little-endian by the
    * WAV spec) and a `data` chunk; word-aligned chunk stepping; any
    * deviation → None (the JDK fallback decides, not this parser).
    */
  private[graft] def parseWavPcm(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 44 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE") None
    else {
      var off = 12
      var rate = -1
      var ok = false
      var data: Array[Int] = null
      while (off + 8 <= b.length && (data == null || !ok)) {
        val id = fourcc(b, off)
        val size = le32(b, off + 4).toInt
        val payload = off + 8
        // bound in LONG: a crafted size near Int.MaxValue overflows the
        // Int sum negative, sails past the check, and the data loop then
        // throws (or allocates ~4 GB) instead of returning None
        if (size < 0 || payload.toLong + size > b.length) return None
        if (id == "fmt " && size >= 16) {
          val audioFormat = (b(payload) & 0xff) | ((b(payload + 1) & 0xff) << 8)
          val channels = (b(payload + 2) & 0xff) | ((b(payload + 3) & 0xff) << 8)
          val bits = (b(payload + 14) & 0xff) | ((b(payload + 15) & 0xff) << 8)
          if (audioFormat != 1 || channels != 1 || bits != 16) return None
          rate = le32(b, payload + 4).toInt
          ok = true
        } else if (id == "data") {
          val n = size / 2
          data = new Array[Int](n)
          var k = 0
          while (k < n) {
            data(k) = (b(payload + 2 * k + 1) << 8) | (b(payload + 2 * k) & 0xff)
            k += 1
          }
        }
        off = payload + size + (size & 1) // RIFF chunks are word-aligned
      }
      if (ok && data != null) Some((rate, data.length, data)) else None
    }
  }

  /** The JDK `AudioSystem` fallback path (see [[decodeAudio]]). */
  private def decodeAudioJdk(media: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(media))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian) None
      else {
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Int](n)
        var k = 0
        while (k < n) {
          out(k) = ((raw(2 * k + 1) << 8) | (raw(2 * k) & 0xff))
          k += 1
        }
        Some((fmt.getSampleRate.toInt, n, out))
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException                               => None
    }

  /** Deterministic REAL-audio media table: one PCM WAV per document,
    * sample count/rate and sample values closed-form in `doc_id`
    * (`sample(k) = (doc_id*37 + k*11) mod 2003 − 1001`), so a SQL oracle
    * recomputes decoded-sample statistics with no audio code — the audio
    * analog of [[syntheticPngMedia]].
    */
  def syntheticWavMedia(docs: DataFrame): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = (64 + id % 64).toInt
        val wav = pcmWav(n, 8000, k => (((id * 37 + k * 11L) % 2003L) - 1001L).toInt)
        MediaRecord(id, wav, MediaMeta("wav", 0, 0, n * 1000L / 8000L))
      }
    }
  }

  /** Partition-wise batched audio-decode statistics (same plumbing shape
    * as [[decodeStats]]); non-audio payloads are dropped.
    */
  def audioStats(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[AudioStats] = {
    implicit val enc = Encoders.product[AudioStats]
    media.mapPartitions { rows =>
      val codecHandle = new Object
      rows.grouped(batchSize).flatMap { batch =>
        require(codecHandle != null)
        batch.iterator.flatMap { r =>
          decodeAudio(r.media).map { case (rate, n, samples) =>
            var sum = 0L
            var k = 0
            while (k < n) { sum += samples(k); k += 1 }
            AudioStats(r.id, n, rate, sum)
          }
        }
      }
    }
  }

  final case class AudioResampleStats(
      id: Long, nIn: Int, nOut: Int, outSumM: Long, outFirstM: Long, outLastM: Long)

  /** Rational `num/den` LINEAR RESAMPLER over REAL decoded PCM — the
    * speech-pipeline staple (every ASR corpus normalizes to one rate;
    * 8000 → 3000 Hz is num=3, den=8). Output sample j sits at input
    * position t = j·den/num; with p = (j·den) div num and r = (j·den)
    * mod num the interpolated value ×num is the EXACT integer
    * `s[p]·(num − r) + s[p+1]·r` — no float anywhere, so the oracle
    * recomputes every output from the closed-form synthetic samples.
    * nOut = (nIn − 1)·num div den + 1 (the last output sits at or before
    * the last input; r = 0 there whenever t lands exactly on it, so
    * s[p+1] is never read out of range). Same batched `mapPartitions`
    * kernel shape as [[audioStats]]; emits the per-id audit row
    * (counts, ×num-scaled sum/first/last) rather than 100 TB of samples.
    */
  def audioResample(
      media: Dataset[MediaRecord],
      num: Int,
      den: Int,
      batchSize: Int = 64): Dataset[AudioResampleStats] = {
    require(num > 0 && den > 0, "need positive resample ratio terms")
    implicit val enc = Encoders.product[AudioResampleStats]
    media.mapPartitions { rows =>
      val codecHandle = new Object
      rows.grouped(batchSize).flatMap { batch =>
        require(codecHandle != null)
        batch.iterator.flatMap { r =>
          decodeAudio(r.media).flatMap { case (_, n, samples) =>
            if (n < 1) scala.None
            else {
              val nOut = ((n - 1).toLong * num / den).toInt + 1
              var sum = 0L
              var first = 0L
              var last = 0L
              var j = 0
              while (j < nOut) {
                val t = j.toLong * den
                val p = (t / num).toInt
                val rr = (t % num).toInt
                val v =
                  if (rr == 0) samples(p).toLong * num
                  else samples(p).toLong * (num - rr) + samples(p + 1).toLong * rr
                sum += v
                if (j == 0) first = v
                last = v
                j += 1
              }
              Some(AudioResampleStats(r.id, n, nOut, sum, first, last))
            }
          }
        }
      }
    }
  }

  final case class AudioFrameFeat(
      id: Long, frameIdx: Int, nSamples: Int, energy: Long, zeroCrossings: Int)

  /** Per-frame audio features over REAL decoded PCM: non-overlapping
    * `frameSize`-sample windows, each emitting energy (Σ s² — the
    * loudness gate) and zero-crossing count (the cheap voiced/unvoiced &
    * noise discriminator) — the two integer-exact features an audio
    * curation pass filters on before any model-based scoring. Same
    * batched `mapPartitions` kernel shape as [[audioStats]]; both
    * features are integers, so the oracle recomputes them closed-form
    * from the synthetic sample formula with zero float risk.
    */
  def audioFrameFeatures(
      media: Dataset[MediaRecord],
      frameSize: Int = 32,
      batchSize: Int = 64): Dataset[AudioFrameFeat] = {
    require(frameSize > 0, "frameSize must be positive")
    implicit val enc = Encoders.product[AudioFrameFeat]
    media.mapPartitions { rows =>
      val codecHandle = new Object
      rows.grouped(batchSize).flatMap { batch =>
        require(codecHandle != null)
        batch.iterator.flatMap { r =>
          decodeAudio(r.media).iterator.flatMap { case (_, n, samples) =>
            (0 until (n + frameSize - 1) / frameSize).iterator.map { f =>
              val start = f * frameSize
              val end = math.min(start + frameSize, n)
              var e = 0L
              var zc = 0
              var k = start
              while (k < end) {
                val s = samples(k)
                e += s.toLong * s
                if (k > start && ((samples(k - 1) < 0) != (s < 0))) zc += 1
                k += 1
              }
              AudioFrameFeat(r.id, f, end - start, e, zc)
            }
          }
        }
      }
    }
  }

  // ---- real video container parsing ---------------------------------------
  //
  // No JDK video CODEC exists, so pixel decode stays behind the documented
  // stubs below — but container METADATA is pure byte parsing, and that is
  // what a curation pipeline actually reads first (dims / duration / frame
  // count gate ingest long before any frame is decoded). Both parsers are
  // hand-rolled over the public container specs: ISO BMFF (MP4 `moov/mvhd`
  // for timescale+duration, `tkhd` for 16.16-fixed dims) and RIFF AVI
  // (`hdrl/avih` for frame period, frame count, dims).

  /** Parsed video container metadata: the pre-decode facts. `nFrames` is 0
    * for MP4 (the movie header carries duration, not a frame count — that
    * lives in per-track sample tables a minimal parse doesn't need).
    */
  final case class VideoMeta(
      id: Long, container: String, width: Int, height: Int, durationMs: Long, nFrames: Long)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse MP4 / RIFF-AVI container metadata from the leading bytes.
    * Returns None for payloads that are neither (the non-video signal,
    * mirroring [[decodeImage]]/[[decodeAudio]]) or whose declared box/chunk
    * sizes run past the buffer (truncated or hostile input must yield None,
    * never an exception in an executor hot loop).
    */
  def parseVideoMeta(id: Long, media: Array[Byte]): Option[VideoMeta] =
    if (media == null || media.length < 12) scala.None
    else
      try {
        if (fourcc(media, 4) == "ftyp") parseMp4(id, media)
        else if (fourcc(media, 0) == "RIFF" && fourcc(media, 8) == "AVI ") parseAvi(id, media)
        else scala.None
      } catch { case _: IndexOutOfBoundsException | _: ArithmeticException => scala.None }

  /** Walk top-level ISO-BMFF boxes (u32-BE size + 4CC; size==1 ⇒ 64-bit
    * largesize follows) for `moov`; inside it, `mvhd` gives
    * timescale/duration and the first `trak/tkhd` gives 16.16 dims.
    * BOTH header versions are read: v0 (32-bit times) and v1 (64-bit
    * creation/modification/duration — what muxers emit for long-form
    * video or post-2040 timestamps; dropping v1 would silently lose real
    * videos at the ingest gate).
    */
  private def parseMp4(id: Long, b: Array[Byte]): Option[VideoMeta] = {
    var w = 0; var h = 0; var durMs = -1L
    def be64(o: Int): Long = (be32(b, o) << 32) | be32(b, o + 4)
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        var size = be32(b, o.toInt)
        val typ = fourcc(b, o.toInt + 4)
        var payload = o + 8
        if (size == 1L && o + 16 <= end) { // 64-bit largesize
          size = be64(o.toInt + 8)
          payload = o + 16
        }
        if (size < 8 || o + size > end) return // malformed ⇒ stop, keep what we have
        val p = payload.toInt
        typ match {
          case "moov" | "trak" if depth < 4 => walk(payload, o + size, depth + 1)
          case "mvhd" if b(p) == 0 && payload + 20 <= end =>
            val timescale = be32(b, p + 12) // after 4+4+4 (verflags, ctime, mtime)
            if (timescale > 0) durMs = be32(b, p + 16) * 1000L / timescale
          case "mvhd" if b(p) == 1 && payload + 32 <= end =>
            val timescale = be32(b, p + 20) // after 4+8+8
            if (timescale > 0) durMs = be64(p + 24) * 1000L / timescale
          case "tkhd" if b(p) == 0 && payload + 84 <= end && w == 0 =>
            w = (be32(b, p + 76) >> 16).toInt // 16.16 fixed
            h = (be32(b, p + 80) >> 16).toInt
          case "tkhd" if b(p) == 1 && payload + 96 <= end && w == 0 =>
            w = (be32(b, p + 88) >> 16).toInt // v1: times are 8 bytes (+12)
            h = (be32(b, p + 92) >> 16).toInt
          case _ => ()
        }
        o += size
      }
    }
    walk(0L, b.length.toLong, 0)
    if (durMs >= 0) Some(VideoMeta(id, "mp4", w, h, durMs, 0L)) else scala.None
  }

  /** Walk RIFF chunks (4CC + u32-LE size, LIST carries a subtype) for
    * `LIST hdrl`; its `avih` payload gives dwMicroSecPerFrame(0),
    * dwTotalFrames(16), dwWidth(32), dwHeight(36).
    */
  private def parseAvi(id: Long, b: Array[Byte]): Option[VideoMeta] = {
    var o = 12L
    val end = math.min(12L + le32(b, 4) - 4, b.length.toLong)
    while (o + 8 <= end) {
      val typ = fourcc(b, o.toInt)
      val size = le32(b, o.toInt + 4)
      if (typ == "LIST" && o + 12 <= end && fourcc(b, o.toInt + 8) == "hdrl") {
        var c = o + 12
        val lend = math.min(o + 8 + size, end)
        while (c + 8 <= lend) {
          val ct = fourcc(b, c.toInt)
          val cs = le32(b, c.toInt + 4)
          if (ct == "avih" && c + 8 + 40 <= lend) {
            val usPerFrame = le32(b, c.toInt + 8)
            val frames = le32(b, c.toInt + 8 + 16)
            val w = le32(b, c.toInt + 8 + 32).toInt
            val h = le32(b, c.toInt + 8 + 36).toInt
            return Some(VideoMeta(id, "avi", w, h, usPerFrame * frames / 1000L, frames))
          }
          c += 8 + cs + (cs & 1) // chunks are word-aligned
        }
      }
      o += 8 + size + (size & 1)
    }
    scala.None
  }

  /** Build a minimal-but-valid MP4: `ftyp` + `moov(mvhd, trak(tkhd))` with
    * v0 (32-bit) or v1 (64-bit time) headers. Every field a reader needs
    * is real; there is simply no media data (`mdat`) — the shape of a
    * metadata-only sidecar.
    */
  def mp4Container(
      width: Int,
      height: Int,
      timescale: Int,
      duration: Long,
      version: Int = 0): Array[Byte] = {
    require(version == 0 || version == 1, "only mvhd/tkhd versions 0 and 1 exist")
    // tkhd width/height are 16.16 fixed-point: `width << 16` overflows Int
    // at 32768, and a v0 mvhd/tkhd duration field is 32-bit — out-of-range
    // inputs must fail loudly here, or a generator bug becomes
    // indistinguishable from a parser bug in round-trip tests
    require(width > 0 && width < 32768 && height > 0 && height < 32768,
      s"tkhd 16.16 fixed-point dimensions must be in (0, 32768): ${width}x$height")
    require(version == 1 || (duration >= 0 && duration <= 0xFFFFFFFFL),
      s"v0 duration is a 32-bit field; use version = 1 for duration = $duration")
    val v1 = version == 1
    val mvhdSize = if (v1) 120 else 108
    val tkhdSize = if (v1) 104 else 92
    val out = java.nio.ByteBuffer.allocate(20 + 8 + mvhdSize + 8 + tkhdSize)
    def box(size: Int, typ: String): Unit = {
      out.putInt(size); out.put(typ.getBytes("US-ASCII"))
    }
    def times(): Unit = // ctime, mtime — 8 bytes each in v1
      if (v1) out.putLong(0L).putLong(0L) else out.putInt(0).putInt(0)
    box(20, "ftyp"); out.put("isom".getBytes("US-ASCII")); out.putInt(0x200)
    out.put("isom".getBytes("US-ASCII"))
    box(8 + mvhdSize + 8 + tkhdSize, "moov")
    box(mvhdSize, "mvhd"); out.putInt(version << 24) // version + flags
    times()
    out.putInt(timescale)
    if (v1) out.putLong(duration) else out.putInt(duration.toInt)
    out.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
    out.putInt(0).putInt(0) // reserved
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(out.putInt) // identity matrix
    (0 until 6).foreach(_ => out.putInt(0)) // pre_defined
    out.putInt(2) // next_track_ID
    box(8 + tkhdSize, "trak")
    box(tkhdSize, "tkhd"); out.putInt((version << 24) | 7) // version + flags
    times()
    out.putInt(1).putInt(0) // track_ID, reserved
    if (v1) out.putLong(duration) else out.putInt(duration.toInt)
    out.putInt(0).putInt(0) // reserved
    out.putShort(0).putShort(0).putShort(0).putShort(0) // layer, alt_group, volume, reserved
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(out.putInt)
    out.putInt(width << 16).putInt(height << 16) // 16.16 fixed
    out.array()
  }

  /** Build a minimal-but-valid RIFF AVI: `RIFF('AVI ' LIST('hdrl' avih))`.
    * Same sidecar shape as [[mp4Container]] — real header, no movi data.
    */
  def aviContainer(width: Int, height: Int, usPerFrame: Int, frames: Long): Array[Byte] = {
    val out = java.nio.ByteBuffer
      .allocate(12 + 12 + 8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    cc("RIFF"); out.putInt(4 + 12 + 8 + 56); cc("AVI ")
    cc("LIST"); out.putInt(4 + 8 + 56); cc("hdrl")
    cc("avih"); out.putInt(56)
    out.putInt(usPerFrame).putInt(0).putInt(0).putInt(0x10) // usPerFrame, maxBps, pad, flags
    out.putInt(frames.toInt).putInt(0).putInt(1).putInt(0) // totalFrames, initial, streams, bufSize
    out.putInt(width).putInt(height)
    (0 until 4).foreach(_ => out.putInt(0)) // dwReserved[4]
    out.array()
  }

  // ---- MJPEG-in-AVI: the one video format the JDK can pixel-decode --------
  //
  // Motion-JPEG stores each frame as an INDEPENDENT baseline JPEG inside the
  // AVI `movi` list (`00dc` chunks) — no inter-frame prediction, no bitstream
  // state. That makes it the single video codec reachable with a stock JRE:
  // the container walk is the same RIFF parsing as [[parseAvi]], and each
  // frame payload is exactly what `ImageIO`'s JPEG reader accepts. Pixel
  // decode therefore stops being a stub for this format; the stub remains
  // only for codecs the JDK truly lacks (H.264/VP9/AV1 — inter-frame,
  // entropy-coded, no JRE decoder).

  /** Encode a solid-gray baseline JPEG at an explicit quality. A constant
    * image has only DC energy per 8×8 block, so the lossy round-trip error
    * is bounded by dcQuantStep/16 < 1 gray level at q=0.9 — which is what
    * lets a closed-form oracle check REAL decoded pixels despite JPEG being
    * lossy (levels live on a 16-grid; see [[decodeVideoFrames]]).
    */
  def grayJpeg(width: Int, height: Int, level: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { r.setSample(x, y, 0, level & 0xff); x += 1 }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.9f) // explicit: JRE default quality is unspecified
    val bos = new ByteArrayOutputStream(1024)
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Build a playable MJPEG AVI: `RIFF('AVI ' LIST('hdrl' avih)
    * LIST('movi' 00dc…))` with one real JPEG per frame. The header is the
    * same [[aviContainer]] shape ([[parseAvi]] reads it unchanged); `movi`
    * carries the frame payloads word-aligned per the RIFF spec.
    */
  def mjpegAvi(width: Int, height: Int, usPerFrame: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val moviBody = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val total = 4 + (12 + 8 + 56) + (8 + moviBody)
    val out = java.nio.ByteBuffer
      .allocate(8 + total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    cc("RIFF"); out.putInt(total); cc("AVI ")
    cc("LIST"); out.putInt(4 + 8 + 56); cc("hdrl")
    cc("avih"); out.putInt(56)
    out.putInt(usPerFrame).putInt(0).putInt(0).putInt(0x10)
    out.putInt(frames.size).putInt(0).putInt(1).putInt(0)
    out.putInt(width).putInt(height)
    (0 until 4).foreach(_ => out.putInt(0))
    cc("LIST"); out.putInt(moviBody); cc("movi")
    frames.foreach { f =>
      cc("00dc"); out.putInt(f.length); out.put(f)
      if ((f.length & 1) == 1) out.put(0.toByte) // RIFF chunks are word-aligned
    }
    out.array()
  }

  /** Iterate the JPEG frame payloads of an MJPEG AVI: walk top-level RIFF
    * chunks for `LIST movi`, then its `00dc`/`00db` entries. Returns empty
    * for non-AVI payloads or AVIs without movi data (the metadata-only
    * sidecars) — never throws on truncated input.
    */
  def mjpegFrames(media: Array[Byte]): Seq[Array[Byte]] =
    if (media == null || media.length < 12 ||
      fourcc(media, 0) != "RIFF" || fourcc(media, 8) != "AVI ") Seq.empty
    else
      try {
        val end = math.min(12L + le32(media, 4) - 4, media.length.toLong)
        var o = 12L
        while (o + 8 <= end) {
          val typ = fourcc(media, o.toInt)
          val size = le32(media, o.toInt + 4)
          if (typ == "LIST" && o + 12 <= end && fourcc(media, o.toInt + 8) == "movi") {
            val frames = Seq.newBuilder[Array[Byte]]
            var c = o + 12
            val lend = math.min(o + 8 + size, end)
            while (c + 8 <= lend) {
              val ct = fourcc(media, c.toInt)
              val cs = le32(media, c.toInt + 4)
              if ((ct == "00dc" || ct == "00db") && c + 8 + cs <= lend)
                frames += java.util.Arrays.copyOfRange(media, c.toInt + 8, (c + 8 + cs).toInt)
              c += 8 + cs + (cs & 1)
            }
            return frames.result()
          }
          o += 8 + size + (size & 1)
        }
        Seq.empty
      } catch { case _: IndexOutOfBoundsException => Seq.empty }

  /** One decoded MJPEG frame: raster dims (pixel truth, not header claims)
    * and the mean gray level snapped back to the 16-grid the generator
    * draws from.
    */
  final case class VideoFrame(id: Long, frameIdx: Int, width: Int, height: Int, lumaQ: Int)

  /** Deterministic REAL-video media table: one MJPEG AVI per document,
    * dims / frame count / per-frame solid gray level closed-form in
    * `doc_id` (level(f) = 16·(1 + (id+f) mod 13) + 8 — mid-bucket points
    * of the 16-grid, so the ≤1-level JPEG round-trip error can never cross
    * a bucket edge). Every frame goes through the real ImageIO JPEG
    * ENCODER here and the real DECODER in [[decodeVideoFrames]].
    */
  def syntheticMjpegMedia(docs: DataFrame): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (16 + (id % 3) * 8).toInt
        val h = (16 + (id % 2) * 8).toInt
        val nFrames = (2 + id % 3).toInt
        val jpegs = (0 until nFrames).map(f => grayJpeg(w, h, (16 * (1 + (id + f) % 13) + 8).toInt))
        MediaRecord(id, mjpegAvi(w, h, 33333, jpegs),
          MediaMeta("avi", w, h, 33333L * nFrames / 1000L))
      }
    }
  }

  /** REAL video pixel decode (MJPEG): container walk → per-frame ImageIO
    * JPEG decode → raster dims + mean gray snapped to the 16-grid
    * (`lumaQ = 16·floor(mean/16) + 8`). Same partition-wise batched shape
    * as [[decodeStats]]; payloads that aren't MJPEG AVIs, and frames that
    * don't decode, are dropped.
    */
  def decodeVideoFrames(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[VideoFrame] = {
    implicit val enc = Encoders.product[VideoFrame]
    media.mapPartitions { rows =>
      val codecHandle = new Object // per-partition init (≡ decoder context reuse)
      rows.grouped(batchSize).flatMap { batch =>
        require(codecHandle != null)
        batch.iterator.flatMap { r =>
          mjpegFrames(r.media).iterator.zipWithIndex.flatMap { case (jpeg, idx) =>
            decodeImage(jpeg).map { img =>
              val (w, h) = (img.getWidth, img.getHeight)
              val samples = new Array[Int](w * h)
              img.getRaster.getSamples(0, 0, w, h, 0, samples)
              var sum = 0L
              var i = 0
              while (i < samples.length) { sum += samples(i); i += 1 }
              val mean = sum.toDouble / (w * h)
              VideoFrame(r.id, idx, w, h, 16 * math.floor(mean / 16).toInt + 8)
            }
          }
        }
      }
    }
  }

  /** Deterministic REAL-container video media table: alternating MP4 / AVI
    * headers per document, dims/duration closed-form in `doc_id` so a SQL
    * oracle recomputes the parsed metadata with no video code — the
    * container analog of [[syntheticPngMedia]]/[[syntheticWavMedia]].
    * Closed form: w = 160 + id%320, h = 120 + id%240; even ids → MP4 with
    * timescale 1000, duration (id%9000)+1000; odd ids → AVI with 33333 µs
    * frames, (id%240)+24 of them.
    */
  def syntheticVideoMedia(docs: DataFrame): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (160 + id % 320).toInt
        val h = (120 + id % 240).toInt
        if (id % 2 == 0) {
          val dur = (id % 9000) + 1000
          MediaRecord(id, mp4Container(w, h, 1000, dur), MediaMeta("mp4", w, h, dur))
        } else {
          val frames = (id % 240) + 24
          MediaRecord(id, aviContainer(w, h, 33333, frames),
            MediaMeta("avi", w, h, 33333L * frames / 1000L))
        }
      }
    }
  }

  /** Partition-wise batched container-metadata extraction — the pre-decode
    * ingest gate. Non-video payloads are DROPPED (same contract as
    * [[decodeStats]]).
    */
  def videoMeta(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[VideoMeta] = {
    implicit val enc = Encoders.product[VideoMeta]
    media.mapPartitions { rows =>
      val parserHandle = new Object // per-partition init (≡ demuxer context)
      rows.grouped(batchSize).flatMap { batch =>
        require(parserHandle != null)
        batch.iterator.flatMap(r => parseVideoMeta(r.id, r.media))
      }
    }
  }

  // ---- deterministic fallbacks for non-image modalities -------------------

  /** FALLBACK decode kernel for payloads ImageIO can't read (audio/video —
    * no JDK codec exists): deterministic byte-hash features. Replace the
    * body with a real codec call when one is available; the signature and
    * the [[extractFeatures]] plumbing don't change.
    */
  def decodeFeaturesStub(media: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 1125899906842597L
    var i = 0
    while (i < media.length) { acc = acc * 31 + (media(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      acc = acc * 6364136223846793005L + 1442695040888963407L
      out(j) = ((acc >>> 16) % 1000L) / 1000.0f
      j += 1
    }
    out
  }

  /** FALLBACK resize kernel for non-image payloads: deterministic
    * nearest-neighbor over the payload treated as a row-major srcW×srcH
    * byte grid (clipped to the available bytes), sampled at dstW×dstH.
    */
  def resizeStub(
      media: Array[Byte],
      srcW: Int,
      srcH: Int,
      dstW: Int,
      dstH: Int): Array[Byte] = {
    val out = new Array[Byte](dstW * dstH)
    if (media.length == 0) return out
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * srcH / dstH).toInt
      var x = 0
      while (x < dstW) {
        val sx = (x.toLong * srcW / dstW).toInt
        out(y * dstW + x) = media(((sy * srcW + sx) % media.length + media.length) % media.length)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- partition-wise batched operators -----------------------------------

  /** Partition-wise batched resize: real bilinear for decodable images
    * (dims read from the decoded raster — pixels beat metadata), stub grid
    * sampling otherwise; in BOTH paths the emitted envelope's payload AND
    * metadata reflect the target dimensions — the metadata propagation is
    * the part a real pipeline gets wrong most often (a resized image whose
    * meta still claims the source dims poisons every downstream consumer).
    */
  def resize(media: Dataset[MediaRecord], dstW: Int, dstH: Int, batchSize: Int = 64)
      : Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    media.mapPartitions { rows =>
      val codecHandle = new Object // per-partition init (≡ decoder context)
      rows.grouped(batchSize).flatMap { batch =>
        require(codecHandle != null)
        batch.iterator.map { r =>
          val resized = resizeImage(r.media, dstW, dstH)
            .getOrElse(resizeStub(r.media, r.meta.width, r.meta.height, dstW, dstH))
          r.copy(media = resized, meta = r.meta.copy(width = dstW, height = dstH))
        }
      }
    }
  }

  /** Partition-wise batched feature extraction: real decode + luminance
    * pooling for images, byte-hash fallback for other modalities. "Model"
    * loaded once per partition, records buffered into `batchSize` groups,
    * features emitted per record — a real model swaps into the batch loop;
    * nothing else changes.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int, batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // expensive init happens HERE, once per partition (≡ DoFn.setup /
      // pandas-UDF iterator head — a model handle, a decoder context)
      val modelHandle = new Object
      rows.grouped(batchSize).flatMap { batch =>
        // batch-at-a-time: a real kernel would run one vectorized/model
        // call over the whole batch
        require(modelHandle != null)
        batch.iterator.map(r =>
          MediaFeatures(r.id, r.meta.format,
            imageFeatures(r.media, dim).getOrElse(decodeFeaturesStub(r.media, dim))))
      }
    }
  }

  /** Partition-wise batched decode statistics over REAL images: decoded
    * width/height + band-0 sample sum. Rows whose payload is not a
    * decodable image are DROPPED (stats over fake bytes are noise, not
    * data) — callers running mixed tables filter by `meta.format` first.
    */
  def decodeStats(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaStats] = {
    implicit val enc = Encoders.product[MediaStats]
    media.mapPartitions { rows =>
      val codecHandle = new Object
      rows.grouped(batchSize).flatMap { batch =>
        require(codecHandle != null)
        batch.iterator.flatMap { r =>
          decodeImage(r.media).map { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            val s = new Array[Int](w * h)
            img.getRaster.getSamples(0, 0, w, h, 0, s)
            var sum = 0L
            var i = 0
            while (i < s.length) { sum += s(i); i += 1 }
            MediaStats(r.id, w, h, sum)
          }
        }
      }
    }
  }

  /** Typed view over the synthetic media frame. */
  def asRecords(media: DataFrame): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    media.as[MediaRecord]
  }
}
