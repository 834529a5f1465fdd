package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared multimodal queries + DuckDB oracles. The text-payload media
  * table is synthesized deterministically from `documents` (see
  * [[Multimodal.syntheticMedia]]); the ORACLE recomputes the same synthesis
  * in SQL, so the binary plumbing (payload bytes, header-derived metadata,
  * frame slicing) is end-to-end checked. `q_media_decode` goes further: its
  * payloads are REAL PNGs (ImageIO-encoded from a closed-form pixel
  * formula), the engine really decodes them, and the oracle recomputes the
  * decoded-pixel statistics from the formula — a cross-engine check on an
  * actual image codec path.
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-format media stats over the typed envelope: count, payload bytes,
    // distinct widths — the metadata-pushdown shape (no payload decode).
    "q_media_stats" -> { (s, dir) =>
      Multimodal
        .syntheticMedia(Tables.documents(s, dir))
        .groupBy(col("meta.format").as("format"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(length(col("media"))).as("total_bytes"),
          count_distinct(col("meta.width")).as("widths"))
        .orderBy("format")
    },

    // Frame sampling: 4 binary slices per payload, fingerprinted — the
    // explode-before-extract fan-out, fully codegen (binary substr + md5).
    "q_media_frames" -> { (s, dir) =>
      Multimodal
        .sampleFrames(Multimodal.syntheticMedia(Tables.documents(s, dir)), 4)
        .select(col("id"), col("frame_idx"), md5(col("frame")).as("frame_md5"))
        .orderBy("id", "frame_idx")
    },

    // Batched resize through the mapPartitions kernel path (per-partition
    // init, fixed-size batches) with METADATA PROPAGATION — the oracle
    // recomputes the deterministic nearest-neighbor sampling in SQL, so
    // the whole typed Dataset → kernel → envelope round-trip is
    // hash-checked, not just row-counted.
    "q_media_resize" -> { (s, dir) =>
      val media = Multimodal
        .syntheticMedia(Tables.documents(s, dir))
        .filter(length(col("media")) > 0)
      Multimodal
        .resize(Multimodal.asRecords(media), dstW = 8, dstH = 8)
        .select(col("id"), col("meta.width").as("width"), col("meta.height").as("height"),
          md5(col("media")).as("resized_md5"))
        .orderBy("id")
    },

    // REAL image decode, end-to-end: one grayscale PNG per document
    // (ImageIO-encoded, pixel(x,y) = (doc_id*31 + y*16 + x*7) mod 256),
    // decoded back through ImageIO in the batched mapPartitions kernel;
    // the oracle recomputes width/height/pixel-sum from the closed form.
    // A stub kernel CANNOT pass this — only a working codec returns the
    // true raster dims and sample sum.
    "q_media_decode" -> { (s, dir) =>
      Multimodal
        .decodeStats(Multimodal.syntheticPngMedia(Tables.documents(s, dir)))
        .select(col("id"), col("width"), col("height"), col("pixelSum").as("pixel_sum"))
        .orderBy("id")
    },

    // REAL feature extraction over the same PNGs: decode → luminance →
    // mean-pool into 4 buckets. Emitted floor-quantized at 1e-6 after the
    // float round — the oracle replicates the exact arithmetic chain
    // (integer sums → double divides → REAL round → quantize), so the
    // pooled features are hash-checked, not just shaped.
    "q_media_features" -> { (s, dir) =>
      Multimodal
        .extractFeatures(Multimodal.syntheticPngMedia(Tables.documents(s, dir)), dim = 4)
        .select(col("id"), posexplode(col("features")).as(Seq("dim", "f")))
        .select(col("id"), col("dim"),
          floor(col("f").cast("double") * 1e6).cast("long").as("f_q6"))
        .orderBy("id", "dim")
    },

    // REAL audio decode: one PCM-16 mono WAV per document (RIFF container
    // written AND parsed by javax.sound.sampled, sample(k) =
    // (doc_id*37 + k*11) mod 2003 - 1001), decoded back to signed samples
    // in the batched kernel; the oracle recomputes count/rate/sum from
    // the closed form — the audio analog of q_media_decode.
    "q_media_audio" -> { (s, dir) =>
      Multimodal
        .audioStats(Multimodal.syntheticWavMedia(Tables.documents(s, dir)))
        .select(col("id"), col("nSamples").as("n_samples"),
          col("sampleRate").as("sample_rate"), col("sampleSum").as("sample_sum"))
        .orderBy("id")
    },

    // REAL audio RESAMPLING over the same WAVs ([[Multimodal.audioResample]],
    // 8000 → 3000 Hz = num 3 / den 8): linear interpolation kept EXACT by
    // emitting ×3-scaled integers (s[p]·(3−r) + s[p+1]·r), so the oracle
    // recomputes count/sum/first/last closed-form — the rate-normalization
    // stage every speech corpus runs before featurization.
    "q_media_audio_resample" -> { (s, dir) =>
      Multimodal
        .audioResample(Multimodal.syntheticWavMedia(Tables.documents(s, dir)), num = 3, den = 8)
        .select(col("id"), col("nIn").as("n_in"), col("nOut").as("n_out"),
          col("outSumM").as("sum_x3"), col("outFirstM").as("first_x3"),
          col("outLastM").as("last_x3"))
        .orderBy("id")
    },

    // REAL audio FEATURE extraction over the same WAVs: decode → split
    // into non-overlapping 32-sample frames → per-frame energy (Σ s²)
    // and zero-crossing count — the loudness / voiced-unvoiced gates an
    // audio curation pass filters on. Both features are integers from
    // the closed-form samples, so the oracle recomputes them exactly.
    "q_media_audio_frames" -> { (s, dir) =>
      Multimodal
        .audioFrameFeatures(Multimodal.syntheticWavMedia(Tables.documents(s, dir)))
        .select(col("id"), col("frameIdx").as("frame_idx"),
          col("nSamples").as("n_samples"), col("energy"),
          col("zeroCrossings").as("zero_crossings"))
        .orderBy("id", "frame_idx")
    },

    // REAL video container metadata: alternating hand-built MP4 (ftyp +
    // moov/mvhd/tkhd) and RIFF-AVI (hdrl/avih) headers per document, parsed
    // back by the byte-level box/chunk walkers — the pre-decode ingest gate
    // a curation pipeline runs on every video. Dims/duration/frame-count
    // are closed-form in doc_id, so the oracle recomputes what the parser
    // must extract; a parser that misreads any offset fails the hash.
    // (Pixel decode stays behind the documented stub — no JDK video codec
    // exists; the container math is the real, testable part.)
    "q_media_video_meta" -> { (s, dir) =>
      Multimodal
        .videoMeta(Multimodal.syntheticVideoMedia(Tables.documents(s, dir)))
        .select(col("id"), col("container"), col("width"), col("height"),
          col("durationMs").as("duration_ms"), col("nFrames").as("n_frames"))
        .orderBy("id")
    },

    // REAL video PIXEL decode: one MJPEG AVI per document (per-frame solid
    // gray baseline JPEGs inside a RIFF movi list — the one video codec the
    // stock JRE decodes), walked + frame-decoded through ImageIO in the
    // batched kernel. Dims come from the decoded RASTER and the mean gray
    // is snapped to the generator's 16-grid (mid-bucket levels: the ≤1-level
    // JPEG round-trip error can't cross a bucket edge), so the oracle
    // recomputes everything closed-form in doc_id — a stub, or a decoder
    // that misreads the bitstream, cannot hash-match.
    "q_media_video_frame" -> { (s, dir) =>
      Multimodal
        .decodeVideoFrames(Multimodal.syntheticMjpegMedia(Tables.documents(s, dir)))
        .select(col("id"), col("frameIdx").as("frame_idx"), col("width"), col("height"),
          col("lumaQ").as("luma_q"))
        .orderBy("id", "frame_idx")
    },

    // Scene-cut detection over DECODED video frames: a cut is a
    // luminance jump ≥ 100 between adjacent frames — the frame-sampling
    // primitive a video-training pipeline uses to pick one keyframe per
    // shot instead of near-identical neighbors. Composes the real MJPEG
    // pixel decode with one per-video lag window (frames of one video
    // co-reside by construction, so the window never crosses executors at
    // any corpus size). Oracle recomputes lumas closed-form from the
    // synthetic generator and applies the identical lag.
    "q_media_scene_cuts" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("id").orderBy("frame_idx")
      Multimodal
        .decodeVideoFrames(Multimodal.syntheticMjpegMedia(Tables.documents(s, dir)))
        .select(col("id"), col("frameIdx").as("frame_idx"), col("lumaQ").as("luma_q"))
        .withColumn("prev_luma", lag(col("luma_q"), 1).over(w))
        .filter(col("prev_luma").isNotNull)
        .withColumn("delta", abs(col("luma_q") - col("prev_luma")))
        .filter(col("delta") >= 100)
        .select(col("id"), col("frame_idx"), col("prev_luma"), col("luma_q"), col("delta"))
        .orderBy("id", "frame_idx")
    },

    // Image near-dup via perceptual dHash ([[Multimodal.imageDHash]]): real
    // PNG decode → 16-bucket luminance pooling → adjacent-bucket comparison
    // bits (integer cross-multiplication, no float divide — every bit
    // oracle-exact), then a window over the hash turns fingerprints into
    // dup-bucket sizes: the image analog of exact text dedup, one
    // hash-keyed exchange over |images| rows. The oracle recomputes hash
    // bits closed-form from the pixel formula.
    "q_media_dhash" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Multimodal
        .perceptualHash(Multimodal.syntheticPngMedia(Tables.documents(s, dir)), dim = 16)
        .toDF
        .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy(col("dhash"))))
        .select(col("id"), col("dhash"), col("bucket_n"))
        .orderBy("id")
    },

    // Paired (text, image) training-sample table — the CLIP-style
    // alignment artifact: caption-side token counts joined to REAL
    // decoded image statistics on the sample key, with the integer mean
    // luma and a tokens-per-kilopixel density the pairing QA filters on.
    // One doc-keyed equi-join of two map-only arms.
    "q_media_text_pairs" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val txt = d.select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      val img = Multimodal.decodeStats(Multimodal.syntheticPngMedia(d)).toDF
        .select(col("id").as("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("pixelSum").as("pixel_sum"))
      txt.join(img, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("width"), col("height"),
          col("pixel_sum"),
          expr("pixel_sum DIV (width * height)").as("mean_luma"),
          expr("n_tokens * 1000 DIV (width * height)").as("tok_per_kpx_q3"))
        .orderBy("doc_id")
    },

    // ViT-style 4×4 patch grid over REAL decoded PNGs
    // ([[Multimodal.imagePatches]]): per patch the exact integer
    // (pixel count, luma sum) plus the truncating mean — pooling runs
    // inside the batched decode kernel, so per-pixel rows never hit
    // Spark and the output is |images|·patches rows. Oracle recomputes
    // the pooling closed-form from the pixel generator.
    "q_media_patches" -> { (s, dir) =>
      Multimodal
        .imagePatches(Multimodal.syntheticPngMedia(Tables.documents(s, dir)), pw = 4, ph = 4)
        .toDF
        .select(col("id"), col("pr"), col("pc"), col("nPix").as("n_pix"),
          col("lumaSum").as("luma_sum"),
          expr("lumaSum DIV nPix").as("mean_q"))
        .orderBy("id", "pr", "pc")
    }
  )

  private val Media = "encode(text)" // DuckDB: VARCHAR → BLOB (UTF-8)
  private val Fmt = "['img','aud','vid'][(doc_id % 3 + 1)::INT]"

  def oracleSql: Map[String, String] = Map(
    "q_media_stats" -> (s"SELECT $Fmt AS format, count(*) AS cnt, " +
      // CAST: DuckDB sum(BIGINT)→HUGEINT→pandas float64 hash artifact
      s"CAST(sum(octet_length($Media)) AS BIGINT) AS total_bytes, " +
      "count(DISTINCT 64 + doc_id % 192) AS widths " +
      "FROM documents GROUP BY 1 ORDER BY 1"),
    // DuckDB substring() has no BLOB overload; the payload is ASCII text,
    // so byte-slicing the blob ≡ char-slicing the VARCHAR (md5 hashes the
    // same bytes either way). PRECONDITION: this equivalence breaks for
    // multi-byte UTF-8 documents (engine slices bytes, oracle slices
    // chars) — fine for the driver's [a-z ] corpus; a non-ASCII fixture
    // would need the oracle dropped to a rows-only check.
    "q_media_frames" -> ("WITH f AS (SELECT doc_id AS id, i AS frame_idx, " +
      "substring(text, i * (length(text) // 4) + 1, length(text) // 4) AS frame " +
      "FROM documents CROSS JOIN generate_series(0, 3) AS g(i)) " +
      "SELECT id, frame_idx, md5(frame) AS frame_md5 FROM f " +
      "WHERE length(frame) > 0 ORDER BY id, frame_idx"),
    // the resize stub's nearest-neighbor sampling, recomputed in SQL:
    // dst pixel (y,x) reads src byte ((y*srcH//8)*srcW + (x*srcW//8)) mod
    // len, row-major; same ASCII byte≡char precondition as q_media_frames
    "q_media_resize" -> ("SELECT doc_id AS id, 8 AS width, 8 AS height, " +
      "md5(list_reduce(list_transform(generate_series(0, 63), i -> " +
      "substring(text, ((((i // 8) * (64 + doc_id % 128)) // 8) * (64 + doc_id % 192) + " +
      "(((i % 8) * (64 + doc_id % 192)) // 8)) % length(text) + 1, 1)), " +
      "(a, b) -> a || b)) AS resized_md5 " +
      "FROM documents WHERE length(text) > 0 ORDER BY id"),
    // decoded dims = the generated dims; band-0 sample sum = the closed
    // form summed over the w*h grid (row-major i: y = i // w, x = i % w)
    "q_media_decode" -> ("SELECT doc_id AS id, " +
      "CAST(8 + doc_id % 9 AS INTEGER) AS width, " +
      "CAST(8 + doc_id % 7 AS INTEGER) AS height, " +
      "CAST(list_sum(list_transform(" +
      "generate_series(0, (8 + doc_id % 9) * (8 + doc_id % 7) - 1), " +
      "i -> (doc_id * 31 + (i // (8 + doc_id % 9)) * 16 + (i % (8 + doc_id % 9)) * 7) % 256" +
      ")) AS BIGINT) AS pixel_sum " +
      "FROM documents ORDER BY id"),
    // pooled means recomputed exactly: integer bucket sums/counts over the
    // closed-form pixels, the engine's double-divide chain (sum/cnt/255),
    // REAL cast replicating the JVM's float round, then the 1e-6 quantize
    "q_media_features" -> ("WITH g AS (SELECT doc_id, 8 + doc_id % 9 AS w, " +
      "(8 + doc_id % 9) * (8 + doc_id % 7) AS npix FROM documents), " +
      "fb AS (SELECT doc_id, b, " +
      "list_sum(list_transform(list_filter(generate_series(0, npix - 1), " +
      "i -> i * 4 // npix = b), " +
      "i -> (doc_id * 31 + (i // w) * 16 + (i % w) * 7) % 256)) AS s, " +
      "len(list_filter(generate_series(0, npix - 1), i -> i * 4 // npix = b)) AS c " +
      "FROM g, unnest([0, 1, 2, 3]) AS u(b)) " +
      "SELECT doc_id AS id, CAST(b AS INTEGER) AS dim, " +
      "CAST(floor(CAST(CAST(CAST(s AS DOUBLE) / c / 255.0 AS REAL) AS DOUBLE) * 1000000) " +
      "AS BIGINT) AS f_q6 " +
      "FROM fb ORDER BY id, dim"),
    // decoded sample count/rate = the generated ones; signed-sample sum =
    // the closed form over k in [0, n)
    "q_media_audio" -> ("SELECT doc_id AS id, " +
      "CAST(64 + doc_id % 64 AS INTEGER) AS n_samples, " +
      "8000 AS sample_rate, " +
      "CAST(list_sum(list_transform(generate_series(0, 64 + doc_id % 64 - 1), " +
      "k -> (doc_id * 37 + k * 11) % 2003 - 1001)) AS BIGINT) AS sample_sum " +
      "FROM documents ORDER BY id"),
    // ×3-scaled linear interpolation recomputed closed-form: p = j·8 div 3,
    // r = j·8 mod 3, out3 = s(p)·(3−r) + s(p+1)·r over the synthetic
    // sample formula; nOut = (n−1)·3 div 8 + 1
    "q_media_audio_resample" -> ("WITH d AS (SELECT doc_id, " +
      "CAST(64 + doc_id % 64 AS INTEGER) AS n FROM documents), " +
      "o AS (SELECT doc_id, n, CAST((n - 1) * 3 // 8 + 1 AS INTEGER) AS n_out FROM d), " +
      "v AS (SELECT doc_id, n, n_out, " +
      "list_transform(generate_series(0, n_out - 1), j -> CASE WHEN (j * 8) % 3 = 0 " +
      "THEN ((doc_id * 37 + ((j * 8) // 3) * 11) % 2003 - 1001) * 3 " +
      "ELSE ((doc_id * 37 + ((j * 8) // 3) * 11) % 2003 - 1001) * (3 - (j * 8) % 3) " +
      "+ ((doc_id * 37 + ((j * 8) // 3 + 1) * 11) % 2003 - 1001) * ((j * 8) % 3) END) " +
      "AS outs FROM o) " +
      "SELECT doc_id AS id, n AS n_in, n_out, " +
      "CAST(list_sum(outs) AS BIGINT) AS sum_x3, " +
      "CAST(outs[1] AS BIGINT) AS first_x3, CAST(outs[n_out] AS BIGINT) AS last_x3 " +
      "FROM v ORDER BY id"),
    // per-frame energy and zero crossings recomputed closed-form over
    // each frame's sample range; the zero-crossing series starts at
    // frame_start+1 (a crossing needs an in-frame predecessor) and
    // COALESCEs to 0 for single-sample tail frames; uncorrelated
    // generate_series + filter = the binder-legal frame fan-out
    "q_media_audio_frames" -> ("SELECT doc_id AS id, CAST(f AS INTEGER) AS frame_idx, " +
      "CAST(least((f + 1) * 32, 64 + doc_id % 64) - f * 32 AS INTEGER) AS n_samples, " +
      "CAST(list_sum(list_transform(" +
      "generate_series(f * 32, least((f + 1) * 32, 64 + doc_id % 64) - 1), " +
      "k -> ((doc_id * 37 + k * 11) % 2003 - 1001) * ((doc_id * 37 + k * 11) % 2003 - 1001)" +
      ")) AS BIGINT) AS energy, " +
      "CAST(coalesce(list_sum(list_transform(" +
      "generate_series(f * 32 + 1, least((f + 1) * 32, 64 + doc_id % 64) - 1), " +
      "k -> CASE WHEN ((doc_id * 37 + (k - 1) * 11) % 2003 - 1001 < 0) != " +
      "((doc_id * 37 + k * 11) % 2003 - 1001 < 0) THEN 1 ELSE 0 END)), 0) AS BIGINT) " +
      "AS zero_crossings " +
      "FROM documents CROSS JOIN generate_series(0, 3) AS g(f) " +
      "WHERE f * 32 < 64 + doc_id % 64 " +
      "ORDER BY id, frame_idx"),
    // parsed container metadata = the generated closed form; MP4 duration
    // units are written at timescale 1000 (duration*1000/1000 = units) and
    // carry no frame count (n_frames 0); AVI duration is the integer-µs
    // frame period times the frame count, floor-divided to ms exactly as
    // the parser's Long division does
    "q_media_video_meta" -> ("SELECT doc_id AS id, " +
      "CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container, " +
      "CAST(160 + doc_id % 320 AS INTEGER) AS width, " +
      "CAST(120 + doc_id % 240 AS INTEGER) AS height, " +
      "CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id % 9000) + 1000 " +
      "ELSE (33333 * ((doc_id % 240) + 24)) // 1000 END AS BIGINT) AS duration_ms, " +
      "CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE (doc_id % 240) + 24 END AS BIGINT) " +
      "AS n_frames FROM documents ORDER BY id"),
    // decoded raster dims and per-frame quantized gray = the generator's
    // closed form. DuckDB rejects a correlated generate_series argument
    // ("lateral join column parameters"), so the series is uncorrelated to
    // the max frame count (1 + 3 = 4 ⇒ upper bound 3) and filtered down to
    // each document's own count — same rows, binder-legal.
    "q_media_video_frame" -> ("SELECT doc_id AS id, CAST(f AS INTEGER) AS frame_idx, " +
      "CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS width, " +
      "CAST(16 + (doc_id % 2) * 8 AS INTEGER) AS height, " +
      "CAST(16 * (1 + (doc_id + f) % 13) + 8 AS INTEGER) AS luma_q " +
      "FROM documents CROSS JOIN generate_series(0, 3) AS g(f) " +
      "WHERE f <= 1 + doc_id % 3 " +
      "ORDER BY id, frame_idx"),
    // the q_media_video_frame closed-form lumas under the identical lag
    "q_media_scene_cuts" -> ("WITH fr AS (SELECT doc_id AS id, " +
      "CAST(f AS INTEGER) AS frame_idx, " +
      "CAST(16 * (1 + (doc_id + f) % 13) + 8 AS INTEGER) AS luma_q " +
      "FROM documents CROSS JOIN generate_series(0, 3) AS g(f) " +
      "WHERE f <= 1 + doc_id % 3), " +
      "l AS (SELECT id, frame_idx, " +
      "lag(luma_q) OVER (PARTITION BY id ORDER BY frame_idx) AS prev_luma, luma_q " +
      "FROM fr) " +
      "SELECT id, frame_idx, prev_luma, luma_q, " +
      "abs(luma_q - prev_luma) AS delta FROM l " +
      "WHERE prev_luma IS NOT NULL AND abs(luma_q - prev_luma) >= 100 " +
      "ORDER BY id, frame_idx"),
    // dHash bits recomputed closed-form: per-bucket integer sums/counts
    // over the generator's pixels (16 flat-index buckets, same pooling as
    // q_media_features), bit j from the cross-multiplied adjacent-bucket
    // compare — all integer arithmetic, so the hash is exact on both
    // sides; bucket sizes via a window over the hash
    "q_media_dhash" -> ("WITH g AS (SELECT doc_id, 8 + doc_id % 9 AS w, " +
      "(8 + doc_id % 9) * (8 + doc_id % 7) AS npix FROM documents), " +
      "fb AS (SELECT doc_id, b, " +
      "list_sum(list_transform(list_filter(generate_series(0, npix - 1), " +
      "i -> i * 16 // npix = b), " +
      "i -> (doc_id * 31 + (i // w) * 16 + (i % w) * 7) % 256)) AS s, " +
      "len(list_filter(generate_series(0, npix - 1), i -> i * 16 // npix = b)) AS c " +
      "FROM g CROSS JOIN generate_series(0, 15) AS u(b)), " +
      "agg AS (SELECT doc_id, list(s ORDER BY b) AS ss, list(c ORDER BY b) AS cs " +
      "FROM fb GROUP BY doc_id), " +
      "h AS (SELECT doc_id AS id, CAST(list_sum(list_transform(generate_series(1, 15), " +
      "j -> CASE WHEN ss[j] * cs[j + 1] > ss[j + 1] * cs[j] " +
      "THEN 1 << (j - 1) ELSE 0 END)) AS BIGINT) AS dhash FROM agg) " +
      "SELECT id, dhash, count(*) OVER (PARTITION BY dhash) AS bucket_n " +
      "FROM h ORDER BY id"),
    // the q_media_decode closed-form pixel sums joined to the token
    // counts; integer DIV density quotients
    "q_media_text_pairs" -> ("WITH img AS (SELECT doc_id, " +
      "CAST(8 + doc_id % 9 AS BIGINT) AS width, " +
      "CAST(8 + doc_id % 7 AS BIGINT) AS height, " +
      "CAST(list_sum(list_transform(" +
      "generate_series(0, (8 + doc_id % 9) * (8 + doc_id % 7) - 1), " +
      "i -> (doc_id * 31 + (i // (8 + doc_id % 9)) * 16 + (i % (8 + doc_id % 9)) * 7) % 256" +
      ")) AS BIGINT) AS pixel_sum FROM documents), " +
      "txt AS (SELECT doc_id, " +
      "CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t != '')) AS BIGINT) " +
      "AS n_tokens FROM documents) " +
      "SELECT doc_id, n_tokens, width, height, pixel_sum, " +
      "pixel_sum // (width * height) AS mean_luma, " +
      "n_tokens * 1000 // (width * height) AS tok_per_kpx_q3 " +
      "FROM txt JOIN img USING (doc_id) ORDER BY doc_id"),
    // same generator pixels pooled into the same ragged 4×4 grid
    "q_media_patches" -> ("WITH g AS (SELECT doc_id, " +
      "CAST(8 + doc_id % 9 AS BIGINT) AS w, CAST(8 + doc_id % 7 AS BIGINT) AS h " +
      "FROM documents), " +
      "px AS (SELECT doc_id, i // w AS y, i % w AS x, " +
      "(doc_id * 31 + (i // w) * 16 + (i % w) * 7) % 256 AS v " +
      "FROM (SELECT doc_id, w, unnest(generate_series(0, w * h - 1)) AS i FROM g)) " +
      "SELECT doc_id AS id, CAST(y // 4 AS INTEGER) AS pr, CAST(x // 4 AS INTEGER) AS pc, " +
      "count(*) AS n_pix, CAST(sum(v) AS BIGINT) AS luma_sum, " +
      "CAST(sum(v) AS BIGINT) // count(*) AS mean_q " +
      "FROM px GROUP BY 1, 2, 3 ORDER BY id, pr, pc")
  )
}
