package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column support for training-data pipelines (north-star EXT):
  * image/audio/video travel as opaque `binary` columns with typed metadata;
  * decode / feature-extraction is partition-wise batched compute.
  *
  * The actual media codecs are NOT in this container, so the decode kernels
  * here are clearly-marked DETERMINISTIC STUBS — but every piece of Spark
  * plumbing a real implementation needs is real and tested:
  *  - the envelope schema (`media binary`, `meta struct<…>`),
  *  - column-level header parsing / frame slicing (binary substr — stays in
  *    codegen, no UDF),
  *  - the partition-wise batched-inference shape via `mapPartitions`:
  *    expensive init (a model) once per PARTITION, records processed in
  *    fixed-size batches — the JVM analog of pandas-batch UDFs, and the
  *    layout that keeps GPU/model amortization at 1000-executor scale,
  *  - explicit `repartition` control so batch compute parallelism is
  *    decoupled from upstream file splits.
  */
object Multimodal {

  /** Typed media envelope. */
  final case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRecord(id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(id: Long, format: String, features: Array[Float])

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

  /** STUB decode kernel — deterministic stand-in for a real image/audio
    * decoder (`???` boundary: replace the body, keep the signature). Maps
    * payload bytes to a dim-length float feature vector.
    */
  def decodeFeaturesStub(media: Array[Byte], dim: Int): Array[Float] = {
    // real impl: decode → resize → model forward pass
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

  /** STUB resize kernel — deterministic nearest-neighbor stand-in for a
    * real image resize (`???` boundary: replace the body, keep the
    * signature). Treats the payload as a row-major srcW×srcH byte grid
    * (clipped to the available bytes) and samples it at dstW×dstH.
    */
  def resizeStub(
      media: Array[Byte],
      srcW: Int,
      srcH: Int,
      dstW: Int,
      dstH: Int): Array[Byte] = {
    // real impl: decode → interpolating resample → re-encode
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

  /** Partition-wise batched resize: same plumbing shape as
    * [[extractFeatures]] (per-partition init, fixed-size batches), emitting
    * a new envelope whose payload AND metadata reflect the target
    * dimensions — the metadata propagation is the part a real pipeline gets
    * wrong most often (a resized image whose meta still claims the source
    * dims poisons every downstream consumer).
    */
  def resize(media: Dataset[MediaRecord], dstW: Int, dstH: Int, batchSize: Int = 64)
      : Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    media.mapPartitions { rows =>
      val codecHandle = new Object // per-partition init (≡ decoder context)
      rows.grouped(batchSize).flatMap { batch =>
        require(codecHandle != null)
        batch.iterator.map(r =>
          r.copy(
            media = resizeStub(r.media, r.meta.width, r.meta.height, dstW, dstH),
            meta = r.meta.copy(width = dstW, height = dstH)))
      }
    }
  }

  /** Partition-wise batched feature extraction — the real plumbing around
    * the stub kernel: "model" loaded once per partition, records buffered
    * into `batchSize` groups, features emitted per record. A real
    * implementation swaps [[decodeFeaturesStub]] for a codec+model call;
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
          MediaFeatures(r.id, r.meta.format, decodeFeaturesStub(r.media, dim)))
      }
    }
  }

  /** Typed view over the synthetic media frame. */
  def asRecords(media: DataFrame): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    media.as[MediaRecord]
  }
}
