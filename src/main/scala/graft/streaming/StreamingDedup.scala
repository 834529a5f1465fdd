package graft.streaming

import graft.ext.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming deduplication — the unbounded-corpus analog of
  * [[graft.ext.Dedup.exactGroups]] for ingest-time curation: admit the
  * first occurrence of each normalized-content fingerprint, drop repeats.
  *
  * State design (the 100 TB concern): `dropDuplicatesWithinWatermark`
  * keys state on the 16-byte md5 fingerprint ONLY — not the document —
  * and evicts each key once the watermark passes it, so state is bounded
  * by (ingest rate × watermark horizon), not corpus size. An unbounded
  * `dropDuplicates` would grow state forever; a batch-join against the
  * full historical fingerprint table is the complementary offline pass
  * (exactGroups) for cross-horizon dups.
  */
object StreamingDedup {

  /** Admit first-seen documents within the watermark horizon.
    * Emits the input columns plus the `fp` fingerprint column.
    */
  def firstSeen(
      stream: DataFrame,
      textCol: String,
      tsCol: String = "ts",
      watermarkDelay: String = "0 seconds"): DataFrame =
    stream
      .withColumn("fp", TextOps.fingerprintMd5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  final case class BandedDoc(
      band: Int,
      key: Long,
      docId: Long,
      sh: Long,
      tsSec: Long,
      ts: java.sql.Timestamp)
  final case class SeenDoc(docId: Long, sh: Long, tsSec: Long)
  final case class BucketState(docs: Seq[SeenDoc])
  final case class NearDupPair(a: Long, b: Long, hamming: Int)

  /** Streaming NEAR-duplicate candidates — the ingest-time analog of
    * [[graft.ext.Dedup.simhashPairs]]: each document's 48-bit SimHash is
    * split into `chunks` pigeonhole bands; documents sharing a (band, key)
    * bucket within `horizonSec` are exact-checked by Hamming distance and
    * emitted as pairs.
    *
    * State design: state lives per (band, key) bucket and holds only
    * (docId, fingerprint, tsSec) triples seen inside the horizon — entries
    * older than `horizonSec` relative to the newest arrival are evicted on
    * every update, and a processing-time timeout removes a bucket's whole
    * state once it has been idle for a horizon (otherwise a quiet bucket
    * would hold its last horizon's docs forever). State is therefore
    * bounded by (bucket ingest rate × horizon), never corpus size. Spark
    * shards buckets across executors by the grouping key — the same
    * equi-key partitioning the batch banded self-join shuffles on.
    *
    * Hot buckets are capped: a (band, key) bucket holding many
    * near-identical documents (boilerplate pages, templated spam) would
    * otherwise do O(|seen|) Hamming checks per arrival AND grow state
    * quadratically within the horizon. `maxBucket` bounds per-bucket
    * state to the NEWEST entries; overflow evicts oldest-first and logs
    * the dropped count — the streaming mirror of the batch path's
    * `maxDf` hot-shingle cap (recall on pathological buckets traded for
    * bounded per-row cost; such buckets are near-cliques, so the kept
    * tail still links new arrivals into the duplicate cluster).
    *
    * Caveats (documented trade-offs, both inherent to banding): a pair
    * sharing several bands is emitted once per shared band (dedup
    * downstream if exact-once pairs matter), and cross-horizon duplicates
    * are the offline pass's job, exactly as with [[firstSeen]]. The
    * per-row `simhash48` expression is fine at ingest rates; bulk
    * backfills should precompute fingerprints with the aggregation-form
    * `simhashSignatures` and feed them in.
    */
  def simhashNearDups(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String = "ts",
      maxHamming: Int = 7,
      chunks: Int = 8,
      horizonSec: Long = 3600L,
      maxBucket: Int = 256): Dataset[NearDupPair] = {
    require(48 % chunks == 0 && maxHamming < chunks,
      "pigeonhole guarantee needs maxHamming < chunks and chunks | 48")
    val w = 48 / chunks
    implicit val bdEnc = Encoders.product[BandedDoc]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[NearDupPair]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    val banded = stream
      // event-time watermark drives BOTH late-data semantics and the
      // idle-bucket timeout below — timeouts fire as data advances the
      // watermark, never from a background wall-clock batch
      .withWatermark(tsCol, s"$horizonSec seconds")
      .select(
        col(idCol).cast("long").as("docId"),
        Dedup.simhash48(TextOps.tokens(col(textCol))).as("sh"),
        unix_timestamp(col(tsCol)).as("tsSec"),
        col(tsCol).as("ts"))
      .select(
        posexplode(array((0 until chunks).map(c =>
          shiftright(col("sh"), c * w).bitwiseAND(lit((1L << w) - 1))): _*))
          .as(Seq("band", "key")),
        col("docId"), col("sh"), col("tsSec"), col("ts"))
      .select(col("band"), col("key"), col("docId"), col("sh"), col("tsSec"), col("ts"))
      .as[BandedDoc]
    val fn = (
        _: (Int, Long),
        rows: Iterator[BandedDoc],
        state: org.apache.spark.sql.streaming.GroupState[BucketState]) => {
      if (state.hasTimedOut) {
        // idle-bucket eviction: without this, a bucket that stops receiving
        // rows would hold its last horizon's docs forever (the in-line
        // filter below only runs on arrival) — state must be bounded by
        // rate × horizon even for buckets that go quiet
        state.remove()
        Iterator.empty
      } else {
        var seen = state.getOption.map(_.docs).getOrElse(Seq.empty)
        val out = Seq.newBuilder[NearDupPair]
        rows.toSeq.sortBy(d => (d.tsSec, d.docId)).foreach { d =>
          seen = seen.filter(s => d.tsSec - s.tsSec <= horizonSec)
          seen.foreach { s =>
            val ham = java.lang.Long.bitCount(s.sh ^ d.sh)
            if (s.docId != d.docId && ham <= maxHamming)
              out += NearDupPair(math.min(s.docId, d.docId), math.max(s.docId, d.docId), ham)
          }
          seen = seen :+ SeenDoc(d.docId, d.sh, d.tsSec)
          if (seen.size > maxBucket) {
            // hot-bucket cap: evict GLOBALLY oldest beyond maxBucket. Append
            // order is (tsSec, docId)-sorted only within one micro-batch — a
            // late-but-within-watermark arrival in a later batch lands after
            // newer entries — so sort before dropping the prefix; log so
            // capped recall is observable
            val dropped = seen.size - maxBucket
            seen = seen.sortBy(s => (s.tsSec, s.docId)).drop(dropped)
            System.err.println(
              s"[graft-stream-dedup] bucket over cap ($maxBucket): dropped $dropped oldest entries")
          }
        }
        state.update(BucketState(seen))
        // evict the whole bucket once the watermark passes a horizon beyond
        // its newest doc; must be strictly above the current watermark
        val maxTsMs = seen.map(_.tsSec).max * 1000L
        state.setTimeoutTimestamp(
          math.max(state.getCurrentWatermarkMs() + 1L, maxTsMs + horizonSec * 1000L))
        out.result().iterator
      }
    }
    banded
      .groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        fn)(stateEnc, outEnc)
  }
}
