package graft.streaming

import graft.ext.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
