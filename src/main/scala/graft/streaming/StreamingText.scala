package graft.streaming

import graft.ext.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming text analysis — the ingest-time analog of
  * [[graft.ext.TextOps.heavyHitters]]: per-window token counts over a
  * document stream (trending terms, spam-burst detection, vocabulary
  * drift monitoring).
  *
  * State design (the 100 TB-stream concern): tokens explode BEFORE the
  * windowed aggregation, so streaming state is one counter per
  * (window, token) — bounded by vocabulary × open windows, independent of
  * stream length — and evicted when the watermark closes the window.
  * Append mode emits each window's counts exactly once, on close, at
  * which point the counts are final; top-k selection/ranking belongs
  * DOWNSTREAM of the emission (ranking inside the streaming aggregation
  * would need retractions as counts grow).
  */
object StreamingText {

  /** Per-window token counts, emitted on window close (append mode).
    * `minCount` prunes the long tail at the state boundary — at scale the
    * hapax-legomena tail dominates the emitted rows, and a burst detector
    * only reads the head.
    */
  def windowedTokenCounts(
      stream: DataFrame,
      textCol: String,
      tsCol: String = "ts",
      windowDuration: String = "60 seconds",
      watermarkDelay: String = "0 seconds",
      minCount: Long = 1L): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(window(col(tsCol), windowDuration), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("window.start").as("w_start"), col("token"), col("cnt"))
}
