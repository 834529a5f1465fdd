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

  /** Trending terms through the SpaceSaving sketch
    * ([[graft.functions.SpaceSavingTopK]]): per-window top-k with state
    * BOUNDED BY `cap` COUNTERS PER OPEN WINDOW — where
    * [[windowedTokenCounts]] keeps one state row per (window, token) and
    * its store grows with the live vocabulary, this keeps ≤ cap counters
    * per window no matter how wide the token stream runs (the adversarial
    * 100 TB case: crawl spam injecting unbounded fresh tokens). The trade
    * is SpaceSaving's overcount bound — `true ≤ est ≤ true + err` per
    * emitted row, any term with true count > N/cap guaranteed present —
    * which StreamingTextSpec pins against the exact counts. Emission on
    * window close (append mode), one sketch merge per micro-batch.
    */
  def trendingTermsSketch(
      stream: DataFrame,
      textCol: String,
      tsCol: String = "ts",
      windowDuration: String = "60 seconds",
      watermarkDelay: String = "0 seconds",
      k: Int = 10,
      cap: Int = 200): DataFrame = {
    graft.functions.GraftFunctions.register(stream.sparkSession)
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(window(col(tsCol), windowDuration))
      .agg(call_function("graft_topk", col("token"), lit(k), lit(cap)).as("top"))
      .select(col("window.start").as("w_start"),
        posexplode(col("top")).as(Seq("rank0", "e")))
      .select(col("w_start"), (col("rank0") + 1).as("rank"),
        col("e.item").as("token"), col("e.est").as("est"), col("e.err").as("err"))
  }
}
