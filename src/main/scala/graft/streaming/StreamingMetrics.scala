package graft.streaming

import graft.model.MetricDefinition
import graft.pipeline.LogsToMetrics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming face of the engine — the reference's native mode
  * (an unbounded Pub/Sub stream windowed into metric points,
  * /root/reference/beametrics/pipeline.py:164-186).
  *
  * Differences from the batch transform (graft.pipeline.LogsToMetrics),
  * both forced by Spark's streaming model:
  *  - Windows use `window(ts, size)` instead of the integer epoch-floor
  *    math: Spark's watermark/event-time tag propagates only through the
  *    built-in window function, and its bucketing is the identical
  *    epoch-floor (TimeWindow start = ts - (ts - offset) % size).
  *  - One streaming aggregation per DISTINCT window size (window size must
  *    be a plan-time literal per aggregation). Configs sharing a size share
  *    one single-pass fan-out aggregation, exactly like the batch path.
  *
  * Late-data policy: the reference drops late records (Beam default,
  * allowed lateness 0 — SURVEY.md §2.3); `watermarkDelay = "0 seconds"`
  * reproduces that, and is configurable for real deployments.
  *
  * Scale: each query is scan → fan-out explode → partial agg → shuffle by
  * (metric, labels, window) → stateful final agg; state per key-window is
  * evicted at watermark — bounded by live windows × label cardinality.
  */
object StreamingMetrics {

  /** Attach the metric pipeline to a streaming DataFrame. Returns one
    * streaming DataFrame per distinct window size (start each with
    * `writeStream`; append mode emits exactly one point per closed window,
    * matching the reference's emit-on-window-close).
    */
  def attach(
      stream: DataFrame,
      defs: Seq[MetricDefinition],
      mode: LogsToMetrics.Mode,
      tsCol: String = "ts",
      watermarkDelay: String = "0 seconds"): Seq[DataFrame] = {
    require(defs.nonEmpty, "at least one metric definition")
    defs.groupBy(_.effectiveWindowSizeSec).toSeq.sortBy(_._1).map { case (wsize, group) =>
      attachUniform(stream, group, wsize, mode, tsCol, watermarkDelay)
    }
  }

  /** Single-window-size variant: one scan, one shuffle, N configs. The
    * fan-out itself is LogsToMetrics.fanOutExplode — identical semantics to
    * the batch path by construction.
    */
  private def attachUniform(
      stream: DataFrame,
      defs: Seq[MetricDefinition],
      wsize: Long,
      mode: LogsToMetrics.Mode,
      tsCol: String,
      watermarkDelay: String): DataFrame = {
    val pp = LogsToMetrics.pctlPlan(defs)
    val aggs = LogsToMetrics.aggValues(pp)
    // Normalize TIMESTAMP_NTZ BEFORE the watermark: Spark rejects NTZ
    // watermark columns outright ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]),
    // so fanOutExplode's own NTZ branch can never fire on this path.
    val tsNorm = stream.schema.fields.find(_.name == tsCol).map(_.dataType.typeName) match {
      case Some("timestamp_ntz") => stream.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _                     => stream
    }
    LogsToMetrics
      .fanOutExplode(
        tsNorm.withWatermark(tsCol, watermarkDelay),
        defs,
        mode,
        tsCol,
        withWsize = false)
      .groupBy(window(col("_ts"), s"$wsize seconds"), col("metric"), col("kind"), col("labels"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        col("metric"),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        map_from_entries(col("labels")).as("labels"),
        LogsToMetrics.finalValue(pp).as("value"))
  }
}
