package graft

import graft.model.{FilterCondition, MetricDefinition, MetricType}
import graft.pipeline.LogsToMetrics
import graft.streaming.StreamingMetrics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-throughput micro-bench: a saturating rate source shaped into
  * the events schema, run through the FULL metric pipeline
  * ([[StreamingMetrics.attach]]: fan-out explode → filters → windowed
  * stateful agg) to a noop sink. Prints ONE JSON line:
  * `{"metric":"stream_events_per_sec","value":N,...}`.
  *
  * Method: the `rate-micro-batch` source hands every trigger a fixed
  * `rowsPerBatch` and the query runs batches back-to-back (trigger 0), so
  * each batch is full-throttle regardless of wall-clock demand (the plain
  * `rate` source is wrong for this: any processing lag folds the whole
  * backlog into the next batch, which then never finishes). Reported
  * number = processed rows / elapsed over the steady-state span (first
  * `warmupSecs` dropped — early batches pay codegen + state-store init).
  * Source event time advances 1 s per batch, so 60 s windows close and
  * emit continuously through the run — state stays bounded and the
  * stateful-emit path is part of what's measured.
  *
  * Knobs (env): SPARK_GRAFT_STREAM_SECS (run length, default 30),
  * SPARK_GRAFT_STREAM_BATCH (rows per micro-batch, default 8M — small
  * batches measure per-batch fixed cost, not throughput: 2M batches
  * measured 0.43M rows/s where 8M measured 3.96M on the same host),
  * SPARK_GRAFT_CPUS (cores, default all).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val runSecs = scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "30").toInt)
      .getOrElse(30)
    val warmupSecs = 8
    // Shuffle partitions double as the STATE partition count (fixed at
    // first start). The map-side partial agg does the corpus work on
    // `cpus` input partitions regardless; the final agg sees only
    // (window × metric × label) groups — so state partitions track STATE
    // volume, not core count (the r13 replay lesson, promoted from env
    // knob to the computed default in round 15 after the r14 band probe:
    // 8 → 2.63M ev/s reduce-parallelism-bound, 16 → 6.47M, 32 (= cores,
    // the former default) → 3.56M commit-fan-out-taxed, 64 → 2.61M
    // commit-bound). Two terms: 2× the open-state group count (3 metrics
    // × ~2 un-closed 60 s windows under the 5 s watermark) floors state
    // parallelism; cores/2 keeps the final-agg reduce wide enough while
    // halving the per-batch delta-file commit fan-out that taxed the
    // cores default. SPARK_GRAFT_STREAM_STATE_PARTITIONS still overrides
    // for band probes.
    val openStateGroups = 3 * 2
    val autoStateParts = math.max(2 * openStateGroups, cpus.toInt / 2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_STATE_PARTITIONS", autoStateParts.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val statePartsUsed = spark.conf.get("spark.sql.shuffle.partitions")

    // rate source shaped into the events contract (same columns the batch
    // queries read); modulo fan-out gives realistic filter selectivity and
    // label cardinality without any data dependency
    val rate = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCH", "8000000").toLong)
      .option("advanceMillisPerBatch", 1000L)
      .option("numPartitions", cpus)
      .load()
      .select(
        col("timestamp").as("ts"),
        (col("value") % 1000L).cast("string").as("user_id"),
        element_at(
          array(lit("view"), lit("click"), lit("error")),
          (col("value") % 3 + 1).cast("int")).as("event_type"),
        (col("value") % 100L).cast("double").as("value"))

    val defs = Seq(
      MetricDefinition("ev_count", MetricType.Count, windowSizeSec = 60),
      MetricDefinition(
        "click_sum",
        MetricType.Sum("value"),
        Seq(FilterCondition("event_type", "click", "equals")),
        windowSizeSec = 60),
      MetricDefinition(
        "err_count",
        MetricType.Count,
        Seq(FilterCondition("event_type", "error", "equals")),
        windowSizeSec = 60))

    val out = StreamingMetrics
      .attach(rate, defs, LogsToMetrics.Typed(rate.schema), watermarkDelay = "5 seconds")
      .head
    val ckpt = java.nio.file.Files.createTempDirectory("graft-streambench").toString
    val q = out.writeStream
      .format("noop")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0L)) // back-to-back full batches
      .start()
    Thread.sleep(runSecs * 1000L)
    val progress = q.recentProgress.toSeq
    q.stop()
    spark.stop()

    // steady-state span: drop the JIT/state-init head, rows/elapsed over
    // the rest (timestamps are ISO-8601 UTC trigger-START times). The
    // span last-minus-first covers the processing of the first N-1
    // batches only, so the LAST batch's rows are excluded from the
    // numerator too — counting them against a span that never includes
    // their processing time inflated the rate ~N/(N-1) (~4.5% at the 23
    // batches of the round-6 record).
    def ms(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli
    val t0 = progress.headOption.map(p => ms(p.timestamp)).getOrElse(0L)
    val steady = progress.filter(p => ms(p.timestamp) >= t0 + warmupSecs * 1000L)
    val counted = steady.dropRight(1)
    val rows = counted.map(_.numInputRows).sum
    val span = (steady.lastOption.map(p => ms(p.timestamp)).getOrElse(t0) -
      steady.headOption.map(p => ms(p.timestamp)).getOrElse(t0)) / 1000.0
    val eps = if (span > 0) rows / span else 0.0
    // state-store commit share of batch capacity (the r13 lesson:
    // per-batch delta-file commits, not data volume, set the replay
    // walls — this reports the same quantity for the capacity path).
    // commitTimeMs is TASK time summed across all state partitions, so
    // it is normalized against add_batch_ms × cores (the batch's total
    // task-time capacity): share = what fraction of the cluster's time
    // during addBatch went to state-store commits.
    val commitMs = counted.flatMap(_.stateOperators.map(_.commitTimeMs)).sum
    val addBatchMs = counted
      .flatMap(p => Option(p.durationMs.get("addBatch")).map(_.longValue)).sum
    val capacityMs = addBatchMs * cpus.toLong
    val commitShare =
      if (capacityMs > 0) math.round(1000.0 * commitMs / capacityMs) / 1000.0 else 0.0
    println(
      s"""{"metric":"stream_events_per_sec","value":${eps.toLong},"unit":"rows/sec",""" +
        s""""batches":${counted.size},"rows":$rows,"span_sec":$span,"cpus":$cpus,""" +
        s""""state_partitions":$statePartsUsed,""" +
        s""""state_commit_taskms":$commitMs,"add_batch_ms":$addBatchMs,""" +
        s""""state_commit_share_of_capacity":$commitShare}""")
  }
}
