package graft

import graft.ingest.Ingest
import graft.model._
import graft.pipeline.LogsToMetrics
import graft.streaming.StreamingMetrics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming e2e parity: MemoryStream of raw JSON bytes → ingest →
  * StreamingMetrics (append mode, watermark 0s) must emit exactly the
  * batch LogsToMetrics result for closed windows, one point per window
  * close — the reference's Beam semantics (on-watermark firing, late data
  * dropped; SURVEY.md §2.3 Streaming).
  */
class StreamingMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val defs = Seq(
    MetricDefinition(
      "error_count",
      MetricType.Count,
      Seq(FilterCondition("severity", "ERROR", "equals")),
      windowSizeSec = 60),
    MetricDefinition(
      "bytes_sum",
      MetricType.Sum("bytes"),
      Seq(FilterCondition("severity", "ERROR", "equals")),
      windowSizeSec = 60))

  // reference fixture shapes (tests/test_pipeline.py:46,163-178)
  private def msg(sev: String, bytes: Int): String =
    s"""{"severity": "$sev", "bytes": $bytes}"""

  private def at(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)

  test("p50_approx works in streaming aggregation (summary state survives the store)") {
    // percentile_approx is a TypedImperativeAggregate — its quantile
    // summary must serialize into (and merge out of) streaming state
    // across micro-batches; this pins that the SURVEY claim holds e2e
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val typed = mem.toDF.toDF("ts", "v")
    val pdefs = Seq(
      MetricDefinition("lat_p50", MetricType.P50Approx("v"), windowSizeSec = 60))
    val Seq(out) = StreamingMetrics.attach(typed, pdefs, LogsToMetrics.Typed(typed.schema))
    val q = out.writeStream.format("memory").queryName("sp50a").outputMode("append").start()
    try {
      // window [60,120): values across TWO micro-batches → state merge
      mem.addData((at(65), 1.0), (at(70), 9.0))
      q.processAllAvailable()
      mem.addData((at(80), 5.0))
      mem.addData((at(200), 0.0)) // advance watermark, close the window
      q.processAllAvailable()
      val vals = spark.table("sp50a").select($"value").as[Double].collect()
      assert(vals.length == 1 && vals.head == 5.0,
        s"median of {1,9,5} across micro-batches must be 5.0, got ${vals.toSeq}")
    } finally q.stop()
  }

  test("TIMESTAMP_NTZ event-time streams window identically (normalized before the watermark)") {
    // Spark rejects NTZ watermark columns ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]);
    // attach must normalize BEFORE withWatermark or this start() throws
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val ntz = mem.toDF.toDF("ts", "v")
      .withColumn("ts", to_timestamp_ntz(date_format($"ts", "yyyy-MM-dd HH:mm:ss")))
    assert(ntz.schema("ts").dataType.typeName == "timestamp_ntz")
    val defs = Seq(MetricDefinition("cnt", MetricType.Count, windowSizeSec = 60))
    val Seq(out) = StreamingMetrics.attach(ntz, defs, LogsToMetrics.Typed(ntz.schema))
    val q = out.writeStream.format("memory").queryName("sntz").outputMode("append").start()
    try {
      mem.addData((at(10), 1.0), (at(20), 2.0))
      q.processAllAvailable()
      mem.addData((at(70), 3.0)) // closes [0, 60)
      q.processAllAvailable()
      val rows = spark.table("sntz")
        .select(unix_timestamp($"window_start").as("ws"), $"value")
        .as[(Long, Double)].collect().toSet
      assert(rows == Set((0L, 2.0)), s"NTZ stream must window at the same instants: $rows")
    } finally q.stop()
  }

  test("append-mode streaming windows match the batch pipeline") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Array[Byte])]
    val raw = mem.toDF.toDF("ts", "raw")
    val parsed = Ingest.parseSchemaless(raw, "raw")
    val Seq(out) = StreamingMetrics.attach(parsed, defs, LogsToMetrics.Schemaless("msg"))

    val query = out.writeStream
      .format("memory")
      .queryName("stream_parity")
      .outputMode("append")
      .start()
    try {
      // window [60,120): 2 errors (100 + 250 bytes), 1 warning (filtered)
      mem.addData(
        (at(65), msg("ERROR", 100).getBytes("UTF-8")),
        (at(80), msg("WARNING", 999).getBytes("UTF-8")),
        (at(110), msg("ERROR", 250).getBytes("UTF-8")))
      query.processAllAvailable()
      // nothing emitted yet: watermark (0s delay) still inside the window
      assert(spark.table("stream_parity").count() == 0)

      // an event in a later window advances the watermark past 120 ⇒ the
      // first window closes and emits exactly once
      mem.addData((at(200), msg("ERROR", 7).getBytes("UTF-8")))
      query.processAllAvailable()
      val emitted = spark
        .table("stream_parity")
        .select($"metric", unix_timestamp($"window_start").as("ws"), $"value")
        .as[(String, Long, Double)]
        .collect()
        .toSet
      assert(emitted == Set(("error_count", 60L, 2.0), ("bytes_sum", 60L, 350.0)))

      // late data (ts inside the closed window) is dropped, not re-emitted
      mem.addData((at(70), msg("ERROR", 999).getBytes("UTF-8")))
      query.processAllAvailable()
      assert(spark.table("stream_parity").count() == 2)
    } finally query.stop()

    // batch path over the same non-late records produces the same points
    val batchIn = Ingest.parseSchemaless(
      Seq(
        (at(65), msg("ERROR", 100).getBytes("UTF-8")),
        (at(80), msg("WARNING", 999).getBytes("UTF-8")),
        (at(110), msg("ERROR", 250).getBytes("UTF-8")))
        .toDF("ts", "raw"),
      "raw")
    val batch = LogsToMetrics(defs, LogsToMetrics.Schemaless("msg"))(batchIn)
      .select($"metric", unix_timestamp($"window_start").as("ws"), $"value")
      .as[(String, Long, Double)]
      .collect()
      .toSet
    assert(batch == Set(("error_count", 60L, 2.0), ("bytes_sum", 60L, 350.0)))
  }

  test("avg metric type aggregates correctly across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Array[Byte])]
    val parsed = Ingest.parseSchemaless(mem.toDF.toDF("ts", "raw"), "raw")
    val Seq(out) = StreamingMetrics.attach(
      parsed,
      Seq(MetricDefinition("avg_bytes", MetricType.Avg("bytes"), windowSizeSec = 60)),
      LogsToMetrics.Schemaless("msg"))
    val q = out.writeStream.format("memory").queryName("avg_stream").outputMode("append").start()
    try {
      // values arrive in different micro-batches; avg must combine state
      mem.addData((at(10), msg("ERROR", 10).getBytes("UTF-8")))
      mem.addData((at(20), msg("ERROR", 30).getBytes("UTF-8")),
        (at(30), """{"severity": "X"}""".getBytes("UTF-8"))) // no bytes field ⇒ excluded
      mem.addData((at(200), msg("ERROR", 0).getBytes("UTF-8")))
      q.processAllAvailable()
      val vals = spark.table("avg_stream").select($"value").as[Double].collect().toList
      assert(vals == List(20.0)) // (10+30)/2 — missing-field row excluded
    } finally q.stop()
  }

  test("p50 metric type aggregates across micro-batches (buffering state merges)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Array[Byte])]
    val parsed = Ingest.parseSchemaless(mem.toDF.toDF("ts", "raw"), "raw")
    val Seq(out) = StreamingMetrics.attach(
      parsed,
      Seq(MetricDefinition("p50_bytes", MetricType.P50("bytes"), windowSizeSec = 60)),
      LogsToMetrics.Schemaless("msg"))
    val q = out.writeStream.format("memory").queryName("p50_stream").outputMode("append").start()
    try {
      mem.addData((at(10), msg("ERROR", 1).getBytes("UTF-8")))
      mem.addData((at(20), msg("ERROR", 9).getBytes("UTF-8")),
        (at(30), msg("ERROR", 5).getBytes("UTF-8")))
      mem.addData((at(200), msg("ERROR", 0).getBytes("UTF-8")))
      q.processAllAvailable()
      val vals = spark.table("p50_stream").select($"value").as[Double].collect().toList
      assert(vals == List(5.0)) // median of {1,9,5} buffered across batches
    } finally q.stop()
  }

  test("multiple window sizes produce one streaming aggregation each") {
    val mixed = defs.head +: Seq(
      MetricDefinition("m5", MetricType.Count, windowSizeSec = 300))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Array[Byte])]
    val parsed = Ingest.parseSchemaless(mem.toDF.toDF("ts", "raw"), "raw")
    val outs = StreamingMetrics.attach(parsed, mixed, LogsToMetrics.Schemaless("msg"))
    assert(outs.size == 2)
  }

  test("multi-sink fan-out: N targets from one cached micro-batch (one source read)") {
    import graft.sinks.{MetricPoint, MetricsSink}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Array[Byte])]
    val scanned = spark.sparkContext.longAccumulator("rows_scanned")
    val countingScan = udf { (_: java.sql.Timestamp) => scanned.add(1); true }
    val parsed = Ingest
      .parseSchemaless(mem.toDF.toDF("ts", "raw"), "raw")
      .filter(countingScan(col("ts")))
    val Seq(out) = StreamingMetrics.attach(parsed, defs, LogsToMetrics.Schemaless("msg"))

    StreamingMetricsSpec.fanout.clear()
    def target(tag: String) = MetricsSink.Target(s"$tag/", _ => new MetricsSink {
      def write(p: MetricPoint): Unit = StreamingMetricsSpec.fanout.add(p.metricName)
    })
    val q = out.writeStream
      .outputMode("append")
      .foreachBatch(MetricsSink.multiRouter(Seq(target("local"), target("gcm"))))
      .start()
    try {
      mem.addData(
        (at(65), msg("ERROR", 100).getBytes("UTF-8")),
        (at(110), msg("ERROR", 250).getBytes("UTF-8")))
      mem.addData((at(200), msg("ERROR", 7).getBytes("UTF-8")))
      q.processAllAvailable()
      // both targets received both metrics of the closed window
      assert(StreamingMetricsSpec.fanout.contains("local/error_count"))
      assert(StreamingMetricsSpec.fanout.contains("local/bytes_sum"))
      assert(StreamingMetricsSpec.fanout.contains("gcm/error_count"))
      assert(StreamingMetricsSpec.fanout.contains("gcm/bytes_sum"))
      // the cache means the upstream scan ran once per micro-batch per row,
      // NOT once per target: 3 input rows → exactly 3 scans
      assert(scanned.value == 3L,
        s"expected one source read for both targets, saw ${scanned.value} row scans")
    } finally q.stop()
  }

  test("malformed and non-UTF8-decodable messages are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Array[Byte])]
    val parsed = Ingest.parseSchemaless(mem.toDF.toDF("ts", "raw"), "raw")
    val Seq(out) =
      StreamingMetrics.attach(parsed, Seq(MetricDefinition("all", MetricType.Count, windowSizeSec = 60)),
        LogsToMetrics.Schemaless("msg"))
    val query = out.writeStream.format("memory").queryName("drop_parity").outputMode("append").start()
    try {
      mem.addData(
        (at(10), "not json at all".getBytes("UTF-8")),
        (at(20), Array[Byte](-1, -2, -3)), // undecodable in every charset
        (at(30), """{"ok": 1}""".getBytes("UTF-8")))
      mem.addData((at(500), """{"ok": 1}""".getBytes("UTF-8")))
      query.processAllAvailable()
      val rows = spark.table("drop_parity").select($"value").as[Double].collect().toList
      assert(rows == List(1.0)) // only the valid first-window record counted
    } finally query.stop()
  }

  /** The composed exactly-once story the reference cannot offer (its export
    * is at-least-once, pipeline.py:211-233): FileStreamSpec proves source
    * checkpoint recovery and MetricsSinkSpec proves the idempotent wrapper
    * in isolation; this drives the FULL pipeline — file source → decode →
    * windowed metric → foreachBatch(idempotent(router(sink))) — through the
    * exact at-least-once gap: a crash AFTER the export succeeded but BEFORE
    * Structured Streaming committed the epoch. The restart replays the
    * batch (same batchId, offsets from the WAL); without the commit marker
    * the sink would double-emit every point of the replayed window.
    */
  test("exactly-once e2e: crash between export and epoch commit, restart, no double-emit") {
    import java.nio.file.{Files, Paths}
    import graft.sinks.MetricsSink
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("severity",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts_sec",
        org.apache.spark.sql.types.LongType)))
    val errCount = Seq(MetricDefinition(
      "error_count", MetricType.Count,
      Seq(FilterCondition("severity", "ERROR", "equals")), windowSizeSec = 60))

    def pipeline(inDir: String): org.apache.spark.sql.DataFrame = {
      val raw = spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
        .load(inDir).select(col("content").as("raw"))
      val parsed = Ingest.parseTyped(raw, "raw", schema)
        .select(timestamp_seconds(col("msg.ts_sec")).as("ts"),
          col("msg.severity").as("severity"))
      val Seq(out) = StreamingMetrics.attach(parsed, errCount, LogsToMetrics.Typed(parsed.schema))
      out
    }

    // crashAfterExport: arm once; the injected failure fires AFTER the
    // idempotent body returned (export done, marker written) and BEFORE
    // Spark can write the epoch commit — the worst-ordered crash.
    // sink writes happen in executor tasks — the sink closure is SERIALIZED
    // per task even in local mode, so points must land in a static buffer
    // keyed by run (the fan-out test's pattern), not an instance field
    def start(inDir: String, ckpt: String, commitDir: String,
        key: String, crashArm: java.util.concurrent.atomic.AtomicBoolean) = {
      val inner = MetricsSink.idempotent(commitDir)(
        MetricsSink.router(_ => new StreamingMetricsSpec.StaticSink(key), strict = true))
      pipeline(inDir).writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          val before = StreamingMetricsSpec.pointsFor(key).size
          inner(df.toDF(), id)
          val grew = StreamingMetricsSpec.pointsFor(key).size > before
          if (grew && crashArm.getAndSet(false))
            throw new RuntimeException("injected crash: export done, epoch uncommitted")
        }
        .start()
    }

    def write(dir: String, name: String, sev: String, tsSec: Long): Unit =
      Files.write(Paths.get(dir, name),
        s"""{"severity": "$sev", "ts_sec": $tsSec}""".getBytes("UTF-8"))

    def points(key: String): Seq[(Long, String, Double)] =
      StreamingMetricsSpec.pointsFor(key)
        .map(p => (p.timestamp.getTime / 1000L, p.metricName, p.value)).sorted

    def tmp(p: String) = Files.createTempDirectory(p).toString

    // --- crashed-and-restarted run ---
    val (in1, ck1, cm1) = (tmp("e2e-in"), tmp("e2e-ck"), tmp("e2e-cm"))
    val arm = new java.util.concurrent.atomic.AtomicBoolean(true)
    write(in1, "a.json", "ERROR", 30); write(in1, "b.json", "ERROR", 45)
    write(in1, "c.json", "INFO", 40); write(in1, "d.json", "ERROR", 70)
    val q1 = start(in1, ck1, cm1, "e2e-run1", arm)
    // watermark passes 60 → [0,60) exports (2 errors) → injected crash
    val crashed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    assert(crashed.getMessage.contains("injected crash"), crashed.getMessage)
    assert(points("e2e-run1") == Seq((60L, "error_count", 2.0)),
      s"the pre-crash export must have happened: ${points("e2e-run1")}")
    // restart over the same checkpoint + commit log: the uncommitted epoch
    // REPLAYS into the sink — the marker must swallow it — then new data
    // closes [60,120) exactly once
    val q2 = start(in1, ck1, cm1, "e2e-run1", new java.util.concurrent.atomic.AtomicBoolean(false))
    try {
      q2.processAllAvailable() // replay of the crashed epoch: must be a no-op
      write(in1, "e.json", "ERROR", 130)
      q2.processAllAvailable()
    } finally q2.stop()

    // --- uninterrupted control run, same inputs ---
    val (in2, ck2, cm2) = (tmp("e2e-in2"), tmp("e2e-ck2"), tmp("e2e-cm2"))
    write(in2, "a.json", "ERROR", 30); write(in2, "b.json", "ERROR", 45)
    write(in2, "c.json", "INFO", 40); write(in2, "d.json", "ERROR", 70)
    val q3 = start(in2, ck2, cm2, "e2e-run2", new java.util.concurrent.atomic.AtomicBoolean(false))
    try {
      q3.processAllAvailable()
      write(in2, "e.json", "ERROR", 130)
      q3.processAllAvailable()
    } finally q3.stop()

    assert(points("e2e-run2") == Seq((60L, "error_count", 2.0), (120L, "error_count", 1.0)),
      s"control run shape: ${points("e2e-run2")}")
    assert(points("e2e-run1") == points("e2e-run2"),
      s"crashed+restarted run must emit exactly the uninterrupted run's points:\n" +
        s"  crashed+restarted: ${points("e2e-run1")}\n  uninterrupted:     ${points("e2e-run2")}")
  }

  test("sliding windows stream ≡ batch across 3+ micro-batches (append emit-on-close)") {
    // the streaming twin of the batch q_sliding_window shape: 300 s
    // windows sliding by 60 s, each event in 5 buckets
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val typed = mem.toDF.toDF("ts", "v")
    val sdefs = Seq(MetricDefinition("ev_count", MetricType.Count, windowSizeSec = 300))
    val Seq(out) =
      StreamingMetrics.attachSliding(typed, sdefs, slideSec = 60,
        LogsToMetrics.Typed(typed.schema))
    val q = out.writeStream.format("memory").queryName("sslide").outputMode("append").start()
    val batches = Seq(
      Seq(65L, 80L, 110L),
      Seq(130L, 170L),
      Seq(250L))
    try {
      batches.foreach { b =>
        mem.addData(b.map(s => (at(s), 1.0)))
        q.processAllAvailable()
      }
      mem.addData((at(10000), 1.0)) // advance the watermark, close every earlier window
      q.processAllAvailable()
      val streamed = spark.table("sslide")
        .select(unix_timestamp($"window_start").as("ws"), $"value")
        .as[(Long, Double)].collect().toSet
      // batch reference: the same events through the static window() shape,
      // restricted to windows CLOSED at the final watermark (end ≤ 10000)
      val batch = batches.flatten.map(s => Tuple1(at(s))).toDF("ts")
        .groupBy(window($"ts", "300 seconds", "60 seconds").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .filter(unix_timestamp($"w.end") <= 10000L)
        .select(unix_timestamp($"w.start"), $"cnt".cast("double"))
        .as[(Long, Double)].collect().toSet
      assert(streamed == batch,
        s"missing=${batch -- streamed} extra=${streamed -- batch}")
      // overlap sanity: 6 events × 5 buckets ⇒ well over 5 distinct windows
      assert(streamed.size >= 5 && streamed.exists(_._2 > 1.0))
    } finally q.stop()
  }

  test("session windows stream ≡ batch across 3+ micro-batches (gap close + merge)") {
    // the streaming twin of the batch q_session_window shape: per-user
    // activity bursts with a 60 s silence gap, user as a dynamic label
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val typed = mem.toDF.toDF("ts", "user")
    val sdefs = Seq(MetricDefinition("sess_count", MetricType.Count,
      dynamicLabels = Map("user" -> "user")))
    val out = StreamingMetrics.attachSession(typed, sdefs, gapSec = 60,
      LogsToMetrics.Typed(typed.schema))
    val q = out.writeStream.format("memory").queryName("ssess").outputMode("append").start()
    // u1: burst {10,40,90} then (gap > 60) burst {300}; u2: one burst
    // {50,100} — spread over 3 micro-batches so sessions MERGE across
    // batches (u1's 10–40 batch-1 state extends with 90 in batch 2)
    val batches = Seq(
      Seq((10L, "u1"), (40L, "u1"), (50L, "u2")),
      Seq((90L, "u1"), (100L, "u2")),
      Seq((300L, "u1")))
    try {
      batches.foreach { b =>
        mem.addData(b.map { case (s, u) => (at(s), u) })
        q.processAllAvailable()
      }
      mem.addData((at(10000), "uz")) // watermark past every session's close
      q.processAllAvailable()
      val streamed = spark.table("ssess")
        .select($"labels"("user").as("user"),
          unix_timestamp($"window_start").as("ss"),
          unix_timestamp($"window_end").as("se"), $"value")
        .as[(String, Long, Long, Double)].collect().toSet
      // batch reference: static session_window over the same events,
      // sessions closed by the final watermark
      val batch = batches.flatten.map { case (s, u) => (at(s), u) }.toDF("ts", "user")
        .groupBy($"user", session_window($"ts", "60 seconds").as("sw"))
        .agg(count(lit(1)).as("cnt"))
        .filter(unix_timestamp($"sw.end") <= 10000L)
        .select($"user", unix_timestamp($"sw.start"), unix_timestamp($"sw.end"),
          $"cnt".cast("double"))
        .as[(String, Long, Long, Double)].collect().toSet
      assert(streamed == batch,
        s"missing=${batch -- streamed} extra=${streamed -- batch}")
      // the cross-batch merge really happened: u1's first session spans
      // 10→150 (90+gap) with 3 events despite arriving in two batches
      assert(streamed.contains(("u1", 10L, 150L, 3.0)), s"got $streamed")
    } finally q.stop()
  }
}

object StreamingMetricsSpec {
  /** Static so executor-side sink writes are visible in local mode. */
  val fanout: java.util.Set[String] = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Per-run point buffers for the exactly-once e2e (same rationale). */
  val runPoints =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentLinkedQueue[graft.sinks.MetricPoint]]()

  def pointsFor(key: String): Seq[graft.sinks.MetricPoint] = {
    import scala.jdk.CollectionConverters._
    Option(runPoints.get(key)).map(_.asScala.toSeq).getOrElse(Nil)
  }

  final class StaticSink(key: String) extends graft.sinks.MetricsSink {
    def write(p: graft.sinks.MetricPoint): Unit =
      runPoints
        .computeIfAbsent(key,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[graft.sinks.MetricPoint]())
        .add(p)
  }
}
