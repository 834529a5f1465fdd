package graft

import graft.model._
import graft.pipeline.LogsToMetrics
import graft.streaming.StreamingMetrics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static enrichment (SURVEY.md §2.3 joins EXT): a streaming fact
  * joined to a static broadcast dimension BEFORE the windowed aggregation —
  * the label-enrichment shape a metrics pipeline needs (user_id → segment).
  */
class StreamStaticJoinSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("stream enriched with a static dimension aggregates per enriched label") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")

    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val enriched = mem.toDF.toDF("ts", "user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
      .withColumn("tier", coalesce(col("tier"), lit("unknown")))

    val defs = Seq(
      MetricDefinition("value_by_tier", MetricType.Sum("value"),
        dynamicLabels = Map("tier" -> "tier"), windowSizeSec = 60))
    val Seq(out) = StreamingMetrics.attach(enriched, defs, LogsToMetrics.Typed(enriched.schema))

    val q = out.writeStream.format("memory").queryName("enrich_parity").outputMode("append").start()
    try {
      mem.addData((at(10), 1L, 5.0), (at(20), 2L, 7.0), (at(30), 1L, 2.0), (at(40), 99L, 1.0))
      mem.addData((at(200), 1L, 0.0)) // close the first window
      q.processAllAvailable()
      val got = spark.table("enrich_parity")
        .select(try_element_at(col("labels"), lit("tier")).as("tier"), col("value"))
        .as[(String, Double)].collect().toSet
      assert(got == Set(("gold", 7.0), ("silver", 7.0), ("unknown", 1.0)))
    } finally q.stop()
  }

  test("stream-stream interval join: views attributed to clicks within 30 s") {
    // both sides watermarked + a time-interval predicate ⇒ Spark can bound
    // the join state (expired rows evicted as the watermark advances) —
    // the attribution-join shape (click ⋈ conversion) at unbounded scale
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val convs = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val c = clicks.toDF.toDF("cts", "cuser").withWatermark("cts", "60 seconds")
    val v = convs.toDF.toDF("vts", "vuser", "amount").withWatermark("vts", "60 seconds")
    val joined = c.join(v,
      expr("cuser = vuser AND vts >= cts AND vts <= cts + INTERVAL 30 seconds"))
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      clicks.addData((at(10), 1L), (at(10), 2L), (at(100), 3L))
      convs.addData(
        (at(25), 1L, 9.0),   // within 30 s of user 1's click → joins
        (at(55), 2L, 4.0),   // 45 s after user 2's click → outside window
        (at(120), 3L, 7.0),  // within window of user 3's click → joins
        (at(5), 3L, 1.0))    // BEFORE the click → must not join
      q.processAllAvailable()
      val got = spark.table("ssj")
        .select($"cuser", $"amount").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 9.0), (3L, 7.0)), s"got $got")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: unmatched clicks emit nulls on watermark close") {
    // the "clicks WITHOUT conversions" attribution question: an outer
    // interval join emits the null row ONLY once the watermark proves no
    // match can still arrive — bounded state AND complete answers, where
    // an inner join silently drops the unconverted side
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val convs = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val c = clicks.toDF.toDF("cts", "cuser").withWatermark("cts", "10 seconds")
    val v = convs.toDF.toDF("vts", "vuser", "amount").withWatermark("vts", "10 seconds")
    val joined = c.join(v,
      expr("cuser = vuser AND vts >= cts AND vts <= cts + INTERVAL 30 seconds"),
      "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssoj").outputMode("append").start()
    try {
      clicks.addData((at(10), 1L), (at(10), 2L)) // user 2 never converts
      convs.addData((at(25), 1L, 9.0))
      q.processAllAvailable()
      // push both watermarks far past cts + 30 s + delay so user 2's
      // click provably cannot match anymore; a second nudge batch lets
      // the outer row flush
      clicks.addData((at(500), 9L))
      convs.addData((at(500), 9L, 1.0))
      q.processAllAvailable()
      clicks.addData((at(600), 8L))
      convs.addData((at(600), 8L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("ssoj")
        .select($"cuser", $"amount").as[(Long, Option[Double])].collect().toSet
      assert(rows.contains((1L, Some(9.0))), s"matched click must join: $rows")
      assert(rows.contains((2L, None)),
        s"the unconverted click must emit with NULL once closed: $rows")
      // and it emits exactly once — no duplicate outer rows across batches
      assert(spark.table("ssoj").filter($"cuser" === 2L).count() == 1L)
    } finally q.stop()
  }

  test("approx_count_distinct tracks exact within its rsd at sf0.001") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    rows.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
