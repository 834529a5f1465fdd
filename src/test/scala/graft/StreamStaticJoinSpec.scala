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

  test("approx_count_distinct tracks exact within its rsd at sf0.001") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.01).as("approx"))
      .collect()
    rows.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
