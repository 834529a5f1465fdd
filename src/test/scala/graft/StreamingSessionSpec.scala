package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming session + sliding windows (EXT, SURVEY.md §2.3): the stateful
  * window shapes beyond the reference's tumbling-only surface, driven
  * against a live streaming query.
  */
class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("streaming session windows merge events within the gap and emit on close") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val out = mem.toDF.toDF("ts", "user_id")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 seconds").as("sw"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), unix_timestamp(col("sw.start")).as("start"),
        unix_timestamp(col("sw.end")).as("end"), col("cnt"))

    val q = out.writeStream.format("memory").queryName("sess_stream").outputMode("append").start()
    try {
      // user 1: events at 10, 25, 40 chain into ONE session [10, 70);
      // user 2: events at 10 and 100 are two sessions
      mem.addData((at(10), 1L), (at(25), 1L), (at(40), 1L), (at(10), 2L), (at(100), 2L))
      mem.addData((at(500), 9L)) // advance watermark, close everything open
      q.processAllAvailable()
      val got = spark.table("sess_stream")
        .select($"user_id", $"start", $"end", $"cnt").as[(Long, Long, Long, Long)]
        .collect().toSet
      assert(got == Set(
        (1L, 10L, 70L, 3L),  // merged chain: last event 40 + 30s gap
        (2L, 10L, 40L, 1L),
        (2L, 100L, 130L, 1L)))
    } finally q.stop()
  }

  test("streaming sliding windows emit one row per covering bucket") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val out = mem.toDF.toDF("ts", "v")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "60 seconds", "30 seconds").as("w"))
      .agg(sum(col("v")).as("sum_v"))
      .select(unix_timestamp(col("w.start")).as("start"), col("sum_v"))

    val q = out.writeStream.format("memory").queryName("slide_stream").outputMode("append").start()
    try {
      mem.addData((at(45), 10.0)) // covered by windows starting at 0 and 30
      mem.addData((at(500), 0.0))
      q.processAllAvailable()
      val got = spark.table("slide_stream").as[(Long, Double)].collect().toSet
      assert(got == Set((0L, 10.0), (30L, 10.0)))
    } finally q.stop()
  }
}
