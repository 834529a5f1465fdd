package graft

import graft.streaming.StreamingText
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming trending terms: per-window token counts emit once on window
  * close, match the batch tokenization, and respect the minCount prune.
  */
class StreamingTextSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)

  test("windowed token counts emit on close and match batch counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamingText.windowedTokenCounts(
      mem.toDF.toDF("ts", "text"), "text", "ts",
      windowDuration = "60 seconds", minCount = 2L)
    val q = out.writeStream.format("memory").queryName("stext").outputMode("append").start()
    try {
      mem.addData(
        (at(10), "spark spark engine"),
        (at(20), "spark  engine"), // ragged whitespace ⇒ same tokens
        (at(50), "tail"))
      q.processAllAvailable()
      // window [0,60) is still open — nothing may emit yet
      assert(spark.table("stext").count() == 0, "append mode must hold open windows")

      mem.addData((at(70), "spark next")) // watermark passes 60 ⇒ closes [0,60)
      q.processAllAvailable()
      val rows = spark.table("stext")
        .select($"w_start", $"token", $"cnt")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      // minCount=2 prunes 'tail' (1×); spark=3, engine=2 in the closed window
      assert(rows == Set((at(0), "spark", 3L), (at(0), "engine", 2L)), s"got $rows")
    } finally q.stop()
  }
}
