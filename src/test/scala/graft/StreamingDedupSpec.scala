package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact-dedup: first occurrence admitted, repeats dropped,
  * state keyed on the fingerprint and bounded by the watermark horizon.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)

  test("admits first occurrence, drops in-batch and cross-batch repeats") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamingDedup.firstSeen(
      mem.toDF.toDF("ts", "text"), "text", watermarkDelay = "300 seconds")
    val q = out.writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      mem.addData(
        (at(10), "the quick brown fox"),
        (at(11), "the  quick   brown fox"), // normalization-equal ⇒ duplicate
        (at(12), "something else"))
      q.processAllAvailable()
      mem.addData((at(20), "the quick brown fox")) // cross-batch duplicate
      mem.addData((at(30), "a third document"))
      q.processAllAvailable()
      val texts = spark.table("sdedup").select($"text").as[String].collect().toSet
      assert(texts == Set("the quick brown fox", "something else", "a third document"))
      // exactly one representative per fingerprint
      val fps = spark.table("sdedup").select($"fp").as[String].collect()
      assert(fps.length == fps.distinct.length)
    } finally q.stop()
  }

  test("streaming simhash near-dups: cross-batch pairs found, horizon evicts state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val nearA = "the quick brown fox jumps over the lazy dog again and again today"
    val nearB = "the quick brown fox jumps over the lazy dog again and again tonight"
    val far = "completely unrelated content about distributed query engines and shuffles"
    val out = StreamingDedup.simhashNearDups(
      mem.toDF.toDF("ts", "doc_id", "text"),
      "doc_id", "text", "ts", maxHamming = 7, horizonSec = 100L)
    val q = out.writeStream.format("memory").queryName("snear").outputMode("append").start()
    try {
      mem.addData((at(10), 1L, nearA), (at(12), 3L, far))
      q.processAllAvailable()
      mem.addData((at(20), 2L, nearB)) // near-dup of doc 1, later micro-batch
      q.processAllAvailable()
      val pairs = spark.table("snear").select($"a", $"b").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L)), s"expected only the near pair, got $pairs")

      // beyond the horizon the bucket state has evicted doc 1 and 2
      mem.addData((at(200), 4L, nearA))
      q.processAllAvailable()
      val later = spark.table("snear").select($"a", $"b").as[(Long, Long)].collect().toSet
      assert(later == Set((1L, 2L)), s"horizon-expired docs must not pair, got $later")
    } finally q.stop()
  }

  test("hot-bucket cap bounds state: oldest entries evicted beyond maxBucket") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    // identical text ⇒ identical fingerprint ⇒ all docs share every bucket
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val out = StreamingDedup.simhashNearDups(
      mem.toDF.toDF("ts", "doc_id", "text"),
      "doc_id", "text", "ts", maxHamming = 7, horizonSec = 1000L, maxBucket = 2)
    val q = out.writeStream.format("memory").queryName("scap").outputMode("append").start()
    try {
      mem.addData((at(10), 1L, text)); q.processAllAvailable()
      mem.addData((at(11), 2L, text)); q.processAllAvailable()
      mem.addData((at(12), 3L, text)); q.processAllAvailable() // cap drops doc 1
      mem.addData((at(13), 4L, text)); q.processAllAvailable()
      val pairs = spark.table("scap").select($"a", $"b").as[(Long, Long)].collect().toSet
      // doc 4 pairs only with the capped tail {2,3}; (1,4) must be absent,
      // yet 4 still links into the duplicate cluster (recall trade-off doc)
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)),
        s"got $pairs")
    } finally q.stop()
  }

  test("hot-bucket cap evicts globally oldest even when a late row arrives in a later batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val out = StreamingDedup.simhashNearDups(
      mem.toDF.toDF("ts", "doc_id", "text"),
      "doc_id", "text", "ts", maxHamming = 7, horizonSec = 1000L, maxBucket = 2)
    val q = out.writeStream.format("memory").queryName("slate").outputMode("append").start()
    try {
      mem.addData((at(10), 1L, text), (at(20), 2L, text)); q.processAllAvailable()
      // batch 2: doc 3 is LATE (ts=15 < doc 2's ts=20) but within the
      // watermark; appended after doc 2 in state. Cap eviction must still be
      // by event time: after doc 3 the survivors are {3@15, 2@20} (doc 1
      // out), after doc 4 they are {2@20, 4@25} — a per-batch prefix drop
      // would wrongly evict the newer doc 2 and keep the late doc 3.
      mem.addData((at(15), 3L, text), (at(25), 4L, text)); q.processAllAvailable()
      mem.addData((at(30), 5L, text)); q.processAllAvailable()
      val pairs = spark.table("slate").select($"a", $"b").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L), (2L, 5L), (4L, 5L)),
        s"got $pairs")
    } finally q.stop()
  }

  test("streaming near-dup hamming agrees with the batch simhash48 fingerprints") {
    import graft.ext.{Dedup, TextOps}
    val nearA = "the quick brown fox jumps over the lazy dog again and again today"
    val nearB = "the quick brown fox jumps over the lazy dog again and again tonight"
    val fps = Seq((1L, nearA), (2L, nearB))
      .toDF("doc_id", "text")
      .select(Dedup.simhash48(TextOps.tokens($"text")).as("sh"))
      .as[Long]
      .collect()
    val ham = java.lang.Long.bitCount(fps(0) ^ fps(1))
    assert(ham <= 7, s"fixture docs must be near (hamming=$ham)")
  }

  test("fingerprint matches the batch exactGroups fingerprint (one curation key)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamingDedup.firstSeen(mem.toDF.toDF("ts", "text"), "text")
    val q = out.writeStream.format("memory").queryName("sdedup_fp").outputMode("append").start()
    try {
      mem.addData((at(1), "  Shared   Key \t Document "))
      q.processAllAvailable()
      val streamFp = spark.table("sdedup_fp").select($"fp").as[String].head()
      val batchFp = Seq(("d1", "  Shared   Key \t Document "))
        .toDF("doc_id", "text")
        .select(graft.ext.TextOps.fingerprintMd5(col("text")).as("fp"))
        .as[String]
        .head()
      assert(streamFp == batchFp)
    } finally q.stop()
  }
}
