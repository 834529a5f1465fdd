package graft

import graft.ext.Scale
import org.apache.spark.sql.functions._

/** Skew + co-location machinery: salted aggregation equivalence and
  * exchange-free bucketed joins.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation on skewed data") {
    // one hot key carrying 10k rows, many cold keys
    val df = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 200).map(i => (s"cold_$i", i.toLong))).toDF("k", "v").repartition(8)
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("count_rows"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Scale.saltedAggregate(df, Seq("k"), Seq("v"), saltBuckets = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
    assert(salted.exists(t => t._1 == "hot" && t._2 == 10000L * 10001 / 2 && t._3 == 10000L))
  }

  test("salted join equals the plain join and splits the hot key across salts") {
    // one hot fact key (5k rows), dim with 100 keys — the non-broadcastable
    // skewed-join shape at scale (miniaturized)
    val fact = ((1 to 5000).map(_ => 0L) ++ (1L to 200L).map(_ % 100))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "payload")
    val dim = (0L until 100L).map(i => (i, s"attr_$i")).toDF("key", "attr")
    val plain = fact.join(dim, Seq("key"))
      .select($"key", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Scale.saltedJoin(fact, dim, "key", saltBuckets = 8)
      .select($"key", $"payload", $"attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    // the hot key's rows really do spread across multiple salt values
    val spread = fact.withColumn("_salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .filter($"key" === 0L).select($"_salt").distinct().count()
    assert(spread > 1, "salting must split the hot key's rows")
    // dim-preserving joins would emit unmatched dim rows saltBuckets times —
    // rejected up front, as is a colliding _salt column
    intercept[IllegalArgumentException](Scale.saltedJoin(fact, dim, "key", 8, how = "full"))
    intercept[IllegalArgumentException](
      Scale.saltedJoin(fact.withColumn("_salt", lit(1)), dim, "key", 8))
  }

  test("bucketed join runs without any exchange") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i")).toDF("key", "payload")
    val dims = (0L until 50L).map(i => (i, s"d$i")).toDF("key", "attr")
    Scale.writeBucketed(facts, "graft_facts_b", "key", 8)
    Scale.writeBucketed(dims, "graft_dims_b", "key", 8)
    // disable auto-broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "graft_facts_b", "graft_dims_b", "key")
      assert(!Scale.hasExchange(joined), "bucket-aligned join must not shuffle:\n" +
        joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 1000)
      // the same join over non-bucketed frames DOES shuffle
      assert(Scale.hasExchange(facts.join(dims, Seq("key"))))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }

  test("AQE splits a skewed join partition (join-side skew, no salting needed)") {
    // thresholds lowered so test-scale data trips the same machinery a
    // 100 TB run relies on; saved and restored around the assertion
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 150k of 200k left rows share key 0 → one reducer partition ~10×
      // the others
      val left = spark.range(200000)
        .select(when($"id" < 150000, 0L).otherwise($"id").as("k"),
          lpad(lit("x"), 64, "x").as("pad"))
      val right = spark.range(200000).select($"id".as("k"), lit(1L).as("w"))
      val joined = left.hint("merge").join(right.hint("merge"), Seq("k"))
      // execute THIS dataset's own query execution — collect() runs
      // queryExecution.executedPlan directly, so AQE finalizes the plan we
      // inspect (a write or .rdd action clones the plan instead)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE should have split the skewed partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // Spark's InjectRuntimeFilter: a selective predicate on the dim side
    // of a shuffle join grows a bloom filter of the surviving join keys,
    // and the FACT side is pre-filtered by might_contain BEFORE its
    // shuffle — at 100 TB this is the difference between shuffling the
    // full fact table and shuffling only rows that can match. The
    // application-side size threshold defaults to 10 GB (never trips at
    // test SF); lowering it exercises the same machinery a production
    // run relies on.
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def shape = {
        val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
        val ord = Tables.orders(spark, "/root/testdata/sf0.001")
          .filter($"o_orderpriority" === "1-URGENT")
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sq"))
      }
      val filtered = shape
      val opt = filtered.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter_agg"),
        s"dim side must build a runtime bloom of surviving keys:\n$opt")
      assert(opt.contains("might_contain"),
        s"fact side must be pre-filtered by the bloom before its shuffle:\n$opt")
      // the filter is a physical pruning aid only — results are identical
      // to the plain join (bloom false positives pass through to the real
      // join predicate, false negatives are impossible)
      val got = filtered.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val want = shape.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("observe() audits an ETL write in-flight — no second scan") {
    // the 100 TB telemetry pattern: row counts / value sums / null counts
    // ride the SAME pass as the write via Dataset.observe — a follow-up
    // audit query would re-scan the corpus. The listener receives the
    // metrics when the write's query execution finishes.
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val dst = java.nio.file.Files.createTempDirectory("observe-dst").toString
    @volatile var observed: Option[org.apache.spark.sql.Row] = None
    val latch = new CountDownLatch(1)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(name: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("write_audit").foreach { m =>
          observed = Some(m); latch.countDown()
        }
      }
      override def onFailure(name: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.range(10000)
        .select($"id", when($"id" % 100 === 0, lit(null).cast("long"))
          .otherwise($"id" * 2).as("v"))
        .observe("write_audit",
          count(lit(1)).as("rows"),
          sum($"v").as("v_total"),
          sum($"v".isNull.cast("long")).as("v_nulls"))
        .write.mode("overwrite").parquet(dst)
      assert(latch.await(30, TimeUnit.SECONDS), "metrics must arrive with the write")
      val m = observed.get
      assert(m.getAs[Long]("rows") == 10000L)
      assert(m.getAs[Long]("v_nulls") == 100L)
      val expected = (0L until 10000L).filter(_ % 100 != 0).map(_ * 2).sum
      assert(m.getAs[Long]("v_total") == expected)
      // and the written data is untouched by the observation
      assert(spark.read.parquet(dst).count() == 10000L)
    } finally {
      spark.listenerManager.unregister(listener)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
    }
  }

  test("compact collapses a small-files directory losslessly, shuffle-free by default") {
    val src = java.nio.file.Files.createTempDirectory("compact-src").toString
    val dst = java.nio.file.Files.createTempDirectory("compact-dst").toString
    try {
      spark.range(20000).select($"id", lpad(lit("x"), 50, "x").as("pad"))
        .repartition(64).write.mode("overwrite").parquet(src)
      def parquetFiles(dir: String) =
        new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
      assert(parquetFiles(src) == 64, "fixture must start fragmented")
      val bytes = new java.io.File(src).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
      val n = Scale.compact(spark, src, dst, targetBytes = bytes / 4)
      assert(n <= 5, s"~4 target files expected, got $n")
      assert(parquetFiles(dst) == n, "one output file per target partition")
      // lossless: same rows, same content checksum
      val before = spark.read.parquet(src).agg(count(lit(1)), sum($"id")).collect().head
      val after = spark.read.parquet(dst).agg(count(lit(1)), sum($"id")).collect().head
      assert(before == after)
      // the default path is NARROW — no shuffle for the rewrite
      assert(!Scale.hasExchange(spark.read.parquet(src).coalesce(n)),
        "coalesce compaction must not shuffle")
      assert(Scale.hasExchange(spark.read.parquet(src).repartition(n)),
        "evenSizes pays the round-robin shuffle")
    } finally Seq(src, dst).foreach { d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    }
  }

  test("globalRowNumber equals the single-reducer window, including empty ranges") {
    // unsorted, gap-heavy keys; more partitions than distinct ranges can
    // fill → some partitions end up empty and their offsets must still
    // chain correctly through the prefix sum
    val df = Seq(907L, 3L, 500L, 17L, 42L, 999L, 1L, 250L).map(k => (k, s"p$k"))
      .toDF("k", "payload").repartition(5)
    val got = Scale.globalRowNumber(df, "k", partitions = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = Seq(1L, 3L, 17L, 42L, 250L, 500L, 907L, 999L).zipWithIndex
      .map { case (k, i) => (k, s"p$k", i.toLong) }.toSet
    assert(got == want)
    // numbering is dense 0..n-1 — no gaps, no duplicates
    assert(got.map(_._3) == (0L until 8L).toSet)
    intercept[IllegalArgumentException](
      Scale.globalRowNumber(df.withColumn("rownum", lit(1)), "k", 4))
  }

  test("globalRowNumber at table scale matches row_number over the full order") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select($"doc_id")
    val got = Scale.globalRowNumber(docs, "doc_id", partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = docs.collect().map(_.getLong(0)).sorted.zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(got == want)
  }

  test("z-ordered parquet files prune a two-dimensional box predicate via min/max stats") {
    // end-to-end proof of the layout claim: the SAME 256×256 grid written
    // (a) range-partitioned by z-value and (b) range-partitioned by x —
    // then a box predicate on BOTH dims. Parquet file/row-group min-max
    // stats prune z-files on both axes (each file is a compact quad), but
    // x-files only on x (each spans the full y domain). The scan metric
    // counts rows surviving stats pruning — the 100 TB read-amplification
    // difference, measured.
    val grid = spark.range(65536L).select(
      ($"id" % 256).cast("int").as("x"),
      ($"id" / 256).cast("int").as("y"),
      $"id".as("payload"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val xDir = java.nio.file.Files.createTempDirectory("xsort").toString
    try {
      grid.withColumn("z", Scale.zValue($"x", $"y", 8))
        .repartitionByRange(64, $"z").drop("z")
        .write.mode("overwrite").parquet(zDir)
      grid.repartitionByRange(64, $"x", $"y")
        .write.mode("overwrite").parquet(xDir)
      def scannedRows(dir: String): Long = {
        val q = spark.read.parquet(dir)
          .filter($"x" >= 32 && $"x" < 64 && $"y" >= 96 && $"y" < 128)
        // collect() executes THIS queryExecution — its scan metrics are
        // the ones inspected (a count() would run a separate plan and
        // leave these metrics at zero)
        assert(q.collect().length == 1024, "box holds exactly one 32x32 quad")
        val scan = q.queryExecution.executedPlan.collectLeaves().head
        val rows = scan.metrics("numOutputRows").value
        assert(rows > 0, "metric must come from the executed scan")
        rows
      }
      val zRows = scannedRows(zDir)
      val xRows = scannedRows(xDir)
      info(s"rows surviving stats pruning: z-layout $zRows, x-layout $xRows")
      // z layout: the box is ideally ONE 1024-row file; repartitionByRange
      // samples boundaries per-RDD (seeded by RDD id, so suite order moves
      // it), splitting the quad across a few files — bound at 8 files'
      // worth. x layout: every file overlapping x∈[32,64) spans all of y,
      // so ~8 files' worth of rows MUST survive stats pruning regardless
      // of where the sampled boundaries land.
      assert(zRows <= 8192, s"z layout must prune to a handful of files, read $zRows")
      assert(xRows >= 8000,
        s"single-dim layout cannot prune the y axis, must read ~8 files ($xRows)")
      assert(xRows * 2 >= zRows * 3,
        s"z layout must beat single-dim by ≥1.5× ($xRows vs $zRows)")
    } finally {
      Seq(zDir, xDir).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("zValue interleaves exactly and fixing top z-bits bounds BOTH dimensions") {
    // reference interleave in plain Scala
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val bits = 6
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = grid.toDF("x", "y")
      .withColumn("z", Scale.zValue($"x", $"y", bits))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y, bits), s"interleave mismatch at ($x, $y)")
    }
    // bijective on the grid
    assert(got.values.toSet.size == grid.size)
    // locality law: the top 4 z-bits fix the top 2 bits of each dimension,
    // so every bucket's span in x AND y is < domain/4
    val byBucket = got.toSeq.groupBy { case (_, z) => z >> (2 * bits - 4) }
    byBucket.foreach { case (b, members) =>
      val xs = members.map(_._1._1)
      val ys = members.map(_._1._2)
      assert(xs.max - xs.min < 16, s"bucket $b x-span must stay < domain/4")
      assert(ys.max - ys.min < 16, s"bucket $b y-span must stay < domain/4")
    }
  }
}
