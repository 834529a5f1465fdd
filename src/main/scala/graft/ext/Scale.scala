package graft.ext

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale machinery for skew and co-location — the knobs a 100 TB deployment
  * turns that never show up at test scale:
  *
  *  - **Salted aggregation**: a hot grouping key (one tenant, one null-ish
  *    label set) funnels its entire volume through one reduce task. Salting
  *    splits each key into `saltBuckets` partial groups aggregated in
  *    parallel, then combines partials — same result, bounded per-task
  *    volume. Works for any algebraic aggregate (sum/count/min/max).
  *  - **Bucketed co-located joins**: repeated joins on the same key (fact ⋈
  *    fact) pay a full shuffle every query. Writing both sides bucketed by
  *    the join key lets SortMergeJoin read bucket-aligned splits with NO
  *    exchange on either side.
  *
  * (AQE's skew-join splitting handles join-side skew automatically; salting
  * here targets aggregation skew, which AQE does not rebalance.)
  */
object Scale {

  /** Shuffle width sized to a MEASURED row volume — the per-operator form
    * of the `spark.sql.shuffle.partitions` sizing rule (partitions track
    * data ÷ executors, not a constant). A fixed session width is right for
    * the typical vocab/group-sized exchange, but an operator whose shuffle
    * volume is a known super-linear function of its input (a pair-stream
    * self-join, a banded candidate explosion) must size ITS exchange from
    * the volume it is about to produce, or every task inherits 1/width of
    * an unbounded stream (measured: the PPJoin pair stream at ×100 put
    * ~350 MB into each of 32 fixed partitions — 11 GB of sort spill).
    * Never shrinks below the session width (small inputs keep the session
    * plan); capped at 4096 — at that width the operator needs a real
    * cluster, not a wider local shuffle.
    */
  def sizedPartitions(spark: SparkSession, rows: Long, rowsPerTask: Long = 2L << 20): Int = {
    require(rowsPerTask > 0, s"rowsPerTask must be positive, got $rowsPerTask")
    val base = spark.sessionState.conf.numShufflePartitions
    math.min(4096L, math.max(base.toLong, (rows + rowsPerTask - 1) / rowsPerTask)).toInt
  }

  /** Two-phase salted sum/count aggregation.
    *
    * @param df         input
    * @param groupCols  grouping keys (possibly skewed)
    * @param sumCols    columns to sum (count provided as `count_rows`)
    * @param saltBuckets parallelism per key
    */
  def saltedAggregate(
      df: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val salted = df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(saltBuckets)))
    val partialAggs =
      sumCols.map(c => sum(col(c)).as(s"_p_$c")) :+ count(lit(1)).as("_p_cnt")
    val partial = salted
      .groupBy((groupCols.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sumCols.map(c => sum(col(s"_p_$c")).as(s"sum_$c")) :+ sum(col("_p_cnt")).as("count_rows")
    partial
      .groupBy(groupCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a SKEWED join key against a dim too large to
    * broadcast: fact rows get a round-robin salt in [0, saltBuckets), the
    * dim side replicates ×saltBuckets, and the join key becomes
    * (key, salt) — each hot key's rows split across saltBuckets reduce
    * tasks instead of funneling through one. Result ≡ the plain join
    * (ScaleSpec proves it); cost = dim inflated ×saltBuckets through the
    * shuffle, the standard skew trade.
    *
    * Prefer AQE's automatic skew-join splitting where it applies
    * (sort-merge joins it can re-plan at runtime); explicit salting is
    * the fallback for shapes AQE leaves alone or when the skew must be
    * neutralized BEFORE a downstream stateful op.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBuckets: Int,
      how: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    // right/full outer would emit each UNMATCHED dim row saltBuckets times
    // (the dim side is replicated); only fact-preserving joins are sound
    val validHow = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "semi", "anti")
    require(validHow.contains(how.toLowerCase.replace("_", "")) ||
      validHow.contains(how.toLowerCase),
      s"saltedJoin supports fact-preserving join types only, got '$how'")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "inputs must not already have a _salt column")
    val sf = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val sd = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    sf.hint("merge").join(sd.hint("merge"), Seq(key, "_salt"), how).drop("_salt")
  }

  /** Write a frame bucketed by `key` into `buckets` files under the
    * session warehouse as `table` — the one-time cost that removes the
    * join-side exchange from every subsequent query on that key. `key`
    * may be a comma-separated list: Spark's co-partition check
    * (`requireAllClusterKeysForCoPartition`, default on) only elides the
    * exchange when the JOIN keys exactly match the bucket columns, so a
    * composite-key join needs a composite-key bucket spec.
    *
    * `sortedFiles = false` writes the table WITHOUT the per-task write
    * sort (round 15): Spark's V1 bucketed write plans a Sort by
    * (bucket-id, sortBy cols) that buffers each task's ENTIRE output —
    * the ×100 probe measured the candidate-pair table build spilling
    * 768.5 MB in that sort (stage wall 27 s) — while the file-level sort
    * order it produces is IGNORED at read since Spark 3
    * (`spark.sql.legacy.bucketedTableScan.outputOrdering` defaults to
    * false, and the engine's bucket-join consumers re-sort per bucket in
    * their own SMJs; PlanSpec pins that Sort explicitly). The unsorted
    * form instead repartitions on the bucket keys — the SAME murmur3
    * pmod that assigns bucket ids, so every task holds exactly one
    * bucket and writes exactly one file (file count and layout identical
    * to the sorted form) — and enables
    * `spark.sql.maxConcurrentOutputFileWriters`, under which the planner
    * omits the write sort entirely (`V1WritesUtils.getSortOrder`). Net:
    * one streaming exchange replaces a full per-task sort.
    * Default stays `true`: callers whose input is not worth an extra
    * exchange (small frames) keep the historical layout.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortedFiles: Boolean = true): Unit = {
    val keys = key.split(",").map(_.trim).filter(_.nonEmpty)
    require(keys.nonEmpty, "need at least one bucket column")
    if (sortedFiles) {
      df.write
        .mode("overwrite")
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .format("parquet")
        .saveAsTable(table)
    } else {
      val spark = df.sparkSession
      val ck = "spark.sql.maxConcurrentOutputFileWriters"
      val prev = spark.conf.getOption(ck)
      // 8 writers: the repartition guarantees one bucket per task, so one
      // writer suffices; the slack covers AQE-rewritten corner plans
      // without opening enough parquet writers to matter for memory
      spark.conf.set(ck, "8")
      try {
        df.repartition(buckets, keys.map(col): _*)
          .write
          .mode("overwrite")
          .bucketBy(buckets, keys.head, keys.tail: _*)
          .format("parquet")
          .saveAsTable(table)
      } finally {
        prev match {
          case Some(v) => spark.conf.set(ck, v)
          case scala.None => spark.conf.unset(ck)
        }
      }
    }
  }

  /** Join two tables previously written with [[writeBucketed]] on the same
    * key/bucket count: bucket-aligned SortMergeJoin, zero exchanges.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String)
      : DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, Seq(key))
  }

  /** Convenience: does this frame's physical plan contain a shuffle? */
  def hasExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")

  /** Dense global row numbering (0-based, ordered by `orderCol`) WITHOUT the
    * single-reducer sort that `row_number() OVER (ORDER BY …)` compiles to —
    * an empty-over window moves the ENTIRE input through one task, the
    * canonical 100 TB cliff.
    *
    * Scale path instead: range-repartition on the order column (parallel
    * sampled-boundary sort, every task gets a contiguous key range), sort
    * within partitions, then number each partition locally and add a
    * broadcast prefix-sum offset. The only driver-side data is ONE count per
    * partition; the corpus itself never converges on a single task.
    *
    * The ranged frame is localCheckpoint-ed so the counting pass and the
    * numbering pass read the SAME physical partitioning (RangePartitioner
    * samples per-RDD; recomputation could draw different boundaries). A
    * durable pipeline would stage to storage instead — same contract.
    *
    * `orderCol` must be unique for the numbering to be deterministic
    * (ties across a range boundary would otherwise order arbitrarily).
    */
  def globalRowNumber(
      df: DataFrame,
      orderCol: String,
      partitions: Int,
      outCol: String = "rownum"): DataFrame =
    globalRowNumberBy(df, Seq(orderCol), partitions, outCol)

  /** [[globalRowNumber]] over a COMPOSITE key — range-partition and sort
    * on (c₁, c₂, …) lexicographically. This is the overflow-free form: the
    * r14 ×100 run showed single-long KEY PACKING (cents·2³² + custkey) is
    * a scale cliff in disguise — the pack guard fired at 100× because
    * per-customer cents outgrew their bit budget, while a composite range
    * key has no bit budget at all. `orderCols` must be jointly unique for
    * deterministic numbering (same contract as the single-column form).
    */
  def globalRowNumberBy(
      df: DataFrame,
      orderCols: Seq[String],
      partitions: Int,
      outCol: String = "rownum"): DataFrame = {
    require(partitions > 0, "partitions must be positive")
    require(orderCols.nonEmpty, "need at least one order column")
    require(!df.columns.contains(outCol), s"input already has a '$outCol' column")
    val ranged = df
      .repartitionByRange(partitions, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.head, orderCols.tail: _*)
      .localCheckpoint()
    // one row per non-empty partition — driver-sized by construction
    val counts = ranged
      .groupBy(spark_partition_id().as("pid"))
      .count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets = new Array[Long](partitions)
    var acc = 0L
    (0 until partitions).foreach { pid =>
      offsets(pid) = acc
      acc += counts.getOrElse(pid, 0L)
    }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = df.schema.add(outCol, LongType, nullable = false)
    ranged.mapPartitions { it =>
      val off = bc.value(TaskContext.getPartitionId())
      var i = 0L
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ (off + i))
        i += 1
        out
      }
    }(Encoders.row(outSchema))
  }

  /** Compact a directory of many small parquet files into ≈`targetBytes`
    * outputs — the maintenance job every streaming/micro-batch sink needs
    * (per-trigger writes leave thousands of KB-sized files; at warehouse
    * scale the footer-and-task overhead of small files dominates scans).
    *
    * Default path is `coalesce` (NARROW — no shuffle, existing partitions
    * concatenate; file sizes may vary with input skew). `evenSizes = true`
    * pays one round-robin shuffle for uniform outputs. Returns the target
    * file count. Sizing uses the SOURCE byte size; compressed output can
    * land under target, never pathologically over.
    */
  def compact(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      targetBytes: Long,
      evenSizes: Boolean = false): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    // resolve the filesystem FROM the path — FileSystem.get(conf) returns
    // the default FS and breaks for object-store paths (s3a://, gs://),
    // which are the norm for the streaming-sink dirs this targets
    val srcPath = new org.apache.hadoop.fs.Path(srcDir)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(srcPath).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(srcDir)
    val out = if (evenSizes) df.repartition(n) else df.coalesce(n)
    out.write.mode("overwrite").parquet(dstDir)
    n
  }

  /** Z-order (Morton) value of two non-negative dimension columns: the low
    * `bits` bits of `x` and `y` interleaved (x on even positions, y on odd).
    * Pure `Column` bit algebra — shifts/masks/ors stay inside whole-stage
    * codegen, no UDF.
    *
    * Sorting or range-partitioning a table by this value gives every
    * contiguous run of rows BOUNDED ranges in BOTH dimensions at once
    * (fixing the top 2k bits of z fixes the top k bits of each dimension),
    * which is what makes per-file min/max statistics prune multi-dimension
    * predicates — a single-column sort clusters one dimension and leaves
    * the other's span at full domain width. This is the layout lever for
    * 100 TB scans filtered on two axes (tenant × time, user × day).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits)
      .flatMap { i =>
        Seq(
          shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
      .reduce(_ bitwiseOR _)
  }
}
