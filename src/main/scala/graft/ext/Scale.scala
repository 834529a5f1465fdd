package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Write a frame bucketed+sorted by `key` into `buckets` files under the
    * session warehouse as `table` — the one-time cost that removes the
    * join-side exchange from every subsequent query on that key.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

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
}
