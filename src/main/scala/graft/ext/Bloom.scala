package graft.ext

import graft.functions.BloomBitTest
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter runtime pruning — the 100 TB pattern for membership tests
  * against a SMALL key set (benchmark shingles, blocklists, deleted-id
  * tombstones): build a bit array from the small side once, prune the big
  * side with a pure `Column` membership probe BEFORE any join or shuffle,
  * then exact-join only the survivors (false positives are removed there,
  * so results are identical to the un-pruned plan).
  *
  * This is the explicit form of Spark's own runtime bloom filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which only kicks in
  * for shuffle-join shapes the optimizer recognizes): here the filter is a
  * first-class value a pipeline can build once, reuse across queries, and
  * apply at the scan edge where it prunes the most.
  *
  * The probe compiles to codegen-friendly built-ins (xxhash64 + array
  * element + shift) — no UDF, so it pipelines inside WholeStageCodegen at
  * the parquet scan. Two carriers for the bit array, same bit layout:
  * [[mightContain]] ships it as one plan literal (fine at kilobytes);
  * [[broadcastFilter]] ships it ONCE per executor as a broadcast variable
  * behind the native [[graft.functions.BloomBitTest]] expression, keeping
  * plan and codegen size FLAT in the filter size — the form for
  * million-bit decontamination filters (BloomSpec pins both the
  * equivalence and the flat-plan property).
  *
  * Build cost: one narrow aggregation over the SMALL side (numHashes rows
  * per key, `bit_or` partial+final agg on word index), then a driver
  * collect of numBits/64 longs — the same driver-side materialization as
  * `df.stat.bloomFilter`, sized by the filter, never by the data.
  */
object Bloom {

  /** An immutable bloom filter: `numBits` bits in 64-bit words,
    * `numHashes` probes per key. False-positive rate ≈
    * (1 - e^(-numHashes·n/numBits))^numHashes for n inserted keys.
    */
  final case class Filter(numBits: Long, numHashes: Int, words: Array[Long]) {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    require(numHashes > 0, "numHashes must be positive")
    require(words.length == (numBits / 64).toInt, "words must hold exactly numBits bits")
  }

  /** Per-seed bit position of `key` — xxhash64 over (key, seed) gives
    * numHashes independent hash functions from one codegen'd kernel.
    */
  private def bitPos(key: Column, seed: Int, numBits: Long): Column =
    pmod(xxhash64(key, lit(seed)), lit(numBits))

  /** Build a filter from the distinct values of `keys(keyCol)`.
    * Distributed: bit positions explode map-side, `bit_or` aggregates
    * per word (partial+final), and only the word array is collected.
    */
  def build(keys: DataFrame, keyCol: String, numBits: Long, numHashes: Int): Filter = {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    require(numHashes > 0, "numHashes must be positive")
    val words = new Array[Long]((numBits / 64).toInt)
    keys
      .select(explode(array((1 to numHashes).map(s => bitPos(col(keyCol), s, numBits)): _*))
        .as("p"))
      .select(
        floor(col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64)).cast("int")).as("b"))
      .groupBy("w")
      .agg(expr("bit_or(b)").as("bits"))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    Filter(numBits, numHashes, words)
  }

  /** Membership probe as a pure Column: true for every inserted key, true
    * with probability ≈fpp for absent keys — callers MUST re-check
    * positives exactly when exactness matters.
    */
  def mightContain(f: Filter, key: Column): Column = {
    val wordsLit = typedlit(f.words.toSeq)
    (1 to f.numHashes)
      .map { s =>
        val p = bitPos(key, s, f.numBits)
        val word = element_at(wordsLit, floor(p / 64).cast("int") + 1)
        call_function("shiftright", word, pmod(p, lit(64)).cast("int"))
          .bitwiseAND(lit(1L)) === lit(1L)
      }
      .reduce(_ && _)
  }

  /** A [[Filter]] whose word array lives in a Spark broadcast variable
    * instead of the plan — build once, probe from any number of queries;
    * the plan carries a constant-size reference however big the filter is.
    */
  final case class BroadcastFilter(numBits: Long, numHashes: Int, words: Broadcast[Array[Long]]) {

    /** [[Bloom.mightContain]] semantics, broadcast carrier: bit-identical
      * positions (same xxhash64 seeds, same word layout), so the two forms
      * are interchangeable probe-for-probe.
      */
    def mightContain(key: Column): Column =
      (1 to numHashes)
        .map { s =>
          val p = bitPos(key, s, numBits)
          ColumnBridge.column(BloomBitTest(ColumnBridge.expression(p), words))
        }
        .reduce(_ && _)

    def destroy(): Unit = words.destroy()
  }

  /** Lift a built [[Filter]] onto the cluster as a [[BroadcastFilter]]. */
  def broadcastFilter(spark: SparkSession, f: Filter): BroadcastFilter =
    BroadcastFilter(f.numBits, f.numHashes, spark.sparkContext.broadcast(f.words))
}
