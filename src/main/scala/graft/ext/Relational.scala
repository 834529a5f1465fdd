package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational EXT operators beyond the reference surface (SURVEY.md §2.3/§2.4
  * EXT). The reference (kesompochy/beametrics) has no joins, sorts, set ops or
  * analytic windows (/root/reference/beametrics/ — single-stream pipeline);
  * these are the operations a metrics/enrichment workload needs at 100 TB,
  * expressed so Catalyst picks the scalable physical plan:
  *
  *  - dimension enrichment broadcasts the small side — no shuffle of the
  *    100 TB fact side, plain `BroadcastHashJoin`;
  *  - top-k per group pre-aggregates to group cardinality BEFORE the rank
  *    window, so the sort operates on |groups| rows, never on raw events;
  *  - distinct counting offers exact (`count_distinct`, one extra shuffle)
  *    and sketched (`approx_count_distinct` HLL, single pass, mergeable
  *    partial state — the only option that holds at 1000 executors).
  */
object Relational extends RelationalRecurrenceOps {

  /** Broadcast-enrich a fact table with a dimension. The dim side is
    * explicitly hinted: at 100 TB the fact side must never shuffle for a
    * dimension lookup (AQE would usually pick this, the hint removes the
    * guess).
    */
  def enrich(fact: DataFrame, dim: DataFrame, joinExpr: Column, how: String = "inner"): DataFrame =
    fact.join(broadcast(dim), joinExpr, how)

  /** Exact interpolated percentiles of an INTEGER column as integer-weighted
    * order statistics — the cross-engine-reproducible percentile: native
    * `percentile`/`quantile_cont` interpolate in doubles and drift by one
    * ulp at large magnitudes (the round-10 `q_conversion_lag` driver
    * mismatch). Here position ×100 = (n−1)·p is an exact BIGINT, so the
    * interpolated value ×100 = v[idx]·(100−rem) + v[idx+1]·rem is ONE exact
    * Long per (group, p) — the caller divides by 100 (or keeps the scaled
    * integer). `ps` are integer percents (50 = median).
    *
    * Plan: one group exchange feeds the rank window, the count window AND
    * the final aggregation (all three share the grouping key); the weighted
    * pick is a conditional sum, never a collect. Ties on the value are
    * harmless — the ordering key IS the value, so the statistic at a rank
    * is tie-order independent. Values must satisfy |v|·100 < 2⁶³.
    *
    * Output: groupCols ++ (n, p<p>_x100 ...).
    */
  def exactPercentilesX100(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 100), "percents in [0,100]")
    val ranked = df
      .withColumn("_rn0",
        row_number().over(Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol)))
          .cast("long") - lit(1L))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
    val aggs = count(lit(1)).as("n") +: ps.map { p =>
      val idx = expr(s"((_n - 1) * $p) DIV 100")
      val rem = expr(s"((_n - 1) * $p) % 100")
      sum(when(col("_rn0") === idx, col(valueCol) * (lit(100L) - rem))
        .when(col("_rn0") === idx + 1L, col(valueCol) * rem)
        .otherwise(lit(0L))).as(s"p${p}_x100")
    }
    ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Top-k rows per group by a metric computed over a pre-aggregated frame.
    *
    * Two-phase: aggregate to (group, entity) grain first (partial+final
    * hash agg — map-side combine shrinks the shuffle), THEN rank with a
    * window over the small aggregate. Ranking raw data with `row_number`
    * would sort every partition of the full input; ranking the aggregate
    * sorts |entities| rows. Ties broken by the entity columns for
    * determinism.
    */
  def topKPerGroup(
      aggregated: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    aggregated
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** [[topKPerGroup]] with DENSE rank — the ranking for candidate frames
    * that contain bit-identical DUPLICATE rows (LSH candidates found via
    * several tables/probes): duplicates share one rank, so ranking can run
    * BEFORE deduplication and WindowGroupLimit still prunes per-partition
    * below the rank shuffle; the caller dedups the ≤k survivors after.
    * A global distinct() before ranking exchanges the whole candidate set
    * instead (measured on [[graft.ext.Graph.knnEdgesLsh]] at ×100:
    * 237 → 60 s, 6.8 → 2.4 GB shuffle). Requires `orderBy` to totally
    * order non-duplicate rows within a group (a score tie between two
    * DISTINCT rows would share a rank and could emit > k rows).
    */
  def topKPerGroupDense(
      aggregated: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    aggregated
      .withColumn("rank", dense_rank().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact + approximate distinct counts per group in one pass.
    * `count_distinct` expands to a two-shuffle expand/agg; the HLL sketch
    * (`approx_count_distinct`, rsd tunable) is single-shuffle with constant
    * per-group state — the 100 TB default.
    */
  def distinctPerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count_distinct(col(valueCol)).as("exact_distinct"),
        approx_count_distinct(col(valueCol), 0.01).as("approx_distinct"))

  /** As-of join — match each fact row to the LATEST dimension row at or
    * before its timestamp (per key): the time-series enrichment operator
    * (prices, slowly-changing dims, config versions) Spark lacks natively.
    *
    * Composition (SURVEY §7.4 tier a — built-ins express it exactly): tag
    * dim and fact rows, union them on (key, time), and take
    * `last(dimVal, ignoreNulls)` over a per-key time-ordered window up to
    * the current row; fact rows then carry the most recent dim value.
    * At equal timestamps the dim row sorts FIRST, so `time >= dimTime`
    * is inclusive, matching DuckDB's ASOF JOIN.
    *
    * Scale shape: ONE shuffle on the key + one in-partition sort — the
    * same cost as any per-key ordered operator. The naive alternatives
    * explode: a theta-join (fact.ts >= dim.ts) is a per-key cross
    * product, and a windowed subquery re-scans the dim per fact row.
    * Dim rows must be unique per (key, time) — pre-dedupe upstream
    * (duplicate keys at one instant have no well-defined "latest").
    *
    * The tracked state is `last(struct(asofCols))` over dim rows — the
    * whole latest row, not per-column last-non-null — so a dim row whose
    * asof value is genuinely NULL wins the match and yields NULL (ASOF
    * semantics), instead of an OLDER row's value leaking through.
    *
    * Returns fact columns + `asofCols` (null where no dim row precedes).
    */
  def asofJoin(
      fact: DataFrame,
      dim: DataFrame,
      keyCol: String,
      factTimeCol: String,
      dimTimeCol: String,
      asofCols: Seq[String]): DataFrame = {
    val factCols = fact.columns.toSeq
    val helperCols = Seq("__t", "__is_dim", "__asof")
    require(helperCols.forall(h => !factCols.contains(h) && !asofCols.contains(h)),
      s"fact/asof columns must not use the reserved names ${helperCols.mkString(", ")}")
    require(asofCols.forall(c => !factCols.contains(c)),
      s"asofCols ${asofCols.mkString(", ")} must be disjoint from fact columns")
    val asofStructType = org.apache.spark.sql.types.StructType(
      asofCols.map(c => dim.schema(c).copy(nullable = true)))
    val taggedFact = fact
      .select((factCols.map(col) :+
        col(factTimeCol).as("__t") :+
        lit(0).as("__is_dim")) :+
        lit(null).cast(asofStructType).as("__asof"): _*)
    val taggedDim = dim
      .select((factCols.map(c =>
        if (c == keyCol) col(keyCol) else lit(null).cast(fact.schema(c).dataType).as(c)) :+
        col(dimTimeCol).as("__t") :+
        lit(1).as("__is_dim")) :+
        struct(asofCols.map(col): _*).cast(asofStructType).as("__asof"): _*)
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col("__t").asc, col("__is_dim").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedFact
      .unionByName(taggedDim)
      // __asof is non-null exactly on dim rows (a struct of nulls is still a
      // non-null struct), so last(ignoreNulls) = the latest dim ROW
      .select((factCols.map(col) :+ col("__is_dim")) :+
        last(col("__asof"), ignoreNulls = true).over(w).as("__asof"): _*)
      .filter(col("__is_dim") === 0)
      .select(factCols.map(col) ++
        asofCols.map(c => col("__asof").getField(c).as(c)): _*)
  }

  /** Bucketed range join — match fact values into interval tables without
    * a cross product: intervals explode into the fixed-width buckets they
    * cover, facts compute their bucket, and the match is an EQUI-join on
    * the bucket plus an exact bounds re-check. Catalyst turns a theta
    * range join into BroadcastNestedLoopJoin (fact × intervals — dead at
    * 100 TB when the interval table outgrows a broadcast); the bucketed
    * form shuffles on an 8-byte key like any equi-join, at the cost of
    * ~(interval width / bucketWidth) index rows per interval.
    *
    * Intervals are [lo, hi) half-open; `bucketWidth` should be on the
    * order of the typical interval width.
    */
  def rangeJoinBucketed(
      fact: DataFrame,
      valueCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val idx = intervals
      // empty/inverted intervals match nothing and would otherwise produce a
      // DESCENDING bucket sequence (sequence(2,1) counts down in Spark),
      // indexing buckets the interval does not cover
      .filter(col(hiCol) > col(loCol))
      .withColumn(
        "__bucket",
        explode(sequence(
          floor(col(loCol) / bucketWidth).cast("long"),
          // last covered bucket = largest b with b*width < hi, i.e.
          // ceil(hi/width)-1 — exact at any magnitude (an epsilon subtraction
          // breaks down when the interval width approaches the epsilon)
          (ceil(col(hiCol) / bucketWidth).cast("long") - 1))))
    fact
      .withColumn("__bucket", floor(col(valueCol) / bucketWidth).cast("long"))
      .join(idx, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Bucketed interval OVERLAP join — the interval×interval twin of
    * [[rangeJoinBucketed]]: both sides explode into the fixed-width
    * buckets they cover and meet on an equi-join, so the theta overlap
    * predicate (`a.lo < b.hi AND b.lo < a.hi`, half-open intervals) never
    * degenerates into a nested-loop product. A pair whose intervals share
    * several buckets would match once per shared bucket; instead of a
    * post-join distinct (a full exchange of the match set) each pair is
    * kept only in its FIRST shared bucket — `max(bucket(a.lo),
    * bucket(b.lo))`, which both sides cover whenever they overlap — so
    * the join output is duplicate-free by construction. Cost model is the
    * same as the point form: ~(interval width / bucketWidth) index rows
    * per interval per side; size `bucketWidth` to the typical interval.
    * Column sets must be disjoint; bounds must be integral (epoch micros
    * in the declared queries — exact LONG math, no float drift).
    */
  def intervalJoinBucketed(
      left: DataFrame,
      lLoCol: String,
      lHiCol: String,
      right: DataFrame,
      rLoCol: String,
      rHiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint")
    def covered(lo: String, hi: String)(df: DataFrame): DataFrame = df
      .filter(col(hi) > col(lo))
      .withColumn("__bucket", explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        (ceil(col(hi).cast("double") / bucketWidth).cast("long") - 1))))
    covered(lLoCol, lHiCol)(left)
      .join(covered(rLoCol, rHiCol)(right), Seq("__bucket"))
      .filter(col(lLoCol) < col(rHiCol) && col(rLoCol) < col(lHiCol))
      // first shared bucket: dedup-free single match per overlapping pair
      .filter(col("__bucket") === greatest(
        floor(col(lLoCol) / bucketWidth).cast("long"),
        floor(col(rLoCol) / bucketWidth).cast("long")))
      .drop("__bucket")
  }

  /** Merge overlapping (or touching, half-open) intervals per key — the
    * gaps-and-islands pattern: one shuffle on the key, one in-partition
    * sort by (lo, hi), then a running `max(hi)` over PRECEDING rows marks
    * island starts (`lo >` the running max) and a running sum of the
    * flags numbers the islands; a final per-(key, island) agg emits the
    * merged [min lo, max hi). No self-join, no collect — the same
    * window-over-aggregate discipline as sequence packing, so a key's
    * intervals only ever meet inside their own partition. Returns
    * keyCols + (island, lo, hi).
    */
  def mergeIntervals(
      df: DataFrame,
      keyCols: Seq[String],
      loCol: String,
      hiCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(loCol).asc, col(hiCol).asc)
    val prevMax = max(col(hiCol)).over(
      byKey.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__new_island",
        when(prevMax.isNull || col(loCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("__new_island")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keyCols.map(col) :+ col("island"): _*)
      .agg(min(col(loCol)).as(loCol), max(col(hiCol)).as(hiCol))
  }

  /** Robust per-key outlier flags via median absolute deviation — the
    * monitoring-grade anomaly detector (vs q_group_zscore's mean/σ,
    * which an outlier inflates into masking itself; the median/MAD pair
    * has a 50% breakdown point). Input is an already-aggregated frame
    * (key, value) — the 100 TB discipline is aggregate-then-robust-stats:
    * the raw scan reduces to |keys × buckets| rows first. Both exact
    * `percentile` passes run as whole-partition WINDOW aggregates over
    * the SAME key partitioning, so the plan is one exchange + two Window
    * operators — never a join-back that would re-execute (re-scan) the
    * input aggregate per reference. Flags `|x − med| > k·MAD` strictly,
    * so a constant series (MAD 0) only flags genuine departures. Exact
    * interpolating percentile on both sides (DuckDB `quantile_cont`
    * twin) — order statistics of the input multiset, no summation drift.
    */
  def madOutliers(
      perKey: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      k: Double): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*)
    perKey
      .withColumn("med", expr(s"percentile($valueCol, 0.5)").over(w))
      .withColumn("__ad", abs(col(valueCol) - col("med")))
      .withColumn("mad", expr("percentile(__ad, 0.5)").over(w))
      .withColumn("is_anomaly", col("__ad") > lit(k) * col("mad"))
      .drop("__ad")
  }

  /** Per-group mergeable distinct-count sketches (DataSketches HLL via
    * Spark's `hll_sketch_agg`) — the incremental-aggregation story at
    * 100 TB: compute fine-grained sketches ONCE (per day, per source),
    * persist the binary column, and answer any coarser rollup later by
    * merging sketches ([[hllRollup]]) without rescanning data. Unlike
    * `approx_count_distinct`, whose HLL state is internal, the sketch is
    * a first-class value that survives a parquet round-trip.
    */
  def hllSketches(df: DataFrame, groupCols: Seq[String], valueCol: String, lgK: Int = 12)
      : DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge previously computed sketches to a coarser grouping and estimate.
    * Runs over |sketch rows|, never the raw data.
    */
  def hllRollup(sketches: DataFrame, rollupCols: Seq[String]): DataFrame = {
    val merged =
      if (rollupCols.isEmpty) sketches.agg(hll_union_agg(col("sketch")).as("sketch"))
      else sketches.groupBy(rollupCols.map(col): _*).agg(hll_union_agg(col("sketch")).as("sketch"))
    merged.withColumn("estimate", hll_sketch_estimate(col("sketch")))
  }

  /** Per-set KMV (bottom-k) sketch frame: `(s, h)` = the k smallest 60-bit
    * hashes of each set's distinct ids. One distinct pass over
    * (set, hash); the rank ≤ k filter prunes per-partition BEFORE the
    * group exchange (WindowGroupLimit) — each partition forwards at most
    * k hashes per set, which IS the partial-sketch merge at 1000
    * executors. Unlike HLL ([[hllSketches]]) the sketch is a pure
    * function of the set — deterministic, order-independent, and closed
    * under the theta-sketch set algebra (union: re-rank the merged
    * hashes; intersection: see q_kmv_intersect) — so estimates are
    * bit-exact cross-engine.
    */
  def kmvSketch(df: DataFrame, setCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    val w = Window.partitionBy("s").orderBy("h")
    df.select(col(setCol).as("s"), Dedup.md5Long(col(idCol).cast("string")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("s"), col("h"))
  }

  /** The KMV estimator as a Column: `(k-1)·M / h_k` floored (Bar-Yossef
    * et al., hash space M = 2^60 of [[Dedup.md5Long]]), exact count when
    * the sketch is unsaturated (`n_kept < k`). Shared by every batch KMV
    * query so the estimator can never drift between them (the streaming
    * twin in `StatefulOps.kmvDistinct` computes the same formula over its
    * TreeSet state — its spec pins stream ≡ batch).
    */
  def kmvEstimate(nKept: Column, hK: Column, k: Int): Column = {
    val m = math.pow(2, 60) // exactly representable double
    when(nKept < k, nKept)
      .otherwise(floor(lit((k - 1).toDouble * m) / hK).cast("long"))
  }

  /** Deterministic HLL register frame `(s, bucket, m)` over the 60-bit
    * [[Dedup.md5Long]] hash space: bucket = top 6 bits (64 registers),
    * rho = leading-zero count of the 54-bit remainder + 1 (via
    * `length(bin(w))` — exact integer arithmetic, no float log), register
    * = max(rho). Unlike `approx_count_distinct` (whose register encoding
    * and merge are engine-internal, so its estimate can't be mirrored),
    * every piece here is a pure function of the set: max is the merge, so
    * partial aggregation IS the 1000-executor sketch merge, and a SQL
    * oracle reproduces registers — and the estimate — bit-for-bit.
    * State: 64 registers/group vs KMV's k hashes; where KMV pays a
    * per-group sort (WindowGroupLimit), HLL is one hash-aggregate.
    */
  def hllRegisters(df: DataFrame, setCol: String, idCol: String): DataFrame = {
    val h = Dedup.md5Long(col(idCol).cast("string"))
    val w = h.bitwiseAND(lit((1L << 54) - 1))
    df.select(
        col(setCol).as("s"),
        shiftright(h, 54).as("bucket"),
        when(w === 0, lit(55)).otherwise(lit(55) - length(bin(w))).as("rho"))
      .groupBy("s", "bucket")
      .agg(max(col("rho")).as("m"))
  }

  /** HLL estimate per set from a [[hllRegisters]] frame, hash-exact
    * cross-engine. The harmonic sum Σ 2^(-M_j) is kept EXACT as the
    * integer Σ 2^(55-M_j) (≤ 64·2^55 = 2^61, fits BIGINT); the raw
    * estimate α₆₄·64²·2^55 / S is one fixed-order double chain; and the
    * small-range linear-counting branch (raw ≤ 2.5·64, V empty registers
    * > 0) reads a 64-entry PRE-QUANTIZED lookup ⌊64·ln(64/V)⌋ — only 64
    * possible inputs, so the float log never reaches the comparison
    * surface. Missing registers (buckets no hash landed in) count as 0
    * via a 64-bucket grid per set.
    */
  def hllEstimate(registers: DataFrame): DataFrame = {
    val lc = typedLit((1 to 64).map(v => math.floor(64.0 * math.log(64.0 / v)).toLong))
    val grid = registers
      .select(col("s"))
      .distinct()
      .select(col("s"), explode(sequence(lit(0L), lit(63L))).as("bucket"))
    val full = grid
      .join(registers, Seq("s", "bucket"), "left")
      .select(col("s"), coalesce(col("m"), lit(0)).as("m"))
    val raw = (lit(0.709) * lit(4096.0) * lit(36028797018963968.0)) / // α·m²·2^55
      col("hsum").cast("double")
    full
      .groupBy("s")
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - m)")).as("hsum"),
        sum(when(col("m") === 0, 1L).otherwise(0L)).as("v"))
      .select(
        col("s"),
        when(raw <= 160.0 && col("v") > 0, element_at(lc, col("v").cast("int")))
          .otherwise(floor(raw).cast("long"))
          .as("est"))
  }

  /** The 100 TB form of [[rollingDistinct]]: rolling N-day APPROX
    * distinct via mergeable HLL sketches. Exact rolling distinct re-keys
    * every (entity, day) pair ×N through a distinct shuffle; here the raw
    * data is touched ONCE (per-day sketches, map-side partial
    * aggregation), and the window merge unions N sketches per day over a
    * frame of |days| rows — the ×N explode moves kilobyte sketches, not
    * the entity universe. Estimate error is the sketch's rsd (~1.6% hll
    * default lgK=12); RelationalSpec pins the error envelope against the
    * exact form.
    */
  def rollingDistinctHll(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      windowDays: Int,
      lgK: Int = 12): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val daily = hllSketches(
      events.select(col(entityCol).as("__e"), to_date(col(tsCol)).as("__d")),
      Seq("__d"), "__e", lgK)
    trimTrailing(
      dayContributions(daily, windowDays)
        .groupBy(col("win_day"))
        .agg(hll_union_agg(col("sketch")).as("sketch"), originFlag))
      .select(col("win_day"),
        hll_sketch_estimate(col("sketch")).cast("long").as("active_approx"))
  }

  /** Arg-max per group with var-length payloads, at scale: hash-aggregate
    * `max(ordCol)` per key, then join back on (key, ord) to fetch the
    * payload columns — BOTH phases stay in codegen'd HashAggregate /
    * hash join. The direct `max_by(payload, ord)` form is the right call
    * for fixed-width payloads, but a string payload makes its aggregation
    * buffer var-length, which demotes the whole aggregate to
    * SortAggregate — a full per-partition sort of the input. The join
    * back is co-partitioned with the aggregation (same key), and AQE
    * broadcasts the |groups|-sized max side when it fits.
    *
    * `ordCol` must be unique per key (ties would duplicate rows) — true
    * for arrival ids, sequence numbers, unique timestamps.
    */
  def argMaxJoin(
      df: DataFrame,
      keyCol: String,
      ordCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val maxed = df
      .groupBy(col(keyCol))
      .agg(max(col(ordCol)).as(ordCol), count(lit(1)).as("n_rows"))
    df.select((keyCol +: ordCol +: payloadCols).map(col): _*)
      .join(maxed, Seq(keyCol, ordCol))
  }

  /** Equi-width histogram — the profiling aggregation for numeric columns:
    * one hash aggregation on the bucket index (map-side combine shrinks the
    * shuffle to |buckets| rows per partition), no sort until the final
    * order-by over |buckets| rows. `bucket_lo` is the bucket's inclusive
    * lower edge (`bucket * width` — exact when width is representable).
    */
  def histogram(df: DataFrame, valueCol: String, width: Double): DataFrame = {
    require(width > 0, "width must be positive")
    df.groupBy(floor(col(valueCol) / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"), (col("bucket") * width).as("bucket_lo"), col("cnt"))
  }

  /** Time-series gap fill (resample): per-key counts in `bucketSec` buckets
    * with MISSING buckets zero-filled over the global [min, max] bucket
    * range — the densification step before charting/forecasting, where a
    * absent window must read as 0, not as no row.
    *
    * Scale shape: the raw stream aggregates FIRST (partial+final count on
    * (key, bucket) — the only pass over the data); the spine is
    * |keys| × |buckets| generated rows (`sequence` + explode on a
    * 1-row-broadcast bounds frame — never a scan of the input), and the
    * left join runs at spine size, which is output-sized, not input-sized.
    * The aggregate is materialized once (`intermediate`) — it feeds three
    * consumers (bounds, key list, join) and Spark does not share common
    * subplans, so the declarative form would re-scan the raw input 3×.
    */
  def gapFill(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      bucketSec: Long,
      intermediate: Dedup.Intermediate = Dedup.Intermediate.Local): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val bucketed = intermediate(
      df.groupBy(
          col(keyCol),
          (floor(unix_timestamp(col(tsCol)) / bucketSec) * bucketSec).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt")),
      "gapfill-buckets")
    val bounds = bucketed.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val spine = bucketed
      .select(col(keyCol))
      .distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol), explode(sequence(col("lo"), col("hi"), lit(bucketSec))).as("bucket"))
    spine
      .join(bucketed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** One-pass column profiler — the data-quality summary a pipeline runs
    * before trusting a new table: per-column null count, exact distinct
    * count, and min/max (stringified for a uniform long-format schema).
    * All columns profile in a SINGLE global aggregation (Spark plans the
    * multi-column distinct via one Expand — columns+1 passes over rows
    * inside one shuffle, never one job per column), then the wide result
    * row unpivots to (col_name, n_null, n_distinct, min_s, max_s) rows.
    *
    * Caller picks columns whose min/max stringification is
    * engine-portable when oracle-checking (integers/strings; raw doubles
    * render differently across engines).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nulls"),
        count_distinct(col(c)).as(s"__${c}_distinct"),
        min(col(c)).cast("string").as(s"__${c}_min"),
        max(col(c)).cast("string").as(s"__${c}_max")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = array(cols.map(c =>
      struct(
        lit(c).as("col_name"),
        col(s"__${c}_nulls").as("n_null"),
        col(s"__${c}_distinct").as("n_distinct"),
        col(s"__${c}_min").as("min_s"),
        col(s"__${c}_max").as("max_s"))): _*)
    wide.select(explode(structs).as("p")).select(col("p.*"))
  }

  /** Distribution-drift monitor between two cohorts of one table
    * (reference vs current ingestion period): equi-width histogram of
    * `valueCol` with BOTH cohorts counted in ONE scan (conditional
    * sums), per-bucket quantized frequencies and absolute
    * frequency-difference, plus a total row carrying the
    * total-variation distance TVD = ½·Σ|p_i − q_i|.
    *
    * Determinism is the design constraint: per-bucket deviations use the
    * common-denominator INTEGER numerator |cnt_ref·n_cur − cnt_cur·n_ref|
    * (long sums are exactly associative — a float Σ|p−q| would depend on
    * Spark's partial-aggregation order and could never hash-match an
    * oracle), with ONE IEEE division at the end. The integer form is
    * exact while cnt·n < 2^63 (≈3·10⁹ rows per cohort); beyond that
    * scale the float path with a tolerance compare is the documented
    * fallback. The bucket frame (≤ |buckets| rows) is lazy-checkpointed:
    * totals and the output rows reuse it, not the corpus scan.
    *
    * Output: `(bucket, cnt_ref, cnt_cur, freq_ref_q6, freq_cur_q6,
    * dev_q6)` per bucket, and a `bucket = -1` total row whose `dev_q6`
    * is the TVD (q6 = floor(·10⁶)).
    */
  def distDrift(df: DataFrame, valueCol: String, isRef: Column, width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val b = Dedup.Intermediate.LocalLazy(
      df.select(
        floor(col(valueCol) / width).cast("long").as("bucket"),
        isRef.as("__ref"))
        .groupBy("bucket")
        .agg(
          sum(when(col("__ref"), 1L).otherwise(0L)).as("cnt_ref"),
          sum(when(col("__ref"), 0L).otherwise(1L)).as("cnt_cur")),
      "drift_buckets")
    val tot = b.agg(sum(col("cnt_ref")).as("__na"), sum(col("cnt_cur")).as("__nb"))
    val perBucket = b
      .crossJoin(broadcast(tot))
      .select(
        col("bucket"), col("cnt_ref"), col("cnt_cur"),
        floor(col("cnt_ref").cast("double") * 1e6 / col("__na")).cast("long").as("freq_ref_q6"),
        floor(col("cnt_cur").cast("double") * 1e6 / col("__nb")).cast("long").as("freq_cur_q6"),
        floor(abs(col("cnt_ref") * col("__nb") - col("cnt_cur") * col("__na")).cast("double") * 1e6
          / (col("__na") * col("__nb")).cast("double")).cast("long").as("dev_q6"))
    val total = b
      .crossJoin(broadcast(tot))
      .groupBy(col("__na"), col("__nb"))
      .agg(sum(abs(col("cnt_ref") * col("__nb") - col("cnt_cur") * col("__na"))).as("__num"))
      .select(
        lit(-1L).as("bucket"),
        col("__na").as("cnt_ref"), col("__nb").as("cnt_cur"),
        lit(1000000L).as("freq_ref_q6"), lit(1000000L).as("freq_cur_q6"),
        floor(col("__num").cast("double") * 1e6
          / (lit(2.0) * col("__na") * col("__nb"))).cast("long").as("dev_q6"))
    perBucket.unionByName(total)
  }

  /** Deequ-style data-quality audit, row-level checks: evaluate every
    * predicate in ONE aggregation pass over the table (sum-of-CASE
    * partial+final HashAggregate — the scan count never depends on the
    * number of checks), then unpivot the wide result row to one
    * `(check_name, n_checked, violations)` row per check. A row where
    * the predicate evaluates NULL (null operand in a comparison) counts
    * as a VIOLATION — a completeness failure must not pass a range
    * check.
    */
  def auditRowChecks(
      df: DataFrame,
      checks: Seq[(String, Column)],
      uniqueChecks: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(uniqueChecks.forall(_._2.nonEmpty), "uniqueness checks need key columns")
    val aggs = (count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case ((_, ok), i) =>
        sum(when(ok, 0L).otherwise(1L)).as(s"__v$i")
      }) ++
      uniqueChecks.zipWithIndex.map { case ((_, keyCols), i) =>
        count_distinct(struct(keyCols.map(col): _*)).as(s"__d$i")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(name).as("check_name"),
        col("__n").as("n_checked"),
        col(s"__v$i").as("violations"))
    } ++
      // uniqueness violations = rows beyond the first per key. Exact
      // composite distinct — the same scan via one Expand (Catalyst's
      // multi-distinct rewrite), the price of an exact gate; monitoring
      // dashboards can run the mergeable HLL form ([[hllSketches]]).
      uniqueChecks.zipWithIndex.map { case ((name, _), i) =>
        struct(
          lit(name).as("check_name"),
          col("__n").as("n_checked"),
          (col("__n") - col(s"__d$i")).as("violations"))
      }
    wide.select(explode(array(entries: _*)).as("c")).select(col("c.*"))
  }

  /** Referential-integrity audit: fact keys with no match in the
    * dimension's key set. Both sides pre-aggregate to DISTINCT keys
    * before the join (map-side combine shrinks the shuffle to key
    * cardinality), then ONE left join counts total and orphan keys in
    * the same aggregation — no second pass, no anti-join + count pair.
    * `n_checked` is the distinct fact-key count; a violation is an
    * orphan KEY, not an orphan row.
    */
  def auditReferential(
      fact: DataFrame,
      name: String,
      factKey: String,
      dim: DataFrame,
      dimKey: String): DataFrame = {
    val factKeys = fact.select(col(factKey).as("__k")).distinct()
    val dimKeys = dim.select(col(dimKey).as("__k")).distinct().withColumn("__hit", lit(1))
    factKeys
      .join(dimKeys, Seq("__k"), "left")
      .agg(
        count(lit(1)).as("__n"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("__v"))
      .select(
        lit(name).as("check_name"),
        col("__n").as("n_checked"),
        col("__v").as("violations"))
  }

  /** Ordered conversion funnel: users reaching each step, where step i+1
    * counts only events STRICTLY AFTER the user's step-i timestamp (the
    * product-analytics "did A, then B, then C" question — unordered
    * presence counting answers a different, weaker question).
    *
    * Shape: one aggregation per step, each joined to the previous step's
    * per-user frame on the user key. Every frame after step 1 only
    * SHRINKS (funnel monotonicity), and all joins/aggregations share the
    * user-key partitioning, so at scale the chain is one shuffle of the
    * filtered fact per step with co-partitioned joins — never a
    * per-user collect or a sequence materialization. Returns
    * (step_idx, step, users).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGapSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapSec.forall(_ > 0), "maxGapSec must be positive when set")
    // per-user first-event-time frames, one per completed step.
    // Without a gap, greedy-earliest is existence-optimal (any event
    // after a later anchor is also after the earliest one). WITH a gap
    // these are FIRST-TOUCH semantics: the chain anchors at the user's
    // first step-1 event and each step must convert within maxGapSec of
    // the previous step's first qualifying event — a user whose first
    // anchor expires does NOT re-anchor (the standard first-touch
    // conversion window; re-anchoring "any chain exists" semantics needs
    // a per-user sequence DP, a different operator).
    val stepFrames = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stepType, _)) =>
        val matching = events
          .filter(col(typeCol) === stepType)
          .select(col(userCol), col(tsCol).as("__ev_t"))
        val reached = prev match {
          case None => matching
          case Some(p) =>
            // millisecond gap comparison — same boundary semantics as
            // [[funnelReanchor]] for the identically-named parameter
            val inWindow = maxGapSec match {
              case Some(gap) =>
                col("__ev_t") > col("__prev_t") &&
                  unix_millis(col("__ev_t")) <= unix_millis(col("__prev_t")) + gap * 1000L
              case None => col("__ev_t") > col("__prev_t")
            }
            matching
              .join(p.select(col(userCol), col("__t").as("__prev_t")), Seq(userCol))
              .filter(inWindow)
              .select(col(userCol), col("__ev_t"))
        }
        Some(reached.groupBy(col(userCol)).agg(min(col("__ev_t")).as("__t")))
    }.flatten
    val counts = stepFrames.zip(steps).zipWithIndex.map { case ((frame, stepType), i) =>
      frame.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step_idx"), lit(stepType).as("step"), col("users"))
    }
    counts.reduce(_.unionByName(_)).orderBy("step_idx")
  }

  /** Re-anchoring (EXISTENCE) funnel: does ANY ordered chain
    * step1 < step2 < … exist with each step within `maxGapSec` of the
    * previous — the complement of [[funnel]]'s first-touch semantics (a
    * user whose first anchor expires here re-anchors on a later step-1
    * event).
    *
    * Algorithm: one pass over each user's time-ordered sequence keeping,
    * per prefix length j, the LATEST achievable completion time. Latest
    * is optimal for extension: a later step-j completion admits every
    * future step-(j+1) candidate a smaller one admits and more (events
    * are processed in time order, so the stored value is always below
    * the candidate's time; the gap window `t ≤ s[j] + gap` is widest for
    * the largest s[j]). State per user is m+1 longs.
    *
    * Shape: one user-keyed aggregation (collect_list bounded by per-user
    * activity — the q_user_sequences contract), the DP as a fold
    * expression, one tiny final aggregate. Returns (step_idx, step,
    * users) with users = count reaching step ≥ j.
    */
  def funnelReanchor(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGapSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(maxGapSec > 0, "maxGapSec must be positive")
    val m = steps.length
    val gapMs = maxGapSec * 1000L
    val stepsLit = typedLit(steps)
    val Unreached = Long.MinValue // not -1: pre-1970 ms are legitimate
    // ONE fold step per distinct millisecond, carrying the SET of step
    // types present at that ms: every stage updates against the
    // pre-millisecond state, so an equal-timestamp step-(j-1) event can
    // neither chain into nor SHADOW a same-ms step-j candidate (with
    // per-event folding, a tie-sorted-earlier completion at time t made
    // the strict `t > prev` reject chains valid through older
    // completions — diverging from existence semantics).
    val seqs = events
      .filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol), unix_millis(col(tsCol)).as("t"))
      .agg(collect_set(col(typeCol)).as("ys"))
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(struct(col("t"), col("ys")))).as("seq"))
    // state: s(0)=0 (empty prefix), s(j)=Unreached sentinel
    val init = array((lit(0L) +: Seq.fill(m)(lit(Unreached))): _*)
    val folded = aggregate(col("seq"), init, (st, e) =>
      transform(st, (v, j) => {
        // 0-based j over the state; element_at(st, j) (1-based) = s[j-1]
        val prev = element_at(st, j)
        val eq = array_contains(e.getField("ys"), element_at(stepsLit, j))
        val t = e.getField("t")
        when(j === 0, lit(0L))
          .when(eq && j === 1, greatest(v, t)) // first step anchors freely
          .when(eq && prev =!= Unreached && t > prev && t <= prev + gapMs, greatest(v, t))
          .otherwise(v)
      }))
    val reached = seqs.select(folded.as("s"))
    val counts = (1 to m).map(j =>
      coalesce(sum(when(element_at(col("s"), j + 1) =!= Unreached, 1L).otherwise(0L)), lit(0L))
        .as(s"c$j"))
    val wide = reached.agg(counts.head, counts.tail: _*)
    val rows = array((1 to m).map(j =>
      struct(lit(j).as("step_idx"), lit(steps(j - 1)).as("step"),
        col(s"c$j").as("users"))): _*)
    wide.select(explode(rows).as("r")).select(col("r.*")).orderBy("step_idx")
  }

  /** Rolling N-day distinct-count (the "7-day active users" KPI). SQL
    * window frames cannot express COUNT(DISTINCT) over a RANGE frame;
    * the exact distributed form: project each (entity, day) to the N
    * days it contributes to (map-side explode, ×N row growth bounded by
    * the small N), then one distinct + count per contributing day. Two
    * key-partitioned shuffles, no per-day self-joins, no set unions.
    * A day appears iff some entity was active within its trailing
    * window; days past the corpus max are trimmed (1-row broadcast
    * bound). Compose with [[gapFill]] for a dense zero-filled spine.
    */
  def rollingDistinct(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    trimTrailing(
      dayContributions(
        events.select(col(entityCol).as("__e"), to_date(col(tsCol)).as("__d")).distinct(),
        windowDays)
        .groupBy(col("win_day"))
        .agg(count_distinct(col("__e")).as("active"), originFlag))
      .select(col("win_day"), col("active"))
  }

  /** Explode each (payload, __d) row to the `windowDays` win_days it
    * contributes to, keeping the offset for [[originFlag]].
    */
  private def dayContributions(withDay: DataFrame, windowDays: Int): DataFrame =
    withDay.select(
      col("*"),
      posexplode(sequence(col("__d"), date_add(col("__d"), windowDays - 1)))
        .as(Seq("__i", "win_day")))
      .drop("__d")

  /** Offset-0 flag: "this win_day exists in the source" — computed inside
    * the same aggregation that builds the window, so the trailing-edge
    * trim needs no second input scan.
    */
  private def originFlag: Column =
    max(when(col("__i") === 0, 1).otherwise(0)).as("__origin")

  /** Drop win_days past the corpus max day. The unpartitioned window runs
    * over the aggregated |days|-row frame, never the raw input.
    */
  private def trimTrailing(agg: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    agg
      .withColumn("__max_origin",
        max(when(col("__origin") === 1, col("win_day"))).over(Window.partitionBy()))
      .filter(col("win_day") <= col("__max_origin"))
  }

  /** Cohort retention matrix: users grouped by first-active day, counted
    * on each later day-offset — the activation/retention table every
    * analytics engine ships. One distinct projection of (user, day), one
    * per-user min (cohort day), one co-partitioned join back, one final
    * aggregate: two shuffles total regardless of day range, both on keys
    * that scale with |users|, not |events|.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      maxOffsetDays: Int): DataFrame = {
    require(maxOffsetDays >= 0, "maxOffsetDays must be non-negative")
    val days = events.select(col(userCol), to_date(col(tsCol)).as("__d")).distinct()
    val cohorts = days.groupBy(col(userCol)).agg(min(col("__d")).as("__cohort"))
    days
      .join(cohorts, Seq(userCol))
      .select(col(userCol), col("__cohort"),
        datediff(col("__d"), col("__cohort")).as("day_offset"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_day"), col("day_offset"))
      .agg(count_distinct(col(userCol)).as("users"))
  }

  /** TPC-H Q22 shape: above-average-balance customers with NO orders,
    * rolled up per nation — scalar-subquery threshold (1-row broadcast)
    * composed with a left-anti join against the fact table. The balance
    * compare is cross-multiplied to exact integers (cents·n > Σ cents) so
    * no division reaches the filter; the anti-join is a plain left_anti on
    * the order custkey (shuffle or broadcast at AQE's discretion; never a
    * per-row NOT EXISTS probe). Expects TPC-H column names
    * (`c_custkey`, `c_nationkey`, `c_acctbal`; `o_custkey`).
    *
    * Emits (nation, n_cust, total_bal) — callers order as needed.
    */
  def richInactive(customer: DataFrame, orders: DataFrame): DataFrame = {
    val cust = customer.select(col("c_custkey"), col("c_nationkey"),
      floor(col("c_acctbal") * 100).cast("long").as("cents"))
    val stats = cust
      .filter(col("cents") > 0)
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s_cents"))
    cust
      .join(broadcast(stats))
      .filter(col("cents") * col("n") > col("s_cents"))
      .join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("nation"))
      .agg(count(lit(1)).as("n_cust"),
        (sum(col("cents")).cast("double") / 100.0).as("total_bal"))
  }

  /** Per-replicate affine-hash constants: a 60-bit ODD multiplier a_b
    * (split into 30-bit limbs ah/al for overflow-free modular multiply)
    * and a 60-bit additive c_b, md5-derived from the replicate index —
    * deterministic, and INTERPOLATED VERBATIM into the oracle SQL so
    * both engines use the same numbers by construction.
    */
  private[ext] def bootConsts(reps: Int): (Seq[Long], Seq[Long], Seq[Long]) = {
    val a = (0 until reps).map(b => Similarity.md5LongScala(s"boot-a-$b") | 1L)
    (a.map(_ >> 30), a.map(_ & ((1L << 30) - 1)),
      (0 until reps).map(b => Similarity.md5LongScala(s"boot-c-$b")))
  }

  /** Poisson(1) bootstrap weight for replicate `b` of a row: ONE md5 per
    * row (`h = md5Long(key)`, computed by the caller and split into
    * 30-bit halves), then the per-replicate affine draw
    * `u_b = (a_b·h + c_b) mod 2^60` computed limb-wise
    * (`al·hl + ((ah·hl + al·hh) mod 2^30)·2^30 + c`, every intermediate
    * < 2^62 — no BIGINT overflow on either engine). a_b is ODD, so the
    * map is a BIJECTION of Z_2^60: u_b is exactly as uniform as the md5
    * hash, per replicate — a handful of integer ops instead of the
    * per-(row, replicate) md5 that first cost 6.4 s at sf0.1. The draw
    * goes through the Poisson(1) inverse CDF as INTEGER threshold
    * compares (floor(cdf·2^60) literals) — no float arithmetic anywhere,
    * so any engine computes the identical weight. Tail truncated at 6
    * (cdf ≈ 0.999999).
    */
  def bootWeight(b: Column, hLo: Column, hHi: Column, reps: Int): Column = {
    val (ahs, als, cs) = bootConsts(reps)
    val ah = element_at(array(ahs.map(lit): _*), b + 1)
    val al = element_at(array(als.map(lit): _*), b + 1)
    val cB = element_at(array(cs.map(lit): _*), b + 1)
    weightFromConsts(ah, al, cB, hLo, hHi)
  }

  /** [[bootWeight]] with the replicate index known AT PLAN-BUILD time: the
    * per-replicate constants resolve to three Scala longs instead of three
    * `element_at(array(<reps> literals), b+1)` lookups the optimizer must
    * constant-fold per replicate. Identical draw by construction (same
    * constants, same algebra) — the point is the EXPRESSION TREE SIZE:
    * round-16 PhaseProbe charged `q_bootstrap_ci` 0.8–0.9 s of driver-side
    * Column construction plus 0.25–0.34 s of optimization PER REP (×2 — the
    * noop write re-plans), almost all of it the 32 replicates × 3 × 32
    * folded literal arrays.
    */
  private[graft] def bootWeightAt(b: Int, hLo: Column, hHi: Column, reps: Int): Column = {
    val (ahs, als, cs) = bootConsts(reps)
    weightFromConsts(lit(ahs(b)), lit(als(b)), lit(cs(b)), hLo, hHi)
  }

  private def weightFromConsts(
      ah: Column, al: Column, cB: Column, hLo: Column, hHi: Column): Column = {
    val mid = (ah * hLo + al * hHi).bitwiseAND(lit((1L << 30) - 1))
    val u = (al * hLo + shiftleft(mid, 30) + cB)
      .bitwiseAND(lit((1L << 60) - 1))
    // floor(CDF(k) * 2^60) for Poisson(1): k = 0..5
    val t = Seq(424136118829305344L, 848272237658610688L, 1060340297073263360L,
      1131029650211480960L, 1148701988496035328L, 1152236456152946176L)
    t.zipWithIndex.foldRight(lit(6): Column) { case ((thr, k), rest) =>
      when(u < thr, k).otherwise(rest)
    }
  }

  /** Poissonized bootstrap of a per-group mean in ONE corpus pass: each
    * row contributes to all `reps` replicates with an independent
    * deterministic Poisson(1) weight ([[bootWeight]]) — the
    * resampling-without-resampling trick that makes bootstrap feasible
    * at corpus scale (a literal resample would shuffle the corpus per
    * replicate; this explodes ×reps integers and pays one group shuffle
    * of `groups × reps` partial sums). Returns per-group point mean and
    * the min/max replicate means — the extreme-order-stat confidence
    * envelope (with reps = 32 these are the ~3%/97% band). All outputs
    * are single IEEE divisions of exact integer sums, ×1e6 floored —
    * engine-exact.
    */
  def bootstrapMean(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      valueCol: String,
      reps: Int): DataFrame = {
    require(reps >= 2, "need at least two replicates")
    val h = Dedup.md5Long(col(keyCol).cast("string"))
    val withH = df.select(col(groupCol).as("g"), col(valueCol).as("v"),
      h.bitwiseAND(lit((1L << 30) - 1)).as("h_lo"),
      shiftright(h, 30).as("h_hi"))
    // ONE wide aggregation, no ×reps row explosion: with the replicate
    // index a LITERAL, each weight's constant lookups fold at plan time,
    // so a row pays one md5 + reps cheap integer draws, and the shuffle
    // carries 2·reps+2 longs per group — nothing else
    val repAggs = (0 until reps).flatMap { b =>
      val w = bootWeightAt(b, col("h_lo"), col("h_hi"), reps)
      Seq(sum(w * col("v")).as(s"wv_$b"), sum(w).as(s"wn_$b"))
    }
    val allAggs = Seq(count(lit(1)).as("n_rows"), sum(col("v")).as("sv")) ++ repAggs
    val wide = withH
      .groupBy(col("g"))
      .agg(allAggs.head, allAggs.tail: _*)
    // an all-zero-weight replicate (vanishingly rare beyond tiny groups)
    // yields NULL and drops out of least/greatest rather than a 0/0
    val repMeans = (0 until reps).map { b =>
      when(col(s"wn_$b") > 0,
        floor(col(s"wv_$b").cast("double") / col(s"wn_$b") * 1e6).cast("long"))
    }
    wide.select(col("g"), col("n_rows"),
      floor(col("sv").cast("double") / col("n_rows") * 1e6).cast("long").as("mean_q6"),
      least(repMeans: _*).as("boot_lo_q6"),
      greatest(repMeans: _*).as("boot_hi_q6"))
  }
}
