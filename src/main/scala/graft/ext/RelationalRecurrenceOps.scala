package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serial per-key recurrence operators (split out of [[Relational]] —
  * pure code motion, round 14; `object Relational` mixes this trait in so
  * every call site is unchanged). The family: integer smoothing (EWMA /
  * Holt / Holt–Winters), the clamped running balance, market-basket pair
  * rules, and the snapshot diff. The recurrences are serial BY DESIGN
  * (each step reads the previous after its own floor), so each key folds
  * its own (time-grain-bounded, never corpus-sized) series in one array
  * aggregate; the corpus-scale work stays in the upstream distributed
  * aggregation.
  */
trait RelationalRecurrenceOps {
  /** Integer EWMA over a keyed, bucket-ordered counter series:
    * `s_0 = x_0; s_t = floor((aNum·x_t + (aDen−aNum)·s_{t−1}) / aDen)` —
    * the trend-smoothing recurrence a monitoring/forecast pass runs over
    * daily counters, in all-integer arithmetic (floor division on both
    * engines) so the whole trajectory is hash-exact.
    *
    * The recurrence is serial BY DESIGN (each s_t reads s_{t−1} after its
    * own floor — no window function or closed form exists once the
    * truncation is inside the loop), so each key's series folds in ONE
    * array aggregate over its (tiny — |buckets| per key) collected list.
    * The corpus-scale work is the upstream scan+aggregate that produced
    * `series`; that stays fully distributed, and the fold costs
    * O(|buckets|²) array building on |keys| rows — thousands of entries
    * at most (buckets are time-grain-bounded), never corpus-sized.
    *
    * `series`: one row per (key, bucket); `bucketCol`/`valueCol` LONG
    * (quantize floats upstream); intermediate products must stay under
    * 2^52 (the doubles-exact integer range — aDen·|x| bounded, checked by
    * the caller's quantization). Output: (key, bucket, x, ewma).
    */
  def ewmaInteger(
      series: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      aNum: Int,
      aDen: Int): DataFrame = {
    require(aNum > 0 && aDen > aNum, s"need 0 < aNum < aDen, got $aNum/$aDen")
    val stepType = "array<struct<b:bigint,x:bigint,s:bigint>>"
    val folded = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(bucketCol).cast("long").as("b"),
        col(valueCol).cast("long").as("x")))).as("xs"))
      .select(
        col(keyCol),
        aggregate(
          col("xs"),
          array().cast(stepType),
          (acc, e) =>
            concat(acc, array(struct(
              e.getField("b").as("b"),
              e.getField("x").as("x"),
              when(size(acc) === 0, e.getField("x"))
                .otherwise(floor(
                  (lit(aNum) * e.getField("x") +
                    lit(aDen - aNum) * element_at(acc, -1).getField("s")) / lit(aDen))
                  .cast("long"))
                .as("s"))))).as("ys"))
    folded
      .select(col(keyCol), explode(col("ys")).as("y"))
      .select(
        col(keyCol),
        col("y.b").as(bucketCol),
        col("y.x").as(valueCol),
        col("y.s").as("ewma"))
  }

  /** Holt double exponential smoothing (level + trend) as an
    * integer-arithmetic recurrence — [[ewmaInteger]]'s forecasting
    * upgrade: a plain EWMA lags a trending series forever, Holt tracks
    * the slope. `l_t = ⌊(aN·x + (aD−aN)·(l+t)) / aD⌋`,
    * `t_t = (bN·(l_t−l_{t−1}) + (bD−bN)·t) quot bD`, seeds l₀ = x₀,
    * t₀ = 0; one-step forecast = l + t. Every step is integer math with
    * TRUNCATING division (toward zero — the SQL `div` / DuckDB `//`
    * convention; the trend goes NEGATIVE, where floor and truncation
    * disagree: DuckDB's `(-7)//2 = -3`, not −4 — measured as a 27-row
    * oracle drift before this was pinned), built sign-aware from the
    * exact-below-2^53 `floor(|a|/b)` so the whole trajectory hashes
    * cross-engine via the recursive-CTE oracle. Same fold shape and
    * per-key-bounded-history caveat as [[ewmaInteger]].
    */
  def holtInteger(
      series: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      aNum: Int,
      aDen: Int,
      bNum: Int,
      bDen: Int): DataFrame = {
    require(aNum > 0 && aDen > aNum, s"need 0 < aNum < aDen, got $aNum/$aDen")
    require(bNum > 0 && bDen > bNum, s"need 0 < bNum < bDen, got $bNum/$bDen")
    val stepType = "array<struct<b:bigint,x:bigint,l:bigint,t:bigint>>"
    val folded = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(bucketCol).cast("long").as("b"),
        col(valueCol).cast("long").as("x")))).as("xs"))
      .select(
        col(keyCol),
        aggregate(
          col("xs"),
          array().cast(stepType),
          (acc, e) => {
            val x = e.getField("x")
            val prevL = element_at(acc, -1).getField("l")
            val prevT = element_at(acc, -1).getField("t")
            // truncating (toward-zero) integer division, sign-aware
            def quot(a: Column, b: Int): Column =
              when(a >= 0, floor(a / lit(b))).otherwise(-floor(-a / lit(b)))
                .cast("long")
            // the level expression appears twice (also inside the trend) —
            // identical subexpression, identical value, still one recurrence
            val lNew = quot(lit(aNum) * x + lit(aDen - aNum) * (prevL + prevT), aDen)
            val tNew = quot(lit(bNum) * (lNew - prevL) + lit(bDen - bNum) * prevT, bDen)
            concat(acc, array(struct(
              e.getField("b").as("b"),
              x.as("x"),
              when(size(acc) === 0, x).otherwise(lNew).as("l"),
              when(size(acc) === 0, lit(0L)).otherwise(tNew).as("t"))))
          }).as("ys"))
    folded
      .select(col(keyCol), explode(col("ys")).as("y"))
      .select(
        col(keyCol),
        col("y.b").as(bucketCol),
        col("y.x").as(valueCol),
        col("y.l").as("level"),
        col("y.t").as("trend"),
        (col("y.l") + col("y.t")).as("forecast_next"))
  }

  /** Holt–Winters additive SEASONAL smoothing (level + period-m seasonal;
    * the trend-free "HW method 2" variant) — completes the exponential
    * family next to [[ewmaInteger]] (level) and [[holtInteger]]
    * (level+trend): lₜ = α(xₜ−sₜ₋ₘ) + (1−α)lₜ₋₁,
    * sₜ = γ(xₜ−lₜ) + (1−γ)sₜ₋ₘ, forecast = lₜ + sₜ₊₁₋ₘ. Init l₁ = x₁,
    * s₍≤0₎ = 0 (the [[holtInteger]] discipline). Same integer-recurrence
    * determinism recipe: every step one sign-aware truncating division,
    * so the whole series hash-matches a recursive-CTE oracle.
    *
    * Scale shape: per-key fold over the day-grain aggregate (a recurrence
    * has no window rewrite); the per-key series is TIME-bounded, so the
    * collect_list fold holds days-per-key elements regardless of corpus
    * size. The forecast lag rides the same key partitioning.
    */
  def holtWintersInteger(
      series: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      aNum: Int,
      aDen: Int,
      gNum: Int,
      gDen: Int,
      period: Int = 7): DataFrame = {
    require(aNum > 0 && aDen > aNum, s"need 0 < aNum < aDen, got $aNum/$aDen")
    require(gNum > 0 && gDen > gNum, s"need 0 < gNum < gDen, got $gNum/$gDen")
    require(period >= 2, "period must be ≥ 2")
    val stepType = "array<struct<b:bigint,x:bigint,l:bigint,s:bigint>>"
    def quot(a: Column, b: Int): Column =
      when(a >= 0, floor(a / lit(b))).otherwise(-floor(-a / lit(b))).cast("long")
    val folded = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(bucketCol).cast("long").as("b"),
        col(valueCol).cast("long").as("x")))).as("xs"))
      .select(
        col(keyCol),
        aggregate(
          col("xs"),
          array().cast(stepType),
          (acc, e) => {
            val x = e.getField("x")
            val prevL = element_at(acc, -1).getField("l")
            val sPrev = when(size(acc) >= period,
              element_at(acc, -period).getField("s")).otherwise(lit(0L))
            val lNew = quot(lit(aNum) * (x - sPrev) + lit(aDen - aNum) * prevL, aDen)
            val sNew = quot(lit(gNum) * (x - lNew) + lit(gDen - gNum) * sPrev, gDen)
            concat(acc, array(struct(
              e.getField("b").as("b"),
              x.as("x"),
              when(size(acc) === 0, x).otherwise(lNew).as("l"),
              when(size(acc) === 0, lit(0L)).otherwise(sNew).as("s"))))
          }).as("ys"))
    val w = Window.partitionBy(keyCol).orderBy(bucketCol)
    folded
      .select(col(keyCol), explode(col("ys")).as("y"))
      .select(col(keyCol), col("y.b").as(bucketCol), col("y.x").as(valueCol),
        col("y.l").as("level"), col("y.s").as("seasonal"))
      .withColumn("forecast_next",
        col("level") + lag(col("seasonal"), period - 1, 0L).over(w))
  }

  /** Market-basket association rules restricted to item PAIRS (the Apriori
    * 2-itemset level): co-occurrence counts within a transaction key plus
    * confidence and lift, the co-purchase / co-click analysis the reference
    * surface has no join machinery for.
    *
    * Scale shape — the Apriori downward-closure cut made physical:
    *  - the frequent-item table (support ≥ minItemSupport) is VOCABULARY-
    *    sized, so it broadcasts and the basket frame never shuffles for the
    *    prefilter;
    *  - the pair self-join runs over baskets already restricted to frequent
    *    items, joined on the transaction key — per-basket fan-out is
    *    C(frequent-basket-size, 2), linear in transactions, never all-pairs
    *    over the item vocabulary. The join's ~1 GB ×100 sort spill was
    *    attacked twice in round 15 and BOTH alternatives lost on wall
    *    (same corpus, same session config, solo StageProbe): a
    *    SHUFFLE_HASH hint (552 MB spill remained — the pair aggregate's,
    *    not the sort's — join stage 75 → 129 s) and a per-basket
    *    collect_list + posexplode/slice expansion (zero spill but the
    *    15M-array ObjectHashAggregate + Generate chain cost 114 s vs the
    *    sorts' 75 s). The sort-merge spill is the cheapest currency here:
    *    it is graceful, bounded by the basket frame, and the fastest of
    *    the three measured forms end-to-end;
    *  - counts ride one hash aggregation with map-side combine; the n_tx
    *    scalar is a 1-row broadcast.
    *
    * Every output is integer (counts, and confidence/lift as ×10⁶-scaled
    * truncating BIGINT quotients — `DIV` here ≡ DuckDB `//` on these
    * non-negative operands), so rows hash bit-exact cross-engine.
    */
  def marketBasket(
      baskets: DataFrame,
      txCol: String,
      itemCol: String,
      minItemSupport: Long,
      minPairSupport: Long): DataFrame = {
    // the distinct basket frame feeds FOUR subtrees (freq, both self-join
    // sides, n_tx) — materialize it once (measured ×100: the r13 probe
    // showed the raw scan + distinct exchange running twice, 627 MB each)
    val b = Dedup.Intermediate.LocalLazy(
      baskets.select(col(txCol).as("tx"), col(itemCol).as("item")).distinct(),
      "basket_frame")
    val freq = b
      .groupBy("item")
      .agg(count(lit(1)).as("item_cnt"))
      .filter(col("item_cnt") >= minItemSupport)
    // the downward-closure prefilter is a SEMI join (freq is unique per
    // item, so semi ≡ inner here) and the join/aggregate below run on
    // NARROW (tx, item) rows — round 16: item_cnt used to ride both
    // self-join sides AND the pair-aggregate keys (it is functionally
    // dependent on the item), which put 827.7 MB through the tx exchange
    // and 4-long keys in the pair aggregate's hash map; the ×100 probe
    // charged that stage 996.3 MB of spill / 45.2 s of the query's 83.9 s.
    // Support counts re-attach AFTER the minPairSupport cut, to the
    // output-bounded rule frame, via two broadcast joins of the
    // vocabulary-sized freq table — bit-identical integers.
    val bf = b.join(broadcast(freq.select("item")), Seq("item"), "left_semi")
    val nTx = b.agg(count_distinct(col("tx")).as("n_tx"))
    // unhinted tx self-join (sort-merge at scale) KEPT after two measured
    // ×100 revert-grade A/Bs — see the scale-shape note above
    bf.as("x")
      .join(
        bf.as("y"),
        col("x.tx") === col("y.tx") && col("x.item") < col("y.item"))
      // partial pair aggregate stays IN the join stage (third measured
      // ×100 A/B, round 16): exchanging the raw pair stream on (a, b)
      // first — which lets the planner skip the partial and zeroes the
      // spill — wrote 1178 MB of raw pairs and cost 69.7 s vs this form's
      // 61.3 s / 478 MB graceful sort spill. The narrow (tx, item) rows
      // above are the shipped win (83.9 → 61.3 s, spill 996 → 478 MB).
      .groupBy(
        col("x.item").as("item_a"),
        col("y.item").as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minPairSupport)
      .join(broadcast(freq.select(col("item").as("item_a"), col("item_cnt").as("cnt_a"))),
        Seq("item_a"))
      .join(broadcast(freq.select(col("item").as("item_b"), col("item_cnt").as("cnt_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(nTx))
      .select(
        col("item_a"),
        col("item_b"),
        col("pair_cnt"),
        col("cnt_a"),
        col("cnt_b"),
        expr("pair_cnt * 1000000 DIV cnt_a").as("conf_ab_q6"),
        expr("pair_cnt * 1000000 DIV cnt_b").as("conf_ba_q6"),
        // two-step truncation (conf(a→b)·n_tx) DIV cnt_b instead of the
        // triple product pair·n_tx·10⁶: the single-expression form wraps
        // Long once pair_cnt·n_tx ≥ ~9.2e12 — far below the corpus sizes
        // the scale note above targets. Each intermediate here is ≤
        // 10⁶·n_tx; the composed truncation differs from the exact
        // quotient by < 10⁻⁶·n_tx/cnt_b relative — and the oracle applies
        // the identical composition, so rows still hash bit-exact.
        expr("(pair_cnt * 1000000 DIV cnt_a) * n_tx DIV cnt_b").as("lift_q6"))
  }

  /** Clamped running balance — the operator class plain window algebra
    * CANNOT express: b₀ = 0, bᵢ = max(0, bᵢ₋₁ + Δᵢ) per key in a total
    * order. The clamp makes each step depend on the post-clamp previous
    * state (inventory that can't go negative, credit that can't overdraw,
    * a token bucket), so no prefix-sum/window rewrite exists — this is the
    * batch twin of the streaming mapGroupsWithState operators.
    *
    * Scale shape — the canonical Spark idiom for per-key sequential scans:
    * ONE hash repartition on the key, a per-partition sort on
    * (key, sort₁, sort₂) (spillable, no per-key memory materialization —
    * unlike groupByKey+flatMapGroups which buffers a whole group), then a
    * single-pass `mapPartitions` fold that carries (balance, clamps) and
    * emits on key change. Each key lives in exactly one partition, so the
    * fold is sequential per key and parallel across keys.
    *
    * Returns (key, balance, n_clamps, n_rows): final balance, how often
    * the clamp fired, and the fold length. All-integer state ⇒ bit-exact.
    */
  def clampedBalance(
      df: DataFrame,
      keyCol: String,
      sort1: String,
      sort2: String,
      deltaCol: String): DataFrame = {
    val ss = df.sparkSession
    import ss.implicits._
    df.select(col(keyCol).cast("long"), col(sort1).cast("long"),
        col(sort2).cast("long"), col(deltaCol).cast("long"))
      .toDF("k", "s1", "s2", "delta")
      .repartition(col("k"))
      .sortWithinPartitions("k", "s1", "s2")
      .as[(Long, Long, Long, Long)]
      .mapPartitions { rows =>
        new Iterator[(Long, Long, Long, Long)] {
          private var cur = Option.empty[(Long, Long, Long, Long)] // k, bal, clamps, n
          private var pending = Option.empty[(Long, Long, Long, Long)]
          private def step(): Unit = {
            while (pending.isEmpty && rows.hasNext) {
              val (k, _, _, d) = rows.next()
              cur match {
                case Some((ck, bal, cl, n)) if ck == k =>
                  val nb = bal + d
                  cur = Some((ck, math.max(0L, nb), cl + (if (nb < 0L) 1L else 0L), n + 1))
                case other =>
                  pending = other // finished key (or None at the very start)
                  cur = Some((k, math.max(0L, d), if (d < 0L) 1L else 0L, 1L))
              }
            }
            if (pending.isEmpty && !rows.hasNext) { pending = cur; cur = None }
          }
          override def hasNext: Boolean = { step(); pending.nonEmpty }
          override def next(): (Long, Long, Long, Long) = {
            step(); val out = pending.get; pending = None; out
          }
        }
      }
      .toDF("k", "balance", "n_clamps", "n_rows")
  }

  /** Snapshot diff — the data-versioning audit between two keyed snapshots
    * of the same logical table (yesterday's export vs today's, pre- vs
    * post-backfill): per key, classify into added / removed / changed /
    * unchanged by a tracked value column. Keys must be unique per snapshot
    * (a snapshot IS a keyed current-state image; enforce upstream with the
    * [[argMaxJoin]] compaction if the input is a log).
    *
    * Scale shape: tag-union + ONE hash aggregate on the key — deliberately
    * NOT a full outer join. The union concatenates partitions without any
    * movement, the per-key agg shuffles each side exactly once with
    * map-side partial combine, and classification is a projection on the
    * |keys|-sized merged frame. A full outer join would shuffle the same
    * bytes but materialize join state per key; the agg form also degrades
    * gracefully under AQE skew splitting and never considers a broadcast
    * (both sides are corpus-sized by definition).
    *
    * Returns (key, old_v, new_v, change); values ride `max(when)` pivots,
    * exact for any orderable value type.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      valueCol: String): DataFrame = {
    val tag = (df: DataFrame, side: Int) =>
      df.select(col(keyCol).as("key"), col(valueCol).as("v"), lit(side).as("side"))
    tag(oldSnap, 0)
      .unionByName(tag(newSnap, 1))
      .groupBy("key")
      .agg(
        max(when(col("side") === 0, col("v"))).as("old_v"),
        max(when(col("side") === 1, col("v"))).as("new_v"),
        max(when(col("side") === 0, 1).otherwise(0)).as("in_old"),
        max(when(col("side") === 1, 1).otherwise(0)).as("in_new"))
      .select(
        col("key"), col("old_v"), col("new_v"),
        when(col("in_old") === 0, "added")
          .when(col("in_new") === 0, "removed")
          // null-safe: a key present in both snapshots with exactly one
          // side NULL is a CHANGE — plain =!= yields NULL there and would
          // fall through to "unchanged"
          .when(!(col("old_v") <=> col("new_v")), "changed")
          .otherwise("unchanged")
          .as("change"))
  }
}
