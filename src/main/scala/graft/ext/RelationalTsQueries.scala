package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import RelationalQueries.{secs, dailyCents, pctSql, DailyCentsCte}

/** Declared event-time analytics queries (joins-by-time, funnels,
  * attribution, sessions, paths) — split from [[RelationalQueries]] in
  * round 12; the forecasting/seasonality lane moved on to
  * [[RelationalForecastQueries]] in round 13 (pure code motion both
  * times). See [[RelationalQueries]]'s scaladoc for the shared
  * column-alignment / determinism / rounding contracts.
  */
object RelationalTsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // As-of join: each non-signup event matched to its user's LATEST
    // preceding (or simultaneous) signup event — the time-series
    // enrichment shape, composed as one union + per-key ordered window
    // (Relational.asofJoin), never a per-key cross product. Events with
    // no preceding signup keep -1 (coalesced: a nullable BIGINT output
    // materializes as float64 in the oracle's pandas frame — dtype
    // mismatch, same artifact class as the HUGEINT sum trap).
    "q_asof_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val fact = ev.filter(col("event_type") =!= "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      val dim = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("sid"))
      Relational
        .asofJoin(fact, dim, "user_id", "ts", "ts", Seq("sid"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("sid"), lit(-1L)).as("last_signup"))
        .orderBy("event_id")
    },

    // Bucketed range join: classify event values into bands via the
    // interval→bucket explode + equi-join + exact re-check
    // (Relational.rangeJoinBucketed) — the shape that stays an equi-join
    // at 100 TB where a theta join degenerates to a nested-loop product.
    "q_range_band" -> { (s, dir) =>
      val spark0 = s
      import spark0.implicits._
      val bands = Seq(
        (0.0, 50.0, "p_low"), (50.0, 150.0, "p_mid"),
        (150.0, 300.0, "p_high"), (300.0, 500.0, "p_extreme"))
        .toDF("lo", "hi", "band")
      Relational
        .rangeJoinBucketed(Tables.events(s, dir).select(col("event_id"), col("value")),
          "value", bands, "lo", "hi", bucketWidth = 50.0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("band")
    },

    // Interval OVERLAP join (Relational.intervalJoinBucketed): per-user
    // daily activity spans × hourly error-incident spans, matched where
    // the half-open micro-epoch intervals intersect. Both sides explode
    // into 1-hour buckets and meet on an equi-join with a first-shared-
    // bucket dedup — the theta overlap never becomes a nested loop, which
    // is the only form that survives when neither interval set broadcasts.
    // All bounds are integral micros: exact LONG overlap arithmetic.
    "q_interval_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val us = unix_micros(col("ts"))
      val a = ev.filter(col("event_type").isin("click", "view"))
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min(us).as("a_lo"), (max(us) + lit(60000000L)).as("a_hi"))
      val b = ev.filter(col("event_type") === "error")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(min(us).as("b_lo"), (max(us) + lit(60000000L)).as("b_hi"))
      Relational
        .intervalJoinBucketed(a.drop("day"), "a_lo", "a_hi",
          b.drop("hour"), "b_lo", "b_hi", bucketWidth = 3600000000L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_incidents"),
          sum(least(col("a_hi"), col("b_hi")) - greatest(col("a_lo"), col("b_lo")))
            .as("overlap_us"))
        .orderBy("user_id")
    },

    // Gaps-and-islands interval merge (Relational.mergeIntervals): each
    // click opens a deterministic [ts, ts + 60..600 s) attention span;
    // overlapping spans per user merge into islands, and the query reports
    // per-user island count + exact covered micros. One key shuffle + one
    // in-partition sort — the coverage/uptime computation at 100 TB.
    "q_interval_coverage" -> { (s, dir) =>
      val us = unix_micros(col("ts"))
      val iv = Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .select(col("user_id"), us.as("lo"),
          (us + (lit(60L) + col("event_id") % 540L) * 1000000L).as("hi"))
      Relational
        .mergeIntervals(iv, Seq("user_id"), "lo", "hi")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"), sum(col("hi") - col("lo")).as("covered_us"))
        .orderBy("user_id")
    },

    // Last-touch attribution: every purchase credits the user's latest
    // preceding (or simultaneous) click/view — the marketing-analytics
    // shape, composed on Relational.asofJoin (union + one ordered window
    // per user, never a per-user cross product). Touches are pre-deduped
    // per (user, ts) with max_by on event_id so simultaneous touches have
    // a well-defined winner; purchases with no preceding touch land in
    // the 'none' channel.
    "q_attribution" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("event_type"), col("event_id")).as("channel"))
      Relational
        .asofJoin(purchases, touches, "user_id", "ts", "ts", Seq("channel"))
        .groupBy(coalesce(col("channel"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("attr_value"))
        .orderBy("channel")
    },

    // ROLLING correlation between two metric streams — "did errors start
    // tracking clicks this week?": Pearson r over a trailing 7-day ROWS
    // window from INTEGER sufficient statistics (the q_corr_stats moments
    // made rolling): every windowed sum is an exact BIGINT, so numerator
    // and denominator are identical doubles cross-engine and r is two
    // sqrt + one division of them. Windows run over the |days|-sized
    // pivoted frame only.
    "q_rolling_corr" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "error"))
        .groupBy((floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("day"))
        .agg(
          sum((col("event_type") === "click").cast("long")).as("c"),
          sum((col("event_type") === "error").cast("long")).as("e"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sc", sum(col("c")).over(w))
        .withColumn("se", sum(col("e")).over(w))
        .withColumn("sce", sum(col("c") * col("e")).over(w))
        .withColumn("scc", sum(col("c") * col("c")).over(w))
        .withColumn("see", sum(col("e") * col("e")).over(w))
        .filter(col("n") === 7)
        // a constant series has zero variance — r is undefined, emit null
        // (the raw IEEE quotient would be ±inf/nan)
        .withColumn("vc", col("n") * col("scc") - col("sc") * col("sc"))
        .withColumn("ve", col("n") * col("see") - col("se") * col("se"))
        .select(col("day"), col("sc"), col("se"),
          when(col("vc") > 0 && col("ve") > 0,
            (col("n") * col("sce") - col("sc") * col("se")).cast("double") /
              (sqrt(col("vc").cast("double")) * sqrt(col("ve").cast("double"))))
            .as("r"))
        .orderBy("day")
    },

    // STATE DWELL-TIME distribution — how long users stay in each activity
    // state: the q_scd2_build change intervals fed into
    // [[Relational.exactPercentilesX100]] (integer micro dwells ⇒
    // percentiles hash cross-engine). Open (current) states have no dwell
    // and drop out. Both change-collapse windows ride the same user
    // partitioning; the percentile machinery adds its one state exchange.
    "q_dwell_time" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val dwell = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("next_ts").isNotNull)
        .select(col("event_type").as("state"),
          (unix_micros(col("next_ts")) - unix_micros(col("ts"))).as("dwell_us"))
      Relational
        .exactPercentilesX100(dwell, Seq("state"), "dwell_us", Seq(50, 90))
        .select(col("state"), col("n").as("n_intervals"),
          (col("p50_x100").cast("double") / 100).as("p50_dwell_us"),
          (col("p90_x100").cast("double") / 100).as("p90_dwell_us"))
        .orderBy("state")
    },

    // LEAD-LAG cross-correlation — "do errors FOLLOW clicks?": Pearson r
    // between daily click counts and error counts shifted by −3..+3 days,
    // from exact integer moments per lag (the q_rolling_corr recipe with a
    // day-spine self-join instead of a trailing window). The lag explode
    // and join run over the |days|-sized aggregate, never raw events;
    // zero-variance windows emit null r.
    "q_cross_correlation" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "error"))
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(sum((col("event_type") === "click").cast("long")).as("c"),
          sum((col("event_type") === "error").cast("long")).as("e"))
        .localCheckpoint() // |days| rows feed both join sides
      val a = daily.select(col("day"), col("c"))
        .withColumn("lag", explode(array((-3 to 3).map(l => lit(l.toLong)): _*)))
      val b = daily.select(col("day").as("b_day"), col("e"))
      a.join(b, col("b_day") === col("day") + col("lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"), sum(col("e")).as("se"),
          sum(col("c") * col("e")).as("sce"), sum(col("c") * col("c")).as("scc"),
          sum(col("e") * col("e")).as("see"))
        .withColumn("vc", col("n") * col("scc") - col("sc") * col("sc"))
        .withColumn("ve", col("n") * col("see") - col("se") * col("se"))
        .select(col("lag"), col("n"),
          when(col("vc") > 0 && col("ve") > 0,
            (col("n") * col("sce") - col("sc") * col("se")).cast("double") /
              (sqrt(col("vc").cast("double")) * sqrt(col("ve").cast("double"))))
            .as("r"))
        .orderBy("lag")
    },

    // LINEAR multi-touch attribution — the complement of last-touch
    // q_attribution: every click/view in the 24 h before a purchase
    // shares the credit equally (credit = 10⁶ DIV n_touches, exact
    // integers that sum to ≤ 10⁶ per purchase). The touch join is USER-
    // keyed with a time-range residual — events per user bound the
    // fan-out, so the pair frame is output-sized and co-partitioned;
    // the per-purchase count rides one p_id window over that frame.
    "q_linear_attribution" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), secs(col("ts")).as("p_s"))
      val t = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("channel"), secs(col("ts")).as("t_s"))
      p.join(t, Seq("user_id"))
        .filter(col("t_s") <= col("p_s") && col("t_s") >= col("p_s") - 86400L)
        // COLLAPSE before the window (round 15): every touch of one
        // purchase carries the identical credit (it depends only on the
        // purchase's touch count), so the per-(purchase, channel) COUNT is
        // a sufficient statistic — the hash agg runs inside the join stage
        // (user_id partitioning ⊆ grouping keys, no exchange, no sort) and
        // the window then sorts ≤ |channels| rows per purchase instead of
        // every touch row (the r14 ×100 run charged the row-level window
        // 45 MB of sort spill; the credit sum per group is cnt·credit,
        // exact integers — bit-identical to the row-at-a-time fold).
        .groupBy(col("user_id"), col("p_id"), col("channel"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("n_touch",
          sum(col("cnt")).over(Window.partitionBy("user_id", "p_id")))
        .withColumn("credit_q6", expr("1000000 DIV n_touch"))
        .groupBy(col("channel"))
        .agg(sum(col("cnt")).as("n_touches"),
          sum(col("cnt") * col("credit_q6")).as("credit_q6_sum"),
          count_distinct(col("p_id")).as("n_purchases"))
        .orderBy("channel")
    },

    // TIME-DECAY multi-touch attribution — completes the credit-model
    // quartet (last-touch / linear / U-shaped / this): a touch Δ whole
    // days before the purchase carries weight 2^−Δ, EXACT as an integer
    // shift (w = 1e6 >> Δ over the 7-day lookback), and per-purchase
    // credits are w·10⁶ DIV Σw — all-integer, no float pow/exp anywhere.
    // Same interval-join shape as the linear model; the weight
    // normalization is one per-purchase window sum.
    "q_decay_attribution" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), secs(col("ts")).as("p_s"))
      val t = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("channel"), secs(col("ts")).as("t_s"))
      p.join(t, Seq("user_id"))
        .filter(col("t_s") <= col("p_s") && col("t_s") >= col("p_s") - 7L * 86400L)
        // COLLAPSE before the window (round 15, the q_linear_attribution
        // lever): the weight depends only on the whole-day lag, so rows of
        // one (purchase, channel, Δday) cell share the identical credit —
        // the hash agg collapses the pair frame inside the join stage (no
        // exchange: user_id ⊆ keys) and the window sorts ≤ |channels|·8
        // rows per purchase instead of every touch (524 MB ×100 sort spill
        // in the r14 set came from exactly this sort). wsum = Σ cnt·w and
        // per-cell credit·cnt are exact integers — bit-identical.
        .withColumn("dd", expr("CAST((p_s - t_s) DIV 86400 AS INT)"))
        .groupBy(col("user_id"), col("p_id"), col("dd"), col("channel"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("w", expr("shiftright(1000000L, dd)"))
        .withColumn("wsum",
          sum(col("w") * col("cnt")).over(Window.partitionBy("user_id", "p_id")))
        .withColumn("credit_q6", expr("w * 1000000 DIV wsum"))
        .groupBy(col("channel"))
        .agg(sum(col("cnt")).as("n_touches"),
          sum(col("cnt") * col("credit_q6")).as("credit_q6_sum"))
        .orderBy("channel")
    },

    // Position-based (U-shaped 40/20/40) multi-touch attribution — the
    // other industry-standard credit model next to q_linear_attribution
    // and q_attribution (last-touch): first and last touch in the 24 h
    // lookback each take 40%, the middle splits 20% evenly. Integer ppm
    // credits with truncating DIV — deterministic, hash-exact; single- and
    // two-touch paths take 100% / 50-50 by convention. Same join shape as
    // the linear model: one purchase×touch interval join, one per-purchase
    // window (ordered by touch time, event id — total order), one channel
    // rollup.
    "q_position_attribution" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), secs(col("ts")).as("p_s"))
      val t = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("channel"),
          col("event_id").as("t_id"), secs(col("ts")).as("t_s"))
      // p_id-keyed windows KEPT after TWO measured ×100 A/Bs. Round 14:
      // fusing the window SORTS into the join stage via the composite
      // (user_id, p_id) key traded the 1.4 GB exchange for 1.15 GB of
      // in-stage sort spill. Round 15: the collapse rewrite that fixed
      // q_linear/q_decay_attribution (per-(purchase, channel) hash agg)
      // needs first/last = min/max(struct(t_s, t_id)) — and a STRUCT agg
      // buffer is not hash-aggregatable, so the collapse planned as a
      // SortAggregate INSIDE the join stage and spilled the identical
      // 1.15 GB (measured solo, wall 13.5 vs 12.0 s). The U-shape is
      // rank-dependent; until first/last fit a primitive agg buffer the
      // exchange is the cheaper currency — it breaks the stage and the
      // post-exchange sorts run with full task memory (zero spill).
      val w = Window.partitionBy("p_id").orderBy("t_s", "t_id")
      p.join(t, Seq("user_id"))
        .filter(col("t_s") <= col("p_s") && col("t_s") >= col("p_s") - 86400L)
        .withColumn("rn", row_number().over(w))
        .withColumn("n_touch", count(lit(1)).over(Window.partitionBy("p_id")))
        .withColumn("credit_q6",
          when(col("n_touch") === 1, 1000000L)
            .when(col("n_touch") === 2, 500000L)
            .when(col("rn") === 1 || col("rn") === col("n_touch"), 400000L)
            .otherwise(expr("200000 DIV (n_touch - 2)")))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_q6")).as("credit_q6_sum"))
        .orderBy("channel")
    },

    // RFM segmentation: per user Recency (micros before the corpus max
    // event time) / Frequency (purchase count) / Monetary (cent-exact
    // value sum), each cut at its own exact tercile thresholds (tiny
    // percentile agg, broadcast — the q_sample_by_decile discipline, never
    // a global ntile) into a 3×3×3 segment code, rolled up to segment
    // sizes — the classic growth-analytics table. All comparisons on
    // exact integers vs interpolated thresholds; deterministic ties by
    // strict >.
    "q_rfm_segments" -> { (s, dir) =>
      val us = unix_micros(col("ts"))
      val p = Tables.events(s, dir).filter(col("event_type") === "purchase")
      val perUser = p.groupBy(col("user_id"))
        .agg(max(us).as("last_us"), count(lit(1)).as("freq"),
          sum(floor(col("value") * 100).cast("long")).as("cents"))
      val maxTs = perUser.agg(max(col("last_us")).as("max_us"))
      val rfm = perUser.crossJoin(broadcast(maxTs))
        .select(col("user_id"), (col("max_us") - col("last_us")).as("rec_us"),
          col("freq"), col("cents"))
      val th = rfm.agg(
        expr("percentile(rec_us, array(0.3333333333333333, 0.6666666666666666))").as("rt"),
        expr("percentile(freq, array(0.3333333333333333, 0.6666666666666666))").as("ft"),
        expr("percentile(cents, array(0.3333333333333333, 0.6666666666666666))").as("mt"))
      def bucket(v: String, t: String) =
        size(filter(col(t), x => col(v).cast("double") > x)).cast("long")
      rfm.crossJoin(broadcast(th))
        .select(col("user_id"), bucket("rec_us", "rt").as("r"),
          bucket("freq", "ft").as("f"), bucket("cents", "mt").as("m"))
        .groupBy(col("r"), col("f"), col("m"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("r", "f", "m")
    },

    // Hierarchical subtree rollup (filesystem-du shape): docs form a
    // synthetic binary-heap tree (parent = (id−1)/2), and each node
    // reports its SUBTREE doc count + char mass. No recursion, no
    // per-level iteration: ancestor h of node k is the CLOSED FORM
    // ((k+1) div 2^h) − 1, so every doc map-side explodes into its
    // ≤ ⌈log₂ n⌉ ancestors and ONE aggregation finishes the rollup —
    // the O(depth)-blowup pattern that replaces a recursive CTE at
    // 100 TB (the sequence bound 20 covers 2M nodes; it is the knob).
    "q_tree_rollup" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(
          explode(filter(
            expr("transform(sequence(0, 20), " +
              "i -> ((doc_id + 1) div CAST(pow(2, i) AS BIGINT)) - 1)"),
            a => a >= 0)).as("node"),
          col("n_chars"))
        .groupBy(col("node"))
        .agg(count(lit(1)).as("subtree_docs"), sum(col("n_chars")).as("subtree_chars"))
        .orderBy("node")
    },

    // Conversion-lag distribution: per market segment, exact p50/p90 of
    // the first-signup → first-subsequent-purchase delay — the
    // time-to-convert number a growth team tracks. Two per-user min-aggs
    // (map-side combine), one user-keyed join with an inequality residual
    // (first purchase AT OR AFTER the signup — never a nested loop), the
    // segment dim broadcast. Percentiles are computed as INTEGER-weighted
    // order statistics: position ×100 = (n-1)·p is exact BIGINT, so the
    // interpolated value ×100 = lag[idx]·(100−rem) + lag[idx+1]·rem is a
    // single exact Long per segment and the only float op is one final
    // /100 — bit-identical cross-engine (native `percentile` interpolates
    // in doubles, which flipped round(·,4) by one ulp at 4e11 magnitude).
    "q_conversion_lag" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val us = unix_micros(col("ts"))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(us).as("su_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), us.as("pu_us"))
      val firstConv = pu.join(su, Seq("user_id"))
        .filter(col("pu_us") >= col("su_us"))
        .groupBy(col("user_id"), col("su_us"))
        .agg(min(col("pu_us")).as("conv_us"))
        .select(col("user_id"), (col("conv_us") - col("su_us")).as("lag_us"))
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      Relational
        .exactPercentilesX100(firstConv.join(broadcast(cust), Seq("user_id"))
          .select(col("segment"), col("lag_us")), Seq("segment"), "lag_us", Seq(50, 90))
        .select(col("segment"), col("n").as("n_converted"),
          (col("p50_x100").cast("double") / 100).as("p50_lag_us"),
          (col("p90_x100").cast("double") / 100).as("p90_lag_us"))
        .orderBy("segment")
    },

    // Order-to-ship lag SLA percentiles per order priority — the
    // supply-chain latency dashboard on the same
    // [[Relational.exactPercentilesX100]] operator (integer day lags, so
    // p50/p90/p99 hash cross-engine where native interpolation drifts).
    // Fact joins the 2-column order dim on the order key (shuffle join —
    // orders is fact-sized; the percentile windows and the final agg then
    // ride ONE priority exchange).
    "q_ship_lag_percentiles" -> { (s, dir) =>
      val lag = Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("order_us")),
          Seq("l_orderkey"))
        .select(col("o_orderpriority"),
          expr("(ship_us - order_us) DIV 86400000000").as("lag_days"))
      Relational
        .exactPercentilesX100(lag, Seq("o_orderpriority"), "lag_days", Seq(50, 90, 99))
        .select(col("o_orderpriority"), col("n").as("n_lines"),
          (col("p50_x100").cast("double") / 100).as("p50_days"),
          (col("p90_x100").cast("double") / 100).as("p90_days"),
          (col("p99_x100").cast("double") / 100).as("p99_days"))
        .orderBy("o_orderpriority")
    },

    // Per-user bounce rate over gap-based sessions (the q_session_window
    // boundary semantics): a session with exactly one event is a bounce —
    // the engagement-quality read sessionized logs feed. Two aggregations
    // sharing the user key: (user, session) counts, then the per-user
    // rollup rides the SAME partitioning (no second exchange).
    "q_bounce_rate" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_bounce"))
        .select(col("user_id"), col("n_sessions"), col("n_bounce"),
          expr("n_bounce * 1000000 DIV n_sessions").as("bounce_q6"))
        .orderBy("user_id")
    },

    // 3-step behavior paths — the Sankey/flow frame one level deeper than
    // q_event_paths' bigrams: two leads on the same (user, (ts, event_id))
    // window (ONE exchange + one sort serves both), trigram counts over
    // the ≤|types|³ key space. The path-mining shape that stays bounded
    // however large the corpus: output is type-cubed, never row-sized.
    "q_path_trigrams" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
          col("e3").as("step3"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("step1", "step2", "step3")
    },

    // Rolling exact p95 over the daily metric frame — the SLO/latency
    // dashboard number: per event_type, the 95th percentile of the last
    // 7 days' totals, one key exchange + one ordered window; the
    // percentile runs on the |types × days| aggregate, never raw events.
    "q_rolling_p95" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(round(sum(col("value")), 2).as("daily"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      daily
        .withColumn("p95_7d", round(expr("percentile(daily, 0.95)").over(w), 6))
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("daily"), col("p95_7d"))
        .orderBy("event_type", "day")
    },

    // Ordered event sequences per (user, day) — the behavioral-sequence
    // builder for session modeling: collect_list of (ts, id, type) structs,
    // array_sort (deterministic: lexicographic on the unique (ts, id)
    // prefix), project the type, join with '>'. One shuffle on the group
    // key; the sort happens per group over that group's events only.
    "q_user_sequences" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(
          concat_ws(">",
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
              x => x.getField("event_type"))).as("seq"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("seq"), col("n_events"))
        .orderBy("user_id", "day")
    },

    // Sliding event-time window: 300 s size, 60 s slide (each event lands in
    // 5 buckets via Spark's window(); oracle replicates with a range join).
    "q_sliding_window" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .groupBy(window(col("ts"), "300 seconds", "60 seconds").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(secs(col("w.start")).as("w_start"), col("cnt"))
        .orderBy("w_start")
    },

    // Gap-based session window per user (Spark session_window in batch).
    "q_session_window" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "1 day").as("sw"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), secs(col("sw.start")).as("sess_start"), col("cnt"))
        .orderBy("user_id", "sess_start")
    },

    // Event-transition counts (lag analytic window): per-user time-ordered
    // previous→current event-type pairs, aggregated into the transition
    // matrix a behavioral/sessionization pipeline feeds from. One shuffle
    // on user + in-partition sort, then a hash agg over pair keys.
    "q_event_paths" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables
        .events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("prev_type", "next_type")
    },

    // Frame-bounded moving window: 3-order moving sum of (cent-quantized)
    // order totals per customer — the ROWS-frame analytic shape, distinct
    // from the unbounded running total. Integer cents sum exactly in any
    // engine, so the frame sums are hash-stable.
    "q_moving_sum" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
      Tables
        .orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("moving_cents", sum(col("cents")).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("moving_cents"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Ordered conversion funnel (view → click → purchase, each step
    // strictly after the previous step's first event) — Relational.funnel:
    // per-step co-partitioned join chain, no per-user sequence collect.
    "q_funnel" -> { (s, dir) =>
      Relational
        .funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
    },

    // Windowed (first-touch) funnel: each step must convert within 2 h of
    // the previous step's first qualifying event — the conversion-window
    // variant of q_funnel (same join chain, gap predicate in the residual).
    "q_funnel_window" -> { (s, dir) =>
      Relational
        .funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), maxGapSec = Some(7200L))
    },

    // Re-anchoring EXISTENCE funnel at the same 2 h gap: any view→click→
    // purchase chain counts (vs q_funnel_window's first-touch anchoring —
    // the two semantics differ hard on this fixture). Latest-completion
    // DP over per-user sequences; oracle = literal EXISTS join chains.
    "q_funnel_exists" -> { (s, dir) =>
      Relational
        .funnelReanchor(Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), maxGapSec = 7200L)
    },






    // FULFILLMENT FRAGMENTATION — how many distinct shipment dates each
    // order's lineitems span, histogrammed: the split-shipment rate a
    // logistics dashboard watches (1 = single shipment; the tail is
    // partial-fulfillment cost). Two stacked aggregations, all-integer.
    "q_ship_split_rate" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_shipdate")).as("n_shipments"))
        .groupBy("n_shipments")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("n_shipments")
    },

    // BACKLOG AGE at a snapshot — exact p50/p90 age (days since order
    // date) of orders OPEN at mid-corpus 1995-06-30, per priority: the
    // aging report behind the q_concurrency_profile totals ("HOW OLD is
    // the backlog?"). Open = ordered on/before the snapshot, last
    // shipment strictly after; ages ride the same
    // [[Relational.exactPercentilesX100]] integer machinery.
    "q_backlog_age" -> { (s, dir) =>
      val snap = 804470400L // 1995-06-30 00:00:00 UTC
      val ends = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(max(unix_timestamp(col("l_shipdate").cast("timestamp")).cast("long"))
          .as("end_s"))
      val open = Tables.orders(s, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority").as("prio"),
          unix_timestamp(col("o_orderdate").cast("timestamp")).cast("long").as("start_s"))
        .hint("merge")
        .join(ends.hint("merge"), Seq("l_orderkey"))
        .filter(col("start_s") <= snap && col("end_s") > snap)
        .select(col("prio"), expr(s"($snap - start_s) DIV 86400").as("age_days"))
      Relational
        .exactPercentilesX100(open, Seq("prio"), "age_days", Seq(50, 90))
        .select(col("prio"), col("n").as("n_open"),
          (col("p50_x100").cast("double") / 100).as("p50_days"),
          (col("p90_x100").cast("double") / 100).as("p90_days"))
        .orderBy("prio")
    },

    // ORDER CONCURRENCY (BACKLOG) PROFILE — how many orders are open
    // (placed, not yet fully shipped) through time, summarized per month:
    // the classic interval-concurrency sweep as ±1 edge prefix sums
    // (never an interval self-join — the edge form is O(n) where the
    // naive overlap join is O(n²)). Interval = [order date, max ship date
    // over the order's lineitems); the open-count window rides the
    // TIME-bounded day grid after one fact⋈fact merge join + one day agg.
    // All-integer; end-of-month backlog = the last day's running count.
    "q_concurrency_profile" -> { (s, dir) =>
      val ends = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(max(unix_timestamp(col("l_shipdate").cast("timestamp")).cast("long"))
          .as("end_s"))
      val iv = Tables.orders(s, dir)
        .select(col("o_orderkey").as("l_orderkey"),
          unix_timestamp(col("o_orderdate").cast("timestamp")).cast("long").as("start_s"))
        .hint("merge")
        .join(ends.hint("merge"), Seq("l_orderkey"))
      val edges = iv.select(col("start_s").as("day"), lit(1L).as("d"))
        .unionByName(iv.select(col("end_s").as("day"), lit(-1L).as("d")))
      val wCum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
      edges
        .groupBy("day")
        .agg(sum(col("d")).as("delta"))
        .withColumn("open_cnt", sum(col("delta")).over(wCum))
        .groupBy(from_unixtime(col("day"), "yyyy-MM").as("month"))
        .agg(max(col("open_cnt")).as("max_open"), min(col("open_cnt")).as("min_open"),
          max_by(col("open_cnt"), col("day")).as("eom_open"))
        .orderBy("month")
    },



    // Rolling 7-day distinct active users — Relational.rollingDistinct
    // (map-side ×7 day explode + one distinct, never a per-day self-join).
    "q_rolling_active" -> { (s, dir) =>
      Relational
        .rollingDistinct(Tables.events(s, dir), "user_id", "ts", windowDays = 7)
        .select(date_format(col("win_day"), "yyyy-MM-dd").as("day"), col("active"))
        .orderBy("day")
    },


    // Event-time DISORDER histogram — the batch profile that sizes a
    // streaming watermark: how late does an event arrive behind the
    // per-user running max? The fixture stream is perfectly ordered, so
    // arrival order is synthesized deterministically (md5 scramble of
    // event_id — the synthesize-then-verify pattern of q_line_dedup /
    // the media queries); lateness = running-max(ts) − ts under that
    // arrival order, bucketed to 10-minute bins capped at 9. Per-user
    // windows partition cleanly at 100 TB (no global order anywhere).
    "q_disorder_histogram" -> { (s, dir) =>
      val wArr = Window.partitionBy("user_id").orderBy(col("ak"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), secs(col("ts")).as("ts_s"))
        // md5-based scramble (the repo-wide deterministic-shuffle idiom):
        // the Knuth multiply 2654435761·event_id wraps Long past ~3.5e9
        // events — silently in Spark, as an error in DuckDB
        .withColumn("ak", Dedup.md5Long(col("event_id").cast("string")))
        .withColumn("lag_s", max(col("ts_s")).over(wArr) - col("ts_s"))
        .groupBy(least(expr("lag_s DIV 600"), lit(9L)).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("lag_s")).as("lag_sum"),
          max(col("lag_s")).as("lag_max"))
        .orderBy("bucket")
    },



    // Gap-fill with LINEAR INTERPOLATION (vs q_gapfill's zero-fill): each
    // missing day bucket gets the straight line between its neighboring
    // known values, edges extrapolate flat. Interpolation is the exact
    // integer quotient (pv·(nb−b) + nv·(b−pb))·10⁶ DIV (nb−pb) — all
    // operands non-negative BIGINTs. The carry-forward/backward windows
    // use ignore-nulls last/first over the per-type spine — |days|-sized
    // frames keyed by the low-cardinality type, never the raw events.
    "q_gapfill_interp" -> { (s, dir) =>
      val b = Tables.events(s, dir)
        .groupBy(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val bounds = b.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      val spine = b.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), lit(86400L))).as("bucket"))
      val wPrev = Window.partitionBy("event_type").orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wNext = Window.partitionBy("event_type").orderBy(col("bucket"))
        .rowsBetween(1, Window.unboundedFollowing)
      spine
        .join(b, Seq("event_type", "bucket"), "left")
        .withColumn("pv", last(col("cnt"), ignoreNulls = true).over(wPrev))
        .withColumn("pb", last(when(col("cnt").isNotNull, col("bucket")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("cnt"), ignoreNulls = true).over(wNext))
        .withColumn("nb", first(when(col("cnt").isNotNull, col("bucket")),
          ignoreNulls = true).over(wNext))
        .select(col("event_type"), col("bucket"),
          col("cnt").isNotNull.cast("long").as("known"),
          when(col("cnt").isNotNull, col("cnt") * 1000000L)
            .when(col("pv").isNull, col("nv") * 1000000L)
            .when(col("nv").isNull, col("pv") * 1000000L)
            .otherwise(expr(
              "(pv * (nb - bucket) + nv * (bucket - pb)) * 1000000 DIV (nb - pb)"))
            .as("interp_q6"))
        .orderBy("event_type", "bucket")
    },

    // Longest consecutive-day activity streak per user — the classic
    // gaps-and-islands via the day − row_number() CONSTANT-GROUP idiom
    // (consecutive days share the difference; a gap shifts it): one
    // per-user window over the DISTINCT-day frame, then per-island
    // aggregation and an argmax. Days-per-user is bounded by the
    // calendar, so every frame after the distinct is small at any scale.
    "q_longest_streak" -> { (s, dir) =>
      val days = Tables.events(s, dir)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      days
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("streak_days"), min(col("day")).as("start_day"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("streak_days").desc, col("start_day"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("streak_days"), col("start_day"))
        .orderBy("user_id")
    },


  )

  def oracleSql: Map[String, String] = Map(

    "q_asof_join" -> ("WITH fact AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t " +
      "FROM events WHERE event_type != 'signup'), " +
      "dim AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, max(event_id) AS sid " +
      "FROM events WHERE event_type = 'signup' GROUP BY 1, 2) " +
      "SELECT f.event_id, f.user_id, coalesce(d.sid, -1) AS last_signup " +
      "FROM fact f ASOF LEFT JOIN dim d ON f.user_id = d.user_id AND f.t >= d.t " +
      "ORDER BY f.event_id"),

    "q_range_band" -> ("WITH bands(lo, hi, band) AS (VALUES " +
      "(0.0, 50.0, 'p_low'), (50.0, 150.0, 'p_mid'), " +
      "(150.0, 300.0, 'p_high'), (300.0, 500.0, 'p_extreme')) " +
      "SELECT band, count(*) AS cnt, round(sum(value), 2) AS sum_value " +
      "FROM events JOIN bands ON value >= lo AND value < hi " +
      "GROUP BY 1 ORDER BY 1"),

    // the oracle states overlap as the plain theta join the bucketed
    // engine form is provably equivalent to
    "q_interval_join" -> ("WITH a AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
      "min(epoch_us(CAST(ts AS TIMESTAMP))) AS a_lo, " +
      "max(epoch_us(CAST(ts AS TIMESTAMP))) + 60000000 AS a_hi " +
      "FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2), " +
      "b AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, " +
      "min(epoch_us(CAST(ts AS TIMESTAMP))) AS b_lo, " +
      "max(epoch_us(CAST(ts AS TIMESTAMP))) + 60000000 AS b_hi " +
      "FROM events WHERE event_type = 'error' GROUP BY 1) " +
      "SELECT a.user_id, count(*) AS n_incidents, " +
      "CAST(sum(least(a_hi, b_hi) - greatest(a_lo, b_lo)) AS BIGINT) AS overlap_us " +
      "FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi " +
      "GROUP BY 1 ORDER BY 1"),

    "q_interval_coverage" -> ("WITH iv AS (SELECT user_id, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) AS lo, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) + (60 + event_id % 540) * 1000000 AS hi " +
      "FROM events WHERE event_type = 'click'), " +
      "flagged AS (SELECT user_id, lo, hi, CASE WHEN " +
      "max(hi) OVER w1 IS NULL OR lo > max(hi) OVER w1 THEN 1 ELSE 0 END AS ni " +
      "FROM iv WINDOW w1 AS (PARTITION BY user_id ORDER BY lo, hi " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
      "isl AS (SELECT user_id, lo, hi, sum(ni) OVER (PARTITION BY user_id " +
      "ORDER BY lo, hi ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island " +
      "FROM flagged), " +
      "merged AS (SELECT user_id, island, min(lo) AS lo, max(hi) AS hi " +
      "FROM isl GROUP BY 1, 2) " +
      "SELECT user_id, count(*) AS n_islands, CAST(sum(hi - lo) AS BIGINT) AS covered_us " +
      "FROM merged GROUP BY 1 ORDER BY 1"),

    // DuckDB's native ASOF picks the greatest touch ts <= purchase ts —
    // the same inclusive-simultaneous contract as Relational.asofJoin
    "q_attribution" -> ("WITH p AS (SELECT event_id, user_id, " +
      "CAST(ts AS TIMESTAMP) AS t, value FROM events WHERE event_type = 'purchase'), " +
      "tch AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, " +
      "arg_max(event_type, event_id) AS channel FROM events " +
      "WHERE event_type IN ('click', 'view') GROUP BY 1, 2) " +
      "SELECT coalesce(tch.channel, 'none') AS channel, count(*) AS cnt, " +
      "round(sum(p.value), 2) AS attr_value " +
      "FROM p ASOF LEFT JOIN tch ON p.user_id = tch.user_id AND p.t >= tch.t " +
      "GROUP BY 1 ORDER BY 1"),

    "q_rfm_segments" -> ("WITH p AS (SELECT user_id, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events " +
      "WHERE event_type = 'purchase'), " +
      "per AS (SELECT user_id, max(us) AS last_us, count(*) AS freq, " +
      "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents " +
      "FROM p GROUP BY 1), " +
      "mx AS (SELECT max(last_us) AS max_us FROM per), " +
      "rfm AS (SELECT user_id, max_us - last_us AS rec_us, freq, cents FROM per, mx), " +
      "th AS (SELECT " +
      "quantile_cont(rec_us, [0.3333333333333333, 0.6666666666666666]) AS rt, " +
      "quantile_cont(freq, [0.3333333333333333, 0.6666666666666666]) AS ft, " +
      "quantile_cont(cents, [0.3333333333333333, 0.6666666666666666]) AS mt FROM rfm) " +
      "SELECT CAST(len(list_filter(rt, x -> rec_us > x)) AS BIGINT) AS r, " +
      "CAST(len(list_filter(ft, x -> freq > x)) AS BIGINT) AS f, " +
      "CAST(len(list_filter(mt, x -> cents > x)) AS BIGINT) AS m, " +
      "count(*) AS n_users FROM rfm, th GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),

    // the identical closed-form ancestor explode — no recursive CTE
    "q_tree_rollup" -> ("WITH anc AS (SELECT unnest(list_filter(" +
      "list_transform(generate_series(0, 20), " +
      "i -> ((doc_id + 1) // CAST(pow(2, i) AS BIGINT)) - 1), " +
      "a -> a >= 0)) AS node, n_chars FROM documents) " +
      "SELECT node, count(*) AS subtree_docs, " +
      "CAST(sum(n_chars) AS BIGINT) AS subtree_chars " +
      "FROM anc GROUP BY 1 ORDER BY 1"),

    "q_ship_lag_percentiles" -> ("WITH lg AS (SELECT o_orderpriority, " +
      "(epoch_us(CAST(l_shipdate AS TIMESTAMP)) - " +
      "epoch_us(CAST(o_orderdate AS TIMESTAMP))) // 86400000000 AS lag_days " +
      "FROM lineitem JOIN orders ON o_orderkey = l_orderkey), " +
      "rk AS (SELECT o_orderpriority, lag_days, " +
      "row_number() OVER (PARTITION BY o_orderpriority ORDER BY lag_days) - 1 AS rn0, " +
      "count(*) OVER (PARTITION BY o_orderpriority) AS n FROM lg) " +
      "SELECT o_orderpriority, count(*) AS n_lines, " +
      s"${pctSql("lag_days", 50)} AS p50_days, " +
      s"${pctSql("lag_days", 90)} AS p90_days, " +
      s"${pctSql("lag_days", 99)} AS p99_days " +
      "FROM rk GROUP BY 1 ORDER BY 1"),

    // the q_session_window session-id CTEs, rolled up twice
    "q_bounce_rate" -> ("WITH flagged AS (" +
      "SELECT user_id, ts, CASE WHEN epoch(CAST(ts AS TIMESTAMP)) - " +
      "epoch(CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS TIMESTAMP)) >= 86400 " +
      "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS new_sess " +
      "FROM events), sess AS (" +
      "SELECT user_id, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts " +
      "ROWS UNBOUNDED PRECEDING) AS sid FROM flagged), " +
      "persess AS (SELECT user_id, sid, count(*) AS cnt FROM sess GROUP BY 1, 2) " +
      "SELECT user_id, count(*) AS n_sessions, " +
      "CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce, " +
      "CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 " +
      "// count(*) AS bounce_q6 FROM persess GROUP BY 1 ORDER BY 1"),

    // same integer-weighted order-statistic form as the engine: the
    // interpolated percentile ×100 is an exact BIGINT, one final /100
    "q_conversion_lag" -> ("WITH su AS (SELECT user_id, " +
      "min(epoch_us(CAST(ts AS TIMESTAMP))) AS su_us FROM events " +
      "WHERE event_type = 'signup' GROUP BY 1), " +
      "pu AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pu_us FROM events " +
      "WHERE event_type = 'purchase'), " +
      "conv AS (SELECT pu.user_id, min(pu_us) - su_us AS lag_us " +
      "FROM pu JOIN su ON pu.user_id = su.user_id AND pu_us >= su_us " +
      "GROUP BY pu.user_id, su_us), " +
      "rk AS (SELECT c_mktsegment AS segment, lag_us, " +
      "row_number() OVER (PARTITION BY c_mktsegment ORDER BY lag_us) - 1 AS rn0, " +
      "count(*) OVER (PARTITION BY c_mktsegment) AS n " +
      "FROM conv JOIN customer ON user_id = c_custkey) " +
      "SELECT segment, count(*) AS n_converted, " +
      "CAST(CAST(sum(CASE WHEN rn0 = ((n-1)*50)//100 THEN lag_us*(100-((n-1)*50)%100) " +
      "WHEN rn0 = ((n-1)*50)//100 + 1 THEN lag_us*(((n-1)*50)%100) ELSE 0 END) " +
      "AS BIGINT) AS DOUBLE)/100 AS p50_lag_us, " +
      "CAST(CAST(sum(CASE WHEN rn0 = ((n-1)*90)//100 THEN lag_us*(100-((n-1)*90)%100) " +
      "WHEN rn0 = ((n-1)*90)//100 + 1 THEN lag_us*(((n-1)*90)%100) ELSE 0 END) " +
      "AS BIGINT) AS DOUBLE)/100 AS p90_lag_us " +
      "FROM rk GROUP BY 1 ORDER BY 1"),

    "q_path_trigrams" -> ("WITH seq AS (SELECT event_type AS step1, " +
      "lead(event_type, 1) OVER w AS step2, lead(event_type, 2) OVER w AS step3 " +
      "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
      "SELECT step1, step2, step3, count(*) AS cnt FROM seq " +
      "WHERE step3 IS NOT NULL GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),

    // same change-interval frame as q_scd2_lookup's dimension, fed into
    // the shared rk/pctSql percentile machinery
    "q_dwell_time" -> ("WITH seq AS (SELECT user_id, ts, event_id, event_type, " +
      "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
      "FROM events), " +
      "chg AS (SELECT user_id, ts, event_id, event_type FROM seq " +
      "WHERE prev_type IS NULL OR prev_type != event_type), " +
      "dw AS (SELECT event_type AS state, " +
      "epoch_us(CAST(lead(ts) OVER w AS TIMESTAMP)) - " +
      "epoch_us(CAST(ts AS TIMESTAMP)) AS dwell_us FROM chg " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
      "rk AS (SELECT state, dwell_us, " +
      "row_number() OVER (PARTITION BY state ORDER BY dwell_us) - 1 AS rn0, " +
      "count(*) OVER (PARTITION BY state) AS n FROM dw WHERE dwell_us IS NOT NULL) " +
      "SELECT state, count(*) AS n_intervals, " +
      s"${pctSql("dwell_us", 50)} AS p50_dwell_us, " +
      s"${pctSql("dwell_us", 90)} AS p90_dwell_us " +
      "FROM rk GROUP BY 1 ORDER BY 1"),

    // day-spine self-join per lag; the q_rolling_corr moment recipe
    "q_cross_correlation" -> ("WITH d AS (SELECT " +
      "epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, " +
      "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
      "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS e " +
      "FROM events WHERE event_type IN ('click', 'error') GROUP BY 1), " +
      "p AS (SELECT l.lag, a.c, b.e FROM d a " +
      "CROSS JOIN (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]::BIGINT[]) AS lag) l " +
      "JOIN d b ON b.day = a.day + l.lag), " +
      "m AS (SELECT lag, count(*) AS n, CAST(sum(c) AS BIGINT) AS sc, " +
      "CAST(sum(e) AS BIGINT) AS se, CAST(sum(c * e) AS BIGINT) AS sce, " +
      "CAST(sum(c * c) AS BIGINT) AS scc, CAST(sum(e * e) AS BIGINT) AS see " +
      "FROM p GROUP BY 1), " +
      "v AS (SELECT lag, n, n * scc - sc * sc AS vc, n * see - se * se AS ve, " +
      "n * sce - sc * se AS cov FROM m) " +
      "SELECT lag, n, CASE WHEN vc > 0 AND ve > 0 THEN " +
      "CAST(cov AS DOUBLE) / (sqrt(CAST(vc AS DOUBLE)) * sqrt(CAST(ve AS DOUBLE))) " +
      "END AS r FROM v ORDER BY lag"),

    "q_rolling_p95" -> ("WITH daily AS (SELECT event_type, " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, round(sum(value), 2) AS daily " +
      "FROM events GROUP BY 1, 2) " +
      "SELECT event_type, strftime(day, '%Y-%m-%d') AS day, daily, " +
      "round(quantile_cont(daily, 0.95) OVER (PARTITION BY event_type ORDER BY day " +
      "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS p95_7d " +
      "FROM daily ORDER BY 1, 2"),

    "q_sliding_window" -> ("SELECT w_start, count(*) AS cnt FROM (" +
      "SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP))/60)*60 AS BIGINT) - 60 * r.range AS w_start " +
      "FROM events CROSS JOIN range(5) r) GROUP BY 1 ORDER BY 1"),

    "q_session_window" -> ("WITH flagged AS (" +
      "SELECT user_id, ts, CASE WHEN epoch(CAST(ts AS TIMESTAMP)) - " +
      "epoch(CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS TIMESTAMP)) >= 86400 " +
      "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS new_sess " +
      "FROM events), sess AS (" +
      "SELECT user_id, ts, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts " +
      "ROWS UNBOUNDED PRECEDING) AS sid FROM flagged) " +
      "SELECT user_id, CAST(floor(epoch(CAST(min(ts) AS TIMESTAMP))) AS BIGINT) AS sess_start, " +
      "count(*) AS cnt FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start"),

    "q_event_paths" -> ("WITH seq AS (SELECT user_id, event_type, " +
      "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
      "FROM events) " +
      "SELECT prev_type, event_type AS next_type, count(*) AS cnt FROM seq " +
      "WHERE prev_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_moving_sum" -> ("SELECT o_custkey, o_orderkey, " +
      "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER (" +
      "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
      "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_cents " +
      "FROM orders ORDER BY 1, 2"),

    "q_user_sequences" -> ("SELECT user_id, " +
      "strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day, " +
      "string_agg(event_type, '>' ORDER BY ts, event_id) AS seq, " +
      "count(*) AS n_events FROM events GROUP BY 1, 2 ORDER BY 1, 2"),

    // step i+1 counts only events STRICTLY AFTER the user's step-i time
    "q_funnel" -> ("WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1 " +
      "FROM events WHERE event_type = 'view' GROUP BY 1), " +
      "c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2 FROM events e " +
      "JOIN v ON e.user_id = v.user_id " +
      "WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t1 GROUP BY 1), " +
      "p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3 FROM events e " +
      "JOIN c ON e.user_id = c.user_id " +
      "WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t2 GROUP BY 1) " +
      "SELECT 1 AS step_idx, 'view' AS step, count(*) AS users FROM v " +
      "UNION ALL SELECT 2, 'click', count(*) FROM c " +
      "UNION ALL SELECT 3, 'purchase', count(*) FROM p ORDER BY step_idx"),

    // first-touch: anchor at the user's FIRST view; each later step is the
    // first qualifying event strictly after the previous step AND within
    // the 7200 s gap of it (millisecond comparison, same boundary
    // semantics as the engine's unix_millis)
    "q_funnel_window" -> ("WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1 " +
      "FROM events WHERE event_type = 'view' GROUP BY 1), " +
      "c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2 FROM events e " +
      "JOIN v ON e.user_id = v.user_id " +
      "WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t1 " +
      "AND epoch_ms(CAST(e.ts AS TIMESTAMP)) <= epoch_ms(v.t1) + 7200000 GROUP BY 1), " +
      "p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3 FROM events e " +
      "JOIN c ON e.user_id = c.user_id " +
      "WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t2 " +
      "AND epoch_ms(CAST(e.ts AS TIMESTAMP)) <= epoch_ms(c.t2) + 7200000 GROUP BY 1) " +
      "SELECT 1 AS step_idx, 'view' AS step, count(*) AS users FROM v " +
      "UNION ALL SELECT 2, 'click', count(*) FROM c " +
      "UNION ALL SELECT 3, 'purchase', count(*) FROM p ORDER BY step_idx"),

    // existence semantics = literal EXISTS chains (any qualifying pair/
    // triple), time compared at the engine's millisecond truncation
    "q_funnel_exists" -> ("WITH e AS (SELECT user_id, event_type AS y, " +
      "epoch_ms(CAST(ts AS TIMESTAMP)) AS t FROM events " +
      "WHERE event_type IN ('view', 'click', 'purchase')), " +
      "s1 AS (SELECT DISTINCT user_id FROM e WHERE y = 'view'), " +
      "s2 AS (SELECT DISTINCT v.user_id FROM e v JOIN e c ON v.user_id = c.user_id " +
      "AND v.y = 'view' AND c.y = 'click' AND c.t > v.t AND c.t <= v.t + 7200000), " +
      "s3 AS (SELECT DISTINCT v.user_id FROM e v JOIN e c ON v.user_id = c.user_id " +
      "AND v.y = 'view' AND c.y = 'click' AND c.t > v.t AND c.t <= v.t + 7200000 " +
      "JOIN e p ON p.user_id = v.user_id AND p.y = 'purchase' " +
      "AND p.t > c.t AND p.t <= c.t + 7200000) " +
      "SELECT 1 AS step_idx, 'view' AS step, count(*) AS users FROM s1 " +
      "UNION ALL SELECT 2, 'click', count(*) FROM s2 " +
      "UNION ALL SELECT 3, 'purchase', count(*) FROM s3 ORDER BY step_idx"),




    // the same integer rolling moments and guarded IEEE expression
    "q_rolling_corr" -> ("WITH d AS (SELECT " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))/86400)*86400 AS BIGINT) AS day, " +
      "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
      "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS e " +
      "FROM events WHERE event_type IN ('click', 'error') GROUP BY 1), " +
      "m AS (SELECT day, count(*) OVER w AS n, " +
      "CAST(sum(c) OVER w AS BIGINT) AS sc, CAST(sum(e) OVER w AS BIGINT) AS se, " +
      "CAST(sum(c * e) OVER w AS BIGINT) AS sce, " +
      "CAST(sum(c * c) OVER w AS BIGINT) AS scc, " +
      "CAST(sum(e * e) OVER w AS BIGINT) AS see FROM d " +
      "WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) " +
      "SELECT day, sc, se, CASE WHEN n*scc - sc*sc > 0 AND n*see - se*se > 0 THEN " +
      "(n*sce - sc*se)::DOUBLE / (sqrt((n*scc - sc*sc)::DOUBLE) * " +
      "sqrt((n*see - se*se)::DOUBLE)) END AS r " +
      "FROM m WHERE n = 7 ORDER BY day"),

    // same user-keyed range join, per-purchase window count, and
    // truncating credit split
    // exact power-of-2 decay weights as right shifts; same interval join
    "q_decay_attribution" -> ("WITH p AS (SELECT user_id, event_id AS p_id, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS p_s " +
      "FROM events WHERE event_type = 'purchase'), " +
      "t AS (SELECT user_id, event_type AS channel, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t_s " +
      "FROM events WHERE event_type IN ('click', 'view')), " +
      "j AS (SELECT p_id, channel, " +
      "CAST(1000000 >> CAST((p_s - t_s) // 86400 AS INT) AS BIGINT) AS w " +
      "FROM p JOIN t ON p.user_id = t.user_id " +
      "AND t_s <= p_s AND t_s >= p_s - 604800), " +
      "c AS (SELECT channel, w * 1000000 // " +
      "CAST(sum(w) OVER (PARTITION BY p_id) AS BIGINT) AS credit_q6 FROM j) " +
      "SELECT channel, count(*) AS n_touches, " +
      "CAST(sum(credit_q6) AS BIGINT) AS credit_q6_sum FROM c " +
      "GROUP BY 1 ORDER BY 1"),

    // same interval join; U-shaped credit over (row_number, count) windows
    "q_position_attribution" -> ("WITH p AS (SELECT user_id, event_id AS p_id, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS p_s " +
      "FROM events WHERE event_type = 'purchase'), " +
      "t AS (SELECT user_id, event_type AS channel, event_id AS t_id, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t_s " +
      "FROM events WHERE event_type IN ('click', 'view')), " +
      "j AS (SELECT p_id, channel, " +
      "row_number() OVER (PARTITION BY p_id ORDER BY t_s, t_id) AS rn, " +
      "count(*) OVER (PARTITION BY p_id) AS n_touch " +
      "FROM p JOIN t ON p.user_id = t.user_id AND t_s <= p_s AND t_s >= p_s - 86400), " +
      "c AS (SELECT channel, CASE WHEN n_touch = 1 THEN 1000000 " +
      "WHEN n_touch = 2 THEN 500000 " +
      "WHEN rn = 1 OR rn = n_touch THEN 400000 " +
      "ELSE 200000 // (n_touch - 2) END AS credit_q6 FROM j) " +
      "SELECT channel, count(*) AS n_touches, " +
      "CAST(sum(credit_q6) AS BIGINT) AS credit_q6_sum FROM c GROUP BY 1 ORDER BY 1"),

    "q_linear_attribution" -> ("WITH p AS (SELECT user_id, event_id AS p_id, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS p_s " +
      "FROM events WHERE event_type = 'purchase'), " +
      "t AS (SELECT user_id, event_type AS channel, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t_s " +
      "FROM events WHERE event_type IN ('click', 'view')), " +
      "j AS (SELECT p_id, channel FROM p JOIN t ON p.user_id = t.user_id " +
      "AND t_s <= p_s AND t_s >= p_s - 86400), " +
      "c AS (SELECT channel, p_id, " +
      "1000000 // count(*) OVER (PARTITION BY p_id) AS credit_q6 FROM j) " +
      "SELECT channel, count(*) AS n_touches, " +
      "CAST(sum(credit_q6) AS BIGINT) AS credit_q6_sum, " +
      "count(DISTINCT p_id) AS n_purchases FROM c GROUP BY 1 ORDER BY 1"),


    // the level expression inlined twice inside the trend step, exactly
    // like the engine's fold; // floors toward −∞ on negative trends
    "q_ship_split_rate" -> ("SELECT n_shipments, count(*) AS n_orders FROM " +
      "(SELECT l_orderkey, count(DISTINCT l_shipdate) AS n_shipments " +
      "FROM lineitem GROUP BY 1) GROUP BY 1 ORDER BY 1"),

    // same open-at-snapshot filter + the x100 integer percentile recipe
    "q_backlog_age" -> ("WITH ends AS (SELECT l_orderkey, " +
      "CAST(max(epoch(CAST(l_shipdate AS TIMESTAMP))) AS BIGINT) AS end_s " +
      "FROM lineitem GROUP BY 1), " +
      "open_o AS (SELECT o_orderpriority AS prio, " +
      "(804470400 - CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)) // 86400 " +
      "AS age_days FROM orders JOIN ends ON o_orderkey = l_orderkey " +
      "WHERE CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) <= 804470400 " +
      "AND end_s > 804470400), " +
      "rk AS (SELECT prio, age_days, " +
      "row_number() OVER (PARTITION BY prio ORDER BY age_days) - 1 AS rn0, " +
      "count(*) OVER (PARTITION BY prio) AS n FROM open_o) " +
      "SELECT prio, count(*) AS n_open, " +
      s"${pctSql("age_days", 50)} AS p50_days, " +
      s"${pctSql("age_days", 90)} AS p90_days " +
      "FROM rk GROUP BY 1 ORDER BY 1"),

    // same ±1 edge sweep; arg_max gives the end-of-month running count
    "q_concurrency_profile" -> ("WITH ends AS (SELECT l_orderkey, " +
      "CAST(max(epoch(CAST(l_shipdate AS TIMESTAMP))) AS BIGINT) AS end_s " +
      "FROM lineitem GROUP BY 1), " +
      "iv AS (SELECT CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS start_s, " +
      "end_s FROM orders JOIN ends ON o_orderkey = l_orderkey), " +
      "edges AS (SELECT start_s AS day, CAST(1 AS BIGINT) AS d FROM iv " +
      "UNION ALL SELECT end_s, -1 FROM iv), " +
      "daily AS (SELECT day, CAST(sum(d) AS BIGINT) AS delta FROM edges GROUP BY 1), " +
      "run AS (SELECT day, CAST(sum(delta) OVER (ORDER BY day " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_cnt FROM daily) " +
      "SELECT strftime(to_timestamp(day), '%Y-%m') AS month, " +
      "max(open_cnt) AS max_open, min(open_cnt) AS min_open, " +
      "arg_max(open_cnt, day) AS eom_open FROM run GROUP BY 1 ORDER BY 1"),




    // each (user, day) contributes to days d..d+6; trailing days past the
    // corpus max are trimmed — identical to the engine's 1-row bound join
    "q_rolling_active" -> ("WITH days AS (SELECT DISTINCT user_id, " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events), " +
      "mx AS (SELECT max(d) AS m FROM days), " +
      "contrib AS (SELECT user_id, unnest(generate_series(d, d + INTERVAL 6 DAY, " +
      "INTERVAL 1 DAY)) AS win_day FROM days) " +
      "SELECT strftime(CAST(win_day AS DATE), '%Y-%m-%d') AS day, " +
      "count(DISTINCT user_id) AS active FROM contrib, mx " +
      "WHERE CAST(win_day AS DATE) <= mx.m GROUP BY 1 ORDER BY 1"),


    // same md5 arrival scramble; the running-max window's default
    // RANGE frame
    // equals Spark's (the (ak, event_id) order is tie-free)
    "q_disorder_histogram" -> ("WITH e AS (SELECT user_id, event_id, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s, " +
      "('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT AS ak FROM events), " +
      "l AS (SELECT ts_s, max(ts_s) OVER (PARTITION BY user_id ORDER BY ak, event_id) " +
      "- ts_s AS lag_s FROM e) " +
      "SELECT least(lag_s // 600, 9) AS bucket, count(*) AS n, " +
      "CAST(sum(lag_s) AS BIGINT) AS lag_sum, max(lag_s) AS lag_max " +
      "FROM l GROUP BY 1 ORDER BY 1"),



    // same ignore-nulls carry windows over the same spine and the same
    // exact integer interpolation quotient
    "q_gapfill_interp" -> ("WITH b AS (SELECT event_type, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) * 86400 AS BIGINT) AS bucket, " +
      "count(*) AS cnt FROM events GROUP BY 1, 2), " +
      "spine AS (SELECT event_type, unnest(generate_series(lo, hi, 86400)) AS bucket " +
      "FROM (SELECT DISTINCT event_type FROM b), " +
      "(SELECT min(bucket) AS lo, max(bucket) AS hi FROM b)), " +
      "j AS (SELECT s.event_type, s.bucket, b.cnt FROM spine s " +
      "LEFT JOIN b ON s.event_type = b.event_type AND s.bucket = b.bucket), " +
      "f AS (SELECT event_type, bucket, cnt, " +
      "last_value(cnt IGNORE NULLS) OVER wp AS pv, " +
      "last_value(CASE WHEN cnt IS NOT NULL THEN bucket END IGNORE NULLS) OVER wp AS pb, " +
      "first_value(cnt IGNORE NULLS) OVER wn AS nv, " +
      "first_value(CASE WHEN cnt IS NOT NULL THEN bucket END IGNORE NULLS) OVER wn AS nb " +
      "FROM j WINDOW " +
      "wp AS (PARTITION BY event_type ORDER BY bucket " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
      "wn AS (PARTITION BY event_type ORDER BY bucket " +
      "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)) " +
      "SELECT event_type, bucket, " +
      "CASE WHEN cnt IS NOT NULL THEN 1 ELSE 0 END AS known, " +
      "CASE WHEN cnt IS NOT NULL THEN cnt * 1000000 " +
      "WHEN pv IS NULL THEN nv * 1000000 WHEN nv IS NULL THEN pv * 1000000 " +
      "ELSE (pv * (nb - bucket) + nv * (bucket - pb)) * 1000000 // (nb - pb) END " +
      "AS interp_q6 FROM f ORDER BY event_type, bucket"),

    // the identical day − row_number island key and argmax tie order
    "q_longest_streak" -> ("WITH d AS (SELECT DISTINCT user_id, " +
      "CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS BIGINT) AS day " +
      "FROM events), " +
      "g AS (SELECT user_id, day, day - row_number() OVER " +
      "(PARTITION BY user_id ORDER BY day) AS grp FROM d), " +
      "i AS (SELECT user_id, grp, count(*) AS streak_days, min(day) AS start_day " +
      "FROM g GROUP BY 1, 2), " +
      "r AS (SELECT user_id, streak_days, start_day, row_number() OVER " +
      "(PARTITION BY user_id ORDER BY streak_days DESC, start_day) AS rn FROM i) " +
      "SELECT user_id, streak_days, start_day FROM r WHERE rn = 1 ORDER BY user_id"),


  )
}
