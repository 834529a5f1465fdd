package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import RelationalQueries.{secs, dailyCents, pctSql, DailyCentsCte}

/** Declared time-series, funnel and attribution queries — split from [[RelationalQueries]]
  * (pure code motion, round 12); see its scaladoc for the shared
  * column-alignment / determinism / rounding contracts.
  */
object RelationalTsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // GRANGER-STYLE LAGGED-REGRESSION F — "does yesterday's order COUNT
    // help predict today's revenue beyond yesterday's revenue?": the
    // restricted model y_t ~ y_{t−1} vs the full y_t ~ y_{t−1} + x_{t−1},
    // F = (SSE_r − SSE_f) / (SSE_f/(n−3)). Lags ride ONE window over the
    // time-bounded day grid (the q_theil_sen contract: value-space sized,
    // never corpus rows; a gap's lag is the previous OBSERVED day by
    // declared contract). Exact DECIMAL moments over the grid, the
    // q_ols_multi once-cast centered terms, Cramer solve, fixed-order F —
    // cross-engine bit-reproducible where a native OLS would stream
    // co-moments nondeterministically.
    "q_granger_lite" -> { (s, dir) =>
      val dec = "decimal(38,0)"
      val daily = Tables.orders(s, dir)
        .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")
          .as("epoch_day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"),
          count(lit(1)).as("cnt"))
      val w = Window.orderBy("epoch_day")
      val lagged = daily
        .withColumn("x1", lag(col("y"), 1).over(w))
        .withColumn("x2", lag(col("cnt"), 1).over(w))
        .filter(col("x1").isNotNull)
      def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(dec))
      val m = lagged.agg(count(lit(1)).as("n"),
        dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"), dsum(col("y")).as("sy"),
        dsum(col("x1").cast(dec) * col("x1")).as("s11"),
        dsum(col("x2").cast(dec) * col("x2")).as("s22"),
        dsum(col("x1").cast(dec) * col("x2")).as("s12"),
        dsum(col("x1").cast(dec) * col("y")).as("s1y"),
        dsum(col("x2").cast(dec) * col("y")).as("s2y"),
        dsum(col("y").cast(dec) * col("y")).as("syy"))
      def ctr(sab: String, a: String, b: String) =
        (col("n").cast(dec) * col(sab) - col(a) * col(b)).cast("double")
      m.withColumn("c11", ctr("s11", "s1", "s1"))
        .withColumn("c22", ctr("s22", "s2", "s2"))
        .withColumn("c12", ctr("s12", "s1", "s2"))
        .withColumn("c1y", ctr("s1y", "s1", "sy"))
        .withColumn("c2y", ctr("s2y", "s2", "sy"))
        .withColumn("cyy", ctr("syy", "sy", "sy"))
        .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
        .withColumn("ssr_f",
          (col("c1y") * col("c22") - col("c2y") * col("c12")) / col("det") * col("c1y") +
            (col("c2y") * col("c11") - col("c1y") * col("c12")) / col("det") * col("c2y"))
        .withColumn("sse_f", col("cyy") - col("ssr_f"))
        .withColumn("sse_r", col("cyy") - col("c1y") * col("c1y") / col("c11"))
        .select(col("n"),
          ((col("sse_r") - col("sse_f")) / (col("sse_f") / (col("n") - lit(3)).cast("double")))
            .as("f"),
          (col("ssr_f") / col("cyy")).as("r2_full"),
          (col("c1y") * col("c1y") / col("c11") / col("cyy")).as("r2_restricted"))
    },

    // TPC-H Q6-shaped filtered revenue: pure filter-aggregate — every
    // predicate (date range, discount band, quantity cap) pushes to the
    // parquet scan, partial+final agg, no join. The canonical "scan
    // bandwidth" probe at 100 TB.
    "q_revenue_forecast" -> { (s, dir) =>
      Tables
        .lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    },

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
        .withColumn("n_touch", count(lit(1)).over(Window.partitionBy("p_id")))
        .withColumn("credit_q6", expr("1000000 DIV n_touch"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_q6")).as("credit_q6_sum"),
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
        .withColumn("w",
          expr("shiftright(1000000L, CAST((p_s - t_s) DIV 86400 AS INT))"))
        .withColumn("wsum", sum(col("w")).over(Window.partitionBy("p_id")))
        .withColumn("credit_q6", expr("w * 1000000 DIV wsum"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"), sum(col("credit_q6")).as("credit_q6_sum"))
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

    // Week-over-week growth: weekly counts per event_type + lag + pct
    // change — the period-comparison every metrics dashboard ships.
    // Counts are exact longs; the pct is ONE IEEE division of integers
    // (engine-exact); the first week's change is null on both sides.
    "q_week_over_week" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val weekly = Tables
        .events(s, dir)
        .groupBy(col("event_type"),
          date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("week")
      weekly
        .withColumn("prev_cnt", lag(col("cnt"), 1).over(w))
        .withColumn("pct_change",
          (col("cnt") - col("prev_cnt")).cast("double") * 100.0 / col("prev_cnt"))
        .orderBy("event_type", "week")
    },

    // Cohort retention matrix: first-active day × day offset × distinct
    // users (offsets 0..7) — two user-keyed shuffles regardless of range.
    "q_cohort_retention" -> { (s, dir) =>
      Relational
        .cohortRetention(Tables.events(s, dir), "user_id", "ts", maxOffsetDays = 7)
        .orderBy("cohort_day", "day_offset")
    },

    // LTV curve — cumulative purchase revenue per acquisition cohort by
    // age: the growth metric next to q_cohort_retention's activity
    // counts. Cohort = each user's FIRST purchase week; age = weeks
    // since; revenue in exact cents; the cumulative rides one ordered
    // window over the (cohort, age) aggregate (weeks² rows at any
    // corpus size). Per-user LTV at age a is then cum DIV cohort size —
    // an exact integer quotient.
    "q_ltv_curve" -> { (s, dir) =>
      val p = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
          floor(coalesce(col("value"), lit(0.0)) * 100).cast("long").as("cents"))
        .select(col("user_id"), expr("day DIV 7").as("week"), col("cents"))
      val first = p.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      val sized = first.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_users"))
      val wCum = Window.partitionBy("cohort_week").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.join(first, Seq("user_id"))
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("age"))
        .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_purchases"))
        .withColumn("cum_cents", sum(col("rev_cents")).over(wCum))
        .join(sized, Seq("cohort_week"))
        .select(col("cohort_week"), col("age"), col("n_purchases"), col("rev_cents"),
          col("cum_cents"), col("cohort_users"),
          expr("cum_cents DIV cohort_users").as("ltv_cents"))
        .orderBy("cohort_week", "age")
    },

    // EWMA trend smoothing (α = 0.25) over per-type daily revenue cents —
    // the serial floor-division recurrence a forecasting pass runs after
    // the distributed daily aggregate; all-integer so the full trajectory
    // is hash-exact (Relational.ewmaInteger; the oracle replays the same
    // recurrence with a recursive CTE).
    "q_ewma_daily" -> { (s, dir) =>
      val daily = Tables
        .events(s, dir)
        .groupBy(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      Relational
        .ewmaInteger(daily, "event_type", "day", "cents", aNum = 25, aDen = 100)
        .select(col("event_type"), col("day"), col("cents"), col("ewma").as("ewma_cents"))
        .orderBy("event_type", "day")
    },

    // Forecast BACKTEST: one-step-ahead EWMA predictions (yesterday's
    // smoothed level predicts today) scored by WAPE = Σ|err|·10⁶ DIV
    // Σactual per event type — the eval that decides whether the smoother
    // is good enough to alert on. The integer recurrence makes every
    // prediction exact, so the error metric itself hash-checks. One lag
    // window + one aggregation over the |days|-sized smoothed frame.
    "q_forecast_backtest" -> { (s, dir) =>
      val daily = Tables
        .events(s, dir)
        .groupBy(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      val w = Window.partitionBy("event_type").orderBy("day")
      Relational
        .ewmaInteger(daily, "event_type", "day", "cents", aNum = 25, aDen = 100)
        .withColumn("pred", lag(col("ewma"), 1).over(w))
        .filter(col("pred").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("cents") - col("pred"))).as("sum_abs_err"),
          sum(col("cents")).as("sum_actual"))
        .select(col("event_type"), col("n_days"), col("sum_abs_err"), col("sum_actual"),
          expr("sum_abs_err * 1000000 DIV nullif(sum_actual, 0)").as("wape_q6"))
        .orderBy("event_type")
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

    // Holt–Winters additive seasonal (period 7) on the same daily frame —
    // the weekday-aware forecast the trend-only q_holt_forecast can't
    // produce; integer recurrence, recursive-CTE oracle carrying the
    // rolling 7-seasonal list.
    "q_holt_winters" -> { (s, dir) =>
      val daily = Tables
        .events(s, dir)
        .groupBy(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      Relational
        .holtWintersInteger(daily, "event_type", "day", "cents",
          aNum = 30, aDen = 100, gNum = 20, gDen = 100, period = 7)
        .orderBy("event_type", "day")
    },

    "q_holt_forecast" -> { (s, dir) =>
      val daily = Tables
        .events(s, dir)
        .groupBy(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      Relational
        .holtInteger(daily, "event_type", "day", "cents",
          aNum = 30, aDen = 100, bNum = 20, bDen = 100)
        .orderBy("event_type", "day")
    },

    // Rolling 7-day distinct active users — Relational.rollingDistinct
    // (map-side ×7 day explode + one distinct, never a per-day self-join).
    "q_rolling_active" -> { (s, dir) =>
      Relational
        .rollingDistinct(Tables.events(s, dir), "user_id", "ts", windowDays = 7)
        .select(date_format(col("win_day"), "yyyy-MM-dd").as("day"), col("active"))
        .orderBy("day")
    },

    // Weekday seasonality decomposition of daily revenue: seasonal = the
    // weekday mean over the DAILY aggregate (one scan to |days| rows, the
    // window runs over that small frame), residual = day − seasonal. The
    // weekday index is timezone-free integer math — (days-since-epoch+3)%7,
    // Monday=0 (1970-01-01 was a Thursday) — identical in both engines;
    // seasonal is one IEEE division of exact integers, residual one
    // subtraction of identically-computed doubles.
    "q_weekday_seasonality" -> { (s, dir) =>
      val daily = dailyCents(s, dir)
        .withColumn("dow", pmod(col("epoch_day") + 3, lit(7)))
      val wDow = Window.partitionBy("dow")
      daily
        .withColumn("seasonal_cents",
          (sum(col("day_cents")).over(wDow).cast("double")
            / count(lit(1)).over(wDow)))
        .select(col("epoch_day"), col("dow"), col("day_cents"), col("seasonal_cents"),
          (col("day_cents") - col("seasonal_cents")).as("resid_cents"))
        .orderBy("epoch_day")
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

    // Autocorrelation of daily revenue at lags 1..7 — the "is there weekly
    // structure" companion to q_weekday_seasonality. Exactness recipe:
    // deviations are the EXACT integers n·x_t − S (no float mean), each
    // lag-k product is ONE IEEE multiply of exactly-representable
    // operands, floor(p/1e12) quantizes every term identically in both
    // engines, and the term sums are order-free BIGINT adds. The corpus
    // collapses to the |days|-sized daily frame before any window or
    // join; the lag self-join and the 7-row lag frame are both tiny by
    // construction at ANY corpus scale (|days| grows with time, not data).
    "q_autocorrelation" -> { (s, dir) =>
      val wAll = Window.partitionBy()
      val daily = dailyCents(s, dir)
      // the deviation frame feeds the denominator AND both join sides —
      // materialize the |days|-sized result once so the corpus-sized
      // orders scan + daily aggregation run exactly once, not three times
      val r = daily
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("s", sum(col("day_cents")).over(wAll))
        .withColumn("rn", row_number().over(Window.orderBy(col("epoch_day"))))
        .select(col("rn"),
          (col("n") * col("day_cents") - col("s")).cast("double").as("dev"))
        .localCheckpoint()
      val den = r.agg(
        sum(floor(col("dev") * col("dev") / 1e12).cast("long")).as("den_s"))
      val lags = s.range(1, 8).select(col("id").as("k"))
      r.as("a")
        .crossJoin(broadcast(lags))
        .join(r.as("b"), col("b.rn") === col("a.rn") + col("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(floor(col("a.dev") * col("b.dev") / 1e12).cast("long")).as("num_s"))
        .crossJoin(broadcast(den))
        .select(col("k"), col("n_pairs"), col("num_s"), col("den_s"),
          (col("num_s").cast("double") / col("den_s").cast("double")).as("acf"))
        .orderBy("k")
    },

    // CUSUM changepoint scan over daily revenue: C_t = Σ_{i≤t}(n·x_i − S)
    // is an EXACT BIGINT running sum (mean-centered without a float mean —
    // same n·x − S trick as q_autocorrelation), and the |C_t| peaks mark
    // where the level shifted (Page 1954's statistic, scan form). Top-5
    // by (|C|, day) total order. The ordered cumulative window runs over
    // the |days|-sized aggregate only.
    "q_cusum_changepoint" -> { (s, dir) =>
      val wAll = Window.partitionBy()
      val daily = dailyCents(s, dir)
      daily
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("s", sum(col("day_cents")).over(wAll))
        .withColumn("cusum", sum(col("n") * col("day_cents") - col("s")).over(
          Window.orderBy(col("epoch_day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rank", row_number().over(
          Window.orderBy(abs(col("cusum")).desc, col("epoch_day"))))
        .filter(col("rank") <= 5)
        .select(col("rank"), col("epoch_day"), col("cusum"))
        .orderBy("rank")
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

    // SEASONALLY-ADJUSTED anomaly days: MAD outliers of daily revenue
    // computed WITHIN each weekday group — "high for a Saturday", not
    // "high in general" (a plain global MAD flags every weekend or none).
    // Composes the q_weekday_seasonality grouping with the madOutliers
    // whole-partition window machinery (one dow exchange over the
    // |days|-sized aggregate; the corpus collapses first).
    "q_seasonal_outliers" -> { (s, dir) =>
      val daily = dailyCents(s, dir)
        .withColumn("dow", pmod(col("epoch_day") + 3, lit(7)))
      Relational
        .madOutliers(daily, Seq("dow"), "day_cents", k = 3.0)
        .select(col("epoch_day"), col("dow"), col("day_cents"),
          col("med"), col("mad"), col("is_anomaly"))
        .orderBy("epoch_day")
    },

    // Temporal churn-label construction — the leakage-safe training-table
    // builder: features counted STRICTLY BEFORE the cutoff (30-day
    // window), the label (any purchase) strictly on-or-after within ONE
    // day — sized to the fixture's event cadence so both label values
    // actually occur (a 30-day label window saturates to all-1 here); the
    // cutoff is the deterministic midpoint of the event-time span
    // (broadcast 1-row aggregate). One conditional-aggregation pass per
    // user — the pattern that generalizes to any (feature window, label
    // window) pair without a self-join.
    "q_churn_labels" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(col("user_id"), secs(col("ts")).as("s"), col("event_type"))
      val cut = e.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
        .select(expr("(lo + hi) DIV 2").as("t"))
      val day30 = 30L * 86400L
      e.crossJoin(broadcast(cut))
        .withColumn("feat", col("s") >= col("t") - day30 && col("s") < col("t"))
        .withColumn("lab", col("s") >= col("t") && col("s") < col("t") + 86400L)
        .groupBy(col("user_id"))
        .agg(
          sum((col("feat") && col("event_type") === "click").cast("long")).as("f_clicks"),
          sum((col("feat") && col("event_type") === "view").cast("long")).as("f_views"),
          sum((col("feat") && col("event_type") === "error").cast("long")).as("f_errors"),
          sum(col("feat").cast("long")).as("f_events"),
          max((col("lab") && col("event_type") === "purchase").cast("long")).as("label"))
        .filter(col("f_events") > 0)
        .select(col("user_id"), col("f_clicks"), col("f_views"), col("f_errors"),
          col("f_events"), col("label"))
        .orderBy("user_id")
    }
  )

  def oracleSql: Map[String, String] = Map(
    // same day grid, same observed-day lag, HUGEINT moments, identical
    // once-cast centered terms and fixed-order Cramer/SSE/F expressions
    "q_granger_lite" -> ("WITH daily AS (SELECT CAST(CAST(o_orderdate AS DATE) " +
      "- DATE '1970-01-01' AS BIGINT) AS epoch_day, " +
      "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y, " +
      "count(*) AS cnt FROM orders GROUP BY 1), " +
      "lg AS (SELECT y, lag(y) OVER (ORDER BY epoch_day) AS x1, " +
      "lag(cnt) OVER (ORDER BY epoch_day) AS x2 FROM daily), " +
      "flt AS (SELECT * FROM lg WHERE x1 IS NOT NULL), " +
      "one AS (SELECT count(*) AS n, sum(x1::HUGEINT) AS s1, sum(x2::HUGEINT) AS s2, " +
      "sum(y::HUGEINT) AS sy, sum(x1::HUGEINT * x1) AS s11, sum(x2::HUGEINT * x2) AS s22, " +
      "sum(x1::HUGEINT * x2) AS s12, sum(x1::HUGEINT * y) AS s1y, " +
      "sum(x2::HUGEINT * y) AS s2y, sum(y::HUGEINT * y) AS syy FROM flt), " +
      "c AS (SELECT n, (n*s11 - s1*s1)::DOUBLE AS c11, (n*s22 - s2*s2)::DOUBLE AS c22, " +
      "(n*s12 - s1*s2)::DOUBLE AS c12, (n*s1y - s1*sy)::DOUBLE AS c1y, " +
      "(n*s2y - s2*sy)::DOUBLE AS c2y, (n*syy - sy*sy)::DOUBLE AS cyy FROM one), " +
      "d AS (SELECT *, c11*c22 - c12*c12 AS det FROM c), " +
      "e AS (SELECT *, (c1y*c22 - c2y*c12) / det * c1y + " +
      "(c2y*c11 - c1y*c12) / det * c2y AS ssr_f FROM d), " +
      "g AS (SELECT *, cyy - ssr_f AS sse_f, cyy - c1y*c1y/c11 AS sse_r FROM e) " +
      "SELECT CAST(n AS BIGINT) AS n, " +
      "(sse_r - sse_f) / (sse_f / (n - 3)::DOUBLE) AS f, " +
      "ssr_f / cyy AS r2_full, c1y*c1y/c11/cyy AS r2_restricted FROM g"),
    "q_revenue_forecast" -> ("SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue " +
      "FROM lineitem WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01' " +
      "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),

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

    // date_trunc('week', ..) is ISO-Monday-start in both engines
    "q_week_over_week" -> ("WITH weekly AS (SELECT event_type, " +
      "strftime(date_trunc('week', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS week, " +
      "count(*) AS cnt FROM events GROUP BY 1, 2) " +
      "SELECT event_type, week, cnt, " +
      "lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev_cnt, " +
      "CAST(cnt - lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY week) AS DOUBLE) " +
      "* 100.0 / lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY week) AS pct_change " +
      "FROM weekly ORDER BY event_type, week"),

    // the same serial recurrence replayed per key by a recursive CTE
    // chained on the per-key row number; `//` is floor division = the
    // engine's floor(double-div) on sub-2^52 integers
    "q_ewma_daily" -> ("WITH RECURSIVE d AS (SELECT event_type, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))/86400)*86400 AS BIGINT) AS day, " +
      "CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
      "FROM events GROUP BY 1, 2), " +
      "n AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM d), " +
      "rec(event_type, rn, day, cents, s) AS (" +
      "SELECT event_type, rn, day, cents, cents FROM n WHERE rn = 1 " +
      "UNION ALL SELECT n.event_type, n.rn, n.day, n.cents, (25*n.cents + 75*rec.s) // 100 " +
      "FROM n JOIN rec ON n.event_type = rec.event_type AND n.rn = rec.rn + 1) " +
      "SELECT event_type, day, cents, s AS ewma_cents FROM rec ORDER BY 1, 2"),

    // same first-purchase-week cohorts, ordered cumulative, and exact
    // integer per-user LTV quotient
    "q_ltv_curve" -> ("WITH p AS (SELECT user_id, " +
      "CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS BIGINT) // 7 " +
      "AS week, CAST(floor(coalesce(value, 0) * 100) AS BIGINT) AS cents " +
      "FROM events WHERE event_type = 'purchase'), " +
      "f AS (SELECT user_id, min(week) AS cohort_week FROM p GROUP BY 1), " +
      "sz AS (SELECT cohort_week, count(*) AS cohort_users FROM f GROUP BY 1), " +
      "a AS (SELECT f.cohort_week, p.week - f.cohort_week AS age, " +
      "CAST(sum(cents) AS BIGINT) AS rev_cents, count(*) AS n_purchases " +
      "FROM p JOIN f USING (user_id) GROUP BY 1, 2), " +
      "c AS (SELECT cohort_week, age, n_purchases, rev_cents, " +
      "CAST(sum(rev_cents) OVER (PARTITION BY cohort_week ORDER BY age " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents FROM a) " +
      "SELECT c.cohort_week, age, n_purchases, rev_cents, cum_cents, cohort_users, " +
      "cum_cents // cohort_users AS ltv_cents FROM c JOIN sz USING (cohort_week) " +
      "ORDER BY cohort_week, age"),

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

    // the q_ewma_daily recursion extended with the same lag + WAPE agg
    "q_forecast_backtest" -> ("WITH RECURSIVE d AS (SELECT event_type, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))/86400)*86400 AS BIGINT) AS day, " +
      "CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
      "FROM events GROUP BY 1, 2), " +
      "n AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM d), " +
      "rec(event_type, rn, day, cents, s) AS (" +
      "SELECT event_type, rn, day, cents, cents FROM n WHERE rn = 1 " +
      "UNION ALL SELECT n.event_type, n.rn, n.day, n.cents, (25*n.cents + 75*rec.s) // 100 " +
      "FROM n JOIN rec ON n.event_type = rec.event_type AND n.rn = rec.rn + 1), " +
      "l AS (SELECT event_type, cents, " +
      "lag(s) OVER (PARTITION BY event_type ORDER BY day) AS pred FROM rec) " +
      "SELECT event_type, count(*) AS n_days, " +
      "CAST(sum(abs(cents - pred)) AS BIGINT) AS sum_abs_err, " +
      "CAST(sum(cents) AS BIGINT) AS sum_actual, " +
      "CAST(sum(abs(cents - pred)) AS BIGINT) * 1000000 // nullif(CAST(sum(cents) AS BIGINT), 0) " +
      "AS wape_q6 FROM l WHERE pred IS NOT NULL GROUP BY 1 ORDER BY 1"),

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

    // the recursive state carries the rolling 7-seasonal list; ss[1] IS
    // s_{t-7} (zeros until the first full period); // truncates toward
    // zero on BIGINTs exactly like the engine's sign-aware quot
    "q_holt_winters" -> {
      val lNew = "(30*(n.cents - rec.ss[1]) + 70*rec.l) // 100"
      val sNew = s"(20*(n.cents - ($lNew)) + 80*rec.ss[1]) // 100"
      "WITH RECURSIVE d AS (SELECT event_type, " +
        "CAST(floor(epoch(CAST(ts AS TIMESTAMP))/86400)*86400 AS BIGINT) AS day, " +
        "CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "n AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) " +
        "AS rn FROM d), " +
        "rec(event_type, rn, day, cents, l, s, ss) AS (" +
        "SELECT event_type, rn, day, cents, cents, CAST(0 AS BIGINT), " +
        "[CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] FROM n WHERE rn = 1 " +
        s"UNION ALL SELECT n.event_type, n.rn, n.day, n.cents, $lNew, $sNew, " +
        s"list_append(rec.ss[2:7], $sNew) " +
        "FROM n JOIN rec ON n.event_type = rec.event_type AND n.rn = rec.rn + 1) " +
        "SELECT event_type, day, cents, l AS level, s AS seasonal, " +
        "l + lag(s, 6, CAST(0 AS BIGINT)) OVER (PARTITION BY event_type ORDER BY day) " +
        "AS forecast_next FROM rec ORDER BY 1, 2"
    },

    "q_holt_forecast" -> ("WITH RECURSIVE d AS (SELECT event_type, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))/86400)*86400 AS BIGINT) AS day, " +
      "CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
      "FROM events GROUP BY 1, 2), " +
      "n AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM d), " +
      "rec(event_type, rn, day, cents, l, t) AS (" +
      "SELECT event_type, rn, day, cents, cents, CAST(0 AS BIGINT) FROM n WHERE rn = 1 " +
      "UNION ALL SELECT n.event_type, n.rn, n.day, n.cents, " +
      "(30*n.cents + 70*(rec.l + rec.t)) // 100, " +
      "(20*((30*n.cents + 70*(rec.l + rec.t)) // 100 - rec.l) + 80*rec.t) // 100 " +
      "FROM n JOIN rec ON n.event_type = rec.event_type AND n.rn = rec.rn + 1) " +
      "SELECT event_type, day, cents, l AS level, t AS trend, " +
      "l + t AS forecast_next FROM rec ORDER BY 1, 2"),

    "q_cohort_retention" -> ("WITH days AS (SELECT DISTINCT user_id, " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events), " +
      "cohorts AS (SELECT user_id, min(d) AS cohort FROM days GROUP BY 1) " +
      "SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day, " +
      "CAST(datediff('day', cohort, d) AS INT) AS day_offset, " +
      "count(DISTINCT days.user_id) AS users " +
      "FROM days JOIN cohorts ON days.user_id = cohorts.user_id " +
      "WHERE datediff('day', cohort, d) <= 7 " +
      "GROUP BY 1, 2 ORDER BY 1, 2"),

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

    // same timezone-free (days+3)%7 weekday index; seasonal is one IEEE
    // division of exact integers
    "q_weekday_seasonality" -> ("WITH daily AS (SELECT " +
      "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS epoch_day, " +
      "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents " +
      "FROM orders GROUP BY 1), " +
      "d2 AS (SELECT epoch_day, (epoch_day + 3) % 7 AS dow, day_cents FROM daily) " +
      "SELECT epoch_day, dow, day_cents, " +
      "CAST(sum(day_cents) OVER w AS BIGINT)::DOUBLE / count(*) OVER w AS seasonal_cents, " +
      "day_cents - CAST(sum(day_cents) OVER w AS BIGINT)::DOUBLE / count(*) OVER w " +
      "AS resid_cents FROM d2 WINDOW w AS (PARTITION BY dow) ORDER BY epoch_day"),

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

    // same exact-integer deviations n·x−S, the identical single IEEE
    // multiply per lag pair, floor(p/1e12) quantization, and order-free
    // BIGINT term sums; the final acf is one division of exact integers
    "q_autocorrelation" -> (DailyCentsCte +
      ", st AS (SELECT count(*) AS n, CAST(sum(day_cents) AS BIGINT) AS s FROM daily), " +
      "r AS (SELECT row_number() OVER (ORDER BY epoch_day) AS rn, " +
      "(n * day_cents - s)::DOUBLE AS dev FROM daily, st), " +
      "den AS (SELECT CAST(sum(CAST(floor(dev * dev / 1e12) AS BIGINT)) AS BIGINT) " +
      "AS den_s FROM r), " +
      "num AS (SELECT k, count(*) AS n_pairs, " +
      "CAST(sum(CAST(floor(a.dev * b.dev / 1e12) AS BIGINT)) AS BIGINT) AS num_s " +
      "FROM generate_series(1, 7) AS g(k) JOIN r a ON true JOIN r b ON b.rn = a.rn + k " +
      "GROUP BY 1) " +
      "SELECT k, n_pairs, num_s, den_s, num_s::DOUBLE / den_s::DOUBLE AS acf " +
      "FROM num, den ORDER BY k"),

    // the same exact-BIGINT running sum of n·x−S under the identical
    // (|cusum| desc, day) total order
    "q_cusum_changepoint" -> (DailyCentsCte +
      ", st AS (SELECT count(*) AS n, CAST(sum(day_cents) AS BIGINT) AS s FROM daily), " +
      "c AS (SELECT epoch_day, CAST(sum(n * day_cents - s) OVER (ORDER BY epoch_day " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum FROM daily, st), " +
      "rk AS (SELECT epoch_day, cusum, row_number() OVER " +
      "(ORDER BY abs(cusum) DESC, epoch_day) AS rank FROM c) " +
      "SELECT rank, epoch_day, cusum FROM rk WHERE rank <= 5 ORDER BY rank"),

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

    // same per-dow median/MAD from quantile_cont (the q_anomaly_mad
    // parity) and the identical strict 3·MAD flag
    "q_seasonal_outliers" -> (DailyCentsCte +
      ", d2 AS (SELECT epoch_day, (epoch_day + 3) % 7 AS dow, day_cents FROM daily), " +
      "md AS (SELECT dow, quantile_cont(day_cents, 0.5) AS med FROM d2 GROUP BY 1), " +
      "a AS (SELECT epoch_day, d2.dow, day_cents, med, " +
      "abs(day_cents - med) AS ad FROM d2 JOIN md ON d2.dow = md.dow), " +
      "mm AS (SELECT dow, quantile_cont(ad, 0.5) AS mad FROM a GROUP BY 1) " +
      "SELECT epoch_day, a.dow, day_cents, med, mm.mad, " +
      "(ad > 3 * mm.mad) AS is_anomaly FROM a JOIN mm ON a.dow = mm.dow " +
      "ORDER BY epoch_day"),

    // same midpoint cutoff and strict window boundaries
    "q_churn_labels" -> ("WITH e AS (SELECT user_id, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s, event_type " +
      "FROM events), " +
      "cut AS (SELECT (min(s) + max(s)) // 2 AS t FROM e), " +
      "j AS (SELECT user_id, event_type, " +
      "CASE WHEN s >= t - 2592000 AND s < t THEN 1 ELSE 0 END AS feat, " +
      "CASE WHEN s >= t AND s < t + 86400 THEN 1 ELSE 0 END AS lab " +
      "FROM e, cut) " +
      "SELECT user_id, " +
      "CAST(sum(CASE WHEN feat = 1 AND event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS f_clicks, " +
      "CAST(sum(CASE WHEN feat = 1 AND event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS f_views, " +
      "CAST(sum(CASE WHEN feat = 1 AND event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS f_errors, " +
      "CAST(sum(feat) AS BIGINT) AS f_events, " +
      "CAST(max(CASE WHEN lab = 1 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS label " +
      "FROM j GROUP BY 1 HAVING CAST(sum(feat) AS BIGINT) > 0 ORDER BY user_id")
  )
}
