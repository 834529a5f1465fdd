package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import RelationalQueries.{secs, dailyCents, pctSql, DailyCentsCte}

/** Declared forecasting / seasonality / changepoint / retention queries —
  * split from [[RelationalTsQueries]] (pure code motion, round 13); see
  * [[RelationalQueries]]'s scaladoc for the shared column-alignment /
  * determinism / rounding contracts.
  */
object RelationalForecastQueries {

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
    },
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
      "FROM j GROUP BY 1 HAVING CAST(sum(feat) AS BIGINT) > 0 ORDER BY user_id"),
  )
}
