package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declared relational EXT queries + DuckDB oracles (SURVEY.md §2.4 EXT).
  * Column names are aligned 1:1 with the oracle SQL; every query ends in a
  * deterministic ORDER BY; double aggregates are rounded to absorb
  * summation-order noise (driver hash-compares values).
  */
object RelationalQueries {

  private def secs(c: org.apache.spark.sql.Column) = unix_timestamp(c)

  /** Daily-revenue frame (epoch_day, exact BIGINT day_cents) — the engine
    * twin of [[DailyCentsCte]]; the time-series family (seasonality / ACF
    * / CUSUM / seasonal outliers) must stay in lockstep with the oracle
    * CTE, so both sides are factored once.
    */
  private def dailyCents(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")
        .as("epoch_day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("day_cents"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Broadcast dimension enrichment: events.user_id → customer.c_custkey.
    // Fact side never shuffles for the lookup (BroadcastHashJoin).
    "q_join_enrich" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val cust = Tables.customer(s, dir)
      Relational
        .enrich(ev, cust, ev("user_id") === cust("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("segment")
    },

    // Top-5 users by event count per event_type: aggregate first (hash agg
    // with map-side combine), rank the small aggregate, never sort raw rows.
    "q_topk_users" -> { (s, dir) =>
      val perUser = Tables
        .events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      Relational
        .topKPerGroup(perUser, Seq("event_type"), Seq(col("cnt").desc, col("user_id").asc), 5)
        .select(col("event_type"), col("user_id"), col("cnt"), col("rank"))
        .orderBy("event_type", "rank")
    },

    // One-pass multi-column profile over events; integer/string columns
    // only so min/max stringification is engine-portable.
    "q_profile_columns" -> { (s, dir) =>
      Relational
        .profile(Tables.events(s, dir), Seq("event_id", "user_id", "event_type"))
        .orderBy("col_name")
    },

    // Deequ-style data-quality gate over lineitem: 5 row-level checks
    // AND a composite-key uniqueness check in ONE aggregation pass (scan
    // count independent of check count; the exact composite distinct
    // rides the same scan via Expand), plus a referential check against
    // orders (distinct keys both sides, one left join + one agg). The
    // fixture makes it non-trivial: tax/discount caps FAIL with real
    // violation counts and the line-number PK is genuinely non-unique,
    // while range/domain/completeness and the FK check PASS — the audit
    // must report both outcomes, not just zeros.
    "q_constraint_audit" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val rowChecks = Relational.auditRowChecks(li,
        checks = Seq(
          "quantity_in_range" -> col("l_quantity").between(1, 50),
          "tax_at_most_5pct" -> (col("l_tax") <= 0.05),
          "discount_at_most_8pct" -> (col("l_discount") <= 0.08),
          "quantity_complete" -> col("l_quantity").isNotNull,
          "returnflag_in_domain" -> col("l_returnflag").isin("A", "N", "R")),
        uniqueChecks = Seq("pk_line_unique" -> Seq("l_orderkey", "l_linenumber")))
      val fk = Relational.auditReferential(
        li, "fk_orderkey_in_orders", "l_orderkey", Tables.orders(s, dir), "o_orderkey")
      rowChecks
        .unionByName(fk)
        .select(col("check_name"), col("n_checked"), col("violations"),
          (col("violations") === 0).as("passed"))
        .orderBy("check_name")
    },

    // Exact distinct per group (two-phase expand) — oracle-checked.
    "q_distinct_users" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("distinct_users"))
        .orderBy("event_type")
    },

    // HLL sketch distinct (single-pass, mergeable state — the 100 TB path).
    // No DuckDB oracle (sketch values are engine-specific) ⇒ rows-only check.
    // rsd = 0.02: HLL cost is quadratic in precision (registers ∝ 1/rsd² —
    // measured 1.4 s at rsd 0.01 vs 0.3 s at 0.05 on the same input; at
    // 1000 executors the per-partition partial buffers shuffle m×groups
    // registers). 2% typical error is the right spend for a distinct-users
    // metric; the ≤5% accuracy contract stays pinned in RelationalSpec.
    "q_approx_distinct" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type")
    },

    // KMV (bottom-k / k-minimum-values) distinct sketch — the
    // DETERMINISTIC approximate distinct count: where HLL's estimate
    // depends on register-merge internals (q_approx_distinct is rows-only
    // for exactly that reason), the k smallest 60-bit hashes of a set are
    // a pure function of the set — order-independent, mergeable (union of
    // bottom-k sets → bottom-k), and bit-exact cross-engine. Estimator:
    // (k-1)·M/h_k over hash space M = 2^60 (Bar-Yossef et al.); groups
    // with fewer than k distinct hashes report exactly. Every output is
    // an integer ((k-1)·M and h_k are exactly representable doubles, ONE
    // IEEE division, floored) so the ESTIMATE itself hash-matches the
    // oracle. Plan shape: one distinct aggregation, then per-group rank ≤
    // k with WindowGroupLimit pruning below the shuffle — partial
    // bottom-k per partition, exactly how the sketch merges at 1000
    // executors.
    "q_distinct_kmv" -> { (s, dir) =>
      val k = 64
      Relational
        .kmvSketch(Tables.events(s, dir), "event_type", "user_id", k)
        .groupBy(col("s").as("event_type"))
        .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
        .select(col("event_type"), col("n_kept"), col("h_k"),
          Relational.kmvEstimate(col("n_kept"), col("h_k"), k).as("est_distinct"))
        .orderBy("event_type")
    },

    // KMV sketch ALGEBRA — the mergeability law, end-to-end: the union of
    // two bottom-k sketches re-ranked to bottom-k equals the bottom-k of
    // the union EXACTLY (both sides keep the k globally-smallest hashes),
    // so the MERGED estimate is oracle-checked against the direct
    // computation. This is the distributed path: per-segment sketches
    // (64 longs each) merge at the coordinator instead of re-scanning
    // either segment — the oracle recomputes from raw data and must land
    // on the identical h_k and estimate.
    "q_kmv_union" -> { (s, dir) =>
      val k = 64
      val ev = Tables.events(s, dir)
      // global bottom-k via orderBy+limit → TakeOrderedAndProject: each
      // partition keeps its own k smallest, one k-sized merge — the
      // partial-sketch shape (a global rank window would single-partition
      // sort the whole distinct frame; PlanSpec pins the operator)
      def sketch(pred: org.apache.spark.sql.Column) =
        ev.filter(pred)
          .select(Dedup.md5Long(col("user_id").cast("string")).as("h"))
          .distinct()
          .orderBy("h")
          .limit(k)
      val merged = sketch(col("event_type") === "click")
        .unionByName(sketch(col("event_type") === "error"))
        .distinct()
        .orderBy("h")
        .limit(k)
      merged
        .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
        .select(col("n_kept"), col("h_k"),
          Relational.kmvEstimate(col("n_kept"), col("h_k"), k).as("est_distinct"))
    },

    // KMV/theta-sketch INTERSECTION — the set-algebra step union can't do:
    // |A ∩ B| from the two per-set sketches alone. With θ = min(θ_A, θ_B)
    // (θ_X = the set's k-th-minimum hash, or the full hash space M when
    // the set is exact, n < k), every hash of A ∩ B below θ is present in
    // BOTH sketches, and those retained hashes are a uniform θ/M-rate
    // sample of A ∩ B ⇒ est = floor(|retained| · M / θ) (the theta-sketch
    // a-not-b/intersect algebra). All inputs to the estimator are
    // integers or exact powers of two with ONE IEEE division, so the
    // ESTIMATE hash-matches the oracle like the other KMV queries. Plan:
    // both sketches come from a SINGLE distinct + WindowGroupLimit pass
    // (one corpus scan), lazy-checkpointed so the θ aggregate and the
    // hash-join probe reuse the ≤2k-row frame, not the scan.
    "q_kmv_intersect" -> { (s, dir) =>
      val k = 64
      val mD = math.pow(2, 60) // hash space of md5Long — exact double
      val mL = 1L << 60
      val sk = Dedup.Intermediate.LocalLazy(
        Relational.kmvSketch(
          Tables.events(s, dir).filter(col("event_type").isin("click", "error")),
          "event_type", "user_id", k),
        "kmv_sketches")
      val theta = sk
        .groupBy("s")
        .agg(count(lit(1)).as("n"), max(col("h")).as("h_k"))
        .agg(min(when(col("n") < k, mL).otherwise(col("h_k"))).as("theta"))
      val retained = sk.filter(col("s") === "click").select("h")
        .join(sk.filter(col("s") === "error").select("h"), "h")
        .crossJoin(broadcast(theta))
        .filter(col("h") < col("theta"))
        .agg(count(lit(1)).as("n_retained"))
      retained
        .crossJoin(broadcast(theta))
        .select(col("n_retained"), col("theta"),
          floor(col("n_retained").cast("double") * mD / col("theta"))
            .cast("long").as("est_intersect"))
    },

    // CUBE over label columns: all 4 grouping sets in one shuffle (Expand).
    "q_cube_labels" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .cube(col("event_type"), get_json_object(col("props"), "$.k").isNotNull.as("has_k"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("event_type"), lit("<all>")).as("event_type"),
          coalesce(col("has_k").cast("string"), lit("<all>")).as("has_k"),
          col("cnt"))
        .orderBy("event_type", "has_k")
    },

    // ROLLUP revenue by region→nation over the 4-join TPC-H path. True
    // dimensions (customer/nation/region) broadcast; lineitem⋈orders is
    // fact⋈fact — left to AQE (shuffle join at scale, never broadcast).
    "q_rollup_revenue" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      val joined = li
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      joined
        .rollup(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(
          coalesce(col("r_name"), lit("<all>")).as("region"),
          coalesce(col("n_name"), lit("<all>")).as("nation"),
          col("revenue"))
        .orderBy("region", "nation")
    },

    // TPC-H Q1-shaped pricing summary — the bench headline aggregation.
    "q_pricing_summary" -> { (s, dir) =>
      Tables
        .lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
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

    // TPC-H Q3-shaped shipping priority: top-10 open orders by revenue.
    // Customer dim broadcasts (with its segment filter applied below the
    // join); lineitem⋈orders stays a shuffle join; the top-10 is a sort
    // of the per-order AGGREGATE, never of raw line items.
    "q_ship_priority" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust.filter(col("c_mktsegment") === "BUILDING")),
          ord("o_custkey") === cust("c_custkey"))
        .filter(ord("o_orderdate") < "1997-06-01" && li("l_shipdate") > "1997-06-01")
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // TPC-H Q5-shaped revenue per nation within one region.
    "q_revenue_by_nation" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg.filter(col("r_name") === "ASIA")),
          nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("nation")
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

    // SAMPLE RATIO MISMATCH guardrail on the A/B split — the first check
    // every experiment readout runs ("is the 50/50 split actually
    // 50/50?"); a failed SRM invalidates every downstream metric. One-df
    // χ² against the even split: (n_a−n_b)²/(n_a+n_b), exact integer
    // numerator, one float division, flag at the 3.841 critical value.
    "q_srm_check" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .agg(
          sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("nb"))
        .select(col("na"), col("nb"),
          (((col("na") - col("nb")) * (col("na") - col("nb"))).cast("double") /
            (col("na") + col("nb")).cast("double")).as("chi2"))
        .withColumn("mismatch", col("chi2") > 3.841)
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

    // Quantile normalization of event values ACROSS types — map each
    // value to the pooled-distribution value at its within-group quantile
    // (the bioinformatics/feature-engineering batch-effect remover): rank
    // r of n_g in its group targets pooled 0-based index
    // ((2r−1)·N) DIV (2·n_g) — the exact integer midpoint rule, no float
    // quantile anywhere. The pooled lookup table gets its global index
    // from [[Scale.globalRowNumber]] (range repartition + broadcast prefix
    // offsets — never an empty-over window), and the corpus joins it on
    // the computed index: corpus-sized ⋈ corpus-sized, merge-hinted (a
    // test-SF broadcast would be fatal at scale). Needs (2N)·N < 2⁶³ —
    // past ~10⁹ rows bucket to quantile sketches first.
    "q_quantile_normalize" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("cents"))
      val wg = Window.partitionBy("event_type").orderBy("cents", "event_id")
      val ranked = ev
        .withColumn("r", row_number().over(wg).cast("long"))
        .withColumn("ng", count(lit(1)).over(Window.partitionBy("event_type")))
      val pooled = Scale
        .globalRowNumber(
          ev.select((col("cents") * lit(1L << 40) + col("event_id")).as("pkey"),
            col("cents").as("norm_cents")),
          "pkey", partitions = 8)
        .select(col("rownum").as("idx0"), col("norm_cents"))
      val tot = ev.agg(count(lit(1)).as("nn"))
      ranked
        .crossJoin(broadcast(tot))
        .withColumn("idx0", expr("((2 * r - 1) * nn) DIV (2 * ng)"))
        .join(pooled.hint("merge"), Seq("idx0"))
        .select(col("event_id"), col("event_type"), col("cents"), col("norm_cents"))
        .orderBy("event_id")
    },

    // Rank-based AUC (Mann–Whitney U) of the "does event value separate
    // purchases from the rest" classifier — the threshold-free twin of
    // q_pr_curve, and the metric quality-classifier gates are tuned by.
    // Exact integer form: group by the cent-quantized score (corpus →
    // score-space aggregation), then U×2 = Σ_s n_pos(s)·(2·cum_neg(<s) +
    // n_neg(s)) — each tie contributes exactly 1 (= 0.5×2). The running
    // window rides the DISTINCT-score frame (thousands of rows at any
    // corpus size — the score-space contract), never corpus rows.
    // auc_q6 = U×2 · 500000 DIV (n_pos·n_neg).
    "q_rank_auc" -> { (s, dir) =>
      val byScore = Tables.events(s, dir)
        .groupBy(floor(col("value") * 100).cast("long").as("score"))
        .agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L)).as("n_neg"))
      val wBelow = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
      byScore
        .withColumn("cum_neg", coalesce(sum(col("n_neg")).over(wBelow), lit(0L)))
        .agg(
          sum(col("n_pos")).as("pos"),
          sum(col("n_neg")).as("neg"),
          sum(col("n_pos") * (col("cum_neg") * 2 + col("n_neg"))).as("u_x2"))
        .select(col("pos"), col("neg"), col("u_x2"),
          expr("u_x2 * 500000 DIV (pos * neg)").as("auc_q6"))
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

    // Winsorized mean ingredients per order priority: clamp cent totals at
    // the group's EXACT p5/p95 (the x100 integer interpolation of
    // [[Relational.exactPercentilesX100]] — clamping at the x100 scale
    // keeps midpoint percentiles exact) and sum. The outlier-robust
    // central-tendency read where q_trimmed_mean DROPS the tails, this
    // SATURATES them — the estimator of choice when row counts must be
    // preserved (per-group weights downstream). Two corpus passes by
    // construction: the rank windows, then the clamp against the broadcast
    // 5-row percentile frame. All-integer ⇒ hash-exact.
    "q_winsorized_mean" -> { (s, dir) =>
      val base = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("prio"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val pct = Relational.exactPercentilesX100(base, Seq("prio"), "cents", Seq(5, 95))
      base
        .join(broadcast(pct.select(col("prio"), col("p5_x100"), col("p95_x100"))),
          Seq("prio"))
        .select(col("prio"),
          greatest(least(col("cents") * 100, col("p95_x100")), col("p5_x100")).as("w"))
        .groupBy("prio")
        .agg(count(lit(1)).as("n"), sum(col("w")).as("winsorized_sum_x100"))
        .orderBy("prio")
    },

    // Wilson 95% score interval on the per-type high-value event rate —
    // the CI that stays inside [0,1] at small n / extreme p where the
    // normal approximation doesn't (the A/B readout's error bars). Counts
    // are exact BIGINTs; the interval itself is a FIXED-ORDER float
    // expression tree (divisions, one sqrt) written identically in both
    // engines, the q_control_chart precedent. One scan, one type-keyed agg.
    "q_wilson_ci" -> { (s, dir) =>
      val z = lit(1.96)
      val n = col("n").cast("double")
      val ph = col("s").cast("double") / n
      val denom = lit(1.0) + z * z / n
      val center = (ph + z * z / (n * 2.0)) / denom
      val half = z * sqrt(ph * (lit(1.0) - ph) / n + z * z / (n * n * 4.0)) / denom
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") >= 50.0, 1L).otherwise(0L)).as("s"))
        .select(col("event_type"), col("n"), col("s"),
          (center - half).as("ci_lo"), (center + half).as("ci_hi"))
        .orderBy("event_type")
    },

    // Log2-bucket (exponential) histogram of order cent totals: bucket =
    // floor(log2(cents)) + 1, computed EXACTLY as the binary-string length
    // — bin() renders bit-identical text in Spark and DuckDB, so the
    // bucketing never touches float log. The heavy-tail profiling read
    // (cent totals span 5 decades → ~17 buckets) where the equi-width
    // q_histogram would need thousands. One scan, one bucket-keyed agg.
    "q_log_histogram" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(length(bin(col("cents"))).cast("long").as("log2_bucket"))
        .agg(count(lit(1)).as("n"),
          min("cents").as("min_cents"), max("cents").as("max_cents"))
        .orderBy("log2_bucket")
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

    // SPC p-CHART (statistical process control) — daily error-rate control
    // limits: center line p̄ from exact global counts, per-day
    // UCL = p̄ + 3·√(p̄(1−p̄)/n_d), and the out-of-control flag. Every
    // float op is a correctly-rounded single step in a FIXED order over
    // exact BIGINTs (one division for p̄, one for the variance term, one
    // sqrt, one multiply-add) — bit-identical cross-engine, no float
    // accumulation. One day-keyed agg + a broadcast 1-row total.
    "q_control_chart" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("n_d"),
          sum((col("event_type") === "error").cast("long")).as("err_d"))
      val totals = daily.agg(sum(col("n_d")).as("nt"), sum(col("err_d")).as("et"))
      val pbar = col("et").cast("double") / col("nt").cast("double")
      daily
        .crossJoin(broadcast(totals))
        .select(col("day"), col("n_d"), col("err_d"),
          pbar.as("center"),
          (pbar + lit(3.0) * sqrt(pbar * (lit(1.0) - pbar) / col("n_d").cast("double")))
            .as("ucl"),
          (col("err_d").cast("double") / col("n_d").cast("double")).as("rate"))
        .withColumn("out_of_control", col("rate") > col("ucl"))
        .orderBy("day")
    },

    // Functional-dependency audit — "does X determine Y?" over three
    // candidate FDs (a PK check, a known violation, a join-derived
    // dependency): per FD, LHS group count, violating-group count, and the
    // worst RHS fan-out. The schema-inference / data-contract primitive a
    // warehouse runs before trusting a column as a key. FDs sharing an LHS
    // ride ONE countDistinct exchange (the multi-FD audit trick — scans
    // scale with distinct LHS keys, not with FD count); the broadcast join
    // is lossless (every events.user_id is a customer key at every SF), so
    // the events-side FD is unaffected by the segment attach.
    "q_fd_violations" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val fd1 = ev
        .groupBy(col("event_id"))
        .agg(countDistinct(col("user_id")).as("nd"))
        .agg(lit("event_id->user_id").as("fd"), count(lit(1)).as("n_groups"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("nd")).as("max_rhs"))
      val fd23 = ev
        .join(
          broadcast(Tables.customer(s, dir)
            .select(col("c_custkey").as("user_id"), col("c_mktsegment"))),
          Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("event_type")).as("nd_et"),
          countDistinct(col("c_mktsegment")).as("nd_seg"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("nd_et") > 1, 1L).otherwise(0L)).as("v_et"),
          max(col("nd_et")).as("m_et"),
          sum(when(col("nd_seg") > 1, 1L).otherwise(0L)).as("v_seg"),
          max(col("nd_seg")).as("m_seg"))
        .selectExpr("stack(2, 'user_id->event_type', n_groups, v_et, m_et, " +
          "'user_id->c_mktsegment', n_groups, v_seg, m_seg) " +
          "AS (fd, n_groups, n_violating, max_rhs)")
      fd1.unionByName(fd23).orderBy("fd")
    },

    // SCD2 POINT-IN-TIME LOOKUP — the read side of q_scd2_build: each
    // error event resolves the user's activity state AT ERROR TIME against
    // the type-change dimension (change rows deduped per (user, ts) by
    // max event_id — the q_attribution simultaneity contract), then the
    // state distribution. Engine runs it as an as-of join (union + ONE
    // ordered window per user — never a per-user interval cross product);
    // the oracle states the equivalent explicit half-open
    // [valid_from, valid_to) interval join, pinning the SCD2 lookup ≡
    // as-of equivalence.
    "q_scd2_lookup" -> { (s, dir) =>
      val evAll = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val chg = evAll.filter(col("event_type") =!= "error")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("event_type"), col("event_id")).as("state"))
      val probes = evAll.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      Relational
        .asofJoin(probes, chg, "user_id", "ts", "ts", Seq("state"))
        .groupBy(coalesce(col("state"), lit("none")).as("state"))
        .agg(count(lit(1)).as("n_errors"))
        .orderBy("state")
    },

    // Debounce/throttle audit: an event is KEPT iff the user's previous
    // same-type event is more than 5 s older (lag over the (ts, event_id)
    // total order — the double-click / retry-storm suppressor). Per type:
    // raw count, kept count, and the ×10⁶ drop rate. One key exchange +
    // in-partition sort; all arithmetic integral micros.
    "q_debounce" -> { (s, dir) =>
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("kept",
          col("prev_us").isNull || (col("us") - col("prev_us") > lit(5000000L)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("kept").cast("long")).as("n_kept"))
        .withColumn("drop_q6", expr("(n_events - n_kept) * 1000000 DIV n_events"))
        .orderBy("event_type")
    },

    // A/B 2×2 chi-square from exact user-level integer counts: variant =
    // user_id parity, success = user ever made a HIGH-VALUE purchase
    // (> 180 — every user purchases at least once, so the bare-purchase
    // margin degenerates to zero and χ² is undefined); χ² =
    // N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) evaluated in ONE fixed-order
    // double expression over four exact BIGINTs — the experimentation
    // gate computed without any float accumulation. One user-keyed agg
    // (map-side combinable max), then a 1-row summary.
    "q_ab_contingency" -> { (s, dir) =>
      val diff = col("a") * col("d") - col("b") * col("c")
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase" && col("value") > 180).cast("long"))
          .as("converted"))
        .select((col("user_id") % 2).as("variant"), col("converted"))
        .agg(
          sum(when(col("variant") === 0 && col("converted") === 1, 1L).otherwise(0L)).as("a"),
          sum(when(col("variant") === 0 && col("converted") === 0, 1L).otherwise(0L)).as("b"),
          sum(when(col("variant") === 1 && col("converted") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("variant") === 1 && col("converted") === 0, 1L).otherwise(0L)).as("d"))
        .select(col("a"), col("b"), col("c"), col("d"),
          (diff.cast("double") * diff.cast("double") *
            (col("a") + col("b") + col("c") + col("d")).cast("double") /
            ((col("a") + col("b")).cast("double") * (col("c") + col("d")).cast("double") *
              (col("a") + col("c")).cast("double") * (col("b") + col("d")).cast("double")))
            .as("chi2"))
    },

    // APDEX score per event type — the SRE satisfaction index over the
    // value column as a latency proxy (T = 50, tolerating ≤ 4T):
    // (satisfied·10⁶ + tolerating·5·10⁵) DIV total — pure integer
    // arithmetic over one combining aggregation pass.
    "q_apdex" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("total"),
          sum((col("value") <= 50).cast("long")).as("satisfied"),
          sum((col("value") > 50 && col("value") <= 200).cast("long")).as("tolerating"))
        .withColumn("apdex_q6",
          expr("(satisfied * 1000000 + tolerating * 500000) DIV total"))
        .orderBy("event_type")
    },

    // TWO-PROPORTION POWER ANALYSIS on the q_ab_contingency cells — "how
    // many users per arm would this experiment need?": classical
    // n = (z_α/2+z_β)²·(p₁q₁+p₂q₂)/Δ² at 5% two-sided / 80% power. The
    // z constants are FOLDED to one double literal in Scala and embedded
    // verbatim in the oracle (CAST from decimal is correctly rounded), so
    // the whole computation is a fixed-order chain of correctly-rounded
    // single float ops over four exact BIGINTs — the q_control_chart
    // determinism recipe. `powered` compares current arm sizes to the
    // requirement.
    "q_power_analysis" -> { (s, dir) =>
      val z2 = { val s0 = 1.959963984540054 + 0.8416212335729143; s0 * s0 }
      val p1 = col("a").cast("double") / (col("a") + col("b")).cast("double")
      val p2 = col("c").cast("double") / (col("c") + col("d")).cast("double")
      val needed = ceil(lit(z2) *
        (p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2)) /
        ((p1 - p2) * (p1 - p2))).cast("long")
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase" && col("value") > 180).cast("long"))
          .as("converted"))
        .select((col("user_id") % 2).as("variant"), col("converted"))
        .agg(
          sum(when(col("variant") === 0 && col("converted") === 1, 1L).otherwise(0L)).as("a"),
          sum(when(col("variant") === 0 && col("converted") === 0, 1L).otherwise(0L)).as("b"),
          sum(when(col("variant") === 1 && col("converted") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("variant") === 1 && col("converted") === 0, 1L).otherwise(0L)).as("d"))
        .select((col("a") + col("b")).as("n1"), (col("c") + col("d")).as("n2"),
          p1.as("p1"), p2.as("p2"), needed.as("needed_per_arm"))
        .withColumn("powered",
          col("n1") >= col("needed_per_arm") && col("n2") >= col("needed_per_arm"))
    },

    // SPEARMAN rank correlation between document length and token count —
    // the monotone-robust twin of q_corr_stats' Pearson (outlier docs
    // can't drag it). Exact integer ranks with tie-averaging at the ×2
    // scale (avg_rank·2 = 2·cum_smaller + cnt + 1 — always integral), and
    // CRUCIALLY rank assignment runs in VALUE SPACE: per-distinct-value
    // counts + a running window over the distinct-value frame (thousands
    // of rows at any corpus size), broadcast back onto one corpus scan —
    // never a corpus-wide empty-over rank window (the 100 TB cliff).
    // Moments are exact DECIMAL(38,0): ranks reach 2n, so BIGINT products
    // Σ(2n)² wrap silently past n ≈ 1.3e6 — the decimal lane is exact to
    // Σ ≤ 4n³ < 10³⁸, i.e. n ≈ 3e12 rows. Each moment is cast to double
    // ONCE (correctly rounded in both engines) and rho is one fixed-order
    // float expression over those casts.
    "q_spearman" -> { (s, dir) =>
      def ranks2(df: DataFrame, vCol: String, outCol: String): DataFrame = {
        val w = Window.orderBy(vCol).rowsBetween(Window.unboundedPreceding, -1)
        df.groupBy(vCol)
          .agg(count(lit(1)).as("_cnt"))
          .withColumn("_cum", coalesce(sum(col("_cnt")).over(w), lit(0L)))
          .select(col(vCol), (col("_cum") * 2 + col("_cnt") + 1).as(outCol))
      }
      val base = Tables.documents(s, dir)
        .select(col("n_chars").as("x"), TextOps.tokenCount(col("text")).cast("long").as("y"))
      def d(c: String) = col(c).cast("double")
      val num = d("n") * d("sxy") - d("sx") * d("sy")
      val den = sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
        sqrt(d("n") * d("syy") - d("sy") * d("sy"))
      // decimal(19,0) factors: the product type widens to decimal(38,0)
      // BEFORE any arithmetic, so nothing ever wraps (a bare rx*ry would
      // multiply in 64-bit first and overflow silently)
      def dec(c: String) = col(c).cast("decimal(19,0)")
      base
        .join(broadcast(ranks2(base, "x", "rx")), Seq("x"))
        .join(broadcast(ranks2(base, "y", "ry")), Seq("y"))
        .agg(count(lit(1)).as("n"),
          sum(col("rx").cast("decimal(38,0)")).as("sx"),
          sum(col("ry").cast("decimal(38,0)")).as("sy"),
          sum(dec("rx") * dec("ry")).as("sxy"),
          sum(dec("rx") * dec("rx")).as("sxx"),
          sum(dec("ry") * dec("ry")).as("syy"))
        .select(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"),
          (num / den).as("rho"))
    },

    // KENDALL'S TAU between monthly revenue and monthly order count —
    // the concordance view of the same robust-correlation family
    // (Spearman above, Theil–Sen's slope): C/D/tie pair counts are EXACT
    // INTEGERS over the TIME-bounded month × month grid (the q_theil_sen
    // scale argument — the corpus pays one month aggregate, pairs never
    // touch corpus rows); tau_a = (C−D) / (m(m−1)/2), one IEEE division.
    "q_kendall_tau" -> { (s, dir) =>
      val monthly = Tables.orders(s, dir)
        .groupBy(((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("x"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("r"),
          count(lit(1)).as("c"))
      val sgn = (col("b.r") - col("a.r")) * (col("b.c") - col("a.c"))
      monthly.as("a")
        .join(broadcast(monthly.as("b")), col("a.x") < col("b.x"))
        .agg(
          sum(when(sgn > 0, 1L).otherwise(0L)).as("concordant"),
          sum(when(sgn < 0, 1L).otherwise(0L)).as("discordant"),
          sum(when(sgn === 0, 1L).otherwise(0L)).as("ties"))
        .select(col("concordant"), col("discordant"), col("ties"),
          ((col("concordant") - col("discordant")).cast("double") /
            ((col("concordant") + col("discordant") + col("ties")).cast("double")))
            .as("tau_a"))
    },

    // Behavioral concentration per user: Rényi-2 collision probability
    // Σc²/n² over each user's event-type distribution — the no-log
    // entropy proxy (the q_char_stats recipe applied to behavior):
    // 1e6 = a single-action user, 1e6/|types| = uniform explorer. Two
    // aggregations sharing the user key prefix; all-integer.
    "q_type_concentration" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("ss"),
          count(lit(1)).as("n_types"))
        .select(col("user_id"), col("n"), col("n_types"),
          expr("ss * 1000000 DIV (n * n)").as("conc_q6"))
        .orderBy("user_id")
    },

    // SIMPSON'S PARADOX audit on the A/B readout: per-segment conversion
    // direction vs the pooled direction, flagged where they disagree —
    // the confounder check an experimentation platform runs before
    // trusting a topline (a stratum mix shift can reverse the pooled
    // sign). All directions are exact cross-multiplied integer compares
    // (sa·nb vs sb·na) — no rate division anywhere; the pooled cells ride
    // a window over the |segments| frame. One user-grain agg (shared with
    // q_power_analysis's cell shape), one broadcast dim join.
    "q_simpson_check" -> { (s, dir) =>
      val perUser = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("long")).as("converted"))
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))),
          Seq("user_id"))
      val cells = perUser
        .select(col("segment"), (col("user_id") % 2).as("variant"), col("converted"))
        .groupBy("segment")
        .agg(
          sum(when(col("variant") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("variant") === 0, col("converted")).otherwise(0L)).as("sa"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("nb"),
          sum(when(col("variant") === 1, col("converted")).otherwise(0L)).as("sb"))
      val wAll = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      cells
        .withColumn("pooled_a_gt_b",
          sum(col("sa")).over(wAll) * sum(col("nb")).over(wAll) >
            sum(col("sb")).over(wAll) * sum(col("na")).over(wAll))
        .withColumn("a_gt_b", col("sa") * col("nb") > col("sb") * col("na"))
        .withColumn("reversed", col("a_gt_b") =!= col("pooled_a_gt_b"))
        .select(col("segment"), col("na"), col("sa"), col("nb"), col("sb"),
          col("a_gt_b"), col("pooled_a_gt_b"), col("reversed"))
        .orderBy("segment")
    },

    // THEIL–SEN robust trend: the median pairwise slope of the monthly
    // revenue series — the outlier-proof regression line estimator (one
    // wild month moves OLS, not the pairwise median). The corpus pays ONE
    // month-grain aggregate; the pair frame is month² — TIME-bounded, not
    // corpus-bounded (months don't grow with data volume), so the
    // pair-space self-join and rank window stay thousands of rows at any
    // SF. Median pick: row_number over (slope, x1, x2) — slope is one
    // correctly-rounded IEEE division of exact integers, identical in
    // both engines; the winning pair's (dy_cents, dx_months) are emitted
    // exact alongside it.
    "q_theil_sen" -> { (s, dir) =>
      val monthly = Tables.orders(s, dir)
        .groupBy(((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("x"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      val pairs = monthly.as("a")
        .join(broadcast(monthly.as("b")), col("a.x") < col("b.x"))
        .select(col("a.x").as("x1"), col("b.x").as("x2"),
          (col("b.y") - col("a.y")).as("dy"), (col("b.x") - col("a.x")).as("dx"))
        .withColumn("slope", col("dy").cast("double") / col("dx").cast("double"))
      val w = Window.orderBy("slope", "x1", "x2")
      pairs
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n_pairs", count(lit(1)).over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("rk") === expr("(n_pairs + 1) DIV 2"))
        .select(col("n_pairs"), col("x1"), col("x2"), col("dy"), col("dx"), col("slope"))
    },

    // GINI SPLIT GAIN — the decision-tree split chooser over four
    // candidate features (hour, day-of-week, value band, props.k band)
    // against the event_type class, entirely in integer arithmetic:
    // impurity uses Gini (rational in counts — the log-free twin of
    // information gain), n_b·gini_b·10⁶ = (n_b²−ssq_b)·10⁶/n_b is a
    // two-limb exact quotient, and the weighted child / parent values
    // truncate once more at /N (both truncation points mirrored in the
    // oracle). One stack() fan-out = one scan for all four features; the
    // (feature, bucket, class) agg combines map-side. Long headroom: the
    // n_b²·10³ limb holds to ~10⁸-row buckets — two notches above the
    // fixtures; beyond that the per-bucket term switches to coarser limbs.
    "q_gini_split" -> { (s, dir) =>
      val twoLimb = (a: String, b: String) =>
        s"(($a) * 1000 DIV ($b)) * 1000 + ((($a) * 1000) % ($b)) * 1000 DIV ($b)"
      val feats = Tables.events(s, dir).select(col("event_type"),
        expr("stack(4, " +
          "'hour', CAST(hour(ts) AS BIGINT), " +
          "'dow', (unix_micros(ts) DIV 86400000000) % 7, " +
          "'value_band', CAST(least(floor(value / 50), 9) AS BIGINT), " +
          "'k_band', CAST(get_json_object(props, '$.k') AS BIGINT) DIV 10) " +
          "AS (feature, bucket)"))
      val cc = feats.groupBy(col("feature"), col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val buckets = cc.groupBy(col("feature"), col("bucket"))
        .agg(sum(col("c")).as("nb"), sum(col("c") * col("c")).as("ssq"))
      val perFeature = buckets.groupBy(col("feature"))
        .agg(sum(col("nb")).as("n"),
          sum(expr(twoLimb("nb * nb - ssq", "nb"))).as("wsum_q6"))
      val parent = Tables.events(s, dir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("pn"), sum(col("c") * col("c")).as("pssq"))
        .select(expr(twoLimb("pn * pn - pssq", "pn")).as("pq6x"), col("pn"))
      perFeature
        .crossJoin(broadcast(parent))
        .select(col("feature"), col("n"),
          expr("pq6x DIV pn").as("parent_gini_q6"),
          expr("wsum_q6 DIV n").as("child_gini_q6"),
          expr("pq6x DIV pn - wsum_q6 DIV n").as("gain_q6"))
        .orderBy("feature")
    },

    // Exact WEIGHTED median — the volume-weighted price point: per return
    // flag, the smallest cent value whose cumulative quantity reaches half
    // the group's total (the lower weighted median). One key exchange +
    // one in-partition cumulative sum over the (cents, orderkey,
    // linenumber) total order; the 2·cumw ≥ totw threshold is exact
    // integer arithmetic, no interpolation anywhere. Explicit ROWS frame
    // on both sides (RANGE vs ROWS is moot under a unique sort key, but
    // pinning it removes the cross-engine default-frame dependency).
    "q_weighted_median" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"),
        col("l_orderkey"), col("l_linenumber"))
      val wOrd = Window.partitionBy("l_returnflag")
        .orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("l_returnflag")
      li.withColumn("cumw", sum(col("qty")).over(wOrd))
        .withColumn("totw", sum(col("qty")).over(wAll))
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy(col("l_returnflag"))
        .agg(max(col("totw")).as("tot_qty"), min(col("cents")).as("wmedian_cents"))
        .orderBy("l_returnflag")
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

    // Robust anomaly flags (Relational.madOutliers): daily value sums per
    // event_type, flagged where |x − median| > 3·MAD — the
    // outlier-resistant twin of q_group_zscore (a spike inflates σ and
    // masks itself; it barely moves the median). The raw scan reduces to
    // a |types × days| frame FIRST; both exact-percentile passes and
    // their join-backs run on that tiny aggregate (broadcast). Median /
    // MAD are order statistics of already-rounded sums — no cross-engine
    // summation drift enters the interpolation.
    "q_anomaly_mad" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(round(sum(col("value")), 2).as("daily"))
      Relational
        .madOutliers(daily, Seq("event_type"), "daily", k = 3.0)
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("daily"), round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
          col("is_anomaly"))
        .orderBy("event_type", "day")
    },

    // Semi-join (EXISTS shape, TPC-H Q4-like): order-priority counts over
    // orders having at least one returned line item. The probe side is a
    // distinct key set; left_semi keeps orders unduplicated without a
    // post-join distinct.
    "q_priority_with_returns" -> { (s, dir) =>
      val ord = Tables.orders(s, dir)
      val returned = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      ord
        .join(returned, ord("o_orderkey") === returned("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    },

    // Analytic running window: per-user daily counts with a running
    // cumulative — the per-key ordered prefix aggregation (one shuffle on
    // user, one in-partition sort; the same shape as sequence packing).
    "q_user_running_total" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("cnt"), sum(col("cnt")).over(w).as("running"))
        .orderBy("user_id", "day")
    },

    // PIVOT: event-type counts as columns per day (explicit value list —
    // Spark plans pivot as ONE conditional aggregation pass, no
    // per-column scans; oracle mirrors with CASE sums).
    "q_pivot_types" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        // a (day, type) combination with no rows pivots to NULL where the
        // oracle's conditional sum yields 0 — normalize
        .select(date_format(col("d"), "yyyy-MM-dd").as("day") +:
          Seq("click", "error", "purchase", "signup", "view")
            .map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("day")
    },

    // Set operation: (user, day) pairs with clicks but no errors (EXCEPT).
    "q_users_click_not_error" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      def pairs(t: String) = ev
        .filter(col("event_type") === t)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      pairs("click").except(pairs("error")).orderBy("user_id", "day")
    },

    // TPC-H Q14-shaped promo revenue: one month of lineitem joined to the
    // part dimension (broadcast — the fact side never shuffles), promo vs
    // total revenue in a single conditional-aggregation pass.
    "q_promo_revenue" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01") && col("l_shipdate") < lit("1996-04-01"))
      li.join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0))), 2)
            .as("promo_rev"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("total_rev"))
    },

    // Supplier-dimension rollup: supplier ⋈ nation ⋈ region (both dims
    // broadcast), account-balance stats per region/nation.
    "q_supplier_balance" -> { (s, dir) =>
      Tables
        .supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("suppliers"), round(sum(col("s_acctbal")), 2).as("total_bal"))
        .orderBy("region", "nation")
    },

    // Set operation: (user, day) pairs with clicks AND errors (INTERSECT —
    // completes the set-op family next to union/except).
    "q_users_click_and_error" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      def pairs(t: String) = ev
        .filter(col("event_type") === t)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      pairs("click").intersect(pairs("error")).orderBy("user_id", "day")
    },

    // Analytic ntile: per-type value quartiles (unique (value, event_id)
    // ordering makes tile assignment deterministic in both engines).
    "q_ntile" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      Tables
        .events(s, dir)
        .select(col("event_type"), col("event_id"), ntile(4).over(w).as("quartile"))
        .orderBy("event_type", "event_id")
    },

    // UNPIVOT — the inverse of q_pivot_types: the wide per-day count matrix
    // melts back to long (day, event_type, cnt) rows via Spark's native
    // unpivot (zero-filled first: DuckDB's UNPIVOT drops NULL cells).
    "q_unpivot" -> { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables
        .events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("d") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      pivoted
        .unpivot(Array(col("d")), types.map(col).toArray, "event_type", "cnt")
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("event_type"), col("cnt"))
        .orderBy("day", "event_type")
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

    // Date/time scalar functions: monthly order rollup via date_trunc.
    "q_orders_by_month" -> { (s, dir) =>
      Tables
        .orders(s, dir)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("month")
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

    // Equi-width histogram of event values (Relational.histogram) — one
    // bucket-keyed hash aggregation, the numeric-profiling primitive.
    "q_histogram" -> { (s, dir) =>
      Relational
        .histogram(Tables.events(s, dir), "value", width = 25.0)
        .orderBy("bucket")
    },

    // Distribution drift between ingestion periods: order-price histogram
    // of pre-1996 (reference) vs later (current) orders in ONE scan,
    // per-bucket quantized frequency deltas + the total-variation
    // distance on the bucket = -1 row — the corpus-composition-shift
    // monitor a continuously-ingesting training pipeline runs per batch.
    // Integer common-denominator deviations (exactly associative sums)
    // make the drift METRIC hash-checkable; see Relational.distDrift.
    "q_dist_drift" -> { (s, dir) =>
      Relational
        .distDrift(Tables.orders(s, dir), "o_totalprice",
          col("o_orderdate") < "1996-01-01", width = 50000.0)
        .orderBy("bucket")
    },

    // Schema/profile drift between ingestion periods: the existing
    // one-pass profile operator run per cohort (ts-halves of events,
    // predicate pushed to each scan), joined on col_name — null-count
    // and distinct-cardinality deltas plus a min/max-stability flag per
    // column. Completes the monitoring triad: q_constraint_audit
    // (quality), q_dist_drift (value distributions), this (shape).
    "q_schema_drift" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      def prof(pred: org.apache.spark.sql.Column, tag: String) =
        Relational
          .profile(ev.filter(pred), Seq("event_type", "user_id", "props"))
          .select(col("col_name"), col("n_null").as(s"n_null_$tag"),
            col("n_distinct").as(s"n_distinct_$tag"),
            col("min_s").as(s"min_$tag"), col("max_s").as(s"max_$tag"))
      prof(col("ts") < "2024-01-16", "ref")
        .join(prof(col("ts") >= "2024-01-16", "cur"), "col_name")
        .select(col("col_name"), col("n_null_ref"), col("n_null_cur"),
          col("n_distinct_ref"), col("n_distinct_cur"),
          floor(col("n_distinct_cur").cast("double") * 1e6 / col("n_distinct_ref"))
            .cast("long").as("distinct_ratio_q6"),
          (col("min_ref") === col("min_cur") && col("max_ref") === col("max_cur"))
            .as("minmax_stable"))
        .orderBy("col_name")
    },

    // Time-series gap fill: 10-minute per-type counts with missing buckets
    // zero-filled over the global range (Relational.gapFill) — the
    // densification/resample operator.
    "q_gapfill" -> { (s, dir) =>
      Relational
        .gapFill(Tables.events(s, dir), "ts", "event_type", bucketSec = 600)
        .orderBy("event_type", "bucket")
    },

    // Arg-max per group: each user's latest event by the unique,
    // arrival-ordered event_id, via Relational.argMaxJoin (hash agg +
    // co-partitioned join back — max_by with a STRING payload demotes to
    // SortAggregate, a per-partition sort of the full input at scale).
    "q_latest_event" -> { (s, dir) =>
      Relational
        .argMaxJoin(Tables.events(s, dir), "user_id", "event_id", Seq("event_type"))
        .select(col("user_id"), col("event_type").as("last_type"),
          col("event_id").as("last_event_id"), col("n_rows").as("n_events"))
        .orderBy("user_id")
    },

    // CDC MERGE with tombstones: a change log (op = delete on every 10th
    // event, else upsert; version = the unique arrival-ordered event_id)
    // compacted to current state — latest version wins per key, and a
    // winning DELETE removes the key entirely. This is the upsert /
    // compaction step every CDC ingest pipeline runs before serving.
    // Same two-phase argMaxJoin shape as q_latest_event (hash agg +
    // co-partitioned join back — codegen-safe with string payloads);
    // the tombstone filter runs on the |keys|-sized merged frame.
    "q_cdc_merge" -> { (s, dir) =>
      val log = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          when(col("event_id") % 10 === 0, "D").otherwise("U").as("op"),
          col("event_type"))
      Relational
        .argMaxJoin(log, "user_id", "event_id", Seq("op", "event_type"))
        .filter(col("op") =!= "D")
        .select(col("user_id"), col("event_id").as("ver"),
          col("event_type").as("state"))
        .orderBy("user_id")
    },

    // Snapshot diff ([[Relational.snapshotDiff]]): two keyed snapshots of
    // the orders table (old = keys % 7 != 0; new = keys % 5 != 0 with
    // every %3 key's cent total bumped — a synthetic backfill) classified
    // added/removed/changed/unchanged, rolled up per class with a key
    // checksum and the changed-cents delta. Tag-union + ONE key agg —
    // never a full outer join — so each snapshot shuffles exactly once.
    "q_snapshot_diff" -> { (s, dir) =>
      val cents = floor(col("o_totalprice") * 100).cast("long")
      val base = Tables.orders(s, dir)
      val oldSnap = base.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"), cents.as("cents"))
      val newSnap = base.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"),
          (cents + when(col("o_orderkey") % 3 === 0, 1L).otherwise(0L)).as("cents"))
      Relational
        .snapshotDiff(oldSnap, newSnap, "o_orderkey", "cents")
        .groupBy("change")
        .agg(
          count(lit(1)).as("n"),
          sum(col("key")).as("key_sum"),
          sum(when(col("change") === "changed", col("new_v") - col("old_v"))
            .otherwise(0L)).as("delta_cents"))
        .orderBy("change")
    },

    // SCD TYPE 2 dimension build from a raw change feed: per-user
    // time-ordered states collapsed to CHANGES (lag ≠ current filter),
    // then effective-dated validity intervals (valid_to = the next
    // change's valid_from; the open interval is the current row) — the
    // slowly-changing-dimension table warehouse modeling derives from
    // event streams. Both analytic windows share the SAME (user_id)
    // partitioning, so the change-collapse and the interval lead ride
    // ONE exchange (pinned).
    "q_scd2_build" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables
        .events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_type").as("state"),
          secs(col("ts")).as("valid_from"),
          coalesce(secs(col("next_ts")), lit(-1L)).as("valid_to"),
          col("next_ts").isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "state")
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

    // Multi-quantile in ONE pass: exact p25/p50/p75 per group from a
    // single percentile aggregate (one sort per group inside the agg, not
    // one job per quantile). Over floor-quantized integer-valued doubles
    // every interpolation intermediate (quarter fractions of integer
    // gaps) is exactly representable, so engines agree bit-for-bit
    // whatever algebraic form their interpolation uses.
    "q_quantiles" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .withColumn("value_q3", floor(col("value") * 1000).cast("double"))
        .groupBy(col("event_type"))
        .agg(percentile(col("value_q3"), array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
        .select(col("event_type"), posexplode(col("qs")).as(Seq("q_idx", "q")))
        .orderBy("event_type", "q_idx")
    },

    // Correlation from sufficient statistics — the distributed-stats
    // pattern: ONE pass accumulates exact integer moments (n, Σx, Σy,
    // Σxy, Σx², Σy²), then Pearson r is a fixed-order scalar expression
    // over them. Engine-native corr() streams co-moments in
    // implementation-specific order (not cross-engine reproducible); the
    // sufficient-statistics form is exact, mergeable, and — unlike a
    // two-pass mean-centered formula — never rescans the data.
    "q_corr_stats" -> { (s, dir) =>
      val m = Tables
        .events(s, dir)
        .select(col("event_type"),
          floor(col("value") * 10).cast("long").as("x"),
          length(col("props")).cast("long").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      m.select(col("event_type"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("corr"))
        .orderBy("event_type")
    },

    // Skew-safe salted aggregation (Scale.saltedAggregate): two-phase
    // partial/final sums behind a synthetic salt — oracle = the plain
    // single-phase GROUP BY, proving salting changes the plan, not the
    // answer. Values are floor-quantized so both phases sum exact integers.
    "q_salted_agg" -> { (s, dir) =>
      Scale
        .saltedAggregate(
          Tables.events(s, dir)
            .select(col("event_type"), floor(col("value") * 1000).cast("long").as("v_q3")),
          groupCols = Seq("event_type"),
          sumCols = Seq("v_q3"),
          saltBuckets = 8)
        .select(col("event_type"), col("sum_v_q3"), col("count_rows"))
        .orderBy("event_type")
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

    // Holt level+trend forecasting (Relational.holtInteger) over the same
    // daily frame as q_ewma_daily — the one-step forecast a capacity
    // planner reads; the whole integer trajectory (level, trend,
    // forecast) hashes against the recursive-CTE oracle.
    // CRAMÉR'S V association strength between event type and customer
    // segment — the normalized-χ² profiling read ("are these two
    // categorical columns related at all?") over the DENSE r×c grid
    // (absent combos contribute their full expected-count term, so the
    // statistic is the real χ², not a support-biased one). Cell terms are
    // exact-integer numerators ((o·N − r·c)² fits 2⁶³ through ×10) with
    // per-cell float division, summed by a FIXED-ORDER fold over the
    // sorted cell list (a plain double sum would be partial-agg-order
    // dependent); V = one sqrt. Everything after the one corpus agg rides
    // the |types|×|segments| frame.
    "q_cramers_v" -> { (s, dir) =>
      val cells = Tables.events(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))),
          Seq("user_id"))
        .groupBy(col("event_type"), col("segment"))
        .agg(count(lit(1)).as("o"))
      val grid = cells.select("event_type").distinct()
        .crossJoin(cells.select("segment").distinct())
        .join(cells, Seq("event_type", "segment"), "left")
        .na.fill(0L, Seq("o"))
      val wAll = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      grid
        .withColumn("r", sum(col("o")).over(Window.partitionBy("event_type")))
        .withColumn("c", sum(col("o")).over(Window.partitionBy("segment")))
        .withColumn("nn", sum(col("o")).over(wAll))
        .agg(
          sort_array(collect_list(struct(col("event_type"), col("segment"),
            col("o"), col("r"), col("c"), col("nn")))).as("xs"),
          max(col("nn")).as("n"),
          countDistinct(col("event_type")).as("n_types"),
          countDistinct(col("segment")).as("n_segs"))
        .select(col("n"), col("n_types"), col("n_segs"),
          aggregate(col("xs"), lit(0.0), (acc, e) => {
            val num = (e.getField("o") * e.getField("nn") -
              e.getField("r") * e.getField("c")).cast("double")
            acc + num * num / (e.getField("nn").cast("double") *
              e.getField("r").cast("double") * e.getField("c").cast("double"))
          }).as("chi2"))
        .withColumn("v", sqrt(col("chi2") /
          (col("n").cast("double") *
            (least(col("n_types"), col("n_segs")) - 1).cast("double"))))
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

    // FANO FACTOR (index of dispersion) of daily arrivals per event type —
    // variance/mean of the day-count series: ≈1 is Poisson traffic, ≫1 is
    // bursty (retry storms, batch jobs), ≪1 is throttled/regular. Exact
    // BIGINT moments over the day frame (n, Σc, Σc²), one fixed-order
    // float expression: F = (n·Σc² − (Σc)²) / (n·Σc) — the biased
    // variance over the mean, cross-multiplied so the integers stay exact.
    "q_fano_factor" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
        .agg(count(lit(1)).as("c"))
      daily
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("scc"))
        .select(col("event_type"), col("n_days"), col("sc"), col("scc"),
          ((col("n_days") * col("scc") - col("sc") * col("sc")).cast("double") /
            (col("n_days") * col("sc")).cast("double")).as("fano"))
        .orderBy("event_type")
    },

    // WALD–WOLFOWITZ RUNS TEST on daily revenue vs its median — "is the
    // series random around its center, or trending/oscillating?" — the
    // distribution-free complement of q_autocorrelation/q_cusum. The sign
    // uses the EXACT lower median (the weighted-median machinery's
    // 2·rank > n rule on the day frame); runs/n1/n2 are exact integers
    // from one lag window over the day grid; z is one fixed-order float
    // chain. Day frame is time-bounded at any corpus size.
    "q_runs_test" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(unix_timestamp(col("o_orderdate").cast("timestamp"))
          .cast("long").as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val wRank = Window.orderBy("cents", "day") // day tiebreak: equal revenues stay deterministic
      val wAll = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val signed = daily
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        // above the LOWER MEDIAN: rank strictly past the midpoint; exact
        // integer rule, no float median anywhere
        .withColumn("above", col("rk") * 2 > col("n") + 1)
      val wDay = Window.orderBy("day")
      val runs = signed
        .withColumn("flip",
          when(lag(col("above"), 1).over(wDay).isNull ||
            lag(col("above"), 1).over(wDay) =!= col("above"), 1L).otherwise(0L))
        .agg(sum(col("flip")).as("runs"),
          sum(when(col("above"), 1L).otherwise(0L)).as("n1"),
          sum(when(!col("above"), 1L).otherwise(0L)).as("n2"))
      val n1 = col("n1").cast("double")
      val n2 = col("n2").cast("double")
      val mu = lit(2.0) * n1 * n2 / (n1 + n2) + lit(1.0)
      val sg = sqrt(lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2) /
        ((n1 + n2) * (n1 + n2) * (n1 + n2 - lit(1.0))))
      runs.select(col("runs"), col("n1"), col("n2"),
        ((col("runs").cast("double") - mu) / sg).as("z"))
    },

    // Two-sample KOLMOGOROV–SMIRNOV test between the A/B arms' value
    // distributions — the distribution-level A/B readout (χ²/Wilson see
    // only a success rate; KS sees any shape difference). The statistic
    // is EXACT: D·n_a·n_b = max over the merged value grid of
    // |cum_a·n_b − cum_b·n_a| — cross-multiplied integers on value-space
    // cumulative windows (the q_rank_auc recipe: the corpus collapses to
    // distinct cents first, windows ride thousands of rows at any scale).
    // The α=0.05 decision compares exact D against the asymptotic
    // critical value in one fixed-order float expression.
    "q_ks_test" -> { (s, dir) =>
      val byVal = Tables.events(s, dir)
        .select((col("user_id") % 2 === 0).as("is_a"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("cents")
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
      val wCum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
      val na = col("na").cast("double")
      val nb = col("nb").cast("double")
      val wAll = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      byVal
        .withColumn("cum_a", sum(col("ca")).over(wCum))
        .withColumn("cum_b", sum(col("cb")).over(wCum))
        .withColumn("ta", sum(col("ca")).over(wAll))
        .withColumn("tb", sum(col("cb")).over(wAll))
        .agg(max(col("ta")).as("na"), max(col("tb")).as("nb"),
          max(abs(col("cum_a") * col("tb") - col("cum_b") * col("ta"))).as("d_num"))
        .select(col("na"), col("nb"), col("d_num"),
          (col("d_num").cast("double") / (na * nb)).as("d_stat"))
        .withColumn("reject_05",
          col("d_stat") > lit(1.358) * sqrt((na + nb) / (na * nb)))
    },

    // LORENZ CURVE by customer revenue decile — the distribution profile
    // behind q_gini_revenue's single number ("the top decile holds X% of
    // revenue"). Deciles come from [[Scale.globalRowNumber]] on the packed
    // (cents, custkey) key — scalable exact ranking, never a global
    // ntile window; shares are cross-multiplied exact integers with one
    // q6 truncating division per decile.
    "q_lorenz_curve" -> { (s, dir) =>
      val perCust = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      // rkey packs (cents, custkey) into one long: cents < 2³¹ (a $21M
      // single-customer cap) and custkey < 2³² (TPC-H SF ~28k) — both
      // guarded loudly, because a custkey bleeding into the cents bits
      // would corrupt decile ordering SILENTLY (the q_curriculum_shards
      // packing lesson).
      val ranked = Scale.globalRowNumber(
        perCust.select(col("o_custkey"), col("cents"),
          when(col("cents") >= lit(1L << 31) || col("o_custkey") >= lit(1L << 32) ||
            col("o_custkey") < 0,
            raise_error(lit("q_lorenz_curve rkey overflow: cents >= 2^31 or custkey >= 2^32")))
            .otherwise(col("cents") * lit(1L << 32) + col("o_custkey")).as("rkey")),
        "rkey", partitions = 8)
      val tot = ranked.agg(count(lit(1)).as("n"), sum(col("cents")).as("tot_cents"))
      val wCum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
      ranked
        .crossJoin(broadcast(tot))
        .groupBy(expr("rownum * 10 DIV n").as("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("cents"),
          max(col("tot_cents")).as("tot_cents"))
        .withColumn("cum_cents", sum(col("cents")).over(wCum))
        .select(col("decile"), col("n_cust"), col("cents"),
          expr("cents * 1000000 DIV tot_cents").as("share_q6"),
          expr("cum_cents * 1000000 DIV tot_cents").as("cum_share_q6"))
        .orderBy("decile")
    },

    // EFFECTIVE SAMPLE SIZE of a length-weighted corpus sample —
    // ESS = (Σw)²/Σw² (Kish), the "how many uniform docs is this worth"
    // diagnostic that decides whether weighted sampling collapsed onto a
    // few heavy documents. Exact integer moments, one final division.
    "q_effective_sample_size" -> { (s, dir) =>
      Tables.documents(s, dir)
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_w"),
          sum(col("n_chars") * col("n_chars")).as("sum_w2"))
        .select(col("n"), col("sum_w"), col("sum_w2"),
          ((col("sum_w") * col("sum_w")).cast("double") / col("sum_w2").cast("double"))
            .as("ess"))
    },

    // KAPLAN–MEIER survival of user engagement LIFETIME (distinct active
    // days per user): death at lifetime L = a user with exactly L active
    // days, risk set = users reaching ≥ L, survival = Π(1 − dᵢ/nᵢ) —
    // the "how long do users stay engaged" curve with the
    // right-censoring-ready estimator (every lifetime here is fully
    // observed, the degenerate censoring case). The corpus pays one
    // user-grain countDistinct; death counts, the REVERSE-cumulative
    // risk window and the sequential product fold all ride the
    // lifetime-bounded frame. The product is float BY NATURE —
    // determinism comes from the fixed fold order (one division, one
    // subtraction, one multiply per step, mirrored exactly in the
    // recursive-CTE oracle).
    "q_kaplan_meier" -> { (s, dir) =>
      val lastDay = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(countDistinct(floor(unix_timestamp(col("ts")) / 86400).cast("long"))
          .as("day"))
      val byDay = lastDay.groupBy("day").agg(count(lit(1)).as("d"))
      val wRev = Window.orderBy(col("day").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val stepType = "array<struct<day:bigint,d:bigint,n:bigint,s:double>>"
      byDay
        .withColumn("n", sum(col("d")).over(wRev))
        .agg(sort_array(collect_list(struct(col("day"), col("d"), col("n")))).as("xs"))
        .select(aggregate(
          col("xs"),
          array().cast(stepType),
          (acc, e) => {
            val sPrev = when(size(acc) === 0, lit(1.0))
              .otherwise(element_at(acc, -1).getField("s"))
            val sNew = sPrev *
              (lit(1.0) - e.getField("d").cast("double") / e.getField("n").cast("double"))
            concat(acc, array(struct(
              e.getField("day").as("day"), e.getField("d").as("d"),
              e.getField("n").as("n"), sNew.as("s"))))
          }).as("ys"))
        .select(explode(col("ys")).as("y"))
        .select(col("y.day").as("lifetime_days"), col("y.d").as("n_churn"),
          col("y.n").as("n_risk"), col("y.s").as("survival"))
        .orderBy("lifetime_days")
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

    // Analytic-rank suite over per-user event counts: dense_rank /
    // percent_rank / cume_dist ordered by the count alone (tie-sharing,
    // deterministic — they depend on key values, not row order), lead
    // over the fully-ordered window. percent_rank/cume_dist are ONE IEEE
    // division of small integers ⇒ engine-exact.
    "q_rank_suite" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val base = Tables
        .events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      val byCnt = Window.partitionBy("event_type").orderBy(col("cnt").desc)
      val total = Window.partitionBy("event_type").orderBy(col("cnt").desc, col("user_id").asc)
      base
        .select(col("event_type"), col("user_id"), col("cnt"),
          dense_rank().over(byCnt).as("drank"),
          percent_rank().over(byCnt).as("prank"),
          cume_dist().over(byCnt).as("cdist"),
          lead(col("cnt"), 1).over(total).as("next_cnt"))
        .orderBy(col("event_type"), col("cnt").desc, col("user_id"))
    },

    // FULL OUTER join coverage: per-(user, day) error activity vs click
    // activity — rows surviving from either side, absent side ⇒ 0, with
    // a category tag. Both inputs share the (user, day) partitioning.
    "q_error_click_days" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      def side(t: String, as: String) = ev
        .filter(col("event_type") === t)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as(as))
      side("error", "err_cnt")
        .join(side("click", "click_cnt"), Seq("user_id", "day"), "full_outer")
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("err_cnt"), lit(0L)).as("err_cnt"),
          coalesce(col("click_cnt"), lit(0L)).as("click_cnt"),
          when(col("err_cnt").isNull, "click_only")
            .when(col("click_cnt").isNull, "error_only")
            .otherwise("both").as("category"))
        .orderBy("user_id", "day")
    },

    // TPC-H Q13-shaped: distribution of customers by order count, INCLUDING
    // zero-order customers (left join + double aggregation — the join must
    // preserve unmatched dimension rows for the 0 bucket to exist).
    "q_cust_order_dist" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_customers").desc, col("n_orders").desc)
    },

    // Rolling 7-day distinct active users — Relational.rollingDistinct
    // (map-side ×7 day explode + one distinct, never a per-day self-join).
    "q_rolling_active" -> { (s, dir) =>
      Relational
        .rollingDistinct(Tables.events(s, dir), "user_id", "ts", windowDays = 7)
        .select(date_format(col("win_day"), "yyyy-MM-dd").as("day"), col("active"))
        .orderBy("day")
    },

    // TPC-H Q18-shaped: large-quantity orders. The HAVING subquery becomes
    // an aggregate-FIRST frame (map-side combine over lineitem, the big
    // table) joined to orders — never orders⋈lineitem THEN re-aggregate.
    // l_quantity is integer-valued, so the sum is exact and cast long.
    "q_big_orders" -> { (s, dir) =>
      val big = Tables
        .lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > 300.0)
      Tables
        .orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("sq").cast("long").as("sum_qty"))
        .orderBy("o_orderkey")
    },

    // Scalar-subquery shape: rows above the GLOBAL mean. The 1-row global
    // aggregate broadcasts into the per-row comparison (never a shuffle of
    // the fact side); the mean is an exact-integer sum / count — one IEEE
    // division, and floor-quantized row values compare against it
    // identically in both engines.
    "q_above_avg" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"),
        floor(col("value") * 1000).cast("long").as("v_q3"))
      val globalAvg = ev.agg(
        (sum(col("v_q3")).cast("double") / count(lit(1))).as("avg_q3"))
      ev.join(broadcast(globalAvg))
        .filter(col("v_q3") > col("avg_q3"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy("event_type")
    },

    // Per-group z-score normalization (feature engineering) from integer
    // sufficient statistics: n, Σx, Σx² over quantized x are exact longs
    // (one co-partitioned aggregate + join back); each row's
    // z = (n·x − Σx) / sqrt(n·Σx² − (Σx)²) is a fixed-order scalar over
    // them — engine-exact, unlike any mean/stddev double pipeline.
    // (The unnormalized form: z_std = z / sqrt(n) is the usual z-score;
    // this scaling keeps every intermediate integral.)
    // Range bound (same convention as q_corr_stats, which shares this
    // arithmetic): n·Σx² grows ~quadratically with group size — with
    // x ≤ 2e3 it stays under 2^63 up to ~5e7 rows/group; beyond that,
    // coarsen the quantization (the caller's lever) or widen to
    // decimal(38,0). Spark's non-ANSI long multiply would wrap silently;
    // the DuckDB oracle errors loudly — a mismatch, not silent corruption.
    "q_group_zscore" -> { (s, dir) =>
      val q = Tables
        .events(s, dir)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 10).cast("long").as("x"))
      val stats = q
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0)
      q.join(stats, Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          ((col("n") * col("x") - col("sx")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))).as("z"))
        .orderBy("event_id")
    },

    // GROUPING SETS — the general form cube/rollup specialize: exactly the
    // requested aggregation levels ((event_type), (day), ()), ONE pass via
    // a single Expand, no superfluous cube combinations. Null indicators
    // coalesce to sentinels so the three levels are distinguishable.
    "q_grouping_sets" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .select(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
          floor(col("value") * 1000).cast("long").as("v_q3"))
        .groupingSets(
          Seq(Seq(col("event_type")), Seq(col("day")),
            Seq.empty[org.apache.spark.sql.Column]),
          col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"), sum(col("v_q3")).as("sum_v_q3"))
        // '<all>' sentinel RELIES ON THE FIXTURE: event_type/day are
        // non-null, never literally '<all>'. Against data where either
        // could hold, tag levels with grouping_id() instead — a sentinel
        // cannot distinguish a grouping-null from a data value.
        .select(coalesce(col("event_type"), lit("<all>")).as("event_type"),
          coalesce(col("day"), lit("<all>")).as("day"),
          col("cnt"), col("sum_v_q3"))
        .orderBy("event_type", "day")
    },

    // TPC-H Q10-shaped: top-20 customers by returned-item revenue in one
    // quarter. Date+flag predicates push to the scans; dims broadcast;
    // final top-k is TakeOrderedAndProject (never a global sort).
    "q_returned_revenue" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val ord = Tables
        .orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        // per-row revenue floor-quantized to 1e-4 (exact integers sum in
        // any partition order; a raw double sum rounds differently across
        // engines at the 2nd decimal), ONE division back at the end
        .groupBy(col("c_custkey"), col("c_name"), col("n_name").as("nation"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")).as("rev_q4"))
        .select(col("c_custkey"), col("c_name"), col("nation"),
          (col("rev_q4") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // TPC-H Q17-shaped: revenue from small-quantity lineitems, where
    // "small" is CORRELATED — below 20% of that part's own average
    // quantity. The correlated scalar subquery decorrelates into an
    // aggregate-join: per-part (n, Σqty) aggregated FIRST (map-side
    // combine over lineitem, never a per-row re-scan), joined back to
    // lineitem CO-PARTITIONED on l_partkey (one shuffle key for both the
    // agg and the probe — no nested loop anywhere), then the part dim.
    // The threshold compare `qty < 0.2·(Σ/n)` is cross-multiplied to
    // `5·qty·n < Σ` so it stays in exact integer arithmetic (l_quantity
    // is integer-valued); revenue is cents-quantized, summed exactly, and
    // divided once by 700 (Q17's "/7.0 yearly average" convention).
    "q_small_quantity_revenue" -> { (s, dir) =>
      val li = Tables
        .lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val thr = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"))
      li.join(thr, col("l_partkey") === col("t_partkey"))
        .filter(col("qty") * 5 * col("n") < col("sq"))
        .join(Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg((sum(col("cents")).cast("double") / 700.0).as("avg_yearly"))
        .orderBy("p_brand")
    },

    // TPC-H Q21-shaped (adapted to this schema's columns): suppliers who
    // were the SOLE LATEST shipper on a multi-supplier order — the
    // EXISTS (another supplier on the order) + NOT EXISTS (anyone shipping
    // later-or-tied) double correlation. Decorrelated to an
    // AGGREGATE-JOIN chain riding ONE l_orderkey exchange: lineitem is
    // repartitioned by order once; the per-(order, supplier) max-shipdate
    // aggregate, the per-order (max, supplier-count) aggregate, and the
    // join-back all consume that same partitioning (subset-key grouping +
    // exchange reuse — no new shuffle anywhere in the chain). This
    // replaces the earlier one-window-pass form: same single exchange,
    // but per-order O(1) aggregation state instead of two collect_set
    // buffers materialized per ROW of the window frame. The supplier dim
    // broadcasts; final rank is the usual TakeOrdered top-k.
    "q_sole_late_shipper" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_orderkey"))
      // per (order, supplier): latest ship date — the groupBy DEDUPS
      // multi-line suppliers first, so everything downstream runs over
      // one-row-per-supplier frames; grouping on a superset of the
      // repartition key keeps the l_orderkey partitioning
      val perSupp = Tables
        .lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("s_mx"))
        // per-order max + supplier count as O(1)-state windows over the
        // SAME partitioning (no exchange, no join-back; the round-6 form
        // materialized two collect_set buffers per window row instead)
        .withColumn("mx", max(col("s_mx")).over(w))
        .withColumn("n_supp", count(lit(1)).over(w))
      perSupp
        .filter(col("n_supp") > 1 && col("s_mx") === col("mx"))
        // sole winner ⇔ exactly one supplier achieves the per-order max;
        // min() is that supplier (the group has one row)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_max_supp"), min(col("l_suppkey")).as("l_suppkey"))
        .filter(col("n_max_supp") === 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    },

    // TPC-H Q20-shaped (no partsupp table in this schema): suppliers who
    // OVER-SHIP a part — their shipped quantity exceeds that part's
    // per-supplier AVERAGE — for parts in a name family. The reference
    // formulation is a nested IN with a CORRELATED aggregate threshold
    // (qty > avg over that part's suppliers); decorrelated here to ONE
    // l_partkey exchange: repartition by part, per-(part, supplier)
    // quantity aggregate, per-part total and supplier count as WINDOWS
    // over the same partitioning, threshold compare cross-multiplied to
    // exact integers (sp_qty · n_s > p_qty — no division reaches the
    // filter). The p_name prefix predicate pushes to the part scan and
    // prunes lineitem via a broadcast semi-join BEFORE the shuffle.
    // (Verified non-vacuous at all three SFs: 97 / 3128 / 35657
    // surviving pairs — a dominance-style >50% threshold matches zero
    // rows on this data's uniform quantities.)
    "q_excess_shipper" -> { (s, dir) =>
      val pk = Tables.part(s, dir)
        .filter(col("p_name").like("large%"))
        .select(col("p_partkey"))
      val w = Window.partitionBy(col("l_partkey"))
      Tables
        .lineitem(s, dir)
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
        // floor() BEFORE the cast: Spark cast(double→long) truncates toward
        // zero while DuckDB CAST rounds half-to-even — floor on both sides
        // makes the two engines truncate identically for any quantity, not
        // just the integral-valued fixtures
        .select(col("l_partkey"), col("l_suppkey"),
          floor(col("l_quantity")).cast("long").as("qty"))
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("sp_qty"))
        .withColumn("p_qty", sum(col("sp_qty")).over(w))
        .withColumn("n_s", count(lit(1)).over(w))
        .filter(col("sp_qty") * col("n_s") > col("p_qty"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_parts"), sum(col("sp_qty")).as("qty_sum"))
        .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("n_parts"), col("qty_sum"))
        .orderBy("s_name")
    },

    // TPC-H Q15-shaped: the top supplier(s) by one quarter's revenue —
    // the max-over-aggregate-view pattern, TIE-PRESERVING (every supplier
    // at the max survives, exactly like the view-based original). Revenue
    // is cents⁴-quantized per row and summed exactly, so the max compare
    // is integer equality — no double equality across engines. The 1-row
    // max broadcasts back over the |suppliers|-sized aggregate (the
    // q_rich_inactive broadcast-scalar shape); supplier dim broadcasts.
    "q_top_supplier" -> { (s, dir) =>
      val rev = Tables
        .lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")).as("rev_q4"))
      val mx = rev.agg(max(col("rev_q4")).as("mx"))
      rev
        .join(broadcast(mx))
        .filter(col("rev_q4") === col("mx"))
        .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), (col("rev_q4") / 10000.0).as("total_rev"))
        .orderBy("s_suppkey")
    },

    // TPC-H Q22-shaped: above-average-balance customers with NO orders,
    // rolled up per nation — scalar-subquery threshold (1-row broadcast)
    // COMPOSED with an anti-join against the fact table. The balance
    // compare is cross-multiplied to exact integers (cents·n > Σcents) —
    // no division reaches the filter — and the anti-join is a plain
    // left_anti on o_custkey (shuffle or broadcast at AQE's discretion;
    // never a per-row NOT EXISTS probe).
    // NOTE: the driver fixtures barely exercise this shape (zero
    // order-less customers at sf0.001/sf0.01, one at sf0.1) — the
    // declared row proves plumbing, RelationalSpec's synthetic-frame test
    // proves the anti-join + threshold composition on data where a
    // meaningful population survives both gates.
    "q_rich_inactive" -> { (s, dir) =>
      Relational
        .richInactive(Tables.customer(s, dir), Tables.orders(s, dir))
        .orderBy("nation")
    },

    // TPC-H Q19-shaped: DISJUNCTIVE predicate join — revenue over an OR
    // of three (brand ∧ size-range ∧ quantity-range) conjunctions.
    // Catalyst cannot split a cross-table OR, so the per-side
    // implications are stated EXPLICITLY (brand∧size disjunction on
    // part, quantity-range union on lineitem) — the documented TPC-H
    // Q19 optimization: both scans are cut before the join, and the full
    // disjunction re-checks after it (PlanSpec pins the pushed filters).
    "q_disjunctive_revenue" -> { (s, dir) =>
      val part = Tables.part(s, dir)
        .filter((col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      // raw double compares (quantities are integral-valued): a cast
      // would block the range predicates from reaching the parquet scan
      val li = Tables.lineitem(s, dir)
        .filter(col("l_quantity").between(1, 11) || col("l_quantity").between(15, 25) ||
          col("l_quantity").between(30, 40))
        .select(col("l_partkey"), col("l_quantity").as("qty"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("rev_q4"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("qty").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("qty").between(15, 25)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("qty").between(30, 40)))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          (sum(col("rev_q4")).cast("double") / 10000.0).as("revenue"))
        .orderBy("p_brand")
    },

    // TPC-H Q9-shaped (no partsupp in this schema — supply cost stands in
    // as the part's retail price × quantity): per-(nation, year) profit
    // over a name-family of parts. Revenue and cost are floor-quantized
    // per row SEPARATELY, summed exactly as integers, subtracted, ONE
    // division at the end — the sum-of-differences ≡ difference-of-sums
    // on exact integers, so engines agree bit-for-bit. Dims broadcast;
    // the one corpus-sized join (lineitem ⋈ orders for the year) is left
    // to the planner.
    "q_profit_by_nation" -> { (s, dir) =>
      val pk = Tables.part(s, dir)
        .filter(col("p_name").contains("widget"))
        .select(col("p_partkey"), col("p_retailprice"))
      val li = Tables.lineitem(s, dir)
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("rev_q4"),
          floor(col("p_retailprice") * col("l_quantity") * 10000)
            .cast("long").as("cost_q4"))
      li.join(Tables.orders(s, dir).select(col("o_orderkey"),
          // long: DuckDB's year() is BIGINT, Spark's is INT — pin the wider
          year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(((sum(col("rev_q4")) - sum(col("cost_q4"))).cast("double") / 10000.0)
          .as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q4-shaped: EXISTS-with-predicate rolled up per order priority.
    // The fixture lineitem has no commit/receipt dates, so "late" is
    // l_shipdate > o_orderdate + 60 days — a CORRELATED inequality, which
    // makes the EXISTS a semi-join with an equi key (l_orderkey) plus a
    // non-equi residual, NOT a plain key semi-join. The date-range filter
    // on orders pushes to its scan; lineitem ships only (key, shipdate)
    // into the join. One order-keyed shuffle pair; no nested loops.
    "q_late_order_priority" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-07-01")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      o.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q7-shaped: two-nation shipping volume with the SYMMETRIC pair
    // predicate — (supp=A ∧ cust=B) ∨ (supp=B ∧ cust=A) — per shipping
    // year. The nation filter is applied INSIDE each dim before the fact
    // joins (supplier broadcasts; customer is corpus-class at TPC-H scale
    // so its join is left to the planner), and the symmetric disjunction
    // re-checks after both nations are attached — the same
    // explicit-implication pattern as q_disjunctive_revenue. Volume is
    // quantized per row, summed exactly, divided once.
    "q_nation_volume" -> { (s, dir) =>
      val nat = Tables.nation(s, dir)
        .filter(col("n_name").isin("NATION_3", "NATION_7"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("vol_q4"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg((sum(col("vol_q4")).cast("double") / 10000.0).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q11-shaped: group share vs a GLOBAL scalar HAVING — parts
    // whose one-nation stock value exceeds 1/1000 of that nation's total.
    // No partsupp in this schema: value = Σ floor(l_extendedprice·100)
    // over the nation's suppliers' lineitems (semi-join prune before the
    // per-part aggregate). The global total is the q_above_avg scalar
    // composed with q_top_supplier's 1-row broadcast; the HAVING is
    // cross-multiplied to exact integers (value·1000 > total) so no
    // division reaches the filter. Per-part agg and the scalar share the
    // SAME aggregate subtree — Catalyst re-derives it (no common-subplan
    // reuse), the accepted q_top_supplier trade.
    "q_important_parts" -> { (s, dir) =>
      val nat = Tables.nation(s, dir)
        .filter(col("n_name") === "NATION_5")
        .select(col("n_nationkey"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val pv = Tables.lineitem(s, dir)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("l_partkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("val_q2"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("val_q2")).as("value_q2"))
      val tot = pv.agg(sum(col("value_q2")).as("tot_q2"))
      pv.join(broadcast(tot))
        .filter(col("value_q2") * 1000 > col("tot_q2"))
        .select(col("l_partkey").as("p_partkey"),
          (col("value_q2").cast("double") / 100.0).as("value"))
        .orderBy(col("value").desc, col("p_partkey"))
    },

    // TPC-H Q5-shaped: local-supplier volume — revenue per nation of a
    // region, counted only when the CUSTOMER's nation equals the
    // SUPPLIER's nation (the join cycle that makes Q5 interesting: the
    // residual s_nationkey = c_nationkey closes the cycle on the last,
    // broadcast join instead of forcing a second corpus shuffle).
    // region→nation prunes both dims before any fact is touched; the two
    // corpus joins (lineitem⋈orders, ⋈customer) stay key-partitioned for
    // the planner; supplier broadcasts with the cycle predicate attached.
    "q_local_supplier_volume" -> { (s, dir) =>
      val nat = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("rev_q4"))
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg((sum(col("rev_q4")).cast("double") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("nation"))
    },

    // TPC-H Q8-shaped: two-level market share in ONE aggregation pass —
    // numerator (volume supplied by the focus nation) and denominator
    // (all volume) as sum(when)/sum over the same rows, never a
    // self-join or re-scan. The part filter broadcasts into the lineitem
    // scan FIRST (most selective), the region gate prunes customers via
    // the broadcast nation⋈region dim, and the focus-nation test rides
    // the supplier broadcast as a plain column. Exact integer sums; one
    // double division at the end.
    "q_market_share" -> { (s, dir) =>
      val regNat = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "AMERICA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(regNat), col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("c_custkey"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
            .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("vol_q4"))
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
            .select(col("o_orderkey"), col("o_custkey"),
              year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", col("vol_q4")).otherwise(0L))
          .cast("double") / sum(col("vol_q4")).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    },

    // TPC-H Q12-shaped: two-way conditional counts per ship class in ONE
    // aggregation — high-priority vs low-priority line counts as paired
    // sum(when)s, never two passes. The fixture has no l_shipmode or
    // receipt dates, so the class is l_returnflag ∈ {A,R} and "late" is
    // the Q4-style correlated residual l_shipdate > o_orderdate + 30d on
    // the order-keyed equi join. Both lineitem filters push to the scan;
    // orders ships only (key, date, priority).
    "q_shipmode_priority" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
        .join(Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("l_returnflag").as("ship_mode"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy("ship_mode")
    },

    // TPC-H Q16-shaped: distinct-supplier counts per part class with a
    // NOT IN exclusion — the anti-join decorrelation. The part-class
    // filter broadcasts its attributes into the lineitem scan (the fact
    // never shuffles for the dims); the excluded-supplier set (the
    // "complaints" stand-in: negative balance) is dimension-sized and
    // broadcasts as a left_anti build. NOT IN ≡ anti-join here because
    // s_suppkey is non-null by schema — the standard NOT-IN-null caveat
    // does not arise. count(DISTINCT) rides Spark's two-level distinct
    // aggregate on the grouped keys.
    "q_part_supplier_counts" -> { (s, dir) =>
      val pk = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#4" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val badSup = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
        .join(broadcast(badSup), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // TPC-H Q2-shaped: minimum-cost supplier per part, region-restricted —
    // the classic correlated-min scalar subquery, hand-decorrelated the
    // q_excess_shipper way: ONE REPARTITION_BY_COL on l_partkey carries the
    // per-(part, supplier) min-cost aggregate (subset-key grouping keeps
    // the partitioning) AND the per-part min window; the winner filter is
    // an exact integer-cents compare. Region prunes suppliers INSIDE the
    // cost relation (as Q2's subquery does), via a broadcast semi; part
    // gate broadcasts; the supplier/nation attach is a dimension broadcast
    // join AFTER the frame has shrunk to winners. Completes the full
    // 22-query TPC-H shape coverage (Q1-Q22).
    "q_min_cost_supplier" -> { (s, dir) =>
      val pk = Tables.part(s, dir)
        .filter(col("p_size").isin(5, 10, 15) && col("p_type") === "LARGE")
        .select(col("p_partkey"))
      val regSup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val w = Window.partitionBy(col("l_partkey"))
      Tables.lineitem(s, dir)
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(regSup.select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        // integer cents: floor before cast (the q_excess_shipper truncation
        // parity move) — the min and the winner equality are exact
        .select(col("l_partkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("cost_c"))
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("cost_c")).as("cost_c"))
        .withColumn("min_c", min(col("cost_c")).over(w))
        .filter(col("cost_c") === col("min_c"))
        .join(broadcast(regSup), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("p_partkey"), col("s_name"), col("n_name"),
          round(col("s_acctbal"), 2).as("s_acctbal"), col("cost_c"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },

    // q_big_orders through the BUCKETED fact⋈fact path: both join sides
    // are first written bucketed+sorted on the order key
    // ([[Scale.writeBucketed]] via the Dedup Intermediate machinery, so
    // Verify/Bench GC the tables), and the join reads bucket-aligned
    // splits with ZERO exchange on the key — the one-time-write /
    // every-query-free trade a 100 TB deployment makes for its hottest
    // join key. `merge` hints pin the SortMergeJoin both sides'
    // bucket+sort layout feeds (at fixture SF the planner would broadcast
    // the agg side and never exercise the bucketed path). Same oracle as
    // q_big_orders — bucketing must be invisible to results.
    "q_big_orders_bucketed" -> { (s, dir) =>
      val bucketed = Dedup.Intermediate.Bucketed(buckets = 32)
      val big = bucketed.keyed(
        Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sq"))
          .filter(col("sq") > 300.0),
        "big_orders_agg", "l_orderkey")
      val ord = bucketed.keyed(
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        "big_orders_fact", "o_orderkey")
      ord.hint("merge")
        .join(big.hint("merge"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("sq").cast("long").as("sum_qty"))
        .orderBy("o_orderkey")
    },

    // Incremental view maintenance: the base period's aggregate is
    // MATERIALIZED (managed table — the stored rollup a production
    // pipeline maintains), the delta period aggregates alone, and the
    // merge of the two partials must equal the full recompute (the
    // oracle) EXACTLY. Values ride the integer-moments pattern
    // (floor(value*1000) summed as longs) so partial merge is exactly
    // associative — a raw double sum would make incremental ≠ recompute
    // in the last bits. At 100 TB this is THE shape: only the delta is
    // ever scanned; the base rollup is group-count-sized.
    "q_incremental_agg" -> { (s, dir) =>
      val boundary = lit("2024-01-01 08:00:00").cast("timestamp")
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("ts"),
          floor(col("value") * 1000).cast("long").as("v_q3"))
      val base = Dedup.Intermediate.Bucketed(32)(
        ev.filter(col("ts") < boundary)
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"), sum(col("v_q3")).as("sv")),
        "inc_base")
      val delta = ev.filter(col("ts") >= boundary)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("v_q3")).as("sv"))
      base.unionByName(delta)
        .groupBy("event_type")
        .agg(sum(col("cnt")).as("n_events"), sum(col("sv")).as("sum_v_q3"))
        .select(col("event_type"), col("n_events"), col("sum_v_q3"),
          (col("sum_v_q3").cast("double") / col("n_events") / 1000.0).as("avg_v"))
        .orderBy("event_type")
    },

    // Dynamic partition pruning: events materialize once PARTITIONED BY
    // day (the warehouse layout a 100 TB event store actually uses), then
    // a join against the top-3 purchase days — recomputed from the raw
    // feed, broadcast — prunes the partitioned scan to those 3 days AT
    // RUNTIME (PartitionFilters: dynamicpruningexpression; PlanSpec pins
    // it). At scale this is a 3-day read instead of a full-corpus scan.
    // The rank window on the dim side is day-granular (≤ tens of
    // thousands of rows at any SF) — the unpartitioned window is bounded.
    "q_dpp_hot_days" -> { (s, dir) =>
      val raw = Tables.events(s, dir)
      val part = Dedup.Intermediate.Partitioned.keyed(
        raw.withColumn("dt", to_date(col("ts"))), "events_bydt", "dt")
      val hot = raw
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("purchases"))
        .withColumn("rk",
          row_number().over(Window.orderBy(col("purchases").desc, col("dt").asc)))
        .filter(col("rk") <= 3)
        .select(col("dt"), col("purchases"))
      part
        .join(broadcast(hot), Seq("dt"))
        .groupBy(col("dt"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"),
          max(col("purchases")).as("purchases"))
        .orderBy("dt")
    },

    // Dense global row numbering WITHOUT the empty-over window's
    // single-reducer sort ([[Scale.globalRowNumber]]): range-repartition +
    // per-partition local numbering + broadcast prefix-sum offsets. The
    // oracle IS `row_number() OVER (ORDER BY …)` — the scalable plan must
    // reproduce the single-task semantics bit-for-bit. Driver traffic is
    // one count per partition; PlanSpec pins the absence of a
    // SinglePartition exchange.
    "q_global_rownum" -> { (s, dir) =>
      Scale
        .globalRowNumber(
          Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "doc_id", partitions = 8)
        .select(col("doc_id"), col("source"), col("rownum"))
        .orderBy("doc_id")
    },

    // Z-order layout statistics: events keyed by (user, day) get a Morton
    // z-value ([[Scale.zValue]], pure bit-algebra Column — codegen, no
    // UDF), and per z-bucket (top 4 z-bits = 16 buckets) min/max spans of
    // BOTH dimensions are computed. The law a z-layout buys: every bucket
    // bounds x AND y to ≤ 1/4 of their domain simultaneously — per-file
    // min/max stats can prune two-axis predicates, where a single-column
    // sort leaves the second dimension at full width. Oracle recomputes
    // the interleave closed-form per row.
    "q_zorder_locality" -> { (s, dir) =>
      // 5-bit dims (32×32 grid) so the fixture's user/day domains FILL the
      // space and all 16 top-4-bit buckets populate at every SF — the
      // locality law (both spans ≤ domain/4 per bucket) is then visible in
      // the output, not vacuously true of one giant bucket
      val bits = 5
      val ev = Tables.events(s, dir).select(
        pmod(col("user_id"), lit(1 << bits)).as("x"),
        pmod(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")),
          lit(1 << bits)).as("y"))
      ev.withColumn("z", Scale.zValue(col("x"), col("y"), bits))
        .withColumn("bucket", shiftright(col("z"), 2 * bits - 4))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_events"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy("bucket")
    },

    // The z-order layout EXERCISED end-to-end inside a declared query:
    // events get the 5-bit (user, day) z-value, are written
    // z-range-partitioned to parquet (the layout write a warehouse pays
    // once), read back under a two-dimensional box predicate — file-level
    // min/max stats prune most files (ScaleSpec measures the row
    // reduction) — and aggregated. The oracle runs the same box filter on
    // the ORIGINAL parquet: stats pruning must be invisible to results,
    // the same physical-choice contract as bucketing/salting/DPP.
    "q_zorder_scan" -> { (s, dir) =>
      val bits = 5
      val keyed = Tables.events(s, dir).select(
        pmod(col("user_id"), lit(1 << bits)).as("x"),
        pmod(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")),
          lit(1 << bits)).as("y"),
        floor(col("value") * 1000).cast("long").as("v_q3"))
      val path =
        Tables.scratchDir(s, "zorder")
      keyed.withColumn("z", Scale.zValue(col("x"), col("y"), bits))
        .repartitionByRange(16, col("z")).drop("z")
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .filter(col("x") >= 8 && col("x") < 16 && col("y") >= 16 && col("y") < 24)
        .agg(count(lit(1)).as("n_events"), sum(col("v_q3")).as("sum_v_q3"),
          count_distinct(col("x") * 32 + col("y")).as("n_cells"))
    },

    // Poissonized bootstrap confidence band ([[Relational.bootstrapMean]]):
    // each row joins all 32 replicates with a deterministic hash-derived
    // Poisson(1) weight (integer inverse-CDF thresholds — no float draw),
    // so the whole bootstrap is ONE corpus pass + one (group × reps)
    // shuffle instead of 32 resample shuffles — and, being deterministic,
    // the replicate means and the min/max envelope are bit-exactly
    // oracle-checkable, which no RNG-based bootstrap can be.
    "q_bootstrap_ci" -> { (s, dir) =>
      Relational
        .bootstrapMean(
          Tables.events(s, dir).select(col("event_type"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("v_q3")),
          "event_type", "event_id", "v_q3", reps = 32)
        .select(col("g").as("event_type"), col("n_rows"), col("mean_q6"),
          col("boot_lo_q6"), col("boot_hi_q6"))
        .orderBy("event_type")
    },

    // Skew-salted fact⋈dim equi-join ([[Scale.saltedJoin]]): the hot fact
    // key's rows split across 8 (key, salt) reduce groups, the dim side
    // replicates ×8, merge hints pin the SortMergeJoin (modeling a dim too
    // large to broadcast — at fixture SF the planner would broadcast and
    // never exercise the salted path). Oracle = the plain join + GROUP BY:
    // salting is a physical choice and must be invisible to results.
    "q_join_salted" -> { (s, dir) =>
      val fact = Tables.events(s, dir)
        .select(col("user_id").as("c_custkey"),
          floor(col("value") * 1000).cast("long").as("v_q3"))
      val dim = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
      Scale
        .saltedJoin(fact, dim, "c_custkey", saltBuckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), sum(col("v_q3")).as("sum_v_q3"))
        .orderBy("c_mktsegment")
    },

    // Market-basket association rules over order baskets
    // ([[Relational.marketBasket]]): frequent part pairs with
    // confidence/lift. Thresholds (item support ≥ 25, pair support ≥ 3)
    // picked so the sf0.01 fixture yields a non-trivial rule set; outputs
    // are all-integer (×10⁶ truncating quotients) — bit-exact.
    "q_assoc_rules" -> { (s, dir) =>
      Relational
        .marketBasket(
          Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minItemSupport = 25, minPairSupport = 3)
        .orderBy("item_a", "item_b")
    },

    // First-order Markov transition matrix over per-user event sequences:
    // lead() within (user, time) gives bigrams in ONE pass, the transition
    // counts aggregate to |event_type|² rows, and row-conditional
    // probabilities are ×10⁶ truncating quotients over that tiny frame.
    // Same sequence-total-order contract as q_user_sequences (ts, event_id).
    "q_markov_transitions" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("src_total", sum(col("cnt")).over(Window.partitionBy("src")))
        .select(col("src"), col("dst"), col("cnt"), col("src_total"),
          expr("cnt * 1000000 DIV src_total").as("p_q6"))
        .orderBy("src", "dst")
    },

    // 10%-trimmed mean of line price per return flag — the robust location
    // estimate a mean-reverting metric pipeline wants when tails are
    // garbage. Exact trim via per-group row_number over the TOTAL order
    // (cents, orderkey, linenumber) — both engines drop the identical
    // rows. Integer cents sum; the mean is one IEEE division. Scale note:
    // the per-flag window ranks |group| rows (3 heavy partitions here);
    // at 100 TB the same trim comes from quantile CUTPOINTS plus a
    // boundary-tie rank pass — the windowed form is the exactness anchor.
    "q_trimmed_mean" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"),
          col("l_orderkey"), col("l_linenumber"))
      val wRank = Window.partitionBy("l_returnflag")
        .orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))
      val wAll = Window.partitionBy("l_returnflag")
      li.withColumn("rn", row_number().over(wRank))
        .withColumn("n", count(lit(1)).over(wAll))
        // integer DIV, not `/`: n/10.0 would shift the upper cut when
        // n % 10 != 0 (rn <= n - 2.5 keeps one fewer row than n - 2)
        .filter(expr("rn > n DIV 10 AND rn <= n - n DIV 10"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_kept"), sum(col("cents")).as("sum_cents"))
        .select(col("l_returnflag"), col("n_kept"), col("sum_cents"),
          (col("sum_cents").cast("double") / col("n_kept")).as("mean_cents"))
        .orderBy("l_returnflag")
    },

    // Gini coefficient of revenue concentration across customers — the
    // one-number inequality audit (is 1% of customers 90% of revenue?).
    // Rank-weighted form G = (Σ 2·i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over
    // cents-exact per-customer revenue: numerator and denominator are
    // exact BIGINTs, the quotient ONE deterministic IEEE division. The
    // global rank runs over the CUSTOMER aggregate (|customers| rows, not
    // |orders|); at 100 TB that single-partition sort gives way to the
    // packBinsTwoPass-style partition-offset prefix rank — same algebra.
    "q_gini_revenue" -> { (s, dir) =>
      // whole DOLLARS, not cents: the rank-weighted sum grows as
      // n_customers² × mean revenue, and cents would wrap Long around
      // TPC-H sf2 — dollars buy ×100 headroom (≈ sf200; beyond that the
      // identical algebra runs in DECIMAL(38))
      val cust = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice")).cast("long")).as("dollars"))
      val w = Window.orderBy(col("dollars"), col("o_custkey"))
      cust.withColumn("i", row_number().over(w).cast("long"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("dollars")).as("total_dollars"),
          sum(col("i") * 2 * col("dollars")).as("s2"))
        .select(col("n_customers"), col("total_dollars"),
          (col("s2") - (col("n_customers") + 1) * col("total_dollars")).as("gini_num"),
          ((col("s2") - (col("n_customers") + 1) * col("total_dollars")).cast("double")
            / (col("n_customers") * col("total_dollars")).cast("double")).as("gini"))
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

    // Leave-one-out target encoding of c_mktsegment by order value — the
    // leakage-safe categorical feature (each row's own target is excluded
    // from its encoding, so the feature never memorizes the label). LOO is
    // EXACT integer algebra: numerator S_g − x_i and denominator n_g − 1;
    // the quotient is one IEEE division per row. Scale shape: the segment
    // is 5-ary, so the per-group sums come from a tiny aggregate JOINED
    // BACK (broadcast) — a segment-partitioned window would serialize the
    // whole fact table into 5 partitions. The customer dim joins on the
    // hash-keyed custkey.
    "q_target_encoding" -> { (s, dir) =>
      val oc = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val g = oc.groupBy(col("seg"))
        .agg(count(lit(1)).as("n_g"), sum(col("cents")).as("s_g"))
      oc.join(broadcast(g), Seq("seg"))
        .select(col("o_orderkey"), col("seg"), col("cents"),
          (col("s_g") - col("cents")).as("loo_num"),
          (col("n_g") - 1).as("loo_den"),
          ((col("s_g") - col("cents")).cast("double")
            / (col("n_g") - 1).cast("double")).as("loo_cents"))
        .orderBy("o_orderkey")
    },

    // Pareto frontier (2D skyline: min price, max size) over parts — the
    // "best tradeoff set" query (Börzsönyi et al., ICDE 2001). Exact
    // integer recipe: collapse to the per-price max size first (only that
    // point per price can survive), then one ordered scan keeps prices
    // whose max size strictly exceeds the running max over all CHEAPER
    // prices. The window runs over |distinct prices| aggregated rows, not
    // parts; ties on (price, max size) are all non-dominated and kept via
    // the count.
    "q_pareto_frontier" -> { (s, dir) =>
      val pts = Tables.part(s, dir)
        .select(floor(col("p_retailprice") * 100).cast("long").as("price_cents"),
          col("p_size").cast("long").as("size"))
      val perPrice = pts
        .groupBy(col("price_cents"))
        .agg(max(col("size")).as("max_size"))
      val nAt = pts.groupBy(col("price_cents"), col("size").as("max_size"))
        .agg(count(lit(1)).as("n_parts"))
      perPrice
        .withColumn("prev_max", max(col("max_size")).over(
          Window.orderBy(col("price_cents"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("prev_max").isNull || col("max_size") > col("prev_max"))
        .join(nAt, Seq("price_cents", "max_size"))
        .select(col("price_cents"), col("max_size").as("size"), col("n_parts"))
        .orderBy("price_cents")
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

    // Benford first-digit audit of order totals — the classic fabricated-
    // numbers screen a data-quality pass runs on money columns. The first
    // digit comes from the DECIMAL STRING of the exact cents integer
    // (log10 would hit libm at power-of-ten boundaries and is banned);
    // shares are ×10⁶ truncating quotients over the 9-row aggregate.
    "q_benford_digits" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .groupBy(substring(col("cents").cast("string"), 1, 1).as("digit"))
        .agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(Window.partitionBy()))
        .select(col("digit"), col("n"), expr("n * 1000000 DIV total").as("share_q6"))
        .orderBy("digit")
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

    // Plain-SQL API surface: the same engine drives `spark.sql` text over
    // registered views — a reference user's raw-SQL workload runs
    // unchanged (the DataFrame queries and this one share Catalyst, so
    // parity here proves the SQL front end, not new semantics).
    "q_sql_interface" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS n, " +
          "CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents " +
          "FROM lineitem_v GROUP BY 1, 2 ORDER BY 1, 2")
    },

    // Join-key SKEW AUDIT — the diagnostic a pipeline runs BEFORE picking
    // plain vs salted vs broadcast for a join: per-key counts reduce
    // map-side, then one tiny pass emits the top-5 heavy keys plus the
    // skew factor max·n_keys·10⁶ DIV total (1e6 = perfectly uniform).
    // Only |keys|-sized frames ever shuffle.
    "q_key_skew_audit" -> { (s, dir) =>
      val perKey = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      val stats = perKey.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"),
        max(col("cnt")).as("max_cnt"))
      val top = perKey.orderBy(col("cnt").desc, col("user_id")).limit(5)
      top
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("user_id"))))
        .crossJoin(broadcast(stats))
        .select(col("rank"), col("user_id"), col("cnt"), col("n_keys"), col("total"),
          col("max_cnt"),
          // max/mean with a truncating integer mean: the triple product
          // max*n_keys*1e6 wraps Long at ~1e9 keys x 1e9 max
          expr("max_cnt * 1000000 DIV (total DIV n_keys)").as("skew_q6"))
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

    // Bloom-PREJOIN pruning declared end-to-end: a bloom filter built
    // from the (dim-scale) high-balance customer keys prunes the event
    // feed BEFORE the join shuffle — the runtime-filter pattern for
    // selective fact⋈dim joins; the exact join then re-checks, so bloom
    // false positives are invisible and the oracle is the PLAIN join
    // (the physical-choice contract shared with bucketing / salting /
    // z-order / DPP). At 100 TB the filter is a broadcast Array[Long]
    // carried by the BloomBitTest expression, plan size flat.
    "q_bloom_prejoin" -> { (s, dir) =>
      val rich = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey"))
      val bf = Bloom.broadcastFilter(s,
        Bloom.build(rich, "c_custkey", numBits = 1 << 16, numHashes = 5))
      Tables.events(s, dir)
        .filter(bf.mightContain(col("user_id")))
        .join(rich, col("user_id") === col("c_custkey"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(coalesce(col("value"), lit(0.0)) * 1000).cast("long")).as("sum_v_q3"))
        .orderBy("event_type")
    },

    // Clamped per-user credit balance ([[Relational.clampedBalance]]):
    // purchases add their cents, errors cost a flat 500, the balance never
    // goes below zero — the stateful sequential recurrence (inventory /
    // token-bucket class) that NO window rewrite expresses, run as one
    // repartition + per-partition sort + single-pass fold. Oracle = a
    // DuckDB recursive CTE stepping the identical recurrence.
    "q_clamped_balance" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "error"))
        .select(col("user_id"), secs(col("ts")).as("ts_s"), col("event_id"),
          when(col("event_type") === "purchase",
            floor(coalesce(col("value"), lit(0.0)) * 100).cast("long"))
            .otherwise(lit(-500L)).as("delta"))
      Relational
        .clampedBalance(e, "user_id", "ts_s", "event_id", "delta")
        .select(col("k").as("user_id"), col("balance"), col("n_clamps"), col("n_rows"))
        .orderBy("user_id")
    },

    // MERGEABLE quantile sketch with bounded RELATIVE error, fully
    // deterministic — the DDSketch idea on decimal-digit buckets so no
    // libm log ever runs: bucket key = (decimal length, first two digits)
    // of the exact cents integer (string ops, bit-identical cross-engine);
    // bucket width/lo ≤ 1/10 ⇒ midpoint estimate within ~5 % relative.
    // The sketch is a COUNT HISTOGRAM — merging shards is integer
    // addition, so the declared query builds it twice (direct, and
    // sharded-then-merged) and both estimates must agree exactly; the
    // exact percentile rides alongside for the error audit. At 100 TB the
    // sketch is the only thing that crosses executors: ≤ ~900 counters.
    "q_mergeable_quantiles" -> { (s, dir) =>
      val base = Tables.orders(s, dir)
        .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .select(col("cents"),
          length(col("cents").cast("string")).cast("long").as("len"),
          substring(col("cents").cast("string"), 1, 2).cast("long").as("d2"))
      val direct = base.groupBy(col("len"), col("d2")).agg(count(lit(1)).as("cnt"))
      val merged = base
        .withColumn("shard", pmod(col("cents"), lit(8L)))
        .groupBy(col("shard"), col("len"), col("d2"))
        .agg(count(lit(1)).as("c0"))
        .groupBy(col("len"), col("d2"))
        .agg(sum(col("c0")).as("cnt"))
      val exact = Tables.orders(s, dir)
        .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .agg(percentile(col("cents"),
          array(lit(0.5), lit(0.9), lit(0.99))).as("ex"))
        .select(posexplode(col("ex")).as(Seq("i", "exact_cents")))
        .select((element_at(array(lit(50L), lit(90L), lit(99L)), col("i") + 1)).as("p"),
          col("exact_cents"))
      def estimates(sk: DataFrame, name: String): DataFrame = {
        val wCum = Window.orderBy(col("len"), col("d2"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = sk
          .withColumn("cum", sum(col("cnt")).over(wCum))
          .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
          // lo/width from decimal strings — repeat('0', len-2) is exact in
          // both engines where power(10, k) would ride libm
          .withColumn("lo", when(col("len") === 1, col("d2"))
            .otherwise(concat(col("d2").cast("string"),
              expr("repeat('0', len - 2)")).cast("long")))
          .withColumn("width", when(col("len") === 1, lit(1L))
            .otherwise(concat(lit("1"), expr("repeat('0', len - 2)")).cast("long")))
        val ps = s.range(1, 4)
          .select(element_at(array(lit(50L), lit(90L), lit(99L)),
            col("id").cast("int")).as("p"))
        ps.crossJoin(cum)
          .withColumn("r", expr("(n * p + 99) DIV 100"))
          .filter(col("cum") >= col("r"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("p").orderBy(col("len"), col("d2"))))
          .filter(col("rn") === 1)
          .select(col("p"), col("n"),
            (col("lo") + expr("width DIV 2")).as(name))
      }
      estimates(direct, "est_direct")
        .join(estimates(merged, "est_merged").drop("n"), Seq("p"))
        .join(exact, Seq("p"))
        .select(col("p"), col("n"), col("est_direct"), col("est_merged"),
          col("exact_cents"))
        .orderBy("p")
    },

    // ABC (80/15/5) revenue concentration classes over parts — the
    // inventory-analytics rollup: rank parts by revenue, classify by
    // cumulative share with INTEGER cross-multiplied boundaries (cum·100 ≤
    // total·80), roll up per class. The global-order window runs over the
    // per-part AGGREGATE (dimension-sized at any corpus scale — the fact
    // table never sees a global order).
    "q_abc_analysis" -> { (s, dir) =>
      val perPart = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("cents"))
      val wCum = Window.orderBy(col("cents").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      perPart
        .withColumn("cum", sum(col("cents")).over(wCum))
        .withColumn("total", sum(col("cents")).over(wAll))
        .withColumn("cls",
          when(col("cum") * 100 <= col("total") * 80, "A")
            .when(col("cum") * 100 <= col("total") * 95, "B")
            .otherwise("C"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cls_cents"),
          max(col("total")).as("_t"))
        // two-limb exact ×10⁶ quotient: a·10⁶ DIV T = q·1000 + r·1000 DIV T
        // with a·1000 = q·T + r — the single-multiply form overflows Long
        // once class revenue exceeds ~9.2e12 cents (≈ TPC-H sf1); the
        // limbs keep every intermediate ≤ max(a, T)·1000
        .select(col("cls"), col("n_parts"), col("cls_cents"),
          expr("(cls_cents * 1000 DIV _t) * 1000 + " +
            "((cls_cents * 1000) % _t) * 1000 DIV _t").as("share_q6"))
        .orderBy("cls")
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

  /** Integer-weighted order-statistic percentile over a `rk` frame carrying
    * (rn0, n) — the oracle twin of [[Relational.exactPercentilesX100]]'s
    * conditional sum, divided back to value units as ONE double division. */
  private def pctSql(v: String, p: Int): String =
    s"CAST(CAST(sum(CASE WHEN rn0 = ((n-1)*$p)//100 THEN $v*(100-((n-1)*$p)%100) " +
      s"WHEN rn0 = ((n-1)*$p)//100 + 1 THEN $v*(((n-1)*$p)%100) ELSE 0 END) " +
      s"AS BIGINT) AS DOUBLE)/100"

  def oracleSql: Map[String, String] = Map(
    "q_join_enrich" -> ("SELECT c_mktsegment AS segment, count(*) AS cnt, " +
      "round(sum(value), 2) AS sum_value FROM events " +
      "JOIN customer ON user_id = c_custkey GROUP BY 1 ORDER BY 1"),
    "q_topk_users" -> ("SELECT event_type, user_id, cnt, rank FROM (" +
      "SELECT event_type, user_id, count(*) AS cnt, " +
      "row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, user_id ASC) AS rank " +
      "FROM events GROUP BY 1, 2) WHERE rank <= 5 ORDER BY event_type, rank"),
    "q_profile_columns" -> (Seq("event_id", "user_id", "event_type").map(c =>
      s"SELECT '$c' AS col_name, " +
        s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, " +
        s"count(DISTINCT $c) AS n_distinct, " +
        s"CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s " +
        "FROM events").mkString(" UNION ALL ") + " ORDER BY col_name"),
    // same checks, same null-counts-as-violation CASE semantics, same
    // exact composite distinct and distinct-key FK join
    "q_constraint_audit" -> ("WITH rc AS (SELECT count(*) AS n, " +
      "CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT) AS v_range, " +
      "CAST(sum(CASE WHEN l_tax <= 0.05 THEN 0 ELSE 1 END) AS BIGINT) AS v_tax, " +
      "CAST(sum(CASE WHEN l_discount <= 0.08 THEN 0 ELSE 1 END) AS BIGINT) AS v_disc, " +
      "CAST(sum(CASE WHEN l_quantity IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v_comp, " +
      "CAST(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END) AS BIGINT) AS v_dom, " +
      "count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_uniq FROM lineitem), " +
      "fk AS (SELECT count(*) AS n, " +
      "CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v " +
      "FROM (SELECT DISTINCT l_orderkey FROM lineitem) k " +
      "LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON k.l_orderkey = o.o_orderkey), " +
      "u AS (SELECT 'quantity_in_range' AS check_name, n AS n_checked, v_range AS violations FROM rc " +
      "UNION ALL SELECT 'tax_at_most_5pct', n, v_tax FROM rc " +
      "UNION ALL SELECT 'discount_at_most_8pct', n, v_disc FROM rc " +
      "UNION ALL SELECT 'quantity_complete', n, v_comp FROM rc " +
      "UNION ALL SELECT 'returnflag_in_domain', n, v_dom FROM rc " +
      "UNION ALL SELECT 'pk_line_unique', n, v_uniq FROM rc " +
      "UNION ALL SELECT 'fk_orderkey_in_orders', n, v FROM fk) " +
      "SELECT check_name, n_checked, violations, violations = 0 AS passed " +
      "FROM u ORDER BY check_name"),
    "q_revenue_forecast" -> ("SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue " +
      "FROM lineitem WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01' " +
      "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
    "q_ship_priority" -> ("SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate, " +
      "o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < '1997-06-01' " +
      "AND l_shipdate > '1997-06-01' " +
      "GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"),
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
    // same x100 interpolation as the engine's exactPercentilesX100, raw
    // BIGINT form (no /100), then the clamp re-joins the base rows
    "q_winsorized_mean" -> ("WITH base AS (SELECT o_orderpriority AS prio, " +
      "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
      "rk AS (SELECT prio, cents, " +
      "row_number() OVER (PARTITION BY prio ORDER BY cents) - 1 AS rn0, " +
      "count(*) OVER (PARTITION BY prio) AS n FROM base), " +
      "pct AS (SELECT prio, " +
      "CAST(sum(CASE WHEN rn0 = ((n-1)*5)//100 THEN cents*(100-((n-1)*5)%100) " +
      "WHEN rn0 = ((n-1)*5)//100 + 1 THEN cents*(((n-1)*5)%100) ELSE 0 END) AS BIGINT) " +
      "AS p5_x100, " +
      "CAST(sum(CASE WHEN rn0 = ((n-1)*95)//100 THEN cents*(100-((n-1)*95)%100) " +
      "WHEN rn0 = ((n-1)*95)//100 + 1 THEN cents*(((n-1)*95)%100) ELSE 0 END) AS BIGINT) " +
      "AS p95_x100 FROM rk GROUP BY 1) " +
      "SELECT b.prio, count(*) AS n, " +
      "CAST(sum(greatest(least(b.cents * 100, p.p95_x100), p.p5_x100)) AS BIGINT) " +
      "AS winsorized_sum_x100 FROM base b JOIN pct p ON b.prio = p.prio " +
      "GROUP BY 1 ORDER BY 1"),
    // the identical fixed-order Wilson expression tree over exact counts
    "q_wilson_ci" -> ("WITH agg AS (SELECT event_type, count(*) AS n, " +
      "CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS s " +
      "FROM events GROUP BY 1) " +
      "SELECT event_type, n, s, " +
      "((CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 1.96 * 1.96 / (CAST(n AS DOUBLE) * 2.0)) " +
      "/ (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))) - " +
      "(1.96 * sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * " +
      "(1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + " +
      "1.96 * 1.96 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 4.0)) " +
      "/ (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))) AS ci_lo, " +
      "((CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 1.96 * 1.96 / (CAST(n AS DOUBLE) * 2.0)) " +
      "/ (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))) + " +
      "(1.96 * sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * " +
      "(1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + " +
      "1.96 * 1.96 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 4.0)) " +
      "/ (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))) AS ci_hi " +
      "FROM agg ORDER BY event_type"),
    // bin() renders identical binary text in both engines; its length IS
    // floor(log2(cents)) + 1 for the positive cent totals
    "q_log_histogram" -> ("SELECT CAST(length(bin(cents)) AS BIGINT) AS log2_bucket, " +
      "count(*) AS n, min(cents) AS min_cents, max(cents) AS max_cents FROM " +
      "(SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders) " +
      "GROUP BY 1 ORDER BY 1"),
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
    // identical fixed-order float steps over exact BIGINTs (one division
    // for the center, one variance division, one sqrt, one multiply-add)
    "q_control_chart" -> ("WITH d AS (SELECT " +
      "epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, count(*) AS n_d, " +
      "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err_d " +
      "FROM events GROUP BY 1), " +
      "t AS (SELECT CAST(sum(n_d) AS BIGINT) AS nt, " +
      "CAST(sum(err_d) AS BIGINT) AS et FROM d) " +
      "SELECT day, n_d, err_d, " +
      "CAST(et AS DOUBLE) / CAST(nt AS DOUBLE) AS center, " +
      "CAST(et AS DOUBLE) / CAST(nt AS DOUBLE) + CAST(3 AS DOUBLE) * " +
      "sqrt(CAST(et AS DOUBLE) / CAST(nt AS DOUBLE) * " +
      "(CAST(1 AS DOUBLE) - CAST(et AS DOUBLE) / CAST(nt AS DOUBLE)) / " +
      "CAST(n_d AS DOUBLE)) AS ucl, " +
      "CAST(err_d AS DOUBLE) / CAST(n_d AS DOUBLE) AS rate, " +
      "CAST(err_d AS DOUBLE) / CAST(n_d AS DOUBLE) > " +
      "CAST(et AS DOUBLE) / CAST(nt AS DOUBLE) + CAST(3 AS DOUBLE) * " +
      "sqrt(CAST(et AS DOUBLE) / CAST(nt AS DOUBLE) * " +
      "(CAST(1 AS DOUBLE) - CAST(et AS DOUBLE) / CAST(nt AS DOUBLE)) / " +
      "CAST(n_d AS DOUBLE)) AS out_of_control " +
      "FROM d, t ORDER BY day"),
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
    "q_fd_violations" -> ("WITH f1 AS (SELECT event_id AS l, " +
      "count(DISTINCT user_id) AS nd FROM events GROUP BY 1), " +
      "f2 AS (SELECT user_id AS l, count(DISTINCT event_type) AS nd " +
      "FROM events GROUP BY 1), " +
      "f3 AS (SELECT e.user_id AS l, count(DISTINCT c_mktsegment) AS nd " +
      "FROM events e JOIN customer ON c_custkey = e.user_id GROUP BY 1) " +
      "SELECT * FROM (" +
      "SELECT 'event_id->user_id' AS fd, count(*) AS n_groups, " +
      "CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating, " +
      "CAST(max(nd) AS BIGINT) AS max_rhs FROM f1 " +
      "UNION ALL SELECT 'user_id->event_type', count(*), " +
      "CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT), " +
      "CAST(max(nd) AS BIGINT) FROM f2 " +
      "UNION ALL SELECT 'user_id->c_mktsegment', count(*), " +
      "CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT), " +
      "CAST(max(nd) AS BIGINT) FROM f3) ORDER BY fd"),
    // the explicit half-open [valid_from, valid_to) SCD2 interval join —
    // provably the engine's as-of lookup on the deduped change frame
    "q_scd2_lookup" -> ("WITH seq AS (SELECT user_id, ts, event_id, event_type, " +
      "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
      "FROM events WHERE event_type != 'error'), " +
      "chg AS (SELECT user_id, ts, arg_max(event_type, event_id) AS state FROM seq " +
      "WHERE prev_type IS NULL OR prev_type != event_type GROUP BY 1, 2), " +
      "scd AS (SELECT user_id, state, ts AS valid_from, " +
      "lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to FROM chg), " +
      "err AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') " +
      "SELECT coalesce(s.state, 'none') AS state, count(*) AS n_errors " +
      "FROM err e LEFT JOIN scd s ON e.user_id = s.user_id " +
      "AND e.ts >= s.valid_from AND (s.valid_to IS NULL OR e.ts < s.valid_to) " +
      "GROUP BY 1 ORDER BY 1"),
    "q_debounce" -> ("WITH seq AS (SELECT event_type, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) AS us, " +
      "lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER " +
      "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_us " +
      "FROM events) " +
      "SELECT event_type, n_events, n_kept, " +
      "(n_events - n_kept) * 1000000 // n_events AS drop_q6 FROM " +
      "(SELECT event_type, count(*) AS n_events, " +
      "CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 5000000 " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS n_kept FROM seq GROUP BY 1) ORDER BY 1"),
    "q_apdex" -> ("SELECT event_type, count(*) AS total, " +
      "CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS satisfied, " +
      "CAST(sum(CASE WHEN value > 50 AND value <= 200 THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS tolerating, " +
      "(CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 + " +
      "CAST(sum(CASE WHEN value > 50 AND value <= 200 THEN 1 ELSE 0 END) AS BIGINT) " +
      "* 500000) // count(*) AS apdex_q6 " +
      "FROM events GROUP BY 1 ORDER BY 1"),
    // same folded z² literal (decimal→DOUBLE cast is correctly rounded),
    // same fixed-order float tree over the exact cells
    "q_power_analysis" -> {
      val z2 = { val s0 = 1.959963984540054 + 0.8416212335729143; s0 * s0 }
      "WITH per AS (SELECT user_id % 2 AS variant, " +
        "max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) " +
        "AS converted FROM events GROUP BY user_id), " +
        "cells AS (SELECT " +
        "CAST(sum(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(sum(CASE WHEN variant = 0 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
        "CAST(sum(CASE WHEN variant = 1 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d " +
        "FROM per), " +
        "p AS (SELECT a + b AS n1, c + d AS n2, " +
        "CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) AS p1, " +
        "CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE) AS p2 FROM cells), " +
        s"f AS (SELECT n1, n2, p1, p2, CAST(ceil(CAST($z2 AS DOUBLE) * " +
        "(p1 * (CAST(1 AS DOUBLE) - p1) + p2 * (CAST(1 AS DOUBLE) - p2)) / " +
        "((p1 - p2) * (p1 - p2))) AS BIGINT) AS needed_per_arm FROM p) " +
        "SELECT n1, n2, p1, p2, needed_per_arm, " +
        "n1 >= needed_per_arm AND n2 >= needed_per_arm AS powered FROM f"
    },
    // the identical fixed-order double expression over four exact BIGINTs
    "q_ab_contingency" -> ("WITH per AS (SELECT user_id % 2 AS variant, " +
      "max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) " +
      "AS converted FROM events GROUP BY user_id), " +
      "cells AS (SELECT " +
      "CAST(sum(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
      "CAST(sum(CASE WHEN variant = 0 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
      "CAST(sum(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
      "CAST(sum(CASE WHEN variant = 1 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d " +
      "FROM per) " +
      "SELECT a, b, c, d, " +
      "CAST(a*d - b*c AS DOUBLE) * CAST(a*d - b*c AS DOUBLE) * " +
      "CAST(a + b + c + d AS DOUBLE) / " +
      "(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) * " +
      "CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)) AS chi2 FROM cells"),
    // lockstep unnest fan-out; identical two-limb quotients and the same
    // two truncation points ((n_b²−ssq)·10⁶//n_b, then //N)
    "q_gini_split" -> ("WITH f AS (SELECT event_type, " +
      "unnest(['hour', 'dow', 'value_band', 'k_band']) AS feature, " +
      "unnest([CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT), " +
      "(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 7, " +
      "least(CAST(floor(value / 50) AS BIGINT), 9), " +
      "json_extract_string(props, '$.k')::BIGINT // 10]) AS bucket FROM events), " +
      "cc AS (SELECT feature, bucket, event_type, count(*) AS c " +
      "FROM f GROUP BY 1, 2, 3), " +
      "b AS (SELECT feature, bucket, CAST(sum(c) AS BIGINT) AS nb, " +
      "CAST(sum(c * c) AS BIGINT) AS ssq FROM cc GROUP BY 1, 2), " +
      "pf AS (SELECT feature, CAST(sum(nb) AS BIGINT) AS n, " +
      "CAST(sum(((nb * nb - ssq) * 1000 // nb) * 1000 + " +
      "(((nb * nb - ssq) * 1000) % nb) * 1000 // nb) AS BIGINT) AS wsum_q6 " +
      "FROM b GROUP BY 1), " +
      "pc AS (SELECT CAST(sum(c) AS BIGINT) AS pn, " +
      "CAST(sum(c * c) AS BIGINT) AS pssq " +
      "FROM (SELECT count(*) AS c FROM events GROUP BY event_type)), " +
      "p AS (SELECT ((pn * pn - pssq) * 1000 // pn) * 1000 + " +
      "(((pn * pn - pssq) * 1000) % pn) * 1000 // pn AS pq6x, pn FROM pc) " +
      "SELECT feature, n, pq6x // pn AS parent_gini_q6, " +
      "wsum_q6 // n AS child_gini_q6, " +
      "pq6x // pn - wsum_q6 // n AS gain_q6 " +
      "FROM pf, p ORDER BY feature"),
    "q_weighted_median" -> ("WITH li AS (SELECT l_returnflag, " +
      "CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents, " +
      "CAST(l_quantity AS BIGINT) AS qty, l_orderkey, l_linenumber FROM lineitem), " +
      "c AS (SELECT l_returnflag, cents, " +
      "sum(qty) OVER (PARTITION BY l_returnflag ORDER BY cents, l_orderkey, l_linenumber " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw, " +
      "sum(qty) OVER (PARTITION BY l_returnflag) AS totw FROM li) " +
      "SELECT l_returnflag, CAST(max(totw) AS BIGINT) AS tot_qty, " +
      "min(cents) AS wmedian_cents FROM c WHERE cumw * 2 >= totw " +
      "GROUP BY 1 ORDER BY 1"),
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
    // quantile_cont is the interpolating twin of Spark's exact percentile
    "q_anomaly_mad" -> ("WITH daily AS (SELECT event_type, " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, round(sum(value), 2) AS daily " +
      "FROM events GROUP BY 1, 2), " +
      "st AS (SELECT event_type, quantile_cont(daily, 0.5) AS med FROM daily GROUP BY 1), " +
      "j AS (SELECT d.event_type, d.day, d.daily, st.med, " +
      "abs(d.daily - st.med) AS ad FROM daily d JOIN st USING (event_type)), " +
      "m AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM j GROUP BY 1) " +
      "SELECT j.event_type, strftime(j.day, '%Y-%m-%d') AS day, j.daily, " +
      "round(j.med, 6) AS med, round(m.mad, 6) AS mad, " +
      "j.ad > 3 * m.mad AS is_anomaly " +
      "FROM j JOIN m USING (event_type) ORDER BY 1, 2"),
    "q_priority_with_returns" -> ("SELECT o_orderpriority, count(*) AS cnt FROM orders " +
      "WHERE EXISTS (SELECT 1 FROM lineitem " +
      "WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') " +
      "GROUP BY 1 ORDER BY 1"),
    "q_user_running_total" -> ("WITH daily AS (SELECT user_id, " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS cnt " +
      "FROM events GROUP BY 1, 2) " +
      "SELECT user_id, strftime(day, '%Y-%m-%d') AS day, cnt, " +
      "CAST(sum(cnt) OVER (PARTITION BY user_id ORDER BY day " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running " +
      "FROM daily ORDER BY user_id, day"),
    "q_pivot_types" -> ("SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day, " +
      Seq("click", "error", "purchase", "signup", "view").map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
        .mkString(", ") +
      " FROM events GROUP BY 1 ORDER BY 1"),
    "q_distinct_users" -> ("SELECT event_type, count(DISTINCT user_id) AS distinct_users " +
      "FROM events GROUP BY 1 ORDER BY 1"),
    // identical 60-bit hashes, identical k-th-minimum, identical one-division
    // estimator — the approximate COUNT is itself hash-checked
    "q_distinct_kmv" -> ("WITH d AS (SELECT DISTINCT event_type, " +
      "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h FROM events), " +
      "r AS (SELECT event_type, h, row_number() OVER " +
      "(PARTITION BY event_type ORDER BY h) AS rn FROM d), " +
      "g AS (SELECT event_type, count(*) AS n_kept, max(h) AS h_k " +
      "FROM r WHERE rn <= 64 GROUP BY 1) " +
      "SELECT event_type, n_kept, h_k, " +
      "CASE WHEN n_kept < 64 THEN n_kept " +
      s"ELSE CAST(floor(${63.0 * math.pow(2, 60)} / h_k) AS BIGINT) END AS est_distinct " +
      "FROM g ORDER BY 1"),
    // the DIRECT bottom-k over the raw union — the merged sketches must
    // land on the identical h_k and estimate (mergeability is exact)
    "q_kmv_union" -> ("WITH d AS (SELECT DISTINCT " +
      "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h " +
      "FROM events WHERE event_type IN ('click', 'error')), " +
      "r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM d), " +
      "g AS (SELECT count(*) AS n_kept, max(h) AS h_k FROM r WHERE rn <= 64) " +
      "SELECT n_kept, h_k, CASE WHEN n_kept < 64 THEN n_kept " +
      s"ELSE CAST(floor(${63.0 * math.pow(2, 60)} / h_k) AS BIGINT) END AS est_distinct " +
      "FROM g"),
    // identical sketches, identical θ = min of the two k-th minimums
    // (or M for an exact set), identical retained count and one-division
    // estimator — the theta-sketch INTERSECTION estimate is hash-checked
    "q_kmv_intersect" -> ("WITH d AS (SELECT DISTINCT event_type AS s, " +
      "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h " +
      "FROM events WHERE event_type IN ('click', 'error')), " +
      "r AS (SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rn FROM d), " +
      "sk AS (SELECT s, h FROM r WHERE rn <= 64), " +
      "t AS (SELECT min(CASE WHEN n < 64 THEN 1152921504606846976 ELSE h_k END) AS theta " +
      "FROM (SELECT s, count(*) AS n, max(h) AS h_k FROM sk GROUP BY 1)), " +
      "i AS (SELECT count(*) AS n_retained " +
      "FROM (SELECT h FROM sk WHERE s = 'click') a " +
      "JOIN (SELECT h FROM sk WHERE s = 'error') b USING (h) " +
      "CROSS JOIN t WHERE h < t.theta) " +
      "SELECT i.n_retained, t.theta, " +
      "CAST(floor(i.n_retained * 1152921504606846976.0 / t.theta) AS BIGINT) " +
      "AS est_intersect FROM i CROSS JOIN t"),
    "q_cube_labels" -> ("SELECT coalesce(event_type, '<all>') AS event_type, " +
      "coalesce(CAST(json_extract_string(props, '$.k') IS NOT NULL AS VARCHAR), '<all>') AS has_k, " +
      "count(*) AS cnt FROM events " +
      "GROUP BY CUBE (event_type, json_extract_string(props, '$.k') IS NOT NULL) " +
      "ORDER BY 1, 2"),
    "q_rollup_revenue" -> ("SELECT coalesce(r_name, '<all>') AS region, " +
      "coalesce(n_name, '<all>') AS nation, " +
      "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "GROUP BY ROLLUP (r_name, n_name) ORDER BY 1, 2"),
    "q_pricing_summary" -> ("SELECT l_returnflag, l_linestatus, " +
      "round(sum(l_quantity), 2) AS sum_qty, " +
      "round(sum(l_extendedprice), 2) AS sum_base_price, " +
      "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
      "round(avg(l_quantity), 6) AS avg_qty, " +
      "count(*) AS count_order FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_revenue_by_nation" -> ("SELECT n_name AS nation, " +
      "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' GROUP BY 1 ORDER BY 1"),
    "q_users_click_not_error" -> ("SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day " +
      "FROM events WHERE event_type = 'click' " +
      "EXCEPT SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day " +
      "FROM events WHERE event_type = 'error' ORDER BY user_id, day"),
    "q_orders_by_month" -> ("SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month, " +
      "count(*) AS cnt, round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1 ORDER BY 1"),
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
    // bucket_lo cast: DuckDB BIGINT * decimal-literal yields DECIMAL where
    // Spark yields DOUBLE
    "q_histogram" -> ("SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket, " +
      "CAST(CAST(floor(value / 25.0) AS BIGINT) * 25.0 AS DOUBLE) AS bucket_lo, count(*) AS cnt " +
      "FROM events GROUP BY 1 ORDER BY 1"),
    // scalar subqueries for the bounds: DuckDB generate_series cannot take
    // lateral column parameters
    "q_gapfill" -> ("WITH b AS (SELECT event_type, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))/600)*600 AS BIGINT) AS bucket, count(*) AS cnt " +
      "FROM events GROUP BY 1, 2), " +
      "spine AS (SELECT event_type, unnest(generate_series(lo, hi, 600)) AS bucket " +
      "FROM (SELECT DISTINCT event_type FROM b) CROSS JOIN " +
      "(SELECT min(bucket) AS lo, max(bucket) AS hi FROM b)) " +
      "SELECT s.event_type, s.bucket, coalesce(b.cnt, 0) AS cnt FROM spine s " +
      "LEFT JOIN b ON s.event_type = b.event_type AND s.bucket = b.bucket " +
      "ORDER BY 1, 2"),
    // per-cohort profiles recomputed column-by-column, identical ratio
    // quantization and stability flags
    "q_schema_drift" -> {
      def side(where: String) = Seq("event_type", "user_id", "props").map(c =>
        s"SELECT '$c' AS col_name, " +
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, " +
          s"count(DISTINCT $c) AS nd, " +
          s"CAST(min($c) AS VARCHAR) AS mn, CAST(max($c) AS VARCHAR) AS mx " +
          s"FROM events WHERE $where").mkString(" UNION ALL ")
      s"WITH ref AS (${side("ts < '2024-01-16'")}), " +
        s"cur AS (${side("ts >= '2024-01-16'")}) " +
        "SELECT col_name, r.n_null AS n_null_ref, c.n_null AS n_null_cur, " +
        "r.nd AS n_distinct_ref, c.nd AS n_distinct_cur, " +
        "CAST(floor(c.nd * 1000000.0 / r.nd) AS BIGINT) AS distinct_ratio_q6, " +
        "(r.mn = c.mn AND r.mx = c.mx) AS minmax_stable " +
        "FROM ref r JOIN cur c USING (col_name) ORDER BY col_name"
    },
    // same one-pass conditional histogram, same integer numerators with
    // one final IEEE division — the TVD row is hash-checked, not banded
    "q_dist_drift" -> ("WITH b AS (SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket, " +
      "CAST(sum(CASE WHEN o_orderdate < '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_ref, " +
      "CAST(sum(CASE WHEN o_orderdate < '1996-01-01' THEN 0 ELSE 1 END) AS BIGINT) AS cnt_cur " +
      "FROM orders GROUP BY 1), " +
      "t AS (SELECT CAST(sum(cnt_ref) AS BIGINT) AS na, CAST(sum(cnt_cur) AS BIGINT) AS nb FROM b) " +
      "SELECT bucket, cnt_ref, cnt_cur, " +
      "CAST(floor(cnt_ref * 1000000.0 / na) AS BIGINT) AS freq_ref_q6, " +
      "CAST(floor(cnt_cur * 1000000.0 / nb) AS BIGINT) AS freq_cur_q6, " +
      "CAST(floor(abs(cnt_ref * nb - cnt_cur * na) * 1000000.0 / (na * nb)) AS BIGINT) AS dev_q6 " +
      "FROM b CROSS JOIN t " +
      "UNION ALL " +
      "SELECT -1, na, nb, 1000000, 1000000, " +
      "CAST(floor(CAST(sum(abs(cnt_ref * nb - cnt_cur * na)) AS DOUBLE) * 1000000.0 " +
      "/ (2.0 * na * nb)) AS BIGINT) " +
      "FROM b CROSS JOIN t GROUP BY na, nb " +
      "ORDER BY bucket"),
    "q_latest_event" -> ("SELECT user_id, arg_max(event_type, event_id) AS last_type, " +
      "max(event_id) AS last_event_id, count(*) AS n_events " +
      "FROM events GROUP BY 1 ORDER BY 1"),
    // arg_max per key over the synthesized op log, tombstones dropped
    "q_cdc_merge" -> ("WITH log AS (SELECT user_id, event_id, " +
      "CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op, event_type FROM events) " +
      "SELECT user_id, max(event_id) AS ver, " +
      "arg_max(event_type, event_id) AS state FROM log GROUP BY user_id " +
      "HAVING arg_max(op, event_id) != 'D' ORDER BY user_id"),
    // FULL JOIN is the oracle's natural spelling of the engine's
    // tag-union + key-agg (same per-key classification, same rollup)
    "q_snapshot_diff" -> ("WITH oldsnap AS (SELECT o_orderkey AS k, " +
      "CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders WHERE o_orderkey % 7 != 0), " +
      "newsnap AS (SELECT o_orderkey AS k, " +
      "CAST(floor(o_totalprice * 100) AS BIGINT) + " +
      "CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS v " +
      "FROM orders WHERE o_orderkey % 5 != 0), " +
      "d AS (SELECT coalesce(o.k, n.k) AS k, o.v AS ov, n.v AS nv, " +
      "CASE WHEN o.k IS NULL THEN 'added' WHEN n.k IS NULL THEN 'removed' " +
      "WHEN o.v IS DISTINCT FROM n.v THEN 'changed' ELSE 'unchanged' END AS change " +
      "FROM oldsnap o FULL JOIN newsnap n ON o.k = n.k) " +
      "SELECT change, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum, " +
      "CAST(sum(CASE WHEN change = 'changed' THEN nv - ov ELSE 0 END) AS BIGINT) " +
      "AS delta_cents FROM d GROUP BY 1 ORDER BY 1"),
    // identical change-collapse + interval windows; epoch-floor seconds
    "q_scd2_build" -> ("WITH seq AS (SELECT user_id, ts, event_id, event_type, " +
      "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
      "FROM events), " +
      "chg AS (SELECT user_id, ts, event_id, event_type FROM seq " +
      "WHERE prev_type IS NULL OR prev_type != event_type), " +
      "iv AS (SELECT user_id, event_type AS state, ts, " +
      "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts FROM chg) " +
      "SELECT user_id, state, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS valid_from, " +
      "coalesce(CAST(floor(epoch(CAST(next_ts AS TIMESTAMP))) AS BIGINT), -1) AS valid_to, " +
      "next_ts IS NULL AS is_current " +
      "FROM iv ORDER BY user_id, valid_from, state"),
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
    "q_promo_revenue" -> ("SELECT " +
      "round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2) AS promo_rev, " +
      "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'"),
    "q_supplier_balance" -> ("SELECT r_name AS region, n_name AS nation, " +
      "count(*) AS suppliers, round(sum(s_acctbal), 2) AS total_bal " +
      "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_users_click_and_error" -> ("SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day " +
      "FROM events WHERE event_type = 'click' INTERSECT " +
      "SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day " +
      "FROM events WHERE event_type = 'error' ORDER BY user_id, day"),
    "q_ntile" -> ("SELECT event_type, event_id, ntile(4) OVER (" +
      "PARTITION BY event_type ORDER BY value, event_id) AS quartile " +
      "FROM events ORDER BY 1, 2"),
    // BIGINT casts: DuckDB sum()→HUGEINT→pandas float64 hash artifact —
    // without them the unpivoted cnt hashes as 5.0 vs Spark's 5
    "q_unpivot" -> ("WITH p AS (SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day, " +
      Seq("click", "error", "purchase", "signup", "view").map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t").mkString(", ") +
      " FROM events GROUP BY 1) " +
      "SELECT day, event_type, cnt FROM p " +
      "UNPIVOT (cnt FOR event_type IN (click, error, purchase, signup, view)) " +
      "ORDER BY day, event_type"),
    "q_user_sequences" -> ("SELECT user_id, " +
      "strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day, " +
      "string_agg(event_type, '>' ORDER BY ts, event_id) AS seq, " +
      "count(*) AS n_events FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_quantiles" -> ("SELECT event_type, i - 1 AS q_idx, qs[i] AS q FROM " +
      "(SELECT event_type, quantile_cont(floor(value * 1000), [0.25, 0.5, 0.75]) AS qs " +
      "FROM events GROUP BY 1) CROSS JOIN generate_series(1, 3) AS g(i) " +
      "ORDER BY 1, 2"),
    // BIGINT casts keep the moment arithmetic in int64 (DuckDB sums promote
    // to HUGEINT); every moment is exact, so the scalar formula matches
    // Spark's bit-for-bit
    "q_corr_stats" -> ("WITH m AS (SELECT event_type, count(*) AS n, " +
      "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
      "CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx, " +
      "CAST(sum(y*y) AS BIGINT) AS syy FROM (SELECT event_type, " +
      "CAST(floor(value * 10) AS BIGINT) AS x, CAST(length(props) AS BIGINT) AS y " +
      "FROM events) GROUP BY 1) " +
      "SELECT event_type, n, CAST(n*sxy - sx*sy AS DOUBLE) / " +
      "(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr " +
      "FROM m ORDER BY 1"),
    // oracle is the PLAIN single-phase GROUP BY — the salted two-phase
    // engine plan must produce the identical answer
    "q_salted_agg" -> ("SELECT event_type, " +
      "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_q3, " +
      "count(*) AS count_rows FROM events GROUP BY 1 ORDER BY 1"),
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
    "q_srm_check" -> ("WITH u AS (SELECT user_id, count(*) AS cnt " +
      "FROM events GROUP BY 1), " +
      "cells AS (SELECT " +
      "CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na, " +
      "CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb FROM u) " +
      "SELECT na, nb, CAST((na - nb) * (na - nb) AS DOUBLE) / " +
      "CAST(na + nb AS DOUBLE) AS chi2, " +
      "CAST((na - nb) * (na - nb) AS DOUBLE) / CAST(na + nb AS DOUBLE) > 3.841 " +
      "AS mismatch FROM cells"),
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
    // same value-space ×2 tie-averaged ranks + integer moments
    "q_spearman" -> ("WITH base AS (SELECT n_chars AS x, " +
      s"CAST(len(${TextQueries.Toks}) AS BIGINT) AS y FROM documents), " +
      "vx AS (SELECT x, count(*) AS cnt FROM base GROUP BY 1), " +
      "rx AS (SELECT x, 2 * coalesce(CAST(sum(cnt) OVER (ORDER BY x " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) + cnt + 1 " +
      "AS rx FROM vx), " +
      "vy AS (SELECT y, count(*) AS cnt FROM base GROUP BY 1), " +
      "ry AS (SELECT y, 2 * coalesce(CAST(sum(cnt) OVER (ORDER BY y " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) + cnt + 1 " +
      "AS ry FROM vy), " +
      "j AS (SELECT rx, ry FROM base JOIN rx USING (x) JOIN ry USING (y)), " +
      // HUGEINT products + DECIMAL(38,0) sums mirror the engine's decimal
      // lane (exact to 10^38); rho combines one correctly-rounded double
      // cast per moment in the identical expression order
      "m AS (SELECT count(*) AS n, CAST(sum(rx) AS DECIMAL(38,0)) AS sx, " +
      "CAST(sum(ry) AS DECIMAL(38,0)) AS sy, " +
      "CAST(sum(CAST(rx AS HUGEINT) * ry) AS DECIMAL(38,0)) AS sxy, " +
      "CAST(sum(CAST(rx AS HUGEINT) * rx) AS DECIMAL(38,0)) AS sxx, " +
      "CAST(sum(CAST(ry AS HUGEINT) * ry) AS DECIMAL(38,0)) AS syy FROM j) " +
      "SELECT n, sx, sy, sxy, sxx, syy, " +
      "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) " +
      "AS rho FROM m"),
    // month-grid pair concordance; one division for tau
    "q_kendall_tau" -> ("WITH m AS (SELECT " +
      "CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS BIGINT) AS x, " +
      "CAST(sum(floor(o_totalprice * 100)) AS BIGINT) AS r, count(*) AS c " +
      "FROM orders GROUP BY 1), " +
      "p AS (SELECT (b.r - a.r) * (b.c - a.c) AS sgn FROM m a JOIN m b ON a.x < b.x), " +
      "agg AS (SELECT CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant, " +
      "CAST(sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant, " +
      "CAST(sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties FROM p) " +
      "SELECT concordant, discordant, ties, " +
      "CAST(concordant - discordant AS DOUBLE) / " +
      "CAST(concordant + discordant + ties AS DOUBLE) AS tau_a FROM agg"),
    "q_type_concentration" -> ("WITH c AS (SELECT user_id, event_type, " +
      "count(*) AS c FROM events GROUP BY 1, 2) " +
      "SELECT user_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_types, " +
      "CAST(sum(c * c) AS BIGINT) * 1000000 " +
      "// (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)) AS conc_q6 " +
      "FROM c GROUP BY 1 ORDER BY 1"),
    // same per-user conversion cells; all directions cross-multiplied
    "q_simpson_check" -> ("WITH pu AS (SELECT e.user_id, c_mktsegment AS segment, " +
      "CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv " +
      "FROM events e JOIN customer ON c_custkey = e.user_id GROUP BY 1, 2), " +
      "cells AS (SELECT segment, " +
      "CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na, " +
      "CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS sa, " +
      "CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb, " +
      "CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS sb " +
      "FROM pu GROUP BY 1), " +
      "p AS (SELECT *, sum(sa) OVER () * sum(nb) OVER () > " +
      "sum(sb) OVER () * sum(na) OVER () AS pooled_a_gt_b FROM cells) " +
      "SELECT segment, na, sa, nb, sb, sa * nb > sb * na AS a_gt_b, pooled_a_gt_b, " +
      "(sa * nb > sb * na) != pooled_a_gt_b AS reversed FROM p ORDER BY segment"),
    // month-grain pair frame; the float slope sort is one correctly-
    // rounded division per pair, ties broken by the exact pair coords
    "q_theil_sen" -> ("WITH m AS (SELECT " +
      "CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS BIGINT) AS x, " +
      "CAST(sum(floor(o_totalprice * 100)) AS BIGINT) AS y FROM orders GROUP BY 1), " +
      "pr AS (SELECT a.x AS x1, b.x AS x2, b.y - a.y AS dy, b.x - a.x AS dx, " +
      "CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope " +
      "FROM m a JOIN m b ON a.x < b.x), " +
      "rk AS (SELECT *, CAST(row_number() OVER (ORDER BY slope, x1, x2) AS BIGINT) AS r, " +
      "count(*) OVER () AS n_pairs FROM pr) " +
      "SELECT n_pairs, x1, x2, dy, dx, slope FROM rk WHERE r = (n_pairs + 1) // 2"),
    // the single-window pooled index IS the semantics the range-partitioned
    // numbering reproduces; the midpoint-rule index join is explicit
    "q_quantile_normalize" -> ("WITH ev AS (SELECT event_id, event_type, " +
      "CAST(floor(value * 100) AS BIGINT) AS cents FROM events), " +
      "rk AS (SELECT event_id, event_type, cents, " +
      "CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS BIGINT) AS r, " +
      "count(*) OVER (PARTITION BY event_type) AS ng FROM ev), " +
      "pl AS (SELECT cents AS norm_cents, " +
      "row_number() OVER (ORDER BY cents, event_id) - 1 AS idx0 FROM ev), " +
      "tot AS (SELECT count(*) AS nn FROM ev) " +
      "SELECT event_id, event_type, cents, norm_cents FROM rk, tot " +
      "JOIN pl ON ((2 * r - 1) * nn) // (2 * ng) = idx0 ORDER BY event_id"),
    // score-space running negatives; every tie pair contributes exactly 1
    "q_rank_auc" -> ("WITH s AS (SELECT CAST(floor(value * 100) AS BIGINT) AS score, " +
      "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos, " +
      "CAST(sum(CASE WHEN event_type != 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_neg " +
      "FROM events GROUP BY 1), " +
      "r AS (SELECT n_pos, n_neg, coalesce(CAST(sum(n_neg) OVER (ORDER BY score " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_neg FROM s) " +
      "SELECT CAST(sum(n_pos) AS BIGINT) AS pos, CAST(sum(n_neg) AS BIGINT) AS neg, " +
      "CAST(sum(n_pos * (cum_neg * 2 + n_neg)) AS BIGINT) AS u_x2, " +
      "CAST(sum(n_pos * (cum_neg * 2 + n_neg)) AS BIGINT) * 500000 " +
      "// (CAST(sum(n_pos) AS BIGINT) * CAST(sum(n_neg) AS BIGINT)) AS auc_q6 " +
      "FROM r"),
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
    "q_fano_factor" -> ("WITH d AS (SELECT event_type, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day, " +
      "count(*) AS c FROM events GROUP BY 1, 2), " +
      "m AS (SELECT event_type, count(*) AS n_days, CAST(sum(c) AS BIGINT) AS sc, " +
      "CAST(sum(c * c) AS BIGINT) AS scc FROM d GROUP BY 1) " +
      "SELECT event_type, n_days, sc, scc, " +
      "CAST(n_days * scc - sc * sc AS DOUBLE) / CAST(n_days * sc AS DOUBLE) AS fano " +
      "FROM m ORDER BY event_type"),
    // same exact lower-median sign rule + lag-flip run counting; the z is
    // the identical fixed-order float chain
    "q_runs_test" -> ("WITH d AS (SELECT " +
      "CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS day, " +
      "CAST(sum(floor(o_totalprice * 100)) AS BIGINT) AS cents FROM orders GROUP BY 1), " +
      "r AS (SELECT day, CAST(row_number() OVER (ORDER BY cents, day) AS BIGINT) AS rk, " +
      "count(*) OVER () AS n FROM d), " +
      "sgn AS (SELECT day, rk * 2 > n + 1 AS above FROM r), " +
      "f AS (SELECT above, CASE WHEN lag(above) OVER (ORDER BY day) IS NULL " +
      "OR lag(above) OVER (ORDER BY day) != above THEN 1 ELSE 0 END AS flip FROM sgn), " +
      "agg AS (SELECT CAST(sum(flip) AS BIGINT) AS runs, " +
      "CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
      "CAST(sum(CASE WHEN NOT above THEN 1 ELSE 0 END) AS BIGINT) AS n2 FROM f) " +
      "SELECT runs, n1, n2, " +
      "(CAST(runs AS DOUBLE) - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / " +
      "(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0)) / " +
      "sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * " +
      "(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) - CAST(n1 AS DOUBLE) - " +
      "CAST(n2 AS DOUBLE)) / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * " +
      "(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * (CAST(n1 AS DOUBLE) + " +
      "CAST(n2 AS DOUBLE) - 1.0))) AS z FROM agg"),
    // same value-space cumulative grid; D numerator exact, one float
    // division + the fixed-order critical-value compare
    "q_ks_test" -> ("WITH v AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents, " +
      "CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca, " +
      "CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb " +
      "FROM events GROUP BY 1), " +
      "c AS (SELECT CAST(sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) " +
      "AS cum_a, CAST(sum(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) " +
      "AS cum_b, CAST(sum(ca) OVER () AS BIGINT) AS ta, " +
      "CAST(sum(cb) OVER () AS BIGINT) AS tb FROM v), " +
      "agg AS (SELECT max(ta) AS na, max(tb) AS nb, " +
      "max(abs(cum_a * tb - cum_b * ta)) AS d_num FROM c) " +
      "SELECT na, nb, d_num, CAST(d_num AS DOUBLE) / " +
      "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS d_stat, " +
      "CAST(d_num AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) > " +
      "1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) / " +
      "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS reject_05 FROM agg"),
    // dense grid, window marginals, fixed-order fold over the sorted cells
    "q_cramers_v" -> ("WITH cells AS (SELECT event_type, c_mktsegment AS segment, " +
      "CAST(count(*) AS BIGINT) AS o FROM events " +
      "JOIN customer ON c_custkey = user_id GROUP BY 1, 2), " +
      "grid AS (SELECT t.event_type, s.segment, coalesce(cells.o, 0) AS o FROM " +
      "(SELECT DISTINCT event_type FROM cells) t CROSS JOIN " +
      "(SELECT DISTINCT segment FROM cells) s " +
      "LEFT JOIN cells ON cells.event_type = t.event_type AND cells.segment = s.segment), " +
      "m AS (SELECT event_type, segment, o, " +
      "CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS r, " +
      "CAST(sum(o) OVER (PARTITION BY segment) AS BIGINT) AS c, " +
      "CAST(sum(o) OVER () AS BIGINT) AS nn FROM grid), " +
      "f AS (SELECT max(nn) AS n, count(DISTINCT event_type) AS n_types, " +
      "count(DISTINCT segment) AS n_segs, " +
      "list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
      "list_sort(list(struct_pack(event_type := event_type, segment := segment, " +
      "o := o, r := r, c := c, nn := nn))), " +
      "e -> CAST(e.o * e.nn - e.r * e.c AS DOUBLE) * " +
      "CAST(e.o * e.nn - e.r * e.c AS DOUBLE) / " +
      "(CAST(e.nn AS DOUBLE) * CAST(e.r AS DOUBLE) * CAST(e.c AS DOUBLE)))), " +
      "(a, b) -> a + b) AS chi2 FROM m) " +
      "SELECT n, n_types, n_segs, chi2, " +
      "sqrt(chi2 / (CAST(n AS DOUBLE) * " +
      "CAST(least(n_types, n_segs) - 1 AS DOUBLE))) AS v FROM f"),
    // single-window rank spelling of the engine's range-partitioned
    // numbering; identical decile and share arithmetic
    "q_lorenz_curve" -> ("WITH pc AS (SELECT o_custkey, " +
      "CAST(sum(floor(o_totalprice * 100)) AS BIGINT) AS cents FROM orders GROUP BY 1), " +
      "rk AS (SELECT cents, " +
      "row_number() OVER (ORDER BY cents, o_custkey) - 1 AS rn FROM pc), " +
      "tot AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS tot_cents FROM pc), " +
      "dec AS (SELECT rn * 10 // n AS decile, count(*) AS n_cust, " +
      "CAST(sum(cents) AS BIGINT) AS cents, max(tot_cents) AS tot_cents " +
      "FROM rk, tot GROUP BY 1), " +
      "cum AS (SELECT *, CAST(sum(cents) OVER (ORDER BY decile " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents FROM dec) " +
      "SELECT decile, n_cust, cents, cents * 1000000 // tot_cents AS share_q6, " +
      "cum_cents * 1000000 // tot_cents AS cum_share_q6 FROM cum ORDER BY decile"),
    "q_effective_sample_size" -> ("SELECT count(*) AS n, " +
      "CAST(sum(n_chars) AS BIGINT) AS sum_w, " +
      "CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_w2, " +
      "CAST(CAST(sum(n_chars) AS BIGINT) * CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / " +
      "CAST(CAST(sum(n_chars * n_chars) AS BIGINT) AS DOUBLE) AS ess FROM documents"),
    // same day-grain frame; the survival product recurses in day order
    // with the identical per-step float tree
    "q_kaplan_meier" -> ("WITH RECURSIVE u AS (SELECT user_id, " +
      "CAST(count(DISTINCT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)) " +
      "AS BIGINT) AS day FROM events GROUP BY 1), " +
      "byday AS (SELECT day, count(*) AS d FROM u GROUP BY 1), " +
      "risk AS (SELECT day, d, CAST(sum(d) OVER (ORDER BY day DESC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n, " +
      "row_number() OVER (ORDER BY day) AS rn FROM byday), " +
      "rec(rn, day, d, n, s) AS (" +
      "SELECT rn, day, d, n, 1.0::DOUBLE * (1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE)) " +
      "FROM risk WHERE rn = 1 " +
      "UNION ALL SELECT risk.rn, risk.day, risk.d, risk.n, " +
      "rec.s * (1.0 - CAST(risk.d AS DOUBLE) / CAST(risk.n AS DOUBLE)) " +
      "FROM risk JOIN rec ON risk.rn = rec.rn + 1) " +
      "SELECT day AS lifetime_days, d AS n_churn, n AS n_risk, s AS survival " +
      "FROM rec ORDER BY lifetime_days"),
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
    // rank fns ordered by cnt alone depend on key values only (tie-sharing,
    // deterministic); lead runs over the fully-ordered window
    "q_rank_suite" -> ("WITH base AS (SELECT event_type, user_id, count(*) AS cnt " +
      "FROM events GROUP BY 1, 2) " +
      "SELECT event_type, user_id, cnt, " +
      "dense_rank() OVER (PARTITION BY event_type ORDER BY cnt DESC) AS drank, " +
      "percent_rank() OVER (PARTITION BY event_type ORDER BY cnt DESC) AS prank, " +
      "cume_dist() OVER (PARTITION BY event_type ORDER BY cnt DESC) AS cdist, " +
      "lead(cnt, 1) OVER (PARTITION BY event_type ORDER BY cnt DESC, user_id ASC) AS next_cnt " +
      "FROM base ORDER BY event_type, cnt DESC, user_id"),
    "q_error_click_days" -> ("WITH e AS (SELECT user_id, " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS err_cnt " +
      "FROM events WHERE event_type = 'error' GROUP BY 1, 2), " +
      "c AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
      "count(*) AS click_cnt FROM events WHERE event_type = 'click' GROUP BY 1, 2) " +
      "SELECT coalesce(e.user_id, c.user_id) AS user_id, " +
      "strftime(coalesce(e.day, c.day), '%Y-%m-%d') AS day, " +
      "coalesce(e.err_cnt, 0) AS err_cnt, coalesce(c.click_cnt, 0) AS click_cnt, " +
      "CASE WHEN e.user_id IS NULL THEN 'click_only' " +
      "WHEN c.user_id IS NULL THEN 'error_only' ELSE 'both' END AS category " +
      "FROM e FULL OUTER JOIN c ON e.user_id = c.user_id AND e.day = c.day " +
      "ORDER BY user_id, day"),
    "q_cust_order_dist" -> ("SELECT n_orders, count(*) AS n_customers FROM (" +
      "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer " +
      "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1) " +
      "GROUP BY 1 ORDER BY n_customers DESC, n_orders DESC"),
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
    "q_above_avg" -> ("WITH q AS (SELECT event_type, " +
      "CAST(floor(value * 1000) AS BIGINT) AS v_q3 FROM events), " +
      "g AS (SELECT CAST(CAST(sum(v_q3) AS BIGINT) AS DOUBLE) / count(*) AS avg_q3 FROM q) " +
      "SELECT event_type, count(*) AS n_above FROM q, g " +
      "WHERE v_q3 > avg_q3 GROUP BY 1 ORDER BY 1"),
    "q_group_zscore" -> ("WITH q AS (SELECT event_id, event_type, " +
      "CAST(floor(value * 10) AS BIGINT) AS x FROM events), " +
      "stats AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, " +
      "CAST(sum(x*x) AS BIGINT) AS sxx FROM q GROUP BY 1 " +
      "HAVING count(*) * CAST(sum(x*x) AS BIGINT) - CAST(sum(x) AS BIGINT) * CAST(sum(x) AS BIGINT) > 0) " +
      "SELECT event_id, q.event_type, CAST(n*x - sx AS DOUBLE) / " +
      "sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) AS z " +
      "FROM q JOIN stats ON q.event_type = stats.event_type ORDER BY event_id"),
    "q_grouping_sets" -> ("SELECT coalesce(event_type, '<all>') AS event_type, " +
      "coalesce(day, '<all>') AS day, count(*) AS cnt, " +
      "CAST(sum(v_q3) AS BIGINT) AS sum_v_q3 FROM (" +
      "SELECT event_type, strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day, " +
      "CAST(floor(value * 1000) AS BIGINT) AS v_q3 FROM events) " +
      "GROUP BY GROUPING SETS ((event_type), (day), ()) ORDER BY 1, 2"),
    "q_big_orders" -> ("SELECT c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice, " +
      "CAST(sum_qty AS BIGINT) AS sum_qty FROM orders " +
      "JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem " +
      "GROUP BY 1 HAVING sum(l_quantity) > 300.0) ON o_orderkey = l_orderkey " +
      "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),
    "q_returned_revenue" -> ("SELECT c_custkey, c_name, n_name AS nation, " +
      "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) / 10000.0 AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE l_returnflag = 'R' AND o_orderdate >= '1996-01-01' " +
      "AND o_orderdate < '1996-04-01' " +
      "GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey ASC LIMIT 20"),
    // the correlated subquery stays CORRELATED here — DuckDB decorrelates
    // it itself, which is exactly the cross-check we want against the
    // engine's hand-decorrelated aggregate-join
    "q_small_quantity_revenue" -> ("SELECT p_brand, " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) " +
      "/ 700.0 AS avg_yearly " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE CAST(l_quantity AS BIGINT) * 5 * " +
      "(SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey) < " +
      "(SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) FROM lineitem l2 " +
      "WHERE l2.l_partkey = lineitem.l_partkey) " +
      "GROUP BY 1 ORDER BY 1"),
    // the DOUBLE correlation stays correlated here (EXISTS + NOT EXISTS,
    // Q21's shape) — DuckDB decorrelates it itself, cross-checking the
    // engine's single-window-pass decorrelation
    "q_sole_late_shipper" -> ("WITH w AS (SELECT DISTINCT l_orderkey, l_suppkey " +
      "FROM lineitem l1 " +
      "WHERE l_shipdate = (SELECT max(l_shipdate) FROM lineitem l2 " +
      "WHERE l2.l_orderkey = l1.l_orderkey) " +
      "AND EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey " +
      "AND l3.l_suppkey <> l1.l_suppkey) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l4 WHERE l4.l_orderkey = l1.l_orderkey " +
      "AND l4.l_suppkey <> l1.l_suppkey AND l4.l_shipdate >= l1.l_shipdate)) " +
      "SELECT s_name, count(*) AS numwait FROM w " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "GROUP BY 1 ORDER BY numwait DESC, s_name ASC LIMIT 20"),
    // the Q20 oracle keeps the REFERENCE formulation — nested IN + a
    // CORRELATED aggregate threshold — so the hash compare proves the
    // hand-decorrelation, not just the arithmetic
    // the textbook correlated-min form Q2 is written in — the engine's
    // window decorrelation must reproduce it exactly
    "q_min_cost_supplier" -> ("WITH rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name " +
      "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'), " +
      "cost AS (SELECT l_partkey, l_suppkey, " +
      "min(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS cost_c FROM lineitem " +
      "WHERE l_partkey IN (SELECT p_partkey FROM part " +
      "WHERE p_size IN (5, 10, 15) AND p_type = 'LARGE') " +
      "AND l_suppkey IN (SELECT s_suppkey FROM rs) GROUP BY 1, 2) " +
      "SELECT l_partkey AS p_partkey, s_name, n_name, " +
      "round(s_acctbal, 2) AS s_acctbal, cost_c " +
      "FROM cost c JOIN rs ON l_suppkey = s_suppkey " +
      "WHERE cost_c = (SELECT min(cost_c) FROM cost c2 " +
      "WHERE c2.l_partkey = c.l_partkey) " +
      "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"),
    "q_excess_shipper" -> ("WITH sp AS (SELECT l_partkey, l_suppkey, " +
      "CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sp_qty FROM lineitem " +
      "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%') " +
      "GROUP BY 1, 2) " +
      "SELECT s_name, count(*) AS n_parts, CAST(sum(sp_qty) AS BIGINT) AS qty_sum " +
      "FROM sp JOIN supplier ON l_suppkey = s_suppkey " +
      "WHERE sp_qty * (SELECT count(*) FROM sp sp3 " +
      "WHERE sp3.l_partkey = sp.l_partkey) > (SELECT sum(sp2.sp_qty) FROM sp sp2 " +
      "WHERE sp2.l_partkey = sp.l_partkey) " +
      "GROUP BY 1 ORDER BY 1"),
    // Q15's max-over-view kept as a scalar subquery over the view CTE
    "q_top_supplier" -> ("WITH rev AS (SELECT l_suppkey, " +
      "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) AS rev_q4 FROM lineitem " +
      "WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01' GROUP BY 1) " +
      "SELECT s_suppkey, s_name, rev_q4 / 10000.0 AS total_rev FROM rev " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "WHERE rev_q4 = (SELECT max(rev_q4) FROM rev) ORDER BY s_suppkey"),
    // scalar subquery + NOT EXISTS kept in their correlated/subquery form
    "q_rich_inactive" -> ("WITH c AS (SELECT c_custkey, c_nationkey, " +
      "CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer), " +
      "p AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s_cents " +
      "FROM c WHERE cents > 0) " +
      "SELECT c_nationkey AS nation, count(*) AS n_cust, " +
      "CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0 AS total_bal " +
      "FROM c, p WHERE cents * n > s_cents " +
      "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey) " +
      "GROUP BY 1 ORDER BY 1"),
    // the disjunction stays in its natural single-WHERE form — DuckDB's
    // own planner derives the per-side implications, cross-checking the
    // engine's explicit redundant-conjunct formulation
    "q_disjunctive_revenue" -> ("SELECT p_brand, count(*) AS n_items, " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) AS DOUBLE) / 10000.0 AS revenue " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 " +
      "AND l_quantity BETWEEN 1 AND 11) " +
      "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 " +
      "AND l_quantity BETWEEN 15 AND 25) " +
      "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 " +
      "AND l_quantity BETWEEN 30 AND 40) " +
      "GROUP BY 1 ORDER BY 1"),
    "q_profit_by_nation" -> ("SELECT n_name AS nation, year(o_orderdate) AS o_year, " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) - " +
      "CAST(sum(CAST(floor(p_retailprice * l_quantity * 10000) AS BIGINT)) AS BIGINT) " +
      "AS DOUBLE) / 10000.0 AS profit " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE p_name LIKE '%widget%' " +
      "GROUP BY 1, 2 ORDER BY nation, o_year DESC"),
    // Q4's EXISTS stays in its natural correlated form — DuckDB's own
    // decorrelation cross-checks the engine's explicit semi-join
    "q_late_order_priority" -> ("SELECT o_orderpriority, count(*) AS order_count " +
      "FROM orders WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01' " +
      "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
      "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
      "GROUP BY 1 ORDER BY 1"),
    "q_nation_volume" -> ("SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
      "year(l_shipdate) AS l_year, " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) AS DOUBLE) / 10000.0 AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
      "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
      "WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') " +
      "OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) " +
      "AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01' " +
      "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    // Q11's HAVING stays a scalar subquery over the same CTE
    "q_important_parts" -> ("WITH pv AS (SELECT l_partkey, " +
      "CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_q2 " +
      "FROM lineitem WHERE l_suppkey IN " +
      "(SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE n_name = 'NATION_5') " +
      "GROUP BY 1) " +
      "SELECT l_partkey AS p_partkey, CAST(value_q2 AS DOUBLE) / 100.0 AS value " +
      "FROM pv WHERE value_q2 * 1000 > (SELECT CAST(sum(value_q2) AS BIGINT) FROM pv) " +
      "ORDER BY value DESC, p_partkey"),
    "q_local_supplier_volume" -> ("SELECT n_name AS nation, " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) AS DOUBLE) / 10000.0 AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' " +
      "AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01' " +
      "GROUP BY 1 ORDER BY revenue DESC, nation"),
    "q_market_share" -> ("SELECT year(o_orderdate) AS o_year, " +
      "CAST(sum(CASE WHEN n2.n_name = 'NATION_3' " +
      "THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) " +
      "ELSE 0 END) AS DOUBLE) / " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) AS DOUBLE) AS mkt_share " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN region ON n1.n_regionkey = r_regionkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "WHERE r_name = 'AMERICA' AND p_type = 'PROMO' " +
      "AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01' " +
      "GROUP BY 1 ORDER BY 1"),
    "q_shipmode_priority" -> ("SELECT l_returnflag AS ship_mode, " +
      "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
      "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
      "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "WHERE l_returnflag IN ('A', 'R') " +
      "AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01' " +
      "AND l_shipdate > o_orderdate + INTERVAL 30 DAY " +
      "GROUP BY 1 ORDER BY 1"),
    // Q16's NOT IN stays in its natural form — DuckDB's own decorrelation
    // cross-checks the engine's explicit anti-join
    "q_part_supplier_counts" -> ("SELECT p_brand, p_type, p_size, " +
      "count(DISTINCT l_suppkey) AS supplier_cnt " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO' " +
      "AND p_size IN (1, 4, 9, 16, 25, 36, 49) " +
      "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
      "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
    // identical to q_big_orders: the bucketed layout is a physical choice
    // and must be invisible to results
    "q_big_orders_bucketed" -> ("SELECT c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice, " +
      "CAST(sum_qty AS BIGINT) AS sum_qty FROM orders " +
      "JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem " +
      "GROUP BY 1 HAVING sum(l_quantity) > 300.0) ON o_orderkey = l_orderkey " +
      "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),
    // the FULL recompute — base ⊎ delta must merge to exactly this
    "q_incremental_agg" -> ("SELECT event_type, count(*) AS n_events, " +
      "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_q3, " +
      "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)::DOUBLE / count(*) / 1000.0 " +
      "AS avg_v FROM events GROUP BY 1 ORDER BY 1"),
    // identical to the unpartitioned computation: the day-partitioned
    // layout + DPP is a physical choice and must be invisible to results
    "q_dpp_hot_days" -> ("WITH hot AS (SELECT dt, purchases FROM (" +
      "SELECT CAST(ts AS DATE) AS dt, count(*) AS purchases, " +
      "row_number() OVER (ORDER BY count(*) DESC, CAST(ts AS DATE) ASC) AS rk " +
      "FROM events WHERE event_type = 'purchase' GROUP BY 1) WHERE rk <= 3) " +
      "SELECT dt, count(*) AS n_events, round(sum(value), 2) AS sum_value, " +
      "max(purchases) AS purchases " +
      "FROM (SELECT CAST(ts AS DATE) AS dt, value FROM events) e " +
      "JOIN hot USING (dt) GROUP BY 1 ORDER BY 1"),
    // the oracle IS the single-reducer window the engine refuses to run —
    // the range-partitioned prefix-sum plan must match it exactly
    "q_global_rownum" -> ("SELECT doc_id, source, " +
      "row_number() OVER (ORDER BY doc_id) - 1 AS rownum " +
      "FROM documents ORDER BY doc_id"),
    // Morton interleave recomputed closed-form per row (x bits on even
    // z positions, y bits on odd), bucketed by the top 4 z-bits
    "q_zorder_locality" -> ("WITH d AS (SELECT user_id % 32 AS x, " +
      "datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 32 AS y FROM events), " +
      "z AS (SELECT x, y, list_sum(list_transform(generate_series(0, 4), " +
      "i -> (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i + 1)))) AS zv FROM d) " +
      "SELECT CAST(zv >> 6 AS BIGINT) AS bucket, count(*) AS n_events, " +
      "CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x, " +
      "CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y " +
      "FROM z GROUP BY 1 ORDER BY 1"),
    // the same box filter + aggregate over the ORIGINAL parquet — the
    // z-layout write/read cycle and its stats pruning must be invisible
    "q_zorder_scan" -> ("WITH d AS (SELECT user_id % 32 AS x, " +
      "datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 32 AS y, " +
      "CAST(floor(value * 1000) AS BIGINT) AS v_q3 FROM events) " +
      "SELECT count(*) AS n_events, CAST(sum(v_q3) AS BIGINT) AS sum_v_q3, " +
      "count(DISTINCT x * 32 + y) AS n_cells FROM d " +
      "WHERE x >= 8 AND x < 16 AND y >= 16 AND y < 24"),
    // the full bootstrap recomputed: same one-md5 row hash, same
    // per-replicate affine constants (INTERPOLATED from the same Scala
    // values the engine bakes into its plan — parity by construction),
    // same integer Poisson(1) inverse-CDF thresholds, same two-IEEE-op
    // mean quantize
    "q_bootstrap_ci" -> {
      val (bootAh, bootAl, bootC) = Relational.bootConsts(32)
      "WITH e AS (SELECT event_type AS g, event_id AS k, " +
      "CAST(floor(value * 1000) AS BIGINT) AS v FROM events), " +
      "hh AS (SELECT g, v, ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT AS h " +
      "FROM e), " +
      s"r AS (SELECT g, v, b, ((${bootAl.mkString("[", ", ", "]")}[b + 1] * (h & 1073741823)) " +
      s"+ (((${bootAh.mkString("[", ", ", "]")}[b + 1] * (h & 1073741823) " +
      s"+ ${bootAl.mkString("[", ", ", "]")}[b + 1] * (h >> 30)) & 1073741823) << 30) " +
      s"+ ${bootC.mkString("[", ", ", "]")}[b + 1]) & 1152921504606846975 AS u " +
      "FROM hh CROSS JOIN generate_series(0, 31) AS gs(b)), " +
      "w AS (SELECT g, b, v, CASE " +
      "WHEN u < 424136118829305344 THEN 0 " +
      "WHEN u < 848272237658610688 THEN 1 " +
      "WHEN u < 1060340297073263360 THEN 2 " +
      "WHEN u < 1131029650211480960 THEN 3 " +
      "WHEN u < 1148701988496035328 THEN 4 " +
      "WHEN u < 1152236456152946176 THEN 5 ELSE 6 END AS w FROM r), " +
      "rm AS (SELECT g, b, CAST(floor(CAST(sum(w * v) AS DOUBLE) / sum(w) * 1e6) " +
      "AS BIGINT) AS m_q6 FROM w GROUP BY 1, 2 HAVING sum(w) > 0), " +
      "pt AS (SELECT g, count(*) AS n_rows, " +
      "CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 1e6) AS BIGINT) AS mean_q6 " +
      "FROM e GROUP BY 1) " +
      "SELECT pt.g AS event_type, n_rows, mean_q6, " +
      "min(m_q6) AS boot_lo_q6, max(m_q6) AS boot_hi_q6 " +
      "FROM pt JOIN rm ON pt.g = rm.g GROUP BY 1, 2, 3 ORDER BY 1"
    },
    // the PLAIN join + GROUP BY — the salted (key, salt) two-sided plan
    // must produce the identical answer
    "q_join_salted" -> ("SELECT c_mktsegment, count(*) AS n_events, " +
      "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_q3 " +
      "FROM events JOIN customer ON user_id = c_custkey " +
      "GROUP BY 1 ORDER BY 1"),

    // same frequent-item prefilter, pair self-join, and ×10⁶ truncating
    // quotients (DuckDB `//` ≡ Spark DIV on non-negative BIGINTs)
    "q_assoc_rules" -> ("WITH b AS (SELECT DISTINCT l_orderkey AS tx, l_partkey AS item " +
      "FROM lineitem), " +
      "f AS (SELECT item, count(*) AS item_cnt FROM b GROUP BY 1 HAVING count(*) >= 25), " +
      "bf AS (SELECT tx, b.item, item_cnt FROM b JOIN f USING (item)), " +
      "n AS (SELECT count(DISTINCT tx) AS n_tx FROM b), " +
      "p AS (SELECT x.item AS item_a, x.item_cnt AS cnt_a, y.item AS item_b, " +
      "y.item_cnt AS cnt_b, count(*) AS pair_cnt FROM bf x JOIN bf y " +
      "ON x.tx = y.tx AND x.item < y.item GROUP BY 1, 2, 3, 4 HAVING count(*) >= 3) " +
      "SELECT item_a, item_b, pair_cnt, cnt_a, cnt_b, " +
      "pair_cnt * 1000000 // cnt_a AS conf_ab_q6, " +
      "pair_cnt * 1000000 // cnt_b AS conf_ba_q6, " +
      "(pair_cnt * 1000000 // cnt_a) * n_tx // cnt_b AS lift_q6 " +
      "FROM p, n ORDER BY item_a, item_b"),

    // identical (ts, event_id) sequence total order; window sum CAST back
    // from DuckDB's HUGEINT promotion before the quotient
    "q_markov_transitions" -> ("WITH e AS (SELECT event_type AS src, " +
      "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst " +
      "FROM events), " +
      "c AS (SELECT src, dst, count(*) AS cnt FROM e WHERE dst IS NOT NULL GROUP BY 1, 2) " +
      "SELECT src, dst, cnt, " +
      "CAST(sum(cnt) OVER (PARTITION BY src) AS BIGINT) AS src_total, " +
      "cnt * 1000000 // CAST(sum(cnt) OVER (PARTITION BY src) AS BIGINT) AS p_q6 " +
      "FROM c ORDER BY src, dst"),

    // identical total order (cents, orderkey, linenumber) and integer `//`
    // cuts — both engines drop exactly the same rows
    "q_trimmed_mean" -> ("WITH li AS (SELECT l_returnflag, " +
      "CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents, l_orderkey, l_linenumber " +
      "FROM lineitem), " +
      "r AS (SELECT l_returnflag, cents, row_number() OVER (PARTITION BY l_returnflag " +
      "ORDER BY cents, l_orderkey, l_linenumber) AS rn, " +
      "count(*) OVER (PARTITION BY l_returnflag) AS n FROM li) " +
      "SELECT l_returnflag, count(*) AS n_kept, CAST(sum(cents) AS BIGINT) AS sum_cents, " +
      "CAST(sum(cents) AS BIGINT)::DOUBLE / count(*) AS mean_cents " +
      "FROM r WHERE rn > n // 10 AND rn <= n - n // 10 GROUP BY 1 ORDER BY 1"),

    // rank-weighted Gini over the customer aggregate in whole dollars
    // (the engine's overflow-headroom unit); all integer until the
    // single final division
    "q_gini_revenue" -> ("WITH cust AS (SELECT o_custkey, " +
      "CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS dollars " +
      "FROM orders GROUP BY 1), " +
      "r AS (SELECT dollars, CAST(row_number() OVER (ORDER BY dollars, o_custkey) AS BIGINT) AS i " +
      "FROM cust) " +
      "SELECT count(*) AS n_customers, CAST(sum(dollars) AS BIGINT) AS total_dollars, " +
      "CAST(sum(i * 2 * dollars) - (count(*) + 1) * sum(dollars) AS BIGINT) AS gini_num, " +
      "CAST(sum(i * 2 * dollars) - (count(*) + 1) * sum(dollars) AS BIGINT)::DOUBLE / " +
      "CAST(count(*) * sum(dollars) AS BIGINT)::DOUBLE AS gini " +
      "FROM r"),

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

    // same exact LOO algebra; group sums CAST back from HUGEINT
    "q_target_encoding" -> ("WITH oc AS (SELECT o_orderkey, c_mktsegment AS seg, " +
      "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents " +
      "FROM orders JOIN customer ON o_custkey = c_custkey), " +
      "g AS (SELECT seg, count(*) AS n_g, CAST(sum(cents) AS BIGINT) AS s_g " +
      "FROM oc GROUP BY 1) " +
      "SELECT o_orderkey, seg, cents, s_g - cents AS loo_num, n_g - 1 AS loo_den, " +
      "(s_g - cents)::DOUBLE / (n_g - 1)::DOUBLE AS loo_cents " +
      "FROM oc JOIN g USING (seg) ORDER BY o_orderkey"),

    // same per-price collapse then strict running-max cut; the tie count
    // joins back on (price, max size)
    "q_pareto_frontier" -> ("WITH pts AS (SELECT " +
      "CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents, " +
      "CAST(p_size AS BIGINT) AS size FROM part), " +
      "pp AS (SELECT price_cents, max(size) AS max_size FROM pts GROUP BY 1), " +
      "na AS (SELECT price_cents, size AS max_size, count(*) AS n_parts " +
      "FROM pts GROUP BY 1, 2), " +
      "f AS (SELECT price_cents, max_size, max(max_size) OVER (ORDER BY price_cents " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM pp) " +
      "SELECT f.price_cents, f.max_size AS size, n_parts FROM f " +
      "JOIN na ON f.price_cents = na.price_cents AND f.max_size = na.max_size " +
      "WHERE prev_max IS NULL OR f.max_size > prev_max ORDER BY f.price_cents"),

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

    // same exact-cents decimal-string first digit — no log10 anywhere
    "q_benford_digits" -> ("WITH c AS (SELECT " +
      "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders " +
      "WHERE floor(o_totalprice * 100) > 0), " +
      "d AS (SELECT substr(CAST(cents AS VARCHAR), 1, 1) AS digit, count(*) AS n " +
      "FROM c GROUP BY 1), " +
      "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d) " +
      "SELECT digit, n, n * 1000000 // total AS share_q6 FROM d, t ORDER BY digit"),

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

    // byte-identical SQL text modulo the view name
    "q_sql_interface" -> ("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
      "CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents " +
      "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),

    // same top order and integer skew quotient
    "q_key_skew_audit" -> ("WITH pk AS (SELECT user_id, count(*) AS cnt " +
      "FROM events GROUP BY 1), " +
      "st AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total, " +
      "max(cnt) AS max_cnt FROM pk), " +
      "tp AS (SELECT user_id, cnt, row_number() OVER (ORDER BY cnt DESC, user_id) AS rank " +
      "FROM pk) " +
      "SELECT rank, user_id, cnt, n_keys, total, max_cnt, " +
      "max_cnt * 1000000 // (total // n_keys) AS skew_q6 " +
      "FROM tp, st WHERE rank <= 5 ORDER BY rank"),

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

    // the PLAIN join — the bloom prune must be result-invisible
    "q_bloom_prejoin" -> ("SELECT event_type, count(*) AS n, " +
      "CAST(sum(CAST(floor(coalesce(value, 0) * 1000) AS BIGINT)) AS BIGINT) AS sum_v_q3 " +
      "FROM events JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) " +
      "ON user_id = c_custkey GROUP BY 1 ORDER BY 1"),

    // the identical recurrence stepped by a recursive CTE: the frontier is
    // one row per user per step, joined to the rn+1 event
    "q_clamped_balance" -> ("WITH RECURSIVE e AS (SELECT user_id, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s, event_id, " +
      "CASE WHEN event_type = 'purchase' " +
      "THEN CAST(floor(coalesce(value, 0) * 100) AS BIGINT) ELSE -500 END AS delta " +
      "FROM events WHERE event_type IN ('purchase', 'error')), " +
      "r AS (SELECT user_id, row_number() OVER " +
      "(PARTITION BY user_id ORDER BY ts_s, event_id) AS rn, delta FROM e), " +
      "rec(user_id, rn, bal, clamps) AS (" +
      "SELECT user_id, rn, greatest(0, delta), " +
      "CASE WHEN delta < 0 THEN 1 ELSE 0 END FROM r WHERE rn = 1 " +
      "UNION ALL SELECT r.user_id, r.rn, greatest(0, rec.bal + r.delta), " +
      "rec.clamps + CASE WHEN rec.bal + r.delta < 0 THEN 1 ELSE 0 END " +
      "FROM rec JOIN r ON r.user_id = rec.user_id AND r.rn = rec.rn + 1), " +
      "f AS (SELECT user_id, max(rn) AS n_rows FROM r GROUP BY 1) " +
      "SELECT rec.user_id, CAST(bal AS BIGINT) AS balance, " +
      "CAST(clamps AS BIGINT) AS n_clamps, n_rows FROM rec " +
      "JOIN f ON rec.user_id = f.user_id AND rec.rn = f.n_rows ORDER BY rec.user_id"),

    // same digit buckets, rank walk, and string-built lo/width; the two
    // sketch paths must agree exactly — merging is integer addition
    "q_mergeable_quantiles" -> {
      def walk(sk: String, alias: String) =
        s"cum_$alias AS (SELECT len, d2, " +
          s"CAST(sum(cnt) OVER (ORDER BY len, d2 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum " +
          s"FROM $sk), " +
          s"n_$alias AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM $sk), " +
          s"walk_$alias AS (SELECT p, n, len, d2, " +
          s"row_number() OVER (PARTITION BY p ORDER BY len, d2) AS rn " +
          s"FROM pd, n_$alias, cum_$alias WHERE cum >= (n * p + 99) // 100), " +
          s"est_$alias AS (SELECT p, n, " +
          "CASE WHEN len = 1 THEN d2 ELSE " +
          "CAST(d2::VARCHAR || repeat('0', CAST(len - 2 AS INTEGER)) AS BIGINT) END + " +
          "CASE WHEN len = 1 THEN 1 ELSE " +
          "CAST('1' || repeat('0', CAST(len - 2 AS INTEGER)) AS BIGINT) END // 2 " +
          s"AS $alias FROM walk_$alias WHERE rn = 1)"
      "WITH c AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents " +
        "FROM orders WHERE floor(o_totalprice * 100) > 0), " +
        "b AS (SELECT cents, CAST(length(cents::VARCHAR) AS BIGINT) AS len, " +
        "CAST(substr(cents::VARCHAR, 1, 2) AS BIGINT) AS d2 FROM c), " +
        "skd AS (SELECT len, d2, count(*) AS cnt FROM b GROUP BY 1, 2), " +
        "skm AS (SELECT len, d2, CAST(sum(c0) AS BIGINT) AS cnt FROM " +
        "(SELECT cents % 8 AS shard, len, d2, count(*) AS c0 FROM b GROUP BY 1, 2, 3) " +
        "GROUP BY 1, 2), " +
        "pd AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS p), " +
        walk("skd", "est_direct") + ", " + walk("skm", "est_merged") + ", " +
        "ex AS (SELECT 50 AS p, quantile_cont(cents, 0.5) AS exact_cents FROM c " +
        "UNION ALL SELECT 90, quantile_cont(cents, 0.9) FROM c " +
        "UNION ALL SELECT 99, quantile_cont(cents, 0.99) FROM c) " +
        "SELECT d.p, d.n, d.est_direct, m.est_merged, ex.exact_cents " +
        "FROM est_est_direct d JOIN est_est_merged m ON d.p = m.p " +
        "JOIN ex ON d.p = ex.p ORDER BY d.p"
    },

    // same integer cross-multiplied class boundaries over the same
    // (cents desc, partkey) total order
    "q_abc_analysis" -> ("WITH pp AS (SELECT l_partkey, " +
      "CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents " +
      "FROM lineitem GROUP BY 1), " +
      "r AS (SELECT l_partkey, cents, " +
      "CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, " +
      "CAST(sum(cents) OVER () AS BIGINT) AS total FROM pp), " +
      "c AS (SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A' " +
      "WHEN cum * 100 <= total * 95 THEN 'B' ELSE 'C' END AS cls, " +
      "cents, total FROM r) " +
      "SELECT cls, count(*) AS n_parts, CAST(sum(cents) AS BIGINT) AS cls_cents, " +
      "(CAST(sum(cents) AS BIGINT) * 1000 // max(total)) * 1000 + " +
      "((CAST(sum(cents) AS BIGINT) * 1000) % max(total)) * 1000 // max(total) " +
      "AS share_q6 FROM c GROUP BY 1 ORDER BY 1"),

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

  /** Shared daily-revenue CTE (epoch_day, exact BIGINT day_cents) — the
    * time-series oracle base frame (seasonality / ACF / CUSUM family). */
  private val DailyCentsCte: String =
    "WITH daily AS (SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) " +
      "AS epoch_day, CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) " +
      "AS day_cents FROM orders GROUP BY 1)"
}
