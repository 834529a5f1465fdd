package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import RelationalQueries.{secs, dailyCents, pctSql, DailyCentsCte}

/** Declared descriptive-statistics queries (rank/robust estimators,
  * concentration, distribution shape) — split from [[RelationalQueries]]
  * in round 12; the inference/experimental lane moved on to
  * [[RelationalInferenceQueries]] in round 13 (pure code motion both
  * times). See [[RelationalQueries]]'s scaladoc for the shared
  * column-alignment / determinism / rounding contracts.
  */
object RelationalStatsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // SPEARMAN rank correlation between document length and token count —
    // the monotone-robust twin of q_corr_stats' Pearson (outlier docs
    // can't drag it). Exact integer ranks with tie-averaging at the ×2
    // scale (avg_rank·2 = 2·cum_smaller + cnt + 1 — always integral), and
    // CRUCIALLY rank assignment runs in VALUE SPACE: per-distinct-value
    // counts + a running window over the distinct-value frame (thousands
    // of rows at any corpus size), broadcast back onto one corpus scan —
    // never a corpus-wide empty-over rank window (the 100 TB cliff).
    // Moments accumulate EXACT in the decimal lane (ranks reach 2n, so a
    // bare 64-bit product Σ(2n)² wraps silently past n ≈ 1.3e6) but are
    // EMITTED as BIGINT behind a loud raise_error guard at n > 1.3e6
    // (Σ ≤ 4n³ ≤ int64 there — the q_lorenz_curve precedent): the r12
    // DECIMAL(38,0) output proved version-sensitive in the oracle's
    // DECIMAL↔HUGEINT↔DOUBLE cast chain, while BIGINT values and the
    // BIGINT→DOUBLE cast are IEEE-correctly-rounded in every engine.
    // rho is one fixed-order float expression over those stable casts.
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
      val guard = col("n") > lit(1300000L)
      def asLong(c: String) = when(guard,
        raise_error(lit("q_spearman moment overflow: n > 1.3e6 docs — " +
          "4n^3 exceeds int64; restate the output in the decimal lane")))
        .otherwise(col(c).cast("long")).as(c)
      base
        .join(broadcast(ranks2(base, "x", "rx")), Seq("x"))
        .join(broadcast(ranks2(base, "y", "ry")), Seq("y"))
        .agg(count(lit(1)).as("n"),
          sum(col("rx").cast("decimal(38,0)")).as("sx"),
          sum(col("ry").cast("decimal(38,0)")).as("sy"),
          sum(dec("rx") * dec("ry")).as("sxy"),
          sum(dec("rx") * dec("rx")).as("sxx"),
          sum(dec("ry") * dec("ry")).as("syy"))
        .select(col("n"), asLong("sx"), asLong("sy"), asLong("sxy"),
          asLong("sxx"), asLong("syy"))
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
    // the group's total (the lower weighted median). Rank assignment runs
    // in VALUE SPACE (the q_spearman pattern): the threshold crossing
    // depends only on the cumulative weight at each DISTINCT cents value,
    // so the corpus pays one (flag, cents)-keyed hash aggregate and the
    // running sum walks the distinct-value frame — never a per-row window
    // partitioned by a 3-value key (the r12 shape put the whole 60M-row
    // ×100 corpus through 3 single-task sorts: 82 s + 887 MB spill; the
    // value-space frame is ~3M rows and the same result, row-for-row —
    // within a cents group the per-row cumw crosses totw/2 iff the
    // group-end cumw has, and min(cents) only sees the group). The
    // 2·cumw ≥ totw threshold stays exact integer arithmetic.
    "q_weighted_median" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
      val byVal = li.groupBy(col("l_returnflag"), col("cents"))
        .agg(sum(col("qty")).as("w"))
      val wOrd = Window.partitionBy("l_returnflag").orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("l_returnflag")
      byVal.withColumn("cumw", sum(col("w")).over(wOrd))
        .withColumn("totw", sum(col("w")).over(wAll))
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy(col("l_returnflag"))
        .agg(max(col("totw")).as("tot_qty"), min(col("cents")).as("wmedian_cents"))
        .orderBy("l_returnflag")
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

    // Equi-width histogram of event values (Relational.histogram) — one
    // bucket-keyed hash aggregation, the numeric-profiling primitive.
    "q_histogram" -> { (s, dir) =>
      Relational
        .histogram(Tables.events(s, dir), "value", width = 25.0)
        .orderBy("bucket")
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



    // LORENZ CURVE by customer revenue decile — the distribution profile
    // behind q_gini_revenue's single number ("the top decile holds X% of
    // revenue"). Deciles come from [[Scale.globalRowNumberBy]] on the
    // COMPOSITE (cents, custkey) range key — scalable exact ranking with
    // no bit-packing budget (the r14 ×100 run fired the old single-long
    // pack's guard), never a global ntile window; shares are
    // cross-multiplied exact integers with one DECIMAL(38,0) truncating
    // division per decile.
    "q_lorenz_curve" -> { (s, dir) =>
      val perCust = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      // COMPOSITE range key (cents, custkey) — no bit packing. The r12
      // form packed both into one long behind a loud guard; the r14 ×100
      // run FIRED that guard (per-customer cents outgrew 2³¹ at 100×),
      // proving the pack itself was the scale cliff. The composite
      // globalRowNumberBy orders identically (lexicographic ≡ the packed
      // order wherever the pack was valid) with no bit budget at all.
      val ranked = Scale.globalRowNumberBy(
        perCust.select(col("o_custkey"), col("cents")),
        Seq("cents", "o_custkey"), partitions = 8)
      val tot = ranked.agg(count(lit(1)).as("n"), sum(col("cents")).as("tot_cents"))
      val wCum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
      ranked
        .crossJoin(broadcast(tot))
        .groupBy(expr("rownum * 10 DIV n").as("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("cents"),
          max(col("tot_cents")).as("tot_cents"))
        .withColumn("cum_cents", sum(col("cents")).over(wCum))
        // share arithmetic widens to DECIMAL(38,0): cents·10⁶ outgrew
        // int64 at the ×100 corpus (the r14 whole-surface run caught it —
        // decile cents ≈ 2·10¹⁵ there). DIV (IntegralDivide) on the
        // decimal product truncates EXACTLY (never a decimal `/`+floor,
        // whose scale-bounded HALF_UP rounding can bump past an integer
        // boundary before the floor) and emits BIGINT — schema unchanged,
        // values identical wherever the old int64 form was valid.
        .select(col("decile"), col("n_cust"), col("cents"),
          expr("CAST(cents AS DECIMAL(38,0)) * 1000000 DIV tot_cents").as("share_q6"),
          expr("CAST(cum_cents AS DECIMAL(38,0)) * 1000000 DIV tot_cents")
            .as("cum_share_q6"))
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
      // VALUE-SPACE form (round 14 — the q_weighted_median rewrite
      // applied to the trim; the r12 shape ranked every corpus row in a
      // 3-partition window = three single-task 20M-row sorts at ×100,
      // 91.3 s). The definitional tie-break (cents, orderkey, linenumber)
      // decides WHICH boundary-value rows drop, but every boundary row
      // shares the SAME cents, so the trimmed SUM and COUNT depend only
      // on HOW MANY of that value's rank block [cum−cnt+1, cum] overlaps
      // the kept band (lo, hi] — value-exact, oracle unchanged (it keeps
      // the definitional windowed form). The corpus collapses in ONE
      // map-side-combining (flag, cents) aggregate; both windows walk the
      // distinct-value frame.
      val vc = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy("l_returnflag").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("l_returnflag")
      vc.withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wAll))
        // integer DIV, not `/`: n/10.0 would shift the upper cut when
        // n % 10 != 0 (rn <= n - 2.5 keeps one fewer row than n - 2)
        .withColumn("kept",
          greatest(lit(0L),
            least(col("cum"), expr("n - n DIV 10")) -
              greatest(col("cum") - col("cnt"), expr("n DIV 10"))))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("kept")).as("n_kept"),
          sum(col("kept") * col("cents")).as("sum_cents"))
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





  )

  def oracleSql: Map[String, String] = Map(
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


    // bin() renders identical binary text in both engines; its length IS
    // floor(log2(cents)) + 1 for the positive cent totals
    "q_log_histogram" -> ("SELECT CAST(length(bin(cents)) AS BIGINT) AS log2_bucket, " +
      "count(*) AS n, min(cents) AS min_cents, max(cents) AS max_cents FROM " +
      "(SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders) " +
      "GROUP BY 1 ORDER BY 1"),


    "q_apdex" -> ("SELECT event_type, count(*) AS total, " +
      "CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS satisfied, " +
      "CAST(sum(CASE WHEN value > 50 AND value <= 200 THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS tolerating, " +
      "(CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 + " +
      "CAST(sum(CASE WHEN value > 50 AND value <= 200 THEN 1 ELSE 0 END) AS BIGINT) " +
      "* 500000) // count(*) AS apdex_q6 " +
      "FROM events GROUP BY 1 ORDER BY 1"),



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

    // bucket_lo cast: DuckDB BIGINT * decimal-literal yields DECIMAL where
    // Spark yields DOUBLE
    "q_histogram" -> ("SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket, " +
      "CAST(CAST(floor(value / 25.0) AS BIGINT) * 25.0 AS DOUBLE) AS bucket_lo, count(*) AS cnt " +
      "FROM events GROUP BY 1 ORDER BY 1"),

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
      // HUGEINT products stay exact; the BIGINT output cast errors loudly
      // on overflow (mirrors the engine's raise_error guard at n > 1.3e6)
      // and BIGINT values + BIGINT->DOUBLE casts are version-stable across
      // DuckDB releases, unlike the r12 DECIMAL(38,0) output lane; rho
      // combines one correctly-rounded double cast per moment in the
      // identical expression order
      "m AS (SELECT count(*) AS n, CAST(sum(CAST(rx AS HUGEINT)) AS BIGINT) AS sx, " +
      "CAST(sum(CAST(ry AS HUGEINT)) AS BIGINT) AS sy, " +
      "CAST(sum(CAST(rx AS HUGEINT) * ry) AS BIGINT) AS sxy, " +
      "CAST(sum(CAST(rx AS HUGEINT) * rx) AS BIGINT) AS sxx, " +
      "CAST(sum(CAST(ry AS HUGEINT) * ry) AS BIGINT) AS syy FROM j) " +
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


    "q_fano_factor" -> ("WITH d AS (SELECT event_type, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day, " +
      "count(*) AS c FROM events GROUP BY 1, 2), " +
      "m AS (SELECT event_type, count(*) AS n_days, CAST(sum(c) AS BIGINT) AS sc, " +
      "CAST(sum(c * c) AS BIGINT) AS scc FROM d GROUP BY 1) " +
      "SELECT event_type, n_days, sc, scc, " +
      "CAST(n_days * scc - sc * sc AS DOUBLE) / CAST(n_days * sc AS DOUBLE) AS fano " +
      "FROM m ORDER BY event_type"),




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
      "SELECT decile, n_cust, cents, " +
      "CAST(CAST(cents AS HUGEINT) * 1000000 // tot_cents AS BIGINT) AS share_q6, " +
      "CAST(CAST(cum_cents AS HUGEINT) * 1000000 // tot_cents AS BIGINT) AS cum_share_q6 " +
      "FROM cum ORDER BY decile"),

    "q_effective_sample_size" -> ("SELECT count(*) AS n, " +
      "CAST(sum(n_chars) AS BIGINT) AS sum_w, " +
      "CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_w2, " +
      "CAST(CAST(sum(n_chars) AS BIGINT) * CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / " +
      "CAST(CAST(sum(n_chars * n_chars) AS BIGINT) AS DOUBLE) AS ess FROM documents"),


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

    "q_group_zscore" -> ("WITH q AS (SELECT event_id, event_type, " +
      "CAST(floor(value * 10) AS BIGINT) AS x FROM events), " +
      "stats AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, " +
      "CAST(sum(x*x) AS BIGINT) AS sxx FROM q GROUP BY 1 " +
      "HAVING count(*) * CAST(sum(x*x) AS BIGINT) - CAST(sum(x) AS BIGINT) * CAST(sum(x) AS BIGINT) > 0) " +
      "SELECT event_id, q.event_type, CAST(n*x - sx AS DOUBLE) / " +
      "sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) AS z " +
      "FROM q JOIN stats ON q.event_type = stats.event_type ORDER BY event_id"),


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

    // same exact-cents decimal-string first digit — no log10 anywhere
    "q_benford_digits" -> ("WITH c AS (SELECT " +
      "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders " +
      "WHERE floor(o_totalprice * 100) > 0), " +
      "d AS (SELECT substr(CAST(cents AS VARCHAR), 1, 1) AS digit, count(*) AS n " +
      "FROM c GROUP BY 1), " +
      "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d) " +
      "SELECT digit, n, n * 1000000 // total AS share_q6 FROM d, t ORDER BY digit"),

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
      "AS share_q6 FROM c GROUP BY 1 ORDER BY 1")
  )
}
