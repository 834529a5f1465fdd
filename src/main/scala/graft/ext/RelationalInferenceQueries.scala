package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import RelationalQueries.{secs, dailyCents, pctSql, DailyCentsCte}

/** Declared inference / experimental-design queries (hypothesis tests,
  * A/B readout guards, causal estimators, survival) — split from
  * [[RelationalStatsQueries]] (pure code motion, round 13); see
  * [[RelationalQueries]]'s scaladoc for the shared column-alignment /
  * determinism / rounding contracts.
  */
object RelationalInferenceQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      // |types|×|segments| rows read by THREE subtrees (two distincts + the
      // left join) — checkpoint, or each subtree re-runs the corpus agg and
      // rebuilds the customer broadcast (round-15 StageProbe: 9 single-task
      // stages ≈ 3.7 s of concurrent broadcast-subquery futures, all of it
      // the same 30-row aggregate recomputed per subtree)
      val cells = Tables.events(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))),
          Seq("user_id"))
        .groupBy(col("event_type"), col("segment"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint()
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

    // ONE-WAY ANOVA F across return flags on lineitem quantity — "does
    // mean quantity differ by return status?", the k-group generalization
    // of the two-sample tests. ONE corpus pass accumulates exact integer
    // moments per group (quantity is integral; Σq² sums as DECIMAL so the
    // lane never wraps), the 3 groups pivot into one row, and every
    // fractional step is a fixed-order double expression over once-cast
    // exact moments: t_g = s_g²/n_g (decimal product, one cast, one
    // division), SSB = (t_A + t_N + t_R) − S²/N, SSW = SS − Σt,
    // F = (SSB/(k−1))/(SSW/(N−k)). No common-denominator blowup — the
    // per-group division keeps every decimal ≤ Σq², so the plan is exact
    // at any corpus size (the q_spearman DECIMAL lane, divided early).
    "q_anova_f" -> { (s, dir) =>
      val dec = "decimal(38,0)"
      val m = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("g"), col("l_quantity").cast("long").as("q"))
        .groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("q").cast(dec)).as("sq"),
          // cast-first so the square widens to decimal BEFORE multiplying —
          // (q*q).cast(dec) wraps silently in 64-bit past |q| ≈ 3.04e9
          sum(col("q").cast(dec) * col("q")).as("sqq"))
      def pick(gv: String, c: String) =
        sum(when(col("g") === gv, col(c)))
      val one = m.agg(
        pick("A", "n").as("na"), pick("A", "sq").as("sa"), pick("A", "sqq").as("ssa"),
        pick("N", "n").as("nb"), pick("N", "sq").as("sb"), pick("N", "sqq").as("ssb"),
        pick("R", "n").as("nc"), pick("R", "sq").as("sc"), pick("R", "sqq").as("ssc"))
      def t(sc: String, nc: String) =
        (col(sc) * col(sc)).cast("double") / col(nc).cast("double")
      one
        .withColumn("n", col("na") + col("nb") + col("nc"))
        .withColumn("t_sum", t("sa", "na") + t("sb", "nb") + t("sc", "nc"))
        .withColumn("s_all", col("sa") + col("sb") + col("sc"))
        .withColumn("ss_all", col("ssa") + col("ssb") + col("ssc"))
        .withColumn("ssb",
          col("t_sum") - (col("s_all") * col("s_all")).cast("double") / col("n").cast("double"))
        .withColumn("ssw", col("ss_all").cast("double") - col("t_sum"))
        .select(col("n"), lit(3).as("k"),
          (col("ssb") / lit(2.0) / (col("ssw") / (col("n") - lit(3)).cast("double"))).as("f"))
    },

    // WELCH'S UNEQUAL-VARIANCE t between click and error event values —
    // the default two-sample mean test (pooled-variance Student assumes
    // what A/B data never satisfies). Values quantized to exact cents
    // (the q_corr_stats lane); per-group u_g = var_g/n_g is ONE division
    // of two once-cast exact decimals (num = n·Σx²−(Σx)², den =
    // n²(n−1)), and t plus the Welch–Satterthwaite df are fixed-order
    // double expressions over {m_g, u_g, n_g} — every step
    // correctly-rounded identically in both engines, no corpus-size
    // overflow anywhere in the lane.
    "q_welch_ttest" -> { (s, dir) =>
      val dec = "decimal(38,0)"
      val m = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "error"))
        .select(col("event_type").as("g"), floor(col("value") * 100).cast("long").as("x"))
        .groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("x").cast(dec)).as("sx"),
          // cast-first (see q_anova_f): the decimal lane must be
          // overflow-proof at any value magnitude, not just this domain
          sum(col("x").cast(dec) * col("x")).as("sxx"))
      def pick(gv: String, c: String) =
        sum(when(col("g") === gv, col(c)))
      val one = m.agg(
        pick("click", "n").as("n1"), pick("click", "sx").as("s1"), pick("click", "sxx").as("ss1"),
        pick("error", "n").as("n2"), pick("error", "sx").as("s2"), pick("error", "sxx").as("ss2"))
      def u(n: String, sx: String, ss: String) =
        (col(n).cast("decimal(38,0)") * col(ss) - col(sx) * col(sx)).cast("double") /
          (col(n).cast("decimal(38,0)") * col(n) * (col(n) - lit(1))).cast("double")
      def mean(sx: String, n: String) = col(sx).cast("double") / col(n).cast("double")
      one
        .withColumn("u1", u("n1", "s1", "ss1"))
        .withColumn("u2", u("n2", "s2", "ss2"))
        .withColumn("usum", col("u1") + col("u2"))
        .select(col("n1"), col("n2"),
          ((mean("s1", "n1") - mean("s2", "n2")) / sqrt(col("usum"))).as("t"),
          (col("usum") * col("usum") /
            (col("u1") * col("u1") / (col("n1") - lit(1)).cast("double") +
              col("u2") * col("u2") / (col("n2") - lit(1)).cast("double"))).as("welch_df"))
    },

    // TWO-PREDICTOR OLS — extendedprice-cents on (quantity, discount%)
    // via the normal equations, the distributed closed-form regression:
    // ONE pass accumulates the 9 exact integer moments (DECIMAL lane),
    // the centered S-terms (S11 = n·Σx² − (Σx)² …) stay exact decimal,
    // each is cast to double ONCE, and the 2×2 Cramer solve + intercept
    // + R² are fixed-order double expressions — cross-engine
    // bit-reproducible where engine-native regr_* stream co-moments in
    // nondeterministic order. Scale shape: map-side partial aggregation,
    // one 1-row reduce, zero joins.
    "q_ols_multi" -> { (s, dir) =>
      val dec = "decimal(38,0)"
      def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(dec))
      val m = Tables.lineitem(s, dir)
        .select(col("l_quantity").cast("long").as("x1"),
          floor(col("l_discount") * 100).cast("long").as("x2"),
          floor(col("l_extendedprice") * 100).cast("long").as("y"))
        .agg(count(lit(1)).as("n"),
          dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"), dsum(col("y")).as("sy"),
          // cast-first products (see q_anova_f): widen to decimal BEFORE
          // multiplying so no cross-moment can wrap in 64-bit
          dsum(col("x1").cast(dec) * col("x1")).as("s11"),
          dsum(col("x2").cast(dec) * col("x2")).as("s22"),
          dsum(col("x1").cast(dec) * col("x2")).as("s12"),
          dsum(col("x1").cast(dec) * col("y")).as("s1y"),
          dsum(col("x2").cast(dec) * col("y")).as("s2y"),
          dsum(col("y").cast(dec) * col("y")).as("syy"))
      def ctr(sab: String, a: String, b: String) =
        (col("n").cast("decimal(38,0)") * col(sab) - col(a) * col(b)).cast("double")
      m.withColumn("c11", ctr("s11", "s1", "s1"))
        .withColumn("c22", ctr("s22", "s2", "s2"))
        .withColumn("c12", ctr("s12", "s1", "s2"))
        .withColumn("c1y", ctr("s1y", "s1", "sy"))
        .withColumn("c2y", ctr("s2y", "s2", "sy"))
        .withColumn("cyy", ctr("syy", "sy", "sy"))
        .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
        .withColumn("b1", (col("c1y") * col("c22") - col("c2y") * col("c12")) / col("det"))
        .withColumn("b2", (col("c2y") * col("c11") - col("c1y") * col("c12")) / col("det"))
        .select(col("n"),
          ((col("sy").cast("double") - col("b1") * col("s1").cast("double") -
            col("b2") * col("s2").cast("double")) / col("n").cast("double")).as("b0"),
          col("b1"), col("b2"),
          ((col("b1") * col("c1y") + col("b2") * col("c2y")) / col("cyy")).as("r2"))
    },

    // CUPED variance reduction on the A/B split — the industry-standard
    // pre-period adjustment: per user, x = pre-period spend, y =
    // post-period spend (cents, exact; the period boundary is the exact
    // integer midpoint of the observed day range, a 1-row broadcast);
    // θ = Cxy/Cxx pooled over users; each variant's adjusted mean is
    // mean(y_v) − θ·(mean(x_v) − mean(x)). One corpus pass → one
    // user-keyed agg → one 1-row reduce; every fraction a once-cast
    // fixed-order expression over exact DECIMAL moments.
    "q_cuped" -> { (s, dir) =>
      val dec = "decimal(38,0)"
      val ev = Tables.events(s, dir).select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      val b = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(dec))
      val perUser = ev
        .crossJoin(broadcast(b))
        .withColumn("split", expr("(lo + hi + 1) DIV 2"))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("day") < col("split"), col("cents")).otherwise(lit(0L))).as("x"),
          sum(when(col("day") >= col("split"), col("cents")).otherwise(lit(0L))).as("y"))
      val m = perUser.agg(
        count(lit(1)).as("n"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(col("x").cast(dec) * col("x")).as("sxx"),
        dsum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n0"),
        dsum(when(col("user_id") % 2 === 0, col("x")).otherwise(lit(0L))).as("sx0"),
        dsum(when(col("user_id") % 2 === 0, col("y")).otherwise(lit(0L))).as("sy0"))
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      m.withColumn("n1", col("n") - col("n0"))
        .withColumn("sx1", col("sx") - col("sx0"))
        .withColumn("sy1", col("sy") - col("sy0"))
        .withColumn("theta",
          d(col("n").cast(dec) * col("sxy") - col("sx") * col("sy")) /
            d(col("n").cast(dec) * col("sxx") - col("sx") * col("sx")))
        .withColumn("adj0",
          d(col("sy0")) / d(col("n0")) -
            col("theta") * (d(col("sx0")) / d(col("n0")) - d(col("sx")) / d(col("n"))))
        .withColumn("adj1",
          d(col("sy1")) / d(col("n1")) -
            col("theta") * (d(col("sx1")) / d(col("n1")) - d(col("sx")) / d(col("n"))))
        .select(col("n0"), col("n1"),
          (d(col("sy0")) / d(col("n0"))).as("mean_y0"),
          (d(col("sy1")) / d(col("n1"))).as("mean_y1"),
          col("adj0").as("adj_y0"), col("adj1").as("adj_y1"), col("theta"),
          (col("adj1") - col("adj0")).as("lift_adj"))
    },

    // DIFFERENCE-IN-DIFFERENCES over the same split and period boundary —
    // the parallel-trends causal read: DiD = (post−pre) of the treated
    // arm minus (post−pre) of control, on per-event mean cents. Four
    // exact (Σ, n) cells pivot into one row; each mean is one once-cast
    // division; DiD is one fixed-order expression.
    "q_diff_in_diff" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      val b = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val cells = ev
        .crossJoin(broadcast(b))
        .withColumn("split", expr("(lo + hi + 1) DIV 2"))
        .select((col("user_id") % 2 === 1).as("t"), (col("day") >= col("split")).as("p"),
          col("cents"))
      def cell(t: Boolean, p: Boolean, c: String) = {
        val v = if (c == "n") lit(1L) else col("cents")
        sum(when(col("t") === t && col("p") === p, v).otherwise(lit(0L)))
      }
      def mean(s0: String, n0: String) = col(s0).cast("double") / col(n0).cast("double")
      cells
        .agg(
          cell(false, false, "n").as("n_cpre"), cell(false, false, "s").as("s_cpre"),
          cell(false, true, "n").as("n_cpost"), cell(false, true, "s").as("s_cpost"),
          cell(true, false, "n").as("n_tpre"), cell(true, false, "s").as("s_tpre"),
          cell(true, true, "n").as("n_tpost"), cell(true, true, "s").as("s_tpost"))
        .select(col("n_cpre"), col("n_cpost"), col("n_tpre"), col("n_tpost"),
          mean("s_cpre", "n_cpre").as("m_cpre"), mean("s_cpost", "n_cpost").as("m_cpost"),
          mean("s_tpre", "n_tpre").as("m_tpre"), mean("s_tpost", "n_tpost").as("m_tpost"),
          ((mean("s_tpost", "n_tpost") - mean("s_tpre", "n_tpre")) -
            (mean("s_cpost", "n_cpost") - mean("s_cpre", "n_cpre"))).as("did"))
    },
  )

  def oracleSql: Map[String, String] = Map(
    // identical moment pivot + fixed-order double expression; HUGEINT
    // carries the exact products (the engine's DECIMAL lane), each cast
    // to DOUBLE once at the same points
    "q_anova_f" -> ("WITH m AS (SELECT l_returnflag AS g, count(*) AS n, " +
      "sum(CAST(l_quantity AS BIGINT)) AS sq, " +
      "sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sqq " +
      "FROM lineitem GROUP BY 1), " +
      "one AS (SELECT " +
      "sum(CASE WHEN g='A' THEN n END) AS na, sum(CASE WHEN g='A' THEN sq END) AS sa, " +
      "sum(CASE WHEN g='A' THEN sqq END) AS ssa, " +
      "sum(CASE WHEN g='N' THEN n END) AS nb, sum(CASE WHEN g='N' THEN sq END) AS sb, " +
      "sum(CASE WHEN g='N' THEN sqq END) AS ssb, " +
      "sum(CASE WHEN g='R' THEN n END) AS nc, sum(CASE WHEN g='R' THEN sq END) AS sc, " +
      "sum(CASE WHEN g='R' THEN sqq END) AS ssc FROM m), " +
      "e AS (SELECT na + nb + nc AS n, " +
      "(sa*sa)::DOUBLE / na::DOUBLE + (sb*sb)::DOUBLE / nb::DOUBLE + " +
      "(sc*sc)::DOUBLE / nc::DOUBLE AS t_sum, " +
      "sa + sb + sc AS s_all, ssa + ssb + ssc AS ss_all FROM one) " +
      "SELECT CAST(n AS BIGINT) AS n, 3 AS k, " +
      "((t_sum - (s_all*s_all)::DOUBLE / n::DOUBLE) / 2.0) / " +
      "((ss_all::DOUBLE - t_sum) / (n - 3)::DOUBLE) AS f FROM e"),

    // same cents quantization, same once-cast u_g = (n·Σx²−(Σx)²) /
    // (n²(n−1)) rationals, same fixed-order t / Welch–Satterthwaite df
    "q_welch_ttest" -> ("WITH b AS (SELECT event_type AS g, " +
      "CAST(floor(value * 100) AS BIGINT) AS x FROM events " +
      "WHERE event_type IN ('click', 'error')), " +
      "m AS (SELECT g, count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx FROM b GROUP BY 1), " +
      "one AS (SELECT " +
      "sum(CASE WHEN g='click' THEN n END) AS n1, sum(CASE WHEN g='click' THEN sx END) AS s1, " +
      "sum(CASE WHEN g='click' THEN sxx END) AS ss1, " +
      "sum(CASE WHEN g='error' THEN n END) AS n2, sum(CASE WHEN g='error' THEN sx END) AS s2, " +
      "sum(CASE WHEN g='error' THEN sxx END) AS ss2 FROM m), " +
      "u AS (SELECT n1, n2, s1, s2, " +
      "(n1*ss1 - s1*s1)::DOUBLE / (n1*n1*(n1 - 1))::DOUBLE AS u1, " +
      "(n2*ss2 - s2*s2)::DOUBLE / (n2*n2*(n2 - 1))::DOUBLE AS u2 FROM one) " +
      "SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, " +
      "(s1::DOUBLE / n1::DOUBLE - s2::DOUBLE / n2::DOUBLE) / sqrt(u1 + u2) AS t, " +
      "(u1 + u2) * (u1 + u2) / " +
      "(u1*u1 / (n1 - 1)::DOUBLE + u2*u2 / (n2 - 1)::DOUBLE) AS welch_df FROM u"),

    // same per-user pre/post split at the exact midpoint day, HUGEINT
    // moments, identical once-cast θ and adjusted-mean expressions
    "q_cuped" -> ("WITH ev AS (SELECT user_id, " +
      "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, " +
      "CAST(floor(value * 100) AS BIGINT) AS cents FROM events), " +
      "b AS (SELECT min(day) AS lo, max(day) AS hi FROM ev), " +
      "pu AS (SELECT user_id, " +
      "CAST(sum(CASE WHEN day < (lo + hi + 1) // 2 THEN cents ELSE 0 END) AS BIGINT) AS x, " +
      "CAST(sum(CASE WHEN day >= (lo + hi + 1) // 2 THEN cents ELSE 0 END) AS BIGINT) AS y " +
      "FROM ev CROSS JOIN b GROUP BY 1), " +
      "m AS (SELECT count(*) AS n, sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy, " +
      "sum(x::HUGEINT * x) AS sxx, sum(x::HUGEINT * y) AS sxy, " +
      "sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0, " +
      "sum(CASE WHEN user_id % 2 = 0 THEN x::HUGEINT ELSE 0 END) AS sx0, " +
      "sum(CASE WHEN user_id % 2 = 0 THEN y::HUGEINT ELSE 0 END) AS sy0 FROM pu), " +
      "e AS (SELECT *, n - n0 AS n1, sx - sx0 AS sx1, sy - sy0 AS sy1, " +
      "(n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE AS theta FROM m), " +
      "f AS (SELECT *, sy0::DOUBLE / n0::DOUBLE - " +
      "theta * (sx0::DOUBLE / n0::DOUBLE - sx::DOUBLE / n::DOUBLE) AS adj0, " +
      "sy1::DOUBLE / n1::DOUBLE - " +
      "theta * (sx1::DOUBLE / n1::DOUBLE - sx::DOUBLE / n::DOUBLE) AS adj1 FROM e) " +
      "SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1, " +
      "sy0::DOUBLE / n0::DOUBLE AS mean_y0, sy1::DOUBLE / n1::DOUBLE AS mean_y1, " +
      "adj0 AS adj_y0, adj1 AS adj_y1, theta, adj1 - adj0 AS lift_adj FROM f"),

    // same exact midpoint split, four (Σ, n) cells, one fixed-order DiD
    "q_diff_in_diff" -> ("WITH ev AS (SELECT user_id, " +
      "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, " +
      "CAST(floor(value * 100) AS BIGINT) AS cents FROM events), " +
      "b AS (SELECT min(day) AS lo, max(day) AS hi FROM ev), " +
      "c AS (SELECT (user_id % 2 = 1) AS t, (day >= (lo + hi + 1) // 2) AS p, cents " +
      "FROM ev CROSS JOIN b), " +
      "m AS (SELECT " +
      "sum(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END) AS n_cpre, " +
      "sum(CASE WHEN NOT t AND NOT p THEN cents ELSE 0 END) AS s_cpre, " +
      "sum(CASE WHEN NOT t AND p THEN 1 ELSE 0 END) AS n_cpost, " +
      "sum(CASE WHEN NOT t AND p THEN cents ELSE 0 END) AS s_cpost, " +
      "sum(CASE WHEN t AND NOT p THEN 1 ELSE 0 END) AS n_tpre, " +
      "sum(CASE WHEN t AND NOT p THEN cents ELSE 0 END) AS s_tpre, " +
      "sum(CASE WHEN t AND p THEN 1 ELSE 0 END) AS n_tpost, " +
      "sum(CASE WHEN t AND p THEN cents ELSE 0 END) AS s_tpost FROM c) " +
      "SELECT CAST(n_cpre AS BIGINT) AS n_cpre, CAST(n_cpost AS BIGINT) AS n_cpost, " +
      "CAST(n_tpre AS BIGINT) AS n_tpre, CAST(n_tpost AS BIGINT) AS n_tpost, " +
      "s_cpre::DOUBLE / n_cpre::DOUBLE AS m_cpre, " +
      "s_cpost::DOUBLE / n_cpost::DOUBLE AS m_cpost, " +
      "s_tpre::DOUBLE / n_tpre::DOUBLE AS m_tpre, " +
      "s_tpost::DOUBLE / n_tpost::DOUBLE AS m_tpost, " +
      "(s_tpost::DOUBLE / n_tpost::DOUBLE - s_tpre::DOUBLE / n_tpre::DOUBLE) - " +
      "(s_cpost::DOUBLE / n_cpost::DOUBLE - s_cpre::DOUBLE / n_cpre::DOUBLE) AS did FROM m"),

    // same 9 exact moments, centered S-terms cast to DOUBLE once, same
    // fixed-order Cramer solve / intercept / R²
    "q_ols_multi" -> ("WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x1, " +
      "CAST(floor(l_discount * 100) AS BIGINT) AS x2, " +
      "CAST(floor(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem), " +
      "one AS (SELECT count(*) AS n, sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy, " +
      "sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x1*x2) AS s12, " +
      "sum(x1*y) AS s1y, sum(x2*y) AS s2y, sum(y*y) AS syy FROM b), " +
      "c AS (SELECT n, s1, s2, sy, " +
      "(n*s11 - s1*s1)::DOUBLE AS c11, (n*s22 - s2*s2)::DOUBLE AS c22, " +
      "(n*s12 - s1*s2)::DOUBLE AS c12, (n*s1y - s1*sy)::DOUBLE AS c1y, " +
      "(n*s2y - s2*sy)::DOUBLE AS c2y, (n*syy - sy*sy)::DOUBLE AS cyy FROM one), " +
      "d AS (SELECT *, c11*c22 - c12*c12 AS det FROM c), " +
      "e AS (SELECT *, (c1y*c22 - c2y*c12) / det AS b1, " +
      "(c2y*c11 - c1y*c12) / det AS b2 FROM d) " +
      "SELECT CAST(n AS BIGINT) AS n, " +
      "(sy::DOUBLE - b1 * s1::DOUBLE - b2 * s2::DOUBLE) / n::DOUBLE AS b0, " +
      "b1, b2, (b1 * c1y + b2 * c2y) / cyy AS r2 FROM e"),

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

    "q_srm_check" -> ("WITH u AS (SELECT user_id, count(*) AS cnt " +
      "FROM events GROUP BY 1), " +
      "cells AS (SELECT " +
      "CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na, " +
      "CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb FROM u) " +
      "SELECT na, nb, CAST((na - nb) * (na - nb) AS DOUBLE) / " +
      "CAST(na + nb AS DOUBLE) AS chi2, " +
      "CAST((na - nb) * (na - nb) AS DOUBLE) / CAST(na + nb AS DOUBLE) > 3.841 " +
      "AS mismatch FROM cells"),

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
  )
}
