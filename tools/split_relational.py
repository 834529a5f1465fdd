#!/usr/bin/env python3
"""One-shot refactor: split RelationalQueries.scala (5300+ lines) into four
family files (TPC-H / scale-mechanics / statistics / time-series), pure code
motion — every entry chunk (leading comment block + body) is moved verbatim,
RelationalQueries keeps the shared helpers (now private[ext]) and becomes the
aggregator. Asserts full key coverage and same-family queries/oracle pairing.
"""
import re
import sys

SRC = "src/main/scala/graft/ext/RelationalQueries.scala"

TPCH = """q_pricing_summary q_ship_priority q_revenue_by_nation q_priority_with_returns
q_supplier_balance q_promo_revenue q_returned_revenue q_small_quantity_revenue
q_sole_late_shipper q_excess_shipper q_top_supplier q_rich_inactive
q_disjunctive_revenue q_profit_by_nation q_late_order_priority q_nation_volume
q_important_parts q_local_supplier_volume q_market_share q_shipmode_priority
q_part_supplier_counts q_min_cost_supplier q_big_orders q_above_avg
q_orders_by_month q_join_enrich q_ntile q_cube_labels q_rollup_revenue
q_grouping_sets q_pivot_types q_unpivot q_users_click_not_error
q_users_click_and_error q_error_click_days q_cust_order_dist""".split()

SCALE = """q_big_orders_bucketed q_incremental_agg q_dpp_hot_days q_global_rownum
q_zorder_locality q_zorder_scan q_join_salted q_salted_agg q_bloom_prejoin
q_sql_interface q_key_skew_audit q_profile_columns q_constraint_audit
q_distinct_users q_approx_distinct q_distinct_kmv q_kmv_union q_kmv_intersect
q_mergeable_quantiles q_clamped_balance q_schema_drift q_dist_drift
q_fd_violations q_snapshot_diff q_cdc_merge q_scd2_build q_scd2_lookup
q_latest_event q_gapfill q_debounce q_user_running_total q_topk_users""".split()

STATS = """q_spearman q_kendall_tau q_theil_sen q_simpson_check
q_type_concentration q_gini_split q_weighted_median q_winsorized_mean
q_wilson_ci q_log_histogram q_control_chart q_ab_contingency q_apdex
q_power_analysis q_quantile_normalize q_rank_auc q_srm_check q_cramers_v
q_fano_factor q_runs_test q_ks_test q_lorenz_curve q_effective_sample_size
q_kaplan_meier q_bootstrap_ci q_trimmed_mean q_gini_revenue q_benford_digits
q_quantiles q_corr_stats q_histogram q_rank_suite q_group_zscore
q_anomaly_mad q_target_encoding q_pareto_frontier q_abc_analysis
q_assoc_rules q_markov_transitions""".split()

TS = """q_asof_join q_range_band q_interval_join q_interval_coverage
q_attribution q_rolling_corr q_dwell_time q_cross_correlation
q_linear_attribution q_decay_attribution q_position_attribution
q_conversion_lag q_ship_lag_percentiles q_bounce_rate q_rfm_segments
q_tree_rollup q_path_trigrams q_rolling_p95 q_user_sequences
q_sliding_window q_session_window q_moving_sum q_funnel q_funnel_window
q_funnel_exists q_week_over_week q_cohort_retention q_ltv_curve
q_ewma_daily q_forecast_backtest q_revenue_forecast q_ship_split_rate
q_backlog_age q_concurrency_profile q_holt_winters q_holt_forecast
q_rolling_active q_weekday_seasonality q_disorder_histogram
q_autocorrelation q_cusum_changepoint q_gapfill_interp q_longest_streak
q_seasonal_outliers q_churn_labels q_event_paths""".split()

FAMILY = {}
for name, fam in [(n, "Tpch") for n in TPCH] + [(n, "Scale") for n in SCALE] + \
                 [(n, "Stats") for n in STATS] + [(n, "Ts") for n in TS]:
    assert name not in FAMILY, f"dup {name}"
    FAMILY[name] = fam

DOC = {
    "Tpch": "TPC-H-shaped star-join/rollup queries over the fact tables",
    "Scale": "scale-mechanics, audit, CDC/SCD and sketch queries",
    "Stats": "statistics and hypothesis-test queries",
    "Ts": "time-series, funnel and attribution queries",
}


def parse_entries(lines, lo, hi):
    """Entries in lines[lo:hi]: chunk = contiguous '    //' comment block +
    '    "q_name" ->' body until next chunk start."""
    starts = []  # (idx, name)
    for i in range(lo, hi):
        m = re.match(r'    "(q_[a-z0-9_]+)" ->', lines[i])
        if m:
            j = i
            while j > lo and lines[j - 1].startswith("    //"):
                j -= 1
            starts.append((j, i, m.group(1)))
    chunks = {}
    for k, (cstart, _, name) in enumerate(starts):
        cend = starts[k + 1][0] if k + 1 < len(starts) else hi
        body = lines[cstart:cend]
        while body and body[-1].strip() == "":
            body.pop()
        # strip ONE trailing comma from the chunk's last line
        assert body[-1].rstrip().endswith(",") or k + 1 == len(starts), (name, body[-1])
        if body[-1].rstrip().endswith(","):
            body[-1] = body[-1].rstrip()[:-1]
        assert name not in chunks, f"dup entry {name}"
        chunks[name] = "\n".join(body)
    return chunks


def main():
    lines = open(SRC).read().split("\n")
    # line numbers (1-based from inspection): queries map 28..3577, oracle 3587..5330
    def find(pat):
        return next(i for i, l in enumerate(lines) if re.search(pat, l))
    q_open = find(r"def queries: Map\[String") + 1
    q_close = next(i for i in range(q_open, len(lines)) if lines[i] == "  )")
    o_open = find(r"def oracleSql: Map\[String") + 1
    o_close = next(i for i in range(o_open, len(lines)) if lines[i] == "  )")
    q_chunks = parse_entries(lines, q_open, q_close)
    o_chunks = parse_entries(lines, o_open, o_close)
    missing_q = set(q_chunks) - set(FAMILY)
    missing_o = set(o_chunks) - set(FAMILY)
    assert not missing_q, f"unclassified queries: {sorted(missing_q)}"
    assert not missing_o, f"unclassified oracles: {sorted(missing_o)}"
    header = (
        "package graft.ext\n\n"
        "import graft.Tables\n"
        "import org.apache.spark.sql.{DataFrame, SparkSession}\n"
        "import org.apache.spark.sql.expressions.Window\n"
        "import org.apache.spark.sql.functions._\n\n"
        "import RelationalQueries.{secs, dailyCents, pctSql, DailyCentsCte}\n"
    )
    for fam in ["Tpch", "Scale", "Stats", "Ts"]:
        qn = [n for n in q_chunks if FAMILY[n] == fam]
        on = [n for n in o_chunks if FAMILY[n] == fam]
        # preserve original source order
        qn.sort(key=lambda n: list(q_chunks).index(n))
        on.sort(key=lambda n: list(o_chunks).index(n))
        body = header + "\n"
        body += f"/** Declared {DOC[fam]} — split from [[RelationalQueries]]\n"
        body += "  * (pure code motion, round 12); see its scaladoc for the shared\n"
        body += "  * column-alignment / determinism / rounding contracts.\n  */\n"
        body += f"object Relational{fam}Queries {{\n\n"
        body += "  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(\n"
        body += ",\n\n".join(q_chunks[n] for n in qn) + "\n  )\n\n"
        body += "  def oracleSql: Map[String, String] = Map(\n"
        body += ",\n\n".join(o_chunks[n] for n in on) + "\n  )\n}\n"
        open(f"src/main/scala/graft/ext/Relational{fam}Queries.scala", "w").write(body)
        print(f"Relational{fam}Queries: {len(qn)} queries, {len(on)} oracles")
    # rewrite RelationalQueries.scala: header + helpers + aggregator
    head = lines[: q_open - 1]  # up to (not incl.) 'def queries' line
    helpers = lines[q_close + 1 : o_open - 1]  # pctSql etc. between the maps
    tail = lines[o_close + 1 : ]  # DailyCentsCte + closing brace
    out = []
    for l in head:
        out.append(l.replace("  private def secs", "  private[ext] def secs")
                    .replace("  private def dailyCents", "  private[ext] def dailyCents"))
    out.append("  /** Aggregated declared surface of the four relational family files")
    out.append("    * (split in round 12 for maintainability — pure code motion).")
    out.append("    */")
    out.append("  def queries: Map[String, (SparkSession, String) => DataFrame] =")
    out.append("    RelationalTpchQueries.queries ++ RelationalScaleQueries.queries ++")
    out.append("      RelationalStatsQueries.queries ++ RelationalTsQueries.queries")
    out.append("")
    for l in helpers:
        out.append(l.replace("  private def pctSql", "  private[ext] def pctSql"))
    out.append("  def oracleSql: Map[String, String] =")
    out.append("    RelationalTpchQueries.oracleSql ++ RelationalScaleQueries.oracleSql ++")
    out.append("      RelationalStatsQueries.oracleSql ++ RelationalTsQueries.oracleSql")
    out.append("")
    for l in tail:
        out.append(l.replace("  private val DailyCentsCte", "  private[ext] val DailyCentsCte"))
    open(SRC, "w").write("\n".join(out) + ("" if out[-1] == "" else "\n"))
    print(f"RelationalQueries rewritten: {len(out)} lines")


if __name__ == "__main__":
    sys.exit(main())
