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

  private[ext] def secs(c: org.apache.spark.sql.Column) = unix_timestamp(c)

  /** Daily-revenue frame (epoch_day, exact BIGINT day_cents) — the engine
    * twin of [[DailyCentsCte]]; the time-series family (seasonality / ACF
    * / CUSUM / seasonal outliers) must stay in lockstep with the oracle
    * CTE, so both sides are factored once.
    */
  private[ext] def dailyCents(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")
        .as("epoch_day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("day_cents"))

  /** Aggregated declared surface of the relational family files
    * (split in rounds 12-13 for maintainability — pure code motion).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalTpchQueries.queries ++ RelationalScaleQueries.queries ++
      RelationalStatsQueries.queries ++ RelationalInferenceQueries.queries ++
      RelationalTsQueries.queries ++ RelationalForecastQueries.queries


  /** Integer-weighted order-statistic percentile over a `rk` frame carrying
    * (rn0, n) — the oracle twin of [[Relational.exactPercentilesX100]]'s
    * conditional sum, divided back to value units as ONE double division. */
  private[ext] def pctSql(v: String, p: Int): String =
    s"CAST(CAST(sum(CASE WHEN rn0 = ((n-1)*$p)//100 THEN $v*(100-((n-1)*$p)%100) " +
      s"WHEN rn0 = ((n-1)*$p)//100 + 1 THEN $v*(((n-1)*$p)%100) ELSE 0 END) " +
      s"AS BIGINT) AS DOUBLE)/100"

  def oracleSql: Map[String, String] =
    RelationalTpchQueries.oracleSql ++ RelationalScaleQueries.oracleSql ++
      RelationalStatsQueries.oracleSql ++ RelationalInferenceQueries.oracleSql ++
      RelationalTsQueries.oracleSql ++ RelationalForecastQueries.oracleSql


  /** Shared daily-revenue CTE (epoch_day, exact BIGINT day_cents) — the
    * time-series oracle base frame (seasonality / ACF / CUSUM family). */
  private[ext] val DailyCentsCte: String =
    "WITH daily AS (SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) " +
      "AS epoch_day, CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) " +
      "AS day_cents FROM orders GROUP BY 1)"
}
