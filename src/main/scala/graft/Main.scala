package graft

import graft.model._
import graft.pipeline.LogsToMetrics
import graft.sinks.{ConsoleSink, MetricsSink}
import org.apache.spark.sql.SparkSession

/** CLI entry — the reference's `python -m beametrics.main` analog
  * (/root/reference/beametrics/main.py:276-326) for the batch path:
  * configure metrics (YAML file OR single-metric flags, same precedence as
  * the reference: --config wins), run the log→metrics pipeline over a
  * parquet events table, export points as JSON lines.
  *
  * Usage:
  *   runMain graft.Main --config <metrics.yaml> --events <dir>
  *     [--project <p>] [--window-size <sec>] [--limit <n>]
  *   runMain graft.Main --metric-name <n> --metric-type count|sum
  *     [--metric-field <f>] [--filter-conditions '<json array>']
  *     [--metric-labels '<json obj>'] [--dynamic-labels '<json obj>']
  *     [--export-type local|google-cloud-monitoring] --events <dir> …
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val eventsDir = opts.getOrElse("--events", sys.error("--events <dir> is required"))
    val windowDefault = opts.get("--window-size").map(_.toLong).getOrElse(120L) // main.py:78
    val limit = opts.get("--limit").map(_.toInt)

    // config precedence mirrors main.py:288-308: --config file > flags
    val routes = opts.get("--config") match {
      case Some(path) => ConfigLoader.fromFile(path, windowDefault, opts.get("--project"))
      case None =>
        val name = opts.getOrElse("--metric-name",
          sys.error("--config <yaml> or --metric-name … is required"))
        Seq(ConfigLoader.singleMetric(
          name,
          opts.getOrElse("--metric-type", "count"),
          opts.get("--metric-field"),
          opts.get("--filter-conditions"),
          opts.get("--metric-labels"),
          opts.get("--dynamic-labels"),
          windowDefault,
          opts.getOrElse("--export-type", "local"),
          opts.get("--project")))
    }
    require(routes.nonEmpty, "config defines no metrics")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val ev = Tables.events(spark, eventsDir)
      val points = LogsToMetrics(routes.map(_.definition), LogsToMetrics.Typed(ev.schema))(ev)
      val shaped = MetricsSink.formatted(points).orderBy("metric_name", "timestamp")
      MetricsSink.writeBatch(limit.map(shaped.limit).getOrElse(shaped), _ => new ConsoleSink)
    } finally spark.stop()
  }
}
