package graft

import graft.model._
import graft.pipeline.LogsToMetrics
import graft.sinks.{ConsoleSink, MetricsSink}
import org.apache.spark.sql.SparkSession

/** CLI entry — the reference's `python -m beametrics.main` analog
  * (/root/reference/beametrics/main.py:276-326) for the batch path:
  * load a YAML metric config, run the log→metrics pipeline over a parquet
  * events table, export points as JSON lines.
  *
  * Usage:
  *   runMain graft.Main --config <metrics.yaml> --events <dir-with-events.parquet>
  *                      [--project <gcp-project>] [--window-size <sec>] [--limit <n>]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val config = opts.getOrElse("--config", sys.error("--config <yaml> is required"))
    val eventsDir = opts.getOrElse("--events", sys.error("--events <dir> is required"))
    val windowDefault = opts.get("--window-size").map(_.toLong).getOrElse(120L) // main.py:78
    val limit = opts.get("--limit").map(_.toInt)

    val routes = ConfigLoader.fromFile(config, windowDefault, opts.get("--project"))
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
