package graft

import graft.model._
import graft.pipeline.LogsToMetrics
import org.apache.spark.sql.functions._

/** Core transform semantics mirrored from the reference pipeline tests
  * (/root/reference/tests/test_pipeline.py:119-178 count/sum e2e,
  * :210-333 window edges) plus the documented SUM divergence.
  */
class LogsToMetricsSpec extends SparkSpec {
  import spark.implicits._
  import LogsToMetricsSpec._

  private def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("count and sum per window (test_pipeline.py:119-178)") {
    val df = Seq(
      Row1(at(10), "ERROR", 100.0),
      Row1(at(20), "ERROR", 250.0),
      Row1(at(30), "WARNING", 999.0),
      Row1(at(70), "ERROR", 7.0)
    ).toDF
    val defs = Seq(
      MetricDefinition("cnt", MetricType.Count,
        Seq(FilterCondition("severity", "ERROR", "equals")), windowSizeSec = 60),
      MetricDefinition("sum", MetricType.Sum("bytes"),
        Seq(FilterCondition("severity", "ERROR", "equals")), windowSizeSec = 60))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select($"metric", unix_timestamp($"window_start").as("ws"), $"value")
      .as[(String, Long, Double)].collect().toSet
    assert(out == Set(
      ("cnt", 0L, 2.0), ("cnt", 60L, 1.0),
      ("sum", 0L, 350.0), ("sum", 60L, 7.0)))
  }

  test("epoch-floor window bucketing is exact at boundaries (pipeline.py:67-70)") {
    val df = Seq(
      Row1(at(59), "E", 1.0), Row1(at(60), "E", 1.0), Row1(at(61), "E", 1.0)
    ).toDF
    val defs = Seq(MetricDefinition("c", MetricType.Count, windowSizeSec = 60))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select(unix_timestamp($"window_start").as("ws"), $"value")
      .as[(Long, Double)].collect().toSet
    assert(out == Set((0L, 1.0), (60L, 2.0))) // 60 belongs to [60,120)
  }

  test("window_end = window_start + size") {
    val df = Seq(Row1(at(100), "E", 1.0)).toDF
    val defs = Seq(MetricDefinition("c", MetricType.Count, windowSizeSec = 45))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select(unix_timestamp($"window_start"), unix_timestamp($"window_end"))
      .as[(Long, Long)].head()
    assert(out == ((90L, 135L))) // floor(100/45)*45 = 90
  }

  test("SUM of missing field contributes 0 (pipeline.py:200-208)") {
    val df = Seq(Row1(at(1), "E", 5.0)).toDF
    val defs = Seq(MetricDefinition("s", MetricType.Sum("no_such"), windowSizeSec = 60))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select($"value").as[Double].collect().toList
    assert(out == List(0.0))
  }

  test("SUM of unparsable string is 0, not a crash (documented divergence, SURVEY.md §2.2)") {
    val df = Seq(("a", at(1), "not_a_number"), ("b", at(2), "2.5")).toDF("id", "ts", "v")
    val defs = Seq(MetricDefinition("s", MetricType.Sum("v"), windowSizeSec = 60))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select($"value").as[Double].collect().toList
    assert(out == List(2.5))
  }

  test("label canonicalization groups equal label sets (pipeline.py:172)") {
    val df = Seq(
      Row1(at(1), "E", 1.0), Row1(at(2), "E", 2.0), Row1(at(3), "W", 3.0)
    ).toDF
    val defs = Seq(
      MetricDefinition("c", MetricType.Count,
        staticLabels = Map("app" -> "x", "env" -> "prod"),
        dynamicLabels = Map("sev" -> "severity"),
        windowSizeSec = 3600))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select($"labels", $"value").collect()
    assert(out.length == 2) // one group per distinct (severity) label value
    val m = out.map(r => r.getMap[String, String](0).toMap -> r.getDouble(1)).toMap
    assert(m(Map("app" -> "x", "env" -> "prod", "sev" -> "E")) == 2.0)
    assert(m(Map("app" -> "x", "env" -> "prod", "sev" -> "W")) == 1.0)
  }

  test("missing dynamic-label field resolves to empty string (pipeline.py:195-196)") {
    val df = Seq(Row1(at(1), "E", 1.0)).toDF
    val defs = Seq(
      MetricDefinition("c", MetricType.Count,
        dynamicLabels = Map("gone" -> "no_such_field"), windowSizeSec = 60))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select($"labels").collect().head.getMap[String, String](0).toMap
    assert(out == Map("gone" -> ""))
  }

  test("min/max/avg metric types; missing values excluded, not zeroed") {
    val df = Seq(
      ("a", at(10), "5"), ("b", at(20), "15"), ("c", at(30), "not_num"), ("d", at(40), null)
    ).toDF("id", "ts", "v")
    val defs = Seq(
      MetricDefinition("mn", MetricType.Min("v"), windowSizeSec = 3600),
      MetricDefinition("mx", MetricType.Max("v"), windowSizeSec = 3600),
      MetricDefinition("av", MetricType.Avg("v"), windowSizeSec = 3600),
      MetricDefinition("sm", MetricType.Sum("v"), windowSizeSec = 3600))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select($"metric", $"value").as[(String, Double)].collect().toMap
    assert(out("mn") == 5.0)
    assert(out("mx") == 15.0)
    assert(out("av") == 10.0) // (5+15)/2 — nulls excluded from the mean
    assert(out("sm") == 20.0) // sum: unparsable/missing contribute 0
  }

  test("p50 metric: exact median in the shared pass, buffering only when declared") {
    val df = Seq(
      ("a", at(10), "1"), ("b", at(20), "9"), ("c", at(30), "5"),
      ("d", at(40), "7"), ("e", at(50), null)
    ).toDF("id", "ts", "v")
    val defs = Seq(
      MetricDefinition("p", MetricType.P50("v"), windowSizeSec = 3600),
      MetricDefinition("c", MetricType.Count, windowSizeSec = 3600))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select($"metric", $"value").as[(String, Double)].collect().toMap
    assert(out("p") == 6.0) // sorted {1,5,7,9}, even count → (5+7)/2; null excluded
    assert(out("c") == 5.0)

    // a p50-free fan-out must keep the codegen HashAggregate: percentile's
    // mere presence would downgrade the whole agg to ObjectHashAggregate
    val noP50 = LogsToMetrics(
      Seq(MetricDefinition("c2", MetricType.Count, windowSizeSec = 60)),
      LogsToMetrics.Typed(df.schema))(df)
    val plan = noP50.queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"), s"count-only agg must stay codegen:\n$plan")
    val withP50 = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
    assert(withP50.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"))
  }

  test("p50_approx metric: bounded-state median tracks exact, gated like p50") {
    // 101 values 0..100 → exact median 50; percentile_approx at default
    // accuracy is exact on inputs far smaller than the summary bound
    val rows = (0 to 100).map(i => (s"r$i", at(10 + i), i.toString))
    val df = rows.toDF("id", "ts", "v")
    val defs = Seq(
      MetricDefinition("pa", MetricType.P50Approx("v"), windowSizeSec = 3600),
      MetricDefinition("p", MetricType.P50("v"), windowSizeSec = 3600),
      MetricDefinition("c", MetricType.Count, windowSizeSec = 3600))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select($"metric", $"value").as[(String, Double)].collect().toMap
    assert(out("p") == 50.0)
    assert(math.abs(out("pa") - out("p")) <= 1.0,
      s"approx median ${out("pa")} must track exact ${out("p")}")
    assert(out("c") == 101.0)
    // approx-only fan-outs also gate: count-only stays codegen (covered by
    // the p50 test); an approx-only fan-out pays ObjectHashAggregate
    val approxOnly = LogsToMetrics(
      Seq(MetricDefinition("pa2", MetricType.P50Approx("v"), windowSizeSec = 60)),
      LogsToMetrics.Typed(df.schema))(df)
    assert(approxOnly.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"))
  }

  test("per-config window sizes coexist in one pass") {
    val df = Seq(Row1(at(65), "E", 1.0)).toDF
    val defs = Seq(
      MetricDefinition("w60", MetricType.Count, windowSizeSec = 60),
      MetricDefinition("w300", MetricType.Count, windowSizeSec = 300))
    val out = LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
      .select($"metric", unix_timestamp($"window_start").as("ws"))
      .as[(String, Long)].collect().toSet
    assert(out == Set(("w60", 60L), ("w300", 0L)))
  }

  test("TIMESTAMP_NTZ event-time columns window identically (DuckDB/pandas parquet interop)") {
    val ltz = Seq(Row1(at(10), "E", 1.0), Row1(at(70), "E", 2.0)).toDF
    val ntz = ltz.withColumn("ts", to_timestamp_ntz(date_format($"ts", "yyyy-MM-dd HH:mm:ss")))
    assert(ntz.schema("ts").dataType.typeName == "timestamp_ntz")
    val defs = Seq(MetricDefinition("cnt", MetricType.Count, windowSizeSec = 60))
    def run(df: org.apache.spark.sql.DataFrame) =
      LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
        .select(unix_timestamp($"window_start").as("ws"), $"value")
        .as[(Long, Double)].collect().toSet
    assert(run(ntz) == run(ltz), "NTZ must window to the identical instants under UTC")
    // Tables.load normalizes an NTZ ts column the same way
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    ntz.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType.typeName == "timestamp")
    assert(run(loaded) == run(ltz))
  }
}

object LogsToMetricsSpec {
  final case class Row1(ts: java.sql.Timestamp, severity: String, bytes: Double)
}
