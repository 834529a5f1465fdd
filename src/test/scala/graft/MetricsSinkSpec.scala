package graft

import graft.model._
import graft.pipeline.LogsToMetrics
import graft.sinks._
import org.apache.spark.sql.functions._

/** Sink layer: reference local-exporter JSON shape
  * (/root/reference/tests/test_metrics_exporter.py:161-178) and the
  * log-and-continue export policy (:104-127).
  */
class MetricsSinkSpec extends SparkSpec {
  import spark.implicits._

  private def points(): org.apache.spark.sql.DataFrame = {
    val df = Seq(
      (new java.sql.Timestamp(60000L), "ERROR", 10.0),
      (new java.sql.Timestamp(65000L), "ERROR", 5.0),
      (new java.sql.Timestamp(70000L), "INFO", 1.0)
    ).toDF("ts", "severity", "value")
    val defs = Seq(
      MetricDefinition("errors", MetricType.Count,
        Seq(FilterCondition("severity", "ERROR", "equals")), windowSizeSec = 60),
      MetricDefinition("values", MetricType.Sum("value"), windowSizeSec = 60))
    LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df)
  }

  test("JSON line matches the reference local exporter shape (ISO-8601 UTC)") {
    val p = MetricPoint(new java.sql.Timestamp(120000L), "errors", 2.0, Map("sev" -> "ERROR"))
    assert(p.toJsonLine ==
      """{"timestamp": "1970-01-01T00:02:00Z", """ +
        """"metric_name": "errors", "value": 2.0, "labels": {"sev": "ERROR"}}""")
  }

  test("formatted() exposes window_end as the point timestamp with prefix") {
    val f = MetricsSink.formatted(points(), "custom.googleapis.com/")
    assert(f.columns.toSeq == Seq("timestamp", "metric_name", "value", "labels"))
    val names = f.select("metric_name").as[String].collect().toSet
    assert(names == Set("custom.googleapis.com/errors", "custom.googleapis.com/values"))
  }

  test("GCM request rows carry the minute-aligned gauge interval (metrics_exporter.py:76-78)") {
    val shaped = MetricsSink.gcmRequestShaped(
      MetricsSink.formatted(points(), "custom.googleapis.com/"))
    assert(shaped.columns.toSeq == Seq("metric_type", "resource_type", "labels",
      "double_value", "interval_end_seconds", "interval_start_seconds"))
    val rows = shaped
      .select($"interval_start_seconds", $"interval_end_seconds", $"resource_type")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, e) = (r.getLong(0), r.getLong(1))
      assert(s == e, "reference uses the SAME aligned second for start and end")
      assert(s % 60 == 0, "interval must be floored to the minute")
      assert(r.getString(2) == "global")
    }
    // windows close at :01/:02 minutes over 60-65-70s inputs → aligned
    // timestamps floor to exactly those minute marks
    val ends = shaped.select($"interval_end_seconds").as[Long].collect().toSet
    assert(ends == Set(120L))
  }

  test("failing sink: default mode logs and continues, strict mode fails") {
    val collectedOk = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    // sinks run on executors; in local mode a static set is visible
    MetricsSinkSpec.seen.clear()
    MetricsSink.writeBatch(
      MetricsSink.formatted(points()),
      name => new FailingSink("errors", new MetricsSink {
        def write(p: MetricPoint): Unit = MetricsSinkSpec.seen.add(p.metricName)
      }),
      strict = false)
    assert(MetricsSinkSpec.seen.contains("values") && !MetricsSinkSpec.seen.contains("errors"))

    intercept[org.apache.spark.SparkException] {
      MetricsSink.writeBatch(
        MetricsSink.formatted(points()),
        _ => new FailingSink("errors", new ConsoleSink),
        strict = true)
    }
    collectedOk.size() // silence unused warning
  }

  test("multiRouter: a failing target does not starve later targets") {
    MetricsSinkSpec.seen.clear()
    val ok = MetricsSink.Target("ok/",
      _ => new MetricsSink {
        def write(p: MetricPoint): Unit = MetricsSinkSpec.seen.add(p.metricName)
      })
    def boom(prefix: String) = MetricsSink.Target(prefix,
      _ => new MetricsSink {
        def write(p: MetricPoint): Unit = throw new RuntimeException(s"down: $prefix")
      })
    // strict mode: first target fails, the later target must STILL export,
    // and the batch as a whole must surface the failure
    val e = intercept[Exception] {
      MetricsSink.multiRouter(Seq(boom("a/"), ok, boom("b/")), strict = true)(points(), 0L)
    }
    assert(MetricsSinkSpec.seen.contains("ok/errors") &&
      MetricsSinkSpec.seen.contains("ok/values"),
      s"healthy target must export despite earlier failure, saw ${MetricsSinkSpec.seen}")
    assert(e.getSuppressed.length == 1, "second failure attached as suppressed")

    // non-strict: failures logged, call succeeds
    MetricsSinkSpec.seen.clear()
    MetricsSink.multiRouter(Seq(boom("a/"), ok), strict = false)(points(), 1L)
    assert(MetricsSinkSpec.seen.contains("ok/errors"))
  }

  test("JSON-files sink: formatted points round-trip through a json write") {
    // the at-scale file sink is the plain DataFrame json writer over the
    // formatted frame (one file per partition, no driver bottleneck) —
    // assert the round trip preserves every point
    val tmp = java.nio.file.Files.createTempDirectory("graft-json-sink").toString + "/points"
    // label-bearing defs: an empty labels map would be omitted per JSON
    // line and inference would drop the column entirely
    val df = Seq(
      (new java.sql.Timestamp(60000L), "ERROR", 10.0),
      (new java.sql.Timestamp(70000L), "INFO", 1.0)
    ).toDF("ts", "severity", "value")
    val defs = Seq(
      MetricDefinition("errors", MetricType.Count,
        Seq(FilterCondition("severity", "ERROR", "equals")),
        dynamicLabels = Map("sev" -> "severity"), windowSizeSec = 60),
      MetricDefinition("values", MetricType.Sum("value"),
        dynamicLabels = Map("sev" -> "severity"), windowSizeSec = 60))
    val f = MetricsSink.formatted(
      LogsToMetrics(defs, LogsToMetrics.Typed(df.schema))(df), "p/")
    f.write.json(tmp)
    val back = spark.read.json(tmp)
    assert(back.count() == f.count())
    val names = back.select("metric_name").as[String].collect().toSet
    assert(names == Set("p/errors", "p/values"))
    // values survive as doubles, labels as a struct/map per line
    assert(back.schema.fieldNames.toSet ==
      Set("timestamp", "metric_name", "value", "labels"))
  }

  test("prefixFor matches reference --export-type naming") {
    assert(MetricsSink.prefixFor(ExportTarget.Local) == "")
    assert(MetricsSink.prefixFor(ExportTarget.parse("monitoring", Some("p"))) ==
      "custom.googleapis.com/")
  }

  test("idempotent: replayed batchIds skip, failed attempts leave no marker") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("commitlog").toString
    val batch = Seq(1).toDF("x")
    var delivered = 0
    var failFirst = true
    val body: (org.apache.spark.sql.DataFrame, Long) => Unit = (_, _) => {
      if (failFirst) { failFirst = false; throw new RuntimeException("transient export error") }
      delivered += 1
    }
    val wrapped = MetricsSink.idempotent(dir)(body)
    // attempt 1 fails → no marker → streaming retries the SAME batchId
    intercept[RuntimeException](wrapped(batch, 7L))
    wrapped(batch, 7L) // retry delivers
    wrapped(batch, 7L) // replay after restart: marker present → skipped
    assert(delivered == 1, s"batch 7 must export exactly once, got $delivered")
    wrapped(batch, 8L) // a new batchId still flows
    assert(delivered == 2)
  }

  test("idempotent: markers behind the replay frontier are retired") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("commitlog2").toString
    val batch = Seq(1).toDF("x")
    val wrapped = MetricsSink.idempotent(dir, retainBatches = 3)((_, _) => ())
    (0L to 10L).foreach(wrapped(batch, _))
    val markers = new java.io.File(dir).list().filter(_.startsWith("batch-")).sorted
    // after batch 10 with retain=3, only ids >= 7 survive
    assert(markers.toSeq == Seq("batch-10", "batch-7", "batch-8", "batch-9"), markers.mkString(","))
  }
}

object MetricsSinkSpec {
  val seen: java.util.Set[String] = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
