package graft.pipeline

import graft.filter.FilterCompiler
import graft.model.{FilterCondition, MetricDefinition, MetricType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The core transform: N metric definitions over one record stream →
  * one aggregated point per (metric, label-set, window).
  *
  * Re-expresses /root/reference/beametrics/pipeline.py:164-208 (fan-out →
  * window assign → CombinePerKey(sum)) Spark-first:
  *
  *  - **Single scan, single shuffle.** Instead of the reference's
  *    per-element Python loop over configs (pipeline.py:168-178) or a
  *    unionByName of N filtered branches (which re-scans the source N
  *    times), each row builds an array of per-config structs, keeps only
  *    matching configs, and explodes. One pass over 100 TB, one
  *    hash-partial aggregation before the only exchange — Beam's combiner
  *    lifting ≡ Spark partial+final HashAggregate.
  *  - A disjunction of all config predicates is applied *before* the
  *    explode so non-matching rows never reach the generator; Catalyst
  *    pushes it into the parquet scan.
  *  - Window assignment is the reference's epoch-floor math
  *    (pipeline.py:67-70): `start = ts - (ts mod size)`, here in integer
  *    microseconds, supporting a different window size per config in the
  *    same single pass (Spark's `window()` needs a static size; this
  *    formulation doesn't).
  *  - Labels are canonicalized at *plan time* to a key-sorted
  *    `array<struct<key,value>>` (the reference sorts label tuples at
  *    runtime per element, pipeline.py:172); arrays of structs are
  *    orderable, so they group directly — no runtime canonicalization,
  *    no map-grouping limitation.
  *
  * Value semantics (pipeline.py:200-208): COUNT ⇒ 1.0 per row; SUM ⇒
  * `float(msg.get(field, 0))`, missing field ⇒ 0. Divergence (documented,
  * SURVEY.md §2.2): an unparsable string under SUM yields 0 instead of
  * crashing the job — `try_cast` + `coalesce`.
  *
  * Output schema:
  * `metric string, window_start timestamp, window_end timestamp,
  *  labels map<string,string>, value double`.
  */
object LogsToMetrics {

  private val LabelsType = "array<struct<key:string,value:string>>"

  /** Field access strategy: typed columns vs schemaless string map. */
  sealed trait Mode {
    def pred(conds: Seq[FilterCondition]): Column
    def sumValue(field: String): Column
    def labelValue(field: String): Column

    /** Nullable numeric read (no missing⇒0 coalerce) — min/max/avg exclude
      * missing/unparsable values instead of counting them as 0.
      */
    def numValue(field: String): Column
  }

  /** Records have a declared schema; field types known at plan time. */
  final case class Typed(schema: StructType) extends Mode {
    def pred(conds: Seq[FilterCondition]): Column = FilterCompiler.compile(conds, schema)
    def sumValue(field: String): Column =
      schema.fields.find(_.name == field) match {
        case None => lit(0.0) // msg.get(field, 0)
        case Some(f) =>
          f.dataType match {
            case _: NumericType => coalesce(col(field).cast(DoubleType), lit(0.0))
            case _              => coalesce(col(field).try_cast(DoubleType), lit(0.0))
          }
      }
    def labelValue(field: String): Column =
      if (schema.fieldNames.contains(field))
        coalesce(col(field).cast(StringType), lit("")) // str(msg.get(field, ""))
      else lit("")
    def numValue(field: String): Column =
      schema.fields.find(_.name == field) match {
        case None => lit(null).cast(DoubleType)
        case Some(f) =>
          f.dataType match {
            case _: NumericType => col(field).cast(DoubleType)
            case _              => col(field).try_cast(DoubleType)
          }
      }
  }

  /** Records are a `MapType(String,String)` column parsed from JSON. */
  final case class Schemaless(msgCol: String) extends Mode {
    private def f(field: String) = try_element_at(col(msgCol), lit(field))
    def pred(conds: Seq[FilterCondition]): Column =
      FilterCompiler.compileSchemaless(conds, col(msgCol))
    def sumValue(field: String): Column =
      coalesce(f(field).try_cast(DoubleType), lit(0.0))
    def labelValue(field: String): Column = coalesce(f(field), lit(""))
    def numValue(field: String): Column = f(field).try_cast(DoubleType)
  }

  /** The shared multi-config fan-out: keep rows matching ANY config (the OR
    * gate is pushdown-friendly), emit one struct per matching config,
    * explode. Used by both the batch transform and StreamingMetrics so the
    * fan-out semantics (null-pred handling, label canonicalization, value
    * projection) live in exactly one place.
    * Output: `_ts` + the per-config struct fields (+ `wsize` if requested).
    */
  private[graft] def fanOutExplode(
      df: DataFrame,
      defs: Seq[MetricDefinition],
      mode: Mode,
      tsCol: String,
      withWsize: Boolean): DataFrame = {
    require(defs.nonEmpty, "at least one metric definition")
    val pp = pctlPlan(defs)
    val perConfig: Seq[Column] = defs.map { d =>
      val fields =
        Seq(lit(d.name).as("metric")) ++
          (if (withWsize) Seq(lit(d.effectiveWindowSizeSec).as("wsize")) else Nil) ++
          Seq(
            lit(aggKind(d.metricType)).as("kind"),
            labelEntries(d, mode).as("labels"),
            valueCol(d, mode).as("value")) ++
          // pval/pval_a: buffered ONLY by their percentile aggregate — null
          // for every other config, so those groups buffer nothing
          (if (pp.withExact) Seq((d.metricType match {
            case MetricType.P50(_) => valueCol(d, mode)
            case _                 => lit(null).cast(DoubleType)
          }).as("pval")) else Nil) ++
          (if (pp.approxAccuracy.nonEmpty) Seq((d.metricType match {
            case MetricType.P50Approx(_, _) => valueCol(d, mode)
            case _                          => lit(null).cast(DoubleType)
          }).as("pval_a")) else Nil)
      when(mode.pred(d.filters), struct(fields: _*))
    }
    val anyMatch = defs.map(d => mode.pred(d.filters)).reduce(_ || _)
    // Accept TIMESTAMP_NTZ event-time columns too (DuckDB/pandas-written
    // parquet carries NTZ): under the engine's fixed UTC session timezone
    // the cast is the identity instant, and unix_micros downstream
    // requires the LTZ type.
    val tsAsLtz = df.schema.fields.find(_.name == tsCol).map(_.dataType.typeName) match {
      case Some("timestamp_ntz") => col(tsCol).cast("timestamp")
      case _                     => col(tsCol)
    }
    df.filter(anyMatch)
      .select(tsAsLtz.as("_ts"),
        explode(filter(array(perConfig: _*), c => c.isNotNull)).as("m"))
      .select(col("_ts"), col("m.*"))
  }

  def apply(defs: Seq[MetricDefinition], mode: Mode, tsCol: String = "ts")(
      df: DataFrame): DataFrame = {
    val pp = pctlPlan(defs)
    val aggs = aggValues(pp)
    fanOutExplode(df, defs, mode, tsCol, withWsize = true)
      // epoch-floor tumbling window in integer micros; per-config size.
      .withColumn("_wstart",
        (expr("unix_micros(_ts)") - pmod(expr("unix_micros(_ts)"), col("wsize") * 1000000L)))
      .groupBy(col("metric"), col("wsize"), col("kind"), col("_wstart"), col("labels"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        col("metric"),
        timestamp_micros(col("_wstart")).as("window_start"),
        timestamp_micros(col("_wstart") + col("wsize") * 1000000L).as("window_end"),
        map_from_entries(col("labels")).as("labels"),
        finalValue(pp).as("value"))
  }

  /** Which percentile aggregates this fan-out needs: exact median and/or
    * approx median (at the MAX declared accuracy — a summary built at
    * higher accuracy satisfies every lower-accuracy request).
    */
  final case class PctlPlan(withExact: Boolean, approxAccuracy: Option[Int])

  private[graft] def pctlPlan(defs: Seq[MetricDefinition]): PctlPlan = PctlPlan(
    withExact = defs.exists(_.metricType match {
      case MetricType.P50(_) => true
      case _ => false
    }),
    approxAccuracy = defs
      .collect { case d if d.metricType.isInstanceOf[MetricType.P50Approx] =>
        d.metricType.asInstanceOf[MetricType.P50Approx].accuracy
      }
      .reduceOption(_ max _))

  /** 0 = sum-like (count is sum of 1s), 1 = min, 2 = max, 3 = avg,
    * 4 = p50 (exact), 5 = p50 (approx).
    */
  private[graft] def aggKind(t: MetricType): Int = t match {
    case MetricType.Count | MetricType.Sum(_) => 0
    case MetricType.Min(_)                    => 1
    case MetricType.Max(_)                    => 2
    case MetricType.Avg(_)                    => 3
    case MetricType.P50(_)                    => 4
    case MetricType.P50Approx(_, _)           => 5
  }

  /** One pass computes all partial aggregates; kind picks the result.
    * The percentile aggregates are included ONLY when some config needs
    * them: both `percentile` (full buffer) and `percentile_approx`
    * (bounded quantile summary) are TypedImperativeAggregates, and their
    * mere presence downgrades the whole aggregation from codegen
    * HashAggregate to ObjectHashAggregate — count/sum-only fan-outs must
    * not pay that.
    */
  private[graft] def aggValues(pp: PctlPlan): Seq[Column] = Seq(
    sum(col("value")).as("_sum"),
    min(col("value")).as("_min"),
    max(col("value")).as("_max"),
    count(col("value")).as("_cnt")) ++
    (if (pp.withExact) Seq(percentile(col("pval"), lit(0.5)).as("_p50")) else Nil) ++
    pp.approxAccuracy.map(acc =>
      percentile_approx(col("pval_a"), lit(0.5), lit(acc)).as("_p50a")).toSeq

  private[graft] def finalValue(pp: PctlPlan): Column = {
    var c = when(col("kind") === 0, col("_sum"))
      .when(col("kind") === 1, col("_min"))
      .when(col("kind") === 2, col("_max"))
    if (pp.withExact) c = c.when(col("kind") === 4, col("_p50"))
    if (pp.approxAccuracy.nonEmpty) c = c.when(col("kind") === 5, col("_p50a"))
    c.otherwise(col("_sum") / col("_cnt")) // kind 3 = avg
  }

  /** Plan-time canonical labels: static ∪ dynamic, dynamic wins on key
    * conflict (pipeline.py:198), sorted by key (pipeline.py:172).
    */
  private[graft] def labelEntries(d: MetricDefinition, mode: Mode): Column = {
    val entries: Seq[(String, Column)] =
      (d.effectiveStaticLabels.view.mapValues(lit(_)).toSeq ++
        d.dynamicLabels.view.mapValues(mode.labelValue).toSeq).sortBy(_._1)
    if (entries.isEmpty) array().cast(LabelsType)
    else array(entries.map { case (k, v) => struct(lit(k).as("key"), v.as("value")) }: _*)
  }

  private[graft] def valueCol(d: MetricDefinition, mode: Mode): Column = d.metricType match {
    case MetricType.Count => lit(1.0)
    case MetricType.Sum(field) => mode.sumValue(field)
    case MetricType.Min(field) => mode.numValue(field)
    case MetricType.Max(field) => mode.numValue(field)
    case MetricType.Avg(field) => mode.numValue(field)
    case MetricType.P50(field) => mode.numValue(field)
    case MetricType.P50Approx(field, _) => mode.numValue(field)
  }
}
