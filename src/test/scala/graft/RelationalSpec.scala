package graft

import graft.ext.Relational
import org.apache.spark.sql.functions._

/** Relational EXT semantics the DuckDB oracles cannot check. */
class RelationalSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.01"

  test("deterministic HLL stays inside its error band vs exact") {
    // q_approx_distinct's ESTIMATE is oracle-checked (deterministic
    // registers); this pins the statistical contract hash equality can't:
    // m=64 ⇒ rsd ≈ 1.04/√64 = 13%, assert a 3-sigma band per group.
    val ev = Tables.events(spark, SfDir)
    val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("exact"))
    val approx = Relational
      .hllEstimate(Relational.hllRegisters(ev, "event_type", "user_id"))
      .select(col("s").as("event_type"), col("est").as("approx"))
    val joined = exact.join(approx, Seq("event_type")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val relErr = math.abs(a - e) / e
      assert(relErr <= 0.40, s"${r.getString(0)}: exact=$e approx=$a relErr=$relErr")
    }
  }

  test("deterministic HLL registers are mergeable: max-merge of halves == whole") {
    // The 100 TB contract: partial per-partition register frames combine
    // by MAX into exactly the registers of the full pass — so the estimate
    // of the union is computable from the parts without touching raw data.
    val ev = Tables.events(spark, SfDir)
    val whole = Relational.hllRegisters(ev, "event_type", "user_id")
    val lo = Relational.hllRegisters(ev.filter(col("user_id") % 2 === 0), "event_type", "user_id")
    val hi = Relational.hllRegisters(ev.filter(col("user_id") % 2 === 1), "event_type", "user_id")
    val merged = lo
      .unionByName(hi)
      .groupBy("s", "bucket")
      .agg(max(col("m")).as("m"))
    assert(merged.unionByName(whole).distinct().count() == whole.count(),
      "max-merged registers must equal the single-pass registers")
    assert(Relational.hllEstimate(merged).unionByName(Relational.hllEstimate(whole))
      .distinct().count() == Relational.hllEstimate(whole).count())
  }

  test("KMV bottom-k sketch: exact below k, within the KMV error band above it") {
    // q_distinct_kmv's estimate IS oracle-checked (deterministic bottom-k);
    // this pins the statistical contract the hash equality can't: accuracy
    // vs exact, and the exact-path guarantee for small sets.
    val spark0 = spark
    import spark0.implicits._
    val k = 64
    val m = math.pow(2, 60)
    def kmv(ids: Seq[Long]): Long = {
      val df = ids.distinct.toDF("id")
        .select(graft.ext.Dedup.md5Long(col("id").cast("string")).as("h"))
        .orderBy("h").limit(k)
      val rows = df.collect().map(_.getLong(0))
      if (rows.length < k) rows.length.toLong
      else math.floor((k - 1).toDouble * m / rows.max).toLong
    }
    // exact path: fewer than k distinct values reports exactly
    assert(kmv((1L to 40L)) == 40L)
    // estimate path: 2000 distinct values, KMV sigma ≈ 1/sqrt(k-2) ≈ 12.7%;
    // assert a generous 3-sigma band
    val est = kmv((1L to 2000L))
    assert(math.abs(est - 2000.0) / 2000.0 <= 0.38, s"est=$est for 2000 distinct")
  }

  test("KMV theta-sketch intersection: exact when both sets are below k, in-band above") {
    // q_kmv_intersect's estimate IS oracle-checked; this pins the set
    // algebra the hash equality can't: the estimator applied to known
    // sets. Deterministic hashes ⇒ deterministic estimates, no flake.
    val spark0 = spark
    import spark0.implicits._
    val k = 64
    val m = math.pow(2, 60)
    val mL = 1L << 60
    def est(a: Seq[Long], b: Seq[Long]): Long = {
      val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("s0", "id")
      val sk = Relational.kmvSketch(df, "s0", "id", k).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      def th(s: String) = {
        val hs = sk.filter(_._1 == s).map(_._2)
        if (hs.length < k) mL else hs.max
      }
      val theta = math.min(th("a"), th("b"))
      val ha = sk.filter(_._1 == "a").map(_._2).toSet
      val retained = sk.filter(_._1 == "b").map(_._2).count(h => ha.contains(h) && h < theta)
      math.floor(retained.toDouble * m / theta).toLong
    }
    // exact mode: both sets below k ⇒ θ = M, every hash retained ⇒ the
    // estimate IS the exact |A ∩ B|
    assert(est(1L to 40L, 21L to 60L) == 20L)
    // estimate mode: |A|=|B|=2000, |A∩B|=1000; retained ≈ k/2 ⇒ sigma ≈
    // 1/sqrt(32) ≈ 18% — assert a 3-sigma band (deterministic value)
    val e = est(1L to 2000L, 1001L to 3000L)
    assert(math.abs(e - 1000.0) / 1000.0 <= 0.55, s"est=$e for true 1000")
  }

  test("distDrift: hand-computed TVD, integer-exact per-bucket deviations") {
    val spark0 = spark
    import spark0.implicits._
    // ref = {5,10,60}, cur = {5,60,70,80}, width 50 ⇒ bucket0 ref2/cur1,
    // bucket1 ref1/cur3; p=(2/3,1/3), q=(1/4,3/4) ⇒ TVD = 5/12
    val df = Seq((5.0, true), (10.0, true), (60.0, true),
      (5.0, false), (60.0, false), (70.0, false), (80.0, false)).toDF("v", "ref")
    val out = Relational.distDrift(df, "v", col("ref"), width = 50.0)
      .orderBy("bucket")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (-1L, 3L, 4L, 1000000L, 1000000L, 416666L), // TVD = floor(10/24·1e6)
      (0L, 2L, 1L, 666666L, 250000L, 416666L),
      (1L, 1L, 3L, 333333L, 750000L, 416666L)))
  }

  test("audit operators: null operands fail checks; uniqueness and FK arithmetic exact") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (null, "a"), (60L, "c"))
      .toDF("v", "k")
    val rc = Relational
      .auditRowChecks(df,
        checks = Seq(
          "v_in_range" -> col("v").between(1, 50),
          "v_complete" -> col("v").isNotNull),
        uniqueChecks = Seq("k_unique" -> Seq("k")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // the NULL row fails the range check (null predicate = violation,
    // not a silent pass) alongside the out-of-range 60
    assert(rc("v_in_range") == ((4L, 2L)))
    assert(rc("v_complete") == ((4L, 1L)))
    assert(rc("k_unique") == ((4L, 1L))) // "a" appears twice
    val dim = Seq("a", "b").toDF("dk")
    val fk = Relational.auditReferential(df, "k_fk", "k", dim, "dk").collect().head
    // 3 DISTINCT fact keys checked, "c" is the one orphan KEY
    assert((fk.getString(0), fk.getLong(1), fk.getLong(2)) == (("k_fk", 3L, 1L)))
  }

  test("asofJoin: latest-at-or-before per key, inclusive ties, null before first dim") {
    val spark0 = spark
    import spark0.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val fact = Seq(
      (1L, "k1", ts(5)),   // before any dim → null
      (2L, "k1", ts(10)),  // == dim ts → inclusive match
      (3L, "k1", ts(25)),  // between dims → earlier dim
      (4L, "k1", ts(40)),  // after both → latest dim
      (5L, "k2", ts(100))  // key with no dim rows at all → null
    ).toDF("event_id", "user_id", "ts")
    val dim = Seq(("k1", ts(10), 100L), ("k1", ts(30), 300L)).toDF("user_id", "ts", "sid")
    val out = Relational.asofJoin(fact, dim, "user_id", "ts", "ts", Seq("sid"))
      .select($"event_id", $"sid")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out == Map(1L -> None, 2L -> Some(100L), 3L -> Some(100L),
      4L -> Some(300L), 5L -> None))
  }

  test("asofJoin: a matched dim row with NULL value yields NULL (no older-value leak)") {
    val spark0 = spark
    import spark0.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val fact = Seq((1L, "k1", ts(15)), (2L, "k1", ts(35))).toDF("event_id", "user_id", "ts")
    // the ts=30 dim row is the latest match for fact ts=35 and its value is
    // genuinely NULL — ASOF semantics return that row's NULL, not ts=10's 100
    val dim = Seq(("k1", ts(10), Some(100L)), ("k1", ts(30), None))
      .toDF("user_id", "ts", "sid")
    val out = Relational.asofJoin(fact, dim, "user_id", "ts", "ts", Seq("sid"))
      .select($"event_id", $"sid")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out == Map(1L -> Some(100L), 2L -> None))
  }

  test("asofJoin: reserved helper names and asof/fact column collisions are rejected") {
    val spark0 = spark
    import spark0.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val dim = Seq(("k1", ts(10), 1L)).toDF("user_id", "ts", "sid")
    val factReserved = Seq((1L, "k1", ts(15), 0)).toDF("event_id", "user_id", "ts", "__is_dim")
    intercept[IllegalArgumentException] {
      Relational.asofJoin(factReserved, dim, "user_id", "ts", "ts", Seq("sid"))
    }
    val factColliding = Seq((1L, "k1", ts(15), 9L)).toDF("event_id", "user_id", "ts", "sid")
    intercept[IllegalArgumentException] {
      Relational.asofJoin(factColliding, dim, "user_id", "ts", "ts", Seq("sid"))
    }
  }

  test("rangeJoinBucketed: equi-join on buckets, exact half-open bounds, no BNLJ") {
    val spark0 = spark
    import spark0.implicits._
    val fact = Seq((1L, 0.0), (2L, 49.999), (3L, 50.0), (4L, 99.9), (5L, 100.0))
      .toDF("id", "v")
    val bands = Seq((0.0, 50.0, "a"), (50.0, 100.0, "b")).toDF("lo", "hi", "band")
    val joined = Relational.rangeJoinBucketed(fact, "v", bands, "lo", "hi", 25.0)
    val out = joined.select($"id", $"band").as[(Long, String)].collect().toMap
    // 100.0 falls outside every half-open band
    assert(out == Map(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("rangeJoinBucketed: exact at tiny widths, edge-aligned hi, empty intervals") {
    val spark0 = spark
    import spark0.implicits._
    // widths at/below the old 1e-9 epsilon used to under-cover buckets;
    // the ceil-based last bucket is magnitude-independent
    val fact = Seq((1L, 0.0), (2L, 4.0e-10), (3L, 9.99e-10), (4L, 1.0e-9)).toDF("id", "v")
    val bands = Seq(
      (0.0, 1.0e-9, "tiny"),  // half-open, one epsilon wide
      (5.0, 5.0, "empty"),    // hi == lo ⇒ matches nothing, no bucket rows
      (7.0, 3.0, "invalid")   // inverted ⇒ matches nothing
    ).toDF("lo", "hi", "band")
    val out = Relational.rangeJoinBucketed(fact, "v", bands, "lo", "hi", 5.0e-10)
      .select($"id", $"band").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "tiny", 2L -> "tiny", 3L -> "tiny"))
  }

  test("hll sketches merge across a parquet round-trip to the exact answer's tolerance") {
    val ev = Tables.events(spark, SfDir)
    val exact = ev.agg(count_distinct(col("user_id"))).head().getLong(0).toDouble
    // fine-grained sketches (per event_type), persisted, re-read, merged to
    // the global estimate — the incremental rollup path: no raw-data rescan
    val sketches = Relational.hllSketches(ev, Seq("event_type"), "user_id")
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    try {
      sketches.write.mode("overwrite").parquet(s"$dir/sketches.parquet")
      val reread = spark.read.parquet(s"$dir/sketches.parquet")
      val est = Relational.hllRollup(reread, Seq.empty).head().getAs[Long]("estimate").toDouble
      val relErr = math.abs(est - exact) / exact
      assert(relErr <= 0.05, s"exact=$exact est=$est relErr=$relErr")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("argMaxJoin: latest payload per key via hash agg + join, no SortAggregate") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, 10L, "a"), (1L, 30L, "c"), (1L, 20L, "b"), (2L, 5L, "x"))
      .toDF("k", "seq", "payload")
    val out = Relational.argMaxJoin(df, "k", "seq", Seq("payload"))
    val rows = out.select($"k", $"payload", $"n_rows").as[(Long, String, Long)]
      .collect().toSet
    assert(rows == Set((1L, "c", 3L), (2L, "x", 1L)))
    // the point of the join-back form: the aggregate stays hash-based even
    // with a string payload (max_by would demote to SortAggregate)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), s"expected hash aggregation:\n$plan")
  }

  test("gapFill zero-fills missing buckets across the global range per key") {
    val spark0 = spark
    import spark0.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // key a: buckets 0 and 120 (gap at 60); key b: only bucket 60 — the
    // spine still spans [0, 120] for BOTH keys
    val df = Seq(("a", ts(10)), ("a", ts(130)), ("a", ts(135)), ("b", ts(70)))
      .toDF("k", "ts")
    val out = Relational.gapFill(df, "ts", "k", bucketSec = 60)
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", 0L, 1L), ("a", 60L, 0L), ("a", 120L, 2L),
      ("b", 0L, 0L), ("b", 60L, 1L), ("b", 120L, 0L)))
  }

  test("histogram: floor bucketing with exact lower edges") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(0.0, 24.999, 25.0, 49.9, 75.0).toDF("v")
    val out = Relational.histogram(df, "v", width = 25.0)
      .as[(Long, Double, Long)].collect().toSet
    assert(out == Set((0L, 0.0, 2L), (1L, 25.0, 2L), (3L, 75.0, 1L)))
  }

  test("topKPerGroup ranks deterministically under ties") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("g", "b", 5L), ("g", "a", 5L), ("g", "c", 5L), ("g", "d", 1L))
      .toDF("grp", "entity", "score")
    val top = Relational
      .topKPerGroup(df, Seq("grp"), Seq(col("score").desc, col("entity").asc), 2)
      .select($"entity", $"rank")
      .as[(String, Int)]
      .collect()
      .toSet
    // equal scores break ties on the entity column — stable across runs
    assert(top == Set(("a", 1), ("b", 2)))
  }

  test("funnel semantics triad: unwindowed vs first-touch vs re-anchoring existence") {
    val spark0 = spark
    import spark0.implicits._
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // u1: first view's window expires (click 3 h later), but a SECOND
    // view at 4 h converts at 5 h — the exact case separating the three
    val ev = Seq(
      (1L, "view", at(0)), (1L, "click", at(3 * 3600)),
      (1L, "view", at(4 * 3600)), (1L, "click", at(5 * 3600)),
      (2L, "view", at(10)), (2L, "click", at(20)) // converts under all three
    ).toDF("user_id", "event_type", "ts")
    def counts(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val steps = Seq("view", "click")
    val plain = counts(Relational.funnel(ev, "user_id", "ts", "event_type", steps))
    val firstTouch = counts(Relational.funnel(ev, "user_id", "ts", "event_type", steps,
      maxGapSec = Some(3600L)))
    val exists = counts(Relational.funnelReanchor(ev, "user_id", "ts", "event_type", steps,
      maxGapSec = 3600L))
    assert(plain(2) == 2, "no window: both users convert")
    assert(firstTouch(2) == 1, "first-touch: u1's first anchor expired, no re-anchor")
    assert(exists(2) == 2, "existence: u1's second view-click chain qualifies")
    // boundary: conversion exactly AT the gap is inclusive; 1 ms past is not
    val edge = Seq((1L, "view", at(0)), (1L, "click", at(3600))).toDF("user_id", "event_type", "ts")
    assert(counts(Relational.funnelReanchor(edge, "user_id", "ts", "event_type", steps, 3600L))(2) == 1)
    val past = Seq(
      (1L, "view", new java.sql.Timestamp(0L)),
      (1L, "click", new java.sql.Timestamp(3600L * 1000L + 1L))
    ).toDF("user_id", "event_type", "ts")
    assert(counts(Relational.funnelReanchor(past, "user_id", "ts", "event_type", steps, 3600L))(2) == 0)
    // same-ms tie must not SHADOW: click@5s bumps the click stage at the
    // same ms as purchase@5s arrives — the purchase still chains through
    // the EARLIER click@10ms (per-millisecond folding, review finding)
    val tie = Seq(
      (1L, "view", new java.sql.Timestamp(0L)),
      (1L, "click", new java.sql.Timestamp(10L)),
      (1L, "click", new java.sql.Timestamp(5000L)),
      (1L, "purchase", new java.sql.Timestamp(5000L))
    ).toDF("user_id", "event_type", "ts")
    val triSteps = Seq("view", "click", "purchase")
    assert(counts(Relational.funnelReanchor(tie, "user_id", "ts", "event_type",
      triSteps, 7200L))(3) == 1,
      "purchase@5000ms must chain via click@10ms despite the same-ms click")
    // empty input: zero counts, never NULL
    val none = Seq.empty[(Long, String, java.sql.Timestamp)].toDF("user_id", "event_type", "ts")
    assert(counts(Relational.funnelReanchor(none, "user_id", "ts", "event_type", steps, 60L))
      == Map(1 -> 0L, 2 -> 0L))
  }

  test("rollingDistinctHll tracks the exact rolling distinct within sketch error") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val exact = Relational.rollingDistinct(ev, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val approx = Relational.rollingDistinctHll(ev, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet, "same day spine incl. trailing-edge trim")
    // lgK=12 rsd ~1.6%; 5% envelope absorbs small-count quantization
    exact.foreach { case (day, n) =>
      val a = approx(day)
      assert(math.abs(a - n) <= math.max(3L, (n * 0.05).toLong),
        s"day $day: approx $a vs exact $n")
    }
  }

  test("richInactive: threshold + anti-join verified where a real population survives") {
    // the driver fixtures have ~zero order-less customers, so the declared
    // q_rich_inactive row is near-vacuous — this synthesizes frames where
    // both gates (above-mean balance, no orders) each cut a known set,
    // and checks against a driver-side brute force
    val spark0 = spark
    import spark0.implicits._
    // 60 customers over 3 nations; balance = 10·key cents (mean rises with
    // key), negative-balance customer 999 excluded from the mean base
    val cust = ((1L to 60L).map(k => (k, (k % 3).toInt, k * 0.10)) :+
      (999L, 0, -5.0)).toDF("c_custkey", "c_nationkey", "c_acctbal")
    // customers with key % 4 == 0 have orders (incl. some above-mean ones)
    val orders = (1L to 60L).filter(_ % 4 == 0).map(k => Tuple1(k)).toDF("o_custkey")
    val got = Relational.richInactive(cust, orders)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // brute force in plain Scala, same cents quantization
    val cents = (1L to 60L).map(k => (k, (k % 3).toInt, (k * 10).toLong)) :+
      (999L, 0, -500L)
    val pos = cents.filter(_._3 > 0)
    val (n, s) = (pos.size.toLong, pos.map(_._3).sum)
    val expectRows = cents
      .filter { case (k, _, c) => c * n > s && k % 4 != 0 }
    val expect = expectRows.groupBy(_._2).map { case (nat, rows) =>
      nat -> (rows.size.toLong, rows.map(_._3).sum / 100.0)
    }
    assert(expectRows.size >= 15,
      s"test data must leave a meaningful surviving population, got ${expectRows.size}")
    assert(got == expect, s"got $got\nexpected $expect")
  }

  test("bootstrapMean: Poisson(1) weights, envelope brackets the mean, deterministic") {
    import graft.ext.Relational
    import spark.implicits._
    // weights must behave like Poisson(1): mean ≈ 1, P(0) ≈ e^-1
    val n = 20000
    val h = graft.ext.Dedup.md5Long($"id".cast("string"))
    val w = spark.range(n)
      .select(Relational.bootWeight(lit(7),
        h.bitwiseAND(lit((1L << 30) - 1)), shiftright(h, 30), reps = 32).as("w"))
      .groupBy("w").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mean = w.map { case (k, c) => k.toLong * c }.sum.toDouble / n
    assert(math.abs(mean - 1.0) < 0.05, s"Poisson(1) weight mean ≈ 1, got $mean")
    val p0 = w.getOrElse(0, 0L).toDouble / n
    assert(math.abs(p0 - math.exp(-1)) < 0.02, s"P(w=0) ≈ 1/e, got $p0")
    assert(w.keys.forall(k => k >= 0 && k <= 6))
    // envelope law on a two-group frame
    val df = (1 to 500).map(i => ("a", i.toLong, (i % 37).toLong)) ++
      (1 to 400).map(i => ("b", 1000L + i, (i % 11).toLong))
    val out = Relational.bootstrapMean(df.toDF("g", "k", "v"), "g", "k", "v", reps = 32)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out.foreach { case (g, (m, lo, hi)) =>
      assert(lo <= m && m <= hi, s"group $g: envelope [$lo, $hi] must bracket mean $m")
      assert(lo < hi, s"group $g: 32 replicates must spread")
    }
    // deterministic end to end: a second evaluation is bit-identical
    val again = Relational.bootstrapMean(df.toDF("g", "k", "v"), "g", "k", "v", reps = 32)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(again == out)
  }

  test("ewmaInteger: hand-checked recurrence, per-key isolation, constant fixpoint") {
    import spark.implicits._
    val series = Seq(
      // key a: 100, 0, 0 → s = 100, floor(75*100/100)=75, floor(75*75/100)=56
      ("a", 1L, 100L), ("a", 2L, 0L), ("a", 3L, 0L),
      // key b: constant series is an EWMA fixpoint at any α
      ("b", 1L, 40L), ("b", 2L, 40L), ("b", 3L, 40L),
      // key c: single bucket → s_0 = x_0 regardless of α
      ("c", 9L, 7L)
    ).toDF("k", "b", "x")
    val out = Relational.ewmaInteger(series, "k", "b", "x", aNum = 25, aDen = 100)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out === Map(
      ("a", 1L) -> 100L, ("a", 2L) -> 75L, ("a", 3L) -> 56L,
      ("b", 1L) -> 40L, ("b", 2L) -> 40L, ("b", 3L) -> 40L,
      ("c", 9L) -> 7L))
    // smoothing law: for a step-to-zero input, s_t = floor(s_{t-1}·(1−α))
    // decays monotonically but never crosses zero from a positive start
    val long = (1 to 40).map(i => ("d", i.toLong, if (i == 1) 1000000L else 0L))
    val decay = Relational.ewmaInteger(long.toDF("k", "b", "x"), "k", "b", "x", 25, 100)
      .orderBy("b").collect().map(_.getLong(3))
    assert(decay.head === 1000000L && decay.zip(decay.tail).forall { case (p, n) => n <= p }
      && decay.forall(_ >= 0L))
  }

  test("holtInteger: hand-checked level/trend, truncating division on negatives") {
    import spark.implicits._
    val series = Seq(
      ("a", 1L, 100L), ("a", 2L, 0L), ("a", 3L, 0L),
      // key b: gentle downtick — trend numerator −20 must TRUNCATE to 0
      // (floor semantics would give −1; DuckDB // truncates)
      ("b", 1L, 100L), ("b", 2L, 98L)
    ).toDF("k", "b", "x")
    val out = Relational.holtInteger(series, "k", "b", "x",
      aNum = 30, aDen = 100, bNum = 20, bDen = 100)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // a: l₀=100,t₀=0 → l=(70·100)q100=70, t=(20·−30)q100=−6
    //    → l=(70·64)q100=44, t=(20·−26+80·−6)q100=(−1000)q100=−10
    assert(out(("a", 1L)) == ((100L, 0L, 100L)))
    assert(out(("a", 2L)) == ((70L, -6L, 64L)))
    assert(out(("a", 3L)) == ((44L, -10L, 34L)))
    // b: l=(30·98+7000)q100=99, t=(20·(99−100))q100 = −20 q 100 = 0 (trunc)
    assert(out(("b", 2L)) == ((99L, 0L, 99L)))
  }

  test("intervalJoinBucketed: one match per overlapping pair, half-open edges") {
    import spark.implicits._
    // pair (1, 10) spans MANY shared buckets (width 10) — must match ONCE;
    // (2, 20) touch exactly at 100 (half-open ⇒ no overlap);
    // (3, 30) disjoint; (4, 40) contained interval
    val left = Seq(
      (1L, 0L, 100L), (2L, 90L, 100L), (3L, 0L, 10L), (4L, 50L, 90L)
    ).toDF("lid", "a_lo", "a_hi")
    val right = Seq(
      (10L, 5L, 95L), (20L, 100L, 120L), (30L, 500L, 510L), (40L, 60L, 70L)
    ).toDF("rid", "b_lo", "b_hi")
    val out = Relational
      .intervalJoinBucketed(left, "a_lo", "a_hi", right, "b_lo", "b_hi", bucketWidth = 10L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // exact expected set = the theta-join truth: every (l, r) with
    // l.lo < r.hi && r.lo < l.hi, each exactly once
    val ls = Seq((1L, 0L, 100L), (2L, 90L, 100L), (3L, 0L, 10L), (4L, 50L, 90L))
    val rs = Seq((10L, 5L, 95L), (20L, 100L, 120L), (30L, 500L, 510L), (40L, 60L, 70L))
    val expected = (for {
      (li, llo, lhi) <- ls; (ri, rlo, rhi) <- rs
      if llo < rhi && rlo < lhi
    } yield (li, ri)).sorted
    assert(out.toSeq === expected)
    assert(expected.contains((1L, 10L)) && !expected.contains((2L, 20L)))
  }

  test("mergeIntervals: overlapping and touching spans merge, gaps split islands") {
    import spark.implicits._
    val iv = Seq(
      // key a: [0,10) + [5,20) overlap; [20,30) touches (half-open ⇒ merge);
      // [40,50) is a new island
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 30L), ("a", 40L, 50L),
      // key b: contained interval collapses into its container
      ("b", 0L, 100L), ("b", 10L, 20L)
    ).toDF("k", "lo", "hi")
    val out = Relational.mergeIntervals(iv, Seq("k"), "lo", "hi")
      .select("k", "lo", "hi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(out.toSeq === Seq(("a", 0L, 30L), ("a", 40L, 50L), ("b", 0L, 100L)))
  }

  test("madOutliers: hand-checked median/MAD, spike flagged, constant series silent") {
    import spark.implicits._
    val df = Seq(
      // key a: values 1..5 plus spike 100 → med of {1,2,3,4,5,100} = 3.5,
      // |x−med| = {2.5,1.5,0.5,0.5,1.5,96.5} → MAD = 1.5; only 100 exceeds 3·1.5
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0), ("a", 100.0),
      // key b: constant series — MAD 0, strict > never fires
      ("b", 7.0), ("b", 7.0), ("b", 7.0)
    ).toDF("k", "x")
    val out = Relational.madOutliers(df, Seq("k"), "x", k = 3.0)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(("a", 3.0)) == ((3.5, 1.5, false)))
    assert(out(("a", 100.0)) == ((3.5, 1.5, true)))
    assert(out.count { case ((k, _), (_, _, flag)) => k == "a" && flag } == 1)
    assert(out(("b", 7.0)) == ((7.0, 0.0, false)))
  }

  test("marketBasket: hand-computed support/confidence/lift, set semantics per basket") {
    val spark0 = spark
    import spark0.implicits._
    // t1{A,B} (A duplicated — must count once), t2{A,B}, t3{A,B,C}, t4{A,C}, t5{B}
    val baskets = Seq(
      (1L, "A"), (1L, "B"), (1L, "A"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "C"),
      (4L, "A"), (4L, "C"),
      (5L, "B")).toDF("tx", "item")
    val out = Relational
      .marketBasket(baskets, "tx", "item", minItemSupport = 2, minPairSupport = 2)
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect()
    // freq A=4 B=4 C=2; pairs (A,B)=3 (A,C)=2 (B,C)=1 < minPairSupport; n_tx=5
    // conf(A→B) = 3e6 DIV 4 = 750000; lift(A,B) = 3·5e6 DIV 16 = 937500
    // conf(A→C) = 2e6 DIV 4 = 500000; conf(C→A) = 2e6 DIV 2 = 1000000;
    // lift(A,C) = 2·5e6 DIV 8 = 1250000
    assert(out.toSeq == Seq(
      ("A", "B", 3L, 4L, 4L, 750000L, 750000L, 937500L),
      ("A", "C", 2L, 4L, 2L, 500000L, 1000000L, 1250000L)))
  }

  test("q_markov_transitions: counts conserve and truncated probabilities sum to ~1e6") {
    val rows = graft.SparkEntry.queries("q_markov_transitions")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val total = rs.head.getLong(3)
      assert(rs.forall(_.getLong(3) == total), s"$src: src_total must be constant per src")
      assert(rs.map(_.getLong(2)).sum == total, s"$src: transition counts must sum to src_total")
      val pSum = rs.map(_.getLong(4)).sum
      // each ×10⁶ quotient truncates < 1, so the row sum sits in (1e6 - #rows, 1e6]
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length, s"$src: pSum=$pSum")
    }
  }

  test("q_trimmed_mean matches an independent driver-side exact trim (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_trimmed_mean")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val raw = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    raw.groupBy(_._1).foreach { case (flag, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3, r._4)).map(_._2)
      val k = sorted.length / 10
      val kept = sorted.slice(k, sorted.length - k)
      val (n, s) = (kept.length.toLong, kept.sum)
      assert(got(flag) == ((n, s, s.toDouble / n)), s"flag=$flag")
    }
  }

  test("q_gini_revenue matches an independent driver-side recompute (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val r = graft.SparkEntry.queries("q_gini_revenue")(spark, dir).collect().head
    val cents = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("dollars"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(x => (x._2, x._1))
      .map(_._2)
    val n = cents.length.toLong
    val total = cents.sum
    val s2 = cents.zipWithIndex.map { case (x, i0) => 2L * (i0 + 1) * x }.sum
    val num = s2 - (n + 1) * total
    assert(r.getLong(0) == n && r.getLong(1) == total && r.getLong(2) == num)
    assert(r.getDouble(3) == num.toDouble / (n * total).toDouble)
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0)
  }

  test("q_weekday_seasonality: residuals cancel within each weekday") {
    val rows = graft.SparkEntry.queries("q_weekday_seasonality")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(1)).foreach { case (dow, rs) =>
      val residSum = rs.map(_.getDouble(4)).sum
      val scale = rs.map(r => math.abs(r.getLong(2).toDouble)).sum.max(1.0)
      assert(math.abs(residSum) / scale < 1e-9, s"dow=$dow residSum=$residSum")
      // seasonal is the same value on every day of the weekday
      assert(rs.map(_.getDouble(3)).distinct.length == 1, s"dow=$dow")
    }
  }

  test("q_disorder_histogram conserves the event count and caps buckets at 9") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_disorder_histogram")(spark, dir).collect()
    val nEvents = Tables.events(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == nEvents)
    rows.foreach { r =>
      val (bucket, lagMax) = (r.getLong(0), r.getLong(3))
      assert(bucket >= 0 && bucket <= 9)
      if (bucket < 9) assert(lagMax < 600 * (bucket + 1), s"bucket=$bucket lagMax=$lagMax")
      assert(lagMax >= 600 * bucket || bucket == 0, s"bucket=$bucket lagMax=$lagMax")
    }
    // the scramble must actually create disorder — not all mass in bucket 0
    assert(rows.exists(r => r.getLong(0) > 0 && r.getLong(1) > 0))
  }

  test("q_autocorrelation matches an independent driver-side recompute (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_autocorrelation")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")
        .as("epoch_day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("day_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val s = daily.map(_._2).sum
    val dev = daily.map { case (_, x) => (n * x - s).toDouble }
    val den = dev.map(d => math.floor(d * d / 1e12).toLong).sum
    (1 to 7).foreach { k =>
      val pairs = dev.indices.dropRight(k).map(i => (dev(i), dev(i + k)))
      val num = pairs.map { case (a, b) => math.floor(a * b / 1e12).toLong }.sum
      assert(got(k.toLong) == ((pairs.length.toLong, num, den, num.toDouble / den.toDouble)),
        s"lag $k")
      // a one-number sanity: scaled ACF stays inside the theoretical band
      assert(math.abs(num.toDouble / den.toDouble) <= 1.0 + 1e-9, s"lag $k out of [-1,1]")
    }
  }

  test("q_cusum_changepoint matches the driver-side peak scan (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_cusum_changepoint")(spark, dir)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2))).toSeq
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")
        .as("epoch_day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("day_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val s = daily.map(_._2).sum
    val cusum = daily.map { case (d, x) => (d, n * x - s) }
      .scanLeft((0L, 0L)) { case ((_, acc), (d, v)) => (d, acc + v) }.tail
    val want = cusum.sortBy { case (d, c) => (-math.abs(c), d) }.take(5)
      .zipWithIndex.map { case ((d, c), i) => ((i + 1).toLong, d, c) }.toSeq
    assert(got == want)
    // the LAST cumulative value is exactly zero by construction: Σ(n·x−S)=0
    assert(cusum.last._2 == 0L)
  }

  test("q_target_encoding: LOO recomputes exactly and excludes the own row") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_target_encoding")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    val bySeg = rows.groupBy(_._2)
    bySeg.foreach { case (seg, rs) =>
      val n = rs.length.toLong
      val s = rs.map(_._3).sum
      rs.foreach { case (ok, _, cents, num, den, loo) =>
        assert(num == s - cents, s"seg=$seg order=$ok")
        assert(den == n - 1)
        assert(loo == num.toDouble / den.toDouble)
      }
      // leakage check: an extreme row's own value must not move its code —
      // the max row's LOO mean is strictly below the plain group mean
      val maxRow = rs.maxBy(_._3)
      assert(maxRow._6 < s.toDouble / n, s"seg=$seg: LOO failed to exclude the max row")
    }
  }

  test("q_pareto_frontier: kept points are mutually non-dominated and complete") {
    val dir = "/root/testdata/sf0.001"
    val pts = Tables.part(spark, dir)
      .select(floor(col("p_retailprice") * 100).cast("long"), col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = graft.SparkEntry.queries("q_pareto_frontier")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    def dominated(p: (Long, Long)) = pts.exists(q =>
      q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2))
    // soundness: every emitted (price, size) is an actual non-dominated point
    got.foreach { case (pc, sz, n) =>
      assert(pts.count(p => p._1 == pc && p._2 == sz) == n.toInt)
      assert(!dominated((pc, sz)), s"($pc, $sz) is dominated")
    }
    // completeness: every non-dominated input point is emitted
    val frontierPts = pts.filter(p => !dominated(p)).distinct.sorted.toSeq
    assert(got.map(r => (r._1, r._2)).sorted.toSeq == frontierPts)
  }

  test("q_gapfill_interp: knowns exact, gaps on the integer line between neighbors") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_gapfill_interp")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    val known = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        (floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.nonEmpty)
    // the spine is dense: same bucket set for every type, step 86400
    val byType = got.groupBy(_._1._1)
    val spines = byType.values.map(_.map(_._1._2).sorted.toSeq).toSet
    assert(spines.size == 1)
    spines.head.sliding(2).foreach {
      case Seq(a, b) => assert(b - a == 86400L)
      case _ =>
    }
    got.foreach { case ((t, bkt), (k, q6)) =>
      known.get((t, bkt)) match {
        case Some(c) => assert(k == 1L && q6 == c * 1000000L, s"$t@$bkt")
        case None =>
          assert(k == 0L)
          val ks = known.keys.filter(_._1 == t).map(_._2)
          val prev = ks.filter(_ < bkt)
          val next = ks.filter(_ > bkt)
          val want =
            if (prev.isEmpty) known((t, next.min)) * 1000000L
            else if (next.isEmpty) known((t, prev.max)) * 1000000L
            else {
              val (pb, nb) = (prev.max, next.min)
              val (pv, nv) = (known((t, pb)), known((t, nb)))
              (pv * (nb - bkt) + nv * (bkt - pb)) * 1000000L / (nb - pb)
            }
          assert(q6 == want, s"$t@$bkt")
      }
    }
  }

  test("q_benford_digits: digits partition positive totals, shares recompute") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_benford_digits")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nPos = Tables.orders(spark, dir)
      .filter(floor(col("o_totalprice") * 100) > 0).count()
    assert(rows.map(_._2).sum == nPos)
    val total = rows.map(_._2).sum
    rows.foreach { case (d, n, q6) =>
      assert(d.length == 1 && d >= "1" && d <= "9")
      assert(q6 == n * 1000000L / total)
    }
    // exact cross-check of one digit against a string recompute
    val d1 = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .collect().count(_.getLong(0).toString.startsWith("1"))
    assert(rows.find(_._1 == "1").map(_._2).contains(d1.toLong))
  }

  test("clampedBalance: hand recurrence with clamps and key boundaries") {
    val spark0 = spark
    import spark0.implicits._
    // key 1: 5, -3, -10 (2-10=-8 → clamp, bal 0), 4  ⇒ (4, 1 clamp, 4 rows)
    // key 2: -1 (clamp at first row), 7               ⇒ (7, 1 clamp, 2 rows)
    // key 3: all positive, never clamps               ⇒ (6, 0, 3)
    val in = Seq(
      (1L, 1L, 1L, 5L), (1L, 2L, 1L, -3L), (1L, 3L, 1L, -10L), (1L, 4L, 1L, 4L),
      (2L, 1L, 1L, -1L), (2L, 2L, 1L, 7L),
      (3L, 1L, 1L, 1L), (3L, 2L, 1L, 2L), (3L, 3L, 1L, 3L)
    ).toDF("k", "s1", "s2", "delta")
    val got = Relational.clampedBalance(in, "k", "s1", "s2", "delta")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 4L, 1L, 4L), (2L, 7L, 1L, 2L), (3L, 6L, 0L, 3L)))
  }

  test("q_clamped_balance matches a driver-side sequential fold (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_clamped_balance")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"), col("event_id"),
        when(col("event_type") === "purchase",
          floor(coalesce(col("value"), lit(0.0)) * 100).cast("long"))
          .otherwise(lit(-500L)).as("delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val fold = rows.sortBy(r => (r._2, r._3)).map(_._4)
        .foldLeft((0L, 0L)) { case ((bal, cl), d) =>
          val nb = bal + d
          (math.max(0L, nb), cl + (if (nb < 0L) 1L else 0L))
        }
      u -> ((fold._1, fold._2, rows.length.toLong))
    }
    assert(got == want)
    // the clamp must actually engage somewhere, or the fixture proves nothing
    assert(want.values.exists(_._2 > 0))
  }

  test("q_abc_analysis: classes partition parts and shares recompose the total") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_abc_analysis")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).sorted.toSeq == Seq("A", "B", "C"))
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).sum == perPart.length)
    val total = perPart.map(_._2).sum
    assert(rows.map(_._3).sum == total)
    // driver-side reclassification along the same total order
    val sorted = perPart.sortBy(p => (-p._2, p._1))
    val classes = sorted.scanLeft(0L)(_ + _._2).tail.map { cum =>
      if (cum * 100 <= total * 80) "A" else if (cum * 100 <= total * 95) "B" else "C"
    }
    val want = classes.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == want)
    // intensity law (holds on ANY distribution since A takes the top
    // ranks): revenue per part is non-increasing A → B → C
    val m = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("A")._2 * m("B")._1 >= m("B")._2 * m("A")._1)
    assert(m("B")._2 * m("C")._1 >= m("C")._2 * m("B")._1)
  }

  test("q_churn_labels: windows are strict and labels come only from the future side") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_churn_labels")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("s"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val t = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val d = 30L * 86400L
    val want = ev.groupBy(_._1).flatMap { case (u, rs) =>
      val feat = rs.filter(r => r._2 >= t - d && r._2 < t)
      val lab = rs.exists(r => r._2 >= t && r._2 < t + 86400L && r._3 == "purchase")
      if (feat.isEmpty) None
      else Some(u -> ((feat.count(_._3 == "click").toLong, feat.count(_._3 == "view").toLong,
        feat.count(_._3 == "error").toLong, feat.length.toLong, if (lab) 1L else 0L)))
    }
    assert(got == want)
    // both label values must occur or the training table is degenerate
    assert(got.values.exists(_._5 == 1L) && got.values.exists(_._5 == 0L))
  }

  test("q_mergeable_quantiles: merge-invariant estimates within the bucket error bound") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_mergeable_quantiles")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(50L, 90L, 99L))
    rows.foreach { case (p, n, estD, estM, exact) =>
      // the mergeability LAW: sharding + integer addition must be invisible
      assert(estD == estM, s"p=$p: direct $estD != merged $estM")
      // two-digit buckets ⇒ width/lo ≤ 1/10 ⇒ midpoint within ~5 % relative
      assert(math.abs(estD - exact) / exact <= 0.06,
        s"p=$p: est $estD vs exact $exact outside the bucket bound")
      assert(n > 0 && estD > 0)
    }
    // estimates are monotone in p — a walk bug would reorder them
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
  }

  test("q_seasonal_outliers: per-weekday median/MAD recompute, strict flag") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_seasonal_outliers")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))
    assert(rows.nonEmpty)
    // Spark percentile(0.5) interpolation: idx = (n-1)/2 over the sorted values
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = (s.length - 1) * 0.5
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    rows.groupBy(_._2).foreach { case (dow, rs) =>
      val med = median(rs.map(r => r._3.toDouble))
      val mad = median(rs.map(r => math.abs(r._3.toDouble - med)))
      rs.foreach { case (day, _, cents, gotMed, gotMad, flag) =>
        assert(gotMed == med && gotMad == mad, s"dow=$dow day=$day")
        assert(flag == (math.abs(cents.toDouble - med) > 3.0 * mad), s"day=$day")
      }
    }
    // the seasonal grouping must matter: at least one flag somewhere
    assert(rows.exists(_._6))
  }

  test("q_rolling_corr: r matches a driver-side 7-day moment recompute, bounded") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_rolling_corr")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(_._1)
    assert(got.nonEmpty)
    val daily = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "error"))
      .groupBy((floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("day"))
      .agg(sum((col("event_type") === "click").cast("long")).as("c"),
        sum((col("event_type") === "error").cast("long")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val want = daily.sliding(7).map { win =>
      val (day, _, _) = win.last
      val n = 7L
      val (sc, se) = (win.map(_._2).sum, win.map(_._3).sum)
      val sce = win.map(r => r._2 * r._3).sum
      val (scc, see) = (win.map(r => r._2 * r._2).sum, win.map(r => r._3 * r._3).sum)
      val (vc, ve) = (n * scc - sc * sc, n * see - se * se)
      val r = if (vc > 0 && ve > 0)
        Some((n * sce - sc * se).toDouble / (math.sqrt(vc.toDouble) * math.sqrt(ve.toDouble)))
      else None
      (day, sc, se, r)
    }.toSeq
    assert(got.toSeq == want)
    got.flatMap(_._4).foreach(r => assert(r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12))
  }

  test("q_ltv_curve: cumulative masses telescope and the LTV quotient is exact") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_ltv_curve")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"cohort $cohort must start at age 0")
      // cum telescopes over the per-age revenue
      val cums = sorted.map(_._4).scanLeft(0L)(_ + _).tail
      assert(sorted.map(_._5).toSeq == cums.toSeq, s"cohort $cohort")
      // one cohort size per cohort; LTV = cum DIV users
      assert(sorted.map(_._6).distinct.length == 1)
      sorted.foreach(r => assert(r._7 == r._5 / r._6))
      // LTV is non-decreasing in age (revenue can't be negative here)
      assert(sorted.map(_._7).toSeq == sorted.map(_._7).sorted.toSeq)
    }
    // total revenue across the matrix equals the purchase total
    val total = Tables.events(spark, dir).filter(col("event_type") === "purchase")
      .agg(sum(floor(coalesce(col("value"), lit(0.0)) * 100).cast("long"))).collect()(0).getLong(0)
    assert(rows.map(_._4).sum == total)
  }

  test("q_linear_attribution: per-purchase credits conserve and split equally") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_linear_attribution")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.map(_._1).toSet.subsetOf(Set("click", "view")))
    // driver recompute: every purchase splits 1e6 across its 24h touches
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("s"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1)
    val credits = scala.collection.mutable.Map.empty[String, (Long, Long)]
    var nPurchWithTouch = 0L
    byUser.values.foreach { rs =>
      val purchases = rs.filter(_._4 == "purchase")
      val touches = rs.filter(r => r._4 == "click" || r._4 == "view")
      purchases.foreach { p =>
        val inWin = touches.filter(t => t._3 <= p._3 && t._3 >= p._3 - 86400L)
        if (inWin.nonEmpty) {
          nPurchWithTouch += 1
          val c = 1000000L / inWin.length
          inWin.foreach { t =>
            val (n0, c0) = credits.getOrElse(t._4, (0L, 0L))
            credits(t._4) = (n0 + 1, c0 + c)
          }
        }
      }
    }
    rows.foreach { case (ch, n, cq, _) => assert(credits(ch) == ((n, cq)), s"channel $ch") }
    // conservation: total credit ≈ 1e6 per credited purchase (minus
    // truncation < n_touches per purchase)
    val total = rows.map(_._3).sum
    assert(total <= 1000000L * nPurchWithTouch)
    assert(total > 1000000L * nPurchWithTouch - rows.map(_._2).sum)
  }

  test("q_forecast_backtest: WAPE recomputes from the exact EWMA trajectory") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_forecast_backtest")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        (floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      // the integer recurrence: s0 = x0, s = floor((25x + 75s)/100)
      val ss = xs.tail.scanLeft(xs.head)((s, x) => Math.floorDiv(25 * x + 75 * s, 100))
      val errs = xs.tail.zip(ss.dropRight(1)).map { case (x, p) => math.abs(x - p) }
      val (se, sa) = (errs.sum, xs.tail.sum)
      t -> ((errs.length.toLong, se, sa, se * 1000000L / sa))
    }
    assert(got == want)
    // the smoother must be imperfect but sane: 0 < WAPE < 100 %
    got.values.foreach { case (_, _, _, wape) => assert(wape > 0 && wape < 1000000L) }
  }

  test("q_longest_streak: per-user max consecutive-day run recomputes exactly") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_longest_streak")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val days = Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = days.groupBy(_._1).map { case (u, rows) =>
      val ds = rows.map(_._2).sorted
      // split into consecutive runs, keep (len desc, start asc) argmax
      val runs = ds.foldLeft(List.empty[(Long, Long)]) { // (start, len)
        case ((s, l) :: rest, d) if d == s + l => (s, l + 1) :: rest
        case (acc, d) => (d, 1L) :: acc
      }
      val best = runs.minBy { case (s, l) => (-l, s) }
      u -> ((best._2, best._1))
    }
    assert(got == want)
    // the fixture must contain an actual multi-day streak somewhere
    assert(want.values.exists(_._1 > 1))
  }

  test("q_bloom_prejoin: the bloom prune is result-invisible") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_bloom_prejoin")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Tables.events(spark, dir)
      .join(Tables.customer(spark, dir).filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey")), col("user_id") === col("c_custkey"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(coalesce(col("value"), lit(0.0)) * 1000).cast("long")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == plain)
    assert(got.nonEmpty)
  }
}
