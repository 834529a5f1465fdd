package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Alert, Point}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Custom streaming state: threshold alerting via flatMapGroupsWithState,
  * driven against a live streaming query across multiple micro-batches
  * (state must survive batch boundaries).
  */
class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fires once after N consecutive breaches and resolves on recovery") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Point]
    val alerts = StatefulOps.thresholdAlerts(mem.toDS(), threshold = 100.0, breaches = 3)

    val q = alerts.writeStream.format("memory").queryName("alerts").outputMode("append").start()
    try {
      // batch 1: two breaches — below the consecutive requirement
      mem.addData(Point("errors", 60, 150.0), Point("errors", 120, 180.0))
      q.processAllAvailable()
      assert(spark.table("alerts").count() == 0)

      // batch 2: third consecutive breach ⇒ fire exactly once; a fourth
      // breach must NOT re-fire
      mem.addData(Point("errors", 180, 200.0), Point("errors", 240, 250.0))
      q.processAllAvailable()
      val fired = spark.table("alerts").as[Alert].collect().toList
      assert(fired == List(Alert("errors", 180, 200.0, 3, "fire")))

      // batch 3: recovery ⇒ one resolve; an unrelated healthy metric stays silent
      mem.addData(Point("errors", 300, 10.0), Point("latency", 300, 50.0))
      q.processAllAvailable()
      val all = spark.table("alerts").as[Alert].collect().toSet
      assert(all == Set(
        Alert("errors", 180, 200.0, 3, "fire"),
        Alert("errors", 300, 10.0, 4, "resolve")))

      // batch 4: a fresh excursion fires again (state was reset)
      mem.addData(
        Point("errors", 360, 150.0), Point("errors", 420, 150.0), Point("errors", 480, 150.0))
      q.processAllAvailable()
      assert(spark.table("alerts").filter($"kind" === "fire").count() == 2)
    } finally q.stop()
  }

  test("absence alerts fire from watermark advancement, once per silence") {
    import graft.streaming.StatefulOps.{AbsenceAlert, Heartbeat}
    implicit val sqlCtx = spark.sqlContext
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val beats = mem.toDF.toDF("key", "ts")
      .withWatermark("ts", "0 seconds")
      .as[Heartbeat]
    val alerts = StatefulOps.absenceAlerts(beats, silenceSec = 60L)
    val q = alerts.writeStream.format("memory").queryName("absence").outputMode("append").start()
    try {
      // two services heartbeat; then only 'b' keeps beating
      mem.addData(("a", at(10)), ("b", at(10)))
      q.processAllAvailable()
      assert(spark.table("absence").count() == 0, "no silence yet")

      // b's heartbeats advance the watermark past a's horizon (10+60) ⇒
      // exactly one alert for a, none for the live key b
      mem.addData(("b", at(50)), ("b", at(100)))
      q.processAllAvailable()
      mem.addData(("b", at(160))) // extra advance: timeout fires on the NEXT batch
      q.processAllAvailable()
      val fired = spark.table("absence").as[AbsenceAlert].collect().toList
      assert(fired.map(_.key) == List("a"), s"got $fired")
      assert(fired.head.lastSeenSec == 10L)

      // a returns: state re-registers; a later silence alerts AGAIN
      mem.addData(("a", at(200)), ("b", at(200)))
      q.processAllAvailable()
      mem.addData(("b", at(300)))
      q.processAllAvailable()
      mem.addData(("b", at(400))) // next batch evaluates a's new timeout
      q.processAllAvailable()
      val again = spark.table("absence").as[AbsenceAlert].collect().toList
      assert(again.count(_.key == "a") == 2, s"returning key must re-alert: $again")
    } finally q.stop()
  }

  test("streaming funnel advances per user in order, across batches, emitting each stage once") {
    import graft.streaming.StatefulOps.{StageAdvance, UserEvent}
    implicit val sqlCtx = spark.sqlContext
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val events = mem.toDF.toDF("user", "eventType", "ts")
      .withWatermark("ts", "0 seconds")
      .as[UserEvent]
    val stages = StatefulOps.funnelStages(events,
      Seq("view", "click", "purchase"), idleEvictSec = 3600L)
    val q = stages.writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      // batch 1, out of order WITHIN the batch: click(20) + view(10) —
      // in-batch ts sort means both stages advance in one batch
      mem.addData(("u1", "click", at(20)), ("u1", "view", at(10)), ("u2", "click", at(5)))
      q.processAllAvailable()
      val b1 = spark.table("funnel").as[StageAdvance].collect().toSet
      assert(b1 == Set(StageAdvance("u1", 1, "view", 10), StageAdvance("u1", 2, "click", 20)),
        s"u2's click without a view must not advance: $b1")

      // batch 2: u1 completes ACROSS the batch boundary (state survived);
      // a repeat click must not re-advance; u2 starts its funnel
      mem.addData(("u1", "click", at(30)), ("u1", "purchase", at(40)), ("u2", "view", at(35)))
      q.processAllAvailable()
      val b2 = spark.table("funnel").as[StageAdvance].collect().toSet
      assert(b2 == b1 + StageAdvance("u1", 3, "purchase", 40) + StageAdvance("u2", 1, "view", 35))

      // batch 3: u1's funnel completed ⇒ state removed ⇒ a new view is a
      // FRESH funnel (stage 1 again); non-step events are ignored
      mem.addData(("u1", "view", at(50)), ("u2", "signup", at(55)))
      q.processAllAvailable()
      val b3 = spark.table("funnel").as[StageAdvance].collect().toSet
      assert(b3 == b2 + StageAdvance("u1", 1, "view", 50))

      // an event at a ts NOT strictly after the stage time must not advance:
      // u2 clicks at exactly its view time
      mem.addData(("u2", "click", at(35)))
      q.processAllAvailable()
      assert(spark.table("funnel").as[StageAdvance].collect().toSet == b3,
        "tie timestamps must not advance the funnel")
    } finally q.stop()
  }

  test("hash60 ≡ the batch engine's md5Long (streaming and batch share minima)") {
    import org.apache.spark.sql.functions.col
    val vals = Seq("", "a", "user-42", "テスト", "0", "u119")
    val fromCol = vals.toDF("s")
      .select(graft.ext.Dedup.md5Long(col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(vals.map(StatefulOps.hash60) == fromCol)
  }

  test("streaming KMV: bounded state, per-batch estimates ≡ batch recompute on the prefix") {
    import graft.streaming.StatefulOps.{KmvEstimate, KmvInput}
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    val m = math.pow(2, 60)
    // driver-side reference: bottom-k over a full prefix of the stream
    def ref(values: Seq[String]): (Int, Long, Long) = {
      val mins = values.distinct.map(StatefulOps.hash60).sorted.take(k)
      val est =
        if (mins.length < k) mins.length.toLong
        else math.floor((k - 1).toDouble * m / mins.last).toLong
      (mins.length, mins.last, est)
    }
    val mem = MemoryStream[KmvInput]
    val est = StatefulOps.kmvDistinct(mem.toDS(), k)
    val q = est.writeStream.format("memory").queryName("kmv").outputMode("append").start()
    try {
      def latest(): KmvEstimate =
        spark.table("kmv").as[KmvEstimate].collect().maxBy(_.nKept)

      // batch 1: below k → exact path
      val b1 = (1 to 10).map(i => s"u$i")
      mem.addData(b1.map(KmvInput("users", _)): _*)
      q.processAllAvailable()
      assert(latest() == { val (n, h, e) = ref(b1); KmvEstimate("users", n, h, e) })
      assert(latest().estDistinct == 10L, "below k the sketch reports exactly")

      // batch 2: duplicates + growth past k → estimate path; the streaming
      // sketch merged across batches must equal a batch recompute over the
      // WHOLE prefix (mergeability, exactly)
      val b2 = (5 to 120).map(i => s"u$i")
      mem.addData(b2.map(KmvInput("users", _)): _*)
      q.processAllAvailable()
      val full = b1 ++ b2
      val (n2, h2, e2) = ref(full)
      assert(latest() == KmvEstimate("users", n2, h2, e2))
      assert(latest().nKept == k, "state is bounded at k entries")
      // accuracy sanity at k=16: sigma ≈ 1/sqrt(k-2) ≈ 27%; 3-sigma band
      val exact = full.distinct.size.toDouble
      assert(math.abs(latest().estDistinct - exact) / exact <= 0.8,
        s"est=${latest().estDistinct} exact=$exact")

      // batch 3: replaying already-seen values must not move the sketch.
      // Assert over ALL emitted rows (not a maxBy that would tie-select
      // the batch-2 row): exactly three rows, and every nKept=k row —
      // including batch 3's — carries the identical sketch summary.
      mem.addData(b1.map(KmvInput("users", _)): _*)
      q.processAllAvailable()
      val rows = spark.table("kmv").as[KmvEstimate].collect().toSeq
      assert(rows.length == 3, s"one estimate row per batch: $rows")
      assert(rows.count(_.nKept == k) == 2 &&
        rows.filter(_.nKept == k).forall(_ == KmvEstimate("users", n2, h2, e2)),
        s"re-observing known values is a no-op (replay-stable): $rows")
    } finally q.stop()
  }

  test("streaming SpaceSaving: bounded state, exact-within-cap parity, heavy item survives churn") {
    import graft.streaming.StatefulOps.{TopKInput, TopKRow}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TopKInput]
    val top = StatefulOps.spaceSavingTopK(mem.toDS(), k = 3, cap = 8)
    val q = top.writeStream.format("memory").queryName("sstopk").outputMode("append").start()
    try {
      def rowsAfter(n: Int): Seq[TopKRow] = {
        val all = spark.table("sstopk").as[TopKRow].collect().toSeq
        all.drop(n)
      }
      // batch 1: 4 distinct items ≤ cap → EXACT counts, batch-parity law:
      // the emit equals groupBy-count-rank over the prefix
      val b1 = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++ Seq("d")
      mem.addData(b1.map(TopKInput("t", _)): _*)
      q.processAllAvailable()
      val r1 = rowsAfter(0)
      assert(r1 == Seq(
        TopKRow("t", 1, "a", 5L, 0L),
        TopKRow("t", 2, "b", 3L, 0L),
        TopKRow("t", 3, "c", 2L, 0L)), s"exact within cap: $r1")
      // batch 2: 12 new singleton items churn past cap=8, plus more "a".
      // The heavy item must survive (true count 9 > N/cap) with its true
      // count still bounded: est - err ≤ true ≤ est.
      val b2 = Seq.fill(4)("a") ++ (1 to 12).map(i => s"x$i")
      mem.addData(b2.map(TopKInput("t", _)): _*)
      q.processAllAvailable()
      val r2 = rowsAfter(r1.length)
      assert(r2.length == 3)
      val aRow = r2.find(_.item == "a").getOrElse(fail(s"heavy item evicted: $r2"))
      assert(aRow.rank == 1, s"the 9-count item must lead: $r2")
      assert(aRow.est - aRow.err <= 9L && 9L <= aRow.est, s"overcount bound: $aRow")
      // state bounded: a third batch re-observing "a" emits a top-3 whose
      // leader still dominates — and every estimate stays an overcount
      mem.addData(TopKInput("t", "a"))
      q.processAllAvailable()
      val r3 = rowsAfter(r1.length + r2.length)
      val a3 = r3.find(_.item == "a").getOrElse(fail(s"leader lost: $r3"))
      assert(a3.est == aRow.est + 1 && a3.err == aRow.err,
        s"an in-state increment adds exactly one: $aRow -> $a3")
    } finally q.stop()
  }

  test("madAnomalies composes on StreamingMetrics output (two-stage pipeline)") {
    // Spark disallows flatMapGroupsWithState AFTER a streaming aggregation
    // in one query, so the production wiring is two decoupled queries:
    // attach → sink, monitor ← that sink. This pins the composition
    // contract — the monitor consumes attach's exact output shape and
    // flags the spike window.
    import graft.streaming.{StatefulOps, StreamingMetrics}
    import graft.streaming.StatefulOps.{MadFlag, MadInput}
    import graft.model.{MetricDefinition, MetricType}
    import graft.pipeline.LogsToMetrics

    implicit val sqlCtx = spark.sqlContext
    def at(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val typed = mem.toDF.toDF("ts", "event_type")
    val defs = Seq(MetricDefinition("ev_count", MetricType.Count, windowSizeSec = 60))
    val Seq(out) = StreamingMetrics.attach(typed, defs, LogsToMetrics.Typed(typed.schema))
    val q1 = out.writeStream.format("memory").queryName("madsrc").outputMode("append").start()
    val points = try {
      // 8 steady windows of 3 events, a 30-event spike window, 2 steady;
      // a far sentinel closes everything
      val evs = (0 until 11).flatMap { wi =>
        val n = if (wi == 8) 30 else 3
        (0 until n).map(j => (at(wi * 60L + j % 50), "e"))
      } :+ ((at(100000L), "e"))
      mem.addData(evs.take(20): _*)
      q1.processAllAvailable()
      mem.addData(evs.drop(20): _*)
      q1.processAllAvailable()
      spark.table("madsrc")
        .select($"metric", $"window_start", $"value")
        .collect()
        .map(r => MadInput(r.getString(0), r.getTimestamp(1).getTime / 1000L,
          r.getDouble(2).toLong))
        .sortBy(_.bucketSec)
    } finally q1.stop()
    assert(points.length >= 11, s"all 11 windows must close: ${points.toSeq}")

    val mem2 = MemoryStream[MadInput]
    val q2 = StatefulOps.madAnomalies(mem2.toDS(), k = 3L)
      .writeStream.format("memory").queryName("madout").outputMode("append").start()
    try {
      val (h, t) = points.splitAt(6)
      mem2.addData(h: _*); q2.processAllAvailable()
      mem2.addData(t: _*); q2.processAllAvailable()
      val flags = spark.table("madout").as[MadFlag].collect().sortBy(_.bucketSec)
      val fired = flags.filter(_.isAnomaly)
      assert(fired.length == 1 && fired.head.valueQ == 30L,
        s"exactly the 30-event spike window must flag: ${flags.toSeq}")
    } finally q2.stop()
  }

  test("madAnomalies: spike flagged, constants silent, batching-invariant") {
    import graft.streaming.StatefulOps.{MadFlag, MadInput}

    // reference: prefix-wise lower-median/MAD over the quantized history,
    // with the minN=5 warm-up (a 2-point history has MAD 0 — without the
    // gate it flags ANY deviation, which is why the operator carries one)
    def refFlags(vals: Seq[Long], k: Long): Seq[MadFlag] = {
      def lowMed(xs: Seq[Long]): Long = {
        val s = xs.sorted
        s(((xs.length + 1) / 2 - 1).toInt)
      }
      vals.zipWithIndex.map { case (v, i) =>
        val hist = vals.take(i + 1)
        val med = lowMed(hist)
        val mad = lowMed(hist.map(x => math.abs(x - med)))
        MadFlag("m", i.toLong, v, med, mad,
          i + 1 >= 5 && math.abs(v - med) > k * mad, i + 1L)
      }
    }

    // steady 100±2 series with one 10× spike at bucket 6, then recovery
    val series = Seq(100L, 102L, 98L, 101L, 99L, 100L, 1000L, 100L, 102L)
    val expected = refFlags(series, 3L)
    assert(expected.count(_.isAnomaly) == 1 && expected(6).isAnomaly,
      "the fixture must flag exactly the spike")

    def run(batches: Seq[Seq[(Long, Long)]], name: String): Seq[MadFlag] = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[MadInput]
      val q = StatefulOps.madAnomalies(mem.toDS(), k = 3L)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b =>
          mem.addData(b.map { case (t, v) => MadInput("m", t, v) }: _*)
          q.processAllAvailable()
        }
        spark.table(name).as[MadFlag].collect().toSeq.sortBy(_.bucketSec)
      } finally q.stop()
    }

    val pts = series.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    // one big batch vs three uneven batches: identical flags — a point's
    // verdict depends only on its history prefix, never batch boundaries
    val oneShot = run(Seq(pts), "mad1")
    val split = run(Seq(pts.take(4), pts.slice(4, 7), pts.drop(7)), "mad2")
    assert(oneShot == expected, s"streaming must equal the prefix reference:\n$oneShot")
    assert(split == oneShot, "micro-batch boundaries must not move any flag")

    // constant series: MAD 0, strict > never fires even on repeats
    val const = run(Seq((0L to 5L).map(i => (i, 42L))), "mad3")
    assert(const.forall(f => !f.isAnomaly && f.medQ == 42L && f.madQ == 0L))
  }

  test("debounce: chained throttle laws, burst behavior, split-invariant state") {
    import graft.streaming.StatefulOps.{DebounceInput, DebounceRow}
    implicit val sqlCtx = spark.sqlContext

    def run(batches: Seq[Seq[DebounceInput]], name: String): Seq[DebounceRow] = {
      val mem = MemoryStream[DebounceInput]
      val q = StatefulOps.debounce(mem.toDS(), gapUs = 5000000L)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[DebounceRow].collect().toSeq
          .sortBy(r => (r.key, r.seqA, r.seqB))
      } finally q.stop()
    }

    // a burst 0,2,4,6,8,12 s: the CHAINED semantics keeps 0 and 6 and 12
    // (6-0 > 5, 12-6 > 5) — the lag() form would also keep nothing past 0
    // until a 5 s RAW gap appears, which this fixture never has except 8→12
    val burst = Seq(0L, 2L, 4L, 6L, 8L, 12L).zipWithIndex.map { case (s, i) =>
      DebounceInput("u1", i.toLong, 1L, s * 1000000L)
    }
    val oneShot = run(Seq(burst), "deb1")
    assert(oneShot.map(_.kept) == Seq(true, false, false, true, false, true))
    assert(oneShot.last.nKept == 3L && oneShot.last.nDropped == 3L)

    // law: consecutive KEPT events are always > gap apart; every dropped
    // event is within gap of the last kept before it (greedy maximality)
    val keptTs = oneShot.filter(_.kept).map(_.tsUs)
    keptTs.sliding(2).foreach {
      case Seq(a, b) => assert(b - a > 5000000L)
      case _         =>
    }
    var lastKept = Long.MinValue
    oneShot.foreach { r =>
      if (r.kept) lastKept = r.tsUs
      else assert(r.tsUs - lastKept <= 5000000L, s"drop must be inside the gap: $r")
    }

    // state survives micro-batch boundaries: uneven splits ≡ one batch
    val split = run(Seq(burst.take(1), burst.slice(1, 4), burst.drop(4)), "deb2")
    assert(split == oneShot, "micro-batch boundaries must not move any verdict")

    // independent keys do not interact
    val two = run(Seq(burst ++ burst.map(r => r.copy(key = "u2"))), "deb3")
    assert(two.filter(_.key == "u2").map(_.kept) == oneShot.map(_.kept))
  }

  test("clampedBalances: batch parity, clamp accounting, split-invariant state") {
    import graft.streaming.StatefulOps.{BalanceInput, BalanceRow}
    implicit val sqlCtx = spark.sqlContext

    def run(batches: Seq[Seq[BalanceInput]], name: String): Seq[BalanceRow] = {
      val mem = MemoryStream[BalanceInput]
      val q = StatefulOps.clampedBalances(mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[BalanceRow].collect().toSeq
          .sortBy(r => (r.key, r.seqA, r.seqB))
      } finally q.stop()
    }

    // the hand fixture from the batch spec: key u1 clamps once mid-stream
    val events = Seq(
      BalanceInput("u1", 1, 1, 5), BalanceInput("u1", 2, 1, -3),
      BalanceInput("u1", 3, 1, -10), BalanceInput("u1", 4, 1, 4),
      BalanceInput("u2", 1, 1, -1), BalanceInput("u2", 2, 1, 7))
    val oneShot = run(Seq(events), "bal1")
    // final rows match the BATCH operator exactly (the oracle of the twin)
    val finals = oneShot.groupBy(_.key).map { case (k, rs) =>
      val last = rs.maxBy(_.nRows); k -> ((last.balance, last.nClamps, last.nRows))
    }
    assert(finals == Map("u1" -> ((4L, 1L, 4L)), "u2" -> ((7L, 1L, 2L))))
    // the running trajectory is the clamped recurrence, event by event
    assert(oneShot.filter(_.key == "u1").map(_.balance) == Seq(5L, 2L, 0L, 4L))

    // state survives micro-batch boundaries: 3 uneven splits ≡ one batch
    val split = run(Seq(events.take(2), events.slice(2, 5), events.drop(5)), "bal2")
    assert(split == oneShot, "micro-batch boundaries must not move any balance")
  }
}
