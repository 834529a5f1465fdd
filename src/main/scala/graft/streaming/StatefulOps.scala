package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the escape hatch
  * for semantics windowed aggregation can't express (SURVEY.md §2.3 UDF/
  * state surface). First resident: threshold alerting with consecutive-
  * breach tracking, the alert shape a log-metrics pipeline bolts onto its
  * aggregated points (N consecutive windows above a limit ⇒ fire once;
  * reset below).
  *
  * Scale: state is per key (metric × label-set) and constant-size (a
  * counter + a flag); Spark shards it across executors by grouping key and
  * checkpoints it — the same partitioning as the upstream aggregation, so
  * no extra shuffle when chained after StreamingMetrics output keyed the
  * same way. A processing-time timeout evicts idle keys.
  */
object StatefulOps {

  final case class PointKey(metric: String)
  final case class Point(metric: String, windowStartSec: Long, value: Double)
  final case class AlertState(consecutive: Int, firing: Boolean)
  final case class Alert(
      metric: String,
      windowStartSec: Long,
      value: Double,
      consecutive: Int,
      kind: String) // "fire" | "resolve"

  /** `ts` carries the event-time column the input's watermark is defined
    * on — callers build this as
    * `stream.withWatermark("ts", d).select(...).as[Heartbeat]` (the
    * EventTimeTimeout below is driven by that watermark).
    */
  final case class Heartbeat(key: String, ts: java.sql.Timestamp)
  final case class HeartbeatState(lastSeenSec: Long)
  final case class AbsenceAlert(key: String, lastSeenSec: Long, silentForSec: Long)

  /** Absence detection — the alert a windowed aggregation CANNOT express:
    * a key that stops producing events produces no windows either, so
    * "no data for N seconds" must come from state + TIMEOUT-driven
    * emission, not from data-driven emission. Each key's state stores its
    * last-seen event time; an event-time timeout fires once the watermark
    * passes lastSeen + silenceSec, emitting one alert per silence (reset
    * when the key speaks again).
    *
    * Scale: state is constant per key (two fields) and sharded by the
    * grouping key; alerts are driven by watermark advancement — a silent
    * key costs nothing per batch until its timeout fires. The timeout IS
    * the eviction: after alerting, state is removed, so dead keys do not
    * accumulate (a key returning later re-registers as new).
    */
  def absenceAlerts(
      beats: Dataset[Heartbeat],
      silenceSec: Long): Dataset[AbsenceAlert] = {
    implicit val outEnc = Encoders.product[AbsenceAlert]
    implicit val stateEnc = Encoders.product[HeartbeatState]
    implicit val keyEnc = Encoders.STRING
    beats
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[Heartbeat], state: GroupState[HeartbeatState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove() // alert once, evict — returning keys re-register
            val silent = state.getCurrentWatermarkMs() / 1000L - s.lastSeenSec
            Iterator.single(AbsenceAlert(key, s.lastSeenSec, math.max(silent, silenceSec)))
          } else {
            val lastSeen = (rows.map(_.ts.getTime / 1000L) ++
              state.getOption.map(_.lastSeenSec).iterator).max
            state.update(HeartbeatState(lastSeen))
            // fire when the WATERMARK (not wall clock) passes the horizon —
            // replayable and deterministic, like every event-time semantic
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1L, (lastSeen + silenceSec) * 1000L))
            Iterator.empty
          }
      }
  }

  final case class UserEvent(user: String, eventType: String, ts: java.sql.Timestamp)
  // stage timestamp in ms: the strict-after comparison must not lose
  // sub-second precision (a cross-batch straggler 200 ms BEFORE the stage
  // event would wrongly advance under second truncation)
  final case class FunnelState(stage: Int, stageTsMs: Long)
  final case class StageAdvance(user: String, stage: Int, step: String, tsSec: Long)

  /** Streaming ordered-funnel progression — the incremental form of
    * [[graft.ext.Relational.funnel]]: per user, advance to step i+1 only
    * on an event of that type with ts STRICTLY AFTER the step-i
    * timestamp, and emit one StageAdvance per advancement. The batch form
    * re-scans the corpus per step; this form reads each event once as it
    * arrives.
    *
    * Within a micro-batch, events are sorted by event time, so
    * out-of-order arrivals INSIDE a batch advance correctly (a
    * view+click arriving together in ts order counts). Cross-batch late
    * data follows the stream's watermark like every event-time operator.
    *
    * Scale: state per user is two ints — constant — and sharded by the
    * grouping key; an event-time timeout evicts users idle past
    * `idleEvictSec` (an abandoned funnel never re-fires, so holding its
    * state is pure cost).
    *
    * PREREQUISITE: the caller must apply `withWatermark` on the event-time
    * column UPSTREAM of this operator — eviction uses
    * `EventTimeTimeout`/`getCurrentWatermarkMs`, which Spark only permits
    * on a watermarked stream; without one the query fails at START (Spark
    * rejects EventTimeTimeout with no watermark), not at plan time.
    */
  def funnelStages(
      events: Dataset[UserEvent],
      steps: Seq[String],
      idleEvictSec: Long): Dataset[StageAdvance] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // stepIdx is type-keyed, so a repeated step type would make its earlier
    // position unreachable and the funnel silently dead — reject upfront
    require(steps.distinct.size == steps.size,
      "funnel steps must be distinct event types (the state machine keys stages by type)")
    implicit val outEnc = Encoders.product[StageAdvance]
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val keyEnc = Encoders.STRING
    val stepIdx = steps.zipWithIndex.toMap
    events
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: String, rows: Iterator[UserEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val out = rows.toSeq.sortBy(_.ts.getTime).flatMap { e =>
              stepIdx.get(e.eventType) match {
                // next expected step, strictly after the current stage's time
                // (stage 0 accepts any time — MinValue sentinel)
                case Some(i) if i == s.stage && e.ts.getTime > s.stageTsMs =>
                  s = FunnelState(s.stage + 1, e.ts.getTime)
                  Some(StageAdvance(user, s.stage, e.eventType, e.ts.getTime / 1000L))
                case _ => None
              }
            }
            if (s.stage >= steps.length) state.remove() // funnel complete
            else if (s.stage == 0 && state.getOption.isEmpty) {
              // stage-0 state is semantically identical to absent state:
              // writing it would cost a state-store entry + checkpoint per
              // not-yet-in-funnel user — pure churn on high-cardinality
              // streams where most users never enter the funnel
            } else {
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1L,
                  math.max(s.stageTsMs, 0L) + idleEvictSec * 1000L))
            }
            out.iterator
          }
      }
  }

  /** Emit "fire" when `value > threshold` in `breaches` consecutive points
    * of a metric, "resolve" on the first non-breaching point after a fire.
    * Exactly one fire per excursion.
    *
    * (No GroupStateTimeout here: state per key is a counter + flag; a real
    * deployment with unbounded metric cardinality would add
    * ProcessingTimeTimeout + state.remove() for idle-key eviction — with a
    * trigger interval configured, timeout-triggered batches are how Spark
    * evaluates evictions.)
    */
  def thresholdAlerts(
      points: Dataset[Point],
      threshold: Double,
      breaches: Int): Dataset[Alert] = {
    implicit val alertEnc = Encoders.product[Alert]
    implicit val stateEnc = Encoders.product[AlertState]
    implicit val keyEnc = Encoders.STRING
    points
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (metric: String, rows: Iterator[Point], state: GroupState[AlertState]) =>
          var s = state.getOption.getOrElse(AlertState(0, firing = false))
          val out = rows.toSeq.sortBy(_.windowStartSec).flatMap { p =>
            if (p.value > threshold) {
              s = s.copy(consecutive = s.consecutive + 1)
              if (!s.firing && s.consecutive >= breaches) {
                s = s.copy(firing = true)
                Some(Alert(metric, p.windowStartSec, p.value, s.consecutive, "fire"))
              } else None
            } else {
              val resolved = s.firing
              val prev = s.consecutive
              s = AlertState(0, firing = false)
              if (resolved) Some(Alert(metric, p.windowStartSec, p.value, prev, "resolve"))
              else None
            }
          }
          state.update(s)
          out.iterator
      }
  }

  // ---- bounded-state streaming cardinality (KMV bottom-k) ----

  final case class KmvInput(key: String, value: String)
  final case class KmvState(mins: Seq[Long])
  final case class KmvEstimate(key: String, nKept: Int, hK: Long, estDistinct: Long)

  /** The exact 60-bit hash the batch KMV queries use
    * (`Dedup.md5Long` ≡ first 15 md5 hex digits as a long) — delegates to
    * the engine's single JVM-side implementation so the streaming sketch
    * and the batch oracle can never diverge on minima.
    */
  def hash60(s: String): Long = graft.ext.Similarity.md5LongScala(s)

  /** Streaming distinct-count per key with O(k) state FOREVER: each key's
    * state is its KMV bottom-k sketch (≤ k longs), merged with every
    * micro-batch's new hashes (bottom-k of a union = bottom-k of merged
    * bottom-ks — the exact mergeability law `q_kmv_union` oracle-checks in
    * batch), and the updated estimate emits per batch. Exact below k;
    * (k−1)·M/h_k above. Where Spark's `dropDuplicates` streaming distinct
    * grows state with TRUE cardinality (unbounded on a high-cardinality
    * key), this is the production cardinality monitor: deterministic,
    * mergeable, and replay-stable — a batch recompute over the stream's
    * full history lands on the IDENTICAL estimate (StatefulOpsSpec law).
    */
  def kmvDistinct(rows: Dataset[KmvInput], k: Int): Dataset[KmvEstimate] = {
    require(k >= 2, "k must be >= 2")
    val m = math.pow(2, 60)
    implicit val outEnc = Encoders.product[KmvEstimate]
    implicit val stateEnc = Encoders.product[KmvState]
    implicit val keyEnc = Encoders.STRING
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[KmvInput], state: GroupState[KmvState]) =>
          // k-capped ordered merge: O(log k) per row, O(k) memory DURING
          // the batch too — a collect-then-sort would build an O(batch)
          // buffer for a hot key, breaking the operator's whole point
          val mins = scala.collection.mutable.TreeSet.empty[Long]
          state.getOption.foreach(_.mins.foreach(mins.add))
          it.foreach { r =>
            val h = hash60(r.value)
            if (mins.size < k) mins.add(h)
            else if (h < mins.last && mins.add(h)) mins.remove(mins.last)
          }
          val kept = mins.toSeq
          state.update(KmvState(kept))
          val n = kept.length
          val est = if (n < k) n.toLong
          else math.floor((k - 1).toDouble * m / kept.last).toLong
          Iterator.single(KmvEstimate(key, n, kept.last, est))
      }
  }

  // ---- bounded-state streaming heavy hitters (SpaceSaving) ----

  final case class TopKInput(key: String, item: String)
  final case class TopKState(counters: Seq[(String, Long, Long)])
  final case class TopKRow(key: String, rank: Int, item: String, est: Long, err: Long)

  /** Streaming per-key heavy hitters with O(cap) state FOREVER: each
    * key's state IS a SpaceSaving counter set — the batch `graft_topk`
    * aggregate's own [[graft.functions.SpaceSavingTopK.State]], one
    * implementation for both engines, exactly as [[hash60]] shares the
    * KMV hash — updated with every micro-batch, re-emitting the current
    * top k per batch in Append mode.
    *
    * Carried sketch guarantees hold regardless of arrival order or batch
    * boundaries: every estimate overcounts within its err
    * (true ≤ est ≤ true + err), any item with true count > N/cap is
    * present, and when a key's distinct items fit within cap the counts
    * are EXACT — so the streaming emit equals a batch
    * groupBy-count-rank over the stream's full prefix (the parity law
    * StatefulOpsSpec pins). The unbounded alternative
    * (streaming explode → groupBy(item) count) grows state with the TRUE
    * vocabulary and reshuffles it every trigger; this keeps ≤ cap
    * counters per key in the state store and moves k rows per batch.
    */
  def spaceSavingTopK(rows: Dataset[TopKInput], k: Int, cap: Int): Dataset[TopKRow] = {
    require(k > 0, "k must be positive")
    require(cap >= k, "cap must be >= k")
    implicit val outEnc = Encoders.product[TopKRow]
    implicit val stateEnc = Encoders.product[TopKState]
    implicit val keyEnc = Encoders.STRING
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[TopKInput], state: GroupState[TopKState]) =>
          val s = new graft.functions.SpaceSavingTopK.State(cap)
          state.getOption.foreach(_.counters.foreach { case (i, e, r) => s.add(i, e, r) })
          it.foreach(r => s.add(r.item, 1L, 0L))
          val kept = Seq.newBuilder[(String, Long, Long)]
          s.foreach((i, e, r) => kept += ((i, e, r)))
          state.update(TopKState(kept.result()))
          s.top(k).iterator.zipWithIndex.map { case ((item, est, err), i) =>
            TopKRow(key, i + 1, item, est, err)
          }
      }
  }

  // ---- streaming robust anomaly flags (median/MAD over histogram state) ----

  final case class MadInput(key: String, bucketSec: Long, valueQ: Long)
  final case class MadState(hist: Seq[(Long, Long)])
  final case class MadFlag(
      key: String,
      bucketSec: Long,
      valueQ: Long,
      medQ: Long,
      madQ: Long,
      isAnomaly: Boolean,
      nSeen: Long)

  /** Streaming twin of [[graft.ext.Relational.madOutliers]]: per-key
    * robust anomaly flags over an unbounded stream of (already
    * aggregated, integer-QUANTIZED) metric points. Each key's state is
    * the exact value HISTOGRAM of its full history — (quantized value →
    * count) pairs — so the state size is bounded by the value DOMAIN at
    * the chosen quantization, not by stream length (the quantization
    * grain is the state knob; a metrics pipeline's values live in a known
    * range). Points process in bucket order; each point is judged against
    * the history INCLUDING itself: `med` = lower weighted median,
    * `mad` = lower weighted median of |x − med| (both integer-exact walks
    * over the histogram — no interpolation, no floats), flag strictly
    * `|x − med| > k·mad` once the key has seen ≥ `minN` points (cold
    * start: a 2-point history has MAD 0 and would flag ANY deviation —
    * the warm-up gate is what makes the detector deployable, the same
    * reason thresholdAlerts requires N consecutive breaches). Pure
    * integer arithmetic ⇒ flags are
    * deterministic AND batching-invariant: a point's flag depends only on
    * the history prefix up to it, never on micro-batch boundaries
    * (StatefulOpsSpec law), so a replay from any checkpoint re-derives
    * identical output.
    */
  def madAnomalies(points: Dataset[MadInput], k: Long, minN: Long = 5L): Dataset[MadFlag] = {
    require(k > 0, "k must be positive")
    require(minN >= 1, "minN must be positive")
    implicit val outEnc = Encoders.product[MadFlag]
    implicit val stateEnc = Encoders.product[MadState]
    implicit val keyEnc = Encoders.STRING

    // lower weighted median: smallest v with cumulative count ≥ ceil(n/2)
    def lowerMedian(hist: scala.collection.SortedMap[Long, Long]): Long = {
      val n = hist.valuesIterator.sum
      val target = (n + 1) / 2
      var cum = 0L
      val it = hist.iterator
      var res = hist.firstKey
      var found = false
      while (it.hasNext && !found) {
        val (v, c) = it.next()
        cum += c
        if (cum >= target) { res = v; found = true }
      }
      res
    }

    points
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[MadInput], state: GroupState[MadState]) =>
          val hist = scala.collection.mutable.TreeMap.empty[Long, Long]
          state.getOption.foreach(_.hist.foreach { case (v, c) => hist(v) = c })
          // total order: ties on bucketSec break by value so the emitted
          // flags are batching- AND shuffle-order-invariant (the replay
          // contract would break if tie order followed the iterator)
          val out = it.toSeq.sortBy(p => (p.bucketSec, p.valueQ)).map { p =>
            hist(p.valueQ) = hist.getOrElse(p.valueQ, 0L) + 1L
            val med = lowerMedian(hist)
            val dev = scala.collection.mutable.TreeMap.empty[Long, Long]
            hist.foreach { case (v, c) =>
              val d = math.abs(v - med)
              dev(d) = dev.getOrElse(d, 0L) + c
            }
            val mad = lowerMedian(dev)
            val n = hist.valuesIterator.sum
            MadFlag(key, p.bucketSec, p.valueQ, med, mad,
              n >= minN && math.abs(p.valueQ - med) > k * mad, n)
          }
          state.update(MadState(hist.toSeq))
          out.iterator
      }
  }

  final case class HwInput(key: String, bucket: Long, x: Long)
  final case class HwState(count: Long, level: Long, ring: Seq[Long])
  final case class HwRow(
      key: String,
      bucket: Long,
      x: Long,
      level: Long,
      seasonal: Long,
      forecastNext: Long)

  /** Streaming twin of [[graft.ext.Relational.holtWintersInteger]] — the
    * level+seasonal integer recurrence held as per-key state across
    * micro-batches: (count, level, a period-sized seasonal RING). State is
    * O(period) longs per key FOREVER; each micro-batch advances the
    * recurrence in bucket order (monotone per-key arrival contract — the
    * [[debounce]]/[[clampedBalances]] convention), so the emitted rows are
    * bit-identical to the batch operator on the same prefix
    * (Round11bSpec parity law). The forecast reads s₍t−period+1₎ straight
    * from the ring — the slot is not rewritten until period steps later.
    */
  def holtWinters(
      rows: Dataset[HwInput],
      aNum: Int,
      aDen: Int,
      gNum: Int,
      gDen: Int,
      period: Int): Dataset[HwRow] = {
    require(aNum > 0 && aDen > aNum && gNum > 0 && gDen > gNum && period >= 2,
      "need 0 < aNum < aDen, 0 < gNum < gDen, period ≥ 2")
    implicit val outEnc = Encoders.product[HwRow]
    implicit val stateEnc = Encoders.product[HwState]
    implicit val keyEnc = Encoders.STRING
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[HwInput], state: GroupState[HwState]) =>
          var st = state.getOption.getOrElse(HwState(0L, 0L, Seq.fill(period)(0L)))
          val ring = st.ring.toArray
          var (count, level) = (st.count, st.level)
          val out = it.toSeq.sortBy(_.bucket).map { r =>
            val t = count
            val sPrev = if (t >= period) ring((t % period).toInt) else 0L
            val (lNew, sNew) =
              if (t == 0L) (r.x, 0L)
              else {
                val l = (aNum * (r.x - sPrev) + (aDen - aNum) * level) / aDen
                (l, (gNum * (r.x - l) + (gDen - gNum) * sPrev) / gDen)
              }
            ring((t % period).toInt) = sNew
            level = lNew
            count += 1L
            val sNext =
              if (t >= period - 1) ring(((t + 1) % period).toInt) else 0L
            HwRow(key, r.bucket, r.x, lNew, sNew, lNew + sNext)
          }
          state.update(HwState(count, level, ring.toSeq))
          out.iterator
      }
  }

  final case class BalanceInput(key: String, seqA: Long, seqB: Long, delta: Long)
  final case class BalanceState(balance: Long, clamps: Long, rows: Long)
  final case class BalanceRow(
      key: String,
      seqA: Long,
      seqB: Long,
      balance: Long,
      nClamps: Long,
      nRows: Long)

  /** Streaming twin of [[graft.ext.Relational.clampedBalance]] — the
    * clamped recurrence bᵢ = max(0, bᵢ₋₁ + Δᵢ) held as per-key state
    * across micro-batches (a token bucket / never-negative inventory that
    * survives restarts via the checkpoint). Emits the post-update balance
    * per event.
    *
    * State is three longs per key, FOREVER — constant, unlike windowed
    * aggregations whose state tracks open windows. Within a micro-batch
    * rows apply in (seqA, seqB) order, so the output is batching-invariant
    * for in-order feeds: one batch or many, the same prefix of events
    * yields the same balances (the batch operator is the oracle —
    * StatefulOpsSpec pins parity with `Relational.clampedBalance` and
    * replay stability across uneven batch splits).
    */
  final case class DebounceInput(key: String, seqA: Long, seqB: Long, tsUs: Long)
  final case class DebounceState(lastKeptUs: Long, nKept: Long, nDropped: Long)
  final case class DebounceRow(
      key: String,
      seqA: Long,
      seqB: Long,
      tsUs: Long,
      kept: Boolean,
      nKept: Long,
      nDropped: Long)

  /** CHAINED debounce / rate limiter: an event is KEPT iff it arrives more
    * than `gapUs` after the last KEPT event of its key. This is the
    * semantics the batch lag() form (`q_debounce`) CANNOT express — there
    * the comparison is against the previous RAW event, so a long burst
    * under-drops (each drop resets the clock); here dropping must NOT
    * advance the threshold, which makes the fold a per-key recurrence —
    * exactly the flatMapGroupsWithState shape (the q_clamped_balance
    * precedent). Events inside a batch fold in (seqA, seqB) order; state
    * is three longs per key forever.
    */
  def debounce(rows: Dataset[DebounceInput], gapUs: Long): Dataset[DebounceRow] = {
    require(gapUs > 0, "debounce gap must be positive")
    implicit val outEnc = Encoders.product[DebounceRow]
    implicit val stateEnc = Encoders.product[DebounceState]
    implicit val keyEnc = Encoders.STRING
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[DebounceInput], state: GroupState[DebounceState]) =>
          var st = state.getOption.getOrElse(DebounceState(0L, 0L, 0L))
          val out = it.toSeq.sortBy(r => (r.seqA, r.seqB)).map { r =>
            val keep = st.nKept == 0L || r.tsUs - st.lastKeptUs > gapUs
            st =
              if (keep) DebounceState(r.tsUs, st.nKept + 1L, st.nDropped)
              else st.copy(nDropped = st.nDropped + 1L)
            DebounceRow(key, r.seqA, r.seqB, r.tsUs, keep, st.nKept, st.nDropped)
          }
          state.update(st)
          out.iterator
      }
  }

  def clampedBalances(rows: Dataset[BalanceInput]): Dataset[BalanceRow] = {
    implicit val outEnc = Encoders.product[BalanceRow]
    implicit val stateEnc = Encoders.product[BalanceState]
    implicit val keyEnc = Encoders.STRING
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[BalanceInput], state: GroupState[BalanceState]) =>
          var st = state.getOption.getOrElse(BalanceState(0L, 0L, 0L))
          val out = it.toSeq.sortBy(r => (r.seqA, r.seqB)).map { r =>
            val nb = st.balance + r.delta
            st = BalanceState(
              math.max(0L, nb),
              st.clamps + (if (nb < 0L) 1L else 0L),
              st.rows + 1L)
            BalanceRow(key, r.seqA, r.seqB, st.balance, st.clamps, st.rows)
          }
          state.update(st)
          out.iterator
      }
  }
}
