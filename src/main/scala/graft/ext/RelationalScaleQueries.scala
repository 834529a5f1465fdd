package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import RelationalQueries.{secs, dailyCents, pctSql, DailyCentsCte}

/** Declared scale-mechanics, audit, CDC/SCD and sketch queries — split from [[RelationalQueries]]
  * (pure code motion, round 12); see its scaladoc for the shared
  * column-alignment / determinism / rounding contracts.
  */
object RelationalScaleQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-5 users by event count per event_type: aggregate first (hash agg
    // with map-side combine), rank the small aggregate, never sort raw rows.
    "q_topk_users" -> { (s, dir) =>
      val perUser = Tables
        .events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      Relational
        .topKPerGroup(perUser, Seq("event_type"), Seq(col("cnt").desc, col("user_id").asc), 5)
        .select(col("event_type"), col("user_id"), col("cnt"), col("rank"))
        .orderBy("event_type", "rank")
    },

    // One-pass multi-column profile over events; integer/string columns
    // only so min/max stringification is engine-portable.
    "q_profile_columns" -> { (s, dir) =>
      Relational
        .profile(Tables.events(s, dir), Seq("event_id", "user_id", "event_type"))
        .orderBy("col_name")
    },

    // Deequ-style data-quality gate over lineitem: 5 row-level checks
    // AND a composite-key uniqueness check in ONE aggregation pass (scan
    // count independent of check count; the exact composite distinct
    // rides the same scan via Expand), plus a referential check against
    // orders (distinct keys both sides, one left join + one agg). The
    // fixture makes it non-trivial: tax/discount caps FAIL with real
    // violation counts and the line-number PK is genuinely non-unique,
    // while range/domain/completeness and the FK check PASS — the audit
    // must report both outcomes, not just zeros.
    "q_constraint_audit" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val rowChecks = Relational.auditRowChecks(li,
        checks = Seq(
          "quantity_in_range" -> col("l_quantity").between(1, 50),
          "tax_at_most_5pct" -> (col("l_tax") <= 0.05),
          "discount_at_most_8pct" -> (col("l_discount") <= 0.08),
          "quantity_complete" -> col("l_quantity").isNotNull,
          "returnflag_in_domain" -> col("l_returnflag").isin("A", "N", "R")),
        uniqueChecks = Seq("pk_line_unique" -> Seq("l_orderkey", "l_linenumber")))
      val fk = Relational.auditReferential(
        li, "fk_orderkey_in_orders", "l_orderkey", Tables.orders(s, dir), "o_orderkey")
      rowChecks
        .unionByName(fk)
        .select(col("check_name"), col("n_checked"), col("violations"),
          (col("violations") === 0).as("passed"))
        .orderBy("check_name")
    },

    // Exact distinct per group (two-phase expand) — oracle-checked.
    "q_distinct_users" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("distinct_users"))
        .orderBy("event_type")
    },

    // HLL sketch distinct (single-pass, mergeable max-registers — the
    // 100 TB path). DETERMINISTIC HLL (Relational.hllRegisters/hllEstimate):
    // registers are max(rho) over md5Long hashes — a pure function of the
    // set, unlike approx_count_distinct's engine-internal encoding — so the
    // sketch ESTIMATE itself is hash-checked against a DuckDB mirror that
    // rebuilds the identical registers, exact-integer harmonic sum, and
    // pre-quantized linear-counting lookup (graduated from rows-only in
    // round 12; m=64 ⇒ rsd ≈ 13%, accuracy + merge laws in RelationalSpec).
    // At 1000 executors the partial agg ships ≤ 64 registers/group per
    // partition; the raw data is touched once.
    "q_approx_distinct" -> { (s, dir) =>
      Relational
        .hllEstimate(Relational.hllRegisters(Tables.events(s, dir), "event_type", "user_id"))
        .select(col("s").as("event_type"), col("est").as("approx_users"))
        .orderBy("event_type")
    },

    // KMV (bottom-k / k-minimum-values) distinct sketch — the
    // DETERMINISTIC approximate distinct count: where HLL's estimate
    // depends on register-merge internals (q_approx_distinct is rows-only
    // for exactly that reason), the k smallest 60-bit hashes of a set are
    // a pure function of the set — order-independent, mergeable (union of
    // bottom-k sets → bottom-k), and bit-exact cross-engine. Estimator:
    // (k-1)·M/h_k over hash space M = 2^60 (Bar-Yossef et al.); groups
    // with fewer than k distinct hashes report exactly. Every output is
    // an integer ((k-1)·M and h_k are exactly representable doubles, ONE
    // IEEE division, floored) so the ESTIMATE itself hash-matches the
    // oracle. Plan shape: one distinct aggregation, then per-group rank ≤
    // k with WindowGroupLimit pruning below the shuffle — partial
    // bottom-k per partition, exactly how the sketch merges at 1000
    // executors.
    "q_distinct_kmv" -> { (s, dir) =>
      val k = 64
      Relational
        .kmvSketch(Tables.events(s, dir), "event_type", "user_id", k)
        .groupBy(col("s").as("event_type"))
        .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
        .select(col("event_type"), col("n_kept"), col("h_k"),
          Relational.kmvEstimate(col("n_kept"), col("h_k"), k).as("est_distinct"))
        .orderBy("event_type")
    },

    // KMV sketch ALGEBRA — the mergeability law, end-to-end: the union of
    // two bottom-k sketches re-ranked to bottom-k equals the bottom-k of
    // the union EXACTLY (both sides keep the k globally-smallest hashes),
    // so the MERGED estimate is oracle-checked against the direct
    // computation. This is the distributed path: per-segment sketches
    // (64 longs each) merge at the coordinator instead of re-scanning
    // either segment — the oracle recomputes from raw data and must land
    // on the identical h_k and estimate.
    "q_kmv_union" -> { (s, dir) =>
      val k = 64
      val ev = Tables.events(s, dir)
      // global bottom-k via orderBy+limit → TakeOrderedAndProject: each
      // partition keeps its own k smallest, one k-sized merge — the
      // partial-sketch shape (a global rank window would single-partition
      // sort the whole distinct frame; PlanSpec pins the operator)
      def sketch(pred: org.apache.spark.sql.Column) =
        ev.filter(pred)
          .select(Dedup.md5Long(col("user_id").cast("string")).as("h"))
          .distinct()
          .orderBy("h")
          .limit(k)
      val merged = sketch(col("event_type") === "click")
        .unionByName(sketch(col("event_type") === "error"))
        .distinct()
        .orderBy("h")
        .limit(k)
      merged
        .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
        .select(col("n_kept"), col("h_k"),
          Relational.kmvEstimate(col("n_kept"), col("h_k"), k).as("est_distinct"))
    },

    // KMV/theta-sketch INTERSECTION — the set-algebra step union can't do:
    // |A ∩ B| from the two per-set sketches alone. With θ = min(θ_A, θ_B)
    // (θ_X = the set's k-th-minimum hash, or the full hash space M when
    // the set is exact, n < k), every hash of A ∩ B below θ is present in
    // BOTH sketches, and those retained hashes are a uniform θ/M-rate
    // sample of A ∩ B ⇒ est = floor(|retained| · M / θ) (the theta-sketch
    // a-not-b/intersect algebra). All inputs to the estimator are
    // integers or exact powers of two with ONE IEEE division, so the
    // ESTIMATE hash-matches the oracle like the other KMV queries. Plan:
    // both sketches come from a SINGLE distinct + WindowGroupLimit pass
    // (one corpus scan), lazy-checkpointed so the θ aggregate and the
    // hash-join probe reuse the ≤2k-row frame, not the scan.
    "q_kmv_intersect" -> { (s, dir) =>
      val k = 64
      val mD = math.pow(2, 60) // hash space of md5Long — exact double
      val mL = 1L << 60
      val sk = Dedup.Intermediate.LocalLazy(
        Relational.kmvSketch(
          Tables.events(s, dir).filter(col("event_type").isin("click", "error")),
          "event_type", "user_id", k),
        "kmv_sketches")
      val theta = sk
        .groupBy("s")
        .agg(count(lit(1)).as("n"), max(col("h")).as("h_k"))
        .agg(min(when(col("n") < k, mL).otherwise(col("h_k"))).as("theta"))
      val retained = sk.filter(col("s") === "click").select("h")
        .join(sk.filter(col("s") === "error").select("h"), "h")
        .crossJoin(broadcast(theta))
        .filter(col("h") < col("theta"))
        .agg(count(lit(1)).as("n_retained"))
      retained
        .crossJoin(broadcast(theta))
        .select(col("n_retained"), col("theta"),
          floor(col("n_retained").cast("double") * mD / col("theta"))
            .cast("long").as("est_intersect"))
    },

    // Functional-dependency audit — "does X determine Y?" over three
    // candidate FDs (a PK check, a known violation, a join-derived
    // dependency): per FD, LHS group count, violating-group count, and the
    // worst RHS fan-out. The schema-inference / data-contract primitive a
    // warehouse runs before trusting a column as a key. FDs sharing an LHS
    // ride ONE countDistinct exchange (the multi-FD audit trick — scans
    // scale with distinct LHS keys, not with FD count); the broadcast join
    // is lossless (every events.user_id is a customer key at every SF), so
    // the events-side FD is unaffected by the segment attach.
    "q_fd_violations" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val fd1 = ev
        .groupBy(col("event_id"))
        .agg(countDistinct(col("user_id")).as("nd"))
        .agg(lit("event_id->user_id").as("fd"), count(lit(1)).as("n_groups"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("nd")).as("max_rhs"))
      val fd23 = ev
        .join(
          broadcast(Tables.customer(s, dir)
            .select(col("c_custkey").as("user_id"), col("c_mktsegment"))),
          Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("event_type")).as("nd_et"),
          countDistinct(col("c_mktsegment")).as("nd_seg"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("nd_et") > 1, 1L).otherwise(0L)).as("v_et"),
          max(col("nd_et")).as("m_et"),
          sum(when(col("nd_seg") > 1, 1L).otherwise(0L)).as("v_seg"),
          max(col("nd_seg")).as("m_seg"))
        .selectExpr("stack(2, 'user_id->event_type', n_groups, v_et, m_et, " +
          "'user_id->c_mktsegment', n_groups, v_seg, m_seg) " +
          "AS (fd, n_groups, n_violating, max_rhs)")
      fd1.unionByName(fd23).orderBy("fd")
    },

    // SCD2 POINT-IN-TIME LOOKUP — the read side of q_scd2_build: each
    // error event resolves the user's activity state AT ERROR TIME against
    // the type-change dimension (change rows deduped per (user, ts) by
    // max event_id — the q_attribution simultaneity contract), then the
    // state distribution. Engine runs it as an as-of join (union + ONE
    // ordered window per user — never a per-user interval cross product);
    // the oracle states the equivalent explicit half-open
    // [valid_from, valid_to) interval join, pinning the SCD2 lookup ≡
    // as-of equivalence.
    "q_scd2_lookup" -> { (s, dir) =>
      val evAll = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val chg = evAll.filter(col("event_type") =!= "error")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("event_type"), col("event_id")).as("state"))
      val probes = evAll.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      Relational
        .asofJoin(probes, chg, "user_id", "ts", "ts", Seq("state"))
        .groupBy(coalesce(col("state"), lit("none")).as("state"))
        .agg(count(lit(1)).as("n_errors"))
        .orderBy("state")
    },

    // Debounce/throttle audit: an event is KEPT iff the user's previous
    // same-type event is more than 5 s older (lag over the (ts, event_id)
    // total order — the double-click / retry-storm suppressor). Per type:
    // raw count, kept count, and the ×10⁶ drop rate. One key exchange +
    // in-partition sort; all arithmetic integral micros.
    "q_debounce" -> { (s, dir) =>
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("kept",
          col("prev_us").isNull || (col("us") - col("prev_us") > lit(5000000L)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("kept").cast("long")).as("n_kept"))
        .withColumn("drop_q6", expr("(n_events - n_kept) * 1000000 DIV n_events"))
        .orderBy("event_type")
    },

    // Analytic running window: per-user daily counts with a running
    // cumulative — the per-key ordered prefix aggregation (one shuffle on
    // user, one in-partition sort; the same shape as sequence packing).
    "q_user_running_total" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("cnt"), sum(col("cnt")).over(w).as("running"))
        .orderBy("user_id", "day")
    },

    // Distribution drift between ingestion periods: order-price histogram
    // of pre-1996 (reference) vs later (current) orders in ONE scan,
    // per-bucket quantized frequency deltas + the total-variation
    // distance on the bucket = -1 row — the corpus-composition-shift
    // monitor a continuously-ingesting training pipeline runs per batch.
    // Integer common-denominator deviations (exactly associative sums)
    // make the drift METRIC hash-checkable; see Relational.distDrift.
    "q_dist_drift" -> { (s, dir) =>
      Relational
        .distDrift(Tables.orders(s, dir), "o_totalprice",
          col("o_orderdate") < "1996-01-01", width = 50000.0)
        .orderBy("bucket")
    },

    // Schema/profile drift between ingestion periods: the existing
    // one-pass profile operator run per cohort (ts-halves of events,
    // predicate pushed to each scan), joined on col_name — null-count
    // and distinct-cardinality deltas plus a min/max-stability flag per
    // column. Completes the monitoring triad: q_constraint_audit
    // (quality), q_dist_drift (value distributions), this (shape).
    "q_schema_drift" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      def prof(pred: org.apache.spark.sql.Column, tag: String) =
        Relational
          .profile(ev.filter(pred), Seq("event_type", "user_id", "props"))
          .select(col("col_name"), col("n_null").as(s"n_null_$tag"),
            col("n_distinct").as(s"n_distinct_$tag"),
            col("min_s").as(s"min_$tag"), col("max_s").as(s"max_$tag"))
      prof(col("ts") < "2024-01-16", "ref")
        .join(prof(col("ts") >= "2024-01-16", "cur"), "col_name")
        .select(col("col_name"), col("n_null_ref"), col("n_null_cur"),
          col("n_distinct_ref"), col("n_distinct_cur"),
          floor(col("n_distinct_cur").cast("double") * 1e6 / col("n_distinct_ref"))
            .cast("long").as("distinct_ratio_q6"),
          (col("min_ref") === col("min_cur") && col("max_ref") === col("max_cur"))
            .as("minmax_stable"))
        .orderBy("col_name")
    },

    // Time-series gap fill: 10-minute per-type counts with missing buckets
    // zero-filled over the global range (Relational.gapFill) — the
    // densification/resample operator.
    "q_gapfill" -> { (s, dir) =>
      Relational
        .gapFill(Tables.events(s, dir), "ts", "event_type", bucketSec = 600)
        .orderBy("event_type", "bucket")
    },

    // Arg-max per group: each user's latest event by the unique,
    // arrival-ordered event_id, via Relational.argMaxJoin (hash agg +
    // co-partitioned join back — max_by with a STRING payload demotes to
    // SortAggregate, a per-partition sort of the full input at scale).
    "q_latest_event" -> { (s, dir) =>
      Relational
        .argMaxJoin(Tables.events(s, dir), "user_id", "event_id", Seq("event_type"))
        .select(col("user_id"), col("event_type").as("last_type"),
          col("event_id").as("last_event_id"), col("n_rows").as("n_events"))
        .orderBy("user_id")
    },

    // CDC MERGE with tombstones: a change log (op = delete on every 10th
    // event, else upsert; version = the unique arrival-ordered event_id)
    // compacted to current state — latest version wins per key, and a
    // winning DELETE removes the key entirely. This is the upsert /
    // compaction step every CDC ingest pipeline runs before serving.
    // Same two-phase argMaxJoin shape as q_latest_event (hash agg +
    // co-partitioned join back — codegen-safe with string payloads);
    // the tombstone filter runs on the |keys|-sized merged frame.
    "q_cdc_merge" -> { (s, dir) =>
      val log = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          when(col("event_id") % 10 === 0, "D").otherwise("U").as("op"),
          col("event_type"))
      Relational
        .argMaxJoin(log, "user_id", "event_id", Seq("op", "event_type"))
        .filter(col("op") =!= "D")
        .select(col("user_id"), col("event_id").as("ver"),
          col("event_type").as("state"))
        .orderBy("user_id")
    },

    // Snapshot diff ([[Relational.snapshotDiff]]): two keyed snapshots of
    // the orders table (old = keys % 7 != 0; new = keys % 5 != 0 with
    // every %3 key's cent total bumped — a synthetic backfill) classified
    // added/removed/changed/unchanged, rolled up per class with a key
    // checksum and the changed-cents delta. Tag-union + ONE key agg —
    // never a full outer join — so each snapshot shuffles exactly once.
    "q_snapshot_diff" -> { (s, dir) =>
      val cents = floor(col("o_totalprice") * 100).cast("long")
      val base = Tables.orders(s, dir)
      val oldSnap = base.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"), cents.as("cents"))
      val newSnap = base.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"),
          (cents + when(col("o_orderkey") % 3 === 0, 1L).otherwise(0L)).as("cents"))
      Relational
        .snapshotDiff(oldSnap, newSnap, "o_orderkey", "cents")
        .groupBy("change")
        .agg(
          count(lit(1)).as("n"),
          sum(col("key")).as("key_sum"),
          sum(when(col("change") === "changed", col("new_v") - col("old_v"))
            .otherwise(0L)).as("delta_cents"))
        .orderBy("change")
    },

    // SCD TYPE 2 dimension build from a raw change feed: per-user
    // time-ordered states collapsed to CHANGES (lag ≠ current filter),
    // then effective-dated validity intervals (valid_to = the next
    // change's valid_from; the open interval is the current row) — the
    // slowly-changing-dimension table warehouse modeling derives from
    // event streams. Both analytic windows share the SAME (user_id)
    // partitioning, so the change-collapse and the interval lead ride
    // ONE exchange (pinned).
    "q_scd2_build" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables
        .events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_type").as("state"),
          secs(col("ts")).as("valid_from"),
          coalesce(secs(col("next_ts")), lit(-1L)).as("valid_to"),
          col("next_ts").isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "state")
    },

    // Skew-safe salted aggregation (Scale.saltedAggregate): two-phase
    // partial/final sums behind a synthetic salt — oracle = the plain
    // single-phase GROUP BY, proving salting changes the plan, not the
    // answer. Values are floor-quantized so both phases sum exact integers.
    "q_salted_agg" -> { (s, dir) =>
      Scale
        .saltedAggregate(
          Tables.events(s, dir)
            .select(col("event_type"), floor(col("value") * 1000).cast("long").as("v_q3")),
          groupCols = Seq("event_type"),
          sumCols = Seq("v_q3"),
          saltBuckets = 8)
        .select(col("event_type"), col("sum_v_q3"), col("count_rows"))
        .orderBy("event_type")
    },

    // q_big_orders through the BUCKETED fact⋈fact path: both join sides
    // are first written bucketed+sorted on the order key
    // ([[Scale.writeBucketed]] via the Dedup Intermediate machinery, so
    // Verify/Bench GC the tables), and the join reads bucket-aligned
    // splits with ZERO exchange on the key — the one-time-write /
    // every-query-free trade a 100 TB deployment makes for its hottest
    // join key. `merge` hints pin the SortMergeJoin both sides'
    // bucket+sort layout feeds (at fixture SF the planner would broadcast
    // the agg side and never exercise the bucketed path). Same oracle as
    // q_big_orders — bucketing must be invisible to results.
    "q_big_orders_bucketed" -> { (s, dir) =>
      val bucketed = Dedup.Intermediate.Bucketed(buckets = 32)
      val big = bucketed.keyed(
        Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sq"))
          .filter(col("sq") > 300.0),
        "big_orders_agg", "l_orderkey")
      val ord = bucketed.keyed(
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        "big_orders_fact", "o_orderkey")
      ord.hint("merge")
        .join(big.hint("merge"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("sq").cast("long").as("sum_qty"))
        .orderBy("o_orderkey")
    },

    // Incremental view maintenance: the base period's aggregate is
    // MATERIALIZED (managed table — the stored rollup a production
    // pipeline maintains), the delta period aggregates alone, and the
    // merge of the two partials must equal the full recompute (the
    // oracle) EXACTLY. Values ride the integer-moments pattern
    // (floor(value*1000) summed as longs) so partial merge is exactly
    // associative — a raw double sum would make incremental ≠ recompute
    // in the last bits. At 100 TB this is THE shape: only the delta is
    // ever scanned; the base rollup is group-count-sized.
    "q_incremental_agg" -> { (s, dir) =>
      val boundary = lit("2024-01-01 08:00:00").cast("timestamp")
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("ts"),
          floor(col("value") * 1000).cast("long").as("v_q3"))
      val base = Dedup.Intermediate.Bucketed(32)(
        ev.filter(col("ts") < boundary)
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"), sum(col("v_q3")).as("sv")),
        "inc_base")
      val delta = ev.filter(col("ts") >= boundary)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("v_q3")).as("sv"))
      base.unionByName(delta)
        .groupBy("event_type")
        .agg(sum(col("cnt")).as("n_events"), sum(col("sv")).as("sum_v_q3"))
        .select(col("event_type"), col("n_events"), col("sum_v_q3"),
          (col("sum_v_q3").cast("double") / col("n_events") / 1000.0).as("avg_v"))
        .orderBy("event_type")
    },

    // Dynamic partition pruning: events materialize once PARTITIONED BY
    // day (the warehouse layout a 100 TB event store actually uses), then
    // a join against the top-3 purchase days — recomputed from the raw
    // feed, broadcast — prunes the partitioned scan to those 3 days AT
    // RUNTIME (PartitionFilters: dynamicpruningexpression; PlanSpec pins
    // it). At scale this is a 3-day read instead of a full-corpus scan.
    // The rank window on the dim side is day-granular (≤ tens of
    // thousands of rows at any SF) — the unpartitioned window is bounded.
    "q_dpp_hot_days" -> { (s, dir) =>
      val raw = Tables.events(s, dir)
      val part = Dedup.Intermediate.Partitioned.keyed(
        raw.withColumn("dt", to_date(col("ts"))), "events_bydt", "dt")
      val hot = raw
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("purchases"))
        .withColumn("rk",
          row_number().over(Window.orderBy(col("purchases").desc, col("dt").asc)))
        .filter(col("rk") <= 3)
        .select(col("dt"), col("purchases"))
      part
        .join(broadcast(hot), Seq("dt"))
        .groupBy(col("dt"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"),
          max(col("purchases")).as("purchases"))
        .orderBy("dt")
    },

    // Dense global row numbering WITHOUT the empty-over window's
    // single-reducer sort ([[Scale.globalRowNumber]]): range-repartition +
    // per-partition local numbering + broadcast prefix-sum offsets. The
    // oracle IS `row_number() OVER (ORDER BY …)` — the scalable plan must
    // reproduce the single-task semantics bit-for-bit. Driver traffic is
    // one count per partition; PlanSpec pins the absence of a
    // SinglePartition exchange.
    "q_global_rownum" -> { (s, dir) =>
      Scale
        .globalRowNumber(
          Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "doc_id", partitions = 8)
        .select(col("doc_id"), col("source"), col("rownum"))
        .orderBy("doc_id")
    },

    // Z-order layout statistics: events keyed by (user, day) get a Morton
    // z-value ([[Scale.zValue]], pure bit-algebra Column — codegen, no
    // UDF), and per z-bucket (top 4 z-bits = 16 buckets) min/max spans of
    // BOTH dimensions are computed. The law a z-layout buys: every bucket
    // bounds x AND y to ≤ 1/4 of their domain simultaneously — per-file
    // min/max stats can prune two-axis predicates, where a single-column
    // sort leaves the second dimension at full width. Oracle recomputes
    // the interleave closed-form per row.
    "q_zorder_locality" -> { (s, dir) =>
      // 5-bit dims (32×32 grid) so the fixture's user/day domains FILL the
      // space and all 16 top-4-bit buckets populate at every SF — the
      // locality law (both spans ≤ domain/4 per bucket) is then visible in
      // the output, not vacuously true of one giant bucket
      val bits = 5
      val ev = Tables.events(s, dir).select(
        pmod(col("user_id"), lit(1 << bits)).as("x"),
        pmod(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")),
          lit(1 << bits)).as("y"))
      ev.withColumn("z", Scale.zValue(col("x"), col("y"), bits))
        .withColumn("bucket", shiftright(col("z"), 2 * bits - 4))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_events"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy("bucket")
    },

    // The z-order layout EXERCISED end-to-end inside a declared query:
    // events get the 5-bit (user, day) z-value, are written
    // z-range-partitioned to parquet (the layout write a warehouse pays
    // once), read back under a two-dimensional box predicate — file-level
    // min/max stats prune most files (ScaleSpec measures the row
    // reduction) — and aggregated. The oracle runs the same box filter on
    // the ORIGINAL parquet: stats pruning must be invisible to results,
    // the same physical-choice contract as bucketing/salting/DPP.
    "q_zorder_scan" -> { (s, dir) =>
      val bits = 5
      val keyed = Tables.events(s, dir).select(
        pmod(col("user_id"), lit(1 << bits)).as("x"),
        pmod(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")),
          lit(1 << bits)).as("y"),
        floor(col("value") * 1000).cast("long").as("v_q3"))
      val path =
        Tables.scratchDir(s, "zorder")
      keyed.withColumn("z", Scale.zValue(col("x"), col("y"), bits))
        .repartitionByRange(16, col("z")).drop("z")
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .filter(col("x") >= 8 && col("x") < 16 && col("y") >= 16 && col("y") < 24)
        .agg(count(lit(1)).as("n_events"), sum(col("v_q3")).as("sum_v_q3"),
          count_distinct(col("x") * 32 + col("y")).as("n_cells"))
    },

    // Skew-salted fact⋈dim equi-join ([[Scale.saltedJoin]]): the hot fact
    // key's rows split across 8 (key, salt) reduce groups, the dim side
    // replicates ×8, merge hints pin the SortMergeJoin (modeling a dim too
    // large to broadcast — at fixture SF the planner would broadcast and
    // never exercise the salted path). Oracle = the plain join + GROUP BY:
    // salting is a physical choice and must be invisible to results.
    "q_join_salted" -> { (s, dir) =>
      val fact = Tables.events(s, dir)
        .select(col("user_id").as("c_custkey"),
          floor(col("value") * 1000).cast("long").as("v_q3"))
      val dim = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
      Scale
        .saltedJoin(fact, dim, "c_custkey", saltBuckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), sum(col("v_q3")).as("sum_v_q3"))
        .orderBy("c_mktsegment")
    },

    // Plain-SQL API surface: the same engine drives `spark.sql` text over
    // registered views — a reference user's raw-SQL workload runs
    // unchanged (the DataFrame queries and this one share Catalyst, so
    // parity here proves the SQL front end, not new semantics).
    "q_sql_interface" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS n, " +
          "CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents " +
          "FROM lineitem_v GROUP BY 1, 2 ORDER BY 1, 2")
    },

    // Join-key SKEW AUDIT — the diagnostic a pipeline runs BEFORE picking
    // plain vs salted vs broadcast for a join: per-key counts reduce
    // map-side, then one tiny pass emits the top-5 heavy keys plus the
    // skew factor max·n_keys·10⁶ DIV total (1e6 = perfectly uniform).
    // Only |keys|-sized frames ever shuffle.
    "q_key_skew_audit" -> { (s, dir) =>
      val perKey = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      val stats = perKey.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"),
        max(col("cnt")).as("max_cnt"))
      val top = perKey.orderBy(col("cnt").desc, col("user_id")).limit(5)
      top
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("user_id"))))
        .crossJoin(broadcast(stats))
        .select(col("rank"), col("user_id"), col("cnt"), col("n_keys"), col("total"),
          col("max_cnt"),
          // max/mean with a truncating integer mean: the triple product
          // max*n_keys*1e6 wraps Long at ~1e9 keys x 1e9 max
          expr("max_cnt * 1000000 DIV (total DIV n_keys)").as("skew_q6"))
        .orderBy("rank")
    },

    // Bloom-PREJOIN pruning declared end-to-end: a bloom filter built
    // from the (dim-scale) high-balance customer keys prunes the event
    // feed BEFORE the join shuffle — the runtime-filter pattern for
    // selective fact⋈dim joins; the exact join then re-checks, so bloom
    // false positives are invisible and the oracle is the PLAIN join
    // (the physical-choice contract shared with bucketing / salting /
    // z-order / DPP). At 100 TB the filter is a broadcast Array[Long]
    // carried by the BloomBitTest expression, plan size flat.
    "q_bloom_prejoin" -> { (s, dir) =>
      val rich = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey"))
      val bf = Bloom.broadcastFilter(s,
        Bloom.build(rich, "c_custkey", numBits = 1 << 16, numHashes = 5))
      Tables.events(s, dir)
        .filter(bf.mightContain(col("user_id")))
        .join(rich, col("user_id") === col("c_custkey"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(coalesce(col("value"), lit(0.0)) * 1000).cast("long")).as("sum_v_q3"))
        .orderBy("event_type")
    },

    // Clamped per-user credit balance ([[Relational.clampedBalance]]):
    // purchases add their cents, errors cost a flat 500, the balance never
    // goes below zero — the stateful sequential recurrence (inventory /
    // token-bucket class) that NO window rewrite expresses, run as one
    // repartition + per-partition sort + single-pass fold. Oracle = a
    // DuckDB recursive CTE stepping the identical recurrence.
    "q_clamped_balance" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "error"))
        .select(col("user_id"), secs(col("ts")).as("ts_s"), col("event_id"),
          when(col("event_type") === "purchase",
            floor(coalesce(col("value"), lit(0.0)) * 100).cast("long"))
            .otherwise(lit(-500L)).as("delta"))
      Relational
        .clampedBalance(e, "user_id", "ts_s", "event_id", "delta")
        .select(col("k").as("user_id"), col("balance"), col("n_clamps"), col("n_rows"))
        .orderBy("user_id")
    },

    // MERGEABLE quantile sketch with bounded RELATIVE error, fully
    // deterministic — the DDSketch idea on decimal-digit buckets so no
    // libm log ever runs: bucket key = (decimal length, first two digits)
    // of the exact cents integer (string ops, bit-identical cross-engine);
    // bucket width/lo ≤ 1/10 ⇒ midpoint estimate within ~5 % relative.
    // The sketch is a COUNT HISTOGRAM — merging shards is integer
    // addition, so the declared query builds it twice (direct, and
    // sharded-then-merged) and both estimates must agree exactly; the
    // exact percentile rides alongside for the error audit. At 100 TB the
    // sketch is the only thing that crosses executors: ≤ ~900 counters.
    "q_mergeable_quantiles" -> { (s, dir) =>
      val base = Tables.orders(s, dir)
        .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .select(col("cents"),
          length(col("cents").cast("string")).cast("long").as("len"),
          substring(col("cents").cast("string"), 1, 2).cast("long").as("d2"))
      val direct = base.groupBy(col("len"), col("d2")).agg(count(lit(1)).as("cnt"))
      val merged = base
        .withColumn("shard", pmod(col("cents"), lit(8L)))
        .groupBy(col("shard"), col("len"), col("d2"))
        .agg(count(lit(1)).as("c0"))
        .groupBy(col("len"), col("d2"))
        .agg(sum(col("c0")).as("cnt"))
      val exact = Tables.orders(s, dir)
        .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .agg(percentile(col("cents"),
          array(lit(0.5), lit(0.9), lit(0.99))).as("ex"))
        .select(posexplode(col("ex")).as(Seq("i", "exact_cents")))
        .select((element_at(array(lit(50L), lit(90L), lit(99L)), col("i") + 1)).as("p"),
          col("exact_cents"))
      def estimates(sk: DataFrame, name: String): DataFrame = {
        val wCum = Window.orderBy(col("len"), col("d2"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = sk
          .withColumn("cum", sum(col("cnt")).over(wCum))
          .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
          // lo/width from decimal strings — repeat('0', len-2) is exact in
          // both engines where power(10, k) would ride libm
          .withColumn("lo", when(col("len") === 1, col("d2"))
            .otherwise(concat(col("d2").cast("string"),
              expr("repeat('0', len - 2)")).cast("long")))
          .withColumn("width", when(col("len") === 1, lit(1L))
            .otherwise(concat(lit("1"), expr("repeat('0', len - 2)")).cast("long")))
        val ps = s.range(1, 4)
          .select(element_at(array(lit(50L), lit(90L), lit(99L)),
            col("id").cast("int")).as("p"))
        ps.crossJoin(cum)
          .withColumn("r", expr("(n * p + 99) DIV 100"))
          .filter(col("cum") >= col("r"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("p").orderBy(col("len"), col("d2"))))
          .filter(col("rn") === 1)
          .select(col("p"), col("n"),
            (col("lo") + expr("width DIV 2")).as(name))
      }
      estimates(direct, "est_direct")
        .join(estimates(merged, "est_merged").drop("n"), Seq("p"))
        .join(exact, Seq("p"))
        .select(col("p"), col("n"), col("est_direct"), col("est_merged"),
          col("exact_cents"))
        .orderBy("p")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_topk_users" -> ("SELECT event_type, user_id, cnt, rank FROM (" +
      "SELECT event_type, user_id, count(*) AS cnt, " +
      "row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, user_id ASC) AS rank " +
      "FROM events GROUP BY 1, 2) WHERE rank <= 5 ORDER BY event_type, rank"),

    "q_profile_columns" -> (Seq("event_id", "user_id", "event_type").map(c =>
      s"SELECT '$c' AS col_name, " +
        s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, " +
        s"count(DISTINCT $c) AS n_distinct, " +
        s"CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s " +
        "FROM events").mkString(" UNION ALL ") + " ORDER BY col_name"),

    // same checks, same null-counts-as-violation CASE semantics, same
    // exact composite distinct and distinct-key FK join
    "q_constraint_audit" -> ("WITH rc AS (SELECT count(*) AS n, " +
      "CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT) AS v_range, " +
      "CAST(sum(CASE WHEN l_tax <= 0.05 THEN 0 ELSE 1 END) AS BIGINT) AS v_tax, " +
      "CAST(sum(CASE WHEN l_discount <= 0.08 THEN 0 ELSE 1 END) AS BIGINT) AS v_disc, " +
      "CAST(sum(CASE WHEN l_quantity IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v_comp, " +
      "CAST(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END) AS BIGINT) AS v_dom, " +
      "count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_uniq FROM lineitem), " +
      "fk AS (SELECT count(*) AS n, " +
      "CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v " +
      "FROM (SELECT DISTINCT l_orderkey FROM lineitem) k " +
      "LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON k.l_orderkey = o.o_orderkey), " +
      "u AS (SELECT 'quantity_in_range' AS check_name, n AS n_checked, v_range AS violations FROM rc " +
      "UNION ALL SELECT 'tax_at_most_5pct', n, v_tax FROM rc " +
      "UNION ALL SELECT 'discount_at_most_8pct', n, v_disc FROM rc " +
      "UNION ALL SELECT 'quantity_complete', n, v_comp FROM rc " +
      "UNION ALL SELECT 'returnflag_in_domain', n, v_dom FROM rc " +
      "UNION ALL SELECT 'pk_line_unique', n, v_uniq FROM rc " +
      "UNION ALL SELECT 'fk_orderkey_in_orders', n, v FROM fk) " +
      "SELECT check_name, n_checked, violations, violations = 0 AS passed " +
      "FROM u ORDER BY check_name"),

    "q_fd_violations" -> ("WITH f1 AS (SELECT event_id AS l, " +
      "count(DISTINCT user_id) AS nd FROM events GROUP BY 1), " +
      "f2 AS (SELECT user_id AS l, count(DISTINCT event_type) AS nd " +
      "FROM events GROUP BY 1), " +
      "f3 AS (SELECT e.user_id AS l, count(DISTINCT c_mktsegment) AS nd " +
      "FROM events e JOIN customer ON c_custkey = e.user_id GROUP BY 1) " +
      "SELECT * FROM (" +
      "SELECT 'event_id->user_id' AS fd, count(*) AS n_groups, " +
      "CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating, " +
      "CAST(max(nd) AS BIGINT) AS max_rhs FROM f1 " +
      "UNION ALL SELECT 'user_id->event_type', count(*), " +
      "CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT), " +
      "CAST(max(nd) AS BIGINT) FROM f2 " +
      "UNION ALL SELECT 'user_id->c_mktsegment', count(*), " +
      "CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT), " +
      "CAST(max(nd) AS BIGINT) FROM f3) ORDER BY fd"),

    // the explicit half-open [valid_from, valid_to) SCD2 interval join —
    // provably the engine's as-of lookup on the deduped change frame
    "q_scd2_lookup" -> ("WITH seq AS (SELECT user_id, ts, event_id, event_type, " +
      "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
      "FROM events WHERE event_type != 'error'), " +
      "chg AS (SELECT user_id, ts, arg_max(event_type, event_id) AS state FROM seq " +
      "WHERE prev_type IS NULL OR prev_type != event_type GROUP BY 1, 2), " +
      "scd AS (SELECT user_id, state, ts AS valid_from, " +
      "lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to FROM chg), " +
      "err AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') " +
      "SELECT coalesce(s.state, 'none') AS state, count(*) AS n_errors " +
      "FROM err e LEFT JOIN scd s ON e.user_id = s.user_id " +
      "AND e.ts >= s.valid_from AND (s.valid_to IS NULL OR e.ts < s.valid_to) " +
      "GROUP BY 1 ORDER BY 1"),

    "q_debounce" -> ("WITH seq AS (SELECT event_type, " +
      "epoch_us(CAST(ts AS TIMESTAMP)) AS us, " +
      "lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER " +
      "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_us " +
      "FROM events) " +
      "SELECT event_type, n_events, n_kept, " +
      "(n_events - n_kept) * 1000000 // n_events AS drop_q6 FROM " +
      "(SELECT event_type, count(*) AS n_events, " +
      "CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 5000000 " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS n_kept FROM seq GROUP BY 1) ORDER BY 1"),

    "q_user_running_total" -> ("WITH daily AS (SELECT user_id, " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS cnt " +
      "FROM events GROUP BY 1, 2) " +
      "SELECT user_id, strftime(day, '%Y-%m-%d') AS day, cnt, " +
      "CAST(sum(cnt) OVER (PARTITION BY user_id ORDER BY day " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running " +
      "FROM daily ORDER BY user_id, day"),

    "q_distinct_users" -> ("SELECT event_type, count(DISTINCT user_id) AS distinct_users " +
      "FROM events GROUP BY 1 ORDER BY 1"),

    // deterministic HLL mirror: identical 60-bit hashes split 6/54,
    // rho via length(bin(w)) (exact integer — Spark's bin() and DuckDB's
    // both strip leading zeros), max-registers, a 64-bucket grid for the
    // empty registers, the EXACT integer harmonic sum Σ 2^(55−m) (≤ 2^61),
    // one fixed-order double chain for the raw estimate, and the same
    // pre-quantized ⌊64·ln(64/V)⌋ lookup literal on the linear-counting
    // branch — the sketch ESTIMATE is itself hash-checked
    "q_approx_distinct" -> {
      val lc = (1 to 64).map(v => math.floor(64.0 * math.log(64.0 / v)).toLong).mkString(", ")
      "WITH h AS (SELECT event_type, " +
        "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h FROM events), " +
        "r AS (SELECT event_type, h >> 54 AS bucket, " +
        "CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55 " +
        "ELSE 55 - length(bin(h & ((1::BIGINT << 54) - 1))) END AS rho FROM h), " +
        "reg AS (SELECT event_type, bucket, max(rho) AS m FROM r GROUP BY 1, 2), " +
        "gb AS (SELECT g.event_type, t.b AS bucket FROM " +
        "(SELECT DISTINCT event_type FROM events) g, generate_series(0, 63) t(b)), " +
        "fr AS (SELECT gb.event_type, coalesce(reg.m, 0) AS m FROM gb " +
        "LEFT JOIN reg ON reg.event_type = gb.event_type AND reg.bucket = gb.bucket), " +
        "agg AS (SELECT event_type, CAST(sum((1::BIGINT << (55 - m))) AS BIGINT) AS hsum, " +
        "CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v FROM fr GROUP BY 1) " +
        "SELECT event_type, CASE WHEN (0.709::DOUBLE * 4096.0::DOUBLE * 36028797018963968.0::DOUBLE) / CAST(hsum AS DOUBLE) <= 160.0 " +
        s"AND v > 0 THEN ([$lc]::BIGINT[])[v] " +
        "ELSE CAST(floor((0.709::DOUBLE * 4096.0::DOUBLE * 36028797018963968.0::DOUBLE) / CAST(hsum AS DOUBLE)) AS BIGINT) END " +
        "AS approx_users FROM agg ORDER BY event_type"
    },

    // identical 60-bit hashes, identical k-th-minimum, identical one-division
    // estimator — the approximate COUNT is itself hash-checked
    "q_distinct_kmv" -> ("WITH d AS (SELECT DISTINCT event_type, " +
      "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h FROM events), " +
      "r AS (SELECT event_type, h, row_number() OVER " +
      "(PARTITION BY event_type ORDER BY h) AS rn FROM d), " +
      "g AS (SELECT event_type, count(*) AS n_kept, max(h) AS h_k " +
      "FROM r WHERE rn <= 64 GROUP BY 1) " +
      "SELECT event_type, n_kept, h_k, " +
      "CASE WHEN n_kept < 64 THEN n_kept " +
      s"ELSE CAST(floor(${63.0 * math.pow(2, 60)} / h_k) AS BIGINT) END AS est_distinct " +
      "FROM g ORDER BY 1"),

    // the DIRECT bottom-k over the raw union — the merged sketches must
    // land on the identical h_k and estimate (mergeability is exact)
    "q_kmv_union" -> ("WITH d AS (SELECT DISTINCT " +
      "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h " +
      "FROM events WHERE event_type IN ('click', 'error')), " +
      "r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM d), " +
      "g AS (SELECT count(*) AS n_kept, max(h) AS h_k FROM r WHERE rn <= 64) " +
      "SELECT n_kept, h_k, CASE WHEN n_kept < 64 THEN n_kept " +
      s"ELSE CAST(floor(${63.0 * math.pow(2, 60)} / h_k) AS BIGINT) END AS est_distinct " +
      "FROM g"),

    // identical sketches, identical θ = min of the two k-th minimums
    // (or M for an exact set), identical retained count and one-division
    // estimator — the theta-sketch INTERSECTION estimate is hash-checked
    "q_kmv_intersect" -> ("WITH d AS (SELECT DISTINCT event_type AS s, " +
      "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h " +
      "FROM events WHERE event_type IN ('click', 'error')), " +
      "r AS (SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rn FROM d), " +
      "sk AS (SELECT s, h FROM r WHERE rn <= 64), " +
      "t AS (SELECT min(CASE WHEN n < 64 THEN 1152921504606846976 ELSE h_k END) AS theta " +
      "FROM (SELECT s, count(*) AS n, max(h) AS h_k FROM sk GROUP BY 1)), " +
      "i AS (SELECT count(*) AS n_retained " +
      "FROM (SELECT h FROM sk WHERE s = 'click') a " +
      "JOIN (SELECT h FROM sk WHERE s = 'error') b USING (h) " +
      "CROSS JOIN t WHERE h < t.theta) " +
      "SELECT i.n_retained, t.theta, " +
      "CAST(floor(i.n_retained * 1152921504606846976.0 / t.theta) AS BIGINT) " +
      "AS est_intersect FROM i CROSS JOIN t"),

    // scalar subqueries for the bounds: DuckDB generate_series cannot take
    // lateral column parameters
    "q_gapfill" -> ("WITH b AS (SELECT event_type, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))/600)*600 AS BIGINT) AS bucket, count(*) AS cnt " +
      "FROM events GROUP BY 1, 2), " +
      "spine AS (SELECT event_type, unnest(generate_series(lo, hi, 600)) AS bucket " +
      "FROM (SELECT DISTINCT event_type FROM b) CROSS JOIN " +
      "(SELECT min(bucket) AS lo, max(bucket) AS hi FROM b)) " +
      "SELECT s.event_type, s.bucket, coalesce(b.cnt, 0) AS cnt FROM spine s " +
      "LEFT JOIN b ON s.event_type = b.event_type AND s.bucket = b.bucket " +
      "ORDER BY 1, 2"),

    // per-cohort profiles recomputed column-by-column, identical ratio
    // quantization and stability flags
    "q_schema_drift" -> {
      def side(where: String) = Seq("event_type", "user_id", "props").map(c =>
        s"SELECT '$c' AS col_name, " +
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, " +
          s"count(DISTINCT $c) AS nd, " +
          s"CAST(min($c) AS VARCHAR) AS mn, CAST(max($c) AS VARCHAR) AS mx " +
          s"FROM events WHERE $where").mkString(" UNION ALL ")
      s"WITH ref AS (${side("ts < '2024-01-16'")}), " +
        s"cur AS (${side("ts >= '2024-01-16'")}) " +
        "SELECT col_name, r.n_null AS n_null_ref, c.n_null AS n_null_cur, " +
        "r.nd AS n_distinct_ref, c.nd AS n_distinct_cur, " +
        "CAST(floor(c.nd * 1000000.0 / r.nd) AS BIGINT) AS distinct_ratio_q6, " +
        "(r.mn = c.mn AND r.mx = c.mx) AS minmax_stable " +
        "FROM ref r JOIN cur c USING (col_name) ORDER BY col_name"
    },

    // same one-pass conditional histogram, same integer numerators with
    // one final IEEE division — the TVD row is hash-checked, not banded
    "q_dist_drift" -> ("WITH b AS (SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket, " +
      "CAST(sum(CASE WHEN o_orderdate < '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_ref, " +
      "CAST(sum(CASE WHEN o_orderdate < '1996-01-01' THEN 0 ELSE 1 END) AS BIGINT) AS cnt_cur " +
      "FROM orders GROUP BY 1), " +
      "t AS (SELECT CAST(sum(cnt_ref) AS BIGINT) AS na, CAST(sum(cnt_cur) AS BIGINT) AS nb FROM b) " +
      "SELECT bucket, cnt_ref, cnt_cur, " +
      "CAST(floor(cnt_ref * 1000000.0 / na) AS BIGINT) AS freq_ref_q6, " +
      "CAST(floor(cnt_cur * 1000000.0 / nb) AS BIGINT) AS freq_cur_q6, " +
      "CAST(floor(abs(cnt_ref * nb - cnt_cur * na) * 1000000.0 / (na * nb)) AS BIGINT) AS dev_q6 " +
      "FROM b CROSS JOIN t " +
      "UNION ALL " +
      "SELECT -1, na, nb, 1000000, 1000000, " +
      "CAST(floor(CAST(sum(abs(cnt_ref * nb - cnt_cur * na)) AS DOUBLE) * 1000000.0 " +
      "/ (2.0 * na * nb)) AS BIGINT) " +
      "FROM b CROSS JOIN t GROUP BY na, nb " +
      "ORDER BY bucket"),

    "q_latest_event" -> ("SELECT user_id, arg_max(event_type, event_id) AS last_type, " +
      "max(event_id) AS last_event_id, count(*) AS n_events " +
      "FROM events GROUP BY 1 ORDER BY 1"),

    // arg_max per key over the synthesized op log, tombstones dropped
    "q_cdc_merge" -> ("WITH log AS (SELECT user_id, event_id, " +
      "CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op, event_type FROM events) " +
      "SELECT user_id, max(event_id) AS ver, " +
      "arg_max(event_type, event_id) AS state FROM log GROUP BY user_id " +
      "HAVING arg_max(op, event_id) != 'D' ORDER BY user_id"),

    // FULL JOIN is the oracle's natural spelling of the engine's
    // tag-union + key-agg (same per-key classification, same rollup)
    "q_snapshot_diff" -> ("WITH oldsnap AS (SELECT o_orderkey AS k, " +
      "CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders WHERE o_orderkey % 7 != 0), " +
      "newsnap AS (SELECT o_orderkey AS k, " +
      "CAST(floor(o_totalprice * 100) AS BIGINT) + " +
      "CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS v " +
      "FROM orders WHERE o_orderkey % 5 != 0), " +
      "d AS (SELECT coalesce(o.k, n.k) AS k, o.v AS ov, n.v AS nv, " +
      "CASE WHEN o.k IS NULL THEN 'added' WHEN n.k IS NULL THEN 'removed' " +
      "WHEN o.v IS DISTINCT FROM n.v THEN 'changed' ELSE 'unchanged' END AS change " +
      "FROM oldsnap o FULL JOIN newsnap n ON o.k = n.k) " +
      "SELECT change, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum, " +
      "CAST(sum(CASE WHEN change = 'changed' THEN nv - ov ELSE 0 END) AS BIGINT) " +
      "AS delta_cents FROM d GROUP BY 1 ORDER BY 1"),

    // identical change-collapse + interval windows; epoch-floor seconds
    "q_scd2_build" -> ("WITH seq AS (SELECT user_id, ts, event_id, event_type, " +
      "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type " +
      "FROM events), " +
      "chg AS (SELECT user_id, ts, event_id, event_type FROM seq " +
      "WHERE prev_type IS NULL OR prev_type != event_type), " +
      "iv AS (SELECT user_id, event_type AS state, ts, " +
      "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts FROM chg) " +
      "SELECT user_id, state, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS valid_from, " +
      "coalesce(CAST(floor(epoch(CAST(next_ts AS TIMESTAMP))) AS BIGINT), -1) AS valid_to, " +
      "next_ts IS NULL AS is_current " +
      "FROM iv ORDER BY user_id, valid_from, state"),

    // oracle is the PLAIN single-phase GROUP BY — the salted two-phase
    // engine plan must produce the identical answer
    "q_salted_agg" -> ("SELECT event_type, " +
      "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_q3, " +
      "count(*) AS count_rows FROM events GROUP BY 1 ORDER BY 1"),

    // identical to q_big_orders: the bucketed layout is a physical choice
    // and must be invisible to results
    "q_big_orders_bucketed" -> ("SELECT c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice, " +
      "CAST(sum_qty AS BIGINT) AS sum_qty FROM orders " +
      "JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem " +
      "GROUP BY 1 HAVING sum(l_quantity) > 300.0) ON o_orderkey = l_orderkey " +
      "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),

    // the FULL recompute — base ⊎ delta must merge to exactly this
    "q_incremental_agg" -> ("SELECT event_type, count(*) AS n_events, " +
      "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_q3, " +
      "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)::DOUBLE / count(*) / 1000.0 " +
      "AS avg_v FROM events GROUP BY 1 ORDER BY 1"),

    // identical to the unpartitioned computation: the day-partitioned
    // layout + DPP is a physical choice and must be invisible to results
    "q_dpp_hot_days" -> ("WITH hot AS (SELECT dt, purchases FROM (" +
      "SELECT CAST(ts AS DATE) AS dt, count(*) AS purchases, " +
      "row_number() OVER (ORDER BY count(*) DESC, CAST(ts AS DATE) ASC) AS rk " +
      "FROM events WHERE event_type = 'purchase' GROUP BY 1) WHERE rk <= 3) " +
      "SELECT dt, count(*) AS n_events, round(sum(value), 2) AS sum_value, " +
      "max(purchases) AS purchases " +
      "FROM (SELECT CAST(ts AS DATE) AS dt, value FROM events) e " +
      "JOIN hot USING (dt) GROUP BY 1 ORDER BY 1"),

    // the oracle IS the single-reducer window the engine refuses to run —
    // the range-partitioned prefix-sum plan must match it exactly
    "q_global_rownum" -> ("SELECT doc_id, source, " +
      "row_number() OVER (ORDER BY doc_id) - 1 AS rownum " +
      "FROM documents ORDER BY doc_id"),

    // Morton interleave recomputed closed-form per row (x bits on even
    // z positions, y bits on odd), bucketed by the top 4 z-bits
    "q_zorder_locality" -> ("WITH d AS (SELECT user_id % 32 AS x, " +
      "datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 32 AS y FROM events), " +
      "z AS (SELECT x, y, list_sum(list_transform(generate_series(0, 4), " +
      "i -> (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i + 1)))) AS zv FROM d) " +
      "SELECT CAST(zv >> 6 AS BIGINT) AS bucket, count(*) AS n_events, " +
      "CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x, " +
      "CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y " +
      "FROM z GROUP BY 1 ORDER BY 1"),

    // the same box filter + aggregate over the ORIGINAL parquet — the
    // z-layout write/read cycle and its stats pruning must be invisible
    "q_zorder_scan" -> ("WITH d AS (SELECT user_id % 32 AS x, " +
      "datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 32 AS y, " +
      "CAST(floor(value * 1000) AS BIGINT) AS v_q3 FROM events) " +
      "SELECT count(*) AS n_events, CAST(sum(v_q3) AS BIGINT) AS sum_v_q3, " +
      "count(DISTINCT x * 32 + y) AS n_cells FROM d " +
      "WHERE x >= 8 AND x < 16 AND y >= 16 AND y < 24"),

    // the PLAIN join + GROUP BY — the salted (key, salt) two-sided plan
    // must produce the identical answer
    "q_join_salted" -> ("SELECT c_mktsegment, count(*) AS n_events, " +
      "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_q3 " +
      "FROM events JOIN customer ON user_id = c_custkey " +
      "GROUP BY 1 ORDER BY 1"),

    // byte-identical SQL text modulo the view name
    "q_sql_interface" -> ("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
      "CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents " +
      "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),

    // same top order and integer skew quotient
    "q_key_skew_audit" -> ("WITH pk AS (SELECT user_id, count(*) AS cnt " +
      "FROM events GROUP BY 1), " +
      "st AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total, " +
      "max(cnt) AS max_cnt FROM pk), " +
      "tp AS (SELECT user_id, cnt, row_number() OVER (ORDER BY cnt DESC, user_id) AS rank " +
      "FROM pk) " +
      "SELECT rank, user_id, cnt, n_keys, total, max_cnt, " +
      "max_cnt * 1000000 // (total // n_keys) AS skew_q6 " +
      "FROM tp, st WHERE rank <= 5 ORDER BY rank"),

    // the PLAIN join — the bloom prune must be result-invisible
    "q_bloom_prejoin" -> ("SELECT event_type, count(*) AS n, " +
      "CAST(sum(CAST(floor(coalesce(value, 0) * 1000) AS BIGINT)) AS BIGINT) AS sum_v_q3 " +
      "FROM events JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) " +
      "ON user_id = c_custkey GROUP BY 1 ORDER BY 1"),

    // the identical recurrence stepped by a recursive CTE: the frontier is
    // one row per user per step, joined to the rn+1 event
    "q_clamped_balance" -> ("WITH RECURSIVE e AS (SELECT user_id, " +
      "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s, event_id, " +
      "CASE WHEN event_type = 'purchase' " +
      "THEN CAST(floor(coalesce(value, 0) * 100) AS BIGINT) ELSE -500 END AS delta " +
      "FROM events WHERE event_type IN ('purchase', 'error')), " +
      "r AS (SELECT user_id, row_number() OVER " +
      "(PARTITION BY user_id ORDER BY ts_s, event_id) AS rn, delta FROM e), " +
      "rec(user_id, rn, bal, clamps) AS (" +
      "SELECT user_id, rn, greatest(0, delta), " +
      "CASE WHEN delta < 0 THEN 1 ELSE 0 END FROM r WHERE rn = 1 " +
      "UNION ALL SELECT r.user_id, r.rn, greatest(0, rec.bal + r.delta), " +
      "rec.clamps + CASE WHEN rec.bal + r.delta < 0 THEN 1 ELSE 0 END " +
      "FROM rec JOIN r ON r.user_id = rec.user_id AND r.rn = rec.rn + 1), " +
      "f AS (SELECT user_id, max(rn) AS n_rows FROM r GROUP BY 1) " +
      "SELECT rec.user_id, CAST(bal AS BIGINT) AS balance, " +
      "CAST(clamps AS BIGINT) AS n_clamps, n_rows FROM rec " +
      "JOIN f ON rec.user_id = f.user_id AND rec.rn = f.n_rows ORDER BY rec.user_id"),

    // same digit buckets, rank walk, and string-built lo/width; the two
    // sketch paths must agree exactly — merging is integer addition
    "q_mergeable_quantiles" -> {
      def walk(sk: String, alias: String) =
        s"cum_$alias AS (SELECT len, d2, " +
          s"CAST(sum(cnt) OVER (ORDER BY len, d2 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum " +
          s"FROM $sk), " +
          s"n_$alias AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM $sk), " +
          s"walk_$alias AS (SELECT p, n, len, d2, " +
          s"row_number() OVER (PARTITION BY p ORDER BY len, d2) AS rn " +
          s"FROM pd, n_$alias, cum_$alias WHERE cum >= (n * p + 99) // 100), " +
          s"est_$alias AS (SELECT p, n, " +
          "CASE WHEN len = 1 THEN d2 ELSE " +
          "CAST(d2::VARCHAR || repeat('0', CAST(len - 2 AS INTEGER)) AS BIGINT) END + " +
          "CASE WHEN len = 1 THEN 1 ELSE " +
          "CAST('1' || repeat('0', CAST(len - 2 AS INTEGER)) AS BIGINT) END // 2 " +
          s"AS $alias FROM walk_$alias WHERE rn = 1)"
      "WITH c AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents " +
        "FROM orders WHERE floor(o_totalprice * 100) > 0), " +
        "b AS (SELECT cents, CAST(length(cents::VARCHAR) AS BIGINT) AS len, " +
        "CAST(substr(cents::VARCHAR, 1, 2) AS BIGINT) AS d2 FROM c), " +
        "skd AS (SELECT len, d2, count(*) AS cnt FROM b GROUP BY 1, 2), " +
        "skm AS (SELECT len, d2, CAST(sum(c0) AS BIGINT) AS cnt FROM " +
        "(SELECT cents % 8 AS shard, len, d2, count(*) AS c0 FROM b GROUP BY 1, 2, 3) " +
        "GROUP BY 1, 2), " +
        "pd AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS p), " +
        walk("skd", "est_direct") + ", " + walk("skm", "est_merged") + ", " +
        "ex AS (SELECT 50 AS p, quantile_cont(cents, 0.5) AS exact_cents FROM c " +
        "UNION ALL SELECT 90, quantile_cont(cents, 0.9) FROM c " +
        "UNION ALL SELECT 99, quantile_cont(cents, 0.99) FROM c) " +
        "SELECT d.p, d.n, d.est_direct, m.est_merged, ex.exact_cents " +
        "FROM est_est_direct d JOIN est_est_merged m ON d.p = m.p " +
        "JOIN ex ON d.p = ex.p ORDER BY d.p"
    }
  )
}
