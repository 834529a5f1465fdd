package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import RelationalQueries.{secs, dailyCents, pctSql, DailyCentsCte}

/** Declared TPC-H-shaped star-join/rollup queries over the fact tables — split from [[RelationalQueries]]
  * (pure code motion, round 12); see its scaladoc for the shared
  * column-alignment / determinism / rounding contracts.
  */
object RelationalTpchQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Broadcast dimension enrichment: events.user_id → customer.c_custkey.
    // Fact side never shuffles for the lookup (BroadcastHashJoin).
    "q_join_enrich" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val cust = Tables.customer(s, dir)
      Relational
        .enrich(ev, cust, ev("user_id") === cust("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("segment")
    },

    // CUBE over label columns: all 4 grouping sets in one shuffle (Expand).
    "q_cube_labels" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .cube(col("event_type"), get_json_object(col("props"), "$.k").isNotNull.as("has_k"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("event_type"), lit("<all>")).as("event_type"),
          coalesce(col("has_k").cast("string"), lit("<all>")).as("has_k"),
          col("cnt"))
        .orderBy("event_type", "has_k")
    },

    // ROLLUP revenue by region→nation over the 4-join TPC-H path. True
    // dimensions (customer/nation/region) broadcast; lineitem⋈orders is
    // fact⋈fact — left to AQE (shuffle join at scale, never broadcast).
    "q_rollup_revenue" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      val joined = li
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      joined
        .rollup(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(
          coalesce(col("r_name"), lit("<all>")).as("region"),
          coalesce(col("n_name"), lit("<all>")).as("nation"),
          col("revenue"))
        .orderBy("region", "nation")
    },

    // TPC-H Q1-shaped pricing summary — the bench headline aggregation.
    "q_pricing_summary" -> { (s, dir) =>
      Tables
        .lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // TPC-H Q3-shaped shipping priority: top-10 open orders by revenue.
    // Customer dim broadcasts (with its segment filter applied below the
    // join); lineitem⋈orders stays a shuffle join; the top-10 is a sort
    // of the per-order AGGREGATE, never of raw line items.
    "q_ship_priority" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust.filter(col("c_mktsegment") === "BUILDING")),
          ord("o_custkey") === cust("c_custkey"))
        .filter(ord("o_orderdate") < "1997-06-01" && li("l_shipdate") > "1997-06-01")
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // TPC-H Q5-shaped revenue per nation within one region.
    "q_revenue_by_nation" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg.filter(col("r_name") === "ASIA")),
          nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("nation")
    },

    // Semi-join (EXISTS shape, TPC-H Q4-like): order-priority counts over
    // orders having at least one returned line item. The probe side is a
    // distinct key set; left_semi keeps orders unduplicated without a
    // post-join distinct.
    "q_priority_with_returns" -> { (s, dir) =>
      val ord = Tables.orders(s, dir)
      val returned = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      ord
        .join(returned, ord("o_orderkey") === returned("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    },

    // PIVOT: event-type counts as columns per day (explicit value list —
    // Spark plans pivot as ONE conditional aggregation pass, no
    // per-column scans; oracle mirrors with CASE sums).
    "q_pivot_types" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        // a (day, type) combination with no rows pivots to NULL where the
        // oracle's conditional sum yields 0 — normalize
        .select(date_format(col("d"), "yyyy-MM-dd").as("day") +:
          Seq("click", "error", "purchase", "signup", "view")
            .map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("day")
    },

    // Set operation: (user, day) pairs with clicks but no errors (EXCEPT).
    "q_users_click_not_error" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      def pairs(t: String) = ev
        .filter(col("event_type") === t)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      pairs("click").except(pairs("error")).orderBy("user_id", "day")
    },

    // TPC-H Q14-shaped promo revenue: one month of lineitem joined to the
    // part dimension (broadcast — the fact side never shuffles), promo vs
    // total revenue in a single conditional-aggregation pass.
    "q_promo_revenue" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01") && col("l_shipdate") < lit("1996-04-01"))
      li.join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0))), 2)
            .as("promo_rev"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("total_rev"))
    },

    // Supplier-dimension rollup: supplier ⋈ nation ⋈ region (both dims
    // broadcast), account-balance stats per region/nation.
    "q_supplier_balance" -> { (s, dir) =>
      Tables
        .supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("suppliers"), round(sum(col("s_acctbal")), 2).as("total_bal"))
        .orderBy("region", "nation")
    },

    // Set operation: (user, day) pairs with clicks AND errors (INTERSECT —
    // completes the set-op family next to union/except).
    "q_users_click_and_error" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      def pairs(t: String) = ev
        .filter(col("event_type") === t)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      pairs("click").intersect(pairs("error")).orderBy("user_id", "day")
    },

    // Analytic ntile: per-type value quartiles (unique (value, event_id)
    // ordering makes tile assignment deterministic in both engines).
    "q_ntile" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      Tables
        .events(s, dir)
        .select(col("event_type"), col("event_id"), ntile(4).over(w).as("quartile"))
        .orderBy("event_type", "event_id")
    },

    // UNPIVOT — the inverse of q_pivot_types: the wide per-day count matrix
    // melts back to long (day, event_type, cnt) rows via Spark's native
    // unpivot (zero-filled first: DuckDB's UNPIVOT drops NULL cells).
    "q_unpivot" -> { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables
        .events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("d") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      pivoted
        .unpivot(Array(col("d")), types.map(col).toArray, "event_type", "cnt")
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("event_type"), col("cnt"))
        .orderBy("day", "event_type")
    },

    // Date/time scalar functions: monthly order rollup via date_trunc.
    "q_orders_by_month" -> { (s, dir) =>
      Tables
        .orders(s, dir)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("month")
    },

    // FULL OUTER join coverage: per-(user, day) error activity vs click
    // activity — rows surviving from either side, absent side ⇒ 0, with
    // a category tag. Both inputs share the (user, day) partitioning.
    "q_error_click_days" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      def side(t: String, as: String) = ev
        .filter(col("event_type") === t)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as(as))
      side("error", "err_cnt")
        .join(side("click", "click_cnt"), Seq("user_id", "day"), "full_outer")
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("err_cnt"), lit(0L)).as("err_cnt"),
          coalesce(col("click_cnt"), lit(0L)).as("click_cnt"),
          when(col("err_cnt").isNull, "click_only")
            .when(col("click_cnt").isNull, "error_only")
            .otherwise("both").as("category"))
        .orderBy("user_id", "day")
    },

    // TPC-H Q13-shaped: distribution of customers by order count, INCLUDING
    // zero-order customers (left join + double aggregation — the join must
    // preserve unmatched dimension rows for the 0 bucket to exist).
    "q_cust_order_dist" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_customers").desc, col("n_orders").desc)
    },

    // TPC-H Q18-shaped: large-quantity orders. The HAVING subquery becomes
    // an aggregate-FIRST frame (map-side combine over lineitem, the big
    // table) joined to orders — never orders⋈lineitem THEN re-aggregate.
    // l_quantity is integer-valued, so the sum is exact and cast long.
    "q_big_orders" -> { (s, dir) =>
      val big = Tables
        .lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > 300.0)
      Tables
        .orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("sq").cast("long").as("sum_qty"))
        .orderBy("o_orderkey")
    },

    // Scalar-subquery shape: rows above the GLOBAL mean. The 1-row global
    // aggregate broadcasts into the per-row comparison (never a shuffle of
    // the fact side); the mean is an exact-integer sum / count — one IEEE
    // division, and floor-quantized row values compare against it
    // identically in both engines.
    "q_above_avg" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"),
        floor(col("value") * 1000).cast("long").as("v_q3"))
      val globalAvg = ev.agg(
        (sum(col("v_q3")).cast("double") / count(lit(1))).as("avg_q3"))
      ev.join(broadcast(globalAvg))
        .filter(col("v_q3") > col("avg_q3"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy("event_type")
    },

    // GROUPING SETS — the general form cube/rollup specialize: exactly the
    // requested aggregation levels ((event_type), (day), ()), ONE pass via
    // a single Expand, no superfluous cube combinations. Null indicators
    // coalesce to sentinels so the three levels are distinguishable.
    "q_grouping_sets" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .select(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
          floor(col("value") * 1000).cast("long").as("v_q3"))
        .groupingSets(
          Seq(Seq(col("event_type")), Seq(col("day")),
            Seq.empty[org.apache.spark.sql.Column]),
          col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"), sum(col("v_q3")).as("sum_v_q3"))
        // '<all>' sentinel RELIES ON THE FIXTURE: event_type/day are
        // non-null, never literally '<all>'. Against data where either
        // could hold, tag levels with grouping_id() instead — a sentinel
        // cannot distinguish a grouping-null from a data value.
        .select(coalesce(col("event_type"), lit("<all>")).as("event_type"),
          coalesce(col("day"), lit("<all>")).as("day"),
          col("cnt"), col("sum_v_q3"))
        .orderBy("event_type", "day")
    },

    // TPC-H Q10-shaped: top-20 customers by returned-item revenue in one
    // quarter. Date+flag predicates push to the scans; dims broadcast;
    // final top-k is TakeOrderedAndProject (never a global sort).
    "q_returned_revenue" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val ord = Tables
        .orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        // per-row revenue floor-quantized to 1e-4 (exact integers sum in
        // any partition order; a raw double sum rounds differently across
        // engines at the 2nd decimal), ONE division back at the end
        .groupBy(col("c_custkey"), col("c_name"), col("n_name").as("nation"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")).as("rev_q4"))
        .select(col("c_custkey"), col("c_name"), col("nation"),
          (col("rev_q4") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // TPC-H Q17-shaped: revenue from small-quantity lineitems, where
    // "small" is CORRELATED — below 20% of that part's own average
    // quantity. The correlated scalar subquery decorrelates into an
    // aggregate-join: per-part (n, Σqty) aggregated FIRST (map-side
    // combine over lineitem, never a per-row re-scan), joined back to
    // lineitem CO-PARTITIONED on l_partkey (one shuffle key for both the
    // agg and the probe — no nested loop anywhere), then the part dim.
    // The threshold compare `qty < 0.2·(Σ/n)` is cross-multiplied to
    // `5·qty·n < Σ` so it stays in exact integer arithmetic (l_quantity
    // is integer-valued); revenue is cents-quantized, summed exactly, and
    // divided once by 700 (Q17's "/7.0 yearly average" convention).
    "q_small_quantity_revenue" -> { (s, dir) =>
      val li = Tables
        .lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val thr = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"))
      li.join(thr, col("l_partkey") === col("t_partkey"))
        .filter(col("qty") * 5 * col("n") < col("sq"))
        .join(Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg((sum(col("cents")).cast("double") / 700.0).as("avg_yearly"))
        .orderBy("p_brand")
    },

    // TPC-H Q21-shaped (adapted to this schema's columns): suppliers who
    // were the SOLE LATEST shipper on a multi-supplier order — the
    // EXISTS (another supplier on the order) + NOT EXISTS (anyone shipping
    // later-or-tied) double correlation. Decorrelated to an
    // AGGREGATE-JOIN chain riding ONE l_orderkey exchange: lineitem is
    // repartitioned by order once; the per-(order, supplier) max-shipdate
    // aggregate, the per-order (max, supplier-count) aggregate, and the
    // join-back all consume that same partitioning (subset-key grouping +
    // exchange reuse — no new shuffle anywhere in the chain). This
    // replaces the earlier one-window-pass form: same single exchange,
    // but per-order O(1) aggregation state instead of two collect_set
    // buffers materialized per ROW of the window frame. The supplier dim
    // broadcasts; final rank is the usual TakeOrdered top-k.
    "q_sole_late_shipper" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_orderkey"))
      // per (order, supplier): latest ship date — the groupBy DEDUPS
      // multi-line suppliers first, so everything downstream runs over
      // one-row-per-supplier frames; grouping on a superset of the
      // repartition key keeps the l_orderkey partitioning
      val perSupp = Tables
        .lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("s_mx"))
        // per-order max + supplier count as O(1)-state windows over the
        // SAME partitioning (no exchange, no join-back; the round-6 form
        // materialized two collect_set buffers per window row instead)
        .withColumn("mx", max(col("s_mx")).over(w))
        .withColumn("n_supp", count(lit(1)).over(w))
      perSupp
        .filter(col("n_supp") > 1 && col("s_mx") === col("mx"))
        // sole winner ⇔ exactly one supplier achieves the per-order max;
        // min() is that supplier (the group has one row)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_max_supp"), min(col("l_suppkey")).as("l_suppkey"))
        .filter(col("n_max_supp") === 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    },

    // TPC-H Q20-shaped (no partsupp table in this schema): suppliers who
    // OVER-SHIP a part — their shipped quantity exceeds that part's
    // per-supplier AVERAGE — for parts in a name family. The reference
    // formulation is a nested IN with a CORRELATED aggregate threshold
    // (qty > avg over that part's suppliers); decorrelated here to ONE
    // l_partkey exchange: repartition by part, per-(part, supplier)
    // quantity aggregate, per-part total and supplier count as WINDOWS
    // over the same partitioning, threshold compare cross-multiplied to
    // exact integers (sp_qty · n_s > p_qty — no division reaches the
    // filter). The p_name prefix predicate pushes to the part scan and
    // prunes lineitem via a broadcast semi-join BEFORE the shuffle.
    // (Verified non-vacuous at all three SFs: 97 / 3128 / 35657
    // surviving pairs — a dominance-style >50% threshold matches zero
    // rows on this data's uniform quantities.)
    "q_excess_shipper" -> { (s, dir) =>
      val pk = Tables.part(s, dir)
        .filter(col("p_name").like("large%"))
        .select(col("p_partkey"))
      val w = Window.partitionBy(col("l_partkey"))
      Tables
        .lineitem(s, dir)
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
        // floor() BEFORE the cast: Spark cast(double→long) truncates toward
        // zero while DuckDB CAST rounds half-to-even — floor on both sides
        // makes the two engines truncate identically for any quantity, not
        // just the integral-valued fixtures
        .select(col("l_partkey"), col("l_suppkey"),
          floor(col("l_quantity")).cast("long").as("qty"))
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("sp_qty"))
        .withColumn("p_qty", sum(col("sp_qty")).over(w))
        .withColumn("n_s", count(lit(1)).over(w))
        .filter(col("sp_qty") * col("n_s") > col("p_qty"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_parts"), sum(col("sp_qty")).as("qty_sum"))
        .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("n_parts"), col("qty_sum"))
        .orderBy("s_name")
    },

    // TPC-H Q15-shaped: the top supplier(s) by one quarter's revenue —
    // the max-over-aggregate-view pattern, TIE-PRESERVING (every supplier
    // at the max survives, exactly like the view-based original). Revenue
    // is cents⁴-quantized per row and summed exactly, so the max compare
    // is integer equality — no double equality across engines. The 1-row
    // max broadcasts back over the |suppliers|-sized aggregate (the
    // q_rich_inactive broadcast-scalar shape); supplier dim broadcasts.
    "q_top_supplier" -> { (s, dir) =>
      val rev = Tables
        .lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")).as("rev_q4"))
      val mx = rev.agg(max(col("rev_q4")).as("mx"))
      rev
        .join(broadcast(mx))
        .filter(col("rev_q4") === col("mx"))
        .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), (col("rev_q4") / 10000.0).as("total_rev"))
        .orderBy("s_suppkey")
    },

    // TPC-H Q22-shaped: above-average-balance customers with NO orders,
    // rolled up per nation — scalar-subquery threshold (1-row broadcast)
    // COMPOSED with an anti-join against the fact table. The balance
    // compare is cross-multiplied to exact integers (cents·n > Σcents) —
    // no division reaches the filter — and the anti-join is a plain
    // left_anti on o_custkey (shuffle or broadcast at AQE's discretion;
    // never a per-row NOT EXISTS probe).
    // NOTE: the driver fixtures barely exercise this shape (zero
    // order-less customers at sf0.001/sf0.01, one at sf0.1) — the
    // declared row proves plumbing, RelationalSpec's synthetic-frame test
    // proves the anti-join + threshold composition on data where a
    // meaningful population survives both gates.
    "q_rich_inactive" -> { (s, dir) =>
      Relational
        .richInactive(Tables.customer(s, dir), Tables.orders(s, dir))
        .orderBy("nation")
    },

    // TPC-H Q19-shaped: DISJUNCTIVE predicate join — revenue over an OR
    // of three (brand ∧ size-range ∧ quantity-range) conjunctions.
    // Catalyst cannot split a cross-table OR, so the per-side
    // implications are stated EXPLICITLY (brand∧size disjunction on
    // part, quantity-range union on lineitem) — the documented TPC-H
    // Q19 optimization: both scans are cut before the join, and the full
    // disjunction re-checks after it (PlanSpec pins the pushed filters).
    "q_disjunctive_revenue" -> { (s, dir) =>
      val part = Tables.part(s, dir)
        .filter((col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      // raw double compares (quantities are integral-valued): a cast
      // would block the range predicates from reaching the parquet scan
      val li = Tables.lineitem(s, dir)
        .filter(col("l_quantity").between(1, 11) || col("l_quantity").between(15, 25) ||
          col("l_quantity").between(30, 40))
        .select(col("l_partkey"), col("l_quantity").as("qty"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("rev_q4"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("qty").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("qty").between(15, 25)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("qty").between(30, 40)))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          (sum(col("rev_q4")).cast("double") / 10000.0).as("revenue"))
        .orderBy("p_brand")
    },

    // TPC-H Q9-shaped (no partsupp in this schema — supply cost stands in
    // as the part's retail price × quantity): per-(nation, year) profit
    // over a name-family of parts. Revenue and cost are floor-quantized
    // per row SEPARATELY, summed exactly as integers, subtracted, ONE
    // division at the end — the sum-of-differences ≡ difference-of-sums
    // on exact integers, so engines agree bit-for-bit. Dims broadcast;
    // the one corpus-sized join (lineitem ⋈ orders for the year) is left
    // to the planner.
    "q_profit_by_nation" -> { (s, dir) =>
      val pk = Tables.part(s, dir)
        .filter(col("p_name").contains("widget"))
        .select(col("p_partkey"), col("p_retailprice"))
      val li = Tables.lineitem(s, dir)
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("rev_q4"),
          floor(col("p_retailprice") * col("l_quantity") * 10000)
            .cast("long").as("cost_q4"))
      li.join(Tables.orders(s, dir).select(col("o_orderkey"),
          // long: DuckDB's year() is BIGINT, Spark's is INT — pin the wider
          year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(((sum(col("rev_q4")) - sum(col("cost_q4"))).cast("double") / 10000.0)
          .as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q4-shaped: EXISTS-with-predicate rolled up per order priority.
    // The fixture lineitem has no commit/receipt dates, so "late" is
    // l_shipdate > o_orderdate + 60 days — a CORRELATED inequality, which
    // makes the EXISTS a semi-join with an equi key (l_orderkey) plus a
    // non-equi residual, NOT a plain key semi-join. The date-range filter
    // on orders pushes to its scan; lineitem ships only (key, shipdate)
    // into the join. One order-keyed shuffle pair; no nested loops.
    "q_late_order_priority" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-07-01")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      o.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q7-shaped: two-nation shipping volume with the SYMMETRIC pair
    // predicate — (supp=A ∧ cust=B) ∨ (supp=B ∧ cust=A) — per shipping
    // year. The nation filter is applied INSIDE each dim before the fact
    // joins (supplier broadcasts; customer is corpus-class at TPC-H scale
    // so its join is left to the planner), and the symmetric disjunction
    // re-checks after both nations are attached — the same
    // explicit-implication pattern as q_disjunctive_revenue. Volume is
    // quantized per row, summed exactly, divided once.
    "q_nation_volume" -> { (s, dir) =>
      val nat = Tables.nation(s, dir)
        .filter(col("n_name").isin("NATION_3", "NATION_7"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("vol_q4"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg((sum(col("vol_q4")).cast("double") / 10000.0).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q11-shaped: group share vs a GLOBAL scalar HAVING — parts
    // whose one-nation stock value exceeds 1/1000 of that nation's total.
    // No partsupp in this schema: value = Σ floor(l_extendedprice·100)
    // over the nation's suppliers' lineitems (semi-join prune before the
    // per-part aggregate). The global total is the q_above_avg scalar
    // composed with q_top_supplier's 1-row broadcast; the HAVING is
    // cross-multiplied to exact integers (value·1000 > total) so no
    // division reaches the filter. Per-part agg and the scalar share the
    // SAME aggregate subtree — Catalyst re-derives it (no common-subplan
    // reuse), the accepted q_top_supplier trade.
    "q_important_parts" -> { (s, dir) =>
      val nat = Tables.nation(s, dir)
        .filter(col("n_name") === "NATION_5")
        .select(col("n_nationkey"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val pv = Tables.lineitem(s, dir)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("l_partkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("val_q2"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("val_q2")).as("value_q2"))
      val tot = pv.agg(sum(col("value_q2")).as("tot_q2"))
      pv.join(broadcast(tot))
        .filter(col("value_q2") * 1000 > col("tot_q2"))
        .select(col("l_partkey").as("p_partkey"),
          (col("value_q2").cast("double") / 100.0).as("value"))
        .orderBy(col("value").desc, col("p_partkey"))
    },

    // TPC-H Q5-shaped: local-supplier volume — revenue per nation of a
    // region, counted only when the CUSTOMER's nation equals the
    // SUPPLIER's nation (the join cycle that makes Q5 interesting: the
    // residual s_nationkey = c_nationkey closes the cycle on the last,
    // broadcast join instead of forcing a second corpus shuffle).
    // region→nation prunes both dims before any fact is touched; the two
    // corpus joins (lineitem⋈orders, ⋈customer) stay key-partitioned for
    // the planner; supplier broadcasts with the cycle predicate attached.
    "q_local_supplier_volume" -> { (s, dir) =>
      val nat = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("rev_q4"))
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg((sum(col("rev_q4")).cast("double") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("nation"))
    },

    // TPC-H Q8-shaped: two-level market share in ONE aggregation pass —
    // numerator (volume supplied by the focus nation) and denominator
    // (all volume) as sum(when)/sum over the same rows, never a
    // self-join or re-scan. The part filter broadcasts into the lineitem
    // scan FIRST (most selective), the region gate prunes customers via
    // the broadcast nation⋈region dim, and the focus-nation test rides
    // the supplier broadcast as a plain column. Exact integer sums; one
    // double division at the end.
    "q_market_share" -> { (s, dir) =>
      val regNat = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "AMERICA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(regNat), col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("c_custkey"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
            .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("vol_q4"))
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
            .select(col("o_orderkey"), col("o_custkey"),
              year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", col("vol_q4")).otherwise(0L))
          .cast("double") / sum(col("vol_q4")).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    },

    // TPC-H Q12-shaped: two-way conditional counts per ship class in ONE
    // aggregation — high-priority vs low-priority line counts as paired
    // sum(when)s, never two passes. The fixture has no l_shipmode or
    // receipt dates, so the class is l_returnflag ∈ {A,R} and "late" is
    // the Q4-style correlated residual l_shipdate > o_orderdate + 30d on
    // the order-keyed equi join. Both lineitem filters push to the scan;
    // orders ships only (key, date, priority).
    "q_shipmode_priority" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
        .join(Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("l_returnflag").as("ship_mode"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy("ship_mode")
    },

    // TPC-H Q16-shaped: distinct-supplier counts per part class with a
    // NOT IN exclusion — the anti-join decorrelation. The part-class
    // filter broadcasts its attributes into the lineitem scan (the fact
    // never shuffles for the dims); the excluded-supplier set (the
    // "complaints" stand-in: negative balance) is dimension-sized and
    // broadcasts as a left_anti build. NOT IN ≡ anti-join here because
    // s_suppkey is non-null by schema — the standard NOT-IN-null caveat
    // does not arise. count(DISTINCT) rides Spark's two-level distinct
    // aggregate on the grouped keys.
    "q_part_supplier_counts" -> { (s, dir) =>
      val pk = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#4" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val badSup = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
        .join(broadcast(badSup), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // TPC-H Q2-shaped: minimum-cost supplier per part, region-restricted —
    // the classic correlated-min scalar subquery, hand-decorrelated the
    // q_excess_shipper way: ONE REPARTITION_BY_COL on l_partkey carries the
    // per-(part, supplier) min-cost aggregate (subset-key grouping keeps
    // the partitioning) AND the per-part min window; the winner filter is
    // an exact integer-cents compare. Region prunes suppliers INSIDE the
    // cost relation (as Q2's subquery does), via a broadcast semi; part
    // gate broadcasts; the supplier/nation attach is a dimension broadcast
    // join AFTER the frame has shrunk to winners. Completes the full
    // 22-query TPC-H shape coverage (Q1-Q22).
    "q_min_cost_supplier" -> { (s, dir) =>
      val pk = Tables.part(s, dir)
        .filter(col("p_size").isin(5, 10, 15) && col("p_type") === "LARGE")
        .select(col("p_partkey"))
      val regSup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val w = Window.partitionBy(col("l_partkey"))
      Tables.lineitem(s, dir)
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(regSup.select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        // integer cents: floor before cast (the q_excess_shipper truncation
        // parity move) — the min and the winner equality are exact
        .select(col("l_partkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("cost_c"))
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("cost_c")).as("cost_c"))
        .withColumn("min_c", min(col("cost_c")).over(w))
        .filter(col("cost_c") === col("min_c"))
        .join(broadcast(regSup), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("p_partkey"), col("s_name"), col("n_name"),
          round(col("s_acctbal"), 2).as("s_acctbal"), col("cost_c"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_join_enrich" -> ("SELECT c_mktsegment AS segment, count(*) AS cnt, " +
      "round(sum(value), 2) AS sum_value FROM events " +
      "JOIN customer ON user_id = c_custkey GROUP BY 1 ORDER BY 1"),

    "q_ship_priority" -> ("SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate, " +
      "o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < '1997-06-01' " +
      "AND l_shipdate > '1997-06-01' " +
      "GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"),

    "q_priority_with_returns" -> ("SELECT o_orderpriority, count(*) AS cnt FROM orders " +
      "WHERE EXISTS (SELECT 1 FROM lineitem " +
      "WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') " +
      "GROUP BY 1 ORDER BY 1"),

    "q_pivot_types" -> ("SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day, " +
      Seq("click", "error", "purchase", "signup", "view").map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
        .mkString(", ") +
      " FROM events GROUP BY 1 ORDER BY 1"),

    "q_cube_labels" -> ("SELECT coalesce(event_type, '<all>') AS event_type, " +
      "coalesce(CAST(json_extract_string(props, '$.k') IS NOT NULL AS VARCHAR), '<all>') AS has_k, " +
      "count(*) AS cnt FROM events " +
      "GROUP BY CUBE (event_type, json_extract_string(props, '$.k') IS NOT NULL) " +
      "ORDER BY 1, 2"),

    "q_rollup_revenue" -> ("SELECT coalesce(r_name, '<all>') AS region, " +
      "coalesce(n_name, '<all>') AS nation, " +
      "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "GROUP BY ROLLUP (r_name, n_name) ORDER BY 1, 2"),

    "q_pricing_summary" -> ("SELECT l_returnflag, l_linestatus, " +
      "round(sum(l_quantity), 2) AS sum_qty, " +
      "round(sum(l_extendedprice), 2) AS sum_base_price, " +
      "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
      "round(avg(l_quantity), 6) AS avg_qty, " +
      "count(*) AS count_order FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_revenue_by_nation" -> ("SELECT n_name AS nation, " +
      "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' GROUP BY 1 ORDER BY 1"),

    "q_users_click_not_error" -> ("SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day " +
      "FROM events WHERE event_type = 'click' " +
      "EXCEPT SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day " +
      "FROM events WHERE event_type = 'error' ORDER BY user_id, day"),

    "q_orders_by_month" -> ("SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month, " +
      "count(*) AS cnt, round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1 ORDER BY 1"),

    "q_promo_revenue" -> ("SELECT " +
      "round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2) AS promo_rev, " +
      "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'"),

    "q_supplier_balance" -> ("SELECT r_name AS region, n_name AS nation, " +
      "count(*) AS suppliers, round(sum(s_acctbal), 2) AS total_bal " +
      "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2 ORDER BY 1, 2"),

    "q_users_click_and_error" -> ("SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day " +
      "FROM events WHERE event_type = 'click' INTERSECT " +
      "SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day " +
      "FROM events WHERE event_type = 'error' ORDER BY user_id, day"),

    "q_ntile" -> ("SELECT event_type, event_id, ntile(4) OVER (" +
      "PARTITION BY event_type ORDER BY value, event_id) AS quartile " +
      "FROM events ORDER BY 1, 2"),

    // BIGINT casts: DuckDB sum()→HUGEINT→pandas float64 hash artifact —
    // without them the unpivoted cnt hashes as 5.0 vs Spark's 5
    "q_unpivot" -> ("WITH p AS (SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day, " +
      Seq("click", "error", "purchase", "signup", "view").map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t").mkString(", ") +
      " FROM events GROUP BY 1) " +
      "SELECT day, event_type, cnt FROM p " +
      "UNPIVOT (cnt FOR event_type IN (click, error, purchase, signup, view)) " +
      "ORDER BY day, event_type"),

    "q_error_click_days" -> ("WITH e AS (SELECT user_id, " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS err_cnt " +
      "FROM events WHERE event_type = 'error' GROUP BY 1, 2), " +
      "c AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
      "count(*) AS click_cnt FROM events WHERE event_type = 'click' GROUP BY 1, 2) " +
      "SELECT coalesce(e.user_id, c.user_id) AS user_id, " +
      "strftime(coalesce(e.day, c.day), '%Y-%m-%d') AS day, " +
      "coalesce(e.err_cnt, 0) AS err_cnt, coalesce(c.click_cnt, 0) AS click_cnt, " +
      "CASE WHEN e.user_id IS NULL THEN 'click_only' " +
      "WHEN c.user_id IS NULL THEN 'error_only' ELSE 'both' END AS category " +
      "FROM e FULL OUTER JOIN c ON e.user_id = c.user_id AND e.day = c.day " +
      "ORDER BY user_id, day"),

    "q_cust_order_dist" -> ("SELECT n_orders, count(*) AS n_customers FROM (" +
      "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer " +
      "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1) " +
      "GROUP BY 1 ORDER BY n_customers DESC, n_orders DESC"),

    "q_above_avg" -> ("WITH q AS (SELECT event_type, " +
      "CAST(floor(value * 1000) AS BIGINT) AS v_q3 FROM events), " +
      "g AS (SELECT CAST(CAST(sum(v_q3) AS BIGINT) AS DOUBLE) / count(*) AS avg_q3 FROM q) " +
      "SELECT event_type, count(*) AS n_above FROM q, g " +
      "WHERE v_q3 > avg_q3 GROUP BY 1 ORDER BY 1"),

    "q_grouping_sets" -> ("SELECT coalesce(event_type, '<all>') AS event_type, " +
      "coalesce(day, '<all>') AS day, count(*) AS cnt, " +
      "CAST(sum(v_q3) AS BIGINT) AS sum_v_q3 FROM (" +
      "SELECT event_type, strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day, " +
      "CAST(floor(value * 1000) AS BIGINT) AS v_q3 FROM events) " +
      "GROUP BY GROUPING SETS ((event_type), (day), ()) ORDER BY 1, 2"),

    "q_big_orders" -> ("SELECT c_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice, " +
      "CAST(sum_qty AS BIGINT) AS sum_qty FROM orders " +
      "JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem " +
      "GROUP BY 1 HAVING sum(l_quantity) > 300.0) ON o_orderkey = l_orderkey " +
      "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),

    "q_returned_revenue" -> ("SELECT c_custkey, c_name, n_name AS nation, " +
      "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) / 10000.0 AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE l_returnflag = 'R' AND o_orderdate >= '1996-01-01' " +
      "AND o_orderdate < '1996-04-01' " +
      "GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey ASC LIMIT 20"),

    // the correlated subquery stays CORRELATED here — DuckDB decorrelates
    // it itself, which is exactly the cross-check we want against the
    // engine's hand-decorrelated aggregate-join
    "q_small_quantity_revenue" -> ("SELECT p_brand, " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) " +
      "/ 700.0 AS avg_yearly " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE CAST(l_quantity AS BIGINT) * 5 * " +
      "(SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey) < " +
      "(SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) FROM lineitem l2 " +
      "WHERE l2.l_partkey = lineitem.l_partkey) " +
      "GROUP BY 1 ORDER BY 1"),

    // the DOUBLE correlation stays correlated here (EXISTS + NOT EXISTS,
    // Q21's shape) — DuckDB decorrelates it itself, cross-checking the
    // engine's single-window-pass decorrelation
    "q_sole_late_shipper" -> ("WITH w AS (SELECT DISTINCT l_orderkey, l_suppkey " +
      "FROM lineitem l1 " +
      "WHERE l_shipdate = (SELECT max(l_shipdate) FROM lineitem l2 " +
      "WHERE l2.l_orderkey = l1.l_orderkey) " +
      "AND EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey " +
      "AND l3.l_suppkey <> l1.l_suppkey) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l4 WHERE l4.l_orderkey = l1.l_orderkey " +
      "AND l4.l_suppkey <> l1.l_suppkey AND l4.l_shipdate >= l1.l_shipdate)) " +
      "SELECT s_name, count(*) AS numwait FROM w " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "GROUP BY 1 ORDER BY numwait DESC, s_name ASC LIMIT 20"),

    // the Q20 oracle keeps the REFERENCE formulation — nested IN + a
    // CORRELATED aggregate threshold — so the hash compare proves the
    // hand-decorrelation, not just the arithmetic
    // the textbook correlated-min form Q2 is written in — the engine's
    // window decorrelation must reproduce it exactly
    "q_min_cost_supplier" -> ("WITH rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name " +
      "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'), " +
      "cost AS (SELECT l_partkey, l_suppkey, " +
      "min(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS cost_c FROM lineitem " +
      "WHERE l_partkey IN (SELECT p_partkey FROM part " +
      "WHERE p_size IN (5, 10, 15) AND p_type = 'LARGE') " +
      "AND l_suppkey IN (SELECT s_suppkey FROM rs) GROUP BY 1, 2) " +
      "SELECT l_partkey AS p_partkey, s_name, n_name, " +
      "round(s_acctbal, 2) AS s_acctbal, cost_c " +
      "FROM cost c JOIN rs ON l_suppkey = s_suppkey " +
      "WHERE cost_c = (SELECT min(cost_c) FROM cost c2 " +
      "WHERE c2.l_partkey = c.l_partkey) " +
      "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"),

    "q_excess_shipper" -> ("WITH sp AS (SELECT l_partkey, l_suppkey, " +
      "CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sp_qty FROM lineitem " +
      "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%') " +
      "GROUP BY 1, 2) " +
      "SELECT s_name, count(*) AS n_parts, CAST(sum(sp_qty) AS BIGINT) AS qty_sum " +
      "FROM sp JOIN supplier ON l_suppkey = s_suppkey " +
      "WHERE sp_qty * (SELECT count(*) FROM sp sp3 " +
      "WHERE sp3.l_partkey = sp.l_partkey) > (SELECT sum(sp2.sp_qty) FROM sp sp2 " +
      "WHERE sp2.l_partkey = sp.l_partkey) " +
      "GROUP BY 1 ORDER BY 1"),

    // Q15's max-over-view kept as a scalar subquery over the view CTE
    "q_top_supplier" -> ("WITH rev AS (SELECT l_suppkey, " +
      "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) AS rev_q4 FROM lineitem " +
      "WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01' GROUP BY 1) " +
      "SELECT s_suppkey, s_name, rev_q4 / 10000.0 AS total_rev FROM rev " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "WHERE rev_q4 = (SELECT max(rev_q4) FROM rev) ORDER BY s_suppkey"),

    // scalar subquery + NOT EXISTS kept in their correlated/subquery form
    "q_rich_inactive" -> ("WITH c AS (SELECT c_custkey, c_nationkey, " +
      "CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer), " +
      "p AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s_cents " +
      "FROM c WHERE cents > 0) " +
      "SELECT c_nationkey AS nation, count(*) AS n_cust, " +
      "CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0 AS total_bal " +
      "FROM c, p WHERE cents * n > s_cents " +
      "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey) " +
      "GROUP BY 1 ORDER BY 1"),

    // the disjunction stays in its natural single-WHERE form — DuckDB's
    // own planner derives the per-side implications, cross-checking the
    // engine's explicit redundant-conjunct formulation
    "q_disjunctive_revenue" -> ("SELECT p_brand, count(*) AS n_items, " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) AS DOUBLE) / 10000.0 AS revenue " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 " +
      "AND l_quantity BETWEEN 1 AND 11) " +
      "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 " +
      "AND l_quantity BETWEEN 15 AND 25) " +
      "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 " +
      "AND l_quantity BETWEEN 30 AND 40) " +
      "GROUP BY 1 ORDER BY 1"),

    "q_profit_by_nation" -> ("SELECT n_name AS nation, year(o_orderdate) AS o_year, " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) - " +
      "CAST(sum(CAST(floor(p_retailprice * l_quantity * 10000) AS BIGINT)) AS BIGINT) " +
      "AS DOUBLE) / 10000.0 AS profit " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE p_name LIKE '%widget%' " +
      "GROUP BY 1, 2 ORDER BY nation, o_year DESC"),

    // Q4's EXISTS stays in its natural correlated form — DuckDB's own
    // decorrelation cross-checks the engine's explicit semi-join
    "q_late_order_priority" -> ("SELECT o_orderpriority, count(*) AS order_count " +
      "FROM orders WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01' " +
      "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
      "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
      "GROUP BY 1 ORDER BY 1"),

    "q_nation_volume" -> ("SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
      "year(l_shipdate) AS l_year, " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) AS DOUBLE) / 10000.0 AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
      "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
      "WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') " +
      "OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) " +
      "AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01' " +
      "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),

    // Q11's HAVING stays a scalar subquery over the same CTE
    "q_important_parts" -> ("WITH pv AS (SELECT l_partkey, " +
      "CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_q2 " +
      "FROM lineitem WHERE l_suppkey IN " +
      "(SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE n_name = 'NATION_5') " +
      "GROUP BY 1) " +
      "SELECT l_partkey AS p_partkey, CAST(value_q2 AS DOUBLE) / 100.0 AS value " +
      "FROM pv WHERE value_q2 * 1000 > (SELECT CAST(sum(value_q2) AS BIGINT) FROM pv) " +
      "ORDER BY value DESC, p_partkey"),

    "q_local_supplier_volume" -> ("SELECT n_name AS nation, " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) AS DOUBLE) / 10000.0 AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' " +
      "AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01' " +
      "GROUP BY 1 ORDER BY revenue DESC, nation"),

    "q_market_share" -> ("SELECT year(o_orderdate) AS o_year, " +
      "CAST(sum(CASE WHEN n2.n_name = 'NATION_3' " +
      "THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) " +
      "ELSE 0 END) AS DOUBLE) / " +
      "CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) " +
      "AS BIGINT) AS DOUBLE) AS mkt_share " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN region ON n1.n_regionkey = r_regionkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "WHERE r_name = 'AMERICA' AND p_type = 'PROMO' " +
      "AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01' " +
      "GROUP BY 1 ORDER BY 1"),

    "q_shipmode_priority" -> ("SELECT l_returnflag AS ship_mode, " +
      "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
      "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
      "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "WHERE l_returnflag IN ('A', 'R') " +
      "AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01' " +
      "AND l_shipdate > o_orderdate + INTERVAL 30 DAY " +
      "GROUP BY 1 ORDER BY 1"),

    // Q16's NOT IN stays in its natural form — DuckDB's own decorrelation
    // cross-checks the engine's explicit anti-join
    "q_part_supplier_counts" -> ("SELECT p_brand, p_type, p_size, " +
      "count(DISTINCT l_suppkey) AS supplier_cnt " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO' " +
      "AND p_size IN (1, 4, 9, 16, 25, 36, 49) " +
      "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
      "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size")
  )
}
