package graft

import org.apache.spark.sql.functions._

/** Independent driver-side recomputes (sf0.001) for the round-11 declared
  * queries: every result is re-derived with plain Scala collections from the
  * raw fixture rows, so an engine-side plan bug can't cancel against an
  * oracle-side twin of itself.
  */
class Round11Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def events: Array[(Long, Long, String, Double, Long)] =
    Tables
      .events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))

  test("q_conversion_lag: integer-weighted percentiles match a Scala recompute") {
    val got = SparkEntry.queries("q_conversion_lag")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val seg = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val ev = events
    val su = ev.filter(_._3 == "signup").groupBy(_._2).map { case (u, rs) => u -> rs.map(_._5).min }
    val lags = ev
      .filter(_._3 == "purchase")
      .groupBy(_._2)
      .toSeq // leave Map semantics before keying by segment
      .flatMap { case (u, rs) =>
        su.get(u).flatMap { s =>
          val after = rs.map(_._5).filter(_ >= s)
          if (after.isEmpty) None else Some(seg(u) -> (after.min - s))
        }
      }
      .groupBy(_._1)
    def pctX100(sorted: IndexedSeq[Long], p: Int): Long = {
      val pos = (sorted.length - 1).toLong * p
      val idx = (pos / 100).toInt
      val rem = pos % 100
      if (rem == 0) sorted(idx) * 100
      else sorted(idx) * (100 - rem) + sorted(idx + 1) * rem
    }
    assert(got.keySet == lags.keySet)
    lags.foreach { case (sg, rs) =>
      val sorted = rs.map(_._2).sorted.toIndexedSeq
      val exp = (sorted.length.toLong,
        pctX100(sorted, 50).toDouble / 100, pctX100(sorted, 90).toDouble / 100)
      assert(got(sg) == exp, s"segment=$sg")
    }
  }

  test("q_fd_violations: the PK and join-derived FDs hold, the behavioral one breaks") {
    val rows = SparkEntry.queries("q_fd_violations")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ev = events
    val byUser = ev.groupBy(_._2)
    assert(rows("event_id->user_id") ==
      ((ev.length.toLong, 0L, 1L))) // event_id is a key
    val nd = byUser.map { case (_, rs) => rs.map(_._3).distinct.length }
    assert(rows("user_id->event_type") ==
      ((byUser.size.toLong, nd.count(_ > 1).toLong, nd.max.toLong)))
    val (g, v, m) = rows("user_id->c_mktsegment")
    assert(v == 0L && m == 1L && g <= byUser.size) // dim lookup is functional
  }

  test("q_scd2_lookup: state-at-error-time matches a per-user Scala replay") {
    val got = SparkEntry.queries("q_scd2_lookup")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val ev = events
    // per user: non-error change rows (lag-collapse over (us, event_id)),
    // deduped per ts by max event_id — then each error resolves the last
    // change at-or-before its ts
    val states = ev.groupBy(_._2).map { case (u, rs) =>
      val ordered = rs.filter(_._3 != "error").sortBy(r => (r._5, r._1))
      val chg = ordered.zipWithIndex.filter { case (r, i) =>
        i == 0 || ordered(i - 1)._3 != r._3
      }.map(_._1)
      val dedup = chg.groupBy(_._5).map { case (us, cs) => us -> cs.maxBy(_._1)._3 }
      u -> dedup.toSeq.sortBy(_._1)
    }
    val exp = ev
      .filter(_._3 == "error")
      .map { e =>
        states.get(e._2) match {
          case Some(hist) =>
            hist.filter(_._1 <= e._5).lastOption.map(_._2).getOrElse("none")
          case None => "none"
        }
      }
      .groupBy(identity)
      .map { case (s, xs) => s -> xs.length.toLong }
    assert(got == exp)
    assert(got.values.sum == ev.count(_._3 == "error").toLong)
  }

  test("q_debounce: kept counts match a per-(user,type) Scala replay") {
    val got = SparkEntry.queries("q_debounce")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val exp = events
      .groupBy(r => (r._2, r._3))
      .toSeq
      .flatMap { case ((_, t), rs) =>
        val us = rs.sortBy(r => (r._5, r._1)).map(_._5)
        us.zipWithIndex.map { case (u, i) => t -> (i == 0 || u - us(i - 1) > 5000000L) }
      }
      .groupBy(_._1)
      .map { case (t, xs) =>
        val n = xs.length.toLong
        val kept = xs.count(_._2).toLong
        t -> ((n, kept, (n - kept) * 1000000L / n))
      }
    assert(got == exp)
  }

  test("q_ab_contingency: cells + chi-square match a Scala recompute") {
    val r = SparkEntry.queries("q_ab_contingency")(spark, dir).collect().head
    val per = events.groupBy(_._2).toSeq.map { case (u, rs) =>
      (u % 2, rs.exists(e => e._3 == "purchase" && e._4 > 180))
    }
    val a = per.count(p => p._1 == 0 && p._2).toLong
    val b = per.count(p => p._1 == 0 && !p._2).toLong
    val c = per.count(p => p._1 == 1 && p._2).toLong
    val d = per.count(p => p._1 == 1 && !p._2).toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((a, b, c, d)))
    assert(Seq(a, b, c, d).forall(_ > 0), "degenerate 2x2 at sf0.001")
    val diff = (a * d - b * c).toDouble
    val chi2 = diff * diff * (a + b + c + d).toDouble /
      ((a + b).toDouble * (c + d).toDouble * (a + c).toDouble * (b + d).toDouble)
    assert(r.getDouble(4) == chi2)
  }

  test("q_l_diversity: per-QI distinct sensitive values match a Scala recompute") {
    val got = SparkEntry.queries("q_l_diversity")(spark, dir)
      .collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Number](1).longValue(), r.getString(2))))
      .toMap
    val exp = events
      .flatMap(e => cust.get(e._2).map(q => q -> e))
      .groupBy(_._1)
      .map { case (q, xs) =>
        val es = xs.map(_._2)
        val l = es.map(_._3).distinct.length.toLong
        q -> ((es.length.toLong, es.map(_._2).distinct.length.toLong, l, l >= 3))
      }
    assert(got == exp)
  }

  test("q_ndcg_eval: nDCG bounds + n_rel/weights consistency") {
    val rows = SparkEntry.queries("q_ndcg_eval")(spark, dir).collect()
    assert(rows.length == 10)
    val idcg = Seq(0L, 1000000L, 1630929L, 2130929L, 2561605L, 2948457L,
      3304664L, 3637997L, 3953461L, 4254490L, 4543554L)
    rows.foreach { r =>
      val (nRel, dcg, id, ndcg) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nRel >= 0 && nRel <= 10)
      assert(id == idcg(nRel.toInt), s"idcg lookup for n_rel=$nRel")
      assert(dcg <= id, "DCG cannot exceed the ideal ordering")
      if (id > 0) assert(ndcg == dcg.toDouble / id.toDouble && ndcg >= 0.0 && ndcg <= 1.0)
      else assert(ndcg == 0.0 && dcg == 0L)
    }
    // at least one query must see a relevant neighbor or the metric is vacuous
    assert(rows.map(_.getLong(1)).sum > 0)
  }

  test("q_weighted_median: threshold row matches a Scala cumulative-weight replay") {
    val got = SparkEntry.queries("q_weighted_median")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), floor(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long"), col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val exp = li.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._4, r._5))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val wm = sorted.find { r => cum += r._3; cum * 2 >= tot }.get._2
      flag -> ((tot, wm))
    }
    assert(got == exp)
  }

  test("q_path_trigrams: counts match a Scala sequence replay") {
    val got = SparkEntry.queries("q_path_trigrams")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    val exp = events
      .groupBy(_._2)
      .toSeq
      .flatMap { case (_, rs) =>
        val seq = rs.sortBy(r => (r._5, r._1)).map(_._3)
        seq.sliding(3).filter(_.length == 3).map(t => (t(0), t(1), t(2)))
      }
      .groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    assert(got == exp)
  }

  test("q_k_generalize: ladder stats match per-level Scala group sizes") {
    val rows = SparkEntry.queries("q_k_generalize")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val cust = Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue(), r.getLong(2)))
    def stats(key: ((String, Long, Long)) => Any): (Long, Long, Long) = {
      val gs = cust.groupBy(key).map(_._2.length.toLong).toSeq
      (gs.length.toLong, gs.min, gs.count(_ < 3).toLong)
    }
    val lv = Seq[((String, Long, Long)) => Any](
      c => (c._1, c._2, c._3), c => (c._1, c._2), c => c._1, _ => ()).map(stats)
    val chosenLevel = lv.indexWhere(_._2 >= 3).toLong
    lv.zipWithIndex.foreach { case ((g, mn, risk), i) =>
      assert(rows(i.toLong) == ((g, mn, risk, i.toLong == chosenLevel)), s"level=$i")
    }
  }

  test("q_dedup_impact: shares recompose from the verified q_dedup_exact keepers") {
    val got = SparkEntry.queries("q_dedup_impact")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val keepers = SparkEntry.queries("q_dedup_exact")(spark, dir)
      .collect().map(_.getLong(1)).toSet
    val srcOf = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val before = srcOf.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    val after = srcOf.filter(d => keepers(d._1)).groupBy(_._2)
      .map { case (s, xs) => s -> xs.length.toLong }
    val (tb, ta) = (before.values.sum, after.values.sum)
    assert(ta == keepers.size.toLong)
    assert(got.keySet == before.keySet)
    before.foreach { case (s, nb) =>
      val na = after.getOrElse(s, 0L)
      val (sb, sa) = (nb * 1000000L / tb, na * 1000000L / ta)
      assert(got(s) == ((nb, na, sb, sa, sa - sb)), s"source=$s")
    }
  }

  test("q_ship_lag_percentiles: exactPercentilesX100 matches a Scala order-statistic replay") {
    val got = SparkEntry.queries("q_ship_lag_percentiles")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_micros(col("o_orderdate").cast("timestamp")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    val lags = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), unix_micros(col("l_shipdate").cast("timestamp")))
      .collect()
      .map(r => {
        val (prio, ous) = orders(r.getLong(0))
        prio -> (r.getLong(1) - ous) / 86400000000L
      })
      .groupBy(_._1)
    def pctX100(sorted: IndexedSeq[Long], p: Int): Long = {
      val pos = (sorted.length - 1).toLong * p
      val idx = (pos / 100).toInt
      val rem = pos % 100
      if (rem == 0) sorted(idx) * 100
      else sorted(idx) * (100 - rem) + sorted(idx + 1) * rem
    }
    assert(got.keySet == lags.keySet)
    lags.foreach { case (prio, rs) =>
      val sorted = rs.map(_._2).sorted.toIndexedSeq
      val exp = (sorted.length.toLong, pctX100(sorted, 50).toDouble / 100,
        pctX100(sorted, 90).toDouble / 100, pctX100(sorted, 99).toDouble / 100)
      assert(got(prio) == exp, s"priority=$prio")
    }
  }

  test("q_control_chart: limits match a Scala recompute; flags consistent") {
    val rows = SparkEntry.queries("q_control_chart")(spark, dir).collect()
    val daily = events
      .groupBy(_._5 / 86400000000L)
      .map { case (d, rs) => d -> ((rs.length.toLong, rs.count(_._3 == "error").toLong)) }
    val nt = daily.values.map(_._1).sum
    val et = daily.values.map(_._2).sum
    val pbar = et.toDouble / nt.toDouble
    assert(rows.length == daily.size)
    rows.foreach { r =>
      val (d, nD, errD) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(daily(d) == ((nD, errD)))
      val ucl = pbar + 3.0 * math.sqrt(pbar * (1.0 - pbar) / nD.toDouble)
      val rate = errD.toDouble / nD.toDouble
      assert(r.getDouble(3) == pbar && r.getDouble(4) == ucl && r.getDouble(5) == rate)
      assert(r.getBoolean(6) == (rate > ucl))
    }
  }

  test("q_dwell_time: interval counts + percentiles match a Scala state replay") {
    val got = SparkEntry.queries("q_dwell_time")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val dwells = events
      .groupBy(_._2)
      .toSeq
      .flatMap { case (_, rs) =>
        val ordered = rs.sortBy(r => (r._5, r._1))
        val chg = ordered.zipWithIndex
          .filter { case (r, i) => i == 0 || ordered(i - 1)._3 != r._3 }
          .map(_._1)
        chg.zipWithIndex.flatMap { case (r, i) =>
          if (i + 1 < chg.length) Some(r._3 -> (chg(i + 1)._5 - r._5)) else None
        }
      }
      .groupBy(_._1)
    def pctX100(sorted: IndexedSeq[Long], p: Int): Long = {
      val pos = (sorted.length - 1).toLong * p
      val idx = (pos / 100).toInt
      val rem = pos % 100
      if (rem == 0) sorted(idx) * 100
      else sorted(idx) * (100 - rem) + sorted(idx + 1) * rem
    }
    assert(got.keySet == dwells.keySet)
    dwells.foreach { case (st, rs) =>
      val sorted = rs.map(_._2).sorted.toIndexedSeq
      val exp = (sorted.length.toLong, pctX100(sorted, 50).toDouble / 100,
        pctX100(sorted, 90).toDouble / 100)
      assert(got(st) == exp, s"state=$st")
    }
  }

  test("q_cross_correlation: moments match a Scala day-spine replay; lag 0 symmetric") {
    val got = SparkEntry.queries("q_cross_correlation")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    val daily = events
      .filter(e => e._3 == "click" || e._3 == "error")
      .groupBy(_._5 / 86400000000L)
      .map { case (d, rs) =>
        d -> ((rs.count(_._3 == "click").toLong, rs.count(_._3 == "error").toLong))
      }
    (-3L to 3L).foreach { lag =>
      val pairs = daily.toSeq.flatMap { case (d, (c, _)) =>
        daily.get(d + lag).map { case (_, e) => (c, e) }
      }
      val n = pairs.length.toLong
      val sc = pairs.map(_._1).sum
      val se = pairs.map(_._2).sum
      val sce = pairs.map(p => p._1 * p._2).sum
      val scc = pairs.map(p => p._1 * p._1).sum
      val see = pairs.map(p => p._2 * p._2).sum
      val (vc, ve) = (n * scc - sc * sc, n * see - se * se)
      val r = if (vc > 0 && ve > 0)
        Some((n * sce - sc * se).toDouble / (math.sqrt(vc.toDouble) * math.sqrt(ve.toDouble)))
      else None
      assert(got(lag) == ((n, r)), s"lag=$lag")
      r.foreach(x => assert(x >= -1.0 && x <= 1.0))
    }
  }

  test("q_apdex: score matches a Scala recompute; bounded by construction") {
    val got = SparkEntry.queries("q_apdex")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val exp = events.groupBy(_._3).map { case (t, rs) =>
      val total = rs.length.toLong
      val sat = rs.count(_._4 <= 50).toLong
      val tol = rs.count(e => e._4 > 50 && e._4 <= 200).toLong
      t -> ((total, sat, tol, (sat * 1000000L + tol * 500000L) / total))
    }
    assert(got == exp)
    got.values.foreach { case (_, _, _, q6) => assert(q6 >= 0L && q6 <= 1000000L) }
  }

  test("q_power_analysis: sample size matches the closed form over the exact cells") {
    val r = SparkEntry.queries("q_power_analysis")(spark, dir).collect().head
    val per = events.groupBy(_._2).toSeq.map { case (u, rs) =>
      (u % 2, rs.exists(e => e._3 == "purchase" && e._4 > 180))
    }
    val a = per.count(p => p._1 == 0 && p._2).toLong
    val b = per.count(p => p._1 == 0 && !p._2).toLong
    val c = per.count(p => p._1 == 1 && p._2).toLong
    val d = per.count(p => p._1 == 1 && !p._2).toLong
    val z2 = { val s0 = 1.959963984540054 + 0.8416212335729143; s0 * s0 }
    val p1 = a.toDouble / (a + b).toDouble
    val p2 = c.toDouble / (c + d).toDouble
    val needed = math.ceil(z2 * (p1 * (1.0 - p1) + p2 * (1.0 - p2)) /
      ((p1 - p2) * (p1 - p2))).toLong
    assert((r.getLong(0), r.getLong(1)) == ((a + b, c + d)))
    assert(r.getDouble(2) == p1 && r.getDouble(3) == p2)
    assert(r.getLong(4) == needed)
    assert(r.getBoolean(5) == (a + b >= needed && c + d >= needed))
  }

  test("q_hapax_ratio: richness stats match a Scala recompute") {
    val got = SparkEntry.queries("q_hapax_ratio")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val exp = Tables.documents(spark, dir)
      .select(col("source"), col("text"))
      .collect()
      .flatMap(r => r.getString(1).split("\\s+").filter(_.nonEmpty).map(r.getString(0) -> _))
      .groupBy(_._1)
      .map { case (src, toks) =>
        val counts = toks.groupBy(_._2).map(_._2.length.toLong)
        val (nTok, nTyp, nHap) = (counts.sum, counts.size.toLong, counts.count(_ == 1L).toLong)
        src -> ((nTok, nTyp, nHap, nTyp * 1000000L / nTok, nHap * 1000000L / nTyp))
      }
    assert(got == exp)
  }

  test("q_gini_split: impurities match a Scala recompute with the same truncations") {
    val got = SparkEntry.queries("q_gini_split")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), hour(col("ts")).cast("long"),
        expr("(unix_micros(ts) DIV 86400000000) % 7"),
        expr("CAST(least(floor(value / 50), 9) AS BIGINT)"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT) DIV 10"))
      .collect()
      .map(r => (r.getString(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    def twoLimb(a: Long, b: Long): Long = (a * 1000 / b) * 1000 + ((a * 1000) % b) * 1000 / b
    val classes = rows.groupBy(_._1).map(_._2.length.toLong)
    val pn = classes.sum
    val pq6x = twoLimb(pn * pn - classes.map(c => c * c).sum, pn)
    val names = Seq("hour", "dow", "value_band", "k_band")
    names.zipWithIndex.foreach { case (f, i) =>
      val byBucket = rows.groupBy(_._2(i))
      val wsum = byBucket.values.map { rs =>
        val nb = rs.size.toLong
        val ssq = rs.groupBy(_._1).values.map(g => g.size.toLong * g.size).sum
        twoLimb(nb * nb - ssq, nb)
      }.sum
      val exp = (pn, pq6x / pn, wsum / pn, pq6x / pn - wsum / pn)
      assert(got(f) == exp, s"feature=$f")
      assert(got(f)._4 >= -1L, s"$f: Gini gain is non-negative up to truncation")
    }
  }

  test("q_vocab_growth: deciles match a Scala first-seen replay; cumsum closes on the vocab") {
    val rows = SparkEntry.queries("q_vocab_growth")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val nDocs = docs.map(_._1).max + 1
    val firstSeen = docs
      .flatMap { case (id, t) => t.split("\\s+").filter(_.nonEmpty).map(_ -> id) }
      .groupBy(_._1)
      .map { case (_, xs) => xs.map(_._2).min }
    val exp = firstSeen
      .groupBy(d => math.min(d * 10 / nDocs, 9L))
      .map { case (dec, xs) => dec -> xs.size.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap == exp)
    assert(rows.map(_._2).sum == firstSeen.size.toLong)
    assert(rows.last._3 == firstSeen.size.toLong, "cumsum closes on total vocabulary")
    assert(rows.map(_._3).toSeq == rows.map(_._2).scanLeft(0L)(_ + _).tail.toSeq)
  }

  test("q_graph_assortativity: moments match a Scala recompute over the mutual edges") {
    val r = SparkEntry.queries("q_graph_assortativity")(spark, dir).collect().head
    graft.functions.GraftFunctions.register(spark)
    // reference edge set = the SAME sized-LSH mutual-8 frame the declared
    // query consumes (the memo returns the identical materialized frame)
    val edges = graft.ext.GraphQueries
      .mutualK(spark, dir, 8)
      .collect()
      .map(e => (e.getLong(0), e.getLong(1)))
    val directed = edges.flatMap(e => Seq(e, e.swap))
    val deg = directed.groupBy(_._1).map { case (v, xs) => v -> xs.length.toLong }
    val m = directed.length.toLong
    val sx = directed.map(e => deg(e._1)).sum
    val sxy = directed.map(e => deg(e._1) * deg(e._2)).sum
    val sxx = directed.map(e => deg(e._1) * deg(e._1)).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((m, sx, sxy, sxx)))
    val expR = (m * sxy - sx * sx).toDouble / (m * sxx - sx * sx).toDouble
    assert(r.getDouble(4) == expR)
    assert(r.getDouble(4) >= -1.0 && r.getDouble(4) <= 1.0)
  }
}
