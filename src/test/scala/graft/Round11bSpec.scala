package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Graph, Relational, Similarity}

/** Operator-level laws for the round-11 second batch (BFS distances,
  * snapshot diff, quota allocation, embedding decontamination) on
  * hand-built frames with independently known answers, plus sf0.001
  * recomputes of the declared queries where the fixture answer is cheap
  * to re-derive in plain Scala.
  */
class Round11bSpec extends SparkSpec {

  import spark.implicits._

  // ---- Graph.bfsDistances -------------------------------------------------

  private def edges(pairs: (Long, Long)*) =
    pairs.toSeq.toDF("lo", "hi")

  private def seeds(ids: Long*) = ids.toSeq.toDF("id")

  test("bfsDistances: chain + separate component + isolated seed") {
    // components: 1-2-3-4 (chain), 5-6; vertex 7 is an isolated seed
    val got = Graph
      .bfsDistances(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 5L -> 6L), seeds(1L, 5L, 7L))
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 0L, 6L -> 1L, 7L -> 0L))
  }

  test("bfsDistances: multi-source takes the MINIMUM hop distance") {
    // seeds at both ends of a 5-chain: middle vertex is 2 from either end
    val got = Graph
      .bfsDistances(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), seeds(1L, 5L))
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("bfsDistances: unreachable vertices are absent; cycles settle once") {
    val got = Graph
      .bfsDistances(edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 8L -> 9L), seeds(1L))
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("bfsDistances: throws past maxIter instead of returning partial distances") {
    val ex = intercept[IllegalStateException] {
      Graph.bfsDistances(edges(1L -> 2L, 2L -> 3L, 3L -> 4L), seeds(1L), maxIter = 2)
    }
    assert(ex.getMessage.contains("frontier"))
  }

  test("diameterLowerBound: exact on a chain and a star; deterministic ties") {
    // chain 1-2-3-4-5 from the middle: sweep1 → 1 (dist 2, tie 1 vs 5 →
    // smaller id), sweep2 from 1 → 5 at dist 4 = the true diameter
    val chain = Graph
      .diameterLowerBound(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), seed = 3L)
      .as[(Long, Long, Long, Long)].head()
    assert(chain == ((3L, 1L, 5L, 4L)))
    // star: any leaf-to-leaf path is the diameter 2
    val star = Graph
      .diameterLowerBound(edges(1L -> 2L, 1L -> 3L, 1L -> 4L), seed = 1L)
      .as[(Long, Long, Long, Long)].head()
    assert(star == ((1L, 2L, 3L, 2L)))
  }

  // ---- Relational.snapshotDiff --------------------------------------------

  test("snapshotDiff: classifies added/removed/changed/unchanged per key") {
    val oldSnap = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val newSnap = Seq((2L, 20L), (3L, 31L), (4L, 40L)).toDF("k", "v")
    val got = Relational
      .snapshotDiff(oldSnap, newSnap, "k", "v")
      .select(col("key"), col("change"))
      .as[(Long, String)]
      .collect()
      .toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff: old/new values survive for delta accounting") {
    val oldSnap = Seq((3L, 30L)).toDF("k", "v")
    val newSnap = Seq((3L, 31L), (4L, 40L)).toDF("k", "v")
    val rows = Relational
      .snapshotDiff(oldSnap, newSnap, "k", "v")
      .orderBy("key")
      .collect()
    assert(rows.map(_.getString(3)).toSeq == Seq("changed", "added"))
    assert(rows(0).getLong(1) == 30L && rows(0).getLong(2) == 31L)
    assert(rows(1).isNullAt(1) && rows(1).getLong(2) == 40L)
  }

  // ---- Curation.allocateQuota ---------------------------------------------

  private def alloc(budget: Long, counts: (String, Long)*): Map[String, Long] =
    Curation
      .allocateQuota(counts.toSeq.toDF("grp", "n"), "grp", "n", budget)
      .select(col("grp"), col("alloc"))
      .as[(String, Long)]
      .collect()
      .toMap

  test("allocateQuota: exact proportions need no remainder seats") {
    assert(alloc(10L, "a" -> 3L, "b" -> 3L, "c" -> 4L) == Map("a" -> 3L, "b" -> 3L, "c" -> 4L))
  }

  test("allocateQuota: remainder ties go to the smaller group key") {
    // 10 over three equal groups: base 3 each, one leftover seat → "a"
    assert(alloc(10L, "a" -> 1L, "b" -> 1L, "c" -> 1L) == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }

  test("allocateQuota: largest remainders win the leftover seats") {
    // shares: a 1.4, b 2.8, c 2.8 → bases 1,2,2; two seats left; remainders
    // 0.4, 0.8, 0.8 → b and c top up
    assert(alloc(7L, "a" -> 2L, "b" -> 4L, "c" -> 4L) == Map("a" -> 1L, "b" -> 3L, "c" -> 3L))
  }

  test("allocateQuota law: Σalloc = budget and every group within 1 of its exact share") {
    val counts = Seq("a" -> 17L, "b" -> 3L, "c" -> 61L, "d" -> 7L, "e" -> 29L, "f" -> 1L)
    val total = counts.map(_._2).sum
    for (budget <- Seq(0L, 1L, 13L, 100L, 997L)) {
      val got = alloc(budget, counts: _*)
      assert(got.values.sum == budget, s"budget=$budget")
      counts.foreach { case (g, n) =>
        val lo = budget * n / total // floor share
        assert(got(g) == lo || got(g) == lo + 1, s"budget=$budget group=$g")
      }
    }
  }

  // ---- Similarity.contaminationByEmbedding --------------------------------

  test("contaminationByEmbedding: threshold, argmax probe, NaN drop") {
    val corpus = Seq(
      (100L, Seq(1.0, 0.0)), // cos 1.0 to probe 0
      (101L, Seq(0.0, 1.0)), // cos 1.0 to probe 1
      (102L, Seq(1.0, 1.0)), // cos ~0.707 to both → tie → larger probe id
      (103L, Seq(1.0, -1.0)), // cos ~0.707 / -0.707 → probe 0
      (104L, Seq(-1.0, -1.0)), // both negative → below threshold
      (105L, Seq(0.0, 0.0)) // zero norm → NaN → dropped
    ).toDF("id", "vec")
    val probes = Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0))
    graft.functions.GraftFunctions.register(spark)
    val got = Similarity
      .contaminationByEmbedding(corpus, probes, threshold = 0.5)
      .select(col("id"), col("probe_id"))
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got == Map(100L -> 0L, 101L -> 1L, 102L -> 1L, 103L -> 0L))
  }

  // ---- Curation.augmentDropout ---------------------------------------------

  test("augmentDropout: deterministic, salt-independent, order-preserving") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, ""))
      .toDF("doc_id", "text")
    def run(salt: String) = Curation
      .augmentDropout(docs, "doc_id", "text", salt, dropBelow = 3000)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)]
      .collect()
      .toSeq
    val a = run("s1")
    assert(a == run("s1"), "same salt must reproduce the same mask")
    assert(a != run("s2"), "different salts must give independent masks")
    a.foreach { case (id, n, d, aug) =>
      val orig = docs.filter(col("doc_id") === id).as[(Long, String)].head()._2
      val toks = orig.split("\\s+").filter(_.nonEmpty)
      assert(n == toks.length && d >= 0 && d <= n, s"doc=$id")
      // kept tokens must be a subsequence of the original token stream
      val kept = aug.split(" ").filter(_.nonEmpty)
      var j = 0
      kept.foreach { k => j = toks.indexOf(k, j); assert(j >= 0, s"doc=$id order"); j += 1 }
      assert(kept.length == n - d)
    }
    assert(a(2) == ((3L, 0L, 0L, "")), "empty doc passes through")
  }

  test("q_augment_dropout: corpus drop rate is near the configured 10%") {
    val (n, d) = SparkEntry.queries("q_augment_dropout")(spark, "/root/testdata/sf0.001")
      .agg(sum("n_tokens"), sum("n_dropped"))
      .as[(Long, Long)].head()
    assert(d * 100 > n * 7 && d * 100 < n * 13, s"dropped $d of $n tokens")
  }

  // ---- TextOps.intraDocLineDedup -------------------------------------------

  test("intraDocLineDedup: keeps first occurrences in order, drops repeats") {
    val docs = Seq(
      (1L, "a\nb\na\nc\nb\na"), // repeats of a (x2) and b (x1)
      (2L, "x\ny\nz"), // nothing repeated
      (3L, "q\nq\nq")) // all same
      .toDF("doc_id", "text")
    val got = graft.ext.TextOps.intraDocLineDedup(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)]
      .collect()
      .toSeq
    assert(got == Seq(
      (1L, 6L, 3L, "a\nb\nc"),
      (2L, 3L, 0L, "x\ny\nz"),
      (3L, 3L, 2L, "q")))
  }

  test("intraDocLineDedup: map-only — no shuffle in the plan") {
    val docs = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val p = graft.ext.TextOps.intraDocLineDedup(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"intra-doc dedup must not shuffle:\n$p")
  }

  test("q_intra_dedup: removals are exactly the injected %3 first-line repeats") {
    val got = SparkEntry.queries("q_intra_dedup")(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("n_removed"))
      .as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, rem) =>
      assert(rem == (if (id % 3 == 0) 1L else 0L), s"doc=$id")
    }
  }

  test("q_length_buckets: per-bucket padding-waste recompute; law waste_q6 < 1e6") {
    val got = SparkEntry.queries("q_length_buckets")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val lens = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("n_chars")).as[Long].collect()
    val exp = lens.groupBy(_ / 256).map { case (b, vs) =>
      val (n, mx, sm) = (vs.length.toLong, vs.max, vs.sum)
      (b, n, mx, sm, n * mx - sm, (n * mx - sm) * 1000000L / (n * mx))
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == exp)
    got.foreach(r => assert(r._6 >= 0 && r._6 < 1000000L))
  }

  // ---- Curation.tCloseness --------------------------------------------------

  test("tCloseness: hand-computed EMD on a 2-group, 2-bucket example") {
    // g1 = (2, 2) over buckets (0, 1); g2 = (0, 4); global = (2, 6), N=8
    // EMD(g1) = |2/4 - 2/8| / 1 = 0.25; EMD(g2) = |0/4 - 2/8| / 1 = 0.25
    val rows = Seq.fill(2)(("g1", 0L)) ++ Seq.fill(2)(("g1", 1L)) ++
      Seq.fill(4)(("g2", 1L))
    val got = Curation
      .tCloseness(rows.toDF("quasi", "b"), Seq("quasi"), "b", tQ6 = 200000L)
      .orderBy("quasi")
      .as[(String, Long, Long, Boolean)]
      .collect()
      .toSeq
    assert(got == Seq(("g1", 4L, 250000L, true), ("g2", 4L, 250000L, true)))
  }

  test("tCloseness: identical distributions have zero distance; m=1 stays finite") {
    val same = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L)).toDF("quasi", "b")
    val g1 = Curation.tCloseness(same, Seq("quasi"), "b", 100L)
      .as[(String, Long, Long, Boolean)].collect()
    assert(g1.forall(r => r._3 == 0L && !r._4))
    val one = Seq(("a", 7L), ("b", 7L), ("b", 7L)).toDF("quasi", "b")
    val g2 = Curation.tCloseness(one, Seq("quasi"), "b", 100L)
      .as[(String, Long, Long, Boolean)].collect()
    assert(g2.forall(r => r._3 == 0L && !r._4), "single bucket = zero distance, no div-0")
  }

  test("augmentDropout composes into a streaming plan: map-only, zero state") {
    // the dropout mask is pure per-row HOF algebra, so it runs INSIDE the
    // streaming plan (append mode, no watermark, no state store) — the
    // ingest-time augmentation shape: readStream → augment → writeStream
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
    val expected = Curation
      .augmentDropout(rows.toDF("doc_id", "text"), "doc_id", "text", "st1", 3000)
      .as[(Long, Long, Long, String)].collect().toSet
    val mem = MemoryStream[(Long, String)]
    val q = Curation
      .augmentDropout(mem.toDF.toDF("doc_id", "text"), "doc_id", "text", "st1", 3000)
      .writeStream.format("memory").queryName("augstream").outputMode("append").start()
    try {
      mem.addData(rows(0))
      q.processAllAvailable()
      mem.addData(rows(1))
      q.processAllAvailable()
      val got = spark.table("augstream").as[(Long, Long, Long, String)].collect()
      assert(got.length == 2 && got.toSet == expected,
        s"streaming augmentation diverged: ${got.toSet} vs $expected")
    } finally q.stop()
  }

  // ---- declared-query recomputes at sf0.001 --------------------------------

  test("q_rank_auc: brute-force pair count matches the score-space form") {
    val (pos, neg, ux2, aucQ6) =
      SparkEntry.queries("q_rank_auc")(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Long)].head()
    val rows = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type") === "purchase", floor(col("value") * 100).cast("long"))
      .as[(Boolean, Long)].collect()
    val ps = rows.filter(_._1).map(_._2)
    val ns = rows.filter(!_._1).map(_._2)
    assert(pos == ps.length.toLong && neg == ns.length.toLong)
    var u2 = 0L
    ps.foreach(p => ns.foreach(m => u2 += (if (p > m) 2L else if (p == m) 1L else 0L)))
    assert(ux2 == u2)
    assert(aucQ6 == u2 * 500000L / (pos * neg))
  }

  test("q_quantile_normalize: midpoint-rule index recompute; pooled multiset preserved") {
    val got = SparkEntry.queries("q_quantile_normalize")(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long, Long)]
      .collect()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), floor(col("value") * 100).cast("long"))
      .as[(Long, String, Long)].collect()
    val pooled = ev.map(e => (e._3, e._1)).sorted.map(_._1) // by (cents, event_id)
    val nn = ev.length.toLong
    val exp = ev.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      val inGroup = rs.sortBy(e => (e._3, e._1)).zipWithIndex
      val ng = rs.length.toLong
      inGroup.toSeq.map { case (e, i) =>
        val r = i + 1L
        (e._1, e._2, e._3, pooled((((2 * r - 1) * nn) / (2 * ng)).toInt))
      }
    }.toSet
    assert(got.toSet == exp)
    // each group's normalized values track the pooled quantile ladder:
    // group min maps near pooled low end, group max near the high end
    val byType = got.groupBy(_._2)
    byType.values.foreach { rs =>
      assert(rs.map(_._4).min >= pooled.head && rs.map(_._4).max <= pooled.last)
    }
  }

  test("q_ship_split_rate / q_backlog_age: recompute from raw lineitems") {
    val split = SparkEntry.queries("q_ship_split_rate")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect()
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"),
        unix_timestamp(col("l_shipdate").cast("timestamp")).cast("long"))
      .as[(Long, Long)].collect()
    val perOrder = li.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).distinct }
    val expSplit = perOrder.values.map(_.length.toLong)
      .groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(split.toSeq == expSplit)
    assert(split.map(_._2).sum == perOrder.size.toLong, "histogram covers every order")

    val age = SparkEntry.queries("q_backlog_age")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Double, Double)].collect()
    val snap = 804470400L
    val starts = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_timestamp(col("o_orderdate").cast("timestamp")).cast("long"))
      .as[(Long, String, Long)].collect()
    val open = starts.collect {
      case (k, p, s0) if s0 <= snap && perOrder.get(k).exists(_.max > snap) =>
        (p, (snap - s0) / 86400L)
    }
    def pctX100(sorted: IndexedSeq[Long], p: Int): Long = {
      val pos = (sorted.length - 1).toLong * p
      val idx = (pos / 100).toInt
      val rem = pos % 100
      sorted(idx) * (100 - rem) + (if (rem == 0) 0L else sorted(idx + 1) * rem)
    }
    val expAge = open.groupBy(_._1).map { case (p, rs) =>
      val sorted = rs.map(_._2).sorted.toIndexedSeq
      (p, sorted.length.toLong,
        pctX100(sorted, 50).toDouble / 100, pctX100(sorted, 90).toDouble / 100)
    }.toSeq.sortBy(_._1)
    assert(age.toSeq == expAge)
    assert(age.forall(r => r._3 >= 0 && r._4 >= r._3), "p90 ≥ p50 ≥ 0")
  }

  test("q_concurrency_profile: edge-sweep recompute; counts never negative") {
    val got = SparkEntry.queries("q_concurrency_profile")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect()
    val ends = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy(col("l_orderkey"))
      .agg(max(unix_timestamp(col("l_shipdate").cast("timestamp")).cast("long")).as("e"))
      .as[(Long, Long)].collect().toMap
    val starts = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"),
        unix_timestamp(col("o_orderdate").cast("timestamp")).cast("long"))
      .as[(Long, Long)].collect()
      .collect { case (k, s0) if ends.contains(k) => (s0, ends(k)) }
    val deltas = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    starts.foreach { case (s0, e) => deltas(s0) += 1; deltas(e) -= 1 }
    var run = 0L
    val series = deltas.toSeq.sortBy(_._1).map { case (d, dl) => run += dl; (d, run) }
    val exp = series
      .groupBy { case (d, _) =>
        java.time.Instant.ofEpochSecond(d).atZone(java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM"))
      }
      .map { case (m, rs) =>
        (m, rs.map(_._2).max, rs.map(_._2).min, rs.maxBy(_._1)._2)
      }
      .toSeq.sortBy(_._1)
    assert(got.toSeq == exp)
    // every interval has start ≤ end, so the running count stays ≥ 0 and
    // the sweep ends at zero (every opened order eventually closes)
    assert(series.forall(_._2 >= 0L) && series.last._2 == 0L)
  }

  test("q_fano_factor: dispersion recompute from exact moments") {
    val got = SparkEntry.queries("q_fano_factor")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Double)].collect()
    val daily = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), floor(unix_timestamp(col("ts")) / 86400).cast("long"))
      .as[(String, Long)].collect()
      .groupBy(identity).map { case (k, g) => (k._1, k._2, g.length.toLong) }
    got.foreach { case (t, n, sc, scc, fano) =>
      val cs = daily.collect { case (t0, _, c) if t0 == t => c }.toSeq
      assert(n == cs.length.toLong && sc == cs.sum && scc == cs.map(c => c * c).sum)
      assert(fano == (n * scc - sc * sc).toDouble / (n * sc).toDouble)
      assert(fano >= 0.0, s"type=$t")
    }
  }

  test("q_runs_test: run counting recompute; runs ≤ n1 + n2") {
    val (runs, n1, n2, z) =
      SparkEntry.queries("q_runs_test")(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Double)].head()
    val daily = Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy(unix_timestamp(col("o_orderdate").cast("timestamp")).cast("long").as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      .as[(Long, Long)].collect()
    val n = daily.length.toLong
    val ranks = daily.sortBy { case (d, c) => (c, d) }.zipWithIndex
      .map { case ((d, _), i) => d -> (i + 1L) }.toMap
    val above = daily.sortBy(_._1).map { case (d, _) => ranks(d) * 2 > n + 1 }
    var (er, e1, e2) = (0L, 0L, 0L)
    above.zipWithIndex.foreach { case (a, i) =>
      if (i == 0 || above(i - 1) != a) er += 1
      if (a) e1 += 1 else e2 += 1
    }
    assert((runs, n1, n2) == ((er, e1, e2)))
    assert(runs >= 1 && runs <= n1 + n2)
    val (d1, d2) = (e1.toDouble, e2.toDouble)
    val mu = 2.0 * d1 * d2 / (d1 + d2) + 1.0
    val sg = math.sqrt(2.0 * d1 * d2 * (2.0 * d1 * d2 - d1 - d2) /
      ((d1 + d2) * (d1 + d2) * (d1 + d2 - 1.0)))
    assert(z == (er.toDouble - mu) / sg)
  }

  test("q_mcnemar_gates: paired-cell recompute; cells partition the corpus") {
    val (a, b, c, d, stat) =
      SparkEntry.queries("q_mcnemar_gates")(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Long, Double)].head()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect()
    // the proven scala twin of the engine's md5Long hash
    def md5Long(s0: String): Long = graft.ext.Similarity.md5LongScala(s0)
    val cells = docs.map { t =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      val k1 = toks.length >= 50
      val k2 = toks.map(w => md5Long(w) % 1001L - 500L).sum > 0
      (k1, k2)
    }
    val (ea, eb, ec, ed) = (
      cells.count(x => x._1 && x._2).toLong,
      cells.count(x => x._1 && !x._2).toLong,
      cells.count(x => !x._1 && x._2).toLong,
      cells.count(x => !x._1 && !x._2).toLong)
    assert((a, b, c, d) == ((ea, eb, ec, ed)))
    assert(a + b + c + d == docs.length.toLong)
    val exp = if (eb + ec > 0) ((eb - ec) * (eb - ec)).toDouble / (eb + ec).toDouble else 0.0
    assert(stat == exp)
  }

  test("q_source_vocab_overlap: jaccard recompute and symmetry-free pair coverage") {
    val got = SparkEntry.queries("q_source_vocab_overlap")(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long, Long, Long)].collect()
    val vocab = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("source"), col("text")).as[(String, String)].collect()
      .groupBy(_._1)
      .map { case (s0, rs) =>
        s0 -> rs.flatMap(_._2.split("\\s+").filter(_.nonEmpty)).toSet
      }
    val srcs = vocab.keys.toSeq.sorted
    assert(got.length == srcs.length * (srcs.length - 1) / 2, "every pair exactly once")
    got.foreach { case (sa, sb, na, nb, inter, q6) =>
      val (va, vb) = (vocab(sa), vocab(sb))
      assert(na == va.size.toLong && nb == vb.size.toLong)
      assert(inter == (va & vb).size.toLong, s"$sa-$sb")
      assert(q6 == inter * 1000000L / (na + nb - inter))
    }
  }

  test("q_ks_test: brute-force max-gap recompute; 0 ≤ D ≤ 1") {
    val (na, nb, dNum, dStat, _) =
      SparkEntry.queries("q_ks_test")(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Double, Boolean)].head()
    val rows = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id") % 2 === 0, floor(col("value") * 100).cast("long"))
      .as[(Boolean, Long)].collect()
    val a = rows.filter(_._1).map(_._2)
    val b = rows.filter(!_._1).map(_._2)
    assert(na == a.length.toLong && nb == b.length.toLong)
    val gridVals = (a ++ b).distinct.sorted
    val exp = gridVals.map(v =>
      math.abs(a.count(_ <= v).toLong * nb - b.count(_ <= v).toLong * na)).max
    assert(dNum == exp)
    assert(dStat == dNum.toDouble / (na.toDouble * nb.toDouble))
    assert(dStat >= 0.0 && dStat <= 1.0)
  }

  test("q_cramers_v: dense-grid chi-square recompute; 0 ≤ V ≤ 1") {
    val (n, nt, ns, chi2, v) =
      SparkEntry.queries("q_cramers_v")(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Double, Double)].head()
    val seg = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey"), col("c_mktsegment"))
      .as[(Long, String)].collect().toMap
    val pairs = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)].collect()
      .collect { case (u, t) if seg.contains(u) => (t, seg(u)) }
    val types = pairs.map(_._1).distinct.sorted
    val segs = pairs.map(_._2).distinct.sorted
    assert(n == pairs.length.toLong && nt == types.length.toLong && ns == segs.length.toLong)
    val o = pairs.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val r = types.map(t => t -> pairs.count(_._1 == t).toLong).toMap
    val c = segs.map(s0 => s0 -> pairs.count(_._2 == s0).toLong).toMap
    // same (type, segment) fold order as the sorted cell list
    var acc = 0.0
    for (t <- types; s0 <- segs) {
      val num = (o.getOrElse((t, s0), 0L) * n - r(t) * c(s0)).toDouble
      acc += num * num / (n.toDouble * r(t).toDouble * c(s0).toDouble)
    }
    assert(chi2 == acc)
    assert(v == math.sqrt(chi2 / (n.toDouble * (math.min(nt, ns) - 1).toDouble)))
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q_lorenz_curve: decile recompute; curve laws (monotone, convex, ends at 1e6)") {
    val got = SparkEntry.queries("q_lorenz_curve")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long)].collect()
    val pc = Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      .as[(Long, Long)].collect()
    val ranked = pc.sortBy { case (k, c) => (c, k) }.zipWithIndex
    val n = pc.length.toLong
    val tot = pc.map(_._2).sum
    var cum = 0L
    val exp = ranked.groupBy(_._2.toLong * 10 / n).toSeq.sortBy(_._1).map { case (d, rs) =>
      val c = rs.map(_._1._2).sum
      cum += c
      (d, rs.length.toLong, c, c * 1000000L / tot, cum * 1000000L / tot)
    }
    assert(got.toSeq == exp)
    // Lorenz laws: cumulative share strictly increasing, convex (later
    // deciles hold ever-larger shares since customers are sorted), final
    // cumulative share = 1e6 exactly (Σ cents = tot)
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._5 > a._5, "cumulative share increases")
        assert(b._4 >= a._4 - 1, "per-decile share non-decreasing up to truncation")
      case _ =>
    }
    assert(got.last._5 == 1000000L)
  }

  test("q_effective_sample_size: Kish recompute; n-bounds law") {
    val (n, sw, sw2, ess) =
      SparkEntry.queries("q_effective_sample_size")(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Double)].head()
    val w = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("n_chars")).as[Long].collect()
    assert(n == w.length.toLong && sw == w.sum && sw2 == w.map(x => x * x).sum)
    assert(ess == (sw.toDouble * sw.toDouble) / sw2.toDouble)
    assert(ess > 0 && ess <= n.toDouble, "1 ≤ ESS ≤ n")
  }

  test("q_kaplan_meier: fold recompute and survival-curve laws") {
    val got = SparkEntry.queries("q_kaplan_meier")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double)].collect()
    val lifetimes = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), floor(unix_timestamp(col("ts")) / 86400).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map(_._2.map(_._2).distinct.length.toLong)
    val byL = lifetimes.groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    val ls = byL.keys.toSeq.sorted
    var n = lifetimes.size.toLong
    var s = 1.0
    val exp = ls.map { l =>
      val d = byL(l)
      s = s * (1.0 - d.toDouble / n.toDouble)
      val out = (l, d, n, s)
      n -= d
      out
    }
    assert(got.toSeq == exp)
    // laws: non-increasing, ends at exactly 0 (every lifetime observed)
    got.sliding(2).foreach {
      case Array(a, b) => assert(b._4 <= a._4, "survival must not increase")
      case _ =>
    }
    assert(got.last._4 == 0.0 && got.last._2 == got.last._3)
  }

  test("holtWintersInteger: scala fold recompute on a synthetic weekly series") {
    // 3 weeks of a strict period-7 pattern plus a level shift
    val xs = (0 until 21).map(i => (i.toLong, (100 + (i % 7) * 10 + i / 7).toLong))
    val df = xs.toDF("day", "cents").withColumn("k", lit("a"))
    val got = graft.ext.Relational
      .holtWintersInteger(df, "k", "day", "cents", 30, 100, 20, 100, period = 7)
      .orderBy("day")
      .select(col("day"), col("level"), col("seasonal"), col("forecast_next"))
      .as[(Long, Long, Long, Long)].collect()
    def quot(a: Long, b: Long): Long = a / b // JVM / truncates toward zero
    var l = 0L
    val ss = Array.fill(7)(0L)
    val exp = xs.zipWithIndex.map { case ((d, x), t) =>
      val sPrev = if (t >= 7) ss(t % 7) else 0L
      if (t == 0) { l = x; ss(0) = 0L; (d, x, 0L) }
      else {
        l = quot(30 * (x - sPrev) + 70 * l, 100)
        val sNew = quot(20 * (x - l) + 80 * sPrev, 100)
        ss(t % 7) = sNew
        (d, l, sNew)
      }
    }
    got.zip(exp).zipWithIndex.foreach { case (((gd, gl, gs, gf), (ed, el, es)), t) =>
      assert(gd == ed && gl == el && gs == es, s"t=$t")
      val sNext = if (t >= 6) exp(t - 6)._3 else 0L
      assert(gf == gl + sNext, s"forecast t=$t")
    }
  }

  test("streaming holtWinters: micro-batch state ≡ the batch recurrence") {
    import graft.streaming.StatefulOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val xs = (0 until 21).map(i => StatefulOps.HwInput("a", i.toLong,
      (100 + (i % 7) * 10 + i / 7).toLong))
    val expected = graft.ext.Relational
      .holtWintersInteger(
        xs.map(h => (h.key, h.bucket, h.x)).toDF("k", "day", "cents"),
        "k", "day", "cents", 30, 100, 20, 100, period = 7)
      .orderBy("day")
      .select(col("day"), col("cents"), col("level"), col("seasonal"),
        col("forecast_next"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val mem = MemoryStream[StatefulOps.HwInput]
    val q = StatefulOps
      .holtWinters(mem.toDS(), 30, 100, 20, 100, period = 7)
      .writeStream.format("memory").queryName("hwstream").outputMode("append").start()
    try {
      // three uneven micro-batches; state must carry level + the ring across
      mem.addData(xs.take(5): _*)
      q.processAllAvailable()
      mem.addData(xs.slice(5, 16): _*)
      q.processAllAvailable()
      mem.addData(xs.drop(16): _*)
      q.processAllAvailable()
      val got = spark.table("hwstream")
        .select(col("bucket"), col("x"), col("level"), col("seasonal"),
          col("forecastNext"))
        .orderBy("bucket")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == expected, "streaming recurrence must equal the batch fold")
    } finally q.stop()
  }

  test("q_spearman: tie-averaged-rank recompute; rho in [-1, 1]") {
    // moments ride the DECIMAL(38,0) lane (BIGINT products wrap past
    // n ≈ 1.3e6); at this SF every value fits a Long exactly
    val got0 = SparkEntry.queries("q_spearman")(spark, "/root/testdata/sf0.001")
      .selectExpr("n", "CAST(sx AS BIGINT) AS sx", "CAST(sy AS BIGINT) AS sy",
        "CAST(sxy AS BIGINT) AS sxy", "CAST(sxx AS BIGINT) AS sxx",
        "CAST(syy AS BIGINT) AS syy", "rho")
      .as[(Long, Long, Long, Long, Long, Long, Double)].head()
    val got = got0
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("n_chars"),
        graft.ext.TextOps.tokenCount(col("text")).cast("long"))
      .as[(Long, Long)].collect()
    def r2(vs: Seq[Long]): Map[Long, Long] = {
      val byV = vs.groupBy(identity).map { case (v, g) => v -> g.length.toLong }
      val sortedVals = byV.keys.toSeq.sorted
      var cum = 0L
      sortedVals.map { v =>
        val out = v -> (2 * cum + byV(v) + 1)
        cum += byV(v)
        out
      }.toMap
    }
    val rx = r2(base.map(_._1).toSeq)
    val ry = r2(base.map(_._2).toSeq)
    val pairs = base.map { case (x, y) => (rx(x), ry(y)) }
    val n = pairs.length.toLong
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val rho = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
    assert(got == ((n, sx, sy, sxy, sxx, syy, rho)))
    assert(got._7 >= -1.0 && got._7 <= 1.0)
    // length and token count are strongly monotone-related by construction
    assert(got._7 > 0.5, s"expected a strong positive rank correlation, got ${got._7}")
  }

  test("q_kendall_tau: brute-force concordance recompute; C+D+T = m(m-1)/2") {
    val got = SparkEntry.queries("q_kendall_tau")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double)].head()
    val m = Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy(((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1)
        .cast("long").as("x"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("r"),
        count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    var (cc, dd, tt) = (0L, 0L, 0L)
    for (i <- m.indices; j <- (i + 1) until m.length) {
      val s = (m(j)._2 - m(i)._2) * (m(j)._3 - m(i)._3)
      if (s > 0) cc += 1 else if (s < 0) dd += 1 else tt += 1
    }
    assert(got == ((cc, dd, tt, (cc - dd).toDouble / (cc + dd + tt).toDouble)))
    assert(cc + dd + tt == m.length.toLong * (m.length - 1) / 2)
  }

  test("q_chi2_terms: JVM recompute of cells and the fixed-order chi-square") {
    val got = SparkEntry.queries("q_chi2_terms")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(got.length == 20)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("lang") === "en", col("text"))
      .as[(Boolean, String)].collect()
    val nn = docs.length.toLong
    val nen = docs.count(_._1).toLong
    val presence = docs.flatMap { case (en, t) =>
      t.split("\\s+").filter(_.nonEmpty).distinct.map(tok => (tok, en))
    }
    val cells = presence.groupBy(_._1).map { case (tok, rs) =>
      tok -> ((rs.count(_._2).toLong, rs.length.toLong))
    }
    got.foreach { case (tok, a, b, c, d, chi2) =>
      val (ea, withAll) = cells(tok)
      assert(a == ea && b == withAll - ea && c == nen - ea &&
        d == nn - nen - (withAll - ea), s"token=$tok cells")
      val diff = (a * d - b * c).toDouble
      val exp = diff * diff * (a + b + c + d).toDouble /
        ((a + b).toDouble * (c + d).toDouble * (a + c).toDouble * (b + d).toDouble)
      assert(chi2 == exp, s"token=$tok chi2")
    }
    // the list is the global top by chi2 among supported tokens
    val minTop = got.map(_._6).min
    cells.foreach { case (tok, (ea, withAll)) =>
      if (withAll >= 5 && withAll < nn && !got.exists(_._1 == tok)) {
        val (a, b, c, d) = (ea, withAll - ea, nen - ea, nn - nen - (withAll - ea))
        val diff = (a * d - b * c).toDouble
        val chi2 = diff * diff * nn.toDouble /
          ((a + b).toDouble * (c + d).toDouble * (a + c).toDouble * (b + d).toDouble)
        assert(chi2 <= minTop, s"unselected token=$tok beats the top-20")
      }
    }
  }

  test("q_sample_systematic: exact 50-spacing on the doc_id order") {
    val got = SparkEntry.queries("q_sample_systematic")(spark, "/root/testdata/sf0.001")
      .select(col("doc_id")).as[Long].collect()
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id")).as[Long].collect().sorted
    val exp = all.zipWithIndex.collect { case (id, i) if i % 50 == 0 => id }
    assert(got.toSeq == exp.toSeq)
  }

  test("q_dup_rate_by_length: stratified dup-share recompute") {
    val got = SparkEntry.queries("q_dup_rate_by_length")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("n_chars"), md5(col("text")))
      .as[(Long, String)].collect()
    val sizes = docs.groupBy(_._2).map { case (fp, rs) => fp -> rs.length }
    val exp = docs.groupBy(_._1 / 256).map { case (b, rs) =>
      val dup = rs.count(r => sizes(r._2) > 1).toLong
      (b, rs.length.toLong, dup, dup * 1000000L / rs.length)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == exp)
  }

  test("q_clustering_coeff / q_degree_dist: internal consistency laws at sf0.001") {
    val cc = SparkEntry.queries("q_clustering_coeff")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    cc.foreach { case (id, deg, tri, q6) =>
      assert(q6 >= 0 && q6 <= 1000000L, s"cc in [0,1]: id=$id")
      if (deg < 2) assert(q6 == 0L && tri == 0L, s"deg<2 vertex id=$id")
      else assert(q6 == 2 * tri * 1000000L / (deg * (deg - 1)), s"id=$id")
      // each triangle at a vertex uses 2 of its edges: tri ≤ C(deg, 2)
      assert(2 * tri <= deg * (deg - 1), s"triangle bound id=$id")
    }
    val dd = SparkEntry.queries("q_degree_dist")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect()
    assert(dd.map(_._2).sum == cc.length.toLong,
      "degree histogram covers every vertex exactly once")
    assert(dd.map { case (d, n) => d * n }.sum == cc.map(_._2).sum,
      "Σ deg·count equals the degree total (handshake)")
  }

  test("q_type_concentration: collision-probability recompute and bounds") {
    val got = SparkEntry.queries("q_type_concentration")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)].collect()
    val exp = ev.groupBy(_._1).map { case (u, rs) =>
      val cs = rs.groupBy(_._2).map(_._2.length.toLong)
      val n = cs.sum
      (u, n, cs.size.toLong, cs.map(c => c * c).sum * 1000000L / (n * n))
    }.toSet
    assert(got.toSet == exp)
    got.foreach { case (u, _, nt, q6) =>
      // 1e6/n_types (uniform) ≤ conc ≤ 1e6 (single-type), up to truncation
      assert(q6 <= 1000000L && q6 >= 1000000L / nt - 1, s"user=$u")
    }
  }

  test("q_theil_sen: brute-force pairwise-median recompute") {
    val got = SparkEntry.queries("q_theil_sen")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    val monthly = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(
        ((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate")) - 1).cast("long"),
        floor(col("o_totalprice") * 100).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1)
      .map { case (x, rs) => (x, rs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val pairs = for {
      (x1, y1) <- monthly; (x2, y2) <- monthly if x1 < x2
    } yield (x1, x2, y2 - y1, x2 - x1, (y2 - y1).toDouble / (x2 - x1).toDouble)
    val sorted = pairs.sortBy(p => (p._5, p._1, p._2))
    val med = sorted((pairs.length + 1) / 2 - 1)
    assert(got == ((pairs.length.toLong, med._1, med._2, med._3, med._4, med._5)))
  }

  test("q_simpson_check: cross-multiplied directions recompute") {
    val got = SparkEntry.queries("q_simpson_check")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long, Boolean, Boolean, Boolean)]
      .collect()
    val seg = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey"), col("c_mktsegment"))
      .as[(Long, String)].collect().toMap
    val conv = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)].collect()
      .groupBy(_._1)
      .collect { case (u, rs) if seg.contains(u) =>
        (seg(u), u % 2, if (rs.exists(_._2 == "purchase")) 1L else 0L)
      }
      .toSeq
    val cells = conv.groupBy(_._1).map { case (sg, rs) =>
      (sg, rs.count(_._2 == 0).toLong, rs.filter(_._2 == 0).map(_._3).sum,
        rs.count(_._2 == 1).toLong, rs.filter(_._2 == 1).map(_._3).sum)
    }.toSeq
    val (tna, tsa, tnb, tsb) =
      (cells.map(_._2).sum, cells.map(_._3).sum, cells.map(_._4).sum, cells.map(_._5).sum)
    val pooled = tsa * tnb > tsb * tna
    got.foreach { case (sg, na, sa, nb, sb, agt, pg, rev) =>
      val e = cells.find(_._1 == sg).get
      assert((na, sa, nb, sb) == ((e._2, e._3, e._4, e._5)), s"seg=$sg")
      assert(agt == (sa * nb > sb * na) && pg == pooled && rev == (agt != pooled), s"seg=$sg")
    }
    assert(got.length == cells.size)
  }

  test("q_decay_attribution: power-of-2 decay credits recompute") {
    val got = SparkEntry.queries("q_decay_attribution")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")))
      .as[(Long, Long, String, Long)].collect()
    val purchases = ev.filter(_._3 == "purchase")
    val touches = ev.filter(e => e._3 == "click" || e._3 == "view")
    val credits = purchases.flatMap { case (u, _, _, ps) =>
      val ts = touches.filter(t => t._1 == u && t._4 <= ps && t._4 >= ps - 7L * 86400L)
      val ws = ts.map(t => (t._3, 1000000L >> ((ps - t._4) / 86400L).toInt))
      val wsum = ws.map(_._2).sum
      ws.map { case (ch, w) => ch -> w * 1000000L / wsum }
    }
    val exp = credits.groupBy(_._1).map { case (ch, cs) =>
      ch -> ((cs.length.toLong, cs.map(_._2).sum))
    }
    assert(got == exp)
  }

  test("q_srm_check: cell recompute; chi2 law") {
    val (na, nb, chi2, mismatch) =
      SparkEntry.queries("q_srm_check")(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Double, Boolean)].head()
    val users = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id")).distinct().as[Long].collect()
    assert(na == users.count(_ % 2 == 0).toLong && nb == users.count(_ % 2 == 1).toLong)
    assert(chi2 == ((na - nb) * (na - nb)).toDouble / (na + nb).toDouble)
    assert(mismatch == (chi2 > 3.841))
  }

  test("q_position_attribution: per-purchase U-shaped credits recompute") {
    val got = SparkEntry.queries("q_position_attribution")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")))
      .as[(Long, Long, String, Long)].collect()
    val purchases = ev.filter(_._3 == "purchase")
    val touches = ev.filter(e => e._3 == "click" || e._3 == "view")
    val credits = purchases.flatMap { case (u, _, _, ps) =>
      val ts = touches
        .filter(t => t._1 == u && t._4 <= ps && t._4 >= ps - 86400L)
        .sortBy(t => (t._4, t._2))
      val n = ts.length
      ts.zipWithIndex.map { case (t, i) =>
        val c =
          if (n == 1) 1000000L
          else if (n == 2) 500000L
          else if (i == 0 || i == n - 1) 400000L
          else 200000L / (n - 2)
        t._3 -> c
      }
    }
    val exp = credits.groupBy(_._1).map { case (ch, cs) =>
      ch -> ((cs.length.toLong, cs.map(_._2).sum))
    }
    assert(got == exp)
  }


  test("q_quota_allocate: fixture recompute (Hamilton by hand)") {
    val got = SparkEntry.queries("q_quota_allocate")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)]
      .collect()
      .map { case (g, _, a) => g -> a }
      .toMap
    val counts = Tables.documents(spark, "/root/testdata/sf0.001")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSeq
    val total = counts.map(_._2).sum
    val base = counts.map { case (g, n) => (g, 1000L * n / total, 1000L * n % total) }
    val short = 1000L - base.map(_._2).sum
    val winners = base.sortBy { case (g, _, rem) => (-rem, g) }.take(short.toInt).map(_._1).toSet
    val exp = base.map { case (g, b, _) => g -> (b + (if (winners(g)) 1L else 0L)) }.toMap
    assert(got == exp)
    assert(got.values.sum == 1000L)
  }

  test("q_log_histogram: bucket is the binary length of the cent total") {
    val got = SparkEntry.queries("q_log_histogram")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)]
      .collect()
    val cents = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(floor(col("o_totalprice") * 100).cast("long"))
      .as[Long].collect()
    val exp = cents
      .groupBy(c => java.lang.Long.toBinaryString(c).length.toLong)
      .map { case (b, vs) => (b, vs.length.toLong, vs.min, vs.max) }
      .toSeq.sortBy(_._1)
    assert(got.toSeq == exp)
    // bucket law: 2^(b-1) <= min <= max < 2^b
    got.foreach { case (b, _, mn, mx) =>
      assert(mn >= (1L << (b - 1).toInt) && mx < (1L << b.toInt), s"bucket=$b")
    }
  }

  test("q_wilson_ci: JVM recompute of the fixed-order float tree matches bit-for-bit") {
    val got = SparkEntry.queries("q_wilson_ci")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double, Double)]
      .collect()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    got.foreach { case (t, n, s, lo, hi) =>
      val rows = ev.filter(_._1 == t)
      assert(rows.length.toLong == n)
      assert(rows.count(_._2 >= 50.0).toLong == s)
      val z = 1.96
      val nd = n.toDouble
      val ph = s.toDouble / nd
      val denom = 1.0 + z * z / nd
      val center = (ph + z * z / (nd * 2.0)) / denom
      val half = z * math.sqrt(ph * (1.0 - ph) / nd + z * z / (nd * nd * 4.0)) / denom
      assert(lo == center - half && hi == center + half, s"type=$t")
      assert(lo >= 0.0 && hi <= 1.0 && lo <= ph && ph <= hi, s"Wilson stays in range, type=$t")
    }
  }

  test("q_winsorized_mean: clamp at exact p5/p95 — hand recompute per priority") {
    val got = SparkEntry.queries("q_winsorized_mean")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val rows = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderpriority"), floor(col("o_totalprice") * 100).cast("long"))
      .as[(String, Long)].collect()
    def pctX100(sorted: IndexedSeq[Long], p: Int): Long = {
      val pos = (sorted.length - 1).toLong * p
      val idx = (pos / 100).toInt
      val rem = pos % 100
      sorted(idx) * (100 - rem) + (if (rem == 0) 0L else sorted(idx + 1) * rem)
    }
    val exp = rows.groupBy(_._1).map { case (prio, rs) =>
      val sorted = rs.map(_._2).sorted.toIndexedSeq
      val (p5, p95) = (pctX100(sorted, 5), pctX100(sorted, 95))
      prio -> ((sorted.length.toLong,
        sorted.map(c => math.max(p5, math.min(c * 100, p95))).sum))
    }
    assert(got == exp)
  }

  test("q_bounce_rate: scala sessionizer recompute") {
    val got = SparkEntry.queries("q_bounce_rate")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect()
    val exp = ev.groupBy(_._1).map { case (u, rs) =>
      val ts = rs.map(_._2).sorted
      val sizes = scala.collection.mutable.ArrayBuffer(1L)
      ts.sliding(2).foreach {
        case Array(a, b) =>
          if (b - a >= 86400L * 1000000L) sizes += 1L
          else sizes(sizes.length - 1) += 1L
        case _ =>
      }
      val bounce = sizes.count(_ == 1L).toLong
      u -> ((sizes.length.toLong, bounce, bounce * 1000000L / sizes.length))
    }
    assert(got == exp)
  }

  test("q_curriculum_shards: round-robin ranks balance difficulty — hand recompute") {
    val got = SparkEntry.queries("q_curriculum_shards")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long)]
      .collect()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)].collect()
    val ranked = docs.sortBy { case (id, nc) => (nc, id) }.zipWithIndex
    val exp = ranked
      .groupBy(_._2 % 8)
      .map { case (sh, rs) =>
        (sh.toLong, rs.length.toLong, rs.map(_._1._2).sum,
          rs.map(_._2.toLong).min, rs.map(_._2.toLong).max)
      }
      .toSeq.sortBy(_._1)
    assert(got.toSeq == exp)
    // balance law: shard char sums within one max-doc of each other
    val sums = got.map(_._3)
    assert(sums.max - sums.min <= docs.map(_._2).max, "round-robin difficulty balance")
  }

  test("q_mutual_nn: reciprocal best hits form a matching inside the mutual-8 graph") {
    val nn = SparkEntry.queries("q_mutual_nn")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect()
    // matching: top-1 is unique per vertex, so each vertex joins ≤ 1 edge
    val verts = nn.flatMap(p => Seq(p._1, p._2))
    assert(verts.distinct.length == verts.length, "mutual-1-NN must be a matching")
    // rank ≤ 1 both ways ⇒ rank ≤ 8 both ways: subset of the k=8 mutual
    // graph (same sized-LSH candidate frame on both sides via the memo)
    graft.functions.GraftFunctions.register(spark)
    val m8 = graft.ext.GraphQueries
      .mutualK(spark, "/root/testdata/sf0.001", 8)
      .as[(Long, Long)].collect().toSet
    assert(nn.forall(m8.contains), "mutual-1 edges must appear in the mutual-8 graph")
  }

  test("q_snapshot_diff: fixture recompute of the four-class rollup") {
    val got = SparkEntry.queries("q_snapshot_diff")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap
    val rows = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), floor(col("o_totalprice") * 100).cast("long"))
      .as[(Long, Long)].collect()
    val old = rows.filter(_._1 % 7 != 0).toMap
    val nw = rows.filter(_._1 % 5 != 0)
      .map { case (k, c) => k -> (c + (if (k % 3 == 0) 1L else 0L)) }.toMap
    val classified = (old.keySet ++ nw.keySet).toSeq.map { k =>
      val cls =
        if (!old.contains(k)) "added"
        else if (!nw.contains(k)) "removed"
        else if (old(k) != nw(k)) "changed"
        else "unchanged"
      (cls, k, if (cls == "changed") nw(k) - old(k) else 0L)
    }
    val exp = classified.groupBy(_._1).map { case (cls, rs) =>
      cls -> ((rs.size.toLong, rs.map(_._2).sum, rs.map(_._3).sum))
    }
    assert(got == exp)
  }
}
