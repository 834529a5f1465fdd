package graft

import graft.ext.{Relational, Similarity, SimilarityQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality + plan-shape checks against the sf0.001 embeddings fixture.
  * Ground truth is the exact brute-force cosine top-k; recall@5 is the
  * fraction of true top-5 neighbors the LSH path recovers.
  */
class SimilaritySpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private lazy val vecs: DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables
      .embeddings(spark, SfDir)
      .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"))
      .cache()
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("multi-table ANN recall@5 >= 0.8 vs brute-force ground truth") {
    val queries = vecs.filter(col("id") < 20)
    val truth = pairs(Similarity.bruteForceTopK(queries, vecs, k = 5))
    val ann = pairs(Similarity.annTopKMulti(queries, vecs, SimilarityQueries.Tables3, k = 5))
    val recall = (truth & ann).size.toDouble / truth.size
    info(f"multi-table (L=3) recall@5 = $recall%.3f over ${truth.size} truth pairs")
    assert(recall >= 0.8, f"recall@5 $recall%.3f below 0.8")
  }

  test("probing a persisted LSH index equals the inline build, exchange-free index side") {
    val queries = vecs.filter(col("id") < 20)
    val inline = Similarity.annTopKMulti(queries, vecs, SimilarityQueries.Tables3, k = 5)
      .collect().map(_.toString).toSet
    val idx = graft.ext.Dedup.Intermediate.Bucketed(8)
      .keyed(Similarity.lshIndexFrame(vecs, SimilarityQueries.Tables3),
        "spec_ann_index", "t,bucket")
    val probed = Similarity.annTopKFromIndex(queries, idx, SimilarityQueries.Tables3, k = 5)
    assert(probed.collect().map(_.toString).toSet == inline,
      "index-once/probe-many must be result-identical to the inline build")
    // the index side rides the broadcast probe join straight off its
    // bucketed scan: no hash exchange may sit between the join and the
    // index FileScan (inspect the FINAL plan section only — AQE appends
    // an "Initial Plan" echo that repeats upstream operators)
    val full = probed.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), s"probe side must broadcast:\n$plan")
    val joinAt = plan.indexOf("BroadcastHashJoin")
    val scanAt = plan.indexOf("FileScan parquet", joinAt)
    assert(scanAt > joinAt && plan.substring(scanAt).startsWith("FileScan parquet spark_catalog"),
      s"index join must stream straight from the stored table scan:\n$plan")
    assert(!plan.substring(joinAt, scanAt).contains("Exchange hashpartitioning"),
      s"stored index must reach the probe join without a shuffle:\n$plan")
    assert(plan.substring(scanAt, plan.indexOf('\n', scanAt).max(scanAt))
      .contains("Bucketed: true") || plan.contains("Bucketed: true"),
      s"index scan must read the bucketed layout:\n$plan")
    // the too-big-to-broadcast path: merge-join probes — the bucket
    // layout is WHY the stored index still reads exchange-free
    // (HashPartitioning(bucket) satisfies the (t, bucket) clustering)
    val smj = Similarity.annTopKFromIndex(queries, idx, SimilarityQueries.Tables3,
        k = 5, broadcastProbes = false)
    assert(smj.collect().map(_.toString).toSet == inline,
      "merge-join probe path must be result-identical too")
    val splan = smj.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(splan.contains("SortMergeJoin"), s"non-broadcast probes must merge-join:\n$splan")
    assert(splan.contains("FileScan parquet spark_catalog"),
      s"index side must read the stored table:\n$splan")
    // exactly ONE (t, bucket) exchange: the probe side shuffles to match
    // the index's bucket count; the index side contributes none — two
    // would mean the stored layout was ignored and both sides re-shuffled
    val joinKeyExchanges = "Exchange hashpartitioning\\(t#".r.findAllIn(splan).size
    assert(joinKeyExchanges == 1,
      s"only the probe side may shuffle to the bucket layout (saw $joinKeyExchanges):\n$splan")
  }

  test("multi-table ANN strictly improves on single-table recall") {
    val queries = vecs.filter(col("id") < 20)
    val truth = pairs(Similarity.bruteForceTopK(queries, vecs, k = 5))
    val one = pairs(Similarity.annTopKMulti(queries, vecs, SimilarityQueries.Tables3.take(1), k = 5))
    val three = pairs(Similarity.annTopKMulti(queries, vecs, SimilarityQueries.Tables3, k = 5))
    val r1 = (truth & one).size.toDouble / truth.size
    val r3 = (truth & three).size.toDouble / truth.size
    info(f"recall@5 single=$r1%.3f multi=$r3%.3f")
    assert(r3 > r1)
  }

  test("IVF ANN: equi-join plan, measurable recall vs brute force") {
    val queries = vecs.filter(col("id") < 20)
    val cent = vecs.filter(col("id") < 16).select(col("id").as("cid"), col("vec").as("cvec"))
    val ivf = Similarity.ivfTopK(queries, vecs, cent, nCells = 16, nprobe = 2, k = 5)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"IVF assignment must be explode+equi-join, not a cartesian:\n$plan")
    val truth = pairs(Similarity.bruteForceTopK(queries, vecs, k = 5))
    val got = pairs(ivf)
    val recall = (truth & got).size.toDouble / truth.size
    info(f"IVF (16 cells, nprobe=2) recall@5 = $recall%.3f over ${truth.size} truth pairs")
    assert(recall >= 0.5, f"sampled-centroid IVF recall collapsed: $recall%.3f (measured 0.83)")
  }

  test("kmeansFit: deterministic, improves the quantization objective") {
    val k = 16
    val fitted = Similarity.kmeansFit(vecs, k, dim = 64, iters = 4)
    // deterministic: a second fit reproduces bit-identical centroids
    val again = Similarity.kmeansFit(vecs, k, dim = 64, iters = 4)
    assert(fitted.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "fit must be reproducible")
    fitted.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(n > 0, "no degenerate centroid")
    }
    // the Lloyd objective: mean cosine of each vector to its assigned
    // centroid. The fitted quantizer must beat the init (= the k lowest-id
    // corpus vectors, i.e. exactly what the sampled-centroid IVF query
    // uses).
    def objective(cent: Array[Array[Double]]): Double = {
      val best = greatest(cent.map(c =>
        Similarity.cosine(col("vec"), typedLit(c.toSeq))): _*)
      vecs.select(avg(best)).head().getDouble(0)
    }
    val init = vecs.orderBy("id").limit(k).select(col("vec"))
      .collect().map(_.getSeq[Double](0).toArray)
    val objInit = objective(init)
    val objFitted = objective(fitted)
    info(f"quantization objective (mean assigned cosine): init=$objInit%.4f fitted=$objFitted%.4f")
    assert(objFitted > objInit, f"Lloyd iterations must improve the objective")

    // recall at FIXED nprobe is a geometry trade, not the fit objective:
    // tighter balanced cells can place true neighbors outside 2 probed
    // cells (measured: sampled 0.83 vs fitted 0.75 @ nprobe=2 on this
    // fixture); raising nprobe recovers it. Pin that the knob works.
    val queries = vecs.filter(col("id") < 20)
    val truth = pairs(Similarity.bruteForceTopK(queries, vecs, k = 5))
    def recallWith(cent: DataFrame, nprobe: Int): Double = {
      val got = pairs(Similarity.ivfTopK(queries, vecs, cent, nCells = k, nprobe = nprobe, k = 5))
      (truth & got).size.toDouble / truth.size
    }
    val centDF = Similarity.centroidsDF(spark, fitted)
    val r2 = recallWith(centDF, 2)
    val r4 = recallWith(centDF, 4)
    info(f"fitted IVF recall@5: nprobe=2 $r2%.3f, nprobe=4 $r4%.3f")
    // deterministic on this fixture: 0.75 → 0.78 (the synthetic embeddings
    // are weakly clustered, so IVF recall saturates slowly in nprobe)
    assert(r4 >= r2 && r4 >= 0.75, f"nprobe=4 recall $r4%.3f regressed")
  }

  test("ANN candidate generation is an equi-join (no cartesian product)") {
    val queries = vecs.filter(col("id") < 10)
    val plan = Similarity
      .annTopKMulti(queries, vecs, SimilarityQueries.Tables3, k = 5)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop in plan:\n$plan")
  }

  test("zero-norm embeddings never enter a top-k (NaN cosine excluded)") {
    val spark0 = spark
    import spark0.implicits._
    // corpus = 20 real vectors + one all-zero row (a failed-embedding row)
    val dim = 64
    val real = vecs.filter(col("id") < 20)
    val zero = Seq((999L, Seq.fill(dim)(0.0))).toDF("id", "vec")
    val corpus = real.unionByName(zero)
    val queries = vecs.filter(col("id") < 5)
    val cent = vecs.filter(col("id") < 8).select(col("id").as("cid"), col("vec").as("cvec"))
    val paths = Seq(
      Similarity.bruteForceTopK(queries, corpus, k = 5),
      Similarity.annTopKMulti(queries, corpus, SimilarityQueries.Tables3, k = 5),
      Similarity.ivfTopK(queries, corpus, cent, nCells = 8, nprobe = 2, k = 5))
    paths.foreach { df =>
      val neighbors = df.select(col("neighbor_id").cast("long")).as[Long].collect().toSet
      assert(!neighbors.contains(999L),
        "NaN cosine must be excluded, not ranked first (Spark sorts NaN above all doubles)")
    }
    // near-dup pairs: the zero row must not pass the threshold gate either
    val pairs = Similarity
      .cosineNearDupPairs(corpus, SimilarityQueries.Tables3.head, threshold = 0.1)
      .select(col("a").cast("long"), col("b").cast("long")).as[(Long, Long)].collect()
    assert(!pairs.exists(p => p._1 == 999L || p._2 == 999L))
  }

  test("collapsed lshBucket matches the reference unrolled-sum semantics") {
    // independent re-computation: driver-side per-row fold, same order
    val planes = SimilarityQueries.Tables3.head
    val rows = vecs.filter(col("id") < 50).collect()
    val got = vecs
      .filter(col("id") < 50)
      .select(col("id"), Similarity.lshBucket(col("vec"), planes).as("b"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val expect = planes.zipWithIndex.map { case (w, p) =>
        val d = w.zipWithIndex.map { case (wi, i) => v(i) * wi }.sum
        if (d > 0) 1L << p else 0L
      }.sum
      assert(got(r.getLong(0)) == expect, s"bucket mismatch for id ${r.getLong(0)}")
    }
  }

  // ---- plane sizing (the 100 TB lever) -----------------------------------

  /** SplitMix64-mixed deterministic synthetic corpus (no RNG). */
  private def synthVecs(n: Int, dim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // graft_dot (idempotent)
    val spark0 = spark
    import spark0.implicits._
    def mix(seed: Long): Double = {
      var z = seed * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (math.floorMod(z, 1000L)) / 500.0 - 1.0
    }
    Seq.tabulate(n)(i => (i.toLong, Seq.tabulate(dim)(d => mix(i.toLong * 131 + d))))
      .toDF("id", "vec")
  }

  test("planesFor: log2 sizing, clamped") {
    assert(Similarity.planesFor(0, 64) == 1)
    assert(Similarity.planesFor(64, 64) == 1)
    assert(Similarity.planesFor(1000, 64) == 4)
    assert(Similarity.planesFor(10000, 64) == 8)
    assert(Similarity.planesFor(Long.MaxValue, 1) == 62)
  }

  test("near-dup candidate volume stays ~linear under planesFor auto-sizing") {
    val dim = 8
    val (n1, n10) = (300, 3000)
    val (v1, v10) = (synthVecs(n1, dim), synthVecs(n10, dim))
    val target = 32L
    val auto1 = Similarity.hyperplanes(Similarity.planesFor(n1, target), dim)
    val auto10 = Similarity.hyperplanes(Similarity.planesFor(n10, target), dim)
    val c1 = Similarity.nearDupCandidateCount(v1, auto1)
    val c10 = Similarity.nearDupCandidateCount(v10, auto10)
    // the measured failure mode: the SAME planes at 10x the corpus
    val fixed10 = Similarity.nearDupCandidateCount(v10, auto1)
    val autoRatio = c10.toDouble / c1
    val fixedRatio = fixed10.toDouble / c1
    info(f"candidates 1x=$c1 10x(auto)=$c10 ($autoRatio%.1fx) 10x(fixed)=$fixed10 ($fixedRatio%.1fx)")
    // the guarantee the rule delivers: per-bucket occupancy ≈ target, so
    // candidate volume ≤ n × probes × targetBucketSize (2x slack for sign
    // -bit bucket skew) AT EVERY SCALE — i.e. candidates/row/probe bounded
    // by a constant, which is what "corpus-linear" means once the probe
    // ring (planes+1, ∝ log n) is priced in
    def bound(n: Int, planes: Int): Double = 2.0 * n * (planes + 1) * target
    assert(c1 <= bound(n1, auto1.length), s"1x candidates $c1 exceed occupancy bound")
    assert(c10 <= bound(n10, auto10.length),
      s"10x candidates $c10 exceed occupancy bound ${bound(n10, auto10.length)}")
    // and the measured failure mode really is a failure: the SAME planes at
    // 10x the corpus burst their own occupancy bound (18.9x wall-clock in
    // the x10 bench) — the rule is load-bearing, not decorative
    assert(fixed10 > bound(n10, auto1.length),
      f"fixed-plane run should burst its bound (got $fixed10)")
    assert(fixedRatio > 2 * autoRatio,
      f"fixed-plane blowup ($fixedRatio%.1fx) should dwarf auto-sizing ($autoRatio%.1fx)")
  }

  // ---- product quantization ----------------------------------------------

  /** Per-corpus quantization MSE under the given codebooks: Σ_sub of the
    * min cell distance — the assignment objective, no encode round-trip.
    */
  private def pqObjective(books: Similarity.PQCodebooks): Double = {
    val tab = books.lit
    vecs.select(
      aggregate(sequence(lit(0), lit(books.m - 1)), lit(0.0),
        (acc, s) => acc + array_min(transform(element_at(tab, s + 1),
          c => Similarity.sqDist(slice(col("vec"), s * books.subDim + 1,
            lit(books.subDim)), c)))).as("err"))
      .agg(avg(col("err"))).head().getDouble(0)
  }

  test("pqFit: deterministic, Lloyd iterations improve the quantization objective") {
    val fit0 = Similarity.pqFit(vecs, m = 8, k = 16, dim = 64, iters = 0)
    val fit3 = Similarity.pqFit(vecs, m = 8, k = 16, dim = 64, iters = 3)
    val fit3b = Similarity.pqFit(vecs, m = 8, k = 16, dim = 64, iters = 3)
    assert(fit3.tables == fit3b.tables, "fit must be bit-reproducible (no RNG)")
    val (e0, e3) = (pqObjective(fit0), pqObjective(fit3))
    info(f"PQ quantization MSE: init $e0%.4f -> 3 Lloyd iters $e3%.4f")
    assert(e3 < e0, s"Lloyd must not regress the objective: $e0 -> $e3")
  }

  test("pqEncode: m codes per vector, all in [0, k)") {
    val books = Similarity.pqFit(vecs, m = 8, k = 16, dim = 64, iters = 2)
    val codes = Similarity.pqEncode(vecs, books)
    val bad = codes.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16))
    assert(bad.count() == 0)
  }

  test("PQ ADC shortlist covers the exact L2 top-10 (re-rank pipeline shape)") {
    // m=16 (subDim 4) — these embeddings are near-uniform (PQ's worst
    // case: all neighbors at similar distances), so resolution comes from
    // more, smaller subspaces; still 16x compression (64 floats -> 16
    // byte codes)
    val books = Similarity.pqFit(vecs, m = 16, k = 16, dim = 64, iters = 3)
    val codes = Similarity.pqEncode(vecs, books)
    val queries = vecs.filter(col("id") < 20)
    // exact L2 top-10 (same metric as ADC — cosine truth would conflate
    // metric mismatch with quantization loss)
    val exact = pairs(Relational.topKPerGroup(
      broadcast(queries.select(col("id").as("query_id"), col("vec").as("qv")))
        .join(vecs.select(col("id").as("neighbor_id"), col("vec").as("cv")),
          col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.sqDist(col("qv"), col("cv")).as("d")),
      Seq("query_id"), Seq(col("d").asc, col("neighbor_id").asc), 10))
    // the production shape: ADC shortlists 50 of 500 (10x cut), exact
    // re-rank reads raw vectors for the shortlist only
    val shortlist = pairs(Similarity.pqTopKAdc(queries, codes, books, k = 50))
    val coverage = (exact & shortlist).size.toDouble / exact.size
    val direct = pairs(Similarity.pqTopKAdc(queries, codes, books, k = 10))
    val r10 = (exact & direct).size.toDouble / exact.size
    info(f"PQ (m=16, k=16) ADC: direct recall@10 $r10%.3f, top-10-in-shortlist-50 $coverage%.3f")
    assert(coverage >= 0.7, f"shortlist coverage collapsed: $coverage%.3f")
  }

  test("IVF-PQ ADC: neighbors come from probed cells only, tracks full-corpus ADC, no cartesian") {
    val cent = vecs.filter(col("id") < 16).select(col("id").cast("int").as("cid"), col("vec").as("cvec"))
    val books = Similarity.pqFit(vecs, m = 8, k = 16, dim = 64, iters = 0)
    val queries = vecs.filter(col("id") < 20)
    val ivfpq = Similarity.ivfPqTopKAdc(queries, vecs, cent, books, nCells = 16, nprobe = 2, k = 5)
    val plan = ivfpq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"IVF-PQ candidate generation must be a cell equi-join:\n$plan")
    // codes are computed ON the assigned frame: no corpus-sized id-keyed
    // merge join anywhere (encode-then-join would show as a SortMergeJoin)
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must be scanned once, not encoded separately and re-joined on id:\n$plan")
    val got = pairs(ivfpq)
    // every returned neighbor sits in one of its query's 2 probed cells
    val assigned = Similarity.assignCells(vecs, cent, 16)
      .select(col("id").cast("long"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (_, n) => assert(assigned.contains(n)) }
    // the cell pruning keeps most of what the full-corpus ADC scan finds
    val full = pairs(Similarity.pqTopKAdc(queries, Similarity.pqEncode(vecs, books), books, k = 5))
    val overlap = (full & got).size.toDouble / full.size
    info(f"IVF-PQ (nprobe=2/16) vs full-ADC top-5 overlap = $overlap%.3f")
    assert(overlap >= 0.5, f"cell pruning destroyed the ADC ranking: $overlap%.3f")
  }

  test("semanticDedup: survivor separation law + pair-dominance drops, cell-equi-join plan") {
    val cent = vecs.filter(col("id") < 16).select(col("id").cast("int").as("cid"), col("vec").as("cvec"))
    val t = 0.35
    val out = Similarity.semanticDedup(vecs, cent, nCells = 16, threshold = t).cache()
    try {
      // total preservation: every input id appears exactly once
      assert(out.count() == vecs.count())
      val dropped = out.filter(col("kept") === 0).count()
      info(s"semanticDedup dropped $dropped of ${out.count()} at cos >= $t")
      assert(dropped > 0, "threshold chosen to exercise the drop path — 0 drops is vacuous")
      // separation law: no two SURVIVORS in the same cell within threshold
      // (pair-dominance guarantees this: x<y both kept && cos>=t is a
      // contradiction — x would have dropped y)
      val assigned = Similarity.assignCells(vecs, cent, 16)
      val kept = out.filter(col("kept") === 1).select(col("id"))
        .join(assigned, Seq("id"))
      val violating = kept.select(col("cell"), col("id").as("a"), col("vec").as("va"))
        .join(kept.select(col("cell"), col("id").as("b"), col("vec").as("vb")), Seq("cell"))
        .filter(col("a") < col("b") && Similarity.cosine(col("va"), col("vb")) >= t)
      assert(violating.count() == 0, "two survivors within threshold in one cell")
      // dominance law: every dropped id has an EARLIER same-cell near-dup
      val droppedIds = out.filter(col("kept") === 0).select(col("id"))
        .join(assigned, Seq("id"))
      val witnessed = droppedIds.select(col("cell"), col("id").as("b"), col("vec").as("vb"))
        .join(assigned.select(col("cell"), col("id").as("a"), col("vec").as("va")), Seq("cell"))
        .filter(col("a") < col("b") && Similarity.cosine(col("va"), col("vb")) >= t)
        .select(col("b")).distinct()
      assert(witnessed.count() == dropped, "a dropped id lacks a dominating witness")
      // plan: the pair stage is an equi-join on the cell, never a cartesian;
      // the assignment is materialized once — its three consumers read the
      // checkpoint, so the final plan re-scans NO parquet (the corpus was
      // scanned exactly once, by the checkpoint job)
      val plan = Similarity.semanticDedup(vecs, cent, 16, t)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"within-cell pruning must be a cell equi-join:\n$plan")
      // (vecs is cached in this spec, so re-derivation would surface as
      // InMemoryTableScans of the corpus — with the checkpoint, neither
      // the cache nor parquet is re-read by any of the three consumers)
      assert(!plan.contains("Scan parquet") && !plan.contains("InMemoryTableScan"),
        s"assignment must be materialized once, not re-derived per consumer:\n$plan")
    } finally out.unpersist()
  }

  test("semanticDedup bucketed: bit-equal; pair join reads co-bucketed cells exchange-free") {
    val cent = vecs.filter(col("id") < 16)
      .select(col("id").cast("int").as("cid"), col("vec").as("cvec"))
    val t = 0.35
    // broadcast off: at fixture scale the planner would broadcast the tiny
    // assignment and hide the exchange the bucketing is there to remove —
    // the pin must show the SHUFFLE-join shape a 10⁹-row corpus would get
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val local = Similarity.semanticDedup(vecs, cent, 16, t)
      val bucketed = Similarity.semanticDedup(vecs, cent, 16, t,
        intermediate = graft.ext.Dedup.Intermediate.Bucketed(buckets = 4))
      def cellShuffles(p: String): Int = "hashpartitioning\\(cell#".r.findAllIn(p).length
      val pLocal = local.queryExecution.executedPlan.toString
      val pBucketed = bucketed.queryExecution.executedPlan.toString
      // the lazy-checkpoint baseline shuffles the assignment on cell for
      // both pair-join sides...
      assert(cellShuffles(pLocal) >= 2,
        s"local baseline should shuffle the assignment on cell:\n$pLocal")
      // ...the bucketed write removes every cell-keyed exchange: both
      // join sides read co-bucketed, per-bucket-sorted files
      assert(cellShuffles(pBucketed) == 0,
        s"bucketed assignment must never re-enter a cell-keyed exchange:\n$pBucketed")
      assert(pBucketed.contains("Bucketed: true"),
        s"consumers must scan the bucketed table:\n$pBucketed")
      // and the answer is bit-identical to the unbucketed reference
      assert(bucketed.orderBy("id").collect().toSeq ==
        local.orderBy("id").collect().toSeq)
      assert(graft.ext.Dedup.Intermediate.dropBucketedTables(spark) >= 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("scalar quantization: hand-computed codes, error bound, constant dim") {
    val spark0 = spark
    import spark0.implicits._
    // dim 1 spans [0,1]; dim 2 is constant; dim 3 spans [-2,2]
    val v = Seq(
      (1L, Seq(0.0, 5.0, -2.0)),
      (2L, Seq(0.6, 5.0, 0.0)),
      (3L, Seq(1.0, 5.0, 2.0))
    ).toDF("id", "vec")
    val out = Similarity.scalarQuantize(v, levels = 4)
      .select($"id", $"dim", $"code", $"err_q12")
      .as[(Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out.size == 9)
    // dim 1 (lo=0, hi=1, step=0.25): x=0 → code 0, x̂=0.125, err=0.015625
    assert(out((1L, 1)) == ((0L, 15625000000L)))
    // x=0.6 → floor(0.6·4)=2, x̂=0.625, err=0.000625
    assert(out((2L, 1)) == ((2L, 625000000L)))
    // x=hi → floor(4.0)=4 clamps to 3, x̂=0.875, err=0.015625
    assert(out((3L, 1)) == ((3L, 15625000000L)))
    // constant dim codes 0 with zero error
    assert(Seq(1L, 2L, 3L).forall(id => out((id, 2)) == ((0L, 0L))))
    // every code in range; every error ≤ (step/2)² = (4/8)² = 0.25 on dim 3
    assert(out.values.forall { case (c, _) => c >= 0 && c <= 3 })
    assert(Seq(1L, 2L, 3L).forall(id => out((id, 3))._2 <= 250000000000L))
  }

  test("binary quantization: sign packing, Hamming distance, top-k ranking") {
    val spark0 = spark
    import spark0.implicits._
    // dim 4 → one 32-bit word; bits only where x > 0 (0.0 packs as 0)
    val v = Seq((1L, Seq(1.0, -1.0, 0.0, 0.5))).toDF("id", "vec")
    val packed = v.select(Similarity.signBits($"vec", dim = 4)).as[Seq[Long]].head()
    assert(packed == Seq(9L)) // bit 0 (dim 1) + bit 3 (dim 4) = 1 + 8
    // dim 34 spans two words — dim 33 lands on bit 0 of word 1
    val v2 = Seq((1L, (Seq.fill(32)(-1.0) :+ 1.0) :+ -1.0)).toDF("id", "vec")
    assert(v2.select(Similarity.signBits($"vec", dim = 34)).as[Seq[Long]].head() ==
      Seq(0L, 1L))
    // topK ranks by Hamming with the neighbor-id tiebreak
    val corpus = Seq(
      (0L, Seq(1.0, 1.0, 1.0, 1.0)),   // probe: bits 1111
      (1L, Seq(1.0, 1.0, 1.0, -1.0)),  // hamming 1
      (2L, Seq(1.0, -1.0, -1.0, -1.0)),// hamming 3
      (3L, Seq(1.0, 1.0, 1.0, 1.0))    // hamming 0
    ).toDF("id", "vec")
    val top = Similarity.binaryTopK(corpus.filter($"id" === 0L), corpus, dim = 4, k = 3)
      .select($"neighbor_id", $"hamming", $"rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(top.toSeq == Seq((3L, 0L, 1), (1L, 1L, 2), (2L, 3L, 3)))
  }

  test("hardNegatives: same-label neighbors excluded, ≡ label-filtered brute force") {
    graft.functions.GraftFunctions.register(spark)
    val spark0 = spark
    import spark0.implicits._
    // 30 deterministic 4-d vectors, 3 labels
    val v = (0L until 30L).map { i =>
      (i, Seq((i % 5).toDouble + 1, (i * 7 % 11).toDouble, (i * 3 % 13).toDouble, 1.0),
        (i % 3).toInt)
    }.toDF("id", "vec", "label")
    val probes = v.filter($"id" < 3)
    val hn = Similarity.hardNegatives(probes, v, k = 5).collect()
    val probeLabel = (0L until 3L).map(i => i -> (i % 3).toInt).toMap
    assert(hn.length == 15, "k negatives per probe")
    hn.foreach { r =>
      assert(r.getAs[Int]("neg_label") != probeLabel(r.getAs[Long]("query_id")),
        "a hard negative must never share the probe's label")
    }
    // reference: brute-force top-k then drop same-label rows and re-rank
    val bf = Similarity.bruteForceTopK(probes, v, k = 30).collect()
      .filter(r => probeLabel(r.getAs[Long]("query_id")) !=
        (r.getAs[Long]("neighbor_id") % 3).toInt)
      .groupBy(_.getAs[Long]("query_id"))
      .toSeq
      .flatMap { case (_, rs) => rs.sortBy(_.getAs[Int]("rank")).take(5).toSeq }
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(hn.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet == bf)
  }

  test("mmrRerank: diversification beats the near-duplicate, ties break on id") {
    import spark.implicits._
    val s = math.sqrt(0.19)
    // a and b are identical directions (sim 1, both rel 0.9); c mirrors a
    // across the query axis (rel 0.9, sim(a,c) = 0.81 − 0.19 = 0.62).
    // Plain top-3 is [1, 2, 3]; MMR must demote the duplicate: [1, 3, 2].
    val corpus = Seq(
      (1L, Seq(0.9, s)), (2L, Seq(0.9, s)), (3L, Seq(0.9, -s))
    ).toDF("id", "vec")
    val q = Seq((100L, Seq(1.0, 0.0))).toDF("id", "vec")
    val got = Similarity.mmrRerank(q, corpus, shortlistK = 3, k = 3, lambda = 0.5)
      .orderBy("rank").as[(Long, Int, Long)].collect()
    assert(got.toSeq == Seq((100L, 1, 1L), (100L, 2, 3L), (100L, 3, 2L)))
  }

  test("mmrRerank: rank 1 is always the pure top-1; k caps at the shortlist") {
    import spark.implicits._
    val corpus = (1L to 8L)
      .map(i => (i, Seq(1.0 / i, math.sqrt(1.0 - 1.0 / (i * i)))))
      .toDF("id", "vec")
    val q = Seq((0L, Seq(1.0, 0.0))).toDF("id", "vec")
    val got = Similarity.mmrRerank(q, corpus, shortlistK = 4, k = 10, lambda = 0.5)
      .orderBy("rank").as[(Long, Int, Long)].collect()
    assert(got.length == 4) // k > shortlist ⇒ everything picked once
    assert(got.head == ((0L, 1, 1L))) // empty picked set ⇒ argmax rel
    assert(got.map(_._3).distinct.length == 4)
  }

  test("centroidOutliers: the planted off-cluster vector carries the max distance") {
    import spark.implicits._
    // label 0 clusters at (1, 0) with one planted outlier at (9, 0);
    // label 1 sits far away at (−5, 5) — per-label centroids mean the
    // outlier is judged against ITS OWN cluster, not the global mean
    val d = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(1.0f, 0.0f)), (3L, 0, Seq(1.0f, 0.0f)),
      (4L, 0, Seq(9.0f, 0.0f)),
      (5L, 1, Seq(-5.0f, 5.0f)), (6L, 1, Seq(-5.0f, 5.0f))
    ).toDF("id", "label", "vec")
    val got = Similarity.centroidOutliers(d, "id", "vec", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // label-0 centroid = (3, 0): outlier dist² = 36, cluster members 4
    assert(math.abs(got(4L) - 36.0) < 1e-6, s"outlier: ${got(4L)}")
    Seq(1L, 2L, 3L).foreach(i => assert(math.abs(got(i) - 4.0) < 1e-6))
    // label-1 members sit ON their centroid
    assert(got(5L) < 1e-9 && got(6L) < 1e-9)
    assert(got.maxBy(_._2)._1 == 4L)
  }

  test("pcaPowerProjections recovers the dominant axis of rank-1 data") {
    import spark.implicits._
    // points t·(1, 2) — covariance is rank 1 with PC1 ∝ (1, 2)/√5, so the
    // centered |projection| must be |t − mean(t)|·√5 up to the 1e-3
    // quantization of the integer moments
    val ts = Seq(-2.0, -1.0, 0.0, 1.0, 3.0)
    val meanT = ts.sum / ts.length
    val df = ts.zipWithIndex
      .map { case (t, i) => (i.toLong, Seq(t.toFloat, (2 * t).toFloat)) }
      .toDF("id", "vec")
    val got = Similarity.pcaPowerProjections(df, "id", "vec", dim = 2, iters = 20)
      .orderBy("id").as[(Long, Double)].collect()
    ts.zipWithIndex.foreach { case (t, i) =>
      val expected = math.abs(t - meanT) * math.sqrt(5.0)
      assert(math.abs(got(i)._2 - expected) < 0.01,
        s"id $i: got ${got(i)._2}, expected $expected")
    }
  }

  test("q_ivf_nprobe_sweep: recall is monotone in the probe budget") {
    val rows = graft.SparkEntry.queries("q_ivf_nprobe_sweep")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // truth set is 10 queries × top-5 at every budget
    assert(rows.forall(_._2 == 50L))
    // probing MORE cells can only add candidates — hits never decrease
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 >= a._3, s"nprobe=${b._1} lost hits")
      case _ =>
    }
    rows.foreach { case (np, t, h, q6) =>
      assert(h >= 0 && h <= t)
      assert(q6 == h * 1000000L / t, s"nprobe=$np")
    }
    // the sweep must show an actual tradeoff on the fixture: nprobe=1
    // misses something, nprobe=4 recovers ground
    assert(rows.head._3 < rows.last._3)
  }
}
