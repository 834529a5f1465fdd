package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`array<float>`) —
  * north-star EXT for training-data pipelines.
  *
  * Scale design:
  *  - Brute-force top-k broadcasts the (small) query set and scans the
  *    corpus ONCE — a BroadcastNestedLoopJoin-free equi-less pattern where
  *    the 100 TB side never shuffles; ranking happens per query id on the
  *    (|queries| × |corpus|) scored rows, aggregated down before any sort.
  *  - The ANN path buckets vectors by random-hyperplane LSH sign bits
  *    (deterministic integer hyperplanes derived from md5, so the whole
  *    operator — bucketing included — is oracle-reproducible). Candidates
  *    come from an equi-join on the bucket id: corpus-size-linear, and the
  *    bucket id is a plain column, so it composes with partitioning /
  *    bucketed writes for repeated query workloads.
  *  - All float arithmetic is widened to double FIRST and folded in a fixed
  *    left-to-right order (both engines), so scores are bit-identical and
  *    rankings engine-independent.
  */
object Similarity {

  /** 60-bit md5 hash of a string, computed driver-side (plan constants). */
  def md5LongScala(s: String): Long = {
    val hex = MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_))
      .mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic integer hyperplanes: `planes` × `dim` weights in
    * [-1000, 1000], derived from md5("seed-p-i"). Integer weights make the
    * dot-product sign exactly reproducible in any engine. Distinct seeds give
    * statistically independent tables for multi-table LSH.
    */
  def hyperplanes(planes: Int, dim: Int, seed: String = "plane"): Array[Array[Long]] =
    Array.tabulate(planes, dim)((p, i) => md5LongScala(s"$seed-$p-$i") % 2001L - 1000L)

  /** Embedding column widened to `array<double>` (do this once, up front —
    * float×int arithmetic differs across engines; double math does not).
    */
  def asDouble(emb: Column): Column = transform(emb, x => x.cast("double"))

  /** Left-to-right fold sum — the canonical order mirrored by the oracle. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product via the native codegen'd [[graft.functions.DotProductD]]
    * expression (register with `GraftFunctions.register(spark)` first; the
    * declared queries do). Same left-fold order as [[dotFold]] — scores
    * stay bit-identical, the loop stays inside WholeStageCodegen instead of
    * falling back to interpreted HOF lambdas.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** HOF-fold reference implementation of [[dot]] (no registration needed). */
  def dotFold(a: Column, b: Column): Column = foldSum(zip_with(a, b, (x, y) => x * y))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-traversal cosine ([[graft.functions.CosineSimD]]) — one
    * loop keeps all three accumulators, bit-identical to
    * `dot(a,b)/(norm(a)*norm(b))` (same per-accumulator fold order), 3×
    * less array traffic on the candidate re-rank hot paths.
    */
  def cosine(a: Column, b: Column): Column = call_function("graft_cos", a, b)

  /** Composed reference form of [[cosine]] (three dots; kept for tests). */
  def cosineComposed(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** LSH bucket id: `planes` sign bits of integer-hyperplane dot products.
    * Each per-plane dot is ONE `graft_dot(v, <literal weight array>)` call —
    * the weights ride along as a plan constant and the loop runs inside
    * WholeStageCodegen. (An earlier revision unrolled 64-term literal sums
    * per plane; the resulting 256-term trees cost seconds of constant
    * planning/codegen time per query. `graft_dot`'s left-fold from 0.0 is
    * bit-identical to the unrolled left-to-right sum, so bucket ids — and
    * every downstream hash — are unchanged.)
    */
  def lshBucket(vDouble: Column, planes: Array[Array[Long]]): Column =
    planes.zipWithIndex
      .map { case (w, p) =>
        val d = dot(vDouble, typedLit(w.map(_.toDouble).toSeq))
        when(d > 0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** Drop undefined similarities before any ranking: a zero-norm embedding
    * (failed embedding job, padding row — routine at corpus scale) scores
    * NaN, and Spark orders NaN LARGER than every double, so an unfiltered
    * NaN would silently rank #1 for every query that reaches it.
    */
  private def dropNaN(scored: DataFrame): DataFrame = scored.filter(!isnan(col("cos")))

  /** Exact brute-force cosine top-k: broadcast the query set, scan the
    * corpus once, rank per query. `queries`/`corpus`: (id, vec double[]).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(queries.select(col("id").as("query_id"), col("vec").as("qv")))
      .join(corpus.select(col("id").as("neighbor_id"), col("vec").as("cv")),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    Relational
      .topKPerGroup(dropNaN(scored), Seq("query_id"),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
  }

  /** Semantic decontamination — flag corpus vectors whose cosine to ANY
    * benchmark probe reaches `threshold`: the embedding-space complement of
    * the n-gram [[Dedup.contamination]] (catches paraphrased benchmark
    * leakage that shingle overlap misses). Probes arrive as a driver-side
    * literal by contract — benchmark suites are thousands of vectors, the
    * PQ-codebook precedent — so the scan is MAP-ONLY: per corpus row,
    * `greatest` over per-probe (cos, probe_id) structs computes the argmax
    * inside whole-stage codegen with zero shuffle, zero join, and the
    * corpus read once. At a probe set too large for plan literals, the
    * same semantics fall back to a broadcast join + per-id max — still one
    * corpus scan. NaN cosines (zero-norm corpus rows) are dropped before
    * the threshold test — Spark AND DuckDB both order NaN above every
    * double, so an unguarded `>=` would flag them.
    *
    * Returns (id, probe_id, cos) for flagged rows only: the nearest probe
    * (ties → larger probe_id, the struct order) and its score.
    */
  def contaminationByEmbedding(
      corpus: DataFrame,
      probes: Seq[(Long, Seq[Double])],
      threshold: Double): DataFrame = {
    require(probes.size >= 2, "need ≥2 probes (greatest arity); union trivial sets upstream")
    // nanvl per probe, BEFORE greatest(): struct ordering ranks NaN above
    // every double, so one zero-norm PROBE would otherwise become every
    // row's "best" and the isnan guard would drop the whole corpus — with
    // -inf the bad probe simply never wins and valid probes still flag.
    val scored = probes.map { case (pid, pv) =>
      struct(nanvl(cosine(col("vec"), typedLit(pv)), lit(Double.NegativeInfinity)).as("cos"),
        lit(pid).as("probe_id"))
    }
    corpus
      .withColumn("best", greatest(scored: _*))
      .filter(!isnan(col("best.cos")) && col("best.cos") >= threshold)
      .select(col("id"), col("best.probe_id").as("probe_id"), col("best.cos").as("cos"))
  }

  /** Hard-negative mining for contrastive training: per probe, the top-k
    * most-similar corpus vectors with a DIFFERENT label — the "hard"
    * negatives that dominate the InfoNCE gradient (a random negative is
    * trivially far; the near-miss with the wrong label is the informative
    * one). Same plan as [[bruteForceTopK]] — probe set broadcast, one
    * corpus scan, per-probe WindowGroupLimit rank — with the label
    * mismatch as a join residual on broadcast-attached columns; at corpus
    * scale the first-stage shortlist swaps to [[annTopKMulti]]/
    * [[ivfPqTopKAdc]] and this exact ranking runs on the shortlist (the
    * [[rerankExact]] composition). Both frames need (id, vec, label).
    */
  def hardNegatives(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(
      probes.select(col("id").as("query_id"), col("vec").as("qv"), col("label").as("ql")))
      .join(corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"),
        col("label").as("nl")),
        col("query_id") =!= col("neighbor_id") && col("ql") =!= col("nl"))
      .select(col("query_id"), col("neighbor_id"), col("nl").as("neg_label"),
        cosine(col("qv"), col("cv")).as("cos"))
    Relational
      .topKPerGroup(dropNaN(scored), Seq("query_id"),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
  }

  /** One retrieval shortlist entry inside [[mmrRerank]]'s per-query group. */
  private[ext] case class MmrCand(cand_id: Long, rel: Double)

  /** One candidate-candidate similarity inside [[mmrRerank]]'s group. */
  private[ext] case class MmrSim(ia: Long, ib: Long, sim: Double)

  /** A query's complete MMR state: shortlist + pairwise sims. */
  private[ext] case class MmrGroup(query_id: Long, cands: Seq[MmrCand], sims: Seq[MmrSim])

  /** One diversified pick: `cand_id` selected at 1-based `rank`. */
  private[ext] case class MmrPick(query_id: Long, rank: Int, cand_id: Long)

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR '98)
    * — the diversification stage RAG retrieval runs after top-k: greedily
    * pick argmax of `λ·rel(c) − (1−λ)·max_{p∈picked} sim(c, p)` so the
    * final k trade relevance against redundancy (plain top-k returns k
    * near-copies of the best hit; MMR spends the budget on coverage).
    *
    * Plan: [[bruteForceTopK]] shortlist (at corpus scale the shortlist
    * stage swaps to [[annTopKMulti]]/[[ivfPqTopKAdc]] — MMR only ever sees
    * `shortlistK` rows per query) → candidate vectors re-attached by a
    * broadcast semi-join (the corpus scans once; only shortlist rows
    * survive) → shortlist² pairwise sims per query (bounded: shortlistK²
    * rows, query-keyed) → per-query greedy in ONE `flatMap` over grouped
    * rows. The greedy loop is genuinely sequential in k, so it runs as
    * bounded per-key executor logic — the [[graft.streaming.StatefulOps]]
    * pattern, not a driver loop; queries parallelize freely.
    *
    * Determinism: rel and sim are the same left-fold [[cosine]] doubles
    * the oracle computes; the marginal is two IEEE mults + one sub in the
    * same order; ties break on smaller cand_id. Bit-reproducible.
    */
  def mmrRerank(
      queries: DataFrame,
      corpus: DataFrame,
      shortlistK: Int,
      k: Int,
      lambda: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // self-contained: `cosine` resolves graft_cos by name — register here
    // rather than relying on a caller having touched the registry first
    graft.functions.GraftFunctions.register(spark)
    val short = bruteForceTopK(queries, corpus, shortlistK)
      .select(col("query_id"), col("neighbor_id").as("cand_id"), col("cos").as("rel"))
    val withVec = broadcast(short)
      .join(corpus.select(col("id").as("cand_id"), col("vec")), Seq("cand_id"))
    val a = withVec.select(col("query_id"), col("cand_id").as("ia"), col("vec").as("va"))
    val b = withVec.select(col("query_id").as("qb"), col("cand_id").as("ib"), col("vec").as("vb"))
    val pairs = a
      .join(b, col("query_id") === col("qb") && col("ia") =!= col("ib"))
      .select(col("query_id"), col("ia"), col("ib"), cosine(col("va"), col("vb")).as("sim"))
    val grouped = short
      .groupBy("query_id")
      .agg(collect_list(struct(col("cand_id"), col("rel"))).as("cands"))
      .join(
        pairs.groupBy("query_id")
          .agg(collect_list(struct(col("ia"), col("ib"), col("sim"))).as("sims")),
        Seq("query_id"))
    grouped.as[MmrGroup].flatMap { g =>
      val simOf = g.sims.map(s => (s.ia, s.ib) -> s.sim).toMap
      val ordered = g.cands.sortBy(_.cand_id)
      val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (picked.size < k && picked.size < ordered.size) {
        var best: MmrCand = null
        var bestM = Double.NegativeInfinity
        for (c <- ordered if !picked.contains(c.cand_id)) {
          val maxSim =
            if (picked.isEmpty) 0.0
            else picked.map(p => simOf((c.cand_id, p))).max
          val m = lambda * c.rel - (1 - lambda) * maxSim
          if (m > bestM) { bestM = m; best = c } // ascending scan ⇒ ties keep smaller id
        }
        picked += best.cand_id
      }
      picked.zipWithIndex.map { case (id, i) => MmrPick(g.query_id, i + 1, id) }
    }.toDF()
  }

  /** Embedding near-duplicate pairs: candidates share an LSH bucket or sit
    * one sign-bit apart (Hamming-1 probe via the smaller-id side), exact
    * cosine ≥ threshold re-check. Corpus-linear like [[annTopK]]; recall
    * follows the same multi-probe characteristics (full recall only for
    * pairs within one sign flip — the standard LSH near-dup trade).
    *
    * SIZING RULE (measured: a fixed 4-plane table went 18.9× slower for
    * 10× vectors): within-bucket candidate pairs grow with
    * (corpus / 2^planes)², so the caller must scale planes ≈
    * log₂(corpus / targetBucketSize) to hold per-bucket occupancy — and
    * therefore total candidate volume — linear in the corpus. Planes are
    * a parameter precisely so the bucket count can grow with the data.
    */
  def cosineNearDupPairs(
      corpus: DataFrame,
      planes: Array[Array[Long]],
      threshold: Double): DataFrame =
    nearDupCandidates(corpus, planes)
      .select(col("x.id").as("a"), col("y.id").as("b"),
        cosine(col("x.vec"), col("y.vec")).as("cos"))
      // NaN explicitly excluded: Spark evaluates NaN >= threshold as TRUE
      // (NaN sorts above every double), so zero-norm pairs would otherwise
      // pass the similarity gate
      .filter(!isnan(col("cos")) && col("cos") >= threshold)
      .distinct()

  /** The bucket+probe candidate join behind [[cosineNearDupPairs]] — the
    * volume the sizing rule must hold corpus-linear.
    */
  private def nearDupCandidates(corpus: DataFrame, planes: Array[Array[Long]]): DataFrame = {
    val b = corpus.select(col("id"), col("vec"), lshBucket(col("vec"), planes).as("bucket"))
    val masks = 0L +: (0 until planes.length).map(1L << _)
    // probe-expand the smaller-id side only: pair (a,b) is found once via
    // a's probe ring reaching b's bucket (covers distance 0 and 1).
    val probed = b.select(col("id"), col("vec"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    probed
      .as("x")
      .hint("merge")
      .join(b.as("y").hint("merge"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
  }

  /** Pre-re-check candidate-pair count for [[cosineNearDupPairs]] under
    * `planes` — the observable the sizing rule governs (exact-cosine work
    * is proportional to it). Exposed for capacity tests and sizing audits.
    */
  def nearDupCandidateCount(corpus: DataFrame, planes: Array[Array[Long]]): Long =
    nearDupCandidates(corpus, planes).count()

  /** Plane count that holds near-dup candidate volume linear in the corpus:
    * `ceil(log2(corpusCount / targetBucketSize))`, clamped to [1, 62].
    * Within-bucket pairs grow with (corpus / 2^planes)² — measured 18.9×
    * cost for 10× vectors at a FIXED 4 planes — so the bucket count must
    * track the corpus and per-bucket occupancy stay ≈ `targetBucketSize`.
    * Recall is unaffected: the Hamming-1 probe ring widens with the plane
    * count (probes = planes + 1), and the exact-cosine re-check is the
    * correctness gate either way.
    */
  def planesFor(corpusCount: Long, targetBucketSize: Long = 64): Int = {
    require(targetBucketSize > 0, "targetBucketSize must be positive")
    val buckets = math.max(1.0, corpusCount.toDouble / targetBucketSize)
    math.min(62, math.max(1, math.ceil(math.log(buckets) / math.log(2.0)).toInt))
  }

  /** [[planesFor]] in pure INTEGER arithmetic: the smallest p in [1, 62]
    * with targetBucketSize·2^p ≥ corpusCount. Same value as [[planesFor]]
    * everywhere the float log is well-behaved, but with NO dependence on
    * log/ceil rounding at power-of-two boundaries — which is what lets a
    * DuckDB oracle reproduce the sizing bit-for-bit from its own count(*)
    * (`min(p) FROM generate_series WHERE target * (1 << p) >= n`), making
    * the SIZED LSH graph builder hash-checkable at any scale factor from
    * one static SQL string (the self-sizing oracle in [[GraphQueries]]).
    */
  def planesForExact(corpusCount: Long, targetBucketSize: Long = 64): Int = {
    require(targetBucketSize > 0, "targetBucketSize must be positive")
    var p = 1
    while (p < 62 && targetBucketSize * (1L << p) < corpusCount) p += 1
    p
  }

  /** Self-sizing coarse-cell count for [[semanticDedup]]: the smallest k
    * with k·k ≥ corpusCount (= ⌈√N⌉ — the SemDeDup operating point where
    * expected cell size ≈ cell count, so total within-cell pairwise work
    * is O(N·√N) instead of the fixed-k O(N²/k)). Pure INTEGER arithmetic
    * for the same reason as [[planesForExact]]: a static DuckDB oracle
    * re-derives it from its own count(*)
    * (`min(kk) FROM generate_series WHERE kk*kk >= n`), so the sized
    * dedup is hash-checkable at ANY scale factor from one SQL string.
    * The float sqrt only seeds the search; the result is exact.
    */
  def cellsForExact(corpusCount: Long): Int = {
    require(corpusCount >= 1, "corpus must be non-empty")
    var k = math.max(1L, math.sqrt(corpusCount.toDouble).toLong)
    while (k > 1 && (k - 1) * (k - 1) >= corpusCount) k -= 1
    while (k * k < corpusCount) k += 1
    k.toInt
  }

  /** ANN top-k with Hamming-1 multi-probe: the corpus is bucketed once; each
    * query probes its own bucket plus every bucket one sign-bit away
    * (`planes`+1 probes). Multi-probe recovers most of the recall lost to
    * boundary-crossing sign flips while candidates stay corpus-linear —
    * the standard LSH trade (probe count × bucket size, not O(n²)).
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, planes: Array[Array[Long]], k: Int)
      : DataFrame = annTopKMulti(queries, corpus, Seq(planes), k)

  /** Multi-table ANN top-k: `tables.length` independent LSH tables, each
    * with Hamming-1 multi-probe; candidate sets are unioned, deduped, and
    * re-ranked by exact cosine. A neighbor is missed only if it hashes > 1
    * sign-bit away from the query in EVERY table, so recall compounds as
    * 1-(1-r)^L while cost stays corpus-linear: the corpus is scanned once
    * and exploded ×L (one (table, bucket) row per table), the query side is
    * broadcast, and the join is an equi-join on (table, bucket).
    */
  def annTopKMulti(
      queries: DataFrame,
      corpus: DataFrame,
      tables: Seq[Array[Array[Long]]],
      k: Int): DataFrame =
    annTopKFromIndex(queries, lshIndexFrame(corpus, tables), tables, k)

  /** The `(neighbor_id, cv, t, bucket)` LSH index frame of `corpus` under
    * `tables` — [[annTopKMulti]]'s build side, exposed so it can be
    * PERSISTED (index-once / probe-many, the production vector-search
    * lifecycle): at corpus scale the per-vector plane dots (L tables × P
    * planes × dim mul-adds each) are the dominant map-side cost of every
    * probe batch, and a stored index pays them exactly once. Pass the
    * result through an [[graft.ext.Dedup.Intermediate]] and feed
    * [[annTopKFromIndex]]. Storage layout note: a BROADCAST probe batch
    * (the common small-query case) reads any layout exchange-free, so
    * bucketing buys it nothing; persisting Bucketed keyed by "t,bucket"
    * (BOTH join columns — Spark's co-partition check only elides the
    * exchange when join keys exactly match the bucket spec) pays off
    * when a probe batch is too large to broadcast: the join falls back
    * to SortMergeJoin on (t, bucket) and the INDEX side still reads
    * without an exchange (spec-pinned both ways in SimilaritySpec).
    */
  def lshIndexFrame(corpus: DataFrame, tables: Seq[Array[Array[Long]]]): DataFrame =
    corpus
      .select(col("id").as("neighbor_id"), col("vec").as("cv"),
        explode(array(tables.zipWithIndex.map { case (planes, t) =>
          struct(lit(t).as("t"), lshBucket(col("vec"), planes).as("bucket"))
        }: _*)).as("tb"))
      .select(col("neighbor_id"), col("cv"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))

  /** Probe a (possibly persisted) [[lshIndexFrame]]: the query side is
    * bucketed with the SAME plane tables the index was built with (the
    * caller's contract), probe-expanded Hamming-1, broadcast into the
    * equi-join — the index side never shuffles.
    */
  def annTopKFromIndex(
      queries: DataFrame,
      index: DataFrame,
      tables: Seq[Array[Array[Long]]],
      k: Int,
      broadcastProbes: Boolean = true): DataFrame = {
    val cb = index
    // Each table's query bucket is computed ONCE, then probe-expanded with
    // cheap XORs. Inlining the bucket into all (planes+1) mask structs (what
    // CollapseProject would do to a single select) multiplies the generated
    // code ×(planes+1) — measured +1.2 s of one-time codegen at L=3. The
    // localCheckpoint is a barrier on the query side only, which is
    // broadcast-sized by definition.
    val qbuckets = queries
      .select(col("id").as("query_id") +: col("vec").as("qv") +:
        tables.zipWithIndex.map { case (planes, t) =>
          lshBucket(col("vec"), planes).as(s"qb$t")
        }: _*)
      .localCheckpoint()
    val probeRing = qbuckets
      .select(col("query_id"), col("qv"),
        explode(array(tables.zipWithIndex.flatMap { case (planes, t) =>
          val masks = 0L +: planes.indices.map(1L << _)
          masks.map(m =>
            struct(lit(t).as("t"), col(s"qb$t").bitwiseXOR(lit(m)).as("bucket")))
        }: _*)).as("tb"))
      .select(col("query_id"), col("qv"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    // small probe batches broadcast (index side reads ANY layout without
    // an exchange); batches too large to broadcast take the merge join —
    // a Bucketed-by-"bucket" stored index then STILL reads exchange-free,
    // because HashPartitioning(bucket) satisfies the (t, bucket)
    // clustering (spec-pinned both ways)
    val qb = if (broadcastProbes) broadcast(probeRing) else probeRing.hint("merge")
    val scored = qb
      .join(cb, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    // Duplicate candidates (several tables/probes) carry bit-identical
    // cos → DENSE rank-then-dedup ([[Relational.topKPerGroupDense]], the
    // [[graft.ext.Graph.knnEdgesLsh]] ×100 lesson: 237 → 60 s vs the
    // distinct-first form); here the probe side bounds candidates, but
    // the same shape keeps the corpus-sized candidate frame out of any
    // full exchange when the query set is large.
    Relational
      .topKPerGroupDense(dropNaN(scored), Seq("query_id"),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .distinct()
  }

  /** Spherical k-means (Lloyd) fit for the IVF coarse quantizer — the
    * offline step [[ivfTopK]]'s docs reference, run ON the engine.
    *
    * Per iteration, ONE pass over the corpus: assignment is a per-row
    * argmax of cosine against the k current centroids (k codegen'd
    * `graft_cos` calls against literal arrays — no join, no shuffle for
    * assignment), feeding directly into a hash aggregation that
    * accumulates per-cell, per-dimension sums as `dim` sum columns +
    * count (partial+final; the shuffle carries k × (dim+1) numbers per
    * map task, never vectors). The driver holds only the k×dim centroid
    * matrix — the model — between iterations; there is no per-row
    * driver-side work and no explode of the vector column.
    *
    * Assignment argmax breaks ties on the lowest cell id; empty cells
    * keep their previous centroid. Centroids are L2-normalized after
    * each update (spherical k-means), matching the cosine assignment
    * metric. Deterministic end-to-end: init = the k lowest-id corpus
    * vectors, no RNG anywhere — a retried fit reproduces bit-identical
    * centroids.
    */
  def kmeansFit(
      corpus: DataFrame,
      k: Int,
      dim: Int,
      iters: Int): Array[Array[Double]] = {
    require(k > 0 && iters >= 0, "k must be positive and iters non-negative")
    var centroids: Array[Array[Double]] = corpus
      .orderBy("id")
      .limit(k)
      .select(col("vec"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(centroids.length == k, s"corpus has fewer than k=$k vectors")
    (0 until iters).foreach { _ =>
      val cell = argmaxCell(col("vec"), centroids)
      val aggs = (0 until dim).map(i =>
        sum(element_at(col("vec"), i + 1)).as(s"s$i")) :+ count(lit(1)).as("n")
      val stats = corpus
        .select(col("vec"), cell.as("cell"))
        .groupBy("cell")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        val c = r.getAs[Int]("cell")
        val n = r.getAs[Long]("n").toDouble
        val mean = Array.tabulate(dim)(i => r.getAs[Double](s"s$i") / n)
        val nrm = math.sqrt(mean.map(x => x * x).sum)
        if (nrm > 0) next(c) = mean.map(_ / nrm)
      }
      centroids = next
    }
    centroids
  }

  /** Per-row argmax-cosine cell id over literal centroids (first-wins on
    * ties — deterministic, mirrors [[graft.ext.TextOps.langId]]).
    */
  def argmaxCell(vec: Column, centroids: Array[Array[Double]]): Column = {
    val scores = centroids.zipWithIndex.map { case (c, i) =>
      (cosine(vec, typedLit(c.toSeq)), i)
    }
    val maxS = greatest(scores.map(_._1): _*)
    scores.reverse.foldLeft(lit(0)) { case (acc, (s, i)) =>
      when(s === maxS, lit(i)).otherwise(acc)
    }
  }

  /** Centroid matrix → the (cid, cvec) frame [[ivfTopK]] consumes. */
  def centroidsDF(spark: org.apache.spark.sql.SparkSession, centroids: Array[Array[Double]])
      : DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toSeq
      .toDF("cid", "cvec")
  }

  /** IVF-style ANN: the corpus is partitioned into `nCells` cells by
    * nearest coarse centroid; each query probes its `nprobe` nearest cells
    * and candidates are exactly re-ranked.
    *
    * The coarse quantizer is whatever `centroids` (cid ∈ [0, nCells),
    * cvec) holds — the declared query samples the first corpus vectors,
    * which keeps the whole operator (assignment included) bit-reproducible
    * in the oracle; a production run fits k-means|| offline and swaps the
    * fitted table in without touching any plan shape here.
    *
    * Scale: assignment is the MAP-ONLY [[assignCells]] literal-centroid
    * arg-top-n (the |corpus|·nCells scoring cost runs inside the corpus
    * scan — no explode, no exchange), the cell is a plain column that
    * composes with partitioning/bucketed writes for repeated query
    * workloads, and candidate generation is an equi-join on the cell —
    * corpus-linear, recall controlled by nprobe/nCells.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame,
      nCells: Int,
      nprobe: Int,
      k: Int): DataFrame = {
    def nearestCells(side: DataFrame, idAs: String, vecAs: String, n: Int): DataFrame =
      assignCells(side, centroids, nCells, n)
        .select(col("id").as(idAs), col("vec").as(vecAs), col("cell"))
    val cb = nearestCells(corpus, "neighbor_id", "cv", 1)
    val qb = broadcast(nearestCells(queries, "query_id", "qv", nprobe))
    val scored = qb
      .join(cb, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // NO distinct here, deliberately: each corpus vector lives in exactly
      // one cell (rank-1 assignment) and a query's nprobe cells are
      // distinct, so a (query, neighbor) pair arises at most once — a
      // dedup would only add an exchange over every candidate
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    Relational
      .topKPerGroup(dropNaN(scored), Seq("query_id"),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
  }

  /** Centroid frame collected to driver-side literals: (cid, cvec) pairs
    * plus the cid column's type (preserved so the emitted `cell` column —
    * and every downstream join key and oracle hash — keeps its type).
    * Driver-sized by construction: k×(dim+1) numbers, same budget as
    * [[kmeansFit]]'s own centroid state.
    */
  private def collectCentroids(centroids: DataFrame)
      : (Array[(Long, Array[Double])], org.apache.spark.sql.types.DataType) = {
    val cidType = centroids.schema("cid").dataType
    val pairs = centroids
      .select(col("cid").cast("long"), col("cvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    (pairs, cidType)
  }

  /** Map-only arg-top-n over literal centroids: an array of the `n`
    * nearest cids by cosine (ties → lowest cid), computed per row with
    * ZERO exchanges — k codegen'd [[cosine]] calls against plan-constant
    * weights, one k-element `array_sort`, one slice. NaN scores order
    * exactly as the window form did (Spark comparisons treat NaN as
    * greater than every double, matching desc-NULLS-style NaN-first).
    * Generalizes [[argmaxCell]] (n = 1) to the probe-set case.
    */
  private def nearestCellsExpr(
      vec: Column,
      cents: Array[(Long, Array[Double])],
      cidType: org.apache.spark.sql.types.DataType,
      n: Int): Column = {
    val scored = cents.map { case (cid, cvec) =>
      struct(cosine(vec, typedLit(cvec.toSeq)).as("ccos"),
        lit(cid).cast(cidType).as("cid"))
    }
    val sorted = array_sort(array(scored.toIndexedSeq: _*), (l, r) =>
      when(l("ccos") > r("ccos"), lit(-1))
        .when(l("ccos") < r("ccos"), lit(1))
        .when(l("cid") < r("cid"), lit(-1))
        .when(l("cid") > r("cid"), lit(1))
        .otherwise(lit(0)))
    transform(slice(sorted, 1, n), s => s("cid"))
  }

  /** Nearest-cell assignment: every vector mapped to its `n` nearest
    * coarse centroids by cosine (ties → lowest cid); n = 1 is the rank-1
    * corpus assignment, n = nprobe is the query-side probe set. Exposed
    * standalone because cluster-scoped operators ([[semanticDedup]],
    * [[ivfPqTopKAdc]]) need the assignment without the query path.
    *
    * MAP-ONLY: centroids always fit the driver (k×dim doubles — they are
    * literally the k-means state), so assignment is [[nearestCellsExpr]]
    * against plan constants: no explode×nCells, no broadcast join, no
    * window — the corpus is scanned once and never exchanged. (The
    * previous form explode'd every vector × nCells and ranked with a
    * window partitioned by id — a corpus-sized exchange that pure
    * per-row argmax never needed.) n > 1 adds only a generator (explode
    * of an n-element array), still exchange-free.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame, nCells: Int, n: Int = 1)
      : DataFrame = {
    val (cents, cidType) = collectCentroids(centroids)
    require(cents.length == nCells,
      s"centroid frame has ${cents.length} rows, expected nCells=$nCells")
    if (n == 1) {
      // rank-1 assignment is a NATIVE fused argmax ([[graft.functions
      // .ArgmaxCosD]]): the sorted-struct form below built a k-struct
      // array per row and array_sort-ed it with an interpreted lambda
      // comparator — at the k ≈ √N SemDeDup operating point that was
      // ~all of q_semantic_dedup_auto's ×100 wall (112 s at k = 448).
      // The argmax index maps back to the cid through a literal lookup
      // (cents are cid-sorted, so lowest-index ties ≡ lowest-cid ties);
      // results are bit-identical (ArgmaxCosD scaladoc) and the oracles
      // unchanged.
      graft.functions.GraftFunctions.register(corpus.sparkSession) // idempotent
      val matrix = typedLit(cents.map(_._2.toSeq).toSeq)
      val cids = typedLit(cents.map(_._1).toSeq)
      val cell = element_at(cids,
        call_function("graft_argmax_cos", col("vec"), matrix) + 1).cast(cidType)
      corpus.select(col("id"), col("vec"), cell.as("cell"))
    } else {
      val cells = nearestCellsExpr(col("vec"), cents, cidType, n)
      corpus.select(col("id"), col("vec"), explode(cells).as("cell"))
    }
  }

  /** Cluster-scoped semantic dedup (the SemDeDup shape — Abbas et al.,
    * arXiv:2303.09540; independent Spark formulation): vectors are
    * assigned to their nearest coarse centroid, and near-duplicate pruning
    * runs ONLY within a cell, so the quadratic term is bounded by the
    * largest cell — never the corpus. Drop rule is pair-dominance: a
    * vector is dropped iff some earlier (lower-id) vector in its cell has
    * cosine ≥ threshold with it. One pass, no iteration, deterministic;
    * it guarantees no two survivors in a cell are within threshold (if
    * x < y both survived with cos ≥ t, x would have dropped y).
    *
    * Returns (id, cell, kept 1|0) for every input vector.
    *
    * Scale: assignment is the corpus-linear [[assignCells]] shape; the
    * pair join is an equi-join on the cell id (shuffle key = cell,
    * bucketable for repeated curation runs). With k ≈ √N cells of bounded
    * size — the SemDeDup operating point — total pairwise work is O(N·c)
    * for cell size c, and a skewed giant cell is the signal to refit with
    * larger k, not a plan problem.
    *
    * The assignment is materialized ONCE via `intermediate` (three
    * consumers read it: both pair-join sides and the final keep
    * mark-up) — without it Catalyst re-derives the subtree and the plan
    * scans the corpus three times. The default is the LAZY local
    * checkpoint, so constructing the frame (or explaining its plan)
    * runs no job; [[Dedup.Intermediate.Bucketed]] keyed on the cell
    * additionally removes the pair join's exchanges at scale (the
    * span-dedup lever, same contract).
    */
  def semanticDedup(
      corpus: DataFrame,
      centroids: DataFrame,
      nCells: Int,
      threshold: Double,
      intermediate: Dedup.Intermediate = Dedup.Intermediate.LocalLazy): DataFrame = {
    val assigned =
      intermediate.keyed(assignCells(corpus, centroids, nCells), "semdedup_cells", "cell")
    val dropped = assigned
      .select(col("cell"), col("id").as("a"), col("vec").as("va"))
      .join(assigned.select(col("cell"), col("id").as("b"), col("vec").as("vb")),
        Seq("cell"))
      .filter(col("a") < col("b") && cosine(col("va"), col("vb")) >= threshold)
      .select(col("b").as("id"))
      .distinct()
    assigned
      .join(dropped.withColumn("hit", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cell"),
        when(col("hit").isNull, lit(1)).otherwise(lit(0)).as("kept"))
  }

  // ---- Product quantization (PQ) ----------------------------------------

  /** Fitted PQ codebooks: `tables(sub)(cell)` is the sub-centroid for
    * subspace `sub` ∈ [0, m), cell ∈ [0, k). Compression: a dim-d float
    * vector becomes m small-int codes (64 floats → 8 codes here: 32× less
    * scan bandwidth, the reason PQ exists at corpus scale).
    */
  final case class PQCodebooks(m: Int, k: Int, subDim: Int, tables: Seq[Seq[Seq[Double]]]) {
    def lit: Column = typedLit(tables)
  }

  /** Squared L2 distance between two double arrays — fixed fold order,
    * engine-deterministic like [[dotFold]].
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Per-subspace squared distances to every cell of one codebook row:
    * the codebook is a driver-side Scala value, so each cell distance is
    * ONE native `graft_sqdist(slice(vec…), <literal sub-centroid>)` call
    * ([[graft.functions.SqDistD]] — a codegen primitive loop with the
    * identical fold order as [[sqDist]], so results and oracles are
    * bit-unchanged).
    *
    * Two rejected forms, both measured: the original
    * `transform(tab(sub), c => sqDist(…))` HOF ran m·k INTERPRETED folds
    * per corpus row (`q_ivfpq_adc` 51.6 s at ×100, ~all encode); a
    * plan-time unroll into m·k·subDim literal arithmetic terms fixed the
    * runtime but paid seconds of planning/codegen per invocation
    * (`q_ivfpq_adc` 1.4 → 5.2 s at sf0.1 — the `lshBucket` literal-sum
    * lesson). The native call keeps the plan tree small AND the loop
    * compiled. Requires [[graft.functions.GraftFunctions.register]]
    * (the declared queries register via their shared `vecs` helper).
    */
  private def subDistsLit(vec: Column, books: PQCodebooks, sub: Int): Column =
    array(books.tables(sub).map { cent =>
      call_function("graft_sqdist",
        slice(vec, sub * books.subDim + 1, books.subDim),
        typedLit(cent))
    }: _*)

  /** First-wins argmin as array_position of the min — deterministic on
    * ties, mirrors [[argmaxCell]]'s first-wins contract.
    */
  private def argminIdx(dists: Column): Column =
    (array_position(dists, array_min(dists)) - 1).cast("int")

  /** Fit PQ codebooks: per-subspace plain-L2 Lloyd, ALL m subspaces in ONE
    * corpus pass per iteration (explode each vector to its m subvectors,
    * assign against the current codebooks, aggregate per-(sub, cell) dim
    * sums). Deterministic: init from the first k vectors by id, no RNG.
    *
    * Scale: per iteration, the shuffle carries m×k×(subDim+1) numbers per
    * map partition (partial aggregation) — independent of corpus size;
    * the driver holds only the m×k×subDim codebook between iterations.
    * Empty cells keep their previous centroid (the standard Lloyd
    * convention; k-means++-style re-seeding would add RNG).
    */
  def pqFit(corpus: DataFrame, m: Int, k: Int, dim: Int, iters: Int): PQCodebooks = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(k > 0 && iters >= 0, "k must be positive and iters non-negative")
    val subDim = dim / m
    val init = corpus
      .orderBy("id")
      .limit(k)
      .select(col("vec"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(init.length == k, s"corpus has fewer than k=$k vectors")
    var books = PQCodebooks(m, k, subDim,
      Seq.tabulate(m)(s => Seq.tabulate(k)(j => init(j).slice(s * subDim, (s + 1) * subDim).toSeq)))
    (0 until iters).foreach { _ =>
      val tab = books.lit
      val subRows = corpus.select(
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => slice(col("vec"), s * subDim + 1, lit(subDim)))).as(Seq("sub", "sv")))
      val aggs = (0 until subDim).map(i =>
        sum(element_at(col("sv"), i + 1)).as(s"s$i")) :+ count(lit(1)).as("n")
      // `sv` is ALREADY the subvector — distance directly against the
      // sub-centroids (subDists would re-slice past the array end, null
      // out every subspace >= 1, and silently corrupt the fit)
      val stats = subRows
        .select(col("sub"), col("sv"),
          argminIdx(transform(element_at(tab, col("sub") + 1),
            c => sqDist(col("sv"), c))).as("cell"))
        .groupBy("sub", "cell")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = books.tables.map(_.toArray).toArray
      stats.foreach { r =>
        val s = r.getAs[Int]("sub")
        val c = r.getAs[Int]("cell")
        val n = r.getAs[Long]("n").toDouble
        next(s)(c) = Seq.tabulate(subDim)(i => r.getAs[Double](s"s$i") / n)
      }
      books = books.copy(tables = next.map(_.toSeq).toSeq)
    }
    books
  }

  /** The m-code encoding expression over a vec column — shared by
    * [[pqEncode]] and [[ivfPqTopKAdc]] (which encodes off the
    * cell-assigned frame so the corpus is scanned once, not joined).
    */
  private def codesExpr(vec: Column, books: PQCodebooks): Column =
    array((0 until books.m).map(s => argminIdx(subDistsLit(vec, books, s))): _*)

  /** Map-only PQ encoding: (id, codes array<int> of length m). */
  def pqEncode(corpus: DataFrame, books: PQCodebooks): DataFrame =
    corpus.select(col("id"), codesExpr(col("vec"), books).as("codes"))

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query
    * precomputes its m×k lookup table ONCE (O(k·dim) work), then every
    * (query, code) pair scores in O(m) element_at lookups — the corpus
    * scan touches only the m-byte codes, never the raw floats. Queries
    * (with their LUTs) broadcast; candidates rank by approximate squared
    * distance ascending, neighbor id as the deterministic tiebreak.
    *
    * Approximate by construction (distances to centroids, not vectors) —
    * recall is measured in SimilaritySpec; exact re-ranking joins the
    * winners back to raw vectors, exactly like [[ivfTopK]]'s re-rank.
    */
  def pqTopKAdc(queries: DataFrame, corpusCodes: DataFrame, books: PQCodebooks, k: Int)
      : DataFrame = {
    // The probe set is driver-sized by the operator's contract (ADC
    // precomputes a per-query LUT — the FAISS shape), so the LUTs become
    // PLAN CONSTANTS instead of riding a join: the earlier broadcast-join
    // form copied the m×k-double lut array into every scored row
    // (~1 KB × |queries|·|corpus| rows — measured 103 s at ×100 for 20
    // queries × 200k codes, nearly all of it UnsafeRow copying). Here the
    // corpus is scanned once and fans out to THIN (query_id, neighbor_id,
    // adist) rows via one posexplode; each adist is m literal-array
    // lookups inside codegen. Driver-side LUT math replicates sqDist's
    // left fold exactly (same IEEE op order), so results are bit-unchanged.
    val qs = queries.select(col("id"), col("vec")).collect().map { r =>
      val qid = r.getLong(0)
      val v = r.getSeq[Double](1)
      val lut = (0 until books.m).map { s =>
        books.tables(s).map { cent =>
          cent.indices.foldLeft(0.0) { (acc, i) =>
            val d = v(s * books.subDim + i) - cent(i)
            acc + d * d
          }
        }
      }
      (qid, lut)
    }
    require(qs.nonEmpty, "pqTopKAdc needs a non-empty probe set")
    val scored = corpusCodes
      .select(col("id").as("neighbor_id"), col("codes"))
      .select(col("neighbor_id"), posexplode(array(qs.map { case (qid, lut) =>
        struct(
          lit(qid).as("query_id"),
          (0 until books.m)
            .map(s => element_at(typedLit(lut(s)), element_at(col("codes"), s + 1) + 1))
            .reduce(_ + _)
            .as("adist"))
      }.toIndexedSeq: _*)).as(Seq("_pos", "qa")))
      .select(col("qa.query_id"), col("neighbor_id"), col("qa.adist"))
      .filter(col("query_id") =!= col("neighbor_id"))
    Relational.topKPerGroup(scored, Seq("query_id"),
      Seq(col("adist").asc, col("neighbor_id").asc), k)
  }

  /** Composed IVF-PQ ADC — the production FAISS shape: corpus codes carry
    * their coarse cell ([[assignCells]]), each query probes its `nprobe`
    * nearest cells, and ADC scoring touches ONLY the m-byte codes inside
    * probed cells. The scan is simultaneously cell-pruned (× nprobe/nCells
    * of the corpus) and compressed-domain (× m bytes / dim floats of the
    * bandwidth) — at 100 TB both factors survive verbatim: the cell is a
    * partition column for the code table, so a probe reads nprobe
    * partitions of m-byte codes, never raw vectors.
    *
    * Candidate generation is an equi-join on the cell id (queries +
    * per-query LUTs broadcast); (query, neighbor) pairs are unique by
    * construction — rank-1 corpus assignment × distinct probed cells —
    * so no dedup exchange is needed (same argument as [[ivfTopK]]).
    * Codes are computed ON the cell-assigned frame (one corpus scan);
    * encoding separately and equi-joining the two corpus-sized frames on
    * id would add a full-width shuffle for no information.
    */
  def ivfPqTopKAdc(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame,
      books: PQCodebooks,
      nCells: Int,
      nprobe: Int,
      k: Int): DataFrame = {
    val corpusSide = assignCells(corpus, centroids, nCells)
      .select(col("id"), col("cell"), codesExpr(col("vec"), books).as("codes"))
    val qcells = assignCells(queries, centroids, nCells, n = nprobe)
    val withLut = qcells.select(
      col("id").as("query_id"), col("cell"),
      array((0 until books.m).map(s => subDistsLit(col("vec"), books, s)): _*).as("lut"))
    val scored = broadcast(withLut)
      .join(corpusSide.select(col("id").as("neighbor_id"), col("cell"), col("codes")),
        Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        // m is a plan-time constant: unroll the LUT-sum into m codegen
        // lookups (the interpreted sequence-fold measured q_pq_adc at
        // 103 s for 200k codes × 10 queries; left-assoc sum ≡ the fold —
        // 0.0 + t1 = t1 on the non-negative distances)
        (0 until books.m)
          .map(s => element_at(element_at(col("lut"), s + 1),
            element_at(col("codes"), s + 1) + 1))
          .reduce(_ + _)
          .as("adist"))
    Relational.topKPerGroup(scored, Seq("query_id"),
      Seq(col("adist").asc, col("neighbor_id").asc), k)
  }

  /** Exact re-rank of a shortlist — the final stage of the production
    * retrieval stack (IVF-PQ shortlists in the compressed domain, then
    * raw vectors are read ONLY for the |queries|×K shortlist pairs).
    * Queries broadcast; the corpus side is an equi-join on the neighbor
    * id, so the planner pushes the (tiny) shortlist into the corpus scan
    * as a broadcast build at any corpus size — the raw-vector read is
    * shortlist-sized in rows even though the scan is corpus-wide in
    * candidates (a bucketed corpus table by id makes it partition-pruned
    * too). Ranks by exact cosine, neighbor id as the tiebreak.
    */
  def rerankExact(shortlist: DataFrame, queries: DataFrame, corpus: DataFrame, k: Int)
      : DataFrame = {
    val scored = shortlist
      .select(col("query_id"), col("neighbor_id"))
      .join(broadcast(queries.select(col("id").as("query_id"), col("vec").as("qv"))),
        Seq("query_id"))
      .join(corpus.select(col("id").as("neighbor_id"), col("vec").as("cv")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    Relational.topKPerGroup(dropNaN(scored), Seq("query_id"),
      Seq(col("cos").desc, col("neighbor_id").asc), k)
  }

  /** Pack the sign bits of a vector into 32-bit words (array of longs) —
    * binary (1-bit) quantization, the cheapest embedding compression rung
    * (32× under float32; Hamming distance ≈ angular distance for
    * mean-centered embeddings). 32 bits per word, NOT 64: bit 63 of a
    * packed long would flip the sign, and while two's-complement wrap is
    * deterministic on the JVM, keeping every word positive removes the
    * overflow edge from both engines. Bit j of word w covers dimension
    * w·32 + j (1-based idx w·32+j+1), assembled by an integer Horner fold
    * from j = 31 down to 0 — pure integer ops, hash-exact cross-engine.
    * Ties at exactly 0.0 pack as 0.
    */
  def signBits(vec: Column, dim: Int): Column = {
    require(dim > 0, "dim must be positive")
    val words = (dim + 31) / 32
    transform(sequence(lit(0), lit(words - 1)), w =>
      aggregate(sequence(lit(31), lit(0), lit(-1)), lit(0L), (acc, j) => {
        val idx = w * 32 + j + 1
        acc * 2 + when(idx <= lit(dim) && element_at(vec, idx) > lit(0.0), lit(1L))
          .otherwise(lit(0L))
      }))
  }

  /** Hamming distance between two packed sign-bit arrays. */
  def hammingPacked(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L),
      (acc, v) => acc + v)

  /** Brute-force binary top-k: Hamming distance over packed sign bits,
    * probes broadcast, one corpus scan — the compressed-domain twin of
    * [[bruteForceTopK]]. At 100 TB the corpus side carries dim/32 longs
    * per row instead of dim floats (32× narrower scan), which is the
    * whole point: a first-stage shortlist this cheap feeds
    * [[rerankExact]] exactly like the PQ shortlist does. Deterministic
    * tiebreak on neighbor id.
    */
  def binaryTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int): DataFrame = {
    val qb = queries.select(col("id").as("query_id"), signBits(col("vec"), dim).as("qbits"))
    val cb = corpus.select(col("id").as("neighbor_id"), signBits(col("vec"), dim).as("cbits"))
    val scored = broadcast(qb)
      .join(cb, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        hammingPacked(col("qbits"), col("cbits")).as("hamming"))
    Relational.topKPerGroup(scored, Seq("query_id"),
      Seq(col("hamming").asc, col("neighbor_id").asc), k)
  }

  /** Per-dimension corpus min/max — the training pass of scalar
    * quantization. One partial+final aggregation; state is 2×dim numbers
    * per partial regardless of corpus size.
    */
  def scalarQuantStats(corpus: DataFrame): DataFrame =
    corpus
      .select(posexplode(col("vec")).as(Seq("dim0", "x")))
      .groupBy(col("dim0"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))

  /** Int8-style scalar quantization (per-dimension affine) — the cheapest
    * embedding-compression rung below PQ: 4-8× memory cut with ~no recall
    * loss, the standard first step before a 100 TB corpus's raw float
    * vectors move anywhere. code = clamp(floor((x−lo)/(hi−lo)·levels)),
    * reconstruction x̂ = lo + (code+½)·(hi−lo)/levels (mid-rise), both
    * per-dim affine chains of correctly-rounded IEEE ops in a fixed order
    * — so codes AND the quantization error hash cross-engine exactly
    * (the same no-libm discipline as [[graft.ext.TextOps.tfidfTopTerms]]).
    * A constant dimension (hi = lo) codes to 0 with zero error.
    *
    * Returns exploded (id, dim [1-based], code, err_q12) — the integer
    * code plus the squared reconstruction error floor-quantized at 1e-12.
    *
    * Scale shape: [[scalarQuantStats]] is one tiny-state aggregation; the
    * encode is map-only with the 2×dim stats BROADCAST into the
    * per-dim join — the corpus never shuffles to get encoded.
    */
  def scalarQuantize(corpus: DataFrame, levels: Int = 256): DataFrame = {
    require(levels > 1, "levels must be >= 2")
    val stats = scalarQuantStats(corpus)
    val code = least(greatest(
      floor((col("x") - col("lo")) / (col("hi") - col("lo")) * levels).cast("long"),
      lit(0L)), lit(levels - 1L))
    val xhat = col("lo") + (col("code").cast("double") + 0.5d) *
      ((col("hi") - col("lo")) / levels)
    corpus
      .select(col("id"), posexplode(col("vec")).as(Seq("dim0", "x")))
      .join(broadcast(stats), Seq("dim0"))
      .withColumn("code", when(col("hi") === col("lo"), lit(0L)).otherwise(code))
      .withColumn("err",
        when(col("hi") === col("lo"), lit(0.0))
          .otherwise((col("x") - xhat) * (col("x") - xhat)))
      .select(col("id"), (col("dim0") + 1).as("dim"), col("code"),
        floor(col("err") * 1e12).cast("long").as("err_q12"))
  }

  /** Distance-to-own-centroid outlier scan — the embedding-space QA pass
    * (mislabeled / noise / off-distribution candidates sit far from their
    * label's centroid). Centroid numerators are the integer-exact
    * per-(label, dim) q6 sums (the `q_embed_centroids` arithmetic), so
    * the centroid itself is order-free; per-row squared distance
    * `Σ (x_j − s_j/(10⁶·n))²` folds left-to-right on doubles — the same
    * fixed-order contract as every similarity score, bit-identical
    * cross-engine. Plan: one explode+agg pass builds |labels|×dim sums,
    * re-packed to |labels| centroid ARRAYS and broadcast into a map-only
    * distance pass — the corpus never shuffles to get scored.
    * Returns (idCol, labelCol, dist2).
    */
  def centroidOutliers(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val rows = emb.select(col(idCol), col(labelCol),
      transform(col(vecCol), x => x.cast("double")).as("__vec"))
    rows
      .join(broadcast(centroidFrame(rows, labelCol)), Seq(labelCol))
      .select(col(idCol), col(labelCol),
        call_function("graft_sqdist", col("__vec"), col("__c")).as("dist2"))
  }

  /** Per-label exact-integer centroid numerators as one array row per
    * label: `(label, __cs = q6 sums ordered by dim, __n, __c = the
    * reconstructed double coordinates s/(10⁶·n))` — the shared frame
    * behind [[centroidOutliers]], [[silhouetteCentroid]] and
    * [[daviesBouldin]] (label-count-sized, always broadcastable).
    * Reconstructing the coordinates ONCE per label row (instead of per
    * corpus row inside a `zip_with` fold) lets the member-distance scan
    * run the native codegen `graft_sqdist` primitive — the
    * [[pqTopKAdc]] lesson: the interpreted HOF fold cost 27 s on a
    * 200k×10-label silhouette scan where the native loop is ~2 s —
    * with BIT-IDENTICAL values (same per-element expression, same fold
    * order as the oracle's list_reduce).
    */
  private def centroidFrame(rows: DataFrame, labelCol: String): DataFrame =
    rows
      .select(col(labelCol),
        posexplode(transform(col("__vec"), x => floor(x * lit(1000000)).cast("long")))
          .as(Seq("__i", "__q")))
      .groupBy(col(labelCol), col("__i"))
      .agg(sum(col("__q")).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(labelCol))
      .agg(
        transform(array_sort(collect_list(struct(col("__i"), col("__s")))),
          t => t.getField("__s")).as("__cs"),
        max(col("__n")).as("__n"))
      .withColumn("__c",
        transform(col("__cs"), s => s.cast("double") / (lit(1000000.0) * col("__n"))))

  /** Simplified (centroid-form) SILHOUETTE per vector — the cluster-
    * validity score an embedding-quality gate reads: a = distance to the
    * own-label centroid, b = distance to the nearest OTHER centroid,
    * s = (b − a)/max(a, b) ∈ [−1, 1] (negative ⇒ the vector sits closer
    * to a foreign cluster — a label-noise signal that composes with
    * kNN-vote auditing). The classical pairwise silhouette is O(n²);
    * the centroid form is the standard large-scale surrogate: one
    * broadcast of the k×dim exact-integer centroid frame, one scan, k
    * fixed-order distance folds per row, zero corpus joins.
    *
    * Determinism: centroid coordinates are exact q6 integer numerators
    * reconstructed with the [[centroidOutliers]] division; each distance
    * is the canonical left-to-right (x−c)² fold under `sqrt` (correctly
    * rounded in both engines); `min` over the b-candidates is
    * order-independent; s is one fixed-order expression.
    */
  def silhouetteCentroid(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val rows = emb.select(col(idCol), col(labelCol),
      transform(col(vecCol), x => x.cast("double")).as("__vec"))
    val cents = centroidFrame(rows, labelCol)
      .select(col(labelCol).as("__l2"), col("__c"))
    rows
      .crossJoin(broadcast(cents))
      .select(col(idCol), col(labelCol), col("__l2"),
        sqrt(call_function("graft_sqdist", col("__vec"), col("__c"))).as("__d"))
      .groupBy(col(idCol), col(labelCol))
      .agg(
        max(when(col("__l2") === col(labelCol), col("__d"))).as("a"),
        min(when(col("__l2") =!= col(labelCol), col("__d"))).as("b"))
      .select(col(idCol), col(labelCol), col("a"), col("b"),
        when(greatest(col("a"), col("b")) > 0.0,
          (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(lit(0.0)).as("s"))
  }

  /** DAVIES–BOULDIN cluster-validity terms — [[silhouetteCentroid]]'s
    * aggregate companion: per cluster i, R_i = max_{j≠i} (σ_i + σ_j) /
    * d(c_i, c_j) (lower ⇒ tighter, better-separated clusters), with the
    * worst partner j named — the per-cluster diagnostic a clustering
    * sweep reads. σ_i is the mean member→centroid distance accumulated
    * as EXACT q6 integers (order-free sums), centroid coordinates are the
    * shared exact-integer numerators, and every fractional step is a
    * fixed-order once-cast double expression — so the k·(k−1) ratio grid
    * and the argmax row are cross-engine reproducible. Scale: one corpus
    * scan for distances (the [[centroidOutliers]] pass), then all work is
    * on k-sized frames.
    */
  def daviesBouldin(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val rows = emb.select(col(labelCol),
      transform(col(vecCol), x => x.cast("double")).as("__vec"))
    val cents = centroidFrame(rows, labelCol)
    val sig = centroidOutliers(emb, idCol, vecCol, labelCol)
      .groupBy(col(labelCol))
      .agg(sum(floor(sqrt(col("dist2")) * 1000000).cast("long")).as("sq"),
        count(lit(1)).as("cnt"))
    val ci = cents.select(col(labelCol).as("i"), col("__c").as("ci"))
    val cj = cents.select(col(labelCol).as("j"), col("__c").as("cj"))
    val dij = ci
      .crossJoin(cj)
      .filter(col("i") =!= col("j"))
      .select(col("i"), col("j"),
        sqrt(call_function("graft_sqdist", col("ci"), col("cj"))).as("dij"))
    val ratio = dij
      .join(sig.select(col(labelCol).as("i"), col("sq").as("sqi"), col("cnt").as("cnti")), Seq("i"))
      .join(sig.select(col(labelCol).as("j"), col("sq").as("sqj"), col("cnt").as("cntj")), Seq("j"))
      .select(col("i"), col("cnti"), col("j"),
        ((col("sqi").cast("double") / (lit(1000000.0) * col("cnti")) +
          col("sqj").cast("double") / (lit(1000000.0) * col("cntj"))) / col("dij")).as("r"))
    ratio
      .withColumn("rn",
        row_number().over(Window.partitionBy("i").orderBy(col("r").desc, col("j"))))
      .filter(col("rn") === 1)
      .select(col("i").as("label"), col("cnti").as("n"), col("j").as("partner"), col("r"))
  }

  /** Top-1 principal component via INTEGER-EXACT moments + driver-side
    * power iteration — the dimensionality-reduction front of an ANN
    * pipeline (project-then-index), built so the oracle can replay every
    * bit:
    *
    *  1. Each vector quantizes to `floor(x·1000)` (exact per-element op,
    *     both engines). The scatter moments are then pure integer sums —
    *     `T_i = Σq_i`, `S_ij = Σ q_i·q_j` — summation-order-FREE, computed
    *     in ONE pass: posexplode to dim rows and aggregate `dim` product
    *     sums per row-dim (shuffle = dim × (dim+2) longs after partial
    *     agg; never a dim² row blowup per input row).
    *  2. The scaled covariance `C = n·S − T·Tᵀ` (scale doesn't move
    *     eigenvectors) is a dim×dim DRIVER matrix — the k-means-centroid
    *     precedent: fit state is tiny, the corpus never collects.
    *     Exactness guard: all magnitudes must stay below 2^53; at corpus
    *     sizes where n·S crosses that, drop to double moments and accept
    *     the documented ulp drift (the eigenvector is a fit artifact, not
    *     a per-row answer).
    *  3. `iters` fixed power-iteration steps from the exact-rational
    *     1/√dim start, every fold left-to-right seeded 0.0 — the DuckDB
    *     recursive CTE runs the identical op sequence, so the eigenvector
    *     is bit-identical cross-engine and needs no sign canonicalization
    *     (output magnitude |proj| makes even a global sign flip harmless).
    *  4. Projection is map-only: both constant arrays (mean, component)
    *     ride the plan as literals; `(x_j − μ_j)·v_j` folds in index
    *     order per row.
    *
    * Returns (idCol, pa) — the ABSOLUTE centered projection, unrounded;
    * callers rank/round.
    */
  def pcaPowerProjections(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      iters: Int = 20): DataFrame = {
    require(dim >= 2 && dim <= 1024, "dim out of range")
    require(iters >= 1, "iters must be positive")
    val vecD = transform(col(vecCol), x => x.cast("double"))
    val qv = embeddings.select(
      col(idCol), vecD.as("__vec"),
      transform(vecD, x => floor(x * lit(1000)).cast("long")).as("__q"))
    val momRows = qv
      .select(col("__q"), posexplode(col("__q")).as(Seq("__i", "__qi")))
      .groupBy(col("__i"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__qi")).as("__t") +: (0 until dim).map(j =>
          sum(col("__qi") * col("__q").getItem(j)).as(s"__s$j")): _*)
      .collect()
    require(momRows.length == dim, s"expected $dim moment rows, got ${momRows.length}")
    val n = momRows.head.getLong(1)
    require(n > 0, "empty corpus")
    val t = Array.ofDim[Long](dim)
    val s = Array.ofDim[Long](dim, dim)
    momRows.foreach { r =>
      val i = r.getInt(0)
      t(i) = r.getLong(2)
      var j = 0
      while (j < dim) { s(i)(j) = r.getLong(3 + j); j += 1 }
    }
    val maxS = s.flatten.map(math.abs).max
    val maxT = t.map(math.abs).max
    require(maxS.toDouble * n < (1L << 53).toDouble &&
      maxT.toDouble * maxT < (1L << 53).toDouble,
      "integer moments exceed double exactness — use double moments at this scale")
    val c = Array.tabulate(dim, dim)((i, j) =>
      n.toDouble * s(i)(j).toDouble - t(i).toDouble * t(j).toDouble)
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var it = 0
    while (it < iters) {
      val mv = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc = acc + c(i)(j) * v(j); j += 1 }
        acc
      }
      var nrm = 0.0
      var i = 0
      while (i < dim) { nrm = nrm + mv(i) * mv(i); i += 1 }
      val inv = math.sqrt(nrm)
      v = mv.map(x => x / inv)
      it += 1
    }
    val mu = t.map(_.toDouble / (1000.0 * n))
    val muLit = array(mu.map(lit): _*)
    val vLit = array(v.map(lit): _*)
    qv.select(
      col(idCol),
      abs(foldSum(zip_with(
        zip_with(col("__vec"), muLit, (x, m) => x - m),
        vLit, (d, w) => d * w))).as("pa"))
  }
}
