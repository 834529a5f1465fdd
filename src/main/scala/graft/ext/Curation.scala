package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for LLM training-data pipelines (north-star
  * EXT, alongside [[Dedup]]/[[TextOps]]/[[Similarity]]): deterministic
  * train/val/test splitting, stratified sampling, sequence packing, and
  * duplicate-cluster resolution.
  *
  * Scale design:
  *  - Split/sample assignment is a pure per-row hash expression — map-only,
  *    no shuffle, no RNG state: re-running the pipeline (or re-running ONE
  *    partition after task retry) assigns every document identically, which
  *    is the property that makes hash-splits the standard over
  *    `rand()`-based sampling at scale (a retried task re-draws rand() and
  *    silently duplicates/loses rows; a hash never does).
  *  - The hash is the engine-portable md5 family from [[Dedup.md5Long]], so
  *    every assignment is oracle-checkable bit-for-bit.
  *  - Packing shuffles once on the stream column and runs one window sort
  *    per stream — the same cost as any per-key ordered operator.
  *  - Connected components is the iterative min-label-propagation loop
  *    (the GraphX-free standard); rounds are equi-joins on the (small)
  *    pair set, never touching the corpus.
  */
object Curation {

  /** Buckets per unit of sampling probability: rates are expressed as
    * integer thresholds out of 10000 (0.01% resolution), so membership
    * tests are exact integer compares — no float boundary ambiguity.
    */
  val Buckets: Int = 10000

  /** Deterministic salted bucket in [0, Buckets): md5 of "salt:id".
    * Different salts give independent assignments (a doc's split bucket is
    * uncorrelated with its sample bucket), which is how a pipeline layers
    * split-then-sample without bias.
    */
  def hashBucket(id: Column, salt: String): Column =
    Dedup.md5Long(concat(lit(salt + ":"), id.cast("string"))) % Buckets

  /** Train/val/test assignment by hash bucket: bucket < trainUpTo ⇒ train,
    * < valUpTo ⇒ val, else test (thresholds out of [[Buckets]]).
    * Adds a `split` column; map-only, shuffle-free, retry-stable.
    */
  def splitAssign(
      docs: DataFrame,
      idCol: String,
      salt: String,
      trainUpTo: Int,
      valUpTo: Int): DataFrame = {
    require(0 < trainUpTo && trainUpTo < valUpTo && valUpTo < Buckets,
      s"need 0 < trainUpTo < valUpTo < $Buckets")
    val b = hashBucket(col(idCol), salt)
    docs.withColumn(
      "split",
      when(b < trainUpTo, "train").when(b < valUpTo, "val").otherwise("test"))
  }

  /** LEAKAGE-SAFE train/val/test assignment: every member of a near-dup
    * cluster is bucketed by its CLUSTER label, not its own id, so near
    * duplicates can never straddle the train/eval boundary — the
    * contamination a per-doc hash split silently allows (a test document
    * whose near-copy sits in train is leaked eval data; with ~3% near-dup
    * rate and a 5% test split, per-doc hashing leaks a few permille of
    * the eval set at ANY corpus size). `pairs` is a near-dup pair frame
    * from any detector ([[Dedup.jaccardPairs]], [[Dedup.simhashPairs]],
    * [[Similarity.cosineNearDupPairs]]); documents outside every pair
    * form singleton clusters keyed by their own id, reproducing plain
    * [[splitAssign]] exactly for the non-duplicated bulk.
    *
    * Scale shape: cluster labels cover only documents that near-duplicate
    * something — typically a few percent of the corpus, but that is
    * corpus-PROPORTIONAL, not bounded, so the membership join is left to
    * the planner (AQE broadcasts it while it fits and degrades to a
    * shuffle join beyond — forcing a broadcast here would OOM the driver
    * at billion-document scale). The assignment itself stays a map-side
    * projection. Deterministic given (pairs, salt, thresholds) — same
    * retry-stability contract as every sampler here.
    */
  def splitAssignLeakageSafe(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      salt: String,
      trainUpTo: Int,
      valUpTo: Int,
      aCol: String = "a",
      bCol: String = "b"): DataFrame =
    splitAssignLeakageSafeFromClusters(
      docs, idCol, connectedComponents(pairs, aCol, bCol), salt, trainUpTo, valUpTo)

  /** [[splitAssignLeakageSafe]] over an ALREADY-RESOLVED cluster frame
    * (doc, cluster) — for callers that share one materialized closure
    * across several split/dedup consumers instead of re-running the
    * component iteration per query.
    */
  def splitAssignLeakageSafeFromClusters(
      docs: DataFrame,
      idCol: String,
      clusters: DataFrame,
      salt: String,
      trainUpTo: Int,
      valUpTo: Int): DataFrame = {
    require(0 < trainUpTo && trainUpTo < valUpTo && valUpTo < Buckets,
      s"need 0 < trainUpTo < valUpTo < $Buckets")
    val labels = clusters.withColumnRenamed("doc", idCol)
    val b = hashBucket(coalesce(col("cluster"), col(idCol)), salt)
    docs
      .join(labels, Seq(idCol), "left")
      .withColumn(
        "split",
        when(b < trainUpTo, "train").when(b < valUpTo, "val").otherwise("test"))
      .drop("cluster")
  }

  /** Per-group cap — the Common-Crawl-style per-DOMAIN quota: within each
    * group keep at most `cap` rows, chosen by a deterministic salted-hash
    * order (so the kept subset is an unbiased, retry-stable sample of the
    * group, not "whatever sorted first"). Adds `rn` (1-based hash-order
    * rank within the group) and `keep` (rn ≤ cap).
    *
    * Scale shape: ONE hash exchange on the group key feeding a per-group
    * sort + row_number — the same envelope as any per-key ordered
    * operator; the cap predicate is a filterable rank, so consumers that
    * only read kept rows get Spark 4's WindowGroupLimit (per-partition
    * top-cap BEFORE the shuffle). Skewed domains are exactly the rows the
    * cap discards, and the group-limit prunes them map-side.
    */
  def capPerGroup(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      cap: Int,
      salt: String): DataFrame = {
    require(cap > 0, "cap must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    docs
      .withColumn("rn", row_number().over(w))
      .withColumn("keep", (col("rn") <= cap).cast("int"))
  }

  /** Time-boundary split diagnostics — the TEMPORAL analog of
    * [[splitAssign]] (train on the past, evaluate on the future — the only
    * split that measures forward generalization for time-ordered corpora):
    * events before `boundaryCol < boundary` are train, the rest test, and
    * the summary surfaces the entity-overlap leak a temporal split must
    * audit (entities active on BOTH sides carry future information into
    * train for any entity-level label). Returns three rows —
    * (split='train'|'test'|'leak', n_events, n_entities) where the leak
    * row counts crossover entities and their total events.
    *
    * Scale shape: one scan, one hash aggregation on the entity key
    * (per-entity state = two integers), then a 3-row summary — the
    * assignment itself is a map-side comparison, exactly like the hash
    * split. Deterministic: the boundary is data, not wall-clock.
    */
  def temporalSplit(
      events: DataFrame,
      entityCol: String,
      boundaryCol: String,
      boundary: String): DataFrame = {
    val per = events
      .select(col(entityCol).as("ent"),
        (col(boundaryCol) < lit(boundary).cast("timestamp")).cast("long").as("is_tr"))
      .groupBy(col("ent"))
      .agg(sum(col("is_tr")).as("n_tr"), sum(lit(1) - col("is_tr")).as("n_te"))
    per.agg(
      sum(col("n_tr")).as("train_ev"),
      sum(when(col("n_tr") > 0, 1L).otherwise(0L)).as("train_ent"),
      sum(col("n_te")).as("test_ev"),
      sum(when(col("n_te") > 0, 1L).otherwise(0L)).as("test_ent"),
      sum(when(col("n_tr") > 0 && col("n_te") > 0, col("n_tr") + col("n_te")).otherwise(0L))
        .as("leak_ev"),
      sum(when(col("n_tr") > 0 && col("n_te") > 0, 1L).otherwise(0L)).as("leak_ent"))
      .select(explode(array(
        struct(lit("train").as("split"), col("train_ev").as("n_events"),
          col("train_ent").as("n_entities")),
        struct(lit("test").as("split"), col("test_ev").as("n_events"),
          col("test_ent").as("n_entities")),
        struct(lit("leak").as("split"), col("leak_ev").as("n_events"),
          col("leak_ent").as("n_entities")))).as("r"))
      .select(col("r.split").as("split"), col("r.n_events").as("n_events"),
        col("r.n_entities").as("n_entities"))
  }

  /** Deterministic per-stratum sampling: keep a document iff its hash
    * bucket falls below the stratum's threshold (rate × [[Buckets]]).
    * The rate table is broadcast (strata are few by nature); unknown
    * strata fall back to `defaultRate`.
    *
    * This is how a curation pipeline re-weights sources (oversample books,
    * downsample boilerplate web) with exact reproducibility: the kept set
    * is a pure function of (id, salt, rates) — stable across runs,
    * retries, and cluster sizes.
    */
  def sampleStratified(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rateRows = rates.toSeq
      .map { case (k, r) => (k, math.floor(r * Buckets).toLong) }
      .toDF(stratumCol, "_keep_below")
    val dflt = math.floor(defaultRate * Buckets).toLong
    docs
      .join(broadcast(rateRows), Seq(stratumCol), "left")
      .filter(hashBucket(col(idCol), salt) < coalesce(col("_keep_below"), lit(dflt)))
      .drop("_keep_below")
  }

  /** t-closeness audit (Li/Li/Venkatasubramanian 2007) — the third leg of
    * the release-privacy tripod next to k-anonymity (group size) and
    * l-diversity (sensitive-value variety): per quasi-identifier group,
    * the earth-mover's distance between the group's distribution over an
    * ORDERED sensitive attribute and the corpus-wide distribution. For
    * ordered buckets EMD reduces to the mean absolute prefix-share gap:
    * EMD = (1/(m−1)) Σ_{i<m} |cumshare_g(i) − cumshare_all(i)|.
    *
    * Exact integer form: shares cross-multiply — the numerator is
    * Σ |cum_g(i)·N − cum_all(i)·n_g| over the DENSE (group × bucket) grid
    * (missing buckets count 0), and emd_q6 = num·10⁶ DIV (n_g·N·(m−1)).
    * Requires n_g·N·(m−1) < 2⁶³ — past ~10⁹ rows quantize shares to q9
    * first (the two-limb discipline of the overflow audit).
    *
    * Scale shape: ONE corpus aggregate to (quasi, bucket) counts
    * (checkpointed — it feeds the global-bucket, group-size and grid
    * arms; the [[Dedup]] impact-report discipline), then everything rides
    * group-space × bucket-space frames: the dense grid is a cross join of
    * two SMALL frames by contract, prefix sums are per-group windows over
    * m rows. Degenerate m = 1 (one bucket) is zero distance by definition
    * — the DIV guard keeps it finite.
    *
    * Returns (quasiCols..., group_size, emd_q6, exceeds) where exceeds =
    * emd_q6 > tQ6.
    */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[String],
      bucketCol: String,
      tQ6: Long): DataFrame = {
    val q = quasiCols.map(col)
    val cnt = df
      .groupBy((q :+ col(bucketCol)): _*)
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    val wAll = Window.orderBy(bucketCol).rowsBetween(Window.unboundedPreceding, 0)
    val glob = cnt
      .groupBy(bucketCol)
      .agg(sum(col("_c")).as("_nb"))
      .withColumn("_cum_all", sum(col("_nb")).over(wAll))
    val tot = glob.agg(sum(col("_nb")).as("_nn"), count(lit(1)).as("_m"))
    val ng = cnt.groupBy(q: _*).agg(sum(col("_c")).as("group_size"))
    val wG = Window.partitionBy(q: _*).orderBy(bucketCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    ng
      .crossJoin(glob.select(col(bucketCol), col("_cum_all")))
      .join(cnt, quasiCols :+ bucketCol, "left")
      .withColumn("_cum_g", sum(coalesce(col("_c"), lit(0L))).over(wG))
      .crossJoin(broadcast(tot))
      .groupBy((q :+ col("group_size") :+ col("_nn") :+ col("_m")): _*)
      .agg(sum(abs(col("_cum_g") * col("_nn") - col("_cum_all") * col("group_size")))
        .as("_num"))
      .select(
        (q :+ col("group_size") :+
          expr("_num * 1000000 DIV (group_size * _nn * greatest(_m - 1, 1))")
            .as("emd_q6")): _*)
      .withColumn("exceeds", col("emd_q6") > tQ6)
  }

  /** Deterministic token-dropout augmentation (EDA-style): drop each token
    * whose salted bucket of (doc, position) falls below `dropBelow` /
    * [[Buckets]] — the data-augmentation pass contrastive/robustness
    * training pipelines run over text corpora. Hash-seeded, not RNG-seeded:
    * the SAME (id, position, salt) always drops the same tokens, so the
    * augmentation is retry-stable, resumable mid-corpus, and reproducible
    * from the config alone — the same property every sampler in this
    * module has. Different salts give independent dropout masks (epoch 2
    * = a new salt, not a new RNG state to checkpoint).
    *
    * Map-only: tokenize + an indexed higher-order `filter` + re-join, all
    * inside one projection — no explode, no shuffle, no UDF. Output text
    * re-joins with single spaces (canonical detokenization).
    *
    * Returns (idCol, n_tokens, n_dropped, augmented).
    */
  def augmentDropout(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      salt: String,
      dropBelow: Int): DataFrame = {
    require(0 < dropBelow && dropBelow < Buckets, s"dropBelow must be in (0, $Buckets)")
    docs
      .withColumn("_toks", TextOps.tokens(col(textCol)))
      .withColumn("_kept",
        filter(col("_toks"), (_, i) =>
          hashBucket(
            concat(col(idCol).cast("string"), lit(":"), i.cast("string")),
            salt) >= dropBelow))
      .select(
        col(idCol),
        size(col("_toks")).cast("long").as("n_tokens"),
        (size(col("_toks")) - size(col("_kept"))).cast("long").as("n_dropped"),
        array_join(col("_kept"), " ").as("augmented"))
  }

  /** Largest-remainder (Hamilton) quota allocation — split a fixed sample
    * budget across groups proportionally with EXACT integer arithmetic:
    * each group gets `floor(budget·n/total)` seats, and the
    * `budget − Σfloor` leftover seats go to the largest fractional
    * remainders (`budget·n mod total`, ties to the smaller group key).
    * Σalloc = budget exactly — the property float-rounded rates can't
    * give — and every group's allocation is within 1 of its exact
    * proportional share. This is how a sampling pipeline turns "take 1M
    * docs, keep source proportions" into per-group take counts that
    * [[sampleFixedK]] can then execute.
    *
    * Scale shape: the input is the per-group COUNT frame (one corpus
    * aggregate upstream), so everything here is group-space-sized; the
    * whole-frame windows (total, remainder rank, Σbase) funnel the
    * group frame through one partition BY CONTRACT — thousands of groups,
    * never corpus rows (the q_sample_by_decile precedent).
    *
    * Returns the input columns + `alloc`.
    */
  def allocateQuota(
      counts: DataFrame,
      groupCol: String,
      nCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.partitionBy().orderBy(col("_rem").desc, col(groupCol).asc)
    counts
      .withColumn("_total", sum(col(nCol)).over(wAll))
      .withColumn("_base", expr(s"$budget * $nCol DIV _total"))
      .withColumn("_rem", expr(s"$budget * $nCol % _total"))
      .withColumn("_rk", row_number().over(wRank))
      .withColumn("_short", lit(budget) - sum(col("_base")).over(wAll))
      .withColumn("alloc",
        col("_base") + when(col("_rk") <= col("_short"), 1L).otherwise(0L))
      .drop("_total", "_base", "_rem", "_rk", "_short")
  }

  /** Sequence packing — assign documents to fixed-budget bins for LLM
    * training: within each `streamCol` stream, documents are laid out in
    * `idCol` order and cut into bins of `budget` cost units (tokens,
    * chars); a document belongs to the bin where its stream offset starts.
    * Adds `bin` (0-based within stream) and `bin_offset` (the document's
    * start offset inside the concatenated stream).
    *
    * This is the "concatenate then chunk" packing used by most pretraining
    * data loaders — deterministic, order-preserving, and expressible as
    * ONE prefix-sum window (single shuffle on the stream key + one sort).
    * At 100 TB the per-stream sort is the binding constraint: streams
    * should be sized by the partitioner (e.g. source × shard), and a
    * two-pass variant (per-partition local prefix sums + broadcast
    * partition offsets) removes the global sort if a single stream
    * outgrows an executor — standard parallel prefix-sum decomposition.
    */
  def packBins(
      docs: DataFrame,
      idCol: String,
      costCol: String,
      streamCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window
      .partitionBy(streamCol)
      .orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(col(costCol)).over(w), lit(0L))
    docs
      .withColumn("bin_offset", before % budget)
      .withColumn("bin", floor(before / budget).cast("long"))
  }

  /** [[packBins]] without the per-stream serial sort — the documented
    * two-pass parallel prefix-sum decomposition for streams that outgrow
    * one executor's sort. `chunkCol` splits each stream into ordered
    * chunks and MUST be monotone non-decreasing in `idCol` (e.g.
    * `floor(id / 4096)`, an ingest shard index, a date) so that sorting by
    * (chunk, id) ≡ sorting by id; granularity is the caller's
    * parallelism knob (rows/chunk ≈ what one task should sort).
    *
    *  - pass 1: per-(stream, chunk) cost totals — an ordinary partial+final
    *    aggregate, corpus-parallel;
    *  - prefix: running sum over CHUNK TOTALS per stream — a window over
    *    the #chunks-sized frame, thousands of rows where the single-window
    *    form sorts billions;
    *  - pass 2: local prefix sum within each (stream, chunk) partition +
    *    the broadcast chunk offset — every chunk sorts independently.
    *
    * Output is bit-identical to [[packBins]] (CurationPropertySpec law):
    * same `bin`/`bin_offset` for every row, any stream/cost shape.
    */
  def packBinsTwoPass(
      docs: DataFrame,
      idCol: String,
      costCol: String,
      streamCol: String,
      budget: Long,
      chunkCol: Column): DataFrame = {
    require(budget > 0, "budget must be positive")
    val d = docs.withColumn("_chunk", chunkCol)
    val chunkTotals = d
      .groupBy(col(streamCol), col("_chunk"))
      .agg(sum(col(costCol)).as("_chunk_total"))
    val wChunks = Window
      .partitionBy(streamCol)
      .orderBy("_chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunkTotals
      .select(col(streamCol), col("_chunk"),
        coalesce(sum(col("_chunk_total")).over(wChunks), lit(0L)).as("_chunk_offset"))
    val wLocal = Window
      .partitionBy(col(streamCol), col("_chunk"))
      .orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = col("_chunk_offset") + coalesce(sum(col(costCol)).over(wLocal), lit(0L))
    d.join(broadcast(offsets), Seq(streamCol, "_chunk"))
      .withColumn("bin_offset", before % budget)
      .withColumn("bin", floor(before / budget).cast("long"))
      // restore the caller's column order (the using-join fronts its keys)
      .select(docs.columns.map(col) :+ col("bin_offset") :+ col("bin"): _*)
  }

  /** Connected components over an undirected pair set — duplicate-cluster
    * resolution: every vertex gets `cluster` = the minimum vertex id
    * reachable from it, so each near-dup cluster is labeled by its
    * canonical (smallest-id) member. Input: (aCol, bCol) pairs; output:
    * (doc, cluster) for every vertex that appears in a pair.
    *
    * Algorithm: min-label propagation to fixpoint — each round joins
    * labels across edges and keeps the per-vertex min; converges in
    * graph-diameter rounds (near-dup clusters are dense, diameter is
    * tiny). Each round localCheckpoints to truncate lineage (iterative
    * DataFrame plans otherwise grow exponentially) and the convergence
    * check is one count on the changed set. At extreme component sizes
    * (pathological high-diameter shapes — chains, lattices) use
    * [[connectedComponentsStar]]: same contract, O(log n) rounds.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIter: Int = 30): DataFrame = {
    // symmetric edge list: propagate labels both directions
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labelsCkpt = edges.select(col("src").as("doc")).distinct()
      .withColumn("cluster", col("doc"))
      .localCheckpoint()
    var labels = labelsCkpt
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate labels: own + each neighbor's current label; the own-label
      // rows also carry the previous label, so convergence reads off the
      // aggregated frame directly — no per-round labels⋈next re-join
      // (every doc has exactly one non-null prev: labels covers all docs)
      val viaEdge = edges
        .join(labels.withColumnRenamed("doc", "src"), Seq("src"))
        .select(col("dst").as("doc"), col("cluster"), lit(null).cast("long").as("prev"))
      // LAZY checkpoint: the full-scan convergence count below is the
      // materializing action, so each round runs ONE job (an eager
      // checkpoint + isEmpty probe ran two; per-round fixed costs
      // dominate the iterative operators at interactive scale)
      val next = labels
        .select(col("doc"), col("cluster"), col("cluster").as("prev"))
        .unionByName(viaEdge)
        .groupBy("doc")
        .agg(min(col("cluster")).as("cluster"), max(col("prev")).as("prev"))
        .localCheckpoint(false)
      converged = next.filter(col("cluster") =!= col("prev")).count() == 0L
      // `next` is now materialized and lineage-truncated, so the PREVIOUS
      // round's checkpoint blocks are dead — release them immediately
      // instead of waiting for driver-GC ContextCleaner (at 100 TB × many
      // rounds the leak is executor storage, not an abstraction). Order
      // matters: releasing before the count would tear blocks out from
      // under the uncomputed lazy checkpoint.
      releaseCheckpoint(labelsCkpt)
      labelsCkpt = next
      labels = next.select(col("doc"), col("cluster"))
      iter += 1
    }
    releaseCheckpoint(edges)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — labels would be " +
          "partially propagated (wrong, not approximate). Raise maxIter (rounds needed = " +
          "component diameter) or use connectedComponentsStar (O(log n) rounds).")
    labels
  }

  /** Free a localCheckpoint's storage blocks once no live frame references
    * it. The checkpointed Dataset wraps a `LogicalRDD` over the persisted
    * RDD; unpersisting that RDD releases the blocks immediately — the
    * iterative operators here otherwise strand one dead copy of their
    * working frame per round until the GC-driven ContextCleaner notices
    * (invisible at fixture scale, real executor storage at 100 TB).
    * Non-checkpoint frames are a no-op, so callers can pass anything.
    */
  private[ext] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(blocking = false)
      case _                                            => ()
    }

  /** Connected components via alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the scale path for HIGH-DIAMETER graphs, where min-label propagation
    * ([[connectedComponents]]) needs diameter-many rounds: the alternation
    * converges in O(log n) rounds regardless of diameter, each round the
    * same groupBy+join shape over the edge frame. Same contract: every
    * vertex of `pairs` → (doc, cluster = component-minimum id).
    *
    *  - large-star: each vertex u links every LARGER neighbor to
    *    `m(u) = min(N(u) ∪ u)` — big stars collapse toward small ids.
    *  - small-star: each vertex u links its smaller neighbors (and itself)
    *    to its minimum smaller neighbor — chains fold in half.
    *
    * Convergence = edge-frame fixpoint, detected by (count, hash-sum)
    * checksum — one tiny aggregate per round instead of a set-diff join.
    * Per-round cost: 2 shuffles on the edge frame (groupBy + join), edges
    * never amplified beyond the symmetric 2|E|; localCheckpoint truncates
    * the iterative lineage exactly as in [[connectedComponents]].
    */
  def connectedComponentsStar(
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIter: Int = 50): DataFrame =
    connectedComponentsStarCore(pairs, aCol, bCol, maxIter)._1

  /** [[connectedComponentsStar]] + the executed round count (exposed so the
    * O(log n) bound is testable, not asserted).
    */
  private[graft] def connectedComponentsStarCore(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int): (DataFrame, Int) = {
    // canonical undirected edge frame (lo < hi), self-loops dropped
    var e = pairs
      .select(least(col(aCol), col(bCol)).as("lo"), greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint()

    // overflow-free under ANSI mode: XOR is closed over longs, and the
    // 32-bit-masked sum stays under 2^63 for any realistic edge count
    def checksum(df: DataFrame): (Long, Long, Long) = {
      val h = xxhash64(col("lo"), col("hi"))
      val r = df
        .agg(count(lit(1)), coalesce(bit_xor(h), lit(0L)),
          coalesce(sum(h.bitwiseAND(lit(0xFFFFFFFFL))), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    var prev = checksum(e)
    var iter = 0
    var converged = prev._1 == 0L
    while (!converged && iter < maxIter) {
      // large-star: ∀u, every neighbor v > u re-links to m(u) = min(N(u)∪u).
      // Each undirected edge contributes exactly one emission (from its
      // smaller endpoint's neighborhood), so the frame never amplifies.
      val sym = e
        .select(col("lo").as("u"), col("hi").as("v"))
        .unionByName(e.select(col("hi").as("u"), col("lo").as("v")))
      val mins = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      // NO distinct here: duplicate (lo, hi) emissions (two vertices
      // re-linking the same pair) are harmless to the small-star phase —
      // byHi's min ignores them and the round-final distinct removes them
      // — so deduping early would buy nothing but one extra shuffle per
      // round. Row count stays ≤ |E| either way (one emission per edge).
      val largeRaw = sym
        .filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("m").as("lo"), col("v").as("hi")) // m ≤ u < v
        .filter(col("lo") =!= col("hi"))
      // the small-star phase consumes `large` twice (groupBy + join).
      // Materialize it only when recomputation is the bigger cost: the
      // previous checksum gives the EXACT current edge count for free, so
      // small frames skip the checkpoint job (per-round fixed costs
      // dominate at fixture scale) while big frames keep it (recomputing
      // a billion-edge phase twice is the real 100 TB cost).
      // lazy: materialized by the checksum job below on first use
      val large = if (prev._1 < 1000000L) largeRaw else largeRaw.localCheckpoint(false)
      val largeCkpt = large // released once `small` is materialized below
      // small-star: ∀u, its smaller neighbors and u itself all link to
      // min(N⁻(u)) — grouped on the hi side of the canonical frame.
      val byHi = large.groupBy("hi").agg(min(col("lo")).as("m"))
      val small = large
        .join(byHi, "hi")
        .select(col("m").as("lo"), col("lo").as("hi")) // re-link v ∈ N⁻ to m ≤ v
        .filter(col("lo") =!= col("hi"))
        .unionByName(byHi.select(col("m").as("lo"), col("hi"))) // u itself to m
        .distinct()
        // LAZY: the checksum below is a full-scan aggregate, so it
        // materializes the checkpoint in the SAME job — one job per round
        // instead of checkpoint-then-checksum
        .localCheckpoint(false)
      val cur = checksum(small)
      // `small` is now materialized and lineage-truncated: the previous
      // round's edge frame and this round's large-star intermediate are
      // dead — release their blocks (AFTER the checksum; releasing first
      // would tear blocks out from under the uncomputed lazy checkpoint)
      releaseCheckpoint(largeCkpt)
      releaseCheckpoint(e)
      converged = cur == prev || cur._1 == 0L
      prev = cur
      e = small
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds — the edge frame " +
          "is a partially contracted star forest and labels read from it would be WRONG. " +
          "The alternation converges in O(log n) rounds, so exhaustion signals a genuine " +
          "anomaly (or an absurdly low maxIter), never a tolerable approximation.")
    // fixpoint frame is a star forest: hi = member, lo = component min;
    // vertices that only ever appeared in self-loops label themselves
    val verts = pairs
      .select(col(aCol).as("doc"))
      .unionByName(pairs.select(col(bCol).as("doc")))
      .distinct()
    val labels = e
      .select(col("hi").as("doc"), col("lo").as("cluster"))
      .unionByName(e.select(col("lo").as("doc"), col("lo").as("cluster")))
      .groupBy("doc")
      .agg(min(col("cluster")).as("cluster"))
    (verts
      .join(labels, Seq("doc"), "left")
      .select(col("doc"), coalesce(col("cluster"), col("doc")).as("cluster")), iter)
  }

  /** Integer-arithmetic PageRank over an undirected pair graph — the
    * centrality-based CANONICAL-MEMBER selection for duplicate clusters
    * (pick the hub of a near-dup cluster instead of [[dropNearDuplicates]]'
    * min-id convention: the hub is the version most others resemble).
    *
    * All arithmetic is integer: ranks live in q9 fixed point
    * (r₀ = 10⁹ div N), each node's per-edge share is `r div deg`, and the
    * damped update is `((den−num)·(10⁹ div N)) div den +
    * (num·Σshares) div den` — truncating integer division at every step,
    * so ranks are hash-exact cross-engine (classic float PageRank would
    * accumulate libm-free but order-dependent sums through `sum(double)`).
    * The truncation loses ≤1e-9 of mass per edge per round — irrelevant
    * for ranking, which only compares peers inside a cluster.
    *
    * Undirected near-dup graphs have symmetric edges, so every node has
    * in-degree ≥ 1 and the dangling-mass term of general PageRank never
    * arises (documented simplification).
    *
    * Scale shape per iteration: one edge-keyed equi join (edges ⋈ current
    * ranks on src) + one hash aggregation on dst — the identical shuffle
    * pair [[connectedComponents]] pays per round, linear in |edges|.
    * `iters` is fixed (default 3): ranking stabilizes in a few rounds on
    * diameter-bounded dup clusters, and a fixed count keeps the oracle
    * unrollable.
    */
  def pagerankInteger(
      pairs: DataFrame,
      iters: Int = 3,
      dampNum: Long = 85,
      dampDen: Long = 100,
      aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    require(dampNum > 0 && dampNum < dampDen, "damping must be a proper fraction")
    // pairs are unique with a < b, so the two directions are distinct rows
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy(col("src").as("doc")).agg(count(lit(1)).as("deg"))
    val nNodes = deg.agg(count(lit(1)).as("n"))
    var r = deg
      .join(broadcast(nNodes))
      .select(col("doc"), col("deg"), col("n"), expr("1000000000L div n").as("r_q9"))
    (0 until iters).foreach { _ =>
      val shares = r.select(col("doc").as("src"), expr("r_q9 div deg").as("share"))
      val contrib = edges
        .join(shares, Seq("src"))
        .groupBy(col("dst").as("doc"))
        .agg(sum(col("share")).as("contrib"))
      r = r
        .select(col("doc"), col("deg"), col("n"))
        .join(contrib, Seq("doc"), "left")
        .select(col("doc"), col("deg"), col("n"),
          (expr(s"(($dampDen - $dampNum) * (1000000000L div n)) div $dampDen") +
            expr(s"($dampNum * coalesce(contrib, 0L)) div $dampDen")).as("r_q9"))
    }
    r.select(col("doc"), col("r_q9").as("rank_q9"))
  }

  /** Per-row WEIGHTED deterministic sample: row kept with probability
    * `weightCol` (clamped to [0, 1]) — the length/quality-proportional
    * sampling a byte-budgeted curation pass runs, with the same
    * no-RNG retry-stability contract as [[sampleStratified]] (keep
    * decision is a pure function of (id, salt, weight)). Map-only,
    * shuffle-free.
    */
  def sampleWeighted(
      docs: DataFrame,
      idCol: String,
      weightCol: Column,
      salt: String): DataFrame = {
    val keepBelow = floor(least(greatest(weightCol, lit(0.0)), lit(1.0)) * Buckets).cast("long")
    docs.filter(hashBucket(col(idCol), salt) < keepBelow)
  }

  /** Exactly-k-per-stratum deterministic sample: rank documents inside
    * each stratum by salted hash (ties broken by id) and keep the first
    * `k` — a fixed-size uniform sample per group, reproducible with no
    * RNG. Complements [[sampleStratified]] (fixed RATE) when the
    * contract is a fixed COUNT (eval subsets, per-source probes).
    *
    * Scale shape: one shuffle on the stratum; Spark 4's WindowGroupLimit
    * rewrites the `row_number <= k` filter into a per-partition top-k
    * BEFORE the exchange, so only ~k rows per stratum per input
    * partition ever shuffle — not the corpus.
    */
  def sampleFixedK(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      k: Int,
      salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window
      .partitionBy(stratumCol)
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    docs
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Epoch-weight replication — training-data mixing: each document is
    * emitted `floor(w)` times, plus one more with probability `frac(w)`
    * decided by its salted hash bucket, where `w` is its stratum's mixing
    * weight (e.g. books 2.5 epochs, boilerplate web 0.3). The emitted
    * `copy` column is 0-based.
    *
    * This is the standard "sample with replacement by source weight" step
    * of assembling a pretraining mixture, made exactly reproducible: the
    * copy count is a pure function of (id, stratum, weights, salt) — no
    * RNG, so a re-run or a retried partition produces the identical
    * mixture. Map-side explode, no shuffle; output size is
    * Σ weight×|stratum| by construction.
    */
  def repeatByWeight(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      weights: Map[String, Double],
      defaultWeight: Double,
      salt: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0, "weights must be >= 0")
    def parts(w: Double) = (math.floor(w).toLong, math.floor((w - math.floor(w)) * Buckets).toLong)
    val rateRows = weights.toSeq
      .map { case (k, w) => val (i, f) = parts(w); (k, i, f) }
      .toDF(stratumCol, "_w_int", "_w_frac")
    val (di, df) = parts(defaultWeight)
    val reps =
      coalesce(col("_w_int"), lit(di)) +
        when(hashBucket(col(idCol), salt) < coalesce(col("_w_frac"), lit(df)), 1L).otherwise(0L)
    docs
      .join(broadcast(rateRows), Seq(stratumCol), "left")
      .withColumn("copy",
        explode(when(reps > 0, sequence(lit(0L), reps - 1)).otherwise(array().cast("array<long>"))))
      .drop("_w_int", "_w_frac")
  }

  /** End-to-end near-duplicate removal — the curation deliverable the
    * pair/cluster operators feed: given the near-dup pair set, keep every
    * document except non-canonical cluster members (each cluster keeps
    * its smallest id). Composes [[connectedComponents]] with one
    * anti-join; docs in no pair are untouched.
    */
  def dropNearDuplicates(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val nonCanonical = connectedComponents(pairs)
      .filter(col("doc") =!= col("cluster"))
      .select(col("doc").as(idCol))
    // the removal set is pair-scale (tiny vs the corpus) — broadcast the
    // anti-join so the corpus side never shuffles
    docs.join(broadcast(nonCanonical), Seq(idCol), "left_anti")
  }

  /** Fixed-window character chunking with stride — the embedding/context
    * pipeline shape: each document yields substring chunks of `len`
    * characters starting every `stride` characters (overlap =
    * len - stride), with `chunk_idx` 0-based. Documents shorter than
    * `len` yield exactly one (whole-document) chunk.
    *
    * Map-side explode — chunking happens where the row lives, no
    * shuffle; output volume is ~n_chars/stride per document. The
    * substring lambda slices an attribute (not a computed expression),
    * so there is no lambda-recompute trap (see SNIPPETS/PLANS notes on
    * CollapseProject).
    */
  def chunkByChars(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      len: Int,
      stride: Int): DataFrame = {
    require(len > 0 && stride > 0 && stride <= len,
      "need 0 < stride <= len (stride > len would drop text)")
    val n = length(col(textCol))
    // last chunk start: the largest multiple of stride still < n_chars,
    // clamped so a final sliver shorter than (len - stride) — already
    // fully covered by the previous chunk — is not emitted twice
    val lastStart = greatest(ceil((n - len).cast("double") / stride).cast("long"), lit(0L))
    docs
      .select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0L), lastStart),
            i => col(textCol).substr((i * stride + 1).cast("int"), lit(len))))
          .as(Seq("chunk_idx", "chunk")))
  }

  /** CONTENT-DEFINED chunking (word-level CDC): a chunk boundary falls
    * AFTER every token whose portable 60-bit hash ≡ 0 (mod `boundaryMod`)
    * — expected chunk length ≈ boundaryMod tokens. Unlike the
    * fixed-window [[chunkByChars]], boundaries depend only on LOCAL
    * content, so inserting or deleting a prefix re-chunks ONLY up to the
    * first surviving boundary and every later chunk is byte-identical —
    * the property that makes chunk-level dedup and delta-storage work
    * across document revisions (the storage-dedup CDC idea applied at
    * token granularity; CurationSpec pins the shift-resistance law).
    *
    * Emits (doc, chunk_idx, n_toks, chunk_md5). Shape: one doc-keyed
    * exchange carries the boundary prefix-count window AND the per-chunk
    * aggregation (superset grouping key); everything else is map-side.
    * The boundary hash is [[Dedup.md5Long]], so the whole operator is
    * oracle-checkable bit-for-bit.
    */
  def cdcChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      boundaryMod: Int): DataFrame = {
    require(boundaryMod > 0, "boundaryMod must be positive")
    val w = Window.partitionBy("doc").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol).as("doc"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("b",
        when(pmod(Dedup.md5Long(col("tok")), lit(boundaryMod)) === 0, 1L).otherwise(0L))
      // chunk of a token = boundaries strictly BEFORE it (a boundary token
      // closes its own chunk)
      .withColumn("chunk_idx", coalesce(sum(col("b")).over(w), lit(0L)))
      .groupBy(col("doc"), col("chunk_idx"))
      .agg(
        count(lit(1)).as("n_toks"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok")))).as("chunk_md5"))
  }

  // ---- scrubbing / redaction ----------------------------------------------

  /** PII patterns for redaction — intentionally simple, high-recall
    * regexes of the kind every curation pipeline starts from (RFC-exact
    * email parsing is not the goal; not leaking obvious PII into a
    * training set is). Patterns use the portable subset shared by Java
    * regex and RE2, so scrubs stay oracle-checkable.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"

  /** Replace every match of `pattern` with `replacement` and count the
    * matches — one scan of the text for the count, one for the rewrite,
    * both codegen'd per-row expressions (map-only at any scale).
    * Returns (scrubbed, n_hits).
    */
  def scrub(text: Column, pattern: String, replacement: String): (Column, Column) =
    (regexp_replace(text, pattern, replacement),
      size(regexp_extract_all(text, lit(pattern), lit(0))))

  /** Chain the three PII scrubs: emails → IPv4 → phone-ish numbers.
    * Order matters (an email scrub can break a phone match inside it);
    * fixed here so results are reproducible.
    */
  def redactPii(text: Column): Column = {
    val (e, _) = scrub(text, EmailRe, "<EMAIL>")
    val (i, _) = scrub(e, Ipv4Re, "<IP>")
    val (p, _) = scrub(i, PhoneRe, "<PHONE>")
    p
  }

  /** Blocklist scrub: replace whole-word occurrences of any blocklisted
    * term. Word boundaries keep `spark` from matching inside `sparkle`.
    */
  def blocklistPattern(terms: Seq[String]): String =
    terms.map(java.util.regex.Pattern.quote).mkString("\\b(", "|", ")\\b")

  /** Snapshot diff between two corpus versions: per key, classify as
    * `added` (only in v2), `removed` (only in v1), `changed` (both, payload
    * fingerprints differ) or `unchanged` — the release audit every
    * versioned dataset runs (what moved between crawl N and crawl N+1).
    *
    * Scale shape: each side projects to (key, fingerprint) BEFORE the full
    * outer join, so only 16-byte fingerprints — never document payloads —
    * ride the join shuffle; one key exchange per side, no driver-side
    * state. `fingerprint` is any deterministic Column over the version's
    * payload (md5 of the text, a struct hash, …).
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, key: String, fingerprint: Column): DataFrame = {
    val a = v1.select(col(key).as("k1"), fingerprint.as("fp1"))
    val b = v2.select(col(key).as("k2"), fingerprint.as("fp2"))
    a.join(b, col("k1") === col("k2"), "full_outer")
      .select(
        coalesce(col("k1"), col("k2")).as(key),
        when(col("k1").isNull, "added")
          .when(col("k2").isNull, "removed")
          // null-safe: a NULL fingerprint (md5 of a NULL payload) must
          // compare as a real value — plain =!= yields NULL here and
          // would fall through to 'unchanged', silently hiding a change
          .when(!(col("fp1") <=> col("fp2")), "changed")
          .otherwise("unchanged").as("change"))
  }

  /** k-anonymity audit — the re-identification compliance gate a dataset
    * passes before release: group by the quasi-identifier columns; any
    * group smaller than `k` is re-identifiable (its members are uniquely
    * described by attributes an adversary can look up). Also emits the
    * l-diversity count over `sensitiveCol` (a group whose sensitive value
    * is constant leaks it even at size ≥ k). ONE partial+final aggregation
    * keyed by the quasi tuple — the same plan as any rollup; at 100 TB the
    * group count is bounded by the quasi-space, not the corpus.
    * Returns (quasiCols…, group_size, distinct_sensitive, at_risk).
    */
  def kAnonymityAudit(
      recs: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, "k below 2 never flags anything")
    recs
      .groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("group_size"),
        count_distinct(col(sensitiveCol)).as("distinct_sensitive"))
      .withColumn("at_risk", col("group_size") < k)
  }

  /** HTML boilerplate removal — the main-content extraction step every
    * web-crawl pipeline runs before any text op (the trafilatura /
    * jusText stage, reduced to its deterministic regex core): drop
    * non-content blocks (`script`/`style`/`nav`/`header`/`footer`), strip
    * the remaining tags to spaces, collapse whitespace. Pure per-row
    * `regexp_replace` chain — map-only, inside WholeStageCodegen, zero
    * shuffle at any scale; RE2-portable patterns (lazy `.*?` + `(?s)`)
    * so the oracle replays them verbatim. A real extractor swaps in a
    * DOM-aware kernel behind the same Column contract.
    */
  def htmlMainText(html: Column): Column = {
    val blocks = Seq("script", "style", "nav", "header", "footer")
    val noBlocks = blocks.foldLeft(html)((c, t) =>
      regexp_replace(c, s"(?s)<$t[^>]*>.*?</$t>", ""))
    trim(regexp_replace(regexp_replace(noBlocks, "<[^>]*>", " "), "\\s+", " "))
  }

  /** Right-to-erasure cascade audit — the GDPR/DSAR delete applied across
    * every table that carries the subject key, with per-table
    * before/removed/after accounting in ONE result (the evidence a
    * compliance run must produce). The deletion list arrives as DATA (a
    * key frame, typically thousands of rows — broadcast), never as a
    * predicate: each fact table takes ONE scan — a broadcast left join
    * marks doomed rows and a single conditional aggregation counts both
    * populations; no per-table anti-join + recount double scan. Returns
    * one row per table: (table_name, rows_before, rows_removed,
    * rows_after).
    */
  def erasureAudit(
      tables: Seq[(String, DataFrame, String)],
      del: DataFrame,
      delKeyCol: String): DataFrame = {
    require(tables.nonEmpty, "need at least one table")
    val marks = del.select(col(delKeyCol).as("__k")).distinct()
      .withColumn("__doomed", lit(1L))
    tables.map { case (name, df, keyCol) =>
      df
        .join(broadcast(marks), df(keyCol) === col("__k"), "left")
        .agg(
          count(lit(1)).as("rows_before"),
          coalesce(sum(col("__doomed")), lit(0L)).as("rows_removed"))
        .select(lit(name).as("table_name"), col("rows_before"),
          col("rows_removed"),
          (col("rows_before") - col("rows_removed")).as("rows_after"))
    }.reduce(_ unionByName _)
  }

  /** Temperature-based mixture shares at α = 0.5 — the multilingual /
    * multi-source re-balancing move (sample ∝ size^α flattens the
    * distribution so small sources stop vanishing; α=0.5 is the
    * mBERT/XLM-R exponent). α is FIXED at 0.5 because `sqrt` is the one
    * fractional power IEEE requires correctly rounded — `pow(x, α)` is
    * libm-drift territory and could never hash-match across engines.
    * Arithmetic: per-group exact integer sizes; `w = floor(sqrt(size ·
    * 10¹²))` (≈ 10⁶·√size — the long→double→sqrt→floor chain is
    * deterministic and identical in both engines even past 2^53, since
    * long→double rounding is IEEE-defined); shares as exact integer
    * floor-divisions at q6 against broadcast singleton totals. Returns
    * one row per group: (groupCol, size, share_q6 (α=1, the raw share),
    * share_half_q6 (α=0.5)) — the α=1 column makes the flattening
    * visible: small groups gain, large groups shed.
    * Plan: one partial+final agg on the group key, a 1-row broadcast
    * total, map-only division — group-count-sized everything.
    */
  def temperatureShares(df: DataFrame, groupCol: String, sizeCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol))
      .agg(sum(col(sizeCol)).as("size"))
      .withColumn("w", floor(sqrt(col("size").cast("double") * 1e12)).cast("long"))
    val totals = per.agg(sum(col("size")).as("tot_size"), sum(col("w")).as("tot_w"))
    per
      .crossJoin(broadcast(totals))
      .select(col(groupCol), col("size"),
        expr("size * 1000000 div tot_size").as("share_q6"),
        expr("w * 1000000 div tot_w").as("share_half_q6"))
  }
}
