package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of MATERIALIZED (`localCheckpoint`) frames, keyed by
  * a caller-chosen string — the cross-QUERY companion of
  * [[Dedup.Intermediate]] (which materializes within one query's plan).
  *
  * Why it exists: several declared query families derive from one shared,
  * expensive intermediate — the sized-LSH mutual-kNN edge frame feeds the
  * whole graph family, the Jaccard pair/cluster frame feeds the near-dup
  * resolution family. Run independently — the driver's Verify and Bench
  * call each declared query as a separate closure — every consumer would
  * rebuild the identical frame from raw text/vectors, multiplying the
  * single most expensive stage by the consumer count (measured: the graph
  * family rebuilt its edge frame 12×, ~35 s of a 346 s full bench). The
  * memo builds it once per (session, key) and hands every later consumer
  * the already-materialized blocks.
  *
  * Scale notes:
  *  - Memoized frames must be corpus-DERIVED but bounded (edge frames are
  *    ≤ |V|·k rows, pair frames output-bounded) — callers hold that
  *    contract; nothing here is driver-side.
  *  - On a real cluster the same role is played by a persisted table
  *    ([[Dedup.Intermediate.Bucketed]], [[Similarity.lshIndexFrame]]);
  *    this memo is the in-session equivalent, sized to executor storage
  *    memory (localCheckpoint blocks spill to disk under pressure).
  *  - LIFECYCLE (round 14): entries live until [[release]]d. An un-evicted
  *    memo was measured displacing LATER families' sorts out of the
  *    storage-protected memory half at ×100 (`q_minhash_accuracy`
  *    1.5–3.9 GB in-session sort spill, zero solo — the blocks themselves
  *    were never the consumer's problem, their residency was). Callers
  *    with global query-order knowledge (Bench) learn each key's consumer
  *    set via [[withConsumer]] and release a family's blocks after its
  *    last declared consumer; everyone else can leave entries alive for
  *    the session, which is the correct default for a verify pass.
  */
object Memo {
  private val frames = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val longs = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Session identity for memo keys: a per-object UUID from a weak
    * registry (`sessionUUID` itself is `private[sql]`). Never
    * `identityHashCode`: a GC'd test session's reused identity hash could
    * alias a live session's entry and hand it a stale frame/count. Weak
    * keys keep the registry from pinning dead sessions (their frames hold
    * the session strongly only while memo entries exist).
    */
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  private def sid(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  /** The frame built by `build`, localCheckpoint-materialized exactly once
    * per (session, key); later calls return the cached frame. `build` runs
    * eagerly (the checkpoint executes the job) so the first caller pays
    * the build and every subsequent consumer starts from blocks.
    */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    record(key)
    frames.getOrElseUpdate(s"${sid(s)}|$key", build.localCheckpoint())
  }

  /** A memoized frame whose builder performs its OWN materialization (e.g.
    * a [[Dedup.Intermediate.Bucketed]] managed-table write) — no
    * localCheckpoint is added, so the frame holds ZERO storage memory:
    * consumers re-read warehouse parquet instead of memory blocks. This is
    * the residency-relief variant of [[cached]] for corpus-derived frames
    * whose blocks were measured displacing their own consumers' sorts out
    * of unified memory at ×100 (the q_minhash_accuracy displacement —
    * Bench's release schedule frees blocks only AFTER a family's last
    * consumer, which cannot help the consumer that reads the frame while
    * sorting next to it). Consumer learning and release bookkeeping are
    * identical; release of a table-backed frame is a registry drop (the
    * table itself is GC'd by `Intermediate.dropBucketedTables`).
    */
  def cachedVia(s: SparkSession, key: String)(make: => DataFrame): DataFrame = {
    record(key)
    frames.getOrElseUpdate(s"${sid(s)}|$key", {
      // ADOPT the managed tables the builder creates (round 15): they must
      // leave the per-invocation `Intermediate.created` registry, or any
      // single query's registry drop (`dropBucketedTables(spark)` without
      // the sweep — several tests GC that way) deletes a table a live memo
      // entry still reads. Adopted tables are dropped HERE, at release.
      val before = Dedup.Intermediate.createdSnapshot
      val df = make
      val mine = Dedup.Intermediate.createdSnapshot -- before
      Dedup.Intermediate.adopt(mine)
      if (mine.nonEmpty) tablesByKey.put(s"${sid(s)}|$key", mine)
      df
    })
  }

  private val tablesByKey = scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  private def dropAdopted(s: SparkSession, fullKey: String): Unit =
    tablesByKey.remove(fullKey).foreach(_.foreach { t =>
      try s.sql(s"DROP TABLE IF EXISTS `$t`")
      catch { case _: Throwable => () } // release is best-effort GC
    })

  /** A session-scoped memoized scalar — the companion for MEASURED volumes
    * of memoized frames (a `count()` over already-checkpointed blocks is
    * one cheap scan, but consumers like `Scale.sizedPartitions` callers
    * re-ask per query and per bench rep; pay it once per session).
    */
  def cachedLong(s: SparkSession, key: String)(build: => Long): Long = {
    record(key)
    longs.getOrElseUpdate(s"${sid(s)}|$key", build)
  }

  // ---- consumer tracking + release (the Bench lifecycle) -----------------

  /** Memo keys embed the data directory (`family|/path/to/sf`), so the
    * warm pass (sf0.001) and the timed run (sf0.1) cache DISTINCT frames;
    * consumer learning must be dir-INDEPENDENT or the warm pass would
    * teach nothing about the timed keys. The family is the key with its
    * path-shaped segments dropped.
    */
  private def family(key: String): String =
    key.split('|').filterNot(_.startsWith("/")).mkString("|")

  private val consumersByFamily =
    scala.collection.concurrent.TrieMap.empty[String, scala.collection.concurrent.TrieMap[String, Unit]]
  private val currentTag = new ThreadLocal[String]

  /** Run `body` with memo accesses attributed to consumer `tag` (a query
    * name). Attribution happens at frame-CONSTRUCTION time on the driver
    * (the declared query closures call [[cached]] while building their
    * DataFrame), so wrapping the closure invocation is sufficient —
    * nothing executor-side is tagged.
    */
  def withConsumer[T](tag: String)(body: => T): T = {
    val prev = currentTag.get
    currentTag.set(tag)
    try body finally currentTag.set(prev)
  }

  private def record(key: String): Unit = {
    val tag = currentTag.get
    if (tag != null)
      consumersByFamily
        .getOrElseUpdate(family(key), scala.collection.concurrent.TrieMap.empty)
        .put(tag, ())
  }

  /** The consumer tags learned (via [[withConsumer]]) for each family so
    * far — Bench reads this after its warm pass (which runs EVERY query,
    * so the sets are complete) to schedule releases.
    */
  def learnedConsumers: Map[String, Set[String]] =
    consumersByFamily.map { case (f, tags) => f -> tags.keySet.toSet }.toMap

  /** Drop this session's entries for `fam` (all dirs) and unpersist their
    * checkpoint blocks. The frames are localCheckpoint-backed LogicalRDDs;
    * unpersisting the RDD frees the storage blocks immediately (the frame
    * is unusable afterwards — callers release only PAST a family's last
    * consumer). Non-blocking: block removal races nothing (no job runs on
    * a released family again).
    */
  def release(s: SparkSession, fam: String): Unit = {
    val pfx = s"${sid(s)}|"
    frames.keys.filter(k => k.startsWith(pfx) && family(k.stripPrefix(pfx)) == fam)
      .foreach { k =>
        frames.remove(k).foreach(unpersistCheckpoint)
        dropAdopted(s, k)
      }
    longs.keys.filter(k => k.startsWith(pfx) && family(k.stripPrefix(pfx)) == fam)
      .foreach(longs.remove)
  }

  /** Drop this session's entries whose key embeds `dir` — Bench calls this
    * once after the warm pass so sf0.001 warm frames never hold storage
    * into the timed run.
    */
  def releaseDir(s: SparkSession, dir: String): Unit = {
    val pfx = s"${sid(s)}|"
    frames.keys.filter(k => k.startsWith(pfx) && k.split('|').contains(dir))
      .foreach { k =>
        frames.remove(k).foreach(unpersistCheckpoint)
        dropAdopted(s, k)
      }
    longs.keys.filter(k => k.startsWith(pfx) && k.split('|').contains(dir))
      .foreach(longs.remove)
  }

  private def unpersistCheckpoint(df: DataFrame): Unit =
    try
      df.queryExecution.analyzed.foreach {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
        case _ => ()
      }
    catch { case _: Throwable => () } // release is best-effort block GC
}
