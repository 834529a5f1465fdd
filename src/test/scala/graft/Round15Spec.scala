package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Memo}

/** Round-15 optimization pins: the memo-owned managed-table lifecycle
  * (adopted tables survive per-invocation registry drops and die at
  * release), and the plan shapes of the queries restructured this round
  * (attribution collapse, market-basket array pairs, shared posting
  * table, checkpointed Cramér's-V cell frame). Semantics of every
  * restructured query stay covered by their existing recompute tests +
  * the oracle gate; these tests pin the PHYSICAL shapes the round's
  * measurements rely on.
  */
class Round15Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SfDir).queryExecution.executedPlan.toString
  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("Memo.cachedVia adopts its managed tables: a registry drop cannot break a live memo") {
    val key = s"r15-adopt-${System.nanoTime}"
    val f = Memo.cachedVia(spark, key) {
      Dedup.Intermediate.Bucketed(2).keyed(
        Seq((1L, 10L), (2L, 20L), (3L, 20L)).toDF("k", "v"), "r15_adopt_probe", "k")
    }
    assert(f.count() == 3)
    // the per-invocation registry drop (what several suites and any single
    // query's teardown run) must NOT delete the memo's table...
    Dedup.Intermediate.dropBucketedTables(spark)
    assert(f.count() == 3, "live memoized table must survive a registry drop")
    // ...release drops it (table-backed memos hold no storage memory; the
    // release IS the disk GC)
    val table = spark.catalog.listTables().collect()
      .map(_.name).filter(_.contains("r15_adopt_probe"))
    assert(table.nonEmpty, "the adopted table exists until release")
    Memo.release(spark, key)
    assert(spark.catalog.listTables().collect()
      .forall(!_.name.contains("r15_adopt_probe")),
      "release must drop the adopted table")
  }

  test("unsorted bucketed write: same rows, same bucket layout, no write sort") {
    import graft.ext.Scale
    val df = (1L to 500L).map(i => (i, i % 7)).toDF("a", "b")
    val tSorted = s"r15_bw_sorted_${System.nanoTime}"
    val tUnsorted = s"r15_bw_unsorted_${System.nanoTime}"
    Scale.writeBucketed(df, tSorted, "a,b", 4)
    Scale.writeBucketed(df, tUnsorted, "a,b", 4, sortedFiles = false)
    try {
      // identical content
      val s = spark.table(tSorted).orderBy("a").collect().toSeq
      val u = spark.table(tUnsorted).orderBy("a").collect().toSeq
      assert(s == u, "unsorted bucketed write must round-trip identical rows")
      // identical bucket spec — the join-side exchange elision both
      // consumers (PlanSpec's minhash pin) rely on
      def buckets(t: String): String = spark.sql(s"DESCRIBE EXTENDED $t")
        .collect().map(r => r.getString(0) + "=" + r.getString(1))
        .filter(_.startsWith("Num Buckets")).mkString
      assert(buckets(tUnsorted) == buckets(tSorted),
        "bucket count must match the sorted form")
      // file layout: the bucket-key repartition puts exactly one bucket in
      // each write task — EXACTLY one file per bucket. The sorted form
      // writes one file per (input task × bucket) when its input is not
      // bucket-aligned (measured here: 16 files for 4 buckets from a
      // 4-partition input), so the unsorted form is also the small-files
      // fix for the candidate table (×100: ≤ 32 files instead of ~1024)
      def files(t: String): Int = {
        val loc = spark.sql(s"DESCRIBE EXTENDED $t").collect()
          .find(_.getString(0) == "Location").get.getString(1)
        new java.io.File(new java.net.URI(loc)).listFiles()
          .count(_.getName.endsWith(".parquet"))
      }
      assert(files(tUnsorted) == 4,
        s"unsorted form must write exactly one file per bucket")
      assert(files(tSorted) >= files(tUnsorted),
        s"the sorted form fans out per (task × bucket)")
      // the write plan itself must carry NO Sort under concurrent writers
      // (V1WritesUtils.getSortOrder skips the logical sort exactly when
      // the bucket spec has no sortBy columns and
      // maxConcurrentOutputFileWriters > 0) — the mechanism the ×100
      // spill fix relies on, pinned against Spark upgrades
      val ck = "spark.sql.maxConcurrentOutputFileWriters"
      val prev = spark.conf.getOption(ck)
      // a separate source view: Spark rejects reading and overwriting the
      // SAME table at analysis (UNSUPPORTED_OVERWRITE), which EXPLAIN runs
      val srcView = s"r15_bw_src_${System.nanoTime}"
      df.createOrReplaceTempView(srcView)
      def insertPlan(t: String): String =
        spark.sql(s"EXPLAIN FORMATTED INSERT OVERWRITE TABLE $t SELECT * FROM $srcView")
          .collect().map(_.getString(0)).mkString
      spark.conf.set(ck, "8")
      try {
        assert(!insertPlan(tUnsorted).contains("Sort ["),
          "no-sortBy bucketed write under concurrent writers must plan no Sort")
        assert(insertPlan(tSorted).contains("Sort ["),
          "the sortBy form plans the per-task write sort (the cost the " +
            "unsorted form removes)")
      } finally prev match {
        case Some(v) => spark.conf.set(ck, v)
        case scala.None => spark.conf.unset(ck)
      }
    } finally Seq(tSorted, tUnsorted).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("attribution collapse: windows consume per-(purchase, channel) aggregates, not raw touch rows") {
    // linear + decay: the Window's input is the collapsed HASH aggregate
    // (keys start with user_id, p_id) — raw touch rows never enter a sort.
    // The collapse must stay hash-aggregatable (count/sum only): a struct
    // or other non-primitive agg buffer would silently plan a
    // SortAggregate inside the join stage — measured 1.15 GB of ×100 sort
    // spill when the U-shaped variant tried min/max(struct) (that query
    // keeps its r14 p_id-exchange window form, see its comment).
    for (q <- Seq("q_linear_attribution", "q_decay_attribution")) {
      val p = plan(q)
      val wIdx = p.indexOf("Window")
      assert(wIdx >= 0, s"$q keeps its per-purchase window:\n$p")
      val below = p.substring(wIdx)
      assert(below.contains("HashAggregate(keys=[user_id"),
        s"$q: the window must consume the per-(purchase, channel) collapse:\n$p")
      assert(!p.contains("SortAggregate"),
        s"$q: the collapse must stay hash-aggregatable:\n$p")
    }
  }

  // q_assoc_rules keeps its r13 shape: both round-15 alternatives to the
  // tx self-join (SHUFFLE_HASH; collect_list + posexplode expansion) were
  // measured at ×100 and LOST on wall — the negative results live in the
  // marketBasket scaladoc + BASELINE.md. PlanSpec pins the surviving shape.

  test("q_dedup_containment shares the jaccard family's posting table") {
    val p = plan("q_dedup_containment")
    assert(p.contains("graft_shared_postings"),
      s"containment must read the shared bucketed posting table:\n$p")
    // and the candidate build consumes the same table (one tokenize pass
    // per session for both families)
    val cand = graft.ext.DedupQueries.bucketedPostings(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(cand.contains("graft_shared_postings"), cand)
  }

  test("q_cramers_v: the cell frame is checkpointed — one corpus aggregate, not three") {
    val p = plan("q_cramers_v")
    assert(!p.contains("Scan parquet"),
      s"downstream of the checkpoint no subtree re-scans the corpus:\n$p")
    assert(count(p, "Scan ExistingRDD") >= 1,
      s"the grid/margin subtrees read the checkpointed cells:\n$p")
  }
}
