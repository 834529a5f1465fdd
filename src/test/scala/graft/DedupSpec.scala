package graft

import graft.ext.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Dedup operator semantics not already pinned by the DuckDB oracles. */
class DedupSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("aggregation-form unigram simhash equals the per-row fold reference") {
    val d = Tables.documents(spark, SfDir).cache()
    val ref = d.select(col("doc_id"),
      Dedup.simhash48(TextOps.tokens(col("text"))).as("ref_sh"),
      size(TextOps.tokens(col("text"))).as("n_tok"))
    val agg = Dedup
      .simhashSignatures(d, "doc_id", "text", ngram = 1)
      .select(col("doc").as("doc_id"), col("sh").as("agg_sh"))
    val joined = ref.join(agg, Seq("doc_id"), "left").cache()
    // every doc with >=1 token gets the identical fingerprint
    assert(joined.filter(col("n_tok") > 0 && (col("agg_sh").isNull ||
      col("agg_sh") =!= col("ref_sh"))).count() == 0)
    // token-less docs are the only rows the aggregation form omits
    assert(joined.filter(col("n_tok") === 0 && col("agg_sh").isNotNull).count() == 0)
    joined.unpersist()
    d.unpersist()
  }

  test("durable intermediate: identical pairs, self-join reads the materialized table once") {
    val d = Tables.documents(spark, SfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    val local = Dedup
      .jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
      .orderBy("a", "b")
      .collect()
      .toSeq
    val durable = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8,
      intermediate = Dedup.Intermediate.Durable(tmp))
    val plan = durable.queryExecution.executedPlan.toString
    // every consumer (sizes, hot-list, both join sides) scans the durable
    // parquet table; the tokenize→shingle→hash pipeline ran once, at write
    // time, and appears nowhere in the pair-join plan
    assert(plan.contains("jaccard_postings-"),
      s"join must scan the materialized postings:\n$plan")
    assert(!plan.contains("Generate"), "no re-tokenization in the downstream plan")
    assert(!plan.contains("Window"), "no shingle-window machinery in the downstream plan")
    assert(durable.orderBy("a", "b").collect().toSeq == local)
  }

  test("contamination: benchmark set broadcasts; benchmark docs fully self-overlap") {
    val d = Tables.documents(spark, SfDir)
    val out = Dedup.contamination(d, d.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", n = 3, ratioThreshold = 0.5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"membership test must broadcast the benchmark shingles:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the membership test:\n$plan")
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    // every benchmark doc overlaps itself completely
    val benchRows = rows.filter(_._1 % 97 == 0)
    assert(benchRows.nonEmpty)
    benchRows.foreach { case (id, n, hit, ov, flag) =>
      assert(n == hit && ov == 1.0 && flag, s"benchmark doc $id must self-overlap fully")
    }
    // overlap is always hit/n and the flag mirrors the threshold
    rows.foreach { case (_, n, hit, ov, flag) =>
      assert(ov == hit.toDouble / n && flag == (ov >= 0.5))
    }
  }

  test("incremental jaccard ∪ old-round pairs ≡ full-corpus recompute") {
    val d = Tables.documents(spark, SfDir)
    val old = d.filter(col("doc_id") < 250)
    val fresh = d.filter(col("doc_id") >= 250)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val oldPairs = pairSet(Dedup.jaccardPairs(old, "doc_id", "text", n = 3, threshold = 0.8))
    // the historical corpus participates ONLY through its materialized
    // postings — no re-tokenization of `old` in the incremental call
    val corpusPostings = Dedup.postings(old, "doc_id", "text", n = 3).localCheckpoint()
    val incPairs = pairSet(Dedup.jaccardPairsIncremental(
      fresh, "doc_id", "text", n = 3, threshold = 0.8, corpusPostings))
    val fullPairs = pairSet(Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8))
    assert((oldPairs | incPairs) == fullPairs,
      s"missing=${fullPairs -- (oldPairs | incPairs)} extra=${(oldPairs | incPairs) -- fullPairs}")
    // incremental pairs all touch a new document
    assert(incPairs.forall { case (a, b, _) => a >= 250 || b >= 250 })
    assert(incPairs.nonEmpty, "fixture must contain cross-increment near-dups for a real test")
  }

  test("incremental jaccard: a re-ingested doc REPLACES its historical postings") {
    val spark0 = spark
    import spark0.implicits._
    val oldDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "nine ten eleven twelve thirteen fourteen fifteen sixteen")
    ).toDF("doc_id", "text")
    // doc 1 re-arrives with NEW content, now duplicating new doc 4
    val newText = "red orange yellow green blue indigo violet ultraviolet"
    val newDocs = Seq((1L, newText), (4L, newText)).toDF("doc_id", "text")
    val corpusPostings = Dedup.postings(oldDocs, "doc_id", "text", n = 2).localCheckpoint()
    val inc = Dedup
      .jaccardPairsIncremental(newDocs, "doc_id", "text", n = 2, threshold = 0.8, corpusPostings)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // effective corpus after replacement: {1:new, 2, 3, 4}; pairs touching
    // a new id — (1,4) at jaccard 1.0; (1,2) must be GONE (old content
    // replaced). Without the anti-join doc 1's sizes double-count and
    // (1,4) drops to 0.5, vanishing below the threshold.
    assert(inc == Set((1L, 4L, 1.0)), s"got $inc")
  }

  test("incremental LSH ≡ full-corpus LSH restricted to increment-touching pairs") {
    val d = Tables.documents(spark, SfDir)
    val old = d.filter(col("doc_id") < 250)
    val fresh = d.filter(col("doc_id") >= 250)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the historical corpus participates ONLY through its materialized
    // signatures — k longs per doc, never re-shingled
    val corpusSigs = Dedup
      .minhashSignatures(old, "doc_id", "text", n = 3, k = 16).localCheckpoint()
    val inc = pairSet(Dedup.lshCandidatesIncremental(
      fresh, "doc_id", "text", n = 3, k = 16, bands = 4, corpusSigs = corpusSigs))
    val full = pairSet(Dedup.lshCandidates(d, "doc_id", "text", n = 3, k = 16, bands = 4))
    // signatures are per-document ⇒ the restriction is EXACT, not approximate
    val restricted = full.filter { case (a, b, _) => a >= 250 || b >= 250 }
    assert(inc == restricted,
      s"missing=${restricted -- inc} extra=${inc -- restricted}")
    assert(inc.nonEmpty, "fixture must contain cross-increment candidates for a real test")
  }

  test("incremental LSH: a re-ingested doc probes with its NEW signature") {
    val spark0 = spark
    import spark0.implicits._
    val oldDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "nine ten eleven twelve thirteen fourteen fifteen sixteen")
    ).toDF("doc_id", "text")
    val newText = "red orange yellow green blue indigo violet ultraviolet"
    val newDocs = Seq((1L, newText), (4L, newText)).toDF("doc_id", "text")
    val corpusSigs = Dedup
      .minhashSignatures(oldDocs, "doc_id", "text", n = 2, k = 16).localCheckpoint()
    val inc = Dedup
      .lshCandidatesIncremental(newDocs, "doc_id", "text", n = 2, k = 16, bands = 4,
        corpusSigs = corpusSigs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // effective corpus {1:new, 2, 3, 4}: (1,4) agree on all 16 slots;
    // (1,2) must be GONE — without the anti-join doc 1's OLD signature
    // still matches doc 2's bands
    assert(inc == Set((1L, 4L, 16)), s"got $inc")
  }

  test("minhash is a mergeable sketch: sig(S1 ∪ S2) == merge(sig(S1), sig(S2))") {
    val spark0 = spark
    import spark0.implicits._
    val parts = Seq(
      ("alpha beta gamma delta", "echo foxtrot golf hotel"),
      ("one two three four five", "three four five six seven"), // overlapping sets
      ("x y z w", "x y z w") // identical sets
    ).toDF("t1", "t2")
    val sh1 = Dedup.wordShingles(TextOps.tokens(col("t1")), 2)
    val sh2 = Dedup.wordShingles(TextOps.tokens(col("t2")), 2)
    val rows = parts
      .select(
        Dedup.minhashSignature(array_union(sh1, sh2), 8).as("whole"),
        Dedup.mergeMinhash(
          Dedup.minhashSignature(sh1, 8),
          Dedup.minhashSignature(sh2, 8)).as("merged"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"union law broken: $r")
    }
  }

  test("n=1 shingle rows are the raw token stream (no window machinery)") {
    val d = Tables.documents(spark, SfDir).limit(50)
    val viaSig = Dedup.minhashSignatures(d, "doc_id", "text", n = 1, k = 4)
    // k-min over unigram hashes must match a direct per-row computation
    val direct = d
      .select(col("doc_id").as("doc"),
        Dedup.minhashSignature(array_distinct(TextOps.tokens(col("text"))), 4).as("sig0"))
      .filter(size(TextOps.tokens(col("text"))) > 0)
    val bad = viaSig
      .join(direct, Seq("doc"))
      .filter(col("sig") =!= col("sig0"))
    assert(bad.count() == 0)
    assert(viaSig.count() == direct.count())
  }

  test("spanDedup cuts exactly the shared n-gram span and keeps the rest") {
    val spark0 = spark
    import spark0.implicits._
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $span a4 a5 a6"),       // span + unique prefix/suffix
      (2L, s"b1 b2 $span b3 b4 b5 b6 b7"),    // same span, different context
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"), // unique — untouched
      (4L, "short doc")                       // < n tokens — no grams
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", n = 8, minDocs = 2)
      .orderBy("doc").collect()
    val byDoc = out.map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getString(4))).toMap
    assert(byDoc(1L) == ((14, 8, "a1 a2 a3 a4 a5 a6")))
    assert(byDoc(2L) == ((15, 8, "b1 b2 b3 b4 b5 b6 b7")))
    assert(byDoc(3L) == ((10, 0, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")))
    assert(byDoc(4L) == ((2, 0, "short doc")))
  }

  test("spanDedup overlapping duplicate grams merge their coverage (no double count)") {
    val spark0 = spark
    import spark0.implicits._
    // 9 shared tokens ⇒ two overlapping duplicate 8-grams covering 9 positions
    val span9 = (1 to 9).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, s"x1 $span9 x2"), (2L, s"y1 y2 $span9")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", n = 8, minDocs = 2)
      .orderBy("doc").collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(9, 9))
    assert(out.map(_.getString(4)).toSeq == Seq("x1 x2", "y1 y2"))
  }

  test("spanDedup: empty and whitespace-only docs survive untouched (no crash)") {
    val spark0 = spark
    import spark0.implicits._
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, ""), (2L, "   "), (3L, s"$span x"), (4L, s"y $span"))
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", n = 8, minDocs = 2)
      .orderBy("doc").collect()
    val byDoc = out.map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(4))).toMap
    assert(byDoc(1L) == ((0, 0, "")))
    assert(byDoc(2L) == ((0, 0, "")))
    assert(byDoc(3L) == ((9, 8, "x")))
    assert(byDoc(4L) == ((9, 8, "y")))
  }

  test("lineDedup drops corpus-hot lines, keeps order and blank lines") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "unique one\nSHARED FOOTER\n\nunique two"),
      (2L, "other text\nSHARED FOOTER"),
      (3L, "solo doc\nsolo line")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", minDocs = 2)
      .orderBy("doc").collect()
    val byDoc = out.map(r => r.getLong(0) ->
      (r.getInt(1), r.getLong(2), r.getString(3))).toMap
    assert(byDoc(1L) == ((4, 1L, "unique one\n\nunique two")))
    assert(byDoc(2L) == ((2, 1L, "other text")))
    assert(byDoc(3L) == ((2, 0L, "solo doc\nsolo line")))
  }

  test("lineDedup: a doc of only hot lines survives as an empty document") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "DUP"), (2L, "DUP"), (3L, "keep\nDUP")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", minDocs = 2)
      .orderBy("doc").collect()
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq ==
      Seq((1L, ""), (2L, ""), (3L, "keep")))
  }

  test("bucketed intermediate: spanDedup bit-equal; gram frame never re-shuffles") {
    val d = Tables.documents(spark, SfDir)
    val local = Dedup.spanDedup(d, "doc_id", "text", n = 8, minDocs = 2)
    val bucketed = Dedup.spanDedup(d, "doc_id", "text", n = 8, minDocs = 2,
      intermediate = Dedup.Intermediate.Bucketed(buckets = 4))
    val pLocal = local.queryExecution.executedPlan.toString
    val pBucketed = bucketed.queryExecution.executedPlan.toString
    def hShuffles(p: String): Int = "hashpartitioning\\(h#".r.findAllIn(p).length
    // Local re-shuffles the corpus-sized gram frame on h for BOTH the
    // duplicate-gram aggregation and the coverage join-back...
    assert(hShuffles(pLocal) >= 2, s"local baseline should shuffle grams on h:\n$pLocal")
    // ...the bucketed write removes every gram-keyed exchange: the dup
    // aggregation and both join sides read co-bucketed, per-bucket-sorted
    // files (this is the round-6 ×10 posting-spill lever)
    assert(hShuffles(pBucketed) == 0,
      s"bucketed gram frame must never re-enter an h-keyed exchange:\n$pBucketed")
    assert(pBucketed.contains("Bucketed: true"),
      s"consumers must scan the bucketed table:\n$pBucketed")
    // the only remaining data exchange is the inherent doc-keyed coverage set
    assert("hashpartitioning\\(doc#".r.findAllIn(pBucketed).length == 1, pBucketed)
    // and the answer is bit-identical to the unbucketed reference
    assert(bucketed.orderBy("doc").collect().toSeq ==
      local.orderBy("doc").collect().toSeq)
    // lifecycle: the warehouse GC drops what this test created. Since the
    // round-15 adoption rule, MEMO-owned tables built by other suites in
    // this shared session legitimately survive a registry drop (they die
    // at Memo.release / the end-of-run sweep), so assert on the registry
    // being emptied — not on the whole warehouse.
    assert(Dedup.Intermediate.dropBucketedTables(spark) >= 1)
    assert(Dedup.Intermediate.createdSnapshot.isEmpty,
      "GC must empty the per-invocation table registry")
  }

  test("containmentPairs: embedded short doc passes containment, fails jaccard") {
    val spark0 = spark
    import spark0.implicits._
    val short = "a b c d e"
    val long = short + " f g h i j k l m n o p q r s t u v w x y z"
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.9).collect()
    assert(cont.length == 1, "the embedded pair must surface")
    val r = cont.head
    assert(r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 2L)
    // every shingle of the short doc occurs in the long one
    assert(r.getAs[Double]("cont_a") == 1.0)
    assert(r.getAs[Double]("cont_b") < 0.9)
    // the symmetric detector misses exactly this pair
    assert(Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.9).count() == 0)
  }

  test("containmentPairs ⊇ jaccardPairs at the same threshold (containment ≥ jaccard)") {
    val d = Tables.documents(spark, SfDir)
    val jac = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val con = Dedup.containmentPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.subsetOf(con),
      s"inter/union ≤ inter/min-side, so every jaccard pair is a containment pair: ${jac -- con}")
  }

  test("containmentPairs: inter bounded by both set sizes, scores in (0, 1]") {
    val d = Tables.documents(spark, SfDir)
    Dedup.containmentPairs(d, "doc_id", "text", n = 3, threshold = 0.8).collect().foreach { r =>
      val (i, na, nb) = (r.getAs[Long]("inter"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(i > 0 && i <= math.min(na, nb))
      assert(r.getAs[Double]("cont_a") > 0 && r.getAs[Double]("cont_a") <= 1.0)
      assert(r.getAs[Double]("cont_b") > 0 && r.getAs[Double]("cont_b") <= 1.0)
    }
  }

  test("exactKeepByPriority: one keeper per content group, lowest (prio, id) wins") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "same text", 2), (2L, "same text", 1), (3L, "same text", 1),
      (4L, "other", 5)).toDF("doc_id", "text", "prio")
    val r = Dedup.exactKeepByPriority(docs, "doc_id", "text", col("prio"))
      .collect().map(x => x.getAs[Long]("doc") ->
        ((x.getAs[Long]("canonical_id"), x.getAs[Int]("keep")))).toMap
    // canonical = prio 1, tie on id → doc 2; only it keeps
    assert(r(1L) == ((2L, 0)) && r(2L) == ((2L, 1)) && r(3L) == ((2L, 0)))
    assert(r(4L) == ((4L, 1)), "singleton groups keep themselves")
  }

  test("entityMatches: pairs only within the block, dist-gated, a < b") {
    import spark.implicits._
    val d = Seq(
      (1L, "US", "smith john"), (2L, "US", "smith jon"), // dist 1 — match
      (3L, "US", "wilson kate"), // dist > 2 to both — no pair
      (4L, "FR", "smith john"), // identical name, different block — no pair
      (5L, "FR", "smith johm") // dist 1 to #4 within FR — match
    ).toDF("id", "country", "name")
    val got = Dedup.entityMatches(d, "id", "name", Seq("country"), maxDist = 2)
      .orderBy("a", "b")
      .as[(Long, Long, String, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, "US", 1L), (4L, 5L, "FR", 1L)))
  }

  test("prefixFilterPairs equals uncapped jaccardPairs on the fixture corpus") {
    // the prefix filter is candidate-generation only — the exact theorem
    // (smallest common shingle lies in both prefixes) says the pair SET and
    // the jaccard VALUES are identical to the direct inverted-index path
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pf = norm(Dedup.prefixFilterPairs(docs, "doc_id", "text", n = 3, tNum = 4, tDen = 5))
    val jp = norm(Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8,
      maxDf = Int.MaxValue))
    assert(pf.nonEmpty)
    assert(pf == jp)
  }

  test("prefixFilterPairs keeps pairs a df-cap would lose (all-hot-shingle docs)") {
    val spark0 = spark
    import spark0.implicits._
    // 20 identical docs: every shingle has df=20, so a df-cap of 10 drops
    // ALL postings and the capped path finds nothing — the prefix filter
    // has no cap (hot shingles sort last and stay out of prefixes anyway,
    // but here they ARE the prefix and still join) and finds all 190 pairs
    val docs = (0L until 20L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8, maxDf = 10)
    assert(capped.count() == 0)
    val pf = Dedup.prefixFilterPairs(docs, "doc_id", "text", n = 3, tNum = 4, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pf.length == 190)
    assert(pf.forall(_._3 == 1.0))
  }

  test("winnowing: coverage law — no window of w grams lacks a selection") {
    // the winnowing guarantee: every w-window contains a selected
    // fingerprint, so consecutive selected positions are ≤ w apart and the
    // first/last selections sit within the first/last windows
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (n, w) = (3, 4)
    val byDoc = Dedup.winnowedFingerprints(docs, "doc_id", "text", n, w)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    assert(byDoc.nonEmpty)
    val gramCounts = Dedup.posShingleRows(docs, "doc_id", "text", n)
      .groupBy("doc").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    byDoc.foreach { case (doc, ps) =>
      val g = gramCounts(doc)
      assert(ps.head <= w - 1, s"doc=$doc first window uncovered")
      assert(ps.last >= g - w, s"doc=$doc last window uncovered")
      ps.sliding(2).foreach {
        case Array(a, b) => assert(b - a <= w, s"doc=$doc gap ${b - a} > $w")
        case _ =>
      }
    }
    // docs with ≥ w+n-1 tokens but selections always ≪ grams: density < 1
    val dense = byDoc.map { case (d, ps) => ps.length.toDouble / gramCounts(d) }
    assert(dense.forall(_ <= 1.0) && dense.exists(_ < 0.7))
  }

  test("winnowingPairs: identical docs share every fingerprint; guarantee run detected") {
    val spark0 = spark
    import spark0.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base),
      // doc 3 embeds a 6-token run from base (w+n-1 = 6 ⇒ guaranteed hit)
      (3L, "one two three alpha beta gamma delta epsilon zeta nine ten"),
      (4L, "completely different words with zero overlap here present")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(docs, "doc_id", "text", n = 3, w = 4, minShared = 1L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // identical docs: shared == both set sizes
    val (s12, n1, n2) = pairs((1L, 2L))
    assert(n1 == n2 && s12 == n1)
    // the embedded run shares at least one fingerprint with both copies
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    // the disjoint doc shares nothing
    assert(!pairs.keys.exists(k => k._1 == 4L || k._2 == 4L))
  }

  test("q_content_novelty: copies score zero, first-seen masses telescope") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "a b c d e"), // 3 shingles, all first-seen here
      (2L, "a b c d e"), // exact copy: novelty 0
      (3L, "a b c x y z") // shares "a b c", adds 3 new shingles of 4
    ).toDF("doc_id", "text")
    // route through the same operator the declared query uses
    val post = Dedup.postings(docs, "doc_id", "text", n = 3)
    val first = post.groupBy(col("h")).agg(min(col("doc")).as("first_doc"))
    val got = post.join(first, Seq("h"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_sh"),
        sum((col("first_doc") === col("doc")).cast("long")).as("n_novel"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((3L, 3L)))
    assert(got(2L) == ((3L, 0L)))
    assert(got(3L) == ((4L, 3L)))
    // telescoping: novel shingles across docs = distinct shingles in corpus
    assert(got.values.map(_._2).sum == post.select("h").distinct().count())
  }

  test("q_jaccard_threshold_sweep: cumulative counts telescope onto the 0.8 pair set") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_jaccard_threshold_sweep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 >= 70 && r._1 <= 90))
    // n_cum at band b = Σ n_pairs of bands ≥ b
    rows.foreach { case (b, _, cum) =>
      assert(cum == rows.filter(_._1 >= b).map(_._2).sum, s"band $b")
    }
    // the ≥0.8 cumulative must equal the declared 0.8-threshold pair count
    val n08 = Dedup.jaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
      n = 3, threshold = 0.8, maxDf = 1000).count()
    val cum80 = rows.filter(_._1 >= 80).map(_._2).sum
    assert(cum80 == n08)
  }
}
