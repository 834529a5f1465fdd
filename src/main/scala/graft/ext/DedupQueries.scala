package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared dedup queries + DuckDB oracles over `documents`. The md5-derived
  * hash family makes every stage (shingles → minhash → bands → candidates)
  * bit-reproducible in DuckDB, so even the sketch-based operators are fully
  * oracle-checked, not rows-only.
  */
object DedupQueries {

  private val K = 16 // minhash signature length
  private val Bands = 4 // LSH bands (rows per band = 4)
  private[graft] val MaxDf = 1000 // hot-shingle document-frequency cap

  /** The 3-gram Jaccard CANDIDATE pair frame (threshold 0 — every pair
    * sharing ≥1 un-capped shingle, with its exact score), built +
    * materialized ONCE per (session, dir) through the production Bucketed
    * posting intermediate and shared by the whole near-dup family:
    * [[jaccardPairs]]' threshold is a pure output filter on the IEEE
    * `jaccard` quotient, so `candidatePairs.filter(jaccard >= t)` is
    * BIT-IDENTICAL to an at-threshold build — one posting self-join now
    * serves the 0.8 resolution family (clusters/keep/forensics/splits/
    * pagerank/negatives), the 0.7 threshold sweep, and the threshold-0
    * minhash accuracy audit. Before the memo each of those ~11 declared
    * queries re-ran the identical posting join from raw text (measured
    * ~2.5 s each at sf0.1 — the single most expensive dedup stage ×11).
    */
  /** ONE bucketed (doc, h) posting table per (session, dir), shared by the
    * Jaccard candidate build AND the containment query (round 15): both
    * families tokenize the identical 3-gram posting frame, and before the
    * share q_dedup_containment re-tokenized the corpus and wrote its own
    * posting table on EVERY invocation (×100: 93 s / 4.3 GB shuffle, most
    * of it the rebuild). Bucketed on h — the clustering every consumer
    * (sizes/hot groupBys, both self-join sides) partitions by.
    */
  private[graft] def bucketedPostings(s: SparkSession, dir: String): DataFrame = {
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    Memo.cachedVia(s, s"dedup-postings|$dir") {
      Dedup.Intermediate.Bucketed(parts).keyed(
        Dedup.postings(Tables.documents(s, dir), "doc_id", "text", n = 3),
        "shared_postings", "h")
    }
  }

  private[graft] def candidateJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    // Round 15: the shared frame is itself a BUCKETED TABLE on (a, b),
    // not a localCheckpoint. Two measured reasons (×100, the r14 spill
    // set): (1) RESIDENCY — the checkpointed pair frame's blocks sat in
    // unified memory while its own consumers sorted next to them
    // (q_minhash_accuracy spilled 1.54 GB in-session vs ~0 solo; the
    // release schedule can't help the query that READS the frame);
    // warehouse parquet holds zero storage memory. (2) LAYOUT — the
    // minhash-accuracy SMJ joins on exactly (a, b), so the bucketed form
    // removes that join's exact-side exchange+repartition entirely (the
    // span-dedup lever). Other family consumers trade memory-block reads
    // for parquet scans WITH pushed jaccard/id filters — row-identical
    // (jaccard is one IEEE quotient computed at build, stored exactly).
    // sortedFiles = false (round 15): the cand frame arrives from the
    // sizes SMJ partitioned on b, so the V1 write sort buffered every
    // task's full slice — 768.5 MB ×100 spill, 27 s of the build's 110 s
    // solo wall (StageProbe). The unsorted form's bucket-key repartition
    // + concurrent writer removes the sort; file count and every
    // consumer plan (the read-side SMJ sorts per bucket regardless)
    // are unchanged.
    Memo.cachedVia(s, s"jaccard-cand-pairs|$dir") {
      Dedup.Intermediate.Bucketed(parts, sortedFiles = false).keyed(
        Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", n = 3,
          threshold = 0.0, maxDf = MaxDf,
          intermediate = Dedup.Intermediate.Bucketed(parts),
          postings = Some(bucketedPostings(s, dir))),
        "jaccard_cand", "a,b")
    }
  }

  /** The Jaccard ≥ 0.8 near-dup pair frame (a, b, jaccard) every
    * resolution query consumes — a filter over the memoized candidates. */
  private[graft] def nearDupPairs(s: SparkSession, dir: String): DataFrame =
    candidateJaccardPairs(s, dir).filter(col("jaccard") >= 0.8)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: group by normalized-content fingerprint.
    "q_dedup_exact" -> { (s, dir) =>
      Dedup
        .exactGroups(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("fp")
    },

    // DEDUP IMPACT REPORT — the curation number a data-mix owner reads
    // after any dedup pass: per source, corpus share BEFORE vs AFTER exact
    // dedup (min-doc_id keeper, the q_dedup_exact contract) and the
    // resulting mix shift. A source whose share jumps was under-duplicated
    // relative to the rest; one that collapses was a mirror. Keeper frame
    // = one fp-keyed agg; the survivor restriction is a semi-join; shares
    // are ×10⁶ truncating quotients over exact BIGINTs (n·10⁶ holds in
    // Long to ~9·10¹² docs).
    "q_dedup_impact" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text"))
      val keep = Dedup.exactGroups(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val before = docs.groupBy(col("source")).agg(count(lit(1)).as("n_before"))
      val after = docs.join(keep, Seq("doc_id"), "left_semi")
        .groupBy(col("source")).agg(count(lit(1)).as("n_after"))
      // |sources|-sized frame read twice (rows + totals): checkpoint, or
      // the fp-agg + semi-join recompute per arm (4 corpus scans, not 2)
      val joined = before
        .join(after, Seq("source"), "left")
        .withColumn("n_after", coalesce(col("n_after"), lit(0L)))
        .localCheckpoint()
      val totals = joined.agg(sum(col("n_before")).as("tb"), sum(col("n_after")).as("ta"))
      joined
        .crossJoin(broadcast(totals))
        .select(col("source"), col("n_before"), col("n_after"),
          expr("n_before * 1000000 DIV tb").as("share_before_q6"),
          expr("n_after * 1000000 DIV ta").as("share_after_q6"),
          expr("n_after * 1000000 DIV ta - n_before * 1000000 DIV tb").as("shift_q6"))
        .orderBy("source")
    },

    // Near-dup pairs by exact word-3-gram Jaccard ≥ 0.8 via inverted index.
    // The declared path runs the PRODUCTION intermediate (the span-dedup
    // lever, extended here in round 10): postings written once
    // bucketed+sorted on the shingle hash, so the sizes/hot aggregations
    // and both self-join sides read bucket-aligned files — the ×100 probe
    // measured the Local form spilling 200 MB through a 4.8 GB h-keyed
    // re-shuffle that this removes.
    "q_dedup_ngram_jaccard" -> { (s, dir) =>
      nearDupPairs(s, dir).orderBy("a", "b")
    },

    // PPJoin-style PREFIX-FILTER Jaccard ([[Dedup.prefixFilterPairs]]):
    // the same pair set as the inverted-index path at threshold 4/5 with
    // NO df-cap — candidates come from self-joining only each doc's
    // rarest |d|-⌈t|d|⌉+1 shingles under the global (df, hash) order, so
    // hot shingles never explode the join and no recall-losing cap is
    // needed. Oracle = the direct uncapped Jaccard recompute: the prefix
    // optimization must be invisible to results.
    "q_dedup_prefix_filter" -> { (s, dir) =>
      // round 16: reads the family-shared bucketed posting table (this
      // operator's algebra is uncapped and the shared table IS the uncapped
      // posting frame) — before, it re-tokenized the corpus and held the
      // frame as checkpoint blocks per invocation
      Dedup
        .prefixFilterPairs(Tables.documents(s, dir), "doc_id", "text", n = 3,
          tNum = 4, tDen = 5, postings = Some(bucketedPostings(s, dir)))
        .orderBy("a", "b")
    },

    // MOSS winnowing ([[Dedup.winnowingPairs]]): pairs sharing ≥ 3
    // winnowed fingerprints (3-gram hashes, window w=4, rightmost-min
    // selection). The index the join runs on is ~2/(w+1) the size of the
    // full posting list — the substring-overlap detector that ships at
    // corpus scale. Any shared run of ≥ w+n−1 = 6 tokens is guaranteed a
    // shared fingerprint.
    "q_dedup_winnowing" -> { (s, dir) =>
      Dedup
        .winnowingPairs(Tables.documents(s, dir), "doc_id", "text", n = 3, w = 4,
          minShared = 3L)
        .orderBy("a", "b")
    },

    // Content NOVELTY per document — the corpus-growth audit an
    // incremental ingest reads: which fraction of each doc's shingles is
    // FIRST SEEN at this doc (ingest order = doc_id)? A near-total copy of
    // earlier material scores ~0; fresh content ~10⁶. One shingle-keyed
    // min aggregation + one posting-keyed join back — corpus-linear, the
    // same frames the dedup family already exchanges.
    "q_content_novelty" -> { (s, dir) =>
      // the posting frame feeds the first-seen aggregate AND the join
      // back — materialize once so the corpus tokenizes once
      val post = Dedup.postings(Tables.documents(s, dir), "doc_id", "text", n = 3)
        .localCheckpoint()
      val first = post.groupBy(col("h")).agg(min(col("doc")).as("first_doc"))
      post.join(first, Seq("h"))
        .groupBy(col("doc").as("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum((col("first_doc") === col("doc")).cast("long")).as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          expr("n_novel * 1000000 DIV n_shingles").as("novel_q6"))
        .orderBy("doc_id")
    },

    // Jaccard THRESHOLD SWEEP: pair counts per similarity band (0.7–0.8,
    // 0.8–0.9, ≥0.9) plus the cumulative ≥-band count, from ONE pair
    // computation at the lowest threshold — the table read before fixing
    // the dedup cut for a corpus (how many pairs does each 0.1 of
    // threshold add?). Band edges are floor(j·10) of the identical IEEE
    // quotient, so banding is bit-deterministic.
    "q_jaccard_threshold_sweep" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      candidateJaccardPairs(s, dir)
        .filter(col("jaccard") >= 0.7)
        .groupBy(least(floor(col("jaccard") * 10), lit(9L)).as("band"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("n_cum", sum(col("n_pairs")).over(
          Window.orderBy(col("band").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select((col("band") * 10).as("band_q1"), col("n_pairs"), col("n_cum"))
        .orderBy("band_q1")
    },

    // Directional CONTAINMENT pairs (3-gram shingles, max-direction ≥ 0.8)
    // — the asymmetric near-dup detector: a short doc embedded in a long
    // one passes containment while its Jaccard stays low. Same bucketed
    // posting plan as q_dedup_ngram_jaccard.
    "q_dedup_containment" -> { (s, dir) =>
      Dedup
        .containmentPairs(Tables.documents(s, dir), "doc_id", "text", n = 3,
          threshold = 0.8, maxDf = MaxDf,
          intermediate =
            Dedup.Intermediate.Bucketed(s.conf.get("spark.sql.shuffle.partitions").toInt),
          postings = Some(bucketedPostings(s, dir)))
        .orderBy("a", "b")
    },

    // Cross-source exact-dedup keep: same content from several feeds keeps
    // exactly one copy, preferring the lowest source index ('src3' beats
    // 'src12' content-twins) — the multi-source corpus merge decision,
    // per-document.
    "q_cross_source_dedup" -> { (s, dir) =>
      Dedup
        .exactKeepByPriority(Tables.documents(s, dir), "doc_id", "text",
          substring(col("source"), 4, 10).cast("int"))
        .orderBy("doc")
    },

    // Sketch-accuracy eval (the dedup twin of q_ann_recall): for every
    // LSH candidate pair, the MinHash ESTIMATE (signature agreement / k)
    // against the exact Jaccard, with the per-pair error — the
    // continuous-monitoring number that says whether k=16 still carries
    // the corpus (estimate quality decays as doc profiles drift). Exact
    // side = the posting-join jaccard at threshold 0 restricted to the
    // candidates (left join: a hash-collision candidate with no shared
    // shingle scores exact 0).
    "q_minhash_accuracy" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val cand = Dedup.lshCandidates(d, "doc_id", "text", n = 3, k = K, bands = Bands)
      val exact = candidateJaccardPairs(s, dir)
        .select(col("a"), col("b"), col("jaccard"))
      val est = expr(s"sig_matches * 1000000 div $K")
      val jac = floor(coalesce(col("jaccard"), lit(0.0)) * 1000000).cast("long")
      // sort-merge by choice: the exact side is the big pair frame; SMJ's
      // sort spills gracefully where a shuffle-hash build OOMs outright
      // under concurrent task memory pressure (measured:
      // SparkOutOfMemoryError building the map). Round 15: the exact side
      // is the (a, b)-BUCKETED memoized table, so its exchange is elided
      // outright — no repartition here (one would re-shuffle the bucketed
      // layout away). The r14 sized-repartition form still spilled
      // 1.54 GB in-session at ×100 because the checkpointed frame's OWN
      // memory blocks displaced the sorts reading them; table-backed,
      // the sorts run against an empty storage pool and the per-bucket
      // sort (~1.7M narrow rows/bucket at ×100) fits task memory.
      cand.join(exact, Seq("a", "b"), "left")
        .select(col("a"), col("b"), est.as("est_q6"), jac.as("jac_q6"),
          abs(est - jac).as("err_q6"))
        .orderBy("a", "b")
    },

    // Duplication forensics by source: the corpus-governance rollup a
    // curation team reads before deciding which FEED to fix — per source,
    // how many near-dup pairs touch it, across how many partner sources,
    // involving how many of its docs. Pair frame = the same banded
    // Jaccard recompute (oracle-independence contract, the q_dedup_keep
    // precedent); sources ride two doc-keyed joins, the rollup is one
    // source-keyed agg over ≤ 2·|pairs| side rows.
    "q_dup_forensics" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val pairs = nearDupPairs(s, dir)
      val src = d.select(col("doc_id"), col("source"))
      val withS = pairs
        .join(src.select(col("doc_id").as("a"), col("source").as("src_a")), Seq("a"))
        .join(src.select(col("doc_id").as("b"), col("source").as("src_b")), Seq("b"))
      withS.select(col("src_a").as("source"), col("src_b").as("partner"), col("a").as("doc"))
        .unionByName(withS.select(col("src_b").as("source"), col("src_a").as("partner"),
          col("b").as("doc")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pairs"),
          count_distinct(col("partner")).as("n_partner_sources"),
          count_distinct(col("doc")).as("n_docs_involved"))
        .orderBy("source")
    },

    // Blocked entity resolution on customer names: pair only within the
    // (nation, segment) block, confirm with levenshtein ≤ 2 — candidate
    // generation is Σ block², never corpus².
    "q_entity_match" -> { (s, dir) =>
      Dedup
        .entityMatches(Tables.customer(s, dir), "c_custkey", "c_name",
          Seq("c_nationkey", "c_mktsegment"), maxDist = 2)
        .orderBy("a", "b")
    },

    // MinHash signatures (k=16) — the mergeable sketch itself, via the
    // posting-list aggregation (hash once per shingle). Serialized to a
    // "-"-joined string: the driver's pandas compare cannot sort an
    // array<long> column (r1 oracle crash), and concat_ws needs the
    // elements cast to string first (Spark 4 rejects array<bigint>).
    "q_dedup_minhash" -> { (s, dir) =>
      Dedup
        .minhashSignatures(Tables.documents(s, dir), "doc_id", "text", n = 3, k = K)
        .select(col("doc").as("doc_id"),
          concat_ws("-", transform(col("sig"), _.cast("string"))).as("sig"))
        .orderBy("doc_id")
    },

    // MinHash-LSH candidate pairs (4 bands × 4 rows) + signature agreement.
    "q_dedup_minhash_lsh" -> { (s, dir) =>
      Dedup
        .lshCandidates(Tables.documents(s, dir), "doc_id", "text", n = 3, k = K, bands = Bands)
        .orderBy("a", "b")
    },

    // 48-bit SimHash fingerprint per document (unigram votes), via the
    // posting-list aggregation — the per-row HOF form re-inlines tokenize+md5
    // into each of the 48 interpreted vote folds (measured 18.5 s vs ~1 s at
    // sf0.1 once the bench action stopped pruning it). Docs with ≥1 token
    // only (oracle mirrors the filter).
    "q_dedup_simhash" -> { (s, dir) =>
      Dedup
        .simhashSignatures(Tables.documents(s, dir), "doc_id", "text", ngram = 1)
        .select(col("doc").as("doc_id"), col("sh").as("simhash"))
        .orderBy("doc_id")
    },

    // SimHash near-dup pairs: 3-gram-feature fingerprints, pigeonhole
    // 8-chunk banding, exact Hamming ≤ 7 re-check on candidates.
    "q_dedup_simhash_pairs" -> { (s, dir) =>
      Dedup
        .simhashPairs(Tables.documents(s, dir), "doc_id", "text", maxHamming = 7)
        .orderBy("a", "b")
    },

    // Candidate VERIFICATION — the confirm stage every sketch-based dedup
    // pipeline ends with: simhash-banding candidates are joined back to
    // both texts and checked by exact edit distance (Spark's codegen
    // levenshtein), confirmed iff dist ≤ 20 % of the longer text. The
    // corpus never shuffles: the candidate frame is output-bounded and
    // rides the join's small side; only candidate pairs pay the O(n·m)
    // DP. Oracle = the same candidate chain + DuckDB's levenshtein.
    "q_dedup_edit_verify" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val cands = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 7)
      val ta = docs.select(col("doc_id").as("a"), col("text").as("ta"))
      val tb = docs.select(col("doc_id").as("b"), col("text").as("tb"))
      cands
        .join(ta, Seq("a")).join(tb, Seq("b"))
        .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("long"))
        .withColumn("rel_q3",
          floor(col("dist") * 1000 / greatest(length(col("ta")), length(col("tb"))))
            .cast("long"))
        .select(col("a"), col("b"), col("dist"), col("rel_q3"),
          (col("rel_q3") <= 200).as("confirmed"))
        .orderBy("a", "b")
    },

    // Benchmark decontamination: docs sharing >= half their 3-gram shingles
    // with the (deterministic) "benchmark" subset doc_id % 97 == 0 are
    // flagged. The benchmark's shingle set broadcasts; the corpus never
    // shuffles for the membership test.
    "q_contamination" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      Dedup
        .contamination(d, d.filter(col("doc_id") % 97 === 0), "doc_id", "text",
          n = 3, ratioThreshold = 0.5)
        .select(col("doc").as("doc_id"), col("n_sh"), col("hit_sh"),
          col("overlap"), col("contaminated"))
        .orderBy("doc_id")
    },

    // Same decontamination result through the Bloom-prefilter path: corpus
    // shingles are pruned by a bloom built from the benchmark set BEFORE
    // the membership join (codegen probe at the scan edge), survivors are
    // exact-checked — identical output to q_contamination, so the same
    // oracle checks both the bloom's no-false-negative property and the
    // exact re-check end-to-end.
    "q_contamination_bloom" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      Dedup
        .contaminationBloom(d, d.filter(col("doc_id") % 97 === 0), "doc_id", "text",
          n = 3, ratioThreshold = 0.5, numBits = 1 << 16, numHashes = 5)
        .select(col("doc").as("doc_id"), col("n_sh"), col("hit_sh"),
          col("overlap"), col("contaminated"))
        .orderBy("doc_id")
    },

    // Exact duplicate-SPAN dedup: 8-gram spans occurring in ≥2 docs are cut
    // from every doc; survivors re-join. clean_text is emitted as md5 +
    // length (hash-stable; the raw text column would bloat the dump).
    // dup_ratio is ONE IEEE division of small ints ⇒ engine-exact.
    // The declared path runs the PRODUCTION intermediate: the gram frame is
    // written once bucketed+sorted on the gram hash, so the duplicate-gram
    // aggregation and the coverage join-back re-shuffle it zero times
    // (DedupSpec proves bit-equality with the Local form and pins the
    // exchange-free plan; the round-6 ×10 probe measured the gram-posting
    // re-shuffle as the one super-linear residual — this removes it).
    "q_span_dedup" -> { (s, dir) =>
      Dedup
        .spanDedup(Tables.documents(s, dir), "doc_id", "text", n = 8, minDocs = 2,
          intermediate =
            Dedup.Intermediate.Bucketed(s.conf.get("spark.sql.shuffle.partitions").toInt))
        .select(col("doc").as("doc_id"), col("n_toks"), col("n_dup_toks"),
          col("dup_ratio"), md5(col("clean_text")).as("clean_md5"),
          length(col("clean_text")).as("clean_len"))
        .orderBy("doc_id")
    },

    // Incremental near-dup — the daily-ingest path a production crawl
    // pipeline runs: the historical corpus (doc_id % 7 != 0) exists only
    // as its materialized inverted index (postings — never re-tokenized,
    // only PROBED through the shingle-hash equi-join), while the increment
    // (doc_id % 7 == 0) is tokenized fresh. The oracle is the FULL
    // recompute restricted to pairs touching the increment — the
    // union-equivalence law DedupSpec states, promoted to a hash-checked
    // oracle row. (df-cap is computed over the combined postings, so the
    // restriction is exact, not approximate.)
    "q_dedup_incremental" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      // compute-once for the index: it feeds the anti-join, the df-cap,
      // the sizes agg, and the probe join (in production this is a read
      // of the already-materialized postings table)
      val oldPost = Dedup.Intermediate.LocalLazy(
        Dedup.postings(d.filter(col("doc_id") % 7 =!= 0), "doc_id", "text", n = 3),
        "inc-corpus-postings")
      Dedup
        .jaccardPairsIncremental(d.filter(col("doc_id") % 7 === 0), "doc_id", "text",
          n = 3, threshold = 0.8, corpusPostings = oldPost, maxDf = MaxDf)
        .orderBy("a", "b")
    },

    // Incremental MinHash-LSH — the banded analog of q_dedup_incremental:
    // the historical corpus (doc_id % 7 != 0) exists only as its
    // materialized SIGNATURE table (mergeMinhash's mergeable-sketch
    // property is what makes that table maintainable across increments);
    // the increment (doc_id % 7 == 0) is shingled fresh and its band keys
    // probe the union's buckets. Signatures are per-document, so the
    // oracle is EXACTLY the full-LSH recompute restricted to
    // increment-touching pairs — no df-cap caveat.
    "q_dedup_minhash_incremental" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val corpusSigs = Dedup.Intermediate.LocalLazy(
        Dedup.minhashSignatures(d.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
          n = 3, k = K),
        "inc-corpus-minhash")
      Dedup
        .lshCandidatesIncremental(d.filter(col("doc_id") % 7 === 0), "doc_id", "text",
          n = 3, k = K, bands = Bands, corpusSigs = corpusSigs)
        .orderBy("a", "b")
    },

    // CCNet-style LINE dedup over a deterministically SYNTHESIZED newline
    // corpus (the driver fixtures have no newlines — the same
    // synthesize-then-verify move as the media queries): every 6 tokens
    // form one line, lines appearing in ≥2 docs are cut from every doc,
    // survivors re-join in order. Token-less docs filtered identically on
    // both sides.
    // INTRA-document line dedup ([[TextOps.intraDocLineDedup]]): the
    // within-page repeat remover (templating stutter, duplicated nav
    // blocks) that the ACROSS-document hot-line drop below can't express.
    // The fixture corpus has zero natural within-doc 6-token repeats
    // (measured), so every %3 doc gets its first line re-appended — the
    // synthesize-then-verify convention — and the operator must remove
    // EXACTLY those. Map-only indexed-filter algebra, zero shuffle.
    "q_intra_dedup" -> { (s, dir) =>
      val docs2 = TextOps.synthesizeLines(Tables.documents(s, dir), "doc_id", "text",
        tokensPerLine = 6)
        .withColumn("text2",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit("\n"), element_at(split(col("text"), "\n"), 1)))
            .otherwise(col("text")))
      TextOps
        .intraDocLineDedup(docs2, "doc_id", "text2")
        .select(col("doc_id"), col("n_lines"), col("n_removed"),
          md5(col("clean_text")).as("clean_md5"),
          length(col("clean_text")).cast("long").as("clean_len"))
        .orderBy("doc_id")
    },

    "q_line_dedup" -> { (s, dir) =>
      val docs2 = TextOps.synthesizeLines(Tables.documents(s, dir), "doc_id", "text",
        tokensPerLine = 6)
      Dedup
        .lineDedup(docs2, "doc_id", "text", minDocs = 2)
        .select(col("doc").as("doc_id"), col("n_lines"), col("n_removed"),
          md5(col("clean_text")).as("clean_md5"),
          length(col("clean_text")).as("clean_len"))
        .orderBy("doc_id")
    }
  )

  // ---- DuckDB fragments mirroring Dedup/TextOps bit-for-bit ----

  private lazy val ContaminationSql =
    s"WITH $WithShingles, $Post0, " +
      "bench AS (SELECT DISTINCT h FROM post0 WHERE doc % 97 = 0), " +
      "agg AS (SELECT doc, count(*) AS n_sh, count(b.h) AS hit_sh " +
      "FROM post0 p LEFT JOIN bench b ON p.h = b.h GROUP BY doc) " +
      "SELECT doc AS doc_id, n_sh, hit_sh, hit_sh::DOUBLE / n_sh AS overlap, " +
      "hit_sh::DOUBLE / n_sh >= 0.5 AS contaminated FROM agg ORDER BY doc_id"

  private val Toks = "list_filter(string_split_regex(text, '\\s+'), t -> t != '')"
  // documents with <n tokens have no shingles and therefore NO signature —
  // the engine's aggregation-based signature builders emit no row for them
  // (shingleRows produces nothing), so the oracles filter them identically.
  private[ext] val WithShingles =
    s"toks AS (SELECT doc_id, $Toks AS t FROM documents), " +
      "shing AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2), " +
      "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM toks WHERE len(t) >= 3)"
  private val Md5Int = "(('0x' || substr(md5(s), 1, 15))::BIGINT)"
  private val SigExpr =
    s"list_transform(generate_series(0, ${K - 1}), i -> list_min(list_transform(sh, " +
      s"s -> ((2*i+1) * ($Md5Int % 1000000007) + (1000003*i + 12345)) % 1000000007)))"
  private val Post0 =
    "post0 AS (SELECT DISTINCT doc, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM " +
      "(SELECT doc_id AS doc, unnest(sh) AS s FROM shing))"
  private[ext] val Postings =
    s"$Post0, " +
      s"hot AS (SELECT h FROM post0 GROUP BY h HAVING count(*) > $MaxDf), " +
      "post AS (SELECT * FROM post0 ANTI JOIN hot USING (h)), " +
      "sz AS (SELECT doc, count(*) AS n_sh FROM post0 GROUP BY 1)"

  def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" -> ("SELECT md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp, " +
      "min(doc_id) AS keep_id, count(*) AS dup_cnt FROM documents GROUP BY 1 ORDER BY 1"),
    "q_dedup_impact" -> ("WITH k AS (SELECT min(doc_id) AS doc_id FROM documents " +
      "GROUP BY md5(trim(regexp_replace(text, '\\s+', ' ', 'g')))), " +
      "b AS (SELECT source, count(*) AS n_before FROM documents GROUP BY 1), " +
      "a AS (SELECT source, count(*) AS n_after FROM documents " +
      "JOIN k USING (doc_id) GROUP BY 1), " +
      "j AS (SELECT b.source, n_before, coalesce(n_after, 0) AS n_after " +
      "FROM b LEFT JOIN a USING (source)), " +
      "t AS (SELECT CAST(sum(n_before) AS BIGINT) AS tb, " +
      "CAST(sum(n_after) AS BIGINT) AS ta FROM j) " +
      "SELECT source, n_before, n_after, " +
      "n_before * 1000000 // tb AS share_before_q6, " +
      "n_after * 1000000 // ta AS share_after_q6, " +
      "n_after * 1000000 // ta - n_before * 1000000 // tb AS shift_q6 " +
      "FROM j, t ORDER BY source"),
    "q_dedup_ngram_jaccard" -> (s"WITH $WithShingles, $Postings, " +
      "inter AS (SELECT x.doc AS a, y.doc AS b, count(*) AS i FROM post x " +
      "JOIN post y ON x.h = y.h AND x.doc < y.doc GROUP BY 1, 2) " +
      "SELECT a, b, i::DOUBLE / (sa.n_sh + sb.n_sh - i) AS jaccard FROM inter " +
      "JOIN sz sa ON a = sa.doc JOIN sz sb ON b = sb.doc " +
      "WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= 0.8 ORDER BY a, b"),
    // first-seen = min(doc) per shingle hash over the SAME distinct
    // posting frame; the ratio is a ×10⁶ truncating quotient
    "q_content_novelty" -> (s"WITH $WithShingles, $Post0, " +
      "f AS (SELECT h, min(doc) AS first_doc FROM post0 GROUP BY 1) " +
      "SELECT doc AS doc_id, count(*) AS n_shingles, " +
      "CAST(sum(CASE WHEN first_doc = doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, " +
      "CAST(sum(CASE WHEN first_doc = doc THEN 1 ELSE 0 END) AS BIGINT) " +
      "* 1000000 // count(*) AS novel_q6 " +
      "FROM post0 JOIN f USING (h) GROUP BY 1 ORDER BY 1"),
    // the ngram-jaccard pair frame at 0.7, banded by floor(j·10) of the
    // identical IEEE quotient; cumulative over the ≤3-row band frame
    "q_jaccard_threshold_sweep" -> (s"WITH $WithShingles, $Postings, " +
      "inter AS (SELECT x.doc AS a, y.doc AS b, count(*) AS i FROM post x " +
      "JOIN post y ON x.h = y.h AND x.doc < y.doc GROUP BY 1, 2), " +
      "pj AS (SELECT i::DOUBLE / (sa.n_sh + sb.n_sh - i) AS j FROM inter " +
      "JOIN sz sa ON a = sa.doc JOIN sz sb ON b = sb.doc " +
      "WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= 0.7), " +
      "bd AS (SELECT least(CAST(floor(j * 10) AS BIGINT), 9) AS band, " +
      "count(*) AS n_pairs FROM pj GROUP BY 1) " +
      "SELECT band * 10 AS band_q1, n_pairs, " +
      "CAST(sum(n_pairs) OVER (ORDER BY band DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) " +
      "AS n_cum FROM bd ORDER BY band_q1"),
    // identical lag-window minimum, rightmost-tie CASE probing the
    // current slot first, and distinct (pos, hash) selection
    "q_dedup_winnowing" -> (s"WITH toks AS (SELECT doc_id, $Toks AS t FROM documents), " +
      "posg AS (SELECT doc_id, u['pos'] AS pos, " +
      "('0x' || substr(md5(u['s']), 1, 15))::BIGINT AS h FROM (" +
      "SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2), " +
      "i -> {'pos': i - 1, 's': t[i] || ' ' || t[i+1] || ' ' || t[i+2]})) AS u " +
      "FROM toks WHERE len(t) >= 3)), " +
      "wl AS (SELECT doc_id, pos, h, lag(h, 1) OVER win AS h1, " +
      "lag(h, 2) OVER win AS h2, lag(h, 3) OVER win AS h3 FROM posg " +
      "WINDOW win AS (PARTITION BY doc_id ORDER BY pos)), " +
      "sel AS (SELECT DISTINCT doc_id, CASE WHEN h = mn THEN pos " +
      "WHEN h1 = mn THEN pos - 1 WHEN h2 = mn THEN pos - 2 ELSE pos - 3 END AS fp_pos, " +
      "mn AS h FROM (SELECT *, least(h, h1, h2, h3) AS mn FROM wl WHERE h3 IS NOT NULL)), " +
      "fp AS (SELECT DISTINCT doc_id, h FROM sel), " +
      "fsz AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY 1), " +
      "p AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared FROM fp x " +
      "JOIN fp y ON x.h = y.h AND x.doc_id < y.doc_id GROUP BY 1, 2) " +
      "SELECT a, b, shared, sa.n_fp AS na, sb.n_fp AS nb FROM p " +
      "JOIN fsz sa ON a = sa.doc_id JOIN fsz sb ON b = sb.doc_id " +
      "WHERE shared >= 3 ORDER BY a, b"),
    // the direct UNCAPPED recompute over post0 — the prefix filter is a
    // candidate-generation optimization and must not change the answer
    "q_dedup_prefix_filter" -> (s"WITH $WithShingles, $Post0, " +
      "sz AS (SELECT doc, count(*) AS n_sh FROM post0 GROUP BY 1), " +
      "inter AS (SELECT x.doc AS a, y.doc AS b, count(*) AS i FROM post0 x " +
      "JOIN post0 y ON x.h = y.h AND x.doc < y.doc GROUP BY 1, 2) " +
      "SELECT a, b, i::DOUBLE / (sa.n_sh + sb.n_sh - i) AS jaccard FROM inter " +
      "JOIN sz sa ON a = sa.doc JOIN sz sb ON b = sb.doc " +
      "WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= 0.8 ORDER BY a, b"),
    // the LSH candidate CTE joined LEFT to the exact threshold-0 pair
    // frame — the estimate-vs-truth composition
    "q_minhash_accuracy" -> (s"WITH $WithShingles, $Postings, " +
      s"sigs AS (SELECT doc_id, $SigExpr AS sig FROM shing), " +
      "banded AS (SELECT doc_id, sig, j, md5(concat_ws('-', sig[j*4+1], sig[j*4+2], " +
      "sig[j*4+3], sig[j*4+4])) AS key FROM sigs, generate_series(0, 3) AS g(j)), " +
      "cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, " +
      s"len(list_filter(generate_series(1, $K), i -> x.sig[i] = y.sig[i])) AS m " +
      "FROM banded x JOIN banded y ON x.j = y.j AND x.key = y.key " +
      "AND x.doc_id < y.doc_id), " +
      "inter AS (SELECT x.doc AS a, y.doc AS b, count(*) AS i FROM post x " +
      "JOIN post y ON x.h = y.h AND x.doc < y.doc GROUP BY 1, 2), " +
      "ex AS (SELECT a, b, i::DOUBLE / (sa.n_sh + sb.n_sh - i) AS jaccard FROM inter " +
      "JOIN sz sa ON a = sa.doc JOIN sz sb ON b = sb.doc) " +
      "SELECT c.a, c.b, c.m * 1000000 // 16 AS est_q6, " +
      "CAST(floor(coalesce(ex.jaccard, 0.0) * 1000000) AS BIGINT) AS jac_q6, " +
      "abs(c.m * 1000000 // 16 - " +
      "CAST(floor(coalesce(ex.jaccard, 0.0) * 1000000) AS BIGINT)) AS err_q6 " +
      "FROM cand c LEFT JOIN ex ON c.a = ex.a AND c.b = ex.b ORDER BY 1, 2"),
    // the same pair frame, rolled up per source over both pair sides
    "q_dup_forensics" -> (s"WITH $WithShingles, $Postings, " +
      "inter AS (SELECT x.doc AS a, y.doc AS b, count(*) AS i FROM post x " +
      "JOIN post y ON x.h = y.h AND x.doc < y.doc GROUP BY 1, 2), " +
      "pr AS (SELECT a, b FROM inter " +
      "JOIN sz sa ON a = sa.doc JOIN sz sb ON b = sb.doc " +
      "WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= 0.8), " +
      "ws AS (SELECT p.a, p.b, da.source AS src_a, db.source AS src_b FROM pr p " +
      "JOIN documents da ON p.a = da.doc_id JOIN documents db ON p.b = db.doc_id), " +
      "sides AS (SELECT src_a AS source, src_b AS partner, a AS doc FROM ws " +
      "UNION ALL SELECT src_b, src_a, b FROM ws) " +
      "SELECT source, count(*) AS n_pairs, " +
      "count(DISTINCT partner) AS n_partner_sources, " +
      "count(DISTINCT doc) AS n_docs_involved " +
      "FROM sides GROUP BY 1 ORDER BY 1"),
    // full recompute restricted to increment-touching pairs ≡ the
    // incremental path (union-equivalence; df-cap over combined postings)
    "q_dedup_incremental" -> (s"WITH $WithShingles, $Postings, " +
      "inter AS (SELECT x.doc AS a, y.doc AS b, count(*) AS i FROM post x " +
      "JOIN post y ON x.h = y.h AND x.doc < y.doc GROUP BY 1, 2) " +
      "SELECT a, b, i::DOUBLE / (sa.n_sh + sb.n_sh - i) AS jaccard FROM inter " +
      "JOIN sz sa ON a = sa.doc JOIN sz sb ON b = sb.doc " +
      "WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= 0.8 " +
      "AND (a % 7 = 0 OR b % 7 = 0) ORDER BY a, b"),
    // same posting fragments as the jaccard oracle; the filter is the
    // max-direction containment (inter / min side)
    "q_dedup_containment" -> (s"WITH $WithShingles, $Postings, " +
      "inter AS (SELECT x.doc AS a, y.doc AS b, count(*) AS i FROM post x " +
      "JOIN post y ON x.h = y.h AND x.doc < y.doc GROUP BY 1, 2) " +
      "SELECT a, b, i AS inter, sa.n_sh AS n_a, sb.n_sh AS n_b, " +
      "i::DOUBLE / sa.n_sh AS cont_a, i::DOUBLE / sb.n_sh AS cont_b " +
      "FROM inter JOIN sz sa ON a = sa.doc JOIN sz sb ON b = sb.doc " +
      "WHERE i::DOUBLE / least(sa.n_sh, sb.n_sh) >= 0.8 ORDER BY a, b"),
    // first_value/row_number over the same (prio, doc_id) window ≡ the
    // engine's single Window operator
    "q_cross_source_dedup" -> ("WITH f AS (SELECT doc_id, " +
      "CAST(substr(source, 4) AS INT) AS prio, " +
      "md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp FROM documents) " +
      "SELECT doc_id AS doc, fp, first_value(doc_id) OVER w AS canonical_id, " +
      "CASE WHEN row_number() OVER w = 1 THEN 1 ELSE 0 END AS keep " +
      "FROM f WINDOW w AS (PARTITION BY fp ORDER BY prio, doc_id) ORDER BY doc"),
    // same blocking join, same integer levenshtein (both engines implement
    // plain edit distance — the q_dedup_edit_verify parity precedent)
    "q_entity_match" -> ("SELECT x.c_custkey AS a, y.c_custkey AS b, " +
      "x.c_nationkey, x.c_mktsegment, levenshtein(x.c_name, y.c_name)::BIGINT AS dist " +
      "FROM customer x JOIN customer y ON x.c_nationkey = y.c_nationkey " +
      "AND x.c_mktsegment = y.c_mktsegment AND x.c_custkey < y.c_custkey " +
      "WHERE levenshtein(x.c_name, y.c_name) <= 2 ORDER BY a, b"),
    "q_dedup_minhash" -> (s"WITH $WithShingles " +
      s"SELECT doc_id, array_to_string($SigExpr, '-') AS sig FROM shing ORDER BY doc_id"),
    "q_dedup_minhash_lsh" -> (s"WITH $WithShingles, " +
      s"sigs AS (SELECT doc_id, $SigExpr AS sig FROM shing), " +
      "banded AS (SELECT doc_id, sig, j, md5(concat_ws('-', sig[j*4+1], sig[j*4+2], " +
      "sig[j*4+3], sig[j*4+4])) AS key FROM sigs, generate_series(0, 3) AS g(j)), " +
      "cand AS (SELECT x.doc_id AS a, y.doc_id AS b, x.sig AS sa, y.sig AS sb " +
      "FROM banded x JOIN banded y ON x.j = y.j AND x.key = y.key AND x.doc_id < y.doc_id) " +
      s"SELECT DISTINCT a, b, len(list_filter(generate_series(1, $K), i -> sa[i] = sb[i])) " +
      "AS sig_matches FROM cand ORDER BY a, b"),
    // full-LSH recompute restricted to increment-touching pairs ≡ the
    // incremental path exactly (signatures are per-document)
    "q_dedup_minhash_incremental" -> (s"WITH $WithShingles, " +
      s"sigs AS (SELECT doc_id, $SigExpr AS sig FROM shing), " +
      "banded AS (SELECT doc_id, sig, j, md5(concat_ws('-', sig[j*4+1], sig[j*4+2], " +
      "sig[j*4+3], sig[j*4+4])) AS key FROM sigs, generate_series(0, 3) AS g(j)), " +
      "cand AS (SELECT x.doc_id AS a, y.doc_id AS b, x.sig AS sa, y.sig AS sb " +
      "FROM banded x JOIN banded y ON x.j = y.j AND x.key = y.key AND x.doc_id < y.doc_id) " +
      s"SELECT DISTINCT a, b, len(list_filter(generate_series(1, $K), i -> sa[i] = sb[i])) " +
      "AS sig_matches FROM cand WHERE a % 7 = 0 OR b % 7 = 0 ORDER BY a, b"),
    // len(hw) > 0: the aggregation-based engine form emits no row for
    // token-less documents (integer vote sums are order-independent, so the
    // value is unchanged for every emitted row)
    "q_dedup_simhash" -> ("WITH t AS (SELECT doc_id, list_transform(list_distinct(" +
      Toks + "), w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS hw FROM documents) " +
      "SELECT doc_id, list_reduce(list_prepend(0::BIGINT, " +
      "list_transform(generate_series(0, 47), j -> CASE WHEN " +
      "list_reduce(list_prepend(0::BIGINT, list_transform(hw, h -> ((h >> j) & 1) * 2 - 1)), " +
      "(a,b) -> a + b) > 0 THEN (1::BIGINT << j) ELSE 0 END)), (a,b) -> a + b) AS simhash " +
      "FROM t WHERE len(hw) > 0 ORDER BY doc_id"),
    "q_contamination" -> ContaminationSql,
    // coalesce(array_to_string(..), ''): DuckDB's array_to_string of an
    // empty list is NULL where Spark's concat_ws is '' (fully-cut docs)
    "q_span_dedup" -> ("WITH toks AS (SELECT doc_id, " + Toks + " AS t FROM documents), " +
      // gram keys are the engine's 60-bit md5Long — identical hash here
      "g2 AS (SELECT doc_id, u['s'] AS s, " +
      "('0x' || substr(md5(u['g']), 1, 15))::BIGINT AS g FROM (" +
      "SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 7), " +
      "i -> {'s': i, 'g': array_to_string(list_slice(t, i, i + 7), ' ')})) AS u " +
      "FROM toks WHERE len(t) >= 8)), " +
      "dup AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM g2 GROUP BY 1) " +
      "WHERE df >= 2), " +
      "cov AS (SELECT DISTINCT doc_id, p FROM (SELECT g2.doc_id, " +
      "unnest(generate_series(g2.s, g2.s + 7)) AS p FROM g2 JOIN dup USING (g))), " +
      "pc AS (SELECT doc_id, list(p) AS cov FROM cov GROUP BY 1) " +
      "SELECT t.doc_id, len(t.t) AS n_toks, coalesce(len(pc.cov), 0) AS n_dup_toks, " +
      "CASE WHEN len(t.t) = 0 THEN 0.0 ELSE coalesce(len(pc.cov), 0)::DOUBLE / len(t.t) END " +
      "AS dup_ratio, md5(coalesce(array_to_string(list_transform(list_filter(" +
      "generate_series(1, len(t.t)), i -> pc.cov IS NULL OR NOT list_contains(pc.cov, i)), " +
      "i -> t.t[i]), ' '), '')) AS clean_md5, " +
      "coalesce(length(array_to_string(list_transform(list_filter(" +
      "generate_series(1, len(t.t)), i -> pc.cov IS NULL OR NOT list_contains(pc.cov, i)), " +
      "i -> t.t[i]), ' ')), 0) AS clean_len " +
      "FROM toks t LEFT JOIN pc USING (doc_id) ORDER BY doc_id"),
    // same synthesized lines + %3 first-line injection; DuckDB lambda
    // indices are 1-based, so the prefix is ls[1:i-1]
    "q_intra_dedup" -> ("WITH d AS (SELECT doc_id, " + Toks + " AS toks FROM documents), " +
      "d2 AS (SELECT doc_id, toks FROM d WHERE len(toks) > 0), " +
      "l AS (SELECT doc_id, unnest(generate_series(0, " +
      "CAST(ceil(len(toks) / 6.0) AS BIGINT) - 1)) AS li, toks FROM d2), " +
      "lines AS (SELECT doc_id, li, " +
      "array_to_string(toks[li * 6 + 1 : li * 6 + 6], ' ') AS line FROM l), " +
      "byd AS (SELECT doc_id, list(line ORDER BY li) AS ls FROM lines GROUP BY 1), " +
      "inj AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 " +
      "THEN list_append(ls, ls[1]) ELSE ls END AS ls FROM byd), " +
      "ded AS (SELECT doc_id, ls, " +
      "list_filter(ls, (x, i) -> NOT list_contains(ls[1:i-1], x)) AS kept FROM inj) " +
      "SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines, " +
      "CAST(len(ls) - len(kept) AS BIGINT) AS n_removed, " +
      "md5(array_to_string(kept, chr(10))) AS clean_md5, " +
      "CAST(length(array_to_string(kept, chr(10))) AS BIGINT) AS clean_len " +
      "FROM ded ORDER BY doc_id"),
    // the synthesized 6-token lines contain no blanks and no edge spaces,
    // so the engine's trim-keyed hot set ≡ raw line equality here
    "q_line_dedup" -> ("WITH d AS (SELECT doc_id, " + Toks + " AS toks FROM documents), " +
      "d2 AS (SELECT doc_id, toks FROM d WHERE len(toks) > 0), " +
      "l AS (SELECT doc_id, unnest(generate_series(0, " +
      "CAST(ceil(len(toks) / 6.0) AS BIGINT) - 1)) AS li, toks FROM d2), " +
      "lines AS (SELECT doc_id, li, " +
      "array_to_string(toks[li * 6 + 1 : li * 6 + 6], ' ') AS line FROM l), " +
      "hot AS (SELECT line FROM lines GROUP BY line " +
      "HAVING count(DISTINCT doc_id) >= 2), " +
      "kept AS (SELECT doc_id, li, line FROM lines " +
      "WHERE line NOT IN (SELECT line FROM hot)), " +
      "tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY 1), " +
      "reb AS (SELECT doc_id, count(*) AS n_kept, " +
      "string_agg(line, chr(10) ORDER BY li) AS clean FROM kept GROUP BY 1) " +
      "SELECT t.doc_id, t.n_lines, t.n_lines - coalesce(r.n_kept, 0) AS n_removed, " +
      "md5(coalesce(r.clean, '')) AS clean_md5, " +
      "length(coalesce(r.clean, '')) AS clean_len " +
      "FROM tot t LEFT JOIN reb r USING (doc_id) ORDER BY doc_id"),
    // bloom prefilter + exact re-check ≡ exact contamination — same oracle
    "q_contamination_bloom" -> ContaminationSql,
    "q_dedup_simhash_pairs" -> (s"WITH $WithShingles, " +
      "hw AS (SELECT doc_id, list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS h FROM shing), " +
      "sims AS (SELECT doc_id AS doc, list_reduce(list_prepend(0::BIGINT, " +
      "list_transform(generate_series(0, 47), j -> CASE WHEN " +
      "list_reduce(list_prepend(0::BIGINT, list_transform(h, x -> ((x >> j) & 1) * 2 - 1)), " +
      "(a,b) -> a + b) > 0 THEN (1::BIGINT << j) ELSE 0 END)), (a,b) -> a + b) AS sh FROM hw) " +
      "SELECT x.doc AS a, y.doc AS b, bit_count(xor(x.sh, y.sh)) AS hamming " +
      "FROM sims x JOIN sims y ON x.doc < y.doc " +
      "WHERE bit_count(xor(x.sh, y.sh)) <= 7 ORDER BY a, b"),
    // same candidate chain (pigeonhole banding ≡ all-pairs at h ≤ 7),
    // exact-edit-distance confirmed via DuckDB's levenshtein; the
    // rel-thousandths floor divides exact integers in IEEE doubles on
    // both engines
    "q_dedup_edit_verify" -> (s"WITH $WithShingles, " +
      "hw AS (SELECT doc_id, list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS h FROM shing), " +
      "sims AS (SELECT doc_id AS doc, list_reduce(list_prepend(0::BIGINT, " +
      "list_transform(generate_series(0, 47), j -> CASE WHEN " +
      "list_reduce(list_prepend(0::BIGINT, list_transform(h, x -> ((x >> j) & 1) * 2 - 1)), " +
      "(a,b) -> a + b) > 0 THEN (1::BIGINT << j) ELSE 0 END)), (a,b) -> a + b) AS sh FROM hw), " +
      "cand AS (SELECT x.doc AS a, y.doc AS b FROM sims x JOIN sims y ON x.doc < y.doc " +
      "WHERE bit_count(xor(x.sh, y.sh)) <= 7), " +
      "v AS (SELECT c.a, c.b, CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist, " +
      "greatest(length(da.text), length(db.text)) AS mx " +
      "FROM cand c JOIN documents da ON c.a = da.doc_id " +
      "JOIN documents db ON c.b = db.doc_id) " +
      "SELECT a, b, dist, CAST(floor(dist * 1000 / mx) AS BIGINT) AS rel_q3, " +
      "CAST(floor(dist * 1000 / mx) AS BIGINT) <= 200 AS confirmed " +
      "FROM v ORDER BY a, b")
  )
}
