package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared curation queries + DuckDB oracles over `documents`: the
  * split / sample / pack / cluster / scrub surface of [[Curation]].
  * Assignments are pure md5-hash arithmetic, so every query is
  * oracle-checked bit-for-bit — including the iterative connected
  * components, whose oracle is a recursive CTE over the same pair set.
  */
object CurationQueries {

  /** The min-label connected components of the shared Jaccard ≥ 0.8 pair
    * frame ([[DedupQueries.nearDupPairs]]), resolved + materialized ONCE
    * per (session, dir): the cluster frame feeds keep/keep-best/cluster
    * queries, each of which previously re-ran the full pair build AND the
    * component iteration from raw text. (q_dup_clusters_star keeps its own
    * star-contraction closure over the shared PAIRS — the two component
    * machines are declared separately on purpose and oracle-checked to
    * agree.)
    */
  private def nearDupClusters(s: SparkSession, dir: String): DataFrame =
    Memo.cached(s, s"neardup-clusters|$dir") {
      Curation.connectedComponents(DedupQueries.nearDupPairs(s, dir))
    }

  private val SplitSalt = "s42"
  private val SampleSalt = "smp"
  private val WeightSalt = "wgt"
  private val AugmentSalt = "aug1"
  private val MixSalt = "mix"
  private val FixedKSalt = "k8"
  private val PackBudget = 2000L
  private val ChunkLen = 200
  private val ChunkStride = 150
  private val Blocklist = Seq("customer", "spark")
  private val CapSalt = "capdom"
  private val DomainCap = 15
  private val TemporalBoundary = "2024-01-22 00:00:00"

  /** The deterministic HTML page wrapped around each document for
    * q_html_extract (chrome = title/style/script/header/nav/footer
    * boilerplate; `text` is the main content). Synthesized identically in
    * the oracle — the multimodal synthesize-then-process pattern. */
  private def syntheticHtml: org.apache.spark.sql.Column =
    concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>.x{color:red}</style><script>var a=1;</script>" +
        "</head><body><header>Site "), col("source"),
      lit("</header><nav>home | about</nav><p>"), col("text"),
      lit("</p><footer>(c) 2026 example.org</footer></body></html>"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // k-anonymity + l-diversity audit on customers: quasi-identifiers
    // (nation, segment, acctbal rounded to 1000s), sensitive = exact
    // balance; groups under k=3 are re-identifiable. One rollup exchange.
    "q_k_anonymity" -> { (s, dir) =>
      Curation
        .kAnonymityAudit(
          Tables.customer(s, dir)
            .withColumn("bal_kb", floor(col("c_acctbal") / 1000).cast("long")),
          Seq("c_nationkey", "c_mktsegment", "bal_kb"), "c_acctbal", k = 3)
        .orderBy("c_nationkey", "c_mktsegment", "bal_kb")
    },

    // k-ANONYMITY GENERALIZATION LADDER — the mechanism to
    // q_k_anonymity's audit: walk the telescoping QI lattice
    // (segment, nation, bal_kb) → (segment, nation) → (segment) → ()
    // in ONE rollup pass (one scan + one exchange — grouping_id tags the
    // level, so no per-level re-aggregation and no data-value/grouping-
    // null ambiguity), then mark the FIRST level where every group
    // reaches k = 3 — the minimal generalization a release would apply.
    // The chosen-level compare runs a global window over the 4-row ladder.
    "q_k_generalize" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ladder = Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_kb"))
        .rollup(col("c_mktsegment"), col("c_nationkey"), col("bal_kb"))
        .agg(count(lit(1)).as("gs"), grouping_id().as("gid"))
        .groupBy(
          when(col("gid") === 0, 0L).when(col("gid") === 1, 1L)
            .when(col("gid") === 3, 2L).otherwise(3L).as("level"))
        .agg(count(lit(1)).as("n_groups"), min(col("gs")).as("min_group"),
          sum(when(col("gs") < 3, 1L).otherwise(0L)).as("n_at_risk"))
      ladder
        .withColumn("chosen",
          col("level") === min(when(col("min_group") >= 3, col("level")))
            .over(Window.partitionBy()))
        .orderBy("level")
    },

    // BEHAVIORAL l-diversity — the cross-table complement of
    // q_k_anonymity's dim-side audit: the sensitive attribute is what the
    // users in a quasi-identifier group DID (their event types), not a dim
    // column. A (nation, segment) group where every member only ever
    // purchases leaks behavior under linkage even at high k; l ≥ 3 is the
    // release gate. One broadcast of the dim onto the fact, one
    // two-countDistinct rollup (Spark expands to two partial aggs riding
    // the same exchange).
    "q_l_diversity" -> { (s, dir) =>
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_nationkey"), col("c_mktsegment"))
      Tables.events(s, dir)
        .join(broadcast(cust), Seq("user_id"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("l"))
        .withColumn("diverse", col("l") >= 3)
        .orderBy("c_nationkey", "c_mktsegment")
    },

    // t-CLOSENESS audit ([[Curation.tCloseness]]) — completes the privacy
    // tripod (q_k_anonymity: size, q_l_diversity: variety, this:
    // distribution): per (nation, segment) group, exact-integer EMD
    // between the group's ordered balance-bucket distribution and the
    // corpus-wide one; exceeds at t > 0.2. One corpus agg, then
    // group-space × bucket-space algebra only.
    "q_t_closeness" -> { (s, dir) =>
      Curation
        .tCloseness(
          Tables.customer(s, dir)
            .select(col("c_nationkey"), col("c_mktsegment"),
              floor(col("c_acctbal") / 1000).cast("long").as("bal_kb")),
          Seq("c_nationkey", "c_mktsegment"), "bal_kb", tQ6 = 200000L)
        .orderBy("c_nationkey", "c_mktsegment")
    },

    // HTML boilerplate removal (the web-crawl main-content stage):
    // synthesize a deterministic page around each doc, strip
    // script/style/nav/header/footer + tags, collapse whitespace.
    // Map-only regex chain — zero shuffle.
    "q_html_extract" -> { (s, dir) =>
      Tables
        .documents(s, dir)
        .select(col("doc_id"), syntheticHtml.as("html"))
        .select(col("doc_id"), length(col("html")).cast("long").as("html_chars"),
          Curation.htmlMainText(col("html")).as("t"))
        .select(col("doc_id"), col("html_chars"), md5(col("t")).as("text_md5"),
          length(col("t")).cast("long").as("text_chars"),
          (length(col("t")).cast("double") / col("html_chars")).as("content_ratio"))
        .orderBy("doc_id")
    },
    // Token-budget corpus selection: greedily keep the highest-quality
    // documents until a global token budget (half the corpus's tokens) is
    // spent — the data-constrained-scaling selection step (choose what to
    // train on when compute affords only a fraction of the corpus).
    // Quality is the docStats composite q4-quantized so the greedy order
    // (q4 DESC, doc_id) is integer-deterministic; the budget derives from
    // one singleton aggregate (broadcast); kept = running token sum ≤
    // budget via a prefix-sum window. The global-order window is the
    // declared form; at corpus scale the selection runs exactly like
    // packBinsTwoPass — per-chunk local prefix sums + broadcast chunk
    // offsets — since prefix-sum decomposition is associative.
    "q_token_budget" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // lazy checkpoint: the stats frame feeds the budget aggregate AND
      // the window subtree — uncut, the corpus tokenizes once per
      // consumer (measured 37 s at ×100; the quality/token expressions
      // dominate)
      val stats = Dedup.Intermediate.LocalLazy(
        TextOps
          .docStats(Tables.documents(s, dir), "doc_id", "text")
          .select(col("doc_id"), col("tok_cnt"),
            floor(col("quality") * 10000).cast("long").as("q4")),
        "budget_stats")
      val budget = stats.agg(floor(sum(col("tok_cnt")) / 2).cast("long").as("budget"))
      val w = Window
        .orderBy(col("q4").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      stats
        .withColumn("cum_tokens", sum(col("tok_cnt")).over(w).cast("long"))
        .crossJoin(broadcast(budget))
        .select(col("doc_id"), col("q4"), col("tok_cnt"), col("cum_tokens"),
          (col("cum_tokens") <= col("budget")).as("kept"))
        .orderBy("doc_id")
    },

    // Deterministic train/val/test split (90/5/5 by salted hash bucket),
    // rolled up per split. Map-only assignment — no shuffle, retry-stable.
    "q_split_assign" -> { (s, dir) =>
      Curation
        .splitAssign(Tables.documents(s, dir), "doc_id", SplitSalt,
          trainUpTo = 9000, valUpTo = 9500)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy("split")
    },

    // Per-DOMAIN cap (Common-Crawl-style quota): each source keeps at most
    // 15 docs, chosen by salted-hash order — an unbiased, retry-stable
    // per-group sample; rolled up per source with the kept-id checksum.
    "q_domain_caps" -> { (s, dir) =>
      Curation
        .capPerGroup(Tables.documents(s, dir), "doc_id", "source", cap = DomainCap,
          salt = CapSalt)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("keep").cast("long")).as("n_kept"),
          sum(when(col("keep") === 1, col("doc_id"))).as("kept_id_sum"))
        .orderBy("source")
    },

    // Temporal split at a fixed boundary (train on the past, test on the
    // future) + the crossover-entity leak audit — per-user conditional
    // aggregation, one scan, 3-row summary.
    "q_split_temporal" -> { (s, dir) =>
      Curation
        .temporalSplit(Tables.events(s, dir), "user_id", "ts", TemporalBoundary)
        .orderBy("split")
    },

    // Stratified source re-weighting: oversample src0/src1, keep 5% of the
    // rest — the exact kept set, reproducible from (id, salt, rates) alone.
    "q_sample_stratified" -> { (s, dir) =>
      Curation
        .sampleStratified(Tables.documents(s, dir), "doc_id", "source",
          rates = Map("src0" -> 0.3, "src1" -> 0.2), defaultRate = 0.05,
          salt = SampleSalt)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    },

    // Dup-rate stratified by length: exact-duplicate share per 256-char
    // bucket — "are short docs more duplicated?" (they usually are:
    // boilerplate), the read that decides whether dedup thresholds need
    // length conditioning. One fp-keyed window (group sizes) + one bucket
    // agg; all-integer.
    "q_dup_rate_by_length" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, dir)
        .select(col("n_chars"), md5(col("text")).as("fp"))
        .withColumn("grp", count(lit(1)).over(Window.partitionBy("fp")))
        .groupBy(expr("n_chars DIV 256").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("grp") > 1).cast("long")).as("n_dup"))
        .withColumn("dup_q6", expr("n_dup * 1000000 DIV n_docs"))
        .orderBy("bucket")
    },

    // Systematic 1-in-50 sampling on the global doc_id order — the
    // evenly-spaced audit sample (exact spacing, no clustering risk)
    // next to the hash-Bernoulli q_sample_* family; rides
    // [[Scale.globalRowNumber]], never an empty-over window.
    "q_sample_systematic" -> { (s, dir) =>
      Scale
        .globalRowNumber(
          Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
          "doc_id", partitions = 8)
        .filter(col("rownum") % 50 === 0)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },

    // Length-bucketed batching efficiency: group documents into 256-char
    // length buckets (the seq-len bucketing every trainer's data loader
    // applies before padding) and report each bucket's padding waste
    // n·max − Σlen — the number an engineer reads to size bucket
    // granularity (waste_q6 → 0 as buckets narrow). One combining agg;
    // all-integer.
    "q_length_buckets" -> { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(expr("n_chars DIV 256").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          max("n_chars").as("max_len"), sum("n_chars").as("sum_len"))
        .select(col("bucket"), col("n_docs"), col("max_len"), col("sum_len"),
          (col("n_docs") * col("max_len") - col("sum_len")).as("pad_waste"),
          expr("(n_docs * max_len - sum_len) * 1000000 DIV (n_docs * max_len)")
            .as("waste_q6"))
        .orderBy("bucket")
    },

    // Deterministic token-dropout augmentation
    // ([[Curation.augmentDropout]]): 10% of tokens drop by salted
    // (doc, position) hash — reproducible from config alone (no RNG
    // state), independent masks per salt (= per epoch). Map-only: indexed
    // higher-order filter inside one projection, no explode, no shuffle.
    "q_augment_dropout" -> { (s, dir) =>
      Curation
        .augmentDropout(Tables.documents(s, dir), "doc_id", "text",
          salt = AugmentSalt, dropBelow = 1000)
        .orderBy("doc_id")
    },

    // Curriculum sharding: documents ordered by difficulty (n_chars, the
    // deterministic proxy) get a GLOBAL curriculum rank without the
    // single-reducer sort ([[Scale.globalRowNumber]] — range repartition +
    // local numbering + broadcast prefix offsets), then round-robin
    // rank % 8 assignment so every shard carries the same difficulty
    // PROFILE (consecutive ranks land in different shards — each shard's
    // char sums agree to within one document). The per-shard audit is what
    // a curriculum-training data loader checks before trusting the split.
    // Rank key packs (n_chars, doc_id) into one unique BIGINT — the
    // globalRowNumber determinism contract.
    "q_curriculum_shards" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          (col("n_chars") * lit(1L << 40) + col("doc_id")).as("ckey"))
      Scale
        .globalRowNumber(docs, "ckey", partitions = 8)
        .select(col("n_chars"), (col("rownum") % 8).as("shard"), col("rownum"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          min("rownum").as("first_rank"), max("rownum").as("last_rank"))
        .orderBy("shard")
    },

    // Largest-remainder quota allocation ([[Curation.allocateQuota]]):
    // a 1000-doc sample budget split across sources exactly
    // proportionally — Σalloc = 1000 by construction, every group within
    // 1 of its exact share, all-integer (no float rate rounding). The
    // per-group count agg is the only corpus pass; the allocation windows
    // ride the 20-row group frame.
    "q_quota_allocate" -> { (s, dir) =>
      Curation
        .allocateQuota(
          Tables.documents(s, dir).groupBy("source").agg(count(lit(1)).as("n_docs")),
          "source", "n_docs", budget = 1000L)
        .orderBy("source")
    },

    // Length-proportional weighted sampling: keep probability
    // least(n_chars/400, 1) per doc — the byte-budget curation sample,
    // retry-stable from (id, salt, weight) alone. Map-only.
    "q_sample_weighted" -> { (s, dir) =>
      Curation
        .sampleWeighted(Tables.documents(s, dir), "doc_id",
          least(col("n_chars") / 400.0, lit(1.0)), salt = WeightSalt)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    },

    // Sequence packing: per-source streams cut into 2000-char bins
    // (concatenate-then-chunk), rolled up per bin. One prefix-sum window.
    "q_pack_bins" -> { (s, dir) =>
      Curation
        .packBins(Tables.documents(s, dir), "doc_id", "n_chars", "source", PackBudget)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy("source", "bin")
    },

    // Duplicate-cluster resolution: connected components over the 3-gram
    // Jaccard ≥ 0.8 pair set; each cluster labeled by its smallest doc id,
    // members serialized in numeric order (array columns crash the
    // driver's pandas compare — r1).
    "q_dup_clusters" -> { (s, dir) =>
      nearDupClusters(s, dir)
        .groupBy(col("cluster").as("cluster_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          concat_ws("-",
            transform(sort_array(collect_list(col("doc"))), _.cast("string")))
            .as("members"))
        .orderBy("cluster_id")
    },

    // Content-defined chunking: boundary after tokens whose md5-60-bit
    // hash ≡ 0 (mod 32) — expected ~32-token chunks whose boundaries
    // survive prefix edits (the chunk-level-dedup property; law in
    // CurationSpec). One doc-keyed exchange for window + rollup.
    "q_chunk_cdc" -> { (s, dir) =>
      Curation
        .cdcChunks(Tables.documents(s, dir), "doc_id", "text", boundaryMod = 32)
        .select(col("doc").as("doc_id"), col("chunk_idx"), col("n_toks"), col("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Integer PageRank (3 damped rounds, q9 fixed point) over the SAME
    // Jaccard pair graph the cluster queries use — centrality-based
    // canonical selection: within a near-dup cluster the hub (the version
    // most others resemble) outranks the leaves. All-integer update rule
    // ⇒ hash-exact (see Curation.pagerankInteger).
    "q_dup_pagerank" -> { (s, dir) =>
      Curation
        .pagerankInteger(DedupQueries.nearDupPairs(s, dir), iters = 3)
        .select(col("doc").as("doc_id"), col("rank_q9"))
        .orderBy("doc_id")
    },

    // LEAKAGE-SAFE split: near-dup clusters (same jaccard pair set as
    // q_dup_clusters) bucket by their CLUSTER label, so no near-dup pair
    // can straddle train/test; everything else splits exactly like
    // q_split_assign. Emitted per-doc (split + a leak-visible rollup
    // would hide singletons) ordered by id; the oracle recomputes the
    // closure with the recursive CTE and the identical md5 bucket.
    "q_split_leakage_safe" -> { (s, dir) =>
      Curation
        .splitAssignLeakageSafeFromClusters(Tables.documents(s, dir), "doc_id",
          nearDupClusters(s, dir), SplitSalt, trainUpTo = 9000, valUpTo = 9500)
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
    },

    // Same pack as q_pack_bins through the TWO-PASS decomposition
    // (per-(source, chunk) local prefix + broadcast chunk offsets — the
    // beyond-executor-scale form): identical bins by the
    // CurationPropertySpec law, now ALSO oracle-checked against the
    // single-window SQL.
    "q_pack_bins_two_pass" -> { (s, dir) =>
      Curation
        .packBinsTwoPass(Tables.documents(s, dir), "doc_id", "n_chars", "source",
          PackBudget, chunkCol = floor(col("doc_id") / 64))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy("source", "bin")
    },

    // Same clusters as q_dup_clusters through the O(log n)
    // large-star/small-star alternation — the high-diameter scale path,
    // oracle-checked against the SAME recursive-CTE closure.
    "q_dup_clusters_star" -> { (s, dir) =>
      Curation
        .connectedComponentsStar(DedupQueries.nearDupPairs(s, dir))
        .groupBy(col("cluster").as("cluster_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          concat_ws("-",
            transform(sort_array(collect_list(col("doc"))), _.cast("string")))
            .as("members"))
        .orderBy("cluster_id")
    },

    // Fixed-count per-source sample: exactly 5 docs per source, ranked by
    // salted hash (WindowGroupLimit turns the rank filter into per-
    // partition top-k before the shuffle).
    "q_sample_fixed_k" -> { (s, dir) =>
      Curation
        .sampleFixedK(Tables.documents(s, dir), "doc_id", "source", k = 5, salt = FixedKSalt)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    },

    // Training-mixture assembly: per-source epoch weights (src0 ×2.5,
    // src1 ×1.0, rest ×0.5) replicate documents with a 0-based `copy`
    // index; the fractional epoch is decided by salted hash — the exact
    // mixture is reproducible from (id, source, weights, salt).
    "q_mix_weights" -> { (s, dir) =>
      Curation
        .repeatByWeight(Tables.documents(s, dir), "doc_id", "source",
          weights = Map("src0" -> 2.5, "src1" -> 1.0), defaultWeight = 0.5,
          salt = MixSalt)
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy("doc_id", "copy")
    },

    // Temperature flattening at α=0.5 (Curation.temperatureShares): char-
    // mass shares per source at α=1 vs α=0.5 side by side — the
    // multilingual re-balancing table (sqrt is the one fractional power
    // both engines round identically; pow would drift).
    "q_mix_temperature" -> { (s, dir) =>
      Curation
        .temperatureShares(Tables.documents(s, dir), "source", "n_chars")
        .orderBy("source")
    },

    // Dataset "nutrition label": the one-row release card a corpus ships
    // with — size, provenance breadth, exact-dup rate, quality-gate pass
    // rate, mean length — assembled from three independent one-pass
    // summaries (base profile / dup groups / gopher gate) cross-joined as
    // 1-row frames; rates are exact q6 integer floor-divisions.
    "q_dataset_card" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val base = d.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        count_distinct(col("source")).as("n_sources"),
        count_distinct(col("lang")).as("n_langs"))
      val dup = Dedup.exactGroups(d, "doc_id", "text")
        .agg(count(lit(1)).as("n_contents"),
          coalesce(sum(when(col("dup_cnt") >= 2, col("dup_cnt")).otherwise(lit(0L))),
            lit(0L)).as("dup_docs"))
      val gate = TextOps.gopherGate(d, "doc_id", "text")
        .agg(sum(col("keep").cast("long")).as("kept_docs"))
      base.crossJoin(dup).crossJoin(gate)
        .select(
          col("n_docs"), col("total_chars"), col("n_sources"), col("n_langs"),
          col("n_contents"), col("dup_docs"),
          expr("dup_docs * 1000000 div n_docs").as("dup_rate_q6"),
          expr("kept_docs * 1000000 div n_docs").as("gate_keep_q6"),
          expr("total_chars * 100 div n_docs").as("mean_chars_q2"))
    },

    // Quality-decile stratified sampling: classifier scores bucketed by
    // the nine exact decile THRESHOLDS (one tiny-state percentile agg,
    // broadcast — never a global sort/ntile, which would funnel the
    // corpus through one partition), then exactly 5 docs per decile by
    // salted-hash rank (Curation.sampleFixedK — WindowGroupLimit prunes
    // below the decile exchange). The curation move for building
    // quality-balanced eval slices.
    "q_sample_by_decile" -> { (s, dir) =>
      val sc = TextOps.classifierScores(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("score"))
      val th = sc.agg(
        expr("percentile(score, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("qs"))
      val dec = sc.crossJoin(broadcast(th))
        .withColumn("decile", size(filter(col("qs"), t => col("score") > t)).cast("long"))
        .drop("qs")
      Curation
        .sampleFixedK(dec, "doc_id", "decile", k = 5, salt = "decile-v1")
        .select(col("doc_id"), col("decile"),
          floor(col("score") * 1000000).cast("long").as("score_q6"))
        .orderBy("decile", "doc_id")
    },

    // Deterministic pseudonymization: user keys replaced by salted md5
    // tokens (the share-data-without-identities move). The query PROVES
    // the property that makes pseudonymized exports analytically usable —
    // join consistency: events⋈customer through the TOKEN reproduces the
    // raw-key join bit-for-bit (same salt ⇒ same token on both tables,
    // map-only, no lookup table to leak). Per segment: event counts and
    // value sums via both joins side by side.
    "q_pseudonymize" -> { (s, dir) =>
      val salt = "pseudo-v1"
      def tok(c: org.apache.spark.sql.Column) =
        Dedup.md5Long(concat(lit(salt + ":"), c.cast("string")))
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("value"), tok(col("user_id")).as("u_tok"))
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), tok(col("c_custkey")).as("c_tok"))
      val raw = ev.join(broadcast(cust), ev("user_id") === cust("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("raw_cnt"), round(sum(col("value")), 2).as("raw_sum"))
      val tokj = ev.join(broadcast(cust), ev("u_tok") === cust("c_tok"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("tok_cnt"), round(sum(col("value")), 2).as("tok_sum"))
      raw.join(tokj, Seq("segment"))
        .select(col("segment"), col("raw_cnt"), col("tok_cnt"),
          (col("raw_cnt") === col("tok_cnt") && col("raw_sum") === col("tok_sum"))
            .as("consistent"))
        .orderBy("segment")
    },

    // GDPR right-to-erasure cascade (Curation.erasureAudit): a DSAR key
    // list (stand-in: custkeys ≡ 7 mod 10) cascades across customer /
    // orders / events with per-table before/removed/after evidence — one
    // scan per table, the list broadcast as data (a real run feeds the
    // same frame to the delete writer).
    "q_erasure_cascade" -> { (s, dir) =>
      val del = Tables.customer(s, dir)
        .filter(col("c_custkey") % 10 === 7).select(col("c_custkey"))
      Curation
        .erasureAudit(
          Seq(
            ("customer", Tables.customer(s, dir), "c_custkey"),
            ("events", Tables.events(s, dir), "user_id"),
            ("orders", Tables.orders(s, dir), "o_custkey")),
          del, "c_custkey")
        .orderBy("table_name")
    },

    // End-to-end near-dup removal: drop non-canonical members of every
    // Jaccard ≥ 0.8 cluster, keep everything else.
    "q_dedup_keep" -> { (s, dir) =>
      // the memoized cluster frame replaces dropNearDuplicates' internal
      // component recompute; same broadcast anti-join tail (the removal
      // set is pair-scale — the corpus side never shuffles)
      val nonCanonical = nearDupClusters(s, dir)
        .filter(col("doc") =!= col("cluster"))
        .select(col("doc").as("doc_id"))
      Tables.documents(s, dir)
        .join(broadcast(nonCanonical), Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
        .orderBy("doc_id")
    },

    // DP-SHAPED noisy release counts — the discrete-Laplace (two-sided
    // geometric, α = 1/2 ⇒ ε = ln 2) mechanism on sensitivity-1 type
    // counts, with the noise draw HASH-SEEDED so the release is
    // reproducible and oracle-checkable (the q_bootstrap_ci precedent:
    // deterministic draws via md5 + integer inverse-CDF thresholds — a
    // production deployment swaps in a real RNG without touching the
    // plan). u = md5(type‖salt) mod 1024 walks the quantized CDF
    // (P(0)=341/1024, P(±k)=⌊341/2ᵏ⌋ each side, tail mass folded to 0).
    "q_dp_counts" -> { (s, dir) =>
      val u = pmod(Dedup.md5Long(concat(col("event_type"), lit("|dp1"))), lit(1024L))
      val noise =
        when(u < 341, 0L)
          .when(u < 512, 1L).when(u < 683, -1L)
          .when(u < 768, 2L).when(u < 853, -2L)
          .when(u < 896, 3L).when(u < 939, -3L)
          .when(u < 960, 4L).when(u < 981, -4L)
          .when(u < 992, 5L).when(u < 1003, -5L)
          .when(u < 1008, 6L).when(u < 1013, -6L)
          .otherwise(0L)
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("true_n"))
        .select(col("event_type"), col("true_n"), noise.as("noise"),
          greatest(col("true_n") + noise, lit(0L)).as("noisy_n"))
        .orderBy("event_type")
    },

    // QUALITY-AWARE near-dup survivor selection — q_dedup_keep keeps each
    // cluster's min-id member; production (FineWeb-style) keeps the
    // HIGHEST-QUALITY member. Clusters from the same Jaccard pair frame,
    // quality = the hashed classifier score quantized to an integer so
    // the argmax order (score_q6 desc, doc_id) is fully deterministic;
    // singletons pass through untouched. One cluster-keyed window over
    // the pair-scale label frame + a broadcast anti-join for singletons —
    // the corpus never shuffles.
    "q_dedup_keep_best" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
      // memo-materialized cluster frame (read twice below: window + anti)
      val lab = nearDupClusters(s, dir)
        .select(col("doc").as("doc_id"), col("cluster"))
      val sc = TextOps.classifierScores(d, "doc_id", "text")
        .select(col("doc_id"), floor(col("score") * 1e6).cast("long").as("score_q6"))
      val w = Window.partitionBy("cluster").orderBy(col("score_q6").desc, col("doc_id"))
      val best = lab
        .join(sc, Seq("doc_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("score_q6"))
      val singles = sc.join(broadcast(lab.select(col("doc_id"))), Seq("doc_id"), "left_anti")
      best.unionByName(singles).orderBy("doc_id")
    },

    // Deterministic NEGATIVE-PAIR sampling for contrastive training: the
    // 50 docs with the smallest md5(id‖'L') hashes cross the 50 smallest
    // md5(id‖'R') hashes (a ≤ 2500-pair frame BOUNDED at any corpus
    // size — sample-then-pair, never corpus²), minus any pair the
    // near-dup detector links (those would be false negatives). Hash-rank
    // selection is retry-stable and oracle-replayable — no RNG state.
    "q_negative_pairs" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
      def side(tag: String) = d
        .select(col("doc_id"),
          Dedup.md5Long(concat(col("doc_id").cast("string"), lit(tag))).as("h"))
        .withColumn("rn", row_number().over(Window.orderBy(col("h"), col("doc_id"))))
        .filter(col("rn") <= 50)
        .select(col("doc_id"))
      val dup = DedupQueries.nearDupPairs(s, dir).select(col("a"), col("b"))
      side("L").select(col("doc_id").as("a"))
        .crossJoin(broadcast(side("R").select(col("doc_id").as("b"))))
        .filter(col("a") < col("b"))
        .join(broadcast(dup), Seq("a", "b"), "left_anti")
        .orderBy("a", "b")
    },

    // Fixed-window chunking with stride (200-char chunks every 150 chars —
    // 50-char overlap), the embedding-pipeline shape; chunk text emitted as
    // md5 (full-content parity without wide rows).
    "q_chunk_text" -> { (s, dir) =>
      Curation
        .chunkByChars(Tables.documents(s, dir), "doc_id", "text",
          len = ChunkLen, stride = ChunkStride)
        .select(col("doc_id"), col("chunk_idx"), md5(col("chunk")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },

    // The end-to-end curation chain in ONE declared plan: Gopher quality
    // gate → blocklist scrub → train/val/test split → per-(split, keep)
    // rollup. The chain is what a production pretraining pipeline runs;
    // declaring it as one query proves the stages COMPOSE — one gate
    // aggregation + join-back, scrub and split stay map-only on top, one
    // final rollup exchange.
    "q_curation_pipeline" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pat = Curation.blocklistPattern(Blocklist)
      val (scrubbed, hits) = Curation.scrub(col("text"), pat, "<TERM>")
      val enriched = Curation
        .splitAssign(docs, "doc_id", SplitSalt, trainUpTo = 9000, valUpTo = 9500)
        .select(col("doc_id"), col("split"), hits.as("n_hits"),
          length(scrubbed).as("scrub_len"))
        .join(TextOps.gopherGate(docs, "doc_id", "text")
          .select(col("doc_id"), col("keep")), Seq("doc_id"))
      enriched
        .groupBy("split", "keep")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_hits")).as("hits"),
          sum(col("scrub_len")).as("scrub_chars"))
        .orderBy("split", "keep")
    },

    // Blocklist scrub: whole-word replacement + hit count; the scrubbed
    // text is emitted as its md5 (full-text parity without megabyte rows).
    "q_text_scrub" -> { (s, dir) =>
      val pat = Curation.blocklistPattern(Blocklist)
      val (scrubbed, hits) = Curation.scrub(col("text"), pat, "<TERM>")
      Tables
        .documents(s, dir)
        .select(col("doc_id"), hits.as("n_hits"), md5(scrubbed).as("scrub_md5"))
        .orderBy("doc_id")
    },

    // Corpus release audit ([[Curation.snapshotDiff]]): v2 is derived
    // deterministically from v1 (÷7 ids removed, ÷5 texts revised, ÷11
    // re-keyed copies added), the diff classifies every key via a full
    // outer join of (key, fingerprint) pairs — payloads never ride the
    // join shuffle — and the output is per-class counts + an id checksum.
    // The oracle rebuilds v2 and classifies by direct text comparison:
    // fingerprint-based classification must agree exactly.
    "q_corpus_diff" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val v2 = docs
        .filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
        .unionByName(
          docs.filter(pmod(col("doc_id"), lit(11)) === 0)
            .withColumn("doc_id", col("doc_id") + 1000000L))
      Curation
        .snapshotDiff(docs, v2, "doc_id", md5(col("text")))
        .groupBy("change")
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
        .orderBy("change")
    },

    // Chunking must be LOSSLESS: fixed-window chunks (stride = len, no
    // overlap) reassembled per document — collect_list of (idx, chunk)
    // structs, array_sort (per-doc chunk counts are bounded, so the
    // per-group array is small at any corpus size), positional concat —
    // must md5-match the original text exactly. The oracle recomputes the
    // closed-form chunk count and asserts intactness; an engine that
    // drops a final sliver, double-emits an overlap, or reorders chunks
    // cannot hash-match.
    "q_chunk_roundtrip" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val rebuilt = Curation
        .chunkByChars(docs, "doc_id", "text", len = 100, stride = 100)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
              x => x.getField("chunk")),
            "").as("rebuilt"))
      // merge hints: BOTH sides are corpus-sized at scale (stats at test
      // SF would broadcast the md5 side — fatal at 100 TB); the rebuilt
      // side arrives already hash-partitioned by doc_id from its groupBy,
      // so the join adds one exchange for the md5 side only
      docs.select(col("doc_id"), md5(col("text")).as("orig_md5")).hint("merge")
        .join(rebuilt.hint("merge"), Seq("doc_id"))
        .select(col("doc_id"), col("n_chunks"),
          (md5(col("rebuilt")) === col("orig_md5")).as("intact"))
        .orderBy("doc_id")
    },

    // FRACTIONAL EPOCH UPSAMPLING — the mixture-weight mechanism between
    // integer repetition and sampling: source k gets weight w_q2/100 ∈
    // [1, 3) (a deterministic per-source literal rule), every doc emits
    // ⌊w⌋ copies and doc_id % 100 < (w_q2 % 100) selects WHICH docs carry
    // the fractional extra copy — exact rounding law
    // |n_rows·100 − n_docs·w_q2| < 100·n_docs, no RNG, rerun-stable (the
    // property an epoch-reproducible training run needs). The explode is
    // the actual operator (sequence + explode, map-only); the declared
    // rollup audits it per source.
    "q_upsample_repeat" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          (lit(100) + (substring(col("source"), 4, 10).cast("int") * 37) % 201).as("w_q2"))
        .select(col("doc_id"), col("source"), col("w_q2"),
          explode(sequence(lit(1),
            (col("w_q2") / 100).cast("int") +
              when(pmod(col("doc_id"), lit(100)) < col("w_q2") % 100, 1).otherwise(0)))
            .as("copy"))
        .groupBy("source")
        .agg(max(col("w_q2")).as("w_q2"), count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_rows"))
        .orderBy("source")
    },

    // DETERMINISTIC EPOCH RE-SHARDING — each training epoch re-permutes
    // the corpus into 16 shards by a salted hash (epoch is the salt: same
    // corpus, different epoch → a different but REPRODUCIBLE shard
    // assignment; the md5-bucket idiom the splits/CMS queries share).
    // Map-only assignment — shard files at 100 TB are written straight
    // out of one pass, no global sort, no row_number over the corpus —
    // and the declared rollup is the shard-balance audit (docs + tokens
    // per shard per epoch) a pipeline checks before launching the run.
    "q_epoch_shuffle" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("tc"),
          explode(sequence(lit(0), lit(2))).as("epoch"))
        .withColumn("shard",
          pmod(conv(substring(md5(concat_ws("-", col("epoch"), col("doc_id"))), 1, 15),
            16, 10).cast("long"), lit(16)))
        .groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("n_tokens"))
        .orderBy("epoch", "shard")
    }
  )

  // ---- DuckDB fragments -----------------------------------------------------

  /** Salted bucket in [0, 10000) — mirrors [[Curation.hashBucket]]. */
  private def bucketSql(salt: String): String = bucketSqlOn(salt, "doc_id")

  private def bucketSqlOn(salt: String, expr: String): String =
    s"(('0x' || substr(md5('$salt:' || $expr), 1, 15))::BIGINT % ${Curation.Buckets})"

  /** Same Java-and-RE2-portable pattern string the engine compiles —
    * embedded verbatim (DuckDB string literals keep backslashes as-is).
    */
  private val BlockPat = Curation.blocklistPattern(Blocklist)

  /** Shared CTE chain (requires a WITH RECURSIVE prefix): jaccard pairs →
    * symmetric edges → reachability closure → per-doc min-label `labels`.
    */
  private val ClusterCtes =
    s"${DedupQueries.WithShingles}, ${DedupQueries.Postings}, " +
      "inter AS (SELECT x.doc AS a, y.doc AS b, count(*) AS i FROM post x " +
      "JOIN post y ON x.h = y.h AND x.doc < y.doc GROUP BY 1, 2), " +
      "pairs AS (SELECT a, b FROM inter " +
      "JOIN sz sa ON a = sa.doc JOIN sz sb ON b = sb.doc " +
      "WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= 0.8), " +
      "edges AS (SELECT a AS src, b AS dst FROM pairs " +
      "UNION SELECT b AS src, a AS dst FROM pairs), " +
      "reach(v, r) AS (SELECT src AS v, src AS r FROM edges " +
      "UNION SELECT e.dst AS v, reach.r FROM edges e JOIN reach ON e.src = reach.v), " +
      "labels AS (SELECT v AS doc, min(r) AS cluster FROM reach GROUP BY v)"

  /** One integer-PageRank round as a CTE pair: shares flow along edges,
    * the damped update truncates at every division — mirrors
    * [[Curation.pagerankInteger]] exactly. CAST on the sum: DuckDB
    * sum(BIGINT)→HUGEINT→pandas float64 hash artifact.
    */
  private def prRound(prev: String, cur: String): String =
    s"s$cur AS (SELECT e.dst AS doc, CAST(sum(r.r // r.deg) AS BIGINT) AS contrib " +
      s"FROM edges e JOIN $prev r ON e.src = r.doc GROUP BY 1), " +
      s"$cur AS (SELECT p.doc, p.deg, p.n, " +
      "((100 - 85) * (1000000000 // p.n)) // 100 + " +
      s"(85 * coalesce(s$cur.contrib, 0)) // 100 AS r " +
      s"FROM $prev p LEFT JOIN s$cur USING (doc))"

  def oracleSql: Map[String, String] = Map(
    // same literal weight rule, same integer copy count + fractional-copy
    // selector, same generate_series explode
    "q_upsample_repeat" -> ("WITH w AS (SELECT doc_id, source, " +
      "100 + (CAST(substring(source, 4, 10) AS INT) * 37) % 201 AS w_q2 FROM documents), " +
      "e AS (SELECT doc_id, source, w_q2, unnest(generate_series(1, w_q2 // 100 + " +
      "CASE WHEN doc_id % 100 < w_q2 % 100 THEN 1 ELSE 0 END)) AS copy FROM w) " +
      "SELECT source, max(w_q2) AS w_q2, count(DISTINCT doc_id) AS n_docs, " +
      "count(*) AS n_rows FROM e GROUP BY 1 ORDER BY 1"),
    // same epoch-salted md5 bucket (the CMS/splits hash idiom)
    "q_epoch_shuffle" -> (s"WITH d AS (SELECT doc_id, len(${TextQueries.Toks}) AS tc " +
      "FROM documents), " +
      "e AS (SELECT doc_id, tc, unnest(generate_series(0, 2)) AS epoch FROM d) " +
      "SELECT epoch, ('0x' || substr(md5(concat(CAST(epoch AS VARCHAR), '-', " +
      "CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT % 16 AS shard, " +
      "count(*) AS n_docs, CAST(sum(tc) AS BIGINT) AS n_tokens " +
      "FROM e GROUP BY 1, 2 ORDER BY 1, 2"),
    // same quasi grouping; count(DISTINCT) over exact doubles is portable
    "q_k_anonymity" -> ("SELECT c_nationkey, c_mktsegment, " +
      "CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb, " +
      "count(*) AS group_size, count(DISTINCT c_acctbal) AS distinct_sensitive, " +
      "count(*) < 3 AS at_risk FROM customer GROUP BY 1, 2, 3 " +
      "ORDER BY c_nationkey, c_mktsegment, bal_kb"),
    // same rollup lattice; GROUPING() bit order matches Spark grouping_id
    "q_k_generalize" -> ("WITH base AS (SELECT c_mktsegment, c_nationkey, " +
      "CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb FROM customer), " +
      "g AS (SELECT GROUPING(c_mktsegment, c_nationkey, bal_kb) AS gid, " +
      "count(*) AS gs FROM base GROUP BY ROLLUP(c_mktsegment, c_nationkey, bal_kb)), " +
      "lv AS (SELECT CAST(CASE gid WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 3 THEN 2 " +
      "ELSE 3 END AS BIGINT) AS level, count(*) AS n_groups, " +
      "CAST(min(gs) AS BIGINT) AS min_group, " +
      "CAST(sum(CASE WHEN gs < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_at_risk " +
      "FROM g GROUP BY 1) " +
      "SELECT level, n_groups, min_group, n_at_risk, " +
      "level = min(CASE WHEN min_group >= 3 THEN level END) OVER () AS chosen " +
      "FROM lv ORDER BY level"),
    // dense (group × bucket) grid via cross join, prefix sums per side,
    // cross-multiplied integer EMD numerator — identical arithmetic
    "q_t_closeness" -> ("WITH base AS (SELECT c_nationkey, c_mktsegment, " +
      "CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb FROM customer), " +
      "cnt AS (SELECT c_nationkey, c_mktsegment, bal_kb, count(*) AS c " +
      "FROM base GROUP BY 1, 2, 3), " +
      "gdist AS (SELECT bal_kb, CAST(sum(c) AS BIGINT) AS nb, " +
      "CAST(sum(sum(c)) OVER (ORDER BY bal_kb ROWS UNBOUNDED PRECEDING) AS BIGINT) " +
      "AS cum_all FROM cnt GROUP BY 1), " +
      "tot AS (SELECT CAST(sum(nb) AS BIGINT) AS nn, count(*) AS m FROM gdist), " +
      "ng AS (SELECT c_nationkey, c_mktsegment, CAST(sum(c) AS BIGINT) AS group_size " +
      "FROM cnt GROUP BY 1, 2), " +
      "grid AS (SELECT ng.c_nationkey, ng.c_mktsegment, ng.group_size, " +
      "gdist.bal_kb, gdist.cum_all, coalesce(cnt.c, 0) AS c " +
      "FROM ng CROSS JOIN gdist LEFT JOIN cnt ON cnt.c_nationkey = ng.c_nationkey " +
      "AND cnt.c_mktsegment = ng.c_mktsegment AND cnt.bal_kb = gdist.bal_kb), " +
      "pre AS (SELECT c_nationkey, c_mktsegment, group_size, cum_all, " +
      "CAST(sum(c) OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY bal_kb " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_g FROM grid) " +
      "SELECT c_nationkey, c_mktsegment, group_size, " +
      "CAST(sum(abs(cum_g * nn - cum_all * group_size)) AS BIGINT) * 1000000 " +
      "// (group_size * nn * greatest(m - 1, 1)) AS emd_q6, " +
      "CAST(sum(abs(cum_g * nn - cum_all * group_size)) AS BIGINT) * 1000000 " +
      "// (group_size * nn * greatest(m - 1, 1)) > 200000 AS exceeds " +
      "FROM pre, tot GROUP BY c_nationkey, c_mktsegment, group_size, nn, m " +
      "ORDER BY c_nationkey, c_mktsegment"),
    "q_l_diversity" -> ("SELECT c_nationkey, c_mktsegment, count(*) AS n_rows, " +
      "count(DISTINCT e.user_id) AS n_users, count(DISTINCT event_type) AS l, " +
      "count(DISTINCT event_type) >= 3 AS diverse " +
      "FROM events e JOIN customer ON c_custkey = e.user_id " +
      "GROUP BY 1, 2 ORDER BY c_nationkey, c_mktsegment"),
    // same synthesized page, same block-strip order, same RE2-portable
    // patterns with explicit 'g' (Spark's regexp_replace is global)
    "q_html_extract" -> ("WITH h AS (SELECT doc_id, '<html><head><title>Doc ' || doc_id || " +
      "'</title><style>.x{color:red}</style><script>var a=1;</script></head><body><header>Site ' " +
      "|| source || '</header><nav>home | about</nav><p>' || text || " +
      "'</p><footer>(c) 2026 example.org</footer></body></html>' AS html FROM documents), " +
      "x AS (SELECT doc_id, length(html)::BIGINT AS html_chars, " +
      "trim(regexp_replace(regexp_replace(" +
      "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html, " +
      "'(?s)<script[^>]*>.*?</script>', '', 'g'), '(?s)<style[^>]*>.*?</style>', '', 'g'), " +
      "'(?s)<nav[^>]*>.*?</nav>', '', 'g'), '(?s)<header[^>]*>.*?</header>', '', 'g'), " +
      "'(?s)<footer[^>]*>.*?</footer>', '', 'g'), " +
      "'<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) AS t FROM h) " +
      "SELECT doc_id, html_chars, md5(t) AS text_md5, length(t)::BIGINT AS text_chars, " +
      "length(t)::DOUBLE / html_chars AS content_ratio FROM x ORDER BY doc_id"),
    "q_dup_pagerank" -> (s"WITH ${DedupQueries.WithShingles}, ${DedupQueries.Postings}, " +
      "inter AS (SELECT x.doc AS a, y.doc AS b, count(*) AS i FROM post x " +
      "JOIN post y ON x.h = y.h AND x.doc < y.doc GROUP BY 1, 2), " +
      "pairs AS (SELECT a, b FROM inter " +
      "JOIN sz sa ON a = sa.doc JOIN sz sb ON b = sb.doc " +
      "WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= 0.8), " +
      "edges AS (SELECT a AS src, b AS dst FROM pairs " +
      "UNION ALL SELECT b AS src, a AS dst FROM pairs), " +
      "deg AS (SELECT src AS doc, count(*) AS deg FROM edges GROUP BY 1), " +
      "nn AS (SELECT count(*) AS n FROM deg), " +
      "r0 AS (SELECT doc, deg, n, 1000000000 // n AS r FROM deg CROSS JOIN nn), " +
      s"${prRound("r0", "r1")}, ${prRound("r1", "r2")}, ${prRound("r2", "r3")} " +
      "SELECT doc AS doc_id, r AS rank_q9 FROM r3 ORDER BY doc_id"),
    "q_split_assign" -> (s"WITH b AS (SELECT ${bucketSql(SplitSalt)} AS bkt, n_chars " +
      "FROM documents) " +
      "SELECT CASE WHEN bkt < 9000 THEN 'train' WHEN bkt < 9500 THEN 'val' " +
      "ELSE 'test' END AS split, count(*) AS n_docs, " +
      "CAST(sum(n_chars) AS BIGINT) AS chars FROM b GROUP BY 1 ORDER BY 1"),
    "q_dup_rate_by_length" -> ("WITH f AS (SELECT n_chars, " +
      "count(*) OVER (PARTITION BY md5(text)) AS grp FROM documents) " +
      "SELECT n_chars // 256 AS bucket, count(*) AS n_docs, " +
      "CAST(sum(CASE WHEN grp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, " +
      "CAST(sum(CASE WHEN grp > 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 " +
      "// count(*) AS dup_q6 FROM f GROUP BY 1 ORDER BY 1"),
    "q_sample_systematic" -> ("SELECT doc_id, source, n_chars FROM " +
      "(SELECT doc_id, source, n_chars, " +
      "row_number() OVER (ORDER BY doc_id) - 1 AS rn FROM documents) " +
      "WHERE rn % 50 = 0 ORDER BY doc_id"),
    "q_length_buckets" -> ("SELECT n_chars // 256 AS bucket, count(*) AS n_docs, " +
      "max(n_chars) AS max_len, CAST(sum(n_chars) AS BIGINT) AS sum_len, " +
      "count(*) * max(n_chars) - CAST(sum(n_chars) AS BIGINT) AS pad_waste, " +
      "(count(*) * max(n_chars) - CAST(sum(n_chars) AS BIGINT)) * 1000000 " +
      "// (count(*) * max(n_chars)) AS waste_q6 " +
      "FROM documents GROUP BY 1 ORDER BY 1"),
    // same tokenization + salted (doc, position) bucket; DuckDB lambda
    // indices are 1-based where Spark's are 0-based, hence (i - 1)
    "q_augment_dropout" -> ("SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
      "CAST(len(toks) - len(kept) AS BIGINT) AS n_dropped, " +
      "array_to_string(kept, ' ') AS augmented FROM (" +
      "SELECT doc_id, toks, list_filter(toks, (t, i) -> " +
      s"${bucketSqlOn(AugmentSalt, "doc_id || ':' || (i - 1)")} >= 1000) AS kept " +
      s"FROM (SELECT doc_id, ${TextQueries.Toks} AS toks FROM documents)) " +
      "ORDER BY doc_id"),
    // the oracle IS the single-window spelling the engine's range-
    // partitioned numbering must reproduce bit-for-bit (rank ties are
    // impossible: the packed key is unique)
    "q_curriculum_shards" -> ("WITH rk AS (SELECT doc_id, n_chars, " +
      "row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rn FROM documents) " +
      "SELECT rn % 8 AS shard, count(*) AS n_docs, " +
      "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
      "min(rn) AS first_rank, max(rn) AS last_rank FROM rk GROUP BY 1 ORDER BY 1"),
    // same Hamilton arithmetic: floor quotas + remainder-ranked top-up;
    // // is DuckDB floor division ≡ Spark DIV on the non-negative counts
    "q_quota_allocate" -> ("WITH c AS (SELECT source, count(*) AS n_docs " +
      "FROM documents GROUP BY 1), " +
      "t AS (SELECT source, n_docs, sum(n_docs) OVER () AS total FROM c), " +
      "q AS (SELECT source, n_docs, 1000 * n_docs // total AS base, " +
      "1000 * n_docs % total AS rem FROM t), " +
      "r AS (SELECT source, n_docs, base, " +
      "row_number() OVER (ORDER BY rem DESC, source ASC) AS rk, " +
      "sum(base) OVER () AS basesum FROM q) " +
      "SELECT source, n_docs, CAST(base + CASE WHEN rk <= 1000 - basesum " +
      "THEN 1 ELSE 0 END AS BIGINT) AS alloc FROM r ORDER BY source"),
    "q_sample_stratified" -> ("SELECT doc_id, source FROM documents " +
      s"WHERE ${bucketSql(SampleSalt)} < " +
      "CASE source WHEN 'src0' THEN 3000 WHEN 'src1' THEN 2000 ELSE 500 END " +
      "ORDER BY doc_id"),
    // same salted-bucket hash order inside row_number; conditional sums
    // mirror the engine's keep rollup (CASTs: HUGEINT→pandas artifact)
    "q_domain_caps" -> (s"WITH r AS (SELECT doc_id, source, row_number() OVER " +
      s"(PARTITION BY source ORDER BY ${bucketSql(CapSalt)}, doc_id) AS rn FROM documents) " +
      "SELECT source, count(*) AS n_docs, " +
      s"CAST(sum(CASE WHEN rn <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
      s"CAST(sum(CASE WHEN rn <= $DomainCap THEN doc_id END) AS BIGINT) AS kept_id_sum " +
      "FROM r GROUP BY 1 ORDER BY 1"),
    // per-user conditional counts then the 3-row train/test/leak summary
    "q_split_temporal" -> (s"WITH per AS (SELECT user_id, " +
      s"CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '$TemporalBoundary' " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS n_tr, " +
      s"CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '$TemporalBoundary' " +
      "THEN 0 ELSE 1 END) AS BIGINT) AS n_te FROM events GROUP BY 1) " +
      "SELECT 'train' AS split, CAST(sum(n_tr) AS BIGINT) AS n_events, " +
      "CAST(sum(CASE WHEN n_tr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_entities FROM per " +
      "UNION ALL SELECT 'test', CAST(sum(n_te) AS BIGINT), " +
      "CAST(sum(CASE WHEN n_te > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM per " +
      "UNION ALL SELECT 'leak', " +
      "CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN n_tr + n_te ELSE 0 END) AS BIGINT), " +
      "CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM per " +
      "ORDER BY split"),
    "q_sample_weighted" -> ("SELECT doc_id, n_chars FROM documents " +
      s"WHERE ${bucketSql(WeightSalt)} < " +
      "CAST(floor(least(n_chars / 400.0, 1.0) * 10000) AS BIGINT) ORDER BY doc_id"),
    "q_pack_bins" -> ("WITH c AS (SELECT source, n_chars, " +
      "coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior " +
      "FROM documents) " +
      s"SELECT source, CAST(prior // $PackBudget AS BIGINT) AS bin, " +
      "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars " +
      "FROM c GROUP BY 1, 2 ORDER BY 1, 2"),
    // transitive closure over the SAME jaccard pair set q_dedup_ngram_jaccard
    // declares: reach(v, r) = "r reachable from v"; cluster = min reach.
    "q_dup_clusters" -> (s"WITH RECURSIVE $ClusterCtes " +
      "SELECT cluster AS cluster_id, count(*) AS n_docs, " +
      "string_agg(doc::VARCHAR, '-' ORDER BY doc) AS members " +
      "FROM labels GROUP BY 1 ORDER BY 1"),
    // one truth, two engine algorithms: the star variant must reproduce
    // the identical closure
    "q_dup_clusters_star" -> (s"WITH RECURSIVE $ClusterCtes " +
      "SELECT cluster AS cluster_id, count(*) AS n_docs, " +
      "string_agg(doc::VARCHAR, '-' ORDER BY doc) AS members " +
      "FROM labels GROUP BY 1 ORDER BY 1"),
    // the two-pass engine path must land in the single-window SQL's bins
    "q_pack_bins_two_pass" -> ("WITH c AS (SELECT source, n_chars, " +
      "coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior " +
      "FROM documents) " +
      s"SELECT source, CAST(prior // $PackBudget AS BIGINT) AS bin, " +
      "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars " +
      "FROM c GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_sample_fixed_k" -> ("SELECT doc_id, source FROM documents " +
      s"QUALIFY row_number() OVER (PARTITION BY source " +
      s"ORDER BY ${bucketSql(FixedKSalt)}, doc_id) <= 5 ORDER BY doc_id"),
    // three 1-row summaries composed: base profile, the q_dedup_exact
    // fingerprint groups, and the factored Gopher gate keep fragment
    "q_dataset_card" -> ("WITH base AS (SELECT count(*) AS n_docs, " +
      "CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
      "count(DISTINCT source) AS n_sources, count(DISTINCT lang) AS n_langs " +
      "FROM documents), " +
      "g AS (SELECT md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp, " +
      "count(*) AS c FROM documents GROUP BY 1), " +
      "dup AS (SELECT count(*) AS n_contents, " +
      "CAST(coalesce(sum(CASE WHEN c >= 2 THEN c ELSE 0 END), 0) AS BIGINT) AS dup_docs FROM g), " +
      s"gk AS (SELECT CAST(sum(keep) AS BIGINT) AS kept FROM (${TextQueries.GateKeepSql})) " +
      "SELECT n_docs, total_chars, n_sources, n_langs, n_contents, dup_docs, " +
      "dup_docs * 1000000 // n_docs AS dup_rate_q6, " +
      "kept * 1000000 // n_docs AS gate_keep_q6, " +
      "total_chars * 100 // n_docs AS mean_chars_q2 " +
      "FROM base, dup, gk"),
    // classifier-score CTE (the q_quality_classifier arithmetic), exact
    // decile thresholds via quantile_cont list (the interpolating twin of
    // Spark's percentile(array(...))), salted-rank sample per decile
    "q_sample_by_decile" -> ("WITH tok AS (SELECT doc_id, " +
      s"unnest(${TextQueries.Toks}) AS w FROM documents), " +
      "agg AS (SELECT doc_id, count(*) AS n, " +
      "CAST(sum(('0x' || substr(md5(w), 1, 15))::BIGINT % 1001 - 500) AS BIGINT) AS ws " +
      "FROM tok GROUP BY 1), " +
      "sc AS (SELECT d.doc_id, coalesce(ws::DOUBLE / (n * 500), 0.0) AS score " +
      "FROM documents d LEFT JOIN agg USING (doc_id)), " +
      "th AS (SELECT quantile_cont(score, " +
      "[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs FROM sc), " +
      "dec AS (SELECT doc_id, score, " +
      "CAST(len(list_filter(qs, t -> score > t)) AS BIGINT) AS decile FROM sc, th) " +
      "SELECT doc_id, decile, CAST(floor(score * 1000000) AS BIGINT) AS score_q6 " +
      "FROM dec QUALIFY row_number() OVER (PARTITION BY decile " +
      s"ORDER BY ${bucketSql("decile-v1")}, doc_id) <= 5 " +
      "ORDER BY decile, doc_id"),
    // the salted-md5 token replayed on both keys; equality of both join
    // aggregates IS the pseudonymization consistency proof
    "q_pseudonymize" -> ("WITH ev AS (SELECT user_id, value, " +
      "('0x' || substr(md5('pseudo-v1:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS u_tok " +
      "FROM events), " +
      "cust AS (SELECT c_custkey, c_mktsegment, " +
      "('0x' || substr(md5('pseudo-v1:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS c_tok " +
      "FROM customer), " +
      "raw AS (SELECT c_mktsegment AS segment, count(*) AS raw_cnt, " +
      "round(sum(value), 2) AS raw_sum FROM ev JOIN cust ON user_id = c_custkey GROUP BY 1), " +
      "tokj AS (SELECT c_mktsegment AS segment, count(*) AS tok_cnt, " +
      "round(sum(value), 2) AS tok_sum FROM ev JOIN cust ON u_tok = c_tok GROUP BY 1) " +
      "SELECT raw.segment, raw_cnt, tok_cnt, " +
      "raw_cnt = tok_cnt AND raw_sum = tok_sum AS consistent " +
      "FROM raw JOIN tokj ON raw.segment = tokj.segment ORDER BY 1"),
    "q_erasure_cascade" -> ("WITH del AS (SELECT c_custkey AS k FROM customer " +
      "WHERE c_custkey % 10 = 7) " +
      "SELECT * FROM (" +
      "SELECT 'customer' AS table_name, count(*) AS rows_before, " +
      "CAST(sum(CASE WHEN c_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT) AS rows_removed, " +
      "count(*) - CAST(sum(CASE WHEN c_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT) AS rows_after FROM customer " +
      "UNION ALL SELECT 'events', count(*), " +
      "CAST(sum(CASE WHEN user_id IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT), " +
      "count(*) - CAST(sum(CASE WHEN user_id IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT) FROM events " +
      "UNION ALL SELECT 'orders', count(*), " +
      "CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT), " +
      "count(*) - CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM del) THEN 1 ELSE 0 END) AS BIGINT) FROM orders" +
      ") ORDER BY table_name"),
    // BIGINT casts dodge the HUGEINT→float64 hash artifact; // is exact
    // integer floor division on non-negatives like Spark's div
    "q_mix_temperature" -> ("WITH per AS (SELECT source, " +
      "CAST(sum(n_chars) AS BIGINT) AS size FROM documents GROUP BY 1), " +
      "w AS (SELECT source, size, " +
      "CAST(floor(sqrt(size::DOUBLE * 1000000000000)) AS BIGINT) AS w FROM per), " +
      "t AS (SELECT CAST(sum(size) AS BIGINT) AS tot_size, " +
      "CAST(sum(w) AS BIGINT) AS tot_w FROM w) " +
      "SELECT source, size, size * 1000000 // tot_size AS share_q6, " +
      "w * 1000000 // tot_w AS share_half_q6 FROM w, t ORDER BY source"),
    "q_mix_weights" -> ("WITH d AS (SELECT doc_id, source, " +
      "(CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1 ELSE 0 END) + " +
      s"(CASE WHEN ${bucketSql(MixSalt)} < " +
      "(CASE source WHEN 'src0' THEN 5000 WHEN 'src1' THEN 0 ELSE 5000 END) " +
      "THEN 1 ELSE 0 END) AS reps FROM documents) " +
      "SELECT doc_id, source, unnest(generate_series(0, reps - 1)) AS copy " +
      "FROM d ORDER BY doc_id, copy"),
    // same tokenizer mirror as DedupQueries/TextQueries; chunk index =
    // boundary count over strictly-preceding tokens, chunk hash = md5 of
    // the space-joined tokens in position order
    "q_chunk_cdc" -> ("WITH d AS (SELECT doc_id, " +
      "list_filter(string_split_regex(text, '\\s+'), t -> t != '') AS toks " +
      "FROM documents), " +
      "t AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, " +
      "unnest(toks) AS tok FROM d WHERE len(toks) > 0), " +
      "c AS (SELECT doc_id, i, tok, coalesce(sum(CASE WHEN " +
      "(('0x' || substr(md5(tok), 1, 15))::BIGINT % 32) = 0 THEN 1 ELSE 0 END) " +
      "OVER (PARTITION BY doc_id ORDER BY i " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx FROM t) " +
      "SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, " +
      "count(*) AS n_toks, md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5 " +
      "FROM c GROUP BY 1, 2 ORDER BY doc_id, chunk_idx"),
    // the closure's min-label (singletons fall back to doc_id via the
    // LEFT JOIN coalesce) drives the SAME md5 bucket as q_split_assign
    "q_split_leakage_safe" -> (s"WITH RECURSIVE $ClusterCtes " +
      "SELECT doc_id, CASE WHEN bkt < 9000 THEN 'train' " +
      "WHEN bkt < 9500 THEN 'val' ELSE 'test' END AS split FROM " +
      s"(SELECT doc_id, ${bucketSqlOn(SplitSalt, "coalesce(l.cluster, d.doc_id)")} " +
      "AS bkt FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc) " +
      "ORDER BY doc_id"),
    "q_dedup_keep" -> (s"WITH RECURSIVE $ClusterCtes " +
      "SELECT doc_id FROM documents WHERE doc_id NOT IN " +
      "(SELECT doc FROM labels WHERE doc != cluster) ORDER BY doc_id"),
    // identical md5 seed, CDF thresholds, and non-negativity clamp
    "q_dp_counts" -> ("WITH t AS (SELECT event_type, count(*) AS true_n, " +
      "('0x' || substr(md5(event_type || '|dp1'), 1, 15))::BIGINT % 1024 AS u " +
      "FROM events GROUP BY 1), " +
      "n AS (SELECT event_type, true_n, CASE " +
      "WHEN u < 341 THEN 0 WHEN u < 512 THEN 1 WHEN u < 683 THEN -1 " +
      "WHEN u < 768 THEN 2 WHEN u < 853 THEN -2 WHEN u < 896 THEN 3 " +
      "WHEN u < 939 THEN -3 WHEN u < 960 THEN 4 WHEN u < 981 THEN -4 " +
      "WHEN u < 992 THEN 5 WHEN u < 1003 THEN -5 WHEN u < 1008 THEN 6 " +
      "WHEN u < 1013 THEN -6 ELSE 0 END AS noise FROM t) " +
      "SELECT event_type, true_n, CAST(noise AS BIGINT) AS noise, " +
      "greatest(true_n + noise, 0) AS noisy_n FROM n ORDER BY event_type"),

    // same clusters, same quantized classifier score, same
    // (score desc, doc) argmax; singletons via NOT IN
    "q_dedup_keep_best" -> (s"WITH RECURSIVE $ClusterCtes, " +
      s"ktok AS (SELECT doc_id, unnest(${TextQueries.Toks}) AS kw FROM documents), " +
      "ksc0 AS (SELECT doc_id, count(*) AS n, " +
      "CAST(sum(('0x' || substr(md5(kw), 1, 15))::BIGINT % 1001 - 500) AS BIGINT) AS ws " +
      "FROM ktok GROUP BY 1), " +
      "scq AS (SELECT d.doc_id, " +
      "CAST(floor(coalesce(ws::DOUBLE / (n * 500), 0.0) * 1e6) AS BIGINT) AS score_q6 " +
      "FROM documents d LEFT JOIN ksc0 USING (doc_id)), " +
      "best AS (SELECT doc_id, score_q6 FROM (SELECT l.doc AS doc_id, score_q6, " +
      "row_number() OVER (PARTITION BY cluster ORDER BY score_q6 DESC, l.doc) AS rn " +
      "FROM labels l JOIN scq ON l.doc = scq.doc_id) WHERE rn = 1) " +
      "SELECT doc_id, score_q6 FROM best " +
      "UNION ALL SELECT doc_id, score_q6 FROM scq " +
      "WHERE doc_id NOT IN (SELECT doc FROM labels) ORDER BY doc_id"),
    // same hash-rank sides, same bounded cross, same near-dup exclusion
    "q_negative_pairs" -> (s"WITH ${DedupQueries.WithShingles}, ${DedupQueries.Postings}, " +
      "ninter AS (SELECT x.doc AS a, y.doc AS b, count(*) AS i FROM post x " +
      "JOIN post y ON x.h = y.h AND x.doc < y.doc GROUP BY 1, 2), " +
      "dup AS (SELECT a, b FROM ninter " +
      "JOIN sz sa ON a = sa.doc JOIN sz sb ON b = sb.doc " +
      "WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= 0.8), " +
      "ls AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER (ORDER BY " +
      "('0x' || substr(md5(doc_id::VARCHAR || 'L'), 1, 15))::BIGINT, doc_id) AS rn " +
      "FROM documents) WHERE rn <= 50), " +
      "rs AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER (ORDER BY " +
      "('0x' || substr(md5(doc_id::VARCHAR || 'R'), 1, 15))::BIGINT, doc_id) AS rn " +
      "FROM documents) WHERE rn <= 50) " +
      "SELECT ls.doc_id AS a, rs.doc_id AS b FROM ls CROSS JOIN rs " +
      "WHERE ls.doc_id < rs.doc_id AND NOT EXISTS " +
      "(SELECT 1 FROM dup WHERE dup.a = ls.doc_id AND dup.b = rs.doc_id) " +
      "ORDER BY a, b"),
    // same last-start arithmetic as the engine: greatest(ceil((n-len)/stride), 0)
    "q_chunk_text" -> ("WITH c AS (SELECT doc_id, text, length(text) AS n FROM documents), " +
      "idx AS (SELECT doc_id, text, unnest(generate_series(0, " +
      s"greatest(CAST(ceil((n - $ChunkLen)::DOUBLE / $ChunkStride) AS BIGINT), 0))) " +
      "AS chunk_idx FROM c) " +
      s"SELECT doc_id, chunk_idx, md5(substr(text, CAST(chunk_idx * $ChunkStride + 1 AS INT), " +
      s"$ChunkLen)) AS chunk_md5 FROM idx ORDER BY doc_id, chunk_idx"),
    "q_text_scrub" -> ("SELECT doc_id, " +
      s"len(regexp_extract_all(text, '$BlockPat')) AS n_hits, " +
      s"md5(regexp_replace(text, '$BlockPat', '<TERM>', 'g')) AS scrub_md5 " +
      "FROM documents ORDER BY doc_id"),
    // gate keep (TextQueries fragment) ⋈ scrub + split, rolled up —
    // mirrors the composed Spark chain stage for stage
    "q_curation_pipeline" -> (s"WITH g AS (${TextQueries.GateKeepSql}), " +
      "d AS (SELECT doc_id, " +
      s"CASE WHEN ${bucketSql(SplitSalt)} < 9000 THEN 'train' " +
      s"WHEN ${bucketSql(SplitSalt)} < 9500 THEN 'val' ELSE 'test' END AS split, " +
      s"len(regexp_extract_all(text, '$BlockPat')) AS n_hits, " +
      s"length(regexp_replace(text, '$BlockPat', '<TERM>', 'g')) AS scrub_len " +
      "FROM documents) " +
      "SELECT split, keep, count(*) AS n_docs, CAST(sum(n_hits) AS BIGINT) AS hits, " +
      "CAST(sum(scrub_len) AS BIGINT) AS scrub_chars " +
      "FROM d JOIN g USING (doc_id) GROUP BY 1, 2 ORDER BY 1, 2"),
    // same integer greedy order (q4 DESC, doc_id), same prefix-sum window,
    // same half-the-corpus budget from one aggregate
    "q_token_budget" -> (s"WITH s AS (SELECT doc_id, ${TextQueries.TokCnt} AS tok_cnt, " +
      s"CAST(floor((${TextQueries.Quality}) * 10000) AS BIGINT) AS q4 FROM documents), " +
      "b AS (SELECT CAST(floor(CAST(sum(tok_cnt) AS BIGINT) / 2.0) AS BIGINT) AS budget FROM s), " +
      "c AS (SELECT doc_id, q4, tok_cnt, CAST(sum(tok_cnt) OVER (" +
      "ORDER BY q4 DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM s) " +
      "SELECT doc_id, q4, tok_cnt, cum_tokens, cum_tokens <= budget AS kept " +
      "FROM c CROSS JOIN b ORDER BY doc_id"),
    // v2 rebuilt from the same derivation; classes by DIRECT text compare
    // — the engine's md5-fingerprint classification must agree
    "q_corpus_diff" -> ("WITH v2 AS (" +
      "SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text " +
      "FROM documents WHERE doc_id % 7 <> 0 " +
      "UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0), " +
      "j AS (SELECT coalesce(a.doc_id, b.doc_id) AS id, " +
      "CASE WHEN a.doc_id IS NULL THEN 'added' WHEN b.doc_id IS NULL THEN 'removed' " +
      "WHEN a.text <> b.text THEN 'changed' ELSE 'unchanged' END AS change " +
      "FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id) " +
      "SELECT change, count(*) AS n_docs, CAST(sum(id) AS BIGINT) AS id_sum " +
      "FROM j GROUP BY 1 ORDER BY 1"),
    // chunk count closed-form from the engine's lastStart formula
    // (stride = len = 100); intact must be TRUE for every document
    "q_chunk_roundtrip" -> ("SELECT doc_id, " +
      "greatest(CAST(ceil((length(text) - 100) / 100.0) AS BIGINT), 0) + 1 AS n_chunks, " +
      "TRUE AS intact FROM documents ORDER BY doc_id")
  )
}
