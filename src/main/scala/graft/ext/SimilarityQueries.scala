package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared similarity-search queries + DuckDB oracles over `embeddings`.
  * Scores are emitted raw: arithmetic is widened to double and folded in an
  * identical order in both engines, so doubles are bit-identical and no
  * rounding is needed (or safe — see TextQueries).
  */
object SimilarityQueries {

  private[ext] val Planes = 4 // 16 buckets; Hamming-1 multi-probe visits 5 of them
  private val Dim = 64
  private val NCells = 16 // IVF coarse cells (sampled quantizer)
  private val W = Similarity.hyperplanes(Planes, Dim)
  // 3 independent tables for the ANN path: single-table Hamming-1 recall@5
  // was 0.52; unioned candidates compound to ≥0.8 (measured in
  // SimilaritySpec) while the corpus scan count stays 1.
  val Tables3: Seq[Array[Array[Long]]] =
    W +: Seq("t1-plane", "t2-plane").map(Similarity.hyperplanes(Planes, Dim, _))

  /** Self-sizing near-dup oracle table: [[AutoMaxPlanes]] plane constants
    * for the q_embed_neardup_auto seed; the oracle gates each on p < np
    * (np re-derived from count(*) with the planesForExact integer rule),
    * valid because hyperplanes(np) is a PREFIX of this table (Round12Spec).
    * Cap 16 ⇒ oracle-checkable to 64·2^16 ≈ 4.2M vectors; past that np is
    * NULL and the check fails LOUDLY (the engine itself sizes on to 62).
    */
  private val AutoSeed = "auto-neardup"
  private val AutoMaxPlanes = 16
  private lazy val AutoW = Similarity.hyperplanes(AutoMaxPlanes, Dim, AutoSeed)

  /** Bucket SQL whose plane p contributes only when p < np — the sized
    * mirror of [[bucketSql]] (same shape as GraphQueries' gated builder).
    */
  private def gatedBucketSql(v: String, planes: Array[Array[Long]]): String =
    planes.zipWithIndex
      .map { case (w, p) =>
        val d = w.zipWithIndex.map { case (wi, i) => s"$v[${i + 1}] * ($wi)" }.mkString(" + ")
        s"(CASE WHEN $p < np AND $d > 0 THEN ${1L << p} ELSE 0 END)"
      }
      .mkString(" + ")

  private def vecs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // graft_dot (idempotent)
    Tables
      .embeddings(s, dir)
      .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"))
  }

  /** The round-2 fixed-4-plane near-dup path, DEMOTED out of the declared
    * surface in round 14: the first whole-surface ×100 run measured it at
    * 911.8 s — 16 plan-literal buckets over 200k vectors is the exact
    * within-bucket quadratic the demoted fixed-plane graph builder had,
    * and `q_embed_neardup_auto` (planesForExact-sized, hash-checked since
    * r12) is the production path. The bucket/probe/re-check machinery
    * stays pinned by a SimilaritySpec sf0.001 digest via this hook.
    */
  private[graft] def fixedNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(vecs(s, dir), W, threshold = 0.45).orderBy("a", "b")

  /** The FIXED 16-cell SemDeDup form, DEMOTED from the declared surface in
    * round 15 (the last declared query with a fixed-parameter quadratic:
    * within-cell pair work grows as (N/16)² — ~49 s at ×100 per the r10
    * probe, the same cliff class as the fixed-plane `q_embed_neardup`
    * demoted in r14). `q_semantic_dedup_auto` (cells = cellsForExact(N),
    * O(N·√N) total pair work) is the declared production path. The
    * 16-cell machinery — including the kept=0 dominance path only small
    * cells exercise — stays pinned by a Round15Spec sf0.001 digest via
    * this hook.
    */
  private[graft] def fixedSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    Similarity
      .semanticDedup(v, centFrame(v), NCells, threshold = 0.35,
        intermediate =
          Dedup.Intermediate.Bucketed(s.conf.get("spark.sql.shuffle.partitions").toInt))
      .orderBy("id")
  }

  /** The deterministic sampled-centroid stand-in (ids 0..NCells-1) shared
    * by the IVF / IVF-PQ / semantic-dedup declared queries. */
  private def centFrame(v: DataFrame): DataFrame =
    v.filter(col("id") < NCells)
      .select(col("id").cast("int").as("cid"), col("vec").as("cvec"))

  /** The deterministic iters=0 codebooks the PQ-family queries share. */
  private def books8(v: DataFrame): Similarity.PQCodebooks =
    Similarity.pqFit(v, m = 8, k = 16, dim = Dim, iters = 0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact brute-force cosine top-10 for 5 probe vectors (broadcast probes,
    // one corpus scan). The correctness baseline for the ANN path.
    "q_cosine_topk" -> { (s, dir) =>
      val v = vecs(s, dir)
      Similarity
        .bruteForceTopK(v.filter(col("id") < 5), v, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // ANN via 3 independent 4-plane LSH tables, each with Hamming-1
    // multi-probe, unioned candidates + exact re-rank, top-5 for 10 probe
    // vectors — the corpus-linear scale path.
    "q_ann_lsh" -> { (s, dir) =>
      val v = vecs(s, dir)
      Similarity
        .annTopKMulti(v.filter(col("id") < 10), v, Tables3, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // INDEX-ONCE / PROBE-MANY: the q_ann_lsh result with the corpus index
    // frame PERSISTED as a bucketed managed table first — the production
    // vector-search lifecycle (build tax visible at fixture scale,
    // amortized over every later probe batch — the q_big_orders_bucketed
    // precedent; probe-only cost measured separately in BASELINE). Same
    // oracle as q_ann_lsh: identical results, different physical plan.
    "q_ann_lsh_indexed" -> { (s, dir) =>
      val v = vecs(s, dir)
      val idx = Dedup.Intermediate
        .Bucketed(s.conf.get("spark.sql.shuffle.partitions").toInt)
        .keyed(Similarity.lshIndexFrame(v, Tables3), "ann_lsh_index", "t,bucket")
      Similarity
        .annTopKFromIndex(v.filter(col("id") < 10), idx, Tables3, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Semantic decontamination ([[Similarity.contaminationByEmbedding]]):
    // corpus vectors (id ≥ 10) within cosine 0.32 of any benchmark probe
    // (id < 10) — the paraphrase-robust complement of the n-gram
    // q_contamination. Probes collect to a plan literal (driver-sized by
    // contract), so the flag pass is MAP-ONLY: one corpus scan, greatest()
    // argmax in codegen, no join, no shuffle. Threshold 0.32 ≈ the
    // corpus's p95 max-probe cosine — hits at every driver SF (measured
    // max 0.392/0.493/0.452 at sf0.001/0.01/0.1).
    "q_semantic_contamination" -> { (s, dir) =>
      val v = vecs(s, dir)
      val probes = v
        .filter(col("id") < 10)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        .toSeq
      Similarity
        .contaminationByEmbedding(v.filter(col("id") >= 10), probes, threshold = 0.32)
        .orderBy("id")
    },

    // ANN QUALITY EVALUATION — recall@5 of the production LSH path
    // against the exact brute-force baseline, per query: the monitoring
    // query an ANN deployment runs continuously (index drift, plane
    // re-fits, corpus growth all move recall; an eval harness that is
    // itself a declared, oracle-checked query keeps the metric honest).
    // Both arms already exist as operators; the eval is one broadcast
    // join of two ≤50-row shortlists + rational recall arithmetic
    // (n_hits·10⁶/5 — integer-exact, hash-checkable).
    "q_ann_recall" -> { (s, dir) =>
      val v = vecs(s, dir)
      val probes = v.filter(col("id") < 10)
      val ann = Similarity
        .annTopKMulti(probes, v, Tables3, k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      val exact = Similarity
        .bruteForceTopK(probes, v, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      exact
        .join(ann, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
        .select(col("query_id"), col("n_hits"),
          floor(col("n_hits").cast("double") * 1e6 / 5).cast("long").as("recall_q6"))
        .orderBy("query_id")
    },

    // RANKING-QUALITY eval — nDCG@10 of the exact cosine retrieval against
    // label relevance (neighbor relevant iff it shares the query's label):
    // the graded complement of q_ann_recall's set-overlap metric. The
    // discount weights are PRE-QUANTIZED integers w_r = ⌊10⁶/log₂(r+1)⌋
    // hardcoded identically in engine and oracle — DCG_q6 = Σ rel_r·w_r is
    // an exact BIGINT whatever the sum order (cross-engine log₂/float-sum
    // drift can't exist), IDCG_q6 is a prefix-sum LOOKUP on n_rel, and
    // nDCG is ONE double division. Probes broadcast; one corpus scan.
    "q_ndcg_eval" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val all = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"),
          col("label"))
      val lab = all.select(col("id"), col("label"))
      val topk = Similarity
        .bruteForceTopK(all.filter(col("id") < 10).select("id", "vec"),
          all.select("id", "vec"), k = 10)
      val wCol = element_at(array(NdcgW.map(lit): _*), col("rank").cast("int"))
      topk
        .join(broadcast(lab.select(col("id").as("query_id"), col("label").as("ql"))),
          Seq("query_id"))
        .join(lab.select(col("id").as("neighbor_id"), col("label").as("nl")),
          Seq("neighbor_id"))
        .select(col("query_id"), col("rank"),
          (col("ql") === col("nl")).cast("long").as("rel"))
        .groupBy("query_id")
        .agg(sum(col("rel")).as("n_rel"), sum(col("rel") * wCol).as("dcg_q6"))
        .withColumn("idcg_q6",
          element_at(array(NdcgIdcg.map(lit): _*), col("n_rel").cast("int") + 1))
        .withColumn("ndcg",
          when(col("idcg_q6") > 0,
            col("dcg_q6").cast("double") / col("idcg_q6").cast("double"))
            .otherwise(lit(0.0)))
        .orderBy("query_id")
    },

    // FILTERED vector search — ANN under a metadata predicate (tenant /
    // partition / language scoping, the standard production requirement):
    // the label filter applies to the CORPUS side BEFORE bucketing, so
    // the predicate pushes to the parquet scan and the bucket join only
    // ever sees qualifying vectors (pre-filter strategy — no recall loss
    // to post-filtering a shortlist that was ranked over excluded rows).
    // Same 3-table Hamming-1 LSH + exact re-rank as q_ann_lsh.
    "q_ann_filtered" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val all = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"),
          col("label"))
      val corpus = all.filter(col("label") < 5).select("id", "vec")
      val probes = all.filter(col("id") < 10).select("id", "vec")
      Similarity
        .annTopKMulti(probes, corpus, Tables3, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // IVF-style ANN: 16 sampled coarse centroids (corpus ids 0-15 — the
    // deterministic stand-in for an offline-fitted quantizer), corpus
    // assigned to its nearest cell, queries probe their 2 nearest cells,
    // exact re-rank top-5 — the second, cell-partitioned scale path.
    "q_ann_ivf" -> { (s, dir) =>
      val v = vecs(s, dir)
      val cent = v.filter(col("id") < NCells)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      Similarity
        .ivfTopK(v.filter(col("id") < 10), v, cent, NCells, nprobe = 2, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // IVF nprobe TUNING SWEEP — the recall-vs-probe-budget table an
    // operator reads before fixing nprobe for a 100 TB corpus: recall@5
    // against brute force at nprobe ∈ {1..4}, aggregated over the 10
    // probe queries. Runs on a SAMPLE by construction (tuning queries
    // always do); each run is the q_ann_ivf plan, the exact baseline is
    // computed once, and recall is an integer quotient of hit counts.
    "q_ivf_nprobe_sweep" -> { (s, dir) =>
      val v = vecs(s, dir)
      val cent = v.filter(col("id") < NCells)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val probes = v.filter(col("id") < 10)
      val exact = Similarity.bruteForceTopK(probes, v, k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint()
      // the corpus×centroid cell assignment is identical for every nprobe
      // — materialize it ONCE (the dominant stage; four ivfTopK calls
      // would rescan and rescore the corpus four times); only the
      // 10-row query probe set re-ranks per budget
      val cb = Similarity.assignCells(v, cent, NCells, 1)
        .select(col("id").as("neighbor_id"), col("vec").as("cv"), col("cell"))
        .localCheckpoint()
      val runs = (1 to 4).map { np =>
        val qb = broadcast(Similarity.assignCells(probes, cent, NCells, np)
          .select(col("id").as("query_id"), col("vec").as("qv"), col("cell")))
        val scored = qb
          .join(cb, Seq("cell"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            Similarity.cosine(col("qv"), col("cv")).as("cos"))
          .filter(!isnan(col("cos")))
        Relational
          .topKPerGroup(scored, Seq("query_id"),
            Seq(col("cos").desc, col("neighbor_id").asc), 5)
          .select(lit(np.toLong).as("nprobe"), col("query_id"),
            col("neighbor_id"), lit(1L).as("hit"))
      }.reduce(_ unionByName _)
      exact
        .crossJoin(broadcast(s.range(1, 5).select(col("id").as("nprobe"))))
        .join(runs, Seq("nprobe", "query_id", "neighbor_id"), "left")
        .groupBy(col("nprobe"))
        .agg(count(lit(1)).as("n_truth"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("nprobe"), col("n_truth"), col("n_hits"),
          expr("n_hits * 1000000 DIV n_truth").as("recall_q6"))
        .orderBy("nprobe")
    },

    // Product-quantization ADC top-5: codebooks from the first 16 corpus
    // vectors (iters=0 — the deterministic stand-in that keeps encode +
    // LUT scoring bit-reproducible in the oracle, like q_ann_ivf's
    // sampled quantizer; a production run fits Lloyd offline and swaps
    // codebooks in without touching the plan). Every distance is the
    // shared ascending fold, argmin is first-wins, and the ADC sum folds
    // subspaces in order — doubles bit-identical cross-engine.
    "q_pq_adc" -> { (s, dir) =>
      val v = vecs(s, dir)
      val books = Similarity.pqFit(v, m = 8, k = 16, dim = Dim, iters = 0)
      val codes = Similarity.pqEncode(v, books)
      Similarity
        .pqTopKAdc(v.filter(col("id") < 20), codes, books, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("adist"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // The AUTO-SIZED production near-dup path: planes =
    // planesForExact(corpusCount, 64), so the bucket count tracks the
    // corpus and candidate volume stays linear (the round-5 ×10 blow-up
    // was this rule missing). HASH-CHECKED since round 12 via the same
    // self-sizing oracle pattern as q_graph_mutual_lsh_auto: the integer
    // sizing rule lets a static SQL mirror re-derive the plane count from
    // its own count(*) and gate AutoMaxPlanes embedded plane constants on
    // p < np (valid because hyperplanes(p) is a PREFIX of
    // hyperplanes(AutoMaxPlanes) — pinned in Round12Spec). One extra
    // corpus count() action sizes the table — at 100 TB that's a
    // metadata-only parquet row-count read.
    "q_embed_neardup_auto" -> { (s, dir) =>
      val v = vecs(s, dir)
      val planes = Similarity.hyperplanes(
        Similarity.planesForExact(v.count(), targetBucketSize = 64), Dim, AutoSeed)
      Similarity
        .cosineNearDupPairs(v, planes, threshold = 0.45)
        .orderBy("a", "b")
    },

    // Composed IVF-PQ ADC (the production FAISS shape): corpus codes carry
    // their coarse cell, queries probe 2 nearest cells, ADC scores only
    // the codes inside probed cells — cell-pruned AND compressed-domain in
    // one plan. Same deterministic stand-ins as q_ann_ivf (sampled
    // centroids) and q_pq_adc (iters=0 codebooks), so every stage is
    // bit-reproducible in the oracle.
    "q_ivfpq_adc" -> { (s, dir) =>
      val v = vecs(s, dir)
      Similarity
        .ivfPqTopKAdc(v.filter(col("id") < 20), v, centFrame(v), books8(v), NCells,
          nprobe = 2, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("adist"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // The COMPLETE production retrieval stack, end to end: IVF-PQ ADC
    // shortlists 25 candidates in the compressed domain, then raw vectors
    // are read only for the shortlist pairs and re-ranked by exact cosine
    // — approximate scan, exact answer quality, both stages in one plan.
    "q_ivfpq_rerank" -> { (s, dir) =>
      val v = vecs(s, dir)
      val probes = v.filter(col("id") < 20)
      val short = Similarity
        .ivfPqTopKAdc(probes, v, centFrame(v), books8(v), NCells, nprobe = 2, k = 25)
      Similarity
        .rerankExact(short, probes, v, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // The AUTO-SIZED production semantic dedup: cells = cellsForExact(N)
    // (smallest k with k² ≥ N, i.e. ⌈√N⌉ — the SemDeDup operating point),
    // so expected cell size tracks √N and total within-cell pairwise work
    // is O(N·√N) at ANY corpus — the fixed 16-cell pin above reached a
    // ~1.25G-pair quadratic at ×100 (its role is now the oracle-friendly
    // SMALL-cell exercise of the kept=0 path). Same self-sizing oracle
    // pattern as q_embed_neardup_auto: the integer rule lets one static
    // SQL string re-derive k from its own count(*). The extra corpus
    // count() that sizes the quantizer is a metadata-only parquet
    // row-count read at 100 TB.
    "q_semantic_dedup_auto" -> { (s, dir) =>
      val v = vecs(s, dir)
      val k = Similarity.cellsForExact(v.count())
      val cent = v.filter(col("id") < k)
        .select(col("id").cast("int").as("cid"), col("vec").as("cvec"))
      Similarity
        .semanticDedup(v, cent, k, threshold = 0.35,
          intermediate =
            Dedup.Intermediate.Bucketed(s.conf.get("spark.sql.shuffle.partitions").toInt))
        .orderBy("id")
    },

    // Hard-negative mining for contrastive training: per probe (ids 0-4),
    // top-10 by cosine among DIFFERENT-label vectors — the near-miss
    // negatives that dominate the InfoNCE gradient. Broadcast probes, one
    // corpus scan, label mismatch as a join residual.
    "q_hard_negatives" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables
        .embeddings(s, dir)
        .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"),
          col("label"))
      Similarity
        .hardNegatives(v.filter(col("id") < 5), v, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("neg_label"), col("cos"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // RAG retrieval end-to-end: embedding search (exact cosine top-3 for 3
    // probes — swap in the ANN/IVF-PQ stack at corpus scale, the ranking
    // contract is identical) then FETCH — the neighbor ids join back to
    // the documents table for the source attribution and content handle a
    // generator actually consumes. The fetch is an id equi-join against
    // the corpus-sized documents table (planner-chosen; co-partitioned at
    // scale), emitting md5(text) as the stable content handle.
    "q_rag_retrieve" -> { (s, dir) =>
      val v = vecs(s, dir)
      Similarity
        .bruteForceTopK(v.filter(col("id") < 3), v, k = 3)
        .join(Tables.documents(s, dir).select(col("doc_id"), col("source"),
          md5(col("text")).as("text_md5")),
          col("neighbor_id") === col("doc_id"))
        .select(col("query_id"), col("rank"), col("doc_id"), col("source"),
          col("text_md5"), col("cos"))
        .orderBy("query_id", "rank")
    },

    // MMR diversified re-rank after retrieval: top-20 shortlist per probe,
    // greedy λ=0.5 pick of 5 trading relevance vs redundancy (Similarity
    // .mmrRerank — shortlist² pairwise sims, per-query bounded greedy).
    "q_rag_mmr" -> { (s, dir) =>
      val v = vecs(s, dir)
      Similarity
        .mmrRerank(v.filter(col("id") < 3), v, shortlistK = 20, k = 5, lambda = 0.5)
        .orderBy("query_id", "rank")
    },

    // L2 normalization — the preprocessing step every cosine/ANN pipeline
    // runs once at ingest so downstream similarity is a plain dot product.
    // norm = the same sequential fold both engines run (graft_dot ≡
    // list_reduce), so x/norm is one IEEE division on bit-identical
    // doubles; dims emitted floor-quantized at 1e-6. Map-only per row —
    // no shuffle at any scale.
    "q_embed_norm" -> { (s, dir) =>
      val v = vecs(s, dir).filter(col("id") < 100)
      v.withColumn("nrm", Similarity.norm(col("vec")))
        .filter(col("nrm") > 0)
        .select(col("id"), col("nrm"), posexplode(col("vec")).as(Seq("dim0", "x")))
        .select(col("id"), (col("dim0") + 1).as("dim"),
          floor((col("x") / col("nrm")) * 1000000).cast("long").as("nx_q6"))
        .orderBy("id", "dim")
    },

    // Top-1 PCA projections (Similarity.pcaPowerProjections): integer-
    // exact scatter moments in one pass, 20 driver-side power-iteration
    // steps (dim×dim fit state — the k-means precedent), then a map-only
    // centered projection with the component as a plan literal. Output =
    // the 50 most extreme docs along PC1 by |projection| (sign-flip-proof
    // by construction); the oracle replays the identical op sequence via
    // a recursive CTE, so doubles match bit-for-bit.
    "q_embed_pca" -> { (s, dir) =>
      Similarity
        .pcaPowerProjections(Tables.embeddings(s, dir), "vec_id", "embedding",
          dim = Dim, iters = 20)
        .orderBy(col("pa").desc, col("vec_id"))
        .limit(50)
        .select(col("vec_id"), round(col("pa"), 6).as("proj_abs"))
    },

    // Per-dimension distribution profile — the dead/degenerate-dimension
    // QA (a dim whose variance collapses carries no information and
    // poisons cosine geometry): integer q3 moments per dim in ONE
    // explode+agg pass, scaled variance n·S − T² as exact integers
    // (the PCA covariance diagonal), plus exact min/max.
    "q_embed_dim_stats" -> { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(posexplode(transform(col("embedding"),
          x => floor(x.cast("double") * 1000).cast("long"))).as(Seq("dim0", "q")))
        .groupBy((col("dim0") + 1).as("dim"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("t_q3"),
          min(col("q")).as("min_q3"), max(col("q")).as("max_q3"),
          sum(col("q") * col("q")).as("s_q3"))
        .select(col("dim"), col("n"), col("t_q3"), col("min_q3"), col("max_q3"),
          (col("n") * col("s_q3") - col("t_q3") * col("t_q3")).as("nvar_q3"))
        .orderBy("dim")
    },

    // Embedding-space QA (Similarity.centroidOutliers): the 20 vectors
    // farthest from their own label's centroid — mislabel/noise
    // candidates. Integer-exact centroid numerators broadcast into a
    // map-only fixed-order distance pass.
    "q_embed_outliers" -> { (s, dir) =>
      Similarity
        .centroidOutliers(Tables.embeddings(s, dir), "vec_id", "embedding", "label")
        .orderBy(col("dist2").desc, col("vec_id"))
        .limit(20)
        .select(col("vec_id"), col("label"), round(col("dist2"), 6).as("dist2"))
    },

    // CENTROID-FORM SILHOUETTE per vector ([[Similarity.silhouetteCentroid]])
    // — the embedding-quality / label-noise score: s < 0 means the vector
    // sits closer to a foreign centroid. One broadcast of the k×dim
    // exact-integer centroid frame, one corpus scan, k fixed-order
    // distance folds per row — the O(n²) pairwise silhouette's standard
    // large-scale surrogate. The 20 most negative (worst-clustered)
    // vectors are declared; a/b carried so the oracle gates the parts.
    "q_silhouette" -> { (s, dir) =>
      Similarity
        .silhouetteCentroid(Tables.embeddings(s, dir), "vec_id", "embedding", "label")
        .orderBy(col("s").asc, col("vec_id"))
        .limit(20)
        .select(col("vec_id"), col("label"),
          round(col("a"), 6).as("a"), round(col("b"), 6).as("b"), round(col("s"), 6).as("s"))
    },

    // DAVIES–BOULDIN per-cluster terms ([[Similarity.daviesBouldin]]) —
    // the aggregate cluster-validity companion to q_silhouette: per label
    // the worst (σ_i+σ_j)/d_ij partner and ratio. σ as exact q6 integer
    // sums; all k-sized frames after the one distance scan.
    "q_davies_bouldin" -> { (s, dir) =>
      Similarity
        .daviesBouldin(Tables.embeddings(s, dir), "vec_id", "embedding", "label")
        .select(col("label"), col("n"), col("partner"), round(col("r"), 6).as("r"))
        .orderBy("label")
    },

    // Per-label centroid numerators: embeddings quantized to 1e-6 and
    // summed exactly as integers per (label, dimension) — the cluster-
    // centroid building block, engine-exact.
    "q_embed_centroids" -> { (s, dir) =>
      Tables
        .embeddings(s, dir)
        .select(col("label"),
          posexplode(Similarity.asDouble(col("embedding"))).as(Seq("dim0", "x")))
        .groupBy(col("label"), (col("dim0") + 1).as("dim"))
        .agg(sum(floor(col("x") * 1000000).cast("long")).as("sum_q6"),
          count(lit(1)).as("n"))
        .orderBy("label", "dim")
    },

    // ONE LLOYD ITERATION of k-means (k = 8, seeds = the deterministic
    // first-8 vectors — the q_ann_ivf centroid stand-in convention):
    // assignment is MAP-ONLY, k plan-literal `graft_sqdist` probes per
    // row (the contaminationByEmbedding pattern — driver state is k·dim
    // doubles, never a corpus collect) with argmin-by-(d2, seed) via
    // `least` over structs (ties to the lowest seed id, deterministic);
    // the update step re-uses the q_embed_centroids exact integer
    // numerators per (cluster, dim). The building block a distributed
    // k-means loop iterates; one iteration is declared so the oracle can
    // gate assignment AND update exactly.
    "q_kmeans_step" -> { (s, dir) =>
      val v = vecs(s, dir)
      val seeds = v.filter(col("id") < 8)
        .select(col("id").cast("int"), col("vec"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1)
        .toSeq
      val scored = seeds.map { case (sid, sv) =>
        struct(call_function("graft_sqdist", col("vec"), typedLit(sv)).as("d2"),
          lit(sid).as("seed"))
      }
      v.select(col("vec"), least(scored: _*).getField("seed").as("cluster"))
        .select(col("cluster"), posexplode(col("vec")).as(Seq("dim0", "x")))
        .groupBy(col("cluster"), (col("dim0") + 1).as("dim"))
        .agg(sum(floor(col("x") * 1000000).cast("long")).as("sum_q6"),
          count(lit(1)).as("n"))
        .orderBy("cluster", "dim")
    },

    // Int8 scalar quantization (Similarity.scalarQuantize): per-dim
    // min/max trained on the FULL corpus, codes + squared reconstruction
    // error emitted for the first 100 vectors. Every step is a fixed-order
    // chain of correctly-rounded IEEE ops, so codes AND errors hash
    // cross-engine — the compression rung below PQ, oracle-checked.
    "q_embed_sq8" -> { (s, dir) =>
      Similarity
        .scalarQuantize(vecs(s, dir), levels = 256)
        .filter(col("id") < 100)
        .orderBy("id", "dim")
    },

    // Binary (1-bit) quantization + Hamming top-10 for 5 probes — the
    // 32×-compressed first-stage shortlist (Similarity.binaryTopK:
    // sign bits packed into 32-bit words by an integer Horner fold,
    // bit_count(xor) distance — pure integer ops, hash-exact).
    "q_embed_binary_hamming" -> { (s, dir) =>
      val v = vecs(s, dir)
      Similarity
        .binaryTopK(v.filter(col("id") < 5), v, dim = Dim, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("hamming"), col("rank"))
        .orderBy("query_id", "rank")
    },

    // Matryoshka-style prefix-dim retrieval check: top-10 by cosine over
    // the FIRST 16 of 64 dims vs the full-dim top-10, per-probe overlap
    // count — the truncate-don't-retrain evaluation a pipeline runs
    // before serving shortened embeddings (4× cheaper scan). Two
    // brute-force passes share the probe broadcast shape; overlap is an
    // exact integer per query, zero-filled for probes with none.
    "q_ann_matryoshka" -> { (s, dir) =>
      val v = vecs(s, dir)
      val probes = v.filter(col("id") < 5)
      def trunc(df: DataFrame) = df.select(col("id"), slice(col("vec"), 1, 16).as("vec"))
      val full = Similarity.bruteForceTopK(probes, v, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val tr = Similarity.bruteForceTopK(trunc(probes), trunc(v), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val overlap = full.join(tr, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
      probes.select(col("id").as("query_id"))
        .join(overlap, Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
        .orderBy("query_id")
    },

    // HYBRID retrieval via reciprocal-rank fusion (Cormack et al.):
    // lexical BM25 top-20 ⊕ vector cosine top-20 (probe = vec 0) fused by
    // rrf(d) = Σ 1/(60 + rank_s(d)) — the production hybrid-search
    // primitive serving next to every RAG index. Per-system contribution
    // floor-quantized at 1e-6 (one IEEE division on integer rank) and
    // integer-summed, so the fused ordering is hash-exact. Plan shape:
    // each arm is its own scale-path (BM25's filtered explode + broadcast
    // stats; cosine's broadcast probe — ANN swaps in at corpus scale);
    // fusion is a full outer join of two ≤k-row shortlists, then rank
    // arithmetic — fusion cost is k-sized, never corpus-sized.
    "q_hybrid_rrf" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
      // rank assignment happens on the 20-row TakeOrdered shortlist, not
      // the corpus-sized score frame (the window input is k rows)
      val bm = TextOps.bm25Scores(d, "doc_id", "text", TextQueries.Bm25Terms)
        .select(col("doc").as("doc_id"), col("score_q6"))
        .orderBy(col("score_q6").desc, col("doc_id").asc)
        .limit(20)
        .withColumn("bm_rank",
          row_number().over(Window.orderBy(col("score_q6").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("bm_rank").cast("long").as("bm_rank"))
      val v = vecs(s, dir)
      val cs = Similarity.bruteForceTopK(v.filter(col("id") === 0), v, k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank").cast("long").as("cos_rank"))
      bm.join(cs, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("bm_rank"), col("cos_rank"),
          (coalesce(floor(lit(1000000.0) / (col("bm_rank") + 60)).cast("long"), lit(0L)) +
            coalesce(floor(lit(1000000.0) / (col("cos_rank") + 60)).cast("long"), lit(0L)))
            .as("rrf_q6"))
        .orderBy(col("rrf_q6").desc, col("doc_id").asc)
    }
  )

  // ---- DuckDB fragments ----

  private val VDouble = "list_transform(embedding, x -> x::DOUBLE)"

  /** nDCG@10 discount weights, ⌊10⁶/log₂(r+1)⌋ for rank r = 1..10 —
    * pre-quantized so DCG is exact integer arithmetic in both engines. */
  private val NdcgW = Seq(1000000L, 630929L, 500000L, 430676L, 386852L, 356207L,
    333333L, 315464L, 301029L, 289064L)

  /** Prefix sums of [[NdcgW]]: IDCG_q6 for n_rel = 0..10 (index n_rel+1). */
  private val NdcgIdcg = Seq(0L, 1000000L, 1630929L, 2130929L, 2561605L, 2948457L,
    3304664L, 3637997L, 3953461L, 4254490L, 4543554L)

  private def foldSumSql(listExpr: String) =
    s"list_reduce(list_prepend(0.0::DOUBLE, $listExpr), (acc, x) -> acc + x)"

  private def dotSql(a: String, b: String) =
    foldSumSql(s"list_transform(generate_series(1, $Dim), i -> $a[i] * $b[i])")

  private def normSql(a: String) =
    s"sqrt(${foldSumSql(s"list_transform($a, x -> x * x)")})"

  private[ext] def cosSql(a: String, b: String) =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  /** Shared IVF-PQ CTE chain ending in `scored` (query_id, neighbor_id,
    * adist): PQ codebooks/codes from the first 16 vectors (iters=0),
    * rank-1 corpus cells, 2 probed query cells, ADC over probed-cell
    * codes. Both `q_ivfpq_adc` and `q_ivfpq_rerank` build on it.
    */
  private lazy val IvfPqCtes: String =
    s"v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      "cbsrc AS (SELECT id, vec FROM v ORDER BY id LIMIT 16), " +
      "cb AS (SELECT s, row_number() OVER (PARTITION BY s ORDER BY id) - 1 AS j, " +
      "list_slice(vec, s*8+1, s*8+8) AS cent FROM cbsrc, generate_series(0, 7) AS g(s)), " +
      "d AS (SELECT v.id, cb.s, cb.j, " +
      "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, 8), " +
      "i -> (v.vec[cb.s*8+i] - cb.cent[i]) * (v.vec[cb.s*8+i] - cb.cent[i]))), " +
      "(acc, x) -> acc + x) AS dist FROM v, cb), " +
      "codes AS (SELECT id, s, j AS code FROM (SELECT id, s, j, " +
      "row_number() OVER (PARTITION BY id, s ORDER BY dist ASC, j ASC) AS rn FROM d) " +
      "WHERE rn = 1), " +
      s"cent AS (SELECT id AS cid, vec AS cvec FROM v WHERE id < $NCells), " +
      "rc AS (SELECT v.id, c.cid AS cell, " +
      s"row_number() OVER (PARTITION BY v.id ORDER BY ${cosSql("v.vec", "c.cvec")} DESC, c.cid ASC) AS rn " +
      "FROM v, cent c), " +
      "ccell AS (SELECT id, cell FROM rc WHERE rn = 1), " +
      "qcell AS (SELECT id, cell FROM rc WHERE id < 20 AND rn <= 2), " +
      "scored AS (SELECT d.id AS query_id, c.id AS neighbor_id, " +
      "list_reduce(list_prepend(0.0::DOUBLE, list(d.dist ORDER BY d.s)), " +
      "(acc, x) -> acc + x) AS adist " +
      "FROM codes c JOIN d ON d.s = c.s AND d.j = c.code " +
      "JOIN ccell nc ON nc.id = c.id " +
      "JOIN qcell qc ON qc.id = d.id AND qc.cell = nc.cell " +
      "WHERE d.id < 20 AND d.id != c.id GROUP BY 1, 2)"

  /** The same unrolled integer-hyperplane bucket expression, as SQL. */
  private[ext] def bucketSql(v: String, planes: Array[Array[Long]] = W): String =
    planes.zipWithIndex
      .map { case (w, p) =>
        val d = w.zipWithIndex.map { case (wi, i) => s"$v[${i + 1}] * ($wi)" }.mkString(" + ")
        s"(CASE WHEN $d > 0 THEN ${1L << p} ELSE 0 END)"
      }
      .mkString(" + ")

  def oracleSql: Map[String, String] = Map(
    // codebooks = per-subspace slices of the 16 lowest-id vectors (cell j
    // = rank of id); argmin = row_number over (dist, j) = first-wins;
    // the ADC sum folds the 8 per-subspace LUT terms in subspace order
    "q_pq_adc" -> (s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      "cbsrc AS (SELECT id, vec FROM v ORDER BY id LIMIT 16), " +
      "cb AS (SELECT s, row_number() OVER (PARTITION BY s ORDER BY id) - 1 AS j, " +
      "list_slice(vec, s*8+1, s*8+8) AS cent FROM cbsrc, generate_series(0, 7) AS g(s)), " +
      "d AS (SELECT v.id, cb.s, cb.j, " +
      "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, 8), " +
      "i -> (v.vec[cb.s*8+i] - cb.cent[i]) * (v.vec[cb.s*8+i] - cb.cent[i]))), " +
      "(acc, x) -> acc + x) AS dist FROM v, cb), " +
      "codes AS (SELECT id, s, j AS code FROM (SELECT id, s, j, " +
      "row_number() OVER (PARTITION BY id, s ORDER BY dist ASC, j ASC) AS rn FROM d) " +
      "WHERE rn = 1), " +
      "scores AS (SELECT d.id AS query_id, c.id AS neighbor_id, " +
      "list_reduce(list_prepend(0.0::DOUBLE, list(d.dist ORDER BY d.s)), " +
      "(acc, x) -> acc + x) AS adist " +
      "FROM codes c JOIN d ON d.s = c.s AND d.j = c.code " +
      "WHERE d.id < 20 AND d.id != c.id GROUP BY 1, 2) " +
      "SELECT query_id, neighbor_id, adist, rank FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS rank " +
      "FROM scores) WHERE rank <= 5 ORDER BY query_id, rank"),
    // cross join corpus × probes, argmax by (cos DESC, probe_id DESC) —
    // the greatest()-struct order — then the 0.32 threshold on the exact
    // same cosine fold the engine codegens; NaN guard mirrors the engine
    "q_semantic_contamination" -> (s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec " +
      "FROM embeddings), " +
      "p AS (SELECT id AS probe_id, vec AS pv FROM v WHERE id < 10), " +
      "c AS (SELECT id, vec FROM v WHERE id >= 10), " +
      s"s AS (SELECT c.id, p.probe_id, ${cosSql("c.vec", "p.pv")} AS cos FROM c, p), " +
      "r AS (SELECT id, probe_id, cos, row_number() OVER " +
      "(PARTITION BY id ORDER BY cos DESC, probe_id DESC) AS rn FROM s " +
      "WHERE NOT isnan(cos)) " +
      "SELECT id, probe_id, cos FROM r WHERE rn = 1 AND cos >= 0.32 ORDER BY id"),
    "q_cosine_topk" -> (s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      s"scored AS (SELECT q.id AS query_id, c.id AS neighbor_id, ${cosSql("q.vec", "c.vec")} AS cos " +
      "FROM v q JOIN v c ON q.id < 5 AND q.id != c.id) " +
      "SELECT query_id, neighbor_id, cos, rank FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored) " +
      "WHERE rank <= 10 ORDER BY query_id, rank"),
    // q_cosine_topk's exact-retrieval shape + label relevance; the same
    // hardcoded integer weight/prefix tables as VALUES lists
    "q_ndcg_eval" -> {
      val wVals = NdcgW.zipWithIndex.map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
      val pVals = NdcgIdcg.zipWithIndex.map { case (p, i) => s"($i, $p)" }.mkString(", ")
      s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
        s"scored AS (SELECT q.id AS query_id, c.id AS neighbor_id, " +
        s"${cosSql("q.vec", "c.vec")} AS cos " +
        "FROM v q JOIN v c ON q.id < 10 AND q.id != c.id), " +
        "topk AS (SELECT query_id, neighbor_id, rank FROM (SELECT *, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored) " +
        "WHERE rank <= 10), " +
        s"w(r, wt) AS (VALUES $wVals), p(nr, iw) AS (VALUES $pVals), " +
        "rel AS (SELECT t.query_id, t.rank, " +
        "CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS rel " +
        "FROM topk t JOIN embeddings a ON a.vec_id = t.query_id " +
        "JOIN embeddings b ON b.vec_id = t.neighbor_id), " +
        "per AS (SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_rel, " +
        "CAST(sum(rel * wt) AS BIGINT) AS dcg_q6 FROM rel JOIN w ON w.r = rel.rank " +
        "GROUP BY 1) " +
        "SELECT query_id, n_rel, dcg_q6, CAST(iw AS BIGINT) AS idcg_q6, " +
        "CASE WHEN iw > 0 THEN CAST(dcg_q6 AS DOUBLE) / CAST(iw AS DOUBLE) " +
        "ELSE CAST(0 AS DOUBLE) END AS ndcg " +
        "FROM per JOIN p ON p.nr = per.n_rel ORDER BY query_id"
    },
    "q_ann_lsh" -> AnnLshSql,
    // identical result contract to q_ann_lsh — the engine differs only in
    // the index frame's physical lifecycle (persisted bucketed table)
    "q_ann_lsh_indexed" -> AnnLshSql,
    // q_ann_lsh's chain with the corpus CTE label-filtered before
    // bucketing — probes bucket from the unfiltered table
    "q_ann_filtered" -> {
      val masks = (0L +: (0 until Planes).map(1L << _)).mkString(", ")
      val corpusTables = Tables3.zipWithIndex
        .map { case (w, t) =>
          s"SELECT id, vec, $t AS t, ${bucketSql("vec", w)} AS bucket FROM v WHERE label < 5"
        }
        .mkString(" UNION ALL ")
      val probeTables = Tables3.zipWithIndex
        .map { case (w, t) =>
          s"SELECT id, vec, $t AS t, ${bucketSql("vec", w)} AS bucket FROM v WHERE id < 10"
        }
        .mkString(" UNION ALL ")
      s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec, label FROM embeddings), " +
      s"b AS ($corpusTables), " +
      s"p AS ($probeTables), " +
      s"qp AS (SELECT id, vec, t, xor(bucket, m) AS bucket FROM p, unnest([$masks]::BIGINT[]) AS u(m)), " +
      s"scored AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id, ${cosSql("q.vec", "c.vec")} AS cos " +
      "FROM qp q JOIN b c ON q.t = c.t AND q.bucket = c.bucket AND q.id != c.id) " +
      "SELECT query_id, neighbor_id, cos, rank FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored) " +
      "WHERE rank <= 5 ORDER BY query_id, rank"
    },
    // q_ann_lsh's candidate chain (b/qp/cands) and q_cosine_topk's exact
    // shape, both ranked to 5, joined — identical shortlists, identical
    // rational recall
    "q_ann_recall" -> {
      val masks = (0L +: (0 until Planes).map(1L << _)).mkString(", ")
      val perTable = Tables3.zipWithIndex
        .map { case (w, t) => s"SELECT id, vec, $t AS t, ${bucketSql("vec", w)} AS bucket FROM v" }
        .mkString(" UNION ALL ")
      s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      s"b AS ($perTable), " +
      s"qp AS (SELECT id, vec, t, xor(bucket, m) AS bucket FROM b, unnest([$masks]::BIGINT[]) AS u(m) WHERE id < 10), " +
      s"cands AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id, ${cosSql("q.vec", "c.vec")} AS cos " +
      "FROM qp q JOIN b c ON q.t = c.t AND q.bucket = c.bucket AND q.id != c.id), " +
      "ann AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM cands) WHERE rank <= 5), " +
      s"exs AS (SELECT q.id AS query_id, c.id AS neighbor_id, ${cosSql("q.vec", "c.vec")} AS cos " +
      "FROM v q JOIN v c ON q.id < 10 AND q.id != c.id), " +
      "ex AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM exs) WHERE rank <= 5) " +
      "SELECT e.query_id, " +
      "CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits, " +
      "CAST(floor(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000.0 / 5) AS BIGINT) AS recall_q6 " +
      "FROM ex e LEFT JOIN ann a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id " +
      "GROUP BY 1 ORDER BY 1"
    },
    // shared cell CTEs materialized once; per-nprobe candidate sets are
    // the SAME ranked probe frame filtered at rn ≤ np
    "q_ivf_nprobe_sweep" -> {
      val perNp = (1 to 4).map { np =>
        s"s$np AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id, " +
          s"${cosSql("q.vec", "c.vec")} AS cos FROM qc q JOIN ccell c " +
          s"ON q.cell = c.cell AND q.id != c.id WHERE q.rn <= $np), " +
          s"a$np AS (SELECT $np AS nprobe, query_id, neighbor_id FROM " +
          "(SELECT *, row_number() OVER (PARTITION BY query_id " +
          s"ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s$np) WHERE rank <= 5)"
      }.mkString(", ")
      s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
        s"cent AS (SELECT id AS cid, vec AS cvec FROM v WHERE id < $NCells), " +
        "ccell AS MATERIALIZED (SELECT id, vec, cell FROM (SELECT v.id, v.vec, c.cid AS cell, " +
        s"row_number() OVER (PARTITION BY v.id ORDER BY ${cosSql("v.vec", "c.cvec")} DESC, c.cid ASC) AS rn " +
        "FROM v, cent c) WHERE rn = 1), " +
        "qc AS MATERIALIZED (SELECT id, vec, cell, rn FROM (SELECT v.id, v.vec, c.cid AS cell, " +
        s"row_number() OVER (PARTITION BY v.id ORDER BY ${cosSql("v.vec", "c.cvec")} DESC, c.cid ASC) AS rn " +
        "FROM v, cent c WHERE v.id < 10) WHERE rn <= 4), " +
        perNp + ", " +
        "u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2 " +
        "UNION ALL SELECT * FROM a3 UNION ALL SELECT * FROM a4), " +
        s"exs AS (SELECT q.id AS query_id, c.id AS neighbor_id, ${cosSql("q.vec", "c.vec")} AS cos " +
        "FROM v q JOIN v c ON q.id < 10 AND q.id != c.id), " +
        "ex AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM exs) WHERE rank <= 5) " +
        "SELECT g.nprobe, count(*) AS n_truth, " +
        "CAST(sum(CASE WHEN u.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits, " +
        "CAST(sum(CASE WHEN u.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "* 1000000 // count(*) AS recall_q6 " +
        "FROM ex e CROSS JOIN generate_series(1, 4) AS g(nprobe) " +
        "LEFT JOIN u ON u.nprobe = g.nprobe AND u.query_id = e.query_id " +
        "AND u.neighbor_id = e.neighbor_id GROUP BY 1 ORDER BY 1"
    },
    "q_ann_ivf" -> (s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      s"cent AS (SELECT id AS cid, vec AS cvec FROM v WHERE id < $NCells), " +
      "ccell AS (SELECT id, vec, cell FROM (SELECT v.id, v.vec, c.cid AS cell, " +
      s"row_number() OVER (PARTITION BY v.id ORDER BY ${cosSql("v.vec", "c.cvec")} DESC, c.cid ASC) AS rn " +
      "FROM v, cent c) WHERE rn = 1), " +
      "qcell AS (SELECT id, vec, cell FROM (SELECT v.id, v.vec, c.cid AS cell, " +
      s"row_number() OVER (PARTITION BY v.id ORDER BY ${cosSql("v.vec", "c.cvec")} DESC, c.cid ASC) AS rn " +
      "FROM v, cent c WHERE v.id < 10) WHERE rn <= 2), " +
      s"scored AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id, ${cosSql("q.vec", "c.vec")} AS cos " +
      "FROM qcell q JOIN ccell c ON q.cell = c.cell AND q.id != c.id) " +
      "SELECT query_id, neighbor_id, cos, rank FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored) " +
      "WHERE rank <= 5 ORDER BY query_id, rank"),
    // the SELF-SIZING mirror: np from count(*) via the planesForExact
    // integer rule (smallest p with 64·2^p ≥ n, NULL past the cap — fails
    // loudly), plane constants gated on p < np, and the Hamming-1 probe
    // ring over the np LIVE bits only (g = 0 or g ≤ np). NaN guard mirrors
    // the engine's explicit !isnan (DuckDB ranks NaN above any threshold).
    "q_embed_neardup_auto" -> (
      "WITH cnt AS (SELECT count(*) AS n FROM embeddings), " +
      s"np AS (SELECT min(p) AS np FROM generate_series(1, $AutoMaxPlanes) gs(p), cnt " +
      "WHERE 64 * (1::BIGINT << p) >= n), " +
      s"v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      s"b AS MATERIALIZED (SELECT id, vec, ${gatedBucketSql("vec", AutoW)} AS bucket FROM v, np), " +
      "probed AS (SELECT id, vec, " +
      "xor(bucket, CASE WHEN g = 0 THEN 0::BIGINT ELSE 1::BIGINT << (g - 1) END) AS bucket " +
      s"FROM b, np, generate_series(0, $AutoMaxPlanes) gg(g) WHERE g = 0 OR g <= np) " +
      s"SELECT DISTINCT x.id AS a, y.id AS b, ${cosSql("x.vec", "y.vec")} AS cos " +
      "FROM probed x JOIN b y ON x.bucket = y.bucket AND x.id < y.id " +
      s"WHERE NOT isnan(${cosSql("x.vec", "y.vec")}) " +
      s"AND ${cosSql("x.vec", "y.vec")} >= 0.45 ORDER BY a, b"),
    // q_pq_adc's CTEs (codes, d) composed with q_ann_ivf's cell CTEs:
    // scored pairs additionally require the neighbor's rank-1 cell to be
    // one of the query's 2 probed cells
    "q_ivfpq_adc" -> (s"WITH $IvfPqCtes " +
      "SELECT query_id, neighbor_id, adist, rank FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS rank " +
      "FROM scored) WHERE rank <= 5 ORDER BY query_id, rank"),
    // the same CTE chain shortlists 25 by adist, then raw vectors re-rank
    // the shortlist pairs by exact cosine — mirrors rerankExact
    "q_ivfpq_rerank" -> (s"WITH $IvfPqCtes, " +
      "short AS (SELECT query_id, neighbor_id FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS rank " +
      "FROM scored) WHERE rank <= 25), " +
      s"rr AS (SELECT s.query_id, s.neighbor_id, ${cosSql("q.vec", "c.vec")} AS cos " +
      "FROM short s JOIN v q ON q.id = s.query_id JOIN v c ON c.id = s.neighbor_id) " +
      "SELECT query_id, neighbor_id, cos, rank FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank " +
      // NaN guard mirrors rerankExact's dropNaN: DuckDB ranks NaN
      // GREATEST where Spark filters it — a zero-norm vector in the
      // shortlist would otherwise shift every rank below it
      "FROM rr WHERE NOT isnan(cos)) WHERE rank <= 5 ORDER BY query_id, rank"),
    // the SELF-SIZING mirror: k = smallest kk with kk² ≥ count(*) — the
    // cellsForExact integer rule — then the identical ccell/dropped shape.
    // Cap 100000 ⇒ oracle-checkable to 10^10 vectors; past that k is NULL
    // and the check fails loudly (the engine itself has no cap).
    "q_semantic_dedup_auto" -> ("WITH cnt AS (SELECT count(*) AS n FROM embeddings), " +
      "k AS (SELECT CAST(min(kk) AS BIGINT) AS k FROM generate_series(1, 100000) gs(kk), cnt " +
      "WHERE kk*kk >= n), " +
      s"v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      "cent AS (SELECT id AS cid, vec AS cvec FROM v, k WHERE id < k.k), " +
      "ccell AS (SELECT id, vec, cell FROM (SELECT v.id, v.vec, c.cid AS cell, " +
      s"row_number() OVER (PARTITION BY v.id ORDER BY ${cosSql("v.vec", "c.cvec")} DESC, c.cid ASC) AS rn " +
      "FROM v, cent c) WHERE rn = 1), " +
      "dropped AS (SELECT DISTINCT y.id AS id FROM ccell x JOIN ccell y " +
      s"ON x.cell = y.cell AND x.id < y.id AND ${cosSql("x.vec", "y.vec")} >= 0.35) " +
      "SELECT c.id, c.cell, CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS kept " +
      "FROM ccell c LEFT JOIN dropped d ON c.id = d.id ORDER BY c.id"),
    // the cosine-topk ranking joined to documents for the fetch stage
    "q_rag_retrieve" -> (s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      s"scored AS (SELECT q.id AS query_id, c.id AS neighbor_id, ${cosSql("q.vec", "c.vec")} AS cos " +
      "FROM v q JOIN v c ON q.id < 3 AND q.id != c.id), " +
      "topk AS (SELECT query_id, neighbor_id, cos, rank FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored) " +
      "WHERE rank <= 3) " +
      "SELECT query_id, rank, doc_id, source, md5(text) AS text_md5, cos " +
      "FROM topk JOIN documents ON neighbor_id = doc_id ORDER BY query_id, rank"),
    // the same greedy as Similarity.mmrRerank, replayed as a recursive
    // CTE carrying the picked list; marginal = 0.5·rel − 0.5·max(sim to
    // picked) in the identical IEEE order, ties on smaller cand_id.
    // generate_series indexes the final list (WITH ORDINALITY is
    // unimplemented in DuckDB; the series is uncorrelated — the round-9
    // lateral lesson).
    "q_rag_mmr" -> (s"WITH RECURSIVE v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      s"rel AS (SELECT q.id AS query_id, c.id AS cand_id, ${cosSql("q.vec", "c.vec")} AS rel " +
      "FROM v q JOIN v c ON q.id < 3 AND q.id != c.id), " +
      "shortlist AS (SELECT query_id, cand_id, rel FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY rel DESC, cand_id ASC) AS rn FROM rel) WHERE rn <= 20), " +
      "pairs AS (SELECT a.query_id, a.cand_id AS ia, b.cand_id AS ib, " +
      s"${cosSql("va.vec", "vb.vec")} AS sim " +
      "FROM shortlist a JOIN shortlist b ON a.query_id = b.query_id AND a.cand_id != b.cand_id " +
      "JOIN v va ON va.id = a.cand_id JOIN v vb ON vb.id = b.cand_id), " +
      "sel(query_id, step, picked) AS (" +
      "SELECT DISTINCT query_id, 0, []::BIGINT[] FROM shortlist " +
      "UNION ALL " +
      "SELECT query_id, step + 1, list_append(picked, (" +
      "SELECT s.cand_id FROM shortlist s " +
      "WHERE s.query_id = sel.query_id AND NOT list_contains(sel.picked, s.cand_id) " +
      "ORDER BY (0.5 * s.rel - 0.5 * coalesce((SELECT max(p.sim) FROM pairs p " +
      "WHERE p.query_id = sel.query_id AND p.ia = s.cand_id " +
      "AND list_contains(sel.picked, p.ib)), 0.0)) DESC, s.cand_id ASC LIMIT 1)) " +
      "FROM sel WHERE step < 5) " +
      "SELECT query_id, CAST(g.rank AS INTEGER) AS rank, picked[g.rank] AS cand_id " +
      "FROM sel CROSS JOIN generate_series(1, 5) AS g(rank) WHERE step = 5 " +
      "ORDER BY query_id, rank"),
    // q_cosine_topk's shape + the label-mismatch predicate in the join
    "q_hard_negatives" -> (s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec, label FROM embeddings), " +
      "scored AS (SELECT q.id AS query_id, c.id AS neighbor_id, c.label AS neg_label, " +
      s"${cosSql("q.vec", "c.vec")} AS cos " +
      "FROM v q JOIN v c ON q.id < 5 AND q.id != c.id AND q.label != c.label) " +
      "SELECT query_id, neighbor_id, neg_label, cos, rank FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored) " +
      "WHERE rank <= 10 ORDER BY query_id, rank"),
    "q_embed_norm" -> (s"SELECT vec_id AS id, i AS dim, " +
      s"CAST(floor(($VDouble[i] / ${normSql(VDouble)}) * 1000000) AS BIGINT) AS nx_q6 " +
      s"FROM embeddings CROSS JOIN generate_series(1, $Dim) AS g(i) " +
      s"WHERE vec_id < 100 AND ${normSql(VDouble)} > 0 " +
      "ORDER BY 1, 2"),
    // the recursive CTE replays the engine's power iteration op-for-op:
    // integer scatter moments → scaled covariance n·S − T·Tᵀ → 20 steps of
    // normalize(C·v) from the exact 1/√64 start, every fold left-to-right
    // seeded 0.0 — bit-identical doubles, so ranking and rounding agree
    "q_embed_pca" -> ("WITH RECURSIVE " +
      s"v AS (SELECT vec_id, $VDouble AS vec FROM embeddings), " +
      "q AS (SELECT vec_id, list_transform(vec, x -> CAST(floor(x * 1000) AS BIGINT)) AS qv FROM v), " +
      "nn AS (SELECT count(*) AS n FROM q), " +
      "mom AS (SELECT i, j, sum(qv[i] * qv[j]) AS s " +
      s"FROM q CROSS JOIN generate_series(1, $Dim) g1(i) " +
      s"CROSS JOIN generate_series(1, $Dim) g2(j) GROUP BY 1, 2), " +
      "tsum AS (SELECT i, sum(qv[i]) AS t " +
      s"FROM q CROSS JOIN generate_series(1, $Dim) g(i) GROUP BY 1), " +
      "c AS (SELECT m.i, m.j, CAST(nn.n * m.s - ti.t * tj.t AS DOUBLE) AS cv " +
      "FROM mom m, nn, tsum ti, tsum tj WHERE ti.i = m.i AND tj.i = m.j), " +
      "crow AS (SELECT i, list(cv ORDER BY j) AS row FROM c GROUP BY 1), " +
      "cmat AS (SELECT list(row ORDER BY i) AS m FROM crow), " +
      "it(k, vv) AS (" +
      // start vector 1/√dim computed from the SAME Dim constant as the
      // engine (a stale literal would silently diverge if Dim moves);
      // ::DOUBLE because a bare decimal literal is DECIMAL(4,3) in DuckDB,
      // which would poison the first matvec with decimal arithmetic
      s"SELECT 0, list_transform(generate_series(1, $Dim), " +
      s"x -> ${1.0 / math.sqrt(Dim.toDouble)}::DOUBLE) " +
      "UNION ALL SELECT k + 1, " +
      "list_transform(mv, x -> x / sqrt(list_reduce(list_prepend(0.0::DOUBLE, " +
      "list_transform(mv, y -> y * y)), (a, b) -> a + b))) " +
      s"FROM (SELECT k, list_transform(generate_series(1, $Dim), i -> " +
      "list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $Dim), j -> m[i][j] * vv[j])), " +
      "(a, b) -> a + b)) AS mv FROM it, cmat WHERE k < 20) s), " +
      "pc AS (SELECT vv FROM it WHERE k = 20), " +
      "mean AS (SELECT list(t / (1000.0 * n) ORDER BY i) AS mu FROM tsum, nn GROUP BY n), " +
      "proj AS (SELECT vec_id, abs(list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $Dim), jj -> (vec[jj] - mu[jj]) * vv[jj])), " +
      "(a, b) -> a + b)) AS pa FROM v, pc, mean) " +
      "SELECT vec_id, round(pa, 6) AS proj_abs FROM proj " +
      "ORDER BY pa DESC, vec_id LIMIT 50"),
    // HUGEINT products/sums cast back to BIGINT; n·S − T² exact integers
    "q_embed_dim_stats" -> (s"WITH q AS (SELECT vec_id, " +
      s"list_transform($VDouble, x -> CAST(floor(x * 1000) AS BIGINT)) AS qv " +
      "FROM embeddings), " +
      s"ex AS (SELECT i AS dim, qv[i] AS v FROM q CROSS JOIN generate_series(1, $Dim) g(i)), " +
      "agg AS (SELECT dim, count(*) AS n, CAST(sum(v) AS BIGINT) AS t_q3, " +
      "min(v) AS min_q3, max(v) AS max_q3, CAST(sum(v * v) AS BIGINT) AS s_q3 " +
      "FROM ex GROUP BY 1) " +
      "SELECT dim, n, t_q3, min_q3, max_q3, " +
      "CAST(n * s_q3 - t_q3 * t_q3 AS BIGINT) AS nvar_q3 FROM agg ORDER BY dim"),
    // centroid numerators = the q_embed_centroids integer sums; distance
    // folds (x − s/(10⁶·n))² left-to-right like every similarity score
    "q_embed_outliers" -> (s"WITH v AS (SELECT vec_id, label, $VDouble AS vec FROM embeddings), " +
      s"s AS (SELECT label, i, CAST(sum(CAST(floor(vec[i] * 1000000) AS BIGINT)) AS BIGINT) AS s, " +
      s"count(*) AS n FROM v CROSS JOIN generate_series(1, $Dim) g(i) GROUP BY 1, 2), " +
      "c AS (SELECT label, list(s ORDER BY i) AS cs, max(n) AS n FROM s GROUP BY 1), " +
      "d AS (SELECT vec_id, v.label, " +
      "list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $Dim), j -> " +
      "(vec[j] - cs[j]::DOUBLE / (1000000.0 * n)) * " +
      "(vec[j] - cs[j]::DOUBLE / (1000000.0 * n)))), (a, b) -> a + b) AS dist2 " +
      "FROM v JOIN c USING (label)) " +
      "SELECT vec_id, label, round(dist2, 6) AS dist2 FROM d " +
      "ORDER BY d.dist2 DESC, vec_id LIMIT 20"),
    // same member-distance pass as q_embed_outliers (σ as exact q6 sums
    // under sqrt), centroid-grid distances from the same cs/n
    // reconstruction, argmax by (r DESC, j) row_number
    "q_davies_bouldin" -> (s"WITH v AS (SELECT vec_id, label, $VDouble AS vec FROM embeddings), " +
      s"sm AS (SELECT label, i, CAST(sum(CAST(floor(vec[i] * 1000000) AS BIGINT)) AS BIGINT) AS sq, " +
      s"count(*) AS n FROM v CROSS JOIN generate_series(1, $Dim) g(i) GROUP BY 1, 2), " +
      "c AS (SELECT label, list(sq ORDER BY i) AS cs, max(n) AS n FROM sm GROUP BY 1), " +
      "d AS (SELECT vec_id, v.label, " +
      "list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $Dim), j -> " +
      "(vec[j] - cs[j]::DOUBLE / (1000000.0 * n)) * " +
      "(vec[j] - cs[j]::DOUBLE / (1000000.0 * n)))), (a, b) -> a + b) AS dist2 " +
      "FROM v JOIN c USING (label)), " +
      "sig AS (SELECT label, CAST(sum(CAST(floor(sqrt(dist2) * 1000000) AS BIGINT)) AS BIGINT) " +
      "AS sq, count(*) AS cnt FROM d GROUP BY 1), " +
      "dij AS (SELECT a.label AS i, b.label AS j, " +
      "sqrt(list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $Dim), k -> " +
      "(a.cs[k]::DOUBLE / (1000000.0 * a.n) - b.cs[k]::DOUBLE / (1000000.0 * b.n)) * " +
      "(a.cs[k]::DOUBLE / (1000000.0 * a.n) - b.cs[k]::DOUBLE / (1000000.0 * b.n)))), " +
      "(x, y) -> x + y)) AS dij FROM c a CROSS JOIN c b WHERE a.label <> b.label), " +
      "r AS (SELECT i, si.cnt AS n, j, " +
      "(si.sq::DOUBLE / (1000000.0 * si.cnt) + sj.sq::DOUBLE / (1000000.0 * sj.cnt)) / dij AS r " +
      "FROM dij JOIN sig si ON i = si.label JOIN sig sj ON j = sj.label), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY i ORDER BY r DESC, j) AS rn FROM r) " +
      "SELECT i AS label, n, j AS partner, round(r, 6) AS r FROM rk WHERE rn = 1 ORDER BY label"),
    // same exact-integer centroid frame as q_embed_outliers, distances
    // under sqrt, a/b via same-label max / other-label min, one s
    // expression; ORDER BY the UNROUNDED sc.s like the engine
    "q_silhouette" -> (s"WITH v AS (SELECT vec_id, label, $VDouble AS vec FROM embeddings), " +
      s"sm AS (SELECT label, i, CAST(sum(CAST(floor(vec[i] * 1000000) AS BIGINT)) AS BIGINT) AS sq, " +
      s"count(*) AS n FROM v CROSS JOIN generate_series(1, $Dim) g(i) GROUP BY 1, 2), " +
      "c AS (SELECT label, list(sq ORDER BY i) AS cs, max(n) AS n FROM sm GROUP BY 1), " +
      "d AS (SELECT vec_id, v.label, c.label AS l2, " +
      "sqrt(list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $Dim), j -> " +
      "(vec[j] - cs[j]::DOUBLE / (1000000.0 * n)) * " +
      "(vec[j] - cs[j]::DOUBLE / (1000000.0 * n)))), (a, b) -> a + b)) AS dd " +
      "FROM v CROSS JOIN c), " +
      "ab AS (SELECT vec_id, label, max(CASE WHEN l2 = label THEN dd END) AS a, " +
      "min(CASE WHEN l2 <> label THEN dd END) AS b FROM d GROUP BY 1, 2), " +
      "sc AS (SELECT vec_id, label, a, b, CASE WHEN greatest(a, b) > 0.0 " +
      "THEN (b - a) / greatest(a, b) ELSE 0.0 END AS s FROM ab) " +
      "SELECT vec_id, label, round(a, 6) AS a, round(b, 6) AS b, round(s, 6) AS s " +
      "FROM sc ORDER BY sc.s, vec_id LIMIT 20"),
    // same left-to-right (x−s)² fold per seed, argmin by (d2, seed) via
    // the ordered row_number, same exact integer centroid numerators
    "q_kmeans_step" -> (s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      "sd AS (SELECT id AS seed, vec AS svec FROM v WHERE id < 8), " +
      "d AS (SELECT v.id, v.vec, sd.seed, " +
      "list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $Dim), j -> " +
      "(v.vec[j] - sd.svec[j]) * (v.vec[j] - sd.svec[j]))), (a, b) -> a + b) AS d2 " +
      "FROM v CROSS JOIN sd), " +
      "a AS (SELECT id, vec, seed, " +
      "row_number() OVER (PARTITION BY id ORDER BY d2, seed) AS rn FROM d) " +
      "SELECT seed AS cluster, i AS dim, " +
      "CAST(sum(CAST(floor(vec[i] * 1000000) AS BIGINT)) AS BIGINT) AS sum_q6, count(*) AS n " +
      s"FROM a CROSS JOIN generate_series(1, $Dim) g(i) WHERE rn = 1 " +
      "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_embed_centroids" -> (s"SELECT label, i AS dim, " +
      // outer CAST: DuckDB sum(BIGINT)→HUGEINT→pandas float64 hash artifact
      s"CAST(sum(CAST(floor($VDouble[i] * 1000000) AS BIGINT)) AS BIGINT) AS sum_q6, count(*) AS n " +
      s"FROM embeddings CROSS JOIN generate_series(1, $Dim) AS g(i) " +
      "GROUP BY 1, 2 ORDER BY 1, 2"),
    // identical affine chain: (x−lo)/(hi−lo)·256 floor-clamped, mid-rise
    // reconstruction, squared error — fixed-order correctly-rounded ops;
    // stats trained on the FULL corpus, output restricted to id < 100
    "q_embed_sq8" -> (s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      s"ex AS (SELECT id, i - 1 AS dim0, vec[i] AS x FROM v " +
      s"CROSS JOIN generate_series(1, $Dim) AS g(i)), " +
      "st AS (SELECT dim0, min(x) AS lo, max(x) AS hi FROM ex GROUP BY 1), " +
      "q1 AS (SELECT id, dim0, x, lo, hi, CASE WHEN hi = lo THEN 0 ELSE " +
      "least(greatest(CAST(floor((x - lo) / (hi - lo) * 256) AS BIGINT), 0), 255) END AS code " +
      "FROM ex JOIN st USING (dim0)) " +
      "SELECT id, dim0 + 1 AS dim, code, " +
      "CAST(floor(CASE WHEN hi = lo THEN 0.0 ELSE " +
      "(x - (lo + (CAST(code AS DOUBLE) + 0.5) * ((hi - lo) / 256))) * " +
      "(x - (lo + (CAST(code AS DOUBLE) + 0.5) * ((hi - lo) / 256))) END * 1e12) AS BIGINT) " +
      "AS err_q12 FROM q1 WHERE id < 100 ORDER BY id, dim"),
    // identical 32-bit-word Horner packing and bit_count(xor) distance —
    // integer ops end to end
    "q_embed_binary_hamming" -> (s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      s"bits AS (SELECT id, list_transform(generate_series(0, ${Dim / 32 - 1}), w -> " +
      "list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(31, 0, -1), " +
      s"j -> CASE WHEN w * 32 + j + 1 <= $Dim AND vec[w * 32 + j + 1] > 0.0 " +
      "THEN 1::BIGINT ELSE 0::BIGINT END)), (acc, b) -> acc * 2 + b)) AS bw FROM v), " +
      "scored AS (SELECT q.id AS query_id, c.id AS neighbor_id, " +
      s"list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, ${Dim / 32}), " +
      "i -> bit_count(xor(q.bw[i], c.bw[i]))::BIGINT)), (acc, v2) -> acc + v2) AS hamming " +
      "FROM bits q JOIN bits c ON q.id < 5 AND q.id != c.id) " +
      "SELECT query_id, neighbor_id, hamming, rank FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS rank FROM scored) " +
      "WHERE rank <= 10 ORDER BY query_id, rank"),
    // same fold-order cosine over the 16-dim prefix; overlap via an
    // integer count join of the two ranked sets
    "q_ann_matryoshka" -> {
      def dotN(a: String, b: String, n: Int) =
        s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, $n), " +
          s"i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
      def normN(a: String, n: Int) =
        s"sqrt(${s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, $n), " +
          s"i -> $a[i] * $a[i])), (acc, x) -> acc + x)"})"
      def cosN(a: String, b: String, n: Int) =
        s"${dotN(a, b, n)} / (${normN(a, n)} * ${normN(b, n)})"
      s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
        s"fullk AS (SELECT query_id, neighbor_id FROM (SELECT q.id AS query_id, c.id AS neighbor_id, " +
        s"row_number() OVER (PARTITION BY q.id ORDER BY ${cosN("q.vec", "c.vec", Dim)} DESC, c.id ASC) AS rank " +
        "FROM v q JOIN v c ON q.id < 5 AND q.id != c.id) WHERE rank <= 10), " +
        s"trk AS (SELECT query_id, neighbor_id FROM (SELECT q.id AS query_id, c.id AS neighbor_id, " +
        s"row_number() OVER (PARTITION BY q.id ORDER BY ${cosN("q.vec", "c.vec", 16)} DESC, c.id ASC) AS rank " +
        "FROM v q JOIN v c ON q.id < 5 AND q.id != c.id) WHERE rank <= 10), " +
        "ov AS (SELECT query_id, count(*) AS n_overlap FROM fullk JOIN trk " +
        "USING (query_id, neighbor_id) GROUP BY 1) " +
        "SELECT id AS query_id, coalesce(n_overlap, 0) AS n_overlap " +
        "FROM (SELECT id FROM v WHERE id < 5) LEFT JOIN ov ON id = query_id ORDER BY query_id"
    },
    // the shared BM25 chain + the cosine-topk chain, fused: per-system
    // floor(1e6/(60+rank)) contributions (integer rank, one IEEE division
    // each) summed as integers — rank-arithmetic only, no float ordering
    "q_hybrid_rrf" -> (s"WITH ${TextQueries.Bm25Ctes}, " +
      "bmr AS (SELECT doc_id, CAST(rank AS BIGINT) AS bm_rank FROM (" +
      "SELECT doc_id, row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS rank " +
      "FROM bmscore) WHERE rank <= 20), " +
      s"v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      s"scored AS (SELECT c.id AS neighbor_id, ${cosSql("q.vec", "c.vec")} AS cos " +
      "FROM v q JOIN v c ON q.id = 0 AND c.id != 0), " +
      "csr AS (SELECT neighbor_id AS doc_id, CAST(rank AS BIGINT) AS cos_rank FROM (" +
      "SELECT neighbor_id, row_number() OVER (ORDER BY cos DESC, neighbor_id ASC) AS rank " +
      "FROM scored) WHERE rank <= 20) " +
      "SELECT doc_id, bm_rank, cos_rank, " +
      "coalesce(CAST(floor(1000000.0 / (bm_rank + 60)) AS BIGINT), 0) + " +
      "coalesce(CAST(floor(1000000.0 / (cos_rank + 60)) AS BIGINT), 0) AS rrf_q6 " +
      "FROM bmr FULL JOIN csr USING (doc_id) ORDER BY rrf_q6 DESC, doc_id")
  )

  /** The 3-table Hamming-1 multi-probe ANN chain as SQL — shared verbatim
    * by `q_ann_lsh` and `q_ann_lsh_indexed` (identical results; the
    * engines differ only in whether the index frame is persisted).
    */
  private lazy val AnnLshSql: String = {
    val masks = (0L +: (0 until Planes).map(1L << _)).mkString(", ")
    val perTable = Tables3.zipWithIndex
      .map { case (w, t) => s"SELECT id, vec, $t AS t, ${bucketSql("vec", w)} AS bucket FROM v" }
      .mkString(" UNION ALL ")
    s"WITH v AS (SELECT vec_id AS id, $VDouble AS vec FROM embeddings), " +
      s"b AS ($perTable), " +
      s"qp AS (SELECT id, vec, t, xor(bucket, m) AS bucket FROM b, unnest([$masks]::BIGINT[]) AS u(m) WHERE id < 10), " +
      s"scored AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id, ${cosSql("q.vec", "c.vec")} AS cos " +
      "FROM qp q JOIN b c ON q.t = c.t AND q.bucket = c.bucket AND q.id != c.id) " +
      "SELECT query_id, neighbor_id, cos, rank FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored) " +
      "WHERE rank <= 5 ORDER BY query_id, rank"
  }
}
