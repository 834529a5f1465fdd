package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declared queries for the [[Graph]] operators, all over the SAME graph:
  * the mutual-kNN cosine graph of the `embeddings` table, built from
  * SIZED-LSH candidates — 3 independent hyperplane tables whose plane
  * count follows [[Similarity.planesForExact]] (target bucket 64), so the
  * candidate join stays corpus-LINEAR at any scale (the exact all-pairs
  * builder [[Graph.knnEdges]] is kept for tests and small ad-hoc corpora;
  * its ×10 ladder measured exact 190× / fixed-plane ~15× / sized 4.2×).
  *
  * Two design moves make the sized builder first-class rather than a
  * rows-only "production path" note:
  *
  *  1. **Self-sizing oracle.** The plane count is derived with INTEGER
  *     arithmetic from the corpus count on BOTH sides — the engine calls
  *     `planesForExact(count)`, the DuckDB oracle computes the same
  *     `min(p) WHERE 64·2^p ≥ count(*)` and gates each plane's sign bit on
  *     `p < np` (hyperplanes are tabulated per (seed, plane, dim), so the
  *     first np rows of the [[MaxPlanes]]-plane constant table ARE the
  *     np-plane table). One static SQL string therefore hash-checks the
  *     sized build at EVERY scale factor, up to the gate's corpus cap of
  *     64·2^[[MaxPlanes]] (≈ 4.2M vectors; the engine itself sizes past
  *     that unhindered — only the oracle stops there).
  *  2. **Session-memoized edge frames.** The candidate score frame is
  *     k-independent, so ONE materialized build ([[Memo]]) serves every
  *     neighborhood size the family reads (k=8 analytics, k=2 components,
  *     k=1 reciprocal-best, k=5 label votes) across all declared queries —
  *     Verify/Bench run each query as an independent closure, and without
  *     the memo each would rebuild the same edge frame (measured ~12
  *     rebuilds ≈ 35 s of a 346 s full bench).
  *
  * Scoring reuses the oracle-proven cosine machinery (`graft_cos` ≡ the
  * oracle's fold, bit-identical — verified exhaustively at sf0.01), and
  * candidates that ARE emitted carry exact cosine, so the edge set — and
  * everything downstream — hash-matches the oracle recomputing the same
  * buckets.
  */
object GraphQueries {

  /** Mutual-kNN neighborhood size. 8 keeps the graph non-degenerate at
    * every driver SF — small enough that the 4-core actually peels
    * instead of being a no-op.
    */
  private val K = 8

  /** The 4-core: the "deeply connected" shell — vertices in ≥4-way mutual
    * similarity neighborhoods, the dense-cluster candidates a diversity
    * pass would down-sample.
    */
  private val CoreK = 4

  /** Mutual-neighborhood size for the components/BFS/diameter queries:
    * k=2 keeps only each vector's two strongest reciprocated ties, so the
    * graph FRAGMENTS into micro-clusters (k=8 is one giant component at
    * every driver SF — a 1-row result checks the closure but shows
    * nothing).
    */
  private val ComponentsK = 2

  /** Oracle unroll depth for the k-core peel. The engine peels to an
    * exact fixpoint at ANY scale; the unrolled oracle is valid whenever
    * convergence takes ≤ this many rounds (re-checked by the tri-SF
    * sweeps on every surface change).
    */
  private val PeelRounds = 8

  /** Sizing target: mean LSH bucket occupancy the plane count holds. */
  private[graft] val TargetBucket = 64L

  /** Plane-constant depth of the self-sizing ORACLE (the engine sizes to
    * 62 planes regardless): the gated bucket SQL embeds this many planes
    * per table, so the oracle checks corpora up to 64·2^16 ≈ 4.2M vectors
    * — far past any sweep/driver SF.
    */
  private val MaxPlanes = 16

  /** Seeds of the 3 independent sized tables (shared with the historical
    * rows-only auto query, now hash-checked). */
  private val SeedNames = Seq("t0-plane", "t1-plane", "t2-plane")

  private def vecs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // graft_cos (idempotent)
    Tables
      .embeddings(s, dir)
      .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"))
  }

  /** The 3 sized plane tables for an n-vector corpus. */
  private[graft] def sizedTables(n: Long): Seq[Array[Array[Long]]] = {
    val np = Similarity.planesForExact(n, TargetBucket)
    SeedNames.map(Similarity.hyperplanes(np, 64, _))
  }

  /** Directed sized-LSH top-[[K]] neighbor lists (a, rank, b), built +
    * materialized ONCE per (session, dir) — every consumer reads k ≤ [[K]]
    * and TopKEdges's output is prefix-closed under its (cos DESC, b ASC)
    * total order, so the kNN frame at any k' is the rank ≤ k' filter of
    * this one. Round 13: the memo previously held the RAW candidate-score
    * half-pairs (k-independent but candidate-stream-sized — measured ×100
    * the 1.7 GB-shuffle checkpoint stage ran 76 s writing multi-GB blocks
    * under storage pressure); the ranked frame is |V|·K rows (~100×
    * smaller) and the top-k collapse now happens in the partial aggregate
    * BEFORE the exchange. One metadata-only count() sizes the tables.
    */
  private def directedTop(s: SparkSession, dir: String): DataFrame =
    Memo.cached(s, s"graph-knn-top|$dir") {
      val v = vecs(s, dir)
      Graph.knnFromCandidateScoresRanked(
        Graph.lshCandidateScores(v, sizedTables(v.count())), K)
    }

  /** Directed sized-LSH kNN edges at k ≤ [[K]] — a rank prefix of the
    * shared ranked frame (bit-identical to a direct k-build; GraphSpec
    * pins the prefix law).
    */
  private def directedK(s: SparkSession, dir: String, k: Int): DataFrame = {
    require(k <= K, s"directedK($k) exceeds the memoized rank depth $K")
    directedTop(s, dir).filter(col("rank") <= k).select(col("a"), col("b"))
  }

  /** Mutual sized-LSH kNN edge frame (lo, hi) at k — THE graph every
    * declared query consumes; materialized once per (session, dir, k). */
  private[graft] def mutualK(s: SparkSession, dir: String, k: Int): DataFrame =
    Memo.cached(s, s"graph-mutual-sized|$dir|$k") {
      Graph.mutualKnnFromDirected(directedK(s, dir, k))
    }

  private def graph(s: SparkSession, dir: String): DataFrame = mutualK(s, dir, K)

  /** The FIXED-plane (4-plane Tables3) mutual-8NN frame — the
    * fixed-constant twin of the sized build. NOT declared (round 13): its
    * plane constants are plan literals, so bucket volume grows
    * quadratically with the corpus (measured 1.9 GB spill at ×10) — a
    * known scale cliff that doesn't belong in the driver's bench surface.
    * It still pins the bucket/probe/rank machinery against plan-literal
    * tables, count-independently: GraphSpec digest-pins its sf0.001
    * output (1600 edges) so any drift in that machinery shows without the
    * sizing rule in the loop.
    */
  private[graft] def fixedMutual(s: SparkSession, dir: String): DataFrame =
    Memo.cached(s, s"graph-mutual-fixed|$dir") {
      Graph.mutualKnnEdgesLsh(vecs(s, dir), K, SimilarityQueries.Tables3)
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-vertex triangle participation + degree over the mutual-kNN
    // graph — the local-density signal (a vertex with high tri/deg sits
    // in a near-clique = near-dup neighborhood; tri = 0 at deg ≥ 2 is a
    // chain/star artifact). Degree-ordered orientation keeps the wedge
    // join O(|E|^1.5) at corpus scale.
    "q_graph_triangles" -> { (s, dir) =>
      Graph
        .triangleCounts(graph(s, dir))
        .orderBy("id")
    },

    // 4-core membership + in-core degree: the dense-shell extraction a
    // diversity filter peels before down-sampling over-represented
    // neighborhoods. Iterative peel, edge-count fixpoint.
    "q_graph_kcore" -> { (s, dir) =>
      Graph
        .kCore(graph(s, dir), CoreK)
        .orderBy("id")
    },

    // Label-homophily audit: per label, graph nodes + intra/cross edge
    // counts — "do labels cluster in embedding space?" read before
    // trusting labels for stratified splits. Integer counts, hash-exact.
    "q_graph_homophily" -> { (s, dir) =>
      Graph
        .labelHomophily(
          graph(s, dir),
          Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("label")))
        .orderBy("label")
    },

    // NEWMAN MODULARITY per label community over the mutual-kNN graph —
    // "do the labels carve the similarity graph into real communities?"
    // (the quantitative companion to q_graph_homophily's edge mixing):
    // per label c, q_term = e_c/m − (d_c/2m)², summing to Q. Everything
    // up to the last step is EXACT integers (m = |edges|, e_c = intra-
    // label edges, d_c = degree sum over the label's non-isolated
    // vertices); q_term is one fixed-order double expression, so the
    // 10-row result hash-checks. Scale: two label-keyed joins on the
    // memoized edge frame + label-sized aggregates; m rides a 1-row
    // broadcast (the q_rich_inactive scalar shape).
    "q_graph_modularity" -> { (s, dir) =>
      val lab = Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("label"))
      val e = graph(s, dir)
      val m = e.agg(count(lit(1)).as("m"))
      val deg = e.select(col("lo").as("id")).unionByName(e.select(col("hi").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val dc = deg.join(lab, Seq("id"))
        .groupBy("label")
        .agg(sum(col("d")).as("d_c"), count(lit(1)).as("n_nodes"))
      val ec = e
        .join(lab.select(col("id").as("lo"), col("label").as("ll")), Seq("lo"))
        .join(lab.select(col("id").as("hi"), col("label").as("lh")), Seq("hi"))
        .filter(col("ll") === col("lh"))
        .groupBy(col("ll").as("label"))
        .agg(count(lit(1)).as("e_c"))
      val md = col("m").cast("double")
      dc.join(ec, Seq("label"), "left")
        .crossJoin(broadcast(m))
        .select(col("label"), col("n_nodes"), col("d_c"),
          coalesce(col("e_c"), lit(0L)).as("e_c"),
          (coalesce(col("e_c"), lit(0L)).cast("double") / md -
            (col("d_c").cast("double") / (lit(2.0) * md)) *
              (col("d_c").cast("double") / (lit(2.0) * md))).as("q_term"))
        .orderBy("label")
    },

    // q_label_noise over the MUTUAL sized-LSH graph: the vote runs over
    // mutual-8NN ties (symmetrized) instead of q_label_noise's directed
    // 5-NN — the reciprocity-filtered variant (a one-sided "nearest"
    // vote from a hub vector carries no mutual tie and casts no ballot).
    // Rides the SAME memoized sized edge frame as the rest of the graph
    // family (round 13: this query previously consumed the fixed-plane
    // build, whose plan-literal plane constants make bucket volume
    // quadratic in corpus growth — that machinery pin now lives in
    // GraphSpec at sf0.001, out of the declared bench surface). Same
    // baseline-calibrated flag; isolated vertices simply emit no row.
    "q_label_noise_lsh" -> { (s, dir) =>
      val lab = Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("label"))
      val mutual = graph(s, dir)
      val directed = mutual.select(col("lo").as("a"), col("hi").as("b"))
        .unionByName(mutual.select(col("hi").as("a"), col("lo").as("b")))
      val perId = directed
        .join(lab.select(col("id").as("a"), col("label").as("la")), Seq("a"))
        .join(lab.select(col("id").as("b"), col("label").as("lb")), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(count(lit(1)).as("n_nbrs"),
          sum(when(col("la") =!= col("lb"), 1L).otherwise(0L)).as("n_diff"))
      val totals = perId.agg(sum(col("n_nbrs")).as("tot_nbrs"),
        sum(col("n_diff")).as("tot_diff"))
      perId
        .crossJoin(broadcast(totals))
        .select(col("id"), col("n_nbrs"), col("n_diff"),
          expr("n_diff * 1000000 div n_nbrs").as("noise_q6"),
          (col("n_diff") * col("tot_nbrs") > col("n_nbrs") * col("tot_diff"))
            .as("suspect"))
        .orderBy("id")
    },

    // Label-noise detection by LOCAL disagreement (confident-learning
    // lite): each vector's 5 nearest sized-LSH neighbors vote, and a
    // vector whose disagreement rate exceeds the CORPUS-WIDE baseline is
    // a mislabel/boundary suspect. The baseline calibration is what makes
    // the flag meaningful at any label/geometry alignment — an absolute
    // majority test saturates when labels correlate weakly with cosine
    // geometry (10 near-random labels ⇒ ~90% disagreement everywhere).
    // Cross-multiplied exact integers: n_diff·N_tot > n_nbrs·D_tot.
    // The local complement of q_embed_outliers' global centroid distance.
    "q_label_noise" -> { (s, dir) =>
      val lab = Tables.embeddings(s, dir).select(col("vec_id").as("id"), col("label"))
      val perId = directedK(s, dir, 5)
        .join(lab.select(col("id").as("a"), col("label").as("la")), Seq("a"))
        .join(lab.select(col("id").as("b"), col("label").as("lb")), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(count(lit(1)).as("n_nbrs"),
          sum(when(col("la") =!= col("lb"), 1L).otherwise(0L)).as("n_diff"))
      val totals = perId.agg(sum(col("n_nbrs")).as("tot_nbrs"),
        sum(col("n_diff")).as("tot_diff"))
      perId
        .crossJoin(broadcast(totals))
        .select(col("id"), col("n_nbrs"), col("n_diff"),
          expr("n_diff * 1000000 div n_nbrs").as("noise_q6"),
          (col("n_diff") * col("tot_nbrs") > col("n_nbrs") * col("tot_diff"))
            .as("suspect"))
        .orderBy("id")
    },

    // The SIZED production build itself, hash-checked end-to-end (this is
    // the frame every other graph query consumes): 3 LSH tables whose
    // plane count follows planesForExact(count) so within-bucket candidate
    // volume stays corpus-linear at ANY scale. The oracle re-derives the
    // plane count from its own count(*) with the same integer rule —
    // see the self-sizing chain in [[sizedKnnCtes]].
    "q_graph_mutual_lsh_auto" -> { (s, dir) =>
      graph(s, dir).orderBy("lo", "hi")
    },

    // Connected components of the mutual-kNN graph — embedding-space
    // CLUSTERS (the grouping SemDeDup's cells approximate). The k=2 graph
    // is chain-like (long thin micro-clusters), exactly the high-diameter
    // regime where min-label propagation pays one round per HOP and its
    // 30-round cap becomes a hard diameter bound (it throws rather than
    // return partial labels). The STAR-contraction variant converges in
    // O(log n) rounds at ANY diameter and cannot hit the round cap. Same
    // machinery as the doc dedup clusters (q_dup_clusters_star), same
    // recursive-CTE oracle shape.
    "q_graph_components" -> { (s, dir) =>
      Curation
        .connectedComponentsStar(mutualK(s, dir, ComponentsK), aCol = "lo", bCol = "hi")
        .groupBy(col("cluster").as("cluster_id"))
        .agg(
          count(lit(1)).as("n_nodes"),
          concat_ws("-",
            transform(sort_array(collect_list(col("doc"))), _.cast("string")))
            .as("members"))
        .orderBy("cluster_id")
    },

    // Link prediction ([[Graph.linkPredictionCore]]): the distance-2 pairs
    // the mutual-kNN builder did NOT connect, ranked by common-neighbor
    // count and the integer-exact resource-allocation index — the "missed
    // near-dup edge" audit. Support cut cn ≥ 2 bounds the output; the
    // wedge join is deg ≤ K bounded. Consumes the memoized edge frame
    // directly (already materialized — the Core form skips the redundant
    // checkpoint copy linkPrediction makes for un-materialized inputs).
    "q_link_prediction" -> { (s, dir) =>
      Graph
        .linkPredictionCore(graph(s, dir), minCommon = 2L)
        .orderBy("a", "b")
    },

    // Local clustering coefficient: 2·tri / (deg·(deg−1)) per vertex over
    // the mutual-8NN graph — cc → 1 marks near-clique (near-dup)
    // neighborhoods, cc → 0 at deg ≥ 2 marks hub/chain artifacts; the
    // per-vertex refinement of the q_graph_triangles density signal.
    // Integer q6 quotient (cross-multiplied, truncating), deg < 2 ⇒ 0.
    "q_clustering_coeff" -> { (s, dir) =>
      Graph
        .triangleCounts(graph(s, dir))
        .select(col("id"), col("deg"), col("tri"),
          when(col("deg") >= 2, expr("2 * tri * 1000000 DIV (deg * (deg - 1))"))
            .otherwise(0L).as("cc_q6"))
        .orderBy("id")
    },

    // Degree distribution of the mutual-8NN graph — the one-table summary
    // of graph shape (a near-dup-heavy corpus skews high, a diverse one
    // concentrates at low degree; deg ≤ K by construction bounds the
    // x-axis). Two aggregations, vertex- then degree-keyed.
    "q_degree_dist" -> { (s, dir) =>
      val e = graph(s, dir)
      e.select(col("lo").as("v"))
        .unionByName(e.select(col("hi").as("v")))
        .groupBy("v")
        .agg(count(lit(1)).as("deg"))
        .groupBy("deg")
        .agg(count(lit(1)).as("n_vertices"))
        .orderBy("deg")
    },

    // Reciprocal best match: each vector's SINGLE nearest neighbor, kept
    // only when reciprocated — the k=1 degenerate of the mutual-kNN
    // builder and the highest-precision near-dup candidate set a
    // similarity pipeline can emit without choosing a threshold (the
    // bioinformatics "reciprocal best hits" idiom).
    "q_mutual_nn" -> { (s, dir) =>
      mutualK(s, dir, 1).orderBy("lo", "hi")
    },

    // Multi-source BFS hop distance from anchor seeds (every 50th vec_id)
    // over the SPARSE mutual-2-NN graph (the fragmented q_graph_components
    // graph — the k=8 giant component would put everything at hop ≤ 3).
    // Frontier iteration: O(|E|) total edge expansions across all rounds,
    // rounds = seed eccentricity; the graph-expansion-sampling primitive
    // ("take everything within h hops of the audited exemplars").
    "q_graph_bfs" -> { (s, dir) =>
      val seeds = Tables
        .embeddings(s, dir)
        .filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("id"))
      Graph
        .bfsDistances(mutualK(s, dir, ComponentsK), seeds)
        .orderBy("id")
    },

    // Diameter lower bound by double-BFS sweep ([[Graph.diameterLowerBound]])
    // over the fragmented k=2 graph: BFS from the smallest edge endpoint,
    // re-BFS from its farthest vertex — two O(|E|) sweeps where all-pairs
    // is unthinkable at scale; exact on trees (and the k=2 micro-clusters
    // are chain-like). One tiny driver-side seed/argmax per sweep.
    "q_graph_diameter" -> { (s, dir) =>
      import s.implicits._
      val e = mutualK(s, dir, ComponentsK)
      val seed = e.agg(min(col("lo"))).as[Long].head()
      Graph.diameterLowerBound(e, seed)
    },

    // Degree assortativity of the mutual-kNN graph — "do well-connected
    // vectors attach to other well-connected vectors?" (r > 0 = dense
    // near-dup core, r < 0 = hub-and-spoke periphery — the one-number
    // summary of whether the similarity graph is clusterable at all).
    // Pearson r over the DIRECTED edge list of (deg src, deg dst) from
    // exact BIGINT sufficient statistics (the q_corr_stats pattern); by
    // symmetry Sx = Sy and Sxx = Syy, so r reduces to ONE double division
    // of two exact integers: (M·Sxy − Sx²)/(M·Sxx − Sx²). The edge frame
    // arrives memo-materialized (it feeds the degree agg AND both stat
    // joins); deg ≤ K bounds every product, so stats fit Long at any
    // corpus size.
    "q_graph_assortativity" -> { (s, dir) =>
      val edges = graph(s, dir)
      val directed = edges.select(col("lo").as("a"), col("hi").as("b"))
        .unionByName(edges.select(col("hi").as("a"), col("lo").as("b")))
      val deg = directed.groupBy(col("a").as("v")).agg(count(lit(1)).as("d"))
      directed
        .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
        .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
        .agg(count(lit(1)).as("m"),
          sum(col("da")).as("sx"),
          sum(col("da") * col("db")).as("sxy"),
          sum(col("da") * col("da")).as("sxx"))
        .select(col("m"), col("sx"), col("sxy"), col("sxx"),
          ((col("m") * col("sxy") - col("sx") * col("sx")).cast("double") /
            (col("m") * col("sxx") - col("sx") * col("sx")).cast("double"))
            .as("assortativity"))
    }
  )

  /** Plane-constant tables for the self-sizing oracle: [[MaxPlanes]] planes
    * per seed — hyperplanes are tabulated per (seed, plane, dim), so the
    * first np rows ARE the np-plane table the engine builds (prefix
    * property; pinned in GraphSpec).
    */
  private lazy val SizedW: Seq[Array[Array[Long]]] =
    SeedNames.map(Similarity.hyperplanes(MaxPlanes, 64, _))

  /** The gated bucket expression: plane p contributes its sign bit only
    * when `p < np` (np = the self-sized plane count, in scope from the
    * chain's `np` CTE) — the SQL twin of the engine hashing with
    * hyperplanes(np). Same per-plane dot (left-to-right double sum) and
    * the same `> 0` sign test as [[SimilarityQueries.bucketSql]].
    */
  private def gatedBucketSql(v: String, planes: Array[Array[Long]]): String =
    planes.zipWithIndex
      .map { case (w, p) =>
        val d = w.zipWithIndex.map { case (wi, i) => s"$v[${i + 1}] * ($wi)" }.mkString(" + ")
        s"(CASE WHEN $p < np AND $d > 0 THEN ${1L << p} ELSE 0 END)"
      }
      .mkString(" + ")

  /** Self-sizing LSH kNN oracle chain, ending in `knn` (directed rank ≤ k)
    * and `mutual` (canonical lo < hi) — mirrors [[Graph.lshCandidateScores]]
    * + [[Graph.knnFromCandidateScores]] + the mutual self-join over the
    * SIZED tables:
    *  - `np` re-derives the plane count from count(*) with the identical
    *    integer rule as [[Similarity.planesForExact]] (smallest p in
    *    [1, MaxPlanes] with 64·2^p ≥ n; an over-cap corpus yields NULL and
    *    fails LOUDLY rather than checking the wrong graph);
    *  - buckets gate each embedded plane constant on p < np;
    *  - the probe ring is Hamming-1 over the np live bits (masks 0,
    *    2^0..2^(np-1)), from the smaller-id side only;
    *  - exact cosine on candidates, DISTINCT before ranking (multi-table
    *    dups carry bit-identical cos ≡ the engine's dense-rank dedup),
    *    NaN dropped before ranking, (cos DESC, b ASC) row_number ≤ k,
    *    then the mutual self-join.
    * `b`, `cand`, `knn`, `mutual` are MATERIALIZED — each is referenced
    * more than once downstream and DuckDB's CTE inlining would re-run the
    * bucket scan per reference (exponentially so through the unrolled
    * peel chain).
    */
  private def sizedKnnCtes(k: Int): String = {
    val perTable = SizedW.zipWithIndex
      .map { case (w, t) =>
        s"SELECT id, vec, $t AS t, ${gatedBucketSql("vec", w)} AS bucket FROM v, np"
      }
      .mkString(" UNION ALL ")
    "cnt AS (SELECT count(*) AS n FROM embeddings), " +
      s"np AS (SELECT min(p) AS np FROM generate_series(1, $MaxPlanes) gs(p), cnt " +
      s"WHERE $TargetBucket * (1::BIGINT << p) >= n), " +
      "v AS (SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS vec " +
      "FROM embeddings), " +
      s"b AS MATERIALIZED ($perTable), " +
      "p AS (SELECT id, vec, t, " +
      "xor(bucket, CASE WHEN g = 0 THEN 0::BIGINT ELSE 1::BIGINT << (g - 1) END) AS bucket " +
      s"FROM b, np, generate_series(0, $MaxPlanes) gg(g) WHERE g = 0 OR g <= np), " +
      "cand AS MATERIALIZED (SELECT DISTINCT p.id AS a, c.id AS b, " +
      s"${SimilarityQueries.cosSql("p.vec", "c.vec")} AS cos " +
      "FROM p JOIN b c ON p.t = c.t AND p.bucket = c.bucket AND p.id < c.id), " +
      "sym AS (SELECT a, b, cos FROM cand " +
      "UNION ALL SELECT b AS a, a AS b, cos FROM cand), " +
      "knn AS MATERIALIZED (SELECT a, b FROM (SELECT a, b, row_number() OVER " +
      s"(PARTITION BY a ORDER BY cos DESC, b ASC) AS rn FROM sym " +
      s"WHERE NOT isnan(cos)) WHERE rn <= $k), " +
      "mutual AS MATERIALIZED (SELECT x.a AS lo, x.b AS hi FROM knn x " +
      "JOIN knn y ON x.a = y.b AND x.b = y.a WHERE x.a < x.b)"
  }

  /** The k=[[K]] chain every analytics oracle shares. */
  private lazy val KnnCtes = sizedKnnCtes(K)

  /** One peel round: degrees of e{i-1}, then keep edges whose both
    * endpoints have degree ≥ k. Mirrors one engine iteration exactly.
    * Every round CTE is MATERIALIZED — each is referenced 2-3 times by
    * the next, so inlining would blow up 2^rounds.
    */
  private def peelRound(i: Int): String =
    s"d$i AS MATERIALIZED (SELECT v, count(*) AS d FROM (SELECT lo AS v FROM e${i - 1} " +
      s"UNION ALL SELECT hi FROM e${i - 1}) GROUP BY 1), " +
      s"e$i AS MATERIALIZED (SELECT lo, hi FROM e${i - 1} JOIN d$i x ON x.v = lo " +
      s"JOIN d$i y ON y.v = hi WHERE x.d >= $CoreK AND y.d >= $CoreK)"

  def oracleSql: Map[String, String] = Map(
    // id-ordered triple join (correctness-equivalent to the engine's
    // degree orientation: both count each triangle exactly once)
    "q_graph_triangles" -> (s"WITH $KnnCtes, " +
      "deg AS (SELECT v, count(*) AS deg FROM (SELECT lo AS v FROM mutual " +
      "UNION ALL SELECT hi FROM mutual) GROUP BY 1), " +
      "tri AS (SELECT p1.lo AS x, p1.hi AS y, p2.hi AS z FROM mutual p1 " +
      "JOIN mutual p2 ON p1.hi = p2.lo JOIN mutual p3 ON p3.lo = p1.lo AND p3.hi = p2.hi), " +
      "pv AS (SELECT v, count(*) AS tri FROM (SELECT x AS v FROM tri " +
      "UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) GROUP BY 1) " +
      "SELECT deg.v AS id, deg.deg, coalesce(pv.tri, 0) AS tri " +
      "FROM deg LEFT JOIN pv USING (v) ORDER BY id"),
    // the engine peels to fixpoint; the oracle unrolls PeelRounds rounds
    // (strictly more than the measured rounds at the driver SFs — extra
    // rounds past the fixpoint are no-ops)
    "q_graph_kcore" -> (s"WITH $KnnCtes, e0 AS MATERIALIZED (SELECT lo, hi FROM mutual), " +
      (1 to PeelRounds).map(peelRound).mkString(", ") + " " +
      s"SELECT v AS id, count(*) AS core_deg FROM (SELECT lo AS v FROM e$PeelRounds " +
      s"UNION ALL SELECT hi FROM e$PeelRounds) GROUP BY 1 ORDER BY id"),
    // the sized mutual frame symmetrized, then the same rollup
    "q_label_noise_lsh" -> (s"WITH $KnnCtes, " +
      "lab AS (SELECT vec_id AS id, label FROM embeddings), " +
      "dedges AS (SELECT lo AS a, hi AS b FROM mutual " +
      "UNION ALL SELECT hi, lo FROM mutual), " +
      "d AS (SELECT k.a AS id, CASE WHEN la.label != lb.label THEN 1 ELSE 0 END AS diff " +
      "FROM dedges k JOIN lab la ON k.a = la.id JOIN lab lb ON k.b = lb.id), " +
      "per AS (SELECT id, count(*) AS n_nbrs, CAST(sum(diff) AS BIGINT) AS n_diff " +
      "FROM d GROUP BY 1), " +
      "tot AS (SELECT CAST(sum(n_nbrs) AS BIGINT) AS tn, " +
      "CAST(sum(n_diff) AS BIGINT) AS td FROM per) " +
      "SELECT id, n_nbrs, n_diff, n_diff * 1000000 // n_nbrs AS noise_q6, " +
      "n_diff * tn > n_nbrs * td AS suspect " +
      "FROM per, tot ORDER BY 1"),
    // sizedKnnCtes(5) gives the directed sized 5-NN frame; labels join
    // per side
    "q_label_noise" -> (s"WITH ${sizedKnnCtes(5)}, " +
      "lab AS (SELECT vec_id AS id, label FROM embeddings), " +
      "d AS (SELECT k.a AS id, CASE WHEN la.label != lb.label THEN 1 ELSE 0 END AS diff " +
      "FROM knn k JOIN lab la ON k.a = la.id JOIN lab lb ON k.b = lb.id), " +
      "per AS (SELECT id, count(*) AS n_nbrs, CAST(sum(diff) AS BIGINT) AS n_diff " +
      "FROM d GROUP BY 1), " +
      "tot AS (SELECT CAST(sum(n_nbrs) AS BIGINT) AS tn, " +
      "CAST(sum(n_diff) AS BIGINT) AS td FROM per) " +
      "SELECT id, n_nbrs, n_diff, n_diff * 1000000 // n_nbrs AS noise_q6, " +
      "n_diff * tn > n_nbrs * td AS suspect " +
      "FROM per, tot ORDER BY 1"),
    // same mutual frame; exact m/d_c/e_c integers, the identical
    // fixed-order q_term expression
    "q_graph_modularity" -> (s"WITH $KnnCtes, " +
      "mm AS (SELECT count(*) AS m FROM mutual), " +
      "deg AS (SELECT id, count(*) AS d FROM (SELECT lo AS id FROM mutual " +
      "UNION ALL SELECT hi FROM mutual) GROUP BY 1), " +
      "dc AS (SELECT e.label, CAST(sum(d) AS BIGINT) AS d_c, count(*) AS n_nodes " +
      "FROM deg JOIN embeddings e ON e.vec_id = deg.id GROUP BY 1), " +
      "ec AS (SELECT a.label, count(*) AS e_c FROM mutual t " +
      "JOIN embeddings a ON a.vec_id = t.lo JOIN embeddings b ON b.vec_id = t.hi " +
      "WHERE a.label = b.label GROUP BY 1) " +
      "SELECT dc.label, n_nodes, d_c, coalesce(e_c, 0) AS e_c, " +
      "coalesce(e_c, 0)::DOUBLE / m::DOUBLE - " +
      "(d_c::DOUBLE / (2.0 * m::DOUBLE)) * (d_c::DOUBLE / (2.0 * m::DOUBLE)) AS q_term " +
      "FROM dc LEFT JOIN ec USING (label) CROSS JOIN mm ORDER BY dc.label"),
    "q_graph_homophily" -> (s"WITH $KnnCtes, " +
      "lab AS (SELECT m.lo, m.hi, a.label AS la, b.label AS lb FROM mutual m " +
      "JOIN embeddings a ON a.vec_id = m.lo JOIN embeddings b ON b.vec_id = m.hi), " +
      "verts AS (SELECT DISTINCT v FROM (SELECT lo AS v FROM mutual " +
      "UNION ALL SELECT hi FROM mutual)), " +
      "nodes AS (SELECT e.label, count(*) AS n_nodes FROM embeddings e " +
      "JOIN verts ON verts.v = e.vec_id GROUP BY 1), " +
      "intra AS (SELECT la AS label, count(*) AS intra_edges FROM lab WHERE la = lb GROUP BY 1), " +
      "crossx AS (SELECT label, count(*) AS cross_edges FROM " +
      "(SELECT la AS label FROM lab WHERE la != lb " +
      "UNION ALL SELECT lb FROM lab WHERE la != lb) GROUP BY 1) " +
      "SELECT nodes.label, n_nodes, coalesce(intra_edges, 0) AS intra_edges, " +
      "coalesce(cross_edges, 0) AS cross_edges FROM nodes " +
      "LEFT JOIN intra USING (label) LEFT JOIN crossx USING (label) ORDER BY label"),
    // the SIZED chain's mutual frame itself — the self-sizing oracle
    // re-derives np from count(*), so this one static string hash-checks
    // the production builder at every sweep SF
    "q_graph_mutual_lsh_auto" -> (s"WITH $KnnCtes SELECT lo, hi FROM mutual ORDER BY lo, hi"),
    "q_mutual_nn" -> (s"WITH ${sizedKnnCtes(1)} SELECT lo, hi FROM mutual ORDER BY lo, hi"),
    // triangle oracle + the q6 quotient; deg < 2 pinned to 0
    "q_clustering_coeff" -> (s"WITH $KnnCtes, " +
      "deg AS (SELECT v, count(*) AS deg FROM (SELECT lo AS v FROM mutual " +
      "UNION ALL SELECT hi FROM mutual) GROUP BY 1), " +
      "tri AS (SELECT p1.lo AS x, p1.hi AS y, p2.hi AS z FROM mutual p1 " +
      "JOIN mutual p2 ON p1.hi = p2.lo JOIN mutual p3 ON p3.lo = p1.lo AND p3.hi = p2.hi), " +
      "pv AS (SELECT v, count(*) AS tri FROM (SELECT x AS v FROM tri " +
      "UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) GROUP BY 1) " +
      "SELECT deg.v AS id, deg.deg, coalesce(pv.tri, 0) AS tri, " +
      "CASE WHEN deg.deg >= 2 THEN 2 * coalesce(pv.tri, 0) * 1000000 " +
      "// (deg.deg * (deg.deg - 1)) ELSE 0 END AS cc_q6 " +
      "FROM deg LEFT JOIN pv USING (v) ORDER BY id"),
    "q_degree_dist" -> (s"WITH $KnnCtes, " +
      "deg AS (SELECT v, count(*) AS deg FROM (SELECT lo AS v FROM mutual " +
      "UNION ALL SELECT hi FROM mutual) GROUP BY 1) " +
      "SELECT deg, count(*) AS n_vertices FROM deg GROUP BY 1 ORDER BY 1"),
    // two depth-bounded recursive walks; u = argmax(dist, min id) of the
    // first, the bound = the second's max distance (same tiebreak)
    "q_graph_diameter" -> (s"WITH RECURSIVE ${sizedKnnCtes(ComponentsK)}, " +
      "gedges AS (SELECT lo AS v, hi AS w FROM mutual " +
      "UNION ALL SELECT hi AS v, lo AS w FROM mutual), " +
      "sdt AS (SELECT min(lo) AS sv FROM mutual), " +
      "walk1(v, d) AS (SELECT sv, 0 FROM sdt " +
      "UNION SELECT e.w, walk1.d + 1 FROM gedges e JOIN walk1 ON e.v = walk1.v " +
      "WHERE walk1.d < 64), " +
      "dd1 AS (SELECT v, min(d) AS d FROM walk1 GROUP BY 1), " +
      "uu AS (SELECT v AS uv FROM dd1 ORDER BY d DESC, v ASC LIMIT 1), " +
      "walk2(v, d) AS (SELECT uv, 0 FROM uu " +
      "UNION SELECT e.w, walk2.d + 1 FROM gedges e JOIN walk2 ON e.v = walk2.v " +
      "WHERE walk2.d < 64), " +
      "dd2 AS (SELECT v, min(d) AS d FROM walk2 GROUP BY 1), " +
      "vv AS (SELECT v AS fv, d AS fd FROM dd2 ORDER BY d DESC, v ASC LIMIT 1) " +
      "SELECT sdt.sv AS seed, uu.uv AS u, vv.fv AS v, CAST(vv.fd AS BIGINT) AS diameter_lb " +
      "FROM sdt, uu, vv"),
    // breadth-first walk as a depth-bounded recursive CTE over the same
    // k=2 mutual edge set; UNION (distinct) dedups (v, d) pairs and the
    // d < 64 bound guarantees termination (the engine iterates to frontier
    // exhaustion — 64 strictly dominates the measured seed eccentricity at
    // every driver SF); min(d) per vertex is the BFS distance
    "q_graph_bfs" -> (s"WITH RECURSIVE ${sizedKnnCtes(ComponentsK)}, " +
      "gedges AS (SELECT lo AS v, hi AS w FROM mutual " +
      "UNION ALL SELECT hi AS v, lo AS w FROM mutual), " +
      "walk(v, d) AS (SELECT vec_id AS v, 0 AS d FROM embeddings WHERE vec_id % 50 = 0 " +
      "UNION SELECT e.w, walk.d + 1 FROM gedges e JOIN walk ON e.v = walk.v " +
      "WHERE walk.d < 64) " +
      "SELECT v AS id, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY v ORDER BY id"),
    // transitive closure over the SAME mutual edge set the other graph
    // oracles read (the q_dup_clusters recursive shape on the kNN graph)
    "q_graph_components" -> (s"WITH RECURSIVE ${sizedKnnCtes(ComponentsK)}, " +
      "gedges AS (SELECT lo AS src, hi AS dst FROM mutual " +
      "UNION SELECT hi AS src, lo AS dst FROM mutual), " +
      "reach(v, r) AS (SELECT src AS v, src AS r FROM gedges " +
      "UNION SELECT e.dst AS v, reach.r FROM gedges e JOIN reach ON e.src = reach.v), " +
      "glabels AS (SELECT v AS id, min(r) AS cluster FROM reach GROUP BY v) " +
      "SELECT cluster AS cluster_id, count(*) AS n_nodes, " +
      "string_agg(id::VARCHAR, '-' ORDER BY id) AS members " +
      "FROM glabels GROUP BY 1 ORDER BY 1"),
    // same directed edge list + degree join; r is one double division of
    // two exact BIGINT moment combinations (Sx=Sy, Sxx=Syy by symmetry)
    "q_graph_assortativity" -> (s"WITH $KnnCtes, " +
      "adj AS (SELECT lo AS a, hi AS b FROM mutual " +
      "UNION ALL SELECT hi AS a, lo AS b FROM mutual), " +
      "deg AS (SELECT a AS v, count(*) AS d FROM adj GROUP BY 1), " +
      "st AS (SELECT count(*) AS m, CAST(sum(x.d) AS BIGINT) AS sx, " +
      "CAST(sum(x.d * y.d) AS BIGINT) AS sxy, " +
      "CAST(sum(x.d * x.d) AS BIGINT) AS sxx " +
      "FROM adj JOIN deg x ON adj.a = x.v JOIN deg y ON adj.b = y.v) " +
      "SELECT m, sx, sxy, sxx, " +
      "CAST(m * sxy - sx * sx AS DOUBLE) / CAST(m * sxx - sx * sx AS DOUBLE) " +
      "AS assortativity FROM st"),
    // wedge join on the symmetric adjacency, per-neighbor 1000000 // deg
    // terms (≡ Spark DIV on the non-negative degrees), NOT EXISTS drops
    // already-connected pairs — the engine's left_anti
    "q_link_prediction" -> (s"WITH $KnnCtes, " +
      "adj AS (SELECT lo AS v, hi AS w FROM mutual " +
      "UNION ALL SELECT hi AS v, lo AS w FROM mutual), " +
      "deg AS (SELECT v, count(*) AS d FROM adj GROUP BY 1), " +
      "wed AS (SELECT x.v AS a, y.w AS b, x.w AS z FROM adj x " +
      "JOIN adj y ON x.w = y.v AND x.v < y.w), " +
      "sc AS (SELECT a, b, count(*) AS cn, " +
      "CAST(sum(1000000 // d) AS BIGINT) AS ra_q6 " +
      "FROM wed JOIN deg ON wed.z = deg.v GROUP BY 1, 2) " +
      "SELECT a, b, cn, ra_q6 FROM sc WHERE cn >= 2 " +
      "AND NOT EXISTS (SELECT 1 FROM mutual WHERE lo = a AND hi = b) " +
      "ORDER BY a, b")
  )

}
