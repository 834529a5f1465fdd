package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Curation, Dedup, DedupQueries, Graph, GraphQueries, Memo, Similarity}

/** Round-12 operator laws: the sized-LSH graph builder's integer sizing
  * rule, the hyperplane prefix property the self-sizing oracle relies on,
  * the session memo's identity/reuse contracts, and the
  * candidate-pairs-then-filter ≡ at-threshold-build equivalence the shared
  * near-dup frame rests on.
  */
class Round12Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("planesForExact: boundary law and agreement with the float form") {
    // law: p is the SMALLEST exponent with 64·2^p ≥ n (p ≥ 1)
    for (n <- Seq(1L, 2L, 63L, 64L, 65L, 128L, 129L, 500L, 2000L, 20000L,
        200000L, 1L << 22, (1L << 22) + 1, 1000000007L)) {
      val p = Similarity.planesForExact(n, 64)
      assert(64L * (1L << p) >= n, s"n=$n p=$p must cover")
      assert(p == 1 || 64L * (1L << (p - 1)) < n, s"n=$n p=$p must be minimal")
    }
    // agreement with the float-log form everywhere it is well-behaved
    for (n <- 1L to 300000L by 997L)
      assert(Similarity.planesForExact(n) == Similarity.planesFor(n), s"n=$n")
    // target sizing: mean bucket occupancy n / 2^p stays ≤ target
    for (n <- Seq(500L, 2000L, 20000L, 200000L)) {
      val p = Similarity.planesForExact(n, 64)
      assert(n.toDouble / (1L << p) <= 64.0, s"n=$n occupancy")
    }
  }

  test("hyperplanes prefix property: plane p depends only on (seed, p, dim)") {
    // the self-sizing oracle embeds MaxPlanes plane constants and gates on
    // p < np — valid ONLY if the np-plane table is a prefix of the larger
    for (seed <- Seq("t0-plane", "t1-plane", "t2-plane", "plane")) {
      val big = Similarity.hyperplanes(16, 64, seed)
      for (k <- Seq(1, 3, 5, 9)) {
        val small = Similarity.hyperplanes(k, 64, seed)
        assert(small.toSeq.map(_.toSeq) == big.take(k).toSeq.map(_.toSeq),
          s"seed=$seed k=$k")
      }
    }
  }

  test("knnEdgesLsh ≡ rank over the exposed candidate stage; mutual frame via memo") {
    graft.functions.GraftFunctions.register(spark)
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"))
    val tables = GraphQueries.sizedTables(v.count())
    val direct = Graph.knnEdgesLsh(v, 4, tables)
      .as[(Long, Long)].collect().toSet
    val staged = Graph.knnFromCandidateScores(Graph.lshCandidateScores(v, tables), 4)
      .as[(Long, Long)].collect().toSet
    assert(direct == staged)
    // the memoized mutual frame equals mutualizing the directed stage
    val viaMemo = GraphQueries.mutualK(spark, dir, 4).as[(Long, Long)].collect().toSet
    val manual = Graph.mutualKnnFromDirected(
      Graph.knnFromCandidateScores(Graph.lshCandidateScores(v, tables), 4)
        .localCheckpoint())
      .as[(Long, Long)].collect().toSet
    assert(viaMemo == manual)
    manual.foreach { case (lo, hi) => assert(lo < hi, "canonical edge order") }
  }

  test("Memo.cached: one build per (session, key); distinct keys stay distinct") {
    var builds = 0
    def build() = { builds += 1; Seq((1L, 2L)).toDF("a", "b") }
    val k = s"round12-memo-${System.nanoTime}"
    val f1 = Memo.cached(spark, k)(build())
    val f2 = Memo.cached(spark, k)(build())
    assert(builds == 1, "second call must reuse the materialized frame")
    assert(f1 eq f2, "same key returns the same frame instance")
    val f3 = Memo.cached(spark, s"$k|other")(build())
    assert(builds == 2 && !(f3 eq f1))
  }

  test("candidate pairs filtered at threshold ≡ at-threshold jaccardPairs build") {
    // the law the shared near-dup frame rests on: jaccardPairs' threshold
    // is a pure output filter on the IEEE quotient
    val d = Tables.documents(spark, dir)
    val fromCand = DedupQueries.candidateJaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.8)
      .select(col("a"), col("b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    val direct = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8,
      maxDf = DedupQueries.MaxDf)
      .as[(Long, Long, Double)].collect().toSet
    assert(fromCand == direct)
  }

  test("splitAssignLeakageSafeFromClusters ≡ splitAssignLeakageSafe") {
    val d = Tables.documents(spark, dir)
    val pairs = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8,
      maxDf = DedupQueries.MaxDf).localCheckpoint()
    val a = Curation
      .splitAssignLeakageSafe(d, "doc_id", pairs, "s42", 9000, 9500)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toSet
    val b = Curation
      .splitAssignLeakageSafeFromClusters(d, "doc_id",
        Curation.connectedComponents(pairs), "s42", 9000, 9500)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("snapshotDiff: a one-sided NULL value is 'changed', not 'unchanged'") {
    val oldS = Seq((1L, Some(10L)), (2L, None: Option[Long]), (3L, Some(3L)))
      .toDF("k", "v")
    val newS = Seq((1L, None: Option[Long]), (2L, None: Option[Long]), (3L, Some(3L)))
      .toDF("k", "v")
    val got = graft.ext.Relational.snapshotDiff(oldS, newS, "k", "v")
      .select(col("key"), col("change")).as[(Long, String)].collect().toMap
    assert(got(1L) == "changed", "value -> NULL must be a change")
    assert(got(2L) == "unchanged", "NULL on both sides is unchanged")
    assert(got(3L) == "unchanged")
  }

  test("contaminationByEmbedding: a zero-norm probe cannot poison the scan") {
    graft.functions.GraftFunctions.register(spark)
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)), (3L, Seq(-1.0, 0.0)))
      .toDF("id", "vec")
    val probes = Seq(
      (10L, Seq(0.0, 0.0)), // zero-norm: NaN cosine against everything
      (11L, Seq(1.0, 0.0)))
    val got = Similarity.contaminationByEmbedding(corpus, probes, threshold = 0.9)
      .select(col("id"), col("probe_id")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 11L)), "only the valid probe flags, nothing NaN-dropped")
  }
}
