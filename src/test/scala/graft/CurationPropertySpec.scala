package graft

import graft.ext.Curation
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks for the curation invariants over generated inputs —
  * covering shapes the fixtures don't reach (empty strata, zero-cost
  * docs, graphs with cycles/self-contained cliques, adversarial weight
  * values near integer boundaries).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).map { _ =>
      val a = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      a
    }
  }

  test("splitAssign: partition property — every doc gets exactly one split") {
    val d = (0L until 2000L).toDF("id")
    val s = Curation.splitAssign(d, "id", "p", 8000, 9000)
    // no doc lost, none duplicated, every label valid
    assert(s.count() == 2000)
    assert(s.select("id").distinct().count() == 2000)
    val labels = s.select("split").distinct().as[String].collect().toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
  }

  test("packBins: cost conservation and bin-capacity invariants on generated streams") {
    val costGen = Gen.choose(0L, 900L)
    val streamGen: Gen[List[Long]] = Gen.choose(1, 30).flatMap(Gen.listOfN(_, costGen))
    samples(streamGen, 8, 99L).zipWithIndex.foreach { case (costs, si) =>
      val rows = costs.zipWithIndex.map { case (c, i) => (i.toLong, s"s$si", c) }
      val d = rows.toDF("id", "stream", "cost")
      val packed = Curation.packBins(d, "id", "cost", "stream", budget = 1000L)
        .select($"id", $"cost", $"bin", $"bin_offset")
        .as[(Long, Long, Long, Long)]
        .collect()
        .sortBy(_._1)
      // invariant 1: offsets reproduce the running prefix sum exactly
      var prefix = 0L
      packed.foreach { case (_, c, bin, off) =>
        assert(bin == prefix / 1000 && off == prefix % 1000,
          s"doc at prefix $prefix placed at (bin=$bin, off=$off)")
        prefix += c
      }
      // invariant 2: bins are a non-decreasing sequence (stream order)
      assert(packed.map(_._3).toSeq == packed.map(_._3).toSeq.sorted)
    }
  }

  test("packBinsTwoPass ≡ packBins for any monotone chunking (parallel prefix law)") {
    val costGen = Gen.choose(0L, 900L)
    val streamGen: Gen[List[Long]] = Gen.choose(1, 40).flatMap(Gen.listOfN(_, costGen))
    samples(streamGen, 6, 321L).zipWithIndex.foreach { case (costs, si) =>
      val rows = costs.zipWithIndex.map { case (c, i) => (i.toLong, s"s$si", c) }
      // sparse ids too: the chunk map must not assume dense ids
      val sparse = rows.map { case (id, s, c) => (id * 7 + 3, s, c) }
      (rows ++ sparse.map { case (id, s, c) => (id, s + "x", c) }).toDF("id", "stream", "cost")
        .createOrReplaceTempView("pb_in")
      val d = spark.table("pb_in")
      val one = Curation.packBins(d, "id", "cost", "stream", budget = 1000L)
        .select($"id", $"stream", $"bin", $"bin_offset")
        .as[(Long, String, Long, Long)].collect().sortBy(r => (r._2, r._1))
      // chunk width 4: several chunks per stream, some single-row, some empty
      val two = Curation.packBinsTwoPass(d, "id", "cost", "stream", budget = 1000L,
        chunkCol = floor($"id" / 4))
        .select($"id", $"stream", $"bin", $"bin_offset")
        .as[(Long, String, Long, Long)].collect().sortBy(r => (r._2, r._1))
      assert(two.toSeq == one.toSeq, s"two-pass diverged for stream s$si")
    }
  }

  test("packBinsTwoPass: local prefix windows partition by (stream, chunk)") {
    val d = (0L until 400L).map(i => (i, s"s${i % 2}", i % 7)).toDF("id", "stream", "cost")
    val plan = Curation.packBinsTwoPass(d, "id", "cost", "stream", 100L, floor($"id" / 16))
      .queryExecution.executedPlan.toString
    // the row-level sort must be per-(stream, chunk) — that's the whole
    // decomposition: no window in the plan may sort a whole stream's rows
    val rowWindows = plan.linesIterator.filter(l =>
      l.contains("Window") && l.contains("id#")).toSeq
    assert(rowWindows.exists(l => l.contains("_chunk")),
      s"row-level window must include the chunk key:\n$plan")
  }

  test("connectedComponents ≡ driver-side union-find over generated graphs") {
    val edgeGen = for {
      a <- Gen.choose(0L, 14L)
      b <- Gen.choose(0L, 14L)
      if a != b
    } yield (math.min(a, b), math.max(a, b))
    val graphGen: Gen[List[(Long, Long)]] =
      Gen.choose(1, 18).flatMap(Gen.listOfN(_, edgeGen))
    samples(graphGen, 10, 4242L).foreach { edges =>
      // reference: classic union-find with path compression
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // normalize: label every vertex by the minimum of its component
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = verts.groupBy(find)
      val expected = byRoot.values.flatMap(vs => vs.map(_ -> vs.min)).toMap

      val got = Curation.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"edges=$edges")

      // the O(log n) star variant must agree with BOTH oracles
      val star = Curation.connectedComponentsStar(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(star == expected, s"star variant diverged: edges=$edges")
    }
  }

  test("connectedComponentsStar: worst-case diameter (path graph) in O(log n) rounds") {
    // a 1000-vertex path is the propagation algorithm's nightmare:
    // diameter 999 ⇒ ~999 rounds of min-label propagation. The star
    // alternation folds chains in half every round.
    val n = 1000L
    val path = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Curation.connectedComponentsStarCore(path, "a", "b", maxIter = 50)
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == n)
    assert(got.forall(_._2 == 0L), "one component, labeled by its minimum")
    info(s"1000-vertex path converged in $rounds large+small rounds")
    assert(rounds <= 12, s"star alternation must be O(log n): took $rounds rounds")
  }

  test("iterative CC releases each dead round's checkpoint (bounded persistent RDDs)") {
    // a 16-vertex path forces ≥15 propagation rounds and ≥4 star rounds;
    // without the per-round release every round strands one dead
    // localCheckpoint in executor storage until driver GC notices
    val path = (0L until 15L).map(i => (i, i + 1)).toDF("a", "b")
    def persisted(): Int = spark.sparkContext.getPersistentRDDs.size
    val before = persisted()
    val prop = Curation.connectedComponents(path, maxIter = 30)
      .as[(Long, Long)].collect().toMap
    // survivors: the returned frame's final checkpoint only — NOT one per round
    val afterProp = persisted()
    assert(afterProp - before <= 1,
      s"propagation leaked round checkpoints: $before -> $afterProp")
    assert(prop.size == 16 && prop.values.forall(_ == 0L))
    val (starLabels, rounds) = Curation.connectedComponentsStarCore(path, "a", "b", 50)
    val star = starLabels.as[(Long, Long)].collect().toMap
    val afterStar = persisted()
    assert(rounds >= 3, s"path graph should need multiple star rounds, took $rounds")
    assert(afterStar - afterProp <= 1,
      s"star leaked round checkpoints: $afterProp -> $afterStar")
    assert(star == prop)
  }

  test("iterative CC refuses to return partially converged labels at maxIter") {
    val path = (0L until 15L).map(i => (i, i + 1)).toDF("a", "b")
    // 15-vertex path needs ~15 propagation rounds / ~4 star rounds
    val e1 = intercept[IllegalStateException](Curation.connectedComponents(path, maxIter = 3))
    assert(e1.getMessage.contains("did not converge"))
    val e2 = intercept[IllegalStateException](
      Curation.connectedComponentsStarCore(path, "a", "b", maxIter = 1))
    assert(e2.getMessage.contains("did not converge"))
  }

  test("connectedComponentsStar ≡ propagation on mixed dense+chain graphs") {
    // two dense cliques bridged by a long chain — the shape that mixes the
    // propagation-friendly (dense) and propagation-hostile (chain) regimes
    val clique1 = for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val chain = (5L until 40L).map(i => (i, i + 1))
    val clique2 = for (a <- 40L to 45L; b <- (a + 1) to 45L) yield (a, b)
    val lone = Seq((100L, 100L)) // self-loop-only vertex keeps its own label
    val edges = (clique1 ++ chain ++ clique2 ++ lone).toDF("a", "b")
    val prop = Curation.connectedComponents(edges, maxIter = 60)
      .as[(Long, Long)].collect().toMap
    val star = Curation.connectedComponentsStar(edges)
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
    assert(star(45L) == 0L, "chain must bridge the cliques into one component")
    assert(star(100L) == 100L)
  }

  test("repeatByWeight: output size is exactly sum of per-doc rep counts") {
    val d = (0L until 500L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val weights = Map("s0" -> 2.0, "s1" -> 0.0) // exact-integer weights: no hash term
    val out = Curation.repeatByWeight(d, "id", "src", weights, defaultWeight = 1.0, salt = "w")
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // whole-number weights are exact: 167×2, 167×0 (absent), 166×1
    assert(counts.get("s0").contains(334L))
    assert(!counts.contains("s1"), "zero-weight stratum must vanish")
    assert(counts.get("s2").contains(166L))
  }

  test("pagerankInteger: invariants over generated graphs") {
    val edgeGen = for {
      n <- Gen.choose(3, 12)
      m <- Gen.choose(2, 20)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.distinct
    samples(edgeGen, 12, seed0 = 77L).filter(_.nonEmpty).foreach { es =>
      val pairs = es.toDF("a", "b")
      val ranks = Curation.pagerankInteger(pairs, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nodes = es.flatMap(e => Seq(e._1, e._2)).toSet
      // every node ranked exactly once, all ranks positive
      assert(ranks.keySet == nodes)
      assert(ranks.values.forall(_ > 0))
      // truncating divisions only LOSE mass: Σ ranks ≤ q9 unit
      assert(ranks.values.sum <= 1000000000L)
      // deterministic: a second run is bit-identical
      val again = Curation.pagerankInteger(pairs, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(again == ranks)
      // label-shift invariance: adding a constant to every node id
      // shifts the keys but must not change any rank value
      val shifted = Curation.pagerankInteger(
        es.map { case (a, b) => (a + 1000L, b + 1000L) }.toDF("a", "b"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(shifted == ranks.map { case (k, v) => (k + 1000L, v) })
    }
  }
}
