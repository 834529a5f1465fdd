package graft

import graft.ext.{Bloom, Dedup}
import org.apache.spark.sql.functions._

/** Bloom prefilter contracts: zero false negatives (the property that makes
  * prefilter + exact re-check ≡ exact), bounded false-positive rate, and
  * the end-to-end contamination equivalence law.
  */
class BloomSpec extends SparkSpec {

  test("mightContain has no false negatives and a sane false-positive rate") {
    val spark0 = spark
    import spark0.implicits._
    val inserted = (0L until 500L).map(i => s"key-$i")
    val absent = (0L until 5000L).map(i => s"absent-$i")
    val f = Bloom.build(inserted.toDF("k"), "k", numBits = 1 << 14, numHashes = 5)
    val hits = inserted.toDF("k")
      .filter(Bloom.mightContain(f, col("k"))).count()
    assert(hits == inserted.size, "every inserted key must probe true")
    val fp = absent.toDF("k").filter(Bloom.mightContain(f, col("k"))).count()
    // 500 keys in 16384 bits at k=5 ⇒ theoretical fpp ≈ 0.02%; allow 2%
    assert(fp <= absent.size * 0.02, s"false-positive rate too high: $fp/${absent.size}")
  }

  test("property: no false negatives for ANY generated key set and shape") {
    val spark0 = spark
    import spark0.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keyGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumStr, Gen.long.map(_.toString))))
    val shapeGen = for {
      words <- Gen.choose(1, 8) // deliberately tiny filters: saturation ok, misses not
      k <- Gen.choose(1, 6)
    } yield (words * 64L, k)
    var seed = Seed(7L)
    (1 to 12).foreach { _ =>
      val keys = keyGen.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val (bits, k) = shapeGen.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val f = Bloom.build(keys.toDF("k"), "k", bits, k)
      val misses = keys.toDF("k").filter(!Bloom.mightContain(f, col("k"))).count()
      assert(misses == 0, s"false negative with numBits=$bits k=$k keys=$keys")
    }
  }

  test("build rejects invalid shapes") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq("a").toDF("k")
    intercept[IllegalArgumentException](Bloom.build(df, "k", numBits = 100, numHashes = 2))
    intercept[IllegalArgumentException](Bloom.build(df, "k", numBits = 64, numHashes = 0))
  }

  test("broadcast probe ≡ literal probe, bit for bit") {
    val spark0 = spark
    import spark0.implicits._
    val keys = ((0L until 300L).map(i => s"key-$i") ++ (0L until 3000L).map(i => s"other-$i"))
      .toDF("k")
    val f = Bloom.build(keys.filter(col("k").startsWith("key-")), "k",
      numBits = 1 << 13, numHashes = 4)
    val bf = Bloom.broadcastFilter(spark, f)
    // same hash seeds + word layout ⇒ the two carriers must agree on EVERY
    // key, false positives included
    val disagree = keys
      .filter(Bloom.mightContain(f, col("k")) =!= bf.mightContain(col("k")))
      .count()
    assert(disagree == 0, "broadcast and literal probes diverged")
  }

  test("broadcast probe keeps the plan flat as the filter grows 64x") {
    val spark0 = spark
    import spark0.implicits._
    val keys = (0L until 200L).map(i => s"key-$i").toDF("k")
    // probe a PARQUET-backed frame: an in-memory relation would be
    // constant-folded by ConvertToLocalRelation and the measured plan
    // would collapse to a LocalTableScan regardless of the condition
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def planLen(numBits: Long): (Int, Int) = {
      val f = Bloom.build(keys, "k", numBits, numHashes = 3)
      val probe = docs.filter(Bloom.broadcastFilter(spark, f).mightContain(col("text")))
      val literal = docs.filter(Bloom.mightContain(f, col("text")))
      (probe.queryExecution.executedPlan.toString.length,
        literal.queryExecution.executedPlan.toString.length)
    }
    val (small, smallLit) = planLen(1L << 12) //   64 words
    val (big, bigLit) = planLen(1L << 18) // 4096 words
    info(s"plan chars: broadcast $small -> $big; literal $smallLit -> $bigLit")
    // broadcast carrier: plan size independent of the word count
    assert(big <= small + 256, s"broadcast plan grew with the filter: $small -> $big")
    // no false negatives through the broadcast carrier either
    val f = Bloom.build(keys, "k", 1L << 12, 3)
    assert(keys.filter(!Bloom.broadcastFilter(spark, f).mightContain(col("k"))).count() == 0)
  }

  test("contaminationBloom ≡ contamination (prefilter + exact re-check law)") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = d.filter(col("doc_id") % 97 === 0)
    val exact = Dedup.contamination(d, bench, "doc_id", "text", n = 3, ratioThreshold = 0.5)
      .orderBy("doc").collect().toSeq
    // small filter on purpose: false positives occur and must be removed
    // by the exact re-check, not by luck
    val bloomed = Dedup.contaminationBloom(d, bench, "doc_id", "text", n = 3,
      ratioThreshold = 0.5, numBits = 1 << 12, numHashes = 3)
      .orderBy("doc").collect().toSeq
    assert(bloomed == exact)
  }

  test("caller-owned bloom: contaminationBloomWith + destroy frees the broadcast") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val benchDocs = d.filter(col("doc_id") % 97 === 0)
    val exact = Dedup.contamination(d, benchDocs, "doc_id", "text", n = 3,
      ratioThreshold = 0.5).orderBy("doc").collect().toSeq
    val bench = Dedup.postings(benchDocs, "doc_id", "text", n = 3)
      .select(col("h")).distinct().localCheckpoint()
    val bloom = Bloom.broadcastFilter(spark, Bloom.build(bench, "h", 1 << 12, 3))
    // one filter, two invocations — the long-lived-session reuse shape
    val r1 = Dedup.contaminationBloomWith(d, bench, bloom, "doc_id", "text", 3, 0.5)
      .orderBy("doc").collect().toSeq
    val r2 = Dedup.contaminationBloomWith(d, bench, bloom, "doc_id", "text", 3, 0.5)
      .orderBy("doc").collect().toSeq
    assert(r1 == exact && r2 == exact)
    // caller owns the lifecycle: destroy after materialization, blocks gone
    bloom.destroy()
  }
}
