package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Memo, Similarity}

/** Round-14 operator laws: the self-sizing semantic-dedup cell rule
  * (the last declared fixed-parameter scale cliff retired), and the memo
  * lifecycle (consumer learning + release) that lets Bench free a
  * family's checkpoint blocks after its last consumer instead of letting
  * early-family residency displace later sorts out of protected storage.
  */
class Round14Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("cellsForExact: smallest k with k·k ≥ n — exact at square boundaries") {
    for (n <- Seq(1L, 2L, 3L, 4L, 5L, 24L, 25L, 26L, 499L, 500L, 2000L,
        200000L, 200704L, 200705L, 1000000007L, (1L << 40) + 7)) {
      val k = Similarity.cellsForExact(n).toLong
      assert(k * k >= n, s"n=$n k=$k must cover")
      assert(k == 1 || (k - 1) * (k - 1) < n, s"n=$n k=$k must be minimal")
    }
    // the declared-corpus operating points the oracle re-derives
    assert(Similarity.cellsForExact(500) == 23)
    assert(Similarity.cellsForExact(2000) == 45)
    assert(Similarity.cellsForExact(200000) == 448)
  }

  test("Memo lifecycle: dir-independent consumer learning; release frees blocks") {
    var builds = 0
    def build() = { builds += 1; Seq((1L, 2L)).toDF("a", "b") }
    val fam = s"round14-fam-${System.nanoTime}"
    // two consumers of the same family at DIFFERENT dirs (the warm-pass
    // shape: learning must survive the sf0.001 → sf0.1 key change)
    val f1 = Memo.withConsumer("q_alpha") {
      Memo.cached(spark, s"$fam|/root/testdata/sf0.001")(build())
    }
    Memo.withConsumer("q_beta") {
      Memo.cached(spark, s"$fam|/root/testdata/sf0.1")(build())
    }
    assert(builds == 2, "distinct dirs are distinct frames")
    assert(Memo.learnedConsumers(fam) == Set("q_alpha", "q_beta"),
      "family learning strips the dir segment")
    // release drops ALL dirs of the family and unpersists their blocks
    Memo.release(spark, fam)
    val lvl = f1.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.getStorageLevel
    }
    assert(lvl.forall(_ == org.apache.spark.storage.StorageLevel.NONE),
      s"released checkpoint blocks must be unpersisted, got $lvl")
    Memo.cached(spark, s"$fam|/root/testdata/sf0.001")(build())
    assert(builds == 3, "a released key rebuilds instead of reading dead blocks")
    // releaseDir frees exactly the keys embedding that dir
    val fam2 = s"round14-fam2-${System.nanoTime}"
    Memo.cached(spark, s"$fam2|/root/testdata/sf0.001")(build())
    Memo.cached(spark, s"$fam2|/root/testdata/sf0.1")(build())
    Memo.releaseDir(spark, "/root/testdata/sf0.001")
    Memo.cached(spark, s"$fam2|/root/testdata/sf0.1")(build())
    assert(builds == 5, "the other dir's frame survives a releaseDir")
    Memo.cached(spark, s"$fam2|/root/testdata/sf0.001")(build())
    assert(builds == 6, "the released dir's frame rebuilds")
  }

  test("globalRowNumberBy: composite key numbers in lexicographic order") {
    // the overflow-free replacement for single-long key packing (the
    // q_lorenz_curve ×100 guard firing): no bit budget, same order
    val df = Seq((5L, 1L), (5L, 0L), (1L, 9L), (3L, 3L), (1L, 2L)).toDF("a", "b")
    val got = graft.ext.Scale.globalRowNumberBy(df, Seq("a", "b"), partitions = 4)
      .orderBy("rownum").select("a", "b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (1L, 9L), (3L, 3L), (5L, 0L), (5L, 1L)))
  }

  test("fixed-plane near-dup: bucket/probe machinery pin (sf0.001 digest)") {
    // q_embed_neardup (fixed 4 planes) left the declared surface in round
    // 14 — the first whole-surface ×100 run measured its plan-literal
    // 16-bucket quadratic at 911.8 s, the same cliff class as the r13
    // fixed-plane graph demotion; q_embed_neardup_auto is the declared
    // production path. The machinery pin: golden = the oracle-green
    // output on the driver's sf0.001 embeddings fixture. Regenerate after
    // a DELIBERATE fixture/machinery change by re-running fixedNearDup at
    // sf0.001 and re-digesting.
    val rows = graft.ext.SimilarityQueries
      .fixedNearDup(spark, "/root/testdata/sf0.001")
      .select(concat_ws("-", col("a"), col("b"),
        format_number(col("cos"), 9)).as("e"))
      .as[String].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(rows.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows.length == 5, s"pair count drifted: ${rows.length}")
    assert(digest == "2708d9a7446107a783ddcea03b583f87",
      s"fixed-plane near-dup digest drifted: $digest")
  }

  test("untagged memo access learns nothing (no phantom consumers)") {
    val fam = s"round14-untag-${System.nanoTime}"
    Memo.cached(spark, s"$fam|/root/testdata/sf0.001")(Seq(1L).toDF("a"))
    assert(!Memo.learnedConsumers.contains(fam))
  }
}
