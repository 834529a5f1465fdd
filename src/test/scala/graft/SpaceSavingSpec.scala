package graft

import org.apache.spark.sql.functions._

/** SpaceSaving top-k aggregate: exact below capacity, overcount-bounded
  * above it, mergeable across partitions, usable from SQL.
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def topkOf(df: org.apache.spark.sql.DataFrame, k: Int, cap: Int)
      : Seq[(String, Long, Long)] = {
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("ss_in")
    spark.sql(s"SELECT graft_topk(item, $k, $cap) AS top FROM ss_in")
      .select(explode(col("top")).as("t"))
      .select(col("t.item"), col("t.est"), col("t.err"))
      .as[(String, Long, Long)]
      .collect()
      .toSeq
  }

  test("below capacity the sketch is exact (err = 0, counts = groupBy counts)") {
    val data = (1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(s"w$i"))
    val df = data.toDF("item").repartition(8)
    val got = topkOf(df, k = 10, cap = 128)
    val exact = data.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    got.foreach { case (item, est, err) =>
      assert(err == 0L, s"$item err=$err must be exact below cap")
      assert(est == exact(item), s"$item est=$est != exact ${exact(item)}")
    }
    // top of the sketch = top of the exact counts (est desc, item asc)
    val exactTop = exact.toSeq.sortBy { case (w, c) => (-c, w) }.take(10).map(_._1)
    assert(got.map(_._1) == exactTop)
  }

  test("over capacity: heavy hitters survive with overcount-bounded estimates") {
    // 3 heavy items dominate a long tail wider than the capacity
    val heavy = Seq("alpha" -> 4000, "beta" -> 3000, "gamma" -> 2000)
    val tail = (1 to 500).map(i => s"tail$i" -> 4)
    val data = (heavy ++ tail).flatMap { case (w, n) => Seq.fill(n)(w) }
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(42))
      .shuffle(data).toDF("item").repartition(8)
    val got = topkOf(df, k = 3, cap = 64)
    val exact = heavy.toMap
    assert(got.map(_._1).toSet == Set("alpha", "beta", "gamma"),
      s"true heavy hitters must head the sketch, got $got")
    got.foreach { case (item, est, err) =>
      val truth = exact(item).toLong
      assert(est >= truth, s"$item est=$est must overcount truth=$truth")
      assert(est - err <= truth, s"$item est-err=${est - err} must not exceed truth=$truth")
    }
  }

  test("string payloads with multi-byte UTF-8 survive partial serialization") {
    val data = Seq.fill(100)("naïve 日本語 🚀") ++ Seq.fill(50)("ascii only")
    val got = topkOf(data.toDF("item").repartition(4), k = 2, cap = 16)
    assert(got.map(t => (t._1, t._2)) == Seq(("naïve 日本語 🚀", 100L), ("ascii only", 50L)))
  }

  // ---- weighted replay (graft_topk_w, the q_heavy_hitters_sketch form) ----

  private def topkWeighted(pairs: Seq[(String, Long)], k: Int, cap: Int)
      : Seq[(String, Long, Long)] = {
    graft.functions.GraftFunctions.register(spark)
    pairs.toDF("item", "c").createOrReplaceTempView("ssw_in")
    // the deterministic replay contract: ONE final partition, fed desc
    spark.sql("SELECT item, c FROM ssw_in")
      .repartition(1)
      .sortWithinPartitions(col("c").desc, col("item").asc)
      .agg(call_function("graft_topk_w", col("item"), col("c"), lit(k), lit(cap)).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.item"), col("t.est"), col("t.err"))
      .as[(String, Long, Long)]
      .collect()
      .toSeq
  }

  test("weighted replay: head above the eviction floor is exact with err = 0") {
    // 10 heavy items over a 200-item tail, cap 64 < 210 distinct: the
    // cascade floor stays near N/cap; the head must surface exactly
    val heavy = (1 to 10).map(i => s"h$i" -> (10000L - 100L * i))
    val tail = (1 to 200).map(i => s"t$i%03d".format(i) -> (10L + i % 7))
    val got = topkWeighted(heavy ++ tail.map { case (w, c) => w -> c.toLong }, k = 10, cap = 64)
    assert(got.map(_._1) == heavy.map(_._1), s"head must be the true top-10: $got")
    got.zip(heavy).foreach { case ((item, est, err), (_, truth)) =>
      assert(est == truth && err == 0L, s"$item est=$est err=$err truth=$truth")
    }
  }

  test("weighted replay is a pure function of the counts (re-run bit-identical)") {
    val pairs = (1 to 300).map(i => s"w$i" -> ((i * 2654435761L) % 997 + 1))
    val a = topkWeighted(pairs, k = 25, cap = 100)
    val b = topkWeighted(scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(pairs), k = 25, cap = 100)
    assert(a == b, "the sorted single-state replay must not depend on input frame order")
  }

  test("weighted replay preserves the SpaceSaving bound beyond the head") {
    val pairs = (1 to 500).map(i => s"w$i%03d".format(i) -> ((i * 31L) % 200 + 1))
    val exact = pairs.toMap
    val got = topkWeighted(pairs, k = 40, cap = 64)
    got.foreach { case (item, est, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est >= truth, s"$item est=$est must overcount truth=$truth")
      assert(est - err <= truth, s"$item est-err=${est - err} must not exceed truth=$truth")
    }
  }
}
