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
}
