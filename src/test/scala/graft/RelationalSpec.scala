package graft

import graft.ext.Relational
import org.apache.spark.sql.functions._

/** Relational EXT semantics the DuckDB oracles cannot check. */
class RelationalSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.01"

  test("approx_count_distinct stays inside its declared error bound vs exact") {
    // q_approx_distinct is rows-only in the oracle gate (engine-specific
    // HLL sketch); this pins its ACCURACY contract instead: rsd=0.01
    // declared, |approx-exact|/exact must stay within a few sigma.
    val ev = Tables.events(spark, SfDir)
    val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("exact"))
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx"))
    val joined = exact.join(approx, Seq("event_type")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val relErr = math.abs(a - e) / e
      assert(relErr <= 0.05, s"${r.getString(0)}: exact=$e approx=$a relErr=$relErr")
    }
  }

  test("topKPerGroup ranks deterministically under ties") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("g", "b", 5L), ("g", "a", 5L), ("g", "c", 5L), ("g", "d", 1L))
      .toDF("grp", "entity", "score")
    val top = Relational
      .topKPerGroup(df, Seq("grp"), Seq(col("score").desc, col("entity").asc), 2)
      .select($"entity", $"rank")
      .as[(String, Int)]
      .collect()
      .toSet
    // equal scores break ties on the entity column — stable across runs
    assert(top == Set(("a", 1), ("b", 2)))
  }
}
