package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 pins: the fixed 16-cell semantic-dedup machinery digest (the
  * query left the declared surface — the last declared fixed-parameter
  * quadratic — but its small-cell dominance machinery stays under test).
  */
class Round15Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("fixed 16-cell semantic dedup: machinery pin (sf0.001 digest)") {
    // q_semantic_dedup (fixed NCells=16) left the declared surface in
    // round 15: its within-cell pair work grows as (N/16)² — ~49 s at
    // ×100 (r10 probe), the same fixed-parameter cliff class as the
    // fixed-plane q_embed_neardup demoted in r14. q_semantic_dedup_auto
    // (cellsForExact: k² ≥ N ⇒ O(N·√N) pair work) is the declared
    // production path. The machinery pin: golden = the oracle-green
    // output on the driver's sf0.001 embeddings fixture — including the
    // kept=0 dominance path that only small cells exercise. Regenerate
    // after a DELIBERATE fixture/machinery change by re-running
    // fixedSemanticDedup at sf0.001 and re-digesting.
    val rows = graft.ext.SimilarityQueries
      .fixedSemanticDedup(spark, "/root/testdata/sf0.001")
      .select(concat_ws("-", col("id"), col("cell"), col("kept")).as("e"))
      .as[String].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(rows.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows.length == 500, s"row count drifted: ${rows.length}")
    assert(digest == "048bf26ad290df38e50f1876a67cf0a1",
      s"fixed semantic-dedup digest drifted: $digest")
  }
}
