package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._

/** TextOps semantics, incl. equivalence of the two language-ID
  * formulations (per-row expression vs explode+broadcast-join).
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("langIdByJoin ≡ langId expression on documents data") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val expr = d.select($"doc_id", TextOps.langId($"text").as("p1"))
    val join = TextOps.langIdByJoin(d, "doc_id", "text").withColumnRenamed("predicted", "p2")
    val diff = expr.join(join, "doc_id").filter($"p1" =!= $"p2").count()
    assert(diff == 0)
  }

  test("langIdByJoin defaults to the first profile when no markers hit") {
    val d = Seq((1L, "zzz qqq www"), (2L, "the the la la la")).toDF("doc_id", "text")
    val out = TextOps.langIdByJoin(d, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en") // no marker words at all ⇒ default
    assert(out(2L) == "es") // "la"×3 ties es/fr (both profiles have la); es wins on priority
  }

  test("rolling hash and fingerprint are deterministic and distinct per text") {
    graft.functions.GraftFunctions.register(spark)
    val d = Seq((1L, "a b c"), (2L, "a b d"), (3L, "a b c")).toDF("doc_id", "text")
    val fps = d.select($"doc_id", TextOps.rollingHash($"text").as("rh"),
      TextOps.fingerprintMd5($"text").as("fp")).collect()
    val byId = fps.map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byId(1L) == byId(3L))
    assert(byId(1L) != byId(2L))
  }
}
