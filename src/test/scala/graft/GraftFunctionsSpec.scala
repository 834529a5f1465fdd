package graft

import graft.ext.Similarity
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Native graft_dot expression: bit-parity with the HOF fold, SQL surface,
  * null handling, codegen path.
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vdf = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.1, -0.2, 0.3), Seq(-1.5, 2.5, 0.0)),
    (3L, Seq(1e-8, 1e8, -1e-8), Seq(1e8, 1e-8, 1e8))
  ).toDF("id", "a", "b")

  test("graft_dot ≡ HOF fold bit-for-bit") {
    GraftFunctions.register(spark)
    val rows = vdf
      .select(Similarity.dot($"a", $"b").as("native"), Similarity.dotFold($"a", $"b").as("fold"))
      .as[(Double, Double)]
      .collect()
    rows.foreach { case (n, f) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(f))
    }
  }

  test("graft_cos ≡ composed dot/(norm*norm) bit-for-bit") {
    GraftFunctions.register(spark)
    val rows = vdf
      .select(Similarity.cosine($"a", $"b").as("fused"),
        Similarity.cosineComposed($"a", $"b").as("composed"))
      .as[(Double, Double)]
      .collect()
    rows.foreach { case (f, c) =>
      assert(java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(c))
    }
    // zero-norm side: the fused expression yields IEEE NaN, where the
    // composed Column form THROWS under Spark 4's default ANSI mode
    // (DIVIDE_BY_ZERO) — a zero embedding must not kill a 100 TB re-rank
    val z = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    assert(z.select(Similarity.cosine($"a", $"b")).as[Double].head().isNaN)
    val e = intercept[Exception] {
      z.select(Similarity.cosineComposed($"a", $"b")).collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("DIVIDE_BY_ZERO"))
  }

  test("graft_cos ≡ composed form for UNEQUAL lengths too (norm tails)") {
    GraftFunctions.register(spark)
    // the composed form bounds dot(a,b) by the shorter array but computes
    // each norm over its array's FULL length — the fused expression must
    // match bit-for-bit (interpreted and codegen paths both covered:
    // collect() runs codegen, the filter below keeps one-row locality)
    val df = Seq(
      (Seq(1.0, 2.0, 9.0, -4.5), Seq(3.0, 4.0)),
      (Seq(0.5), Seq(0.25, -8.0, 1e6)),
      (Seq(1e-8, 1e8), Seq(1e8, 1e-8, 7.0, -7.0, 0.125))
    ).toDF("a", "b")
    val rows = df
      .select(Similarity.cosine($"a", $"b").as("fused"),
        Similarity.cosineComposed($"a", $"b").as("composed"))
      .as[(Double, Double)]
      .collect()
    rows.foreach { case (f, c) =>
      assert(java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(c))
    }
  }

  test("graft_rollhash ≡ HOF ascii fold, incl. unicode and surrogate pairs") {
    GraftFunctions.register(spark)
    import graft.ext.TextOps
    val rows = Seq("", "a", "hello world", "  spaced   out  ",
      "café", "こんにちは", "mixed é あ ascii", "emoji 😀 pair", "𠜎 supplementary")
      .toDF("text")
      .select(TextOps.rollingHash($"text").as("native"),
        TextOps.rollingHashFold($"text").as("fold"))
      .as[(Long, Long)]
      .collect()
    rows.foreach { case (n, f) => assert(n == f) }
    // codegen and interpreted paths agree (filter forces a second eval path)
    val one = Seq(("x y z 😀")).toDF("text")
      .filter(TextOps.rollingHash($"text") === TextOps.rollingHashFold($"text"))
    assert(one.count() == 1)
  }

  test("usable from SQL after registration") {
    GraftFunctions.register(spark)
    vdf.createOrReplaceTempView("vdf")
    val r = spark.sql("SELECT graft_dot(a, b) FROM vdf WHERE id = 1").as[Double].head()
    assert(r == 32.0)
  }

  test("null array yields null; mismatched lengths use the shorter") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq(1.0, 2.0, 9.0)), Some(Seq(3.0, 4.0)))
    ).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(None, Some(11.0)))
  }

  test("expression does not fall back from codegen") {
    GraftFunctions.register(spark)
    // CodegenFallback expressions print as such in the plan; a native
    // doGenCode expression appears inline in the WholeStageCodegen project
    val plan = vdf.select(Similarity.dot($"a", $"b")).queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"))
    assert(!plan.contains("CodegenFallback"))
    val rollPlan = Seq("x y").toDF("text")
      .select(graft.ext.TextOps.rollingHash($"text"))
      .queryExecution.executedPlan.toString
    assert(rollPlan.contains("graft_rollhash") && !rollPlan.contains("CodegenFallback"))
  }

  test("graft_argmax_cos ≡ per-centroid graft_cos argmax, Spark double ordering") {
    GraftFunctions.register(spark)
    val cents = Seq(
      Seq(1.0, 0.0, 0.0),
      Seq(0.0, 1.0, 0.0),
      Seq(0.6, 0.8, 0.0),
      Seq(0.6, 0.8, 0.0), // duplicate: ties must keep the LOWER index
      Seq(0.0, 0.0, 0.0)) // zero norm: cosine NaN — NaN is GREATEST
    val vecs = Seq(
      (1L, Seq(1.0, 0.1, 0.0)),
      (2L, Seq(0.1, 1.0, 0.0)),
      (3L, Seq(0.5, 0.9, 0.1)),
      (4L, Seq(-1.0, -1.0, 0.0))).toDF("id", "vec")
    // reference: argmax over the NATIVE graft_cos scores with Spark's
    // ordering (NaN greatest, == short-circuit, first-wins)
    val scored = vecs.select(col("id"), array(cents.map(c =>
      call_function("graft_cos", col("vec"), typedLit(c))): _*).as("ss"))
      .as[(Long, Seq[Double])].collect().toMap
    def refArgmax(ss: Seq[Double]): Int = {
      var bi = -1; var b = 0.0
      ss.zipWithIndex.foreach { case (c, i) =>
        if (bi < 0 || (!(c == b) && java.lang.Double.compare(c, b) > 0)) { b = c; bi = i }
      }
      bi
    }
    val got = vecs.select(col("id"),
      call_function("graft_argmax_cos", col("vec"),
        typedLit(cents)).as("k"))
      .as[(Long, Int)].collect().toMap
    got.foreach { case (id, k) =>
      assert(k == refArgmax(scored(id)), s"id=$id got=$k ss=${scored(id)}")
    }
    // every vector hits the NaN (zero-norm) centroid LAST in index order,
    // and NaN is greatest — so index 4 must win everywhere here
    assert(got.values.toSet == Set(4))
    // without the zero-norm row: real argmaxes, duplicate keeps index 2
    val got2 = vecs.select(col("id"),
      call_function("graft_argmax_cos", col("vec"),
        typedLit(cents.take(4))).as("k"))
      .as[(Long, Int)].collect().toMap
    assert(got2(1L) == 0 && got2(2L) == 1 && got2(3L) == 2)
    got2.foreach { case (id, k) =>
      assert(k == refArgmax(scored(id).take(4)), s"id=$id")
    }
  }

  test("graft_deflate_len: deterministic, matches a direct JRE deflate, codegen-native") {
    GraftFunctions.register(spark)
    val texts = Seq("", "abc", "the quick brown fox", "ab" * 5000, "テスト 🎉 mixed")
    val df = texts.toDF("t")
    val got = df.select(call_function("graft_deflate_len", $"t")).collect().map(_.getInt(0))
    val expect = texts.map(s =>
      graft.functions.DeflateLen.deflatedLength(s.getBytes("UTF-8")))
    assert(got.toSeq == expect)
    // repetitive text compresses an order of magnitude below prose
    val ratio = df.select(graft.ext.TextOps.compressionRatio($"t").as("r"))
      .collect().map(_.getDouble(0))
    assert(ratio(0) == 0.0, "empty text ratio is 0 by convention")
    assert(ratio(3) < 0.01, s"10k-char cycle must compress to <1%: ${ratio(3)}")
    assert(ratio(2) > 0.5, s"short prose stays near-incompressible: ${ratio(2)}")
    val plan = df.select(call_function("graft_deflate_len", $"t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_deflate_len") && !plan.contains("CodegenFallback"))
  }

  test("compressionRatio flags a period-7 cycle that duplicate-2-gram counting misses") {
    GraftFunctions.register(spark)
    // 7 distinct tokens repeated: every 2-gram inside one period is unique
    // ⇒ rep_ratio is high but NOT 1.0-flagged territory; deflate nails it
    val cycle = Seq.fill(300)((1 to 7).map(i => s"w$i").mkString(" ")).mkString(" ")
    val df = Seq(cycle).toDF("text")
    val r = df.select(graft.ext.TextOps.compressionRatio($"text")).head().getDouble(0)
    assert(r < 0.01, s"cycle must deflate to <1%: $r")
  }
}
