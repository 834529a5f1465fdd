package graft

import graft.ext.Dedup
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property parity: the inverted-index Jaccard machinery ≡ a direct
  * driver-side brute-force over randomly generated corpora — covering edge
  * shapes fixtures don't reach (empty docs, sub-n-token docs, identical
  * docs, heavy shared vocabulary near the df-cap).
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")
  // corpora include exact duplicates with positive probability (small vocab)
  private val corpusGen: Gen[List[String]] = Gen.choose(2, 14).flatMap(Gen.listOfN(_, docGen))

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).map { _ =>
      val a = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      a
    }
  }

  /** Driver-side reference: word-3-gram shingle sets, pairwise Jaccard. */
  private def refPairs(docs: Seq[(Long, String)], threshold: Double): Set[(Long, Long, Double)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
    (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq
      if a < b && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= threshold
    } yield (a, b, j)).toSet
  }

  test("jaccardPairs ≡ brute-force shingle-set Jaccard over generated corpora") {
    samples(corpusGen, 12, 1234L).foreach { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup
        .jaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val expect = refPairs(docs, 0.5)
      assert(got == expect, s"corpus=$docs\n got=$got\n exp=$expect")
    }
  }

  test("exactGroups keeps the smallest id per normalized text over generated corpora") {
    samples(corpusGen, 8, 99L).foreach { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup
        .exactGroups(docs.toDF("doc_id", "text"), "doc_id", "text")
        .select("keep_id", "dup_cnt")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val expect = docs
        .groupBy { case (_, t) => t.split("\\s+").filter(_.nonEmpty).mkString(" ") }
        .values
        .map(g => (g.map(_._1).min, g.size.toLong))
        .toSet
      assert(got == expect, s"corpus=$docs\n got=$got\n exp=$expect")
    }
  }
}
