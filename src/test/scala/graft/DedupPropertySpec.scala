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

  test("spanDedup ≡ brute-force duplicate-gram coverage over generated corpora") {
    val n = 3 // 3-gram spans against the short generated docs
    samples(corpusGen, 8, 7L).foreach { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup
        .spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", n = n)
        .collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getString(4))))
        .toMap
      // driver-side reference: gram -> doc set; positions covered by any
      // gram present in >= 2 docs; cleaned text = uncovered tokens
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
      val gramDocs = docs
        .flatMap { case (id, _) => toks(id).sliding(n).filter(_.length == n)
          .map(_.mkString(" ") -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      docs.foreach { case (id, _) =>
        val ts = toks(id)
        val covered = ts.sliding(n).zipWithIndex
          .filter { case (g, _) => g.length == n && gramDocs(g.mkString(" ")).size >= 2 }
          .flatMap { case (_, i) => i until i + n }
          .toSet
        val clean = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }.mkString(" ")
        assert(got(id) == ((ts.length, covered.size, clean)),
          s"doc $id corpus=$docs\n got=${got(id)}\n exp=${(ts.length, covered.size, clean)}")
      }
    }
  }

  test("lineDedup invariants over generated multi-line docs") {
    val lineGen = Gen.oneOf("shared footer", "alpha beta", "gamma", "", "  ")
    val mlDocGen = Gen.choose(1, 5).flatMap(Gen.listOfN(_, lineGen)).map(_.mkString("\n"))
    val mlCorpus = Gen.choose(2, 8).flatMap(Gen.listOfN(_, mlDocGen))
    samples(mlCorpus, 8, 11L).foreach { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup
        .lineDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getString(3))))
        .toMap
      val hot = docs
        .flatMap { case (id, t) => t.split("\n", -1).map(_.trim).filter(_.nonEmpty)
          .distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.size).collect { case (k, c) if c >= 2 => k }.toSet
      docs.foreach { case (id, t) =>
        val lines = t.split("\n", -1).toSeq
        val kept = lines.filter(l => l.trim.isEmpty || !hot(l.trim))
        assert(got(id) == ((lines.length, (lines.length - kept.length).toLong,
          kept.mkString("\n"))),
          s"doc $id corpus=$docs\n got=${got(id)}")
      }
    }
  }
}
