package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property parity: the distributed BPE trainer ≡ a driver-side reference
  * implementation of canonical corpus-weighted BPE (greedy left-to-right
  * non-overlapping merges, max-count/lex-smallest argmax) over randomly
  * generated corpora — covering run-of-same-symbol words, ties, repeated
  * words, and single-char words the fixtures don't reach.
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  // small alphabet → frequent pair collisions, ties, and aa-runs
  private val word: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val corpusGen: Gen[List[String]] = for {
    nd <- Gen.choose(1, 5)
    docs <- Gen.listOfN(nd, Gen.choose(1, 8).flatMap(Gen.listOfN(_, word)).map(_.mkString(" ")))
  } yield docs

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).map { _ =>
      val a = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      a
    }
  }

  /** Driver-side canonical BPE: symbol lists, greedy left-to-right merge. */
  private def refTrain(corpus: Seq[String], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    val freq = corpus
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab: Map[String, Seq[String]] = freq.keys.map(w => w -> w.map(_.toString)).toMap
    val merges = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + freq(w)
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, rt), cnt) = counts.minBy { case ((a, b), c) => (-c, a + " " + b) }
        merges += ((l, rt, cnt))
        vocab = vocab.map { case (w, syms) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rt) {
              out += l + rt; i += 2 // greedy: skip the consumed pair
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
        r += 1
      }
    }
    (merges.result(), vocab)
  }

  test("train ≡ driver-side canonical BPE on random corpora (merges AND final vocab)") {
    for ((corpus, i) <- samples(corpusGen, 25, 4242L).zipWithIndex) {
      val docs = corpus.zipWithIndex.map { case (t, d) => (d.toLong, t) }.toDF("doc_id", "text")
      val (refMerges, refVocab) = refTrain(corpus, rounds = 3)
      if (refMerges.nonEmpty) {
        val rounds = refMerges.length
        val (merges, vocab) = Bpe.train(docs, "text", rounds)
        val got = merges.map(m => {
          val Array(l, r) = m.pair.split(" ", 2); (l, r, m.cnt)
        })
        assert(got == refMerges, s"corpus #$i merges diverge: $corpus")
        val gotVocab = vocab
          .select(col("w"), split(trim(col("seq")), "  ").as("syms"))
          .as[(String, Seq[String])].collect().toMap
        assert(gotVocab == refVocab, s"corpus #$i final vocab diverges: $corpus")
      }
    }
  }

  test("per-round accounting: symbol mass drops by at least one per merged occurrence") {
    for (corpus <- samples(corpusGen, 10, 7L)) {
      val docs = corpus.zipWithIndex.map { case (t, d) => (d.toLong, t) }.toDF("doc_id", "text")
      val (refMerges, _) = refTrain(corpus, rounds = 2)
      if (refMerges.length == 2) {
        val (merges, vocab) = Bpe.train(docs, "text", 2)
        val totalAfter = vocab
          .select(sum(Bpe.symbolCount(col("seq")) * col("freq"))).head().getLong(0)
        val totalBefore = corpus.flatMap(_.split("\\s+").filter(_.nonEmpty)).map(_.length).sum
        // each merge round removes exactly (# greedy-merged occurrences)
        // symbols; that is ≥ cnt/2 and ≤ cnt — bound it from both sides
        val cntSum = merges.map(_.cnt).sum
        assert(totalAfter >= totalBefore - cntSum)
        assert(totalAfter <= totalBefore - merges.length)
      }
    }
  }
}
