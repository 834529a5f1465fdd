package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions._

/** BPE training/encoding laws, pinned on hand-computable corpora. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("charSeq wraps each symbol in single spaces, two between") {
    val out = docs("abc").select(Bpe.charSeq(lit("abc"))).head().getString(0)
    assert(out === " a  b  c ")
  }

  test("wordVocab counts corpus-wide word frequencies once") {
    val v = Bpe.wordVocab(docs("ab ab cd", "ab"), "text")
      .orderBy("w").as[(String, Long)].collect().toSeq
    assert(v === Seq(("ab", 3L), ("cd", 1L)))
  }

  test("first merge is the frequency-weighted most common pair") {
    // corpus: "abab" x3, "ab" x2 → pair (a,b) count = 3*2 + 2*1 = 8,
    // (b,a) = 3 → first merge must be "a b" with cnt 8
    val d = docs("abab abab abab ab ab")
    val (merges, vocab) = Bpe.train(d, "text", 1)
    assert(merges.head === Bpe.MergeRule(1, "a b", 8L))
    val seqs = vocab.orderBy("w").select("seq").as[String].collect().toSeq
    // "ab" → " ab ", "abab" → " ab  ab " — both occurrences merged
    assert(seqs === Seq(" ab ", " ab  ab "))
  }

  test("greedy left-to-right on an odd same-symbol run: aaa → aa a") {
    val (merges, vocab) = Bpe.train(docs("aaa"), "text", 1)
    assert(merges.head.pair === "a a")
    assert(vocab.select("seq").as[String].head() === " aa  a ")
  }

  test("alternating run merges both pairs: l r l r → lr lr") {
    // word "lrlr": chars l,r,l,r — canonical BPE merges (l,r) twice
    val (_, vocab) = Bpe.train(docs("lrlr"), "text", 1)
    assert(vocab.select("seq").as[String].head() === " lr  lr ")
  }

  test("tiebreak at equal counts picks the lexicographically smallest pair") {
    // "xy" and "ab" each once: pairs (x,y) and (a,b) both cnt 1 → "a b"
    val (merges, _) = Bpe.train(docs("xy ab"), "text", 1)
    assert(merges.head === Bpe.MergeRule(1, "a b", 1L))
  }

  test("multi-round merges compose: classic low/lowest corpus") {
    // 5x "low", 2x "lowest": round1 (l,o)=7, round2 (lo,w)=7,
    // round3 (low,e)=2 vs (e,s)=2 vs (s,t)=2 → lex smallest "e s"... but
    // pair strings compare as "low e" vs "e s" vs "s t" → "e s" wins
    val d = docs(Seq.fill(5)("low").mkString(" "), "lowest lowest")
    val (merges, vocab) = Bpe.train(d, "text", 3)
    assert(merges.map(_.pair) === Seq("l o", "lo w", "e s"))
    assert(merges.map(_.cnt) === Seq(7L, 7L, 2L))
    val seqs = vocab.orderBy("w").select("seq").as[String].collect().toSeq
    assert(seqs === Seq(" low ", " low  es  t "))
  }

  test("each round strictly reduces total weighted symbol count") {
    val d = docs("banana bandana", "banana cabana")
    var prev = Long.MaxValue
    for (r <- 1 to 4) {
      val (_, vocab) = Bpe.train(d, "text", r)
      val total = vocab
        .select(sum(Bpe.symbolCount(col("seq")) * col("freq")))
        .head().getLong(0)
      assert(total < prev, s"round $r did not reduce symbols: $total >= $prev")
      prev = total
    }
  }

  test("encode via vocab join matches per-word symbol counts") {
    val d = docs("abab ab", "cd")
    val (_, vocab) = Bpe.train(d, "text", 1) // merge (a,b): cnt 3
    val enc = d
      .select(col("doc_id"), explode(graft.ext.TextOps.tokens(col("text"))).as("w"))
      .join(vocab.select(col("w"), Bpe.symbolCount(col("seq")).as("n_sym")), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_bpe"))
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc0: "abab"→2 syms, "ab"→1 → 3 over 2 words; doc1: "cd"→2 (unmerged)
    assert(enc === Seq((0L, 2L, 3L), (1L, 1L, 2L)))
  }

  test("train refuses a rounds count with nothing left to merge") {
    // single 2-char word: round 1 merges it fully; round 2 has no pairs
    val e = intercept[IllegalArgumentException](Bpe.train(docs("ab"), "text", 2))
    assert(e.getMessage.contains("no adjacent pair left"))
  }
}
