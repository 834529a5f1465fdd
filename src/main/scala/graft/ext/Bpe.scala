package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units") — the tokenizer-prep
  * stage of a training-data pipeline, re-expressed Spark-first.
  *
  * The reference engine has no tokenizer training; this is EXT surface in
  * the LLM-pipeline family (SURVEY §2.3), next to the n-gram count table
  * (`q_ngram_counts`) and the bigram LM (`q_lm_fluency`).
  *
  * Scale shape — the part that matters at 100 TB:
  *  - The CORPUS is scanned exactly once, into a (word, freq) vocabulary
  *    via one partial+final hash aggregation. Classic BPE training is
  *    corpus-weighted but vocab-resident: every subsequent round runs
  *    over the vocabulary frame only (|vocab| ≪ |corpus|; ~10^8 rows at
  *    web scale vs ~10^11 documents).
  *  - Each merge round is one symbol-pair aggregation over the vocab
  *    (posexplode + per-word lead window — tokens materialize once, the
  *    documented anti-HOF pattern from BASELINE's bigram lesson), one
  *    SINGLE-ROW argmax collected to the driver (the same driver-sized
  *    fit step as k-means centroids / PQ codebooks), and one map-only
  *    literal `replace` over the vocab. No corpus re-scan, ever.
  *  - Round lineage is truncated with lazy localCheckpoint and the
  *    previous round's blocks are released immediately (the
  *    connectedComponents lifecycle), so k rounds cost k× one vocab
  *    frame, not a k-deep recursive plan.
  *
  * Symbol-sequence encoding (the cross-engine-exact merge trick): a
  * word's symbol sequence is stored as each symbol wrapped in single
  * spaces and concatenated — `" l  r  s "` — so adjacent symbols are
  * separated by exactly two spaces and every PAIR occurrence `" l  r "`
  * carries its own wrapper characters. Leftmost non-overlapping string
  * `replace` then equals canonical greedy left-to-right BPE merging:
  * adjacent candidate occurrences share a symbol (never just a
  * boundary char), so the scan-after-match-end semantics every engine's
  * `replace` implements (JVM `UTF8String.replace`, DuckDB `replace`)
  * skips exactly the occurrences canonical BPE skips. A run `a a a`
  * merges to `aa a`, `l r l r` merges to `lr lr` — bit-identical in
  * Spark and the DuckDB oracle.
  *
  * Determinism: pair counts are exact integer sums of word frequencies;
  * the per-round argmax tiebreaks (max count, then lexicographically
  * smallest pair) via a single `min(struct(-cnt, pair))` aggregate —
  * no sort, no engine-dependent float.
  */
object Bpe {

  /** Merge rule learned in one round: rank is 1-based round number. */
  final case class MergeRule(rank: Int, pair: String, cnt: Long)

  /** `" c1  c2  c3 "` wrapped-symbol char sequence of a word. The `(.)`
    * regex matches one code point in both Java regex and RE2, so the
    * char split is engine-exact.
    */
  def charSeq(word: Column): Column =
    concat(lit(" "), trim(regexp_replace(word, "(.)", "$1  ")), lit(" "))

  /** Corpus → (w, freq) vocabulary: the single corpus-sized aggregation. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"))

  /** Frequency-weighted adjacent-symbol pair counts of a vocab frame
    * (`w, freq, seq`). Symbols posexplode once; the neighbor comes from a
    * per-word lead window — the tokenization never re-inlines into a
    * nested HOF (the measured 6.8× trap documented in BASELINE).
    */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val win = Window.partitionBy("w").orderBy("pos")
    vocab
      .select(col("w"), col("freq"),
        posexplode(split(trim(col("seq")), "  ")).as(Seq("pos", "sym")))
      .select(col("freq"), col("sym"), lead(col("sym"), 1).over(win).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy(concat_ws(" ", col("sym"), col("nxt")).as("pair"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Train `rounds` BPE merges over the corpus; returns the learned merge
    * table and the final vocab frame (`w, freq, seq`) for encoding.
    * The returned vocab is a live lazy checkpoint — consumers may join
    * against it; blocks release with the session (or the next GC).
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): (Seq[MergeRule], DataFrame) = {
    require(rounds >= 1, "rounds must be >= 1")
    var vocab = wordVocab(docs, textCol)
      .select(col("w"), col("freq"), charSeq(col("w")).as("seq"))
      .localCheckpoint(false)
    val merges = Seq.newBuilder[MergeRule]
    for (r <- 1 to rounds) {
      // single-row argmax: min over (-cnt, pair) = max count, then
      // lexicographically smallest pair — deterministic without a sort
      val best = pairCounts(vocab)
        .agg(min(struct((-col("cnt")).as("nc"), col("pair").as("p"))).as("b"))
        .select(col("b.p").as("p"), (-col("b.nc")).as("cnt"))
        .head()
      // a corpus with no multi-symbol word left would return a null
      // struct; that is a mis-sized call (rounds ≫ mergeable pairs)
      require(!best.isNullAt(0),
        s"BPE round $r: no adjacent pair left to merge — lower `rounds`")
      val pair = best.getString(0)
      val cnt = best.getLong(1)
      val Array(l, rt) = pair.split(" ", 2)
      merges += MergeRule(r, pair, cnt)
      // map-only literal merge; lazy checkpoint truncates round lineage,
      // previous round's blocks released once this round materializes
      val merged = vocab
        .withColumn("seq", replaceLiteral(col("seq"), s" $l  $rt ", s" $l$rt "))
        .localCheckpoint(false)
      merged.count() // materialize before releasing the parent's blocks
      releaseCheckpoint(vocab)
      vocab = merged
    }
    (merges.result(), vocab)
  }

  /** Literal (non-regex) replace — `functions.replace`, codegen'd
    * `UTF8String.replace`, leftmost non-overlapping scan-after-match.
    */
  private def replaceLiteral(src: Column, search: String, repl: String): Column =
    replace(src, lit(search), lit(repl))

  /** Per-word BPE token count of a trained vocab frame. */
  def symbolCount(seq: Column): Column = size(split(trim(seq), "  "))

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(blocking = false)
      case _                                            => ()
    }

  /** The declared round count — shared by the queries and the oracle
    * builder so both unroll identically.
    */
  private[ext] val Rounds = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The learned merge table itself: (rank, pair, cnt) for 8 rounds of
    // corpus-weighted BPE over `documents.text`.
    "q_bpe_merges" -> { (s, dir) =>
      val (merges, vocab) = train(Tables.documents(s, dir), "text", Rounds)
      releaseCheckpoint(vocab)
      import s.implicits._
      merges.toDF()
        .select(col("rank").cast("long").as("rank"), col("pair"), col("cnt"))
        .orderBy("rank")
    },

    // BPE ENCODE as a vocab join — the production shape: documents never
    // re-run the merge loop; each word looks up its final symbol count in
    // the trained vocab (corpus-keyed equi join; at web scale a shuffle
    // hash join on the word key, vocab ≪ corpus). Output: per-doc word
    // and BPE-token counts.
    "q_bpe_encode" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val (_, vocab) = train(d, "text", Rounds)
      // merge-hinted: the trained vocab is corpus-class at 100 TB — a
      // stats-driven broadcast at test SF would be fatal at scale
      d.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .hint("merge")
        .join(vocab.select(col("w"), symbolCount(col("seq")).as("n_sym")).hint("merge"),
          Seq("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe"))
        .orderBy("doc_id")
    },

    // End-to-end TOKENIZE → PACK: per-doc BPE token counts (trained vocab
    // join, as q_bpe_encode) feed sequence packing into 2048-token
    // context windows per source stream (Curation.packBins's
    // concatenate-then-chunk prefix-sum) — the "prepare training
    // batches" composition: tokenizer-aware bin boundaries instead of
    // char-count proxies. Docs with zero tokens pack nothing (inner
    // join), mirrored by the oracle. At scale the pack stage swaps to
    // packBinsTwoPass (bit-identical by CurationPropertySpec law).
    "q_bpe_pack" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val (_, vocab) = train(d, "text", Rounds)
      val counts = d
        .select(col("doc_id"), col("source"), explode(TextOps.tokens(col("text"))).as("w"))
        .hint("merge")
        .join(vocab.select(col("w"), symbolCount(col("seq")).as("n_sym")).hint("merge"),
          Seq("w"))
        .groupBy("doc_id", "source")
        .agg(sum(col("n_sym")).as("n_bpe"))
      Curation.packBins(counts, "doc_id", "n_bpe", "source", PackBudget)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bpe")).as("bpe_tokens"))
        .orderBy("source", "bin")
    }
  )

  /** Context-window token budget for [[q_bpe_pack]] — shared with the
    * oracle. */
  private[ext] val PackBudget = 2048L

  // ---- DuckDB oracle: the same Rounds-round loop unrolled as CTEs ----

  /** The shared tokenizer SQL — one definition (TextQueries) so a
    * tokenization-rule change can never desynchronize the BPE oracles.
    */
  private def Toks = TextQueries.Toks

  /** `v0 … v$Rounds` + `b1 … b$Rounds` CTE chain mirroring [[train]]
    * exactly: same wrapped-symbol encoding, same weighted pair counts,
    * same (cnt DESC, pair ASC) argmax, same literal replace.
    */
  private def bpeCtes(rounds: Int): String = {
    val v0 = "v0 AS (SELECT w, CAST(count(*) AS BIGINT) AS freq, " +
      "' ' || trim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' ' AS seq " +
      s"FROM (SELECT unnest($Toks) AS w FROM documents) GROUP BY 1)"
    val rounds_ = (1 to rounds).map { r =>
      val prev = s"v${r - 1}"
      s"p$r AS (SELECT pr AS pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (" +
        "SELECT freq, unnest(list_transform(generate_series(1, len(s) - 1), " +
        "i -> s[i] || ' ' || s[i + 1])) AS pr " +
        s"FROM (SELECT freq, string_split(trim(seq), '  ') AS s FROM $prev)) GROUP BY 1), " +
        s"b$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair ASC LIMIT 1), " +
        s"v$r AS (SELECT w, freq, replace(seq, " +
        "' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ', " +
        s"' ' || replace(pair, ' ', '') || ' ') AS seq FROM $prev CROSS JOIN b$r)"
    }
    (v0 +: rounds_).mkString(", ")
  }

  def oracleSql: Map[String, String] = Map(
    "q_bpe_merges" -> (s"WITH ${bpeCtes(Rounds)} " +
      (1 to Rounds)
        .map(r => s"SELECT CAST($r AS BIGINT) AS rank, pair, cnt FROM b$r")
        .mkString(" UNION ALL ") +
      " ORDER BY rank"),
    "q_bpe_encode" -> (s"WITH ${bpeCtes(Rounds)} " +
      "SELECT doc_id, count(*) AS n_words, " +
      "CAST(sum(len(string_split(trim(seq), '  '))) AS BIGINT) AS n_bpe " +
      s"FROM (SELECT doc_id, unnest($Toks) AS w FROM documents) " +
      s"JOIN v$Rounds USING (w) GROUP BY 1 ORDER BY doc_id"),
    // the encode chain + the q_pack_bins prefix-sum, on BPE counts
    "q_bpe_pack" -> (s"WITH ${bpeCtes(Rounds)}, " +
      "enc AS (SELECT doc_id, source, " +
      "CAST(sum(len(string_split(trim(seq), '  '))) AS BIGINT) AS n_bpe " +
      s"FROM (SELECT doc_id, source, unnest($Toks) AS w FROM documents) " +
      s"JOIN v$Rounds USING (w) GROUP BY 1, 2), " +
      "c AS (SELECT source, n_bpe, coalesce(sum(n_bpe) OVER (" +
      "PARTITION BY source ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior FROM enc) " +
      s"SELECT source, CAST(prior // $PackBudget AS BIGINT) AS bin, " +
      "count(*) AS n_docs, CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens " +
      "FROM c GROUP BY 1, 2 ORDER BY 1, 2")
  )
}
