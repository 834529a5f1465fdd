package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north-star EXT —
  * the reference has no text ops; repo:BASELINE.json "LLM-data-pipeline
  * operators … designed for 100 TB scale").
  *
  * Everything here is pure `Column` algebra — per-row, no UDFs, fully inside
  * WholeStageCodegen, trivially data-parallel at any scale (no shuffle is
  * introduced by any of these expressions; only downstream groupBys shuffle).
  * Higher-order functions (`transform`/`filter`/`aggregate`) run over token
  * arrays without leaving Tungsten rows.
  */
object TextOps {

  /** Minimal English stopword list used by the quality heuristics. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** Language marker profiles for the n-gram/marker-word language-ID
    * heuristic, in deterministic priority order for argmax tie-breaks.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and", "of"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai"))

  /** Whitespace tokenization; robust to repeated/leading whitespace. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: GPT-2-style pretokenizer simplified to the
    * alpha/digit/other classes present in this corpus.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"), lit(0)))

  /** Count of tokens exactly equal to `word`. */
  def wordCount(toks: Column, word: String): Column =
    size(filter(toks, t => t === word))

  def stopwordRatio(toks: Column): Column = {
    val hits = Stopwords.map(w => wordCount(toks, w)).reduce(_ + _)
    when(size(toks) === 0, 0.0).otherwise(hits.cast("double") / size(toks))
  }

  /** Type-token ratio: distinct tokens / tokens (vocabulary diversity). */
  def typeTokenRatio(toks: Column): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))

  def avgWordLen(toks: Column): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /** Composite quality score in [0,1]: length, non-stopword density, word
    * length, vocabulary diversity — the standard cheap pre-filter shape for
    * pretraining corpora. Deliberately UNrounded: per-row IEEE arithmetic
    * with a fixed association order is bit-identical across engines, while
    * decimal rounding of a double at a half boundary (e.g. 0.59625 → 4 dp)
    * is engine-specific (JVM BigDecimal HALF_UP vs binary rounding).
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    least(size(t).cast("double") / 100.0, lit(1.0)) * 0.25 +
      (lit(1.0) - stopwordRatio(t)) * 0.25 +
      least(avgWordLen(t) / 8.0, lit(1.0)) * 0.25 +
      typeTokenRatio(t) * 0.25
  }

  /** Marker-word score for one language profile. */
  def langScore(toks: Column, lang: String): Column =
    LangProfiles.toMap.apply(lang).map(w => wordCount(toks, w)).reduce(_ + _)

  /** Deterministic argmax language-ID: first profile (in [[LangProfiles]]
    * order) whose score equals the max wins.
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val scores = LangProfiles.map { case (l, _) => l -> langScore(t, l) }
    val maxScore = greatest(scores.map(_._2): _*)
    scores.reverse.foldLeft(lit(LangProfiles.head._1)) { case (acc, (l, s)) =>
      when(s === maxScore, lit(l)).otherwise(acc)
    }
  }

  /** Per-document text statistics via ONE tokenize + explode + aggregation —
    * semantically identical to the per-row expressions (ratios are the same
    * integer divisions in the same order ⇒ bit-identical doubles), but each
    * per-row stat column would re-evaluate the regex tokenization (lambda
    * subexpression recompute). Returns
    * (idCol, tok_cnt, ttr, stop_ratio, quality).
    */
  def docStats(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val agg = toks
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("_tc"),
        count_distinct(col("w")).as("_dt"),
        sum(when(col("w").isInCollection(Stopwords), 1L).otherwise(0L)).as("_sh"),
        sum(length(col("w")).cast("long")).as("_ls"))
    val joined = docs.select(col(idCol)).join(agg, Seq(idCol), "left")
    val tc = coalesce(col("_tc"), lit(0L))
    val ttr = when(tc === 0, 0.0).otherwise(col("_dt").cast("double") / tc)
    val stopRatio = when(tc === 0, 0.0).otherwise(col("_sh").cast("double") / tc)
    val avgLen = when(tc === 0, 0.0).otherwise(col("_ls").cast("double") / tc)
    val quality =
      least(tc.cast("double") / 100.0, lit(1.0)) * 0.25 +
        (lit(1.0) - stopRatio) * 0.25 +
        least(avgLen / 8.0, lit(1.0)) * 0.25 +
        ttr * 0.25
    joined.select(
      col(idCol),
      tc.as("tok_cnt"),
      ttr.as("ttr"),
      stopRatio.as("stop_ratio"),
      quality.as("quality"))
  }

  /** Gopher-style rule-based quality gate (Rae et al., arXiv:2112.11446
    * Table A1 — public paper; independent formulation): per-rule pass
    * flags plus the composed keep decision. EVERY comparison is integer
    * cross-multiplied (`3·tc ≤ Σlen` instead of `Σlen/tc ≥ 3`), so both
    * engines compare exact integers — no ratio doubles anywhere, which is
    * what makes a keep/drop *decision* (as opposed to a score) safe to
    * hash cross-engine.
    *
    * Rules:
    *  - `r_len`:      minToks ≤ tok_cnt ≤ maxToks
    *  - `r_wl`:       mean word length in [3, 10] (3·tc ≤ Σlen ∧ Σlen ≤ 10·tc)
    *  - `r_alpha`:    ≥ 80% of tokens contain a letter (5·alpha ≥ 4·tc)
    *  - `r_stop`:     ≥ minStopHits stopword occurrences
    *  - `r_ttr`:      type-token ratio ≥ 0.2 (5·distinct ≥ tc)
    *  - `r_sym`:      symbol-to-word ratio ≤ 0.1 for `#`/ellipsis
    *                  (10·(3·hashes + 3·"…" + dotDiff) ≤ 3·tc — the `...`
    *                  count enters as its raw length-diff, 3× the count,
    *                  so no division appears anywhere)
    *  - `r_bullet`:   ≤ 90% of lines start with a bullet (10·bl ≤ 9·nl)
    *  - `r_ellipsis`: ≤ 30% of lines end with an ellipsis (10·el ≤ 3·nl)
    *
    * The token rules ride one tokenize + explode + aggregate pass (the
    * [[docStats]] shape); the three line/symbol rules are PURE per-row
    * expressions computed on the docs side of the re-join — no second
    * tokenize, no extra shuffle. Empty docs re-join with tok_cnt = 0 and
    * fail `r_len`/`r_wl`. Flags are 0/1 ints. Map + single partial-agg —
    * no second shuffle at any scale; the gate composes with
    * [[graft.ext.Curation]] scrub/split as the standard pre-training
    * filter chain.
    */
  def gopherGate(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minToks: Int = 5,
      maxToks: Int = 100000,
      minStopHits: Int = 2): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val agg = toks
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("_tc"),
        count_distinct(col("w")).as("_dt"),
        sum(when(col("w").isInCollection(Stopwords), 1L).otherwise(0L)).as("_sh"),
        sum(length(col("w")).cast("long")).as("_ls"),
        sum(when(col("w").rlike("[A-Za-z]"), 1L).otherwise(0L)).as("_ac"))
    // line/symbol stats: per-row character arithmetic on the docs side —
    // counts via non-overlapping replace length-diffs (identical greedy
    // left-to-right semantics in Spark and DuckDB), line predicates via
    // array filter over the newline split. All map-only.
    val txt = coalesce(col(textCol), lit(""))
    val lines = split(txt, "\n")
    val docSide = docs.select(
      col(idCol),
      size(lines).cast("long").as("_nl"),
      size(filter(lines, l => substring(ltrim(l), 1, 1).isin("•", "-", "*")))
        .cast("long").as("_bl"),
      size(filter(lines, l => endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…"))))
        .cast("long").as("_el"),
      (length(txt) - length(replace(txt, lit("#"), lit("")))).cast("long").as("_hc"),
      (length(txt) - length(replace(txt, lit("..."), lit("")))).cast("long").as("_e3"),
      (length(txt) - length(replace(txt, lit("…"), lit("")))).cast("long").as("_eu"))
    val joined = docSide.join(agg, Seq(idCol), "left")
    val tc = coalesce(col("_tc"), lit(0L))
    val dt = coalesce(col("_dt"), lit(0L))
    val sh = coalesce(col("_sh"), lit(0L))
    val ls = coalesce(col("_ls"), lit(0L))
    val ac = coalesce(col("_ac"), lit(0L))
    def flag(c: Column): Column = when(c, 1).otherwise(0)
    val rLen = flag(tc >= minToks && tc <= maxToks)
    val rWl = flag(lit(3) * tc <= ls && ls <= lit(10) * tc && tc > 0)
    val rAlpha = flag(lit(5) * ac >= lit(4) * tc && tc > 0)
    val rStop = flag(sh >= minStopHits)
    val rTtr = flag(lit(5) * dt >= tc && tc > 0)
    val rSym = flag(
      lit(10) * (lit(3) * col("_hc") + col("_e3") + lit(3) * col("_eu")) <= lit(3) * tc)
    val rBullet = flag(lit(10) * col("_bl") <= lit(9) * col("_nl"))
    val rEllipsis = flag(lit(10) * col("_el") <= lit(3) * col("_nl"))
    joined.select(
      col(idCol),
      tc.as("tok_cnt"),
      rLen.as("r_len"),
      rWl.as("r_wl"),
      rAlpha.as("r_alpha"),
      rStop.as("r_stop"),
      rTtr.as("r_ttr"),
      rSym.as("r_sym"),
      rBullet.as("r_bullet"),
      rEllipsis.as("r_ellipsis"),
      (rLen * rWl * rAlpha * rStop * rTtr * rSym * rBullet * rEllipsis).as("keep"))
  }

  /** Language-ID via token explode + broadcast marker join — semantically
    * identical to [[langId]] (same profiles, same deterministic argmax) but
    * the scalable form: the per-row expression evaluates 25 marker-count
    * filters, each re-tokenizing the text (lambda subexpression recompute);
    * this version tokenizes once, joins the tiny marker table, and
    * aggregates. Docs with zero marker hits default to the first profile.
    * Returns (idCol, predicted).
    */
  def langIdByJoin(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = LangProfiles.zipWithIndex
      .flatMap { case ((lang, words), prio) => words.map(w => (lang, w, prio)) }
      .toDF("lang", "word", "prio")
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val scores = toks
      .join(broadcast(markers), col("w") === col("word"))
      .groupBy(col(idCol), col("lang"), col("prio"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("prio").asc)
    val winners = scores
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("lang").as("predicted"))
    docs
      .select(col(idCol))
      .join(winners, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("predicted"), lit(LangProfiles.head._1)).as("predicted"))
  }

  /** Casefold normalization — the canonicalization step before matching /
    * dedup keying across case and punctuation variants: lowercase, strip
    * non-alphanumerics, collapse whitespace. Pure per-row codegen
    * expressions; the regexes use only portable character classes so an
    * oracle reproduces the bytes exactly.
    */
  def caseFolded(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), "\\s+", " "))

  /** Per-(doc, token) term frequencies via one tokenize + explode +
    * count — the base relation for TF-IDF, heavy hitters, and inverted
    * indexes. One shuffle on (doc, token).
    */
  def termFrequencies(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("doc"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus-wide top-k tokens by total occurrence count — the heavy-hitter
    * profile (vocabulary head) of a corpus. Partial+final hash aggregation
    * on the token, then a global top-k over |vocab| rows — never a sort of
    * the exploded stream. Ties break on the token for determinism.
    */
  def heavyHitters(docs: org.apache.spark.sql.DataFrame, textCol: String, k: Int)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)

  /** Top-k TF-IDF terms per document. The variant here scores
    * `tf * N / df` (all-integer numerator, ONE IEEE division — engines
    * agree bit-for-bit, unlike log-based idf where libm rounding leaks):
    * rank-equivalent to classic tf·idf for ranking within a document.
    *
    * Scale shape: tf and df are both partial+final hash aggregations; the
    * df side joins back on the token key (at corpus scale, hash tokens to
    * 8-byte keys first, as [[Dedup.postings]] does for shingles); N rides
    * in as a 1-row broadcast. The per-doc rank windows over k·|docs|-ish
    * candidate rows, never the raw exploded stream.
    */
  def tfidfTopTerms(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = termFrequencies(docs, idCol, textCol)
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = Window.partitionBy("doc").orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc"), col("token"), col("tf"), col("df"), col("score"), col("rank"))
  }

  /** Canonical whitespace-normalized form used by fingerprints/dedup. */
  def normalized(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text (exact-dup key). */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** Polynomial rolling hash over characters, mod 1e9+7 — an order-sensitive
    * 31-base fingerprint. The `aggregate` higher-order fold is the semantic
    * reference; it materializes a per-character string array and runs the
    * lambda interpreted, so the hot path is the native
    * [[graft.functions.RollingHash31]] expression ([[rollingHash]] — one
    * codegen loop, bit-parity pinned in GraftFunctionsSpec). Requires
    * [[graft.functions.GraftFunctions.register]] on the session.
    */
  def rollingHash(text: Column): Column =
    call_function("graft_rollhash", normalized(text))

  /** Interpreted HOF reference for [[rollingHash]] (kept for the parity pin;
    * registration-free).
    */
  /** Compression-ratio quality proxy: deflate_len / utf8_len (requires
    * [[graft.functions.GraftFunctions.register]] on the session — uses the
    * native `graft_deflate_len` expression). Near-0 ratios flag templated
    * or repeated text that token-level repetition metrics miss (e.g. a
    * long period-k cycle defeats duplicate-2-gram counting but not
    * deflate's 32 KiB window). Deterministic across executors (fixed
    * level, JRE zlib); not cross-engine portable — spec-verified, no
    * DuckDB oracle. Empty text ⇒ ratio 0.0 by convention (the 8-byte
    * empty stream is header, not content).
    */
  def compressionRatio(text: Column): Column = {
    val rawLen = octet_length(text)
    when(rawLen === 0, lit(0.0))
      .otherwise(call_function("graft_deflate_len", text).cast("double") / rawLen)
  }

  def rollingHashFold(text: Column): Column =
    aggregate(
      filter(split(normalized(text), ""), c => c =!= ""),
      lit(0L),
      (acc, c) => (acc * 31L + ascii(c)) % 1000000007L)

  /** Corpus-fit bigram language-model fluency score — the log-free analog
    * of the CCNet/KenLM perplexity quality filter (score docs by how
    * predictable their text is under an n-gram model of the corpus
    * itself). Classic perplexity needs `ln`, which is NOT correctly
    * rounded in IEEE — libm vs `java.lang.Math` drift leaks into a
    * cross-engine hash (the same reason [[tfidfTopTerms]] scores
    * `tf·N/df` instead of log-idf). This scorer stays hash-exact by
    * construction: each bigram contributes the MLE conditional
    * probability c(w1 w2)/c(w1 ·) floor-quantized at 1e-6 — one IEEE
    * division and one exactly-representable scale per term, both
    * correctly rounded, so DuckDB and the JVM agree bit-for-bit — and
    * the per-doc aggregate is an exact integer sum with ONE final
    * division. Rank-equivalent to (the exponential of) mean bigram
    * likelihood: repetitive/templated text scores high, garbled or
    * code-switched text scores low.
    *
    * Returns (doc, n_bigrams, score_sum_q6, lm_score) — the exact integer
    * sufficient statistic rides along so downstream thresholds can stay
    * integer cross-multiplied. Docs with <2 tokens emit no row (no
    * bigram, same contract as every aggregation-based text op here).
    *
    * Scale shape: bigram generation is a map-side explode; prefix counts
    * c(w1 ·) and pair counts c(w1 w2) are partial+final hash aggregations
    * over 60-bit [[Dedup.md5Long]] keys (~9 bytes through the shuffle,
    * same collision-tolerance contract as the posting pipelines — the
    * oracle mirrors the identical hash); the count join-backs are
    * vocab-sized equi joins on those keys, merge-hinted because vocab at
    * 100 TB is corpus-class, not broadcastable. Per-doc state is one
    * integer pair. The bigram frame feeds THREE consumers (per-doc
    * occurrences + both count aggregations), so it materializes once via
    * `intermediate`, and bigrams come from [[Dedup.shingleRows]] — the
    * per-row HOF form (`transform(sequence, i => element_at(toks, i)…)`)
    * re-inlines the regex tokenization into every array reference under
    * CollapseProject: measured 7.5 s for the explode ALONE vs ~1 s total
    * through the window-based shingle path at sf0.1.
    */
  def bigramCondScore(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      intermediate: Dedup.Intermediate = Dedup.Intermediate.Local)
      : org.apache.spark.sql.DataFrame = {
    // (doc, h1 = hash(w1), h12 = hash(w1 + ' ' + w2)) — one row per bigram
    // occurrence; duplicates inside a doc collapse into occ below.
    // substring_index recovers the prefix word from the materialized
    // bigram string (tokens contain no spaces), never re-tokenizing.
    val bg = intermediate(
      Dedup.shingleRows(docs, idCol, textCol, n = 2)
        .select(col("doc"),
          Dedup.md5Long(substring_index(col("s"), " ", 1)).as("h1"),
          Dedup.md5Long(col("s")).as("h12")),
      "lm_bigrams")
    val docBg = bg.groupBy(col("doc"), col("h1"), col("h12")).agg(count(lit(1)).as("occ"))
    val c1 = bg.groupBy(col("h1")).agg(count(lit(1)).as("c1"))
    val c12 = bg.groupBy(col("h12")).agg(count(lit(1)).as("c12"))
    docBg
      .hint("merge").join(c12.hint("merge"), Seq("h12"))
      .hint("merge").join(c1.hint("merge"), Seq("h1"))
      .select(col("doc"), col("occ"),
        // per-term quantization: IEEE division + *1e6 + floor are each
        // correctly rounded ⇒ deterministic across engines
        (floor(col("c12").cast("double") / col("c1") * 1e6).cast("long") * col("occ"))
          .as("q6"))
      .groupBy(col("doc"))
      .agg(sum(col("occ")).as("n_bigrams"), sum(col("q6")).as("score_sum_q6"))
      .select(col("doc"), col("n_bigrams"), col("score_sum_q6"),
        (col("score_sum_q6").cast("double") / col("n_bigrams") / 1e6).as("lm_score"))
  }

  /** BM25 document scores for a fixed bag of query terms — the lexical
    * retrieval ranking (Robertson/Sparck Jones) every RAG corpus serves
    * next to its vector index. The idf factor here is the RATIO form
    * `(N - df + 0.5) / (df + 0.5)` — the exponential of the classic
    * `log`-idf, rank-equivalent per term and hash-exact cross-engine
    * (libm `ln` is not correctly rounded; same determinism move as
    * [[tfidfTopTerms]] / [[bigramCondScore]]). Per-term BM25 factors
    * multiply in a fixed order (idf · tf-saturation), each step a
    * correctly-rounded IEEE op, then floor-quantize at 1e-6 and sum
    * EXACTLY as integers per doc — a cross-row double sum would be
    * partition-order-dependent.
    *
    * Scale shape: one token explode filtered to the query terms BEFORE
    * aggregating (the filter reaches the exploded stream; tf rows ≤
    * |terms|·|docs|); dl comes from a map-side token count, not a second
    * explode; df (≤ |terms| rows) and the (N, avgdl) singleton broadcast.
    * The corpus is scanned once; nothing corpus-sized shuffles except the
    * per-(doc, term) tf aggregation.
    *
    * Returns (doc, n_hit, score_q6, bm25) for docs hitting ≥1 term.
    */
  def bm25Scores(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol).as("doc"), tokens(col(textCol)).as("toks"))
    val dl = base.select(col("doc"), size(col("toks")).as("dl"))
    // N and avgdl in ONE singleton aggregate: avgdl = one IEEE division of
    // an exact integer sum — deterministic
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = base
      .select(col("doc"), explode(col("toks")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(df), Seq("token"))
      .join(dl, Seq("doc"))
      .crossJoin(broadcast(stats))
      .select(col("doc"),
        // fixed op order, every step correctly rounded: idf ratio, tf
        // saturation numerator/denominator, one multiply, one divide
        floor(
          ((col("n_docs") - col("df")).cast("double") + 0.5) / (col("df").cast("double") + 0.5)
            * (col("tf").cast("double") * (k1 + 1.0))
            / (col("tf").cast("double")
              + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))
            * 1e6).cast("long").as("q6"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_hit"), sum(col("q6")).as("score_q6"))
      .select(col("doc"), col("n_hit"), col("score_q6"),
        (col("score_q6").cast("double") / 1e6).as("bm25"))
  }

  /** DSIR-style importance weights (Xie et al., Data Selection via
    * Importance Resampling): score every document by how much its hashed
    * unigram distribution looks like a TARGET subset's distribution vs the
    * raw corpus — the cheap, classifier-free quality-targeting selector.
    * The published form sums `log(p_target(f)/p_raw(f))`; this scorer uses
    * the log-free analog (same move as [[bigramCondScore]]): each token
    * occurrence contributes the add-1-smoothed probability RATIO
    * `((ct+1)·(Tr+V)) / ((cr+1)·(Tt+V))` — exact 64-bit integer products,
    * ONE IEEE division — floor-quantized at 1e-6 and integer-summed per
    * doc, with one final division by the doc's token count. Monotone in
    * the target-likeness of each token, hash-exact cross-engine.
    *
    * Scale shape: features are 60-bit [[Dedup.md5Long]] token hashes (the
    * hashed-ngram move from the paper — the feature table is vocab-sized,
    * NOT corpus-sized); target/raw counts ride ONE hash aggregation over
    * the exploded stream (ct = conditional sum, cr = count); the
    * (Tt, Tr, V) singleton broadcasts; the per-token ratio join-back is a
    * merge-hinted equi join on the hash (vocab is corpus-class at 100 TB,
    * same contract as [[bigramCondScore]]'s count joins). The token frame
    * feeds both the count aggregation and the join-back, so it
    * materializes once via `intermediate`.
    *
    * `targetPred` must be a predicate over `docs`' columns (e.g.
    * `col("source").isin("src0", "src1")`). Docs with 0 tokens emit no row.
    */
  def dsirWeights(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      intermediate: Dedup.Intermediate = Dedup.Intermediate.Local)
      : org.apache.spark.sql.DataFrame = {
    val tok = intermediate(
      docs
        .select(col(idCol).as("doc"), targetPred.cast("long").as("tgt"),
          explode(tokens(col(textCol))).as("w"))
        .select(col("doc"), col("tgt"), Dedup.md5Long(col("w")).as("h")),
      "dsir_tokens")
    val counts = tok.groupBy(col("h"))
      .agg(sum(col("tgt")).as("ct"), count(lit(1)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"),
      count(lit(1)).as("v"))
    val ratios = counts
      .crossJoin(broadcast(totals))
      .select(col("h"),
        // exact long products (bounded far below 2^63 at any plausible
        // vocab/corpus ratio), one correctly-rounded division, ×1e6, floor
        floor(((col("ct") + 1) * (col("tr") + col("v"))).cast("double")
          / ((col("cr") + 1) * (col("tt") + col("v")))
          * 1e6).cast("long").as("r_q6"))
    tok
      .hint("merge").join(ratios.hint("merge"), Seq("h"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_toks"), sum(col("r_q6")).as("w_sum_q6"))
      .select(col("doc"), col("n_toks"), col("w_sum_q6"),
        (col("w_sum_q6").cast("double") / col("n_toks") / 1e6).as("dsir_score"))
  }

  /** Count-Min Sketch bucket for hash row `r` and a token column: the
    * portable 60-bit md5 of "r-token" mod `w`. Deterministic by
    * construction — the same pairwise-independent-enough family on any
    * engine, so estimates are exactly reproducible (and SQL-oracle-able),
    * unlike seed-dependent native sketch states.
    */
  private def cmsBucket(r: Column, token: Column, w: Int): Column =
    pmod(Dedup.md5Long(concat(r.cast("string"), lit("-"), token)), lit(w.toLong))

  /** Build a d×w Count-Min Sketch of corpus token frequencies.
    *
    * Scale shape: token counts aggregate FIRST (partial+final hash agg —
    * the shuffle carries |vocab| rows, never the raw token stream), then
    * each vocab row folds into d counters. The sketch is ≤ d·w rows
    * regardless of corpus size, and counters are sums — partial sketches
    * from disjoint corpus shards MERGE BY ADDITION, the property that lets
    * 1000 executors build it in one pass with constant reduce state (same
    * contract as the KMV/HLL/SpaceSaving family).
    */
  def cmsSketch(docs: org.apache.spark.sql.DataFrame, textCol: String, d: Int, w: Int)
      : org.apache.spark.sql.DataFrame =
    cmsSketchFromCounts(
      docs
        .select(explode(tokens(col(textCol))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("c")),
      "token", "c", d, w)

  /** [[cmsSketch]] from an ALREADY-AGGREGATED (token, count) frame —
    * callers that also need the counts for other work (exact joins, df
    * stats) compute them once, materialize, and feed both consumers,
    * instead of paying the corpus tokenize+aggregate twice (Catalyst does
    * not dedupe the identical subtrees).
    */
  def cmsSketchFromCounts(
      counts: org.apache.spark.sql.DataFrame,
      tokenCol: String,
      countCol: String,
      d: Int,
      w: Int): org.apache.spark.sql.DataFrame = {
    require(d >= 1 && w >= 2, "need at least one hash row and two buckets")
    counts
      .select(col(tokenCol).as("token"), col(countCol).as("c"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(col("r"), cmsBucket(col("r"), col("token"), w).as("bucket"))
      .agg(sum(col("c")).as("cnt"))
  }

  /** Streaming-legal CMS build: ONE aggregation (explode tokens ×d →
    * groupBy(r, bucket) count), because Structured Streaming allows a
    * single aggregation per query. Trade vs [[cmsSketch]]: the shuffle
    * carries the token stream ×d instead of |vocab| rows (map-side
    * partial agg still combines), but the STATE is ≤ d·w counters forever
    * — the bounded-state answer to "token frequencies over an unbounded
    * stream", where exact streaming counts grow state with vocabulary.
    * Works identically on a batch frame (StreamingTextSpec pins parity).
    */
  def cmsSketchStreaming(docs: org.apache.spark.sql.DataFrame, textCol: String, d: Int, w: Int)
      : org.apache.spark.sql.DataFrame = {
    require(d >= 1 && w >= 2, "need at least one hash row and two buckets")
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .select(col("token"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(col("r"), cmsBucket(col("r"), col("token"), w).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate token frequencies from a CMS: est(t) = min over the d
    * rows of counter[r][bucket(r, t)] — never an under-estimate, over by
    * at most ε·N with the usual CMS bound. The d·w-row sketch broadcasts;
    * the probe side never shuffles.
    */
  def cmsEstimate(
      cms: org.apache.spark.sql.DataFrame,
      probes: org.apache.spark.sql.DataFrame,
      tokenCol: String,
      d: Int,
      w: Int): org.apache.spark.sql.DataFrame =
    probes
      .select(col(tokenCol).as("token"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col("token"), w))
      .join(broadcast(cms), Seq("r", "bucket"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Synthesize newline-delimited "lines" of `tokensPerLine` tokens from a
    * corpus that ships none (the driver fixtures) — the shared convention
    * of every line-granularity query (q_line_dedup, q_c4_clean): tokenize
    * ONCE via posexplode (the nested-HOF form re-inlines the regex
    * tokenizer into every line slice — measured 4.6 s vs ~1 s at sf0.1),
    * group exploded rows into lines, reassemble per doc in order.
    * Token-less docs emit no row (mirrored by the oracles' len(toks) > 0).
    * Returns `(idCol, textCol)` with the synthesized newline text.
    */
  def synthesizeLines(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      tokensPerLine: Int): org.apache.spark.sql.DataFrame = {
    require(tokensPerLine >= 1, "tokensPerLine must be positive")
    val lines = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .groupBy(col(idCol), floor(col("pos") / tokensPerLine).cast("long").as("li"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          t => t.getField("tok"))).as("line"))
    lines
      .groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("li"), col("line")))),
          t => t.getField("line"))).as(textCol))
  }

  /** C4-style per-LINE keep predicate (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning…" §2.2 — the C4 cleaning rules): a line
    * survives iff it has ≥ `minToks` whitespace tokens, contains none of
    * `badTokens` (C4 drops lines mentioning "javascript" — the
    * cookie-banner / JS-warning boilerplate class), and — when
    * `requireTerminal` — ends in terminal punctuation (`.` `!` `?` `"`,
    * C4's sentence heuristic). Pure codegen Column algebra; the token
    * membership test is an `exists` over ONE tokenize of the line.
    */
  def c4LineKeep(
      line: Column,
      minToks: Int,
      badTokens: Seq[String],
      requireTerminal: Boolean): Column = {
    val toks = tokens(line)
    val base = size(toks) >= minToks &&
      (if (badTokens.isEmpty) lit(true)
       else !exists(toks, t => t.isInCollection(badTokens)))
    if (requireTerminal)
      base && substring(rtrim(line), -1, 1).isin(".", "!", "?", "\"")
    else base
  }

  /** Intra-document line deduplication — the CCNet within-page stage that
    * [[graft.ext.Dedup.lineDedup]]'s ACROSS-document hot-line drop does
    * not cover: repeated navigation blocks, duplicated paragraphs from
    * templating bugs, copy-paste stutter. Keeps each line's FIRST
    * occurrence (order preserved), drops later repeats.
    *
    * Scale shape: entirely per-row higher-order-function Column algebra —
    * an indexed `filter` whose predicate asks "does this line occur in
    * the prefix before me?" (`array_position` over a `slice`). Quadratic
    * in LINES PER DOCUMENT (bounded by document size, not corpus size)
    * and ZERO shuffle at any corpus scale; like [[c4Clean]] it composes
    * directly into streaming plans.
    *
    * Returns (idCol, n_lines, n_removed, clean_text).
    */
  def intraDocLineDedup(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val lines = split(col(textCol), "\n")
    docs
      .withColumn("_lines", lines)
      .withColumn("_kept",
        filter(col("_lines"), (x, i) =>
          array_position(slice(col("_lines"), lit(1), i), x) === 0))
      .select(
        col(idCol),
        size(col("_lines")).cast("long").as("n_lines"),
        (size(col("_lines")) - size(col("_kept"))).cast("long").as("n_removed"),
        array_join(col("_kept"), "\n").as("clean_text"))
  }

  /** C4-style line-level page cleaning — the web-corpus curation step
    * between raw extraction and document-level gates like [[gopherGate]]:
    * drop boilerplate LINES (too short, marker words, no terminal
    * punctuation), then drop whole PAGES left with fewer than
    * `minKeptLines` surviving lines (C4's "at least 3 sentences" rule).
    * Returns one row per doc: `(idCol, n_lines, n_kept, keep, clean_text)`
    * where `clean_text` re-joins the kept lines in order ("" when nothing
    * survives — the row stays, carrying the keep=false verdict).
    *
    * Scale shape: entirely per-row higher-order-function Column algebra
    * over the newline split — ZERO shuffle at any corpus size (the text
    * is tokenized once per LINE inside one `filter` lambda, never once
    * per rule). Composes ahead of [[gopherGate]] / [[graft.ext.Curation]]
    * scrub+split as the standard C4→Gopher pre-training filter chain.
    */
  def c4Clean(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minLineToks: Int = 5,
      badTokens: Seq[String] = Seq("javascript"),
      minKeptLines: Int = 3,
      requireTerminal: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(minLineToks >= 1, "minLineToks must be positive")
    require(minKeptLines >= 1, "minKeptLines must be positive")
    val lines = split(coalesce(col(textCol), lit("")), "\n", -1)
    val kept = filter(lines, l => c4LineKeep(l, minLineToks, badTokens, requireTerminal))
    docs.select(
      col(idCol),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      (size(kept) >= minKeptLines).as("keep"),
      array_join(kept, "\n").as("clean_text"))
  }

  /** Collocation mining by integer LIFT — the corpus-linguistics pass
    * that surfaces multiword expressions ("new york", "machine
    * learning") for tokenizer/vocab decisions. The statistic is
    * `P(b|a)/P(b) = cnt_ab·N / (cnt_a·cnt_b)`, computed as the two-step
    * integer floor-division `((cnt_ab·10⁶) div cnt_a)·N div cnt_b` — the
    * log-free PMI analog (rank-equivalent to PMI per pair; libm `log`
    * could never hash cross-engine — the bm25Scores/tfidf discipline),
    * truncation documented by the op order. `minCount` floors the bigram
    * support (a 2-occurrence pair has meaninglessly high lift).
    * Plan: bigrams from the windowed shingle path (posexplode ONCE),
    * one bigram agg + one unigram agg (vocab-sized frames join — at
    * 100 TB the merge-hinted vocab-join pattern), the token total a
    * broadcast singleton. Returns (w1, w2, cnt_ab, lift_q6).
    */
  def collocations(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minCount: Int): org.apache.spark.sql.DataFrame = {
    require(minCount >= 2, "minCount must be >= 2")
    val ab = Dedup.shingleRows(docs, idCol, textCol, n = 2)
      .groupBy(col("s")).agg(count(lit(1)).as("cnt_ab"))
      .filter(col("cnt_ab") >= minCount)
      .select(substring_index(col("s"), " ", 1).as("w1"),
        substring_index(col("s"), " ", -1).as("w2"), col("cnt_ab"))
    val uni = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nTok = uni.agg(sum(col("c")).as("n_tok"))
    ab
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(nTok))
      .select(col("w1"), col("w2"), col("cnt_ab"),
        expr("cnt_ab * 1000000 div c1 * n_tok div c2").as("lift_q6"))
  }

  /** Per-SOURCE boilerplate line removal — the RefinedWeb/CCNet
    * template-stripping step that global line dedup
    * ([[graft.ext.Dedup.lineDedup]]) cannot express: a navigation bar or
    * cookie banner repeats across a DOMAIN's pages, so the hot set is
    * keyed (source, line) and the threshold is RELATIVE — a line is
    * boilerplate in its source iff it appears in
    * `max(minDf, ceil(minFrac · n_docs(source)))` distinct docs of that
    * source. Plan: posexplode lines ONCE (never re-inline the tokenizer
    * per reference), one (source, line)-keyed agg for the df counts
    * joined to the per-source doc counts (broadcast — |sources| rows),
    * then a left-anti join drops hot lines and a doc-keyed agg rebuilds
    * the residual in line order. Every exchange is on a hashable key;
    * nothing is quadratic in docs or sources. Returns
    * (doc, source, n_lines, n_removed, clean_text) for every input doc.
    */
  def boilerplateStrip(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      srcCol: String,
      minFrac: Double,
      minDf: Int = 2): org.apache.spark.sql.DataFrame = {
    require(minFrac > 0 && minFrac <= 1, "minFrac must be in (0, 1]")
    require(minDf >= 2, "minDf must be >= 2 (a df-1 line is content, not template)")
    val lines = docs.select(
      col(idCol).as("doc"), col(srcCol).as("src"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    val key = trim(col("line"))
    val nonBlank = lines.filter(key =!= "")
    val nDocs = nonBlank.groupBy(col("src"))
      .agg(count_distinct(col("doc")).as("n_docs"))
    val hot = nonBlank
      .groupBy(col("src"), key.as("k"))
      .agg(count_distinct(col("doc")).as("df"))
      .join(broadcast(nDocs), Seq("src"))
      .filter(col("df") >= greatest(lit(minDf.toLong),
        ceil(lit(minFrac) * col("n_docs")).cast("long")))
      .select(col("src"), col("k"))
    val kept = lines.filter(key === "")
      .unionByName(nonBlank.join(hot,
        nonBlank("src") === hot("src") && key === hot("k"), "left_anti"))
    val rebuilt = kept
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line"))).as("clean_text"))
    docs
      .select(col(idCol).as("doc"), col(srcCol).as("source"),
        size(split(col(textCol), "\n", -1)).as("n_lines"))
      .join(rebuilt, Seq("doc"), "left")
      .select(
        col("doc"), col("source"), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Hashed linear quality-classifier INFERENCE — the fastText-style model
    * shape behind published quality filters (CCNet, FineWeb-Edu): hash each
    * token to a weight, score = mean weight, keep above a threshold. The
    * weights here are a deterministic md5-derived stand-in
    * (`md5Long(tok) % 1001 - 500` ∈ [-500, 500]) so the oracle can replay
    * them; a trained model swaps in a broadcast `Map[hash → weight]`
    * without changing the plan. Score = Σw / (500·n) — one IEEE division
    * of exact integers, engine-portable. Shape: tokenize-once explode +
    * one doc-keyed aggregation (map-side combine; the 100 TB plan is one
    * scan + one shuffle of (doc, partial-sum) rows).
    * Returns (idCol, n_tokens, score, keep). Docs with zero tokens carry
    * score 0 and are dropped (keep = false) like the length gates do.
    */
  def classifierScores(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.0): org.apache.spark.sql.DataFrame = {
    val w = (Dedup.md5Long(col("w")) % 1001L - 500L).as("wt")
    val agg = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .select(col(idCol), w)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("wt")).as("_ws"))
    val score = col("_ws").cast("double") / (col("n_tokens") * 500L)
    docs
      .select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(score, lit(0.0)).as("score"),
        coalesce(score > threshold, lit(false)).as("keep"))
  }

  /** Positional postings (idCol, pos, tok) — the inverted-index frame with
    * 0-based token positions that phrase / proximity search builds on.
    * One tokenize + posexplode; pos is widened to long so the frame joins
    * against position arithmetic without implicit casts.
    */
  def positionalPostings(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol), posexplode(tokens(col(textCol))))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("col").as("tok"))

  /** Exact phrase search over [[positionalPostings]]: a document matches at
    * position p when word_i sits at p+i for every phrase word — the
    * positional-index join every search engine runs for quoted queries.
    * Each word's posting sub-frame is filtered BEFORE the join (token
    * equality pushes to the posting scan), so the join touches only the
    * phrase's own postings — corpus-independent once the index frame is
    * materialized; `n − 1` co-keyed joins for an n-word phrase.
    * Returns (idCol, n_hits, first_pos).
    */
  def phraseMatches(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two words")
    val post = positionalPostings(docs, idCol, textCol)
    val first = post.filter(col("tok") === phrase.head).select(col(idCol), col("pos"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (w, i)) =>
      acc.join(
        post.filter(col("tok") === w).select(col(idCol), (col("pos") - i).as("pos")),
        Seq(idCol, "pos"))
    }
    matched
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
  }

  /** Per-document character-distribution statistics — the gibberish /
    * encoding-noise signal class (a natural-language doc has a skewed but
    * wide char distribution; base64 blobs, minified JS and mojibake do
    * not). Emits exact-integer counters plus the Rényi-2 collision
    * probability Σc² / n² (the no-log entropy proxy: high ⇒ few chars
    * dominate ⇒ repetitive; ~uniform text ⇒ 1/|alphabet|) as ONE IEEE
    * division of exact integers. Shape: char explode + (doc, char) count +
    * doc rollup — two map-side-combining aggregations on the doc key, no
    * joins; at 100 TB the (doc, char) frame is ≤ alphabet-size rows per
    * doc. Returns (idCol, n_chars, distinct_chars, max_char_cnt,
    * collision_prob).
    */
  def charStats(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), "")).as("c"))
      .filter(col("c") =!= "")
      .groupBy(col(idCol), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        sum(col("cnt")).as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        max(col("cnt")).as("max_char_cnt"),
        sum(col("cnt") * col("cnt")).as("_sq"))
      .select(
        col(idCol),
        col("n_chars"),
        col("distinct_chars"),
        col("max_char_cnt"),
        (col("_sq").cast("double") / (col("n_chars") * col("n_chars"))).as("collision_prob"))
}
