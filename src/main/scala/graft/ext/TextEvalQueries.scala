package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared MODEL-EVALUATION and vocabulary-statistics queries over
  * `documents` (split out of [[TextQueries]] round 14 — pure code motion;
  * [[graft.SparkEntry]] unions both maps): classifier-gate agreement
  * (McNemar, Cohen's κ), calibration / PR curves, quality-classifier and
  * ensemble scoring, readability, uncertainty sampling, feature hashing,
  * and the vocabulary family (coverage, hapax ratio, vocab growth).
  * Oracles replicate the exact same deterministic per-row expressions
  * (list lambdas in DuckDB ≡ higher-order functions in Spark), so results
  * hash-match bit-for-bit on integer outputs and to 4 decimals on ratios.
  */
object TextEvalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // McNEMAR'S PAIRED TEST between two quality gates on the SAME docs —
    // "does the ML classifier keep a different population than the cheap
    // length rule?" is a paired question (the unpaired χ² wastes the
    // per-doc pairing): only the disagreement cells b/c matter,
    // χ² = (b−c)²/(b+c). Gate 1 = token count ≥ 50; gate 2 =
    // [[TextOps.classifierScores]] keep (score > 0 ⇔ the exact integer
    // weight sum > 0, so the flag is hash-stable). Cells exact BIGINT,
    // one float division. Two derivations of the same corpus meet on a
    // doc-keyed merge join.
    "q_mcnemar_gates" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val g1 = docs.select(col("doc_id"),
        (TextOps.tokenCount(col("text")) >= 50).as("k1"))
      val g2 = TextOps.classifierScores(docs, "doc_id", "text", threshold = 0.0)
        .select(col("doc_id"), col("keep").as("k2"))
      g1.hint("merge")
        .join(g2.hint("merge"), Seq("doc_id"))
        .agg(
          sum(when(col("k1") && col("k2"), 1L).otherwise(0L)).as("a"),
          sum(when(col("k1") && !col("k2"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("k1") && col("k2"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("k1") && !col("k2"), 1L).otherwise(0L)).as("d"))
        .select(col("a"), col("b"), col("c"), col("d"),
          when(col("b") + col("c") > 0,
            ((col("b") - col("c")) * (col("b") - col("c"))).cast("double") /
              (col("b") + col("c")).cast("double"))
            .otherwise(lit(0.0)).as("mcnemar"))
    },

    // COHEN'S KAPPA between the same two quality gates q_mcnemar_gates
    // reads (cheap length rule vs hashed classifier): chance-corrected
    // AGREEMENT — the "are these two annotators interchangeable" number,
    // where McNemar asks whether their disagreement is DIRECTIONAL. From
    // the identical 2×2 cells: κ = (N·(a+d) − pe2)/(N² − pe2) with
    // pe2 = (a+b)(a+c) + (c+d)(b+d) — exact BIGINT numerator/denominator,
    // ONE double division (cells ≤ N ⇒ products ≤ N², Long-safe to
    // ~3e9 docs). Degenerate margins (N² = pe2) pin κ = 0.
    "q_cohen_kappa" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val g1 = docs.select(col("doc_id"),
        (TextOps.tokenCount(col("text")) >= 50).as("k1"))
      val g2 = TextOps.classifierScores(docs, "doc_id", "text", threshold = 0.0)
        .select(col("doc_id"), col("keep").as("k2"))
      val n = col("a") + col("b") + col("c") + col("d")
      val pe2 = (col("a") + col("b")) * (col("a") + col("c")) +
        (col("c") + col("d")) * (col("b") + col("d"))
      g1.hint("merge")
        .join(g2.hint("merge"), Seq("doc_id"))
        .agg(
          sum(when(col("k1") && col("k2"), 1L).otherwise(0L)).as("a"),
          sum(when(col("k1") && !col("k2"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("k1") && col("k2"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("k1") && !col("k2"), 1L).otherwise(0L)).as("d"))
        .select(col("a"), col("b"), col("c"), col("d"),
          when(n * n > pe2,
            (n * (col("a") + col("d")) - pe2).cast("double") /
              (n * n - pe2).cast("double"))
            .otherwise(0.0).as("kappa"))
    },

    // CALIBRATION CURVE (reliability diagram) of the hashed quality
    // classifier against the token-count pseudo-label — the audit run
    // before trusting classifier scores for quota/threshold decisions:
    // per confidence decile, observed positive rate vs mean stated
    // confidence and their gap (the per-bucket term of ECE). Confidence =
    // (score+1)/2 ∈ [0,1] (the signed hash score mapped once, both
    // engines the same float expression, then floored to q6 so every
    // aggregate is an exact integer); buckets are deciles of the same
    // mapped confidence. All emitted quotients are non-negative
    // truncating DIVs — identical to DuckDB // on non-negative operands.
    "q_calibration_curve" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val sc = TextOps.classifierScores(d, "doc_id", "text")
        .select(col("doc_id"), col("score"),
          floor((col("score") + 1.0) * 500000.0).cast("long").as("conf_q6"))
      val lab = d.select(col("doc_id"),
        (TextOps.tokenCount(col("text")) >= 50).cast("long").as("pos"))
      sc.join(lab, Seq("doc_id"))
        .groupBy(least(floor((col("score") + 1.0) * 5), lit(9L)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("conf_q6")).as("sum_conf_q6"),
          sum(col("pos")).as("n_pos"))
        .select(col("bucket"), col("n"), col("n_pos"),
          expr("sum_conf_q6 DIV n").as("conf_q6"),
          expr("n_pos * 1000000 DIV n").as("acc_q6"),
          abs(expr("sum_conf_q6 DIV n") - expr("n_pos * 1000000 DIV n")).as("gap_q6"))
        .orderBy("bucket")
    },

    // Quality-gate ENSEMBLE: majority vote (2 of 3) across independent
    // filter families — rule-based (Gopher), model-based (hashed linear
    // classifier), distributional (char collision probability < 0.08,
    // the gibberish pole) — the production pattern: no single filter is
    // trusted to kill a document alone. Three scans by construction
    // (three independent models over the corpus); each arm stays its own
    // one-pass plan, the vote is two doc-keyed joins of 0/1 columns.
    "q_quality_ensemble" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val g = TextOps.gopherGate(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep").cast("long").as("k_gopher"))
      val c = TextOps.classifierScores(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep").cast("long").as("k_clf"))
      val ch = TextOps.charStats(docs, "doc_id", "text")
        .select(col("doc_id"), (col("collision_prob") < 0.08).cast("long").as("k_char"))
      g.join(c, Seq("doc_id")).join(ch, Seq("doc_id"))
        .withColumn("votes", col("k_gopher") + col("k_clf") + col("k_char"))
        .withColumn("keep", col("votes") >= 2)
        .orderBy("doc_id")
    },

    // fastText-style hashed linear classifier inference (the model shape
    // behind CCNet / FineWeb-Edu quality filters) with deterministic
    // md5-derived weights — tokenize-once explode + one doc-keyed agg;
    // score is one IEEE division of exact integer sums.
    "q_quality_classifier" -> { (s, dir) =>
      TextOps
        .classifierScores(Tables.documents(s, dir), "doc_id", "text", threshold = 0.0)
        .orderBy("doc_id")
    },

    // Vocabulary coverage (Zipf) curve: top-50 tokens by frequency with
    // cumulative corpus-coverage share — the "how much does a K-word vocab
    // cover" sizing curve for tokenizer/stopword decisions. One exploded
    // hash aggregation (map-side combine) collapses the corpus to
    // VOCABULARY-sized rows; the rank/cumsum windows run over that tiny
    // frame (single partition is fine — vocab ≪ corpus at any SF).
    // Coverage is a ×10⁶ truncating quotient of exact BIGINTs.
    "q_vocab_coverage" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
      // total rides an unpartitioned window over the SAME vocab-sized frame
      // (a separate .agg branch would re-scan and re-explode the corpus);
      // all three windows share the one single-partition exchange
      tf.withColumn("rank", row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
        .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
        .filter(col("rank") <= 50)
        .withColumn("cum_cnt", sum(col("cnt")).over(
          Window.orderBy(col("rank")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("rank"), col("token"), col("cnt"), col("cum_cnt"),
          // two-limb exact quotient: cum*1e6 wraps Long past ~9.2e12
          // corpus tokens — one notch above web-scale token counts
          expr("(cum_cnt * 1000 DIV total) * 1000 + " +
            "((cum_cnt * 1000) % total) * 1000 DIV total").as("cov_q6"))
        .orderBy("rank")
    },

    // LEXICAL RICHNESS per source — type/token ratio + hapax-legomena
    // share: a source whose hapax share collapses is template/boilerplate
    // heavy (low lexical diversity), the cheap screen before spending a
    // classifier on it. ONE tokenize explode → (source, token) counts →
    // per-source rollup; ratios are ×10⁶ truncating quotients of exact
    // BIGINTs.
    "q_hapax_ratio" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
          expr("n_types * 1000000 DIV n_tokens").as("ttr_q6"),
          expr("n_hapax * 1000000 DIV n_types").as("hapax_q6"))
        .orderBy("source")
    },

    // HEAPS-LAW vocabulary growth curve — "is the corpus still teaching
    // the tokenizer new types?": each token's FIRST document (min doc_id
    // over one exploded pass), bucketed into ingest-order deciles, gives
    // new-type counts per decile + the cumulative vocabulary. The
    // corpus-level twin of q_content_novelty's per-doc fraction; the
    // curve flattening is the "more data stops adding vocabulary" signal
    // a tokenizer-budget decision reads. Cumsum runs over the 10-row
    // decile frame only.
    "q_vocab_growth" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val firstSeen = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(min(col("doc_id")).as("first_doc"))
      val nDocs = docs.agg((max(col("doc_id")) + 1).as("n_docs"))
      firstSeen
        .crossJoin(broadcast(nDocs))
        .groupBy(expr("least(first_doc * 10 DIV n_docs, 9)").as("decile"))
        .agg(count(lit(1)).as("new_types"))
        .withColumn("cum_vocab",
          sum(col("new_types")).over(Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("decile")
    },

    // Classifier CALIBRATION curve (reliability diagram) — the fasttext-
    // style score binned against the rule-based Gopher gate as reference
    // label: per score-decile doc counts, gate-pass counts, pass rate
    // (×10⁶ truncating quotient) and the per-row-quantized score sum.
    // This is the "can I trust threshold X" audit run before committing a
    // classifier cut on 100 TB. Both inputs are one tokenize+agg pass over
    // documents meeting on the doc key; the bucket bin of the [-1,1] score
    // is floor of one identically-computed double, clamped.
    "q_calibration" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val sc = TextOps.classifierScores(docs, "doc_id", "text")
        .select(col("doc_id"), col("score"))
      val gate = TextOps.gopherGate(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep").cast("long").as("gk"))
      sc.join(gate, Seq("doc_id"))
        .groupBy(least(greatest(floor((col("score") + 1.0) * 5).cast("long"), lit(0L)),
          lit(9L)).as("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("gk")).as("n_pass"),
          sum(floor(col("score") * 1e6).cast("long")).as("score_q6_sum"))
        .select(col("bucket"), col("n_docs"), col("n_pass"),
          expr("n_pass * 1000000 DIV n_docs").as("pass_q6"), col("score_q6_sum"))
        .orderBy("bucket")
    },

    // Precision/recall THRESHOLD SWEEP of the hash classifier against the
    // Gopher gate label — the full operating-curve companion to
    // q_calibration (pick the cut BEFORE filtering 100 TB). 21 thresholds
    // t = (k−10)/10; the predicate compares score·10 > k−10 (one IEEE
    // multiply of identically-computed doubles — no decimal literals).
    // One doc-keyed join, one 21-row broadcast, ONE aggregation: every
    // confusion cell is a conditional count, precision guards its empty
    // side with a null.
    "q_pr_curve" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val sc = TextOps.classifierScores(docs, "doc_id", "text")
        .select(col("doc_id"), col("score"))
      val gate = TextOps.gopherGate(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep").cast("long").as("gk"))
      val ks = s.range(0, 21).select(col("id").as("k"))
      sc.join(gate, Seq("doc_id"))
        .crossJoin(broadcast(ks))
        .withColumn("pred", (col("score") * 10.0 > (col("k") - 10).cast("double"))
          .cast("long"))
        .groupBy(col("k"))
        .agg(
          sum(col("pred") * col("gk")).as("tp"),
          sum(col("pred") * (lit(1L) - col("gk"))).as("fp"),
          sum((lit(1L) - col("pred")) * col("gk")).as("fn"),
          sum((lit(1L) - col("pred")) * (lit(1L) - col("gk"))).as("tn"))
        .select(col("k"), col("tp"), col("fp"), col("fn"), col("tn"),
          expr("tp * 1000000 DIV nullif(tp + fp, 0)").as("prec_q6"),
          expr("tp * 1000000 DIV nullif(tp + fn, 0)").as("rec_q6"))
        .orderBy("k")
    },

    // Flesch reading-ease scoring — the readability gate (textbook-style
    // curation filters select by grade band). Sentences = [.!?]+ runs,
    // syllables = [aeiouy]+ vowel groups: both are INTEGER regex-run
    // counts, portable Java∩RE2; the score 206.835 − 1.015·w/s − 84.6·y/w
    // is one fixed expression over exact integers — identical IEEE ops in
    // both engines. Map-only until nothing (per-doc output).
    "q_readability" -> { (s, dir) =>
      val t = lower(col("text"))
      val words = TextOps.tokenCount(col("text")).cast("long")
      val sents = greatest(
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"), lit(1L))
      val sylls = greatest(
        size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))).cast("long"), lit(1L))
      Tables.documents(s, dir)
        .filter(TextOps.tokenCount(col("text")) > 0)
        .select(col("doc_id"), words.as("n_words"), sents.as("n_sents"),
          sylls.as("n_sylls"))
        .withColumn("flesch",
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sents").cast("double"))
            - lit(84.6) * (col("n_sylls").cast("double") / col("n_words").cast("double")))
        .orderBy("doc_id")
    },

    // Active-learning UNCERTAINTY sampling: the 50 docs whose classifier
    // score sits closest to the decision threshold (|score| minimal) —
    // the labeling-budget allocator. The global top-k rides
    // TakeOrderedAndProject (per-partition heads merged), NEVER a global
    // sort; rank is assigned on the 50-row result.
    "q_uncertainty_sample" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      TextOps.classifierScores(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), floor(col("score") * 1e6).cast("long").as("score_q6"))
        .orderBy(abs(col("score_q6")), col("doc_id"))
        .limit(50)
        .withColumn("rank", row_number().over(
          Window.orderBy(abs(col("score_q6")), col("doc_id"))))
        .select(col("rank"), col("doc_id"), col("score_q6"))
        .orderBy("rank")
    },

    // Hashing-trick (Weinberger et al. 2009) bag-of-words features: each
    // token lands in bucket md5(w) mod 256 with a ±1 sign drawn from the
    // next hash bit, summed per (doc, bucket) — the fixed-width sparse
    // feature map a linear classifier trains on without a vocabulary
    // table. One tokenize explode + ONE hash aggregation with map-side
    // combine; output is corpus-sparse (only touched buckets emit).
    "q_feature_hashing" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .select(col("doc_id"), Dedup.md5Long(col("w")).as("h"))
        .select(col("doc_id"), pmod(col("h"), lit(256L)).as("bucket"),
          when(pmod(expr("h DIV 256"), lit(2L)) === 0L, 1L)
            .otherwise(-1L).as("sign"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(sum(col("sign")).as("weight"), count(lit(1)).as("n_terms"))
        .orderBy("doc_id", "bucket")
    },
  )

  def oracleSql: Map[String, String] = Map(
    // k2 flag via the exact integer weight sum (score > 0 ⇔ ws > 0);
    // empty docs coalesce to false exactly like the engine
    "q_mcnemar_gates" -> (s"WITH t AS (SELECT doc_id, ${TextQueries.Toks} AS toks FROM documents), " +
      "k AS (SELECT doc_id, len(toks) >= 50 AS k1 FROM t), " +
      "w AS (SELECT doc_id, unnest(toks) AS w FROM t), " +
      "s AS (SELECT doc_id, CAST(sum(('0x' || substr(md5(w), 1, 15))::BIGINT % 1001 - 500) " +
      "AS BIGINT) AS ws FROM w GROUP BY 1), " +
      "j AS (SELECT k.doc_id, k1, coalesce(s.ws > 0, false) AS k2 " +
      "FROM k LEFT JOIN s USING (doc_id)), " +
      "cells AS (SELECT " +
      "CAST(sum(CASE WHEN k1 AND k2 THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
      "CAST(sum(CASE WHEN k1 AND NOT k2 THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
      "CAST(sum(CASE WHEN NOT k1 AND k2 THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
      "CAST(sum(CASE WHEN NOT k1 AND NOT k2 THEN 1 ELSE 0 END) AS BIGINT) AS d FROM j) " +
      "SELECT a, b, c, d, CASE WHEN b + c > 0 THEN " +
      "CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE) " +
      "ELSE 0.0 END AS mcnemar FROM cells"),

    // identical cells; κ from exact BIGINT margin products, one division
    "q_cohen_kappa" -> (s"WITH t AS (SELECT doc_id, ${TextQueries.Toks} AS toks FROM documents), " +
      "k AS (SELECT doc_id, len(toks) >= 50 AS k1 FROM t), " +
      "w AS (SELECT doc_id, unnest(toks) AS w FROM t), " +
      "s AS (SELECT doc_id, CAST(sum(('0x' || substr(md5(w), 1, 15))::BIGINT % 1001 - 500) " +
      "AS BIGINT) AS ws FROM w GROUP BY 1), " +
      "j AS (SELECT k.doc_id, k1, coalesce(s.ws > 0, false) AS k2 " +
      "FROM k LEFT JOIN s USING (doc_id)), " +
      "cells AS (SELECT " +
      "CAST(sum(CASE WHEN k1 AND k2 THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
      "CAST(sum(CASE WHEN k1 AND NOT k2 THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
      "CAST(sum(CASE WHEN NOT k1 AND k2 THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
      "CAST(sum(CASE WHEN NOT k1 AND NOT k2 THEN 1 ELSE 0 END) AS BIGINT) AS d FROM j) " +
      "SELECT a, b, c, d, CASE WHEN (a+b+c+d)*(a+b+c+d) > (a+b)*(a+c) + (c+d)*(b+d) THEN " +
      "CAST((a+b+c+d)*(a+d) - ((a+b)*(a+c) + (c+d)*(b+d)) AS DOUBLE) / " +
      "CAST((a+b+c+d)*(a+b+c+d) - ((a+b)*(a+c) + (c+d)*(b+d)) AS DOUBLE) " +
      "ELSE 0.0 END AS kappa FROM cells"),

    // the q_sample_by_decile score CTE, mapped once to [0,1] confidence;
    // all quotients are // over non-negative exact integers
    "q_calibration_curve" -> (s"WITH t AS (SELECT doc_id, ${TextQueries.Toks} AS toks FROM documents), " +
      "w AS (SELECT doc_id, unnest(toks) AS w FROM t), " +
      "agg AS (SELECT doc_id, count(*) AS n, " +
      "CAST(sum(('0x' || substr(md5(w), 1, 15))::BIGINT % 1001 - 500) AS BIGINT) AS ws " +
      "FROM w GROUP BY 1), " +
      "sc AS (SELECT t.doc_id, coalesce(ws::DOUBLE / (n * 500), 0.0) AS score, " +
      "len(t.toks) >= 50 AS pos FROM t LEFT JOIN agg USING (doc_id)), " +
      "b AS (SELECT least(CAST(floor((score + 1.0) * 5) AS BIGINT), 9) AS bucket, " +
      "CAST(floor((score + 1.0) * 500000) AS BIGINT) AS conf6, " +
      "CASE WHEN pos THEN 1 ELSE 0 END AS p FROM sc) " +
      "SELECT bucket, count(*) AS n, CAST(sum(p) AS BIGINT) AS n_pos, " +
      "CAST(sum(conf6) AS BIGINT) // count(*) AS conf_q6, " +
      "CAST(sum(p) AS BIGINT) * 1000000 // count(*) AS acc_q6, " +
      "abs(CAST(sum(conf6) AS BIGINT) // count(*) - " +
      "CAST(sum(p) AS BIGINT) * 1000000 // count(*)) AS gap_q6 " +
      "FROM b GROUP BY 1 ORDER BY 1"),

    // three independent keep CTEs (Gopher = the factored GateKeepSql,
    // classifier score > 0, char collision < 0.08) joined into the vote
    "q_quality_ensemble" -> (s"WITH gk AS (${TextQueries.GateKeepSql}), " +
      s"tok AS (SELECT doc_id, unnest(${TextQueries.Toks}) AS w FROM documents), " +
      "sc AS (SELECT doc_id, count(*) AS n, " +
      "CAST(sum(('0x' || substr(md5(w), 1, 15))::BIGINT % 1001 - 500) AS BIGINT) AS ws " +
      "FROM tok GROUP BY 1), " +
      "ck AS (SELECT d.doc_id, CASE WHEN coalesce(ws::DOUBLE / (n * 500), 0.0) > 0.0 " +
      "THEN 1 ELSE 0 END AS k_clf FROM documents d LEFT JOIN sc USING (doc_id)), " +
      "chx AS (SELECT doc_id, unnest(list_filter(string_split(text, ''), c -> c != '')) AS c " +
      "FROM documents), " +
      "cc AS (SELECT doc_id, c, count(*) AS cnt FROM chx GROUP BY 1, 2), " +
      "cs AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS nch, " +
      "CAST(sum(cnt * cnt) AS BIGINT) AS sq FROM cc GROUP BY 1), " +
      "chk AS (SELECT doc_id, CASE WHEN sq::DOUBLE / (nch * nch) < 0.08 " +
      "THEN 1 ELSE 0 END AS k_char FROM cs) " +
      "SELECT gk.doc_id, gk.keep AS k_gopher, ck.k_clf, chk.k_char, " +
      "gk.keep + ck.k_clf + chk.k_char AS votes, " +
      "gk.keep + ck.k_clf + chk.k_char >= 2 AS keep " +
      "FROM gk JOIN ck USING (doc_id) JOIN chk USING (doc_id) ORDER BY doc_id"),

    // same md5-derived weights (md5Long % 1001 - 500), same Σw/(500·n)
    // single division; token-less docs left-join back with score 0 /
    // keep false on both sides
    "q_quality_classifier" -> (s"WITH tok AS (SELECT doc_id, unnest(${TextQueries.Toks}) AS w FROM documents), " +
      "sc AS (SELECT doc_id, count(*) AS n_tokens, " +
      "CAST(sum(('0x' || substr(md5(w), 1, 15))::BIGINT % 1001 - 500) AS BIGINT) AS ws " +
      "FROM tok GROUP BY 1) " +
      "SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens, " +
      "coalesce(ws::DOUBLE / (n_tokens * 500), 0.0) AS score, " +
      "coalesce(ws::DOUBLE / (n_tokens * 500) > 0.0, false) AS keep " +
      "FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY d.doc_id"),

    // same (count desc, token asc) total order and ×10⁶ truncating
    // quotient; window/group sums CAST back from DuckDB's HUGEINT
    "q_vocab_coverage" -> (s"WITH tf AS (SELECT unnest(${TextQueries.Toks}) AS token " +
      "FROM documents), " +
      "c AS (SELECT token, count(*) AS cnt FROM tf GROUP BY 1), " +
      "t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c), " +
      "r AS (SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank " +
      "FROM c) " +
      "SELECT rank, token, cnt, " +
      "CAST(sum(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt, " +
      "(CAST(sum(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS BIGINT) " +
      "* 1000 // total) * 1000 + " +
      "((CAST(sum(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS BIGINT) " +
      "* 1000) % total) * 1000 // total AS cov_q6 " +
      "FROM r, t WHERE rank <= 50 ORDER BY rank"),

    "q_hapax_ratio" -> (s"WITH t AS (SELECT source, unnest(${TextQueries.Toks}) AS token " +
      "FROM documents), " +
      "c AS (SELECT source, token, count(*) AS cnt FROM t GROUP BY 1, 2) " +
      "SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens, count(*) AS n_types, " +
      "CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax, " +
      "count(*) * 1000000 // CAST(sum(cnt) AS BIGINT) AS ttr_q6, " +
      "CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 " +
      "// count(*) AS hapax_q6 " +
      "FROM c GROUP BY 1 ORDER BY 1"),

    // same min-first-doc frame, decile by (max id + 1), 10-row cumsum
    "q_vocab_growth" -> (s"WITH t AS (SELECT doc_id, unnest(${TextQueries.Toks}) AS token " +
      "FROM documents), " +
      "f AS (SELECT token, min(doc_id) AS first_doc FROM t GROUP BY 1), " +
      "n AS (SELECT max(doc_id) + 1 AS n_docs FROM documents), " +
      "d AS (SELECT least(first_doc * 10 // n_docs, 9) AS decile, " +
      "count(*) AS new_types FROM f, n GROUP BY 1) " +
      "SELECT decile, new_types, " +
      "CAST(sum(new_types) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) " +
      "AS cum_vocab FROM d ORDER BY decile"),

    // the q_quality_classifier score CTE binned against the factored
    // GateKeepSql label; identical clamp/floor bin expression and the
    // per-row floor(score·1e6) quantization before the integer sum
    "q_calibration" -> (s"WITH gk AS (${TextQueries.GateKeepSql}), " +
      s"tok AS (SELECT doc_id, unnest(${TextQueries.Toks}) AS w FROM documents), " +
      "sc0 AS (SELECT doc_id, count(*) AS n, " +
      "CAST(sum(('0x' || substr(md5(w), 1, 15))::BIGINT % 1001 - 500) AS BIGINT) AS ws " +
      "FROM tok GROUP BY 1), " +
      "sc AS (SELECT d.doc_id, coalesce(ws::DOUBLE / (n * 500), 0.0) AS score " +
      "FROM documents d LEFT JOIN sc0 USING (doc_id)) " +
      "SELECT least(greatest(CAST(floor((score + 1.0) * 5) AS BIGINT), 0), 9) AS bucket, " +
      "count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_pass, " +
      "CAST(sum(keep) AS BIGINT) * 1000000 // count(*) AS pass_q6, " +
      "CAST(sum(CAST(floor(score * 1e6) AS BIGINT)) AS BIGINT) AS score_q6_sum " +
      "FROM sc JOIN gk USING (doc_id) GROUP BY 1 ORDER BY 1"),

    // same score·10 > k−10 predicate (no decimal literals — DuckDB bare
    // decimals type DECIMAL and poison double math), same nullif guards
    "q_pr_curve" -> (s"WITH gk AS (${TextQueries.GateKeepSql}), " +
      s"tok AS (SELECT doc_id, unnest(${TextQueries.Toks}) AS w FROM documents), " +
      "sc0 AS (SELECT doc_id, count(*) AS n, " +
      "CAST(sum(('0x' || substr(md5(w), 1, 15))::BIGINT % 1001 - 500) AS BIGINT) AS ws " +
      "FROM tok GROUP BY 1), " +
      "sc AS (SELECT d.doc_id, coalesce(ws::DOUBLE / (n * 500), 0.0) AS score " +
      "FROM documents d LEFT JOIN sc0 USING (doc_id)), " +
      "j AS (SELECT k, CASE WHEN score * CAST(10 AS DOUBLE) > (k - 10)::DOUBLE " +
      "THEN 1 ELSE 0 END AS pred, keep AS gk FROM sc JOIN gk USING (doc_id) " +
      "CROSS JOIN generate_series(0, 20) AS g(k)) " +
      "SELECT k, CAST(sum(pred * gk) AS BIGINT) AS tp, " +
      "CAST(sum(pred * (1 - gk)) AS BIGINT) AS fp, " +
      "CAST(sum((1 - pred) * gk) AS BIGINT) AS fn, " +
      "CAST(sum((1 - pred) * (1 - gk)) AS BIGINT) AS tn, " +
      "CAST(sum(pred * gk) AS BIGINT) * 1000000 " +
      "// nullif(CAST(sum(pred) AS BIGINT), 0) AS prec_q6, " +
      "CAST(sum(pred * gk) AS BIGINT) * 1000000 " +
      "// nullif(CAST(sum(gk) AS BIGINT), 0) AS rec_q6 " +
      "FROM j GROUP BY 1 ORDER BY 1"),

    // same integer run counts (len of regexp_extract_all) and the same
    // single IEEE expression; ::DOUBLE literals avoid DECIMAL poisoning
    "q_readability" -> (s"SELECT doc_id, CAST(len(${TextQueries.Toks}) AS BIGINT) AS n_words, " +
      "greatest(CAST(len(regexp_extract_all(text, '[.!' || chr(63) || ']+')) AS BIGINT), 1) AS n_sents, " +
      "greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT), 1) " +
      "AS n_sylls, " +
      s"206.835::DOUBLE - 1.015::DOUBLE * (CAST(len(${TextQueries.Toks}) AS BIGINT)::DOUBLE / " +
      "greatest(CAST(len(regexp_extract_all(text, '[.!' || chr(63) || ']+')) AS BIGINT), 1)::DOUBLE) - " +
      "84.6::DOUBLE * (greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) " +
      s"AS BIGINT), 1)::DOUBLE / CAST(len(${TextQueries.Toks}) AS BIGINT)::DOUBLE) AS flesch " +
      s"FROM documents WHERE len(${TextQueries.Toks}) > 0 ORDER BY doc_id"),

    // same quantized score, |score| rank, identical tie order
    "q_uncertainty_sample" -> (s"WITH tok AS (SELECT doc_id, unnest(${TextQueries.Toks}) AS w " +
      "FROM documents), " +
      "sc0 AS (SELECT doc_id, count(*) AS n, " +
      "CAST(sum(('0x' || substr(md5(w), 1, 15))::BIGINT % 1001 - 500) AS BIGINT) AS ws " +
      "FROM tok GROUP BY 1), " +
      "scq AS (SELECT d.doc_id, " +
      "CAST(floor(coalesce(ws::DOUBLE / (n * 500), 0.0) * 1e6) AS BIGINT) AS score_q6 " +
      "FROM documents d LEFT JOIN sc0 USING (doc_id)) " +
      "SELECT rank, doc_id, score_q6 FROM (SELECT doc_id, score_q6, " +
      "row_number() OVER (ORDER BY abs(score_q6), doc_id) AS rank FROM scq) " +
      "WHERE rank <= 50 ORDER BY rank"),

    // identical md5 bucket/sign split: low 8 bits bucket, 9th bit sign
    "q_feature_hashing" -> (s"WITH tok AS (SELECT doc_id, unnest(${TextQueries.Toks}) AS w " +
      "FROM documents), " +
      "h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS hv FROM tok) " +
      "SELECT doc_id, hv % 256 AS bucket, " +
      "CAST(sum(CASE WHEN (hv // 256) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS weight, " +
      "count(*) AS n_terms " +
      "FROM h GROUP BY 1, 2 ORDER BY doc_id, bucket"),
  )
}
