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

  test("gopherGate: each rule fails on its crafted violator, composed keep") {
    val d = Seq(
      (1L, "the river flows past the village and the people watch boats"), // all pass
      (2L, "the and"), // r_len: 2 tokens < 5
      (3L, "the and 111 222 333 444 555"), // r_alpha: 2/7 alphabetic < 80%
      (4L, "the the the the the the the the the the and"), // r_ttr: 2/11 < 0.2
      (5L, "aa bb cc dd ee the and"), // r_wl: mean word length 16/7 < 3
      (6L, ""), // empty: tok_cnt 0 fails len/wl/alpha/ttr
      (7L, "quick brown foxes jumping over lazy dogs today"), // r_stop: 0 hits
      // r_sym: 3 hashes on 11 tokens — 10·(3·3) = 90 > 3·11 = 33; the
      // hashes ride word tails so alpha/stop/ttr stay green
      (8L, "the river# flows# past the village and the people watch# boats"),
      // r_bullet: 2/2 lines start with '-' — 10·2 > 9·2; lines are long
      // enough that '-' tokens don't drag alpha below 80% (14/16)
      (9L, "- the river flows past the village today\n- and the people watch many boats sail"),
      // r_ellipsis: 2/3 lines end with '…' — 10·2 > 3·3; 24 tokens keep
      // the 2 single-char ellipses inside the symbol budget (60 ≤ 72)
      (10L, "the river flows past the village and onward…\n" +
        "the people watch many boats sail away today\n" +
        "the village sleeps while the night grows dark…")
    ).toDF("doc_id", "text")
    val out = TextOps.gopherGate(d, "doc_id", "text")
      .select($"doc_id", $"r_len", $"r_wl", $"r_alpha", $"r_stop", $"r_ttr",
        $"r_sym", $"r_bullet", $"r_ellipsis", $"keep")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9, r._10))).toMap
    assert(out(1L) == ((1, 1, 1, 1, 1, 1, 1, 1, 1)))
    assert(out(2L)._1 == 0 && out(2L)._9 == 0)
    assert(out(3L)._3 == 0 && out(3L)._9 == 0)
    assert(out(4L)._5 == 0 && out(4L)._9 == 0)
    assert(out(5L)._2 == 0 && out(5L)._9 == 0)
    assert(out(6L) == ((0, 0, 0, 0, 0, 1, 1, 1, 0)))
    assert(out(7L)._4 == 0 && out(7L)._9 == 0)
    assert(out(8L)._6 == 0 && out(8L)._9 == 0)
    assert(out(9L)._7 == 0 && out(9L)._9 == 0)
    assert(out(10L)._8 == 0 && out(10L)._9 == 0)
    // exactly one rule fails per violator (isolated thresholds)
    Seq(2L, 3L, 4L, 5L, 7L, 8L, 9L, 10L).foreach { id =>
      val t = out(id)
      assert(Seq(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8).count(_ == 0) == 1,
        s"doc $id: $t")
    }
  }

  test("caseFolded: lowercase, punctuation strip, whitespace collapse") {
    val d = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "HELLO ... WORLD"),
      (4L, "unrelated")).toDF("doc_id", "text")
    val out = d.select($"doc_id", TextOps.caseFolded($"text").as("cf"))
      .as[(Long, String)].collect().toMap
    // all three case/punctuation variants fold to the same matching key
    assert(out(1L) == "hello world" && out(2L) == "hello world" && out(3L) == "hello world")
    assert(out(4L) == "unrelated")
  }

  test("heavyHitters: counts totals and breaks count ties on the token") {
    val d = Seq((1L, "b a b c"), (2L, "a c d")).toDF("doc_id", "text")
    val top = TextOps.heavyHitters(d, "text", k = 3)
      .as[(String, Long)].collect().toSeq
    // a=2 b=2 c=2 d=1: tie on count ⇒ token ascending
    assert(top == Seq(("a", 2L), ("b", 2L), ("c", 2L)))
  }

  test("tfidfTopTerms: rare terms outrank common ones; score is tf*N/df") {
    val d = Seq(
      (1L, "common rare common"),
      (2L, "common other"),
      (3L, "common third")).toDF("doc_id", "text")
    val rows = TextOps.tfidfTopTerms(d, "doc_id", "text", k = 2)
      .select($"doc", $"token", $"tf", $"df", $"score", $"rank")
      .as[(Long, String, Long, Long, Double, Int)].collect()
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._6)
    // doc 1: rare (tf=1, df=1, score=3) beats common (tf=2, df=3, score=2)
    assert(doc1.map(r => (r._2, r._5)).toSeq == Seq(("rare", 3.0), ("common", 2.0)))
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

  test("bigramCondScore: hand-computed MLE conditional sums, <2-token docs dropped") {
    // corpus bigrams: "a b"×3 (docs 1,1,2), "b a"×1, "b c"×1
    // prefix counts: a·→3, b·→2 ; pair counts: ab→3, ba→1, bc→1
    val d = Seq(
      (1L, "a b a b"), // bigrams ab, ba, ab
      (2L, "a b c"),   // bigrams ab, bc
      (3L, "z")        // no bigram → no row
    ).toDF("doc_id", "text")
    val rows = TextOps.bigramCondScore(d, "doc_id", "text")
      .select($"doc", $"n_bigrams", $"score_sum_q6", $"lm_score")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == 2 && !rows.contains(3L))
    // doc 1: ab(p=3/3)×2 + ba(p=1/2) = 2·1000000 + 500000
    assert(rows(1L) == ((1L, 3L, 2500000L, 2500000.0 / 3 / 1e6)))
    // doc 2: ab(p=1) + bc(p=1/2)
    assert(rows(2L) == ((2L, 2L, 1500000L, 0.75)))
    // predictable text outscores novel text
    assert(rows(1L)._4 > rows(2L)._4)
  }

  test("bm25Scores: tf-monotone at equal length; rarer term outweighs common") {
    // equal doc length (10 tokens) isolates tf and df effects
    val docs = Seq(
      (1L, "apple apple apple f1 f2 f3 f4 f5 f6 f7"),
      (2L, "apple g1 g2 g3 g4 g5 g6 g7 g8 g9"),
      (3L, "zebra h1 h2 h3 h4 h5 h6 h7 h8 h9")).toDF("doc_id", "text")
    val r = TextOps.bm25Scores(docs, "doc_id", "text", Seq("apple", "zebra"))
      .collect().map(x => x.getAs[Long]("doc") -> x.getAs[Long]("score_q6")).toMap
    assert(r(1L) > r(2L), "more occurrences of the same term must score higher")
    assert(r(3L) > r(2L), "a df=1 term must outscore a df=2 term at equal tf and length")
    // saturation: tf=3 is far below 3× the tf=1 score (k1 caps term spam)
    assert(r(1L) < 3 * r(2L), "tf saturation must bound repeated-term gain")
  }

  test("bm25Scores: docs hitting no query term emit no row") {
    val docs = Seq((1L, "apple pie"), (2L, "no hits here")).toDF("doc_id", "text")
    val r = TextOps.bm25Scores(docs, "doc_id", "text", Seq("apple")).collect()
    assert(r.map(_.getAs[Long]("doc")).toSet == Set(1L))
  }

  test("dsirWeights: target-distribution docs outrank raw-distribution docs") {
    // 'aa' is target-heavy, 'bb' raw-only; equal lengths
    val docs = Seq(
      (1L, "t", "aa aa aa"), (2L, "r", "bb bb bb"), (3L, "r", "aa bb aa"),
      (4L, "t", "aa bb bb")).toDF("doc_id", "source", "text")
    val r = TextOps.dsirWeights(docs, "doc_id", "text", col("source") === "t")
      .collect().map(x => x.getAs[Long]("doc") -> x.getAs[Double]("dsir_score")).toMap
    assert(r(1L) > r(3L) && r(3L) > r(2L),
      s"monotone in target-token fraction: $r")
    // same text ⇒ same weight regardless of the doc's own split membership
    val r2 = TextOps.dsirWeights(
      Seq((1L, "t", "aa bb"), (2L, "r", "aa bb")).toDF("doc_id", "source", "text"),
      "doc_id", "text", col("source") === "t")
      .collect().map(x => x.getAs[Long]("doc") -> x.getAs[Long]("w_sum_q6")).toMap
    assert(r2(1L) == r2(2L), "the weight is a function of content, not membership")
  }

  test("cmsSketch/cmsEstimate: one-sided error, bounded size, additive merge") {
    val d = 4
    val w = 16 // tiny width → forced collisions, so over-estimation is exercised
    val docsA = Seq((1L, "aa bb aa cc"), (2L, "bb dd ee aa")).toDF("doc_id", "text")
    val docsB = Seq((3L, "cc cc ff aa"), (4L, "gg bb aa hh")).toDF("doc_id", "text")
    val all = docsA.unionByName(docsB)
    val cms = TextOps.cmsSketch(all, "text", d, w)
    assert(cms.count() <= d.toLong * w, "sketch is d*w-bounded regardless of corpus")
    val exact = all.select(explode(TextOps.tokens($"text")).as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = exact.keys.toSeq.toDF("token")
    val est = TextOps.cmsEstimate(cms, probes, "token", d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS must never under-estimate: $t est ${est(t)} < exact $c")
    }
    // total over-estimate is bounded by collisions: each of the d rows
    // holds the full token mass, so no estimate can exceed it
    val mass = exact.values.sum
    est.values.foreach(e => assert(e <= mass))
    // the 1000-executor property: sketches of disjoint shards merge by
    // plain addition into exactly the whole-corpus sketch
    val merged = TextOps.cmsSketch(docsA, "text", d, w)
      .unionByName(TextOps.cmsSketch(docsB, "text", d, w))
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    val wholeSet = cms.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val mergedSet = merged.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(mergedSet == wholeSet, "shard sketches must merge additively")
    // a probe against an empty sketch estimates 0 (the coalesce path —
    // absent buckets are zero counters, not nulls)
    val emptyCms = TextOps.cmsSketch(docsA.filter($"doc_id" < 0), "text", d, w)
    val unseen = TextOps.cmsEstimate(emptyCms, Seq("zz").toDF("token"), "token", d, w)
    assert(unseen.collect().head.getLong(1) == 0L)
  }

  test("c4Clean: each C4 rule drops its crafted line, page rule composes") {
    val d = Seq(
      // 3 good lines + one short + one marker line ⇒ kept page
      (1L, "the river flows past the village today.\n" +
        "too short line\n" +
        "please enable javascript to view this page now\n" +
        "the people watch many boats sail away.\n" +
        "the village sleeps while the night grows dark."),
      // only 2 surviving lines ⇒ page dropped but row emitted
      (2L, "the river flows past the village today.\nthe people watch many boats.\nx"),
      (3L, ""), // empty text: split yields one empty line, nothing survives
      (4L, "one two three four five six seven") // 1 good line < minKeptLines
    ).toDF("doc_id", "text")
    val out = TextOps
      .c4Clean(d, "doc_id", "text", minLineToks = 5, badTokens = Seq("javascript"),
        minKeptLines = 3)
      .orderBy("doc_id")
      .collect()
    assert(out.length == 4, "every doc keeps its row; keep carries the verdict")
    val r1 = out(0)
    assert(r1.getInt(1) == 5 && r1.getInt(2) == 3 && r1.getBoolean(3))
    assert(r1.getString(4) ==
      "the river flows past the village today.\n" +
        "the people watch many boats sail away.\n" +
        "the village sleeps while the night grows dark.",
      "kept lines re-join in original order with dropped lines cut")
    assert(out(1).getInt(2) == 2 && !out(1).getBoolean(3))
    assert(out(2).getInt(1) == 1 && out(2).getInt(2) == 0 && out(2).getString(4) == "")
    assert(out(3).getInt(2) == 1 && !out(3).getBoolean(3))
  }

  test("c4LineKeep: terminal-punctuation rule accepts . ! ? \" and rejects the rest") {
    val lines = Seq(
      "the quick brown fox jumps high.", "does the fox jump very high?",
      "watch the fox jump so high!", "he said \"the fox jumps\"",
      "the quick brown fox jumps high", "the quick brown fox jumps high,").toDF("line")
    val got = lines
      .select(col("line"),
        TextOps.c4LineKeep(col("line"), 3, Seq.empty, requireTerminal = true).as("k"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("the quick brown fox jumps high."))
    assert(got("does the fox jump very high?"))
    assert(got("watch the fox jump so high!"))
    assert(got("he said \"the fox jumps\""))
    assert(!got("the quick brown fox jumps high"))
    assert(!got("the quick brown fox jumps high,"))
  }

  test("c4Clean: null text behaves as empty, never NPEs or drops the row") {
    val d = Seq((1L, null: String), (2L, "a good line with five words.")).toDF("doc_id", "text")
    val out = TextOps.c4Clean(d, "doc_id", "text", minLineToks = 5,
        badTokens = Seq.empty, minKeptLines = 1)
      .orderBy("doc_id").collect()
    assert(out(0).getInt(2) == 0 && !out(0).getBoolean(3) && out(0).getString(4) == "")
    assert(out(1).getBoolean(3))
  }

  test("classifierScores: mean-weight invariance, bounds, empty-doc contract") {
    val d = Seq(
      (1L, "alpha"),
      (2L, "alpha alpha alpha"), // same single token ⇒ identical mean score
      (3L, "alpha beta gamma delta"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.classifierScores(d, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out(0)._3 == out(1)._3) // repetition never moves a mean
    assert(out.forall(r => r._3 >= -1.0 && r._3 <= 1.0))
    assert(out.forall(r => r._4 == (r._3 > 0.0))) // keep ⇔ threshold
    assert(out(3) == ((4L, 0L, 0.0, false))) // token-less doc: score 0, dropped
    assert(out(2)._2 == 4L)
  }

  test("charStats: exact counters and collision probability on crafted docs") {
    val d = Seq((1L, "aaab"), (2L, "a a"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.charStats(d, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    // "aaab": n=4, {a:3, b:1}, Σc²=10 ⇒ prob 10/16
    assert(out(0) == ((1L, 4L, 2L, 3L, 0.625)))
    // "a a": the space is a char — n=3, {a:2, ' ':1}, Σc²=5 ⇒ 5/9
    assert(out(1) == ((2L, 3L, 2L, 2L, 5.0 / 9.0)))
    assert(out.length == 2) // empty text yields no char rows ⇒ no row
  }

  test("phraseMatches: adjacency only, overlapping hits, repeated words") {
    val d = Seq(
      (1L, "the order fast ship order fast done"), // two hits at 1 and 4
      (2L, "fast order"), // reversed ⇒ no hit
      (3L, "order slow fast"), // gap ⇒ no hit
      (4L, "order order fast"), // hit at 1 (second 'order' starts it)
      (5L, "order fast")
    ).toDF("doc_id", "text")
    val got = TextOps.phraseMatches(d, "doc_id", "text", Seq("order", "fast"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1L), (4L, 1L, 1L), (5L, 1L, 0L)))
  }

  test("phraseMatches: three-word phrase chains the position joins") {
    val d = Seq((1L, "a b c a b"), (2L, "a b x c")).toDF("doc_id", "text")
    val got = TextOps.phraseMatches(d, "doc_id", "text", Seq("a", "b", "c"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L, 0L)))
  }

  test("charStats: uniform text minimizes collision prob at 1/n") {
    val d = Seq((1L, "abcd"), (2L, "aaaa")).toDF("doc_id", "text")
    val got = TextOps.charStats(d, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Double)].collect()
    assert(got(0)._5 == 0.25) // all-distinct: 4·1/16
    assert(got(1)._5 == 1.0) // single repeated char: the gibberish pole
  }

  test("boilerplateStrip: source-relative threshold, hot only within its source") {
    // src A: 4 docs, 'nav bar' in 3 of them (75% ≥ max(2, ceil(50%·4)=2) ⇒ hot);
    // src B: 2 docs, the SAME line in 1 (df 1 < 2 ⇒ content, survives);
    // blank lines never count toward df and always survive
    val d = Seq(
      (1L, "A", "nav bar\nalpha"), (2L, "A", "nav bar\nbeta"),
      (3L, "A", "nav bar\n\ngamma"), (4L, "A", "delta"),
      (5L, "B", "nav bar\nepsilon"), (6L, "B", "zeta")
    ).toDF("doc_id", "src", "text")
    val byDoc = TextOps.boilerplateStrip(d, "doc_id", "text", "src", 0.5, 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2).toLong, r.getLong(3), r.getString(4)))).toMap
    assert(byDoc(1L) == ((2L, 1L, "alpha")))
    assert(byDoc(2L) == ((2L, 1L, "beta")))
    // blank line survives and keeps its position in the residual
    assert(byDoc(3L) == ((3L, 1L, "\ngamma")))
    assert(byDoc(4L) == ((1L, 0L, "delta")))
    // same line text, different source: below B's df threshold ⇒ kept
    assert(byDoc(5L) == ((2L, 0L, "nav bar\nepsilon")))
    assert(byDoc(6L) == ((1L, 0L, "zeta")))
  }

  test("q_vocab_coverage: ranks dense, cumulative sums exact, coverage monotone") {
    val rows = graft.SparkEntry.queries("q_vocab_coverage")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    // counts non-increasing along the rank order; cum_cnt is their prefix sum
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 >= b._3; case _ => true })
    assert(rows.map(_._3).scanLeft(0L)(_ + _).tail.toSeq == rows.map(_._4).toSeq)
    // coverage strictly increases and never exceeds ×10⁶
    assert(rows.sliding(2).forall { case Array(a, b) => a._5 < b._5; case _ => true })
    assert(rows.last._5 <= 1000000L)
    // the fixture vocabulary is below 50, so the curve must END at full
    // coverage (cum of the last rank = corpus token count ⇒ cov ≥ 999999)
    assert(rows.last._5 >= 999999L)
  }

  test("q_calibration: buckets partition the corpus and rates recompute exactly") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_calibration")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir)
    // partition: bucket doc counts sum to |documents|
    assert(rows.map(_._2).sum == docs.count())
    // label marginal: n_pass sums to the standalone gate's keep count
    val nKeep = TextOps.gopherGate(docs, "doc_id", "text")
      .filter(col("keep") === 1).count()
    assert(rows.map(_._3).sum == nKeep)
    rows.foreach { case (bucket, nDocs, nPass, passQ6, scoreSum) =>
      assert(bucket >= 0 && bucket <= 9)
      assert(nPass <= nDocs)
      assert(passQ6 == nPass * 1000000L / nDocs)
      // bucket b holds scores in [b/5 - 1, (b+1)/5 - 1) — the quantized
      // per-row score sum must sit inside the bucket's closed bounds
      assert(scoreSum >= math.ceil(nDocs.toDouble * (bucket * 200000L - 1000000L)).toLong - nDocs)
      assert(scoreSum <= (bucket + 1) * 200000L * nDocs - 1000000L * nDocs)
    }
  }

  test("q_pr_curve: confusion cells conserve, recall anti-monotone in the threshold") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_pr_curve")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.length == 21)
    val nDocs = Tables.documents(spark, dir).count()
    val nPos = rows.head._2 + rows.head._4 // tp + fn is threshold-free
    rows.foreach { case (k, tp, fp, fn, tn) =>
      assert(tp + fp + fn + tn == nDocs, s"k=$k cells must partition the corpus")
      assert(tp + fn == nPos, s"k=$k actual-positive margin must be constant")
    }
    // raising the threshold can only shrink the predicted-positive set
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"k=${b._1}: tp/fp grew on a stricter cut")
      case _ =>
    }
    // the extreme cuts: score·10 > 10 is impossible (score ≤ 1) ⇒ nothing
    // predicted positive at k=20
    assert(rows.last._2 == 0L && rows.last._3 == 0L)
  }

  test("q_feature_hashing: bucket masses conserve tokens, weights bounded by parity") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_feature_hashing")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, bucket, weight, nTerms) =>
      assert(bucket >= 0 && bucket < 256)
      assert(math.abs(weight) <= nTerms)
      // each term contributes ±1: the weight and the term count share parity
      assert(((weight % 2) + 2) % 2 == nTerms % 2)
    }
    // per-doc term masses must sum to the doc's token count
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    perDoc.foreach { case (doc, n) => assert(n == toks(doc), s"doc=$doc") }
    // signs must actually split — an all-positive hash would be a sign bug
    assert(rows.exists(_._3 < 0))
  }

  test("q_uncertainty_sample: the 50 globally closest-to-threshold docs, in order") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_uncertainty_sample")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (1 to 50))
    val all = TextOps.classifierScores(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("doc_id"), floor(col("score") * 1e6).cast("long").as("q6"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = all.sortBy { case (id, q) => (math.abs(q), id) }.take(50)
      .zipWithIndex.map { case ((id, q), i) => (i + 1, id, q) }.toSeq
    assert(got.toSeq == want)
  }

  test("q_dp_counts: noise table bounded, clamp correct, release reproducible") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.SparkEntry.queries("q_dp_counts")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = run()
    val trueCounts = Tables.events(spark, dir).groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    got.foreach { case (t, n, noise, noisy) =>
      assert(n == trueCounts(t))
      assert(noise >= -6 && noise <= 6)
      assert(noisy == math.max(0L, n + noise))
    }
    // hash-seeded ⇒ the release is identical on re-run (no RNG state)
    assert(run() == got)
    // the mechanism must actually perturb something on 5 types
    assert(got.exists(r => r._3 != 0))
  }

  test("q_readability: counts and score match an independent regex recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_readability")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def runs(s: String, re: String) = re.r.findAllIn(s).length.toLong
    val checked = docs.filter { case (_, t) => t.trim.split("\\s+").count(_.nonEmpty) > 0 }
    assert(got.size == checked.length)
    checked.foreach { case (id, t) =>
      val w = t.split("\\s+").count(_.nonEmpty).toLong
      val se = math.max(runs(t, "[.!?]+"), 1L)
      val sy = math.max(runs(t.toLowerCase, "[aeiouy]+"), 1L)
      val flesch = 206.835 - 1.015 * (w.toDouble / se.toDouble) -
        84.6 * (sy.toDouble / w.toDouble)
      assert(got(id) == ((w, se, sy, flesch)), s"doc=$id")
    }
    // the score must actually discriminate on the fixture
    assert(got.values.map(_._4).toSet.size > 1)
  }
}
