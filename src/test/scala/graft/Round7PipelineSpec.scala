package graft

import graft.operators.{Dedup, Pipeline, Similarity}

/** Hand-computed fixtures for the round-7 pipeline additions
  * (C73-C79): dup_inflation, token_gini, embedding_anisotropy,
  * doc_outliers, gopher_rules, dsir_weights, lm_score_buckets.
  */
class Round7PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("dup_inflation: token mass of non-canonical cluster members per source") {
    val d = docs(
      (1L, "a b c d", "en", "web"),   // canonical of {1,2}
      (2L, "a b c", "en", "web"),     // dup: 3 tokens
      (3L, "x y", "en", "web"),       // singleton
      (4L, "p q r", "en", "books"))   // singleton, other source
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = Dedup.dupInflation(d, pairs).collect()
      .map(r => r.getString(0) -> r).toMap
    val web = out("web")
    assert(web.getAs[Long]("n_docs") === 3L)
    assert(web.getAs[Long]("n_dup_docs") === 1L)
    assert(web.getAs[Long]("tokens_total") === 9L)
    assert(web.getAs[Long]("tokens_dup") === 3L)
    assert(web.getAs[Long]("inflation_pm") === 1500L)          // 9000/6
    val books = out("books")
    assert(books.getAs[Long]("n_dup_docs") === 0L)
    assert(books.getAs[Long]("inflation_pm") === 1000L)
  }

  test("token_gini: uniform counts score 0; one-doc concentration scores (n-1)/n") {
    val d = docs(
      (1L, "a b", "en", "even"), (2L, "c d", "en", "even"), (3L, "e f", "en", "even"),
      (4L, "", "en", "skew"), (5L, "", "en", "skew"),
      (6L, "", "en", "skew"), (7L, "w w w w w w w w w w", "en", "skew"))
    val out = Pipeline.tokenGini(d).collect().map(r => r.getString(0) -> r).toMap
    assert(out("even").getAs[Long]("gini_pm") === 0L)
    // n=4, all 10 tokens in the top-ranked doc: G = (n−1)/n = 750‰
    assert(out("skew").getAs[Long]("total_tokens") === 10L)
    assert(out("skew").getAs[Long]("gini_pm") === 750L)
  }

  test("gopher_rules: a clean document passes; defects trip their own rule") {
    val clean = (("the quick brown fox jumps over the lazy dog and that " * 6) +
      "words have with more filler here now").trim                    // >50 words, stopwords, alpha
    val symbols = "the of and " + Seq.fill(60)("x####").mkString(" ") // symbol ratio blown
    val nostop = Seq.fill(60)("zebra").mkString(" ")                  // no stopwords, repetitive
    val d = docs((1L, clean, "en", "s"), (2L, symbols, "en", "s"), (3L, nostop, "en", "s"))
    val out = Pipeline.gopherRules(d).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("pass_gopher"), out(1L).toString)
    assert(!out(2L).getAs[Boolean]("rule_symbol_ratio"))
    assert(out(2L).getAs[Boolean]("rule_stopwords"))
    assert(!out(3L).getAs[Boolean]("rule_stopwords"))
    assert(out(3L).getAs[Boolean]("rule_alpha"))
  }

  test("lm_score_buckets: six docs split 2/2/2 with monotone score ranges") {
    // six two-word docs sharing token "t": bigram stats differ per doc
    val texts = Seq("t a t a t a", "t a t a t b", "t b t b t b",
      "t c t c t c", "t c t d t d", "t d t d t e")
    val d = docs(texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t, "en", "s") }: _*)
    val out = Pipeline.lmScoreBuckets(d).collect()
    assert(out.map(_.getAs[Long]("bucket")).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_docs")).toSeq === Seq(2L, 2L, 2L))
    // tercile ranges never overlap: max of bucket k ≤ min of bucket k+1
    val (mins, maxs) = (out.map(_.getAs[Long]("min_ppm")), out.map(_.getAs[Long]("max_ppm")))
    assert(maxs(0) <= mins(1) && maxs(1) <= mins(2))
  }

  test("dsir_weights: target-only words pull positive, off-target negative") {
    val d = docs(
      (1L, "hello hello hello", "en", "s"),   // target-exclusive token
      (2L, "hello bonjour", "fr", "s"),
      (3L, "bonjour bonjour bonjour", "fr", "s"))
    val out = Pipeline.dsirWeights(d).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "hello": c_t=3 of n_t=3; c_r=4 of n_r=8 → ratio > 1 → positive
    assert(out(1L).getAs[Long]("dsir_micro") > 0L)
    assert(out(1L).getAs[Long]("n_toks") === 3L)
    // "bonjour": c_t=0 → ratio < 1 → negative
    assert(out(3L).getAs[Long]("dsir_micro") < 0L)
  }

  test("embedding_anisotropy: single varying dim takes the whole variance share") {
    val vecs = Seq(
      (1L, Seq(0f, 5f, 1f), 0), (2L, Seq(4f, 5f, 1f), 0),
      (3L, Seq(8f, 5f, 1f), 0), (4L, Seq(12f, 5f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingAnisotropy(vecs).collect().map(r => r.getInt(0) -> r).toMap
    assert(out(0).getAs[Double]("var_val") === 20.0)           // E[x²]−E[x]² of 0,4,8,12
    assert(out(0).getAs[Long]("var_share_pm") === 1000L)
    assert(out(1).getAs[Double]("var_val") === 0.0)
    assert(out(1).getAs[Long]("var_share_pm") === 0L)
    assert(out(2).getAs[Double]("mean_val") === 1.0)
  }

  test("dedup_normalized: case/punctuation/whitespace variants collapse to one family") {
    val d = docs(
      (1L, "Hello, World!", "en", "s"),
      (2L, "hello   world", "en", "s"),
      (3L, "HELLO-WORLD", "en", "s"),
      (4L, "something else entirely", "en", "s"))
    val out = Dedup.normalizedDedup(d).collect()
    assert(out.length === 2)                                   // the family + the singleton
    assert(out.head.getAs[Long]("keep_id") === 1L)
    assert(out.head.getAs[Long]("n_docs") === 3L)
    assert(out(1).getAs[Long]("keep_id") === 4L)
    assert(out(1).getAs[Long]("n_docs") === 1L)
  }

  test("kcenter_coreset: farthest-first traversal picks the known sequence") {
    val vecs = Seq(
      (1L, Seq(0f, 0f), 0), (2L, Seq(10f, 0f), 0), (3L, Seq(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.kcenterCoreset(vecs, k = 3).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 2L, 3L))
    assert(out.head.getAs[Any]("radius") == null)              // seed has no radius
    assert(out(1).getAs[Double]("radius") === 100.0)           // (10,0) vs (0,0)
    assert(out(2).getAs[Double]("radius") === 1.0)             // min(1, 101)
  }

  test("cluster_purity: uniform labels are pure; counts partition the corpus") {
    val n = 12
    val vecs = (1 to n).map { i =>
      (i.toLong, Seq((i % 3).toFloat * 10f, (i % 4).toFloat * 5f), 7)
    }.toDF("vec_id", "embedding", "label")
    val out = graft.operators.Ivf.clusterPurity(vecs, k = 3, iters = 2).collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === n.toLong)
    out.foreach { r =>
      assert(r.getAs[Int]("top_label") === 7)
      assert(r.getAs[Long]("purity_pm") === 1000L)            // single label → pure
      assert(r.getAs[Long]("n_top") === r.getAs[Long]("n_vecs"))
    }
  }

  test("temperature_mix: sqrt scaling upsamples the small source") {
    val d = docs(
      (1L, Seq.fill(90)("w").mkString(" "), "en", "big"),
      (2L, Seq.fill(10)("w").mkString(" "), "en", "small"))
    val out = Pipeline.temperatureMix(d).collect().map(r => r.getString(0) -> r).toMap
    def u6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val (pB, pS) = (u6(90.0 / 100.0), u6(10.0 / 100.0))
    val (wB, wS) = (u6(math.sqrt(pB)), u6(math.sqrt(pS)))
    val (mB, mS) = (math.round(wB * 1e6), math.round(wS * 1e6))
    assert(out("big").getAs[Double]("w_raw") === wB)
    assert(out("small").getAs[Double]("w_raw") === wS)
    assert(out("small").getAs[Long]("weight_pm") === 1000L * mS / (mB + mS))
    // the whole point: small's mixture weight exceeds its token share (100‰)
    assert(out("small").getAs[Long]("weight_pm") > 100L)
    assert(out("big").getAs[Long]("weight_pm") < 900L)
  }

  test("rouge_overlap: distinct n-gram recall against the reference") {
    val d = docs(
      (0L, "a b c d", "en", "s"),       // ref: 4 unigrams, 3 bigrams
      (1L, "x y", "en", "s"),           // ref with zero overlap
      (5L, "a b x", "en", "s"),         // cand: shares {a,b} and bigram "a b"
      (6L, "q r s", "en", "s"))         // cand: no overlap
    val out = Pipeline.rougeOverlap(d, Seq(0L, 1L), Seq(5L, 6L)).collect()
      .map(r => (r.getAs[Long]("ref_id"), r.getAs[Long]("cand_id")) -> r).toMap
    assert(out.size === 4)                                     // full spine
    val hit = out((0L, 5L))
    assert(hit.getAs[Long]("shared_1") === 2L && hit.getAs[Long]("n_ref_1") === 4L)
    assert(hit.getAs[Long]("rouge1_pm") === 500L)
    assert(hit.getAs[Long]("shared_2") === 1L && hit.getAs[Long]("n_ref_2") === 3L)
    assert(hit.getAs[Long]("rouge2_pm") === 333L)
    assert(out((0L, 6L)).getAs[Long]("rouge1_pm") === 0L)      // spine keeps the zero
    assert(out((1L, 6L)).getAs[Long]("shared_1") === 0L)
  }

  test("mmr_rerank: the duplicate of the first pick is deferred for diversity") {
    // q=(1,0); a and b identical directions (cos(q,·)=0.8, sim(a,b)=1),
    // c mirrored (cos(q,c)=0.8, sim(a,c)=0.28): greedy = a, then c, then b
    val vecs = Seq(
      (10L, Seq(1f, 0f), 0), (1L, Seq(0.8f, 0.6f), 0),
      (2L, Seq(1.6f, 1.2f), 0), (3L, Seq(0.8f, -0.6f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.mmrRerank(vecs, Seq(10L), kCand = 3, kSel = 3).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 3L, 2L))
    assert(out.head.getAs[Any]("score") == null)               // first pick: nothing to diversify
    val s2 = out(1).getAs[Double]("score")                     // 0.7·0.8 − (1−0.7)·0.28
    assert(math.abs(s2 - (0.7 * 0.8 - (1.0 - 0.7) * 0.28)) < 2e-6, s"s2=$s2")
    val s3 = out(2).getAs[Double]("score")                     // 0.7·0.8 − (1−0.7)·1.0
    assert(math.abs(s3 - (0.7 * 0.8 - (1.0 - 0.7) * 1.0)) < 2e-6, s"s3=$s3")
  }

  test("lang_confusion: a mislabeled document lands off the diagonal") {
    val en = "the cat and the dog went to the house in the rain"
    val d = docs(
      (1L, en, "en", "s"), (2L, en, "en", "s"),
      (3L, en, "de", "s"),                      // labeled de, reads en
      (4L, "zzz qqq xxx", "fr", "s"))           // no markers → und
    val out = Pipeline.langConfusion(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("en", "en")).getAs[Long]("n_docs") === 2L)
    assert(out(("en", "en")).getAs[Long]("share_pm") === 1000L)
    assert(out(("de", "en")).getAs[Long]("n_docs") === 1L)     // the confusion cell
    assert(out(("fr", "und")).getAs[Long]("n_docs") === 1L)
  }

  test("dataset_card: one summary row with exact composition numbers") {
    val d = docs(
      (1L, "a b c", "en", "web"), (2L, "a b c", "en", "web"),  // exact dup pair
      (3L, "d e", "fr", "books"), (4L, "f", "en", "books"))
    val out = Pipeline.datasetCard(d).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_sources") === 2L)
    assert(r.getAs[Long]("n_langs") === 2L)
    assert(r.getAs[Long]("total_tokens") === 9L)
    assert(r.getAs[Long]("total_chars") === 14L)               // 5+5+3+1
    assert(r.getAs[Long]("mean_doc_tokens") === 2L)            // 9 div 4
    assert(r.getAs[Long]("exact_dup_docs") === 1L)
    assert(r.getAs[Long]("dup_share_pm") === 250L)
  }

  test("split_leakage: a cluster spanning splits is counted as leaky") {
    // doc 0 → bucket 0 (train); doc 85 → (85·2654435761) % 100 = 85 % ...
    // choose ids by computing the split hash directly
    def split(id: Long) = {
      val b = java.lang.Math.floorMod(id * 2654435761L, 100L)
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val ids = (0L until 200L)
    val train = ids.filter(split(_) == "train")
    val test = ids.filter(split(_) == "test")
    // cluster A spans train+test (leaky); cluster B stays in train
    val a1 = train.head; val a2 = test.head
    val b1 = train(1); val b2 = train(2)
    val d = docs(Seq(a1, a2, b1, b2).map(i => (i, s"doc $i", "en", "s")): _*)
    val pairs = Seq((math.min(a1, a2), math.max(a1, a2)),
      (math.min(b1, b2), math.max(b1, b2))).toDF("doc_a", "doc_b")
    val out = Dedup.splitLeakage(d, pairs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_multi_clusters") === 2L)
    assert(r.getAs[Long]("n_leaky_clusters") === 1L)
    assert(r.getAs[Long]("leaked_docs") === 2L)
    assert(r.getAs[Long]("leak_share_pm") === 500L)
  }

  test("doc_outliers: the far point ranks first with its exact distance") {
    val vecs = Seq(
      (1L, Seq(0f, 0f), 7), (2L, Seq(0f, 0f), 7), (3L, Seq(9f, 0f), 7),
      (10L, Seq(1f, 1f), 8), (11L, Seq(1f, 1f), 8))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.docOutliers(vecs, k = 2).collect()
    val l7 = out.filter(_.getInt(0) == 7)
    assert(l7.head.getAs[Long]("vec_id") === 3L)               // centroid (3,0): dist² 36
    assert(l7.head.getAs[Double]("dist2") === 36.0)
    assert(l7(1).getAs[Double]("dist2") === 9.0)
    val l8 = out.filter(_.getInt(0) == 8)
    assert(l8.forall(_.getAs[Double]("dist2") == 0.0))         // coincident points
  }

  test("suffix_dups: shared footers family up; distinct tails don't") {
    val footer = "all rights reserved by example corp"           // 35 chars > window
    val d = docs(
      (1L, s"alpha body text $footer", "en", "web"),
      (2L, s"beta completely different body $footer", "en", "web"),
      (3L, "gamma no footer here at all whatsoever", "en", "web"))
    val out = Dedup.suffixDups(d).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("keep_id") === 1L)
    assert(out.head.getAs[Long]("n_docs") === 2L)
  }

  test("simhash_hamming_histogram: identical docs land in the h=0 bucket") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "web"),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "web"),
      (3L, "completely unrelated text about something else entirely different", "en", "web"))
    val out = Dedup.simhashHammingHistogram(d).collect()
      .map(r => r.getAs[Long]("hamming") -> r.getAs[Long]("n_pairs")).toMap
    assert(out.getOrElse(0L, 0L) >= 1L)                        // the identical pair
  }

  test("tokenizer_fertility: integer sums and the per-100-char ratio") {
    val d = docs(
      (1L, "the and of to in is that for with it", "en", "web"),  // 10 en markers
      (2L, "zzz qqq", "xx", "web"))                               // no markers → und
    val out = Pipeline.tokenizerFertility(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_docs") === 1L)
    assert(en.getAs[Long]("total_tokens") === 10L)               // 10 alpha runs
    assert(en.getAs[Long]("total_chars") === 36L)
    val want = math.floor(100.0 * 10 / 36 * 1e6 + 0.5) / 1e6
    assert(out("en").getAs[Double]("fertility_per_100c") === want)
    assert(out.contains("und"))
  }

  test("ngram_coverage: head words cover their exact token share") {
    // 10 tokens: 'a'×5, 'b'×3, 'c'×1, 'd'×1 → top-10 covers all
    val d = docs((1L, "a a a a a b b b c d", "en", "web"))
    val out = Pipeline.ngramCoverage(d).collect()
      .map(r => r.getAs[Long]("cut") -> r).toMap
    assert(out(10L).getAs[Long]("n_words") === 4L)
    assert(out(10L).getAs[Long]("covered_tokens") === 10L)
    assert(out(10L).getAs[Double]("share") === 1.0)
    assert(out(100L).getAs[Long]("total_tokens") === 10L)
  }

  test("dup_length_bias: prefix-family members aggregate separately") {
    val prefix = "x" * 64
    val d = docs(
      (1L, prefix + " tail one", "en", "web"),
      (2L, prefix + " a different and much longer tail two", "en", "web"),
      (3L, "unique document with its own text", "en", "web"))
    val out = Pipeline.dupLengthBias(d).collect()
      .map(r => r.getAs[Boolean]("is_dup") -> r).toMap
    assert(out(true).getAs[Long]("n_docs") === 2L)
    assert(out(false).getAs[Long]("n_docs") === 1L)
    assert(out(false).getAs[Long]("total_chars") === 33L)
    assert(out(false).getAs[Double]("mean_chars") === 33.0)
  }

  test("minhash_band_histogram: every band's bucket mass equals the doc count") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val nDocs = d.count()
    val hist = Dedup.minhashBandHistogram(d).collect()
    val perBand = hist.groupBy(_.getAs[Long]("band_id")).map { case (b, rows) =>
      b -> rows.map(r => r.getAs[Long]("bucket_size") * r.getAs[Long]("n_buckets")).sum
    }
    assert(perBand.size === 16)
    perBand.foreach { case (b, mass) => assert(mass === nDocs, s"band $b") }
  }

  test("pii_stats: per-source exposure counts and per-mille share") {
    val d = docs(
      (1L, "reach me at alice@example.com or 555-123-4567", "en", "web"),
      (2L, "totally clean document", "en", "web"),
      (3L, "server at 10.0.0.1 plus bob@test.org", "en", "mail"))
    val out = Pipeline.piiStats(d).collect().map(r => r.getString(0) -> r).toMap
    val web = out("web")
    assert(web.getAs[Long]("n_docs") === 2L)
    assert(web.getAs[Long]("n_docs_with_pii") === 1L)
    assert(web.getAs[Long]("n_emails") === 1L)
    assert(web.getAs[Long]("n_phones") === 1L)
    assert(web.getAs[Long]("pii_doc_pm") === 500L)
    val mail = out("mail")
    assert(mail.getAs[Long]("n_ips") === 1L && mail.getAs[Long]("n_emails") === 1L)
    assert(mail.getAs[Long]("pii_doc_pm") === 1000L)
  }

  test("readability: hand-counted Flesch on a two-sentence document") {
    val d = docs((1L, "Hello world. Nice day!", "en", "web"))
    val r = Pipeline.readability(d).collect().head
    assert(r.getAs[Long]("n_words") === 4L)
    assert(r.getAs[Long]("n_sentences") === 2L)
    assert(r.getAs[Long]("n_syllables") === 6L)   // e,o | o | i,e | ay
    // 206.835 − 1.015·(4/2) − 84.6·(6/4)
    val want = math.floor((206.835 - 1.015 * 2.0 - 84.6 * 1.5) * 1e6 + 0.5) / 1e6
    assert(math.abs(r.getAs[Double]("flesch") - want) < 1e-9)
  }

  test("lsh_bucket_histogram: sizes partition the vector count") {
    val hist = SparkEntry.queries("lsh_bucket_histogram")(spark, "/root/testdata/sf0.001")
      .collect()
    val nVecs = Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    val massed = hist.map(r => r.getAs[Long]("bucket_size") * r.getAs[Long]("n_buckets")).sum
    assert(massed === nVecs)
  }

  test("lexical_diversity: repeated token halves the TTR") {
    val d = docs((1L, "a b a b", "en", "web"), (2L, "w x y z", "en", "web"))
    val out = Pipeline.lexicalDiversity(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_types") === 2L)
    assert(out(1L).getAs[Long]("ttr_pm") === 500L)
    assert(out(1L).getAs[Double]("root_ttr") === 1.0)          // 2/√4
    assert(out(2L).getAs[Long]("ttr_pm") === 1000L)
    assert(out(2L).getAs[Double]("root_ttr") === 2.0)          // 4/√4
  }

  test("line_dups: a line shared across docs flags in both; short lines drop") {
    val shared = "this line is boilerplate"
    val d = docs(
      (1L, s"$shared\nunique first line here", "en", "web"),
      (2L, s"$shared\nanother unique line here", "en", "web"),
      (3L, "short\nno", "en", "web"))                          // all lines < 10 chars
    val out = Dedup.lineDups(d).collect().map(r => r.getLong(0) -> r).toMap
    // a doc with NO qualifying lines still reports: n_lines 0, dup_pm
    // NULL — "not measured" is distinguishable from "no boilerplate"
    assert(out(3L).getAs[Long]("n_lines") === 0L)
    assert(out(3L).getAs[Any]("dup_pm") == null)
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getAs[Long]("n_lines") === 2L)
      assert(out(id).getAs[Long]("n_dup_lines") === 1L)
      assert(out(id).getAs[Long]("dup_pm") === 500L)
    }
  }

  test("source_jsd: identical sources diverge zero; disjoint sources diverge more") {
    val d = docs(
      (1L, "a b c a b c", "en", "s1"), (2L, "a b c a b c", "en", "s2"),
      (3L, "x y z x y z", "en", "s3"))
    val out = Pipeline.sourceJsd(d).collect().map(r => r.getString(0) -> r).toMap
    // s1 and s2 are identical → identical JSD vs the corpus mix
    assert(out("s1").getAs[Double]("jsd") === out("s2").getAs[Double]("jsd"))
    // all three diverge from the pooled corpus, the lone source most
    assert(out("s3").getAs[Double]("jsd") > out("s1").getAs[Double]("jsd"))
    out.values.foreach(r => assert(r.getAs[Double]("jsd") >= 0.0))
  }

  test("bigram_entropy: deterministic text has zero conditional entropy") {
    // "a b a b a": unigrams {a:3,b:2} entropic, bigrams deterministic
    // given the previous token... use strict cycle "a b a b" per doc
    val d = docs(
      (1L, "a b a b a b", "en", "cyc"), (2L, "a b a b", "en", "cyc"))
    val out = Pipeline.bigramEntropy(d).collect().head
    // bigrams: "a b" ×5, "b a" ×3 — H(bi) < H(uni) + ln 2; conditional
    // entropy is small but nonzero (two continuations of 'b')
    assert(out.getAs[Long]("n_tokens") === 10L)
    assert(out.getAs[Long]("n_bigrams") === 8L)
    assert(out.getAs[Double]("h_uni") > 0.6)                   // ≈ ln 2
    assert(out.getAs[Double]("h_cond") < out.getAs[Double]("h_uni"))
  }

  test("filter_funnel: stages only ever shrink and the per-mille matches") {
    val longText = ("the be to of and that have with " * 12).trim  // 96 words, passes gopher
    val d = docs(
      (1L, longText + " " + ("filler " * 30).trim, "en", "web"),
      (2L, "tiny", "en", "web"),
      (3L, longText + " " + ("filler " * 30).trim, "fr", "web"))
    val out = Pipeline.filterFunnel(d, minChars = 100L).collect().head
    val (t, l, g, p, la) = (out.getAs[Long]("n_total"), out.getAs[Long]("n_len"),
      out.getAs[Long]("n_gopher"), out.getAs[Long]("n_pii"), out.getAs[Long]("n_lang"))
    assert(t === 3L)
    assert(l <= t && g <= l && p <= g && la <= p)
    assert(la === 1L)                                          // doc 3 dies at lang
    assert(out.getAs[Long]("survive_pm") === 333L)
  }

  test("edit_similarity: distance is symmetric-free and per-mille sane on near-dups") {
    // doc 2 appends a tail past the 128-char cap: the LSH sees the
    // full texts (near-identical shingle sets → a shared band), while
    // the Levenshtein runs on the identical capped prefixes → dist 0
    val base = "the quick brown fox jumps over the lazy dog and keeps on running far away " * 4
    val d = docs(
      (1L, base, "en", "web"),
      (2L, base + "and a small extra tail here", "en", "web"),
      (3L, "completely different text with nothing in common whatsoever here", "en", "web"))
    val out = Dedup.editSimilarity(d).collect()
    val p12 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined)
    assert(p12.get.getAs[Long]("dist") === 0L)                 // capped prefixes equal
    assert(p12.get.getAs[Long]("sim_pm") === 1000L)
    out.foreach { r =>
      assert(r.getAs[Long]("dist") >= 0L)
      assert(r.getAs[Long]("sim_pm") <= 1000L)
    }
  }

  test("mahalanobis_outliers: variance normalization outranks raw distance") {
    // label 0, dim 0 noisy (values ±10), dim 1 tight (±0.1) plus one
    // vec at dim1 = 3: euclidean would rank the ±10 swings first, the
    // diagonal-Mahalanobis rank must put the dim-1 break on top
    val rows = Seq(
      (1L, Array(10.0f, 0.0f), 0), (2L, Array(-10.0f, 0.1f), 0),
      (3L, Array(10.0f, -0.1f), 0), (4L, Array(-10.0f, 0.0f), 0),
      (5L, Array(0.0f, 3.0f), 0))
    val d = rows.toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.mahalanobisOutliers(d, k = 2).collect()
    assert(out.length === 2)
    assert(out.head.getAs[Long]("rank") === 1L)
    assert(out.head.getAs[Long]("vec_id") === 5L)             // the dim-1 break wins
    out.foreach(r => assert(r.getAs[Double]("md2") >= 0.0))
  }

  test("intrinsic_dim: points on a 1-D geometric line estimate dimension near 1") {
    // x = 2^i: each interior point's 2nd neighbour is i−2 (closer than
    // i+1), ratio 3/2; the two left-edge points contribute ln 2 and
    // ln 3 → d̂ = 10 / (ln3 + ln2 + 8·ln1.5) = 1.985908 exactly on the
    // micro-integer grid (a UNIFORM grid would give r1 = r2 and blow
    // the estimator up — hence the geometric spacing)
    val rows = (0 until 10).map(i => (i.toLong, Array(math.pow(2.0, i).toFloat, 0.0f), 0))
    val d = rows.toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.intrinsicDim(d, sampleN = 10).collect().head
    assert(out.getAs[Long]("n_used") === 10L)
    assert(out.getAs[Double]("id_hat") === 1.985908)
  }

  test("simhash_bit_balance: 64 rows, every doc voting, shares within [0,1000]") {
    val d = docs(
      (1L, "alpha beta gamma delta", "en", "web"),
      (2L, "epsilon zeta eta theta", "en", "web"),
      (3L, "iota kappa lambda mu anything else", "en", "web"),
      (4L, "   ", "en", "web"))                               // token-less → no votes
    val out = Dedup.simhashBitBalance(d).collect()
    assert(out.length === 64)
    assert(out.map(_.getAs[Long]("bit_pos")).toSeq === (0L to 63L))
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") === 3L)                  // doc 4 excluded
      val pm = r.getAs[Long]("set_pm")
      assert(pm >= 0L && pm <= 1000L)
    }
  }

  test("contamination_curve: shorter shingles flag more; disjoint text flags none") {
    val d = docs(
      (0L, "abcdefgh", "en", "eval"),                         // eval doc
      (1L, "abcdzzzz", "en", "web"),                          // shares 4-gram "abcd"
      (2L, "qqqqqqqq", "en", "web"))                          // disjoint
    val out = graft.operators.Dedup.contaminationCurve(d, Seq(0L), ks = Seq(4, 8))
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    assert(out(4L).getAs[Long]("n_contaminated") === 1L)      // doc 1 at k=4
    assert(out(4L).getAs[Long]("n_shared_shingles") === 1L)   // just "abcd"
    assert(out(8L).getAs[Long]("n_contaminated") === 0L)      // verbatim-8 nowhere
  }

  test("token_burstiness: repeated-in-one-doc words burst, spread words sit at 1") {
    val d = docs(
      (1L, "a a a b", "en", "s"),
      (2L, "b c", "en", "s"))
    val out = Pipeline.tokenBurstiness(d).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b", "c"))   // cf desc, word
    val byWord = out.map(r => r.getString(0) -> r).toMap
    assert(byWord("a").getAs[Long]("cf") === 3L)
    assert(byWord("a").getAs[Long]("df") === 1L)
    assert(byWord("a").getAs[Double]("burstiness") === 3.0)
    assert(byWord("b").getAs[Double]("burstiness") === 1.0)
  }

  test("band_sweep: an identical pair lights one bucket per band at every width") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val d = docs(
      (1L, base, "en", "s"), (2L, base, "en", "s"),
      (3L, "completely different content with no overlap at all here", "en", "s"))
    val out = graft.operators.Dedup.bandSweep(d).collect()
      .map(r => r.getAs[Long]("bands") -> r).toMap
    for (b <- Seq(8L, 16L, 32L)) {
      assert(out(b).getAs[Long]("n_pair_slots") === b)        // docs 1/2 in every band
      assert(out(b).getAs[Long]("n_hot_buckets") === b)
      assert(out(b).getAs[Long]("rows_per_band") === 64L / b)
    }
  }

  test("char_class_profile: hand-counted classes and per-milles") {
    val d = docs((1L, "ab1 c", "en", "s"), (2L, "de2,f", "en", "s"))
    val out = Pipeline.charClassProfile(d).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_chars") === 10L)
    assert(r.getAs[Long]("n_alpha") === 6L)
    assert(r.getAs[Long]("n_digit") === 2L)
    assert(r.getAs[Long]("n_ws") === 1L)
    assert(r.getAs[Long]("n_other") === 1L)                   // the comma
    assert(r.getAs[Long]("alpha_pm") === 600L)
    assert(r.getAs[Long]("digit_pm") === 200L)
    assert(r.getAs[Long]("other_pm") === 100L)
  }

  test("hapax_ratio: singleton words count, repeated words do not") {
    val d = docs(
      (1L, "a a b c", "en", "s"),                             // a×2, b, c → 2 hapax of 3 types
      (2L, "c d", "en", "s"))                                 // c joins doc1's c → not hapax
    val out = Pipeline.hapaxRatio(d).collect()
    val r = out.head
    assert(r.getAs[Long]("n_tokens") === 6L)
    assert(r.getAs[Long]("n_types") === 4L)                   // a b c d
    assert(r.getAs[Long]("n_hapax") === 2L)                   // b, d (a×2, c×2)
    assert(r.getAs[Long]("hapax_pm") === 500L)
  }

  test("length_by_lang: exact lower-median order statistic per language") {
    val d = Seq(
      (1L, "x", "en", "s", 10L), (2L, "x", "en", "s", 30L),
      (3L, "x", "en", "s", 20L), (4L, "x", "en", "s", 40L),
      (5L, "x", "fr", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Pipeline.lengthByLang(d).collect().map(r => r.getString(0) -> r).toMap
    assert(out("en").getAs[Long]("median_chars") === 20L)     // lower median of 4
    assert(out("en").getAs[Long]("min_chars") === 10L)
    assert(out("en").getAs[Long]("max_chars") === 40L)
    assert(out("fr").getAs[Long]("median_chars") === 7L)
  }

  test("winnow_density: one-window docs pin density at 1000; short docs drop") {
    val d = docs(
      (1L, "abcdefghijk", "en", "web"),                       // 11 chars → 1 window
      (2L, "abcdefghij", "en", "web"))                        // 10 chars → 0 windows
    val out = Dedup.winnowDensity(d).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L)
    assert(r.getAs[Long]("n_fps") === 1L)
    assert(r.getAs[Long]("n_windows") === 1L)
    assert(r.getAs[Long]("density_pm") === 1000L)
  }
}
