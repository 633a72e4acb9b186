package graft

import java.sql.{Date, Timestamp}

import graft.operators.{Analytics, Dedup, Pipeline}

/** Hand-computed fixtures for the round-9 wave F additions:
  * chande_momentum, vhf, imi, disparity, gap_fill_rate,
  * cluster_source_purity, minhash_estimate_error.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(i * 1000L)
  private def d(s: String) = Date.valueOf(s)

  private def oneTickPanel(values: Seq[Double], asset: Long = 1L) =
    values.zipWithIndex.map { case (v, i) =>
      (asset, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, asset * 100 + i)
    }.toDF("asset_id", "date", "ts", "value", "seq")

  /** Multi-tick days: each inner Seq is one day's ticks in time order
    * (first = open, last = close, max/min = high/low).
    */
  private def multiTickPanel(days: Seq[Seq[Double]], asset: Long = 1L) =
    days.zipWithIndex.flatMap { case (ticks, di) =>
      ticks.zipWithIndex.map { case (v, ti) =>
        (asset, d(f"2024-01-${di + 1}%02d"), ts(di * 100 + ti + 1), v,
          asset * 1000 + di * 10 + ti)
      }
    }.toDF("asset_id", "date", "ts", "value", "seq")

  private def docs(rows: (Long, String, String)*) =
    rows.map { case (id, text, source) => (id, text, "en", source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("chande_momentum: pure up-trend pins CMO at 100; flat frame is NULL") {
    val up = Analytics.chandeMomentum(oneTickPanel((1 to 5).map(_.toDouble))).collect()
      .sortBy(_.getDate(1).toString)
    assert(up.length === 4) // first day has no change
    up.foreach(r => assert(r.getAs[Double]("cmo") === 100.0))
    val flat = Analytics.chandeMomentum(oneTickPanel(Seq.fill(4)(7.0))).collect()
    flat.foreach(r => assert(r.getAs[Any]("cmo") == null))
  }

  test("chande_momentum: mixed moves match the hand fold") {
    // d = +2, -1, +4 → su 6, sd 1 → 100·5/7 = 71.428571 (u6)
    val out = Analytics.chandeMomentum(oneTickPanel(Seq(10.0, 12.0, 11.0, 15.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.last.getAs[Double]("cmo") === 71.428571)
  }

  test("vhf: net travel over path length, frame-local extremes") {
    // change rows: (12,+2), (11,−1), (15,+4); at day 4 the frame holds
    // values {12,11,15} → hi−lo = 4, path = 7 → 4/7 = 0.571429 (u6)
    val out = Analytics.vhf(oneTickPanel(Seq(10.0, 12.0, 11.0, 15.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.last.getAs[Double]("vhf") === 0.571429)
    // monotone series: the frame holds change-rows only (the pre-change
    // base value is outside it), so row k reads (k−1)/k — 0, 1/2, 2/3…
    val mono = Analytics.vhf(oneTickPanel((1 to 6).map(_.toDouble))).collect()
      .sortBy(_.getDate(1).toString)
    assert(mono.map(_.getAs[Double]("vhf")).toSeq ===
      Seq(0.0, 0.5, 0.666667, 0.75, 0.8))
  }

  test("imi: candle bodies split into gains/losses; doji-only frame is NULL") {
    // bodies: +2, −1, +4 → g 6, l 1 → 100·6/7 = 85.714286 (u6)
    val out = Analytics.imi(multiTickPanel(Seq(
      Seq(10.0, 12.0), Seq(11.0, 10.0), Seq(10.0, 14.0)))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.last.getAs[Double]("imi") === 85.714286)
    // single-tick days: open = close → all bodies 0 → NULL
    val doji = Analytics.imi(oneTickPanel(Seq(5.0, 6.0, 7.0))).collect()
    doji.foreach(r => assert(r.getAs[Any]("imi") == null))
  }

  test("disparity: percent stretch from the running SMA") {
    // day 1: sma 10 → 0; day 2: sma 15 → 100·5/15 = 33.333333 (u6)
    val out = Analytics.disparity(oneTickPanel(Seq(10.0, 20.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.head.getAs[Double]("disparity") === 0.0)
    assert(out.last.getAs[Double]("disparity") === 33.333333)
  }

  test("gap_fill_rate: fills judged on forward lows/highs incl. the gap day") {
    // day1 close 10 | day2 open 12 (up, fills same day: low 9 ≤ 10)
    // day3 open 11.5 vs close 11 (up, fills via day4 low 10 ≤ 11)
    // day4 open 10 vs close 11.5 (down, never refills: highs stay < 11.5)
    // day5 open 10.1 vs close 10.2 (down, fills via day6 high 10.3)
    // day6 open 10.3 vs close 10.1 (up, no dip ≤ 10.1 remains)
    val out = Analytics.gapFillRate(multiTickPanel(Seq(
      Seq(10.0, 10.0),
      Seq(12.0, 9.0, 11.0),
      Seq(11.5),
      Seq(10.0, 10.2),
      Seq(10.1),
      Seq(10.3)))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_up") === 3L)
    assert(r.getAs[Long]("n_up_filled") === 2L)
    assert(r.getAs[Long]("up_fill_pm") === 666L)
    assert(r.getAs[Long]("n_down") === 2L)
    assert(r.getAs[Long]("n_down_filled") === 1L)
    assert(r.getAs[Long]("down_fill_pm") === 500L)
  }

  test("cluster_source_purity: majority share and source spread per dup cluster") {
    val corpus = docs(
      (1L, "the quick brown fox jumps over the lazy dog tonight", "a"),
      (2L, "the quick brown fox jumps over the lazy dog tonight", "b"),
      (3L, "completely different text about market microstructure now", "a"),
      (4L, "completely different text about market microstructure now", "a"),
      (5L, "completely different text about market microstructure now", "b"),
      (6L, "a unique document sharing no shingles with any other one", "c"))
    val pairs = Dedup.ngramJaccardPairs(corpus, k = 8, threshold = 0.3, maxDf = 100L)
    val clusters = Dedup.nearDupClusters(corpus, pairs)
    val out = Dedup.clusterSourcePurity(corpus, clusters).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"), r.getAs[Long]("majority_pm")))
      .toMap
    assert(out === Map(
      1L -> ((2L, 2L, 500L)),   // {1,2}: a/b split
      3L -> ((3L, 2L, 666L)))) // {3,4,5}: a,a,b → majority 2/3
  }

  test("rwi: warmup rows NULL, flat series NULL; unit ramp matches hand math") {
    val flat = Analytics.rwi(oneTickPanel(Seq.fill(9)(5.0))).collect()
    flat.foreach { r =>
      assert(r.getAs[Any]("rwi_high") == null && r.getAs[Any]("rwi_low") == null)
    }
    val ramp = Analytics.rwi(oneTickPanel((1 to 9).map(_.toDouble))).collect()
      .sortBy(_.getDate(1).toString)
    ramp.take(7).foreach(r => assert(r.getAs[Any]("rwi_high") == null))
    // day 8: lo_n = 1, ATR = 7/8 (day-1 TR is 0) → 7/(0.875·√8) = 2.828427
    assert(ramp(7).getAs[Double]("rwi_high") === 2.828427)
    // day 9: lo_n = 2, ATR = 1 → 7/√8 = 2.474874; low side mirrors
    assert(ramp(8).getAs[Double]("rwi_high") === 2.474874)
    assert(ramp(8).getAs[Double]("rwi_low") === -2.474874)
  }

  test("leverage_effect: symmetric |ret| changes zero out (NULL); |corr| bounded") {
    // rets +0.1, −0.1, +0.1 → |r| constant → y ≡ 0 → den 0 → NULL
    val sym = Analytics.leverageEffect(oneTickPanel(Seq(100.0, 110.0, 99.0, 108.9))).collect()
    assert(sym.length === 1)
    assert(sym.head.getAs[Long]("n_pairs") === 2L)
    assert(sym.head.getAs[Any]("leverage_corr") == null)
    val real = Analytics.leverageEffect(oneTickPanel(
      Seq(100.0, 80.0, 81.0, 95.0, 90.0, 99.0))).collect()
    val c = real.head.getAs[Double]("leverage_corr")
    assert(c >= -1.0 && c <= 1.0)
  }

  test("mansfield_rs: constant market share reads 0; share shift matches hand math") {
    val p = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-02", 30.0),
      (2L, "2024-01-01", 10.0), (2L, "2024-01-02", 10.0))
      .zipWithIndex.map { case ((a, dt, v), i) => (a, d(dt), ts(i + 1), v, 100L + i) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.mansfieldRs(p).collect()
      .map(r => (r.getAs[Long]("asset_id"), r.getDate(1).toString) ->
        r.getAs[Double]("mansfield_rs")).toMap
    // day 1: rp = SMA → 0 for both
    assert(out((1L, "2024-01-01")) === 0.0)
    assert(out((2L, "2024-01-01")) === 0.0)
    // day 2: mkt 20; rp₁ 1.5 vs SMA 1.25 → +20; rp₂ 0.5 vs 0.75 → −33.333333
    assert(out((1L, "2024-01-02")) === 20.0)
    assert(out((2L, "2024-01-02")) === -33.333333)
  }

  test("rare_token_docs: df<=2 tail fraction over distinct tokens") {
    val corpus = docs(
      (1L, "the apple banana apple", "a"),
      (2L, "the banana cherry", "a"),
      (3L, "the cherry dates eggs", "b"))
    val out = Pipeline.rareTokenDocs(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_types"), r.getAs[Long]("n_rare"), r.getAs[Long]("rare_pm"))).toMap
    // "the" is in all 3 docs (df 3 > 2); everything else df ≤ 2
    assert(out === Map(
      1L -> ((3L, 2L, 666L)),
      2L -> ((3L, 2L, 666L)),
      3L -> ((4L, 3L, 750L))))
  }

  test("max_char_run: one-pass kernel matches hand runs; spam flag at 8") {
    val corpus = docs(
      (1L, "aaab", "a"), (2L, "abab", "a"), (3L, "aabbbbaa", "a"),
      (4L, "xxxxxxxxy", "a"), (5L, "", "a"))
    val out = Pipeline.maxCharRun(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("max_run"), r.getAs[Boolean]("spam_flag"))).toMap
    assert(out === Map(
      1L -> ((3L, false)), 2L -> ((1L, false)), 3L -> ((4L, false)),
      4L -> ((8L, true)), 5L -> ((0L, false))))
  }

  test("vol_signature: per-frequency last-price grids and ordered Σr²") {
    // ticks at 0s/70s/130s: three 1-min buckets (rets +1.0, −0.5 →
    // rv 1.25) but ONE 5/15/30-min bucket (no rets → no row)
    val p = Seq(
      (1L, d("2024-01-01"), new Timestamp(0L), 10.0, 1L),
      (1L, d("2024-01-01"), new Timestamp(70000L), 20.0, 2L),
      (1L, d("2024-01-01"), new Timestamp(130000L), 10.0, 3L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.volSignature(p).collect()
      .map(r => r.getAs[Long]("freq_min") ->
        (r.getAs[Long]("n_rets"), r.getAs[Double]("rv"))).toMap
    assert(out === Map(1L -> ((2L, 1.25))))
  }

  test("order_flow_autocorr: perfectly alternating signs read −1; flat tape emits nothing") {
    val alt = Analytics.orderFlowAutocorr(oneTickPanel(
      Seq(10.0, 11.0, 10.0, 11.0, 10.0))).collect()
    assert(alt.length === 1)
    assert(alt.head.getAs[Long]("n_pairs") === 3L)
    assert(alt.head.getAs[Double]("sign_autocorr") === -1.0)
    val flat = Analytics.orderFlowAutocorr(oneTickPanel(Seq.fill(5)(7.0))).collect()
    assert(flat.isEmpty) // no nonzero move ever classifies a side
  }

  test("vpt: integer micro cumulation matches hand math") {
    val out = Analytics.vpt(oneTickPanel(Seq(10.0, 11.0, 9.9))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.map(_.getAs[Long]("contrib_micro")).toSeq ===
      Seq(0L, 100000L, -100000L)) // +10% then 9.9/11−1 = −10%, 1 tick/day
    assert(out.map(_.getAs[Double]("vpt")).toSeq === Seq(0.0, 0.1, 0.0))
  }

  test("semantic_threshold_curve: one witness build, per-eps counts") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)), (3L, Array(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Ivf.semanticThresholdCurve(emb).collect()
      .map(r => r.getAs[Long]("eps_pm") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))).toMap
    // vec 1 duplicates vec 0 (cos 1.0 ≥ every threshold); the rest are
    // orthogonal singletons → kept 3 / dropped 1 at every eps
    assert(out === Map(300L -> ((3L, 1L)), 400L -> ((3L, 1L)), 500L -> ((3L, 1L))))
  }

  test("decontaminate_words: exact 13-token runs flag; near misses don't") {
    val corpus = docs(
      (0L, "a b c d e f g h i j k l m n", "eval"),
      (10L, "x a b c d e f g h i j k l m", "train"), // shares a..m
      (11L, "a b c d e f g h i j k l x y", "train")) // 12-run only
    val out = Dedup.decontaminateWords(corpus, evalIds = Seq(0L)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_ngrams")).toMap
    assert(out === Map(10L -> 1L))
  }

  test("stc: flat tape reads exactly 50; long ramp saturates high, bounded") {
    val flat = Analytics.stc(oneTickPanel(Seq.fill(15)(42.0))).collect()
    flat.foreach(r => assert(r.getAs[Double]("stc") === 50.0))
    val ramp = Analytics.stc(oneTickPanel((1 to 30).map(_.toDouble))).collect()
      .sortBy(_.getDate(1).toString)
    ramp.foreach { r =>
      val v = r.getAs[Double]("stc")
      assert(v >= 0.0 && v <= 100.0)
    }
    assert(ramp.last.getAs[Double]("stc") > 90.0)
  }

  test("donchian_breakout: a pure ramp breaks out daily and always wins") {
    val out = Analytics.donchianBreakout(oneTickPanel((1 to 30).map(_.toDouble))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_breakouts") === 29L) // every day after the first
    assert(r.getAs[Long]("n_scored") === 24L)    // last 5 lack the forward leg
    assert(r.getAs[Long]("win_pm") === 1000L)
    assert(r.getAs[Double]("mean_fwd_ret") > 0.0)
    val flat = Analytics.donchianBreakout(oneTickPanel(Seq.fill(25)(5.0))).collect()
    assert(flat.isEmpty) // close == prior high is NOT a breakout
  }

  test("dedup_survivors_quality: the longest member represents, min-id ties") {
    val base = "the quick brown fox jumps over the lazy dog tonight"
    val corpus = docs(
      (1L, base, "a"),
      (2L, base + " with extra trailing words", "a"),
      (3L, base, "b"),
      (4L, "a unique document sharing no shingles with any other one", "c"))
    val pairs = Dedup.ngramJaccardPairs(corpus, k = 8, threshold = 0.3, maxDf = 100L)
    val out = Dedup.dedupSurvivorsQuality(corpus, pairs).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("rep_doc_id"), r.getAs[Long]("rep_chars"), r.getAs[Long]("n_members")))
      .toMap
    assert(out(1L) === ((2L, (base + " with extra trailing words").length.toLong, 3L)))
    assert(out(4L) === ((4L, out(4L)._2, 1L))) // singleton keeps itself
  }

  test("token_budget_sample: knuth-hash membership hits the token rate") {
    val corpus = docs(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "a"),   // bucket 435761 → kept
      (2L, "u1 u2 u3 u4", "a"),                      // bucket 871522 → dropped
      (3L, "v1 v2", "b"))                            // untargeted source
    val out = Pipeline.tokenBudgetSample(corpus, Map("a" -> 7L)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("source") === "a")
    assert(r.getAs[Long]("target_tokens") === 7L)
    assert(r.getAs[Long]("source_tokens") === 14L)
    assert(r.getAs[Long]("rate_ppm") === 500000L)
    assert(r.getAs[Long]("kept_docs") === 1L)
    assert(r.getAs[Long]("kept_tokens") === 10L)
  }

  test("dedup_method_venn: identical docs land in every set and the core") {
    val base = "the quick brown fox jumps over the lazy dog tonight again"
    val corpus = docs(
      (1L, base, "a"), (2L, base, "b"),
      (3L, "completely different text about market microstructure now", "a"),
      (4L, "yet another unrelated document with its own private words", "b"))
    val r = Dedup.dedupMethodVenn(corpus).collect().head
    assert(r.getAs[Long]("n_exact") === 1L)
    assert(r.getAs[Long]("n_all_three") === 1L)
    assert(r.getAs[Long]("n_minhash") >= 1L)
    assert(r.getAs[Long]("n_simhash") >= 1L)
    assert(r.getAs[Long]("n_exact_minhash") === 1L)
    assert(r.getAs[Long]("n_exact_simhash") === 1L)
  }

  test("tick_bars: exact n-tick bars with rank-boundary open/close") {
    // tick clock ignores the calendar: 45 intraday ticks on one date
    val intraday = (1 to 45).map(i =>
      (1L, d("2024-01-01"), ts(i), i.toDouble, 100L + i))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.tickBars(intraday).collect()
      .map(r => r.getAs[Long]("bar_id") ->
        (r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
          r.getAs[Double]("close"), r.getAs[Long]("n_ticks"))).toMap
    assert(out === Map(
      0L -> ((1.0, 20.0, 1.0, 20.0, 20L)),
      1L -> ((21.0, 40.0, 21.0, 40.0, 20L)),
      2L -> ((41.0, 45.0, 41.0, 45.0, 5L))))
  }

  test("doc_chunks: stride-overlap windows, tail chunks, portable hashes") {
    val words100 = (1 to 100).map(i => s"t$i").mkString(" ")
    val corpus = docs((1L, words100, "a"), (2L, words100, "a"), (3L, "solo", "b"))
    val out = Pipeline.docChunks(corpus).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    // 100 tokens, stride 96: chunk 0 holds all 100, chunk 1 the 4-token tail
    val d1 = byDoc(1L).sortBy(_.getAs[Long]("chunk_id"))
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("start_tok"), r.getAs[Long]("n_tokens")))
    assert(d1.toSeq === Seq((0L, 0L, 100L), (1L, 96L, 4L)))
    assert(byDoc(3L).map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("n_tokens"))).toSeq
      === Seq((0L, 1L)))
    // identical docs chunk to identical content hashes
    val h1 = byDoc(1L).map(r => r.getAs[Long]("chunk_id") -> r.getAs[Long]("chunk_hash")).toMap
    val h2 = byDoc(2L).map(r => r.getAs[Long]("chunk_id") -> r.getAs[Long]("chunk_hash")).toMap
    assert(h1 === h2)
    assert(h1(0L) !== h1(1L))
  }

  test("compactMinhashIndex: duplicate appends halve away; probes unchanged") {
    val corpus = docs(
      (1L, "the quick brown fox jumps over the lazy dog tonight", "a"),
      (2L, "completely different text about market microstructure", "a"),
      (5L, "the quick brown fox jumps over the lazy dog tonight", "b")) // probe: 5 % 5 == 0
    val existing = corpus.filter($"doc_id" % 5 =!= 0)
    val path = java.nio.file.Files.createTempDirectory("mh_cspec").toString + "/index"
    Dedup.writeMinhashIndex(existing, path)
    Dedup.minhashBanded(existing)
      .write.mode("append").partitionBy("band_id").parquet(path)
    val before = spark.read.parquet(path).count()
    val probeBefore = Dedup.probeMinhashIndex(spark, path, corpus.filter($"doc_id" % 5 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.compactMinhashIndex(spark, path)
    val after = spark.read.parquet(path).count()
    assert(before === 2 * after)
    val probeAfter = Dedup.probeMinhashIndex(spark, path, corpus.filter($"doc_id" % 5 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probeAfter === probeBefore)
    assert(probeAfter.contains((5L, 1L))) // the identical doc is recalled
  }

  test("edge cases: single-tick inputs through the r9 wave") {
    val single = Seq((1L, d("2024-01-01"), ts(1), 10.0, 100L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    // one tick → one price per grid → zero returns → no signature rows
    assert(Analytics.volSignature(single).collect().isEmpty)
    // one tick → one 1-tick bar, open = close = high = low
    val bars = Analytics.tickBars(single).collect()
    assert(bars.length === 1)
    assert(bars.head.getAs[Double]("open") === 10.0)
    assert(bars.head.getAs[Double]("close") === 10.0)
    assert(bars.head.getAs[Long]("n_ticks") === 1L)
    // one tick → no sign pairs → no order-flow row
    assert(Analytics.orderFlowAutocorr(single).collect().isEmpty)
    // one bar → vpt contributes 0 and cumulates 0
    val v = Analytics.vpt(single).collect()
    assert(v.length === 1 && v.head.getAs[Double]("vpt") === 0.0)
    // series shorter than the RWI lookback → all rows NULL, none dropped
    val short = Analytics.rwi(oneTickPanel(Seq(1.0, 2.0, 3.0))).collect()
    assert(short.length === 3)
    short.foreach(r => assert(r.getAs[Any]("rwi_high") == null))
  }

  test("minhash_estimate_error: identical docs measure 1000/1000/0; bounds hold") {
    val corpus = docs(
      (1L, "the quick brown fox jumps over the lazy dog tonight", "a"),
      (2L, "the quick brown fox jumps over the lazy dog tonight", "b"),
      (3L, "the quick brown fox jumps over the lazy dog at noon!", "a"),
      (4L, "completely different text about market microstructure", "c"))
    val out = Dedup.minhashEstimateError(corpus).collect()
    val byPair = out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      (r.getAs[Long]("est_pm"), r.getAs[Long]("exact_pm"), r.getAs[Long]("err_pm"))).toMap
    // identical texts: identical shingle sets → identical signatures
    assert(byPair((1L, 2L)) === ((1000L, 1000L, 0L)))
    // every recalled pair: estimates within [0,1000], err is the gap
    out.foreach { r =>
      val (e, x, err) = (r.getAs[Long]("est_pm"), r.getAs[Long]("exact_pm"),
        r.getAs[Long]("err_pm"))
      assert(e >= 0L && e <= 1000L && x >= 0L && x <= 1000L)
      assert(err === math.abs(e - x))
    }
    // the near-dup pair (1,3) shares most shingles: exact well above 0
    assert(byPair.contains((1L, 3L)) || byPair.contains((2L, 3L)))
  }
}
