package graft

import java.sql.{Date, Timestamp}

import graft.operators.{Analytics, Dedup, Pipeline}

/** Hand-computed fixtures for the round-8 additions: kama,
  * rolling_moments, dist_from_high, dow_seasonality, gap_stats,
  * word_length_profile, stopword_profile, char_trigram_entropy.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(i * 1000L)
  private def d(s: String) = Date.valueOf(s)

  private def oneTickPanel(values: Seq[Double], asset: Long = 1L) =
    values.zipWithIndex.map { case (v, i) =>
      (asset, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, asset * 100 + i)
    }.toDF("asset_id", "date", "ts", "value", "seq")

  private def docs(rows: (Long, String, String, String)*) =
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("kama: seed is the first close; a perfectly trending series has ER 1") {
    val out = Analytics.kama(oneTickPanel((1 to 15).map(_.toDouble))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.head.getAs[Double]("kama") === 1.0)            // seed = close₁
    assert(out.head.getAs[Any]("er") == null)                 // no prior bar
    // monotone +1 per day: |net| = Σ|moves| → ER exactly 1 on every later bar
    out.tail.foreach(r => assert(r.getAs[Double]("er") === 1.0))
    // with ER 1, SC = (0.666667)² → KAMA chases the close from below
    val last = out.last
    assert(last.getAs[Double]("kama") < last.getAs[Double]("close"))
    assert(last.getAs[Double]("kama") > out(out.length - 2).getAs[Double]("kama"))
  }

  test("kama: a flat series takes ER 0 (not a division error) and stays put") {
    val out = Analytics.kama(oneTickPanel(Seq.fill(6)(42.0))).collect()
      .sortBy(_.getDate(1).toString)
    out.tail.foreach { r =>
      assert(r.getAs[Double]("er") === 0.0)
      assert(r.getAs[Double]("kama") === 42.0)
    }
  }

  test("rolling_moments: symmetric returns give ~zero skew; short frames gate to NULL") {
    // values chosen so returns alternate +r, −r' symmetrically enough to
    // sign-check: up 10%, down to start, repeatedly
    val vals = Seq(100.0, 110.0, 100.0, 110.0, 100.0, 110.0, 100.0)
    val out = Analytics.rollingMoments(oneTickPanel(vals)).collect()
      .sortBy(_.getDate(1).toString)
    // first three return rows have n < 4 → NULL moments
    out.take(3).foreach { r =>
      assert(r.getAs[Any]("skew") == null && r.getAs[Any]("ex_kurt") == null)
    }
    // two-point distribution {+0.1, −0.0909..} has a small positive skew
    val last = out.last
    assert(last.getAs[Any]("skew") != null)
    // kurtosis of a two-point near-balanced distribution is deeply negative
    assert(last.getAs[Double]("ex_kurt") < -1.0)
  }

  test("dist_from_high: at the high dist=0/days=0; below it both grow") {
    val out = Analytics.distFromHigh(oneTickPanel(Seq(10.0, 20.0, 15.0, 12.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out(1).getAs[Double]("dist") === 0.0)              // day 2 IS the high
    assert(out(1).getAs[Long]("days_since") === 0L)
    assert(out(2).getAs[Double]("dist") === -0.25)            // 15/20 − 1
    assert(out(2).getAs[Long]("days_since") === 1L)
    assert(out(3).getAs[Double]("dist") === -0.4)
    assert(out(3).getAs[Long]("days_since") === 2L)
  }

  test("dist_from_high: a re-touched high counts from the MOST RECENT touch") {
    val out = Analytics.distFromHigh(oneTickPanel(Seq(20.0, 10.0, 20.0, 15.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out(3).getAs[Long]("days_since") === 1L)           // day 3, not day 1
  }

  test("dow_seasonality: buckets land on the right weekdays with exact means") {
    // 2024-01-01 is a Monday; returns exist from day 2 (Tue) on
    val out = Analytics.dowSeasonality(oneTickPanel(Seq(100.0, 110.0, 110.0, 99.0))).collect()
    val byDow = out.map(r => r.getAs[Long]("dow") -> r).toMap
    assert(byDow(3L).getAs[Double]("mean_ret") === 0.1)       // Tuesday: +10%
    assert(byDow(3L).getAs[Long]("n_up") === 1L)
    assert(byDow(4L).getAs[Double]("mean_ret") === 0.0)       // Wednesday: flat
    assert(byDow(5L).getAs[Double]("mean_ret") === -0.1)      // Thursday: −10%
    assert(byDow(5L).getAs[Long]("n_up") === 0L)
  }

  test("gap_stats counts only gaps beyond the ±1% threshold") {
    // one-tick days: open = close of the day, so gap = daily move
    val out = Analytics.gapStats(oneTickPanel(
      Seq(100.0, 102.0, 101.5, 80.0, 80.1))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Long]("n_gap_up") === 1L)                  // +2%
    assert(r.getAs[Long]("n_gap_down") === 1L)                // −21%
    assert(r.getAs[Double]("max_abs_gap") === 0.211823)       // |80/101.5−1| u6
  }

  test("word_length_profile: exact integer mean and max") {
    val out = Pipeline.wordLengthProfile(docs(
      (1L, "a bb ccc", "en", "s1"), (2L, "dddd", "en", "s1"),
      (3L, "ee ff", "en", "s2"))).collect()
    val s1 = out.find(_.getString(0) == "s1").get
    assert(s1.getAs[Long]("n_words") === 4L)
    assert(s1.getAs[Long]("mean_len_milli") === 2500L)        // (1+2+3+4)/4
    assert(s1.getAs[Long]("max_len") === 4L)
    val s2 = out.find(_.getString(0) == "s2").get
    assert(s2.getAs[Long]("mean_len_milli") === 2000L)
  }

  test("stopword_profile: hits, per-mille, and the ≥2 pass rule") {
    val out = Pipeline.stopwordProfile(docs(
      (1L, "the cat and the hat", "en", "s1"),                // 3 hits of 5
      (2L, "pure noise tokens here", "en", "s1"),             // 0 hits of 4
      (3L, "of and that", "en", "s2"))).collect()             // 3 of 3
    val s1 = out.find(_.getString(0) == "s1").get
    assert(s1.getAs[Long]("n_stop_hits") === 3L)
    assert(s1.getAs[Long]("stop_pm") === 333L)                // 3000 div 9
    assert(s1.getAs[Long]("n_docs_pass") === 1L)
    val s2 = out.find(_.getString(0) == "s2").get
    assert(s2.getAs[Long]("stop_pm") === 1000L)
  }

  test("vol_regime: regime counts split at the exact median; alternating vol flags high") {
    // 30 days alternating ±10% then a violent tail so the last vol is high
    val vals = (1 to 24).map(i => if (i % 2 == 0) 110.0 else 100.0) ++
      Seq(200.0, 50.0, 300.0, 30.0, 400.0, 20.0)
    val out = Analytics.volRegime(oneTickPanel(vals)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") === vals.length - 2L)      // first ret + n<2 gate
    assert(r.getAs[Long]("n_high") + r.getAs[Long]("n_low") === r.getAs[Long]("n_days"))
    assert(r.getAs[Long]("in_high_regime") === 1L)            // wild tail
  }

  test("fractal_pivots: a single spike is the one pivot high") {
    val out = Analytics.fractalPivots(oneTickPanel(
      Seq(10.0, 11.0, 20.0, 12.0, 9.0, 8.0, 7.0))).collect()
    val r = out.head
    assert(r.getAs[Long]("n_pivot_high") === 1L)
    assert(r.getAs[Double]("last_pivot_high") === 20.0)
    // monotone tail: lows keep making new lows but the last two bars
    // lack right wings → exactly one pivot low at day 5? no: day-5 low 9
    // has lower days 6,7 after it → not a pivot. Verify count directly.
    assert(r.getAs[Long]("n_pivot_low") === 0L)
  }

  test("turn_of_month buckets by calendar day with exact means") {
    val vals = (1 to 28).map(i => 100.0 + i)                  // slow drift up
    val out = Analytics.turnOfMonth(oneTickPanel(vals)).collect()
    val buckets = out.map(r => r.getString(1) -> r.getAs[Long]("n_days")).toMap
    // returns exist on days 2..28: early = days 2..5 (4), late = 25..28 (4)
    assert(buckets("early") === 4L)
    assert(buckets("late") === 4L)
    assert(buckets("mid") === 19L)
    out.foreach(r => assert(r.getAs[Double]("mean_ret") > 0))
  }

  test("volume_seasonality: two-tick days count 2 ticks on their weekday") {
    val panel = Seq(
      (1L, d("2024-01-01"), ts(1), 10.0, 1L), (1L, d("2024-01-01"), ts(2), 11.0, 2L),
      (1L, d("2024-01-08"), ts(3), 12.0, 3L))                 // both Mondays
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.volumeSeasonality(panel).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("dow") === 2L)                // Monday (Spark 1=Sun)
    assert(out.head.getAs[Long]("total_ticks") === 3L)
    assert(out.head.getAs[Long]("mean_ticks_milli") === 1500L)
  }

  test("round_price_clustering: exact cent arithmetic") {
    val panel = Seq(10.0, 10.5, 10.25, 11.0, 10.004)          // 10.004 → 1000 cents (round)
      .zipWithIndex.map { case (v, i) => (1L, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, i.toLong) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.roundPriceClustering(panel).collect()
    val r = out.head
    assert(r.getAs[Long]("n_round_dollar") === 3L)            // 10.00, 11.00, 10.004→10.00
    assert(r.getAs[Long]("n_round_half") === 4L)              // + 10.50
    assert(r.getAs[Long]("dollar_pm") === 600L)
  }

  test("mixed_lang_docs: a doc hitting en+de markers counts as multilang") {
    val out = Pipeline.mixedLangDocs(docs(
      (1L, "the cat und der hund", "en", "s1"),               // en + de
      (2L, "the plain english text is here", "en", "s1"),
      (3L, "zz qq ww", "en", "s2"))).collect()                // no markers
    val s1 = out.find(_.getString(0) == "s1").get
    assert(s1.getAs[Long]("n_multilang") === 1L)
    assert(s1.getAs[Long]("multi_pm") === 500L)
    val s2 = out.find(_.getString(0) == "s2").get
    assert(s2.getAs[Long]("n_unmarked") === 1L)
  }

  test("source_overlap_matrix: identical vocab → 1000pm, disjoint absent") {
    val out = Pipeline.sourceOverlapMatrix(docs(
      (1L, "alpha beta gamma", "en", "s1"),
      (2L, "alpha beta gamma", "en", "s2"),
      (3L, "delta epsilon", "en", "s3")), topK = 10).collect()
    assert(out.length === 1)                                  // only s1×s2 intersect
    val r = out.head
    assert(r.getAs[String]("source_a") === "s1" && r.getAs[String]("source_b") === "s2")
    assert(r.getAs[Long]("jaccard_pm") === 1000L)
  }

  test("resample_weekly: Monday-start weeks, first open / last close") {
    // 2024-01-01 is a Monday; days 1..10 span two ISO weeks (1-7, 8-10)
    val out = Analytics.resampleWeekly(oneTickPanel((1 to 10).map(_.toDouble))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.length === 2)
    assert(out(0).getDate(1).toString === "2024-01-01")
    assert(out(0).getAs[Double]("open") === 1.0)
    assert(out(0).getAs[Double]("close") === 7.0)
    assert(out(0).getAs[Long]("n_days") === 7L)
    assert(out(1).getDate(1).toString === "2024-01-08")
    assert(out(1).getAs[Double]("open") === 8.0)
    assert(out(1).getAs[Double]("high") === 10.0)
  }

  test("price_percentile: exact order-statistic per-mille") {
    val out = Analytics.pricePercentile(oneTickPanel(Seq(10.0, 20.0, 15.0, 5.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out(0).getAs[Long]("pctl_pm") === 1000L)           // 1 of 1
    assert(out(1).getAs[Long]("pctl_pm") === 1000L)           // max of 2
    assert(out(2).getAs[Long]("pctl_pm") === 666L)            // 2 of 3
    assert(out(3).getAs[Long]("pctl_pm") === 250L)            // min of 4
  }

  test("quality_length_matrix: cells are integer-bucketed doc counts") {
    val d = docs(
      (1L, "the cat is on the mat and it is a fine day for all of us", "en", "s"),
      (2L, "zz", "en", "s"))
    val out = Pipeline.qualityLengthMatrix(d).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === 2L)
    out.foreach { r =>
      assert(r.getAs[Long]("q_decile") >= 0L && r.getAs[Long]("q_decile") <= 9L)
      assert(r.getAs[Long]("len_bucket") >= 0L && r.getAs[Long]("len_bucket") <= 9L)
    }
  }

  test("dup_text_mass: non-survivor chars count as dup mass") {
    val d = docs(
      (1L, "identical content here", "en", "s1"),
      (2L, "identical content here", "en", "s1"),             // dup, 22 chars
      (3L, "unique text", "en", "s2"))
    val out = Pipeline.dupTextMass(d).collect()
    val s1 = out.find(_.getString(0) == "s1").get
    assert(s1.getAs[Long]("n_dup_docs") === 1L)
    assert(s1.getAs[Long]("dup_chars") === 22L)
    assert(s1.getAs[Long]("dup_mass_pm") === 500L)
    assert(out.find(_.getString(0) == "s2").get.getAs[Long]("dup_chars") === 0L)
  }

  test("quantization_error_by_dim: a zero vector has zero error everywhere") {
    val spark0 = spark
    import spark0.implicits._
    val emb = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f), "a"),
      (2L, Array(0.0f, 0.0f, 0.0f), "b"))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Quantize.quantizationErrorByDim(emb).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_vecs") === 2L)
      // int8 reconstruction error is bounded by scale/254 ≈ 0.004
      assert(r.getAs[Long]("max_err_micro") <= 4000L)
    }
    // dim 0 of vec 1 is the scale carrier → exact code 127 → zero error
    assert(out.find(_.getAs[Long]("dim") == 0L).get.getAs[Long]("max_err_micro") === 0L)
  }

  test("underwater_duration: islands over the running-peak flag, end-state aware") {
    // peak 10 → underwater days 2-3 → new peak day 4 → underwater to end
    val out = Analytics.underwaterDuration(oneTickPanel(
      Seq(10.0, 8.0, 9.0, 12.0, 11.0, 10.0))).collect()
    val r = out.head
    assert(r.getAs[Long]("n_episodes") === 2L)
    assert(r.getAs[Long]("max_underwater_days") === 2L)
    assert(r.getAs[Long]("current_underwater_days") === 2L)   // days 5-6
    // a series ending ON its peak has zero current underwater days
    val dry = Analytics.underwaterDuration(oneTickPanel(Seq(1.0, 2.0, 3.0))).collect().head
    assert(dry.getAs[Long]("n_episodes") === 0L)
    assert(dry.getAs[Long]("current_underwater_days") === 0L)
  }

  test("range_expansion: strict NR7 and expansion counts on a designed tape") {
    // 6 warmup bars with ranges 2..7 (two ticks per day), then a 1-range
    // day (contraction) and a 10-range day (expansion)
    val bars = Seq((10.0, 12.0), (10.0, 13.0), (10.0, 14.0), (10.0, 15.0),
      (10.0, 16.0), (10.0, 17.0), (10.0, 11.0), (10.0, 20.0))
    val p = bars.zipWithIndex.flatMap { case ((lo, hi), i) =>
      Seq((1L, d(f"2024-01-${i + 1}%02d"), ts(2 * i + 1), lo, 2L * i),
        (1L, d(f"2024-01-${i + 1}%02d"), ts(2 * i + 2), hi, 2L * i + 1))
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.rangeExpansion(p).collect().head
    assert(out.getAs[Long]("n_days") === 2L)                  // only days 7,8 have full windows
    assert(out.getAs[Long]("n_contraction") === 1L)
    assert(out.getAs[Long]("n_expansion") === 1L)
  }

  test("ibs: close position in range, flat bars excluded from the mean") {
    // day 1: close at the high (ibs 1); day 2: close at the low (ibs 0);
    // day 3: flat bar → excluded
    val p = Seq(
      (1L, d("2024-01-01"), ts(1), 5.0, 1L), (1L, d("2024-01-01"), ts(2), 10.0, 2L),
      (1L, d("2024-01-02"), ts(3), 10.0, 3L), (1L, d("2024-01-02"), ts(4), 5.0, 4L),
      (1L, d("2024-01-03"), ts(5), 7.0, 5L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.ibs(p).collect().head
    assert(out.getAs[Long]("n_flat") === 1L)
    assert(out.getAs[Long]("n_measured") === 2L)
    assert(out.getAs[Double]("mean_ibs") === 0.5)
  }

  test("cross_lang_dups and near_dup_length_ratio ride the candidate pair set") {
    val t = "this exact duplicated content block is long enough to shingle well " * 3
    val dcs = docs(
      (1L, t, "en", "s"), (2L, t, "fr", "s"),                 // cross-lang dup
      (3L, t + " extra tail", "en", "s"),                     // same-lang near dup
      (4L, "completely different text about nothing in particular", "de", "s"))
    val cl = Dedup.crossLangDups(dcs).collect()
    val enfr = cl.find(r => r.getString(0) == "en" && r.getString(1) == "fr")
    assert(enfr.nonEmpty && enfr.get.getAs[Long]("n_pairs") >= 1L)
    assert(enfr.get.getAs[Boolean]("cross_lang"))
    val lr = Dedup.nearDupLengthRatio(dcs).collect()
    assert(lr.map(_.getAs[Long]("n_pairs")).sum >= 2L)
    // the identical pair lands in the top ratio bucket
    assert(lr.exists(r => r.getAs[Long]("bucket") == 9L && r.getAs[Long]("n_pairs") >= 1L))
  }

  test("weekly_consistency: sign runs over weekly closes") {
    // 3 ISO weeks of one tick each Monday: up, up, down
    val p = Seq((1L, "2024-01-01", 100.0), (1L, "2024-01-08", 110.0),
      (1L, "2024-01-15", 120.0), (1L, "2024-01-22", 90.0))
      .zipWithIndex.map { case ((a, dd, v), i) => (a, d(dd), ts(i + 1), v, i.toLong) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.weeklyConsistency(p).collect().head
    assert(out.getAs[Long]("n_weeks") === 3L)
    assert(out.getAs[Long]("n_pos_weeks") === 2L)
    assert(out.getAs[Long]("longest_pos_run") === 2L)
    assert(out.getAs[Long]("longest_neg_run") === 1L)
    assert(out.getAs[Long]("pos_pm") === 666L)
  }

  test("shingle_df_histogram: power-of-two df buckets with exact masses") {
    val t = "shared-shingle-content-block!"
    val out = Dedup.shingleDfHistogram(docs(
      (1L, t, "en", "s"), (2L, t, "en", "s"),                 // every shingle df=2
      (3L, "another text entirely okay", "en", "s"))).collect()
    val byB = out.map(r => r.getAs[Long]("bucket") -> r).toMap
    // df=2 shingles land in bucket 1 (floor(log2 2)); df=1 in bucket 0
    assert(byB(1L).getAs[Long]("n_shingles") === t.length - 7L)
    assert(byB(1L).getAs[Long]("posting_mass") === 2L * (t.length - 7L))
    assert(byB(0L).getAs[Long]("n_shingles") > 0L)
  }

  test("token_mass_concentration: exact order-stat cuts and tail masses") {
    // 10 docs: nine 2-token docs, one 100-token doc
    val many = (1L to 9L).map(i => (i, "a b", "en", "s"))
    val out = Pipeline.tokenMassConcentration(
      docs(many :+ ((10L, ("tok " * 100).trim, "en", "s")): _*)).collect().head
    assert(out.getAs[Long]("n_docs") === 10L)
    assert(out.getAs[Long]("total_tokens") === 118L)
    assert(out.getAs[Long]("p90_len") === 2L)                 // 9th of 10 sorted
    assert(out.getAs[Long]("mass_above_p90") === 100L)        // the giant doc
    assert(out.getAs[Long]("share_p90_pm") === 847L)          // 100000 div 118
  }

  test("char_trigram_entropy: uniform distinct trigrams hit ln N; repeats collapse it") {
    // "abcdef" → 4 distinct trigrams, each once → H = ln 4
    val out = Pipeline.charTrigramEntropy(docs((1L, "abcdef", "en", "u"))).collect()
    assert(out.head.getAs[Long]("n_trigrams") === 4L)
    assert(math.abs(out.head.getAs[Double]("h_tri") - math.log(4.0)) < 1e-6)
    // "aaaaaa" → one trigram repeated 4× → H = 0
    val flat = Pipeline.charTrigramEntropy(docs((1L, "aaaaaa", "en", "v"))).collect()
    assert(flat.head.getAs[Double]("h_tri") === 0.0)
  }
}
