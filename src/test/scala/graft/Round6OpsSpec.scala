package graft

import java.sql.{Date, Timestamp}

import graft.operators.{Analytics, Dedup, Similarity}

/** Hand-computed fixtures for the round-6 additions (B86-B89, C64-C65). */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(i * 1000L)
  private def d(s: String) = Date.valueOf(s)

  /** Two assets, asset 2 moving exactly 3× asset 1 — the same fixture
    * the beta spec uses: mkt = 2r, so beta/downside-beta are 0.5 / 1.5
    * and both treynors equal mean(r)·2·... (mean1/0.5 = mean2/1.5).
    */
  private lazy val twoAssetPanel = {
    def series(rets: Seq[Double], base: Double): Seq[Double] =
      rets.scanLeft(base) { case (v, r) => v * (1 + r) }
    val r1 = Seq(0.1, -0.05, 0.2, -0.1, 0.15)
    val v1 = series(r1, 100.0)
    val v2 = series(r1.map(_ * 3), 100.0)
    (v1.zipWithIndex.map { case (v, i) => (1L, i) -> v } ++
      v2.zipWithIndex.map { case (v, i) => (2L, i) -> v })
      .map { case ((a, i), v) => (a, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, a * 100 + i) }
      .toDF("asset_id", "date", "ts", "value", "seq")
  }

  test("information_ratio: active returns of 3x-mover mirror the 1x asset") {
    val out = Analytics.informationRatio(twoAssetPanel).collect()
    val ir1 = out.find(_.getLong(0) == 1L).get.getAs[Double]("ir")
    val ir2 = out.find(_.getLong(0) == 2L).get.getAs[Double]("ir")
    // active1 = r − 2r = −r, active2 = 3r − 2r = r → equal magnitude,
    // opposite sign; asset 2 outperforms (mean r > 0)
    assert(math.abs(ir1 + ir2) < 1e-4, s"ir1=$ir1 ir2=$ir2")
    assert(ir2 > 0 && ir1 < 0)
  }

  test("downside_beta: Estrada betas of the 3x pair are 0.5 and 1.5") {
    val out = Analytics.downsideBeta(twoAssetPanel).collect()
    val b1 = out.find(_.getLong(0) == 1L).get.getAs[Double]("downside_beta")
    val b2 = out.find(_.getLong(0) == 2L).get.getAs[Double]("downside_beta")
    // da1 = dm/2 and da2 = 3·dm/2 elementwise → ratios exactly 0.5 / 1.5
    assert(math.abs(b1 - 0.5) < 1e-3, s"b1=$b1")
    assert(math.abs(b2 - 1.5) < 1e-3, s"b2=$b2")
    val n1 = out.find(_.getLong(0) == 1L).get.getAs[Long]("n_down")
    assert(n1 > 0, "some below-mean days must exist")
  }

  test("treynor: per-unit-of-beta excess return is equal for the 3x pair") {
    val out = Analytics.treynor(twoAssetPanel).collect()
    val t1 = out.find(_.getLong(0) == 1L).get.getAs[Double]("treynor")
    val t2 = out.find(_.getLong(0) == 2L).get.getAs[Double]("treynor")
    // mean1/0.5 == mean2/1.5 because mean2 = 3·mean1 — Treynor's point:
    // scaling systematic exposure does not change risk-adjusted reward
    assert(math.abs(t1 - t2) < 1e-3, s"t1=$t1 t2=$t2")
    assert(t1 > 0)
  }

  test("overnight_gap: open vs prior close per day") {
    val p = Seq(
      (1L, "2024-01-01", 110, 10.0, 1L), // day-1 open
      (1L, "2024-01-01", 120, 12.0, 2L), // day-1 close
      (1L, "2024-01-02", 210, 18.0, 3L),
      (1L, "2024-01-03", 310, 9.0, 4L))
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.overnightGap(p).collect()
      .map(r => r.getDate(1).toString -> r.getAs[Double]("gap")).toMap
    assert(out === Map("2024-01-02" -> 0.5, "2024-01-03" -> -0.5))
  }

  test("prefix_dups: shared 64-char prefix groups; singletons dropped") {
    val pad = "a" * 70
    val docs = Seq(
      (1L, pad + "xxx", "en", "web", 73L),
      (2L, pad + "yyy", "en", "web", 73L),
      (3L, "entirely different document", "en", "web", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.prefixDups(docs).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("keep_id") === 1L)
    assert(out(0).getAs[Long]("n_docs") === 2L)
  }

  test("vol_of_vol: constant returns give zero vol and zero vol-of-vol") {
    // asset 1 grows exactly 10%/day → every rolling frame has std 0;
    // asset 2 alternates ±10% → positive vol
    def series(rets: Seq[Double], base: Double): Seq[Double] =
      rets.scanLeft(base) { case (v, r) => v * (1 + r) }
    val r1 = Seq.fill(24)(0.1)
    val r2 = (0 until 24).map(i => if (i % 2 == 0) 0.1 else -0.1)
    val p = (series(r1, 100.0).zipWithIndex.map { case (v, i) => (1L, i) -> v } ++
      series(r2, 100.0).zipWithIndex.map { case (v, i) => (2L, i) -> v })
      .map { case ((a, i), v) => (a, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, a * 100 + i) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.volOfVol(p).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("mean_vol") === 0.0)
    assert(out(1L).getAs[Double]("vol_of_vol") === 0.0)
    assert(out(2L).getAs[Double]("mean_vol") > 0.0)
  }

  test("token_length_quantiles: interpolated percentiles over 1..5 tokens") {
    val docs = (1 to 5).map(n => (n.toLong, Seq.fill(n)("w").mkString(" "), "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.operators.Pipeline.tokenLengthQuantiles(docs).collect()(0)
    assert(r.getAs[String]("source") === "s1")
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Double]("p10") === 1.4)
    assert(r.getAs[Double]("p50") === 3.0)
    assert(r.getAs[Double]("p90") === 4.6)
    assert(r.getAs[Long]("max_tokens") === 5L)
  }

  test("vocab_overlap: halves sharing one of two top words score 333 per-mille") {
    val docs = (1L to 10L).map(i =>
      (i, if (i % 2 == 0) "alpha beta" else "alpha gamma", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.operators.Pipeline.vocabOverlap(docs).collect()(0)
    assert(r.getAs[Long]("n_union") === 3L)
    assert(r.getAs[Long]("n_common") === 1L)
    assert(r.getAs[Long]("jaccard_pm") === 333L)
  }

  test("dedup_threshold_curve: per-mille buckets with descending cumulative") {
    val pairs = Seq((1L, 2L, 0.35), (1L, 3L, 0.45), (2L, 3L, 0.45), (4L, 5L, 1.0))
      .toDF("doc_a", "doc_b", "jaccard")
    val out = graft.operators.Dedup.dedupThresholdCurve(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((300L, 1L, 4L), (400L, 2L, 3L), (1000L, 1L, 1L)))
  }

  test("pack_efficiency: four 1-token docs at budget 2 fill two batches exactly") {
    val docs = (1L to 4L).map(i => (i, "w", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.operators.Pipeline.packEfficiency(docs, budget = 2, shards = 1).collect()(0)
    assert(r.getAs[Long]("shard") === 0L)
    assert(r.getAs[Long]("n_batches") === 2L)
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("tokens") === 4L)
    assert(r.getAs[Long]("fill_pm") === 1000L)
  }

  test("monthly_seasonality: returns group by calendar month") {
    val p = Seq(
      (1L, "2024-01-01", 1, 100.0, 1L), (1L, "2024-01-02", 2, 110.0, 2L),
      (1L, "2024-01-03", 3, 121.0, 3L), // two Jan rets of +10%
      (1L, "2024-02-01", 4, 121.0, 4L), (1L, "2024-02-02", 5, 60.5, 5L)) // Feb: 0%, −50%
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.monthlySeasonality(p).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getAs[Double]("mean_ret"))).toMap
    assert(out(1L) === ((2L, 0.1)))
    assert(out(2L) === ((2L, -0.25)))
  }

  test("cross_source_dups: counts prefix families shared by source pairs") {
    val pad = "b" * 70
    val docs = Seq(
      (1L, pad + "tail-one", "en", "srcA", 78L),
      (2L, pad + "tail-two", "en", "srcB", 78L),   // same family as doc 1
      (3L, pad + "tail-three", "en", "srcB", 80L), // same family, same source — 1 distinct
      (4L, "other", "en", "srcA", 5L),
      (5L, "other", "en", "srcC", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.Dedup.crossSourceDups(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("srcA", "srcB") -> 1L, ("srcA", "srcC") -> 1L))
  }

  test("unigram_kl: identical halves diverge zero; skewed halves diverge positive") {
    val same = (1L to 8L).map(i => (i, "alpha beta gamma", "en", "web", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r0 = graft.operators.Pipeline.unigramKl(same).collect()(0)
    assert(r0.getAs[Double]("kl_sym") === 0.0)
    assert(r0.getAs[Long]("n_words") === 3L)
    val skew = (1L to 8L).map(i =>
      (i, if (i % 2 == 0) "alpha alpha alpha" else "beta beta beta", "en", "web", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r1 = graft.operators.Pipeline.unigramKl(skew).collect()(0)
    assert(r1.getAs[Double]("kl_sym") > 1.0, s"kl=${r1.getAs[Double]("kl_sym")}")
  }

  test("cluster_size_histogram: closure sizes distribute as expected") {
    val docs = (1L to 6L).map(i => (i, s"doc number $i", "en", "web", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (4L, 5L, 0.9))
      .toDF("doc_a", "doc_b", "jaccard")
    val clusters = graft.operators.Dedup.nearDupClusters(docs, pairs)
    val out = graft.operators.Dedup.clusterSizeHistogram(clusters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // {1,2,3}, {4,5}, {6} → one cluster each of sizes 3, 2, 1
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("pair_degree_histogram: hub doc shows up in the degree tail") {
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.9), (4L, 5L, 0.9))
      .toDF("doc_a", "doc_b", "jaccard")
    val out = graft.operators.Dedup.pairDegreeHistogram(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 4L, 2L -> 1L))
  }

  test("r_squared: a perfectly 3x-levered asset is 100% systematic") {
    // asset 2 = exactly 3× asset 1's returns → both perfectly correlated
    // with their equal-weight market → r² = 1 for both (up to ret rounding)
    val out = Analytics.rSquared(twoAssetPanel).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("r2")).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-4, s"r2_1=${out(1L)}")
    assert(math.abs(out(2L) - 1.0) < 1e-4, s"r2_2=${out(2L)}")
  }

  test("capture_ratio: the 3x pair captures 0.5x and 1.5x of the market in both halves") {
    val out = Analytics.captureRatio(twoAssetPanel).collect()
      .map(r => r.getLong(0) -> r).toMap
    // ra/rm is r/2r = 0.5 (asset 1) and 3r/2r = 1.5 (asset 2) on EVERY
    // day, so both halves' capture ratios equal those constants
    for ((a, exp) <- Seq(1L -> 0.5, 2L -> 1.5)) {
      assert(math.abs(out(a).getAs[Double]("up_capture") - exp) < 1e-3)
      assert(math.abs(out(a).getAs[Double]("down_capture") - exp) < 1e-3)
      assert(out(a).getAs[Long]("n_up") + out(a).getAs[Long]("n_down") === 5L)
    }
  }

  test("ljung_box: alternating returns reject white noise; constant returns null out") {
    def series(rets: Seq[Double], base: Double): Seq[Double] =
      rets.scanLeft(base) { case (v, r) => v * (1 + r) }
    val alt = (0 until 24).map(i => if (i % 2 == 0) 0.1 else -0.1)
    val const = Seq.fill(24)(0.05)
    val p = (series(alt, 100.0).zipWithIndex.map { case (v, i) => (1L, i) -> v } ++
      series(const, 100.0).zipWithIndex.map { case (v, i) => (2L, i) -> v })
      .map { case ((a, i), v) => (a, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, a * 100 + i) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.ljungBox(p).collect().map(r => r.getLong(0) -> r).toMap
    val alt1 = out(1L)
    assert(alt1.getAs[Double]("rho1") < -0.8, s"rho1=${alt1.getAs[Double]("rho1")}")
    assert(alt1.getAs[Double]("q5") > 10.0, s"q5=${alt1.getAs[Double]("q5")}")
    // constant returns: zero-variance slices → rho/Q are NULL, never a number
    assert(out(2L).isNullAt(out(2L).fieldIndex("q5")))
  }

  test("embedding_norm_stats: 3-4-5 norms aggregate per label") {
    val emb = Seq(
      (10L, Array(3.0f, 4.0f), 0),
      (11L, Array(6.0f, 8.0f), 0),
      (12L, Array(0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingNormStats(emb).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(0).getAs[Long]("n_vecs") === 2L)
    assert(out(0).getAs[Double]("min_norm") === 5.0)
    assert(out(0).getAs[Double]("max_norm") === 10.0)
    assert(out(0).getAs[Double]("mean_norm") === 7.5)
    assert(out(1).getAs[Double]("mean_norm") === 0.0)
  }
}
