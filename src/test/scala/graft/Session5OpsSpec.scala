package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Dedup, Pipeline, Similarity}

/** Specs for the round-5 session-4 operators: containment pairs,
  * k-NN label voting, domain mixture planning, Parkinson volatility,
  * Amihud illiquidity, inverse-vol risk-parity weights.
  */
class Session5OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(i * 1000L)
  private def d(s: String) = Date.valueOf(s)

  // --- containment ---------------------------------------------------

  test("containment finds a short doc embedded in a long one that jaccard misses") {
    val short0 = "alpha beta gamma delta epsilon zeta"
    val long1 = "PREFIX " * 20 + short0 + " SUFFIX" * 20
    val docs = Seq((0L, short0), (1L, long1), (2L, "totally unrelated content here"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, k = 8, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every 8-gram of the short doc appears verbatim inside the long doc
    assert(cont.toSeq === Seq((0L, 1L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(docs, k = 8, threshold = 0.9).collect()
    assert(jac.isEmpty, "jaccard at 0.9 must NOT pair docs of very different length")
  }

  test("containment equals |A∩B| / min(|A|,|B|) on a hand-computed pair") {
    // k=2 shingles: "ab","bc","cd" vs "ab","bc" → inter 2, min size 2 → 1.0
    val docs = Seq((0L, "abcd"), (1L, "abc")).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, k = 2, threshold = 0.5).collect()
    assert(out.length === 1 && out(0).getDouble(2) === 1.0)
  }

  // --- knn_classify --------------------------------------------------

  test("knnClassify votes the majority label of the neighbors") {
    // query 0 sits among three label-7 vectors and one label-9
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(0.99f, 0.14f), 7),
      (2L, Array(0.98f, 0.2f), 7),
      (3L, Array(0.97f, 0.24f), 9),
      (4L, Array(0.0f, 1.0f), 5))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, Seq(0L), k = 3).collect()(0)
    assert(out.getInt(1) === 7)  // true_label
    assert(out.getInt(2) === 7)  // pred_label: 2 of 3 neighbors are label 7
    assert(out.getLong(3) === 2L)
  }

  test("knnClassify breaks vote ties by the smaller label") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.99f, 0.14f), 4),
      (2L, Array(0.98f, 0.2f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, Seq(0L), k = 2).collect()(0)
    assert(out.getInt(2) === 2, "1-1 tie must resolve to the smaller label")
  }

  // --- domain_mix ----------------------------------------------------

  test("domainMix computes shares and uniform-rebalance weights") {
    val docs = Seq(
      (0L, "one two three", "web"),   // 3 tokens
      (1L, "four five six", "web"),   // 3 tokens
      (2L, "seven eight", "books"))   // 2 tokens
      .toDF("doc_id", "text", "source")
    val out = Pipeline.domainMix(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // books: 2/8 tokens, target 1/2 → weight = 8/(2*2) = 2.0
    // web:   6/8 tokens, target 1/2 → weight = 8/(2*6) = 0.666667
    assert(out.toSeq === Seq(
      ("books", 1L, 2L, 0.25, 2.0),
      ("web", 2L, 6L, 0.75, 0.666667)))
  }

  // --- parkinson_vol -------------------------------------------------

  test("parkinsonVol is zero for flat bars and matches a hand computation") {
    val panel = Seq(
      (1L, "2024-01-01", 110, 10.0, 1L),  // flat day: high = low = 10
      (1L, "2024-01-02", 210, 10.0, 2L),
      (1L, "2024-01-02", 220, 12.1, 3L))  // range day: ln(12.1/10)²
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.parkinsonVol(panel).collect()
      .map(r => (r.getDate(1).toString, r.getDouble(3)))
    assert(out(0) === ("2024-01-01", 0.0))
    // day 2: x = round(ln(1.21)², 6) = 0.036362; frame = [0, 0.036362]
    // pv = √(0.036362 / (4·ln2 · 2)) = 0.080978…
    val x = math.round(math.pow(math.log(1.21), 2) * 1e6) / 1e6
    val exp = math.floor(math.sqrt(x / (2.772588722239781 * 2)) * 1e6 + 0.5) / 1e6
    assert(out(1)._2 === exp)
  }

  test("parkinsonVol drops non-positive-price days from the frame") {
    val panel = Seq(
      (1L, "2024-01-01", 110, -5.0, 1L),
      (1L, "2024-01-01", 120, 10.0, 2L),  // low = -5 → day excluded
      (1L, "2024-01-02", 210, 10.0, 3L))
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.parkinsonVol(panel).collect()
    assert(out.map(_.getDate(1).toString).toSeq === Seq("2024-01-02"))
  }

  // --- amihud --------------------------------------------------------

  test("amihud divides |return micro-units| by tick count, integer-rounded") {
    val panel = Seq(
      (1L, "2024-01-01", 110, 10.0, 1L),
      (1L, "2024-01-02", 210, 11.0, 2L),  // ret = 0.1, 2 ticks that day
      (1L, "2024-01-02", 220, 11.0, 3L))
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.amihud(panel).collect()
    // xim = (100000·2 + 2) div 4 = 50000; illiq = (2·50000 + 1) div 2 = 50000 → 0.05
    assert(out.length === 1)
    assert(out(0).getDouble(4) === 0.05)
  }

  test("amihud hand case: exact half-micro boundary rounds up in both engines") {
    // ret = 0.000001 over 2 ticks → (1·2 + 2) div 4 = 1 micro (rounds UP from 0.5)
    val panel = Seq(
      (1L, "2024-01-01", 110, 1000000.0, 1L),
      (1L, "2024-01-02", 210, 1000001.0, 2L),
      (1L, "2024-01-02", 220, 1000001.0, 3L))
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.amihud(panel).collect()
    assert(out(0).getDouble(4) === 1.0e-6)
  }

  // --- drawdown_episodes ---------------------------------------------

  test("drawdownEpisodes extracts maximal underwater runs with depth and length") {
    // series 10, 8, 9, 11, 7: underwater days 2-3 (dd -0.2, -0.1), then
    // new peak 11, then day 5 underwater (dd -0.363636)
    val panel = Seq(
      (1L, "2024-01-01", 110, 10.0, 1L),
      (1L, "2024-01-02", 210, 8.0, 2L),
      (1L, "2024-01-03", 310, 9.0, 3L),
      (1L, "2024-01-04", 410, 11.0, 4L),
      (1L, "2024-01-05", 510, 7.0, 5L))
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.drawdownEpisodes(panel).collect()
      .map(r => (r.getDate(1).toString, r.getDate(2).toString, r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("2024-01-02", "2024-01-03", 2L, -0.2),
      ("2024-01-05", "2024-01-05", 1L, -0.363636)))
  }

  // --- tick_imbalance ------------------------------------------------

  test("tickImbalance classifies upticks, downticks and zero-tick inheritance") {
    // ticks: 10 (no prev), 11 (up), 11 (zero → inherits buy), 9 (down)
    val panel = Seq(
      (1L, "2024-01-01", 110, 10.0, 1L),
      (1L, "2024-01-01", 120, 11.0, 2L),
      (1L, "2024-01-01", 130, 11.0, 3L),
      (1L, "2024-01-01", 140, 9.0, 4L))
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.tickImbalance(panel).collect()(0)
    assert(out.getLong(2) === 2L)  // buy_ticks: uptick + inherited zero-tick
    assert(out.getLong(3) === 1L)  // sell_ticks
    assert(out.getLong(4) === 666L)   // buy_pm = 2000 div 3
    assert(out.getLong(5) === 332L)   // imbalance_pm = 2·666 − 1000
  }

  // --- dup_by_source -------------------------------------------------

  test("dupBySource attributes near-dup pairs to unordered source pairs") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, shared, "web"),
      (1L, shared, "books"),
      (2L, shared, "web"),
      (3L, "completely different content with no overlap at all", "web"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.dupBySource(docs, k = 8, threshold = 0.9).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // pairs: (0,1) web-books, (0,2) web-web, (1,2) books-web
    assert(out.toSeq === Seq(("books", "web", 2L), ("web", "web", 1L)))
  }

  // --- bpe_pairs -----------------------------------------------------

  test("bpePairs counts word instances containing each character pair") {
    val docs = Seq((0L, "aba aba cd"), (1L, "aba x")).toDF("doc_id", "text")
    val out = Pipeline.bpePairs(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // "aba" appears as 3 word instances; its pair SET is {ab, ba}
    assert(out("ab") === 3L)
    assert(out("ba") === 3L)
    assert(out("cd") === 1L)
    assert(!out.contains("x"), "1-char words are dropped")
  }

  // --- var_backtest --------------------------------------------------

  test("varBacktest counts violations against the prior-window quantile") {
    // 22 days: 21 returns; first 20 alternate small ups with two -0.05
    // crashes; the last return (-0.2) must violate the
    // 2nd-smallest-of-prior-20 VaR (-0.05)
    val vals = (0 until 22).map { i =>
      if (i == 21) 0.8 else if (Set(5, 10)(i)) 0.95 else 1.0 + (i % 2) * 0.01
    }.scanLeft(100.0)((p, m) => p * m).drop(1)
    val panel = vals.zipWithIndex.map { case (v, i) =>
      (1L, new Date(86400000L * (19700 + i)), ts(i + 1), v, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.varBacktest(panel).collect()
    assert(out.length === 1)
    assert(out(0).getLong(2) >= 1L, "the -0.2 crash must breach the prior VaR")
    assert(out(0).getLong(4) === 100L)  // nominal_pm for k=2, window=20
  }

  // --- shingle_novelty -----------------------------------------------

  test("shingleNovelty scores first-witness share per doc") {
    val a = "abcdefghijkl"           // doc 0: all shingles novel
    val docs = Seq((0L, a), (1L, a), (2L, a + "XYZWVUTS")).toDF("doc_id", "text")
    val out = Dedup.shingleNovelty(docs, k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out(0L) === 1000L)  // every shingle first seen here
    assert(out(1L) === 0L)     // verbatim copy of doc 0
    assert(out(2L) > 0L && out(2L) < 1000L)  // shares a's prefix, adds new tail
  }

  // --- embedding_drift -----------------------------------------------

  test("embeddingDrift is ~0 for aligned halves and large for rotated ones") {
    // label 0: both parities point along x → drift 0
    // label 1: even ids along x, odd ids along y → cos 0, drift 1
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(2.0f, 0.0f), 0),
      (2L, Array(3.0f, 0.0f), 0), (3L, Array(1.0f, 0.0f), 0),
      (10L, Array(1.0f, 0.0f), 1), (11L, Array(0.0f, 1.0f), 1),
      (12L, Array(2.0f, 0.0f), 1), (13L, Array(0.0f, 2.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.embeddingDrift(emb).collect()
    val byLabel = rows.map(r => r.getInt(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(byLabel(0)._1 === 1.0 && byLabel(0)._2 === 0.0)
    assert(byLabel(1)._1 === 0.0 && byLabel(1)._2 === 1.0)
    assert(rows.forall(r => r.getLong(1) === 2L && r.getLong(2) === 2L))
  }

  // --- roll_spread ---------------------------------------------------

  test("rollSpread recovers a spread from bid-ask bounce and nulls on trends") {
    // asset 1 bounces 100↔101 (pure bid-ask bounce): dps alternate ±1,
    // 4 shifted pairs → cov = -4/3 → roll = 2·√(4/3) ≈ 2.309401
    // asset 2 trends monotonically: cov = 0 → estimator undefined → null
    val bounce = (0 until 6).map(i => (1L, d(f"2024-01-${i + 1}%02d"), ts(i), 100.0 + (i % 2), i.toLong))
    val trend = (0 until 6).map(i => (2L, d(f"2024-01-${i + 1}%02d"), ts(i), 100.0 + i, (10 + i).toLong))
    val panel = (bounce ++ trend).toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.rollSpread(panel).collect()
    assert(out.length === 2)
    assert(out(0).getLong(0) === 1L && math.abs(out(0).getDouble(2) - 2.309401) < 1e-6)
    assert(out(1).getLong(0) === 2L && out(1).isNullAt(2))
  }

  // --- kyle_lambda ---------------------------------------------------

  test("kyleLambda recovers the per-tick impact coefficient") {
    // each day's ticks all move 0.5 in one direction → dp = 0.5·net_flow
    // exactly, so the OLS slope must be 0.5
    val flows = Seq(2, -1, 3, 1)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Date, Timestamp, Double, Long)]()
    var price = 100.0
    var seq = 0L
    rows += ((1L, d("2024-01-01"), ts(seq.toInt), price, seq)); seq += 1
    flows.zipWithIndex.foreach { case (f, day) =>
      (0 until math.abs(f)).foreach { _ =>
        price += 0.5 * math.signum(f)
        rows += ((1L, d(f"2024-01-${day + 2}%02d"), ts(seq.toInt), price, seq)); seq += 1
      }
    }
    val out = Analytics.kyleLambda(rows.toSeq.toDF("asset_id", "date", "ts", "value", "seq")).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 4L)
    assert(out(0).getDouble(2) === 0.5)
  }

  // --- variance_ratio ------------------------------------------------

  test("varianceRatio flags mean reversion and nulls constant-return series") {
    // asset 1 alternates up/down multiplicatively → k-day sums cancel →
    // VR well below 1; asset 2 is flat → every ret exactly 0 → Var1 = 0 → null
    val alt = (0 until 16).scanLeft(100.0)((p, i) => if (i % 2 == 0) p * 1.01 else p / 1.01)
    val cst = (0 until 16).scanLeft(100.0)((p, _) => p)
    val panel =
      (alt.zipWithIndex.map { case (v, i) => (1L, d(f"2024-01-${i + 1}%02d"), ts(i), v, i.toLong) } ++
        cst.zipWithIndex.map { case (v, i) => (2L, d(f"2024-01-${i + 1}%02d"), ts(i), v, (100 + i).toLong) })
        .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.varianceRatio(panel).collect()
    assert(out.length === 2)
    assert(out(0).getLong(0) === 1L && out(0).getLong(1) === 16L && out(0).getLong(2) === 12L)
    assert(out(0).getDouble(3) < 0.5, s"alternating series must mean-revert, got ${out(0).getDouble(3)}")
    assert(out(1).getLong(0) === 2L && out(1).isNullAt(3))
  }

  // --- ulcer_index ---------------------------------------------------

  test("ulcerIndex is the RMS of pct drawdown from the rolling high") {
    val panel = Seq(
      (1L, d("2024-01-01"), ts(0), 100.0, 0L),
      (1L, d("2024-01-02"), ts(1), 90.0, 1L),
      (1L, d("2024-01-03"), ts(2), 100.0, 2L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.ulcerIndex(panel).collect()
    assert(out(0).getDouble(3) === 0.0 && out(0).getDouble(4) === 0.0)
    assert(out(1).getDouble(3) === -10.0)
    assert(math.abs(out(1).getDouble(4) - 7.071068) < 1e-6)  // √((0+100)/2)
    assert(out(2).getDouble(3) === 0.0)
    assert(math.abs(out(2).getDouble(4) - 5.773503) < 1e-6)  // √(100/3)
  }

  // --- risk_parity ---------------------------------------------------

  test("riskParity weights are inverse-vol proportional and sum to ~1 per date") {
    val out = Analytics.riskParity(Tables.panel(spark, "/root/testdata/sf0.001"))
    val rows = out.collect().map(r =>
      (r.getDate(0).toString, r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byDate = rows.groupBy(_._1)
    byDate.foreach { case (_, rs) =>
      val s = rs.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-3, s"weights must sum to ~1, got $s")
      // lower vol ⇒ strictly higher weight within a date
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sortBy(w => -w).toSeq)
    }
  }

  // --- bpe_train -----------------------------------------------------

  test("bpeTrain learns merges in frequency order with greedy leftmost rewrite") {
    // word freqs: the×4, at-family (cat sat mat hat bat)×5 singles
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the hat and the bat"),
      (2L, "low lower lowest")).toDF("doc_id", "text")
    val out = Pipeline.bpeTrain(docs, merges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // merge 1: (a,t) appears in 5 word instances — beats (t,h)=4
    assert(out(0) === ((1L, "a", "t", "at", 5L)))
    // merge 2: (h,e) and (t,h) tie at 4 — (h,e) wins the (l, r) text tie-break
    assert(out(1) === ((2L, "h", "e", "he", 4L)))
    // merge 3: (t,he) 4 — the merged symbol participates in later pairs
    assert(out(2) === ((3L, "t", "he", "the", 4L)))
  }

  test("bpeTrain merge rewrite is greedy leftmost (aaa -> [aa, a])") {
    val docs = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val out = Pipeline.bpeTrain(docs, merges = 2).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
    // iteration 1: pair (a,a) counted at both adjacent positions = 2·2
    assert(out(0) === ((1L, "aa", 4L)))
    // after the greedy rewrite each word is [aa, a]: pair (aa, a) ×2
    assert(out(1) === ((2L, "aaa", 2L)))
  }

  test("bpeTrain stops early when no pairs remain") {
    val docs = Seq((0L, "a b c a")).toDF("doc_id", "text")
    val out = Pipeline.bpeTrain(docs, merges = 5).collect()
    assert(out.isEmpty, "single-char words have no adjacent pairs")
  }

  // --- sortino / calmar / cusum --------------------------------------

  private def panelOf(rows: Seq[(Long, String, Int, Double)]): DataFrame =
    rows.map { case (a, dt, i, v) =>
      (a, d(dt), new Timestamp(Date.valueOf(dt).getTime + i * 1000L), v, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")

  test("sortino uses only negative returns in the deviation") {
    // returns: +0.1, -0.1, +0.1, -0.1 → mean 0; downside dev uses the two -0.1
    val p = panelOf(Seq(
      (1L, "2024-01-01", 0, 100.0), (1L, "2024-01-02", 0, 110.0),
      (1L, "2024-01-03", 0, 99.0), (1L, "2024-01-04", 0, 108.9),
      (1L, "2024-01-05", 0, 98.01)))
    val r = Analytics.sortino(p).collect()(0)
    // rets: .1, -.1, .1, -.1 ; d2 = .02 ; dd = sqrt(.02/4) = .070711
    assert(r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(3) - 0.070711) < 1e-6)
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(4) === 0.0, "mean 0 → sortino 0/dd = 0")
    val rr = Analytics.sortino(panelOf(Seq(
      (2L, "2024-01-01", 0, 100.0), (2L, "2024-01-02", 0, 110.0),
      (2L, "2024-01-03", 0, 121.0)))).collect()(0)
    assert(rr.isNullAt(4), "no negative returns → dd 0 → null sortino")
  }

  test("calmar divides annualized mean return by |max drawdown|") {
    // 100 → 120 → 90: peak 120, max dd = (90-120)/120 = -0.25
    val p = panelOf(Seq(
      (1L, "2024-01-01", 0, 100.0), (1L, "2024-01-02", 0, 120.0),
      (1L, "2024-01-03", 0, 90.0)))
    val r = Analytics.calmar(p).collect()(0)
    assert(r.getDouble(3) === -0.25)
    // rets: .2, -.25 → mean -.025 ; calmar = -.025*252/.25 = -25.2
    assert(math.abs(r.getDouble(2) - (-0.025)) < 1e-9)
    assert(math.abs(r.getDouble(4) - (-25.2)) < 1e-9)
  }

  test("cusum matches the direct recursion and resets at zero") {
    // returns: +0.05, +0.05, -0.01 with k=0.0025
    val p = panelOf(Seq(
      (1L, "2024-01-01", 0, 100.0), (1L, "2024-01-02", 0, 105.0),
      (1L, "2024-01-03", 0, 110.25), (1L, "2024-01-04", 0, 109.1475)))
    val rows = Analytics.cusum(p).collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    // s+ : max(0,.05-.0025)=.0475 ; .0475+.0475=.095 ; .095-.0125=.0825
    assert(rows.map(_._1).toSeq === Seq(0.0475, 0.095, 0.0825))
    // s- : min(0,.05+.0025)=0 ; 0 ; min(0,-.0075)=-.0075
    assert(rows.map(_._2).toSeq === Seq(0.0, 0.0, -0.0075))
    // h=0.03 breached upward from day 1
    assert(rows.map(_._3).toSeq === Seq(true, true, true))
  }

  // --- zipf_slope / heaps_law ----------------------------------------

  test("zipfSlope fits ln(freq) on ln(rank) exactly on a constructed corpus") {
    // freqs 8,4,2,1 at ranks 1..4: a perfect power law only in spirit —
    // compute the OLS by hand instead
    val docs = Seq((0L, ("a " * 8 + "b " * 4 + "c " * 2 + "d").trim)).toDF("doc_id", "text")
    val r = Pipeline.zipfSlope(docs, topN = 10).collect()(0)
    assert(r.getLong(0) === 4L)
    val x = Seq(1.0, 2.0, 3.0, 4.0).map(v => math.rint(math.log(v) * 1e6) / 1e6)
    val y = Seq(8.0, 4.0, 2.0, 1.0).map(v => math.rint(math.log(v) * 1e6) / 1e6)
    val n = 4.0
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val sx2 = x.map(v => v * v).sum
    val slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    assert(math.abs(r.getDouble(1) - slope) < 1e-5)
    assert(r.getDouble(1) < -0.9 && r.getDouble(1) > -1.6, "roughly zipfian")
  }

  test("heapsLaw cumulative vocab equals running distinct count") {
    val docs = Seq(
      (0L, "a b c"), (1L, "a b d"), (2L, "e"), (3L, ""), (4L, "a e f g"))
      .toDF("doc_id", "text")
    val rows = Pipeline.heapsLaw(docs, bucketWidth = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq(
      (0L, 3L, 3L, 3L, 3L),   // a b c
      (1L, 3L, 1L, 6L, 4L),   // + d
      (2L, 1L, 1L, 7L, 5L),   // + e
      (3L, 0L, 0L, 7L, 5L),   // empty doc
      (4L, 4L, 2L, 11L, 7L))) // + f g
  }

  test("heapsLaw bucketed prefix sum is invariant to bucket width") {
    val docs = (0L until 40L).map(i => (i, s"w$i common t${i % 7}")).toDF("doc_id", "text")
    val a = Pipeline.heapsLaw(docs, bucketWidth = 3).collect().map(_.toSeq).toSeq
    val b = Pipeline.heapsLaw(docs, bucketWidth = 4096).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  // --- bpe_encode ----------------------------------------------------

  test("bpeEncode counts tokens under the trained merges (greedy leftmost)") {
    // corpus: "ab" dominates → merge 1 = (a,b); "aaa" under merge (a,a)
    // would be [aa, a] — here vocab is {ab, aaa}: with 2 merges the
    // trainer learns (a,b) then (a,a), so aaa → [aa, a] = 2 tokens.
    val docs = Seq(
      (0L, "ab ab ab"), (1L, "aaa ab"), (2L, ""))
      .toDF("doc_id", "text")
    val out = Pipeline.bpeEncode(docs, merges = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, 3L, 3L, 1000L),  // three fully-merged "ab" words
      (1L, 2L, 3L, 1500L),  // aaa → 2 tokens + ab → 1
      (2L, 0L, 0L, -1L)))   // empty doc: zero counts, NULL fertility
  }

  test("bpeEncode with zero merges counts characters per word") {
    val docs = Seq((0L, "abc de")).toDF("doc_id", "text")
    val out = Pipeline.bpeEncode(docs, merges = 0).collect()(0)
    assert(out.getLong(1) === 2L && out.getLong(2) === 5L && out.getLong(3) === 2500L)
  }

  // --- spearman_corr -------------------------------------------------

  test("spearmanCorr is ±1 for monotone return relationships") {
    // asset 1 and 2: returns strictly increasing together (different
    // magnitudes — Pearson would be < 1, Spearman exactly 1);
    // asset 3: returns strictly decreasing while 1's increase → −1.
    val p = panelOf(Seq(
      (1L, "2024-01-01", 0, 100.0), (1L, "2024-01-02", 0, 101.0),
      (1L, "2024-01-03", 0, 103.0), (1L, "2024-01-04", 0, 106.0),
      (2L, "2024-01-01", 0, 50.0), (2L, "2024-01-02", 0, 51.0),
      (2L, "2024-01-03", 0, 53.5), (2L, "2024-01-04", 0, 57.5),
      (3L, "2024-01-01", 0, 100.0), (3L, "2024-01-02", 0, 110.0),
      (3L, "2024-01-03", 0, 115.0), (3L, "2024-01-04", 0, 117.0)))
    val out = Analytics.spearmanCorr(p, Seq(1L, 2L, 3L)).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(out((1L, 2L)) === 1.0)
    assert(out((1L, 3L)) === -1.0)
    assert(out((2L, 3L)) === -1.0)
  }

  test("spearmanCorr with a tied-rank asset stays in [-1, 1] and is deterministic") {
    val p = panelOf(Seq(
      (1L, "2024-01-01", 0, 100.0), (1L, "2024-01-02", 0, 102.0),
      (1L, "2024-01-03", 0, 104.04), (1L, "2024-01-04", 0, 103.0),
      (2L, "2024-01-01", 0, 10.0), (2L, "2024-01-02", 0, 11.0),
      (2L, "2024-01-03", 0, 12.0), (2L, "2024-01-04", 0, 13.0)))
    // asset 1 rets: .02, .02 (tied → both min-rank 1), -.0099…
    val out = Analytics.spearmanCorr(p, Seq(1L, 2L)).collect()
    assert(out.length === 1)
    val s = out(0).getDouble(3)
    assert(s >= -1.0 && s <= 1.0)
    val again = Analytics.spearmanCorr(p, Seq(1L, 2L)).collect()(0).getDouble(3)
    assert(s === again)
  }

  // --- hurst ---------------------------------------------------------

  test("hurst separates persistent from anti-persistent series") {
    // persistent: one long up-regime then one long down-regime —
    // k-day sums grow with k → H well above 0.5.
    val persist = (0 until 33).scanLeft(100.0)((p, i) =>
      if (i < 16) p * (1.01 + 0.001 * (i % 3)) else p / (1.01 + 0.001 * (i % 3)))
    // anti-persistent: alternating up/down with deterministic jitter —
    // k-day sums cancel → H well below 0.5.
    val anti = (0 until 33).scanLeft(100.0)((p, i) =>
      if (i % 2 == 0) p * (1.02 + 0.001 * (i % 5)) else p / (1.019 + 0.001 * (i % 5)))
    val panel2 =
      (persist.zipWithIndex.map { case (v, i) => (1L, d(f"2024-${i / 28 + 1}%02d-${i % 28 + 1}%02d"), ts(i), v, i.toLong) } ++
        anti.zipWithIndex.map { case (v, i) => (2L, d(f"2024-${i / 28 + 1}%02d-${i % 28 + 1}%02d"), ts(i), v, (100 + i).toLong) })
        .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.hurst(panel2).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(out(1L) > 0.6, s"regime-persistent series must trend, got ${out(1L)}")
    assert(out(2L) < 0.4, s"alternating series must anti-persist, got ${out(2L)}")
  }

  // --- half_life -----------------------------------------------------

  test("halfLife recovers the exact AR(1) coefficient on a constructed series") {
    // p_{t+1} − p_t = −0.5 · (p_t − 10) − perfect fit, φ = −0.5,
    // half-life = −ln2 / ln(0.5) = 1 day (micro-rounded ln2 literal).
    val vals = Iterator.iterate(20.0)(p => 10.0 + 0.5 * (p - 10.0)).take(8).toSeq
    val p = panelOf(vals.zipWithIndex.map { case (v, i) =>
      (1L, f"2024-01-${i + 1}%02d", 0, v) })
    val r = Analytics.halfLife(p).collect()(0)
    assert(r.getLong(1) === 7L)
    assert(r.getDouble(2) === -0.5)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-5)
  }

  test("halfLife is NULL for a non-reverting (trending) series") {
    val vals = (0 until 8).map(i => 100.0 + 3.0 * i)
    val p = panelOf(vals.zipWithIndex.map { case (v, i) =>
      (1L, f"2024-01-${i + 1}%02d", 0, v) })
    val r = Analytics.halfLife(p).collect()(0)
    // Δp constant, level rising → φ ≈ 0 (not in (−1,0)) → NULL
    assert(r.isNullAt(3))
  }

  // --- char_entropy --------------------------------------------------

  test("charEntropyMicro matches hand-computed entropies") {
    import graft.expressions.Kernels
    val df = Seq((0L, "aaaa"), (1L, "ab"), (2L, "abab"), (3L, ""), (4L, "x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Kernels.charEntropyMicro(col("text")).as("e"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(df(0L) === 0L, "single-symbol string has zero entropy")
    assert(df(1L) === 693147L, "two distinct chars -> ln 2")
    assert(df(2L) === 693147L, "entropy depends on distribution, not length")
    assert(df(3L) === -1L, "empty string -> NULL")
    assert(df(4L) === 0L)
  }

  test("charEntropyMicro equals an independent per-doc computation on varied text") {
    import graft.expressions.Kernels
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aAbB cCdD!!??", "zzzzzzzzzy", "0123456789" * 3)
    def expected(s: String): Long = {
      val n = s.length.toDouble
      val sum = s.groupBy(identity).toSeq.sortBy(_._1).map(_._2.length)
        .foldLeft(0.0)((a, c) => a + c * math.log(c.toDouble))
      math.floor((math.log(n) - sum / n) * 1e6 + 0.5).toLong
    }
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), Kernels.charEntropyMicro(col("text")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === expected(t), s"mismatch for '$t'")
    }
  }

  test("char_entropy_micro is callable from SQL") {
    GraftFunctions.register(spark)
    val out = spark.sql("SELECT char_entropy_micro('ab') AS e").collect()(0).getLong(0)
    assert(out === 693147L)
    assert(spark.sql("SELECT char_entropy_micro('') AS e").collect()(0).isNullAt(0))
  }

  // --- benford -------------------------------------------------------

  test("benford counts first significant digits incl. sub-1 decimals") {
    val li = Seq("1.00", "150.25", "19.99", "2.50", "25.00", "0.09", "0.30", "3.33", "987.65", "41.00")
      .map(s => Tuple1(new java.math.BigDecimal(s))).toDF("l_extendedprice")
    val out = Analytics.benford(li).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // digits: 1×3, 2×2, 3×2, 4×1, 9×2 — "0.09"→9, "0.30"→3
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((1, 3L), (2, 2L), (3, 2L), (4, 1L), (9, 2L)))
    val m = out.map(t => (t._1, t._3)).toMap
    assert(m(1) === 300L && m(2) === 200L && m(9) === 200L)
    val dev = out.map(t => (t._1, t._5)).toMap
    assert(dev(1) === 300L - 301L && dev(9) === 200L - 46L)
  }

  // --- garman_klass --------------------------------------------------

  test("garmanKlass matches a hand computation and clamps negative sums") {
    // day 1: flat (H=L=C=O) → x = 0; day 2: H=12.1 L=10 O=10 C=11
    val panel = Seq(
      (1L, "2024-01-01", 110, 10.0, 1L),
      (1L, "2024-01-02", 210, 10.0, 2L),
      (1L, "2024-01-02", 215, 12.1, 3L),
      (1L, "2024-01-02", 220, 11.0, 4L))
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.garmanKlass(panel).collect()
      .map(r => (r.getDate(1).toString, r.getDouble(2), r.getDouble(3)))
    assert(out(0) === (("2024-01-01", 0.0, 0.0)))
    val a2 = math.round(math.pow(math.log(12.1 / 10.0), 2) * 1e6) / 1e6
    val b2 = math.round(math.pow(math.log(11.0 / 10.0), 2) * 1e6) / 1e6
    val x2 = math.round((0.5 * a2 - 0.3862943611198906 * b2) * 1e6) / 1e6
    val gk2 = math.floor(math.sqrt(math.max(x2, 0.0) / 2.0) * 1e6 + 0.5) / 1e6
    assert(out(1) === (("2024-01-02", x2, gk2)))
  }

  test("garmanKlass σ is finite and non-negative over varied bars") {
    // H≥max(O,C) and L≤min(O,C) make per-day x ≥ 0 for consistent
    // bars; the Σ clamp is defensive. Assert gk never goes NaN.
    val panel = (1 to 30).flatMap { i =>
      Seq((1L, f"2024-01-$i%02d", i * 10 + 1, 10.0 + (i % 7) * 0.5, i * 2L),
        (1L, f"2024-01-$i%02d", i * 10 + 2, 10.0 + ((i + 3) % 5) * 0.7, i * 2L + 1L))
    }.map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val gks = Analytics.garmanKlass(panel).collect().map(_.getDouble(3))
    assert(gks.forall(g => !g.isNaN && g >= 0.0))
  }

  // --- herfindahl ----------------------------------------------------

  test("herfindahl is 1e6 for one asset and (n²+m²)/(n+m)² for two") {
    val panel = Seq(
      (1L, "2024-01-01", 110, 10.0, 1L),   // day 1: only asset 1 → HHI 1.0
      (1L, "2024-01-02", 210, 10.0, 2L),   // day 2: 3 ticks vs 1 tick
      (1L, "2024-01-02", 211, 10.5, 3L),
      (1L, "2024-01-02", 212, 10.6, 4L),
      (2L, "2024-01-02", 213, 99.0, 5L))
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.herfindahl(panel).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) === (("2024-01-01", 1L, 1L, 1000000L)))
    // (9 + 1) / 16 = 0.625
    assert(out(1) === (("2024-01-02", 2L, 4L, 625000L)))
  }

  // --- omega_ratio ---------------------------------------------------

  test("omegaRatio divides gain micro-sum by loss micro-sum, NULL when no losses") {
    val panel = Seq(
      (1L, "2024-01-01", 110, 10.0, 1L),
      (1L, "2024-01-02", 210, 11.0, 2L),   // +0.1
      (1L, "2024-01-03", 310, 10.45, 3L),  // -0.05
      (2L, "2024-01-01", 110, 10.0, 4L),
      (2L, "2024-01-02", 210, 12.0, 5L))   // +0.2, never loses
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.omegaRatio(panel).collect()
    val r1 = out(0)
    assert(r1.getLong(0) === 1L && r1.getLong(1) === 2L)
    assert(r1.getLong(2) === 100000L && r1.getLong(3) === 50000L)
    assert(r1.getLong(4) === 2000000L)  // Ω = 2.0 in micro
    val r2 = out(1)
    assert(r2.getLong(3) === 0L && r2.isNullAt(4))
  }

  // --- melt_long -----------------------------------------------------

  test("meltLong emits one row per bar field, inverse of the wide shape") {
    val panel = Seq(
      (1L, "2024-01-01", 110, 10.0, 1L),
      (1L, "2024-01-01", 120, 12.0, 2L),
      (1L, "2024-01-01", 130, 11.0, 3L))
      .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.meltLong(panel).collect()
      .map(r => (r.getString(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("close", 11.0), ("high", 12.0), ("low", 10.0), ("open", 10.0)))
  }
}
