package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame

import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(i * 1000L)
  private def d(s: String) = Date.valueOf(s)

  // ts values are globally increasing (day*100 + intra) so knowledge
  // order and date order agree, as in the real panel.
  private lazy val panel: DataFrame = Seq(
    (1L, "2024-01-01", 110, 10.0, 1L),
    (1L, "2024-01-01", 120, 12.0, 2L),
    (1L, "2024-01-02", 210, 18.0, 3L),
    (1L, "2024-01-03", 310, 9.0, 4L),
    (2L, "2024-01-01", 110, 100.0, 5L))
    .map { case (a, dt, t, v, q) => (a, d(dt), ts(t), v, q) }
    .toDF("asset_id", "date", "ts", "value", "seq")

  test("moving average over a 2-row frame") {
    val out = Analytics.movingAvg(panel, frame = 2)
      .filter($"asset_id" === 1).select("mavg").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(10.0, 11.0, 15.0, 13.5))
  }

  test("daily returns on the LWW series") {
    // LWW daily for asset 1: 12.0 (01-01), 18.0 (01-02), 9.0 (01-03)
    val out = Analytics.dailyReturns(panel)
      .filter($"asset_id" === 1).select("ret").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(0.5, -0.5))
  }

  test("returns yield NULL (dropped), not an error, across a zero value") {
    val p = Seq(
      (1L, d("2024-01-01"), ts(1), 0.0, 1L),
      (1L, d("2024-01-02"), ts(1), 5.0, 2L),
      (1L, d("2024-01-03"), ts(1), 10.0, 3L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.dailyReturns(p).select("ret").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(1.0)) // only 01-02→01-03 survives
  }

  test("resample_ohlc computes open/high/low/close in knowledge order") {
    val r = Analytics.resampleOhlc(panel)
      .filter($"asset_id" === 1 && $"date" === d("2024-01-01")).collect()(0)
    assert(r.getAs[Double]("open") === 10.0)
    assert(r.getAs[Double]("close") === 12.0)
    assert(r.getAs[Double]("high") === 12.0)
    assert(r.getAs[Double]("low") === 10.0)
    assert(r.getAs[Long]("n_ticks") === 2L)
  }

  test("drawdown tracks the running peak per asset") {
    // LWW daily asset 1: 12.0, 18.0, 9.0 → peaks 12, 18, 18 → dd 0, 0, -0.5
    val out = Analytics.drawdown(panel).filter($"asset_id" === 1)
      .select("peak", "drawdown").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out.toSeq === Seq((12.0, 0.0), (18.0, 0.0), (18.0, -0.5)))
  }

  test("xsec_rank ranks assets within each date with pct position") {
    // 2024-01-01 LWW: asset1=12.0, asset2=100.0 → ranks 1:asset2, 2:asset1
    val out = Analytics.xsecRank(panel).filter($"date" === d("2024-01-01"))
      .select("asset_id", "rank", "pct_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((2L, 1L, 0.0), (1L, 2L, 1.0)))
    // single-asset date → pct_rank NULL (no divide-by-zero error)
    val single = Analytics.xsecRank(panel).filter($"date" === d("2024-01-02")).collect()(0)
    assert(single.isNullAt(single.fieldIndex("pct_rank")))
  }

  test("resample_monthly rolls the daily LWW series to monthly bars") {
    val p = panel.unionByName(Seq(
      (1L, d("2024-02-05"), ts(500), 30.0, 9L))
      .toDF("asset_id", "date", "ts", "value", "seq"))
    val r = Analytics.resampleMonthly(p).filter($"asset_id" === 1).collect()
    assert(r.length === 2)
    val jan = r(0)
    assert(jan.getAs[String]("month") === "2024-01")
    assert(jan.getAs[Double]("open") === 12.0)   // LWW of 01-01
    assert(jan.getAs[Double]("high") === 18.0)
    assert(jan.getAs[Double]("low") === 9.0)
    assert(jan.getAs[Double]("close") === 9.0)
    assert(jan.getAs[Date]("month_end_date") === d("2024-01-03"))
    assert(jan.getAs[Long]("n_days") === 3L)
    assert(r(1).getAs[String]("month") === "2024-02")
  }

  test("ewma matches a hand-computed Horner fold") {
    // asset 1 LWW daily: 12.0, 18.0, 9.0 with w = 0.9
    // t1: s=12, n=1 → 12
    // t2: s=12*.9+18=28.8, n=1.9 → 15.157895
    // t3: s=28.8*.9+9=34.92, n=2.71 → 12.885609
    val out = Analytics.ewma(panel, alpha = 0.1, span = 60)
      .filter($"asset_id" === 1).select("ewma").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(12.0, 15.157895, 12.885609))
  }

  test("donchian channel tracks rolling high/low and close position") {
    // asset 1 LWW daily: 12.0, 18.0, 9.0 → highs 12,18,18; lows 12,12,9
    val out = Analytics.donchian(panel, window = 20).filter($"asset_id" === 1)
      .select("ch_high", "ch_low", "ch_pos").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      (12.0, 12.0, None),          // degenerate channel → NULL position
      (18.0, 12.0, Some(1.0)),
      (18.0, 9.0, Some(0.0))))
  }

  test("winsorize clamps values to the per-group percentile bounds") {
    val ev = (1L to 100L).map(i => (i, "a", i.toDouble)).toDF("event_id", "event_type", "value")
    val out = Analytics.winsorize(ev, lo = 0.05, hi = 0.95).collect()
    // percentile(1..100, .05) = 5.95, (.95) = 95.05 (linear interpolation)
    out.foreach { r =>
      val v = r.getAs[Double]("value"); val w = r.getAs[Double]("value_w")
      assert(w >= 5.95 && w <= 95.05)
      if (v >= 5.95 && v <= 95.05) assert(w === v)
    }
    assert(out.count(r => r.getAs[Double]("value_w") == 5.95) === 5)
    assert(out.count(r => r.getAs[Double]("value_w") == 95.05) === 5)
  }

  test("sessionize splits on gaps > threshold and aggregates per session") {
    val ev = Seq(
      (1L, ts(0), 1L), (1L, ts(100), 2L),          // session 1
      (1L, ts(3000), 3L),                          // gap 2900 > 1800 → session 2
      (2L, ts(50), 4L))
      .toDF("user_id", "ts", "event_id")
    val out = Analytics.sessionize(ev, 1800.0)
      .select("user_id", "session_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("topk_per_group ranks deterministically with id tie-break") {
    val ev = Seq(
      (1L, "a", 5.0, 1L), (2L, "a", 5.0, 2L), (3L, "a", 1.0, 3L), (4L, "b", 9.0, 4L))
      .toDF("event_id", "event_type", "value", "user_id")
    val out = Analytics.topKPerGroup(ev, 2)
      .select("event_id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 2L, 4L)) // ties at 5.0 → lower event_id first
  }

  test("gap_fill forward-fills missing calendar days per asset") {
    // asset 1 has 01-01, 01-02, 01-03; drop 01-02 → filled from 01-01
    val sparse = panel.filter(!($"asset_id" === 1 && $"date" === d("2024-01-02")))
    val out = Analytics.gapFill(sparse).filter($"asset_id" === 1)
      .collect().map(r => (r.getDate(1).toString, r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 12.0, false),  // LWW of the two 01-01 ticks
      ("2024-01-02", 12.0, true),   // filled forward
      ("2024-01-03", 9.0, false)))
  }

  test("bars_5min buckets intraday ticks into 300s bars") {
    import java.sql.Timestamp
    val p = Seq(
      (1L, d("2024-01-01"), new Timestamp(0L), 10.0, 1L),      // bucket 0
      (1L, d("2024-01-01"), new Timestamp(200 * 1000L), 20.0, 2L), // bucket 0
      (1L, d("2024-01-01"), new Timestamp(301 * 1000L), 5.0, 3L))  // bucket 300
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.bars5Min(p).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(5), r.getLong(6)))
    assert(out.toSeq === Seq((0L, 10.0, 20.0, 2L), (300L, 5.0, 5.0, 1L)))
  }

  test("sketches track exact aggregates within tolerance on real data") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val rows = Analytics.sketches(ev).collect()
    assert(rows.length === 5)
    // the operator now carries its own tolerance verdicts (the driver
    // oracle hash-compares them against literal TRUE) — every one must
    // hold on real data, and the exact columns must be sane
    rows.foreach { r =>
      assert(r.getLong(1) > 0, "exact_distinct must be positive")
      assert(r.getBoolean(3), s"hll_ok=false for ${r.getString(0)}")
      assert(r.getBoolean(4), s"tdigest_ok=false for ${r.getString(0)}")
    }
  }

  test("q1 money aggregates are exact decimals (engine-order independent)") {
    val li = Seq(
      ("A", "F", 10.0, 100.00, 0.05, 0.02, "1995-01-01"),
      ("A", "F", 20.0, 200.00, 0.10, 0.04, "1995-01-02"),
      ("R", "O", 30.0, 300.00, 0.00, 0.00, "2002-01-01")) // filtered out
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "ship")
      .withColumn("l_shipdate", $"ship".cast("timestamp")).drop("ship")
    val r = Analytics.q1PricingSummary(li, "2000-12-01").collect()
    assert(r.length === 1)
    assert(r(0).getAs[Double]("sum_qty") === 30.0)
    assert(r(0).getAs[Double]("sum_disc_price") === 95.0 + 180.0)
    assert(r(0).getAs[Double]("sum_charge") === 95.0 * 1.02 + 180.0 * 1.04)
    assert(r(0).getAs[Long]("count_order") === 2L)
  }

  test("macd: flat series gives zero lines; trending series has positive macd") {
    val const = (1 to 10).map(i => (1L, d(f"2024-01-${i}%02d"), ts(i), 50.0, i.toLong))
      .toDF("asset_id", "date", "ts", "value", "seq")
    Analytics.macd(const).collect().foreach { r =>
      assert(r.getAs[Double]("macd") === 0.0)
      assert(r.getAs[Double]("signal") === 0.0)
      assert(r.getAs[Double]("hist") === 0.0)
    }
    // steadily rising close → fast EW > slow EW → macd > 0 (after warmup)
    val up = (1 to 30).map(i => (1L, d(f"2024-01-${i}%02d"), ts(i), 100.0 + i * 2, i.toLong))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val tail = Analytics.macd(up).orderBy("date").collect().drop(5)
    assert(tail.forall(_.getAs[Double]("macd") > 0.0))
  }

  test("var_cvar takes the worst ceil(q*n) returns; seasonality means by weekday") {
    // 20 returns → k = ceil(20*0.05) = 2 worst returns in the tail
    val vals = (1 to 21).map(i => 100.0 * (1 to i).map(j => 1 + (if (j % 5 == 0) -0.2 else 0.05)).product)
    val p = vals.zipWithIndex.map { case (v, i) =>
      (1L, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val r = Analytics.varCvar(p, q = 0.05).collect()(0)
    assert(r.getAs[Long]("n_days") === 20L && r.getAs[Long]("n_tail") === 1L)
    assert(math.abs(r.getAs[Double]("var") + 0.2) < 1e-6)   // worst return is -0.2
    assert(math.abs(r.getAs[Double]("cvar") + 0.2) < 1e-6)
    val season = Analytics.seasonality(p).collect()
    assert(season.map(_.getAs[Long]("n_days")).sum === 20L)
    season.foreach { row =>
      val dow = row.getAs[Long]("dow")
      assert(dow >= 1 && dow <= 7)
    }
  }

  test("advance_decline counts breadth and accumulates the AD line") {
    val p = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-02", 11.0), (1L, "2024-01-03", 10.0),
      (2L, "2024-01-01", 20.0), (2L, "2024-01-02", 22.0), (2L, "2024-01-03", 22.0))
      .zipWithIndex.map { case ((a, dt, v), i) => (a, d(dt), ts(i + 1), v, i.toLong) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.advanceDecline(p).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // day2: both up (+2); day3: one down, one flat (ad 2-1=1)
    assert(out.toSeq === Seq(
      ("2024-01-02", 2L, 0L, 0L, 2L),
      ("2024-01-03", 0L, 1L, 1L, 1L)))
  }

  test("rolling_beta tracks the windowed beta of proportional assets") {
    def series(rets: Seq[Double], base: Double): Seq[Double] =
      rets.scanLeft(base) { case (v, r) => v * (1 + r) }
    val r1 = Seq(0.1, -0.05, 0.2, -0.1, 0.15, 0.05, -0.08)
    val v1 = series(r1, 100.0)
    val v2 = series(r1.map(_ * 3), 100.0)
    val p = (v1.zipWithIndex.map { case (v, i) => (1L, i) -> v } ++
      v2.zipWithIndex.map { case (v, i) => (2L, i) -> v })
      .map { case ((a, i), v) => (a, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, a * 100 + i) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.rollingBeta(p, window = 4).collect()
    out.foreach { row =>
      val target = if (row.getLong(0) == 1L) 0.5 else 1.5
      assert(math.abs(row.getAs[Double]("beta") - target) < 1e-3, row.toString)
    }
  }

  test("sharpe and autocorr recover known series properties") {
    // sawtooth rets alternate +1.0/-0.5: mean 0.25, perfect negative lag-1 autocorr
    val sh = Analytics.sharpe(sawtooth).collect()(0)
    assert(math.abs(sh.getAs[Double]("mean_ret") - 0.25) < 1e-6)
    assert(sh.getAs[Double]("sharpe") > 0.0)
    val ac = Analytics.autocorr(sawtooth).collect()(0)
    assert(math.abs(ac.getAs[Double]("autocorr") + 1.0) < 1e-6, ac.toString)
    // constant series: sd 0 → sharpe null; autocorr den 0 → null
    val const = (1 to 6).map(i => (1L, d(f"2024-01-0$i"), ts(i), 10.0, i.toLong))
      .toDF("asset_id", "date", "ts", "value", "seq")
    assert(Analytics.sharpe(const).collect()(0).isNullAt(3))
    assert(Analytics.autocorr(const).collect()(0).isNullAt(2))
  }

  test("portfolio_nav compounds the weighted daily return into NAV") {
    // two assets, weights 0.5/0.5: day2 rets +0.1/-0.1 → port 0, day3 +0.2/+0.2 → port 0.2
    val p = Seq(
      (1L, "2024-01-01", 100.0), (1L, "2024-01-02", 110.0), (1L, "2024-01-03", 132.0),
      (2L, "2024-01-01", 200.0), (2L, "2024-01-02", 180.0), (2L, "2024-01-03", 216.0))
      .zipWithIndex
      .map { case ((a, dt, v), i) => (a, d(dt), ts(i + 1), v, i.toLong) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.portfolioNav(p, Map(1L -> 0.5, 2L -> 0.5))
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("2024-01-02", 0.0, 1.0), ("2024-01-03", 0.2, 1.2)))
  }

  test("funnel_stages counts users by greedy subsequence depth (repeats allowed)") {
    val ev = Seq(
      // user 1: view→click→purchase→view = 4 stages of the 6-stage funnel
      (1L, 1, "view"), (1L, 2, "error"), (1L, 3, "click"), (1L, 4, "purchase"), (1L, 5, "view"),
      // user 2: click before view doesn't count; reaches stage 1 only
      (2L, 1, "click"), (2L, 2, "view"), (2L, 3, "error"),
      // user 3: nothing matching
      (3L, 1, "signup"))
      .map { case (u, i, t) => (u, ts(i), i.toLong, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.funnelStages(ev, Seq.fill(2)(Seq("view", "click", "purchase")).flatten)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 1L, 1L -> 1L, 4L -> 1L))
  }

  test("corr_matrix: proportional returns give corr 1, inverted give -1") {
    def series(rets: Seq[Double], base: Double): Seq[Double] =
      rets.scanLeft(base) { case (v, r) => v * (1 + r) }
    val r = Seq(0.1, -0.05, 0.2, -0.1, 0.15)
    val p = Seq(
      1L -> series(r, 100.0),
      2L -> series(r.map(_ * 2), 50.0),   // corr(1,2) = 1 (proportional)
      3L -> series(r.map(-_), 200.0))     // corr(1,3) = -1 (inverted)
      .flatMap { case (a, vs) => vs.zipWithIndex.map { case (v, i) =>
        (a, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, a * 100 + i) } }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.corrMatrix(p, Seq(1L, 2L, 3L)).collect()
      .map(row => ((row.getLong(0), row.getLong(1)), row.getDouble(3))).toMap
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-4)
    assert(math.abs(out((1L, 3L)) + 1.0) < 1e-4)
    assert(math.abs(out((2L, 3L)) + 1.0) < 1e-4)
  }

  test("twap weights each tick by time-to-next over the day span") {
    val p = Seq(
      // asset 1: ticks at t=0s (v=10) for 30s, t=30s (v=20) for 70s, t=100s (last, weight 0)
      (1L, d("2024-01-01"), ts(0), 10.0, 1L),
      (1L, d("2024-01-01"), ts(30), 20.0, 2L),
      (1L, d("2024-01-01"), ts(100), 99.0, 3L),
      // asset 2: single tick → twap = value
      (2L, d("2024-01-01"), ts(5), 7.0, 4L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.twap(p).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    // (10*30 + 20*70) / 100 = 17.0
    assert(out === Seq((1L, 3L, 17.0), (2L, 1L, 7.0)))
  }

  // daily closes 10, 20, 10, 20, … → returns alternate +1.0, -0.5
  private lazy val sawtooth: DataFrame = (1 to 9).map { i =>
    (1L, d(f"2024-01-0$i"), ts(i * 100), if (i % 2 == 1) 10.0 else 20.0, i.toLong)
  }.toDF("asset_id", "date", "ts", "value", "seq")

  test("rolling_vol: constant series has zero vol; sawtooth matches hand formula") {
    val const = (1 to 5).map(i => (1L, d(f"2024-01-0$i"), ts(i), 10.0, i.toLong))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val vols = Analytics.rollingVol(const, window = 3).select("vol").collect().map(_.getDouble(0))
    assert(vols.nonEmpty && vols.forall(_ === 0.0))

    // sawtooth rets: +1, -0.5, +1, -0.5 …; window 2 → each frame {+1, -0.5}
    // sample sd of {1, -0.5} = |1 - (-0.5)|/sqrt(2) = 1.06066
    val out = Analytics.rollingVol(sawtooth, window = 2)
      .orderBy("date").select("vol").collect().map(_.getDouble(0))
    out.drop(1).foreach(v => assert(math.abs(v - 1.060660) < 1e-6, v.toString))
  }

  test("bollinger: constant series collapses the band and nulls pct_b") {
    val const = (1 to 5).map(i => (1L, d(f"2024-01-0$i"), ts(i), 10.0, i.toLong))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val rows = Analytics.bollinger(const, window = 3).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("mid") === 10.0)
      assert(r.getAs[Double]("upper") === 10.0 && r.getAs[Double]("lower") === 10.0)
      assert(r.isNullAt(r.fieldIndex("pct_b")))
    }
    // sawtooth: value always inside [lower, upper], pct_b in [0, 1]
    val bb = Analytics.bollinger(sawtooth, window = 4).collect()
    bb.foreach { r =>
      assert(r.getAs[Double]("value") >= r.getAs[Double]("lower") - 1e-9)
      assert(r.getAs[Double]("value") <= r.getAs[Double]("upper") + 1e-9)
      val p = r.getAs[Double]("pct_b")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("rsi: monotone-up pins to 100, monotone-down to 0, sawtooth strictly between") {
    val up = (1 to 6).map(i => (1L, d(f"2024-01-0$i"), ts(i), 10.0 + i, i.toLong))
      .toDF("asset_id", "date", "ts", "value", "seq")
    assert(Analytics.rsi(up).select("rsi").collect().map(_.getDouble(0)).forall(_ === 100.0))
    val down = (1 to 6).map(i => (1L, d(f"2024-01-0$i"), ts(i), 100.0 - i * 5, i.toLong))
      .toDF("asset_id", "date", "ts", "value", "seq")
    assert(Analytics.rsi(down).select("rsi").collect().map(_.getDouble(0)).forall(_ === 0.0))
    val mid = Analytics.rsi(sawtooth).select("rsi").collect().map(_.getDouble(0)).drop(1)
    assert(mid.forall(v => v > 0.0 && v < 100.0))
  }

  test("xsec_zscore standardizes each date cross-section") {
    val p = Seq(
      (1L, d("2024-01-01"), ts(1), 10.0, 1L),
      (2L, d("2024-01-01"), ts(2), 20.0, 2L),
      (3L, d("2024-01-01"), ts(3), 30.0, 3L),
      (9L, d("2024-01-02"), ts(4), 5.0, 4L)) // singleton date → z NULL
      .toDF("asset_id", "date", "ts", "value", "seq")
    val rows = Analytics.xsecZscore(p).collect()
    val d1 = rows.filter(_.getDate(1).toString == "2024-01-01").map(_.getDouble(3))
    assert(d1.toSeq === Seq(-1.0, 0.0, 1.0))
    assert(rows.filter(_.getDate(1).toString == "2024-01-02").head.isNullAt(3))
  }

  test("beta: an asset moving 3x another has beta 1.5 vs their equal-weight market") {
    // asset 1 rets: r, asset 2 rets: 3r → mkt = 2r; beta_1 = cov(r,2r)/var(2r) = 0.5
    def series(rets: Seq[Double], base: Double): Seq[Double] =
      rets.scanLeft(base) { case (v, r) => v * (1 + r) }
    val r1 = Seq(0.1, -0.05, 0.2, -0.1, 0.15)
    val v1 = series(r1, 100.0)
    val v2 = series(r1.map(_ * 3), 100.0)
    val p = (v1.zipWithIndex.map { case (v, i) => (1L, i) -> v } ++
      v2.zipWithIndex.map { case (v, i) => (2L, i) -> v })
      .map { case ((a, i), v) => (a, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, a * 100 + i) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.beta(p).collect()
    val b1 = out.find(_.getLong(0) == 1L).get.getAs[Double]("beta")
    val b2 = out.find(_.getLong(0) == 2L).get.getAs[Double]("beta")
    assert(math.abs(b1 - 0.5) < 1e-4, s"beta1=$b1")
    assert(math.abs(b2 - 1.5) < 1e-4, s"beta2=$b2")
  }

  test("vwap weights price by size with exact decimal sums") {
    val li = Seq(
      (1L, Timestamp.valueOf("1995-01-05 00:00:00"), 10.0, 100.0),
      (1L, Timestamp.valueOf("1995-01-20 00:00:00"), 30.0, 600.0),
      (1L, Timestamp.valueOf("1995-02-01 00:00:00"), 5.0, 50.0),
      (2L, Timestamp.valueOf("1995-01-09 00:00:00"), 8.0, 96.0))
      .toDF("l_suppkey", "l_shipdate", "l_quantity", "l_extendedprice")
    val out = Analytics.vwap(li).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getAs[Double]("vwap")).toMap
    // supp 1 Jan: 700/40 = 17.5; Feb: 50/5 = 10; supp 2 Jan: 96/8 = 12
    assert(out === Map((1L, "1995-01") -> 17.5, (1L, "1995-02") -> 10.0,
      (2L, "1995-01") -> 12.0))
  }

  test("rolling_median takes the sorted middle (odd) and middle mean (even)") {
    // asset 1 LWW daily: 12, 18, 9 → frames [12]=12, [12,18]=15, [9,12,18]=12
    val out = Analytics.rollingMedian(panel)
      .filter($"asset_id" === 1).select("med").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(12.0, 15.0, 12.0))
  }

  test("interval_join matches the naive BETWEEN join, incl. bucket-boundary pairs") {
    def day(i: Int) = new Timestamp(Date.valueOf("2024-01-01").getTime + i * 86400000L)
    val orders = Seq(
      (1L, 1L, day(0)), (1L, 2L, day(10)), (1L, 3L, day(45)), (1L, 4L, day(70)),
      (2L, 5L, day(10)),                    // singleton: no pairs
      (3L, 6L, day(5)), (3L, 7L, day(5)),   // same-day: excluded (diff 0)
      (4L, 8L, day(29)), (4L, 9L, day(31))) // pair straddles the 30-day bucket edge
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val got = graft.operators.AsOf.intervalJoin(orders, windowDays = 30)
      .select("o_orderkey", "prev_orderkey", "days_between").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet === Set((2L, 1L, 10L), (4L, 3L, 25L), (9L, 8L, 2L)))
    // equivalence with the plain inequality join on the same input
    val naive = orders.as("a").join(orders.as("b"),
        $"a.o_custkey" === $"b.o_custkey" &&
          org.apache.spark.sql.functions.datediff($"a.o_orderdate", $"b.o_orderdate").between(1, 30))
      .select($"a.o_orderkey", $"b.o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(t => (t._1, t._2)).toSet === naive)
  }

  test("atr: first-bar TR is high-low, later bars take the greatest leg") {
    // asset 1 bars: (h12,l10,c12), (18,18,18), (9,9,9)
    // TR: 2.0 | max(0,|18-12|,|18-12|)=6.0 | max(0,9,9)=9.0
    val rows = Analytics.atr(panel).filter($"asset_id" === 1)
      .select("tr", "atr").collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(2.0, 6.0, 9.0))
    assert(rows(0).getDouble(1) === 2.0)          // single-element EW mean = the element
    assert(math.abs(rows(1).getDouble(1) - 110.0 / 27.0) < 1e-6) // horner ratio
  }

  test("stochastic_osc: %K position in channel, %D 3-bar mean, flat channel nulls") {
    val rows = Analytics.stochastic(panel).filter($"asset_id" === 1)
      .select("pct_k", "pct_d").collect()
    // closes 12,18,9 vs channels [10,12],[10,18],[9,18]
    assert(rows.map(_.getDouble(0)).toSeq === Seq(100.0, 100.0, 0.0))
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1))
    assert(math.abs(rows(2).getDouble(1) - 200.0 / 3.0) < 1e-6)
    // single-bar asset: flat channel → NULL %K
    assert(Analytics.stochastic(panel).filter($"asset_id" === 2).collect()(0).isNullAt(3))
  }

  test("obv accumulates signed tick volume per asset") {
    val rows = Analytics.obv(panel).filter($"asset_id" === 1)
      .select("signed_vol", "obv").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // closes 12→18→9, n_ticks 2,1,1: first bar 0, up +1, down -1
    assert(rows.toSeq === Seq((0L, 0L), (1L, 1L), (-1L, 0L)))
  }

  test("williams_r is the inverted %K: 0 at channel high, -100 at channel low") {
    val rows = Analytics.williamsR(panel).filter($"asset_id" === 1)
      .select("wr").collect().map(_.getDouble(0))
    // closes 12,18,9 vs channels [10,12],[10,18],[9,18]
    assert(rows.toSeq === Seq(0.0, 0.0, -100.0))
  }

  test("keltner: first bar's middle is its typical price, bands at ±2 ATR") {
    val r = Analytics.keltner(panel).filter($"asset_id" === 1).collect()(0)
    // bar1: tp = (12+10+12)/3, tr = 2 → mid = tp, atr = 2
    assert(math.abs(r.getAs[Double]("mid") - 34.0 / 3.0) < 1e-6)
    assert(r.getAs[Double]("atr") === 2.0)
    assert(math.abs(r.getAs[Double]("upper") - (34.0 / 3.0 + 4.0)) < 2e-6)
    assert(math.abs(r.getAs[Double]("lower") - (34.0 / 3.0 - 4.0)) < 2e-6)
  }

  test("ts_similarity ranks co-moving assets above anti-correlated ones") {
    // asset 2 tracks asset 1 exactly (corr 1), asset 3 mirrors it (corr -1)
    val vals = Map(1L -> Seq(100.0, 110.0, 99.0, 108.9),
                   2L -> Seq(50.0, 55.0, 49.5, 54.45),
                   3L -> Seq(100.0, 90.0, 99.0, 89.1))
    val p = vals.toSeq.flatMap { case (a, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        (a, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + a.toInt), v, i * 10L + a)
      }
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.tsSimilarityTopK(p, Seq(1L), k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq === Seq((1L, 2L, 1.0), (2L, 3L, -1.0)))
  }

  test("lead_lag finds the planted one-day-delayed follower at best_lag 1") {
    // asset 3 repeats asset 1's return pattern one day later
    def chain(start: Double, rets: Seq[Double]): Seq[Double] =
      rets.scanLeft(start) { case (v, r) => v * (1 + r) }
    val r1 = Seq(0.1, -0.1, 0.1, -0.1, 0.1, -0.1, 0.1)
    val r3 = 0.05 +: r1.dropRight(1) // shifted by one day, decorrelated head
    val p = (chain(100.0, r1).zipWithIndex.map { case (v, i) => (1L, v, i) } ++
      chain(200.0, r3).zipWithIndex.map { case (v, i) => (3L, v, i) })
      .map { case (a, v, i) =>
        (a, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + a.toInt), v, i * 10L + a)
      }.toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.leadLag(p, Seq(1L), maxLag = 2, k = 3).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(2) === 3L)                 // the follower
    assert(r.getLong(3) === 1L)                 // query leads by one day
    assert(r.getDouble(5) === 1.0)              // perfect shifted correlation
  }

  test("bar family matches brute force on a randomized multi-tick panel") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      a <- 1L to 3L; day <- 0 until 25
      tick <- 0 until (1 + rnd.nextInt(3))
    } yield (a, d(f"2024-01-${day + 1}%02d"), ts(day * 1000 + tick * 10 + a.toInt),
      math.rint((50 + rnd.nextDouble() * 50) * 100) / 100, day * 100L + tick * 3 + a)
    val p = rows.toDF("asset_id", "date", "ts", "value", "seq")
    // brute-force daily bars per (asset, date) in knowledge order
    val bars = rows.groupBy(r => (r._1, r._2)).map { case ((a, dt), ticks) =>
      val inOrder = ticks.sortBy(t => (t._3.getTime, t._5))
      (a, dt, inOrder.head._4, inOrder.map(_._4).max, inOrder.map(_._4).min,
        inOrder.last._4, inOrder.length.toLong)
    }.toSeq.sortBy(t => (t._1, t._2.getTime))
    // OBV brute force: integer cumsum of sign(Δclose)·n_ticks
    val expObv = bars.groupBy(_._1).flatMap { case (a, bs) =>
      var run = 0L; var prev = Option.empty[Double]
      bs.map { b =>
        val sv = prev match {
          case Some(pc) if b._6 > pc => b._7
          case Some(pc) if b._6 < pc => -b._7
          case _ => 0L
        }
        run += sv; prev = Some(b._6); (a, b._2.toString) -> run
      }
    }
    val gotObv = Analytics.obv(p).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(4)).toMap
    assert(gotObv === expObv.toMap)
    // ATR brute force: same rounded-TR Horner ratio, identical IEEE order
    val expAtr = bars.groupBy(_._1).flatMap { case (a, bs) =>
      var prev = Option.empty[Double]
      val trs = bs.map { b =>
        val tr = prev match {
          case Some(pc) => math.max(b._4 - b._5, math.max(math.abs(b._4 - pc), math.abs(b._5 - pc)))
          case None => b._4 - b._5
        }
        prev = Some(b._6)
        graft.operators.Micro.jvm6(tr)
      }
      bs.indices.map { i =>
        val frame = trs.slice(math.max(0, i - 13), i + 1)
        var s = 0.0; var nw = 0.0
        frame.foreach { x => s = s * (13.0 / 14.0) + x; nw = nw * (13.0 / 14.0) + 1.0 }
        (a, bs(i)._2.toString) ->
          graft.operators.Micro.jvm6(s / nw)
      }
    }
    val gotAtr = Analytics.atr(p).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(3)).toMap
    assert(gotAtr === expAtr.toMap)
  }

  test("ret_moments: symmetric alternating returns have skew 0, kurtosis -2") {
    // returns exactly ±0.1 alternating: mean 0, m3 0, m4/m2² = 1 → g2 = -2
    val vals = Seq(100.0, 110.0, 99.0, 108.9, 98.01)
    val p = vals.zipWithIndex.map { case (v, i) =>
      (1L, d(f"2024-01-${i + 1}%02d"), ts(i * 100), v, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val r = Analytics.retMoments(p).collect()(0)
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Double]("mean_ret") === 0.0)
    assert(math.abs(r.getAs[Double]("sd") - math.sqrt(0.01 * 4.0 / 3.0)) < 1e-6)
    assert(r.getAs[Double]("skew") === 0.0)
    assert(math.abs(r.getAs[Double]("kurt") - (-2.0)) < 1e-6)
  }

  test("ret_moments: assets with fewer than 4 returns are excluded") {
    assert(Analytics.retMoments(panel).count() === 0) // max 2 returns per asset
  }

  test("momentum_xsec ranks trailing skip/look returns into integer quintiles") {
    val longPanel = (0 until 12).flatMap { i =>
      Seq((1L, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + 10), 100.0 + i, i * 2L),
          (2L, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + 11), 200.0 - i, i * 2L + 1))
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val last = Analytics.momentumXsec(longPanel, skip = 2, look = 10)
      .filter($"date" === d("2024-01-12")).orderBy($"asset_id").collect()
    // asset1: v[t-2]/v[t-10]-1 = 109/101-1 > 0 ; asset2: 191/199-1 < 0
    assert(math.abs(last(0).getAs[Double]("mom") - (109.0 / 101.0 - 1)) < 1e-6)
    assert(last(1).getAs[Double]("mom") < 0)
    // rank 1 of 2 → quintile ((0)*5)div2+1 = 1 ; rank 2 → ((1)*5)div2+1 = 3
    assert(last(0).getAs[Long]("quintile") === 1L)
    assert(last(1).getAs[Long]("quintile") === 3L)
  }

  test("ichimoku: conversion/base are channel midpoints; long-lag spans null early") {
    val rows = Analytics.ichimoku(panel).filter($"asset_id" === 1)
      .orderBy($"date").collect()
    // day2 channel so far: high 18, low 10 → mid 14 (9- and 26-frames agree)
    assert(rows(1).getAs[Double]("conv") === 14.0)
    assert(rows(1).getAs[Double]("base") === 14.0)
    // day3: high 18, low 9 → 13.5
    assert(rows(2).getAs[Double]("conv") === 13.5)
    // 26-bar lags/leads have no data in a 3-day panel
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("span_a"))))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("chikou"))))
  }

  test("pivot_points derive from the previous day's bar; first bar nulls") {
    val rows = Analytics.pivotPoints(panel).filter($"asset_id" === 1)
      .orderBy($"date").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("p")))
    // day2 from day1 bar (H 12, L 10, C 12): P = 34/3, R2/S2 = P ± 2
    val p = rows(1).getAs[Double]("p")
    assert(math.abs(p - 34.0 / 3.0) < 1e-6)
    assert(math.abs(rows(1).getAs[Double]("r1") - (2 * p - 10.0)) < 1e-6)
    assert(math.abs(rows(1).getAs[Double]("s1") - (2 * p - 12.0)) < 1e-6)
    assert(math.abs(rows(1).getAs[Double]("r2") - (p + 2.0)) < 1e-6)
    assert(math.abs(rows(1).getAs[Double]("s2") - (p - 2.0)) < 1e-6)
  }

  test("cci: first bar has sma = tp, zero deviation, null cci") {
    val r = Analytics.cci(panel).filter($"asset_id" === 1).orderBy($"date").collect()(0)
    assert(r.getAs[Double]("sma") === r.getAs[Double]("tp"))
    assert(r.getAs[Double]("mean_dev") === 0.0)
    assert(r.isNullAt(r.fieldIndex("cci")))
  }

  test("cmf: flow is +volume at channel top, 0 on single-tick flat bars") {
    val rows = Analytics.cmf(panel).filter($"asset_id" === 1)
      .orderBy($"date").collect()
    // day1 closes at the bar high (12 in [10,12]) with 2 ticks → mfv 2, cmf 1
    assert(rows(0).getAs[Double]("mfv") === 2.0)
    assert(rows(0).getAs[Double]("cmf") === 1.0)
    // day2 single tick (flat bar) → mfv 0; frame [2, 0] over volume 3
    assert(rows(1).getAs[Double]("mfv") === 0.0)
    assert(math.abs(rows(1).getAs[Double]("cmf") - 0.666667) < 1e-6)
  }

  test("rollup_agg emits detail, subtotal and grand-total grouping levels") {
    val supplier = Seq((1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 20L, 11.0))
      .toDF("s_suppkey", "s_nationkey", "s_acctbal")
    val nation = Seq((10L, "NA", 100L), (20L, "NB", 200L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((100L, "RA"), (200L, "RB")).toDF("r_regionkey", "r_name")
    val out = Analytics.rollupAgg(supplier, nation, region).collect()
    val byGid = out.groupBy(_.getAs[Long]("gid"))
    assert(byGid(0L).length === 2 && byGid(1L).length === 2 && byGid(3L).length === 1)
    val grand = byGid(3L).head
    assert(grand.getAs[Long]("n_suppliers") === 3L)
    assert(grand.getAs[Double]("total_acctbal") === 23.0)
    val subRA = byGid(1L).find(_.getAs[String]("r_name") == "RA").get
    assert(subRA.getAs[Long]("n_suppliers") === 2L && subRA.isNullAt(subRA.fieldIndex("n_name")))
  }

  test("pairs_spread recovers an exact linear relation: beta, zero spread, null z") {
    // asset 7 = 2·(asset 8) + 1 exactly → OLS beta 2, alpha 1, spread ≡ 0
    val pb = Seq(10.0, 11.0, 13.0, 12.0)
    val p = pb.zipWithIndex.flatMap { case (v, i) =>
      Seq((7L, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + 10), 2 * v + 1, i * 2L),
          (8L, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + 11), v, i * 2L + 1))
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val rows = Analytics.pairsSpread(p, Seq((7L, 8L))).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Double]("beta") === 2.0)
      assert(r.getAs[Double]("spread") === 0.0)
      assert(r.isNullAt(r.fieldIndex("z"))) // sd = 0 on a perfect fit
    }
  }

  test("event_study aligns abnormal returns on event offsets and accumulates CAR") {
    val p = Seq(
      (1L, d("2024-01-01"), ts(110), 100.0, 1L),
      (1L, d("2024-01-02"), ts(210), 110.0, 2L),
      (1L, d("2024-01-03"), ts(310), 121.0, 3L),
      (2L, d("2024-01-01"), ts(111), 100.0, 4L),
      (2L, d("2024-01-02"), ts(211), 100.0, 5L),
      (2L, d("2024-01-03"), ts(311), 100.0, 6L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val ev = Seq((1L, Timestamp.valueOf("2024-01-02 10:00:00"), "purchase"),
                 (2L, Timestamp.valueOf("2024-01-02 11:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = Analytics.eventStudy(p, ev).collect()
      .map(r => r.getAs[Long]("offset") ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("mean_ab"), r.getAs[Double]("car"))).toMap
    // asset1 rets 0.1/0.1, asset2 0/0 → mkt 0.05 → ab(asset1) = +0.05
    assert(out.keySet === Set(0L, 1L)) // only the purchase event counts
    assert(out(0L) === ((1L, 0.05, 0.05)))
    assert(out(1L) === ((1L, 0.05, 0.1)))
  }

  test("cohort_retention anchors week offsets to each user's first day") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-09 10:00:00")), // week 0 → offset 1
      (2L, t("2024-01-02 10:00:00")),                                  // same cohort week, inactive later
      (3L, t("2024-01-10 10:00:00")), (3L, t("2024-01-12 10:00:00")))  // later cohort, offset 0 twice
      .toDF("user_id", "ts").withColumn("event_type", org.apache.spark.sql.functions.lit("e"))
    val out = Analytics.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"), r.getAs[Long]("retention_pm"))).toMap
    val w1 = 19723 / 7 // epoch week of 2024-01-01
    assert(out((w1, 0L)) === ((2L, 2L, 1000L))) // both users active in their week 0
    assert(out((w1, 1L)) === ((1L, 2L, 500L)))  // only user 1 returns in week 1
    val w2 = 19732 / 7 // epoch week of 2024-01-10
    assert(out((w2, 0L)) === ((1L, 1L, 1000L)))
  }

  test("active_users: WAU is the trailing-7-day distinct union of DAU sets") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")),
      (2L, t("2024-01-01 11:00:00")),
      (1L, t("2024-01-05 10:00:00")),
      (3L, t("2024-01-05 11:00:00")))
      .toDF("user_id", "ts").withColumn("event_type", org.apache.spark.sql.functions.lit("e"))
    val out = Analytics.activeUsers(ev).collect()
      .map(r => r.getDate(0).toString -> (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Long]("stickiness_pm"))).toMap
    assert(out("2024-01-01") === ((2L, 2L, 1000L)))
    // Jan 5 window [Dec 30..Jan 5] covers users {1,2} from Jan 1 plus {1,3}
    assert(out("2024-01-05") === ((2L, 3L, 666L)))
  }

  test("quintile_churn is zero when cross-sectional ranks are stable") {
    val longPanel = (0 until 12).flatMap { i =>
      Seq((1L, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + 10), 100.0 + i, i * 2L),
          (2L, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + 11), 200.0 - i, i * 2L + 1))
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.quintileChurn(longPanel, skip = 2, look = 10).collect()
    // ranked dates are day 11/12; only day 12 has a previous rank
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_assets") === 2L)
    assert(out(0).getAs[Long]("n_changed") === 0L)
    assert(out(0).getAs[Long]("churn_pm") === 0L)
  }

  test("cube_agg emits all four grouping levels of the 2-dim lattice") {
    val orders = Seq(
      ("F", "1-URGENT", 10.0), ("F", "2-HIGH", 20.0),
      ("O", "1-URGENT", 40.0))
      .toDF("o_orderstatus", "o_orderpriority", "o_totalprice")
    val out = Analytics.cubeAgg(orders).collect()
      .map(r => (r.getAs[Long]("gid"),
        Option(r.getAs[String]("o_orderstatus")).getOrElse("·"),
        Option(r.getAs[String]("o_orderpriority")).getOrElse("·")) ->
        (r.getAs[Long]("n_orders"), r.getAs[Double]("total_price"))).toMap
    assert(out((0L, "F", "1-URGENT")) === ((1L, 10.0)))   // detail
    assert(out((1L, "F", "·")) === ((2L, 30.0)))          // status marginal
    assert(out((2L, "·", "1-URGENT")) === ((2L, 50.0)))   // priority marginal
    assert(out((3L, "·", "·")) === ((3L, 70.0)))          // grand total
    assert(out.size === 8)
  }

  test("pivot_wide: fixed-type crosstab counts, exact sums, 0/null empties") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "click", 1.5, t("2024-01-01 10:00:00")),
      (1L, "click", 2.5, t("2024-01-01 11:00:00")),
      (1L, "purchase", 10.0, t("2024-01-01 12:00:00")),
      (2L, "view", 0.5, t("2024-01-01 13:00:00")))
      .toDF("user_id", "event_type", "value", "ts")
    val out = Analytics.pivotWide(ev).collect()
    val u1 = out.find(_.getLong(0) == 1L).get
    assert(u1.getAs[Long]("click_n") === 2L)
    assert(u1.getAs[Double]("click_val") === 4.0)
    assert(u1.getAs[Long]("purchase_n") === 1L)
    assert(u1.getAs[Long]("view_n") === 0L)          // absent combo: count 0
    assert(u1.isNullAt(u1.fieldIndex("view_val")))   // absent combo: sum NULL
  }

  test("streaks: island arithmetic over up/down runs") {
    // asset 1 daily closes: 10 11 12 9 10 8 → rets + + − + −
    // islands: {11,12} len 2, {10} len 1 → longest 2, up-days 3, 2 streaks
    val p = (0 until 6).zip(Seq(10.0, 11.0, 12.0, 9.0, 10.0, 8.0)).map {
      case (i, v) => (1L, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + 10), v, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.streaks(p).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_streaks") === 2L)
    assert(out(0).getAs[Long]("n_up_days") === 3L)
    assert(out(0).getAs[Long]("longest_streak") === 2L)
  }

  test("streaks: an asset with no up days emits no row") {
    val p = Seq(
      (1L, d("2024-01-01"), ts(110), 10.0, 1L),
      (1L, d("2024-01-02"), ts(210), 9.0, 2L),
      (1L, d("2024-01-03"), ts(310), 8.0, 3L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    assert(Analytics.streaks(p).count() === 0L)
  }

  test("anomaly_mad flags only the point far outside the robust band") {
    // 9 values near 100 plus one at 500: median ≈ 100, MAD small, the
    // spike scores thousands of robust z-units; the cluster scores ≲ 2.
    val vals = Seq(99.0, 100.0, 101.0, 100.5, 99.5, 100.2, 99.8, 100.1, 99.9, 500.0)
    val p = vals.zipWithIndex.map { case (v, i) =>
      (1L, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + 10), v, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.anomalyMad(p).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Double]("value") === 500.0)
    assert(math.abs(out(0).getAs[Double]("score")) > 100)
  }

  test("event_transitions counts ordered pairs per user with per-prev prob") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (1L, t("2024-01-01 10:01:00"), 2L, "click"),
      (1L, t("2024-01-01 10:02:00"), 3L, "click"),
      (2L, t("2024-01-01 10:00:00"), 4L, "view"),
      (2L, t("2024-01-01 10:01:00"), 5L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Analytics.eventTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_prev"), r.getAs[Long]("prob_pm"))).toMap
    assert(out(("view", "click")) === ((1L, 2L, 500L)))
    assert(out(("view", "purchase")) === ((1L, 2L, 500L)))
    assert(out(("click", "click")) === ((1L, 1L, 1000L)))
    assert(out.size === 3) // cross-user boundary pairs never counted
  }

  test("anomaly_mad: constant series (MAD 0) flags nothing") {
    val p = (0 until 5).map { i =>
      (1L, d(f"2024-01-${i + 1}%02d"), ts(i * 100 + 10), 42.0, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    assert(Analytics.anomalyMad(p).count() === 0L)
  }
}
