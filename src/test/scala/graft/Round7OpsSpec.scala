package graft

import java.sql.{Date, Timestamp}

import graft.operators.Analytics

/** Hand-computed fixtures for the round-7 bar/return additions
  * (B95-B103): aroon, mfi, elder_ray, force_index, vortex,
  * chaikin_osc, kelly_fraction, tail_ratio, rolling_sharpe.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(i * 1000L)
  private def d(s: String) = Date.valueOf(s)

  /** One tick per day from a value sequence (high=low=close=value). */
  private def oneTickPanel(values: Seq[Double], asset: Long = 1L) =
    values.zipWithIndex.map { case (v, i) =>
      (asset, d(f"2024-01-${i + 1}%02d"), ts(i + 1), v, asset * 100 + i)
    }.toDF("asset_id", "date", "ts", "value", "seq")

  /** Two ticks per day: (low, high) per date, close = the later = high. */
  private def twoTickPanel(bars: Seq[(Double, Double)]) =
    bars.zipWithIndex.flatMap { case ((lo, hi), i) =>
      Seq((1L, d(f"2024-01-${i + 1}%02d"), ts(2 * i + 1), lo, 2L * i),
        (1L, d(f"2024-01-${i + 1}%02d"), ts(2 * i + 2), hi, 2L * i + 1))
    }.toDF("asset_id", "date", "ts", "value", "seq")

  test("aroon: monotone rally pins up at 100 and walks down by 4 per day") {
    val out = Analytics.aroon(oneTickPanel((1 to 10).map(_.toDouble))).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("d_hi") === 0L)                    // today is the high
      assert(r.getAs[Double]("aroon_up") === 100.0)
    }
    // lowest low is the frame's oldest bar: day i (1-based) has d_lo = i−1
    val day6 = out.find(_.getDate(1).toString == "2024-01-06").get
    assert(day6.getAs[Long]("d_lo") === 5L)
    assert(day6.getAs[Double]("aroon_dn") === 80.0)           // 100·(25−5)/25
  }

  test("aroon: tie on the extreme resolves to the most recent bar") {
    // values 5,9,9: both day-2 and day-3 share the high → d_hi = 0 on day 3
    val out = Analytics.aroon(oneTickPanel(Seq(5.0, 9.0, 9.0))).collect()
    val day3 = out.find(_.getDate(1).toString == "2024-01-03").get
    assert(day3.getAs[Long]("d_hi") === 0L)
  }

  test("mfi: all-rising typical price gives MFI 100 after the first bar") {
    val out = Analytics.mfi(oneTickPanel((1 to 8).map(_ * 10.0))).collect()
    val first = out.find(_.getDate(1).toString == "2024-01-01").get
    assert(first.getAs[Any]("mfi") == null)                   // 0/0 flows
    out.filter(_.getDate(1).toString != "2024-01-01").foreach { r =>
      assert(r.getAs[Double]("mfi") === 100.0)
    }
  }

  test("elder_ray: flat series has zero bull and bear power") {
    val out = Analytics.elderRay(oneTickPanel(Seq.fill(6)(42.0))).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("ema") === 42.0)
      assert(r.getAs[Double]("bull_power") === 0.0)
      assert(r.getAs[Double]("bear_power") === 0.0)
    }
  }

  test("force_index: +1/day at one tick per day smooths to exactly 1") {
    val out = Analytics.forceIndex(oneTickPanel((1 to 7).map(_.toDouble))).collect()
    assert(out.length === 6)                                  // first bar dropped
    out.foreach { r =>
      assert(r.getAs[Double]("fi") === 1.0)
      assert(r.getAs[Double]("fi_ema") === 1.0)               // EW mean of constant
    }
  }

  test("vortex: constant-geometry bars give VI+ 1.2 and VI- 0.8") {
    // bars (low, high) = (10i, 10i+2), close = high: vm+ = 12, vm- = 8,
    // tr = |high − prevClose| = 10 every bar → ratios constant
    val out = Analytics.vortex(twoTickPanel((1 to 6).map(i => (10.0 * i, 10.0 * i + 2)))).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Double]("vi_plus") === 1.2)
      assert(r.getAs[Double]("vi_minus") === 0.8)
    }
  }

  test("chaikin_osc: close-at-high accumulates volume and trends positive") {
    // close = high every bar → CLV = 1 → AD = cumulative tick count (2/day)
    val out = Analytics.chaikinOsc(twoTickPanel((1 to 8).map(i => (10.0 * i, 10.0 * i + 2))))
      .collect().sortBy(_.getDate(1).toString)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("ad") === 2.0 * (i + 1))
    }
    assert(out.head.getAs[Double]("chaikin") === 0.0)         // single-element EMAs
    out.tail.foreach(r => assert(r.getAs[Double]("chaikin") > 0.0)) // short EMA leads on a rising line
  }

  test("kelly_fraction: two-return fixture matches the closed form") {
    // rets 0.1, −0.05: mean .025, sample var (2·.0125 − .0025)/2 = .01125,
    // kelly = .025/.01125 = 2.2222…
    val out = Analytics.kellyFraction(oneTickPanel(Seq(100.0, 110.0, 104.5))).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_days") === 2L)
    assert(math.abs(out.head.getAs[Double]("mean_ret") - 0.025) < 1e-9)
    assert(math.abs(out.head.getAs[Double]("kelly") - 2.222222) < 1e-6)
  }

  test("kelly_fraction: zero variance yields NULL kelly") {
    // constant +10% return each day → variance 0
    val out = Analytics.kellyFraction(oneTickPanel(Seq(100.0, 110.0, 121.0))).collect()
    assert(out.head.getAs[Any]("kelly") == null)
  }

  test("tail_ratio: k=1 cut is best/|worst| return") {
    // 20 returns → k = 1; best +0.2, worst −0.1 → ratio 2
    val rets = Seq(0.2, -0.1) ++ Seq.fill(18)(0.01)
    val values = rets.scanLeft(100.0) { case (v, r) => v * (1 + r) }
    val out = Analytics.tailRatio(oneTickPanel(values)).collect()
    assert(out.head.getAs[Long]("n_tail") === 1L)
    assert(math.abs(out.head.getAs[Double]("lo") - -0.1) < 1e-6)
    assert(math.abs(out.head.getAs[Double]("hi") - 0.2) < 1e-6)
    assert(math.abs(out.head.getAs[Double]("tail_ratio") - 2.0) < 1e-5)
  }

  test("tail_ratio: non-negative worst return yields NULL ratio") {
    val values = Seq.fill(5)(0.05).scanLeft(100.0) { case (v, r) => v * (1 + r) }
    val out = Analytics.tailRatio(oneTickPanel(values)).collect()
    assert(out.head.getAs[Any]("tail_ratio") == null)
  }

  test("rolling_sharpe: constant dyadic returns have exactly zero vol hence NULL") {
    // ret = 0.5 exactly each day: the variance folds cancel to a true 0
    // (dyadic values — no FP epsilon), so the sd==0 guard must fire
    val values = Seq.fill(6)(0.5).scanLeft(128.0) { case (v, r) => v * (1 + r) }
    val out = Analytics.rollingSharpe(oneTickPanel(values)).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Any]("roll_sharpe") == null))
  }

  test("rogers_satchell: constant bar geometry gives vol sqrt(x) exactly") {
    // ticks [12, 10, 20] per day: o=12 l=10 h=20 c=20 — same x every bar
    val rows = (1 to 6).flatMap { i =>
      Seq((1L, d(f"2024-01-$i%02d"), ts(3 * i), 12.0, 3L * i),
        (1L, d(f"2024-01-$i%02d"), ts(3 * i + 1), 10.0, 3L * i + 1),
        (1L, d(f"2024-01-$i%02d"), ts(3 * i + 2), 20.0, 3L * i + 2))
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.rogersSatchell(rows).collect()
    val x = out.head.getAs[Double]("x")
    val want = math.log(20.0 / 20.0) * math.log(20.0 / 12.0) +
      math.log(10.0 / 20.0) * math.log(10.0 / 12.0)
    assert(math.abs(x - math.floor(want * 1e6 + 0.5) / 1e6) < 1e-12)
    assert(x > 0)
    out.foreach { r =>      // mean of a constant series is the constant
      assert(r.getAs[Double]("rs_vol") === math.floor(math.sqrt(x) * 1e6 + 0.5) / 1e6)
    }
  }

  test("trix: constant close smooths to the constant with zero momentum") {
    val out = Analytics.trix(oneTickPanel(Seq.fill(8)(42.0))).collect()
      .sortBy(_.getDate(1).toString)
    out.foreach(r => assert(r.getAs[Double]("e3") === 42.0))
    assert(out.head.getAs[Any]("trix") == null)               // no prior e3
    out.tail.foreach(r => assert(r.getAs[Double]("trix") === 0.0))
  }

  test("dpo: flat series detrends to zero once the shifted close exists") {
    val out = Analytics.dpo(oneTickPanel(Seq.fill(14)(17.0))).collect()
      .sortBy(_.getDate(1).toString)
    out.take(11).foreach(r => assert(r.getAs[Any]("dpo") == null)) // lag(11) missing
    out.drop(11).foreach { r =>
      assert(r.getAs[Double]("sma") === 17.0)
      assert(r.getAs[Double]("dpo") === 0.0)
    }
  }

  test("coppock: flat series yields zero momentum from bar 15 on") {
    val out = Analytics.coppock(oneTickPanel(Seq.fill(18)(9.0))).collect()
    assert(out.length === 4)                                  // bars 15-18 have both ROCs
    out.foreach { r =>
      assert(r.getAs[Double]("rc") === 0.0)
      assert(r.getAs[Double]("coppock") === 0.0)
    }
  }

  test("corwin_schultz: identical consecutive bars match the closed form") {
    // every bar (low 10, high 20): x = px = ln 2, envelope = the bar itself
    val out = Analytics.corwinSchultz(twoTickPanel(Seq.fill(5)((10.0, 20.0)))).collect()
    assert(out.length === 4)
    val x = math.floor(math.log(2.0) * 1e6 + 0.5) / 1e6
    val beta = math.floor((x * x + x * x) * 1e6 + 0.5) / 1e6
    val gamma = math.floor(math.log(2.0) * math.log(2.0) * 1e6 + 0.5) / 1e6
    val den = 3.0 - 2.0 * math.sqrt(2.0)
    val alpha = math.floor(((math.sqrt(2.0 * beta) - math.sqrt(beta)) / den -
      math.sqrt(gamma / den)) * 1e6 + 0.5) / 1e6
    val spread = math.floor(2.0 * (math.exp(alpha) - 1) / (1.0 + math.exp(alpha)) * 1e6 + 0.5) / 1e6
    out.foreach { r =>
      assert(r.getAs[Double]("beta") === beta)
      assert(r.getAs[Double]("gamma") === gamma)
      assert(r.getAs[Double]("spread") === spread)
      assert(r.getAs[Double]("spread_pos") === math.max(spread, 0.0))
    }
  }

  test("vol_cone: zero-vol dyadic series collapses every quantile to zero") {
    val values = Seq.fill(30)(0.5).scanLeft(64.0) { case (v, r) => v * (1 + r) }
    val out = Analytics.volCone(oneTickPanel(values)).collect()
    assert(out.map(_.getAs[Long]("horizon")).toSeq === Seq(5L, 10L, 21L))
    out.foreach { r =>
      assert(r.getAs[Double]("v_min") === 0.0)
      assert(r.getAs[Double]("p50") === 0.0)
      assert(r.getAs[Double]("v_max") === 0.0)
      assert(r.getAs[Long]("n_obs") > 0L)
    }
  }

  test("vol_cone: quantiles are ordered on a mixed-vol panel") {
    val rets = Seq(0.1, -0.05, 0.2, -0.15, 0.08, -0.02, 0.3, -0.25, 0.12, -0.07,
      0.05, 0.18, -0.12, 0.09, -0.2, 0.15, -0.04, 0.22, -0.17, 0.06)
    val values = rets.scanLeft(100.0) { case (v, r) => v * (1 + r) }
    val out = Analytics.volCone(oneTickPanel(values)).collect()
    out.foreach { r =>
      val (mn, p25, p50, p75, mx) = (r.getAs[Double]("v_min"), r.getAs[Double]("p25"),
        r.getAs[Double]("p50"), r.getAs[Double]("p75"), r.getAs[Double]("v_max"))
      assert(mn <= p25 && p25 <= p50 && p50 <= p75 && p75 <= mx, r.toString)
    }
  }

  test("adx: a pure uptrend pins +DI, DX and ADX at 100 with -DI at 0") {
    // rising 1/day, one tick: up = 1, dn = -1, tr = |high - pc| = 1
    val out = Analytics.adx(oneTickPanel((1 to 10).map(_.toDouble))).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("di_plus") === 100.0)
      assert(r.getAs[Double]("di_minus") === 0.0)
      assert(r.getAs[Double]("dx") === 100.0)
      assert(r.getAs[Double]("adx") === 100.0)
    }
  }

  test("mass_index: constant bar range sums unit ratios") {
    // every bar low 10·i, high 10·i + 2: r = 2 → e1 = e2 → ratio = 1
    val out = Analytics.massIndex(twoTickPanel((1 to 6).map(i => (10.0 * i, 10.0 * i + 2))))
      .collect().sortBy(_.getDate(1).toString)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("ratio") === 1.0)
      assert(r.getAs[Double]("mass") === (i + 1).toDouble)    // 25-frame not yet full
    }
  }

  test("mass_index: flat bars carry zero mass under the ratio-0 convention") {
    val out = Analytics.massIndex(oneTickPanel(Seq.fill(5)(42.0))).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("ratio") === 0.0)
      assert(r.getAs[Double]("mass") === 0.0)
    }
  }

  test("yang_zhang: a flat series has zero vol in every component") {
    val out = Analytics.yangZhang(oneTickPanel(Seq.fill(8)(50.0))).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("o_ret") === 0.0)
      assert(r.getAs[Double]("c_ret") === 0.0)
      assert(r.getAs[Double]("yz_vol") === 0.0)
    }
  }

  test("awesome_osc: flat midpoints cancel; a rally keeps the fast mean ahead") {
    Analytics.awesomeOsc(oneTickPanel(Seq.fill(6)(25.0))).collect()
      .foreach(r => assert(r.getAs[Double]("ao") === 0.0))
    val rising = Analytics.awesomeOsc(oneTickPanel((1 to 10).map(_ * 2.0))).collect()
      .sortBy(_.getDate(1).toString)
    // frames only differentiate once the fast window is full and the
    // slow one still carries older (lower) values
    rising.drop(5).foreach(r => assert(r.getAs[Double]("ao") > 0.0, r.toString))
  }

  test("chandelier_exit: zero-range bars collapse both stops onto the channel") {
    val out = Analytics.chandelierExit(oneTickPanel(Seq(10.0, 12.0, 11.0, 14.0))).collect()
      .sortBy(_.getDate(1).toString)
    out.foreach { r =>
      assert(r.getAs[Double]("atr") >= 0.0)
    }
    // single-tick bars: TR = |close − prev close| moves the ATR, but the
    // very first bar (TR = high − low = 0) pins stops to the bar value
    assert(out.head.getAs[Double]("long_exit") === 10.0)
    assert(out.head.getAs[Double]("short_exit") === 10.0)
  }

  test("stoch_rsi: an uninterrupted rally saturates RSI and nulls the channel") {
    val values = Seq.fill(8)(0.1).scanLeft(100.0) { case (v, r) => v * (1 + r) }
    val out = Analytics.stochRsi(oneTickPanel(values)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("rsi") === 100.0)                 // all gains
      assert(r.getAs[Any]("stoch_rsi") == null)                // flat channel
    }
  }

  test("pvo: constant volume gives a zero oscillator") {
    val out = Analytics.pvo(twoTickPanel((1 to 6).map(i => (10.0 * i, 10.0 * i + 2)))).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("e_fast") === 2.0)
      assert(r.getAs[Double]("e_slow") === 2.0)
      assert(r.getAs[Double]("pvo") === 0.0)
    }
  }

  test("tsi: uninterrupted +1 momentum saturates at 100") {
    val out = Analytics.tsi(oneTickPanel((1 to 10).map(_.toDouble))).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("mom") === 1.0)
      assert(r.getAs[Double]("tsi") === 100.0)                 // e2 == a2 when mom ≥ 0
    }
  }

  test("choppiness: a straight trend scores low; flat channels null out") {
    val out = Analytics.choppiness(oneTickPanel((1 to 20).map(_.toDouble))).collect()
      .sortBy(_.getDate(1).toString)
    // full 14-bar frame: ΣTR = 14 (first TR 0 rolls out), range 13
    val last = out.last
    val want = math.floor(100.0 * math.log(14.0 / 13.0) / math.log(14.0) * 1e6 + 0.5) / 1e6
    assert(last.getAs[Double]("chop") === want)
    assert(last.getAs[Double]("chop") < 10.0)                  // trending = low chop
    val flat = Analytics.choppiness(oneTickPanel(Seq.fill(5)(7.0))).collect()
    flat.foreach(r => assert(r.getAs[Any]("chop") == null))    // hh == ll
  }

  test("eom: flat midpoints move nowhere") {
    val out = Analytics.eom(twoTickPanel(Seq.fill(5)((10.0, 12.0)))).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getAs[Double]("eom_raw") === 0.0)
      assert(r.getAs[Double]("eom") === 0.0)
    }
  }

  test("elder_impulse: early rally bars are green; labels never escape the palette") {
    val out = Analytics.elderImpulse(oneTickPanel((1 to 12).map(_ * 3.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.head.getAs[Any]("impulse") == null)             // no prior ema/hist
    assert(out(1).getAs[String]("impulse") === "green")        // ema and hist both rising
    out.tail.foreach(r =>
      assert(Set("green", "red", "blue")(r.getAs[String]("impulse")), r.toString))
  }

  test("rolling_sharpe: matches the direct mean/sd of the window") {
    val rets = Seq(0.1, -0.05, 0.2, -0.1, 0.15)
    val values = rets.scanLeft(100.0) { case (v, r) => v * (1 + r) }
    val out = Analytics.rollingSharpe(oneTickPanel(values)).collect()
      .sortBy(_.getDate(1).toString)
    val last = out.last.getAs[Double]("roll_sharpe")
    val r6 = rets.map(r => math.floor(r * 1e6 + 0.5) / 1e6)
    val n = r6.length
    val mean = r6.sum / n
    val sd = math.sqrt((n * r6.map(x => x * x).sum - r6.sum * r6.sum) / (n.toDouble * (n - 1)))
    val want = math.floor(mean / sd * 1e6 + 0.5) / 1e6
    assert(math.abs(last - want) < 1e-6, s"got $last want $want")
  }

  test("ad_line: close-at-high bars accumulate their full tick volume") {
    // two ticks per day, close = high → MFM = 1 → MFV = n_ticks = 2
    val out = Analytics.adLine(twoTickPanel(Seq((1.0, 2.0), (2.0, 3.0), (3.0, 4.0))))
      .collect().sortBy(_.getDate(1).toString)
    assert(out.map(_.getAs[Double]("mfv")).toSeq === Seq(2.0, 2.0, 2.0))
    assert(out.map(_.getAs[Double]("ad")).toSeq === Seq(2.0, 4.0, 6.0))
  }

  test("ad_line: flat bars contribute zero flow") {
    val out = Analytics.adLine(oneTickPanel(Seq(5.0, 6.0, 7.0))).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("mfv") === 0.0)
      assert(r.getAs[Double]("ad") === 0.0)
    }
  }

  test("ultimate_osc: a steady one-unit climb pins UO at 100") {
    // bp = close − prevClose = 1 = tr on every bar → every average is 1
    val out = Analytics.ultimateOsc(oneTickPanel((1 to 10).map(_.toDouble))).collect()
    assert(out.length === 9)                                   // first bar dropped
    out.foreach { r =>
      assert(r.getAs[Double]("a_fast") === 1.0)
      assert(r.getAs[Double]("uo") === 100.0)
    }
  }

  test("runs_test: perfect alternation maximizes runs with z > 0") {
    // rets: +1, −0.5, +1, −0.5 → 4 runs of n1=2, n2=2
    val out = Analytics.runsTest(oneTickPanel(Seq(1.0, 2.0, 1.0, 2.0, 1.0))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_pos") === 2L && r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Long]("runs") === 4L)
    assert(r.getAs[Double]("e_runs") === 3.0)                  // 1 + 2·2·2/4
    // z = (4−3)/sqrt(8·4/(16·3)) = sqrt(1.5) ≈ 1.224745
    assert(math.abs(r.getAs[Double]("z") - 1.224745) < 1e-6)
  }

  test("kendall_tau: an asset that IS the market is perfectly concordant") {
    // two identical assets → market = each asset; distinct daily rets → no ties
    val values = Seq(1.0, 1.2, 1.1, 1.5, 1.4)
    val panel = oneTickPanel(values, asset = 1L)
      .union(oneTickPanel(values, asset = 2L))
    val out = Analytics.kendallTau(panel).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n0") === 6L)                       // C(4,2) day pairs
      assert(r.getAs[Long]("discordant") === 0L)
      assert(r.getAs[Double]("tau") === 1.0)
    }
  }

  test("hill_tail: alpha replays 1/mean(ln(loss_i/loss_6)) on the u6 return grid") {
    // 7 distinct losses from an up/down zig-zag: up resets the level,
    // each down leg is a distinct percentage drop
    val drops = Seq(0.30, 0.25, 0.20, 0.15, 0.12, 0.10, 0.05)
    val values = drops.foldLeft(Vector(100.0)) { case (acc, d) =>
      acc :+ acc.last * 2 :+ acc.last * 2 * (1 - d)
    }
    val out = Analytics.hillTail(oneTickPanel(values)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_loss") === 7L)
    def u6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // replay: daily u6 returns → losses sorted desc → ln terms vs the 6th
    val losses = drops.map(d => u6d((1 - d) - 1)).map(-_).sorted.reverse
    val xk = losses(5)
    assert(r.getAs[Double]("tail_cut") === u6d(xk))
    val h = losses.take(5).map(l => u6d(math.log(l / xk))).sum / 5.0
    assert(math.abs(r.getAs[Double]("alpha") - 1.0 / h) < 1e-5)
  }

  test("cornish_fisher: symmetric returns have zero skew and kex −2") {
    // rets alternate +0.1 / −0.1 exactly on the u6 grid
    val values = Seq(1.0, 1.1, 0.99, 1.089, 0.9801)
    val out = Analytics.cornishFisher(oneTickPanel(values)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("skew") === 0.0)
    assert(r.getAs[Double]("kurt_excess") === -2.0)            // two-point distribution
    // symmetric + zero skew → CF shift is only the kurtosis term;
    // replay Spark's exact op order (fold → m2 → sd) for the check
    val r6 = Seq(0.1, -0.1, 0.1, -0.1)
    val s2 = r6.map(x => x * x).foldLeft(0.0)(_ + _)
    val m2 = s2 / 4.0
    val sd = math.sqrt(math.max(m2 * (4.0 / 3.0), 0.0))
    val m4 = r6.map(x => x * x * x * x).foldLeft(0.0)(_ + _) / 4.0  // m = 0 exactly
    val zcf = Analytics.CfConst.z + Analytics.CfConst.c2 * (m4 / (m2 * m2) - 3)
    assert(math.abs(r.getAs[Double]("var_cf") - math.floor(-(sd * zcf) * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("m2_ratio: when every asset is the market, M² is sharpe × market σ") {
    val values = Seq(1.0, 1.2, 1.1, 1.5, 1.4)
    val panel = oneTickPanel(values, asset = 1L)
      .union(oneTickPanel(values, asset = 2L))
    val out = Analytics.m2Ratio(panel).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("m2") -
        r.getAs[Double]("sharpe") * r.getAs[Double]("mkt_sd")) < 2e-6)
    }
  }

  test("vpin: one-sided flow saturates at 1, mixed flow averages down") {
    // day 1: two upticks after the seed → oi = 1; day 2: zero-tick
    // inherits buy, then two downticks → oi = |1−2|/3 = 1/3
    val rows = Seq(
      (1, "2024-01-01", 10.0), (2, "2024-01-01", 11.0), (3, "2024-01-01", 12.0),
      (4, "2024-01-02", 12.0), (5, "2024-01-02", 11.0), (6, "2024-01-02", 10.0))
      .map { case (t, d, v) =>
        (1L, java.sql.Date.valueOf(d), new java.sql.Timestamp(t * 1000L), v, t.toLong)
      }.toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.vpin(rows).collect().sortBy(_.getDate(1).toString)
    assert(out.head.getAs[Double]("oi") === 1.0)
    assert(out.head.getAs[Double]("vpin") === 1.0)
    val d2 = out.last
    assert(d2.getAs[Long]("buy_ticks") === 1L && d2.getAs[Long]("sell_ticks") === 2L)
    val oi2 = math.floor(1.0 / 3.0 * 1e6 + 0.5) / 1e6
    assert(d2.getAs[Double]("oi") === oi2)
    assert(math.abs(d2.getAs[Double]("vpin") - math.floor((1.0 + oi2) / 2.0 * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("sterling_ratio: single-episode series replays mean_ret over |depth|") {
    val values = Seq(100.0, 110.0, 99.0, 105.0, 121.0)
    val out = Analytics.sterlingRatio(oneTickPanel(values)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_episodes") === 1L)                 // days 3-4 underwater
    def u6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // episode depth = min(dd) = 99/110 − 1 rounded
    val depth = u6d(99.0 / 110.0 - 1)
    assert(r.getAs[Double]("avg_dd") === u6d(-depth))
    val rets = Seq(110.0 / 100, 99.0 / 110, 105.0 / 99, 121.0 / 105).map(x => u6d(x - 1))
    val mean = rets.foldLeft(0.0)(_ + _) / 4.0
    assert(math.abs(r.getAs[Double]("sterling") - u6d(mean / -depth)) < 1e-9)
  }

  test("gain_loss_ratio: symmetric wins and losses give ratio 1") {
    // rets: +0.1, −0.1, +0.1 on the u6 grid
    val out = Analytics.gainLossRatio(oneTickPanel(Seq(1.0, 1.1, 0.99, 1.089))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_wins") === 2L && r.getAs[Long]("n_losses") === 1L)
    assert(r.getAs[Long]("win_pm") === 666L)                   // 2000 div 3
    assert(r.getAs[Double]("avg_gain") === 0.1)
    assert(r.getAs[Double]("avg_loss") === 0.1)
    assert(r.getAs[Double]("gl_ratio") === 1.0)
  }

  test("xsec_ic: replays the cross-sectional Pearson on the u6 grid") {
    // three assets with constant daily returns −5% / +2% / +10%
    def series(r: Double) = (0 until 9).map(i => 100.0 * math.pow(1 + r, i))
    val panel = oneTickPanel(series(-0.05), asset = 1L)
      .union(oneTickPanel(series(0.02), asset = 2L))
      .union(oneTickPanel(series(0.10), asset = 3L))
    val out = Analytics.xsecIc(panel).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("n_assets") === 3L))
    def u6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // replay: sig = 5-day trailing ret through yesterday, out = today's ret
    val rates = Seq(-0.05, 0.02, 0.10)
    // the u6 grid snaps each asset's constant daily return once per day;
    // replay the snap per (asset, day) then check every emitted date
    out.foreach { row =>
      val day = row.getDate(0).toString.takeRight(2).toInt    // 2024-01-dd
      val ya = rates.zipWithIndex.map { case (r, i) =>
        val v = series(r)
        u6d(v(day - 1) / v(day - 2) - 1)
      }
      val xs = rates.indices.map { i =>
        val v = series(rates(i))
        u6d(v(day - 2) / v(day - 7) - 1)
      }
      val n = 3.0
      val sx = xs.foldLeft(0.0)(_ + _); val sy = ya.foldLeft(0.0)(_ + _)
      val sxy = xs.zip(ya).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
      val sx2 = xs.foldLeft(0.0)((a, x) => a + x * x)
      val sy2 = ya.foldLeft(0.0)((a, y) => a + y * y)
      val den = math.sqrt(math.max(n * sx2 - sx * sx, 0.0)) *
        math.sqrt(math.max(n * sy2 - sy * sy, 0.0))
      val want = u6d((n * sxy - sx * sy) / den)
      assert(math.abs(row.getAs[Double]("ic") - want) < 1e-6, s"day $day")
      assert(row.getAs[Double]("ic") > 0.9)                   // aligned signal
    }
  }

  test("volume_profile: uniform ticks spread one per decile, POC ties to the lowest bin") {
    val out = Analytics.volumeProfile(oneTickPanel((0 to 9).map(_.toDouble))).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(out.length === 10)
    assert(out.map(_.getAs[Long]("bin")).toSeq === (0L to 9L))
    out.foreach(r => assert(r.getAs[Long]("n_ticks") === 1L))
    out.foreach(r => assert(r.getAs[Double]("share") === 0.1))
    assert(out.count(_.getAs[Boolean]("is_poc")) === 1)
    assert(out.head.getAs[Boolean]("is_poc"))                  // tie → lowest bin
  }

  test("balance_of_power: close-at-high bars pin BOP and its SMA at 1") {
    // open = low (first tick), close = high (last) → (c−o)/(h−l) = 1
    val out = Analytics.balanceOfPower(twoTickPanel((1 to 6).map(i => (10.0 * i, 10.0 * i + 2)))).collect()
    assert(out.length === 6)
    out.foreach { r =>
      assert(r.getAs[Double]("bop") === 1.0)
      assert(r.getAs[Double]("bop_sma") === 1.0)
    }
  }

  test("balance_of_power: flat bars drop before the window") {
    val out = Analytics.balanceOfPower(oneTickPanel(Seq(5.0, 6.0, 7.0))).collect()
    assert(out.isEmpty)                                       // high = low everywhere
  }

  test("qstick: constant candle body smooths to exactly the body") {
    val out = Analytics.qstick(twoTickPanel((1 to 5).map(i => (10.0 * i, 10.0 * i + 2)))).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("body") === 2.0)
      assert(r.getAs[Double]("qstick") === 2.0)
    }
  }

  test("rvi: bars that always close their full range give RVI 1") {
    val out = Analytics.rvi(twoTickPanel((1 to 8).map(i => (10.0 * i, 10.0 * i + 2)))).collect()
    assert(out.length === 5)                                  // 3-bar SWMA lookback drops
    out.foreach(r => assert(r.getAs[Double]("rvi") === 1.0))
    // signal needs 3 more rvi lags: first 3 null, rest 1
    assert(out.count(_.getAs[Any]("sig") == null) === 3)
    out.filter(_.getAs[Any]("sig") != null).foreach(r => assert(r.getAs[Double]("sig") === 1.0))
  }

  test("nvi_pvi: constant volume never compounds either log level") {
    val out = Analytics.nviPvi(oneTickPanel(Seq(100.0, 110.0, 121.0, 133.1))).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("nvi_log") === 0.0)
      assert(r.getAs[Double]("pvi_log") === 0.0)
    }
  }

  test("bipower_var: constant returns make BV exceed RV, so jump share is 0") {
    // rets 0.1, 0.1, 0.1: RV = 3·0.01, BV = (π/2)·2·0.01 > RV
    val out = Analytics.bipowerVar(oneTickPanel(Seq(100.0, 110.0, 121.0, 133.1))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Double]("rv") === 0.03)
    assert(math.abs(r.getAs[Double]("bv") - math.Pi * 0.01) < 1e-6)
    assert(r.getAs[Double]("jump_share") === 0.0)
  }

  test("bipower_var: one jump among flat returns attributes variance to the jump") {
    // rets 0, 0, 0.5, 0, 0: RV = 0.25, adjacent products all 0 → BV 0 → share 1
    val out = Analytics.bipowerVar(oneTickPanel(Seq(10, 10, 10, 15, 15, 15).map(_.toDouble))).collect()
    val r = out.head
    assert(r.getAs[Double]("bv") === 0.0)
    assert(r.getAs[Double]("jump_share") === 1.0)
  }

  test("heikin_ashi: recursive open is yesterday's HA midpoint") {
    val out = Analytics.heikinAshi(oneTickPanel(Seq(10.0, 20.0, 30.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.length === 3)
    // day 1: all-10 bar → every HA field 10
    assert(out(0).getAs[Double]("ha_open") === 10.0)
    assert(out(0).getAs[Double]("ha_close") === 10.0)
    // day 2: ha_open = (10+10)/2 = 10, ha_close = 20, envelope [10, 20]
    assert(out(1).getAs[Double]("ha_open") === 10.0)
    assert(out(1).getAs[Double]("ha_close") === 20.0)
    assert(out(1).getAs[Double]("ha_high") === 20.0)
    assert(out(1).getAs[Double]("ha_low") === 10.0)
    // day 3: ha_open = (10+20)/2 = 15, ha_close = 30
    assert(out(2).getAs[Double]("ha_open") === 15.0)
    assert(out(2).getAs[Double]("ha_close") === 30.0)
    assert(out(2).getAs[Double]("ha_low") === 15.0)
  }

  test("kst: a flat series scores 0 KST and 0 signal after the lookback") {
    val out = Analytics.kst(oneTickPanel(Seq.fill(22)(42.0))).collect()
    assert(out.length === 7)                                  // 22 − 15 lookback
    out.foreach { r =>
      assert(r.getAs[Double]("kst") === 0.0)
      assert(r.getAs[Double]("sig") === 0.0)
    }
  }

  test("rachev_ratio: symmetric single-element tails give ratio 1") {
    // rets .1, −.1, .1 → sorted [−.1, .1, .1], k = 1: ETL = ETG = 0.1
    val out = Analytics.rachevRatio(oneTickPanel(Seq(100.0, 110.0, 99.0, 108.9))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_tail") === 1L)
    assert(r.getAs[Double]("etl") === 0.1)
    assert(r.getAs[Double]("etg") === 0.1)
    assert(r.getAs[Double]("rachev") === 1.0)
  }

  test("pain_index: a rising series never hurts; a fall prices the pain") {
    val up = Analytics.painIndex(oneTickPanel(Seq(1.0, 2.0, 3.0, 4.0))).collect().head
    assert(up.getAs[Double]("pain_index") === 0.0)
    assert(up.getAs[Any]("pain_ratio") == null)               // 0 pain → null ratio
    // 100 → 90: dd = [0, −0.1] → pain 0.05; mean_ret −0.1 → ratio −2
    val dn = Analytics.painIndex(oneTickPanel(Seq(100.0, 90.0))).collect().head
    assert(dn.getAs[Double]("pain_index") === 0.05)
    assert(dn.getAs[Double]("mean_ret") === -0.1)
    assert(dn.getAs[Double]("pain_ratio") === -2.0)
  }

  test("vol_clustering: alternating magnitudes anti-correlate; same-sign series make lev = vc") {
    // rets .1, .2, .1, .2: |r| pairs (.1,.2),(.2,.1),(.1,.2) → corr −1;
    // all rets positive → leverage corr equals the clustering corr
    val out = Analytics.volClustering(
      oneTickPanel(Seq(100.0, 110.0, 132.0, 145.2, 174.24))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(math.abs(r.getAs[Double]("vc_corr") + 1.0) < 1e-5)
    assert(r.getAs[Double]("lev_corr") === r.getAs[Double]("vc_corr"))
  }

  test("supertrend: a flat series pins both bands to the price and stays long") {
    val out = Analytics.supertrend(oneTickPanel(Seq.fill(6)(42.0))).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("fub") === 42.0)                 // atr 0 → bands at mid
      assert(r.getAs[Double]("flb") === 42.0)
      assert(r.getAs[Long]("dir") === 1L)
      assert(r.getAs[Double]("supertrend") === 42.0)
    }
  }

  test("supertrend: a steady rally never flips and trails below the close") {
    val out = Analytics.supertrend(oneTickPanel((1 to 10).map(_ * 10.0))).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("dir") === 1L)
      assert(r.getAs[Double]("supertrend") === r.getAs[Double]("flb"))
      assert(r.getAs[Double]("supertrend") <= r.getAs[Double]("close"))
    }
  }

  test("connors_rsi: an unbroken rally pins both RSIs at 100 and the rank at 0") {
    val out = Analytics.connorsRsi(
      oneTickPanel(Seq(100.0, 110.0, 121.0, 133.1, 146.41))).collect()
    assert(out.length === 3)                                  // first ret + first sd drop
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("streak") === (i + 2).toLong)
      assert(r.getAs[Double]("rsi3") === 100.0)
      assert(r.getAs[Double]("rsi2") === 100.0)
    }
    // the very first row has an EMPTY trailing-rank frame → pr (and the
    // composite) null; afterwards equal rets never rank below → pr 0
    assert(out.head.getAs[Any]("pr") == null)
    assert(out.head.getAs[Any]("crsi") == null)
    out.drop(1).foreach { r =>
      assert(r.getAs[Double]("pr") === 0.0)
      assert(r.getAs[Double]("crsi") === 66.666667)           // u6(200/3)
    }
  }

  test("dema_tema: a flat series keeps every EMA and recombination at the price") {
    val out = Analytics.demaTema(oneTickPanel(Seq.fill(6)(42.0))).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("e1") === 42.0)
      assert(r.getAs[Double]("dema") === 42.0)
      assert(r.getAs[Double]("tema") === 42.0)
    }
  }

  test("mcclellan: constant +1 breadth gives a zero oscillator and summation") {
    // three assets: two rise, one falls, every day → net = +1 always
    val rows = for (dayN <- 1 to 8; a <- 1 to 3) yield {
      val v = a match {
        case 1 => 100.0 + dayN
        case 2 => 200.0 + 2 * dayN
        case _ => 100.0 - dayN
      }
      (a.toLong, d(f"2024-01-$dayN%02d"), ts(dayN * 10 + a), v, (dayN * 10 + a).toLong)
    }
    val out = Analytics.mcclellan(rows.toDF("asset_id", "date", "ts", "value", "seq")).collect()
    assert(out.length === 7)                                  // first date has no rets
    out.foreach { r =>
      assert(r.getAs[Long]("net") === 1L)
      assert(r.getAs[Double]("e19") === 1.0)
      assert(r.getAs[Double]("osc") === 0.0)
      assert(r.getAs[Double]("summation") === 0.0)
    }
  }

  test("psar: a steady rally stays long with an accelerating ratcheting stop") {
    val out = Analytics.psar(oneTickPanel((1 to 10).map(_ * 10.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.length === 9)                                  // bar 1 seeds only
    out.foreach { r =>
      assert(r.getAs[Long]("dir") === 1L)
      assert(r.getAs[Double]("sar") < r.getAs[Double]("close"))
    }
    // af walks 0.02 → 0.04 → … as each bar sets a new extreme
    assert(out(0).getAs[Double]("af") === 0.02)
    assert(out(1).getAs[Double]("af") === 0.04)
    assert(out(2).getAs[Double]("af") === 0.06)
    // the stop only ever rises in an uptrend
    val sars = out.map(_.getAs[Double]("sar")).toSeq
    assert(sars === sars.sorted)
  }

  test("klinger_osc and ppo: a flat series zeroes oscillator and signal") {
    val panel = oneTickPanel(Seq.fill(6)(42.0))
    Analytics.klingerOsc(panel).collect().foreach { r =>
      assert(r.getAs[Long]("sv") === 0L)
      assert(r.getAs[Double]("ko") === 0.0)
      assert(r.getAs[Double]("signal") === 0.0)
    }
    Analytics.ppo(panel).collect().foreach { r =>
      assert(r.getAs[Double]("ppo") === 0.0)
      assert(r.getAs[Double]("signal") === 0.0)
    }
  }

  test("relative_volume: constant one-tick days pin rvol at 1 after the first bar") {
    val out = Analytics.relativeVolume(oneTickPanel((1 to 5).map(_.toDouble))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.head.getAs[Any]("rvol") == null)               // empty trailing frame
    out.drop(1).foreach { r =>
      assert(r.getAs[Double]("avg_vol") === 1.0)
      assert(r.getAs[Double]("rvol") === 1.0)
    }
  }

  test("up_down_vol_ratio: alternating closes split the volume 2:1") {
    val out = Analytics.upDownVolRatio(oneTickPanel(Seq(10.0, 20.0, 10.0, 20.0))).collect()
    val r = out.head
    assert(r.getAs[Long]("up_vol") === 2L)                    // days 2 and 4
    assert(r.getAs[Long]("down_vol") === 1L)                  // day 3
    assert(r.getAs[Double]("udr") === 2.0)
  }

  test("fisher_transform: a flat channel stays centered at zero") {
    val out = Analytics.fisherTransform(oneTickPanel(Seq.fill(6)(42.0))).collect()
      .sortBy(_.getDate(1).toString)
    out.foreach(r => assert(r.getAs[Double]("fisher") === 0.0))
    assert(out.head.getAs[Any]("trigger") == null)
    out.drop(1).foreach(r => assert(r.getAs[Double]("trigger") === 0.0))
  }

  test("sma_cross: a steady rally crosses up once the fast window saturates") {
    // expanding frames keep fast = slow through day 5; on day 6 the
    // 5-bar fast mean finally pulls ahead of the 20-bar (full-history)
    // slow mean → the single +1 cross
    val out = Analytics.smaCross(oneTickPanel((1 to 8).map(_ * 10.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.map(_.getAs[Long]("cross")).toSeq === Seq(0L, 0L, 0L, 0L, 0L, 1L, 0L, 0L))
  }

  test("price_volume_corr: constant volume nulls the correlation") {
    val out = Analytics.priceVolumeCorr(oneTickPanel((1 to 6).map(_ * 10.0))).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Any]("pv_corr") == null)            // zero-variance dv
  }

  test("trend_intensity: a rally holds every bar but the first above its SMA") {
    val out = Analytics.trendIntensity(oneTickPanel((1 to 5).map(_ * 10.0))).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.head.getAs[Long]("ti_pm") === 0L)              // day 1: close = sma
    assert(out(1).getAs[Long]("ti_pm") === 500L)              // 1 of 2
    assert(out(4).getAs[Long]("ti_pm") === 800L)              // 4 of 5
  }

  test("high_low_index: a universal rally prints only fresh highs") {
    val a = oneTickPanel((1 to 6).map(_ * 10.0), asset = 1L)
    val b = oneTickPanel((1 to 6).map(_ * 5.0), asset = 2L)
    val out = Analytics.highLowIndex(a.unionByName(b)).collect().sortBy(_.getDate(0).toString)
    assert(out.length === 5)                                  // day 1 has no trailing frame
    out.foreach { r =>
      assert(r.getAs[Long]("n_new_high") === 2L)
      assert(r.getAs[Long]("n_new_low") === 0L)
      assert(r.getAs[Long]("hl_pm") === 1000L)
    }
  }

  test("xsec_dispersion: identical cross-sectional returns disperse zero") {
    val a = oneTickPanel(Seq(100.0, 110.0, 121.0), asset = 1L)
    val b = oneTickPanel(Seq(200.0, 220.0, 242.0), asset = 2L)
    val out = Analytics.xsecDispersion(a.unionByName(b)).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_assets") === 2L)
      assert(r.getAs[Double]("mean_ret") === 0.1)
      assert(r.getAs[Double]("dispersion") === 0.0)
    }
  }

  test("autocorr_profile: alternating returns flip sign by lag parity") {
    // rets +r, −s, +r, −s … → lag-1 strongly negative, lag-2 strongly positive
    val values = Seq(100.0, 120.0, 96.0, 115.2, 92.16, 110.592, 88.4736, 106.16832)
    val out = Analytics.autocorrProfile(oneTickPanel(values)).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("ac")).toMap
    assert(out(1L) < -0.9)
    assert(out(2L) > 0.9)
    assert(!out.contains(5L))                                 // 7 rets − 5 < 3 pairs
  }

  test("martin_ratio: a rising series never dips so the ratio is null") {
    val out = Analytics.martinRatio(oneTickPanel(Seq(1.0, 2.0, 3.0, 4.0))).collect()
    val r = out.head
    assert(r.getAs[Double]("ulcer") === 0.0)
    assert(r.getAs[Any]("martin") == null)
    // one 10% dip: dd = [0, −0.1] → ulcer = √(0.01/2)
    val dn = Analytics.martinRatio(oneTickPanel(Seq(100.0, 90.0))).collect().head
    assert(dn.getAs[Double]("ulcer") === math.floor(math.sqrt(0.005) * 1e6 + 0.5) / 1e6)
  }

  test("dar: the worst drawdown day is the k=1 tail") {
    // dd = [0, −0.5, −0.25]: sorted [−0.5, −0.25, 0], k = 1 → DaR 0.5
    val out = Analytics.dar(oneTickPanel(Seq(100.0, 50.0, 75.0))).collect()
    val r = out.head
    assert(r.getAs[Long]("n_tail") === 1L)
    assert(r.getAs[Double]("dar") === 0.5)
    assert(r.getAs[Double]("cdar") === 0.5)
  }

  test("skip_days_impact: removing the best days erases exactly their log mass") {
    // 9 days of +10% and one +100% day: total = 1.1⁹·2 − 1; without the
    // best 5 (the double plus four +10%s) = 1.1⁵·... check via micro sums
    val values = (Seq.fill(9)(0.1) :+ 1.0).scanLeft(100.0) { case (v, r) => v * (1 + r) }
    val out = Analytics.skipDaysImpact(oneTickPanel(values)).collect()
    val r = out.head
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Double]("total_ret") > r.getAs[Double]("ret_wo_worst"))
    assert(r.getAs[Double]("ret_wo_best") < r.getAs[Double]("ret_wo_worst"))
    // all ten days are gains → dropping the best five still leaves gains ≥ 0
    assert(r.getAs[Double]("ret_wo_best") >= 0.0)
  }

  test("intraday_overnight_split: one-tick days put the whole return overnight") {
    // open = close every day → intraday leg exactly 0; overnight leg
    // carries ln(10/1)+ln(100/10)+… = the full path
    val out = Analytics.intradayOvernightSplit(
      oneTickPanel(Seq(1.0, 10.0, 100.0))).collect()
    val r = out.head
    assert(r.getAs[Double]("intraday_logret") === 0.0)
    assert(math.abs(r.getAs[Double]("overnight_logret") - math.log(100.0)) < 1e-4)
    assert(r.getAs[Double]("total_logret") === r.getAs[Double]("overnight_logret"))
  }

  test("beta_stability: a two-asset symmetric market keeps betas constant") {
    // both assets carry the same VARYING return path (.1/.2 alternating
    // — a constant market would zero the variance and null every beta),
    // so each asset IS the market: beta pinned at 1, sd exactly 0
    val a = oneTickPanel(Seq(100.0, 110.0, 132.0, 145.2, 174.24), asset = 1L)
    val b = oneTickPanel(Seq(200.0, 220.0, 264.0, 290.4, 348.48), asset = 2L)
    val out = Analytics.betaStability(a.unionByName(b)).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Double]("mean_beta") === 1.0)
      assert(r.getAs[Double]("beta_sd") === 0.0)
    }
  }

  test("range_contraction: a shrinking range flags NR7 only past the full lookback") {
    // ranges 10,9,…,3 around a fixed center: every bar is the narrowest
    // yet (NR fires once six prior bars exist) and sits strictly inside
    // the previous one (inside-day from bar 2 on)
    val bars = (0 until 8).map(i => (100.0 - (10.0 - i) / 2, 100.0 + (10.0 - i) / 2))
    val out = Analytics.rangeContraction(twoTickPanel(bars)).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.take(6).forall(_.getAs[Long]("is_nr") == 0L))  // lookback not full
    assert(out.drop(6).forall(_.getAs[Long]("is_nr") == 1L))  // always narrowest
    assert(out.head.getAs[Long]("is_inside") === 0L)
    assert(out.drop(1).forall(_.getAs[Long]("is_inside") == 1L))
  }

  test("volatility_ratio: matched short/long windows on steady vol read 1") {
    // alternating ±r-ish returns keep both sample stds equal once the
    // long window saturates; before that vr is NULL by the n guard
    val values = (0 until 24).scanLeft(100.0) { case (v, i) =>
      v * (if (i % 2 == 0) 1.1 else 1.0 / 1.1)
    }
    val out = Analytics.volatilityRatio(oneTickPanel(values)).collect()
      .sortBy(_.getDate(1).toString)
    assert(out.take(19).forall(_.getAs[Any]("vr") == null))   // lookback not full
    val live = out.drop(19)
    assert(live.nonEmpty)
    live.foreach(r => assert(math.abs(r.getAs[Double]("vr") - 1.0) < 0.1))
  }

  test("acceleration: a linear ramp has constant velocity and zero acceleration") {
    val out = Analytics.acceleration(oneTickPanel((1 to 10).map(_ * 10.0))).collect()
      .sortBy(_.getDate(1).toString)
    // the SMA window fills at bar 5; mom is full-window-to-full-window
    // from bar 6, so accel zeroes from bar 7 on
    out.drop(5).foreach(r => assert(r.getAs[Double]("mom") === 10.0))
    out.drop(6).foreach(r => assert(r.getAs[Double]("accel") === 0.0))
    assert(out.head.getAs[Any]("mom") == null)                // no yesterday
  }

  test("psar: a crash through the stop flips the trend short") {
    val out = Analytics.psar(oneTickPanel(Seq(10.0, 20.0, 30.0, 40.0, 50.0, 10.0)))
      .collect().sortBy(_.getDate(1).toString)
    assert(out.last.getAs[Long]("dir") === -1L)
    assert(out.last.getAs[Double]("ep") === 10.0)             // new extreme = crash low
    assert(out.dropRight(1).forall(_.getAs[Long]("dir") == 1L))
  }
}
