package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.operators._

/** Degenerate-input robustness: empty panels, single rows, blank and
  * unicode text — operators must return empty/sane results, never throw.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyPanel: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("asset_id", LongType), StructField("date", DateType),
      StructField("ts", TimestampType), StructField("value", DoubleType),
      StructField("seq", LongType))))

  test("as-of and KV operators return empty on an empty panel") {
    assert(AsOf.asOfRange(emptyPanel, 1L, "2024-01-01", "2024-01-31", "2024-02-01 00:00:00").count() === 0)
    assert(KeyValue.upsertLww(emptyPanel).count() === 0)
    assert(Analytics.dailyReturns(emptyPanel).count() === 0)
    assert(Analytics.resampleOhlc(emptyPanel).count() === 0)
    assert(Analytics.gapFill(emptyPanel).count() === 0)
    assert(Analytics.bars5Min(emptyPanel).count() === 0)
  }

  test("single-row panel: every derived series is sane") {
    val p = Seq((1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 5.0, 1L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    assert(KeyValue.upsertLww(p).count() === 1)
    assert(Analytics.dailyReturns(p).count() === 0) // no lag → filtered
    val gf = Analytics.gapFill(p).collect()
    assert(gf.length === 1 && gf(0).getDouble(2) === 5.0)
    val ohlc = Analytics.resampleOhlc(p).collect()(0)
    assert(ohlc.getAs[Double]("open") === 5.0 && ohlc.getAs[Double]("close") === 5.0)
  }

  test("round-2 series operators return empty/sane on degenerate panels") {
    assert(Analytics.drawdown(emptyPanel).count() === 0)
    assert(Analytics.xsecRank(emptyPanel).count() === 0)
    assert(Analytics.resampleMonthly(emptyPanel).count() === 0)
    assert(Analytics.ewma(emptyPanel).count() === 0)
    val p = Seq((1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 5.0, 1L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val dd = Analytics.drawdown(p).collect()(0)
    assert(dd.getAs[Double]("peak") === 5.0 && dd.getAs[Double]("drawdown") === 0.0)
    assert(Analytics.ewma(p).collect()(0).getAs[Double]("ewma") === 5.0)
    val xr = Analytics.xsecRank(p).collect()(0)
    assert(xr.getAs[Long]("rank") === 1L && xr.isNullAt(xr.fieldIndex("pct_rank")))
    val rm = Analytics.resampleMonthly(p).collect()(0)
    assert(rm.getAs[Long]("n_days") === 1L && rm.getAs[Double]("open") === 5.0)
  }

  test("pipeline operators handle empty and degenerate document sets") {
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    assert(Pipeline.sampleSplit(emptyDocs).count() === 0)
    assert(Pipeline.corpusFilter(emptyDocs).count() === 0)
    assert(Pipeline.docPack(emptyDocs).count() === 0)
    // blank/unicode docs flow through without error
    val docs = Seq((1L, ""), (2L, "   "), (3L, "中文 文本")).toDF("doc_id", "text")
    assert(Pipeline.sampleSplit(docs).count() === 3)
    assert(Pipeline.docPack(docs).count() === 3)
    assert(Pipeline.corpusFilter(docs, minQuality = 0.0, lang = "und").count() >= 1)
  }

  test("text operators handle blank and unicode documents") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "中文 文本 测试 的 是"), (4L, "héllo wörld"))
      .toDF("doc_id", "text")
    val tq = docs.select($"doc_id",
      graft.functions.TextFns.wsTokenCount($"text").as("n"),
      graft.functions.TextFns.qualityScore($"text").as("q"),
      graft.functions.TextFns.langId($"text").as("lang")).collect()
    assert(tq.length === 4)
    assert(tq.find(_.getLong(0) == 1L).get.getInt(1) === 0)
    assert(tq.find(_.getLong(0) == 3L).get.getString(3) === "zh")
    // kernels on degenerate text
    val fp = docs.select(
      graft.expressions.Kernels.simhash64($"text"),
      graft.expressions.Kernels.minhashSig($"text", 8, 16)).collect()
    assert(fp.length === 4)
    assert(Dedup.exactDedup(docs).count() === 4)
  }

  test("round-3 series operators return empty/sane on degenerate panels") {
    assert(Analytics.rollingVol(emptyPanel).count() === 0)
    assert(Analytics.bollinger(emptyPanel).count() === 0)
    assert(Analytics.rsi(emptyPanel).count() === 0)
    assert(Analytics.xsecZscore(emptyPanel).count() === 0)
    assert(Analytics.beta(emptyPanel).count() === 0)
    assert(Analytics.twap(emptyPanel).count() === 0)
    assert(AsOf.asOfSnapshot(emptyPanel, "2024-01-01 00:00:00").count() === 0)
    assert(AsOf.revisionDiff(emptyPanel, "2024-01-01 00:00:00", "2024-02-01 00:00:00").count() === 0)
    val p = Seq((1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 5.0, 1L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    // single row: no returns → vol/rsi empty; bands need 2 rows; twap = value
    assert(Analytics.rollingVol(p).count() === 0)
    assert(Analytics.rsi(p).count() === 0)
    assert(Analytics.bollinger(p).count() === 0)
    assert(Analytics.beta(p).count() === 0)
    val z = Analytics.xsecZscore(p).collect()(0)
    assert(z.isNullAt(z.fieldIndex("z"))) // singleton cross-section
    assert(Analytics.twap(p).collect()(0).getAs[Double]("twap") === 5.0)
    // same-ts ticks (span 0) fall back to the LWW winner, no /0 error
    val tied = Seq(
      (1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 5.0, 1L),
      (1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 9.0, 2L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    assert(Analytics.twap(tied).collect()(0).getAs[Double]("twap") === 9.0)
  }

  test("round-3 pipeline operators handle degenerate documents") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "中文 文本")).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("zz"))
    assert(Pipeline.piiRedact(docs).count() === 3)
    // unknown lang falls to the default per-mille rate
    assert(Pipeline.stratifiedSample(docs).collect().forall(_.getLong(2) < 200))
    assert(Pipeline.lengthHistogram(docs).count() >= 1)
    // blank docs have no tokens → absent from df-quality output
    val q = Pipeline.tokenDfQuality(docs)
    assert(q.count() === 1 && q.collect()(0).getLong(0) === 3L)
  }

  test("similarity operators tolerate zero vectors") {
    val emb = Seq((0L, Array(0f, 0f, 0f, 0f)), (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    // zero vector never clears a positive threshold, no ANSI error
    assert(Similarity.embeddingNearDupPairs(emb, 0.5).count() === 0)
    val topk = Similarity.cosineTopK(emb, Seq(1L), 2).collect()
    assert(topk.nonEmpty)
    assert(Similarity.lshBuckets(emb, dim = 4, planes = 4).count() === 3)
  }

  test("quantize kernel: null element nullifies the row, empty array stays empty") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(0L, Seq[java.lang.Double](1.0, null)),
      Row(1L, Seq[java.lang.Double]()),
      Row(2L, null))
    val df = spark.createDataFrame(rows, schema)
    val out = df.select(col("vec_id"),
      graft.expressions.Kernels.quantizeInt8(col("v")).as("q"),
      graft.expressions.Kernels.dotLong(
        graft.expressions.Kernels.quantizeInt8(col("v")),
        graft.expressions.Kernels.quantizeInt8(col("v"))).as("d"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).isNullAt(1) && out(0).isNullAt(2)) // null element → null code array → null dot
    assert(out(1).getSeq[Long](1).isEmpty && out(1).getLong(2) === 0L)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2)) // null array propagates
  }

  test("winnowPairs and tfidfTopK handle degenerate documents") {
    val docs = Seq((0L, ""), (1L, "   "), (2L, "ab"), (3L, "plain words here"))
      .toDF("doc_id", "text")
    // sub-k strings produce no fingerprints → no pairs, no error
    assert(graft.operators.Dedup.winnowPairs(docs).count() === 0)
    // blank docs tokenize to nothing and simply drop out of tfidf
    val tf = graft.operators.Pipeline.tfidfTopK(docs, 3).collect()
    assert(tf.map(_.getLong(0)).toSet === Set(2L, 3L))
  }

  test("round-5 operators return empty/sane on degenerate inputs") {
    // rolling_median on empty and single-row panels
    assert(Analytics.rollingMedian(emptyPanel).count() === 0)
    val one = Seq((1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 7.5, 1L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    assert(Analytics.rollingMedian(one).collect().map(_.getDouble(2)).toSeq === Seq(7.5))

    // interval_join: empty orders, and a customer with one order → no pairs
    val emptyOrders = Seq.empty[(Long, Long, Timestamp)]
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    assert(AsOf.intervalJoin(emptyOrders).count() === 0)

    // bm25: blank query doc contributes no terms → absent from output;
    // unknown query id → no rows at all
    val docs = Seq((0L, "  "), (1L, "alpha beta"), (2L, "alpha gamma"))
      .toDF("doc_id", "text")
    assert(Pipeline.bm25TopK(docs, Seq(0L), 5).count() === 0)
    assert(Pipeline.bm25TopK(docs, Seq(99L), 5).count() === 0)
    val hit = Pipeline.bm25TopK(docs, Seq(1L), 5).collect()
    assert(hit.map(_.getLong(2)).toSeq === Seq(2L)) // shares "alpha" only

    // graph ops on an empty pair set: empty output, no errors
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.triangleCount(noPairs).count() === 0)
    val docIds = Seq(1L, 2L).toDF("doc_id")
    val pr = Dedup.simPagerank(docIds, noPairs).collect()
    assert(pr.map(_.getLong(1)).toSeq === Seq(150000L, 150000L)) // all base

    // tolerance as-of with zero window: every match is stale → all null
    val left = Seq((1L, new Timestamp(10000L), 100L, 1.0))
      .toDF("user_id", "ts", "seq", "value")
    val right = Seq((1L, new Timestamp(9000L), 200L, 2.0))
      .toDF("user_id", "ts", "seq", "rvalue")
    val tol = AsOf.asOfJoinTolerance(left, right, "user_id", Seq("value"), 0L).collect()
    assert(tol.length === 1 && tol.head.isNullAt(tol.head.fieldIndex("asof_value")))

    // vwap: empty input → empty; all identical timestamps collapse to one bar
    val emptyLi = Seq.empty[(Long, Timestamp, Double, Double)]
      .toDF("l_suppkey", "l_shipdate", "l_quantity", "l_extendedprice")
    assert(Analytics.vwap(emptyLi).count() === 0)

    // source_stats: all-unique corpus → zero dup fractions everywhere
    val uniq = Seq((1L, "aa", "en", "web"), (2L, "bb", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val ss = Pipeline.sourceStats(uniq).collect()
    assert(ss.length === 1 && ss.head.getAs[Long]("n_dup_docs") === 0L &&
      ss.head.getAs[Double]("dup_fraction") === 0.0)
  }

  test("chunkDedup/lmScore: token-less docs drop out, never throw") {
    val docs = Seq((0L, ""), (1L, "   "), (2L, "one"), (3L, "a b"))
      .toDF("doc_id", "text")
    // 0/1 have no tokens → no chunks → absent; 2 and 3 chunk normally
    val cd = Pipeline.chunkDedup(docs, chunkTokens = 2)
      .collect().map(_.getLong(0)).toSet
    assert(cd === Set(2L, 3L))
    // lm_score needs ≥ 2 tokens: only doc 3 emits
    assert(Pipeline.lmScore(docs).collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("pmiBigrams below the noise floor and mixtureSample with no targets are empty") {
    val docs = Seq((0L, "x y"), (1L, "p q")).toDF("doc_id", "text")
    assert(Pipeline.pmiBigrams(docs, minCount = 5L, k = 10).count() === 0)
    val full = Seq((0L, "t", "en", "src0")).toDF("doc_id", "text", "lang", "source")
    assert(Pipeline.mixtureSample(full, Map.empty).count() === 0)
  }

  test("atr/stochastic/obv degrade sanely on a single-bar asset") {
    val p = Seq((1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 5.0, 1L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val a = Analytics.atr(p).collect()(0)
    assert(a.getAs[Double]("tr") === 0.0 && a.getAs[Double]("atr") === 0.0)
    val st = Analytics.stochastic(p).collect()(0)
    assert(st.isNullAt(3) && st.isNullAt(4)) // flat single-tick channel
    val o = Analytics.obv(p).collect()(0)
    assert(o.getAs[Long]("obv") === 0L)
  }

  test("momentumXsec with all-equal momenta assigns deterministic quintiles by id") {
    val p = (0 until 12).flatMap { i =>
      (1L to 5L).map(a => (a, Date.valueOf(f"2024-01-${i + 1}%02d"),
        new Timestamp(i * 1000L + a), 10.0, i * 10L + a))
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val last = Analytics.momentumXsec(p, skip = 2, look = 10)
      .filter($"date" === Date.valueOf("2024-01-12")).orderBy($"asset_id").collect()
    assert(last.map(_.getAs[Double]("mom")).forall(_ === 0.0))
    // rank ties broken by asset_id: n=5 → quintile ≡ rank, in id order
    assert(last.map(_.getAs[Long]("quintile")).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("session-3 operators return empty/sane on degenerate inputs") {
    // bar family on the empty panel: no rows, no exceptions
    assert(Analytics.ichimoku(emptyPanel).count() === 0)
    assert(Analytics.pivotPoints(emptyPanel).count() === 0)
    assert(Analytics.cci(emptyPanel).count() === 0)
    assert(Analytics.cmf(emptyPanel).count() === 0)
    assert(Analytics.quintileChurn(emptyPanel).count() === 0)
    // single-bar asset: first-row semantics, no window underflow
    val p = Seq((1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 5.0, 1L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val ich = Analytics.ichimoku(p).collect()(0)
    assert(ich.getAs[Double]("conv") === 5.0) // degenerate channel midpoint
    val piv = Analytics.pivotPoints(p).collect()(0)
    assert(piv.isNullAt(piv.fieldIndex("p"))) // no previous bar
    val c = Analytics.cci(p).collect()(0)
    assert(c.isNullAt(c.fieldIndex("cci"))) // zero deviation
    val m = Analytics.cmf(p).collect()(0)
    assert(m.getAs[Double]("cmf") === 0.0) // flat bar: 0 flow over 1 volume
    // pairs_spread: pairs absent from the panel, or with < 3 common dates → empty
    assert(Analytics.pairsSpread(p, Seq((1L, 2L))).count() === 0)
    // event_study: no events of the type → empty table, not a failure
    val ev = Seq((1L, new Timestamp(1000L), "view")).toDF("user_id", "ts", "event_type")
    assert(Analytics.eventStudy(p, ev, eventType = "purchase").count() === 0)
  }

  test("round-6 operators are sane on empty and degenerate inputs") {
    // benchmark-relative family on the empty panel → no rows, no throw
    assert(Analytics.informationRatio(emptyPanel).count() === 0)
    assert(Analytics.downsideBeta(emptyPanel).count() === 0)
    assert(Analytics.treynor(emptyPanel).count() === 0)
    assert(Analytics.overnightGap(emptyPanel).count() === 0)
    assert(Analytics.volOfVol(emptyPanel).count() === 0)
    assert(Analytics.monthlySeasonality(emptyPanel).count() === 0)
    // single asset: the asset IS the market → active returns all zero →
    // tracking error 0 → ir NULL (never a divide error); |β|≈1 → treynor sane
    val p6 = Seq(
      (1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 100.0, 1L),
      (1L, Date.valueOf("2024-01-02"), new Timestamp(2000L), 110.0, 2L),
      (1L, Date.valueOf("2024-01-03"), new Timestamp(3000L), 99.0, 3L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val ir = Analytics.informationRatio(p6).collect()(0)
    assert(ir.isNullAt(ir.fieldIndex("ir")))
    val tr = Analytics.treynor(p6).collect()(0)
    assert(math.abs(tr.getAs[Double]("beta") - 1.0) < 1e-6)
    // document family: empty corpus → empty/zero results, never a throw
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
        StructField("source", StringType))))
    assert(Dedup.prefixDups(emptyDocs).count() === 0)
    assert(Dedup.crossSourceDups(emptyDocs).count() === 0)
    assert(Pipeline.tokenLengthQuantiles(emptyDocs).count() === 0)
    assert(Pipeline.packEfficiency(emptyDocs).count() === 0)
    val vo = Pipeline.vocabOverlap(emptyDocs).collect()(0)
    assert(vo.getAs[Long]("n_union") === 0L && vo.isNullAt(vo.fieldIndex("jaccard_pm")))
    val kl = Pipeline.unigramKl(emptyDocs).collect()(0)
    assert(kl.getAs[Long]("n_words") === 0L && kl.getAs[Double]("kl_sym") === 0.0)
    // blank and unicode text flow through the prefix/vocab paths
    val docs = Seq((1L, "", "a"), (2L, "   ", "a"), (3L, "中文 文本", "b"))
      .toDF("doc_id", "text", "source")
    assert(Dedup.prefixDups(docs).count() === 1) // "" and "   " normalize equal
    assert(Pipeline.tokenLengthQuantiles(docs).count() === 2)
  }

  // ── half-boundary rounding fuzz (VERDICT r6 item 3) ──────────────────
  // The defect class that produced the r6 williams_r wrong answer:
  // Spark's round(_, 6) rounds the SHORTEST DECIMAL REPR of a double
  // (BigDecimal.decimal → HALF_UP) while DuckDB rounds the exact binary
  // value — a double sitting just below k+½ micro-units whose shortest
  // repr still prints "…5" rounds UP in Spark and DOWN in DuckDB. These
  // emulators reproduce the two engines' semantics in-JVM so the flap is
  // testable on demand instead of data-luck.
  private def sparkRound6(x: Double): Double =
    BigDecimal.decimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def duckRound6(x: Double): Double =
    math.copySign(math.floor(math.abs(x) * 1e6 + 0.5), x) / 1e6
  // Doubles whose binary value sits below the half while the shortest
  // repr prints the half (found by brute-force over k+½ micro-unit
  // grid points; each is a verified cross-engine round() divergence).
  private val flapWitnesses =
    Seq(32.8688295, 67.0056865, 66.2385755, 8.1815875, -32.8688295)

  test("half-boundary fuzz: decimal round() flaps cross-engine, u6 never does") {
    // (a) the defect class is real: every witness diverges under round(6)
    flapWitnesses.foreach { x =>
      assert(sparkRound6(x) !== duckRound6(x),
        s"$x no longer witnesses the round() divergence")
    }
    // (b) u6 agrees across all three computation paths — the codegen'd
    // Column expression, the JVM twin, and the DuckDB floor expansion
    // (which IS duck-side floor((x)*1e6+0.5)/1e6, the same op sequence)
    val xs = flapWitnesses ++ Seq(0.1234565, -0.1234565, 0.9999995, 0.0,
      -12.3456785, 49.9999995)
    val viaSpark = xs.toDF("x")
      .select(org.apache.spark.sql.functions.col("x"),
        Micro.u6(org.apache.spark.sql.functions.col("x")).as("u"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.foreach { x =>
      val jvm = Micro.jvm6(x)
      assert(viaSpark(x) === jvm, s"codegen u6($x) != jvm6($x)")
      assert(jvm === math.floor(x * 1e6 + 0.5) / 1e6) // the oracle expansion
    }
  }

  test("williams_r half-boundary panels are bit-stable under u6") {
    // closes crafted so -100·(high−close)/(high−low) computes a double
    // that FLAPS under the old round(_, 6) idiom (high=1, low=0 ⇒ the
    // ratio is exactly -100·(1−close)); u6 must equal the JVM floor twin
    // bit-for-bit on every row. This panel fails the DuckDB oracle under
    // round(6) by construction — the regression the r6 driver caught.
    val closes = Seq(0.671311705, 0.918184125, 0.33761424500000004, 0.25, 0.75)
    val rows = closes.zipWithIndex.flatMap { case (c, i) =>
      val d = Date.valueOf(f"2024-02-${i + 1}%02d")
      val base = i * 86400000L
      Seq((1L, d, new Timestamp(base + 1000L), 0.5, 1L),
        (1L, d, new Timestamp(base + 2000L), 0.0, 2L),
        (1L, d, new Timestamp(base + 3000L), 1.0, 3L),
        (1L, d, new Timestamp(base + 4000L), c, 4L))
    }
    val got = Analytics.williamsR(rows.toDF("asset_id", "date", "ts", "value", "seq"))
      .collect().map(r => r.getDate(1).toString -> r.getDouble(3)).toMap
    closes.zipWithIndex.foreach { case (c, i) =>
      val ratio = -100.0 * (1.0 - c) / (1.0 - 0.0)
      assert(got(f"2024-02-${i + 1}%02d") === Micro.jvm6(ratio), s"close=$c")
    }
    // prove the panel exercises the flap: at least three of the crafted
    // ratios diverge under the two engines' round(_, 6)
    val flaps = closes.map(c => -100.0 * (1.0 - c) / 1.0)
      .count(x => sparkRound6(x) != duckRound6(x))
    assert(flaps >= 3)
  }

  test("round-7 panel operators return empty/sane on degenerate panels") {
    val panelOps: Seq[DataFrame => DataFrame] = Seq(
      Analytics.aroon(_), Analytics.mfi(_), Analytics.elderRay(_),
      Analytics.forceIndex(_), Analytics.vortex(_), Analytics.chaikinOsc(_),
      Analytics.kellyFraction(_), Analytics.tailRatio(_), Analytics.rollingSharpe(_),
      Analytics.rogersSatchell(_), Analytics.trix(_), Analytics.dpo(_),
      Analytics.coppock(_), Analytics.corwinSchultz(_), Analytics.volCone(_),
      Analytics.adx(_), Analytics.massIndex(_), Analytics.yangZhang(_),
      Analytics.awesomeOsc(_), Analytics.chandelierExit(_),
      Analytics.stochRsi(_), Analytics.pvo(_))
    panelOps.foreach(op => assert(op(emptyPanel).count() === 0))
    // one single-tick bar: frame-dependent ops emit their first row (or
    // nothing, where a lag/return gate drops it) without throwing
    val p = Seq((1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 5.0, 1L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    panelOps.foreach(op => assert(op(p).count() <= 1))
  }

  test("round-7 document/embedding operators are sane on degenerate inputs") {
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    assert(Pipeline.tokenGini(emptyDocs).count() === 0)
    assert(Pipeline.gopherRules(emptyDocs).count() === 0)
    assert(Pipeline.langConfusion(emptyDocs).count() === 0)
    assert(Pipeline.temperatureMix(emptyDocs).count() === 0)
    assert(Pipeline.dsirWeights(emptyDocs).count() === 0)
    assert(Dedup.normalizedDedup(emptyDocs).count() === 0)
    // dataset_card on an empty corpus: one row of zeros, NULL dup share
    val card = Pipeline.datasetCard(emptyDocs).collect()
    assert(card.length === 1 && card(0).getAs[Long]("n_docs") === 0L)
    assert(card(0).getAs[Any]("dup_share_pm") == null)
    // blank/unicode text never throws the rule projections
    val weird = Seq((1L, "", "en", "s", 0L), (2L, "   \n\n  ", "en", "s", 7L),
      (3L, "日本語のテキスト…", "zh", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Pipeline.gopherRules(weird).count() === 3)
    assert(Pipeline.tokenGini(weird).count() === 1)
  }

  // ── exp-ulp witness (round-7 session 3) ──────────────────────────────
  // The SECOND cross-engine determinism class, caught by the oracle on
  // intraday_overnight_split's first gate: once exp(Σlog) exceeds
  // ~2^33 ≈ e²³, ONE double ulp of the result is wider than the 10⁻⁶
  // micro grid (the flap observed at e²¹·⁸ was a half-ulp landing on
  // the grid boundary — the danger zone starts around e²¹) — so even with a bit-identical argument, the JVM's and
  // libm's legitimate last-ulp freedom in exp() can move the u6-rounded
  // output by a full micro step. Below that magnitude the grid is
  // orders of magnitude coarser than the ulp and the exp emit is safe.
  test("exp-ulp witness: above e^23 one ulp of exp crosses the micro grid") {
    // the class is real: ulp(exp(23)) > 1e-6 — a last-ulp disagreement
    // between two correctly-rounded-ish exp implementations is VISIBLE
    // after u6; at arg 10 it is invisible by ~7 orders of magnitude
    assert(math.ulp(math.exp(23.0)) > 1e-6)
    assert(math.ulp(math.exp(10.0)) < 1e-9)
    // one ulp of wiggle at the dangerous magnitude flips the u6 value…
    val v = math.exp(23.0)
    assert(Micro.jvm6(v) !== Micro.jvm6(Math.nextUp(v)))
    // …and the log-level form (what nvi_pvi / intraday_overnight_split
    // emit) is EXACT: micro-integer sums divided by 1e6 are on the grid
    val micros = Seq(22300000L, -21961307L, 6916429L)
    micros.foreach { m =>
      val level = m.toDouble / 1e6
      assert(Micro.jvm6(level) === level)   // already grid-exact, no rounding
    }
  }

  test("round-8 panel operators return empty/sane on degenerate panels") {
    val panelOps: Seq[DataFrame => DataFrame] = Seq(
      Analytics.kama(_), Analytics.rollingMoments(_), Analytics.distFromHigh(_),
      Analytics.dowSeasonality(_), Analytics.gapStats(_), Analytics.volRegime(_),
      Analytics.fractalPivots(_), Analytics.turnOfMonth(_),
      Analytics.volumeSeasonality(_), Analytics.roundPriceClustering(_),
      Analytics.resampleWeekly(_), Analytics.pricePercentile(_))
    panelOps.foreach(op => assert(op(emptyPanel).count() === 0))
    // single-tick panel: per-date ops emit ≤1 row, per-asset aggregates
    // exactly one; nothing throws (lag/return gates drop cleanly)
    val p = Seq((1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 5.0, 1L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    panelOps.foreach(op => assert(op(p).count() <= 1))
    // a zero-value tick never divides: kama/percentile/dist guard paths
    val z = Seq(
      (1L, Date.valueOf("2024-01-01"), new Timestamp(1000L), 0.0, 1L),
      (1L, Date.valueOf("2024-01-02"), new Timestamp(2000L), 5.0, 2L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    assert(Analytics.distFromHigh(z).count() === 2)
    assert(Analytics.kama(z).count() === 2)
    // day-2's gap divides by the zero prior close → NULL → filtered:
    // the asset has NO measurable gaps, so no aggregate row (never NaN)
    assert(Analytics.gapStats(z).count() === 0)
  }

  test("round-8 corpus operators are sane on empty and degenerate docs") {
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Seq((0L, "", "en", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars").schema)
    assert(Pipeline.wordLengthProfile(emptyDocs).count() === 0)
    assert(Pipeline.stopwordProfile(emptyDocs).count() === 0)
    assert(Pipeline.charTrigramEntropy(emptyDocs).count() === 0)
    assert(Pipeline.mixedLangDocs(emptyDocs).count() === 0)
    assert(Pipeline.sourceOverlapMatrix(emptyDocs).count() === 0)
    assert(Pipeline.qualityLengthMatrix(emptyDocs).count() === 0)
    assert(Pipeline.dupTextMass(emptyDocs).count() === 0)
    // blank/whitespace docs flow through the token explodes without
    // dividing or throwing
    val weird = Seq((1L, "", "en", "s", 0L), (2L, "   \n  ", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Pipeline.stopwordProfile(weird).collect()
      .forall(_.getAs[Any]("stop_pm") == null))       // zero tokens → NULL pm
    assert(Pipeline.charTrigramEntropy(weird).count() === 1)
    assert(Pipeline.mixedLangDocs(weird).collect().head.getAs[Long]("n_unmarked") === 2L)
  }

  // r7 VERDICT #6: the two remaining exp EMITTERS guard the bound by
  // construction — an argument beyond |21| nulls out instead of
  // shipping a value one exp-ulp could flap cross-engine.
  test("exp emitters null out beyond the safe bound instead of flapping") {
    // skip_days_impact: 30 days compounding by e² per day → Σlog = 58,
    // far past the bound; every exp-derived column must be NULL.
    val hot = (1 to 30).map { i =>
      (1L, Date.valueOf(f"2024-01-$i%02d"), new Timestamp(i * 1000L),
        math.exp(2.0 * i), i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val sdi = Analytics.skipDaysImpact(hot).collect()
    assert(sdi.length === 1)
    assert(sdi(0).getAs[Any]("total_ret") == null)
    assert(sdi(0).getAs[Any]("ret_wo_best") == null)
    assert(sdi(0).getAs[Any]("ret_wo_worst") == null)
    // …while a tame panel still emits real numbers through the guard
    val tame = (1 to 30).map { i =>
      (1L, Date.valueOf(f"2024-01-$i%02d"), new Timestamp(i * 1000L),
        100.0 + i, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    assert(Analytics.skipDaysImpact(tame).collect()(0).getAs[Any]("total_ret") != null)

    // corwin_schultz: intraday range of e^40 drives |α| past the bound
    // → spread AND spread_pos NULL (not 0 — the zero-denominator
    // convention extends to guarded emits).
    val wild = (1 to 4).flatMap { i =>
      Seq((1L, Date.valueOf(f"2024-02-$i%02d"), new Timestamp(i * 2000L), math.exp(40.0), 2L * i),
        (1L, Date.valueOf(f"2024-02-$i%02d"), new Timestamp(i * 2000L + 1), 1e-6, 2L * i + 1))
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val cs = Analytics.corwinSchultz(wild).collect()
    assert(cs.nonEmpty)
    cs.foreach { r =>
      assert(r.getAs[Any]("spread") == null)
      assert(r.getAs[Any]("spread_pos") == null)
    }
  }
}
