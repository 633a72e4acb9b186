package graft

import java.io.RandomAccessFile

import graft.operators.Dedup
import graft.sources.findb.{FindbDistWriter, FindbFormat, FindbWriter}

/** Round-10 hardening: the distributed findb writer and the venn star
  * convention.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  // page size that holds 4 entries per page — forces multi-level trees
  // out of tiny fixtures (the findb_read driver row uses the same trick)
  private val smallPage =
    FindbFormat.PageHeaderSize + 4 * FindbFormat.KeyValueSize

  private def entries(n: Int): Seq[(Long, Int, Long, Float)] =
    (0 until n).map(i => (i.toLong / 7, 20240101 + (i % 28), i.toLong, i * 0.5f))
      .sorted

  private def readBack(path: String): Seq[(Long, Int, Long, Float)] =
    spark.read.format("graft.sources.findb.FindbDataSource")
      .option("pagesPerPartition", 3).load(path)
      .as[(Long, Int, Long, Float)].collect().sorted.toSeq

  test("FindbDistWriter: multi-partition write round-trips through the connector") {
    val es = entries(1000)
    val path = tmp("fdw_rt") + "/t.db"
    FindbDistWriter.write(
      es.toDF("asset_id", "date", "timestamp", "value"),
      path, smallPage, numPartitions = 7)
    assert(readBack(path) === es)
  }

  test("FindbDistWriter: single partition is byte-identical to the Seq writer") {
    val es = entries(257) // multi-level: 65 leaves -> 13 + 3 + 1 inners
    val dir = tmp("fdw_bytes")
    FindbWriter.write(s"$dir/seq.db", smallPage, es)
    FindbDistWriter.write(
      es.toDF("asset_id", "date", "timestamp", "value"),
      s"$dir/dist.db", smallPage, numPartitions = 1)
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/seq.db"))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/dist.db"))
    assert(java.util.Arrays.equals(a, b))
  }

  test("FindbDistWriter: leaf chain spans partitions and the root descends to every key") {
    import FindbFormat._
    val es = entries(300)
    val path = tmp("fdw_chain") + "/t.db"
    FindbDistWriter.write(
      es.toDF("asset_id", "date", "timestamp", "value"),
      path, smallPage, numPartitions = 5)
    val raf = new RandomAccessFile(path, "r")
    try {
      val h = readHeader(raf)
      val buf = new Array[Byte](h.pageSize)
      def load(p: Long): Array[Byte] = {
        raf.seek(pageOffset(p, h.pageSize)); raf.readFully(buf); buf
      }
      // rightmost descent from the root reaches the LAST leaf; walking
      // the backward chain from there must visit every leaf and yield
      // all rows in reverse key order
      var page = h.rootPageNum
      var b = load(page)
      while (u32(b, 0) == InnerType) {
        val nKeys = u32(b, 4).toInt
        val extra = u32(b, 8)
        page =
          if (extra != NoPage) extra
          else u32(b, PageHeaderSize + nKeys * KeyValueSize + 12)
        b = load(page)
      }
      var got = List.empty[(Long, Int, Long, Float)]
      var leaves = 0
      while (page != NoPage) {
        b = load(page)
        assert(u32(b, 0) == LeafType)
        val n = u32(b, 4).toInt
        for (j <- (n - 1) to 0 by -1) {
          val off = PageHeaderSize + j * KeyValueSize
          got ::= ((u32(b, off), u32(b, off + 4).toInt, u32(b, off + 8), f32(b, off + 12)))
        }
        leaves += 1
        page = u32(b, 8)
      }
      assert(got === es)
      assert(leaves === got.size / 4 + (if (got.size % 4 == 0) 0 else 1))
    } finally raf.close()
  }

  test("FindbDistWriter: more partitions than rows (empty partitions) still round-trips") {
    val es = entries(5)
    val path = tmp("fdw_sparse") + "/t.db"
    FindbDistWriter.write(
      es.toDF("asset_id", "date", "timestamp", "value"),
      path, smallPage, numPartitions = 8)
    assert(readBack(path) === es)
  }

  test("FindbDistWriter: subtree page arithmetic matches ragged row counts") {
    // cap = 4, grouping 5 children per parent
    assert(FindbDistWriter.subtreePages(0, 4) === 0L)
    assert(FindbDistWriter.subtreePages(1, 4) === 1L)   // 1 leaf, no inner
    assert(FindbDistWriter.subtreePages(4, 4) === 1L)
    assert(FindbDistWriter.subtreePages(5, 4) === 3L)   // 2 leaves + root
    assert(FindbDistWriter.subtreePages(20, 4) === 6L)  // 5 leaves + 1 + ... 5->1 =6
    assert(FindbDistWriter.subtreePages(21, 4) === 9L)  // 6 leaves + 2 + 1
    assert(FindbDistWriter.topTreePages(1, 4) === 0L)
    assert(FindbDistWriter.topTreePages(5, 4) === 1L)
    assert(FindbDistWriter.topTreePages(6, 4) === 3L)   // 2 + 1
  }

  test("findb plan-time pruning: planned partitions drop with selectivity") {
    val es = entries(1000) // assets 0..142, cap 4 -> 250 leaves + inners
    val path = tmp("fdb_prune") + "/t.db"
    FindbWriter.write(path, smallPage, es)
    def read() = spark.read.format("graft.sources.findb.FindbDataSource")
      .option("pagesPerPartition", 3).load(path)
    val fullParts = read().rdd.getNumPartitions
    assert(fullParts >= 80) // 316 pages / 3 per partition, unpruned

    val one = read().where($"asset_id" === 42L)
    assert(one.rdd.getNumPartitions <= 3,
      s"point query planned ${one.rdd.getNumPartitions} partitions")
    assert(one.as[(Long, Int, Long, Float)].collect().sorted.toSeq ===
      es.filter(_._1 == 42L))

    val set = read().where($"asset_id".isin(3L, 99L, 140L))
    assert(set.rdd.getNumPartitions <= 9,
      s"In-set query planned ${set.rdd.getNumPartitions} partitions")
    assert(set.as[(Long, Int, Long, Float)].collect().sorted.toSeq ===
      es.filter(e => Set(3L, 99L, 140L)(e._1)))

    val range = read().where($"asset_id" >= 100L && $"asset_id" < 110L)
    assert(range.rdd.getNumPartitions < fullParts / 4,
      s"range query planned ${range.rdd.getNumPartitions} of $fullParts")
    assert(range.as[(Long, Int, Long, Float)].collect().sorted.toSeq ===
      es.filter(e => e._1 >= 100L && e._1 < 110L))

    // contradictory bounds plan an empty scan, not a crash
    val none = read().where($"asset_id" === 7L && $"asset_id" === 9L)
    assert(none.collect().isEmpty)
  }

  test("findb plan-time pruning: distributed-writer files (ragged subtrees) prune too") {
    val es = entries(900)
    val path = tmp("fdb_prune_dist") + "/t.db"
    FindbDistWriter.write(
      es.toDF("asset_id", "date", "timestamp", "value"),
      path, smallPage, numPartitions = 6)
    val df = spark.read.format("graft.sources.findb.FindbDataSource")
      .option("pagesPerPartition", 3).load(path)
      .where($"asset_id".isin(5L, 70L, 128L))
    assert(df.rdd.getNumPartitions <= 9)
    assert(df.as[(Long, Int, Long, Float)].collect().sorted.toSeq ===
      es.filter(e => Set(5L, 70L, 128L)(e._1)))
  }

  test("RecurrenceFold compiles under codegen (no CodegenFallback demotion)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Alias, BoundReference, GenericInternalRow}
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenFallback, GenerateUnsafeProjection}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    import graft.expressions.RecurrenceFold
    // the class contract itself: a CodegenFallback expression demotes
    // every projection that contains it to interpreted eval
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[RecurrenceFold]))
    // and the generated code must actually compile and run the recursion
    val inType = StructType(Seq(
      StructField("date", DateType), StructField("close", DoubleType),
      StructField("er", DoubleType), StructField("sc", DoubleType)))
    val arr = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](0, 100.0, null, null)),
      new GenericInternalRow(Array[Any](1, 101.0, 0.5, 0.3))))
    val fold = RecurrenceFold(BoundReference(0, ArrayType(inType), nullable = true), "kama")
    val proj = GenerateUnsafeProjection.generate(Seq(Alias(fold, "out")()))
    val out = proj(new GenericInternalRow(Array[Any](arr))).getArray(0)
    assert(out.numElements() === 2)
    assert(out.getStruct(0, 4).getDouble(3) === 100.0) // seed: kama = close
    assert(out.getStruct(1, 4).getDouble(3) === 100.3) // 100 + 0.3·(101−100)
  }

  test("asof_join_skew: time-sliced two-phase equals the plain union-sort on a Zipf-skewed panel") {
    import java.sql.Timestamp
    import graft.operators.AsOf
    // Zipf-ish skew: key 1 carries ~90% of rows; keys 2..20 the tail.
    // Rights every 7 ticks, carefully spanning slice boundaries.
    val rng = new scala.util.Random(42)
    val rows = (1 to 3000).map { i =>
      val k = if (i % 10 != 0) 1L else (i / 10 % 19 + 2).toLong
      (k, new Timestamp(1700000000000L + i * 977L), i.toLong, i * 0.5)
    }
    val left = rows.toDF("user_id", "ts", "seq", "value")
    val right = rows.filter(_._3 % 7 == 0)
      .map { case (k, t, s, v) => (k, new Timestamp(t.getTime - rng.nextInt(500)), s + 100000L, v * 2) }
      .toDF("user_id", "ts", "seq", "rvalue")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"seq", $"asof_value").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
        .sortBy(t => (t._1, t._2)).toSeq
    val plain = normalize(AsOf.asOfJoin(left, right, "user_id", Seq("value")))
    for (slices <- Seq(1, 3, 8)) {
      val sliced = normalize(
        AsOf.asOfJoinSkewSafe(left, right, "user_id", Seq("value"), slices))
      assert(sliced === plain, s"slices=$slices diverged")
    }
    // degenerate inputs: no right rows, single timestamp
    val noRight = right.where($"user_id" < 0L)
    assert(normalize(AsOf.asOfJoinSkewSafe(left, noRight, "user_id", Seq("value")))
      .forall(_._3.isEmpty))
    val oneTs = Seq((1L, new Timestamp(1700000000000L), 1L, 5.0))
      .toDF("user_id", "ts", "seq", "value")
    val oneTsR = Seq((1L, new Timestamp(1700000000000L), 2L, 9.0))
      .toDF("user_id", "ts", "seq", "rvalue")
    // strict '<': the equal-ts right row is invisible
    assert(normalize(AsOf.asOfJoinSkewSafe(oneTs, oneTsR, "user_id", Seq("value")))
      === Seq((1L, 1L, None)))
  }

  test("compactCommit resumes a swap killed halfway through") {
    import java.sql.{Date, Timestamp}
    import graft.sources.TickStore
    import org.apache.hadoop.fs.Path
    // 3 months, every asset revised with a later seq
    def panel = (1 to 300).map { i =>
      (i % 10 + 1L, Date.valueOf(f"2024-0${i % 3 + 1}%d-${i % 28 + 1}%02d"),
        new Timestamp(1700000000000L + i * 1000L), i * 1.0, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    def build(dir: String): String = {
      TickStore.write(panel, dir)
      TickStore.append(panel.withColumn("value", $"value" * 3)
        .withColumn("seq", $"seq" + 1000000L), dir)
      dir
    }
    val crashed = build(tmp("ts_mid") + "/store")
    val clean = build(tmp("ts_clean") + "/store")
    TickStore.compact(spark, clean) // the uninterrupted end state
    TickStore.compactPrepare(spark, crashed)
    // simulate dying halfway through the swap: month 2024-01 already
    // renamed in, the others untouched, manifest still present
    val fs = new Path(crashed).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(crashed, "date_month=2024-01")
    fs.delete(live, true)
    assert(fs.rename(new Path(crashed + "__compacting", "date_month=2024-01"), live))
    // read() must roll the remaining months forward and match the clean run
    def snap(dir: String) = TickStore.read(spark, dir)
      .select($"asset_id", $"date", $"ts", $"value", $"seq")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(snap(crashed) === snap(clean))
    // manifest and tmp dir are gone; a second commit is a no-op
    assert(!fs.exists(new Path(crashed + "__compact_manifest.json")))
    assert(!fs.exists(new Path(crashed + "__compacting")))
    assert(!TickStore.compactCommit(spark, crashed))
  }

  // ── wave K fixtures ────────────────────────────────────────────────
  import java.sql.{Date, Timestamp}
  private def panelOf(series: Map[Long, Seq[Double]]) =
    series.toSeq.flatMap { case (asset, vals) =>
      vals.zipWithIndex.map { case (v, i) =>
        (asset, Date.valueOf(f"2024-01-${i + 1}%02d"),
          new Timestamp(1704000000000L + i * 1000L), v, asset * 100 + i)
      }
    }.toDF("asset_id", "date", "ts", "value", "seq")

  test("rolling_corr: identical price paths correlate at exactly 1 with the market") {
    val vals = Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0)
    val out = graft.operators.Analytics
      .rollingCorr(panelOf(Map(1L -> vals, 2L -> vals)), window = 20)
      .collect()
    // both assets ARE the equal-weight market; every n>=2 frame has
    // positive variance, so corr is exactly 1 after u6
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("corr") === 1.0))
    // constant series: zero variance frames yield NULL, not a crash
    val flat = graft.operators.Analytics
      .rollingCorr(panelOf(Map(1L -> Seq(5.0, 5.0, 5.0, 5.0))), window = 20)
      .collect()
    assert(flat.forall(_.isNullAt(flat.head.fieldIndex("corr"))))
  }

  test("rolling_var: sorted-frame tail cut matches a hand computation") {
    import graft.operators.Micro.jvm6
    val vals = Seq(100.0, 101.0, 99.5, 103.0, 100.0, 104.0, 102.0, 106.0, 101.0)
    val rets = vals.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1.0) }.toVector
    val out = graft.operators.Analytics
      .rollingVar(panelOf(Map(1L -> vals)), window = 20, minN = 8)
      .collect()
    assert(out.length === 1) // only day 9 has 8 returns
    val r = out.head
    val sorted = rets.sorted
    val k = math.ceil(sorted.size * 0.25).toInt // 8 * 0.25 = 2
    assert(r.getAs[Long]("n_days") === 8L)
    assert(r.getAs[Long]("n_tail") === k.toLong)
    assert(r.getAs[Double]("var_q") === sorted(k - 1))
    assert(r.getAs[Double]("cvar") === jvm6(sorted.take(k).sum / k))
  }

  test("pairs_signal: hysteresis carries positions between entry and exit crossings") {
    val z = Seq(
      (1L, 2L, Date.valueOf("2024-01-01"), null.asInstanceOf[java.lang.Double]),
      (1L, 2L, Date.valueOf("2024-01-02"), java.lang.Double.valueOf(2.5)),
      (1L, 2L, Date.valueOf("2024-01-03"), java.lang.Double.valueOf(1.0)),
      (1L, 2L, Date.valueOf("2024-01-04"), java.lang.Double.valueOf(0.4)),
      (1L, 2L, Date.valueOf("2024-01-05"), java.lang.Double.valueOf(-2.2)),
      (1L, 2L, Date.valueOf("2024-01-06"), java.lang.Double.valueOf(-1.0)),
      (1L, 2L, Date.valueOf("2024-01-07"), java.lang.Double.valueOf(0.3)))
      .toDF("id_a", "id_b", "date", "z")
    val pos = graft.operators.Analytics.signalOverZ(z)
      .collect().map(_.getAs[Long]("pos")).toSeq
    //            null  2.5  1.0(carry)  0.4  -2.2  -1.0(carry)  0.3
    assert(pos === Seq(0L, -1L, -1L, 0L, 1L, 1L, 0L))
  }

  test("corpus_pipeline: gate then dedup then per-source token reconciliation") {
    val good = Seq.fill(10)("the quick brown fox and dog").mkString(" ") // 60 words
    val corpus = Seq(
      (1L, good, "a"), (2L, good, "a"), (5L, "short text", "a"),
      (3L, good + " extra tokens here", "b"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Pipeline.corpusPipeline(corpus).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_quality"), r.getAs[Long]("tokens_in"),
          r.getAs[Long]("n_unique"), r.getAs[Long]("tokens_unique"))).toMap
    assert(out("a") === ((3L, 2L, 122L, 1L, 60L))) // dup collapses to one rep
    assert(out("b") === ((1L, 1L, 63L, 1L, 63L)))
  }

  test("stream_rolling_var equals the batch rolling_var on a replayed feed") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 101.0, 99.5, 103.0, 100.0, 104.0, 102.0, 106.0, 101.0, 99.0, 103.5),
      2L -> Seq(50.0, 51.0, 49.0, 52.5, 50.5, 53.0, 51.5, 54.0, 52.0, 55.5)))
    val batch = graft.operators.Analytics.rollingVar(panel)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    import graft.streaming.StreamingOps
    val feed = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val streamed = graft.streaming.StreamReplay
      .replay(spark, feed, 3, maxStateRows = 2L)(StreamingOps.rollingVarStream(_))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(streamed === batch)
  }

  test("pairs_adf: an oscillating spread rejects the unit root; a trending one does not") {
    // pair (1,2): pa rides pb plus a strongly mean-reverting oscillation
    val pb1 = (0 until 12).map(i => 100.0 + 0.5 * i)
    val pa1 = pb1.zipWithIndex.map { case (v, i) =>
      v + (if (i % 2 == 0) 1.0 else -1.0) * (1.0 + 0.05 * (i % 3))
    }
    // pair (3,4): pa rides a NON-trending pb plus a steadily drifting
    // residual — OLS on pb cannot absorb the ramp, so the spread walks
    val pb2 = Seq(50.0, 50.4, 49.8, 50.6, 49.6, 50.2, 50.8, 49.4, 50.0, 50.6, 49.2, 50.4)
    val ramp = Seq(0.0, 0.3, 0.7, 1.0, 1.4, 1.7, 2.1, 2.4, 2.8, 3.1, 3.5, 3.8)
    val pa2 = pb2.zip(ramp).map { case (v, r) => 0.5 * v + r }
    val panel = panelOf(Map(1L -> pa1, 2L -> pb1, 3L -> pa2, 4L -> pb2))
    val out = graft.operators.Analytics.pairsAdf(panel, Seq((1L, 2L), (3L, 4L)))
      .collect().map(r => (r.getAs[Long]("id_a"),
        (r.getAs[Long]("n_obs"), r.getAs[Double]("t_stat"), r.getAs[Boolean]("coint_5pct"))))
      .toMap
    assert(out(1L)._1 === 12L)
    assert(out(1L)._2 < -2.86 && out(1L)._3, s"oscillating pair not cointegrated: ${out(1L)}")
    assert(!out(3L)._3, s"drifting pair wrongly cointegrated: ${out(3L)}")
  }

  test("stream_rolling_corr equals the batch rolling_corr on a replayed feed") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0, 51.0, 54.5),
      3L -> Seq(10.0, 9.8, 10.4, 10.1, 10.9, 10.5, 11.2, 10.8)))
    val batch = graft.operators.Analytics.rollingCorr(panel)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    import graft.streaming.StreamingOps
    val feed = graft.operators.Analytics.retsWithMarket(panel)
      .select($"asset_id", $"date", $"ret", $"mkt_ret")
      .as[StreamingOps.CorrTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val streamed = graft.streaming.StreamReplay
      .replay(spark, feed, 3, maxStateRows = 3L)(StreamingOps.rollingCorrStream(_))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(streamed === batch)
  }

  test("dedup_method_venn exact arm: a group of 4 identical docs emits 3 star pairs") {
    val base = "the quick brown fox jumps over the lazy dog tonight again"
    val corpus = Seq(
      (1L, base, "a"), (2L, base, "b"), (5L, base, "a"), (9L, base, "c"),
      (3L, "completely different text about market microstructure now", "a"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val r = Dedup.dedupMethodVenn(corpus).collect().head
    // star pairs from min-id 1: (1,2), (1,5), (1,9) — not the 6 all-pairs
    assert(r.getAs[Long]("n_exact") === 3L)
    assert(r.getAs[Long]("n_all_three") === 3L)
  }

  // ── wave M fixtures ────────────────────────────────────────────────

  test("trin: breadth and volume legs reconcile on a hand-built tape") {
    // day 2: asset 1 advances on 2 ticks, asset 2 declines on 1 tick,
    // asset 3 flat on 2 ticks → TRIN = (1/1)/(2/1) = 0.5
    val rows = Seq(
      (1L, Date.valueOf("2024-01-01"), new Timestamp(1704000000000L), 100.0, 1L),
      (2L, Date.valueOf("2024-01-01"), new Timestamp(1704000001000L), 50.0, 2L),
      (3L, Date.valueOf("2024-01-01"), new Timestamp(1704000002000L), 10.0, 3L),
      (1L, Date.valueOf("2024-01-02"), new Timestamp(1704086400000L), 100.5, 4L),
      (1L, Date.valueOf("2024-01-02"), new Timestamp(1704086401000L), 101.0, 5L),
      (2L, Date.valueOf("2024-01-02"), new Timestamp(1704086400000L), 48.0, 6L),
      (3L, Date.valueOf("2024-01-02"), new Timestamp(1704086400000L), 10.5, 7L),
      (3L, Date.valueOf("2024-01-02"), new Timestamp(1704086401000L), 10.0, 8L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = graft.operators.Analytics.trin(rows).collect()
    assert(out.length === 1) // day 1 has no previous close anywhere
    val r = out.head
    assert(r.getAs[Long]("n_adv") === 1L)
    assert(r.getAs[Long]("n_dec") === 1L)
    assert(r.getAs[Long]("adv_vol") === 2L)
    assert(r.getAs[Long]("dec_vol") === 1L)
    assert(r.getAs[Double]("trin") === 0.5)
  }

  test("jarque_bera matches an imperative recomputation of the folds") {
    import graft.operators.Micro.jvm6
    val vals = Seq(100.0, 103.0, 99.0, 104.5, 98.0, 106.0, 101.0, 97.5, 105.0, 100.5)
    val rets = vals.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1.0) }.toVector
    val n = rets.size.toDouble
    val s1 = rets.foldLeft(0.0)(_ + _)
    val s2 = rets.foldLeft(0.0)((a, x) => a + x * x)
    val s3 = rets.foldLeft(0.0)((a, x) => a + x * x * x)
    val s4 = rets.foldLeft(0.0)((a, x) => a + x * x * x * x)
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m
    val m4 = s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n) - 3.0 * m * m * m * m
    val g1 = m3 / (m2 * math.sqrt(m2))
    val g2 = m4 / (m2 * m2) - 3
    val jb = jvm6(n / 6.0 * (g1 * g1 + g2 * g2 / 4.0))
    val r = graft.operators.Analytics.jarqueBera(panelOf(Map(1L -> vals))).collect().head
    assert(r.getAs[Long]("n_days") === 9L)
    assert(r.getAs[Double]("skew") === jvm6(g1))
    assert(r.getAs[Double]("ex_kurt") === jvm6(g2))
    assert(r.getAs[Double]("jb") === jb)
    assert(r.getAs[Boolean]("normal_5pct") === (jb < 5.991465))
  }

  test("rolling_ols_trend: a perfect linear ramp recovers slope, fit and r2 = 1") {
    val vals = (1 to 8).map(t => 2.0 + 3.0 * t)
    val out = graft.operators.Analytics
      .rollingOlsTrend(panelOf(Map(1L -> vals)), window = 20, minN = 5)
      .collect()
    assert(out.length === 4) // frames of 5..8 points
    out.foreach { r =>
      assert(r.getAs[Double]("slope") === 3.0)
      assert(r.getAs[Double]("fitted") === r.getAs[Double]("value"))
      assert(r.getAs[Double]("r2") === 1.0)
    }
    // flat frame: slope 0 exactly, r2 NULL (Syy = 0)
    val flat = graft.operators.Analytics
      .rollingOlsTrend(panelOf(Map(1L -> Seq.fill(6)(5.0))), window = 20, minN = 5)
      .collect()
    assert(flat.forall(r => r.getAs[Double]("slope") === 0.0 &&
      r.isNullAt(r.fieldIndex("r2"))))
  }

  test("ewma_vol matches an imperative Horner recomputation") {
    import graft.operators.Micro.jvm6
    val vals = Seq(100.0, 102.0, 99.5, 103.0, 100.0, 104.0)
    val rets = vals.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1.0) }.toVector
    val expected = rets.indices.map { i =>
      val sq = rets.take(i + 1).map(x => x * x)
      var num = 0.0; var den = 0.0
      sq.foreach { x => num = num * 0.94 + x; den = den * 0.94 + 1.0 }
      jvm6(math.sqrt(num / den))
    }
    val out = graft.operators.Analytics.ewmaVol(panelOf(Map(1L -> vals)))
      .collect().map(_.getAs[Double]("ewma_vol")).toSeq
    assert(out === expected)
  }

  test("line_profile: blank share, mean and max line length on a hand corpus") {
    val corpus = Seq(
      (1L, "alpha\n\nbeta gamma", "a"),   // 3 lines, 1 blank, lens 5/0/10
      (2L, "one line only", "a"),          // 1 line, len 13
      (3L, "x\ny\nz", "b"))                // 3 lines, lens 1/1/1
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Pipeline.lineProfile(corpus)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_lines") === 4L && a.getAs[Long]("n_blank") === 1L)
    assert(a.getAs[Long]("blank_pm") === 250L)
    assert(a.getAs[Double]("mean_line_len") === 7.0) // (5+0+10+13)/4
    assert(a.getAs[Long]("max_line_len") === 13L)
    val b = out("b")
    assert(b.getAs[Long]("n_lines") === 3L && b.getAs[Long]("n_blank") === 0L)
    assert(b.getAs[Long]("max_line_len") === 1L)
  }

  test("sentence_stats: readability's sentence and word conventions roll up per source") {
    val corpus = Seq(
      (1L, "Two words. Three more words!", "a"), // 5 words, 2 sentences
      (2L, "no terminal punctuation here", "a"), // 4 words, floored to 1 sentence
      (3L, "One. Two?! Three...", "b"))          // 3 words, 3 sentence runs
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Pipeline.sentenceStats(corpus)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_words") === 9L && a.getAs[Long]("n_sentences") === 3L)
    assert(a.getAs[Double]("sentences_per_doc") === 1.5)
    assert(a.getAs[Double]("words_per_sentence") === 3.0)
    val b = out("b")
    assert(b.getAs[Long]("n_sentences") === 3L && b.getAs[Long]("n_words") === 3L)
  }

  test("stream_bollinger equals the batch bollinger on a replayed feed") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0),
      2L -> Seq(50.0, 50.0, 50.0, 50.0, 52.0, 51.0))) // flat prefix → zero-σ NULLs
    val batch = graft.operators.Analytics.bollinger(panel)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    import graft.streaming.StreamingOps
    val feed = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val streamed = graft.streaming.StreamReplay
      .replay(spark, feed, 3, maxStateRows = 2L)(StreamingOps.bollingerStream(_))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(streamed === batch)
  }

  test("stream_atr equals the batch atr on a replayed bar feed") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5)))
    val batch = graft.operators.Analytics.atr(panel)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    import graft.streaming.StreamingOps
    val feed = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val streamed = graft.streaming.StreamReplay
      .replay(spark, feed, 3, maxStateRows = 2L)(StreamingOps.atrStream(_))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(streamed === batch)
  }

  test("stream_rsi equals the batch rsi on a replayed feed") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 101.0),
      2L -> Seq(50.0, 51.0, 52.0, 53.0))) // all gains → AL = 0 → RSI 100
    val batch = graft.operators.Analytics.rsi(panel)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    import graft.streaming.StreamingOps
    val feed = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val streamed = graft.streaming.StreamReplay
      .replay(spark, feed, 3, maxStateRows = 2L)(StreamingOps.rsiStream(_))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(streamed === batch)
  }

  // ── wave N fixtures ────────────────────────────────────────────────

  test("zweig_breadth: thrust fires only after a sub-0.40 reading inside the window") {
    // 12 assets: phase 1 (days 2-4) 2 up / 10 down → ratio 1/6 < 0.40;
    // phase 2 (days 5-8) 12 up / 0 down → ratio 1, EMA climbs through 0.615
    val series = (1L to 12L).map { a =>
      val down = a > 2
      val path = Seq.tabulate(8) { i =>
        if (i == 0) 100.0
        else if (i < 4) (if (down) 100.0 - i else 100.0 + i)
        else 100.0 + i * (if (down) 0.5 else 1.0) // everyone rises in phase 2
      }
      a -> path
    }.toMap
    val out = graft.operators.Analytics.zweigBreadth(panelOf(series))
      .collect().map(r => r.getAs[java.sql.Date]("date").toString ->
        (r.getAs[Double]("ratio"), r.getAs[Boolean]("thrust"))).toMap
    assert(out("2024-01-02")._1 < 0.40 && !out("2024-01-02")._2)
    // by late phase 2 the EMA has crossed 0.615 with the sub-0.40
    // reading still inside the 10-session lookback
    assert(out("2024-01-08")._2, s"thrust did not fire: $out")
  }

  test("upside_potential matches an imperative partial-moment recomputation") {
    import graft.operators.Micro.jvm6
    val vals = Seq(100.0, 103.0, 99.0, 104.5, 98.0, 106.0, 101.0)
    val rets = vals.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1.0) }.toVector
    val n = rets.size.toDouble
    val up1 = rets.foldLeft(0.0)((a, x) => a + math.max(x, 0.0))
    val dn2 = rets.foldLeft(0.0)((a, x) => { val t = math.min(x, 0.0); a + t * t })
    val r = graft.operators.Analytics.upsidePotential(panelOf(Map(1L -> vals)))
      .collect().head
    assert(r.getAs[Long]("n_days") === 6L)
    assert(r.getAs[Double]("upside_mean") === jvm6(up1 / n))
    assert(r.getAs[Double]("downside_dev") === jvm6(math.sqrt(dn2 / n)))
    assert(r.getAs[Double]("upr") === jvm6((up1 / n) / math.sqrt(dn2 / n)))
    // an all-gains series NULLs the ratio instead of dividing by zero
    val up = graft.operators.Analytics
      .upsidePotential(panelOf(Map(1L -> Seq(100.0, 101.0, 102.0, 103.0, 104.0))))
      .collect().head
    assert(up.isNullAt(up.fieldIndex("upr")))
  }

  test("code_detect flags braces, indentation and camelCase but not prose") {
    val code = "def f(x) {\n    return g(x);\n}\n    val myVarName = callSomeFn();"
    val prose = "The market closed higher today. Breadth was strong and steady."
    val out = graft.operators.Pipeline.codeDetect(
      Seq((1L, code, "a"), (2L, prose, "a"), (3L, "", "b"))
        .toDF("doc_id", "text", "source"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("is_code"))
    assert(!out(2L).getAs[Boolean]("is_code"))
    // empty text: NULL densities, flag coalesces to false
    assert(out(3L).isNullAt(out(3L).fieldIndex("punct_pm")))
    assert(!out(3L).getAs[Boolean]("is_code"))
  }

  test("stream_macd and stream_keltner equal their batch twins on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0)))
    import graft.streaming.StreamingOps
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val macdBatch = graft.operators.Analytics.macd(panel)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val macdStream = graft.streaming.StreamReplay
      .replay(spark, daily, 3, maxStateRows = 2L)(StreamingOps.macdStream(_))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(macdStream === macdBatch)
    val keltBatch = graft.operators.Analytics.keltner(panel)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val keltStream = graft.streaming.StreamReplay
      .replay(spark, bars, 3, maxStateRows = 2L)(StreamingOps.keltnerStream(_))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(keltStream === keltBatch)
  }

  test("stream_williams_r, stream_cci and stream_ewma_vol equal their batch twins") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5))) // flat prefix → NULL %R / CCI
    import graft.streaming.StreamingOps
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(
      StreamingOps.williamsRStream(_))) ===
      norm(graft.operators.Analytics.williamsR(panel)))
    assert(norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(
      StreamingOps.cciStream(_))) ===
      norm(graft.operators.Analytics.cci(panel)))
    assert(norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(
      StreamingOps.ewmaVolStream(_))) ===
      norm(graft.operators.Analytics.ewmaVol(panel)))
  }

  // ── wave O fixtures ────────────────────────────────────────────────

  test("wave-O bar twins equal their batch ops on a replayed feed") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0))) // flat prefix edge cases
    import graft.streaming.StreamingOps
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamed[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamed(StreamingOps.mfiStream(_)) === norm(A.mfi(panel)), "mfi")
    assert(streamed(StreamingOps.cmfStream(_)) === norm(A.cmf(panel)), "cmf")
    assert(streamed(StreamingOps.forceIndexStream(_)) === norm(A.forceIndex(panel)), "fi")
    assert(streamed(StreamingOps.vortexStream(_)) === norm(A.vortex(panel)), "vortex")
    assert(streamed(StreamingOps.eomStream(_)) === norm(A.eom(panel)), "eom")
    assert(streamed(StreamingOps.awesomeOscStream(_)) === norm(A.awesomeOsc(panel)), "ao")
    assert(streamed(StreamingOps.dpoStream(_)) === norm(A.dpo(panel)), "dpo")
    assert(streamed(StreamingOps.chaikinOscStream) === norm(A.chaikinOsc(panel)), "chaikin")
  }

  test("wave-P twins equal their batch ops on a replayed feed") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0, 115.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamed[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamed(StreamingOps.aroonStream(_)) === norm(A.aroon(panel)), "aroon")
    assert(streamed(StreamingOps.choppinessStream(_)) === norm(A.choppiness(panel)), "chop")
    assert(streamed(StreamingOps.balanceOfPowerStream(_)) ===
      norm(A.balanceOfPower(panel)), "bop")
    assert(streamed(StreamingOps.qstickStream(_)) === norm(A.qstick(panel)), "qstick")
    assert(streamed(StreamingOps.rviStream(_)) === norm(A.rvi(panel)), "rvi")
    assert(streamed(StreamingOps.elderRayStream(_)) === norm(A.elderRay(panel)), "elder")
    assert(streamed(StreamingOps.trixStream(_)) === norm(A.trix(panel)), "trix")
    assert(norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(
      StreamingOps.rollingOlsTrendStream(_))) ===
      norm(A.rollingOlsTrend(panel)), "ols")
  }

  test("wave-Q twins equal their batch ops on a replayed feed") {
    // 18 bars so the lag-15 RoC family (kst) has live rows
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0, 115.0, 111.0, 118.0, 114.0, 120.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamed[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamed(StreamingOps.tsiStream(_)) === norm(A.tsi(panel)), "tsi")
    assert(streamed(StreamingOps.pvoStream(_)) === norm(A.pvo(panel)), "pvo")
    assert(streamed(StreamingOps.coppockStream(_)) === norm(A.coppock(panel)), "coppock")
    assert(streamed(StreamingOps.kstStream) === norm(A.kst(panel)), "kst")
    assert(streamed(StreamingOps.massIndexStream(_)) === norm(A.massIndex(panel)), "mass")
    assert(streamed(StreamingOps.chandelierExitStream(_)) ===
      norm(A.chandelierExit(panel)), "chandelier")
    assert(streamed(StreamingOps.adxStream(_)) === norm(A.adx(panel)), "adx")
    assert(norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(
      StreamingOps.stochRsiStream(_))) === norm(A.stochRsi(panel)), "stoch_rsi")
  }

  test("wave-R twins equal their batch ops on a replayed feed") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0, 115.0, 111.0, 118.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamed[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamed(StreamingOps.kamaStream(_)) === norm(A.kama(panel)), "kama")
    assert(streamed(StreamingOps.fisherTransformStream(_)) ===
      norm(A.fisherTransform(panel)), "fisher")
    assert(streamed(StreamingOps.demaTemaStream(_)) === norm(A.demaTema(panel)), "dema")
    assert(streamed(StreamingOps.nviPviStream) === norm(A.nviPvi(panel)), "nvi")
    assert(streamed(StreamingOps.klingerOscStream(_)) === norm(A.klingerOsc(panel)), "klinger")
    assert(streamed(StreamingOps.rwiStream(_)) === norm(A.rwi(panel)), "rwi")
    assert(streamedDaily(StreamingOps.connorsRsiStream(_)) ===
      norm(A.connorsRsi(panel)), "crsi")
    assert(streamedDaily(StreamingOps.vhfStream(_)) === norm(A.vhf(panel)), "vhf")
  }

  test("wave-S twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0, 107.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0, 50.5, 54.0, 52.5, 55.0),
      3L -> Seq(10.0, 9.8, 10.4, 10.1, 10.9, 10.5, 11.2, 10.8, 11.5, 11.0)))
    import graft.streaming.StreamingOps
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val breadth = graft.operators.Analytics.advanceDecline(panel)
      .select($"date", $"n_up", $"n_down", $"n_flat")
      .as[StreamingOps.BreadthTick].collect().toSeq
      .sortBy(_.date.getTime)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val A = graft.operators.Analytics
    assert(norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 3L)(
      StreamingOps.stcStream(_))) === norm(A.stc(panel)), "stc")
    assert(norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 3L)(
      StreamingOps.pivotPointsStream)) === norm(A.pivotPoints(panel)), "pivot")
    assert(norm(graft.streaming.StreamReplay.replay(spark, breadth, 3, maxStateRows = 1L)(
      StreamingOps.advanceDeclineStream)) === norm(A.advanceDecline(panel)), "advdec")
    assert(norm(graft.streaming.StreamReplay.replay(spark, breadth, 3, maxStateRows = 1L)(
      StreamingOps.mcclellanStream)) === norm(A.mcclellan(panel)), "mcclellan")
    assert(norm(graft.streaming.StreamReplay.replay(spark, breadth, 3, maxStateRows = 1L)(
      StreamingOps.zweigBreadthStream(_))) === norm(A.zweigBreadth(panel)), "zweig")
  }

  test("stream_stochastic equals the batch stochastic on a replayed bar feed") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5))) // flat channel → NULL %K poisons %D
    val batch = graft.operators.Analytics.stochastic(panel)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    import graft.streaming.StreamingOps
    val feed = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val streamed = graft.streaming.StreamReplay
      .replay(spark, feed, 3, maxStateRows = 2L)(StreamingOps.stochasticStream(_))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(streamed === batch)
  }

  test("wave-T indicators match imperative recomputations") {
    import graft.operators.Micro.jvm6
    val vals = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0, 107.0)
    val panel = panelOf(Map(1L -> vals))
    val A = graft.operators.Analytics
    // the index-weighted fold shared by wma/hma (weights 1..n, oldest first)
    def wmaOf(a: Vector[Double]): Double = {
      val n = a.size.toDouble
      jvm6(a.zipWithIndex.foldLeft(0.0) { case (acc, (v, i)) =>
        acc + v * (i + 1).toDouble } / (n * (n + 1) / 2.0))
    }
    def tailFrame(xs: Vector[Double], t: Int, k: Int): Vector[Double] =
      xs.slice(math.max(0, t - k + 1), t + 1)
    def ewOf(a: Vector[Double], w: Double): Double =
      jvm6(a.foldLeft(0.0)((acc, x) => acc * w + x) /
        a.foldLeft(0.0)((acc, _) => acc * w + 1.0))

    val wmaOut = A.wma(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      assert(wmaOut(t).getAs[Double]("wma") === wmaOf(vals.take(t + 1)), s"wma t=$t")
    }

    // hma: window 16 → half 8, smooth 4; each stage rounded before the next
    val wf = vals.indices.map(t => wmaOf(tailFrame(vals, t, 16))).toVector
    val wh = vals.indices.map(t => wmaOf(tailFrame(vals, t, 8))).toVector
    val raw = vals.indices.map(t => jvm6(2.0 * wh(t) - wf(t))).toVector
    val hmaExp = vals.indices.map(t => wmaOf(tailFrame(raw, t, 4))).toVector
    val hmaOut = A.hma(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      assert(hmaOut(t).getAs[Double]("raw") === raw(t), s"hma raw t=$t")
      assert(hmaOut(t).getAs[Double]("hma") === hmaExp(t), s"hma t=$t")
    }

    // demarker on single-tick bars: dmax/dmin collapse to ± daily moves
    val dmax = vals.sliding(2).map { case Seq(a, b) => jvm6(math.max(b - a, 0.0)) }.toVector
    val dmin = vals.sliding(2).map { case Seq(a, b) => jvm6(math.max(a - b, 0.0)) }.toVector
    val demOut = A.demarker(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(demOut.length === vals.size - 1)
    dmax.indices.foreach { t =>
      val sx = tailFrame(dmax, t, 14).foldLeft(0.0)(_ + _)
      val sn = tailFrame(dmin, t, 14).foldLeft(0.0)(_ + _)
      assert(demOut(t).getAs[Double]("dem") === jvm6(sx / (sx + sn)), s"dem t=$t")
    }

    // cfo: rolling-OLS forecast at the frame's last point, window 14 minN 5
    val cfoOut = A.cfo(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(cfoOut.length === vals.size - 4)
    (4 until vals.size).foreach { t =>
      val arr = tailFrame(vals, t, 14)
      val n = arr.size.toDouble
      val sx = n * (n + 1) / 2.0
      val sx2 = n * (n + 1) * (2.0 * n + 1) / 6.0
      val sy = arr.foldLeft(0.0)(_ + _)
      val sxy = arr.zipWithIndex.foldLeft(0.0) { case (acc, (v, i)) => acc + v * (i + 1).toDouble }
      val b = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
      val fitted = jvm6((sy - b * sx) / n + b * n)
      val r = cfoOut(t - 4)
      assert(r.getAs[Double]("fitted") === fitted, s"cfo fitted t=$t")
      assert(r.getAs[Double]("cfo") === jvm6(100.0 * (vals(t) - fitted) / vals(t)), s"cfo t=$t")
    }

    // smi: channel midpoint distance, double-EW (10/3/3 → w = 0.5, frames 12)
    val hh = vals.indices.map(t => tailFrame(vals, t, 10).max).toVector
    val ll = vals.indices.map(t => tailFrame(vals, t, 10).min).toVector
    val m = vals.indices.map(t => jvm6(vals(t) - (hh(t) + ll(t)) / 2)).toVector
    val hr = vals.indices.map(t => jvm6((hh(t) - ll(t)) / 2)).toVector
    val m1 = vals.indices.map(t => ewOf(tailFrame(m, t, 12), 0.5)).toVector
    val h1 = vals.indices.map(t => ewOf(tailFrame(hr, t, 12), 0.5)).toVector
    val m2 = vals.indices.map(t => ewOf(tailFrame(m1, t, 12), 0.5)).toVector
    val h2 = vals.indices.map(t => ewOf(tailFrame(h1, t, 12), 0.5)).toVector
    val smiOut = A.smi(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      val exp = if (h2(t) == 0.0) null else jvm6(100.0 * m2(t) / h2(t))
      assert((if (smiOut(t).isNullAt(smiOut(t).fieldIndex("smi"))) null
              else smiOut(t).getAs[Double]("smi")) === exp, s"smi t=$t")
    }

    // pgo: (close − SMA) / EW(TR); single-tick TR = |Δclose| (t=0 → 0)
    val trs = vals.indices.map { t =>
      if (t == 0) 0.0 else jvm6(math.abs(vals(t) - vals(t - 1))) }.toVector
    val wTr = 1.0 - 2.0 / 15.0
    val pgoOut = A.pgo(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      val sma = jvm6(tailFrame(vals, t, 14).foldLeft(0.0)(_ + _) / (t + 1).toDouble)
      val ematr = ewOf(tailFrame(trs, t, 14), wTr)
      val exp = if (ematr == 0.0) null else jvm6((vals(t) - sma) / ematr)
      assert((if (pgoOut(t).isNullAt(pgoOut(t).fieldIndex("pgo"))) null
              else pgoOut(t).getAs[Double]("pgo")) === exp, s"pgo t=$t")
    }

    // williams_ad on single-tick bars: contrib = Δclose, micro-long running sum
    val contribs = vals.sliding(2).map { case Seq(a, b) => jvm6(b - a) }.toVector
    val wadOut = A.williamsAd(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(wadOut.length === vals.size - 1)
    var acc = 0L
    contribs.indices.foreach { t =>
      acc += math.round(contribs(t) * 1e6)
      assert(wadOut(t).getAs[Double]("contrib") === contribs(t), s"wad contrib t=$t")
      assert(wadOut(t).getAs[Double]("wad") === acc.toDouble / 1e6, s"wad t=$t")
    }
  }

  test("wave-U twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0, 115.0, 111.0, 118.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamed[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamedDaily(StreamingOps.wmaStream(_)) === norm(A.wma(panel)), "wma")
    assert(streamed(StreamingOps.vwmaStream(_)) === norm(A.vwma(panel)), "vwma")
    assert(streamedDaily(StreamingOps.hmaStream(_)) === norm(A.hma(panel)), "hma")
    assert(streamed(StreamingOps.demarkerStream(_)) === norm(A.demarker(panel)), "dem")
    assert(streamedDaily(StreamingOps.cfoStream(_)) === norm(A.cfo(panel)), "cfo")
    assert(streamed(StreamingOps.smiStream(_)) === norm(A.smi(panel)), "smi")
    assert(streamed(StreamingOps.pgoStream(_)) === norm(A.pgo(panel)), "pgo")
    assert(streamed(StreamingOps.williamsAdStream) === norm(A.williamsAd(panel)), "wad")
  }

  test("wave-AA: O(1)-state running-aggregate twins equal the batch stats") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 103.0, 99.0, 104.5, 98.0, 106.0, 101.0, 97.5, 105.0, 100.5),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0)))
    import graft.streaming.StreamingOps
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def finalOf[O: org.apache.spark.sql.Encoder](ord: Seq[org.apache.spark.sql.Column])(
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) = {
      val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
        org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(op)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"asset_id").orderBy(ord.map(_.desc): _*)
      norm(sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn"))
    }
    val A = graft.operators.Analytics
    assert(finalOf(Seq($"n_days"))(StreamingOps.sharpeStream) === norm(A.sharpe(panel)), "sharpe")
    assert(finalOf(Seq($"n_days"))(StreamingOps.sortinoStream) === norm(A.sortino(panel)), "sortino")
    assert(finalOf(Seq($"n_wins" + $"n_losses"))(StreamingOps.gainLossStream) ===
      norm(A.gainLossRatio(panel)), "gl")
    assert(finalOf(Seq($"n_days"))(StreamingOps.omegaStream) === norm(A.omegaRatio(panel)), "omega")
    assert(finalOf(Seq($"n_days"))(StreamingOps.kellyStream) ===
      norm(A.kellyFraction(panel)), "kelly")
    assert(finalOf(Seq($"n_days"))(StreamingOps.retMomentsStream) ===
      norm(A.retMoments(panel)), "moments")
  }

  test("wave-Z: asi, fib_levels, dup_rate_sample and the three twins") {
    import graft.operators.Micro.jvm6
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0)))
    val A = graft.operators.Analytics
    // asi on single-tick bars: O=H=L=C=v → R1=R2=|Δ|, R3=0, R4=|prev Δ|,
    // M = Δ + 0.25·(prev Δ... ) — just spot-check the micro running sum
    val asiOut = A.asi(panel).filter($"asset_id" === 1L)
      .collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(asiOut.length === 7)
    var acc = 0L
    asiOut.foreach { r =>
      acc += math.round(r.getAs[Double]("si") * 1e6)
      assert(r.getAs[Double]("asi") === acc.toDouble / 1e6)
    }
    // day2 for asset 1: v=102, prev v=100 (first emitted row): R1=R2=2, R3=0,
    // R4=0 → R = 2 − 0.5·2 + 0.25·0 = 1; M = 2 + 0.5·0 + 0.25·0 = 2 → SI = 100
    assert(asiOut.head.getAs[Double]("si") === 100.0)

    // fib_levels: day 4 of asset 1 → frame {100,102,99,105}: hh=105, ll=99
    val fib = A.fibLevels(panel).filter($"asset_id" === 1L)
      .collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    val d4 = fib(3)
    assert(d4.getAs[Double]("ch_high") === 105.0 && d4.getAs[Double]("ch_low") === 99.0)
    assert(d4.getAs[Double]("f500") === jvm6(105.0 - 0.5 * 6.0))
    assert(d4.getAs[Double]("f236") === jvm6(105.0 - 0.236 * 6.0))

    // dup_rate_sample: 4 unique + one pair of dups → exact rate 2/6
    val docs = Seq((1L, "alpha one", "a"), (2L, "beta two", "a"), (3L, "gamma three", "a"),
      (4L, "delta four", "b"), (5L, "alpha one", "b"), (6L, "epsilon five", "b"))
      .toDF("doc_id", "text", "source")
    val dr = graft.operators.Dedup.dupRateSample(docs).collect().head
    assert(dr.getAs[Long]("n_docs") === 6L)
    assert(dr.getAs[Long]("dup_docs") === 2L)
    assert(dr.getAs[Long]("exact_dup_pm") === 333L)
    // sampled slice is content-determined: dup groups land whole
    assert(dr.getAs[Long]("dup_sampled") % 2 === 0L)

    // the three twins equal their batch ops on replayed feeds
    import graft.streaming.StreamingOps
    val bars = A.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val rets = A.dailyReturns(panel).select($"asset_id", $"date", $"ret")
    val tape = rets.join(org.apache.spark.sql.functions.broadcast(A.marketReturns(rets)), Seq("date"))
      .select($"asset_id", $"date", $"ret", $"mkt_ret")
      .as[StreamingOps.RetMktTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(
      StreamingOps.asiStream)) === norm(A.asi(panel)), "asi twin")
    assert(norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(
      StreamingOps.fibLevelsStream(_))) === norm(A.fibLevels(panel)), "fib twin")
    assert(norm(graft.streaming.StreamReplay.replay(spark, tape, 3, maxStateRows = 2L)(
      StreamingOps.rollingBetaStream(_))) === norm(A.rollingBeta(panel)), "beta twin")
  }

  test("wave-Y twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0, 115.0, 111.0, 118.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamed[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamedDaily(StreamingOps.rollingMedianStream(_)) ===
      norm(A.rollingMedian(panel)), "med")
    assert(streamedDaily(StreamingOps.rollingMomentsStream(_)) ===
      norm(A.rollingMoments(panel)), "mom")
    assert(streamed(StreamingOps.ppoStream(_)) === norm(A.ppo(panel)), "ppo")
    assert(streamed(StreamingOps.elderImpulseStream(_)) ===
      norm(A.elderImpulse(panel)), "elder")
  }

  test("wave-X risk ratios match imperative recomputations") {
    import graft.operators.Micro.jvm6
    val v1 = Vector(100.0, 103.0, 99.0, 104.5, 98.0, 106.0, 101.0, 97.5, 105.0, 100.5)
    val v2 = Vector(50.0, 50.5, 49.0, 52.0, 51.5, 53.0, 50.5, 54.0, 52.5, 55.0)
    val panel = panelOf(Map(1L -> v1, 2L -> v2))
    val A = graft.operators.Analytics
    def rets(v: Vector[Double]) =
      v.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1.0) }.toVector
    val r1 = rets(v1); val r2 = rets(v2)
    val mkt = r1.indices.map(t => jvm6((r1(t) + r2(t)) / 2.0)).toVector

    // jensen_alpha for asset 1 vs the equal-weight market
    val n = r1.size.toDouble
    val sa = r1.foldLeft(0.0)(_ + _)
    val sm = mkt.foldLeft(0.0)(_ + _)
    val sp = r1.zip(mkt).map { case (a, b) => a * b }.foldLeft(0.0)(_ + _)
    val sm2 = mkt.foldLeft(0.0)((a, x) => a + x * x)
    val sa2 = r1.foldLeft(0.0)((a, x) => a + x * x)
    val sxx = n * sm2 - sm * sm
    val sxy = n * sp - sm * sa
    val syy = n * sa2 - sa * sa
    val b = sxy / sxx
    val a = sa / n - b * (sm / n)
    val residSd = math.sqrt(math.max((syy - b * sxy) / n / (n - 2), 0.0))
    val ja = A.jensenAlpha(panel).collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(ja(1L).getAs[Long]("n_days") === 9L)
    assert(ja(1L).getAs[Double]("beta") === jvm6(b))
    assert(ja(1L).getAs[Double]("alpha") === jvm6(a))
    assert(ja(1L).getAs[Double]("resid_sd") === jvm6(residSd))
    assert(ja(1L).getAs[Double]("appraisal") === jvm6(a / residSd))

    // burke_ratio for asset 1: drawdown episodes from running peaks
    val peaks = v1.scanLeft(Double.MinValue)(math.max).tail
    val dds = v1.indices.map(t => jvm6(v1(t) / peaks(t) - 1)).toVector
    // episodes of consecutive dd<0 days; depth = min dd per episode
    val depths = {
      val eps = Vector.newBuilder[Double]
      var cur: Option[Double] = None
      dds.foreach { d =>
        if (d < 0) cur = Some(cur.fold(d)(math.min(_, d)))
        else { cur.foreach(eps += _); cur = None }
      }
      cur.foreach(eps += _)
      eps.result()
    }
    val ssq = depths.foldLeft(0.0)((acc, x) => acc + x * x)
    val meanRet = sa / n
    val bk = A.burkeRatio(panel).collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(bk(1L).getAs[Long]("n_episodes") === depths.size.toLong)
    assert(bk(1L).getAs[Double]("burke") === jvm6(meanRet / math.sqrt(ssq)))

    // kappa_three for asset 1
    val l3 = r1.map(x => math.max(-x, 0.0)).foldLeft(0.0)((acc, x) => acc + x * x * x)
    val kp = A.kappaThree(panel).collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(kp(1L).getAs[Double]("lpm3") === jvm6(l3 / n))
    assert(kp(1L).getAs[Double]("kappa3") === jvm6((sa / n) / math.cbrt(l3 / n)))

    // recovery_time: v1 day2 (99) is underwater vs peak 103, recovers day4;
    // every episode except a final unrecovered one must end pre-series-end
    val rt = A.recoveryTime(panel).filter($"asset_id" === 1L)
      .collect().sortBy(_.getAs[java.sql.Date]("start_date").getTime)
    assert(rt.nonEmpty)
    val first = rt.head
    assert(first.getAs[java.sql.Date]("start_date").toString === "2024-01-03")
    assert(first.getAs[java.sql.Date]("trough_date").toString === "2024-01-03")
    assert(first.getAs[Long]("days_to_trough") === 1L)
    assert(first.getAs[Boolean]("recovered"))
    // last value 100.5 < running peak 106 → final episode is unrecovered
    assert(!rt.last.getAs[Boolean]("recovered"))
  }

  test("wave-W twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0, 115.0, 111.0, 118.0, 114.0, 120.0, 116.0,
        122.0, 119.0, 125.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamed[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamed(StreamingOps.parkinsonStream(_)) === norm(A.parkinsonVol(panel)), "pv")
    assert(streamed(StreamingOps.garmanKlassStream(_)) === norm(A.garmanKlass(panel)), "gk")
    assert(streamed(StreamingOps.rogersSatchellStream(_)) ===
      norm(A.rogersSatchell(panel)), "rs")
    assert(streamedDaily(StreamingOps.distFromHighStream(_)) ===
      norm(A.distFromHigh(panel)), "dfh")
    assert(streamed(StreamingOps.relativeVolumeStream(_)) ===
      norm(A.relativeVolume(panel)), "rvol")
    assert(streamed(StreamingOps.trendIntensityStream(_)) ===
      norm(A.trendIntensity(panel)), "ti")
    assert(streamed(StreamingOps.accelerationStream(_)) === norm(A.acceleration(panel)), "acc")
    assert(streamedDaily(StreamingOps.volatilityRatioStream(_)) ===
      norm(A.volatilityRatio(panel)), "vrat")
  }

  test("wave-V corpus ops on a hand corpus") {
    val P = graft.operators.Pipeline
    val header = "Welcome to Example News dot com"
    val footer = "Copyright 2024 Example News Inc"
    val para = "This shared paragraph is long enough to qualify as boilerplate content."
    val doc1 = s"$header\nThe quick brown fox jumps today.\nshort\n$para\n\n$para\n\n$footer"
    val doc2 = s"$header\nAnother body line that also ends well.\n$para\n\n$footer"
    val doc3 = "Totally unique document. It has no boilerplate at all, lorem ipsum aside."
    val doc4 = "12 34.5 99% alpha beta { code }"
    val docs = Seq((1L, doc1, "a"), (2L, doc2, "a"), (3L, doc3, "b"), (4L, doc4, "b"),
      (5L, doc1, "b")) // doc5 = exact copy of doc1
      .toDF("doc_id", "text", "source")

    // c4_rules: doc3 has lorem → keep false; doc4 has brace → keep false
    val c4 = P.c4Rules(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(c4(3L).getAs[Boolean]("has_lorem") && !c4(3L).getAs[Boolean]("keep"))
    assert(c4(4L).getAs[Boolean]("has_brace") && !c4(4L).getAs[Boolean]("keep"))
    // doc1: 8 lines (two blank separators), kept = the fox line + the two paras
    assert(c4(1L).getAs[Long]("n_lines") === 8L)
    assert(c4(1L).getAs[Long]("n_kept") === 3L)

    // soft_dedup_weights: docs 1 and 5 share text → weight 0.5 each
    val w = P.softDedupWeights(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(w(1L).getAs[Long]("dup_count") === 2L && w(1L).getAs[Double]("weight") === 0.5)
    assert(w(5L).getAs[Double]("weight") === 0.5)
    assert(w(2L).getAs[Double]("weight") === 1.0)

    // boilerplate_lines: header/footer/para each hit 3 distinct docs (1,2,5)
    val bl = P.boilerplateLines(docs).collect().map(r => r.getAs[String]("line") -> r).toMap
    assert(bl.keySet === Set(header, footer, para))
    assert(bl(para).getAs[Long]("n_docs") === 3L)
    assert(bl(para).getAs[Long]("n_occ") === 5L) // 2+1+2 occurrences

    // first_line_dups: header group of 3, footer group of 3
    val fl = P.firstLineDups(docs).collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[String]("line")) -> r).toMap
    assert(fl(("header", header)).getAs[Long]("n_docs") === 3L)
    assert(fl(("header", header)).getAs[Long]("min_doc_id") === 1L)
    assert(fl(("footer", footer)).getAs[Long]("n_docs") === 3L)

    // numeric_density: doc4 = 3 numeric, 3 alpha of 8 tokens ({, } are neither)
    val nd = P.numericDensity(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(nd(4L).getAs[Long]("n_tokens") === 8L)
    assert(nd(4L).getAs[Long]("n_numeric") === 3L)
    assert(nd(4L).getAs[Long]("n_alpha") === 3L)
    assert(nd(4L).getAs[Long]("numeric_pm") === 375L)

    // paragraph_dups: doc1 has 3 qualifying paras (para ×…) — blocks split
    // on blank lines: [header+fox+short+para], [para], [footer] — only the
    // middle block is an exact cross-doc duplicate
    val pd = P.paragraphDups(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(pd(1L).getAs[Long]("n_paras") === 3L)
    assert(pd(1L).getAs[Long]("n_dup_paras") >= 1L)
    assert(pd(3L).getAs[Long]("n_paras") === 1L)
    assert(pd(3L).getAs[Long]("n_dup_paras") === 0L)
  }

  test("vwma weighs the mean by tick volume") {
    import graft.operators.Micro.jvm6
    val rows = Seq(
      (1L, Date.valueOf("2024-01-01"), new Timestamp(1704000000000L), 100.0, 1L),
      (1L, Date.valueOf("2024-01-01"), new Timestamp(1704000001000L), 102.0, 2L),
      (1L, Date.valueOf("2024-01-02"), new Timestamp(1704086400000L), 101.0, 3L),
      (1L, Date.valueOf("2024-01-03"), new Timestamp(1704172800000L), 103.0, 4L),
      (1L, Date.valueOf("2024-01-03"), new Timestamp(1704172801000L), 99.0, 5L))
      .toDF("asset_id", "date", "ts", "value", "seq")
    val out = graft.operators.Analytics.vwma(rows)
      .collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    // closes: 102 (2 ticks), 101 (1), 99 (2) — the close×volume folds:
    assert(out(0).getAs[Long]("vol_n") === 2L)
    assert(out(0).getAs[Double]("vwma") === jvm6(102.0 * 2 / 2.0))
    assert(out(1).getAs[Long]("vol_n") === 3L)
    assert(out(1).getAs[Double]("vwma") === jvm6((102.0 * 2 + 101.0) / 3.0))
    assert(out(2).getAs[Long]("vol_n") === 5L)
    assert(out(2).getAs[Double]("vwma") === jvm6((102.0 * 2 + 101.0 + 99.0 * 2) / 5.0))
  }

  test("wave-AB moving averages match imperative recomputations") {
    import graft.operators.Micro.jvm6
    val vals = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0,
      101.0, 107.0, 103.0, 112.0)
    val panel = panelOf(Map(1L -> vals))
    val A = graft.operators.Analytics
    def tailFrame(xs: Vector[Double], t: Int, k: Int): Vector[Double] =
      xs.slice(math.max(0, t - k + 1), t + 1)
    def smaOf(a: Vector[Double]): Double =
      jvm6(a.foldLeft(0.0)(_ + _) / a.size.toDouble)

    // trima (window 20): SMA(11) u6'd, then SMA(10) of that
    val sma1 = vals.indices.map(t => smaOf(tailFrame(vals, t, 11))).toVector
    val triExp = vals.indices.map(t => smaOf(tailFrame(sma1, t, 10))).toVector
    val triOut = A.trima(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      assert(triOut(t).getAs[Double]("sma1") === sma1(t), s"trima sma1 t=$t")
      assert(triOut(t).getAs[Double]("trima") === triExp(t), s"trima t=$t")
    }

    // zlema (span 20, k=9, w=0.904762): head falls back to raw close
    val dl = vals.indices.map { t =>
      val old = if (t >= 9) vals(t - 9) else vals(t)
      jvm6(2.0 * vals(t) - old)
    }.toVector
    val zlOut = A.zlema(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      val a = tailFrame(dl, t, 20)
      val exp = jvm6(a.foldLeft(0.0)((acc, x) => acc * 0.904762 + x) /
        a.foldLeft(0.0)((acc, _) => acc * 0.904762 + 1.0))
      assert(zlOut(t).getAs[Double]("dl") === dl(t), s"zlema dl t=$t")
      assert(zlOut(t).getAs[Double]("zlema") === exp, s"zlema t=$t")
    }

    // vidya (n=9, α=0.2): diffs drop the first row; v seeds at the
    // first REMAINING row and steps by the kama form
    val diffs = vals.sliding(2).map { case Seq(a, b) => b - a }.toVector
    val dvals = vals.drop(1)
    var v = dvals.head
    val vidOut = A.vidya(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(vidOut.length === dvals.size)
    dvals.indices.foreach { t =>
      val arr = tailFrame(diffs, t, 9)
      val su = arr.foldLeft(0.0)((a, x) => a + math.max(x, 0.0))
      val sd = arr.foldLeft(0.0)((a, x) => a + math.max(-x, 0.0))
      val cmo = if (su + sd == 0) 0.0 else jvm6(100.0 * (su - sd) / (su + sd))
      val sc = jvm6(0.2 * math.abs(cmo) / 100.0)
      if (t > 0) v = jvm6(v + sc * (dvals(t) - v))
      assert(vidOut(t).getAs[Double]("cmo") === cmo, s"vidya cmo t=$t")
      assert(vidOut(t).getAs[Double]("vidya") === v, s"vidya t=$t")
    }

    // mcginley (n=10, k=0.6 → kn=6): state-dependent quartic chase
    var md = vals.head
    val mcOut = A.mcginley(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      if (t > 0) {
        val r = vals(t) / md
        md = jvm6(md + (vals(t) - md) / (6.0 * (((r * r) * r) * r)))
      }
      assert(mcOut(t).getAs[Double]("mcginley") === md, s"mcginley t=$t")
    }
    // flat series: the line never moves
    val flatOut = A.mcginley(panelOf(Map(2L -> Seq(5.0, 5.0, 5.0))))
      .collect()
    assert(flatOut.forall(_.getAs[Double]("mcginley") === 5.0))

    // alma (window 9, offset .85, σ 6): u6-rounded Gaussian weights
    val alOut = A.alma(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      val a = tailFrame(vals, t, 9)
      val len = a.size.toDouble
      val m = 0.85 * (len - 1)
      val s = len / 6.0
      val ws = a.indices.map(i =>
        jvm6(math.exp((i - m) * (i - m) / (-2.0 * s * s)))).toVector
      val num = a.zip(ws).foldLeft(0.0) { case (acc, (x, w)) => acc + x * w }
      val den = ws.foldLeft(0.0)(_ + _)
      assert(alOut(t).getAs[Double]("alma") === jvm6(num / den), s"alma t=$t")
    }
  }

  test("wave-AB pattern detectors: candles, fractals, td_setup") {
    import java.sql.{Date, Timestamp}
    val A = graft.operators.Analytics
    // hand-built OHLC days via in-day tick paths (open=first, close=last)
    def day(asset: Long, d: Int, ticks: Seq[Double]) =
      ticks.zipWithIndex.map { case (v, i) =>
        (asset, Date.valueOf(f"2024-02-$d%02d"),
          new Timestamp(1706745600000L + d * 86400000L + i * 1000L), v,
          d * 100L + i)
      }
    // day 1: big red bar (o=110 h=111 l=99 c=100); day 2: bullish engulf
    // (o=99 c=112 wraps it); day 3: doji+hammer (o=c=106, low wick to 100);
    // day 4: shooting star (o=c=106, high wick to 112)
    val rows = (
      day(1L, 1, Seq(110.0, 111.0, 99.0, 100.0)) ++
      day(1L, 2, Seq(99.0, 98.0, 113.0, 112.0)) ++
      day(1L, 3, Seq(106.0, 100.0, 106.0)) ++
      day(1L, 4, Seq(106.0, 112.0, 106.0))
    ).toDF("asset_id", "date", "ts", "value", "seq")
    val cp = A.candlePatterns(rows).collect()
    assert(cp.length === 1)
    val r = cp.head
    assert(r.getAs[Long]("n_bars") === 4L)
    assert(r.getAs[Long]("n_doji") === 2L)          // days 3 and 4 (zero body)
    assert(r.getAs[Long]("n_hammer") === 1L)        // day 3
    assert(r.getAs[Long]("n_shooting_star") === 1L) // day 4
    assert(r.getAs[Long]("n_bull_engulf") === 1L)   // day 2 wraps day 1
    assert(r.getAs[Long]("n_bear_engulf") === 0L)

    // fractals on single-tick bars (high=low=close): strict local
    // extremum vs ±2 neighbors; edges are definitionally false
    val vals = Vector(100.0, 101.0, 105.0, 102.0, 101.5, 95.0, 99.0, 100.0, 98.0)
    val fr = A.fractals(panelOf(Map(1L -> vals)))
      .collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    val expHigh = vals.indices.map(t =>
      t >= 2 && t < vals.size - 2 &&
        Seq(t - 2, t - 1, t + 1, t + 2).forall(j => vals(t) > vals(j)))
    val expLow = vals.indices.map(t =>
      t >= 2 && t < vals.size - 2 &&
        Seq(t - 2, t - 1, t + 1, t + 2).forall(j => vals(t) < vals(j)))
    vals.indices.foreach { t =>
      assert(fr(t).getAs[Boolean]("fractal_high") === expHigh(t), s"fh t=$t")
      assert(fr(t).getAs[Boolean]("fractal_low") === expLow(t), s"fl t=$t")
    }
    assert(expHigh(2) && expLow(5)) // the fixture actually exercises both

    // td_setup: 9 straight closes below close[4] completes a buy setup
    val down = Vector.tabulate(14)(i => 100.0 - i) // strictly falling
    val td = A.tdSetup(panelOf(Map(1L -> down)))
      .collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    down.indices.foreach { t =>
      val exp = math.max(0, t - 3) // qualifies from bar 4 (0-based), streak grows
      assert(td(t).getAs[Long]("buy_count") === exp.toLong, s"td buy t=$t")
      assert(td(t).getAs[Long]("sell_count") === 0L, s"td sell t=$t")
      assert(td(t).getAs[Boolean]("buy_setup") === (exp == 9), s"td setup t=$t")
    }
    // direction flips reset the streak
    val zig = Vector(100.0, 101.0, 102.0, 103.0, 104.0, 103.0, 102.0, 105.0, 106.0, 107.0)
    val tdz = A.tdSetup(panelOf(Map(1L -> zig)))
      .collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    // bars 4..6: vs zig(t-4) → 104>100 up, 103>101 up, 102=102 neither;
    // bars 7..9: 105>103 up, 106>104 up, 107>103 up — streak restarts at 1
    assert(tdz(4).getAs[Long]("sell_count") === 1L)
    assert(tdz(5).getAs[Long]("sell_count") === 2L)
    assert(tdz(6).getAs[Long]("sell_count") === 0L)
    assert(tdz(7).getAs[Long]("sell_count") === 1L)
    assert(tdz(9).getAs[Long]("sell_count") === 3L)
  }

  test("wave-AC twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0, 115.0, 111.0, 118.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamedDaily(StreamingOps.trimaStream(_)) === norm(A.trima(panel)), "trima")
    assert(streamedDaily(StreamingOps.zlemaStream(_)) === norm(A.zlema(panel)), "zlema")
    assert(streamedDaily(StreamingOps.vidyaStream(_)) === norm(A.vidya(panel)), "vidya")
    assert(streamedDaily(StreamingOps.mcginleyStream(_)) === norm(A.mcginley(panel)), "mcg")
    assert(streamedDaily(StreamingOps.almaStream(_)) === norm(A.alma(panel)), "alma")
    assert(streamedDaily(StreamingOps.tdSetupStream(_)) === norm(A.tdSetup(panel)), "td")

    // census twin: update-mode final emission per asset = the batch census
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val sink = graft.streaming.StreamReplay.replay(spark, bars, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.candlePatternsStream(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy($"n_bars".desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === norm(A.candlePatterns(panel)), "candles")

    // fractal twin: sentinel-flushed delayed emission = the batch rows
    val fracFeed = bars.map(b => StreamingOps.FractalTick(
      b.asset_id, b.date, b.high, b.low, real = true)) ++
      bars.groupBy(_.asset_id).toSeq.flatMap { case (a, bs) =>
        val last = bs.map(_.date.getTime).max
        Seq(1, 2).map(i => StreamingOps.FractalTick(
          a, new java.sql.Date(last + i * 86400000L),
          Double.NaN, Double.NaN, real = false))
      }.sortBy(t => (t.date.getTime, t.asset_id))
    val frOut = graft.streaming.StreamReplay.replay(spark, fracFeed, 3,
      maxStateRows = 2L)(StreamingOps.fractalsStream(_))
    assert(norm(frOut) === norm(A.fractals(panel)), "fractals")
  }

  test("wave-AD gates and clocks match imperative recomputations") {
    import graft.operators.Micro.jvm6
    val A = graft.operators.Analytics
    val vals = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0,
      101.0, 107.0)
    val panel = panelOf(Map(1L -> vals))
    def tailFrame(xs: Vector[Double], t: Int, k: Int): Vector[Double] =
      xs.slice(math.max(0, t - k + 1), t + 1)
    def smaOf(a: Vector[Double]): Double =
      jvm6(a.foldLeft(0.0)(_ + _) / a.size.toDouble)

    // ravi: two fold means, pct spread
    val rOut = A.ravi(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      val sf = smaOf(tailFrame(vals, t, 7))
      val ss = smaOf(tailFrame(vals, t, 65))
      assert(rOut(t).getAs[Double]("ravi") === jvm6(100.0 * math.abs(sf - ss) / ss), s"ravi t=$t")
    }

    // rmi: 5-day momentum diffs through the rsi horner pair
    val rmiOut = A.rmi(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(rmiOut.length === vals.size - 5)
    val ds = (5 until vals.size).map(t => jvm6(vals(t) - vals(t - 5))).toVector
    val w14 = 13.0 / 14.0
    ds.indices.foreach { t =>
      val arr = tailFrame(ds, t, 14)
      val g = arr.foldLeft(0.0)((a, x) => a * w14 + math.max(x, 0.0))
      val l = arr.foldLeft(0.0)((a, x) => a * w14 + math.max(-x, 0.0))
      val exp = if (l == 0) 100.0
        else math.floor((100.0 - 100.0 / (1.0 + g / l)) * 10000.0 + 0.5) / 10000.0
      assert(rmiOut(t).getAs[Double]("rmi") === exp, s"rmi t=$t")
    }

    // durbin_watson on a strictly alternating series: returns alternate
    // sign so DW sits far above 2
    val dwOut = A.durbinWatson(panel).collect()
    assert(dwOut.length === 1)
    val rets = vals.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1) }.toVector
    val num = rets.sliding(2).map { case Seq(a, b) => b - a }
      .foldLeft(0.0)((acc, d) => acc + d * d)
    val den = rets.foldLeft(0.0)((acc, r) => acc + r * r)
    assert(dwOut.head.getAs[Long]("n_rets") === rets.size.toLong)
    assert(dwOut.head.getAs[Double]("dw") === jvm6(num / den))

    // dollar_bars: 500-notional clock on the micro grid — hand fixture
    val db = A.dollarBars(panelOf(Map(1L -> Vector(200.0, 200.0, 150.0, 400.0, 100.0))))
      .collect().sortBy(_.getAs[Long]("bar_id"))
    // cum_prev: 0, 200, 400, 550, 950 → bar ids 0,0,0,1,1
    assert(db.length === 2)
    assert(db(0).getAs[Long]("n_ticks") === 3L)
    assert(db(0).getAs[Double]("open") === 200.0)
    assert(db(0).getAs[Double]("close") === 150.0)
    assert(db(0).getAs[Double]("notional") === 550.0)
    assert(db(1).getAs[Long]("n_ticks") === 2L)
    assert(db(1).getAs[Double]("notional") === 500.0)

    // squeeze: constant closes with nonzero range never squeeze (sd=0 <
    // 1.5·tr_mean is TRUE → squeeze_on), trending series compute both legs
    val sqOut = A.squeeze(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(sqOut.length === vals.size - 1)
    (1 until vals.size).foreach { t =>
      val arr = tailFrame(vals, t, 20)
      val n = arr.size.toDouble
      val s = arr.foldLeft(0.0)(_ + _)
      val s2 = arr.foldLeft(0.0)((a, x) => a + x * x)
      val sd = jvm6(math.sqrt(math.max((n * s2 - s * s) / (n * (n - 1)), 0.0)))
      // single-tick bars: tr = |Δclose| (first bar high−low = 0)
      val trs = (0 to t).map(i =>
        if (i == 0) 0.0 else jvm6(math.abs(vals(i) - vals(i - 1)))).toVector
      val trMean = jvm6(tailFrame(trs, t, 20).foldLeft(0.0)(_ + _) / n)
      val r = sqOut(t - 1)
      assert(r.getAs[Double]("sd") === sd, s"squeeze sd t=$t")
      assert(r.getAs[Double]("tr_mean") === trMean, s"squeeze tr t=$t")
      assert(r.getAs[Boolean]("squeeze_on") === (2.0 * sd < 1.5 * trMean), s"squeeze t=$t")
    }

    // vzo: single-tick bars → |signed_vol| = 1, sign = close direction
    val vzOut = A.vzo(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(vzOut.length === vals.size - 1)
    val svs = vals.sliding(2).map { case Seq(a, b) =>
      if (b > a) 1.0 else if (b < a) -1.0 else 0.0 }.toVector
    svs.indices.foreach { t =>
      val sa = tailFrame(svs, t, 14)
      val num = sa.foldLeft(0.0)((a, x) => a * w14 + x)
      val den = sa.foldLeft(0.0)((a, _) => a * w14 + 1.0)
      assert(vzOut(t).getAs[Double]("vzo") === jvm6(100.0 * num / den), s"vzo t=$t")
    }

    // diversification_ratio: two identical assets → market = each asset,
    // mean_vol = port_vol, DR = 1
    val dr = A.diversificationRatio(panelOf(Map(
      1L -> Vector(100.0, 102.0, 99.0, 105.0, 103.0),
      2L -> Vector(100.0, 102.0, 99.0, 105.0, 103.0)))).collect()
    assert(dr.length === 1)
    assert(dr.head.getAs[Long]("n_assets") === 2L)
    assert(dr.head.getAs[Long]("n_dates") === 4L)
    assert(dr.head.getAs[Double]("div_ratio") === 1.0)
  }

  test("wave-AE twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0, 115.0, 111.0, 118.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    def streamedBars[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamedDaily(StreamingOps.raviStream(_)) === norm(A.ravi(panel)), "ravi")
    assert(streamedBars(StreamingOps.vzoStream(_)) === norm(A.vzo(panel)), "vzo")
    assert(streamedDaily(StreamingOps.rmiStream(_)) === norm(A.rmi(panel)), "rmi")
    assert(streamedBars(StreamingOps.squeezeStream(_)) === norm(A.squeeze(panel)), "sq")

    // update-mode DW: final emission per asset = the batch row
    val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.durbinWatsonStream)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy($"n_rets".desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === norm(A.durbinWatson(panel)), "dw")

    // dollar bars: sentinel-flushed notional clock = the batch bars
    val ticks = panel
      .select($"asset_id", $"ts", $"value", $"seq".cast("long").as("seq"),
        org.apache.spark.sql.functions.lit(true).as("real"))
      .as[StreamingOps.NotionalTick].collect().toSeq
      .sortBy(t => (t.ts.getTime, t.seq, t.asset_id))
    val sentinels = ticks.groupBy(_.asset_id).toSeq.map { case (a, ts) =>
      StreamingOps.NotionalTick(a,
        new java.sql.Timestamp(ts.map(_.ts.getTime).max + 86400000L),
        0.0, Long.MaxValue, real = false)
    }.sortBy(_.asset_id)
    val dbOut = graft.streaming.StreamReplay.replay(spark, ticks ++ sentinels, 3,
      maxStateRows = 2L)(StreamingOps.dollarBarsStream(_))
    assert(norm(dbOut) === norm(A.dollarBars(panel)), "dollar_bars")
  }

  test("wave-AF oscillators and risk stats match imperative recomputations") {
    import graft.operators.Micro.jvm6
    val A = graft.operators.Analytics
    val vals = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0,
      101.0, 107.0, 103.0, 112.0)
    val panel = panelOf(Map(1L -> vals))
    def tailFrame(xs: Vector[Double], t: Int, k: Int): Vector[Double] =
      xs.slice(math.max(0, t - k + 1), t + 1)

    // cog: mirrored triangle weights, newest weight 1
    val cogOut = A.cog(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      val a = tailFrame(vals, t, 10)
      val n = a.size
      val num = a.zipWithIndex.foldLeft(0.0) { case (acc, (v, j)) =>
        acc + v * (n - j).toDouble }
      val den = a.foldLeft(0.0)(_ + _)
      assert(cogOut(t).getAs[Double]("cog") === jvm6(-num / den), s"cog t=$t")
    }

    // camarilla: lag-only band arithmetic; first bar NULL
    val camOut = A.camarillaPivots(panel).collect()
      .sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(camOut.head.isNullAt(camOut.head.fieldIndex("r4")))
    (1 until vals.size).foreach { t =>
      val (ph, pl, pc) = (vals(t - 1), vals(t - 1), vals(t - 1)) // single-tick bars
      val rng = ph - pl
      assert(camOut(t).getAs[Double]("r4") === jvm6(pc + rng * 0.55), s"cam r4 t=$t")
      assert(camOut(t).getAs[Double]("s3") === jvm6(pc - rng * 0.275), s"cam s3 t=$t")
    }

    // chande_kroll: single-tick bars → TR = |Δclose|, channel = price extremes
    val cksOut = A.chandeKrollStop(panel).collect()
      .sortBy(_.getAs[java.sql.Date]("date").getTime)
    val trs = vals.indices.map(t =>
      if (t == 0) 0.0 else jvm6(math.abs(vals(t) - vals(t - 1)))).toVector
    val hs0s = vals.indices.map { t =>
      val fr = tailFrame(trs, t, 10)
      val atr = jvm6(fr.foldLeft(0.0)((a, v) => a * 0.9 + v) /
        fr.foldLeft(0.0)((a, _) => a * 0.9 + 1.0))
      jvm6(tailFrame(vals, t, 10).max - 1.0 * atr)
    }.toVector
    val ls0s = vals.indices.map { t =>
      val fr = tailFrame(trs, t, 10)
      val atr = jvm6(fr.foldLeft(0.0)((a, v) => a * 0.9 + v) /
        fr.foldLeft(0.0)((a, _) => a * 0.9 + 1.0))
      jvm6(tailFrame(vals, t, 10).min + 1.0 * atr)
    }.toVector
    vals.indices.foreach { t =>
      assert(cksOut(t).getAs[Double]("stop_short") === tailFrame(hs0s, t, 9).max, s"cks ss t=$t")
      assert(cksOut(t).getAs[Double]("stop_long") === tailFrame(ls0s, t, 9).min, s"cks sl t=$t")
    }

    // intraday_intensity: single-tick bars are flat → contrib 0, ii 0
    val iiOut = A.intradayIntensity(panel).collect()
    assert(iiOut.forall(_.getAs[Double]("ii_pct") === 0.0))

    // expectancy: hand panel with known win/loss split
    val expOut = A.expectancy(panelOf(Map(1L -> Vector(100.0, 110.0, 99.0, 99.0, 108.9)))).collect()
    assert(expOut.length === 1)
    val r = expOut.head
    // rets: +0.1, -0.1, 0, +0.1 → 2 wins, 1 loss, 1 flat
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Long]("n_wins") === 2L)
    assert(r.getAs[Long]("n_losses") === 1L)
    assert(r.getAs[Double]("avg_win") === 0.1)
    assert(r.getAs[Double]("avg_loss") === 0.1)
    assert(r.getAs[Double]("expectancy") === jvm6(2.0 / 4.0 * 0.1 - 1.0 / 4.0 * 0.1))

    // cdar: k = ceil(n·0.05) worst drawdowns
    val cdarOut = A.cdar(panel).collect()
    assert(cdarOut.length === 1)
    val dds = {
      var peak = Double.MinValue
      vals.map { v => peak = math.max(peak, v); jvm6(v / peak - 1) }
    }
    val sorted = dds.sorted
    val k = math.ceil(vals.size * 0.05).toInt
    assert(cdarOut.head.getAs[Long]("n_tail") === k.toLong)
    assert(cdarOut.head.getAs[Double]("dar") === sorted(k - 1))
    assert(cdarOut.head.getAs[Double]("cdar") ===
      jvm6(sorted.take(k).foldLeft(0.0)(_ + _) / k.toDouble))
  }

  test("wave-AG twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0, 115.0, 111.0, 118.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    def streamedBars[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamedDaily(StreamingOps.cogStream(_)) === norm(A.cog(panel)), "cog")
    assert(streamedBars(StreamingOps.camarillaStream(_)) ===
      norm(A.camarillaPivots(panel)), "cam")
    assert(streamedBars(StreamingOps.chandeKrollStream(_)) ===
      norm(A.chandeKrollStop(panel)), "cks")
    assert(streamedBars(StreamingOps.intradayIntensityStream(_)) ===
      norm(A.intradayIntensity(panel)), "ii")
    val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.expectancyStream)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy($"n_days".desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === norm(A.expectancy(panel)), "expectancy")
  }

  test("wave-AH filters match imperative recomputations") {
    import graft.operators.Micro.jvm6
    val A = graft.operators.Analytics
    val vals = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0,
      101.0, 107.0, 103.0, 112.0)
    val panel = panelOf(Map(1L -> vals))
    def tailFrame(xs: Vector[Double], t: Int, k: Int): Vector[Double] =
      xs.slice(math.max(0, t - k + 1), t + 1)

    // laguerre_rsi: replay the γ=0.5 cascade by hand
    val lrOut = A.laguerreRsi(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    var (p0, p1, p2, p3) = (vals.head, vals.head, vals.head, vals.head)
    assert(lrOut.head.isNullAt(lrOut.head.fieldIndex("lrsi")))
    (1 until vals.size).foreach { t =>
      val l0 = jvm6(0.5 * vals(t) + 0.5 * p0)
      val l1 = jvm6(-0.5 * l0 + p0 + 0.5 * p1)
      val l2 = jvm6(-0.5 * l1 + p1 + 0.5 * p2)
      val l3 = jvm6(-0.5 * l2 + p2 + 0.5 * p3)
      val cu = math.max(l0 - l1, 0.0) + math.max(l1 - l2, 0.0) + math.max(l2 - l3, 0.0)
      val cd = math.max(l1 - l0, 0.0) + math.max(l2 - l1, 0.0) + math.max(l3 - l2, 0.0)
      val exp = if (cu + cd == 0) null else jvm6(cu / (cu + cd))
      assert((if (lrOut(t).isNullAt(lrOut(t).fieldIndex("lrsi"))) null
              else lrOut(t).getAs[Double]("lrsi")) === exp, s"lrsi t=$t")
      p0 = l0; p1 = l1; p2 = l2; p3 = l3
    }

    // super_smoother: two-pole IIR with the u6 driver coefficients
    val (c1, c2, c3) = A.superSmootherCoeffs(10)
    val ssOut = A.superSmoother(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    var (s1, s2) = (vals(1), vals(0))
    assert(ssOut(0).getAs[Double]("ss") === vals(0))
    assert(ssOut(1).getAs[Double]("ss") === vals(1))
    (2 until vals.size).foreach { t =>
      val ss = jvm6(c1 * ((vals(t) + vals(t - 1)) / 2.0) + c2 * s1 + c3 * s2)
      assert(ssOut(t).getAs[Double]("ss") === ss, s"ss t=$t")
      s2 = s1; s1 = ss
    }

    // t3: six chained EW stages + the exact v=0.7 polynomial
    def ewOf(a: Vector[Double]): Double =
      jvm6(a.foldLeft(0.0)((acc, x) => acc * 0.666667 + x) /
        a.foldLeft(0.0)((acc, _) => acc * 0.666667 + 1.0))
    def stage(xs: Vector[Double]): Vector[Double] =
      xs.indices.map(t => ewOf(tailFrame(xs, t, 20))).toVector
    val e1 = stage(vals); val e2 = stage(e1); val e3 = stage(e2)
    val e4 = stage(e3); val e5 = stage(e4); val e6 = stage(e5)
    val t3Out = A.t3(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    vals.indices.foreach { t =>
      val exp = jvm6(-0.343 * e6(t) + 2.499 * e5(t) + -6.069 * e4(t) + 4.913 * e3(t))
      assert(t3Out(t).getAs[Double]("t3") === exp, s"t3 t=$t")
    }

    // arch_test: autocorr of squared returns + LM = n·ρ²
    val rets = vals.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1) }.toVector
    val xs = rets.map(r => jvm6(r * r))
    val xa = xs.dropRight(1); val ya = xs.drop(1)
    val n = xa.size.toDouble
    val sx = xa.foldLeft(0.0)(_ + _); val sy = ya.foldLeft(0.0)(_ + _)
    val sxy = xa.zip(ya).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
    val sx2 = xa.foldLeft(0.0)((a, x) => a + x * x)
    val sy2 = ya.foldLeft(0.0)((a, x) => a + x * x)
    val den = math.sqrt(math.max(n * sx2 - sx * sx, 0.0)) *
      math.sqrt(math.max(n * sy2 - sy * sy, 0.0))
    val rho = jvm6((n * sxy - sx * sy) / den)
    val atOut = A.archTest(panel).collect()
    assert(atOut.length === 1)
    assert(atOut.head.getAs[Long]("n_pairs") === xa.size.toLong)
    assert(atOut.head.getAs[Double]("rho") === rho)
    assert(atOut.head.getAs[Double]("lm") === jvm6(n * rho * rho))

    // cdc_chunks: boundaries are content-local — inserting a token
    // early shifts only its own chunk's hash, not the tail chunks'
    val P = graft.expressions.PortableHash
    def hashOf(s: String) = P.strHash(s, 0, s.length)
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val edited = "zzz " + base
    val docs = Seq((1L, "web", base), (2L, "web", edited))
      .toDF("doc_id", "source", "text")
    val out = graft.operators.Pipeline.cdcChunks(docs).collect()
    val h1 = out.filter(_.getLong(0) == 1L).map(_.getAs[Long]("chunk_hash")).toSet
    val h2 = out.filter(_.getLong(0) == 2L).map(_.getAs[Long]("chunk_hash")).toSet
    // every chunk after the first boundary is shared verbatim
    assert((h1 intersect h2).nonEmpty, "CDC must preserve tail chunks across a head edit")
    // hand-check chunk 0 of doc 1: tokens up to (and incl.) the first boundary
    val toks = base.split("\\s+").toVector
    val cutIdx = toks.indexWhere(tk => hashOf(tk) % 16 == 0)
    val expN = if (cutIdx < 0) toks.size else cutIdx + 1
    val c0 = out.filter(r => r.getLong(0) == 1L && r.getAs[Long]("chunk_id") == 0L).head
    assert(c0.getAs[Long]("n_tokens") === expN.toLong)
    assert(c0.getAs[Long]("chunk_hash") === hashOf(toks.take(expN).mkString(" ")))
  }

  test("wave-AI twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 109.0, 115.0, 111.0, 118.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamedDaily(StreamingOps.laguerreRsiStream(_)) ===
      norm(A.laguerreRsi(panel)), "lrsi")
    assert(streamedDaily(StreamingOps.superSmootherStream(_)) ===
      norm(A.superSmoother(panel)), "ss")
    assert(streamedDaily(StreamingOps.t3Stream(_)) === norm(A.t3(panel)), "t3")
    val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.archTestStream)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy($"n_pairs".desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === norm(A.archTest(panel)), "arch")
  }

  test("wave-AJ unit-root pair, decycler, zigzag, cdc_dedup") {
    import graft.operators.Micro.jvm6
    val A = graft.operators.Analytics
    val vals = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0,
      101.0, 107.0, 103.0, 112.0)
    val panel = panelOf(Map(1L -> vals))

    // decycler: replay the zero-seeded high-pass by hand
    val (k0, c2, c3) = A.highpassCoeffs(20)
    val dcOut = A.ehlersDecycler(panel).collect()
      .sortBy(_.getAs[java.sql.Date]("date").getTime)
    var (h1, h2) = (0.0, 0.0)
    vals.indices.foreach { t =>
      val hp =
        if (t <= 1) 0.0
        else jvm6(k0 * ((vals(t) - 2.0 * vals(t - 1)) + vals(t - 2)) + c2 * h1 + c3 * h2)
      assert(dcOut(t).getAs[Double]("hp") === hp, s"hp t=$t")
      assert(dcOut(t).getAs[Double]("decycler") === jvm6(vals(t) - hp), s"dc t=$t")
      h2 = h1; h1 = hp
    }

    // zigzag on a crafted two-swing path (th 5%)
    val zz = Vector(100.0, 103.0, 106.0, 100.0, 96.0, 101.0, 104.0)
    val zzOut = A.zigzag(panelOf(Map(1L -> zz))).collect()
      .sortBy(_.getAs[java.sql.Date]("date").getTime)
    // bar 2: 106 ≥ 100·1.05 → the FIRST breach picks the up leg and
    // confirms the initial LOW at 100
    assert(zzOut(2).getAs[Long]("pivot_kind") === -1L)
    assert(zzOut(2).getAs[Double]("pivot") === 100.0)
    assert(zzOut(2).getAs[Long]("dir") === 1L)
    assert(zzOut(2).getAs[Double]("ext") === 106.0)
    // bar 3: 100 ≤ 106·0.95=100.7 → confirms HIGH at 106, leg flips down
    assert(zzOut(3).getAs[Long]("pivot_kind") === 1L)
    assert(zzOut(3).getAs[Double]("pivot") === 106.0)
    assert(zzOut(3).getAs[Long]("dir") === -1L)
    // bar 4: 96 just ratchets the down leg — no pivot
    assert(zzOut(4).isNullAt(zzOut(4).fieldIndex("pivot")))
    assert(zzOut(4).getAs[Double]("ext") === 96.0)
    // bar 5: 101 ≥ 96·1.05=100.8 → confirms LOW at 96, leg flips up
    assert(zzOut(5).getAs[Long]("pivot_kind") === -1L)
    assert(zzOut(5).getAs[Double]("pivot") === 96.0)
    assert(zzOut(5).getAs[Long]("dir") === 1L)

    // adf_test: OLS of Δp on p₋₁, fixed IEEE sequence
    val xa = vals.dropRight(1)
    val ya = vals.sliding(2).map { case Seq(a, b) => b - a }.toVector
    val n = xa.size.toDouble
    val sx = xa.foldLeft(0.0)(_ + _); val sy = ya.foldLeft(0.0)(_ + _)
    val sxy = xa.zip(ya).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
    val sx2 = xa.foldLeft(0.0)((a, x) => a + x * x)
    val sy2 = ya.foldLeft(0.0)((a, x) => a + x * x)
    val den = n * sx2 - sx * sx
    val beta = (n * sxy - sx * sy) / den
    val alpha = (sy - beta * sx) / n
    val sse = math.max(sy2 - alpha * sy - beta * sxy, 0.0)
    val se = math.sqrt(sse / (n - 2) * n / den)
    val adfOut = A.adfTest(panel).collect()
    assert(adfOut.length === 1)
    assert(adfOut.head.getAs[Long]("n_obs") === xa.size.toLong)
    assert(adfOut.head.getAs[Double]("beta") === jvm6(beta))
    assert(adfOut.head.getAs[Double]("adf_t") === jvm6(beta / se))

    // kpss_test: prefix-sum statistic over demeaned returns
    val rets = vals.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1) }.toVector
    val mu = jvm6(rets.foldLeft(0.0)(_ + _) / rets.size)
    val ea = rets.map(_ - mu)
    val s2hat = ea.foldLeft(0.0)((a, x) => a + x * x) / rets.size
    val ssum = (1 to ea.size).map(k => ea.take(k).foldLeft(0.0)(_ + _))
      .foldLeft(0.0)((a, s) => a + s * s)
    val kOut = A.kpssTest(panel).collect()
    assert(kOut.length === 1)
    assert(kOut.head.getAs[Double]("kpss") ===
      jvm6(ssum / (rets.size.toDouble * rets.size * s2hat)))

    // cdc_dedup: two docs sharing their tail chunks report shared mass
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, "web", base), (2L, "web", "zzz " + base),
      (3L, "web", "entirely different words only here"))
      .toDF("doc_id", "source", "text")
    val dd = graft.operators.Pipeline.cdcDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_shared")).toMap
    assert(dd(1L) > 0L, "doc 1 shares tail chunks with its edited copy")
    assert(dd(3L) === 0L, "unrelated doc shares nothing")
  }

  test("wave-AK twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 103.0, 106.0, 100.0, 96.0, 101.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamedDaily(StreamingOps.decyclerStream(_)) ===
      norm(A.ehlersDecycler(panel)), "decycler")
    assert(streamedDaily(StreamingOps.zigzagStream(_)) === norm(A.zigzag(panel)), "zz")
    val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.adfTestStream)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy($"n_obs".desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === norm(A.adfTest(panel)), "adf")
  }

  test("wave-AL filters and robust-trend stats match imperative recomputations") {
    import graft.operators.Micro.jvm6
    val A = graft.operators.Analytics
    val vals = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0)
    val panel = panelOf(Map(1L -> vals))

    // kalman: replay predict/correct; the gain decays toward steady state
    val kOut = A.kalmanTrend(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    var (lvl, p) = (vals.head, 1.0)
    assert(kOut.head.getAs[Double]("level") === vals.head)
    assert(kOut.head.isNullAt(kOut.head.fieldIndex("gain")))
    (1 until vals.size).foreach { t =>
      val pp = p + 0.01
      val g = jvm6(pp / (pp + 1.0))
      lvl = jvm6(lvl + g * (vals(t) - lvl))
      p = jvm6((1.0 - g) * pp)
      assert(kOut(t).getAs[Double]("gain") === g, s"kal gain t=$t")
      assert(kOut(t).getAs[Double]("level") === lvl, s"kal level t=$t")
    }
    // gain strictly decreases toward the Riccati fixed point
    val gains = (1 until vals.size).map(t => kOut(t).getAs[Double]("gain"))
    assert(gains.sliding(2).forall { case Seq(a, b) => b <= a })

    // holt: (level, trend) recursion + forecast
    val hOut = A.holtWinters(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    var (hl, htr) = (vals.head, 0.0)
    assert(hOut.head.getAs[Double]("forecast") === jvm6(vals.head + 0.0))
    (1 until vals.size).foreach { t =>
      val lNew = jvm6(0.3 * vals(t) + (1.0 - 0.3) * (hl + htr))
      htr = jvm6(0.1 * (lNew - hl) + (1.0 - 0.1) * htr)
      hl = lNew
      assert(hOut(t).getAs[Double]("level") === hl, s"holt l t=$t")
      assert(hOut(t).getAs[Double]("trend") === htr, s"holt b t=$t")
      assert(hOut(t).getAs[Double]("forecast") === jvm6(hl + htr), s"holt f t=$t")
    }

    // theil_sen: median of pairwise slopes, lower middle on even counts
    val slopes = (for {
      j <- vals.indices; i <- 0 until j
    } yield jvm6((vals(j) - vals(i)) / (j - i).toDouble)).sorted
    val tsOut = A.theilSen(panel).collect()
    assert(tsOut.head.getAs[Long]("n_pairs") === slopes.size.toLong)
    assert(tsOut.head.getAs[Double]("ts_slope") === slopes((slopes.size + 1) / 2 - 1))

    // mann_kendall: monotone series → S = n(n-1)/2, Z > 0
    val mono = Vector.tabulate(10)(i => 100.0 + i)
    val mkOut = A.mannKendall(panelOf(Map(1L -> mono))).collect()
    val m = mono.size
    val expS = m * (m - 1) / 2
    assert(mkOut.head.getAs[Long]("s_stat") === expS.toLong)
    val varS = (m.toLong * (m - 1) * (2 * m + 5)).toDouble / 18.0
    assert(mkOut.head.getAs[Double]("z") === jvm6((expS - 1).toDouble / math.sqrt(varS)))

    // psych_line: all-up series pins at 1000‰
    val plOut = A.psychLine(panelOf(Map(1L -> mono))).collect()
    assert(plOut.length === m - 1)
    assert(plOut.forall(_.getAs[Long]("psych_pm") === 1000L))
    // mixed series: hand-count the 12-frame
    val plv = A.psychLine(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    val ups = vals.sliding(2).map { case Seq(a, b) => if (b > a) 1L else 0L }.toVector
    ups.indices.foreach { t =>
      val fr = ups.slice(math.max(0, t - 11), t + 1)
      assert(plv(t).getAs[Long]("n_up") === fr.sum, s"pl t=$t")
      assert(plv(t).getAs[Long]("psych_pm") === 1000L * fr.sum / fr.size, s"pl pm t=$t")
    }
  }

  test("wave-AM twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamedDaily(StreamingOps.kalmanStream(_)) ===
      norm(A.kalmanTrend(panel)), "kalman")
    assert(streamedDaily(StreamingOps.holtStream(_)) ===
      norm(A.holtWinters(panel)), "holt")
    assert(streamedDaily(StreamingOps.psychLineStream(_)) ===
      norm(A.psychLine(panel)), "psych")
  }

  test("wave-AN factor/filter/impact ops match imperative recomputations") {
    import graft.operators.Micro.{jvm6, jvm12}
    val A = graft.operators.Analytics

    // renko: size = 2% of first close; continuation 1 brick, reversal 2
    val rv = Vector(100.0, 102.5, 106.0, 99.0, 97.9, 101.9, 102.1)
    val rOut = A.renko(panelOf(Map(1L -> rv))).collect()
      .sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(rOut.head.getAs[Long]("size_micro") === 2000000L)
    var (anchor, dir, cum) = (100000000L, 0L, 0L)
    val size = 2000000L
    rv.indices.drop(1).foreach { t =>
      val m = math.floor(rv(t) * 1e6 + 0.5).toLong
      val upThr = if (dir == -1L) 2 * size else size
      val dnThr = if (dir == 1L) 2 * size else size
      var delta = 0L
      if (m >= anchor + upThr) { val k = (m - anchor) / size; anchor += k * size; dir = 1; delta = k }
      else if (m <= anchor - dnThr) { val k = (anchor - m) / size; anchor -= k * size; dir = -1; delta = -k }
      cum += delta
      assert(rOut(t).getAs[Long]("n_bricks") === delta, s"renko delta t=$t")
      assert(rOut(t).getAs[Long]("cum_bricks") === cum, s"renko cum t=$t")
      assert(rOut(t).getAs[Long]("dir") === dir, s"renko dir t=$t")
      assert(rOut(t).getAs[Double]("anchor") === anchor / 1e6, s"renko anchor t=$t")
    }
    // the path above must exercise both a multi-brick move and a reversal
    assert(rOut.map(_.getAs[Long]("n_bricks")).exists(_ >= 2L))
    assert(rOut.map(_.getAs[Long]("dir")).distinct.sorted === Seq(-1L, 0L, 1L))

    // garch: constant causal seed then the ω+αr²+βσ² recursion
    val gv = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0)
    val gOut = A.garchFilter(panelOf(Map(1L -> gv))).collect()
      .sortBy(_.getAs[java.sql.Date]("date").getTime)
    val rets = gv.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1) }.toVector
    var s = 2.0e-5
    assert(gOut.head.getAs[Double]("sigma2") === s)
    (1 until rets.size).foreach { t =>
      s = jvm12(1.0e-6 + 0.05 * rets(t - 1) * rets(t - 1) + 0.90 * s)
      assert(gOut(t).getAs[Double]("sigma2") === s, s"garch s t=$t")
      assert(gOut(t).getAs[Double]("vol") === jvm6(math.sqrt(s)), s"garch v t=$t")
    }

    // fama_macbeth + quintile_spread: 6 assets, engineered cross-section
    val fmPanel = panelOf((1L to 6L).map { a =>
      // per-asset drift a% per day → x (lagged ret) orders assets 1..6
      a -> Seq.tabulate(4)(i => 100.0 * math.pow(1.0 + a / 100.0, i))
    }.toMap)
    val fm = A.famaMacbeth(fmPanel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    // dates with both ret and lagged ret: days 3 and 4 → 2 gamma rows
    assert(fm.length === 2)
    assert(fm.forall(_.getAs[Long]("n_assets") === 6L))
    assert(fm.forall(_.getAs[Long]("n_dates") === 2L))
    // constant-growth assets: x == y per asset (both = its drift on the
    // u6 grid) → the cross-sectional slope of y on x is exactly 1
    fm.foreach { r =>
      assert(math.abs(r.getAs[Double]("slope") - 1.0) < 2e-6, s"fm slope $r")
    }
    val qs = A.quintileSpread(fmPanel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(qs.length === 2)
    qs.foreach { r =>
      // ranks 1..6 → quintiles 0,0,1,2,3,4: bottom = assets {1,2}, top = {6}
      assert(r.getAs[Long]("n_assets") === 6L)
      assert(math.abs(r.getAs[Double]("top_mean") - 0.06) < 2e-6)
      assert(math.abs(r.getAs[Double]("bot_mean") - 0.015) < 2e-6)
      assert(math.abs(r.getAs[Double]("spread") - 0.045) < 4e-6)
    }

    // info_discreteness: 3 up days, 1 down, positive total → sign +1
    val iv = Vector(100.0, 104.0, 102.0, 105.0, 108.0)
    val io = A.infoDiscreteness(panelOf(Map(1L -> iv))).collect()
    assert(io.length === 1)
    assert(io.head.getAs[Long]("n_rets") === 4L)
    assert(io.head.getAs[Long]("n_pos") === 3L)
    assert(io.head.getAs[Long]("n_neg") === 1L)
    assert(io.head.getAs[Long]("sign") === 1L)
    assert(io.head.getAs[Double]("id") === jvm6(1.0 * (1.0 - 3.0) / 4.0))

    // hasbrouck_lambda: replay the √-flow OLS imperatively (1 tick/day
    // ⇒ side = carried tick-rule sign across days)
    val hv = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0)
    val hOut = A.hasbrouckLambda(panelOf(Map(1L -> hv))).collect()
    val sides = hv.sliding(2).map { case Seq(a, b) => math.signum(b - a).toInt }
      .toVector.scanLeft(0) { case (c, d) => if (d != 0) d else c }.drop(1)
    val xs = sides.zipWithIndex.map { case (sd, i) => sd.toDouble * math.sqrt(hv(i + 1)) }
    val ys = hv.sliding(2).map { case Seq(a, b) => jvm6(b - a) }.toVector
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sx2 = xs.map(x => x * x).sum
    val expected = jvm6((n * sxy - sx * sy) / (n * sx2 - sx * sx))
    assert(hOut.length === 1)
    assert(hOut.head.getAs[Long]("n_days") === xs.size.toLong)
    assert(math.abs(hOut.head.getAs[Double]("hasbrouck_lambda") - expected) < 2e-6)
  }

  test("wave-AO twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.5, 106.0, 99.0, 97.9, 101.9, 102.1, 104.3, 100.2),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    def streamedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, daily, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamedDaily(StreamingOps.renkoStream(_)) === norm(A.renko(panel)), "renko")
    assert(streamedDaily(StreamingOps.garchStream(_)) ===
      norm(A.garchFilter(panel)), "garch")

    // ibs twin needs real intraday ranges: 3 ticks per (asset, day)
    val ticks = Seq(
      (1L, "2024-02-01", Seq(100.0, 103.0, 101.0)),
      (1L, "2024-02-02", Seq(101.0, 99.0, 100.5)),
      (1L, "2024-02-03", Seq(100.5, 100.5, 100.5)), // flat day
      (2L, "2024-02-01", Seq(50.0, 52.0, 51.0)),
      (2L, "2024-02-02", Seq(51.0, 48.0, 49.0))
    ).flatMap { case (a, dstr, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        (a, java.sql.Date.valueOf(dstr),
          new java.sql.Timestamp(java.sql.Timestamp.valueOf(dstr + " 10:00:00").getTime + i * 60000L),
          v, a * 1000 + i)
      }
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val batchIbs = norm(A.ibs(ticks))
    val bars = A.dailyBars(ticks)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val sink = graft.streaming.StreamReplay.replay(spark, bars, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.ibsStream(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy($"n_days".desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === batchIbs, "ibs")
  }

  test("wave-AP pivots/anchored-vwap/pacf/es ops match imperative recomputations") {
    import graft.operators.Micro.jvm6
    val A = graft.operators.Analytics
    val vals = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0,
      101.0, 107.0, 103.0, 112.0)
    val panel = panelOf(Map(1L -> vals))

    // woodie: 1-tick days → high=low=close=open=value
    val wOut = A.woodiePivots(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    assert(wOut.head.isNullAt(wOut.head.fieldIndex("p")))
    (1 until vals.size).foreach { t =>
      val v = vals(t - 1)
      val p = jvm6((v + v + 2.0 * v) / 4)
      assert(wOut(t).getAs[Double]("p") === p, s"woodie p t=$t")
      assert(wOut(t).getAs[Double]("r1") === jvm6(2.0 * p - v), s"woodie r1 t=$t")
      assert(wOut(t).getAs[Double]("r2") === jvm6(p + 0.0), s"woodie r2 t=$t")
    }

    // demark: flat prev bar (open==close) → X = H+L+2C = 4v
    val dOut = A.demarkPivots(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    (1 until vals.size).foreach { t =>
      val v = vals(t - 1)
      assert(dOut(t).getAs[Double]("p") === jvm6(v), s"demark p t=$t")
      assert(dOut(t).getAs[Double]("r1") === jvm6(2.0 * v - v), s"demark r1 t=$t")
    }

    // anchored_vwap: single month, 1 tick/day → MTD mean at cent grid
    val avOut = A.anchoredVwap(panel).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    var cum = 0L
    vals.indices.foreach { t =>
      cum += math.round(vals(t) * 100)
      assert(avOut(t).getAs[Long]("n_ticks_mtd") === (t + 1).toLong, s"av n t=$t")
      assert(avOut(t).getAs[Double]("avwap") === (cum / (t + 1)).toDouble / 100.0, s"av t=$t")
    }
    // month reset: 40 days spans two months → the anchor restarts
    val longPanel = (0 until 40).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      (1L, java.sql.Date.valueOf(d),
        new java.sql.Timestamp(1704000000000L + i * 1000L), 100.0 + i, 100L + i)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val avLong = A.anchoredVwap(longPanel).collect()
    val months = avLong.map(_.getAs[java.sql.Date]("month").toString).distinct.sorted
    assert(months.length === 2)
    val feb1 = avLong.filter(_.getAs[java.sql.Date]("month").toString == months(1))
      .minBy(_.getAs[java.sql.Date]("date").getTime)
    assert(feb1.getAs[Long]("n_ticks_mtd") === 1L, "anchor restarts on month roll")

    // pacf: AR-free white-ish check — an exactly linear price path has
    // perfectly autocorrelated LEVELS but the return series is nearly
    // constant; instead verify vs a direct Durbin-Levinson replay.
    val pOut = A.pacf(panel).collect()
    assert(pOut.length === 1)
    val rets = vals.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1) }.toVector
    val mu = jvm6(rets.foldLeft(0.0)(_ + _) / rets.size)
    val da = rets.map(_ - mu)
    val c0 = da.foldLeft(0.0)((a, x) => a + x * x)
    val r = (1 to 5).map(k =>
      jvm6((k until da.size).foldLeft(0.0)((a, i) => a + da(i) * da(i - k)) / c0)).toVector
    (1 to 5).foreach(k => assert(pOut.head.getAs[Double](s"r$k") === r(k - 1), s"acf r$k"))
    val phi11 = r(0)
    val phi22 = jvm6((r(1) - phi11 * r(0)) / (1 - phi11 * r(0)))
    val phi21 = jvm6(phi11 - phi22 * phi11)
    val phi33 = jvm6((r(2) - phi21 * r(1) - phi22 * r(0)) /
      (1 - phi21 * r(0) - phi22 * r(1)))
    assert(pOut.head.getAs[Double]("pacf1") === phi11)
    assert(pOut.head.getAs[Double]("pacf2") === phi22)
    assert(pOut.head.getAs[Double]("pacf3") === phi33)

    // es_backtest: tiny window so violations exist deterministically
    val esOut = A.esBacktest(panel, window = 4, q = 0.25).collect()
    assert(esOut.length === 1)
    val k = 1 // ceil(4 * 0.25)
    val frames = rets.indices.collect { case t if t >= 4 =>
      val arr = rets.slice(t - 4, t).sorted
      (rets(t), arr.head, jvm6(arr.take(k).sum / k))
    }
    val viols = frames.filter { case (ret, varQ, _) => ret < varQ }
    assert(esOut.head.getAs[Long]("n_days") === frames.size.toLong)
    assert(esOut.head.getAs[Long]("n_viol") === viols.size.toLong)
    if (viols.nonEmpty) {
      val mvr = jvm6(viols.map(_._1).sum / viols.size)
      val mpe = jvm6(viols.map(_._3).sum / viols.size)
      assert(esOut.head.getAs[Double]("mean_viol_ret") === mvr)
      assert(esOut.head.getAs[Double]("mean_pred_es") === mpe)
      assert(esOut.head.getAs[Double]("es_ratio") === jvm6(mvr / mpe))
    }
  }

  test("wave-AP twins equal their batch ops on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0),
      2L -> Seq(50.0, 50.0, 50.0, 51.0, 49.5, 52.0, 50.5)))
    import graft.streaming.StreamingOps
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val bars = graft.operators.Analytics.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    def streamedBars[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    val A = graft.operators.Analytics
    assert(streamedBars(StreamingOps.woodieStream(_)) ===
      norm(A.woodiePivots(panel)), "woodie")
    assert(streamedBars(StreamingOps.demarkStream(_)) ===
      norm(A.demarkPivots(panel)), "demark")

    // anchored vwap twin: per-tick emissions reduced to day-final
    val ticks = panel
      .select($"asset_id", $"date", $"value", $"seq")
      .as[StreamingOps.DatedTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.seq, t.asset_id))
    val sink = graft.streaming.StreamReplay.replay(spark, ticks, 3, maxStateRows = 2L)(
      StreamingOps.anchoredVwapStream)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id", $"date").orderBy($"n_ticks_mtd".desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === norm(A.anchoredVwap(panel)), "avwap")
  }

  test("wave-AQ running twins equal their batch aggregates on replayed feeds") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0, 50.0, 54.0, 52.5, 55.0,
        53.5, 56.0)))
    import graft.streaming.StreamingOps
    val A = graft.operators.Analytics
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

    // return + market tape (the retMktFeed shape)
    val rets = A.dailyReturns(panel).select($"asset_id", $"date", $"ret")
    val feed = rets
      .join(org.apache.spark.sql.functions.broadcast(A.marketReturns(rets)), Seq("date"))
      .select($"asset_id", $"date", $"ret", $"mkt_ret")
      .as[StreamingOps.RetMktTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def finalized[O: org.apache.spark.sql.Encoder](ord: String)(
        op: org.apache.spark.sql.Dataset[StreamingOps.RetMktTick] =>
          org.apache.spark.sql.Dataset[O]) = {
      val sink = graft.streaming.StreamReplay.replay(spark, feed, 3,
        org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(op)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"asset_id").orderBy(org.apache.spark.sql.functions.col(ord).desc)
      norm(sink.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn"))
    }
    assert(finalized("n_days")(StreamingOps.betaStream) === norm(A.beta(panel)), "beta")
    assert(finalized("n_days")(StreamingOps.treynorStream) ===
      norm(A.treynor(panel)), "treynor")
    assert(finalized("n_days")(StreamingOps.jensenAlphaStream) ===
      norm(A.jensenAlpha(panel)), "jensen")
    assert(finalized("n_days")(StreamingOps.informationRatioStream) ===
      norm(A.informationRatio(panel)), "ir")

    // daily-tick twins
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def finalizedDaily[O: org.apache.spark.sql.Encoder](ord: String)(
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) = {
      val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
        org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(op)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"asset_id").orderBy(org.apache.spark.sql.functions.col(ord).desc)
      norm(sink.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn"))
    }
    assert(finalizedDaily("n_rets")(StreamingOps.infoDiscretenessStream) ===
      norm(A.infoDiscreteness(panel)), "id")
    // tail-risk rings need > window returns: widen with a longer panel
    val longVals = Vector.tabulate(30)(i => 100.0 + (i % 7) - 0.5 * (i % 3))
    val lp = (0 until 30).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      (1L, java.sql.Date.valueOf(d),
        new java.sql.Timestamp(1704000000000L + i * 1000L), longVals(i), 100L + i)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val lpDaily = graft.operators.KeyValue.lwwDaily(lp)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def finalizedLp[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) = {
      val sink = graft.streaming.StreamReplay.replay(spark, lpDaily, 3,
        org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 1L)(op)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"asset_id").orderBy($"n_days".desc)
      norm(sink.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn"))
    }
    assert(finalizedLp(StreamingOps.varBacktestStream(_)) ===
      norm(A.varBacktest(lp)), "varbt")
    assert(finalizedLp(StreamingOps.esBacktestStream(_)) ===
      norm(A.esBacktest(lp)), "esbt")
    // and the violation path actually fires on this panel
    assert(A.varBacktest(lp).collect().head.getAs[Long]("n_viol") > 0L)
  }

  test("wave-AR keyness and island reversals match hand constructions") {
    val A = graft.operators.Analytics

    // island: engineered gaps — day idx2 range [110,112] sits above
    // day1 high 101 and day3 high 103 → top island at day 2
    val ticks = Seq(
      (1L, "2024-03-01", 100.0, 101.0), (1L, "2024-03-02", 110.0, 112.0),
      (1L, "2024-03-03", 102.0, 103.0), (1L, "2024-03-04", 101.0, 102.5),
      // bottom island at day 3 of asset 2: [40,41] below 45 and 46
      (2L, "2024-03-01", 50.0, 52.0), (2L, "2024-03-02", 45.0, 48.0),
      (2L, "2024-03-03", 40.0, 41.0), (2L, "2024-03-04", 46.0, 47.0)
    ).flatMap { case (a, d, lo, hi) =>
      Seq((a, java.sql.Date.valueOf(d),
        java.sql.Timestamp.valueOf(d + " 10:00:00"), lo, a * 1000),
        (a, java.sql.Date.valueOf(d),
          java.sql.Timestamp.valueOf(d + " 11:00:00"), hi, a * 1000 + 1))
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val isl = A.islandReversals(ticks).collect()
    assert(isl.length === 2)
    val top = isl.find(_.getLong(0) == 1L).get
    assert(top.getAs[String]("kind") === "top")
    assert(top.getAs[java.sql.Date]("date").toString === "2024-03-02")
    val bot = isl.find(_.getLong(0) == 2L).get
    assert(bot.getAs[String]("kind") === "bottom")
    assert(bot.getAs[java.sql.Date]("date").toString === "2024-03-03")

    // island stream twin: same rows, one bar of intrinsic latency
    import graft.streaming.StreamingOps
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val bars = A.dailyBars(ticks)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val streamed = norm(graft.streaming.StreamReplay
      .replay(spark, bars, 3, maxStateRows = 2L)(StreamingOps.islandReversalStream(_)))
    assert(streamed === norm(A.islandReversals(ticks)), "island twin")

    // keyness: a token appearing ONLY in one source dominates its top-k
    val docs = Seq(
      (1L, "web", "alpha alpha beta gamma"),
      (2L, "web", "alpha beta beta delta"),
      (3L, "book", "omega omega omega beta"),
      (4L, "book", "omega gamma delta beta")
    ).toDF("doc_id", "source", "text")
    val kt = graft.operators.Pipeline.keynessTerms(docs, k = 3).collect()
    val bookTop = kt.filter(_.getAs[String]("source") == "book")
      .minBy(_.getAs[Long]("rank"))
    assert(bookTop.getAs[String]("tok") === "omega")
    assert(bookTop.getAs[Long]("n_in_source") === 4L)
    val webTop = kt.filter(_.getAs[String]("source") == "web")
      .minBy(_.getAs[Long]("rank"))
    assert(webTop.getAs[String]("tok") === "alpha")
    // ranks are dense 1..k per source
    kt.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted === (1L to rows.length).toSeq)
    }
  }

  test("wave-AS nav/variance ops match imperative recomputations") {
    import graft.operators.Micro.jvm6
    val A = graft.operators.Analytics

    // rebalance_nav: two months, two assets with constant drifts
    val lp = (for {
      (a, drift) <- Seq((1L, 0.01), (2L, 0.02))
      i <- 0 until 40
    } yield {
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      (a, java.sql.Date.valueOf(d),
        new java.sql.Timestamp(1704000000000L + i * 1000L),
        100.0 * math.pow(1.0 + drift, i), a * 1000 + i)
    }).toDF("asset_id", "date", "ts", "value", "seq")
    val rn = A.rebalanceNav(lp).collect().sortBy(_.getAs[java.sql.Date]("week").getTime)
    // replay: group return days into Monday-truncated weeks, per-asset
    // prod1p gross (ONE rounding at the end — the seqFold contract),
    // equal-weight mean per week, chain the factors (one rounding at
    // the end of the chain fold)
    val weekOf = (i: Int) => {
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      d.`with`(java.time.DayOfWeek.MONDAY)
    }
    val weeks = (1 until 40).groupBy(weekOf).toSeq.sortBy(_._1.toEpochDay)
    assert(rn.length === weeks.length)
    assert(rn.forall(_.getAs[Long]("n_assets") === 2L))
    val wg = weeks.map { case (_, days) =>
      val gs = Seq(0.01, 0.02).map(dr =>
        jvm6(days.foldLeft(1.0)((acc, _) => acc * (1.0 + dr))))
      jvm6(gs.foldLeft(0.0)(_ + _) / 2.0)
    }
    rn.zip(wg).zipWithIndex.foreach { case ((row, g), i) =>
      assert(row.getAs[Double]("week_gross") === g, s"week gross $i")
    }
    val navs = wg.scanLeft(1.0)((acc, g) => acc * (1.0 + (g - 1))).drop(1).map(jvm6)
    // NOTE: the navarr fold rounds once per ROW (each row folds its own
    // prefix array fully unrounded) — replay each prefix independently
    rn.zipWithIndex.foreach { case (row, i) =>
      val nav = jvm6(wg.take(i + 1).foldLeft(1.0)((acc, g) => acc * (1.0 + (g - 1))))
      assert(row.getAs[Double]("nav") === nav, s"nav $i")
    }
    assert(navs.nonEmpty)

    // variance_decomposition: identical assets → beta 1, idio 0
    val vals = Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0)
    val panel = panelOf(Map(1L -> vals, 2L -> vals))
    val vd = A.varianceDecomposition(panel).collect()
    assert(vd.length === 2)
    vd.foreach { r =>
      assert(r.getAs[Double]("beta") === 1.0)
      assert(r.getAs[Double]("var_idio_bp") === 0.0)
      assert(r.getAs[Double]("sys_share") === 1.0)
      assert(r.getAs[Double]("var_total_bp") === r.getAs[Double]("var_sys_bp"))
    }

    // vol_target_nav: replay the overlay imperatively on one asset
    val hv = Vector.tabulate(30)(i => 100.0 + (i % 7) - 0.5 * (i % 3))
    val vp = (0 until 30).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      (1L, java.sql.Date.valueOf(d),
        new java.sql.Timestamp(1704000000000L + i * 1000L), hv(i), 100L + i)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val vt = A.volTargetNav(vp).collect().sortBy(_.getAs[java.sql.Date]("date").getTime)
    val rets = hv.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1) }.toVector
    var nav = 1.0
    val expRows = rets.indices.collect { case t if t >= 20 =>
      val arr = rets.slice(t - 20, t)
      val s1 = arr.foldLeft(0.0)(_ + _)
      val s2 = arr.foldLeft(0.0)((a, x) => a + x * x)
      val vol = jvm6(math.sqrt(math.max((20.0 * s2 - s1 * s1) / (20.0 * (20.0 - 1)), 0.0)))
      val lev = if (vol == 0.0) 3.0 else jvm6(math.min(3.0, 0.01 / vol))
      val sret = jvm6(lev * rets(t))
      nav = jvm6(nav * (1.0 + sret))
      (vol, lev, sret, nav)
    }
    assert(vt.length === expRows.size)
    vt.zip(expRows).zipWithIndex.foreach { case ((row, (vol, lev, sret, nv)), i) =>
      assert(row.getAs[Double]("vol") === vol, s"vol $i")
      assert(row.getAs[Double]("lev") === lev, s"lev $i")
      assert(row.getAs[Double]("strat_ret") === sret, s"sret $i")
      assert(row.getAs[Double]("nav") === nv, s"nav $i")
    }

    // variance decomposition stream twin
    import graft.streaming.StreamingOps
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val rets2 = A.dailyReturns(panel).select($"asset_id", $"date", $"ret")
    val feed = rets2
      .join(org.apache.spark.sql.functions.broadcast(A.marketReturns(rets2)), Seq("date"))
      .select($"asset_id", $"date", $"ret", $"mkt_ret")
      .as[StreamingOps.RetMktTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val sink = graft.streaming.StreamReplay.replay(spark, feed, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.varianceDecompositionStream)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy($"n_days".desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === norm(A.varianceDecomposition(panel)), "vd twin")
  }

  test("wave-AT tail dependence and pattern entropy match hand constructions") {
    import graft.operators.Micro.jvm6
    val A = graft.operators.Analytics

    // tail_dependence: a market of two mirrored assets — the asset that
    // IS the market's down leg has lambda_lower = 1 against it
    val vals = Vector.tabulate(21)(i => 100.0 + (i % 5) * 2 - (i % 3) * 3)
    val panel = panelOf(Map(1L -> vals, 2L -> vals))
    val td = A.tailDependence(panel).collect()
    assert(td.length === 2)
    td.foreach { r =>
      // identical assets: the market equals each asset's return series,
      // so joint tail = market tail exactly on both sides
      assert(r.getAs[Double]("lambda_lower") === 1.0, r.toString)
      assert(r.getAs[Double]("lambda_upper") === 1.0, r.toString)
      assert(r.getAs[Long]("n_joint_lo") === r.getAs[Long]("n_mkt_lo"))
      assert(r.getAs[Long]("k") === math.ceil(r.getAs[Long]("n_days") * 0.1).toLong)
    }

    // pattern_entropy: strictly alternating up/down → only 2 of 8
    // patterns appear (010 and 101), each with ~half the mass
    val alt = Vector.tabulate(20)(i => if (i % 2 == 0) 100.0 else 102.0)
    val pe = A.patternEntropy(panelOf(Map(1L -> alt))).collect()
    assert(pe.length === 1)
    assert(pe.head.getAs[Long]("n_patterns") === 2L)
    val n = pe.head.getAs[Long]("n_triplets")
    val c1 = n / 2 + n % 2 // codes alternate; counts split by parity
    val c2 = n / 2
    val expected = jvm6(math.log(n.toDouble) -
      (c2.toDouble * math.log(c2.toDouble) + c1.toDouble * math.log(c1.toDouble)) / n.toDouble)
    // fold order is ascending code; verify against both orderings being
    // equal here (two terms, addition of two products — same sum)
    assert(math.abs(pe.head.getAs[Double]("entropy") - expected) < 2e-6)

    // stream twin
    import graft.streaming.StreamingOps
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.patternEntropyStream(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy($"n_triplets".desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === norm(A.patternEntropy(panel)), "pe twin")
  }

  test("wave-AU hurst_dfa matches an imperative DFA replay") {
    import graft.operators.Micro.jvm6
    val A = graft.operators.Analytics
    val vals = Vector.tabulate(25)(i => 100.0 + 3 * math.sin(i * 1.7) + (i % 5))
    val out = A.hurstDfa(panelOf(Map(1L -> vals))).collect()
    assert(out.length === 1)

    // imperative replay of the exact pipeline
    val rets = vals.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1) }.toVector
    val rm = rets.map(r => math.floor(r * 1e6 + 0.5).toLong)
    val mu = math.floor(rm.sum.toDouble / rm.size.toDouble).toLong
    val ya = rm.scanLeft(0L)((acc, m) => acc + (m - mu)).drop(1)
      .map(_.toDouble / 1e6)
    def fOf(s: Int): Double = {
      val b = ya.size / s
      val xbar = (s + 1) / 2.0
      val sxx = s.toDouble * (s.toDouble * s - 1) / 12.0
      val total = (0 until b).foldLeft(0.0) { (acc, j) =>
        val sy = (1 to s).foldLeft(0.0)((a, i) => a + ya(j * s + i - 1))
        val syy = (1 to s).foldLeft(0.0)((a, i) => a + ya(j * s + i - 1) * ya(j * s + i - 1))
        val siy = (1 to s).foldLeft(0.0)((a, i) => a + i.toDouble * ya(j * s + i - 1))
        acc + ((syy - (sy * sy) / s.toDouble) -
          ((siy - xbar * sy) * (siy - xbar * sy)) / sxx)
      }
      jvm6(math.sqrt(math.max(total, 0.0) / (b.toDouble * s.toDouble)))
    }
    assert(out.head.getAs[Long]("n_rets") === rets.size.toLong)
    assert(out.head.getAs[Double]("f4") === fOf(4))
    assert(out.head.getAs[Double]("f8") === fOf(8))
    val alpha = jvm6((math.log(fOf(8)) - math.log(fOf(4))) /
      (math.log(8.0) - math.log(4.0)))
    assert(math.abs(out.head.getAs[Double]("dfa_alpha") - alpha) < 2e-6)

    // histories below 16 returns are skipped, not fabricated
    assert(A.hurstDfa(panelOf(Map(1L -> vals.take(10)))).collect().isEmpty)
  }

  test("wave-AV findb merge resolves collisions by input priority") {
    import spark.implicits._
    val dir = tmp("fdb_merge")
    val a = Seq((1L, 20240101, 10L, 1.0f), (1L, 20240101, 11L, 2.0f),
      (2L, 20240102, 12L, 3.0f))
    val b = Seq((1L, 20240101, 11L, 20.0f), (3L, 20240103, 13L, 30.0f))
    FindbDistWriter.write(a.toDF("asset_id", "date", "timestamp", "value"),
      s"$dir/a.db", smallPage, numPartitions = 2)
    FindbDistWriter.write(b.toDF("asset_id", "date", "timestamp", "value"),
      s"$dir/b.db", smallPage, numPartitions = 1)
    FindbDistWriter.merge(spark, Seq(s"$dir/a.db", s"$dir/b.db"),
      s"$dir/m.db", smallPage, numPartitions = 2)
    val got = readBack(s"$dir/m.db")
    // the (1, 20240101, 11) collision takes b's value; everything else unions
    assert(got === Seq((1L, 20240101, 10L, 1.0f), (1L, 20240101, 11L, 20.0f),
      (2L, 20240102, 12L, 3.0f), (3L, 20240103, 13L, 30.0f)))
  }

  test("wave-AV calendar/streak twins equal their batch aggregates") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0, 113.0, 111.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0, 50.0)))
    import graft.streaming.StreamingOps
    val A = graft.operators.Analytics
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def finalized[O: org.apache.spark.sql.Encoder](keys: Seq[String], ord: String)(
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) = {
      val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
        org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(op)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(org.apache.spark.sql.functions.col): _*)
        .orderBy(org.apache.spark.sql.functions.col(ord).desc)
      norm(sink.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn"))
    }
    assert(finalized(Seq("asset_id", "dow"), "n_days")(
      StreamingOps.dowSeasonalityStream(_)) === norm(A.dowSeasonality(panel)), "dow")
    assert(finalized(Seq("asset_id", "month"), "n_days")(
      StreamingOps.monthlySeasonalityStream(_)) ===
      norm(A.monthlySeasonality(panel)), "month")
    assert(finalized(Seq("asset_id"), "n_up_days")(
      StreamingOps.streaksStream(_)) === norm(A.streaks(panel)), "streaks")
  }

  test("wave-AW microstructure/distribution twins equal their batch ops") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0, 50.0)))
    import graft.streaming.StreamingOps
    val A = graft.operators.Analytics
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val bars = A.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    def streamedBars[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.OhlcStreamBar] =>
          org.apache.spark.sql.Dataset[O]) =
      norm(graft.streaming.StreamReplay.replay(spark, bars, 3, maxStateRows = 2L)(op))
    assert(streamedBars(StreamingOps.amihudStream(_)) === norm(A.amihud(panel)), "amihud")
    assert(streamedBars(StreamingOps.corwinSchultzStream(_)) ===
      norm(A.corwinSchultz(panel)), "cs")

    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def finalizedDaily[O: org.apache.spark.sql.Encoder](ord: String)(
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) = {
      val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
        org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(op)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"asset_id").orderBy(org.apache.spark.sql.functions.col(ord).desc)
      norm(sink.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn"))
    }
    assert(finalizedDaily("n_pairs")(StreamingOps.rollSpreadStream(_)) ===
      norm(A.rollSpread(panel)), "roll")
    assert(finalizedDaily("n_pairs")(StreamingOps.autocorrStream(_)) ===
      norm(A.autocorr(panel)), "ac")
    assert(finalizedDaily("n_days")(StreamingOps.jarqueBeraStream(_)) ===
      norm(A.jarqueBera(panel)), "jb")
  }

  test("wave-AX gap/vol-of-vol/ulcer twins equal their batch ops") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0, 50.0)))
    import graft.streaming.StreamingOps
    val A = graft.operators.Analytics
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val bars = A.dailyBars(panel)
      .select($"asset_id", $"date", $"open", $"high", $"low", $"close", $"n_ticks")
      .as[StreamingOps.OhlcStreamBar].collect().toSeq
      .sortBy(b => (b.date.getTime, b.asset_id))
    val gapSink = graft.streaming.StreamReplay.replay(spark, bars, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.gapStatsStream(_))
    val gw = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy($"n_days".desc)
    val gapFin = gapSink.withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(gw))
      .filter($"rn" === 1).drop("rn")
    assert(norm(gapFin) === norm(A.gapStats(panel)), "gap")

    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val vovSink = graft.streaming.StreamReplay.replay(spark, daily, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.volOfVolStream(_))
    val vovFin = vovSink.withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(gw))
      .filter($"rn" === 1).drop("rn")
    assert(norm(vovFin) === norm(A.volOfVol(panel)), "vov")

    val streamedUlcer = norm(graft.streaming.StreamReplay
      .replay(spark, daily, 3, maxStateRows = 2L)(StreamingOps.ulcerStream(_)))
    assert(streamedUlcer === norm(A.ulcerIndex(panel)), "ulcer")
  }

  test("wave-AY half-life/runs/underwater twins equal their batch ops") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0, 50.0)))
    import graft.streaming.StreamingOps
    val A = graft.operators.Analytics
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def finalizedDaily[O: org.apache.spark.sql.Encoder](ord: org.apache.spark.sql.Column)(
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) = {
      val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
        org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(op)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"asset_id").orderBy(ord.desc)
      norm(sink.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn"))
    }
    assert(finalizedDaily($"n_obs")(StreamingOps.halfLifeStream(_)) ===
      norm(A.halfLife(panel)), "hl")
    assert(finalizedDaily($"n_pos" + $"n_neg")(StreamingOps.runsTestStream(_)) ===
      norm(A.runsTest(panel)), "runs")
    assert(finalizedDaily($"n_days")(StreamingOps.underwaterDurationStream(_)) ===
      norm(A.underwaterDuration(panel)), "uw")
  }

  test("wave-AZ path-risk and windowed-ring twins equal their batch ops") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0, 50.0)))
    import graft.streaming.StreamingOps
    val A = graft.operators.Analytics
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def finalizedDaily[O: org.apache.spark.sql.Encoder](ord: String)(
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) = {
      val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
        org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(op)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"asset_id").orderBy(org.apache.spark.sql.functions.col(ord).desc)
      norm(sink.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn"))
    }
    assert(finalizedDaily("n_days")(StreamingOps.calmarStream(_)) ===
      norm(A.calmar(panel)), "calmar")
    assert(finalizedDaily("n_days")(StreamingOps.martinRatioStream(_)) ===
      norm(A.martinRatio(panel)), "martin")
    assert(finalizedDaily("n_days")(StreamingOps.painIndexStream(_)) ===
      norm(A.painIndex(panel)), "pain")
    assert(norm(graft.streaming.StreamReplay.replay(spark, daily, 3,
      maxStateRows = 2L)(StreamingOps.rollingSharpeStream(_))) ===
      norm(A.rollingSharpe(panel)), "rsharpe")

    val rets = A.dailyReturns(panel).select($"asset_id", $"date", $"ret")
    val feed = rets
      .join(org.apache.spark.sql.functions.broadcast(A.marketReturns(rets)), Seq("date"))
      .select($"asset_id", $"date", $"ret", $"mkt_ret")
      .as[StreamingOps.RetMktTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val sink = graft.streaming.StreamReplay.replay(spark, feed, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.betaStabilityStream(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy($"n_betas".desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === norm(A.betaStability(panel)), "bstab")
  }

  test("wave-BA adjusted sharpe and equity-curve R2 match hand constructions") {
    import graft.operators.Micro.jvm6
    val A = graft.operators.Analytics
    val vals = Vector(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0)
    val panel = panelOf(Map(1L -> vals))

    // adjusted sharpe: replay the moment algebra imperatively
    val out = A.adjustedSharpe(panel).collect()
    assert(out.length === 1)
    val rets = vals.sliding(2).map { case Seq(a, b) => jvm6(b / a - 1) }.toVector
    val n = rets.size.toDouble
    val s1 = rets.foldLeft(0.0)(_ + _)
    val s2 = rets.foldLeft(0.0)((a, x) => a + x * x)
    val s3 = rets.foldLeft(0.0)((a, x) => a + (x * x) * x)
    val s4 = rets.foldLeft(0.0)((a, x) => a + ((x * x) * x) * x)
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m
    val m4 = s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n) - 3.0 * m * m * m * m
    val sd = math.sqrt(math.max(m2 * n / (n - 1), 0.0))
    val sr = jvm6(m / sd)
    val g1 = jvm6(m3 / (m2 * math.sqrt(m2)))
    val g2 = jvm6(m4 / (m2 * m2) - 3)
    assert(out.head.getAs[Double]("sr") === sr)
    assert(out.head.getAs[Double]("asr") ===
      jvm6(sr * (1.0 + g1 / 6 * sr - g2 / 24 * sr * sr)))

    // equity curve: a perfectly exponential path has r2 = 1
    val expo = Vector.tabulate(10)(i => 100.0 * math.pow(1.02, i))
    val ec = A.equityCurveR2(panelOf(Map(1L -> expo))).collect()
    assert(ec.length === 1)
    assert(math.abs(ec.head.getAs[Double]("r2") - 1.0) < 2e-6)
    // log-slope ≈ ln(1.02) per day on the u6 grid
    assert(math.abs(ec.head.getAs[Double]("slope") - math.log(1.02)) < 2e-5)

    // twins equal batch
    import graft.streaming.StreamingOps
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val panel2 = panelOf(Map(1L -> vals, 2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0)))
    val daily = graft.operators.KeyValue.lwwDaily(panel2)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def finalizedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) = {
      val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
        org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(op)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"asset_id").orderBy($"n_days".desc)
      norm(sink.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn"))
    }
    assert(finalizedDaily(StreamingOps.adjustedSharpeStream(_)) ===
      norm(A.adjustedSharpe(panel2)), "asr twin")
    assert(finalizedDaily(StreamingOps.equityCurveR2Stream(_)) ===
      norm(A.equityCurveR2(panel2)), "ec twin")
  }

  test("wave-BB dual beta splits the sample by market sign") {
    val A = graft.operators.Analytics
    // asset 2 mirrors the market 1:1; the market (equal-weight of both)
    // moves with asset 1's bigger swings
    val panel = panelOf(Map(
      1L -> Seq(100.0, 104.0, 98.0, 106.0, 100.0, 108.0, 102.0, 110.0),
      2L -> Seq(50.0, 51.0, 49.5, 51.5, 50.0, 52.0, 50.5, 52.5)))
    val out = A.dualBeta(panel).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_up") >= 2L)
      assert(r.getAs[Long]("n_down") >= 2L)
      assert(!r.isNullAt(r.fieldIndex("bull_beta")))
      assert(!r.isNullAt(r.fieldIndex("bear_beta")))
      assert(!r.isNullAt(r.fieldIndex("beta_convexity")))
    }

    // twin equals batch
    import graft.streaming.StreamingOps
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val rets = A.dailyReturns(panel).select($"asset_id", $"date", $"ret")
    val feed = rets
      .join(org.apache.spark.sql.functions.broadcast(A.marketReturns(rets)), Seq("date"))
      .select($"asset_id", $"date", $"ret", $"mkt_ret")
      .as[StreamingOps.RetMktTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    val sink = graft.streaming.StreamReplay.replay(spark, feed, 3,
      org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(
      StreamingOps.dualBetaStream)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"asset_id").orderBy(($"n_up" + $"n_down").desc)
    val fin = sink.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(norm(fin) === norm(A.dualBeta(panel)), "dual twin")
  }

  test("wave-BC burke/kappa/upside twins equal their batch ops") {
    val panel = panelOf(Map(
      1L -> Seq(100.0, 102.0, 99.0, 105.0, 103.0, 108.0, 104.0, 110.0, 101.0,
        107.0, 103.0, 112.0),
      2L -> Seq(50.0, 50.5, 49.0, 52.0, 51.5, 53.0, 50.0)))
    import graft.streaming.StreamingOps
    val A = graft.operators.Analytics
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val daily = graft.operators.KeyValue.lwwDaily(panel)
      .select($"asset_id", $"date", $"value")
      .as[StreamingOps.DailyTick].collect().toSeq
      .sortBy(t => (t.date.getTime, t.asset_id))
    def finalizedDaily[O: org.apache.spark.sql.Encoder](
        op: org.apache.spark.sql.Dataset[StreamingOps.DailyTick] =>
          org.apache.spark.sql.Dataset[O]) = {
      val sink = graft.streaming.StreamReplay.replay(spark, daily, 3,
        org.apache.spark.sql.streaming.OutputMode.Update, maxStateRows = 2L)(op)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"asset_id").orderBy($"n_days".desc)
      norm(sink.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1).drop("rn"))
    }
    assert(finalizedDaily(StreamingOps.burkeRatioStream(_)) ===
      norm(A.burkeRatio(panel)), "burke")
    assert(finalizedDaily(StreamingOps.kappaThreeStream(_)) ===
      norm(A.kappaThree(panel)), "kappa3")
    assert(finalizedDaily(StreamingOps.upsidePotentialStream(_)) ===
      norm(A.upsidePotential(panel)), "upr")
  }
}
