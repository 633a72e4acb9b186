package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsOf
import graft.sources.findb.{FindbDistWriter, FindbFormat}

/** Round-11 hardening: occupancy-balanced skew slicing, the
  * directory-of-parts findb store (metadata-only assembly), the
  * single-scan multi-store merge, and late-data observability.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private val smallPage =
    FindbFormat.PageHeaderSize + 4 * FindbFormat.KeyValueSize

  private def entries(n: Int): Seq[(Long, Int, Long, Float)] =
    (0 until n).map(i => (i.toLong / 7, 20240101 + (i % 28), i.toLong, i * 0.5f))
      .sorted

  private def readBack(path: String, ppp: Int = 3): Seq[(Long, Int, Long, Float)] =
    spark.read.format("graft.sources.findb.FindbDataSource")
      .option("pagesPerPartition", ppp).load(path)
      .as[(Long, Int, Long, Float)].collect().sorted.toSeq

  // ── occupancy-balanced skew slicing ────────────────────────────────

  test("asof_join_skew: equality holds on a TEMPORALLY CLUSTERED hot key") {
    // the VERDICT's realistic hot key: an index asset on a volatile
    // day. 90% of the hot key's ticks land inside ONE narrow burst
    // window (3% of the timeline) — under uniform slicing, a single
    // former slice; the remaining rows spread across the full span.
    val burstLo = 1700000000000L + 400000L
    val rows = (1 to 3000).map { i =>
      val hot = i % 10 != 0
      val k = if (hot) 1L else (i / 10 % 19 + 2).toLong
      val t =
        if (hot) burstLo + i * 10L // 2700 ticks inside ~30s
        else 1700000000000L + i.toLong * 333L // tail over ~1000s
      (k, new Timestamp(t), i.toLong, i * 0.5)
    }
    val left = rows.toDF("user_id", "ts", "seq", "value")
    val right = rows.filter(_._3 % 7 == 0)
      .map { case (k, t, s, v) => (k, new Timestamp(t.getTime - 250), s + 100000L, v * 2) }
      .toDF("user_id", "ts", "seq", "rvalue")
    def normalize(df: DataFrame) =
      df.select($"user_id", $"seq", $"asof_value").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
        .sortBy(t => (t._1, t._2)).toSeq
    val plain = normalize(AsOf.asOfJoin(left, right, "user_id", Seq("value")))
    for (slices <- Seq(1, 3, 8)) {
      val sliced = normalize(
        AsOf.asOfJoinSkewSafe(left, right, "user_id", Seq("value"), slices))
      assert(sliced === plain, s"slices=$slices diverged on the clustered panel")
    }
  }

  test("asof_join_skew: quantile cuts bound per-slice occupancy on the clustered burst") {
    // same clustered shape; the probe asserts the operator's OWN cut
    // points spread rows ~evenly — the per-reducer bound uniform
    // slicing cannot give (uniform bounds put >90% in one slice).
    val burstLo = 1700000000000L + 400000L
    val rows = (1 to 3000).map { i =>
      val hot = i % 10 != 0
      val t =
        if (hot) burstLo + i * 10L
        else 1700000000000L + i.toLong * 333L
      (if (hot) 1L else (i / 10 % 19 + 2).toLong, new Timestamp(t), i.toLong, i * 0.5)
    }
    val u = rows.toDF("user_id", "ts", "seq", "value")
    val slices = 8
    val cuts = AsOf.sliceCuts(u, slices).get
    assert(cuts.nonEmpty && cuts.size <= slices - 1)
    val tsm = rows.map(_._2.getTime * 1000L).sorted
    val perSlice = tsm.groupBy(m => cuts.count(_ < m)).values.map(_.size)
    val ideal = rows.size.toDouble / slices
    assert(perSlice.max <= (2.5 * ideal).toInt,
      s"max slice occupancy ${perSlice.max} vs ideal $ideal — cuts not balancing")
    // and the uniform split really is the degenerate case the fix removes
    val lo = tsm.min; val span = math.max(1L, (tsm.max - lo) / slices + 1)
    val uniformMax = tsm.groupBy(m => (m - lo) / span).values.map(_.size).max
    assert(uniformMax > (0.9 * rows.size).toInt,
      "fixture regression: the burst no longer overwhelms a uniform slice")
  }

  // ── directory-of-parts findb store ─────────────────────────────────

  test("findb directory store: reads identical rows to the single-file store") {
    val es = entries(1000)
    val dir = tmp("fdb_dir")
    FindbDistWriter.write(es.toDF("asset_id", "date", "timestamp", "value"),
      s"$dir/single.db", smallPage, numPartitions = 7)
    FindbDistWriter.write(es.toDF("asset_id", "date", "timestamp", "value"),
      s"$dir/parts.dbd", smallPage, numPartitions = 7, directoryParts = true)
    assert(readBack(s"$dir/parts.dbd") === es)
    assert(readBack(s"$dir/parts.dbd") === readBack(s"$dir/single.db"))
  }

  test("findb directory store: plan-time pruning descends across part/top files") {
    val es = entries(900)
    val path = tmp("fdb_dir_prune") + "/t.dbd"
    FindbDistWriter.write(es.toDF("asset_id", "date", "timestamp", "value"),
      path, smallPage, numPartitions = 6, directoryParts = true)
    val df = spark.read.format("graft.sources.findb.FindbDataSource")
      .option("pagesPerPartition", 3).load(path)
      .where($"asset_id".isin(5L, 70L, 128L))
    assert(df.rdd.getNumPartitions <= 9)
    assert(df.as[(Long, Int, Long, Float)].collect().sorted.toSeq ===
      es.filter(e => Set(5L, 70L, 128L)(e._1)))
  }

  test("findb directory store: assembly is metadata-only (driver bytes independent of rows)") {
    // driver-added bytes = _header (12) + top tree (O(P/cap) pages).
    // Writing 4x the rows at the same partition count must add ZERO
    // driver-side assembly bytes — the part files grow, the metadata
    // doesn't.
    def driverBytes(n: Int): (Long, Long) = {
      val path = tmp(s"fdb_meta_$n") + "/t.dbd"
      FindbDistWriter.write(entries(n).toDF("asset_id", "date", "timestamp", "value"),
        path, smallPage, numPartitions = 6, directoryParts = true)
      // ignore Hadoop LocalFS .crc shadows — not part of the store
      val files = new java.io.File(path).listFiles.toSeq
        .filterNot(_.getName.startsWith("."))
      val parts = files.filter(_.getName.startsWith(FindbFormat.DirPartPrefix))
      assert(parts.nonEmpty)
      val meta = files.filterNot(_.getName.startsWith(FindbFormat.DirPartPrefix))
      assert(meta.map(_.getName).toSet ==
        Set(FindbFormat.DirHeaderFile, FindbFormat.DirTopFile))
      (meta.map(_.length).sum, parts.map(_.length).sum)
    }
    val (meta1, parts1) = driverBytes(500)
    val (meta4, parts4) = driverBytes(2000)
    assert(parts4 > 3 * parts1, "fixture: parts must actually grow with rows")
    assert(meta4 === meta1,
      s"driver assembly bytes grew with store size: $meta1 -> $meta4")
  }

  test("findb merge: mixed single-file + directory inputs, one planned scan") {
    val dir = tmp("fdb_mixmerge")
    val base = entries(800)
    val restate = base.filter(_._1 % 3 == 0).map { case (a, d, t, v) => (a, d, t, v + 1000f) }
    FindbDistWriter.write(base.toDF("asset_id", "date", "timestamp", "value"),
      s"$dir/a.db", smallPage, numPartitions = 5)
    FindbDistWriter.write(restate.toDF("asset_id", "date", "timestamp", "value"),
      s"$dir/b.dbd", smallPage, numPartitions = 3, directoryParts = true)
    // plan audit: the merge view reads BOTH stores through ONE scan node
    val view = FindbDistWriter.mergedView(spark, Seq(s"$dir/a.db", s"$dir/b.dbd"))
    val scans = view.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(scans.size === 1, s"expected 1 scan node, got ${scans.size}")
    assert(scans.head.scan.description().contains("a.db") &&
      scans.head.scan.description().contains("b.dbd"))
    // correctness: later input wins on key collisions
    FindbDistWriter.merge(spark, Seq(s"$dir/a.db", s"$dir/b.dbd"), s"$dir/m.dbd",
      smallPage, numPartitions = 4, directoryParts = true)
    val expect = (base.map(e => ((e._1, e._2, e._3), e._4)).toMap ++
      restate.map(e => ((e._1, e._2, e._3), e._4)).toMap)
      .map { case ((a, d, t), v) => (a, d, t, v) }.toSeq.sorted
    assert(readBack(s"$dir/m.dbd") === expect)
  }

  test("findb merge: x4 stores stay one scan and resolve a 4-deep priority chain") {
    val dir = tmp("fdb_merge4")
    val base = entries(600)
    // four stores, alternating layouts; store i restates assets ≡ i-1
    // (mod 3) with +1000·i, so several keys collide across 3 stores
    // and the HIGHEST store index must win every time
    val stores = (0 until 4).map { i =>
      val rows =
        if (i == 0) base
        else base.filter(_._1 % 3 == (i - 1) % 3)
          .map { case (a, d, t, v) => (a, d, t, v + 1000f * i) }
      val p = if (i % 2 == 0) s"$dir/s$i.db" else s"$dir/s$i.dbd"
      FindbDistWriter.write(rows.toDF("asset_id", "date", "timestamp", "value"),
        p, smallPage, numPartitions = 2 + i, directoryParts = i % 2 == 1)
      (p, rows)
    }
    val view = FindbDistWriter.mergedView(spark, stores.map(_._1))
    val scans = view.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(scans.size === 1, s"x4 merge planned ${scans.size} scan nodes")
    FindbDistWriter.merge(spark, stores.map(_._1), s"$dir/m4.dbd",
      smallPage, numPartitions = 4, directoryParts = true)
    val expect = stores.map(_._2)
      .foldLeft(Map.empty[(Long, Int, Long), Float]) { (acc, rows) =>
        acc ++ rows.map(e => ((e._1, e._2, e._3), e._4)).toMap
      }
      .map { case ((a, d, t), v) => (a, d, t, v) }.toSeq.sorted
    assert(readBack(s"$dir/m4.dbd") === expect)
  }

  test("findb streaming sink: epoch stores accumulate, compaction applies epoch-priority LWW") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = entries(400)
    val restate = base.filter(_._1 % 2 == 0).map { case (a, d, t, v) => (a, d, t, v + 500f) }
    val root = tmp("fdb_sink")
    val ckpt = tmp("fdb_sink_ck")
    val in = MemoryStream[(Long, Int, Long, Float)]
    val q = FindbDistWriter.streamingSink(
      in.toDS().toDF("asset_id", "date", "timestamp", "value"),
      s"$root/ingest", ckpt, smallPage, numPartitions = 3)
    try {
      base.grouped(150).foreach { g => in.addData(g); q.processAllAvailable() }
      in.addData(restate); q.processAllAvailable()
    } finally q.stop()
    val stores = FindbDistWriter.batchStores(spark, s"$root/ingest")
    assert(stores.size === 4) // 3 base chunks + the restatement epoch
    assert(stores === stores.sorted) // epoch order IS priority order
    // each epoch store is a valid directory store on its own
    assert(readBack(stores.head).nonEmpty)
    FindbDistWriter.compactSink(spark, s"$root/ingest", s"$root/store.dbd",
      smallPage, numPartitions = 4)
    val expect = (base.map(e => ((e._1, e._2, e._3), e._4)).toMap ++
      restate.map(e => ((e._1, e._2, e._3), e._4)).toMap)
      .map { case ((a, d, t), v) => (a, d, t, v) }.toSeq.sorted
    assert(readBack(s"$root/store.dbd") === expect)
    // at-least-once idempotency: re-writing an epoch's store whole
    // (what a foreachBatch replay does) leaves identical content
    val replayed = base.take(150)
    FindbDistWriter.write(replayed.toDF("asset_id", "date", "timestamp", "value"),
      stores.head, smallPage, numPartitions = 3, directoryParts = true)
    assert(readBack(stores.head) === replayed.sorted)
    // crash window: _header is written LAST (the commit record) — a
    // torn epoch store must fail to RESOLVE, never read partial pages
    val torn = new java.io.File(new java.net.URI(stores.head).getPath,
      FindbFormat.DirHeaderFile)
    assert(torn.delete(), s"fixture: could not remove ${torn.getPath}")
    intercept[Exception] { FindbFormat.layout(stores.head) }
  }

  // ── renko leading-null seed guard ──────────────────────────────────

  test("RecurrenceFold renko: a leading null close passes through without poisoning the anchor") {
    import org.apache.spark.sql.catalyst.expressions.{Alias, BoundReference, GenericInternalRow}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    import graft.expressions.RecurrenceFold
    val inType = StructType(Seq(
      StructField("date", DateType), StructField("close", DoubleType),
      StructField("m", LongType), StructField("size", LongType)))
    // row 0: null close (m undefined/0) — must NOT seed anchor=0;
    // row 1: close 100.0 seeds; row 2: +2 bricks from the true anchor.
    val arr = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](0, null, 0L, 2000000L)),
      new GenericInternalRow(Array[Any](1, 100.0, 100000000L, 2000000L)),
      new GenericInternalRow(Array[Any](2, 104.0, 104000000L, 2000000L))))
    val fold = RecurrenceFold(BoundReference(0, ArrayType(inType), nullable = true), "renko")
    val proj = GenerateUnsafeProjection.generate(Seq(Alias(fold, "out")()))
    val out = proj(new GenericInternalRow(Array[Any](arr))).getArray(0)
    assert(out.numElements() === 3)
    // leading null: zero bricks, null anchor (NOT anchor 0)
    val r0 = out.getStruct(0, 6)
    assert(r0.isNullAt(1) && r0.getLong(2) === 0L && r0.isNullAt(5))
    // first non-null close seeds the anchor at its own micro value
    val r1 = out.getStruct(1, 6)
    assert(r1.getLong(2) === 0L && r1.getDouble(5) === 100.0)
    // and the recursion continues from THAT anchor: (104-100)/2 = 2 bricks up
    val r2 = out.getStruct(2, 6)
    assert(r2.getLong(2) === 2L && r2.getLong(3) === 2L && r2.getDouble(5) === 104.0)
  }

  // ── famaMacbeth sd clamp ───────────────────────────────────────────

  test("fama_macbeth: constant slope series yields null t_stat, never NaN") {
    import graft.operators.Analytics
    // 3 assets whose day-(d-1) return predicts day-d return with the
    // SAME slope every date -> cross-date slope variance is exactly 0
    // up to float cancellation; the clamp must keep sd >= 0 and the
    // null gate must fire (no NaN leaks).
    val dates = (1 to 8).map(d => java.sql.Date.valueOf(f"2024-01-$d%02d"))
    val rows = for {
      (a, g) <- Seq((1L, 1.01), (2L, 1.02), (3L, 1.04))
      (dt, i) <- dates.zipWithIndex
    } yield (a, dt, new Timestamp(dt.getTime), 100.0 * a * math.pow(g, i), (a * 100 + i).toLong)
    val panel = rows.toDF("asset_id", "date", "ts", "value", "seq")
    val out = Analytics.famaMacbeth(panel).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getAs[Any]("t_stat")
      assert(t == null || !t.asInstanceOf[Double].isNaN,
        s"t_stat leaked NaN: $r")
    }
  }

  // ── late-data observability ────────────────────────────────────────

  test("lateArrivalAudit: shuffled batches fire the regressed counter; ordered feeds never do") {
    import graft.streaming.{StreamingOps, StreamReplay}
    val base = 1700000000000L
    val ticks = (1 to 120).map { i =>
      StreamingOps.Tick(i % 3 + 1L, new Timestamp(base + i * 1000L), i * 0.5, i.toLong)
    }
    // adversarial: batch by seq % 2 (decoupled from the asset key) —
    // every asset's odd-seq rows arrive in batch 1 with event times
    // behind batch 0's high-water mark
    val shuffled = (0 until 2).map(b => ticks.filter(_.seq % 2 == b))
    val audited = StreamReplay.replayGrouped(spark, shuffled, maxStateRows = 3L)(
      StreamingOps.lateArrivalAudit(_))
      .orderBy($"asset_id", $"seq").collect()
    assert(audited.length === 120)
    // reference: sequential fold over (batch, ts, seq) processing order
    val expected: Map[Long, Long] = ticks.groupBy(_.asset_id).map { case (a, as) =>
      val order = as.sortBy(t => (t.seq % 2, t.ts.getTime, t.seq))
      var mx = Long.MinValue; var reg = 0L
      order.foreach { t =>
        val m = t.ts.getTime * 1000L
        if (m < mx) reg += 1 else mx = m
      }
      (a, reg)
    }
    val finals = audited.groupBy(_.getLong(0)).map { case (a, rs) =>
      val (ev, reg) = rs.map(r => (r.getLong(5), r.getLong(6))).maxBy(_._1)
      (a, ev, reg)
    }
    assert(finals.size === 3)
    assert(finals.forall(_._2 === 40L)) // events per asset
    assert(finals.forall(_._3 > 0L), "regressed counter never fired on the shuffled feed")
    finals.foreach { case (a, _, reg) => assert(reg === expected(a), s"asset $a") }
    // control: an in-order even-chunk replay must never flag
    val ordered = StreamReplay.replayGrouped(spark,
      ticks.sortBy(t => (t.ts.getTime, t.seq)).grouped(30).toSeq, maxStateRows = 3L)(
      StreamingOps.lateArrivalAudit(_)).collect()
    assert(ordered.forall(!_.getBoolean(4)))
    assert(ordered.forall(_.getLong(6) === 0L))
  }
}
