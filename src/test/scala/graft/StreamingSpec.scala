package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Tick

class StreamingSpec extends SparkSpec {

  private def ts(i: Int) = new Timestamp(i * 1000L)

  test("streaming latestPerKey maintains LWW state across micro-batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val q = StreamingOps.latestPerKey(input.toDS())
      .writeStream.format("memory").queryName("latest_sink")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(Tick(1L, ts(10), 100.0, 1L), Tick(1L, ts(20), 200.0, 2L), Tick(2L, ts(5), 50.0, 3L))
      q.processAllAvailable()
      val batch1 = spark.table("latest_sink").as[StreamingOps.Latest]
        .collect().map(l => l.asset_id -> l.value).toMap
      assert(batch1 === Map(1L -> 200.0, 2L -> 50.0))

      // older tick must NOT displace state; newer one must
      input.addData(Tick(1L, ts(15), 150.0, 4L), Tick(2L, ts(30), 75.0, 5L))
      q.processAllAvailable()
      val all = spark.table("latest_sink").as[StreamingOps.Latest].collect()
      val latestPer = all.groupBy(_.asset_id).map { case (k, v) => k -> v.maxBy(_.ts.getTime).value }
      assert(latestPer === Map(1L -> 200.0, 2L -> 75.0))
      // asset 1 emitted no second update (stale tick suppressed)
      assert(all.count(_.asset_id == 1L) === 1)
    } finally q.stop()
  }

  test("streaming near-dup candidates surface across micro-batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Seq.fill(6)(
      "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill")
      .mkString(" ")
    val input = MemoryStream[(Long, String, Timestamp)]
    val cands = StreamingOps.nearDupCandidatesStream(
      input.toDS().toDF("doc_id", "text", "ts"))
    val q = cands.writeStream.format("memory").queryName("cand_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, base, ts(10)), (2L, "completely different text about shuffle exchanges", ts(11)))
      q.processAllAvailable()
      assert(spark.table("cand_sink").count() === 0) // nothing matches yet
      input.addData((3L, base + " postscript", ts(20))) // near-dup of doc 1, later batch
      q.processAllAvailable()
      val pairs = spark.table("cand_sink").as[StreamingOps.DupCandidate].collect()
        .map(c => (c.doc_id, c.matched_doc_id)).distinct
      assert(pairs.contains((3L, 1L)))
      assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    } finally q.stop()
  }

  test("streaming near-dup bucket state expires after the event-time TTL") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Seq.fill(6)(
      "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill")
      .mkString(" ")
    val input = MemoryStream[(Long, String, Timestamp)]
    val cands = StreamingOps.nearDupCandidatesStream(
      input.toDS().toDF("doc_id", "text", "ts"),
      stateTtlMs = 60L * 1000, watermarkDelay = "0 seconds")
    val q = cands.writeStream.format("memory").queryName("ttl_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, base, ts(0)))
      q.processAllAvailable()
      // push the watermark far past doc 1's 60 s TTL, in two batches so
      // the timeout actually fires (watermark advances after the batch
      // that carries the late data)
      input.addData((2L, "unrelated text about watermarks and timeouts", ts(1000)))
      q.processAllAvailable()
      input.addData((4L, "another unrelated filler document entirely", ts(1001)))
      q.processAllAvailable()
      // doc 1's bucket owners expired → a new near-dup re-seeds, no pair
      input.addData((3L, base + " postscript", ts(1002)))
      q.processAllAvailable()
      val pairs = spark.table("ttl_sink").as[StreamingOps.DupCandidate].collect()
        .map(c => (c.doc_id, c.matched_doc_id)).distinct
      assert(!pairs.contains((3L, 1L)))
      // doc 5 arriving right after doc 3 re-seeded DOES pair with it
      input.addData((5L, base + " other postscript", ts(1003)))
      q.processAllAvailable()
      val pairs2 = spark.table("ttl_sink").as[StreamingOps.DupCandidate].collect()
        .map(c => (c.doc_id, c.matched_doc_id)).distinct
      assert(pairs2.contains((5L, 3L)))
    } finally q.stop()
  }

  test("stream-static as-of enriches ticks from the forward-filled panel") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Date
    val staticPanel = Seq(
      (1L, Date.valueOf("2024-01-01"), ts(100), 10.0, 1L),
      (1L, Date.valueOf("2024-01-03"), ts(300), 30.0, 2L)) // 01-02 missing → filled with 10.0
      .toDF("asset_id", "date", "ts", "value", "seq")
    val input = MemoryStream[Tick]
    val enriched = StreamingOps.streamStaticAsOf(input.toDS().toDF(), staticPanel)
    val q = enriched.writeStream.format("memory").queryName("enrich_sink")
      .outputMode(OutputMode.Append).start()
    try {
      val d2 = java.sql.Timestamp.valueOf("2024-01-02 12:00:00")
      val d3 = java.sql.Timestamp.valueOf("2024-01-03 12:00:00")
      input.addData(Tick(1L, d2, 1.0, 10L), Tick(1L, d3, 2.0, 11L))
      q.processAllAvailable()
      val out = spark.table("enrich_sink")
        .select("seq", "ref_value").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double]))).toMap
      assert(out === Map(10L -> Some(10.0), 11L -> Some(30.0)))
    } finally q.stop()
  }

  test("stream-stream as-of join enriches ticks with the latest reference value") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ticks = MemoryStream[Tick]
    val refs = MemoryStream[Tick]
    val joined = StreamingOps.streamStreamAsOf(
      ticks.toDS().toDF(), refs.toDS().toDF(), maxLag = "1 hour", watermark = "0 seconds")
    val q = joined.writeStream.format("memory").queryName("ss_asof_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // refs at t=100 (v=10) and t=300 (v=30); ticks at t=200 and t=400
      refs.addData(Tick(1L, ts(100), 10.0, 1L), Tick(1L, ts(300), 30.0, 2L))
      ticks.addData(Tick(1L, ts(200), 1.0, 10L), Tick(1L, ts(400), 2.0, 11L))
      q.processAllAvailable()
      // advance both watermarks far past the data so append-mode results finalize
      refs.addData(Tick(9L, ts(100000), 0.0, 99L))
      ticks.addData(Tick(9L, ts(100000), 0.0, 98L))
      q.processAllAvailable()
      refs.addData(Tick(9L, ts(200000), 0.0, 97L))
      ticks.addData(Tick(9L, ts(200000), 0.0, 96L))
      q.processAllAvailable()
      val out = spark.table("ss_asof_sink")
        .filter($"asset_id" === 1L).select("seq", "asof_value").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double]))).toMap
      assert(out === Map(10L -> Some(10.0), 11L -> Some(30.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeat keys within the watermark horizon") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val deduped = StreamingOps.dedupStream(input.toDS().toDF(), "10 minutes", Seq("asset_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Tick(1L, ts(10), 1.0, 1L), Tick(1L, ts(20), 2.0, 2L), Tick(2L, ts(30), 3.0, 3L))
      q.processAllAvailable()
      input.addData(Tick(1L, ts(40), 4.0, 4L)) // duplicate key within horizon
      q.processAllAvailable()
      val perKey = spark.table("dedup_sink").groupBy("asset_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perKey === Map(1L -> 1L, 2L -> 1L))
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on gaps and on event-time timeout") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val sessions = StreamingOps.sessionizeStream(input.toDS(), gapSec = 60, watermark = "5 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // session 1: t=10,20; then a 500s gap inside the SAME batch closes it
      input.addData(Tick(1L, ts(10), 1.0, 1L), Tick(1L, ts(20), 2.0, 2L), Tick(1L, ts(520), 3.0, 3L))
      q.processAllAvailable()
      val afterBatch1 = spark.table("sess_sink").as[StreamingOps.Session].collect()
      assert(afterBatch1.map(s => (s.session_start.getTime / 1000, s.session_end.getTime / 1000, s.n_events)).toSet
        === Set((10L, 20L, 2L)))

      // advancing the watermark far past 520+60 times out the open session
      input.addData(Tick(2L, ts(2000), 9.0, 4L))
      q.processAllAvailable()
      input.addData(Tick(2L, ts(2001), 9.0, 5L)) // one more batch so the timeout fires
      q.processAllAvailable()
      val all = spark.table("sess_sink").as[StreamingOps.Session].collect()
      assert(all.exists(s => s.asset_id == 1L && s.session_start.getTime / 1000 == 520L && s.n_events == 1L))
    } finally q.stop()
  }

  test("windowed aggregation with watermark produces per-window OHL counts") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val agg = StreamingOps.windowedAgg(input.toDS().toDF(), "1 minute", "2 minutes")
    val q = agg.writeStream.format("memory").queryName("win_sink")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        Tick(1L, ts(10), 10.0, 1L), Tick(1L, ts(30), 30.0, 2L),
        Tick(1L, ts(70), 70.0, 3L))
      q.processAllAvailable()
      val rows = spark.table("win_sink")
        .select("asset_id", "n_ticks", "low", "high").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(rows === Set((1L, 2L, 10.0, 30.0), (1L, 1L, 70.0, 70.0)))
    } finally q.stop()
  }

  test("streaming funnel advances per-user stage across micro-batches, emitting on change") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.{FunnelEvent, FunnelProgress}
    val input = MemoryStream[FunnelEvent]
    val q = StreamingOps.funnelStream(input.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: user 1 view+click (→2); user 2 click only (no advance, no emit)
      input.addData(
        FunnelEvent(1L, ts(1), 1L, "view"), FunnelEvent(1L, ts(2), 2L, "click"),
        FunnelEvent(2L, ts(1), 3L, "click"))
      q.processAllAvailable()
      val b1 = spark.table("funnel_sink").as[FunnelProgress].collect()
      assert(b1.toSet === Set(FunnelProgress(1L, 2)))
      // batch 2: user 1 purchase completes (→3); user 2 view starts (→1)
      input.addData(
        FunnelEvent(1L, ts(3), 4L, "purchase"), FunnelEvent(2L, ts(3), 5L, "view"))
      q.processAllAvailable()
      val all = spark.table("funnel_sink").as[FunnelProgress].collect()
      assert(all.toSet === Set(FunnelProgress(1L, 2), FunnelProgress(1L, 3), FunnelProgress(2L, 1)))
    } finally q.stop()
  }

  test("streaming packer fills token budgets greedily across micro-batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.{PackDoc, Packed}
    val input = MemoryStream[PackDoc]
    val q = StreamingOps.packStream(input.toDS(), budget = 10)
      .writeStream.format("memory").queryName("pack_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(PackDoc(1L, 0, 6L), PackDoc(2L, 0, 6L), PackDoc(3L, 0, 4L))
      q.processAllAvailable()
      // greedy: doc1 → pack0 (6), doc2 overflows → pack1 (6), doc3 fits pack1 (10)
      val b1 = spark.table("pack_sink").as[Packed].collect().map(p => p.doc_id -> p.pack_id).toMap
      assert(b1 === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))

      // state carries across batches: pack1 is exactly full, next doc opens pack2;
      // an oversized doc occupies a pack alone; other shards pack independently
      input.addData(PackDoc(4L, 0, 3L), PackDoc(5L, 0, 25L), PackDoc(6L, 1, 2L))
      q.processAllAvailable()
      val all = spark.table("pack_sink").as[Packed].collect()
      val byDoc = all.map(p => p.doc_id -> p.pack_id).toMap
      assert(byDoc(4L) === 2L && byDoc(5L) === 3L && byDoc(6L) === 0L)
      // invariant: no multi-doc pack exceeds the budget
      all.filter(_.shard == 0).groupBy(_.pack_id).foreach { case (_, docs) =>
        assert(docs.map(_.n_tokens).sum <= 10 || docs.length === 1)
      }
    } finally q.stop()
  }

  test("funnel late-data contract: arrival order is binding, batch replay diverges") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{FunnelEvent, FunnelProgress}
    val stages = Seq("signup", "purchase")
    val input = MemoryStream[FunnelEvent]
    val q = StreamingOps.funnelStream(input.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_late_sink")
      .outputMode(OutputMode.Update).start()
    try {
      // the stage-2 event arrives FIRST (its producer was fast) …
      input.addData(FunnelEvent(1L, ts(200), 2L, "purchase"))
      q.processAllAvailable()
      // … the stage-1 event is late by a full micro-batch
      input.addData(FunnelEvent(1L, ts(100), 1L, "signup"))
      q.processAllAvailable()
      val streamed = spark.table("funnel_late_sink").as[FunnelProgress].collect()
        .groupBy(_.user_id).map { case (u, ps) => u -> ps.map(_.stage_reached).max }
      // arrival-ordered: the purchase is consumed before signup opens
      // the funnel, and a late event cannot retro-advance — stage 1.
      assert(streamed === Map(1L -> 1))

      // batch `funnel_stages` replays in EVENT-TIME order and sees the
      // full depth — the documented divergence, executable.
      val batchEvents = Seq(
        (1L, ts(200), 2L, "purchase"), (1L, ts(100), 1L, "signup"))
        .toDF("user_id", "ts", "event_id", "event_type")
      val batch = graft.operators.Analytics.funnelStages(batchEvents, stages)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch === Map(2L -> 1L)) // the one user reached stage 2
    } finally q.stop()
  }

  test("pack late-data contract: greedy arrival packing vs batch cumsum straddling") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{PackDoc, Packed}
    val input = MemoryStream[PackDoc]
    val q = StreamingOps.packStream(input.toDS(), budget = 10)
      .writeStream.format("memory").queryName("pack_late_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(PackDoc(10L, 0, 6L), PackDoc(11L, 0, 4L)) // pack0 filled to exactly 10
      q.processAllAvailable()
      input.addData(PackDoc(1L, 0, 6L)) // late doc with the SMALLEST id
      q.processAllAvailable()
      val streamed = spark.table("pack_late_sink").as[Packed].collect()
        .map(p => p.doc_id -> p.pack_id).toMap
      // arrival-ordered greedy: the late doc opens pack 1; ids never re-sort
      assert(streamed === Map(10L -> 0L, 11L -> 0L, 1L -> 1L))

      // batch doc_pack is doc_id-ordered cumulative division over the
      // same corpus — a genuinely different (and straddling) assignment.
      val texts = Map(1L -> 6, 10L -> 6, 11L -> 4).map { case (id, n) =>
        (id, (1 to n).map(i => s"w$i").mkString(" "))
      }.toSeq
      val batch = graft.operators.Pipeline.docPack(
        texts.toDF("doc_id", "text"), budget = 10, shards = 1)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_id")).toMap
      assert(batch === Map(1L -> 0L, 10L -> 1L, 11L -> 1L))
      assert(batch !== streamed)
    } finally q.stop()
  }

  test("minhashIndexSink keeps the band index probe-fresh across micro-batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Seq.fill(6)(
      "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill")
      .mkString(" ")
    val idxPath = java.nio.file.Files.createTempDirectory("mh_stream_idx").toString + "/index"
    val ckpt = java.nio.file.Files.createTempDirectory("mh_stream_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.minhashIndexSink(
      input.toDS().toDF("doc_id", "text"), idxPath, ckpt)
    try {
      input.addData((10L, base), (11L, "unrelated prose about columnar storage formats"))
      q.processAllAvailable()
      // probing an exact copy against the index finds the first batch's doc
      val probe1 = graft.operators.Dedup.probeMinhashIndex(
        spark, idxPath, Seq((99L, base)).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(probe1 === Set((99L, 10L)))

      // a second micro-batch lands in the SAME index files' layout
      input.addData((12L, base + " appended tail"))
      q.processAllAvailable()
      val probe2 = graft.operators.Dedup.probeMinhashIndex(
        spark, idxPath, Seq((99L, base)).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(probe2.contains((99L, 10L)) && probe2.contains((99L, 12L)))
    } finally q.stop()
  }

  test("topkStream converges to the batch topk_per_group answer under out-of-order arrival") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{TopkEvent, TopkEntry}
    val input = MemoryStream[TopkEvent]
    val q = StreamingOps.topkStream(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_sink")
      .outputMode(OutputMode.Update).start()
    try {
      // arrival order deliberately NOT value order, split across batches
      input.addData(
        TopkEvent("view", 1L, 10L, 5.0), TopkEvent("view", 2L, 11L, 9.0),
        TopkEvent("buy", 3L, 12L, 1.0))
      q.processAllAvailable()
      input.addData(
        TopkEvent("view", 4L, 13L, 7.0),   // displaces event 1 from view's top-2
        TopkEvent("buy", 5L, 14L, 0.5),    // enters buy's top-2, no displacement
        TopkEvent("view", 6L, 15L, 0.1))   // below view's top-2: must emit NOTHING
      q.processAllAvailable()

      val all = spark.table("topk_sink").as[TopkEntry].collect()
      // last emission per (group, rank) is the converged state
      val converged = all.zipWithIndex
        .groupBy(e => (e._1.event_type, e._1.rank))
        .map { case (k2, rows) => k2 -> rows.maxBy(_._2)._1.event_id }
      assert(converged === Map(
        ("view", 1L) -> 2L, ("view", 2L) -> 4L,
        ("buy", 1L) -> 3L, ("buy", 2L) -> 5L))

      // convergence contract: equals the batch operator over the same rows
      val batchDf = Seq(
        (1L, "view", 10L, 5.0), (2L, "view", 11L, 9.0), (3L, "buy", 12L, 1.0),
        (4L, "view", 13L, 7.0), (5L, "buy", 14L, 0.5), (6L, "view", 15L, 0.1))
        .toDF("event_id", "event_type", "user_id", "value")
      val batch = graft.operators.Analytics.topKPerGroup(batchDf, 2)
        .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("rk")) -> r.getAs[Long]("event_id"))
        .toMap
      assert(converged === batch)

      // change-only emission: batch 2's below-threshold view event must not
      // have re-emitted "buy"? (buy DID change). "view" emitted twice total,
      // once per batch where its champion set changed.
      assert(all.count(e => e.event_type == "view" && e.rank == 1L) === 2)
    } finally q.stop()
  }

  test("intervalJoinStream matches the batch interval join against static history") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    def day(i: Int) = new Timestamp(
      java.sql.Date.valueOf("2024-01-01").getTime + i * 86400000L)
    val history = Seq(
      (1L, 1L, day(0)), (1L, 2L, day(10)), (1L, 3L, day(45)),
      (4L, 8L, day(29)))
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val input = MemoryStream[(Long, Long, Timestamp)]
    val stream = input.toDF.toDF("o_custkey", "o_orderkey", "o_orderdate")
    val q = StreamingOps.intervalJoinStream(stream, history, windowDays = 30)
      .writeStream.format("memory").queryName("ij_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, 100L, day(12)))  // sees orders 1 (12d) and 2 (2d)
      q.processAllAvailable()
      input.addData((4L, 101L, day(31)),  // bucket-boundary: sees order 8 (2d)
                    (2L, 102L, day(12)))  // unknown customer: no match
      q.processAllAvailable()
      val got = spark.table("ij_sink")
        .select("o_orderkey", "prev_orderkey", "days_between").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((100L, 1L, 12L), (100L, 2L, 2L), (101L, 8L, 2L)))
    } finally q.stop()
  }

  test("ewmaStream converges to the batch ewma for in-order feeds, incl. span trim") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{DailyTick, EwmaPoint}
    def d(s: String) = java.sql.Date.valueOf(s)
    val input = MemoryStream[DailyTick]
    val q = StreamingOps.ewmaStream(input.toDS(), alpha = 0.1, span = 2)
      .writeStream.format("memory").queryName("ewma_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        DailyTick(1L, d("2024-01-01"), 12.0), DailyTick(1L, d("2024-01-02"), 18.0))
      q.processAllAvailable()
      input.addData(
        DailyTick(1L, d("2024-01-03"), 9.0), DailyTick(2L, d("2024-01-01"), 100.0))
      q.processAllAvailable()
      val got = spark.table("ewma_sink").as[EwmaPoint].collect()
        .map(p => (p.asset_id, p.date.toString) -> p.ewma).toMap
      // span=2 trims the day-1 value before day 3: frame [18, 9] →
      // s = 18·0.9 + 9 = 25.2, nw = 1.9 → 13.263158
      assert(got === Map(
        (1L, "2024-01-01") -> 12.0, (1L, "2024-01-02") -> 15.157895,
        (1L, "2024-01-03") -> 13.263158, (2L, "2024-01-01") -> 100.0))

      // convergence contract: identical to the batch operator per row
      val panel = Seq(
        (1L, d("2024-01-01"), new Timestamp(100L), 12.0, 1L),
        (1L, d("2024-01-02"), new Timestamp(200L), 18.0, 2L),
        (1L, d("2024-01-03"), new Timestamp(300L), 9.0, 3L),
        (2L, d("2024-01-01"), new Timestamp(100L), 100.0, 4L))
        .toDF("asset_id", "date", "ts", "value", "seq")
      val batch = graft.operators.Analytics.ewma(panel, alpha = 0.1, span = 2)
        .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getAs[Double]("ewma")).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("disparityStream equals the batch disparity operator for in-order feeds") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{DailyTick, DispPoint}
    def d(s: String) = java.sql.Date.valueOf(s)
    val input = MemoryStream[DailyTick]
    val q = StreamingOps.disparityStream(input.toDS())
      .writeStream.format("memory").queryName("disp_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(DailyTick(1L, d("2024-01-01"), 10.0))
      q.processAllAvailable()
      input.addData(
        DailyTick(1L, d("2024-01-02"), 20.0), DailyTick(1L, d("2024-01-03"), 13.0),
        DailyTick(2L, d("2024-01-01"), 50.0), DailyTick(2L, d("2024-01-02"), 55.0))
      q.processAllAvailable()
      val got = spark.table("disp_sink").as[DispPoint].collect()
        .map(p => (p.asset_id, p.date.toString) -> p.disparity).toMap
      def tsOf(s: String) = new Timestamp(java.sql.Date.valueOf(s).getTime + 1000L)
      val panel = Seq(
        (1L, "2024-01-01", 10.0, 1L), (1L, "2024-01-02", 20.0, 2L),
        (1L, "2024-01-03", 13.0, 3L),
        (2L, "2024-01-01", 50.0, 4L), (2L, "2024-01-02", 55.0, 5L))
        .map { case (a, dt, v, s) => (a, d(dt), tsOf(dt), v, s) }
        .toDF("asset_id", "date", "ts", "value", "seq")
      val batch = graft.operators.Analytics.disparity(panel).collect()
        .map(r => (r.getLong(0), r.getDate(1).toString) ->
          Option(r.getAs[Any]("disparity")).map(_.asInstanceOf[Double])).toMap
      assert(got === batch)
      // day-1 sanity: SMA = value → 0 stretch
      assert(got((1L, "2024-01-01")) === Some(0.0))
    } finally q.stop()
  }

  test("cmoStream equals the batch chande_momentum operator for in-order feeds") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{CmoPoint, DailyTick}
    def d(s: String) = java.sql.Date.valueOf(s)
    val input = MemoryStream[DailyTick]
    val q = StreamingOps.cmoStream(input.toDS())
      .writeStream.format("memory").queryName("cmo_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(DailyTick(1L, d("2024-01-01"), 10.0), DailyTick(1L, d("2024-01-02"), 12.0))
      q.processAllAvailable()
      input.addData(
        DailyTick(1L, d("2024-01-03"), 11.0), DailyTick(1L, d("2024-01-04"), 15.0),
        DailyTick(2L, d("2024-01-01"), 7.0), DailyTick(2L, d("2024-01-02"), 7.0))
      q.processAllAvailable()
      val got = spark.table("cmo_sink").as[CmoPoint].collect()
        .map(p => (p.asset_id, p.date.toString) -> p.cmo).toMap
      def tsOf(s: String) = new Timestamp(java.sql.Date.valueOf(s).getTime + 1000L)
      val panel = Seq(
        (1L, "2024-01-01", 10.0, 1L), (1L, "2024-01-02", 12.0, 2L),
        (1L, "2024-01-03", 11.0, 3L), (1L, "2024-01-04", 15.0, 4L),
        (2L, "2024-01-01", 7.0, 5L), (2L, "2024-01-02", 7.0, 6L))
        .map { case (a, dt, v, s) => (a, d(dt), tsOf(dt), v, s) }
        .toDF("asset_id", "date", "ts", "value", "seq")
      val batch = graft.operators.Analytics.chandeMomentum(panel).collect()
        .map(r => (r.getLong(0), r.getDate(1).toString) ->
          Option(r.getAs[Any]("cmo")).map(_.asInstanceOf[Double])).toMap
      assert(got === batch)
      // the flat asset-2 delta ring reads NULL (denominator 0), and the
      // mixed asset-1 window matches the wave-F hand fold
      assert(got((2L, "2024-01-02")) === None)
      assert(got((1L, "2024-01-04")) === Some(71.428571))
    } finally q.stop()
  }

  test("imiStream: candle-body ring matches the batch hand fold") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{ImiPoint, OhlcStreamBar}
    def d(s: String) = java.sql.Date.valueOf(s)
    val input = MemoryStream[OhlcStreamBar]
    val q = StreamingOps.imiStream(input.toDS())
      .writeStream.format("memory").queryName("imi_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(OhlcStreamBar(1L, d("2024-01-01"), 10.0, 12.0, 10.0, 12.0, 2L))
      q.processAllAvailable()
      input.addData(
        OhlcStreamBar(1L, d("2024-01-02"), 11.0, 11.0, 10.0, 10.0, 2L),
        OhlcStreamBar(1L, d("2024-01-03"), 10.0, 14.0, 10.0, 14.0, 2L))
      q.processAllAvailable()
      val got = spark.table("imi_sink").as[ImiPoint].collect()
        .map(p => p.date.toString -> p.imi).toMap
      // bodies +2 | +2,−1 | +2,−1,+4 → 100, 200/3, 600/7 (u6)
      assert(got === Map(
        "2024-01-01" -> Some(100.0),
        "2024-01-02" -> Some(66.666667),
        "2024-01-03" -> Some(85.714286)))
    } finally q.stop()
  }

  test("vptStream: integer micro cumulation matches the batch hand math") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{OhlcStreamBar, VptPoint}
    def d(s: String) = java.sql.Date.valueOf(s)
    val input = MemoryStream[OhlcStreamBar]
    val q = StreamingOps.vptStream(input.toDS())
      .writeStream.format("memory").queryName("vpt_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(OhlcStreamBar(1L, d("2024-01-01"), 10.0, 10.0, 10.0, 10.0, 2L))
      q.processAllAvailable()
      input.addData(
        OhlcStreamBar(1L, d("2024-01-02"), 11.0, 11.0, 11.0, 11.0, 2L),
        OhlcStreamBar(1L, d("2024-01-03"), 9.9, 9.9, 9.9, 9.9, 2L))
      q.processAllAvailable()
      val got = spark.table("vpt_sink").as[VptPoint].collect()
        .map(p => p.date.toString -> (p.contrib_micro, p.vpt)).toMap
      // +10% then 9.9/11−1 = −10%, 2 ticks/bar
      assert(got === Map(
        "2024-01-01" -> ((0L, 0.0)),
        "2024-01-02" -> ((200000L, 0.2)),
        "2024-01-03" -> ((-200000L, 0.0))))
    } finally q.stop()
  }

  test("cusumStream equals the batch cusum operator for in-order feeds") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{CusumPoint, DailyTick}
    def d(s: String) = java.sql.Date.valueOf(s)
    val input = MemoryStream[DailyTick]
    val q = StreamingOps.cusumStream(input.toDS())
      .writeStream.format("memory").queryName("cusum_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        DailyTick(1L, d("2024-01-01"), 100.0), DailyTick(1L, d("2024-01-02"), 105.0))
      q.processAllAvailable()
      input.addData(
        DailyTick(1L, d("2024-01-03"), 110.25), DailyTick(1L, d("2024-01-04"), 109.1475),
        DailyTick(2L, d("2024-01-01"), 50.0), DailyTick(2L, d("2024-01-02"), 48.0))
      q.processAllAvailable()
      val got = spark.table("cusum_sink").as[CusumPoint].collect()
        .map(p => (p.asset_id, p.date.toString, p.ret, p.s_pos, p.s_neg, p.alarm)).toSet

      def tsOf(s: String) = new Timestamp(java.sql.Date.valueOf(s).getTime + 1000L)
      val panel = Seq(
        (1L, "2024-01-01", 100.0, 1L), (1L, "2024-01-02", 105.0, 2L),
        (1L, "2024-01-03", 110.25, 3L), (1L, "2024-01-04", 109.1475, 4L),
        (2L, "2024-01-01", 50.0, 5L), (2L, "2024-01-02", 48.0, 6L))
        .map { case (a, dt, v, s) => (a, d(dt), tsOf(dt), v, s) }
        .toDF("asset_id", "date", "ts", "value", "seq")
      val batch = graft.operators.Analytics.cusum(panel).collect()
        .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSet
      assert(got === batch)
      assert(got.exists(_._6), "the +5% run must alarm")
    } finally q.stop()
  }

  test("semanticDedupSink screens batches; survivors are visible to later batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = ((0 until 10).map(i => (i.toLong, Array(10f + i * 0.1f, 0f, 0f, 0f))) ++
      (10 until 20).map(i => (i.toLong, Array(0f, 10f + i * 0.1f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val cs = graft.operators.Ivf.train(emb, k = 2, iters = 3)
    val tmp = java.nio.file.Files.createTempDirectory("sem_sink").toString
    val idx = s"$tmp/index"
    graft.operators.Ivf.writeIndex(emb, cs, idx)
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.semanticDedupSink(
      input.toDF().toDF("vec_id", "embedding"), idx, cs, eps = 0.9,
      s"$tmp/verdicts", s"$tmp/ckpt")
    try {
      input.addData((100L, Array(11f, 0f, 0f, 0f)), (101L, Array(0f, 0f, 0f, 10f)))
      q.processAllAvailable()
      // 102 is parallel to batch-1 SURVIVOR 101: only the index append
      // made by batch 1 can catch it
      input.addData((102L, Array(0f, 0f, 0f, 20f)))
      q.processAllAvailable()
      val v = spark.read.parquet(s"$tmp/verdicts").collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("kept")).toMap
      assert(v === Map(100L -> false, 101L -> true, 102L -> false))
    } finally q.stop()
  }

  test("sourceStatsStream keeps running per-(source,lang) counts, change-only") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.{SourceDoc, SourceStat}
    val input = MemoryStream[SourceDoc]
    val q = StreamingOps.sourceStatsStream(input.toDS())
      .writeStream.format("memory").queryName("srcstats_sink")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        SourceDoc(1L, "src0", "en", 10L), SourceDoc(2L, "src0", "en", 5L),
        SourceDoc(3L, "src1", "de", 7L))
      q.processAllAvailable()
      val afterB1 = spark.table("srcstats_sink").as[SourceStat].collect()
      assert(afterB1.toSet === Set(
        SourceStat("src0", "en", 2L, 15L), SourceStat("src1", "de", 1L, 7L)))

      // batch 2 touches only src0 → src1 must emit NOTHING new
      input.addData(SourceDoc(4L, "src0", "en", 3L))
      q.processAllAvailable()
      val all = spark.table("srcstats_sink").as[SourceStat].collect()
      assert(all.length === 3)
      assert(all.count(_.source == "src1") === 1)
      // latest src0 row is the full running total — equal to a batch
      // aggregate over every row seen so far
      assert(all.filter(_.source == "src0").maxBy(_.n_docs) ===
        SourceStat("src0", "en", 3L, 18L))
    } finally q.stop()
  }

  test("dauStream counts each (user, day) once and converges to the batch DAU") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400
    val input = MemoryStream[Tick]
    val dau = StreamingOps.dauStream(
      input.toDS().toDF().withColumnRenamed("asset_id", "user_id"), "2 days")
    val q = dau.writeStream.format("memory").queryName("dau_sink")
      .outputMode(OutputMode.Update).start()
    try {
      // day 0: users 1 (twice — must count once) and 2; day 1: user 1
      input.addData(Tick(1L, ts(10), 1.0, 1L), Tick(1L, ts(20), 1.0, 2L),
        Tick(2L, ts(30), 1.0, 3L), Tick(1L, ts(day + 10), 1.0, 4L))
      q.processAllAvailable()
      input.addData(Tick(1L, ts(40), 1.0, 5L), Tick(3L, ts(50), 1.0, 6L)) // dup + new user, day 0
      q.processAllAvailable()
      // latest update per date == the batch DAU over everything seen
      val latest = spark.table("dau_sink").groupBy("date")
        .agg(org.apache.spark.sql.functions.max("dau").as("dau"))
        .collect().map(r => r.getDate(0).toString -> r.getAs[Long]("dau")).toMap
      assert(latest === Map("1970-01-01" -> 3L, "1970-01-02" -> 1L))
    } finally q.stop()
  }

  test("anomalyStream: causal z-score alerts fire only after minObs, only on spikes") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val alerts = StreamingOps.anomalyStream(input.toDS(), cut = 4.0, minObs = 5L)
    val q = alerts.writeStream.format("memory").queryName("alert_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // warmup batch: 6 benign ticks around 100 — below/at minObs, and a
      // spike WITHIN the warmup window that must not fire (only 2 seen
      // before it — the causal count gate)
      input.addData(
        Tick(1L, ts(10), 100.0, 1L), Tick(1L, ts(20), 101.0, 2L),
        Tick(1L, ts(25), 400.0, 3L), Tick(1L, ts(30), 99.0, 4L),
        Tick(1L, ts(40), 100.5, 5L), Tick(1L, ts(50), 99.5, 6L))
      q.processAllAvailable()
      assert(spark.table("alert_sink").count() === 0L)

      // next batch: a benign tick and a clear spike — only the spike fires,
      // scored against the 6-tick state (n_seen from state, not batch)
      input.addData(Tick(1L, ts(60), 100.2, 7L), Tick(1L, ts(70), 5000.0, 8L))
      q.processAllAvailable()
      val out = spark.table("alert_sink").as[StreamingOps.Alert].collect()
      assert(out.length === 1)
      assert(out(0).value === 5000.0)
      assert(out(0).n_seen === 7L)
      assert(out(0).z > 4.0)

      // state keeps evolving: another identical spike now scores lower
      // (the first one inflated σ) but the key's stats remain per-asset —
      // a different asset with no history emits nothing
      input.addData(Tick(2L, ts(80), 5000.0, 9L))
      q.processAllAvailable()
      assert(spark.table("alert_sink").count() === 1L)
    } finally q.stop()
  }

  test("tickRuleStream classifies sides with zero-tick inheritance across batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val sided = StreamingOps.tickRuleStream(input.toDS())
    val q = sided.writeStream.format("memory").queryName("side_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: 10 (no prev → 0), 11 (up), 11 (zero → inherits +1)
      input.addData(
        Tick(1L, ts(10), 10.0, 1L), Tick(1L, ts(20), 11.0, 2L),
        Tick(1L, ts(30), 11.0, 3L))
      q.processAllAvailable()
      val b1 = spark.table("side_sink").as[StreamingOps.SidedTick]
        .collect().sortBy(_.ts.getTime).map(_.side)
      assert(b1.toSeq === Seq(0, 1, 1))

      // batch 2: state carries the last value/side — 11 (zero → +1), 9 (down)
      input.addData(Tick(1L, ts(40), 11.0, 4L), Tick(1L, ts(50), 9.0, 5L))
      q.processAllAvailable()
      val b2 = spark.table("side_sink").as[StreamingOps.SidedTick]
        .collect().sortBy(_.ts.getTime).map(_.side)
      assert(b2.toSeq === Seq(0, 1, 1, 1, -1))

      // per-asset isolation: a fresh asset starts unclassified
      input.addData(Tick(2L, ts(60), 100.0, 6L))
      q.processAllAvailable()
      val a2 = spark.table("side_sink").as[StreamingOps.SidedTick]
        .collect().filter(_.asset_id == 2L).map(_.side)
      assert(a2.toSeq === Seq(0))
    } finally q.stop()
  }

  test("tickRuleStream matches the batch tickImbalance counts on replayed input") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val ticks = Seq(
      Tick(1L, ts(10), 10.0, 1L), Tick(1L, ts(20), 11.0, 2L),
      Tick(1L, ts(30), 11.0, 3L), Tick(1L, ts(40), 9.0, 4L),
      Tick(1L, ts(50), 12.0, 5L))
    val input = MemoryStream[Tick]
    val q = StreamingOps.tickRuleStream(input.toDS())
      .writeStream.format("memory").queryName("side_parity_sink")
      .outputMode(OutputMode.Append).start()
    try {
      ticks.foreach { t => input.addData(t); q.processAllAvailable() }
      val stream = spark.table("side_parity_sink").as[StreamingOps.SidedTick]
        .collect().filter(_.side != 0)
      val (buys, sells) = (stream.count(_.side == 1), stream.count(_.side == -1))
      val batch = graft.operators.Analytics.tickImbalance(
        ticks.toDF().withColumn("date", to_date(col("ts"))))
        .agg(sum("buy_ticks"), sum("sell_ticks")).collect()(0)
      assert(batch.getLong(0) === buys.toLong && batch.getLong(1) === sells.toLong)
    } finally q.stop()
  }

  test("streaming overnight gap emits on the first tick of a new day") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val q = StreamingOps.gapStream(input.toDS())
      .writeStream.format("memory").queryName("gap_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // day 0: two ticks (close = 12.0 at the later ts); no gap emitted
      input.addData(Tick(1L, ts(10), 10.0, 1L), Tick(1L, ts(20), 12.0, 2L))
      q.processAllAvailable()
      assert(spark.table("gap_sink").count() === 0L)
      // day 1 (separate micro-batch): first tick opens at 18.0 → gap 0.5
      input.addData(Tick(1L, ts(86400 + 10), 18.0, 3L))
      q.processAllAvailable()
      val rows = spark.table("gap_sink")
        .select("asset_id", "date", "open", "prev_close", "gap").collect()
      assert(rows.length === 1)
      assert(rows(0).getLong(0) === 1L)
      assert(rows(0).getDate(1).toString === "1970-01-02")
      assert(rows(0).getDouble(2) === 18.0)
      assert(rows(0).getDouble(3) === 12.0)
      assert(rows(0).getDouble(4) === 0.5)
    } finally q.stop()
  }

  test("streaming drawdown and rolling vol match their batch ops on replayed input") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.DailyTick
    val values = Seq(100.0, 110.0, 99.0, 120.0, 105.0, 126.0, 113.4, 130.0)
    val days = values.indices.map(i => java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"))
    // batch references on the equivalent 1-tick-per-day panel
    val panel = values.zipWithIndex.map { case (v, i) =>
      (1L, days(i), new java.sql.Timestamp((i + 1) * 1000L), v, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val batchDd = graft.operators.Analytics.drawdown(panel).collect()
      .map(r => (r.getDate(1).toString, r.getAs[Double]("drawdown"))).toMap
    val batchVol = graft.operators.Analytics.rollingVol(panel).collect()
      .map(r => (r.getDate(1).toString, (r.getAs[Double]("ret"), r.getAs[Double]("vol")))).toMap

    val inDd = MemoryStream[DailyTick]
    val qDd = StreamingOps.drawdownStream(inDd.toDS())
      .writeStream.format("memory").queryName("dd_sink")
      .outputMode(OutputMode.Append).start()
    val inVol = MemoryStream[DailyTick]
    val qVol = StreamingOps.rollingVolStream(inVol.toDS())
      .writeStream.format("memory").queryName("rv_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // replay in two micro-batches to cross a state boundary
      val ticks = values.zipWithIndex.map { case (v, i) => DailyTick(1L, days(i), v) }
      inDd.addData(ticks.take(4)); inVol.addData(ticks.take(4))
      qDd.processAllAvailable(); qVol.processAllAvailable()
      inDd.addData(ticks.drop(4)); inVol.addData(ticks.drop(4))
      qDd.processAllAvailable(); qVol.processAllAvailable()

      val gotDd = spark.table("dd_sink").collect()
        .map(r => (r.getDate(1).toString, r.getAs[Double]("drawdown"))).toMap
      assert(gotDd === batchDd)
      val gotVol = spark.table("rv_sink").collect()
        .map(r => (r.getDate(1).toString, (r.getAs[Double]("ret"), r.getAs[Double]("vol")))).toMap
      assert(gotVol === batchVol)
    } finally { qDd.stop(); qVol.stop() }
  }

  test("streaming OHLC bars: open/close follow (ts, seq) order, not arrival order") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val q = StreamingOps.ohlcStream(input.toDS().toDF(), "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("ohlc_sink")
      .outputMode(OutputMode.Update).start()
    try {
      // arrival order deliberately scrambles event order inside the
      // first window: open must be the ts(10) tick, close the ts(30)
      input.addData(
        Tick(1L, ts(30), 30.0, 2L), Tick(1L, ts(10), 10.0, 1L),
        Tick(1L, ts(20), 5.0, 3L), Tick(1L, ts(70), 70.0, 4L))
      q.processAllAvailable()
      val rows = spark.table("ohlc_sink")
        .select("asset_id", "open", "high", "low", "close", "n_ticks").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getLong(5))).toSet
      assert(rows === Set(
        (1L, 10.0, 30.0, 5.0, 30.0, 3L),
        (1L, 70.0, 70.0, 70.0, 70.0, 1L)))
    } finally q.stop()
  }

  test("donchianStream equals the batch donchian across a micro-batch boundary") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.DailyTick
    val values = Seq(100.0, 110.0, 99.0, 120.0, 105.0, 126.0, 113.4, 130.0)
    val days = values.indices.map(i => java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"))
    val panel = values.zipWithIndex.map { case (v, i) =>
      (1L, days(i), new java.sql.Timestamp((i + 1) * 1000L), v, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val batch = graft.operators.Analytics.donchian(panel).collect()
      .map(r => (r.getDate(1).toString,
        (r.getAs[Double]("ch_high"), r.getAs[Double]("ch_low"), r.getAs[Any]("ch_pos"))))
      .toMap
    val input = MemoryStream[DailyTick]
    val q = StreamingOps.donchianStream(input.toDS())
      .writeStream.format("memory").queryName("don_sink")
      .outputMode(OutputMode.Append).start()
    try {
      val ticks = values.zipWithIndex.map { case (v, i) => DailyTick(1L, days(i), v) }
      input.addData(ticks.take(3)); q.processAllAvailable()
      input.addData(ticks.drop(3)); q.processAllAvailable()
      val got = spark.table("don_sink").collect()
        .map(r => (r.getDate(1).toString,
          (r.getAs[Double]("ch_high"), r.getAs[Double]("ch_low"), r.getAs[Any]("ch_pos"))))
        .toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("obvStream equals the batch obv on a replayed bar feed") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.StreamBar
    // multi-tick panel so n_ticks varies per bar
    val rows = Seq(
      (1L, "2024-01-01", 1, 10.0), (1L, "2024-01-01", 2, 12.0),
      (1L, "2024-01-02", 3, 11.0), (1L, "2024-01-02", 4, 9.0), (1L, "2024-01-02", 5, 9.5),
      (1L, "2024-01-03", 6, 15.0),
      (1L, "2024-01-04", 7, 15.0), (1L, "2024-01-04", 8, 15.0))
      .map { case (a, d, t, v) =>
        (a, java.sql.Date.valueOf(d), new java.sql.Timestamp(t * 1000L), v, t.toLong)
      }.toDF("asset_id", "date", "ts", "value", "seq")
    val batch = graft.operators.Analytics.obv(rows).collect()
      .map(r => (r.getDate(1).toString,
        (r.getAs[Long]("signed_vol"), r.getAs[Long]("obv")))).toMap
    val bars = graft.operators.Analytics.dailyBars(rows).collect()
      .map(r => StreamBar(r.getAs[Long]("asset_id"), r.getAs[java.sql.Date]("date"),
        r.getAs[Double]("close"), r.getAs[Long]("n_ticks")))
      .sortBy(_.date.getTime)
    val input = MemoryStream[StreamBar]
    val q = StreamingOps.obvStream(input.toDS())
      .writeStream.format("memory").queryName("obv_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(bars.take(2)); q.processAllAvailable()
      input.addData(bars.drop(2)); q.processAllAvailable()
      val got = spark.table("obv_sink").collect()
        .map(r => (r.getDate(1).toString,
          (r.getAs[Long]("signed_vol"), r.getAs[Long]("obv")))).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("qualityGateStream emits the batch gopher_rules row per document") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val texts = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog and that " * 6 +
        "words have with more filler here now").trim),
      (2L, Seq.fill(60)("zebra").mkString(" ")))
    val docsDf = texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = graft.operators.Pipeline.gopherRules(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass_gopher")).toMap
    val input = MemoryStream[(Long, String, String, String, Long)]
    val q = StreamingOps.qualityGateStream(
      input.toDS().toDF("doc_id", "text", "lang", "source", "n_chars"))
      .writeStream.format("memory").queryName("gate_sink")
      .outputMode(OutputMode.Append).start()
    try {
      texts.foreach { case (id, t) => input.addData((id, t, "en", "s", t.length.toLong)) }
      q.processAllAvailable()
      val got = spark.table("gate_sink").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass_gopher")).toMap
      assert(got === batch)
      assert(got(1L) && !got(2L))
    } finally q.stop()
  }

  test("adLineStream and ultimateOscStream equal their batch ops on a replayed bar feed") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.FullStreamBar
    // two ticks per day → real high/low spreads
    val rows = Seq(
      (1L, "2024-01-01", 1, 10.0), (1L, "2024-01-01", 2, 12.0),
      (1L, "2024-01-02", 3, 11.0), (1L, "2024-01-02", 4, 14.0),
      (1L, "2024-01-03", 5, 13.0), (1L, "2024-01-03", 6, 12.5),
      (1L, "2024-01-04", 7, 15.0), (1L, "2024-01-04", 8, 16.5),
      (1L, "2024-01-05", 9, 16.0), (1L, "2024-01-05", 10, 15.2))
      .map { case (a, d, t, v) =>
        (a, java.sql.Date.valueOf(d), new java.sql.Timestamp(t * 1000L), v, t.toLong)
      }.toDF("asset_id", "date", "ts", "value", "seq")
    val batchAd = graft.operators.Analytics.adLine(rows).collect()
      .map(r => (r.getDate(1).toString,
        (r.getAs[Double]("mfv"), r.getAs[Double]("ad")))).toMap
    val batchUo = graft.operators.Analytics.ultimateOsc(rows).collect()
      .map(r => (r.getDate(1).toString,
        (r.getAs[Any]("a_fast"), r.getAs[Any]("uo")))).toMap
    val bars = graft.operators.Analytics.dailyBars(rows).collect()
      .map(r => FullStreamBar(r.getAs[Long]("asset_id"), r.getAs[java.sql.Date]("date"),
        r.getAs[Double]("high"), r.getAs[Double]("low"),
        r.getAs[Double]("close"), r.getAs[Long]("n_ticks")))
      .sortBy(_.date.getTime)
    val inAd = MemoryStream[FullStreamBar]
    val inUo = MemoryStream[FullStreamBar]
    val qAd = StreamingOps.adLineStream(inAd.toDS())
      .writeStream.format("memory").queryName("ad_sink")
      .outputMode(OutputMode.Append).start()
    val qUo = StreamingOps.ultimateOscStream(inUo.toDS())
      .writeStream.format("memory").queryName("uo_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // split across a micro-batch boundary to exercise state carry-over
      inAd.addData(bars.take(2)); qAd.processAllAvailable()
      inAd.addData(bars.drop(2)); qAd.processAllAvailable()
      inUo.addData(bars.take(3)); qUo.processAllAvailable()
      inUo.addData(bars.drop(3)); qUo.processAllAvailable()
      val gotAd = spark.table("ad_sink").collect()
        .map(r => (r.getDate(1).toString,
          (r.getAs[Double]("mfv"), r.getAs[Double]("ad")))).toMap
      assert(gotAd === batchAd)
      val gotUo = spark.table("uo_sink").collect()
        .map(r => (r.getDate(1).toString,
          (r.getAs[Any]("a_fast"), r.getAs[Any]("uo")))).toMap
      assert(gotUo === batchUo)
    } finally { qAd.stop(); qUo.stop() }
  }

  test("vwapStream: integer-cents cumulative VWAP resets at the day boundary") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.DatedTick
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-01-02")
    val input = MemoryStream[DatedTick]
    val q = StreamingOps.vwapStream(input.toDS())
      .writeStream.format("memory").queryName("vwap_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(DatedTick(1L, d1, 10.00, 1), DatedTick(1L, d1, 11.00, 2)))
      q.processAllAvailable()
      input.addData(Seq(DatedTick(1L, d1, 12.01, 3), DatedTick(1L, d2, 50.0, 4)))
      q.processAllAvailable()
      val got = spark.table("vwap_sink").collect()
        .sortBy(r => (r.getDate(1).getTime, r.getAs[Long]("volume")))
        .map(r => (r.getAs[Long]("volume"), r.getAs[Double]("notional"), r.getAs[Double]("vwap")))
      // day 1: 10.00 → 10.0; +11.00 → 10.5; +12.01 → 11.003333 (truncating micro div)
      assert(got(0) === ((1L, 10.00, 10.0)))
      assert(got(1) === ((2L, 21.00, 10.5)))
      assert(got(2) === ((3L, 33.01, 11.003333)))
      assert(got(3) === ((1L, 50.0, 50.0)))                    // day-boundary reset
    } finally q.stop()
  }

  test("heikinAshiStream and supertrendStream equal their batch ops across a split") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.OhlcStreamBar
    val rows = Seq(
      (1L, "2024-01-01", 1, 10.0), (1L, "2024-01-01", 2, 12.0),
      (1L, "2024-01-02", 3, 11.0), (1L, "2024-01-02", 4, 14.0),
      (1L, "2024-01-03", 5, 13.0), (1L, "2024-01-03", 6, 12.5),
      (1L, "2024-01-04", 7, 15.0), (1L, "2024-01-04", 8, 16.5),
      (1L, "2024-01-05", 9, 9.0), (1L, "2024-01-05", 10, 8.5),
      (1L, "2024-01-06", 11, 8.0), (1L, "2024-01-06", 12, 7.5))
      .map { case (a, d, t, v) =>
        (a, java.sql.Date.valueOf(d), new java.sql.Timestamp(t * 1000L), v, t.toLong)
      }.toDF("asset_id", "date", "ts", "value", "seq")
    val batchHa = graft.operators.Analytics.heikinAshi(rows).collect()
      .map(r => (r.getDate(1).toString,
        (r.getAs[Double]("ha_open"), r.getAs[Double]("ha_close"),
          r.getAs[Double]("ha_high"), r.getAs[Double]("ha_low")))).toMap
    val batchSt = graft.operators.Analytics.supertrend(rows).collect()
      .map(r => (r.getDate(1).toString,
        (r.getAs[Double]("fub"), r.getAs[Double]("flb"),
          r.getAs[Long]("dir"), r.getAs[Double]("supertrend")))).toMap
    val bars = graft.operators.Analytics.dailyBars(rows).collect()
      .map(r => OhlcStreamBar(r.getAs[Long]("asset_id"), r.getAs[java.sql.Date]("date"),
        r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
        r.getAs[Double]("close"), r.getAs[Long]("n_ticks")))
      .sortBy(_.date.getTime)
    val inHa = MemoryStream[OhlcStreamBar]
    val inSt = MemoryStream[OhlcStreamBar]
    val qHa = StreamingOps.heikinAshiStream(inHa.toDS())
      .writeStream.format("memory").queryName("ha_sink")
      .outputMode(OutputMode.Append).start()
    val qSt = StreamingOps.supertrendStream(inSt.toDS())
      .writeStream.format("memory").queryName("st_sink")
      .outputMode(OutputMode.Append).start()
    try {
      inHa.addData(bars.take(2)); qHa.processAllAvailable()
      inHa.addData(bars.drop(2)); qHa.processAllAvailable()
      inSt.addData(bars.take(3)); qSt.processAllAvailable()
      inSt.addData(bars.drop(3)); qSt.processAllAvailable()
      val gotHa = spark.table("ha_sink").collect()
        .map(r => (r.getDate(1).toString,
          (r.getAs[Double]("ha_open"), r.getAs[Double]("ha_close"),
            r.getAs[Double]("ha_high"), r.getAs[Double]("ha_low")))).toMap
      assert(gotHa === batchHa)
      val gotSt = spark.table("st_sink").collect()
        .map(r => (r.getDate(1).toString,
          (r.getAs[Double]("fub"), r.getAs[Double]("flb"),
            r.getAs[Long]("dir"), r.getAs[Double]("supertrend")))).toMap
      assert(gotSt === batchSt)
    } finally { qHa.stop(); qSt.stop() }
  }

  test("recursive streams drop out-of-order bars instead of folding them") {
    // r7 ADVICE: a bar arriving in a LATER micro-batch with an earlier
    // (or equal) date must not enter the recursion — it is dropped and
    // counted, so the emitted candles equal the in-order batch run.
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.OhlcStreamBar
    def bar(day: Int, v: Double) = OhlcStreamBar(
      1L, java.sql.Date.valueOf(f"2024-02-$day%02d"), v, v + 1, v - 1, v + 0.5, 1L)
    val inOrder = Seq(bar(1, 10.0), bar(2, 12.0), bar(3, 11.0), bar(4, 13.0))
    val in = MemoryStream[OhlcStreamBar]
    val q = StreamingOps.heikinAshiStream(in.toDS())
      .writeStream.format("memory").queryName("ha_late_sink")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(inOrder.take(3)); q.processAllAvailable()
      // day 2 re-arrives late (dup) plus a genuinely earlier day-1 bar
      // with different values that WOULD change the recursion if folded
      in.addData(Seq(bar(2, 99.0), bar(1, 55.0), bar(4, 13.0))); q.processAllAvailable()
      val got = spark.table("ha_late_sink").collect()
        .map(r => (r.getDate(1).toString, r.getAs[Double]("ha_open"), r.getAs[Double]("ha_close")))
        .sortBy(_._1)
      // reference: the same four bars streamed strictly in order
      val in2 = MemoryStream[OhlcStreamBar]
      val q2 = StreamingOps.heikinAshiStream(in2.toDS())
        .writeStream.format("memory").queryName("ha_late_ref")
        .outputMode(OutputMode.Append).start()
      try {
        in2.addData(inOrder); q2.processAllAvailable()
        val want = spark.table("ha_late_ref").collect()
          .map(r => (r.getDate(1).toString, r.getAs[Double]("ha_open"), r.getAs[Double]("ha_close")))
          .sortBy(_._1)
        assert(got.toSeq === want.toSeq)
      } finally q2.stop()
    } finally q.stop()
  }

  test("psarStream equals the batch psar across a split, including a flip") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.OhlcStreamBar
    val rows = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 10.0).zipWithIndex.map { case (v, i) =>
      (1L, java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"),
        new java.sql.Timestamp((i + 1) * 1000L), v, (i + 1).toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val batch = graft.operators.Analytics.psar(rows).collect()
      .map(r => (r.getDate(1).toString,
        (r.getAs[Double]("sar"), r.getAs[Double]("ep"),
          r.getAs[Double]("af"), r.getAs[Long]("dir")))).toMap
    val bars = graft.operators.Analytics.dailyBars(rows).collect()
      .map(r => OhlcStreamBar(r.getAs[Long]("asset_id"), r.getAs[java.sql.Date]("date"),
        r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
        r.getAs[Double]("close"), r.getAs[Long]("n_ticks")))
      .sortBy(_.date.getTime)
    val in = MemoryStream[OhlcStreamBar]
    val q = StreamingOps.psarStream(in.toDS())
      .writeStream.format("memory").queryName("psar_sink")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(bars.take(3)); q.processAllAvailable()
      in.addData(bars.drop(3)); q.processAllAvailable()
      val got = spark.table("psar_sink").collect()
        .map(r => (r.getDate(1).toString,
          (r.getAs[Double]("sar"), r.getAs[Double]("ep"),
            r.getAs[Double]("af"), r.getAs[Long]("dir")))).toMap
      assert(got === batch)
      assert(got("2024-01-06")._4 === -1L)                    // the crash flips short
    } finally q.stop()
  }

  test("smaCrossStream equals the batch sma_cross across a split") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.OhlcStreamBar
    val rows = (1 to 8).map { i =>
      (1L, java.sql.Date.valueOf(f"2024-01-$i%02d"),
        new java.sql.Timestamp(i * 1000L), i * 10.0, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val batch = graft.operators.Analytics.smaCross(rows).collect()
      .map(r => (r.getDate(1).toString,
        (r.getAs[Double]("sma_fast"), r.getAs[Double]("sma_slow"),
          r.getAs[Long]("cross")))).toMap
    val bars = graft.operators.Analytics.dailyBars(rows).collect()
      .map(r => OhlcStreamBar(r.getAs[Long]("asset_id"), r.getAs[java.sql.Date]("date"),
        r.getAs[Double]("open"), r.getAs[Double]("high"), r.getAs[Double]("low"),
        r.getAs[Double]("close"), r.getAs[Long]("n_ticks")))
      .sortBy(_.date.getTime)
    val in = MemoryStream[OhlcStreamBar]
    val q = StreamingOps.smaCrossStream(in.toDS())
      .writeStream.format("memory").queryName("smax_sink")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(bars.take(4)); q.processAllAvailable()
      in.addData(bars.drop(4)); q.processAllAvailable()
      val got = spark.table("smax_sink").collect()
        .map(r => (r.getDate(1).toString,
          (r.getAs[Double]("sma_fast"), r.getAs[Double]("sma_slow"),
            r.getAs[Long]("cross")))).toMap
      assert(got === batch)
      assert(got.values.count(_._3 == 1L) === 1)              // the one golden cross
    } finally q.stop()
  }
}
