package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-streaming face of the engine: the same bitemporal
  * semantics, continuously maintained.
  *
  * D1 `latestPerKey` is streaming `upsert_lww` (reference
  * src/btree/mem.rs:406/433 insert/update): per-key state holds the
  * current (ts, seq, value) champion; each micro-batch emits keys whose
  * champion changed. State is O(#keys) — keyed state store, scales with
  * executors.
  *
  * D2 `windowedAgg` is the event-time windowed aggregate with a
  * watermark bounding state retention.
  */
object StreamingOps {

  case class Tick(asset_id: Long, ts: Timestamp, value: Double, seq: Long)
  case class Latest(asset_id: Long, ts: Timestamp, value: Double, seq: Long)

  /** Epoch MICROseconds of a Timestamp — `getTime` alone truncates to
    * ms, which would make (ts, seq) event ordering and gap arithmetic
    * diverge from the batch/oracle side (µs-precision event time) on
    * sub-ms ties. All sequential folds order by this.
    */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** D1 — streaming last-write-wins: flatMapGroupsWithState keeping the
    * max-(ts, seq) tick per asset, emitting on change.
    */
  def latestPerKey(ticks: Dataset[Tick]): Dataset[Latest] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[Latest, Latest](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[Tick], state: GroupState[Latest]) =>
          def newer(aTs: Long, aSeq: Long, bTs: Long, bSeq: Long): Boolean =
            aTs > bTs || (aTs == bTs && aSeq > bSeq)
          val incoming = rows.foldLeft(Option.empty[Tick]) { (best, t) =>
            best match {
              case Some(b) if !newer(micros(t.ts), t.seq, micros(b.ts), b.seq) => best
              case _ => Some(t)
            }
          }
          val current = state.getOption
          incoming match {
            case Some(t)
              if current.forall(c => newer(micros(t.ts), t.seq, micros(c.ts), c.seq)) =>
              val next = Latest(assetId, t.ts, t.value, t.seq)
              state.update(next)
              Iterator(next)
            case _ => Iterator.empty
          }
      }
  }

  case class SessionAcc(start: Long, end: Long, n: Long)
  case class Session(asset_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** D4 — streaming sessionization: gap-closed sessions per key with an
    * event-time timeout (the streaming face of batch `sessionize`).
    * In-batch gaps close sessions immediately; the open session closes
    * when the watermark passes `last_event + gap` (state removed — no
    * unbounded growth).
    */
  def sessionizeStream(ticks: Dataset[Tick], gapSec: Long, watermark: String): Dataset[Session] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .withWatermark("ts", watermark)
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Tick], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val a = state.get
            state.remove()
            Iterator(Session(key, tsOfMicros(a.start), tsOfMicros(a.end), a.n))
          } else {
            val sorted = rows.toSeq.sortBy(t => (micros(t.ts), t.seq))
            val out = scala.collection.mutable.Buffer[Session]()
            var acc = state.getOption
            sorted.foreach { t =>
              val tUs = micros(t.ts)
              acc match {
                case Some(a) if tUs - a.end <= gapSec * 1000000 =>
                  acc = Some(a.copy(end = math.max(a.end, tUs), n = a.n + 1))
                case Some(a) =>
                  out += Session(key, tsOfMicros(a.start), tsOfMicros(a.end), a.n)
                  acc = Some(SessionAcc(tUs, tUs, 1))
                case None =>
                  acc = Some(SessionAcc(tUs, tUs, 1))
              }
            }
            acc.foreach { a =>
              state.update(a)
              state.setTimeoutTimestamp(a.end / 1000 + gapSec * 1000)
            }
            out.iterator
          }
      }
  }

  /** D3 — streaming exact dedup: drop repeat observations of a key
    * within the watermark horizon (the streaming face of `dedup_exact`;
    * state is bounded by the watermark, unlike an unbounded
    * `dropDuplicates`).
    */
  def dedupStream(ticks: DataFrame, watermark: String, keyCols: Seq[String]): DataFrame =
    ticks.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  case class BandHit(doc_id: Long, band_id: Int, bucket: Long, event_ts: Timestamp)
  case class DupCandidate(doc_id: Long, matched_doc_id: Long, band_id: Int)

  /** D6 — streaming near-dup candidate detection: MinHash LSH banding
    * over a document stream. Each doc's signature (MinHashSig kernel —
    * expressions work unchanged under streaming) explodes into band
    * buckets; per-bucket state remembers the first owner and every later
    * arrival in the same bucket emits a candidate pair. Downstream
    * verifies candidates (exact jaccard) and dedups pair multiplicity.
    *
    * State is one long per seen bucket, bounded via an EVENT-TIME TTL
    * (default ON): when `tsCol` names the document event-time column,
    * the stream is watermarked and a bucket owner expires once the
    * watermark passes `last_arrival + stateTtlMs` — state is bounded by
    * the TTL-window working set, and a bucket whose owner expired simply
    * re-seeds with the next arrival. Event-time (not processing-time)
    * timeout is deliberate: `FlatMapGroupsWithStateExec
    * .shouldRunAnotherBatch` is unconditionally true under
    * ProcessingTimeTimeout, which busy-loops empty micro-batches on an
    * always-on trigger. `tsCol = None` opts out (NoTimeout) for finite
    * backfill streams that need cross-stream candidates regardless of
    * event-time spread.
    */
  def nearDupCandidatesStream(docs: DataFrame, k: Int = 8, nHashes: Int = 64,
                              bands: Int = 16,
                              tsCol: Option[String] = Some("ts"),
                              stateTtlMs: Long = 3600L * 1000,
                              watermarkDelay: String = "10 seconds"): Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{posexplode, sequence, lit, slice, transform, xxhash64}
    val rows = nHashes / bands
    val withTs = tsCol match {
      case Some(c) => docs
        .select(col("doc_id"), col("text"), col(c).cast("timestamp").as("event_ts"))
        .withWatermark("event_ts", watermarkDelay)
      case None => docs
        .select(col("doc_id"), col("text"), lit(null).cast("timestamp").as("event_ts"))
    }
    val banded = withTs
      .select(col("doc_id"), col("event_ts"),
        graft.expressions.Kernels.minhashSig(col("text"), k, nHashes).as("sig"))
      .select(col("doc_id"), col("event_ts"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)), b))))
      .select(col("doc_id"), col("pos").cast("int").as("band_id"), col("col").as("bucket"),
        col("event_ts"))
      .as[BandHit]
    val timeoutConf =
      if (tsCol.isDefined) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(h => (h.band_id, h.bucket))
      .flatMapGroupsWithState[Long, DupCandidate](OutputMode.Append, timeoutConf) {
        (key: (Int, Long), hits: Iterator[BandHit], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = hits.toSeq
            val sorted = batch.map(_.doc_id).sorted
            val out = scala.collection.mutable.Buffer[DupCandidate]()
            var owner = state.getOption.getOrElse(-1L)
            sorted.foreach { d =>
              if (owner < 0) owner = d
              else if (d != owner) out += DupCandidate(d, owner, key._1)
            }
            if (owner >= 0) {
              state.update(owner)
              if (timeoutConf == GroupStateTimeout.EventTimeTimeout) {
                // withWatermark does NOT drop null event-time rows — they
                // flow through to here, so skip nulls in the max and fall
                // back to the watermark when the whole batch is null.
                val tss = batch.iterator.flatMap(h => Option(h.event_ts)).map(_.getTime)
                val maxTs = if (tss.hasNext) tss.max else Long.MinValue
                // must exceed the current watermark or Spark rejects it
                state.setTimeoutTimestamp(
                  math.max(maxTs, state.getCurrentWatermarkMs() + 1) + stateTtlMs)
              }
            }
            out.iterator
          }
      }
  }

  case class PackDoc(doc_id: Long, shard: Int, n_tokens: Long)
  case class PackState(pack_id: Long, used: Long)
  case class Packed(doc_id: Long, shard: Int, n_tokens: Long, pack_id: Long)

  /** D8 — streaming sequence packing: documents are greedily packed
    * into fixed-token-budget training batches per shard as they arrive
    * (the continuous face of batch `doc_pack`). State is ONE
    * (pack_id, used) pair per shard — O(shards), bounded by
    * construction, no timeout needed.
    *
    * Contract differences vs batch `doc_pack` (deliberate): the batch
    * op shards at fixed cumulative-token offsets (a doc may straddle a
    * boundary — pure cumsum division, embarrassingly parallel); the
    * stream packs TRUE GREEDY — a doc never splits, a pack closes when
    * the next doc would overflow it, and an oversized doc (> budget)
    * occupies a pack alone. Arrival order packs first (within a
    * micro-batch: doc_id order, deterministic).
    */
  def packStream(docs: Dataset[PackDoc], budget: Long): Dataset[Packed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, Packed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[PackDoc], state: GroupState[PackState]) =>
          var st = state.getOption.getOrElse(PackState(0L, 0L))
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            if (st.used > 0 && st.used + d.n_tokens > budget)
              st = PackState(st.pack_id + 1, 0L)
            st = PackState(st.pack_id, st.used + d.n_tokens)
            Packed(d.doc_id, shard, d.n_tokens, st.pack_id)
          }
          state.update(st)
          out.iterator
      }
  }

  case class FunnelEvent(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)
  case class FunnelProgress(user_id: Long, stage_reached: Int)

  /** D10 — continuously-maintained funnel: each user's greedy
    * subsequence depth through `stages` (the streaming face of batch
    * `funnel_stages`), emitting on every advance (Update mode). State
    * is ONE int per user — O(users), no growth with stream length.
    * Within a micro-batch events advance in (ts, event_id) order;
    * across batches the funnel is arrival-ordered (a late event cannot
    * retro-advance an earlier stage — same contract as packStream).
    */
  def funnelStream(events: Dataset[FunnelEvent], stages: Seq[String]): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Int, FunnelProgress](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[Int]) =>
          var st = state.getOption.getOrElse(0)
          val before = st
          rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            if (st < stages.length && e.event_type == stages(st)) st += 1
          }
          state.update(st)
          if (st != before) Iterator(FunnelProgress(uid, st)) else Iterator.empty
      }
  }

  /** D7 — stream-STREAM as-of join: enrich a live tick stream with the
    * latest reference value (another stream) at or before each tick's
    * event time, looking back at most `maxLag`.
    *
    * Spark-native composition: a watermarked interval join (state on
    * both sides bounded by watermark + the time-range condition) keyed
    * on asset_id, then a streaming aggregation picking the max-(ts,seq)
    * reference row per tick (`max_by` — chained stateful operators,
    * append mode). The lag bound is what makes distributed state
    * finite: each side retains only `maxLag + watermark` of history per
    * key, independent of stream length.
    */
  def streamStreamAsOf(ticks: DataFrame, refs: DataFrame,
                       maxLag: String = "1 hour",
                       watermark: String = "10 seconds"): DataFrame = {
    val l = ticks.withWatermark("ts", watermark)
    val r = refs
      .select(col("asset_id").as("r_asset_id"), col("ts").as("r_ts"),
        col("value").as("r_value"), col("seq").as("r_seq"))
      .withWatermark("r_ts", watermark)
    l.join(r,
        col("asset_id") === col("r_asset_id") &&
          col("r_ts") <= col("ts") &&
          col("r_ts") >= col("ts") - expr(s"interval $maxLag"),
        "leftOuter")
      .groupBy(col("asset_id"), col("ts"), col("seq"), col("value"))
      .agg(max_by(col("r_value"), struct(col("r_ts"), col("r_seq"))).as("asof_value"))
  }

  /** D5 — stream-static as-of enrichment: each streaming tick gets the
    * static panel's value as of its event date. Composition of batch
    * operators: [[graft.operators.Analytics.gapFill]] forward-fills the
    * static side over its calendar, turning the as-of lookup into a
    * plain equality stream-static join on (asset_id, date) — broadcast,
    * stateless, no streaming watermarks needed on the static side.
    */
  def streamStaticAsOf(ticks: DataFrame, staticPanel: DataFrame): DataFrame = {
    val filled = graft.operators.Analytics.gapFill(staticPanel)
      .select(col("asset_id"), col("date"), col("value_ff").as("ref_value"))
    ticks
      .withColumn("date", to_date(col("ts")))
      .join(org.apache.spark.sql.functions.broadcast(filled), Seq("asset_id", "date"), "left")
  }

  /** D12 — streaming maintenance of the MinHash band index
    * ([[graft.operators.Dedup.writeMinhashIndex]]): each micro-batch of
    * documents appends its (band_id, bucket, doc_id) rows into the
    * band-partitioned layout, so [[graft.operators.Dedup.probeMinhashIndex]]
    * always probes a fresh index — the dedup_incremental lifecycle,
    * continuously maintained. Append is at-least-once under retries;
    * duplicate index rows are harmless (the probe emits DISTINCT pairs).
    */
  def minhashIndexSink(docs: DataFrame, indexPath: String,
                       checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Dedup.minhashBanded(batch)
          .write.mode("append").partitionBy("band_id").parquet(indexPath)
      }
      .start()

  /** D16 — streaming SemDeDup ingestion: each embedding micro-batch is
    * screened against the materialized IVF cluster index under the
    * frozen quantizer (batch operator C42), survivors are appended to
    * the index so later batches see them, and per-batch verdicts land
    * in `verdictPath`. At-least-once safe the same way the band index
    * is: a replayed batch's survivors re-append, and the probe side is
    * a max-witness (duplicate index rows cannot flip any verdict —
    * max(cos, cos) = cos); replayed vectors self-match at cos 1.0 and
    * simply drop. Consequence for the verdict table: a replay writes a
    * SECOND verdict row (kept=false) for vectors it first kept —
    * consumers reduce by vec_id with `kept = any(kept)` (each row
    * carries its foreachBatch `epoch` for that reduction), the exactly-
    * once view over at-least-once appends. State lives entirely AT REST in the partitioned
    * index — the stream itself is stateless (no state store, no
    * watermark), which is what lets the screen run at ingest rates.
    */
  def semanticDedupSink(embeddings: DataFrame, indexPath: String,
                        centroids: Array[Array[Double]], eps: Double,
                        verdictPath: String,
                        checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val spark = batch.sparkSession
        val verdicts = graft.operators.Ivf
          .semanticDedupIncremental(spark, indexPath, centroids, batch, eps)
          .localCheckpoint(true) // verdict before the index moves under it
        // `epoch` is write provenance: consumers reducing at-least-once
        // verdicts take the FIRST epoch's row per vec_id (replay rows
        // can only flip kept→false) — it is what lets the replay
        // harness hash-check the clean-run chain.
        verdicts.withColumn("epoch",
          org.apache.spark.sql.functions.lit(epoch))
          .write.mode("append").parquet(verdictPath)
        val survivors = batch.join(
          verdicts.filter(org.apache.spark.sql.functions.col("kept"))
            .select("vec_id"), Seq("vec_id"))
        graft.operators.Ivf.writeIndexAppend(survivors, centroids, indexPath)
      }
      .start()

  case class TopkEvent(event_type: String, event_id: Long, user_id: Long, value: Double)
  case class TopkEntry(event_type: String, rank: Long, event_id: Long, user_id: Long, value: Double)

  /** D11 — continuously-maintained top-k per group: the streaming face
    * of batch `topk_per_group` (rank by value desc, event_id tie-break).
    * State is the current k champions per group — O(groups · k), fixed
    * regardless of stream length; each micro-batch merges its rows into
    * the champion list and re-emits the group's full ranked top-k only
    * when it CHANGED (Update mode). Convergence contract (spec-asserted):
    * once all events are processed, the latest emission per group equals
    * the batch operator's answer — order of arrival never matters
    * because merge-then-rank is associative over the champion set.
    */
  def topkStream(events: Dataset[TopkEvent], k: Int): Dataset[TopkEntry] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[List[TopkEvent], TopkEntry](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[TopkEvent], state: GroupState[List[TopkEvent]]) =>
          val before = state.getOption.getOrElse(Nil)
          val merged = (before ++ rows)
            .sortBy(e => (-e.value, e.event_id))
            .take(k)
          if (merged == before) Iterator.empty
          else {
            state.update(merged)
            merged.iterator.zipWithIndex.map { case (e, i) =>
              TopkEntry(etype, i + 1L, e.event_id, e.user_id, e.value)
            }
          }
      }
  }

  /** D14 — stream-static banded interval join: each arriving order is
    * matched to the same customer's prior orders 1..`windowDays` days
    * earlier in a STATIC history table (streaming face of batch B38
    * `interval_join`). The bucket trick is what makes this STREAMABLE:
    * replicating each history interval into its ≤2 window-width epoch
    * buckets turns the inequality join into a stream-static EQUALITY
    * join on (custkey, bucket) + a residual range filter — stateless
    * (no watermark, no state store), just a per-batch hash join against
    * the static side. A raw BETWEEN stream-static join would be a
    * per-batch nested loop.
    *
    * Columns as in [[graft.operators.AsOf.intervalJoin]]:
    * stream (o_custkey, o_orderkey, o_orderdate) × static history of
    * the same shape.
    */
  def intervalJoinStream(stream: DataFrame, history: DataFrame,
                         windowDays: Int = 30): DataFrame = {
    val iv = history
      .select(col("o_custkey"), col("o_orderkey").as("prev_orderkey"),
        col("o_orderdate").as("prev_orderdate"))
      .withColumn("b0", expr(s"datediff(prev_orderdate, DATE '1970-01-01') div $windowDays"))
      .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
      .drop("b0")
    stream
      .withColumn("bucket", expr(s"datediff(o_orderdate, DATE '1970-01-01') div $windowDays"))
      .join(iv, Seq("o_custkey", "bucket"))
      .withColumn("days_between",
        datediff(col("o_orderdate"), col("prev_orderdate")).cast("long"))
      .filter(col("days_between").between(1, windowDays))
      .select(col("o_custkey"), col("o_orderkey"), col("prev_orderkey"),
        col("o_orderdate"), col("prev_orderdate"), col("days_between"))
  }

  case class DailyTick(asset_id: Long, date: java.sql.Date, value: Double)
  case class EwmaState(vals: Seq[Double])
  case class EwmaPoint(asset_id: Long, date: java.sql.Date, value: Double, ewma: Double)

  /** D13 — continuously-maintained EWMA per asset: the streaming face of
    * batch B19 `ewma`. State per key is the last `span` values (bounded —
    * O(keys·span) total); each arriving row appends, trims, and replays
    * the SAME Horner folds as the batch kernel (`acc·w + x` over the
    * oldest→newest values, weight total `acc·w + 1`), then rounds with
    * the batch path's u6 micro-rounding — so for in-order
    * feeds every emitted point is bit-identical to the batch operator's
    * row (convergence spec-asserted). Rows within a micro-batch are
    * processed in date order; cross-batch late data is ingestion-ordered
    * (documented — the batch operator is the replayable source of truth
    * for full reprocessing).
    */
  def ewmaStream(daily: Dataset[DailyTick], alpha: Double = 0.1,
                 span: Int = 60): Dataset[EwmaPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    val w = 1.0 - alpha
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[EwmaState]) =>
          var vals = state.getOption.map(_.vals.toVector).getOrElse(Vector.empty[Double])
          val out = rows.toSeq.sortBy(_.date.getTime).map { t =>
            vals = (vals :+ t.value).takeRight(span)
            var s = 0.0
            var nw = 0.0
            vals.foreach { x => s = s * w + x; nw = nw * w + 1.0 }
            val ewma = graft.operators.Micro.jvm6(s / nw)
            EwmaPoint(assetId, t.date, t.value, ewma)
          }
          state.update(EwmaState(vals))
          out.iterator
      }
  }

  case class SourceDoc(doc_id: Long, source: String, lang: String, n_tokens: Long)
  case class SourceStat(source: String, lang: String, n_docs: Long, n_tokens: Long)

  /** D15 — continuously-maintained corpus composition report: running
    * doc/token counts per (source, lang), the streaming face of batch
    * C35 `source_stats` (minus its corpus-wide duplicate fraction,
    * which needs every text hash ever seen — unbounded state by
    * definition; the composition counts are the part an ingestion
    * dashboard actually polls). State is two longs per live (source,
    * lang) — O(groups) total — and emission is change-only: a batch
    * touching no docs of a group emits nothing for it. Counts are
    * integers, so the running state equals the batch aggregate over
    * all rows seen, in any arrival order.
    */
  def sourceStatsStream(docs: Dataset[SourceDoc]): Dataset[SourceStat] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(d => (d.source, d.lang))
      .flatMapGroupsWithState[(Long, Long), SourceStat](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case ((source, lang), rows, state) =>
          val (docs0, toks0) = state.getOption.getOrElse((0L, 0L))
          var nDocs = docs0
          var nToks = toks0
          rows.foreach { r => nDocs += 1; nToks += r.n_tokens }
          if (nDocs == docs0) Iterator.empty
          else {
            state.update((nDocs, nToks))
            Iterator.single(SourceStat(source, lang, nDocs, nToks))
          }
      }
  }

  /** D17 — continuously-maintained DAU (streaming face of batch
    * `active_users`'s DAU side): watermark-bounded first-observation
    * dedup of (user, day) — `dropDuplicatesWithinWatermark`, so state
    * is one entry per ACTIVE (user, day) inside the horizon, not per
    * event — feeding an update-mode count per event-day. Emits the
    * running DAU as it grows; late events beyond the watermark drop.
    * The trailing-WAU face stays batch (its 7-day explode needs no
    * state the DAU dedup doesn't already hold).
    */
  def dauStream(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .withColumn("date", col("ts").cast("date"))
      .dropDuplicatesWithinWatermark("user_id", "date")
      .groupBy(col("date"))
      .agg(count(lit(1)).as("dau"))

  case class AnomalyState(n: Long, mean: Double, m2: Double)
  case class Alert(asset_id: Long, ts: Timestamp, value: Double, z: Double, n_seen: Long)

  /** D18 — causal per-asset anomaly alerts: each tick is scored against
    * the running mean/σ of everything seen BEFORE it (Welford state — 3
    * numbers per key, O(#assets) total), then folded into the state.
    * Emits ticks with |z| > `cut` once `minObs` observations exist.
    *
    * This is the streaming face of batch `anomaly_mad` with the
    * estimator swapped deliberately: the batch operator is
    * retrospective and robust (exact median/MAD over the full series);
    * a streaming exact median would need per-key value history, so the
    * causal face uses Welford mean/σ — constant state, one pass, and
    * alerts fire on arrival rather than at end-of-day. An alerted spike
    * DOES then inflate σ (it enters the state); self-exclusion beyond
    * that is the batch operator's job on replay.
    *
    * Ordering contract (same as [[ewmaStream]]): rows within a
    * micro-batch are scored in (ts, seq) order; cross-batch late data
    * is scored against whatever state exists at arrival — the batch
    * operator is the replayable source of truth.
    */
  def anomalyStream(ticks: Dataset[Tick], cut: Double = 4.0,
                    minObs: Long = 10L): Dataset[Alert] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AnomalyState, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[Tick], state: GroupState[AnomalyState]) =>
          var st = state.getOption.getOrElse(AnomalyState(0L, 0.0, 0.0))
          val out = Vector.newBuilder[Alert]
          rows.toSeq.sortBy(t => (micros(t.ts), t.seq)).foreach { t =>
            if (st.n >= math.max(minObs, 2L)) {
              val sd = math.sqrt(st.m2 / (st.n - 1))
              if (sd > 0) {
                val z = (t.value - st.mean) / sd
                if (math.abs(z) > cut) out += Alert(assetId, t.ts, t.value, z, st.n)
              }
            }
            val n1 = st.n + 1
            val d = t.value - st.mean
            val mean1 = st.mean + d / n1
            st = AnomalyState(n1, mean1, st.m2 + d * (t.value - mean1))
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class TickSideState(last_value: Double, last_side: Int)
  case class SidedTick(asset_id: Long, ts: Timestamp, value: Double, side: Int)

  /** D19 `tickRuleStream` — streaming tick-rule order-flow
    * classification, the continuous face of
    * [[graft.operators.Analytics.tickImbalance]]: each tick is a buy
    * (+1) on an uptick, a sell (−1) on a downtick, and inherits the
    * last non-zero side on a zero tick. Per-asset state is TWO fields
    * (last value, last side) — O(#assets), no TTL needed. Ticks before
    * any price move classify as side 0 and are emitted (the batch op
    * filters them; downstream can). Within a micro-batch rows apply in
    * (ts, seq) order; cross-batch late data inherits arrival order —
    * the documented arrival-ordered contract shared with
    * [[anomalyStream]]/[[ewmaStream]].
    */
  def tickRuleStream(ticks: Dataset[Tick]): Dataset[SidedTick] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[TickSideState, SidedTick](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[Tick], state: GroupState[TickSideState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[SidedTick]
          rows.toSeq.sortBy(t => (micros(t.ts), t.seq)).foreach { t =>
            val side =
              if (st == null) 0
              else if (t.value > st.last_value) 1
              else if (t.value < st.last_value) -1
              else st.last_side
            out += SidedTick(assetId, t.ts, t.value, side)
            st = TickSideState(t.value, side)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class LateAuditState(max_micros: Long, max_seq: Long,
                            events: Long, regressed: Long)
  case class LateAuditPoint(asset_id: Long, ts: Timestamp, seq: Long, value: Double,
                            late: Boolean, events_so_far: Long, regressed_so_far: Long)

  /** D186 `lateArrivalAudit` — late-data OBSERVABILITY for the
    * arrival-ordered indicator twins. Every twin in this file shares
    * the same ordering contract: rows within a micro-batch apply in
    * (µs ts, seq) order, a cross-batch regressed-event-time row folds
    * in ARRIVAL order. That contract is honest but — without this op —
    * silently violated by a production feed that delivers late data:
    * nothing in any twin's output says "this point was computed out of
    * event-time order". This monitor is the shared observability
    * stage: run it on the same keyed feed (same groupByKey shuffle,
    * O(#keys) state — four fields) and every tick comes back annotated
    * with `late` (its (ts, seq) regressed behind the per-key
    * high-water mark) plus running events/regressed counters, so a
    * contract violation is a metric, not a silent skew. In-batch
    * ordering and the high-water comparison use the exact (µs, seq)
    * key the twins sort by, so `late` = "some twin folded this row
    * against state that already saw a later event".
    *
    * Cost of composing: ONE extra hash-partition exchange of the raw
    * feed (the monitor is its own stateful operator, and streaming
    * stateful ops don't share exchanges) with 4 longs of state per
    * key and zero row amplification — the audit branch is strictly
    * cheaper than any indicator twin it monitors, so it rides along
    * at whatever rate the pipeline already sustains.
    */
  def lateArrivalAudit(ticks: Dataset[Tick]): Dataset[LateAuditPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[LateAuditState, LateAuditPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[Tick], state: GroupState[LateAuditState]) =>
          var st = state.getOption.getOrElse(
            LateAuditState(Long.MinValue, Long.MinValue, 0L, 0L))
          val out = Vector.newBuilder[LateAuditPoint]
          rows.toSeq.sortBy(t => (micros(t.ts), t.seq)).foreach { t =>
            val m = micros(t.ts)
            val late = m < st.max_micros || (m == st.max_micros && t.seq < st.max_seq)
            st = LateAuditState(
              if (late) st.max_micros else m,
              if (late) st.max_seq else t.seq,
              st.events + 1,
              st.regressed + (if (late) 1L else 0L))
            out += LateAuditPoint(assetId, t.ts, t.seq, t.value, late,
              st.events, st.regressed)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class DrawdownState(peak: Double)
  case class DrawdownPoint(asset_id: Long, date: java.sql.Date, value: Double,
                           peak: Double, drawdown: Option[Double])

  /** D23 `drawdownStream` — running peak-to-trough drawdown, the
    * continuous face of [[graft.operators.Analytics.drawdown]]: state
    * is ONE double (the running peak) per asset; each daily value
    * emits value/peak − 1 against the updated peak, u6 micro-rounded like
    * the batch ratio, so in-order replays match the batch rows exactly
    * (spec-asserted). A zero peak yields a None drawdown — the batch
    * op's NULL, never a division error. O(#assets) state, no TTL.
    */
  def drawdownStream(daily: Dataset[DailyTick]): Dataset[DrawdownPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[DrawdownState, DrawdownPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[DrawdownState]) =>
          var peak = state.getOption.map(_.peak).getOrElse(Double.NegativeInfinity)
          val out = rows.toSeq.sortBy(_.date.getTime).map { t =>
            peak = math.max(peak, t.value)
            val dd =
              if (peak == 0.0) None
              else Some(graft.operators.Micro.jvm6(t.value / peak - 1.0))
            DrawdownPoint(assetId, t.date, t.value, peak, dd)
          }
          state.update(DrawdownState(peak))
          out.iterator
      }
  }

  case class RollVolState(last_value: Double, rets: Seq[Double])
  case class RollVolPoint(asset_id: Long, date: java.sql.Date, ret: Double, vol: Double)

  /** D24 `rollingVolStream` — N-day rolling volatility, the continuous
    * face of [[graft.operators.Analytics.rollingVol]]: per-asset state
    * is the last value plus a bounded ring of the last `window` 6-dec
    * returns. The std uses the identical n·Σx²−(Σx)² form with the
    * ring folded in date order, so in-order replays match the batch
    * rows bit-for-bit (spec-asserted; emission starts at 2 returns,
    * the batch n ≥ 2 gate). State is O(window) doubles per asset.
    */
  def rollingVolStream(daily: Dataset[DailyTick], window: Int = 20): Dataset[RollVolPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RollVolState, RollVolPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RollVolState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[RollVolPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st == null) {
              st = RollVolState(t.value, Vector.empty)
            } else {
              if (st.last_value != 0.0) {
                val ret = graft.operators.Micro.jvm6(t.value / st.last_value - 1.0)
                val rets = (st.rets :+ ret).takeRight(window)
                if (rets.size >= 2) {
                  var s = 0.0; var s2 = 0.0
                  rets.foreach { x => s += x; s2 += x * x }
                  val n = rets.size.toDouble
                  val vol = graft.operators.Micro.jvm6(
                    math.sqrt(math.max((n * s2 - s * s) / (n * (n - 1)), 0.0)))
                  out += RollVolPoint(assetId, t.date, ret, vol)
                }
                st = RollVolState(t.value, rets)
              } else {
                // zero prior value: no return (batch filters the NULL);
                // the ring carries over unchanged
                st = RollVolState(t.value, st.rets)
              }
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class CorrTick(asset_id: Long, date: java.sql.Date, ret: Double, mkt_ret: Double)
  case class RollCorrState(pairs: Vector[(Double, Double)])
  case class RollCorrPoint(asset_id: Long, date: java.sql.Date, ret: Double,
                           mkt_ret: Double, corr: Option[Double])

  /** D40 `rollingCorrStream` — streaming face of B197 `rolling_corr`:
    * rolling correlation vs the market, maintained per asset with a
    * ring of the last `window` (ret, mkt_ret) pairs (O(#assets ·
    * window) state). The market return arrives ON the tick (an
    * exchange-published index leg — the realistic stream shape; the
    * replay feed derives it from the same relation the batch op uses),
    * so no cross-key state is needed. Ring sums run left-to-right in
    * date order (≡ the batch fold), roundings ride jvm6, and the
    * zero-variance guard mirrors the batch NULL.
    */
  def rollingCorrStream(ticks: Dataset[CorrTick], window: Int = 20): Dataset[RollCorrPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RollCorrState, RollCorrPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[CorrTick], state: GroupState[RollCorrState]) =>
          var ring = state.getOption.map(_.pairs).getOrElse(Vector.empty)
          val out = Vector.newBuilder[RollCorrPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ ((t.ret, t.mkt_ret))).takeRight(window)
            if (ring.size >= 2) {
              val n = ring.size.toDouble
              var sa = 0.0; var sm = 0.0; var sp = 0.0; var sa2 = 0.0; var sm2 = 0.0
              ring.foreach { case (a, m) =>
                sa += a; sm += m; sp += a * m; sa2 += a * a; sm2 += m * m
              }
              val vna = n * sa2 - sa * sa
              val vnm = n * sm2 - sm * sm
              val corr =
                if (vna <= 0 || vnm <= 0) None
                else Some(graft.operators.Micro.jvm6(
                  (n * sp - sa * sm) / math.sqrt(vna * vnm)))
              out += RollCorrPoint(assetId, t.date, t.ret, t.mkt_ret, corr)
            }
          }
          state.update(RollCorrState(ring))
          out.result().iterator
      }
  }

  case class RollVarState(last_value: Double, rets: Vector[Double])
  case class RollVarPoint(asset_id: Long, date: java.sql.Date, n_days: Long,
                          n_tail: Long, var_q: Double, cvar: Double)

  /** D39 `rollingVarStream` — streaming face of B199 `rolling_var`:
    * rolling historical VaR/CVaR per asset, maintained with a ring of
    * the last `window` LWW daily returns (O(#assets · window) state,
    * no TTL — the panel's asset set is bounded). Each emission sorts
    * its ≤`window`-element ring and takes the ⌈q·n⌉ tail, bit-matching
    * the batch twin: same jvm6 return rounding, same ascending
    * left-to-right tail sum, same integer cut.
    */
  def rollingVarStream(daily: Dataset[DailyTick], window: Int = 20,
                       q: Double = 0.25, minN: Int = 8): Dataset[RollVarPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RollVarState, RollVarPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RollVarState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[RollVarPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st == null) {
              st = RollVarState(t.value, Vector.empty)
            } else if (st.last_value != 0.0) {
              val ret = graft.operators.Micro.jvm6(t.value / st.last_value - 1.0)
              val rets = (st.rets :+ ret).takeRight(window)
              if (rets.size >= minN) {
                val sorted = rets.sorted
                val k = math.ceil(sorted.size * q).toInt
                var s = 0.0
                var i = 0
                while (i < k) { s += sorted(i); i += 1 }
                out += RollVarPoint(assetId, t.date, rets.size.toLong, k.toLong,
                  sorted(k - 1), graft.operators.Micro.jvm6(s / k))
              }
              st = RollVarState(t.value, rets)
            } else {
              // zero prior value: no return (batch filters the NULL);
              // the ring carries over unchanged
              st = RollVarState(t.value, st.rets)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class DispState(vals: Vector[Double])
  case class DispPoint(asset_id: Long, date: java.sql.Date, disparity: Option[Double])

  /** D35 `disparityStream` — streaming face of B186 `disparity`: the
    * percent stretch from the n-day SMA, maintained per asset with a
    * ring of the last n LWW daily values (O(#assets · n) state, no
    * TTL). The ring sums left-to-right in date order (≡ the batch
    * seqFold) and both roundings ride [[graft.operators.Micro.jvm6]],
    * so in-order feeds emit the batch rows bit-for-bit. SMA 0 emits
    * NULL like the batch guard. Arrival-ordered contract across
    * batches, as documented on [[anomalyStream]].
    */
  def disparityStream(daily: Dataset[DailyTick], n: Int = 13): Dataset[DispPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[DispState, DispPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[DispState]) =>
          var vals = state.getOption.map(_.vals).getOrElse(Vector.empty)
          val out = Vector.newBuilder[DispPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            vals = (vals :+ t.value).takeRight(n)
            var s = 0.0
            vals.foreach(s += _) // left fold in date order ≡ batch seqFold
            val sma = graft.operators.Micro.jvm6(s / vals.size)
            val disp =
              if (sma == 0.0) None
              else Some(graft.operators.Micro.jvm6(100.0 * (t.value - sma) / sma))
            out += DispPoint(assetId, t.date, disp)
          }
          state.update(DispState(vals))
          out.result().iterator
      }
  }

  case class CmoState(last: Double, ds: Vector[Double])
  case class CmoPoint(asset_id: Long, date: java.sql.Date, cmo: Option[Double])

  /** D36 `cmoStream` — streaming face of B183 `chande_momentum`: the
    * unsmoothed gain/loss oscillator over the last n daily changes,
    * state = last value + a ring of n deltas per asset (O(#assets·n),
    * no TTL). Plain sums accumulate in date order (the batch weight-1
    * horner fold multiplies by exactly 1.0 — bit-identical to +=),
    * u6 via jvm6; an all-flat ring (denominator 0) emits NULL; the
    * first tick per asset emits nothing (the batch drops the NULL
    * first delta). Arrival-ordered contract across batches.
    */
  def cmoStream(daily: Dataset[DailyTick], n: Int = 14): Dataset[CmoPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CmoState, CmoPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[CmoState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[CmoPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st == null) {
              st = CmoState(t.value, Vector.empty)
            } else {
              val d = t.value - st.last
              val ds = (st.ds :+ d).takeRight(n)
              var su = 0.0
              var sd = 0.0
              ds.foreach { x =>
                su += math.max(x, 0.0)
                sd += math.max(-x, 0.0)
              }
              val cmo =
                if (su + sd == 0.0) None
                else Some(graft.operators.Micro.jvm6(100.0 * (su - sd) / (su + sd)))
              out += CmoPoint(assetId, t.date, cmo)
              st = CmoState(t.value, ds)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class ImiState(bodies: Vector[Double])
  case class ImiPoint(asset_id: Long, date: java.sql.Date, imi: Option[Double])

  /** D37 `imiStream` — streaming face of B185 `imi`: RSI arithmetic on
    * candle bodies (close − open) over a ring of the last n daily
    * bars' bodies per asset (O(#assets·n) state, no TTL). Plain sums
    * in date order (≡ the batch weight-1 horner folds), jvm6 emit; a
    * doji-only ring (denominator 0) emits NULL. Every bar emits (the
    * batch frame is partial from the first bar). Arrival-ordered
    * contract across batches, as documented on [[anomalyStream]].
    */
  def imiStream(bars: Dataset[OhlcStreamBar], n: Int = 14): Dataset[ImiPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ImiState, ImiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[ImiState]) =>
          var bodies = state.getOption.map(_.bodies).getOrElse(Vector.empty)
          val out = Vector.newBuilder[ImiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            bodies = (bodies :+ (b.close - b.open)).takeRight(n)
            var g = 0.0
            var l = 0.0
            bodies.foreach { x =>
              g += math.max(x, 0.0)
              l += math.max(-x, 0.0)
            }
            val imi =
              if (g + l == 0.0) None
              else Some(graft.operators.Micro.jvm6(100.0 * g / (g + l)))
            out += ImiPoint(assetId, b.date, imi)
          }
          state.update(ImiState(bodies))
          out.result().iterator
      }
  }

  case class VptState(last_close: Double, vpt_micro: Long)
  case class VptPoint(asset_id: Long, date: java.sql.Date,
                      contrib_micro: Long, vpt: Double)

  /** D38 `vptStream` — streaming face of B193 `vpt`: per-asset state
    * is the last close plus the running INTEGER micro sum (two
    * numbers, O(#assets), no TTL) — integer state means the running
    * sum is replay/arrival-order stable wherever ordering is
    * preserved, the cusumStream discipline. First bar (and a zero
    * prior close, the batch NULL-ret guard) contributes 0.
    */
  def vptStream(bars: Dataset[OhlcStreamBar]): Dataset[VptPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VptState, VptPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[VptState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[VptPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val contrib =
              if (st == null || st.last_close == 0.0) 0L
              else {
                val ret = graft.operators.Micro.jvm6(b.close / st.last_close - 1.0)
                // u6 rets are micro-integer-valued; the product is never
                // near a half, so Math.round == the Column-side round
                Math.round(ret * 1000000.0) * b.n_ticks
              }
            val cum = (if (st == null) 0L else st.vpt_micro) + contrib
            out += VptPoint(assetId, b.date, contrib, cum.toDouble / 1000000.0)
            st = VptState(b.close, cum)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class CusumState(last_value: Double, s_pos: Long, s_neg: Long)
  case class CusumPoint(asset_id: Long, date: java.sql.Date, ret: Double,
                        s_pos: Double, s_neg: Double, alarm: Boolean)

  /** D20 `cusumStream` — streaming two-sided CUSUM change detection,
    * the continuous face of [[graft.operators.Analytics.cusum]]. Here
    * the Page recursion runs DIRECTLY (s⁺ = max(0, s⁺ + r − k) in
    * micro-unit integers) — streaming state is exactly the two
    * accumulators the batch op re-derives via its cumsum/cummin
    * identity, so for in-order feeds the emitted points equal the
    * batch rows bit-for-bit (integer state, same u6 return
    * rounding). Per-asset state is one double + two longs — O(#assets),
    * no TTL needed. Arrival-ordered contract across batches, as
    * documented on [[anomalyStream]].
    */
  def cusumStream(daily: Dataset[DailyTick], kMicro: Long = 2500,
                  hMicro: Long = 30000): Dataset[CusumPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[CusumState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[CusumPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st != null && st.last_value != 0.0) {
              val ret = graft.operators.Micro.jvm6(t.value / st.last_value - 1.0)
              val retU = math.floor(ret * 1000000.0 + 0.5).toLong
              val sPos = math.max(0L, st.s_pos + retU - kMicro)
              val sNeg = math.min(0L, st.s_neg + retU + kMicro)
              out += CusumPoint(assetId, t.date, ret,
                sPos.toDouble / 1000000.0, sNeg.toDouble / 1000000.0,
                sPos > hMicro || sNeg < -hMicro)
              st = CusumState(t.value, sPos, sNeg)
            } else {
              // first tick, or a zero prior value (no return): the
              // batch op filters the null-ret row but carries the
              // accumulators — mirror that
              val (p0, n0) = if (st == null) (0L, 0L) else (st.s_pos, st.s_neg)
              st = CusumState(t.value, p0, n0)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** D2 — event-time tumbling-window aggregate with watermark. */
  def windowedAgg(ticks: DataFrame, windowLen: String, watermark: String): DataFrame =
    ticks
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("asset_id"))
      .agg(
        count(lit(1)).as("n_ticks"),
        min(col("value")).as("low"),
        max(col("value")).as("high"))
      .select(
        col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("asset_id"), col("n_ticks"), col("low"), col("high"))

  case class GapState(epoch_day: Long, close_value: Double)
  // LocalDate, not java.sql.Date: the epoch-day → date mapping must not
  // depend on the JVM default timezone (ticks are UTC event time)
  case class GapPoint(asset_id: Long, date: java.time.LocalDate, open: Double,
                      prev_close: Double, gap: Double)

  /** D22 `gapStream` — streaming overnight-gap detection, the
    * continuous face of [[graft.operators.Analytics.overnightGap]]:
    * per-asset state carries just (current UTC day, running close); the
    * first tick of a NEW day emits open-vs-prior-close immediately —
    * the gap alert a desk wants at the open, not after the daily batch.
    * Same u6 micro-rounding as the batch ratio, so in-order
    * replays match the batch rows exactly (spec-asserted). State is two
    * numbers per asset, O(#assets); arrival-ordered contract across
    * batches as documented on [[anomalyStream]]; days older than the
    * state's current day are ignored (late data never rewrites an
    * already-emitted open).
    */
  def gapStream(ticks: Dataset[Tick]): Dataset[GapPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[GapState, GapPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[Tick], state: GroupState[GapState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[GapPoint]
          rows.toSeq.sortBy(t => (micros(t.ts), t.seq)).foreach { t =>
            val day = Math.floorDiv(micros(t.ts), 86400000000L)
            if (st == null || day == st.epoch_day) {
              st = GapState(day, t.value)
            } else if (day > st.epoch_day) {
              if (st.close_value != 0.0) {
                val gap = graft.operators.Micro.jvm6(t.value / st.close_value - 1.0)
                out += GapPoint(assetId,
                  java.time.LocalDate.ofEpochDay(day), t.value, st.close_value, gap)
              }
              st = GapState(day, t.value)
            } // day < st.epoch_day: late tick for a closed day — ignored
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class DonchianState(values: Seq[Double])
  case class DonchianPoint(asset_id: Long, date: java.sql.Date, value: Double,
                           ch_high: Double, ch_low: Double, ch_pos: Option[Double])

  /** D25 `donchianStream` — streaming Donchian channel, the continuous
    * face of [[graft.operators.Analytics.donchian]]: per-asset state is
    * a bounded ring of the last `window` daily values; each tick emits
    * the channel extremes and the u6 position, NULL on a flat channel —
    * exactly the batch columns, so in-order replays match bit-for-bit
    * (spec-asserted across a micro-batch boundary). State is O(window)
    * doubles per asset; arrival-ordered contract across batches as
    * documented on [[anomalyStream]].
    */
  def donchianStream(daily: Dataset[DailyTick], window: Int = 20): Dataset[DonchianPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[DonchianState, DonchianPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[DonchianState]) =>
          var ring = state.getOption.map(_.values).getOrElse(Vector.empty)
          val out = rows.toSeq.sortBy(_.date.getTime).map { t =>
            ring = (ring :+ t.value).takeRight(window)
            val hi = ring.max
            val lo = ring.min
            val pos =
              if (hi == lo) None
              else Some(graft.operators.Micro.jvm6((t.value - lo) / (hi - lo)))
            DonchianPoint(assetId, t.date, t.value, hi, lo, pos)
          }
          state.update(DonchianState(ring))
          out.iterator
      }
  }

  case class StreamBar(asset_id: Long, date: java.sql.Date, close: Double, n_ticks: Long)
  case class ObvState(prev_close: Double, obv: Long)
  case class ObvPoint(asset_id: Long, date: java.sql.Date, close: Double,
                      signed_vol: Long, obv: Long)

  /** D26 `obvStream` — streaming on-balance volume over a bar feed, the
    * continuous face of [[graft.operators.Analytics.obv]]: per-asset
    * state is (previous close, running OBV) — two numbers, O(#assets).
    * ALL-INTEGER accumulation (sign·n_ticks), so stream and batch agree
    * exactly under any replay; first bar contributes 0, the batch
    * convention. Arrival-ordered contract across batches.
    */
  def obvStream(bars: Dataset[StreamBar]): Dataset[ObvPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ObvState, ObvPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[StreamBar], state: GroupState[ObvState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[ObvPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val signed =
              if (st == null) 0L
              else if (b.close > st.prev_close) b.n_ticks
              else if (b.close < st.prev_close) -b.n_ticks
              else 0L
            val obv = (if (st == null) 0L else st.obv) + signed
            out += ObvPoint(assetId, b.date, b.close, signed, obv)
            st = ObvState(b.close, obv)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** D27 `qualityGateStream` — the Gopher rule gate at INGEST time: the
    * stateless per-document projection
    * ([[graft.operators.Pipeline.gopherRulesCore]]) applied to a
    * streaming documents frame — every rule boolean plus `pass_gopher`,
    * so a pipeline can fork keep/reject sinks before anything is
    * stored. Stateless ⇒ no watermark, no state store, scan-speed;
    * stream rows equal the batch rows by construction (one shared
    * implementation — spec-asserted anyway).
    */
  def qualityGateStream(docs: DataFrame): DataFrame =
    graft.operators.Pipeline.gopherRulesCore(docs)

  case class FullStreamBar(asset_id: Long, date: java.sql.Date,
                           high: Double, low: Double, close: Double, n_ticks: Long)
  case class AdLineState(ad: Double)
  case class AdLinePoint(asset_id: Long, date: java.sql.Date, close: Double,
                         mfv: Double, ad: Double)

  /** D28 `adLineStream` — streaming Chaikin A/D line, the continuous
    * face of [[graft.operators.Analytics.adLine]]: per-asset state is
    * ONE double (the running raw MFV sum — kept UNrounded so the
    * left-assoc add sequence is identical to the batch fold; u6 is
    * applied only at emit). Flat bars contribute 0 flow, the batch
    * convention. O(#assets) state; arrival-ordered contract across
    * batches as documented on [[anomalyStream]].
    */
  def adLineStream(bars: Dataset[FullStreamBar]): Dataset[AdLinePoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AdLineState, AdLinePoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[FullStreamBar], state: GroupState[AdLineState]) =>
          var run = state.getOption.map(_.ad).getOrElse(0.0)
          val out = rows.toSeq.sortBy(_.date.getTime).map { b =>
            val mfv =
              if (b.high == b.low) 0.0
              else graft.operators.Micro.jvm6(
                ((b.close - b.low) - (b.high - b.close)) / (b.high - b.low)) * b.n_ticks
            run += mfv
            AdLinePoint(assetId, b.date, b.close,
              graft.operators.Micro.jvm6(mfv), graft.operators.Micro.jvm6(run))
          }
          state.update(AdLineState(run))
          out.iterator
      }
  }

  case class UoState(prev_close: Double, bps: Seq[Double], trs: Seq[Double])
  case class UoPoint(asset_id: Long, date: java.sql.Date,
                     a_fast: Option[Double], a_mid: Option[Double],
                     a_slow: Option[Double], uo: Option[Double])

  /** D29 `ultimateOscStream` — streaming Ultimate Oscillator, the
    * continuous face of [[graft.operators.Analytics.ultimateOsc]]:
    * per-asset state is the previous close plus a bounded ring of the
    * last `slow` (bp, tr) pairs, each u6 AT APPEND (the batch rounds
    * per-bar terms before folding); every frame sum re-folds the ring
    * slice left-to-right exactly as the batch seqFold does, so
    * in-order replays match bit-for-bit. The first bar (no previous
    * close) emits nothing — the batch drops it too.
    */
  def ultimateOscStream(bars: Dataset[FullStreamBar],
                        spans: (Int, Int, Int) = (7, 14, 28)): Dataset[UoPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val (fast, mid, slow) = spans
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[UoState, UoPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[FullStreamBar], state: GroupState[UoState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[UoPoint]
          def avg(bps: Seq[Double], trs: Seq[Double], n: Int): Option[Double] = {
            val sb = bps.takeRight(n).foldLeft(0.0)(_ + _)
            val stt = trs.takeRight(n).foldLeft(0.0)(_ + _)
            if (stt == 0) None else Some(graft.operators.Micro.jvm6(sb / stt))
          }
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st == null) st = UoState(b.close, Vector.empty, Vector.empty)
            else {
              val bp = graft.operators.Micro.jvm6(b.close - math.min(b.low, st.prev_close))
              val tr = graft.operators.Micro.jvm6(
                math.max(b.high, st.prev_close) - math.min(b.low, st.prev_close))
              val bps = (st.bps :+ bp).takeRight(slow)
              val trs = (st.trs :+ tr).takeRight(slow)
              val (aF, aM, aS) = (avg(bps, trs, fast), avg(bps, trs, mid), avg(bps, trs, slow))
              val uo = for (f <- aF; m <- aM; s <- aS)
                yield graft.operators.Micro.jvm6(100.0 * (4.0 * f + 2.0 * m + s) / 7.0)
              out += UoPoint(assetId, b.date, aF, aM, aS, uo)
              st = UoState(b.close, bps, trs)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class DatedTick(asset_id: Long, date: java.sql.Date, value: Double, seq: Long)
  case class VwapState(date_ms: Long, notional_c: Long, volume: Long)
  case class VwapPoint(asset_id: Long, date: java.sql.Date, volume: Long,
                       notional: Double, vwap: Option[Double])

  /** D30 `vwapStream` — intraday cumulative VWAP per (asset, day),
    * ALL-INTEGER like [[graft.operators.Analytics.vwap]]: tick prices
    * become exact integer cents via BigDecimal scaling (a double ·100
    * would carry FP error into the "integer"), the running notional is
    * an integer sum, and the emitted VWAP is the micro-unit integer
    * division `(notional·10⁶) div volume` — bit-stable under any
    * replay or batch boundary by construction. State is three numbers
    * per asset; a new trading day resets it (O(#assets), no ring).
    */
  def vwapStream(ticks: Dataset[DatedTick]): Dataset[VwapPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VwapState, VwapPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DatedTick], state: GroupState[VwapState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[VwapPoint]
          rows.toSeq.sortBy(t => (t.date.getTime, t.seq)).foreach { t =>
            val cents = BigDecimal(t.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
              .*(100).toLongExact
            st =
              if (st == null || st.date_ms != t.date.getTime)
                VwapState(t.date.getTime, cents, 1L)
              else VwapState(st.date_ms, st.notional_c + cents, st.volume + 1L)
            // dollars: notional is integer cents, volume is tick count
            val vwapMicro = if (st.volume == 0) None
              else Some((st.notional_c * 1000000L / (st.volume * 100L)) / 1e6)
            out += VwapPoint(assetId, t.date, st.volume, st.notional_c / 100.0, vwapMicro)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** D21 — streaming OHLC bars: [[graft.operators.Analytics.dailyBars]]'
    * surface as an event-time tumbling-window aggregate. open/close are
    * `min_by`/`max_by` on the (ts, seq) struct — the same total
    * (ts, seq) tie-break the batch bars use, so a replayed stream
    * produces bit-identical bars regardless of micro-batch boundaries
    * or arrival order within the watermark. All five aggregates are
    * declarative (no flatMapGroupsWithState): state is one row per open
    * (window, asset) bar, evicted by the watermark — bounded by live
    * windows × assets, never by tick volume.
    */
  def ohlcStream(ticks: DataFrame, windowLen: String, watermark: String): DataFrame =
    ticks
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("asset_id"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("seq"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("seq"))).as("close"),
        count(lit(1)).as("n_ticks"))
      .select(
        col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("asset_id"), col("open"), col("high"), col("low"), col("close"),
        col("n_ticks"))

  case class OhlcStreamBar(asset_id: Long, date: java.sql.Date,
                           open: Double, high: Double, low: Double,
                           close: Double, n_ticks: Long)
  case class HaState(ho: Double, hc: Double, lastDate: Long = Long.MinValue)
  case class HaPoint(asset_id: Long, date: java.sql.Date,
                     ha_open: Double, ha_close: Double,
                     ha_high: Double, ha_low: Double)

  /** D30 `heikinAshiStream` — streaming Heikin-Ashi candles, the
    * continuous face of [[graft.operators.Analytics.heikinAshi]]: the
    * batch op's per-asset recurrence IS stream state — two doubles
    * (yesterday's HA open/close), O(#assets) total. Every midpoint and
    * quarter is micro-rounded with the same left-assoc op order as the
    * batch fold, so stream and batch candles agree bitwise across any
    * micro-batch split (spec-asserted). Arrival-ordered contract
    * across batches, rows sorted by date within a batch; a bar arriving
    * in a later micro-batch with a date ≤ the last emitted one is
    * DROPPED and counted in the `graft.heikinAshiStream.lateDropped`
    * accumulator — a violated contract surfaces as a metric instead of
    * silently poisoning the recursion (r7 ADVICE).
    */
  def heikinAshiStream(bars: Dataset[OhlcStreamBar]): Dataset[HaPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    import graft.operators.Micro.jvm6
    val late = spark.sparkContext.longAccumulator("graft.heikinAshiStream.lateDropped")
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[HaState, HaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[HaState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[HaPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st != null && b.date.getTime <= st.lastDate) late.add(1L)
            else {
              val hc = jvm6((b.open + b.high + b.low + b.close) / 4)
              val ho =
                if (st == null) jvm6((b.open + b.close) / 2)
                else jvm6((st.ho + st.hc) / 2)
              out += HaPoint(assetId, b.date, ho, hc,
                math.max(b.high, math.max(ho, hc)), math.min(b.low, math.min(ho, hc)))
              st = HaState(ho, hc, b.date.getTime)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class StState(trs: Vector[Double], prevClose: Double,
                     fub: Double, flb: Double, dir: Long,
                     lastDate: Long = Long.MinValue)
  case class StPoint(asset_id: Long, date: java.sql.Date, close: Double,
                     fub: Double, flb: Double, dir: Long, supertrend: Double)

  /** D31 `supertrendStream` — streaming Supertrend, the continuous face
    * of [[graft.operators.Analytics.supertrend]]: state = the bounded
    * TR ring (span values, for the same normalized Horner ATR the
    * batch fold runs), the previous close, and the ratcheted bands +
    * direction. Every band is micro-rounded at the same points as the
    * batch op, so the ratchet comparisons — and therefore the flips —
    * replay bitwise across micro-batch splits (spec-asserted).
    * Out-of-order bars across batches are dropped + counted
    * (`graft.supertrendStream.lateDropped`), never folded.
    */
  def supertrendStream(bars: Dataset[OhlcStreamBar], span: Int = 10,
                       mult: Double = 3.0): Dataset[StPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    import graft.operators.Micro.jvm6
    val w = (span - 1).toDouble / span
    val late = spark.sparkContext.longAccumulator("graft.supertrendStream.lateDropped")
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[StState, StPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[StState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[StPoint]
          rows.toSeq.sortBy(_.date.getTime)
            .foreach { b =>
            if (st != null && b.date.getTime <= st.lastDate) { late.add(1L); }
            else {
            val tr = jvm6(
              if (st == null) b.high - b.low
              else math.max(b.high - b.low,
                math.max(math.abs(b.high - st.prevClose), math.abs(b.low - st.prevClose))))
            val ring = ((if (st == null) Vector.empty[Double] else st.trs) :+ tr)
              .takeRight(span)
            var num = 0.0; var den = 0.0
            ring.foreach { x => num = num * w + x; den = den * w + 1.0 }
            val atr = jvm6(num / den)
            val mid = jvm6((b.high + b.low) / 2)
            val bub = jvm6(mid + mult * atr)
            val blb = jvm6(mid - mult * atr)
            val (fub, flb, dir) =
              if (st == null) (bub, blb, 1L)
              else {
                val f1 = if (bub < st.fub || st.prevClose > st.fub) bub else st.fub
                val f2 = if (blb > st.flb || st.prevClose < st.flb) blb else st.flb
                val d =
                  if (st.dir == 1L) { if (b.close < f2) -1L else 1L }
                  else { if (b.close > f1) 1L else -1L }
                (f1, f2, d)
              }
            out += StPoint(assetId, b.date, b.close, fub, flb, dir,
              if (dir == 1L) flb else fub)
            st = StState(ring, b.close, fub, flb, dir, b.date.getTime)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class SmaCrossState(ring: Vector[Double], pf: Option[Double], ps: Option[Double],
                           lastDate: Long = Long.MinValue)
  case class SmaCrossPoint(asset_id: Long, date: java.sql.Date, close: Double,
                           sma_fast: Double, sma_slow: Double, cross: Long)

  /** D33 `smaCrossStream` — streaming golden/death-cross alerts, the
    * continuous face of [[graft.operators.Analytics.smaCross]]: state
    * is one bounded close ring (slow span) plus yesterday's two means;
    * both SMAs are re-folded left-to-right over the ring exactly as
    * the batch frame folds, u6 at the same points, so the cross
    * comparisons replay bitwise across micro-batch splits
    * (spec-asserted). Out-of-order bars across batches are dropped +
    * counted (`graft.smaCrossStream.lateDropped`), never folded.
    */
  def smaCrossStream(bars: Dataset[OhlcStreamBar], fast: Int = 5,
                     slow: Int = 20): Dataset[SmaCrossPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    import graft.operators.Micro.jvm6
    def sma(xs: Seq[Double]): Double = {
      var s = 0.0
      xs.foreach(x => s = s + x)
      jvm6(s / xs.length)
    }
    val late = spark.sparkContext.longAccumulator("graft.smaCrossStream.lateDropped")
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[SmaCrossState, SmaCrossPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[SmaCrossState]) =>
          var st = state.getOption.getOrElse(SmaCrossState(Vector.empty, None, None))
          val out = Vector.newBuilder[SmaCrossPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (b.date.getTime <= st.lastDate) late.add(1L)
            else {
              val ring = (st.ring :+ b.close).takeRight(slow)
              val f = sma(ring.takeRight(fast))
              val s = sma(ring)
              val cross = (st.pf, st.ps) match {
                case (Some(pf), Some(ps)) =>
                  if (f > s && pf <= ps) 1L
                  else if (f < s && pf >= ps) -1L
                  else 0L
                case _ => 0L
              }
              out += SmaCrossPoint(assetId, b.date, b.close, f, s, cross)
              st = SmaCrossState(ring, Some(f), Some(s), b.date.getTime)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class PsarState(high: Double, low: Double, close: Double,
                       sar: Double, ep: Double, af: Double, dir: Long,
                       lastDate: Long = Long.MinValue)
  case class PsarPoint(asset_id: Long, date: java.sql.Date, close: Double,
                       sar: Double, ep: Double, af: Double, dir: Long)

  /** D32 `psarStream` — streaming Parabolic SAR, the continuous face of
    * [[graft.operators.Analytics.psar]] and the last member of the
    * sequential-recurrence family to get its streaming twin: state is
    * the previous bar's extremes plus (sar, ep, af, dir) — dir 0 marks
    * "seed bar only". Every SAR/AF value is micro-rounded at the batch
    * fold's exact points, so flips replay bitwise across micro-batch
    * splits (spec-asserted, including a trend flip). Out-of-order
    * bars across batches are dropped + counted
    * (`graft.psarStream.lateDropped`), never folded.
    */
  def psarStream(bars: Dataset[OhlcStreamBar]): Dataset[PsarPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    import graft.operators.Micro.jvm6
    val late = spark.sparkContext.longAccumulator("graft.psarStream.lateDropped")
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PsarState, PsarPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[PsarState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[PsarPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st != null && b.date.getTime <= st.lastDate) {
              late.add(1L)
            } else if (st == null) {
              st = PsarState(b.high, b.low, b.close, 0.0, 0.0, 0.0, 0L, b.date.getTime)
            } else if (st.dir == 0L) {
              val up = b.close >= st.close
              val sar = if (up) math.min(st.low, b.low) else math.max(st.high, b.high)
              val ep = if (up) math.max(st.high, b.high) else math.min(st.low, b.low)
              val dir = if (up) 1L else -1L
              out += PsarPoint(assetId, b.date, b.close, sar, ep, 0.02, dir)
              st = PsarState(b.high, b.low, b.close, sar, ep, 0.02, dir, b.date.getTime)
            } else {
              val sarRaw = jvm6(st.sar + st.af * (st.ep - st.sar))
              val sarCl =
                if (st.dir == 1L) math.min(sarRaw, st.low) else math.max(sarRaw, st.high)
              val flipped =
                if (st.dir == 1L) b.low < sarCl else b.high > sarCl
              val sar = if (flipped) st.ep else sarCl
              val ep =
                if (flipped) { if (st.dir == 1L) b.low else b.high }
                else { if (st.dir == 1L) math.max(st.ep, b.high) else math.min(st.ep, b.low) }
              val af =
                if (flipped) 0.02
                else if ((st.dir == 1L && b.high > st.ep) || (st.dir == -1L && b.low < st.ep))
                  math.min(jvm6(st.af + 0.02), 0.2)
                else st.af
              val dir = if (flipped) -st.dir else st.dir
              out += PsarPoint(assetId, b.date, b.close, sar, ep, af, dir)
              st = PsarState(b.high, b.low, b.close, sar, ep, af, dir, b.date.getTime)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class BollState(values: Vector[Double])
  case class BollPoint(asset_id: Long, date: java.sql.Date, value: Double,
                       mid: Double, upper: Double, lower: Double,
                       pct_b: Option[Double])

  /** D41 `bollingerStream` — streaming face of B22 `bollinger`: a
    * per-asset ring of the last `window` LWW daily closes (O(#assets ·
    * window) state); each emission folds the ring left-to-right in
    * date order — the exact IEEE op sequence of the batch frame fold —
    * so mid/bands/%B bit-match the batch twin. 1-row rings emit
    * nothing (σ undefined, the batch n ≥ 2 filter); a flat ring emits
    * NULL %B like the batch zero-σ guard.
    */
  def bollingerStream(daily: Dataset[DailyTick], window: Int = 20): Dataset[BollPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[BollState, BollPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[BollState]) =>
          var ring = state.getOption.map(_.values).getOrElse(Vector.empty)
          val out = Vector.newBuilder[BollPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ t.value).takeRight(window)
            if (ring.size >= 2) {
              val n = ring.size.toDouble
              var s = 0.0; var s2 = 0.0
              ring.foreach { x => s += x; s2 += x * x }
              val mid = s / n
              val sd = math.sqrt(math.max((n * s2 - s * s) / (n * (n - 1)), 0.0))
              val pctB =
                if (sd == 0.0) None
                else Some(graft.operators.Micro.jvm6(
                  (t.value - (mid - 2.0 * sd)) / (4.0 * sd)))
              out += BollPoint(assetId, t.date, t.value,
                graft.operators.Micro.jvm6(mid),
                graft.operators.Micro.jvm6(mid + 2.0 * sd),
                graft.operators.Micro.jvm6(mid - 2.0 * sd), pctB)
            }
          }
          state.update(BollState(ring))
          out.result().iterator
      }
  }

  case class AtrState(lastClose: Double, trs: Vector[Double], seen: Boolean)
  case class AtrPoint(asset_id: Long, date: java.sql.Date, tr: Double, atr: Double)

  /** D42 `atrStream` — streaming face of B40 `atr`: Wilder's ATR over
    * the daily bars with a per-asset ring of the last `span` ROUNDED
    * true ranges plus the previous close (O(#assets · span) state).
    * TR on the first-ever bar is plain high−low (the batch NULL-lag
    * branch); the normalized Horner folds run oldest-first over the
    * ring — bit-identical to the batch frame fold and the oracle's
    * list_reduce.
    */
  def atrStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[AtrPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w = (span - 1).toDouble / span
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AtrState, AtrPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[AtrState]) =>
          var st = state.getOption.getOrElse(AtrState(0.0, Vector.empty, seen = false))
          val out = Vector.newBuilder[AtrPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tr = graft.operators.Micro.jvm6(
              if (!st.seen) b.high - b.low
              else math.max(b.high - b.low,
                math.max(math.abs(b.high - st.lastClose), math.abs(b.low - st.lastClose))))
            val trs = (st.trs :+ tr).takeRight(span)
            var num = 0.0; var den = 0.0
            trs.foreach { x => num = num * w + x; den = den * w + 1.0 }
            out += AtrPoint(assetId, b.date, tr, graft.operators.Micro.jvm6(num / den))
            st = AtrState(b.close, trs, seen = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class RsiState(last_value: Double, rets: Vector[Double])
  case class RsiPoint(asset_id: Long, date: java.sql.Date, ret: Double, rsi: Double)

  /** D43 `rsiStream` — streaming face of B23 `rsi`: span-bounded
    * Wilder RSI from a per-asset ring of the last `span` u6 returns
    * (O(#assets · span) state). Gain/loss Horner folds run
    * oldest-first with w = 13/14 (≡ the batch `horner_pos`/
    * `horner_neg` kernels); a zero previous close emits no return and
    * carries the ring (the batch NULL-filter), AL = 0 → RSI 100, and
    * the output rides the u4 grid like the batch column.
    */
  def rsiStream(daily: Dataset[DailyTick], span: Int = 60): Dataset[RsiPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    val w = 13.0 / 14.0
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RsiState, RsiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RsiState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[RsiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st == null) {
              st = RsiState(t.value, Vector.empty)
            } else if (st.last_value != 0.0) {
              val ret = graft.operators.Micro.jvm6(t.value / st.last_value - 1.0)
              val rets = (st.rets :+ ret).takeRight(span)
              var ag = 0.0; var al = 0.0
              rets.foreach { x =>
                ag = ag * w + math.max(x, 0.0)
                al = al * w + math.max(-x, 0.0)
              }
              val rsi =
                if (al == 0.0) 100.0
                else graft.operators.Micro.jvm4(100.0 - 100.0 / (1.0 + ag / al))
              out += RsiPoint(assetId, t.date, ret, rsi)
              st = RsiState(t.value, rets)
            } else {
              st = RsiState(t.value, st.rets)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class MacdState(values: Vector[Double], macds: Vector[Double])
  case class MacdPoint(asset_id: Long, date: java.sql.Date, value: Double,
                       macd: Double, signal: Double, hist: Double)

  /** D45 `macdStream` — streaming face of B27 `macd`: per-asset ring
    * of the last `span` LWW closes plus a ring of the last
    * `signal·4` ROUNDED MACD values (the batch signal frame). Each
    * emission runs the normalized Horner folds oldest-first with the
    * batch EW weights, so line/signal/histogram bit-match the batch
    * twin. O(#assets · (span + 4·signal)) state.
    */
  def macdStream(daily: Dataset[DailyTick], fast: Int = 12, slow: Int = 26,
                 signal: Int = 9, span: Int = 120): Dataset[MacdPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    def w(n: Int): Double = 1.0 - 2.0 / (n + 1.0)
    val (wf, ws, wsig) = (w(fast), w(slow), w(signal))
    def ew(arr: Vector[Double], weight: Double): Double = {
      var num = 0.0; var den = 0.0
      arr.foreach { x => num = num * weight + x; den = den * weight + 1.0 }
      num / den
    }
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[MacdState, MacdPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[MacdState]) =>
          var st = state.getOption.getOrElse(MacdState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[MacdPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val vals = (st.values :+ t.value).takeRight(span)
            val macd = graft.operators.Micro.jvm6(ew(vals, wf) - ew(vals, ws))
            val macds = (st.macds :+ macd).takeRight(signal * 4)
            val sig = graft.operators.Micro.jvm6(ew(macds, wsig))
            out += MacdPoint(assetId, t.date, t.value, macd, sig,
              graft.operators.Micro.jvm6(macd - sig))
            st = MacdState(vals, macds)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class KeltState(lastClose: Double, seen: Boolean,
                       tps: Vector[Double], trs: Vector[Double])
  case class KeltPoint(asset_id: Long, date: java.sql.Date, close: Double,
                       mid: Double, atr: Double, upper: Double, lower: Double)

  /** D46 `keltnerStream` — streaming face of B46 `keltner`: per-asset
    * rings of the last `span` ROUNDED typical prices and true ranges
    * plus the previous close. Middle line = EW mean of the tp ring
    * (weight 1−2/(span+1)), ATR = Wilder EW of the tr ring — both the
    * batch Horner folds oldest-first; bands from the ROUNDED mid/atr
    * exactly as the batch columns compose. O(#assets · 2·span) state.
    */
  def keltnerStream(bars: Dataset[OhlcStreamBar], span: Int = 20): Dataset[KeltPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w = 1.0 - 2.0 / (span + 1.0)
    val wilder = (span - 1).toDouble / span
    def ew(arr: Vector[Double], weight: Double): Double = {
      var num = 0.0; var den = 0.0
      arr.foreach { x => num = num * weight + x; den = den * weight + 1.0 }
      num / den
    }
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[KeltState, KeltPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[KeltState]) =>
          var st = state.getOption.getOrElse(
            KeltState(0.0, seen = false, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[KeltPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tp = graft.operators.Micro.jvm6((b.high + b.low + b.close) / 3)
            val tr = graft.operators.Micro.jvm6(
              if (!st.seen) b.high - b.low
              else math.max(b.high - b.low,
                math.max(math.abs(b.high - st.lastClose), math.abs(b.low - st.lastClose))))
            val tps = (st.tps :+ tp).takeRight(span)
            val trs = (st.trs :+ tr).takeRight(span)
            val mid = graft.operators.Micro.jvm6(ew(tps, w))
            val atr = graft.operators.Micro.jvm6(ew(trs, wilder))
            out += KeltPoint(assetId, b.date, b.close, mid, atr,
              graft.operators.Micro.jvm6(mid + 2.0 * atr),
              graft.operators.Micro.jvm6(mid - 2.0 * atr))
            st = KeltState(b.close, seen = true, tps, trs)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class WrState(hl: Vector[(Double, Double)])
  case class WrPoint(asset_id: Long, date: java.sql.Date, close: Double,
                     wr: Option[Double])

  /** D47 `williamsRStream` — streaming face of B45 `williams_r`: %R
    * from a per-asset ring of the last `span` (high, low) pairs —
    * rolling min/max are order-insensitive, the one division follows
    * the batch op order and the micro-unit rounding, flat channels
    * emit NULL. O(#assets · span) state.
    */
  def williamsRStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[WrPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[WrState, WrPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[WrState]) =>
          var ring = state.getOption.map(_.hl).getOrElse(Vector.empty)
          val out = Vector.newBuilder[WrPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            ring = (ring :+ ((b.high, b.low))).takeRight(span)
            val hn = ring.map(_._1).max
            val ln = ring.map(_._2).min
            val wr =
              if (hn == ln) None
              else Some(graft.operators.Micro.jvm6(-100.0 * (hn - b.close) / (hn - ln)))
            out += WrPoint(assetId, b.date, b.close, wr)
          }
          state.update(WrState(ring))
          out.result().iterator
      }
  }

  case class CciState(tps: Vector[Double])
  case class CciPoint(asset_id: Long, date: java.sql.Date, tp: Double,
                      sma: Double, mean_dev: Double, cci: Option[Double])

  /** D48 `cciStream` — streaming face of B51 `cci`: per-asset ring of
    * the last `span` ROUNDED typical prices; SMA and mean absolute
    * deviation as left-to-right folds over the ring (≡ the batch
    * aggregate lambdas), CCI from the RAW sma/dev with the batch op
    * order, zero-deviation NULL. O(#assets · span) state.
    */
  def cciStream(bars: Dataset[OhlcStreamBar], span: Int = 20): Dataset[CciPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CciState, CciPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[CciState]) =>
          var ring = state.getOption.map(_.tps).getOrElse(Vector.empty)
          val out = Vector.newBuilder[CciPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tp = graft.operators.Micro.jvm6((b.high + b.low + b.close) / 3)
            ring = (ring :+ tp).takeRight(span)
            val n = ring.size.toDouble
            val sma = ring.foldLeft(0.0)(_ + _) / n
            val dev = ring.foldLeft(0.0)((a, x) => a + math.abs(x - sma)) / n
            val cci =
              if (dev == 0.0) None
              else Some(graft.operators.Micro.jvm6((tp - sma) / (0.015 * dev)))
            out += CciPoint(assetId, b.date, tp,
              graft.operators.Micro.jvm6(sma), graft.operators.Micro.jvm6(dev), cci)
          }
          state.update(CciState(ring))
          out.result().iterator
      }
  }

  case class MfiState(prevTp: Option[Double], flows: Vector[(Double, Double)])
  case class MfiPoint(asset_id: Long, date: java.sql.Date, tp: Double,
                      mfi: Option[Double])

  /** D50 `mfiStream` — streaming face of B96 `mfi`: previous typical
    * price + ring of the last `span` (positive, negative) money flows
    * per asset; directional classification and the 100·pos/(pos+neg)
    * ratio follow the batch op order, all-flat frames NULL.
    * O(#assets · span) state.
    */
  def mfiStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[MfiPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[MfiState, MfiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[MfiState]) =>
          var st = state.getOption.getOrElse(MfiState(None, Vector.empty))
          val out = Vector.newBuilder[MfiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tp = graft.operators.Micro.jvm6((b.high + b.low + b.close) / 3)
            val mf = graft.operators.Micro.jvm6(tp * b.n_ticks.toDouble)
            val pos = if (st.prevTp.exists(tp > _)) mf else 0.0
            val neg = if (st.prevTp.exists(tp < _)) mf else 0.0
            val flows = (st.flows :+ ((pos, neg))).takeRight(span)
            var sp = 0.0; var sn = 0.0
            flows.foreach { case (p, q) => sp += p; sn += q }
            val mfi =
              if (sp + sn == 0.0) None
              else Some(graft.operators.Micro.jvm6(100.0 * sp / (sp + sn)))
            out += MfiPoint(assetId, b.date, tp, mfi)
            st = MfiState(Some(tp), flows)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class CmfState(bars: Vector[(Double, Long)])
  case class CmfPoint(asset_id: Long, date: java.sql.Date, close: Double,
                      mfv: Double, vol_n: Long, cmf: Double)

  /** D51 `cmfStream` — streaming face of B52 `cmf`: ring of the last
    * `span` (raw money-flow volume, tick volume) pairs per asset; the
    * MFV sum is the left-to-right ring fold, the volume sum an exact
    * integer — both ≡ the batch frame. O(#assets · span) state.
    */
  def cmfStream(bars: Dataset[OhlcStreamBar], span: Int = 20): Dataset[CmfPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CmfState, CmfPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[CmfState]) =>
          var ring = state.getOption.map(_.bars).getOrElse(Vector.empty)
          val out = Vector.newBuilder[CmfPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val mfv =
              if (b.high == b.low) 0.0
              else graft.operators.Micro.jvm6(
                ((b.close - b.low) - (b.high - b.close)) / (b.high - b.low)) *
                b.n_ticks.toDouble
            ring = (ring :+ ((mfv, b.n_ticks))).takeRight(span)
            var s = 0.0; var v = 0L
            ring.foreach { case (m, n) => s += m; v += n }
            out += CmfPoint(assetId, b.date, b.close,
              graft.operators.Micro.jvm6(mfv), v,
              graft.operators.Micro.jvm6(s / v.toDouble))
          }
          state.update(CmfState(ring))
          out.result().iterator
      }
  }

  case class FiState(lastClose: Double, seen: Boolean, fis: Vector[Double])
  case class FiPoint(asset_id: Long, date: java.sql.Date, fi: Double, fi_ema: Double)

  /** D52 `forceIndexStream` — streaming face of B98 `force_index`:
    * previous close + ring of the last `span` ROUNDED force values
    * per asset (Δclose · volume, EW-smoothed); the first-ever bar
    * emits nothing (the batch NULL-lag filter). O(#assets · span)
    * state.
    */
  def forceIndexStream(bars: Dataset[OhlcStreamBar], span: Int = 13): Dataset[FiPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w = 1.0 - 2.0 / (span + 1.0)
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[FiState, FiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[FiState]) =>
          var st = state.getOption.getOrElse(FiState(0.0, seen = false, Vector.empty))
          val out = Vector.newBuilder[FiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val fi = graft.operators.Micro.jvm6(
                (b.close - st.lastClose) * b.n_ticks.toDouble)
              val fis = (st.fis :+ fi).takeRight(span)
              var num = 0.0; var den = 0.0
              fis.foreach { x => num = num * w + x; den = den * w + 1.0 }
              out += FiPoint(assetId, b.date, fi, graft.operators.Micro.jvm6(num / den))
              st = FiState(b.close, seen = true, fis)
            } else {
              st = FiState(b.close, seen = true, st.fis)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class VortexState(ph: Double, pl: Double, pc: Double, seen: Boolean,
                         vms: Vector[(Double, Double, Double)])
  case class VortexPoint(asset_id: Long, date: java.sql.Date,
                         vi_plus: Option[Double], vi_minus: Option[Double])

  /** D53 `vortexStream` — streaming face of B99 `vortex`: previous
    * bar's high/low/close + ring of the last `span` ROUNDED
    * (VM⁺, VM⁻, TR) triples per asset; plain ordered sums (≡ the batch
    * folds), zero-TR frames NULL, first-ever bar emits nothing.
    * O(#assets · span) state.
    */
  def vortexStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[VortexPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VortexState, VortexPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[VortexState]) =>
          var st = state.getOption.getOrElse(
            VortexState(0.0, 0.0, 0.0, seen = false, Vector.empty))
          val out = Vector.newBuilder[VortexPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val vmP = graft.operators.Micro.jvm6(math.abs(b.high - st.pl))
              val vmM = graft.operators.Micro.jvm6(math.abs(b.low - st.ph))
              val tr = graft.operators.Micro.jvm6(math.max(b.high - b.low,
                math.max(math.abs(b.high - st.pc), math.abs(b.low - st.pc))))
              val vms = (st.vms :+ ((vmP, vmM, tr))).takeRight(span)
              var sp = 0.0; var sm = 0.0; var str = 0.0
              vms.foreach { case (p, m, t) => sp += p; sm += m; str += t }
              val (vip, vim) =
                if (str == 0.0) (None, None)
                else (Some(graft.operators.Micro.jvm6(sp / str)),
                  Some(graft.operators.Micro.jvm6(sm / str)))
              out += VortexPoint(assetId, b.date, vip, vim)
              st = VortexState(b.high, b.low, b.close, seen = true, vms)
            } else {
              st = VortexState(b.high, b.low, b.close, seen = true, st.vms)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class EomState(prevMid: Option[Double], raws: Vector[Double])
  case class EomPoint(asset_id: Long, date: java.sql.Date, eom_raw: Double,
                      eom: Double)

  /** D54 `eomStream` — streaming face of B119 `eom`: previous ROUNDED
    * midpoint + ring of the last `span` ROUNDED raw EoM values per
    * asset (midpoint move scaled by range over volume, EW-smoothed);
    * flat bars contribute 0, the first-ever bar emits nothing.
    * O(#assets · span) state.
    */
  def eomStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[EomPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w = 1.0 - 2.0 / (span + 1.0)
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[EomState, EomPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[EomState]) =>
          var st = state.getOption.getOrElse(EomState(None, Vector.empty))
          val out = Vector.newBuilder[EomPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val mid = graft.operators.Micro.jvm6((b.high + b.low) / 2)
            st.prevMid match {
              case Some(pm) =>
                val dist = graft.operators.Micro.jvm6(mid - pm)
                val raw =
                  if (b.high == b.low) graft.operators.Micro.jvm6(0.0)
                  else graft.operators.Micro.jvm6(
                    dist * (b.high - b.low) / b.n_ticks.toDouble)
                val raws = (st.raws :+ raw).takeRight(span)
                var num = 0.0; var den = 0.0
                raws.foreach { x => num = num * w + x; den = den * w + 1.0 }
                out += EomPoint(assetId, b.date, raw,
                  graft.operators.Micro.jvm6(num / den))
                st = EomState(Some(mid), raws)
              case None =>
                st = EomState(Some(mid), st.raws)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class AoState(mids: Vector[Double])
  case class AoPoint(asset_id: Long, date: java.sql.Date, mid: Double, ao: Double)

  /** D55 `awesomeOscStream` — streaming face of B113 `awesome_osc`:
    * ring of the last `slow` ROUNDED bar midpoints per asset; the
    * fast SMA folds the ring's tail, the slow SMA the whole ring,
    * both left-to-right ≡ the batch frame folds. O(#assets · slow)
    * state.
    */
  def awesomeOscStream(bars: Dataset[OhlcStreamBar], fast: Int = 5,
                       slow: Int = 34): Dataset[AoPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    def sma(arr: Vector[Double]): Double =
      graft.operators.Micro.jvm6(arr.foldLeft(0.0)(_ + _) / arr.size.toDouble)
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AoState, AoPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[AoState]) =>
          var ring = state.getOption.map(_.mids).getOrElse(Vector.empty)
          val out = Vector.newBuilder[AoPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val mid = graft.operators.Micro.jvm6((b.high + b.low) / 2)
            ring = (ring :+ mid).takeRight(slow)
            out += AoPoint(assetId, b.date, mid, graft.operators.Micro.jvm6(
              sma(ring.takeRight(fast)) - sma(ring)))
          }
          state.update(AoState(ring))
          out.result().iterator
      }
  }

  case class DpoState(closes: Vector[Double])
  case class DpoPoint(asset_id: Long, date: java.sql.Date, close: Double,
                      sma: Double, dpo: Option[Double])

  /** D56 `dpoStream` — streaming face of B106 `dpo`: ring of the last
    * `span` raw closes per asset; SMA folds the ring, the reference
    * close looks `span/2 + 1` bars back INSIDE the same ring (absent →
    * NULL, the batch lag semantics). O(#assets · span) state.
    */
  def dpoStream(bars: Dataset[OhlcStreamBar], span: Int = 20): Dataset[DpoPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val shift = span / 2 + 1
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[DpoState, DpoPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[DpoState]) =>
          var ring = state.getOption.map(_.closes).getOrElse(Vector.empty)
          val out = Vector.newBuilder[DpoPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            ring = (ring :+ b.close).takeRight(span)
            val sma = graft.operators.Micro.jvm6(
              ring.foldLeft(0.0)(_ + _) / ring.size.toDouble)
            // ring ends at the current bar: the close `shift` bars ago
            // sits at index size-1-shift (absent on short rings — and
            // the 20-ring always retains 11 back-bars once warm)
            val dpo =
              if (ring.size - 1 - shift < 0) None
              else Some(graft.operators.Micro.jvm6(
                ring(ring.size - 1 - shift) - sma))
            out += DpoPoint(assetId, b.date, b.close, sma, dpo)
          }
          state.update(DpoState(ring))
          out.result().iterator
      }
  }

  case class ChaikinState(adMicro: Long, ads: Vector[Double])
  case class ChaikinPoint(asset_id: Long, date: java.sql.Date, ad: Double,
                          chaikin: Double)

  /** D57 `chaikinOscStream` — streaming face of B100 `chaikin_osc`:
    * the A/D line as an exact INTEGER micro running sum (the vpt/cusum
    * discipline — replay-stable under any batch split) + ring of the
    * last 10 A/D values; EW(3) folds the ring's tail, EW(10) the whole
    * ring, ≡ the batch frames. O(#assets · 10) state.
    */
  def chaikinOscStream(bars: Dataset[OhlcStreamBar]): Dataset[ChaikinPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w3 = 0.5
    val w10 = 1.0 - 2.0 / 11.0
    def ew(arr: Vector[Double], weight: Double): Double = {
      var num = 0.0; var den = 0.0
      arr.foreach { x => num = num * weight + x; den = den * weight + 1.0 }
      num / den
    }
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ChaikinState, ChaikinPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[ChaikinState]) =>
          var st = state.getOption.getOrElse(ChaikinState(0L, Vector.empty))
          val out = Vector.newBuilder[ChaikinPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val clv =
              if (b.high == b.low) 0.0
              else graft.operators.Micro.jvm6(
                ((b.close - b.low) - (b.high - b.close)) / (b.high - b.low))
            // u6 clvs are micro-integer-valued; Math.round == Column round
            val adMicro = st.adMicro + Math.round(clv * 1e6) * b.n_ticks
            val ad = adMicro.toDouble / 1e6
            val ads = (st.ads :+ ad).takeRight(10)
            out += ChaikinPoint(assetId, b.date, ad, graft.operators.Micro.jvm6(
              graft.operators.Micro.jvm6(ew(ads.takeRight(3), w3)) -
                graft.operators.Micro.jvm6(ew(ads, w10))))
            st = ChaikinState(adMicro, ads)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class AroonState(hl: Vector[(Double, Double)])
  case class AroonPoint(asset_id: Long, date: java.sql.Date, d_hi: Long,
                        d_lo: Long, aroon_up: Double, aroon_dn: Double)

  /** D58 `aroonStream` — streaming face of B95 `aroon`: ring of the
    * last `span` (high, low) pairs; distance-since-extreme scans the
    * ring newest-first (≡ the batch reverse + array_position, which
    * takes the MOST RECENT tie), the 100·(span−d)/span scaling uses
    * the fixed span exactly as the batch. O(#assets · span) state.
    */
  def aroonStream(bars: Dataset[OhlcStreamBar], span: Int = 25): Dataset[AroonPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AroonState, AroonPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[AroonState]) =>
          var ring = state.getOption.map(_.hl).getOrElse(Vector.empty)
          val out = Vector.newBuilder[AroonPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            ring = (ring :+ ((b.high, b.low))).takeRight(span)
            val rev = ring.reverse
            val dHi = rev.indexWhere(_._1 == rev.map(_._1).max).toLong
            val dLo = rev.indexWhere(_._2 == rev.map(_._2).min).toLong
            out += AroonPoint(assetId, b.date, dHi, dLo,
              graft.operators.Micro.jvm6(100.0 * (span - dHi) / span.toDouble),
              graft.operators.Micro.jvm6(100.0 * (span - dLo) / span.toDouble))
          }
          state.update(AroonState(ring))
          out.result().iterator
      }
  }

  case class ChopState(lastClose: Double, seen: Boolean,
                       bars: Vector[(Double, Double, Double)])
  case class ChopPoint(asset_id: Long, date: java.sql.Date, s_tr: Double,
                       chop: Option[Double])

  /** D59 `choppinessStream` — streaming face of B118 `choppiness`:
    * previous close + ring of the last `span` (ROUNDED TR, high, low)
    * triples; TR sum is the ordered ring fold, channel min/max are
    * order-insensitive, the log-ratio NULLs exactly where the batch
    * guards (flat channel, zero TR mass, 1-bar frame).
    * O(#assets · span) state.
    */
  def choppinessStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[ChopPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ChopState, ChopPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[ChopState]) =>
          var st = state.getOption.getOrElse(ChopState(0.0, seen = false, Vector.empty))
          val out = Vector.newBuilder[ChopPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tr = graft.operators.Micro.jvm6(
              if (!st.seen) b.high - b.low
              else math.max(b.high - b.low,
                math.max(math.abs(b.high - st.lastClose), math.abs(b.low - st.lastClose))))
            val ring = (st.bars :+ ((tr, b.high, b.low))).takeRight(span)
            var sTr = 0.0
            ring.foreach { case (t, _, _) => sTr += t }
            val hh = ring.map(_._2).max
            val ll = ring.map(_._3).min
            val n = ring.size.toDouble
            val chop =
              if (hh == ll || sTr <= 0 || n < 2) None
              else Some(graft.operators.Micro.jvm6(
                100.0 * math.log(sTr / (hh - ll)) / math.log(n)))
            out += ChopPoint(assetId, b.date, sTr, chop)
            st = ChopState(b.close, seen = true, ring)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class BopState(bops: Vector[Double])
  case class BopPoint(asset_id: Long, date: java.sql.Date, bop: Double,
                      bop_sma: Double)

  /** D60 `balanceOfPowerStream` — streaming face of B133
    * `balance_of_power`: flat bars (high = low) are DROPPED entirely
    * (the batch filter runs before the frame, so they enter neither
    * the output nor the ring); ring of the last `span` ROUNDED BoP
    * values, SMA = ordered fold / size. O(#assets · span) state.
    */
  def balanceOfPowerStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[BopPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[BopState, BopPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[BopState]) =>
          var ring = state.getOption.map(_.bops).getOrElse(Vector.empty)
          val out = Vector.newBuilder[BopPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (b.high > b.low) {
              val bop = graft.operators.Micro.jvm6((b.close - b.open) / (b.high - b.low))
              ring = (ring :+ bop).takeRight(span)
              out += BopPoint(assetId, b.date, bop, graft.operators.Micro.jvm6(
                ring.foldLeft(0.0)(_ + _) / ring.size.toDouble))
            }
          }
          state.update(BopState(ring))
          out.result().iterator
      }
  }

  case class QstickState(bodies: Vector[Double])
  case class QstickPoint(asset_id: Long, date: java.sql.Date, body: Double,
                         qstick: Double)

  /** D61 `qstickStream` — streaming face of B134 `qstick`: ring of the
    * last `span` ROUNDED candle bodies (close − open), SMA = ordered
    * fold / size. O(#assets · span) state.
    */
  def qstickStream(bars: Dataset[OhlcStreamBar], span: Int = 8): Dataset[QstickPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[QstickState, QstickPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[QstickState]) =>
          var ring = state.getOption.map(_.bodies).getOrElse(Vector.empty)
          val out = Vector.newBuilder[QstickPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val body = graft.operators.Micro.jvm6(b.close - b.open)
            ring = (ring :+ body).takeRight(span)
            out += QstickPoint(assetId, b.date, body, graft.operators.Micro.jvm6(
              ring.foldLeft(0.0)(_ + _) / ring.size.toDouble))
          }
          state.update(QstickState(ring))
          out.result().iterator
      }
  }

  case class RviState(cos: Vector[Double], hls: Vector[Double],
                      nds: Vector[(Double, Double)], rvis: Vector[Option[Double]])
  case class RviPoint(asset_id: Long, date: java.sql.Date,
                      rvi: Option[Double], sig: Option[Double])

  /** D62 `rviStream` — streaming face of B135 `rvi`: the last 3 raw
    * (close−open) and (high−low) values feed the symmetric weighted MA
    * (the batch lag(1..3) — bars without a full SWMA window emit
    * nothing, the batch num-NULL filter), a ring of the last `span`
    * (num, den) pairs feeds the vigor ratio (zero den-mass → NULL),
    * and the last 3 ROUNDED RVI values feed the signal SWMA with NULL
    * propagation ≡ the batch lags. O(#assets · span) state.
    */
  def rviStream(bars: Dataset[OhlcStreamBar], span: Int = 10): Dataset[RviPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    def swma(x0: Double, x1: Double, x2: Double, x3: Double): Double =
      graft.operators.Micro.jvm6((x0 + 2.0 * x1 + 2.0 * x2 + x3) / 6)
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RviState, RviPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[RviState]) =>
          var st = state.getOption.getOrElse(
            RviState(Vector.empty, Vector.empty, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[RviPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val co = b.close - b.open
            val hl = b.high - b.low
            if (st.cos.size >= 3) {
              // lags 1..3 are the newest-first tail of the carried values
              val num = swma(co, st.cos(2), st.cos(1), st.cos(0))
              val den = swma(hl, st.hls(2), st.hls(1), st.hls(0))
              val nds = (st.nds :+ ((num, den))).takeRight(span)
              var sn = 0.0; var sd = 0.0
              nds.foreach { case (a, d) => sn += a; sd += d }
              val rvi =
                if (sd == 0.0) None
                else Some(graft.operators.Micro.jvm6(sn / sd))
              val sig =
                if (st.rvis.size < 3) None
                else for (r0 <- rvi; r1 <- st.rvis(2); r2 <- st.rvis(1); r3 <- st.rvis(0))
                  yield swma(r0, r1, r2, r3)
              out += RviPoint(assetId, b.date, rvi, sig)
              st = RviState((st.cos :+ co).takeRight(3), (st.hls :+ hl).takeRight(3),
                nds, (st.rvis :+ rvi).takeRight(3))
            } else {
              st = RviState((st.cos :+ co).takeRight(3), (st.hls :+ hl).takeRight(3),
                st.nds, st.rvis)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class ElderRayState(closes: Vector[Double])
  case class ElderRayPoint(asset_id: Long, date: java.sql.Date, ema: Double,
                           bull_power: Double, bear_power: Double)

  /** D63 `elderRayStream` — streaming face of B97 `elder_ray`: ring of
    * the last `span` closes, EW consensus fold, bull/bear as exact
    * differences of the ROUNDED EMA ≡ the batch columns.
    * O(#assets · span) state.
    */
  def elderRayStream(bars: Dataset[OhlcStreamBar], span: Int = 13): Dataset[ElderRayPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w = 1.0 - 2.0 / (span + 1.0)
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ElderRayState, ElderRayPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[ElderRayState]) =>
          var ring = state.getOption.map(_.closes).getOrElse(Vector.empty)
          val out = Vector.newBuilder[ElderRayPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            ring = (ring :+ b.close).takeRight(span)
            var num = 0.0; var den = 0.0
            ring.foreach { x => num = num * w + x; den = den * w + 1.0 }
            val ema = graft.operators.Micro.jvm6(num / den)
            out += ElderRayPoint(assetId, b.date, ema,
              graft.operators.Micro.jvm6(b.high - ema),
              graft.operators.Micro.jvm6(b.low - ema))
          }
          state.update(ElderRayState(ring))
          out.result().iterator
      }
  }

  case class TrixState(closes: Vector[Double], e1s: Vector[Double],
                       e2s: Vector[Double], prevE3: Option[Double])
  case class TrixPoint(asset_id: Long, date: java.sql.Date, e3: Double,
                       trix: Option[Double])

  /** D64 `trixStream` — streaming face of B105 `trix`: three chained
    * EW stages, each a ring of the previous stage's ROUNDED outputs
    * (≡ the batch's u6-at-every-stage-boundary discipline), plus the
    * previous e3 for the rate-of-change (first bar and zero prev →
    * NULL ≡ the batch lag guard). O(#assets · 3·span) state.
    */
  def trixStream(bars: Dataset[OhlcStreamBar], span: Int = 15): Dataset[TrixPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w = 1.0 - 2.0 / (span + 1.0)
    def ew(arr: Vector[Double]): Double = {
      var num = 0.0; var den = 0.0
      arr.foreach { x => num = num * w + x; den = den * w + 1.0 }
      graft.operators.Micro.jvm6(num / den)
    }
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[TrixState, TrixPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[TrixState]) =>
          var st = state.getOption.getOrElse(
            TrixState(Vector.empty, Vector.empty, Vector.empty, None))
          val out = Vector.newBuilder[TrixPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val closes = (st.closes :+ b.close).takeRight(span)
            val e1s = (st.e1s :+ ew(closes)).takeRight(span)
            val e2s = (st.e2s :+ ew(e1s)).takeRight(span)
            val e3 = ew(e2s)
            val trix = st.prevE3 match {
              case Some(p) if p != 0.0 =>
                Some(graft.operators.Micro.jvm6(e3 / p - 1.0))
              case _ => None
            }
            out += TrixPoint(assetId, b.date, e3, trix)
            st = TrixState(closes, e1s, e2s, Some(e3))
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class OlsState(values: Vector[Double])
  case class OlsPoint(asset_id: Long, date: java.sql.Date, value: Double,
                      n_days: Long, slope: Double, fitted: Double,
                      r2: Option[Double])

  /** D65 `rollingOlsTrendStream` — streaming face of B203
    * `rolling_ols_trend`: ring of the last `window` LWW closes; the
    * integral-x sums are closed forms of the ring size, the value sums
    * fold left-to-right ≡ the batch frame, frames below `minN` emit
    * nothing and flat frames NULL the R². O(#assets · window) state.
    */
  def rollingOlsTrendStream(daily: Dataset[DailyTick], window: Int = 20,
                            minN: Int = 5): Dataset[OlsPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[OlsState, OlsPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[OlsState]) =>
          var ring = state.getOption.map(_.values).getOrElse(Vector.empty)
          val out = Vector.newBuilder[OlsPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ t.value).takeRight(window)
            if (ring.size >= minN) {
              val n = ring.size.toDouble
              val sx = n * (n + 1) / 2.0
              val sx2 = n * (n + 1) * (2.0 * n + 1) / 6.0
              var sy = 0.0; var sy2 = 0.0; var sxy = 0.0
              var i = 0
              ring.foreach { v =>
                sy += v; sy2 += v * v; sxy += v * (i + 1).toDouble; i += 1
              }
              val b = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
              val a = (sy - b * sx) / n
              val syy = n * sy2 - sy * sy
              val r2 =
                if (syy <= 0) None
                else Some(graft.operators.Micro.jvm6(
                  (n * sxy - sx * sy) * (n * sxy - sx * sy) /
                    ((n * sx2 - sx * sx) * syy)))
              out += OlsPoint(assetId, t.date, t.value, ring.size.toLong,
                graft.operators.Micro.jvm6(b),
                graft.operators.Micro.jvm6(a + b * n), r2)
            }
          }
          state.update(OlsState(ring))
          out.result().iterator
      }
  }

  case class StochRsiState(last_value: Double, rets: Vector[Double],
                           rsis: Vector[Double])
  case class StochRsiPoint(asset_id: Long, date: java.sql.Date, rsi: Double,
                           stoch_rsi: Option[Double])

  /** D66 `stochRsiStream` — streaming face of B115 `stoch_rsi`: the
    * [[rsiStream]] machinery (ring of 60 u6 returns) feeding a ring of
    * the last 14 u4 RSI values for the stochastic normalization; a
    * flat RSI channel NULLs the output ≡ the batch guard.
    * O(#assets · (rsiSpan + span)) state.
    */
  def stochRsiStream(daily: Dataset[DailyTick], rsiSpan: Int = 60,
                     span: Int = 14): Dataset[StochRsiPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    val w = 13.0 / 14.0
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[StochRsiState, StochRsiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[StochRsiState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[StochRsiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st == null) {
              st = StochRsiState(t.value, Vector.empty, Vector.empty)
            } else if (st.last_value != 0.0) {
              val ret = graft.operators.Micro.jvm6(t.value / st.last_value - 1.0)
              val rets = (st.rets :+ ret).takeRight(rsiSpan)
              var ag = 0.0; var al = 0.0
              rets.foreach { x =>
                ag = ag * w + math.max(x, 0.0); al = al * w + math.max(-x, 0.0)
              }
              val rsi =
                if (al == 0.0) 100.0
                else graft.operators.Micro.jvm4(100.0 - 100.0 / (1.0 + ag / al))
              val rsis = (st.rsis :+ rsi).takeRight(span)
              val lo = rsis.min
              val hi = rsis.max
              val sr =
                if (hi == lo) None
                else Some(graft.operators.Micro.jvm6((rsi - lo) / (hi - lo)))
              out += StochRsiPoint(assetId, t.date, rsi, sr)
              st = StochRsiState(t.value, rets, rsis)
            } else {
              st = StochRsiState(t.value, st.rets, st.rsis)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class TsiState(lastClose: Double, seen: Boolean, moms: Vector[Double],
                      e1s: Vector[Double], a1s: Vector[Double])
  case class TsiPoint(asset_id: Long, date: java.sql.Date, mom: Double,
                      tsi: Option[Double])

  /** D67 `tsiStream` — streaming face of B117 `tsi`: ring of 25
    * ROUNDED momenta feeds the slow EW pair (signed and absolute),
    * rings of 13 ROUNDED stage-1 outputs feed the fast pair — the
    * batch u6-at-every-stage discipline; first-ever bar emits nothing.
    * O(#assets · (slow + 2·fast)) state.
    */
  def tsiStream(bars: Dataset[OhlcStreamBar], slow: Int = 25,
                fast: Int = 13): Dataset[TsiPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val ws = 1.0 - 2.0 / (slow + 1.0)
    val wf = 1.0 - 2.0 / (fast + 1.0)
    def ew(arr: Vector[Double], weight: Double): Double = {
      var num = 0.0; var den = 0.0
      arr.foreach { x => num = num * weight + x; den = den * weight + 1.0 }
      graft.operators.Micro.jvm6(num / den)
    }
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[TsiState, TsiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[TsiState]) =>
          var st = state.getOption.getOrElse(
            TsiState(0.0, seen = false, Vector.empty, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[TsiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val mom = graft.operators.Micro.jvm6(b.close - st.lastClose)
              val moms = (st.moms :+ mom).takeRight(slow)
              val e1 = ew(moms, ws)
              val a1 = ew(moms.map(math.abs), ws)
              val e1s = (st.e1s :+ e1).takeRight(fast)
              val a1s = (st.a1s :+ a1).takeRight(fast)
              val e2 = ew(e1s, wf)
              val a2 = ew(a1s, wf)
              val tsi =
                if (a2 == 0.0) None
                else Some(graft.operators.Micro.jvm6(100.0 * e2 / a2))
              out += TsiPoint(assetId, b.date, mom, tsi)
              st = TsiState(b.close, seen = true, moms, e1s, a1s)
            } else {
              st = TsiState(b.close, seen = true, st.moms, st.e1s, st.a1s)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class PvoState(vols: Vector[Double])
  case class PvoPoint(asset_id: Long, date: java.sql.Date, e_fast: Double,
                      e_slow: Double, pvo: Option[Double])

  /** D68 `pvoStream` — streaming face of B116 `pvo`: ring of the last
    * `slow` tick volumes; the fast EW folds the tail, the slow EW the
    * whole ring, the percentage spread follows the batch op order
    * (zero slow EW → NULL). O(#assets · slow) state.
    */
  def pvoStream(bars: Dataset[OhlcStreamBar], fast: Int = 12,
                slow: Int = 26): Dataset[PvoPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val wf = 1.0 - 2.0 / (fast + 1.0)
    val ws = 1.0 - 2.0 / (slow + 1.0)
    def ew(arr: Vector[Double], weight: Double): Double = {
      var num = 0.0; var den = 0.0
      arr.foreach { x => num = num * weight + x; den = den * weight + 1.0 }
      graft.operators.Micro.jvm6(num / den)
    }
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PvoState, PvoPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[PvoState]) =>
          var ring = state.getOption.map(_.vols).getOrElse(Vector.empty)
          val out = Vector.newBuilder[PvoPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            ring = (ring :+ b.n_ticks.toDouble).takeRight(slow)
            val ef = ew(ring.takeRight(fast), wf)
            val es = ew(ring, ws)
            val pvo =
              if (es == 0.0) None
              else Some(graft.operators.Micro.jvm6(100.0 * (ef - es) / es))
            out += PvoPoint(assetId, b.date, ef, es, pvo)
          }
          state.update(PvoState(ring))
          out.result().iterator
      }
  }

  case class CoppockState(closes: Vector[Double], rcs: Vector[Double])
  case class CoppockPoint(asset_id: Long, date: java.sql.Date, rc: Double,
                          coppock: Double)

  /** D69 `coppockStream` — streaming face of B107 `coppock`: ring of
    * the last 15 closes for the two RoC lags (either missing or a zero
    * base → the bar emits nothing AND pushes nothing, the batch
    * rc-NULL filter), ring of 10 ROUNDED rc values for the linearly
    * front-weighted WMA (1-based weights oldest-first, exact
    * triangular-number denominator). O(#assets · (15 + wma)) state.
    */
  def coppockStream(bars: Dataset[OhlcStreamBar], wma: Int = 10): Dataset[CoppockPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CoppockState, CoppockPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[CoppockState]) =>
          var st = state.getOption.getOrElse(CoppockState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[CoppockPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val closes = (st.closes :+ b.close).takeRight(15)
            def roc(k: Int): Option[Double] = {
              val i = closes.size - 1 - k
              if (i < 0 || closes(i) == 0.0) None
              else Some(graft.operators.Micro.jvm6(b.close / closes(i) - 1.0))
            }
            (roc(14), roc(11)) match {
              case (Some(r14), Some(r11)) =>
                val rc = graft.operators.Micro.jvm6(r14 + r11)
                val rcs = (st.rcs :+ rc).takeRight(wma)
                var wnum = 0.0
                var i = 0
                rcs.foreach { x => wnum += x * (i + 1); i += 1 }
                val n = rcs.size
                out += CoppockPoint(assetId, b.date, rc,
                  graft.operators.Micro.jvm6(wnum / (n * (n + 1) / 2).toDouble))
                st = CoppockState(closes, rcs)
              case _ =>
                st = CoppockState(closes, st.rcs)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class KstState(closes: Vector[Double], r1s: Vector[Double],
                      r2s: Vector[Double], r3s: Vector[Double],
                      r4s: Vector[Double], ksts: Vector[Double])
  case class KstPoint(asset_id: Long, date: java.sql.Date, kst: Double,
                      sig: Double)

  /** D70 `kstStream` — streaming face of B139 `kst`: ring of the last
    * 16 closes for the four RoC lags (any missing or zero-base → the
    * bar emits nothing and pushes nothing, the batch all-non-NULL
    * filter), four SMA rings of ROUNDED RoCs, one SMA ring of ROUNDED
    * KST values for the signal. O(#assets · ~40) state.
    */
  def kstStream(bars: Dataset[OhlcStreamBar]): Dataset[KstPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    def sma(arr: Vector[Double]): Double =
      graft.operators.Micro.jvm6(arr.foldLeft(0.0)(_ + _) / arr.size.toDouble)
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[KstState, KstPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[KstState]) =>
          var st = state.getOption.getOrElse(KstState(Vector.empty, Vector.empty,
            Vector.empty, Vector.empty, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[KstPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val closes = (st.closes :+ b.close).takeRight(16)
            def roc(k: Int): Option[Double] = {
              val i = closes.size - 1 - k
              if (i < 0 || closes(i) == 0.0) None
              else Some(graft.operators.Micro.jvm6(b.close / closes(i) - 1.0))
            }
            (roc(5), roc(8), roc(11), roc(15)) match {
              case (Some(r1), Some(r2), Some(r3), Some(r4)) =>
                val r1s = (st.r1s :+ r1).takeRight(5)
                val r2s = (st.r2s :+ r2).takeRight(5)
                val r3s = (st.r3s :+ r3).takeRight(5)
                val r4s = (st.r4s :+ r4).takeRight(8)
                val kst = graft.operators.Micro.jvm6(
                  sma(r1s) + 2.0 * sma(r2s) + 3.0 * sma(r3s) + 4.0 * sma(r4s))
                val ksts = (st.ksts :+ kst).takeRight(5)
                out += KstPoint(assetId, b.date, kst, sma(ksts))
                st = KstState(closes, r1s, r2s, r3s, r4s, ksts)
              case _ =>
                st = KstState(closes, st.r1s, st.r2s, st.r3s, st.r4s, st.ksts)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class MassState(rs: Vector[Double], e1s: Vector[Double],
                       ratios: Vector[Double])
  case class MassPoint(asset_id: Long, date: java.sql.Date, r: Double,
                       ratio: Double, mass: Double)

  /** D71 `massIndexStream` — streaming face of B111 `mass_index`: two
    * chained EW rings over the ROUNDED bar range (the trix discipline)
    * plus a 25-ring of ROUNDED EMA ratios for the mass sum; zero
    * second-stage EMA → ratio 0 ≡ the batch guard.
    * O(#assets · (2·ema + window)) state.
    */
  def massIndexStream(bars: Dataset[OhlcStreamBar], ema: Int = 9,
                      window: Int = 25): Dataset[MassPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w = 1.0 - 2.0 / (ema + 1.0)
    def ew(arr: Vector[Double]): Double = {
      var num = 0.0; var den = 0.0
      arr.foreach { x => num = num * w + x; den = den * w + 1.0 }
      graft.operators.Micro.jvm6(num / den)
    }
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[MassState, MassPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[MassState]) =>
          var st = state.getOption.getOrElse(
            MassState(Vector.empty, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[MassPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val r = graft.operators.Micro.jvm6(b.high - b.low)
            val rs = (st.rs :+ r).takeRight(ema)
            val e1 = ew(rs)
            val e1s = (st.e1s :+ e1).takeRight(ema)
            val e2 = ew(e1s)
            val ratio = graft.operators.Micro.jvm6(if (e2 == 0.0) 0.0 else e1 / e2)
            val ratios = (st.ratios :+ ratio).takeRight(window)
            out += MassPoint(assetId, b.date, r, ratio,
              graft.operators.Micro.jvm6(ratios.foldLeft(0.0)(_ + _)))
            st = MassState(rs, e1s, ratios)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class ChandelierState(lastClose: Double, seen: Boolean,
                             trs: Vector[Double], hl: Vector[(Double, Double)])
  case class ChandelierPoint(asset_id: Long, date: java.sql.Date, atr: Double,
                             long_exit: Double, short_exit: Double)

  /** D72 `chandelierExitStream` — streaming face of B114
    * `chandelier_exit`: prev close + ring of 22 ROUNDED TRs (Wilder
    * ATR fold) + ring of 22 (high, low) for the channel extremes;
    * exits composed from the ROUNDED atr ≡ the batch columns.
    * O(#assets · 2·span) state.
    */
  def chandelierExitStream(bars: Dataset[OhlcStreamBar], span: Int = 22,
                           mult: Double = 3.0): Dataset[ChandelierPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w = (span - 1).toDouble / span
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ChandelierState, ChandelierPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[ChandelierState]) =>
          var st = state.getOption.getOrElse(
            ChandelierState(0.0, seen = false, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[ChandelierPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tr = graft.operators.Micro.jvm6(
              if (!st.seen) b.high - b.low
              else math.max(b.high - b.low,
                math.max(math.abs(b.high - st.lastClose), math.abs(b.low - st.lastClose))))
            val trs = (st.trs :+ tr).takeRight(span)
            val hl = (st.hl :+ ((b.high, b.low))).takeRight(span)
            var num = 0.0; var den = 0.0
            trs.foreach { x => num = num * w + x; den = den * w + 1.0 }
            val atr = graft.operators.Micro.jvm6(num / den)
            out += ChandelierPoint(assetId, b.date, atr,
              graft.operators.Micro.jvm6(hl.map(_._1).max - mult * atr),
              graft.operators.Micro.jvm6(hl.map(_._2).min + mult * atr))
            st = ChandelierState(b.close, seen = true, trs, hl)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class AdxState(ph: Double, pl: Double, pc: Double, seen: Boolean,
                      dmp: Vector[Double], dmm: Vector[Double],
                      trs: Vector[Double], dxs: Vector[Double])
  case class AdxPoint(asset_id: Long, date: java.sql.Date, di_plus: Double,
                      di_minus: Double, dx: Double, adx: Double)

  /** D73 `adxStream` — streaming face of B110 `adx`: prev bar's
    * high/low/close + rings of 14 ROUNDED ±DM and TR (UNnormalized
    * Horner sums, the batch ewSum) + ring of 14 ROUNDED DX for the
    * normalized ADX fold; zero-TR and zero-DI guards ≡ the batch 0
    * conventions; first-ever bar emits nothing. O(#assets · 4·span)
    * state.
    */
  def adxStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[AdxPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w = (span - 1).toDouble / span
    def hSum(arr: Vector[Double]): Double = {
      var acc = 0.0
      arr.foreach { x => acc = acc * w + x }
      acc
    }
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AdxState, AdxPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[AdxState]) =>
          var st = state.getOption.getOrElse(
            AdxState(0.0, 0.0, 0.0, seen = false,
              Vector.empty, Vector.empty, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[AdxPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val up = b.high - st.ph
              val dn = st.pl - b.low
              val dmP = graft.operators.Micro.jvm6(if (up > dn && up > 0) up else 0.0)
              val dmM = graft.operators.Micro.jvm6(if (dn > up && dn > 0) dn else 0.0)
              val tr = graft.operators.Micro.jvm6(math.max(b.high - b.low,
                math.max(math.abs(b.high - st.pc), math.abs(b.low - st.pc))))
              val dmp = (st.dmp :+ dmP).takeRight(span)
              val dmm = (st.dmm :+ dmM).takeRight(span)
              val trs = (st.trs :+ tr).takeRight(span)
              val sT = hSum(trs)
              val diP = graft.operators.Micro.jvm6(
                if (sT == 0.0) 0.0 else 100.0 * hSum(dmp) / sT)
              val diM = graft.operators.Micro.jvm6(
                if (sT == 0.0) 0.0 else 100.0 * hSum(dmm) / sT)
              val dx = graft.operators.Micro.jvm6(
                if (diP + diM == 0.0) 0.0
                else 100.0 * math.abs(diP - diM) / (diP + diM))
              val dxs = (st.dxs :+ dx).takeRight(span)
              var num = 0.0; var den = 0.0
              dxs.foreach { x => num = num * w + x; den = den * w + 1.0 }
              out += AdxPoint(assetId, b.date, diP, diM, dx,
                graft.operators.Micro.jvm6(num / den))
              st = AdxState(b.high, b.low, b.close, seen = true, dmp, dmm, trs, dxs)
            } else {
              st = AdxState(b.high, b.low, b.close, seen = true,
                st.dmp, st.dmm, st.trs, st.dxs)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class KamaState(closes: Vector[Double], ds: Vector[Double],
                       prevKama: Option[Double], seen: Boolean)
  case class KamaPoint(asset_id: Long, date: java.sql.Date, close: Double,
                       er: Option[Double], kama: Double)

  /** D74 `kamaStream` — streaming face of B167 `kama`: the
    * RecurrenceFold recursion carried as live state (prev KAMA + a
    * ring of n+1 closes for the signal leg and n deltas for the noise
    * leg — only the first-ever bar has no delta, so the ring is
    * null-free like the batch collect_list). ER/SC/KAMA follow the
    * batch op order and constants verbatim; the first bar seeds
    * KAMA = close with NULL ER. O(#assets · 2n) state.
    */
  def kamaStream(bars: Dataset[OhlcStreamBar], n: Int = 10): Dataset[KamaPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val fastSC = 0.666667
    val slowSC = 0.064516
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[KamaState, KamaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[KamaState]) =>
          var st = state.getOption.getOrElse(
            KamaState(Vector.empty, Vector.empty, None, seen = false))
          val out = Vector.newBuilder[KamaPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (!st.seen) {
              out += KamaPoint(assetId, b.date, b.close, None, b.close)
              st = KamaState(Vector(b.close), Vector.empty, Some(b.close), seen = true)
            } else {
              val closes = (st.closes :+ b.close).takeRight(n + 1)
              val d = math.abs(b.close - st.closes.last)
              val ds = (st.ds :+ d).takeRight(n)
              val noise = ds.foldLeft(0.0)(_ + _)
              val signal = math.abs(b.close - closes.head)
              val er =
                if (noise == 0.0) 0.0
                else graft.operators.Micro.jvm6(signal / noise)
              val a = er * (fastSC - slowSC) + slowSC
              val sc = graft.operators.Micro.jvm6(a * a)
              val k = graft.operators.Micro.jvm6(
                st.prevKama.get + sc * (b.close - st.prevKama.get))
              out += KamaPoint(assetId, b.date, b.close, Some(er), k)
              st = KamaState(closes, ds, Some(k), seen = true)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class FisherState(hl: Vector[(Double, Double)], pv: Double, pf: Double,
                         prevFisher: Option[Double])
  case class FisherPoint(asset_id: Long, date: java.sql.Date, close: Double,
                         fisher: Double, trigger: Option[Double])

  /** D75 `fisherTransformStream` — streaming face of B152
    * `fisher_transform`: ring of 10 (high, low) pairs for the channel
    * position, the clamped x and the two RecurrenceFold state values
    * (smoothed v and fisher, both seeded at 0) carried live; trigger
    * is the previous fisher (NULL on each asset's first bar ≡ the
    * batch lag). O(#assets · span) state.
    */
  def fisherTransformStream(bars: Dataset[OhlcStreamBar],
                            span: Int = 10): Dataset[FisherPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[FisherState, FisherPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[FisherState]) =>
          var st = state.getOption.getOrElse(FisherState(Vector.empty, 0.0, 0.0, None))
          val out = Vector.newBuilder[FisherPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val hl = (st.hl :+ ((b.high, b.low))).takeRight(span)
            val hi = hl.map(_._1).max
            val lo = hl.map(_._2).min
            val pos =
              if (hi == lo) 0.5
              else graft.operators.Micro.jvm6((b.close - lo) / (hi - lo))
            val x = graft.operators.Micro.jvm6(
              math.max(math.min(2.0 * pos - 1, 0.999), -0.999))
            val v = graft.operators.Micro.jvm6(0.33 * x + 0.67 * st.pv)
            val fisher = graft.operators.Micro.jvm6(
              0.5 * math.log((1.0 + v) / (1.0 - v)) + 0.5 * st.pf)
            out += FisherPoint(assetId, b.date, b.close, fisher, st.prevFisher)
            st = FisherState(hl, v, fisher, Some(fisher))
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class CrsiState(last_value: Double, seen: Boolean, prevSgn: Long,
                       runLen: Long, prevStreak: Option[Long],
                       rets3: Vector[Double], sds2: Vector[Double],
                       prHist: Vector[Double])
  case class CrsiPoint(asset_id: Long, date: java.sql.Date, streak: Long,
                       rsi3: Double, rsi2: Double, pr: Option[Double],
                       crsi: Option[Double])

  /** D76 `connorsRsiStream` — streaming face of B144 `connors_rsi`:
    * the sign-run streak carried as (sign, run length), its delta
    * feeding a 2-ring Wilder RSI beside the 3-ring return RSI, and a
    * 100-ring of PRIOR returns for the percent-rank leg (strictly
    * before the current row ≡ the batch −100..−1 frame; empty → NULL
    * pr and crsi). A row without a streak delta (each asset's first
    * return) emits nothing and enters no ring ≡ the batch filter.
    * O(#assets · ~105) state.
    */
  def connorsRsiStream(daily: Dataset[DailyTick]): Dataset[CrsiPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    def wilderRsi(arr: Vector[Double], span: Int): Double = {
      val w = (span - 1).toDouble / span
      var ag = 0.0; var al = 0.0
      arr.foreach { x => ag = ag * w + math.max(x, 0.0); al = al * w + math.max(-x, 0.0) }
      if (al == 0.0) 100.0
      else graft.operators.Micro.jvm4(100.0 - 100.0 / (1.0 + ag / al))
    }
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CrsiState, CrsiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[CrsiState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[CrsiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st == null) {
              st = CrsiState(t.value, seen = true, 0L, 0L, None,
                Vector.empty, Vector.empty, Vector.empty)
            } else if (st.last_value != 0.0) {
              val ret = graft.operators.Micro.jvm6(t.value / st.last_value - 1.0)
              val sgn = math.signum(ret).toLong
              val runLen = if (sgn == st.prevSgn && sgn != 0L && st.prevStreak.isDefined)
                st.runLen + 1 else 1L
              val streak = if (sgn == 0L) 0L else sgn * runLen
              st.prevStreak match {
                case Some(ps) =>
                  val sd = (streak - ps).toDouble
                  val rets3 = (st.rets3 :+ ret).takeRight(3)
                  val sds2 = (st.sds2 :+ sd).takeRight(2)
                  val pr =
                    if (st.prHist.isEmpty) None
                    else Some(graft.operators.Micro.jvm6(
                      100.0 * st.prHist.count(_ < ret).toDouble / st.prHist.size.toDouble))
                  val rsi3 = wilderRsi(rets3, 3)
                  val rsi2 = wilderRsi(sds2, 2)
                  val crsi = pr.map(p =>
                    graft.operators.Micro.jvm6((rsi3 + rsi2 + p) / 3))
                  out += CrsiPoint(assetId, t.date, streak, rsi3, rsi2, pr, crsi)
                  st = CrsiState(t.value, seen = true, sgn, runLen, Some(streak),
                    rets3, sds2, (st.prHist :+ ret).takeRight(100))
                case None =>
                  // first return row: streak exists but its delta does
                  // not — no emission, no ring entries (the batch filter)
                  st = CrsiState(t.value, seen = true, sgn, runLen, Some(streak),
                    st.rets3, st.sds2, st.prHist)
              }
            } else {
              st = CrsiState(t.value, seen = true, st.prevSgn, st.runLen,
                st.prevStreak, st.rets3, st.sds2, st.prHist)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class DemaState(closes: Vector[Double], e1s: Vector[Double],
                       e2s: Vector[Double])
  case class DemaPoint(asset_id: Long, date: java.sql.Date, close: Double,
                       e1: Double, dema: Double, tema: Double)

  /** D77 `demaTemaStream` — streaming face of B145 `dema_tema`: three
    * chained EW rings of ROUNDED stage outputs (the trix discipline);
    * DEMA/TEMA composed from the rounded stages with the batch
    * association order. O(#assets · 3·span) state.
    */
  def demaTemaStream(bars: Dataset[OhlcStreamBar], span: Int = 15): Dataset[DemaPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val w = 1.0 - 2.0 / (span + 1.0)
    def ew(arr: Vector[Double]): Double = {
      var num = 0.0; var den = 0.0
      arr.foreach { x => num = num * w + x; den = den * w + 1.0 }
      graft.operators.Micro.jvm6(num / den)
    }
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[DemaState, DemaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[DemaState]) =>
          var st = state.getOption.getOrElse(
            DemaState(Vector.empty, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[DemaPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val closes = (st.closes :+ b.close).takeRight(span)
            val e1 = ew(closes)
            val e1s = (st.e1s :+ e1).takeRight(span)
            val e2 = ew(e1s)
            val e2s = (st.e2s :+ e2).takeRight(span)
            val e3 = ew(e2s)
            out += DemaPoint(assetId, b.date, b.close, e1,
              graft.operators.Micro.jvm6(2.0 * e1 - e2),
              graft.operators.Micro.jvm6(3.0 * e1 - 3.0 * e2 + e3))
            st = DemaState(closes, e1s, e2s)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class NviState(prevClose: Option[Double], prevVol: Option[Long],
                      nviMicro: Long, pviMicro: Long)
  case class NviPoint(asset_id: Long, date: java.sql.Date, close: Double,
                      nvi_log: Double, pvi_log: Double)

  /** D78 `nviPviStream` — streaming face of B136 `nvi_pvi`: the two
    * log-index legs as exact INTEGER micro running sums (the
    * vpt/cusum replay-stable discipline), routed by the volume
    * comparison against the carried previous bar; undefined log
    * returns contribute 0 ≡ the batch coalesce. O(#assets) state —
    * four numbers per key.
    */
  def nviPviStream(bars: Dataset[OhlcStreamBar]): Dataset[NviPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[NviState, NviPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[NviState]) =>
          var st = state.getOption.getOrElse(NviState(None, None, 0L, 0L))
          val out = Vector.newBuilder[NviPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val lrMicro = st.prevClose match {
              case Some(pc) if pc > 0 && b.close > 0 =>
                Math.round(graft.operators.Micro.jvm6(math.log(b.close / pc)) * 1e6)
              case _ => 0L
            }
            val nvi = st.nviMicro +
              (if (st.prevVol.exists(b.n_ticks < _)) lrMicro else 0L)
            val pvi = st.pviMicro +
              (if (st.prevVol.exists(b.n_ticks > _)) lrMicro else 0L)
            out += NviPoint(assetId, b.date, b.close,
              nvi.toDouble / 1e6, pvi.toDouble / 1e6)
            st = NviState(Some(b.close), Some(b.n_ticks), nvi, pvi)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class KlingerState(prevTp: Option[Double], svds: Vector[Double],
                          kos: Vector[Double])
  case class KlingerPoint(asset_id: Long, date: java.sql.Date, sv: Long,
                          ko: Double, signal: Double)

  /** D79 `klingerOscStream` — streaming face of B148 `klinger_osc`:
    * signed tick volume routed by the typical-price direction (prev tp
    * carried; first bar contributes 0), a 55-ring of signed volumes
    * (fast EW on the 34-tail, slow on the ring) and a 13-ring of
    * ROUNDED KO values for the signal. O(#assets · (slow + sig))
    * state.
    */
  def klingerOscStream(bars: Dataset[OhlcStreamBar], fast: Int = 34,
                       slow: Int = 55, sig: Int = 13): Dataset[KlingerPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    def ew(arr: Vector[Double], span: Int): Double = {
      val w = 1.0 - 2.0 / (span + 1.0)
      var num = 0.0; var den = 0.0
      arr.foreach { x => num = num * w + x; den = den * w + 1.0 }
      graft.operators.Micro.jvm6(num / den)
    }
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[KlingerState, KlingerPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[KlingerState]) =>
          var st = state.getOption.getOrElse(
            KlingerState(None, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[KlingerPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tp = graft.operators.Micro.jvm6((b.high + b.low + b.close) / 3)
            val sv = st.prevTp match {
              case Some(p) if tp > p => b.n_ticks
              case Some(p) if tp < p => -b.n_ticks
              case _ => 0L
            }
            val svds = (st.svds :+ sv.toDouble).takeRight(slow)
            val ko = graft.operators.Micro.jvm6(
              ew(svds.takeRight(fast), fast) - ew(svds, slow))
            val kos = (st.kos :+ ko).takeRight(sig)
            out += KlingerPoint(assetId, b.date, sv, ko, ew(kos, sig))
            st = KlingerState(Some(tp), svds, kos)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class VhfState(last_value: Double, seen: Boolean,
                      vd: Vector[(Double, Double)])
  case class VhfPoint(asset_id: Long, date: java.sql.Date, vhf: Option[Double])

  /** D80 `vhfStream` — streaming face of B184 `vhf`: ring of the last
    * n (value, delta) pairs over the POST-FILTER rows (each asset's
    * first value has no delta and enters nothing ≡ the batch filter);
    * channel from the ring's values, denominator = ordered fold of
    * |delta|, zero mass → NULL. O(#assets · n) state.
    */
  def vhfStream(daily: Dataset[DailyTick], n: Int = 28): Dataset[VhfPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VhfState, VhfPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[VhfState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[VhfPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st == null) {
              st = VhfState(t.value, seen = true, Vector.empty)
            } else {
              val d = t.value - st.last_value
              val vd = (st.vd :+ ((t.value, d))).takeRight(n)
              val hi = vd.map(_._1).max
              val lo = vd.map(_._1).min
              val den = vd.foldLeft(0.0)((a, p) => a + math.abs(p._2))
              val vhf =
                if (den == 0.0) None
                else Some(graft.operators.Micro.jvm6((hi - lo) / den))
              out += VhfPoint(assetId, t.date, vhf)
              st = VhfState(t.value, seen = true, vd)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class RwiState(lastClose: Double, seen: Boolean, trs: Vector[Double],
                      hl: Vector[(Double, Double)])
  case class RwiPoint(asset_id: Long, date: java.sql.Date,
                      rwi_high: Option[Double], rwi_low: Option[Double])

  /** D81 `rwiStream` — streaming face of B188 `rwi`: prev close +
    * ring of n ROUNDED TRs (plain-mean ATR) + ring of n (high, low)
    * pairs whose head supplies the lag(n−1) extremes (absent → NULL ≡
    * the batch lag); √n is the same Scala constant the batch embeds.
    * O(#assets · 2n) state.
    */
  def rwiStream(bars: Dataset[OhlcStreamBar], n: Int = 8): Dataset[RwiPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val sqrtN = math.sqrt(n.toDouble)
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RwiState, RwiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[RwiState]) =>
          var st = state.getOption.getOrElse(
            RwiState(0.0, seen = false, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[RwiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tr = graft.operators.Micro.jvm6(
              if (!st.seen) b.high - b.low
              else math.max(b.high - b.low,
                math.max(math.abs(b.high - st.lastClose), math.abs(b.low - st.lastClose))))
            val trs = (st.trs :+ tr).takeRight(n)
            val hl = (st.hl :+ ((b.high, b.low))).takeRight(n)
            val atr = graft.operators.Micro.jvm6(
              trs.foldLeft(0.0)(_ + _) / trs.size.toDouble)
            val lagIdx = hl.size - 1 - (n - 1)
            val (rh, rl) =
              if (lagIdx < 0 || atr == 0.0) (None, None)
              else {
                val den = atr * sqrtN
                (Some(graft.operators.Micro.jvm6((b.high - hl(lagIdx)._2) / den)),
                  Some(graft.operators.Micro.jvm6((hl(lagIdx)._1 - b.low) / den)))
              }
            out += RwiPoint(assetId, b.date, rh, rl)
            st = RwiState(b.close, seen = true, trs, hl)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class StcState(values: Vector[Double], macds: Vector[Double],
                      k1s: Vector[Double], d1s: Vector[Double],
                      k2s: Vector[Double])
  case class StcPoint(asset_id: Long, date: java.sql.Date, stc: Double)

  /** D82 `stcStream` — streaming face of B194 `stc`: the full Schaff
    * pipeline as five chained rings (closes → MACD → stoch k1 → EW d1
    * → stoch k2 → EW stc), every stage boundary ROUNDED like the
    * batch, with the per-stage flat conventions (trendless MACD
    * window → 50; saturated d1 window carries its level).
    * O(#assets · span) state.
    */
  def stcStream(daily: Dataset[DailyTick], fast: Int = 23, slow: Int = 50,
                cycle: Int = 10, smooth: Int = 3, span: Int = 120): Dataset[StcPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    def w(n: Int): Double = 1.0 - 2.0 / (n + 1.0)
    val (wf, ws, wsm) = (w(fast), w(slow), w(smooth))
    def ew(arr: Vector[Double], weight: Double): Double = {
      var num = 0.0; var den = 0.0
      arr.foreach { x => num = num * weight + x; den = den * weight + 1.0 }
      num / den
    }
    def stoch(c: Double, lo: Double, hi: Double, flat: Double): Double =
      if (hi == lo) flat
      else graft.operators.Micro.jvm6(100.0 * (c - lo) / (hi - lo))
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[StcState, StcPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[StcState]) =>
          var st = state.getOption.getOrElse(StcState(Vector.empty, Vector.empty,
            Vector.empty, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[StcPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val values = (st.values :+ t.value).takeRight(span)
            val macd = graft.operators.Micro.jvm6(ew(values, wf) - ew(values, ws))
            val macds = (st.macds :+ macd).takeRight(cycle)
            val k1 = stoch(macd, macds.min, macds.max, 50.0)
            val k1s = (st.k1s :+ k1).takeRight(smooth * 4)
            val d1 = graft.operators.Micro.jvm6(ew(k1s, wsm))
            val d1s = (st.d1s :+ d1).takeRight(cycle)
            val k2 = stoch(d1, d1s.min, d1s.max, d1)
            val k2s = (st.k2s :+ k2).takeRight(smooth * 4)
            out += StcPoint(assetId, t.date, graft.operators.Micro.jvm6(ew(k2s, wsm)))
            st = StcState(values, macds, k1s, d1s, k2s)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class PivotState(ph: Double, pl: Double, pc: Double, seen: Boolean)
  case class PivotPoint2(asset_id: Long, date: java.sql.Date, close: Double,
                         p: Option[Double], r1: Option[Double],
                         s1: Option[Double], r2: Option[Double],
                         s2: Option[Double])

  /** D83 `pivotPointsStream` — streaming face of B50 `pivot_points`:
    * the previous bar's high/low/close IS the state (three doubles per
    * asset); each asset's first bar emits NULL levels ≡ the batch
    * lag. O(#assets) state.
    */
  def pivotPointsStream(bars: Dataset[OhlcStreamBar]): Dataset[PivotPoint2] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PivotState, PivotPoint2](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[PivotState]) =>
          var st = state.getOption.getOrElse(PivotState(0.0, 0.0, 0.0, seen = false))
          val out = Vector.newBuilder[PivotPoint2]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val p = graft.operators.Micro.jvm6((st.ph + st.pl + st.pc) / 3)
              out += PivotPoint2(assetId, b.date, b.close, Some(p),
                Some(graft.operators.Micro.jvm6(2.0 * p - st.pl)),
                Some(graft.operators.Micro.jvm6(2.0 * p - st.ph)),
                Some(graft.operators.Micro.jvm6(p + (st.ph - st.pl))),
                Some(graft.operators.Micro.jvm6(p - (st.ph - st.pl))))
            } else {
              out += PivotPoint2(assetId, b.date, b.close, None, None, None, None, None)
            }
            st = PivotState(b.high, b.low, b.close, seen = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The market breadth tape: one row per trading date with the
    * cross-sectional advance/decline counts — the shape an exchange
    * publishes as an index leg (the [[rollingCorrStream]] market-feed
    * precedent). All market-wide twins key on the single tape.
    */
  case class BreadthTick(date: java.sql.Date, n_up: Long, n_down: Long,
                         n_flat: Long)

  case class AdvDecState(ad: Long)
  case class AdvDecPoint(date: java.sql.Date, n_up: Long, n_down: Long,
                         n_flat: Long, ad_line: Long)

  /** D84 `advanceDeclineStream` — streaming face of B35
    * `advance_decline`: the cumulative advance-decline line as one
    * INTEGER running sum over the breadth tape (exact under any batch
    * split). O(1) state.
    */
  def advanceDeclineStream(ticks: Dataset[BreadthTick]): Dataset[AdvDecPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_ => 0L)
      .flatMapGroupsWithState[AdvDecState, AdvDecPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BreadthTick], state: GroupState[AdvDecState]) =>
          var run = state.getOption.map(_.ad).getOrElse(0L)
          val out = rows.toSeq.sortBy(_.date.getTime).map { t =>
            run += t.n_up - t.n_down
            AdvDecPoint(t.date, t.n_up, t.n_down, t.n_flat, run)
          }
          state.update(AdvDecState(run))
          out.iterator
      }
  }

  case class McclellanState(n19: Double, d19: Double, n39: Double, d39: Double,
                            oscMicro: Long)
  case class McclellanPoint(date: java.sql.Date, net: Long, e19: Double,
                            e39: Double, osc: Double, summation: Double)

  /** D85 `mcclellanStream` — streaming face of B146 `mcclellan`: the
    * batch runs its two EMAs over the UNBOUNDED history frame, and an
    * unbounded normalized Horner fold is exactly an incremental pair
    * of accumulators (num·w + x, den·w + 1) — so the stream carries
    * FOUR doubles instead of any ring and is bit-identical by
    * construction; the summation index rides the integer-micro
    * discipline. O(1) state.
    */
  def mcclellanStream(ticks: Dataset[BreadthTick]): Dataset[McclellanPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_ => 0L)
      .flatMapGroupsWithState[McclellanState, McclellanPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BreadthTick], state: GroupState[McclellanState]) =>
          var st = state.getOption.getOrElse(McclellanState(0.0, 0.0, 0.0, 0.0, 0L))
          val out = Vector.newBuilder[McclellanPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val net = t.n_up - t.n_down
            val x = net.toDouble
            val n19 = st.n19 * 0.9 + x; val d19 = st.d19 * 0.9 + 1.0
            val n39 = st.n39 * 0.95 + x; val d39 = st.d39 * 0.95 + 1.0
            val e19 = graft.operators.Micro.jvm6(n19 / d19)
            val e39 = graft.operators.Micro.jvm6(n39 / d39)
            val osc = graft.operators.Micro.jvm6(e19 - e39)
            val oscMicro = st.oscMicro + Math.round(osc * 1e6)
            out += McclellanPoint(t.date, net, e19, e39, osc,
              graft.operators.Micro.jvm6(oscMicro.toDouble / 1e6))
            st = McclellanState(n19, d19, n39, d39, oscMicro)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class ZweigState(ratios: Vector[Double], emas: Vector[Double])
  case class ZweigPoint(date: java.sql.Date, n_up: Long, n_down: Long,
                        ratio: Double, ema: Double, thrust: Boolean)

  /** D86 `zweigBreadthStream` — streaming face of B205
    * `zweig_breadth`: ring of 4·span ROUNDED advance ratios for the
    * EW smoothing + ring of the span PRIOR ROUNDED EMAs for the
    * thrust lookback (strictly-before frame; empty → no-thrust, the
    * batch coalesce); all-flat dates enter nothing ≡ the batch
    * filter. O(1)-keyed, O(5·span) state.
    */
  def zweigBreadthStream(ticks: Dataset[BreadthTick], span: Int = 10): Dataset[ZweigPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val wEma = 1.0 - 2.0 / (span + 1.0)
    ticks
      .groupByKey(_ => 0L)
      .flatMapGroupsWithState[ZweigState, ZweigPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BreadthTick], state: GroupState[ZweigState]) =>
          var st = state.getOption.getOrElse(ZweigState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[ZweigPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (t.n_up + t.n_down > 0) {
              val ratio = graft.operators.Micro.jvm6(
                t.n_up.toDouble / (t.n_up + t.n_down).toDouble)
              val ratios = (st.ratios :+ ratio).takeRight(span * 4)
              var num = 0.0; var den = 0.0
              ratios.foreach { x => num = num * wEma + x; den = den * wEma + 1.0 }
              val ema = graft.operators.Micro.jvm6(num / den)
              val thrust = st.emas.nonEmpty &&
                ema >= 0.615 && st.emas.takeRight(span).min < 0.40
              out += ZweigPoint(t.date, t.n_up, t.n_down, ratio, ema, thrust)
              st = ZweigState(ratios, (st.emas :+ ema).takeRight(span))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class EwmaVolState(last_value: Double, rets: Vector[Double])
  case class EwmaVolPoint(asset_id: Long, date: java.sql.Date, ret: Double,
                          ewma_vol: Double)

  /** D49 `ewmaVolStream` — streaming face of B204 `ewma_vol`:
    * RiskMetrics EW volatility from a per-asset ring of the last
    * `span` u6 returns; squares computed inside the oldest-first
    * Horner pass (≡ the batch transform-then-fold), zero prior close
    * emits nothing and carries the ring. O(#assets · span) state.
    */
  def ewmaVolStream(daily: Dataset[DailyTick], span: Int = 60,
                    lambda: Double = 0.94): Dataset[EwmaVolPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[EwmaVolState, EwmaVolPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[EwmaVolState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[EwmaVolPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st == null) {
              st = EwmaVolState(t.value, Vector.empty)
            } else if (st.last_value != 0.0) {
              val ret = graft.operators.Micro.jvm6(t.value / st.last_value - 1.0)
              val rets = (st.rets :+ ret).takeRight(span)
              var num = 0.0; var den = 0.0
              rets.foreach { x =>
                val sq = x * x
                num = num * lambda + sq; den = den * lambda + 1.0
              }
              out += EwmaVolPoint(assetId, t.date, ret,
                graft.operators.Micro.jvm6(math.sqrt(num / den)))
              st = EwmaVolState(t.value, rets)
            } else {
              st = EwmaVolState(t.value, st.rets)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class StochState(hl: Vector[(Double, Double)], prevKs: Vector[Option[Double]])
  case class StochPoint(asset_id: Long, date: java.sql.Date, close: Double,
                        pct_k: Option[Double], pct_d: Option[Double])

  /** D44 `stochasticStream` — streaming face of B41 `stochastic_osc`:
    * %K from a per-asset ring of the last `span` (high, low) pairs,
    * %D as the explicit left-assoc 3-bar mean of the ROUNDED %K
    * values carried in state (two Options — the batch twin's
    * lag(2)/lag(1), including their NULLs: a flat-channel NULL %K
    * poisons every %D it touches, and the first two bars have no %D
    * at all). O(#assets · span) state.
    */
  def stochasticStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[StochPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[StochState, StochPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[StochState]) =>
          var st = state.getOption.getOrElse(StochState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[StochPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val hl = (st.hl :+ ((b.high, b.low))).takeRight(span)
            val hn = hl.map(_._1).max
            val ln = hl.map(_._2).min
            val k =
              if (hn == ln) None
              else Some(graft.operators.Micro.jvm6(100.0 * (b.close - ln) / (hn - ln)))
            val d =
              if (st.prevKs.size < 2) None
              else for (k2 <- st.prevKs(0); k1 <- st.prevKs(1); kk <- k)
                yield graft.operators.Micro.jvm6(((k2 + k1) + kk) / 3.0)
            out += StochPoint(assetId, b.date, b.close, k, d)
            st = StochState(hl, (st.prevKs :+ k).takeRight(2))
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The index-weighted ring mean shared by the WMA-family twins:
    * weight i+1 on the i-th (oldest-first) ring element over the exact
    * triangle number — [[graft.operators.Analytics.wma]]'s fold
    * replayed imperatively, jvm6 ≡ the batch u6.
    */
  private def wmaOfRing(a: Vector[Double]): Double = {
    val n = a.size.toDouble
    var s = 0.0; var i = 0
    while (i < a.size) { s += a(i) * (i + 1).toDouble; i += 1 }
    graft.operators.Micro.jvm6(s / (n * (n + 1) / 2.0))
  }

  /** Normalized EW Horner fold over a ring — the batch
    * `seqFold(horner)/seqFold(horner_count)` pair, jvm6-rounded.
    */
  private def ewOfRing(a: Vector[Double], w: Double): Double = {
    var num = 0.0; var den = 0.0
    a.foreach { x => num = num * w + x; den = den * w + 1.0 }
    graft.operators.Micro.jvm6(num / den)
  }

  case class WmaState(ring: Vector[Double])
  case class WmaPoint(asset_id: Long, date: java.sql.Date, value: Double,
                      n_days: Long, wma: Double)

  /** D87 `wmaStream` — streaming face of B207 `wma`: per-asset ring of
    * the last `window` LWW daily closes; the index-weighted mean is
    * the batch fold replayed over the ring. O(#assets · window) state.
    */
  def wmaStream(ticks: Dataset[DailyTick], window: Int = 20): Dataset[WmaPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[WmaState, WmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[WmaState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[WmaPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ t.value).takeRight(window)
            out += WmaPoint(assetId, t.date, t.value, ring.size.toLong, wmaOfRing(ring))
          }
          state.update(WmaState(ring))
          out.result().iterator
      }
  }

  case class VwmaState(ring: Vector[(Double, Long)])
  case class VwmaPoint(asset_id: Long, date: java.sql.Date, close: Double,
                       vol_n: Long, vwma: Double)

  /** D88 `vwmaStream` — streaming face of B208 `vwma`: ring of the
    * last `window` (close·volume, volume) pairs per asset; the
    * numerator is the left-to-right product fold, the denominator an
    * exact integer sum. O(#assets · window) state.
    */
  def vwmaStream(bars: Dataset[OhlcStreamBar], window: Int = 20): Dataset[VwmaPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VwmaState, VwmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[VwmaState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[VwmaPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            ring = (ring :+ ((b.close * b.n_ticks.toDouble, b.n_ticks))).takeRight(window)
            var s = 0.0; var v = 0L
            ring.foreach { case (cv, n) => s += cv; v += n }
            out += VwmaPoint(assetId, b.date, b.close, v,
              graft.operators.Micro.jvm6(s / v.toDouble))
          }
          state.update(VwmaState(ring))
          out.result().iterator
      }
  }

  case class HmaState(vals: Vector[Double], raws: Vector[Double])
  case class HmaPoint(asset_id: Long, date: java.sql.Date, value: Double,
                      raw: Double, hma: Double)

  /** D89 `hmaStream` — streaming face of B209 `hma`: ring of the last
    * `window` closes (the half-length WMA reads its tail) + ring of
    * the last √window ROUNDED raws; each stage rounds before the next
    * consumes, ≡ the batch chain. O(#assets · window) state.
    */
  def hmaStream(ticks: Dataset[DailyTick], window: Int = 16): Dataset[HmaPoint] = {
    val half = math.max(1, window / 2)
    val smooth = math.max(1, math.sqrt(window.toDouble).toInt)
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[HmaState, HmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[HmaState]) =>
          var st = state.getOption.getOrElse(HmaState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[HmaPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val vals = (st.vals :+ t.value).takeRight(window)
            val wf = wmaOfRing(vals)
            val wh = wmaOfRing(vals.takeRight(half))
            val raw = graft.operators.Micro.jvm6(2.0 * wh - wf)
            val raws = (st.raws :+ raw).takeRight(smooth)
            out += HmaPoint(assetId, t.date, t.value, raw, wmaOfRing(raws))
            st = HmaState(vals, raws)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class DemState(ph: Double, pl: Double, seen: Boolean,
                      maxs: Vector[Double], mins: Vector[Double])
  case class DemPoint(asset_id: Long, date: java.sql.Date, dmax: Double,
                      dmin: Double, dem: Option[Double])

  /** D90 `demarkerStream` — streaming face of B210 `demarker`:
    * previous bar's high/low + rings of the last `span` ROUNDED
    * DeMMax/DeMMin legs; plain ordered sums, zero-extension frames
    * NULL, first-ever bar emits nothing. O(#assets · span) state.
    */
  def demarkerStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[DemPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[DemState, DemPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[DemState]) =>
          var st = state.getOption.getOrElse(
            DemState(0.0, 0.0, seen = false, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[DemPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val dmax = graft.operators.Micro.jvm6(math.max(b.high - st.ph, 0.0))
              val dmin = graft.operators.Micro.jvm6(math.max(st.pl - b.low, 0.0))
              val maxs = (st.maxs :+ dmax).takeRight(span)
              val mins = (st.mins :+ dmin).takeRight(span)
              var sx = 0.0; var sn = 0.0
              maxs.foreach(sx += _); mins.foreach(sn += _)
              val dem =
                if (sx + sn == 0.0) None
                else Some(graft.operators.Micro.jvm6(sx / (sx + sn)))
              out += DemPoint(assetId, b.date, dmax, dmin, dem)
              st = DemState(b.high, b.low, seen = true, maxs, mins)
            } else {
              st = DemState(b.high, b.low, seen = true, st.maxs, st.mins)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class CfoState(ring: Vector[Double])
  case class CfoPoint(asset_id: Long, date: java.sql.Date, value: Double,
                      n_days: Long, fitted: Double, cfo: Option[Double])

  /** D91 `cfoStream` — streaming face of B211 `cfo`: ring of the last
    * `window` LWW daily closes; the integral-x OLS algebra (exact
    * closed-form Σt/Σt², left-to-right value folds) replayed per bar,
    * frames below `minN` emit nothing. O(#assets · window) state.
    */
  def cfoStream(ticks: Dataset[DailyTick], window: Int = 14, minN: Int = 5): Dataset[CfoPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CfoState, CfoPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[CfoState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[CfoPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ t.value).takeRight(window)
            if (ring.size >= minN) {
              val n = ring.size.toDouble
              val sx = n * (n + 1) / 2.0
              val sx2 = n * (n + 1) * (2.0 * n + 1) / 6.0
              var sy = 0.0; var sxy = 0.0
              var i = 0
              while (i < ring.size) { sy += ring(i); i += 1 }
              i = 0
              while (i < ring.size) { sxy += ring(i) * (i + 1).toDouble; i += 1 }
              val b = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
              val fitted = graft.operators.Micro.jvm6((sy - b * sx) / n + b * n)
              val cfo =
                if (t.value == 0.0) None
                else Some(graft.operators.Micro.jvm6(
                  100.0 * (t.value - fitted) / t.value))
              out += CfoPoint(assetId, t.date, t.value, ring.size.toLong, fitted, cfo)
            }
          }
          state.update(CfoState(ring))
          out.result().iterator
      }
  }

  case class SmiState(hl: Vector[(Double, Double)], ms: Vector[Double],
                      hrs: Vector[Double], m1s: Vector[Double], h1s: Vector[Double])
  case class SmiPoint(asset_id: Long, date: java.sql.Date, m: Double,
                      smi: Option[Double])

  /** D92 `smiStream` — streaming face of B212 `smi`: ring of the last
    * `span` (high, low) pairs for the channel + four 12-rings carrying
    * the ROUNDED smoothing chain (m, half-range, and their first EW
    * stages); every stage rounds before the next consumes it, ≡ the
    * batch tsi discipline. O(#assets · span) state.
    */
  def smiStream(bars: Dataset[OhlcStreamBar], span: Int = 10,
                s1: Int = 3, s2: Int = 3): Dataset[SmiPoint] = {
    val w1 = 1.0 - 2.0 / (s1 + 1.0)
    val w2 = 1.0 - 2.0 / (s2 + 1.0)
    val k1 = s1 * 4
    val k2 = s2 * 4
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[SmiState, SmiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[SmiState]) =>
          var st = state.getOption.getOrElse(
            SmiState(Vector.empty, Vector.empty, Vector.empty, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[SmiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val hl = (st.hl :+ ((b.high, b.low))).takeRight(span)
            val hh = hl.map(_._1).max
            val ll = hl.map(_._2).min
            val m = graft.operators.Micro.jvm6(b.close - (hh + ll) / 2)
            val hr = graft.operators.Micro.jvm6((hh - ll) / 2)
            val ms = (st.ms :+ m).takeRight(k1)
            val hrs = (st.hrs :+ hr).takeRight(k1)
            val m1 = ewOfRing(ms, w1)
            val h1 = ewOfRing(hrs, w1)
            val m1s = (st.m1s :+ m1).takeRight(k2)
            val h1s = (st.h1s :+ h1).takeRight(k2)
            val m2 = ewOfRing(m1s, w2)
            val h2 = ewOfRing(h1s, w2)
            val smi =
              if (h2 == 0.0) None
              else Some(graft.operators.Micro.jvm6(100.0 * m2 / h2))
            out += SmiPoint(assetId, b.date, m, smi)
            st = SmiState(hl, ms, hrs, m1s, h1s)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class PgoState(pc: Double, seen: Boolean,
                      closes: Vector[Double], trs: Vector[Double])
  case class PgoPoint(asset_id: Long, date: java.sql.Date, close: Double,
                      sma: Double, ematr: Double, pgo: Option[Double])

  /** D93 `pgoStream` — streaming face of B213 `pgo`: previous close +
    * rings of the last `span` closes and ROUNDED true ranges; the SMA
    * is the plain ordered sum over the close ring, the ATR leg the
    * normalized EW Horner fold, zero smoothed range NULLs. The
    * first-ever bar uses plain range as its TR (the batch choppiness
    * convention) and EMITS like the batch op. O(#assets · span) state.
    */
  def pgoStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[PgoPoint] = {
    val w = 1.0 - 2.0 / (span + 1.0)
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PgoState, PgoPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[PgoState]) =>
          var st = state.getOption.getOrElse(
            PgoState(0.0, seen = false, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[PgoPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tr = graft.operators.Micro.jvm6(
              if (!st.seen) b.high - b.low
              else math.max(b.high - b.low,
                math.max(math.abs(b.high - st.pc), math.abs(b.low - st.pc))))
            val closes = (st.closes :+ b.close).takeRight(span)
            val trs = (st.trs :+ tr).takeRight(span)
            var s = 0.0
            closes.foreach(s += _)
            val sma = graft.operators.Micro.jvm6(s / closes.size.toDouble)
            val ematr = ewOfRing(trs, w)
            val pgo =
              if (ematr == 0.0) None
              else Some(graft.operators.Micro.jvm6((b.close - sma) / ematr))
            out += PgoPoint(assetId, b.date, b.close, sma, ematr, pgo)
            st = PgoState(b.close, seen = true, closes, trs)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class VolRingState(ring: Vector[Double])
  case class ParkinsonPoint(asset_id: Long, date: java.sql.Date, x: Double, pv: Double)

  /** D95 `parkinsonStream` — streaming face of B64 `parkinson_vol`:
    * ring of the last `window` u6 squared log-ranges per asset;
    * bars failing the batch `low > 0` filter are skipped entirely
    * (absent from frames, exactly as the batch pre-window filter).
    * O(#assets · window) state.
    */
  def parkinsonStream(bars: Dataset[OhlcStreamBar], window: Int = 20): Dataset[ParkinsonPoint] = {
    val fourLn2 = 2.772588722239781
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VolRingState, ParkinsonPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[VolRingState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[ParkinsonPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (b.low > 0) {
              val l = math.log(b.high / b.low)
              val x = graft.operators.Micro.jvm6(l * l)
              ring = (ring :+ x).takeRight(window)
              var s = 0.0
              ring.foreach(s += _)
              out += ParkinsonPoint(assetId, b.date, x,
                graft.operators.Micro.jvm6(math.sqrt(s / (fourLn2 * ring.size.toDouble))))
            }
          }
          state.update(VolRingState(ring))
          out.result().iterator
      }
  }

  case class GkPoint(asset_id: Long, date: java.sql.Date, x: Double, gk: Double)

  /** D96 `garmanKlassStream` — streaming face of B82 `garman_klass`:
    * ring of the last `window` u6 per-bar GK terms (0.5·ln²(h/l) −
    * (2ln2−1)·ln²(c/o), each leg rounded like the batch columns);
    * bars failing `low > 0 ∧ open > 0` are skipped. The frame sum is
    * clamped at 0 before the root, ≡ the batch greatest.
    */
  def garmanKlassStream(bars: Dataset[OhlcStreamBar], window: Int = 20): Dataset[GkPoint] = {
    val twoLn2m1 = 0.3862943611198906
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VolRingState, GkPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[VolRingState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[GkPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (b.low > 0 && b.open > 0) {
              val lhl = math.log(b.high / b.low)
              val lco = math.log(b.close / b.open)
              val a = graft.operators.Micro.jvm6(lhl * lhl)
              val c = graft.operators.Micro.jvm6(lco * lco)
              val x = graft.operators.Micro.jvm6(0.5 * a - twoLn2m1 * c)
              ring = (ring :+ x).takeRight(window)
              var s = 0.0
              ring.foreach(s += _)
              out += GkPoint(assetId, b.date, x,
                graft.operators.Micro.jvm6(
                  math.sqrt(math.max(s, 0.0) / ring.size.toDouble)))
            }
          }
          state.update(VolRingState(ring))
          out.result().iterator
      }
  }

  case class RsPoint(asset_id: Long, date: java.sql.Date, x: Double, rs_vol: Double)

  /** D97 `rogersSatchellStream` — streaming face of B104
    * `rogers_satchell`: ring of the last `window` u6 per-bar RS terms
    * (drift-free: ln(h/c)·ln(h/o) + ln(l/c)·ln(l/o)); mean clamped at
    * 0 before the root. Bars with `low ≤ 0` skipped.
    */
  def rogersSatchellStream(bars: Dataset[OhlcStreamBar], window: Int = 20): Dataset[RsPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VolRingState, RsPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[VolRingState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[RsPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (b.low > 0) {
              val x = graft.operators.Micro.jvm6(
                math.log(b.high / b.close) * math.log(b.high / b.open) +
                  math.log(b.low / b.close) * math.log(b.low / b.open))
              ring = (ring :+ x).takeRight(window)
              var s = 0.0
              ring.foreach(s += _)
              out += RsPoint(assetId, b.date, x,
                graft.operators.Micro.jvm6(
                  math.sqrt(math.max(s / ring.size.toDouble, 0.0))))
            }
          }
          state.update(VolRingState(ring))
          out.result().iterator
      }
  }

  case class DfhPoint(asset_id: Long, date: java.sql.Date, value: Double,
                      trailing_high: Double, dist: Option[Double], days_since: Long)

  /** D98 `distFromHighStream` — streaming face of B169
    * `dist_from_high`: ring of the last `window` LWW daily closes;
    * the trailing high is the ring max and `days_since` counts back to
    * its NEWEST occurrence (the batch reverse+array_position
    * convention). O(#assets · window) state.
    */
  def distFromHighStream(ticks: Dataset[DailyTick], window: Int = 252): Dataset[DfhPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VolRingState, DfhPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[VolRingState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[DfhPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ t.value).takeRight(window)
            val hi = ring.max
            var idx = ring.size - 1
            while (ring(idx) != hi) idx -= 1
            val dist =
              if (hi == 0.0) None
              else Some(graft.operators.Micro.jvm6(t.value / hi - 1))
            out += DfhPoint(assetId, t.date, t.value, hi, dist,
              (ring.size - 1 - idx).toLong)
          }
          state.update(VolRingState(ring))
          out.result().iterator
      }
  }

  case class RvolState(vols: Vector[Long])
  case class RvolPoint(asset_id: Long, date: java.sql.Date, n_ticks: Long,
                       avg_vol: Option[Double], rvol: Option[Double])

  /** D99 `relativeVolumeStream` — streaming face of B150
    * `relative_volume`: ring of the last `span` PRIOR tick counts
    * (the batch −span..−1 frame — the current bar joins the ring only
    * after emitting); integer sum, first bar NULLs. O(#assets · span).
    */
  def relativeVolumeStream(bars: Dataset[OhlcStreamBar], span: Int = 20): Dataset[RvolPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RvolState, RvolPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[RvolState]) =>
          var vols = state.getOption.map(_.vols).getOrElse(Vector.empty)
          val out = Vector.newBuilder[RvolPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val avg =
              if (vols.isEmpty) None
              else {
                var s = 0L
                vols.foreach(s += _)
                Some(graft.operators.Micro.jvm6(s.toDouble / vols.size.toDouble))
              }
            val rvol = avg.flatMap { a =>
              if (a == 0.0) None
              else Some(graft.operators.Micro.jvm6(b.n_ticks.toDouble / a))
            }
            out += RvolPoint(assetId, b.date, b.n_ticks, avg, rvol)
            vols = (vols :+ b.n_ticks).takeRight(span)
          }
          state.update(RvolState(vols))
          out.result().iterator
      }
  }

  case class TiState(closes: Vector[Double], above: Vector[Long])
  case class TiPoint(asset_id: Long, date: java.sql.Date, close: Double,
                     sma: Double, n_above: Long, n_bars: Long, ti_pm: Long)

  /** D100 `trendIntensityStream` — streaming face of B155
    * `trend_intensity`: close ring for the SMA + flag ring for the
    * above-count, both `span`-bounded; the per-mille is exact integer
    * division. O(#assets · span) state.
    */
  def trendIntensityStream(bars: Dataset[OhlcStreamBar], span: Int = 20): Dataset[TiPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[TiState, TiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[TiState]) =>
          var st = state.getOption.getOrElse(TiState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[TiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val closes = (st.closes :+ b.close).takeRight(span)
            var s = 0.0
            closes.foreach(s += _)
            val sma = graft.operators.Micro.jvm6(s / closes.size.toDouble)
            val flag = if (b.close > sma) 1L else 0L
            val above = (st.above :+ flag).takeRight(span)
            var na = 0L
            above.foreach(na += _)
            out += TiPoint(assetId, b.date, b.close, sma, na, above.size.toLong,
              1000L * na / above.size.toLong)
            st = TiState(closes, above)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class AccelState(closes: Vector[Double], prevSma: Option[Double],
                        prevMom: Option[Double])
  case class AccelPoint(asset_id: Long, date: java.sql.Date, sma: Double,
                        mom: Option[Double], accel: Option[Double])

  /** D101 `accelerationStream` — streaming face of B166
    * `acceleration`: `span`-ring of closes + the previous SMA and
    * momentum — velocity and acceleration of the smoothed price as
    * first/second differences, head NULLs ≡ the batch lags.
    * O(#assets · span) state.
    */
  def accelerationStream(bars: Dataset[OhlcStreamBar], span: Int = 5): Dataset[AccelPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AccelState, AccelPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[AccelState]) =>
          var st = state.getOption.getOrElse(AccelState(Vector.empty, None, None))
          val out = Vector.newBuilder[AccelPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val closes = (st.closes :+ b.close).takeRight(span)
            var s = 0.0
            closes.foreach(s += _)
            val sma = graft.operators.Micro.jvm6(s / closes.size.toDouble)
            val mom = st.prevSma.map(p => graft.operators.Micro.jvm6(sma - p))
            val accel = for (m <- mom; pm <- st.prevMom)
              yield graft.operators.Micro.jvm6(m - pm)
            out += AccelPoint(assetId, b.date, sma, mom, accel)
            st = AccelState(closes, Some(sma), mom)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class VratState(last: Double, seen: Boolean, rets: Vector[Double])
  case class VratPoint(asset_id: Long, date: java.sql.Date,
                       sd_short: Option[Double], sd_long: Option[Double],
                       vr: Option[Double])

  /** D102 `volatilityRatioStream` — streaming face of B165
    * `volatility_ratio`: previous value + ring of the last `long` u6
    * returns; both sample SDs read the ring's tail with the batch
    * (n·Σx² − (Σx)²)/(n(n−1)) clamp, the ratio NULLs until the long
    * frame is FULL. Zero prior closes emit nothing and carry state,
    * ≡ the batch ret-null filter. O(#assets · long) state.
    */
  def volatilityRatioStream(ticks: Dataset[DailyTick], short: Int = 5,
                            long: Int = 20): Dataset[VratPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    def sd(a: Vector[Double]): Option[Double] = {
      val n = a.size.toDouble
      if (a.size < 2) None
      else {
        var s = 0.0; var s2 = 0.0
        a.foreach { x => s += x }
        a.foreach { x => s2 += x * x }
        Some(graft.operators.Micro.jvm6(math.sqrt(
          math.max((n * s2 - s * s) / (n * (n - 1)), 0.0))))
      }
    }
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VratState, VratPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[VratState]) =>
          var st = state.getOption.getOrElse(VratState(0.0, seen = false, Vector.empty))
          val out = Vector.newBuilder[VratPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val ret = graft.operators.Micro.jvm6(t.value / st.last - 1)
              val rets = (st.rets :+ ret).takeRight(long)
              val sdS = sd(rets.takeRight(short))
              val sdL = sd(rets)
              val vr =
                if (rets.size < long) None
                else for (a <- sdS; b <- sdL; if b != 0.0)
                  yield graft.operators.Micro.jvm6(a / b)
              out += VratPoint(assetId, t.date, sdS, sdL, vr)
              st = VratState(t.value, seen = true, rets)
            } else {
              st = VratState(t.value, seen = true, st.rets)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class MedPoint(asset_id: Long, date: java.sql.Date, med: Double)

  /** D103 `rollingMedianStream` — streaming face of B37
    * `rolling_median`: ring of the last `window` LWW daily closes,
    * sorted per emit; odd frames take the middle element, even frames
    * the mean of the two middles (≡ the batch element_at arithmetic).
    * O(#assets · window) state.
    */
  def rollingMedianStream(ticks: Dataset[DailyTick], window: Int = 20): Dataset[MedPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VolRingState, MedPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[VolRingState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[MedPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ t.value).takeRight(window)
            val fa = ring.sorted
            val n = fa.size
            val med =
              if (n % 2 == 1) fa((n + 1) / 2 - 1)
              else (fa(n / 2 - 1) + fa(n / 2)) / 2.0
            out += MedPoint(assetId, t.date, graft.operators.Micro.jvm6(med))
          }
          state.update(VolRingState(ring))
          out.result().iterator
      }
  }

  case class MomState(last: Double, seen: Boolean, rets: Vector[Double])
  case class MomPoint(asset_id: Long, date: java.sql.Date, ret: Double,
                      skew: Option[Double], ex_kurt: Option[Double])

  /** D104 `rollingMomentsStream` — streaming face of B168
    * `rolling_moments`: previous value + 20-ring of u6 returns; the
    * central-moment sums fold (x−m)ᵖ with the power built by repeated
    * multiply exactly like the batch transform, the rounded mean
    * subtracted per element. Degenerate frames (n<4 or zero variance)
    * NULL. O(#assets · window) state.
    */
  def rollingMomentsStream(ticks: Dataset[DailyTick], window: Int = 20): Dataset[MomPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[MomState, MomPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[MomState]) =>
          var st = state.getOption.getOrElse(MomState(0.0, seen = false, Vector.empty))
          val out = Vector.newBuilder[MomPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val ret = graft.operators.Micro.jvm6(t.value / st.last - 1)
              val rets = (st.rets :+ ret).takeRight(window)
              val n = rets.size.toDouble
              var s = 0.0
              rets.foreach(s += _)
              val m = graft.operators.Micro.jvm6(s / n)
              def dev(p: Int): Double = {
                var acc = 0.0
                rets.foreach { x =>
                  val d = x - m
                  var term = d
                  var i = 1
                  while (i < p) { term *= d; i += 1 }
                  acc += term
                }
                acc
              }
              val s2 = dev(2); val s3 = dev(3); val s4 = dev(4)
              val skew =
                if (n < 4 || s2 == 0.0) None
                else Some(graft.operators.Micro.jvm6(
                  math.sqrt(n) * s3 / math.sqrt(s2 * s2 * s2)))
              val kurt =
                if (n < 4 || s2 == 0.0) None
                else Some(graft.operators.Micro.jvm6(n * s4 / (s2 * s2) - 3))
              out += MomPoint(assetId, t.date, ret, skew, kurt)
              st = MomState(t.value, seen = true, rets)
            } else {
              st = MomState(t.value, seen = true, st.rets)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class PpoState(closes: Vector[Double], ppos: Vector[Option[Double]])
  case class PpoPoint(asset_id: Long, date: java.sql.Date, e_fast: Double,
                      e_slow: Double, ppo: Option[Double], signal: Double)

  /** D105 `ppoStream` — streaming face of B149 `ppo`: 26-ring of
    * closes (the fast EW reads its 12-tail) + 9-ring of ROUNDED PPO
    * values for the signal line; NULL PPOs occupy ring slots but drop
    * out of the signal fold (≡ collect_list's null-skipping over the
    * row frame). O(#assets · slow) state.
    */
  def ppoStream(bars: Dataset[OhlcStreamBar], fast: Int = 12, slow: Int = 26,
                sig: Int = 9): Dataset[PpoPoint] = {
    val wf = 1.0 - 2.0 / (fast + 1.0)
    val ws = 1.0 - 2.0 / (slow + 1.0)
    val wg = 1.0 - 2.0 / (sig + 1.0)
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PpoState, PpoPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[PpoState]) =>
          var st = state.getOption.getOrElse(PpoState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[PpoPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val closes = (st.closes :+ b.close).takeRight(slow)
            val eFast = ewOfRing(closes.takeRight(fast), wf)
            val eSlow = ewOfRing(closes, ws)
            val ppo =
              if (eSlow == 0.0) None
              else Some(graft.operators.Micro.jvm6(100.0 * (eFast - eSlow) / eSlow))
            val ppos = (st.ppos :+ ppo).takeRight(sig)
            val signal = ewOfRing(ppos.flatten, wg)
            out += PpoPoint(assetId, b.date, eFast, eSlow, ppo, signal)
            st = PpoState(closes, ppos)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class ElderImpState(closes: Vector[Double], macds: Vector[Double],
                           prevEma: Option[Double], prevHist: Option[Double])
  case class ElderImpPoint(asset_id: Long, date: java.sql.Date,
                           d_ema: Option[Double], d_hist: Option[Double],
                           impulse: Option[String])

  /** D106 `elderImpulseStream` — streaming face of B120
    * `elder_impulse`: 26-ring of closes feeding the 13-EMA and the
    * MACD legs + 9-ring of ROUNDED MACDs for the signal, plus the
    * previous EMA and histogram for the impulse color; head NULLs and
    * the green/red/blue 3-way ≡ the batch columns.
    * O(#assets · slow) state.
    */
  def elderImpulseStream(bars: Dataset[OhlcStreamBar], emaSpan: Int = 13,
                         fast: Int = 12, slow: Int = 26,
                         signal: Int = 9): Dataset[ElderImpPoint] = {
    val we = 1.0 - 2.0 / (emaSpan + 1.0)
    val wf = 1.0 - 2.0 / (fast + 1.0)
    val ws = 1.0 - 2.0 / (slow + 1.0)
    val wg = 1.0 - 2.0 / (signal + 1.0)
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ElderImpState, ElderImpPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[ElderImpState]) =>
          var st = state.getOption.getOrElse(
            ElderImpState(Vector.empty, Vector.empty, None, None))
          val out = Vector.newBuilder[ElderImpPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val closes = (st.closes :+ b.close).takeRight(slow)
            val ema = ewOfRing(closes.takeRight(emaSpan), we)
            val macd = graft.operators.Micro.jvm6(
              ewOfRing(closes.takeRight(fast), wf) - ewOfRing(closes, ws))
            val macds = (st.macds :+ macd).takeRight(signal)
            val sg = ewOfRing(macds, wg)
            val hist = graft.operators.Micro.jvm6(macd - sg)
            val dEma = st.prevEma.map(p => graft.operators.Micro.jvm6(ema - p))
            val dHist = st.prevHist.map(p => graft.operators.Micro.jvm6(hist - p))
            val impulse = for (de <- dEma; dh <- dHist) yield
              if (de > 0 && dh > 0) "green"
              else if (de < 0 && dh < 0) "red"
              else "blue"
            out += ElderImpPoint(assetId, b.date, dEma, dHist, impulse)
            st = ElderImpState(closes, macds, Some(ema), Some(hist))
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class RetMktTick(asset_id: Long, date: java.sql.Date, ret: Double,
                        mkt_ret: Double)
  case class RbState(ring: Vector[(Double, Double)])
  case class RbPoint(asset_id: Long, date: java.sql.Date, ret: Double,
                     mkt_ret: Double, beta: Option[Double])

  /** D107 `rollingBetaStream` — streaming face of B36 `rolling_beta`
    * over the joined RETURN-TAPE feed shape (per-date asset return +
    * equal-weight market return — what a risk vendor's tape carries):
    * ring of the last `window` (ret, mkt) pairs per asset; co-moment
    * folds ≡ the batch frame arrays (per-element products before the
    * sum), zero-variance frames NULL, 1-row frames silent.
    * O(#assets · window) state.
    */
  def rollingBetaStream(ticks: Dataset[RetMktTick], window: Int = 20): Dataset[RbPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RbState, RbPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[RetMktTick], state: GroupState[RbState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[RbPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ ((t.ret, t.mkt_ret))).takeRight(window)
            if (ring.size >= 2) {
              val n = ring.size.toDouble
              var sa = 0.0; var sm = 0.0; var sp = 0.0; var sm2 = 0.0
              ring.foreach { case (a, _) => sa += a }
              ring.foreach { case (_, m) => sm += m }
              ring.foreach { case (a, m) => sp += a * m }
              ring.foreach { case (_, m) => sm2 += m * m }
              val den = n * sm2 - sm * sm
              val beta =
                if (den == 0.0) None
                else Some(graft.operators.Micro.jvm6((n * sp - sa * sm) / den))
              out += RbPoint(assetId, t.date, t.ret, t.mkt_ret, beta)
            }
          }
          state.update(RbState(ring))
          out.result().iterator
      }
  }

  case class AsiState(op: Double, cp: Double, seen: Boolean, accMicro: Long)
  case class AsiPoint(asset_id: Long, date: java.sql.Date, si: Double, asi: Double)

  /** D108 `asiStream` — streaming face of B219 `asi`: previous bar's
    * open/close + ONE micro-long accumulator per asset (the
    * [[williamsAdStream]] O(1) shape); Wilder's case-based R, the
    * identity K/T factor and the R=0 → SI=0 rule replayed per bar,
    * first-ever bar silent.
    */
  def asiStream(bars: Dataset[OhlcStreamBar]): Dataset[AsiPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AsiState, AsiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[AsiState]) =>
          var st = state.getOption.getOrElse(AsiState(0.0, 0.0, seen = false, 0L))
          val out = Vector.newBuilder[AsiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val r1 = math.abs(b.high - st.cp)
              val r2 = math.abs(b.low - st.cp)
              val r3 = b.high - b.low
              val r4 = math.abs(st.cp - st.op)
              val r =
                if (r1 >= r2 && r1 >= r3) r1 - 0.5 * r2 + 0.25 * r4
                else if (r2 >= r1 && r2 >= r3) r2 - 0.5 * r1 + 0.25 * r4
                else r3 + 0.25 * r4
              val m = (b.close - st.cp) + 0.5 * (b.close - b.open) +
                0.25 * (st.cp - st.op)
              val si =
                if (r == 0.0) 0.0
                else graft.operators.Micro.jvm6(50.0 * m / r)
              val acc = st.accMicro + math.round(si * 1e6)
              out += AsiPoint(assetId, b.date, si, acc.toDouble / 1e6)
              st = AsiState(b.open, b.close, seen = true, acc)
            } else {
              st = AsiState(b.open, b.close, seen = true, st.accMicro)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class FibPoint(asset_id: Long, date: java.sql.Date, value: Double,
                      ch_high: Double, ch_low: Double, f236: Double,
                      f382: Double, f500: Double, f618: Double)

  /** D109 `fibLevelsStream` — streaming face of B220 `fib_levels`:
    * ring of the last `window` LWW daily closes; channel extremes are
    * ring max/min, each level one jvm6 multiply-subtract.
    * O(#assets · window) state.
    */
  def fibLevelsStream(ticks: Dataset[DailyTick], window: Int = 20): Dataset[FibPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VolRingState, FibPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[VolRingState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[FibPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ t.value).takeRight(window)
            val hh = ring.max
            val ll = ring.min
            val rng = hh - ll
            out += FibPoint(assetId, t.date, t.value, hh, ll,
              graft.operators.Micro.jvm6(hh - 0.236 * rng),
              graft.operators.Micro.jvm6(hh - 0.382 * rng),
              graft.operators.Micro.jvm6(hh - 0.5 * rng),
              graft.operators.Micro.jvm6(hh - 0.618 * rng))
          }
          state.update(VolRingState(ring))
          out.result().iterator
      }
  }

  // ── wave AA: O(1)-state running-aggregate twins (update mode) ─────
  // Each keeps only the previous close + a handful of running sums per
  // asset and emits the CURRENT whole-history statistic once per key
  // per micro-batch; the replay wrapper reduces the update-mode sink
  // to the final (max-n) emission, which equals the batch aggregate
  // bit-for-bit because the running sums accumulate in exactly the
  // batch fold's date order. This is the 100 TB shape for the
  // full-history stat family: state per key is CONSTANT, not O(days).

  case class RunStatState(last: Double, seen: Boolean, n: Long,
                          s: Double, s2: Double, d2: Double)
  case class SharpeUpd(asset_id: Long, n_days: Long, mean_ret: Double,
                       sharpe: Option[Double])

  /** D110 `sharpeStream` — streaming face of B31 `sharpe`: running
    * (n, Σr, Σr²) per asset, O(1) state; emits from n ≥ 2 (the batch
    * filter). */
  def sharpeStream(ticks: Dataset[DailyTick]): Dataset[SharpeUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RunStatState, SharpeUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RunStatState]) =>
          var st = state.getOption.getOrElse(RunStatState(0.0, seen = false, 0L, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              st = RunStatState(t.value, seen = true, st.n + 1,
                st.s + r, st.s2 + r * r, st.d2)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n >= 2) {
            val n = st.n.toDouble
            val sd = math.sqrt(math.max((n * st.s2 - st.s * st.s) / (n * (n - 1)), 0.0))
            Iterator.single(SharpeUpd(assetId, st.n,
              graft.operators.Micro.jvm6(st.s / n),
              if (sd == 0.0) None
              else Some(graft.operators.Micro.jvm6((st.s / n) / sd))))
          } else Iterator.empty
      }
  }

  case class SortinoUpd(asset_id: Long, n_days: Long, mean_ret: Double,
                        downside_dev: Double, sortino: Option[Double])

  /** D111 `sortinoStream` — streaming face of B71 `sortino`: running
    * (n, Σr, Σ min(r,0)²), O(1) state. */
  def sortinoStream(ticks: Dataset[DailyTick]): Dataset[SortinoUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RunStatState, SortinoUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RunStatState]) =>
          var st = state.getOption.getOrElse(RunStatState(0.0, seen = false, 0L, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              val x = math.min(r, 0.0)
              st = RunStatState(t.value, seen = true, st.n + 1,
                st.s + r, st.s2, st.d2 + x * x)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n >= 2) {
            val n = st.n.toDouble
            val dd = math.sqrt(st.d2 / n)
            Iterator.single(SortinoUpd(assetId, st.n,
              graft.operators.Micro.jvm6(st.s / n),
              graft.operators.Micro.jvm6(dd),
              if (dd == 0.0) None
              else Some(graft.operators.Micro.jvm6((st.s / n) / dd))))
          } else Iterator.empty
      }
  }

  case class GlState(last: Double, seen: Boolean, nW: Long, nL: Long,
                     sG: Double, sL: Double)
  case class GlUpd(asset_id: Long, n_wins: Long, n_losses: Long, win_pm: Long,
                   avg_gain: Option[Double], avg_loss: Option[Double],
                   gl_ratio: Option[Double])

  /** D112 `gainLossStream` — streaming face of B131 `gain_loss_ratio`:
    * running win/loss counts + signed sums over the positive/negative
    * return subsequences (arrival order = the batch filtered-fold
    * order), O(1) state. */
  def gainLossStream(ticks: Dataset[DailyTick]): Dataset[GlUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[GlState, GlUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[GlState]) =>
          var st = state.getOption.getOrElse(GlState(0.0, seen = false, 0L, 0L, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              if (r > 0) st = st.copy(last = t.value, nW = st.nW + 1, sG = st.sG + r)
              else if (r < 0) st = st.copy(last = t.value, nL = st.nL + 1, sL = st.sL + r)
              else st = st.copy(last = t.value)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.nW + st.nL >= 1) {
            val avgG = if (st.nW == 0) None else Some(st.sG / st.nW.toDouble)
            val avgL = if (st.nL == 0) None else Some(-st.sL / st.nL.toDouble)
            val gl = for (g <- avgG; l <- avgL; if l != 0.0)
              yield graft.operators.Micro.jvm6(g / l)
            Iterator.single(GlUpd(assetId, st.nW, st.nL,
              1000L * st.nW / (st.nW + st.nL),
              avgG.map(graft.operators.Micro.jvm6),
              avgL.map(graft.operators.Micro.jvm6), gl))
          } else Iterator.empty
      }
  }

  case class OmegaState(last: Double, seen: Boolean, n: Long,
                        gains: Long, losses: Long)
  case class OmegaUpd(asset_id: Long, n_days: Long, gains_micro: Long,
                      losses_micro: Long, omega_micro: Option[Long])

  /** D113 `omegaStream` — streaming face of B84 `omega_ratio`: running
    * INTEGER micro gain/loss sums (order-free exact), O(1) state. */
  def omegaStream(ticks: Dataset[DailyTick]): Dataset[OmegaUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[OmegaState, OmegaUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[OmegaState]) =>
          var st = state.getOption.getOrElse(OmegaState(0.0, seen = false, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val rm = math.round(
                graft.operators.Micro.jvm6(t.value / st.last - 1) * 1e6)
              st = OmegaState(t.value, seen = true, st.n + 1,
                st.gains + (if (rm > 0) rm else 0L),
                st.losses + (if (rm < 0) -rm else 0L))
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n >= 1) {
            val omega =
              if (st.losses > 0)
                Some((2L * 1000000L * st.gains + st.losses) / (2L * st.losses))
              else None
            Iterator.single(OmegaUpd(assetId, st.n, st.gains, st.losses, omega))
          } else Iterator.empty
      }
  }

  case class KellyUpd(asset_id: Long, n_days: Long, mean_ret: Double,
                      variance: Double, kelly: Option[Double])

  /** D114 `kellyStream` — streaming face of B101 `kelly_fraction`:
    * running (n, Σr, Σr²), O(1) state; sample variance and the
    * mean/variance ratio from the same sums as the batch folds. */
  def kellyStream(ticks: Dataset[DailyTick]): Dataset[KellyUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RunStatState, KellyUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RunStatState]) =>
          var st = state.getOption.getOrElse(RunStatState(0.0, seen = false, 0L, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              st = RunStatState(t.value, seen = true, st.n + 1,
                st.s + r, st.s2 + r * r, 0.0)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n >= 2) {
            val n = st.n.toDouble
            val variance = (n * st.s2 - st.s * st.s) / (n * (n - 1))
            Iterator.single(KellyUpd(assetId, st.n,
              graft.operators.Micro.jvm6(st.s / n),
              graft.operators.Micro.jvm6(variance),
              if (variance <= 0.0) None
              else Some(graft.operators.Micro.jvm6((st.s / n) / variance))))
          } else Iterator.empty
      }
  }

  case class MomRunState(last: Double, seen: Boolean, n: Long,
                         s1: Double, s2: Double, s3: Double, s4: Double)
  case class MomUpd(asset_id: Long, n_days: Long, mean_ret: Double, sd: Double,
                    skew: Option[Double], kurt: Option[Double])

  /** D115 `retMomentsStream` — streaming face of B44 `ret_moments`:
    * running raw-moment sums Σr..Σr⁴ (the batch fold order), central
    * moments by the same algebra at emit, O(1) state; emits from
    * n ≥ 4. */
  def retMomentsStream(ticks: Dataset[DailyTick]): Dataset[MomUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[MomRunState, MomUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[MomRunState]) =>
          var st = state.getOption.getOrElse(
            MomRunState(0.0, seen = false, 0L, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              st = MomRunState(t.value, seen = true, st.n + 1,
                st.s1 + r, st.s2 + r * r, st.s3 + r * r * r, st.s4 + r * r * r * r)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n >= 4) {
            val n = st.n.toDouble
            val m = st.s1 / n
            val m2 = st.s2 / n - m * m
            val m3 = st.s3 / n - 3.0 * m * (st.s2 / n) + 2.0 * m * m * m
            val m4 = st.s4 / n - 4.0 * m * (st.s3 / n) +
              6.0 * m * m * (st.s2 / n) - 3.0 * m * m * m * m
            val sd = math.sqrt(math.max(m2 * (n / (n - 1)), 0.0))
            val skew =
              if (m2 <= 0.0) None
              else Some(graft.operators.Micro.jvm6(m3 / (m2 * math.sqrt(m2))))
            val kurt =
              if (m2 <= 0.0) None
              else Some(graft.operators.Micro.jvm6(m4 / (m2 * m2) - 3))
            Iterator.single(MomUpd(assetId, st.n,
              graft.operators.Micro.jvm6(m), graft.operators.Micro.jvm6(sd),
              skew, kurt))
          } else Iterator.empty
      }
  }

  case class WadState(pc: Double, seen: Boolean, accMicro: Long)
  case class WadPoint(asset_id: Long, date: java.sql.Date, contrib: Double,
                      wad: Double)

  /** D94 `williamsAdStream` — streaming face of B214 `williams_ad`:
    * previous close + ONE micro-long accumulator per asset — the
    * running sum lives on the exact integer grid like the batch
    * window, so replay order can never drift it. First-ever bar emits
    * nothing. O(1) state per asset.
    */
  def williamsAdStream(bars: Dataset[OhlcStreamBar]): Dataset[WadPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[WadState, WadPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[WadState]) =>
          var st = state.getOption.getOrElse(WadState(0.0, seen = false, 0L))
          val out = Vector.newBuilder[WadPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val contrib = graft.operators.Micro.jvm6(
                if (b.close > st.pc) b.close - math.min(b.low, st.pc)
                else if (b.close < st.pc) b.close - math.max(b.high, st.pc)
                else 0.0)
              val acc = st.accMicro + math.round(contrib * 1e6)
              out += WadPoint(assetId, b.date, contrib, acc.toDouble / 1e6)
              st = WadState(b.close, seen = true, acc)
            } else {
              st = WadState(b.close, seen = true, st.accMicro)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  // ── wave AC: adaptive-MA and pattern-detector twins ────────────────

  case class TrimaState(r1: Vector[Double], r2: Vector[Double])
  case class TrimaPoint(asset_id: Long, date: java.sql.Date, value: Double,
                        sma1: Double, trima: Double)

  /** D116 `trimaStream` — streaming face of B221 `trima`: ring of the
    * last p closes + ring of the last q u6'd stage-1 means, replaying
    * the chained-SMA folds bit-exactly. O(p+q) state per asset.
    */
  def trimaStream(ticks: Dataset[DailyTick], window: Int = 20): Dataset[TrimaPoint] = {
    val p = window / 2 + 1
    val q = (window + 1) / 2
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[TrimaState, TrimaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[TrimaState]) =>
          var st = state.getOption.getOrElse(TrimaState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[TrimaPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val r1 = (st.r1 :+ t.value).takeRight(p)
            val sma1 = graft.operators.Micro.jvm6(
              r1.foldLeft(0.0)(_ + _) / r1.size.toDouble)
            val r2 = (st.r2 :+ sma1).takeRight(q)
            val trima = graft.operators.Micro.jvm6(
              r2.foldLeft(0.0)(_ + _) / r2.size.toDouble)
            st = TrimaState(r1, r2)
            out += TrimaPoint(assetId, t.date, t.value, sma1, trima)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class ZlemaState(raw: Vector[Double], dl: Vector[Double])
  case class ZlemaPoint(asset_id: Long, date: java.sql.Date, value: Double,
                        dl: Double, zlema: Double)

  /** D117 `zlemaStream` — streaming face of B222 `zlema`: ring of the
    * last k+1 raw closes (the de-lag read) + ring of the last `span`
    * u6'd de-lagged values for the horner pair. O(span) state.
    */
  def zlemaStream(ticks: Dataset[DailyTick], span: Int = 20): Dataset[ZlemaPoint] = {
    val w = 0.904762
    val k = (span - 1) / 2
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ZlemaState, ZlemaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[ZlemaState]) =>
          var st = state.getOption.getOrElse(ZlemaState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[ZlemaPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val raw = (st.raw :+ t.value).takeRight(k + 1)
            val old = if (raw.size == k + 1) raw.head else t.value
            val dl = graft.operators.Micro.jvm6(2.0 * t.value - old)
            val ring = (st.dl :+ dl).takeRight(span)
            val zl = graft.operators.Micro.jvm6(
              ring.foldLeft(0.0)((acc, x) => acc * w + x) /
                ring.foldLeft(0.0)((acc, _) => acc * w + 1.0))
            st = ZlemaState(raw, ring)
            out += ZlemaPoint(assetId, t.date, t.value, dl, zl)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class VidyaState(prev: Double, seen: Boolean, diffs: Vector[Double],
                        v: Double, started: Boolean)
  case class VidyaPoint(asset_id: Long, date: java.sql.Date, value: Double,
                        cmo: Double, vidya: Double)

  /** D118 `vidyaStream` — streaming face of B223 `vidya`: previous
    * close + ring of the last n diffs + ONE recursive state value per
    * asset (the kama-form v += sc·(p−v) replayed in arrival order =
    * the batch RecurrenceFold's date order). First-ever tick emits
    * nothing (no diff yet); the first diff row seeds v = close.
    */
  def vidyaStream(ticks: Dataset[DailyTick], n: Int = 9,
                  alpha: Double = 0.2): Dataset[VidyaPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VidyaState, VidyaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[VidyaState]) =>
          var st = state.getOption.getOrElse(
            VidyaState(0.0, seen = false, Vector.empty, 0.0, started = false))
          val out = Vector.newBuilder[VidyaPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen) {
              val d = t.value - st.prev
              val diffs = (st.diffs :+ d).takeRight(n)
              val su = diffs.foldLeft(0.0)((a, x) => a + math.max(x, 0.0))
              val sd = diffs.foldLeft(0.0)((a, x) => a + math.max(-x, 0.0))
              val cmo =
                if (su + sd == 0) 0.0
                else graft.operators.Micro.jvm6(100.0 * (su - sd) / (su + sd))
              val sc = graft.operators.Micro.jvm6(alpha * math.abs(cmo) / 100.0)
              val v =
                if (!st.started) t.value
                else graft.operators.Micro.jvm6(st.v + sc * (t.value - st.v))
              st = VidyaState(t.value, seen = true, diffs, v, started = true)
              out += VidyaPoint(assetId, t.date, t.value, cmo, v)
            } else st = st.copy(prev = t.value, seen = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class McgState(md: Double, poisoned: Boolean, seen: Boolean)
  case class McgPoint(asset_id: Long, date: java.sql.Date, value: Double,
                      mcginley: Option[Double])

  /** D119 `mcginleyStream` — streaming face of B224 `mcginley`: ONE
    * recursive state value per asset (the quartic-chase step replayed
    * in arrival order), O(1) state — the whole-history adaptive line
    * costs the stream nothing. A non-positive close or state poisons
    * the rest of the series (None), mirroring the batch price-domain
    * null contract.
    */
  def mcginleyStream(ticks: Dataset[DailyTick], n: Int = 10,
                     k: Double = 0.6): Dataset[McgPoint] = {
    val kn = k * n
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[McgState, McgPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[McgState]) =>
          var st = state.getOption.getOrElse(McgState(0.0, poisoned = false, seen = false))
          val out = Vector.newBuilder[McgPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (!st.seen) {
              st = McgState(t.value, poisoned = false, seen = true)
              out += McgPoint(assetId, t.date, t.value, Some(t.value))
            } else if (st.poisoned || st.md <= 0.0 || t.value <= 0.0) {
              st = st.copy(poisoned = true)
              out += McgPoint(assetId, t.date, t.value, None)
            } else {
              val r = t.value / st.md
              val md = graft.operators.Micro.jvm6(
                st.md + (t.value - st.md) / (kn * (((r * r) * r) * r)))
              st = McgState(md, poisoned = false, seen = true)
              out += McgPoint(assetId, t.date, t.value, Some(md))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class AlmaPoint(asset_id: Long, date: java.sql.Date, value: Double,
                       alma: Double)

  /** D120 `almaStream` — streaming face of B228 `alma`: ring of the
    * last `window` closes; the u6-rounded Gaussian weights are a pure
    * function of (ring length, position) recomputed per emission —
    * O(window) state, O(window) work per tick.
    */
  def almaStream(ticks: Dataset[DailyTick], window: Int = 9,
                 offset: Double = 0.85, sigma: Double = 6.0): Dataset[AlmaPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[WmaState, AlmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[WmaState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[AlmaPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ t.value).takeRight(window)
            val len = ring.size.toDouble
            val m = offset * (len - 1)
            val s = len / sigma
            val ws = ring.indices.map(i => graft.operators.Micro.jvm6(
              math.exp((i - m) * (i - m) / (-2.0 * s * s))))
            val num = ring.zip(ws).foldLeft(0.0) { case (a, (x, w)) => a + x * w }
            val den = ws.foldLeft(0.0)(_ + _)
            out += AlmaPoint(assetId, t.date, t.value,
              graft.operators.Micro.jvm6(num / den))
          }
          state.update(WmaState(ring))
          out.result().iterator
      }
  }

  case class TdState(last4: Vector[Double], rn: Long, lastNdn: Long, lastNup: Long)
  case class TdPoint(asset_id: Long, date: java.sql.Date, value: Double,
                     buy_count: Long, sell_count: Long,
                     buy_setup: Boolean, sell_setup: Boolean)

  /** D121 `tdSetupStream` — streaming face of B227 `td_setup`: ring of
    * the last 4 closes + the row counter and the last non-qualifying
    * row per direction — O(1) integer state replaying the batch
    * gaps-and-islands exactly (streak = rn − last non-qualifier).
    */
  def tdSetupStream(ticks: Dataset[DailyTick]): Dataset[TdPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[TdState, TdPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[TdState]) =>
          var st = state.getOption.getOrElse(TdState(Vector.empty, 0L, 0L, 0L))
          val out = Vector.newBuilder[TdPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val rn = st.rn + 1
            val c4 = if (st.last4.size == 4) Some(st.last4.head) else None
            val dn = c4.exists(t.value < _)
            val up = c4.exists(t.value > _)
            val lastNdn = if (!dn) rn else st.lastNdn
            val lastNup = if (!up) rn else st.lastNup
            val buy = if (dn) rn - st.lastNdn else 0L
            val sell = if (up) rn - st.lastNup else 0L
            st = TdState((st.last4 :+ t.value).takeRight(4), rn, lastNdn, lastNup)
            out += TdPoint(assetId, t.date, t.value, buy, sell, buy == 9L, sell == 9L)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class CandleState(pOpen: Double, pClose: Double, seen: Boolean,
                         nBars: Long, nDoji: Long, nHammer: Long, nShoot: Long,
                         nBull: Long, nBear: Long)
  case class CandleUpd(asset_id: Long, n_bars: Long, n_doji: Long,
                       n_hammer: Long, n_shooting_star: Long,
                       n_bull_engulf: Long, n_bear_engulf: Long)

  /** D122 `candlePatternsStream` — streaming face of B225
    * `candle_patterns`, UPDATE mode: previous bar + six integer
    * counters per asset — O(1) state for the whole-history census; the
    * replay wrapper keeps the final (max-n_bars) emission, which
    * equals the batch census exactly (integer counts over the same
    * exact-IEEE comparisons, arrival order = date order).
    */
  def candlePatternsStream(bars: Dataset[OhlcStreamBar]): Dataset[CandleUpd] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CandleState, CandleUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[CandleState]) =>
          var st = state.getOption.getOrElse(
            CandleState(0.0, 0.0, seen = false, 0L, 0L, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val body = b.close - b.open
            val absBody = math.abs(body)
            val upper = b.high - math.max(b.open, b.close)
            val lower = math.min(b.open, b.close) - b.low
            val doji = absBody <= 0.1 * (b.high - b.low)
            val hammer = lower >= 2.0 * absBody && upper <= absBody
            val shoot = upper >= 2.0 * absBody && lower <= absBody
            val bull = st.seen && body > 0 && st.pClose < st.pOpen &&
              b.open <= st.pClose && b.close >= st.pOpen
            val bear = st.seen && body < 0 && st.pClose > st.pOpen &&
              b.open >= st.pClose && b.close <= st.pOpen
            st = CandleState(b.open, b.close, seen = true,
              st.nBars + 1,
              st.nDoji + (if (doji) 1 else 0),
              st.nHammer + (if (hammer) 1 else 0),
              st.nShoot + (if (shoot) 1 else 0),
              st.nBull + (if (bull) 1 else 0),
              st.nBear + (if (bear) 1 else 0))
          }
          state.update(st)
          if (st.nBars > 0)
            Iterator.single(CandleUpd(assetId, st.nBars, st.nDoji, st.nHammer,
              st.nShoot, st.nBull, st.nBear))
          else Iterator.empty
      }
  }

  /** Feed row for [[fractalsStream]]: `real = false` marks the two
    * per-asset end-of-series sentinels (high/low = NaN, so every
    * comparison against them is false — exactly the batch's
    * missing-neighbor IS-NULL-→-false semantics).
    */
  case class FractalTick(asset_id: Long, date: java.sql.Date, high: Double,
                         low: Double, real: Boolean)
  case class FracState(buf: Vector[(Long, Double, Double, Boolean)])
  case class FracPoint(asset_id: Long, date: java.sql.Date, high: Double,
                       low: Double, fractal_high: Boolean, fractal_low: Boolean)

  /** D123 `fractalsStream` — streaming face of B226 `fractals`: the
    * wing-2 verdict needs TWO FUTURE bars, so the stream holds a
    * 5-slot buffer per asset and emits bar b when b+2 arrives — the
    * honest two-bar confirmation delay the batch op documents. End of
    * series is a real streaming problem (the last two bars' verdicts
    * would dangle forever), solved the production way: the feed
    * carries two per-asset close-of-stream sentinels (NaN extremes —
    * compare-false against anything) that flush the tail verdicts as
    * definitionally-false-forward, matching the batch edge rows.
    * O(5) state per asset.
    */
  def fractalsStream(ticks: Dataset[FractalTick]): Dataset[FracPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[FracState, FracPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[FractalTick], state: GroupState[FracState]) =>
          var buf = state.getOption.map(_.buf).getOrElse(Vector.empty)
          val out = Vector.newBuilder[FracPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            buf = buf :+ ((t.date.getTime, t.high, t.low, t.real))
            val n = buf.size
            if (n >= 3) {
              val (cd, ch, cl, creal) = buf(n - 3)
              if (creal) {
                // missing back-neighbors (series head) are false terms,
                // like the batch lag-IS-NULL; sentinel forward-neighbors
                // are NaN and compare false the same way
                def hi(i: Int) = buf.lift(i).exists(b => ch > b._2)
                def lo(i: Int) = buf.lift(i).exists(b => cl < b._3)
                out += FracPoint(assetId, new java.sql.Date(cd), ch, cl,
                  hi(n - 5) && hi(n - 4) && hi(n - 2) && hi(n - 1),
                  lo(n - 5) && lo(n - 4) && lo(n - 2) && lo(n - 1))
              }
              buf = buf.takeRight(5)
            }
          }
          state.update(FracState(buf))
          out.result().iterator
      }
  }

  // ── wave AE: gate/clock twins ──────────────────────────────────────

  case class RaviState(ring: Vector[Double])
  case class RaviPoint(asset_id: Long, date: java.sql.Date, sf: Double,
                       ss: Double, ravi: Option[Double])

  /** D124 `raviStream` — streaming face of B229 `ravi`: one 65-close
    * ring per asset; the fast mean reads the ring's 7-tail. O(slow)
    * state.
    */
  def raviStream(ticks: Dataset[DailyTick], fast: Int = 7,
                 slow: Int = 65): Dataset[RaviPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RaviState, RaviPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RaviState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[RaviPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ t.value).takeRight(slow)
            def mean(a: Vector[Double]) = graft.operators.Micro.jvm6(
              a.foldLeft(0.0)(_ + _) / a.size.toDouble)
            val sf = mean(ring.takeRight(fast))
            val ss = mean(ring)
            out += RaviPoint(assetId, t.date, sf, ss,
              if (ss == 0.0) None
              else Some(graft.operators.Micro.jvm6(100.0 * math.abs(sf - ss) / ss)))
          }
          state.update(RaviState(ring))
          out.result().iterator
      }
  }

  case class VzoState(pc: Double, seen: Boolean, sv: Vector[Double],
                      v: Vector[Double])
  case class VzoPoint(asset_id: Long, date: java.sql.Date, signed_vol: Long,
                      vzo: Double)

  /** D125 `vzoStream` — streaming face of B230 `vzo`: previous close +
    * paired 14-rings of (signed volume, volume); the horner ratio
    * replays the batch folds over exact integers. First-ever bar emits
    * nothing. O(span) state.
    */
  def vzoStream(bars: Dataset[OhlcStreamBar], span: Int = 14): Dataset[VzoPoint] = {
    val w = (span - 1).toDouble / span
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VzoState, VzoPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[VzoState]) =>
          var st = state.getOption.getOrElse(
            VzoState(0.0, seen = false, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[VzoPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val sv =
                if (b.close > st.pc) b.n_ticks.toDouble
                else if (b.close < st.pc) -b.n_ticks.toDouble
                else 0.0
              val sa = (st.sv :+ sv).takeRight(span)
              val va = (st.v :+ b.n_ticks.toDouble).takeRight(span)
              val num = sa.foldLeft(0.0)((a, x) => a * w + x)
              val den = va.foldLeft(0.0)((a, x) => a * w + x)
              st = VzoState(b.close, seen = true, sa, va)
              out += VzoPoint(assetId, b.date, sv.toLong,
                graft.operators.Micro.jvm6(100.0 * num / den))
            } else st = st.copy(pc = b.close, seen = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class RmiState(raw: Vector[Double], diffs: Vector[Double])
  case class RmiPoint(asset_id: Long, date: java.sql.Date, d: Double,
                      rmi: Double)

  /** D126 `rmiStream` — streaming face of B234 `rmi`: ring of the last
    * m+1 raw closes (the momentum read) + 14-ring of u6 diffs through
    * the rsi horner pair. Emits once the m-day-old close exists.
    */
  def rmiStream(ticks: Dataset[DailyTick], m: Int = 5,
                span: Int = 14): Dataset[RmiPoint] = {
    val w = (span - 1).toDouble / span
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RmiState, RmiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RmiState]) =>
          var st = state.getOption.getOrElse(RmiState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[RmiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val raw = (st.raw :+ t.value).takeRight(m + 1)
            if (raw.size == m + 1) {
              val d = graft.operators.Micro.jvm6(t.value - raw.head)
              val diffs = (st.diffs :+ d).takeRight(span)
              val g = diffs.foldLeft(0.0)((a, x) => a * w + math.max(x, 0.0))
              val l = diffs.foldLeft(0.0)((a, x) => a * w + math.max(-x, 0.0))
              val rmi =
                if (l == 0.0) 100.0
                else math.floor((100.0 - 100.0 / (1.0 + g / l)) * 10000.0 + 0.5) / 10000.0
              st = RmiState(raw, diffs)
              out += RmiPoint(assetId, t.date, d, rmi)
            } else st = st.copy(raw = raw)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class SqueezeState(pc: Double, seen: Boolean,
                          closes: Vector[Double], trs: Vector[Double])
  case class SqueezePoint(asset_id: Long, date: java.sql.Date, sd: Double,
                          tr_mean: Double, squeeze_on: Boolean, mom: Double)

  /** D127 `squeezeStream` — streaming face of B235 `squeeze`: previous
    * close + paired 20-rings of (close, u6 TR); both fold legs and the
    * band comparison replay the batch exactly. Emits from the second
    * bar (variance exists). O(window) state.
    */
  def squeezeStream(bars: Dataset[OhlcStreamBar], window: Int = 20): Dataset[SqueezePoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[SqueezeState, SqueezePoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[SqueezeState]) =>
          var st = state.getOption.getOrElse(
            SqueezeState(0.0, seen = false, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[SqueezePoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tr = graft.operators.Micro.jvm6(
              if (!st.seen) b.high - b.low
              else math.max(b.high - b.low,
                math.max(math.abs(b.high - st.pc), math.abs(b.low - st.pc))))
            val closes = (st.closes :+ b.close).takeRight(window)
            val trs = (st.trs :+ tr).takeRight(window)
            st = SqueezeState(b.close, seen = true, closes, trs)
            if (closes.size >= 2) {
              val n = closes.size.toDouble
              val s = closes.foldLeft(0.0)(_ + _)
              val s2 = closes.foldLeft(0.0)((a, x) => a + x * x)
              val sd = graft.operators.Micro.jvm6(
                math.sqrt(math.max((n * s2 - s * s) / (n * (n - 1)), 0.0)))
              val trMean = graft.operators.Micro.jvm6(
                trs.foldLeft(0.0)(_ + _) / n)
              val mid = graft.operators.Micro.jvm6(s / n)
              out += SqueezePoint(assetId, b.date, sd, trMean,
                2.0 * sd < 1.5 * trMean,
                graft.operators.Micro.jvm6(b.close - mid))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class DwState(last: Double, seen: Boolean, prevRet: Double,
                     hasRet: Boolean, n: Long, num: Double, den: Double)
  case class DwUpd(asset_id: Long, n_rets: Long, dw: Option[Double])

  /** D128 `durbinWatsonStream` — streaming face of B232
    * `durbin_watson`, UPDATE mode: previous close + previous return +
    * two running double sums per asset — O(1) state for the
    * whole-history serial-correlation statistic; arrival order = the
    * batch fold's date order, so the final emission is bit-exact.
    * Emits once n ≥ 3 (the batch gate).
    */
  def durbinWatsonStream(ticks: Dataset[DailyTick]): Dataset[DwUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[DwState, DwUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[DwState]) =>
          var st = state.getOption.getOrElse(
            DwState(0.0, seen = false, 0.0, hasRet = false, 0L, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              val num = if (st.hasRet) {
                val d = r - st.prevRet
                st.num + d * d
              } else st.num
              st = DwState(t.value, seen = true, r, hasRet = true,
                st.n + 1, num, st.den + r * r)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n >= 3)
            Iterator.single(DwUpd(assetId, st.n,
              if (st.den == 0.0) None
              else Some(graft.operators.Micro.jvm6(st.num / st.den))))
          else Iterator.empty
      }
  }

  /** Tick for [[dollarBarsStream]]: `real = false` marks the per-asset
    * close-of-stream sentinel that flushes the final partial bar.
    */
  case class NotionalTick(asset_id: Long, ts: java.sql.Timestamp,
                          value: Double, seq: Long, real: Boolean)
  case class DBarState(cum: Long, rn: Long, barId: Long, open: Boolean,
                       tOpen: java.sql.Timestamp, tClose: java.sql.Timestamp,
                       o: Double, h: Double, l: Double, c: Double,
                       nTicks: Long, notional: Long)
  case class DBarPoint(asset_id: Long, bar_id: Long,
                       t_open: java.sql.Timestamp, t_close: java.sql.Timestamp,
                       open: Double, high: Double, low: Double, close: Double,
                       n_ticks: Long, notional: Double)

  /** D129 `dollarBarsStream` — streaming face of B231 `dollar_bars`:
    * the notional clock kept as ONE micro-long cumulative + the open
    * bar's accumulator per asset (O(1) state); a tick whose PRE-tick
    * cumulative lands in a new bar id closes and emits the old bar —
    * exactly the batch integer-division grouping, which is contiguous
    * because the cumulative is monotone. The final partial bar is
    * flushed by the feed's per-asset close-of-stream sentinel (the
    * [[fractalsStream]] convention).
    */
  def dollarBarsStream(ticks: Dataset[NotionalTick],
                       threshold: Double = 500.0): Dataset[DBarPoint] = {
    val thrMicro = math.round(threshold * 1e6)
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[DBarState, DBarPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[NotionalTick], state: GroupState[DBarState]) =>
          var st = state.getOption.getOrElse(
            DBarState(0L, 0L, 0L, open = false, null, null, 0.0, 0.0, 0.0, 0.0, 0L, 0L))
          val out = Vector.newBuilder[DBarPoint]
          def emit(): Unit = if (st.open) {
            out += DBarPoint(assetId, st.barId, st.tOpen, st.tClose,
              st.o, st.h, st.l, st.c, st.nTicks, st.notional.toDouble / 1e6)
          }
          // full-microsecond arrival order (getTime is millis-lossy;
          // the nanos field carries the sub-milli the batch rn sorts by)
          def micros(ts: java.sql.Timestamp): Long =
            java.lang.Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
          rows.toSeq.sortBy(t => (micros(t.ts), t.seq)).foreach { t =>
            if (!t.real) { emit(); st = st.copy(open = false) }
            else {
              val mv = math.floor(math.abs(t.value) * 1e6 + 0.5).toLong
              val barId = st.cum / thrMicro
              if (st.open && barId != st.barId) { emit(); st = st.copy(open = false) }
              // ordered arrival: the first tick of a bar carries min(ts),
              // the current tick max(ts) — no comparisons needed
              st =
                if (!st.open)
                  DBarState(st.cum + mv, st.rn + 1, barId, open = true,
                    t.ts, t.ts, t.value, t.value, t.value, t.value, 1L, mv)
                else
                  DBarState(st.cum + mv, st.rn + 1, barId, open = true,
                    st.tOpen, t.ts,
                    st.o, math.max(st.h, t.value), math.min(st.l, t.value),
                    t.value, st.nTicks + 1, st.notional + mv)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  // ── wave AG: oscillator/stop/expectancy twins ──────────────────────

  case class CogPoint(asset_id: Long, date: java.sql.Date, value: Double,
                      cog: Option[Double])

  /** D130 `cogStream` — streaming face of B236 `cog`: one 10-close
    * ring; both fold legs replay the batch weights (oldest n … newest
    * 1). O(window) state.
    */
  def cogStream(ticks: Dataset[DailyTick], window: Int = 10): Dataset[CogPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[WmaState, CogPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[WmaState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[CogPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            ring = (ring :+ t.value).takeRight(window)
            val n = ring.size
            val num = ring.zipWithIndex.foldLeft(0.0) { case (a, (v, j)) =>
              a + v * (n - j).toDouble }
            val den = ring.foldLeft(0.0)(_ + _)
            out += CogPoint(assetId, t.date, t.value,
              if (den == 0.0) None
              else Some(graft.operators.Micro.jvm6(-num / den)))
          }
          state.update(WmaState(ring))
          out.result().iterator
      }
  }

  case class CamState(ph: Double, pl: Double, pc: Double, seen: Boolean)
  case class CamPoint(asset_id: Long, date: java.sql.Date, close: Double,
                      r4: Option[Double], r3: Option[Double],
                      s3: Option[Double], s4: Option[Double])

  /** D131 `camarillaStream` — streaming face of B237
    * `camarilla_pivots`: the previous bar IS the state — O(1); the
    * first-ever bar emits all-NULL levels like the batch lag.
    */
  def camarillaStream(bars: Dataset[OhlcStreamBar]): Dataset[CamPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CamState, CamPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[CamState]) =>
          var st = state.getOption.getOrElse(CamState(0.0, 0.0, 0.0, seen = false))
          val out = Vector.newBuilder[CamPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val rng = st.ph - st.pl
              def lvl(sign: Double, f: Double) =
                Some(graft.operators.Micro.jvm6(st.pc + sign * (rng * f)))
              out += CamPoint(assetId, b.date, b.close,
                lvl(1.0, 0.55), lvl(1.0, 0.275), lvl(-1.0, 0.275), lvl(-1.0, 0.55))
            } else out += CamPoint(assetId, b.date, b.close, None, None, None, None)
            st = CamState(b.high, b.low, b.close, seen = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class CksState(pc: Double, seen: Boolean, trs: Vector[Double],
                      highs: Vector[Double], lows: Vector[Double],
                      hs0s: Vector[Double], ls0s: Vector[Double])
  case class CksPoint(asset_id: Long, date: java.sql.Date, atr: Double,
                      stop_long: Double, stop_short: Double)

  /** D132 `chandeKrollStream` — streaming face of B238
    * `chande_kroll_stop`: p-rings of (TR, high, low) + q-rings of the
    * u6 preliminary stops; the ratchet extremes are ring max/min.
    * O(p+q) state.
    */
  def chandeKrollStream(bars: Dataset[OhlcStreamBar], p: Int = 10,
                        x: Double = 1.0, q: Int = 9): Dataset[CksPoint] = {
    val w = (p - 1).toDouble / p
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CksState, CksPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[CksState]) =>
          var st = state.getOption.getOrElse(CksState(0.0, seen = false,
            Vector.empty, Vector.empty, Vector.empty, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[CksPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val tr = graft.operators.Micro.jvm6(
              if (!st.seen) b.high - b.low
              else math.max(b.high - b.low,
                math.max(math.abs(b.high - st.pc), math.abs(b.low - st.pc))))
            val trs = (st.trs :+ tr).takeRight(p)
            val highs = (st.highs :+ b.high).takeRight(p)
            val lows = (st.lows :+ b.low).takeRight(p)
            val atr = graft.operators.Micro.jvm6(
              trs.foldLeft(0.0)((a, v) => a * w + v) /
                trs.foldLeft(0.0)((a, _) => a * w + 1.0))
            val hs0 = graft.operators.Micro.jvm6(highs.max - x * atr)
            val ls0 = graft.operators.Micro.jvm6(lows.min + x * atr)
            val hs0s = (st.hs0s :+ hs0).takeRight(q)
            val ls0s = (st.ls0s :+ ls0).takeRight(q)
            st = CksState(b.close, seen = true, trs, highs, lows, hs0s, ls0s)
            out += CksPoint(assetId, b.date, atr, ls0s.min, hs0s.max)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class IiState(ring: Vector[(Double, Long)])
  case class IiPoint(asset_id: Long, date: java.sql.Date, contrib: Double,
                     ii_pct: Double)

  /** D133 `intradayIntensityStream` — streaming face of B239
    * `intraday_intensity`: 21-ring of (u6 contrib, tick volume) pairs;
    * contrib fold + exact integer volume sum per emission. O(window)
    * state.
    */
  def intradayIntensityStream(bars: Dataset[OhlcStreamBar],
                              window: Int = 21): Dataset[IiPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[IiState, IiPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[IiState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = Vector.newBuilder[IiPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            val contrib = graft.operators.Micro.jvm6(
              if (b.high == b.low) 0.0
              else (2.0 * b.close - b.high - b.low) / (b.high - b.low)
                * b.n_ticks.toDouble)
            ring = (ring :+ ((contrib, b.n_ticks))).takeRight(window)
            var s = 0.0; var v = 0L
            ring.foreach { case (c, n) => s += c; v += n }
            out += IiPoint(assetId, b.date, contrib,
              graft.operators.Micro.jvm6(100.0 * s / v.toDouble))
          }
          state.update(IiState(ring))
          out.result().iterator
      }
  }

  case class ExpState(last: Double, seen: Boolean, n: Long, nw: Long, nl: Long,
                      wsMicro: Long, lsMicro: Long)
  case class ExpUpd(asset_id: Long, n_days: Long, n_wins: Long, n_losses: Long,
                    avg_win: Option[Double], avg_loss: Option[Double],
                    expectancy: Option[Double])

  /** D134 `expectancyStream` — streaming face of B240 `expectancy`,
    * UPDATE mode: previous close + five integer counters/sums per
    * asset (win/loss micro sums ride the exact integer grid — the
    * batch decimal sums are the same integers rescaled). O(1) state;
    * replay keeps the final (max-n) emission.
    */
  def expectancyStream(ticks: Dataset[DailyTick]): Dataset[ExpUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ExpState, ExpUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[ExpState]) =>
          var st = state.getOption.getOrElse(
            ExpState(0.0, seen = false, 0L, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              val rm = math.floor(r * 1e6 + 0.5).toLong
              st = ExpState(t.value, seen = true, st.n + 1,
                st.nw + (if (rm > 0) 1 else 0), st.nl + (if (rm < 0) 1 else 0),
                st.wsMicro + (if (rm > 0) rm else 0L),
                st.lsMicro + (if (rm < 0) -rm else 0L))
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n >= 1) {
            val aw =
              if (st.nw == 0) None
              else Some(graft.operators.Micro.jvm6(
                st.wsMicro.toDouble / 1e6 / st.nw.toDouble))
            val al =
              if (st.nl == 0) None
              else Some(graft.operators.Micro.jvm6(
                st.lsMicro.toDouble / 1e6 / st.nl.toDouble))
            val e = for (w <- aw; l <- al) yield graft.operators.Micro.jvm6(
              st.nw.toDouble / st.n.toDouble * w - st.nl.toDouble / st.n.toDouble * l)
            Iterator.single(ExpUpd(assetId, st.n, st.nw, st.nl, aw, al, e))
          } else Iterator.empty
      }
  }

  // ── wave AI: Ehlers-filter and ARCH twins ──────────────────────────

  case class LagState(l0: Double, l1: Double, l2: Double, l3: Double,
                      seen: Boolean, poisoned: Boolean)
  case class LagPoint(asset_id: Long, date: java.sql.Date, value: Double,
                      lrsi: Option[Double])

  /** D135 `laguerreRsiStream` — streaming face of B242 `laguerre_rsi`:
    * the four Laguerre stages ARE the state (O(1) per asset); each
    * arrival replays the γ = 0.5 cascade step bit-exactly. Seed bar
    * emits NULL (all gaps zero).
    */
  def laguerreRsiStream(ticks: Dataset[DailyTick]): Dataset[LagPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[LagState, LagPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[LagState]) =>
          var st = state.getOption.getOrElse(
            LagState(0.0, 0.0, 0.0, 0.0, seen = false, poisoned = false))
          val out = Vector.newBuilder[LagPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (!st.seen) {
              st = LagState(t.value, t.value, t.value, t.value,
                seen = true, poisoned = false)
              out += LagPoint(assetId, t.date, t.value, None)
            } else if (st.poisoned) {
              out += LagPoint(assetId, t.date, t.value, None)
            } else {
              val l0 = graft.operators.Micro.jvm6(0.5 * t.value + 0.5 * st.l0)
              val l1 = graft.operators.Micro.jvm6(-0.5 * l0 + st.l0 + 0.5 * st.l1)
              val l2 = graft.operators.Micro.jvm6(-0.5 * l1 + st.l1 + 0.5 * st.l2)
              val l3 = graft.operators.Micro.jvm6(-0.5 * l2 + st.l2 + 0.5 * st.l3)
              val cu = math.max(l0 - l1, 0.0) + math.max(l1 - l2, 0.0) +
                math.max(l2 - l3, 0.0)
              val cd = math.max(l1 - l0, 0.0) + math.max(l2 - l1, 0.0) +
                math.max(l3 - l2, 0.0)
              st = LagState(l0, l1, l2, l3, seen = true, poisoned = false)
              out += LagPoint(assetId, t.date, t.value,
                if (cu + cd == 0.0) None
                else Some(graft.operators.Micro.jvm6(cu / (cu + cd))))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class SsState(pc: Double, s1: Double, s2: Double, n: Long)
  case class SsPoint(asset_id: Long, date: java.sql.Date, value: Double,
                     ss: Double)

  /** D136 `superSmootherStream` — streaming face of B243
    * `super_smoother`: previous close + the two previous filter values
    * — O(1) state for the two-pole IIR; coefficients are the same
    * u6-rounded driver constants.
    */
  def superSmootherStream(ticks: Dataset[DailyTick], n: Int = 10): Dataset[SsPoint] = {
    val (c1, c2, c3) = graft.operators.Analytics.superSmootherCoeffs(n)
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[SsState, SsPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[SsState]) =>
          var st = state.getOption.getOrElse(SsState(0.0, 0.0, 0.0, 0L))
          val out = Vector.newBuilder[SsPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val ss =
              if (st.n <= 1) t.value
              else graft.operators.Micro.jvm6(
                c1 * ((t.value + st.pc) / 2.0) + c2 * st.s1 + c3 * st.s2)
            st = SsState(t.value, ss, st.s1, st.n + 1)
            out += SsPoint(assetId, t.date, t.value, ss)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class T3State(raw: Vector[Double], r1: Vector[Double], r2: Vector[Double],
                     r3: Vector[Double], r4: Vector[Double], r5: Vector[Double])
  case class T3Point(asset_id: Long, date: java.sql.Date, value: Double,
                     e3: Double, e6: Double, t3: Double)

  /** D137 `t3Stream` — streaming face of B244 `t3`: six 20-rings, one
    * per EW stage, each fed the previous stage's u6'd output — the
    * chained horner pairs replayed bit-exactly. O(6·span) state.
    */
  def t3Stream(ticks: Dataset[DailyTick], span: Int = 20): Dataset[T3Point] = {
    val w = 0.666667
    val spark = ticks.sparkSession
    import spark.implicits._
    def ew(ring: Vector[Double]): Double = graft.operators.Micro.jvm6(
      ring.foldLeft(0.0)((a, x) => a * w + x) /
        ring.foldLeft(0.0)((a, _) => a * w + 1.0))
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[T3State, T3Point](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[T3State]) =>
          var st = state.getOption.getOrElse(T3State(Vector.empty, Vector.empty,
            Vector.empty, Vector.empty, Vector.empty, Vector.empty))
          val out = Vector.newBuilder[T3Point]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val raw = (st.raw :+ t.value).takeRight(span)
            val e1 = ew(raw)
            val r1 = (st.r1 :+ e1).takeRight(span)
            val e2 = ew(r1)
            val r2 = (st.r2 :+ e2).takeRight(span)
            val e3 = ew(r2)
            val r3 = (st.r3 :+ e3).takeRight(span)
            val e4 = ew(r3)
            val r4 = (st.r4 :+ e4).takeRight(span)
            val e5 = ew(r4)
            val r5 = (st.r5 :+ e5).takeRight(span)
            val e6 = ew(r5)
            st = T3State(raw, r1, r2, r3, r4, r5)
            out += T3Point(assetId, t.date, t.value, e3, e6,
              graft.operators.Micro.jvm6(
                -0.343 * e6 + 2.499 * e5 + -6.069 * e4 + 4.913 * e3))
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class ArchState(last: Double, seen: Boolean, prevX: Double,
                       hasX: Boolean, n: Long, sx: Double, sy: Double,
                       sxy: Double, sx2: Double, sy2: Double)
  case class ArchUpd(asset_id: Long, n_pairs: Long, rho: Option[Double],
                     lm: Option[Double])

  /** D138 `archTestStream` — streaming face of B245 `arch_test`,
    * UPDATE mode: previous close + previous squared return + five
    * running sums — O(1) state; each (x₋₁, x) pair accumulates into
    * the five sums in exactly the batch fold's date order (sx/sx2
    * over the lagged leg, sy/sy2 over the current leg, sxy the dot),
    * so the final emission is bit-exact against the fold arrays.
    */
  def archTestStream(ticks: Dataset[DailyTick]): Dataset[ArchUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ArchState, ArchUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[ArchState]) =>
          var st = state.getOption.getOrElse(ArchState(0.0, seen = false, 0.0,
            hasX = false, 0L, 0.0, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              val x = graft.operators.Micro.jvm6(r * r)
              if (st.hasX)
                st = ArchState(t.value, seen = true, x, hasX = true, st.n + 1,
                  st.sx + st.prevX, st.sy + x, st.sxy + st.prevX * x,
                  st.sx2 + st.prevX * st.prevX, st.sy2 + x * x)
              else
                st = st.copy(last = t.value, prevX = x, hasX = true)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n >= 2) {
            val n = st.n.toDouble
            val den = math.sqrt(math.max(n * st.sx2 - st.sx * st.sx, 0.0)) *
              math.sqrt(math.max(n * st.sy2 - st.sy * st.sy, 0.0))
            val rho =
              if (den == 0.0) None
              else Some(graft.operators.Micro.jvm6(
                (n * st.sxy - st.sx * st.sy) / den))
            Iterator.single(ArchUpd(assetId, st.n, rho,
              rho.map(r => graft.operators.Micro.jvm6(n * r * r))))
          } else Iterator.empty
      }
  }

  // ── wave AK: decycler / zigzag / ADF twins ─────────────────────────

  case class HpState(pc1: Double, pc2: Double, h1: Double, h2: Double, n: Long)
  case class HpPoint(asset_id: Long, date: java.sql.Date, value: Double,
                     hp: Double, decycler: Double)

  /** D139 `decyclerStream` — streaming face of B246 `ehlers_decycler`:
    * two previous closes + two previous high-pass values — O(1) state
    * for the two-pole IIR, same u6 driver coefficients.
    */
  def decyclerStream(ticks: Dataset[DailyTick], n: Int = 20): Dataset[HpPoint] = {
    val (k0, c2, c3) = graft.operators.Analytics.highpassCoeffs(n)
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[HpState, HpPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[HpState]) =>
          var st = state.getOption.getOrElse(HpState(0.0, 0.0, 0.0, 0.0, 0L))
          val out = Vector.newBuilder[HpPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val hp =
              if (st.n <= 1) 0.0
              else graft.operators.Micro.jvm6(
                k0 * ((t.value - 2.0 * st.pc1) + st.pc2) + c2 * st.h1 + c3 * st.h2)
            st = HpState(t.value, st.pc1, hp, st.h1, st.n + 1)
            out += HpPoint(assetId, t.date, t.value, hp,
              graft.operators.Micro.jvm6(t.value - hp))
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class ZzState(dir: Long, hi: Double, lo: Double, seen: Boolean)
  case class ZzPoint(asset_id: Long, date: java.sql.Date, value: Double,
                     dir: Long, ext: Double, pivot: Option[Double],
                     pivot_kind: Long)

  /** D140 `zigzagStream` — streaming face of B247 `zigzag`: the leg
    * direction and running extremes ARE the state (O(1)); pivots
    * confirm exactly when the batch scan confirms them — zigzag is
    * the canonical "repaints in chart tools, honest on a stream"
    * indicator, and this face emits only CONFIRMED pivots.
    */
  def zigzagStream(ticks: Dataset[DailyTick], th: Double = 0.05): Dataset[ZzPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[ZzState, ZzPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[ZzState]) =>
          var st = state.getOption.getOrElse(ZzState(0L, 0.0, 0.0, seen = false))
          val out = Vector.newBuilder[ZzPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val close = t.value
            var pivot: Option[Double] = None
            var kind = 0L
            if (!st.seen) st = ZzState(0L, close, close, seen = true)
            else if (st.dir == 0L) {
              if (close >= st.lo * (1.0 + th)) {
                pivot = Some(st.lo); kind = -1L
                st = ZzState(1L, close, st.lo, seen = true)
              } else if (close <= st.hi * (1.0 - th)) {
                pivot = Some(st.hi); kind = 1L
                st = ZzState(-1L, st.hi, close, seen = true)
              } else st = ZzState(0L,
                if (close > st.hi) close else st.hi,
                if (close < st.lo) close else st.lo, seen = true)
            } else if (st.dir == 1L) {
              if (close > st.hi) st = st.copy(hi = close)
              else if (close <= st.hi * (1.0 - th)) {
                pivot = Some(st.hi); kind = 1L
                st = ZzState(-1L, st.hi, close, seen = true)
              }
            } else {
              if (close < st.lo) st = st.copy(lo = close)
              else if (close >= st.lo * (1.0 + th)) {
                pivot = Some(st.lo); kind = -1L
                st = ZzState(1L, close, st.lo, seen = true)
              }
            }
            out += ZzPoint(assetId, t.date, close, st.dir,
              if (st.dir == -1L) st.lo else st.hi, pivot, kind)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class AdfState(last: Double, hasLast: Boolean, n: Long, sx: Double,
                      sy: Double, sxy: Double, sx2: Double, sy2: Double)
  case class AdfUpd(asset_id: Long, n_obs: Long, beta: Option[Double],
                    adf_t: Option[Double])

  /** D141 `adfTestStream` — streaming face of B248 `adf_test`, UPDATE
    * mode: previous close + five running OLS sums — O(1) state; each
    * (pₜ₋₁, Δpₜ) pair accumulates in the batch fold's date order and
    * the final emission replays the identical β/α/SSE/t sequence.
    */
  def adfTestStream(ticks: Dataset[DailyTick]): Dataset[AdfUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AdfState, AdfUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[AdfState]) =>
          var st = state.getOption.getOrElse(
            AdfState(0.0, hasLast = false, 0L, 0.0, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.hasLast) {
              val x = st.last
              val y = t.value - st.last
              st = AdfState(t.value, hasLast = true, st.n + 1,
                st.sx + x, st.sy + y, st.sxy + x * y,
                st.sx2 + x * x, st.sy2 + y * y)
            } else st = st.copy(last = t.value, hasLast = true)
          }
          state.update(st)
          if (st.n >= 3) {
            val n = st.n.toDouble
            val den = n * st.sx2 - st.sx * st.sx
            if (den == 0.0)
              Iterator.single(AdfUpd(assetId, st.n, None, None))
            else {
              val beta = (n * st.sxy - st.sx * st.sy) / den
              val alpha = (st.sy - beta * st.sx) / n
              val sse = math.max(st.sy2 - alpha * st.sy - beta * st.sxy, 0.0)
              val se = math.sqrt(sse / (n - 2) * n / den)
              Iterator.single(AdfUpd(assetId, st.n,
                Some(graft.operators.Micro.jvm6(beta)),
                if (se == 0.0) None
                else Some(graft.operators.Micro.jvm6(beta / se))))
            }
          } else Iterator.empty
      }
  }

  // ── wave AM: filter-state twins ────────────────────────────────────

  case class KalState(lvl: Double, p: Double, seen: Boolean)
  case class KalPoint(asset_id: Long, date: java.sql.Date, value: Double,
                      level: Double, gain: Option[Double])

  /** D142 `kalmanStream` — streaming face of B250 `kalman_trend`: the
    * filter state (level, covariance) IS the stream state — the
    * textbook O(1) online estimator; every arrival runs one
    * predict/correct step identical to the batch scan.
    */
  def kalmanStream(ticks: Dataset[DailyTick], q: Double = 0.01,
                   r: Double = 1.0): Dataset[KalPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[KalState, KalPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[KalState]) =>
          var st = state.getOption.getOrElse(KalState(0.0, 0.0, seen = false))
          val out = Vector.newBuilder[KalPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (!st.seen) {
              st = KalState(t.value, 1.0, seen = true)
              out += KalPoint(assetId, t.date, t.value, t.value, None)
            } else {
              val pp = st.p + q
              val g = graft.operators.Micro.jvm6(pp / (pp + r))
              val lvl = graft.operators.Micro.jvm6(st.lvl + g * (t.value - st.lvl))
              st = KalState(lvl, graft.operators.Micro.jvm6((1.0 - g) * pp), seen = true)
              out += KalPoint(assetId, t.date, t.value, lvl, Some(g))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class HoltState(lvl: Double, tr: Double, seen: Boolean)
  case class HoltPoint(asset_id: Long, date: java.sql.Date, value: Double,
                       level: Double, trend: Double, forecast: Double)

  /** D143 `holtStream` — streaming face of B251 `holt_winters`: the
    * (level, trend) pair IS the state — O(1) online forecasting, one
    * smoothing step per arrival.
    */
  def holtStream(ticks: Dataset[DailyTick], alpha: Double = 0.3,
                 beta: Double = 0.1): Dataset[HoltPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[HoltState, HoltPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[HoltState]) =>
          var st = state.getOption.getOrElse(HoltState(0.0, 0.0, seen = false))
          val out = Vector.newBuilder[HoltPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (!st.seen) st = HoltState(t.value, 0.0, seen = true)
            else {
              val lNew = graft.operators.Micro.jvm6(
                alpha * t.value + (1.0 - alpha) * (st.lvl + st.tr))
              val tNew = graft.operators.Micro.jvm6(
                beta * (lNew - st.lvl) + (1.0 - beta) * st.tr)
              st = HoltState(lNew, tNew, seen = true)
            }
            out += HoltPoint(assetId, t.date, t.value, st.lvl, st.tr,
              graft.operators.Micro.jvm6(st.lvl + st.tr))
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class PsychState(last: Double, seen: Boolean, ring: Vector[Long])
  case class PsychPoint(asset_id: Long, date: java.sql.Date, n_up: Long,
                        n_days: Long, psych_pm: Long)

  /** D144 `psychLineStream` — streaming face of B254 `psych_line`:
    * previous close + a 12-slot up/down ring of INTEGERS — sentiment
    * with zero float ops anywhere. First-ever tick emits nothing.
    */
  def psychLineStream(ticks: Dataset[DailyTick], n: Int = 12): Dataset[PsychPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PsychState, PsychPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[PsychState]) =>
          var st = state.getOption.getOrElse(PsychState(0.0, seen = false, Vector.empty))
          val out = Vector.newBuilder[PsychPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen) {
              val up = if (t.value > st.last) 1L else 0L
              val ring = (st.ring :+ up).takeRight(n)
              st = PsychState(t.value, seen = true, ring)
              val nUp = ring.sum
              out += PsychPoint(assetId, t.date, nUp, ring.size.toLong,
                1000L * nUp / ring.size)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class RenkoState(anchor: Long, dir: Long, cum: Long, size: Long,
                        seen: Boolean)
  case class RenkoPoint(asset_id: Long, date: java.sql.Date, close: Double,
                        size_micro: Long, n_bricks: Long, cum_bricks: Long,
                        dir: Long, anchor: Double)

  /** D145 `renkoStream` — streaming face of B255 `renko`: the
    * (anchor, dir, cum, size) quadruple of BIGINTs IS the state — the
    * brick size locks on the first arrival (2% of first close, the
    * batch rule, which is causal by construction) and every later step
    * is pure integer compare/divide. O(1) state, zero float ops in the
    * recursion.
    */
  def renkoStream(ticks: Dataset[DailyTick]): Dataset[RenkoPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RenkoState, RenkoPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RenkoState]) =>
          var st = state.getOption.getOrElse(RenkoState(0L, 0L, 0L, 1L, seen = false))
          val out = Vector.newBuilder[RenkoPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val m = math.floor(t.value * 1000000.0 + 0.5).toLong
            if (!st.seen) {
              val size = math.max(1L, math.abs(m) * 2L / 100L)
              st = RenkoState(m, 0L, 0L, size, seen = true)
              out += RenkoPoint(assetId, t.date, t.value, size, 0L, 0L, 0L,
                st.anchor / 1e6)
            } else {
              val upThr = if (st.dir == -1L) 2L * st.size else st.size
              val dnThr = if (st.dir == 1L) 2L * st.size else st.size
              var anchor = st.anchor; var dir = st.dir; var delta = 0L
              if (m >= anchor + upThr) {
                val k = (m - anchor) / st.size
                anchor += k * st.size; dir = 1L; delta = k
              } else if (m <= anchor - dnThr) {
                val k = (anchor - m) / st.size
                anchor -= k * st.size; dir = -1L; delta = -k
              }
              st = RenkoState(anchor, dir, st.cum + delta, st.size, seen = true)
              out += RenkoPoint(assetId, t.date, t.value, st.size, delta, st.cum,
                dir, anchor / 1e6)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class GarchState(s: Double, prevRet: Double, last: Double,
                        seen: Boolean, retSeen: Boolean)
  case class GarchPoint(asset_id: Long, date: java.sql.Date, ret: Double,
                        sigma2: Double, vol: Double)

  /** D146 `garchStream` — streaming face of B256 `garch_filter`: the
    * (σ², r_prev) pair IS the state — the textbook O(1) online
    * variance filter. The constant σ²₁ = 2e-5 seed is what makes the
    * batch/stream pair bit-identical (a full-history seed could never
    * be known at the first arrival). Emits from the second tick (the
    * first return), exactly the batch row set.
    */
  def garchStream(ticks: Dataset[DailyTick]): Dataset[GarchPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[GarchState, GarchPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[GarchState]) =>
          var st = state.getOption.getOrElse(
            GarchState(0.0, 0.0, 0.0, seen = false, retSeen = false))
          val out = Vector.newBuilder[GarchPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (!st.seen) st = st.copy(last = t.value, seen = true)
            else if (st.last == 0.0) st = st.copy(last = t.value)
            else {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              val s =
                if (!st.retSeen) 2.0e-5
                else graft.operators.Micro.jvm12(
                  1.0e-6 + 0.05 * st.prevRet * st.prevRet + 0.90 * st.s)
              st = GarchState(s, r, t.value, seen = true, retSeen = true)
              out += GarchPoint(assetId, t.date, r, s,
                graft.operators.Micro.jvm6(math.sqrt(s)))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class IbsRunState(nDays: Long, nFlat: Long, nMeasured: Long,
                         sumMicro: Long)
  case class IbsUpd(asset_id: Long, n_days: Long, n_flat: Long,
                    n_measured: Long, mean_ibs: Option[Double])

  /** D147 `ibsStream` — streaming face of B161 `ibs`: running
    * (n_days, n_flat, n_measured, Σv_micro) — four BIGINTs of state,
    * each day's IBS u6-rounded THEN micro-scaled exactly as the batch
    * aggregate folds it, so the final update equals the batch row
    * bit-for-bit (the integer-mean `div` convention included).
    */
  def ibsStream(bars: Dataset[OhlcStreamBar]): Dataset[IbsUpd] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[IbsRunState, IbsUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[IbsRunState]) =>
          var st = state.getOption.getOrElse(IbsRunState(0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (b.high == b.low) st = st.copy(nDays = st.nDays + 1, nFlat = st.nFlat + 1)
            else {
              val v = graft.operators.Micro.jvm6((b.close - b.low) / (b.high - b.low))
              val vm = math.rint(v * 1e6).toLong
              st = IbsRunState(st.nDays + 1, st.nFlat, st.nMeasured + 1,
                st.sumMicro + vm)
            }
          }
          state.update(st)
          if (st.nDays == 0) Iterator.empty
          else Iterator.single(IbsUpd(assetId, st.nDays, st.nFlat, st.nMeasured,
            if (st.nMeasured == 0) None
            else Some(math.floorDiv(st.sumMicro, st.nMeasured).toDouble / 1e6)))
      }
  }

  case class PrevBarState(po: Double, ph: Double, pl: Double, pc: Double,
                          seen: Boolean)
  case class WoodiePoint(asset_id: Long, date: java.sql.Date, close: Double,
                         p: Option[Double], r1: Option[Double], s1: Option[Double],
                         r2: Option[Double], s2: Option[Double])

  /** D148 `woodieStream` — streaming face of B261 `woodie_pivots`:
    * yesterday's bar IS the state (the [[pivotPointsStream]] shape,
    * close double-weighted).
    */
  def woodieStream(bars: Dataset[OhlcStreamBar]): Dataset[WoodiePoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PrevBarState, WoodiePoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[PrevBarState]) =>
          var st = state.getOption.getOrElse(PrevBarState(0.0, 0.0, 0.0, 0.0, seen = false))
          val out = Vector.newBuilder[WoodiePoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val p = graft.operators.Micro.jvm6((st.ph + st.pl + 2.0 * st.pc) / 4)
              out += WoodiePoint(assetId, b.date, b.close, Some(p),
                Some(graft.operators.Micro.jvm6(2.0 * p - st.pl)),
                Some(graft.operators.Micro.jvm6(2.0 * p - st.ph)),
                Some(graft.operators.Micro.jvm6(p + (st.ph - st.pl))),
                Some(graft.operators.Micro.jvm6(p - (st.ph - st.pl))))
            } else out += WoodiePoint(assetId, b.date, b.close, None, None, None, None, None)
            st = PrevBarState(b.open, b.high, b.low, b.close, seen = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class DemarkPoint(asset_id: Long, date: java.sql.Date, close: Double,
                         p: Option[Double], r1: Option[Double], s1: Option[Double])

  /** D149 `demarkStream` — streaming face of B262 `demark_pivots`:
    * yesterday's FULL bar (the open participates in the branch) IS
    * the state.
    */
  def demarkStream(bars: Dataset[OhlcStreamBar]): Dataset[DemarkPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PrevBarState, DemarkPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[PrevBarState]) =>
          var st = state.getOption.getOrElse(PrevBarState(0.0, 0.0, 0.0, 0.0, seen = false))
          val out = Vector.newBuilder[DemarkPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen) {
              val x =
                if (st.pc < st.po) st.ph + 2.0 * st.pl + st.pc
                else if (st.pc > st.po) 2.0 * st.ph + st.pl + st.pc
                else st.ph + st.pl + 2.0 * st.pc
              out += DemarkPoint(assetId, b.date, b.close,
                Some(graft.operators.Micro.jvm6(x / 4)),
                Some(graft.operators.Micro.jvm6(x / 2 - st.pl)),
                Some(graft.operators.Micro.jvm6(x / 2 - st.ph)))
            } else out += DemarkPoint(assetId, b.date, b.close, None, None, None)
            st = PrevBarState(b.open, b.high, b.low, b.close, seen = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  // ── wave AQ: running market-model / tail-risk twins ────────────────

  case class RegSumState(n: Long, sa: Double, sm: Double, sp: Double,
                         sm2: Double, sa2: Double)
  case class BetaUpd(asset_id: Long, n_days: Long, beta: Option[Double],
                     alpha: Option[Double])

  /** D151 `betaStream` — streaming face of B25 `beta`: the running
    * (n, Σr, Σm, Σrm, Σm²) quintuple IS the state. Each partial sum
    * accumulates in date order — exactly the batch's left-assoc fold
    * over the date-sorted array, so the final update is bit-identical
    * including the coalesce(slope, 0) convention inside alpha.
    */
  def betaStream(ticks: Dataset[RetMktTick]): Dataset[BetaUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RegSumState, BetaUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[RetMktTick], state: GroupState[RegSumState]) =>
          var st = state.getOption.getOrElse(RegSumState(0L, 0.0, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            st = RegSumState(st.n + 1, st.sa + t.ret, st.sm + t.mkt_ret,
              st.sp + t.ret * t.mkt_ret, st.sm2 + t.mkt_ret * t.mkt_ret, st.sa2)
          }
          state.update(st)
          if (st.n == 0) Iterator.empty
          else {
            val n = st.n.toDouble
            val den = n * st.sm2 - st.sm * st.sm
            val raw = if (den == 0.0) None else Some((n * st.sp - st.sa * st.sm) / den)
            Iterator.single(BetaUpd(assetId, st.n,
              raw.map(graft.operators.Micro.jvm6),
              Some(graft.operators.Micro.jvm6(
                (st.sa - raw.getOrElse(0.0) * st.sm) / n))))
          }
      }
  }

  case class TreynorUpd(asset_id: Long, n_days: Long, beta: Option[Double],
                        treynor: Option[Double])

  /** D152 `treynorStream` — streaming face of B88 `treynor`: same
    * running sums as [[betaStream]]; the |β|<0.01 degeneracy guard
    * applies to the u6-ROUNDED beta exactly as the batch column does.
    */
  def treynorStream(ticks: Dataset[RetMktTick]): Dataset[TreynorUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RegSumState, TreynorUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[RetMktTick], state: GroupState[RegSumState]) =>
          var st = state.getOption.getOrElse(RegSumState(0L, 0.0, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            st = RegSumState(st.n + 1, st.sa + t.ret, st.sm + t.mkt_ret,
              st.sp + t.ret * t.mkt_ret, st.sm2 + t.mkt_ret * t.mkt_ret, st.sa2)
          }
          state.update(st)
          if (st.n < 2) Iterator.empty
          else {
            val n = st.n.toDouble
            val den = n * st.sm2 - st.sm * st.sm
            val beta = if (den == 0.0) None
              else Some(graft.operators.Micro.jvm6((n * st.sp - st.sa * st.sm) / den))
            val trey = beta.filter(b => math.abs(b) >= 0.01)
              .map(b => graft.operators.Micro.jvm6((st.sa / n) / b))
            Iterator.single(TreynorUpd(assetId, st.n, beta, trey))
          }
      }
  }

  case class JensenUpd(asset_id: Long, n_days: Long, beta: Option[Double],
                       alpha: Option[Double], resid_sd: Option[Double],
                       appraisal: Option[Double])

  /** D153 `jensenAlphaStream` — streaming face of B220 `jensen_alpha`:
    * the six running sums (adds Σr² for the residual sd) — O(1) state
    * online appraisal. Raw (unrounded) slope feeds alpha/resid exactly
    * as the batch columns compose.
    */
  def jensenAlphaStream(ticks: Dataset[RetMktTick]): Dataset[JensenUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RegSumState, JensenUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[RetMktTick], state: GroupState[RegSumState]) =>
          var st = state.getOption.getOrElse(RegSumState(0L, 0.0, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            st = RegSumState(st.n + 1, st.sa + t.ret, st.sm + t.mkt_ret,
              st.sp + t.ret * t.mkt_ret, st.sm2 + t.mkt_ret * t.mkt_ret,
              st.sa2 + t.ret * t.ret)
          }
          state.update(st)
          if (st.n < 3) Iterator.empty
          else {
            import graft.operators.Micro.jvm6
            val n = st.n.toDouble
            val sxx = n * st.sm2 - st.sm * st.sm
            val sxy = n * st.sp - st.sm * st.sa
            val syy = n * st.sa2 - st.sa * st.sa
            val b = if (sxx <= 0.0) None else Some(sxy / sxx)
            val a = b.map(bb => st.sa / n - bb * (st.sm / n))
            val rs = b.map(bb =>
              math.sqrt(math.max((syy - bb * sxy) / n / (n - 2), 0.0)))
            Iterator.single(JensenUpd(assetId, st.n,
              b.map(jvm6), a.map(jvm6), rs.map(jvm6),
              (a, rs) match {
                case (Some(av), Some(r)) if r != 0.0 => Some(jvm6(av / r))
                case _ => None
              }))
          }
      }
  }

  case class VarDecompUpd(asset_id: Long, n_days: Long, beta: Option[Double],
                          var_total_bp: Double, var_sys_bp: Option[Double],
                          var_idio_bp: Option[Double], sys_share: Option[Double])

  /** D159 `varianceDecompositionStream` — streaming face of B268
    * `variance_decomposition`: the same six running sums as
    * [[jensenAlphaStream]], with the CAPM variance split recomputed
    * on every update. */
  def varianceDecompositionStream(ticks: Dataset[RetMktTick]): Dataset[VarDecompUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RegSumState, VarDecompUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[RetMktTick], state: GroupState[RegSumState]) =>
          var st = state.getOption.getOrElse(RegSumState(0L, 0.0, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            st = RegSumState(st.n + 1, st.sa + t.ret, st.sm + t.mkt_ret,
              st.sp + t.ret * t.mkt_ret, st.sm2 + t.mkt_ret * t.mkt_ret,
              st.sa2 + t.ret * t.ret)
          }
          state.update(st)
          if (st.n < 3) Iterator.empty
          else {
            import graft.operators.Micro.jvm6
            val n = st.n.toDouble
            val sxx = n * st.sm2 - st.sm * st.sm
            val b = if (sxx <= 0.0) None
              else Some((n * st.sp - st.sm * st.sa) / sxx)
            val varTotal = (n * st.sa2 - st.sa * st.sa) / (n * (n - 1))
            val varMkt = sxx / (n * (n - 1))
            val varSys = b.map(bb => bb * bb * varMkt)
            val varIdio = varSys.map(vs => math.max(varTotal - vs, 0.0))
            Iterator.single(VarDecompUpd(assetId, st.n, b.map(jvm6),
              jvm6(varTotal * 1e4), varSys.map(v => jvm6(v * 1e4)),
              varIdio.map(v => jvm6(v * 1e4)),
              varSys.flatMap(vs =>
                if (varTotal == 0.0) None else Some(jvm6(vs / varTotal)))))
          }
      }
  }

  case class IrState(n: Long, s: Double, s2: Double)
  case class IrUpd(asset_id: Long, n_days: Long, mean_active: Double,
                   ir: Option[Double])

  /** D154 `informationRatioStream` — streaming face of B86
    * `information_ratio`: running (n, Σa, Σa²) over the u6 ACTIVE
    * return (r − m rounded exactly as the batch column is). */
  def informationRatioStream(ticks: Dataset[RetMktTick]): Dataset[IrUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[IrState, IrUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[RetMktTick], state: GroupState[IrState]) =>
          var st = state.getOption.getOrElse(IrState(0L, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val a = graft.operators.Micro.jvm6(t.ret - t.mkt_ret)
            st = IrState(st.n + 1, st.s + a, st.s2 + a * a)
          }
          state.update(st)
          if (st.n < 2) Iterator.empty
          else {
            import graft.operators.Micro.jvm6
            val n = st.n.toDouble
            val te = math.sqrt(math.max((n * st.s2 - st.s * st.s) / (n * (n - 1)), 0.0))
            Iterator.single(IrUpd(assetId, st.n, jvm6(st.s / n),
              if (te == 0.0) None else Some(jvm6((st.s / n) / te))))
          }
      }
  }

  case class IdState(last: Double, seen: Boolean, n: Long, nPos: Long,
                     nNeg: Long, sumRm: Long)
  case class IdUpd(asset_id: Long, n_rets: Long, n_pos: Long, n_neg: Long,
                   sign: Long, id: Double)

  /** D155 `infoDiscretenessStream` — streaming face of B259
    * `info_discreteness`: four integers + the exact micro-return sum
    * — the sign can never drift because nothing is floating. */
  def infoDiscretenessStream(ticks: Dataset[DailyTick]): Dataset[IdUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[IdState, IdUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[IdState]) =>
          var st = state.getOption.getOrElse(IdState(0.0, seen = false, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              val rm = math.floor(r * 1000000.0 + 0.5).toLong
              st = IdState(t.value, seen = true, st.n + 1,
                st.nPos + (if (rm > 0) 1L else 0L),
                st.nNeg + (if (rm < 0) 1L else 0L), st.sumRm + rm)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n < 3) Iterator.empty
          else {
            val sign = if (st.sumRm > 0) 1L else if (st.sumRm < 0) -1L else 0L
            Iterator.single(IdUpd(assetId, st.n, st.nPos, st.nNeg, sign,
              graft.operators.Micro.jvm6(
                sign.toDouble * (st.nNeg - st.nPos).toDouble / st.n.toDouble)))
          }
      }
  }

  // ── wave AW: microstructure / distribution running twins ──────────

  case class AmihudState(prevClose: Double, seen: Boolean, ring: Vector[Long])
  case class AmihudPoint(asset_id: Long, date: java.sql.Date, ret: Double,
                         n_ticks: Long, illiq: Double)

  /** D164 `amihudStream` — streaming face of B204 `amihud`: the
    * 20-slot integer xim ring IS the state; every step is integer
    * (the batch's rounding-division `div` chain verbatim). */
  def amihudStream(bars: Dataset[OhlcStreamBar], window: Int = 20): Dataset[AmihudPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AmihudState, AmihudPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[AmihudState]) =>
          var st = state.getOption.getOrElse(AmihudState(0.0, seen = false, Vector.empty))
          val out = Vector.newBuilder[AmihudPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen && st.prevClose != 0.0) {
              val r = graft.operators.Micro.jvm6(b.close / st.prevClose - 1)
              val rm = math.round(r * 1e6)
              val xim = (math.abs(rm) * 2 + b.n_ticks) / (2 * b.n_ticks)
              val ring = (st.ring :+ xim).takeRight(window)
              val sm = ring.sum
              val cnt = ring.size.toLong
              out += AmihudPoint(assetId, b.date, r, b.n_ticks,
                ((2 * sm + cnt) / (2 * cnt)).toDouble / 1e6)
              st = AmihudState(b.close, seen = true, ring)
            } else st = st.copy(prevClose = b.close, seen = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class PairSumState(last: Double, seen: Boolean, prevRet: Double,
                          hasPrev: Boolean, n: Long, sx: Double, sy: Double,
                          sxy: Double, sx2: Double, sy2: Double)
  case class RollSpreadUpd(asset_id: Long, n_pairs: Long,
                           roll_spread: Option[Double])

  /** D165 `rollSpreadStream` — streaming face of B205 `roll_spread`:
    * running consecutive-Δp pair sums; each partial sum accumulates in
    * date order = the batch's slice folds. */
  def rollSpreadStream(ticks: Dataset[DailyTick]): Dataset[RollSpreadUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PairSumState, RollSpreadUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[PairSumState]) =>
          var st = state.getOption.getOrElse(
            PairSumState(0.0, seen = false, 0.0, hasPrev = false, 0L, 0.0, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen) {
              val dp = graft.operators.Micro.jvm6(t.value - st.last)
              if (st.hasPrev)
                st = PairSumState(t.value, seen = true, dp, hasPrev = true,
                  st.n + 1, st.sx + st.prevRet, st.sy + dp,
                  st.sxy + st.prevRet * dp, st.sx2, st.sy2)
              else st = PairSumState(t.value, seen = true, dp, hasPrev = true,
                st.n, st.sx, st.sy, st.sxy, st.sx2, st.sy2)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n < 2) Iterator.empty
          else {
            val n = st.n.toDouble
            val cov = (n * st.sxy - st.sx * st.sy) / (n * (n - 1))
            Iterator.single(RollSpreadUpd(assetId, st.n,
              if (cov < 0) Some(graft.operators.Micro.jvm6(2.0 * math.sqrt(-cov)))
              else None))
          }
      }
  }

  case class CsState(ph: Double, pl: Double, px: Double, seen: Boolean)
  case class CsPoint(asset_id: Long, date: java.sql.Date, beta: Double,
                     gamma: Double, spread: Option[Double],
                     spread_pos: Option[Double])

  /** D166 `corwinSchultzStream` — streaming face of B206
    * `corwin_schultz`: yesterday's (high, low, log-range) triple IS
    * the state; bars with low ≤ 0 are skipped entirely (the batch
    * filters BEFORE the lag, so the previous valid bar carries). */
  def corwinSchultzStream(bars: Dataset[OhlcStreamBar]): Dataset[CsPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    val d = 3.0 - 2.0 * math.sqrt(2.0)
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CsState, CsPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[CsState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(CsState(0.0, 0.0, 0.0, seen = false))
          val out = Vector.newBuilder[CsPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (b.low > 0) {
              val x = jvm6(math.log(b.high / b.low))
              if (st.seen) {
                val hh = math.max(b.high, st.ph)
                val ll = math.min(b.low, st.pl)
                if (ll > 0) {
                  val beta = jvm6(x * x + st.px * st.px)
                  val gamma = jvm6(math.log(hh / ll) * math.log(hh / ll))
                  val alpha = jvm6((math.sqrt(2.0 * beta) - math.sqrt(beta)) / d -
                    math.sqrt(gamma / d))
                  val spread =
                    if (math.abs(alpha) > graft.operators.Analytics.ExpSafeArg) None
                    else Some(jvm6(2.0 * (math.exp(alpha) - 1) / (1.0 + math.exp(alpha))))
                  out += CsPoint(assetId, b.date, beta, gamma, spread,
                    spread.map(s => math.max(s, 0.0)))
                }
              }
              st = CsState(b.high, b.low, x, seen = true)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class AcUpd(asset_id: Long, n_pairs: Long, autocorr: Option[Double])

  /** D167 `autocorrStream` — streaming face of B32 `autocorr`: running
    * lag-1 Pearson sums (adds Σx², Σy² beside the roll pair sums). */
  def autocorrStream(ticks: Dataset[DailyTick]): Dataset[AcUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PairSumState, AcUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[PairSumState]) =>
          var st = state.getOption.getOrElse(
            PairSumState(0.0, seen = false, 0.0, hasPrev = false, 0L, 0.0, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              if (st.hasPrev)
                st = PairSumState(t.value, seen = true, r, hasPrev = true,
                  st.n + 1, st.sx + st.prevRet, st.sy + r,
                  st.sxy + st.prevRet * r,
                  st.sx2 + st.prevRet * st.prevRet, st.sy2 + r * r)
              else st = PairSumState(t.value, seen = true, r, hasPrev = true,
                st.n, st.sx, st.sy, st.sxy, st.sx2, st.sy2)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n < 2) Iterator.empty
          else {
            val n = st.n.toDouble
            val den = math.sqrt(math.max(n * st.sx2 - st.sx * st.sx, 0.0)) *
              math.sqrt(math.max(n * st.sy2 - st.sy * st.sy, 0.0))
            Iterator.single(AcUpd(assetId, st.n,
              if (den == 0.0) None
              else Some(graft.operators.Micro.jvm6((n * st.sxy - st.sx * st.sy) / den))))
          }
      }
  }

  case class MomSumState(last: Double, seen: Boolean, n: Long, s1: Double,
                         s2: Double, s3: Double, s4: Double)
  case class JbUpd(asset_id: Long, n_days: Long, skew: Option[Double],
                   ex_kurt: Option[Double], jb: Option[Double],
                   normal_5pct: Option[Boolean])

  /** D168 `jarqueBeraStream` — streaming face of B91 `jarque_bera`:
    * running raw-moment sums (each term's association copied from the
    * SeqFold kinds: (x·x)·x, ((x·x)·x)·x). */
  def jarqueBeraStream(ticks: Dataset[DailyTick]): Dataset[JbUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[MomSumState, JbUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[MomSumState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(
            MomSumState(0.0, seen = false, 0L, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = jvm6(t.value / st.last - 1)
              st = MomSumState(t.value, seen = true, st.n + 1,
                st.s1 + r, st.s2 + r * r, st.s3 + (r * r) * r,
                st.s4 + ((r * r) * r) * r)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n < 4) Iterator.empty
          else {
            val n = st.n.toDouble
            val m = st.s1 / n
            val m2 = st.s2 / n - m * m
            val m3 = st.s3 / n - 3.0 * m * (st.s2 / n) + 2.0 * m * m * m
            val m4 = st.s4 / n - 4.0 * m * (st.s3 / n) +
              6.0 * m * m * (st.s2 / n) - 3.0 * m * m * m * m
            if (m2 <= 0.0)
              Iterator.single(JbUpd(assetId, st.n, None, None, None, None))
            else {
              val g1 = m3 / (m2 * math.sqrt(m2))
              val g2 = m4 / (m2 * m2) - 3
              val jb = jvm6(n / 6.0 * (g1 * g1 + g2 * g2 / 4.0))
              Iterator.single(JbUpd(assetId, st.n, Some(jvm6(g1)), Some(jvm6(g2)),
                Some(jb), Some(jb < 5.991465)))
            }
          }
      }
  }

  case class BurkeState(last: Double, seen: Boolean, peak: Double,
                        inEpisode: Boolean, curDepth: Double, ssqClosed: Double,
                        nEpClosed: Long, nRets: Long, sumRet: Double)
  case class BurkeUpd(asset_id: Long, n_days: Long, n_episodes: Long,
                      mean_ret: Double, burke: Option[Double])

  /** D183 `burkeRatioStream` — streaming face of B216 `burke_ratio`:
    * episodes close in start order, so the running Σdepth² over
    * closed episodes plus the OPEN episode's current depth replays
    * the batch's start-date-ordered fold exactly (the open episode is
    * always last by start date). */
  def burkeRatioStream(ticks: Dataset[DailyTick]): Dataset[BurkeUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[BurkeState, BurkeUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[BurkeState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(BurkeState(0.0, seen = false, 0.0,
            inEpisode = false, 0.0, 0.0, 0L, 0L, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val peak = if (st.seen) math.max(st.peak, t.value) else t.value
            val dd = if (peak == 0.0) 0.0 else jvm6(t.value / peak - 1)
            val (nR, sR) =
              if (st.seen && st.last != 0.0)
                (st.nRets + 1, st.sumRet + jvm6(t.value / st.last - 1))
              else (st.nRets, st.sumRet)
            st =
              if (dd < 0) {
                if (st.inEpisode)
                  st.copy(last = t.value, seen = true, peak = peak,
                    curDepth = math.min(st.curDepth, dd), nRets = nR, sumRet = sR)
                else st.copy(last = t.value, seen = true, peak = peak,
                  inEpisode = true, curDepth = dd, nRets = nR, sumRet = sR)
              } else if (st.inEpisode)
                st.copy(last = t.value, seen = true, peak = peak,
                  inEpisode = false,
                  ssqClosed = st.ssqClosed + st.curDepth * st.curDepth,
                  nEpClosed = st.nEpClosed + 1, nRets = nR, sumRet = sR)
              else st.copy(last = t.value, seen = true, peak = peak,
                nRets = nR, sumRet = sR)
          }
          state.update(st)
          if (st.nRets < 1) Iterator.empty
          else {
            val nEp = st.nEpClosed + (if (st.inEpisode) 1L else 0L)
            val ssq = st.ssqClosed +
              (if (st.inEpisode) st.curDepth * st.curDepth else 0.0)
            val meanRet = st.sumRet / st.nRets.toDouble
            Iterator.single(BurkeUpd(assetId, st.nRets, nEp, jvm6(meanRet),
              if (nEp == 0 || ssq <= 0.0) None
              else Some(jvm6(meanRet / math.sqrt(ssq)))))
          }
      }
  }

  case class LpmState(last: Double, seen: Boolean, n: Long, s: Double,
                      up1: Double, dn2: Double, lpm3: Double)
  case class Kappa3Upd(asset_id: Long, n_days: Long, mean_ret: Double,
                       lpm3: Double, kappa3: Option[Double])
  case class UpsideUpd(asset_id: Long, n_days: Long, upside_mean: Double,
                       downside_dev: Double, upr: Option[Double])

  /** D184 `kappaThreeStream` — streaming face of B217 `kappa_three`:
    * running Σr and Σmax(−r,0)³ (the sum3 association (x·x)·x). */
  def kappaThreeStream(ticks: Dataset[DailyTick]): Dataset[Kappa3Upd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[LpmState, Kappa3Upd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[LpmState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(
            LpmState(0.0, seen = false, 0L, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = jvm6(t.value / st.last - 1)
              val x = math.max(-r, 0.0)
              st = LpmState(t.value, seen = true, st.n + 1, st.s + r,
                st.up1, st.dn2, st.lpm3 + (x * x) * x)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n < 4) Iterator.empty
          else {
            val n = st.n.toDouble
            val lpm3 = st.lpm3 / n
            Iterator.single(Kappa3Upd(assetId, st.n, jvm6(st.s / n), jvm6(lpm3),
              if (lpm3 <= 0.0) None
              else Some(jvm6((st.s / n) / math.cbrt(lpm3)))))
          }
      }
  }

  /** D185 `upsidePotentialStream` — streaming face of B206-family
    * `upside_potential`: running Σmax(r,0) and Σmin(r,0)². */
  def upsidePotentialStream(ticks: Dataset[DailyTick]): Dataset[UpsideUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[LpmState, UpsideUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[LpmState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(
            LpmState(0.0, seen = false, 0L, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = jvm6(t.value / st.last - 1)
              val up = math.max(r, 0.0)
              val dn = math.min(r, 0.0)
              st = LpmState(t.value, seen = true, st.n + 1, st.s + r,
                st.up1 + up, st.dn2 + dn * dn, st.lpm3)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n < 4) Iterator.empty
          else {
            val n = st.n.toDouble
            Iterator.single(UpsideUpd(assetId, st.n, jvm6(st.up1 / n),
              jvm6(math.sqrt(st.dn2 / n)),
              if (st.dn2 == 0.0) None
              else Some(jvm6((st.up1 / n) / math.sqrt(st.dn2 / n)))))
          }
      }
  }

  case class DualBetaState(nU: Long, saU: Double, smU: Double, spU: Double,
                           sm2U: Double, nD: Long, saD: Double, smD: Double,
                           spD: Double, sm2D: Double)
  case class DualBetaUpd(asset_id: Long, n_up: Long, n_down: Long,
                         bull_beta: Option[Double], bear_beta: Option[Double],
                         beta_convexity: Option[Double])

  /** D182 `dualBetaStream` — streaming face of B275 `dual_beta`: two
    * independent running OLS quintuples, routed by the sign of the
    * market return on arrival (zero-market days touch neither). */
  def dualBetaStream(ticks: Dataset[RetMktTick]): Dataset[DualBetaUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[DualBetaState, DualBetaUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[RetMktTick], state: GroupState[DualBetaState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(
            DualBetaState(0L, 0.0, 0.0, 0.0, 0.0, 0L, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (t.mkt_ret > 0)
              st = st.copy(nU = st.nU + 1, saU = st.saU + t.ret,
                smU = st.smU + t.mkt_ret, spU = st.spU + t.ret * t.mkt_ret,
                sm2U = st.sm2U + t.mkt_ret * t.mkt_ret)
            else if (t.mkt_ret < 0)
              st = st.copy(nD = st.nD + 1, saD = st.saD + t.ret,
                smD = st.smD + t.mkt_ret, spD = st.spD + t.ret * t.mkt_ret,
                sm2D = st.sm2D + t.mkt_ret * t.mkt_ret)
          }
          state.update(st)
          if (st.nU + st.nD < 2) Iterator.empty
          else {
            def beta(n: Long, sa: Double, sm: Double, sp: Double,
                     sm2: Double): Option[Double] =
              if (n < 2) None
              else {
                val nd = n.toDouble
                val den = nd * sm2 - sm * sm
                if (den == 0.0) None else Some(jvm6((nd * sp - sa * sm) / den))
              }
            val bu = beta(st.nU, st.saU, st.smU, st.spU, st.sm2U)
            val bd = beta(st.nD, st.saD, st.smD, st.spD, st.sm2D)
            Iterator.single(DualBetaUpd(assetId, st.nU, st.nD, bu, bd,
              (bu, bd) match {
                case (Some(a), Some(b)) => Some(jvm6(a - b))
                case _ => None
              }))
          }
      }
  }

  case class AdjSharpeUpd(asset_id: Long, n_days: Long, sr: Option[Double],
                          skew: Option[Double], ex_kurt: Option[Double],
                          asr: Option[Double])

  /** D180 `adjustedSharpeStream` — streaming face of B273
    * `adjusted_sharpe`: the [[jarqueBeraStream]] raw-moment sums with
    * Pezier's correction computed per update (u6 at every stored
    * stat, exactly the batch column chain). */
  def adjustedSharpeStream(ticks: Dataset[DailyTick]): Dataset[AdjSharpeUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[MomSumState, AdjSharpeUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[MomSumState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(
            MomSumState(0.0, seen = false, 0L, 0.0, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = jvm6(t.value / st.last - 1)
              st = MomSumState(t.value, seen = true, st.n + 1,
                st.s1 + r, st.s2 + r * r, st.s3 + (r * r) * r,
                st.s4 + ((r * r) * r) * r)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n < 4) Iterator.empty
          else {
            val n = st.n.toDouble
            val m = st.s1 / n
            val m2 = st.s2 / n - m * m
            val m3 = st.s3 / n - 3.0 * m * (st.s2 / n) + 2.0 * m * m * m
            val m4 = st.s4 / n - 4.0 * m * (st.s3 / n) +
              6.0 * m * m * (st.s2 / n) - 3.0 * m * m * m * m
            val sd = math.sqrt(math.max(m2 * n / (n - 1), 0.0))
            val sr = if (sd == 0.0) None else Some(jvm6(m / sd))
            val g1 = if (m2 <= 0.0) None else Some(jvm6(m3 / (m2 * math.sqrt(m2))))
            val g2 = if (m2 <= 0.0) None else Some(jvm6(m4 / (m2 * m2) - 3))
            val asr = (sr, g1, g2) match {
              case (Some(s), Some(a), Some(k)) =>
                Some(jvm6(s * (1.0 + a / 6 * s - k / 24 * s * s)))
              case _ => None
            }
            Iterator.single(AdjSharpeUpd(assetId, st.n, sr, g1, g2, asr))
          }
      }
  }

  case class EqCurveState(last: Double, seen: Boolean, n: Long, ym: Long,
                          sy: Double, sy2: Double, sty: Double)
  case class EqCurveUpd(asset_id: Long, n_days: Long, slope: Double,
                        r2: Option[Double], k_ratio: Option[Double])

  /** D181 `equityCurveR2Stream` — streaming face of B274
    * `equity_curve_r2`: the log-equity level as one EXACT micro
    * integer plus three date-ordered float sums (each running
    * accumulation ≡ the batch array fold, t ascending). */
  def equityCurveR2Stream(ticks: Dataset[DailyTick]): Dataset[EqCurveUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[EqCurveState, EqCurveUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[EqCurveState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(
            EqCurveState(0.0, seen = false, 0L, 0L, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = jvm6(t.value / st.last - 1)
              if (r > -1) {
                val lm = math.floor(math.log(1.0 + r) * 1000000.0 + 0.5).toLong
                val ym = st.ym + lm
                val y = ym.toDouble / 1000000.0
                val tIdx = (st.n + 1).toDouble
                st = EqCurveState(t.value, seen = true, st.n + 1, ym,
                  st.sy + y, st.sy2 + y * y, st.sty + tIdx * y)
              } else st = st.copy(last = t.value)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n < 3) Iterator.empty
          else {
            val n = st.n.toDouble
            val stSum = n * (n + 1) / 2
            val st2 = n * (n + 1) * (2.0 * n + 1) / 6
            val sxx = n * st2 - stSum * stSum
            val sxy = n * st.sty - stSum * st.sy
            val syy = n * st.sy2 - st.sy * st.sy
            val slope = jvm6(sxy / sxx)
            val r2 = if (syy <= 0.0) None else Some(jvm6(sxy * sxy / (sxx * syy)))
            val residVar = math.max((syy - sxy * sxy / sxx) / (n * (n - 2)), 0.0)
            val se = math.sqrt(residVar / (sxx / n))
            Iterator.single(EqCurveUpd(assetId, st.n, slope, r2,
              if (se == 0.0) None else Some(jvm6(slope / se))))
          }
      }
  }

  case class PathRiskState(last: Double, seen: Boolean, peak: Double,
                           nDays: Long, minDd: Double, sumDd: Double,
                           sumDdSq: Double, nRets: Long, sumRet: Double)
  case class CalmarUpd(asset_id: Long, n_days: Long, mean_ret: Double,
                       max_dd: Double, calmar: Option[Double])
  case class MartinUpd(asset_id: Long, n_days: Long, ulcer: Double,
                       mean_ret: Double, martin: Option[Double])
  case class PainUpd(asset_id: Long, n_days: Long, pain_index: Double,
                     mean_ret: Double, pain_ratio: Option[Double])

  private def pathRiskStep(st: PathRiskState, v: Double): PathRiskState = {
    import graft.operators.Micro.jvm6
    val peak = if (st.nDays == 0) v else math.max(st.peak, v)
    val (nR, sR) =
      if (st.seen && st.last != 0.0) {
        val r = jvm6(v / st.last - 1)
        (st.nRets + 1, st.sumRet + r)
      } else (st.nRets, st.sumRet)
    if (peak == 0.0)
      // unreachable on positive prices: a null dd is skipped by the
      // batch min() and would poison the batch folds — keep the state
      // untouched on that axis rather than invent a number
      PathRiskState(v, seen = true, peak, st.nDays + 1,
        st.minDd, st.sumDd, st.sumDdSq, nR, sR)
    else {
      // TWO dd spellings, copied from the two batch ops: calmar's
      // min-tracker uses u6((v−peak)/peak); martin/pain fold
      // u6(v/peak − 1). Same real number, different IEEE op order —
      // only u6 keeps them equal, so we do NOT share one value here.
      val ddCal = jvm6((v - peak) / peak)
      val ddRatio = jvm6(v / peak - 1)
      PathRiskState(v, seen = true, peak, st.nDays + 1,
        math.min(st.minDd, ddCal), st.sumDd + ddRatio,
        st.sumDdSq + ddRatio * ddRatio, nR, sR)
    }
  }

  /** D175 `calmarStream` — streaming face of B72 `calmar`: running
    * peak + min drawdown + return sum, all O(1); the min tracks the
    * batch's own u6((v−peak)/peak) spelling (see [[pathRiskStep]]). */
  def calmarStream(ticks: Dataset[DailyTick]): Dataset[CalmarUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PathRiskState, CalmarUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[PathRiskState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(PathRiskState(0.0, seen = false,
            0.0, 0L, Double.MaxValue, 0.0, 0.0, 0L, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach(t => st = pathRiskStep(st, t.value))
          state.update(st)
          if (st.nRets < 2) Iterator.empty
          else {
            val n = st.nRets.toDouble
            val meanRet = jvm6(st.sumRet / n)
            val maxDd = st.minDd
            Iterator.single(CalmarUpd(assetId, st.nRets, meanRet, maxDd,
              if (math.abs(maxDd) == 0.0) None
              else Some(jvm6(meanRet * 252.0 / math.abs(maxDd)))))
          }
      }
  }

  /** D176 `martinRatioStream` — streaming face of B218 `martin_ratio`:
    * running Σdd² over ALL days (first day's dd = 0 included). */
  def martinRatioStream(ticks: Dataset[DailyTick]): Dataset[MartinUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PathRiskState, MartinUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[PathRiskState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(PathRiskState(0.0, seen = false,
            0.0, 0L, Double.MaxValue, 0.0, 0.0, 0L, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach(t => st = pathRiskStep(st, t.value))
          state.update(st)
          if (st.nRets < 1) Iterator.empty
          else {
            val ulcer = jvm6(math.sqrt(st.sumDdSq / st.nDays.toDouble))
            val meanRet = jvm6(st.sumRet / st.nRets.toDouble)
            Iterator.single(MartinUpd(assetId, st.nDays, ulcer, meanRet,
              if (ulcer == 0.0) None else Some(jvm6(meanRet / ulcer))))
          }
      }
  }

  /** D177 `painIndexStream` — streaming face of B219-family
    * `pain_index`: running Σdd beside the same peak machinery. */
  def painIndexStream(ticks: Dataset[DailyTick]): Dataset[PainUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PathRiskState, PainUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[PathRiskState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(PathRiskState(0.0, seen = false,
            0.0, 0L, Double.MaxValue, 0.0, 0.0, 0L, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach(t => st = pathRiskStep(st, t.value))
          state.update(st)
          if (st.nRets < 1) Iterator.empty
          else {
            val pain = jvm6(-st.sumDd / st.nDays.toDouble)
            val meanRet = jvm6(st.sumRet / st.nRets.toDouble)
            Iterator.single(PainUpd(assetId, st.nDays, pain, meanRet,
              if (pain == 0.0) None else Some(jvm6(meanRet / pain))))
          }
      }
  }

  case class RetRingState(last: Double, seen: Boolean, ring: Vector[Double])
  case class RollSharpePoint(asset_id: Long, date: java.sql.Date, ret: Double,
                             roll_sharpe: Option[Double])

  /** D178 `rollingSharpeStream` — streaming face of B70
    * `rolling_sharpe`: the 20-slot return ring, per-date emission. */
  def rollingSharpeStream(ticks: Dataset[DailyTick],
                          window: Int = 20): Dataset[RollSharpePoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RetRingState, RollSharpePoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RetRingState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(RetRingState(0.0, seen = false, Vector.empty))
          val out = Vector.newBuilder[RollSharpePoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = jvm6(t.value / st.last - 1)
              val ring = (st.ring :+ r).takeRight(window)
              if (ring.size >= 2) {
                val n = ring.size.toDouble
                val s = ring.foldLeft(0.0)(_ + _)
                val s2 = ring.foldLeft(0.0)((a, x) => a + x * x)
                val sd = math.sqrt(math.max((n * s2 - s * s) / (n * (n - 1)), 0.0))
                out += RollSharpePoint(assetId, t.date, r,
                  if (sd == 0.0) None else Some(jvm6((s / n) / sd)))
              }
              st = RetRingState(t.value, seen = true, ring)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class BetaStabState(ring: Vector[(Double, Double)], nB: Long,
                           s: Double, s2: Double)
  case class BetaStabUpd(asset_id: Long, n_betas: Long, mean_beta: Double,
                         beta_sd: Double)

  /** D179 `betaStabilityStream` — streaming face of B119
    * `beta_stability`: the rollingBetaStream ring regenerates each
    * day's windowed beta, then running (n, Σβ, Σβ²) summarize it —
    * only non-null betas count, exactly the batch filter. */
  def betaStabilityStream(ticks: Dataset[RetMktTick],
                          window: Int = 20): Dataset[BetaStabUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[BetaStabState, BetaStabUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[RetMktTick], state: GroupState[BetaStabState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(BetaStabState(Vector.empty, 0L, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val ring = (st.ring :+ ((t.ret, t.mkt_ret))).takeRight(window)
            var (nB, s, s2) = (st.nB, st.s, st.s2)
            if (ring.size >= 2) {
              val n = ring.size.toDouble
              var sa = 0.0; var sm = 0.0; var sp = 0.0; var sm2 = 0.0
              ring.foreach { case (a, _) => sa += a }
              ring.foreach { case (_, m) => sm += m }
              ring.foreach { case (a, m) => sp += a * m }
              ring.foreach { case (_, m) => sm2 += m * m }
              val den = n * sm2 - sm * sm
              if (den != 0.0) {
                val beta = jvm6((n * sp - sa * sm) / den)
                nB += 1; s += beta; s2 += beta * beta
              }
            }
            st = BetaStabState(ring, nB, s, s2)
          }
          state.update(st)
          if (st.nB < 2) Iterator.empty
          else {
            val n = st.nB.toDouble
            Iterator.single(BetaStabUpd(assetId, st.nB, jvm6(st.s / n),
              jvm6(math.sqrt(math.max((n * st.s2 - st.s * st.s) / (n * (n - 1)), 0.0)))))
          }
      }
  }

  case class HalfLifeState(last: Double, seen: Boolean, n: Long,
                           sx: String, sy: String, sxy: String, sx2: String)
  case class HalfLifeUpd(asset_id: Long, n_obs: Long, phi: Option[Double],
                         half_life: Option[Double])

  /** D172 `halfLifeStream` — streaming face of B80 `half_life`: the
    * OU regression sums carried as STRING-encoded BigInts (the batch
    * runs DECIMAL(38,0) — x·y products overflow int64 inside the
    * 100 TB envelope, and a wrapped sum is the r9 token-budget bug
    * class; BigInt parse/format per update is O(digits), constant in
    * practice). num/den convert to double exactly like the batch's
    * decimal→double cast.
    */
  def halfLifeStream(ticks: Dataset[DailyTick]): Dataset[HalfLifeUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[HalfLifeState, HalfLifeUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[HalfLifeState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(
            HalfLifeState(0.0, seen = false, 0L, "0", "0", "0", "0"))
          var (sx, sy, sxy, sx2) =
            (BigInt(st.sx), BigInt(st.sy), BigInt(st.sxy), BigInt(st.sx2))
          var n = st.n
          var last = st.last
          var seen = st.seen
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (seen) {
              val dp = jvm6(t.value - last)
              val x = BigInt(math.floor(last * 1000000.0 + 0.5).toLong)
              val y = BigInt(math.floor(dp * 1000000.0 + 0.5).toLong)
              n += 1; sx += x; sy += y; sxy += x * y; sx2 += x * x
            }
            last = t.value; seen = true
          }
          state.update(HalfLifeState(last, seen, n, sx.toString, sy.toString,
            sxy.toString, sx2.toString))
          if (n < 3) Iterator.empty
          else {
            val num = (BigInt(n) * sxy - sx * sy).toDouble
            val den = (BigInt(n) * sx2 - sx * sx).toDouble
            val phi = if (den == 0.0) None else Some(jvm6(num / den))
            Iterator.single(HalfLifeUpd(assetId, n, phi,
              phi.filter(p => p > -1 && p < 0)
                .map(p => jvm6(-0.693147 / math.log(1.0 + p)))))
          }
      }
  }

  case class RunsState(last: Double, seen: Boolean, prevSign: Long,
                       hasSign: Boolean, nPos: Long, nNeg: Long, runs: Long)
  case class RunsUpd(asset_id: Long, n_pos: Long, n_neg: Long, runs: Long,
                     e_runs: Double, z: Option[Double])

  /** D173 `runsTestStream` — streaming face of B82 `runs_test`: the
    * previous sign + three integer counters; zero returns are skipped
    * exactly as the batch filter drops them. */
  def runsTestStream(ticks: Dataset[DailyTick]): Dataset[RunsUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[RunsState, RunsUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[RunsState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(
            RunsState(0.0, seen = false, 0L, hasSign = false, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = jvm6(t.value / st.last - 1)
              if (r != 0.0) {
                val s = if (r > 0) 1L else 0L
                st = RunsState(t.value, seen = true, s, hasSign = true,
                  st.nPos + s, st.nNeg + (1L - s),
                  st.runs + (if (!st.hasSign || s != st.prevSign) 1L else 0L))
              } else st = st.copy(last = t.value)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.nPos < 1 || st.nNeg < 1) Iterator.empty
          else {
            val n = (st.nPos + st.nNeg).toDouble
            val p2 = 2.0 * st.nPos * st.nNeg
            val eRuns = 1.0 + p2 / n
            val v = p2 * (p2 - n) / (n * n * (n - 1))
            Iterator.single(RunsUpd(assetId, st.nPos, st.nNeg, st.runs,
              jvm6(eRuns),
              if (v <= 0.0) None else Some(jvm6((st.runs - eRuns) / math.sqrt(v)))))
          }
      }
  }

  case class UwState(peak: Double, nDays: Long, cur: Long, nEpisodes: Long,
                     maxUnder: Long)
  case class UwUpd(asset_id: Long, n_days: Long, n_episodes: Long,
                   max_underwater_days: Long, current_underwater_days: Long)

  /** D174 `underwaterDurationStream` — streaming face of B217
    * `underwater_duration`: (peak, current-run, episode counters) —
    * the gaps-and-islands drawdown calendar as O(1) state. */
  def underwaterDurationStream(ticks: Dataset[DailyTick]): Dataset[UwUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[UwState, UwUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[UwState]) =>
          var st = state.getOption.getOrElse(UwState(Double.MinValue, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val peak = math.max(st.peak, t.value)
            if (t.value < peak) {
              val cur = st.cur + 1
              st = UwState(peak, st.nDays + 1, cur,
                st.nEpisodes + (if (cur == 1) 1L else 0L),
                math.max(st.maxUnder, cur))
            } else st = UwState(peak, st.nDays + 1, 0L, st.nEpisodes, st.maxUnder)
          }
          state.update(st)
          if (st.nDays == 0) Iterator.empty
          else Iterator.single(UwUpd(assetId, st.nDays, st.nEpisodes,
            st.maxUnder, st.cur))
      }
  }

  case class GapStatState(prevClose: Double, seen: Boolean, n: Long,
                          nUp: Long, nDown: Long, sumMicro: Long, maxAbs: Long)
  case class GapStatUpd(asset_id: Long, n_days: Long, n_gap_up: Long,
                        n_gap_down: Long, mean_gap: Double, max_abs_gap: Double)

  /** D169 `gapStatsStream` — streaming face of B171 `gap_stats`:
    * yesterday's close + five integers of state; mean via Long `/`
    * (= Spark `div` truncation — gap sums go negative). */
  def gapStatsStream(bars: Dataset[OhlcStreamBar],
                     thresholdMicro: Long = 10000L): Dataset[GapStatUpd] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[GapStatState, GapStatUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[GapStatState]) =>
          var st = state.getOption.getOrElse(
            GapStatState(0.0, seen = false, 0L, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.seen && st.prevClose != 0.0) {
              val g = graft.operators.Micro.jvm6(b.open / st.prevClose - 1)
              val gm = math.round(g * 1e6)
              st = GapStatState(b.close, seen = true, st.n + 1,
                st.nUp + (if (gm > thresholdMicro) 1L else 0L),
                st.nDown + (if (gm < -thresholdMicro) 1L else 0L),
                st.sumMicro + gm, math.max(st.maxAbs, math.abs(gm)))
            } else st = st.copy(prevClose = b.close, seen = true)
          }
          state.update(st)
          if (st.n == 0) Iterator.empty
          else Iterator.single(GapStatUpd(assetId, st.n, st.nUp, st.nDown,
            (st.sumMicro / st.n).toDouble / 1e6, st.maxAbs.toDouble / 1e6))
      }
  }

  case class VovState(last: Double, seen: Boolean, ring: Vector[Double],
                      n: Long, s: Double, s2: Double)
  case class VovUpd(asset_id: Long, n_days: Long, mean_vol: Double,
                    vol_of_vol: Double)

  /** D170 `volOfVolStream` — streaming face of B90 `vol_of_vol`: the
    * 20-slot return ring regenerates each day's rolling vol exactly as
    * the batch frame fold does; the vol-of-vol sums then accumulate in
    * date order ≡ the batch's va array folds. */
  def volOfVolStream(ticks: Dataset[DailyTick], window: Int = 20): Dataset[VovUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[VovState, VovUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[VovState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(
            VovState(0.0, seen = false, Vector.empty, 0L, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = jvm6(t.value / st.last - 1)
              val ring = (st.ring :+ r).takeRight(window)
              if (ring.size >= 2) {
                val n = ring.size.toDouble
                val s1 = ring.foldLeft(0.0)(_ + _)
                val s2 = ring.foldLeft(0.0)((a, x) => a + x * x)
                val vol = jvm6(math.sqrt(math.max(
                  (n * s2 - s1 * s1) / (n * (n - 1)), 0.0)))
                st = VovState(t.value, seen = true, ring, st.n + 1,
                  st.s + vol, st.s2 + vol * vol)
              } else st = st.copy(last = t.value, ring = ring)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.n < 2) Iterator.empty
          else {
            val n = st.n.toDouble
            Iterator.single(VovUpd(assetId, st.n, jvm6(st.s / n),
              jvm6(math.sqrt(math.max((n * st.s2 - st.s * st.s) / (n * (n - 1)), 0.0)))))
          }
      }
  }

  case class UlcerState(ring: Vector[Double], dds: Vector[Option[Double]])
  case class UlcerPoint(asset_id: Long, date: java.sql.Date, value: Double,
                        dd: Option[Double], ulcer: Option[Double])

  /** D171 `ulcerStream` — streaming face of B93 `ulcer_index`: the
    * 14-slot value ring + its drawdown ring ARE the state; a null dd
    * (zero frame max — unreachable on positive prices) is simply
    * absent from the fold, exactly as batch `collect_list` skips
    * nulls from the frame array. */
  def ulcerStream(ticks: Dataset[DailyTick], window: Int = 14): Dataset[UlcerPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[UlcerState, UlcerPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[UlcerState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(UlcerState(Vector.empty, Vector.empty))
          val out = Vector.newBuilder[UlcerPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            val ring = (st.ring :+ t.value).takeRight(window)
            val rmax = ring.max
            val dd = if (rmax == 0.0) None
              else Some(jvm6(100.0 * (t.value - rmax) / rmax))
            val dds = (st.dds :+ dd).takeRight(window)
            val present = dds.flatten
            val ulcer =
              if (present.isEmpty) None
              else Some(jvm6(math.sqrt(
                present.foldLeft(0.0)((a, x) => a + x * x) / present.size)))
            out += UlcerPoint(assetId, t.date, t.value, dd, ulcer)
            st = UlcerState(ring, dds)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class CalBinState(last: Double, seen: Boolean, n: Vector[Long],
                         sum: Vector[Long], nUp: Vector[Long])
  case class DowSeasUpd(asset_id: Long, dow: Long, n_days: Long,
                        mean_ret: Double, n_up: Long)

  /** D161 `dowSeasonalityStream` — streaming face of B170
    * `dow_seasonality`: seven integer (n, Σmicro, n_up) bins ARE the
    * state; each update emits the present bins, the final emission
    * per (asset, dow) ≡ the batch row (Long `/` = Spark `div`
    * truncation — sums can be negative, so this is the contract that
    * matters). Spark's dayofweek (1=Sunday) replayed from the ISO
    * day-of-week.
    */
  def dowSeasonalityStream(ticks: Dataset[DailyTick]): Dataset[DowSeasUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[CalBinState, DowSeasUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[CalBinState]) =>
          var st = state.getOption.getOrElse(CalBinState(0.0, seen = false,
            Vector.fill(7)(0L), Vector.fill(7)(0L), Vector.fill(7)(0L)))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val rm = math.round(
                graft.operators.Micro.jvm6(t.value / st.last - 1) * 1e6)
              val dow = t.date.toLocalDate.getDayOfWeek.getValue % 7 // Sun=0
              st = CalBinState(t.value, seen = true,
                st.n.updated(dow, st.n(dow) + 1),
                st.sum.updated(dow, st.sum(dow) + rm),
                st.nUp.updated(dow, st.nUp(dow) + (if (rm > 0) 1L else 0L)))
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          (0 until 7).iterator.filter(st.n(_) > 0).map { d =>
            DowSeasUpd(assetId, d + 1L, st.n(d),
              (st.sum(d) / st.n(d)).toDouble / 1e6, st.nUp(d))
          }
      }
  }

  case class MonthBinState(last: Double, seen: Boolean, n: Vector[Long],
                           sum: Vector[Long])
  case class MonthSeasUpd(asset_id: Long, month: Long, n_days: Long,
                          mean_ret: Double)

  /** D162 `monthlySeasonalityStream` — streaming face of B34
    * `monthly_seasonality`: twelve integer (n, Σmicro) bins; the mean
    * replays the batch's round(sum/n) double rounding exactly. */
  def monthlySeasonalityStream(ticks: Dataset[DailyTick]): Dataset[MonthSeasUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[MonthBinState, MonthSeasUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[MonthBinState]) =>
          var st = state.getOption.getOrElse(MonthBinState(0.0, seen = false,
            Vector.fill(12)(0L), Vector.fill(12)(0L)))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val rm = math.round(
                graft.operators.Micro.jvm6(t.value / st.last - 1) * 1e6)
              val m = t.date.toLocalDate.getMonthValue - 1
              st = MonthBinState(t.value, seen = true,
                st.n.updated(m, st.n(m) + 1), st.sum.updated(m, st.sum(m) + rm))
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          (0 until 12).iterator.filter(st.n(_) > 0).map { m =>
            // HALF-AWAY-FROM-ZERO, not math.round (half-toward-+inf):
            // Spark's round() and DuckDB's round() both round -1.5 to
            // -2, and negative-mean months are common
            val q = st.sum(m).toDouble / st.n(m).toDouble
            val r = if (q >= 0) math.floor(q + 0.5) else math.ceil(q - 0.5)
            MonthSeasUpd(assetId, m + 1L, st.n(m), r / 1e6)
          }
      }
  }

  case class StreakState(last: Double, seen: Boolean, cur: Long,
                         nStreaks: Long, nUpDays: Long, longest: Long)
  case class StreakUpd(asset_id: Long, n_streaks: Long, n_up_days: Long,
                       longest_streak: Long)

  /** D163 `streaksStream` — streaming face of B173 `streaks`: the
    * current up-run plus three integer counters ARE the state — the
    * gaps-and-islands aggregate maintained online. */
  def streaksStream(ticks: Dataset[DailyTick]): Dataset[StreakUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[StreakState, StreakUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[StreakState]) =>
          var st = state.getOption.getOrElse(
            StreakState(0.0, seen = false, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              if (r > 0) {
                val cur = st.cur + 1
                st = StreakState(t.value, seen = true, cur,
                  st.nStreaks + (if (cur == 1) 1L else 0L),
                  st.nUpDays + 1, math.max(st.longest, cur))
              } else st = st.copy(last = t.value, cur = 0L)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.nStreaks == 0) Iterator.empty
          else Iterator.single(StreakUpd(assetId, st.nStreaks, st.nUpDays, st.longest))
      }
  }

  case class PatEntState(last: Double, seen: Boolean, s1: Long, s2: Long,
                         nSigns: Long, counts: Vector[Long])
  case class PatEntUpd(asset_id: Long, n_triplets: Long, n_patterns: Long,
                       entropy: Double)

  /** D160 `patternEntropyStream` — streaming face of B271
    * `pattern_entropy`: the last two signs + eight integer bins ARE
    * the state; the entropy recomputes per update with the Σc·ln c
    * fold in ascending code order (bins iterate 0..7, zero bins
    * skipped — exactly the batch's present-codes-ascending fold). */
  def patternEntropyStream(ticks: Dataset[DailyTick]): Dataset[PatEntUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[PatEntState, PatEntUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[PatEntState]) =>
          var st = state.getOption.getOrElse(
            PatEntState(0.0, seen = false, 0L, 0L, 0L, Vector.fill(8)(0L)))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              val s = if (r > 0) 1L else 0L
              val counts =
                if (st.nSigns >= 2) {
                  val code = (st.s2 * 4 + st.s1 * 2 + s).toInt
                  st.counts.updated(code, st.counts(code) + 1)
                } else st.counts
              st = PatEntState(t.value, seen = true, s, st.s1,
                st.nSigns + 1, counts)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          val n = st.counts.sum
          if (n < 8) Iterator.empty
          else {
            var sumclnc = 0.0
            var nPat = 0L
            var i = 0
            while (i < 8) {
              val c = st.counts(i)
              if (c > 0) { sumclnc += c.toDouble * math.log(c.toDouble); nPat += 1 }
              i += 1
            }
            Iterator.single(PatEntUpd(assetId, n, nPat,
              graft.operators.Micro.jvm6(math.log(n.toDouble) - sumclnc / n.toDouble)))
          }
      }
  }

  case class TailRingState(last: Double, seen: Boolean, ring: Vector[Double],
                           nDays: Long, nViol: Long, sumR: Double, sumE: Double)
  case class VarBtUpd(asset_id: Long, n_days: Long, n_viol: Long,
                      viol_pm: Long, nominal_pm: Long)

  /** D156 `varBacktestStream` — streaming face of B75 `var_backtest`:
    * the 20-slot prior-return ring IS the state (O(window), bounded);
    * each arrival tests against the ring's 2nd-smallest BEFORE
    * entering it — exactly the batch's (-20,-1) frame. */
  def varBacktestStream(ticks: Dataset[DailyTick], window: Int = 20,
                        k: Int = 2): Dataset[VarBtUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[TailRingState, VarBtUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[TailRingState]) =>
          var st = state.getOption.getOrElse(
            TailRingState(0.0, seen = false, Vector.empty, 0L, 0L, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = graft.operators.Micro.jvm6(t.value / st.last - 1)
              var (nD, nV) = (st.nDays, st.nViol)
              if (st.ring.size == window) {
                nD += 1
                if (r < st.ring.sorted.apply(k - 1)) nV += 1
              }
              st = TailRingState(t.value, seen = true,
                (st.ring :+ r).takeRight(window), nD, nV, 0.0, 0.0)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.nDays == 0) Iterator.empty
          else Iterator.single(VarBtUpd(assetId, st.nDays, st.nViol,
            st.nViol * 1000L / st.nDays, k.toLong * 1000 / window))
      }
  }

  case class EsBtUpd(asset_id: Long, n_days: Long, n_viol: Long,
                     mean_viol_ret: Option[Double], mean_pred_es: Option[Double],
                     es_ratio: Option[Double])

  /** D157 `esBacktestStream` — streaming face of B265 `es_backtest`:
    * the same prior-return ring plus the running violation sums
    * (date-ordered accumulation ≡ the batch's ordered fold over the
    * violation array). */
  def esBacktestStream(ticks: Dataset[DailyTick], window: Int = 20,
                       k: Int = 2): Dataset[EsBtUpd] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[TailRingState, EsBtUpd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DailyTick], state: GroupState[TailRingState]) =>
          import graft.operators.Micro.jvm6
          var st = state.getOption.getOrElse(
            TailRingState(0.0, seen = false, Vector.empty, 0L, 0L, 0.0, 0.0))
          rows.toSeq.sortBy(_.date.getTime).foreach { t =>
            if (st.seen && st.last != 0.0) {
              val r = jvm6(t.value / st.last - 1)
              var (nD, nV, sR, sE) = (st.nDays, st.nViol, st.sumR, st.sumE)
              if (st.ring.size == window) {
                nD += 1
                val sorted = st.ring.sorted
                if (r < sorted(k - 1)) {
                  nV += 1
                  sR += r
                  sE += jvm6(sorted.take(k).foldLeft(0.0)(_ + _) / k.toDouble)
                }
              }
              st = TailRingState(t.value, seen = true,
                (st.ring :+ r).takeRight(window), nD, nV, sR, sE)
            } else st = st.copy(last = t.value, seen = true)
          }
          state.update(st)
          if (st.nDays == 0) Iterator.empty
          else if (st.nViol == 0)
            Iterator.single(EsBtUpd(assetId, st.nDays, 0L, None, None, None))
          else {
            val mvr = jvm6(st.sumR / st.nViol.toDouble)
            val mpe = jvm6(st.sumE / st.nViol.toDouble)
            Iterator.single(EsBtUpd(assetId, st.nDays, st.nViol, Some(mvr),
              Some(mpe), if (mpe == 0.0) None else Some(jvm6(mvr / mpe))))
          }
      }
  }

  case class TwoBarState(h1: Double, l1: Double, h2: Double, l2: Double,
                         d2_ms: Long, nBars: Long)
  case class IslandPoint(asset_id: Long, date: java.sql.Date, kind: String,
                         low: Double, high: Double)

  /** D158 `islandReversalStream` — streaming face of B266
    * `island_reversals`: the last TWO bars are the state; bar t's
    * verdict emits when bar t+1 arrives (the pattern needs the exit
    * gap, so one bar of latency is intrinsic, not an implementation
    * artifact). First/last bars never emit — exactly the batch's
    * null-neighbor rows.
    */
  def islandReversalStream(bars: Dataset[OhlcStreamBar]): Dataset[IslandPoint] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[TwoBarState, IslandPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[OhlcStreamBar], state: GroupState[TwoBarState]) =>
          var st = state.getOption.getOrElse(TwoBarState(0.0, 0.0, 0.0, 0.0, 0L, 0L))
          val out = Vector.newBuilder[IslandPoint]
          rows.toSeq.sortBy(_.date.getTime).foreach { b =>
            if (st.nBars >= 2) {
              if (st.l2 > st.h1 && b.high < st.l2)
                out += IslandPoint(assetId, new java.sql.Date(st.d2_ms), "top",
                  st.l2, st.h2)
              else if (st.h2 < st.l1 && b.low > st.h2)
                out += IslandPoint(assetId, new java.sql.Date(st.d2_ms), "bottom",
                  st.l2, st.h2)
            }
            st = TwoBarState(st.h2, st.l2, b.high, b.low, b.date.getTime,
              math.min(st.nBars + 1, 3L))
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class AvwapState(month_ms: Long, cum_cents: Long, cum_ticks: Long)
  case class AvwapPoint(asset_id: Long, date: java.sql.Date,
                        month: java.sql.Date, n_ticks_mtd: Long, avwap: Double)

  /** D150 `anchoredVwapStream` — streaming face of B263
    * `anchored_vwap`: (month, Σcents, Σticks) — three BIGINTs of
    * state, reset when the month rolls. Emits the month-to-date VWAP
    * on every tick; the replay reduces to the last emission per
    * (asset, date) = the batch daily row. Cent precision by ONE
    * integer division — no scaled product anywhere, so nothing can
    * wrap (the r9 token-budget lesson applied by construction).
    */
  def anchoredVwapStream(ticks: Dataset[DatedTick]): Dataset[AvwapPoint] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[AvwapState, AvwapPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (assetId: Long, rows: Iterator[DatedTick], state: GroupState[AvwapState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[AvwapPoint]
          rows.toSeq.sortBy(t => (t.date.getTime, t.seq)).foreach { t =>
            val ld = t.date.toLocalDate.withDayOfMonth(1)
            val monthMs = java.sql.Date.valueOf(ld).getTime
            val cents = BigDecimal(t.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
              .*(100).toLongExact
            st =
              if (st == null || st.month_ms != monthMs) AvwapState(monthMs, cents, 1L)
              else AvwapState(monthMs, st.cum_cents + cents, st.cum_ticks + 1L)
            out += AvwapPoint(assetId, t.date, new java.sql.Date(monthMs),
              st.cum_ticks, (st.cum_cents / st.cum_ticks).toDouble / 100.0)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}
