package graft.operators

import graft.expressions.Kernels
import graft.operators.Micro.{u4, u6}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Financial/analytical queries over the TPC-H-ish tables and the panel —
  * the processing the reference extracts series *for* ("locates time
  * series … so that it can be processed in-memory", reference README.md).
  *
  * FP-determinism rule used everywhere a double is summed: cast each
  * addend to an exact decimal, sum exactly, cast the total back to
  * double (`dsum`). Engine-dependent reduction order then cannot change
  * the result, so the driver's hash compare vs DuckDB is stable — and on
  * a cluster the answer doesn't drift run-to-run with partitioning.
  */
object Analytics {

  /** Cornish–Fisher expansion constants (95% normal quantile and the
    * three polynomial coefficients), computed ONCE as Scala doubles so
    * [[cornishFisher]] and its oracle embed bit-identical literals.
    */
  object CfConst {
    val z: Double = -1.644854
    val c1: Double = (z * z - 1) / 6.0
    val c2: Double = (z * z * z - 3.0 * z) / 24.0
    val c3: Double = (2.0 * z * z * z - 5.0 * z) / 36.0
  }

  /** Exact sum of a double column: decimal-cast addends, exact decimal
    * sum, double result. Deterministic under any aggregation order.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact `price · (1 − disc) [· (1 + tax)]`: operands (all 2-decimal
    * in the data) become exact decimals BEFORE multiplying, so the
    * product is exact decimal arithmetic in every engine. Casting the
    * double *product* instead would hit engine-dependent double→decimal
    * midpoint rounding (Spark rounds the shortest string repr, DuckDB
    * the exact binary value) — observed as per-row ±1e-4 drift.
    */
  private val one = lit(1).cast(DecimalType(4, 2))
  def discPrice(price: Column, disc: Column): Column =
    price.cast(DecimalType(18, 2)) * (one - disc.cast(DecimalType(4, 2)))
  def charge(price: Column, disc: Column, tax: Column): Column =
    discPrice(price, disc) * (one + tax.cast(DecimalType(4, 2)))

  /** B1 `q1_pricing_summary` — TPC-H-Q1-style aggregate: one scan, one
    * keyed shuffle on a 6-ish-cardinality key, partial aggregation
    * map-side. The canonical "is pushdown + codegen working" probe.
    */
  def q1PricingSummary(lineitem: DataFrame, shipBefore: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(shipBefore).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).cast("double").as("sum_charge"),
        u4(avg(col("l_quantity"))).as("avg_qty"),
        u6(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** B2 `q3_top_orders` — TPC-H-Q3-style: the two dimension-side inputs
    * (filtered customer, filtered orders) are small relative to lineitem;
    * customer is broadcast so lineitem shuffles once (on l_orderkey ⨝
    * o_orderkey) — at 100 TB the fact table must never shuffle twice.
    */
  def q3TopOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  segment: String, cutoff: String, topN: Int): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val c = customer.filter(col("c_mktsegment") === segment).select("c_custkey")
    val o = orders.filter(col("o_orderdate") < cut).select("o_orderkey", "o_custkey", "o_orderdate")
    val l = lineitem.filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(topN)
  }

  /** B3 `star_join_agg` — supplier ⨝ nation ⨝ region rollup; both dims
    * broadcast (they are bounded: 25 nations, 5 regions at any scale).
    */
  def starJoinAgg(supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"), dsum(col("s_acctbal")).as("total_acctbal"))
      .orderBy(col("r_name"), col("n_name"))

  /** B4 `window_moving_avg` — per-asset 7-row trailing mean over the
    * tick stream. One shuffle on asset_id; frame is row-bounded so state
    * per task is O(frame).
    */
  def movingAvg(panel: DataFrame, frame: Int = 7): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("ts"), col("seq"))
      .rowsBetween(-(frame - 1), Window.currentRow)
    panel.select(col("asset_id"), col("ts"), col("seq"), col("value"))
      .withColumn("mavg", u6(avg(col("value")).over(w)))
      .orderBy(col("asset_id"), col("ts"), col("seq"))
  }

  /** B5 `window_returns` — day-over-day simple return per asset on the
    * LWW-compacted daily series (upsert_lww ∘ lag).
    */
  def dailyReturns(panel: DataFrame): DataFrame =
    dailyReturnsCore(panel).orderBy(col("asset_id"), col("date"))

  /** [[dailyReturns]] without the presentation sort — the input for
    * per-asset aggregates ([[kellyFraction]], [[tailRatio]]) whose
    * groupBy rides the SAME asset_id partitioning: inserting the
    * range-partitioned sort in between would cost two extra exchanges
    * for an order the aggregate immediately destroys.
    */
  private[graft] def dailyReturnsCore(panel: DataFrame): DataFrame = {
    // asset_id-only partitioning satisfies the LWW window AND the lag
    // window: the panel shuffles once.
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    daily
      // nullif-style zero guard: x/0 must be NULL (DuckDB semantics), not
      // an ANSI arithmetic error; NULL returns are filtered below.
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .select(col("asset_id"), col("date"), col("value"), col("ret"))
  }

  /** B19 `ewma` — exponentially-weighted moving average of the LWW
    * daily series over a `span`-row lookback.
    *
    * Cross-engine bit-exactness by construction: the frame's values are
    * collected IN FRAME ORDER (deterministic — date is unique per asset
    * after LWW) and both the weighted sum and the weight total are
    * HORNER folds (`acc·w + x`) — a fixed sequence of adds/multiplies
    * with no `pow` (JVM and C libm `pow` can differ in the last ulp), no
    * order-sensitive reduction. The DuckDB oracle replays the identical
    * fold via `list_reduce`.
    */
  def ewma(panel: DataFrame, alpha: Double = 0.1, span: Int = 60): DataFrame = {
    val w = 1.0 - alpha
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    daily
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("s", Kernels.seqFold(col("arr"), "horner", w))
      .withColumn("nw", Kernels.seqFold(col("arr"), "horner_count", w))
      .withColumn("ewma", u6(col("s") / col("nw")))
      .select(col("asset_id"), col("date"), col("value"), col("ewma"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B20 `donchian` — N-day Donchian channel over the LWW daily series:
    * rolling high/low plus the close's position within the channel.
    * min/max are order-insensitive, so the oracle is exact without any
    * decimal machinery; same single-shuffle shape as [[drawdown]].
    */
  def donchian(panel: DataFrame, window: Int = 20): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    daily
      .withColumn("ch_high", max(col("value")).over(frame))
      .withColumn("ch_low", min(col("value")).over(frame))
      .withColumn("ch_pos", u6(
        (col("value") - col("ch_low")) /
          when(col("ch_high") === col("ch_low"), lit(null))
            .otherwise(col("ch_high") - col("ch_low"))))
      .select(col("asset_id"), col("date"), col("value"),
        col("ch_high"), col("ch_low"), col("ch_pos"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B6 `resample_ohlc` — daily bar per asset: open/close via first/last
    * knowledge order, high/low/count via plain agg. Two row_numbers +
    * one group-by = single shuffle on the group key (window and agg
    * share (asset_id, date) partitioning).
    */
  def resampleOhlc(panel: DataFrame): DataFrame =
    dailyBars(panel).orderBy(col("asset_id"), col("date"))

  /** The un-sorted daily-bar aggregate behind [[resampleOhlc]] — also
    * the input to [[atr]]/[[stochastic]]/[[obv]], which re-window by
    * asset_id and would otherwise pay for a presentation sort that the
    * next exchange immediately destroys.
    */
  private[graft] def dailyBars(panel: DataFrame): DataFrame = {
    val wAsc = Window.partitionBy(col("asset_id"), col("date")).orderBy(col("ts").asc, col("seq").asc)
    val wDesc = Window.partitionBy(col("asset_id"), col("date")).orderBy(col("ts").desc, col("seq").desc)
    panel
      .withColumn("rn_a", row_number().over(wAsc))
      .withColumn("rn_d", row_number().over(wDesc))
      .groupBy(col("asset_id"), col("date"))
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_ticks"))
  }

  /** B15 `drawdown` — peak-to-trough drawdown of the LWW daily series:
    * running max per asset in date order, drawdown = value/peak − 1.
    * One shuffle on asset_id; running max is order-insensitive-safe
    * (max, not a float sum), so cross-engine determinism is free.
    */
  def drawdown(panel: DataFrame): DataFrame = {
    // One shuffle, not two: hash-partitioning by asset_id alone
    // satisfies BOTH the LWW window's (asset_id, date) clustering and
    // the running-max window's (asset_id) clustering, so the panel
    // moves once.
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val runW = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("peak", max(col("value")).over(runW))
      .withColumn("drawdown",
        u6(col("value") / when(col("peak") === 0, lit(null)).otherwise(col("peak")) - 1))
      .select(col("asset_id"), col("date"), col("value"), col("peak"), col("drawdown"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B16 `xsec_rank` — cross-sectional rank per effective date: each
    * asset's daily LWW value ranked within its date (desc, asset_id
    * tie-break → total order), plus the percentile position. The
    * classic quant screen: one shuffle on date, window + count share
    * the partitioning.
    */
  def xsecRank(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel)
    val w = Window.partitionBy(col("date")).orderBy(col("value").desc, col("asset_id"))
    val n = count(lit(1)).over(Window.partitionBy(col("date")))
    daily
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("pct_rank",
        u6((col("rank") - 1).cast("double") /
          when(n === 1, lit(null)).otherwise((n - 1).cast("double"))))
      .select(col("asset_id"), col("date"), col("value"), col("rank"), col("pct_rank"))
      .orderBy(col("date"), col("rank"))
  }

  /** B17 `resample_monthly` — monthly bar per asset from the LWW daily
    * series: open/close by date order within (asset, month), high/low/
    * count by plain agg — the month-end snapshot a portfolio pipeline
    * rolls up to. Same single-shuffle shape as [[resampleOhlc]].
    */
  def resampleMonthly(panel: DataFrame): DataFrame = {
    // asset_id-only partitioning satisfies the LWW window, both monthly
    // windows and the final (asset_id, month) aggregate: one shuffle.
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("month", date_format(col("date"), "yyyy-MM"))
    val wAsc = Window.partitionBy(col("asset_id"), col("month")).orderBy(col("date").asc)
    val wDesc = Window.partitionBy(col("asset_id"), col("month")).orderBy(col("date").desc)
    daily
      .withColumn("rn_a", row_number().over(wAsc))
      .withColumn("rn_d", row_number().over(wDesc))
      .groupBy(col("asset_id"), col("month"))
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        max(when(col("rn_d") === 1, col("date"))).as("month_end_date"),
        count(lit(1)).as("n_days"))
      .orderBy(col("asset_id"), col("month"))
  }

  /** B177 `resample_weekly` — weekly OHLC resample, [[resampleMonthly]]
    * at ISO-week granularity (date_trunc('week') = Monday start in
    * both engines): the bar feed a medium-horizon indicator stack
    * consumes. Same single-shuffle shape.
    */
  def resampleWeekly(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("week_start", date_trunc("week", col("date")).cast("date"))
    val wAsc = Window.partitionBy(col("asset_id"), col("week_start")).orderBy(col("date").asc)
    val wDesc = Window.partitionBy(col("asset_id"), col("week_start")).orderBy(col("date").desc)
    daily
      .withColumn("rn_a", row_number().over(wAsc))
      .withColumn("rn_d", row_number().over(wDesc))
      .groupBy(col("asset_id"), col("week_start"))
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_days"))
      .orderBy(col("asset_id"), col("week_start"))
  }

  /** B178 `price_percentile` — where today's value sits in its own
    * trailing `window`-day distribution, as an exact integer per-mille
    * ((1000·#{arr ≤ v}) div n — an order statistic, no interpolation,
    * no float compare beyond double equality on identical parquet
    * values). The mean-reversion/breakout conditioning variable next
    * to [[distFromHigh]]'s extreme-distance view.
    */
  def pricePercentile(panel: DataFrame, window: Int = 252): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    daily
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("n", size(col("arr")).cast("long"))
      .withColumn("n_le",
        size(filter(col("arr"), x => x <= col("value"))).cast("long"))
      .withColumn("pctl_pm", expr("(1000 * n_le) div n"))
      .select(col("asset_id"), col("date"), col("value"),
        col("n"), col("n_le"), col("pctl_pm"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B179 `underwater_duration` — drawdown DURATION summary per asset
    * (drawdown_episodes' time axis): longest underwater streak, episode
    * count, and whether/how long the series ends underwater — classic
    * gaps-and-islands over the dd < 0 flag, all integer day counts.
    */
  def underwaterDuration(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val runW = byAsset.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = daily
      .withColumn("peak", max(col("value")).over(runW))
      .withColumn("uw", col("value") < col("peak"))
      .withColumn("streak_id", sum(when(col("uw"), 0L).otherwise(1L)).over(runW))
    val episodes = marked.filter(col("uw"))
      .groupBy(col("asset_id"), col("streak_id"))
      .agg(count(lit(1)).as("days"), max(col("date")).as("ep_end"))
    val lastDates = marked.groupBy(col("asset_id"))
      .agg(max(col("date")).as("last_date"), count(lit(1)).as("n_days"))
    lastDates.join(
      episodes.groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_episodes"),
          max(col("days")).as("max_underwater_days"),
          max_by(col("days"), col("ep_end")).as("last_ep_days"),
          max(col("ep_end")).as("last_ep_end")),
      Seq("asset_id"), "left")
      .withColumn("n_episodes", coalesce(col("n_episodes"), lit(0L)))
      .withColumn("max_underwater_days", coalesce(col("max_underwater_days"), lit(0L)))
      .withColumn("current_underwater_days",
        when(col("last_ep_end") === col("last_date"), col("last_ep_days"))
          .otherwise(lit(0L)))
      .select(col("asset_id"), col("n_days"), col("n_episodes"),
        col("max_underwater_days"), col("current_underwater_days"))
      .orderBy(col("asset_id"))
  }

  /** B180 `range_expansion` — NR7-style range regime counts: a day is a
    * CONTRACTION (NR7) when its high-low range is strictly below all
    * six prior ranges, an EXPANSION when strictly above — the
    * breakout-setup frequency per asset. Strict comparisons, integer
    * counts, only full-window days measured.
    */
  def rangeExpansion(panel: DataFrame, lookback: Int = 6): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prior = byAsset.rowsBetween(-lookback, -1)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("rng", col("high") - col("low"))
      .withColumn("arr", collect_list(col("rng")).over(prior))
      .filter(size(col("arr")) === lookback)
      .withColumn("nr", col("rng") < array_min(col("arr")))
      .withColumn("xp", col("rng") > array_max(col("arr")))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("nr"), 1L).otherwise(0L)).as("n_contraction"),
        sum(when(col("xp"), 1L).otherwise(0L)).as("n_expansion"))
      .orderBy(col("asset_id"))
  }

  /** B181 `ibs` — internal bar strength: mean of (close − low) /
    * (high − low) per asset (where the close sits inside the day's
    * range — a mean-reversion conditioning classic). Per-bar values
    * u6 then micro-integer summed (order-insensitive exact mean);
    * flat bars (high = low) are counted but excluded from the mean.
    */
  def ibs(panel: DataFrame): DataFrame =
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("v", when(col("high") === col("low"), lit(null))
        .otherwise(u6((col("close") - col("low")) / (col("high") - col("low")))))
      .withColumn("v_micro", round(col("v") * 1e6).cast("long"))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_flat"),
        count(col("v")).as("n_measured"),
        sum(col("v_micro")).as("sum_micro"))
      .withColumn("mean_ibs", when(col("n_measured") === 0, lit(null))
        .otherwise(expr("sum_micro div n_measured").cast("double") / 1e6))
      .select(col("asset_id"), col("n_days"), col("n_flat"),
        col("n_measured"), col("mean_ibs"))
      .orderBy(col("asset_id"))

  /** B182 `weekly_consistency` — sign consistency of ISO-week
    * close-to-close moves per asset: positive-week share and the
    * longest positive/negative runs (gaps-and-islands over the sign
    * series) — the "does it grind or chop" number behind a trend
    * allocation. All integer; flat weeks form their own runs and are
    * excluded from both extremes.
    */
  def weeklyConsistency(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("week_start"))
    val runFrame = byAsset.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("close"), 1).over(byAsset)
    val signed = resampleWeekly(panel)
      .withColumn("sgn", when(prev.isNull || prev === 0, lit(null))
        .otherwise(signum(col("close") - prev).cast("int")))
      .filter(col("sgn").isNotNull)
    val runs = signed
      .withColumn("chg", when(lag(col("sgn"), 1).over(byAsset).isNull ||
        lag(col("sgn"), 1).over(byAsset) =!= col("sgn"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("chg")).over(runFrame))
      .groupBy(col("asset_id"), col("grp"))
      .agg(max(col("sgn")).as("sgn"), count(lit(1)).as("len"))
    runs.groupBy(col("asset_id"))
      .agg(sum(col("len")).as("n_weeks"),
        sum(when(col("sgn") === 1, col("len")).otherwise(0L)).as("n_pos_weeks"),
        coalesce(max(when(col("sgn") === 1, col("len"))), lit(0L)).as("longest_pos_run"),
        coalesce(max(when(col("sgn") === -1, col("len"))), lit(0L)).as("longest_neg_run"))
      .withColumn("pos_pm", expr("(1000 * n_pos_weeks) div n_weeks"))
      .select(col("asset_id"), col("n_weeks"), col("n_pos_weeks"),
        col("pos_pm"), col("longest_pos_run"), col("longest_neg_run"))
      .orderBy(col("asset_id"))
  }

  /** B7 `topk_per_group` — rank ≤ k per group with total tie-break. */
  def topKPerGroup(events: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
    events.select(col("event_type"), col("event_id"), col("user_id"), col("value"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("event_type"), col("rk"))
  }

  /** B12 `gap_fill` — forward-fill the daily LWW series over each
    * asset's full calendar span (kdb/questdb FILL): dates with no ticks
    * carry the previous value. Calendar generation is per-asset
    * `sequence(d0, d1)` (no driver loop); the fill is one
    * `last(ignoreNulls)` window on the natural key.
    */
  def gapFill(panel: DataFrame): DataFrame = {
    // asset_id-only partitioning satisfies the LWW window, the spans
    // aggregate, both sides of the calendar join (subset co-partition)
    // and the forward-fill window: the panel shuffles once.
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .select(col("asset_id"), col("date"), col("value"))
    val spans = daily.groupBy(col("asset_id"))
      .agg(min(col("date")).as("d0"), max(col("date")).as("d1"))
    val cal = spans.select(col("asset_id"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("date"))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("asset_id", "date"), "left")
      .withColumn("value_ff", last(col("value"), ignoreNulls = true).over(w))
      .withColumn("is_filled", col("value").isNull)
      .select(col("asset_id"), col("date"), col("value_ff"), col("is_filled"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B13 `bars_5min` — intraday resample: OHLC+count per asset per
    * 5-minute bucket. Buckets are integer epoch arithmetic (no
    * timezone/format round-trips); same single-shuffle shape as the
    * daily resample.
    */
  def bars5Min(panel: DataFrame): DataFrame = {
    val bucket = expr("(unix_timestamp(ts) div 300) * 300").as("bucket_s")
    val base = panel.select(col("asset_id"), bucket, col("ts"), col("value"), col("seq"))
    val wAsc = Window.partitionBy(col("asset_id"), col("bucket_s")).orderBy(col("ts").asc, col("seq").asc)
    val wDesc = Window.partitionBy(col("asset_id"), col("bucket_s")).orderBy(col("ts").desc, col("seq").desc)
    base
      .withColumn("rn_a", row_number().over(wAsc))
      .withColumn("rn_d", row_number().over(wDesc))
      .groupBy(col("asset_id"), col("bucket_s"))
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy(col("asset_id"), col("bucket_s"))
  }

  /** B39 `vwap` — volume-weighted average price per supplier-month over
    * the lineitem flow (the execution-quality benchmark price; B26's
    * `twap` weights by time, this weights by size). Both sums are exact
    * decimals (`dsum`) so the single IEEE division + round is
    * bit-identical cross-engine regardless of aggregation order. One
    * keyed shuffle, map-side partials — the canonical 100 TB aggregate
    * shape.
    */
  def vwap(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumn("month", date_format(col("l_shipdate"), "yyyy-MM"))
      // integer cents via exact decimal scaling (a double ·100 would
      // carry FP error into the "integer"): the whole VWAP then stays
      // in integer arithmetic — `round(Σp/Σq, 6)` would instead hand the
      // half-boundary to engine-dependent double rounding (Spark rounds
      // the shortest decimal repr, DuckDB the exact binary value;
      // observed diverging on 1060.2115625 at sf0.01).
      .withColumn("qty_c", expr("cast(cast(l_quantity as decimal(18,2)) * 100 as bigint)"))
      .withColumn("price_c", expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"))
      .groupBy(col("l_suppkey"), col("month"))
      .agg(
        sum(col("qty_c")).as("volume_c"),
        sum(col("price_c")).as("notional_c"),
        count(lit(1)).as("n_lines"))
      .withColumn("vwap_micro",
        expr("(notional_c * 1000000) div nullif(volume_c, 0)"))
      .select(col("l_suppkey"), col("month"),
        (col("volume_c") / 100.0).as("volume"),
        (col("notional_c") / 100.0).as("notional"),
        col("n_lines"),
        (col("vwap_micro") / 1e6).as("vwap"))
      .orderBy(col("l_suppkey"), col("month"))

  /** B9 `quantiles` — exact interpolated percentiles per group (the
    * risk-metric shape: p50/p95/p99 of the tick value). Exact
    * `percentile` (not approx sketches) so the oracle can match; swap to
    * `percentile_approx` at 100 TB where a t-digest's bounded memory
    * beats a per-group sort.
    */
  def quantiles(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        u6(expr("percentile(value, 0.5)")).as("p50"),
        u6(expr("percentile(value, 0.95)")).as("p95"),
        u6(expr("percentile(value, 0.99)")).as("p99"))
      .orderBy(col("event_type"))

  /** B18 `winsorize` — clamp each event's value to its group's
    * [p05, p95] (outlier capping before any moment-based stat). The
    * per-group bounds are a tiny aggregate broadcast back onto the
    * stream — at scale, swap `percentile` for `percentile_approx` and
    * the join shape is unchanged.
    */
  def winsorize(events: DataFrame, lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val bounds = events.groupBy(col("event_type"))
      .agg(
        u6(expr(s"percentile(value, $lo)")).as("p_lo"),
        u6(expr(s"percentile(value, $hi)")).as("p_hi"))
    events.select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(bounds), Seq("event_type"))
      .withColumn("value_w",
        u6(least(greatest(col("value"), col("p_lo")), col("p_hi"))))
      .select(col("event_id"), col("event_type"), col("value"), col("p_lo"), col("p_hi"), col("value_w"))
      .orderBy(col("event_id"))
  }

  /** B10 `histogram` — fixed-width value binning per group; one
    * map-side-combinable aggregation.
    */
  def histogram(events: DataFrame, binWidth: Double): DataFrame =
    events
      .groupBy(col("event_type"), floor(col("value") / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bin"))

  /** B11 `corr_qty_price` — Pearson correlation + covariance of quantity
    * and price per flag (portfolio-analytics shape). Co-moment
    * accumulation differs in order across engines → round(6).
    */
  def corrQtyPrice(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        u6(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
        u4(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("covar_qp"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** B14 `sketches` — bounded-memory approximate aggregates next to
    * their exact counterparts: HLL++ distinct counts
    * (`approx_count_distinct`, rsd 0.05) and t-digest percentiles
    * (`percentile_approx`, accuracy 1000). At 100 TB these replace the
    * exact forms (B9's per-group sort, count-distinct's two-phase
    * shuffle) with mergeable fixed-size state.
    *
    * Oracle contract: the raw estimates are engine-specific, so the
    * CHECKED output carries the exact stats (hash-exact cross-engine)
    * plus tolerance verdicts computed against them — `hll_ok` = HLL
    * estimate within 3·rsd relative error of the exact distinct count,
    * `tdigest_ok` = t-digest median inside the exact [p49.5, p50.5]
    * value band (accuracy 1000 bounds rank error at 0.1%, 5× margin).
    * The DuckDB oracle recomputes the exact columns and emits literal
    * TRUE for the verdicts — a broken sketch flips a boolean and fails
    * the driver's hash compare, upgrading the old rows-only ◐ to a real
    * checked row.
    */
  def sketches(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        count_distinct(col("user_id")).as("exact_distinct"),
        approx_count_distinct(col("user_id")).as("hll_distinct"),
        u6(expr("percentile(value, 0.5)")).as("exact_p50"),
        expr("percentile_approx(value, 0.5, 1000)").as("tdigest_p50"),
        expr("percentile(value, 0.495)").as("p_lo"),
        expr("percentile(value, 0.505)").as("p_hi"))
      .select(col("event_type"), col("exact_distinct"), col("exact_p50"),
        (abs(col("hll_distinct") - col("exact_distinct")).cast("double") <=
          lit(0.15) * col("exact_distinct").cast("double")).as("hll_ok"),
        (col("tdigest_p50") >= col("p_lo") && col("tdigest_p50") <= col("p_hi"))
          .as("tdigest_ok"))
      .orderBy(col("event_type"))

  /** C13 `json_props` — semi-structured column handling: parse the
    * `props` JSON, aggregate the typed field per group. `from_json` with
    * an explicit schema (codegen'd Jackson parse) — at scale prefer
    * parsing once into a materialized column over repeated
    * `get_json_object` calls.
    */
  def jsonProps(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).cast("long").as("sum_k"),
        count_distinct(col("k")).as("n_distinct_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** B8 `sessionize` — gap-based sessions per user: flag gaps > `gapSec`
    * via lag, session id = running sum of flags, then per-session
    * aggregate. Batch shape of streaming session windows; both shuffles
    * are on user_id so AQE plans them as one exchange reuse.
    * Timestamp deltas compare raw epoch doubles (µs-exact in both
    * engines) — no truncation at the gap boundary.
    */
  def sessionize(events: DataFrame, gapSec: Double): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap", col("ts").cast("double") - lag(col("ts").cast("double"), 1).over(w))
      .withColumn("new_s", when(col("gap").isNull || col("gap") > gapSec, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** B35 `advance_decline` — market breadth per date: advancing /
    * declining / flat asset counts and the cumulative advance-decline
    * line. All-integer (counts + running integer sum) → exact in any
    * engine with no fold machinery at all.
    */
  def advanceDecline(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val runW = Window.orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("date"))
      .agg(
        sum(when(col("ret") > 0, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("ret") < 0, 1L).otherwise(0L)).as("n_down"),
        sum(when(col("ret") === 0, 1L).otherwise(0L)).as("n_flat"))
      .withColumn("ad_line", sum(col("n_up") - col("n_down")).over(runW))
      .select(col("date"), col("n_up"), col("n_down"), col("n_flat"), col("ad_line"))
      .orderBy(col("date"))
  }

  /** B36 `rolling_beta` — windowed CAPM beta per (asset, date): the
    * co-moment sums of [[beta]] over a row-bounded frame of the joined
    * (ret, mkt_ret) series — frame-ordered fold arrays per row, so the
    * time-varying beta is bit-exact like everything else. Frames are
    * `window`-bounded → per-row cost O(window).
    */
  def rollingBeta(panel: DataFrame, window: Int = 20): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
    val mkt = rets
      .groupBy(col("date"))
      .agg(transform(array_sort(collect_list(struct(col("asset_id"), col("ret")))),
        s => s("ret")).as("marr"))
      .select(col("date"),
        u6(foldSum(col("marr")) / size(col("marr")).cast("double")).as("mkt_ret"))
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val n = col("n")
    rets.select(col("asset_id"), col("date"), col("ret"))
      .join(broadcast(mkt), Seq("date"))
      .withColumn("ra", collect_list(col("ret")).over(frame))
      .withColumn("rm", collect_list(col("mkt_ret")).over(frame))
      .withColumn("rp", collect_list(col("ret") * col("mkt_ret")).over(frame))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("sa", foldSum(col("ra")))
      .withColumn("sm", foldSum(col("rm")))
      .withColumn("sp", foldSum(col("rp")))
      .withColumn("sm2", foldSumSq(col("rm")))
      .withColumn("den", n * col("sm2") - col("sm") * col("sm"))
      .withColumn("beta", u6((n * col("sp") - col("sa") * col("sm")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), col("date"), col("ret"), col("mkt_ret"), col("beta"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B197 `rolling_corr` — rolling Pearson correlation of each asset's
    * daily return against the equal-weight market return over a
    * `window`-day frame: [[rollingBeta]]'s directional companion (beta
    * scales exposure; correlation measures how RELIABLY the asset
    * tracks the market — the diversification input). Identical plan
    * shape: one asset_id shuffle carries the LWW collapse, the return
    * lag, and the frame arrays; the per-date market mean broadcasts
    * back. NULL when either frame variance term is ≤ 0 (constant
    * series), guarded identically on both engines.
    */
  /** Per-asset daily returns joined with the equal-weight market
    * return of the same date — the (asset_id, date, ret, mkt_ret)
    * relation [[rollingCorr]] and its streaming feed share (the
    * rollingBeta shape).
    */
  private[graft] def retsWithMarket(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
    val mkt = rets
      .groupBy(col("date"))
      .agg(transform(array_sort(collect_list(struct(col("asset_id"), col("ret")))),
        s => s("ret")).as("marr"))
      .select(col("date"),
        u6(foldSum(col("marr")) / size(col("marr")).cast("double")).as("mkt_ret"))
    rets.select(col("asset_id"), col("date"), col("ret"))
      .join(broadcast(mkt), Seq("date"))
  }

  def rollingCorr(panel: DataFrame, window: Int = 20): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val n = col("n")
    retsWithMarket(panel)
      .withColumn("ra", collect_list(col("ret")).over(frame))
      .withColumn("rm", collect_list(col("mkt_ret")).over(frame))
      .withColumn("rp", collect_list(col("ret") * col("mkt_ret")).over(frame))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("sa", foldSum(col("ra")))
      .withColumn("sm", foldSum(col("rm")))
      .withColumn("sp", foldSum(col("rp")))
      .withColumn("sa2", foldSumSq(col("ra")))
      .withColumn("sm2", foldSumSq(col("rm")))
      .withColumn("vna", n * col("sa2") - col("sa") * col("sa"))
      .withColumn("vnm", n * col("sm2") - col("sm") * col("sm"))
      .withColumn("corr", u6((n * col("sp") - col("sa") * col("sm")) /
        when(col("vna") <= 0 || col("vnm") <= 0, lit(null))
          .otherwise(sqrt(col("vna") * col("vnm")))))
      .select(col("asset_id"), col("date"), col("ret"), col("mkt_ret"), col("corr"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B199 `rolling_var` — ROLLING historical VaR/CVaR per asset: B33
    * [[varCvar]] localized to a trailing `window`-day return frame, the
    * risk number a desk actually marks daily (full-history VaR goes
    * stale after a regime change). Tail size k = ⌈q·n⌉ over the SORTED
    * frame (q = 0.25 so small frames still have k ≥ 2 — integer cut,
    * no interpolation ambiguity); frames shorter than `minN` emit
    * nothing. Same single asset_id shuffle as the other rolling ops;
    * the frame sort is per row over ≤ `window` elements.
    */
  def rollingVar(panel: DataFrame, window: Int = 20, q: Double = 0.25,
                 minN: Int = 8): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("ra", array_sort(collect_list(col("ret")).over(frame)))
      .withColumn("n", size(col("ra")))
      .filter(col("n") >= minN)
      .withColumn("k", ceil(col("n").cast("double") * lit(q)).cast("int"))
      .withColumn("tail", slice(col("ra"), lit(1), col("k")))
      .withColumn("var_q", element_at(col("ra"), col("k")))
      .withColumn("cvar", u6(foldSum(col("tail")) / col("k").cast("double")))
      .select(col("asset_id"), col("date"), col("n").cast("long").as("n_days"),
        col("k").cast("long").as("n_tail"), col("var_q"), col("cvar"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B33 `var_cvar` — historical Value-at-Risk per asset: the worst
    * ⌈q·n⌉ daily returns define the tail; VaR = the best of them (the
    * q-quantile by the "lower" convention — integer cut, no
    * interpolation ambiguity), CVaR = their fold-exact mean. Sorting
    * the return array makes every choice deterministic; ties are
    * resolved by value order, which is all the output depends on.
    */
  def varCvar(panel: DataFrame, q: Double = 0.05): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val k = ceil(size(col("ra")).cast("double") * q).cast("int")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(col("ret"))).as("ra"))
      .withColumn("k", k)
      .filter(col("k") >= 1)
      .withColumn("tail", slice(col("ra"), lit(1), col("k")))
      .withColumn("var", element_at(col("tail"), col("k")))
      .withColumn("cvar", u6(foldSum(col("tail")) / col("k").cast("double")))
      .select(col("asset_id"), size(col("ra")).cast("long").as("n_days"),
        col("k").cast("long").as("n_tail"), col("var"), col("cvar"))
      .orderBy(col("asset_id"))
  }

  /** B34 `seasonality` — mean daily return by day-of-week (Spark's
    * 1=Sunday..7 convention; the oracle maps DuckDB's 0-based
    * `dayofweek` with +1) per asset — turn-of-week effect screen.
    *
    * The mean is computed in INTEGER MICRO-UNITS: 6-decimal returns
    * become exact integers, the group sum is an order-insensitive
    * integer sum (no fold arrays needed), and `round(sum/n)` rounds a
    * quotient that is either dyadic-exact (a true half rounds
    * away-from-zero identically in both engines) or safely off the
    * boundary. A plain `round(avg(ret), 6)` FAILS cross-engine here:
    * small group sizes (n≈4) park sums/4 exactly on 7th-decimal
    * halves, where Spark's shortest-repr HALF_UP and DuckDB's
    * exact-binary rounding disagree by 1e-6 (observed on 3 of 1050
    * groups).
    */
  def seasonality(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("ret_micro", round(col("ret") * 1e6).cast("long"))
      .withColumn("dow", dayofweek(col("date")).cast("long"))
      .groupBy(col("asset_id"), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("ret_micro")).as("sum_micro"))
      .withColumn("mean_ret",
        round(col("sum_micro").cast("double") / col("n_days").cast("double")).cast("long")
          .cast("double") / lit(1e6))
      .select(col("asset_id"), col("dow"), col("n_days"), col("mean_ret"))
      .orderBy(col("asset_id"), col("dow"))
  }

  /** B94 `r_squared` — R² of the market-model regression: the squared
    * asset↔market return correlation, i.e. the FRACTION of an asset's
    * variance that is systematic. The companion [[beta]]/[[treynor]]
    * need: a high beta with a low R² is noise, not exposure. Same
    * single-shuffle fold shape and 6-dec rounding as the family.
    */
  def rSquared(panel: DataFrame): DataFrame = {
    val rets = dailyReturns(panel)
    val n = col("n")
    rets.select(col("asset_id"), col("date"), col("ret"))
      .join(broadcast(marketReturns(rets)), Seq("date"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("mkt_ret")))).as("h"))
      .withColumn("ra", transform(col("h"), s => s("ret")))
      .withColumn("rm", transform(col("h"), s => s("mkt_ret")))
      .withColumn("rp", transform(col("h"), s => s("ret") * s("mkt_ret")))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("sa", foldSum(col("ra")))
      .withColumn("sm", foldSum(col("rm")))
      .withColumn("sp", foldSum(col("rp")))
      .withColumn("sa2", foldSumSq(col("ra")))
      .withColumn("sm2", foldSumSq(col("rm")))
      .withColumn("den",
        (n * col("sa2") - col("sa") * col("sa")) * (n * col("sm2") - col("sm") * col("sm")))
      .withColumn("cov", n * col("sp") - col("sa") * col("sm"))
      .withColumn("r2", u6(col("cov") * col("cov") /
        when(col("den") <= 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), n.cast("long").as("n_days"), col("r2"))
      .orderBy(col("asset_id"))
  }

  /** B93 `capture_ratio` — up/down capture vs the equal-weight market,
    * split at the market's MEDIAN day (not zero: on drift-dominated
    * series "down days" can be empty — the same degeneracy
    * [[downsideBeta]] sidesteps — while the median split always yields
    * both regimes): capture = Σ asset ret / Σ market ret within each
    * half, the standard "how much of the market's good/bad days do I
    * keep" pair. Ratio of exact micro-integer sums — determinism is
    * free; the median is an exact interpolating percentile computed
    * once over the tiny per-date market table.
    */
  def captureRatio(panel: DataFrame): DataFrame = {
    val rets = dailyReturns(panel)
    val w = Window.partitionBy()
    val mkt = marketReturns(rets)
      .withColumn("med", expr("percentile(mkt_ret, 0.5)").over(w))
    rets.join(broadcast(mkt), Seq("date"))
      .withColumn("is_down", col("mkt_ret") <= col("med"))
      .withColumn("ra_micro", round(col("ret") * 1e6).cast("long"))
      .withColumn("rm_micro", round(col("mkt_ret") * 1e6).cast("long"))
      .groupBy(col("asset_id"))
      .agg(
        sum(when(!col("is_down"), 1L).otherwise(0L)).as("n_up"),
        sum(when(col("is_down"), 1L).otherwise(0L)).as("n_down"),
        sum(when(!col("is_down"), col("ra_micro")).otherwise(0L)).as("sa_up"),
        sum(when(!col("is_down"), col("rm_micro")).otherwise(0L)).as("sm_up"),
        sum(when(col("is_down"), col("ra_micro")).otherwise(0L)).as("sa_down"),
        sum(when(col("is_down"), col("rm_micro")).otherwise(0L)).as("sm_down"))
      .withColumn("up_capture", u6(col("sa_up").cast("double") /
        when(col("sm_up") === 0, lit(null)).otherwise(col("sm_up").cast("double"))))
      .withColumn("down_capture", u6(col("sa_down").cast("double") /
        when(col("sm_down") === 0, lit(null)).otherwise(col("sm_down").cast("double"))))
      .select(col("asset_id"), col("n_up"), col("n_down"),
        col("up_capture"), col("down_capture"))
      .orderBy(col("asset_id"))
  }

  /** B92 `ljung_box` — the Ljung–Box portmanteau test: Q_h =
    * m(m+2)·Σ_{k=1..h} ρ_k²/(m−k) over the first `lags` return
    * autocorrelations — the standard "is this series white noise"
    * statistic (market-efficiency check; a large Q rejects
    * no-autocorrelation). Generalizes [[autocorr]]'s single lag to the
    * joint test; each ρ_k uses the identical Pearson-on-slices fold,
    * rounded to 6 before squaring, so the whole statistic replays
    * bitwise in the oracle. One asset_id shuffle, h compiled folds per
    * asset over the collected return array; any degenerate lag
    * (zero-variance slice) nulls Q rather than fabricating a number.
    */
  def ljungBox(panel: DataFrame, lags: Int = 5): DataFrame = {
    import graft.expressions.Kernels
    dailyReturns(panel)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("m", size(col("ra")))
      .filter(col("m") >= lags + 2)
      .withColumn("rhos", transform(sequence(lit(1), lit(lags)), k => {
        val np = (col("m") - k).cast("double")
        val xa = slice(col("ra"), lit(1), col("m") - k)
        val ya = slice(col("ra"), k + lit(1), col("m") - k)
        val sx = Kernels.seqFold(xa, "sum")
        val sy = Kernels.seqFold(ya, "sum")
        val sxy = Kernels.dot(xa, ya)
        val sx2 = Kernels.seqFold(xa, "sumsq")
        val sy2 = Kernels.seqFold(ya, "sumsq")
        val den = sqrt(greatest(np * sx2 - sx * sx, lit(0.0))) *
          sqrt(greatest(np * sy2 - sy * sy, lit(0.0)))
        u6((np * sxy - sx * sy) / when(den === 0, lit(null)).otherwise(den))
      }))
      .withColumn("terms", zip_with(col("rhos"), sequence(lit(1), lit(lags)),
        (r, k) => r * r / (col("m") - k).cast("double")))
      .withColumn("q5",
        when(exists(col("terms"), t => t.isNull), lit(null)).otherwise(
          u6(col("m").cast("double") * (col("m") + 2).cast("double") *
            Kernels.seqFold(transform(col("terms"), t => coalesce(t, lit(0.0))), "sum"))))
      .select(col("asset_id"), col("m").cast("long").as("n_days"),
        element_at(col("rhos"), 1).as("rho1"), col("q5"))
      .orderBy(col("asset_id"))
  }

  /** B91 `monthly_seasonality` — [[seasonality]]'s calendar twin: mean
    * daily return by MONTH of year per asset (the January-effect /
    * quarter-end axis, where dow catches the weekday one). Identical
    * micro-integer mean discipline — the only cross-row sum is exact
    * integer arithmetic — and the same single asset_id shuffle.
    */
  def monthlySeasonality(panel: DataFrame): DataFrame =
    dailyReturns(panel)
      .withColumn("ret_micro", round(col("ret") * 1e6).cast("long"))
      .withColumn("month", month(col("date")).cast("long"))
      .groupBy(col("asset_id"), col("month"))
      .agg(count(lit(1)).as("n_days"), sum(col("ret_micro")).as("sum_micro"))
      .withColumn("mean_ret",
        round(col("sum_micro").cast("double") / col("n_days").cast("double")).cast("long")
          .cast("double") / lit(1e6))
      .select(col("asset_id"), col("month"), col("n_days"), col("mean_ret"))
      .orderBy(col("asset_id"), col("month"))

  /** B31 `sharpe` — per-asset (non-annualized) Sharpe ratio over the
    * full return history: mean/σ of daily returns, co-moment folds
    * over the date-ordered array ([[rollingVol]] machinery, full
    * frame). One row per asset with ≥ 2 returns.
    */
  def sharpe(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("ra")))
      .withColumn("s2", foldSumSq(col("ra")))
      .withColumn("mean_ret", col("s") / n)
      .withColumn("sd", sqrt(greatest((n * col("s2") - col("s") * col("s")) / (n * (n - 1)), lit(0.0))))
      .withColumn("sharpe", u6(col("mean_ret") /
        when(col("sd") === 0, lit(null)).otherwise(col("sd"))))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        u6(col("mean_ret")).as("mean_ret"), col("sharpe"))
      .orderBy(col("asset_id"))
  }

  /** B32 `autocorr` — lag-1 autocorrelation of each asset's daily
    * returns: Pearson correlation of (r_t, r_{t+1}) via co-moment folds
    * over the two shifted slices of the date-ordered return array
    * (mean-reversion screen). One row per asset with ≥ 3 returns.
    */
  def autocorr(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("m", size(col("ra")))
      .filter(col("m") >= 3)
      .withColumn("xa", slice(col("ra"), lit(1), col("m") - 1))
      .withColumn("ya", slice(col("ra"), lit(2), col("m") - 1))
      .withColumn("n", (col("m") - 1).cast("double"))
      .withColumn("sx", foldSum(col("xa")))
      .withColumn("sy", foldSum(col("ya")))
      // Σ xᵢ·yᵢ: DotProduct accumulates `s += x·y` left-to-right from
      // 0.0 — the identical op sequence the zip_with+fold form ran, so
      // the oracle's list_reduce replay still matches bit-for-bit.
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("sx2", foldSumSq(col("xa")))
      .withColumn("sy2", foldSumSq(col("ya")))
      .withColumn("den",
        sqrt(greatest(n * col("sx2") - col("sx") * col("sx"), lit(0.0))) *
          sqrt(greatest(n * col("sy2") - col("sy") * col("sy"), lit(0.0))))
      .withColumn("autocorr", u6((n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), n.cast("long").as("n_pairs"), col("autocorr"))
      .orderBy(col("asset_id"))
  }

  /** B30 `portfolio_nav` — fixed-weight portfolio: daily portfolio
    * return = Σ wᵃ·retᵃ over the watchlist (asset-ordered fold per
    * date), NAV = running Π(1+r) in date order (prefix-array product
    * fold — date counts are calendar-bounded, so the O(days²) prefix
    * rebuild is bounded and exact). Assets missing a date contribute 0
    * that day (weights deliberately not renormalized — the cash-drag
    * convention; document differently if re-weighting is wanted).
    */
  def portfolioNav(panel: DataFrame, weights: Map[Long, Double]): DataFrame = {
    val assets = weights.keys.toSeq.sorted
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) { case (acc, (a, wt)) =>
      when(col("asset_id") === a, wt).otherwise(acc)
    }
    val daily = KeyValue.lwwDaily(
      panel.filter(col("asset_id").isin(assets: _*)).repartition(col("asset_id")))
    val lagW = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(lagW)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("wr", w * col("ret"))
    val byDate = rets
      .groupBy(col("date"))
      .agg(array_sort(collect_list(struct(col("asset_id"), col("wr")))).as("h"))
      .withColumn("port_ret", u6(foldSum(transform(col("h"), s => s("wr")))))
      .select(col("date"), col("port_ret"))
    val navFrame = Window.orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDate
      .withColumn("navarr", collect_list(col("port_ret")).over(navFrame))
      .withColumn("nav", u6(Kernels.seqFold(col("navarr"), "prod1p")))
      .select(col("date"), col("port_ret"), col("nav"))
      .orderBy(col("date"))
  }

  /** B29 `funnel_stages` — ordered-event funnel: how far each user
    * progresses through `stages` (subsequence match over the user's
    * time-ordered event types), rolled up to users-per-stage-reached.
    * The event list is ordered by `array_sort(collect_list(struct(ts,
    * seq, type)))` and the stage progression is an integer fold —
    * deterministic and engine-exact. Two keyed aggregations (user,
    * then stage), both map-side combinable.
    */
  def funnelStages(events: DataFrame, stages: Seq[String]): DataFrame = {
    val n = stages.length
    val stagesArr = array(stages.map(lit): _*)
    // state = stages completed; the event advances the funnel iff it
    // equals the NEXT wanted stage. `least` keeps the probe index in
    // bounds once the funnel completes (condition is then false anyway)
    // — stages may repeat, so events fold against the stage LIST, not a
    // per-type index.
    val reach = aggregate(col("evs"), lit(0),
      (st, e) =>
        when(st < n && e === element_at(stagesArr, least(st + 1, lit(n))), st + 1)
          .otherwise(st))
    events
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))).as("h"))
      .withColumn("evs", transform(col("h"), s => s("event_type")))
      .withColumn("stage_reached", reach)
      .groupBy(col("stage_reached").cast("long").as("stage_reached"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage_reached"))
  }

  /** B28 `corr_matrix` — pairwise return-correlation matrix over a
    * watchlist of assets: daily-return series joined on date for each
    * (a, b) pair, co-moment sums folded over the date-ordered pair
    * history (bit-exact, [[beta]]'s machinery). The watchlist keeps the
    * pair count MEANT — an all-assets matrix is quadratic by
    * definition; at scale you run this over a chosen book, not the
    * universe. One shuffle on date for the self-join, one on the pair.
    */
  def corrMatrix(panel: DataFrame, assets: Seq[Long]): DataFrame = {
    val daily = KeyValue.lwwDaily(
      panel.filter(col("asset_id").isin(assets: _*)).repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .select(col("asset_id"), col("date"), col("ret"))
    val joined = rets.as("a")
      .join(rets.as("b"),
        col("a.date") === col("b.date") && col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        col("a.date").as("date"), col("a.ret").as("ra"), col("b.ret").as("rb"))
    val n = col("n")
    joined
      .groupBy(col("id_a"), col("id_b"))
      .agg(array_sort(collect_list(struct(col("date"), col("ra"), col("rb")))).as("h"))
      .withColumn("ras", transform(col("h"), s => s("ra")))
      .withColumn("rbs", transform(col("h"), s => s("rb")))
      .withColumn("n", size(col("h")).cast("double"))
      .withColumn("sa", foldSum(col("ras")))
      .withColumn("sb", foldSum(col("rbs")))
      // Σ ra·rb compiled — same left-to-right mul/add sequence the
      // transform+fold form produced, so the oracle replay is unchanged.
      .withColumn("sab", Kernels.dot(col("ras"), col("rbs")))
      .withColumn("sa2", foldSumSq(col("ras")))
      .withColumn("sb2", foldSumSq(col("rbs")))
      .withColumn("den",
        sqrt(greatest((n * col("sa2") - col("sa") * col("sa")), lit(0.0))) *
          sqrt(greatest((n * col("sb2") - col("sb") * col("sb")), lit(0.0))))
      .withColumn("corr", u6(
        (n * col("sab") - col("sa") * col("sb")) /
          when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("id_a"), col("id_b"), n.cast("long").as("n_days"), col("corr"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** B47 `ts_similarity` — time-series similarity search: for each
    * query asset, the top-k most return-correlated assets over their
    * common dates (the "find me paths like this one" screen — the
    * distributed top-k trajectory-similarity problem, REPOSE ICDE'21,
    * in its financial shape). [[corrMatrix]] generalized from a fixed
    * watchlist's pairs to query-vs-ALL ranked search.
    *
    * Scale shape: the tiny query-side return series BROADCAST against
    * one corpus scan — work is |queries|·|assets| co-moment groups,
    * never assets²; the per-group folds are the corrMatrix kernels
    * unchanged (bit-exact oracle replay). Zero-variance candidates
    * (corr undefined) are excluded before ranking. For |queries| ≈
    * |assets| (all-pairs similarity), this operator is the wrong
    * shape by design — that regime belongs to the hashed-vector path
    * (hash_embed/quantize/LSH over return vectors).
    */
  def tsSimilarityTopK(panel: DataFrame, queryAssets: Seq[Long], k: Int): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .select(col("asset_id"), col("date"), col("ret"))
    val qRets = rets.filter(col("asset_id").isin(queryAssets: _*))
      .select(col("asset_id").as("q_id"), col("date"), col("ret").as("qret"))
    val n = col("n")
    val rankW = Window.partitionBy(col("q_id")).orderBy(col("corr").desc, col("asset_id"))
    rets
      .join(broadcast(qRets), Seq("date"))
      .filter(col("asset_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("qret")))).as("h"))
      .withColumn("ras", transform(col("h"), s => s("ret")))
      .withColumn("rbs", transform(col("h"), s => s("qret")))
      .withColumn("n", size(col("h")).cast("double"))
      .withColumn("sa", foldSum(col("ras")))
      .withColumn("sb", foldSum(col("rbs")))
      .withColumn("sab", Kernels.dot(col("ras"), col("rbs")))
      .withColumn("sa2", foldSumSq(col("ras")))
      .withColumn("sb2", foldSumSq(col("rbs")))
      .withColumn("den",
        sqrt(greatest((n * col("sa2") - col("sa") * col("sa")), lit(0.0))) *
          sqrt(greatest((n * col("sb2") - col("sb") * col("sb")), lit(0.0))))
      .withColumn("corr", u6(
        (n * col("sab") - col("sa") * col("sb")) /
          when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .filter(col("corr").isNotNull)
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("asset_id"),
        n.cast("long").as("n_days"), col("corr"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** B48 `lead_lag` — lead-lag discovery: for each query asset, the
    * top-k candidates by return correlation at the BEST temporal
    * offset in −maxLag..+maxLag days. Convention: the query's return
    * series is shifted forward by `lag` (its return of date d meets
    * the candidate's return of d+lag), so `best_lag > 0` means the
    * QUERY LEADS — its older moves line up with the candidate's
    * current ones (the momentum-spillover screen).
    *
    * Shape: [[tsSimilarityTopK]] with the broadcast query side
    * replicated once per offset (2·maxLag+1 copies of an already-tiny
    * table) — still one corpus scan, |q|·assets·lags co-moment groups,
    * never assets². Two rank windows: best offset within (query,
    * candidate), then top-k candidates per query.
    */
  def leadLag(panel: DataFrame, queryAssets: Seq[Long], maxLag: Int = 3,
              k: Int = 3): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .select(col("asset_id"), col("date"), col("ret"))
    val qRets = rets.filter(col("asset_id").isin(queryAssets: _*))
      .withColumn("lag", explode(sequence(lit(-maxLag), lit(maxLag))))
      .select(col("asset_id").as("q_id"), expr("date_add(date, lag)").as("date"),
        col("ret").as("qret"), col("lag"))
    val n = col("n")
    val bestW = Window.partitionBy(col("q_id"), col("asset_id"))
      .orderBy(col("corr").desc, col("lag"))
    val rankW = Window.partitionBy(col("q_id")).orderBy(col("corr").desc, col("asset_id"))
    rets
      .join(broadcast(qRets), Seq("date"))
      .filter(col("asset_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("asset_id"), col("lag"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("qret")))).as("h"))
      .withColumn("ras", transform(col("h"), s => s("ret")))
      .withColumn("rbs", transform(col("h"), s => s("qret")))
      .withColumn("n", size(col("h")).cast("double"))
      .filter(n >= 3) // offset edges shrink overlap; tiny overlaps are noise
      .withColumn("sa", foldSum(col("ras")))
      .withColumn("sb", foldSum(col("rbs")))
      .withColumn("sab", Kernels.dot(col("ras"), col("rbs")))
      .withColumn("sa2", foldSumSq(col("ras")))
      .withColumn("sb2", foldSumSq(col("rbs")))
      .withColumn("den",
        sqrt(greatest((n * col("sa2") - col("sa") * col("sa")), lit(0.0))) *
          sqrt(greatest((n * col("sb2") - col("sb") * col("sb")), lit(0.0))))
      .withColumn("corr", u6(
        (n * col("sab") - col("sa") * col("sb")) /
          when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .filter(col("corr").isNotNull)
      .withColumn("best", row_number().over(bestW))
      .filter(col("best") === 1)
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("asset_id"),
        col("lag").cast("long").as("best_lag"),
        n.cast("long").as("n_days"), col("corr"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** B26 `twap` — time-weighted average price per (asset, day): each
    * tick's value weighted by the time until the NEXT tick, over the
    * day's span. The day's ticks come as (ts,seq)-sorted parallel
    * arrays (`array_sort(collect_list(struct(...)))` — deterministic
    * without a window), weights are integer microsecond deltas, and the
    * weighted sum is a sequential fold → bit-exact in both engines.
    * Single-tick days (span 0) degrade to the tick's value. One shuffle
    * on the natural key; arrays are day-sized (bounded).
    */
  def twap(panel: DataFrame): DataFrame = {
    val n = size(col("vs"))
    val deltas = zip_with(
      slice(col("tus"), lit(1), n - 1), slice(col("tus"), lit(2), n - 1), (a, b) => b - a)
    val num = aggregate(
      zip_with(deltas, slice(col("vs"), lit(1), n - 1), (d, v) => d * v),
      lit(0.0), (acc, x) => acc + x)
    val den = (element_at(col("tus"), n) - element_at(col("tus"), 1)).cast("double")
    panel
      .groupBy(col("asset_id"), col("date"))
      .agg(array_sort(collect_list(struct(
        unix_micros(col("ts")).as("t"), col("seq"), col("value")))).as("h"))
      .withColumn("tus", transform(col("h"), s => s("t")))
      .withColumn("vs", transform(col("h"), s => s("value")))
      .withColumn("n_ticks", n.cast("long"))
      .withColumn("twap", u6(
        when(den === 0, element_at(col("vs"), n)).otherwise(num / den)))
      .select(col("asset_id"), col("date"), col("n_ticks"), col("twap"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** Sequential left folds `Σx` / `Σx²` over a frame-ordered array — the
    * ewma bit-exactness trick generalized: both engines run the
    * identical add sequence over the identical element order, so plain
    * double sums match bit-for-bit with no decimal machinery (DuckDB
    * side: `list_reduce(list_prepend(0.0, arr), (a,x) -> a + f(x))`).
    * Runs compiled ([[graft.expressions.SeqFold]]) — the HOF
    * `aggregate` form computed the same fold interpreted per element
    * and dropped the projection out of whole-stage codegen, a measured
    * 5-10× CPU tax on the frame-fold queries.
    */
  private def foldSum(arr: Column): Column = Kernels.seqFold(arr, "sum")
  private def foldSumSq(arr: Column): Column = Kernels.seqFold(arr, "sumsq")

  /** B21 `rolling_vol` — N-day rolling volatility: sample stddev of the
    * daily returns over a row-bounded frame. Σx and Σx² are sequential
    * folds over the frame-ordered return array ([[foldSum]]), so the
    * two-pass variance formula sees bit-identical sums in both engines;
    * sqrt is IEEE-exact on identical input. One shuffle on asset_id
    * (shared by LWW, the lag and the frame window).
    */
  def rollingVol(panel: DataFrame, window: Int = 20): DataFrame =
    rollingVolCore(panel, window).orderBy(col("asset_id"), col("date"))

  /** [[rollingVol]] without the presentation sort — the input to
    * composites ([[riskParity]]) that immediately re-shuffle and would
    * otherwise pay for a global sort the next exchange destroys.
    */
  private[graft] def rollingVolCore(panel: DataFrame, window: Int): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val n = col("n")
    rets
      .withColumn("arr", collect_list(col("ret")).over(frame))
      .withColumn("n", size(col("arr")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("arr")))
      .withColumn("s2", foldSumSq(col("arr")))
      .withColumn("vol", u6(sqrt(greatest(
        (n * col("s2") - col("s") * col("s")) / (n * (n - 1)), lit(0.0)))))
      .select(col("asset_id"), col("date"), col("ret"), col("vol"))
  }

  /** B37 `rolling_median` — N-day rolling EXACT median of the LWW daily
    * value: sort the frame-ordered value array, take the middle element
    * (odd frame) or the IEEE mean of the two middles (even frame — one
    * add and one halving, bit-identical cross-engine on identical
    * inputs). Robust-statistics counterpart of [[rollingVol]]'s moment
    * window: outlier-insensitive level estimate.
    *
    * Scale note: per-row cost is O(w log w) for the frame sort with
    * w bounded by `window` — state per row is fixed-size, so the plan
    * scales exactly like every other frame query (one shuffle on
    * asset_id). At 100 TB with LARGE windows swap the exact sort for a
    * mergeable sketch (t-digest per frame bucket); the exact form here
    * is the oracle-checkable baseline.
    */
  def rollingMedian(panel: DataFrame, window: Int = 20): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    daily
      .withColumn("fa", array_sort(collect_list(col("value")).over(frame)))
      .withColumn("n", size(col("fa")))
      .withColumn("med", u6(
        when(pmod(col("n"), lit(2)) === 1,
          element_at(col("fa"), expr("cast((n + 1) div 2 as int)")))
          .otherwise((element_at(col("fa"), expr("cast(n div 2 as int)")) +
            element_at(col("fa"), expr("cast(n div 2 + 1 as int)"))) / 2.0)))
      .select(col("asset_id"), col("date"), col("med"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B22 `bollinger` — N-day Bollinger bands on the LWW daily close:
    * mid = rolling mean, bands = mid ± 2σ (sample), %B = position of the
    * close within the band. Same frame-ordered fold determinism as
    * [[rollingVol]]; rows with a 1-row frame are dropped (σ undefined).
    */
  def bollinger(panel: DataFrame, window: Int = 20): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val n = col("n")
    daily
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("n", size(col("arr")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("arr")))
      .withColumn("s2", foldSumSq(col("arr")))
      .withColumn("mid", col("s") / n)
      .withColumn("sd", sqrt(greatest(
        (n * col("s2") - col("s") * col("s")) / (n * (n - 1)), lit(0.0))))
      .withColumn("upper", u6(col("mid") + lit(2.0) * col("sd")))
      .withColumn("lower", u6(col("mid") - lit(2.0) * col("sd")))
      .withColumn("pct_b", u6(
        (col("value") - (col("mid") - lit(2.0) * col("sd"))) /
          when(col("sd") === 0, lit(null)).otherwise(lit(4.0) * col("sd"))))
      .select(col("asset_id"), col("date"), col("value"),
        u6(col("mid")).as("mid"), col("upper"), col("lower"), col("pct_b"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B23 `rsi` — span-bounded Wilder-style RSI: exponentially-weighted
    * gain/loss sums with w = 13/14 over a `span`-row frame, RSI =
    * 100 − 100/(1+AG/AL). The EW normalization constant cancels in the
    * AG/AL ratio, so the UNnormalized Horner folds (bit-exact in both
    * engines, no pow — same machinery as [[ewma]]) give the exact
    * EW ratio. AL = 0 (no losses in frame) → RSI 100 by convention.
    */
  def rsi(panel: DataFrame, span: Int = 60): DataFrame =
    rsiCore(panel, span).orderBy(col("asset_id"), col("date"))

  /** [[rsi]] without the presentation sort — the input to composites
    * ([[stochRsi]]) that immediately re-window on the same asset_id
    * partitioning.
    */
  private[graft] def rsiCore(panel: DataFrame, span: Int): DataFrame = {
    val wilder = 13.0 / 14.0
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    rets
      .withColumn("arr", collect_list(col("ret")).over(frame))
      .withColumn("ag", Kernels.seqFold(col("arr"), "horner_pos", wilder))
      .withColumn("al", Kernels.seqFold(col("arr"), "horner_neg", wilder))
      .withColumn("rsi", u4(
        when(col("al") === 0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("ag") / col("al")))))
      .select(col("asset_id"), col("date"), col("ret"), col("rsi"))
  }

  /** B27 `macd` — moving-average convergence/divergence on the LWW
    * daily close: EW(fast) − EW(slow), plus the EW(signal) of the MACD
    * line and the histogram. All four EW series are span-bounded Horner
    * folds ([[ewma]]'s recipe): the MACD line folds once over the raw
    * value frame with weights w_f/w_s, and the signal folds over the
    * frame of ROUNDED macd values (deterministic inputs → deterministic
    * fold, replayed verbatim by the oracle). One shuffle on asset_id
    * shared by every window.
    */
  def macd(panel: DataFrame, fast: Int = 12, slow: Int = 26, signal: Int = 9,
           span: Int = 120): DataFrame = {
    def w(n: Int): Double = 1.0 - 2.0 / (n + 1.0)
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    def ew(arr: Column, weight: Double): Column =
      Kernels.seqFold(arr, "horner", weight) / Kernels.seqFold(arr, "horner_count", weight)
    val sigFrame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(signal * 4 - 1), Window.currentRow)
    daily
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("macd", u6(ew(col("arr"), w(fast)) - ew(col("arr"), w(slow))))
      .withColumn("sarr", collect_list(col("macd")).over(sigFrame))
      .withColumn("signal", u6(ew(col("sarr"), w(signal))))
      .withColumn("hist", u6(col("macd") - col("signal")))
      .select(col("asset_id"), col("date"), col("value"),
        col("macd"), col("signal"), col("hist"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B24 `xsec_zscore` — cross-sectional standardization per effective
    * date: z = (v − μ_date)/σ_date across assets. Per-date stats are
    * folded ONCE per date over the asset_id-ordered array
    * (`array_sort(collect_list(struct(...)))` makes the collection
    * order deterministic without a window — a full-frame window
    * would copy + fold the whole cross-section per ROW, O(assets²)
    * per date; measured 8.9 s → 0.8 s at sf0.1), then the tiny
    * (date, μ, σ) table broadcasts back. Dates with a single asset
    * emit NULL z.
    */
  def xsecZscore(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel)
    val n = col("n")
    val stats = daily
      .groupBy(col("date"))
      .agg(transform(array_sort(collect_list(struct(col("asset_id"), col("value")))),
        s => s("value")).as("arr"))
      .withColumn("n", size(col("arr")).cast("double"))
      .withColumn("s", foldSum(col("arr")))
      .withColumn("s2", foldSumSq(col("arr")))
      .withColumn("mu", col("s") / n)
      .withColumn("sd", sqrt(greatest(
        (n * col("s2") - col("s") * col("s")) / (n * when(n === 1, lit(null)).otherwise(n - 1)),
        lit(0.0))))
      .select(col("date"), col("mu"), col("sd"))
    daily.join(broadcast(stats), Seq("date"))
      .withColumn("z", u6(
        (col("value") - col("mu")) / when(col("sd") === 0, lit(null)).otherwise(col("sd"))))
      .select(col("asset_id"), col("date"), col("value"), col("z"))
      .orderBy(col("date"), col("asset_id"))
  }

  /** B25 `beta` — per-asset CAPM beta/alpha against the equal-weight
    * market return. Market return per date = mean of the (rounded)
    * asset returns, folded in asset_id order; each asset's co-moment
    * sums then fold over its date-ordered (ret, mkt_ret) history —
    * full-frame window arrays, one representative row per asset
    * (rn = 1), every sum a sequential fold → bit-exact cross-engine.
    * Two shuffles (date for the market agg, asset_id for the betas);
    * the per-date market table is tiny → broadcast back.
    */
  def beta(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
    // per-date and per-asset histories via array_sort(collect_list(..)):
    // deterministic element order with ONE fold per group (a full-frame
    // window would rebuild + refold the array per row)
    val mkt = rets
      .groupBy(col("date"))
      .agg(transform(array_sort(collect_list(struct(col("asset_id"), col("ret")))),
        s => s("ret")).as("marr"))
      .select(col("date"),
        u6(foldSum(col("marr")) / size(col("marr")).cast("double")).as("mkt_ret"))
    val joined = rets.select(col("asset_id"), col("date"), col("ret"))
      .join(broadcast(mkt), Seq("date"))
    val n = col("n")
    joined
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("mkt_ret")))).as("h"))
      .withColumn("ra", transform(col("h"), s => s("ret")))
      .withColumn("rm", transform(col("h"), s => s("mkt_ret")))
      .withColumn("rp", transform(col("h"), s => s("ret") * s("mkt_ret")))
      .withColumn("n", size(col("ra")).cast("double"))
      .withColumn("sa", foldSum(col("ra")))
      .withColumn("sm", foldSum(col("rm")))
      .withColumn("sp", foldSum(col("rp")))
      .withColumn("sm2", foldSumSq(col("rm")))
      .withColumn("den", n * col("sm2") - col("sm") * col("sm"))
      .withColumn("beta", u6((n * col("sp") - col("sa") * col("sm")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .withColumn("alpha", u6((col("sa") - coalesce(
        (n * col("sp") - col("sa") * col("sm")) /
          when(col("den") === 0, lit(null)).otherwise(col("den")), lit(0.0)) * col("sm")) / n))
      .select(col("asset_id"), n.cast("long").as("n_days"), col("beta"), col("alpha"))
      .orderBy(col("asset_id"))
  }

  /** B40 `atr` — Wilder Average True Range over the daily bars:
    * TR = max(high−low, |high−prevClose|, |low−prevClose|) (plain
    * high−low on the first bar), ATR = the span-bounded EW mean of the
    * ROUNDED TR series via the same normalized Horner folds as [[ewma]]
    * (w = (span−1)/span — Wilder's smoothing is exactly an EW mean with
    * that weight). Rounding TR before the fold makes the fold input —
    * and therefore the fold — bit-identical cross-engine. One shuffle:
    * the bar aggregate and every window share asset_id partitioning.
    */
  def atr(panel: DataFrame, span: Int = 14): DataFrame = {
    val w = (span - 1).toDouble / span
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevClose = lag(col("close"), 1).over(byAsset)
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tr", u6(
        when(prevClose.isNull, col("high") - col("low"))
          .otherwise(greatest(
            col("high") - col("low"),
            abs(col("high") - prevClose),
            abs(col("low") - prevClose)))))
      .withColumn("arr", collect_list(col("tr")).over(frame))
      .withColumn("atr", u6(
        Kernels.seqFold(col("arr"), "horner", w) /
          Kernels.seqFold(col("arr"), "horner_count", w)))
      .select(col("asset_id"), col("date"), col("tr"), col("atr"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B41 `stochastic_osc` — stochastic oscillator over the daily bars:
    * %K = 100·(close − lowN)/(highN − lowN) over a `span`-bar channel
    * (rolling min/max are order-insensitive → exact for free), %D = the
    * 3-bar mean of the ROUNDED %K written with explicit left-to-right
    * association `((k₋₂ + k₋₁) + k)/3` so both engines run the same
    * IEEE op sequence. Bars whose channel is flat emit NULL %K (and the
    * null propagates into any %D it touches — same rule both engines).
    */
  def stochastic(panel: DataFrame, span: Int = 14): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("low_n", min(col("low")).over(frame))
      .withColumn("high_n", max(col("high")).over(frame))
      .withColumn("pct_k", u6(
        lit(100.0) * (col("close") - col("low_n")) /
          when(col("high_n") === col("low_n"), lit(null))
            .otherwise(col("high_n") - col("low_n"))))
      // lag past the partition start is NULL in both engines, so the
      // first two bars' %D nulls out without an explicit guard
      .withColumn("pct_d", u6(
        (lag(col("pct_k"), 2).over(byAsset) + lag(col("pct_k"), 1).over(byAsset) + col("pct_k")) / 3))
      .select(col("asset_id"), col("date"), col("close"),
        col("pct_k"), col("pct_d"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B42 `obv` — on-balance volume over the daily bars: signed tick
    * volume sign(close − prevClose)·n_ticks accumulated per asset in
    * date order. ALL-INTEGER (sign ∈ {−1,0,1}, n_ticks a count, OBV an
    * integer running sum) — exact under any engine and any aggregation
    * order, no decimal machinery needed. First bar contributes 0.
    */
  def obv(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val run = byAsset.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevClose = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("signed_vol",
        when(prevClose.isNull, lit(0L))
          .when(col("close") > prevClose, col("n_ticks"))
          .when(col("close") < prevClose, -col("n_ticks"))
          .otherwise(lit(0L)))
      .withColumn("obv", sum(col("signed_vol")).over(run))
      .select(col("asset_id"), col("date"), col("close"),
        col("signed_vol"), col("obv"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B45 `williams_r` — Williams %R over the daily bars:
    * −100·(highN − close)/(highN − lowN), the inverted cousin of
    * [[stochastic]]'s %K (−100 ↔ 0 maps to %K's 0 ↔ 100). Rolling
    * min/max are order-insensitive and exact, but the DIVISION is
    * not round-safe: the r6 driver oracle caught `round(_, 6)`
    * landing on opposite sides of a half boundary per engine. The
    * quotient is micro-unit rounded `floor(x·10⁶+0.5)/10⁶` (the
    * fixed IEEE op sequence both engines share) per [[cci]]'s
    * documented discipline.
    */
  def williamsR(panel: DataFrame, span: Int = 14): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("low_n", min(col("low")).over(frame))
      .withColumn("high_n", max(col("high")).over(frame))
      .withColumn("wr", u6(
        lit(-100.0) * (col("high_n") - col("close")) /
          when(col("high_n") === col("low_n"), lit(null))
            .otherwise(col("high_n") - col("low_n"))))
      .select(col("asset_id"), col("date"), col("close"), col("wr"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B46 `keltner` — Keltner channels over the daily bars: middle =
    * EW mean of the ROUNDED typical price (high+low+close)/3, bands =
    * middle ± 2·ATR where ATR is the same rounded-TR Wilder EW as
    * [[atr]]. Every series is a span-bounded Horner fold over
    * frame-ordered arrays — the [[ewma]]/[[atr]] machinery composed,
    * one asset_id shuffle shared by the bar aggregate and all windows.
    */
  def keltner(panel: DataFrame, span: Int = 20): DataFrame = {
    val w = 1.0 - 2.0 / (span + 1.0)   // EMA weight for the middle line
    val wilder = (span - 1).toDouble / span
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevClose = lag(col("close"), 1).over(byAsset)
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    def ewMean(arr: Column, weight: Double): Column =
      Kernels.seqFold(arr, "horner", weight) / Kernels.seqFold(arr, "horner_count", weight)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tp", u6((col("high") + col("low") + col("close")) / 3))
      .withColumn("tr", u6(
        when(prevClose.isNull, col("high") - col("low"))
          .otherwise(greatest(
            col("high") - col("low"),
            abs(col("high") - prevClose),
            abs(col("low") - prevClose)))))
      .withColumn("tparr", collect_list(col("tp")).over(frame))
      .withColumn("trarr", collect_list(col("tr")).over(frame))
      .withColumn("mid", u6(ewMean(col("tparr"), w)))
      .withColumn("atr", u6(ewMean(col("trarr"), wilder)))
      .withColumn("upper", u6(col("mid") + lit(2.0) * col("atr")))
      .withColumn("lower", u6(col("mid") - lit(2.0) * col("atr")))
      .select(col("asset_id"), col("date"), col("close"),
        col("mid"), col("atr"), col("upper"), col("lower"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B44 `ret_moments` — higher-moment return profile per asset: mean,
    * sample σ, skewness g₁ = m₃/m₂^{3/2} and excess kurtosis
    * g₂ = m₄/m₂² − 3 of the daily return series, the fat-tail /
    * asymmetry screen beside [[sharpe]]. Raw power sums S₁..S₄ are
    * compiled sequential folds over the date-ordered return array
    * (`sum3`/`sum4` run `(x·x)·x` / `((x·x)·x)·x` left-assoc — the
    * identical op sequence DuckDB's `x*x*x` transform applies), and
    * every central-moment expression is written ONCE with explicit
    * association mirrored verbatim in the oracle, so both engines run
    * the same IEEE sequence end-to-end. Assets need ≥ 4 returns.
    */
  def retMoments(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 4)
      .withColumn("m", foldSum(col("ra")) / n)
      .withColumn("m2", Kernels.seqFold(col("ra"), "sumsq") / n - col("m") * col("m"))
      .withColumn("m3", Kernels.seqFold(col("ra"), "sum3") / n
        - lit(3.0) * col("m") * (Kernels.seqFold(col("ra"), "sumsq") / n)
        + lit(2.0) * col("m") * col("m") * col("m"))
      .withColumn("m4", Kernels.seqFold(col("ra"), "sum4") / n
        - lit(4.0) * col("m") * (Kernels.seqFold(col("ra"), "sum3") / n)
        + lit(6.0) * col("m") * col("m") * (Kernels.seqFold(col("ra"), "sumsq") / n)
        - lit(3.0) * col("m") * col("m") * col("m") * col("m"))
      .withColumn("sd", sqrt(greatest(col("m2") * (n / (n - 1)), lit(0.0))))
      .withColumn("skew", u6(col("m3") /
        when(col("m2") <= 0, lit(null)).otherwise(col("m2") * sqrt(col("m2")))))
      .withColumn("kurt", u6(col("m4") /
        when(col("m2") <= 0, lit(null)).otherwise(col("m2") * col("m2")) - 3))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        u6(col("m")).as("mean_ret"), u6(col("sd")).as("sd"),
        col("skew"), col("kurt"))
      .orderBy(col("asset_id"))
  }

  /** B43 `momentum_xsec` — cross-sectional momentum screen: per-asset
    * trailing return skipping the most recent bars (the classic
    * momentum construction — `skip` bars of reversal noise excluded,
    * `look`-bar lookback), then per-date quintile buckets by INTEGER
    * rank arithmetic `((rk−1)·5) div n + 1` — engine-portable where
    * ntile's tie policy is not. Total rank order (mom desc, asset_id)
    * makes the bucket assignment deterministic.
    */
  def momentumXsec(panel: DataFrame, skip: Int = 2, look: Int = 10): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val near = lag(col("value"), skip).over(byAsset)
    val far = lag(col("value"), look).over(byAsset)
    val byDate = Window.partitionBy(col("date"))
    val mom = KeyValue.lwwDaily(panel)
      .withColumn("mom", u6(near / when(far === 0, lit(null)).otherwise(far) - 1))
      .filter(col("mom").isNotNull)
    mom
      .withColumn("rk", row_number().over(byDate.orderBy(col("mom").desc, col("asset_id"))))
      .withColumn("n", count(lit(1)).over(byDate))
      .withColumn("quintile", expr("((rk - 1) * 5) div n + 1"))
      .select(col("asset_id"), col("date"), col("mom"), col("quintile"))
      .orderBy(col("date"), col("asset_id"))
  }

  /** B49 `ichimoku` — Ichimoku Kinko Hyo over the daily bars:
    * conversion (tenkan) and base (kijun) are channel midpoints
    * `(maxH + minL)/2` over 9- and 26-bar frames, leading span A/B are
    * the 26-bar-back values of `(conv + base)/2` and the 52-bar
    * midpoint (i.e. the cloud as it applies TODAY — computed at d−26,
    * plotted at d), and the lagging span (chikou) is close shifted 26
    * forward (`lead`). Every series is rolling min/max plus one add
    * and one halving — order-insensitive extremes and a fixed IEEE op
    * sequence, so the oracle is exact for free. One asset_id shuffle
    * shared by the bar aggregate and every window; partial-window
    * midpoints (first bars) are emitted like [[williamsR]] does.
    */
  def ichimoku(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    def channelMid(span: Int): Column = {
      val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
      u6((max(col("high")).over(frame) + min(col("low")).over(frame)) / 2)
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("conv", channelMid(9))
      .withColumn("base", channelMid(26))
      .withColumn("span_a",
        u6((lag(col("conv"), 26).over(byAsset) + lag(col("base"), 26).over(byAsset)) / 2))
      .withColumn("span_b", lag(channelMid(52), 26).over(byAsset))
      .withColumn("chikou", lead(col("close"), 26).over(byAsset))
      .select(col("asset_id"), col("date"), col("close"),
        col("conv"), col("base"), col("span_a"), col("span_b"), col("chikou"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B50 `pivot_points` — classic floor-trader pivot levels from the
    * PREVIOUS day's bar: P = ((H + L) + C)/3 (explicit left
    * association), R1 = 2P − L, S1 = 2P − H, R2 = P + (H − L),
    * S2 = P − (H − L). Pure lag arithmetic over the daily bars — no
    * frames, no folds; the first bar of each asset nulls out (lag past
    * the partition start) identically in both engines.
    */
  def pivotPoints(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val ph = lag(col("high"), 1).over(byAsset)
    val pl = lag(col("low"), 1).over(byAsset)
    val pc = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("p", u6((ph + pl + pc) / 3))
      .withColumn("r1", u6(lit(2.0) * col("p") - pl))
      .withColumn("s1", u6(lit(2.0) * col("p") - ph))
      .withColumn("r2", u6(col("p") + (ph - pl)))
      .withColumn("s2", u6(col("p") - (ph - pl)))
      .select(col("asset_id"), col("date"), col("close"),
        col("p"), col("r1"), col("s1"), col("r2"), col("s2"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B51 `cci` — Commodity Channel Index over the daily bars:
    * CCI = (TP − SMA_N(TP)) / (0.015 · MeanDev_N) with TP the ROUNDED
    * typical price (high+low+close)/3. The frame SMA and the mean
    * absolute deviation are both explicit left-assoc folds over the
    * frame-ordered TP array (compiled [[Kernels.seqFold]] for the sum;
    * an `aggregate` HOF for the deviation pass because its lambda
    * closes over the row's own SMA) — window-function `avg` would let
    * each engine pick its own summation tree (DuckDB's sliding
    * aggregates use a segment tree). Flat frames (dev = 0) null out.
    * Derived float outputs are micro-unit rounded `floor(x·10⁶+0.5)/10⁶`
    * (the fixed IEEE op sequence both engines share) rather than
    * `round(_, 6)` — decimal-string round() lands on opposite sides of
    * the half boundary per engine for values like …4165.
    */
  def cci(panel: DataFrame, span: Int = 20): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tp", u6((col("high") + col("low") + col("close")) / 3))
      .withColumn("arr", collect_list(col("tp")).over(frame))
      .withColumn("n", size(col("arr")).cast("double"))
      .withColumn("sma", Kernels.seqFold(col("arr"), "sum") / col("n"))
      .withColumn("dev",
        expr("aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) -> a + abs(x - sma))") / col("n"))
      .withColumn("cci", u6(
        (col("tp") - col("sma")) /
          when(col("dev") === 0, lit(null)).otherwise(lit(0.015) * col("dev"))))
      .select(col("asset_id"), col("date"), col("tp"),
        u6(col("sma")).as("sma"), u6(col("dev")).as("mean_dev"), col("cci"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B52 `cmf` — Chaikin Money Flow over the daily bars: money-flow
    * multiplier MFM = ((C−L) − (H−C))/(H−L) (ROUNDED; flat bars
    * contribute 0 flow but their volume still counts — documented
    * deviation from the null-skipping variant, chosen because Spark's
    * `collect_list` drops nulls while DuckDB's `list()` keeps them),
    * MFV = MFM · n_ticks, CMF = Σ_frame MFV / Σ_frame volume. The MFV
    * sum is a compiled left-assoc fold over the frame array; the
    * volume sum is an INTEGER window sum (exact under any order).
    */
  def cmf(panel: DataFrame, span: Int = 20): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("mfv", coalesce(
        u6(((col("close") - col("low")) - (col("high") - col("close"))) /
          when(col("high") === col("low"), lit(null)).otherwise(col("high") - col("low")))
          * col("n_ticks").cast("double"),
        lit(0.0)))
      .withColumn("arr", collect_list(col("mfv")).over(frame))
      .withColumn("vol_n", sum(col("n_ticks")).over(frame))
      .withColumn("cmf", u6(
        Kernels.seqFold(col("arr"), "sum") / col("vol_n").cast("double")))
      .select(col("asset_id"), col("date"), col("close"),
        u6(col("mfv")).as("mfv"), col("vol_n"), col("cmf"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B54 `pairs_spread` — pairs-trading spread monitor over fixed asset
    * pairs (cointegration-lite): OLS-fit pa = α + β·pb on the joined
    * daily LWW level histories, spread_t = pa_t − (α + β·pb_t), z-score
    * of the spread against its own full-history mean / sample σ — the
    * classic stat-arb entry/exit signal. Co-moment sums are compiled
    * folds over date-ordered arrays ([[Kernels.dot]] for Σ pa·pb); the
    * spread series is a `zip_with` whose lambda closes over the fitted
    * scalars, then two more folds for its moments. The pair list is a
    * literal OR-chain filter after a date-equality self-join of the
    * `isin`-pruned daily series (pairs ≪ assets always — the pruned
    * join is tiny and shuffles on date once). Float outputs micro-unit
    * rounded (the [[cci]] rule).
    */
  def pairsSpread(panel: DataFrame, pairs: Seq[(Long, Long)]): DataFrame = {
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val daily = KeyValue.lwwDaily(panel.filter(col("asset_id").isin(ids: _*)))
      .select(col("asset_id"), col("date"), col("value"))
    val wanted = pairs.map { case (a, b) =>
      col("a.asset_id") === a && col("b.asset_id") === b
    }.reduce(_ || _)
    val n = col("n")
    daily.as("a")
      .join(daily.as("b"), col("a.date") === col("b.date"))
      .filter(wanted)
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        col("a.date").as("date"), col("a.value").as("pa"), col("b.value").as("pb"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(array_sort(collect_list(struct(col("date"), col("pa"), col("pb")))).as("h"))
      .withColumn("pas", transform(col("h"), s => s("pa")))
      .withColumn("pbs", transform(col("h"), s => s("pb")))
      .withColumn("n", size(col("h")).cast("double"))
      .filter(n >= 3)
      .withColumn("sa", foldSum(col("pas")))
      .withColumn("sb", foldSum(col("pbs")))
      .withColumn("sab", Kernels.dot(col("pas"), col("pbs")))
      .withColumn("sb2", foldSumSq(col("pbs")))
      .withColumn("beta",
        (n * col("sab") - col("sa") * col("sb")) /
          when(n * col("sb2") - col("sb") * col("sb") === 0, lit(null))
            .otherwise(n * col("sb2") - col("sb") * col("sb")))
      .withColumn("alpha", (col("sa") - col("beta") * col("sb")) / n)
      .withColumn("sarr",
        zip_with(col("pas"), col("pbs"), (x, y) => x - (col("alpha") + col("beta") * y)))
      .withColumn("ms", foldSum(col("sarr")) / n)
      .withColumn("sd", sqrt(greatest(
        (n * foldSumSq(col("sarr")) - foldSum(col("sarr")) * foldSum(col("sarr"))) /
          (n * (n - 1)), lit(0.0))))
      .select(col("id_a"), col("id_b"), u6(col("beta")).as("beta"),
        col("ms"), col("sd"), col("sarr"),
        posexplode(col("h")).as(Seq("i", "s")))
      .select(col("id_a"), col("id_b"), col("s.date").as("date"),
        col("s.pa").as("pa"), col("s.pb").as("pb"), col("beta"),
        u6(element_at(col("sarr"), col("i") + 1)).as("spread"),
        u6((element_at(col("sarr"), col("i") + 1) - col("ms")) /
          when(col("sd") === 0, lit(null)).otherwise(col("sd"))).as("z"))
      .orderBy(col("id_a"), col("id_b"), col("date"))
  }

  /** B198 `pairs_signal` — mean-reversion position track over B54
    * [[pairsSpread]]'s z-score: enter against the stretch when
    * |z| ≥ `entry` (z rich → short the spread, −1; z cheap → +1), flat
    * when |z| < `exit`, CARRY otherwise — the hysteresis loop every
    * pairs desk runs. The carried state needs no recursion: a
    * position only depends on the LAST boundary event, so one
    * `last(ignoreNulls)` window over the sparse event column replays
    * it exactly (the same idiom the oracle writes as windowed
    * max-event-date + self-join). Adds a single per-pair window to the
    * spread's plan; the 6dp z makes every threshold comparison
    * engine-identical.
    */
  def pairsSignal(panel: DataFrame, pairs: Seq[(Long, Long)],
                  entry: Double = 2.0, exit: Double = 0.5): DataFrame =
    signalOverZ(pairsSpread(panel, pairs), entry, exit)

  /** The position logic of [[pairsSignal]] over any (id_a, id_b, date,
    * z) frame — factored for direct spec fixtures.
    */
  private[graft] def signalOverZ(zFrame: DataFrame, entry: Double = 2.0,
                                 exit: Double = 0.5): DataFrame = {
    val ev = when(col("z").isNull, lit(null).cast("long"))
      .when(abs(col("z")) >= entry, when(col("z") > 0, lit(-1L)).otherwise(lit(1L)))
      .when(abs(col("z")) < exit, lit(0L))
      .otherwise(lit(null).cast("long"))
    val w = Window.partitionBy(col("id_a"), col("id_b")).orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    zFrame
      .withColumn("ev", ev)
      .withColumn("pos", coalesce(last(col("ev"), ignoreNulls = true).over(w), lit(0L)))
      .select(col("id_a"), col("id_b"), col("date"), col("z"), col("pos"))
      .orderBy(col("id_a"), col("id_b"), col("date"))
  }

  /** B200 `pairs_adf` — Engle-Granger STEP 2 for the B54 pairs: an
    * augmented-Dickey-Fuller-style unit-root test (no lag terms, with
    * constant) on each pair's 6dp spread series — Δs_t = a + ρ·s_{t−1};
    * t(ρ) < −2.86 (the 5% DF critical value, constant case) rejects
    * the unit root, i.e. the spread actually mean-reverts and the pair
    * is tradeable (B54's z-score assumes this; this row TESTS it;
    * B80's half_life is the per-ASSET AR(1) cousin). Closed-form OLS
    * over the pair's date-sorted spread array: every sum is the shared
    * left-to-right fold over 6dp inputs, so ρ, SE and the t-stat are
    * bit-identical cross-engine and the 6dp t makes the critical-value
    * comparison exact. O(pairs) rows; rides the spread's plan plus one
    * per-pair aggregation.
    */
  def pairsAdf(panel: DataFrame, pairs: Seq[(Long, Long)]): DataFrame = {
    val n = col("n")
    pairsSpread(panel, pairs)
      .select(col("id_a"), col("id_b"), col("date"), col("spread"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("spread")))),
        s => s("spread")).as("sp"))
      .withColumn("n0", size(col("sp")))
      .filter(col("n0") >= 4) // n−1 obs with n−3 ≥ 1 residual dof
      .withColumn("x", slice(col("sp"), lit(1), col("n0") - 1))
      .withColumn("y", zip_with(slice(col("sp"), lit(2), col("n0") - 1), col("x"),
        (b, a) => b - a))
      .withColumn("n", (col("n0") - 1).cast("double"))
      .withColumn("sx", foldSum(col("x")))
      .withColumn("sy", foldSum(col("y")))
      .withColumn("sxy", Kernels.dot(col("x"), col("y")))
      .withColumn("sx2", foldSumSq(col("x")))
      .withColumn("den", n * col("sx2") - col("sx") * col("sx"))
      .withColumn("rho_raw", (n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") <= 0, lit(null)).otherwise(col("den")))
      .withColumn("a", (col("sy") - col("rho_raw") * col("sx")) / n)
      .withColumn("res", zip_with(col("y"), col("x"),
        (yy, xx) => yy - (col("a") + col("rho_raw") * xx)))
      .withColumn("sse", foldSumSq(col("res")))
      .withColumn("sden", col("sx2") - col("sx") * col("sx") / n)
      .withColumn("se", when(n <= 2 || col("sden") <= 0, lit(null))
        .otherwise(sqrt((col("sse") / (n - 2)) / col("sden"))))
      .withColumn("t_stat", u6(col("rho_raw") /
        when(col("se") === 0, lit(null)).otherwise(col("se"))))
      .select(col("id_a"), col("id_b"), col("n0").cast("long").as("n_obs"),
        u6(col("rho_raw")).as("rho"), col("t_stat"),
        (col("t_stat") < -2.86).as("coint_5pct"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** B55 `event_study` — classic event-study table: mean abnormal
    * return and cumulative abnormal return (CAR) by day-offset around
    * every `eventType` event. Abnormal = asset return minus the
    * equal-weight market return of the same date (both 6dp, the
    * difference micro-unit rounded). The event⨝return match rides the
    * [[AsOf.intervalJoin]] trick: each event replicates into the ≤2
    * window-width epoch-day buckets its ±win interval can touch, the
    * join is EQUALITY on (asset_id, bucket) + residual offset filter —
    * per-row fan-out stays O(events per 11-day bucket), never
    * events×dates per asset, and no nested-loop path exists. The
    * bucketing is execution-only (the residual filter makes it
    * invisible), so the oracle is the PLAIN inequality join.
    * Cross-event aggregation uses DECIMAL sums of the rounded
    * abnormals — order-insensitive, so the offset means are exact
    * under any partitioning and fully map-side combinable (NO
    * collected arrays: the scale path is a plain two-level aggregate).
    * CAR accumulates the ROUNDED offset means as decimals — an
    * 2·win+1-row window, exact in any engine.
    */
  def eventStudy(panel: DataFrame, events: DataFrame,
                 eventType: String = "purchase", win: Int = 5): DataFrame = {
    // The market mean is a date-partitioned DECIMAL window, not a
    // groupBy+re-join: the latter plans a SECOND full panel scan for
    // the aggregate side (self-referencing DAGs don't share scans) —
    // at 100 TB that doubles input I/O for 1 column.
    val rets = dailyReturns(panel).select(col("asset_id"), col("date"), col("ret"))
    val wDate = Window.partitionBy(col("date"))
    val mkt = sum(col("ret").cast(DecimalType(18, 6))).over(wDate).cast("double") /
      count(lit(1)).over(wDate)
    val ab = rets.select(col("asset_id"), col("date"), u6(col("ret") - mkt).as("ab"))
    val ev = events.filter(col("event_type") === eventType)
      .select(col("user_id").as("asset_id"), col("ts").cast("date").as("date0"))
      .distinct()
    val width = 2 * win + 1
    val abB = ab.withColumn("bucket",
      expr(s"datediff(date, DATE '1970-01-01') div $width"))
    val evB = ev.select(col("asset_id"), col("date0"),
      explode(array_distinct(array(
        expr(s"datediff(date_add(date0, -$win), DATE '1970-01-01') div $width"),
        expr(s"datediff(date_add(date0, $win), DATE '1970-01-01') div $width")))).as("bucket"))
    val off = datediff(col("date"), col("date0"))
    val carW = Window.orderBy(col("offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    evB.join(abB, Seq("asset_id", "bucket"))
      .filter(off.between(-win, win))
      .select(off.cast("long").as("offset"), col("ab"))
      .groupBy(col("offset"))
      .agg(count(lit(1)).as("n_obs"), (dsum(col("ab"), 6) / count(lit(1))).as("m"))
      .withColumn("mean_ab", u6(col("m")))
      // 2·win+1 rows total: the unpartitioned running window is fine
      .withColumn("car",
        sum(col("mean_ab").cast(DecimalType(18, 6))).over(carW).cast("double"))
      .select(col("offset"), col("n_obs"), col("mean_ab"), col("car"))
      .orderBy(col("offset"))
  }

  /** B56 `quintile_churn` — strategy-turnover monitor over the
    * [[momentumXsec]] screen: per date, how many ranked assets changed
    * momentum quintile since their previous ranked date, as a count
    * and an integer per-mille rate. ALL-INTEGER on top of the quintile
    * screen (which is itself integer-rank derived) — exact replay under
    * any engine; one extra asset_id window over the screen's own
    * output, then a date aggregate.
    */
  def quintileChurn(panel: DataFrame, skip: Int = 2, look: Int = 10): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevQ = lag(col("quintile"), 1).over(byAsset)
    momentumXsec(panel, skip, look)
      .withColumn("prev_q", prevQ)
      .filter(col("prev_q").isNotNull)
      .withColumn("changed", (col("quintile") =!= col("prev_q")).cast("long"))
      .groupBy(col("date"))
      .agg(count(lit(1)).as("n_assets"), sum(col("changed")).as("n_changed"))
      .withColumn("churn_pm", expr("(n_changed * 1000) div n_assets"))
      .orderBy(col("date"))
  }

  /** B57 `cohort_retention` — weekly cohort retention over the event
    * stream: users bucketed by first-seen epoch week, retention at
    * week offset k = share of the cohort active ≥ k whole weeks after
    * their own first day (per-user anchoring, the product-analytics
    * convention). ALL-INTEGER (epoch-week `div`, distinct counts,
    * per-mille rate) → exact replay. Scale shape: one distinct over
    * (user, date), a per-user min, and the (cohort, offset) aggregate
    * — the user⨝cohort join is co-partitioned on user_id with the
    * min that produced it.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val act = events
      .select(col("user_id"), col("ts").cast("date").as("date")).distinct()
    val coh = act.groupBy(col("user_id"))
      .agg(min(col("date")).as("d0"))
      .withColumn("cohort_week",
        expr("datediff(d0, DATE '1970-01-01') div 7").cast("long"))
    val sizes = coh.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    act.join(coh, Seq("user_id"))
      .withColumn("week_offset", expr("datediff(date, d0) div 7").cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .withColumn("retention_pm", expr("(n_active * 1000) div n_cohort"))
      .select(col("cohort_week"), col("week_offset"),
        col("n_active"), col("n_cohort"), col("retention_pm"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** B58 `active_users` — DAU / trailing-7-day WAU / stickiness per
    * date: each active (user, day) contributes itself to the seven
    * window-end dates it can serve, so WAU is a plain distinct count
    * per date — no range-window distinct (which Spark can't express)
    * and no per-date self-join. The 7× explode is of the DEDUPLICATED
    * (user, day) activity set, not raw events — bounded fan-out on the
    * small side of the data. All-integer; window-end dates past the
    * observed range are dropped by the DAU join.
    */
  def activeUsers(events: DataFrame): DataFrame = {
    val act = events
      .select(col("user_id"), col("ts").cast("date").as("date")).distinct()
    val dau = act.groupBy(col("date")).agg(count(lit(1)).as("dau"))
    val wau = act
      .select(col("user_id"),
        explode(sequence(col("date"), date_add(col("date"), 6))).as("date"))
      .distinct()
      .groupBy(col("date")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("date"))
      .withColumn("stickiness_pm", expr("(dau * 1000) div wau"))
      .orderBy(col("date"))
  }

  /** B53 `rollup_agg` — multi-granularity OLAP rollup of the supplier
    * star: detail (region, nation), subtotal (region), grand total in
    * ONE pass via `ROLLUP` grouping sets — Catalyst expands the sets
    * before aggregation so the input is scanned once, map-side
    * partials intact (three separate GROUP BYs would scan three
    * times). `grouping_id()` disambiguates levels exactly as DuckDB's
    * `GROUPING(a, b)` bitmask does (first arg = MSB); decimal-exact
    * acctbal sums via [[dsum]].
    */
  def rollupAgg(supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_suppliers"),
        dsum(col("s_acctbal")).as("total_acctbal"))
      .select(col("r_name"), col("n_name"), col("gid"),
        col("n_suppliers"), col("total_acctbal"))
      .orderBy(col("gid"), col("r_name"), col("n_name"))

  /** B59 `cube_agg` — full CUBE over (status, priority): detail, both
    * one-dimension marginals, and the grand total in ONE scan via
    * `CUBE` grouping sets (the [[rollupAgg]] pattern with the complete
    * lattice — 4 grouping sets, still a single shuffle with map-side
    * partials). `grouping_id()` = DuckDB's `GROUPING(a, b)` bitmask,
    * first argument MSB; decimal-exact totals via [[dsum]].
    */
  def cubeAgg(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
        col("n_orders"), col("total_price"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  /** B60 `pivot_wide` — event-type crosstab per user: one row per user,
    * a (count, exact value sum) column pair per event type. The value
    * list is FIXED (passed in), so the plan is a single groupBy with
    * conditional aggregates — one shuffle on user_id, no second pass to
    * discover pivot values (Spark's 2-arg `pivot` would scan once just
    * to collect the distinct types; at 100 TB that doubles the I/O for
    * a list the caller already knows). Missing (user, type) combos are
    * count 0 / sum NULL on both engines.
    */
  def pivotWide(events: DataFrame,
                types: Seq[String] = Seq("click", "error", "purchase", "signup", "view")): DataFrame = {
    val aggs = types.flatMap { t =>
      val m = col("event_type") === t
      Seq(count(when(m, lit(1))).as(s"${t}_n"),
        sum(when(m, col("value").cast(DecimalType(18, 6)))).cast("double").as(s"${t}_val"))
    }
    events
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("user_id"))
  }

  /** B61 `streaks` — gaps-and-islands: consecutive positive-return-day
    * runs per asset. Island key = rn_all − rn_up (the classic trick: a
    * run of up-days has both row numbers advancing in lockstep, so the
    * difference is constant within a run and unique across runs). Both
    * row_number windows and the island aggregate share the asset_id
    * partitioning — the panel shuffles once; islands are grouped
    * per-asset so no global state, scale-safe at any asset count.
    */
  def streaks(panel: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val r = dailyReturns(panel)
      .select(col("asset_id"), col("date"), col("ret"))
      .withColumn("rn", row_number().over(w))
    val islands = r.filter(col("ret") > 0)
      .withColumn("grp", col("rn") - row_number().over(w))
      .groupBy(col("asset_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    islands
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_streaks"),
        sum(col("len")).as("n_up_days"),
        max(col("len")).as("longest_streak"))
      .orderBy(col("asset_id"))
  }

  /** B63 `event_transitions` — first-order Markov transition matrix of
    * the event stream: for every (prev → next) event-type pair, the
    * observed count and the per-prev transition probability (per-mille,
    * integer `div` — engine-exact, the funnel family's convention).
    * One shuffle on user_id for the lag window; the pair aggregate and
    * the per-prev normalizing window then run on the (types²)-bounded
    * reduction — tiny at any corpus size.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wp = Window.partitionBy(col("prev_type"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_prev", sum(col("n")).over(wp))
      .withColumn("prob_pm", expr("(n * 1000) div n_prev"))
      .select(col("prev_type"), col("event_type"), col("n"),
        col("n_prev"), col("prob_pm"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /** B62 `anomaly_mad` — robust per-asset outlier detection on the LWW
    * daily series: flag days whose value sits more than `cut` robust
    * z-units from the asset's median, with the scale estimated by the
    * median absolute deviation (×1.4826 ≈ σ under normality). Median
    * and MAD are EXACT percentiles (not approx) so the DuckDB oracle's
    * `quantile_cont` replays them; both chained windows reuse the
    * asset_id partitioning — one shuffle total. Robust stats matter
    * here: a mean/stddev filter lets the outliers it is hunting drag
    * the threshold toward themselves; the median ignores them.
    *
    * Determinism: med/MAD are micro-rounded BEFORE the score (the
    * interpolated midpoint of two doubles can differ by an ulp across
    * engines), the score is micro-rounded before the cut compare, and
    * a zero MAD (constant asset) yields NULL score — filtered, both
    * engines.
    */
  def anomalyMad(panel: DataFrame, cut: Double = 3.5): DataFrame = {
    val wa = Window.partitionBy(col("asset_id"))
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val med = daily
      .withColumn("med", u6(expr("percentile(value, 0.5)").over(wa)))
    val mad = med
      .withColumn("mad", u6(expr("percentile(abs(value - med), 0.5)").over(wa)))
    mad
      .withColumn("score",
        u6((col("value") - col("med")) /
          when(col("mad") === 0, lit(null)).otherwise(col("mad") * 1.4826)))
      .filter(col("score").isNotNull && abs(col("score")) > cut)
      .select(col("asset_id"), col("date"), col("value"),
        col("med"), col("mad"), col("score"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** 4·ln2 — the Parkinson estimator's normalizer, embedded as the same
    * decimal literal in the operator and its oracle so neither engine
    * evaluates `ln(2)` at runtime.
    */
  private val FourLn2 = 2.772588722239781

  /** B64 `parkinson_vol` — Parkinson range-based volatility over the
    * daily bars: per-day x = (ln(high/low))², rolling
    * σ_P = √(Σ_frame x / (4·ln2·n)). The intraday range carries ~5×
    * more information per day than close-to-close returns, so the
    * estimate converges with far fewer days — the standard range-based
    * estimator next to [[rollingVol]]'s moment window.
    *
    * Determinism: x is rounded to 6 decimals BEFORE the compiled frame
    * fold (the single `ln` call is the same last-ulp contract as
    * [[Pipeline.weightedSample]]'s log sampling key — round-6 absorbs
    * it), the fold is sequential over the frame order, and √ is
    * IEEE-exact. One shuffle on asset_id, shared by the bar aggregate
    * and the frame window — the [[rollingVol]] plan shape.
    */
  def parkinsonVol(panel: DataFrame, window: Int = 20): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val lhl = log(col("high") / col("low"))
    dailyBars(panel.repartition(col("asset_id")))
      .filter(col("low") > 0)
      .withColumn("x", u6(lhl * lhl))
      .withColumn("arr", collect_list(col("x")).over(frame))
      .withColumn("n", size(col("arr")).cast("double"))
      .withColumn("pv", u6(sqrt(
        Kernels.seqFold(col("arr"), "sum") / (lit(FourLn2) * col("n")))))
      .select(col("asset_id"), col("date"), col("x"), col("pv"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B65 `amihud` — Amihud illiquidity: rolling mean of
    * |daily return| / daily tick count (the panel's volume proxy —
    * price impact per unit of activity). High values flag assets whose
    * price moves a lot on little trading: the classic cross-sectional
    * liquidity factor.
    *
    * ALL-INTEGER micro-unit path: |ret|/n_ticks divides a 6-decimal by
    * a small integer, which lands EXACTLY on half-micro boundaries
    * (x.xxxxxx5 is binary-exact when n_ticks is a power of two) — the
    * one place Spark's and DuckDB's float round() genuinely disagree
    * (measured: 12 flipped rows at sf0.01). So the ratio is rounded in
    * integer space — (2·|ret_micro| + n) div 2n — the rolling mean is
    * an INTEGER window sum (exact under any order, no fold kernel
    * needed), and the final mean rounds the same way: (2·Σ + cnt) div
    * 2cnt. Same single-shuffle frame shape as [[rollingVol]].
    */
  def amihud(panel: DataFrame, window: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = w.rowsBetween(-(window - 1), Window.currentRow)
    val prev = lag(col("close"), 1).over(w)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("ret", u6(col("close") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("ret_micro", round(col("ret") * 1e6).cast("long"))
      .withColumn("xim", expr("(abs(ret_micro) * 2 + n_ticks) div (2 * n_ticks)"))
      .withColumn("sm", sum(col("xim")).over(frame))
      .withColumn("cnt", count(lit(1)).over(frame))
      .withColumn("illiq",
        expr("(2 * sm + cnt) div (2 * cnt)").cast("double") / lit(1000000.0))
      .select(col("asset_id"), col("date"), col("ret"), col("n_ticks"), col("illiq"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B66 `risk_parity` — inverse-volatility portfolio weights per date:
    * w_i = (1/σ_i) / Σ_j (1/σ_j) over the assets with a defined
    * positive [[rollingVol]] that date. The simplest risk-budgeting
    * allocation (equal risk contribution under zero correlation) — the
    * portfolio-construction counterpart of [[portfolioNav]]'s fixed
    * weights.
    *
    * The cross-sectional Σ 1/σ folds ONCE per date over the
    * asset_id-sorted array (the [[xsecZscore]] trick — no O(assets²)
    * full-frame window), and the tiny (date, Σ) table broadcasts back.
    * Two shuffles total: asset_id for the vol windows, date for the
    * cross-section.
    */
  def riskParity(panel: DataFrame, window: Int = 20): DataFrame = {
    val inv = rollingVolCore(panel, window)
      .filter(col("vol") > 0)
      .withColumn("iv", lit(1.0) / col("vol"))
    val sums = inv
      .groupBy(col("date"))
      .agg(transform(array_sort(collect_list(struct(col("asset_id"), col("iv")))),
        s => s("iv")).as("arr"))
      .select(col("date"), Kernels.seqFold(col("arr"), "sum").as("ivsum"))
    inv.join(broadcast(sums), Seq("date"))
      .withColumn("weight", u6(col("iv") / col("ivsum")))
      .select(col("date"), col("asset_id"), col("vol"), col("weight"))
      .orderBy(col("date"), col("asset_id"))
  }

  /** B68 `drawdown_episodes` — underwater-episode extraction from the
    * running-peak series: each maximal run of days with drawdown < 0
    * becomes one row (start, end, length, depth) — the risk report
    * behind "how long and how deep were the losing stretches", where
    * [[drawdown]] gives the raw per-day series. Gaps-and-islands on the
    * underwater flag (the [[streaks]] rn-difference trick); depth is a
    * min over rounded drawdowns (order-insensitive → exact
    * cross-engine for free). All windows and both aggregates share the
    * single asset_id shuffle.
    */
  def drawdownEpisodes(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val runW = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val dd = daily
      .withColumn("peak", max(col("value")).over(runW))
      .withColumn("dd", u6(
        col("value") / when(col("peak") === 0, lit(null)).otherwise(col("peak")) - 1))
      .withColumn("rn", row_number().over(w))
    dd.filter(col("dd") < 0)
      .withColumn("grp", col("rn") - row_number().over(w))
      .groupBy(col("asset_id"), col("grp"))
      .agg(min(col("date")).as("start_date"), max(col("date")).as("end_date"),
        count(lit(1)).as("n_days"), min(col("dd")).as("max_drawdown"))
      .select(col("asset_id"), col("start_date"), col("end_date"),
        col("n_days"), col("max_drawdown"))
      .orderBy(col("asset_id"), col("start_date"))
  }

  /** B69 `tick_imbalance` — tick-rule order-flow classification (Lee–
    * Ready without quotes, the standard fallback): each tick is a buy
    * if it traded on an uptick, a sell on a downtick, and INHERITS the
    * previous side on a zero tick (last non-zero delta carries
    * forward). Daily per-asset buy/sell counts + buy pressure in
    * per-mille. ALL-INTEGER outputs; `buy_pm` uses a non-negative
    * integer `div` (a signed (b−s) numerator would hit Spark
    * truncating where DuckDB floors) and `imbalance_pm = 2·buy_pm −
    * 1000` is derived from it. One shuffle on asset_id shared by the
    * lag, the carry window and the daily aggregate.
    */
  /** B70 `var_backtest` — Kupiec-style VaR exceedance backtest: each
    * day's return is compared against the empirical q-quantile of the
    * PRECEDING `window` returns (current day excluded — the VaR a desk
    * would actually have quoted the night before), and per asset the
    * violation count and per-mille rate come out next to the nominal
    * rate. The q-quantile follows [[varCvar]]'s convention: k-th
    * smallest of the sorted frame with k = ceil(n·q) — here n is the
    * full `window`, so k is a constant and nominal_pm = (k·1000) div n.
    * A healthy model violates ≈ nominal; materially above flags fat
    * tails. Comparisons are on 6-decimal-rounded returns (exact
    * cross-engine); counts are integers. One asset_id shuffle shared
    * by the LWW window, the lag, the frame and the final aggregate.
    */
  def varBacktest(panel: DataFrame, window: Int = 20, q: Double = 0.1): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = w.rowsBetween(-window, -1)
    val prev = lag(col("value"), 1).over(w)
    val k = math.ceil(window * q).toInt
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("arr", collect_list(col("ret")).over(frame))
      .filter(size(col("arr")) === window)
      .withColumn("var_q", element_at(array_sort(col("arr")), k))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("ret") < col("var_q"), 1L).otherwise(0L)).as("n_viol"))
      .withColumn("viol_pm", expr("(n_viol * 1000) div n_days"))
      .withColumn("nominal_pm", lit((k.toLong * 1000) / window))
      .orderBy(col("asset_id"))
  }

  def tickImbalance(panel: DataFrame): DataFrame =
    tickSidesDaily(panel)
      .withColumn("buy_pm",
        expr("(buy_ticks * 1000) div (buy_ticks + sell_ticks)"))
      .withColumn("imbalance_pm", lit(2L) * col("buy_pm") - lit(1000L))
      .orderBy(col("asset_id"), col("date"))

  /** The tick-rule classified daily (buy, sell) counts behind
    * [[tickImbalance]] and [[vpin]] — un-sorted, one asset_id shuffle
    * shared by the carry-forward window and the daily aggregate.
    */
  private[graft] def tickSidesDaily(panel: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("ts"), col("seq"))
    val carryW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("value"), 1).over(w)
    panel.repartition(col("asset_id"))
      .withColumn("d", when(prev.isNull, lit(null))
        .otherwise(signum(col("value") - prev).cast("int")))
      .withColumn("side",
        last(when(col("d") =!= 0, col("d")), ignoreNulls = true).over(carryW))
      .filter(col("side").isNotNull)
      .groupBy(col("asset_id"), col("date"))
      .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("buy_ticks"),
        sum(when(col("side") === -1, 1L).otherwise(0L)).as("sell_ticks"))
  }

  /** B129 `vpin` — VPIN-style order-flow toxicity (Easley–López de
    * Prado–O'Hara, volume buckets = trading days here): daily order
    * imbalance |buy − sell|/(buy + sell) from the tick-rule counts,
    * smoothed by a `span`-day fold mean. Both counts are integers, so
    * the imbalance is one float division; the denominator is a
    * positive row count (no zero guard needed by construction). Rides
    * [[tickSidesDaily]]'s single asset_id shuffle.
    */
  def vpin(panel: DataFrame, span: Int = 5): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    tickSidesDaily(panel)
      .withColumn("oi", u6(abs(col("buy_ticks") - col("sell_ticks")).cast("double") /
        (col("buy_ticks") + col("sell_ticks")).cast("double")))
      .withColumn("arr", collect_list(col("oi")).over(frame))
      .withColumn("vpin", u6(
        Kernels.seqFold(col("arr"), "sum") / size(col("arr")).cast("double")))
      .select(col("asset_id"), col("date"), col("buy_ticks"), col("sell_ticks"),
        col("oi"), col("vpin"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B130 `sterling_ratio` — mean daily return over the average
    * magnitude of the `topN` deepest [[drawdownEpisodes]] depths, per
    * asset: the drawdown-denominated cousin of [[calmar]] that doesn't
    * hang the whole ratio on ONE worst episode. Assets with no
    * underwater episode drop (the ratio is undefined — documented
    * inner join). Episode depths are already u6; the top-N pick is an
    * ascending array slice (most negative first), folded left-to-right.
    */
  def sterlingRatio(panel: DataFrame, topN: Int = 3): DataFrame = {
    val depths = drawdownEpisodes(panel)
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(col("max_drawdown"))).as("da"))
      .withColumn("n_episodes", size(col("da")).cast("long"))
      .withColumn("avg_dd", Kernels.seqFold(slice(col("da"), 1, topN), "sum") /
        least(lit(topN), size(col("da"))).cast("double"))
    dailyReturnsCore(panel)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n_days", size(col("ra")).cast("long"))
      .withColumn("mean_ret", foldSum(col("ra")) / size(col("ra")).cast("double"))
      .join(depths, Seq("asset_id"))
      .withColumn("sterling", u6(col("mean_ret") /
        when(col("avg_dd") === 0, lit(null)).otherwise(-col("avg_dd"))))
      .select(col("asset_id"), col("n_days"), col("n_episodes"),
        u6(col("mean_ret")).as("mean_ret"), u6(-col("avg_dd")).as("avg_dd"),
        col("sterling"))
      .orderBy(col("asset_id"))
  }

  /** B74 `roll_spread` — Roll (1984) implied effective spread per
    * asset: 2·√(−cov(Δp_t, Δp_{t−1})) over the LWW daily close series.
    * Bid-ask bounce makes successive price CHANGES negatively
    * serially correlated; the magnitude of that covariance recovers
    * the spread without ever seeing a quote. Sample covariance via
    * the same shifted-slice co-moment folds as [[autocorr]]
    * (compiled, date-ordered — bit-identical replay in the oracle);
    * NULL when the covariance is non-negative (trending series — the
    * estimator is undefined, the standard convention). Price changes
    * are 6-decimal-rounded (deterministic cross-engine); one
    * asset_id shuffle shared by the LWW window, the lag and the
    * per-asset fold.
    */
  def rollSpread(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("dp", u6(col("value") - prev))
      .filter(col("dp").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("dp")))),
        s => s("dp")).as("da"))
      .withColumn("m", size(col("da")))
      .filter(col("m") >= 3)
      .withColumn("xa", slice(col("da"), lit(1), col("m") - 1))
      .withColumn("ya", slice(col("da"), lit(2), col("m") - 1))
      .withColumn("n", (col("m") - 1).cast("double"))
      .withColumn("sx", foldSum(col("xa")))
      .withColumn("sy", foldSum(col("ya")))
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("cov", (n * col("sxy") - col("sx") * col("sy")) / (n * (n - 1)))
      .withColumn("roll_spread",
        when(col("cov") < 0, u6(lit(2.0) * sqrt(-col("cov")))))
      .select(col("asset_id"), n.cast("long").as("n_pairs"), col("roll_spread"))
      .orderBy(col("asset_id"))
  }

  /** B75 `kyle_lambda` — Kyle-style daily price-impact coefficient:
    * OLS slope of the daily close change Δp on the day's net
    * tick-rule order flow (buy ticks − sell ticks, the signed-flow
    * proxy [[tickImbalance]] already classifies — the panel carries
    * no volume, so flow is in tick units and λ is price-per-net-tick;
    * documented contract). High λ = illiquid: a unit of net
    * aggression moves the price more. Flow is ALL-INTEGER; the OLS
    * folds run over date-ordered arrays (compiled kernels), so the
    * oracle replays the regression bit-for-bit. Two scans of the
    * panel (tick-level flow, daily closes) each shuffled once on
    * asset_id, joined on (asset_id, date) — both sides daily-sized.
    */
  def kyleLambda(panel: DataFrame): DataFrame = {
    val tw = Window.partitionBy(col("asset_id")).orderBy(col("ts"), col("seq"))
    val carryW = tw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTick = lag(col("value"), 1).over(tw)
    val flow = panel.repartition(col("asset_id"))
      .withColumn("d", when(prevTick.isNull, lit(null))
        .otherwise(signum(col("value") - prevTick).cast("int")))
      .withColumn("side",
        last(when(col("d") =!= 0, col("d")), ignoreNulls = true).over(carryW))
      .filter(col("side").isNotNull)
      .groupBy(col("asset_id"), col("date"))
      .agg(sum(col("side").cast("long")).as("net_flow"))
    val dw = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val dprev = lag(col("value"), 1).over(dw)
    val dp = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("dp", u6(col("value") - dprev))
      .filter(col("dp").isNotNull)
    val n = col("n")
    dp.join(flow, Seq("asset_id", "date"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("dp"),
        col("net_flow").cast("double").as("q")))).as("h"))
      .withColumn("xa", transform(col("h"), s => s("q")))
      .withColumn("ya", transform(col("h"), s => s("dp")))
      .withColumn("n", size(col("h")).cast("double"))
      .filter(n >= 3)
      .withColumn("sx", foldSum(col("xa")))
      .withColumn("sy", foldSum(col("ya")))
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("sx2", foldSumSq(col("xa")))
      .withColumn("den", n * col("sx2") - col("sx") * col("sx"))
      .withColumn("kyle_lambda", u6((n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), n.cast("long").as("n_days"), col("kyle_lambda"))
      .orderBy(col("asset_id"))
  }

  /** B76 `variance_ratio` — Lo–MacKinlay variance-ratio statistic
    * VR(k) = Var(k-day return) / (k · Var(1-day return)) per asset:
    * ≈1 under a random walk, <1 mean-reverting, >1 trending. k-day
    * returns are OVERLAPPING sliding sums of the 6-decimal daily
    * returns (same sliding-frame semantics [[Analytics.movingAvg]]
    * relies on — both engines evaluate the frame left-to-right), each
    * re-rounded to 6 decimals; both variances are sample variances
    * via the compiled folds over date-ordered arrays. No
    * heteroscedasticity correction (documented — the point estimate,
    * not the test statistic). One asset_id shuffle shared by the LWW
    * window, the lag, the sliding frame and the per-asset folds.
    */
  def varianceRatio(panel: DataFrame, k: Int = 5): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val slide = w.rowsBetween(-(k - 1), 0)
    def sampleVar(s: Column, s2: Column, n: Column): Column =
      (n * s2 - s * s) / (n * (n - 1))
    val n1 = col("n1")
    val nk = col("nk")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("cnt", count(col("ret")).over(slide))
      .withColumn("rk", when(col("cnt") === k, u6(sum(col("ret")).over(slide))))
      .groupBy(col("asset_id"))
      .agg(
        transform(array_sort(collect_list(struct(col("date"), col("ret")))),
          s => s("ret")).as("ra"),
        transform(array_sort(collect_list(when(col("rk").isNotNull,
          struct(col("date"), col("rk"))))), s => s("rk")).as("rka"))
      .withColumn("n1", size(col("ra")).cast("double"))
      .withColumn("nk", size(col("rka")).cast("double"))
      .filter(n1 >= 2 && nk >= 2)
      .withColumn("v1", sampleVar(foldSum(col("ra")), foldSumSq(col("ra")), n1))
      .withColumn("vk", sampleVar(foldSum(col("rka")), foldSumSq(col("rka")), nk))
      .withColumn("vr", u6(col("vk") /
        when(col("v1") === 0, lit(null)).otherwise(lit(k.toDouble) * col("v1"))))
      .select(col("asset_id"), n1.cast("long").as("n_days"),
        nk.cast("long").as("n_k"), col("vr"))
      .orderBy(col("asset_id"))
  }

  /** B77 `ulcer_index` — Ulcer Index over the LWW daily series: the
    * RMS of the percentage drawdown from the `window`-day rolling high
    * (Martin's downside-pain measure — unlike σ it only punishes
    * below-peak days). Rolling max is order-insensitive (exact for
    * free); each day's drawdown is rounded to 6 decimals and the RMS
    * runs as a compiled sum-of-squares fold over the frame-ordered
    * drawdown list, so the oracle replays it exactly. Expanding frames
    * at the series head (the [[atr]] convention). One asset_id shuffle
    * shared by the LWW window and both rolling frames.
    */
  def ulcerIndex(panel: DataFrame, window: Int = 14): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = w.rowsBetween(-(window - 1), Window.currentRow)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("rmax", max(col("value")).over(frame))
      .withColumn("dd", u6(lit(100.0) * (col("value") - col("rmax")) /
        when(col("rmax") === 0, lit(null)).otherwise(col("rmax"))))
      .withColumn("arr", collect_list(col("dd")).over(frame))
      .withColumn("ulcer", u6(
        sqrt(Kernels.seqFold(col("arr"), "sumsq") / size(col("arr")))))
      .select(col("asset_id"), col("date"), col("value"), col("dd"), col("ulcer"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B71 `sortino` — downside-risk-adjusted return per asset: mean
    * daily return over the downside deviation sqrt(Σ min(ret,0)² / n)
    * (target return 0). Same shape as [[sharpe]] — one shuffle to the
    * per-asset return array, folds over the date-ordered array so the
    * double sums are sequential and engine-exact; the downside clip is
    * a per-element `least` the oracle replays with `list_transform`.
    */
  def sortino(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("ra")))
      .withColumn("d2", foldSumSq(transform(col("ra"), x => least(x, lit(0.0)))))
      .withColumn("dd", sqrt(col("d2") / n))
      .withColumn("sortino", u6((col("s") / n) /
        when(col("dd") === 0, lit(null)).otherwise(col("dd"))))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        u6(col("s") / n).as("mean_ret"),
        u6(col("dd")).as("downside_dev"), col("sortino"))
      .orderBy(col("asset_id"))
  }

  /** B72 `calmar` — annualized mean return over the magnitude of the
    * maximum drawdown (all-time running peak, not [[ulcerIndex]]'s
    * rolling window). The drawdown side needs NO float folds: running
    * peak is a cumulative window max and max-drawdown a plain min of
    * the micro-rounded per-day drawdowns — order-independent in any
    * engine; only the mean return reuses the sequential-fold idiom.
    */
  def calmar(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .withColumn("peak", max(col("value")).over(cum))
      .withColumn("dd", u6((col("value") - col("peak")) /
        when(col("peak") === 0, lit(null)).otherwise(col("peak"))))
      .groupBy(col("asset_id"))
      .agg(
        transform(array_sort(collect_list(when(col("ret").isNotNull,
          struct(col("date"), col("ret"))))), s => s("ret")).as("ra"),
        min(col("dd")).as("max_dd"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("mean_ret", u6(foldSum(col("ra")) / n))
      .withColumn("calmar", u6(col("mean_ret") * lit(252.0) /
        when(abs(col("max_dd")) === 0, lit(null)).otherwise(abs(col("max_dd")))))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        col("mean_ret"), col("max_dd"), col("calmar"))
      .orderBy(col("asset_id"))
  }

  /** B73 `cusum` — two-sided CUSUM change-point detection on daily
    * returns (Page 1954): s⁺_t = max(0, s⁺_{t−1} + r_t − k),
    * s⁻_t = min(0, s⁻_{t−1} + r_t + k), alarm when either breaches ±h.
    *
    * The recursion is NOT run as a stateful fold: with C'_t = Σ(r−k)
    * the identity s⁺_t = C'_t − min(0, cummin C'_t) (and dually for
    * s⁻) turns it into cumulative-sum + cumulative-extremum windows.
    * Returns are micro-unit INTEGERS (floor(r·10⁶+0.5), the amihud
    * rule) so the running sums are exact in any accumulation order —
    * no sequential-fold kernel, plain windows, scales as one shuffle
    * on asset_id. k and h are given in micro-units.
    */
  def cusum(panel: DataFrame, kMicro: Long = 2500, hMicro: Long = 30000): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("value"), 1).over(w)
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("ret_u", floor(col("ret") * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("cp", sum(col("ret_u") - lit(kMicro)).over(cum))
      .withColumn("cn", sum(col("ret_u") + lit(kMicro)).over(cum))
      .withColumn("s_pos", col("cp") - least(lit(0L), min(col("cp")).over(cum)))
      .withColumn("s_neg", col("cn") - greatest(lit(0L), max(col("cn")).over(cum)))
      .withColumn("alarm", col("s_pos") > hMicro || col("s_neg") < -hMicro)
      .select(col("asset_id"), col("date"), col("ret"),
        (col("s_pos").cast("double") / 1000000.0).as("s_pos"),
        (col("s_neg").cast("double") / 1000000.0).as("s_neg"),
        col("alarm"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B78 `spearman_corr` — panel-aligned Spearman rank correlation per
    * asset pair: each asset's daily returns are ranked over its FULL
    * return history (SQL `rank()` — min-rank ties, documented: textbook
    * Spearman averages tie ranks, min-rank keeps every number an
    * INTEGER), pairs meet on common dates, and Pearson runs on the rank
    * pairs via exact decimal sums of integer products. No sequential
    * fold kernel and no per-pair array materialization — every
    * aggregate is order-independent and map-side combinable, a better
    * 100 TB shape than [[corrMatrix]]'s array-collect (which the float
    * co-moments there genuinely need). Only the final two-sqrt division
    * is IEEE, on exact integer inputs → deterministic.
    */
  def spearmanCorr(panel: DataFrame, assets: Seq[Long]): DataFrame = {
    val daily = KeyValue.lwwDaily(
      panel.filter(col("asset_id").isin(assets: _*)).repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val rw = Window.partitionBy(col("asset_id")).orderBy(col("ret"))
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("rr", rank().over(rw).cast("long"))
      .select(col("asset_id"), col("date"), col("rr"))
    val dec = DecimalType(38, 0)
    val joined = rets.as("a").join(rets.as("b"),
        col("a.date") === col("b.date") && col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        col("a.rr").as("ra"), col("b.rr").as("rb"))
    val n = col("n").cast(dec)
    joined.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("ra").cast(dec)).as("sa"),
        sum(col("rb").cast(dec)).as("sb"),
        sum(col("ra").cast(dec) * col("rb").cast(dec)).as("sab"),
        sum(col("ra").cast(dec) * col("ra").cast(dec)).as("sa2"),
        sum(col("rb").cast(dec) * col("rb").cast(dec)).as("sb2"))
      .filter(col("n") >= 2)
      .withColumn("num", (n * col("sab") - col("sa") * col("sb")).cast("double"))
      .withColumn("da", (n * col("sa2") - col("sa") * col("sa")).cast("double"))
      .withColumn("db", (n * col("sb2") - col("sb") * col("sb")).cast("double"))
      .withColumn("spearman", u6(col("num") /
        when(col("da") <= 0 || col("db") <= 0, lit(null))
          .otherwise(sqrt(col("da")) * sqrt(col("db")))))
      .select(col("id_a"), col("id_b"), col("n").as("n_days"), col("spearman"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** B79 `hurst` — Hurst exponent by the aggregated-variance method:
    * the variance of NON-overlapping k-day return sums scales as
    * k^(2H), so H = slope/2 of ln Var(k) on ln k over k ∈ {1,2,4,8}.
    * H ≈ 0.5 random walk, > 0.5 persistent/trending, < 0.5
    * mean-reverting.
    *
    * Determinism: returns become micro-unit INTEGERS, so bucket sums
    * and the variance co-moments are exact in any accumulation order
    * (plain sums, map-side combinable — no fold kernels); each Var(k)
    * is one double division of an exact decimal numerator. The 4-point
    * regression runs on micro-rounded ln values with explicit
    * left-associated arithmetic and the micro-rounded ln k literals
    * 0.693147 / 1.386294 / 2.079442 — the identical expression tree in
    * the oracle constant-folds to the identical doubles. One asset_id
    * shuffle; the ×4 k-replication happens AFTER the LWW collapse, on
    * daily-sized data.
    */
  def hurst(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val dec = DecimalType(38, 0)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("ret_u", floor(col("ret") * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("rn", row_number().over(w))
    val bucketed = rets
      .select(col("asset_id"), col("ret_u"), col("rn"),
        explode(array(lit(1), lit(2), lit(4), lit(8))).as("k"))
      .withColumn("bucket", expr("(rn - 1) div k"))
    val sums = bucketed
      .groupBy(col("asset_id"), col("k"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(col("ret_u")).as("s"))
      .filter(col("cnt") === col("k"))
    val vars = sums
      .groupBy(col("asset_id"), col("k"))
      .agg(count(lit(1)).as("m"),
        sum(col("s").cast(dec)).as("ss"),
        sum(col("s").cast(dec) * col("s").cast(dec)).as("ss2"))
      .filter(col("m") >= 2)
      .withColumn("vnum", (col("m").cast(dec) * col("ss2") - col("ss") * col("ss")).cast("double"))
      .withColumn("v", col("vnum") / (col("m") * (col("m") - 1)).cast("double"))
      .filter(col("v") > 0)
      .withColumn("y", u6(log(col("v"))))
    val l2 = lit(0.693147); val l4 = lit(1.386294); val l8 = lit(2.079442)
    vars
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("nk"),
        max(when(col("k") === 1, col("m"))).as("n_days"),
        max(when(col("k") === 1, col("y"))).as("y1"),
        max(when(col("k") === 2, col("y"))).as("y2"),
        max(when(col("k") === 4, col("y"))).as("y4"),
        max(when(col("k") === 8, col("y"))).as("y8"))
      .filter(col("nk") === 4)
      .withColumn("sx", l2 + l4 + l8)
      .withColumn("sy", col("y1") + col("y2") + col("y4") + col("y8"))
      .withColumn("sxy", col("y2") * l2 + col("y4") * l4 + col("y8") * l8)
      .withColumn("sx2", l2 * l2 + l4 * l4 + l8 * l8)
      .withColumn("slope",
        (lit(4.0) * col("sxy") - col("sx") * col("sy")) /
          (lit(4.0) * col("sx2") - col("sx") * col("sx")))
      .withColumn("hurst", u6(col("slope") / 2))
      .select(col("asset_id"), col("n_days"), col("hurst"))
      .orderBy(col("asset_id"))
  }

  /** B80 `half_life` — Ornstein-Uhlenbeck-style mean-reversion
    * half-life per asset: AR(1) slope φ of Δp on the lagged LWW daily
    * level, half-life = −ln 2 / ln(1+φ) when φ ∈ (−1, 0) (NULL
    * otherwise — the series isn't reverting). Regressor and regressand
    * are micro-unit integers, so all OLS co-moments are exact decimal
    * sums (order-independent, map-side combinable; the squares are
    * decimal×decimal — level micro-units square past the long range);
    * φ is one double division of exact integers, 6-dec rounded BEFORE
    * the half-life transform so the ln input is identical across
    * engines. −ln 2 is the micro-rounded literal (the hurst
    * convention).
    */
  def halfLife(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val dec = DecimalType(38, 0)
    daily
      .select(col("asset_id"), col("date"), col("value"), prev.as("pv"))
      .filter(col("pv").isNotNull)
      .withColumn("dp", u6(col("value") - col("pv")))
      .withColumn("x", floor(col("pv") * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("y", floor(col("dp") * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sx2"))
      .filter(col("n") >= 3)
      .withColumn("num", (col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).cast("double"))
      .withColumn("den", (col("n").cast(dec) * col("sx2") - col("sx") * col("sx")).cast("double"))
      .withColumn("phi", u6(col("num") / when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .withColumn("half_life",
        when(col("phi") > -1 && col("phi") < 0,
          u6(lit(-0.693147) / log(lit(1.0) + col("phi")))))
      .select(col("asset_id"), col("n").as("n_obs"), col("phi"), col("half_life"))
      .orderBy(col("asset_id"))
  }

  /** B81 `benford` — Benford first-significant-digit audit over the
    * lineitem extended prices: observed per-mille share of each leading
    * digit 1-9 beside the Benford expectation round(log10(1+1/d)·1000)
    * and the signed deviation. The first significant digit comes from
    * the decimal STRING (first nonzero char) — no float log10 touches
    * the data path; counts, shares and deviations are all integers
    * (the expectations are baked-in literals, identical in the oracle).
    * One scan → 9-row aggregate; the total joins back as a broadcast
    * 1-row cross join.
    */
  def benford(lineitem: DataFrame): DataFrame = {
    val counts = lineitem
      .select(regexp_extract(col("l_extendedprice").cast("string"), "[1-9]", 0).as("d"))
      .filter(col("d") =!= "")
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
    val expected = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
    // Grand total as an empty-frame window over the ≤9 digit rows, not a
    // crossJoin(broadcast(1-row agg)) — that shape plans as a
    // BroadcastNestedLoopJoin (the plan-audit anti-pattern); the window
    // is a single tiny exchange over an already-aggregated input.
    counts
      .withColumn("tot", sum(col("n")).over(Window.partitionBy()))
      .withColumn("digit", col("d").cast("int"))
      .withColumn("obs_pm", expr("(1000 * n) div tot"))
      .withColumn("exp_pm", element_at(array(expected.map(lit): _*), col("digit")))
      .withColumn("dev_pm", col("obs_pm") - col("exp_pm"))
      .select(col("digit"), col("n"), col("obs_pm"), col("exp_pm"), col("dev_pm"))
      .orderBy(col("digit"))
  }

  /** 2·ln2 − 1, the Garman–Klass close-open weight. */
  private val TwoLn2m1 = 0.3862943611198906

  /** B82 `garman_klass` — Garman–Klass range-based volatility over the
    * daily bars: per-day x = ½(ln H/L)² − (2ln2−1)(ln C/O)², rolling
    * σ_GK = √(max(Σ_frame x, 0)/n). Uses all four bar fields, ~7×
    * close-to-close efficiency — the standard upgrade over
    * [[parkinsonVol]] when opens are reliable. Σx can dip below zero
    * on short frames (x itself may be negative); clamped at 0 before
    * the √, documented contract.
    *
    * Determinism: each squared log is rounded to 6 decimals BEFORE the
    * constant-weight combine (absorbing the `ln` last-ulp), x again to
    * 6, the frame fold is sequential, √ IEEE-exact. Same
    * single-shuffle asset_id plan as [[parkinsonVol]].
    */
  def garmanKlass(panel: DataFrame, window: Int = 20): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val lhl = log(col("high") / col("low"))
    val lco = log(col("close") / col("open"))
    dailyBars(panel.repartition(col("asset_id")))
      .filter(col("low") > 0 && col("open") > 0)
      .withColumn("a", u6(lhl * lhl))
      .withColumn("b", u6(lco * lco))
      .withColumn("x", u6(lit(0.5) * col("a") - lit(TwoLn2m1) * col("b")))
      .withColumn("arr", collect_list(col("x")).over(frame))
      .withColumn("n", size(col("arr")).cast("double"))
      .withColumn("gk", u6(sqrt(
        greatest(Kernels.seqFold(col("arr"), "sum"), lit(0.0)) / col("n"))))
      .select(col("asset_id"), col("date"), col("x"), col("gk"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B83 `herfindahl` — per-date Herfindahl–Hirschman concentration of
    * trading activity across assets: HHI = Σ_i s_i² with
    * s_i = n_ticks_i / Σ n_ticks. Flags days where activity collapses
    * onto few names (market-quality monitor; 1/HHI is the effective
    * number of active assets).
    *
    * ALL-INTEGER: HHI = Σn² / (Σn)² — numerator and denominator are
    * exact integer aggregates (order-free, map-side combinable), the
    * single division rounds in integer space ((2·10⁶·num + den) div
    * 2·den). One shuffle to (asset_id, date) bars, one calendar-sized
    * re-agg to dates — no floats anywhere.
    */
  def herfindahl(panel: DataFrame): DataFrame = {
    dailyBars(panel.repartition(col("asset_id")))
      .groupBy(col("date"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_ticks")).as("total_ticks"),
        sum(col("n_ticks") * col("n_ticks")).as("sum_sq"))
      .withColumn("hhi_micro",
        expr("(2 * 1000000 * sum_sq + total_ticks * total_ticks) div (2 * total_ticks * total_ticks)"))
      .select(col("date"), col("n_assets"), col("total_ticks"), col("hhi_micro"))
      .orderBy(col("date"))
  }

  /** B84 `omega_ratio` — Omega(τ=0) per asset: Σ gains / Σ losses over
    * the daily returns — the full-distribution upgrade over
    * [[sharpe]]/[[sortino]] (uses every moment, not just the first
    * two; Ω>1 ⇔ positive expectancy).
    *
    * ALL-INTEGER: returns are 6-decimal by construction, so gain/loss
    * sums are exact integer micro-unit aggregates in any order; the
    * single ratio rounds in integer space to micro units, NULL when
    * the asset never lost (Ω undefined/infinite). One shuffle on
    * asset_id, asset-sized output.
    */
  def omegaRatio(panel: DataFrame): DataFrame = {
    dailyReturns(panel)
      .filter(col("ret").isNotNull)
      .withColumn("ret_micro", round(col("ret") * 1e6).cast("long"))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("ret_micro") > 0, col("ret_micro")).otherwise(0L)).as("gains_micro"),
        sum(when(col("ret_micro") < 0, -col("ret_micro")).otherwise(0L)).as("losses_micro"))
      .withColumn("omega_micro",
        when(col("losses_micro") > 0,
          expr("(2 * 1000000 * gains_micro + losses_micro) div (2 * losses_micro)")))
      .select(col("asset_id"), col("n_days"), col("gains_micro"),
        col("losses_micro"), col("omega_micro"))
      .orderBy(col("asset_id"))
  }

  /** B85 `melt_long` — UNPIVOT: the daily OHLC bars melted to one row
    * per (asset, date, field) — the inverse surface of [[pivotWide]],
    * closing the reshape pair every OLAP engine ships. Spark's `stack`
    * generator runs inside whole-stage codegen (one scan, no join, no
    * shuffle beyond the bar aggregate); output size = 4× bars,
    * linear at any scale. Values pass through untouched — exact.
    */
  def meltLong(panel: DataFrame): DataFrame = {
    dailyBars(panel.repartition(col("asset_id")))
      .selectExpr("asset_id", "date",
        "stack(4, 'open', open, 'high', high, 'low', low, 'close', close) AS (field, value)")
      .orderBy(col("asset_id"), col("date"), col("field"))
  }

  /** The equal-weight "market" return per date, shared by the
    * benchmark-relative family ([[beta]] builds its own copy inline;
    * [[informationRatio]]/[[downsideBeta]]/[[treynor]] use this): mean
    * of the per-asset daily returns, deterministically folded in
    * asset_id order. Broadcast-sized by construction — one row per
    * trading day regardless of corpus width.
    */
  private[graft] def marketReturns(rets: DataFrame): DataFrame =
    rets
      .groupBy(col("date"))
      .agg(transform(array_sort(collect_list(struct(col("asset_id"), col("ret")))),
        s => s("ret")).as("marr"))
      .select(col("date"),
        u6(foldSum(col("marr")) / size(col("marr")).cast("double")).as("mkt_ret"))

  /** B86 `information_ratio` — mean active return over the equal-weight
    * market divided by tracking error (sample std of active returns),
    * per asset. THE number an active strategy is judged by. Scale
    * shape: one asset_id shuffle for the return series, the per-date
    * market is broadcast back (tiny — |dates| rows), then one fold per
    * asset. Determinism: active returns rounded to 6 before the
    * sequential fold, same discipline as [[sharpe]].
    */
  def informationRatio(panel: DataFrame): DataFrame = {
    val rets = dailyReturns(panel)
    val n = col("n")
    rets.join(broadcast(marketReturns(rets)), Seq("date"))
      .withColumn("active", u6(col("ret") - col("mkt_ret")))
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("active")))),
        s => s("active")).as("aa"))
      .withColumn("n", size(col("aa")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("aa")))
      .withColumn("s2", foldSumSq(col("aa")))
      .withColumn("te", sqrt(greatest((n * col("s2") - col("s") * col("s")) / (n * (n - 1)), lit(0.0))))
      .withColumn("ir", u6((col("s") / n) /
        when(col("te") === 0, lit(null)).otherwise(col("te"))))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        u6(col("s") / n).as("mean_active"), col("ir"))
      .orderBy(col("asset_id"))
  }

  /** B87 `downside_beta` — Estrada's D-CAPM downside beta:
    * β_D = Σ min(r−μ, 0)·min(rm−μm, 0) / Σ min(rm−μm, 0)², with the
    * means taken over the asset's own sample. Co-movement measured ONLY
    * through below-mean deviations — the asymmetry number risk teams
    * watch, since downside co-movement is what diversification is for.
    * (The naive "days the market fell" conditioning is degenerate on
    * drift-dominated series — this synthetic panel's equal-weight
    * market never falls — which is exactly why Estrada demeans first.)
    * Same single-shuffle fold shape as [[beta]]; deviations rounded to
    * 6 before the sequential products so both engines fold identical
    * doubles.
    */
  def downsideBeta(panel: DataFrame): DataFrame = {
    val rets = dailyReturns(panel)
    val n = col("n")
    rets.select(col("asset_id"), col("date"), col("ret"))
      .join(broadcast(marketReturns(rets)), Seq("date"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("mkt_ret")))).as("h"))
      .withColumn("ra", transform(col("h"), s => s("ret")))
      .withColumn("rm", transform(col("h"), s => s("mkt_ret")))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("ma", foldSum(col("ra")) / n)
      .withColumn("mm", foldSum(col("rm")) / n)
      .withColumn("da", transform(col("ra"), x => u6(least(x - col("ma"), lit(0.0)))))
      .withColumn("dm", transform(col("rm"), x => u6(least(x - col("mm"), lit(0.0)))))
      .withColumn("sp", foldSum(zip_with(col("da"), col("dm"), (x, y) => x * y)))
      .withColumn("sm2", foldSumSq(col("dm")))
      .withColumn("n_down", size(filter(col("dm"), x => x < 0)).cast("long"))
      .withColumn("downside_beta", u6(col("sp") /
        when(col("sm2") === 0, lit(null)).otherwise(col("sm2"))))
      .select(col("asset_id"), n.cast("long").as("n_days"), col("n_down"), col("downside_beta"))
      .orderBy(col("asset_id"))
  }

  /** B88 `treynor` — mean excess return per unit of SYSTEMATIC risk
    * (beta), the companion ratio to [[sharpe]]'s per-unit-of-total-risk:
    * treynor = mean_ret / beta. One plan computes the regression
    * aggregates and the mean — no second pass over the panel, no join
    * of two query results. Betas within ±0.01 of zero yield NULL (the
    * ratio is meaningless at the singularity, and a hard zero guard
    * alone would let 1e-9 betas produce absurd million-scale ratios).
    */
  def treynor(panel: DataFrame): DataFrame = {
    val rets = dailyReturns(panel)
    val n = col("n")
    rets.select(col("asset_id"), col("date"), col("ret"))
      .join(broadcast(marketReturns(rets)), Seq("date"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("mkt_ret")))).as("h"))
      .withColumn("ra", transform(col("h"), s => s("ret")))
      .withColumn("rm", transform(col("h"), s => s("mkt_ret")))
      .withColumn("rp", transform(col("h"), s => s("ret") * s("mkt_ret")))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("sa", foldSum(col("ra")))
      .withColumn("sm", foldSum(col("rm")))
      .withColumn("sp", foldSum(col("rp")))
      .withColumn("sm2", foldSumSq(col("rm")))
      .withColumn("den", n * col("sm2") - col("sm") * col("sm"))
      .withColumn("beta", u6((n * col("sp") - col("sa") * col("sm")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .withColumn("treynor", u6((col("sa") / n) /
        when(abs(col("beta")) < 0.01, lit(null)).otherwise(col("beta"))))
      .select(col("asset_id"), n.cast("long").as("n_days"), col("beta"), col("treynor"))
      .orderBy(col("asset_id"))
  }

  /** B89 `overnight_gap` — open-versus-prior-close dislocation per
    * (asset, day): gap = open/prev_close − 1, the overnight-news move a
    * daily bar hides. Rides [[dailyBars]]' single asset_id shuffle; the
    * lag is window-local, no extra exchange. Ratio of two UNCOMBINED
    * stored values rounded to 6 — no FP accumulation, exact in any
    * engine.
    */
  def overnightGap(panel: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("prev_close", lag(col("close"), 1).over(w))
      .filter(col("prev_close").isNotNull)
      .withColumn("gap", u6(col("open") /
        when(col("prev_close") === 0, lit(null)).otherwise(col("prev_close")) - 1))
      .select(col("asset_id"), col("date"), col("open"), col("prev_close"), col("gap"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B90 `vol_of_vol` — volatility of volatility: sample std of the
    * rolling-vol series per asset, beside its mean. A regime-stability
    * number — two assets with the SAME average vol but different
    * vol-of-vol need different position sizing (vol targeting breaks
    * exactly when this is high). Rides [[rollingVolCore]]'s single
    * asset_id shuffle (the groupBy re-uses the same partitioning, so
    * the second aggregate is exchange-free); the fold runs over the
    * 6-dec-rounded vol series, engine-exact.
    */
  def volOfVol(panel: DataFrame, window: Int = 20): DataFrame = {
    val n = col("n")
    rollingVolCore(panel, window)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("vol")))),
        s => s("vol")).as("va"))
      .withColumn("n", size(col("va")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("va")))
      .withColumn("s2", foldSumSq(col("va")))
      .withColumn("mean_vol", u6(col("s") / n))
      .withColumn("vol_of_vol", u6(sqrt(greatest(
        (n * col("s2") - col("s") * col("s")) / (n * (n - 1)), lit(0.0)))))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        col("mean_vol"), col("vol_of_vol"))
      .orderBy(col("asset_id"))
  }

  /** B95 `aroon` — Aroon up/down over the daily bars: bars since the
    * channel's highest high / lowest low inside a `span`-bar frame,
    * mapped to 0..100. Positions are found by value-match against the
    * frame extreme on the REVERSED frame array (first match from the
    * end = most recent extreme — the tie convention documented here;
    * floats compare as exact copies of stored values, no arithmetic).
    * Distance is all-integer; only the final ×100/span division is
    * FP, u6-rounded. One asset_id shuffle shared with the bar build.
    */
  def aroon(panel: DataFrame, span: Int = 25): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("harr", reverse(collect_list(col("high")).over(frame)))
      .withColumn("larr", reverse(collect_list(col("low")).over(frame)))
      .withColumn("d_hi", (array_position(col("harr"), array_max(col("harr"))) - 1).cast("long"))
      .withColumn("d_lo", (array_position(col("larr"), array_min(col("larr"))) - 1).cast("long"))
      .withColumn("aroon_up", u6(lit(100.0) * (lit(span) - col("d_hi")) / lit(span.toDouble)))
      .withColumn("aroon_dn", u6(lit(100.0) * (lit(span) - col("d_lo")) / lit(span.toDouble)))
      .select(col("asset_id"), col("date"), col("d_hi"), col("d_lo"),
        col("aroon_up"), col("aroon_dn"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B96 `mfi` — Money Flow Index over the daily bars: typical price
    * tp = (h+l+c)/3 (u6), raw money flow = tp·n_ticks (tick count is
    * the bar's volume proxy, as in [[obv]]), classified positive /
    * negative by tp vs previous tp (comparisons on ROUNDED values —
    * engine-exact). MFI = 100·ΣMF⁺/(ΣMF⁺+ΣMF⁻) over a `span`-bar
    * frame; both sums are frame-ordered sequential folds so the
    * division input is bit-identical cross-engine. The first bar of an
    * asset (no previous tp) contributes to neither flow — documented
    * convention, replayed by the oracle.
    */
  def mfi(panel: DataFrame, span: Int = 14): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    val prevTp = lag(col("tp"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tp", u6((col("high") + col("low") + col("close")) / 3))
      .withColumn("mf", u6(col("tp") * col("n_ticks").cast("double")))
      .withColumn("mf_pos",
        when(prevTp.isNotNull && col("tp") > prevTp, col("mf")).otherwise(lit(0.0)))
      .withColumn("mf_neg",
        when(prevTp.isNotNull && col("tp") < prevTp, col("mf")).otherwise(lit(0.0)))
      .withColumn("sum_pos", foldSum(collect_list(col("mf_pos")).over(frame)))
      .withColumn("sum_neg", foldSum(collect_list(col("mf_neg")).over(frame)))
      .withColumn("mfi", u6(lit(100.0) * col("sum_pos") /
        when(col("sum_pos") + col("sum_neg") === 0, lit(null))
          .otherwise(col("sum_pos") + col("sum_neg"))))
      .select(col("asset_id"), col("date"), col("tp"), col("mfi"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B97 `elder_ray` — Elder-Ray bull/bear power over the daily bars:
    * the span-bounded EW mean of the close (the [[keltner]] mid-line
    * machinery) is the consensus value; bull = high − EMA (buyer reach
    * above it), bear = low − EMA. The EMA is u6-rounded BEFORE the
    * subtractions so each output is one exact difference of rounded
    * values — no new determinism surface.
    */
  def elderRay(panel: DataFrame, span: Int = 13): DataFrame = {
    val w = 1.0 - 2.0 / (span + 1.0)
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("carr", collect_list(col("close")).over(frame))
      .withColumn("ema", u6(
        Kernels.seqFold(col("carr"), "horner", w) /
          Kernels.seqFold(col("carr"), "horner_count", w)))
      .withColumn("bull_power", u6(col("high") - col("ema")))
      .withColumn("bear_power", u6(col("low") - col("ema")))
      .select(col("asset_id"), col("date"), col("ema"),
        col("bull_power"), col("bear_power"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B98 `force_index` — Elder's Force Index over the daily bars:
    * FI = (close − prevClose)·n_ticks (price move × volume proxy),
    * smoothed by the span-bounded EW mean of the ROUNDED FI series.
    * First bar per asset (no previous close) is dropped — the frame
    * then covers only defined FI values, so the fold never sees a
    * null. Same single asset_id shuffle as the whole bar family.
    */
  def forceIndex(panel: DataFrame, span: Int = 13): DataFrame = {
    val w = 1.0 - 2.0 / (span + 1.0)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("prev_close", lag(col("close"), 1).over(byAsset))
      .filter(col("prev_close").isNotNull)
      .withColumn("fi", u6((col("close") - col("prev_close")) * col("n_ticks").cast("double")))
      .withColumn("farr", collect_list(col("fi")).over(frame))
      .withColumn("fi_ema", u6(
        Kernels.seqFold(col("farr"), "horner", w) /
          Kernels.seqFold(col("farr"), "horner_count", w)))
      .select(col("asset_id"), col("date"), col("fi"), col("fi_ema"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B99 `vortex` — Vortex indicator over the daily bars: VI⁺ =
    * Σ|high − prevLow| / ΣTR, VI⁻ = Σ|low − prevHigh| / ΣTR over a
    * `span`-bar frame (uptrend bars overlap yesterday's low, downtrend
    * bars yesterday's high). Each per-bar term is u6-rounded, the
    * frame sums are sequential folds, the divisions u6 — the full
    * determinism discipline. First bar per asset (no previous bar) is
    * dropped so folds see no nulls.
    */
  def vortex(panel: DataFrame, span: Int = 14): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    val prevClose = lag(col("close"), 1).over(byAsset)
    val prevLow = lag(col("low"), 1).over(byAsset)
    val prevHigh = lag(col("high"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("pc", prevClose).withColumn("pl", prevLow).withColumn("ph", prevHigh)
      .filter(col("pc").isNotNull)
      .withColumn("vm_p", u6(abs(col("high") - col("pl"))))
      .withColumn("vm_m", u6(abs(col("low") - col("ph"))))
      .withColumn("tr", u6(greatest(
        col("high") - col("low"),
        abs(col("high") - col("pc")),
        abs(col("low") - col("pc")))))
      .withColumn("s_vp", foldSum(collect_list(col("vm_p")).over(frame)))
      .withColumn("s_vm", foldSum(collect_list(col("vm_m")).over(frame)))
      .withColumn("s_tr", foldSum(collect_list(col("tr")).over(frame)))
      .withColumn("vi_plus", u6(col("s_vp") /
        when(col("s_tr") === 0, lit(null)).otherwise(col("s_tr"))))
      .withColumn("vi_minus", u6(col("s_vm") /
        when(col("s_tr") === 0, lit(null)).otherwise(col("s_tr"))))
      .select(col("asset_id"), col("date"), col("vi_plus"), col("vi_minus"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B100 `chaikin_osc` — Chaikin oscillator over the daily bars: the
    * accumulation/distribution line is the running sum of CLV·volume
    * where CLV = ((c−l)−(h−c))/(h−l) (0 on a flat bar, the classic
    * convention); the oscillator is EMA(3) − EMA(10) of the AD line.
    * The AD running sum is computed in INTEGER MICRO-UNITS (CLV is
    * u6-rounded → exact integer micros, × the integer tick count) so
    * the unbounded cumulative sum is order-insensitive integer
    * arithmetic — no O(n²) fold array over full history, exact under
    * any engine. AD micros stay far below 2⁵³, so the double used by
    * the bounded EW frames is exact.
    */
  def chaikinOsc(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val run = byAsset.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val f3 = byAsset.rowsBetween(-2, Window.currentRow)
    val f10 = byAsset.rowsBetween(-9, Window.currentRow)
    val w3 = 0.5            // 1 - 2/(3+1)
    val w10 = 1.0 - 2.0 / 11.0
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("clv", when(col("high") === col("low"), lit(0.0))
        .otherwise(u6(((col("close") - col("low")) - (col("high") - col("close"))) /
          (col("high") - col("low")))))
      .withColumn("mfv_micro",
        round(col("clv") * 1e6).cast("long") * col("n_ticks"))
      .withColumn("ad_micro", sum(col("mfv_micro")).over(run))
      .withColumn("ad", col("ad_micro").cast("double") / 1e6)
      .withColumn("a3", collect_list(col("ad")).over(f3))
      .withColumn("a10", collect_list(col("ad")).over(f10))
      .withColumn("ema3", u6(
        Kernels.seqFold(col("a3"), "horner", w3) /
          Kernels.seqFold(col("a3"), "horner_count", w3)))
      .withColumn("ema10", u6(
        Kernels.seqFold(col("a10"), "horner", w10) /
          Kernels.seqFold(col("a10"), "horner_count", w10)))
      .withColumn("chaikin", u6(col("ema3") - col("ema10")))
      .select(col("asset_id"), col("date"), col("ad"), col("chaikin"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B101 `kelly_fraction` — full-Kelly sizing per asset: mean daily
    * return / return variance (the log-growth-optimal bet fraction
    * under the quadratic approximation). Same full-history fold shape
    * as [[sharpe]] — one asset_id shuffle, Σ/Σ² folds over the
    * date-ordered 6-dec return array, u6 ratio with a zero-variance
    * guard.
    */
  def kellyFraction(panel: DataFrame): DataFrame = {
    val rets = dailyReturnsCore(panel)
    val n = col("n")
    rets
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("ra")))
      .withColumn("s2", foldSumSq(col("ra")))
      .withColumn("mean_ret", u6(col("s") / n))
      .withColumn("variance", (n * col("s2") - col("s") * col("s")) / (n * (n - 1)))
      .withColumn("kelly", u6((col("s") / n) /
        when(col("variance") <= 0, lit(null)).otherwise(col("variance"))))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        col("mean_ret"), u6(col("variance")).as("variance"), col("kelly"))
      .orderBy(col("asset_id"))
  }

  /** B102 `tail_ratio` — right-tail/left-tail asymmetry per asset: the
    * k-th best daily return over |k-th worst| with k = ⌈q·n⌉ — the
    * same integer-cut quantile convention as [[varCvar]] (no
    * interpolation, sort-then-index on the 6-dec return array). >1
    * means crashes are smaller than rallies at the q tail. NULL when
    * the worst return is non-negative (no left tail to compare).
    */
  def tailRatio(panel: DataFrame, q: Double = 0.05): DataFrame = {
    val rets = dailyReturnsCore(panel)
    val k = ceil(size(col("ra")).cast("double") * q).cast("int")
    rets
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(col("ret"))).as("ra"))
      .withColumn("k", k)
      .filter(col("k") >= 1)
      .withColumn("lo", element_at(col("ra"), col("k")))
      .withColumn("hi", element_at(col("ra"), size(col("ra")) - col("k") + 1))
      .withColumn("tail_ratio", u6(col("hi") /
        when(col("lo") >= 0, lit(null)).otherwise(-col("lo"))))
      .select(col("asset_id"), size(col("ra")).cast("long").as("n_days"),
        col("k").cast("long").as("n_tail"), col("lo"), col("hi"), col("tail_ratio"))
      .orderBy(col("asset_id"))
  }

  /** B103 `rolling_sharpe` — windowed Sharpe per (asset, date): mean /
    * sample σ of the daily return over an N-day frame — [[rollingVol]]
    * with the numerator kept. The regime view [[sharpe]]'s full-history
    * number hides: the SAME folds produce both moments in one pass,
    * one asset_id shuffle.
    */
  def rollingSharpe(panel: DataFrame, window: Int = 20): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val frame = w.rowsBetween(-(window - 1), Window.currentRow)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("arr", collect_list(col("ret")).over(frame))
      .withColumn("n", size(col("arr")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("arr")))
      .withColumn("s2", foldSumSq(col("arr")))
      .withColumn("sd", sqrt(greatest(
        (n * col("s2") - col("s") * col("s")) / (n * (n - 1)), lit(0.0))))
      .withColumn("roll_sharpe", u6((col("s") / n) /
        when(col("sd") === 0, lit(null)).otherwise(col("sd"))))
      .select(col("asset_id"), col("date"), col("ret"), col("roll_sharpe"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B104 `rogers_satchell` — Rogers–Satchell range volatility: per-bar
    * term ln(h/c)·ln(h/o) + ln(l/c)·ln(l/o) (each factor pair shares a
    * sign, so the term is ≥ 0 and drift-free — the estimator's point
    * vs [[parkinsonVol]]), rolling mean over the frame, square root.
    * Same ln discipline as parkinson: the u6-rounded per-bar term is
    * the only FP crossing rows, folds do the rest.
    */
  def rogersSatchell(panel: DataFrame, window: Int = 20): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .filter(col("low") > 0)
      .withColumn("x", u6(
        log(col("high") / col("close")) * log(col("high") / col("open")) +
          log(col("low") / col("close")) * log(col("low") / col("open"))))
      .withColumn("arr", collect_list(col("x")).over(frame))
      .withColumn("n", size(col("arr")).cast("double"))
      .withColumn("rs_vol", u6(sqrt(greatest(
        Kernels.seqFold(col("arr"), "sum") / col("n"), lit(0.0)))))
      .select(col("asset_id"), col("date"), col("x"), col("rs_vol"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B105 `trix` — triple-smoothed EMA momentum: three chained
    * span-bounded EW means of the close (each stage u6-rounded before
    * feeding the next — the rounding IS the cross-engine contract),
    * TRIX = day-over-day relative change of the third. Three window
    * passes over ONE asset_id partitioning — still a single shuffle.
    */
  def trix(panel: DataFrame, span: Int = 15): DataFrame = {
    val w = 1.0 - 2.0 / (span + 1.0)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    def ewMean(c: Column): Column = u6(
      Kernels.seqFold(collect_list(c).over(frame), "horner", w) /
        Kernels.seqFold(collect_list(c).over(frame), "horner_count", w))
    val out = dailyBars(panel.repartition(col("asset_id")))
      .withColumn("e1", ewMean(col("close")))
      .withColumn("e2", ewMean(col("e1")))
      .withColumn("e3", ewMean(col("e2")))
    val prev = lag(col("e3"), 1).over(byAsset)
    out
      .withColumn("trix", u6(col("e3") /
        when(prev === 0, lit(null)).otherwise(prev) - 1))
      .select(col("asset_id"), col("date"), col("e3"), col("trix"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B106 `dpo` — detrended price oscillator: close from (span/2 + 1)
    * bars back minus the span-bar simple mean — the cycle component
    * with the trend removed. The mean is a frame-ordered fold divided
    * once; the lag is an exact stored value: one subtraction of two
    * u6-rounded terms.
    */
  def dpo(panel: DataFrame, span: Int = 20): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    val shift = span / 2 + 1
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("arr", collect_list(col("close")).over(frame))
      .withColumn("sma", u6(
        Kernels.seqFold(col("arr"), "sum") / size(col("arr")).cast("double")))
      .withColumn("ref_close", lag(col("close"), shift).over(byAsset))
      .withColumn("dpo", u6(col("ref_close") - col("sma")))
      .select(col("asset_id"), col("date"), col("close"), col("sma"), col("dpo"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B107 `coppock` — Coppock curve (daily variant of the classic
    * monthly momentum gauge): front-weighted moving average (weights
    * 1..n, newest heaviest) of ROC(14) + ROC(11). The weighted sum is
    * a zip-with-index product folded in frame order; the weight total
    * n(n+1)/2 is integer. Bars without both ROCs are dropped so folds
    * never see nulls.
    */
  def coppock(panel: DataFrame, wma: Int = 10): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(wma - 1), Window.currentRow)
    def roc(k: Int): Column = {
      val prev = lag(col("close"), k).over(byAsset)
      u6(col("close") / when(prev === 0, lit(null)).otherwise(prev) - 1)
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("rc", u6(roc(14) + roc(11)))
      .filter(col("rc").isNotNull)
      .withColumn("arr", collect_list(col("rc")).over(frame))
      .withColumn("wnum", Kernels.seqFold(
        zip_with(col("arr"), sequence(lit(1), size(col("arr"))), (x, i) => x * i), "sum"))
      .withColumn("coppock", u6(col("wnum") /
        (size(col("arr")) * (size(col("arr")) + 1) / 2).cast("double")))
      .select(col("asset_id"), col("date"), col("rc"), col("coppock"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B108 `corwin_schultz` — Corwin–Schultz high–low spread estimator:
    * the bid–ask spread implied by the ratio of single-bar to two-bar
    * price ranges (variance grows with time, spread doesn't — that
    * asymmetry identifies it). β = Σ of the two bars' squared log
    * ranges, γ = the squared log range of the two-bar envelope,
    * α = (√(2β) − √β)/(3 − 2√2) − √(γ/(3 − 2√2)),
    * S = 2(e^α − 1)/(1 + e^α); the customary floor at 0 is kept as a
    * separate column. Per-bar log ranges are u6-rounded before any
    * combination; α is u6-rounded before exp so both engines
    * exponentiate the identical double (the [[parkinsonVol]]/zipf ln
    * discipline extended to exp).
    */
  /** |exp arg| bound below which one double ulp of exp() stays far
    * under the 1e-6 micro grid, so JVM-vs-libm last-ulp freedom cannot
    * cross a u6 rounding boundary (the intraday_overnight_split
    * lesson, r7). Emitters that exponentiate a u6/micro-grid argument
    * null out beyond it BY CONSTRUCTION — extreme data degrades to
    * NULL, never to a silent cross-engine flap.
    */
  val ExpSafeArg = 21.0

  def corwinSchultz(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val d = lit(3.0) - lit(2.0) * sqrt(lit(2.0))
    val ph = lag(col("high"), 1).over(byAsset)
    val pl = lag(col("low"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .filter(col("low") > 0)
      .withColumn("x", u6(log(col("high") / col("low"))))
      .withColumn("px", lag(col("x"), 1).over(byAsset))
      .withColumn("hh", greatest(col("high"), ph))
      .withColumn("ll", least(col("low"), pl))
      .filter(col("px").isNotNull && col("ll") > 0)
      .withColumn("beta", u6(col("x") * col("x") + col("px") * col("px")))
      .withColumn("gamma", u6(log(col("hh") / col("ll")) * log(col("hh") / col("ll"))))
      .withColumn("alpha", u6(
        (sqrt(lit(2.0) * col("beta")) - sqrt(col("beta"))) / d - sqrt(col("gamma") / d)))
      // |α| beyond ExpSafeArg → NULL by construction (never hit by real
      // spreads — α is a log-range combination ≪ 1 — but guarded so the
      // exp-ulp class can't ship silently on degenerate data).
      .withColumn("spread", when(abs(col("alpha")) > ExpSafeArg, lit(null).cast("double"))
        .otherwise(u6(
          lit(2.0) * (exp(col("alpha")) - 1) / (lit(1.0) + exp(col("alpha"))))))
      .withColumn("spread_pos", when(col("spread").isNull, lit(null).cast("double"))
        .otherwise(greatest(col("spread"), lit(0.0))))
      .select(col("asset_id"), col("date"), col("beta"), col("gamma"),
        col("spread"), col("spread_pos"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B109 `vol_cone` — the volatility cone: the distribution (min /
    * quartiles / max) of rolling realized vol at several horizons —
    * the term-structure backdrop an options desk plots a current vol
    * against. Re-uses [[rollingVolCore]] per horizon (each a single
    * asset_id shuffle over the SAME scan — Spark shares the cached
    * read), then one tiny per-horizon aggregate; quantiles are
    * [[varCvar]]-style integer cuts on the sorted vol array — no
    * interpolation, engine-exact.
    */
  /** B110 `adx` — Wilder's Average Directional Index: directional
    * movement (+DM/−DM — today's range expansion beyond yesterday's,
    * whichever side dominates), EW-summed against true range to give
    * +DI/−DI, their normalized divergence DX, and ADX = the EW mean of
    * the ROUNDED DX series. Both DI ratios use UNNORMALIZED Horner
    * sums (the [[rsi]] cancellation), every ratio is u6 with the
    * flat-market convention DI = DX = 0 when its denominator is 0 —
    * zero, not NULL, so frame arrays never carry nulls into folds
    * (Spark's collect_list drops nulls where DuckDB's list() keeps
    * them; the zero convention sidesteps that engine divergence).
    * First bar per asset dropped; one asset_id shuffle.
    */
  def adx(panel: DataFrame, span: Int = 14): DataFrame = {
    val w = (span - 1).toDouble / span
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    def ewSum(c: Column): Column = Kernels.seqFold(collect_list(c).over(frame), "horner", w)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("up", col("high") - lag(col("high"), 1).over(byAsset))
      .withColumn("dn", lag(col("low"), 1).over(byAsset) - col("low"))
      .withColumn("pc", lag(col("close"), 1).over(byAsset))
      .filter(col("pc").isNotNull)
      .withColumn("dm_p", u6(when(col("up") > col("dn") && col("up") > 0, col("up")).otherwise(lit(0.0))))
      .withColumn("dm_m", u6(when(col("dn") > col("up") && col("dn") > 0, col("dn")).otherwise(lit(0.0))))
      .withColumn("tr", u6(greatest(
        col("high") - col("low"),
        abs(col("high") - col("pc")),
        abs(col("low") - col("pc")))))
      .withColumn("sp", ewSum(col("dm_p")))
      .withColumn("sm", ewSum(col("dm_m")))
      .withColumn("st", ewSum(col("tr")))
      .withColumn("di_plus", u6(when(col("st") === 0, lit(0.0))
        .otherwise(lit(100.0) * col("sp") / col("st"))))
      .withColumn("di_minus", u6(when(col("st") === 0, lit(0.0))
        .otherwise(lit(100.0) * col("sm") / col("st"))))
      .withColumn("dx", u6(when(col("di_plus") + col("di_minus") === 0, lit(0.0))
        .otherwise(lit(100.0) * abs(col("di_plus") - col("di_minus")) /
          (col("di_plus") + col("di_minus")))))
      .withColumn("adx", u6(
        Kernels.seqFold(collect_list(col("dx")).over(frame), "horner", w) /
          Kernels.seqFold(collect_list(col("dx")).over(frame), "horner_count", w)))
      .select(col("asset_id"), col("date"), col("di_plus"), col("di_minus"),
        col("dx"), col("adx"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B111 `mass_index` — Dorsey's Mass Index: the 25-bar sum of
    * EMA9(range)/EMA9(EMA9(range)) — range-compression "bulges"
    * flagging reversals without a direction. Each EW stage is
    * u6-rounded before feeding the next ([[trix]]' chaining rule);
    * all-flat frames use the ratio = 0 convention (zero range carries
    * zero mass) so folds never see nulls. One asset_id shuffle.
    */
  def massIndex(panel: DataFrame, ema: Int = 9, window: Int = 25): DataFrame = {
    val w = 1.0 - 2.0 / (ema + 1.0)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val eframe = byAsset.rowsBetween(-(ema - 1), Window.currentRow)
    val sframe = byAsset.rowsBetween(-(window - 1), Window.currentRow)
    def ewMean(c: Column): Column = u6(
      Kernels.seqFold(collect_list(c).over(eframe), "horner", w) /
        Kernels.seqFold(collect_list(c).over(eframe), "horner_count", w))
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("r", u6(col("high") - col("low")))
      .withColumn("e1", ewMean(col("r")))
      .withColumn("e2", ewMean(col("e1")))
      .withColumn("ratio", u6(when(col("e2") === 0, lit(0.0))
        .otherwise(col("e1") / col("e2"))))
      .withColumn("mass", u6(Kernels.seqFold(collect_list(col("ratio")).over(sframe), "sum")))
      .select(col("asset_id"), col("date"), col("r"), col("ratio"), col("mass"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B112 `yang_zhang` — Yang–Zhang volatility: the minimum-variance
    * drift-independent combination σ²_overnight + k·σ²_open-close +
    * (1−k)·σ²_RS, k = 0.34/(1.34 + (n+1)/(n−1)) — the estimator that
    * uses ALL four bar prices plus the overnight jump [[parkinsonVol]]
    * and [[rogersSatchell]] ignore. Log returns are u6-rounded per
    * bar, the two sample variances and the RS mean are frame-ordered
    * folds, k is derived from the frame's actual n with IEEE-identical
    * arithmetic — the whole expression replays bitwise.
    */
  def yangZhang(panel: DataFrame, window: Int = 20): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(window - 1), Window.currentRow)
    val n = col("n")
    def sampleVar(arr: Column): Column =
      (n * Kernels.seqFold(arr, "sumsq") -
        Kernels.seqFold(arr, "sum") * Kernels.seqFold(arr, "sum")) / (n * (n - 1))
    dailyBars(panel.repartition(col("asset_id")))
      .filter(col("low") > 0)
      .withColumn("pc", lag(col("close"), 1).over(byAsset))
      .filter(col("pc").isNotNull)
      .withColumn("o_ret", u6(log(col("open") / col("pc"))))
      .withColumn("c_ret", u6(log(col("close") / col("open"))))
      .withColumn("rs", u6(
        log(col("high") / col("close")) * log(col("high") / col("open")) +
          log(col("low") / col("close")) * log(col("low") / col("open"))))
      .withColumn("oa", collect_list(col("o_ret")).over(frame))
      .withColumn("ca", collect_list(col("c_ret")).over(frame))
      .withColumn("ra", collect_list(col("rs")).over(frame))
      .withColumn("n", size(col("oa")).cast("double"))
      .filter(n >= 2)
      .withColumn("k", lit(0.34) / (lit(1.34) + (n + 1) / (n - 1)))
      .withColumn("yz_vol", u6(sqrt(greatest(
        sampleVar(col("oa")) + col("k") * sampleVar(col("ca")) +
          (lit(1.0) - col("k")) * (Kernels.seqFold(col("ra"), "sum") / n), lit(0.0)))))
      .select(col("asset_id"), col("date"), col("o_ret"), col("c_ret"), col("yz_vol"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B113 `awesome_osc` — Bill Williams' Awesome Oscillator: SMA(5) −
    * SMA(34) of the bar midpoint (h+l)/2 — the simplest momentum
    * divergence gauge. Two fold means over one shared frame column
    * set, u6 at every boundary, one asset_id shuffle.
    */
  def awesomeOsc(panel: DataFrame, fast: Int = 5, slow: Int = 34): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val ff = byAsset.rowsBetween(-(fast - 1), Window.currentRow)
    val sf = byAsset.rowsBetween(-(slow - 1), Window.currentRow)
    def sma(frame: org.apache.spark.sql.expressions.WindowSpec): Column = {
      val arr = collect_list(col("mid")).over(frame)
      u6(Kernels.seqFold(arr, "sum") / size(arr).cast("double"))
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("mid", u6((col("high") + col("low")) / 2))
      .withColumn("sma_fast", sma(ff))
      .withColumn("sma_slow", sma(sf))
      .withColumn("ao", u6(col("sma_fast") - col("sma_slow")))
      .select(col("asset_id"), col("date"), col("mid"), col("ao"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B114 `chandelier_exit` — Chandelier stops: long exit = N-bar
    * highest high − m·ATR, short exit = N-bar lowest low + m·ATR
    * (trailing stops that back off with volatility). Channel extremes
    * are order-insensitive; the ATR is [[atr]]'s rounded-TR Wilder EW;
    * the two stop lines are single u6 combinations.
    */
  def chandelierExit(panel: DataFrame, span: Int = 22, mult: Double = 3.0): DataFrame = {
    val w = (span - 1).toDouble / span
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    val prevClose = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tr", u6(
        when(prevClose.isNull, col("high") - col("low"))
          .otherwise(greatest(
            col("high") - col("low"),
            abs(col("high") - prevClose),
            abs(col("low") - prevClose)))))
      .withColumn("arr", collect_list(col("tr")).over(frame))
      .withColumn("atr", u6(
        Kernels.seqFold(col("arr"), "horner", w) /
          Kernels.seqFold(col("arr"), "horner_count", w)))
      .withColumn("hh", max(col("high")).over(frame))
      .withColumn("ll", min(col("low")).over(frame))
      .withColumn("long_exit", u6(col("hh") - lit(mult) * col("atr")))
      .withColumn("short_exit", u6(col("ll") + lit(mult) * col("atr")))
      .select(col("asset_id"), col("date"), col("atr"),
        col("long_exit"), col("short_exit"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B115 `stoch_rsi` — Stochastic RSI: [[stochastic]]'s channel
    * position applied to the ROUNDED [[rsi]] series instead of price —
    * the double normalization that makes RSI regime-comparable.
    * Rolling min/max over 4-dec RSI values are exact; the one division
    * is u6 with the flat-channel NULL.
    */
  def stochRsi(panel: DataFrame, rsiSpan: Int = 60, span: Int = 14): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    rsiCore(panel, rsiSpan)
      .withColumn("lo", min(col("rsi")).over(frame))
      .withColumn("hi", max(col("rsi")).over(frame))
      .withColumn("stoch_rsi", u6(
        (col("rsi") - col("lo")) /
          when(col("hi") === col("lo"), lit(null)).otherwise(col("hi") - col("lo"))))
      .select(col("asset_id"), col("date"), col("rsi"), col("stoch_rsi"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B116 `pvo` — Percentage Volume Oscillator: 100·(EW12 − EW26)/EW26
    * of the bar's tick count (the panel's volume proxy) — volume
    * expansion/contraction normalized to be comparable across assets.
    * Integer volumes → the EW means are folds over exact inputs; one
    * u6 ratio with a zero guard (a tick count is ≥ 1, so the guard is
    * belt-and-braces).
    */
  def pvo(panel: DataFrame, fast: Int = 12, slow: Int = 26): DataFrame = {
    val wf = 1.0 - 2.0 / (fast + 1.0)
    val ws = 1.0 - 2.0 / (slow + 1.0)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    def ewMean(frame: org.apache.spark.sql.expressions.WindowSpec, weight: Double): Column = {
      val arr = collect_list(col("vol")).over(frame)
      u6(Kernels.seqFold(arr, "horner", weight) /
        Kernels.seqFold(arr, "horner_count", weight))
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("vol", col("n_ticks").cast("double"))
      .withColumn("e_fast", ewMean(byAsset.rowsBetween(-(fast - 1), Window.currentRow), wf))
      .withColumn("e_slow", ewMean(byAsset.rowsBetween(-(slow - 1), Window.currentRow), ws))
      .withColumn("pvo", u6(lit(100.0) * (col("e_fast") - col("e_slow")) /
        when(col("e_slow") === 0, lit(null)).otherwise(col("e_slow"))))
      .select(col("asset_id"), col("date"), col("e_fast"), col("e_slow"), col("pvo"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B117 `tsi` — True Strength Index: double-EW-smoothed momentum
    * over double-EW-smoothed |momentum|, ×100 — deep smoothing that
    * keeps sign fidelity (the divisor smooths the SAME series' magnitude).
    * Four chained EW means, each u6-rounded before the next stage
    * ([[trix]]' rule); final ratio u6 with a zero guard.
    */
  def tsi(panel: DataFrame, slow: Int = 25, fast: Int = 13): DataFrame = {
    val ws = 1.0 - 2.0 / (slow + 1.0)
    val wf = 1.0 - 2.0 / (fast + 1.0)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val sframe = byAsset.rowsBetween(-(slow - 1), Window.currentRow)
    val fframe = byAsset.rowsBetween(-(fast - 1), Window.currentRow)
    def ew(c: Column, frame: org.apache.spark.sql.expressions.WindowSpec, w: Double): Column = {
      val arr = collect_list(c).over(frame)
      u6(Kernels.seqFold(arr, "horner", w) / Kernels.seqFold(arr, "horner_count", w))
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("pc", lag(col("close"), 1).over(byAsset))
      .filter(col("pc").isNotNull)
      .withColumn("mom", u6(col("close") - col("pc")))
      .withColumn("amom", abs(col("mom")))
      .withColumn("e1", ew(col("mom"), sframe, ws))
      .withColumn("a1", ew(col("amom"), sframe, ws))
      .withColumn("e2", ew(col("e1"), fframe, wf))
      .withColumn("a2", ew(col("a1"), fframe, wf))
      .withColumn("tsi", u6(lit(100.0) * col("e2") /
        when(col("a2") === 0, lit(null)).otherwise(col("a2"))))
      .select(col("asset_id"), col("date"), col("mom"), col("tsi"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B118 `choppiness` — Choppiness Index:
    * 100·ln(ΣTR / (hh − ll)) / ln(n) over an n-bar frame — ≈100 when
    * price churns inside a range (ΣTR ≫ net range), low when it
    * trends. Written with ln/ln (NOT log10 — one shared ln surface
    * under the zipf discipline); ΣTR is a fold over rounded TRs,
    * channel extremes are order-free, flat channels null out.
    */
  def choppiness(panel: DataFrame, span: Int = 14): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    val prevClose = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tr", u6(
        when(prevClose.isNull, col("high") - col("low"))
          .otherwise(greatest(
            col("high") - col("low"),
            abs(col("high") - prevClose),
            abs(col("low") - prevClose)))))
      .withColumn("s_tr", Kernels.seqFold(collect_list(col("tr")).over(frame), "sum"))
      .withColumn("hh", max(col("high")).over(frame))
      .withColumn("ll", min(col("low")).over(frame))
      .withColumn("n", count(lit(1)).over(frame).cast("double"))
      .withColumn("chop", u6(
        when(col("hh") === col("ll") || col("s_tr") <= 0 || col("n") < 2, lit(null))
          .otherwise(lit(100.0) * log(col("s_tr") / (col("hh") - col("ll"))) / log(col("n")))))
      .select(col("asset_id"), col("date"), col("s_tr"), col("chop"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B119 `eom` — Ease of Movement: midpoint displacement per unit of
    * volume-scaled range, EW-smoothed — how far price travels per unit
    * of effort. Per-bar terms u6 (displacement; the box ratio
    * dist·(h−l)/volume with flat bars contributing 0), the smoother is
    * the usual rounded-series Horner mean.
    */
  def eom(panel: DataFrame, span: Int = 14): DataFrame = {
    val w = 1.0 - 2.0 / (span + 1.0)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("mid", u6((col("high") + col("low")) / 2))
      .withColumn("pmid", lag(col("mid"), 1).over(byAsset))
      .filter(col("pmid").isNotNull)
      .withColumn("dist", u6(col("mid") - col("pmid")))
      .withColumn("eom_raw", u6(
        when(col("high") === col("low"), lit(0.0))
          .otherwise(col("dist") * (col("high") - col("low")) / col("n_ticks").cast("double"))))
      .withColumn("arr", collect_list(col("eom_raw")).over(frame))
      .withColumn("eom", u6(
        Kernels.seqFold(col("arr"), "horner", w) /
          Kernels.seqFold(col("arr"), "horner_count", w)))
      .select(col("asset_id"), col("date"), col("eom_raw"), col("eom"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B120 `elder_impulse` — Elder's Impulse System: the EMA(13) slope
    * sign crossed with the MACD-histogram slope sign → 'green' (both
    * rising), 'red' (both falling), 'blue' (mixed) — the trade-permission
    * traffic light. Every sign reads a u6 difference of u6 series
    * (EMA chain + the macd fold recipe), so the label is engine-exact.
    */
  def elderImpulse(panel: DataFrame, emaSpan: Int = 13,
                   fast: Int = 12, slow: Int = 26, signal: Int = 9): DataFrame = {
    val we = 1.0 - 2.0 / (emaSpan + 1.0)
    val wf = 1.0 - 2.0 / (fast + 1.0)
    val ws = 1.0 - 2.0 / (slow + 1.0)
    val wg = 1.0 - 2.0 / (signal + 1.0)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    def ew(c: Column, span: Int, w: Double): Column = {
      val arr = collect_list(c).over(byAsset.rowsBetween(-(span - 1), Window.currentRow))
      u6(Kernels.seqFold(arr, "horner", w) / Kernels.seqFold(arr, "horner_count", w))
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("ema", ew(col("close"), emaSpan, we))
      .withColumn("macd", u6(ew(col("close"), fast, wf) - ew(col("close"), slow, ws)))
      .withColumn("sig", ew(col("macd"), signal, wg))
      .withColumn("hist", u6(col("macd") - col("sig")))
      .withColumn("d_ema", u6(col("ema") - lag(col("ema"), 1).over(byAsset)))
      .withColumn("d_hist", u6(col("hist") - lag(col("hist"), 1).over(byAsset)))
      .withColumn("impulse",
        when(col("d_ema").isNull || col("d_hist").isNull, lit(null).cast("string"))
          .when(col("d_ema") > 0 && col("d_hist") > 0, "green")
          .when(col("d_ema") < 0 && col("d_hist") < 0, "red")
          .otherwise("blue"))
      .select(col("asset_id"), col("date"), col("d_ema"), col("d_hist"), col("impulse"))
      .orderBy(col("asset_id"), col("date"))
  }

  def volCone(panel: DataFrame, horizons: Seq[Int] = Seq(5, 10, 21)): DataFrame = {
    val perH = horizons.map { h =>
      rollingVolCore(panel, h).select(lit(h.toLong).as("horizon"), col("vol"))
    }.reduce(_ unionByName _)
    // Quantiles via per-DISTINCT-vol counts + a cumulative window — the
    // ks_drift bounded-global-window shape: the 6-dec vol grid bounds
    // the window's input by value resolution, not corpus size (a
    // collect_list of every vol observation would be O(corpus) in one
    // task). The integer-cut convention matches varCvar: q-quantile =
    // min vol whose cumulative count ≥ ⌈q·n⌉ ( = sorted[⌈q·n⌉]).
    val wcum = Window.partitionBy(col("horizon")).orderBy(col("vol"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy(col("horizon"))
    def cut(q: Double): Column =
      min(when(col("cum") >= ceil(col("n_obs").cast("double") * q), col("vol")))
    perH
      .groupBy(col("horizon"), col("vol")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("n_obs", sum(col("c")).over(wtot))
      .groupBy(col("horizon"))
      .agg(max(col("n_obs")).as("n_obs"),
        min(col("vol")).as("v_min"),
        cut(0.25).as("p25"), cut(0.50).as("p50"), cut(0.75).as("p75"),
        max(col("vol")).as("v_max"))
      .orderBy(col("horizon"))
  }

  /** B121 `ad_line` — Chaikin Accumulation/Distribution line: the
    * running total of [[cmf]]'s per-bar money-flow volume
    * MFV = MFM · n_ticks (flat bars contribute 0 flow — same
    * documented convention as cmf). The cumulative sum runs on the
    * EXACT INTEGER micro-grid (the B100/vpt/williams_ad discipline —
    * the same A/D series): MFM's u6 rounding already lands every bar
    * on an integer number of micro-units, so `round(mfm·1e6)·n_ticks`
    * is an exact BIGINT and the running sum is a plain O(days) window
    * sum — order-insensitive, engine-exact — instead of the previous
    * O(days²) `collect_list` prefix arrays + compiled float fold
    * (r12 VERDICT "What's wrong" #3). Value-identical to the fold by
    * construction: the fold's float error (≲1e-9 absolute) was 5+
    * orders of magnitude inside u6's rounding quantum, and the final
    * u6 lands both forms on micro_sum/1e6 exactly. Magnitude bound:
    * |Σ mfm6·n_ticks| stays < 2^53 for any per-asset history below
    * ~9e9 cumulative ticks — far above a 25-year daily panel.
    */
  def adLine(panel: DataFrame): DataFrame = {
    val run = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("mfv6", coalesce(
        (floor((((col("close") - col("low")) - (col("high") - col("close"))) /
          when(col("high") === col("low"), lit(null)).otherwise(col("high") - col("low")))
          * lit(1000000.0) + lit(0.5)) * col("n_ticks").cast("double")).cast("long"),
        lit(0L)))
      .withColumn("ad", u6(sum(col("mfv6")).over(run).cast("double") / lit(1000000.0)))
      .select(col("asset_id"), col("date"), col("close"),
        u6(col("mfv6").cast("double") / lit(1000000.0)).as("mfv"), col("ad"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B122 `ultimate_osc` — Larry Williams' Ultimate Oscillator:
    * UO = 100·(4·a₇ + 2·a₁₄ + a₂₈)/7 where aₙ = ΣBP/ΣTR over an n-bar
    * frame, BP = close − min(low, prevClose) (buying pressure) and
    * TR = max(high, prevClose) − min(low, prevClose) (the true range
    * in its min/max form). Per-bar BP/TR are u6; every frame sum is a
    * fold over the rounded series; the first bar (no prevClose) is
    * dropped so all three frames agree on their input.
    */
  def ultimateOsc(panel: DataFrame,
                  spans: (Int, Int, Int) = (7, 14, 28)): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val pc = lag(col("close"), 1).over(byAsset)
    def avgN(n: Int): Column = {
      val frame = byAsset.rowsBetween(-(n - 1), Window.currentRow)
      val sBp = Kernels.seqFold(collect_list(col("bp")).over(frame), "sum")
      val sTr = Kernels.seqFold(collect_list(col("tr")).over(frame), "sum")
      u6(sBp / when(sTr === 0, lit(null)).otherwise(sTr))
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("pc", pc)
      .filter(col("pc").isNotNull)
      .withColumn("bp", u6(col("close") - least(col("low"), col("pc"))))
      .withColumn("tr", u6(greatest(col("high"), col("pc")) - least(col("low"), col("pc"))))
      .withColumn("a_fast", avgN(spans._1))
      .withColumn("a_mid", avgN(spans._2))
      .withColumn("a_slow", avgN(spans._3))
      .withColumn("uo", u6(lit(100.0) *
        (lit(4.0) * col("a_fast") + lit(2.0) * col("a_mid") + col("a_slow")) / lit(7.0)))
      .select(col("asset_id"), col("date"),
        col("a_fast"), col("a_mid"), col("a_slow"), col("uo"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B123 `runs_test` — Wald–Wolfowitz runs test on the signs of the
    * daily returns (zeros dropped): R runs of +/− against the
    * randomness null, z = (R − E)/√Var with E = 1 + 2n₁n₂/n and
    * Var = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)). R, n₁, n₂ are INTEGER window
    * counts (a run starts where the sign differs from its lag), so
    * the only float work is one fixed op sequence over exact
    * integers — deterministic per IEEE, no fold needed.
    */
  def runsTest(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val sgn = col("sign")
    val prev = lag(sgn, 1).over(byAsset)
    dailyReturnsCore(panel)
      .filter(col("ret") =!= 0)
      .withColumn("sign", when(col("ret") > 0, lit(1L)).otherwise(lit(0L)))
      .withColumn("new_run",
        when(prev.isNull || sgn =!= prev, lit(1L)).otherwise(lit(0L)))
      .groupBy(col("asset_id"))
      .agg(sum(sgn).as("n_pos"),
        sum(lit(1L) - sgn).as("n_neg"),
        sum(col("new_run")).as("runs"))
      .filter(col("n_pos") >= 1 && col("n_neg") >= 1)
      .withColumn("n", (col("n_pos") + col("n_neg")).cast("double"))
      .withColumn("p2", lit(2.0) * col("n_pos") * col("n_neg"))
      .withColumn("e_runs", lit(1.0) + col("p2") / col("n"))
      .withColumn("v", col("p2") * (col("p2") - col("n")) /
        (col("n") * col("n") * (col("n") - 1)))
      .withColumn("z", u6((col("runs") - col("e_runs")) /
        when(col("v") <= 0, lit(null)).otherwise(sqrt(col("v")))))
      .select(col("asset_id"), col("n_pos"), col("n_neg"), col("runs"),
        u6(col("e_runs")).as("e_runs"), col("z"))
      .orderBy(col("asset_id"))
  }

  /** B124 `kendall_tau` — Kendall's τ-b between each asset's daily
    * returns and the equal-weight market return, over all day pairs:
    * τ = (C − D)/√((n₀−tₓ)(n₀−tᵧ)). Concordance is decided by SIGN
    * COMPARISONS of the u6 return grid (never a float product), so
    * C, D, and the tie counts are exact integers; the group sizes are
    * |dates|² — the per-asset self-join is bounded by the trading
    * calendar, not the corpus, and the market side is broadcast.
    */
  def kendallTau(panel: DataFrame): DataFrame = {
    val rets = dailyReturnsCore(panel).select(col("asset_id"), col("date"), col("ret"))
    val j = rets.join(broadcast(marketReturns(rets)), Seq("date"))
    // Pair generation is a double index explode over the per-asset
    // date-sorted array — NOT a self-join, which would rebuild the
    // panel lineage twice (measured: 7 exchanges vs 3). The fan-out is
    // |dates|² rows per asset, bounded by the calendar.
    val e1 = element_at(col("arr"), col("i"))
    val e2 = element_at(col("arr"), col("jj"))
    val (r1, r2, m1, m2) = (col("r1"), col("r2"), col("m1"), col("m2"))
    j.groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("mkt_ret")))).as("arr"))
      .withColumn("n", size(col("arr")))
      .withColumn("i", explode(sequence(lit(1), col("n"))))
      .withColumn("jj", explode(when(col("i") < col("n"),
        sequence(col("i") + 1, col("n"))).otherwise(array().cast("array<int>"))))
      .select(col("asset_id"),
        e1("ret").as("r1"), e1("mkt_ret").as("m1"),
        e2("ret").as("r2"), e2("mkt_ret").as("m2"))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n0"),
        sum(when((r1 > r2 && m1 > m2) || (r1 < r2 && m1 < m2), 1L)
          .otherwise(0L)).as("concordant"),
        sum(when((r1 > r2 && m1 < m2) || (r1 < r2 && m1 > m2), 1L)
          .otherwise(0L)).as("discordant"),
        sum(when(r1 === r2, 1L).otherwise(0L)).as("tied_x"),
        sum(when(m1 === m2, 1L).otherwise(0L)).as("tied_y"))
      .withColumn("den",
        sqrt((col("n0") - col("tied_x")).cast("double")) *
          sqrt((col("n0") - col("tied_y")).cast("double")))
      .withColumn("tau", u6((col("concordant") - col("discordant")).cast("double") /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), col("n0"), col("concordant"),
        col("discordant"), col("tau"))
      .orderBy(col("asset_id"))
  }

  /** B125 `hill_tail` — Hill tail-index estimator over each asset's k
    * largest daily losses: α = k / Σᵢ₌₁..k ln(xᵢ/x₍ₖ₊₁₎) on the
    * descending loss order statistics. The ln terms are u6 before the
    * sequential fold (the zipf ln discipline); assets with fewer than
    * k+1 losses are dropped. The canonical fat-tail screen: α ≲ 3
    * means variance-of-variance trouble at scale.
    */
  def hillTail(panel: DataFrame, k: Int = 5): DataFrame = {
    dailyReturnsCore(panel)
      .filter(col("ret") < 0)
      .withColumn("loss", -col("ret"))
      .groupBy(col("asset_id"))
      .agg(reverse(array_sort(collect_list(col("loss")))).as("la"))
      .withColumn("n_loss", size(col("la")).cast("long"))
      .filter(col("n_loss") >= k + 1)
      .withColumn("xk", element_at(col("la"), k + 1))
      .filter(col("xk") > 0)
      .withColumn("lnt", transform(slice(col("la"), 1, k),
        x => u6(log(x / col("xk")))))
      .withColumn("h", Kernels.seqFold(col("lnt"), "sum") / lit(k.toDouble))
      .withColumn("alpha", u6(lit(1.0) /
        when(col("h") <= 0, lit(null)).otherwise(col("h"))))
      .select(col("asset_id"), col("n_loss"), u6(col("xk")).as("tail_cut"),
        u6(col("h")).as("mean_excess_log"), col("alpha"))
      .orderBy(col("asset_id"))
  }

  /** B126 `cornish_fisher` — Cornish–Fisher expansion VaR at 95%: the
    * normal quantile z is bent by the sample skew and excess kurtosis,
    * z_cf = z + (z²−1)s/6 + (z³−3z)κ/24 − (2z³−5z)s²/36, then
    * VaR = −(μ + σ·z_cf). Moments ride [[retMoments]]' fold recipe;
    * the z constant appears as the SAME literal in both engines and
    * the polynomial is one fixed op sequence, so no extra rounding
    * stage is needed before the final u6.
    */
  def cornishFisher(panel: DataFrame): DataFrame = {
    // The z constant and the three CF coefficients are SCALA doubles,
    // embedded as round-trip literals in both engines (CornishFisher
    // coefficients computed once here; the oracle interpolates the
    // same values) — a `-1.644854 * -1.644854` literal product would
    // be exact DECIMAL arithmetic in DuckDB but double in Spark.
    val z = CfConst.z; val c1 = CfConst.c1
    val c2 = CfConst.c2; val c3 = CfConst.c3
    val n = col("n")
    dailyReturnsCore(panel)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 4)
      .withColumn("m", foldSum(col("ra")) / n)
      .withColumn("m2", Kernels.seqFold(col("ra"), "sumsq") / n - col("m") * col("m"))
      .filter(col("m2") > 0)
      .withColumn("m3", Kernels.seqFold(col("ra"), "sum3") / n
        - lit(3.0) * col("m") * (Kernels.seqFold(col("ra"), "sumsq") / n)
        + lit(2.0) * col("m") * col("m") * col("m"))
      .withColumn("m4", Kernels.seqFold(col("ra"), "sum4") / n
        - lit(4.0) * col("m") * (Kernels.seqFold(col("ra"), "sum3") / n)
        + lit(6.0) * col("m") * col("m") * (Kernels.seqFold(col("ra"), "sumsq") / n)
        - lit(3.0) * col("m") * col("m") * col("m") * col("m"))
      .withColumn("sd", sqrt(greatest(col("m2") * (n / (n - 1)), lit(0.0))))
      .withColumn("s", col("m3") / (col("m2") * sqrt(col("m2"))))
      .withColumn("kex", col("m4") / (col("m2") * col("m2")) - 3)
      .withColumn("zcf", lit(z)
        + lit(c1) * col("s")
        + lit(c2) * col("kex")
        - lit(c3) * col("s") * col("s"))
      .withColumn("var_norm", u6(-(col("m") + col("sd") * lit(z))))
      .withColumn("var_cf", u6(-(col("m") + col("sd") * col("zcf"))))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        u6(col("s")).as("skew"), u6(col("kex")).as("kurt_excess"),
        col("var_norm"), col("var_cf"))
      .orderBy(col("asset_id"))
  }

  /** B127 `m2_ratio` — Modigliani–Modigliani risk-adjusted performance
    * (rf = 0): M² = (μ/σ)·σ_mkt — the asset's Sharpe levered to market
    * volatility, readable in return units. Per-asset folds are
    * [[sharpe]]'s; the market σ is ONE row (a fold over the date-ordered
    * equal-weight series) attached by a literal-key broadcast hash join
    * — an equality join, not a nested-loop cross.
    */
  def m2Ratio(panel: DataFrame): DataFrame = {
    val rets = dailyReturnsCore(panel)
    val n = col("n")
    val mktSd = marketReturns(rets)
      .groupBy()
      .agg(transform(array_sort(collect_list(struct(col("date"), col("mkt_ret")))),
        s => s("mkt_ret")).as("ma"))
      .withColumn("nm", size(col("ma")).cast("double"))
      .filter(col("nm") >= 2)
      .withColumn("sm", foldSum(col("ma")))
      .withColumn("sm2", foldSumSq(col("ma")))
      .select(lit(1).as("k"),
        sqrt(greatest((col("nm") * col("sm2") - col("sm") * col("sm")) /
          (col("nm") * (col("nm") - 1)), lit(0.0))).as("mkt_sd"))
    rets
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("ra")))
      .withColumn("s2", foldSumSq(col("ra")))
      .withColumn("mean_ret", col("s") / n)
      .withColumn("sd", sqrt(greatest((n * col("s2") - col("s") * col("s")) / (n * (n - 1)), lit(0.0))))
      .withColumn("k", lit(1))
      .join(broadcast(mktSd), Seq("k"))
      .withColumn("sharpe", u6(col("mean_ret") /
        when(col("sd") === 0, lit(null)).otherwise(col("sd"))))
      .withColumn("m2", u6(col("mean_ret") /
        when(col("sd") === 0, lit(null)).otherwise(col("sd")) * col("mkt_sd")))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        col("sharpe"), u6(col("mkt_sd")).as("mkt_sd"), col("m2"))
      .orderBy(col("asset_id"))
  }

  /** B131 `gain_loss_ratio` — per-asset win rate and average
    * gain/average loss magnitude over the daily returns: the
    * risk-reward asymmetry read directly (a 40% win rate is fine when
    * wins run 3× losses). Wins/losses are order-preserving HOF filters
    * of the date-sorted return array, folded left-to-right; counts and
    * the win-rate per-mille stay integer.
    */
  def gainLossRatio(panel: DataFrame): DataFrame =
    dailyReturnsCore(panel)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("ga", filter(col("ra"), x => x > 0))
      .withColumn("la", filter(col("ra"), x => x < 0))
      .withColumn("n_wins", size(col("ga")).cast("long"))
      .withColumn("n_losses", size(col("la")).cast("long"))
      .filter(col("n_wins") + col("n_losses") >= 1)
      .withColumn("win_pm", expr("(1000 * n_wins) div (n_wins + n_losses)"))
      .withColumn("avg_gain", when(col("n_wins") === 0, lit(null))
        .otherwise(Kernels.seqFold(col("ga"), "sum") / col("n_wins").cast("double")))
      .withColumn("avg_loss", when(col("n_losses") === 0, lit(null))
        .otherwise(-Kernels.seqFold(col("la"), "sum") / col("n_losses").cast("double")))
      .withColumn("gl_ratio", u6(col("avg_gain") /
        when(col("avg_loss") === 0, lit(null)).otherwise(col("avg_loss"))))
      .select(col("asset_id"), col("n_wins"), col("n_losses"), col("win_pm"),
        u6(col("avg_gain")).as("avg_gain"), u6(col("avg_loss")).as("avg_loss"),
        col("gl_ratio"))
      .orderBy(col("asset_id"))

  /** B132 `xsec_ic` — per-date cross-sectional information coefficient
    * of the momentum signal: Pearson between each asset's trailing
    * `look`-day return (formed THROUGH YESTERDAY — no look-ahead) and
    * its return today, across assets. THE daily health read of a
    * signal desk. Co-moment folds over asset-ordered arrays
    * ([[autocorr]]'s recipe keyed by date instead of asset); one date
    * shuffle, |assets|-bounded arrays.
    */
  def xsecIc(panel: DataFrame, look: Int = 5): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val sigFar = lag(col("value"), look + 1).over(w)
    val n = col("n")
    daily
      .withColumn("out", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .withColumn("sig", u6(prev / when(sigFar === 0, lit(null)).otherwise(sigFar) - 1))
      .filter(col("out").isNotNull && col("sig").isNotNull)
      .groupBy(col("date"))
      .agg(transform(array_sort(collect_list(struct(col("asset_id"), col("sig"), col("out")))),
        s => struct(s("sig").as("sig"), s("out").as("out"))).as("pts"))
      .withColumn("n", size(col("pts")).cast("double"))
      .filter(n >= 3)
      .withColumn("xa", transform(col("pts"), p => p("sig")))
      .withColumn("ya", transform(col("pts"), p => p("out")))
      .withColumn("sx", foldSum(col("xa")))
      .withColumn("sy", foldSum(col("ya")))
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("sx2", foldSumSq(col("xa")))
      .withColumn("sy2", foldSumSq(col("ya")))
      .withColumn("den",
        sqrt(greatest(n * col("sx2") - col("sx") * col("sx"), lit(0.0))) *
          sqrt(greatest(n * col("sy2") - col("sy") * col("sy"), lit(0.0))))
      .withColumn("ic", u6((n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("date"), n.cast("long").as("n_assets"), col("ic"))
      .orderBy(col("date"))
  }

  /** B128 `volume_profile` — tick volume by price decile per asset:
    * the [min, max] tick-price range split into 10 equal bins,
    * n_ticks and volume share per bin, POC (point of control) = the
    * busiest bin (lowest bin on ties — total order). The bin index is
    * one fixed float op sequence over the tick value and the
    * order-free partition extremes; counts and the rank are integers.
    * Single shuffle: the extremes window and the (asset, bin) group
    * share the asset_id partitioning.
    */
  def volumeProfile(panel: DataFrame, bins: Int = 10): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id"))
    val span = col("mx") - col("mn")
    val poc = Window.partitionBy(col("asset_id"))
      .orderBy(col("n_ticks").desc, col("bin"))
    panel.repartition(col("asset_id"))
      .withColumn("mn", min(col("value")).over(byAsset))
      .withColumn("mx", max(col("value")).over(byAsset))
      .withColumn("bin", when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(lit(bins - 1L),
          floor((col("value") - col("mn")) / span * bins)).cast("long")))
      .groupBy(col("asset_id"), col("bin"))
      .agg(count(lit(1)).as("n_ticks"),
        max(col("mn")).as("mn"), max(col("mx")).as("mx"))
      .withColumn("total", sum(col("n_ticks")).over(Window.partitionBy(col("asset_id"))))
      .withColumn("bin_lo", u6(col("mn") + (col("mx") - col("mn")) * col("bin") / bins))
      .withColumn("share", u6(col("n_ticks").cast("double") / col("total").cast("double")))
      .withColumn("is_poc", row_number().over(poc) === 1)
      .select(col("asset_id"), col("bin"), col("bin_lo"),
        col("n_ticks"), col("share"), col("is_poc"))
      .orderBy(col("asset_id"), col("bin"))
  }

  /** B133 `balance_of_power` — per-bar Balance of Power
    * (close − open)/(high − low) and its `span`-bar SMA: who closed the
    * bar's range, buyers (+1) or sellers (−1). Flat bars (high = low)
    * are dropped BEFORE the window so the fold arrays never see nulls —
    * same convention both engines; the SMA is the usual frame fold.
    */
  def balanceOfPower(panel: DataFrame, span: Int = 14): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .filter(col("high") > col("low"))
      .withColumn("bop", u6((col("close") - col("open")) / (col("high") - col("low"))))
      .withColumn("arr", collect_list(col("bop")).over(frame))
      .withColumn("bop_sma", u6(foldSum(col("arr")) / size(col("arr")).cast("double")))
      .select(col("asset_id"), col("date"), col("bop"), col("bop_sma"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B134 `qstick` — Qstick: the `span`-bar SMA of (close − open), the
    * simplest candle-body trend gauge (persistent white candles → +).
    * Per-bar body u6-rounded, frame mean a left-assoc fold — the
    * [[balanceOfPower]] shape without the range normalizer, so flat
    * bars stay in.
    */
  def qstick(panel: DataFrame, span: Int = 8): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("body", u6(col("close") - col("open")))
      .withColumn("arr", collect_list(col("body")).over(frame))
      .withColumn("qstick", u6(foldSum(col("arr")) / size(col("arr")).cast("double")))
      .select(col("asset_id"), col("date"), col("body"), col("qstick"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B135 `rvi` — Relative Vigor Index: SWMA(close − open)/SWMA(high −
    * low) summed over a `span`-bar window, plus the SWMA signal line.
    * SWMA is the symmetric 4-bar weighting (x + 2x₋₁ + 2x₋₂ + x₋₃)/6 as
    * pure lag arithmetic (one fixed float op sequence — no fold
    * needed); bars without a full SWMA lookback drop before the summing
    * window so the arrays are null-free. A zero range sum (span of flat
    * bars) nulls the RVI, and that null flows into any signal value it
    * touches — same rule both engines.
    */
  def rvi(panel: DataFrame, span: Int = 10): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    def swma(c: Column): Column = u6(
      (c + lit(2.0) * lag(c, 1).over(byAsset) +
        lit(2.0) * lag(c, 2).over(byAsset) + lag(c, 3).over(byAsset)) / 6)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("num", swma(col("close") - col("open")))
      .withColumn("den", swma(col("high") - col("low")))
      .filter(col("num").isNotNull)
      .withColumn("na", collect_list(col("num")).over(frame))
      .withColumn("da", collect_list(col("den")).over(frame))
      .withColumn("rvi", u6(foldSum(col("na")) /
        when(foldSum(col("da")) === 0, lit(null)).otherwise(foldSum(col("da")))))
      .withColumn("sig", u6(
        (col("rvi") + lit(2.0) * lag(col("rvi"), 1).over(byAsset) +
          lit(2.0) * lag(col("rvi"), 2).over(byAsset) + lag(col("rvi"), 3).over(byAsset)) / 6))
      .select(col("asset_id"), col("date"), col("rvi"), col("sig"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B136 `nvi_pvi` — Negative/Positive Volume Index over the daily
    * bars, tick count standing in for volume: NVI compounds the
    * close-to-close return only on volume-DOWN days (what the smart
    * money does when it's quiet), PVI only on volume-UP days. The
    * compounding is exact-integer by construction: per-day log return
    * u6-rounded, scaled to micro-units (an integer), conditionally
    * accumulated by an ORDER-INSENSITIVE integer window sum, and
    * EMITTED AS THE LOG LEVEL (cumulative conditional log return —
    * exactly on the micro grid). The exponentiated index form was
    * dropped after [[intradayOvernightSplit]]'s oracle caught the
    * exp last-ulp divergence: conditional compounding on this panel
    * reaches e²², where one double ulp equals the micro grid. First
    * bars and zero/NULL guards contribute 0; the index is
    * 1000·exp(level) for display, monotone in the level.
    */
  def nviPvi(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val run = byAsset.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevClose = lag(col("close"), 1).over(byAsset)
    val prevVol = lag(col("n_ticks"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("lr", u6(log(col("close") /
        when(prevClose <= 0 || col("close") <= 0, lit(null)).otherwise(prevClose))))
      .withColumn("lr_micro", coalesce(
        round(col("lr") * 1e6).cast("long"), lit(0L)))
      .withColumn("nvi_term",
        when(prevVol.isNotNull && col("n_ticks") < prevVol, col("lr_micro")).otherwise(lit(0L)))
      .withColumn("pvi_term",
        when(prevVol.isNotNull && col("n_ticks") > prevVol, col("lr_micro")).otherwise(lit(0L)))
      .withColumn("nvi_log", sum(col("nvi_term")).over(run).cast("double") / 1e6)
      .withColumn("pvi_log", sum(col("pvi_term")).over(run).cast("double") / 1e6)
      .select(col("asset_id"), col("date"), col("close"),
        col("nvi_log"), col("pvi_log"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B137 `bipower_var` — realized variance vs bipower variation per
    * asset: RV = Σr², BV = (π/2)·Σ|rₜ||rₜ₋₁|. BV is robust to jumps,
    * RV is not, so jump_share = max(0, 1 − BV/RV) is the share of
    * realized variance attributable to jumps (Barndorff-Nielsen &
    * Shephard). Both sums are left-assoc folds over the date-sorted
    * return array ([[gainLossRatio]]'s collection recipe); the adjacent
    * |r||r₋₁| products come from zipping the array against itself
    * shifted by one. π enters as the same IEEE double in both engines.
    */
  def bipowerVar(panel: DataFrame): DataFrame =
    dailyReturnsCore(panel)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n_days", size(col("ra")).cast("long"))
      .filter(col("n_days") >= 3)
      .withColumn("rv", foldSumSq(col("ra")))
      .withColumn("adj", Kernels.seqFold(
        zip_with(
          slice(col("ra"), lit(1), size(col("ra")) - 1),
          slice(col("ra"), lit(2), size(col("ra")) - 1),
          (a, b) => abs(a) * abs(b)), "sum"))
      .withColumn("bv", lit(math.Pi / 2.0) * col("adj"))
      // rv = 0 (all-flat asset) yields NULL jump_share EXPLICITLY — the
      // codebase's zero-denominator convention — rather than leaning on
      // engine-specific greatest() NULL-skipping (r7 ADVICE).
      .withColumn("jump_share", when(col("rv") === 0, lit(null).cast("double"))
        .otherwise(u6(greatest(lit(1.0) - col("bv") / col("rv"), lit(0.0)))))
      .select(col("asset_id"), col("n_days"),
        u6(col("rv")).as("rv"), u6(col("bv")).as("bv"), col("jump_share"))
      .orderBy(col("asset_id"))

  /** B138 `heikin_ashi` — Heikin-Ashi smoothed candles over the daily
    * bars: HA-close = (o+h+l+c)/4 per bar, HA-open = the RECURSIVE
    * midpoint of yesterday's HA candle ((ha_openₜ₋₁ + ha_closeₜ₋₁)/2,
    * seeded (o₁+c₁)/2), HA-high/low = the candle envelope. The
    * recursion is a sequential fold over each asset's date-sorted bar
    * array (an `aggregate` HOF appending one struct per bar — per-asset
    * history is calendar-bounded, so the array stays small at any
    * corpus scale); every midpoint/quarter is u6-rounded in the SAME
    * left-assoc op order the DuckDB oracle's recursive CTE replays.
    * One asset_id shuffle: the bar build and the groupBy share it.
    */
  def heikinAshi(panel: DataFrame): DataFrame = {
    dailyBars(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(
        col("date"), col("open"), col("high"), col("low"), col("close")))).as("bs"))
      // linear-time compiled scan — see RecurrenceFold (same recursion,
      // pre-sized output instead of per-step accumulator copies)
      .withColumn("ha", Kernels.recurrence(col("bs"), "heikin_ashi"))
      .select(col("asset_id"), explode(col("ha")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"),
        col("h.ho").as("ha_open"), col("h.hc").as("ha_close"),
        greatest(col("h.high"), col("h.ho"), col("h.hc")).as("ha_high"),
        least(col("h.low"), col("h.ho"), col("h.hc")).as("ha_low"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B139 `kst` — Pring's Know Sure Thing, short-term (daily) form:
    * four rates of change (5/8/11/15 bars) each SMA-smoothed
    * (5/5/5/8), combined 1:2:3:4, plus the 5-bar signal SMA. Pure [[coppock]] machinery
    * stacked: u6 ROCs, frame folds for every SMA, explicit left-assoc
    * weighting. Bars missing ANY lookback (or hitting a zero close)
    * are dropped BEFORE the windows so every fold array is null-free
    * in both engines.
    */
  def kst(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    def roc(k: Int): Column = {
      val prev = lag(col("close"), k).over(byAsset)
      u6(col("close") / when(prev === 0, lit(null)).otherwise(prev) - 1)
    }
    def frame(n: Int) = byAsset.rowsBetween(-(n - 1), Window.currentRow)
    def sma(c: Column, n: Int): Column = {
      val arr = collect_list(c).over(frame(n))
      u6(foldSum(arr) / size(arr).cast("double"))
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("r1", roc(5)).withColumn("r2", roc(8))
      .withColumn("r3", roc(11)).withColumn("r4", roc(15))
      .filter(col("r1").isNotNull && col("r2").isNotNull &&
        col("r3").isNotNull && col("r4").isNotNull)
      .withColumn("s1", sma(col("r1"), 5))
      .withColumn("s2", sma(col("r2"), 5))
      .withColumn("s3", sma(col("r3"), 5))
      .withColumn("s4", sma(col("r4"), 8))
      .withColumn("kst", u6(col("s1") + lit(2.0) * col("s2") +
        lit(3.0) * col("s3") + lit(4.0) * col("s4")))
      .withColumn("sig", sma(col("kst"), 5))
      .select(col("asset_id"), col("date"), col("kst"), col("sig"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B140 `rachev_ratio` — expected tail gain over expected tail loss
    * at the q-quantile (both tails of the sorted daily-return array):
    * the risk-reward read CVaR alone misses — a fat RIGHT tail is why
    * you hold the asset. [[varCvar]]'s order statistics on both ends;
    * assets too short for two disjoint q-tails drop. ETL is the loss
    * magnitude (positive when the left tail is underwater); an ETL of
    * exactly 0 nulls the ratio.
    */
  def rachevRatio(panel: DataFrame, q: Double = 0.05): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val k = ceil(size(col("ra")).cast("double") * q).cast("int")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(col("ret"))).as("ra"))
      .withColumn("k", k)
      .filter(col("k") >= 1 && lit(2) * col("k") <= size(col("ra")))
      .withColumn("lo", slice(col("ra"), lit(1), col("k")))
      .withColumn("hi", slice(col("ra"), size(col("ra")) - col("k") + 1, col("k")))
      .withColumn("etl", u6(-foldSum(col("lo")) / col("k").cast("double")))
      .withColumn("etg", u6(foldSum(col("hi")) / col("k").cast("double")))
      .withColumn("rachev", u6(col("etg") /
        when(col("etl") === 0, lit(null)).otherwise(col("etl"))))
      .select(col("asset_id"), size(col("ra")).cast("long").as("n_days"),
        col("k").cast("long").as("n_tail"), col("etg"), col("etl"), col("rachev"))
      .orderBy(col("asset_id"))
  }

  /** B141 `pain_index` — mean drawdown depth over the asset's whole
    * history (the Pain Index: how underwater the average day was) and
    * the Pain Ratio mean-return/pain — [[ulcerIndex]]'s L1 sibling
    * (ulcer squares depths, pain averages them). One pass builds both
    * series: the running-max drawdown and the daily return ride the
    * same asset_id window partitioning, then one per-asset aggregate
    * folds the date-sorted arrays.
    */
  def painIndex(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val runW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("value"), 1).over(w)
    daily
      .withColumn("peak", max(col("value")).over(runW))
      .withColumn("dd", u6(col("value") /
        when(col("peak") === 0, lit(null)).otherwise(col("peak")) - 1))
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .groupBy(col("asset_id"))
      .agg(
        transform(array_sort(collect_list(struct(col("date"), col("dd")))),
          s => s("dd")).as("dda"),
        transform(array_sort(collect_list(
          when(col("ret").isNotNull, struct(col("date"), col("ret"))))),
          s => s("ret")).as("reta"))
      .filter(size(col("reta")) >= 1)
      .withColumn("pain_index", u6(-foldSum(col("dda")) / size(col("dda")).cast("double")))
      .withColumn("mean_ret", u6(foldSum(col("reta")) / size(col("reta")).cast("double")))
      .withColumn("pain_ratio", u6(col("mean_ret") /
        when(col("pain_index") === 0, lit(null)).otherwise(col("pain_index"))))
      .select(col("asset_id"), size(col("dda")).cast("long").as("n_days"),
        col("pain_index"), col("mean_ret"), col("pain_ratio"))
      .orderBy(col("asset_id"))
  }

  /** B142 `vol_clustering` — the two stylized-fact correlations per
    * asset: volatility clustering corr(|rₜ₋₁|, |rₜ|) (large moves
    * follow large moves — why GARCH exists) and the leverage effect
    * corr(rₜ₋₁, |rₜ|) (down moves raise tomorrow's vol more).
    * [[autocorr]]'s co-moment folds run twice over the same shifted
    * pair of date-sorted arrays, absolute values applied by
    * order-preserving transforms.
    */
  def volClustering(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    def corrOf(xa: Column, ya: Column, out: String): Seq[(String, Column)] = Seq(
      s"${out}_sx" -> Kernels.seqFold(xa, "sum"),
      s"${out}_sy" -> Kernels.seqFold(ya, "sum"),
      s"${out}_sxy" -> Kernels.dot(xa, ya),
      s"${out}_sx2" -> Kernels.seqFold(xa, "sumsq"),
      s"${out}_sy2" -> Kernels.seqFold(ya, "sumsq"))
    def corrFinal(out: String): Column = {
      val den = sqrt(greatest(n * col(s"${out}_sx2") - col(s"${out}_sx") * col(s"${out}_sx"), lit(0.0))) *
        sqrt(greatest(n * col(s"${out}_sy2") - col(s"${out}_sy") * col(s"${out}_sy"), lit(0.0)))
      u6((n * col(s"${out}_sxy") - col(s"${out}_sx") * col(s"${out}_sy")) /
        when(den === 0, lit(null)).otherwise(den))
    }
    val base = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("m", size(col("ra")))
      .filter(col("m") >= 3)
      .withColumn("xa", slice(col("ra"), lit(1), col("m") - 1))
      .withColumn("ya", slice(col("ra"), lit(2), col("m") - 1))
      .withColumn("axa", transform(col("xa"), x => abs(x)))
      .withColumn("aya", transform(col("ya"), x => abs(x)))
      .withColumn("n", (col("m") - 1).cast("double"))
    val withMoments = (corrOf(col("axa"), col("aya"), "vc") ++
      corrOf(col("xa"), col("aya"), "lev"))
      .foldLeft(base) { case (df, (name, c)) => df.withColumn(name, c) }
    withMoments
      .withColumn("vc_corr", corrFinal("vc"))
      .withColumn("lev_corr", corrFinal("lev"))
      .select(col("asset_id"), n.cast("long").as("n_pairs"),
        col("vc_corr"), col("lev_corr"))
      .orderBy(col("asset_id"))
  }

  /** B143 `supertrend` — the ATR trailing-stop trend filter: basic
    * bands mid ± mult·ATR, RECURSIVELY ratcheted (the upper band only
    * ever falls while price holds below it, the lower only rises while
    * price holds above), direction flipping when the close crosses the
    * active band. ATR is [[atr]]'s normalized Horner fold verbatim;
    * the ratchet is the [[heikinAshi]] recipe — a sequential
    * `aggregate` HOF over each asset's calendar-bounded bar array,
    * with every band u6-rounded so the ratchet comparisons are on
    * exact micro-grid values in both engines (the DuckDB oracle
    * replays via WITH RECURSIVE). First bar: bands as given, trend up.
    */
  def supertrend(panel: DataFrame, span: Int = 10, mult: Double = 3.0): DataFrame = {
    val w = (span - 1).toDouble / span
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevClose = lag(col("close"), 1).over(byAsset)
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tr", u6(
        when(prevClose.isNull, col("high") - col("low"))
          .otherwise(greatest(
            col("high") - col("low"),
            abs(col("high") - prevClose),
            abs(col("low") - prevClose)))))
      .withColumn("arr", collect_list(col("tr")).over(frame))
      .withColumn("atr", u6(
        Kernels.seqFold(col("arr"), "horner", w) /
          Kernels.seqFold(col("arr"), "horner_count", w)))
      .withColumn("mid", u6((col("high") + col("low")) / 2))
      .withColumn("bub", u6(col("mid") + lit(mult) * col("atr")))
      .withColumn("blb", u6(col("mid") - lit(mult) * col("atr")))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(
        col("date"), col("close"), col("bub"), col("blb")))).as("bs"))
      // linear-time compiled scan — see RecurrenceFold
      .withColumn("st", Kernels.recurrence(col("bs"), "supertrend"))
      .select(col("asset_id"), explode(col("st")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"), col("h.close").as("close"),
        col("h.fub").as("fub"), col("h.flb").as("flb"), col("h.dir").as("dir"),
        when(col("h.dir") === 1L, col("h.flb")).otherwise(col("h.fub")).as("supertrend"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B144 `connors_rsi` — Connors RSI: the mean of (a) Wilder RSI(3)
    * on daily changes, (b) Wilder RSI(2) on the CHANGES OF THE STREAK
    * series (signed consecutive up/down day counts — built
    * declaratively with the gaps-and-islands row_number trick, all
    * integer), and (c) the percent rank of today's return against the
    * trailing 100 returns (an integer count over a frame array). Rows
    * before the first streak change drop so every fold array is
    * null-free; RSIs are u4 like [[rsiCore]], the composite u6.
    */
  def connorsRsi(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val rets = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("sgn", signum(col("ret")).cast("long"))
      .withColumn("rn", row_number().over(w))
      .withColumn("grp", col("rn") - row_number().over(
        Window.partitionBy(col("asset_id"), col("sgn")).orderBy(col("date"))))
      .withColumn("streak", when(col("sgn") === 0, lit(0L))
        .otherwise(col("sgn") * row_number().over(
          Window.partitionBy(col("asset_id"), col("sgn"), col("grp")).orderBy(col("date")))))
      .withColumn("sd", (col("streak") - lag(col("streak"), 1).over(w)).cast("double"))
      .filter(col("sd").isNotNull)
    def wilderRsi(c: Column, span: Int): Column = {
      val wgt = (span - 1).toDouble / span
      val arr = collect_list(c).over(w.rowsBetween(-(span - 1), Window.currentRow))
      val ag = Kernels.seqFold(arr, "horner_pos", wgt)
      val al = Kernels.seqFold(arr, "horner_neg", wgt)
      u4(when(al === 0, lit(100.0))
        .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + ag / al)))
    }
    val prArr = collect_list(col("ret")).over(w.rowsBetween(-100, -1))
    rets
      .withColumn("rsi3", wilderRsi(col("ret"), 3))
      .withColumn("rsi2", wilderRsi(col("sd"), 2))
      .withColumn("pr", u6(lit(100.0) *
        size(filter(prArr, x => x < col("ret"))).cast("double") /
        when(size(prArr) === 0, lit(null)).otherwise(size(prArr).cast("double"))))
      .withColumn("crsi", u6((col("rsi3") + col("rsi2") + col("pr")) / 3))
      .select(col("asset_id"), col("date"), col("streak"),
        col("rsi3"), col("rsi2"), col("pr"), col("crsi"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B145 `dema_tema` — double/triple exponential moving averages:
    * DEMA = 2e₁ − e₂, TEMA = 3e₁ − 3e₂ + e₃ over the chained EMAs
    * e₁ = EMA(close), e₂ = EMA(e₁), e₃ = EMA(e₂) — [[trix]]'s chained
    * normalized Horner folds with the lag-killing recombinations on
    * top. Each eₖ is u6-rounded before feeding the next chain link, so
    * the chain replays bitwise; one asset_id shuffle for all three
    * window passes.
    */
  def demaTema(panel: DataFrame, span: Int = 15): DataFrame = {
    val wgt = 1.0 - 2.0 / (span + 1.0)
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    def ema(c: Column): Column = {
      val arr = collect_list(c).over(frame)
      u6(Kernels.seqFold(arr, "horner", wgt) /
        Kernels.seqFold(arr, "horner_count", wgt))
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("e1", ema(col("close")))
      .withColumn("e2", ema(col("e1")))
      .withColumn("e3", ema(col("e2")))
      .withColumn("dema", u6(lit(2.0) * col("e1") - col("e2")))
      .withColumn("tema", u6(lit(3.0) * col("e1") - lit(3.0) * col("e2") + col("e3")))
      .select(col("asset_id"), col("date"), col("close"),
        col("e1"), col("dema"), col("tema"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B146 `mcclellan` — McClellan oscillator + summation index over
    * the market-breadth series: net advances per date (up-count minus
    * down-count across assets, integer), EMA19 − EMA39 of that single
    * calendar-bounded series, and the cumulative summation index. The
    * EMAs are unbounded-frame normalized Horner folds (one market-level
    * series — the array is calendar-bounded at ANY corpus scale); the
    * summation is an ORDER-INSENSITIVE micro-integer running sum of the
    * rounded oscillator. [[advanceDecline]]'s aggregate feeds it.
    */
  def mcclellan(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val runFrame = Window.orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def ema(arr: Column, wgt: Double): Column =
      u6(Kernels.seqFold(arr, "horner", wgt) /
        Kernels.seqFold(arr, "horner_count", wgt))
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("date"))
      .agg((sum(when(col("ret") > 0, 1L).otherwise(0L)) -
        sum(when(col("ret") < 0, 1L).otherwise(0L))).as("net"))
      .withColumn("arr", collect_list(col("net").cast("double")).over(runFrame))
      .withColumn("e19", ema(col("arr"), 0.9))
      .withColumn("e39", ema(col("arr"), 0.95))
      .withColumn("osc", u6(col("e19") - col("e39")))
      .withColumn("osc_micro", round(col("osc") * 1e6).cast("long"))
      .withColumn("summation", u6(
        sum(col("osc_micro")).over(runFrame).cast("double") / 1e6))
      .select(col("date"), col("net"), col("e19"), col("e39"),
        col("osc"), col("summation"))
      .orderBy(col("date"))
  }

  /** B147 `psar` — Wilder's Parabolic SAR: the stop ratchets toward
    * price by the acceleration factor (+0.02 per new extreme, capped
    * 0.2) and flips to the extreme point when crossed. The third
    * member of the sequential-recurrence family ([[heikinAshi]],
    * [[supertrend]]): a per-asset `aggregate` fold over the
    * date-sorted bars, every SAR/AF value u6-rounded so the cross
    * comparisons sit on the micro grid in both engines; the DuckDB
    * oracle replays via WITH RECURSIVE. Variant pinned here: emission
    * starts at bar 2 (dir = sign of the first close change, ties up;
    * SAR seeds at the prior bar's opposite extreme; EP at the current
    * extreme), and the no-penetration clamp uses the PREVIOUS bar's
    * range (the common single-bar simplification, stated in the
    * oracle too).
    */
  def psar(panel: DataFrame): DataFrame = {
    dailyBars(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(
        col("date"), col("high"), col("low"), col("close")))).as("bs"))
      .filter(size(col("bs")) >= 2)
      // linear-time compiled scan — see RecurrenceFold (seed bar at
      // entry 0 with dir 0, trend init at entry 1, general SAR step
      // from entry 2 — the same state machine the HOF lambda encoded)
      .withColumn("ps", Kernels.recurrence(col("bs"), "psar"))
      .select(col("asset_id"), explode(col("ps")).as("h"))
      .filter(col("h.dir") =!= 0L)
      .select(col("asset_id"), col("h.date").as("date"), col("h.close").as("close"),
        col("h.sar").as("sar"), col("h.ep").as("ep"), col("h.af").as("af"),
        col("h.dir").as("dir"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B148 `klinger_osc` — Klinger volume oscillator in its simplified
    * signed-volume form (the full volume-force recursion adds little
    * over it and would be the 4th recursive op): sv = sign(TP − TPₜ₋₁)
    * · n_ticks (an INTEGER — sign from the u6 typical price), KO =
    * EMA34(sv) − EMA55(sv), signal = EMA13(KO). EW means are the
    * normalized Horner folds; the first bar's sv is 0 by the [[obv]]
    * convention.
    */
  def klingerOsc(panel: DataFrame, fast: Int = 34, slow: Int = 55,
                 sig: Int = 13): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    def ewMean(c: Column, span: Int): Column = {
      val weight = 1.0 - 2.0 / (span + 1.0)
      val arr = collect_list(c).over(byAsset.rowsBetween(-(span - 1), Window.currentRow))
      u6(Kernels.seqFold(arr, "horner", weight) /
        Kernels.seqFold(arr, "horner_count", weight))
    }
    val tp = u6((col("high") + col("low") + col("close")) / 3)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tp", tp)
      .withColumn("ptp", lag(col("tp"), 1).over(byAsset))
      .withColumn("sv",
        when(col("ptp").isNull, lit(0L))
          .when(col("tp") > col("ptp"), col("n_ticks"))
          .when(col("tp") < col("ptp"), -col("n_ticks"))
          .otherwise(lit(0L)))
      .withColumn("svd", col("sv").cast("double"))
      .withColumn("e_fast", ewMean(col("svd"), fast))
      .withColumn("e_slow", ewMean(col("svd"), slow))
      .withColumn("ko", u6(col("e_fast") - col("e_slow")))
      .withColumn("signal", ewMean(col("ko"), sig))
      .select(col("asset_id"), col("date"), col("sv"), col("ko"), col("signal"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B149 `ppo` — percentage price oscillator, [[pvo]]'s price twin:
    * 100·(EMA12 − EMA26)/EMA26 over the daily closes plus its EMA9
    * signal — MACD normalized to be comparable across price levels.
    * Same normalized Horner EW means, same zero-guard on the slow EMA.
    */
  def ppo(panel: DataFrame, fast: Int = 12, slow: Int = 26, sig: Int = 9): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    def ewMean(c: Column, span: Int): Column = {
      val weight = 1.0 - 2.0 / (span + 1.0)
      val arr = collect_list(c).over(byAsset.rowsBetween(-(span - 1), Window.currentRow))
      u6(Kernels.seqFold(arr, "horner", weight) /
        Kernels.seqFold(arr, "horner_count", weight))
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("e_fast", ewMean(col("close"), fast))
      .withColumn("e_slow", ewMean(col("close"), slow))
      .withColumn("ppo", u6(lit(100.0) * (col("e_fast") - col("e_slow")) /
        when(col("e_slow") === 0, lit(null)).otherwise(col("e_slow"))))
      .withColumn("signal", ewMean(col("ppo"), sig))
      .select(col("asset_id"), col("date"), col("e_fast"), col("e_slow"),
        col("ppo"), col("signal"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B150 `relative_volume` — today's tick volume against the mean of
    * the trailing `span` days (excluding today): the "is anything
    * happening" screen. Integer window sums (order-free exact), one
    * u6 ratio; the first bar of each asset has an empty trailing frame
    * → NULL rvol, same rule both engines.
    */
  def relativeVolume(panel: DataFrame, span: Int = 20): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-span, -1)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("prev_vol", sum(col("n_ticks")).over(frame))
      .withColumn("prev_days", count(col("n_ticks")).over(frame))
      .withColumn("avg_vol", u6(col("prev_vol").cast("double") /
        when(col("prev_days") === 0, lit(null)).otherwise(col("prev_days").cast("double"))))
      .withColumn("rvol", u6(col("n_ticks").cast("double") /
        when(col("avg_vol") === 0, lit(null)).otherwise(col("avg_vol"))))
      .select(col("asset_id"), col("date"), col("n_ticks"),
        col("avg_vol"), col("rvol"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B151 `up_down_vol_ratio` — per-asset tick volume on up-days over
    * down-days across the whole history: the one-number accumulation/
    * distribution read ([[obv]]'s level-free summary). ALL-INTEGER
    * sums (order-free exact); flat and first days count neither side;
    * a zero down-volume nulls the ratio.
    */
  def upDownVolRatio(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevClose = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("pc", prevClose)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("pc").isNotNull && col("close") > col("pc"),
          col("n_ticks")).otherwise(0L)).as("up_vol"),
        sum(when(col("pc").isNotNull && col("close") < col("pc"),
          col("n_ticks")).otherwise(0L)).as("down_vol"))
      .withColumn("udr", u6(col("up_vol").cast("double") /
        when(col("down_vol") === 0, lit(null)).otherwise(col("down_vol").cast("double"))))
      .select(col("asset_id"), col("n_days"), col("up_vol"), col("down_vol"), col("udr"))
      .orderBy(col("asset_id"))
  }

  /** B152 `fisher_transform` — Ehlers' Fisher transform: the close's
    * position in its `span`-bar channel, centered and clamped to
    * ±0.999, double-smoothed by the v/fisher recurrences
    * vₜ = 0.33x + 0.67vₜ₋₁, fisherₜ = 0.5·ln((1+v)/(1−v)) + 0.5·fisherₜ₋₁
    * (both seeded 0). Fourth member of the sequential-recurrence
    * family: channel extremes are order-free windows BEFORE the
    * per-asset fold; v is u6-rounded before the ln so both engines
    * exponentiate identical doubles; flat channels read pos = 0.5
    * (centered x = 0). Trigger line = yesterday's fisher.
    */
  def fisherTransform(panel: DataFrame, span: Int = 10): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("lo", min(col("low")).over(frame))
      .withColumn("hi", max(col("high")).over(frame))
      .withColumn("pos", when(col("hi") === col("lo"), lit(0.5))
        .otherwise(u6((col("close") - col("lo")) / (col("hi") - col("lo")))))
      .withColumn("x", u6(greatest(least(
        lit(2.0) * col("pos") - 1, lit(0.999)), lit(-0.999))))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("close"), col("x")))).as("bs"))
      // linear-time compiled scan — see RecurrenceFold
      .withColumn("fi", Kernels.recurrence(col("bs"), "fisher"))
      .select(col("asset_id"), posexplode(col("fi")))
      .select(col("asset_id"), col("col.date").as("date"), col("col.close").as("close"),
        col("col.fisher").as("fisher"))
      .withColumn("trigger", lag(col("fisher"), 1).over(byAsset))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B153 `sma_cross` — fast/slow SMA crossover signals (the daily
    * golden/death-cross scan at 5/20 spans): cross = +1 the day the
    * fast mean closes above the slow having been at-or-below the day
    * before, −1 on the mirror, 0 otherwise. Both means are u6 frame
    * folds, so the cross comparisons happen on the micro grid — no
    * boundary flapping between engines; the first bar (no yesterday)
    * emits 0.
    */
  def smaCross(panel: DataFrame, fast: Int = 5, slow: Int = 20): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    def sma(n: Int): Column = {
      val arr = collect_list(col("close")).over(byAsset.rowsBetween(-(n - 1), Window.currentRow))
      u6(foldSum(arr) / size(arr).cast("double"))
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("sma_fast", sma(fast))
      .withColumn("sma_slow", sma(slow))
      .withColumn("pf", lag(col("sma_fast"), 1).over(byAsset))
      .withColumn("ps", lag(col("sma_slow"), 1).over(byAsset))
      .withColumn("cross",
        when(col("pf").isNull, lit(0L))
          .when(col("sma_fast") > col("sma_slow") && col("pf") <= col("ps"), lit(1L))
          .when(col("sma_fast") < col("sma_slow") && col("pf") >= col("ps"), lit(-1L))
          .otherwise(lit(0L)))
      .select(col("asset_id"), col("date"), col("close"),
        col("sma_fast"), col("sma_slow"), col("cross"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B154 `price_volume_corr` — per-asset Pearson between the daily
    * return and the CHANGE in tick volume: confirmation reading (price
    * moves on rising participation) vs divergence. [[volClustering]]'s
    * co-moment folds over one aligned array pair; integer volume
    * deltas cast once.
    */
  def priceVolumeCorr(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevClose = lag(col("close"), 1).over(byAsset)
    val prevVol = lag(col("n_ticks"), 1).over(byAsset)
    val n = col("n")
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("ret", u6(col("close") /
        when(prevClose === 0, lit(null)).otherwise(prevClose) - 1))
      .withColumn("dv", (col("n_ticks") - prevVol).cast("double"))
      .filter(col("ret").isNotNull && col("dv").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret"), col("dv")))),
        s => struct(s("ret").as("ret"), s("dv").as("dv"))).as("pts"))
      .withColumn("n", size(col("pts")).cast("double"))
      .filter(n >= 3)
      .withColumn("xa", transform(col("pts"), p => p("ret")))
      .withColumn("ya", transform(col("pts"), p => p("dv")))
      .withColumn("sx", foldSum(col("xa")))
      .withColumn("sy", foldSum(col("ya")))
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("sx2", foldSumSq(col("xa")))
      .withColumn("sy2", foldSumSq(col("ya")))
      .withColumn("den",
        sqrt(greatest(n * col("sx2") - col("sx") * col("sx"), lit(0.0))) *
          sqrt(greatest(n * col("sy2") - col("sy") * col("sy"), lit(0.0))))
      .withColumn("pv_corr", u6((n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), n.cast("long").as("n_days"), col("pv_corr"))
      .orderBy(col("asset_id"))
  }

  /** B155 `trend_intensity` — share of the last `span` bars closing
    * above their own `span`-bar SMA, in integer per-mille: the
    * trendiness screen (≈500‰ is chop, extremes are trends). The SMA
    * is the u6 frame fold; the share is an integer window sum over the
    * same frame — exact under any engine.
    */
  def trendIntensity(panel: DataFrame, span: Int = 20): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("arr", collect_list(col("close")).over(frame))
      .withColumn("sma", u6(foldSum(col("arr")) / size(col("arr")).cast("double")))
      .withColumn("above", when(col("close") > col("sma"), 1L).otherwise(0L))
      .withColumn("n_above", sum(col("above")).over(frame))
      .withColumn("n_bars", count(col("above")).over(frame))
      .withColumn("ti_pm", expr("(1000 * n_above) div n_bars"))
      .select(col("asset_id"), col("date"), col("close"), col("sma"),
        col("n_above"), col("n_bars"), col("ti_pm"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B156 `high_low_index` — market breadth by fresh extremes: per
    * date, how many assets closed above their trailing `span`-day high
    * vs below their trailing low, and the high share in per-mille
    * ([[mcclellan]]'s companion — net COUNT there, extreme QUALITY
    * here). ALL-INTEGER: flags from order-free window extremes, date
    * aggregate of counts; days with no fresh extremes null the index.
    */
  def highLowIndex(panel: DataFrame, span: Int = 10): DataFrame = {
    val prevFrame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-span, -1)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("prev_hi", max(col("high")).over(prevFrame))
      .withColumn("prev_lo", min(col("low")).over(prevFrame))
      .filter(col("prev_hi").isNotNull)
      .withColumn("nh", when(col("close") > col("prev_hi"), 1L).otherwise(0L))
      .withColumn("nl", when(col("close") < col("prev_lo"), 1L).otherwise(0L))
      .groupBy(col("date"))
      .agg(sum(col("nh")).as("n_new_high"), sum(col("nl")).as("n_new_low"),
        count(lit(1)).as("n_assets"))
      .withColumn("hl_pm",
        when(col("n_new_high") + col("n_new_low") === 0, lit(null))
          .otherwise(expr("(1000 * n_new_high) div (n_new_high + n_new_low)")))
      .orderBy(col("date"))
  }

  /** B157 `xsec_dispersion` — cross-sectional return dispersion per
    * date (the sample std of the day's returns ACROSS assets): the
    * stock-picker's-market gauge and the denominator regime behind
    * every xsec signal ([[xsecIc]]'s spread side). Co-moment folds
    * over the asset-sorted per-date return array; days with < 2
    * assets drop.
    */
  def xsecDispersion(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("date"))
      .agg(transform(array_sort(collect_list(struct(col("asset_id"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("ra")))
      .withColumn("s2", foldSumSq(col("ra")))
      .withColumn("mean_ret", u6(col("s") / n))
      .withColumn("dispersion", u6(sqrt(greatest(
        (n * col("s2") - col("s") * col("s")) / (n * (n - 1)), lit(0.0)))))
      .select(col("date"), n.cast("long").as("n_assets"),
        col("mean_ret"), col("dispersion"))
      .orderBy(col("date"))
  }

  /** B158 `autocorr_profile` — [[autocorr]] swept across lags 1..`maxLag`
    * in long format: the decay shape (fast fade = noise, slow fade =
    * momentum/mean-reversion structure) rather than the single lag-1
    * number. One per-asset array build feeds every lag via an exploded
    * lag column and Column-typed slices — no per-lag corpus pass.
    */
  def autocorrProfile(panel: DataFrame, maxLag: Int = 5): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("m", size(col("ra")))
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .filter(col("m") - col("lag") >= 3)
      .withColumn("xa", slice(col("ra"), lit(1), col("m") - col("lag")))
      .withColumn("ya", slice(col("ra"), col("lag") + 1, col("m") - col("lag")))
      .withColumn("n", (col("m") - col("lag")).cast("double"))
      .withColumn("sx", foldSum(col("xa")))
      .withColumn("sy", foldSum(col("ya")))
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("sx2", foldSumSq(col("xa")))
      .withColumn("sy2", foldSumSq(col("ya")))
      .withColumn("den",
        sqrt(greatest(n * col("sx2") - col("sx") * col("sx"), lit(0.0))) *
          sqrt(greatest(n * col("sy2") - col("sy") * col("sy"), lit(0.0))))
      .withColumn("ac", u6((n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), col("lag").cast("long").as("lag"),
        n.cast("long").as("n_pairs"), col("ac"))
      .orderBy(col("asset_id"), col("lag"))
  }

  /** B159 `martin_ratio` — the Ulcer Performance Index: mean daily
    * return over the WHOLE-HISTORY ulcer index √(mean dd²)
    * ([[ulcerIndex]] is the windowed series; this is the per-asset
    * ranking number, [[painIndex]]'s L2 sibling). One pass builds the
    * drawdown and return series on a shared partitioning, one
    * aggregate folds both — sumsq for the ulcer, sum for the mean.
    */
  def martinRatio(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val runW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("value"), 1).over(w)
    daily
      .withColumn("peak", max(col("value")).over(runW))
      .withColumn("dd", u6(col("value") /
        when(col("peak") === 0, lit(null)).otherwise(col("peak")) - 1))
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .groupBy(col("asset_id"))
      .agg(
        transform(array_sort(collect_list(struct(col("date"), col("dd")))),
          s => s("dd")).as("dda"),
        transform(array_sort(collect_list(
          when(col("ret").isNotNull, struct(col("date"), col("ret"))))),
          s => s("ret")).as("reta"))
      .filter(size(col("reta")) >= 1)
      .withColumn("ulcer", u6(sqrt(
        foldSumSq(col("dda")) / size(col("dda")).cast("double"))))
      .withColumn("mean_ret", u6(foldSum(col("reta")) / size(col("reta")).cast("double")))
      .withColumn("martin", u6(col("mean_ret") /
        when(col("ulcer") === 0, lit(null)).otherwise(col("ulcer"))))
      .select(col("asset_id"), size(col("dda")).cast("long").as("n_days"),
        col("ulcer"), col("mean_ret"), col("martin"))
      .orderBy(col("asset_id"))
  }

  /** B160 `dar` — drawdown-at-risk: the q-quantile of the daily
    * drawdown distribution (DaR) and the mean of the tail beyond it
    * (conditional DaR) — [[varCvar]]'s order statistics applied to the
    * drawdown series instead of returns (how deep the bad days go, not
    * how bad the bad returns are). Depths are emitted positive.
    */
  def dar(panel: DataFrame, q: Double = 0.05): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val runW = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = ceil(size(col("dda")).cast("double") * q).cast("int")
    daily
      .withColumn("peak", max(col("value")).over(runW))
      .withColumn("dd", u6(col("value") /
        when(col("peak") === 0, lit(null)).otherwise(col("peak")) - 1))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(col("dd"))).as("dda"))
      .withColumn("k", k)
      .filter(col("k") >= 1)
      .withColumn("tail", slice(col("dda"), lit(1), col("k")))
      .withColumn("dar", -element_at(col("tail"), col("k")))
      .withColumn("cdar", u6(-foldSum(col("tail")) / col("k").cast("double")))
      .select(col("asset_id"), size(col("dda")).cast("long").as("n_days"),
        col("k").cast("long").as("n_tail"), col("dar"), col("cdar"))
      .orderBy(col("asset_id"))
  }

  /** B161 `skip_days_impact` — the "miss the best 5 days" stat: total
    * compound return vs the return with the top/bottom `k` log-return
    * days removed. ALL-INTEGER selection: u6 log returns in micro
    * units, array-sorted (order-free), integer slice sums subtracted
    * from the integer total, ONE exp per output on an exact
    * micro-grid argument (the [[nviPvi]] discipline) — no float
    * accumulates across rows anywhere. The exp emit is safe while
    * |Σlog| ≲ 21 (beyond that one exp ulp reaches the micro grid —
    * the [[intradayOvernightSplit]] lesson); close-to-close panel
    * totals sit orders of magnitude below that, and a multi-decade
    * deployment would emit the log forms instead.
    */
  def skipDaysImpact(panel: DataFrame, k: Int = 5): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    // |Σlog| beyond ExpSafeArg → NULL by construction (see the
    // [[corwinSchultz]] constant): the emit degrades loudly instead of
    // flapping on the exp-ulp × micro-grid class.
    def comp(sumMicro: Column): Column = {
      val x = sumMicro.cast("double") / 1e6
      when(abs(x) > ExpSafeArg, lit(null).cast("double"))
        .otherwise(u6(exp(x) - 1))
    }
    daily
      .withColumn("lr", u6(log(col("value") /
        when(prev <= 0 || col("value") <= 0, lit(null)).otherwise(prev))))
      .filter(col("lr").isNotNull)
      .withColumn("lr_micro", round(col("lr") * 1e6).cast("long"))
      .groupBy(col("asset_id"))
      .agg(sort_array(collect_list(col("lr_micro"))).as("ms"),
        sum(col("lr_micro")).as("total_micro"), count(lit(1)).as("n_days"))
      .filter(col("n_days") > k)
      .withColumn("kk", least(lit(k), size(col("ms"))))
      .withColumn("best_micro", aggregate(
        slice(col("ms"), size(col("ms")) - col("kk") + 1, col("kk")),
        lit(0L), (acc, x) => acc + x))
      .withColumn("worst_micro", aggregate(
        slice(col("ms"), lit(1), col("kk")),
        lit(0L), (acc, x) => acc + x))
      .withColumn("total_ret", comp(col("total_micro")))
      .withColumn("ret_wo_best", comp(col("total_micro") - col("best_micro")))
      .withColumn("ret_wo_worst", comp(col("total_micro") - col("worst_micro")))
      .select(col("asset_id"), col("n_days"), col("total_ret"),
        col("ret_wo_best"), col("ret_wo_worst"))
      .orderBy(col("asset_id"))
  }

  /** B162 `intraday_overnight_split` — the classic return
    * decomposition: compound close→open (overnight) vs open→close
    * (intraday) log-return legs per asset ("all the return happens
    * overnight" is one of the most robust anomalies; this measures it
    * on the panel). The [[nviPvi]]/[[skipDaysImpact]] integer
    * discipline end to end: u6 log legs → micro integers →
    * order-insensitive sums — and the outputs STAY log returns: this
    * panel's intraday legs compound to ~e²², where one double ulp of
    * exp() equals the micro grid and the JVM/libm last-ulp difference
    * becomes visible (caught by the r7 oracle; the exp-emitting ops
    * keep |arg| ≲ 10 where ulp ≪ micro). Log sums are exact integers.
    */
  def intradayOvernightSplit(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevClose = lag(col("close"), 1).over(byAsset)
    def micro(c: Column): Column = coalesce(round(c * 1e6).cast("long"), lit(0L))
    def logret(sumMicro: Column): Column = sumMicro.cast("double") / 1e6
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("on_lr", u6(log(col("open") /
        when(prevClose <= 0 || col("open") <= 0, lit(null)).otherwise(prevClose))))
      .withColumn("id_lr", u6(log(col("close") /
        when(col("open") <= 0 || col("close") <= 0, lit(null)).otherwise(col("open")))))
      .withColumn("on_micro", micro(col("on_lr")))
      .withColumn("id_micro", micro(col("id_lr")))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("on_micro")).as("on_sum"), sum(col("id_micro")).as("id_sum"))
      .withColumn("overnight_logret", logret(col("on_sum")))
      .withColumn("intraday_logret", logret(col("id_sum")))
      .withColumn("total_logret", logret(col("on_sum") + col("id_sum")))
      .select(col("asset_id"), col("n_days"),
        col("overnight_logret"), col("intraday_logret"), col("total_logret"))
      .orderBy(col("asset_id"))
  }

  /** B163 `beta_stability` — mean and sample std of the
    * [[rollingBeta]] series per asset: a beta that itself swings is
    * not a hedging number, whatever its average says. Rides the
    * rolling-beta build (shared implementation); the u6 beta series
    * folds deterministically date-sorted.
    */
  def betaStability(panel: DataFrame, window: Int = 20): DataFrame = {
    val n = col("n")
    rollingBeta(panel, window)
      .filter(col("beta").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("beta")))),
        s => s("beta")).as("ba"))
      .withColumn("n", size(col("ba")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("ba")))
      .withColumn("s2", foldSumSq(col("ba")))
      .withColumn("mean_beta", u6(col("s") / n))
      .withColumn("beta_sd", u6(sqrt(greatest(
        (n * col("s2") - col("s") * col("s")) / (n * (n - 1)), lit(0.0)))))
      .select(col("asset_id"), n.cast("long").as("n_betas"),
        col("mean_beta"), col("beta_sd"))
      .orderBy(col("asset_id"))
  }

  /** B164 `range_contraction` — the two classic volatility-contraction
    * patterns per bar: NR7 (today's range is the narrowest of the last
    * 7) and the inside day (today's bar inside yesterday's) — the
    * setups breakout systems screen for. Pure comparisons on u6
    * ranges and raw extremes (order-free, engine-exact); integer flags
    * plus each asset's pattern counts via window sums.
    */
  def rangeContraction(panel: DataFrame, span: Int = 7): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevFrame = byAsset.rowsBetween(-(span - 1), -1)
    val ph = lag(col("high"), 1).over(byAsset)
    val pl = lag(col("low"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("rng", u6(col("high") - col("low")))
      .withColumn("min_prev", min(col("rng")).over(prevFrame))
      .withColumn("n_prev", count(col("rng")).over(prevFrame))
      .withColumn("is_nr", when(col("n_prev") === (span - 1) &&
        col("rng") < col("min_prev"), 1L).otherwise(0L))
      .withColumn("is_inside", when(ph.isNotNull &&
        col("high") < ph && col("low") > pl, 1L).otherwise(0L))
      .select(col("asset_id"), col("date"), col("rng"),
        col("is_nr"), col("is_inside"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B165 `volatility_ratio` — short-window over long-window realized
    * vol per bar (5 vs 20 day sample std of u6 returns): the regime
    * gauge (ratio > 1 = vol expanding). Both stds are the standard
    * co-moment folds over frame arrays on one shared asset_id
    * partitioning; bars without a full long lookback emit NULL ratio
    * the same way in both engines (n guard, not data luck).
    */
  def volatilityRatio(panel: DataFrame, short: Int = 5, long: Int = 20): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    def sd(span: Int, out: String): DataFrame => DataFrame = df => {
      val arr = collect_list(col("ret")).over(w.rowsBetween(-(span - 1), Window.currentRow))
      df.withColumn(s"${out}_arr", arr)
        .withColumn(s"${out}_n", size(col(s"${out}_arr")).cast("double"))
        .withColumn(out, when(col(s"${out}_n") < 2, lit(null)).otherwise(
          u6(sqrt(greatest(
            (col(s"${out}_n") * Kernels.seqFold(col(s"${out}_arr"), "sumsq") -
              Kernels.seqFold(col(s"${out}_arr"), "sum") *
                Kernels.seqFold(col(s"${out}_arr"), "sum")) /
              (col(s"${out}_n") * (col(s"${out}_n") - 1)), lit(0.0))))))
    }
    val base = daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
    sd(long, "sd_long")(sd(short, "sd_short")(base))
      .withColumn("vr", when(col("sd_long_n") < long, lit(null)).otherwise(
        u6(col("sd_short") / when(col("sd_long") === 0, lit(null)).otherwise(col("sd_long")))))
      .select(col("asset_id"), col("date"), col("sd_short"), col("sd_long"), col("vr"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B166 `acceleration` — momentum of momentum: the 5-bar SMA's first
    * and second differences (velocity and acceleration of the smoothed
    * price). Pure lag arithmetic on the u6 fold mean — one fixed float
    * op sequence, nulls at the series head propagate identically.
    */
  def acceleration(panel: DataFrame, span: Int = 5): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("arr", collect_list(col("close")).over(frame))
      .withColumn("sma", u6(foldSum(col("arr")) / size(col("arr")).cast("double")))
      .withColumn("mom", u6(col("sma") - lag(col("sma"), 1).over(byAsset)))
      .withColumn("accel", u6(col("mom") - lag(col("mom"), 1).over(byAsset)))
      .select(col("asset_id"), col("date"), col("sma"), col("mom"), col("accel"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B167 `kama` — Kaufman's adaptive moving average: the smoothing
    * constant adapts to the efficiency ratio ER = |net move| /
    * Σ|bar moves| over the last `n` bars (trending → fast EMA, choppy
    * → slow). The INPUTS to each step (ER, and SC = (ER·(fast−slow)
    * + slow)²) are non-recursive window arithmetic — only the KAMA
    * line itself folds sequentially, the [[heikinAshi]] recipe:
    * calendar-bounded per-asset array, u6 at the same points the
    * DuckDB recursive CTE replays. fast/slow SC constants are the
    * u6-rounded decimals 0.666667 / 0.064516 (2/3, 2/31) so both
    * engines multiply the identical doubles. Flat windows (noise 0)
    * take ER = 0 — the slowest smoothing, not a division error.
    */
  def kama(panel: DataFrame, n: Int = 10): DataFrame = {
    val fastSC = 0.666667
    val slowSC = 0.064516
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-n, Window.currentRow)
    val prev = lag(col("close"), 1).over(byAsset)
    val withSc = dailyBars(panel.repartition(col("asset_id")))
      .withColumn("rn", row_number().over(byAsset))
      .withColumn("d", abs(col("close") - prev))
      .withColumn("carr", collect_list(col("close")).over(frame))
      .withColumn("farr", collect_list(col("d")).over(frame))
      .withColumn("nf", slice(col("farr"),
        greatest(size(col("farr")) - lit(n) + 1, lit(1)), lit(n)))
      .withColumn("noise", foldSum(col("nf")))
      .withColumn("signal", abs(col("close") - element_at(col("carr"), 1)))
      .withColumn("er", when(col("rn") === 1, lit(null))
        .when(col("noise") === 0, lit(0.0))
        .otherwise(u6(col("signal") / col("noise"))))
      .withColumn("sc", when(col("er").isNull, lit(null)).otherwise(u6(
        (col("er") * lit(fastSC - slowSC) + lit(slowSC)) *
          (col("er") * lit(fastSC - slowSC) + lit(slowSC)))))
    withSc
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(
        col("date"), col("close"), col("er"), col("sc")))).as("bs"))
      // linear-time compiled scan (RecurrenceFold) — the HOF
      // concat-accumulator form re-copied the array per step (O(h²) in
      // per-asset history; the r9 depth probe measured the bend), same
      // recursion bit-for-bit
      .withColumn("ka", Kernels.recurrence(col("bs"), "kama"))
      .select(col("asset_id"), explode(col("ka")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"), col("h.close").as("close"),
        col("h.er").as("er"), col("h.kama").as("kama"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B168 `rolling_moments` — rolling skewness and excess kurtosis of
    * daily returns over a `window`-day frame: the tail/asymmetry
    * companion to [[rollingVol]]'s second moment. Central power sums
    * fold left-assoc over the date-sorted frame array (deviation from
    * the u6 frame mean, raw inside the fold, u6 only at the two
    * emitted ratios); frames shorter than 4 returns emit NULL (a
    * 3-point kurtosis is noise, and the gate keeps both moments on one
    * row count).
    */
  def rollingMoments(panel: DataFrame, window: Int = 20): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(window - 1), Window.currentRow)
    val prev = lag(col("value"), 1).over(byAsset)
    def dev(p: Int): Column = Kernels.seqFold(
      transform(col("arr"), x => {
        val d = x - col("m")
        (1 until p).foldLeft(d)((a, _) => a * d)
      }), "sum")
    daily
      .withColumn("ret", u6(col("value") /
        when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("arr", collect_list(col("ret")).over(frame))
      .withColumn("n", size(col("arr")).cast("double"))
      .withColumn("m", u6(foldSum(col("arr")) / col("n")))
      .withColumn("s2", dev(2))
      .withColumn("s3", dev(3))
      .withColumn("s4", dev(4))
      .withColumn("skew", when(col("n") < 4 || col("s2") === 0, lit(null))
        .otherwise(u6(sqrt(col("n")) * col("s3") /
          sqrt(col("s2") * col("s2") * col("s2")))))
      .withColumn("ex_kurt", when(col("n") < 4 || col("s2") === 0, lit(null))
        .otherwise(u6(col("n") * col("s4") / (col("s2") * col("s2")) - 3)))
      .select(col("asset_id"), col("date"), col("ret"),
        col("skew"), col("ex_kurt"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B169 `dist_from_high` — distance from the trailing `window`-day
    * high (the "52-week high" anomaly input) plus the age of that
    * high: dist = u6(value/hi − 1) ≤ 0, days_since = positions back to
    * the MOST RECENT occurrence of the max (reverse array scan —
    * first match in the reversed frame; double equality against the
    * same parquet double is exact in both engines).
    */
  def distFromHigh(panel: DataFrame, window: Int = 252): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    daily
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("hi", array_max(col("arr")))
      .withColumn("dist", u6(col("value") /
        when(col("hi") === 0, lit(null)).otherwise(col("hi")) - 1))
      .withColumn("days_since",
        (array_position(reverse(col("arr")), col("hi")) - 1).cast("long"))
      .select(col("asset_id"), col("date"), col("value"),
        col("hi").as("trailing_high"), col("dist"), col("days_since"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B170 `dow_seasonality` — day-of-week return profile per asset:
    * micro-integer return sums bucketed by weekday (1 = Sunday, the
    * Spark `dayofweek` convention; the oracle maps DuckDB's 0-based
    * `dayofweek` to match), mean as the exact integer division
    * (Σmicro div n)/1e6 — order-insensitive by construction.
    */
  def dowSeasonality(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(byAsset)
    daily
      .withColumn("ret", u6(col("value") /
        when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("ret_micro", round(col("ret") * 1e6).cast("long"))
      .groupBy(col("asset_id"), dayofweek(col("date")).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("ret_micro")).as("sum_micro"),
        sum(when(col("ret_micro") > 0, 1L).otherwise(0L)).as("n_up"))
      .withColumn("mean_ret",
        (expr("sum_micro div n_days").cast("double")) / 1e6)
      .select(col("asset_id"), col("dow"), col("n_days"),
        col("mean_ret"), col("n_up"))
      .orderBy(col("asset_id"), col("dow"))
  }

  /** B171 `gap_stats` — per-asset overnight-gap profile: how often the
    * open jumps beyond ±`thresholdMicro` (default 1%) vs the prior
    * close, plus the exact integer mean gap and the largest absolute
    * gap. Gaps are the u6 ratios [[overnightGap]] emits; counting and
    * the mean use their micro-integer form, so the aggregate is
    * order-insensitive.
    */
  /** B172 `vol_regime` — per-asset volatility-regime summary: each
    * day's rolling vol ([[rollingVolCore]]'s u6 value) classified
    * against the asset's own full-series EXACT lower-median vol (an
    * integer order statistic over the sorted vol array — no
    * interpolation, engine-exact); reports regime day counts and
    * whether the LATEST day sits in the high-vol regime. Calendar-
    * bounded per-asset arrays; one asset_id shuffle shared end-to-end.
    */
  def volRegime(panel: DataFrame, window: Int = 20): DataFrame =
    rollingVolCore(panel, window)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        array_sort(collect_list(col("vol"))).as("vs"),
        max_by(col("vol"), col("date")).as("last_vol"))
      .withColumn("median_vol",
        expr("element_at(vs, cast((size(vs) + 1) div 2 as int))"))
      .withColumn("n_high", size(filter(col("vs"), v => v > col("median_vol"))).cast("long"))
      .withColumn("n_low", col("n_days") - col("n_high"))
      .withColumn("in_high_regime", (col("last_vol") > col("median_vol")).cast("long"))
      .select(col("asset_id"), col("n_days"), col("median_vol"),
        col("n_high"), col("n_low"), col("in_high_regime"))
      .orderBy(col("asset_id"))

  /** B173 `fractal_pivots` — Bill Williams-style 5-bar fractals: a
    * pivot high is a bar whose high STRICTLY exceeds the two bars on
    * each side (mirror for pivot lows). Reports per-asset pivot counts
    * and the most recent pivot levels — the swing structure behind
    * support/resistance overlays. Pure lead/lag arithmetic on the
    * daily bars; ties break conservatively (equal neighbors are not
    * pivots).
    */
  def fractalPivots(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("ph",
        col("high") > lag(col("high"), 1).over(byAsset) &&
          col("high") > lag(col("high"), 2).over(byAsset) &&
          col("high") > lead(col("high"), 1).over(byAsset) &&
          col("high") > lead(col("high"), 2).over(byAsset))
      .withColumn("pl",
        col("low") < lag(col("low"), 1).over(byAsset) &&
          col("low") < lag(col("low"), 2).over(byAsset) &&
          col("low") < lead(col("low"), 1).over(byAsset) &&
          col("low") < lead(col("low"), 2).over(byAsset))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("ph"), 1L).otherwise(0L)).as("n_pivot_high"),
        sum(when(col("pl"), 1L).otherwise(0L)).as("n_pivot_low"),
        max_by(when(col("ph"), col("high")), when(col("ph"), col("date"))).as("last_pivot_high"),
        max_by(when(col("pl"), col("low")), when(col("pl"), col("date"))).as("last_pivot_low"))
      .select(col("asset_id"), col("n_days"), col("n_pivot_high"),
        col("n_pivot_low"), col("last_pivot_high"), col("last_pivot_low"))
      .orderBy(col("asset_id"))
  }

  /** B174 `turn_of_month` — the turn-of-month effect: daily returns
    * bucketed early (day ≤ 5) / mid / late (day ≥ 25), exact integer
    * micro means per asset × bucket — the calendar anomaly screen next
    * to [[dowSeasonality]]'s weekday profile.
    */
  def turnOfMonth(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(byAsset)
    daily
      .withColumn("ret", u6(col("value") /
        when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("ret_micro", round(col("ret") * 1e6).cast("long"))
      .withColumn("bucket",
        when(dayofmonth(col("date")) <= 5, "early")
          .when(dayofmonth(col("date")) >= 25, "late")
          .otherwise("mid"))
      .groupBy(col("asset_id"), col("bucket"))
      .agg(count(lit(1)).as("n_days"), sum(col("ret_micro")).as("sum_micro"))
      .withColumn("mean_ret", expr("sum_micro div n_days").cast("double") / 1e6)
      .select(col("asset_id"), col("bucket"), col("n_days"), col("mean_ret"))
      .orderBy(col("asset_id"), col("bucket"))
  }

  /** B175 `volume_seasonality` — tick-volume weekday profile per asset:
    * integer totals and the exact milli-mean ticks per weekday — the
    * liquidity calendar a scheduler sizes intraday jobs against.
    * Weekday convention as in [[dowSeasonality]].
    */
  def volumeSeasonality(panel: DataFrame): DataFrame =
    dailyBars(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"), dayofweek(col("date")).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("n_ticks")).as("total_ticks"))
      .withColumn("mean_ticks_milli", expr("(1000 * total_ticks) div n_days"))
      .select(col("asset_id"), col("dow"), col("n_days"),
        col("total_ticks"), col("mean_ticks_milli"))
      .orderBy(col("asset_id"), col("dow"))

  /** B176 `round_price_clustering` — price-clustering microstructure
    * check: the share of ticks landing on round dollars and half
    * dollars (human-quoted markets cluster; synthetic/mid-point feeds
    * don't). Exact integer cents via the [[vwap]] decimal-cast
    * discipline, then modular counts — fully order-insensitive.
    */
  def roundPriceClustering(panel: DataFrame): DataFrame =
    panel
      .withColumn("cents", expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(when(col("cents") % 100 === 0, 1L).otherwise(0L)).as("n_round_dollar"),
        sum(when(col("cents") % 50 === 0, 1L).otherwise(0L)).as("n_round_half"))
      .withColumn("dollar_pm", expr("(1000 * n_round_dollar) div n_ticks"))
      .withColumn("half_pm", expr("(1000 * n_round_half) div n_ticks"))
      .select(col("asset_id"), col("n_ticks"), col("n_round_dollar"),
        col("n_round_half"), col("dollar_pm"), col("half_pm"))
      .orderBy(col("asset_id"))

  def gapStats(panel: DataFrame, thresholdMicro: Long = 10000L): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevClose = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("gap", u6(col("open") /
        when(prevClose === 0, lit(null)).otherwise(prevClose) - 1))
      .filter(col("gap").isNotNull)
      .withColumn("gap_micro", round(col("gap") * 1e6).cast("long"))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("gap_micro") > thresholdMicro, 1L).otherwise(0L)).as("n_gap_up"),
        sum(when(col("gap_micro") < -thresholdMicro, 1L).otherwise(0L)).as("n_gap_down"),
        sum(col("gap_micro")).as("sum_micro"),
        max(abs(col("gap_micro"))).as("max_abs_micro"))
      .withColumn("mean_gap", expr("sum_micro div n_days").cast("double") / 1e6)
      .withColumn("max_abs_gap", col("max_abs_micro").cast("double") / 1e6)
      .select(col("asset_id"), col("n_days"), col("n_gap_up"),
        col("n_gap_down"), col("mean_gap"), col("max_abs_gap"))
      .orderBy(col("asset_id"))
  }

  /** B183 `chande_momentum` — Chande Momentum Oscillator over the LWW
    * daily value: 100·(Σup − Σdown)/(Σup + Σdown) on the last `n` daily
    * changes, the unsmoothed cousin of [[rsi]] (same gain/loss split,
    * plain sums instead of Wilder EW — so it reuses the horner_pos/neg
    * folds at weight 1). Frame partial at the series head like the rest
    * of the family; an all-flat frame (denominator 0) emits NULL.
    */
  def chandeMomentum(panel: DataFrame, n: Int = 14): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(byAsset)
    val frame = byAsset.rowsBetween(-(n - 1), Window.currentRow)
    daily
      .withColumn("d", col("value") - prev)
      .filter(col("d").isNotNull)
      .withColumn("arr", collect_list(col("d")).over(frame))
      .withColumn("su", Kernels.seqFold(col("arr"), "horner_pos", 1.0))
      .withColumn("sd", Kernels.seqFold(col("arr"), "horner_neg", 1.0))
      .withColumn("cmo", when(col("su") + col("sd") === 0, lit(null))
        .otherwise(u6(lit(100.0) * (col("su") - col("sd")) / (col("su") + col("sd")))))
      .select(col("asset_id"), col("date"), col("cmo"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B184 `vhf` — Vertical Horizontal Filter: trendiness as
    * (max − min of the last `n` daily values) over Σ|daily change| in
    * the same frame — high when price travels somewhere, low when it
    * churns. Numerator from frame max/min (order-free), denominator a
    * left fold of |d| in date order (double sums are order-sensitive);
    * a flat frame (denominator 0) emits NULL.
    */
  def vhf(panel: DataFrame, n: Int = 28): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(byAsset)
    val frame = byAsset.rowsBetween(-(n - 1), Window.currentRow)
    daily
      .withColumn("d", col("value") - prev)
      .filter(col("d").isNotNull)
      .withColumn("hi", max(col("value")).over(frame))
      .withColumn("lo", min(col("value")).over(frame))
      .withColumn("den", Kernels.seqFold(
        transform(collect_list(col("d")).over(frame), x => abs(x)), "sum"))
      .withColumn("vhf", when(col("den") === 0, lit(null))
        .otherwise(u6((col("hi") - col("lo")) / col("den"))))
      .select(col("asset_id"), col("date"), col("vhf"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B185 `imi` — Intraday Momentum Index: RSI arithmetic applied to
    * the intraday move close − open over the last `n` bars (gains =
    * up-day bodies, losses = down-day bodies) — candle-body momentum
    * where [[rsi]] reads close-to-close. Plain-sum folds (weight-1
    * horner_pos/neg) in date order; a frame of perfect doji bars
    * (denominator 0) emits NULL.
    */
  def imi(panel: DataFrame, n: Int = 14): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(n - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("body", col("close") - col("open"))
      .withColumn("arr", collect_list(col("body")).over(frame))
      .withColumn("g", Kernels.seqFold(col("arr"), "horner_pos", 1.0))
      .withColumn("l", Kernels.seqFold(col("arr"), "horner_neg", 1.0))
      .withColumn("imi", when(col("g") + col("l") === 0, lit(null))
        .otherwise(u6(lit(100.0) * col("g") / (col("g") + col("l")))))
      .select(col("asset_id"), col("date"), col("imi"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B186 `disparity` — Disparity Index: 100·(value − SMAₙ)/SMAₙ, the
    * percent stretch from the n-day mean (the mean-reversion distance
    * [[smaCross]] signals on and [[bollinger]] normalizes by vol).
    * SMA is the u6 frame fold over available history (partial frames
    * at the head, the [[smaCross]] convention); SMA 0 emits NULL.
    */
  def disparity(panel: DataFrame, n: Int = 13): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(n - 1), Window.currentRow)
    daily
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("sma", u6(foldSum(col("arr")) / size(col("arr")).cast("double")))
      .withColumn("disparity", when(col("sma") === 0, lit(null))
        .otherwise(u6(lit(100.0) * (col("value") - col("sma")) / col("sma"))))
      .select(col("asset_id"), col("date"), col("disparity"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B187 `gap_fill_rate` — per asset: how often an overnight gap
    * (open ≠ yesterday's close) FILLS within `k` sessions, i.e. price
    * trades back through the prior close (an up-gap fills when some
    * low in the gap day's next k sessions — gap day included, gaps
    * often fill same-day — reaches ≤ prior close; a down-gap
    * mirror-images on highs). The mean-reversion base rate behind
    * "gaps fill" lore, and [[gapStats]]' behavioral sequel. Integer
    * counts and per-mille integer-div rates; a side with zero gaps
    * emits NULL rates. Forward-looking min/max frames are computed on
    * the FULL bar series before gap days are filtered, so fill
    * checks see every session, not just other gap days.
    */
  def gapFillRate(panel: DataFrame, k: Int = 5): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val fwd = byAsset.rowsBetween(Window.currentRow, k - 1)
    val prevClose = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("pc", prevClose)
      .withColumn("fwd_lo", min(col("low")).over(fwd))
      .withColumn("fwd_hi", max(col("high")).over(fwd))
      .filter(col("pc").isNotNull && col("open") =!= col("pc"))
      .withColumn("up", col("open") > col("pc"))
      .withColumn("filled", when(col("up"), col("fwd_lo") <= col("pc"))
        .otherwise(col("fwd_hi") >= col("pc")))
      .groupBy(col("asset_id"))
      .agg(
        sum(when(col("up"), 1L).otherwise(0L)).as("n_up"),
        sum(when(col("up") && col("filled"), 1L).otherwise(0L)).as("n_up_filled"),
        sum(when(!col("up"), 1L).otherwise(0L)).as("n_down"),
        sum(when(!col("up") && col("filled"), 1L).otherwise(0L)).as("n_down_filled"))
      .withColumn("up_fill_pm",
        expr("CASE WHEN n_up = 0 THEN NULL ELSE (1000 * n_up_filled) div n_up END"))
      .withColumn("down_fill_pm",
        expr("CASE WHEN n_down = 0 THEN NULL ELSE (1000 * n_down_filled) div n_down END"))
      .select(col("asset_id"), col("n_up"), col("n_up_filled"), col("up_fill_pm"),
        col("n_down"), col("n_down_filled"), col("down_fill_pm"))
      .orderBy(col("asset_id"))
  }

  /** B188 `rwi` — Random Walk Index, fixed-horizon form: how far the
    * bar's extreme travelled from the opposite extreme n−1 bars back,
    * in units of the random-walk yardstick ATRₙ·√n — RWI ≳ 1 means
    * the move outran a random walk. rwi_high = (high − lowₜ₋ₙ₊₁)/
    * (ATRₙ·√n), rwi_low mirror-imaged. TR is the [[supertrend]]
    * convention (u6, first bar = high−low), ATR its plain u6 SMA over
    * the frame; bars without the full n−1 lookback (or a zero ATR)
    * emit NULL.
    */
  def rwi(panel: DataFrame, n: Int = 8): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevClose = lag(col("close"), 1).over(byAsset)
    val frame = byAsset.rowsBetween(-(n - 1), Window.currentRow)
    val sqrtN = lit(math.sqrt(n.toDouble))
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tr", u6(
        when(prevClose.isNull, col("high") - col("low"))
          .otherwise(greatest(
            col("high") - col("low"),
            abs(col("high") - prevClose),
            abs(col("low") - prevClose)))))
      .withColumn("arr", collect_list(col("tr")).over(frame))
      .withColumn("atr", u6(foldSum(col("arr")) / size(col("arr")).cast("double")))
      .withColumn("lo_n", lag(col("low"), n - 1).over(byAsset))
      .withColumn("hi_n", lag(col("high"), n - 1).over(byAsset))
      .withColumn("den", when(col("atr") === 0, lit(null)).otherwise(col("atr") * sqrtN))
      .withColumn("rwi_high", u6((col("high") - col("lo_n")) / col("den")))
      .withColumn("rwi_low", u6((col("hi_n") - col("low")) / col("den")))
      .select(col("asset_id"), col("date"), col("rwi_high"), col("rwi_low"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B189 `leverage_effect` — per-asset Pearson correlation between
    * today's return and TOMORROW'S change in absolute return
    * (|rₜ₊₁| − |rₜ|): the classic asymmetric-volatility signature —
    * negative when down moves pump vol harder than up moves (the
    * missing piece beside [[volClustering]]'s sign-free |r|
    * autocorrelation). Whole-history, same fold-sum machinery as
    * [[autocorr]] (arrays sorted per asset, left-assoc sums, compiled
    * dot), u6 at the emit; assets with < 3 returns drop.
    */
  def leverageEffect(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("m", size(col("ra")))
      .filter(col("m") >= 3)
      .withColumn("xa", slice(col("ra"), lit(1), col("m") - 1))
      .withColumn("ya", zip_with(
        slice(col("ra"), lit(2), col("m") - 1),
        slice(col("ra"), lit(1), col("m") - 1),
        (nxt, cur) => abs(nxt) - abs(cur)))
      .withColumn("n", (col("m") - 1).cast("double"))
      .withColumn("sx", foldSum(col("xa")))
      .withColumn("sy", foldSum(col("ya")))
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("sx2", foldSumSq(col("xa")))
      .withColumn("sy2", foldSumSq(col("ya")))
      .withColumn("den",
        sqrt(greatest(n * col("sx2") - col("sx") * col("sx"), lit(0.0))) *
          sqrt(greatest(n * col("sy2") - col("sy") * col("sy"), lit(0.0))))
      .withColumn("leverage_corr", u6((n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), n.cast("long").as("n_pairs"), col("leverage_corr"))
      .orderBy(col("asset_id"))
  }

  /** B190 `mansfield_rs` — Mansfield Relative Strength vs the
    * equal-weight market: rp = value/market level per date, and
    * RS = 100·(rp/SMAₙ(rp) − 1) — outperformance vs the asset's own
    * relative-performance baseline (the Stage-Analysis screen;
    * [[momentumXsec]] ranks levels, this tracks each asset's trend
    * AGAINST the tape). The market level is the per-date mean over
    * an asset_id-ordered fold (deterministic sum order) broadcast
    * back — the [[beta]] market-aggregate shape on levels instead of
    * returns. Partial SMA frames at the head; zero market or SMA
    * emits NULL.
    */
  def mansfieldRs(panel: DataFrame, n: Int = 10): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val mkt = daily
      .groupBy(col("date"))
      .agg(transform(array_sort(collect_list(struct(col("asset_id"), col("value")))),
        s => s("value")).as("varr"))
      .select(col("date"),
        u6(foldSum(col("varr")) / size(col("varr")).cast("double")).as("mkt"))
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(n - 1), Window.currentRow)
    daily
      .join(broadcast(mkt), Seq("date"))
      .withColumn("rp", u6(col("value") /
        when(col("mkt") === 0, lit(null)).otherwise(col("mkt"))))
      .filter(col("rp").isNotNull)
      .withColumn("arr", collect_list(col("rp")).over(frame))
      .withColumn("sma", u6(foldSum(col("arr")) / size(col("arr")).cast("double")))
      .withColumn("mansfield_rs", u6(lit(100.0) * (col("rp") /
        when(col("sma") === 0, lit(null)).otherwise(col("sma")) - 1)))
      .select(col("asset_id"), col("date"), col("mansfield_rs"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B194 `stc` — Schaff Trend Cycle: MACD(23,50) run through TWO
    * stochastic-normalize → EW(3)-smooth stages (the "double
    * stochastic" that makes STC cycle between 0 and 100 faster than
    * MACD turns). Every stage follows the house conventions: EW means
    * are span-bounded normalized Horner folds ([[macd]]'s recipe),
    * stochastics are frame min/max with the flat-frame → 50
    * convention, u6 at every stage boundary so the DuckDB chain
    * replays stage by stage. One asset_id shuffle carries all six
    * window passes.
    */
  def stc(panel: DataFrame, fast: Int = 23, slow: Int = 50, cycle: Int = 10,
          smooth: Int = 3, span: Int = 120): DataFrame = {
    def w(n: Int): Double = 1.0 - 2.0 / (n + 1.0)
    def ew(arr: Column, weight: Double): Column =
      Kernels.seqFold(arr, "horner", weight) / Kernels.seqFold(arr, "horner_count", weight)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    val cyc = byAsset.rowsBetween(-(cycle - 1), Window.currentRow)
    val sm = byAsset.rowsBetween(-(smooth * 4 - 1), Window.currentRow)
    // flat-frame conventions differ by stage: a flat MACD window is
    // genuinely trendless (→ 50, neutral), but a flat d1 window is a
    // SATURATED oscillator (d1 is already 0-100 — a steady trend pins
    // it at 100 for the whole window) and must carry its level, not
    // collapse to neutral
    def stoch(c: Column, lo: Column, hi: Column, flat: Column): Column =
      when(hi === lo, flat)
        .otherwise(u6(lit(100.0) * (c - lo) / (hi - lo)))
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("macd", u6(ew(col("arr"), w(fast)) - ew(col("arr"), w(slow))))
      .withColumn("k1", stoch(col("macd"),
        min(col("macd")).over(cyc), max(col("macd")).over(cyc), lit(50.0)))
      .withColumn("d1", u6(ew(collect_list(col("k1")).over(sm), w(smooth))))
      .withColumn("k2", stoch(col("d1"),
        min(col("d1")).over(cyc), max(col("d1")).over(cyc), col("d1")))
      .withColumn("stc", u6(ew(collect_list(col("k2")).over(sm), w(smooth))))
      .select(col("asset_id"), col("date"), col("stc"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B195 `donchian_breakout` — breakout-event statistics per asset:
    * a breakout day closes above the PRIOR n-day high (strictly
    * backward-looking channel — today's own high never triggers
    * itself), and each event is scored by its `fwd`-day forward
    * return. Event count, scored-event count, mean forward return
    * (date-ordered fold over the collected event array), and the
    * per-mille win rate — the base-rate evidence behind
    * [[donchian]]-style channel systems. Events near the series end
    * count as breakouts but carry no score.
    */
  def donchianBreakout(panel: DataFrame, n: Int = 20, fwd: Int = 5): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val priorFrame = byAsset.rowsBetween(-n, -1)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("prior_high", max(col("high")).over(priorFrame))
      .withColumn("fwd_ret", u6(lead(col("close"), fwd).over(byAsset) /
        when(col("close") === 0, lit(null)).otherwise(col("close")) - 1))
      .filter(col("prior_high").isNotNull && col("close") > col("prior_high"))
      .groupBy(col("asset_id"))
      .agg(
        count(lit(1)).as("n_breakouts"),
        sum(when(col("fwd_ret").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("fwd_ret") > 0, 1L).otherwise(0L)).as("n_wins"),
        transform(array_sort(collect_list(
          when(col("fwd_ret").isNotNull, struct(col("date"), col("fwd_ret"))))),
          s => s("fwd_ret")).as("fa"))
      .withColumn("mean_fwd_ret",
        when(col("n_scored") === 0, lit(null))
          .otherwise(u6(foldSum(col("fa")) / col("n_scored").cast("double"))))
      .withColumn("win_pm",
        expr("CASE WHEN n_scored = 0 THEN NULL ELSE (1000 * n_wins) div n_scored END"))
      .select(col("asset_id"), col("n_breakouts"), col("n_scored"),
        col("mean_fwd_ret"), col("win_pm"))
      .orderBy(col("asset_id"))
  }

  /** B196 `tick_bars` — event-time sampling: OHLC bars of exactly `n`
    * ticks each (the tick-clock alternative to wall-clock bars —
    * activity-normalized sampling, the standard cure for the
    * microstructure noise [[volSignature]] diagnoses; volume/dollar
    * clocks are the same construction on other counters). Bar id is
    * an integer division of the per-asset arrival rank; open/close
    * ride min/max over (rank, value) structs — order-insensitive
    * aggregates only, no folds.
    */
  def tickBars(panel: DataFrame, n: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("ts"), col("seq"))
    panel.repartition(col("asset_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("bar_id", expr(s"CAST(rn - 1 AS BIGINT) div $n"))
      .groupBy(col("asset_id"), col("bar_id"))
      .agg(
        min(col("ts")).as("t_open"), max(col("ts")).as("t_close"),
        min(struct(col("rn"), col("value"))).as("o"),
        max(struct(col("rn"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        count(lit(1)).as("n_ticks"))
      .select(col("asset_id"), col("bar_id"), col("t_open"), col("t_close"),
        col("o.value").as("open"), col("high"), col("low"),
        col("c.value").as("close"), col("n_ticks"))
      .orderBy(col("asset_id"), col("bar_id"))
  }

  /** B191 `vol_signature` — the volatility signature plot: per-asset
    * realized variance at several intraday sampling frequencies
    * (1/5/15/30-minute last-price grids). Microstructure noise makes
    * RV EXPLODE as the grid tightens on noisy ticks and stay flat on
    * clean ones — the plot is how a desk picks its RV sampling
    * frequency. Each frequency buckets ticks by µs-epoch div, takes
    * the LWW last price per bucket, u6 returns over CONSECUTIVE
    * populated buckets, and folds Σr² in bucket order (doubles — the
    * order-stable array fold, not a window sum). The frequencies are
    * independent aggregate chains over one shared asset partitioning,
    * unioned.
    */
  def volSignature(panel: DataFrame, freqMinutes: Seq[Int] = Seq(1, 5, 15, 30)): DataFrame = {
    val base = panel.repartition(col("asset_id"))
    freqMinutes.map { f =>
      val span = f * 60 // integer seconds-epoch buckets, the bars_5min convention
      val lwwB = Window.partitionBy(col("asset_id"), col("bucket"))
        .orderBy(col("ts").desc, col("seq").desc)
      val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("bucket"))
      val prev = lag(col("v"), 1).over(byAsset)
      base
        .withColumn("bucket", expr(s"unix_timestamp(ts) div $span"))
        .withColumn("rn", row_number().over(lwwB))
        .filter(col("rn") === 1)
        .select(col("asset_id"), col("bucket"), col("value").as("v"))
        .withColumn("ret", u6(col("v") / when(prev === 0, lit(null)).otherwise(prev) - 1))
        .filter(col("ret").isNotNull)
        .groupBy(col("asset_id"))
        .agg(transform(array_sort(collect_list(struct(col("bucket"), col("ret")))),
          s => s("ret")).as("ra"))
        .select(col("asset_id"), lit(f.toLong).as("freq_min"),
          size(col("ra")).cast("long").as("n_rets"),
          u6(foldSumSq(col("ra"))).as("rv"))
    }.reduce(_.unionByName(_)).orderBy(col("asset_id"), col("freq_min"))
  }

  /** B192 `order_flow_autocorr` — lag-1 autocorrelation of the
    * tick-rule trade signs (the [[tickImbalance]] carry-forward
    * convention): the order-flow persistence number behind order
    * splitting and queue models (signs are famously positively
    * autocorrelated). Signs are ±1, so every Pearson ingredient is an
    * INTEGER sum (Σx, Σy, Σxy; Σx² = Σy² = n) — order-insensitive,
    * no folds — and only the final ratio is floated (u6, zero-den
    * NULL). One asset_id shuffle.
    */
  def orderFlowAutocorr(panel: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("ts"), col("seq"))
    val carryW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("value"), 1).over(w)
    val n = col("n").cast("double")
    panel.repartition(col("asset_id"))
      .withColumn("d", when(prev.isNull, lit(null))
        .otherwise(signum(col("value") - prev).cast("int")))
      .withColumn("side",
        last(when(col("d") =!= 0, col("d")), ignoreNulls = true).over(carryW))
      .filter(col("side").isNotNull)
      .withColumn("nxt", lead(col("side"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("side").cast("long")).as("sx"),
        sum(col("nxt").cast("long")).as("sy"),
        sum((col("side") * col("nxt")).cast("long")).as("sxy"))
      .withColumn("den",
        sqrt(greatest(n * n - col("sx") * col("sx"), lit(0.0))) *
          sqrt(greatest(n * n - col("sy") * col("sy"), lit(0.0))))
      .withColumn("sign_autocorr", u6((n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), col("n").as("n_pairs"), col("sign_autocorr"))
      .orderBy(col("asset_id"))
  }

  /** B193 `vpt` — Volume-Price Trend: running Σ retₜ·volₜ (vol =
    * n_ticks), [[obv]]'s proportional cousin (OBV moves by the whole
    * volume on any up-day; VPT scales it by the return). Integer-safe
    * cumulation: the u6 return is exact on the micro grid, so
    * ret_micro = round(ret·10⁶) is an exact long, the running sum is
    * an INTEGER window sum (order-insensitive — no fold needed), and
    * only the emitted VPT divides back to double. First bar
    * contributes 0 (the obv convention).
    */
  def vpt(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val run = byAsset.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevClose = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("ret", u6(col("close") /
        when(prevClose === 0, lit(null)).otherwise(prevClose) - 1))
      .withColumn("contrib_micro",
        when(col("ret").isNull, lit(0L))
          .otherwise(round(col("ret") * 1e6).cast("long") * col("n_ticks")))
      .withColumn("vpt_micro", sum(col("contrib_micro")).over(run))
      .select(col("asset_id"), col("date"),
        col("contrib_micro"),
        (col("vpt_micro").cast("double") / 1e6).as("vpt"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B201 `trin` — the Arms Index (TRIN) per trading date:
    * (advancers/decliners) ÷ (advancing volume/declining volume), the
    * classic breadth-vs-volume divergence gauge ([[advanceDecline]]
    * counts issues; TRIN weighs whether volume CONFIRMS the count).
    * Built on the daily bars: an asset advances when close > previous
    * close, its "volume" is the tick count (the panel's volume proxy,
    * [[obv]]'s convention). Every aggregate is an INTEGER count/sum —
    * order-insensitive, exact under any partitioning — and only the
    * final ratio-of-ratios floats (u6; NULL when any denominator leg
    * is 0, where the index is undefined). One asset_id shuffle for the
    * bars + lag, one date shuffle for the market rollup — the date
    * rollup is #dates rows, trivially broadcast-joinable downstream.
    */
  def trin(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prevClose = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("pc", prevClose)
      .filter(col("pc").isNotNull)
      .groupBy(col("date"))
      .agg(
        sum(when(col("close") > col("pc"), 1L).otherwise(0L)).as("n_adv"),
        sum(when(col("close") < col("pc"), 1L).otherwise(0L)).as("n_dec"),
        sum(when(col("close") > col("pc"), col("n_ticks")).otherwise(0L)).as("adv_vol"),
        sum(when(col("close") < col("pc"), col("n_ticks")).otherwise(0L)).as("dec_vol"))
      .withColumn("trin", u6(
        (col("n_adv").cast("double") /
          when(col("n_dec") === 0, lit(null)).otherwise(col("n_dec").cast("double"))) /
          when(col("dec_vol") === 0 || col("adv_vol") === 0, lit(null))
            .otherwise(col("adv_vol").cast("double") / col("dec_vol").cast("double"))))
      .select(col("date"), col("n_adv"), col("n_dec"),
        col("adv_vol"), col("dec_vol"), col("trin"))
      .orderBy(col("date"))
  }

  /** B202 `jarque_bera` — the Jarque–Bera normality test per asset
    * over its full daily-return history: JB = n/6·(g₁² + g₂²/4) from
    * [[retMoments]]' skew g₁ and excess kurtosis g₂ (same date-ordered
    * fold arrays, same raw-moment-to-central-moment algebra, so the
    * statistic is bit-identical cross-engine). `normal_5pct` compares
    * the ROUNDED statistic to the χ²(2) 95% critical value 5.991465 —
    * rounding before the comparison keeps the boolean engine-stable at
    * the boundary. The fat-tail screen run before any VaR number is
    * trusted ([[varCvar]] assumes the empirical tail IS the tail;
    * JB says whether a normal approximation would have lied).
    */
  def jarqueBera(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 4)
      .withColumn("m", foldSum(col("ra")) / n)
      .withColumn("m2", Kernels.seqFold(col("ra"), "sumsq") / n - col("m") * col("m"))
      .withColumn("m3", Kernels.seqFold(col("ra"), "sum3") / n
        - lit(3.0) * col("m") * (Kernels.seqFold(col("ra"), "sumsq") / n)
        + lit(2.0) * col("m") * col("m") * col("m"))
      .withColumn("m4", Kernels.seqFold(col("ra"), "sum4") / n
        - lit(4.0) * col("m") * (Kernels.seqFold(col("ra"), "sum3") / n)
        + lit(6.0) * col("m") * col("m") * (Kernels.seqFold(col("ra"), "sumsq") / n)
        - lit(3.0) * col("m") * col("m") * col("m") * col("m"))
      .withColumn("g1", col("m3") /
        when(col("m2") <= 0, lit(null)).otherwise(col("m2") * sqrt(col("m2"))))
      .withColumn("g2", col("m4") /
        when(col("m2") <= 0, lit(null)).otherwise(col("m2") * col("m2")) - 3)
      .withColumn("jb", u6(n / lit(6.0) *
        (col("g1") * col("g1") + col("g2") * col("g2") / lit(4.0))))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        u6(col("g1")).as("skew"), u6(col("g2")).as("ex_kurt"),
        col("jb"), (col("jb") < lit(5.991465)).as("normal_5pct"))
      .orderBy(col("asset_id"))
  }

  /** B203 `rolling_ols_trend` — rolling OLS of the LWW daily close on
    * the in-frame time index t = 1..n over a `window`-day frame: slope
    * (trend per day), the fitted value at the frame's last point (the
    * "linear regression indicator" chartists overlay), and R² (trend
    * quality — [[trendIntensity]]'s regression-grade cousin). The
    * x-axis is INTEGRAL, so Σt and Σt² are exact closed forms of n and
    * the only float folds are the value sums, ridden left-to-right in
    * date order like every other frame fold. R² NULLs on a flat frame
    * (Syy ≤ 0); the slope denominator n·Σt²−(Σt)² is exactly
    * n²(n²−1)/12 > 0 for n ≥ 2, never guarded.
    */
  def rollingOlsTrend(panel: DataFrame, window: Int = 20, minN: Int = 5): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val n = col("n")
    daily
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("n", size(col("arr")).cast("double"))
      .filter(n >= minN)
      .withColumn("sx", n * (n + 1) / lit(2.0))
      .withColumn("sx2", n * (n + 1) * (lit(2.0) * n + 1) / lit(6.0))
      .withColumn("sy", foldSum(col("arr")))
      .withColumn("sy2", foldSumSq(col("arr")))
      .withColumn("sxy", foldSum(transform(col("arr"),
        (v, i) => v * (i + 1).cast("double"))))
      .withColumn("b", (n * col("sxy") - col("sx") * col("sy")) /
        (n * col("sx2") - col("sx") * col("sx")))
      .withColumn("a", (col("sy") - col("b") * col("sx")) / n)
      .withColumn("syy", n * col("sy2") - col("sy") * col("sy"))
      .select(col("asset_id"), col("date"), col("value"),
        n.cast("long").as("n_days"),
        u6(col("b")).as("slope"),
        u6(col("a") + col("b") * n).as("fitted"),
        u6((n * col("sxy") - col("sx") * col("sy")) *
          (n * col("sxy") - col("sx") * col("sy")) /
          ((n * col("sx2") - col("sx") * col("sx")) *
            when(col("syy") <= 0, lit(null)).otherwise(col("syy")))).as("r2"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B204 `ewma_vol` — RiskMetrics exponentially-weighted volatility:
    * σ²ₜ = (1−λ)·Σ λⁱ·r²ₜ₋ᵢ normalized over a `span`-bounded frame with
    * λ = 0.94 (the RiskMetrics daily decay), i.e. the [[ewma]] Horner
    * machinery applied to SQUARED u6 returns — the vol forecast desks
    * actually mark overnight risk with, where [[rollingVol]]'s
    * equal-weight window reacts a day late. The fold input r² is the
    * product of two micro-grid doubles (deterministic IEEE both
    * engines); normalization divides the weighted sum by the weight
    * total so the (1−λ) factor cancels. One asset_id shuffle.
    */
  /** B205 `zweig_breadth` — the Zweig Breadth Thrust gauge: per-date
    * advance ratio adv/(adv+dec) (from the same daily-return counts as
    * [[advanceDecline]]), its `span`-EW smoothing, and the THRUST flag
    * — smoothed breadth ≥ 0.615 with a sub-0.40 reading inside the
    * prior `span` sessions (the classic oversold→overwhelming-demand
    * transition). The market rollup is #dates rows, so the unkeyed
    * date windows are trivially single-partition; counts are integers,
    * the EW rides the [[ewma]] Horner folds over ROUNDED ratios, and
    * the flag compares ROUNDED values (engine-stable booleans).
    */
  def zweigBreadth(panel: DataFrame, span: Int = 10): DataFrame = {
    val wEma = 1.0 - 2.0 / (span + 1.0)
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val byDate = Window.orderBy(col("date"))
    val emaFrame = byDate.rowsBetween(-(span * 4 - 1), Window.currentRow)
    val priorFrame = byDate.rowsBetween(-span, -1)
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("date"))
      .agg(
        sum(when(col("ret") > 0, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("ret") < 0, 1L).otherwise(0L)).as("n_down"))
      .filter(col("n_up") + col("n_down") > 0)
      .withColumn("ratio", u6(col("n_up").cast("double") /
        (col("n_up") + col("n_down")).cast("double")))
      .withColumn("arr", collect_list(col("ratio")).over(emaFrame))
      .withColumn("ema", u6(
        Kernels.seqFold(col("arr"), "horner", wEma) /
          Kernels.seqFold(col("arr"), "horner_count", wEma)))
      .withColumn("thrust", coalesce(
        col("ema") >= lit(0.615) && min(col("ema")).over(priorFrame) < lit(0.40),
        lit(false)))
      .select(col("date"), col("n_up"), col("n_down"), col("ratio"),
        col("ema"), col("thrust"))
      .orderBy(col("date"))
  }

  /** B206 `upside_potential` — the Upside Potential Ratio per asset:
    * first-order upside partial moment E[max(r,0)] over the
    * second-order downside deviation √E[min(r,0)²] (Sortino's
    * numerator replaced by what the strategy could EARN, not just its
    * mean — rewards asymmetry that [[sharpe]] and [[sortino]] both
    * blur). Both partial moments are left-to-right folds over the
    * date-ordered return array with the clamp applied inside the
    * transform (`greatest`/`least` — identical per-element IEEE ops
    * in both engines); all-nonnegative histories NULL the ratio.
    */
  def upsidePotential(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 4)
      .withColumn("up1", Kernels.seqFold(
        transform(col("ra"), x => greatest(x, lit(0.0))), "sum"))
      .withColumn("dn2", Kernels.seqFold(
        transform(col("ra"), x => least(x, lit(0.0))), "sumsq"))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        u6(col("up1") / n).as("upside_mean"),
        u6(sqrt(col("dn2") / n)).as("downside_dev"),
        u6((col("up1") / n) /
          when(col("dn2") === 0, lit(null)).otherwise(sqrt(col("dn2") / n))).as("upr"))
      .orderBy(col("asset_id"))
  }

  def ewmaVol(panel: DataFrame, span: Int = 60, lambda: Double = 0.94): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("sq", transform(collect_list(col("ret")).over(frame), v => v * v))
      .withColumn("ewma_vol", u6(sqrt(
        Kernels.seqFold(col("sq"), "horner", lambda) /
          Kernels.seqFold(col("sq"), "horner_count", lambda))))
      .select(col("asset_id"), col("date"), col("ret"), col("ewma_vol"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** The linearly-weighted mean of a date-ordered frame array: weight
    * i+1 on the i-th (oldest-first) element, normalized by the exact
    * integer triangle number n(n+1)/2. The index-weighted transform +
    * left-to-right fold is [[rollingOlsTrend]]'s Σt·y machinery reused
    * verbatim, so the IEEE op order matches the oracle's
    * `range`-indexed list_transform exactly.
    */
  private def wmaOfArr(arr: Column): Column = {
    val n = size(arr).cast("double")
    Kernels.seqFold(
      transform(arr, (v, i) => v * (i + 1).cast("double")), "sum") /
      (n * (n + 1) / lit(2.0))
  }

  /** B207 `wma` — linearly-weighted moving average of the LWW daily
    * close over a `window`-day frame: the youngest in-frame value
    * carries weight n, the oldest weight 1 (the chartist WMA, the lag-
    * halved sibling of [[windowMovingAvg]]'s equal weights and the
    * building block [[hma]] composes). Partial leading frames use
    * their own length (documented convention shared with [[ewma]]).
    * One asset_id shuffle; the frame fold is O(window) per row.
    */
  def wma(panel: DataFrame, window: Int = 20): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("arr", collect_list(col("value")).over(frame))
      .select(col("asset_id"), col("date"), col("value"),
        size(col("arr")).cast("long").as("n_days"),
        u6(wmaOfArr(col("arr"))).as("wma"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B208 `vwma` — volume-weighted moving average over a `window`-day
    * bar frame: Σ(close·volume)/Σvolume with tick count as the volume
    * proxy ([[obv]]'s convention). The numerator folds left-to-right
    * over per-bar close·n_ticks products (each an exact IEEE multiply
    * of a micro-grid double by a small integer); the denominator is a
    * plain integer window sum — order-free. Heavier-traded bars pull
    * the mean toward where volume actually printed, the difference vs
    * [[windowMovingAvg]] that volume-confirmation overlays trade on.
    */
  def vwma(panel: DataFrame, window: Int = 20): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("cv", col("close") * col("n_ticks").cast("double"))
      .withColumn("s_cv", Kernels.seqFold(collect_list(col("cv")).over(frame), "sum"))
      .withColumn("s_v", sum(col("n_ticks")).over(frame))
      .select(col("asset_id"), col("date"), col("close"), col("s_v").as("vol_n"),
        u6(col("s_cv") / col("s_v").cast("double")).as("vwma"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B209 `hma` — Hull moving average: WMA(2·WMA(n/2) − WMA(n), √n),
    * the lag-cancelling composition of three [[wma]] stages (the
    * half-length WMA overshoots by roughly the full-length WMA's lag;
    * doubling it and subtracting cancels the lag, and the short √n
    * WMA smooths the residual noise). Each stage's output is
    * u6-ROUNDED before feeding the next, so the three-deep chain stays
    * bit-identical cross-engine (the [[tsi]] chained-smoothing
    * discipline). All three frames share one asset_id partitioning —
    * a single shuffle for the whole chain.
    */
  def hma(panel: DataFrame, window: Int = 16): DataFrame = {
    val half = math.max(1, window / 2)
    val smooth = math.max(1, math.sqrt(window.toDouble).toInt)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val fFull = byAsset.rowsBetween(-(window - 1), Window.currentRow)
    val fHalf = byAsset.rowsBetween(-(half - 1), Window.currentRow)
    val fSm = byAsset.rowsBetween(-(smooth - 1), Window.currentRow)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("wf", u6(wmaOfArr(collect_list(col("value")).over(fFull))))
      .withColumn("wh", u6(wmaOfArr(collect_list(col("value")).over(fHalf))))
      .withColumn("raw", u6(lit(2.0) * col("wh") - col("wf")))
      .withColumn("hma", u6(wmaOfArr(collect_list(col("raw")).over(fSm))))
      .select(col("asset_id"), col("date"), col("value"), col("raw"), col("hma"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B210 `demarker` — the DeMarker oscillator over a `span`-bar
    * frame: DeMMax = max(high − prev_high, 0), DeMMin =
    * max(prev_low − low, 0), DeM = ΣDeMMax / (ΣDeMMax + ΣDeMMin) —
    * exhaustion gauge in [0,1] scoring how much of recent range
    * extension pointed up ([[rsi]]'s shape on range extremes instead
    * of closes). Per-bar legs are u6-rounded before the frame folds;
    * a frame with zero extension either way NULLs out. The first bar
    * per asset (no previous bar) is filtered like every lag-based op.
    */
  def demarker(panel: DataFrame, span: Int = 14): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("ph", lag(col("high"), 1).over(byAsset))
      .withColumn("pl", lag(col("low"), 1).over(byAsset))
      .filter(col("ph").isNotNull)
      .withColumn("dmax", u6(greatest(col("high") - col("ph"), lit(0.0))))
      .withColumn("dmin", u6(greatest(col("pl") - col("low"), lit(0.0))))
      .withColumn("smax", Kernels.seqFold(collect_list(col("dmax")).over(frame), "sum"))
      .withColumn("smin", Kernels.seqFold(collect_list(col("dmin")).over(frame), "sum"))
      .select(col("asset_id"), col("date"), col("dmax"), col("dmin"),
        u6(col("smax") / when(col("smax") + col("smin") === 0, lit(null))
          .otherwise(col("smax") + col("smin"))).as("dem"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B211 `cfo` — Chande Forecast Oscillator: 100·(close − fitted)/
    * close where `fitted` is the rolling-OLS forecast at the frame's
    * last point — [[rollingOlsTrend]]'s integral-x algebra verbatim
    * (exact closed-form Σt/Σt², value-sum folds), re-expressed as the
    * oscillator chartists overlay (positive = price above its own
    * trendline). NULLs on a zero close; frames shorter than `minN`
    * are filtered like the OLS row.
    */
  def cfo(panel: DataFrame, window: Int = 14, minN: Int = 5): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val n = col("n")
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("n", size(col("arr")).cast("double"))
      .filter(n >= minN)
      .withColumn("sx", n * (n + 1) / lit(2.0))
      .withColumn("sx2", n * (n + 1) * (lit(2.0) * n + 1) / lit(6.0))
      .withColumn("sy", Kernels.seqFold(col("arr"), "sum"))
      .withColumn("sxy", Kernels.seqFold(transform(col("arr"),
        (v, i) => v * (i + 1).cast("double")), "sum"))
      .withColumn("b", (n * col("sxy") - col("sx") * col("sy")) /
        (n * col("sx2") - col("sx") * col("sx")))
      .withColumn("fitted", u6((col("sy") - col("b") * col("sx")) / n + col("b") * n))
      .select(col("asset_id"), col("date"), col("value"),
        n.cast("long").as("n_days"), col("fitted"),
        u6(lit(100.0) * (col("value") - col("fitted")) /
          when(col("value") === 0, lit(null)).otherwise(col("value"))).as("cfo"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B212 `smi` — Stochastic Momentum Index (10/3/3): the close's
    * signed distance from the MIDPOINT of the q-bar high/low channel,
    * double-EW-smoothed, over the equally-smoothed half-range —
    * [[stochasticOsc]] recentred on the channel middle so the reading
    * is signed and less jumpy. Both smoothing chains ride the [[tsi]]
    * discipline: each EW stage is a normalized Horner fold over a
    * bounded frame with the stage output u6-ROUNDED before the next
    * consumes it. A flat smoothed channel NULLs the index.
    */
  def smi(panel: DataFrame, span: Int = 10, s1: Int = 3, s2: Int = 3): DataFrame = {
    val w1 = 1.0 - 2.0 / (s1 + 1.0)
    val w2 = 1.0 - 2.0 / (s2 + 1.0)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val qframe = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    val f1 = byAsset.rowsBetween(-(s1 * 4 - 1), Window.currentRow)
    val f2 = byAsset.rowsBetween(-(s2 * 4 - 1), Window.currentRow)
    def ew(c: Column, frame: org.apache.spark.sql.expressions.WindowSpec, w: Double): Column = {
      val arr = collect_list(c).over(frame)
      u6(Kernels.seqFold(arr, "horner", w) / Kernels.seqFold(arr, "horner_count", w))
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("hh", max(col("high")).over(qframe))
      .withColumn("ll", min(col("low")).over(qframe))
      .withColumn("m", u6(col("close") - (col("hh") + col("ll")) / 2))
      .withColumn("hr", u6((col("hh") - col("ll")) / 2))
      .withColumn("m1", ew(col("m"), f1, w1))
      .withColumn("h1", ew(col("hr"), f1, w1))
      .withColumn("m2", ew(col("m1"), f2, w2))
      .withColumn("h2", ew(col("h1"), f2, w2))
      .withColumn("smi", u6(lit(100.0) * col("m2") /
        when(col("h2") === 0, lit(null)).otherwise(col("h2"))))
      .select(col("asset_id"), col("date"), col("m"), col("smi"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B213 `pgo` — the Pretty Good Oscillator: (close − SMA_n) over the
    * EW-smoothed true range — distance from the mean denominated in
    * typical daily movement, i.e. a z-score whose unit is ATR instead
    * of σ (breakout screeners threshold it at ±3). TR uses the
    * [[choppiness]] first-bar convention (plain range when no previous
    * close); the SMA is a frame fold over closes, the ATR leg the
    * normalized-Horner EW fold over ROUNDED TRs; a zero smoothed range
    * NULLs out.
    */
  def pgo(panel: DataFrame, span: Int = 14): DataFrame = {
    val w = 1.0 - 2.0 / (span + 1.0)
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    val prevClose = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tr", u6(
        when(prevClose.isNull, col("high") - col("low"))
          .otherwise(greatest(
            col("high") - col("low"),
            abs(col("high") - prevClose),
            abs(col("low") - prevClose)))))
      .withColumn("sma", u6(Kernels.seqFold(collect_list(col("close")).over(frame), "sum") /
        count(lit(1)).over(frame).cast("double")))
      .withColumn("tra", collect_list(col("tr")).over(frame))
      .withColumn("ematr", u6(Kernels.seqFold(col("tra"), "horner", w) /
        Kernels.seqFold(col("tra"), "horner_count", w)))
      .select(col("asset_id"), col("date"), col("close"), col("sma"), col("ematr"),
        u6((col("close") - col("sma")) /
          when(col("ematr") === 0, lit(null)).otherwise(col("ematr"))).as("pgo"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B219 `asi` — Wilder's Accumulative Swing Index: per-bar swing
    * index SI = 50·M/R where M = (C−Cₚ) + 0.5(C−O) + 0.25(Cₚ−Oₚ) and
    * R is Wilder's case-based true-range normalizer (largest of
    * |H−Cₚ|/|L−Cₚ|/H−L picks the branch, ties resolve in that order —
    * the SQL CASE mirrors the when-chain exactly); the K/T limit-move
    * factor is identity here (no limit moves on an equity panel, T≡K,
    * documented). Flat bars (R=0) contribute EXACTLY 0. The ASI line
    * is the running MICRO-LONG sum of u6 SIs (the [[vpt]]/
    * [[williamsAd]] integer-grid convention); first bar per asset
    * filtered.
    */
  def asi(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val run = byAsset.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("op", lag(col("open"), 1).over(byAsset))
      .withColumn("cp", lag(col("close"), 1).over(byAsset))
      .filter(col("cp").isNotNull)
      .withColumn("r1", abs(col("high") - col("cp")))
      .withColumn("r2", abs(col("low") - col("cp")))
      .withColumn("r3", col("high") - col("low"))
      .withColumn("r4", abs(col("cp") - col("op")))
      .withColumn("r",
        when(col("r1") >= col("r2") && col("r1") >= col("r3"),
          col("r1") - lit(0.5) * col("r2") + lit(0.25) * col("r4"))
          .when(col("r2") >= col("r1") && col("r2") >= col("r3"),
            col("r2") - lit(0.5) * col("r1") + lit(0.25) * col("r4"))
          .otherwise(col("r3") + lit(0.25) * col("r4")))
      .withColumn("m",
        (col("close") - col("cp")) + lit(0.5) * (col("close") - col("open")) +
          lit(0.25) * (col("cp") - col("op")))
      .withColumn("si", when(col("r") === 0, lit(0.0))
        .otherwise(u6(lit(50.0) * col("m") / col("r"))))
      .withColumn("si_micro", round(col("si") * 1e6).cast("long"))
      .select(col("asset_id"), col("date"), col("si"),
        (sum(col("si_micro")).over(run).cast("double") / 1e6).as("asi"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B220 `fib_levels` — Fibonacci retracement levels off the
    * `window`-day [[donchian]] channel: hh − φᵢ·(hh − ll) for
    * φ ∈ {0.236, 0.382, 0.5, 0.618} — the support grid chartists
    * project from the recent swing. Channel extremes are order-free
    * window aggregates; each level is one u6 multiply-subtract; flat
    * channels collapse every level onto hh (no division anywhere).
    */
  def fibLevels(panel: DataFrame, window: Int = 20): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    daily
      .withColumn("hh", max(col("value")).over(frame))
      .withColumn("ll", min(col("value")).over(frame))
      .withColumn("rng", col("hh") - col("ll"))
      .select(col("asset_id"), col("date"), col("value"),
        col("hh").as("ch_high"), col("ll").as("ch_low"),
        u6(col("hh") - lit(0.236) * col("rng")).as("f236"),
        u6(col("hh") - lit(0.382) * col("rng")).as("f382"),
        u6(col("hh") - lit(0.5) * col("rng")).as("f500"),
        u6(col("hh") - lit(0.618) * col("rng")).as("f618"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B215 `jensen_alpha` — the CAPM decomposition per asset vs the
    * equal-weight market: OLS beta ([[beta]]'s fold algebra), Jensen's
    * alpha α = r̄ₐ − β·r̄ₘ (daily, no risk-free leg — the synthetic
    * panel has none), the residual volatility √(SSE/(n−2)), and the
    * appraisal ratio α/σ_resid (Treynor–Black: is the alpha worth the
    * idiosyncratic risk it rides on?). A flat-market window NULLs beta
    * and everything downstream EXPLICITLY (greatest() ignores NULLs in
    * both engines, so the clamp alone must not be the null path). One
    * asset_id shuffle + a broadcast of the #dates market.
    */
  def jensenAlpha(panel: DataFrame): DataFrame = {
    val rets = dailyReturnsCore(panel)
    val n = col("n")
    rets.join(broadcast(marketReturns(rets)), Seq("date"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("mkt_ret")))).as("h"))
      .withColumn("ra", transform(col("h"), s => s("ret")))
      .withColumn("rm", transform(col("h"), s => s("mkt_ret")))
      .withColumn("rp", transform(col("h"), s => s("ret") * s("mkt_ret")))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 3)
      .withColumn("sa", foldSum(col("ra")))
      .withColumn("sm", foldSum(col("rm")))
      .withColumn("sp", foldSum(col("rp")))
      .withColumn("sm2", foldSumSq(col("rm")))
      .withColumn("sa2", foldSumSq(col("ra")))
      .withColumn("sxx", n * col("sm2") - col("sm") * col("sm"))
      .withColumn("sxy", n * col("sp") - col("sm") * col("sa"))
      .withColumn("syy", n * col("sa2") - col("sa") * col("sa"))
      .withColumn("b", col("sxy") / when(col("sxx") <= 0, lit(null)).otherwise(col("sxx")))
      .withColumn("a", col("sa") / n - col("b") * (col("sm") / n))
      .withColumn("resid_sd", when(col("b").isNull, lit(null)).otherwise(
        sqrt(greatest((col("syy") - col("b") * col("sxy")) / n / (n - 2), lit(0.0)))))
      .select(col("asset_id"), n.cast("long").as("n_days"),
        u6(col("b")).as("beta"), u6(col("a")).as("alpha"),
        u6(col("resid_sd")).as("resid_sd"),
        u6(col("a") / when(col("resid_sd") === 0, lit(null))
          .otherwise(col("resid_sd"))).as("appraisal"))
      .orderBy(col("asset_id"))
  }

  /** B216 `burke_ratio` — mean daily return over the root of the sum
    * of SQUARED drawdown-episode depths: [[sharpe]]'s numerator with
    * a path-risk denominator that punishes many deep drawdowns where
    * [[calmar]] sees only the single worst. Episodes are the
    * [[drawdownEpisodes]] gaps-and-islands; depths fold in
    * start-date order (deterministic, episodes are few). Zero-episode
    * histories NULL the ratio (n_episodes reported 0, not absent).
    */
  def burkeRatio(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val runW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("value"), 1).over(w)
    val dd = daily
      .withColumn("peak", max(col("value")).over(runW))
      .withColumn("dd", u6(col("value") /
        when(col("peak") === 0, lit(null)).otherwise(col("peak")) - 1))
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .withColumn("rn", row_number().over(w))
    val eps = dd.filter(col("dd") < 0)
      .withColumn("grp", col("rn") - row_number().over(w))
      .groupBy(col("asset_id"), col("grp"))
      .agg(min(col("date")).as("start_date"), min(col("dd")).as("depth"))
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("start_date"), col("depth")))),
        s => s("depth")).as("da"))
      .select(col("asset_id"), size(col("da")).cast("long").as("n_episodes"),
        Kernels.seqFold(col("da"), "sumsq").as("ssq"))
    dd.filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .select(col("asset_id"), size(col("ra")).cast("long").as("n_days"),
        (Kernels.seqFold(col("ra"), "sum") / size(col("ra")).cast("double")).as("mean_ret"))
      .join(eps, Seq("asset_id"), "left")
      .withColumn("n_episodes", coalesce(col("n_episodes"), lit(0L)))
      .withColumn("burke", u6(col("mean_ret") /
        when(col("ssq").isNull || col("ssq") <= 0, lit(null)).otherwise(sqrt(col("ssq")))))
      .select(col("asset_id"), col("n_days"), col("n_episodes"),
        u6(col("mean_ret")).as("mean_ret"), col("burke"))
      .orderBy(col("asset_id"))
  }

  /** B217 `kappa_three` — Kaplan–Knowles κ₃: mean return over the cube
    * root of the third lower partial moment E[max(−r,0)³] — [[sortino]]
    * generalized one moment up, so rare deep losses dominate the
    * denominator the way tail-averse allocators actually feel them.
    * The LPM folds max(−r,0) cubes left-to-right over the date-ordered
    * array (clamp inside the transform, the [[upsidePotential]]
    * discipline); loss-free histories NULL the ratio. cbrt is the one
    * non-sqrt root in the surface — both engines' cbrt is sub-ulp on
    * the micro-grid magnitudes here, inside the same tolerance class
    * as the shared ln/exp surfaces.
    */
  def kappaThree(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val prev = lag(col("value"), 1).over(w)
    val n = col("n")
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 4)
      .withColumn("s", foldSum(col("ra")))
      .withColumn("lpm3", Kernels.seqFold(
        transform(col("ra"), x => greatest(-x, lit(0.0))), "sum3") / n)
      .select(col("asset_id"), n.cast("long").as("n_days"),
        u6(col("s") / n).as("mean_ret"), u6(col("lpm3")).as("lpm3"),
        u6((col("s") / n) / when(col("lpm3") <= 0, lit(null))
          .otherwise(cbrt(col("lpm3")))).as("kappa3"))
      .orderBy(col("asset_id"))
  }

  /** B218 `recovery_time` — the drawdown-episode table with the
    * RECOVERY geometry [[drawdownEpisodes]] leaves implicit: trough
    * date (deepest dd, earliest on ties — a struct-min, ≡ the oracle's
    * min-date-at-min-dd), days peak→trough, and whether the episode
    * RECOVERED (ended before the series did) — the number that
    * separates "painful but healed" from "still underwater", which
    * max-drawdown alone can't. Same single-shuffle islands as the
    * episode table + a broadcast of per-asset last dates.
    */
  def recoveryTime(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val runW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = daily
      .withColumn("peak", max(col("value")).over(runW))
      .withColumn("dd", u6(col("value") /
        when(col("peak") === 0, lit(null)).otherwise(col("peak")) - 1))
      .withColumn("rn", row_number().over(w))
    val lastD = dd.groupBy(col("asset_id")).agg(max(col("date")).as("last_date"))
    dd.filter(col("dd") < 0)
      .withColumn("grp", col("rn") - row_number().over(w))
      .groupBy(col("asset_id"), col("grp"))
      .agg(min(col("date")).as("start_date"), max(col("date")).as("end_date"),
        count(lit(1)).as("n_days"),
        min(struct(col("dd"), col("date"))).as("trough"))
      .join(broadcast(lastD), Seq("asset_id"))
      .select(col("asset_id"), col("start_date"),
        col("trough").getField("date").as("trough_date"),
        col("end_date"), col("n_days"),
        col("trough").getField("dd").as("max_drawdown"),
        (datediff(col("trough").getField("date"), col("start_date")) + 1)
          .cast("long").as("days_to_trough"),
        (col("end_date") < col("last_date")).as("recovered"))
      .orderBy(col("asset_id"), col("start_date"))
  }

  /** B214 `williams_ad` — Williams Accumulation/Distribution: per-bar
    * contribution (close − true-range low) on up closes,
    * (close − true-range high) on down closes, zero on unchanged —
    * running-summed per asset. Like [[vpt]], the running sum rides the
    * MICRO-LONG grid: each u6 contribution is scaled to an exact
    * integer and the unbounded window sum is integer arithmetic —
    * order-insensitive, exact under any partitioning — floated back
    * only at the end. First bar per asset filtered (no previous
    * close). The divergence-vs-price accumulation gauge of the
    * [[obv]]/[[adLine]] family, keyed on true-range extremes.
    */
  def williamsAd(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val run = byAsset.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("pc", lag(col("close"), 1).over(byAsset))
      .filter(col("pc").isNotNull)
      .withColumn("contrib", u6(
        when(col("close") > col("pc"), col("close") - least(col("low"), col("pc")))
          .when(col("close") < col("pc"), col("close") - greatest(col("high"), col("pc")))
          .otherwise(lit(0.0))))
      .withColumn("contrib_micro", round(col("contrib") * 1e6).cast("long"))
      .withColumn("wad_micro", sum(col("contrib_micro")).over(run))
      .select(col("asset_id"), col("date"), col("contrib"),
        (col("wad_micro").cast("double") / 1e6).as("wad"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B221 `trima` — triangular moving average: SMA of an SMA, so the
    * effective kernel is a centered triangle (mid-frame bars weigh
    * most — the symmetric cousin of [[wma]]'s front-loaded ramp).
    * Stage windows follow the chartist convention p = ⌊n/2⌋+1 then
    * q = ⌈n/2⌉; the first stage's mean is u6-ROUNDED before the second
    * averages it (the [[hma]] chained-stage discipline), partial
    * leading frames use their own length. Both frames ride ONE
    * asset_id partitioning — a single shuffle for the chain.
    */
  def trima(panel: DataFrame, window: Int = 20): DataFrame = {
    val p = window / 2 + 1
    val q = (window + 1) / 2
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val f1 = byAsset.rowsBetween(-(p - 1), Window.currentRow)
    val f2 = byAsset.rowsBetween(-(q - 1), Window.currentRow)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("a1", collect_list(col("value")).over(f1))
      .withColumn("sma1", u6(foldSum(col("a1")) / size(col("a1")).cast("double")))
      .withColumn("a2", collect_list(col("sma1")).over(f2))
      .withColumn("trima", u6(foldSum(col("a2")) / size(col("a2")).cast("double")))
      .select(col("asset_id"), col("date"), col("value"), col("sma1"), col("trima"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B222 `zlema` — zero-lag EMA (Ehlers/Way): the EMA's ~(n−1)/2-bar
    * lag is pre-subtracted by feeding the fold the de-lagged series
    * 2·close − close[k], k = (n−1)/2 — momentum added where the plain
    * [[ewma]] trails. Series head (no k-bar-old value yet) falls back
    * to the raw close (documented convention, keeps full row count);
    * the weighted mean is the same horner pair as [[ewma]] with the
    * u6-rounded decay 0.904762 (= 1 − 2/(n+1), n = 20) so both engines
    * fold the identical doubles. One shuffle; O(span) fold per row.
    */
  def zlema(panel: DataFrame, span: Int = 20): DataFrame = {
    val w = 0.904762 // u6(1 − 2/21), embedded in the oracle verbatim
    val k = (span - 1) / 2
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("dl", u6(lit(2.0) * col("value") -
        coalesce(lag(col("value"), k).over(byAsset), col("value"))))
      .withColumn("arr", collect_list(col("dl")).over(frame))
      .withColumn("zlema", u6(
        Kernels.seqFold(col("arr"), "horner", w) /
          Kernels.seqFold(col("arr"), "horner_count", w)))
      .select(col("asset_id"), col("date"), col("value"), col("dl"), col("zlema"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B223 `vidya` — Chande's Variable Index Dynamic Average: an EMA
    * whose per-bar smoothing constant is α·|CMO₉|/100 — volatility in
    * DIRECTION (|CMO| near 1 when moves are one-sided) speeds the
    * line, churn freezes it. The state recurrence v += sc·(close − v)
    * is EXACTLY [[kama]]'s form with sc precomputed from the
    * [[chandeMomentum]] machinery (horner_pos/neg folds over the diff
    * frame), so it reuses the compiled `kama` [[graft.expressions
    * .RecurrenceFold]] scan — O(h) per asset, no new recursion kind.
    * First diff row seeds v = close; an all-flat frame (su+sd = 0)
    * takes sc = 0 — the line holds still, not a division error.
    */
  def vidya(panel: DataFrame, n: Int = 9, alpha: Double = 0.2): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(n - 1), Window.currentRow)
    val prev = lag(col("value"), 1).over(byAsset)
    val withSc = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("d", col("value") - prev)
      .filter(col("d").isNotNull)
      .withColumn("arr", collect_list(col("d")).over(frame))
      .withColumn("su", Kernels.seqFold(col("arr"), "horner_pos", 1.0))
      .withColumn("sd", Kernels.seqFold(col("arr"), "horner_neg", 1.0))
      .withColumn("cmo", when(col("su") + col("sd") === 0, lit(0.0))
        .otherwise(u6(lit(100.0) * (col("su") - col("sd")) / (col("su") + col("sd")))))
      .withColumn("sc", u6(lit(alpha) * abs(col("cmo")) / lit(100.0)))
    withSc
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(
        col("date"), col("value"), col("cmo"), col("sc")))).as("bs"))
      .withColumn("va", Kernels.recurrence(col("bs"), "kama"))
      .select(col("asset_id"), explode(col("va")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"), col("h.close").as("value"),
        col("h.er").as("cmo"), col("h.kama").as("vidya"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B224 `mcginley` — the McGinley Dynamic: MD += (p − MD)/(k·n·
    * (p/MD)⁴), the self-adjusting moving average whose chase speed
    * depends on how far price sits from the LINE ITSELF (quartic in
    * the ratio: accelerates hard below runaway price, barely moves in
    * churn). The state-dependent divisor puts it outside [[kama]]'s
    * precomputed-sc form — it runs its own `mcginley` [[graft
    * .expressions.RecurrenceFold]] kind (O(h) compiled scan, r⁴ by
    * explicit multiplies — no libm pow — u6 per step, seeded MD₁ =
    * close). k·n rides each row as the exact double k·n = 6.0 so the
    * DuckDB recursive CTE multiplies the identical constant. PRICE
    * domain: a non-positive close (or state) null-poisons the rest of
    * the series — the quartic divisor diverges off it — and both
    * engines agree on the exact poison row.
    */
  def mcginley(panel: DataFrame, n: Int = 10, k: Double = 0.6): DataFrame = {
    val kn = k * n
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(
        col("date"), col("value"), lit(kn).as("kn")))).as("bs"))
      .withColumn("ms", Kernels.recurrence(col("bs"), "mcginley"))
      .select(col("asset_id"), explode(col("ms")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"),
        col("h.close").as("value"), col("h.md").as("mcginley"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B225 `candle_patterns` — classic single/two-bar candlestick
    * detection over the daily bars, aggregated to a per-asset pattern
    * census: doji (body ≤ 10% of range), hammer (lower shadow ≥ 2×
    * body, upper ≤ body), shooting star (the mirror), and bullish/
    * bearish engulfing (body wraps the previous bar's opposite-sign
    * body). Every flag is a COMPARISON of exact IEEE products of the
    * same bar doubles — no rounding anywhere, so cross-engine equality
    * is structural. Zero-range bars can still doji (0 ≤ 0); first bar
    * per asset can't engulf. One shuffle: the lag window and the
    * per-asset census share the asset_id partitioning.
    */
  def candlePatterns(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val body = col("close") - col("open")
    val absBody = abs(body)
    val upper = col("high") - greatest(col("open"), col("close"))
    val lower = least(col("open"), col("close")) - col("low")
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("p_open", lag(col("open"), 1).over(byAsset))
      .withColumn("p_close", lag(col("close"), 1).over(byAsset))
      .withColumn("doji", absBody <= lit(0.1) * (col("high") - col("low")))
      .withColumn("hammer", lower >= lit(2.0) * absBody && upper <= absBody)
      .withColumn("shoot", upper >= lit(2.0) * absBody && lower <= absBody)
      .withColumn("bull_engulf",
        body > 0 && col("p_close") < col("p_open") &&
          col("open") <= col("p_close") && col("close") >= col("p_open"))
      .withColumn("bear_engulf",
        body < 0 && col("p_close") > col("p_open") &&
          col("open") >= col("p_close") && col("close") <= col("p_open"))
      .groupBy(col("asset_id"))
      .agg(
        count(lit(1)).as("n_bars"),
        sum(when(col("doji"), 1L).otherwise(0L)).as("n_doji"),
        sum(when(col("hammer"), 1L).otherwise(0L)).as("n_hammer"),
        sum(when(col("shoot"), 1L).otherwise(0L)).as("n_shooting_star"),
        sum(when(col("bull_engulf"), 1L).otherwise(0L)).as("n_bull_engulf"),
        sum(when(col("bear_engulf"), 1L).otherwise(0L)).as("n_bear_engulf"))
      .orderBy(col("asset_id"))
  }

  /** B226 `fractals` — Bill Williams fractals with wing 2: a bar is a
    * fractal HIGH when its high strictly exceeds the highs of the two
    * bars either side (fractal LOW mirrored on lows) — the swing-point
    * primitive breakout and S/R systems consume. Pure lead/lag
    * comparisons on the bar doubles (no arithmetic at all), edges
    * (missing wings) are definitionally false. Confirmation is two
    * bars LATE by construction — the streaming face must buffer two
    * future bars, which is exactly what [[graft.streaming.StreamingOps
    * .fractalsStream]] does.
    */
  def fractals(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    def stricter(c: String, cmp: (Column, Column) => Column): Column = {
      val x = col(c)
      Seq(-2, -1, 1, 2).map { o =>
        val nb = if (o < 0) lag(col(c), -o).over(byAsset) else lead(col(c), o).over(byAsset)
        nb.isNotNull && cmp(x, nb)
      }.reduce(_ && _)
    }
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("fractal_high", stricter("high", _ > _))
      .withColumn("fractal_low", stricter("low", _ < _))
      .select(col("asset_id"), col("date"), col("high"), col("low"),
        col("fractal_high"), col("fractal_low"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B227 `td_setup` — TD Sequential setup counts: the running length
    * of the current streak of closes below (buy setup) or above (sell
    * setup) the close four bars earlier, with the classic 9-bar
    * completion flagged. Integer gaps-and-islands — streak = rn minus
    * the last non-qualifying rn (running max of a masked rn), zero
    * when the bar itself doesn't qualify — so the whole op is exact
    * integer arithmetic over one asset_id shuffle. Bars 1-4 (no
    * 4-bar-old close) count in neither direction, matching the
    * chartist convention that setups start after the lookback exists.
    */
  def tdSetup(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val run = byAsset.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c4 = lag(col("value"), 4).over(byAsset)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("rn", row_number().over(byAsset))
      .withColumn("dn", c4.isNotNull && col("value") < c4)
      .withColumn("up", c4.isNotNull && col("value") > c4)
      .withColumn("buy_count", when(col("dn"),
        col("rn") - coalesce(max(when(!col("dn"), col("rn"))).over(run), lit(0L)))
        .otherwise(lit(0L)).cast("long"))
      .withColumn("sell_count", when(col("up"),
        col("rn") - coalesce(max(when(!col("up"), col("rn"))).over(run), lit(0L)))
        .otherwise(lit(0L)).cast("long"))
      .select(col("asset_id"), col("date"), col("value"),
        col("buy_count"), col("sell_count"),
        (col("buy_count") === 9).as("buy_setup"),
        (col("sell_count") === 9).as("sell_setup"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B228 `alma` — Arnaud Legoux moving average: a Gaussian-kernel
    * weighted mean whose peak sits `offset` of the way to the NEWEST
    * bar (0.85 → smooth like an EMA but with far less lag) and whose
    * width is len/σ. Weights depend only on (frame length, position) —
    * wᵢ = exp(−(i−m)²/2s²), m = offset·(len−1), s = len/σ — and each
    * is u6-ROUNDED before use, so the single libm call (exp, which JVM
    * and C agree on to ≪1e-7 relative) can never shift a weight across
    * the micro grid; numerator and denominator are then the standard
    * left-assoc folds. Partial leading frames rescale m and s to their
    * own length (documented convention shared with [[ewma]]'s head).
    */
  def alma(panel: DataFrame, window: Int = 9, offset: Double = 0.85,
           sigma: Double = 6.0): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    def weights(arr: Column): Column = {
      val len = size(arr).cast("double")
      val m = lit(offset) * (len - 1)
      val s = len / lit(sigma)
      transform(arr, (_, i) =>
        u6(exp((i.cast("double") - m) * (i.cast("double") - m) /
          (lit(-2.0) * s * s))))
    }
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("ws", weights(col("arr")))
      .withColumn("num", Kernels.seqFold(
        zip_with(col("arr"), col("ws"), (v, w) => v * w), "sum"))
      .withColumn("den", Kernels.seqFold(col("ws"), "sum"))
      .withColumn("alma", u6(col("num") / col("den")))
      .select(col("asset_id"), col("date"), col("value"), col("alma"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B229 `ravi` — Range Action Verification Index: 100·|SMA_fast −
    * SMA_slow|/SMA_slow, the percentage spread between a week and a
    * quarter of smoothing — Chande's trend/chop gate (RAVI above ~0.3%
    * = trending, below = ranging; the [[vhf]] question answered with
    * two means instead of a range ratio). Both SMAs are u6'd fold
    * means over ONE asset_id shuffle; a zero slow mean NULLs out.
    */
  def ravi(panel: DataFrame, fast: Int = 7, slow: Int = 65): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val fF = byAsset.rowsBetween(-(fast - 1), Window.currentRow)
    val fS = byAsset.rowsBetween(-(slow - 1), Window.currentRow)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("af", collect_list(col("value")).over(fF))
      .withColumn("as_", collect_list(col("value")).over(fS))
      .withColumn("sf", u6(foldSum(col("af")) / size(col("af")).cast("double")))
      .withColumn("ss", u6(foldSum(col("as_")) / size(col("as_")).cast("double")))
      .withColumn("ravi", u6(lit(100.0) * abs(col("sf") - col("ss")) /
        when(col("ss") === 0, lit(null)).otherwise(col("ss"))))
      .select(col("asset_id"), col("date"), col("sf"), col("ss"), col("ravi"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B230 `vzo` — Volume Zone Oscillator: 100·EW(signed volume)/
    * EW(volume) over a `span`-bar frame, sign = the close-to-close
    * direction (tick count as the volume proxy, the [[obv]]
    * convention; unchanged closes contribute zero). The EW
    * normalization cancels in the ratio, so both legs are the
    * UNnormalized horner folds ([[rsi]]'s trick) over exact small
    * integers — deterministic everywhere. Total frame volume is ≥ 1
    * whenever a bar exists, so the ratio never divides by zero. First
    * bar per asset (no direction) is dropped.
    */
  def vzo(panel: DataFrame, span: Int = 14): DataFrame = {
    val w = (span - 1).toDouble / span
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    val pc = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("pc", pc)
      .filter(col("pc").isNotNull)
      .withColumn("sv",
        when(col("close") > col("pc"), col("n_ticks").cast("double"))
          .when(col("close") < col("pc"), -col("n_ticks").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("num", Kernels.seqFold(collect_list(col("sv")).over(frame), "horner", w))
      .withColumn("den", Kernels.seqFold(
        collect_list(col("n_ticks").cast("double")).over(frame), "horner", w))
      .select(col("asset_id"), col("date"), col("sv").cast("long").as("signed_vol"),
        u6(lit(100.0) * col("num") / col("den")).as("vzo"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B231 `dollar_bars` — notional-clock sampling: bars close when
    * cumulative traded notional (|value| per tick, price as the
    * single-unit notional proxy) crosses `threshold` — the
    * dollar-volume sibling of [[tickBars]]' event clock (information
    * arrival tracks value traded, not tick count; López de Prado's
    * standard bars family). The running notional rides the EXACT
    * micro-long grid (round(value·1e6) summed as integers — no float
    * drift under any partitioning), bar id = integer division of the
    * PRE-tick cumulative, so a tick that crosses the line closes the
    * OLD bar (notional bars overshoot by at most one tick, the
    * standard convention). Same min/max-struct OHLC as tick bars.
    */
  def dollarBars(panel: DataFrame, threshold: Double = 500.0): DataFrame = {
    val thrMicro = math.round(threshold * 1e6)
    val w = Window.partitionBy(col("asset_id")).orderBy(col("ts"), col("seq"))
    val run = w.rowsBetween(Window.unboundedPreceding, -1)
    panel.repartition(col("asset_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("m", floor(abs(col("value")) * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("cum_prev", coalesce(sum(col("m")).over(run), lit(0L)))
      .withColumn("bar_id", expr(s"cum_prev div ${thrMicro}L"))
      .groupBy(col("asset_id"), col("bar_id"))
      .agg(
        min(col("ts")).as("t_open"), max(col("ts")).as("t_close"),
        min(struct(col("rn"), col("value"))).as("o"),
        max(struct(col("rn"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        count(lit(1)).as("n_ticks"),
        sum(col("m")).as("notional_micro"))
      .select(col("asset_id"), col("bar_id"), col("t_open"), col("t_close"),
        col("o.value").as("open"), col("high"), col("low"),
        col("c.value").as("close"), col("n_ticks"),
        (col("notional_micro").cast("double") / 1e6).as("notional"))
      .orderBy(col("asset_id"), col("bar_id"))
  }

  /** B232 `durbin_watson` — the Durbin–Watson serial-correlation
    * statistic of each asset's full daily-return history:
    * Σ(rₜ−rₜ₋₁)²/Σrₜ² — near 2 when returns are white, toward 0 on
    * positive autocorrelation, toward 4 on negative (the regression-
    * residual test applied where [[autocorr]] reports the raw lag-1
    * coefficient). Both sums fold left-assoc over the date-sorted
    * per-asset array (the successive-difference array is built by
    * index arithmetic, identical 0-based in Spark / 1-based in
    * DuckDB); assets with fewer than 3 returns (or a zero
    * denominator) NULL out.
    */
  def durbinWatson(panel: DataFrame): DataFrame = {
    dailyReturnsCore(panel)
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret")))).as("bs"))
      .withColumn("arr", expr("transform(bs, s -> s.ret)"))
      .withColumn("n", size(col("arr")).cast("long"))
      .filter(col("n") >= 3)
      .withColumn("num", Kernels.seqFold(
        expr("transform(sequence(1, size(arr) - 1), i -> arr[i] - arr[i-1])"), "sumsq"))
      .withColumn("den", Kernels.seqFold(col("arr"), "sumsq"))
      .select(col("asset_id"), col("n").as("n_rets"),
        u6(col("num") / when(col("den") === 0, lit(null)).otherwise(col("den")))
          .as("dw"))
      .orderBy(col("asset_id"))
  }

  /** B233 `diversification_ratio` — Choueifaty's portfolio-level
    * diversification gauge for the equal-weight panel portfolio:
    * mean(σᵢ)/σ_p — how much asset-level volatility the portfolio
    * diversifies away (1 = none, higher = more independent bets).
    * Every sum is an EXACT decimal sum of u6-grid values ([[dsum]] —
    * returns scale 6, squares scale 12), so the whole statistic is
    * aggregation-order-free: per-asset σ from (n, Σr, Σr²), the
    * market leg from per-date equal-weight mean returns over the
    * assets PRESENT that date (the breadth-tape convention), σ_p by
    * the same algebra over dates. One reconciliation row out; two
    * keyed shuffles (asset, date) over one scan of the return tape.
    */
  def diversificationRatio(panel: DataFrame): DataFrame = {
    val rets = dailyReturnsCore(panel)
    def sd(n: Column, s: Column, s2: Column): Column =
      sqrt(greatest((n * s2 - s * s) / (n * (n - 1)), lit(0.0)))
    // Exact square sum of a u6-grid column WITHOUT casting a double
    // PRODUCT to decimal (engine-dependent midpoint rounding — see the
    // header note): recover the exact micro integer by the same
    // floor(+0.5) that minted the grid value, square and sum in
    // decimal (exact, order-free), rescale once at the end.
    def dsumSq(c: Column): Column = {
      val rm = floor(c * lit(1e6) + lit(0.5)).cast(DecimalType(19, 0))
      sum(rm * rm).cast("double") / lit(1e12)
    }
    val perAsset = rets.groupBy(col("asset_id"))
      .agg(count(lit(1)).cast("double").as("n"),
        dsum(col("ret"), 6).as("s"),
        dsumSq(col("ret")).as("s2"))
      .filter(col("n") >= 2)
      .withColumn("sigma", u6(sd(col("n"), col("s"), col("s2"))))
      .agg(count(lit(1)).as("n_assets"),
        dsum(col("sigma"), 6).as("sig_sum"))
      .withColumn("mean_vol", u6(col("sig_sum") / col("n_assets").cast("double")))
    val mkt = rets.groupBy(col("date"))
      .agg(u6(dsum(col("ret"), 6) / count(lit(1)).cast("double")).as("mret"))
    val port = mkt
      .agg(count(lit(1)).cast("double").as("nd"),
        dsum(col("mret"), 6).as("ms"),
        dsumSq(col("mret")).as("ms2"))
      .withColumn("port_vol", u6(sd(col("nd"), col("ms"), col("ms2"))))
    perAsset.crossJoin(port)
      .select(col("n_assets"), col("nd").cast("long").as("n_dates"),
        col("mean_vol"), col("port_vol"),
        u6(col("mean_vol") /
          when(col("port_vol") === 0, lit(null)).otherwise(col("port_vol")))
          .as("div_ratio"))
  }

  /** B234 `rmi` — Relative Momentum Index: [[rsi]]'s EW gain/loss
    * ratio computed on `m`-day momentum differences value − value[m]
    * instead of 1-day changes (Altman's generalization — smoother,
    * earlier at turning points; m = 1 recovers RSI exactly). Same
    * unnormalized horner pair, same AL=0 → 100 convention; the first
    * m rows per asset (no m-day-old value) drop.
    */
  def rmi(panel: DataFrame, m: Int = 5, span: Int = 14): DataFrame = {
    val w = (span - 1).toDouble / span
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(span - 1), Window.currentRow)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("d", u6(col("value") - lag(col("value"), m).over(byAsset)))
      .filter(col("d").isNotNull)
      .withColumn("arr", collect_list(col("d")).over(frame))
      .withColumn("g", Kernels.seqFold(col("arr"), "horner_pos", w))
      .withColumn("l", Kernels.seqFold(col("arr"), "horner_neg", w))
      .withColumn("rmi", u4(
        when(col("l") === 0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("g") / col("l")))))
      .select(col("asset_id"), col("date"), col("d"), col("rmi"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B235 `squeeze` — the TTM Squeeze gate: Bollinger(2σ) inside
    * Keltner(1.5·SMA-of-TR) collapses to the band-free comparison
    * 2·sd < 1.5·tr_mean (both u6'd, so the verdict compares identical
    * doubles cross-engine). `mom` is the close's distance from the
    * mid — the direction the squeeze fires toward. Volatility
    * compression is WHERE breakout systems arm themselves; the flag
    * is the arming state. Bars before the second (no variance) drop;
    * the TR seed follows [[atr]] (first bar = high − low).
    */
  def squeeze(panel: DataFrame, window: Int = 20): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(window - 1), Window.currentRow)
    val pc = lag(col("close"), 1).over(byAsset)
    val n = col("nn")
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tr", u6(
        when(pc.isNull, col("high") - col("low"))
          .otherwise(greatest(
            col("high") - col("low"),
            abs(col("high") - pc),
            abs(col("low") - pc)))))
      .withColumn("arr", collect_list(col("close")).over(frame))
      .withColumn("ta", collect_list(col("tr")).over(frame))
      .withColumn("nn", size(col("arr")).cast("double"))
      .filter(n >= 2)
      .withColumn("s", foldSum(col("arr")))
      .withColumn("s2", foldSumSq(col("arr")))
      .withColumn("sd", u6(sqrt(greatest(
        (n * col("s2") - col("s") * col("s")) / (n * (n - 1)), lit(0.0)))))
      .withColumn("tr_mean", u6(foldSum(col("ta")) / n))
      .withColumn("mid", u6(col("s") / n))
      .select(col("asset_id"), col("date"), col("sd"), col("tr_mean"),
        (lit(2.0) * col("sd") < lit(1.5) * col("tr_mean")).as("squeeze_on"),
        u6(col("close") - col("mid")).as("mom"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B236 `cog` — Ehlers' Center of Gravity oscillator: the weighted
    * mean POSITION of price inside an n-bar frame, newest bar weight 1
    * and oldest weight n, negated (COG = −Σ(n−j)·xⱼ/Σxⱼ over the
    * oldest-first frame) — a zero-lag cycle oscillator ([[wma]]'s
    * triangle fold with the weights mirrored and repurposed as a
    * position). Both legs are left-assoc folds; a zero value sum (the
    * synthetic panel can cross zero in aggregate) NULLs out.
    */
  def cog(panel: DataFrame, window: Int = 10): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("arr", collect_list(col("value")).over(frame))
      .withColumn("n", size(col("arr")))
      .withColumn("num", Kernels.seqFold(
        transform(col("arr"), (v, j) => v * (col("n") - j).cast("double")), "sum"))
      .withColumn("den", Kernels.seqFold(col("arr"), "sum"))
      .select(col("asset_id"), col("date"), col("value"),
        u6(-col("num") / when(col("den") === 0, lit(null)).otherwise(col("den")))
          .as("cog"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B237 `camarilla_pivots` — Camarilla day-trader levels off the
    * previous bar: inner reversal band C ± range·0.275 (R3/S3) and
    * breakout band C ± range·0.55 (R4/S4) — the mean-reversion
    * counterpart of [[pivotPoints]]' floor levels (same lag-only
    * shape: no frames, no folds; first bar per asset nulls out).
    */
  def camarillaPivots(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val ph = lag(col("high"), 1).over(byAsset)
    val pl = lag(col("low"), 1).over(byAsset)
    val pc = lag(col("close"), 1).over(byAsset)
    val range = ph - pl
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("r4", u6(pc + range * lit(0.55)))
      .withColumn("r3", u6(pc + range * lit(0.275)))
      .withColumn("s3", u6(pc - range * lit(0.275)))
      .withColumn("s4", u6(pc - range * lit(0.55)))
      .select(col("asset_id"), col("date"), col("close"),
        col("r4"), col("r3"), col("s3"), col("s4"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B238 `chande_kroll_stop` — volatility trailing stops: the
    * preliminary stops (p-bar channel extreme ∓ x·ATR_p, Wilder EW
    * ATR from [[atr]]'s machinery) re-extremed over a q-bar frame —
    * the stop only ratchets with the trend. Channel and ratchet
    * extremes are order-free min/max over u6'd inputs; the only fold
    * is the ATR horner pair. One asset_id shuffle carries all five
    * windows.
    */
  def chandeKrollStop(panel: DataFrame, p: Int = 10, x: Double = 1.0,
                      q: Int = 9): DataFrame = {
    val w = (p - 1).toDouble / p
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val fP = byAsset.rowsBetween(-(p - 1), Window.currentRow)
    val fQ = byAsset.rowsBetween(-(q - 1), Window.currentRow)
    val pc = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("tr", u6(
        when(pc.isNull, col("high") - col("low"))
          .otherwise(greatest(
            col("high") - col("low"),
            abs(col("high") - pc),
            abs(col("low") - pc)))))
      .withColumn("atr", u6(
        Kernels.seqFold(collect_list(col("tr")).over(fP), "horner", w) /
          Kernels.seqFold(collect_list(col("tr")).over(fP), "horner_count", w)))
      .withColumn("hs0", u6(max(col("high")).over(fP) - lit(x) * col("atr")))
      .withColumn("ls0", u6(min(col("low")).over(fP) + lit(x) * col("atr")))
      .withColumn("stop_short", max(col("hs0")).over(fQ))
      .withColumn("stop_long", min(col("ls0")).over(fQ))
      .select(col("asset_id"), col("date"), col("atr"),
        col("stop_long"), col("stop_short"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B239 `intraday_intensity` — Bollinger's Intraday Intensity
    * percentage: per-bar close position in the range, volume-weighted
    * — contrib = (2c−h−l)/(h−l)·ticks (flat bars contribute 0), II% =
    * 100·Σcontrib/Σticks over a 21-bar frame. Numerator folds u6'd
    * per-bar contribs left-assoc; the denominator is an exact integer
    * window sum (≥ 1 whenever a bar exists). The institutional
    * accumulation gauge of the [[cmf]] family, keyed on the close's
    * position instead of money flow.
    */
  def intradayIntensity(panel: DataFrame, window: Int = 21): DataFrame = {
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(window - 1), Window.currentRow)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("contrib", u6(
        when(col("high") === col("low"), lit(0.0))
          .otherwise((lit(2.0) * col("close") - col("high") - col("low")) /
            (col("high") - col("low")) * col("n_ticks").cast("double"))))
      .withColumn("s", Kernels.seqFold(collect_list(col("contrib")).over(frame), "sum"))
      .withColumn("v", sum(col("n_ticks")).over(frame))
      .select(col("asset_id"), col("date"), col("contrib"),
        u6(lit(100.0) * col("s") / col("v").cast("double")).as("ii_pct"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B240 `expectancy` — trade-expectancy profile of each asset's
    * daily returns: win rate, exact-decimal mean win and mean |loss|,
    * and E = p_win·avg_win − p_loss·avg_loss — the single number a
    * systematic desk quotes a strategy by. All sums are [[dsum]]
    * decimal sums of u6-grid returns (order-free exact); zero-return
    * days count in n but in neither tail (documented). Assets with no
    * wins or no losses leave that leg NULL and E NULL with it.
    */
  def expectancy(panel: DataFrame): DataFrame = {
    dailyReturnsCore(panel)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("ret") > 0, 1L).otherwise(0L)).as("n_wins"),
        sum(when(col("ret") < 0, 1L).otherwise(0L)).as("n_losses"),
        dsum(when(col("ret") > 0, col("ret")).otherwise(lit(0.0)), 6).as("ws"),
        dsum(when(col("ret") < 0, -col("ret")).otherwise(lit(0.0)), 6).as("ls"))
      .withColumn("avg_win", u6(col("ws") /
        when(col("n_wins") === 0, lit(null)).otherwise(col("n_wins").cast("double"))))
      .withColumn("avg_loss", u6(col("ls") /
        when(col("n_losses") === 0, lit(null)).otherwise(col("n_losses").cast("double"))))
      .withColumn("expectancy", u6(
        col("n_wins").cast("double") / col("n_days").cast("double") * col("avg_win") -
          col("n_losses").cast("double") / col("n_days").cast("double") * col("avg_loss")))
      .select(col("asset_id"), col("n_days"), col("n_wins"), col("n_losses"),
        col("avg_win"), col("avg_loss"), col("expectancy"))
      .orderBy(col("asset_id"))
  }

  /** B241 `cdar` — Conditional Drawdown at Risk: [[varCvar]]'s
    * tail-selection machinery applied to the DRAWDOWN series (running-
    * peak relative, u6 like [[drawdown]]): DaR = the ⌈n·q⌉-th worst
    * drawdown, CDaR = the mean of that worst tail — the
    * path-dependent risk number portfolio mandates cap
    * (Chekhlov/Uryasev/Zabarankin). Sorting + index selection is
    * order-free; the tail mean folds left-assoc over the sorted
    * prefix.
    */
  def cdar(panel: DataFrame, q: Double = 0.05): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val run = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = ceil(size(col("da")).cast("double") * q).cast("int")
    daily
      .withColumn("peak", max(col("value")).over(run))
      .withColumn("dd", u6(col("value") /
        when(col("peak") === 0, lit(null)).otherwise(col("peak")) - 1))
      .filter(col("dd").isNotNull)
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(col("dd"))).as("da"))
      .withColumn("k", k)
      .filter(col("k") >= 1)
      .withColumn("tail", slice(col("da"), lit(1), col("k")))
      .select(col("asset_id"), size(col("da")).cast("long").as("n_days"),
        col("k").cast("long").as("n_tail"),
        element_at(col("tail"), col("k")).as("dar"),
        u6(foldSum(col("tail")) / col("k").cast("double")).as("cdar"))
      .orderBy(col("asset_id"))
  }

  /** B242 `laguerre_rsi` — Ehlers' Laguerre RSI: a 4-stage Laguerre
    * filter cascade (γ = 0.5 — EXACT in binary, so every step is a
    * fixed IEEE sequence with no rounding hazard) whose stage gaps
    * feed an RSI-style up/down ratio — near-zero-lag momentum from
    * four recursive state values. Runs as its own `laguerre`
    * [[graft.expressions.RecurrenceFold]] kind (O(h) compiled scan,
    * u6 per stage per step); the seed bar fills all stages with the
    * close (denominator 0 → NULL), and the DuckDB recursive CTE
    * replays the cascade column-for-column.
    */
  def laguerreRsi(panel: DataFrame): DataFrame = {
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("value")))).as("bs"))
      .withColumn("lg", Kernels.recurrence(col("bs"), "laguerre"))
      .select(col("asset_id"), explode(col("lg")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"),
        col("h.close").as("value"), col("h.lrsi").as("lrsi"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** The u6-rounded two-pole super-smoother coefficients for period
    * `n` — computed ONCE driver-side (the only libm exp/cos calls in
    * the operator) and embedded as identical literals in both engines.
    */
  private[graft] def superSmootherCoeffs(n: Int): (Double, Double, Double) = {
    val arg = 1.414 * math.Pi / n
    val a1 = math.exp(-arg)
    val c2 = graft.operators.Micro.jvm6(2.0 * a1 * math.cos(arg))
    val c3 = graft.operators.Micro.jvm6(-a1 * a1)
    val c1 = graft.operators.Micro.jvm6(1.0 - c2 - c3)
    (c1, c2, c3)
  }

  /** B243 `super_smoother` — Ehlers' two-pole super smoother: a
    * Butterworth-derived IIR filter (ss = c1·(p+p₋₁)/2 + c2·ss₋₁ +
    * c3·ss₋₂) that kills high-frequency noise with roughly half an
    * SMA's lag — the DSP-grade smoothing primitive his oscillator
    * family builds on. Coefficients are u6-rounded driver-side
    * constants ([[superSmootherCoeffs]]); the two-deep recurrence
    * runs as the `super_smoother` [[graft.expressions
    * .RecurrenceFold]] kind, seeded ss₁ = p₁, ss₂ = p₂, u6 per step.
    */
  def superSmoother(panel: DataFrame, n: Int = 10): DataFrame = {
    val (c1, c2, c3) = superSmootherCoeffs(n)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("value"),
        lit(c1).as("c1"), lit(c2).as("c2"), lit(c3).as("c3")))).as("bs"))
      .withColumn("sm", Kernels.recurrence(col("bs"), "super_smoother"))
      .select(col("asset_id"), explode(col("sm")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"),
        col("h.close").as("value"), col("h.ss").as("ss"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B244 `t3` — Tillson's T3 moving average: six chained EW stages
    * (each the [[ewma]] horner pair, u6-ROUNDED before feeding the
    * next — the [[hma]]/[[tsi]] chain discipline) combined with the
    * volume-factor polynomial c1·e6 + c2·e5 + c3·e4 + c4·e3
    * (v = 0.7 → the EXACT 3-decimal coefficients −0.343, 2.499,
    * −6.069, 4.913). Smoother than a triple EMA at similar lag. All
    * six frames ride ONE asset_id shuffle; the decay 0.666667 is
    * kama's u6 constant.
    */
  def t3(panel: DataFrame, span: Int = 20): DataFrame = {
    val w = 0.666667 // u6(1 − 2/(n+1)), n = 5 — kama's fast-SC constant
    val frame = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(-(span - 1), Window.currentRow)
    def ew(c: Column): Column = {
      val arr = collect_list(c).over(frame)
      u6(Kernels.seqFold(arr, "horner", w) /
        Kernels.seqFold(arr, "horner_count", w))
    }
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("e1", ew(col("value")))
      .withColumn("e2", ew(col("e1")))
      .withColumn("e3", ew(col("e2")))
      .withColumn("e4", ew(col("e3")))
      .withColumn("e5", ew(col("e4")))
      .withColumn("e6", ew(col("e5")))
      .select(col("asset_id"), col("date"), col("value"), col("e3"), col("e6"),
        u6(lit(-0.343) * col("e6") + lit(2.499) * col("e5") +
          lit(-6.069) * col("e4") + lit(4.913) * col("e3")).as("t3"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B245 `arch_test` — Engle's ARCH-LM test at lag 1: [[autocorr]]'s
    * machinery applied to SQUARED returns (volatility clustering shows
    * up as serial correlation in r², not r), plus the LM statistic
    * n·ρ² (χ²₁ under the no-ARCH null — above ~3.84 rejects at 5%).
    * Same fold-based exact correlation (date-ordered arrays, compiled
    * dot product), x = u6(ret²) so both engines square the identical
    * grid values.
    */
  def archTest(panel: DataFrame): DataFrame = {
    val n = col("n")
    dailyReturnsCore(panel)
      .withColumn("x", u6(col("ret") * col("ret")))
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("x")))),
        s => s("x")).as("ra"))
      .withColumn("m", size(col("ra")))
      .filter(col("m") >= 3)
      .withColumn("xa", slice(col("ra"), lit(1), col("m") - 1))
      .withColumn("ya", slice(col("ra"), lit(2), col("m") - 1))
      .withColumn("n", (col("m") - 1).cast("double"))
      .withColumn("sx", foldSum(col("xa")))
      .withColumn("sy", foldSum(col("ya")))
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("sx2", foldSumSq(col("xa")))
      .withColumn("sy2", foldSumSq(col("ya")))
      .withColumn("den",
        sqrt(greatest(n * col("sx2") - col("sx") * col("sx"), lit(0.0))) *
          sqrt(greatest(n * col("sy2") - col("sy") * col("sy"), lit(0.0))))
      .withColumn("rho", u6((n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), n.cast("long").as("n_pairs"), col("rho"),
        u6(n * col("rho") * col("rho")).as("lm"))
      .orderBy(col("asset_id"))
  }

  /** The u6-rounded two-pole high-pass coefficients for period `n`
    * (α from the Ehlers cosine form) — libm runs ONCE driver-side.
    */
  private[graft] def highpassCoeffs(n: Int): (Double, Double, Double) = {
    val arg = 2.0 * math.Pi / n
    val alpha = (math.cos(arg) + math.sin(arg) - 1.0) / math.cos(arg)
    val k0 = graft.operators.Micro.jvm6((1.0 - alpha / 2.0) * (1.0 - alpha / 2.0))
    val c2 = graft.operators.Micro.jvm6(2.0 * (1.0 - alpha))
    val c3 = graft.operators.Micro.jvm6(-(1.0 - alpha) * (1.0 - alpha))
    (k0, c2, c3)
  }

  /** B246 `ehlers_decycler` — Ehlers' decycler: price minus its
    * two-pole HIGH-PASS component (hp = k0·(p − 2p₋₁ + p₋₂) + c2·hp₋₁
    * + c3·hp₋₂, zero-seeded) — what's left is the trend with the
    * cycle amplitude surgically removed, at near-zero lag (the
    * subtraction trick that beats low-pass smoothing on lag). Runs as
    * the generic `highpass2` [[graft.expressions.RecurrenceFold]]
    * kind with u6 driver-side coefficients ([[highpassCoeffs]]).
    */
  def ehlersDecycler(panel: DataFrame, n: Int = 20): DataFrame = {
    val (k0, c2, c3) = highpassCoeffs(n)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("value"),
        lit(k0).as("k0"), lit(c2).as("c2"), lit(c3).as("c3")))).as("bs"))
      .withColumn("hh", Kernels.recurrence(col("bs"), "highpass2"))
      .select(col("asset_id"), explode(col("hh")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"),
        col("h.close").as("value"), col("h.hp").as("hp"),
        u6(col("h.close") - col("h.hp")).as("decycler"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B247 `zigzag` — threshold-reversal swing pivots: an uptrend leg's
    * running high ratchets until price closes `th` below it, which
    * CONFIRMS the high as a pivot and flips the leg (mirrored down) —
    * the swing-structure primitive Elliott/harmonic tooling consumes,
    * and inherently sequential (each pivot depends on every bar since
    * the last). Runs as the `zigzag` [[graft.expressions
    * .RecurrenceFold]] kind — O(h) compiled scan, state = (leg
    * direction, running extreme); per-bar output carries the leg, the
    * ratcheting extreme, and the confirmed pivot (price + side) on
    * flip bars. Comparisons are raw IEEE products of u6 closes with
    * exact-decimal 1 ± th.
    */
  def zigzag(panel: DataFrame, th: Double = 0.05): DataFrame = {
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("value"),
        lit(th).as("th")))).as("bs"))
      .withColumn("zz", Kernels.recurrence(col("bs"), "zigzag"))
      .select(col("asset_id"), explode(col("zz")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"),
        col("h.close").as("value"), col("h.dir").as("dir"),
        col("h.ext").as("ext"), col("h.pivot").as("pivot"),
        col("h.kind").as("pivot_kind"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B248 `adf_test` — Dickey–Fuller unit-root test per asset (lag 0,
    * with intercept): regress Δpₜ on pₜ₋₁; the t-statistic of the
    * slope is the ADF stat (strongly negative rejects the unit root —
    * mean-reversion; near 0 looks like a random walk). The
    * single-series sibling of the pairs-trading `pairs_adf` residual
    * test. OLS from the five date-ordered fold sums, then a FIXED
    * IEEE sequence for β, α, SSE and the t-stat (se² = σ̂²·n/den —
    * both engines run the identical ops); n < 4, a flat regressor or
    * zero residual variance NULL out.
    */
  def adfTest(panel: DataFrame): DataFrame = {
    val n = col("n")
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("value")))),
        s => s("value")).as("pa"))
      .withColumn("m", size(col("pa")))
      .filter(col("m") >= 4)
      .withColumn("xa", slice(col("pa"), lit(1), col("m") - 1))
      .withColumn("ya", expr(
        "transform(sequence(1, size(pa) - 1), i -> pa[i] - pa[i-1])"))
      .withColumn("n", (col("m") - 1).cast("double"))
      .withColumn("sx", foldSum(col("xa")))
      .withColumn("sy", foldSum(col("ya")))
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("sx2", foldSumSq(col("xa")))
      .withColumn("sy2", foldSumSq(col("ya")))
      .withColumn("den", n * col("sx2") - col("sx") * col("sx"))
      .withColumn("beta", (n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") === 0, lit(null)).otherwise(col("den")))
      .withColumn("alpha", (col("sy") - col("beta") * col("sx")) / n)
      .withColumn("sse", greatest(
        col("sy2") - col("alpha") * col("sy") - col("beta") * col("sxy"), lit(0.0)))
      .withColumn("se", sqrt(col("sse") / (n - 2) * n / col("den")))
      .select(col("asset_id"), n.cast("long").as("n_obs"),
        u6(col("beta")).as("beta"),
        u6(col("beta") / when(col("se") === 0, lit(null)).otherwise(col("se")))
          .as("adf_t"))
      .orderBy(col("asset_id"))
  }

  /** B249 `kpss_test` — KPSS level-stationarity statistic per asset on
    * the u6 daily returns (the null is the OPPOSITE of [[adfTest]]'s:
    * stationary under H₀, so the two screens bracket a series):
    * Σ Sₜ²/(n²·σ̂²) with Sₜ the running sum of demeaned returns and
    * σ̂² the plain variance (Bartlett bandwidth 0 — exact, no kernel
    * weights). Prefix sums rebuild per position from the date-sorted
    * array (the [[portfolioNav]] bounded-O(days²) convention — per
    * asset history is calendar-bounded), every fold left-assoc.
    */
  def kpssTest(panel: DataFrame): DataFrame = {
    val n = col("n")
    dailyReturnsCore(panel)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 2)
      .withColumn("mu", u6(foldSum(col("ra")) / n))
      .withColumn("ea", transform(col("ra"), x => x - col("mu")))
      .withColumn("s2hat", Kernels.seqFold(col("ea"), "sumsq") / n)
      .withColumn("ssum", Kernels.seqFold(
        expr("transform(sequence(1, size(ea)), " +
          "k -> aggregate(slice(ea, 1, k), 0.0D, (a, x) -> a + x))"), "sumsq"))
      .select(col("asset_id"), n.cast("long").as("n_rets"),
        u6(col("ssum") / (n * n *
          when(col("s2hat") === 0, lit(null)).otherwise(col("s2hat"))))
          .as("kpss"))
      .orderBy(col("asset_id"))
  }

  /** B250 `kalman_trend` — 1-D local-level Kalman filter over the LWW
    * daily close: predict P += Q, gain K = P/(P+R), correct. Unlike a
    * fixed-α EMA the gain SELF-TUNES from the covariance recursion
    * (starts high while the estimate is uncertain, converges to the
    * steady-state Riccati gain) — the optimal-filtering primitive the
    * smoothing family approximates. Runs as the `kalman1d`
    * [[graft.expressions.RecurrenceFold]] kind; Q/R are exact-decimal
    * constants shipped per row so both engines step identical doubles.
    */
  def kalmanTrend(panel: DataFrame, q: Double = 0.01, r: Double = 1.0): DataFrame = {
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("value"),
        lit(q).as("q"), lit(r).as("r")))).as("bs"))
      .withColumn("ka", Kernels.recurrence(col("bs"), "kalman1d"))
      .select(col("asset_id"), explode(col("ka")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"),
        col("h.close").as("value"), col("h.level").as("level"),
        col("h.gain").as("gain"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B251 `holt_winters` — Holt's linear (double-exponential)
    * smoothing: level tracks the series, trend tracks the level's
    * drift, forecast = level + trend — the one-step-ahead forecasting
    * primitive ([[ewma]] can't follow a drifting series; the trend
    * term is what fixes that). `holt` [[graft.expressions
    * .RecurrenceFold]] kind, seeds level = p₁ / trend = 0, u6 per
    * component per step; 1−α / 1−β are COMPUTED in both engines
    * (never parsed literals).
    */
  def holtWinters(panel: DataFrame, alpha: Double = 0.3, beta: Double = 0.1): DataFrame = {
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("value"),
        lit(alpha).as("a"), lit(beta).as("b")))).as("bs"))
      .withColumn("hw", Kernels.recurrence(col("bs"), "holt"))
      .select(col("asset_id"), explode(col("hw")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"),
        col("h.close").as("value"), col("h.level").as("level"),
        col("h.trend").as("trend"), col("h.forecast").as("forecast"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B252 `theil_sen` — the Theil–Sen robust trend: the MEDIAN of all
    * pairwise slopes (pⱼ−pᵢ)/(j−i) over each asset's date-ordered
    * history — a 29%-breakdown estimator OLS can't match (one flash
    * crash drags a least-squares slope; the median shrugs). Slopes
    * are u6'd, the median is the LOWER middle of the sorted slope
    * array (deterministic, no interpolation). O(days²) pairs per
    * asset — calendar-bounded like [[portfolioNav]]'s prefix rebuild;
    * the windowed variant would bound it harder if panels ever grow
    * past daily grain.
    */
  def theilSen(panel: DataFrame): DataFrame = {
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("value")))),
        s => s("value")).as("pa"))
      .withColumn("m", size(col("pa")))
      .filter(col("m") >= 2)
      // D-suffixed literals: inside expr() a bare 1000000.0 parses as
      // DECIMAL and silently retypes the whole slope column
      .withColumn("slopes", array_sort(expr(
        """flatten(transform(sequence(1, size(pa) - 1),
          |  j -> transform(sequence(0, j - 1),
          |    i -> floor((pa[j] - pa[i]) / CAST(j - i AS DOUBLE)
          |               * 1000000.0D + 0.5D) / 1000000.0D)))""".stripMargin)))
      .withColumn("np", size(col("slopes")))
      .select(col("asset_id"), col("m").cast("long").as("n_obs"),
        col("np").cast("long").as("n_pairs"),
        element_at(col("slopes"), ((col("np") + 1) / 2).cast("int")).as("ts_slope"))
      .orderBy(col("asset_id"))
  }

  /** B253 `mann_kendall` — the Mann–Kendall trend test: S = Σ
    * sign(pⱼ−pᵢ) over all history pairs (PURE INTEGER — no rounding
    * anywhere in the statistic), tie-corrected variance from the
    * per-value tie groups, and the continuity-corrected Z. The
    * non-parametric companion to [[theilSen]] (MK says WHETHER a
    * monotone trend exists, Theil–Sen says how steep). Pair counting
    * is the bounded O(days²) array pass; tie groups are one exact
    * relational aggregate.
    */
  def mannKendall(panel: DataFrame): DataFrame = {
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val sArr = daily
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("value")))),
        s => s("value")).as("pa"))
      .withColumn("m", size(col("pa")))
      .filter(col("m") >= 3)
      .withColumn("s_stat", expr(
        """aggregate(transform(sequence(1, size(pa) - 1),
          |  j -> size(filter(slice(pa, 1, j), x -> x < pa[j]))
          |       - size(filter(slice(pa, 1, j), x -> x > pa[j]))),
          |  0L, (a, x) -> a + x)""".stripMargin))
    val ties = daily
      .groupBy(col("asset_id"), col("value"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("asset_id"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie_term"))
    sArr.join(ties, Seq("asset_id"))
      .withColumn("mm", col("m").cast("long"))
      .withColumn("var_s",
        (col("mm") * (col("mm") - 1) * (lit(2) * col("mm") + 5) - col("tie_term"))
          .cast("double") / lit(18.0))
      .withColumn("z", when(col("var_s") <= 0, lit(null))
        .when(col("s_stat") > 0,
          u6((col("s_stat") - 1).cast("double") / sqrt(col("var_s"))))
        .when(col("s_stat") < 0,
          u6((col("s_stat") + 1).cast("double") / sqrt(col("var_s"))))
        .otherwise(lit(0.0)))
      .select(col("asset_id"), col("mm").as("n_obs"), col("s_stat"), col("z"))
      .orderBy(col("asset_id"))
  }

  /** B254 `psych_line` — the psychological line: the share of up days
    * in the last `n` (per mille, INTEGER — counts over a frame, no
    * floats at all): crowd-sentiment overbought/oversold at 750/250‰.
    * The cheapest sentiment gauge there is; one lag + one window sum.
    */
  def psychLine(panel: DataFrame, n: Int = 12): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = byAsset.rowsBetween(-(n - 1), Window.currentRow)
    val prev = lag(col("value"), 1).over(byAsset)
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("up", when(col("value") > prev, 1L)
        .when(prev.isNull, lit(null)).otherwise(0L))
      .filter(col("up").isNotNull)
      .withColumn("n_up", sum(col("up")).over(frame))
      .withColumn("n_days", count(lit(1)).over(frame))
      .select(col("asset_id"), col("date"), col("n_up"), col("n_days"),
        expr("(1000 * n_up) div n_days").as("psych_pm"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B255 `renko` — fixed-brick renko state per asset over the LWW
    * daily closes: brick size = 2% of the first close (≥1 micro),
    * continuation at 1 brick, reversal at 2; a k-brick move prints k
    * bricks from the current anchor (graft convention — classic renko
    * leaves the reversal print count vendor-defined). The entire
    * recursion is MICRO-INTEGER (`renko` RecurrenceFold kind): anchor,
    * size, thresholds and brick counts are BIGINT 1e-6 units, so the
    * DuckDB CTE replays it with zero float ops. One shuffle on
    * asset_id; O(h) per asset via the pre-sized fold.
    */
  def renko(panel: DataFrame): DataFrame =
    KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("m", floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("value"), col("m")))).as("bs"))
      .withColumn("size", greatest(lit(1L), expr("(abs(bs[0].m) * 2) div 100")))
      .withColumn("in", expr("transform(bs, s -> struct(s.date, s.value, s.m, size))"))
      .withColumn("rk", Kernels.recurrence(col("in"), "renko"))
      .select(col("asset_id"), col("size").as("size_micro"), explode(col("rk")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"), col("h.close").as("close"),
        col("size_micro"), col("h.n_bricks").as("n_bricks"),
        col("h.cum_bricks").as("cum_bricks"), col("h.dir").as("dir"),
        col("h.anchor").as("anchor"))
      .orderBy(col("asset_id"), col("date"))

  /** B256 `garch_filter` — the GARCH(1,1) variance filter with fixed
    * textbook parameters (ω=1e-6, α=0.05, β=0.90) over the daily
    * return series: σ²_t = ω + α·r²_{t-1} + β·σ²_{t-1}. Parameter
    * ESTIMATION is MLE
    * and out of scope; the filter is the online path a risk engine
    * actually runs, and the [[ewmaVol]] (RiskMetrics β-only) special
    * case generalized with mean reversion toward ω/(1−α−β). σ² rides
    * the 1e-12 grid (`jvm12` — u6 is blind at variance scale); vol =
    * √σ² is IEEE-correctly-rounded in both engines. The seed is the
    * CONSTANT σ²₁ = 2e-5 (the unconditional ω/(1−α−β) as an exact
    * literal) — causal by construction, so the O(1) streaming twin
    * ([[graft.streaming.StreamingOps.garchStream]]) reproduces this
    * series bit-for-bit online.
    */
  def garchFilter(panel: DataFrame): DataFrame =
    dailyReturnsCore(panel)
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret")))).as("bs"),
        count(lit(1)).as("nr"))
      .filter(col("nr") >= 2)
      .withColumn("in", expr("transform(bs, s -> struct(s.date, s.ret))"))
      .withColumn("g", Kernels.recurrence(col("in"), "garch"))
      .select(col("asset_id"), explode(col("g")).as("h"))
      .select(col("asset_id"), col("h.date").as("date"), col("h.ret").as("ret"),
        col("h.sigma2").as("sigma2"), col("h.vol").as("vol"))
      .orderBy(col("asset_id"), col("date"))

  /** B257 `fama_macbeth` — the Fama–MacBeth two-pass regression on the
    * short-term-reversal factor (x = yesterday's return): pass 1 runs
    * one cross-sectional OLS PER DATE (slope from EXACT integer micro
    * sums — Σx, Σy, Σxy, Σx² as decimals so no scale overflows them),
    * pass 2 summarizes the date series of slopes into the mean premium
    * and its t-statistic via a date-ordered compiled fold. Output is
    * the per-date gamma series (the strong hash surface) with the
    * pass-2 summary broadcast onto every row. Two shuffles: one on
    * asset (returns), one on date (the cross-section).
    */
  def famaMacbeth(panel: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val xy = dailyReturnsCore(panel)
      .withColumn("x", lag(col("ret"), 1).over(w))
      .filter(col("x").isNotNull)
      .withColumn("xm", floor(col("x") * lit(1000000.0) + lit(0.5)).cast("decimal(38,0)"))
      .withColumn("ym", floor(col("ret") * lit(1000000.0) + lit(0.5)).cast("decimal(38,0)"))
    val slopes = xy
      .groupBy(col("date"))
      .agg(count(lit(1)).as("n"), sum(col("xm")).as("sx"), sum(col("ym")).as("sy"),
        sum(col("xm") * col("ym")).as("sxy"), sum(col("xm") * col("xm")).as("sx2"))
      .filter(col("n") >= 3)
      .withColumn("den", (col("n") * col("sx2") - col("sx") * col("sx")).cast("double"))
      .withColumn("slope", u6(
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .filter(col("slope").isNotNull)
      .select(col("date"), col("n").as("n_assets"), col("slope"))
    val summary = slopes
      .groupBy()
      .agg(transform(array_sort(collect_list(struct(col("date"), col("slope")))),
        s => s("slope")).as("ga"))
      .withColumn("nd", size(col("ga")).cast("double"))
      .filter(col("nd") >= 2)
      .withColumn("sg", foldSum(col("ga")))
      .withColumn("sg2", foldSumSq(col("ga")))
      .withColumn("mean_slope", u6(col("sg") / col("nd")))
      .withColumn("sd", sqrt(greatest((col("sg2") - col("sg") * col("sg") / col("nd")) /
        (col("nd") - 1), lit(0.0))))
      .withColumn("t_stat", u6(col("mean_slope") /
        when(col("sd") === 0, lit(null)).otherwise(col("sd") / sqrt(col("nd")))))
      .select(col("nd").cast("long").as("n_dates"), col("mean_slope"), col("t_stat"))
    slopes.crossJoin(broadcast(summary))
      .orderBy(col("date"))
  }

  /** B258 `quintile_spread` — the factor-backtest primitive behind
    * every long/short momentum/reversal table: per date, rank assets
    * by yesterday's return (ties broken by asset_id so the quintile
    * assignment is TOTAL), bucket into quintiles by the integer rule
    * q = ((rank−1)·5) div n, and report top-minus-bottom mean return.
    * Means are exact-integer sums divided as doubles (int→double is
    * exact below 2⁵³, the division is one IEEE op) then u6-rounded.
    * One shuffle on date; the rank window and the aggregation share it.
    */
  def quintileSpread(panel: DataFrame): DataFrame = {
    val wAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val nW = Window.partitionBy(col("date"))
    dailyReturnsCore(panel)
      .withColumn("x", lag(col("ret"), 1).over(wAsset))
      .filter(col("x").isNotNull)
      .withColumn("xm", floor(col("x") * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("ym", floor(col("ret") * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("n", count(lit(1)).over(nW))
      .filter(col("n") >= 5)
      .withColumn("q", expr("((row_number() OVER (PARTITION BY date ORDER BY xm, asset_id) - 1) * 5) div n"))
      .groupBy(col("date"))
      .agg(max(col("n")).as("n_assets"),
        sum(when(col("q") === 4, col("ym"))).as("top_sum"),
        count(when(col("q") === 4, lit(1))).as("top_n"),
        sum(when(col("q") === 0, col("ym"))).as("bot_sum"),
        count(when(col("q") === 0, lit(1))).as("bot_n"))
      .withColumn("top_mean", u6(col("top_sum").cast("double") /
        (col("top_n").cast("double") * lit(1000000.0))))
      .withColumn("bot_mean", u6(col("bot_sum").cast("double") /
        (col("bot_n").cast("double") * lit(1000000.0))))
      .withColumn("spread", u6(col("top_mean") - col("bot_mean")))
      .select(col("date"), col("n_assets"), col("top_mean"), col("bot_mean"),
        col("spread"))
      .orderBy(col("date"))
  }

  /** B259 `info_discreteness` — Da–Gurun–Warachka "frog in the pan"
    * information discreteness per asset: ID = sign(total move) ×
    * (%down days − %up days). High ID = the move arrived in jumps
    * (news), low/negative = it dribbled in continuously — continuous-
    * information momentum is the one that persists. Counts and the
    * sign are PURE INTEGER (sign from the exact Σ of micro returns);
    * the only float is the final percentage division, u6-rounded.
    */
  def infoDiscreteness(panel: DataFrame): DataFrame =
    dailyReturnsCore(panel)
      .withColumn("rm", floor(col("ret") * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_rets"),
        sum(when(col("rm") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("rm") < 0, 1L).otherwise(0L)).as("n_neg"),
        sum(col("rm")).as("sum_rm"))
      .filter(col("n_rets") >= 3)
      .withColumn("sign", signum(col("sum_rm")).cast("long"))
      .withColumn("id", u6(col("sign").cast("double") *
        (col("n_neg") - col("n_pos")).cast("double") / col("n_rets").cast("double")))
      .select(col("asset_id"), col("n_rets"), col("n_pos"), col("n_neg"),
        col("sign"), col("id"))
      .orderBy(col("asset_id"))

  /** B260 `hasbrouck_lambda` — Hasbrouck's square-root price-impact
    * coefficient per asset: daily signed order flow S_d = Σ_ticks
    * side·√|value| (tick-rule sides with last-nonzero carry, the
    * [[kyleLambda]] convention; √ is IEEE-correctly-rounded so both
    * engines fold the same doubles in the same ts,seq order), then the
    * OLS slope of daily price changes on S_d. The concave-impact twin
    * of [[kyleLambda]] (impact ∝ √volume is the empirical regularity;
    * linear λ overstates large-trade cost). Per-day flows fold over
    * date-ordered arrays — no unordered float sums anywhere.
    */
  def hasbrouckLambda(panel: DataFrame): DataFrame = {
    val tw = Window.partitionBy(col("asset_id")).orderBy(col("ts"), col("seq"))
    val carryW = tw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTick = lag(col("value"), 1).over(tw)
    val flow = panel.repartition(col("asset_id"))
      .withColumn("d", when(prevTick.isNull, lit(null))
        .otherwise(signum(col("value") - prevTick).cast("int")))
      .withColumn("side",
        last(when(col("d") =!= 0, col("d")), ignoreNulls = true).over(carryW))
      .filter(col("side").isNotNull)
      .withColumn("sv", col("side").cast("double") * sqrt(abs(col("value"))))
      .groupBy(col("asset_id"), col("date"))
      .agg(Kernels.seqFold(transform(array_sort(collect_list(
        struct(col("ts"), col("seq"), col("sv")))), s => s("sv")), "sum").as("s_flow"))
    val dw = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val dprev = lag(col("value"), 1).over(dw)
    val dp = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
      .withColumn("dp", u6(col("value") - dprev))
      .filter(col("dp").isNotNull)
    val n = col("n")
    dp.join(flow, Seq("asset_id", "date"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("dp"),
        col("s_flow").as("q")))).as("h"))
      .withColumn("xa", transform(col("h"), s => s("q")))
      .withColumn("ya", transform(col("h"), s => s("dp")))
      .withColumn("n", size(col("h")).cast("double"))
      .filter(n >= 3)
      .withColumn("sx", foldSum(col("xa")))
      .withColumn("sy", foldSum(col("ya")))
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("sx2", foldSumSq(col("xa")))
      .withColumn("den", n * col("sx2") - col("sx") * col("sx"))
      .withColumn("hasbrouck_lambda", u6((n * col("sxy") - col("sx") * col("sy")) /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .select(col("asset_id"), n.cast("long").as("n_days"), col("hasbrouck_lambda"))
      .orderBy(col("asset_id"))
  }

  /** B261 `woodie_pivots` — Woodie's pivot set from yesterday's bar
    * with the close double-weighted: P = (H+L+2C)/4, the classic
    * R1/S1/R2/S2 ladder. [[pivotPoints]]' plan shape exactly (one
    * asset shuffle shared by the lags); only the P formula differs.
    */
  def woodiePivots(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val ph = lag(col("high"), 1).over(byAsset)
    val pl = lag(col("low"), 1).over(byAsset)
    val pc = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("p", u6((ph + pl + lit(2.0) * pc) / 4))
      .withColumn("r1", u6(lit(2.0) * col("p") - pl))
      .withColumn("s1", u6(lit(2.0) * col("p") - ph))
      .withColumn("r2", u6(col("p") + (ph - pl)))
      .withColumn("s2", u6(col("p") - (ph - pl)))
      .select(col("asset_id"), col("date"), col("close"),
        col("p"), col("r1"), col("s1"), col("r2"), col("s2"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B262 `demark_pivots` — DeMark's conditional pivot: X keys off
    * yesterday's open/close relation (down day weights the low, up day
    * the high, flat the close), then P = X/4, R1 = X/2 − L,
    * S1 = X/2 − H. The branch is exact (raw-double comparisons both
    * engines share); arithmetic is u6 at the three outputs only.
    */
  def demarkPivots(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val po = lag(col("open"), 1).over(byAsset)
    val ph = lag(col("high"), 1).over(byAsset)
    val pl = lag(col("low"), 1).over(byAsset)
    val pc = lag(col("close"), 1).over(byAsset)
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("x",
        when(pc < po, ph + lit(2.0) * pl + pc)
          .when(pc > po, lit(2.0) * ph + pl + pc)
          .otherwise(ph + pl + lit(2.0) * pc))
      .withColumn("p", u6(col("x") / 4))
      .withColumn("r1", u6(col("x") / 2 - pl))
      .withColumn("s1", u6(col("x") / 2 - ph))
      .select(col("asset_id"), col("date"), col("close"),
        col("p"), col("r1"), col("s1"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B263 `anchored_vwap` — month-anchored VWAP per asset at daily
    * grain: cumulative integer-cent notional / cumulative tick count
    * month-to-date, reported at CENT precision via one integer floor
    * division (`cum_cents div cum_ticks` — exact at any scale an
    * int64 tick count reaches; the [[graft.streaming.StreamingOps
    * .vwapStream]] integer-cents convention applied to the anchored
    * window every execution desk actually quotes). Day sums are exact
    * integer aggregates, so the running sums are order-free; ONE
    * shuffle on asset_id serves the day aggregate and the
    * month-partitioned cumulative window (month is a coarsening of
    * the asset partition's date order).
    */
  def anchoredVwap(panel: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id"), col("month")).orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    panel.repartition(col("asset_id"))
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .groupBy(col("asset_id"), col("date"))
      .agg(sum(col("cents")).as("day_cents"), count(lit(1)).as("day_ticks"))
      .withColumn("month", trunc(col("date"), "month"))
      .withColumn("cum_cents", sum(col("day_cents")).over(w))
      .withColumn("cum_ticks", sum(col("day_ticks")).over(w))
      .withColumn("avwap",
        expr("CAST(cum_cents div cum_ticks AS DOUBLE) / 100.0D"))
      .select(col("asset_id"), col("date"), col("month"),
        col("cum_ticks").as("n_ticks_mtd"), col("avwap"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** The Durbin–Levinson unroll to lag 5, as SQL-dialect-neutral
    * formula strings evaluated VERBATIM by both engines (Spark
    * `expr()` column-by-column, DuckDB as a generated CTE chain) — a
    * shared source of truth instead of two hand-transcribed copies of
    * 11 recurrence lines. Each formula references only earlier names;
    * every stored φ is u6-rounded; zero denominators null out.
    */
  private[graft] val pacfFormulas: Seq[(String, String)] = {
    def u6s(x: String) =
      s"floor(($x) * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(1000000.0 AS DOUBLE)"
    def dl(num: String, den: String) =
      u6s(s"($num) / (CASE WHEN ($den) = 0 THEN NULL ELSE ($den) END)")
    Seq(
      "phi11" -> "r1",
      "phi22" -> dl("r2 - phi11 * r1", "1 - phi11 * r1"),
      "phi21" -> u6s("phi11 - phi22 * phi11"),
      "phi33" -> dl("r3 - phi21 * r2 - phi22 * r1",
        "1 - phi21 * r1 - phi22 * r2"),
      "phi31" -> u6s("phi21 - phi33 * phi22"),
      "phi32" -> u6s("phi22 - phi33 * phi21"),
      "phi44" -> dl("r4 - phi31 * r3 - phi32 * r2 - phi33 * r1",
        "1 - phi31 * r1 - phi32 * r2 - phi33 * r3"),
      "phi41" -> u6s("phi31 - phi44 * phi33"),
      "phi42" -> u6s("phi32 - phi44 * phi32"),
      "phi43" -> u6s("phi33 - phi44 * phi31"),
      "phi55" -> dl("r5 - phi41 * r4 - phi42 * r3 - phi43 * r2 - phi44 * r1",
        "1 - phi41 * r1 - phi42 * r2 - phi43 * r3 - phi44 * r4"))
  }

  /** B264 `pacf` — partial autocorrelation of each asset's daily
    * returns to lag 5 via the Durbin–Levinson recursion: ACF lags from
    * date-ordered compiled folds over the demeaned series (c_k pairs
    * in ascending index order on BOTH engines — 0-based `transform`
    * here, 1-based `range` in the oracle, same pair sequence), then
    * the [[pacfFormulas]] unroll. The AR-order fingerprint the raw ACF
    * smears (an AR(1) has pacf2..5 ≈ 0 while acf decays slowly).
    * Assets with <10 returns are skipped — below that the lag-5
    * denominators are noise around zero.
    */
  def pacf(panel: DataFrame): DataFrame = {
    val base = dailyReturnsCore(panel)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("arr"))
      .withColumn("n", size(col("arr")).cast("long"))
      .filter(col("n") >= 10)
      .withColumn("mu", u6(Kernels.seqFold(col("arr"), "sum") / col("n").cast("double")))
      .withColumn("da", expr("transform(arr, x -> x - mu)"))
      .withColumn("c0", Kernels.seqFold(col("da"), "sumsq"))
    val withR = (1 to 5).foldLeft(base) { (df, k) =>
      df.withColumn(s"c$k", Kernels.seqFold(
          expr(s"transform(sequence($k, size(da) - 1), i -> da[i] * da[i - $k])"), "sum"))
        .withColumn(s"r$k", u6(col(s"c$k") /
          when(col("c0") === 0, lit(null)).otherwise(col("c0"))))
    }
    val withPhi = pacfFormulas.foldLeft(withR) {
      case (df, (name, f)) => df.withColumn(name, expr(f))
    }
    withPhi.select(col("asset_id"), col("n").as("n_rets"),
      col("r1"), col("r2"), col("r3"), col("r4"), col("r5"),
      col("phi11").as("pacf1"), col("phi22").as("pacf2"),
      col("phi33").as("pacf3"), col("phi44").as("pacf4"),
      col("phi55").as("pacf5"))
      .orderBy(col("asset_id"))
  }

  /** B265 `es_backtest` — the Expected-Shortfall companion to
    * [[varBacktest]]: same rolling historical window (k-th order
    * statistic = VaR, mean of the k worst = predicted ES, both from
    * the PRIOR `window` days only — no lookahead), then on violation
    * days compares realized tail loss to the model's promise:
    * es_ratio = mean(realized violation return)/mean(predicted ES)
    * (≈1 calibrated, >1 the model under-promises tail depth). All
    * violation-day means fold over date-ordered arrays — no unordered
    * float sums.
    */
  def esBacktest(panel: DataFrame, window: Int = 20, q: Double = 0.1): DataFrame = {
    val k = math.ceil(window * q).toInt
    val daily = KeyValue.lwwDaily(panel.repartition(col("asset_id")))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = w.rowsBetween(-window, -1)
    val prev = lag(col("value"), 1).over(w)
    daily
      .withColumn("ret", u6(col("value") / when(prev === 0, lit(null)).otherwise(prev) - 1))
      .filter(col("ret").isNotNull)
      .withColumn("arr", collect_list(col("ret")).over(frame))
      .filter(size(col("arr")) === window)
      .withColumn("sorted", array_sort(col("arr")))
      .withColumn("var_q", element_at(col("sorted"), k))
      .withColumn("es_pred", u6(Kernels.seqFold(slice(col("sorted"), 1, k), "sum") /
        lit(k.toDouble)))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_days"),
        array_sort(collect_list(when(col("ret") < col("var_q"),
          struct(col("date"), col("ret"), col("es_pred"))))).as("viol"))
      .withColumn("n_viol", size(col("viol")).cast("long"))
      .withColumn("mean_viol_ret", when(col("n_viol") === 0, lit(null)).otherwise(
        u6(Kernels.seqFold(expr("transform(viol, s -> s.ret)"), "sum") /
          col("n_viol").cast("double"))))
      .withColumn("mean_pred_es", when(col("n_viol") === 0, lit(null)).otherwise(
        u6(Kernels.seqFold(expr("transform(viol, s -> s.es_pred)"), "sum") /
          col("n_viol").cast("double"))))
      .withColumn("es_ratio", u6(col("mean_viol_ret") /
        when(col("mean_pred_es") === 0, lit(null)).otherwise(col("mean_pred_es"))))
      .select(col("asset_id"), col("n_days"), col("n_viol"),
        col("mean_viol_ret"), col("mean_pred_es"), col("es_ratio"))
      .orderBy(col("asset_id"))
  }

  /** B266 `island_reversals` — the island-reversal bar pattern: a day
    * whose whole range gapped ABOVE both neighbors' (top: entered on a
    * gap up, abandoned on a gap down) or BELOW both (bottom) — the
    * exhaustion signature gap-and-go scanners flag. Pure raw-double
    * comparisons on the daily bars (both engines read identical
    * parquet doubles — no arithmetic at all), one lag + one lead on
    * the single asset_id shuffle. First/last bars can't qualify (a
    * null neighbor fails the null-is-false comparison).
    */
  def islandReversals(panel: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    dailyBars(panel.repartition(col("asset_id")))
      .withColumn("ph", lag(col("high"), 1).over(w))
      .withColumn("pl", lag(col("low"), 1).over(w))
      .withColumn("nh", lead(col("high"), 1).over(w))
      .withColumn("nl", lead(col("low"), 1).over(w))
      .withColumn("kind",
        when(col("low") > col("ph") && col("nh") < col("low"), lit("top"))
          .when(col("high") < col("pl") && col("nl") > col("high"), lit("bottom")))
      .filter(col("kind").isNotNull)
      .select(col("asset_id"), col("date"), col("kind"), col("low"), col("high"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B267 `rebalance_nav` — the weekly-rebalanced equal-weight
    * portfolio NAV (vs [[portfolioNav]]'s fixed weights): within each
    * ISO week every asset compounds its own daily returns
    * (date-ordered `prod1p` fold per (asset, week)), the week's growth
    * factor is the equal-weight mean of those gross factors over the
    * assets PRESENT that week (the weights reset — that IS the
    * rebalance), and the NAV chains the week factors in calendar
    * order. Three exact stages, each a deterministic fold; the week
    * count is tiny so the final single-partition chain is O(weeks),
    * not O(days). Both engines truncate weeks to Monday.
    */
  def rebalanceNav(panel: DataFrame): DataFrame = {
    val weekGross = dailyReturnsCore(panel)
      .withColumn("week", trunc(col("date"), "week"))
      .groupBy(col("asset_id"), col("week"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("gross", u6(Kernels.seqFold(col("ra"), "prod1p")))
    val byWeek = weekGross
      .groupBy(col("week"))
      .agg(transform(array_sort(collect_list(struct(col("asset_id"), col("gross")))),
        s => s("gross")).as("ga"))
      .withColumn("n_assets", size(col("ga")).cast("long"))
      .withColumn("week_gross", u6(Kernels.seqFold(col("ga"), "sum") /
        col("n_assets").cast("double")))
    val navFrame = Window.orderBy(col("week"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byWeek
      .withColumn("navarr", collect_list(col("week_gross") - 1).over(navFrame))
      .withColumn("nav", u6(Kernels.seqFold(col("navarr"), "prod1p")))
      .select(col("week"), col("n_assets"), col("week_gross"), col("nav"))
      .orderBy(col("week"))
  }

  /** B268 `variance_decomposition` — the CAPM variance split per
    * asset: total return variance into systematic (β²·σ²_m) and
    * idiosyncratic (the residual, floored at 0) legs, plus the
    * systematic share. Exactly the [[jensenAlpha]] running-sum
    * machinery with two sample variances at the end; the number that
    * says whether an asset's risk is market exposure (hedgeable) or
    * its own (diversifiable).
    */
  def varianceDecomposition(panel: DataFrame): DataFrame = {
    val rets = dailyReturnsCore(panel)
    val n = col("n")
    rets.join(broadcast(marketReturns(rets)), Seq("date"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("mkt_ret")))).as("h"))
      .withColumn("ra", transform(col("h"), s => s("ret")))
      .withColumn("rm", transform(col("h"), s => s("mkt_ret")))
      .withColumn("rp", transform(col("h"), s => s("ret") * s("mkt_ret")))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 3)
      .withColumn("sa", foldSum(col("ra")))
      .withColumn("sm", foldSum(col("rm")))
      .withColumn("sp", foldSum(col("rp")))
      .withColumn("sm2", foldSumSq(col("rm")))
      .withColumn("sa2", foldSumSq(col("ra")))
      .withColumn("sxx", n * col("sm2") - col("sm") * col("sm"))
      .withColumn("b", (n * col("sp") - col("sm") * col("sa")) /
        when(col("sxx") <= 0, lit(null)).otherwise(col("sxx")))
      .withColumn("var_total", (n * col("sa2") - col("sa") * col("sa")) / (n * (n - 1)))
      .withColumn("var_mkt", col("sxx") / (n * (n - 1)))
      .withColumn("var_sys", col("b") * col("b") * col("var_mkt"))
      // explicit null gate: Spark's greatest() SKIPS nulls, so a null
      // var_sys would otherwise silently collapse to 0.0 here while
      // the streaming twin and DuckDB (whose greatest may differ on
      // null handling) say null — make all three agree by construction
      .withColumn("var_idio", when(col("var_sys").isNull, lit(null))
        .otherwise(greatest(col("var_total") - col("var_sys"), lit(0.0))))
      .withColumn("sys_share", u6(col("var_sys") /
        when(col("var_total") === 0, lit(null)).otherwise(col("var_total"))))
      .select(col("asset_id"), n.cast("long").as("n_days"), u6(col("b")).as("beta"),
        u6(col("var_total") * 1e4).as("var_total_bp"),
        u6(col("var_sys") * 1e4).as("var_sys_bp"),
        u6(col("var_idio") * 1e4).as("var_idio_bp"),
        col("sys_share"))
      .orderBy(col("asset_id"))
  }

  /** B269 `vol_target_nav` — the volatility-targeted overlay every
    * risk-parity book runs: leverage_t = min(cap, target/σ_t) from the
    * PRIOR-window realized vol (no lookahead), strategy return =
    * leverage·return, NAV compounded per asset by the linear-time
    * `cumprod1p` recurrence (the O(h²) prefix-collect this op would
    * otherwise need is exactly the r9 depth-hazard class). Zero-vol
    * windows take the cap (the 1/σ limit), u6 at every stored stage.
    */
  def volTargetNav(panel: DataFrame, window: Int = 20, target: Double = 0.01,
                   cap: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val frame = w.rowsBetween(-window, -1)
    val nD = lit(window.toDouble)
    val rets = dailyReturnsCore(panel)
      .withColumn("arr", collect_list(col("ret")).over(frame))
      .filter(size(col("arr")) === window)
      .withColumn("s1", Kernels.seqFold(col("arr"), "sum"))
      .withColumn("s2", Kernels.seqFold(col("arr"), "sumsq"))
      .withColumn("vol", u6(sqrt(greatest(
        (nD * col("s2") - col("s1") * col("s1")) / (nD * (nD - 1)), lit(0.0)))))
      .withColumn("lev", when(col("vol") === 0, lit(cap))
        .otherwise(u6(least(lit(cap), lit(target) / col("vol")))))
      .withColumn("sret", u6(col("lev") * col("ret")))
    rets
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("sret"),
        col("vol"), col("lev")))).as("bs"))
      .withColumn("in", expr("transform(bs, s -> struct(s.date, s.sret))"))
      .withColumn("cp", Kernels.recurrence(col("in"), "cumprod1p"))
      .select(col("asset_id"), col("bs"), posexplode(col("cp")))
      .select(col("asset_id"),
        col("col.date").as("date"),
        expr("bs[pos].vol").as("vol"),
        expr("bs[pos].lev").as("lev"),
        col("col.x").as("strat_ret"),
        col("col.acc").as("nav"))
      .orderBy(col("asset_id"), col("date"))
  }

  /** B270 `tail_dependence` — empirical tail-dependence of each asset
    * against the equal-weight market: λ_L = P(asset in its lower
    * q-tail | market in its lower q-tail), λ_U symmetric — the copula
    * corner the Pearson-correlation family is blind to (two assets
    * can correlate 0.3 overall yet crash together every time).
    * Thresholds are k-th order statistics of each leg's OWN history
    * (k = ⌈qn⌉), counts are pure integers over u6 values, one u6
    * division per tail. Single asset shuffle + broadcast market leg.
    */
  def tailDependence(panel: DataFrame, q: Double = 0.1): DataFrame = {
    val rets = dailyReturnsCore(panel)
    rets.select(col("asset_id"), col("date"), col("ret"))
      .join(broadcast(marketReturns(rets)), Seq("date"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("mkt_ret")))).as("h"))
      .withColumn("n", size(col("h")).cast("long"))
      .filter(col("n") >= 10)
      .withColumn("k", expr(s"CAST(ceil(CAST(n AS DOUBLE) * $q) AS INT)"))
      .withColumn("ra", expr("array_sort(transform(h, s -> s.ret))"))
      .withColumn("ma", expr("array_sort(transform(h, s -> s.mkt_ret))"))
      .withColumn("thr_a_lo", expr("ra[k - 1]"))
      .withColumn("thr_m_lo", expr("ma[k - 1]"))
      .withColumn("thr_a_hi", expr("ra[CAST(n AS INT) - k]"))
      .withColumn("thr_m_hi", expr("ma[CAST(n AS INT) - k]"))
      .withColumn("n_mkt_lo",
        expr("size(filter(h, s -> s.mkt_ret <= thr_m_lo))").cast("long"))
      .withColumn("n_joint_lo",
        expr("size(filter(h, s -> s.ret <= thr_a_lo AND s.mkt_ret <= thr_m_lo))").cast("long"))
      .withColumn("n_mkt_hi",
        expr("size(filter(h, s -> s.mkt_ret >= thr_m_hi))").cast("long"))
      .withColumn("n_joint_hi",
        expr("size(filter(h, s -> s.ret >= thr_a_hi AND s.mkt_ret >= thr_m_hi))").cast("long"))
      .withColumn("lambda_lower", u6(col("n_joint_lo").cast("double") /
        when(col("n_mkt_lo") === 0, lit(null)).otherwise(col("n_mkt_lo").cast("double"))))
      .withColumn("lambda_upper", u6(col("n_joint_hi").cast("double") /
        when(col("n_mkt_hi") === 0, lit(null)).otherwise(col("n_mkt_hi").cast("double"))))
      .select(col("asset_id"), col("n").as("n_days"), col("k").cast("long").as("k"),
        col("n_mkt_lo"), col("n_joint_lo"), col("lambda_lower"),
        col("n_mkt_hi"), col("n_joint_hi"), col("lambda_upper"))
      .orderBy(col("asset_id"))
  }

  /** B271 `pattern_entropy` — Shannon entropy of the 3-day up/down
    * sign patterns per asset (8 bins): a random walk fills all 8 bins
    * near-uniformly (H → ln 8 ≈ 2.079), momentum/reversal regimes
    * hollow it out — the predictability census behind [[runsTest]]'s
    * single statistic. Counts are exact integers; Σc·ln c folds in
    * ascending pattern-code order (the [[graft.expressions
    * .CharEntropyMicro]] determinism convention), one u6 at the end.
    */
  def patternEntropy(panel: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    dailyReturnsCore(panel)
      .withColumn("s", when(col("ret") > 0, 1L).otherwise(0L))
      .withColumn("s1", lag(col("s"), 1).over(w))
      .withColumn("s2", lag(col("s"), 2).over(w))
      .filter(col("s2").isNotNull)
      .withColumn("code", col("s2") * 4 + col("s1") * 2 + col("s"))
      .groupBy(col("asset_id"), col("code"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("code"), col("c")))).as("h"),
        sum(col("c")).as("n"))
      .filter(col("n") >= 8)
      .withColumn("sumclnc", Kernels.seqFold(
        expr("transform(h, s -> CAST(s.c AS DOUBLE) * ln(CAST(s.c AS DOUBLE)))"), "sum"))
      .withColumn("entropy", u6(log(col("n").cast("double")) -
        col("sumclnc") / col("n").cast("double")))
      .select(col("asset_id"), col("n").as("n_triplets"),
        size(col("h")).cast("long").as("n_patterns"), col("entropy"))
      .orderBy(col("asset_id"))
  }

  /** Shared dual-dialect DFA fluctuation expression (B272 `hurst_dfa`):
    * emits the SAME formula once for Spark `expr()` and once for the
    * DuckDB oracle (the [[pacfFormulas]] shared-source-of-truth
    * discipline — per-box Σy/Σy²/Σiy folds, closed-form OLS detrend
    * residual, deterministic box order). `ya` is the profile array;
    * 0-based indexing on the Spark side, 1-based on DuckDB's.
    */
  private[graft] def dfaFExpr(sparkDialect: Boolean, s: Int): String = {
    val sxx = s.toDouble * (s.toDouble * s - 1) / 12.0 // integer-valued for s ∈ {4,8}
    val xbar = (s + 1) / 2.0
    def agg(body: String): String =
      if (sparkDialect)
        s"aggregate(sequence(1, $s), CAST(0.0 AS DOUBLE), (a, i) -> a + ($body))"
      else
        s"list_reduce(list_prepend(0.0, list_transform(range(1, ${s + 1}), i -> ($body))), (a, x) -> a + x)"
    val idx = if (sparkDialect) s"ya[j * $s + i - 1]" else s"ya[j * $s + i]"
    val sy = agg(idx)
    val syy = agg(s"($idx) * ($idx)")
    val siy = agg(s"CAST(i AS DOUBLE) * ($idx)")
    val boxes =
      if (sparkDialect)
        s"transform(sequence(0, CAST(size(ya) div $s AS INT) - 1), j -> named_struct('sy', $sy, 'syy', $syy, 'siy', $siy))"
      else
        s"list_transform(range(0, CAST(len(ya) // $s AS INTEGER)), j -> struct_pack(sy := $sy, syy := $syy, siy := $siy))"
    val rss = s"(t.syy - (t.sy * t.sy) / CAST($s.0 AS DOUBLE)) - " +
      s"((t.siy - CAST($xbar AS DOUBLE) * t.sy) * (t.siy - CAST($xbar AS DOUBLE) * t.sy)) / CAST($sxx AS DOUBLE)"
    val rssArr =
      if (sparkDialect) s"transform($boxes, t -> $rss)"
      else s"list_transform($boxes, t -> $rss)"
    val fsum =
      if (sparkDialect) s"aggregate($rssArr, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
      else s"list_reduce(list_prepend(0.0, $rssArr), (a, x) -> a + x)"
    val b =
      if (sparkDialect) s"CAST((size(ya) div $s) AS DOUBLE)"
      else s"CAST((len(ya) // $s) AS DOUBLE)"
    s"floor(sqrt(greatest($fsum, CAST(0.0 AS DOUBLE)) / ($b * CAST($s.0 AS DOUBLE))) " +
      "* CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(1000000.0 AS DOUBLE)"
  }

  /** Two-point log-log slope for the DFA exponent — dialect-neutral
    * (ln / CASE / floor parse identically in Spark SQL and DuckDB).
    */
  private[graft] val dfaAlphaExpr: String =
    "CASE WHEN f4 IS NULL OR f8 IS NULL OR f4 <= 0 OR f8 <= 0 THEN NULL ELSE " +
      "floor(((ln(f8) - ln(f4)) / (ln(CAST(8.0 AS DOUBLE)) - ln(CAST(4.0 AS DOUBLE)))) " +
      "* CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(1000000.0 AS DOUBLE) END"

  /** B275 `dual_beta` — bull/bear beta split by the SIGN of the
    * market return (up-market days vs down-market days, zero-market
    * days in neither): the asymmetry read as two raw OLS slopes plus
    * their difference (beta_convexity > 0 = rises faster than it
    * falls — the profile everyone wants and few assets have).
    * [[downsideBeta]] demeans then clips; this splits the SAMPLE, the
    * practitioner's dual-beta convention. Each side's sums fold over
    * the date-ordered side array; sides with < 2 observations or a
    * degenerate denominator null out, convexity nulls with either.
    */
  def dualBeta(panel: DataFrame): DataFrame = {
    val rets = dailyReturnsCore(panel)
    def sideCols(df: DataFrame, side: String): DataFrame = {
      val arr = col(s"h$side")
      df.withColumn(s"n$side", size(arr).cast("double"))
        .withColumn(s"sa$side", foldSum(expr(s"transform(h$side, s -> s.ret)")))
        .withColumn(s"sm$side", foldSum(expr(s"transform(h$side, s -> s.mkt_ret)")))
        .withColumn(s"sp$side", foldSum(expr(s"transform(h$side, s -> s.ret * s.mkt_ret)")))
        .withColumn(s"sm2$side", foldSum(expr(s"transform(h$side, s -> s.mkt_ret * s.mkt_ret)")))
        .withColumn(s"den$side", col(s"n$side") * col(s"sm2$side") - col(s"sm$side") * col(s"sm$side"))
        .withColumn(s"beta$side", when(col(s"n$side") < 2, lit(null)).otherwise(
          u6((col(s"n$side") * col(s"sp$side") - col(s"sa$side") * col(s"sm$side")) /
            when(col(s"den$side") === 0, lit(null)).otherwise(col(s"den$side")))))
    }
    val base = rets.select(col("asset_id"), col("date"), col("ret"))
      .join(broadcast(marketReturns(rets)), Seq("date"))
      .groupBy(col("asset_id"))
      .agg(array_sort(collect_list(struct(col("date"), col("ret"), col("mkt_ret")))).as("h"))
      .withColumn("hu", expr("filter(h, s -> s.mkt_ret > 0)"))
      .withColumn("hd", expr("filter(h, s -> s.mkt_ret < 0)"))
      .filter(size(col("hu")) + size(col("hd")) >= 2)
    sideCols(sideCols(base, "u"), "d")
      .withColumn("beta_convexity", u6(col("betau") - col("betad")))
      .select(col("asset_id"),
        size(col("hu")).cast("long").as("n_up"),
        size(col("hd")).cast("long").as("n_down"),
        col("betau").as("bull_beta"), col("betad").as("bear_beta"),
        col("beta_convexity"))
      .orderBy(col("asset_id"))
  }

  /** B273 `adjusted_sharpe` — Pezier's skew/kurtosis-adjusted Sharpe:
    * ASR = SR·(1 + (S/6)·SR − ((K−3)/24)·SR²) — the Sharpe a
    * non-normal return stream actually deserves (positive skew buys
    * credit, fat tails pay for themselves). Raw-moment folds over the
    * date-ordered return array ([[jarqueBera]]'s algebra verbatim:
    * same m2/m3/m4 expressions, same guards), SR from the SAMPLE sd;
    * every stored stat u6. One asset shuffle.
    */
  def adjustedSharpe(panel: DataFrame): DataFrame = {
    val n = col("n")
    dailyReturnsCore(panel)
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("ret")))),
        s => s("ret")).as("ra"))
      .withColumn("n", size(col("ra")).cast("double"))
      .filter(n >= 4)
      .withColumn("m", foldSum(col("ra")) / n)
      .withColumn("m2", Kernels.seqFold(col("ra"), "sumsq") / n - col("m") * col("m"))
      .withColumn("m3", Kernels.seqFold(col("ra"), "sum3") / n
        - lit(3.0) * col("m") * (Kernels.seqFold(col("ra"), "sumsq") / n)
        + lit(2.0) * col("m") * col("m") * col("m"))
      .withColumn("m4", Kernels.seqFold(col("ra"), "sum4") / n
        - lit(4.0) * col("m") * (Kernels.seqFold(col("ra"), "sum3") / n)
        + lit(6.0) * col("m") * col("m") * (Kernels.seqFold(col("ra"), "sumsq") / n)
        - lit(3.0) * col("m") * col("m") * col("m") * col("m"))
      .withColumn("sd", sqrt(greatest(col("m2") * n / (n - 1), lit(0.0))))
      .withColumn("sr", u6(col("m") /
        when(col("sd") === 0, lit(null)).otherwise(col("sd"))))
      .withColumn("g1", u6(col("m3") /
        when(col("m2") <= 0, lit(null)).otherwise(col("m2") * sqrt(col("m2")))))
      .withColumn("g2", u6(col("m4") /
        when(col("m2") <= 0, lit(null)).otherwise(col("m2") * col("m2")) - 3))
      .withColumn("asr", u6(col("sr") * (lit(1.0) + col("g1") / 6 * col("sr") -
        col("g2") / 24 * col("sr") * col("sr"))))
      .select(col("asset_id"), n.cast("long").as("n_days"), col("sr"),
        col("g1").as("skew"), col("g2").as("ex_kurt"), col("asr"))
      .orderBy(col("asset_id"))
  }

  /** B274 `equity_curve_r2` — the K-ratio family: OLS of the
    * cumulative log-equity curve on the time index per asset — slope
    * (log-drift/day), R² (how straight the ride was) and the K-ratio
    * (slope / its standard error — return per unit of PATH
    * deviation, where Sharpe charges only for dispersion of returns).
    * y is an EXACT integer cumsum of u6(ln(1+r)) micro-steps
    * (order-free); the OLS sums fold over the date-ordered (t, y)
    * arrays (Σt/Σt² closed-form integers, the float legs sequential —
    * engine-exact by order).
    */
  def equityCurveR2(panel: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset_id")).orderBy(col("date"))
    val runW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col("n")
    dailyReturnsCore(panel)
      .filter(col("ret") > -1)
      .withColumn("lm", floor(log(lit(1.0) + col("ret")) * lit(1000000.0) + lit(0.5))
        .cast("long"))
      .withColumn("ym", sum(col("lm")).over(runW))
      .withColumn("y", col("ym").cast("double") / lit(1000000.0))
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("y")))),
        s => s("y")).as("ya"))
      .withColumn("n", size(col("ya")).cast("double"))
      .filter(n >= 3)
      .withColumn("st", n * (n + 1) / 2)
      .withColumn("st2", n * (n + 1) * (lit(2.0) * n + 1) / 6)
      .withColumn("sy", Kernels.seqFold(col("ya"), "sum"))
      .withColumn("sy2", Kernels.seqFold(col("ya"), "sumsq"))
      .withColumn("sty", Kernels.seqFold(
        expr("zip_with(sequence(1, size(ya)), ya, (i, v) -> CAST(i AS DOUBLE) * v)"),
        "sum"))
      .withColumn("sxx", n * col("st2") - col("st") * col("st"))
      .withColumn("sxy", n * col("sty") - col("st") * col("sy"))
      .withColumn("syy", n * col("sy2") - col("sy") * col("sy"))
      .withColumn("slope", u6(col("sxy") / col("sxx")))
      .withColumn("r2", when(col("syy") <= 0, lit(null)).otherwise(
        u6(col("sxy") * col("sxy") / (col("sxx") * col("syy")))))
      .withColumn("resid_var",
        greatest((col("syy") - col("sxy") * col("sxy") / col("sxx")) / (n * (n - 2)),
          lit(0.0)))
      .withColumn("se", sqrt(col("resid_var") / (col("sxx") / n)))
      .withColumn("k_ratio", u6(col("slope") /
        when(col("se") === 0, lit(null)).otherwise(col("se"))))
      .select(col("asset_id"), n.cast("long").as("n_days"), col("slope"),
        col("r2"), col("k_ratio"))
      .orderBy(col("asset_id"))
  }

  /** B272 `hurst_dfa` — detrended fluctuation analysis: the DFA-1
    * exponent α per asset from the integrated (EXACT integer micro)
    * return profile, box sizes 4 and 8, per-box linear detrend via the
    * closed-form OLS residual (no matrix anything), α = the two-point
    * log-log slope. The estimator that agrees with [[hurst]]'s R/S on
    * clean fractional noise but stays unbiased under polynomial
    * trends. The profile is a running INTEGER sum (order-free,
    * mean-centering uses an explicit cross-engine floor so negative
    * sums can't split `div`-vs-`//` semantics); every float fold runs
    * through the shared [[dfaFExpr]] strings, so the two engines
    * evaluate the identical IEEE sequence by construction.
    */
  def hurstDfa(panel: DataFrame): DataFrame = {
    val byAsset = Window.partitionBy(col("asset_id"))
    val runW = Window.partitionBy(col("asset_id")).orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = dailyReturnsCore(panel)
      .withColumn("rm", floor(col("ret") * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("sum_rm", sum(col("rm")).over(byAsset))
      .withColumn("n_all", count(lit(1)).over(byAsset))
      .withColumn("mu_m",
        floor(col("sum_rm").cast("double") / col("n_all").cast("double")).cast("long"))
      .withColumn("y", (sum(col("rm") - col("mu_m")).over(runW)).cast("double") /
        lit(1000000.0))
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("date"), col("y")))),
        s => s("y")).as("ya"))
      .withColumn("n", size(col("ya")).cast("long"))
      .filter(col("n") >= 16)
    Seq(4, 8).foldLeft(base) { (df, s) =>
      df.withColumn(s"f$s", expr(dfaFExpr(sparkDialect = true, s)))
    }
      .withColumn("dfa_alpha", expr(dfaAlphaExpr))
      .select(col("asset_id"), col("n").as("n_rets"), col("f4"), col("f8"),
        col("dfa_alpha"))
      .orderBy(col("asset_id"))
  }
}
