package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-hardening utilities for hot keys at 100 TB.
  *
  * AQE's runtime skew-join split handles sort-merge joins; these helpers
  * cover the two cases it doesn't: (a) aggregations over a hot group
  * key, (b) broadcast-side fan-out joins where one probe key dominates.
  * Both use deterministic salting — no sampling pass, no RNG, stable
  * across retries (a task retry with a different random salt would
  * double-count).
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of a unique tie-break
    * column, NOT `rand()` (retry-safe, plan-cache-safe).
    */
  def salt(uniqueCol: Column, buckets: Int): Column =
    pmod(xxhash64(uniqueCol), lit(buckets.toLong)).cast("int")

  /** Two-phase salted aggregation: `agg(groupCols + salt)` (map-side
    * partials spread over `buckets` reducers per hot key) → re-aggregate
    * by `groupCols`. Caller supplies the per-phase aggregate pairs:
    * e.g. partial `sum(x) as s, count(1) as c` then final
    * `sum(s), sum(c)`. For the common count/sum case use
    * [[saltedCountSum]].
    */
  def saltedAgg(df: DataFrame, groupCols: Seq[String], uniqueCol: String, buckets: Int)(
      partial: Seq[Column], fin: Seq[Column]): DataFrame =
    df.withColumn("_salt", salt(col(uniqueCol), buckets))
      .groupBy((groupCols.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(groupCols.map(col): _*)
      .agg(fin.head, fin.tail: _*)

  /** Salted count + exact-decimal sum per group — the common hot-key
    * rollup, safe under any skew: no reducer ever sees more than
    * 1/buckets of a hot key's rows.
    */
  def saltedCountSum(df: DataFrame, groupCols: Seq[String], uniqueCol: String,
                     valueCol: String, buckets: Int = 32): DataFrame =
    saltedAgg(df, groupCols, uniqueCol, buckets)(
      partial = Seq(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("_s")),
      fin = Seq(
        sum(col("_n")).as("n_rows"),
        sum(col("_s")).cast("double").as("sum_value")))

  /** Salted join for a skewed probe side: the build (small) side is
    * replicated `buckets` times with an explicit salt column, the probe
    * side gets the deterministic salt, and the join key becomes
    * (key, salt) — a hot probe key now lands on `buckets` reducers.
    * Use when the build side is too big to broadcast but small enough
    * to replicate `buckets`×.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeUniqueCol: String, buckets: Int = 8): DataFrame = {
    val saltedProbe = probe.withColumn("_salt", salt(col(probeUniqueCol), buckets))
    val salts = build.sparkSession.range(buckets).select(col("id").cast("int").as("_salt"))
    val replicatedBuild = build.crossJoin(salts)
    saltedProbe.join(replicatedBuild, Seq(key, "_salt")).drop("_salt")
  }
}
