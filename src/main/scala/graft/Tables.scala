package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-pruned readers for the driver's testdata tables.
  *
  * Every operator reads only through these so the DuckDB oracle sees the
  * identical parquet input. Readers select the minimal projection at the
  * scan so Catalyst pushes column pruning into the parquet reader
  * (`ReadSchema` in `.explain`) — at 100 TB reading 4 of 6 columns is a
  * 33% I/O cut before anything else happens.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The findb "panel": time-varying cross-sectional values.
    *
    * Maps the reference's composite B-tree key (reference:
    * src/btree/file.rs:21-35 `Key{asset_id, date, timestamp}` → `Value`)
    * onto the `events` table: `user_id`→asset_id, `date(ts)`→effective
    * date, `ts`→knowledge timestamp, `value`→value. `event_id` (`seq`)
    * is a unique tie-breaker so every "latest revision" choice is total —
    * the reference gets this for free from B-tree key uniqueness.
    */
  def panel(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("user_id").as("asset_id"),
      to_date(col("ts")).as("date"),
      col("ts"),
      col("value"),
      col("event_id").as("seq"))

  /** `events.ts` has shipped in two physical parquet schemas across
    * testdata generations, so the reader probes the schema it actually
    * receives instead of hardcoding either (r5 postmortem: the hardcoded
    * nanos path broke 98 queries when the data switched to µs):
    *
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so
    *     `GraftConf.tune` sets the legacy nanos-as-long conf and this
    *     branch truncates the raw int64 to microseconds — exactly what
    *     DuckDB ≥1.0 does reading the same file into its µs-native
    *     TIMESTAMP. `div` keeps the math integral (double division loses
    *     precision above 2^53 ns).
    *   - TIMESTAMP_NTZ(µs): cast NTZ → session-local timestamp. All graft
    *     sessions run with session TZ UTC, so the cast is an identity on
    *     the micros-since-epoch value and matches what DuckDB sees.
    *
    * Either way downstream operators get the same TimestampType `ts`.
    * No session conf is mutated here (GraftConf owns conf — its
    * no-side-effect contract, GraftConf.scala).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = read(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already TimestampType
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "part")
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")
}
