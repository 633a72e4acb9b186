package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingestion for findb-shaped tick files — the reference's
  * `read_csv` (src/btree/file.rs:591, headerless
  * `asset_id,date,timestamp,value` rows) plus its conversion scripts
  * (scripts/convert-datetimes.py: ISO date → yyyymmdd int, ISO ts →
  * epoch seconds; convert-csv.sh then key-sorts).
  *
  * Distributed reading of splittable CSV + a projection — conversion
  * happens at scan speed; the key sort is deferred to
  * [[TickStore.write]] exactly as the shell pipeline defers to `sort`.
  */
object FinCsv {

  val rawSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("timestamp", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Read a headerless ISO-formatted tick CSV and apply the reference's
    * conversions, yielding the canonical panel schema.
    *
    * `seq` is the LWW tie-breaker consumed by upsertLww/asOf when two
    * rows share (asset_id, date, ts). It must be deterministic across
    * partition layouts and task retries, so it is a content hash of the
    * raw row rather than `monotonically_increasing_id()` (whose values
    * depend on task scheduling). Rows identical in key AND value hash
    * equal — the tie is then between equal values, so any winner yields
    * the same answer.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "false")
      .schema(rawSchema)
      .csv(path)
      .select(
        col("asset_id"),
        to_date(col("date")).as("date"),
        to_timestamp(col("timestamp")).as("ts"),
        col("value"),
        xxhash64(col("asset_id"), col("date"), col("timestamp"), col("value")).as("seq"))

  /** Full ingestion pipeline = the reference's convert-csv.sh end to
    * end: read + convert ([[read]]) then key-sorted bulk load into the
    * month-partitioned store ([[TickStore.write]] = the
    * `sort | write_from_iterator` stage).
    */
  def ingestToTickStore(spark: SparkSession, csvPath: String, storePath: String): Unit =
    TickStore.write(read(spark, csvPath), storePath)

  /** The scripts' exact integer encoding (for systems expecting the
    * reference's u32 key fields).
    */
  def toIntKeys(panel: DataFrame): DataFrame =
    panel.select(
      col("asset_id"),
      date_format(col("date"), "yyyyMMdd").cast("int").as("date_int"),
      unix_timestamp(col("ts")).as("epoch_s"),
      col("value"))
}
