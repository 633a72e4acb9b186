package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapred.{FileSplit, TextInputFormat}
import org.apache.spark.rdd.HadoopRDD
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

  /** Bits reserved for the within-file byte offset in `seq`: supports
    * files up to 4 TiB and ~2M files per ingest batch before overflow.
    */
  private val OffsetBits = 42

  /** Read a headerless ISO-formatted tick CSV and apply the reference's
    * conversions, yielding the canonical panel schema.
    *
    * `seq` is the LWW tie-breaker consumed by upsertLww/asOf when two
    * rows share (asset_id, date, ts). The reference upserts rows in
    * file order (sequential inserts — a later same-key row replaces the
    * earlier one), so `seq` encodes the row's PHYSICAL POSITION:
    * `fileIndex << 42 | byteOffsetWithinFile`, where fileIndex ranks
    * files by path. Byte offsets come from TextInputFormat's per-record
    * key, so they are exact regardless of how Spark splits a file
    * across tasks, and identical on task retry — deterministic across
    * partition layouts AND faithful to ingestion order, unlike a
    * content hash (which picked an arbitrary winner among same-key rows
    * with different values) or `monotonically_increasing_id()` (which
    * depends on task scheduling).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.sparkContext.hadoopFile(
      path, classOf[TextInputFormat], classOf[LongWritable], classOf[Text])
    val lines = raw.asInstanceOf[HadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit { (split, iter) =>
        val file = split.asInstanceOf[FileSplit].getPath.toString
        iter.map { case (off, line) => (file, off.get(), line.toString) }
      }
    // Files in one batch get a dense rank by path (lexicographic = the
    // order a sequential loader would visit them). The distinct file
    // list is tiny next to the data — safe to collect.
    val fileIdx: Map[String, Long] =
      lines.map(_._1).distinct().collect().sorted.zipWithIndex
        .map { case (f, i) => f -> i.toLong }.toMap
    val bc = spark.sparkContext.broadcast(fileIdx)

    import spark.implicits._
    val parsed = lines
      .filter(_._3.nonEmpty)
      .map { case (file, off, line) =>
        val c = line.split(",", -1)
        (c(0).trim.toLong, c(1).trim, c(2).trim, c(3).trim.toDouble,
          (bc.value(file) << OffsetBits) | off)
      }
      .toDF("asset_id", "date", "timestamp", "value", "seq")
    parsed.select(
      col("asset_id"),
      to_date(col("date")).as("date"),
      to_timestamp(col("timestamp")).as("ts"),
      col("value"),
      col("seq"))
  }

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
