package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.TickStore

/** Migration CLI: reference `.db` panel files → the graft TickStore
  * (month-partitioned, key-sorted parquet). The complete switch-over
  * path for a findb user:
  *
  *   sbt "runMain graft.tools.MigrateDb out/store panel1.db [panel2.db …]"
  *
  * Dates arrive as the reference's yyyymmdd ints and knowledge
  * timestamps as epoch seconds (u32); both convert losslessly.
  */
object MigrateDb {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MigrateDb <storePath> <dbFile> [dbFile ...]")
    val storePath = args.head
    val dbFiles = args.tail
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = migrate(spark, dbFiles.toSeq, storePath)
    println(s"MIGRATED $n rows from ${dbFiles.length} file(s) to $storePath")
    spark.stop()
  }

  /** Returns the migrated row count. */
  def migrate(spark: SparkSession, dbFiles: Seq[String], storePath: String): Long = {
    val raw = spark.read
      .format("graft.sources.findb.FindbDataSource")
      .load(dbFiles: _*)
    val panel = raw.select(
      col("asset_id"),
      to_date(col("date").cast("string"), "yyyyMMdd").as("date"),
      timestamp_seconds(col("timestamp")).as("ts"),
      col("value").cast("double").as("value"),
      // the u32 knowledge ts is unique per (asset,date) in the reference
      // model; reuse it as the tie-break seq
      col("timestamp").as("seq"))
    TickStore.write(panel, storePath)
    TickStore.read(spark, storePath).count()
  }
}
