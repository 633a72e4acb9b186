package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A9 — the storage layout that replaces the reference's on-disk B-tree
  * (reference: src/btree/file.rs:296 `write_from_iterator` bulk-loads
  * key-sorted pages; :425 `query` descends inner nodes then scans
  * leaves; cache.rs is a CLOCK page cache).
  *
  * Spark-native equivalents, feature by feature:
  *   - inner-node traversal  → hive-style partition pruning on
  *     `date_month` (directory-level elimination before any I/O);
  *   - leaf binary search    → parquet row-group min/max stats on the
  *     sort key (`sortWithinPartitions(asset_id, date, ts)` makes the
  *     stats tight, so point/range predicates skip row groups);
  *   - page cache            → executor-local parquet reader buffering +
  *     OS page cache (nothing to build).
  *
  * At 100 TB: month-partitioning bounds any as-of query to the touched
  * months; within a month, asset-major sort order clusters each series
  * so a single-asset query reads a handful of row groups, not the
  * month. Files per partition are bounded by `filesPerPartition`
  * repartitioning to keep file counts metadata-friendly.
  */
object TickStore {

  /** Bulk load: the `write_from_iterator` analog. Input must carry
    * (asset_id, date, ts, value, seq).
    */
  def write(panel: DataFrame, path: String, filesPerPartition: Int = 4): Unit =
    panel
      .withColumn("date_month", date_format(col("date"), "yyyy-MM"))
      .repartition(filesPerPartition, col("date_month"), pmod(col("asset_id"), lit(filesPerPartition)))
      .sortWithinPartitions(col("asset_id"), col("date"), col("ts"), col("seq"))
      .write
      .mode("overwrite")
      .partitionBy("date_month")
      .parquet(path)

  /** The `graft.tickstore` option is a provenance marker carried on the
    * scan relation (parquet ignores unknown options); the
    * DeriveMonthPartitionFilter optimizer rule fires only on scans
    * carrying it, so non-TickStore tables that coincidentally have
    * `date`/`date_month` columns are never rewritten.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option(graft.plans.DeriveMonthPartitionFilter.MarkerOption, "true")
      .parquet(path)
      .select(col("asset_id"), col("date"), col("ts"), col("value"), col("seq"),
        col("date_month"))

  /** Bucketed variant: hash-bucket by `asset_id`, sorted within buckets
    * by the composite key. Two tables bucketed the same way are
    * CO-LOCATED: joins/as-of joins on asset_id read bucket i against
    * bucket i with NO exchange — the bucketed scan already reports
    * `HashPartitioning(asset_id)`, so EnsureRequirements inserts no
    * shuffle (asserted in the spec). At 100 TB this removes the panel's
    * only shuffle from every panel⨝panel operation.
    */
  def writeBucketedTable(panel: DataFrame, table: String, path: String,
                         buckets: Int = 8): Unit =
    panel.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, "asset_id")
      .sortBy("asset_id", "date", "ts")
      .saveAsTable(table)

  /** Date-range scan with the month partition predicate derived from the
    * range — the inner-node traversal analog: directories outside
    * [from, to] months are never opened (`PartitionFilters` in the
    * plan), then row-group stats narrow within each month.
    */
  def scan(spark: SparkSession, path: String, fromDate: String, toDate: String): DataFrame =
    read(spark, path)
      .filter(col("date_month").between(fromDate.substring(0, 7), toDate.substring(0, 7)) &&
        col("date").between(lit(fromDate).cast("date"), lit(toDate).cast("date")))
}
