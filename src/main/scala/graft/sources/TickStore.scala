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
      // date_month FIRST: the dynamic-partition writer requires its
      // input ordered by the partition columns and would otherwise
      // insert its own (stability-unspecified) sort, destroying the
      // key order inside each month. With the partition column leading,
      // the child ordering prefix-satisfies the writer's requirement,
      // no extra sort is inserted, and every physical file is
      // GUARANTEED (asset_id, date, ts, seq)-sorted — the invariant the
      // row-group-stats pruning story (and the `tickstore_layout`
      // driver row) rests on.
      .sortWithinPartitions(col("date_month"), col("asset_id"), col("date"), col("ts"), col("seq"))
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
  def read(spark: SparkSession, path: String): DataFrame = {
    // Roll forward any compaction that crashed after its commit point
    // (manifest present) before exposing the store: a reader never sees
    // a half-swapped month. One FS existence probe when no manifest
    // exists — see [[compactCommit]].
    compactCommit(spark, path)
    spark.read
      .option(graft.plans.DeriveMonthPartitionFilter.MarkerOption, "true")
      .parquet(path)
      .select(col("asset_id"), col("date"), col("ts"), col("value"), col("seq"),
        col("date_month"))
  }

  /** Bucketed variant: hash-bucket by `asset_id`, sorted within buckets
    * by the composite key. Two tables bucketed the same way are
    * CO-LOCATED: joins/as-of joins on asset_id read bucket i against
    * bucket i with NO exchange — the bucketed scan already reports
    * `HashPartitioning(asset_id)`, so EnsureRequirements inserts no
    * shuffle (asserted in the spec). At 100 TB this removes the panel's
    * only shuffle from every panel⨝panel operation.
    */
  def writeBucketedTable(panel: DataFrame, table: String, path: String,
                         buckets: Int = 8,
                         sortCols: Seq[String] = Seq("asset_id", "date", "ts")): Unit =
    panel
      // One task per bucket (repartition hash == bucketing hash, both
      // HashPartitioning on the column) ⇒ exactly one file per bucket,
      // the layout where the scan also reports the sortBy ORDER — so a
      // consumer requiring (asset_id, ts…) ordering elides its Sort,
      // not just its Exchange.
      .repartition(buckets, col("asset_id"))
      .write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, "asset_id")
      .sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(table)

  /** Incremental compaction — the background "merge" a log-structured
    * store runs, Spark-native: apply LWW (keep only the max-(ts, seq)
    * revision per (asset_id, date)), optionally drop deleted keys, and
    * rewrite ONLY the touched month partitions key-sorted.
    *
    * Scale story: `months` bounds the work to named partitions
    * (partition-pruned read — a 100 TB store compacts month by month),
    * and dynamic partition overwrite replaces just those directories —
    * untouched months are never read or rewritten. The rewrite restores
    * the tight row-group stats that revisions accumulated since bulk
    * load had degraded.
    */
  def compact(spark: SparkSession, path: String,
              months: Option[Seq[String]] = None,
              deletes: Option[DataFrame] = None,
              filesPerPartition: Int = 4): Unit = {
    compactPrepare(spark, path, months, deletes, filesPerPartition)
    compactCommit(spark, path)
  }

  private def tmpPathFor(path: String): String =
    path.stripSuffix("/") + "__compacting"

  /** Manifest location — a SIBLING of the store directory, so the store
    * itself stays pure parquet partitions for discovery.
    */
  private def manifestPathFor(path: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_manifest.json")

  /** Crash-safe compaction, phase 1 of 2: rewrite the scoped months
    * into a tmp directory, then ATOMICALLY RENAME a manifest into place
    * recording the intended swap (months to rename in, months emptied
    * by deletes to drop). The manifest rename IS the commit point:
    *
    *  - crash BEFORE it → the manifest does not exist, the tmp rewrite
    *    is inert garbage (overwritten by the next prepare), and every
    *    reader keeps the intact pre-compact view;
    *  - crash AFTER it (anywhere inside the swap) → [[compactCommit]]
    *    rolls the swap FORWARD idempotently, and [[read]] runs it
    *    before exposing the store, so a reader never sees a
    *    half-swapped month.
    *
    * Write-new-then-swap, never overwrite-in-place: Spark (rightly)
    * refuses to overwrite a path it is reading, and a real compactor
    * must leave readers a consistent view until the swap. The
    * `tickstore_compact_atomic` driver row exercises both crash
    * windows by running the two phases separately.
    */
  def compactPrepare(spark: SparkSession, path: String,
                     months: Option[Seq[String]] = None,
                     deletes: Option[DataFrame] = None,
                     filesPerPartition: Int = 4): Unit = {
    val tmpPath = tmpPathFor(path)
    // SESSION conf (not sparkContext.hadoopConfiguration): runtime
    // fs.* overrides must reach metadata ops like the data path does
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    // Months in compaction scope, resolved BEFORE the rewrite: the swap
    // below must delete every scoped month directory even when deletes
    // (or an LWW collapse) leave a month empty — an empty month writes
    // no tmp directory, but its old rows are still superseded.
    val scopeMonths: Seq[String] = months.getOrElse {
      fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .map(_.getPath.getName)
        .filter(_.startsWith("date_month="))
        .map(_.stripPrefix("date_month="))
        .toSeq
    }
    val scoped = months match {
      case Some(ms) => read(spark, path).filter(col("date_month").isin(ms: _*))
      case None => read(spark, path)
    }
    val undeleted = deletes match {
      case Some(d) => scoped.join(
        org.apache.spark.sql.functions.broadcast(d.select("asset_id", "date")),
        Seq("asset_id", "date"), "left_anti")
      case None => scoped
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("asset_id"), col("date")).orderBy(col("ts").desc, col("seq").desc)
    undeleted
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .repartition(filesPerPartition, col("date_month"), pmod(col("asset_id"), lit(filesPerPartition)))
      // partition column first — see [[write]] (prevents the writer's
      // own partition-column sort from destroying the key order)
      .sortWithinPartitions(col("date_month"), col("asset_id"), col("date"), col("ts"), col("seq"))
      .write
      .mode("overwrite")
      .partitionBy("date_month")
      .parquet(tmpPath)

    val tmp = new org.apache.hadoop.fs.Path(tmpPath)
    // Manifest: scoped months split by intended action. A month with a
    // tmp rewrite is RENAMED in; a scoped month fully emptied by
    // deletes (or the LWW collapse) has no tmp dir but must still
    // DROP — recording the split is what makes recovery unambiguous
    // (an absent tmp dir means "already renamed" for a rename month,
    // but "never existed" for a drop month).
    val rewritten: Set[String] =
      if (fs.exists(tmp))
        fs.listStatus(tmp).map(_.getPath.getName)
          .filter(_.startsWith("date_month="))
          .map(_.stripPrefix("date_month=")).toSet
      else Set.empty
    val renames = scopeMonths.filter(rewritten)
    val drops = scopeMonths.filterNot(rewritten)
    def arr(ms: Seq[String]) = ms.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"tmp":"$tmpPath","renames":${arr(renames)},"drops":${arr(drops)}}"""
    val mp = manifestPathFor(path)
    val mpTmp = new org.apache.hadoop.fs.Path(mp.toString + ".tmp")
    val out = fs.create(mpTmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    if (fs.exists(mp)) fs.delete(mp, false)
    require(fs.rename(mpTmp, mp), s"manifest commit rename failed: $mp")
  }

  /** Crash-safe compaction, phase 2 of 2: execute (or RE-execute after
    * a crash) the swap the manifest records, idempotently — for each
    * drop month, delete the live directory if present; for each rename
    * month, if its tmp directory still exists delete the live one and
    * rename the rewrite in (an absent tmp dir means that month's swap
    * already completed). The manifest is deleted last, so a crash at
    * ANY point re-runs to the same end state. Returns true when a
    * manifest was found and executed; no-ops (one FS probe) otherwise.
    */
  def compactCommit(spark: SparkSession, path: String): Boolean = {
    // SESSION conf (not sparkContext.hadoopConfiguration): runtime
    // fs.* overrides must reach metadata ops like the data path does
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val mp = manifestPathFor(path)
    if (!fs.exists(mp)) return false
    val in = fs.open(mp)
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def strings(field: String): Seq[String] = {
      val n = node.get(field)
      (0 until n.size()).map(n.get(_).asText())
    }
    val tmp = new org.apache.hadoop.fs.Path(node.get("tmp").asText())
    strings("drops").foreach { m =>
      val live = new org.apache.hadoop.fs.Path(path, s"date_month=$m")
      if (fs.exists(live)) fs.delete(live, true)
    }
    strings("renames").foreach { m =>
      val src = new org.apache.hadoop.fs.Path(tmp, s"date_month=$m")
      if (fs.exists(src)) {
        val live = new org.apache.hadoop.fs.Path(path, s"date_month=$m")
        if (fs.exists(live)) fs.delete(live, true)
        require(fs.rename(src, live), s"compaction swap rename failed: $src")
      } // else: this month's swap already completed before the crash
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
    fs.delete(mp, false)
    true
  }

  /** Append a (small) micro-batch to the store: same layout as
    * [[write]], dynamic partition overwrite disabled — new files land
    * beside existing ones in each touched month. Readers see
    * revision-duplicates until [[compact]] runs, which is exactly the
    * log-structured contract (as-of/LWW semantics are unaffected:
    * later (ts, seq) still wins).
    */
  def append(batch: DataFrame, path: String, filesPerPartition: Int = 1): Unit =
    batch
      .withColumn("date_month", date_format(col("date"), "yyyy-MM"))
      .repartition(filesPerPartition, col("date_month"), pmod(col("asset_id"), lit(filesPerPartition)))
      // partition column first — see [[write]]
      .sortWithinPartitions(col("date_month"), col("asset_id"), col("date"), col("ts"), col("seq"))
      .write
      .mode("append")
      .partitionBy("date_month")
      .parquet(path)

  /** D9 — streaming ingestion into the store: each micro-batch appends
    * month-partitioned key-sorted files ([[append]]), making the store
    * the continuously-maintained system of record; background
    * [[compact]] folds the accumulated revisions. Exactly-once note:
    * parquet append is at-least-once under retries — duplicate rows
    * carry identical (asset, date, ts, seq), so LWW reads are
    * unaffected and compaction collapses them.
    */
  def streamingSink(ticks: DataFrame, path: String,
                    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    ticks.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => append(batch, path) }
      .start()

  /** Compact only the months whose file count exceeds `maxFiles` — the
    * policy loop an operator of a continuously-appended store runs
    * (e.g. after [[streamingSink]] micro-batches accumulate): list the
    * month directories (metadata-only), compact the offenders
    * month-by-month via [[compact]]'s swap. Returns the compacted
    * month names.
    */
  def compactIfNeeded(spark: SparkSession, path: String,
                      maxFiles: Int = 16,
                      deletes: Option[DataFrame] = None,
                      filesPerPartition: Int = 4): Seq[String] = {
    // SESSION conf (not sparkContext.hadoopConfiguration): runtime
    // fs.* overrides must reach metadata ops like the data path does
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val months = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("date_month="))
      .filter { st =>
        fs.listStatus(st.getPath).count(_.getPath.getName.endsWith(".parquet")) > maxFiles
      }
      .map(_.getPath.getName.stripPrefix("date_month="))
      .toSeq
    if (months.nonEmpty)
      compact(spark, path, months = Some(months), deletes = deletes,
        filesPerPartition = filesPerPartition)
    months
  }

  /** A16 — retention vacuum: drop every month partition strictly older
    * than `keepFromMonth` (`yyyy-MM`). Metadata-only — directory
    * deletes, no data read or rewritten, so retiring a year from a
    * 100 TB store costs twelve renames regardless of store size (the
    * same directory-granular operation [[compact]]'s swap uses).
    * Returns the dropped month names. The reference's B-tree has no
    * retention story at all (files only grow); month partitioning is
    * what makes TTL enforcement free here.
    */
  def vacuum(spark: SparkSession, path: String, keepFromMonth: String): Seq[String] = {
    require(keepFromMonth.matches("\\d{4}-\\d{2}"), s"expected yyyy-MM, got $keepFromMonth")
    // SESSION conf (not sparkContext.hadoopConfiguration): runtime
    // fs.* overrides must reach metadata ops like the data path does
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val dropped = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("date_month="))
      .map(st => st.getPath.getName.stripPrefix("date_month="))
      // yyyy-MM sorts lexicographically = chronologically
      .filter(_ < keepFromMonth)
      .sorted
      .toSeq
    dropped.foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(path, s"date_month=$m"), true)
    }
    dropped
  }

  /** Date-range scan with the month partition predicate derived from the
    * range — the inner-node traversal analog: directories outside
    * [from, to] months are never opened (`PartitionFilters` in the
    * plan), then row-group stats narrow within each month.
    */
  def scan(spark: SparkSession, path: String, fromDate: String, toDate: String): DataFrame =
    read(spark, path)
      .filter(col("date_month").between(fromDate.substring(0, 7), toDate.substring(0, 7)) &&
        col("date").between(lit(fromDate).cast("date"), lit(toDate).cast("date")))

  /** A17 — store health view, METADATA-ONLY (FS listing; zero data
    * read): per-month file count, bytes, and mean file size, plus a
    * small-file flag. This is the dashboard an LSM-ish store needs to
    * schedule [[compact]]: streaming ingestion (`streamingSink`
    * appends per micro-batch) accretes small files per month until a
    * compaction rewrites them at `filesPerPartition`. O(months ·
    * files) driver-side listing, independent of row count — usable on
    * a 100 TB store exactly because it never opens a file.
    */
  def stats(spark: SparkSession, path: String,
            smallFileBytes: Long = 32L * 1024 * 1024): DataFrame = {
    // SESSION conf (not sparkContext.hadoopConfiguration): runtime
    // fs.* overrides must reach metadata ops like the data path does
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val rows = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("date_month="))
      .map { dir =>
        val files = fs.listStatus(dir.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        val bytes = files.map(_.getLen).sum
        (dir.getPath.getName.stripPrefix("date_month="),
          files.length.toLong, bytes,
          if (files.nonEmpty) bytes / files.length else 0L)
      }
      .sortBy(_._1)
      .toSeq
    import spark.implicits._
    rows.toDF("date_month", "n_files", "total_bytes", "mean_file_bytes")
      .withColumn("needs_compaction",
        col("n_files") > 0 && col("mean_file_bytes") < smallFileBytes)
  }
}
