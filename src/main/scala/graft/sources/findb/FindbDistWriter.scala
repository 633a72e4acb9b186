package graft.sources.findb

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Distributed bulk writer for the reference's on-disk B-tree format —
  * the cluster-scale analog of `write_from_iterator` (reference
  * file.rs:296). [[FindbWriter.write]] re-expresses that bulk load only
  * at driver-memory scale (it takes a `Seq`); this writer takes a
  * DataFrame of any size and produces the same single-file format.
  *
  * Plan shape:
  *
  *  1. ONE range shuffle globally key-sorts the panel
  *     (`repartitionByRange` + `sortWithinPartitions` on
  *     (asset_id, date, timestamp)): partition p's keys are strictly
  *     below partition p+1's.
  *  2. A metadata pass collects only P row counts to the driver; the
  *     range shuffle's map output is reused by the write pass, so this
  *     costs one scan and no second shuffle. Page layout is then PURE
  *     ARITHMETIC: partition p's subtree — its leaf run plus its local
  *     inner levels — occupies exactly [[subtreePages]](rows_p) pages,
  *     so every partition knows its absolute page base and its
  *     predecessor's last leaf page number before writing a byte.
  *  3. Each partition streams its leaf pages (backward-chained ACROSS
  *     partition boundaries through the precomputed predecessor) and
  *     builds its local inner levels, all with final absolute page
  *     numbers, into its own part file. Executor memory is O(rows/cap)
  *     — one first-key per leaf page — never the rows themselves.
  *  4. Assembly. Single-file mode byte-concatenates the part files
  *     (already absolute-addressed: a pure stream copy with zero
  *     pointer fixup) and appends a small top tree over the P
  *     partition roots — kept for byte-level interop with reference
  *     readers, but O(store bytes) through the driver. DIRECTORY mode
  *     (`directoryParts = true`) skips the copy entirely: parts stay
  *     in place, the driver adds only the `top` tree file
  *     (O(P / cap) pages) and the 12-byte `_header` — metadata-only
  *     assembly on every filesystem, the shape that holds at 100 TB.
  *
  * Partition subtrees may differ in height by one (ragged row counts);
  * the format encodes page_type per page, not a global height, so
  * descent (reference file.rs:425-470) and the backward leaf chain
  * (file.rs:346-348) are unaffected. Every page-count identity the
  * driver's arithmetic predicts is re-asserted by the executors while
  * writing — a mismatch fails the job before a corrupt file can be
  * published.
  */
object FindbDistWriter {
  import FindbFormat._

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** Leaf pages for a partition of `rows` entries. */
  def leafPages(rows: Long, cap: Int): Long =
    if (rows <= 0) 0L else ceilDiv(rows, cap)

  /** Total pages in one partition's subtree: its leaves plus its local
    * inner levels (each level groups cap+1 children per parent).
    */
  def subtreePages(rows: Long, cap: Int): Long =
    if (rows <= 0) 0L
    else {
      var n = ceilDiv(rows, cap)
      var total = n
      while (n > 1) { n = ceilDiv(n, cap + 1); total += n }
      total
    }

  /** Pages in a tree built OVER `children` already-built subtrees
    * (the driver's top tree).
    */
  def topTreePages(children: Long, cap: Int): Long =
    if (children <= 1) 0L
    else {
      var n = children
      var total = 0L
      while (n > 1) { n = ceilDiv(n, cap + 1); total += n }
      total
    }

  /** Writes `df` as a findb store at `path`. Columns must be
    * castable to (asset_id long, date int, timestamp long, value
    * float); asset_id/date/timestamp must fit u32 (checked per row,
    * reference file.rs:21-25 keys are u32×3).
    *
    * `directoryParts = false` (default) produces the reference's
    * single `.db` file — assembly streams every part's bytes through
    * the driver, an O(store bytes) step kept only for byte-level
    * interop with reference readers. `directoryParts = true` produces
    * a DIRECTORY store ([[FindbFormat.layout]]): the executors' part
    * files stay where they were written and the driver adds only the
    * 12-byte `_header` and the O(P/cap)-page `top` tree — assembly is
    * METADATA-ONLY on every filesystem, independent of store bytes.
    * This is the 100 TB shape; the A10 reader accepts both.
    */
  def write(df: DataFrame, path: String, pageSize: Int,
            numPartitions: Int, directoryParts: Boolean = false): Unit = {
    val cap = keyCapacity(pageSize)
    require(cap >= 2, s"page size $pageSize too small")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(
        col("asset_id").cast("long").as("asset_id"),
        col("date").cast("int").as("date"),
        col("timestamp").cast("long").as("timestamp"),
        col("value").cast("float").as("value"))
      .repartitionByRange(numPartitions, col("asset_id"), col("date"), col("timestamp"))
      .sortWithinPartitions(col("asset_id"), col("date"), col("timestamp"))
      .as[(Long, Int, Long, Float)]
    // One RDD object for both passes: the second job reuses the first's
    // shuffle files, so the sort runs once and both passes see the
    // identical partitioning.
    val rdd = sorted.rdd
    val numParts = rdd.getNumPartitions

    // pass 1 — row counts only (P longs to the driver)
    val counts: Array[Long] = {
      val byIdx = rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, {
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
        })))
        .collect().toMap
      Array.tabulate(numParts)(byIdx.getOrElse(_, 0L))
    }
    require(counts.sum > 0, "findb distributed write requires a non-empty dataset")

    // absolute layout, from arithmetic alone
    val pagesPer = counts.map(subtreePages(_, cap))
    val bases = pagesPer.scanLeft(0L)(_ + _) // base_p = bases(p)
    val totalDataPages = bases(numParts)
    // predecessor's last leaf page (the backward-chain target of each
    // partition's first leaf): nearest preceding non-empty partition
    val prevLastLeaf = new Array[Long](numParts)
    var last = NoPage
    var p = 0
    while (p < numParts) {
      prevLastLeaf(p) = last
      if (counts(p) > 0) last = bases(p) + leafPages(counts(p), cap) - 1
      p += 1
    }
    val meta: Array[(Long, Long, Long)] =
      Array.tabulate(numParts)(i => (counts(i), bases(i), prevLastLeaf(i)))

    // pass 2 — every partition writes its absolute-addressed subtree.
    // Directory mode: parts land directly in the final store directory.
    val partDir =
      if (directoryParts) path.stripSuffix("/")
      else path.stripSuffix("/") + "__parts"
    // SESSION Hadoop conf everywhere (driver assembly AND the executor
    // part writers, via one broadcast): spark.hadoop.* credentials and
    // fs.<scheme>.impl bindings must see the same filesystem on every
    // side — a bare `new Configuration()` in the write closure would
    // land part files on a different FS view than the driver publishes
    // the header to.
    val sessionConf = spark.sessionState.newHadoopConf()
    val bcConf = spark.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(sessionConf))
    if (directoryParts) {
      val dir = new HPath(partDir)
      val fs0 = dir.getFileSystem(sessionConf)
      fs0.delete(dir, true)
      fs0.mkdirs(dir)
    }
    val results: Array[(Int, (Long, Int, Long), Long)] = rdd
      .mapPartitionsWithIndex { (idx, it) =>
        val (expRows, base, prevLeaf) = meta(idx)
        if (expRows == 0L) {
          require(!it.hasNext, s"partition $idx: counted 0 rows but write pass saw data")
          Iterator.empty
        } else {
          val file = new HPath(f"$partDir/part-$idx%05d")
          val fs = file.getFileSystem(bcConf.value.value)
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(fs.create(file, true), 1 << 20))
          try {
            val pageBuf = new Array[Byte](pageSize)
            def writePage(pageType: Long, numKeys: Int, extra: Long)(fill: Array[Byte] => Unit): Unit = {
              java.util.Arrays.fill(pageBuf, 0.toByte)
              putU32(pageBuf, 0, pageType)
              putU32(pageBuf, 4, numKeys.toLong)
              putU32(pageBuf, 8, extra)
              fill(pageBuf)
              out.write(pageBuf)
            }
            // stream leaves: buffer at most one page of rows
            val chunk = new Array[(Long, Int, Long, Float)](cap)
            var inChunk = 0
            var rows = 0L
            var leafIdx = 0L
            val leafKeys = scala.collection.mutable.ArrayBuffer.empty[((Long, Int, Long), Long)]
            def flushLeaf(): Unit = {
              val extra = if (leafIdx == 0L) prevLeaf else base + leafIdx - 1
              val n = inChunk
              writePage(LeafType, n, extra) { buf =>
                var j = 0
                while (j < n) {
                  val (a, d, t, v) = chunk(j)
                  val off = PageHeaderSize + j * KeyValueSize
                  putU32(buf, off, a); putU32(buf, off + 4, d.toLong)
                  putU32(buf, off + 8, t); putF32(buf, off + 12, v)
                  j += 1
                }
              }
              val (a, d, t, _) = chunk(0)
              leafKeys += (((a, d, t), base + leafIdx))
              leafIdx += 1
              inChunk = 0
            }
            it.foreach { case e @ (a, d, t, _) =>
              require(a >= 0 && a <= 0xFFFFFFFFL, s"asset_id $a outside u32")
              require(d >= 0, s"date $d outside u32")
              require(t >= 0 && t <= 0xFFFFFFFFL, s"timestamp $t outside u32")
              chunk(inChunk) = e
              inChunk += 1
              rows += 1
              if (inChunk == cap) flushLeaf()
            }
            if (inChunk > 0) flushLeaf()
            require(rows == expRows,
              s"partition $idx row drift: counted $expRows, write pass saw $rows")
            val (root, innerPages) = writeInnerLevels(cap, leafKeys.toIndexedSeq,
              base + leafIdx, (pt, nk, ex, fill) => writePage(pt, nk, ex)(fill))
            require(leafIdx + innerPages == subtreePages(expRows, cap),
              s"partition $idx layout drift: wrote ${leafIdx + innerPages} pages, " +
                s"arithmetic said ${subtreePages(expRows, cap)}")
            Iterator.single((idx, leafKeys.head._1, root))
          } finally out.close()
        }
      }
      .collect()

    // driver assembly: header + part-file concatenation + top tree
    val children: IndexedSeq[((Long, Int, Long), Long)] =
      results.sortBy(_._1).map { case (_, firstKey, root) => (firstKey, root) }.toIndexedSeq
    val topPages = topTreePages(children.size.toLong, cap)
    val totalPages = totalDataPages + topPages
    require(totalPages <= 0xFFFFFFFFL, s"page count $totalPages outside u32")
    val root =
      if (children.size == 1) children.head._2 else totalDataPages + topPages - 1
    val target = new HPath(path)
    val fs = target.getFileSystem(sessionConf)
    if (directoryParts) {
      // metadata-only assembly: the part files ARE the store. Driver
      // writes the O(P/cap)-page top tree and the 12-byte header —
      // cost independent of store bytes on every filesystem.
      if (children.size > 1) {
        val tout = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          fs.create(new HPath(s"$partDir/$DirTopFile"), true), 1 << 20))
        try {
          val pageBuf = new Array[Byte](pageSize)
          val (topRoot, written) = writeInnerLevels(cap, children, totalDataPages,
            (pt, nk, ex, fill) => {
              java.util.Arrays.fill(pageBuf, 0.toByte)
              putU32(pageBuf, 0, pt); putU32(pageBuf, 4, nk.toLong); putU32(pageBuf, 8, ex)
              fill(pageBuf)
              tout.write(pageBuf)
            })
          require(topRoot == root && written == topPages,
            s"top tree drift: root $topRoot/$root pages $written/$topPages")
        } finally tout.close()
      }
      val hout = fs.create(new HPath(s"$partDir/$DirHeaderFile"), true)
      try {
        hout.writeInt(pageSize)
        hout.writeInt((totalPages & 0xFFFFFFFFL).toInt)
        hout.writeInt((root & 0xFFFFFFFFL).toInt)
      } finally hout.close()
      return
    }
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(target, true), 1 << 20))
    try {
      out.writeInt(pageSize)
      out.writeInt((totalPages & 0xFFFFFFFFL).toInt)
      out.writeInt((root & 0xFFFFFFFFL).toInt)
      val copyBuf = new Array[Byte](1 << 20)
      results.sortBy(_._1).foreach { case (idx, _, _) =>
        val in = fs.open(new HPath(f"$partDir/part-$idx%05d"))
        try {
          var copied = 0L
          var n = in.read(copyBuf)
          while (n >= 0) {
            if (n > 0) { out.write(copyBuf, 0, n); copied += n }
            n = in.read(copyBuf)
          }
          require(copied == pagesPer(idx) * pageSize.toLong,
            s"part $idx byte drift: $copied vs ${pagesPer(idx) * pageSize.toLong}")
        } finally in.close()
      }
      if (children.size > 1) {
        val pageBuf = new Array[Byte](pageSize)
        val (topRoot, written) = writeInnerLevels(cap, children, totalDataPages,
          (pt, nk, ex, fill) => {
            java.util.Arrays.fill(pageBuf, 0.toByte)
            putU32(pageBuf, 0, pt); putU32(pageBuf, 4, nk.toLong); putU32(pageBuf, 8, ex)
            fill(pageBuf)
            out.write(pageBuf)
          })
        require(topRoot == root && written == topPages,
          s"top tree drift: root $topRoot/$root pages $written/$topPages")
      }
    } finally out.close()
    fs.delete(new HPath(partDir), true)
  }

  /** A22 `findb_merge` — distributed merge-compaction of reference
    * stores: union N `.db` files read through the A10 connector,
    * resolve composite-key collisions by INPUT PRIORITY (later input
    * wins — the restatement-store convention: inputs(1) is "the
    * correction file"), and bulk-rewrite through [[write]]. The
    * reference can only rebuild a store through its single-process
    * iterator (file.rs:296); this is the same maintenance operation
    * as one shuffle + one range-sorted rewrite at cluster scale.
    * Within-input duplicate keys are the caller's contract to avoid
    * (the reference's B-tree key is unique by construction).
    */
  def merge(spark: org.apache.spark.sql.SparkSession, inputs: Seq[String],
            out: String, pageSize: Int, numPartitions: Int,
            directoryParts: Boolean = false): Unit =
    write(mergedView(spark, inputs), out, pageSize, numPartitions, directoryParts)

  /** D187 `stream_findb_sink` — STREAMING ingestion into the
    * reference's own storage format, which the reference cannot do at
    * all (`write_from_iterator`, file.rs:296, is offline bulk). Each
    * micro-batch bulk-writes ONE epoch-keyed directory store
    * `batch-%06d.dbd` under `path` through [[write]] — one range
    * shuffle + metadata-only assembly per trigger, and idempotent
    * under foreachBatch's at-least-once replay because the epoch's
    * store is overwritten whole (same epoch → same path → same
    * bytes). [[compactSink]] is the maintenance loop: every batch
    * store through the single-scan [[merge]] with EPOCH ORDER as
    * input priority, so a later batch's restatement of a composite
    * key wins — streaming last-write-wins materialized at rest in
    * `.db` page format.
    *
    * Crash safety rides [[write]]'s ordering: `_header` lands LAST,
    * so it is the epoch store's commit record — a write killed
    * mid-epoch leaves a store that FAILS to resolve
    * ([[FindbFormat.layout]] can't open `_header`) instead of one
    * that silently reads partial pages; the checkpoint replays the
    * epoch and the rewrite overwrites the torn store whole. Epochs
    * are zero-padded to 12 digits so lexicographic listing order
    * stays epoch order for any realistic stream lifetime.
    */
  def streamingSink(rows: DataFrame, path: String, checkpoint: String,
                    pageSize: Int, numPartitions: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        if (!batch.isEmpty)
          write(batch, f"${path.stripSuffix("/")}/batch-$epoch%012d.dbd",
            pageSize, numPartitions, directoryParts = true)
      }
      .start()

  /** The sink's batch stores in epoch order (= [[merge]] input
    * priority order). Metadata-only listing.
    */
  def batchStores(spark: org.apache.spark.sql.SparkSession, path: String): Seq[String] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch-"))
      .map(_.getPath.toString).sorted.toSeq
  }

  /** A24 `findb_sink_soak` health view — per-epoch store vitals over
    * the sink's ingest directory, the `tickstore_stats` analog for the
    * findb sink: epoch, part-file count, data/top pages (from
    * `_header`), and bytes. METADATA-ONLY (one listing per store plus
    * its 12-byte header) — no data pages are read, so the health scan
    * costs O(epochs) regardless of store bytes. The maintenance signal
    * is the row count itself: epochs accrete one store each, and read
    * amplification grows with store count until [[compactSink]] folds
    * them — flat post-compaction cost is asserted by the soak spec.
    */
  def sinkStats(spark: org.apache.spark.sql.SparkSession, path: String)
      : org.apache.spark.sql.DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val rows = batchStores(spark, path).map { store =>
      val name = new HPath(store).getName
      val epoch = name.stripPrefix("batch-").stripSuffix(".dbd").toLong
      val lay = FindbFormat.layout(store, conf)
      val fs = new HPath(store).getFileSystem(conf)
      val sts = fs.listStatus(new HPath(store))
      val partFiles = sts.count(_.getPath.getName.startsWith(FindbFormat.DirPartPrefix))
      val bytes = sts.map(_.getLen).sum
      (epoch, partFiles, lay.pageCount, bytes)
    }
    spark.createDataFrame(rows)
      .toDF("epoch", "n_parts", "n_pages", "n_bytes")
  }

  /** Compacts every batch store the sink has landed into one merged
    * store at `out` (epoch-priority LWW). Returns the inputs merged.
    *
    * `base`: an earlier compaction's output to fold in at the LOWEST
    * priority — the rolling-compaction loop shape: compact, `prune`
    * the folded epoch stores, keep ingesting, compact again with the
    * previous output as base. Store count (and so read cost) stays
    * O(epochs since last compaction) instead of O(stream lifetime).
    * `prune = true` deletes the merged batch stores (never `base`)
    * after the new store is fully published.
    *
    * Crash recovery is "run the same compaction again", and with
    * `prune` that is safe across EVERY window, not just
    * crash-before-any-delete: a crash partway through the delete loop
    * leaves rows whose only copy is the already-published `out` (their
    * epoch stores are gone), so a naive re-merge of base + the
    * REMAINING stores would overwrite `out` without them — silent data
    * loss (r12 ADVICE #1). The pruning protocol therefore records its
    * commit point: after `out` is published and BEFORE any delete, a
    * `<out>.pruned` marker lands carrying the max epoch-store name
    * folded so far. A re-run that finds the marker beside a resolvable
    * `out` FOLDS it forward — `out` is staged aside as `<out>.prev`
    * (one atomic rename; [[merge]] clears `out` before scanning),
    * epoch stores at or below the marker are dropped (their fold IS
    * the stage, at the right LWW priority), and stores ABOVE the
    * marker (epochs that landed since) merge on top. A crash during
    * the recovery merge leaves `<out>.prev` intact and the next run
    * resumes from it; a torn `out` holds nothing `.prev` + stores
    * don't. Without the marker (no prune ever began) the old
    * overwrite-from-scratch semantics are unchanged.
    */
  def compactSink(spark: org.apache.spark.sql.SparkSession, path: String,
                  out: String, pageSize: Int, numPartitions: Int,
                  base: Option[String] = None, prune: Boolean = false): Seq[String] = {
    require(!base.contains(out),
      "compactSink: base must differ from out (the write clears out " +
        "before the merge scan reads base)")
    val conf = spark.sessionState.newHadoopConf()
    val outP = new HPath(out)
    val prevP = new HPath(out + ".prev")
    val markP = pruneMarkerPath(out)
    val ofs = outP.getFileSystem(conf)
    def resolves(p: HPath): Boolean =
      try { FindbFormat.layout(p.toString, conf); true }
      catch { case scala.util.control.NonFatal(_) => false }
    val markerFold: Option[String] =
      if (!ofs.exists(markP)) None
      else {
        val in = ofs.open(markP)
        val buf = try {
          val b = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, b, 4096, false); b
        } finally in.close()
        Some(new String(buf.toByteArray, "UTF-8").trim)
      }
    val staged: Option[String] = markerFold match {
      case None => None // no prune ever began: plain overwrite semantics
      case Some(_) =>
        if (ofs.exists(prevP) && resolves(prevP)) {
          // an earlier recovery crashed mid-merge: resume from its stage
          // (the torn `out`, if any, is cleared by merge's write)
          Some(prevP.toString)
        } else if (ofs.exists(outP) && resolves(outP)) {
          if (ofs.exists(prevP)) ofs.delete(prevP, true) // torn old stage
          require(ofs.rename(outP, prevP),
            s"compactSink: staging $out -> $out.prev failed")
          Some(prevP.toString)
        } else throw new IllegalStateException(
          s"compactSink: $markP records a prune into $out but neither " +
            s"$out nor $out.prev resolves — the folded epochs' rows are " +
            "unrecoverable from this path; restore a copy of the output " +
            "store before re-running")
    }
    val stores = batchStores(spark, path)
    // stores ≤ the marker are already folded into the stage (at the
    // correct priority — newer epochs must still beat it, older are
    // subsumed); only epochs that landed after the recorded fold merge
    // on top of it.
    val live = markerFold match {
      case Some(m) if staged.isDefined =>
        stores.filter(s => new HPath(s).getName > m)
      case _ => stores
    }
    merge(spark, base.toSeq ++ staged.toSeq ++ live, out, pageSize,
      numPartitions, directoryParts = true)
    if (ofs.exists(prevP)) ofs.delete(prevP, true)
    if (prune) {
      // commit point: record the fold BEFORE any delete, so a crash in
      // the delete loop below replays as a fold-forward, never as a
      // lossy re-merge
      val folded = stores.map(new HPath(_).getName) ++ markerFold
      if (folded.nonEmpty) {
        val mo = ofs.create(markP, true)
        try mo.write(folded.max.getBytes("UTF-8")) finally mo.close()
      }
      val fs = new HPath(path).getFileSystem(conf)
      stores.foreach(s => fs.delete(new HPath(s), true))
    }
    stores
  }

  /** The `<out>.pruned` commit marker of [[compactSink]]'s pruning
    * protocol: its presence means a prune into `out` began; its
    * content is the max epoch-store name folded into `out` so far.
    */
  private[graft] def pruneMarkerPath(out: String) = new HPath(out + ".pruned")

  /** The merge read: ALL input stores through ONE planned scan (the
    * connector's path list becomes one [[FindbScan]] whose partition
    * set is the union of per-store leaf partitions) with the opt-in
    * `pri` column carrying each row's store index, so input-priority
    * LWW needs no per-store sub-plans and no N-way union node.
    * Exposed for the plan-audit spec.
    */
  private[graft] def mergedView(spark: org.apache.spark.sql.SparkSession,
                                inputs: Seq[String]): DataFrame = {
    require(inputs.nonEmpty, "merge needs at least one input store")
    import org.apache.spark.sql.functions.row_number
    val u = spark.read.format("graft.sources.findb.FindbDataSource")
      .option("withPriority", "true")
      .load(inputs: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("asset_id"), col("date"), col("timestamp"))
      .orderBy(col("pri").desc)
    u.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "pri")
  }
}
