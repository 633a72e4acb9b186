package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.findb.{FindbDistWriter, FindbFormat}

/** Round-12 hardening: session-conf filesystem propagation (ADVICE
  * r11 #1), numeric part ordering (#3), and the sink soak's
  * maintenance-loop invariants (VERDICT item 6).
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def panel(n: Int): DataFrame =
    (0 until n).map { i =>
      (i.toLong % 5, 20240101 + (i % 28), i.toLong, (i * 0.5).toFloat)
    }.toDF("asset_id", "date", "timestamp", "value")

  private def readStore(path: String): DataFrame =
    spark.read.format("graft.sources.findb.FindbDataSource")
      .option("pagesPerPartition", 8).load(path)

  private def rows(df: DataFrame): Seq[(Long, Int, Long, Float)] =
    df.orderBy("asset_id", "date", "timestamp").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getFloat(3))).toSeq

  // ── session-conf filesystem propagation ────────────────────────────

  test("findb writer+reader resolve a session-conf-only filesystem scheme") {
    // graftfs is registered ONLY in the session conf (runtime
    // `spark.conf.set` of a raw hadoop key — the fs.s3a.* credential
    // convention; sessionState.newHadoopConf() copies session confs
    // verbatim): every part write (executors), the driver's assembly,
    // plan-time layout + descent, and every partition read must thread
    // that conf or die with "No FileSystem for scheme" — which is
    // exactly what the pre-r12 `new Configuration()` call sites did.
    spark.conf.set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    try {
      val dir = Files.createTempDirectory("graftfs_store").toString
      val alt = s"graftfs://$dir/store.dbd"
      val df = panel(600)
      FindbDistWriter.write(df, alt, pageSize = 256, numPartitions = 4,
        directoryParts = true)
      // the same bytes are visible to the local scheme — read both ways
      val viaAlt = rows(readStore(alt))
      val viaLocal = rows(readStore(s"$dir/store.dbd"))
      assert(viaAlt === viaLocal)
      assert(viaAlt.size === 600)
      // pruned read: plan-time descent (layout + StorePages) walks the
      // alternate FS too
      val pruned = rows(readStore(alt).where(col("asset_id") === 3L))
      assert(pruned === viaLocal.filter(_._1 == 3L))
      // single-file assembly streams part bytes through the driver on
      // the alternate FS as well
      val altFile = s"graftfs://$dir/store.db"
      FindbDistWriter.write(df, altFile, pageSize = 256, numPartitions = 4)
      assert(rows(readStore(altFile)) === viaLocal)
    } finally spark.conf.unset("fs.graftfs.impl")
  }

  // ── numeric part ordering (ADVICE #3) ──────────────────────────────

  test("directory-store parts order by numeric suffix, not name") {
    val dir = Files.createTempDirectory("findb_numsort").toString
    val store = s"$dir/store.dbd"
    FindbDistWriter.write(panel(400), store, pageSize = 256,
      numPartitions = 2, directoryParts = true)
    val before = rows(readStore(store))
    // part-100000 sorts lexicographically BEFORE part-99999; numeric
    // order must win or base pages mis-assign (pruned descents read
    // the wrong pages at >99999 partitions)
    val d = new java.io.File(store)
    assert(new java.io.File(d, "part-00000").renameTo(new java.io.File(d, "part-99999")))
    assert(new java.io.File(d, "part-00001").renameTo(new java.io.File(d, "part-100000")))
    val after = readStore(store)
    assert(rows(after) === before)
    // plan-time descent must land on the correct absolute pages too
    val pruned = rows(after.where(col("asset_id") === 2L))
    assert(pruned === before.filter(_._1 == 2L))
    // a non-numeric part name is a corrupt store: fail, don't misread
    assert(new java.io.File(d, "part-99999").renameTo(new java.io.File(d, "part-junk")))
    intercept[Exception] { FindbFormat.layout(store) }
  }

  // ── sink soak invariants (VERDICT item 6) ──────────────────────────

  /** Lands `epochs` batch stores the way the streaming sink does (one
    * epoch-keyed directory store each), every epoch restating the SAME
    * keys with value = epoch, then compacts and returns the compacted
    * store path. The rolling flag splits compaction in two
    * (compact+prune after the first half, then base-fold the rest) —
    * the production maintenance loop.
    */
  private def soak(epochs: Int, rolling: Boolean): String = {
    val root = Files.createTempDirectory(s"soak$epochs").toString
    val ingest = s"$root/ingest"
    def land(e: Int): Unit = {
      val df = (0 until 300).map { i =>
        (i.toLong % 5, 20240101 + (i % 28), i.toLong, e.toFloat)
      }.toDF("asset_id", "date", "timestamp", "value")
      FindbDistWriter.write(df, f"$ingest/batch-$e%012d.dbd",
        pageSize = 256, numPartitions = 2, directoryParts = true)
    }
    if (rolling) {
      (0 until epochs / 2).foreach(land)
      val st = FindbDistWriter.sinkStats(spark, ingest).collect()
      assert(st.length === epochs / 2)
      assert(st.forall(r => r.getAs[Int]("n_parts") === 2 &&
        r.getAs[Long]("n_pages") > 0 && r.getAs[Long]("n_bytes") > 0))
      FindbDistWriter.compactSink(spark, ingest, s"$root/rolling.dbd",
        pageSize = 256, numPartitions = 4, prune = true)
      assert(FindbDistWriter.batchStores(spark, ingest).isEmpty) // pruned
      (epochs / 2 until epochs).foreach(land)
      FindbDistWriter.compactSink(spark, ingest, s"$root/final.dbd",
        pageSize = 256, numPartitions = 4,
        base = Some(s"$root/rolling.dbd"), prune = true)
    } else {
      (0 until epochs).foreach(land)
      FindbDistWriter.compactSink(spark, ingest, s"$root/final.dbd",
        pageSize = 256, numPartitions = 4)
    }
    s"$root/final.dbd"
  }

  private def partFiles(store: String): Seq[String] =
    new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith(FindbFormat.DirPartPrefix)).sorted.toSeq

  test("compactSink prune is crash-safe: re-merge after a crash-before-prune is identical") {
    // crash window: the merged store is fully published but the prune
    // of the folded epoch stores never ran. The recovery contract is
    // simply "run the compaction again": LWW over (base ∪ the same
    // epoch stores) is idempotent, so the re-merge reproduces the
    // store byte-for-byte at the row level.
    val root = Files.createTempDirectory("soak_crash").toString
    val ingest = s"$root/ingest"
    (0 until 3).foreach { e =>
      val df = (0 until 200).map { i =>
        (i.toLong % 5, 20240101 + (i % 28), i.toLong, e.toFloat)
      }.toDF("asset_id", "date", "timestamp", "value")
      FindbDistWriter.write(df, f"$ingest/batch-$e%012d.dbd",
        pageSize = 256, numPartitions = 2, directoryParts = true)
    }
    // "crashed" compaction: published, epochs NOT pruned
    FindbDistWriter.compactSink(spark, ingest, s"$root/c.dbd",
      pageSize = 256, numPartitions = 4, prune = false)
    val crashed = rows(readStore(s"$root/c.dbd"))
    // recovery: the same compaction again, this time completing prune
    FindbDistWriter.compactSink(spark, ingest, s"$root/c2.dbd",
      pageSize = 256, numPartitions = 4, prune = true)
    assert(rows(readStore(s"$root/c2.dbd")) === crashed)
    assert(FindbDistWriter.batchStores(spark, ingest).isEmpty)
    assert(crashed.forall(_._4 === 2f)) // last epoch wins
  }

  // ── corpus-adaptive minhash banding (C151) ─────────────────────────

  test("deriveBandRows breakpoints and the scaled banding's recall floor") {
    import graft.operators.Dedup
    // one more hash per band roughly every ×4 of corpus, clamped [4, 8]
    assert(Dedup.deriveBandRows(1) === 4)
    assert(Dedup.deriveBandRows(500) === 4)     // 16 bands × 4 — the fixed default
    assert(Dedup.deriveBandRows(5000) === 6)    // 10 × 6
    assert(Dedup.deriveBandRows(50000) === 8)   // 8 × 8 (cap)
    assert(Dedup.deriveBandRows(1000000000L) === 8)
    // monotone non-decreasing across the whole range (a regression here
    // silently re-densifies candidates at some corpus size)
    val pts = Seq(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L).map(Dedup.deriveBandRows(_))
    assert(pts === pts.sorted)
    // recall floor at the MOST selective operating point (8×8): exact
    // duplicates have identical signatures and always collide
    val docs = ((0 until 6).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog")) ++
      (6 until 12).map(i => (i.toLong, s"unique filler text number $i with no twin anywhere")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, k = 8, nHashes = 64, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dupPairs = for (a <- 0L until 6L; b <- a + 1 until 6L) yield (a, b)
    assert(dupPairs.forall(pairs.contains))
    // the scaled entry point delegates to the derived operating point
    val viaScaled = Dedup.minhashLshPairsScaled(docs, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val r = Dedup.deriveBandRows(12)
    val viaDirect = Dedup.minhashLshPairs(docs, k = 8, nHashes = (64 / r) * r, bands = 64 / r)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSeq
    assert(viaScaled === viaDirect)
  }

  test("post-compaction layout is independent of epoch count; rolling loop ≡ one-shot") {
    val c4 = soak(4, rolling = false)
    val c12 = soak(12, rolling = true)
    // the soak claim: read cost of the compacted store does not grow
    // with stream lifetime — identical part layout and planned
    // partition count at 4 and 12 epochs
    assert(partFiles(c4) === partFiles(c12))
    assert(readStore(c4).rdd.getNumPartitions === readStore(c12).rdd.getNumPartitions)
    // epoch-priority LWW across BOTH compaction paths: every key's
    // value is the last epoch's, with the rolling base at lowest
    // priority (a base>newer inversion would surface as value < max)
    assert(rows(readStore(c4)).forall(_._4 === 3f))
    assert(rows(readStore(c12)).forall(_._4 === 11f))
    assert(rows(readStore(c12)).size === 300)
  }
}
