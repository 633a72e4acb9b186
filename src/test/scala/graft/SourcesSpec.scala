package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.{FinCsv, TickStore}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("FinCsv reads headerless tick csv and applies the reference conversions") {
    val dir = Files.createTempDirectory("fincsv").toFile
    val f = new java.io.File(dir, "ticks.csv")
    // reference scripts/convert-datetimes.py input shape: ISO date + ISO ts
    Files.writeString(f.toPath,
      "1,2020-10-01,2020-10-01T12:00:00,100.5\n2,2020-10-02,2020-10-02T13:30:00,200.25\n")
    val df = FinCsv.read(spark, f.getAbsolutePath)
    assert(df.count() === 2)
    val ints = FinCsv.toIntKeys(df).orderBy("asset_id").collect()
    assert(ints(0).getAs[Int]("date_int") === 20201001)
    assert(ints(1).getAs[Int]("date_int") === 20201002)
    assert(ints(0).getAs[Double]("value") === 100.5)
  }

  test("FinCsv seq follows file position: last same-key row wins LWW (reference insert order)") {
    val dir = Files.createTempDirectory("fincsv2").toFile
    val f = new java.io.File(dir, "ticks.csv")
    // two corrections for the SAME (asset, date, ts) with different
    // values — the reference's sequential upsert keeps the LAST one
    Files.writeString(f.toPath,
      "1,2020-10-01,2020-10-01T12:00:00,100.5\n" +
        "1,2020-10-01,2020-10-01T12:00:00,999.9\n" +
        "2,2020-10-01,2020-10-01T12:00:00,5.0\n")
    val df = FinCsv.read(spark, f.getAbsolutePath)
    // seq is monotone in file position
    val inFileOrder = df.filter(col("asset_id") === 1L).orderBy(col("seq"))
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(inFileOrder === Seq(100.5, 999.9))
    val lww = graft.operators.KeyValue.upsertLww(df)
    val winner = lww.filter(col("asset_id") === 1L).collect()
    assert(winner.length === 1 && winner(0).getAs[Double]("value") === 999.9)
    // and it is stable across partition layouts
    val seqs = (1 to 2).map { _ =>
      FinCsv.read(spark, f.getAbsolutePath).orderBy("seq").select("value")
        .collect().map(_.getDouble(0)).toSeq
    }
    assert(seqs(0) === seqs(1))
  }

  test("CSV-to-TickStore ingestion pipeline (convert-csv.sh end to end)") {
    val dir = Files.createTempDirectory("ingest").toFile
    Files.writeString(new java.io.File(dir, "t.csv").toPath,
      "1,2020-10-01,2020-10-01T12:00:00,100.5\n1,2020-11-02,2020-11-02T13:30:00,200.25\n")
    val store = dir.getAbsolutePath + "/store"
    FinCsv.ingestToTickStore(spark, dir.getAbsolutePath + "/t.csv", store)
    val back = TickStore.read(spark, store)
    assert(back.count() === 2)
    val months = new java.io.File(store).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(months.toSeq === Seq("date_month=2020-10", "date_month=2020-11"))
  }

  test("TickStore round-trips the panel through month-partitioned sorted parquet") {
    val panel = Tables.panel(spark, "/root/testdata/sf0.001")
    val path = Files.createTempDirectory("tickstore").toString + "/store"
    TickStore.write(panel, path)
    val back = TickStore.read(spark, path)
    assert(back.count() === panel.count())
    // partition directories exist (hive-style month pruning)
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("date_month=2024-01")))
    // pruned point query matches the unpartitioned path
    val a = KeyCount(back, 7L)
    val b = KeyCount(panel, 7L)
    assert(a === b)
  }

  private def KeyCount(df: org.apache.spark.sql.DataFrame, asset: Long): Long =
    df.filter(col("asset_id") === asset).count()

  test("TickStore.compact LWW-compacts and deletes within the named months only") {
    import java.sql.{Date, Timestamp}
    val panel = Seq(
      // asset 1, 2020-01: two revisions (LWW keeps ts=20 → 2.0)
      (1L, "2020-01-10", 10, 1.0, 1L), (1L, "2020-01-10", 20, 2.0, 2L),
      // asset 2, 2020-01: to be deleted
      (2L, "2020-01-15", 30, 3.0, 3L),
      // asset 1, 2020-02: two revisions, month NOT compacted → both stay
      (1L, "2020-02-05", 40, 4.0, 4L), (1L, "2020-02-05", 50, 5.0, 5L))
      .map { case (a, d, t, v, q) => (a, Date.valueOf(d), new Timestamp(t * 1000L), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val path = java.nio.file.Files.createTempDirectory("tickstore3").toString + "/store"
    TickStore.write(panel, path)
    val dels = Seq((2L, Date.valueOf("2020-01-15"))).toDF("asset_id", "date")

    TickStore.compact(spark, path, months = Some(Seq("2020-01")), deletes = Some(dels))

    val back = TickStore.read(spark, path)
    val jan = back.filter(col("date_month") === "2020-01").collect()
    assert(jan.length === 1) // one survivor: latest revision of asset 1, deletes gone
    assert(jan(0).getAs[Long]("asset_id") === 1L && jan(0).getAs[Double]("value") === 2.0)
    // untouched month keeps its revision history
    assert(back.filter(col("date_month") === "2020-02").count() === 2)
    // no leftover staging directory
    assert(!new java.io.File(path.stripSuffix("/") + "__compacting").exists())
  }

  test("TickStore.compact removes a month whose rows are all deleted (empty-month swap)") {
    import java.sql.{Date, Timestamp}
    val panel = Seq(
      // 2020-01 has ONLY asset 2 — deleting it must empty the month
      (2L, "2020-01-15", 30, 3.0, 3L),
      (1L, "2020-02-05", 40, 4.0, 4L))
      .map { case (a, d, t, v, q) => (a, Date.valueOf(d), new Timestamp(t * 1000L), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val path = java.nio.file.Files.createTempDirectory("tickstore4").toString + "/store"
    TickStore.write(panel, path)
    val dels = Seq((2L, Date.valueOf("2020-01-15"))).toDF("asset_id", "date")

    TickStore.compact(spark, path, months = Some(Seq("2020-01")), deletes = Some(dels))

    // the deleted rows must NOT survive via a stale month directory
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(!dirs.contains("date_month=2020-01"), dirs.toString)
    val back = TickStore.read(spark, path)
    assert(back.count() === 1)
    assert(back.collect()(0).getAs[Long]("asset_id") === 1L)

    // unscoped compact (months=None) with a delete emptying a month also swaps it out
    val path2 = java.nio.file.Files.createTempDirectory("tickstore5").toString + "/store"
    TickStore.write(panel, path2)
    TickStore.compact(spark, path2, months = None, deletes = Some(dels))
    val dirs2 = new java.io.File(path2).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(!dirs2.contains("date_month=2020-01"), dirs2.toString)
    assert(TickStore.read(spark, path2).count() === 1)
  }

  test("as-of query over TickStore prunes month partitions and matches the raw panel") {
    import java.sql.{Date, Timestamp}
    // multi-month panel (reference test_small's date spread)
    val panel = Seq(
      (0L, "2020-01-31", 10, 1.0, 1L), (0L, "2020-02-29", 20, 2.0, 2L),
      (0L, "2020-03-31", 30, 3.0, 3L), (1L, "2020-04-30", 40, 4.0, 4L))
      .map { case (a, d, t, v, q) =>
        (a, Date.valueOf(d), new Timestamp(t * 1000L), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val path = java.nio.file.Files.createTempDirectory("tickstore2").toString + "/store"
    graft.sources.TickStore.write(panel, path)
    val store = graft.sources.TickStore.read(spark, path)

    val fromStore = graft.operators.AsOf
      .asOfRange(store, 0L, "2020-01-01", "2020-02-29", "2020-03-01 00:00:00")
      .select("date", "value").collect().map(r => (r.getDate(0).toString, r.getDouble(1)))
    val fromPanel = graft.operators.AsOf
      .asOfRange(panel, 0L, "2020-01-01", "2020-02-29", "2020-03-01 00:00:00")
      .select("date", "value").collect().map(r => (r.getDate(0).toString, r.getDouble(1)))
    assert(fromStore.toSeq === fromPanel.toSeq)
    assert(fromStore.toSeq === Seq(("2020-02-29", 2.0), ("2020-01-31", 1.0)))

    // partition pruning is visible in the plan when scanning a date
    // range (the B-tree inner-node traversal analog)
    val pruned = graft.sources.TickStore.scan(spark, path, "2020-02-01", "2020-02-29")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("date_month"))
    assert(pruned.count() === 1)

    // DeriveMonthPartitionFilter: a date-only filter gains the month
    // partition predicate automatically
    spark.experimental.extraOptimizations =
      Seq(graft.plans.DeriveMonthPartitionFilter)
    try {
      val auto = store.filter(
        col("date") >= lit("2020-02-01").cast("date") &&
          col("date") <= lit("2020-02-29").cast("date"))
      val pfLine = auto.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("PartitionFilters")).mkString
      // the derived month bound must be INSIDE the partition filter list
      assert(pfLine.matches(""".*PartitionFilters: \[[^\]]*date_month[^\]]*2020-02[^\]]*\].*"""), pfLine)
      assert(auto.count() === 1)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("streaming sink appends micro-batches into the TickStore layout") {
    import java.sql.{Date, Timestamp}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("tsink").toString
    val input = MemoryStream[(Long, Date, Timestamp, Double, Long)]
    val ticks = input.toDS().toDF("asset_id", "date", "ts", "value", "seq")
    val q = TickStore.streamingSink(ticks, dir + "/store", dir + "/ckpt")
    try {
      input.addData((1L, Date.valueOf("2020-01-10"), new Timestamp(10000L), 1.0, 1L))
      q.processAllAvailable()
      input.addData(
        (1L, Date.valueOf("2020-01-10"), new Timestamp(20000L), 2.0, 2L), // revision
        (2L, Date.valueOf("2020-02-05"), new Timestamp(30000L), 3.0, 3L)) // new month
      q.processAllAvailable()
      val back = TickStore.read(spark, dir + "/store")
      assert(back.count() === 3)
      // LWW over the appended revisions picks the newest
      val lww = graft.operators.KeyValue.upsertLww(back)
        .filter(col("asset_id") === 1L).collect()
      assert(lww.length === 1 && lww(0).getAs[Double]("value") === 2.0)
      // both month directories exist (streaming writes stay partitioned)
      val months = new java.io.File(dir + "/store").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(months.toSeq === Seq("date_month=2020-01", "date_month=2020-02"))
      // compaction folds the revision history at rest
      TickStore.compact(spark, dir + "/store")
      assert(TickStore.read(spark, dir + "/store").count() === 2)
    } finally q.stop()
  }

  test("compactIfNeeded compacts only months whose file count exceeds the threshold") {
    import java.sql.{Date, Timestamp}
    val path = Files.createTempDirectory("autocompact").toString + "/store"
    // month 2020-01 accumulates 4 appends (4+ files); 2020-02 one file
    (1 to 4).foreach { i =>
      TickStore.append(Seq((1L, Date.valueOf("2020-01-10"), new Timestamp(i * 1000L), i * 1.0, i.toLong))
        .toDF("asset_id", "date", "ts", "value", "seq"), path)
    }
    TickStore.append(Seq((2L, Date.valueOf("2020-02-05"), new Timestamp(9000L), 9.0, 9L))
      .toDF("asset_id", "date", "ts", "value", "seq"), path)
    val compacted = TickStore.compactIfNeeded(spark, path, maxFiles = 2)
    assert(compacted === Seq("2020-01"))
    // revisions folded to the LWW winner; untouched month intact
    val back = TickStore.read(spark, path)
    val jan = back.filter(col("date_month") === "2020-01").collect()
    assert(jan.length === 1 && jan(0).getAs[Double]("value") === 4.0)
    assert(back.filter(col("date_month") === "2020-02").count() === 1)
    // below threshold now → no-op
    assert(TickStore.compactIfNeeded(spark, path, maxFiles = 2) === Seq.empty)
  }

  test("JSONL corpus round-trips and quarantines corrupt lines") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
    val dir = Files.createTempDirectory("jsonl").toString
    graft.sources.CorpusJsonl.write(docs.select("doc_id", "text", "lang", "source"), dir + "/corpus")
    val back = graft.sources.CorpusJsonl.clean(
      graft.sources.CorpusJsonl.read(spark, dir + "/corpus"))
    assert(back.count() === 20)
    val a = docs.select("doc_id", "text").orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = back.select("doc_id", "text").orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq === b.toSeq)
    // corrupt line lands in quarantine, not as a job failure
    val f = new java.io.File(dir + "/mixed.jsonl")
    Files.writeString(f.toPath,
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s"}
        |this is not json
        |""".stripMargin)
    val mixed = graft.sources.CorpusJsonl.read(spark, f.getAbsolutePath)
    assert(graft.sources.CorpusJsonl.clean(mixed).count() === 1)
    assert(graft.sources.CorpusJsonl.corruptRecords(mixed).count() === 1)
  }

  test("month-scoped scan reads ONLY the target month's files (numFiles metric)") {
    import java.sql.{Date, Timestamp}
    // 3 months × 2 files each
    val panel = (1 to 6).map { i =>
      (i.toLong, Date.valueOf(f"2020-0${i % 3 + 1}-10"), new Timestamp(i * 1000L), i * 1.0, i.toLong)
    }.toDF("asset_id", "date", "ts", "value", "seq")
    val path = Files.createTempDirectory("prune").toString + "/store"
    TickStore.write(panel, path, filesPerPartition = 2)
    val allFiles = TickStore.read(spark, path)
    allFiles.collect()
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metrics("numFiles").value
      }.sum
    }
    val total = filesRead(TickStore.read(spark, path))
    val pruned = filesRead(TickStore.scan(spark, path, "2020-02-01", "2020-02-28"))
    assert(total > pruned, s"total=$total pruned=$pruned")
    // exactly the one month's file count — directory-level elimination
    val feb = new java.io.File(path, "date_month=2020-02").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(pruned === feb.toLong, s"pruned=$pruned feb=$feb")
  }

  test("multimodal decoder parses real container headers byte-for-byte") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val media = Multimodal.mediaFromDocuments(docs)
    val feats1 = Multimodal.decodePipeline(media, partitions = 4).collect().sortBy(_.media_id)
    val feats2 = Multimodal.decodePipeline(media, partitions = 2).collect().sortBy(_.media_id)
    assert(feats1.length === 50)
    assert(feats1.toSeq === feats2.toSeq) // partition-count invariant

    // parsed-from-bytes metadata must equal the write-time formulas
    feats1.foreach { f =>
      f.kind match {
        case "image" =>
          assert(f.width === Multimodal.imageWidth(f.media_id), s"width of ${f.media_id}")
          assert(f.height === Multimodal.imageHeight(f.media_id))
          assert(f.n_frames === 1 && f.sample_rate === 0)
        case "audio" =>
          assert(f.sample_rate === Multimodal.audioSampleRate(f.media_id))
          assert(f.channels === Multimodal.audioChannels(f.media_id))
          assert(f.width === 0 && f.n_frames === 0)
          val byteRate = f.sample_rate.toLong * f.channels * 2
          val dataBytes = f.n_bytes - Multimodal.WavOverhead
          assert(f.duration_ms === dataBytes * 1000L / byteRate)
        case "video" =>
          assert(f.n_frames === Multimodal.videoPacks(f.media_id), s"packs of ${f.media_id}")
          assert(f.width === 0 && f.sample_rate === 0)
      }
    }

    // resize stage: images only (WAVE/PS headers carry no frame dims),
    // aspect-preserving fit into 256×256, never upscaling
    val decoded = Multimodal.decodePipeline(media, partitions = 4)
    val resized = Multimodal.resize(decoded, 256, 256).collect()
    assert(resized.length === feats1.count(_.kind == "image"))
    resized.foreach { r =>
      assert(r.kind === "image")
      assert(r.target_w <= 256 && r.target_h <= 256 && r.target_w >= 1 && r.target_h >= 1)
      assert(r.target_w <= r.width && r.target_h <= r.height) // no upscale
      assert(r.scale_micro <= 1000000L)
      // aspect preserved up to integer floor
      val s = r.scale_micro / 1e6
      assert(math.abs(r.target_w - math.floor(r.width * s)) <= 1)
    }
    // already-small media keeps its dims (scale 1)
    resized.filter(r => r.width <= 256 && r.height <= 256).foreach { r =>
      assert(r.target_w === r.width && r.target_h === r.height && r.scale_micro === 1000000L)
    }

    // frame-sample stage: ceil(n_frames/N) refs per video, 1 per image,
    // none for audio (no frame concept)
    val frames = Multimodal.frameSample(decoded, everyN = 10).collect()
    val byId = frames.groupBy(_.media_id)
    feats1.foreach { f =>
      val expected = f.kind match {
        case "video" => (f.n_frames + 9) / 10
        case "image" => 1
        case _       => 0
      }
      assert(byId.get(f.media_id).map(_.length).getOrElse(0) === expected, s"media ${f.media_id}")
      if (expected > 0)
        assert(byId(f.media_id).map(_.frame_idx).min === 0) // frame 0 always sampled
    }
  }

  test("header parsers are strict: corrupt headers fail loudly") {
    import Multimodal.HeaderDecoder
    val png = Multimodal.pngPayload(42L, "hello".getBytes("UTF-8"))
    assert(HeaderDecoder.parsePng(png) === (Multimodal.imageWidth(42L), Multimodal.imageHeight(42L)))
    // flip a width byte: CRC-32 over IHDR must catch it
    val corrupt = png.clone(); corrupt(17) = (corrupt(17) ^ 0x1).toByte
    intercept[IllegalArgumentException](HeaderDecoder.parsePng(corrupt))

    val wav = Multimodal.wavPayload(43L, "abcdefgh".getBytes("UTF-8"))
    val (rate, ch, _) = HeaderDecoder.parseWav(wav)
    assert(rate === Multimodal.audioSampleRate(43L) && ch === Multimodal.audioChannels(43L))
    // truncated RIFF rejects
    intercept[IllegalArgumentException](HeaderDecoder.parseWav(wav.take(20)))

    val mpeg = Multimodal.mpegPayload(44L, "x".getBytes("UTF-8") ++ Array.fill(100)('y'.toByte))
    assert(HeaderDecoder.countPacks(mpeg) === Multimodal.videoPacks(44L))
    // a payload with no pack start code rejects
    intercept[IllegalArgumentException](HeaderDecoder.countPacks(Array.fill(64)(0x20.toByte)))
  }

  test("media table round-trips a genuine BINARY payload through parquet") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(30)
    val path = Files.createTempDirectory("media").toString + "/media"
    Multimodal.writeMediaTable(docs, path)

    val back = spark.read.parquet(path)
    // at rest: a real binary column, not a string
    assert(back.schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)
    // every payload opens with its modality's magic (non-UTF8 container
    // signatures) and carries header + content bytes
    val rows = back.collect()
    assert(rows.length === 30)
    rows.foreach { r =>
      val kind = r.getAs[String]("kind")
      val payload = r.getAs[Array[Byte]]("payload")
      assert(payload.take(4).toSeq === Multimodal.Magic(kind).toSeq, s"magic for $kind")
      assert(r.getAs[Long]("n_bytes") === payload.length.toLong)
    }
    // the decode pipeline runs off the parquet-read table unchanged
    val spark0 = spark
    import spark0.implicits._
    val feats = Multimodal.decodePipeline(back.as[Multimodal.MediaRecord], 2).collect()
    assert(feats.length === 30)
  }

  test("TickStore.vacuum drops only months older than the retention cutoff") {
    import java.sql.{Date, Timestamp}
    val panel = Seq(
      (1L, "2019-11-10", 10, 1.0, 1L),
      (1L, "2019-12-10", 20, 2.0, 2L),
      (1L, "2020-01-10", 30, 3.0, 3L),
      (2L, "2020-02-15", 40, 4.0, 4L))
      .map { case (a, d, t, v, q) => (a, Date.valueOf(d), new Timestamp(t * 1000L), v, q) }
      .toDF("asset_id", "date", "ts", "value", "seq")
    val path = java.nio.file.Files.createTempDirectory("tickstore_vac").toString + "/store"
    TickStore.write(panel, path)

    val dropped = TickStore.vacuum(spark, path, keepFromMonth = "2020-01")
    assert(dropped === Seq("2019-11", "2019-12"))

    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("date_month=2020-01", "date_month=2020-02"))
    // survivors read back intact; vacuumed rows are gone
    val back = TickStore.read(spark, path).collect()
    assert(back.length === 2)
    assert(back.map(_.getAs[Double]("value")).toSet === Set(3.0, 4.0))

    // idempotent: second vacuum drops nothing
    assert(TickStore.vacuum(spark, path, "2020-01") === Seq.empty)
    // malformed cutoff rejected before any deletion
    intercept[IllegalArgumentException] { TickStore.vacuum(spark, path, "2020/01") }
  }

  test("TickStore.stats reports per-month file metadata; compaction clears the flag") {
    val panel = Tables.panel(spark, "/root/testdata/sf0.001")
    val path = Files.createTempDirectory("tsstats").toString + "/store"
    TickStore.write(panel, path)
    // accrete small files the way streaming ingestion does
    (1 to 3).foreach { _ =>
      panel.limit(50).withColumn("date_month", date_format(col("date"), "yyyy-MM"))
        .coalesce(1).write.mode("append").partitionBy("date_month").parquet(path)
    }
    val before = TickStore.stats(spark, path).collect()
    assert(before.nonEmpty)
    val jan = before.find(_.getString(0) == "2024-01").get
    assert(jan.getAs[Long]("n_files") >= 4L)      // 4 bulk + 3 appended
    assert(jan.getAs[Long]("total_bytes") > 0L)
    assert(jan.getAs[Boolean]("needs_compaction")) // tiny files ≪ 32 MiB default
    TickStore.compact(spark, path)
    val after = TickStore.stats(spark, path).collect()
      .find(_.getString(0) == "2024-01").get
    assert(after.getAs[Long]("n_files") < jan.getAs[Long]("n_files"))
    // data intact, tight threshold clears the flag
    assert(TickStore.read(spark, path).count() > 0)
    assert(!TickStore.stats(spark, path, smallFileBytes = 1L)
      .filter(col("needs_compaction")).collect().exists(_.getString(0) == "2024-01"))
  }
}
