package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.sources.SerializableHadoopConf
import graft.sources.findb.{FindbDistWriter, FindbFormat}

/** Round-13 hardening (r12 ADVICE): compactSink's crash-mid-prune
  * recovery folds the published output forward instead of losing the
  * already-deleted epochs' rows, and SerializableHadoopConf survives
  * KryoSerializer (whose path bypasses Java writeObject hooks).
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def readStore(path: String): DataFrame =
    spark.read.format("graft.sources.findb.FindbDataSource")
      .option("pagesPerPartition", 8).load(path)

  private def rows(df: DataFrame): Seq[(Long, Int, Long, Float)] =
    df.orderBy("asset_id", "date", "timestamp").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getFloat(3))).toSeq

  private def land(ingest: String, e: Int): Unit = {
    // epoch e restates the same composite keys with value = e (the
    // Round12OpsSpec convention) — LWW must keep the LAST epoch's rows
    val df = (0 until 200).map { i =>
      (i.toLong % 5, 20240101 + (i % 28), i.toLong, e.toFloat)
    }.toDF("asset_id", "date", "timestamp", "value")
    FindbDistWriter.write(df, f"$ingest/batch-$e%012d.dbd",
      pageSize = 256, numPartitions = 2, directoryParts = true)
  }

  test("compactSink recovery after a crash MID-prune loses no rows") {
    // The r12 ADVICE window: compaction published `out` and the prune
    // deleted SOME epoch stores before dying. The deleted epochs' rows
    // exist only in `out`; re-running the same compaction must fold
    // them forward, not overwrite `out` from the remaining stores.
    val root = Files.createTempDirectory("soak_midprune").toString
    val ingest = s"$root/ingest"
    (0 until 4).foreach(land(ingest, _))
    val full = rows(readStore(s"$ingest/batch-000000000003.dbd")) // epoch-3 LWW view
    // "crashed" pruning compaction: out published, the `.pruned` commit
    // marker written (the state right past compactSink's commit point),
    // then the delete loop got through epochs 2 and 3 (the LWW
    // winners!) before dying
    FindbDistWriter.compactSink(spark, ingest, s"$root/c.dbd",
      pageSize = 256, numPartitions = 4, prune = false)
    val published = rows(readStore(s"$root/c.dbd"))
    assert(published === full) // epoch 3 wins everywhere
    val fs0 = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val mo = fs0.create(FindbDistWriter.pruneMarkerPath(s"$root/c.dbd"), true)
    try mo.write("batch-000000000003.dbd".getBytes("UTF-8")) finally mo.close()
    Seq(2, 3).foreach { e =>
      val p = new org.apache.hadoop.fs.Path(f"$ingest/batch-$e%012d.dbd")
      assert(fs0.delete(p, true))
    }
    // recovery = the SAME compaction again (same out), completing prune
    FindbDistWriter.compactSink(spark, ingest, s"$root/c.dbd",
      pageSize = 256, numPartitions = 4, prune = true)
    assert(rows(readStore(s"$root/c.dbd")) === published) // nothing lost
    assert(FindbDistWriter.batchStores(spark, ingest).isEmpty)
    // the recovery stage is cleaned up after publish
    assert(!new java.io.File(s"$root/c.dbd.prev").exists())
    // and a crash mid-RECOVERY-merge is itself recoverable: stage left
    // behind (simulated), out torn (simulated by dropping _header) —
    // the next run resumes from the stage
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/c.dbd"),
      new org.apache.hadoop.fs.Path(s"$root/c.dbd.prev")))
    FindbDistWriter.compactSink(spark, ingest, s"$root/c.dbd",
      pageSize = 256, numPartitions = 4, prune = true)
    assert(rows(readStore(s"$root/c.dbd")) === published)
    assert(!new java.io.File(s"$root/c.dbd.prev").exists())
  }

  test("compactSink base-fold after a clean prune still matches LWW") {
    // the normal rolling loop must be unchanged by the recovery logic
    val root = Files.createTempDirectory("soak_roll13").toString
    val ingest = s"$root/ingest"
    (0 until 2).foreach(land(ingest, _))
    FindbDistWriter.compactSink(spark, ingest, s"$root/rolling.dbd",
      pageSize = 256, numPartitions = 4, prune = true)
    (2 until 4).foreach(land(ingest, _))
    FindbDistWriter.compactSink(spark, ingest, s"$root/final.dbd",
      pageSize = 256, numPartitions = 4,
      base = Some(s"$root/rolling.dbd"), prune = true)
    val got = rows(readStore(s"$root/final.dbd"))
    assert(got.nonEmpty && got.forall(_._4 === 3f)) // last epoch wins
  }

  test("SerializableHadoopConf survives Kryo (not just Java) serialization") {
    // KryoSerializer bypasses writeObject/readObject; the wrapper's
    // KryoSerializable implementation must carry the conf entries so a
    // kryo-serialized broadcast doesn't hand executors value = null.
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.graftfs.impl", "some.custom.Fs")
    conf.set("graft.test.key", "v13")
    val wrapped = new SerializableHadoopConf(conf)

    val kconf = new org.apache.spark.SparkConf(false)
    val kryoSer = new org.apache.spark.serializer.KryoSerializer(kconf).newInstance()
    val viaKryo = kryoSer.deserialize[SerializableHadoopConf](
      kryoSer.serialize(wrapped))
    assert(viaKryo.value.get("fs.graftfs.impl") === "some.custom.Fs")
    assert(viaKryo.value.get("graft.test.key") === "v13")

    val javaSer = new org.apache.spark.serializer.JavaSerializer(kconf).newInstance()
    val viaJava = javaSer.deserialize[SerializableHadoopConf](
      javaSer.serialize(wrapped))
    assert(viaJava.value.get("graft.test.key") === "v13")
  }

  test("layout rejects a single file claiming more pages than Int range") {
    // per-file page indices are Int internally; a >=2^31-page single
    // file must fail at plan time (layout), not wrap mid-read. The
    // directory branch enforces the same bound per part file.
    val dir = Files.createTempDirectory("findb_hugefile").toString
    val f = new java.io.File(dir, "huge.db")
    // header claims pageCount = 2^31; actual bytes don't matter because
    // the guard must fire before any page read
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
    try {
      out.writeInt(256)         // page_size (big-endian u32)
      out.writeInt(0x80000000)  // page_count = 2^31 as u32
      out.writeInt(0)           // root page
    } finally out.close()
    val e = intercept[IllegalArgumentException] { FindbFormat.layout(f.toString) }
    assert(e.getMessage.contains("page-index limit"))
  }
}
