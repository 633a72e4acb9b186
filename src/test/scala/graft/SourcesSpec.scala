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

  test("multimodal decode pipeline emits deterministic features per record") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val media = Multimodal.mediaFromDocuments(docs)
    val feats1 = Multimodal.decodePipeline(media, partitions = 4).collect().sortBy(_.media_id)
    val feats2 = Multimodal.decodePipeline(media, partitions = 2).collect().sortBy(_.media_id)
    assert(feats1.length === 50)
    assert(feats1.map(f => (f.media_id, f.checksum, f.width, f.height)).toSeq ===
      feats2.map(f => (f.media_id, f.checksum, f.width, f.height)).toSeq)
    assert(feats1.forall(f => f.width >= 1 && f.width <= 1920 && f.height >= 1 && f.height <= 1080))
    assert(feats1.filter(_.kind == "video").forall(_.n_frames >= 1))
  }
}
