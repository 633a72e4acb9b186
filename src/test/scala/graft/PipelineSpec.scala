package graft

import graft.operators.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val english =
    "the cat and the dog are in the house with all of it " * 3

  test("sampleSplit assigns deterministic hash buckets and splits") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Pipeline.sampleSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // deterministic: recompute expected buckets directly
    out.foreach { case (id, bucket, split) =>
      val expected = java.lang.Math.floorMod(id * 2654435761L, 100L)
      assert(bucket === expected)
      val expSplit = if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(split === expSplit)
    }
    // roughly 80/10/10 (hash spread, not exact)
    val counts = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(counts("train") > 140 && counts("test") > 5 && counts("val") > 5)
    // stability: a second run over a superset never reassigns old ids
    val more = (0L until 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val again = Pipeline.sampleSplit(more).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    out.foreach { case (id, _, split) => assert(again(id) === split) }
  }

  test("docPack cuts shard-local batches at the token budget") {
    val docs = Seq(
      (0L, "a b c"),       // 3 tokens
      (32L, "d e f g"),    // same shard as 0 (hash is mod-32 of id*const; 0 and 32 share id%32... verify via output)
      (1L, "h i j k l"))
      .toDF("doc_id", "text")
    val out = Pipeline.docPack(docs, budget = 5, shards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // every row: cum is a within-shard running sum in doc_id order;
    // pack boundary at every 5 cumulative tokens
    val byShard = out.groupBy(_._2)
    byShard.values.foreach { rows =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, c, p) =>
        cum += n
        assert(c === cum)
        assert(p === (math.max(cum, 1) - 1) / 5)
      }
    }
    // zero-token doc lands in a valid batch (no -1)
    val zo = Pipeline.docPack(Seq((7L, "   ")).toDF("doc_id", "text"), budget = 5).collect()(0)
    assert(zo.getAs[Long]("n_tokens") === 0L)
    assert(zo.getAs[Long]("pack_id") === 0L)
  }

  test("corpusFilter keeps high-quality english survivors, min-id per duplicate") {
    val docs = Seq(
      (1L, english),                 // keeper (duplicate group, min id)
      (2L, english),                 // exact dup of 1 → dropped
      (3L, "zzz qqq"),               // lang 'und' → dropped
      (4L, "el perro y la casa de los gatos para que " * 5), // spanish → dropped
      (5L, english + " extra tail")) // distinct english keeper
      .toDF("doc_id", "text")
    val out = Pipeline.corpusFilter(docs, minQuality = 0.1, lang = "en")
      .select("doc_id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 5L))
  }
}
