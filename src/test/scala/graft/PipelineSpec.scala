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
