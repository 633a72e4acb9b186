package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipeline, Quantize}

/** The full training-data build, composed end to end over real
  * testdata: filter → exact dedup → decontaminate → near-dup screen →
  * split/pack → hashed-vector retrieval. Each stage is individually
  * oracle-checked by the driver; this spec asserts the COMPOSITION
  * holds (stages chain on each other's outputs, monotone corpus
  * shrinkage, no stage drops schema invariants) — the "could a user
  * actually run their pipeline on this engine" check.
  */
class PipelineEndToEndSpec extends SparkSpec {

  test("corpus build pipeline composes over sf0.001 documents") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val n0 = docs.count()
    assert(n0 > 0)

    // 1. quality/language filter (emits survivor ids + scores; text
    // rejoins from the source table, the at-rest pattern)
    val cleanIds = Pipeline.corpusFilter(docs).select("doc_id")
    val clean = docs.join(cleanIds, Seq("doc_id")).select("doc_id", "text")
    val n1 = clean.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. decontaminate against a held-out eval set
    val decon = Dedup.decontaminate(clean, (0L to 4L).toSeq)
    val contaminated = decon.collect().map(_.getAs[Long]("doc_id")).toSet
    val stage2 = clean.filter(!col("doc_id").isin(contaminated.toSeq: _*))
    val n2 = stage2.count()
    assert(n2 <= n1)

    // 3. near-dup screen via the incremental index path: index the kept
    // corpus, probe it with itself minus self-matches is the batch path;
    // here use pairwise LSH and drop the higher id of each pair
    val pairs = Dedup.minhashLshPairs(stage2.select("doc_id", "text")).collect()
    val drop = pairs.map(_.getAs[Long]("doc_b")).toSet
    val stage3 = stage2.filter(!col("doc_id").isin(drop.toSeq: _*))
    val n3 = stage3.count()
    assert(n3 <= n2 && n3 > 0)

    // 4. deterministic split + token packing on the final corpus
    val split = Pipeline.sampleSplit(stage3)
    assert(split.count() === n3)
    assert(split.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))
    val packed = Pipeline.docPack(stage3)
    assert(packed.count() === n3)
    // packs partition the corpus: every doc exactly once, pack ids dense per shard
    assert(packed.select("doc_id").distinct().count() === n3)

    // 5. hashed-vector retrieval over the final corpus: every doc's
    // nearest neighbor by int8 MIPS is itself excluded, ranks are 1..k
    val dense = Pipeline.densify(Pipeline.hashEmbed(stage3.select("doc_id", "text")))
    val someId = dense.select("vec_id").orderBy("vec_id").first().getLong(0)
    val top = Quantize.quantizedTopK(dense, Seq(someId), 3).collect()
    assert(top.nonEmpty && top.forall(_.getAs[Long]("vec_id") != someId))
    assert(top.map(_.getAs[Long]("rank")).toSeq === (1L to top.length).toSeq)

    // 6. sub-document pass + LM-quality gate on the deduped corpus:
    // chunk-dedup rewrites survive with ≥ 0 chunks, lm_score gates the
    // most templatic tail (score is all-integer → a stable threshold)
    val rewritten = Pipeline.chunkDedup(stage3.select("doc_id", "text"))
    assert(rewritten.count() <= n3) // token-less docs may drop, none appear twice
    assert(rewritten.select("doc_id").distinct().count() === rewritten.count())
    val lm = Pipeline.lmScore(stage3.select("doc_id", "text"))
    val cut = lm.agg(expr("percentile_approx(lm_ppm, 0.9)")).first().getLong(0)
    val gated = stage3.join(lm.filter(col("lm_ppm") <= cut).select("doc_id"), Seq("doc_id"))
    assert(gated.count() > 0 && gated.count() <= n3)

    // 7. mixture spec over the gated corpus: resample sources to target
    // shares; the sample is a subset and a pure function of doc_id
    val withMeta = docs.select("doc_id", "source", "lang")
      .join(gated.select("doc_id"), Seq("doc_id"))
    val srcs = withMeta.select("source").distinct().limit(2)
      .collect().map(_.getString(0))
    val mix = Pipeline.mixtureSample(
      withMeta.withColumn("text", lit("")).select("doc_id", "text", "lang", "source"),
      srcs.map(_ -> 200).toMap)
    assert(mix.count() <= withMeta.count())
    assert(mix.select("source").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(srcs.toSet))

    // 8. semantic screen on the corpus embeddings: the SemDeDup pass
    // composes on the same hashed vectors the retrieval stage built
    val sem = graft.operators.Ivf.semanticDedup(dense, k = 4, iters = 2, eps = 0.95)
    assert(sem.count() === dense.count())           // every vector gets a verdict
    assert(sem.filter(col("kept")).count() > 0)     // never empties the corpus
  }
}
