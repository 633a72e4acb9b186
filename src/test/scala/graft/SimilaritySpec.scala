package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim toy embeddings (stored float, math in double)
  private lazy val emb: DataFrame = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),  // near 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(1.0f, 0.0f, 0.0f, 0.0f)))   // identical to 0
    .toDF("vec_id", "embedding")

  test("dot kernel computes the exact dot product") {
    val d = emb.filter($"vec_id" === 0)
      .select(Similarity.dot(
        Similarity.toDouble($"embedding"), Similarity.toDouble($"embedding")))
      .collect()(0).getDouble(0)
    assert(d === 1.0)
  }

  test("cosine top-k ranks identical > near > orthogonal > opposite") {
    val out = Similarity.cosineTopK(emb, Seq(0L), 4)
      .select("vec_id", "cos").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq === Seq(4L, 1L, 2L, 3L))
    assert(out(0)._2 === 1.0)
    assert(out(3)._2 === -1.0)
  }

  test("near-dup pairs above threshold include (0,4) and (0,1) but not orthogonals") {
    val pairs = Similarity.embeddingNearDupPairs(emb, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("lshVerifiedNearDupPairs is a subset of exact pairs with identical cosines") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = graft.operators.Similarity.embeddingNearDupPairs(emb, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = graft.operators.Similarity.lshVerifiedNearDupPairs(emb, 0.4, planes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision 1: every LSH-verified pair is an exact pair with the same cosine
    lsh.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"$pair not in exact set")
      assert(exact(pair) === cos)
    }
    // recall: with 8 bands of 2 bits the S-curve should catch most true pairs
    assert(lsh.size >= exact.size / 2, s"recall too low: ${lsh.size}/${exact.size}")
  }

  test("LSH buckets: identical vectors share a bucket, opposite vectors never do") {
    val b = Similarity.lshBuckets(emb, dim = 4, planes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) === b(4L))
    assert(b(0L) !== b(3L)) // all 8 sign bits flip for -v
  }

  test("LSH top-k finds the identical neighbor within its bucket") {
    val out = Similarity.lshTopK(emb, dim = 4, planes = 2, k = 3)
      .filter($"q_id" === 0).select("vec_id").collect().map(_.getLong(0))
    assert(out.contains(4L))
  }

  test("labelCentroids computes per-label per-dim mean and variance") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f), 1), (1L, Array(3.0f, 0.0f), 1), // label 1: mean (2, 0), var (1, 0)
      (2L, Array(5.0f, 5.0f), 2))                             // label 2: mean (5, 5), var (0, 0)
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(labeled).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out((1, 0)) === ((2L, 2.0, 1.0)))
    assert(out((1, 1)) === ((2L, 0.0, 0.0)))
    assert(out((2, 0)) === ((1L, 5.0, 0.0)))
    assert(out((2, 1)) === ((1L, 5.0, 0.0)))
  }
}
