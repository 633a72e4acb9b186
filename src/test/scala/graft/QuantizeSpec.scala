package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Quantize, Similarity}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb: DataFrame = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),   // near 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),    // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),   // opposite of 0
    (4L, Array(0.5f, 0.0f, 0.0f, 0.0f)),    // same direction as 0, half magnitude
    (5L, Array(0.0f, 0.0f, 0.0f, 0.0f)))    // zero vector
    .toDF("vec_id", "embedding")

  test("codes are bounded by ±127 and the max-abs element hits ±127") {
    val rows = Quantize.quantize(emb).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    rows.foreach { case (_, q) => assert(q.forall(c => c >= -127 && c <= 127)) }
    // every nonzero vector's largest-|x| element quantizes to exactly ±127
    rows.filter(_._1 != 5L).foreach { case (id, q) =>
      assert(q.exists(c => math.abs(c) == 127L), s"vec $id: $q")
    }
  }

  test("zero vector quantizes to all-zero codes, not null/error") {
    val q = Quantize.quantize(emb).filter($"vec_id" === 5L)
      .collect()(0).getSeq[Long](1)
    assert(q.forall(_ == 0L))
  }

  test("scale invariance: codes depend on direction only") {
    val a = Quantize.quantize(emb.filter($"vec_id" === 0L)).collect()(0).getSeq[Long](1)
    val b = Quantize.quantize(emb.filter($"vec_id" === 4L)).collect()(0).getSeq[Long](1)
    assert(a === b)
  }

  test("quantized top-k ranks by integer inner product with deterministic ties") {
    val out = Quantize.quantizedTopK(emb, Seq(0L), 5)
      .select("vec_id", "idot").collect().map(r => (r.getLong(0), r.getLong(1)))
    // codes of 0 are (127,0,0,0): dots are 1·127²=16129 for vec 1's first
    // component 127... vec 1 quantizes to (127, 13, 0, 0) → dot 16129;
    // vec 4 (127,0,0,0) → 16129; tie breaks on vec_id: 1 before 4.
    assert(out.head._1 === 1L)
    assert(out(1)._1 === 4L)
    assert(out.head._2 === out(1)._2)
    // orthogonal scores 0, opposite scores -16129, zero vector scores 0
    val byId = out.toMap
    assert(byId(2L) === 0L)
    assert(byId(3L) === -16129L)
  }

  test("reconstruction error is bounded by scale/254 (+1 micro rounding)") {
    val stats = Quantize.quantizeStats(emb).collect()
    stats.foreach { r =>
      val scaleMicro = r.getLong(1)
      val maxErrMicro = r.getLong(3)
      assert(maxErrMicro <= scaleMicro / 254 + 1,
        s"vec ${r.getLong(0)}: err $maxErrMicro vs scale $scaleMicro")
    }
  }

  test("stats are exact for a hand-computed vector") {
    // v = (1, 0, 0, 0): scale 1, codes (127,0,0,0), qnorm 127²,
    // reconstruction exact → err 0
    val r = Quantize.quantizeStats(emb).filter($"vec_id" === 0L).collect()(0)
    assert(r.getLong(1) === 1000000L)
    assert(r.getLong(2) === 16129L)
    assert(r.getLong(3) === 0L)
  }

  test("model-free retrieval: hash_embed → densify → int8 ANN finds the near-dup") {
    val docs = Seq(
      (0L, "spark shuffles partitions across the cluster during wide transformations"),
      (1L, "spark shuffles partitions across the cluster during wide transformations indeed"),
      (2L, "cats enjoy sleeping on warm windowsills in the afternoon sun"),
      (3L, "parquet row groups carry min max statistics for predicate pushdown"))
      .toDF("doc_id", "text")
    val dense = graft.operators.Pipeline.densify(
      graft.operators.Pipeline.hashEmbed(docs), dim = 64)
    // densified output plugs into the vector stack unchanged
    val top = Quantize.quantizedTopK(dense, Seq(0L), 1).collect()(0)
    assert(top.getAs[Long]("vec_id") === 1L) // the near-dup wins rank 1
    val cosTop = Similarity.cosineTopK(dense, Seq(0L), 1).collect()(0)
    assert(cosTop.getAs[Long]("vec_id") === 1L) // float path agrees
  }

  test("quantized ranking agrees with float cosine ranking on well-separated vectors") {
    // On the unit-ish toy set (distinct directions, no near-ties except
    // the engineered one) the int8 MIPS order must match cosine order
    // for the clear cases: near > orthogonal > opposite.
    val cosRank = Similarity.cosineTopK(emb.filter($"vec_id" =!= 5L), Seq(0L), 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val qRank = Quantize.quantizedTopK(emb.filter($"vec_id" =!= 5L), Seq(0L), 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // cosine: 4 ties with 1? cos(0,4)=1.0 > cos(0,1)≈0.995 → (4,1,2,3)
    // quantized MIPS isn't magnitude-invariant on the query side but IS
    // on codes; both agree orthogonal(2) precedes opposite(3).
    assert(cosRank.indexOf(2L) < cosRank.indexOf(3L))
    assert(qRank.indexOf(2L) < qRank.indexOf(3L))
  }
}
