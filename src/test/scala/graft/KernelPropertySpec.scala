package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Property-style tests (seeded generators) for the kernel expressions. */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private def vec(n: Int): Array[Double] = Array.fill(n)(rnd.nextDouble() * 200 - 100)
  private def word(): String = Random.alphanumeric.take(3 + rnd.nextInt(6)).mkString

  test("dot kernel is symmetric and matches a scala fold (20 random pairs)") {
    (1 to 20).foreach { _ =>
      val (a, b) = (vec(8), vec(8))
      val row = Seq((a, b)).toDF("a", "b")
        .select(Similarity.dot($"a", $"b"), Similarity.dot($"b", $"a")).collect()(0)
      val expected = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      assert(row.getDouble(0) === row.getDouble(1))
      assert(row.getDouble(0) === expected)
    }
  }

  test("minhash signature: superset text only lowers per-seed minima") {
    (1 to 20).foreach { _ =>
      val s = (1 to 6).map(_ => word()).mkString(" ")
      val row = Seq((s, s + " " + word())).toDF("short", "long").select(
        graft.expressions.Kernels.minhashSig($"short", 4, 16),
        graft.expressions.Kernels.minhashSig($"long", 4, 16)).collect()(0)
      val sigShort = row.getSeq[Long](0)
      val sigLong = row.getSeq[Long](1)
      assert(sigShort.length === 16 && sigLong.length === 16)
      // long text contains every shingle of short (prefix) → minima can
      // only decrease
      assert(sigShort.zip(sigLong).forall { case (a, b) => b <= a })
    }
  }

  test("minhash signature agreement estimates jaccard within tolerance (hash-family quality)") {
    import org.apache.spark.sql.functions.col
    // construct pairs with known shingle-set jaccard by shared suffixes
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val mut = (1 to 60).map(i => if (i % 3 == 0) s"alt$i" else s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, mut)).toDF("doc_id", "text")
    val k = 8
    val sig = docs.select(col("doc_id"),
      graft.expressions.Kernels.minhashSig(col("text"), k, 256).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree = sig(1L).zip(sig(2L)).count { case (a, b) => a == b }.toDouble / 256
    // true shingle jaccard
    def sh(s: String) = s.sliding(k).toSet
    val (a, b) = (sh(base), sh(mut))
    val trueJ = (a & b).size.toDouble / (a | b).size
    assert(math.abs(agree - trueJ) < 0.12,
      s"minhash agreement $agree vs true jaccard $trueJ — hash family biased")
  }

  test("simhash is whitespace-layout invariant and case-insensitive") {
    (1 to 20).foreach { _ =>
      val words = (1 to 6).map(_ => word())
      val t1 = words.mkString(" ")
      val t2 = "  " + words.mkString("   ") + " "
      val t3 = t1.toUpperCase
      val row = Seq((t1, t2, t3)).toDF("a", "b", "c").select(
        graft.expressions.Kernels.simhash64($"a"),
        graft.expressions.Kernels.simhash64($"b"),
        graft.expressions.Kernels.simhash64($"c")).collect()(0)
      assert(row.getLong(0) === row.getLong(1))
      assert(row.getLong(0) === row.getLong(2))
    }
  }

  test("lsh bucket is scale-invariant (positive scalar) and flips for negation") {
    (1 to 20).foreach { _ =>
      val v = vec(16)
      val scaled = v.map(_ * 7.5)
      val neg = v.map(-_)
      val row = Seq((v, scaled, neg)).toDF("a", "b", "c").select(
        graft.expressions.Kernels.lshBucket($"a", 16),
        graft.expressions.Kernels.lshBucket($"b", 16),
        graft.expressions.Kernels.lshBucket($"c", 16)).collect()(0)
      assert(row.getLong(0) === row.getLong(1))
      assert(row.getLong(0) === (~row.getLong(2) & 0xFFFFL))
    }
  }
}
