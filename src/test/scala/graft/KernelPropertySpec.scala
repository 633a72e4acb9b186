package graft

import scala.util.Random

import org.apache.spark.sql.Column
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

  test("minhash-from-hashes equals minhash-from-text on random documents") {
    // the shared-pass identity the r8 minhash_verified rebuild rests on:
    // min over the DISTINCT shingle-hash set ≡ min over sliding windows
    (1 to 30).foreach { _ =>
      val s = (1 to (2 + rnd.nextInt(20))).map(_ => word()).mkString(" ")
      val row = Seq(Tuple1(s)).toDF("t").select(
        graft.expressions.Kernels.minhashSig($"t", 8, 64),
        graft.expressions.Kernels.minhashFromHashes(
          graft.expressions.Kernels.shingleHashSet($"t", 8), 64)).collect()(0)
      assert(row.getSeq[Long](0) === row.getSeq[Long](1))
    }
    // degenerate texts too: empty, shorter than k, whitespace
    for (s <- Seq("", "ab", "   ", "exactly8")) {
      val row = Seq(Tuple1(s)).toDF("t").select(
        graft.expressions.Kernels.minhashSig($"t", 8, 64),
        graft.expressions.Kernels.minhashFromHashes(
          graft.expressions.Kernels.shingleHashSet($"t", 8), 64)).collect()(0)
      assert(row.getSeq[Long](0) === row.getSeq[Long](1), s"text '$s'")
    }
  }

  test("sorted intersect count equals set intersection on random long sets") {
    (1 to 30).foreach { _ =>
      val a = Array.fill(1 + rnd.nextInt(50))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Array.fill(1 + rnd.nextInt(50))(rnd.nextInt(60).toLong).distinct.sorted
      val row = Seq((a, b)).toDF("a", "b").select(
        graft.expressions.Kernels.sortedIntersectCount($"a", $"b")).collect()(0)
      assert(row.getLong(0) === a.toSet.intersect(b.toSet).size.toLong)
    }
    // empty sides
    val z = Seq((Array.empty[Long], Array(1L, 2L))).toDF("a", "b").select(
      graft.expressions.Kernels.sortedIntersectCount($"a", $"b")).collect()(0)
    assert(z.getLong(0) === 0L)
  }

  test("shingle hash set is the distinct sorted window hashes") {
    (1 to 20).foreach { _ =>
      val s = (1 to (1 + rnd.nextInt(10))).map(_ => word()).mkString(" ")
      val got = Seq(Tuple1(s)).toDF("t").select(
        graft.expressions.Kernels.shingleHashSet($"t", 8)).collect()(0).getSeq[Long](0)
      val n = math.max(s.length - 7, 1)
      val want = (0 until n)
        .map(i => graft.expressions.PortableHash.strHash(s, i, math.min(i + 8, s.length)))
        .distinct.sorted
      assert(got === want)
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

  test("seq_fold matches the interpreted aggregate() HOF bit-for-bit, every op") {
    import graft.expressions.Kernels.seqFold
    val w = 13.0 / 14.0
    // HOF reference forms — exactly what the analytics used before the
    // compiled kernel. Bitwise equality (doubleToLongBits) is the
    // contract: the driver's hash compare sees the same bytes.
    val hof: Map[String, Column => Column] = Map(
      "sum" -> (a => aggregate(a, lit(0.0), (acc, x) => acc + x)),
      "sumsq" -> (a => aggregate(a, lit(0.0), (acc, x) => acc + x * x)),
      "sum3" -> (a => aggregate(a, lit(0.0), (acc, x) => acc + x * x * x)),
      "sum4" -> (a => aggregate(a, lit(0.0), (acc, x) => acc + x * x * x * x)),
      "horner" -> (a => aggregate(a, lit(0.0), (acc, x) => acc * lit(w) + x)),
      "horner_count" -> (a => aggregate(a, lit(0.0), (acc, _) => acc * lit(w) + lit(1.0))),
      "horner_pos" -> (a => aggregate(a, lit(0.0), (acc, x) => acc * lit(w) + greatest(x, lit(0.0)))),
      "horner_neg" -> (a => aggregate(a, lit(0.0), (acc, x) => acc * lit(w) + greatest(-x, lit(0.0)))),
      "prod1p" -> (a => aggregate(a, lit(1.0), (acc, x) => acc * (lit(1.0) + x))))
    val arrays = (0 to 25).map(i => Tuple1(vec(i * 5))) :+ Tuple1(Array.empty[Double])
    val df = arrays.toDF("arr")
    hof.foreach { case (op, ref) =>
      val rows = df.select(
        seqFold($"arr", op, w).as("kernel"), ref($"arr").as("hof")).collect()
      rows.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"op=$op")
      }
    }
  }

  test("seq_fold null contract: null element poisons x-ops, horner_count ignores x") {
    import graft.expressions.Kernels.seqFold
    val df = Seq(Tuple1(Seq[java.lang.Double](1.0, null, 3.0))).toDF("arr")
      .select(seqFold($"arr".cast("array<double>"), "sum").as("s"),
        seqFold($"arr".cast("array<double>"), "horner_count", 0.5).as("nw"))
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    // 3 weight steps at w=0.5: ((0·½+1)·½+1)·½+1 = 1.75, nulls included
    assert(r.getDouble(1) === 1.75)
  }

  test("winnow kernel matches the HOF rolling-hash composition (random ASCII docs)") {
    import graft.functions.TextFns
    (1 to 20).foreach { _ =>
      // length ≥ k+w-1 so both forms are in the full-window regime
      val text = (1 to (12 + rnd.nextInt(60))).map(_ => word()).mkString(" ")
      val row = Seq(text).toDF("text").select(
        TextFns.winnowing($"text", 8, 4), TextFns.winnowingHof($"text", 8, 4)).collect()(0)
      assert(row.getSeq[Long](0) === row.getSeq[Long](1), text)
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

  test("quantize kernel matches the scala reference and bounds reconstruction error (30 random vectors)") {
    (1 to 30).foreach { _ =>
      val v = vec(16)
      val q = Seq(Tuple1(v)).toDF("v")
        .select(graft.expressions.Kernels.quantizeInt8($"v")).collect()(0).getSeq[Long](0)
      val scale = v.map(math.abs).max
      val expected = v.map(x => math.floor(x * 127.0 / scale + 0.5).toLong)
      assert(q === expected.toSeq)
      assert(q.forall(c => c >= -127 && c <= 127))
      // dequantization error ≤ half a code step = scale/254
      v.zip(q).foreach { case (x, c) =>
        assert(math.abs(x - c * scale / 127.0) <= scale / 254.0 + 1e-12)
      }
      // scale invariance: q(αv) == q(v) for α > 0
      val v2 = v.map(_ * 3.7)
      val q2 = Seq(Tuple1(v2)).toDF("v")
        .select(graft.expressions.Kernels.quantizeInt8($"v")).collect()(0).getSeq[Long](0)
      assert(q2 === q)
    }
  }
}
