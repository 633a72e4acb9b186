package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // Long doc (6× a 17-token sentence — odd token count, so simhash bit
  // votes are never zero) with a one-token append as the near-dup: the
  // ±1 vote shift can't flip any |vote| ≥ 6 bit, giving hamming 0, and
  // the perturbation is tiny for shingle-based measures too.
  private val base = Seq.fill(6)(
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill")
    .mkString(" ")
  private val nearDup = base + " postscript"
  private val distinct1 =
    "completely unrelated text about distributed query engines shuffling partitions across executors"
  private val distinct2 =
    "yet another different document mentioning parquet row groups and predicate pushdown mechanics"

  private lazy val docs: DataFrame = Seq(
    (0L, base), (1L, nearDup), (2L, distinct1), (3L, distinct2), (4L, base))
    .toDF("doc_id", "text")

  test("exact dedup keeps min doc_id per content hash") {
    val out = Dedup.exactDedup(docs).collect()
    assert(out.length === 4) // 0 and 4 collapse
    val dupRow = out.find(_.getAs[Long]("n_copies") === 2L).get
    assert(dupRow.getAs[Long]("keep_id") === 0L)
  }

  test("minhashVerifiedPairs = exact shingle jaccard restricted to LSH recall") {
    val cands = Dedup.minhashLshPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.minhashVerifiedPairs(docs, threshold = 0.3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(verified.keySet.subsetOf(cands))
    // precision-exact: identical to the exhaustive posting-join jaccard
    // on whatever the bands recalled
    val exact = Dedup.ngramJaccardPairs(docs, k = 8, threshold = 0.3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(verified === exact.filter { case (p, _) => cands(p) })
    // the planted pairs come through with the right scores
    assert(verified((0L, 4L)) === 1.0)
    assert(verified.exists { case ((a, b), j) => j < 1.0 && j >= 0.3 }) // the near-dup
  }

  test("minhash LSH surfaces the planted near-dup pair and the exact dup") {
    val pairs = Dedup.minhashLshPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L))) // identical docs always collide
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 4L))) // near-dup
    assert(!pairs.contains((2L, 3L))) // unrelated docs don't
  }

  test("simhash pairs: identical docs at hamming 0, near-dups within threshold") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").intValue)).toList
    val exact = pairs.find(p => p._1 == 0L && p._2 == 4L)
    assert(exact.exists(_._3 === 0))
    assert(pairs.exists(p => (p._1, p._2) == ((0L, 1L))))
  }

  test("ngram jaccard: exact dup scores 1.0, unrelated pair absent") {
    val out = Dedup.ngramJaccardPairs(docs, k = 8, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    assert(out(((0L, 4L))) === 1.0)
    assert(out(((0L, 1L))) > 0.5 && out(((0L, 1L))) < 1.0)
    assert(!out.contains((2L, 3L)))
  }

  test("decontaminate flags docs sharing long shingles with the eval set") {
    val docs = Seq(
      (0L, "the secret eval benchmark passage nobody should train on"),
      (1L, "an unrelated clean document about something else entirely"),
      (2L, "contains the secret eval benchmark passage verbatim inside"), // contaminated
      (3L, "totally clean text with zero overlap whatsoever"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.decontaminate(docs, Seq(0L), k = 13)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(2L) && out(2L) >= 1L)
    assert(!out.contains(1L) && !out.contains(3L))
    assert(!out.contains(0L)) // eval docs are never self-flagged
  }

  test("dedupSurvivors keeps one representative per cluster with its size") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(1L, 2L, 3L, 4L, 9L).map((_, "t")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = graft.operators.Dedup.dedupSurvivors(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // {1,2,3} → survivor 1 (size 3); 4 and 9 are singletons
    assert(out.toSeq === Seq((1L, 3L), (4L, 1L), (9L, 1L)))
  }

  test("near-dup clusters: transitive chain collapses to the min id") {
    // chain: 0~1 (append), 1~5 (append to nearDup) → {0,1,4,5} one cluster
    val chained = docs.union(Seq((5L, nearDup + " more")).toDF("doc_id", "text"))
    val pairs = Dedup.ngramJaccardPairs(chained, k = 8, threshold = 0.3)
    val clusters = Dedup.nearDupClusters(chained, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(0L) === 0L && clusters(1L) === 0L && clusters(4L) === 0L && clusters(5L) === 0L)
    assert(clusters(2L) === 2L && clusters(3L) === 3L) // unrelated docs stay singleton
  }

  test("prefix-filtered jaccard equals the exhaustive posting-list result on real data") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val withPrefix = Dedup.ngramJaccardPairs(real, k = 8, threshold = 0.3, maxDf = 100L,
      prefixFilter = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val naive = Dedup.ngramJaccardPairs(real, k = 8, threshold = 0.3, maxDf = 100L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(withPrefix === naive)
    assert(withPrefix.nonEmpty)
  }

  test("distributed label-propagation path gives the same clusters as union-find") {
    val chained = docs.union(Seq((5L, nearDup + " more")).toDF("doc_id", "text"))
    val pairs = Dedup.ngramJaccardPairs(chained, k = 8, threshold = 0.3)
    val fast = Dedup.nearDupClusters(chained, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.nearDupClusters(chained, pairs, driverSideMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === dist)
  }

  test("top ngrams surfaces the repeated bigram with deterministic ranking") {
    val out = Dedup.topNgrams(docs, 30).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty && out.length <= 30)
    assert(out.head._2 >= out.last._2)
    // "the quick" appears 6 times in each of docs 0, 1, 4 (base × 6)
    assert(out.toMap.get("the quick").exists(_ >= 18L))
  }

  test("shingles produce distinct k-grams") {
    val s = docs.filter($"doc_id" === 0)
      .select(Dedup.shingles($"text", 8)).collect()(0).getSeq[String](0)
    assert(s.toSet.size === s.length)
    assert(s.forall(_.length <= 8))
  }

  test("winnowPairs finds verbatim-overlap pairs with exact-copy dominance") {
    val pairs = Dedup.winnowPairs(docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // exact copies share every fingerprint
    assert(pairs.contains((0L, 4L)))
    // the near-dup (one appended token) shares almost all of them
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 4L)))
    assert(pairs((0L, 4L)) >= pairs((0L, 1L)))
    // unrelated docs never pair
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).intersect(Set(2L, 3L)).nonEmpty })
    // symmetry of the planted copy: (0,1) and (1,4) counts identical
    assert(pairs((0L, 1L)) === pairs((1L, 4L)))
  }

  test("materialized band index probe finds exactly the new×existing LSH candidates") {
    // existing corpus: 0 (base), 2, 3 (unrelated); new batch: 1 (near-dup
    // of 0), 4 (exact copy of 0), 5 (fresh unrelated)
    val existing = docs.filter($"doc_id".isin(0L, 2L, 3L))
    val newDocs = Seq((1L, nearDup), (4L, base),
      (5L, "entirely novel content regarding broadcast joins and executor memory pressure"))
      .toDF("doc_id", "text")
    val idxPath = java.nio.file.Files.createTempDirectory("mh_idx_spec").toString + "/index"
    Dedup.writeMinhashIndex(existing, idxPath)

    // index layout: partitioned by band directory, 3 longs per row
    val dirs = new java.io.File(idxPath).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("band_id=")) && dirs.length === 16)

    val hits = Dedup.probeMinhashIndex(spark, idxPath, newDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact copy must collide with its source; near-dup should too
    assert(hits.contains((4L, 0L)))
    assert(hits.contains((1L, 0L)))
    // fresh doc matches nothing; existing docs never appear as new_id
    assert(!hits.exists(_._1 == 5L))
    assert(hits.forall { case (n, e) => Set(1L, 4L).contains(n) && Set(0L, 2L, 3L).contains(e) })

    // contract: probe hits == the full pairwise LSH operator restricted
    // to new×existing (the incremental path loses nothing vs full rerun)
    val full = Dedup.minhashLshPairs(existing.unionByName(newDocs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (n, e) => Set(1L, 4L, 5L).contains(n) && Set(0L, 2L, 3L).contains(e) }
      .toSet
    assert(hits === full)

    // append a duplicate copy of the index rows (at-least-once retry
    // artifact), compact, and the probe answer is unchanged with the
    // duplicate rows physically gone
    val before = spark.read.parquet(idxPath).count()
    Dedup.minhashBanded(existing).write.mode("append").partitionBy("band_id").parquet(idxPath)
    assert(spark.read.parquet(idxPath).count() === before * 2)
    Dedup.compactMinhashIndex(spark, idxPath)
    assert(spark.read.parquet(idxPath).count() === before)
    val hitsAfter = Dedup.probeMinhashIndex(spark, idxPath, newDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hitsAfter === hits)
  }

  test("sim_pagerank: integer fixed-point values match the hand-computed 3 rounds") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // chain 1—2—3; 4 and 5 isolated
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.simPagerank(docs, pairs, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pr0=10^6 each; update pr' = 150000 + (85·Σ pr div deg) div 100:
    // r1: ends 575000, mid 1850000 · r2: ends 936250, mid 1127500
    // r3: ends 150000+(85·(1127500 div 2)) div 100 = 629187,
    //     mid 150000+(85·(936250·2)) div 100 = 1741625
    assert(got === Map(1L -> 629187L, 2L -> 1741625L, 3L -> 629187L,
      4L -> 150000L, 5L -> 150000L))
    // the chain's center is the authority; isolated nodes sit at the base
    assert(got(2L) > got(1L) && got(1L) > got(4L))
  }

  test("triangle_count enumerates each triangle once; clustering coeff per member") {
    import spark.implicits._
    // K4 on {1,2,3,4} minus edge (3,4), plus pendant 5—1:
    // triangles (1,2,3), (1,2,4)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (1L, 5L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.triangleCount(pairs)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    // node 1: deg 4, 2 triangles → 2·2/(4·3) = 0.333333
    // node 2: deg 3, 2 triangles → 4/6 = 0.666667
    // nodes 3,4: deg 2, 1 triangle → 2/2 = 1.0
    // node 5: deg 1, 0 triangles → coeff undefined (null)
    assert(got === Map(
      1L -> ((4L, 2L, Some(0.333333))),
      2L -> ((3L, 2L, Some(0.666667))),
      3L -> ((2L, 1L, Some(1.0))),
      4L -> ((2L, 1L, Some(1.0))),
      5L -> ((1L, 0L, None))))
  }

  test("dedupRecallReport: counts are consistent and full recall on an easy corpus") {
    val r = Dedup.dedupRecallReport(docs).collect()(0)
    val (ne, nr, nc) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_recalled"),
      r.getAs[Long]("n_common"))
    assert(nc <= math.min(ne, nr))
    assert(ne > 0) // the fixture has genuine near-dup pairs
    // tiny corpus: identical/near-identical docs always band-collide
    assert(r.getAs[Long]("recall_pm") === nc * 1000 / ne)
    assert(r.getAs[Long]("precision_pm") === nc * 1000 / nr)
  }
}
