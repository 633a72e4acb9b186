package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Ivf, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated groups in 4-d + a query near group A
  private lazy val emb: DataFrame = (
    (0 until 10).map(i => (i.toLong, Array(10f + i * 0.1f, 0f, 0f, 0f))) ++     // group A
    (10 until 20).map(i => (i.toLong, Array(0f, 10f + i * 0.1f, 0f, 0f))) ++    // group B
    (20 until 30).map(i => (i.toLong, Array(0f, 0f, 10f + i * 0.1f, 0f)))       // group C
  ).toDF("vec_id", "embedding")

  test("train converges to one centroid per separated group") {
    val cs = Ivf.train(emb, k = 3, iters = 4)
    assert(cs.length === 3)
    // each centroid is dominated by exactly one axis and all axes covered
    val domAxes = cs.map(c => c.zipWithIndex.maxBy(_._1)._2).toSet
    assert(domAxes === Set(0, 1, 2))
  }

  test("index assigns each group to a single cluster") {
    val cs = Ivf.train(emb, k = 3, iters = 4)
    val idx = Ivf.index(emb, cs).select("vec_id", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val groups = idx.groupBy(_._1 / 10).map { case (g, rows) => g -> rows.map(_._2).toSet }
    assert(groups.values.forall(_.size === 1)) // pure clusters
    assert(groups.values.toSet.size === 3)     // distinct clusters
  }

  test("materialized index search prunes to probed cluster partitions and matches search") {
    val cs = Ivf.train(emb, k = 3, iters = 4)
    val path = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/index"
    Ivf.writeIndex(emb, cs, path)
    // hive layout: one directory per cluster
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("cluster=")) === 3)

    val live = Ivf.search(emb, cs, Seq(0L), k = 5, nProbe = 1)
      .select("q_id", "rank", "vec_id", "cos").collect().map(_.toSeq)
    val stored = Ivf.searchIndexed(spark, path, cs, Seq(0L), k = 5, nProbe = 1)
      .select("q_id", "rank", "vec_id", "cos").collect().map(_.toSeq)
    assert(stored.toSeq === live.toSeq)

    // the probe predicate reaches the scan as a partition filter
    val plan = Ivf.searchIndexed(spark, path, cs, Seq(0L), k = 5, nProbe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"))
  }

  test("search with nProbe=1 finds the same-group neighbors, matching brute force") {
    val cs = Ivf.train(emb, k = 3, iters = 4)
    val ivfTop = Ivf.search(emb, cs, Seq(0L), k = 5, nProbe = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val bruteTop = Similarity.cosineTopK(emb, Seq(0L), 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivfTop === bruteTop) // separated groups → probe-1 recall is exact
    assert(ivfTop.forall(_ < 10)) // all neighbors from group A
  }

  test("semanticDedup keeps the lowest-id exemplar per semantic ball") {
    // each axis group is mutually parallel (cos 1.0): only the lowest id
    // of each cluster survives at eps 0.9; orthogonal clusters never mix
    val out = Ivf.semanticDedup(emb, k = 3, iters = 4, eps = 0.9).collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
    assert(out.length === 30)
    assert(out.filter(_._3).map(_._1).toSet === Set(0L, 10L, 20L))
    // every dropped vector's witness cosine is 1.0 (parallel vectors)
    assert(out.filter(!_._3).forall(_._2.contains(1.0)))
    // survivors have no lower-id member in their cluster at all
    assert(out.filter(_._3).forall(_._2.isEmpty))
  }

  test("semanticDedupIncremental screens a batch against the frozen cluster index") {
    val cs = Ivf.train(emb, k = 3, iters = 4)
    val dir = java.nio.file.Files.createTempDirectory("sem_idx").toString + "/index"
    Ivf.writeIndex(emb, cs, dir)
    val batch = Seq(
      (100L, Array(11f, 0f, 0f, 0f)),  // parallel to group A → dropped vs existing
      (101L, Array(0f, 0f, 0f, 10f)),  // novel direction → kept
      (102L, Array(0f, 0f, 0f, 20f)))  // parallel to 101 → dropped vs batch sibling
      .toDF("vec_id", "embedding")
    val out = Ivf.semanticDedupIncremental(spark, dir, cs, batch, eps = 0.9)
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
      .toMap
    assert(out(100L)._1.contains(1.0) && !out(100L)._3)  // existing witness
    assert(out(101L)._3)                                 // novel: kept
    assert(out(102L)._2.contains(1.0) && !out(102L)._3)  // batch-lower witness
    // 101 and 102 tie at cos 0 to every centroid → both land in the same
    // lowest-id cluster, which is what makes 102's witness visible
    assert(Ivf.index(batch, cs).collect().map(_.getInt(2)).distinct.length <= 2)
  }

  test("recallReport scores 1000 per-mille when clusters perfectly separate the space") {
    // 3 separated groups, k=3, nProbe=1: every query's true top-9 live
    // in its own cluster, so the probe path recalls the full baseline
    val out = Ivf.recallReport(emb, queryIds = Seq(0L, 15L, 25L), k = 9,
      kClusters = 3, iters = 4, nProbe = 1).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_brute") === 9L)
      assert(r.getAs[Long]("n_common") === 9L)
      assert(r.getAs[Long]("recall_pm") === 1000L)
    }
  }

  test("clusterStats reports every cluster, exact counts, and balance per-mille") {
    val out = Ivf.clusterStats(emb, k = 4, iters = 4).collect()
    assert(out.map(_.getInt(0)).toSeq === (0 until 4))            // full spine
    assert(out.map(_.getAs[Long]("n_vectors")).sum === 30L)       // partition of corpus
    // 3 separated groups + k=4 → at least one empty cluster, flagged
    assert(out.exists(_.getAs[Boolean]("is_empty")))
    out.foreach { r =>
      val n = r.getAs[Long]("n_vectors")
      assert(r.getAs[Long]("share_pm") === n * 1000 / 30)
      assert(r.getAs[Long]("balance_pm") === n * 4 * 1000 / 30)
      assert(r.getAs[Boolean]("is_empty") === (n == 0L))
    }
  }
}
