package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.NearestCentroid
import graft.operators.Micro.u3

/** IVF (inverted-file) approximate nearest neighbor — the similarity
  * index for corpora where even LSH bucket joins are too coarse.
  *
  * Train/assign/search, all deterministic:
  *  - [[train]]: hash-spread seed pick + Lloyd iterations. Per
  *    iteration: one scan assigns (NearestCentroid kernel — centroids
  *    travel inside the expression, no join), one narrow shuffle of
  *    (cluster, pos, component) averages the new means. Train on a
  *    sample at scale; k·dim doubles always fit on the driver.
  *  - [[index]]: one scan tags every vector with its cluster → write
  *    partitioned by cluster, and ANN probes become partition-pruned
  *    reads.
  *  - [[search]]: probe the `nProbe` nearest centroids per query (a
  *    driver-side k·|q| computation), exact cosine only within probed
  *    clusters — corpus work drops to nProbe/k of brute force.
  */
object Ivf {

  /** Deterministic Lloyd k-means on the embedding column.
    *
    * Engine-portable determinism (the DuckDB oracle replays the exact
    * training): seeds are spread by a Knuth multiplicative hash of
    * vec_id (plain integer arithmetic, not engine-internal xxhash64),
    * and the Lloyd means are computed as an exact DECIMAL sum divided
    * in double — decimal addition is order-insensitive, so the means
    * are bit-identical regardless of partitioning or engine, where a
    * double `avg` would drift with summation order.
    */
  def train(embeddings: DataFrame, k: Int, iters: Int = 5): Array[Array[Double]] = {
    // The training set is scanned iters+1 times (seed pick + one
    // assignment pass per Lloyd iteration): cache the parsed double
    // vectors once instead of re-reading parquet + re-casting per pass.
    // At 100 TB train on a sample — the cache then fits the cluster.
    val vecs = embeddings.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .persist()
    // hash-spread deterministic seeds (not first-k: those may be correlated)
    var centroids: Array[Array[Double]] = vecs
      .withColumn("h", pmod(col("vec_id") * lit(2654435761L), lit(4294967296L)))
      .orderBy(col("h"), col("vec_id"))
      .limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val assigned = vecs.withColumn("c", NearestCentroid(col("v"), centroids))
      val means = assigned
        .select(col("c"), posexplode(col("v")))
        .groupBy(col("c"), col("pos"))
        .agg((sum(col("col").cast("decimal(27,15)")).cast("double") /
          count(lit(1))).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, ci) =>
        byCluster.get(ci) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val m = new Array[Double](dim)
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            m
          case None => old // empty cluster keeps its seed
        }
      }
      it += 1
    }
    vecs.unpersist()
    centroids
  }

  /** Tag every vector with its coarse cluster. */
  def index(embeddings: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    embeddings
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("cluster", NearestCentroid(col("v"), centroids))

  /** Materialize the index: cluster-partitioned parquet with vectors
    * pre-normalized. A probe then reads ONLY its `nProbe` cluster
    * directories (hive partition pruning — `PartitionFilters` in the
    * scan), which is what makes IVF sublinear at rest: corpus I/O per
    * query is nProbe/k of the store, before any compute.
    */
  def writeIndex(embeddings: DataFrame, centroids: Array[Array[Double]],
                 path: String, filesPerCluster: Int = 4): Unit =
    index(embeddings, centroids)
      .withColumn("vn", Similarity.normalize(col("v")))
      .select(col("vec_id"), col("vn"), col("cluster"))
      .repartition(filesPerCluster, col("cluster"), pmod(col("vec_id"), lit(filesPerCluster)))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Append a micro-batch into an existing index — same layout as
    * [[writeIndex]], new files land beside old ones in each touched
    * cluster dir (the log-structured contract the TickStore uses:
    * readers see appends immediately, compaction is separate).
    */
  def writeIndexAppend(embeddings: DataFrame, centroids: Array[Array[Double]],
                       path: String, filesPerCluster: Int = 1): Unit =
    index(embeddings, centroids)
      .withColumn("vn", Similarity.normalize(col("v")))
      .select(col("vec_id"), col("vn"), col("cluster"))
      .repartition(filesPerCluster, col("cluster"))
      .write.mode("append").partitionBy("cluster").parquet(path)

  /** ANN over a materialized index: same semantics as [[search]], but
    * the corpus side is the cluster-partitioned store and the probe
    * list becomes a partition filter — unprobed clusters are never
    * read.
    */
  def searchIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                    centroids: Array[Array[Double]],
                    queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame = {
    val idx = spark.read.parquet(indexPath)
    val queries = idx.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("vn").as("qvn"), col("cluster")).collect()
    val normed = centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum); if (n == 0) c else c.map(_ / n)
    }
    val probes = queries.flatMap { r =>
      val qvn = r.getSeq[Double](1).toArray
      val scored = normed.zipWithIndex.map { case (c, ci) =>
        (ci, c.zip(qvn).map { case (a, b) => a * b }.sum)
      }
      scored.sortBy { case (ci, s) => (-s, ci) }.take(nProbe)
        .map { case (ci, _) => (r.getLong(0), qvn, ci) }
    }.toSeq
    import spark.implicits._
    val probeDf = probes.toDF("q_id", "qvn", "cluster")
    val probedClusters = probes.map(_._3).distinct
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    idx
      // partition-pruning predicate: only the probed cluster dirs open
      .filter(col("cluster").isin(probedClusters: _*))
      .join(broadcast(probeDf), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", u3(Similarity.dot(col("qvn"), col("vn"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"), col("cluster"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ANN: probe the nProbe nearest clusters per query id, exact cosine
    * top-k within the probed subset.
    */
  def search(embeddings: DataFrame, centroids: Array[Array[Double]],
             queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame = {
    val idx = index(embeddings, centroids)
    val queries = idx.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("v").as("qv")).collect()
    // driver-side probe list: nProbe nearest centroids per query
    val normed = centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum); if (n == 0) c else c.map(_ / n)
    }
    val probes = queries.flatMap { r =>
      val qv = r.getSeq[Double](1).toArray
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val scored = normed.zipWithIndex.map { case (c, ci) =>
        (ci, if (qn == 0) 0.0 else c.zip(qv).map { case (a, b) => a * b }.sum / qn)
      }
      scored.sortBy { case (ci, s) => (-s, ci) }.take(nProbe)
        .map { case (ci, _) => (r.getLong(0), ci) }
    }.toSeq
    val spark = embeddings.sparkSession
    import spark.implicits._
    val probeDf = probes.toDF("q_id", "cluster")
    // normalize queries once on the driver (they're tiny and broadcast);
    // the corpus side normalizes once per row BEFORE the join, so each
    // joined pair costs exactly one dot product.
    val qDf = queries.map { r =>
      val qv = r.getSeq[Double](1).toArray
      val n = math.sqrt(qv.map(x => x * x).sum)
      (r.getLong(0), if (n == 0) null else qv.map(_ / n))
    }.toSeq.toDF("q_id", "qvn")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    idx.withColumn("vn", Similarity.normalize(col("v")))
      .join(broadcast(probeDf), Seq("cluster"))
      .join(broadcast(qDf), Seq("q_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", u3(Similarity.dot(col("qvn"), col("vn"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"), col("cluster"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** C41 `semantic_dedup` — SemDeDup (Abbas et al., arXiv:2303.09540
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the embedding space with the SAME
    * deterministic k-means coarse quantizer as the IVF index, then
    * WITHIN each cluster mark every vector lying within `eps` cosine
    * of a lower-id cluster member as a semantic duplicate. This is the
    * greedy lowest-id-survives variant of the paper's
    * one-exemplar-per-eps-ball rule — deterministic where the paper
    * samples a random exemplar (same spirit as dedup_exact's min-id
    * survivor).
    *
    * Scale shape: candidate pairs are enumerated per cluster only —
    * Σ|cluster|² ≈ corpus²/k for balanced clusters, k chosen ∝ corpus —
    * and at rest the cluster partitioning IS the materialized IVF index
    * ([[writeIndex]]), so the pair stage reads co-partitioned data and
    * shuffles nothing new. Cosines replay exactly in DuckDB: the
    * training is the replayed Lloyd loop ([[train]]), and the pair
    * cosine is the same normalize→dot→round(3) float path as the ANN
    * family. `max_cos_lower` (max is order-insensitive) gives the
    * dup-strength diagnostic; `kept` is the corpus filter bit.
    */
  def semanticDedup(embeddings: DataFrame, k: Int = 8, iters: Int = 3,
                    eps: Double = 0.5,
                    trained: Option[Array[Array[Double]]] = None): DataFrame = {
    // `trained`: the shared quantizer for the train-once/consume-many
    // split (SparkEntry's centroid memo; ann_ivf keeps the real
    // training benchmark). Deterministic Lloyd ⇒ identical to training
    // in place.
    val centroids = trained.getOrElse(train(embeddings, k, iters))
    val tagged = index(embeddings, centroids)
      .withColumn("nv", Similarity.normalize(col("v")))
      .select(col("vec_id"), col("cluster"), col("nv"))
    val lower = tagged
      .select(col("cluster"), col("vec_id").as("lo_id"), col("nv").as("lo_v"))
    val witness = tagged
      .join(lower, Seq("cluster"))
      .filter(col("lo_id") < col("vec_id"))
      .withColumn("cos", u3(Similarity.dot(col("nv"), col("lo_v"))))
      .groupBy(col("vec_id"))
      .agg(max(col("cos")).as("max_cos_lower"))
    tagged.select(col("vec_id"), col("cluster"))
      .join(witness, Seq("vec_id"), "left")
      .withColumn("kept",
        col("max_cos_lower").isNull || col("max_cos_lower") < eps)
      .select(col("vec_id"), col("cluster"), col("max_cos_lower"), col("kept"))
      .orderBy(col("vec_id"))
  }

  /** C130 `semantic_threshold_curve` — kept/dropped counts of
    * [[semanticDedup]] as a function of the cosine threshold: the
    * eps-tuning harness for semantic dedup (the embedding-space
    * sibling of C67 `dedup_threshold_curve`). The expensive part —
    * per-vector max lower-id cosine under the trained quantizer — is
    * computed ONCE and checkpointed; each threshold is then one
    * bounded aggregate over it, so sweeping eps costs aggregates, not
    * cluster self-joins. Counts integer; thresholds carried as
    * per-mille integers.
    */
  def semanticThresholdCurve(embeddings: DataFrame, k: Int = 8, iters: Int = 3,
                             epsPm: Seq[Int] = Seq(300, 400, 500),
                             trained: Option[Array[Array[Double]]] = None): DataFrame = {
    val base = semanticDedup(embeddings, k, iters, eps = 0.0, trained)
      .select(col("vec_id"), col("max_cos_lower"))
      .localCheckpoint(true) // one witness build feeds every threshold
    epsPm.map { pm =>
      val eps = pm / 1000.0
      base.agg(
        lit(pm.toLong).as("eps_pm"),
        sum(when(col("max_cos_lower").isNull || col("max_cos_lower") < eps, 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(col("max_cos_lower").isNotNull && col("max_cos_lower") >= eps, 1L)
          .otherwise(0L)).as("n_dropped"))
        .select(col("eps_pm"), col("n_kept"), col("n_dropped"))
    }.reduce(_.unionByName(_)).orderBy(col("eps_pm"))
  }

  /** C42 `semantic_dedup_incremental` — incremental-ingestion SemDeDup:
    * a new vector batch is screened against the MATERIALIZED IVF index
    * ([[writeIndex]]) under the FROZEN coarse quantizer — the honest
    * ingest contract (retraining on every batch would reshuffle cluster
    * assignments and with them past verdicts). A batch vector is
    * dropped if within `eps` cosine of ANY existing member of its
    * cluster (the settled corpus always wins — it is already kept at
    * rest) or of a lower-id batch sibling in the same cluster (the
    * batch-internal [[semanticDedup]] rule).
    *
    * Scale shape: the existing corpus is never re-read whole and never
    * re-clustered — the probe reads ONLY the ≤|batch| touched cluster
    * partitions (hive pruning on the `cluster` dir key, the same
    * nProbe/k I/O bound as [[searchIndexed]]); the only driver-side
    * collect is the touched-cluster id set (≤ k ints). Mirrors C29
    * `dedup_incremental`'s band-index probe on the embedding side.
    */
  def semanticDedupIncremental(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String,
                               centroids: Array[Array[Double]],
                               batch: DataFrame, eps: Double = 0.4): DataFrame = {
    val tagged = index(batch, centroids)
      .withColumn("nv", Similarity.normalize(col("v")))
      .select(col("vec_id"), col("cluster"), col("nv"))
    val touched = tagged.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ k ints — bounded by design
    val existing = spark.read.parquet(indexPath)
      .filter(col("cluster").isin(touched: _*)) // partition-pruned read
      .select(col("cluster"), col("vn").as("ex_v"))
    val wex = tagged.join(existing, Seq("cluster"))
      .withColumn("cos", u3(Similarity.dot(col("nv"), col("ex_v"))))
      .groupBy(col("vec_id")).agg(max(col("cos")).as("max_cos_existing"))
    val lower = tagged
      .select(col("cluster"), col("vec_id").as("lo_id"), col("nv").as("lo_v"))
    val wb = tagged.join(lower, Seq("cluster"))
      .filter(col("lo_id") < col("vec_id"))
      .withColumn("cos", u3(Similarity.dot(col("nv"), col("lo_v"))))
      .groupBy(col("vec_id")).agg(max(col("cos")).as("max_cos_batch_lower"))
    tagged.select(col("vec_id"), col("cluster"))
      .join(wex, Seq("vec_id"), "left")
      .join(wb, Seq("vec_id"), "left")
      .withColumn("kept",
        (col("max_cos_existing").isNull || col("max_cos_existing") < eps) &&
          (col("max_cos_batch_lower").isNull || col("max_cos_batch_lower") < eps))
      .orderBy(col("vec_id"))
  }

  /** C47 `ann_recall_report` — the evaluation harness for the ANN
    * stack: recall@k of the IVF probe path against the brute-force
    * cosine baseline, per query — n_common / n_brute as an integer
    * per-mille (both top-k sets are deterministic: round-3 cosine with
    * vec_id tie-break). This is the number that justifies `nProbe`/`k`
    * choices before a 100 TB rollout; brute force stays feasible as
    * the baseline because the query side is a broadcast handful while
    * the corpus is scanned once. All counts integer → exact replay of
    * both replayed pipelines.
    */
  def recallReport(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
                   kClusters: Int = 8, iters: Int = 3, nProbe: Int = 2,
                   trained: Option[Array[Array[Double]]] = None): DataFrame = {
    val brute = Similarity.cosineTopK(embeddings, queryIds, k)
      .select(col("q_id"), col("vec_id"))
    val centroids = trained.getOrElse(train(embeddings, kClusters, iters))
    val approx = search(embeddings, centroids, queryIds, k, nProbe)
      .select(col("q_id"), col("vec_id"))
    val nb = brute.groupBy(col("q_id")).agg(count(lit(1)).as("n_brute"))
    val na = approx.groupBy(col("q_id")).agg(count(lit(1)).as("n_ivf"))
    val cm = brute.join(approx, Seq("q_id", "vec_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_common"))
    nb.join(na, Seq("q_id"), "left").join(cm, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_ivf", "n_common"))
      .withColumn("recall_pm", expr("(n_common * 1000) div n_brute"))
      .orderBy(col("q_id"))
  }

  /** C45 `ivf_stats` — index observability for the cluster space the
    * ANN probes and SemDeDup verdicts both live in: per-cluster member
    * count, corpus share (per-mille), and balance factor
    * `(count·k·1000) div n` (1000 = perfectly balanced; ≫1000 flags the
    * hot cluster that drags every probe touching it — the signal that
    * schedules a re-train, exactly like TickStore.stats schedules
    * compact). A k-row spine join keeps EMPTY clusters visible (dead
    * capacity is the other failure mode). The report itself is k rows
    * from one count-aggregate over the assignments — metadata-scale
    * output regardless of corpus size; all-integer → exact replay of
    * the replayed Lloyd training.
    */
  def clusterStats(embeddings: DataFrame, k: Int = 8, iters: Int = 3,
                   trained: Option[Array[Array[Double]]] = None): DataFrame = {
    val centroids = trained.getOrElse(train(embeddings, k, iters))
    val spark = embeddings.sparkSession
    val counts = index(embeddings, centroids)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_vectors"))
    val total = embeddings.count()
    spark.range(k).select(col("id").cast("int").as("cluster"))
      .join(counts, Seq("cluster"), "left")
      .na.fill(0L, Seq("n_vectors"))
      .withColumn("share_pm", expr(s"(n_vectors * 1000) div $total"))
      .withColumn("balance_pm", expr(s"(n_vectors * $k * 1000) div $total"))
      .withColumn("is_empty", col("n_vectors") === 0)
      .orderBy(col("cluster"))
  }

  /** C82 `cluster_purity` — clustering-vs-labels agreement: per IVF
    * cluster, the majority label's share (purity, integer per-mille) —
    * the embedding-quality eval that says whether the geometry k-means
    * finds matches the labels the corpus carries (low purity = the
    * encoder, the labels, or k is wrong). Rides the same replayed
    * Lloyd training as the ANN family; majority pick is a
    * (count desc, label asc) row_number — total order, engine-exact;
    * everything after assignment is integer. Empty clusters have no
    * row (no labels to be pure about), unlike [[clusterStats]]' spine.
    */
  def clusterPurity(embeddings: DataFrame, k: Int = 8, iters: Int = 3,
                    trained: Option[Array[Array[Double]]] = None): DataFrame = {
    val centroids = trained.getOrElse(train(embeddings, k, iters))
    val lab = index(embeddings, centroids)
      .join(embeddings.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(col("cluster"), col("label")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("cluster")).orderBy(col("c").desc, col("label"))
    val tot = Window.partitionBy(col("cluster"))
    lab
      .withColumn("n_vecs", sum(col("c")).over(tot))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("n_vecs"),
        col("label").as("top_label"), col("c").as("n_top"),
        expr("(1000 * c) div n_vecs").as("purity_pm"))
      .orderBy(col("cluster"))
  }
}
