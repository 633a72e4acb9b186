package graft.operators

import graft.operators.Micro.{u3, u6}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over the `embeddings` table
  * (`embedding: array<float>`).
  *
  * All kernels are sequential-fold expressions in double precision —
  * deterministic regardless of partitioning (a left fold has one
  * evaluation order), fully codegen'd, no UDF.
  */
object Similarity {

  /** Cast array<float> → array<double> once; all math in double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Codegen'd tight-loop dot product ([[graft.expressions.DotProduct]]).
    * The interpreted HOF fold (`aggregate(zip_with(...))`) costs ~10×
    * more per pair — measured 128 s → 14 s on the sf0.1 all-pairs run.
    */
  def dot(a: Column, b: Column): Column = graft.expressions.Kernels.dot(a, b)

  /** Unit-normalize once per row, so each pair costs ONE dot product
    * instead of three. Zero vectors normalize to NULL (cosine = NULL,
    * DuckDB x/0 semantics, never an ANSI error).
    *
    * Kernel expression ([[graft.expressions.L2Normalize]]): the HOF form
    * `transform(v, x => x / sqrt(dot(v,v)))` embeds the norm inside the
    * lambda and re-evaluates it per ELEMENT interpreted — O(dim²)/row
    * and it knocks the whole projection out of codegen. Measured:
    * ann_topk 16 s → sub-second at sf0.1.
    */
  def normalize(v: Column): Column = graft.expressions.Kernels.l2normalize(v)

  /** cosine = dot/sqrt(|a|²·|b|²), micro-rounded for cross-engine
    * stability ([[Micro.uN]] — decimal round() can flap per engine).
    */
  def cosine(a: Column, b: Column, scale: Int = 3): Column = {
    val den = sqrt(dot(a, a) * dot(b, b))
    graft.operators.Micro.uN(dot(a, b) / when(den === 0, lit(null)).otherwise(den), scale)
  }

  /** C6 `ann_topk` — brute-force cosine top-k as the exact baseline.
    * The *query* side is tiny and broadcast; the corpus streams past it
    * once (no shuffle of the big side, no all-pairs). This is the right
    * physical plan whenever |queries| ≪ |corpus| — the IVF/LSH variants
    * exist for query sets that are themselves huge.
    */
  def cosineTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), normalize(toDouble(col("embedding"))).as("v"))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", u3(dot(col("qv"), col("v"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** C50 `knn_classify` — k-nearest-neighbor label prediction over the
    * embedding space: majority vote among the top-k cosine neighbors
    * ([[cosineTopK]]), ties broken (votes desc, label asc) so the
    * prediction is deterministic. The evaluation primitive for "is this
    * embedding column any good?" — label agreement of neighbors — and
    * the zero-training classifier for corpus labeling. Costs one
    * [[cosineTopK]] plus joins on the |q|·k result: the corpus is
    * scanned once; everything downstream is query-set-sized. At scale
    * swap the brute-force top-k for [[graft.operators.Ivf.search]] —
    * the vote logic is identical.
    */
  def knnClassify(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val labels = embeddings.select(col("vec_id"), col("label"))
    val votes = cosineTopK(embeddings, queryIds, k)
      .join(labels, Seq("vec_id"))
      .groupBy(col("q_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val pick = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("label").asc)
    votes
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("true_label")), Seq("q_id"))
      .select(col("q_id"), col("true_label"), col("label").as("pred_label"), col("votes"))
      .orderBy(col("q_id"))
  }

  /** C5 `dedup_embedding` — near-dup pairs with cosine ≥ threshold.
    *
    * Exact all-pairs, computed TILED: vectors are grouped into id-hashed
    * blocks, block *pairs* are cross-joined (tiny row count), and each
    * task runs the dense pairwise loop over its two blocks. A row-level
    * pairwise join materializes both 64-float vectors into every joined
    * row (O(pairs · dim) shuffle bytes — measured 15 s at 2k vectors);
    * tiling moves O(pairs · dim) work into registers and keeps rows at
    * O(blocks²). `mapPartitions`-style imperative code is justified here
    * (SURVEY.md §4 case (d)): the kernel is a dense numeric loop Catalyst
    * has no operator for.
    *
    * Exactness: same normalize→dot→round(3) float path as the expression
    * kernels, so results are bit-identical to the declarative form.
    * Zero vectors produce cos 0 (threshold > 0 drops them, matching the
    * NULL-cosine semantics of the expression path). Scale path for
    * corpora where even blocks² is too many tasks: [[lshBuckets]] first,
    * exact tiled verify within buckets.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double,
                            blockSize: Int = 1024): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    require(threshold > 0, "threshold must be positive (zero vectors score 0)")

    val vecs = embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val n = math.sqrt(s)
        val out = new Array[Double](v.length)
        if (n > 0) { i = 0; while (i < v.length) { out(i) = v(i) / n; i += 1 } }
        (id, out)
      }
    val nBlocks = math.max(1, (embeddings.count() / blockSize).toInt + 1)
    val blocked = vecs
      .map { case (id, v) => ((id % nBlocks).toInt, id, v) }
      .groupByKey(_._1)
      .mapGroups { (b, it) => (b, it.map(t => (t._2, t._3)).toArray) }
    val pairsOut = blocked.as("a")
      .joinWith(blocked.as("b"), col("a._1") <= col("b._1"))
      .flatMap { case ((ba, arrA), (bb, arrB)) =>
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
        var i = 0
        while (i < arrA.length) {
          val (ida, va) = arrA(i)
          var j = if (ba == bb) i + 1 else 0
          while (j < arrB.length) {
            val (idb, vb) = arrB(j)
            if (ida != idb) {
              var s = 0.0; var k = 0
              while (k < va.length && k < vb.length) { s += va(k) * vb(k); k += 1 }
              // identical rounding to the declarative path's u3:
              // floor(x*1000 + 0.5)/1000, the same IEEE op sequence
              val c = math.floor(s * 1000.0 + 0.5) / 1000.0
              if (c >= threshold) {
                out += (if (ida < idb) (ida, idb, c) else (idb, ida, c))
              }
            }
            j += 1
          }
          i += 1
        }
        out
      }
    pairsOut.toDF("id_a", "id_b", "cos").orderBy(col("id_a"), col("id_b"))
  }

  /** C7 `ann_lsh` — random-hyperplane LSH: `planes` sign bits packed in
    * a long by the [[graft.expressions.LshBucket]] kernel (deterministic
    * hash-derived ±1 plane components — no driver-side randomness, no
    * plane matrix broadcast). Output: (vec_id, bucket) — the bucketed
    * index a banded self-join or bucket-local top-k runs on. Sketch cost
    * is O(dim · planes) per row in one scan.
    */
  def lshBuckets(embeddings: DataFrame, dim: Int, planes: Int): DataFrame =
    embeddings.select(
      col("vec_id"),
      graft.expressions.Kernels.lshBucket(toDouble(col("embedding")), planes).as("bucket"))
      .orderBy(col("vec_id"))

  /** The 100 TB near-dup path: LSH-bucketed candidate generation +
    * exact cosine verify. [[embeddingNearDupPairs]] is exact but
    * all-pairs (blocks² tasks — fine to ~10⁵ vectors, hopeless beyond);
    * here candidates must share one of `bands` LSH sub-buckets (cutting
    * `planes` sign bits into bands, banding the same way MinHash-LSH
    * does), so the self-join shuffles (band, bucket, id, vec) tuples
    * and pair work is bucket-local. Recall is tunable: more bands ⇒
    * higher recall, more candidates; verification is exact, so
    * precision is always 1 — output ⊆ the exact operator's output, with
    * identical cosines for every emitted pair.
    */
  /** Self-scaling band width: `width = clamp(bitlen((n−1) div 32), 4, 14)`
    * — the number of sign bits per band that keeps the EXPECTED per-band
    * bucket population (n / 2^width) pinned at ~32 as the corpus grows,
    * so the bucket-local pair work stays flat instead of quadratically
    * re-densifying (the r5 ScaleProbe measured 1.9→6.1→23.5 s under a
    * FIXED width; the r6 fix capped it with `maxBucket`, which stays as
    * the backstop for hub/boilerplate directions). Integer bit-length,
    * not float log2, so the DuckDB oracle's `floor(log2(x))+1` replay
    * agrees exactly for every n below 2^40ish (log2 only risks rounding
    * up at integers within one ulp of a power of two, ~2^50+). Cap 14:
    * 4 bands × 14 bits = 56 sign bits packs inside a signed long on
    * both engines (the 16-bit-at-scale convention needs a 64-bit
    * unsigned pack DuckDB's `2**j` BIGINT sum can't replay).
    */
  def deriveBandWidth(n: Long): Int = {
    val x = math.max(1L, (n - 1) / 32)
    math.min(14, math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(x)))
  }

  def lshVerifiedNearDupPairs(embeddings: DataFrame, threshold: Double,
                              planes: Int = -1, bands: Int = 4,
                              maxBucket: Long = 500): DataFrame = {
    // planes = -1 (default) → self-scale from the corpus count: one
    // cheap metadata-level count() action, then planes = bands·width.
    val actualPlanes =
      if (planes > 0) planes else bands * deriveBandWidth(embeddings.count())
    require(actualPlanes % bands == 0, "planes must divide into bands")
    val width = actualPlanes / bands
    val e = embeddings.select(col("vec_id"), normalize(toDouble(col("embedding"))).as("v"),
      graft.expressions.Kernels.lshBucket(toDouble(col("embedding")), actualPlanes).as("bucket"))
    val bandCols = (0 until bands).map(b =>
      shiftrightunsigned(col("bucket"), b * width).bitwiseAND(lit((1L << width) - 1)))
    // Degenerate-bucket cap: per-band bucket population is n/2^width on
    // average, so pair work inside a bucket is O((n/2^width)²) — with a
    // FIXED width, growing n turns the "bucketed" join quadratic (the
    // 1×/2×/4× scale probe measured exactly that: 1.9 s → 6.1 s →
    // 23.5 s before the cap). Two guards at scale: (1) the self-scaling
    // width above, which pins the EXPECTED population at ~32 as n grows;
    // (2) this cap, which skips buckets whose population exceeds
    // `maxBucket` — the standard LSH-dedup guardrail for SKEWED buckets:
    // a bucket holding ≫ expected population carries near-zero signal
    // per pair (hub/boilerplate directions) but quadratic cost. Same
    // df-cap idea as ngramJaccardPairs/winnowPairs; replayed by the
    // oracle (which re-derives the same width from its own count()).
    val wB = Window.partitionBy(col("band_id"), col("band_bucket"))
    val banded = e.select(col("vec_id"), col("v"),
      posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_bucket")
      .withColumn("pop", count(lit(1)).over(wB))
      .filter(col("pop") <= maxBucket)
      .drop("pop")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_bucket") === col("b.band_bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      // cosine first, THEN distinct: a pair sharing several bands gets
      // the identical (id_a, id_b, cos) row, so dedup runs on 3 scalars
      // instead of hashing two 64-double arrays per row.
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        u3(dot(col("a.v"), col("b.v"))).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Bucket-local ANN: candidates share an LSH bucket, ranked by exact
    * cosine within the bucket — the 100 TB path where both sides are
    * huge (shuffle is on 16-bit buckets, not all-pairs).
    */
  def lshTopK(embeddings: DataFrame, dim: Int, planes: Int, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), normalize(toDouble(col("embedding"))).as("v"))
    val buckets = lshBuckets(embeddings, dim, planes)
    val withB = e.join(buckets, Seq("vec_id"))
    val a = withB.select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    val b = withB.select(col("vec_id"), col("v"), col("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    // shuffle_hash: the bucket self-join's sides share the projection +
    // LSH subtree — identical exchanges reuse it once (and a corpus-
    // sized bucketed table is never a broadcast side at scale).
    a.hint("shuffle_hash").join(b.hint("shuffle_hash"), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", u3(dot(col("qv"), col("v"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** C24 `label_centroids` — per-label centroid + per-dimension variance
    * of the embedding space (class prototypes for classification /
    * outlier screens). Means are decimal-exact sums divided in double
    * (order-insensitive — the IVF training trick, so DuckDB replays
    * bit-identically); x² is rounded to 12 decimals BEFORE the decimal
    * cast so both engines' double→decimal conversions agree. One
    * posexplode + one (label, pos)-keyed aggregation — fully map-side
    * combinable, no per-label data skew (dims spread the key space).
    */
  /** C60 `embedding_drift` — embedding-space drift monitor, the
    * vector-side mirror of the text pipeline's KS drift test: per
    * label, the corpus splits into two cohorts (vec_id parity — the
    * deterministic stand-in for before/after ingestion halves), each
    * cohort gets a per-dim centroid (decimal-exact sums, the
    * [[labelCentroids]] machinery), and drift = 1 − cosine between the
    * two centroids. A drift approaching 1 on a label means the new
    * half's embeddings moved — re-train the quantizer / re-cluster the
    * IVF index (the trigger [[graft.operators.Ivf.clusterStats]]'s
    * balance flag watches from the other side).
    *
    * Determinism: decimal-exact per-dim sums → one IEEE division →
    * round(6); the dot products fold the pos-ordered centroid arrays
    * sequentially (compiled kernel); √ is IEEE-exact. Scale: one scan
    * exploded by dim, then everything is (labels·dims)-bounded.
    */
  def embeddingDrift(embeddings: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 15)
    val halves = embeddings
      .select(col("label"), pmod(col("vec_id"), lit(2L)).as("half"),
        posexplode(toDouble(col("embedding"))))
      .groupBy(col("label"), col("half"), col("pos"))
      .agg(count(lit(1)).as("n"),
        u6(sum(col("col").cast(dec)).cast("double") / count(lit(1))).as("m"))
    val wide = halves
      .groupBy(col("label"), col("pos"))
      .agg(max(when(col("half") === 0, col("m"))).as("m0"),
        max(when(col("half") === 1, col("m"))).as("m1"),
        max(when(col("half") === 0, col("n"))).as("cn0"),
        max(when(col("half") === 1, col("n"))).as("cn1"))
      .filter(col("m0").isNotNull && col("m1").isNotNull)
    val arrs = wide
      .groupBy(col("label"))
      .agg(min(col("cn0")).as("n0"), min(col("cn1")).as("n1"),
        transform(array_sort(collect_list(struct(col("pos"), col("m0")))), s => s("m0")).as("a0"),
        transform(array_sort(collect_list(struct(col("pos"), col("m1")))), s => s("m1")).as("a1"))
    val den = sqrt(dot(col("a0"), col("a0")) * dot(col("a1"), col("a1")))
    arrs
      .withColumn("cos", u6(
        dot(col("a0"), col("a1")) / when(den === 0, lit(null)).otherwise(den)))
      .withColumn("drift", u6(lit(1.0) - col("cos")))
      .select(col("label"), col("n0"), col("n1"), col("cos"), col("drift"))
      .orderBy(col("label"))
  }

  def labelCentroids(embeddings: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 15)
    embeddings
      .select(col("label"), posexplode(toDouble(col("embedding"))))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("col").cast(dec)).cast("double") / count(lit(1))).as("m"),
        (sum(round(col("col") * col("col"), 12).cast(dec)).cast("double") / count(lit(1))).as("ex2"))
      .select(col("label"), col("pos"), col("n_vecs"),
        u6(col("m")).as("mean_val"),
        u6(col("ex2") - col("m") * col("m")).as("var_val"))
      .orderBy(col("label"), col("pos"))
  }

  /** C64 `embedding_norm_stats` — per-label L2-norm profile (n, min,
    * max, mean): the first-line QC gate on an embedding batch — a
    * label whose norms collapse toward 0 or blow out signals a broken
    * encoder run BEFORE any ANN index is built on it. Map-only norm
    * kernel (sequential sumsq fold, codegen'd) + one map-side-combinable
    * aggregate; at 100 TB it runs at scan speed.
    *
    * Determinism: each norm is rounded to 6 and the MEAN is taken over
    * micro-integers (the [[Analytics.seasonality]] pattern), so the
    * only double sums that cross rows are exact integer arithmetic;
    * min/max are order-free.
    */
  def embeddingNormStats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"),
        u6(sqrt(graft.expressions.Kernels.seqFold(
          toDouble(col("embedding")), "sumsq"))).as("norm"))
      .withColumn("norm_micro", round(col("norm") * lit(1000000.0)).cast("long"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"),
        sum(col("norm_micro")).as("sum_micro"))
      .withColumn("mean_norm",
        round(col("sum_micro").cast("double") / col("n_vecs").cast("double"))
          .cast("long").cast("double") / lit(1000000.0))
      .select(col("label"), col("n_vecs"), col("min_norm"), col("max_norm"), col("mean_norm"))
      .orderBy(col("label"))

  /** C75 `embedding_anisotropy` — global per-dimension variance profile
    * plus each dimension's share of total variance. The standard "rogue
    * dimension" screen: transformer embeddings are known to concentrate
    * variance in a few dims (anisotropy), which silently dominates
    * cosine similarity — a per-dim var_share far above 1/dim says
    * whitening is needed before the ANN index is built. Same decimal
    * -exact sum discipline as [[labelCentroids]], one dim-bounded
    * aggregate; the share is integer per-mille over micro-variances
    * (no cross-row FP). Tiny negative rounded variances clamp to 0 so
    * the integer division never sees a negative operand.
    */
  def embeddingAnisotropy(embeddings: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 15)
    val perDim = embeddings
      .select(posexplode(toDouble(col("embedding"))))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("col").cast(dec)).cast("double") / count(lit(1))).as("m"),
        (sum(round(col("col") * col("col"), 12).cast(dec)).cast("double") / count(lit(1))).as("ex2"))
      .select(col("pos"), col("n_vecs"), u6(col("m")).as("mean_val"),
        greatest(u6(col("ex2") - col("m") * col("m")), lit(0.0)).as("var_val"))
      .withColumn("var_micro", round(col("var_val") * lit(1000000.0)).cast("long"))
    // Grand total as an empty-frame window over the dim-bounded rows —
    // the benford idiom; crossJoin(broadcast(1-row)) would plan as a
    // BroadcastNestedLoopJoin (the plan-audit anti-pattern).
    perDim
      .withColumn("total_micro", sum(col("var_micro")).over(Window.partitionBy()))
      .withColumn("var_share_pm", expr(
        "CASE WHEN total_micro = 0 THEN NULL ELSE (1000 * var_micro) div total_micro END"))
      .select(col("pos"), col("n_vecs"), col("mean_val"), col("var_val"), col("var_share_pm"))
      .orderBy(col("pos"))
  }

  /** C76 `doc_outliers` — per-label embedding outliers: the k vectors
    * farthest from their own label's centroid by squared Euclidean
    * distance — the mislabeled/garbage screen run before a labeled
    * batch trains anything. dist² expands to |v|² − 2⟨v,c⟩ + |c|² so
    * each row costs three codegen'd dot kernels against the BROADCAST
    * centroid table (labels are few; the corpus never shuffles).
    * Centroid components are u6-rounded before use and dist² is
    * u6-rounded before ranking, so the (dist² desc, vec_id) order —
    * and therefore the top-k — is engine-exact.
    */
  def docOutliers(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 15)
    val cent = embeddings
      .select(col("label"), posexplode(toDouble(col("embedding"))))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast(dec)).cast("double") / count(lit(1))).as("m"))
      .select(col("label"), col("pos"), u6(col("m")).as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s("m")).as("cvec"))
    val v = toDouble(col("embedding"))
    embeddings.join(broadcast(cent), Seq("label"))
      .withColumn("dist2", u6(
        dot(v, v) - lit(2.0) * dot(v, col("cvec")) + dot(col("cvec"), col("cvec"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("dist2").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("label"), col("vec_id"), col("dist2"), col("rank"))
      .orderBy(col("label"), col("rank"))
  }

  /** C85 `mmr_rerank` — Maximal Marginal Relevance re-ranking
    * (Carbonell & Goldstein 1998): greedily re-order each query's
    * top-k candidates by λ·rel(q,d) − (1−λ)·max_{s∈selected} sim(d,s)
    * — the standard diversity-aware retrieval pass that stops RAG /
    * few-shot selection from returning k near-copies of the same
    * document. Candidate sets are |q|·k bounded by construction, so
    * the greedy runs on collected rows (the [[kcenterCoreset]]
    * bounded-collect pattern) over sims computed BY THE ENGINE
    * (cosineTopK relevances + one bounded pair join for candidate–
    * candidate sims, both scale-3 rounded). The (1−λ) weight is
    * written as the expression `1.0 − 0.7` on BOTH sides — the
    * subtraction result is not the literal 0.3, and only an identical
    * IEEE op sequence keeps the greedy engine-exact. First pick per
    * query carries a NULL score (nothing selected to diversify
    * against).
    */
  def mmrRerank(embeddings: DataFrame, queryIds: Seq[Long], kCand: Int = 10,
                kSel: Int = 5, lam: Double = 0.7): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val candDf = cosineTopK(embeddings, queryIds, kCand)
    val cands = candDf.select(col("q_id"), col("vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ev = embeddings.select(col("vec_id"), normalize(toDouble(col("embedding"))).as("v"))
    val cv = candDf.select(col("q_id"), col("vec_id")).join(ev, Seq("vec_id"))
    val pair = cv.as("a").join(cv.as("b"),
        col("a.q_id") === col("b.q_id") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.q_id").as("q_id"), col("a.vec_id").as("va"),
        col("b.vec_id").as("vb"), u3(dot(col("a.v"), col("b.v"))).as("sim"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
    val simMap = (pair ++ pair.map { case ((q, a, b), s) => ((q, b, a), s) }).toMap
    val out = queryIds.map(q => q -> cands.filter(_._1 == q).map(t => (t._2, t._3)))
      .filter(_._2.nonEmpty)
      .flatMap { case (q, cs) =>
        val first = cs.sortBy { case (v, rel) => (-rel, v) }.head
        var sel = Vector((first._1, first._2, Option.empty[Double]))
        while (sel.length < math.min(kSel, cs.length)) {
          val chosen = sel.map(_._1).toSet
          val best = cs.filterNot(c => chosen(c._1)).map { case (v, rel) =>
            val mx = sel.map(s => simMap((q, v, s._1))).max
            (v, rel, Micro.jvm6(lam * rel - (1.0 - lam) * mx))
          }.sortBy { case (v, _, sc) => (-sc, v) }.head
          sel :+= ((best._1, best._2, Some(best._3)))
        }
        sel.zipWithIndex.map { case ((v, rel, sc), i) => (q, (i + 1).toLong, v, rel, sc) }
      }
    out.toDF("q_id", "sel_rank", "vec_id", "relevance", "score")
      .orderBy(col("q_id"), col("sel_rank"))
  }

  /** C81 `kcenter_coreset` — greedy k-center coreset (Gonzalez 1985
    * farthest-first traversal): seed with the min vec_id, then k−1
    * times add the vector farthest from every selected center — the
    * classic diversity-selection primitive (pick the k most mutually
    * distant exemplars for a labeling/eval budget). Emits each center
    * with its selection order and radius (its min-distance to the
    * prior centers — the coverage radius the corpus had before it was
    * added).
    *
    * Scale shape: each round is ONE distributed aggregate over the
    * corpus (`max(struct(mind, −vec_id))` — map-side combinable, no
    * orderBy/limit driver merge) plus a 1-row collect; the running
    * min-distance column is updated incrementally against the NEW
    * center only (distances to old centers are already folded into
    * `mind`), so total work is O(k·n·dim) with k bounded — the
    * documented bounded-collect pattern ([[Ivf]] centroids). dist² =
    * |v|² − 2⟨v,c⟩ + |c|², u6-rounded, ties toward the smaller
    * vec_id: the selection sequence is engine-exact and the DuckDB
    * oracle replays it with a mechanically-chained CTE per round.
    */
  def kcenterCoreset(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings.select(col("vec_id"), toDouble(col("embedding")).as("v")).persist()
    def dist2To(center: Seq[Double]): Column = {
      val c = typedLit(center)
      u6(dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), c) + dot(c, c))
    }
    def vectorOf(id: Long): Seq[Double] =
      vecs.filter(col("vec_id") === id).select(col("v")).head.getSeq[Double](0)
    val seedId = vecs.agg(min(col("vec_id"))).head.getLong(0)
    var picked = Vector((seedId, Option.empty[Double]))
    var cur = vecs.withColumn("mind", dist2To(vectorOf(seedId)))
    for (_ <- 2 to k) {
      val ids = picked.map(_._1)
      val s = cur.filter(!col("vec_id").isin(ids: _*))
        .agg(max(struct(col("mind").as("mind"), (-col("vec_id")).as("negid"))).as("s"))
        .head.getStruct(0)
      val (r, id) = (s.getDouble(0), -s.getLong(1))
      picked :+= ((id, Some(r)))
      if (picked.length < k)
        cur = cur.withColumn("mind", least(col("mind"), dist2To(vectorOf(id))))
    }
    vecs.unpersist()
    picked.zipWithIndex.map { case ((id, r), i) => ((i + 1).toLong, id, r) }
      .toDF("sel_order", "vec_id", "radius")
      .orderBy(col("sel_order"))
  }

  /** C104 `mahalanobis_outliers` — top-k per-label embedding outliers
    * by DIAGONAL-covariance Mahalanobis distance²: [[docOutliers]]'s
    * euclidean rank mistakes high-variance dimensions for outliers;
    * normalizing each squared deviation by the label's per-dim
    * variance ([[labelCentroids]]' exact-decimal moments, shared
    * implementation) is the standard fix without the O(dim²) full
    * covariance. Zero-variance dims contribute 0 (deterministic, both
    * engines); the per-label stat table is dim-bounded and broadcast.
    */
  def mahalanobisOutliers(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val stats = labelCentroids(embeddings)
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(
        struct(col("pos"), col("mean_val"), col("var_val")))),
        s => struct(s("mean_val").as("m"), s("var_val").as("s2"))).as("st"))
      .select(col("label"),
        transform(col("st"), s => s("m")).as("mvec"),
        transform(col("st"), s => s("s2")).as("varvec"))
    embeddings.join(broadcast(stats), Seq("label"))
      .withColumn("terms", zip_with(
        zip_with(toDouble(col("embedding")), col("mvec"), (x, m) => x - m),
        col("varvec"),
        (di, s2) => when(s2 === 0, lit(0.0)).otherwise(di * di / s2)))
      .withColumn("md2", u6(graft.expressions.Kernels.seqFold(col("terms"), "sum")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("md2").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("label"), col("vec_id"), col("md2"), col("rank"))
      .orderBy(col("label"), col("rank"))
  }

  /** C105 `intrinsic_dim` — TwoNN intrinsic-dimension estimate (Facco
    * et al.): d̂ = n / Σ ln(r₂/r₁) over each sample point's two nearest
    * neighbours. The one-number answer to "is this 64-dim embedding
    * really 64-dimensional?" — read before choosing IVF list counts or
    * LSH plane budgets. Bounded by construction: the lowest `sampleN`
    * vec_ids (deterministic sample) against themselves via ONE 1-row
    * broadcast pool — O(sampleN²·dim) total, corpus-size-independent.
    * The distance ratio is u6-rounded before ln (corwin discipline)
    * and the Σ is an order-insensitive micro-integer sum; duplicate
    * points (r₁ = 0) drop, documented.
    */
  def intrinsicDim(embeddings: DataFrame, sampleN: Int = 128): DataFrame = {
    val samp = embeddings.orderBy(col("vec_id")).limit(sampleN)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val pool = samp.agg(sort_array(collect_list(struct(col("vec_id"), col("v")))).as("pool"))
    samp.crossJoin(broadcast(pool))
      .withColumn("d2s", array_sort(transform(col("pool"), p =>
        aggregate(zip_with(col("v"), p("v"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))))
      .withColumn("d1", element_at(col("d2s"), 2))
      .withColumn("d2", element_at(col("d2s"), 3))
      .filter(col("d1") > 0)
      .withColumn("term_micro",
        round(lit(0.5) * log(u6(col("d2") / col("d1"))) * 1e6).cast("long"))
      .agg(count(lit(1)).as("n_used"), sum(col("term_micro")).as("s"))
      .withColumn("id_hat", u6(col("n_used").cast("double") /
        when(col("s") === 0, lit(null)).otherwise(col("s").cast("double") / 1e6)))
      .select(col("n_used"), col("id_hat"))
  }
}
