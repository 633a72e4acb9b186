package graft.operators

import graft.operators.Micro.u6
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table.
  *
  * Scale shape shared by all near-dup variants: per-document signatures
  * are computed in a single narrow projection (array expressions, no
  * explode-shuffle), then candidate generation goes through *bucketed
  * equality joins* (LSH bands / hash buckets) — never an all-pairs
  * product. At 100 TB the signature pass is scan-bound and the band join
  * shuffles only (band_id, bucket, doc_id) tuples, a tiny fraction of
  * corpus bytes.
  */
object Dedup {

  /** Minimum-parallelism guard for compiled-kernel map stages
    * (MinHashSig / ShingleSet / SimHash64 / WinnowFingerprints): when
    * the upstream scan yields fewer partitions than half the cluster's
    * cores — a tiny store, or a single-row-group file like the local
    * testdata — one task would run the whole per-document hash loop
    * serially while every other core idles; a narrow shuffle of the
    * text is cheaper than that. On a real multi-row-group / multi-file
    * store the scan already parallelizes and this is an exact no-op
    * (no exchange added).
    */
  private[operators] def fanOut(df: DataFrame): DataFrame = {
    val have = df.rdd.getNumPartitions
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (have * 2 <= want) df.repartition(want) else df
  }

  /** C1 `dedup_exact` — exact dedup by content hash; min doc_id
    * survives. One shuffle on a 128-bit key; survivor choice is total.
    */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** C63 `prefix_dups` — boilerplate-family detection by shared
    * normalized prefix: crawl corpora carry huge families of documents
    * that differ only past a templated header (cookie banners, license
    * preambles, forum scaffolding), which full-content hashing misses
    * and near-dup pair mining finds only at quadratic-ish candidate
    * cost. Hashing the first `prefixLen` normalized chars puts every
    * family in one bucket for the price of [[exactDedup]]: one
    * map-side-combinable shuffle on a 128-bit key, linear at 100 TB.
    * Only multi-doc families are emitted (singletons are noise here).
    */
  def prefixDups(documents: DataFrame, prefixLen: Int = 64): DataFrame =
    documents
      .groupBy(md5(substring(lower(trim(col("text"))), 1, prefixLen)).as("prefix_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy(col("keep_id"))

  /** C89 `suffix_dups` — [[prefixDups]]' mirror for boilerplate
    * FOOTERS (license tails, forum signatures, nav chrome appended by
    * templated renderers): hash the LAST `suffixLen` normalized chars.
    * The window is addressed by explicit position arithmetic
    * (`greatest(1, len−(suffixLen−1))`) rather than a negative-index
    * substring or a reverse() — negative positions and
    * grapheme-vs-codepoint reversal are exactly where engines
    * disagree. The default window is deliberately shorter than the
    * prefix pass: footers (sign-offs, license one-liners) are shorter
    * than templated headers. Same single map-side-combinable shuffle
    * as the prefix pass.
    */
  def suffixDups(documents: DataFrame, suffixLen: Int = 16): DataFrame =
    documents
      .withColumn("t", lower(trim(col("text"))))
      .groupBy(expr(s"md5(substring(t, greatest(1, length(t) - ${suffixLen - 1}), $suffixLen))")
        .as("suffix_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy(col("keep_id"))

  /** C80 `dedup_normalized` — near-exact dedup by NORMALIZED content
    * hash: lowercase, every non-alphanumeric run collapsed to one
    * space, trimmed — the canonical form that catches the
    * re-punctuated / re-wrapped / case-shifted copies [[exactDedup]]
    * misses without paying [[minhashNearDups]]' shingle machinery
    * (URL-style dedup for bodies instead of URLs). Same cost and
    * output shape as exactDedup — every family including singletons
    * (the survivor list IS the deduplicated corpus manifest) — one
    * map-side-combinable shuffle on a 128-bit key.
    */
  def normalizedDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
        .as("norm_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .orderBy(col("keep_id"))

  /** C88 `split_leakage` — train/eval contamination audit: near-dup
    * clusters whose members land in DIFFERENT [[Pipeline.sampleSplit]]
    * splits leak training signal into val/test — the check every
    * benchmark-honest corpus build runs AFTER splitting (hash splits
    * are doc-level; near-dups cross them freely). One summary row:
    * multi-doc clusters, how many leak, the leaked doc mass, and the
    * leak share per-mille — all integer over the O(duplicates)
    * cluster labels joined with the pure-hash split assignment.
    */
  def splitLeakage(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val split = documents.select(col("doc_id"),
      when(pmod(col("doc_id") * lit(2654435761L), lit(100L)) < 80, "train")
        .when(pmod(col("doc_id") * lit(2654435761L), lit(100L)) < 90, "val")
        .otherwise("test").as("split"))
    nearDupClusters(documents, pairs)
      .join(split, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_docs"), count_distinct(col("split")).as("n_splits"))
      .filter(col("n_docs") > 1)
      .agg(count(lit(1)).as("n_multi_clusters"),
        sum(when(col("n_splits") > 1, 1L).otherwise(0L)).as("n_leaky_clusters"),
        sum(when(col("n_splits") > 1, col("n_docs")).otherwise(lit(0L))).as("leaked_docs"))
      .withColumn("leak_share_pm", expr(
        "CASE WHEN n_multi_clusters = 0 THEN NULL ELSE (1000 * n_leaky_clusters) div n_multi_clusters END"))
  }

  /** C69 `cross_source_dups` — the source-provenance duplicate matrix:
    * for every pair of sources, how many [[prefixDups]]-style
    * normalized-prefix families BOTH carry (who mirrors whose
    * boilerplate — the number that decides which source to drop
    * wholesale before fine-grained dedup). Keyed on the 64-char prefix
    * hash, not full content: crawl mirrors re-wrap the same template
    * with differing tails, so exact-content matching across sources is
    * empirically empty while prefix families cross freely. Distinct
    * (hash, source) projection first, so the self-join runs over the
    * deduplicated family table; join groups are bounded by
    * sources-per-family (tiny), never corpus-sized — the same
    * bucketed-equality discipline as the band joins. Output is
    * |sources|²-bounded.
    */
  def crossSourceDups(documents: DataFrame, prefixLen: Int = 64): DataFrame = {
    val hashes = documents
      .select(md5(substring(lower(trim(col("text"))), 1, prefixLen)).as("h"),
        col("source")).distinct()
    // SHUFFLE_HASH on both sides, same trick as the band join: the two
    // sides become IDENTICAL exchanges and ReusedExchange computes the
    // hash projection + distinct once — the broadcast plan re-scanned
    // the whole corpus per side.
    hashes.as("a").hint("shuffle_hash")
      .join(hashes.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Character k-gram shingle set as an array column (no explode).
    * Kernel ([[graft.expressions.ShingleSet]]) — one compiled pass per
    * document; the HOF `array_distinct(transform(sequence(...), substr))`
    * form runs an interpreted lambda per position (~300/doc).
    */
  def shingles(text: Column, k: Int): Column =
    graft.expressions.Kernels.shingleSet(text, k)

  /** C2 `dedup_minhash` — MinHash+LSH near-dup candidate pairs:
    * shingle → 64-hash signature → `bands` bands of `rows` hashes →
    * band-bucket equality join → distinct candidate pairs. The join is
    * on (band_id, bucket_hash): docs collide only if one band matches
    * exactly, giving the classic S-curve selectivity; nothing here is
    * O(n²). Signatures come from the [[graft.expressions.MinHashSig]]
    * kernel (tight loop inside codegen, one string hash per shingle;
    * integer-portable hashing, so the DuckDB oracle replays the bands).
    */
  def minhashLshPairs(documents: DataFrame, k: Int = 8, nHashes: Int = 64,
                      bands: Int = 16): DataFrame = {
    val banded = minhashBanded(documents, k, nHashes, bands)
    // SHUFFLE_HASH, not broadcast: at scale a corpus-sized band index
    // must never be a broadcast side, and locally the hint makes both
    // sides identical exchanges → ReusedExchange computes the
    // MinHashSig banding ONCE (the broadcast plan ran the signature
    // kernel separately per side).
    banded.as("a").hint("shuffle_hash")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band_id") === col("b.band_id") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Corpus-adaptive rows-per-band for the minhash banding:
    * `r = clamp(bitlen((n−1) div 125), 4, 8)` — one more hash per band
    * roughly every ×4 of corpus, so the bands' collision selectivity
    * RISES as the corpus grows instead of letting bucket occupancy
    * (and with it candidate-pair mass) re-densify. The r12 pair
    * ledger measured the FIXED 16×4 banding's candidate mass at
    * exp 1.47 (×29 at ×10 data) while the verified set stayed exp
    * 1.00 — this is the candidate-stage knob that keeps the ×100 step
    * from going quadratic, the text-side analog of the embedding
    * LSH's [[graft.operators.Similarity.deriveBandWidth]]. Integer
    * bit-length so the DuckDB oracle's `floor(log2(x))+1` replays
    * exactly (same argument as deriveBandWidth). The honest trade:
    * with the 64-hash budget fixed, the S-curve midpoint drifts up
    * ((1/16)^(1/4)≈0.50 → (1/8)^(1/8)≈0.77 at the cap) — the
    * operating point a fixed-compute dedup runs at scale, with exact
    * dups (jaccard 1) recalled at every point and
    * [[minhashVerifiedPairs]]-style verification keeping precision
    * exact wherever the curve sits.
    */
  def deriveBandRows(n: Long, nHashes: Int = 64): Int = {
    val x = math.max(1L, (n - 1) / 125)
    math.min(8, math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(x)))
  }

  /** C151 `dedup_minhash_scaled` — [[minhashLshPairs]] at the
    * corpus-derived operating point: rows-per-band from
    * [[deriveBandRows]] (one cheap count() action), bands = budget/r.
    * 500 docs → 16×4 (the fixed default), 5 000 → 10×6, ≥50 000 → 8×8.
    */
  def minhashLshPairsScaled(documents: DataFrame, k: Int = 8,
                            nHashes: Int = 64): DataFrame = {
    val r = deriveBandRows(documents.count(), nHashes)
    val bands = nHashes / r
    minhashLshPairs(documents, k, bands * r, bands)
  }

  /** C43 `minhash_verified` — the text-side two-stage 100 TB near-dup
    * path (mirror of the embedding side's `lsh_verified_pairs`): LSH
    * candidates (C2) verified with the EXACT shingle jaccard, computed
    * per candidate pair only — `array_intersect` of the two docs'
    * distinct shingle-hash sets (the compiled [[shingles]] kernel),
    * never an all-pairs or posting join. Recall stays the bands'
    * S-curve; precision becomes exact. The jaccard replays in DuckDB
    * because the shingle hash is the integer-portable family — a hash
    * collision shrinks both engines' sets identically.
    *
    * Scale shape: candidates ⨝ doc shingle sets twice on doc ids (hash
    * joins); each pair carries two doc-bounded arrays, work is
    * O(candidates · doc shingles) — at threshold-worthy band settings
    * candidates ≈ true dups, not corpus².
    */
  def minhashVerifiedPairs(documents: DataFrame, k: Int = 8, nHashes: Int = 64,
                           bands: Int = 16, threshold: Double = 0.3): DataFrame = {
    // ONE corpus text pass, shared by both stages (r7 VERDICT #3): the
    // distinct shingle sets are materialized eagerly (localCheckpoint —
    // the standing memo idiom; ContextCleaner reclaims the blocks when
    // the plan drops), then (a) the LSH banding derives its signatures
    // FROM the materialized sets ([[graft.expressions.Kernels
    // .minhashFromShingles]] — bit-identical to the from-text kernel,
    // min over distinct shingles ≡ min over windows) and (b) the exact
    // jaccard verify reads the same blocks. The earlier form re-ran the
    // shingle kernel once per stage (two full text scans); a candidate
    // semi-filter was measured 3× slower still (it re-planned the whole
    // LSH pipeline per consumer). At true 100 TB scale the two-JOB
    // index path (write candidates / probe via `probeMinhashIndex`)
    // remains the production shape; `dedup_minhash` keeps the
    // standalone no-memo candidate build as the benchmark baseline.
    val sets = fanOut(documents)
      .select(col("doc_id"),
        graft.expressions.Kernels.shingleHashSet(col("text"), k).as("hs"))
      .localCheckpoint(true)
    val rows = nHashes / bands
    val banded = sets.select(
      col("doc_id"),
      graft.expressions.Kernels.minhashFromHashes(col("hs"), nHashes).as("sig"))
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)), b))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "bucket")
    val cands = banded.as("a").hint("shuffle_hash")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band_id") === col("b.band_id") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val den = (size(col("ha")) + size(col("hb")) - col("inter")).cast("double")
    // ONE pass over the shingle sets, not two: melting each pair into
    // its two member rows and joining the corpus side once (pairs are
    // the tiny/build side) replaces the doc_a/doc_b double join, which
    // planned the whole shingle projection — a full corpus kernel pass
    // plus its broadcast — twice.
    val melted = cands
      .select(col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .join(sets, Seq("doc_id"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        first(when(col("doc_id") === col("doc_a"), col("hs")), ignoreNulls = true).as("ha"),
        first(when(col("doc_id") === col("doc_b"), col("hs")), ignoreNulls = true).as("hb"))
    melted
      // CPU-dense, byte-light verify stage: AQE's size-based coalescing
      // would funnel the pair partitions into few tasks (probed 4.5× at
      // 2× data — the edit_similarity lesson). A user-specified
      // partition count is exempt from coalescing and keeps the merge
      // kernel spread.
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_a"), col("doc_b"))
      // primitive two-pointer merge over the sorted hash sets — the
      // per-pair O(|a|+|b|) verify kernel (no boxing, no hash set, no
      // materialized intersection; see SortedIntersectCount)
      .withColumn("inter",
        graft.expressions.Kernels.sortedIntersectCount(col("ha"), col("hb")).cast("int"))
      // NaN defense, not a reachable short-doc path: ShingleHashSet has
      // a 1-window floor (a doc shorter than k chars still yields one
      // shingle), so den = 0 cannot arise from short docs — but if den
      // ever WERE 0, 0/0.0 is NaN, which Spark orders ABOVE every
      // threshold; the guard pins that invariant to NULL → filtered
      .withColumn("jaccard", u6(
        when(den === 0, lit(null)).otherwise(col("inter") / den)))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C48 `dedup_recall_report` — the text-side evaluation harness
    * (mirror of the embedding stack's `ann_recall_report`): pair-level
    * recall AND precision of the two-stage MinHash path against the
    * exhaustive df-capped jaccard truth, as integer per-mille. The two
    * sets can differ in both directions — banding loses recall by its
    * S-curve, and the verify jaccard is computed on UNCAPPED shingle
    * sets while the exhaustive build drops stop-shingles (df cap), so
    * precision is also measured, not assumed. One row out; the number
    * that justifies band/row settings before a 100 TB dedup run.
    */
  def dedupRecallReport(documents: DataFrame, k: Int = 8,
                        threshold: Double = 0.3, maxDf: Long = 100L,
                        exactPairs: Option[DataFrame] = None,
                        recalledPairs: Option[DataFrame] = None): DataFrame = {
    // Each pair set is consumed TWICE below (its union branch + the
    // common join); without materialization Catalyst re-plans — and
    // re-runs — both full shingle pipelines per consumer. The pair
    // sets are tiny (≈ true dups), so an eager localCheckpoint swaps
    // a duplicated corpus pass for a few KB of blocks (ContextCleaner
    // reclaims them when the plan is dropped — same pattern as the
    // shared cluster pair build). `exactPairs` lets a caller that has
    // ALREADY materialized the exhaustive jaccard truth set (the
    // SparkEntry shared memo the cluster composites ride) hand it in,
    // so one driver run pays for the exhaustive build once, not once
    // per consumer.
    val exact = exactPairs
      .map(_.select(col("doc_a"), col("doc_b")))
      .getOrElse(ngramJaccardPairs(documents, k, threshold, maxDf)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(true))
    val rec = recalledPairs
      .map(_.select(col("doc_a"), col("doc_b")))
      .getOrElse(minhashVerifiedPairs(documents, k, threshold = threshold)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(true))
    // Tagged union → ONE global aggregate: a constant-key join of the
    // three 1-row counts would simplify to a nested-loop join (the
    // plan-audit anti-pattern); the union shape has no join at all.
    val common = exact.join(rec, Seq("doc_a", "doc_b"))
    val tagged = exact.select(lit(1L).as("e"), lit(0L).as("r"), lit(0L).as("c"))
      .union(rec.select(lit(0L).as("e"), lit(1L).as("r"), lit(0L).as("c")))
      .union(common.select(lit(0L).as("e"), lit(0L).as("r"), lit(1L).as("c")))
    tagged
      .agg(sum(col("e")).as("n_exact"), sum(col("r")).as("n_recalled"),
        sum(col("c")).as("n_common"))
      .na.fill(0L, Seq("n_exact", "n_recalled", "n_common"))
      .select(col("n_exact"), col("n_recalled"), col("n_common"),
        expr("CASE WHEN n_exact = 0 THEN NULL ELSE (n_common * 1000) div n_exact END")
          .as("recall_pm"),
        expr("CASE WHEN n_recalled = 0 THEN NULL ELSE (n_common * 1000) div n_recalled END")
          .as("precision_pm"))
  }

  /** C67 `dedup_threshold_curve` — pair counts by jaccard bucket over
    * an already-built exhaustive pair set, with a descending cumulative
    * ("pairs you would merge at threshold ≥ t"): the tuning artifact
    * read BEFORE committing a 100 TB dedup run to one threshold.
    * Bucketing is per-mille integer floor AFTER the 6-dec rounding, so
    * no FP boundary flapping; the curve itself is ≤ 8 rows, the single
    * window is free. Cost: one pass over the (tiny) pair set — rides
    * the shared checkpointed build in a driver run.
    */
  def dedupThresholdCurve(pairs: DataFrame): DataFrame = {
    val b = pairs
      .withColumn("bucket_pm", expr("(cast(round(jaccard * 1000) as bigint) div 100) * 100"))
      .groupBy(col("bucket_pm")).agg(count(lit(1)).as("n_pairs"))
    val w = Window.orderBy(col("bucket_pm").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("n_pairs_ge", sum(col("n_pairs")).over(w))
      .orderBy(col("bucket_pm"))
  }

  /** C71 `pair_degree_histogram` — degree distribution of the near-dup
    * pair graph: how many docs participate in 1, 2, … near-dup pairs.
    * THE pre-flight check before transitive closure: a fat tail here
    * (template hubs touching thousands of docs) is what blows cluster
    * sizes up to corpus scale; the histogram says so for the price of
    * two tiny aggregates over an already-built pair set.
    */
  def pairDegreeHistogram(pairs: DataFrame): DataFrame =
    pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("degree"))

  /** C72 `cluster_size_histogram` — distribution of near-dup cluster
    * sizes AFTER transitive closure: C71 warns about hubs before the
    * closure, this reports what the closure actually produced — the
    * dedup-rate accounting (Σ(size−1) docs removed) and the sanity
    * check that no mega-cluster swallowed the corpus. Two tiny
    * aggregates over the cluster labels.
    */
  def clusterSizeHistogram(clusters: DataFrame): DataFrame =
    clusters
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))

  /** The (doc_id, band_id, bucket) banding stage shared by
    * [[minhashLshPairs]] and the materialized-index path — one
    * signature kernel pass, `bands` bucket hashes per doc.
    */
  def minhashBanded(documents: DataFrame, k: Int = 8, nHashes: Int = 64,
                    bands: Int = 16): DataFrame = {
    val rows = nHashes / bands
    fanOut(documents).select(
      col("doc_id"),
      graft.expressions.Kernels.minhashSig(col("text"), k, nHashes).as("sig"))
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)), b))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "bucket")
  }

  /** C95 `minhash_band_histogram` — bucket-size distribution per
    * MinHash band, the document-side twin of the embeddings'
    * lsh_bucket_histogram: the observability row that shows whether
    * any band is collapsing into mega-buckets (the quadratic the
    * maxBucket cap guards against) BEFORE a bucket join runs. Two
    * bounded aggregates over [[minhashBanded]]'s output; the oracle
    * groups on the exact signature slice where Spark groups on its
    * xxhash64 — identical sizes under the same collision-freeness the
    * pair joins already rely on.
    */
  def minhashBandHistogram(documents: DataFrame): DataFrame =
    minhashBanded(documents)
      .groupBy(col("band_id"), col("bucket"))
      .agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("band_id").cast("long").as("band_id"), col("bucket_size"))
      .agg(count(lit(1)).as("n_buckets"))
      .orderBy(col("band_id"), col("bucket_size"))

  /** C29 (index half) — materialize the corpus's MinHash band index at
    * rest: (band_id, bucket, doc_id) partitioned by band, bucket-sorted
    * within files so row-group min/max stats prune probe scans. The
    * text itself is NOT in the index — 3 longs per (doc, band), so the
    * index is a small fixed fraction of the corpus and, crucially, the
    * corpus is never re-shingled after this write.
    */
  def writeMinhashIndex(documents: DataFrame, path: String, k: Int = 8,
                        nHashes: Int = 64, bands: Int = 16,
                        filesPerBand: Int = 4): Unit =
    minhashBanded(documents, k, nHashes, bands)
      .repartition(filesPerBand, col("band_id"), pmod(col("bucket"), lit(filesPerBand)))
      .sortWithinPartitions(col("band_id"), col("bucket"), col("doc_id"))
      .write.mode("overwrite").partitionBy("band_id").parquet(path)

  /** C29 `dedup_incremental` — probe a NEW document batch against the
    * materialized index: the incremental-ingestion dedup a continuously
    * growing corpus runs on every arriving shard. Cost model at 100 TB:
    * O(|batch|) signature computation + ONE scan of the (small) index
    * with the batch's bands broadcast — the existing corpus is neither
    * re-shingled nor shuffled (the batch side is the hash side of the
    * join). Emits distinct (new_id, dup_of) candidate pairs — the same
    * S-curve contract as [[minhashLshPairs]] restricted to new×existing.
    */
  def probeMinhashIndex(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                        newDocs: DataFrame, k: Int = 8, nHashes: Int = 64,
                        bands: Int = 16): DataFrame = {
    // Probe covers new×EXISTING only; in-batch duplicates (new×new) are
    // a plain [[minhashLshPairs]] over the batch — tiny by definition.
    val idx = spark.read.parquet(indexPath)
    val probe = minhashBanded(newDocs, k, nHashes, bands)
      .select(col("doc_id").as("new_id"), col("band_id"), col("bucket"))
    idx.join(broadcast(probe), Seq("band_id", "bucket"))
      .filter(col("doc_id") =!= col("new_id"))
      .select(col("new_id"), col("doc_id").as("dup_of"))
      .distinct()
      .orderBy(col("new_id"), col("dup_of"))
  }

  /** Compact the band index after streaming appends
    * ([[graft.streaming.StreamingOps.minhashIndexSink]] retries and
    * re-sent batches leave duplicate rows): per-band distinct rewrite,
    * write-new-then-swap like
    * [[graft.sources.TickStore.compact]]. Probes stay correct without
    * it (DISTINCT output); compaction reclaims the space.
    */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                          filesPerBand: Int = 4): Unit = {
    val tmpPath = indexPath.stripSuffix("/") + "__compacting"
    spark.read.parquet(indexPath).distinct()
      .repartition(filesPerBand, col("band_id"), pmod(col("bucket"), lit(filesPerBand)))
      .sortWithinPartitions(col("band_id"), col("bucket"), col("doc_id"))
      .write.mode("overwrite").partitionBy("band_id").parquet(tmpPath)
    // SESSION conf: runtime fs.* overrides reach the swap like the
    // write above does (it goes through the session-configured writer)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(indexPath).getFileSystem(conf)
    val dst = new org.apache.hadoop.fs.Path(indexPath)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmpPath), dst)
  }

  /** C3 `dedup_simhash` — SimHash near-dup pairs: the 64-bit fingerprint
    * ([[graft.expressions.SimHash64]] kernel) is cut into `chunks`
    * 16-bit words; by pigeonhole, any pair within hamming distance
    * `chunks - 1` shares at least one exact chunk, so candidates come
    * from a chunk-equality join and true hamming (`bit_count(xor)`) is
    * verified on candidates only.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    val width = 64 / chunks
    val fp = fanOut(documents).select(col("doc_id"),
      graft.expressions.Kernels.simhash64(col("text")).as("fp"))
    val chunkCols = (0 until chunks).map(c =>
      shiftrightunsigned(col("fp"), c * width).bitwiseAND(lit((1L << width) - 1)))
    val chunked = fp.select(
      col("doc_id"), col("fp"),
      posexplode(array(chunkCols: _*)))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk")
    // shuffle_hash: same ReusedExchange rationale as the LSH band join
    // — the broadcast plan would run the SimHash64 kernel per join side.
    chunked.as("a").hint("shuffle_hash")
      .join(chunked.as("b").hint("shuffle_hash"),
        col("a.chunk_id") === col("b.chunk_id") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C90 `simhash_hamming_histogram` — the distance DISTRIBUTION the
    * simhash threshold knob is tuned against: pair counts by hamming
    * distance for every pair within `maxHamming`. Runs [[simhashPairs]]
    * with 8-bit chunks so the pigeonhole guarantee covers h ≤ 7 — the
    * candidate set provably contains EVERY such pair, making the
    * histogram exact, not a sample of whatever candidates survived.
    * One bounded aggregate over the O(near-dup pairs) output.
    */
  def simhashHammingHistogram(documents: DataFrame): DataFrame =
    simhashPairs(documents, maxHamming = 7, chunks = 8)
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming"))

  /** C30 `dedup_winnow` — MOSS-style near-dup pairs (Schleimer et al.,
    * SIGMOD 2003 §4): docs sharing ≥ `minShared` winnowing fingerprints,
    * with the shared count as the match strength. Winnowing guarantees
    * any k..(k+w−1)-char common substring leaves ≥ 1 shared fingerprint,
    * so unlike MinHash's probabilistic S-curve this detects bounded
    * VERBATIM overlap (plagiarized spans, boilerplate blocks)
    * deterministically.
    *
    * Shape at 100 TB: fingerprints from one compiled kernel pass
    * ([[graft.expressions.WinnowFingerprints]]); df-cap drops
    * corpus-wide boilerplate fingerprints (count window, same partition
    * the join reuses — one exchange feeds both); pair work is
    * posting-list bounded (≤ maxDf²/2 per fingerprint), never all-pairs.
    * `n_shared` counts matches among SURVIVING (df ≤ maxDf)
    * fingerprints — the df-cap is part of the contract, as in
    * [[ngramJaccardPairs]].
    */
  def winnowPairs(documents: DataFrame, k: Int = 8, w: Int = 4,
                  minShared: Long = 10, maxDf: Long = 20): DataFrame = {
    val fps = fanOut(documents).select(col("doc_id"),
      explode(graft.expressions.Kernels.winnow(col("text"), k, w)).as("fp"))
    val capped = fps
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("df") <= maxDf)
      .select(col("doc_id"), col("fp"))
    // shuffle_hash: same ReusedExchange rationale as the LSH band join
    // — the broadcast plan would run the winnow kernel per join side.
    capped.as("a").hint("shuffle_hash").join(capped.as("b").hint("shuffle_hash"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C14 `top_ngrams` — corpus-wide token-bigram frequencies, top `k`.
    * One explode + one shuffle with map-side combine; rank with a total
    * tie-break so the cut is deterministic.
    */
  def topNgrams(documents: DataFrame, k: Int): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    val bigrams = documents
      .filter(length(trim(col("text"))) > 0)
      .select(explode(
        zip_with(slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)
    bigrams
  }

  /** C15 `dedup_clusters` — connected components over the near-dup pair
    * graph: every document labeled with the smallest doc_id reachable
    * through near-dup edges (its dedup cluster representative).
    *
    * Iterative min-label propagation: each round joins current labels
    * across edges and takes the min; converges in ≤ diameter rounds
    * (near-dup clusters are tiny — a handful of rounds). Driver loop
    * only checks convergence counts; all data work is distributed. At
    * web scale this is the standard large-star/small-star shape.
    */
  def nearDupClusters(documents: DataFrame, pairs: DataFrame,
                      driverSideMaxPairs: Long = 1000000L): DataFrame = {
    val spark = documents.sparkSession
    val edgeRows = pairs.select(col("doc_a"), col("doc_b")).persist()
    val nPairs = edgeRows.count()
    val result =
      if (nPairs <= driverSideMaxPairs) {
        // HYBRID fast path: the pair set is the already-reduced output of
        // LSH/threshold filtering — O(duplicates), not O(corpus). A
        // driver union-find over it is one collect + one broadcast join;
        // the corpus itself never leaves the cluster.
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
          r
        }
        edgeRows.collect().foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val labels = parent.keys.map(k => (k, find(k))).toSeq
        import spark.implicits._
        val labelDf = labels.toDF("doc_id", "root")
        documents.select(col("doc_id"))
          .join(broadcast(labelDf), Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
      } else {
        // distributed min-label propagation for graphs too big to collect
        val edges = edgeRows.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .unionByName(edgeRows.select(col("doc_b").as("src"), col("doc_a").as("dst")))
          .distinct()
          .persist()
        var labels = documents.select(col("doc_id"), col("doc_id").as("cluster_id")).persist()
        var changed = 1L
        var rounds = 0
        while (changed > 0 && rounds < 50) {
          val viaEdges = edges
            .join(labels.withColumnRenamed("doc_id", "dst").withColumnRenamed("cluster_id", "nbr"), Seq("dst"))
            .groupBy(col("src").as("doc_id"))
            .agg(min(col("nbr")).as("nbr_min"))
          val next = labels.join(viaEdges, Seq("doc_id"), "left")
            .select(col("doc_id"),
              least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
            .persist()
          changed = next.join(labels.withColumnRenamed("cluster_id", "old"), Seq("doc_id"))
            .filter(col("cluster_id") =!= col("old")).count()
          labels.unpersist()
          labels = next
          rounds += 1
        }
        edges.unpersist()
        // Detach the converged labels from their persist (which would
        // otherwise leak — the returned plan has no unpersist point):
        // checkpoint blocks are ContextCleaner-reclaimed when the plan
        // is dropped.
        val converged = labels.localCheckpoint(true)
        labels.unpersist()
        converged
      }
    edgeRows.unpersist()
    result.orderBy(col("doc_id"))
  }

  /** C26 `decontaminate` — benchmark-contamination screen: corpus
    * documents sharing any length-`k` character shingle with an
    * EVAL-SET document get flagged with the count of distinct shared
    * shingles (the n-gram–overlap decontamination step every training
    * build runs before shipping data). The eval set is tiny by
    * definition → its shingle set broadcasts; the corpus side is one
    * scan + explode, no self-join.
    */
  def decontaminate(documents: DataFrame, evalIds: Seq[Long], k: Int = 13): DataFrame = {
    val evalShingles = documents
      .filter(col("doc_id").isin(evalIds: _*))
      .select(explode(shingles(col("text"), k)).as("s"))
      .distinct()
    fanOut(documents)
      .filter(!col("doc_id").isin(evalIds: _*))
      .select(col("doc_id"), explode(shingles(col("text"), k)).as("s"))
      .join(broadcast(evalShingles), Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("s")).as("n_shared_shingles"))
      .orderBy(col("doc_id"))
  }

  /** C131 `decontaminate_words` — word-level 13-gram decontamination,
    * the published exact-sequence rule (GPT-3's appendix-style
    * train/test overlap filter): a training doc is flagged when it
    * shares ANY exact 13-token run with the eval set. Tokens are the
    * corpus whitespace-lower convention; eval n-grams are the always-
    * tiny broadcast side. Complements C26 [[decontaminate]] (char
    * 13-shingles — formatting-invariant overlap) with the named
    * word-sequence method; same scale shape (train side scanned once,
    * eval grams broadcast).
    */
  def decontaminateWords(documents: DataFrame, evalIds: Seq[Long], n: Int = 13): DataFrame = {
    def grams(toks: Column): Column =
      when(size(toks) < n, expr("cast(array() as array<string>)"))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
    val tokCol = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    val evalGrams = documents
      .filter(col("doc_id").isin(evalIds: _*))
      .select(explode(grams(tokCol)).as("g"))
      .distinct()
    fanOut(documents)
      .filter(!col("doc_id").isin(evalIds: _*))
      .select(col("doc_id"), explode(grams(tokCol)).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("g")).as("n_shared_ngrams"))
      .orderBy(col("doc_id"))
  }

  /** C132 `dedup_survivors_quality` — survivor selection by QUALITY
    * instead of min-id: each near-dup cluster keeps its longest
    * member (n_chars, doc_id tie-break) — the policy real pipelines
    * run (the canonical copy is usually the fullest one; min-id keeps
    * whatever crawled first). Same shape as C23 [[dedupSurvivors]]
    * plus one rank window over the cluster-labeled corpus.
    */
  def dedupSurvivorsQuality(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    nearDupClusters(documents, pairs)
      .join(documents.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(
        max(when(col("rk") === 1, col("doc_id"))).as("rep_doc_id"),
        max(when(col("rk") === 1, col("n_chars"))).as("rep_chars"),
        count(lit(1)).as("n_members"))
      .orderBy(col("cluster_id"))
  }

  /** C134 `dedup_method_venn` — three-way overlap of the exact /
    * MinHash-verified / SimHash duplicate-pair sets: the
    * method-agreement report that says which near-dup detector is
    * finding what (exact ⊂ both in theory; minhash∖simhash = lexical
    * near-dups with spread-out edits, simhash∖minhash = token-bag
    * rearrangements). Each set is materialized once (they are
    * duplicates-sized, not corpus-sized — at 100 TB this harness runs
    * on a sample, as every pairwise evaluation here does) and the
    * seven region counts come from one tagged union — no constant-key
    * joins. The exact arm is STAR pairs (group rep = min doc_id →
    * each other member), joined on md5(text) with a residual text
    * verify: the shuffle key is 32 hex chars instead of the whole
    * document, and an exact group of size g emits g−1 pairs instead
    * of g(g−1)/2 — group-size independent. md5 exists on both
    * engines, so the oracle replays the identical convention
    * (including the residual verify, which makes even a hash
    * collision behave identically on both sides).
    */
  def dedupMethodVenn(documents: DataFrame, threshold: Double = 0.3,
                      maxHamming: Int = 3,
                      mhPairs: Option[DataFrame] = None): DataFrame = {
    val hashed = documents.select(col("doc_id"), col("text"), md5(col("text")).as("h"))
    val reps = hashed.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("text"))).as("r"))
    val exact = hashed.join(reps, Seq("h"))
      .filter(col("doc_id") =!= col("r.doc_id") && col("text") === col("r.text"))
      .select(col("r.doc_id").as("doc_a"), col("doc_id").as("doc_b"))
      .localCheckpoint(true)
    // `mhPairs`: the shared two-stage verified pair set (SparkEntry's
    // verifiedPairsMemo — minhash_verified keeps the real build row),
    // so one driver run pays the LSH+verify pipeline once instead of
    // once here and once in minhash_verified. Must be the same
    // (k, nHashes, bands, threshold) operating point.
    val mh = mhPairs.getOrElse(minhashVerifiedPairs(documents, threshold = threshold))
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val sh = simhashPairs(documents, maxHamming = maxHamming)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val keys = Seq("doc_a", "doc_b")
    def tag(df: DataFrame, e: Int, m: Int, s: Int, em: Int, es: Int, ms: Int, ems: Int) =
      df.select(lit(e.toLong).as("e"), lit(m.toLong).as("m"), lit(s.toLong).as("s"),
        lit(em.toLong).as("em"), lit(es.toLong).as("es"), lit(ms.toLong).as("ms"),
        lit(ems.toLong).as("ems"))
    val em = exact.join(mh, keys)
    val es = exact.join(sh, keys)
    val ms = mh.join(sh, keys)
    val ems = em.join(sh, keys)
    tag(exact, 1, 0, 0, 0, 0, 0, 0)
      .union(tag(mh, 0, 1, 0, 0, 0, 0, 0))
      .union(tag(sh, 0, 0, 1, 0, 0, 0, 0))
      .union(tag(em, 0, 0, 0, 1, 0, 0, 0))
      .union(tag(es, 0, 0, 0, 0, 1, 0, 0))
      .union(tag(ms, 0, 0, 0, 0, 0, 1, 0))
      .union(tag(ems, 0, 0, 0, 0, 0, 0, 1))
      .agg(sum(col("e")).as("n_exact"), sum(col("m")).as("n_minhash"),
        sum(col("s")).as("n_simhash"), sum(col("em")).as("n_exact_minhash"),
        sum(col("es")).as("n_exact_simhash"), sum(col("ms")).as("n_minhash_simhash"),
        sum(col("ems")).as("n_all_three"))
      .na.fill(0L)
  }

  /** C23 `dedup_survivors` — the deduplicated corpus materialization:
    * one representative (the cluster label = min doc_id) per near-dup
    * cluster, with the cluster size kept as the audit column. This is
    * the step that actually SHRINKS the corpus after [[nearDupClusters]]
    * labels it; singletons survive with n_members = 1. Same scale shape
    * as clusters plus one tiny aggregation on the label.
    */
  def dedupSurvivors(documents: DataFrame, pairs: DataFrame): DataFrame =
    nearDupClusters(documents, pairs)
      .groupBy(col("cluster_id").as("doc_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("doc_id"))

  /** C73 `dup_inflation` — TOKEN-weighted duplication per source: doc
    * counts understate duplication when the duplicated documents are
    * the long ones, and token mass is what the training-compute bill
    * is denominated in. A document is "duplicate mass" when it is not
    * its cluster's canonical (cluster label = min doc_id, the
    * [[dedupSurvivors]] convention); inflation_pm = 1000·total/unique
    * tokens. NULL when a source's every token is duplicate mass (its
    * canonicals all live in other sources). Rides [[nearDupClusters]]'
    * O(duplicates) labeling + one corpus scan for token counts — all
    * integer arithmetic after the join.
    */
  def dupInflation(documents: DataFrame, pairs: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("source"),
        graft.functions.TextFns.wsTokenCount(col("text")).cast("long").as("n_toks"))
      .join(nearDupClusters(documents, pairs), Seq("doc_id"))
      .withColumn("is_dup", col("cluster_id") =!= col("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("n_toks")).as("tokens_total"),
        sum(when(col("is_dup"), col("n_toks")).otherwise(lit(0L))).as("tokens_dup"))
      .withColumn("inflation_pm", expr(
        """CASE WHEN tokens_total - tokens_dup = 0 THEN NULL
          |ELSE (1000 * tokens_total) div (tokens_total - tokens_dup) END""".stripMargin))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        col("tokens_total"), col("tokens_dup"), col("inflation_pm"))
      .orderBy(col("source"))

  /** C4 `ngram_jaccard` — n-gram shingle Jaccard pairs ≥ threshold.
    * Candidates via the inverted shingle index (explode + equality
    * join); |∩| from the join, |∪| from per-doc set sizes. At corpus
    * scale the explode join needs a document-frequency cap on shingles
    * (stop-shingle removal) to bound the worst posting list — kept here
    * as `maxDf`.
    */
  /** `prefixFilter` (PPJoin-style) is worth it only at HIGH thresholds:
    * prefix length is |S|·(1−t)+1, so at t=0.3 the "prefix" is 70% of
    * each doc and the extra joins cost more than they save (measured
    * 5 s → 21 s at sf0.1); at t≥0.8 it prunes candidates by orders of
    * magnitude. Defaults off; equality with the exhaustive path is
    * spec-asserted either way.
    */
  def ngramJaccardPairs(documents: DataFrame, k: Int = 8, threshold: Double = 0.3,
                        maxDf: Long = Long.MaxValue, prefixFilter: Boolean = false): DataFrame =
    shinglePairCounts(documents, k, threshold, maxDf, prefixFilter)
      .withColumn("jaccard",
        u6(col("inter") / (col("sz_a") + col("sz_b") - col("inter")).cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** C49 `containment` — n-gram CONTAINMENT pairs: |A∩B| / min(|A|,|B|)
    * ≥ threshold. Jaccard penalizes length mismatch (a paragraph quoted
    * verbatim inside a long article scores near 0), so containment is
    * the detector for subset duplication — quotes, boilerplate
    * inclusion, truncated copies. Same inverted-index candidate build
    * and df cap as [[ngramJaccardPairs]] (one shared shuffle shape);
    * only the score differs. PPJoin prefix pruning is jaccard-specific
    * and stays off here.
    */
  def containmentPairs(documents: DataFrame, k: Int = 8, threshold: Double = 0.5,
                       maxDf: Long = Long.MaxValue): DataFrame =
    shinglePairCounts(documents, k, threshold, maxDf, prefixFilter = false)
      .withColumn("containment",
        u6(col("inter") / least(col("sz_a"), col("sz_b")).cast("double")))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("containment"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** C54 `dup_by_source` — cross-source duplication matrix: near-dup
    * pairs attributed to their source pair — WHICH corpora duplicate
    * WHICH (mirror sites, scrape overlap, wholesale copying) and how
    * much of the duplication is within-source. The provenance table a
    * corpus audit reads before deciding which source to drop. Source
    * pairs are unordered (least/greatest): doc_a < doc_b orders ids,
    * not sources. The source lookup joins the PAIR set
    * (duplicates-sized, never the corpus) twice on doc_id —
    * broadcast-sized at any corpus scale.
    *
    * Pairs come from [[minhashVerifiedPairs]] — the BANDED two-stage
    * production path (LSH candidates, exact-jaccard verify per
    * candidate only), NOT the exhaustive [[ngramJaccardPairs]] posting
    * build this op rode through r11: pair mass is quadratic in
    * duplicate density, and the exhaustive build measured ×20.5 at
    * ×10 data (the one super-linear batch plan in the r11 audit).
    * Work is now bounded by the bands' S-curve — candidates ≈ true
    * dups, never corpus². Recall is the banding's (the C5b argument);
    * the driver oracle replays the bands + verify in SQL, so the
    * matrix is still hash-exact.
    */
  def dupBySource(documents: DataFrame, k: Int = 8, nHashes: Int = 64,
                  bands: Int = 16, threshold: Double = 0.3): DataFrame = {
    val src = documents.select(col("doc_id"), col("source"))
    minhashVerifiedPairs(documents, k, nHashes, bands, threshold)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("source_a")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("source_b")), Seq("doc_b"))
      .withColumn("src_lo", least(col("source_a"), col("source_b")))
      .withColumn("src_hi", greatest(col("source_a"), col("source_b")))
      .groupBy(col("src_lo"), col("src_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_lo"), col("src_hi"))
  }

  /** C56 `shingle_novelty` — per-document novelty: the per-mille share
    * of a doc's shingles whose FIRST corpus witness (min doc_id) is the
    * doc itself. The redundancy curve of a growing corpus — novelty
    * falling toward 0 as ingestion proceeds is the quantitative "we're
    * scraping the same web again" signal, and low-novelty docs are
    * dedup candidates even when no single pair crosses a similarity
    * threshold (death by a thousand boilerplate fragments). First
    * witness is a min WINDOW over the shingle (no self-join — the
    * jaccard df-cap trick), then one doc_id aggregate: two shuffles,
    * both on bounded-width keys. Docs shorter than k emit no shingles
    * and no row (documented).
    */
  def shingleNovelty(documents: DataFrame, k: Int = 8): DataFrame = {
    val wS = Window.partitionBy(col("s"))
    fanOut(documents)
      .select(col("doc_id"), explode(shingles(col("text"), k)).as("s"))
      .withColumn("first_doc", min(col("doc_id")).over(wS))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_pm", expr("(n_novel * 1000) div n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** The shared candidate/intersection build behind [[ngramJaccardPairs]]
    * and [[containmentPairs]]: (doc_a, doc_b, inter, sz_a, sz_b) for
    * every pair sharing ≥ 1 surviving shingle. `threshold` is used only
    * by the jaccard-specific prefix-filter branch.
    */
  private def shinglePairCounts(documents: DataFrame, k: Int, threshold: Double,
                                maxDf: Long, prefixFilter: Boolean): DataFrame = {
    // collect_list perf note: ObjectHashAggregate falls back to
    // sort-based aggregation after 128 distinct keys per task — the
    // fallback threshold is raised to 128k at SESSION setup
    // (GraftConf.tune), not here, so the operator has no hidden
    // session-wide side effects. Measured 6.6 s → 4.1 s on the sf0.1
    // pair build.
    // Inverted index: one shuffle on the shingle; the df cap
    // (stop-shingle removal) bounds the worst posting list.
    val sh = fanOut(documents)
      .select(col("doc_id"), explode(shingles(col("text"), k)).as("s"))
    // The df cap comes from a COUNT WINDOW over the shingle, not a
    // posting-list build: every downstream consumer (pair generation,
    // both size lookups) then shares the single hashpartitioning(s)
    // exchange via ReusedExchange — no multi-consumer cache, no
    // persist/checkpoint lifecycle to manage (a persist here would
    // either leak or force an extra materialization job).
    val wS = Window.partitionBy(col("s"))
    val sh2 = sh.withColumn("df", count(lit(1)).over(wS))
      .filter(col("df") <= maxDf)
    val shf = sh2.select(col("doc_id"), col("s"))
    val sizes = sh2.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    // Posting lists — built ONLY over shingles shared by ≥ 2 docs: a
    // df=1 shingle (the long tail of any corpus) contributes to sizes
    // but can never produce a pair, so it never enters the aggregate.
    // The groupBy rides the window's hashpartitioning(s) — no exchange.
    lazy val posts = sh2.filter(col("df") >= 2)
      .groupBy(col("s")).agg(collect_list(col("doc_id")).as("ids"))
    val inter =
      if (!prefixFilter) {
        // candidate pairs straight from posting lists (SortedPairs
        // generator, map-side-combinable counts)
        posts
          .select(graft.expressions.SortedPairs(col("ids")).as(Seq("doc_a", "doc_b")))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("inter"))
      } else {
        // PPJoin-style prefix filtering: order each doc's shingles by
        // (global df, shingle); any pair with jaccard ≥ t must share a
        // shingle among the first |S| - ceil(t·|S|) + 1 of BOTH docs, so
        // candidates come from the prefix⨝prefix join only (rare
        // shingles first → tiny posting lists), then the true
        // intersection is counted just for candidates.
        val rankW = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
        val ranked = sh2
          .withColumn("rank", row_number().over(rankW))
          .join(sizes, Seq("doc_id"))
          .withColumn("prefix_len",
            col("sz") - ceil(col("sz") * threshold).cast("long") + 1)
        val prefix = ranked.filter(col("rank") <= col("prefix_len"))
          .select(col("doc_id"), col("s"))
        val cand = prefix.as("a")
          .join(prefix.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        cand
          .join(shf.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
          .join(shf.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("inter"))
      }
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), Seq("doc_b"))
  }

  /** C33 `sim_pagerank` — authority scores over the near-dup similarity
    * graph: fixed-iteration PageRank where nodes are documents and edges
    * any symmetric pair set (here [[ngramJaccardPairs]]). Ranks each
    * near-dup cluster's members by connectivity — a principled survivor
    * choice for [[dedupSurvivors]] (keep the most-central copy, not the
    * min-id one) and a template-hub detector (high-degree nodes are
    * boilerplate).
    *
    * ALL-INTEGER fixed-point (micro-units): pr₀ = 10⁶ per node;
    * pr_{t+1}(v) = 150 000 + (85 · Σ_{u→v} (pr_t(u) div deg(u))) div 100
    * — the damping-0.85 update with every division an integer `div`, so
    * `iters` rounds replay value-for-value in any engine (float PageRank
    * would accumulate reduction-order drift). Fixed iteration count, not
    * convergence detection: deterministic output AND no driver round
    * trips.
    *
    * Scale shape: per iteration one hash join (edges ⨝ ranks on src) and
    * one shuffle aggregation on dst — the standard Pregel message-passing
    * step as two Catalyst operators. `edges`/`deg` are loop-invariant and
    * persisted once; ranks are the only iterated state. Edge partitioning
    * is reused across iterations by the shuffle-reuse rule.
    */
  /** C34 `triangle_count` — triangle membership + local clustering
    * coefficient per document over the near-dup graph: a triangle means
    * THREE mutually-similar documents — much stronger template/
    * boilerplate evidence than a lone pair — and
    * `coeff = 2·tri / (deg·(deg−1))` separates tight duplicate cliques
    * (→1) from hub-and-spoke template matches (→0). Input pairs are
    * canonical (doc_a < doc_b), so each triangle a<b<c is enumerated
    * exactly once via (a,b)⨝(b,c)⨝(a,c); each member gets one credit.
    * Every doc with ≥1 edge is emitted (n_triangles 0 is meaningful);
    * the coefficient is one IEEE division of exact integers —
    * deterministic cross-engine.
    *
    * Scale: two hash joins on the PAIR set (O(duplicates), not corpus)
    * — the standard enumeration. At web scale, orient edges
    * low-degree→high-degree first so the join fan-out is bounded by
    * arboricity, and df-cap hubs (the same guardrail the posting joins
    * use upstream).
    */
  def triangleCount(pairs: DataFrame): DataFrame = {
    // Materialize the pair set ONCE: it appears five times (3 triangle
    // branches + 2 degree sides), and without a cut Catalyst re-derives
    // the whole upstream pair pipeline (shingle explode + posting join)
    // per branch — measured 7.5 s → ~4 s at sf0.1. The pair set is
    // O(duplicates)-small by construction, so the checkpoint is cheap;
    // blocks are ContextCleaner-reclaimed when the plan is dropped.
    val e = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val deg = e.select(col("doc_a").as("doc_id"))
      .unionByName(e.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("degree"))
    val tri = e
      .join(e.select(col("doc_a").as("doc_b"), col("doc_b").as("doc_c")), Seq("doc_b"))
      .join(e.select(col("doc_a"), col("doc_b").as("doc_c")), Seq("doc_a", "doc_c"))
    val triDocs = tri
      .select(explode(array(col("doc_a"), col("doc_b"), col("doc_c"))).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_triangles"))
    deg.join(triDocs, Seq("doc_id"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("clustering_coeff",
        when(col("degree") >= 2,
          u6(col("n_triangles") * 2.0 / (col("degree") * (col("degree") - 1)))))
      .select(col("doc_id"), col("degree"), col("n_triangles"), col("clustering_coeff"))
      .orderBy(col("doc_id"))
  }

  def simPagerank(documents: DataFrame, pairs: DataFrame, iters: Int = 3): DataFrame = {
    // Cut the pair pipeline before symmetrizing: the union's two
    // branches would otherwise each re-derive the full upstream
    // shingle/posting plan (same fix as [[triangleCount]]).
    val base = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val sym = base.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(base.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val edges = sym.persist()
    val deg = edges.groupBy(col("src").as("doc_id")).agg(count(lit(1)).as("deg")).persist()
    val nodes = documents.select(col("doc_id"))
    var pr = nodes.withColumn("pr", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.withColumnRenamed("doc_id", "src"), Seq("src"))
        .join(deg.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"), expr("pr div deg").as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("c"))
      pr = nodes.join(contrib, Seq("doc_id"), "left")
        .select(col("doc_id"),
          expr("cast(150000 + (85 * coalesce(c, cast(0 as bigint))) div 100 as bigint)").as("pr"))
    }
    // Materialize before dropping the loop-invariant caches; the returned
    // plan then no longer references them (no silent recompute, no leak).
    val out = pr.localCheckpoint(true)
    edges.unpersist()
    deg.unpersist()
    out.orderBy(col("doc_id"))
  }

  /** C122 `cross_lang_dups` — near-dup candidate pairs whose two docs
    * carry DIFFERENT language labels, counted per unordered label pair:
    * the translation-leak / mislabeled-boilerplate detector (a high
    * en×fr count means either the lang labels lie or templates cross
    * locales — both poison per-language mixes). Pairs are the C2 LSH
    * candidates; the lang lookup joins the pair set (≈ true dups),
    * never the corpus.
    */
  def crossLangDups(documents: DataFrame): DataFrame = {
    val langs = documents.select(col("doc_id"), col("lang"))
    minhashLshPairs(documents)
      .join(langs.select(col("doc_id").as("doc_a"), col("lang").as("la")), Seq("doc_a"))
      .join(langs.select(col("doc_id").as("doc_b"), col("lang").as("lb")), Seq("doc_b"))
      .select(least(col("la"), col("lb")).as("lang_lo"),
        greatest(col("la"), col("lb")).as("lang_hi"))
      .groupBy(col("lang_lo"), col("lang_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("cross_lang", col("lang_lo") =!= col("lang_hi"))
      .orderBy(col("lang_lo"), col("lang_hi"))
  }

  /** C123 `near_dup_length_ratio` — length-ratio distribution of the
    * near-dup candidate pairs (min/max char length per-mille, bucketed
    * by decile): a mass of LOW-ratio pairs means truncation — one side
    * of each dup lost its tail (a crawler or pipeline cut), which
    * jaccard alone hides behind "similar enough". Pair-bounded work.
    */
  def nearDupLengthRatio(documents: DataFrame): DataFrame = {
    val lens = documents.select(col("doc_id"), col("n_chars"))
    minhashLshPairs(documents)
      .join(lens.select(col("doc_id").as("doc_a"), col("n_chars").as("ca")), Seq("doc_a"))
      .join(lens.select(col("doc_id").as("doc_b"), col("n_chars").as("cb")), Seq("doc_b"))
      .withColumn("ratio_pm", when(greatest(col("ca"), col("cb")) === 0, lit(0L))
        .otherwise(expr("(1000 * least(ca, cb)) div greatest(ca, cb)")))
      .withColumn("bucket", least(expr("ratio_pm div 100"), lit(9L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("bucket"))
  }

  /** C124 `shingle_df_histogram` — document-frequency histogram of the
    * 8-char shingles in power-of-two buckets: the distribution behind
    * [[ngramJaccardPairs]]' df cap (maxDf = 100) — how much posting
    * mass the cap removes and how heavy the stop-shingle tail is, BEFORE
    * a 100 TB posting join commits to the knob. One distinct-explode +
    * two bounded integer aggregates.
    */
  def shingleDfHistogram(documents: DataFrame, k: Int = 8): DataFrame =
    fanOut(documents)
      .select(col("doc_id"), explode(shingles(col("text"), k)).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      // floor(log2(df)) via the binary-string length — pure integer,
      // no cross-engine log2 rounding to reason about
      .withColumn("bucket", (length(bin(col("df"))) - 1).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("posting_mass"))
      .orderBy(col("bucket"))

  /** C99 `line_dups` — C4-style line-level duplication per document:
    * trimmed lines of `minLen`+ chars counted across the WHOLE corpus,
    * each doc reporting how many of its lines occur more than once
    * anywhere (within-doc repeats count, as in C4's line dedup). The
    * per-mille is the "how much of this doc is boilerplate lines"
    * number that [[prefixDups]]/[[suffixDups]] approximate at doc
    * granularity. Grouping is on the literal trimmed line so the
    * oracle replays bitwise; at 100 TB the shuffle key would be
    * xxhash64(line) with identical downstream shape (the hash only
    * narrows the key bytes — same aggregate, same join).
    */
  def lineDups(documents: DataFrame, minLen: Int = 10): DataFrame = {
    val lines = documents
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("raw"))
      .select(col("doc_id"), trim(col("raw")).as("line"))
      .filter(length(col("line")) >= minLen)
    val counts = lines.groupBy(col("line")).agg(count(lit(1)).as("n_occ"))
    val perDoc = lines.join(counts, Seq("line"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_lines"))
    // Left-join back so a doc with ZERO qualifying lines still appears
    // (n_lines = 0, dup_pm NULL): "no boilerplate" and "not measured"
    // are different answers (r7 ADVICE — the inner groupBy can never
    // emit n_lines = 0 on its own).
    documents.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_dup_lines"), lit(0L)).as("n_dup_lines"))
      .withColumn("dup_pm", when(col("n_lines") === 0, lit(null))
        .otherwise(expr("(1000 * n_dup_lines) div n_lines")))
      .orderBy(col("doc_id"))
  }

  /** C101 `edit_similarity` — MinHash LSH candidates verified by REAL
    * edit distance on length-capped prefixes: the third verification
    * lens next to shingle jaccard ([[minhashVerifiedPairs]]) and
    * embedding cosine (`lsh_verified_pairs`) — Levenshtein sees
    * reorderings and small in-place edits that set-based jaccard
    * washes out. Classic DP distance is engine-portable integer; the
    * `maxLen` cap bounds the per-pair O(cap²) cell count (the knob
    * that keeps the verify pass cheaper than the candidate build),
    * and the candidate set (never the corpus) pays it. Similarity =
    * (maxlen − dist)/maxlen in integer per-mille.
    */
  def editSimilarity(documents: DataFrame, k: Int = 8, nHashes: Int = 64,
                     bands: Int = 16, maxLen: Int = 128): DataFrame = {
    val cands = minhashLshPairs(documents, k, nHashes, bands)
    val texts = documents.select(col("doc_id"), substring(col("text"), 1, maxLen).as("t"))
    cands
      .select(col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .join(texts, Seq("doc_id"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(when(col("doc_id") === col("doc_a"), col("t")), ignoreNulls = true).as("ta"),
        first(when(col("doc_id") === col("doc_b"), col("t")), ignoreNulls = true).as("tb"))
      // CPU-dense, byte-light: the pair rows are tiny, so AQE's
      // size-based coalescing funnels ALL the DP work into one task
      // (probed 6× at 2× data). A user-specified partition count is
      // exempt from coalescing and spreads the quadratic kernel.
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_a"), col("doc_b"))
      // equality fast path (dist(x, x) = 0 without the DP) plus the
      // 128-char cap: the candidate set pays O(cap²) per pair, and the
      // 256-char cap measured 4× the whole LSH build at sf0.1
      .withColumn("dist", when(col("ta") === col("tb"), lit(0L))
        .otherwise(levenshtein(col("ta"), col("tb")).cast("long")))
      .withColumn("m", greatest(length(col("ta")), length(col("tb"))).cast("long"))
      .withColumn("sim_pm", when(col("m") === 0, lit(null))
        .otherwise(expr("(1000 * (m - dist)) div m")))
      .select(col("doc_a"), col("doc_b"), col("dist"), col("sim_pm"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C106 `simhash_bit_balance` — per-bit set-share of the 64-bit
    * SimHash across the corpus: a healthy hash family keeps every bit
    * near 500‰; a stuck bit (degenerate mixing, or a corpus so
    * templatic one token dominates every vote) silently halves the
    * effective fingerprint width BEFORE any hamming threshold is
    * tuned. One kernel pass + one 64-row aggregate. Token-less
    * documents are excluded (they cast no votes — the same rows the
    * oracle's vote CTE never sees).
    */
  def simhashBitBalance(documents: DataFrame): DataFrame =
    fanOut(documents)
      .filter(length(trim(col("text"))) > 0)
      .select(graft.expressions.Kernels.simhash64(col("text")).as("sim"))
      .select(explode(expr(
        "transform(sequence(0, 63), j -> struct(cast(j as bigint) as bit_pos, " +
          "cast(shiftright(sim, j) & 1 as bigint) as b))")).as("e"))
      .groupBy(col("e.bit_pos").as("bit_pos"))
      .agg(count(lit(1)).as("n_docs"), sum(col("e.b")).as("n_set"))
      .withColumn("set_pm", when(col("n_docs") === 0, lit(null))
        .otherwise(expr("(1000 * n_set) div n_docs")))
      .orderBy(col("bit_pos"))

  /** C107 `winnow_density` — winnowing fingerprint density per doc:
    * selected fingerprints over hash windows, against the theoretical
    * 2/(w+1) for random text. The parameter-QC read before a
    * [[winnowPairs]] run — density far above theory means repetitive
    * text is defeating the min-sampling (more index, less selectivity).
    * Map-only kernel scan; counts integer, density integer per-mille.
    */
  def winnowDensity(documents: DataFrame, k: Int = 8, w: Int = 4): DataFrame =
    documents
      .select(col("doc_id"),
        size(graft.expressions.Kernels.winnow(col("text"), k, w)).cast("long").as("n_fps"),
        (length(col("text")) - (k + w - 2)).cast("long").as("n_windows"))
      .filter(col("n_windows") >= 1)
      .withColumn("density_pm", expr("(1000 * n_fps) div n_windows"))
      .orderBy(col("doc_id"))

  /** C108 `contamination_curve` — [[decontaminate]] swept across
    * shingle lengths: how many train docs share at least one k-char
    * shingle with the eval set, for k ∈ {5, 8, 13}. Short shingles
    * over-flag (common phrases), long ones under-flag (only verbatim
    * spans) — this 3-row curve is what picks the production k before
    * a decontamination pass is trusted. One shingle-kernel pass per k
    * (each the linear decontaminate shape: eval side broadcast,
    * train side scan + semi-style join).
    */
  def contaminationCurve(documents: DataFrame, evalIds: Seq[Long],
                         ks: Seq[Int] = Seq(5, 8, 13)): DataFrame = {
    // ONE corpus pass for the whole curve instead of one per k (3 full
    // text scans + 3 joins + a 3-way union → 1 each, guide §2.4): the
    // train side explodes every k's shingles tagged with k, the eval
    // side is the k-tagged union of the (tiny, broadcast) eval shingle
    // sets, and the equality join keys on (k, shingle) so each k's
    // matches are exactly the per-k join's. Shingle-kernel work is
    // identical (all ks must be shingled either way); what the fold
    // removes is the repeated corpus scan + per-k plan.
    val spark = documents.sparkSession
    import spark.implicits._
    val kMap = map(ks.flatMap(k => Seq(lit(k.toLong), shingles(col("text"), k))): _*)
    val evalShingles = documents
      .filter(col("doc_id").isin(evalIds: _*))
      .select(explode(kMap))
      .select(col("key").as("k"), explode(col("value")).as("s"))
      .distinct()
    val agg = fanOut(documents)
      .filter(!col("doc_id").isin(evalIds: _*))
      .select(col("doc_id"), explode(kMap))
      .select(col("doc_id"), col("key").as("k"), explode(col("value")).as("s"))
      .join(broadcast(evalShingles), Seq("k", "s"))
      .groupBy(col("k"))
      .agg(count_distinct(col("doc_id")).as("n_contaminated"),
        count_distinct(col("doc_id"), col("s")).as("n_shared_shingles"))
    // k-spine left join: a k whose join matched nothing still emits its
    // zero row (the per-k global aggregates of the pre-fold form did)
    ks.map(_.toLong).toDF("k")
      .join(agg, Seq("k"), "left")
      .na.fill(0L, Seq("n_contaminated", "n_shared_shingles"))
      .orderBy(col("k"))
  }

  /** C110 `band_sweep` — candidate-volume curve across LSH band
    * widths: for each band count b (8/16/32 bands of 64 hashes), the
    * total pair SLOTS Σ n·(n−1)/2 over (band, bucket) populations and
    * the hot-bucket count. This is the S-curve knob's cost side —
    * [[dedupThresholdCurve]] prices the threshold, this prices the
    * banding — read together before a 100 TB run commits to one
    * (bands, rows) point. ONE signature-kernel pass feeds all three
    * bandings (the slices re-hash per width); everything after is a
    * bounded aggregate, no pair join at all.
    */
  def bandSweep(documents: DataFrame, k: Int = 8, nHashes: Int = 64,
                bandCounts: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    val sigs = fanOut(documents).select(col("doc_id"),
      graft.expressions.Kernels.minhashSig(col("text"), k, nHashes).as("sig"))
    bandCounts.map { b =>
      val rows = nHashes / b
      // Bucket on the EXACT signature slice (array grouping key), as
      // the oracle does — not on xxhash64 of it: a 64-bit collision
      // would silently merge buckets and inflate the pair-slot counts
      // feeding a cost decision (r7 ADVICE). The key is ≤ 8 longs per
      // row; the aggregate stays bounded by distinct buckets.
      sigs.select(posexplode(transform(sequence(lit(0), lit(b - 1)),
          bb => slice(col("sig"), bb * lit(rows) + lit(1), lit(rows)))))
        .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("n_pair_slots"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_hot_buckets"))
        .select(lit(b.toLong).as("bands"), lit(rows.toLong).as("rows_per_band"),
          col("n_pair_slots"), col("n_hot_buckets"))
    }.reduce(_.unionByName(_)).orderBy(col("bands"))
  }

  /** C126 `cluster_source_purity` — provenance composition of each
    * near-dup cluster (clusters of size ≥ 2 only): how many docs, how
    * many distinct sources, and the majority source's share as integer
    * per-mille. Single-source clusters are mirror-crawl noise;
    * mixed-source clusters are syndication/plagiarism signal and tell
    * a mixture designer which sources double-count each other — the
    * provenance view [[clusterSizeHistogram]]'s pure-size view can't
    * give. Consumes the already-labeled cluster relation (the shared
    * pair-build memo feeds it), so cost is one join + two aggregates
    * over O(corpus) rows with integer outputs throughout.
    */
  def clusterSourcePurity(documents: DataFrame, clusters: DataFrame): DataFrame =
    clusters
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("cluster_id"), col("source")).agg(count(lit(1)).as("n"))
      .groupBy(col("cluster_id"))
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        max(col("n")).as("max_src"))
      .filter(col("n_docs") >= 2)
      .select(col("cluster_id"), col("n_docs"), col("n_sources"),
        expr("(1000 * max_src) div n_docs").as("majority_pm"))
      .orderBy(col("cluster_id"))

  /** C127 `minhash_estimate_error` — per-candidate-pair calibration of
    * the MinHash similarity ESTIMATE against exact Jaccard: matching
    * signature positions / nHashes vs the two-pointer set
    * intersection, both as integer per-mille, plus |error|. The
    * recall/precision harness (C48) judges the BANDING; this judges
    * the SIGNATURE — the error distribution is what justifies nHashes
    * before a 100 TB run (64 hashes ⇒ ±125‰ estimator σ at J≈0.5,
    * visible here empirically). Shares the one-pass shingle-hash-set
    * memo shape of [[minhashVerifiedPairs]]: signatures derive FROM
    * the materialized sets, candidates from banded signature slices,
    * and the verify reads the same blocks — one corpus text pass.
    */
  def minhashEstimateError(documents: DataFrame, k: Int = 8, nHashes: Int = 64,
                           bands: Int = 16): DataFrame = {
    val sets = fanOut(documents)
      .select(col("doc_id"),
        graft.expressions.Kernels.shingleHashSet(col("text"), k).as("hs"))
      .localCheckpoint(true)
    val rows = nHashes / bands
    val sigs = sets.select(col("doc_id"),
      graft.expressions.Kernels.minhashFromHashes(col("hs"), nHashes).as("sig"))
      .localCheckpoint(true) // consumed twice: banding + pair compare
    val banded = sigs.select(
      col("doc_id"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)), b))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "bucket")
    val cands = banded.as("a").hint("shuffle_hash")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band_id") === col("b.band_id") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val both = sets.join(sigs, Seq("doc_id"))
    val melted = cands
      .select(col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .join(both, Seq("doc_id"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        first(when(col("doc_id") === col("doc_a"), col("hs")), ignoreNulls = true).as("ha"),
        first(when(col("doc_id") === col("doc_b"), col("hs")), ignoreNulls = true).as("hb"),
        first(when(col("doc_id") === col("doc_a"), col("sig")), ignoreNulls = true).as("sa"),
        first(when(col("doc_id") === col("doc_b"), col("sig")), ignoreNulls = true).as("sb"))
    melted
      .repartition(documents.sparkSession.sparkContext.defaultParallelism,
        col("doc_a"), col("doc_b")) // CPU-dense verify stage: pin parallelism
      .withColumn("eq",
        expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))").cast("long"))
      .withColumn("inter",
        graft.expressions.Kernels.sortedIntersectCount(col("ha"), col("hb")))
      .withColumn("uni",
        size(col("ha")).cast("long") + size(col("hb")).cast("long") - col("inter"))
      .select(col("doc_a"), col("doc_b"),
        expr(s"(eq * 1000) div $nHashes").as("est_pm"),
        expr("(inter * 1000) div uni").as("exact_pm"))
      .withColumn("err_pm", abs(col("est_pm") - col("exact_pm")))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C147 `dup_rate_sample` — the exact-duplicate RATE estimated from
    * a 1/`slices` CONTENT-hash slice, validated against the full
    * computation. The slice keys on the portable text hash, so an
    * exact-dup group lands wholly in or wholly out — the estimator is
    * unbiased over groups, unlike doc-id sampling which breaks pairs.
    * This is the 100 TB shape: dup-rate dashboards run the slice
    * (1/16th of the scan + shuffle); the exact leg exists to validate
    * the estimator wherever both are affordable. One md5-key shuffle
    * computes both legs (slice is a function of the content, so it
    * rides the same aggregate); output is a single reconciliation row.
    */
  def dupRateSample(documents: DataFrame, slices: Int = 16): DataFrame = {
    val grouped = documents
      .select(md5(col("text")).as("h"),
        pmod(graft.expressions.Kernels.strHash(col("text")), lit(slices.toLong)).as("slice"))
      .groupBy(col("h"), col("slice"))
      .agg(count(lit(1)).as("n"))
    val full = grouped.agg(
      sum(col("n")).as("n_docs"),
      sum(when(col("n") > 1, col("n")).otherwise(0L)).as("dup_docs"))
    val samp = grouped.filter(col("slice") === 0).agg(
      coalesce(sum(col("n")), lit(0L)).as("n_sampled"),
      coalesce(sum(when(col("n") > 1, col("n")).otherwise(0L)), lit(0L)).as("dup_sampled"))
    full.crossJoin(samp)
      .withColumn("exact_dup_pm", expr("(1000 * dup_docs) div n_docs"))
      .withColumn("est_dup_pm", when(col("n_sampled") === 0, lit(null))
        .otherwise(expr("(1000 * dup_sampled) div n_sampled")))
      .withColumn("err_pm", abs(col("est_dup_pm") - col("exact_dup_pm")))
  }
}
