package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** C1 `dedup_exact` — exact dedup by content hash; min doc_id
    * survives. One shuffle on a 128-bit key; survivor choice is total.
    */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** Character k-gram shingle set as an array column (no explode). */
  def shingles(text: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
        i => text.substr(i, lit(k))))

  /** MinHash signature: for seed s in [0, nHashes), min over shingles of
    * xxhash64(shingle, s). Computed as a fold over the shingle array —
    * one pass, no shuffle, entirely codegen-friendly expressions.
    */
  def minhashSignature(shingleArr: Column, nHashes: Int): Column = {
    val seeds = sequence(lit(0), lit(nHashes - 1))
    aggregate(
      shingleArr,
      transform(seeds, _ => lit(Long.MaxValue)),
      (acc, s) => zip_with(acc, seeds, (a, i) => least(a, xxhash64(s, i))))
  }

  /** C2 `dedup_minhash` — MinHash+LSH near-dup candidate pairs:
    * shingle → 64-hash signature → `bands` bands of `rows` hashes →
    * band-bucket equality join → distinct candidate pairs. The join is
    * on (band_id, bucket_hash): docs collide only if one band matches
    * exactly, giving the classic S-curve selectivity; nothing here is
    * O(n²).
    */
  def minhashLshPairs(documents: DataFrame, k: Int = 8, nHashes: Int = 64,
                      bands: Int = 16): DataFrame = {
    val rows = nHashes / bands
    val sig = documents.select(
      col("doc_id"),
      minhashSignature(shingles(col("text"), k), nHashes).as("sig"))
    val banded = sig.select(
      col("doc_id"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * lit(rows) + lit(1), lit(rows)), b))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "bucket")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash of the token multiset, returned as a 64-char bit
    * string (MSB first). Sign of per-bit vote, votes weighted +1/-1 by
    * each token-hash bit. Pure expression fold.
    */
  def simhash(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hashes = transform(toks, t => xxhash64(t))
    val bitIdx = sequence(lit(0), lit(63))
    val pows = array((0 until 64).map(j => lit(1L << j)): _*)
    val votes = aggregate(
      hashes,
      transform(bitIdx, _ => lit(0L)),
      (acc, h) =>
        zip_with(acc, bitIdx, (a, j) =>
          a + when(h.bitwiseAND(element_at(pows, (j + 1).cast("int"))) =!= 0, 1L).otherwise(-1L)))
    // MSB-first bit string: bit 63 .. bit 0
    concat_ws("", reverse(transform(votes, v => when(v > 0, "1").otherwise("0"))))
  }

  /** C3 `dedup_simhash` — SimHash near-dup pairs: fingerprints are cut
    * into `chunks` equal substrings; by pigeonhole, any pair within
    * hamming distance `chunks - 1` shares at least one exact chunk, so
    * candidates come from a chunk-equality join and the true hamming
    * distance is verified on the candidates only.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    val width = 64 / chunks
    val fp = documents.select(col("doc_id"), simhash(col("text")).as("fp"))
    val chunked = fp.select(
      col("doc_id"), col("fp"),
      posexplode(
        transform(
          sequence(lit(0), lit(chunks - 1)),
          c => col("fp").substr(c * lit(width) + lit(1), lit(width)))))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk")
    val hamming = {
      // count of differing bit chars between two 64-char bit strings
      (a: Column, b: Column) =>
        aggregate(
          sequence(lit(1), lit(64)),
          lit(0),
          (acc, i) => acc + when(a.substr(i, lit(1)) =!= b.substr(i, lit(1)), 1).otherwise(0))
    }
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_id") === col("b.chunk_id") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C4 `ngram_jaccard` — n-gram shingle Jaccard pairs ≥ threshold.
    * Candidates via the inverted shingle index (explode + equality
    * join); |∩| from the join, |∪| from per-doc set sizes. At corpus
    * scale the explode join needs a document-frequency cap on shingles
    * (stop-shingle removal) to bound the worst posting list — kept here
    * as `maxDf`.
    */
  def ngramJaccardPairs(documents: DataFrame, k: Int = 8, threshold: Double = 0.3,
                        maxDf: Long = Long.MaxValue): DataFrame = {
    val sh = documents
      .select(col("doc_id"), explode(shingles(col("text"), k)).as("s"))
    val filtered =
      if (maxDf == Long.MaxValue) sh
      else {
        val dfCounts = sh.groupBy(col("s")).agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
        sh.join(dfCounts.select("s"), Seq("s"))
      }
    val sizes = filtered.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = filtered.as("a")
      .join(filtered.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
