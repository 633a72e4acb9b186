package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Training-corpus pipeline composition: the operators a 100 TB
  * LLM-data build runs AFTER per-document scoring — deterministic
  * splitting and the filter→dedup materialization of the clean corpus.
  *
  * Scale shape: both are single-pass over the scan plus (for the dedup
  * step) one shuffle on the content hash. Split assignment is a pure
  * per-row hash — stable under resharding, retries and incremental
  * re-runs, which is why it's a hash and not `rand()`.
  */
object Pipeline {

  /** C16 `sample_split` — deterministic train/val/test assignment by a
    * Knuth multiplicative hash of doc_id: bucket ∈ [0,100), <80 train /
    * <90 val / else test. Engine-portable integer arithmetic (the
    * DuckDB oracle replays it exactly); adding documents never
    * reassigns existing ones.
    */
  def sampleSplit(documents: DataFrame,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame =
    documents
      .select(col("doc_id"),
        pmod(col("doc_id") * lit(2654435761L), lit(100L)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** C18 `doc_pack` — shard-local greedy sequence packing: documents
    * are hash-sharded (Knuth hash → balanced, deterministic), ordered
    * by doc_id within each shard, and cut into batches of ≤ `budget`
    * whitespace tokens via a running cumulative sum — the standard
    * "pack short documents into fixed-token training sequences" step.
    *
    * Sharding is the scale story: a single global ordered cumsum would
    * serialize on one task; per-shard packing is embarrassingly
    * parallel and each worker packs its own shard, which is exactly how
    * a distributed packer behaves. All-integer arithmetic, so the
    * DuckDB oracle replays batch boundaries exactly.
    */
  def docPack(documents: DataFrame, budget: Long = 2048, shards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"),
        pmod(col("doc_id") * lit(2654435761L), lit(shards.toLong)).as("shard"),
        TextFns.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        expr(s"(greatest(cum_tokens, 1) - 1) div $budget"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("cum_tokens"), col("pack_id"))
      .orderBy(col("doc_id"))
  }

  /** C17 `corpus_filter` — the clean-corpus materialization: quality
    * score ≥ `minQuality`, language = `lang`, then exact-dedup survivor
    * (min doc_id per content hash) among the PASSING docs. Cheap
    * predicates run before the hash shuffle — at scale the filter
    * prunes the corpus before any data moves.
    */
  def corpusFilter(documents: DataFrame, minQuality: Double = 0.3,
                   lang: String = "en"): DataFrame = {
    val scored = documents.select(
      col("doc_id"),
      col("text"),
      TextFns.qualityScore(col("text")).as("quality"),
      TextFns.langId(col("text")).as("lang_guess"))
      .filter(col("quality") >= minQuality && col("lang_guess") === lang)
    val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    scored
      .withColumn("content_hash", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("quality"))
      .orderBy(col("doc_id"))
  }
}
