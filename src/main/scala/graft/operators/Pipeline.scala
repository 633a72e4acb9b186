package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Micro.u6

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

  // PII patterns shared by the operator and its oracle: RE2-compatible
  // (no lookaround, no backrefs) so Java regex (Spark) and RE2 (DuckDB)
  // match identically.
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePat = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"

  /** C19 `pii_redact` — PII scrubbing before training: emails, IPv4
    * addresses and phone numbers replaced with typed placeholder tokens,
    * plus per-document match counts (the audit trail a compliance
    * pipeline keeps). Pure per-row regex → map-only, no shuffle; at
    * 100 TB this runs at scan speed alongside the other per-doc scores.
    * Replacement order (email → ip → phone) is part of the contract.
    */
  def piiRedact(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(IpPat), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PhonePat), lit(0))).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailPat, "<EMAIL>"),
          IpPat, "<IP>"),
        PhonePat, "<PHONE>").as("redacted"))
      .orderBy(col("doc_id"))

  /** C20 `stratified_sample` — per-language stratified sampling at
    * per-mille rates, deterministic by Knuth hash of doc_id (integer
    * arithmetic replays exactly in any engine; resharding, retries and
    * incremental re-runs never change membership — the property rand()
    * lacks). Map-only: the filter runs at scan speed before any shuffle.
    */
  def stratifiedSample(documents: DataFrame,
                       ratesPerMille: Map[String, Int] = Map("en" -> 500),
                       defaultPerMille: Int = 200): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    documents
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id") * lit(2654435761L), lit(1000L)).as("bucket"), rate.as("rate"))
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** C21 `length_histogram` — token-length distribution per language:
    * docs bucketed by whitespace-token count (width-`bucketWidth` bins).
    * The corpus-shape profile a data build checks before fixing a
    * packing budget. One map-side-combinable aggregation.
    */
  def lengthHistogram(documents: DataFrame, bucketWidth: Int = 16): DataFrame =
    documents
      .select(col("lang"), TextFns.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      // integer `div`, not double-divide-then-cast: DuckDB's double→int
      // cast rounds while Spark's truncates — `div` vs `//` agree.
      .groupBy(col("lang"), expr(s"n_tokens div $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy(col("lang"), col("bucket"))

  /** C25 `repetition_score` — within-document repetition (the
    * Gopher-style quality signal): fraction of token bigrams that are
    * duplicates, 1 − distinct/total. Pure array expressions — no
    * explode, no shuffle; runs at scan speed beside the other per-doc
    * scores. All-integer counts → the ratio divides identically in any
    * engine. Docs with < 2 tokens score NULL (no bigrams).
    */
  def repetitionScore(documents: DataFrame): DataFrame = {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    val n = size(col("bigrams")).cast("double")
    documents
      .withColumn("bigrams", zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b)))
      .select(col("doc_id"),
        size(col("bigrams")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bigrams"))).cast("long").as("n_distinct"),
        u6(lit(1.0) - size(array_distinct(col("bigrams"))).cast("double") /
          when(n === 0, lit(null)).otherwise(n)).as("rep_ratio"))
      .orderBy(col("doc_id"))
  }

  /** C22 `token_df_quality` — corpus-level rarity score: mean document
    * frequency of each doc's DISTINCT tokens (low mean-DF = distinctive
    * vocabulary, high = boilerplate). The two-stage shape of every
    * corpus-statistics score at 100 TB: one shuffle builds the DF table
    * (vocabulary-sized, ≪ corpus), one hash join scores docs against it.
    * All-integer sums → the mean divides exactly the same everywhere.
    */
  def tokenDfQuality(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        explode(array_distinct(split(lower(trim(col("text"))), "\\s+"))).as("tok"))
      .filter(col("tok") =!= "")
    val df = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    toks.join(df, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct_tokens"),
        u6(sum(col("df")).cast("double") / count(lit(1)).cast("double")).as("mean_df"))
      .orderBy(col("doc_id"))
  }

  /** C31 `hash_embed` — feature-hashed document vectors (the hashing
    * trick, Weinberger et al., ICML 2009): each token hashes to a
    * dimension `h mod dim` with sign `±1` from the next hash bit, and
    * the document's vector is the signed token-count per dimension —
    * a model-free text embedding whose inner products approximate
    * token-multiset overlap. Emitted sparse as (doc_id, dim, weight):
    * all-integer (PortableStrHash → exact DuckDB replay), one explode +
    * one (doc, dim) aggregation — map-side combinable, no skew (dims
    * spread the key space). Feeds the vector stack: densify →
    * [[Quantize.quantize]] → ANN, a complete text→ANN path with no
    * external model.
    */
  def hashEmbed(documents: DataFrame, dim: Int = 64): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")).as("tok"))
    toks
      .select(col("doc_id"), graft.expressions.Kernels.strHash(col("tok")).as("h"))
      .select(col("doc_id"),
        pmod(col("h"), lit(dim)).as("dim"),
        when(expr(s"pmod(h div $dim, 2)") === 0, 1L).otherwise(-1L).as("sign"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("sign")).as("weight"))
      .filter(col("weight") =!= 0)
      .orderBy(col("doc_id"), col("dim"))
  }

  /** Densify [[hashEmbed]]'s sparse output into the `embeddings`-table
    * shape `(vec_id, embedding: array<float>)`, so hashed vectors flow
    * straight into the vector stack ([[Quantize.quantize]],
    * `Similarity.cosineTopK`, IVF). One aggregation; the dense array is
    * built from a per-doc map, absent dims zero-filled.
    */
  def densify(sparse: DataFrame, dim: Int = 64): DataFrame =
    sparse
      .groupBy(col("doc_id").as("vec_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("dim").cast("int"), col("weight"))))).as("m"))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0L)).cast("float")).as("embedding"))

  /** C28 `tfidf_topk` — the k most characteristic terms per document by
    * TF-IDF-style rarity weighting. Same two-stage 100 TB shape as
    * [[tokenDfQuality]]: one shuffle builds the vocabulary-sized
    * (term, df) table, one hash join scores (doc, term) pairs, one
    * doc-partitioned window ranks them. The corpus size joins in as a
    * broadcast 1-row aggregate — no driver-side action.
    *
    * Scoring is ALL-INTEGER — score = tf · ((n_docs·10⁶) div df) — a
    * monotone transform of tf/df per fixed corpus, so the ranking is
    * the classic one while every value replays exactly cross-engine
    * (float idf = log(N/df) would hand last-ulp `ln` differences
    * between JVM and C libm straight to the rank tie-breaks). Ties
    * break on term text ascending.
    */
  def tfidfTopK(documents: DataFrame, k: Int): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    tf.join(df, Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * expr("(n_docs * 1000000) div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** C35 `source_stats` — per-(source, lang) corpus composition report:
    * doc/token counts and the exact-duplicate fraction, the first table
    * any corpus audit produces (which source is bloating the mix, which
    * is a duplicate farm). Duplicate membership = the document's full
    * text appears more than once CORPUS-WIDE (the cross-source dup is
    * the interesting one); the per-group fraction is one IEEE division
    * of exact integers. Two shuffles: the text-hash group and the
    * (source, lang) rollup — both map-side combinable.
    */
  def sourceStats(documents: DataFrame): DataFrame = {
    // md5 as the dedup key (the exact_dedup idiom): a 32-char shuffle/
    // join key instead of full document text, portable to the oracle.
    val dupHashes = documents.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("h"))
    documents
      .withColumn("h", md5(col("text")))
      .join(dupHashes.withColumn("is_dup", lit(1L)), Seq("h"), "left")
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= ""))
          .cast("long")).as("n_tokens"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_docs"))
      // micro-unit integer fraction, not round(a/b, 6): a group of e.g.
      // 128 docs with an odd dup count terminates at the 7th decimal in
      // exactly 5 — the engine-dependent half-rounding the vwap fix
      // removed (Spark rounds the shortest repr, DuckDB the binary value)
      .withColumn("dup_fraction",
        expr("(n_dup_docs * 1000000) div n_docs") / 1e6)
      .orderBy(col("source"), col("lang"))
  }

  /** C32 `bm25_topk` — BM25 document retrieval: rank the corpus against
    * each query document's term set (Robertson–Spärck Jones, the scoring
    * the training-data retrieval/decontamination stack actually runs).
    * Completes the retrieval family: [[tfidfTopK]] ranks TERMS per doc,
    * this ranks DOCS per query, with BM25's tf saturation (k1) and
    * length normalization (b).
    *
    * ALL-INTEGER fixed-point scoring, exactly replayable cross-engine
    * (float `ln` idf + float division would hand last-ulp JVM-vs-libm
    * differences to the rank ties). With k1 = 6/5, b = 3/4 and
    * avglen = tot/N the per-term score
    * `idf · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen))` clears its
    * denominators as:
    *   idf3      = (N·10³) div df                        (rarity, 10³ scale)
    *   den_micro = tf·10⁶ + ((6·tot + 18·len·N)·10⁶) div (20·tot)
    *   term      = (idf3·tf·11·10⁶) div (5·den_micro)
    * Every operand stays < 2⁶³ at any corpus size where `tot` fits a
    * long. Monotone in the classic score per fixed corpus up to the two
    * documented quantizations; ties break on doc_id ascending.
    *
    * Scale shape: one shuffle builds (term, df); query term sets are
    * tiny by definition → broadcast; the corpus posting join is the one
    * big hash join; a query-partitioned window takes top-k (Spark 4
    * pushes a partial WindowGroupLimit below the shuffle).
    */
  def bm25TopK(documents: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // len from tf (Σ tf per doc), not from a second tokenize pass — one
    // fewer scan+explode of the corpus in the physical plan.
    val lens = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
    val corpus = lens.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("tot"))
    val qterms = tf.filter(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("q_id"), col("tok"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qterms), Seq("tok"))
      .filter(col("doc_id") =!= col("q_id"))
      .join(df, Seq("tok"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("den_micro",
        expr("tf * 1000000 + ((6 * tot + 18 * len * n_docs) * 1000000) div (20 * tot)"))
      .withColumn("term_score",
        expr("(((n_docs * 1000) div df) * tf * 11 * 1000000) div (5 * den_micro)"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id"), col("score"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** C36 `chunk_dedup` — sub-document (CCNet-style paragraph) dedup at
    * fixed token-chunk granularity: each document splits into
    * consecutive `chunkTokens`-token chunks, a chunk instance survives
    * iff it is the corpus-wide FIRST occurrence of its text (min
    * (doc_id, chunk_idx) — the CCNet rule: later copies of a repeated
    * paragraph are dropped, the original stays), and documents are
    * re-assembled from their surviving chunks. This corpus has no
    * paragraph delimiters, so the chunk boundary is positional; the
    * operator takes any chunking the text affords.
    *
    * Scale shape: three shuffles, each on a bounded key — (doc_id,
    * chunk) group ≈ tokens/chunkTokens rows, the md5-hash first-
    * occurrence window (chunk-cardinality), and the per-doc rebuild.
    * No joins, no corpus²; the md5 key keeps shuffle rows at 32 chars +
    * ids regardless of chunk text size... except the winner must carry
    * its text to the rebuild — chunk text is bounded by chunkTokens, so
    * the carried payload is capped by construction.
    */
  def chunkDedup(documents: DataFrame, chunkTokens: Int = 16): DataFrame = {
    val chunks = documents
      .select(col("doc_id"),
        posexplode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")))
      .groupBy(col("doc_id"), expr(s"pos div $chunkTokens").as("chunk_idx"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("col")))),
        s => s("col")), " ").as("chunk_text"))
    val firstWin = Window.partitionBy(md5(col("chunk_text")))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunks
      .withColumn("rn", row_number().over(firstWin))
      .withColumn("kept", col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("kept"), struct(col("chunk_idx"), col("chunk_text"))))),
          s => s("chunk_text")), " ").as("new_text"))
      .orderBy(col("doc_id"))
  }

  /** C37 `inverted_index` — posting-list materialization: term → df +
    * the sorted doc-id posting list, the index build behind BM25/TF-IDF
    * serving. `maxDf` drops hyper-common terms (their postings are
    * corpus-sized and retrieval-useless — the classic stop-list cut
    * that also BOUNDS the widest row: no posting string exceeds
    * maxDf·idWidth chars, so skew cannot produce a giant row). Postings
    * serialize as a comma-joined string: engine-portable, hashable by
    * the driver compare.
    */
  def invertedIndex(documents: DataFrame, maxDf: Long = 100L): DataFrame =
    documents
      .select(col("doc_id"),
        explode(array_distinct(filter(split(lower(trim(col("text"))), "\\s+"),
          t => t =!= ""))).as("tok"))
      .groupBy(col("tok"))
      .agg(
        count(lit(1)).as("df"),
        array_join(transform(array_sort(collect_list(col("doc_id"))),
          d => d.cast("string")), ",").as("postings"))
      .filter(col("df") <= maxDf)
      .orderBy(col("tok"))

  /** C38 `pmi_bigrams` — collocation extraction: adjacent-token bigrams
    * ranked by pointwise mutual information. The score is the INTEGER
    * `(c_ab · N · 10⁶) div (c_a · c_b)` — PMI is log of that ratio and
    * log is monotone, so the ranking is exactly PMI's while every
    * score (and tie) replays cross-engine with zero float ops.
    * `minCount` suppresses one-off pairings (classic PMI noise floor:
    * rare pairs score spuriously high). Counts are integers — shuffle
    * aggregation order is irrelevant to correctness by construction.
    *
    * Range bound: the numerator c_ab·N·10⁶ must fit a signed 64-bit
    * int, i.e. c_ab·N < 9.2·10¹². Holds through multi-TB corpora for
    * real collocations (c_ab ≪ N); a pathological corpus past it FAILS
    * LOUDLY (ANSI overflow), never silently — switch the three factors
    * to DECIMAL(38,0) (and the oracle's to HUGEINT) to extend the
    * range; the div-floor semantics carry over unchanged.
    */
  def pmiBigrams(documents: DataFrame, minCount: Long = 5L, k: Int = 50): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "").as("toks"))
    val bigrams = toks
      .select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => struct(a.as("tok_a"), b.as("tok_b")))).as("bg"))
      .select(col("bg.tok_a"), col("bg.tok_b"))
    val uni = toks.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val pairCounts = bigrams.groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("c_ab"))
    val total = bigrams.agg(count(lit(1)).as("n_bigrams"))
    pairCounts
      .filter(col("c_ab") >= minCount)
      .join(uni.withColumnRenamed("tok", "tok_a").withColumnRenamed("c", "c_a"), Seq("tok_a"))
      .join(uni.withColumnRenamed("tok", "tok_b").withColumnRenamed("c", "c_b"), Seq("tok_b"))
      .crossJoin(broadcast(total))
      .withColumn("score", expr("(c_ab * n_bigrams * 1000000) div (c_a * c_b)"))
      // distributed top-k FIRST (TakeOrderedAndProject — per-partition
      // heaps, no single-partition shuffle of every collocation), THEN
      // the rank window over just k rows. A bare global row_number here
      // would funnel the full minCount-filtered pair set through one
      // task — the warning Spark rightly logs about it.
      .orderBy(col("score").desc, col("tok_a"), col("tok_b"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("score").desc, col("tok_a"), col("tok_b"))).cast("long"))
      .select(col("rank"), col("tok_a"), col("tok_b"),
        col("c_ab"), col("c_a"), col("c_b"), col("score"))
      .orderBy(col("rank"))
  }

  /** C40 `lm_score` — bigram-language-model predictability score per
    * document (the KenLM-style quality signal, model-free): every
    * adjacent bigram (a,b) scores the corpus conditional probability
    * `p(b|a)` in ppm — INTEGER `(c_ab · 10⁶) div c_a` — and the doc
    * score is the integer mean of its bigram ppms. High = templatic /
    * predictable text, low = unusual token transitions (garbled or
    * genuinely novel) — both tails are what a corpus build inspects.
    * All-integer end to end: counts → div → sum → div, so scores
    * replay exactly cross-engine with zero float (log-prob would hand
    * libm `ln` ulps to every comparison). Range bound: c_ab·10⁶ must
    * fit a long — c_ab < 9.2·10¹², comfortably beyond any single
    * bigram's count in a 100 TB corpus; past it ANSI mode fails
    * loudly (decimal widening is the escape hatch, as in
    * [[pmiBigrams]]). Docs with no bigram (< 2
    * tokens) drop out. Shape: the standard LM-count shuffles (bigram + unigram
    * aggs, both map-side combinable) + two hash joins back to the
    * exploded bigram stream.
    */
  def lmScore(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "").as("toks"))
    val docBigrams = toks
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => struct(a.as("tok_a"), b.as("tok_b")))).as("bg"))
      .select(col("doc_id"), col("bg.tok_a"), col("bg.tok_b"))
    val uni = toks.select(explode(col("toks")).as("tok_a"))
      .groupBy(col("tok_a")).agg(count(lit(1)).as("c_a"))
    val pairCounts = docBigrams.groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("c_ab"))
    docBigrams
      .join(pairCounts, Seq("tok_a", "tok_b"))
      .join(uni, Seq("tok_a"))
      .withColumn("ppm", expr("(c_ab * 1000000) div c_a"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppm")).as("ppm_sum"))
      .withColumn("lm_ppm", expr("ppm_sum div n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("lm_ppm"))
      .orderBy(col("doc_id"))
  }

  /** C39 `mixture_sample` — target-mixture corpus resampling: given
    * per-source target shares (per-mille of the TOTAL corpus), each
    * source gets an integer acceptance rate
    * `min(10⁶, (share‰ · total · 1000) div count_source)` applied as a
    * Knuth-hash threshold on doc_id — the deterministic way to hit a
    * mixture spec (Pile/RedPajama-style source weighting): membership
    * is a pure function of doc_id, so reshards, retries and incremental
    * re-runs keep identical samples. Sources without a target are
    * dropped (a mixture spec is exhaustive). Over-requested sources
    * (share exceeding availability) cap at keep-everything rather than
    * upsample. One broadcast of the O(sources) rate table + one scan.
    */
  def mixtureSample(documents: DataFrame, sharePerMille: Map[String, Int]): DataFrame = {
    val rates = documents
      .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(documents.agg(count(lit(1)).as("total"))))
      .withColumn("share_pm", coalesce(
        sharePerMille.foldLeft(lit(null).cast("long")) { case (acc, (src, pm)) =>
          when(col("source") === src, lit(pm.toLong)).otherwise(acc)
        }, lit(null)))
      .filter(col("share_pm").isNotNull)
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("(share_pm * total * 1000) div cnt")))
      .select(col("source"), col("rate_ppm"))
    documents
      .join(broadcast(rates), Seq("source"))
      .withColumn("bucket", pmod(col("doc_id") * lit(2654435761L), lit(1000000L)))
      .filter(col("bucket") < col("rate_ppm"))
      .select(col("doc_id"), col("source"), col("lang"), col("bucket"), col("rate_ppm"))
      .orderBy(col("doc_id"))
  }

  /** C46 `quality_signals` — every per-document quality signal in ONE
    * corpus scan: language guess, composite quality score, both token
    * counts, Gopher-style repetition ratio, and the resulting
    * `pass_gate` bit. The single-signal queries (`lang_id`,
    * `text_quality`, `token_count`, `repetition_score`) exist as
    * focused audits; a production filter pass computes them TOGETHER —
    * five signals for one read. Everything is a compiled kernel
    * ([[TextFns.textStats]] already returns lang+quality from one
    * pass) or a pure array expression: scan → project → write, zero
    * shuffles, which is the only shape that matters when the input is
    * the 100 TB corpus itself.
    */
  def qualitySignals(documents: DataFrame, minQuality: Double = 0.3,
                     lang: String = "en", maxRep: Double = 0.2): DataFrame = {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val n = size(col("bigrams")).cast("double")
    documents
      .withColumn("bigrams", bigrams)
      .select(col("doc_id"),
        TextFns.langId(col("text")).as("lang_guess"),
        TextFns.qualityScore(col("text")).as("quality"),
        TextFns.wsTokenCount(col("text")).cast("long").as("n_ws_tokens"),
        TextFns.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
        u6(lit(1.0) - size(array_distinct(col("bigrams"))).cast("double") /
          when(n === 0, lit(null)).otherwise(n)).as("rep_ratio"))
      .withColumn("pass_gate",
        col("lang_guess") === lang && col("quality") >= minQuality &&
          (col("rep_ratio").isNull || col("rep_ratio") <= maxRep))
      .orderBy(col("doc_id"))
  }

  /** C44 `global_shuffle` — deterministic epoch-order shuffle: every
    * document gets a pseudo-random but REPRODUCIBLE position (shard,
    * pos) for training-order randomization. The shuffle key is the
    * Knuth-multiplicative hash of doc_id mixed with an epoch seed —
    * changing `seed` re-deals the whole corpus, keeping it replays the
    * exact order (resumable epochs, shard-level retry). shard = key mod
    * nShards; pos = dense order by (key, doc_id) WITHIN the shard, so
    * the expensive ordering is per-shard parallel — a single global
    * row_number would serialize on one task, the per-shard rank is the
    * order a reader consuming shard files actually sees. All-integer →
    * exact DuckDB replay.
    */
  def globalShuffle(documents: DataFrame, nShards: Int = 32, seed: Long = 1L): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
    documents
      .select(col("doc_id"),
        pmod(col("doc_id") * lit(2654435761L) + lit(seed) * lit(1013904223L),
          lit(2147483647L)).as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("skey"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))
  }

  /** C45 `ks_drift` — two-sample Kolmogorov–Smirnov drift test between
    * the length distributions of two corpus sources: D = max |ECDF_A −
    * ECDF_B|, the standard "did this source's shape change" monitor a
    * continuously-ingesting corpus runs per snapshot.
    *
    * Scale shape: lengths aggregate to one row per DISTINCT length
    * first (bounded by the max document length — a format constant,
    * not corpus size), so the single-partition cumulative window that
    * follows runs over a bounded set no matter how many documents
    * exist — same bounded-global-window argument as advance_decline.
    *
    * Determinism: the max is taken over the INTEGER cross-products
    * |k_A·n_B − k_B·n_A| (no per-row FP), divided and rounded once at
    * the end; the 95% critical value uses only IEEE-exact ops (sqrt is
    * correctly rounded by spec), so the drift boolean is engine-stable.
    */
  def ksDrift(documents: DataFrame, sourceA: String, sourceB: String): DataFrame = {
    val perVal = documents
      .filter(col("source").isin(sourceA, sourceB))
      .select(col("n_chars"),
        when(col("source") === sourceA, 1L).otherwise(0L).as("g1"),
        when(col("source") === sourceB, 1L).otherwise(0L).as("g2"))
      .groupBy(col("n_chars"))
      .agg(sum(col("g1")).as("c1"), sum(col("g2")).as("c2"))
    val wCum = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perVal
      .select(col("n_chars"),
        sum(col("c1")).over(wCum).as("k1"),
        sum(col("c2")).over(wCum).as("k2"))
      .select(col("k1"), col("k2"),
        max(col("k1")).over(wAll).as("n1"),
        max(col("k2")).over(wAll).as("n2"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("k1") * col("n2") - col("k2") * col("n1"))).as("d_num"))
      .select(col("n1"), col("n2"),
        u6(col("d_num").cast("double") /
          (col("n1") * col("n2")).cast("double")).as("d_stat"),
        u6(lit(1.358) *
          sqrt((col("n1") + col("n2")).cast("double") /
            (col("n1") * col("n2")).cast("double"))).as("crit_95"))
      .withColumn("drift", col("d_stat") > col("crit_95"))
  }

  /** C51 `domain_mix` — the mixture-planning report behind every
    * multi-source training run: per source, document and token counts,
    * the source's share of corpus tokens, and the per-document sampling
    * weight that would rebalance the corpus to a UNIFORM token mixture
    * (weight = target_share / actual_share = total / (n_sources ·
    * source_tokens)). Feed the weights to [[mixtureSample]] /
    * [[weightedSample]] to realize the plan. All counts are integer
    * sums (exact under any aggregation order); the two derived ratios
    * are single IEEE divisions of integers, micro-unit rounded. One
    * scan + one tiny aggregate; the corpus-wide totals broadcast back
    * onto the per-source rows.
    */
  def domainMix(documents: DataFrame): DataFrame = {
    def u6(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val perSource = documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFns.wsTokenCount(col("text")).cast("long")).as("n_tokens"))
    val totals = perSource
      .agg(sum(col("n_tokens")).as("total_tokens"), count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("token_share",
        u6(col("n_tokens").cast("double") / col("total_tokens")))
      .withColumn("weight",
        u6(col("total_tokens").cast("double") / (col("n_sources") * col("n_tokens"))))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("token_share"), col("weight"))
      .orderBy(col("source"))
  }

  /** C55 `bpe_pairs` — the counting pass of one BPE merge iteration
    * (Sennrich et al. 2016): within-word adjacent character pairs
    * ranked by corpus frequency; the top pair is the next merge a
    * tokenizer trainer would pick. Count = word INSTANCES containing
    * the pair (the compiled [[graft.operators.Dedup.shingles]] kernel
    * emits each word's pair SET — documented deviation from
    * per-occurrence counting; rankings agree except for heavy
    * within-word repetition). One scan + explode + a charset²-bounded
    * aggregate: exactly the map-reduce shape tokenizer training runs at
    * corpus scale; the global top-k sort runs on the bounded count
    * table, never the corpus.
    */
  def bpePairs(documents: DataFrame, k: Int = 20): DataFrame =
    documents
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
      .select(explode(graft.operators.Dedup.shingles(col("word"), 2)).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)

  /** C46 `weighted_sample` — deterministic weighted sampling without
    * replacement, k docs per source, weight = document length: the
    * Efraimidis–Spirakis scheme with the pow swapped for its monotone
    * log form (key = ln(u)/w orders exactly as u^(1/w); `pow` is the
    * one libm op JVM and C disagree on in the last ulp — see the ewma
    * kernel note — while `ln` of the same rational u is stable, and the
    * key is micro-rounded with a doc_id tie-break so the top-k frontier
    * is engine-exact). u comes from the Knuth hash of doc_id, NOT
    * rand(): resharding, retries and incremental re-runs keep every
    * selection (the sample_split argument).
    *
    * Scale: map-only key computation + per-source top-k window — the
    * topk_per_group shape, no global ordering anywhere.
    */
  def weightedSample(documents: DataFrame, k: Int = 10): DataFrame = {
    val h = pmod(col("doc_id") * lit(2654435761L), lit(2147483647L))
    val u = (h + lit(1L)).cast("double") / lit(2147483648.0)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("skey").desc, col("doc_id"))
    documents
      .select(col("doc_id"), col("source"), col("n_chars"),
        u6(log(u) / col("n_chars")).as("skey"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("source"), col("rk"))
  }

  /** C59 `bpe_train` — the full BPE merge-training loop (Sennrich et
    * al. 2016), not just one counting pass like [[bpePairs]]: K
    * iterations of (count adjacent symbol pairs weighted by word
    * frequency -> pick the most frequent pair, ties by pair text ->
    * rewrite every word's symbol sequence with the merge applied).
    * Output: the learned merge table in rank order -- exactly what a
    * tokenizer trainer persists.
    *
    * Scale shape: this is how production trainers (HF tokenizers,
    * sentencepiece) structure it -- ONE corpus-wide scan + shuffle
    * builds the distinct-word frequency table, and all K iterations
    * run on that bounded vocabulary table (<< corpus: ~10^7 distinct
    * words for a 100 TB corpus), persisted once. The driver loop
    * launches K small jobs; the corpus is never rescanned.
    *
    * Symbol sequences are U+0001-separated strings with boundary
    * separators; a merge of (l, r) is the literal string replace of
    * `\x01 l \x01 r \x01` with `\x01 lr \x01` -- left-to-right
    * non-overlapping, which is precisely BPE's greedy leftmost merge
    * order ("aaa" + merge (a,a) -> ["aa","a"]), and identical in
    * Spark's `replace` and DuckDB's `replace`, so the oracle replays
    * all K iterations exactly.
    */
  def bpeTrain(documents: DataFrame, merges: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val base = bpeBase(documents).persist()
    try {
      val (learned, _) = bpeLoop(base, merges)
      learned.toDF("merge_rank", "lhs", "rhs", "merged", "n")
        .orderBy(col("merge_rank"))
    } finally base.unpersist()
  }

  /** The distinct-word frequency table in BPE symbol form: `word`,
    * `freq`, and `repr` = the U+0001-separated character sequence with
    * boundary separators. The one corpus scan every BPE job shares.
    */
  private def bpeBase(documents: DataFrame): DataFrame = {
    val sep = "\u0001"
    documents
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        concat(lit(sep), regexp_replace(col("word"), "(.)", "$1" + sep)).as("repr"))
  }

  /** The K-iteration merge loop shared by [[bpeTrain]] and
    * [[bpeEncode]]: finds the top pair, rewrites `repr` (all other
    * columns ride along), repeats. Returns the learned merges and the
    * final rewritten table -- whose lineage embeds the merges as
    * LITERAL replaces, so re-evaluating it later replays the rewrites
    * without re-running the K driver jobs.
    */
  private def bpeLoop(base: DataFrame, merges: Int): (Seq[(Long, String, String, String, Long)], DataFrame) = {
    val sep = "\u0001"
    var tbl = base
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var exhausted = false
    for (k <- 1 to merges if !exhausted) {
      // Top-pair pick as ONE struct-min aggregate, not orderBy+limit:
      // min(struct(-n, l, r)) is exactly the (n desc, l asc, r asc)
      // argmax, runs as a partial+final hash aggregate with map-side
      // combine, and returns a single row — no TakeOrdered per-partition
      // top-k merge on the driver. Still K sequential jobs (the merge
      // choice is inherently iterative) but each is the cheapest shape
      // a bounded vocab allows.
      val top = tbl
        .select(col("freq"),
          filter(split(col("repr"), sep), x => x =!= "").as("sym"))
        .select(col("freq"),
          explode(zip_with(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .agg(min(struct((-col("n")).as("negn"), col("l"), col("r"))).as("b"))
        .collect()
      if (top.isEmpty || top(0).isNullAt(0)) exhausted = true
      else {
        val row = top(0).getStruct(0)
        val l = row.getString(1)
        val r = row.getString(2)
        val n = -row.getLong(0)
        learned += ((k.toLong, l, r, l + r, n))
        tbl = tbl.withColumn("repr",
          org.apache.spark.sql.functions.replace(
            col("repr"), lit(sep + l + sep + r + sep), lit(sep + l + r + sep)))
      }
    }
    (learned.toSeq, tbl)
  }

  /** C61 `bpe_encode` -- the ENCODE side of [[bpeTrain]]: apply the K
    * learned merges to every document and report its token count under
    * the trained vocabulary plus the fertility (BPE tokens per
    * whitespace word, per-mille) -- the number a tokenizer team
    * watches to size context windows and compare vocab choices.
    *
    * Scale shape: the merges rewrite the VOCABULARY (bounded), never
    * the corpus -- each word's final symbol count comes from the
    * rewritten word table, and the corpus pass is one (doc_id, word)
    * count aggregation joined to that table on `word` (two shuffles,
    * both map-side combinable; the per-doc distinct-word table going
    * into the join is far smaller than the exploded token stream).
    * Encoding-by-replay-on-the-corpus would rescan 100 TB K times;
    * this rescans it once.
    *
    * All-integer output, so the oracle (which replays the full
    * training loop in chained CTEs -- [[bpeTrain]]'s argument) matches
    * exactly.
    */
  /** The trained (word, n_sym) vocabulary table: distinct words with
    * their symbol counts under the K learned merges -- the bounded
    * artifact the encode side joins against. Production shape at
    * 100 TB: train ONCE (bounded-vocab work), materialize this table,
    * then encode any number of corpora against it; `SparkEntry`
    * memoizes it per (session, sfDir) so one driver run trains once.
    */
  def bpeVocab(documents: DataFrame, merges: Int = 8): DataFrame = {
    val sep = "\u0001"
    val base = bpeBase(documents).persist()
    try {
      val (_, fin) = bpeLoop(base, merges)
      // eager materialization while `base` is still persisted -- a lazy
      // return would re-run the corpus scan after the finally unpersists
      fin.select(col("word"),
        size(filter(split(col("repr"), sep), x => x =!= "")).cast("long").as("n_sym"))
        .localCheckpoint(true)
    } finally base.unpersist()
  }

  def bpeEncode(documents: DataFrame, merges: Int = 8,
                trainedVocab: Option[DataFrame] = None): DataFrame = {
    val vocab = trainedVocab.getOrElse(bpeVocab(documents, merges))
    val toks = documents
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val enc = toks
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
      .join(vocab, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_ws"), sum(col("cnt") * col("n_sym")).as("n_bpe"))
    documents.select(col("doc_id")).join(enc, Seq("doc_id"), "left")
      .withColumn("n_ws_tokens", coalesce(col("n_ws"), lit(0L)))
      .withColumn("n_bpe_tokens", coalesce(col("n_bpe"), lit(0L)))
      .withColumn("fertility_pm",
        when(col("n_ws_tokens") > 0, expr("(1000 * n_bpe_tokens) div n_ws_tokens")))
      .select(col("doc_id"), col("n_ws_tokens"), col("n_bpe_tokens"), col("fertility_pm"))
      .orderBy(col("doc_id"))
  }

  /** C57 `zipf_slope` — Zipf's-law fit of the corpus: OLS slope of
    * ln(freq) on ln(rank) over the top-N words (a well-formed natural
    * corpus slopes ≈ −1; a synthetic or template-heavy corpus
    * doesn't — a one-number corpus-health check). One corpus scan +
    * one bounded word-count shuffle; the regression runs on N rows
    * collected into a rank-ordered array, folded sequentially so the
    * double sums are engine-exact (ln inputs are micro-rounded first).
    */
  def zipfSlope(documents: DataFrame, topN: Int = 200): DataFrame = {
    import graft.expressions.Kernels
    val ranked = documents
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(topN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("word"))).cast("long"))
    val g = ranked
      .select(col("rank"),
        u6(log(col("rank").cast("double"))).as("x"),
        u6(log(col("n").cast("double"))).as("y"))
      .agg(
        transform(array_sort(collect_list(struct(col("rank"), col("x"), col("y")))),
          s => struct(s("x").as("x"), s("y").as("y"))).as("pts"))
      .withColumn("n", size(col("pts")).cast("double"))
      .withColumn("xa", transform(col("pts"), p => p("x")))
      .withColumn("ya", transform(col("pts"), p => p("y")))
      .withColumn("sx", Kernels.seqFold(col("xa"), "sum"))
      .withColumn("sy", Kernels.seqFold(col("ya"), "sum"))
      .withColumn("sxy", Kernels.dot(col("xa"), col("ya")))
      .withColumn("sx2", Kernels.seqFold(col("xa"), "sumsq"))
    g.select(
        col("n").cast("long").as("n_words"),
        u6((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sx2") - col("sx") * col("sx"))).as("slope"),
        u6((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sx2") - col("sx") * col("sx"))) * col("sx")) / col("n"))
          .as("intercept"))
  }

  /** C58 `heaps_law` — vocabulary-growth curve (Heaps' law): for each
    * document in doc_id order, the cumulative token count and
    * cumulative distinct-vocabulary size. A word's first witness is its
    * min doc_id (one word-level shuffle); the two running totals are
    * then prefix sums over per-doc integers.
    *
    * The prefix sum is the TWO-PHASE distributed form, not a global
    * single-partition window: docs land in width-`bucketWidth` doc_id
    * buckets, phase 1 cumsums the per-bucket totals (bucket table ≪
    * corpus), phase 2 cumsums within each bucket in parallel and adds
    * the broadcast bucket offset. Identical integers to the global
    * window, but every stage is partition-parallel at 100 TB.
    */
  def heapsLaw(documents: DataFrame, bucketWidth: Long = 4096): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")).as("word"))
    val perDocTokens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
    val newWords = toks
      .groupBy(col("word")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("new_words"))
      .withColumnRenamed("first_doc", "doc_id")
    val perDoc = documents.select(col("doc_id"))
      .join(perDocTokens, Seq("doc_id"), "left")
      .join(newWords, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("new_words"), lit(0L)).as("new_words"))
      .withColumn("bucket", expr(s"doc_id div $bucketWidth"))
    val wInBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = perDoc
      .groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bt"), sum(col("new_words")).as("bv"))
      .withColumn("tok_off",
        coalesce(sum(col("bt")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("voc_off",
        coalesce(sum(col("bv")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("tok_off"), col("voc_off"))
    perDoc
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_tokens", col("tok_off") + sum(col("n_tokens")).over(wInBucket))
      .withColumn("cum_vocab", col("voc_off") + sum(col("new_words")).over(wInBucket))
      .select(col("doc_id"), col("n_tokens"), col("new_words"),
        col("cum_tokens"), col("cum_vocab"))
      .orderBy(col("doc_id"))
  }

  /** C68 `pack_efficiency` — per-shard packing QC over [[docPack]]'s
    * batches: batch count, docs, tokens, and the integer per-mille fill
    * ratio (Σ batch tokens / batches·budget). The number that says
    * whether the packing budget wastes context window — read alongside
    * C65's length quantiles when retuning `budget`. All-integer
    * arithmetic on top of docPack's shard-parallel cumsum; two
    * map-side-combinable aggregates, no extra corpus pass.
    */
  def packEfficiency(documents: DataFrame, budget: Long = 2048, shards: Int = 32): DataFrame =
    docPack(documents, budget, shards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("batch_tokens"), count(lit(1)).as("n_docs"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("batch_tokens")).as("tokens"),
        expr(s"(1000 * sum(batch_tokens)) div (count(1) * $budget)").as("fill_pm"))
      .orderBy(col("shard"))

  /** C65 `token_length_quantiles` — exact per-source token-length
    * percentiles (p10/p50/p90 + max): the corpus-shape numbers a data
    * build reads before fixing packing budgets and truncation limits,
    * sliced by source because length pathologies are source-local (one
    * crawl's boilerplate, one dump's truncation). Exact `percentile`
    * (interpolating, = DuckDB `quantile_cont`) — at 100 TB swap in
    * `percentile_approx` with the identical plan shape; the per-group
    * sort is bounded by docs-per-source.
    */
  def tokenLengthQuantiles(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        TextFns.wsTokenCount(col("text")).cast("double").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        u6(expr("percentile(n_tokens, 0.1)")).as("p10"),
        u6(expr("percentile(n_tokens, 0.5)")).as("p50"),
        u6(expr("percentile(n_tokens, 0.9)")).as("p90"),
        max(col("n_tokens")).cast("long").as("max_tokens"))
      .orderBy(col("source"))

  /** C70 `unigram_kl` — symmetric KL divergence between the top-K
    * unigram distributions of the doc_id-parity halves: the CONTINUOUS
    * drift measure behind C66's set-overlap view (overlap can stay
    * high while the mass shifts; KL catches that). Add-1 smoothing
    * over the union vocabulary, so both directions are finite. Scale
    * shape: one combinable word-count shuffle, two TakeOrdered top-K
    * picks (never a global sort), then a single ≤2K-row fold.
    * Determinism: all inputs to the divisions are exact integers, each
    * p·ln(p/q)+q·ln(q/p) term is rounded to 6 before the sequential
    * word-ordered fold — the zipf_slope ln discipline.
    */
  def unigramKl(documents: DataFrame, topK: Int = 500): DataFrame = {
    // Eagerly materialized: the vocab table is consumed by BOTH top-K
    // picks below, and without a lineage cut each pick replans the
    // whole corpus scan + word count (two 100 TB passes for one
    // bounded table). Same localCheckpoint pattern as the shared pair
    // builds; the table is |vocab|-bounded, not corpus-bounded.
    val byWord = documents
      .select((col("doc_id") % 2).as("half"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("c1"))
      .localCheckpoint(true)
    val top0 = byWord.orderBy(col("c0").desc, col("word")).limit(topK)
    val top1 = byWord.orderBy(col("c1").desc, col("word")).limit(topK)
    val u = top0.unionByName(top1)
      .groupBy(col("word")).agg(max(col("c0")).as("c0"), max(col("c1")).as("c1"))
    u.agg(
      count(lit(1)).cast("double").as("v"),
      sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
      sort_array(collect_list(struct(col("word"), col("c0"), col("c1")))).as("arr"))
      .withColumn("terms", transform(col("arr"), s => {
        val p = (s("c0") + 1) / (col("n0") + col("v"))
        val q = (s("c1") + 1) / (col("n1") + col("v"))
        u6(p * log(p / q) + q * log(q / p))
      }))
      .select(col("v").cast("long").as("n_words"), col("n0"), col("n1"),
        u6(graft.expressions.Kernels.seqFold(col("terms"), "sum")).as("kl_sym"))
  }

  /** C66 `vocab_overlap` — top-K vocabulary Jaccard between the two
    * doc_id-parity halves of the corpus: the text-side drift check
    * (embedding_drift's lexical twin) a pipeline runs to confirm a
    * shard split / incremental crawl hasn't shifted the language. Two
    * bounded top-K sets (rank = count desc, word — total order), one
    * integer Jaccard in per-mille. Word counting is one shuffle,
    * map-side combinable; everything after is K-bounded.
    */
  def vocabOverlap(documents: DataFrame, topK: Int = 500): DataFrame = {
    val words = documents
      .select((col("doc_id") % 2).as("half"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("half"), col("word")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("half")).orderBy(col("n").desc, col("word"))
    words
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .groupBy(col("word")).agg(count(lit(1)).as("halves"))
      .agg(count(lit(1)).as("n_union"),
        sum(when(col("halves") === 2, 1L).otherwise(0L)).as("n_common"))
      .select(col("n_union"), col("n_common"),
        // explicit zero guard (repo rule: every division guards its zero
        // case) — don't rely on the NULL numerator short-circuiting the
        // ANSI IntegralDivide on an empty corpus
        when(col("n_union") === 0, lit(null))
          .otherwise(expr("(1000 * n_common) div n_union")).as("jaccard_pm"))
  }

  /** C74 `token_gini` — token-mass concentration per source: the Gini
    * coefficient of per-document token counts, from the rank-weighted
    * form G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over counts sorted
    * ascending (doc_id tie-break → total order). A source whose token
    * mass sits in a few giant documents (high Gini) behaves very
    * differently under document-level dedup/sampling than its doc
    * count suggests — this is the one-number screen for that. ALL
    * arithmetic is integer (ranks × counts), output integer per-mille:
    * exact under any engine. One scan + one rank window + one
    * aggregate, all partitioned by source.
    */
  def tokenGini(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("n_toks"), col("doc_id"))
    documents
      .select(col("doc_id"), col("source"),
        TextFns.wsTokenCount(col("text")).cast("long").as("n_toks"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("i") * col("n_toks")).as("s_ix"))
      .withColumn("gini_pm", expr(
        """CASE WHEN n_docs * total_tokens = 0 THEN NULL
          |ELSE (1000 * (2 * s_ix - (n_docs + 1) * total_tokens)) div (n_docs * total_tokens) END""".stripMargin))
      .select(col("source"), col("n_docs"), col("total_tokens"), col("gini_pm"))
      .orderBy(col("source"))
  }

  /** C77 `gopher_rules` — the named Gopher quality-filter rules (Rae et
    * al. 2021, table A1) as explicit per-document booleans, one scan:
    * word count in [50, 100k], mean word length in [3, 10], symbol
    * ("#"/"...")-to-word ratio ≤ 0.1, ≤ 90% bullet-started lines,
    * ≤ 30% ellipsis-ended lines, ≥ 80% words with an alphabetic char,
    * ≥ 2 stopword hits. [[qualitySignals]] is the composite gate; this
    * is the per-rule diagnosis a filter-tuning pass reads (which rule
    * kills which source). Every ratio test is cross-multiplied to
    * INTEGER comparisons (3n ≤ Σlen ≤ 10n etc.) — no division, no FP,
    * exact in any engine.
    */
  def gopherRules(documents: DataFrame): DataFrame =
    gopherRulesCore(documents).orderBy(col("doc_id"))

  /** [[gopherRules]] without the presentation sort — directly usable on
    * a STREAMING documents DataFrame (the projection is stateless), see
    * [[graft.streaming.StreamingOps.qualityGateStream]].
    */
  def gopherRulesCore(documents: DataFrame): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    val lines = split(col("text"), "\n")
    documents
      .withColumn("toks", toks)
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("sum_wlen", length(regexp_replace(col("text"), "\\s+", "")).cast("long"))
      .withColumn("n_sym",
        (regexp_count(col("text"), lit("#")) + regexp_count(col("text"), lit("\\.\\.\\."))).cast("long"))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_bullet", size(filter(lines,
        l => trim(l).startsWith("-") || trim(l).startsWith("*"))).cast("long"))
      .withColumn("n_ellipsis", size(filter(lines,
        l => trim(l).endsWith("..."))).cast("long"))
      .withColumn("n_alpha", size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("n_stop", size(filter(col("toks"), t => t.isInCollection(stops))).cast("long"))
      .withColumn("rule_word_count", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("rule_mean_word_len", col("n_words") > 0 &&
        col("sum_wlen") >= lit(3L) * col("n_words") &&
        col("sum_wlen") <= lit(10L) * col("n_words"))
      .withColumn("rule_symbol_ratio", lit(10L) * col("n_sym") <= col("n_words"))
      .withColumn("rule_bullet", lit(10L) * col("n_bullet") <= lit(9L) * col("n_lines"))
      .withColumn("rule_ellipsis", lit(10L) * col("n_ellipsis") <= lit(3L) * col("n_lines"))
      .withColumn("rule_alpha", lit(10L) * col("n_alpha") >= lit(8L) * col("n_words"))
      .withColumn("rule_stopwords", col("n_stop") >= 2)
      .withColumn("pass_gopher",
        col("rule_word_count") && col("rule_mean_word_len") && col("rule_symbol_ratio") &&
          col("rule_bullet") && col("rule_ellipsis") && col("rule_alpha") && col("rule_stopwords"))
      .select(col("doc_id"), col("n_words"), col("rule_word_count"),
        col("rule_mean_word_len"), col("rule_symbol_ratio"), col("rule_bullet"),
        col("rule_ellipsis"), col("rule_alpha"), col("rule_stopwords"), col("pass_gopher"))
  }

  /** C137 `corpus_pipeline` — the training-corpus funnel END-TO-END in
    * one query: Gopher quality gate → exact dedup among the survivors
    * (md5 star-rep, the C134 convention) → per-source reconciliation
    * of what survives each stage and how many whitespace tokens it
    * carries (the unit mixture budgets are denominated in). C103
    * `filter_funnel` reports stage COUNTS for independent predicates;
    * this is the composed pipeline itself — dedup runs on the
    * quality-PASSING corpus, the order real pipelines use (filtering
    * first shrinks the dedup key space). Scale shape: one documents
    * scan feeds the stateless gate, one md5-keyed shuffle (32 hex
    * chars, never the document) finds group reps, one source rollup.
    */
  def corpusPipeline(documents: DataFrame): DataFrame = {
    val toks = when(length(trim(col("text"))) === 0, lit(0L))
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val gated = gopherRulesCore(documents).select(col("doc_id"), col("pass_gopher"))
    val base = documents
      .select(col("doc_id"), col("source"), col("text"), toks.as("n_toks"))
      .join(gated, Seq("doc_id"))
    val quality = base.filter(col("pass_gopher"))
    val reps = quality.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("rep"))
    val unique = quality.withColumn("h", md5(col("text")))
      .join(reps, Seq("h"))
      .filter(col("doc_id") === col("rep"))
    base.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pass_gopher"), 1L).otherwise(0L)).as("n_quality"),
        sum(col("n_toks")).as("tokens_in"))
      .join(
        unique.groupBy(col("source")).agg(
          count(lit(1)).as("n_unique"),
          sum(col("n_toks")).as("tokens_unique")),
        Seq("source"), "left")
      .na.fill(0L, Seq("n_unique", "tokens_unique"))
      .orderBy(col("source"))
  }

  /** C79 `lm_score_buckets` — CCNet-style perplexity bucketing: each
    * source's documents split into head/middle/tail terciles by their
    * [[lmScore]] bigram fluency (rank-based integer cut
    * `((rk−1)·3) div n + 1` — the portable [[Analytics.momentumXsec]]
    * quintile idiom, no percentile interpolation), with per-bucket doc
    * counts and score ranges. This is the artifact a mixture designer
    * reads to keep a source's fluent head and drop its tail. All
    * integer after the lm scores (which are themselves integer ppm) —
    * exact replay.
    */
  def lmScoreBuckets(documents: DataFrame,
                     scores: Option[DataFrame] = None): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("lm_ppm"), col("doc_id"))
    val n = count(lit(1)).over(Window.partitionBy(col("source")))
    scores.getOrElse(lmScore(documents))
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_src", n.cast("long"))
      .withColumn("bucket", expr("((rk - 1) * 3) div n_src + 1"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("lm_ppm")).as("min_ppm"),
        max(col("lm_ppm")).as("max_ppm"),
        sum(col("lm_ppm")).as("sum_ppm"))
      .withColumn("mean_ppm", expr("sum_ppm div n_docs"))
      .select(col("source"), col("bucket"), col("n_docs"),
        col("min_ppm"), col("max_ppm"), col("mean_ppm"))
      .orderBy(col("source"), col("bucket"))
  }

  /** C83 `temperature_mix` — temperature-scaled mixture weights: each
    * source's sampling weight ∝ p^(1/T) of its token share p, here at
    * the customary T = 2 (multilingual-training's square-root
    * upsampling of small sources — the mBERT/XLM-R exponent). √ is
    * IEEE-correctly-rounded in BOTH engines (unlike pow — which is why
    * T is fixed at 2 and the exponent is sqrt, not pow(p, 0.5)), the
    * share and root are u6-rounded, and the normalization sums
    * MICRO-INTEGERS over the bounded source set — order-free; final
    * weights are integer per-mille. Totals ride empty-frame windows
    * (the benford idiom) over the per-source rows.
    */
  def temperatureMix(documents: DataFrame): DataFrame = {
    val all = Window.partitionBy()
    documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFns.wsTokenCount(col("text")).cast("long")).as("n_tokens"))
      .withColumn("total", sum(col("n_tokens")).over(all))
      .withColumn("p", u6(col("n_tokens").cast("double") /
        when(col("total") === 0, lit(null)).otherwise(col("total").cast("double"))))
      .withColumn("w_raw", u6(sqrt(col("p"))))
      .withColumn("w_micro", round(col("w_raw") * lit(1000000.0)).cast("long"))
      .withColumn("tw", sum(col("w_micro")).over(all))
      .withColumn("weight_pm", expr(
        "CASE WHEN tw = 0 THEN NULL ELSE (1000 * w_micro) div tw END"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("p"), col("w_raw"), col("weight_pm"))
      .orderBy(col("source"))
  }

  /** C86 `lang_confusion` — the language-ID confusion matrix: labeled
    * `lang` vs [[TextFns.langId]]'s guess, with per-label recall
    * share — the eval that turns `lang_id` from a heuristic into a
    * measured one (which languages it confuses, how often 'und' fires).
    * One scan + a languages²-bounded aggregate; shares are integer
    * per-mille of integer counts.
    */
  def langConfusion(documents: DataFrame): DataFrame = {
    val tot = Window.partitionBy(col("lang"))
    documents
      .select(col("lang"), TextFns.langId(col("text")).as("lang_guess"))
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_lang", sum(col("n_docs")).over(tot))
      .withColumn("share_pm", expr(
        "CASE WHEN n_lang = 0 THEN NULL ELSE (1000 * n_docs) div n_lang END"))
      .select(col("lang"), col("lang_guess"), col("n_docs"), col("share_pm"))
      .orderBy(col("lang"), col("lang_guess"))
  }

  /** C87 `dataset_card` — the one-row corpus summary every dataset
    * release publishes: document/source/language counts, token and
    * character mass, mean document length, and the exact-duplicate
    * share — the numbers a dataset card's "composition" table carries.
    * One scan for the per-doc measures + one content-hash aggregate
    * for the dup counts; everything integer (means are integer
    * divisions, shares per-mille).
    */
  def datasetCard(documents: DataFrame): DataFrame = {
    val base = documents.agg(
      count(lit(1)).as("n_docs"),
      count_distinct(col("source")).as("n_sources"),
      count_distinct(col("lang")).as("n_langs"),
      sum(TextFns.wsTokenCount(col("text")).cast("long")).as("total_tokens"),
      sum(length(col("text")).cast("long")).as("total_chars"))
    val dups = documents
      .groupBy(md5(col("text"))).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") - 1).as("exact_dup_docs"))
    // 1-row ⨝ broadcast(1-row): the whitelisted bounded-BNL shape
    // (tfidf_topk / domain_mix precedent)
    base.crossJoin(broadcast(dups))
      .withColumn("mean_doc_tokens", expr("total_tokens div n_docs"))
      .withColumn("dup_share_pm", expr(
        "CASE WHEN n_docs = 0 THEN NULL ELSE (1000 * exact_dup_docs) div n_docs END"))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("total_tokens"), col("total_chars"), col("mean_doc_tokens"),
        col("exact_dup_docs"), col("dup_share_pm"))
  }

  /** C84 `rouge_overlap` — ROUGE-1/ROUGE-2 recall between candidate
    * and reference documents: the distinct-n-gram recall that scores a
    * generated/retrieved text against a reference (Lin 2004) — here
    * over (ref × cand) id sets, the shape an eval harness runs over
    * (model output, gold) pairs. Distinct (doc, gram) projections meet
    * in an equality join per n — bucketed, never all-pairs over text —
    * and every output is an integer per-mille of integer counts: exact
    * replay for free. Refs are tiny by definition → broadcast.
    */
  def rougeOverlap(documents: DataFrame, refIds: Seq[Long], candIds: Seq[Long]): DataFrame = {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    def grams(df: DataFrame, n: Int, side: String): DataFrame = {
      val g = if (n == 1) toks else zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b))
      df.select(col("doc_id").as(s"${side}_id"), explode(array_distinct(g)).as("g"))
    }
    def recall(n: Int, name: String): DataFrame = {
      val refs = grams(documents.filter(col("doc_id").isin(refIds: _*)), n, "ref")
      val cands = grams(documents.filter(col("doc_id").isin(candIds: _*)), n, "cand")
      val refSizes = refs.groupBy(col("ref_id")).agg(count(lit(1)).as(s"n_ref_$name"))
      val overlaps = cands.join(broadcast(refs), Seq("g"))
        .groupBy(col("ref_id"), col("cand_id")).agg(count(lit(1)).as("shared"))
      // full (ref × cand) spine so zero-overlap pairs still score 0 —
      // built from the PARAMETER id sets as local rows (a crossJoin of
      // two scans would plan as the forbidden CartesianProduct)
      val spark = documents.sparkSession
      import spark.implicits._
      val spine = (for { r <- refIds; c <- candIds } yield (r, c)).toDF("ref_id", "cand_id")
      spine
        .join(overlaps, Seq("ref_id", "cand_id"), "left")
        .join(broadcast(refSizes), Seq("ref_id"), "left")
        .select(col("ref_id"), col("cand_id"),
          coalesce(col(s"n_ref_$name"), lit(0L)).as(s"n_ref_$name"),
          coalesce(col("shared"), lit(0L)).as(s"shared_$name"))
        .withColumn(s"rouge${name}_pm", expr(
          s"CASE WHEN n_ref_$name = 0 THEN NULL ELSE (1000 * shared_$name) div n_ref_$name END"))
    }
    recall(1, "1")
      .join(recall(2, "2"), Seq("ref_id", "cand_id"))
      .orderBy(col("ref_id"), col("cand_id"))
  }

  /** C78 `dsir_weights` — Data Selection via Importance Resampling
    * (Xie et al. 2023) log-importance weights: per document,
    * Σ_tokens ln(p_target(w)/p_raw(w)) under add-one-smoothed unigram
    * models — here target = the `targetLang` slice, raw = the whole
    * corpus (the "reweight the crawl toward the target distribution"
    * primitive; sampling by these weights is [[weightedSample]]).
    *
    * Determinism: the per-TOKEN log-ratio is computed once per
    * VOCABULARY word (ratio of identically-computed doubles, ONE ln
    * call) and immediately micro-rounded to an integer; each document
    * then SUMS integers — order-insensitive, so the only FP surface is
    * the bounded vocab table, same ln discipline as [[zipfSlope]].
    * Scale shape: two vocab aggregates + one broadcast-sized totals
    * row + one token join against the vocab table — all linear.
    */
  def dsirWeights(documents: DataFrame, targetLang: String = "en"): DataFrame = {
    val toks = documents.select(col("doc_id"), col("lang"),
      explode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")).as("tok"))
    // both models in ONE vocab aggregate (a conditional count), not a
    // target aggregate joined back — saves two token-keyed exchanges
    val vocab = toks.groupBy(col("tok")).agg(
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("c_t"),
      count(lit(1)).as("c_r"))
    val totals = vocab.agg(sum(col("c_t")).as("n_t"), sum(col("c_r")).as("n_r"),
      count(lit(1)).as("v"))
    val lnr = vocab.crossJoin(broadcast(totals))
      .withColumn("lnr_micro", round(log(
        ((col("c_t") + 1).cast("double") / (col("n_t") + col("v")).cast("double")) /
          ((col("c_r") + 1).cast("double") / (col("n_r") + col("v")).cast("double"))) * lit(1000000.0)).cast("long"))
      .select(col("tok"), col("lnr_micro"))
    toks.join(lnr, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("lnr_micro")).as("dsir_micro"))
      .orderBy(col("doc_id"))
  }

  /** C91 `tokenizer_fertility` — tokens per 100 chars by detected
    * language: the number that tells you which languages your
    * tokenizer fragments (CJK text at 1 token/char is a training-cost
    * multiplier; the classic argument for vocab rebalancing). One
    * corpus scan — language guess, BPE-ish token count, and char count
    * all come from compiled kernels in the same pass; sums are
    * integers, the fertility ratio is the only float op.
    */
  def tokenizerFertility(documents: DataFrame): DataFrame =
    documents
      .select(TextFns.langId(col("text")).as("lang_guess"),
        TextFns.bpeTokenCount(col("text")).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("lang_guess"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("fertility_per_100c", u6(lit(100.0) * col("total_tokens") /
        when(col("total_chars") === 0, lit(null)).otherwise(col("total_chars"))))
      .orderBy(col("lang_guess"))

  /** C92 `ngram_coverage` — cumulative corpus share of the top-k
    * unigrams at k ∈ {10, 100, 1000}: how head-heavy the lexicon is
    * (the Zipf curve read as a coverage number — the compression /
    * vocab-sizing planning artifact). Scale shape: word counts are one
    * combinable shuffle; the rank window runs AFTER a top-`maxCut`
    * TakeOrdered, so the single-partition sort touches ≤ 1000 rows
    * regardless of vocab size; the corpus total joins back as a 1-row
    * broadcast.
    */
  def ngramCoverage(documents: DataFrame, cuts: Seq[Int] = Seq(10, 100, 1000)): DataFrame = {
    val counts = documents
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total_tokens")).withColumn("k", lit(1))
    counts
      .orderBy(col("n").desc, col("word")).limit(cuts.max)
      .withColumn("rank", row_number().over(Window.orderBy(col("n").desc, col("word"))))
      .withColumn("cut", explode(array(cuts.map(c => lit(c)): _*)))
      .filter(col("rank") <= col("cut"))
      .groupBy(col("cut"))
      .agg(count(lit(1)).as("n_words"), sum(col("n")).as("covered_tokens"))
      .withColumn("k", lit(1))
      .join(broadcast(total), Seq("k"))
      .select(col("cut").cast("long").as("cut"), col("n_words"), col("covered_tokens"),
        col("total_tokens"),
        u6(col("covered_tokens").cast("double") / col("total_tokens").cast("double")).as("share"))
      .orderBy(col("cut"))
  }

  /** C93 `dup_length_bias` — are boilerplate-family documents
    * systematically shorter/longer than unique ones? Family size per
    * doc on [[Dedup.prefixDups]]' normalized-prefix key (the notion of
    * "duplicate" that is actually populated on crawl-shaped corpora —
    * exact-content copies are empirically near-zero while template
    * families are everywhere), then a two-row aggregate of integer
    * char/token sums — the sanity check that dedup isn't about to
    * skew the corpus length distribution.
    */
  def dupLengthBias(documents: DataFrame, prefixLen: Int = 64): DataFrame =
    documents
      .withColumn("n_copies",
        count(lit(1)).over(Window.partitionBy(
          md5(substring(lower(trim(col("text"))), 1, prefixLen)))))
      .withColumn("is_dup", col("n_copies") > 1)
      .groupBy(col("is_dup"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        sum(TextFns.wsTokenCount(col("text")).cast("long")).as("total_tokens"))
      .withColumn("mean_chars",
        u6(col("total_chars").cast("double") / col("n_docs").cast("double")))
      .orderBy(col("is_dup"))

  /** C96 `pii_stats` — per-source PII exposure summary over
    * [[piiRedact]]'s patterns: docs touched, match counts per class,
    * per-mille share of PII-bearing docs — the compliance dashboard
    * row that decides which source needs the redaction pass at all.
    * Map-only regex scan + one hash aggregate, all integer.
    */
  def piiStats(documents: DataFrame): DataFrame =
    documents.select(col("source"),
      size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).cast("long").as("ne"),
      size(regexp_extract_all(col("text"), lit(IpPat), lit(0))).cast("long").as("ni"),
      size(regexp_extract_all(col("text"), lit(PhonePat), lit(0))).cast("long").as("np"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ne") + col("ni") + col("np") > 0, 1L).otherwise(0L)).as("n_docs_with_pii"),
        sum(col("ne")).as("n_emails"),
        sum(col("ni")).as("n_ips"),
        sum(col("np")).as("n_phones"))
      .withColumn("pii_doc_pm", expr("(1000 * n_docs_with_pii) div n_docs"))
      .orderBy(col("source"))

  /** C97 `readability` — Flesch reading ease per document with
    * regex-portable proxies: words = whitespace tokens (token_count's
    * convention), sentences = [.!?]+ runs floored at 1, syllables =
    * lowercase vowel-group runs. Counts are integers; the score is one
    * fixed float op sequence over them (the three Flesch constants are
    * short decimals whose DECIMAL→DOUBLE conversion is exact in both
    * engines). The quality-filter signal between `text_quality`'s
    * surface ratios and `lm_score`'s model scores.
    */
  def readability(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      TextFns.wsTokenCount(col("text")).cast("long").as("n_words"),
      greatest(lit(1L),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"))
        .as("n_sentences"),
      size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).cast("long")
        .as("n_syllables"))
      .withColumn("flesch", u6(
        when(col("n_words") === 0, lit(null)).otherwise(
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double")))))
      .orderBy(col("doc_id"))

  /** C98 `lexical_diversity` — per-document type/token ratio (plus the
    * length-robust root-TTR n_types/√n_toks): the repetitiveness
    * screen that catches keyword-stuffed and template text that
    * [[readability]]'s sentence shape misses. One map-only scan;
    * counts integer, TTR integer per-mille, root-TTR one fixed float
    * op. Token convention = the corpus-wide whitespace split.
    */
  def lexicalDiversity(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "").as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") >= 1)
      .withColumn("n_types", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("ttr_pm", expr("(1000 * n_types) div n_toks"))
      .withColumn("root_ttr", u6(
        col("n_types").cast("double") / sqrt(col("n_toks").cast("double"))))
      .select(col("doc_id"), col("n_toks"), col("n_types"),
        col("ttr_pm"), col("root_ttr"))
      .orderBy(col("doc_id"))

  /** C100 `source_jsd` — per-source Jensen–Shannon divergence against
    * the corpus-wide unigram distribution over the global top-K
    * vocabulary: the bounded, symmetric, never-infinite drift score a
    * mixture designer tracks per crawl slice ([[unigramKl]]'s
    * source-keyed sibling — KL explodes on disjoint support, JSD is
    * capped at ln 2). Add-one smoothing over the K-word support; the
    * dense source×word grid comes from ONE bounded 1-row broadcast
    * (vocab totals + source list), never a corpus-sized cross join;
    * per-word terms are u6-rounded and summed by a word-ordered fold.
    */
  def sourceJsd(documents: DataFrame, topK: Int = 300): DataFrame = {
    val words = documents
      .select(col("source"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("n_sw"))
    val top = words.groupBy(col("word")).agg(sum(col("n_sw")).as("n_gw"))
      .orderBy(col("n_gw").desc, col("word")).limit(topK)
    val glob = top.agg(count(lit(1)).as("v"), sum(col("n_gw")).as("n_g"))
    val srcs = words.agg(sort_array(collect_set(col("source"))).as("srcs"))
    val dense = top
      .crossJoin(broadcast(glob))
      .crossJoin(broadcast(srcs))
      .select(col("word"), col("n_gw"), col("v"), col("n_g"),
        explode(col("srcs")).as("source"))
      .join(words, Seq("source", "word"), "left")
      .na.fill(0L, Seq("n_sw"))
    dense
      .withColumn("n_s", sum(col("n_sw")).over(Window.partitionBy(col("source"))))
      .withColumn("p", (col("n_sw") + 1).cast("double") / (col("n_s") + col("v")).cast("double"))
      .withColumn("q", (col("n_gw") + 1).cast("double") / (col("n_g") + col("v")).cast("double"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("term", u6(
        (col("p") * log(col("p") / col("m")) + col("q") * log(col("q") / col("m"))) / 2))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_s"),
        sort_array(collect_list(struct(col("word"), col("term")))).as("arr"))
      .withColumn("jsd", u6(graft.expressions.Kernels.seqFold(
        transform(col("arr"), s => s("term")), "sum")))
      .select(col("source"), col("n_s"), col("jsd"))
      .orderBy(col("source"))
  }

  /** C102 `bigram_entropy` — per-source unigram/bigram Shannon entropy
    * and the conditional entropy H(w₂|w₁) = H(bigrams) − H(unigrams):
    * low conditional entropy means the next token is predictable from
    * the previous one — templatic/boilerplate text at the corpus scale
    * ([[lmScore]] reads the same signal per document). Each entropy is
    * H = ln N − (Σ c·ln c)/N with the Σ carried as ORDER-INSENSITIVE
    * micro-integer terms (c·ln c is irrational for c ≥ 2, so the
    * round() half-boundary is unreachable — the zipf discipline);
    * count aggregation is map-side combinable, no fold arrays needed.
    */
  def bigramEntropy(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("source"),
      filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "").as("toks"))
    val uni = toks.select(col("source"), explode(col("toks")).as("g"))
      .groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
    val bi = toks.select(col("source"), explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("g"))
      .groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
    def entropy(counts: DataFrame): DataFrame = counts
      .withColumn("t",
        round(col("c").cast("double") * log(col("c").cast("double")) * 1e6).cast("long"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n"), sum(col("t")).as("s"))
      .withColumn("h", u6(log(col("n").cast("double")) -
        (col("s").cast("double") / 1e6) / col("n").cast("double")))
    entropy(uni)
      .select(col("source"), col("n").as("n_tokens"), col("h").as("h_uni"))
      .join(entropy(bi)
        .select(col("source"), col("n").as("n_bigrams"), col("h").as("h_bi")), Seq("source"))
      .withColumn("h_cond", u6(col("h_bi") - col("h_uni")))
      .orderBy(col("source"))
  }

  /** C103 `filter_funnel` — the quality-gate funnel per source: doc
    * counts surviving each successive stage (length floor → Gopher
    * rules → no email PII → target language), ending in the integer
    * per-mille survival rate. The single number-set a corpus build
    * publishes per crawl slice to show WHERE documents die — the
    * pipeline-level face of [[gopherRulesCore]] (shared
    * implementation). One corpus scan per side of one equi-join, then
    * a per-source integer aggregate.
    */
  def filterFunnel(documents: DataFrame, minChars: Long = 200L,
                   targetLang: String = "en"): DataFrame = {
    val gates = gopherRulesCore(documents).select(col("doc_id"), col("pass_gopher"))
    documents
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).cast("long").as("n_emails"))
      .join(gates, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("n_chars") >= minChars, 1L).otherwise(0L)).as("n_len"),
        sum(when(col("n_chars") >= minChars && col("pass_gopher"),
          1L).otherwise(0L)).as("n_gopher"),
        sum(when(col("n_chars") >= minChars && col("pass_gopher") &&
          col("n_emails") === 0, 1L).otherwise(0L)).as("n_pii"),
        sum(when(col("n_chars") >= minChars && col("pass_gopher") &&
          col("n_emails") === 0 && col("lang") === targetLang, 1L).otherwise(0L)).as("n_lang"))
      .withColumn("survive_pm", when(col("n_total") === 0, lit(null))
        .otherwise(expr("(1000 * n_lang) div n_total")))
      .orderBy(col("source"))
  }

  /** C109 `token_burstiness` — Church-style burstiness for the top-K
    * corpus words: collection frequency over document frequency (mean
    * occurrences per CONTAINING doc). Function words sit near 1
    * (everywhere, once-ish); topical/templatic words burst high — the
    * lexical read that separates them before stopword lists are
    * hand-curated. One combinable (word → cf, df) aggregate, a bounded
    * top-K cut (TakeOrdered), one u6 ratio.
    */
  def tokenBurstiness(documents: DataFrame, topK: Int = 100): DataFrame =
    documents
      .select(col("doc_id"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cf"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("cf").desc, col("word"))
      .limit(topK)
      .withColumn("burstiness", u6(col("cf").cast("double") / col("df").cast("double")))
      .select(col("word"), col("cf"), col("df"), col("burstiness"))
      .orderBy(col("cf").desc, col("word"))

  /** C111 `char_class_profile` — per-source character-class mix
    * (letters / digits / whitespace / other, integer per-mille of
    * total chars): the cheapest corpus-health fingerprint — a source
    * whose digit or "other" share jumps between crawls broke upstream
    * (tables, base64 blobs, encoding damage) before any tokenizer
    * sees it. One map-only scan (class counts via character-class
    * strips), one integer aggregate.
    */
  def charClassProfile(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        length(col("text")).cast("long").as("n"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long").as("alpha"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("digit"),
        length(regexp_replace(col("text"), "[^ \\t\\n]", "")).cast("long").as("ws"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_chars"), sum(col("alpha")).as("n_alpha"),
        sum(col("digit")).as("n_digit"), sum(col("ws")).as("n_ws"))
      .withColumn("n_other",
        col("n_chars") - col("n_alpha") - col("n_digit") - col("n_ws"))
      .withColumn("alpha_pm", when(col("n_chars") === 0, lit(null))
        .otherwise(expr("(1000 * n_alpha) div n_chars")))
      .withColumn("digit_pm", when(col("n_chars") === 0, lit(null))
        .otherwise(expr("(1000 * n_digit) div n_chars")))
      .withColumn("other_pm", when(col("n_chars") === 0, lit(null))
        .otherwise(expr("(1000 * n_other) div n_chars")))
      .select(col("source"), col("n_chars"), col("n_alpha"), col("n_digit"),
        col("n_ws"), col("n_other"), col("alpha_pm"), col("digit_pm"), col("other_pm"))
      .orderBy(col("source"))

  /** C112 `hapax_ratio` — share of each source's VOCABULARY occurring
    * exactly once (hapax legomena), in integer per-mille: the
    * classical lexical-richness read ([[tokenBurstiness]]'s opposite
    * end — natural prose runs ~40-60% hapax; templatic/generated text
    * collapses it). One combinable (source, word) count + one integer
    * aggregate per source.
    */
  def hapaxRatio(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("c")).as("n_tokens"))
      .withColumn("hapax_pm", when(col("n_types") === 0, lit(null))
        .otherwise(expr("(1000 * n_hapax) div n_types")))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("hapax_pm"))
      .orderBy(col("source"))

  /** C113 `length_by_lang` — document length distribution stratified
    * by LABELED language: doc count, min/max and the exact median
    * n_chars (an INTEGER ORDER STATISTIC off the sorted per-lang
    * array — no percentile interpolation, no float). The
    * stratification [[tokenLengthQuantiles]] doesn't give: truncation
    * or boilerplate hitting ONE language (bad segmenter, a broken
    * crawler locale) shows here first.
    */
  def lengthByLang(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        array_sort(collect_list(col("n_chars"))).as("ls"))
      .withColumn("median_chars",
        expr("element_at(ls, cast((size(ls) + 1) div 2 as int))"))
      .select(col("lang"), col("n_docs"), col("min_chars"),
        col("median_chars"), col("max_chars"))
      .orderBy(col("lang"))

  /** C114 `word_length_profile` — per-source word-length morphology:
    * token count, exact milli-unit mean word length ((1000·Σlen) div
    * n — integer, order-insensitive), and the longest token. A
    * tokenizer/encoding screen: base64 blobs and concatenated-word
    * damage blow up the mean and max while char_class_profile still
    * looks clean. Map-only explode + one integer aggregate.
    */
  def wordLengthProfile(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        explode(filter(split(trim(col("text")), "\\s+"), t => t =!= "")).as("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("sum_len"),
        max(length(col("w")).cast("long")).as("max_len"))
      .withColumn("mean_len_milli", expr("(1000 * sum_len) div n_words"))
      .select(col("source"), col("n_words"), col("mean_len_milli"), col("max_len"))
      .orderBy(col("source"))

  /** C115 `stopword_profile` — per-source stopword exposure against the
    * Gopher gate's 8-word list: total hits, per-mille of tokens, and
    * the share of docs that would PASS the ≥2-hits rule. The
    * distribution behind gopher_rules' boolean — a source whose
    * stop_pm collapses is machine text even when each doc squeaks past
    * the binary gate. One token explode + integer aggregates.
    */
  def stopwordProfile(documents: DataFrame): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val perDoc = documents
      .select(col("doc_id"), col("source"),
        filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "").as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_stop", size(filter(col("toks"),
        t => t.isin(stops.map(lit(_)): _*))).cast("long"))
    perDoc
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_stop")).as("n_stop_hits"),
        sum(when(col("n_stop") >= 2, 1L).otherwise(0L)).as("n_docs_pass"))
      .withColumn("stop_pm", when(col("n_tokens") === 0, lit(null))
        .otherwise(expr("(1000 * n_stop_hits) div n_tokens")))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_stop_hits"), col("stop_pm"), col("n_docs_pass"))
      .orderBy(col("source"))
  }

  /** C119 `quality_length_matrix` — the filter-design heatmap: doc
    * counts per (quality decile, length bucket), with per-cell token
    * mass. A length-quality correlation means a naive quality cutoff
    * silently becomes a length cutoff — this is the 2-D view that
    * catches it before a threshold ships. Quality is the C9 kernel
    * score (oracle replays its exact arithmetic); buckets are integer
    * floors, counts integer.
    */
  def qualityLengthMatrix(documents: DataFrame): DataFrame =
    documents
      .withColumn("q", TextFns.qualityScore(col("text")))
      .withColumn("q_decile",
        least(floor(col("q") * 10).cast("long"), lit(9L)))
      .withColumn("len_bucket",
        least(expr("n_chars div 500"), lit(9L)).cast("long"))
      .groupBy(col("q_decile"), col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("q_decile"), col("len_bucket"))

  /** C120 `dup_text_mass` — duplicate CHARACTER mass per source: the
    * dataset_card's doc-level dup share re-weighted by bytes (one
    * giant boilerplate doc can dominate a corpus that looks clean by
    * doc count). Survivor = min doc_id per exact content hash, as in
    * dedup_exact; mass of everything else is the dup mass.
    */
  def dupTextMass(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("h"))
    documents
      .withColumn("h", md5(col("text")))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(when(!col("keep"), col("n_chars")).otherwise(0L)).as("dup_chars"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dup_docs"))
      .withColumn("dup_mass_pm", when(col("total_chars") === 0, lit(null))
        .otherwise(expr("(1000 * dup_chars) div total_chars")))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        col("total_chars"), col("dup_chars"), col("dup_mass_pm"))
      .orderBy(col("source"))
  }

  /** C125 `token_mass_concentration` — how much of the corpus's token
    * mass lives in its longest documents: exact P90/P99 doc-length
    * order statistics plus the token share above each — the packing/
    * truncation planning number (a corpus where 1% of docs carry 30%
    * of tokens packs and shuffles very differently from a flat one).
    * One integer aggregate over doc lengths; the cuts are exact order
    * statistics (no interpolation).
    */
  def tokenMassConcentration(documents: DataFrame): DataFrame = {
    // one row per DISTINCT length (format-bounded, never corpus-bounded
    // — the ks_drift shape), then cumulative windows over that small
    // table; the order statistics are exact lower order stats
    // (position (p·n) div 100, 1-based) read off the cumulative counts.
    val counts = documents
      .select(TextFns.wsTokenCount(col("text")).cast("long").as("n_toks"))
      .groupBy(col("n_toks")).agg(count(lit(1)).as("c"))
      .withColumn("mass", col("n_toks") * col("c"))
    val w = Window.orderBy(col("n_toks"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum_docs", sum(col("c")).over(w))
      .withColumn("cum_mass", sum(col("mass")).over(w))
    val tot = cum.agg(max(col("cum_docs")).as("n_docs"),
      max(col("cum_mass")).as("total_tokens"))
    val cuts = cum.crossJoin(broadcast(tot))
      .groupBy(col("n_docs"), col("total_tokens"))
      .agg(
        min(when(col("cum_docs") >= greatest(expr("(9 * n_docs) div 10"), lit(1L)),
          col("n_toks"))).as("p90_len"),
        min(when(col("cum_docs") >= greatest(expr("(99 * n_docs) div 100"), lit(1L)),
          col("n_toks"))).as("p99_len"))
    cum.crossJoin(broadcast(cuts))
      .groupBy(col("n_docs"), col("total_tokens"), col("p90_len"), col("p99_len"))
      .agg(
        max(when(col("n_toks") === col("p90_len"), col("cum_mass"))).as("cm90"),
        max(when(col("n_toks") === col("p99_len"), col("cum_mass"))).as("cm99"))
      .withColumn("mass_above_p90", col("total_tokens") - col("cm90"))
      .withColumn("mass_above_p99", col("total_tokens") - col("cm99"))
      .withColumn("share_p90_pm", when(col("total_tokens") === 0, lit(null))
        .otherwise(expr("(1000 * mass_above_p90) div total_tokens")))
      .withColumn("share_p99_pm", when(col("total_tokens") === 0, lit(null))
        .otherwise(expr("(1000 * mass_above_p99) div total_tokens")))
      .select(col("n_docs"), col("total_tokens"), col("p90_len"), col("p99_len"),
        col("mass_above_p90"), col("mass_above_p99"),
        col("share_p90_pm"), col("share_p99_pm"))
  }

  /** C117 `mixed_lang_docs` — per-source share of documents whose
    * tokens hit the marker lists of TWO OR MORE languages
    * ([[graft.expressions.TextStats.markers]] — the same lists lang_id
    * scores with): code-switching, boilerplate contamination, or a
    * crawler mixing locales all show here while per-doc argmax lang_id
    * still reports one confident language. One token pass, integer
    * counts.
    */
  def mixedLangDocs(documents: DataFrame): DataFrame = {
    val markers = graft.expressions.TextStats.markers
    val langs = graft.expressions.TextStats.langs
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    val nLangsHit = langs.map { l =>
      (size(filter(toks, t => t.isin(markers(l).toSeq.map(lit(_)): _*))) > 0).cast("int")
    }.reduce(_ + _)
    documents
      .withColumn("n_langs_hit", nLangsHit.cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_langs_hit") >= 2, 1L).otherwise(0L)).as("n_multilang"),
        sum(when(col("n_langs_hit") === 0, 1L).otherwise(0L)).as("n_unmarked"))
      .withColumn("multi_pm", expr("(1000 * n_multilang) div n_docs"))
      .select(col("source"), col("n_docs"), col("n_multilang"),
        col("n_unmarked"), col("multi_pm"))
      .orderBy(col("source"))
  }

  /** C118 `source_overlap_matrix` — pairwise top-K-vocabulary Jaccard
    * between sources (the source-pair face of [[vocabOverlap]]'s
    * parity-halves check): which crawls/dumps duplicate each other's
    * lexicon BEFORE any document-level dedup is paid. Top-K per source
    * by (count DESC, token ASC) — a deterministic total order — then a
    * K-bounded token join; sources² pairs × K tokens stays tiny at any
    * corpus scale because K caps the per-source set.
    */
  def sourceOverlapMatrix(documents: DataFrame, topK: Int = 100): DataFrame = {
    val byCnt = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("w").asc)
    // K-bounded by construction (≤ sources·K rows) and consumed by
    // THREE subtrees (both pair sides + the size aggregate): an eager
    // localCheckpoint makes each consumer a block read instead of
    // re-running the corpus word count per reference.
    val top = documents
      .select(col("source"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(byCnt))
      .filter(col("rn") <= topK)
      .select(col("source"), col("w"))
      .localCheckpoint(true)
    val sizes = top.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    top.as("a").join(top.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("source").as("source_a"), col("sz").as("sz_a")), Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("sz").as("sz_b")), Seq("source_b"))
      .withColumn("jaccard_pm",
        expr("(1000 * inter) div (sz_a + sz_b - inter)"))
      .select(col("source_a"), col("source_b"), col("inter"),
        col("sz_a"), col("sz_b"), col("jaccard_pm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** C116 `char_trigram_entropy` — per-source Shannon entropy of the
    * character-trigram multiset (the sub-word sibling of
    * [[bigramEntropy]]): natural language sits in a narrow band;
    * encrypted/base64 text pushes H up toward uniform, templatic text
    * collapses it. Same portable micro-integer entropy fold as the
    * token entropies (c·ln c rounded per TERM — irrational, so no half
    * boundary — then integer-summed, order-insensitive); trigrams are
    * the [[graft.expressions.Kernels]] shingle windowing (n = max(len
    * − 2, 1) windows, so short docs contribute their whole text).
    */
  def charTrigramEntropy(documents: DataFrame): DataFrame =
    documents
      .select(col("source"), col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - 2, lit(1)))).as("i"))
      .select(col("source"), expr("substring(text, i, 3)").as("g"))
      .groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
      .withColumn("t",
        round(col("c").cast("double") * log(col("c").cast("double")) * 1e6).cast("long"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_trigrams"), sum(col("t")).as("s"))
      .withColumn("h_tri", u6(log(col("n_trigrams").cast("double")) -
        (col("s").cast("double") / 1e6) / col("n_trigrams").cast("double")))
      .select(col("source"), col("n_trigrams"), col("h_tri"))
      .orderBy(col("source"))

  /** C128 `rare_token_docs` — per-document tail-rarity screen: the
    * fraction (‰) of a doc's DISTINCT tokens whose corpus document
    * frequency is ≤ `maxDf`. [[tokenDfQuality]] scores the MEAN df
    * (boilerplate detection); this counts the df≤2 TAIL — high
    * rare_pm flags OCR noise, codes/IDs, and genuinely novel
    * vocabulary for a human-review queue. Same two-stage scale shape:
    * one shuffle builds the vocabulary-sized DF table, one join
    * scores docs; all integer.
    */
  def rareTokenDocs(documents: DataFrame, maxDf: Long = 2L): DataFrame = {
    val docToks = documents
      .select(col("doc_id"),
        explode(array_distinct(
          filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= ""))).as("tok"))
    val df = docToks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    docToks
      .join(df, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_types"),
        sum(when(col("df") <= maxDf, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_pm", expr("(1000 * n_rare) div n_types"))
      .select(col("doc_id"), col("n_types"), col("n_rare"), col("rare_pm"))
      .orderBy(col("doc_id"))
  }

  /** C133 `token_budget_sample` — mixture sampling by TOKEN budget per
    * source (how pretraining mixes are actually specified — "N tokens
    * of web, M of code"), vs C39 [[mixtureSample]]'s doc-count shares:
    * each targeted source gets acceptance rate
    * `min(10⁶, target_tokens·10⁶ div source_tokens)` applied as the
    * same Knuth-hash doc_id threshold (deterministic membership —
    * reshards and re-runs keep identical samples); untargeted sources
    * drop; over-requested sources cap at keep-everything. Token
    * counts are the corpus whitespace convention (C125's). Output is
    * the per-source reconciliation: target vs available vs achieved.
    */
  def tokenBudgetSample(documents: DataFrame, targetTokens: Map[String, Long]): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = when(length(trim(col("text"))) === 0, lit(0L))
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val targets = targetTokens.toSeq.toDF("source", "target_tokens")
    val counted = documents.withColumn("n_toks", toks)
    val rates = counted
      .groupBy(col("source")).agg(sum(col("n_toks")).as("source_tokens"))
      .join(broadcast(targets), Seq("source"))
      // Widened quotient: target_tokens·10⁶ wraps a BIGINT beyond
      // ~9.2e12 target tokens — inside the 100 TB envelope this op is
      // documented for — and Spark wraps silently where DuckDB raises.
      // decimal(38,0) keeps it exact on both engines at any budget.
      .withColumn("rate_ppm",
        least(lit(1000000L),
          expr("(cast(target_tokens as decimal(38,0)) * 1000000) div source_tokens")))
    counted
      .join(broadcast(rates), Seq("source"))
      // Wrap-stable membership hash: (doc_id·K) mod 10⁶ ≡
      // ((doc_id mod 10⁶)·(K mod 10⁶)) mod 10⁶ exactly, and the reduced
      // product never exceeds ~4.4e11 — no silent Long wrap for any
      // doc_id (the raw product wraps at doc_id ≳ 3.5e9).
      .withColumn("bucket",
        pmod(pmod(col("doc_id"), lit(1000000L)) * lit(2654435761L % 1000000L),
          lit(1000000L)))
      .withColumn("kept", col("bucket") < col("rate_ppm"))
      .groupBy(col("source"))
      .agg(
        first(col("target_tokens")).as("target_tokens"),
        first(col("source_tokens")).as("source_tokens"),
        first(col("rate_ppm")).as("rate_ppm"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("kept"), col("n_toks")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** C136 `doc_chunks` — fixed-token chunking with overlap (the
    * RAG/packing primitive that SPLITS long documents where C18
    * doc_pack concatenates short ones): chunk k covers tokens
    * [k·stride, k·stride + chunkTokens), strides until the doc is
    * consumed, and each chunk carries its engine-portable content
    * hash (PortableStrHash of the space-joined tokens — the dedup
    * join key for chunk-level pipelines, C36). Map-side only: one
    * explode per doc, no shuffle beyond the presentation sort.
    */
  def docChunks(documents: DataFrame, chunkTokens: Int = 128,
                stride: Int = 96): DataFrame = {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    documents
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") >= 1)
      .select(col("doc_id"), col("toks"), col("n_toks"),
        explode(expr(s"sequence(CAST(0 AS BIGINT), (n_toks - 1) div $stride)")).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("n_tokens", least(lit(chunkTokens.toLong), col("n_toks") - col("start_tok")))
      .withColumn("chunk_hash", graft.expressions.Kernels.strHash(
        concat_ws(" ", slice(col("toks"),
          (col("start_tok") + 1).cast("int"), col("n_tokens").cast("int")))))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("n_tokens"), col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** C148 `cdc_chunks` — content-defined chunking at token
    * granularity: a token whose engine-portable hash ≡ 0 (mod
    * `divisor`) ENDS its chunk, so boundaries depend only on LOCAL
    * content — an insertion shifts one chunk, not every chunk after
    * it (the property that makes CDC the dedup-stable splitter, vs
    * C136 [[docChunks]]' fixed windows where one inserted token
    * re-hashes the whole tail). Expected chunk length = `divisor`
    * tokens. All-integer (PortableStrHash per token and per chunk —
    * exact DuckDB replay); one explode + one doc_id-keyed window, the
    * same scale shape as every line/token-level corpus op here.
    */
  def cdcChunks(documents: DataFrame, divisor: Int = 16): DataFrame = {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
      .withColumn("cut",
        when(pmod(graft.expressions.Kernels.strHash(col("tok")),
          lit(divisor.toLong)) === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", coalesce(sum(col("cut")).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"),
        min(col("pos")).cast("long").as("start_tok"),
        graft.expressions.Kernels.strHash(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s("tok")))).as("chunk_hash"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("n_tokens"), col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** C149 `cdc_dedup` — chunk-level duplication via [[cdcChunks]]'
    * content-defined boundaries: a chunk hash seen in MORE THAN ONE
    * document marks shared content, and each doc reports how much of
    * it is shared (boilerplate headers, licence blocks, quoted
    * passages — the sub-document duplication exact dedup can't see
    * and fixed windows mis-align on). This is WHY the chunker is
    * content-defined: an edited copy still shares every untouched
    * chunk verbatim. One chunk_hash-keyed shuffle over the chunk
    * table (integer counts), then a doc_id rollup — no pairs, no
    * joins, the 100 TB-safe shape.
    */
  def cdcDedup(documents: DataFrame, divisor: Int = 16): DataFrame = {
    val chunks = cdcChunks(documents, divisor)
      .select(col("doc_id"), col("chunk_hash"))
    val df = chunks.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    chunks
      .join(df, Seq("chunk_hash"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_pm", expr("(1000 * n_shared) div n_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_shared"), col("shared_pm"))
      .orderBy(col("doc_id"))
  }

  /** C129 `max_char_run` — longest single-character run per document
    * ([[graft.expressions.MaxCharRun]], one compiled pass — no char
    * explode, no islands shuffle) plus the spam flag at `spamRun`:
    * the cheapest template/garbage screen ("aaaaaa", "------",
    * padded whitespace) and a filter the Gopher-style rule set (C77)
    * doesn't carry. Map-only + presentation sort.
    */
  def maxCharRun(documents: DataFrame, spamRun: Int = 8): DataFrame =
    documents
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        graft.expressions.Kernels.maxCharRun(col("text")).cast("long").as("max_run"))
      .withColumn("spam_flag", col("max_run") >= spamRun)
      .orderBy(col("doc_id"))

  /** C138 `line_profile` — per-source LINE-shape profile: line counts,
    * blank-line share, mean and max line length. The layout screen
    * that separates prose (few blanks, long lines) from code,
    * tables and chat logs (dense short lines, rhythmic blanks) —
    * [[charClassProfile]] sees CHARACTERS, [[Dedup.lineDups]] sees
    * repeated CONTENT; this sees structure. All per-doc stats ride
    * array functions over one split (no per-line explode — a 100 TB
    * corpus would multiply its row count by ~40 through an exploded
    * shuffle); every aggregate is an integer sum, so the source rollup
    * is exact under any partitioning and only the final means float.
    */
  def lineProfile(documents: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    documents
      .select(col("source"),
        size(lines).cast("long").as("n_lines"),
        size(filter(lines, l => length(trim(l)) === 0)).cast("long").as("n_blank"),
        aggregate(transform(lines, l => length(l).cast("long")),
          lit(0L), (acc, x) => acc + x).as("sum_len"),
        array_max(transform(lines, l => length(l).cast("long"))).as("max_len"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_lines")).as("n_lines"),
        sum(col("n_blank")).as("n_blank"),
        sum(col("sum_len")).as("sum_len"),
        max(col("max_len")).as("max_line_len"))
      .withColumn("blank_pm", expr("(1000 * n_blank) div n_lines"))
      .withColumn("mean_line_len", u6(
        col("sum_len").cast("double") / col("n_lines").cast("double")))
      .select(col("source"), col("n_docs"), col("n_lines"), col("n_blank"),
        col("blank_pm"), col("mean_line_len"), col("max_line_len"))
      .orderBy(col("source"))
  }

  /** C140 `code_detect` — per-document code-vs-prose screen from three
    * cheap structural signals: code-punctuation density (`{};`),
    * indented-line share (4-space or tab starts), and camelCase
    * density — the routing signal a corpus build uses to send docs to
    * a code pipeline (or quarantine markup that would poison prose
    * stats). Integer per-mille densities (NULL on empty text), one
    * regex pass each over the map-only scan; the flag ORs the
    * thresholds under both engines' identical 3VL, coalesced to false.
    */
  def codeDetect(documents: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    documents
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(lines).cast("long").as("n_lines"),
        regexp_count(col("text"), lit("[{};]")).cast("long").as("n_punct"),
        size(filter(lines, l => l.rlike("^(    |\\t)"))).cast("long").as("n_indent"),
        regexp_count(col("text"), lit("[a-z][A-Z]")).cast("long").as("n_camel"))
      .withColumn("punct_pm", when(col("n_chars") === 0, lit(null))
        .otherwise(expr("(1000 * n_punct) div n_chars")))
      .withColumn("indent_pm", expr("(1000 * n_indent) div n_lines"))
      .withColumn("camel_pm", when(col("n_chars") === 0, lit(null))
        .otherwise(expr("(1000 * n_camel) div n_chars")))
      .withColumn("is_code", coalesce(
        col("punct_pm") >= 15 || col("indent_pm") >= 250 || col("camel_pm") >= 10,
        lit(false)))
      .select(col("doc_id"), col("n_chars"), col("n_lines"),
        col("punct_pm"), col("indent_pm"), col("camel_pm"), col("is_code"))
      .orderBy(col("doc_id"))
  }

  /** C139 `sentence_stats` — per-source SENTENCE-shape profile:
    * sentences per doc and words per sentence, under [[readability]]'s
    * exact conventions (sentences = [.!?]+ runs floored at 1, words =
    * whitespace tokens) — readability grades each DOC, this profiles
    * each SOURCE, the granularity a mixture designer compares crawl
    * slices at (a 40-words-per-sentence source is parser soup, a
    * 4-word one is chat). Integer per-doc counts → exact integer
    * rollup → two u6 ratios; map-only + one #sources-row shuffle.
    */
  def sentenceStats(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        TextFns.wsTokenCount(col("text")).cast("long").as("n_words"),
        greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"))
          .as("n_sentences"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_sentences")).as("n_sentences"))
      .withColumn("sentences_per_doc", u6(
        col("n_sentences").cast("double") / col("n_docs").cast("double")))
      .withColumn("words_per_sentence", u6(
        col("n_words").cast("double") / col("n_sentences").cast("double")))
      .select(col("source"), col("n_docs"), col("n_words"), col("n_sentences"),
        col("sentences_per_doc"), col("words_per_sentence"))
      .orderBy(col("source"))

  /** C141 `c4_rules` — the C4 (Raffel et al. 2020, arXiv:1910.10683)
    * line-level cleaning rules as a per-document report: a line is
    * KEPT when it has ≥3 whitespace tokens and ends in terminal
    * punctuation; the document-level flags are the "lorem ipsum"
    * placeholder screen and the curly-brace (code/markup) screen. The
    * keep verdict = kept-line share ≥ 500‰ and neither flag — the
    * C4-style gate a web-scrape corpus build runs before dedup (the
    * quality-rule sibling of [[gopherRules]], which screens token
    * shape where C4 screens line shape). Map-only scan; integer
    * per-mille densities; booleans compare integers (engine-stable).
    */
  def c4Rules(documents: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept = filter(lines, l =>
      size(split(trim(l), "\\s+")) >= 3 && trim(l).rlike("[.!?\"']$"))
    documents
      .select(col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        lower(col("text")).contains("lorem ipsum").as("has_lorem"),
        col("text").contains("{").as("has_brace"))
      .withColumn("kept_pm", expr("(1000 * n_kept) div n_lines"))
      .withColumn("keep",
        col("kept_pm") >= 500 && !col("has_lorem") && !col("has_brace"))
      .orderBy(col("doc_id"))
  }

  /** C142 `soft_dedup_weights` — SoftDeDup-style duplicate
    * downweighting: instead of DROPPING exact duplicates
    * ([[Dedup.exact]]'s keep-min-id), every copy survives with weight
    * 1/count so the group's total mass is one document — the
    * soft alternative when provenance must be preserved or near-dup
    * thresholds are untrusted. One shuffle on md5(text) (32-hex key,
    * never the document); the weight is an exact reciprocal of an
    * integer, u6-rounded. `eff_docs` sums to the deduped corpus size
    * by construction.
    */
  def softDedupWeights(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    documents
      .select(col("doc_id"), col("text"))
      .withColumn("dup_count", count(lit(1)).over(w))
      .select(col("doc_id"), col("dup_count"),
        u6(lit(1.0) / col("dup_count").cast("double")).as("weight"))
      .orderBy(col("doc_id"))
  }

  /** C143 `boilerplate_lines` — the corpus-level boilerplate table:
    * trimmed lines ≥ `minLen` chars appearing in ≥ `minDf` DISTINCT
    * documents, with their document frequency and total occurrence
    * count — what a cleaning pass subtracts (nav bars, cookie
    * banners, license headers). [[Dedup.lineDups]] scores documents;
    * this names the lines. Shuffle key is the line text bounded by
    * the explode (line-sized, not document-sized); output is the
    * df-filtered tail only.
    */
  def boilerplateLines(documents: DataFrame, minLen: Int = 10, minDf: Int = 3): DataFrame =
    documents
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("raw"))
      .select(col("doc_id"), trim(col("raw")).as("line"))
      .filter(length(col("line")) >= minLen)
      .groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDf)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("line"))

  /** C144 `first_line_dups` — header/footer boilerplate detection:
    * documents grouped by their FIRST and LAST trimmed line (the
    * positions where scrape templates concentrate); groups of ≥2
    * docs surface as `header`/`footer` rows with the group size and
    * min doc_id exemplar. Two #docs-row aggregations on short string
    * keys, unioned. The positional complement of
    * [[boilerplateLines]]' anywhere-in-doc df.
    */
  def firstLineDups(documents: DataFrame, minLen: Int = 10): DataFrame = {
    val lines = split(col("text"), "\n")
    def side(kind: String, pick: Column): DataFrame =
      documents
        .select(col("doc_id"), trim(pick).as("line"))
        .filter(length(col("line")) >= minLen)
        .groupBy(col("line"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
        .filter(col("n_docs") >= 2)
        .select(lit(kind).as("kind"), col("line"), col("n_docs"), col("min_doc_id"))
    side("header", element_at(lines, 1))
      .unionAll(side("footer", element_at(lines, -1)))
      .orderBy(col("kind"), col("n_docs").desc, col("line"))
  }

  /** C145 `numeric_density` — token-CLASS profile per document: the
    * share of whitespace tokens that are purely numeric
    * (digits/decimal groups, optional %) vs purely alphabetic —
    * tables, price lists and scraped spreadsheets score numeric-heavy
    * and get routed away from prose training mixes
    * ([[Pipeline.codeDetect]]'s sibling for tabular contamination;
    * char_class_profile counts characters, this counts tokens).
    * Map-only, anchored regexes per token, integer per-mille.
    */
  def numericDensity(documents: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    documents
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => t.rlike("^[0-9]+([.,][0-9]+)*%?$")))
          .cast("long").as("n_numeric"),
        size(filter(toks, t => t.rlike("^[A-Za-z]+$")))
          .cast("long").as("n_alpha"))
      .withColumn("numeric_pm", expr("(1000 * n_numeric) div n_tokens"))
      .withColumn("alpha_pm", expr("(1000 * n_alpha) div n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** C146 `paragraph_dups` — duplicated-paragraph share per document
    * at PARAGRAPH granularity (blank-line-separated blocks ≥ `minLen`
    * chars): a paragraph is boilerplate when it appears in ≥2 distinct
    * documents. The Dolma/CCNet dedup granularity between
    * [[Dedup.lineDups]]' lines and [[Dedup.exact]]'s whole docs —
    * catches quoted/syndicated blocks that line stats blur and
    * whole-doc hashing misses. Same left-join-back discipline as
    * lineDups: zero-qualifying-paragraph docs report n_paras = 0 with
    * a NULL share, not absence.
    */
  def paragraphDups(documents: DataFrame, minLen: Int = 30): DataFrame = {
    val paras = documents
      .select(col("doc_id"), explode(split(col("text"), "\n\n")).as("raw"))
      .select(col("doc_id"), trim(col("raw")).as("para"))
      .filter(length(col("para")) >= minLen)
    val df = paras.groupBy(col("para"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val perDoc = paras.join(df, Seq("para"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_paras"))
    documents.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_dup_paras"), lit(0L)).as("n_dup_paras"))
      .withColumn("dup_pm", when(col("n_paras") === 0, lit(null))
        .otherwise(expr("(1000 * n_dup_paras) div n_paras")))
      .orderBy(col("doc_id"))
  }

  /** C150 `keyness_terms` — chi-square keyness: the top-k terms most
    * DISTINCTIVE of each source against the rest of the corpus (the
    * corpus-linguistics contrast [[tfidfTopk]]'s within-doc weighting
    * can't see — a term can have middling tf-idf yet be the single
    * strongest source marker). 2×2 contingency per (source, token)
    * from exact integer counts; χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d))
    * computed in doubles with one fixed op order (int→double exact
    * below 2⁵³, both engines run the identical multiply chain), ties
    * broken by token so the top-k set is total. Three combinable
    * count aggregates + one broadcast of the corpus total — no
    * all-pairs anything, safe at any corpus size.
    */
  def keynessTerms(documents: DataFrame, k: Int = 10): DataFrame = {
    val toks = documents
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")).as("tok"))
    val st = toks.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("a"))
    val totTok = toks.groupBy(col("tok")).agg(sum(lit(1L)).as("tot_tok"))
    val totSrc = toks.groupBy(col("source")).agg(sum(lit(1L)).as("tot_src"))
    val totAll = toks.groupBy().agg(count(lit(1)).as("nn"))
    val rankW = Window.partitionBy(col("source"))
      .orderBy(col("chi2").desc, col("tok"))
    st.join(totTok, Seq("tok"))
      .join(broadcast(totSrc), Seq("source"))
      .crossJoin(broadcast(totAll))
      .withColumn("b", (col("tot_tok") - col("a")).cast("double"))
      .withColumn("c", (col("tot_src") - col("a")).cast("double"))
      .withColumn("d", (col("nn") - col("tot_tok") - col("tot_src") + col("a")).cast("double"))
      .withColumn("ad", col("a").cast("double"))
      .withColumn("diff", col("ad") * col("d") - col("b") * col("c"))
      .withColumn("den", (col("ad") + col("b")) * (col("c") + col("d")) *
        (col("ad") + col("c")) * (col("b") + col("d")))
      .withColumn("chi2", u6(col("nn").cast("double") * col("diff") * col("diff") /
        when(col("den") === 0, lit(null)).otherwise(col("den"))))
      .filter(col("chi2").isNotNull)
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank").cast("long").as("rank"), col("tok"),
        col("a").as("n_in_source"), col("chi2"))
      .orderBy(col("source"), col("rank"))
  }
}
