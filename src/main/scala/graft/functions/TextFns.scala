package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-pipeline operators.
  * All are pure `org.apache.spark.sql.functions` compositions — codegen'd
  * whole-stage, no UDFs, no driver round-trips — so they run at scan
  * speed over 100 TB of documents.
  */
object TextFns {

  /** Whitespace token count; 0 for blank text. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alphanumeric marks — a cheap, deterministic proxy for subword
    * tokenizer cost used to budget training data.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** The one-pass scoring kernel ([[graft.expressions.TextStats]]):
    * len/punct/quality/lang in a single compiled pass; identical
    * instances in one projection are common-subexpression-eliminated.
    */
  def textStats(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.TextStats(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** Count of non-alphanumeric, non-whitespace characters.
    * (Round-1 form computed `len − len(punct_only)` — the ALNUM count —
    * inverting the quality score's punctuation penalty; fixed here and
    * in the oracles.)
    */
  def punctCount(text: Column): Column = textStats(text).getField("n_punct")

  private val stopwordsEn = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are")

  /** Fraction of whitespace tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(length(trim(text)) === 0, lit(0.0))
      .otherwise(size(array_intersect_dups(toks)) / size(toks).cast("double"))
  }

  /** Tokens that are in the EN stopword list (keeping duplicates —
    * `array_intersect` dedups, which would understate the ratio).
    */
  private def array_intersect_dups(toks: Column): Column =
    filter(toks, t => t.isin(stopwordsEn: _*))

  /** C9 quality score in [0,1]: blend of length saturation, low punct
    * density and healthy stopword ratio — the standard cheap heuristics
    * (Gopher/C4-style rules), computed by the [[textStats]] kernel.
    */
  def qualityScore(text: Column): Column = textStats(text).getField("quality")

  /** C11 normalized-content fingerprint: md5 of lowercased,
    * whitespace-collapsed text. Same normalization a near-dup pass uses
    * as its exact-match prefilter.
    */
  def normFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling polynomial hash of every k-gram (Rabin-Karp style), the
    * building block for winnowing fingerprints. Returns array<bigint>.
    * Expression-only (sequence+transform+aggregate): no UDF. Modular
    * (prime 1e9+7) so ANSI mode can't overflow: acc < 2^30, base < 2^20
    * → products stay far below 2^63.
    */
  def rollingHashes(text: Column, k: Int): Column = {
    val n = greatest(length(text) - (k - 1), lit(0))
    transform(
      sequence(lit(1), n),
      i =>
        aggregate(
          sequence(lit(0), lit(k - 1)),
          lit(0L),
          (acc, j) =>
            pmod(acc * lit(1000003L) + ascii(substring_col(text, i + j, 1)).cast("long"),
              lit(1000000007L))))
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD 2003): min rolling
    * hash per window of `w` consecutive k-gram hashes, deduplicated.
    * Compiled kernel ([[graft.expressions.WinnowFingerprints]]) — the
    * HOF composition over [[rollingHashes]] computes identical values
    * (spec-asserted) but interprets O(n·k) lambdas per document.
    */
  def winnowing(text: Column, k: Int, w: Int): Column =
    graft.expressions.Kernels.winnow(text, k, w)

  /** The HOF composition [[winnowing]] replaces — kept as the
    * executable reference the kernel parity spec folds against.
    */
  def winnowingHof(text: Column, k: Int, w: Int): Column = {
    val hs = rollingHashes(text, k)
    val nWin = greatest(size(hs) - (w - 1), lit(0))
    array_distinct(
      transform(
        sequence(lit(1), nWin),
        i => array_min(slice(hs, i, lit(w)))))
  }

  /** substring with Column args (functions.substring takes Int). */
  private def substring_col(str: Column, pos: Column, len: Column): Column =
    str.substr(pos, len)
  private def substring_col(str: Column, pos: Column, len: Int): Column =
    str.substr(pos, lit(len))

  /** C8 n-gram/stopword-marker language ID: score each language by
    * marker-token hits, pick argmax (ties broken by language code);
    * `und` when no marker of any language appears. Heuristic on
    * purpose — the scale story is that it's one compiled pass over the
    * scan ([[textStats]]), not a model inference round-trip.
    */
  def langId(text: Column): Column = textStats(text).getField("lang_guess")
}
