package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-deterministic decimal rounding.
  *
  * `round(x, 6)` on a double is NOT engine-portable even when both
  * engines hold the identical double: Spark's `Round` converts via the
  * shortest decimal representation (`BigDecimal.decimal`, HALF_UP) while
  * DuckDB rounds the exact binary value, so inputs whose shortest repr
  * and binary value straddle a half boundary (…4165 → "…41650") round to
  * different sides per engine. The r6 driver oracle caught exactly this
  * on `williams_r`.
  *
  * `floor(x·10ˢ + 0.5)/10ˢ` is a fixed IEEE-754 op sequence — multiply,
  * add, floor, divide — that both engines execute identically, so it can
  * never flap. Every final float output at decimal scale 6/4 uses these
  * helpers on the Spark side and the literal `floor((x) * 10^s + 0.5) /
  * 10^s` expansion in the DuckDB oracle SQL (see scripts/migrate_u6.py
  * for the one-shot migration that enforced this repo-wide).
  *
  * Semantics vs `round(_, s)`: halves round toward +∞ instead of away
  * from zero — a deliberate, engine-portable convention applied on BOTH
  * sides of every oracle pair. Magnitude bound: |x| must stay below
  * 2⁵³/10ˢ (≈9.0e9 at scale 6) for the multiply to be exact-ish; every
  * migrated output (prices, returns, ratios, indicator values) is far
  * below that.
  */
object Micro {
  /** Micro-unit (1e-6) engine-portable rounding for final outputs. */
  def u6(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Scale-4 variant (TPC-H q1's avg_qty / covar_qp contract). */
  def u4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** Scale-3 variant: the cosine-similarity family's contract. */
  def u3(c: Column): Column = floor(c * lit(1000.0) + lit(0.5)) / lit(1000.0)

  /** Arbitrary-scale form for the one dynamic-scale caller ([[Similarity.cosine]]). */
  def uN(c: Column, scale: Int): Column = {
    val m = lit(math.pow(10.0, scale))
    floor(c * m + lit(0.5)) / m
  }

  /** JVM-side twin of [[u6]] for imperative kernels (streaming state
    * folds, tiled similarity loops, compiled text-stats): the same IEEE
    * multiply/add/floor/divide sequence, so imperative outputs stay
    * bit-identical to the declarative path AND the DuckDB oracle.
    */
  def jvm6(x: Double): Double = math.floor(x * 1000000.0 + 0.5) / 1000000.0

  /** JVM-side twin of [[u3]] (cosine kernels). */
  def jvm3(x: Double): Double = math.floor(x * 1000.0 + 0.5) / 1000.0

  /** Scale-12 JVM rounding for variance-scale recursions (GARCH σ²
    * lives near 1e-4 — the u6 grid would destroy it; x·1e12 stays
    * ≪ 2⁵³ for every |x| < 9e3, far above any variance this filter
    * sees).
    */
  def jvm12(x: Double): Double = math.floor(x * 1.0e12 + 0.5) / 1.0e12

  /** JVM-side twin of [[u4]] (the RSI stream twin's contract). */
  def jvm4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
}
