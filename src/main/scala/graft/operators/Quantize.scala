package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.Kernels

/** Int8 embedding quantization + quantized similarity search.
  *
  * The 100 TB memory-bound path for vector workloads: float32
  * embeddings at 64 dims cost 256 B/row; int8 codes cost 64 B/row — a
  * 4× cut in scan bytes, shuffle bytes and cache footprint, paid for
  * with bounded reconstruction error (≤ scale/254 per element,
  * measured by [[quantizeStats]]). Dot products become pure integer
  * arithmetic, which is also what makes the whole family EXACTLY
  * replayable by the DuckDB oracle — no rounding tolerance anywhere,
  * unlike the float-cosine queries that need `round(_, 3)`.
  *
  * Quantization is symmetric max-abs ([[graft.expressions.QuantizeInt8]]):
  * scale = max|xᵢ| (order-insensitive max → engine-portable), code
  * qᵢ = floor(xᵢ·127/scale + 0.5). Ranking quantized dot products is
  * maximum-inner-product search (MIPS) over the code space.
  */
object Quantize {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** (vec_id, qv: array<long>) — the at-rest code table. One compiled
    * pass per row, no shuffle; at scale this is written once and
    * every downstream search scans codes instead of floats.
    */
  def quantize(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      Kernels.quantizeInt8(toDouble(col("embedding"))).as("qv"))

  /** `ann_quantized` — brute-force top-k by quantized inner product
    * (MIPS over int8 codes). Same physical shape as the float
    * baseline `Similarity.cosineTopK` (tiny query side broadcast, one
    * corpus scan, no all-pairs), but each candidate costs a 64-long
    * integer dot against 4× fewer scan bytes. All-integer scores ⇒
    * rank ties break on vec_id deterministically and the oracle
    * matches hash-for-hash.
    */
  def quantizedTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = quantize(embeddings)
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("idot").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("idot", Kernels.dotLong(col("qqv"), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("idot"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** `embed_quantize` — per-vector quantization diagnostics, all
    * integer-valued outputs (micro-unit fixed point via
    * floor(x·10⁶ + 0.5), the half-boundary-proof recipe):
    *   scale_micro   — the max-abs scale
    *   qnorm         — Σ qᵢ² of the int8 codes
    *   max_err_micro — max |xᵢ − qᵢ·scale/127| reconstruction error
    * The HOF lambdas here run interpreted, which is fine: this is a
    * diagnostics query over the (small) code table, not the search
    * hot path — that one runs on [[graft.expressions.DotLong]].
    */
  def quantizeStats(embeddings: DataFrame): DataFrame = {
    val v = toDouble(col("embedding"))
    val scale = array_max(transform(v, x => abs(x)))
    val qd = transform(col("qv"), q => q.cast("double"))
    val err = array_max(zip_with(v, qd, (x, q) => abs(x - q * col("scale") / 127.0)))
    embeddings
      .select(col("vec_id"), col("embedding"),
        Kernels.quantizeInt8(v).as("qv"), scale.as("scale"))
      .select(col("vec_id"),
        floor(col("scale") * 1000000.0 + 0.5).as("scale_micro"),
        Kernels.dotLong(col("qv"), col("qv")).as("qnorm"),
        floor(err * 1000000.0 + 0.5).as("max_err_micro"))
      .orderBy(col("vec_id"))
  }

  /** C121 `quantization_error_by_dim` — per-DIMENSION int8
    * reconstruction error (embed_quantize's per-vector view, cut the
    * other way): a dimension whose error dwarfs the others is the one
    * that dominates every vector's scale (heavy-tailed dim) — the
    * signal that per-dim or per-block scaling would pay before a
    * corpus-wide code rollout. Per-term errors micro-round BEFORE the
    * integer sum, so the mean is order-insensitive.
    */
  def quantizationErrorByDim(embeddings: DataFrame): DataFrame = {
    val v = toDouble(col("embedding"))
    val scale = array_max(transform(v, x => abs(x)))
    embeddings
      .select(col("vec_id"), v.as("v"),
        Kernels.quantizeInt8(v).as("qv"), scale.as("scale"))
      .select(posexplode(zip_with(col("v"), col("qv"),
        (x, q) => floor(abs(x - q.cast("double") * col("scale") / 127.0) * 1e6 + 0.5))))
      .groupBy(col("pos").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("col").cast("long")).as("sum_err_micro"),
        max(col("col").cast("long")).as("max_err_micro"))
      .withColumn("mean_err_micro", expr("sum_err_micro div n_vecs"))
      .select(col("dim"), col("n_vecs"), col("mean_err_micro"), col("max_err_micro"))
      .orderBy(col("dim"))
  }
}
