package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}

/** Explicit bloom-filter runtime join pruning — the 100 TB fact-table
  * pattern Spark's own `InjectRuntimeFilter` applies only when its
  * stats thresholds line up: build a bloom filter over the (already
  * filtered) dimension keys, prune the fact table with a codegen'd
  * membership probe BEFORE its shuffle, then run the exact semi-join on
  * the survivors. The bloom pass is what makes a selective dim filter
  * reach the fact scan: at 100 TB the fact side must never shuffle rows
  * a 1%-selective dimension predicate was always going to discard —
  * the probe cuts shuffle volume ≈(1 − selectivity) at the cost of one
  * map-side hash per row, and false positives (≤ fpp) are removed by
  * the semi-join so results are EXACT.
  *
  * The filter itself is a bounded driver artifact (like the IVF
  * centroids): `n` keys at 1% fpp ≈ 1.2 MB per million keys,
  * independent of fact size. It rides into executors as a plan literal
  * feeding Spark's own `BloomFilterMightContain` predicate (codegen'd,
  * null-safe: NULL keys probe to NULL and are filtered — matching semi
  * -join semantics, which never match NULL).
  *
  * Reference capability analog: the reference prunes its scan with
  * B-tree page bounds (reference: src/btree/file.rs:425 `query` walks
  * only pages overlapping the key range); on Spark the same "touch only
  * what can match" idea at join time is a runtime filter.
  */
object RuntimeFilter {

  /** Codegen'd membership probe of `key` (LongType) against a
    * serialized bloom filter (`spark.util.sketch.BloomFilter` bytes —
    * the format [[bloomOf]] writes and Spark's expression reads).
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    CB.column(BloomFilterMightContain(Literal(bloomBytes), CB.expression(key)))

  /** One pass over `dim` → serialized bloom of `dim(key)`. Long keys
    * are inserted raw (`putLong`), matching the probe side exactly.
    */
  def bloomOf(dim: DataFrame, key: String, expectedDistinct: Long,
              fpp: Double = 0.01): Array[Byte] = {
    val bf = dim.stat.bloomFilter(key, math.max(expectedDistinct, 1L), fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Exact semi-join of `fact` to `dim`, bloom-prefiltered. Sizes the
    * filter with an exact count of the dim side (one cheap action over
    * the small side — the side that is small is the premise of the
    * pattern; for a dim too big to count-and-bloom, use the plain
    * semi-join, the prune has no leverage there anyway).
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey))
    val bytes = bloomOf(keys, dimKey, keys.count(), fpp)
    fact
      .filter(mightContain(bytes, col(factKey)))
      .join(keys, col(factKey) === col(dimKey), "left_semi")
  }
}
