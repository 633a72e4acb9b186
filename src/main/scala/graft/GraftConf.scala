package graft

import org.apache.spark.sql.SparkSession

/** Session-level tuning the graft operators are designed against.
  * Applied once at session setup (Bench/Verify/Explain/tests) so no
  * operator mutates the shared session conf as a hidden side effect.
  */
object GraftConf {
  def tune(spark: SparkSession): SparkSession = {
    // ObjectHashAggregate (collect_list/collect_set posting builds)
    // falls back to sort-based aggregation after 128 distinct keys per
    // task by default — pathological for inverted-index builds with
    // ~10⁴+ shingles per task. Memory stays bounded: posting keys are
    // short shingles, values df-capped id lists.
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
    spark
  }
}
