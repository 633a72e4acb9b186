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
    // Bucketed scans report their sortBy ordering only behind this flag
    // (off by default since 3.1 because the one-file-per-bucket check
    // costs a listing). TickStore.writeBucketedTable GUARANTEES one
    // file per bucket (repartition by the bucket hash before write), so
    // the check always passes and consumers whose required ordering
    // matches the sortBy — the native as-of merge above all — elide
    // their Sort entirely, not just their Exchange.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    // Some testdata generations write events.ts as parquet
    // TIMESTAMP(NANOS), which the vectorized reader rejects at schema
    // inference. With this conf a nanos column surfaces as LongType
    // (Tables.events then truncates to µs); it is a no-op for the
    // µs-TIMESTAMP_NTZ generation. Set here, not in the reader, so
    // Tables.* stay side-effect-free on session conf.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
