package graft

import org.apache.spark.sql.SparkSession

/** One-call session factory for library users: Spark session with the
  * graft extensions (SQL functions, as-of join strategy, month-filter
  * derivation rule) injected and the operator-assumed tuning applied —
  * the "switch from findb" entry point.
  *
  * ```scala
  * val spark = GraftSession.create()                 // local dev
  * val spark = GraftSession.builder()                // cluster: finish
  *   .master("yarn").config(...).getOrCreate()       // the builder
  * ```
  */
object GraftSession {

  /** Builder preloaded with the extensions + sane defaults; callers add
    * master/cluster config and `getOrCreate()` (tuning still applies —
    * call [[GraftConf.tune]] after, or use [[create]]).
    */
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")

  /** Local-mode convenience: build + tune in one call. */
  def create(master: String = "local[*]", appName: String = "graft",
             shufflePartitions: Option[Int] = None): SparkSession = {
    val b = builder(appName).master(master)
    shufflePartitions.foreach(n => b.config("spark.sql.shuffle.partitions", n))
    GraftConf.tune(b.getOrCreate())
  }
}
