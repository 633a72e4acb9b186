package graft

import org.apache.spark.sql.SparkSession

/** End-to-end check of the `spark.sql.extensions` wiring in a fresh JVM
  * (sbt forks per runMain, so this exercises the real extension path a
  * user configures — injectFunction, injectPlannerStrategy,
  * injectOptimizerRule all live):
  *
  *   sbt "runMain graft.ExtensionsCheck"
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dot = spark.sql("SELECT vec_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0, s"vec_dot: $dot")
    val sig = spark.sql("SELECT minhash_sig('abcdefgh', 2, 8) AS s").collect()(0).getSeq[Long](0)
    assert(sig.length == 8, s"minhash_sig: $sig")
    spark.sql("SELECT simhash64('hello world') AS f").collect()

    // planner strategy injected: the native as-of join plans without
    // AsOfJoinNative having to self-register
    import spark.implicits._
    val l = Seq((1L, new java.sql.Timestamp(10000L), 1L, 1.0)).toDF("k", "ts", "seq", "value")
    val r = Seq((1L, new java.sql.Timestamp(5000L), 1L, 9.0)).toDF("k", "ts", "seq", "rvalue")
    val out = graft.plans.AsOfJoinNative(l, r, "k", "ts", "rvalue").collect()
    assert(out.length == 1 && out(0).getAs[Double]("asof_value") == 9.0)

    println("EXTENSIONS_OK")
    spark.stop()
  }
}
