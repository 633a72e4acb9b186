package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Contract test for the events-ts schema probe (r5 postmortem: the
  * testdata generator switched events.ts from raw int64 nanos to µs
  * TIMESTAMP_NTZ between rounds and a hardcoded reader broke 98 driver
  * queries). `Tables.events` must yield IDENTICAL TimestampType rows from
  * every physical schema the harness has ever shipped:
  *   1. int64 nanos read as LongType via the legacy nanosAsLong conf
  *      (GraftConf.tune sets it; writing a plain long column produces the
  *      same LongType input the legacy path sees);
  *   2. µs TIMESTAMP_NTZ (current generation);
  *   3. µs TIMESTAMP with timezone (what Spark itself writes by default —
  *      covers replica dirs written by ScaleProbe).
  */
class TablesSchemaSpec extends SparkSpec {
  private def tmp(suffix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-schema-$suffix")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("Tables.events yields identical rows for nanos-long, NTZ(us), and TZ(us) schemas") {
    val s = spark
    import s.implicits._
    // micros chosen non-round so nanos truncation (div 1000) is exercised
    val micros = Seq(1700000000123456L, 1700000086654321L, 1712345678999999L)
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, (i % 2).toLong, us, i * 1.5)
    }.toDF("event_id", "user_id", "us", "value")

    // 1. legacy generation: ts as raw int64 nanos → LongType on read
    val nanosDir = tmp("nanos")
    base.select(col("event_id"), col("user_id"),
        (col("us") * 1000L + 789L).as("ts"), col("value"))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    // 2. current generation: µs TIMESTAMP_NTZ
    val ntzDir = tmp("ntz")
    base.select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"), col("value"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    // 3. plain Spark-written µs TIMESTAMP (ScaleProbe replica dirs)
    val tzDir = tmp("tz")
    base.select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("value"))
      .write.mode("overwrite").parquet(s"$tzDir/events.parquet")

    def load(dir: String): (DataType, Seq[Row]) = {
      val df = Tables.events(spark, dir)
      (df.schema("ts").dataType,
        df.select("event_id", "user_id", "ts", "value")
          .orderBy("event_id").collect().toSeq)
    }
    val (dtNanos, rowsNanos) = load(nanosDir)
    val (dtNtz, rowsNtz) = load(ntzDir)
    val (dtTz, rowsTz) = load(tzDir)

    assert(dtNanos === TimestampType)
    assert(dtNtz === TimestampType)
    assert(dtTz === TimestampType)
    assert(rowsNanos === rowsNtz)
    assert(rowsNtz === rowsTz)
    // and the values are the expected micros (UTC session)
    val got = rowsNtz.map(_.getAs[java.sql.Timestamp]("ts").getTime)
    // Timestamp.getTime is millis; compare micros via the collected row
    val gotMicros = rowsNtz.map { r =>
      val t = r.getAs[java.sql.Timestamp]("ts")
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    }
    assert(gotMicros === micros)
    assert(got.nonEmpty)
  }
}
