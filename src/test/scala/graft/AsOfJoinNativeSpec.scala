package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf
import graft.plans.AsOfJoinNative

/** The custom-operator as-of join must agree exactly with the
  * declarative union+window formulation — on a hand fixture and on the
  * real testdata (purchases enriched with latest prior view).
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(i * 1000L)

  test("native exec matches hand-computed strict as-of semantics") {
    val left = Seq((1L, ts(10), 100L, 50.0), (1L, ts(20), 101L, 60.0), (2L, ts(5), 102L, 70.0))
      .toDF("user_id", "ts", "seq", "value")
    val right = Seq((1L, ts(5), 1L, 1.5), (1L, ts(10), 2L, 2.5), (1L, ts(15), 3L, 3.5))
      .toDF("user_id", "ts", "seq", "rvalue")
    val out = AsOfJoinNative(left, right, "user_id", "ts", "rvalue")
      .orderBy("seq")
      .select("seq", "asof_value").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq((100L, Some(1.5)), (101L, Some(3.5)), (102L, None)))
  }

  test("equal-ts right revisions resolve to the max-seq one, deterministically") {
    val left = Seq((1L, ts(20), 100L, 0.0)).toDF("user_id", "ts", "seq", "value")
    // two revisions at the SAME ts: seq 2 must win regardless of input order
    val right = Seq((1L, ts(10), 2L, 9.9), (1L, ts(10), 1L, 1.1))
      .toDF("user_id", "ts", "seq", "rvalue")
    val out = AsOfJoinNative(left, right.repartition(3), "user_id", "ts", "rvalue")
      .select("asof_value").collect()(0).getDouble(0)
    assert(out === 9.9)
  }

  test("native exec agrees with the union+window operator on real data") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("seq"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("seq"), col("value").as("rvalue"))

    val declarative = AsOf.asOfJoin(purchases, views, "user_id", Seq("value"))
      .select("seq", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val native = AsOfJoinNative(purchases, views, "user_id", "ts", "rvalue")
      .select("seq", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(native.size === declarative.size)
    assert(native === declarative)
  }

  test("native inclusive mode agrees with the declarative inclusive join on real data") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("seq"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("seq"), col("value").as("rvalue"))
    val declarative = AsOf.asOfJoinInclusive(purchases, views, "user_id", Seq("value"))
      .select("seq", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val native = AsOfJoinNative(purchases, views, "user_id", "ts", "rvalue", inclusive = true)
      .select("seq", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(native === declarative)
  }

  test("native inclusive admits the equal-ts revision, strict does not") {
    val spark0 = spark
    import spark0.implicits._
    val left = Seq((1L, new java.sql.Timestamp(10000L), 100L, 1.0))
      .toDF("user_id", "ts", "seq", "value")
    val right = Seq(
      (1L, new java.sql.Timestamp(5000L), 200L, 1.5),
      (1L, new java.sql.Timestamp(10000L), 201L, 2.5),
      (1L, new java.sql.Timestamp(10000L), 202L, 3.5))
      .toDF("user_id", "ts", "seq", "rvalue")
    def run(inc: Boolean) =
      AsOfJoinNative(left, right, "user_id", "ts", "rvalue", inclusive = inc)
        .select("asof_value").collect()(0).getDouble(0)
    assert(run(false) === 1.5)  // strict: equal-ts rows invisible
    assert(run(true) === 3.5)   // inclusive: max-seq equal-ts revision wins
  }

  test("bucketed co-located tables feed the native as-of join with zero exchanges") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("seq"), col("value"))
      .withColumnRenamed("user_id", "asset_id")
      .withColumn("date", to_date(col("ts")))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("seq"), col("value").as("rvalue"))
      .withColumnRenamed("user_id", "asset_id")
      .withColumn("date", to_date(col("ts")))
    val base = java.nio.file.Files.createTempDirectory("buckets").toString
    spark.sql("DROP TABLE IF EXISTS t_purchases")
    spark.sql("DROP TABLE IF EXISTS t_views")
    graft.sources.TickStore.writeBucketedTable(purchases, "t_purchases", s"$base/p", buckets = 4)
    graft.sources.TickStore.writeBucketedTable(views, "t_views", s"$base/v", buckets = 4)

    val joined = AsOfJoinNative(
      spark.table("t_purchases"), spark.table("t_views"), "asset_id", "ts", "rvalue")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Exchange hashpartitioning"), plan) // co-located: no shuffle

    // results equal the unbucketed run
    val bucketed = joined.select("seq", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val unbucketed = AsOfJoinNative(purchases, views, "asset_id", "ts", "rvalue")
      .select("seq", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(bucketed === unbucketed)
  }

  test("join-key-sorted buckets elide the Sort as well: pure zipPartitions merge") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("asset_id"), col("ts"), col("event_id").as("seq"), col("value"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("asset_id"), col("ts"), col("event_id").as("seq"),
        col("value").as("rvalue"))
    val base = java.nio.file.Files.createTempDirectory("buckets_sorted").toString
    spark.sql("DROP TABLE IF EXISTS ts_purchases")
    spark.sql("DROP TABLE IF EXISTS ts_views")
    graft.sources.TickStore.writeBucketedTable(p, "ts_purchases", s"$base/p",
      buckets = 4, sortCols = Seq("asset_id", "ts", "seq"))
    graft.sources.TickStore.writeBucketedTable(v, "ts_views", s"$base/v",
      buckets = 4, sortCols = Seq("asset_id", "ts", "seq"))

    val joined = AsOfJoinNative(
      spark.table("ts_purchases"), spark.table("ts_views"), "asset_id", "ts", "rvalue")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // one file per bucket + sortBy on the join key: the scan reports
    // the ordering, EnsureRequirements inserts NO Sort — the exec is a
    // bare merge over the scans, the zero-overhead 100 TB shape.
    assert(!plan.contains("Sort ["), plan)
  }

  test("plan shows the custom exec with planner-provided exchange and sort") {
    val left = Seq((1L, ts(10), 1L, 1.0)).toDF("user_id", "ts", "seq", "value")
    val right = Seq((1L, ts(5), 1L, 9.0)).toDF("user_id", "ts", "seq", "rvalue")
    val plan = AsOfJoinNative(left, right, "user_id", "ts", "rvalue")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(plan.contains("Exchange hashpartitioning(user_id"))
    assert(plan.contains("Sort [user_id"))
  }
}
