package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows on one hot key + a long tail
  private lazy val skewed = spark.range(10000)
    .select(
      when($"id" < 9000, lit("HOT")).otherwise(concat(lit("k"), $"id" % 50)).as("k"),
      $"id".as("uid"),
      ($"id" % 7).cast("double").as("v"))

  test("salted aggregation matches the unsalted result exactly") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n_rows"),
        sum($"v".cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(skewed, Seq("k"), "uid", "v", buckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
  }

  test("salt is deterministic and bounded") {
    val salts = skewed.select(Skew.salt($"uid", 16)).distinct()
      .collect().map(_.getInt(0)).sorted
    assert(salts.head >= 0 && salts.last < 16)
    val again = skewed.select(Skew.salt($"uid", 16)).collect().map(_.getInt(0))
    val first = skewed.select(Skew.salt($"uid", 16)).collect().map(_.getInt(0))
    assert(again.toSeq === first.toSeq)
  }

  test("salted join matches the plain join result") {
    val build = Seq(("HOT", 1.0), ("k1", 2.0), ("k2", 3.0)).toDF("k", "w")
    val plain = skewed.join(build, "k").agg(
      count(lit(1)), sum($"v" * $"w").cast("long")).collect()(0)
    val salted = Skew.saltedJoin(skewed, build, "k", "uid", buckets = 4).agg(
      count(lit(1)), sum($"v" * $"w").cast("long")).collect()(0)
    assert(salted.getLong(0) === plain.getLong(0))
    assert(salted.getLong(1) === plain.getLong(1))
  }
}
