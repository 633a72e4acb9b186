package graft

import org.apache.spark.sql.functions._

import graft.operators.RuntimeFilter

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (1L to 1000L).map(i => (i, i % 7))
    .toDF("k", "payload")
  private lazy val dim = Seq(3L, 300L, 999L, 5000L).toDF("dk")

  test("bloomSemiJoin equals the plain semi-join (fpp cannot leak rows)") {
    val got = RuntimeFilter.bloomSemiJoin(fact, "k", dim, "dk", fpp = 0.5)
      .select("k").as[Long].collect().sorted
    val want = fact.join(dim, $"k" === $"dk", "left_semi")
      .select("k").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq)
    assert(got.toSeq === Seq(3L, 300L, 999L))
  }

  test("bloom probe has no false negatives over the inserted key set") {
    val keys = (1L to 500L).map(i => i * 13).toDF("dk")
    val bytes = RuntimeFilter.bloomOf(keys, "dk", 500)
    val survivors = keys
      .filter(RuntimeFilter.mightContain(bytes, col("dk")))
      .count()
    assert(survivors === 500L)
  }

  test("bloom probe prunes most non-members at the declared fpp") {
    val bytes = RuntimeFilter.bloomOf(dim, "dk", 4, fpp = 0.01)
    val passed = fact
      .filter(RuntimeFilter.mightContain(bytes, col("k")))
      .count()
    // 3 true members; at 1% fpp the 997 non-members contribute ≈10
    // false positives — two orders of magnitude of pruning, and the
    // count is deterministic for a fixed key set + filter size.
    assert(passed >= 3L && passed <= 50L)
  }

  test("NULL fact keys never match (semi-join NULL semantics hold)") {
    val withNull = fact.select(
      when($"k" === 3L, lit(null).cast("long")).otherwise($"k").as("k"))
    val got = RuntimeFilter.bloomSemiJoin(withNull, "k", dim, "dk")
      .select("k").as[Long].collect().sorted
    assert(got.toSeq === Seq(300L, 999L))
  }
}
