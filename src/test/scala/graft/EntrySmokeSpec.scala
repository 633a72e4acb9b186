package graft

/** Driver-shaped smoke: `entry` and every `queries` entry must run at
  * sf0.001 with rows (or legitimately-empty pair sets), and every
  * oracleSql key must have a matching query — wiring regressions fail
  * here before the driver sees them.
  */
class EntrySmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // candidate-pair queries may legitimately be empty at tiny SF
  private val mayBeEmpty = Set("dedup_minhash", "dedup_simhash", "ngram_jaccard",
    "dedup_embedding",
    // corpus line-df tables: sf0.001's 60 docs share no repeated lines
    "boilerplate_lines", "first_line_dups")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sfDir).count()
    }
    val unexpectedlyEmpty = counts.collect {
      case (n, 0L) if !mayBeEmpty(n) => n
    }
    assert(unexpectedlyEmpty.isEmpty, s"empty results: $unexpectedlyEmpty")
  }

  test("oracleSql keys all have matching queries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }
}
