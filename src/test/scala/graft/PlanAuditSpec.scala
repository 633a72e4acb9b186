package graft

/** Plan-regression gate: every SparkEntry query is PLANNED (not run)
  * against sf0.001 and its physical plan checked for the scale
  * anti-patterns that would sink a 100 TB run — the automated face of
  * SURVEY §6's per-operator review loop.
  *
  * Rules:
  *   - no CartesianProduct, ever;
  *   - BroadcastNestedLoopJoin only where a tiny broadcast side is the
  *     DESIGN (query-set probes, block-tiled pair generation, bulk
  *     as-of's range join against a handful of query rows);
  *   - every plan must build (planning exceptions fail loudly here
  *     rather than at driver time).
  */
class PlanAuditSpec extends SparkSpec {

  // Queries whose plans legitimately contain a broadcast nested-loop
  // join: the broadcast side is a bounded query/probe set or the
  // deliberately tiny side of a tiled self-join, never corpus-sized.
  private val bnlWhitelist = Set(
    "ann_topk",         // corpus ⨝ broadcast(5 probe vectors)
    "ann_quantized",    // corpus ⨝ broadcast(5 probe code vectors)
    "tfidf_topk",       // scored terms ⨝ broadcast(1-row corpus count)
    "bm25_topk",        // posting join ⨝ broadcast(1-row corpus stats)
    "dedup_embedding")  // block-tiled all-pairs: broadcast block spine

  test("no query plan contains a cartesian product or unplanned BNL join") {
    val sfDir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnl = plan.contains("BroadcastNestedLoopJoin") && !bnlWhitelist(name)
      if (cartesian || bnl)
        Some(s"$name: ${if (cartesian) "CartesianProduct " else ""}${if (bnl) "BroadcastNestedLoopJoin" else ""}")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
