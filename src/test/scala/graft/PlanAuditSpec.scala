package graft

/** Plan-level regression guard: every SparkEntry query is planned and
  * audited for scale anti-patterns, so a future edit that silently
  * degrades a plan (cartesian product, unpruned scan) fails CI — the
  * executable form of the PLANS.md cross-cutting claims.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // the intentional broadcast-small-side nested-loop shapes
  // (ANN query sets, IVF centroids, guarded pair baselines, scalar
  // thresholds, range-capped levenshtein, 5-row band dimension)
  private val bnlAllowed = Set(
    "ann_topk_brute", "ann_topk_ivf", "embedding_cosine_dup", "dup_components",
    "ngram_jaccard_pairs", "q14_above_avg", "q29_levenshtein", "q37_band_range_join")

  test("no query plans a CartesianProduct; nested-loop joins only where intended") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val unexpectedBnl =
        plan.contains("BroadcastNestedLoopJoin") && !bnlAllowed.contains(name)
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (unexpectedBnl) Some(s"$name: unexpected BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("fact-table scans prune columns (no SELECT * of lineitem)") {
    // lineitem has 11 columns; every query touching it must read fewer
    val wide = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val reads = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan)
        .filter(_ => plan.contains("lineitem.parquet"))
        .map(_.group(1).count(_ == ',') + 1)
        .toSeq
      if (reads.exists(_ >= 11)) Some(name) else None
    }
    assert(wide.isEmpty, s"queries scanning all lineitem columns: $wide")
  }
}
