package graft

import graft.operators.Learning
import org.apache.spark.sql.functions._

/** Plan-shape regression pins for the round-12 rewrites — the shapes
  * that made q140 and the streaming drains scale-correct are easy to
  * lose to a well-meaning refactor (a window re-appearing in the
  * argmax, a literal-prior grid re-materializing per corpus), and
  * nothing else in the suite would notice: the RESULTS stay identical,
  * only the 100 TB cost model breaks. Same pattern as the IVF
  * assignment pin in ClusteringSpanSpec.
  */
class PlanPinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("naive-bayes closed-model scoring: one real shuffle + K² confusion agg, no window") {
    val conf = Learning.naiveBayesConfusion(
      Tables.documents(spark, sf), "doc_id", "text", "source")
    val plan = conf.queryExecution.executedPlan.toString
    // the PLANS.md §16 shape: per-doc K-sum aggregate (THE shuffle)
    // feeding the K²-sized (cls, pred) count — exactly two hash
    // exchanges, nothing corpus-sized beyond the first
    val nHashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nHashEx == 2,
      s"scoring plan must hold exactly 2 hash exchanges (per-doc sums + K² confusion), got $nHashEx:\n$plan")
    // the round-8 lesson, re-learned in round 12: a row_number/window
    // argmax costs a per-partition sort of the whole scored corpus —
    // the in-row array_min argmax must stay
    assert(!plan.contains("Window"),
      s"scoring plan re-introduced a window argmax:\n$plan")
    // the model rides a broadcast token → K-vector row, not a
    // distributed grid join, on the closed-model path
    assert(plan.contains("BroadcastExchange"),
      s"expected the token → K-vector logprob broadcast:\n$plan")
    // and the frame is still correct (diagonal-dominant is not
    // asserted — only that the pin didn't test a degenerate frame)
    assert(conf.agg(sum("n")).head().getLong(0) > 0)
  }

  test("naive-bayes scoring plan carries no data-dependent literals (codegen-cache contract)") {
    // the marker row's "log-likelihood vector" IS the prior vector —
    // no per-class double literal may appear in the plan, or the
    // generated code recompiles on every corpus switch
    val conf = Learning.naiveBayesConfusion(
      Tables.documents(spark, sf), "doc_id", "text", "source")
    val plan = conf.queryExecution.executedPlan.toString
    // a literal prior would print as a raw negative double in the
    // aggregate expressions (log of a <1 ratio); assert none appears
    // in an aggregate/project line
    val litDouble = """-\d+\.\d{4,}""".r
    val offending = plan.linesIterator
      .filter(l => l.contains("HashAggregate") || l.contains("Project"))
      .filter(l => litDouble.findFirstIn(l).isDefined)
      .toSeq
    assert(offending.isEmpty,
      s"data-dependent double literals leaked into the scoring plan:\n${offending.mkString("\n")}")
  }
}
