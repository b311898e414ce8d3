package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural pin for the span family's scale claim (PLANS.md): the
  * gram explode — the expensive native pass — is computed and shuffled
  * ONCE, and candidate pairs come from posting-list expansion, not a
  * self-join.
  *
  * History: rounds ≤10 used an h-keyed self-join whose two sides AQE
  * collapsed onto one ReusedExchange, but each side still paid its own
  * sort+window pass and the SortMergeJoin merged them (measured
  * 14.66×/decade at 10× interleaved — the repo's worst exponent).
  * Round 11 replaced the join with groupBy(h).collect_list + double
  * explode: the aggregation rides the window's existing hash exchange
  * (no new shuffle — EnsureRequirements sees the partitioning
  * satisfied) and the pair expansion is in-row, bounded by
  * maxGramFreq² per gram. This spec pins all three properties.
  */
class SpanPlanSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("span candidates come from ONE gram pass: no self-join, no extra exchange") {
    val docs = (1L to 50L).map(i => (i, ("tok" + i + " ") * 30 +
      "shared repeated span body that is long enough to matter here "))
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "text", "doc_id")
    spans.collect() // materialize so the AQE final plan is decided
    val plan = spans.queryExecution.executedPlan.toString

    val finalPlan = plan.substring(0, plan.indexOf("== Initial Plan ==") match {
      case -1 => plan.length
      case i  => i
    })
    val explodes = "gram_position_hashes".r.findAllIn(finalPlan).size
    assert(explodes == 1,
      s"expected ONE materialized gram explode, saw $explodes:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("SortMergeJoin") && !finalPlan.contains("ShuffledHashJoin"),
      s"expected posting-list expansion, found a join:\n${finalPlan.take(4000)}")
    // exactly two hash exchanges end-to-end: the gram shuffle on h and
    // the island window's shuffle on (id_a, id_b, d) — the posting-list
    // aggregation must NOT introduce a third
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(exchanges == 2,
      s"expected 2 hash exchanges (gram h + island window), saw $exchanges:\n${finalPlan.take(4000)}")
    // the frequency cutoff lives inside bounded_posting_list — there
    // must be no count-over-window on h (only the island-merge window)
    assert(finalPlan.contains("bounded_posting_list"),
      s"expected the bounded posting-list aggregate:\n${finalPlan.take(4000)}")
    val windows = "Window ".r.findAllIn(finalPlan).size
    assert(windows == 1,
      s"expected ONE window (island merge), saw $windows:\n${finalPlan.take(4000)}")
  }
}
