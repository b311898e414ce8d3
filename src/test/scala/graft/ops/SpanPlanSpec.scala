package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural pin for the span family's scale claim (PLANS.md): the
  * gram explode — the expensive native pass — is computed and shuffled
  * ONCE; the self-join's second side reads a ReusedExchange of the
  * first side's gram shuffle rather than re-exploding.
  *
  * Finding (round 7, measured at sf0.1): the two "sides" of the
  * self-join were never two gram shuffles — AQE's ReuseExchange already
  * unifies them, so the only duplicated work is the sort+window above
  * the reused exchange. Lifting the reuse boundary above the window
  * with an explicit repartition(h) removes that duplication but adds a
  * shuffle of the blocked survivors, which measured ~45% slower on the
  * isolated sf0.1 medians — the current shape is the right one.
  */
class SpanPlanSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("span self-join reuses ONE gram-explode exchange (no double explode)") {
    val docs = (1L to 50L).map(i => (i, ("tok" + i + " ") * 30 +
      "shared repeated span body that is long enough to matter here "))
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "text", "doc_id")
    spans.collect() // materialize so the AQE final plan is decided
    val plan = spans.queryExecution.executedPlan.toString

    // exactly one materialized gram explode: the second occurrence of
    // the explode string must sit under the Initial Plan section only
    val finalPlan = plan.substring(0, plan.indexOf("== Initial Plan ==") match {
      case -1 => plan.length
      case i  => i
    })
    val explodes = "gram_position_hashes".r.findAllIn(finalPlan).size
    assert(explodes == 1,
      s"expected ONE materialized gram explode, saw $explodes:\n${finalPlan.take(4000)}")
    assert("ReusedExchange".r.findAllIn(finalPlan).nonEmpty,
      s"expected the self-join's second side to read a ReusedExchange:\n${finalPlan.take(4000)}")
  }
}
