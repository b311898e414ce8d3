package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[PushdownBarrier]] is a planning fence, not a semantics change:
  * values pass through identically (interpreted and codegen'd), the
  * nondeterministic flag is the only observable planning difference,
  * and it actually stops predicate pushdown from substituting the
  * fenced child into a Filter condition.
  */
class BarrierExprsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("identity semantics: fenced column values equal the bare ones") {
    val df = Seq("alpha beta", "", "x").toDF("t")
    val bare = df.select(length(col("t")).as("n")).as[Int].collect().toSeq
    val fenced = df.select(
      column(PushdownBarrier(expression(length(col("t"))))).as("n"))
      .as[Int].collect().toSeq
    assert(fenced == bare)
  }

  test("nulls pass through") {
    val df = Seq(Some("ab"), None).toDF("t")
    val got = df.select(
      column(PushdownBarrier(expression(length(col("t"))))).as("n"))
      .as[Option[Int]].collect().toSet
    assert(got == Set(Some(2), None))
  }

  test("a filter on a column derived from the fence stays above its projection") {
    // parquet source — a LocalRelation would be constant-folded whole
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val metric = df.select(col("doc_id"),
      column(PushdownBarrier(expression(length(col("text"))))).as("m"))
    val q = metric.where(col("m") > 10).select(col("doc_id"))
    val opt = q.queryExecution.optimizedPlan.toString
    // without the fence, pushdown rewrites the Filter condition to
    // length(text) > 10 below the projection; with it, the condition
    // must keep referencing the projected attribute (the `length(`
    // call stays in the Project line, never in the Filter line)
    val filterLine = opt.split("\n")
      .find(_.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':')
        .startsWith("Filter"))
      .getOrElse(fail(s"no Filter node in:\n$opt"))
    assert(!filterLine.contains("length("),
      s"fenced child leaked into the filter condition:\n$filterLine")
    val bare = df.where(length(col("text")) > 10).count()
    assert(q.count() == bare)
  }

  test("narrowed fence: a pass-through id filter above a fenced projection reaches the scan") {
    // round 12 shipped the barrier with a PROJECT-WIDE fence (no filter
    // pushed below a fenced projection, measured and pinned here);
    // round 13's PushThroughBarrierProjects rule narrows it to
    // alias-level — this pins the recovered pruning
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val metric = df.select(col("doc_id"),
      column(PushdownBarrier(expression(length(col("text"))))).as("m"))
    val q = metric.where(col("doc_id") > 100L)
    val physical = { q.collect(); q.queryExecution.executedPlan.toString }
    assert(physical.contains("GreaterThan(doc_id,100)"),
      s"id filter must reach the scan's PushedFilters through the fence:\n${physical.take(1500)}")
    assert(q.count() == df.where(col("doc_id") > 100L).count())
  }

  test("narrowed fence: a mixed conjunction splits — id conjunct to the scan, fenced conjunct stays above") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val metric = df.select(col("doc_id"),
      column(PushdownBarrier(expression(length(col("text"))))).as("m"))
    val q = metric.where(col("doc_id") > 100L && col("m") > 10)
    val physical = { q.collect(); q.queryExecution.executedPlan.toString }
    assert(physical.contains("GreaterThan(doc_id,100)"),
      s"id conjunct must reach the scan:\n${physical.take(1500)}")
    // the fenced conjunct must NOT be rewritten to length(text) in any
    // Filter — the barrier child stays out of every filter condition
    val filterLines = physical.split("\n").filter(_.contains("Filter"))
    assert(filterLines.nonEmpty && filterLines.forall(!_.contains("length(")),
      s"fenced child leaked into a filter:\n${filterLines.mkString("\n")}")
    assert(q.count() ==
      df.where(col("doc_id") > 100L && length(col("text")) > 10).count())
  }

  test("narrowed fence: a genuinely non-deterministic sibling conjunct blocks the split") {
    // rand()'s state advances per evaluated row, so pushing the id
    // conjunct below the projection would change the row stream the
    // sampling predicate sees and silently alter a fixed-seed sample;
    // the rule must leave the whole filter untouched (matching what
    // stock PushDownPredicates would have done without the barrier)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val metric = df.select(col("doc_id"),
      column(PushdownBarrier(expression(length(col("text"))))).as("m"))
    val q = metric.where(col("doc_id") > 100L && rand(42) < 0.5)
    val physical = { q.collect(); q.queryExecution.executedPlan.toString }
    assert(!physical.contains("GreaterThan(doc_id,100)"),
      "id conjunct must NOT be pushed past a rand() sibling:\n" +
        physical.take(1500))
    // fixed-seed reproducibility: same sample as the unoptimized shape
    assert(q.count() ==
      df.select(col("doc_id"), length(col("text")).as("m"))
        .where(col("doc_id") > 100L && rand(42) < 0.5).count())
  }

  test("wrapping a (resolved) nondeterministic child is refused") {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Rand}
    intercept[IllegalArgumentException] {
      PushdownBarrier(Rand(Literal(42L)))
    }
  }
}
