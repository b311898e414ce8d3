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

  test("documented cost: NO filter pushes below a fenced projection (the guard is project-wide)") {
    // this is why callers must apply source filters BEFORE the metric
    // producer — pinned so a Spark upgrade changing the behavior is
    // noticed (it would let the docs promise more)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val metric = df.select(col("doc_id"),
      column(PushdownBarrier(expression(length(col("text"))))).as("m"))
    val q = metric.where(col("doc_id") > 100L)
    val physical = { q.collect(); q.queryExecution.executedPlan.toString }
    assert(!physical.contains("PushedFilters: [IsNotNull(doc_id)"),
      s"expected the id filter to stay above the fence:\n${physical.take(1500)}")
    // ...whereas filtering BEFORE the producer reaches the scan as usual
    val pre = df.where(col("doc_id") > 100L).select(col("doc_id"),
      column(PushdownBarrier(expression(length(col("text"))))).as("m"))
    val prePhysical = { pre.collect(); pre.queryExecution.executedPlan.toString }
    assert(prePhysical.contains("GreaterThan(doc_id,100)"),
      s"pre-filter must reach the scan:\n${prePhysical.take(1500)}")
  }

  test("wrapping a (resolved) nondeterministic child is refused") {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Rand}
    intercept[IllegalArgumentException] {
      PushdownBarrier(Rand(Literal(42L)))
    }
  }
}
