package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[BoundedPostingList]] must implement EXACTLY the semantics of the
  * count-over-window + collect_list pair it replaced in
  * [[graft.ops.Dedup.repeatedSpans]]: groups with minSize..cap entries
  * keep every posting; groups outside that band vanish (NULL — banding
  * lives in eval so out-of-band groups, the overwhelming majority on a
  * real corpus, allocate nothing). The overflow marker must survive
  * partial/final merges and serialization, or a 100-TB run would
  * resurrect boilerplate grams the cutoff exists to drop.
  */
class PostingExprsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def agg(cap: Int) = column(BoundedPostingList(
    expression(struct(col("id"), col("pos"))), cap).toAggregateExpression())

  test("bounded_posting_list matches window-count + collect_list on every group band") {
    // h=1: single entry (below band), h=2: exactly 2, h=3: exactly cap,
    // h=4: cap+1 (overflow), h=5: far over cap — across many partitions
    // so merge() paths run
    val cap = 5
    val rows = Seq.tabulate(1)(i => (1L, 100L + i, 10 + i)) ++
      Seq.tabulate(2)(i => (2L, 200L + i, 20 + i)) ++
      Seq.tabulate(5)(i => (3L, 300L + i, 30 + i)) ++
      Seq.tabulate(6)(i => (4L, 400L + i, 40 + i)) ++
      Seq.tabulate(40)(i => (5L, 500L + i, 50 + i))
    val df = rows.toDF("h", "id", "pos").repartition(7)

    val got = df.groupBy("h").agg(agg(cap).as("ps"))
      .where(col("ps").isNotNull)
      .select(col("h"), explode(col("ps")).as("p"))
      .select(col("h"), col("p.id").as("id"), col("p.pos").as("pos"))
      .as[(Long, Long, Int)].collect().toSet

    val wH = Window.partitionBy("h")
    val want = df.withColumn("cnt", count(lit(1)).over(wH))
      .where(col("cnt") >= 2 && col("cnt") <= cap)
      .select(col("h"), col("id"), col("pos"))
      .as[(Long, Long, Int)].collect().toSet

    assert(got == want)
    assert(want.map(_._1) == Set(2L, 3L)) // the fixture exercises both drops
  }

  test("null id/pos postings are skipped, not stored as doc 0 / pos 0") {
    // a null id used to unbox to 0L and pair as a phantom doc 0
    // (round-11 advice); the aggregate must drop the posting, keeping
    // the group's OTHER postings and its count semantics intact
    val df = Seq(
      (1L, Some(10L), Some(1)), (1L, None, Some(2)), (1L, Some(11L), None),
      (1L, Some(12L), Some(3)),
      (2L, None, Some(9))).toDF("h", "id", "pos").repartition(3)
    val got = df.groupBy("h").agg(agg(5).as("ps"))
      .where(col("ps").isNotNull)
      .select(col("h"), explode(col("ps")).as("p"))
      .select(col("h"), col("p.id"), col("p.pos"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 10L, 1), (1L, 12L, 3)))
  }

  test("overflow survives merge: two half-full partials that together exceed cap drop the group") {
    val cap = 4
    // 6 entries for one h, split so no single partition exceeds cap on
    // its own — only the merge can detect the overflow
    val df = Seq.tabulate(6)(i => (7L, i.toLong, i)).toDF("h", "id", "pos")
      .repartition(6)
    val out = df.groupBy("h").agg(agg(cap).as("ps"))
      .where(col("ps").isNotNull)
    assert(out.count() == 0)
  }

  test("packed layout matches the unpacked struct layout on every group band") {
    val cap = 5
    val rows = Seq.tabulate(1)(i => (1L, 100L + i, 10 + i)) ++
      Seq.tabulate(2)(i => (2L, 200L + i, 20 + i)) ++
      Seq.tabulate(5)(i => (3L, 300L + i, 30 + i)) ++
      Seq.tabulate(6)(i => (4L, 400L + i, 40 + i)) ++
      Seq.tabulate(40)(i => (5L, 500L + i, 50 + i))
    val df = rows.toDF("h", "id", "pos").repartition(7)
    def run(aggCol: org.apache.spark.sql.Column) =
      df.groupBy("h").agg(aggCol.as("ps"))
        .where(col("ps").isNotNull)
        .select(col("h"), explode(col("ps")).as("p"))
        .select(col("h"), col("p.id").as("id"), col("p.pos").as("pos"))
        .as[(Long, Long, Int)].collect().toSet
    val packedAgg = column(BoundedPostingList(
      PackIdPos(expression(col("id")), expression(col("pos"))), cap)
      .toAggregateExpression())
    assert(run(packedAgg) == run(agg(cap)))
  }

  test("pack_id_pos guards its range and round-trips the boundary values") {
    assert(PackIdPos.pack(0L, 0) == 0L)
    val p = PackIdPos.pack(PackIdPos.MaxId - 1, PackIdPos.MaxPos - 1)
    assert(PackIdPos.unpackId(p) == PackIdPos.MaxId - 1)
    assert(PackIdPos.unpackPos(p) == PackIdPos.MaxPos - 1)
    intercept[IllegalArgumentException](PackIdPos.pack(PackIdPos.MaxId, 0))
    intercept[IllegalArgumentException](PackIdPos.pack(-1L, 0))
    intercept[IllegalArgumentException](PackIdPos.pack(0L, PackIdPos.MaxPos))
    intercept[IllegalArgumentException](PackIdPos.pack(0L, -1))
  }

  test("packed buffers serialize at 8 bytes per posting (12 unpacked) and round-trip") {
    val packed = BoundedPostingList(
      PackIdPos(expression(lit(1L)), expression(lit(1))), 3)
    val pb = packed.createAggregationBuffer()
    pb.addPacked(PackIdPos.pack(11L, 1)); pb.addPacked(PackIdPos.pack(12L, 2))
    val pBytes = packed.serialize(pb)
    assert(pBytes.length == 4 + 2 * 8)
    val prt = packed.deserialize(pBytes)
    assert(prt.n == 2 && prt.ids.take(2).toSeq == pb.ids.take(2).toSeq)
    assert(packed.eval(prt) != null)

    val unpacked = BoundedPostingList(expression(struct(lit(1L), lit(1))), 3)
    val ub = unpacked.createAggregationBuffer()
    ub.add(11L, 1); ub.add(12L, 2)
    assert(unpacked.serialize(ub).length == 4 + 2 * 12)
  }

  test("serialize/deserialize round-trips entries and the overflow marker") {
    val a = BoundedPostingList(expression(struct(lit(1L), lit(1))), 3)
    val buf = a.createAggregationBuffer()
    buf.add(11L, 1); buf.add(12L, 2)
    val rt = a.deserialize(a.serialize(buf))
    assert(rt.n == 2 && rt.ids.take(2).toSeq == Seq(11L, 12L) &&
      rt.poss.take(2).toSeq == Seq(1, 2))
    assert(a.eval(rt) != null, "in-band group must materialize")
    // overflow: cap+1 entries stored, further adds ignored, n stays cap+1
    (1 to 6).foreach(i => buf.add(20L + i, i))
    assert(buf.n == 4)
    val rtOver = a.deserialize(a.serialize(buf))
    assert(rtOver.n == 4)
    assert(a.eval(rtOver) == null, "overflowed group must evaluate to NULL")
    // below band: a singleton evaluates to NULL too (minSize default 2)
    val single = a.createAggregationBuffer()
    single.add(1L, 1)
    assert(a.eval(single) == null, "singleton group must evaluate to NULL")
  }
}
