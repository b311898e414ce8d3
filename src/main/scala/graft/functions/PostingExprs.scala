package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation state for [[BoundedPostingList]]: up to `cap` + 1
  * postings of (id, pos). The +1 slot is the overflow marker — a group
  * that receives more than `cap` entries stops storing at `cap` + 1
  * and evaluates to NULL, which the caller's null filter then drops
  * exactly like a too-frequent gram. Per-group state is therefore
  * O(cap) regardless of how ubiquitous the gram is — the property that
  * lets the aggregation run map-side at any corpus size.
  */
final class PostingBuf(val cap: Int) {
  val ids = new Array[Long](cap + 1)
  val poss = new Array[Int](cap + 1)
  var n = 0

  def add(id: Long, pos: Int): Unit = if (n <= cap) {
    ids(n) = id
    poss(n) = pos
    n += 1
  }
}

/** `bounded_posting_list(struct<id:bigint,pos:int>, cap, minSize)` —
  * the inverted-index build step of [[graft.ops.Dedup.repeatedSpans]]
  * as a single aggregation with HARD-BOUNDED per-group state.
  *
  * Replaces the count-over-window + collect_list pair: the window
  * needed a full sort of the gram stream just to count occurrences
  * before collect_list could safely run (unbounded lists would OOM on
  * boilerplate grams). This aggregate enforces the frequency cutoff
  * INSIDE the accumulator — beyond `cap` entries it stops storing —
  * so it needs no pre-sort, runs with map-side partial aggregation
  * (duplicate grams combine before the shuffle), and ships ≤ `cap` + 1
  * postings per distinct gram per map partition.
  *
  * Output: the postings array when the group's total count is in
  * `[minSize, cap]`, else NULL. The band lives in `eval` rather than a
  * downstream `size(...)` filter because eval runs once per DISTINCT
  * group: on a real corpus the overwhelming majority of grams are
  * singletons, and banding here means those groups allocate NOTHING
  * (profiled round 12: the former always-materialize eval put
  * per-posting row allocation at the top of the span family's
  * allocation profile). An overflowed group's true count is > cap, so
  * NULL drops it with exactly the former size-filter semantics.
  * Ordering within the array is accumulation order — callers must not
  * rely on it (the span detector doesn't: pair expansion is
  * order-insensitive and the island merge re-sorts).
  */
case class BoundedPostingList(
    child: Expression,
    cap: Int,
    minSize: Int = 2,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PostingBuf] with UnaryLike[Expression] {
  require(cap >= 1, "cap must be positive")
  require(minSize >= 0 && minSize <= cap, "minSize must be in [0, cap]")

  override def createAggregationBuffer(): PostingBuf = new PostingBuf(cap)

  override def update(buf: PostingBuf, input: InternalRow): PostingBuf = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      // A null id or pos field would unbox to 0 and silently pair as
      // doc 0 / position 0 — skip it, matching the null-propagating
      // comparison semantics of the join form this aggregate replaced.
      if (!r.isNullAt(0) && !r.isNullAt(1)) buf.add(r.getLong(0), r.getInt(1))
    }
    buf
  }

  override def merge(b1: PostingBuf, b2: PostingBuf): PostingBuf = {
    var i = 0
    while (i < b2.n && b1.n <= cap) {
      b1.add(b2.ids(i), b2.poss(i))
      i += 1
    }
    b1
  }

  override def eval(buf: PostingBuf): Any =
    if (buf.n > cap || buf.n < minSize) null
    else {
      val out = new Array[Any](buf.n)
      var i = 0
      while (i < buf.n) {
        out(i) = new GenericInternalRow(
          Array[Any](buf.ids(i), buf.poss(i))): InternalRow
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(buf: PostingBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 12)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putLong(buf.ids(i))
      bb.putInt(buf.poss(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PostingBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new PostingBuf(cap)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.add(bb.getLong(), bb.getInt())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bounded_posting_list"

  override def withNewMutableAggBufferOffset(n: Int): BoundedPostingList =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedPostingList =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BoundedPostingList =
    copy(child = newChild)
}
