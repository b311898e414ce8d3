package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `pack_id_pos(id, pos)` → bigint: one 8-byte posting —
  * `(id << 30) | pos`, id in [0, 2^34), pos in [0, 2^30).
  *
  * The span index's pre-aggregation input is the gram stream, a
  * chars-proportional row set that the posting-list aggregation's
  * sort-based fallback SORTS per partition in the spill regime (the
  * sf10 profile puts 44 % of the family's CPU in sort/spill machinery,
  * <10 % in the aggregate itself). Packing (id, pos) into one long
  * drops a field from every sorted/spilled row (3 → 2 UnsafeRow slots:
  * 32 → 24 bytes/row) and lets the aggregation state store and ship
  * 8 bytes per posting instead of 12 — attacking exactly the measured
  * bottleneck, not the aggregate.
  *
  * The 34/30 split covers ~17 B documents of ≤ 1 GiB of text each.
  * Out-of-range inputs FAIL LOUDLY (never silently alias): full-64-bit
  * ids (e.g. the xxhash64 workaround for string ids) must disable
  * packing via `spark.graft.span.packedPostings=false`, which routes
  * [[graft.ops.Dedup.repeatedSpans]] to the unpacked struct layout.
  */
case class PackIdPos(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "pack_id_pos"

  override def nullSafeEval(id: Any, pos: Any): Any =
    PackIdPos.pack(id.asInstanceOf[Long], pos.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (i, p) =>
      s"${ev.value} = graft.functions.PackIdPos.pack($i, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackIdPos =
    copy(left = newLeft, right = newRight)
}

object PackIdPos {
  val PosBits = 30
  val MaxId: Long = 1L << 34
  val MaxPos: Int = 1 << PosBits
  val PosMask: Long = MaxPos - 1L

  def pack(id: Long, pos: Int): Long = {
    if (id < 0L || id >= MaxId || pos < 0 || pos >= MaxPos)
      throw new IllegalArgumentException(
        s"pack_id_pos overflow: id=$id pos=$pos (ids must be in [0, 2^34), " +
          "positions in [0, 2^30)); set spark.graft.span.packedPostings=false " +
          "to use the full-range unpacked posting layout")
    (id << PosBits) | pos
  }

  def unpackId(p: Long): Long = p >>> PosBits
  def unpackPos(p: Long): Int = (p & PosMask).toInt
}

/** Aggregation state for [[BoundedPostingList]]: up to `cap` + 1
  * postings. The +1 slot is the overflow marker — a group that
  * receives more than `cap` entries stops storing at `cap` + 1 and
  * evaluates to NULL, which the caller's null filter then drops
  * exactly like a too-frequent gram. Per-group state is therefore
  * O(cap) regardless of how ubiquitous the gram is — the property that
  * lets the aggregation run map-side at any corpus size.
  *
  * Layout: in packed mode (`poss == null`) each posting is one
  * [[PackIdPos]]-packed long in `ids`; unpacked mode keeps the
  * (full-range id, pos) pair across `ids`/`poss`.
  */
final class PostingBuf(val cap: Int, val packed: Boolean) {
  val ids = new Array[Long](cap + 1)
  val poss: Array[Int] = if (packed) null else new Array[Int](cap + 1)
  var n = 0

  def addPacked(p: Long): Unit = if (n <= cap) {
    ids(n) = p
    n += 1
  }

  def add(id: Long, pos: Int): Unit = if (n <= cap) {
    ids(n) = id
    poss(n) = pos
    n += 1
  }
}

/** `bounded_posting_list(posting, cap, minSize)` — the inverted-index
  * build step of [[graft.ops.Dedup.repeatedSpans]] as a single
  * aggregation with HARD-BOUNDED per-group state. `posting` is either
  * a `struct<id:bigint,pos:int>` or a [[PackIdPos]]-packed `bigint`
  * (selected by the child's type); output is identical either way.
  *
  * Replaces the count-over-window + collect_list pair: the window
  * needed a full sort of the gram stream just to count occurrences
  * before collect_list could safely run (unbounded lists would OOM on
  * boilerplate grams). This aggregate enforces the frequency cutoff
  * INSIDE the accumulator — beyond `cap` entries it stops storing —
  * so it needs no pre-sort, runs with map-side partial aggregation
  * (duplicate grams combine before the shuffle), and ships ≤ `cap` + 1
  * postings per distinct gram per map partition (8 bytes each packed,
  * 12 unpacked).
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

  private def packed: Boolean = child.dataType == LongType

  override def createAggregationBuffer(): PostingBuf = new PostingBuf(cap, packed)

  override def update(buf: PostingBuf, input: InternalRow): PostingBuf = {
    val v = child.eval(input)
    if (v != null) {
      if (buf.packed) buf.addPacked(v.asInstanceOf[Long])
      else {
        val r = v.asInstanceOf[InternalRow]
        // A null id or pos field would unbox to 0 and silently pair as
        // doc 0 / position 0 — skip it, matching the null-propagating
        // comparison semantics of the join form this aggregate replaced.
        if (!r.isNullAt(0) && !r.isNullAt(1)) buf.add(r.getLong(0), r.getInt(1))
      }
    }
    buf
  }

  override def merge(b1: PostingBuf, b2: PostingBuf): PostingBuf = {
    var i = 0
    if (b1.packed) {
      while (i < b2.n && b1.n <= cap) {
        b1.addPacked(b2.ids(i))
        i += 1
      }
    } else {
      while (i < b2.n && b1.n <= cap) {
        b1.add(b2.ids(i), b2.poss(i))
        i += 1
      }
    }
    b1
  }

  override def eval(buf: PostingBuf): Any =
    if (buf.n > cap || buf.n < minSize) null
    else {
      val out = new Array[Any](buf.n)
      var i = 0
      if (buf.packed) {
        while (i < buf.n) {
          out(i) = new GenericInternalRow(Array[Any](
            PackIdPos.unpackId(buf.ids(i)), PackIdPos.unpackPos(buf.ids(i)))): InternalRow
          i += 1
        }
      } else {
        while (i < buf.n) {
          out(i) = new GenericInternalRow(
            Array[Any](buf.ids(i), buf.poss(i))): InternalRow
          i += 1
        }
      }
      new GenericArrayData(out)
    }

  override def serialize(buf: PostingBuf): Array[Byte] = {
    val width = if (buf.packed) 8 else 12
    val bb = ByteBuffer.allocate(4 + buf.n * width)
    bb.putInt(buf.n)
    var i = 0
    if (buf.packed) {
      while (i < buf.n) { bb.putLong(buf.ids(i)); i += 1 }
    } else {
      while (i < buf.n) {
        bb.putLong(buf.ids(i))
        bb.putInt(buf.poss(i))
        i += 1
      }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PostingBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new PostingBuf(cap, packed)
    val n = bb.getInt()
    var i = 0
    if (buf.packed) {
      while (i < n) { buf.addPacked(bb.getLong()); i += 1 }
    } else {
      while (i < n) {
        buf.add(bb.getLong(), bb.getInt())
        i += 1
      }
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
