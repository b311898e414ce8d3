package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fingerprint(text)` → array<bigint>: the winnowing document
  * fingerprint (Schleimer, Wilkerson, Aiken — "Winnowing: Local
  * Algorithms for Document Fingerprinting", SIGMOD 2003) over a
  * character-level Rabin–Karp rolling hash:
  *
  *  1. normalize is the CALLER's job (pass the already-normalized text);
  *  2. hash every k-gram with the polynomial rolling hash
  *     `h = Σ cp_j · B^(k-1-j) mod M` (B = 257, M = 2^31 − 1), updated
  *     in O(1) per position;
  *  3. slide a window of `w` consecutive k-gram hashes and select each
  *     window's minimum (monotonic-deque, O(1) amortized);
  *  4. the fingerprint is the sorted distinct selected values — any two
  *     documents sharing a substring of length ≥ k + w − 1 share at
  *     least one fingerprint value (the winnowing guarantee).
  *
  * The selected-VALUE set is independent of the min-tie rule, which is
  * what makes the fingerprint reproducible in ANSI SQL (a window-min +
  * DISTINCT — see the q_fingerprint_winnow oracle).
  *
  * Texts with fewer than one k-gram fingerprint to an empty array;
  * with fewer than `w` k-grams, to the single global minimum.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprint"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprint.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {

  val Base = 257L
  val Mod = 2147483647L // 2^31 − 1: products stay well inside a long

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)

    // k-gram rolling hashes
    val g = n - k + 1
    val hashes = new Array[Long](g)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + cps(i)) % Mod; i += 1 }
    hashes(0) = h
    // B^(k-1) mod M for the roll-out term
    var bk1 = 1L
    i = 0
    while (i < k - 1) { bk1 = (bk1 * Base) % Mod; i += 1 }
    i = 1
    while (i < g) {
      h = ((h - (cps(i - 1) * bk1) % Mod + Mod) % Mod * Base + cps(i + k - 1)) % Mod
      hashes(i) = h
      i += 1
    }

    // winnowing: minimum of each w-window via monotonic deque
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (g <= w) {
      var min = Long.MaxValue
      i = 0
      while (i < g) { if (hashes(i) < min) min = hashes(i); i += 1 }
      selected.add(min)
    } else {
      val deque = new Array[Int](g)
      var head = 0
      var tail = 0 // [head, tail) holds candidate indices, hashes increasing
      i = 0
      while (i < g) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) selected.add(hashes(deque(head)))
        i += 1
      }
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** `winnow_anchor_hashes(text, k, w)` → array<bigint>: the winnowing
  * selection of [[WinnowFingerprint]] WITHOUT the distinct-values
  * collapse — one entry per distinct SELECTED k-gram index, in
  * position order. Window minima are taken over the same 31-bit
  * rolling hash as [[WinnowFingerprint]] (monotonic deque, rightmost
  * tie); a new entry is appended whenever the selected index changes
  * (the classic "record on change" winnowing emission).
  *
  * The emitted VALUE is the 62-bit pack `(h1 << 31) | h2` of TWO
  * independent Rabin–Karp rolls of the selected gram (bases 257 and
  * 263, both mod 2^31 − 1) — NOT the bare 31-bit h1. 31-bit anchor
  * values are birthday-saturated at corpus scale: at 500 k docs
  * (~38 M anchors, ~76/doc) the expected co-occupancy per value is
  * ~0.018, so P(a doc holds NO colliding anchor) ≈ e^−1.3 ≈ 0.26 and
  * ~74% of documents become prefilter "candidates" from hash
  * accidents alone — measured cand_frac 0.95 on a corpus constructed
  * to share nothing (evidence/winnow_ab/WINNOW_AB_r18.json). In the
  * 62-bit space the same corpus expects ≪ 1 colliding PAIR total.
  * Selection stays keyed on h1 so the selected indices are unchanged
  * and `distinct(value >>> 31)` still equals the
  * [[WinnowFingerprint]] set.
  *
  * Why multiplicity matters: this feeds the repeated-span winnow
  * prefilter ([[graft.ops.Dedup.repeatedSpans]]), whose SELF-repeat
  * candidate test is "some value selected at ≥ 2 distinct positions
  * in one document". The deque's tie rule (pop `>=` on arrival) keeps
  * the RIGHTMOST occurrence of a window's minimum, which makes the
  * selected index a pure function of the window's hash CONTENTS —
  * so two occurrences of the same gram run at offsets p and p+d
  * select the same gram at indices exactly d apart, and its packed
  * value appears ≥ 2 times in this array. The value-deduped
  * [[WinnowFingerprint]] cannot express that.
  *
  * Guarantee inherited from winnowing (SIGMOD'03): any two documents
  * sharing a SUBSTRING of length ≥ w + k − 1 share at least one
  * emitted value (equal text ⇒ equal h1 window ⇒ same rightmost-min
  * index ⇒ equal h2 at it); a single document containing such a
  * substring at two offsets emits that value at ≥ 2 entries. Caveat
  * (the price of the widening): a span the posting index emits only
  * because of 31-bit h1 COLLISIONS on unequal text — itself a ~2^−31
  * event per boundary gram, and ≥ w consecutive lookalikes for a
  * whole span — is no longer guaranteed a shared 62-bit anchor, so
  * the prefilter may drop such an accident-span. Texts with fewer
  * than one k-gram yield an empty array; with fewer than w k-grams,
  * the single global (rightmost) h1-minimum.
  */
case class WinnowAnchorHashes(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_anchor_hashes"

  override def nullSafeEval(input: Any): Any =
    WinnowAnchorHashes.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowAnchorHashes.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowAnchorHashes =
    copy(child = newChild)
}

object WinnowAnchorHashes {

  /** Second, independent Rabin–Karp base for the low 31 bits of the
    * packed anchor value (same Mersenne modulus as the selection
    * hash). 263 is prime and coprime to 257 — the two polynomial
    * evaluations collide together only with probability ~2^−62 per
    * unequal gram pair.
    */
  val Base2 = 263L

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val B = WinnowFingerprint.Base
    val B2 = Base2
    val M = WinnowFingerprint.Mod
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)

    // h1 drives the window-minimum selection (identical to
    // WinnowFingerprint); packed(i) = (h1 << 31) | h2 is what's emitted
    val g = n - k + 1
    val hashes = new Array[Long](g)
    val packed = new Array[Long](g)
    var h = 0L
    var h2 = 0L
    var i = 0
    while (i < k) {
      h = (h * B + cps(i)) % M
      h2 = (h2 * B2 + cps(i)) % M
      i += 1
    }
    hashes(0) = h
    packed(0) = (h << 31) | h2
    var bk1 = 1L
    var b2k1 = 1L
    i = 0
    while (i < k - 1) { bk1 = (bk1 * B) % M; b2k1 = (b2k1 * B2) % M; i += 1 }
    i = 1
    while (i < g) {
      h = ((h - (cps(i - 1) * bk1) % M + M) % M * B + cps(i + k - 1)) % M
      h2 = ((h2 - (cps(i - 1) * b2k1) % M + M) % M * B2 + cps(i + k - 1)) % M
      hashes(i) = h
      packed(i) = (h << 31) | h2
      i += 1
    }

    if (g <= w) {
      // single short window: the global rightmost minimum
      var minIdx = 0
      i = 1
      while (i < g) { if (hashes(i) <= hashes(minIdx)) minIdx = i; i += 1 }
      return new GenericArrayData(Array(packed(minIdx)))
    }
    // sliding window minimum, rightmost tie, record on index change
    val out = new java.util.ArrayList[java.lang.Long](g / w + 4)
    val deque = new Array[Int](g)
    var head = 0
    var tail = 0
    var last = -1
    i = 0
    while (i < g) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1 && deque(head) != last) {
        last = deque(head)
        out.add(packed(last))
      }
      i += 1
    }
    val res = new Array[Long](out.size())
    i = 0
    while (i < res.length) { res(i) = out.get(i); i += 1 }
    new GenericArrayData(res)
  }
}

/** `gram_position_hashes(text)` → array<struct<pos:int, h:bigint>>:
  * every k-gram's position (1-based over the caller-normalized text,
  * matching SQL `substring` indexing) with its Rabin–Karp rolling hash
  * — the same `Σ cp_j · B^(k-1-j) mod M` polynomial as
  * [[WinnowFingerprint]], so the value is re-derivable in ANSI SQL from
  * a materialized list of `B^j mod M` powers. Feeds the repeated-span
  * detector ([[graft.ops.Dedup.repeatedSpans]]), which needs positions
  * to merge gram hits into maximal shared spans; the winnowing
  * fingerprint deliberately discards them.
  *
  * Texts with fewer than k codepoints yield an empty array.
  */
case class GramPositionHashes(child: Expression, k: Int)
  extends UnaryExpression {
  require(k >= 1, "k must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_position_hashes"

  override def nullSafeEval(input: Any): Any =
    GramPositionHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramPositionHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): GramPositionHashes =
    copy(child = newChild)
}

object GramPositionHashes {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  def compute(text: UTF8String, k: Int): ArrayData = {
    val B = WinnowFingerprint.Base
    val M = WinnowFingerprint.Mod
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val g = n - k + 1
    val out = new Array[Any](g)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    out(0) = new GenericInternalRow(Array[Any](1, h)): InternalRow
    var bk1 = 1L
    i = 0
    while (i < k - 1) { bk1 = (bk1 * B) % M; i += 1 }
    i = 1
    while (i < g) {
      h = ((h - (cps(i - 1) * bk1) % M + M) % M * B + cps(i + k - 1)) % M
      out(i) = new GenericInternalRow(Array[Any](i + 1, h)): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `B^e mod M` — for materializing the oracle's power list. */
  def powMod(e: Int): Long = {
    var r = 1L
    var i = 0
    while (i < e) { r = (r * WinnowFingerprint.Base) % WinnowFingerprint.Mod; i += 1 }
    r
  }
}

/** `char_ngram_codes(text)` → array<bigint>: every char n-gram packed
  * as n 21-bit codepoints into one long (n ≤ 3; Unicode max 0x10FFFF
  * < 2^21, so the packing is INJECTIVE — a code IS the n-gram, no
  * collisions). One O(length) pass; the compositional
  * `transform(sequence, i -> substr(i, n))` form is O(length²) because
  * each UTF8 substr re-scans from the string start to find its char
  * offset, and it allocates a string per position besides.
  *
  * Dropping the last 21 bits of an n-gram code yields the (n−1)-gram
  * PREFIX code — downstream LM scoring derives bigram-context counts
  * from trigram counts with a shift, no second text scan.
  */
case class CharNgramCodes(child: Expression, n: Int)
  extends UnaryExpression {
  require(n >= 1 && n <= 3, "n must be 1..3 (21-bit codepoints in a long)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "char_ngram_codes"

  override def nullSafeEval(input: Any): Any =
    CharNgramCodes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgramCodes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgramCodes =
    copy(child = newChild)
}

object CharNgramCodes {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val len = cps.length
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var code = 0L
      var j = 0
      while (j < n) { code = (code << 21) | cps(i + j).toLong; j += 1 }
      out(i) = code
      i += 1
    }
    new GenericArrayData(out)
  }
}
