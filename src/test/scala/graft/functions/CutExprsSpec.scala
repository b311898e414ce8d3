package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Direct edge-case pins for [[ApplyNormalizedCuts]]'s normalized→raw
  * position mapping; the randomized corpus-level agreement (and both
  * index strategies) lives in `SpanBruteForceSpec`.
  */
class CutExprsSpec extends AnyFunSuite {

  private def cut(raw: String, cuts: (Int, Int)*): String =
    ApplyNormalizedCuts.compute(
      UTF8String.fromString(raw),
      new GenericArrayData(cuts.map { case (s, l) =>
        new GenericInternalRow(Array[Any](s, l)): InternalRow
      }.toArray[Any])).toString

  test("cut at start over a case difference") {
    // normalized "hello world"; cut [1,6) = "hello" → raw [0,5)
    assert(cut("Hello  World", (1, 5)) === "  World")
  }

  test("cut across a collapsed whitespace run") {
    // normalized "hello world"; cut [5,8) = "o w" → raw "Hell" + "orld"
    assert(cut("Hello  World", (5, 3)) === "Hellorld")
  }

  test("boundary inside a run keeps the run") {
    // cut ends AT the collapsed space (norm pos 6): raw end maps to the
    // run start, so the whole run survives
    assert(cut("Hello \t World", (1, 5)) === " \t World")
  }

  test("overlapping and nested cuts fold with a running max-end") {
    // normalized "abcdefgh": [2,5) ∪ [3,4) ∪ [4,7) = [2,7)
    assert(cut("abcdefgh", (2, 3), (3, 1), (4, 3)) === "agh")
  }

  test("cut past the normalized end clamps") {
    assert(cut("abc", (2, 99)) === "a")
    assert(cut("abc", (9, 5)) === "abc")
  }

  test("leading/trailing trimmed spaces are always kept") {
    // trim strips only U+0020 at the ends; normalized "a b"
    assert(cut("  a b  ", (1, 3)) === "    ")
  }

  test("empty cut list is identity") {
    assert(cut(" Mixed \n CASE ") === " Mixed \n CASE ")
  }

  test("one-to-many lowercase expansion maps both positions to the one raw codepoint") {
    // lower("İ") = "i̇" (U+0069 U+0307): normalized positions 1..2 both
    // own raw codepoint 0. Cutting both removes it; cutting only the
    // first half cannot split the codepoint, so it survives.
    assert(cut("İx", (1, 2)) === "x")
    assert(cut("İx", (1, 1)) === "İx")
  }

  test("expansion keep-if-any-part-survives is symmetric (both halves)") {
    // A cut covering only the SECOND normalized position of the
    // expansion keeps the codepoint, same as covering only the first
    assert(cut("İx", (2, 1)) === "İx")
    // ... including when the cut extends past the expansion: İ kept, x cut
    assert(cut("İx", (2, 2)) === "İ")
    // but two cuts jointly covering both halves excise the codepoint
    assert(cut("İx", (1, 1), (2, 1)) === "x")
    // and a mid-expansion start whose preceding half was cut by an
    // overlapping earlier interval also excises
    assert(cut("İx", (1, 2), (2, 1)) === "x")
  }
}
