package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Golden fixture for raw-preserving span surgery over MESSY
  * whitespace: tabs, CRLF, multi-space runs, form feeds and a
  * case-expanding codepoint (U+0130 İ, whose lowercase is two
  * codepoints) — the fixed-point anchor the randomized
  * [[SpanBruteForceSpec]] (ASCII corpus) cannot give. The expected
  * strings are hand-audited: every kept character is byte-identical to
  * the raw input, and the excised range is exactly the repeated span's
  * normalized interval mapped back through the position map.
  */
class SpanGoldenSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // One shared 43-char normalized span ("the quick brown fox jumps
  // over the lazy dog") across docs 1, 2, 4; doc 3 shares nothing.
  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog today",
    2L -> "The\tQuick  Brown\r\nFOX jumps\fover the LAZY dog yesterday İstanbul",
    3L -> "completely different text with nothing shared here at all ok",
    4L -> "prefix İİİ \r\n the QUICK brown fox JUMPS over\t\tthe lazy DOG suffix")

  // Hand-audited: the shared normalized span is
  // "the quick brown fox jumps over the lazy dog " (44 chars with the
  // trailing collapsed space). Doc 1 (lowest id in every pair) keeps
  // its text; docs 2 and 4 have exactly that interval excised from the
  // RAW text — every surviving byte identical, tabs/CRLF/İ intact.
  private val golden = Map(
    1L -> "the quick brown fox jumps over the lazy dog today",
    2L -> "yesterday İstanbul",
    3L -> "completely different text with nothing shared here at all ok",
    4L -> "prefix İİİ \r\n suffix")

  test("golden: raw-preserving surgery over tabs, CRLF, runs and U+0130") {
    val docs = corpus.toDF("doc_id", "text").repartition(3)
    for (strategy <- Seq(Dedup.SpanIndexWindow, Dedup.SpanIndexBounded)) {
      val out = Dedup.dropRepeatedSpans(docs, "text", "doc_id",
          k = 20, minLen = 40, maxGramFreq = 50,
          strategy = strategy, preserveRaw = true)
        .select("doc_id", "text_deduped").as[(Long, String)].collect().toMap
      golden.foreach { case (id, want) =>
        assert(out(id) == want, s"strategy=$strategy doc=$id")
      }
    }
  }
}
