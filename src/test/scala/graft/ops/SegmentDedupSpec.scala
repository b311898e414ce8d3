package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** C4-style corpus-wide duplicate-segment removal
  * ([[Dedup.dropDuplicateSegments]]): segmenters, first-occurrence
  * semantics, reassembly, and a randomized equivalence against a
  * direct in-memory reference.
  */
class SegmentDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("windowSegments: fixed windows, short tail, empty text") {
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "x y"),
      (3L, ""),
      (4L, "  Mixed   CASE  spacing ")).toDF("doc_id", "text")
    val segs = df
      .select($"doc_id", Dedup.windowSegments($"text", 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(segs(1L) == Seq("a b c", "d e f", "g"))
    assert(segs(2L) == Seq("x y"))
    assert(segs(3L) == Seq.empty)
    assert(segs(4L) == Seq("mixed case spacing")) // normalized first
  }

  test("windowSegmentHashes: positionally equal to xxhash64 of the segment strings") {
    val df = Seq(
      (1L, "The QUICK  brown\tfox jumps over the lazy dog again and again"),
      (2L, "ÄBC Straße\tx  y z"), // multi-byte lowercase path
      (3L, ""),
      (4L, "   "),
      (5L, "solo")).toDF("doc_id", "text")
    for (w <- Seq(1, 3, 20)) {
      val bad = df.select(
          Dedup.windowSegmentHashes($"text", w).as("fast"),
          transform(Dedup.windowSegments($"text", w), s => xxhash64(s)).as("slow"))
        .where(not($"fast" <=> $"slow")).count()
      assert(bad == 0, s"hash mismatch at w=$w")
    }
  }

  test("lineSegments: delimiter split, blank lines removed") {
    val df = Seq((1L, "first line\n\n  \nsecond line\nfirst line"))
      .toDF("doc_id", "text")
    val segs = df.select(Dedup.lineSegments($"text").as("s"))
      .as[Seq[String]].head()
    assert(segs == Seq("first line", "second line", "first line"))
  }

  test("dropDuplicateSegments: first occurrence wins, docs reassemble, full dups vanish") {
    // seg layout (w=2): doc 1 = [a b][c d], doc 2 = [c d][e f],
    // doc 3 = [a b][c d] (full duplicate of doc 1's segments),
    // doc 4 = [g h][g h] (within-doc repeat)
    val df = Seq(
      (1L, "a b c d"),
      (2L, "c d e f"),
      (3L, "a b c d"),
      (4L, "g h g h")).toDF("doc_id", "text")
    val out = Dedup.dropDuplicateSegments(
        df, "text", "doc_id", Dedup.windowSegments($"text", 2))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_dedup"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))))
      .toMap
    assert(out(1L) == (("a b c d", 2L, 0L)))      // first occurrences of both
    assert(out(2L) == (("e f", 1L, 1L)))          // "c d" already seen in doc 1
    assert(!out.contains(3L))                     // every segment already seen
    assert(out(4L) == (("g h", 1L, 1L)))          // within-doc repeat deduped too
  }

  test("dropDuplicateSegments: custom separator survives reassembly") {
    val df = Seq((1L, "one\ntwo\nthree"), (2L, "two\nfour")).toDF("doc_id", "text")
    val out = Dedup.dropDuplicateSegments(
        df, "text", "doc_id", Dedup.lineSegments($"text"), sep = "\n")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_dedup")).toMap
    assert(out(1L) == "one\ntwo\nthree")
    assert(out(2L) == "four")
  }

  test("randomized equivalence vs direct reference") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    // Small vocab + short windows force heavy cross-doc segment sharing.
    val docs = (0L until 120L).map { id =>
      val n = 1 + rnd.nextInt(12)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val w = 2
    // Reference: first (id, pos) occurrence per segment string.
    val occs = docs.flatMap { case (id, text) =>
      text.split(" ").grouped(w).map(_.mkString(" ")).zipWithIndex
        .map { case (seg, pos) => (seg, id, pos) }
    }
    val firstOcc = occs.groupBy(_._1).map { case (seg, os) =>
      seg -> os.map(o => (o._2, o._3)).min
    }
    val expected = docs.flatMap { case (id, text) =>
      val kept = text.split(" ").grouped(w).map(_.mkString(" ")).zipWithIndex
        .filter { case (seg, pos) => firstOcc(seg) == ((id, pos)) }
        .map(_._1).toSeq
      if (kept.isEmpty) None
      else Some(id -> kept.mkString(" "))
    }.toMap

    for (packed <- Seq(true, false)) {
      val got = Dedup.dropDuplicateSegments(
          docs.toDF("doc_id", "text"), "text", "doc_id",
          Dedup.windowSegments($"text", w), packed = packed)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_dedup")).toMap
      assert(got == expected, s"packed=$packed")
    }
  }

  test("packed mode fails loudly on out-of-range ids; struct mode handles them") {
    val big = (1L << 33) + 7L // sign-bit territory for the packed layout
    val df = Seq((big, "a b c d"), (1L, "a b x y")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.dropDuplicateSegments(
        df, "text", "doc_id", Dedup.windowSegments($"text", 2)).collect()
    }
    assert(ex.getMessage.contains("packed overflow") ||
      Option(ex.getCause).exists(_.getMessage.contains("packed overflow")))
    val out = Dedup.dropDuplicateSegments(
        df, "text", "doc_id", Dedup.windowSegments($"text", 2), packed = false)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_dedup")).toMap
    assert(out(1L) == "a b x y")     // (1, 0) < (2^33+7, 0): doc 1 owns "a b"
    assert(out(big) == "c d")
  }

  test("packed mode rejects non-integral and null ids loudly, never silently empties") {
    val strDf = Seq(("doc-1", "x y")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.dropDuplicateSegments(
        strDf, "text", "doc_id", Dedup.windowSegments($"text", 2))
    }
    assert(ex.getMessage.contains("integral"))
    val nullDf = Seq(Option(1L), Option.empty[Long])
      .zip(Seq("a b", "c d")).toDF("doc_id", "text")
    val ex2 = intercept[Exception] {
      Dedup.dropDuplicateSegments(
        nullDf, "text", "doc_id", Dedup.windowSegments($"text", 2)).collect()
    }
    assert(ex2.getMessage.contains("packed overflow") ||
      Option(ex2.getCause).exists(_.getMessage.contains("packed overflow")))
  }
}
