package graft.parser

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based hardening of the test_decoding automaton (raw
  * ScalaCheck generators driven from a fixed seed — the
  * scalatest/scalacheck bridge artifact is not on the offline
  * classpath):
  *
  *  1. TOTALITY — no input string, however hostile, makes the parser
  *     throw; it returns Left or Right.
  *  2. ROUNDTRIP — for arbitrary column values rendered exactly the way
  *     Postgres renders them (single-quoted, `''` escaping), parsing
  *     the line recovers the original values, types, and quoting flags.
  */
class ParserPropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(0xC0FFEEL + i)))

  test("parser is total: arbitrary strings never throw") {
    samples(Gen.asciiStr, 500).foreach { s =>
      TestDecodingParser.parse(s) // Left or Right, never an exception
      TestDecodingParser.parsePreludeOrNull(s)
    }
    // adversarial prefixes around the grammar
    val hostile = Gen.oneOf(
      "table ", "table x", "BEGIN", "COMMIT ", "table a.b: ",
      "table a.b: INSERT: x[", "table a.b: INSERT: x[t]:'", "table \"q")
      .flatMap(p => Gen.asciiStr.map(p + _))
    samples(hostile, 500).foreach { s =>
      TestDecodingParser.parse(s)
      TestDecodingParser.parsePreludeOrNull(s)
    }
  }

  private val identGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))

  // printable values including quote/backslash/space torture
  private val valueGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('\'', '"', '\\', ' ', ':', '[', ']'),
    1 -> Gen.oneOf('é', 'ß', '中'))).map(_.mkString.take(40))

  test("render -> parse roundtrips arbitrary quoted values") {
    val cases = samples(
      for (c1 <- identGen; c2 <- identGen; v1 <- valueGen; v2 <- valueGen)
        yield (c1, c2, v1, v2), 500)
    assert(cases.size > 400)
    cases.foreach { case (c1, c2base, v1, v2) =>
      val c2 = if (c2base == c1) c2base + "x" else c2base
      def q(v: String) = "'" + v.replace("'", "''") + "'"
      val line = s"table public.t: INSERT: $c1[text]:${q(v1)} $c2[integer[]]:${q(v2)}"
      val r = TestDecodingParser.parse(line)
      assert(r.isRight, s"line: $line -> $r")
      val pc = r.toOption.get
      assert(pc.relation == "public.t" && pc.operation == "INSERT")
      assert(pc.columns(c1).v == v1 && pc.columns(c1).q)
      assert(pc.columns(c1).t == "text")
      assert(pc.columns(c2).v == v2)
      assert(pc.columns(c2).t == "integer[]")
    }
  }

  test("render -> parse roundtrips unquoted numerics and null sentinel") {
    samples(Gen.choose(Long.MinValue, Long.MaxValue), 200).foreach { n =>
      val line = s"table s.t: INSERT: a[bigint]:$n b[text]:null"
      val pc = TestDecodingParser.parse(line).toOption.get
      assert(pc.columns("a").v == n.toString && !pc.columns("a").q)
      assert(pc.columns("b").v == "null" && !pc.columns("b").q)
    }
  }
}
