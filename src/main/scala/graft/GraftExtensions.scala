package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types._

import graft.functions._

/** Session extension registering the engine's native expressions as
  * SQL functions, so the whole surface is usable from `spark.sql`
  * (and spark-submit via `--conf spark.sql.extensions=graft.GraftExtensions`):
  *
  * {{{
  *   SELECT parse_test_decoding(line).relation FROM wal_lines
  *   SELECT winnow_fingerprint(text) FROM documents
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * Optional-arg functions take literal ints/longs after the column
  * (e.g. `winnow_fingerprint(text, 5, 4)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit(e: Expression): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case l: Long => throw new IllegalArgumentException(s"literal out of int range: $l")
      case other => throw new IllegalArgumentException(s"literal int expected, got $other")
    }
  private def litLong(e: Expression): Long =
    e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(s"literal long expected, got $other")
    }

  // The DataFrame wrappers cast inputs before building the expressions
  // (e.g. cosine over array<float> columns); the SQL surface must do
  // the same or float-packed arrays would be read as doubles.
  private def asDoubles(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
  private def asLongs(e: Expression): Expression = Cast(e, ArrayType(LongType))
  private def asStrings(e: Expression): Expression = Cast(e, ArrayType(StringType))
  private def asString(e: Expression): Expression = Cast(e, StringType)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Alias-level narrowing of the PushdownBarrier fence: filters on
    // pass-through source columns regain scan pruning while
    // barrier-fenced derived columns stay protected (see
    // [[graft.plans.PushThroughBarrierProjects]]).
    ext.injectOptimizerRule(_ => graft.plans.PushThroughBarrierProjects)

    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))

    inject("parse_test_decoding",
      "parse_test_decoding(line) - parse a test_decoding wire line into the change-record struct") {
      args => ParseTestDecoding(asString(args.head))
    }
    inject("prelude_relation",
      "prelude_relation(line) - relation from the prelude-only parse") {
      args => ParsePreludeField(asString(args.head), 0)
    }
    inject("prelude_operation",
      "prelude_operation(line) - operation from the prelude-only parse") {
      args => ParsePreludeField(asString(args.head), 1)
    }
    inject("winnow_fingerprint",
      "winnow_fingerprint(text[, k, w]) - winnowing rolling-hash fingerprint (sorted distinct window minima)") {
      case Seq(t) => WinnowFingerprint(asString(t), 5, 4)
      case Seq(t, k, w) => WinnowFingerprint(asString(t), lit(k), lit(w))
      case args => throw new IllegalArgumentException(s"winnow_fingerprint: 1 or 3 args, got ${args.size}")
    }
    inject("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two double-array columns") {
      case Seq(a, b) => CosineSim(asDoubles(a), asDoubles(b))
      case args => throw new IllegalArgumentException(s"cosine_sim: 2 args, got ${args.size}")
    }
    inject("minhash_signature",
      "minhash_signature(tokens[, numHashes, seed]) - MinHash signature of a token array") {
      case Seq(t) => MinHashSignature(asStrings(t), 64, 42)
      case Seq(t, n, s) => MinHashSignature(asStrings(t), lit(n), lit(s))
      case args => throw new IllegalArgumentException(s"minhash_signature: 1 or 3 args, got ${args.size}")
    }
    inject("simhash64",
      "simhash64(tokens[, seed]) - 64-bit SimHash of a token array") {
      case Seq(t) => SimHash64(asStrings(t), 42)
      case Seq(t, s) => SimHash64(asStrings(t), lit(s))
      case args => throw new IllegalArgumentException(s"simhash64: 1 or 2 args, got ${args.size}")
    }
    inject("shingle_hashes",
      "shingle_hashes(text[, k, seed]) - distinct 64-bit hashes of word k-shingles") {
      case Seq(t) => ShingleHashes(asString(t), 3, 42)
      case Seq(t, k, s) => ShingleHashes(asString(t), lit(k), lit(s))
      case args => throw new IllegalArgumentException(s"shingle_hashes: 1 or 3 args, got ${args.size}")
    }
    inject("jaccard_long",
      "jaccard_long(a, b) - exact Jaccard of two distinct bigint-array sets") {
      case Seq(a, b) => JaccardLong(asLongs(a), asLongs(b))
      case args => throw new IllegalArgumentException(s"jaccard_long: 2 args, got ${args.size}")
    }
    inject("marshal_json",
      "marshal_json(operation, relation, columns, oldColumns, serverTimeMs, timeBasedKey, walStart[, noMarshalOldValue]) - render the change-record JSON envelope") {
      case args if args.size == 7 || args.size == 8 =>
        val noOld = if (args.size == 8) args(7).eval(null) == true else false
        MarshalJson(Seq(
          asString(args(0)), asString(args(1)), args(2), args(3),
          Cast(args(4), LongType), asString(args(5)), Cast(args(6), LongType)), noOld)
      case args => throw new IllegalArgumentException(s"marshal_json: 7 or 8 args, got ${args.size}")
    }
    inject("hyperplane_buckets",
      "hyperplane_buckets(vec, dim, nBits, bands, seed) - per-band hyperplane LSH bucket ids") {
      case Seq(v, d, n, b, s) => HyperplaneBuckets(asDoubles(v), lit(d), lit(n), lit(b), litLong(s))
      case args => throw new IllegalArgumentException(s"hyperplane_buckets: 5 args, got ${args.size}")
    }
  }
}
