package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.LongType

/** Column-level function surface of the engine. Everything here stays
  * inside Catalyst codegen (built-in functions or native expressions —
  * no Scala UDF closures in hot paths).
  */
object GraftFunctions {

  /** Parse a raw `test_decoding` line into the dynamic change-record
    * struct (NULL if unparseable). See SURVEY §2 O3.
    */
  def parse_test_decoding(line: Column): Column =
    column(ParseTestDecoding(expression(line)))

  /** Register SQL-callable functions on a session. */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_test_decoding", exprs => ParseTestDecoding(exprs.head), "built-in")
  }

  /** The reference's QuickHash (utils/utils.go:32-35): IEEE CRC32 of the
    * key modulo `buckets`. Spark's `crc32` is the same polynomial, so
    * bucketing is bit-identical to the reference.
    */
  def crc32_bucket(key: Column, buckets: Int): Column =
    pmod(crc32(key.cast("string")), lit(buckets.toLong)).cast("int")

  /** Oracle-friendly alternative bucket hash (md5-prefix based): exactly
    * expressible in ANSI SQL engines that lack crc32 (e.g. DuckDB:
    * `('0x' || substr(md5(k),1,8))::UBIGINT % n`). Used where an
    * independent SQL oracle must reproduce the bucketing.
    */
  def md5_bucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast(LongType),
      lit(buckets.toLong)).cast("int")

  /** Cosine similarity between two float/double array columns, computed
    * with codegen'd higher-order functions (zip_with + aggregate); inputs
    * are cast to double first so the arithmetic is stable across engines.
    */
  def cosine_similarity(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(ad, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(bd, lit(0.0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Dot product of two array columns (cast to double). */
  def dot_product(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** The reference's LSN display format `"%X/%X"` of the hi/lo 32 bits
    * (marshaller/marshaller.go:312-317).
    */
  def format_lsn(walStart: Column): Column =
    format_string("%X/%X",
      shiftrightunsigned(walStart, 32),
      walStart.bitwiseAND(lit(0xFFFFFFFFL)))
}
