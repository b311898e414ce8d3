package graft

import org.scalatest.funsuite.AnyFunSuite

/** The whole native-function surface must be reachable from plain SQL
  * via the session extension (spark.sql.extensions=graft.GraftExtensions).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  import TestSpark.spark

  test("native expressions are SQL-callable through the extension") {
    val rel = spark.sql(
      "SELECT parse_test_decoding(\"table public.t: INSERT: id[integer]:7\").relation AS r").head.getString(0)
    assert(rel == "public.t")

    val op = spark.sql("SELECT prelude_operation('BEGIN 5') AS o").head.getString(0)
    assert(op == "BEGIN")

    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9)

    // float-array columns (the embeddings table's real type) must cast,
    // not be read as doubles
    val cosF = spark.sql(
      """SELECT cosine_sim(array(cast(3.0 as float), cast(4.0 as float)),
        |                  array(cast(3.0 as float), cast(4.0 as float))) AS c""".stripMargin)
      .head.getDouble(0)
    assert(math.abs(cosF - 1.0) < 1e-6)

    val fp = spark.sql(
      "SELECT size(winnow_fingerprint('the quick brown fox jumps over it')) AS n").head.getInt(0)
    assert(fp > 0)

    val fp53 = spark.sql(
      "SELECT winnow_fingerprint('the quick brown fox jumps over it', 5, 3) AS f").head.getSeq[Long](0)
    assert(fp53.nonEmpty && fp53 == fp53.sorted)

    val jac = spark.sql(
      "SELECT jaccard_long(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j").head.getDouble(0)
    assert(math.abs(jac - 0.5) < 1e-9)

    val sig = spark.sql(
      "SELECT minhash_signature(array('a', 'b', 'c')) AS s").head.getSeq[Long](0)
    assert(sig.length == 64)

    val sh = spark.sql("SELECT simhash64(array('a', 'b')) AS h").head.getLong(0)
    assert(sh != 0L)

    val hb = spark.sql(
      "SELECT hyperplane_buckets(array(0.1d, -0.2d, 0.3d), 3, 4, 2, 42L) AS b").head.getSeq[Int](0)
    assert(hb.length == 2 && hb.forall(b => b >= 0 && b < 16))

    val shg = spark.sql(
      "SELECT size(shingle_hashes('one two three four')) AS n").head.getInt(0)
    assert(shg == 2) // 4 tokens, k=3 -> 2 shingles

    // the full CDC marshal path from plain SQL: parse then render
    val envelope = spark.sql(
      """SELECT marshal_json(p.operation, p.relation, p.columns, p.oldColumns,
        |                    0L, '42-0', 5L) AS j
        |FROM (SELECT parse_test_decoding(
        |  "table public.t: INSERT: id[integer]:7 name[text]:'a'") AS p)""".stripMargin)
      .head.getString(0)
    assert(envelope ==
      """{"time":"1970-01-01T00:00:01Z","time_ms":0,"txn":"42-0","lsn":"0/5","table":"public.t","operation":"INSERT","columns":{"id":{"new":{"v":"7","t":"integer","q":"false"}},"name":{"new":{"v":"a","t":"text","q":"true"}}}}""")
  }
}
