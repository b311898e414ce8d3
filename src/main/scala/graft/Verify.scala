package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the driver's events.parquet carries TIMESTAMP(NANOS) which
      // Spark 4 otherwise refuses; queries convert the long back
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write µs timestamps (not INT96) so dumped results carry the
      // same arrow dtype the DuckDB oracle produces
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // The driver's DuckDB compare is dtype-sensitive and its oracles emit
    // naive timestamps; a tz-aware TimestampType column is always drift
    // (shipped once, as q_asof_orders in r6). Reject at dump time.
    import org.apache.spark.sql.types._
    def tzAware(dt: DataType): Boolean = dt match {
      case TimestampType       => true
      case s: StructType       => s.fields.exists(f => tzAware(f.dataType))
      case a: ArrayType        => tzAware(a.elementType)
      case m: MapType          => tzAware(m.keyType) || tzAware(m.valueType)
      case _                   => false
    }
    var schemaFailures = 0
    val thrown = scala.collection.mutable.ListBuffer.empty[(String, String)]
    // local-iteration escape hatch mirroring Bench's BENCH_ONLY: dump
    // (and list oracles for) just the named queries. The driver never
    // sets it, so official correctness runs stay full-registry.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = df.schema.fields.filter(f => tzAware(f.dataType))
        if (bad.nonEmpty) {
          schemaFailures += 1
          System.err.println(s"[verify] $name REJECTED: tz-aware timestamp " +
            s"column(s) ${bad.map(_.name).mkString(", ")} — cast to " +
            "timestamp_ntz (q_stats_window convention)")
          // a stale dump from a prior run on a reused outDir would let
          // the gate compare LAST run's parquet and phantom-PASS the
          // query just rejected: make the rejection visible as a
          // missing-output FAIL instead
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete()
          }
          rm(new java.io.File(s"$outDir/$name"))
        } else df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        thrown += (name -> String.valueOf(e.getMessage).takeWhile(_ != '\n'))
      }
      // Ops that RETURN cached frames (curation pipeline, incremental
      // cluster store) leave caller-owned cache entries behind; the dump
      // is done with them here, so release between queries — the session
      // hygiene a production orchestrator applies between jobs.
      spark.catalog.clearCache()
    }
    if (schemaFailures > 0)
      System.err.println(s"[verify] $schemaFailures tz-aware schema rejections")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Fail CLOSED on schema rejections: a rejected query without an
    // oracle_sql entry would otherwise surface only as a missing
    // rows-only listing + a stderr line, never a counted failure. The
    // marker file makes the rejection machine-visible to any gate
    // reading outDir; the nonzero exit fails the dump regardless of
    // oracle coverage. (oracle_sql.json is still written above so
    // per-query diagnosis of the non-rejected set stays possible.)
    if (schemaFailures > 0) {
      Files.writeString(Paths.get(s"$outDir/REJECTIONS.txt"),
        s"$schemaFailures tz-aware schema rejections\n")
      sys.exit(1)
    }
    // Fail CLOSED on thrown queries too: in round 9 two analysis-time
    // failures printed one stderr line each and then VANISHED from the
    // correctness record (the compare only sees dumped dirs), so a
    // 66/66 "all green" masked the only regression. The marker file
    // names each failed query + its first error line; the nonzero exit
    // makes a shrunken dump impossible to mistake for a green run.
    if (thrown.nonEmpty) {
      Files.writeString(Paths.get(s"$outDir/FAILURES.txt"),
        thrown.map { case (n, m) => s"$n\t$m" }.mkString("", "\n", "\n"))
      System.err.println(s"[verify] ${thrown.size} queries threw — failing closed")
      sys.exit(1)
    }
  }
}
