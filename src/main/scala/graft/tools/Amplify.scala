package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor amplifier for superlinearity testing: replicates the
  * fact tables of an sf directory `factor`× with per-copy
  * transformations chosen so that PER-COPY query semantics match the
  * source SF and totals scale LINEARLY — the property a fair 10×
  * scale-up test needs:
  *
  *  - keys (`c_custkey`, `o_orderkey`/`o_custkey`, `l_orderkey`,
  *    `event_id`/`user_id`, `doc_id`, `vec_id`) shift by
  *    `copy * 100M`, so per-key densities (lines per order, events
  *    per user, sessions per user) are IDENTICAL to the source and
  *    the key population grows 10× — no artificial skew;
  *  - document text gets a per-copy suffix on every token (a bijective
  *    map of token space): within-copy shingle/minhash/simhash
  *    duplicate structure is preserved EXACTLY, while cross-copy
  *    near-duplicate pairs are eliminated. A verbatim 10× copy would
  *    instead make every doc a 10-member duplicate clique — pair count
  *    ×45, a quadratic INPUT, which would misattribute superlinear
  *    growth to the algorithms under test;
  *  - embeddings are circularly rotated by `copy` dimensions (an
  *    orthogonal transform): within-copy cosine structure is exact,
  *    cross-copy vectors decorrelate, and `vec_id < 8` keeps the
  *    fixed 8-query workload while the corpus grows 10×;
  *  - dimension tables (`region nation part supplier`) stay single-copy
  *    (lineitem keeps its part/supp FKs — they reference the shared
  *    dims, as a real warehouse would).
  *
  * Usage: runMain graft.tools.Amplify <srcSfDir> <destDir> [factor]
  */
object Amplify {
  private val Shift = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // validate BEFORE any table is written: the embeddings transform
    // (rotation × sign flip over dim=64) admits at most 128 distinct
    // copies, and failing mid-run would leave a partial dest behind
    require(factor >= 1 && factor <= 128,
      s"amplify factor $factor outside [1, 128] distinct embedding transforms")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(name: String)(df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dest/$name.parquet")
      System.err.println(s"[amplify] $name: ${spark.read.parquet(s"$dest/$name.parquet").count()} rows")
    }

    // dims: verbatim single copy
    Seq("region", "nation", "part", "supplier").foreach { t =>
      write(t)(read(t))
    }

    def copies(df: DataFrame)(tx: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(c => tx(df, c)).reduce(_ union _)

    write("customer")(copies(read("customer")) { (df, c) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(c * Shift))
    })
    write("orders")(copies(read("orders")) { (df, c) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(c * Shift))
        .withColumn("o_custkey", col("o_custkey") + lit(c * Shift))
    })
    write("lineitem")(copies(read("lineitem")) { (df, c) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(c * Shift))
    })
    write("events")(copies(read("events")) { (df, c) =>
      df.withColumn("event_id", col("event_id") + lit(c * Shift))
        .withColumn("user_id", col("user_id") + lit(c * Shift))
    })
    write("documents")(copies(read("documents")) { (df, c) =>
      val text = if (c == 0) col("text")
      else regexp_replace(col("text"), "(\\S+)", "$1z" + c)
      df.withColumn("doc_id", col("doc_id") + lit(c * Shift))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    write("embeddings")(copies(read("embeddings")) { (df, c) =>
      val dim = 64
      val rot = c % dim
      // Rotation alone wraps at `dim` copies: copy c and copy c+dim
      // would carry IDENTICAL vectors — cross-copy exact-duplicate
      // pairs, a quadratic input at factor > dim. Negating every odd
      // wrap cycle keeps the transform orthogonal (within-copy cosine
      // structure exact) while cosine(x, -x) = -1 kills cross-cycle
      // near-dup collisions, giving 2*dim distinct copies.
      val sign = if ((c / dim) % 2 == 0) 1.0f else -1.0f
      val rotated = if (rot == 0) col("embedding")
      else concat(slice(col("embedding"), rot + 1, dim - rot),
        slice(col("embedding"), 1, rot))
      val emb = if (sign > 0) rotated
      else transform(rotated, x => x * lit(sign))
      df.withColumn("vec_id", col("vec_id") + lit(c * Shift))
        .withColumn("embedding", emb)
    })

    System.err.println(s"[amplify] done: $src x$factor -> $dest")
    spark.stop()
  }
}
