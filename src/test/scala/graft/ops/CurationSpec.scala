package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ //
  // Decontamination                                              //
  // ------------------------------------------------------------ //

  private val train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"), // shares 3-grams with eval doc 100
    (2L, "one two three four five six seven"), // clean
    (3L, "alpha beta gamma unrelated tail words"), // shares exactly one 3-gram
    (4L, "tiny doc") // shorter than n: whole-text shingle
  ).toDF("doc_id", "text")

  private val evalSet = Seq(
    (100L, "alpha beta gamma delta end"),
    (101L, "tiny doc")
  ).toDF("doc_id", "text")

  test("contaminationReport counts distinct shared n-grams; decontaminate drops them") {
    val rep = Curation.contaminationReport(train, evalSet, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "alpha beta gamma" and "beta gamma delta"; doc 3 only the first;
    // doc 4 (< n tokens) matches eval doc 101 verbatim as a whole-text shingle
    assert(rep == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))

    val clean = Curation.decontaminate(train, evalSet, "text", "doc_id", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
  }

  test("contamination eval side broadcasts; report shuffles only on hashes") {
    val plan = Curation.contaminationReport(train, evalSet, "text", "doc_id", n = 3)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    // the join key is the 64-bit gram hash (native single-pass
    // shingler), not the gram string
    assert(plan.contains("shingle_hashes"))
  }

  test("contamination is case/whitespace insensitive via normalization") {
    val t = Seq((1L, "Alpha  BETA gamma  delta x y")).toDF("doc_id", "text")
    val rep = Curation.contaminationReport(t, evalSet, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == Map(1L -> 2L))
  }

  test("fuzzyContamination: Jaccard from the inverted-index agg, no join-back") {
    val tr = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // near-copy of eval 100
      (2L, "one two three four five six"), // disjoint
      (3L, "alpha beta gamma x y z")) // small overlap
      .toDF("doc_id", "text")
    val ev = Seq((100L, "alpha beta gamma delta epsilon end")).toDF("doc_id", "text")
    val out = Curation.fuzzyContamination(tr, ev, "text", "doc_id",
        shingleSize = 3, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // doc 1: shingles {abg, bgd, gde, dez}; eval {abg, bgd, gde, dee}
    // -> shared 3, union 5, jaccard 0.6
    assert(out((1L, 100L)) == (3L, 0.6))
    assert(!out.contains((2L, 100L)))
    assert(!out.contains((3L, 100L))) // 1 shared / 7 union = 0.14 < 0.2

    // plan: eval inverted index broadcasts; train side has no exchange
    // before the candidate aggregation's own shuffle
    val plan = Curation.fuzzyContamination(tr, ev, "text", "doc_id")
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
  }

  // ------------------------------------------------------------ //
  // Repetition metrics                                           //
  // ------------------------------------------------------------ //

  test("repetitionStats: run-length top/dup counts over sorted grams") {
    // "a b a b a b": bigrams = [a b, b a, a b, b a, a b] → "a b"×3, "b a"×2
    val df = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val st = df.select(Curation.repetitionStats($"text", 2).as("st"))
      .select($"st.top", $"st.dup").head()
    assert(st.getLong(0) == 3L) // most frequent bigram occurs 3×
    assert(st.getLong(1) == 5L) // all 5 bigram positions are duplicated grams
  }

  test("repetitionReport fractions: repeated text scores high, varied text low") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "each word here appears exactly once in sentence")
    ).toDF("doc_id", "text")
    val out = Curation.repetitionReport(df, "text", "doc_id", Seq(2, 3))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    // doc 1: every bigram is "spam spam" → top2 = dup2 = 1.0; one token distinct
    assert(out(1L).getAs[Double]("top2_frac") == 1.0)
    assert(out(1L).getAs[Double]("dup2_frac") == 1.0)
    assert(out(1L).getAs[Double]("distinct_token_ratio") == 0.125)
    // doc 2: no repeated grams at all
    assert(out(2L).getAs[Double]("dup2_frac") == 0.0)
    assert(out(2L).getAs[Double]("dup3_frac") == 0.0)
    assert(out(2L).getAs[Double]("distinct_token_ratio") == 1.0)
    // a single most-frequent gram always exists (count 1) → top2 = 1/7
    assert(math.abs(out(2L).getAs[Double]("top2_frac") - 1.0 / 7) < 1e-6)
  }

  test("native RepetitionProfile matches the declarative fold on varied docs") {
    // adversarial shapes: runs, alternations, short docs, whitespace
    // noise, unicode, single token, exactly-n tokens
    val docs = Seq(
      "a a a a a a", "a b a b a b a", "x y z x y z x", "one",
      "  padded   whitespace  doc  ", "α β γ α β γ α β", "t1 t2",
      "w1 w2 w3", "same same", "lots of words none of which repeat at all",
      "").zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    for (n <- Seq(2, 3)) {
      val declarative = df.select($"doc_id",
          Curation.repetitionStats($"text", n).as("st"))
        .select($"doc_id", $"st.top", $"st.dup")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val native = Curation.repetitionReport(df, "text", "doc_id", Seq(n))
      // re-derive top/dup from the fractions: frac * cnt must round-trip
      val k = org.apache.spark.sql.functions.size(
        Dedup.wordShingles($"text", n)).cast("double")
      val nat = df.join(native, "doc_id")
        .select($"doc_id",
          round(col(s"top${n}_frac") * k).cast("long"),
          round(col(s"dup${n}_frac") * k).cast("long"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(nat == declarative, s"n=$n mismatch")
    }
  }

  test("repetition metrics are 0 for empty text") {
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val r = Curation.repetitionReport(df, "text", "doc_id", Seq(2)).head()
    assert(r.getAs[Double]("distinct_token_ratio") == 0.0)
    // blank text yields the single empty whole-text shingle
    assert(r.getAs[Double]("top2_frac") == 1.0)
    assert(r.getAs[Double]("dup2_frac") == 0.0)
  }

  // ------------------------------------------------------------ //
  // PII redaction                                                //
  // ------------------------------------------------------------ //

  test("redactPii scrubs emails, IPv4s and phones with per-rule counts") {
    val df = Seq(
      (1L, "mail a.user+tag@sub.example.org and b@x.io, host 192.168.0.1, call +1-555-0100"),
      (2L, "no pii here at all"),
      (3L, "ip 10.0.0.255 then 010-555-123-4567 twice 10.1.2.3")
    ).toDF("id", "note")
    val out = Curation.redactPii(df, "note").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap

    assert(out(1L).getAs[Long]("n_email") == 2L)
    assert(out(1L).getAs[Long]("n_ipv4") == 1L)
    assert(out(1L).getAs[Long]("n_phone") == 1L)
    assert(out(1L).getAs[String]("redacted") ==
      "mail <EMAIL> and <EMAIL>, host <IPV4>, call <PHONE>")

    assert(out(2L).getAs[String]("redacted") == "no pii here at all")
    assert(out(2L).getAs[Long]("n_email") == 0L)

    assert(out(3L).getAs[Long]("n_ipv4") == 2L)
    assert(out(3L).getAs[Long]("n_phone") == 1L)
    assert(out(3L).getAs[String]("redacted") == "ip <IPV4> then <PHONE> twice <IPV4>")
  }

  test("rule order prevents double-redaction: IP digits never count as phones") {
    val df = Seq((1L, "only 172.16.254.1 here")).toDF("id", "note")
    val r = Curation.redactPii(df, "note").head()
    assert(r.getAs[Long]("n_ipv4") == 1L)
    assert(r.getAs[Long]("n_phone") == 0L)
  }
}
