package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Capstone: the curation operators COMPOSE the way a user runs them —
  * exact dedup → repeated-span surgery → quality gate → leakage-safe
  * split → sequence packing, each stage consuming the previous stage's
  * frame directly, over the real documents table. Asserts the
  * conservation laws a pipeline owner relies on (no row invented, every
  * kept doc split exactly once, packing covers exactly the survivors)
  * and end-to-end determinism (two runs, identical results).
  */
class PipelineComposeSpec extends AnyFunSuite {
  import TestSpark.spark
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"

  private def runPipeline() = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val total = docs.count()

    // 1. exact dedup (content-fingerprint survivors)
    val deduped = Dedup.exactDrop(docs, "text", "doc_id")

    // 2. cut cross-doc repeated spans from later docs (keep-first)
    val surgered = Dedup.dropRepeatedSpans(deduped, "text", "doc_id",
      k = 20, minLen = 40, maxGramFreq = 50)
      .drop("text").withColumnRenamed("text_deduped", "text")

    // 3. quality gate on the surgically-cleaned text (the gate emits a
    // metrics frame; the keep-set joins back as a semi-join)
    val gated = surgered.join(
      Curation.qualityGate(surgered).where(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
      .select("doc_id", "text", "source")

    // 4. leakage-safe split keyed on remaining near-dup clusters
    val pairs = Dedup.ngramJaccardDuplicates(gated, "text", "doc_id")
    val split = Sampling.leakageSafeSplit(gated, pairs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))

    // 5. pack the training split into 512-token bins
    val train = split.where(col("split") === "train")
    val packed = Packing.packGreedy(train, budget = 512, shardSize = 1000L)

    (total, deduped, gated, split, train, packed)
  }

  test("dedup -> span surgery -> gate -> split -> pack composes with conservation laws") {
    val (total, deduped, gated, split, train, packed) = runPipeline()
    val nDedup = deduped.count()
    val nGated = gated.count()
    val nSplit = split.count()
    val nTrain = train.count()

    // monotone filtering, nothing invented
    assert(total >= nDedup && nDedup >= nGated)
    assert(nGated > 0, "pipeline must not annihilate the corpus")
    // every gated doc is split exactly once, every split is known
    assert(nSplit == nGated)
    assert(split.select("split").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    // packing covers exactly the training docs, each once
    assert(packed.count() == nTrain)
    assert(packed.select("id").distinct().count() == nTrain)
    // bins respect the budget for every doc that fits alone
    val over = packed.where(col("n_tokens") <= 512)
      .groupBy("shard", "bin").agg(sum("n_tokens").as("s"))
      .where(col("s") > 512).count()
    assert(over == 0, "a bin of fitting docs must not exceed the budget")
  }

  test("the composed pipeline is deterministic end-to-end") {
    val (_, _, _, split1, _, packed1) = runPipeline()
    val (_, _, _, split2, _, packed2) = runPipeline()
    assert(split1.select("doc_id", "split").collect().toSet ==
      split2.select("doc_id", "split").collect().toSet)
    assert(packed1.collect().toSet == packed2.collect().toSet)
  }

  test("Pipeline.curate leaves no cached RDDs behind") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val evalSet = docs.where(pmod(col("doc_id"), lit(50)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(50)) =!= 0)

    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = Pipeline.curate(corpus, evalSet)
    // the returned frames are the caller's to consume; materialize and
    // release them the way a job would
    res.report.count(); res.split.count(); res.packedTrain.count()
    res.split.unpersist(); res.packedTrain.unpersist()
    // retention contract since r21: caches are released synchronously,
    // and localCheckpoint blocks (ngramJaccardDuplicates' shingle
    // table) are GC-BOUNDED — the ContextCleaner unpersists them once
    // the result frames drop their references. Poll through a GC cycle
    // rather than asserting instantaneous emptiness; what this still
    // catches is any UNBOUNDED retention (a strongly-referenced cache
    // no GC can release — the r13-r20 leak shape).
    def leakedNow(): Set[Int] =
      (spark.sparkContext.getPersistentRDDs.keySet -- before).toSet
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var leaked = leakedNow()
    while (leaked.nonEmpty && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(250)
      leaked = leakedNow()
    }
    assert(leaked.isEmpty,
      s"curate leaked ${leaked.size} cached RDD(s): $leaked " +
        "(still pinned after GC + ContextCleaner)")
  }

  test("curate with spanDedup=true runs the surgery stage: boilerplate cut, report row present, default chain untouched") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // MIXED case on purpose: the surgery must match case-insensitively
    // yet emit the surviving text with its ORIGINAL case (the r12
    // all-lowercase fixture could not catch a normalized-text leak)
    val boiler = "Shared BOILERPLATE Chrome that is long enough to SPAN the gram window easily "
    val docs = (1L to 30L).map { i =>
      val body = s"Document $i Body " + (s"tok$i Uniq$i word$i Five$i six$i SEVEN$i eight$i nine$i ten$i " * 8)
      (i, if (i % 3 == 0) body + boiler + "tail " + boiler else body + boiler, "web")
    }.toDF("doc_id", "text", "source")
    val evalDocs = Seq((1000L, "completely unrelated eval text", "eval"))
      .toDF("doc_id", "text", "source")

    val cfg = Pipeline.CurateConfig(
      minTokens = 5, maxTokens = 100000, minDistinctRatio = 0.0, maxDup2Frac = 1.0,
      spanDedup = true, spanK = 10, spanMinLen = 20, spanMaxGramFreq = 100)
    val res = Pipeline.curate(docs, evalDocs, cfg)

    val report = res.report.orderBy("stage_idx")
      .select("stage", "n_rows").as[(String, Long)].collect()
    assert(report.map(_._1).toSeq == Seq("corpus", "quality_gate", "cluster_dedup",
      "span_dedup", "decontaminate", "typicality_filter", "train_split", "pack_bins"),
      s"stage chain with surgery: ${report.toSeq}")
    assert(res.stageSecs.contains("span_dedup"))

    // keep-first: the boilerplate may survive only in doc 1 (the
    // lowest-id occurrence at surgery time); every later doc had it
    // cut, whatever the downstream filters keep
    val texts = res.split.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val carriers = texts.filter(_._2.toLowerCase.contains(boiler.trim.toLowerCase)).map(_._1)
    assert(carriers.forall(_ == 1L),
      s"boilerplate must survive only in doc 1, found in ${carriers.toSeq}")
    assert(texts.exists(t => t._1 > 1L && !t._2.toLowerCase.contains(boiler.trim.toLowerCase)),
      "fixture must include a later doc whose boilerplate was cut")
    // raw preservation: where the boilerplate DID survive it keeps its
    // original mixed case, and every emitted doc is a concatenation of
    // verbatim substrings of its raw text (never lowercased/collapsed)
    assert(texts.filter(_._1 == 1L).forall(_._2.contains(boiler.trim)),
      "surviving boilerplate must keep its original case")
    val rawById = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    for ((docId, t) <- texts)
      assert(t.isEmpty || rawById(docId).contains(t.take(40)),
        s"doc $docId output must start with a verbatim fragment of its raw text")

    // default config: no span stage, indices 0-6 exactly as the oracle pins
    val resDefault = Pipeline.curate(docs, evalDocs, Pipeline.CurateConfig(
      minTokens = 5, maxTokens = 100000, minDistinctRatio = 0.0, maxDup2Frac = 1.0))
    val defStages = resDefault.report.orderBy("stage_idx")
      .select("stage").as[String].collect().toSeq
    assert(defStages == Seq("corpus", "quality_gate", "cluster_dedup",
      "decontaminate", "typicality_filter", "train_split", "pack_bins"))
    assert(!resDefault.stageSecs.contains("span_dedup"))
  }
}
