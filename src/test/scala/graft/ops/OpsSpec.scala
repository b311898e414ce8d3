package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("text analysis: tokens, fingerprint, quality, language id") {
    val df = Seq(
      (1L, "The cat sat on the mat and it was happy."),
      (2L, ""),
      (3L, "el perro y el gato que en la casa un dia"),
      (4L, "!!! ??? ***")).toDF("doc_id", "text")
    val out = TextAnalysis.analyze("text")(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out(1L).getAs[Int]("n_tokens") == 10)
    assert(out(2L).getAs[Int]("n_tokens") == 0)
    assert(out(1L).getAs[String]("lang_pred") == "en")
    assert(out(3L).getAs[String]("lang_pred") == "es")
    assert(out(2L).getAs[String]("lang_pred") == "und")
    assert(out(1L).getAs[Double]("quality") > out(4L).getAs[Double]("quality"))

    // fingerprint = md5 of normalized text, stable
    val fp = df.where($"doc_id" === 1).select(TextAnalysis.fingerprint($"text")).as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("the cat sat on the mat and it was happy.".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp == expected)
  }

  test("budgetSelect: exact prefix semantics vs brute-force global sort") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map { id =>
      (id, math.round(rnd.nextInt(5) * 0.25 * 10000) / 10000.0, // 5 distinct scores
        (5 + rnd.nextInt(50)).toLong)
    }
    for (budget <- Seq(0L, 137L, 1500L, 100000L)) {
      // reference: global (score desc, id asc) prefix under the budget
      var cum = 0L
      val want = rows.sortBy { case (id, s, _) => (-s, id) }.flatMap { case (id, s, w) =>
        cum += w
        if (cum <= budget) Some((id, cum)) else None
      }.toMap
      val got = Sampling.budgetSelect(
          rows.toDF("doc_id", "score", "w"), "score", "w", "doc_id", budget)
        .select($"doc_id", $"cum_weight").as[(Long, Long)].collect().toMap
      assert(got == want, s"budget=$budget")
    }
  }

  test("budgetSelect: null score/weight/id rows are excluded; continuous scores fail loudly") {
    val withNulls = Seq(
      (Option(1L), Option(1.0), Option(10L)), (Option(2L), None, Option(10L)),
      (Option(3L), Option(0.5), None), (Option(4L), Option(0.5), Option(5L)),
      (None, Option(2.0), Option(1L)))
      .toDF("doc_id", "score", "w")
    val got = Sampling.budgetSelect(withNulls, "score", "w", "doc_id", 100L)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L)) // null rows unrankable, never selected
    val continuous = (1L to 50L).map(i => (i, i * 0.001, 1L))
      .toDF("doc_id", "score", "w")
    val ex = intercept[IllegalArgumentException] {
      Sampling.budgetSelect(continuous, "score", "w", "doc_id", 100L,
        maxDistinctScores = 10)
    }
    assert(ex.getMessage.contains("DISCRETIZED"))
  }

  test("budgetSelect: fractional weight column fails loudly, never truncates") {
    val frac = Seq((1L, 1.0, 1.9), (2L, 1.0, 1.9)).toDF("doc_id", "score", "w")
    val ex = intercept[IllegalArgumentException] {
      Sampling.budgetSelect(frac, "score", "w", "doc_id", 3L)
    }
    assert(ex.getMessage.contains("integral weight"))
  }

  test("adjacent pair counts: BPE candidate scoring") {
    val df = Seq(
      (1L, "a b a b c"),   // pairs: a b, b a, a b, b c
      (2L, "A  B"),        // normalizes to "a b"
      (3L, "solo"),        // no pairs
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.adjacentPairCounts(df)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and optimizers"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "Unrelated text with nothing in common whatsoever here at all friends")
  ).toDF("doc_id", "text")

  test("exact dedup groups and drop") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id")
    assert(groups.count() == 4)
    val g = groups.where($"dup_count" === 2).select("keep_id").as[Long].collect()
    assert(g.toSeq == Seq(1L))
    val kept = Dedup.exactDrop(docs, "text", "doc_id").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 5L))
  }

  test("minhash LSH finds near-dup pair and rejects dissimilar") {
    val dups = Dedup.minhashDuplicates(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups.contains((1L, 2L)))
    assert(dups.contains((1L, 4L)))
    assert(!dups.exists { case (a, b) => Set(a, b).contains(3L) && Set(a, b).contains(5L) })
  }

  test("incrementalNearDedup: union-equivalent pairs for the batch side") {
    val base = "the quick brown fox jumps over the lazy dog again and again for good measure"
    val corpus = Seq(
      (1L, base + " alpha"), (2L, base + " alpha"), // history near-dup pair
      (3L, "totally different content about catalyst optimizer rule ordering"),
      (10L, base + " alpha"), // batch: cross-dup of 1 and 2
      (11L, base + " beta extension"), (12L, base + " beta extension"), // batch intra pair
      (13L, "unrelated singleton document mentioning parquet row groups")
    ).toDF("doc_id", "text")
    val split = 3L
    val idx = Dedup.nearDedupIndex(corpus.where($"doc_id" <= split), "text", "doc_id")
    val inc = Dedup.incrementalNearDedup(
      corpus.where($"doc_id" > split), "text", "doc_id", idx, threshold = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = Dedup.minhashDuplicates(corpus, "text", "doc_id", threshold = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(inc == full.filter(_._2 > split)) // the equivalence contract
    assert(inc.contains((1L, 10L)) && inc.contains((11L, 12L))) // cross + intra
    assert(inc.forall(_._2 > split)) // history-history pairs never re-emitted
  }

  test("incrementalNearDedup: bucket cap admits the union run's rows exactly") {
    val t = "same boilerplate text repeated across every document in this bucket"
    val corpus = Seq(1L, 2L, 10L, 11L).map(i => (i, t)).toDF("doc_id", "text")
    val idx = Dedup.nearDedupIndex(corpus.where($"doc_id" <= 2), "text", "doc_id")
    def incAt(cap: Int) = Dedup.incrementalNearDedup(
      corpus.where($"doc_id" > 2), "text", "doc_id", idx,
      threshold = 0.2, maxBucketSize = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // cap 2: both bucket slots go to history ids 1,2 — no batch row is
    // admitted, exactly as in the union run, so the batch side is empty
    assert(incAt(2).isEmpty)
    // cap 3: slots 1,2,10 — batch doc 10 pairs with both history docs,
    // 11 stays un-admitted
    assert(incAt(3) == Set((1L, 10L), (2L, 10L)))
  }

  test("simhash finds exact and near duplicates by hamming distance") {
    val pairs = Dedup.simhashDuplicates(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b", "hamming").collect()
    val exact = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 4L)
    assert(exact.isDefined && exact.get.getInt(2) == 0)
  }

  test("ngram jaccard dedup with inverted-index blocking") {
    val pairs = Dedup.ngramJaccardDuplicates(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)))
    assert(pairs.size == 3)
  }

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(1.0f, 0.05f, 0.0f))).toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks by similarity with id tie-break") {
    val top = Similarity.bruteForceTopK(vecs, vecs.where($"vec_id" === 1), k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(top == Seq(5L, 2L)) // 5 is closer to e1 than 2
  }

  test("LSH top-k finds the exact-direction neighbor") {
    val top = Similarity.lshTopK(vecs, vecs.where($"vec_id" === 1), k = 2, dim = 3, nBits = 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(top.nonEmpty && top.head == 5L)
  }

  test("multimodal: synthetic media, stub features, frame sampling") {
    val media = Multimodal.syntheticMedia(
      Seq((1L, "hello world document"), (2L, "xyz")).toDF("doc_id", "text"))
    assert(media.select("kind").distinct().count() >= 2)

    val feats = Multimodal.extractFeatures(media.as[MediaRecord]).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 20L)
    assert(feats(1L).histogram.sum > 0.99 && feats(1L).histogram.sum < 1.01)
    assert(feats(1L).byte_entropy > 0)

    val frames = Multimodal.frameSample(media, n = 4, frameBytes = 5)
    assert(frames.where($"media_id" === 1).count() == 4)
    val f0 = frames.where($"media_id" === 1 && $"frame_idx" === 0)
      .select("frame_bytes").as[Array[Byte]].head()
    assert(new String(f0, "UTF-8") == "hello")
  }

  test("winnowing fingerprint: rolling hash + window minima, local-match guarantee") {
    import graft.functions.WinnowFingerprint
    import org.apache.spark.unsafe.types.UTF8String
    def fp(s: String, k: Int = 5, w: Int = 4): Set[Long] = {
      val a = WinnowFingerprint.compute(UTF8String.fromString(s), k, w)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    // rolling recurrence equals direct polynomial evaluation
    def direct(s: String, k: Int): Seq[Long] =
      (0 to s.length - k).map { i =>
        s.substring(i, i + k).codePoints().toArray
          .foldLeft(0L)((h, c) => (h * 257 + c) % 2147483647L)
      }
    val text = "the quick brown fox jumps over the lazy dog"
    val grams = direct(text, 5)
    // every selected value is some window's true minimum
    val expected = (0 to grams.length - 4).map(i => grams.slice(i, i + 4).min).toSet
    assert(fp(text) == expected)

    // shared substring of length >= k + w - 1 => shared fingerprint value
    val a = fp("prefix AAA the common core substring here ZZZ")
    val b = fp("totally different opening the common core substring here and tail")
    assert(a.intersect(b).nonEmpty)

    // edges: no k-grams -> empty; fewer than w k-grams -> global min
    assert(fp("abc") == Set.empty[Long])
    assert(fp("abcdef") == Set(direct("abcdef", 5).min)) // 2 grams < w
    // disjoint contents share nothing
    assert(fp("aaaaaaaaaaaa").intersect(fp("zzzzzzzzzzzz")).isEmpty)
  }

  test("embedding dedup: exact finds identical-direction pairs; LSH recalls them") {
    val exact = Dedup.embeddingDuplicatesExact(vecs, "embedding", "vec_id", threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((1L, 5L))) // (1,0,0) vs (1,0.05,0): cosine ~0.9988
    assert(!exact.contains((1L, 3L))) // orthogonal
    val lsh = Dedup.embeddingDuplicatesLsh(vecs, "embedding", "vec_id",
      threshold = 0.99, dim = 3, nBits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.contains((1L, 5L)))
    assert(lsh.subsetOf(exact)) // verification prevents false positives

    // auto-sized buckets (nBits < 0): a tiny corpus clamps to the
    // 4-bit floor and still recalls the near-identical pair — the
    // corpus-adaptive default exists so bucket occupancy (and with it
    // candidate volume per vector) stays CONSTANT as n grows
    val auto = Dedup.embeddingDuplicatesLsh(vecs, "embedding", "vec_id",
      threshold = 0.99, dim = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto.contains((1L, 5L)) && auto.subsetOf(exact))
  }

  test("repeatedSpans: maximal shared spans with exact positions, short overlaps cut") {
    val common = "the quick brown fox jumps over the lazy dog again and again" // 59 chars
    val docs = Seq(
      (1L, s"aaaaa $common bbbbb"),
      (2L, s"ccccccc $common ddd"),
      (3L, "totally unrelated filler material without any matching sequences"),
      (4L, "prefix the quick brown fox tail-unique-text")) // 21-shared chars < minLen
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "text", "doc_id",
      k = 10, minLen = 30, maxGramFreq = 10)
      .as[(Long, Long, Int, Int, Long)].collect().toSeq
    // ONE maximal span: docs 1-2 share " <common> " (59 + both boundary
    // spaces); the 21-char overlap with doc 4 is below minLen
    assert(spans == Seq((1L, 2L, 6, 8, 61L)))

    // keep-first surgery: the span survives in doc 1, is cut from
    // doc 2, and sub-minLen overlaps leave docs untouched
    val dropped = Dedup.dropRepeatedSpans(docs, "text", "doc_id",
      k = 10, minLen = 30, maxGramFreq = 10)
      .select("doc_id", "text_deduped").as[(Long, String)].collect().toMap
    assert(dropped(1L) == s"aaaaa $common bbbbb")
    assert(dropped(2L) == "cccccccddd")
    assert(dropped(4L) == "prefix the quick brown fox tail-unique-text")
  }

  test("semantic dedup: cluster blocking finds within-cluster pairs only") {
    // two explicit cluster centers: the x-axis family {1,2,5} and the
    // y-axis singleton {3}; z-axis vector 4 assigns to whichever center
    // scores higher but can't pair (alone or below threshold)
    val centroids = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val out = Dedup.semanticDedup(vecs, "embedding", "vec_id", centroids, threshold = 0.9)
      .select("cluster", "id_a", "id_b").as[(Int, Long, Long)].collect().toSet
    // all x-family pairs are found inside cluster 0, nothing else passes
    assert(out == Set((0, 1L, 2L), (0, 1L, 5L), (0, 2L, 5L)))

    // blocking is real: a cross-cluster pair above threshold is NOT
    // emitted (split the x-family across two centers)
    val splitCs = Array(Array(1.0, 0.0, 0.0), Array(0.9, 0.1, 0.0))
    val split = Dedup.semanticDedup(vecs, "embedding", "vec_id", splitCs, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(split.subsetOf(Set((1L, 5L), (1L, 2L), (2L, 5L))) && split != Set((1L, 2L), (1L, 5L), (2L, 5L)))
  }

  test("duplicateClusters: transitive chains collapse to the minimum id") {
    // components: {1,2,3,4} (a chain — 1~4 never paired directly),
    // {10,11}, and a long chain {20..26} exercising >2 iterations
    val pairs = (Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)) ++
      (20L until 26L).map(i => (i, i + 1)))
      .toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(labels(10L) == 10L && labels(11L) == 10L)
    assert((20L to 26L).forall(labels(_) == 20L))
    assert(labels.size == 4 + 2 + 7) // only paired nodes appear

    // end-to-end drop: one survivor per cluster, singletons untouched
    val docs = (1L to 30L).toDF("doc_id")
    val kept = Dedup.dropDuplicateClusters(docs, pairs, "doc_id")
      .as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(4L))
    assert(kept.contains(10L) && !kept.contains(11L))
    assert(kept.contains(20L) && (21L to 26L).forall(!kept.contains(_)))
    assert(kept.contains(30L)) // never paired -> survives
  }

  test("duplicateClusters: long chain converges in O(log diameter) rounds") {
    // a path graph of 256 nodes (diameter 255) is the worst case for
    // plain min-label propagation (255 rounds); the alternating
    // large-star/small-star rewrite must finish in ~log2(255)=8 rounds
    // plus a small constant (incl. the final no-change detection round)
    val chain = (1L until 256L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // driverMaxEdges = 0 forces the distributed loop — the default
    // would collect 255 edges and label them driver-side (rounds = 0)
    val (labels, rounds) =
      Dedup.duplicateClustersWithRounds(chain, maxIters = 20, driverMaxEdges = 0L)
    assert(rounds <= 12, s"expected <=12 star rounds for diameter 255, got $rounds")
    val m = labels.as[(Long, Long)].collect().toMap
    assert(m.size == 256 && (1L to 256L).forall(m(_) == 1L))

    // the driver fast path (default ceiling) must produce the SAME
    // labeling with zero star rounds
    val (fast, r) = Dedup.duplicateClustersWithRounds(chain, maxIters = 20)
    assert(r == 0, s"255 edges under the ceiling should skip the loop, ran $r rounds")
    assert(fast.as[(Long, Long)].collect().toMap == m)
  }

  test("duplicateClusters: empty pair input is a no-op, not a crash") {
    // a corpus with zero near-duplicate pairs is the NORMAL production
    // outcome — the empty-sum NULL must read as converged-empty
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.duplicateClusters(noPairs).count() == 0L)
    val docs = (1L to 5L).toDF("doc_id")
    val kept = Dedup.dropDuplicateClusters(docs, noPairs, "doc_id")
      .as[Long].collect().toSet
    assert(kept == (1L to 5L).toSet) // input unchanged
  }

  test("duplicateClusters: strict mode throws when maxIters cuts propagation short") {
    // maxIters semantics belong to the distributed loop — force it
    // (the driver fast path is exact and never bails out)
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.duplicateClusters(chain, maxIters = 1, strict = true,
        driverMaxEdges = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // non-strict returns partial labels (documented behavior, WARN logged)
    assert(Dedup.duplicateClusters(chain, maxIters = 1,
      driverMaxEdges = 0L).count() == 8L)
  }

  test("mergeDuplicateClusters: incremental == full recompute; untouched components skip the loop") {
    // old graph: chain {1,2,3}, pair {10,11}, long chain {20..40}
    // (the component the batch must NOT touch), singleton-root {50}
    val oldPairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 50L)) ++
      (20L until 40L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val existing = Dedup.duplicateClusters(oldPairs)
    // batch: merges {1..3} with {10,11} via 3~10, extends it with a NEW
    // node 12, and starts a brand-new component {60,61}
    val newPairs = Seq((3L, 10L), (11L, 12L), (60L, 61L)).toDF("id_a", "id_b")

    // force the distributed loop so the round-count assertion below
    // actually pins that untouched components stay out of it
    val (inc, rounds) =
      Dedup.mergeDuplicateClustersWithRounds(existing, newPairs,
        driverMaxEdges = 0L)
    val full = Dedup.duplicateClusters(oldPairs.unionByName(newPairs))
    // and the default (driver fast path over the touched sliver) must
    // agree with the forced-loop labeling
    assert(Dedup.mergeDuplicateClusters(existing, newPairs)
      .as[(Long, Long)].collect().toSet ==
      inc.as[(Long, Long)].collect().toSet)
    assert(inc.as[(Long, Long)].collect().toSet ==
      full.as[(Long, Long)].collect().toSet)

    val m = inc.as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 10L, 11L, 12L).forall(m(_) == 1L)) // cross-component merge
    assert((20L to 40L).forall(m(_) == 20L)) // untouched, passed through
    assert(m(50L) == 50L)                    // untouched self-pair root
    assert(m(60L) == 60L && m(61L) == 60L)   // all-new component

    // the untouched diameter-20 chain alone would need ~5+ star rounds;
    // the touched subgraph (two star components + 3 batch edges) is
    // shallow — the round count proves the big chain stayed OUT of the
    // loop (star compression: its 21 labels ride the anti-join leg)
    assert(rounds <= 4,
      s"expected <=4 rounds over the touched subgraph, got $rounds")

    // empty batch: labels pass through verbatim, zero iteration
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val (same, r0) = Dedup.mergeDuplicateClustersWithRounds(existing, empty)
    assert(r0 == 0 && same.as[(Long, Long)].collect().toSet ==
      existing.as[(Long, Long)].collect().toSet)
  }

  test("cluster label store: disk roundtrip, merge-from-store == full recompute") {
    val oldPairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 50L)) ++
      (20L until 40L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val newPairs = Seq((3L, 10L), (11L, 12L), (60L, 61L)).toDF("id_a", "id_b")
    val store = java.nio.file.Files
      .createTempDirectory("graft_labelstore").toString + "/labels"

    val labels = Dedup.duplicateClusters(oldPairs)
    Dedup.writeClusterLabelStore(labels, store)
    labels.unpersist()
    // roundtrip: the store IS the labeling
    assert(Dedup.readClusterLabelStore(spark, store)
      .as[(Long, Long)].collect().toSet ==
      Dedup.duplicateClusters(oldPairs).as[(Long, Long)].collect().toSet)

    // merging a batch against disk state == from-scratch over old ∪ new
    val merged = Dedup.mergeClusterLabelStore(spark, store, newPairs)
    val full = Dedup.duplicateClusters(oldPairs.unionByName(newPairs))
    assert(merged.as[(Long, Long)].collect().toSet ==
      full.as[(Long, Long)].collect().toSet)
  }

  test("incrementalExactDedup drops known fingerprints then dedups the batch") {
    val known = Seq((100L, "already ingested doc")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "already  INGESTED   doc"), // normalizes to a known fingerprint
      (2L, "fresh content a"),
      (3L, "fresh content a"), // in-batch duplicate of 2
      (4L, "fresh content b")).toDF("doc_id", "text")
    val out = Dedup.incrementalExactDedup(
      batch, Dedup.exactGroups(known, "text", "doc_id"), "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(2L, 4L))
  }

  test("incrementalExactDedupBloom: identical result, sliver-sized anti-join input") {
    // larger corpus so the bloom's fpp behavior is observable: 200
    // known docs, a 400-doc batch where 50 are re-ingests
    val known = (0L until 200L).map(i => (i, s"known doc body number $i"))
      .toDF("doc_id", "text")
    val index = Dedup.exactGroups(known, "text", "doc_id")
    val batch = ((0L until 50L).map(i => (1000L + i, s"known doc body number $i")) ++
      (0L until 350L).map(i => (2000L + i, s"fresh doc body number $i")))
      .toDF("doc_id", "text")

    val plain = Dedup.incrementalExactDedup(batch, index, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val bloomed = Dedup.incrementalExactDedupBloom(batch, index,
        expectedItems = 200, fpp = 0.01, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    // no false negatives ⇒ exactly the plain anti-join result
    assert(bloomed == plain)
    assert(bloomed == (0L until 350L).map(2000L + _).toSet)

    // the pre-filter property: every known fingerprint probes true (the
    // exactness guarantee), and the maybe-sliver is dups + ~fpp of the
    // fresh rows — far smaller than the batch the plain path shuffles
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val bf = index.select(col("fingerprint").as("__fp")).distinct()
      .stat.bloomFilter("__fp", 200, 0.01)
    val probed = batch
      .withColumn("__fp", graft.ops.TextAnalysis.fingerprint(col("text")))
      .withColumn("maybe", column(graft.functions.BloomMightContain(
        expression(col("__fp")), bf)))
    val knownRows = probed.where(col("doc_id") >= 1000L && col("doc_id") < 2000L)
    assert(knownRows.where(!col("maybe")).count() == 0L, "false negative!")
    val sliver = probed.where(col("maybe")).count()
    assert(sliver < 50L + 350L * 0.1,
      s"maybe-sliver $sliver should be ~dups + fpp x fresh")

    // NULL text ⇒ NULL fingerprint ⇒ NULL bloom probe: such rows are
    // definitely-new (NULL never equi-joins the index) and must survive
    // on both paths, not vanish from both where() legs
    val withNull = batch.unionByName(
      Seq((9999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val plainN = Dedup.incrementalExactDedup(withNull, index, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val bloomN = Dedup.incrementalExactDedupBloom(withNull, index,
        expectedItems = 200, fpp = 0.01, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(bloomN == plainN)
    assert(bloomN.contains(9999L), "NULL-text row must not be dropped")
  }

  test("hash sampling is deterministic, rate-accurate, and stratified") {
    val df = spark.range(0, 10000).select(
      col("id").as("doc_id"),
      when(col("id") % 3 === 0, "web").otherwise("wiki").as("source"))

    val s1 = Sampling.hashSample(df, "doc_id", keep = 30)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(df, "doc_id", keep = 30)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same key -> same decision, always")
    assert(math.abs(s1.size - 3000) < 300, s"rate off: ${s1.size}")
    // nested property: a smaller sample of the same universe is a
    // subset of the larger one (buckets are ordered)
    val s3 = Sampling.hashSample(df, "doc_id", keep = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(s3.subsetOf(s1))

    val strat = Sampling.stratifiedHashSample(df, "source", "doc_id",
      rates = Map("web" -> 90), defaultKeep = 10)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(strat("web") - 3000) < 300, s"web: ${strat("web")}")
    assert(math.abs(strat("wiki") - 667) < 150, s"wiki: ${strat("wiki")}")

    intercept[IllegalArgumentException](
      Sampling.hashSample(df, "doc_id", keep = 101))
  }

  test("typicalityBuckets: per-domain terciles, high scores in the head bucket") {
    val docs = (0 until 30).map { i =>
      val domain = if (i % 2 == 0) "a" else "b"
      // vary typicality: most docs share trigrams; a few are glyph soup
      val text = if (i % 5 == 0) s"zq#$i xv!jk wq@p" * 3
                 else s"the quick brown fox jumps over the lazy dog $i"
      (i.toLong, domain, text)
    }.toDF("doc_id", "source", "text")
    val out = TextAnalysis.typicalityBuckets(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Double]("typicality_r"), r.getAs[Long]("bucket")))
    // every domain splits into 3 buckets of |domain|/3 each
    for (d <- Seq("a", "b")) {
      val sizes = out.filter(_._2 == d).groupBy(_._4).view.mapValues(_.length).toMap
      assert(sizes.keySet == Set(1L, 2L, 3L) && sizes.values.forall(_ == 5), s"$d: $sizes")
      // buckets order by score: every head-bucket score >= every tail-bucket score
      val byBucket = out.filter(_._2 == d).groupBy(_._4)
      assert(byBucket(3L).map(_._3).min >= byBucket(1L).map(_._3).max)
    }
    // glyph soup lands in the tail (bucket 1), not the head
    val soup = out.filter(t => t._1 % 5 == 0)
    assert(soup.forall(_._4 == 1L), s"soup buckets: ${soup.map(_._4).toSeq}")
  }

  test("temperatureMix flattens the head toward the tail; alpha=1 is identity") {
    // heavily skewed corpus: 8000 a / 1800 b / 200 c
    val df = spark.range(0, 10000).select(
      col("id").as("doc_id"),
      when(col("id") % 100 < 80, "a").when(col("id") % 100 < 98, "b")
        .otherwise("c").as("source"))

    // alpha = 1: q ∝ p — nothing to reshape, every row kept
    assert(Sampling.temperatureMix(df, "source", "doc_id", alpha = 1.0)
      .count() == 10000L)

    // alpha = 0.5: the rarest domain binds (kept whole); realized
    // composition tracks q_i ∝ sqrt(p_i)
    val mixed = Sampling.temperatureMix(df, "source", "doc_id", alpha = 0.5)
    val byDomain = mixed.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(byDomain("c") == 200L, "rarest domain is kept whole")
    val q = Map("a" -> math.sqrt(0.80), "b" -> math.sqrt(0.18), "c" -> math.sqrt(0.02))
    // c binds: expected kept_i = 200 * q_i / q_c
    for (s <- Seq("a", "b")) {
      val want = 200d * q(s) / q("c")
      assert(math.abs(byDomain(s) - want) < want * 0.1,
        s"$s: got ${byDomain(s)}, want ~$want")
    }
    // the flattening direction: head share shrinks, tail share grows
    val total = byDomain.values.sum.toDouble
    assert(byDomain("a") / total < 0.80 && byDomain("c") / total > 0.02)

    // deterministic md5 rule: same input -> identical sample
    val again = Sampling.temperatureMix(df, "source", "doc_id", alpha = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == mixed.select("doc_id").as[Long].collect().toSet)

    intercept[IllegalArgumentException](
      Sampling.temperatureMix(df, "source", "doc_id", alpha = 0.0))
    intercept[IllegalArgumentException](
      Sampling.temperatureMix(df, "source", "doc_id", alpha = 1.5))
  }

  test("domainMix hits the target mixture without upsampling") {
    // 6000 a / 3000 b / 1000 c, target 1:1:2 -> c binds (1000/2 = 500
    // units), so the mix keeps ~500 a, ~500 b, all 1000 c
    val df = spark.range(0, 10000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 6, "a").when(col("id") % 10 < 9, "b")
        .otherwise("c").as("source"))
    val mixed = Sampling.domainMix(df, "source", "doc_id",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 2.0))
    val byDomain = mixed.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(byDomain("c") == 1000L, "binding stratum is kept whole")
    assert(math.abs(byDomain("a") - 500) < 100, s"a: ${byDomain("a")}")
    assert(math.abs(byDomain("b") - 500) < 100, s"b: ${byDomain("b")}")

    // deterministic: same input -> identical sample
    val again = Sampling.domainMix(df, "source", "doc_id",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 2.0))
      .select("doc_id").as[Long].collect().toSet
    assert(again == mixed.select("doc_id").as[Long].collect().toSet)

    // unweighted strata are dropped entirely
    val noC = Sampling.domainMix(df, "source", "doc_id",
      Map("a" -> 1.0, "b" -> 1.0))
    assert(noC.where(col("source") === "c").count() == 0L)

    intercept[IllegalArgumentException](
      Sampling.domainMix(df, "source", "doc_id", Map("a" -> -1.0)))
  }

  test("tfidfTopK ranks corpus-rare tokens above ubiquitous ones") {
    val df = Seq(
      (1L, "common rare1 common common"),
      (2L, "common rare2 rare2"),
      (3L, "common filler words here")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(df, "text", "doc_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(5))).toList
    // "common" is in every doc -> idf = ln(4/4) = 0 -> never top-ranked
    val top1 = out.filter(_._3 == 1L).map(t => t._1 -> t._2).toMap
    assert(top1(1L) == "rare1")
    assert(top1(2L) == "rare2")
    assert(out.forall { case (_, tok, rank) => tok != "common" || rank > 1 })
    // per-doc cap respected
    assert(out.groupBy(_._1).values.forall(_.size <= 2))
  }

  test("leakageSafeSplit: near-dup clusters never straddle a split boundary") {
    val docs = (1L to 200L).toDF("doc_id")
    // chains so transitivity matters: {1..4}, {10,11}, {20..26}
    val pairs = (Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)) ++
      (20L until 26L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, pairs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .as[(Long, String)].collect().toMap
    assert(out.size == 200)
    // every clustered doc shares its cluster's split
    assert(Seq(1L, 2L, 3L, 4L).map(out).distinct.size == 1)
    assert(Seq(10L, 11L).map(out).distinct.size == 1)
    assert((20L to 26L).map(out).distinct.size == 1)
    // all three splits are populated over 200 docs and the rule is
    // the singleton hashSample rule (same md5 bucket on the own id)
    assert(out.values.toSet == Set("train", "val", "test"))
    val single = docs.except(pairs.select($"id_a".as("doc_id"))
        .union(pairs.select($"id_b".as("doc_id"))))
      .withColumn("b", Sampling.hashBucket($"doc_id", 100))
      .as[(Long, Int)].collect()
    single.foreach { case (id, b) =>
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(out(id) == want, s"doc $id bucket $b")
    }
  }

  test("as-of join: latest right row at-or-before, per key, leak-free") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val left = Seq(
      (1L, 100L, ts(5)),   // after r@3 -> sees v=30
      (2L, 100L, ts(3)),   // EQUAL ts -> as-of is inclusive, sees v=30
      (3L, 100L, ts(2)),   // between r@1 and r@3 -> sees v=10
      (4L, 100L, ts(0)),   // before any right row -> NULL
      (5L, 200L, ts(9)))   // other key -> sees that key's v=99 only
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts(1), 10.0),
      (100L, ts(3), 30.0),
      (200L, ts(4), 99.0))
      .toDF("user_id", "ts", "v")
    val out = Asof.joinBackward(left, right, Seq("user_id"), "ts", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(30.0), 2L -> Some(30.0), 3L -> Some(10.0),
      4L -> None, 5L -> Some(99.0)))

    // a null-ts right row must not leak into the running state
    val dirty = right.union(Seq((100L, null.asInstanceOf[Timestamp], 666.0))
      .toDF("user_id", "ts", "v"))
    val out2 = Asof.joinBackward(left, dirty, Seq("user_id"), "ts", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out2 == out)

    // deterministic right dedup: lexicographic struct max per (key, ts)
    val dup = Seq((100L, ts(1), 10.0, 7L), (100L, ts(1), 10.0, 9L))
      .toDF("user_id", "ts", "v", "k")
    val red = Asof.latestPerKeyTs(dup, Seq("user_id"), "ts", Seq("v", "k"))
      .select("v", "k").as[(Double, Long)].collect().toSeq
    assert(red == Seq((10.0, 9L)))
  }

  test("as-of join: tolerance discards stale matches, forward mirrors backward") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val left = Seq(
      (1L, 100L, ts(5)),   // r@3 is 2s old -> inside 3s tolerance
      (2L, 100L, ts(10)),  // r@3 is 7s old -> DISCARDED by tolerance
      (3L, 100L, ts(3)))   // exact hit, distance 0
      .toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts(1), 10.0), (100L, ts(3), 30.0))
      .toDF("user_id", "ts", "v")
    val tol = Asof.joinBackward(left, right, Seq("user_id"), "ts", Seq("v"),
        tolerance = Some("3 seconds"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(tol == Map(1L -> Some(30.0), 2L -> None, 3L -> Some(30.0)))

    // forward: earliest right at-or-after, inclusive at equal ts
    val fleft = Seq(
      (1L, 100L, ts(0)),   // before both -> nearest ahead is r@1
      (2L, 100L, ts(1)),   // EQUAL ts -> inclusive, sees v=10
      (3L, 100L, ts(2)),   // between -> sees r@3
      (4L, 100L, ts(4)),   // after the last right row -> NULL
      (5L, 200L, ts(0)))   // other key
      .toDF("event_id", "user_id", "ts")
    val fright = Seq((100L, ts(1), 10.0), (100L, ts(3), 30.0), (200L, ts(7), 99.0))
      .toDF("user_id", "ts", "v")
    val fwd = Asof.joinForward(fleft, fright, Seq("user_id"), "ts", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(fwd == Map(1L -> Some(10.0), 2L -> Some(10.0), 3L -> Some(30.0),
      4L -> None, 5L -> Some(99.0)))

    // forward + tolerance: a next-event further ahead than the bound is absent
    val fwdTol = Asof.joinForward(fleft, fright, Seq("user_id"), "ts", Seq("v"),
        tolerance = Some("2 seconds"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(fwdTol == Map(1L -> Some(10.0), 2L -> Some(10.0), 3L -> Some(30.0),
      4L -> None, 5L -> None))
  }

  test("as-of join: values come from the matched ROW, not per-column reach-back") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    // the nearest right row carries a NULL value — the as-of result for
    // that column must be NULL, never an older row's value smuggled in
    // by a per-column ignoreNulls fill
    val right = Seq(
      (100L, ts(1), Option(10.0)),
      (100L, ts(9), Option.empty[Double]))
      .toDF("user_id", "ts", "v")
    val left = Seq((1L, 100L, ts(10))).toDF("event_id", "user_id", "ts")
    val back = Asof.joinBackward(left, right, Seq("user_id"), "ts", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(back == Map(1L -> None), s"matched row (t=9) has v=NULL: $back")
    // ...and under tolerance the stale t=1 row must stay out of reach
    val tol = Asof.joinBackward(left, right, Seq("user_id"), "ts", Seq("v"),
        tolerance = Some("3 seconds"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(tol == Map(1L -> None))
    // the snapshot-timeline plan agrees (the documented result-identity)
    val snap = Asof.snapshotJoinBackward(left, right, Seq("user_id"), "ts", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(snap == back)
  }

  test("range join: bucketized containment matches the naive predicate, no dup pairs") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(7)
    val base = 1700000000000L
    // random points and intervals spanning multiple buckets (width 1h)
    val pts = (1L to 200L).map(i =>
      (i, i % 5, new Timestamp(base + rnd.nextInt(48 * 3600) * 1000L)))
      .toDF("pid", "k", "ts")
    val ivs = (1L to 60L).map { i =>
      val s = base + rnd.nextInt(48 * 3600) * 1000L
      (i, i % 5, new Timestamp(s), new Timestamp(s + (rnd.nextInt(5 * 3600) + 1) * 1000L))
    }.toDF("iid", "k", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "ts", "s", "e")
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val want = pts.join(ivs, Seq("k"))
      .where($"s" <= $"ts" && $"ts" <= $"e")
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want)
    assert(got.distinct == got, "a pair must meet in exactly one bucket")
    assert(got.nonEmpty)
  }

  test("typicalityScore: corpus-typical text outscores atypical glyph soup") {
    val typical = "the cat sat on the mat and the dog sat on the log"
    val df = Seq(
      (1L, typical),
      (2L, "the cat sat on the log and the dog sat on the mat"), // same trigram diet
      (3L, "zq#7!xv@9&kj%3*wp^5$mn"), // trigrams seen once each
      (4L, "ab")) // below one trigram: dropped
      .toDF("doc_id", "text")
    val scores = TextAnalysis.typicalityScore(df)
      .as[(Long, Double)].collect().toMap
    assert(!scores.contains(4L))
    assert(scores(1L) > scores(3L) && scores(2L) > scores(3L))
    // scores are smoothed log-likelihood means: strictly negative
    assert(scores.values.forall(_ < 0))

    // cross-corpus mode: trained on docs 1-2 only, the glyph soup's
    // unseen trigrams smooth to the add-k floor and score far below
    val ref = df.where($"doc_id" <= 2)
    val x = TextAnalysis.typicalityScoreAgainst(df, ref)
      .as[(Long, Double)].collect().toMap
    assert(x(1L) > x(3L) && x(2L) > x(3L))
    assert(x(3L) < scores(3L), "unseen-in-reference must score below self-trained")
  }

  test("qualityGate: one-pass metrics, keep verdict and failure audit") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
           "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"), // clean
      (2L, "spam spam spam spam spam spam spam spam spam spam " +
           "spam spam spam spam spam spam spam spam spam spam spam"), // repetitive
      (3L, "tiny doc")) // too short
      .toDF("doc_id", "text")
    val out = Curation.qualityGate(df, "text", "doc_id",
        minTokens = 20, minDistinctRatio = 0.45, maxDup2Frac = 0.12)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[String]("failed_rules") == "")

    assert(!out(2L).getAs[Boolean]("keep"))
    val r2 = out(2L).getAs[String]("failed_rules").split(",").toSet
    assert(r2.contains("low_diversity") && r2.contains("repetitive"))

    assert(!out(3L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[String]("failed_rules") == "too_short")
  }
}
