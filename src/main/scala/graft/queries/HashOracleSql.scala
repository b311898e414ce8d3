package graft.queries

/** DuckDB oracle SQL for the Murmur-based sketch queries, built from
  * first principles the way the CRC-32 oracle is: Scala's
  * `MurmurHash3.stringHash` (two 32-bit passes per token/shingle) and
  * the splitmix64 lane mixer are re-derived in SQL with 16-bit-split
  * multiplies (BIGINT never overflows) and 64-bit state carried as
  * (hi, lo) 32-bit halves across staged CTE columns.
  *
  * This makes the MinHash/SimHash candidate sets VALUE-checkable: the
  * oracle reproduces the signatures bit-for-bit, groups bands by slice
  * content (equivalent to the engine's xxhash64 band keys — equal
  * slices ⟺ equal keys), and re-verifies jaccard/hamming exactly.
  * The one standing assumption is BMP text (DuckDB indexes strings by
  * codepoint, the JVM by UTF-16 unit; they agree below U+10000).
  */
private[queries] object HashOracleSql {

  private val MASK = 4294967295L

  // --- 32-bit ops on BIGINT columns (values always in [0, 2^32)) ---
  private def mul32(a: String, c: Long): String = {
    val cl = c & 0xFFFFL
    val ch = (c >>> 16) & 0xFFFFL
    s"((($a) * $cl + ((($a) * $ch) & 65535) * 65536) & $MASK)"
  }
  private def rotl(x: String, r: Int): String =
    s"(((($x) * ${1L << r}) & $MASK) | (($x) >> ${32 - r}))"
  private def xor(a: String, b: String): String = s"xor($a, $b)"

  // --- scala.util.hashing.MurmurHash3.stringHash, staged ---
  private val C1 = 0xcc9e2d51L
  private val C2 = 0x1b873593L
  private def mixStep(h: String, k: String): String = {
    val k3 = mul32(rotl(mul32(k, C1), 15), C2)
    val h2 = rotl(xor(h, k3), 13)
    s"((($h2) * 5 + 3864292196) & $MASK)"
  }
  private def charPairs(t: String): String =
    s"list_transform(generate_series(1, length($t) // 2), " +
      s"i -> CAST(unicode(substring($t, 2*i-1, 1)) AS BIGINT) * 65536 + unicode(substring($t, 2*i, 1)))"
  private def tailK(c: String): String = mul32(rotl(mul32(c, C1), 15), C2)
  private def reduceSql(t: String, seed: Long): String =
    s"list_reduce([CAST($seed AS BIGINT)] || ${charPairs(t)}, (h, k) -> ${mixStep("h", "k")})"

  private val Seed1 = 42L
  private val Seed2 = (42 ^ 0x5bd1e995).toLong & MASK
  private val LastChar = "CAST(unicode(substring(t, length(t), 1)) AS BIGINT)"

  /** Shared murmur stages: rows (id, t) → per-row (hhi, hlo) u32
    * halves of StringHash64. `src` must select columns (id, t).
    * `distinct` dedupes (id, hash) — the shingle-SET semantics MinHash
    * needs; SimHash votes over the token MULTISET, so it keeps rows.
    */
  private def murmurCtes(src: String, distinct: Boolean): String =
    s"""r0 AS (SELECT id, t, length(t) AS L,
       |         ${reduceSql("t", Seed1)} AS a1,
       |         ${reduceSql("t", Seed2)} AS a2 FROM $src),
       |r1 AS (SELECT id, L,
       |         CASE WHEN L % 2 = 1 THEN ${xor("a1", tailK(LastChar))} ELSE a1 END AS b1,
       |         CASE WHEN L % 2 = 1 THEN ${xor("a2", tailK(LastChar))} ELSE a2 END AS b2 FROM r0),
       |f0 AS (SELECT id, ${xor("b1", "L")} AS c1, ${xor("b2", "L")} AS c2 FROM r1),
       |f1 AS (SELECT id, ${xor("c1", "c1 >> 16")} AS d1, ${xor("c2", "c2 >> 16")} AS d2 FROM f0),
       |f2 AS (SELECT id, ${mul32("d1", 0x85ebca6bL)} AS e1, ${mul32("d2", 0x85ebca6bL)} AS e2 FROM f1),
       |f3 AS (SELECT id, ${xor("e1", "e1 >> 13")} AS g1, ${xor("e2", "e2 >> 13")} AS g2 FROM f2),
       |f4 AS (SELECT id, ${mul32("g1", 0xc2b2ae35L)} AS i1, ${mul32("g2", 0xc2b2ae35L)} AS i2 FROM f3),
       |hh AS (SELECT ${if (distinct) "DISTINCT " else ""}id, ${xor("i1", "i1 >> 16")} AS hhi, ${xor("i2", "i2 >> 16")} AS hlo FROM f4)""".stripMargin

  // --- 64-bit ops on (hi, lo) halves ---
  private def shr64(h: String, l: String, s: Int): (String, String) =
    (s"(($h) >> $s)",
      s"((($l) >> $s) | ((($h) * ${1L << (32 - s)}) & $MASK))")
  private def mul64(h: String, l: String, c: BigInt): (String, String) = {
    val cl = (c & MASK).toLong
    val chi = ((c >> 32) & MASK).toLong
    val cll = cl & 0xFFFFL
    val clh = (cl >>> 16) & 0xFFFFL
    val p1 = s"(($l) * $cll)"
    val p2 = s"(($l) * $clh)"
    val lowpart = s"((($p1) & $MASK) + ((($p2) & 65535) * 65536))"
    val lo = s"(($lowpart) & $MASK)"
    val carry = s"((($p1) >> 32) + (($p2) >> 16) + (($lowpart) >> 32))"
    val hi = s"((($carry) + ${mul32(h, cl)} + ${mul32(l, chi)}) & $MASK)"
    (hi, lo)
  }
  private def signed64(h: String, l: String): String =
    s"CAST(($h - CASE WHEN $h >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296 + $l AS BIGINT)"

  /** q_dedup_simhash: 64-bit SimHash from per-token votes, 16-bit band
    * blocking, exact Hamming verify ≤ 8 — mirrors
    * `Dedup.simhashDuplicates(documents, maxHamming = 8, seed = 42)`.
    */
  val simhashSql: String = {
    val (xlo, xhi) = ("xor(alo, blo)", "xor(ahi, bhi)")
    s"""WITH d AS (
       |  SELECT doc_id AS id,
       |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
       |         ELSE string_split_regex(trim(regexp_replace(lower(trim(text)), '[ \\t\\n\\v\\f\\r]+', ' ', 'g')), ' ') END AS toks
       |  FROM documents),
       |tok AS (SELECT id, unnest(toks) AS t FROM d),
       |${murmurCtes("tok", distinct = false)},
       |bv AS (SELECT id, g.b,
       |         SUM(CASE WHEN (CASE WHEN g.b < 32 THEN hlo >> g.b ELSE hhi >> (g.b - 32) END) & 1 = 1
       |             THEN 1 ELSE -1 END) AS v
       |       FROM hh, (SELECT unnest(generate_series(0, 63)) AS b) g GROUP BY id, g.b),
       |sh0 AS (SELECT id,
       |         SUM(CASE WHEN b < 32 AND v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS lo,
       |         SUM(CASE WHEN b >= 32 AND v > 0 THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS hi
       |       FROM bv GROUP BY id),
       |sh AS (SELECT d.id, COALESCE(sh0.lo, 0) AS lo, COALESCE(sh0.hi, 0) AS hi
       |       FROM d LEFT JOIN sh0 ON d.id = sh0.id),
       |banded AS (SELECT id, lo, hi, g.band,
       |    CASE g.band WHEN 0 THEN lo & 65535 WHEN 1 THEN lo >> 16
       |                WHEN 2 THEN hi & 65535 ELSE hi >> 16 END AS bandKey
       |  FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band) g),
       |prs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |          a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
       |        FROM banded a JOIN banded b ON a.band = b.band AND a.bandKey = b.bandKey AND a.id < b.id)
       |SELECT id_a, id_b,
       |  CAST(bit_count($xlo) + bit_count($xhi) AS INTEGER) AS hamming
       |FROM prs WHERE bit_count($xlo) + bit_count($xhi) <= 8""".stripMargin
  }

  /** q_dedup_minhash: 64-lane MinHash over distinct shingle hashes,
    * 16 bands × 4 rows blocked by slice content, bucket cap 1000,
    * exact jaccard ≥ 0.2 — mirrors `Dedup.minhashDuplicates(documents,
    * threshold = 0.2, numHashes = 64, bands = 16, shingleSize = 3,
    * seed = 42)`.
    */
  val minhashSql: String = {
    val AddC = BigInt("9e3779b97f4a7c15", 16)
    val M1 = BigInt("bf58476d1ce4e5b9", 16)
    val M2 = BigInt("94d049bb133111eb", 16)
    val K = BigInt("d6e8feb86659fd93", 16)
    val two64 = BigInt(1) << 64
    val lanes = (0 until 64).map { j =>
      val cj = (K * j) % two64
      s"{'j': $j, 'ch': ${(cj >> 32) & MASK}, 'cl': ${cj & MASK}}"
    }.mkString(", ")
    val (s30h, s30l) = shr64("ah", "al", 30)
    val (m1h, m1l) = mul64("ch", "cl", M1)
    val (s27h, s27l) = shr64("dh", "dl", 27)
    val (m2h, m2l) = mul64("eh", "el", M2)
    val (s31h, s31l) = shr64("fh", "fl", 31)
    val addLo = (AddC & MASK).toLong
    val addHi = ((AddC >> 32) & MASK).toLong
    s"""WITH d AS (
       |  SELECT doc_id AS id,
       |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
       |         ELSE string_split_regex(trim(lower(text)), '[ \\t\\n\\v\\f\\r]+') END AS toks
       |  FROM documents),
       |sng AS (
       |  SELECT id, CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
       |    ELSE list_transform(generate_series(1, len(toks) - 2), i -> array_to_string(toks[i:i+2], ' ')) END AS shingles
       |  FROM d),
       |shr AS (SELECT DISTINCT id, unnest(shingles) AS t FROM sng),
       |${murmurCtes("shr", distinct = true)},
       |hset AS (SELECT id, list(${signed64("hhi", "hlo")}) AS hs FROM hh GROUP BY id),
       |lz AS (SELECT id, c.j AS lane, ${xor("hhi", "c.ch")} AS xh, ${xor("hlo", "c.cl")} AS xl
       |       FROM hh, (SELECT unnest([$lanes]) AS c)),
       |z1 AS (SELECT id, lane, ((xh + $addHi + ((xl + $addLo) >> 32)) & $MASK) AS ah,
       |                        ((xl + $addLo) & $MASK) AS al FROM lz),
       |z2 AS (SELECT id, lane, ${xor("ah", s30h)} AS ch, ${xor("al", s30l)} AS cl FROM z1),
       |z3 AS (SELECT id, lane, $m1h AS dh, $m1l AS dl FROM z2),
       |z4 AS (SELECT id, lane, ${xor("dh", s27h)} AS eh, ${xor("dl", s27l)} AS el FROM z3),
       |z5 AS (SELECT id, lane, $m2h AS fh, $m2l AS fl FROM z4),
       |z6 AS (SELECT id, lane, ${xor("fh", s31h)} AS zh, ${xor("fl", s31l)} AS zl FROM z5),
       |sgn AS (SELECT id, lane, ${signed64("zh", "zl")} AS v FROM z6),
       |sig AS (SELECT id, list(mn ORDER BY lane) AS sig
       |        FROM (SELECT id, lane, min(v) AS mn FROM sgn GROUP BY id, lane) GROUP BY id),
       |banded AS (SELECT id, g.band, sig[g.band * 4 + 1 : g.band * 4 + 4] AS bandKey
       |           FROM sig, (SELECT unnest(generate_series(0, 15)) AS band) g),
       |capped AS (SELECT id, band, bandKey FROM (
       |             SELECT id, band, bandKey, row_number() OVER (PARTITION BY band, bandKey ORDER BY id) AS rn
       |             FROM banded) WHERE rn <= 1000),
       |prs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |        FROM capped a JOIN capped b ON a.band = b.band AND a.bandKey = b.bandKey AND a.id < b.id),
       |j AS (SELECT p.id_a, p.id_b,
       |        round(CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
       |              / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))), 6) AS jaccard
       |      FROM prs p JOIN hset x ON x.id = p.id_a JOIN hset y ON y.id = p.id_b)
       |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.2""".stripMargin
  }

  /** Incremental near-dedup ≡ the batch run restricted to pairs whose
    * newer side is in the ingest batch (ids above the median) — the
    * exact-equivalence contract of `Dedup.incrementalNearDedup`, so the
    * oracle is [[minhashSql]] plus one predicate. `floor(max/2)` in
    * double is exact for any plausible id, matching Scala's `max / 2`
    * long division.
    */
  val incrementalNearSql: String =
    minhashSql +
      " AND id_b > (SELECT CAST(floor(max(doc_id) / 2) AS BIGINT) FROM documents)"
}
