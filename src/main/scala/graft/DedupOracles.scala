package graft

/** Independent DuckDB reimplementations of the sketch-based dedup
  * operators, promoting dedup_simhash / dedup_minhash_pairs /
  * dedup_minhash from rows-only checks to full value-hash oracles.
  *
  * Both sketches are deterministic, so they ARE SQL-expressible once
  * the two hash kernels are rebuilt in the oracle engine:
  *
  *  - FNV-1a 64 (simhash token hash): byte fold in HUGEINT mod 2^64 —
  *    same technique the text_fingerprint oracle validated bit-for-bit.
  *  - Spark's xxhash64 (minhash shingle hash): full XXH64 (seed 42)
  *    staged as vectorized CTE columns. 64x64-bit products overflow
  *    even HUGEINT, so multiplication is split-32 modular:
  *    a*b mod 2^64 = (lo32(a)*b + (hi32(a)*b mod 2^32)*2^32) mod 2^64,
  *    and rotl(x,r) = (x*2^r mod 2^64) + (x >> (64-r)) (disjoint bits,
  *    so + is |). Validated against
  *    o.a.s.sql.catalyst.expressions.XXH64 on ASCII, multi-byte and
  *    empty inputs before wiring in.
  *
  * The expensive per-gram hash runs once per DISTINCT gram (row-wise,
  * vectorized) rather than per occurrence in a nested lambda — the
  * lambda formulation was ~430x slower in DuckDB 1.0.
  *
  * The minhash permutation coefficients are inlined from
  * [[graft.operators.Dedup.coeffs]] at SQL-build time, so oracle and
  * operator can never drift. Banding is mirrored as slice equality
  * (the operator buckets on xxhash64 of the slice; a 64-bit band-hash
  * collision is the only way they could differ). Connected components
  * is a recursive-CTE reachability closure, equivalent to the
  * operator's converged min-label propagation.
  */
object DedupOracles {

  // ------------------------------------------------- HUGEINT bit kit

  private val M64 = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
  private val M32 = "4294967296"
  private val P1 = "CAST('11400714785074694791' AS HUGEINT)"
  private val P2 = "CAST('14029467366897019727' AS HUGEINT)"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  /** (a*b) mod 2^64 without 128-bit overflow (split-32 schoolbook). */
  private def mulmod(a: String, b: String): String =
    s"((($a) % $M32) * ($b) + (((($a) // $M32) * ($b)) % $M32) * $M32) % $M64"

  // BigInt on both shift constants: 1L << 63 would overflow Long for
  // r = 1 (the merge-round rotation) and emit a NEGATIVE divisor
  private def rotl(x: String, r: Int): String =
    s"((($x) * ${BigInt(1) << r}) % $M64 + ($x) // ${BigInt(1) << (64 - r)})"

  /** CTE chain computing `hu` = unsigned XXH64 (seed 42) of the 8-byte
    * little-endian value of BIGINT column `valCol`, carried alongside
    * `keepCols`, reading from CTE `src`, ending in CTE `xh(keepCols,
    * hu)`. Mirrors o.a.s.sql.catalyst.expressions.XXH64.hashLong
    * step-for-step (len-8 tail round + avalanche) — validated against
    * an independent python XXH64 and the Spark expression itself
    * (OlapQueriesSpec "portable hll hash kernel").
    */
  def xxh64LongCtes(src: String, keepCols: String, valCol: String): String =
    s"""xu AS (
       | SELECT $keepCols, ((CAST($valCol AS HUGEINT) % $M64) + $M64) % $M64 AS ux
       | FROM $src
       |), xk AS (
       | SELECT $keepCols, ${mulmod(rotl(mulmod("ux", P2), 31), P1)} AS k1 FROM xu
       |), xh0 AS (
       | SELECT $keepCols, xor((42 + $P5 + 8) % $M64, k1) AS h FROM xk
       |), xh1 AS (
       | SELECT $keepCols, (${mulmod(rotl("h", 27), P1)} + $P4) % $M64 AS h FROM xh0
       |), xf1 AS (SELECT $keepCols, xor(h, h // 8589934592) AS h FROM xh1
       |), xf2 AS (SELECT $keepCols, ${mulmod("h", P2)} AS h FROM xf1
       |), xf3 AS (SELECT $keepCols, xor(h, h // 536870912) AS h FROM xf2
       |), xf4 AS (SELECT $keepCols, ${mulmod("h", P3)} AS h FROM xf3
       |), xh AS (SELECT $keepCols, xor(h, h // 4294967296) AS hu FROM xf4)"""
      .stripMargin

  /** CTE chain computing `hu` = unsigned XXH64 (seed 42) of the UTF-8
    * BYTES of string column `strCol` — the VARIABLE-LENGTH kernel
    * (Spark's `xxhash64` over a string), generalizing [[xxh64LongCtes]]
    * beyond the fixed 8-byte long case. Reads from CTE `src`, carries
    * `keepCols`, ends in CTE `xh(keepCols, hu)`.
    *
    * Structure mirrors the public XXH64 spec step-for-step:
    *  - >=32-byte inputs fold 32-byte stripes through 4 accumulator
    *    lanes; lanes are INDEPENDENT across stripes, so each is its own
    *    `list_reduce` over that lane's 8-byte words (no struct-typed
    *    accumulator needed), then the rotl-sum + 4 merge rounds;
    *  - <32-byte inputs start at seed + P5;
    *  - the tail runs up to three 8-byte rounds, one 4-byte round and
    *    up to three 1-byte rounds, exactly in that order;
    *  - the final avalanche is shared with the long kernel.
    *
    * Bytes come from the hex of `encode()` (the technique the
    * text_fingerprint oracle validated bit-for-bit); 64-bit words
    * assemble little-endian via a reversed reduce (acc*256+b keeps all
    * intermediates < 2^72, well inside HUGEINT).
    */
  def xxh64BytesCtes(src: String, keepCols: String, strCol: String): String = {
    val hexB = (i: String) =>
      s"(CAST((strpos('0123456789abcdef', substring(hx, CAST(2*($i)+1 AS BIGINT), 1)) - 1) * 16 " +
        s"+ (strpos('0123456789abcdef', substring(hx, CAST(2*($i)+2 AS BIGINT), 1)) - 1) AS HUGEINT))"
    // little-endian word of the w bytes at 0-based offset o
    def word(o: String, w: Int) =
      s"list_reduce(list_reverse(list_slice(bs, CAST(($o)+1 AS BIGINT), CAST(($o)+$w AS BIGINT))), (a, x) -> a * 256 + x)"
    def addmod(a: String, b: String) = s"((($a) + ($b)) % $M64)"
    // one stripe round: acc' = rotl31(acc + w*P2) * P1
    def round(acc: String, w: String) =
      mulmod(rotl(addmod(acc, mulmod(w, P2)), 31), P1)
    def round0(v: String) = mulmod(rotl(mulmod(v, P2), 31), P1)
    // lane fold: init_i folded through this lane's word per stripe
    def lane(i: Int, init: String) =
      s"list_reduce(list_prepend($init, list_transform(range(0, n // 32), " +
        s"s -> ${word(s"32*s + ${8 * (i - 1)}", 8)})), (acc, w) -> ${round("acc", "w")})"
    val inits = Seq(
      s"(42 + $P1 + $P2) % $M64",              // v1
      s"(42 + $P2) % $M64",                    // v2
      s"CAST(42 AS HUGEINT)",                  // v3
      s"($M64 + 42 - $P1) % $M64")             // v4 (seed - P1, kept unsigned)
    def mergeRound(h: String, v: String) =
      s"((${mulmod(s"xor($h, ${round0(v)})", P1)} + $P4) % $M64)"
    val rotlSum =
      s"((${rotl("v1", 1)} + ${rotl("v2", 7)} + ${rotl("v3", 12)} + ${rotl("v4", 18)}) % $M64)"
    val merged = Seq("v1", "v2", "v3", "v4").foldLeft(rotlSum)(mergeRound)
    s"""bx AS (
       | SELECT $keepCols, lower(to_hex(encode($strCol))) AS hx,
       |  CAST(octet_length(encode($strCol)) AS BIGINT) AS n
       | FROM $src
       |), bb AS (
       | SELECT $keepCols, n,
       |  list_transform(range(0, n), i -> ${hexB("i")}) AS bs
       | FROM bx
       |), blanes AS (
       | SELECT $keepCols, n, bs,
       |  ${lane(1, inits(0))} AS v1, ${lane(2, inits(1))} AS v2,
       |  ${lane(3, inits(2))} AS v3, ${lane(4, inits(3))} AS v4
       | FROM bb
       |), bh0 AS (
       | SELECT $keepCols, n, bs,
       |  ((CASE WHEN n >= 32 THEN $merged ELSE (42 + $P5) % $M64 END) + n) % $M64 AS h
       | FROM blanes
       |), bh8 AS ( -- up to three tail 8-byte rounds
       | SELECT $keepCols, n, bs,
       |  list_reduce(list_prepend(h, list_transform(range(0, (n % 32) // 8),
       |    k -> ${word("32*(n // 32) + 8*k", 8)})),
       |   (h, w) -> (${mulmod(s"${rotl(s"xor(h, ${round0("w")})", 27)} % $M64", P1)} + $P4) % $M64) AS h
       | FROM bh0
       |), bh4 AS ( -- one tail 4-byte round when n%8 >= 4
       | SELECT $keepCols, n, bs,
       |  CASE WHEN n % 8 >= 4
       |   THEN (${mulmod(s"${rotl(s"xor(h, ${mulmod(word("n - (n % 8)", 4), P1)})", 23)} % $M64", P2)} + $P3) % $M64
       |   ELSE h END AS h
       | FROM bh8
       |), bh1 AS ( -- up to three tail 1-byte rounds
       | SELECT $keepCols, n,
       |  list_reduce(list_prepend(h, list_transform(range(n - (n % 4), n),
       |    j -> bs[CAST(j + 1 AS BIGINT)])),
       |   (h, b) -> ${mulmod(s"${rotl(s"xor(h, ${mulmod("b", P5)})", 11)} % $M64", P1)}) AS h
       | FROM bh4
       |), bf1 AS (SELECT $keepCols, xor(h, h // 8589934592) AS h FROM bh1
       |), bf2 AS (SELECT $keepCols, ${mulmod("h", P2)} AS h FROM bf1
       |), bf3 AS (SELECT $keepCols, xor(h, h // 536870912) AS h FROM bf2
       |), bf4 AS (SELECT $keepCols, ${mulmod("h", P3)} AS h FROM bf3
       |), xh AS (SELECT $keepCols, xor(h, h // 4294967296) AS hu FROM bf4)"""
      .stripMargin
  }

  // ---------------------------------------------------------- corpus

  /** Same planted-duplicate construction as [[DedupQueries.corpus]]. */
  private[graft] val corpusSql: String =
    """corpus AS (
      | SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      | UNION ALL
      | SELECT doc_id + 2000000, regexp_replace(text, '^\S+\s+\S+\s+', '')
      | FROM documents WHERE doc_id % 10 = 5
      |)""".stripMargin

  // --------------------------------------------------------- simhash

  /** ASCII whitespace class of SimHash64.isWs (space TAB LF CR FF VT —
    * VT spelled \u000b so no reader mistakes it for a missing member).
    */
  private val wsClass: String = "[ \t\n\r\f\u000b]+"

  /** FNV-1a 64 of token t's UTF-8 bytes, as unsigned HUGEINT. */
  private val fnvTokenSql: String = {
    val bytes = "list_transform(range(1, CAST(octet_length(encode(t)) AS BIGINT) + 1), " +
      "i -> CAST((strpos('0123456789abcdef', substring(lower(to_hex(encode(t))), CAST(2*i-1 AS BIGINT), 1)) - 1) * 16 " +
      "+ (strpos('0123456789abcdef', substring(lower(to_hex(encode(t))), CAST(2*i AS BIGINT), 1)) - 1) AS HUGEINT))"
    s"list_reduce(list_prepend(CAST('14695981039346656037' AS HUGEINT), $bytes), " +
      "(acc, x) -> (xor(acc, x) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT))"
  }

  private def voteSql(b: String): String =
    s"list_sum(list_transform(hh, h -> CASE WHEN ((h >> CAST($b AS UBIGINT)) & 1) = 1 THEN 1 ELSE -1 END))"

  /** Pairs within hamming<=3 over the full signature cross set — the
    * operator's 4x16-bit banding is lossless there by pigeonhole, so
    * the unbanded recompute doubles as a losslessness proof.
    * sh must collapse to BIGINT before bit_count(xor(..)): in HUGEINT
    * a negative signature carries 64 extra sign bits and every
    * negative-signature pair silently fails the hamming test.
    */
  val simhashSql: String =
    s"""WITH $corpusSql, toks AS (
       | SELECT doc_id, list_filter(
       |   regexp_split_to_array(lower(text), '$wsClass'), t -> t <> '') AS tk
       | FROM corpus
       |), hs AS (
       | SELECT doc_id, list_transform(tk, t -> CAST($fnvTokenSql AS UBIGINT)) AS hh FROM toks
       |), sig AS (
       | SELECT doc_id,
       |  CAST(list_sum(list_transform(range(0, 63),
       |    b -> CASE WHEN ${voteSql("b")} >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
       |   + CASE WHEN ${voteSql("63")} >= 0 THEN -9223372036854775808 ELSE 0 END AS BIGINT) AS sh
       | FROM hs
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  // --------------------------------------------------------- minhash

  /** XXH64(seed=42) staged row-wise over distinct grams `gd(g)` →
    * ghash(g, x32) where x32 is the operator's 32-bit fold
    * ((h >>> 32) ^ h) & 0xFFFFFFFF.
    */
  private val xxhStagesSql: String = {
    val pow8 = "[1,256,65536,16777216,4294967296,1099511627776,281474976710656,72057594037927936]"
    val read8 = s"list_sum(list_transform(range(0, 8), i8 -> bs[CAST(j8*8 + i8 + 1 AS BIGINT)] * CAST($pow8[CAST(i8+1 AS BIGINT)] AS HUGEINT)))"
    val k1 = mulmod(rotl(mulmod(read8, P2), 31), P1)
    val step8 = s"(${mulmod(rotl(s"xor(acc8, $k1)", 27), P1)} + $P4) % $M64"
    val read4 = "list_sum(list_transform(range(0, 4), i4 -> bs[CAST((n // 8) * 8 + i4 + 1 AS BIGINT)] * CAST([1,256,65536,16777216][CAST(i4+1 AS BIGINT)] AS HUGEINT)))"
    val h4 = s"(${mulmod(rotl(s"xor(h8, ${mulmod(read4, P1)})", 23), P2)} + $P3) % $M64"
    val stepT = mulmod(rotl(s"xor(accT, (bs[CAST(jT + 1 AS BIGINT)] * $P5) % $M64)", 11), P1)
    s"""gb AS (
       | SELECT g, lower(to_hex(encode(g))) AS hx, CAST(octet_length(encode(g)) AS BIGINT) AS n FROM gd
       |), gbytes AS (
       | SELECT g, n, list_transform(range(1, n + 1),
       |   i -> CAST((strpos('0123456789abcdef', hx[CAST(2*i-1 AS BIGINT)]) - 1) * 16
       |        + (strpos('0123456789abcdef', hx[CAST(2*i AS BIGINT)]) - 1) AS HUGEINT)) AS bs
       | FROM gb
       |), s8 AS (
       | SELECT g, n, bs, list_reduce(list_prepend((42 + $P5 + n) % $M64, range(0, n // 8)),
       |   (acc8, j8) -> $step8) AS h8
       | FROM gbytes
       |), s4 AS (
       | SELECT g, n, bs, CASE WHEN n % 8 >= 4 THEN $h4 ELSE h8 END AS h4
       | FROM s8
       |), st AS (
       | SELECT g, list_reduce(list_prepend(h4, range((n // 8) * 8 + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END, n)),
       |   (accT, jT) -> $stepT) AS ht
       | FROM s4
       |), sav1 AS (SELECT g, ${mulmod("xor(ht, ht // 8589934592)", P2)} AS h FROM st
       |), sav2 AS (SELECT g, ${mulmod("xor(h, h // 536870912)", P3)} AS h FROM sav1
       |), ghash AS (
       | SELECT g, CAST(xor(xor(h, h // 4294967296) // 4294967296, xor(h, h // 4294967296) % 4294967296) AS BIGINT) AS x32
       | FROM sav2
       |)""".stripMargin
  }

  /** corpus → per-doc 128-long minhash signature arrays, coefficients
    * inlined from the operator.
    */
  private val sigsSql: String = {
    val cs = graft.operators.Dedup.coeffs(128)
    val aList = cs.map(_._1).mkString("[", ",", "]")
    val bList = cs.map(_._2).mkString("[", ",", "]")
    s"""WITH $corpusSql, dg AS (
       | SELECT doc_id, unnest(list_transform(range(1, greatest(length(text) - 4, 1) + 1),
       |   p -> substring(text, CAST(p AS BIGINT), 5))) AS g
       | FROM corpus
       |), gd AS (SELECT DISTINCT g FROM dg
       |), $xxhStagesSql, dx AS (
       | SELECT DISTINCT d.doc_id, h.x32 FROM dg d JOIN ghash h USING (g)
       |), mins AS (
       | SELECT doc_id, j, min(($aList[CAST(j AS BIGINT)] * x32 + $bList[CAST(j AS BIGINT)]) % ${graft.operators.Dedup.MinhashPrime}) AS mh
       | FROM dx CROSS JOIN (SELECT unnest(range(1, 129)) AS j)
       | GROUP BY doc_id, j
       |), sigs AS (
       | SELECT doc_id, list(mh ORDER BY j) AS sig FROM mins GROUP BY doc_id
       |)""".stripMargin
  }

  private val estSql: String =
    """CAST(list_sum(list_transform(range(1, 129),
      |    j -> CASE WHEN a.sig[CAST(j AS BIGINT)] = b.sig[CAST(j AS BIGINT)] THEN 1 ELSE 0 END)) AS DOUBLE) / 128""".stripMargin

  /** Candidate pairs by banded EQUI-join (each signature explodes into
    * its 32 four-hash band slices, serialized as join keys) — the
    * operator's own candidate generation, O(bucket occupancy) instead
    * of the all-pairs O(n²) filter that made the sf0.1 suite run crawl.
    * sigs/cand are MATERIALIZED: each is referenced twice and DuckDB
    * would otherwise recompute the whole signature pipeline per
    * reference.
    */
  private val bandedSql: String =
    """banded AS (
      | SELECT doc_id, unnest(list_transform(range(0, 32),
      |   k -> CAST(k AS VARCHAR) || ':' ||
      |        array_to_string(sig[CAST(k*4+1 AS BIGINT):CAST(k*4+4 AS BIGINT)], ','))) AS bk
      | FROM sigs
      |)""".stripMargin

  private val pairsSql: String =
    s"""$bandedSql, cand AS MATERIALIZED (
       | SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       | FROM banded l JOIN banded r ON l.bk = r.bk AND l.doc_id < r.doc_id
       |), pairs AS (
       | SELECT doc_a, doc_b, $estSql AS est_jaccard
       | FROM cand
       |  JOIN sigs a ON a.doc_id = doc_a
       |  JOIN sigs b ON b.doc_id = doc_b
       | WHERE $estSql >= 0.5
       |)""".stripMargin

  private val sigsMat: String =
    sigsSql.replaceFirst("\\), sigs AS \\(", "), sigs AS MATERIALIZED (")

  val minhashPairsSql: String =
    s"""$sigsMat, $pairsSql
       |SELECT doc_a, doc_b, est_jaccard FROM pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** C2c: the INCREMENTAL candidate join — planted replicas
    * (doc_id >= 1e6) as the incoming batch against the base documents
    * as the store; only CROSS-side band hits pair, replaying
    * Dedup.minhashPairsAgainst's daily-increment shape on the same
    * signature chain.
    */
  val minhashIncrSql: String =
    s"""$sigsMat, $bandedSql, candx AS MATERIALIZED (
       | SELECT DISTINCT l.doc_id AS doc_id, r.doc_id AS store_id
       | FROM banded l JOIN banded r ON l.bk = r.bk
       |  AND l.doc_id >= 1000000 AND r.doc_id < 1000000
       |)
       |SELECT candx.doc_id, candx.store_id, $estSql AS est_jaccard
       |FROM candx
       | JOIN sigs a ON a.doc_id = candx.doc_id
       | JOIN sigs b ON b.doc_id = candx.store_id
       |WHERE $estSql >= 0.5
       |ORDER BY candx.doc_id, candx.store_id""".stripMargin

  /** Cluster labels: reachability closure (recursive CTE) over the
    * thresholded pair list; label = min reachable id, matching the
    * operator's converged min-propagation.
    */
  /** C39: the minhash candidate chain (sigsMat + pairsSql, est >= 0.5)
    * re-verified with EXACT gram Jaccard over the raw gram STRINGS —
    * proving both the composition and (as in dedup_ngram_jaccard) the
    * collision-freedom of the operator's hashed-gram verification.
    */
  val minhashVerifiedSql: String =
    s"""$sigsMat, $pairsSql, dxg AS MATERIALIZED (
       | SELECT DISTINCT doc_id, g FROM dg
       |), gsz AS (
       | SELECT doc_id, count(*) AS n FROM dxg GROUP BY 1
       |), inter AS (
       | SELECT p.doc_a, p.doc_b, p.est_jaccard, count(*) AS i
       | FROM pairs p
       |  JOIN dxg ga ON ga.doc_id = p.doc_a
       |  JOIN dxg gb ON gb.doc_id = p.doc_b AND gb.g = ga.g
       | GROUP BY 1, 2, 3
       |)
       |SELECT i.doc_a, i.doc_b, i.est_jaccard,
       | CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard
       |FROM inter i
       | JOIN gsz sa ON sa.doc_id = i.doc_a
       | JOIN gsz sb ON sb.doc_id = i.doc_b
       |WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  val minhashClustersSql: String =
    s"""${sigsMat.replaceFirst("WITH ", "WITH RECURSIVE ")}, $pairsSql, edges AS (
       | SELECT doc_a AS a, doc_b AS b FROM pairs
       | UNION ALL
       | SELECT doc_b, doc_a FROM pairs
       |), reach AS (
       | SELECT a, b FROM edges
       | UNION
       | SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |)
       |SELECT a AS doc_id, min(least(a, b)) AS cluster_id
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** Cluster-representative selection (C26): the cluster closure above
    * extended with the portable quality kernel (the sample_weighted
    * construction, over the corpus) and a per-cluster quality-argmax.
    * Singletons (docs in no pair) label themselves via the LEFT JOIN —
    * matching Dedup.keepBest exactly.
    *
    * A `def`, and the stopword regex comes from TextFunctions directly:
    * a `val` interpolating TextQueries.stopRe deadlocked object
    * initialization (DedupQueries.oracles -> this -> TextQueries ->
    * DedupOracles, mid-init) and silently produced a NULL oracle.
    */
  private def stopReEn: String =
    s"\\b(${graft.functions.TextFunctions.stopwords.head._2})\\b"

  def keepBestSql: String =
    s"""${sigsMat.replaceFirst("WITH ", "WITH RECURSIVE ")}, $pairsSql, edges AS (
       | SELECT doc_a AS a, doc_b AS b FROM pairs
       | UNION ALL
       | SELECT doc_b, doc_a FROM pairs
       |), reach AS (
       | SELECT a, b FROM edges
       | UNION
       | SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |), clusters AS (
       | SELECT a AS doc_id, min(least(a, b)) AS cluster_id FROM reach GROUP BY a
       |), qbase AS (
       | SELECT doc_id, length(text) AS n_chars,
       |  length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
       |  length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS n_ws,
       |  CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       |  len(regexp_extract_all(lower(text), '$stopReEn')) AS n_stop
       | FROM corpus
       |), qual AS (
       | SELECT doc_id,
       |  0.4 * (CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / n_chars END)
       |   + 0.3 * least(1.0, (CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_chars - n_ws AS DOUBLE) / n_tokens END) / 8.0)
       |   + 0.3 * least(1.0, (CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tokens END) * 5.0) AS quality
       | FROM qbase
       |), lab AS (
       | SELECT q.doc_id, coalesce(c.cluster_id, q.doc_id) AS cluster_id, q.quality
       | FROM qual q LEFT JOIN clusters c USING (doc_id)
       |), ranked AS (
       | SELECT *, row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY quality DESC, doc_id) AS rn,
       |  count(*) OVER (PARTITION BY cluster_id) AS n_members
       | FROM lab)
       |SELECT cluster_id, doc_id AS keeper,
       | CAST(n_members AS BIGINT) AS n_members, quality AS best_quality
       |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin
}
