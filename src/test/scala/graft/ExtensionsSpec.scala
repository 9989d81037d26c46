package graft

import org.apache.spark.sql.functions._
import graft.functions.Fnv1a64
import graft.operators.{Dedup, Similarity}

class GraftExtensionsSpec extends SparkFunSuite {

  test("fnv1a64 is callable from SQL after install") {
    GraftCatalog.registerTables(spark, sf)
    val viaSql = spark.sql(
      "SELECT doc_id, fnv1a64(text) AS fp FROM documents ORDER BY doc_id LIMIT 20")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = Tables.documents(spark, sf).limit(20)
      .select(col("doc_id"), Fnv1a64.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }

  test("empty/notEmpty work on strings AND arrays; JSONExtractString defaults to ''") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT empty('') AS e1, empty('x') AS e2,
        |  empty(array()) AS e3, notEmpty(array(1)) AS e4,
        |  JSONExtractString('{"a":"v"}', 'a') AS j1,
        |  JSONExtractString('{"a":"v"}', 'missing') AS j2""".stripMargin)
      .head()
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
    assert(r.getString(4) == "v")
    assert(r.getString(5) == "") // CH default-value contract, not NULL
  }

  test("tier-4 CH functions: arrays, multiIf, temporal extractors, dateDiff") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT
        |  arrayMap(x -> x * 2, array(1, 2, 3)) AS m,
        |  arrayFilter(x -> x > 1, array(1, 2, 3)) AS f,
        |  arraySum(array(1.5, 2.5)) AS s,
        |  arrayDistinct(array(1, 1, 2)) AS dist,
        |  arrayUniq(array(1, 1, 2)) AS uq,
        |  arraySlice(array(10, 20, 30, 40), 2, 2) AS sl,
        |  arraySlice(array(10, 20, 30, 40), 3) AS sl2,
        |  indexOf(array('a', 'b'), 'b') AS idx,
        |  arrayStringConcat(array('a', 'b'), '-') AS asc1,
        |  splitByChar(',', 'a,b,c') AS sp,
        |  multiIf(1 > 2, 'x', 2 > 1, 'y', 'z') AS mi,
        |  toDayOfWeek(TIMESTAMP '2024-01-01 10:00:00') AS dow,
        |  toYYYYMMDD(TIMESTAMP '2024-01-02 10:00:00') AS ymd,
        |  toHour(TIMESTAMP '2024-01-01 10:30:00') AS hh,
        |  timestampdiff(DAY, TIMESTAMP '2024-01-01 00:00:00',
        |           TIMESTAMP '2024-01-03 00:00:00') AS dd,
        |  intDiv(7, 2) AS idiv, modulo(7, 2) AS md""".stripMargin).head()
    assert(r.getSeq[Int](0) == Seq(2, 4, 6))
    assert(r.getSeq[Int](1) == Seq(2, 3))
    assert(r.getDouble(2) == 4.0)
    assert(r.getSeq[Int](3) == Seq(1, 2))
    assert(r.getInt(4) == 2)
    assert(r.getSeq[Int](5) == Seq(20, 30))
    assert(r.getSeq[Int](6) == Seq(30, 40))
    assert(r.getLong(7) == 2L)
    assert(r.getString(8) == "a-b")
    assert(r.getSeq[String](9) == Seq("a", "b", "c"))
    assert(r.getString(10) == "y")
    assert(r.getInt(11) == 1)      // 2024-01-01 is a Monday
    assert(r.getInt(12) == 20240102)
    assert(r.getInt(13) == 10)
    assert(r.getLong(14) == 2L)
    assert(r.getLong(15) == 3L && r.getInt(16) == 1)
  }

  test("vector compat: arrayDotProduct, cosineDistance, L2Distance") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT
        |  arrayDotProduct(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dp,
        |  cosineDistance(array(1.0, 0.0), array(1.0, 0.0)) AS cd0,
        |  cosineDistance(array(1.0, 0.0), array(0.0, 1.0)) AS cd1,
        |  L2Distance(array(0.0, 0.0), array(3.0, 4.0)) AS l2""".stripMargin)
      .head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 5.0)
  }

  test("aggregate compat: quantiles, medianExact, uniqCombined, groupBit*") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT quantiles(x, 0.0, 0.5, 1.0) AS qs, medianExact(x) AS med,
        |  uniqCombined(x) AS uc,
        |  groupBitAnd(x) AS ba, groupBitOr(x) AS bo, groupBitXor(x) AS bx
        |FROM (SELECT explode(array(1, 2, 3, 4, 5)) AS x)""".stripMargin)
      .head()
    assert(r.getSeq[Double](0) == Seq(1.0, 3.0, 5.0))
    assert(r.getDouble(1) == 3.0)
    // weighted exact quantile: weights stretch the value multiset
    val w = spark.sql(
      """SELECT quantileExactWeighted(x, w) AS med
        |FROM VALUES (1, 1), (2, 1), (10, 8) AS t(x, w)""".stripMargin).head()
    assert(w.getDouble(0) == 10.0)

    // single partition -> deterministic collect order for the moving aggs
    val mv = spark.sql(
      """SELECT groupArrayMovingSum(x) AS ms, groupArrayMovingAvg(x) AS ma
        |FROM (SELECT x FROM VALUES (1), (2), (3) AS t(x) ORDER BY x
        |      LIMIT 10)""".stripMargin).head()
    assert(mv.getSeq[Double](0) == Seq(1.0, 3.0, 6.0))
    assert(mv.getSeq[Double](1) == Seq(1.0, 1.5, 2.0))
    assert(r.getLong(2) == 5L)
    assert(r.getInt(3) == (1 & 2 & 3 & 4 & 5))
    assert(r.getInt(4) == (1 | 2 | 3 | 4 | 5))
    assert(r.getInt(5) == (1 ^ 2 ^ 3 ^ 4 ^ 5))
  }

  test("uniqState/uniqMerge: per-partition sketches reaggregate to the global estimate") {
    GraftCatalog.registerTables(spark, sf)
    // per-day sketch states (the AggregatingMergeTree write path) ...
    spark.sql(
      """SELECT ts_us - ts_us % 86400000000 AS d, uniqState(user_id) AS st
        |FROM events GROUP BY 1""".stripMargin)
      .createOrReplaceTempView("daily_states")
    // ... merged later WITHOUT the raw events
    val merged = spark.sql(
      "SELECT uniqMerge(st) AS u FROM daily_states").head().getLong(0)
    val direct = spark.sql(
      "SELECT CAST(uniqExact(user_id) AS BIGINT) AS u FROM events")
      .head().getLong(0)
    // datasketches HLL at lgK=12 is exact-ish at this cardinality
    assert(math.abs(merged - direct) <= math.max(1L, direct / 20),
      s"merged=$merged direct=$direct")
  }

  test("full OLAP surface reachable via spark.sql on registered views") {
    GraftCatalog.registerTables(spark, sf)
    val top = spark.sql(
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
    assert(top.nonEmpty && top.map(_.getLong(1)).sum ==
      Tables.lineitem(spark, sf).count())
  }

  test("CH array function batch: min/max/avg, predicates, difference/cumsum/compact/enumerate, zip, reduce") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT
        |  arrayMin(array(3, 1, 2)) AS mn,
        |  arrayMax(array(3, 1, 2)) AS mx,
        |  arrayAvg(array(1, 2, 3)) AS av,
        |  arrayCount(x -> x > 1, array(1, 2, 3)) AS cnt,
        |  arrayExists(x -> x = 2, array(1, 2, 3)) AS ex,
        |  arrayAll(x -> x > 0, array(1, 2, 3)) AS al,
        |  arrayDifference(array(1, 4, 2)) AS dif,
        |  arrayCumSum(array(1, 2, 3)) AS cs,
        |  arrayCompact(array(1, 1, 2, 2, 1)) AS cp,
        |  arrayEnumerate(array(9, 9, 9)) AS en,
        |  arrayEnumerate(array()) AS en0,
        |  arrayFlatten(array(array(1), array(2, 3))) AS fl,
        |  arrayReduce('sum', array(1, 2, 3)) AS rsum,
        |  arrayReduce('uniqExact', array(1, 1, 2)) AS runiq""".stripMargin)
      .head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 3)
    assert(r.getDouble(2) == 2.0)
    assert(r.getInt(3) == 2)
    assert(r.getBoolean(4) && r.getBoolean(5))
    assert(r.getSeq[Int](6) == Seq(0, 3, -2))
    assert(r.getSeq[Double](7) == Seq(1.0, 3.0, 6.0))
    assert(r.getSeq[Int](8) == Seq(1, 2, 1))
    assert(r.getSeq[Int](9) == Seq(1, 2, 3))
    assert(r.getSeq[Int](10) == Seq.empty)
    assert(r.getSeq[Int](11) == Seq(1, 2, 3))
    assert(r.getDouble(12) == 6.0)
    assert(r.getInt(13) == 2)
  }

  test("round-14 compat batch: editDistance, IPv4NumToString/StringToNum") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT editDistance('kitten', 'sitting') AS d1,
        |       editDistance('flaw', 'lawn') AS d2,
        |       IPv4NumToString(3232235777) AS ip,
        |       IPv4StringToNum('192.168.1.1') AS n,
        |       IPv4StringToNum('300.1.1.1') AS bad
        |FROM range(1)""".stripMargin).head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 2)
    assert(r.getString(2) == "192.168.1.1" && r.getLong(3) == 3232235777L)
    assert(r.isNullAt(4)) // strict parse: out-of-range octet → NULL
    val f = spark.sql(
      """SELECT arrayFold((acc, x) -> acc + x, array(1, 2, 3, 4), 0) AS s,
        |       arrayFold((acc, x) -> greatest(acc, x), array(3, 9, 2), -1) AS m,
        |       arrayFold((acc, x) -> concat(acc, x), array('a','b','c'), '') AS c
        |FROM range(1)""".stripMargin).head()
    assert(f.getInt(0) == 10 && f.getInt(1) == 9 && f.getString(2) == "abc")
  }

  test("round-5 compat batch: uniqUpTo, bitCount, hex/unhex, MD5, JSON family") {
    GraftCatalog.registerTables(spark, sf)
    val agg = spark.sql(
      """SELECT uniqUpTo(event_type, 2) AS capped,
        |       uniqUpTo(event_type, 100) AS exact_n,
        |       uniqExact(event_type) AS truth
        |FROM events""".stripMargin).head()
    assert(agg.getLong(0) == 3L) // capped at n+1
    assert(agg.getLong(1) == agg.getLong(2))

    val r = spark.sql(
      """SELECT bitCount(7) AS bc,
        |  hex('AB') AS hx, CAST(unhex('4142') AS STRING) AS uh,
        |  MD5('abc') AS md,
        |  JSONHas('{"a":1}', 'a') AS h1, JSONHas('{"a":1}', 'b') AS h2,
        |  JSONExtractBool('{"a":true}', 'a') AS b1,
        |  JSONExtractBool('{"a":true}', 'missing') AS b2,
        |  JSONLength('{"a":[1,2,3]}', 'a') AS jl,
        |  JSONLength('{"a":1}', 'a') AS jl0,
        |  JSONExtractRaw('{"a":{"b":1}}', 'a') AS raw""".stripMargin).head()
    assert(r.getInt(0) == 3)
    assert(r.getString(1) == "4142" && r.getString(2) == "AB")
    assert(r.getString(3) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getBoolean(4) && !r.getBoolean(5))
    assert(r.getBoolean(6) && !r.getBoolean(7))
    assert(r.getInt(8) == 3 && r.getInt(9) == 0)
    assert(r.getString(10) == """{"b":1}""")

    val a = spark.sql(
      """SELECT arrayIntersect(array(1, 2, 3), array(2, 3, 4)) AS ai,
        |  arrayPushBack(array(1, 2), 3) AS pb,
        |  arrayPushFront(array(2, 3), 1) AS pf,
        |  arrayPopBack(array(1, 2, 3)) AS qb,
        |  arrayPopFront(array(1, 2, 3)) AS qf,
        |  arrayPopBack(array()) AS qe,
        |  range(3) AS rg, range(0) AS rg0""".stripMargin).head()
    assert(a.getSeq[Int](0).sorted == Seq(2, 3))
    assert(a.getSeq[Int](1) == Seq(1, 2, 3))
    assert(a.getSeq[Int](2) == Seq(1, 2, 3))
    assert(a.getSeq[Int](3) == Seq(1, 2))
    assert(a.getSeq[Int](4) == Seq(2, 3))
    assert(a.getSeq[Int](5) == Seq.empty)
    assert(a.getSeq[Int](6) == Seq(0, 1, 2))
    assert(a.getSeq[Int](7) == Seq.empty)
  }
}

class ConnectedComponentsSpec extends SparkFunSuite {
  import spark.implicits._

  test("min-propagation finds components on a known graph") {
    // components: {1,2,3,4}, {10,11}, {20,21,22}; 4 connects via chain
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("minhash clusters group each planted duplicate with its source") {
    val clusters = Dedup.minhashClusters(
        DedupQueries.corpus(spark, sf), "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Tables.documents(spark, sf).filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).foreach { id =>
        assert(clusters.get(id + 1000000).contains(clusters(id)),
          s"exact copy of $id not in its cluster")
      }
    Tables.documents(spark, sf).filter(col("doc_id") % 10 === 5)
      .select("doc_id").collect().map(_.getLong(0)).foreach { id =>
        assert(clusters.get(id + 2000000).contains(clusters(id)),
          s"near copy of $id not in its cluster")
      }
  }
}

class TopKAggSpec extends SparkFunSuite {

  test("aggregator top-k equals the window-function top-k exactly") {
    val corpus = Tables.embeddings(spark, sf)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val agg = Similarity.bruteForceTopK(corpus, probes, 5)
      .orderBy("probe_id", "rk").collect().toSeq
    val win = Similarity.bruteForceTopKWindow(corpus, probes, 5)
      .select("probe_id", "vec_id", "cos", "rk")
      .orderBy("probe_id", "rk").collect().toSeq
    assert(agg.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))) ==
      win.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))))
  }

}
