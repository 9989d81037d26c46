package graft

import org.apache.spark.sql.functions._

/** ChDialect (round 15): literal ClickHouse clause-isms — LIMIT BY,
  * ARRAY JOIN, WITH TOTALS, PREWHERE, FORMAT — translated to Spark
  * SQL and pinned against the DataFrame plans the library already
  * serves for the same semantics.
  */
class ChDialectSpec extends SparkFunSuite {
  import ChDialect.translate

  private def ds = { GraftCatalog.registerTables(spark, sf); spark }

  test("FORMAT suffix is stripped; literals never trigger rewrites") {
    val t = translate("SELECT 'LIMIT 5 BY x FORMAT CSV' AS s FROM events FORMAT JSONEachRow")
    assert(!t.contains("JSONEachRow"), t) // the clause is gone...
    assert(t.contains("'LIMIT 5 BY x FORMAT CSV'"), t) // ...the literal is not
    assert(ds.sql(t).count() > 0)
  }

  test("PREWHERE becomes WHERE; merges with an existing WHERE") {
    val a = translate("SELECT count(*) AS n FROM events PREWHERE value > 10")
    assert(a.toUpperCase.contains("WHERE") && !a.toUpperCase.contains("PREWHERE"))
    val b = translate(
      "SELECT count(*) AS n FROM events PREWHERE value > 10 WHERE event_type = 'click'")
    val expect = ds.sql(
      "SELECT count(*) AS n FROM events WHERE value > 10 AND event_type = 'click'")
      .head.getLong(0)
    assert(ds.sql(b).head.getLong(0) == expect)
  }

  test("LIMIT n BY keys == the row_number DataFrame plan") {
    val t = translate(
      """SELECT user_id, event_type, ts_us, event_id FROM events
        |ORDER BY user_id, ts_us, event_id
        |LIMIT 2 BY user_id""".stripMargin)
    val got = ds.sql(t)
    assert(got.columns.toSeq ==
      Seq("user_id", "event_type", "ts_us", "event_id"),
      s"__rn must not leak: ${got.columns.mkString(",")}")
    val exp = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts_us", "event_id")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us", "event_id")))
      .where(col("rn") <= 2).drop("rn")
      .orderBy("user_id", "ts_us", "event_id")
    assert(got.collect().toSeq == exp.collect().toSeq)
  }

  test("trailing LIMIT m after LIMIT n BY keys is preserved") {
    val t = translate(
      """SELECT user_id, ts_us, event_id FROM events
        |ORDER BY user_id, ts_us, event_id
        |LIMIT 2 BY user_id LIMIT 7""".stripMargin)
    assert(ds.sql(t).count() == 7)
  }

  test("ARRAY JOIN explodes in the scan stage; LEFT keeps empty arrays") {
    val t = translate(
      """SELECT doc_id, tok
        |FROM (SELECT doc_id, splitByChar(' ', text) AS toks FROM documents)
        |ARRAY JOIN toks AS tok
        |WHERE length(tok) > 3 ORDER BY doc_id, tok""".stripMargin)
    val got = ds.sql(t)
    val exp = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
      .where(length(col("tok")) > 3).orderBy("doc_id", "tok")
    assert(got.collect().toSeq == exp.collect().toSeq)
    // LEFT ARRAY JOIN == explode_outer
    val l = translate(
      """SELECT n FROM (SELECT r_name, array() AS xs FROM region)
        |LEFT ARRAY JOIN xs AS n""".stripMargin)
    assert(ds.sql(l).count() == 5) // one NULL row per region
  }

  test("GROUP BY ... WITH TOTALS adds the grand-total row via " +
      "grouping sets") {
    val t = translate(
      """SELECT event_type, count(*) AS cnt FROM events
        |GROUP BY event_type WITH TOTALS""".stripMargin)
    val rows = ds.sql(t).collect()
    val base = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byKey = rows.filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == base)
    val totals = rows.filter(_.isNullAt(0))
    assert(totals.length == 1 && totals.head.getLong(1) == base.values.sum)
  }

  test("FROM t FINAL == ReplacingMerge.latestByKeyWindow, aliased so " +
      "qualified references keep resolving") {
    val meta = Map("events" -> ChDialect.TableMeta(
      finalKeys = Seq("user_id", "event_type"),
      finalOrder = Seq("ts_us", "event_id")))
    val t = translate(
      """SELECT events.event_id, events.user_id, event_type, value
        |FROM events FINAL
        |ORDER BY user_id, event_type""".stripMargin, meta)
    val got = ds.sql(t)
    val exp = graft.operators.ReplacingMerge.latestByKeyWindow(
        Tables.events(spark, sf), Seq("user_id", "event_type"),
        Seq(col("ts_us"), col("event_id")))
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("user_id", "event_type")
    assert(got.collect().toSeq == exp.collect().toSeq)
  }

  test("FROM t SAMPLE f == Sampling.deterministicSample (portable, " +
      "seed 42) — the same rows in any engine") {
    val meta = Map("documents" -> ChDialect.TableMeta(
      sampleKey = Some("doc_id")))
    val t = translate(
      "SELECT doc_id FROM documents SAMPLE 0.2 ORDER BY doc_id", meta)
    val got = ds.sql(t).collect().map(_.getLong(0)).toSeq
    val exp = graft.operators.Sampling.deterministicSample(
        Tables.documents(spark, sf).select("doc_id"),
        col("doc_id"), 0.2, portable = true)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == exp && got.nonEmpty)
  }

  test("FINAL/SAMPLE without TableMeta and n-rows SAMPLE refuse " +
      "loudly") {
    val meta = Map("events" -> ChDialect.TableMeta(
      finalKeys = Seq("user_id"), finalOrder = Seq("ts_us"),
      sampleKey = Some("user_id")))
    val e1 = intercept[IllegalArgumentException] {
      translate("SELECT * FROM events FINAL")
    }
    assert(e1.getMessage.contains("TableMeta"))
    val e2 = intercept[IllegalArgumentException] {
      translate("SELECT * FROM events SAMPLE 1000", meta)
    }
    assert(e2.getMessage.contains("fraction") ||
      e2.getMessage.contains("granule"))
  }

  test("FINAL SAMPLE composes: the bucket predicate filters the " +
      "POST-FINAL state (round 16; r15 refused this combination)") {
    val meta = Map("events" -> ChDialect.TableMeta(
      finalKeys = Seq("user_id", "event_type"),
      finalOrder = Seq("ts_us", "event_id"),
      sampleKey = Some("user_id")))
    val t = translate(
      """SELECT event_id, user_id, event_type FROM events FINAL SAMPLE 0.5
        |ORDER BY user_id, event_type""".stripMargin, meta)
    val dedup = graft.operators.ReplacingMerge.latestByKeyWindow(
      Tables.events(spark, sf), Seq("user_id", "event_type"),
      Seq(col("ts_us"), col("event_id")))
    val exp = graft.operators.Sampling.deterministicSample(
        dedup, col("user_id"), 0.5, portable = true)
      .select("event_id", "user_id", "event_type")
      .orderBy("user_id", "event_type")
    assert(ds.sql(t).collect().toSeq == exp.collect().toSeq)
  }

  test("multi-array ARRAY JOIN zips positionally via " +
      "inline(arrays_zip(...)) (round 16; r15 refused)") {
    val t = translate(
      """SELECT doc_id, tok, len
        |FROM (SELECT doc_id, splitByChar(' ', text) AS toks,
        |        arrayMap(x -> CAST(length(x) AS BIGINT),
        |                 splitByChar(' ', text)) AS lens
        |      FROM documents)
        |ARRAY JOIN toks AS tok, lens AS len
        |WHERE len > 3 ORDER BY doc_id, tok""".stripMargin)
    val base = Tables.documents(spark, sf).select(col("doc_id"),
        split(col("text"), " ", -1).as("toks"))
      .withColumn("lens", transform(col("toks"),
        x => length(x).cast("long")))
    val exp = base.select(col("doc_id"),
        explode(arrays_zip(col("toks"), col("lens"))).as("z"))
      .select(col("doc_id"), col("z.toks").as("tok"),
        col("z.lens").as("len"))
      .where(col("len") > 3).orderBy("doc_id", "tok")
    assert(ds.sql(t).collect().toSeq == exp.collect().toSeq)
  }

  test("bare ARRAY JOIN shadows the array column with its element " +
      "via a renaming FROM subquery (round 16; r15 refused)") {
    ds.sql(
      """CREATE OR REPLACE TEMPORARY VIEW docs_arr_spec AS
        |SELECT doc_id, split(text, ' ', -1) AS toks
        |FROM documents""".stripMargin)
    val t = translate(
      """SELECT doc_id, toks FROM docs_arr_spec ARRAY JOIN toks
        |WHERE length(toks) > 3 ORDER BY doc_id, toks""".stripMargin)
    val exp = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(split(col("text"), " ", -1)).as("toks"))
      .where(length(col("toks")) > 3).orderBy("doc_id", "toks")
    assert(ds.sql(t).collect().toSeq == exp.collect().toSeq)
    // the element type proves the shadow: toks is a STRING now
    assert(ds.sql(t).schema("toks").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("scientific notation with a signed exponent lexes as ONE " +
      "number (round-16 ADVICE fix: 1e-9 must not emit '1e - 9')") {
    val t = translate(
      "SELECT count(*) AS n FROM events WHERE value > 1e-9")
    assert(t.contains("1e-9"), t)
    assert(ds.sql(t).head.getLong(0) > 0)
    val u = translate("SELECT 2.5E+10 AS x, 3e2 AS y FROM region")
    assert(u.contains("2.5E+10") && u.contains("3e2"), u)
    // a minus that is NOT an exponent sign stays an operator
    val v = translate("SELECT count(*) AS n FROM events WHERE value > 5 - 9")
    assert(v.contains("5 - 9"), v)
  }

  test("a column NAMED global in operand position survives " +
      "stripGlobal (round-16 ADVICE fix)") {
    val a = translate(
      """SELECT count(*) AS n FROM
        |(SELECT user_id AS global FROM events) t
        |WHERE global IN (1, 2, 3)""".stripMargin)
    assert(a.contains("global IN"), a)
    assert(ds.sql(a).head.getLong(0) >= 0)
    // qualified reference behind a dot is kept too
    val b = translate(
      """SELECT count(*) AS n FROM
        |(SELECT user_id AS global FROM events) t
        |WHERE t.global NOT IN (1, 2)""".stripMargin)
    assert(b.contains("global NOT IN"), b)
    assert(ds.sql(b).head.getLong(0) >= 0)
    // operator position still strips
    val c = translate(
      "SELECT count(*) AS n FROM events WHERE user_id GLOBAL IN " +
        "(SELECT user_id FROM events WHERE event_type = 'view')")
    assert(!c.toUpperCase.split("[^A-Z]").contains("GLOBAL"), c)
  }

  test("per-SELECT SETTINGS in a UNION chain ALL strip (round-16 " +
      "fix: one pass left the second clause for Spark's parser)") {
    val t = translate(
      "SELECT 1 AS x SETTINGS max_threads = 1 UNION ALL " +
        "SELECT 2 AS x SETTINGS max_threads = 2, max_memory_usage = 1")
    assert(!t.toUpperCase.contains("SETTINGS"), t)
    assert(ds.sql(t).count() == 2)
  }

  test("untranslatable CH-isms refuse loudly") {
    // bare-column shadowing under a MULTI-RELATION FROM: the array's
    // source relation is ambiguous (round 17 narrowed the refusal to
    // exactly this boundary — single-relation FROMs now rewrite)
    val e2 = intercept[IllegalArgumentException] {
      translate("SELECT x FROM t JOIN u ON t.k = u.k ARRAY JOIN xs")
    }
    assert(e2.getMessage.contains("ambiguous"))
    val e2b = intercept[IllegalArgumentException] {
      translate("SELECT x FROM t, u ARRAY JOIN xs")
    }
    assert(e2b.getMessage.contains("ambiguous"))
    // a sibling clause item referencing the shadowed array: CH reads
    // the PRE-shadow array there; post-rename it would be a Spark
    // unresolved column — the adapter refuses with its own message
    val e3 = intercept[IllegalArgumentException] {
      translate("SELECT x FROM t ARRAY JOIN xs, arrayMap(i -> i, xs) AS y")
    }
    assert(e3.getMessage.contains("shadows"))
    // a QUALIFIED body reference to the shadowed array is unreachable
    // after the rename (unqualified ones correctly see the element)
    val e4 = intercept[IllegalArgumentException] {
      translate("SELECT t.xs FROM t ARRAY JOIN xs")
    }
    assert(e4.getMessage.contains("shadowed"))
  }

  test("round 17: bare ARRAY JOIN shadowing under subquery and " +
      "aliased FROMs (the r16 verdict's top remaining refusal)") {
    import spark.implicits._
    Seq((1L, Seq("a", "b")), (2L, Seq("c")))
      .toDF("id", "toks").createOrReplaceTempView("aj_t")
    // FROM (subquery) ARRAY JOIN bare
    val t1 = translate(
      "SELECT id, toks FROM (SELECT id, toks FROM aj_t WHERE id <= 2) " +
        "ARRAY JOIN toks ORDER BY id, toks")
    val r1 = spark.sql(t1).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(r1.toSeq == Seq((1L, "a"), (1L, "b"), (2L, "c")))
    // FROM (subquery) alias ARRAY JOIN bare
    val t2 = translate(
      "SELECT s.id AS id, toks FROM (SELECT * FROM aj_t) AS s " +
        "ARRAY JOIN toks ORDER BY id, toks")
    val r2 = spark.sql(t2).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(r2.toSeq == Seq((1L, "a"), (1L, "b"), (2L, "c")))
    // FROM tbl alias ARRAY JOIN bare, qualified NON-shadowed ref kept
    val t3 = translate(
      "SELECT e.id AS id, toks FROM aj_t e ARRAY JOIN toks " +
        "WHERE toks != 'b' ORDER BY id")
    val r3 = spark.sql(t3).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(r3.toSeq == Seq((1L, "a"), (2L, "c")))
  }

  test("round 17: bare-EXPRESSION ARRAY JOIN names the element after " +
      "the expression text; same-text references see the ELEMENT " +
      "(CH name resolution), subqueries keep their own scope") {
    import spark.implicits._
    Seq((1L, Seq("aa", "b")), (2L, Seq("ccc")))
      .toDF("id", "xs").createOrReplaceTempView("aje_t")
    val t = translate(
      """SELECT id, upper(arrayMap(i -> i, xs)) AS u,
        |  CAST(length(arrayMap(i -> i, xs)) AS BIGINT) AS l
        |FROM aje_t
        |ARRAY JOIN arrayMap(i -> i, xs)
        |WHERE length(arrayMap(i -> i, xs)) >= 1
        |ORDER BY id, arrayMap(i -> i, xs)""".stripMargin)
    // every body reference was rewritten to the element alias
    assert(t.contains("`arrayMap(i -> i, xs)`"), t)
    val got = spark.sql(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq ==
      Seq((1L, "AA", 2L), (1L, "B", 1L), (2L, "CCC", 3L)))
    // the same text INSIDE a subquery still names the subquery's own
    // expression over its own scope (array, not element)
    val t2 = translate(
      """SELECT id, arrayMap(i -> i, xs) AS e
        |FROM (SELECT id, xs FROM aje_t WHERE size(arrayMap(i -> i, xs)) > 0)
        |ARRAY JOIN arrayMap(i -> i, xs)
        |ORDER BY id, arrayMap(i -> i, xs)""".stripMargin)
    val got2 = spark.sql(t2).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got2.toSeq == Seq((1L, "aa"), (1L, "b"), (2L, "ccc")))
  }

  test("the zip gate's ordinality oracle is ALIGNMENT-sensitive: a " +
      "deliberately mis-zipped frame diverges (r16 verdict #4)") {
    // the gate zips toks with their ordinal positions; a zip bug that
    // kept per-element-consistent pairs but shifted POSITIONS must
    // not match. Reverse the position array — same multiset of
    // (tok) and (pos) values, different alignment — and assert the
    // (tok, pos) pair set differs wherever a doc has >1 token.
    val good = ds.sql(ChDialect.translate(
      """SELECT doc_id, tok, pos
        |FROM (SELECT doc_id, splitByChar(' ', text) AS toks,
        |  sequence(CAST(1 AS BIGINT),
        |    CAST(size(splitByChar(' ', text)) AS BIGINT)) AS poss
        |  FROM documents)
        |ARRAY JOIN toks AS tok, poss AS pos
        |ORDER BY doc_id, tok, pos LIMIT 500""".stripMargin))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val misZipped = ds.sql(ChDialect.translate(
      """SELECT doc_id, tok, pos
        |FROM (SELECT doc_id, splitByChar(' ', text) AS toks,
        |  reverse(sequence(CAST(1 AS BIGINT),
        |    CAST(size(splitByChar(' ', text)) AS BIGINT))) AS poss
        |  FROM documents)
        |ARRAY JOIN toks AS tok, poss AS pos
        |ORDER BY doc_id, tok, pos LIMIT 500""".stripMargin))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(!java.util.Arrays.deepEquals(
      good.map(x => x: AnyRef), misZipped.map(x => x: AnyRef)),
      "misaligned zip produced the same (tok, pos) pairs - the " +
        "oracle would not catch an alignment bug")
  }

  test("SETTINGS suffix strips (before or after FORMAT); GLOBAL " +
      "join/IN hints drop; a column named global survives") {
    val a = translate(
      "SELECT count(*) AS n FROM events SETTINGS max_threads = 4, " +
        "max_memory_usage = 10000000000 FORMAT JSON")
    assert(!a.toUpperCase.contains("SETTINGS") && !a.contains("JSON"), a)
    assert(ds.sql(a).head.getLong(0) > 0)
    val b = translate(
      """SELECT count(*) AS n FROM events e
        |GLOBAL INNER JOIN (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase') p
        |ON e.user_id = p.user_id
        |WHERE e.user_id GLOBAL IN (SELECT user_id FROM events
        |  WHERE event_type = 'view')""".stripMargin)
    assert(!b.toUpperCase.split("[^A-Z]").contains("GLOBAL"), b)
    assert(ds.sql(b).head.getLong(0) > 0)
    // an identifier merely NAMED global is untouched
    val c = translate("SELECT doc_id AS global FROM documents")
    assert(c.contains("global"), c)
  }

}
