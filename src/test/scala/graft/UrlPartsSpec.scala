package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-18 fused-kernel equivalence pins:
  *
  *  1. [[graft.functions.UrlPartsExpr]]'s five fields must equal the
  *     live `parse_url(u, PART)` for each part, over a battery of
  *     well-formed, part-missing, and MALFORMED urls (the
  *     failOnError=false NULL contract), because every registered CH
  *     URL function now reads this struct instead of its own parse.
  *  2. The registered CH URL functions (through spark.sql) must equal
  *     the pre-fusion compositions stated inline.
  *  3. [[graft.functions.DoubleFoldExpr]] / [[graft.functions.CumSumDoubleExpr]]
  *     must be BIT-identical to the `aggregate(...)` HOF folds they
  *     replaced in the arraySum/arrayAvg/arrayCumSum/groupArrayMoving*
  *     builders — same adds, same order, same NULL propagation.
  */
class UrlPartsSpec extends SparkFunSuite {

  import spark.implicits._

  private val urls = Seq(
    "https://www.click.example.com/u/42?q=7&x=1#sec",
    "http://example.com",                       // no path/query/ref
    "https://example.com/p%20ath?a=%26x#f",     // encoded (raw parts)
    "ftp://user:pw@host.example.org:21/dir/f",  // userinfo + port
    "https://example.com?q=",                   // empty param value
    "https://example.com?xq=1&q=2",             // key must anchor on & or ^
    "//no.scheme/path",                         // scheme missing
    "http://exa mple.com/bad",                  // URISyntaxException -> NULL
    "",                                         // empty string
    "notaurl")

  test("url_parts fields equal live parse_url per part") {
    val df = urls.toDF("u")
    val parts = graft.functions.UrlParts.schema.fieldNames
    val sparkParts = Seq("PROTOCOL", "HOST", "PATH", "QUERY", "REF")
    val fused = org.apache.spark.sql.graftShim.column(
      graft.functions.UrlPartsExpr(
        org.apache.spark.sql.graftShim.expression(col("u"))))
    val out = df.select(
      (parts.indices.map(i => fused.getField(parts(i)).as(s"f$i")) ++
        sparkParts.zipWithIndex.map { case (p, i) =>
          expr(s"try_parse_url(u, '$p')").as(s"r$i") }): _*)
    out.collect().foreach { r =>
      parts.indices.foreach { i =>
        assert(r.getAs[String](s"f$i") == r.getAs[String](s"r$i"),
          s"field ${parts(i)} diverged on row $r")
      }
    }
  }

  test("registered CH URL functions equal the pre-fusion compositions") {
    GraftExtensions.install(spark)
    val df = urls.toDF("u"); df.createOrReplaceTempView("urlbattery")
    val out = spark.sql(
      """SELECT
        |  protocol(u) = coalesce(try_parse_url(u, 'PROTOCOL'), '') AS p_ok,
        |  domain(u) = coalesce(try_parse_url(u, 'HOST'), '') AS d_ok,
        |  domainWithoutWWW(u) = coalesce(
        |    regexp_replace(try_parse_url(u, 'HOST'), '^www\\.', ''), '') AS dn_ok,
        |  topLevelDomain(u) = coalesce(
        |    regexp_extract(try_parse_url(u, 'HOST'), '\\.([^.]+)$', 1), '') AS t_ok,
        |  path(u) = coalesce(try_parse_url(u, 'PATH'), '') AS pa_ok,
        |  queryString(u) = coalesce(try_parse_url(u, 'QUERY'), '') AS q_ok,
        |  fragment(u) = coalesce(try_parse_url(u, 'REF'), '') AS f_ok,
        |  extractURLParameter(u, 'q') = coalesce(
        |    try_parse_url(u, 'QUERY', 'q'), '') AS e_ok
        |FROM urlbattery""".stripMargin)
    out.collect().foreach { r =>
      (0 until r.length).foreach(i =>
        assert(r.getBoolean(i), s"column $i diverged: $r"))
    }
  }

  test("double_fold and cum_sum_double bit-equal the HOF folds") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(200)(Seq.fill(rnd.nextInt(40))(
      if (rnd.nextInt(20) == 0) null
      else java.lang.Double.valueOf(rnd.nextDouble() * 1e6 - 5e5)))
    val df = rows.toDF("a")
    def bits(c: org.apache.spark.sql.Column) = c.cast("string")
    val shim = org.apache.spark.sql.graftShim
    val fold = shim.column(graft.functions.DoubleFoldExpr(shim.expression(col("a"))))
    val cum = shim.column(graft.functions.CumSumDoubleExpr(shim.expression(col("a"))))
    val out = df.select(
      bits(fold).as("f"),
      bits(expr("aggregate(a, 0d, (acc, x) -> acc + cast(x as double))")).as("fr"),
      bits(cum).as("c"),
      bits(expr(
        """aggregate(a, cast(array() as array<double>),
          |  (acc, x) -> concat(acc, array(
          |    if(size(acc) = 0, 0d, element_at(acc, -1)) + cast(x as double))),
          |  fin -> fin)""".stripMargin)).as("cr"))
    assert(out.where(not(col("f") <=> col("fr"))).count() == 0)
    assert(out.where(not(col("c") <=> col("cr"))).count() == 0)
  }

  test("fold kernels over int arrays (the lens shape) equal the HOF folds") {
    val df = Seq(Seq(3, 1, 4, 1, 5), Seq.empty[Int], Seq(7)).toDF("a")
    val shim = org.apache.spark.sql.graftShim
    val fold = shim.column(graft.functions.DoubleFoldExpr(shim.expression(col("a"))))
    val cum = shim.column(graft.functions.CumSumDoubleExpr(shim.expression(col("a"))))
    val out = df.select(
      fold.as("f"),
      expr("aggregate(a, 0d, (acc, x) -> acc + cast(x as double))").as("fr"),
      cum.cast("string").as("c"),
      expr(
        """aggregate(a, cast(array() as array<double>),
          |  (acc, x) -> concat(acc, array(
          |    if(size(acc) = 0, 0d, element_at(acc, -1)) + cast(x as double))),
          |  fin -> fin)""".stripMargin).cast("string").as("cr"))
    out.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getDouble(0) == r.getDouble(1)))
      assert(r.getAs[String]("c") == r.getAs[String]("cr"))
    }
  }
}
