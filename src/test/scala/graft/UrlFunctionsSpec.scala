package graft

class UrlFunctionsSpec extends SparkFunSuite {

  test("CH URL function family") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT
        | protocol('https://www.example.co.uk/a/b?x=1&y=2#frag') AS proto,
        | domain('https://www.example.co.uk/a/b?x=1&y=2#frag') AS dom,
        | domainWithoutWWW('https://www.example.co.uk/a/b?x=1') AS dom2,
        | topLevelDomain('https://www.example.co.uk/a/b') AS tld,
        | path('https://example.com/a/b?x=1') AS p,
        | queryString('https://example.com/a/b?x=1&y=2') AS qs,
        | fragment('https://example.com/a#frag') AS frag,
        | extractURLParameter('https://example.com/a?x=1&y=2', 'y') AS y,
        | domain('not a url') AS bad""".stripMargin).collect()(0)
    assert(r.getString(0) == "https")
    assert(r.getString(1) == "www.example.co.uk")
    assert(r.getString(2) == "example.co.uk")
    assert(r.getString(3) == "uk")
    assert(r.getString(4) == "/a/b")
    assert(r.getString(5) == "x=1&y=2")
    assert(r.getString(6) == "frag")
    assert(r.getString(7) == "2")
    assert(r.getString(8) == "") // missing part -> '' like CH, not NULL
  }

  test("CH string functions: position/replace/extract/pad/startsWith") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT
        | position('Hello world', 'world') AS pos,
        | position('Hello world', 'zzz') AS miss,
        | positionCaseInsensitive('Hello World', 'world') AS posci,
        | replaceAll('a-b-c', '-', '+') AS rall,
        | replaceRegexpAll('a1b22c', '[0-9]+', '#') AS rre,
        | extract('key=value', 'key=(\\w+)') AS ex1,
        | extract('abc123', '[0-9]+') AS ex0,
        | extractAll('a=1, b=2', '=(\\d)') AS exall,
        | leftPad('7', 3, '0') AS lp,
        | rightPad('ab', 4) AS rp,
        | startsWith('graft', 'gr') AS sw,
        | endsWith('graft', 'ft') AS ew,
        | lowerUTF8('ÄBC') AS lo""".stripMargin).collect()(0)
    assert(r.getInt(0) == 7 && r.getInt(1) == 0 && r.getInt(2) == 7)
    assert(r.getString(3) == "a+b+c")
    assert(r.getString(4) == "a#b#c")
    assert(r.getString(5) == "value")
    assert(r.getString(6) == "123")
    assert(r.getSeq[String](7) == Seq("1", "2"))
    assert(r.getString(8) == "007")
    assert(r.getString(9) == "ab  ")
    assert(r.getBoolean(10) && r.getBoolean(11))
    assert(r.getString(12) == "äbc")
  }
}
