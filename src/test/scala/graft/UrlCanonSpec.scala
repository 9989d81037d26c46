package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlCanon

class UrlCanonSpec extends SparkFunSuite {

  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(UrlCanon.canonicalize(col("u"))).head().getString(0)

  test("every messy variant of the same page collapses to one URL") {
    val want = "https://ex.example.com/u/7?a=1&b=2"
    val variants = Seq(
      "https://ex.example.com/u/7?a=1&b=2",
      "HTTPS://EX.example.com/u/7?a=1&b=2",
      "https://www.ex.example.com/u/7?a=1&b=2",
      "https://ex.example.com:443/u/7?a=1&b=2",
      "https://ex.example.com/u/7/?a=1&b=2",
      "https://ex.example.com/u/7?b=2&a=1",
      "https://ex.example.com/u/7?b=2&utm_source=x&a=1&utm_medium=y")
    variants.foreach(v => assert(canon(v) == want, s"variant $v"))
  }

  test("distinct pages stay distinct") {
    assert(canon("https://a.example.com/x") != canon("https://b.example.com/x"))
    assert(canon("https://a.example.com/x?p=1") != canon("https://a.example.com/x?p=2"))
    assert(canon("http://a.example.com/x") != canon("https://a.example.com/x"))
  }

  test("no query and all-utm query both yield a bare canonical") {
    assert(canon("https://a.example.com/x") == "https://a.example.com/x")
    assert(canon("https://a.example.com/x?utm_source=s") == "https://a.example.com/x")
  }
}
