package graft

import graft.operators.SpanDedup

class SpanDedupSpec extends SparkFunSuite {
  import spark.implicits._

  test("report flags shared windows and only shared windows") {
    val shared = "one two three four" // the 4-token span planted in two docs
    val docs = Seq(
      (1L, s"$shared alpha beta"),    // 6 tokens -> 3 windows at w=4, 1 shared
      (2L, s"gamma $shared delta"),   // 6 tokens -> 3 windows, 1 shared
      (3L, "totally unrelated words here now"), // 2 windows, 0 shared
      (4L, "too short")               // < 4 tokens -> no row
    ).toDF("doc_id", "text")

    val got = SpanDedup.report(docs, "doc_id", "text", 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq

    assert(got == Seq(
      (1L, 3L, 1L, 1.0 / 3),
      (2L, 3L, 1L, 1.0 / 3),
      (3L, 2L, 0L, 0.0)))
  }

  test("an exact duplicate doc has dup_frac 1.0 on every window") {
    val text = "the quick brown fox jumps over the lazy dog"
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val got = SpanDedup.report(docs, "doc_id", "text", 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.forall { case (_, total, dup, frac) =>
      total == dup && frac == 1.0 })
    assert(got.map(_._1) == Seq(1L, 2L))
  }

  test("scrub removes exactly the duplicated spans, keeps unique text intact") {
    val boiler = "one two three four"
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),   // 7 tokens, shares the 4-window
      (2L, s"$boiler delta epsilon zeta"), // shares it at the start
      (3L, "entirely unrelated words that stay whole"),
      (4L, "tiny")                          // < w: untouched
    ).toDF("doc_id", "text")
    val got = SpanDedup.scrub(docs, "doc_id", "text", 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1: only window [one two three four] (positions 2..5) is shared
    // -> tokens 2..5 go, alpha beta gamma stay
    assert(got(0) == (1L, 7L, 4L, "alpha beta gamma"))
    assert(got(1) == (2L, 7L, 4L, "delta epsilon zeta"))
    assert(got(2) == (3L, 6L, 0L, "entirely unrelated words that stay whole"))
    assert(got(3) == (4L, 1L, 0L, "tiny"))
  }

  test("a viral window in many docs stays one count-side row (report still exact)") {
    val boiler = "standard license header text block"
    val docs = (1L to 50L).map(i => (i, s"$boiler unique$i tail$i"))
      .toDF("doc_id", "text")
    val got = SpanDedup.report(docs, "doc_id", "text", 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    // windows per doc: 3 (7 tokens, w=5); only the pure-boiler window
    // ("standard license header text block") is shared by all 50
    assert(got.size == 50)
    assert(got.forall { case (_, total, dup, _) => total == 3 && dup == 1 })
  }
}
