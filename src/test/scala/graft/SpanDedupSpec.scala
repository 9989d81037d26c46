package graft

import org.apache.spark.sql.functions._

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

  test("runs merge adjacent dup windows into one maximal interval") {
    // a 10-token shared block in both docs: at w=4 it yields 7 dup
    // window starts per doc, all overlapping -> exactly ONE run
    val block = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    val docs = Seq(
      (1L, s"alpha beta $block gamma"),
      (2L, s"$block delta")
    ).toDF("doc_id", "text")
    val got = SpanDedup.runs(docs, "doc_id", "text", 4)
      .orderBy("doc_id", "run_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 2L, 11L, 10L),  // tokens 2..11 = the block
      (2L, 0L, 0L, 9L, 10L)))
  }

  test("separated dup spans stay separate runs; run cover equals scrub removal") {
    val s1 = "one two three four"
    val s2 = "five six seven eight"
    val docs = Seq(
      // two shared 4-blocks separated by >w unique tokens -> 2 runs
      (1L, s"$s1 u1 u2 u3 u4 u5 $s2"),
      (2L, s"$s1 v1 v2 v3 v4 v5 $s2"),
      (3L, "wholly unique filler text with no shared spans at all")
    ).toDF("doc_id", "text")
    val runs = SpanDedup.runs(docs, "doc_id", "text", 4)
    val perDoc = runs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_runs"), sum("run_tokens").as("covered"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(perDoc == Seq((1L, 2L, 8L), (2L, 2L, 8L)))
    // the merged-run cover IS the scrub removal set: per doc,
    // sum(run_tokens) == n_removed
    val removed = SpanDedup.scrub(docs, "doc_id", "text", 4)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    perDoc.foreach { case (id, _, covered) =>
      assert(covered == removed(id), s"doc $id") }
    assert(removed(3L) == 0L)
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
