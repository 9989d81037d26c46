package graft

import graft.operators.Dedup

/** C44: blocking + exact-verify edit-distance pairs — known distances
  * verify, the blocking tradeoff behaves exactly as documented (an
  * edit inside the blocking key separates the pair; an edit after it
  * keeps them joined), ordering canonical (id_a < id_b), threshold
  * boundary inclusive.
  */
class FuzzyDedupSpec extends SparkFunSuite {

  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], maxDist: Int = 6) =
    Dedup.editDistancePairs(rows.toDF("doc_id", "text"),
        "doc_id", "text", preLen = 64, blkLen = 8, maxDist = maxDist)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("exact distances on known edits; threshold boundary inclusive") {
    val out = pairs(Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fax jumps"),   // 1 substitution
      (3L, "the quick brown foxes jump"),  // dist 3 to #1 (es ins, s del... exact via engines)
      (4L, "the quick crimson wolf sleeps")))
    // all share the blocking key "the quic"; every pair verified
    assert(out.contains((1L, 2L, 1L)))
    val d13 = out.find(p => p._1 == 1L && p._2 == 3L)
    assert(d13.nonEmpty && d13.get._3 <= 6L)
    // dist(1,4) > 6 → filtered even though blocked together
    assert(!out.exists(p => p._1 == 1L && p._2 == 4L))
  }

  test("blocking tradeoff is exactly as documented: an edit INSIDE the " +
      "8-char key separates the pair; the same edit after it does not") {
    val inside = pairs(Seq(
      (1L, "abcdefgh shared tail of text"),
      (2L, "abcdeXgh shared tail of text"))) // edit at char 6
    assert(inside.isEmpty)
    val after = pairs(Seq(
      (1L, "abcdefgh shared tail of text"),
      (2L, "abcdefgh sharXd tail of text")))
    assert(after.toSeq == Seq((1L, 2L, 1L)))
  }

  test("canonical ordering and no self-pairs; comparison is on the " +
      "lowercased trimmed prefix") {
    val out = pairs(Seq(
      (5L, "  The SAME text  "),
      (9L, "the same text")))
    assert(out.toSeq == Seq((5L, 9L, 0L))) // id_a < id_b, dist 0
  }
}
