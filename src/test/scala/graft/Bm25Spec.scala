package graft

import graft.operators.Bm25

/** C45: BM25 with dyadic constants — the closed-form integer rational
  * verifies by hand, tf raises and length normalization lowers scores
  * exactly as BM25 must, non-matching docs are excluded, and the
  * fixed-order total equals the recomputed sum bit-for-bit.
  */
class Bm25Spec extends SparkFunSuite {

  import spark.implicits._

  private val phrases = Seq("hash join", "scan filter")

  private def rank(rows: Seq[(Long, String)]) =
    Bm25.rank(rows.toDF("doc_id", "text"), "doc_id", "text", phrases, k = 10)
      .orderBy("doc_id").collect()

  test("score matches the closed-form rational recomputed by hand") {
    // corpus: 4 docs; "hash join" in docs 1 (tf=1, dl=3) and 2 (tf=2,
    // dl=4); docs 3-4 no phrase. N=4, T=3+4+2+3=12, df=2 → idf =
    // floor(log2(4//2)) = 1 (non-degenerate).
    val out = Bm25.rank(Seq(
      (1L, "big hash join plan"),
      (2L, "hash join hash join x"),
      (3L, "sort by key"),
      (4L, "sort by key again")).toDF("doc_id", "text"),
      "doc_id", "text", phrases, k = 10).orderBy("doc_id").collect()
    assert(out.length == 2) // docs 3-4 match nothing → excluded
    def l2(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val n = 4L; val t = 12L
    val idf = l2(n / 2L).toDouble
    assert(idf == 1.0)
    def s(tf: Long, dl: Long) =
      idf * ((8 * tf * t).toDouble / (4 * tf * t + t + 3 * dl * n).toDouble)
    assert(out(0).getAs[Double]("bm25") == s(1, 3))
    assert(out(1).getAs[Double]("bm25") == s(2, 4))
  }

  test("tf monotone up, document length monotone down, rank order by " +
      "score then id") {
    // df("hash join")=4 of N=8 docs → idf = floor(log2(8//4)) = 1 > 0
    val docs = Seq(
      (1L, "hash join a b c d e f"),           // tf 1, dl 7
      (2L, "hash join hash join c d e f"),     // tf 2, dl 7
      (3L, "hash join a b c d e f g h i j k"), // tf 1, dl 11
      (4L, "hash join x y"),                   // tf 1, dl 3
      (5L, "p q r"), (6L, "p q r"), (7L, "p q r"), (8L, "p q r s t u v w"))
    val byId = rank(docs)
    val sc = byId.map(r => r.getLong(0) -> r.getAs[Double]("bm25")).toMap
    assert(sc(2) > sc(1), "more occurrences must score higher")
    assert(sc(3) < sc(1), "longer doc with same tf must score lower")
    assert(sc(4) > sc(1), "shorter doc with same tf must score higher")
    val ranked = Bm25.rank(docs.toDF("doc_id", "text"), "doc_id", "text",
      phrases, k = 10).collect().map(_.getLong(0)).toSeq
    assert(ranked == Seq(2L, 4L, 1L, 3L))
  }

  test("per-phrase columns are sparse (NULL when unmatched) and the " +
      "total is their fixed-order coalesce sum") {
    val out = rank(Seq(
      (1L, "hash join then scan filter"),
      (2L, "scan filter only here then more")))
    out.foreach { r =>
      val s1 = Option(r.getAs[java.lang.Double]("s1")).fold(0.0)(_.toDouble)
      val s2 = Option(r.getAs[java.lang.Double]("s2")).fold(0.0)(_.toDouble)
      assert(r.getAs[Double]("bm25") == s1 + s2)
    }
    assert(out.find(_.getLong(0) == 2L).exists(r => r.isNullAt(2)))
  }
}
