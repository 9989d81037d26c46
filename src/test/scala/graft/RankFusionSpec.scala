package graft

import org.apache.spark.sql.functions._

/** C49 ann_hybrid_rrf: reciprocal-rank fusion invariants on the
  * sf0.001 fixture.
  */
class RankFusionSpec extends SparkFunSuite {

  private def rrfTerm(rank: Long): Long =
    if (rank == 0) 0L else 1000000L / (60L + rank)

  test("every output row's rrf is exactly the integer two-term sum") {
    val rows = VectorQueries.queries("ann_hybrid_rrf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rl, rv, rrf) = (r.getAs[Long]("rank_lex"),
        r.getAs[Long]("rank_vec"), r.getAs[Long]("rrf"))
      assert(rrf == rrfTerm(rl) + rrfTerm(rv),
        s"doc ${r.getLong(0)}: rrf $rrf != f($rl)+f($rv)")
      assert(rl >= 0 && rl <= 50 && rv >= 0 && rv <= 50)
    }
  }

  test("output is the top-20 by (rrf desc, doc_id) and both lists contribute") {
    val rows = VectorQueries.queries("ann_hybrid_rrf")(spark, sf).collect()
    val keys = rows.map(r => (-r.getAs[Long]("rrf"), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "not in fusion order")
    assert(rows.length <= 20)
    // the fusion is hybrid in fact, not just in name: at least one
    // doc ranked by the lexical list and one by the vector list
    assert(rows.exists(_.getAs[Long]("rank_lex") > 0))
    assert(rows.exists(_.getAs[Long]("rank_vec") > 0))
  }

  test("a doc ranked #1 in both lists dominates any single-list doc") {
    // pure arithmetic property of the integer RRF: presence in both
    // lists at ANY ranks beats absence from one list at rank 1...
    // only when ranks are close — pin the exact boundary instead:
    // f(1)+f(50) > f(1)+0 (two lists strictly beat one at equal best)
    assert(rrfTerm(1) + rrfTerm(50) > rrfTerm(1))
    // ...and the dominance the fusion exists for: both-lists rank-30
    // beats single-list rank-1 under the standard C=60 damping
    assert(rrfTerm(30) + rrfTerm(30) > rrfTerm(1))
  }
}
