package graft

import org.apache.spark.sql.functions._
import graft.operators.Contamination

class ContaminationSpec extends SparkFunSuite {
  import spark.implicits._

  test("planted 5-gram overlap is flagged with exact counts") {
    val eval = Seq(
      (1L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val train = Seq(
      // contains "the quick brown fox jumps" and 3 more overlapping grams
      (10L, "once the quick brown fox jumps over the fence"),
      // no 5-gram in common (shares words, not a 5-run)
      (11L, "quick dog lazy fox brown the over jumps word"),
      // exact copy: every gram hits
      (12L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")

    val out = Contamination.report(train, eval, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 12L))
    val r10 = out(0)
    // doc 10: 5 grams; "the quick brown fox jumps", "quick brown fox
    // jumps over", "brown fox jumps over the" hit -> 3
    assert(r10.getLong(1) == 5 && r10.getLong(2) == 3)
    val r12 = out(1)
    assert(r12.getLong(1) == 5 && r12.getLong(2) == 5)
    assert(r12.getDouble(3) == 1.0)
  }

  test("docs shorter than W tokens produce no grams and never flag") {
    val eval = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq((2L, "a b c d"), (3L, ""), (4L, "   ")).toDF("doc_id", "text")
    assert(Contamination.report(train, eval, "doc_id", "text", 5).count() == 0)
  }

  test("shingling is case-insensitive and per-doc distinct") {
    val eval = Seq((1L, "A B C D E")).toDF("doc_id", "text")
    val train = Seq((2L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val r = Contamination.report(train, eval, "doc_id", "text", 5).collect().head
    // 10 tokens -> 6 positional grams, but "a b c d e" repeats; distinct = 6
    // positions 1..6: abcde bcdea cdeab deabc eabcd abcde -> 5 distinct
    assert(r.getLong(1) == 5 && r.getLong(2) == 1)
  }
}
