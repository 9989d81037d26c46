package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dsir, NaiveBayes}

/** C46: DSIR importance scores — target-typical docs outrank
  * raw-typical docs, the integer score matches the formula recomputed
  * by hand, empty docs score 0, and top-k selection is deterministic
  * under the (score DESC, id ASC) total order.
  */
class DsirSpec extends SparkFunSuite {

  import spark.implicits._

  test("docs made of target-subset vocabulary outscore docs made of " +
      "raw-only vocabulary") {
    // target rows (t=true) speak 'alpha beta'; raw-only rows speak
    // 'gamma delta'. A doc of alphas must beat a doc of gammas.
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta beta alpha", true),
      (3L, "gamma delta gamma delta", false),
      (4L, "gamma gamma delta delta", false),
      (10L, "alpha alpha beta beta", false),  // target-like, unlabeled
      (11L, "gamma delta delta gamma", false) // raw-like
    ).toDF("doc_id", "text", "t")
    val scored = Dsir.scores(docs, "doc_id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored(10L) > scored(11L),
      s"target-like 10 (${scored(10L)}) must outscore raw-like 11 (${scored(11L)})")
  }

  test("score matches the dyadic formula recomputed by hand") {
    // one target doc "x x x", one raw-only doc "y": per-bucket counts
    // are collision-free with overwhelming probability at B=4096 and
    // verified below via distinct bucket ids.
    val docs = Seq(
      (1L, "x x x", true),
      (2L, "y", false)).toDF("doc_id", "text", "t")
    val bx = docs.select(NaiveBayes.featureBucket(lit("x"), 7L, 4096))
      .head.getLong(0)
    val by = docs.select(NaiveBayes.featureBucket(lit("y"), 7L, 4096))
      .head.getLong(0)
    assume(bx != by) // no collision in this fixture
    def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    // corpus: cnt_r(x)=3, cnt_t(x)=3, cnt_r(y)=1, cnt_t(y)=0,
    // tot_r=4, tot_t=3, B=4096
    val norm = flog2(4L + 4096L) - flog2(3L + 4096L) // = 0 (same power)
    val exp1 = 3L * (flog2(3 + 1) - flog2(3 + 1)) + 3L * norm
    val exp2 = 1L * (flog2(0 + 1) - flog2(1 + 1)) + 1L * norm
    val scored = Dsir.scores(docs, "doc_id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored(1L) == exp1)
    assert(scored(2L) == exp2)
  }

  test("empty docs score exactly 0 and survive the pipeline") {
    val docs = Seq((1L, "w w", true), (2L, "", false))
      .toDF("doc_id", "text", "t")
    val scored = Dsir.scores(docs, "doc_id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(scored(2L) == ((0L, 0L)))
  }

  test("selectTopK is the (score DESC, id ASC) prefix") {
    val scored = Seq((5L, 2L, 100L), (3L, 2L, 100L), (9L, 2L, 50L))
      .toDF("doc_id", "n_tokens", "score")
    val top = Dsir.selectTopK(scored, "doc_id", 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(3L, 5L)) // score tie -> smaller id first
  }
}
