package graft

import org.apache.spark.sql.functions._
import graft.operators.NaiveBayes

/** C42: multinomial NB with dyadic floor-log2 likelihoods — separable
  * corpora classify correctly, the argmax tie-break is deterministic
  * (smallest label), empty docs fall back to the prior, the model is
  * the bounded relation the broadcast story needs, and the integer
  * score matches a by-hand recompute of the scoring formula.
  */
class NaiveBayesSpec extends SparkFunSuite {

  import spark.implicits._

  private def toDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "label")

  test("separable two-class corpus: held-out docs classify by their " +
      "vocabulary") {
    val train = toDf(Seq(
      (1L, "spark shuffle partition executor", "infra"),
      (2L, "executor partition broadcast spark", "infra"),
      (3L, "sonnet stanza rhyme meter", "poetry"),
      (4L, "meter rhyme verse stanza", "poetry")))
    val m = NaiveBayes.train(train, "text", "label")
    val out = NaiveBayes.classify(m,
      Seq((10L, "spark executor"), (11L, "rhyme verse"),
        (12L, "stanza stanza meter")).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(out.map(_.getString(2)).toSeq ==
      Seq("infra", "poetry", "poetry"))
  }

  test("deterministic tie-break: symmetric classes give the smallest " +
      "label; empty doc scores by prior only") {
    val train = toDf(Seq((1L, "t", "b"), (2L, "t", "a")))
    val m = NaiveBayes.train(train, "text", "label")
    val out = NaiveBayes.classify(m,
      Seq((10L, "t"), (11L, "")).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getString(2) == "a") // exact score tie → smallest label
    assert(out(1).getLong(1) == 0L && out(1).getString(2) == "a")
  }

  test("score matches the formula recomputed by hand (integer, exact)") {
    // one class, controlled counts: "x" 3 times, "y" once, 2 docs
    val train = toDf(Seq((1L, "x x x", "c"), (2L, "x y", "c")))
    val m = NaiveBayes.train(train, "text", "label")
    val out = NaiveBayes.classify(m,
      Seq((10L, "x y x")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    def l2(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
    // Σ l2(cnt+1): x→l2(4+1)? no: cnt(x)=4? x appears 3+1=4 times
    val expected = 2L * l2(4L + 1L) + l2(1L + 1L) + // x, x, y evidence
      l2(2L) -                                      // prior: 2 docs
      3L * l2(5L + 4096L)                           // 3 tokens, tot=5
    assert(out.getLong(3) == expected,
      s"score ${out.getLong(3)} vs $expected")
  }

  test("model is the bounded relation the broadcast story needs: " +
      "counts ≤ buckets × classes, classes = distinct labels") {
    val docs = (0L until 200L).map(i =>
      (i, s"tok${i % 37} tok${i % 11} shared", s"c${i % 3}"))
    val m = NaiveBayes.train(toDf(docs), "text", "label",
      seed = 11L, nBuckets = 64)
    assert(m.classes.count() == 3L)
    val c = m.counts.agg(count(lit(1)), max("bucket")).collect()(0)
    assert(c.getLong(0) <= 64L * 3L && c.getLong(1) < 64L)
    // classify never loses or duplicates docs
    val scored = NaiveBayes.classify(m,
      toDf(docs).drop("label"), "doc_id", "text")
    assert(scored.count() == 200L &&
      scored.select("doc_id").distinct().count() == 200L)
  }
}
