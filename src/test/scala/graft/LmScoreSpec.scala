package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityRules

/** Bigram-LM typicality (C40) beyond the gate: hand-checked counts on
  * a tiny corpus, the rare-transition ordering property, and
  * partitioning invariance (the score is a pure function of the
  * corpus, not of the plan).
  */
class LmScoreSpec extends SparkFunSuite {
  import spark.implicits._

  test("hand-checked bigram information on a tiny corpus") {
    // bigrams: doc1 = [a b, b a, a b], doc2 = [a b, b c]
    // corpus counts: (a b)=3, (b a)=1, (b c)=1
    // doc1: floor(log2) = 1+0+1 = 2 over 3; doc2: 1+0 = 1 over 2
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = QualityRules.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 2L, 2.0 / 3.0)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(!got.contains(3L)) // <2 tokens: no bigram, no row
  }

  test("documents of rare transitions score below typical documents") {
    val typical = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val weird = Seq((99L, "zqx jvk wpf qgh bzn"))
    val docs = (typical ++ weird).toDF("doc_id", "text")
    val scores = QualityRules.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scores(99L) < scores(1L))
    assert(scores(99L) == 0.0) // every bigram unique -> floor(log2 1)=0
  }

  test("ccnet buckets partition the corpus, ordered by score") {
    val out = TextQueries.queries("pipeline_ccnet_buckets")(spark, sf)
      .collect().map(r => (r.getDouble(1), r.getString(2)))
    val byBucket = out.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket.values.map(_.length).sum == out.length)
    // score-ordered: every head score > every middle > every tail
    // (middle < q2 <= head and tail < q1 <= middle by the bucket rule)
    assert(byBucket("head").min > byBucket("middle").max)
    assert(byBucket("middle").min > byBucket("tail").max)
    // tertiles: no bucket degenerates on this corpus
    assert(byBucket.values.forall(_.length >= out.length / 5))
  }

  test("repetition survives short and empty docs (letCol guard)") {
    // regression (round-10 review): the letCol struct evaluates the
    // bigram lambda BEFORE the >=2-token row filter; unguarded,
    // sequence(1, 0) descends and element_at(t, 0) crashes on any
    // 1-token or empty doc
    val docs = Seq((1L, "a b a"), (2L, "solo"), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    val got = QualityRules.repetition(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L)) // only the >=2-token doc emits a row
  }

  test("score invariant under repartitioning") {
    val docs = Tables.documents(spark, sf)
    val a = QualityRules.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = QualityRules.lmScore(docs.repartition(11), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
