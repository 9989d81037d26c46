package graft

import graft.operators.DomainMix

class DomainMixSpec extends SparkFunSuite {
  import spark.implicits._

  private def corpus(rows: (Long, String, Long)*) =
    rows.toDF("doc_id", "domain", "n_tokens")

  test("plan: bottleneck domain keeps ~everything, others scale to proportion") {
    // web-heavy corpus, code is the bottleneck at 30% target
    val docs = corpus(
      (1L to 80L).map(i => (i, "web", 100L)) ++
      (81L to 100L).map(i => (i, "code", 100L)): _*)
    val p = DomainMix.plan(docs, "domain", "n_tokens",
        Seq(("web", 7L), ("code", 3L)))
      .select("domain", "t_tokens", "budget_tokens", "goal_tokens", "keep_frac")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // W=10, T_web=8000, T_code=2000; B = min(8000*10/7, 2000*10/3) = 6666
    assert(p("web")._3 == 6666L && p("code")._3 == 6666L)
    assert(p("code")._4 == 1999L)            // goal 3*6666/10
    assert(p("code")._5 > 0.99)              // bottleneck keeps ~100%
    assert(p("web")._4 == 4666L)             // goal 7*6666/10
    assert(math.abs(p("web")._5 - 4666.0 / 8000.0) < 1e-12)
  }

  test("plan: a target domain missing from the corpus zeroes the budget loudly") {
    val docs = corpus((1L, "web", 500L))
    val p = DomainMix.plan(docs, "domain", "n_tokens",
        Seq(("web", 1L), ("books", 1L)))
      .select("domain", "budget_tokens", "keep_frac")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(p("web")._2 == 0L && p("books")._2 == 0L)
    assert(p("books")._3 == 0.0)
  }

  test("sample: realized token mix approximates the targets, deterministically") {
    val rnd = new scala.util.Random(3)
    val docs = corpus(
      (1L to 3000L).map(i =>
        (i, if (i % 5 == 0) "code" else "web", 50L + rnd.nextInt(100).toLong)): _*)
    val targets = Seq(("web", 1L), ("code", 1L))  // equal mix from a 4:1 corpus
    val kept = DomainMix.sample(docs, "doc_id", "domain", "n_tokens", targets)
    val byDom = kept.groupBy("domain").agg(
        org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    // code is the bottleneck: nearly all kept; web downsampled to match
    val ratio = byDom("web").toDouble / byDom("code").toDouble
    assert(ratio > 0.85 && ratio < 1.15,
      s"realized web/code token ratio $ratio should approximate 1.0")
    // determinism: same inputs -> byte-identical sample
    val again = DomainMix.sample(docs, "doc_id", "domain", "n_tokens", targets)
      .orderBy("doc_id").collect().toSeq
    assert(again == kept.orderBy("doc_id").collect().toSeq)
  }

  test("planEpochs: scarce high-weight domain upsamples, maxEpochs binds the budget") {
    // books is 10x scarcer but weighted equal: with 3 epochs allowed it
    // repeats ~3x and web downsamples to match
    val docs = corpus(
      (1L to 90L).map(i => (i, "web", 100L)) ++
      (91L to 99L).map(i => (i, "books", 100L)): _*)
    val p = DomainMix.planEpochs(docs, "domain", "n_tokens",
        Seq(("web", 1L), ("books", 1L)), maxEpochs = 3)
      .select("domain", "t_tokens", "budget_tokens", "goal_tokens", "epochs", "last_frac")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // W=2, T_web=9000, T_books=900, E=3:
    // B = min(9000*3*2/1, 900*3*2/1) = 5400; G_j = 2700 each
    assert(p("web")._3 == 5400L && p("books")._3 == 5400L)
    assert(p("web")._4 == 2700L && p("books")._4 == 2700L)
    assert(p("books")._5 == 3L)                       // 3 passes
    assert(p("books")._6 == 900.0 / 900.0)            // last pass keeps all
    assert(p("web")._5 == 1L)
    assert(math.abs(p("web")._6 - 2700.0 / 9000.0) < 1e-12)
  }

  test("sampleEpochs: full epochs keep everything, expansion is deterministic") {
    val docs = corpus(
      (1L to 50L).map(i => (i, "web", 10L)) ++
      (51L to 55L).map(i => (i, "books", 10L)): _*)
    val targets = Seq(("web", 1L), ("books", 1L))
    val out = DomainMix.sampleEpochs(docs, "doc_id", "domain", "n_tokens",
      targets, maxEpochs = 4)
    // books: T=50, goal = min(500*2*4... B = min(500*8/1, 50*8/1)=400; G=200
    // epochs_books = ceil(200/50) = 4, last_frac = 50/50 = 1 -> all 4 epochs full
    val books = out.filter($"domain" === "books")
    assert(books.count() == 5 * 4)
    assert(books.groupBy("doc_id").count().as[(Long, Long)].collect()
      .forall(_._2 == 4L))
    // epoch column is 0..3
    assert(books.select("epoch").distinct().as[Long].collect().sorted.toSeq
      == Seq(0L, 1L, 2L, 3L))
    val again = DomainMix.sampleEpochs(docs, "doc_id", "domain", "n_tokens",
      targets, maxEpochs = 4).orderBy("doc_id", "epoch").collect().toSeq
    assert(again == out.orderBy("doc_id", "epoch").collect().toSeq)
  }

  test("sample: domains outside the targets are dropped entirely") {
    val docs = corpus((1L, "web", 10L), (2L, "spam", 10L))
    val kept = DomainMix.sample(docs, "doc_id", "domain", "n_tokens",
      Seq(("web", 1L)))
    assert(kept.select("domain").as[String].collect().toSet == Set("web"))
  }
}
