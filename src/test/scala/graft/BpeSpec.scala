package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe

class BpeSpec extends SparkFunSuite {
  import spark.implicits._

  private val rank = Bpe.DemoMerges.zipWithIndex.toMap

  test("encodeWord applies lowest-rank-first merge chains") {
    // t+h (rank 0) before h+e (rank 31); then th+e (rank 1)
    assert(Bpe.encodeWord("the", rank) == List("the"))
    // i+n -> in, then in+g -> ing (chained multi-level merges)
    assert(Bpe.encodeWord("ing", rank) == List("ing"))
    assert(Bpe.encodeWord("information", rank) ==
      List("in", "f", "or", "m", "at", "i", "on"))
    // w+i fires before any other pair in "with", then wi+th
    assert(Bpe.encodeWord("with", rank) == List("with"))
    assert(Bpe.encodeWord("question", rank) == List("qu", "es", "ti", "on"))
    // unknown pairs never merge
    assert(Bpe.encodeWord("xyz", rank) == List("x", "y", "z"))
    assert(Bpe.encodeWord("a", rank) == List("a"))
    assert(Bpe.encodeWord("", rank) == Nil)
  }

  test("leftmost-occurrence semantics on overlapping pairs") {
    // "tth": pairs (t,t) unknown, (t,h) rank 0 -> merge at index 1
    assert(Bpe.encodeWord("tth", rank) == List("t", "th"))
    // "thth": (t,h) at 0 and 2; leftmost first, then again, then no
    // (th,th) merge exists
    assert(Bpe.encodeWord("thth", rank) == List("th", "th"))
  }

  test("trainInMemory learns the hand-computed merges deterministically") {
    // corpus: "aab" x3, "ab" x2 -> pair counts: (a,a)=3, (a,b)=5
    // merge 1: (a,b) -> vocab aab->[a,ab], ab->[ab]
    // merge 2: (a,ab)=3 -> a+ab
    val merges = Bpe.trainInMemory(Seq("aab" -> 3L, "ab" -> 2L), 10)
    assert(merges == Seq("a" -> "b", "a" -> "ab"))
    // numMerges bounds the table
    assert(Bpe.trainInMemory(Seq("aab" -> 3L, "ab" -> 2L), 1) == Seq("a" -> "b"))
    // no pair with weighted count >= 2 -> stop early
    assert(Bpe.trainInMemory(Seq("ab" -> 1L, "cd" -> 1L), 10).isEmpty)
    // tie on count breaks lexicographically: (a,b)=2 vs (b,a)=2 in "abab"? no:
    // "ab" x2 + "cd" x2 -> (a,b)=2, (c,d)=2 -> (a,b) wins
    assert(Bpe.trainInMemory(Seq("ab" -> 2L, "cd" -> 2L), 1) == Seq("a" -> "b"))
  }

  test("distributed train matches in-memory train on the same corpus") {
    val docs = Seq("the cat the hat", "the cat sat", "hat hat")
      .toDF("text")
    val got = Bpe.train(docs, "text", 8)
    val freq = Seq("the" -> 3L, "hat" -> 3L, "cat" -> 2L, "sat" -> 1L)
    assert(got == Bpe.trainInMemory(freq, 8))
    // deterministic across invocations (fixed collect order by count desc, word)
    assert(got == Bpe.train(docs, "text", 8))
    // trained merges round-trip through the encoder
    val r2 = got.zipWithIndex.toMap
    assert(Bpe.encodeWord("the", r2) == List("the"))
  }

  test("tokenCount expression: per-doc sums, blank handling, codegen plan") {
    val df = Seq(
      (1L, "The quick  brown fox"),
      (2L, "   "),
      (3L, "question the summary"),
      (4L, "with WITH With")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Bpe.tokenCount(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap
    def n(w: String) = Bpe.encodeWord(w.toLowerCase, rank).length.toLong
    assert(got(1L) == n("the") + n("quick") + n("brown") + n("fox"))
    assert(got(2L) == 0L)
    assert(got(3L) == n("question") + n("the") + n("summary"))
    // case-folds before encoding; memo returns the same count 3x
    assert(got(4L) == 3 * n("with"))
    // the expression stays inside whole-stage codegen (checked on the
    // parquet-backed gate — a local Seq folds to LocalTableScan)
    val plan = Tables.documents(spark, sf)
      .select(Bpe.tokenCount(col("text")))
      .queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty)
  }

  test("corpus-trained merges COMPRESS: fewer tokens than char-level, more merges fire than none") {
    val docs = Seq((1L, "the cat and the dog and the cat"),
      (2L, "the best cat is the rest cat")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 16)
    assert(merges.nonEmpty)
    val rank = merges.zipWithIndex.toMap
    // 'the' must fuse fully — it is the top word in the corpus
    assert(Bpe.encodeWord("the", rank).length == 1)
    // trained tokenization never exceeds character count
    for (w <- Seq("cat", "and", "best", "rest"))
      assert(Bpe.encodeWord(w, rank).length <= w.length)
  }

  test("gate query matches a driver-side recompute at sf0.001") {
    val gate = TextQueries.queries("text_bpe_tokens")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val t = text.toLowerCase.trim
        if (t.isEmpty) None
        else {
          val ws = t.split("\\s+")
          Some((id, ws.length.toLong,
            ws.map(w => Bpe.encodeWord(w, rank).length.toLong).sum))
        }
      }.sortBy(_._1)
    assert(gate.toSeq == want.toSeq)
  }
}
