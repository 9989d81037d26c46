package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SpanDedupStream

/** Streaming span-dedup settles to first-arrival-wins window
  * semantics: per doc, win_dup counts exactly the W-token windows
  * already claimed by an earlier arrival, and the relationship to the
  * batch SpanDedup.report is the documented one — the batch operator
  * flags every occurrence of a shared window, the stream flags every
  * occurrence but the first.
  */
class SpanDedupStreamSpec extends SparkFunSuite {
  import spark.implicits._

  private val W = 4

  // Planted corpus: d2 is an exact copy of d1; d3 shares d1's
  // "delta epsilon zeta eta theta" span mid-document; d4 is unique;
  // d5 repeats d3's NOVEL tail, so its dup credit points at d3, not
  // d1; d6 is below the window width.
  private val corpus = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    3L -> "one two three delta epsilon zeta eta theta nine ten",
    4L -> "red orange yellow green blue indigo violet ultraviolet",
    5L -> "eight nine ten one two three delta epsilon zeta eta theta nine ten",
    6L -> "too short")

  /** Driver-side reference: distinct windows per doc, first claim
    * wins in arrival order.
    */
  private def reference: Map[Long, (Long, Long)] = {
    val seen = collection.mutable.Set.empty[String]
    corpus.map { case (id, text) =>
      val tk = text.toLowerCase.trim.split("\\s+")
      val wins =
        if (tk.length < W) Set.empty[String]
        else (0 to tk.length - W).map(s => tk.slice(s, s + W).mkString(" ")).toSet
      val dup = wins.count(seen)
      seen ++= wins
      id -> (wins.size.toLong, dup.toLong)
    }.toMap
  }

  test("per-doc dup counts settle to first-arrival-wins; batch relation holds") {
    implicit val sqlCtx = spark.sqlContext

    val t = Timestamp.valueOf("2024-01-01 00:10:00")
    val flush = Timestamp.valueOf("2024-01-02 00:00:00")
    val stream = MemoryStream[(Long, Timestamp, String)]
    val in = stream.toDF().toDF("doc_id", "ts", "text")
    val sq = SpanDedupStream.flagDupSpans(in, w = W).writeStream
      .format("memory").queryName("span_stream")
      .outputMode("append").start()
    try {
      // one doc per micro-batch -> arrival order is deterministic
      corpus.foreach { case (id, text) =>
        stream.addData(Seq((id, t, text)))
        sq.processAllAvailable()
      }
      stream.addData(Seq((999L, flush, "watermark advancing tick")))
      sq.processAllAvailable()

      val got = spark.table("span_stream")
        .select("doc_id", "win_total", "win_dup")
        .as[(Long, Long, Long)].collect()
        .map { case (id, tot, dup) => id -> (tot, dup) }.toMap

      val want = reference
      corpus.foreach { case (id, _) =>
        assert(got(id) == want(id), s"doc $id: got ${got(id)}, want ${want(id)}")
      }
      // exact copy d2: every window already claimed by d1
      assert(got(2L)._2 == got(2L)._1)
      // unique d4 and the short d6 stream clean
      assert(got(4L) == ((5L, 0L)) && got(6L) == ((0L, 0L)))

      // batch relation: summed over arrivals of each shared window,
      // stream flags (occurrences - 1), batch flags all occurrences —
      // so total batch dup = total stream dup + #distinct shared wins
      val batch = graft.operators.SpanDedup
        .report(corpus.toDF("doc_id", "text"), "doc_id", "text", W)
        .select("doc_id", "win_dup").as[(Long, Long)].collect().toMap
        .withDefaultValue(0L)
      val sharedDistinct = {
        val all = corpus.flatMap { case (_, text) =>
          val tk = text.toLowerCase.trim.split("\\s+")
          if (tk.length < W) Nil
          else (0 to tk.length - W).map(s => tk.slice(s, s + W).mkString(" ")).distinct
        }
        all.groupBy(identity).count(_._2.length > 1)
      }
      val streamDupTotal = corpus.map { case (id, _) => got(id)._2 }.sum
      val batchDupTotal = corpus.map { case (id, _) => batch(id) }.sum
      assert(batchDupTotal == streamDupTotal + sharedDistinct)
      // and a doc the batch clears must stream clean too
      corpus.foreach { case (id, _) =>
        if (batch(id) == 0L) assert(got(id)._2 == 0L, s"doc $id over-flagged")
      }
    } finally sq.stop()
  }
}
