package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import graft.streaming.NearDedupStream

/** Streaming near-dedup: novel documents keep all 32 band buckets;
  * later near-duplicates (exact copies AND first-two-words-dropped
  * variants, the batch corpus construction) lose at least one bucket
  * to state and flag as duplicates. Emission is append-mode on window
  * close, so a final watermark-advancing batch flushes results.
  */
class NearDedupStreamSpec extends SparkFunSuite {
  import spark.implicits._

  test("first arrival is novel; in-horizon near-dups are flagged") {
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).take(40)
    val t0 = Timestamp.valueOf("2024-01-01 00:10:00")
    val t1 = Timestamp.valueOf("2024-01-01 00:40:00")
    val flush = Timestamp.valueOf("2024-01-02 00:00:00")

    val stream = MemoryStream[(Long, Timestamp, String)]
    val in = stream.toDF().toDF("doc_id", "ts", "text")
    val sq = NearDedupStream.flagNearDuplicates(in).writeStream
      .format("memory").queryName("near_dedup")
      .outputMode("append").start()
    try {
      stream.addData(docs.map { case (id, tx) => (id, t0, tx) }.toSeq)
      sq.processAllAvailable()
      // batch 2: exact copies and near copies (first two words dropped)
      // of batch-1 docs, plus one genuinely novel doc
      val exact = docs.take(5).map { case (id, tx) => (id + 1000000L, t1, tx) }
      val near = docs.slice(5, 10).map { case (id, tx) =>
        (id + 2000000L, t1, tx.replaceFirst("^\\S+\\s+\\S+\\s+", "")) }
      val novel = Seq((3000001L, t1,
        "zzqx wvut plomk ajsdh qwerty zxcvb unique totally fresh content " * 5))
      stream.addData(exact ++ near ++ novel)
      sq.processAllAvailable()
      stream.addData(Seq((9999999L, flush, "watermark advancing tick")))
      sq.processAllAvailable()

      // a doc whose EVERY bucket was claimed by an earlier/same-batch
      // doc emits no row at all — treat absent as flagged
      val got = spark.table("near_dedup")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
        .withDefaultValue(false)
      // batch-1 docs are novel UNLESS they naturally share a band with
      // another batch-1 doc (the documented intra-batch over-flagging;
      // the synthetic corpus does contain natural near-dups) — compute
      // the ambiguous set with the batch operator at threshold 0
      // (all band-candidates, no est cut)
      val batch1 = docs.map { case (id, tx) => (id, tx) }
        .toSeq.toDF("doc_id", "text")
      val ambiguous = graft.operators.Dedup
        .minhashPairs(batch1, "doc_id", "text", threshold = 0.0)
        .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
      val unambiguous = docs.filterNot { case (id, _) => ambiguous(id) }
      assert(unambiguous.nonEmpty, "need unambiguous docs for the assertion")
      unambiguous.foreach { case (id, _) =>
        assert(got(id), s"batch-1 doc $id should be novel") }
      // exact copies always flagged
      exact.foreach { case (id, _, _) =>
        assert(!got(id), s"exact copy $id should be flagged") }
      // near copies share most shingles -> at least one band collides
      val nearFlagged = near.count { case (id, _, _) => !got(id) }
      assert(nearFlagged >= 4, s"only $nearFlagged/5 near copies flagged")
      assert(got(3000001L), "the genuinely novel doc must stay novel")
    } finally sq.stop()
  }
}
