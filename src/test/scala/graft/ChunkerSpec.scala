package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunker

class ChunkerSpec extends SparkFunSuite {
  import spark.implicits._

  private def toks(n: Int): String = (0 until n).map(i => s"w$i").mkString(" ")

  test("chunk boundaries: coverage, overlap, and last-chunk truncation") {
    // sizes chosen around the stride math: size=8, overlap=3 -> stride 5
    val docs = Seq(
      (1L, toks(3)),   // shorter than one chunk
      (2L, toks(8)),   // exactly one chunk
      (3L, toks(9)),   // one token past -> 2 chunks
      (4L, toks(13)),  // 2 chunks, second exactly full
      (5L, toks(18)),  // 3 chunks, last lands exactly full
      (6L, "   ")      // blank -> no chunks
    ).toDF("doc_id", "text")
    val got = Chunker.chunk(docs, "doc_id", "text", 8, 3)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()

    val byDoc = got.groupBy(_._1)
    assert(!byDoc.contains(6L))
    assert(byDoc(1L).map(t => (t._3, t._4)).toSeq == Seq((0L, 3L)))
    assert(byDoc(2L).map(t => (t._3, t._4)).toSeq == Seq((0L, 8L)))
    assert(byDoc(3L).map(t => (t._3, t._4)).toSeq == Seq((0L, 8L), (5L, 4L)))
    assert(byDoc(4L).map(t => (t._3, t._4)).toSeq == Seq((0L, 8L), (5L, 8L)))
    assert(byDoc(5L).map(t => (t._3, t._4)).toSeq ==
      Seq((0L, 8L), (5L, 8L), (10L, 8L)))

    // every token covered; consecutive chunks share exactly `overlap`
    // tokens while both are full-width
    byDoc.foreach { case (id, chunks) =>
      val n = docs.where(col("doc_id") === id)
        .select(size(split(trim(col("text")), "\\s+"))).as[Int].head()
      val covered = chunks.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered == (0L until n).toSet, s"doc $id coverage")
    }
    // chunk_text is the exact token slice
    assert(byDoc(3L).find(_._2 == 1L).get._5 ==
      (5 until 9).map(i => s"w$i").mkString(" "))
  }

  test("wider settings reconstruct the document from stride segments") {
    val docs = Seq((7L, toks(200))).toDF("doc_id", "text")
    val chunks = Chunker.chunk(docs, "doc_id", "text", 64, 16)
      .orderBy("chunk_id")
      .select("chunk_start", "chunk_text").as[(Long, String)].collect()
    // take the first `stride` tokens of each chunk + the tail of the
    // last one -> the original document
    val stride = 48
    val rebuilt = chunks.zipWithIndex.flatMap { case ((_, text), i) =>
      val ws = text.split(" ")
      if (i == chunks.length - 1) ws else ws.take(stride)
    }
    assert(rebuilt.mkString(" ") == toks(200))
  }

  test("invalid settings are rejected") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunker.chunk(docs, "doc_id", "text", 8, 8))
    intercept[IllegalArgumentException](Chunker.chunk(docs, "doc_id", "text", 0, 0))
  }
}
