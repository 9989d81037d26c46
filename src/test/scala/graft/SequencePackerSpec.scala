package graft

import org.apache.spark.sql.functions._
import graft.operators.SequencePacker

class SequencePackerSpec extends SparkFunSuite {
  import spark.implicits._

  test("offsets are per-shard prefix sums; windows split at seqLen") {
    // one shard (nShards=1), seqLen=10: docs 3,4,5 tokens ->
    // offsets 0,3,7; doc 5 (7..11) straddles windows 0 and 1
    val docs = Seq((0L, 3L), (1L, 4L), (2L, 5L)).toDF("doc_id", "n_tokens")
    val out = SequencePacker.pack(docs, "doc_id", "n_tokens", 1, 10)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(3)).toSeq == Seq(0L, 3L, 7L))
    assert(out.map(r => (r.getLong(4), r.getLong(5))).toSeq ==
      Seq((0L, 0L), (0L, 0L), (0L, 1L)))
  }

  test("zero-token docs are dropped; shards pack independently") {
    val docs = Seq((0L, 4L), (1L, 6L), (2L, 0L), (3L, 4L), (4L, 2L))
      .toDF("doc_id", "n_tokens")
    val out = SequencePacker.pack(docs, "doc_id", "n_tokens", 2, 8)
      .orderBy("doc_id").collect()
    assert(!out.map(_.getLong(0)).contains(2L))
    // shard 0: docs 0,4 -> offsets 0,4 ; shard 1: docs 1,3 -> offsets 0,6
    val byId = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(byId(0L) == (0L, 0L) && byId(4L) == (0L, 4L))
    assert(byId(1L) == (1L, 0L) && byId(3L) == (1L, 6L))
    // doc 3: offset 6, 4 tokens, seqLen 8 -> spans windows 0..1
    val d3 = out.find(_.getLong(0) == 3L).get
    assert((d3.getLong(4), d3.getLong(5)) == (0L, 1L))
  }

  test("total token mass equals last offset + last doc tokens per shard") {
    val docs = (0L until 100L).map(i => (i, i % 7 + 1)).toDF("doc_id", "n_tokens")
    val out = SequencePacker.pack(docs, "doc_id", "n_tokens", 4, 16)
    val check = out.groupBy("shard")
      .agg(sum("n_tokens").as("mass"),
        max(col("tok_offset") + col("n_tokens")).as("end"))
      .where(col("mass") =!= col("end"))
    assert(check.count() == 0)
  }
}
