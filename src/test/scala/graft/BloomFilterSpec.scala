package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomFilter

class BloomFilterSpec extends SparkFunSuite {
  import spark.implicits._

  test("no false negatives, ever: every built key answers true") {
    val keys = (1L to 400L).map(_ * 7919L)
    val df = keys.toDF("k")
    val bf = BloomFilter.build(df, "k", 1024)
    val out = BloomFilter.contains(bf, df, "k", 1024).collect()
    assert(out.length == 400 && out.forall(_.getLong(1) == 1L))
  }

  test("merge of partials == direct build (union+distinct IS bitwise OR)") {
    val df = (1L to 300L).map(i => i * 31L).toDF("k")
    val direct = BloomFilter.build(df, "k", 2048)
      .collect().map(_.getLong(0)).toSet
    val merged = BloomFilter.merge(
        BloomFilter.build(df.filter(col("k") % 3 === 0), "k", 2048),
        BloomFilter.build(df.filter(col("k") % 3 === 1), "k", 2048),
        BloomFilter.build(df.filter(col("k") % 3 === 2), "k", 2048))
      .collect().map(_.getLong(0)).toSet
    assert(merged == direct)
  }

  test("BloomStream settles to the batch build's exact bit set") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val keys = (1L to 300L).map(_ * 7919L)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = graft.streaming.BloomStream
      .filterStream(mem.toDF().toDF("k"), "k", 2048)
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("complete").start()
    try {
      mem.addData(keys.take(100)); q.processAllAvailable()
      mem.addData(keys.drop(100)); q.processAllAvailable()
      val streamed = spark.table("bloom_stream")
        .select("bit").collect().map(_.getLong(0)).toSet
      val batch = BloomFilter.build(keys.toDF("k"), "k", 2048)
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(streamed.size <= 2048)
    } finally q.stop()
  }

  test("FPR sits near the (1-e^(-kn/m))^k contract; state is bounded") {
    val n = 500
    val m = 4096
    val built = (1L to n.toLong).map(_ * 104729L).toDF("k")
    val bf = BloomFilter.build(built, "k", m)
    // state bound: at most min(m, k*n) distinct bits
    val bits = bf.count()
    assert(bits <= math.min(m.toLong, BloomFilter.NumHashes.toLong * n))
    // probe 2000 keys disjoint from the built set
    val probes = (1L to 2000L).map(i => i * 104729L + 13L).toDF("k")
    val fp = BloomFilter.contains(bf, probes, "k", m)
      .agg(sum(col("in_bloom"))).collect()(0).getLong(0)
    val k = BloomFilter.NumHashes
    val expect = math.pow(1.0 - math.exp(-k.toDouble * n / m), k)
    val fpr = fp.toDouble / 2000
    assert(fpr < 4 * expect + 0.01, s"fpr $fpr vs contract $expect")
  }
}
