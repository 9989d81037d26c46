package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkFunSuite {

  private lazy val docs = Tables.documents(spark, sf).select("doc_id")

  test("deterministic sample: same rows every run, frac approximately honored") {
    val a = Sampling.deterministicSample(docs, col("doc_id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs, col("doc_id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample not reproducible")
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"frac $frac")
    // different seed -> different sample
    val c = Sampling.deterministicSample(docs, col("doc_id"), 0.2, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(a != c)
  }

  test("sample monotonicity: smaller frac is a subset of larger") {
    val small = Sampling.deterministicSample(docs, col("doc_id"), 0.1)
      .collect().map(_.getLong(0)).toSet
    val large = Sampling.deterministicSample(docs, col("doc_id"), 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("split assignment: total, disjoint, weight-proportional, stable") {
    val splits = Sampling.splitAssign(docs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = splits.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == n.toLong)
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    // stability: rerun assigns identical labels
    val x = splits.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val y = Sampling.splitAssign(docs, col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(x == y)
  }

  test("portable md5 bucket: reproducible, in range, matches a reference row") {
    val a = Sampling.deterministicSample(docs, col("doc_id"), 0.2, portable = true)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs, col("doc_id"), 0.2, portable = true)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"frac $frac")
    // pin one bucket value against an independently-computed reference:
    // first 8 hex chars of md5("0:42"), mod 1e6 — the cross-engine contract
    val bkt = docs.filter(col("doc_id") === 0)
      .select(Sampling.portableBucket(col("doc_id"), 42L)).head().getLong(0)
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("0:42".getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    assert(bkt == java.lang.Long.parseLong(md5hex, 16) % 1000000L)
  }

  test("weighted sample: w=0 never keeps, w>=max always keeps, monotone in w") {
    val weighted = docs.withColumn("w0", lit(0.0))
      .withColumn("wmax", lit(1.0))
      .withColumn("wlo", lit(0.2)).withColumn("whi", lit(0.6))
    assert(Sampling.weightedSample(weighted, col("doc_id"), col("w0"), 1.0).count() == 0)
    assert(Sampling.weightedSample(weighted, col("doc_id"), col("wmax"), 1.0).count()
      == docs.count())
    val lo = Sampling.weightedSample(weighted, col("doc_id"), col("wlo"), 1.0)
      .collect().map(_.getLong(0)).toSet
    val hi = Sampling.weightedSample(weighted, col("doc_id"), col("whi"), 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), "same key must keep under a higher weight")
    val n = docs.count().toDouble
    assert(lo.size / n > 0.1 && lo.size / n < 0.3, s"w=0.2 kept ${lo.size / n}")
  }

  test("stratified sample: exactly min(n, |stratum|) per stratum, stable") {
    val langs = Tables.documents(spark, sf).select("doc_id", "lang")
    val sizes = langs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Sampling.stratifiedSample(langs, col("lang"), col("doc_id"), 20)
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == sizes.map { case (l, c) => l -> math.min(20L, c) })
    val again = Sampling.stratifiedSample(langs, col("lang"), col("doc_id"), 20)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.collect().map(_.getLong(0)).toSet)
  }

  test("deterministic shuffle is a stable permutation") {
    val a = Sampling.deterministicShuffle(docs, col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.deterministicShuffle(docs, col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a.sorted != a, "shuffle left input ordered") // astronomically unlikely
    assert(a.toSet == docs.collect().map(_.getLong(0)).toSet)
  }
}
