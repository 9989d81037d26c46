package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev profiler (round 10): stage-level wall-clock of the minhash
  * near-dup pipeline on the gate corpus — signatures, banding + band
  * join, estimate join, connected components — to aim optimization at
  * the stage that actually pays for the ~9.5 s dedup_minhash bench
  * number instead of guessing.
  *
  * Run: `sbt "runMain graft.MinhashProfile [sfDir]"`.
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val corpus = DedupQueries.corpus(spark, d)
    time("corpus-count")(corpus.count())
    // warm pass so codegen compile stays out of stage timings
    Dedup.minhashClusters(corpus, "doc_id", "text", 0.5).count()

    val sigs = corpus.select(col("doc_id"),
      graft.functions.MinHash128.signature(col("text")).as("sig"))
    time("signatures")(sigs.localCheckpoint(true).count())
    val sigsM = sigs.localCheckpoint(true)
    val banded = sigsM.select(col("doc_id"),
        explode(expr(s"transform(sequence(0, 31), " +
          s"b -> named_struct('band', b, 'bh', xxhash64(slice(sig, b * 4 + 1, 4))))")).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))
    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    time("band-join+dedup")(cand.count())
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text", 0.5)
    time("pairs-end-to-end")(pairs.count())
    val pairsM = pairs.localCheckpoint(true)
    time("cc-only")(Dedup.connectedComponents(pairsM).count())
    time("clusters-end-to-end")(
      Dedup.minhashClusters(corpus, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
