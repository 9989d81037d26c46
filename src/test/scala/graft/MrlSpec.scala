package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Similarity

class MrlSpec extends SparkFunSuite {
  import spark.implicits._

  private val dim = 16
  private def vec(seed: Long): Seq[Float] = {
    val r = new scala.util.Random(seed)
    Seq.fill(dim)(r.nextFloat())
  }
  private val corpus = (1L to 200L).map(i => (i, vec(i)))
    .toDF("vec_id", "embedding")
  private val probes = corpus.filter(col("vec_id") % 40 === 0)

  private def exactL2TopK(k: Int) = {
    val p = probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("pv"))
    corpus.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.VectorOps.sqDist(col("pv"), col("embedding"))
          .as("d2"))
      .withColumn("rk", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("d2").asc, col("vec_id"))).cast("long"))
      .filter(col("rk") <= k)
  }

  test("mrl with full-dim prefix and corpus-wide shortlist IS exact L2 top-k") {
    val got = Similarity.mrlTopK(corpus, probes, k = 5, mrlDim = dim,
      shortlist = 200).select("probe_id", "vec_id", "d2", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    val want = exactL2TopK(5).select("probe_id", "vec_id", "d2", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got == want)
  }

  test("mrl rerank distances are the exact full-dim distances") {
    val got = Similarity.mrlTopK(corpus, probes, k = 5, mrlDim = 4,
      shortlist = 50)
    val exact = exactL2TopK(200).select(col("probe_id"),
      col("vec_id"), col("d2").as("xd2"))
    // every returned (probe, vec) pair carries its exact L2 d2
    assert(got.join(exact, Seq("probe_id", "vec_id"))
      .where(col("d2") =!= col("xd2")).count() == 0)
    // and k rows per probe, ranked 1..k
    val perProbe = got.groupBy("probe_id")
      .agg(count(lit(1)).as("n"), max("rk").as("mx")).collect()
    assert(perProbe.forall(r => r.getLong(1) == 5L && r.getLong(2) == 5L))
  }

  test("mrl prefix shortlist recalls most exact neighbors on smooth vectors") {
    val got = Similarity.mrlTopK(corpus, probes, k = 5, mrlDim = 8,
      shortlist = 50).select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = exactL2TopK(5).select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got intersect want).size.toDouble / want.size
    assert(recall >= 0.5, s"recall $recall") // uniform noise: prefix is a weak but real signal
  }
}
