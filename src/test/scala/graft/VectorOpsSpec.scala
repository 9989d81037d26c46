package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class VectorOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("codegen dot product is BIT-identical to the HOF fold on real embeddings") {
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val pairs = e.as("a").join(e.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(
        Similarity.dot(col("a.embedding"), col("b.embedding")).as("fused"),
        Similarity.dotHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null contract matches zip_with padding: mismatch/null-element/null-array") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),   // 11.0
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))),          // length mismatch -> null
      (None, Some(Seq(1.0f)))                            // null array -> null
    ).toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None, None))
    // null element -> null (same as HOF form)
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b")
    assert(withNullElem.select(Similarity.dot(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("mixed float/double inputs (vector vs hyperplane literal)") {
    val df = Seq(Seq(1.0f, 2.0f)).toDF("v")
    val got = df.select(
      Similarity.dot(col("v"), typedlit(Seq(0.5, 0.25))).as("d")).head().getDouble(0)
    assert(got == 1.0)
  }
}
