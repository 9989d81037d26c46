package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.NgramSim

/** NgramSim fused kernel (round 15, the round-14 weak-flag fix) —
  * bit-identical to the declarative array_distinct/array_intersect
  * formulation it replaced, on the shapes that break naive gram code:
  * empty/short strings, multibyte chars (char- not byte-substrings),
  * case folding, duplicate grams, full/zero query overlap, nulls.
  */
class NgramSimSpec extends SparkFunSuite {
  import spark.implicits._

  private val qset: Seq[String] =
    "hash join table scan".toLowerCase.sliding(3).toSeq.distinct

  /** The pre-round-15 declarative tree — the semantic reference. */
  private def declarative(qs: Seq[String]): Column = {
    val t = lower(col("text"))
    val grams = when(length(t) >= 3,
      array_distinct(transform(sequence(lit(1), length(t) - 2),
        i => t.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))
    array(size(grams).cast("long"),
      size(array_intersect(grams, typedlit(qs))).cast("long"))
  }

  private val docs = Seq(
    "", "a", "ab", "abc", "HASH JOIN table SCAN",
    "hash join table scan", "aaaaaaa", "ab ab ab ab",
    "naïve café über — ßtraße", "日本語のテキストです",
    "mixed 日本 and ascii txt", "  leading and trailing  ",
    "o'brien's scan", "tab\tsep\nnewline").toDF("text")

  test("kernel == declarative tree on edge-shape corpus") {
    val a = docs.select(NgramSim.counts(col("text"), qset).as("r"))
      .collect().map(_.getSeq[Long](0)).toSeq
    val b = docs.select(declarative(qset).as("r"))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(a == b)
  }

  test("kernel == declarative tree on real documents at sf0.001") {
    val d = spark.read.parquet(s"$sf/documents.parquet").select("text")
    val a = d.select(NgramSim.counts(col("text"), qset).as("r"))
      .collect().map(_.getSeq[Long](0)).toSeq
    val b = d.select(declarative(qset).as("r"))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(a == b)
  }

  test("null text yields [0, 0] — the declarative tree's and the " +
      "oracle's semantics (CASE ... ELSE []), never a NULL array") {
    val d = Seq(Some("abcd"), None).toDF("text")
    val got = d.select(NgramSim.counts(col("text"), qset).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    assert(got(0) == Seq(2L, 0L) && got(1) == Seq(0L, 0L))
    // the declarative reference agrees on NULL input
    val ref = d.select(declarative(qset).as("r"))
      .collect().map(_.getSeq[Long](0))
    assert(ref(1) == Seq(0L, 0L))
    // and the expression declares itself non-nullable
    assert(!d.select(NgramSim.counts(col("text"), qset).as("r"))
      .schema.head.nullable)
  }

  test("exact hand-counts: distinct grams and intersection") {
    // "hash jo" → grams: has,ash,sh ,h j, jo — 5 distinct, all in qset
    val d = Seq("hash jo").toDF("text")
    val r = d.select(NgramSim.counts(col("text"), qset).as("r"))
      .collect()(0).getSeq[Long](0)
    assert(r == Seq(5L, 5L))
    // duplicates collapse: "aaaaaaa" → only gram "aaa"
    val r2 = Seq("aaaaaaa").toDF("text")
      .select(NgramSim.counts(col("text"), qset).as("r"))
      .collect()(0).getSeq[Long](0)
    assert(r2 == Seq(1L, 0L))
  }

  test("kernel runs inside whole-stage codegen (no fallback)") {
    // a LocalTableScan would constant-fold the projection away; the
    // parquet scan is the production shape
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(NgramSim.counts(col("text"), qset).as("r"))
    val hasSpan = d.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasSpan,
      s"expected codegen span, got:\n${d.queryExecution.executedPlan}")
  }
}
