package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** TextFunctions.letCol — semantic identity with direct inlining (the
  * binding changes evaluation COUNT, never values), across the shapes
  * the text operators use it in.
  */
class LetColSpec extends SparkFunSuite {
  import spark.implicits._

  private val docs = Seq("a b c d", "  x  y  ", "", "solo",
    "the quick brown fox jumps").toDF("text")

  test("letCol(x)(body) == body(x) for array-typed bindings") {
    val toks = split(lower(trim(col("text"))), "\\s+")
    // size guard mirrors production (sequence(1, 0) DESCENDS in Spark)
    def bigrams(t: org.apache.spark.sql.Column) =
      when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => concat(element_at(t, i), lit("-"), element_at(t, i + 1))))
        .otherwise(typedlit(Seq.empty[String]))
    val a = docs.select(T.letCol(toks)(bigrams).as("r")).collect().map(_.getSeq[String](0))
    val b = docs.select(bigrams(toks).as("r")).collect().map(_.getSeq[String](0))
    assert(a.toSeq == b.toSeq)
  }

  test("letCol(x)(body) == body(x) for scalar bindings") {
    val t0 = lower(trim(col("text")))
    def grams(t: org.apache.spark.sql.Column) =
      when(length(t) >= 3,
        transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
        .otherwise(typedlit(Seq.empty[String]))
    val a = docs.select(T.letCol(t0)(grams).as("r")).collect().map(_.getSeq[String](0))
    val b = docs.select(grams(t0).as("r")).collect().map(_.getSeq[String](0))
    assert(a.toSeq == b.toSeq)
  }

  test("letCol survives null binding values") {
    val df = Seq(Some("ab"), None).toDF("s")
    val got = df.select(T.letCol(col("s"))(t => length(t)).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(got == Seq(2, -1))
  }
}
