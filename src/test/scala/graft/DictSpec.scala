package graft

import org.apache.spark.sql.functions._
import graft.operators.Dict

class DictSpec extends SparkFunSuite {
  import spark.implicits._

  private val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "v")

  test("get / getOrDefault semantics") {
    val d = Dict.fromTable(dim, "k", "v")
    val facts = Seq(1L, 2L, 9L).toDF("k")
    val got = facts.select(col("k"), Dict.get(d, col("k")).as("g"),
      Dict.getOrDefault(d, col("k"), "x").as("gd"))
      .orderBy("k").collect()
    assert(got(0).getString(1) == "a" && got(1).getString(2) == "b")
    assert(got(2).isNullAt(1) && got(2).getString(2) == "x")
  }

  test("oversized dimension refuses loudly") {
    val big = (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Dict.fromTable(big, "k", "v", maxRows = 10)
    }
    assert(e.getMessage.contains("broadcast join"))
  }

  test("the lookup plan has NO join and NO exchange — a pure scan probe") {
    val d = Dict.fromTable(dim, "k", "v")
    val plan = Seq(1L, 2L).toDF("k")
      .select(Dict.get(d, col("k")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"))
  }
}
