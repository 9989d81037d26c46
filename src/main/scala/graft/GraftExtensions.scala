package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.Fnv1a64Expr

/** Spark-native extension point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT fnv1a64(text)
  * ...")` works anywhere DataFrame code does. Install either with
  *   spark.sql.extensions=graft.GraftExtensions
  * at session build time, or post-hoc via [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.fnv1a64Descriptor)
  }
}

object GraftExtensions {
  type FunctionDescriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val fnv1a64Descriptor: FunctionDescriptor = (
    FunctionIdentifier("fnv1a64"),
    new ExpressionInfo(classOf[Fnv1a64Expr].getName, "fnv1a64"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "fnv1a64 expects exactly one argument")
      Fnv1a64Expr(children.head)
    })

  /** Register on an already-built session (tests, notebooks). */
  def install(spark: SparkSession): Unit = {
    val (ident, info, builder) = fnv1a64Descriptor
    spark.sessionState.functionRegistry
      .registerFunction(ident, info, builder)
  }
}

/** SQL-first catalog surface: expose every test-schema table under its
  * name so the whole OLAP surface is reachable via `spark.sql` — the
  * experience a ClickHouse user migrating to this engine expects.
  */
object GraftCatalog {
  def registerTables(spark: SparkSession, dir: String): Unit = {
    GraftExtensions.install(spark)
    Tables.all.foreach { t =>
      val df = t match {
        case "events" => Tables.events(spark, dir)
        case other    => Tables(spark, dir, other)
      }
      df.createOrReplaceTempView(t)
    }
  }
}
