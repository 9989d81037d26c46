package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (SURVEY.md §5): the co-located-join story with
  * wall-clock numbers — the same lineitem⋈orders aggregation join run
  * (a) as a plain shuffle join and (b) over co-bucketed tables where
  * Catalyst drops both exchanges. At 100 TB the one-time bucketed-write
  * cost amortizes over every subsequent join on the key; this prints
  * all three numbers so the trade is concrete, not asserted.
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      // force the shuffle-class join: broadcast would mask the comparison
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("orderkey"), col("l_quantity"),
        col("l_extendedprice"))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("orderkey"), col("o_totalprice"))

    def joined(l: org.apache.spark.sql.DataFrame,
               o: org.apache.spark.sql.DataFrame) =
      l.join(o, "orderkey")
        .groupBy("orderkey")
        .agg(sum("l_quantity").as("qty"), max("o_totalprice").as("price"))

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def bench(f: => Unit, n: Int = 3): Double =
      (1 to n).map(_ => time(f)._1).min

    // warm codegen/JIT
    joined(li, ord).write.format("noop").mode("overwrite").save()

    val plainSec = bench {
      joined(li, ord).write.format("noop").mode("overwrite").save()
    }

    Seq("bb_li", "bb_ord").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val (writeSec, _) = time {
      graft.sinks.BucketedWarehouse.writeBucketed(li, "bb_li", "orderkey", 8)
      graft.sinks.BucketedWarehouse.writeBucketed(ord, "bb_ord", "orderkey", 8)
    }
    val bli = spark.table("bb_li")
    val bord = spark.table("bb_ord")
    // prove the exchange-free plan before timing it
    val plan = joined(bli, bord).queryExecution.executedPlan.toString
    val exchangeFree = !plan.contains("Exchange")
    joined(bli, bord).write.format("noop").mode("overwrite").save()
    val bucketSec = bench {
      joined(bli, bord).write.format("noop").mode("overwrite").save()
    }

    println(f"""{"plain_join_sec":$plainSec%.3f,"bucketed_join_sec":$bucketSec%.3f,"bucket_write_sec":$writeSec%.3f,"exchange_free":$exchangeFree,"sf":"$sfDir"}""")
    spark.stop()
  }
}
