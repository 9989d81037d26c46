package graft

import org.apache.spark.sql.functions._
import graft.sinks.BucketedWarehouse

class BucketingSpec extends SparkFunSuite {

  test("co-bucketed join runs without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .withColumnRenamed("l_orderkey", "orderkey")
    val ord = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "orderkey")
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    BucketedWarehouse.writeBucketed(li, "li_bucketed", "orderkey", 4)
    BucketedWarehouse.writeBucketed(ord, "ord_bucketed", "orderkey", 4)

    // force a shuffle-class join: broadcast would mask the bucket demo
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedWarehouse.cobucketedJoin(
        spark, "li_bucketed", "ord_bucketed", "orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      // and it is the same answer as the plain join
      val expect = li.join(ord, "orderkey").count()
      assert(joined.count() == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
