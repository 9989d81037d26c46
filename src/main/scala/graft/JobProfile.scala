package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev profiler (round 17): run one gate warm and report, for the
  * final timed invocation, every Spark job it fired (wall-clock) plus
  * the summed executor task time — separating fixed driver/scheduling
  * overhead (wall >> task time) from real compute (wall ≈ task/cores).
  *
  * Run: `runMain graft.JobProfile <sfDir> <name> [warmRuns]`.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val warm = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    (1 to warm).foreach { _ =>
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobWall = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    val taskCount = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobWall.put(j.jobId, j.time - jobStart.getOrDefault(j.jobId, j.time))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) taskTime.addAndGet(t.taskMetrics.executorRunTime)
        taskCount.incrementAndGet()
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener bus is async — give it a moment to drain
    Thread.sleep(300)
    val jobs = jobWall.entrySet().toArray
      .map(_.asInstanceOf[java.util.Map.Entry[Int, Long]])
      .sortBy(_.getKey)
    println(f"query=$name wall=$wall%.3f s jobs=${jobs.length} " +
      f"taskTimeSum=${taskTime.get() / 1e3}%.3f s tasks=${taskCount.get()}")
    jobs.foreach(e => println(f"  job ${e.getKey}%3d  wall=${e.getValue / 1e3}%.3f s"))
    spark.stop()
  }
}
