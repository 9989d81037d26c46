package graft

import scala.collection.mutable
import scala.sys.process._

/** Jar-vs-jar A/B bench harness — pins the SURVEY §11 drift
  * methodology as a one-command tool (round-8 verdict item #8): run
  * the stock `graft.Bench` main against TWO build artifacts, the
  * whole-bench invocations INTERLEAVED (A,B,A,B,…) inside one host
  * window so host-throughput drift hits both sides equally, and
  * report min-of-N totals plus the per-query min deltas. This is
  * exactly the experiment that settled the r6-vs-r7 drift question;
  * future "did round N regress?" questions are now one command.
  *
  * Usage (from sbt: `runMain graft.BenchAB --a … --b …`):
  *   --a <classes-or-jar>   build A (e.g. a git-worktree's
  *                          target/scala-2.13/classes)
  *   --b <classes-or-jar>   build B
  *   --runs N               whole-bench passes per side (default 3)
  *   --sf DIR               data dir (default /root/testdata/sf0.1)
  *   --cpus N               local[N] for the children (default 32)
  *
  * Children run `java -cp <side>:<spark-jars> graft.Bench` with the
  * same JDK-17 add-opens the build uses, so the measurement is the
  * round bench verbatim. A missing query (an older jar that predates
  * it) reports -1 from Bench and is EXCLUDED from both sides' totals,
  * so the comparison covers the shared-runnable set — the r6-jar
  * lesson (it could not read the newer events encoding at all).
  */
object BenchAB {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private val queryRe = """"([A-Za-z0-9_]+)":(-?[0-9.]+)""".r
  // only the named per-query SECTIONS are harvested — scraping every
  // "key":number pair would silently sum any future top-level numeric
  // field (a new metric, a count) into both sides' totals (ADVICE r9)
  private val sectionRe = """"(?:queries|pipeline|analytics)":\{([^}]*)\}""".r

  /** Run one child bench; returns every query->seconds pair found in
    * the per-query sections ("queries"/"pipeline"/"analytics") — and
    * only those; top-level numeric fields like value/pipeline_total
    * are structurally excluded.
    *
    * Round 14: the bench's stdout line went compact (the driver's tail
    * capture clipped the 2.4 KB full line — BENCH_r13.json parsed
    * null), with per-query detail moved to tools/bench_detail_latest
    * .json in the child's CWD. So each child runs in its OWN temp CWD
    * and we harvest the detail file when present, falling back to the
    * stdout line for pre-r14 jars that still print everything.
    */
  private def runChild(cp: String, sf: String, cpus: String): Map[String, Double] = {
    val cwd = java.nio.file.Files.createTempDirectory("benchab_child").toFile
    val cmd = Seq("java") ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Xmx8g", "-cp", cp, "graft.Bench")
    val out = mutable.ArrayBuffer.empty[String]
    val rc = Process(cmd, cwd,
      "SPARK_GRAFT_SF_DIR" -> sf, "SPARK_GRAFT_CPUS" -> cpus)
      .!(ProcessLogger(out += _, l => System.err.println(s"  [child] $l")))
    require(rc == 0, s"child bench exited $rc")
    val detailPath = cwd.toPath.resolve("tools/bench_detail_latest.json")
    val line =
      if (java.nio.file.Files.exists(detailPath))
        new String(java.nio.file.Files.readAllBytes(detailPath), "UTF-8")
      else out.reverse.find(_.startsWith("{\"metric\""))
        .getOrElse(sys.error("no bench JSON line in child output"))
    sectionRe.findAllMatchIn(line).flatMap(s =>
      queryRe.findAllMatchIn(s.group(1))
        .map(m => m.group(1) -> m.group(2).toDouble))
      .toMap
  }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val a = opts.getOrElse("a", sys.error("--a <classes-or-jar> required"))
    val b = opts.getOrElse("b", sys.error("--b <classes-or-jar> required"))
    val runs = opts.getOrElse("runs", "3").toInt
    val sf = opts.getOrElse("sf", "/root/testdata/sf0.1")
    val cpus = opts.getOrElse("cpus", "32")
    val sparkJars = "/opt/spark/jars/*"

    val passes = mutable.Map("a" -> mutable.ArrayBuffer.empty[Map[String, Double]],
      "b" -> mutable.ArrayBuffer.empty[Map[String, Double]])
    (1 to runs).foreach { i =>
      Seq("a" -> a, "b" -> b).foreach { case (side, cp) =>
        System.err.println(s"[benchab] pass $i side $side")
        passes(side) += runChild(s"$cp:$sparkJars", sf, cpus)
      }
    }

    def mins(side: String): Map[String, Double] =
      passes(side).flatMap(_.toSeq).groupBy(_._1).map { case (k, vs) =>
        val ok = vs.map(_._2).filter(_ >= 0)
        k -> (if (ok.isEmpty) -1.0 else ok.min)
      }
    val ma = mins("a"); val mb = mins("b")
    // shared-runnable set only: a query either side cannot run is
    // reported per-query as -1 but kept out of both totals
    val shared = (ma.keySet & mb.keySet)
      .filter(k => ma(k) >= 0 && mb(k) >= 0).toSeq.sorted
    val ta = shared.map(ma).sum
    val tb = shared.map(mb).sum
    val perQuery = (ma.keySet | mb.keySet).toSeq.sorted.map { k =>
      val va = ma.getOrElse(k, -1.0); val vb = mb.getOrElse(k, -1.0)
      s""""$k":{"a":${f"$va%.3f"},"b":${f"$vb%.3f"}}"""
    }.mkString("{", ",", "}")
    println(f"""{"metric":"ab","runs":$runs,"shared_queries":${shared.size},"total_a":$ta%.3f,"total_b":$tb%.3f,"ratio_b_over_a":${if (ta > 0) tb / ta else -1.0}%.3f,"queries":$perQuery,"sf":"$sf"}""")
  }
}
