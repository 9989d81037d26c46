package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, NswIndex}

/** Round-14 graph-ANN study → tools/ann_nsw_study_r14.json.
  *
  * Decomposes approximate-NN loss into its two independent sources —
  * IVF cell-miss (which cells are probed) and walk-miss (what the
  * graph search skips inside a probed cell) — by comparing, at the
  * SAME probed cells and SAME L2 metric: the NSW walk, the full-cell
  * scan, and exact brute force. Cost unit = distance evaluations: the
  * walk wins when cells outgrow ef·degree (nList sweep shows the
  * crossover — tiny cells are cheaper to scan, which is exactly why
  * the serving ladder keeps BOTH rungs).
  *
  * Usage: runMain graft.AnnNswStudy <sfDir>
  */
object AnnNswStudy {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val n = emb.count()

    val pD = probes.select(col("vec_id").as("probe_id"),
      col("embedding").cast("array<double>").as("pv"))
    val cD = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("cv"))
    val w5 = Window.partitionBy("probe_id").orderBy(col("d2"), col("vec_id"))
    val want = cD.join(broadcast(pD), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.VectorOps.sqDist(col("pv"), col("cv")).as("d2"))
      .withColumn("rk", row_number().over(w5)).where(col("rk") <= 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }

    def recallOf(pairs: Array[(Long, Long)]): Double = {
      val got = pairs.groupBy(_._1).map { case (p, xs) =>
        p -> xs.map(_._2).toSet }
      want.toSeq.map { case (p, ws) =>
        got.getOrElse(p, Set.empty).count(ws.contains)
      }.sum.toDouble / (want.size * 5)
    }

    val sections = Seq(4, 16).map { nList =>
      val model = IvfIndex.train(emb, nList = nList)
      val graphs = NswIndex.build(emb, model, m = 8, efC = 64)
        .localCheckpoint(true)
      val byCell = graphs.collect().map(g => g.cell -> g).toMap
      val cellSizes = byCell.values.map(_.ids.length).toSeq.sorted

      def scanPairs(nProbe: Int): Array[(Long, Long)] = {
        val cC = emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("cv"),
          IvfIndex.assignCell(col("embedding"), model).as("cell"))
        val pC = probes.select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("pv"),
          explode(IvfIndex.probeCells(col("embedding"), model, nProbe))
            .as("cell"))
        cC.join(broadcast(pC),
            cC("cell") === pC("cell") && col("vec_id") =!= col("probe_id"))
          .select(col("probe_id"), col("vec_id"),
            graft.functions.VectorOps.sqDist(col("pv"), col("cv")).as("d2"))
          .withColumn("rk", row_number().over(w5)).where(col("rk") <= 5)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }

      val rows = for {
        nProbe <- Seq(1, 2, 4)
        ef <- Seq(16, 32, 64)
      } yield {
        def pairsOf(scanBelow: Int) =
          NswIndex.topK(graphs, probes, model, k = 5,
              nProbe = nProbe, ef = ef, scanBelow = scanBelow)
            .select("probe_id", "vec_id").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
        val rNsw = recallOf(pairsOf(0)) // pure walk
        val rPolicy = recallOf(pairsOf(-1)) // r15 auto walk-vs-scan
        // eval cost of walk vs policy vs scan over the SAME cells
        val pc = probes.select(col("vec_id").cast("long").as("probe_id"),
            col("embedding").cast("array<double>").as("pv"),
            explode(IvfIndex.probeCells(col("embedding"), model, nProbe))
              .as("cell"))
          .as[(Long, Seq[Double], Int)].collect()
        var walkEvals = 0L; var policyEvals = 0L; var scanEvals = 0L
        val cutoff = NswIndex.autoScanBelow(ef)
        pc.foreach { case (_, pv, cell) =>
          byCell.get(cell).foreach { g =>
            walkEvals +=
              NswIndex.searchCell(g.vecs, g.adj, pv.toArray, ef, 0)._2
            policyEvals +=
              NswIndex.searchCell(g.vecs, g.adj, pv.toArray, ef, cutoff)._2
            scanEvals += g.ids.length
          }
        }
        val rScan = recallOf(scanPairs(nProbe))
        f"""{"nProbe":$nProbe,"ef":$ef,"recall5_nsw":$rNsw%.4f,"recall5_policy":$rPolicy%.4f,"recall5_scan":$rScan%.4f,"walk_evals_per_probe":${walkEvals.toDouble / want.size}%.1f,"policy_evals_per_probe":${policyEvals.toDouble / want.size}%.1f,"scan_evals_per_probe":${scanEvals.toDouble / want.size}%.1f,"eval_ratio":${walkEvals.toDouble / scanEvals}%.3f,"policy_ratio":${policyEvals.toDouble / scanEvals}%.3f}"""
      }
      s"""{"nList":$nList,"cell_sizes":[${cellSizes.mkString(",")}],""" +
        s""""points":[${rows.mkString(",")}]}"""
    }
    val out = s"""{"sf":"$sfDir","n":$n,"m":8,"efC":64,""" +
      s""""probes":${want.size},"sections":[${sections.mkString(",")}]}"""
    println(out)
    val p = java.nio.file.Paths.get("tools/ann_nsw_study_r15.json")
    java.nio.file.Files.write(p, (out + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
