package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement (round 12, verdict task #4 carried from round 10):
  * prove the hot-bucket guard's ADVERTISED escapes actually complete,
  * with wall numbers, on a corpus where the guard refuses.
  *
  * Corpus: every sf0.1 document cloned `k`× VERBATIM (distinct ids,
  * round-robin over chunks) — the low-entropy shape the guard exists
  * for: every clone group collapses into one band bucket per band, so
  * the band self-join predicts ≥ bands · groups · k(k−1)/2 pairs.
  * With k=10 over 5 000 docs that is ≥ 7.2·10⁶ predicted candidates;
  * the study bound (5·10⁶) models a cluster operator's budget and
  * makes `minhashPairsFromSigs` refuse loudly — the designed outcome.
  *
  * Escapes measured (each against the SAME bound the direct run
  * refused under, so "completes" means "fits the budget", not "we
  * raised the budget"):
  *  1. exact-dedup FIRST (guard message escape #1): verbatim copies
  *     collapse via one 16-byte-key groupBy; minhash runs on the
  *     canonical survivors only. The pairs found are canonical-level;
  *     clone-group membership is the exact-dedup output itself.
  *  2. raise rows-per-band (escape #2): bands 32 → 16 halves the
  *     per-pair band hits (verbatim clones collide in EVERY band, so
  *     predicted ∝ bands) — completes iff halving crosses the budget;
  *     recall drops for borderline near-dups (recorded, not hidden).
  *  3. incremental store (escape #3, `minhashPairsAgainst`): ingest
  *     in `k` chunks of one clone per group; per-increment predicted
  *     work is bounded by chunk × store, never the full quadratic.
  *
  * Run: `sbt "runMain graft.SkewEscapeStudy [sfDir] [k]"` → one JSON
  * line per arm.
  */
object SkewEscapeStudy {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    // the budget under test; the default models a cluster operator's
    // per-job candidate budget and refuses sf0.1×10 clones (≥7.2M
    // predicted) while natural sf0.1 passes
    val StudyBound = args.lift(2).map(_.toLong).getOrElse(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    // chunk c holds clone c of every group → no intra-chunk clones,
    // the steady-ingest shape (replays arrive later, not together)
    val chunks = (0 until k).map { c =>
      base.select((col("doc_id") * k + c).as("doc_id"), col("text"))
        .localCheckpoint(true)
    }
    val corpus = chunks.reduce(_.unionByName(_)).localCheckpoint(true)
    val n = corpus.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def line(arm: String, fields: String): Unit =
      println(s"""{"study":"skew_escape_r12","sf":"$sfDir","k":$k,"docs":$n,"bound":$StudyBound,$fields}""")

    // --- arm 0: direct run refuses (the precondition) --------------
    val (refused, wRefuse) = timed {
      try {
        operators.Dedup.minhashPairs(corpus, "doc_id", "text",
          maxCandidates = StudyBound).count(); false
      } catch { case e: IllegalStateException
          if Option(e.getMessage).exists(_.contains("maxCandidates")) =>
        true }
    }
    line("direct", f""""arm":"direct","refused":$refused,"sec":$wRefuse%.1f""")
    require(refused, "study precondition: the guard must refuse the direct run")

    // --- arm 1: exact-dedup first ----------------------------------
    val (r1, w1) = timed {
      val keepers = corpus
        .groupBy(xxhash64(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      val canonical = keepers.join(corpus, "doc_id")
        .select("doc_id", "text").localCheckpoint(true)
      val pairs = operators.Dedup.minhashPairs(canonical, "doc_id", "text",
        maxCandidates = StudyBound).count()
      (canonical.count(), pairs)
    }
    line("exact_first",
      f""""arm":"exact_first","canonical_docs":${r1._1},"near_dup_pairs":${r1._2},"sec":$w1%.1f,"completed":true""")

    // --- arm 2: raise rows-per-band (bands 32 -> 16) ---------------
    val (r2, w2) = timed {
      try Right(operators.Dedup.minhashPairs(corpus, "doc_id", "text",
        bands = 16, maxCandidates = StudyBound).count())
      catch { case e: IllegalStateException
          if Option(e.getMessage).exists(_.contains("maxCandidates")) =>
        Left("refused") }
    }
    line("fewer_bands", r2 match {
      case Right(p) => f""""arm":"fewer_bands","near_dup_pairs":$p,"sec":$w2%.1f,"completed":true"""
      case Left(_) => f""""arm":"fewer_bands","sec":$w2%.1f,"completed":false,"note":"still over budget""""
    })

    // --- arm 3: incremental store (one chunk at a time) ------------
    val (r3, w3) = timed {
      var store: DataFrame = null
      var crossPairs = 0L
      var maxIncSec = 0.0
      chunks.foreach { ch =>
        val (_, incSec) = timed {
          val sigs = operators.Dedup.signatures(ch, "doc_id", "text")
            .localCheckpoint(true)
          if (store != null)
            crossPairs += operators.Dedup
              .minhashPairsAgainst(sigs, store).count()
          store = if (store == null) sigs
            else store.unionByName(sigs).localCheckpoint(true)
        }
        maxIncSec = math.max(maxIncSec, incSec)
      }
      (crossPairs, maxIncSec)
    }
    line("incremental",
      f""""arm":"incremental","increments":$k,"cross_pairs":${r3._1},"max_increment_sec":${r3._2}%.1f,"sec":$w3%.1f,"completed":true""")
    spark.stop()
  }
}
