package graft

import org.apache.spark.sql.functions._
import graft.operators.IvfIndex

/** trainTwoLevel's empty-super-cell degradation (round-10 review):
  * level 1 and level 2 sample with DIFFERENT salts, so a super-cell
  * can exist in the level-1 model yet contribute zero rows to the
  * level-2 sample — the fallback must hand it ONE sub-cell (its
  * level-1 centroid) instead of aborting, and assignment must stay
  * total.
  *
  * The scenario is CONSTRUCTED, not hoped for: outliers are chosen by
  * their actual filter hashes — inside level-1's sample (so they seed
  * a super-cell; negative coordinates make them lexicographic bucket
  * minima) and outside level-2's (so that super-cell gets no level-2
  * seeds).
  */
class Ivf2FallbackSpec extends SparkFunSuite {

  test("super-cell sampled away at level 2 degrades to its centroid") {
    // 40000 uniform non-negative vectors; level-2 target = 32*8*2 =
    // 512, so its ratio = floor(nAll/512) = 78 for any nAll in
    // [39936, 40447]; level-1 target = 32*8 = 256 -> ratio 156
    val main = spark.range(40000).selectExpr(
      "id AS vec_id",
      """transform(sequence(0, 7),
        |  i -> CAST(pmod(xxhash64(id, i), 100) / 100.0 AS FLOAT))
        |AS embedding""".stripMargin)
    // candidate outliers at -50..-59: lexicographically SMALLEST, so
    // any that enters a seeding bucket wins its bucket-min
    val cand = spark.range(3000).selectExpr(
      "id + 1000000 AS vec_id",
      """transform(sequence(0, 7),
        |  i -> CAST(-50.0 - pmod(xxhash64(id, i), 10) AS FLOAT))
        |AS embedding""".stripMargin)
    val dv = col("embedding").cast("array<double>")
    // level-1 target = 32*k1 = 256 -> ratio 156; level-2 target =
    // 32*k1*k2 = 512 -> ratio 78 (review r10c: the two moduli differ)
    val pick = cand.select(col("vec_id"),
        pmod(xxhash64(lit(0x5eedL), dv), lit(156L)).as("f1"),
        pmod(xxhash64(lit(0x5eed2L), dv), lit(78L)).as("f2"))
      .where(col("f1") === 0 && col("f2") =!= 0) // in sample1, not sample2
      .orderBy("vec_id").limit(8).select("vec_id")
    val outliers = cand.join(pick, "vec_id")
    val nOut = outliers.count()
    assert(nOut >= 1, "construction needs at least one in-1-not-2 outlier")
    val corpus = main.unionByName(outliers)

    val m = IvfIndex.trainTwoLevel(corpus, k1 = 8, k2 = 2, maxIter = 2,
      samplesPerCentroid = 32)
    // the outlier super-cell got no level-2 seeds -> its sub-quantizer
    // IS its level-1 centroid (the degradation the review demanded)
    val fellBack = m.sub.zipWithIndex.exists { case (sm, c) =>
      sm.nList == 1 && sm.centroids.head == m.level1.centroids(c)
    }
    assert(fellBack, s"fallback did not fire; subs=${m.sub.map(_.nList)}")
    // and the model stays fully serviceable
    assert(m.sub.forall(_.nList >= 1))
    val cells = corpus.select(
        IvfIndex.assignCell2(col("embedding"), m).as("cell"))
      .groupBy("cell").count().collect()
    assert(cells.map(_.getLong(1)).sum == 40000L + nOut)
    assert(cells.map(_.getInt(0)).forall(c => c >= 0 && c < m.nCells))
  }
}
