package graft

import org.apache.spark.sql.functions._

/** Pins the round-14 inline gates: q_holt_linear's integer fold
  * against a driver-side replica, and the text_multisearch /
  * text_ngram_sim matchers against hand-computed rows — each over the
  * sf0.001 fixture the gates actually run on.
  */
class HoltTextMatchSpec extends SparkFunSuite {

  /** Driver-side Holt replica: l₁=y₁, b₁=y₂−y₁, then the dyadic
    * floor-div recurrence for t=2..n. Floor div (not trunc) — the
    * same ((a − pmod) / n) identity the gate uses.
    */
  private def holt(ys: Seq[Long]): (Long, Long) = {
    def fd(a: Long, n: Long): Long = {
      val m = ((a % n) + n) % n
      (a - m) / n
    }
    var l = ys.head
    var b = ys(1) - ys.head
    for (y <- ys.drop(1)) {
      val lp = fd(y + 3 * l + 3 * b, 4)
      b = fd(lp - l + 7 * b, 8)
      l = lp
    }
    (l, b)
  }

  test("q_holt_linear matches the driver-side integer fold per type") {
    val out = AnalyticsQueries.queries("q_holt_linear")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("level_c"), r.getAs[Long]("trend_c"),
          r.getAs[Long]("forecast7_c"))).toMap
    // independent daily aggregation, deliberately via a different path
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    assert(out.nonEmpty)
    for ((tpe, ys) <- daily if ys.size >= 2) {
      val (l, b) = holt(ys)
      assert(out(tpe) == ((l, b, l + 7 * b)), s"mismatch for $tpe")
    }
  }

  test("holt recurrence handles a falling series (negative trend)") {
    val (l, b) = holt(Seq(1000L, 800L, 600L, 400L, 200L))
    assert(b < 0, s"trend should be negative, got $b")
    // floor-div determinism on negatives: re-run is identical
    assert(holt(Seq(1000L, 800L, 600L, 400L, 200L)) == ((l, b)))
  }

  test("text_multisearch: first-by-position, ties to the earlier needle") {
    val out = TextQueries.queries("text_multisearch")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_match"), r.getAs[Long]("first_idx"),
          r.getAs[Long]("first_pos"))).toMap
    val needles = Seq("spark", "hash", "window", "merge")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    for ((id, t) <- docs) {
      val pos = needles.map(n => t.indexOf(n) + 1) // 0 = absent
      val hits = pos.zipWithIndex.filter(_._1 > 0)
      val exp =
        if (hits.isEmpty) (0L, 0L, 0L)
        else {
          val (p, i) = hits.minBy(h => (h._1, h._2)) // pos, then needle order
          (hits.size.toLong, (i + 1).toLong, p.toLong)
        }
      assert(out(id) == exp, s"doc $id: ${out(id)} != $exp")
    }
  }

  test("text_ngram_sim: exact 3-gram jaccard counts, short-text empty set") {
    val out = TextQueries.queries("text_ngram_sim")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("inter"),
          r.getAs[Long]("uni"), r.getAs[Long]("sim_ppm"))).toMap
    val qset = "hash join table scan".sliding(3).toSet
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    for ((id, t) <- docs) {
      val grams: Set[String] =
        if (t.length < 3) Set.empty else t.sliding(3).toSet
      val inter = (grams intersect qset).size.toLong
      val uni = grams.size + qset.size - inter
      val exp = (grams.size.toLong, inter, uni, inter * 1000000L / uni)
      assert(out(id) == exp, s"doc $id: ${out(id)} != $exp")
    }
  }
}
