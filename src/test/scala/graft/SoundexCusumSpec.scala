package graft

import org.apache.spark.sql.functions._

/** Pins text_soundex against the textbook Soundex vectors and
  * q_cusum against a driver-side replica.
  */
class SoundexCusumSpec extends SparkFunSuite {

  import spark.implicits._

  test("soundex expression reproduces the textbook vectors") {
    // the classic NARA examples, including the H/W rule (Ashcraft,
    // Tymczak) and first-letter-run dropping (Pfister)
    val vectors = Seq(
      "Robert" -> "R163", "Rupert" -> "R163", "Ashcraft" -> "A261",
      "Ashcroft" -> "A261", "Tymczak" -> "T522", "Pfister" -> "P236",
      "Honeyman" -> "H555", "Washington" -> "W252", "Lee" -> "L000",
      "Gutierrez" -> "G362", "Jackson" -> "J250")
    val got = vectors.map(_._1).toDF("w")
      .select(col("w"), expr(TextQueries.soundexExprSql("w")).as("code"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((w, exp) <- vectors)
      assert(got(w) == exp, s"$w: ${got(w)} != $exp")
  }

  test("q_cusum matches a driver-side integer replica") {
    val out = AnalyticsQueries.queries("q_cusum")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("change_day"),
          r.getAs[Long]("max_abs_cusum"))).toMap
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(1), r.getLong(2))).toSeq).toMap
    for ((tpe, series) <- daily) {
      val meanF = series.map(_._2).sum / series.size
      var acc = 0L
      val cusums = series.map { case (day, c) =>
        acc += c - meanF; (day, acc)
      }
      val (day, cu) = cusums.minBy { case (dd, c) => (-math.abs(c), dd) }
      assert(out(tpe) == ((series.size.toLong, day, math.abs(cu))),
        s"$tpe: ${out(tpe)}")
    }
  }
}
