package graft

class TemporalFunctionsSpec extends SparkFunSuite {

  test("CH temporal truncations: week/quarter/year/quarter-number/iso-week") {
    GraftExtensions.install(spark)
    // 2024-07-25 is a Thursday
    val r = spark.sql(
      """SELECT
        | toStartOfWeek(DATE '2024-07-25') AS sun_week,
        | toMonday(DATE '2024-07-25') AS mon_week,
        | toStartOfQuarter(DATE '2024-07-25') AS q_start,
        | toStartOfYear(TIMESTAMP '2024-07-25 13:45:00') AS y_start,
        | toQuarter(DATE '2024-07-25') AS q,
        | toISOWeek(DATE '2024-01-04') AS iso""".stripMargin).collect()(0)
    assert(r.getDate(0).toString == "2024-07-21") // Sunday (CH mode 0)
    assert(r.getDate(1).toString == "2024-07-22") // Monday
    assert(r.getDate(2).toString == "2024-07-01")
    assert(r.getDate(3).toString == "2024-01-01")
    assert(r.getInt(4) == 3)
    assert(r.getInt(5) == 1) // Jan 4 is always ISO week 1
  }

  test("CH interval arithmetic: add*/subtract*") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT
        | addDays(TIMESTAMP '2024-02-28 10:00:00', 2) AS d,
        | addHours(TIMESTAMP '2024-12-31 23:30:00', 1) AS h,
        | addMonths(TIMESTAMP '2024-01-31 00:00:00', 1) AS m,
        | addYears(TIMESTAMP '2020-02-29 00:00:00', 1) AS y,
        | subtractDays(TIMESTAMP '2024-03-01 00:00:00', 1) AS sd,
        | subtractMonths(TIMESTAMP '2024-03-31 00:00:00', 1) AS sm""".stripMargin)
      .collect()(0)
    assert(r.getTimestamp(0).toString == "2024-03-01 10:00:00.0") // leap year
    assert(r.getTimestamp(1).toString == "2025-01-01 00:30:00.0")
    assert(r.getTimestamp(2).toString == "2024-02-29 00:00:00.0") // clamped
    assert(r.getTimestamp(3).toString == "2021-02-28 00:00:00.0") // clamped
    assert(r.getTimestamp(4).toString == "2024-02-29 00:00:00.0")
    assert(r.getTimestamp(5).toString == "2024-02-29 00:00:00.0")
  }
}
