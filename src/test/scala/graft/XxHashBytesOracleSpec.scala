package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

/** Bit-exactness of DedupOracles.xxh64BytesCtes — the VARIABLE-LENGTH
  * XXH64 DuckDB kernel — against Spark's own `xxhash64` over strings,
  * executed live on both engines. Lengths cover every branch: empty,
  * each 1/4/8-byte tail combination, the 31/32/33 stripe boundary,
  * multi-stripe, and multi-byte UTF-8.
  */
class XxHashBytesOracleSpec extends SparkFunSuite {
  import spark.implicits._

  private val samples: Seq[String] = Seq(
    "", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
    "abcdefgh", "abcdefghi", "abcdefghijkl", "abcdefghijklm",
    "0123456789012345678901234567890",   // 31: max non-stripe
    "01234567890123456789012345678901",  // 32: exactly one stripe
    "012345678901234567890123456789012", // 33: stripe + 1-byte tail
    "x" * 40,                            // stripe + 8-byte tail
    "w" * 44,                            // stripe + 8+4 tail
    "v" * 47,                            // stripe + 8+4+3 tail
    "y" * 64, "z" * 100, "q" * 129,
    "héllo wörld → ∑",                   // multi-byte UTF-8
    "日本語テキスト、バイト境界テスト")  // 3-byte code points

  test("duckdb bytes kernel reproduces spark xxhash64 on every length class") {
    val sparkSide = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
      .select(col("id"), xxhash64(col("s")).as("h"))
      .as[(Long, Long)].collect().toMap

    val c = DriverManager.getConnection("jdbc:duckdb:")
    try {
      c.createStatement().executeUpdate("CREATE TABLE src (id BIGINT, s VARCHAR)")
      val ins = c.prepareStatement("INSERT INTO src VALUES (?, ?)")
      samples.zipWithIndex.foreach { case (s, i) =>
        ins.setLong(1, i.toLong); ins.setString(2, s); ins.addBatch()
      }
      ins.executeBatch()
      val sql = s"WITH ${DedupOracles.xxh64BytesCtes("src", "id", "s")} " +
        "SELECT id, hu FROM xh ORDER BY id"
      if (sys.env.contains("GRAFT_DUMP_SQL"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/tmp/xxh64_bytes.sql"), sql)
      val rs = c.createStatement().executeQuery(sql)
      val mask = BigInt(1) << 64
      var checked = 0
      while (rs.next()) {
        val id = rs.getLong(1)
        val hu = BigInt(rs.getBigDecimal(2).toBigInteger)
        val expected = (BigInt(sparkSide(id)) + mask) % mask // signed -> unsigned
        assert(hu == expected,
          s"mismatch for sample $id (${samples(id.toInt).take(20)}...): duckdb $hu vs spark $expected")
        checked += 1
      }
      assert(checked == samples.size)
    } finally c.close()
  }
}
