package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §5). First line of defense is AQE's
  * runtime skew-join splitting (on by default); salting is for the
  * shapes AQE can't fix — e.g. one ultra-hot key in a shuffle join
  * whose matching build rows still all land in one task, or skewed
  * aggregations feeding a join.
  */
object SkewTools {

  /** Salted equi-join: the (big, skewed) side gets a deterministic salt
    * in [0, salts); the small side is replicated once per salt value.
    * Hot keys fan out over `salts` tasks; result equals the plain join.
    *
    * Salt is derived by hashing the big side's whole row (xxhash64),
    * not rand(): deterministic across retries — a failed task recompute
    * lands rows in the same buckets, which exactly-once sinks need.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0)
    val bigCols = big.columns.map(col).toSeq
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(bigCols: _*)), lit(salts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop("_salt").drop(replicated(key))
  }
}
