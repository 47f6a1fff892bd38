package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * First line of defense at the 100 TB tier is AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default), which
  * handles skewed SHUFFLE partitions transparently. Salting is the
  * manual fallback for the case AQE cannot fix: a replicated-broadcast
  * pattern where one hot key would pin a whole post-shuffle partition
  * to a single task even after splitting — e.g. a dimension that is
  * slightly too big to broadcast joined against a fact with a few
  * dominant keys.
  */
object Skew {

  /** Salted equi-join: the small side is replicated `salts` times (one
    * copy per salt), the large side is spread deterministically across
    * salts by hashing its whole row — so each hot key's rows fan out
    * over `salts` reducers instead of one. Result is row-identical to
    * `large.join(small, key, how)`.
    *
    * Deterministic (xxhash64 of all large-side columns, no rand()):
    * task retries re-produce the same salt per row, which speculative
    * execution and exactly-once sinks require.
    *
    * `how` supports the fact-side-preserving joins ("inner", "left");
    * right/full would need the salt on the other side.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: Seq[String],
      salts: Int,
      how: String = "inner"): DataFrame = {
    require(how == "inner" || how == "left", s"saltedJoin supports inner/left, got $how")
    val saltArr = array((0 until salts).map(lit): _*)
    val smallSalted = small.withColumn("__salt", explode(saltArr))
    val largeSalted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(salts)).cast("int"))
    largeSalted.join(smallSalted, key :+ "__salt", how).drop("__salt")
  }

  /** Diagnostic: rows per key, descending — the quick way to see
    * whether a join key needs salting at all.
    */
  def keyHistogram(df: DataFrame, key: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
      .limit(topN)
}
