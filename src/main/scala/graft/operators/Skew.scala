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
    * All four outer-ness variants are supported. "inner"/"left" run
    * directly on the salted machinery. "right"/"full" cannot — a
    * small-side row is replicated `salts` times, so a naive outer join
    * would emit `salts` null-extended copies of every unmatched small
    * row. They are composed instead: the salted "inner"/"left" core
    * plus a null-extended union of the unmatched small rows, found by
    * anti-joining `small` against the DISTINCT large keys. That
    * distinct is a shuffle at KEY cardinality with map-side partial
    * aggregation — the hot keys salting exists for are exactly the
    * ones that collapse in the partial — so the outer extension never
    * touches the skewed fan-out path.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: Seq[String],
      salts: Int,
      how: String = "inner"): DataFrame = how match {
    case "inner" | "left" =>
      val saltArr = array((0 until salts).map(lit): _*)
      val smallSalted = small.withColumn("__salt", explode(saltArr))
      val largeSalted = large.withColumn("__salt",
        pmod(xxhash64(large.columns.toIndexedSeq.map(col): _*), lit(salts)).cast("int"))
      largeSalted.join(smallSalted, key :+ "__salt", how).drop("__salt")
    case "right" | "full" =>
      // Preserved-large half: full keeps unmatched large rows (left),
      // right drops them (inner). Unmatched-small half is shared.
      val base = saltedJoin(large, small, key, salts,
        if (how == "full") "left" else "inner")
      val unmatchedSmall = small.join(
        large.select(key.map(col): _*).distinct(), key, "left_anti")
      // Null keys never equi-match, so null-key small rows fall out of
      // the anti-join as unmatched — same as a plain outer join.
      val extended = unmatchedSmall.select(
        key.map(col) ++
          large.columns.filterNot(key.contains).map(c =>
            lit(null).cast(large.schema(c).dataType).as(c)) ++
          small.columns.filterNot(key.contains).map(col): _*)
      base.unionByName(extended)
    case other =>
      throw new IllegalArgumentException(
        s"saltedJoin supports inner/left/right/full, got $other")
  }

  /** Diagnostic: rows per key, descending — the quick way to see
    * whether a join key needs salting at all. Ties at the cut break
    * on the key columns ascending, so the top-N is deterministic
    * across runs, partitionings, and engines (an orderBy on count
    * alone leaves the cut boundary to shuffle order). Plans as
    * TakeOrdered over the aggregate — never a full sort.
    */
  def keyHistogram(df: DataFrame, key: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc +: key.map(col): _*)
      .limit(topN)
}
