package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Everything here is HASH-based (md5 of the row id), not RNG-based:
  * the same row lands in the same bucket on every run, every engine,
  * and every cluster size — which is what reproducible train/test
  * splits and resumable pipelines need. (Spark's `sample()` is
  * seed-stable only within one partition layout; a repartition or a
  * different engine reshuffles membership.)
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row id: the engine's
    * shared md5-60-bit idiom ([[graft.functions.Hashing]]) mod buckets.
    * Uniform for any id distribution; portable (DuckDB:
    * `('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT % buckets`).
    */
  def hashBucket(id: Column, buckets: Int): Column =
    graft.functions.Hashing.md5Bucket(id.cast("string"), buckets.toLong)

  /** Keep ~`pct`% of rows, deterministically by id. */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < pct)

  /** Tag each row train/test with a ~`testPct`% test share. A narrow
    * projection — the split never shuffles; downstream writers can
    * `partitionBy("split")`.
    */
  def trainTestSplit(df: DataFrame, idCol: String, testPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(idCol), 100) < testPct, lit("test")).otherwise(lit("train")))

  /** Per-stratum row counts — the quick balance check after sampling
    * (one aggregate pass).
    */
  def strataCounts(df: DataFrame, strata: Seq[String]): DataFrame =
    df.groupBy(strata.map(col): _*).agg(count(lit(1)).as("n_rows"))
}
