package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's portable-hash primitive, used by dedup signatures and
  * deterministic sampling alike: first 15 hex chars of md5 parsed as a
  * bigint — 60 bits, always positive in a signed 64-bit integer, and
  * reproducible in any engine with md5
  * (DuckDB: `('0x' || substr(md5(x), 1, 15))::BIGINT`).
  *
  * ONE definition on purpose: every DuckDB oracle mirrors this exact
  * idiom, so changing it here is the single place the contract lives.
  */
object Hashing {

  /** 60-bit md5-derived hash of a string column. */
  def md5Bits60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Stable bucket in [0, buckets): [[md5Bits60]] mod buckets. */
  def md5Bucket(c: Column, buckets: Long): Column =
    pmod(md5Bits60(c), lit(buckets))
}
