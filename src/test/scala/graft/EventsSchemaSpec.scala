package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Schema contract for the events table — the test that would have
  * caught the round-7 testdata regeneration the day it happened.
  *
  * The driver's testdata has shipped `events.ts` under two different
  * physical parquet encodings across rounds: TIMESTAMP(NANOS) (read by
  * Spark as an epoch-nanos bigint under
  * `spark.sql.legacy.parquet.nanosAsLong=true`) and TIMESTAMP(MICROS)
  * (read as TIMESTAMP_NTZ). [[Tables.normalizeTs]] must map BOTH onto
  * one canonical contract — `ts` is TIMESTAMP_NTZ at microsecond
  * precision — because every events query codes against it.
  */
class EventsSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("the shipped events.parquet normalizes to the canonical TIMESTAMP_NTZ contract") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampNTZType,
      s"canonical ts must be TIMESTAMP_NTZ, got ${ev.schema("ts").dataType}")
    // The canonical column must be usable by both consumer shapes:
    // date bucketing and exact epoch-micros arithmetic.
    val row = ev.select(
      min(to_date(col("ts"))).as("d"),
      min(Tables.tsMicros(col("ts"))).as("us")).head()
    assert(row.getDate(0) != null)
    // Sanity window: epoch micros for any plausible event time
    // (2000-01-01 .. 2100-01-01).
    val us = row.getLong(1)
    assert(us > 946684800000000L && us < 4102444800000000L,
      s"epoch-micros out of plausible range: $us")
  }

  test("events() self-heals a non-UTC session timezone (NTZ casts are UTC-only)") {
    // normalizeTs's TimestampType->NTZ cast and tsMicros's NTZ->
    // TimestampType cast are value-preserving ONLY under UTC; on a
    // session left at a local timezone they would shift wall-clock
    // silently (events_daily landing on the wrong day, no error).
    // events() must pin the conf back, like it pins nanosAsLong.
    val key = "spark.sql.session.timeZone"
    val before = spark.conf.get(key)
    try {
      spark.conf.set(key, "America/New_York")
      val ev = Tables.events(spark, dir)
      assert(spark.conf.get(key) == "UTC",
        "events() must restore the UTC contract on a drifted session")
      // And the values are the same as a clean-session read.
      val us = ev.select(min(Tables.tsMicros(col("ts")))).head().getLong(0)
      val us2 = Tables.events(spark, dir)
        .select(min(Tables.tsMicros(col("ts")))).head().getLong(0)
      assert(us == us2)
    } finally spark.conf.set(key, before)
  }

  test("normalizeTs maps both physical encodings to identical instants") {
    import spark.implicits._
    // One known instant: 2024-03-05 12:34:56.789012 UTC.
    val micros = 1709642096789012L

    // Branch 1: epoch-nanos bigint — exactly what the legacy
    // TIMESTAMP(NANOS) files look like after the nanosAsLong mapping
    // (the conf turns the parquet NANOS column into a plain LongType
    // of epoch nanos; a plain int64 column exercises the identical
    // downstream path without needing a writer that can emit NANOS).
    val fromNanos = Tables.normalizeTs(
      Seq(micros * 1000L).toDF("ts"))
    assert(fromNanos.schema("ts").dataType == TimestampNTZType)

    // Branch 2: TIMESTAMP_NTZ — the current testdata encoding,
    // round-tripped through a real parquet file so the reader path
    // (not just an in-memory frame) is exercised.
    val ntzDir = s"${sys.props("java.io.tmpdir")}/graft-events-ntz-test"
    Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(ntzDir)
    val fromNtz = Tables.normalizeTs(spark.read.parquet(ntzDir))
    assert(fromNtz.schema("ts").dataType == TimestampNTZType)

    val a = fromNanos.select(Tables.tsMicros(col("ts"))).head().getLong(0)
    val b = fromNtz.select(Tables.tsMicros(col("ts"))).head().getLong(0)
    assert(a == micros, s"nanos branch drifted: $a != $micros")
    assert(b == micros, s"ntz branch drifted: $b != $micros")
  }

  test("nanos→micros conversion is exact beyond double's 2^53 range (no float division)") {
    import spark.implicits._
    // Two adjacent-microsecond instants whose nanos differ by exactly
    // 1000: naive double division would collapse or drift them.
    val base = 1709642096789012L
    val df = Tables.normalizeTs(Seq(base * 1000L, (base + 1) * 1000L, base * 1000L + 999L).toDF("ts"))
    val got = df.select(Tables.tsMicros(col("ts"))).as[Long].collect().sorted
    // Truncation semantics: +999ns stays in the same microsecond.
    assert(got.toSeq == Seq(base, base, base + 1), got.toSeq.toString)
  }
}

/** The round-7 lesson generalized: the driver owns the testdata and
  * HAS regenerated it with changed physical types before (events.ts).
  * Pin the logical contract of the other two pipeline tables so a
  * regeneration surfaces as ONE failing test naming the drift, not as
  * dozens of downstream analysis errors.
  */
class PipelineTablesSchemaSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("documents schema contract") {
    val sch = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001").schema
    val got = sch.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(got == Map(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"), got.toString)
  }

  test("embeddings schema contract (incl. the 64-dim payload)") {
    import org.apache.spark.sql.functions._
    val df = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(got == Map(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"), got.toString)
    // dimensionality is part of the contract: the ANN family's bands,
    // PQ subspaces, and oracles are all derived from dim = 64 (the
    // ann_pq_recall dim=8 slip proved this needs a pin).
    val dims = df.select(size(col("embedding")).as("d")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(dims == Set(64), s"embedding dims drifted: $dims")
  }
}
