package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pendentesStream unions weekly snapshot files with provenance tag (S5/U1 streaming)") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val week1 = Seq(("PENDENTE", 10.0), ("GANHO", 99.0), ("PENDENTE", 20.0))
      .toDF("status_processo", "valor_proposta")
    val week2 = Seq(("PENDENTE", 30.0), ("PERDIDO", 1.0))
      .toDF("status_processo", "valor_proposta")
    week1.coalesce(1).write.parquet(s"$dir/in/semana_1.parquet")
    week2.coalesce(1).write.parquet(s"$dir/in/semana_2.parquet")

    val stream = StreamingOps.pendentesStream(spark, s"$dir/in/*", week1.schema)
    val q = stream.writeStream.format("memory").queryName("pendentes_test")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("pendentes_test")
      .select("status_processo", "valor_proposta", "semana").collect()
    assert(out.length == 3)
    assert(out.forall(_.getString(0) == "PENDENTE"))
    val byWeek = out.groupBy(_.getString(2)).view.mapValues(_.map(_.getDouble(1)).sorted.toSeq).toMap
    assert(byWeek.keySet.map(_.takeWhile(_ != '.')) == Set("semana_1", "semana_2"))
    assert(byWeek.values.toSet == Set(Seq(10.0, 20.0), Seq(30.0)))
  }

  test("eventCounts: watermarked window aggregation over a memory stream") {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val dir = Files.createTempDirectory("graft_stream2").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    ms.addData((ts(5), "click", 1.0), (ts(10), "click", 2.0), (ts(20), "view", 5.0))

    val counts = StreamingOps.eventCounts(
      ms.toDF.toDF("ts", "event_type", "value"), windowLen = "30 minutes")
    val q = counts.writeStream.format("memory").queryName("counts_test")
      .outputMode("complete").option("checkpointLocation", s"$dir/ckpt").start()
    try { q.processAllAvailable() } finally q.stop()

    assert(spark.table("counts_test").count() == 2)
    val rows = spark.table("counts_test")
      .select("event_type", "n_events", "sum_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("dedupStream keeps first arrival per fingerprint within the watermark") {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val dir = Files.createTempDirectory("graft_stream4").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // "A  b" and " a b " normalize to the same fingerprint
    ms.addData((ts(1), "A  b"), (ts(2), " a b "), (ts(3), "different text"))

    val deduped = StreamingOps.dedupStream(
      ms.toDF.toDF("ts", "text"), watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").option("checkpointLocation", s"$dir/ckpt").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("dedup_test").select("text").as[String].collect().toSet
    assert(out == Set("A  b", "different text")) // first arrival wins
  }

  test("sessionize: flatMapGroupsWithState accumulates per-user state") {
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[StreamingOps.UserEvent]
    val dir = Files.createTempDirectory("graft_stream3").toString
    ms.addData(
      StreamingOps.UserEvent(1L, 1000L, 10.0),
      StreamingOps.UserEvent(1L, 2000L, 5.0),
      StreamingOps.UserEvent(2L, 1500L, 7.0))

    val sessions = StreamingOps.sessionize(ms.toDS(), gapMillis = 100L)
    val q = sessions.writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // processAllAvailable never settles once processing-time timeouts
      // keep scheduling batches — poll the sink with a deadline instead.
      val deadline = System.currentTimeMillis() + 120000
      while (spark.table("sessions_test").count() < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      val out = spark.table("sessions_test").as[StreamingOps.SessionSummary]
        .collect().map(s => s.userId -> ((s.nEvents, s.totalValue))).toMap
      assert(out.get(1L).contains((2L, 15.0)))
      assert(out.get(2L).contains((1L, 7.0)))
    } finally q.stop()
  }
}
