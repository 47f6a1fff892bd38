package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Exact-vs-sketch cost for the range-quantile tier — the measured
  * half of the `events_quantile_reuse` BASELINE row, framed on the
  * axis that op actually exists for: RESCAN AVOIDANCE. The daily
  * equi-width histogram table is built ONCE (one pass over events,
  * the daily-job cost) and persisted; after that, any date range's
  * p50/p90/p99 answers from days × ≤ bins persisted rows, while the
  * exact path re-scans and re-sorts the range's raw events on every
  * question. The registered query can't show this (its oracle needs
  * the build inline); this bench persists the sketch first and then
  * times the two ways of ANSWERING.
  *
  * Per arm: 2 runs, MIN reported (the Bench one-sided-noise
  * argument). Answer arms share the quantile-extraction arithmetic
  * with the registered query (rank = ceil(q*N) in exact integers,
  * lower-edge estimate).
  *
  * Usage: `runMain graft.tools.QuantileCostBench <sfDir> [bins]`
  * (defaults /root/testdata/sf0.1, bins = 256). Prints one JSON
  * line: `{"sf":...,"n_range":N,"bins":B,"build_sec":...,
  * "exact_sec":...,"sketch_sec":...,"answer_ratio":...}`.
  */
object QuantileCostBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bins = if (args.length > 1) args(1).toInt else 256
    val loCents = 0L
    val width = (100000L - loCents + bins - 1) / bins
    val (d1, d2) = (19727L, 19737L)
    val spark = GraftSession.local(appName = "graft-quantile-cost")
    spark.conf.set("graft.load.repartition",
      spark.sparkContext.defaultParallelism.toString)
    def ev = Tables.events(spark, sfDir).select(
      expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 AS LONG)").as("day"),
      expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val nRange = ev.filter(col("day").between(d1, d2)).count()
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    // The daily job: one pass over ALL events -> (day, bin, c).
    val dailyPath = s"${System.getProperty("java.io.tmpdir")}/graft_qr_daily_$bins"
    val daily = ev
      .select(col("day"),
        least(greatest(expr(s"(cents - $loCents) DIV $width"), lit(0L)),
          lit(bins - 1L)).as("bin"))
      .groupBy("day", "bin").agg(count(lit(1)).as("c"))
    val t0 = System.nanoTime()
    daily.write.mode("overwrite").parquet(dailyPath)
    val buildSec = (System.nanoTime() - t0) / 1e9
    // Answer arm 1: exact rescan of the range's raw events.
    val exactSec = time(
      ev.filter(col("day").between(d1, d2)).agg(
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)").as("p50"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents) AS BIGINT)").as("p90"),
        expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cents) AS BIGINT)").as("p99")))
    // Answer arm 2: merge the persisted daily rows, walk <= bins bins.
    val sketchSec = time {
      spark.read.parquet(dailyPath)
        .filter(col("day").between(d1, d2))
        .groupBy("bin").agg(sum("c").as("c"))
        .select(col("bin"),
          expr("sum(c) OVER (ORDER BY bin)").as("cum"),
          expr("sum(c) OVER ()").as("n"))
        .select(col("bin"), col("cum"), col("n"),
          explode(expr(
            "array(named_struct('q', 'p50', 'qnum', 1L, 'qden', 2L), " +
              "named_struct('q', 'p90', 'qnum', 9L, 'qden', 10L), " +
              "named_struct('q', 'p99', 'qnum', 99L, 'qden', 100L))")).as("qq"))
        .select(col("bin"), col("cum"), col("qq.q").as("q"),
          expr("(n * qq.qnum + qq.qden - 1) DIV qq.qden").as("rnk"))
        .filter(col("cum") >= col("rnk"))
        .groupBy(col("q")).agg(min(col("bin")).as("bin"))
        .select(col("q"), (lit(loCents) + col("bin") * width).as("est_cents"))
    }
    println(f"""{"sf":"$sfDir","n_range":$nRange,"bins":$bins,"build_sec":$buildSec%.3f,"exact_sec":$exactSec%.3f,"sketch_sec":$sketchSec%.3f,"answer_ratio":${exactSec / sketchSec}%.2f}""")
    spark.stop()
  }
}
