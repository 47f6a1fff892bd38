package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Exact-vs-sketch cost for the heavy-hitter tier
  * ([[graft.functions.Sketches.misraGries]] vs the exact explode →
  * groupBy → TakeOrdered top-k) — the measured half of the
  * `text_topk_sketch` BASELINE row. Per arm: 2 runs, MIN reported
  * (the Bench one-sided-noise argument), identical token stream
  * (whitespace tokens of `documents.text`, empties dropped).
  *
  * What the ratio means at scale: BOTH arms scan and explode the same
  * token mass, so at fixture scale (vocab ~31 words — the exact
  * aggregate's shuffle is already tiny) the sketch can only tie or
  * barely win. The sketch's case is the VOCABULARY axis, not the
  * token axis: its shuffle is partitions × k counters REGARDLESS of
  * distinct keys, where the exact path shuffles (and sorts heads
  * over) the full key frame — billions of n-grams at 100 TB. The
  * fixture cannot exhibit that axis; the bounded-memory contract is
  * what the unit tests + oracle pin instead.
  *
  * Usage: `runMain graft.tools.SketchCostBench <sfDir> [k]`
  * (defaults /root/testdata/sf0.1, k = 8). Prints one JSON line:
  * `{"sf":...,"n_tokens":N,"k":8,"exact_sec":...,"sketch_sec":...,"ratio":...}`.
  */
object SketchCostBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 8
    val spark = GraftSession.local(appName = "graft-sketch-cost")
    spark.conf.set("graft.load.repartition",
      spark.sparkContext.defaultParallelism.toString)
    def words = Tables.documents(spark, sfDir)
      .select(explode(TextAnalysis.tokens(lower(coalesce(col("text"), lit(""))))).as("word"))
      .filter(col("word") =!= "")
    val n = words.count()
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    val exactSec = time(
      words.groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc).limit(20))
    val sketchSec = time(
      words.agg(graft.functions.Sketches.misraGries(col("word"), k).as("sk")))
    println(f"""{"sf":"$sfDir","n_tokens":$n,"k":$k,"exact_sec":$exactSec%.3f,"sketch_sec":$sketchSec%.3f,"ratio":${exactSec / sketchSec}%.2f}""")
    spark.stop()
  }
}
