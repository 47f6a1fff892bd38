package graft.tools

import org.apache.spark.sql.functions.col

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Band-width scaling bench for [[graft.operators.Similarity.nswGraph]]
  * — the measured version of the bits ≈ log₂(N / target-bucket) sizing
  * rule documented at `nswGraph` (round 16): at FIXED bitsPerBand the
  * bucket population grows with N and the within-bucket candidate
  * join with its square, so the build is quadratic in corpus size
  * (the `ann_nsw_incr` slope row measured 10× data → 7× cost at
  * 6 bits). The rule says widening the keys with the corpus keeps
  * candidates-per-node constant and the build linear — this main
  * prices that claim AND its recall side of the trade in one
  * artifact.
  *
  * Usage: `runMain graft.tools.NswScaleBench <sfDir> [bits1,bits2,...]
  * [entries,beam,rounds]` (defaults: /root/testdata/sf0.1, bits =
  * 6,8,10, and the registered 16,24,5 search parameters — pass the
  * third arg to price how much recall SCALED search parameters buy
  * back at large N, where the registration-sized beam explores a
  * vanishing corpus fraction). Per setting:
  * 2 timed builds (nswGraph is eager — the cost lands inside the
  * call), MIN reported (the Bench.scala one-sided-noise argument),
  * then the graph's edge count, mean out-degree (neighbor-list
  * fullness — the quantity too-wide keys starve), and beam-search
  * recall@10 vs one shared exact truth (16 entries, beam 24,
  * 5 rounds — the registered `ann_nsw_recall` parameters). Prints one
  * JSON line:
  * `{"sf":...,"n_vec":N,"runs":[{"bits":6,"sec":...,"edges":...,"mean_deg":...,"recall":...},...]}`.
  *
  * What the numbers must show (recorded in BASELINE.md): build
  * seconds dropping steeply as bits grow at large N (candidate mass
  * ∝ N²/2^bits), mean out-degree staying at/near the degree cap while
  * buckets still hold ≳ degree members, and recall degrading only
  * once buckets get too small to fill neighbor lists — the knee the
  * sizing rule targets.
  */
object NswScaleBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bitsList = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
                   else Seq(6, 8, 10)
    val Seq(nEntries, beamWidth, rounds) =
      if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq
      else Seq(16, 24, 5)
    val spark = GraftSession.local(appName = "graft-nsw-scale")
    spark.conf.set("graft.load.repartition",
      spark.sparkContext.defaultParallelism.toString)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val queries = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    val gt = org.apache.spark.sql.graft.CheckpointBlocks.cut(
      Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 10))
    // Unmeasured warm-up build: the FIRST setting otherwise pays the
    // whole JIT/codegen warm-up (measured r17: the lead position read
    // 1.3-2x its warm cost, inverting bits comparisons).
    Similarity.nswGraph(emb, "vec_id", "embedding",
      dim = 64, nBands = 8, bitsPerBand = bitsList.head, degree = 12).count()
    val rows = bitsList.map { bits =>
      def once(): (Double, org.apache.spark.sql.DataFrame) = {
        val t0 = System.nanoTime()
        val g = Similarity.nswGraph(emb, "vec_id", "embedding",
          dim = 64, nBands = 8, bitsPerBand = bits, degree = 12)
        // nswGraph is eager (lineage-cut result); the count below is a
        // cached-blocks read, so the timed region is the build itself.
        g.count()
        ((System.nanoTime() - t0) / 1e9, g)
      }
      val (t1, _) = once()
      val (t2, g) = once()
      val sec = math.min(t1, t2)
      val edges = g.count()
      val approx = Similarity.nswSearch(queries, emb, g, "vec_id", "embedding",
        k = 10, beamWidth = beamWidth, rounds = rounds, nEntries = nEntries)
      val recall = Similarity.recallVsTruth(gt, approx)
        .filter(col("q_id") === -1L).select(col("recall")).head().getDouble(0)
      System.err.println(f"[nsw-scale] bits=$bits sec=$sec%.2f edges=$edges recall=$recall%.2f")
      f"""{"bits":$bits,"sec":$sec%.3f,"edges":$edges,"mean_deg":${edges.toDouble / n}%.2f,"recall":$recall%.4f}"""
    }
    println(s"""{"sf":"$sfDir","n_vec":$n,"search":[$nEntries,$beamWidth,$rounds],"runs":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
