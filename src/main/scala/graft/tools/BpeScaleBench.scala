package graft.tools

import org.apache.spark.sql.functions.col

import graft.GraftSession
import graft.sources.Tables

/** Merge-count scaling bench for [[graft.operators.Bpe.train]] —
  * the measured version of the "training rounds run at VOCABULARY
  * cardinality" claim (`Bpe.scala` scale-shape scaladoc), round-12
  * verdict ask #3: production vocabs are 32k-100k merges, and until
  * round 13 the claim rested on the k=20 oracle queries alone.
  *
  * Usage: `runMain graft.tools.BpeScaleBench <sfDir> [k1,k2,...] [augment]`
  * (defaults: /root/testdata/sf0.1 and k = 20,80). Per k: 2 timed
  * runs of the full training loop (the eager per-round checkpoint
  * cuts put the cost inside `train` itself) + a noop write of the
  * merge table; the MIN is reported (the Bench.scala one-sided-noise
  * argument). Prints one JSON line:
  * `{"sf":...,"augment":...,"runs":[{"k":20,"sec":...,"sec_per_round":...},...]}`.
  *
  * MEASURED fixture limit: the driver's document generator draws from
  * a FIXED distinct-word set at every sf, and its pair vocabulary
  * exhausts at round 90 (every corpus word fully merged to one
  * symbol) — so the raw corpus supports k ≤ 89 and the k=200
  * production-regime row needs a richer vocabulary. Mode (arg 3):
  *   - `augment`: appends two doc-id-derived md5 hex words per
  *     document (the in-query derived-fixture precedent of
  *     `manifoldEmb`) — ~2 distinct 32-char hex words per doc restore
  *     vocab ≫ merges, the regime every production corpus is in.
  *   - `replicate10`: unions the corpus with itself 10× (same words,
  *     10× rows) — the CONTROLLED corpus-size axis: vocabulary is
  *     bit-identical, so if rounds truly run at vocabulary cardinality
  *     the per-round cost must NOT move while the one-time word-count
  *     pass absorbs the 10× (sf1 via make_sf1 can't isolate this: its
  *     decorrelation suffixes inflate the vocabulary itself ~10×).
  *
  * What the numbers must show (recorded in BASELINE.md): sec_per_round
  * ~flat from k=20 to k=200 at a fixed sf (each round is one
  * vocab-cardinality pair-count aggregate + a 1-row TakeOrdered + a
  * narrow merge fold — nothing in it scales with k), and sec_per_round
  * growing far slower than 10x from sf0.1 to sf1 (the corpus is
  * touched once for word counts; rounds run at distinct-word
  * cardinality, which grows sublinearly in corpus size).
  */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
             else Seq(20, 80)
    val mode = if (args.length > 2) args(2) else ""
    val spark = GraftSession.local(appName = "graft-bpe-scale")
    spark.conf.set("graft.load.repartition",
      spark.sparkContext.defaultParallelism.toString)
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val shaped = mode match {
      case "augment" =>
        base.select(col("doc_id"),
          org.apache.spark.sql.functions.concat_ws(" ", col("text"),
            org.apache.spark.sql.functions.md5(col("doc_id").cast("string")),
            org.apache.spark.sql.functions.md5(
              org.apache.spark.sql.functions.concat(
                org.apache.spark.sql.functions.lit("x"),
                col("doc_id").cast("string")))).as("text"))
      case "replicate10" =>
        Seq.fill(10)(base).reduce(_.unionByName(_))
      case _ => base
    }
    val docs = shaped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def timeOnce(k: Int): Double = {
      val t0 = System.nanoTime()
      val (mergeTable, wordMap) = graft.operators.Bpe.train(docs, "text", merges = k)
      mergeTable.write.format("noop").mode("overwrite").save()
      // Release the final word-state checkpoint blocks so run 2 starts
      // from the same storage state as run 1. (The merge table is a
      // union of k one-row checkpoints — not releasable as a single
      // frame and too small to matter.)
      org.apache.spark.sql.graft.CheckpointBlocks.release(wordMap)
      (System.nanoTime() - t0) / 1e9
    }
    val rows = ks.map { k =>
      val sec = (1 to 2).map { i =>
        val s = timeOnce(k)
        System.err.println(f"[bpe-scale] k=$k pass$i $s%.2f s")
        s
      }.min
      f"""{"k":$k,"sec":$sec%.3f,"sec_per_round":${sec / k}%.4f}"""
    }
    println(s"""{"sf":"$sfDir","mode":"$mode","runs":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
