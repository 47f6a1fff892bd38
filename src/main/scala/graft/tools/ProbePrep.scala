package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** One-off measurement main for the pretrain clean chain: times each
  * sub-frame with a labeled noop write (guide §1.4/§1.5) to locate
  * the single-task funnel Diag shows in every pretrain composite.
  * Not part of the bench/driver surface.
  */
object ProbePrep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "graft-probe")
    spark.conf.set("graft.load.repartition",
      spark.sparkContext.defaultParallelism.toString)
    val docs = Tables.documents(spark, sfDir)
    docs.persist(StorageLevel.MEMORY_AND_DISK).count()

    val log = new org.apache.spark.scheduler.SparkListener {
      val rows = new scala.collection.mutable.ArrayBuffer[String]
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        rows += f"    stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"run=${m.executorRunTime / 1000.0}%7.2f cpu=${m.executorCpuTime / 1e9}%7.2f " +
          f"${si.name.take(60)}"
      }
    }
    spark.sparkContext.addSparkListener(log)

    def time(label: String)(df: => DataFrame): Unit = {
      log.rows.clear()
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      spark.sparkContext.setJobDescription(null)
      Thread.sleep(200)
      System.err.println(f"[probe] $label%-28s ${(t1 - t0) / 1e9}%7.2f s")
      log.rows.foreach(r => System.err.println("[probe]" + r))
    }

    val scored = docs.select(
      col("doc_id"), col("text"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.languageId(col("text")).as("lang_pred"),
      TextAnalysis.tokenCountWs(coalesce(col("text"), lit(""))).cast("long").as("n_tok"))
    val rep = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .select(col("doc_id"), col("dup_word_frac"))
    val ent = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .select(col("doc_id"), col("entropy"))
    val gated = scored.join(rep, "doc_id").join(ent, "doc_id")
      .filter(col("q") >= 0.5 && col("dup_word_frac") <= 0.95 &&
        col("entropy").between(1.5, 4.5))
    val deduped = gated
      .groupBy(col("fp"))
      .agg(min_by(
        struct(col("doc_id"), col("text"), col("lang_pred"), col("n_tok")),
        col("doc_id")).as("d"))
      .select(col("d.doc_id").as("doc_id"), col("d.text").as("text"),
        col("d.lang_pred").as("lang_pred"), col("d.n_tok").as("n_tok"))
    val cand = deduped.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val contaminated = Dedup.decontaminate(
        cand, docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        "doc_id", "text", shingleK = 3, minShared = 5)
      .select(col("doc_id")).distinct()
    val clean = cand.join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        concat(col("lang_pred"), lit("#"),
          expr("doc_id div 200").cast("string")).as("bucket"),
        col("n_tok"))

    def grams(df: DataFrame, outId: String): DataFrame = df
      .select(col("doc_id").as(outId),
        explode(Dedup.wordShingles(
          TextAnalysis.tokens(lower(coalesce(col("text"), lit("")))), 3)).as("gram"))
    val evalDocs = docs.filter(pmod(col("doc_id"), lit(10)) === 0)

    (1 to 2).foreach { pass =>
      System.err.println(s"[probe] ---- pass $pass ----")
      time("gated")(gated)
      time("deduped")(deduped)
      time("cand_grams")(grams(cand, "doc_id"))
      time("raw90_grams")(grams(docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), "doc_id"))
      time("cut_cand_grams")({
        val dc = org.apache.spark.sql.graft.CheckpointBlocks.cut(cand)
        grams(dc, "doc_id")
      })
      time("eval_grams")(grams(evalDocs, "eval_id"))
      time("eval_gram_counts")(grams(evalDocs, "eval_id")
        .groupBy(col("gram"), col("eval_id")).agg(count(lit(1)).as("__me")))
      time("decontaminate")(contaminated)
      time("clean")(clean)
      time("packed")(TextAnalysis.packSequences(
        clean, "doc_id", "n_tok", "bucket", maxTokens = 256L))
      time("full_query")(graft.SparkEntry.queries("pipeline_pretrain_prep")(spark, sfDir))
    }
    spark.stop()
  }
}
