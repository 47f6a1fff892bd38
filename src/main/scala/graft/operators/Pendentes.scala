package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weekly pending-proposals pipeline (SURVEY §2 S5/U1/F1/P5/A4-A6;
  * reference `analise_pendentes.py`).
  *
  * The reference reads N weekly snapshot files newest-first, filters
  * each to `Status Processo == 'PENDENTE'`, tags provenance, and
  * concatenates (AP:29-49). Spark-first: filter BEFORE union so the
  * predicate pushes into each file scan, then `unionByName` with
  * missing-column tolerance for ragged weeks (pandas concat aligns by
  * name). Union is no barrier in Spark — partitions of all inputs just
  * coexist; nothing shuffles until a downstream agg.
  */
object Pendentes {

  /** S5+F1+P5+U1: per-snapshot filter + provenance tag + by-name union.
    * @param snapshots (tag, frame) pairs, e.g. ("Semana Atual", df0),
    *                  ("Semana -1", df1), ... Frames missing the status
    *                  column are skipped, like the reference (AP:43-44).
    */
  def unionSemanas(
      snapshots: Seq[(String, DataFrame)],
      statusCol: String = "status_processo",
      statusValue: String = "PENDENTE"): DataFrame = {
    val tagged = snapshots.collect {
      case (tag, df) if df.columns.contains(statusCol) =>
        df.filter(col(statusCol) === statusValue)
          .withColumn("semana", lit(tag))
    }
    require(tagged.nonEmpty, "no snapshot carries the status column")
    tagged.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** A4+A5+A6: dashboard metrics — row count, distinct weeks, total
    * proposal value (reference AP:80-88). One aggregate pass.
    */
  def metrics(df: DataFrame, valorCol: String = "valor_proposta"): DataFrame =
    df.agg(
      count(lit(1)).as("n_pendentes"),
      countDistinct(col("semana")).as("n_semanas"),
      round(sum(col(valorCol)), 2).as("valor_total_propostas"))

  /** A12: distinct weeks, sorted (reference AP:95). */
  def semanas(df: DataFrame): DataFrame =
    df.select("semana").distinct().orderBy("semana")

  /** F2: restrict to one week (reference AP:100-101). */
  def filterSemana(df: DataFrame, semana: String): DataFrame =
    df.filter(col("semana") === semana)

  /** SCD1 upsert merge — latest-row-wins maintenance of a standing
    * keyed table from an update batch (the MERGE INTO shape; the
    * reference's weekly-snapshot concat keeps ALL versions, this
    * keeps the current one). Spark-first: tag each side with a
    * priority, union (no shuffle), ONE max_by aggregate per key on
    * (version, priority) — updates beat base at equal version, higher
    * version always wins, ties within a side break on priority then
    * are impossible by the caller's key-uniqueness contract. No join:
    * the union+aggregate shape shuffles each row once, where a
    * base-anti-join-update plan shuffles base twice.
    *
    * At the 100 TB tier this is the compaction step of a merge-on-read
    * layout: base stays bucketed by key, update batches append, and
    * this operator folds them down at read/compact time.
    */
  def upsertMerge(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame = {
    val cols = base.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"update schema ${updates.columns.toSeq} must match base $cols")
    val tagged = base.withColumn("__prio", lit(0))
      .unionByName(updates.withColumn("__prio", lit(1)))
    val payload = struct(cols.map(col): _*)
    tagged
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, struct(col(versionCol), col("__prio"))).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Row-level snapshot diff — U1/[[deltaSemanas]] tell you the
    * totals moved; this tells you WHICH rows did (the data-diff /
    * reconciliation class: audit a re-delivered extract, review what
    * an upsert will change before applying it). One FULL OUTER hash
    * join on the key, change classification from null-side and
    * null-safe payload comparison (`<=>` — a value flipping to/from
    * null IS a change), unchanged rows dropped so the output is the
    * changeset, not the corpus.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    def pack(df: DataFrame, tag: String) = df.select(
      keyCols.map(col) :+ struct(compareCols.map(col): _*).as(s"__$tag"): _*)
    pack(oldDf, "old").join(pack(newDf, "new"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(!(col("__old") <=> col("__new")), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change") =!= "unchanged")
      .select(keyCols.map(col) ++ Seq(col("change")) ++
        compareCols.flatMap(c => Seq(
          col(s"__old.$c").as(s"old_$c"), col(s"__new.$c").as(s"new_$c"))): _*)
  }

  /** Week-over-week change of the pending totals (extension — the
    * reference displays per-week metrics side by side, AP:95-105, but
    * never computes the delta). Runs on the per-week AGGREGATE (a
    * handful of rows), so the partition-less lag window is free.
    */
  def deltaSemanas(unioned: DataFrame, valorCol: String = "valor_proposta"): DataFrame = {
    val perWeek = unioned.groupBy("semana")
      .agg(count(lit(1)).as("n_pendentes"),
        round(sum(col(valorCol)), 2).as("valor_total"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("semana"))
    perWeek
      .withColumn("delta_n", col("n_pendentes") - lag("n_pendentes", 1).over(w))
      .withColumn("delta_valor", round(col("valor_total") - lag("valor_total", 1).over(w), 2))
  }
}
