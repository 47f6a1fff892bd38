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

  /** SCD2 history-preserving merge — [[upsertMerge]]'s other half
    * (U3 is SCD1 latest-row-wins; this closes and appends intervals —
    * the `MERGE ... WHEN MATCHED THEN UPDATE valid_to / WHEN NOT
    * MATCHED THEN INSERT` pattern every warehouse dimension table
    * runs).
    *
    * Contract: `base` is an SCD2 table — `keyCols` ++ payload ++
    * (`valid_from`, `valid_to`), both epoch-like BIGINTs, open row =
    * null `valid_to`, at most one open row per key. `updates` carries
    * `keyCols` ++ the same payload ++ `tsCol` (the new version's
    * effective time).
    *
    * Semantics, per key:
    *   - updates whose (key, ts) equals an EXISTING version's
    *     `valid_from` are dropped — the REPLAY GUARD: re-applying the
    *     same batch is a no-op (the D20 idempotency posture, pinned by
    *     unit test);
    *   - surviving updates dedupe in-batch on (key, ts) keeping the
    *     greatest payload struct (deterministic under any arrival
    *     order);
    *   - the key's OPEN row and its new versions are CHAINED by
    *     `valid_from`: each interval closes at the next version's
    *     start (`lead` over the per-key chain), the last stays open —
    *     so late-arriving versions slot INTO the history instead of
    *     corrupting it, and the previously-open row is closed by the
    *     first newer version;
    *   - CLOSED history rows and untouched keys pass through verbatim.
    *
    * Change-detection (skip updates whose payload equals the current
    * open row's) is deliberately NOT built in: compose it upstream
    * with [[snapshotDiff]] (U4 produces exactly the changed-keys
    * changeset) — the merge stays a mechanical interval operation.
    *
    * Scale shape: the update is BATCH-BOUNDED, the [[graft.operators
    * .Similarity.nswInsert]] posture — touched keys resolve by one
    * semi/anti join against the update key set, only touched OPEN
    * rows + the batch enter the chain window (per-key chains, each a
    * handful of versions), and the closed history never moves except
    * through those key joins. No join is FORCE-broadcast: an
    * ingest-sized batch broadcasts via AQE on its own, and a
    * backfill-sized batch (the registered fixture replays 1/7 of the
    * fact table) must stay a shuffle join — the plan does not bake in
    * the small-batch assumption (the langIdScore posture).
    */
  def scd2Merge(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    val payload = base.columns.toSeq
      .filterNot(keyCols.contains).filterNot(Seq(validFromCol, validToCol).contains)
    val outCols = base.columns.toSeq
    require(
      updates.columns.toSet == (keyCols ++ payload :+ tsCol).toSet,
      s"update schema ${updates.columns.toSeq} must be keys $keyCols + " +
        s"payload $payload + $tsCol")
    val u0 = updates.select(
      (keyCols.map(col) :+ col(tsCol).as(validFromCol)) ++ payload.map(col): _*)
    // Replay guard: any (key, valid_from) already versioned is a
    // re-delivery, not a new version.
    val u1 = u0.join(
      base.select(keyCols.map(col) :+ col(validFromCol): _*),
      keyCols :+ validFromCol, "left_anti")
    // In-batch dedupe on (key, ts): greatest payload struct wins.
    val u2 = u1
      .groupBy((keyCols :+ validFromCol).map(col): _*)
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select((keyCols.map(col) :+ col(validFromCol)) ++
        payload.map(c => col(s"__p.$c").as(c)): _*)
    val touched = u2.select(keyCols.map(col): _*).distinct()
    val baseTouched = base.join(touched, keyCols, "left_semi")
    val untouched = base.join(touched, keyCols, "left_anti")
    // Chain = touched keys' open rows + new versions; re-derive every
    // link's valid_to from the next version's start.
    val chain = baseTouched.filter(col(validToCol).isNull)
      .select((keyCols.map(col) :+ col(validFromCol)) ++ payload.map(col): _*)
      .unionByName(u2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(validFromCol))
    val chained = chain
      .withColumn(validToCol, lead(col(validFromCol), 1).over(w))
      .select(outCols.map(col): _*)
    untouched
      .unionByName(baseTouched.filter(col(validToCol).isNotNull))
      .unionByName(chained)
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
