package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Export sinks (SURVEY §2.1 S6). The reference writes timestamped
  * Excel exports (`Manipulação de Dataframes/analise_pendentes.py:110-114`);
  * the engine writes parquet/csv, with optional partition columns —
  * SURVEY §4 recommends partitioning the fact table by entry year so
  * date-range queries prune at the source.
  */
object Sink {

  /** Write `df` to `path`. `partitionBy` columns become directory
    * partitions (and are what makes the 100 TB read path prunable).
    */
  def save(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      mode: String = "overwrite",
      options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode(mode).format(format).options(options)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** S6: timestamped export path, like the reference's
    * `f"propostas_pendentes_{timestamp}.xlsx"`. The clock is injectable
    * so tests stay deterministic.
    */
  def saveTimestamped(
      df: DataFrame,
      dir: String,
      prefix: String,
      format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      clock: () => String = () =>
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
          .format(java.time.LocalDateTime.now())): String = {
    val path = s"$dir/${prefix}_${clock()}"
    save(df, path, format, partitionBy)
    path
  }

  /** Fact-table export partitioned by entry year (SURVEY §4): adds an
    * `ano` partition column derived from `dt_entrada`.
    */
  def saveFactByYear(fact: DataFrame, path: String, format: String = "parquet"): Unit =
    save(fact.withColumn("ano", year(col("dt_entrada"))), path, format, partitionBy = Seq("ano"))

  /** Compact a parquet directory's small files: read, size the output
    * partition count from the actual on-disk bytes, rewrite, swap.
    * The small-files problem is the classic failure mode of
    * incremental ingest at scale — each micro-batch writes a file per
    * task, a year of 5-minute batches is ~10⁵ writes, and every
    * subsequent read pays a task (and a namenode/listing entry) per
    * file. Compaction pays one rewrite to make all future scans cheap.
    *
    * `shuffle = false` (default) uses `coalesce` — narrow, no shuffle,
    * but output file sizes inherit input skew (a coalesced partition is
    * a union of input files). `shuffle = true` uses `repartition` for
    * evenly sized output at the cost of one full shuffle. The rewrite
    * goes to a sibling `<path>__compact` directory first and swaps in
    * only after the write succeeds (readers of `path` see old or new,
    * never a half-written mix; the swap itself is not atomic — gate it
    * with the table-metadata layer at the production tier).
    *
    * Flat directories only: compact a partitioned table one partition
    * directory at a time (each partition is itself a flat dir — and
    * per-partition compaction is also the right unit of parallelism
    * and retry at scale).
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      shuffle: Boolean = false): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.filter(s =>
        s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val before = dataFiles(p)
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact")
    sized.write.mode("overwrite").parquet(tmp.toString)
    val after = dataFiles(tmp).size
    fs.delete(p, true)
    fs.rename(tmp, p)
    (before.size, after)
  }

  /** Persist a trained ANN index so it survives the session — the
    * write-once posture [[saveBucketed]] establishes for joins,
    * extended to the ANN story (round-4 "What's missing" #3: trained
    * centroids and banding params were recomputed per session).
    *
    * `index` is the small model frame (k-means centroids from
    * [[graft.operators.Similarity.kmeansFit]]: k × dim rows; or any
    * other frame-shaped index artifact) written as plain parquet;
    * `params` are the scalar hyperparameters the index is only valid
    * under (e.g. `dim`, `nBands`, `bitsPerBand`, `metric`) written as
    * a `_index_params.json` sidecar INSIDE the directory — the
    * underscore prefix keeps every Spark file reader ignoring it, so
    * the directory still reads as a normal parquet table. Searching
    * with mismatched params is the classic silent-recall-loss bug;
    * persisting them next to the vectors makes the contract explicit
    * and lets [[Load.loadIndex]] hand both back.
    */
  def saveIndex(index: DataFrame, path: String, params: Map[String, String]): Unit = {
    save(index, path)
    val spark = index.sparkSession
    val p = new org.apache.hadoop.fs.Path(path, "_index_params.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Serialized with json4s (same library loadIndex parses with):
    // hand-rolled escaping covered only backslash and quote, so a
    // param value holding a newline/tab/control char wrote invalid
    // JSON that loadIndex's strict parse rejected — at LOAD time,
    // after the index was already saved.
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.JObject(params.toSeq.sortBy(_._1)
        .map { case (k, v) => k -> (org.json4s.JString(v): org.json4s.JValue) }.toList))
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Bucketed table write — the co-located-join layout for the 100 TB
    * tier. Two tables bucketed by their join key with the SAME bucket
    * count join with NO shuffle on either side (each bucket pair is
    * joined in place; PlanSpec pins the exchange-free plan), which is
    * how a fact×fact join that would otherwise shuffle 100 TB twice
    * per run is paid for ONCE at write time. `sortBy` additionally
    * orders rows within each bucket file, letting sort-merge joins
    * skip their sort when files-per-bucket is 1.
    *
    * Bucketing metadata lives in the session catalog (`saveAsTable`,
    * not `save`) — plain `spark.read.parquet` of the same files would
    * see the data but not the layout. Read back via `spark.table`.
    */
  def saveBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      format: String = "parquet"): Unit = {
    require(bucketCols.nonEmpty, "saveBucketed needs at least one bucket column")
    // Overwrite must also survive a PREVIOUS session's leftovers: the
    // in-memory catalog is per-session, so a fresh session sees no
    // table but CTAS still refuses the orphaned warehouse directory
    // (LOCATION_ALREADY_EXISTS). Drop both the entry and the location.
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$tableName`")
    // Resolve the location the way the catalog itself would (handles
    // identifier normalization — Locale.ROOT lowercasing — and the
    // current database's .db subdirectory) instead of string-building
    // it from the warehouse dir.
    val ident = s.sessionState.sqlParser.parseTableIdentifier(tableName)
    val loc = new org.apache.hadoop.fs.Path(
      s.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format(format)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }
}
