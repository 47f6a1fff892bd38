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

  /** The reference's export, byte-compatible: a timestamped `.xlsx`
    * (`f"propostas_pendentes_{timestamp}.xlsx"`, reference
    * `analise_pendentes.py:110-114`) via the native [[Xlsx.write]].
    * Injectable clock like [[saveTimestamped]]. Returns the path.
    */
  def saveTimestampedXlsx(
      df: DataFrame,
      dir: String,
      prefix: String,
      clock: () => String = () =>
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
          .format(java.time.LocalDateTime.now())): String = {
    val path = s"$dir/${prefix}_${clock()}.xlsx"
    Xlsx.write(df, path)
    path
  }

  /** Morton (Z-order) interleave of two bucketized coordinates — the
    * key under Z-order clustering. Bit i of `a` lands at output bit
    * 2i, bit i of `b` at 2i+1; generated as literal-shift terms
    * (codegen'd, no UDF). Inputs must already be integers in
    * [0, 2^bits).
    */
  def mortonKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order clustered write (the Delta/Iceberg `OPTIMIZE ZORDER BY`
    * layout, done Spark-first): bucketize BOTH columns to 2^bits
    * ranks over their min–max span (one tiny stats aggregate,
    * broadcast back), interleave into the Morton key, range-partition
    * + sort the data by it, write parquet. Files then cover compact
    * RECTANGLES of the (a, b) space instead of full-width stripes, so
    * parquet row-group/file min–max stats prune reads that filter on
    * EITHER column — the multi-dimensional data-skipping layout a
    * single-column sort cannot give (sorting by `a` leaves every file
    * spanning all of `b`). The bucketization is linear over the span:
    * heavily skewed columns would pre-transform (rank/log) first —
    * callers own that choice, the key is mechanical.
    *
    * Returns the per-file bounding boxes (file, min/max of both
    * columns) read back from the written files — the measurable
    * layout property (ZOrderSpec asserts every file's box is a
    * fraction of the domain on both axes).
    */
  def saveZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      nFiles: Int,
      bits: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val stats = df.agg(
      min(col(colA)).as("__amin"), max(col(colA)).as("__amax"),
      min(col(colB)).as("__bmin"), max(col(colB)).as("__bmax"))
    val maxRank = (1L << bits) - 1
    def rank(c: org.apache.spark.sql.Column,
        lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column) =
      least(lit(maxRank), greatest(lit(0L),
        floor((c.cast("double") - lo) / (hi - lo + lit(1e-12)) * maxRank).cast("long")))
    val keyed = df.crossJoin(broadcast(stats))
      .withColumn("__zkey", mortonKey(
        rank(col(colA), col("__amin"), col("__amax")),
        rank(col(colB), col("__bmin"), col("__bmax")), bits))
      .drop("__amin", "__amax", "__bmin", "__bmax")
    keyed.repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .select(input_file_name().as("file"), col(colA), col(colB))
      .groupBy(col("file"))
      .agg(min(col(colA)).as("a_min"), max(col(colA)).as("a_max"),
        min(col(colB)).as("b_min"), max(col(colB)).as("b_max"))
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

  /** Training-shard layout for a [[graft.operators.Sampling.shardAssign]]
    * frame: one hive partition directory per `shard`, rows inside each
    * shard's file(s) physically ordered by `shard_pos` — so a training
    * job reads shard `i` as one sequential, deterministically-ordered
    * stream with no sort at load time (the tfrecord/webdataset
    * contract, in parquet). `repartition(shard)` puts each shard on
    * exactly one writer task (one file per shard) and
    * `sortWithinPartitions` fixes the physical row order; parquet
    * readers preserve file row order within a split, SinkSpec pins the
    * round-trip.
    */
  def saveSharded(df: DataFrame, path: String, format: String = "parquet"): Unit = {
    require(Seq("shard", "shard_pos").forall(df.columns.contains),
      s"saveSharded expects shardAssign output (shard, shard_pos); got (${df.columns.mkString(", ")})")
    df.repartition(org.apache.spark.sql.functions.col("shard"))
      .sortWithinPartitions("shard", "shard_pos")
      .write.mode("overwrite").format(format).partitionBy("shard").save(path)
  }
}
