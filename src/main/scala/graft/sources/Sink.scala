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
}
