package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration this engine assumes.
  *
  * Local mode is a single JVM; the same settings (AQE, sane shuffle
  * partition counts, UTC dates) are what we'd set cluster-side. At the
  * 100 TB tier the shuffle-partition count is sized by AQE coalescing
  * (`spark.sql.adaptive.coalescePartitions.enabled`), so the static
  * number here only matters as the pre-AQE upper bound.
  */
object GraftSession {
  def local(
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // The events table stores TIMESTAMP(NANOS), which Spark's parquet
      // reader rejects by default; map it to epoch-nanos bigint
      // session-wide (see Tables.events / Tables.eventsTs). Set here at
      // build time so no table loader has to mutate a live session.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Bucketed saveAsTable ([[graft.sources.Sink.saveBucketed]])
      // needs a writable warehouse; keep it out of the repo tree.
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
