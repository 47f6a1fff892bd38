package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic loaders + load-time schema validation (SURVEY §2.1 S1-S4,
  * §1.1 "schema system").
  *
  * The reference re-checks column presence inside every pipeline
  * (guards at `análise_produtos_clientes.py:64-67`,
  * `manipulacao-analise-comercial.py:252-266`, `:443-452`, `:524-543`);
  * here validation happens once at load and pipelines assume a
  * verified schema.
  */
object Load {

  /** S1: load a table with the format inferred from the path extension
    * (the reference's Excel becomes parquet/csv/json in engine land).
    * CSV reads with a header by default, matching `pd.read_excel`'s
    * header inference; pass `headerRow = false` for headerless files
    * (the reference's `header=None` preview mode, MAC:174).
    */
  def load(spark: SparkSession, path: String, headerRow: Boolean = true): DataFrame =
    load(spark, path, schema = None, headerRow = headerRow)

  /** S1 with an EXPLICIT schema — the 100 TB posture. Schema inference
    * on text formats is a FULL extra pass over the data before the real
    * read (CSV scans every file; JSON samples per
    * `spark.sql.sources.json.samplingRatio`, 1.0 = everything by
    * default). With `schema` supplied no inference job runs at all: the
    * read plans straight against the declared types, malformed cells
    * arriving as null (Spark's default PERMISSIVE mode) exactly like
    * the C3 `try_cast` coercions. Parquet carries its own schema, but
    * the explicit one is still applied as the read schema
    * (projection + type check) for cross-format consistency.
    */
  def load(spark: SparkSession, path: String, schema: StructType): DataFrame =
    load(spark, path, schema = Some(schema), headerRow = true)

  def load(
      spark: SparkSession,
      path: String,
      schema: Option[StructType],
      headerRow: Boolean): DataFrame = {
    val ext = path.reverse.takeWhile(_ != '.').reverse.toLowerCase
    def reader = schema.foldLeft(spark.read)(_ schema _)
    ext match {
      case "parquet" => reader.parquet(path)
      case "csv" =>
        // inferSchema only when no schema was given: inference is a
        // full extra scan of every input file (the reader ignores the
        // option once an explicit schema is set, but keeping it false
        // there states the intent).
        reader.option("header", headerRow.toString)
          .option("inferSchema", schema.isEmpty.toString).csv(path)
      case "json" => reader.json(path)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported extension '.$other' (want .parquet/.csv/.json): $path")
    }
  }

  /** Names from `required` that the frame is missing. */
  def missingColumns(df: DataFrame, required: Seq[String]): Seq[String] =
    required.filterNot(df.columns.contains)

  /** Fail-fast guard: the load-time replacement for the reference's
    * per-pipeline checks. Returns `df` unchanged when valid.
    */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = missingColumns(df, required)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }

  /** S3/S4: structure probe — one row per column with name, type and
    * nullability (replaces `verificar_estrutura_excel` MAC:637-704).
    */
  def describe(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("column_name", "data_type", "nullable")
  }
}
