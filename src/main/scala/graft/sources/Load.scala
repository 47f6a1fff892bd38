package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def load(spark: SparkSession, path: String, headerRow: Boolean = true): DataFrame = {
    val ext = path.reverse.takeWhile(_ != '.').reverse.toLowerCase
    ext match {
      case "parquet" => spark.read.parquet(path)
      case "csv" =>
        spark.read.option("header", headerRow.toString).option("inferSchema", "true").csv(path)
      case "json" => spark.read.json(path)
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
