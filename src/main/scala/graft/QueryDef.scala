package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** One driver-checkable query: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names must be aliased identically on both sides —
  * the driver sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Prefix an oracle body with the shared fact/dim CTEs. */
  def withViews(body: String): String =
    s"""WITH fact AS (
       |${Tables.analiseComercialSql}
       |), dim AS (
       |${Tables.classificacaoProdutosSql}
       |)
       |$body""".stripMargin

  /** Like [[withViews]] but also exposes the ABC classification CTE. */
  def withAbc(body: String): String =
    s"""WITH fact AS (
       |${Tables.analiseComercialSql}
       |), dim AS (
       |${Tables.classificacaoProdutosSql}
       |), abc AS (
       |${graft.operators.Abc.classifySql}
       |)
       |$body""".stripMargin
}
