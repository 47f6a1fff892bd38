package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Central registry of driver-checkable queries.
  *
  * Each entry pairs a Spark implementation with (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables. Column
  * names are aliased identically on both sides — the driver sorts
  * columns by name before hashing values. Doubles are rounded
  * identically on both sides to absorb accumulation-order differences
  * between engines (SURVEY §7 hard-part 3).
  */
object Queries {
  import QueryDef.withViews

  // ---------------------------------------------------------------- core

  /** A1 group-by sum (reference APC:76). */
  val q1Agg = QueryDef(
    "a1_groupby_sum",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price")),
    Some("""SELECT l_returnflag, l_linestatus,
           |       ROUND(SUM(l_quantity), 2) AS sum_qty,
           |       ROUND(SUM(l_extendedprice), 2) AS sum_price
           |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin))

  /** ABC classification — A1/A2 + W1-W4 + O1 (reference MAC:443-498). */
  val qAbc = QueryDef(
    "abc_classify",
    (s, dir) =>
      Abc.classify(Tables.analiseComercial(s, dir))
        .select(col("cliente"), col("nome_cliente"), col("uf"), col("cidade"),
          round(col("valor_total_orcado"), 2).as("valor_total_orcado"),
          round(col("percentual"), 6).as("percentual"),
          round(col("percentual_acumulado"), 6).as("percentual_acumulado"),
          col("abc"), col("ranking")),
    Some(withViews(
      s"""SELECT cliente, nome_cliente, uf, cidade,
         |       ROUND(valor_total_orcado, 2) AS valor_total_orcado,
         |       ROUND(percentual, 6) AS percentual,
         |       ROUND(percentual_acumulado, 6) AS percentual_acumulado,
         |       abc, ranking
         |FROM (
         |${Abc.classifySql}
         |)""".stripMargin)))

  /** F4 date-range filter (reference APC:264-267). */
  val qBetween = QueryDef(
    "f4_date_between",
    (s, dir) =>
      Tables.analiseComercial(s, dir)
        .filter(col("dt_entrada").between(lit("1996-01-01"), lit("1996-12-31")))
        .select(col("rid"), col("cliente"), col("codigo_produto"),
          col("dt_entrada"), round(col("valor_orcado"), 2).as("valor_orcado")),
    Some(withViews(
      """SELECT rid, cliente, codigo_produto, dt_entrada,
        |       ROUND(valor_orcado, 2) AS valor_orcado
        |FROM fact
        |WHERE dt_entrada BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'""".stripMargin)))

  /** J2 left join fact × category dim (reference APC:162-167, MAC:502-509). */
  val qJoinDim = QueryDef(
    "j2_left_join_dim",
    (s, dir) =>
      Enrich.joinCategorias(Tables.analiseComercial(s, dir), Tables.classificacaoProdutos(s, dir))
        .groupBy("negocio", "grupo")
        .agg(count(lit(1)).as("n_linhas"),
          round(sum("valor_orcado"), 2).as("valor_total")),
    Some(withViews(
      """SELECT d.negocio, d.grupo, COUNT(*) AS n_linhas,
        |       ROUND(SUM(f.valor_orcado), 2) AS valor_total
        |FROM fact f LEFT JOIN dim d ON f.codigo_produto = d.codigo_produto
        |GROUP BY d.negocio, d.grupo""".stripMargin)))

  /** O1+O3 top-k: global sort desc + limit with deterministic tie-break. */
  val qTopK = QueryDef(
    "o1_sort_limit",
    (s, dir) =>
      Tables.analiseComercial(s, dir)
        .orderBy(col("valor_orcado").desc, col("rid").asc)
        .limit(100)
        .select(col("rid"), col("cliente"),
          round(col("valor_orcado"), 2).as("valor_orcado")),
    Some(withViews(
      """SELECT rid, cliente, ROUND(valor_orcado, 2) AS valor_orcado
        |FROM fact ORDER BY valor_orcado DESC, rid ASC LIMIT 100""".stripMargin)))

  val all: Seq[QueryDef] =
    Seq(q1Agg, qAbc, qBetween, qJoinDim, qTopK) ++
      graft.queries.ParityQueries.all ++
      graft.queries.PipelineQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
