package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ABC (Pareto) client classification.
  *
  * Reference semantics: `classificar_clientes_abc` —
  * `Manipulação de Dataframes/manipulacao-analise-comercial.py:443-498`
  * and `análise_produtos_clientes.py:50-116`:
  * group clients, sum order value, sort desc, percent-of-total,
  * cumulative percent, bucket A(≤80)/B(≤95)/C, min-method rank.
  *
  * Spark mapping (SURVEY §2: A1/A2, W1-W4, O1):
  *  - per-client aggregate: `groupBy(cliente).agg(sum, min(descr...))`.
  *    The reference takes descriptors with pandas `first` (frame-order
  *    dependent, MAC:455-460); we use `min` which is deterministic and
  *    identical when descriptors are functionally dependent on the key.
  *  - percent-of-total: scalar subquery-free — a partition-less window
  *    sum. Cheap: runs on the *aggregated* (client-cardinality) frame.
  *  - cumulative percent: running sum over (valor desc, cliente) — the
  *    explicit `cliente` tie-break makes the cumsum deterministic where
  *    pandas relied on frame order (SURVEY §7 hard-part 1).
  *  - rank: `rank()` over valor desc only — SQL RANK() == pandas
  *    `rank(method='min')` exactly, ties share a rank (MAC:488).
  *  - zero-total guard: all clients → class C (MAC:471-476).
  *
  * Scale: both windows are single-partition, but they run AFTER the
  * groupBy collapsed the data to client cardinality (thousands–millions
  * of rows, not the 100 TB fact). At extreme client counts the same
  * two-phase shape still holds: the shuffle is the groupBy; the window
  * input is the small aggregate (SURVEY §4).
  */
object Abc {

  /** @param fact fact table with at least (cliente, nome, uf, cidade, valor) columns */
  def classify(
      fact: DataFrame,
      cliente: String = "cliente",
      nome: String = "nome_cliente",
      uf: String = "uf",
      cidade: String = "cidade",
      valor: String = "valor_orcado"): DataFrame = {

    val perClient = fact
      .groupBy(col(cliente).as("cliente"))
      .agg(
        sum(coalesce(col(valor), lit(0.0))).as("valor_total_orcado"),
        min(col(nome)).as("nome_cliente"),
        min(col(uf)).as("uf"),
        min(col(cidade)).as("cidade"))

    val total = Window.partitionBy() // percent-of-total over the client aggregate
    val cumW = Window
      .orderBy(col("valor_total_orcado").desc, col("cliente").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rankW = Window.orderBy(col("valor_total_orcado").desc)

    perClient
      .withColumn("grand_total", sum(col("valor_total_orcado")).over(total))
      .withColumn(
        "percentual",
        when(col("grand_total") === 0.0, lit(0.0))
          .otherwise(col("valor_total_orcado") / col("grand_total") * 100))
      .withColumn("percentual_acumulado", sum(col("percentual")).over(cumW))
      .withColumn(
        "abc",
        when(col("grand_total") === 0.0, lit("C")) // zero-total guard MAC:471-476
          .when(col("percentual_acumulado") <= 80.0, lit("A"))
          .when(col("percentual_acumulado") <= 95.0, lit("B"))
          .otherwise(lit("C")))
      .withColumn("ranking", rank().over(rankW))
      .select("cliente", "nome_cliente", "uf", "cidade",
        "valor_total_orcado", "percentual", "percentual_acumulado", "abc", "ranking")
  }

  /** DuckDB-SQL rendering of the same computation over a `fact` CTE
    * with the default column names. Kept adjacent to prevent drift.
    */
  val classifySql: String =
    """SELECT cliente, nome_cliente, uf, cidade, valor_total_orcado, percentual,
      |       percentual_acumulado, abc, ranking
      |FROM (
      |  SELECT *,
      |         CASE WHEN grand_total = 0 THEN 'C'
      |              WHEN percentual_acumulado <= 80.0 THEN 'A'
      |              WHEN percentual_acumulado <= 95.0 THEN 'B'
      |              ELSE 'C' END AS abc,
      |         RANK() OVER (ORDER BY valor_total_orcado DESC) AS ranking
      |  FROM (
      |    SELECT *,
      |           SUM(percentual) OVER (ORDER BY valor_total_orcado DESC, cliente ASC
      |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |             AS percentual_acumulado
      |    FROM (
      |      SELECT *,
      |             SUM(valor_total_orcado) OVER () AS grand_total,
      |             CASE WHEN SUM(valor_total_orcado) OVER () = 0 THEN 0.0
      |                  ELSE valor_total_orcado / SUM(valor_total_orcado) OVER () * 100
      |             END AS percentual
      |      FROM (
      |        SELECT cliente,
      |               SUM(COALESCE(valor_orcado, 0.0)) AS valor_total_orcado,
      |               MIN(nome_cliente) AS nome_cliente,
      |               MIN(uf) AS uf,
      |               MIN(cidade) AS cidade
      |        FROM fact GROUP BY cliente
      |      )
      |    )
      |  )
      |)""".stripMargin
}
