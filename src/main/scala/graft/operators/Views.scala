package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interactive-view operators: parametric filter/sort/paginate plus
  * display formatting (SURVEY §2 F3, O2, O4, C7, C8, C10, and the
  * `spark.sql` escape hatch replacing the reference's `exec()`).
  *
  * The reference recomputes these per UI interaction behind
  * `st.cache_data` (MAC:416-437, 511-516); in Spark the enriched frame
  * is `.persist()`-ed once and these lazy transforms re-plan cheaply.
  */
object Views {

  /** F3: conjunctive equality filters where the value "Todos" (= all)
    * skips that predicate (reference `filtrar_dataframe` MAC:416-432).
    */
  def filtrar(df: DataFrame, filters: Map[String, String], wildcard: String = "Todos"): DataFrame =
    filters.foldLeft(df) {
      case (d, (_, v)) if v == wildcard => d
      case (d, (c, v)) => d.filter(col(c) === v)
    }

  /** O2: parametric sort (reference `ordenar_dataframe` MAC:434-437). */
  def ordenar(df: DataFrame, c: String, ascending: Boolean): DataFrame =
    df.orderBy(if (ascending) col(c).asc else col(c).desc)

  /** Wide → long reshape (`pandas.melt` / SQL UNPIVOT) — the inverse
    * of the status pivot: each input row becomes one output row per
    * value column, keyed by `idCols` plus the source column's name.
    * Spark plans this as an Expand (row multiplication ×
    * |valueCols|) — a NARROW op, no shuffle; the value columns must
    * share (or coerce to) one common type, which unpivot enforces
    * with a clear error rather than silently stringifying. Nulls are
    * kept, matching pandas melt.
    */
  def melt(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      varName: String = "variable",
      valueName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, varName, valueName)

  /** O4: pagination (reference `paginar_dataframe` MAC:511-516).
    * Requires an explicit total order to be meaningful on a distributed
    * engine; pandas pages over frame order.
    *
    * Scale shape: `orderBy + offset + limit` plans as a top-(page ×
    * perPage) TakeOrdered — each partition contributes at most
    * page×perPage candidate rows, no partition-less window, no global
    * sort of the input. Sane for the UI-pagination access pattern
    * (small page numbers); deep random seeks should use a keyset
    * (`WHERE order_key > last_seen LIMIT n`) instead.
    */
  def paginar(df: DataFrame, page: Int, perPage: Int, order: Seq[Column]): DataFrame = {
    val lo = (page - 1) * perPage
    df.orderBy(order: _*).offset(lo).limit(perPage)
  }

  /** Top-k rows per group by an explicit order (absent from the
    * reference — SURVEY §2.6 notes "no top-k-per-group" — but a
    * first-class ask of any analytics surface). The window is
    * partitioned by the group keys, so it scales: each group ranks
    * independently, no global sort.
    */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** C7: currency display format "R$ 1,234.56" (reference APC:122,
    * MAC:621 use US-style separators via `"R$ {:,.2f}"`); null → "".
    */
  def formatCurrency(c: Column): Column =
    when(c.isNull, lit("")).otherwise(concat(lit("R$ "), format_number(c, 2)))

  /** C8: percent display format "12.34%" (reference APC:126-127). */
  def formatPercent(c: Column): Column =
    when(c.isNull, lit("")).otherwise(format_string("%.2f%%", c))

  /** C10: join a list column into a display string (reference APC:311,
    * MAC:708-720).
    */
  def joinList(c: Column, sep: String): Column = array_join(c, sep)

  /** The reference lets users run arbitrary Python against the frame
    * via `exec()` (MAC:1048-1058). The Spark-native, safer analog:
    * register the frame and run SQL.
    */
  def sqlOn(spark: SparkSession, df: DataFrame, viewName: String, sql: String): DataFrame = {
    df.createOrReplaceTempView(viewName)
    spark.sql(sql)
  }
}
