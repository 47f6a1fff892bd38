package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-based enrichment operators (SURVEY §2.3: J1, J2, J3, J5, U2).
  *
  * All reference joins are equi-joins against dimension-sized right
  * sides (≤10k rows in the reference); each is explicitly
  * `broadcast()` so the 100 TB fact side never shuffles for them.
  * Catalyst auto-broadcasts under the threshold, but the hint makes
  * the intent explicit and survives a mis-estimated dim size.
  */
object Enrich {

  /** J2: left join fact × category dim on the product code (reference
    * `análise_produtos_clientes.py:162-167`,
    * `manipulacao-analise-comercial.py:502-509`).
    *
    * Like the reference's pandas merge, a duplicate dim key fans out —
    * preserved by design (SURVEY §7 hard-part 5); call
    * [[dedupeByKey]] on the dim first if that is not wanted.
    */
  def joinCategorias(
      fact: DataFrame,
      dim: DataFrame,
      key: String = "codigo_produto",
      dimCols: Seq[String] = Seq("negocio", "grupo", "subgrupo")): DataFrame =
    fact.join(broadcast(dim.select((key +: dimCols).map(col): _*)), Seq(key), "left")

  /** J1: inner join fact × ABC classification on the client key
    * (reference APC:180, MAC:35-41).
    *
    * No broadcast hint: the ABC side has CLIENT cardinality
    * (thousands-millions, unlike the ≤10k category dim), so a forced
    * broadcast would OOM the driver at the 100 TB tier. AQE picks
    * broadcast automatically when the classified frame happens to be
    * small, and falls back to a shuffle join when it is not.
    */
  def joinAbc(fact: DataFrame, abc: DataFrame, key: String = "cliente"): DataFrame =
    fact.join(abc, Seq(key), "inner")

  /** J5: left join × ABC with default row on miss — class 'C', zeros
    * (reference MAC:337-348 hand-rolled lookup with default).
    * Client-cardinality right side: no forced broadcast, same as J1.
    */
  def joinAbcWithDefault(fact: DataFrame, abc: DataFrame, key: String = "cliente"): DataFrame =
    fact.join(abc, Seq(key), "left")
      .withColumn("abc", coalesce(col("abc"), lit("C")))
      .withColumn("valor_total_orcado", coalesce(col("valor_total_orcado"), lit(0.0)))

  /** J3 helper: keep exactly one row per key, by explicit order —
    * pandas `drop_duplicates` keeps the first row in frame order
    * (reference APC:109); Spark needs the order spelled out
    * (SURVEY §7 hard-part 1).
    */
  def dedupeByKey(df: DataFrame, key: Seq[String], orderBy: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(orderBy.map(col): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** J3: attach one (uf, cidade) per client via right-side dedup then
    * left join (reference APC:109).
    */
  def joinClienteGeo(df: DataFrame, fact: DataFrame): DataFrame = {
    val geo = dedupeByKey(
      fact.select("cliente", "uf", "cidade", "rid"),
      Seq("cliente"), Seq("rid")).drop("rid")
    df.join(broadcast(geo), Seq("cliente"), "left")
  }

  /** U2: coverage diagnostic — distinct fact keys missing from the dim
    * (reference MAC:746-755 set-difference). Left-anti join keeps the
    * fact side distributed; the distinct collapses it first so the
    * anti-join probes at key cardinality.
    */
  def missingFromDim(fact: DataFrame, dim: DataFrame, key: String = "codigo_produto"): DataFrame =
    fact.select(key).distinct()
      .join(broadcast(dim.select(key).distinct()), Seq(key), "left_anti")

  /** The combined compatibility report (reference
    * `verificar_compatibilidade_dataframes` MAC:726-774): join-key and
    * required-column presence, key cardinalities on both sides, and
    * the count/percent of fact keys with no dim match — one row.
    *
    * Schema checks are driver-side booleans (free); the three counts
    * come from key-cardinality aggregates, and the cross joins are
    * single-row frames — nothing here touches fact-row cardinality
    * after the first distinct.
    */
  def compatibilityReport(
      fact: DataFrame,
      dim: DataFrame,
      key: String = "codigo_produto",
      requiredFact: Seq[String] = Nil,
      requiredDim: Seq[String] = Nil): DataFrame = {
    val keyBoth = fact.columns.contains(key) && dim.columns.contains(key)
    val colsOk = requiredFact.forall(fact.columns.contains) &&
      requiredDim.forall(dim.columns.contains)
    if (!keyBoth) {
      // Without the key on both sides the coverage counts are
      // undefined; report the failing flag instead of crashing on the
      // select below (the reference's report path, MAC:732-737).
      return fact.sparkSession.range(1).select(
        lit(false).as("key_present_both"),
        lit(colsOk).as("required_cols_ok"),
        lit(0L).as("n_fact_keys"), lit(0L).as("n_dim_keys"), lit(0L).as("n_missing"),
        lit(null).cast("double").as("pct_missing"))
    }
    val factKeys = fact.select(key).distinct()
    val dimKeys = dim.select(key).distinct()
    val missing = factKeys.join(broadcast(dimKeys), Seq(key), "left_anti")
    factKeys.agg(count(lit(1)).as("n_fact_keys"))
      .crossJoin(dimKeys.agg(count(lit(1)).as("n_dim_keys")))
      .crossJoin(missing.agg(count(lit(1)).as("n_missing")))
      .select(
        lit(keyBoth).as("key_present_both"),
        lit(colsOk).as("required_cols_ok"),
        col("n_fact_keys"), col("n_dim_keys"), col("n_missing"),
        round(col("n_missing") / col("n_fact_keys") * 100, 4).as("pct_missing"))
  }
}
