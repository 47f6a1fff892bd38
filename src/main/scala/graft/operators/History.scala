package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped ordered history collection — the most complex operator in
  * the reference (SURVEY §2.4 A8/A9/A10, §2.5 W5).
  *
  * Reference: per (subgrupo, codigo_produto, cliente) group, sort rows
  * by entry date and emit the per-group history as lists, plus the last
  * date and the consultant on the last row
  * (`análise_produtos_clientes.py:273-298`,
  * `manipulacao-analise-comercial.py:53-83` and `:314-389`).
  *
  * Spark-first shape: ONE shuffle (the groupBy), map-side partial
  * `collect_list`, then all ordering/unzipping happens on the collected
  * array with codegen'd array expressions:
  *
  *   sort_array(collect_list(struct(dt, rid, ...)))
  *
  * Struct comparison is lexicographic, so leading (dt, rid) gives a
  * deterministic total order inside each group — stronger than the
  * reference, whose order is whatever pandas' sort left (SURVEY §7
  * hard-part 1). The reference's batched loop + gc (MAC:302-393) is
  * exactly what Tungsten spill does for free.
  *
  * Scale: per-group state is the group's history array. Group keys are
  * (product, client) pairs — at 100 TB this is many small groups, not
  * few huge ones, so `collect_list` is safe; a pathological key would
  * be handled with AQE skew-split plus a
  * `TypedImperativeAggregate` bounded-memory variant (SURVEY §2.9).
  */
object History {

  /** A9: build the history table. Expects the fact enriched with dim
    * columns (J2) and a unique `rid` tie-break column.
    */
  def historico(
      enriched: DataFrame,
      keys: Seq[String] = Seq("subgrupo", "codigo_produto", "cliente"),
      dateFmt: String = "dd/MM/yyyy"): DataFrame = {
    // Sort key is the FULL tuple: `rid` alone is not unique in the
    // test data (duplicate (orderkey, linenumber) pairs exist), and a
    // partial key would leave tied rows in nondeterministic order.
    // motivo is empty-coalesced BEFORE the sort so null-ordering
    // differences between engines cannot matter (C9). The formatted
    // date rides as a TRAILING struct field: it is a function of
    // dt_entrada so the sort order is unchanged, and the unzip below
    // becomes pure field extraction.
    //
    // The struct is built in a SELECT below the groupBy, not inline in
    // the aggregate: ObjectHashAggregate's update loop evaluates its
    // input expressions INTERPRETED (no whole-stage codegen), so an
    // inline struct(…, date_format(…)) runs six interpreted evals +
    // a formatter per row on the megamorphic Expression.eval path —
    // round-5 profiling caught exactly this (`Collect.update ←
    // CreateNamedStruct.eval` burning a core). As a projected column
    // the struct is assembled once per row inside codegen and the
    // aggregate's input is a single bound reference.
    enriched
      .filter(col("dt_entrada").isNotNull) // reference re-parses + range-filters first (APC:261-267)
      .select(keys.map(col) :+ struct(
        col("dt_entrada"), col("rid"), col("prob_fech"),
        coalesce(col("motivo_nao_venda"), lit("")).as("motivo_nao_venda"),
        col("consultor_interno"),
        date_format(col("dt_entrada"), dateFmt).as("dt_str")).as("e"): _*)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col("e"))).as("h"), count(lit(1)).as("n_propostas"))
      .select(
        keys.map(col) ++ Seq(
          col("n_propostas"),
          // `h.field` on array<struct> is GetArrayStructFields — a
          // single codegen'd pass per column, vs the interpreted
          // `transform(h, x -> ...)` lambdas this replaces (round-2
          // bench: the three transforms + per-element date_format were
          // most of a9's 31 s at sf0.1).
          expr("h.dt_str").as("datas_entrada"),
          expr("h.prob_fech").as("probs_fech"),
          expr("h.motivo_nao_venda").as("motivos_nao_venda"),
          expr("element_at(h, -1).dt_str").as("ultima_data"),
          // A8 argmax: consultant on the max-(dt, rid) row — last element
          // of the sorted struct array (reference idxmax APC:296, MAC:79-81).
          expr("element_at(h, -1).consultor_interno").as("ultimo_consultor")): _*)
  }

  /** A9 bounded-memory fallback (SURVEY §2.9): the same history table,
    * but each group keeps only the FIRST `maxN` rows of the total
    * order, plus the true group size and an overflow count.
    *
    * Why it exists: [[historico]]'s `collect_list` buffer must hold a
    * group's whole history in executor memory — fine when (product,
    * client) keys are many and small, fatal for a pathological hot key
    * at the 100 TB tier. Here per-group memory is bounded end-to-end:
    * WindowExec ranks rows with a SPILLABLE external buffer, the
    * rank filter keeps ≤ maxN rows, and only those reach
    * `collect_list`. The groupBy reuses the window's hash partitioning
    * (one shuffle total, same as the uncapped operator).
    *
    * `ultima_data`/`ultimo_consultor` stay EXACT (not capped): they
    * derive from a constant-state `max(struct)` window over the full
    * group — the A8 argmax semantics survive the cap.
    */
  def historicoCapped(
      enriched: DataFrame,
      maxN: Int,
      keys: Seq[String] = Seq("subgrupo", "codigo_produto", "cliente"),
      dateFmt: String = "dd/MM/yyyy"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = struct(
      col("dt_entrada"), col("rid"), col("prob_fech"),
      coalesce(col("motivo_nao_venda"), lit("")).as("motivo_nao_venda"),
      col("consultor_interno"),
      date_format(col("dt_entrada"), dateFmt).as("dt_str"))
    val part = Window.partitionBy(keys.map(col): _*)
    enriched
      .filter(col("dt_entrada").isNotNull)
      .select(keys.map(col) :+ e.as("e"): _*)
      .withColumn("__rn", row_number().over(part.orderBy(col("e"))))
      .withColumn("__total", count(lit(1)).over(part))
      .withColumn("__last", max(col("e")).over(part))
      .filter(col("__rn") <= maxN)
      .groupBy(keys.map(col): _*)
      .agg(
        sort_array(collect_list(col("e"))).as("h"),
        max("__total").as("n_propostas"),
        first(col("__last")).as("last"))
      .select(
        keys.map(col) ++ Seq(
          col("n_propostas"),
          expr("h.dt_str").as("datas_entrada"),
          expr("h.prob_fech").as("probs_fech"),
          expr("h.motivo_nao_venda").as("motivos_nao_venda"),
          col("last.dt_str").as("ultima_data"),
          col("last.consultor_interno").as("ultimo_consultor"),
          (col("n_propostas") - size(col("h")).cast("long")).as("n_overflow")): _*)
  }

  /** A10: collapse a list to its single value when uniform, else join
    * to a display string (reference `primeiro_elemento` APC:233-243 +
    * formatter APC:311, MAC:714-720). Returns a string column — Spark
    * columns cannot hold scalar-or-list mixes (SURVEY §7 hard-part 2).
    */
  def collapseIfUniform(arrayCol: String, sep: String = ", "): org.apache.spark.sql.Column =
    when(size(array_distinct(col(arrayCol))) === 1, element_at(col(arrayCol), 1))
      .otherwise(array_join(col(arrayCol), sep))

  /** C9: conditional display tuple (reference `criar_tupla`
    * APC:213-221) — (date, prob, consultant) plus the motivo slot only
    * when non-empty: `array_compact` drops the nulled 4th element,
    * reproducing the reference's 3-vs-4-tuple without heterogeneous
    * cells (SURVEY §2.8 C9 mapping).
    */
  def tuplaDados(
      dt: org.apache.spark.sql.Column,
      prob: org.apache.spark.sql.Column,
      consultor: org.apache.spark.sql.Column,
      motivo: org.apache.spark.sql.Column,
      dateFmt: String = "dd/MM/yyyy"): org.apache.spark.sql.Column =
    array_compact(array(
      date_format(dt, dateFmt),
      prob.cast("string"),
      consultor,
      nullif(motivo, lit(""))))
}
