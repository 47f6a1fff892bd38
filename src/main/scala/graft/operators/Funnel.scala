package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step conversion funnels over an event stream — "of the
  * users who did A, how many later did B, and later still C?"
  *
  * The reference app has no event-sequence analytics at all (its
  * closest shape is the status_processo breakdown, reference
  * `manipulacao-analise-comercial.py:560-610` — a plain group-by); a
  * training-data / product-analytics pipeline over an events table
  * needs the sequencing class directly, so this registers it the way
  * ClickHouse's `windowFunnel` / BigQuery funnels define it:
  *
  *   stage k is reached at the FIRST event of type `steps(k)` whose
  *   timestamp is STRICTLY greater than the stage-(k-1) timestamp;
  *   stage 0's anchor is the minimum timestamp of `steps(0)`.
  *
  * This "min-cascade" definition is order-deterministic without any
  * tie-break: each stage time is a conditional MIN over exact
  * epoch-micros, so same-microsecond ties collapse identically in
  * every engine (a strict `>` also means an A and B at the same
  * microsecond do NOT chain — documented, matches ClickHouse's
  * `strictly_increasing` mode).
  *
  * Implementation is a single fold over each user's time-sorted event
  * list (`sort_array(collect_list(struct))` + the codegen'd
  * higher-order `aggregate`), NOT k self-joins: one shuffle on the
  * user key, each task walks one user's timeline linearly, and the
  * accumulator is k nullable longs regardless of event count. The
  * fold is provably equivalent to the min-cascade: scanning in
  * ascending (ts, id) order, the first qualifying event IS the
  * conditional minimum. The per-user `collect_list` bounds memory at
  * one user's event count — the same posture as sessionization and
  * sequence packing; for corpora with pathological single-key
  * timelines the degrade path is the k-stage cascade of
  * co-partitioned conditional aggregates (k scans, constant per-key
  * state), which this operator's semantics were deliberately chosen
  * to match so the two plans are interchangeable.
  */
object Funnel {

  /** Per-user funnel stage times.
    *
    * @param events frame with `userCol`, `tsCol` (exact epoch-micros
    *               bigint), `typeCol` (event type string)
    * @param steps  ordered funnel step types, length >= 1
    * @return one row per distinct user: `userCol`, `stage` (0..k =
    *         furthest step reached), and `step_us` — array of k
    *         nullable epoch-micros stage times
    */
  def stageTimes(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts_us",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.length

    val acc0 = array(steps.map(_ => lit(null).cast("bigint")): _*)
    def accStep(acc: Column, e: Column): Column = {
      val ts = e.getField("ts")
      val tp = e.getField("tp")
      array((0 until k).map { i =>
        val slot = element_at(acc, i + 1)
        val eligible =
          if (i == 0) tp === steps(i)
          else tp === steps(i) && element_at(acc, i).isNotNull &&
            ts > element_at(acc, i)
        when(slot.isNull && eligible, ts).otherwise(slot)
      }: _*)
    }

    val folded = events
      .select(col(userCol),
        struct(col(tsCol).cast("long").as("ts"), col(typeCol).as("tp")).as("e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(col(userCol), aggregate(col("evs"), acc0, accStep).as("step_us"))

    // Furthest stage = count of non-null slots; the fold can only fill
    // slot i after slot i-1, so the non-null prefix IS the stage.
    folded.withColumn("stage",
      aggregate(col("step_us"), lit(0L),
        (n, s) => when(s.isNotNull, n + 1L).otherwise(n)))
  }

  /** Funnel summary: users reaching AT LEAST each stage. One
    * aggregate at user cardinality (the heavy lifting happened in
    * [[stageTimes]]'s one shuffle), then a suffix-sum window over the
    * k+1-row histogram — `n_users` is monotonically non-increasing by
    * construction. No driver-side action anywhere.
    */
  def summary(stages: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = stages.groupBy(col("stage")).agg(count(lit(1)).as("n_exact"))
    val w = Window.orderBy(col("stage").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.select(col("stage"),
      sum(col("n_exact")).over(w).as("n_users"))
  }
}
