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

  /** CUSUM mean-shift detection over a per-period count series (Page
    * 1954) — the sequential drift detector the pointwise MAD gate
    * (`events_anomaly_days`) cannot replace: a SUSTAINED small shift,
    * each period individually inside the envelope, accumulates until
    * the one-sided statistics cross the alarm boundary. Robust
    * self-calibrating parameters: target = median of the series,
    * slack k = MAD, alarm at `hMads`·max(MAD, 1) — all exact
    * integers, so the whole statistic is engine-portable with no
    * tolerance.
    *
    *   S⁺_t = max(0, S⁺_{t−1} + (n_t − med − mad))
    *   S⁻_t = max(0, S⁻_{t−1} + (med − n_t − mad))
    *
    * `series` is a per-period aggregate `(dCol, nCol)` — the caller
    * lands it from the corpus-sized groupBy (and checkpoint-cuts it:
    * it feeds the median, the MAD, and the fold). The inherently
    * sequential recursion runs as ONE fold over the period-ordered
    * list — bounded by the MONITORING WINDOW's period count by
    * construction (the packSequences sequential-unit contract),
    * never by the event count. Output:
    * `(d, n_events, cusum_pos, cusum_neg, is_shift)`.
    */
  def cusumShift(
      series: DataFrame,
      dCol: String,
      nCol: String,
      hMads: Int = 5): DataFrame = {
    require(hMads >= 1, s"hMads must be >= 1, got $hMads")
    val daily = series.select(col(dCol).as("d"), col(nCol).cast("long").as("n"))
    val med1 = daily.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)").cast("long").as("med"))
    val mad1 = daily.crossJoin(broadcast(med1))
      .withColumn("__dev", abs(col("n") - col("med")))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __dev)")
        .cast("long").as("mad"))
    val acc0 = struct(
      expr("array()").cast(
        s"array<struct<d:${daily.schema("d").dataType.sql},n:bigint,sp:bigint,sn:bigint>>")
        .as("rows"),
      lit(0L).as("sp"), lit(0L).as("sn"))
    daily.crossJoin(broadcast(med1)).crossJoin(broadcast(mad1))
      .groupBy(col("med"), col("mad"))
      .agg(sort_array(collect_list(struct(col("d"), col("n")))).as("ds"))
      .select(col("med"), col("mad"), explode(aggregate(
        col("ds"), acc0,
        (acc, x) => {
          val sp2 = greatest(acc.getField("sp") +
            (x.getField("n") - col("med") - col("mad")), lit(0L)).cast("bigint")
          val sn2 = greatest(acc.getField("sn") +
            (col("med") - x.getField("n") - col("mad")), lit(0L)).cast("bigint")
          struct(
            concat(acc.getField("rows"),
              array(struct(x.getField("d").as("d"), x.getField("n").as("n"),
                sp2.as("sp"), sn2.as("sn")))).as("rows"),
            sp2.as("sp"), sn2.as("sn"))
        },
        acc => acc.getField("rows"))).as("r"))
      .select(col("r.d").as("d"), col("r.n").as("n_events"),
        col("r.sp").as("cusum_pos"), col("r.sn").as("cusum_neg"),
        (col("r.sp") > lit(hMads.toLong) * greatest(col("mad"), lit(1L)) ||
          col("r.sn") > lit(hMads.toLong) * greatest(col("mad"), lit(1L))).as("is_shift"))
  }

  /** Holt LINEAR-TREND forecast (double exponential smoothing) over a
    * daily count series — the PREDICTIVE member beside the
    * descriptive pair (seasonal decomposition W16 explains the past;
    * CUSUM W14 detects a shift after it happens; Holt says what
    * tomorrow should look like, which is what capacity planning and
    * anomaly thresholds consume):
    *
    *   forecast_t = l_{t−1} + b_{t−1}   (one step ahead)
    *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * with α = 1/alphaDen, β = 1/betaDen run EXACTLY in centi-unit
    * integers: l, b, forecast carry ×100 fixed point and each
    * smoothing step is ONE truncate-toward-zero integer division
    * (both engines truncate identically on signed values — the LR
    * update contract), so the oracle replays the recursion as a
    * recursive CTE bit-for-bit. Init: l₁ = y₁·100, b₁ = 0 (trend is
    * LEARNED through β rather than seeded from y₂−y₁ — one fewer
    * special case, documented); forecast₁ ≡ y₁ so err₁ = 0 by
    * construction.
    *
    * Scale shape: the corpus collapses to ONE day-keyed count
    * aggregate; the sequential fold runs in-row over the
    * day-cardinality array (the cusumShift idiom — thousands of days
    * cost kilobytes) and never sees corpus rows.
    *
    * Output: (d, n_events, forecast_c, level_c, trend_c, err_c) —
    * centi-units throughout; err_c = y·100 − forecast_c.
    */
  def holtForecast(
      series: DataFrame,
      dCol: String,
      nCol: String,
      alphaDen: Int = 5,
      betaDen: Int = 10): DataFrame = {
    require(alphaDen >= 2 && betaDen >= 2,
      s"alphaDen/betaDen must be >= 2, got $alphaDen/$betaDen")
    // Truncate-toward-zero division, PURE INTEGER: subtracting the
    // dividend-signed remainder (Spark `%` takes the dividend's sign)
    // makes the numerator exactly divisible, and the decimal(38,0)
    // quotient of an exact division is the exact integer — no double
    // floor, so the result stays aligned with the DuckDB oracle's
    // bigint `//` (and holtForecastStream's Long `/`) even once the
    // centi-unit numerator exceeds 2^53 at extreme daily volumes.
    // (expr("a DIV d") can't be used here: tdiv runs on the
    // aggregate() HOF's lambda variables, which string expr can't
    // resolve.)
    def tdiv(a: Column, d: Long): Column =
      ((a - (a % d)).cast("decimal(38,0)") / d).cast("long")
    val daily = series.select(col(dCol).as("d"), col(nCol).cast("long").as("n"))
    val acc0 = struct(
      expr("array()").cast(
        s"array<struct<d:${daily.schema("d").dataType.sql},n:bigint,f:bigint,l:bigint,b:bigint>>")
        .as("rows"),
      lit(0L).as("l"), lit(0L).as("b"), lit(0).as("started"))
    daily
      .groupBy()
      .agg(sort_array(collect_list(struct(col("d"), col("n")))).as("ds"))
      .select(explode(aggregate(
        col("ds"), acc0,
        (acc, x) => {
          val y100 = x.getField("n") * 100L
          val f = when(acc.getField("started") === 0, y100)
            .otherwise(acc.getField("l") + acc.getField("b"))
          val l1 = when(acc.getField("started") === 0, y100)
            .otherwise(tdiv(y100 + lit((alphaDen - 1).toLong) *
              (acc.getField("l") + acc.getField("b")), alphaDen.toLong))
          val b1 = when(acc.getField("started") === 0, lit(0L))
            .otherwise(tdiv((l1 - acc.getField("l")) +
              lit((betaDen - 1).toLong) * acc.getField("b"), betaDen.toLong))
          struct(
            concat(acc.getField("rows"),
              array(struct(x.getField("d").as("d"), x.getField("n").as("n"),
                f.cast("bigint").as("f"), l1.cast("bigint").as("l"),
                b1.cast("bigint").as("b")))).as("rows"),
            l1.cast("bigint").as("l"), b1.cast("bigint").as("b"),
            lit(1).as("started"))
        },
        acc => acc.getField("rows"))).as("r"))
      .select(col("r.d").as("d"), col("r.n").as("n_events"),
        col("r.f").as("forecast_c"), col("r.l").as("level_c"),
        col("r.b").as("trend_c"),
        (col("r.n") * 100L - col("r.f")).as("err_c"))
  }
}
