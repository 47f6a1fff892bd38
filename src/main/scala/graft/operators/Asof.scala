package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (a.k.a. backward/point-in-time) join: for every left row,
  * attach the right row with the greatest `rightTs <= leftTs` for the
  * same key — the "most recent state as of this event" join that event
  * pipelines and feature stores need (price as of trade time, profile
  * as of click time, latest snapshot as of ingest time).
  *
  * The reference has no as-of operator; this is part of the engine's
  * §2.12 pipeline scope. Spark has no built-in either, and the naive
  * formulations both fail at scale:
  *
  *   - `left JOIN right ON key AND rightTs <= leftTs` + argmax
  *     explodes to |matches-per-key|² intermediate rows (a range join
  *     planned as BroadcastNestedLoopJoin when keys are skewed), and
  *   - a per-left-row correlated lookup is a driver-side loop.
  *
  * This implementation is the linear union+scan shape instead: tag
  * both sides, union them (schema-aligned, right value columns null on
  * left rows and vice versa), ONE shuffle partitioned by key sorted by
  * `(ts, side)`, then a running `last(value, ignoreNulls = true)` over
  * `rowsBetween(unboundedPreceding, currentRow)` carries the latest
  * right values forward into each left row. Cost: one shuffle at
  * |left| + |right| cardinality and one O(n) pass per key partition —
  * no pair blowup, no driver loop; skew is bounded by the hottest
  * single key (salt upstream via [[Skew]] if one key dominates).
  *
  * Tie semantics: a right row AT `leftTs` wins (inclusive, matching
  * DuckDB `ASOF JOIN ... ON l.ts >= r.ts`); right rows sort before
  * left rows at equal ts via the side tag. Left rows with no earlier
  * right row keep null right values (left-outer semantics).
  *
  * Precondition: `right` must be unique per `(keys, rightTs)` —
  * pre-aggregate it otherwise (at equal key+ts the carried values
  * would depend on shuffle order). To also receive the matched right
  * timestamp, duplicate it into a value column first:
  * `right.withColumn("asof_ts", col(rightTs))`.
  *
  * Null caveat (keys AND timestamps): window partitioning groups NULL
  * keys together, and ascending ordering sorts NULL timestamps first
  * (right-before-left within the null group) — so a null-keyed or
  * null-ts left row CAN pick up a null-keyed / null-ts right row,
  * unlike SQL join equality and `>=`, where null never matches.
  * Filter null keys/timestamps upstream when strict join semantics
  * are required (the oracle query runs on non-null keys and
  * timestamps, where the two semantics agree).
  */
object Asof {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val clash = rightVals.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"right value columns collide with left columns: ${clash.mkString(", ")} — alias them first")

    // Unioned schema: keys ++ __ts ++ __side ++ __lrow (left row as a
    // struct, null on right rows) ++ __rrow (right VALUES as ONE
    // struct, null on left rows). The right values ride as a single
    // struct so the carry is ATOMIC: per-column last(ignoreNulls)
    // windows would each skip nulls independently and stitch together
    // a composite of different right rows whenever a value column is
    // null (e.g. latest ts paired with an older non-null value) — a
    // row that never existed. The struct wrapper is non-null for every
    // right row even when all its fields are null, so ignoreNulls
    // selects the latest right ROW, nulls and all.
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__lrow"),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightVals.map(v => right.schema(v)))).as("__rrow")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lTagged.schema("__lrow").dataType).as("__lrow"),
        struct(rightVals.map(col): _*).as("__rrow")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(
        col("__side"), col("__lrow"),
        last(col("__rrow"), ignoreNulls = true).over(w).as("__rrow"))
    carried.filter(col("__side") === 1)
      .select(col("__lrow.*") +: rightVals.map(v => col("__rrow").getField(v).as(v)): _*)
  }
}
