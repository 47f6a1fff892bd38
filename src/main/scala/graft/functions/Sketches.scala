package graft.functions

import org.apache.spark.sql.Column

import org.apache.spark.sql.graft.{ColumnBridge, MisraGriesAgg}

/** Heavy-hitter sketch aggregates — the mergeable-summary tier beside
  * [[TopK]] (which bounds "k best ROWS per group" but still needs the
  * exact per-key counts upstream). Where the KEY FRAME itself is
  * web-scale (corpus vocabulary, join-key histograms), the exact
  * explode → groupBy → TakeOrdered path materializes the full key
  * aggregate before the head is cut; these summaries never do.
  */
object Sketches {

  /** Misra-Gries heavy-hitter summary of a string column
    * ([[org.apache.spark.sql.graft.MisraGriesAgg]]): ≤ `k` (word, est)
    * counters, mergeable map-side like any sketch aggregate.
    * Guarantees with N = number of non-null input rows (any
    * partitioning, any merge order): every value with true count
    * > N/(k+1) is present, and every estimate e satisfies
    * e ≤ true ≤ e + N/(k+1). Returns
    * `array<struct<word:string, est:bigint>>` sorted (est desc,
    * word asc).
    */
  def misraGries(word: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(word), k).toAggregateExpression())
}
