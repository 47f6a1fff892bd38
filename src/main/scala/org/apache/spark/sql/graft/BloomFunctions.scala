// Lives under org.apache.spark.sql for the same reason as
// CosineSimilarityExpr: the expressions wrapped here
// (BloomFilterAggregate / BloomFilterMightContain — the pair Spark's
// own InjectRuntimeFilter builds runtime bloom filters from) are
// catalyst-internal and not exposed through `functions._`.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column-level access to Spark's bloom-filter sketch expressions.
  *
  * Why: a broadcast/scalar-subquery bloom filter is THE semi-join
  * reduction for "batch vs standing corpus" joins whose build side is
  * too big to broadcast as a hash relation — the corpus key set
  * aggregates into a few-hundred-KB sketch (mergeable, map-side
  * partial like any TypedImperativeAggregate), ships to every task as
  * one scalar, and pre-drops the non-matching probe rows so the real
  * join only carries candidates. Spark's optimizer injects exactly
  * this shape on its own (`spark.sql.optimizer.runtime.bloomFilter.*`)
  * but only under shuffle-join cost conditions it can see; exposing
  * the expressions lets operators build the reduction deliberately
  * where the semantics (exactness via a verify join) are known.
  */
object BloomFunctions {

  /** Aggregate a LongType column (hash your key first — e.g.
    * `xxhash64(col)`) into a serialized bloom filter (binary, one
    * row). `expectedItems` sizes the filter for the intended false-
    * positive rate; it is a SIZING hint, not a cap — overshooting
    * just raises the FP rate, never drops items.
    */
  def bloomFilterAgg(hashed: Column, expectedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(hashed), expectedItems).toAggregateExpression())

  /** `might_contain(bloom, hashed)` — false ⇒ DEFINITELY absent,
    * true ⇒ maybe present (verify exactly downstream). `bloom` must
    * be constant-foldable at execution: a literal or a scalar
    * subquery (`bloomDf.scalar()`).
    */
  def mightContain(bloom: Column, hashed: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        ColumnBridge.expression(bloom), ColumnBridge.expression(hashed)))

  /** Null-safe convenience: an empty/absent bloom (null sketch) means
    * "definitely absent" rather than null.
    */
  def mightContainOrFalse(bloom: Column, hashed: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    coalesce(mightContain(bloom, hashed), lit(false))
  }

  private[graft] val nullBloom: Column = ColumnBridge.column(
    Literal.create(null, org.apache.spark.sql.types.BinaryType))
}
