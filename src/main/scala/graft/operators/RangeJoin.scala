package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join with NO equi key: left rows carrying a point
  * `ts` matched to right rows carrying an interval `[lo, hi]`, both in
  * the same (integer) domain — "events inside any maintenance window",
  * "clicks near an error", "reads overlapping a gene region".
  *
  * Spark plans a bare `l.ts BETWEEN r.lo AND r.hi` join condition as
  * BroadcastNestedLoopJoin (or a cartesian product with neither side
  * broadcastable) — the |L|×|R| scan the 100 TB tier cannot pay. The
  * scalable shape is time-bucketing: quantize the domain into
  * fixed-width buckets, explode each interval onto every bucket it
  * touches, put each point in its ONE bucket, equi-join on the bucket
  * id, and keep the exact `between` as a post-join filter. The
  * equi-join shuffles |L| + |R| × (avg interval width / bucketWidth)
  * rows and never builds the cross product; because a point lands in
  * exactly one bucket, a matching (point, interval) pair meets in
  * exactly one bucket and the output needs NO dedup pass.
  *
  * `bucketWidth` tuning: pick it near the typical interval width —
  * wider buckets explode intervals less but make each bucket's
  * candidate set larger (more post-filter discards); narrower is the
  * reverse. Uniform-width buckets inherit the domain's skew: a bucket
  * holding a hot burst becomes a hot join key (salt upstream via
  * [[Skew]] if one window dominates).
  *
  * Bucket ids come from integer `div` — exact on the full bigint
  * domain (epoch NANOS ≈ 1.7e18 exceed double's 2^53 range, so a
  * float division here would misbucket boundary rows).
  *
  * Precondition: left and right column names must be disjoint (alias
  * first), `lo <= hi` on every right row, and the domain non-negative
  * (`div` truncates toward zero, so negative values would bucket off
  * by one relative to floor — epoch timestamps are safely positive).
  */
object RangeJoin {

  def pointInInterval(
      left: DataFrame,
      tsCol: String,
      right: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left/right column names collide: ${clash.mkString(", ")} — alias them first")

    val lb = left.withColumn("__bucket", expr(s"`$tsCol` div $bucketWidth"))
    val rb = right.withColumn("__bucket",
      explode(sequence(expr(s"`$loCol` div $bucketWidth"), expr(s"`$hiCol` div $bucketWidth"))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(tsCol).between(col(loCol), col(hiCol)))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join — the two-sided sibling of
    * [[pointInInterval]]: sessions × outages, shifts × incidents,
    * reads × gene regions when both carry extent. Overlap is the
    * closed-interval test `l.lo <= r.hi && r.lo <= l.hi`.
    *
    * Same bucketing shape (both sides explode onto the buckets they
    * touch, equi-join on bucket id, exact test post-join) with one
    * extra subtlety the point case doesn't have: an overlapping pair
    * shares EVERY bucket their overlap spans, so a naive bucket join
    * emits it multiple times. Instead of a distinct pass (a full
    * shuffle of the output), each pair is emitted only in its
    * CANONICAL bucket — the bucket where the overlap starts,
    * `greatest(l.lo, r.lo) div bucketWidth`, which both sides
    * necessarily exploded onto. Exactly-once output, no dedup
    * shuffle, bit-identical to the nested-loop semantics.
    *
    * Same preconditions as [[pointInInterval]]: disjoint column
    * names, `lo <= hi`, non-negative domain, and `bucketWidth` near
    * the typical interval width.
    */
  def intervalOverlap(
      left: DataFrame,
      lloCol: String,
      lhiCol: String,
      right: DataFrame,
      rloCol: String,
      rhiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left/right column names collide: ${clash.mkString(", ")} — alias them first")

    val lb = left.withColumn("__bucket",
      explode(sequence(expr(s"`$lloCol` div $bucketWidth"), expr(s"`$lhiCol` div $bucketWidth"))))
    val rb = right.withColumn("__bucket",
      explode(sequence(expr(s"`$rloCol` div $bucketWidth"), expr(s"`$rhiCol` div $bucketWidth"))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(lloCol) <= col(rhiCol) && col(rloCol) <= col(lhiCol))
      .filter(col("__bucket") ===
        expr(s"greatest(`$lloCol`, `$rloCol`) div $bucketWidth"))
      .drop("__bucket")
  }
}
