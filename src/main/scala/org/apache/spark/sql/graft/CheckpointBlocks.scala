package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of `localCheckpoint` block storage.
  *
  * `Dataset.unpersist` only removes CacheManager entries; the blocks
  * behind an eager `localCheckpoint` are RDD-level persisted and
  * untouched by it — they normally free only when the ContextCleaner
  * garbage-collects the underlying RDD. Iterative operators
  * (label-propagation rounds, Lloyd iterations) supersede a
  * checkpointed frame every round, and a long-lived session should
  * not hold round-count × frame-size blocks hostage to driver GC
  * timing. This helper walks the frame's analyzed plan for the
  * [[LogicalRDD]] leaves a checkpoint compiles to and unpersists
  * their RDDs directly (non-blocking).
  *
  * Only call it on frames whose blocks no further computation reads —
  * i.e. after every downstream consumer has either materialized
  * (checkpointed) or finished. Releasing early does not corrupt
  * results (the RDD would recompute), but for a checkpoint the
  * recompute lineage is the checkpoint itself, so a released-too-soon
  * frame fails loudly rather than silently recomputing.
  */
object CheckpointBlocks {
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(false)
      case _              => ()
    }
}
