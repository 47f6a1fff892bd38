package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary as a MERGEABLE Spark aggregate —
  * the bounded-memory substitute for exact "top-k keys by count" when
  * the key frame itself is web-scale (a 100 TB corpus's vocabulary is
  * billions of n-grams: the exact groupBy's shuffled aggregate IS the
  * bottleneck; this summary ships `k` counters per map partition and
  * merges associatively, the same contract as Spark's own HLL++ /
  * BloomFilterAggregate).
  *
  * Algorithm (Misra & Gries 1982; merge rule from Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS 2012): keep
  * ≤ `k` counters; an unseen word either claims a free counter or
  * decrements ALL counters by one (dropping zeros). Merging sums
  * counters pointwise, then subtracts the (k+1)-th largest value and
  * drops the non-positive remainder. Guarantees, with N = stream
  * length: every word with true count > N/(k+1) HAS a counter, and
  * every counter's estimate e satisfies e ≤ true ≤ e + N/(k+1) —
  * both hold under ANY partitioning and merge order, which is exactly
  * the portable contract the oracle can check (the raw estimates are
  * merge-order-dependent and are NOT registered; the A16 sketch
  * posture).
  *
  * Scale shape: per-group state is ≤ k (word, count) pairs regardless
  * of input size; map-side partials reduce each task to one k-entry
  * summary before the shuffle. Usable grouped
  * (`df.groupBy(key).agg(...)`) or global — the buffer never sees
  * more than k + 1 live entries either way.
  *
  * Output: `array<struct<word:string, est:bigint>>` sorted
  * (est desc, word asc) — deterministic GIVEN the final counter set.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String]
      buf.get(w) match {
        case Some(c) => buf.update(w, c + 1L)
        case None if buf.size < k =>
          // Clone: the incoming UTF8String points into a reused row
          // buffer; keeping it un-copied would alias every later row.
          buf.update(w.clone(), 1L)
        case None =>
          // Decrement-all: amortized O(1) per stream item (each
          // firing retires k stream items' worth of count).
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.iterator.foreach { case (key, c) =>
            if (c == 1L) dead += key
          }
          buf.mapValuesInPlace((_, c) => c - 1L)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (w, c) =>
      // `w` is owned (deserialized or cloned at update) — safe to keep.
      buf.update(w, buf.getOrElse(w, 0L) + c)
    }
    if (buf.size > k) {
      // Subtract the (k+1)-th largest counter, drop the non-positive:
      // the PODS'12 mergeable-summaries rule — error adds across
      // merges but stays ≤ N/(k+1) total.
      val vals = buf.values.toArray
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.iterator.foreach { case (key, c) =>
        if (c - sub <= 0L) dead += key
      }
      buf.mapValuesInPlace((_, c) => c - sub)
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray
    java.util.Arrays.sort(rows, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val byCount = java.lang.Long.compare(b._2, a._2) // est desc
        if (byCount != 0) byCount else a._1.compareTo(b._1) // word asc
      }
    })
    new GenericArrayData(rows.map { case (w, c) => InternalRow(w, c) })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) =>
      val bytes = w.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      buf.update(UTF8String.fromBytes(b), in.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("word", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)

  override def prettyName: String = "misra_gries"
}
