package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a mergeable aggregate.
  *
  * The 100 TB top-k-by-frequency shape: an exact groupBy(term) shuffles
  * the ENTIRE vocabulary (q62's cost ceiling); Misra–Gries keeps at
  * most `capacity` counters per partition — map-side, no shuffle of raw
  * terms — and partials merge by count-addition followed by a
  * subtract-the-(c+1)-th-largest trim. The summary is approximate, but
  * its guarantee is one-sided and survives any merge order: every item
  * with true frequency > n/(capacity+1) is PRESENT in the final
  * summary. A cheap exact recount over just the candidate set (a
  * broadcast filter, shuffle O(capacity) not O(vocabulary)) then makes
  * the end result exact and deterministic — same sketch-prunes /
  * exact-pass-confirms contract as the bloom semi join.
  *
  * Emits map<string,long> (candidate term → approximate count; use the
  * KEYS, recount for truth). The map is NOT order-deterministic —
  * consume keys only. */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string argument, got ${child.dataType}")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = MapType(StringType, LongType)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key.clone(), 1L)
        case None => // classic MG: decrement every counter, drop zeros
          val dead = mutable.ListBuffer.empty[UTF8String]
          buf.foreach { case (k, c) =>
            if (c == 1) dead += k else buf.update(k, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop non-positives — the merge-preserving form of the decrement
      val d = buf.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ListBuffer.empty[UTF8String]
      buf.foreach { case (k, c) =>
        if (c - d <= 0) dead += k else buf.update(k, c - d)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val keys = buf.toArray
    val size = 4 + keys.map { case (k, _) => 4 + k.numBytes() + 8 }.sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(keys.length)
    keys.foreach { case (k, c) =>
      val bytes = k.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg = copy(child = c.head)
}
