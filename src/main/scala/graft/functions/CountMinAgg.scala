package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch as a mergeable aggregate: `depth` hash rows of
  * `width` counters; a point-frequency estimate is the MIN over rows of
  * the addressed counter. The guarantee is one-sided — estimate ≥ true
  * count ALWAYS (counters only ever add), and estimate ≤ true count +
  * εN with ε ≈ e/width except with probability e^-depth per query —
  * which makes it the frequency analogue of the bloom filter: a bounded
  * O(depth·width) summary of an unbounded stream, mergeable by
  * elementwise addition (order-independent under any partitioning).
  *
  * The child must be a PRE-HASHED long column (md5-derived, computed in
  * the codegen'd projection below the aggregate — the q53 lesson:
  * TypedImperativeAggregate children evaluate interpreted per row, so
  * the aggregate reads a bare long). Row hashes derive from the base
  * hash by per-row mixing (xor distinct odd constants, then a
  * Fibonacci-multiply avalanche) — deterministic JVM arithmetic; the
  * sketch never leaves the JVM (bounded driver collect, estimates are
  * computed against it), so only the FINAL exact counts and bound
  * booleans need cross-engine portability.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= 16, s"depth in 1..16, got $depth")
  require(width > 0, s"width must be positive, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min requires a pre-hashed long argument, got ${child.dataType}")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        buf(i * width + CountMinAgg.bucket(h, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(_.asInstanceOf[Any]))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CountMinAgg = copy(child = c.head)
}

object CountMinAgg {
  /** Row-i bucket for base hash h: xor a per-row odd constant, avalanche
    * with the 64-bit Fibonacci multiplier, take the top bits mod width.
    * Deterministic wrap-around long arithmetic — identical on any JVM. */
  def bucket(h: Long, i: Int, width: Int): Int = {
    val mixed = (h ^ (0x9E3779B97F4A7C15L * (2L * i + 1L))) *
      0xFF51AFD7ED558CCDL
    (((mixed >>> 17) % width + width) % width).toInt
  }
}
