package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Shared bit derivation for the Bloom pair: k probe positions from one
  * portable 60-bit hash via Kirsch–Mitzenmacher double hashing,
  * bit_i = (h1 + i·h2) mod m with h1 = low 30 bits, h2 = high 30 bits
  * forced odd. One md5 per value (computed OUTSIDE the aggregate, in
  * the codegen'd projection — same lesson as KmvDistinctAgg), k cheap
  * derived probes. m must be a power of two. */
object Bloom {
  def bitPositions(h: Long, numBits: Int, numHashes: Int): Array[Int] = {
    val mask = numBits - 1
    val h1 = (h & 0x3FFFFFFFL).toInt
    val h2 = (((h >>> 30) & 0x3FFFFFFFL) | 1L).toInt
    val out = new Array[Int](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) = (h1 + i * h2) & mask // mask ≡ mod m for power-of-two m
      i += 1
    }
    out
  }
  def requirePow2(numBits: Int): Unit =
    require(numBits > 0 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two, got $numBits")
}

/** Bloom filter build as a mergeable aggregate — the runtime-filter
  * shape for 100 TB semi joins: the build side's keys aggregate into an
  * m-bit filter (partial per partition, merged by bitwise OR — the same
  * partial-aggregation contract as any sketch), which then BROADCASTS
  * (m/8 bytes, e.g. 128 KB for m = 2^20) to prefilter the probe side
  * BEFORE its shuffle. Child must be the pre-hashed long
  * ([[Hashing.md5Long]] in the projection below). Emits the bitset as
  * BinaryType. */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  Bloom.requirePow2(numBits)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a pre-hashed long argument, got ${child.dataType}")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bits = Bloom.bitPositions(v.asInstanceOf[Long], numBits, numHashes)
      var i = 0
      while (i < bits.length) {
        buf(bits(i) >>> 6) |= 1L << (bits(i) & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomFilterAgg = copy(child = c.head)
}

/** Probe-side membership test: true if every probe bit of the
  * pre-hashed long is set in the serialized filter. False positives at
  * the designed rate, NO false negatives — so `might_contain AND exact
  * join` is exactly the exact join, just cheaper. The filter bytes are
  * the left operand (a broadcast one-row column in practice); caches
  * the deserialized words per filter instance. */
case class BloomMightContain(left: Expression, right: Expression,
    numHashes: Int = BloomMightContain.DefaultNumHashes)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires (binary, long), got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // one filter instance is probed by billions of rows: cache the
  // unpacked words keyed by array identity (the broadcast value is the
  // same object per task)
  @transient private lazy val cache =
    new mutable.HashMap[Integer, Array[Long]]()

  /** Deserialize-once word cache; public because the generated code
    * calls it through a reference to this expression instance. */
  def wordsFor(bytes: Array[Byte]): Array[Long] =
    cache.getOrElseUpdate(System.identityHashCode(bytes), {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val out = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong; i += 1 }
      out
    })

  protected override def nullSafeEval(bloomBytes: Any, hashed: Any): Any = {
    // allocation-free probe loop: this runs once per PROBE ROW (tens of
    // millions of wedges in q78 alone) — the previous
    // Bloom.bitPositions call allocated a k-slot array per row
    val w = wordsFor(bloomBytes.asInstanceOf[Array[Byte]])
    val mask = w.length * 64 - 1 // m rides the filter itself; k is ours
    val h = hashed.asInstanceOf[Long]
    val h1 = (h & 0x3FFFFFFFL).toInt
    val h2 = (((h >>> 30) & 0x3FFFFFFFL) | 1L).toInt
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i * h2) & mask
      if ((w(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Real whole-stage codegen (r16, guide §1.2 step 2 / §4): the
    * CodegenFallback this replaces forced a per-row interpreted eval —
    * boxing both operands and allocating a bit-position array — inside
    * the hottest filter in the registry (the q78 wedge shed evaluates
    * it ~41M times). The generated code inlines the
    * Kirsch–Mitzenmacher double-hash probe loop with zero allocations;
    * the deserialized word array is fetched through the expression's
    * identity-keyed cache (one deserialization per filter instance per
    * task, exactly as the interpreted path). */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val self = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    val w = ctx.freshName("bloomWords")
    val mask = ctx.freshName("mask")
    val h1 = ctx.freshName("h1")
    val h2 = ctx.freshName("h2")
    val i = ctx.freshName("i")
    val pos = ctx.freshName("pos")
    val resultCode =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull} || ${rightGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          long[] $w = $self.wordsFor(${leftGen.value});
          int $mask = $w.length * 64 - 1;
          int $h1 = (int) (${rightGen.value} & 0x3FFFFFFFL);
          int $h2 = (int) (((${rightGen.value} >>> 30) & 0x3FFFFFFFL) | 1L);
          ${ev.value} = true;
          for (int $i = 0; $i < $numHashes; $i++) {
            int $pos = ($h1 + $i * $h2) & $mask;
            if (($w[$pos >>> 6] & (1L << ($pos & 63))) == 0L) {
              ${ev.value} = false;
              break;
            }
          }
        }"""
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  /** k shared by build and probe; 5 hashes at 10 bits/key ≈ 1% fp. */
  val DefaultNumHashes: Int = 5
}
