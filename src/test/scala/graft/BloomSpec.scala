package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bloom, BloomMightContain}
import graft.operators.RuntimeFilter

/** Bloom runtime-filter contract: never a false negative, false
  * positives near theory, OR-mergeable across partitions, and the
  * prefilter is result-invisible in bloomSemiJoin. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val numBits = 1 << 16
  private val k = BloomMightContain.DefaultNumHashes

  private def mightContain(bloom: org.apache.spark.sql.Column,
      h: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSql.column(BloomMightContain(
      org.apache.spark.sql.GraftSql.expression(bloom),
      org.apache.spark.sql.GraftSql.expression(h), k))

  test("no false negatives; fp rate within 3x of theory") {
    val keys = (1 to 2000).map(i => s"key$i")
    val build = keys.toDF("key")
    val bloom = RuntimeFilter.bloomOf(build, "key", numBits, k)
    // every inserted key must probe true
    val inserted = build.crossJoin(broadcast(bloom))
      .withColumn("hit", mightContain(col("bloom"),
        graft.functions.Hashing.md5Long(col("key"))))
    assert(inserted.filter(!col("hit")).count() === 0)
    // non-keys: fp rate ≈ (1 - e^{-kn/m})^k
    val probes = (1 to 20000).map(i => s"absent$i").toDF("key")
      .crossJoin(broadcast(bloom))
      .withColumn("hit", mightContain(col("bloom"),
        graft.functions.Hashing.md5Long(col("key"))))
    val fp = probes.filter(col("hit")).count().toDouble / 20000
    val theory = math.pow(
      1 - math.exp(-k.toDouble * 2000 / numBits), k)
    assert(fp <= 3 * theory + 0.001, s"fp=$fp theory=$theory")
  }

  test("merge is partition-count invariant (bitwise OR)") {
    val keys = (1 to 1000).map(i => s"k$i")
    val b1 = RuntimeFilter.bloomOf(
      keys.toDF("key").repartition(1), "key", numBits, k)
      .collect().head.getAs[Array[Byte]](0)
    val b32 = RuntimeFilter.bloomOf(
      keys.toDF("key").repartition(32), "key", numBits, k)
      .collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(b1, b32))
  }

  test("bloomSemiJoin == plain semi join, and the prefilter actually " +
    "sheds probe rows before the exact join") {
    val probe = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    val build = spark.read
      .parquet("/root/testdata/sf0.001/supplier.parquet")
      .filter(col("s_nationkey") === 3)
    val viaBloom = RuntimeFilter
      .bloomSemiJoin(probe, build, "l_suppkey", "s_suppkey")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val exact = probe.join(
        build.select(col("s_suppkey").as("l_suppkey")).distinct(),
        Seq("l_suppkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaBloom === exact)
    assert(exact.nonEmpty)
    // selectivity: the bloom-passed subset is far smaller than the
    // probe (here build keys are a small fraction of supplier keys);
    // literal-embedded filter, the operator's own fast path
    val bloomBytes = RuntimeFilter.bloomOf(build, "s_suppkey", 1 << 20, k)
      .collect().head.getAs[Array[Byte]](0)
    val pred = org.apache.spark.sql.GraftSql.column(BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(bloomBytes,
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.GraftSql.expression(
        graft.functions.Hashing.md5Long(col("l_suppkey").cast("string"))),
      k))
    val passed = probe.filter(pred).count()
    assert(passed < probe.count() / 2, s"passed=$passed")
    assert(passed >= exact.size)
  }

  test("bitPositions is deterministic and in-range") {
    val bits = Bloom.bitPositions(123456789012345L, 1 << 16, 5)
    assert(bits === Bloom.bitPositions(123456789012345L, 1 << 16, 5))
    assert(bits.forall(b => b >= 0 && b < (1 << 16)))
    intercept[IllegalArgumentException](Bloom.requirePow2(1000))
  }
}
