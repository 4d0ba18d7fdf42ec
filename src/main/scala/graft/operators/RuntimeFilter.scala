package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BloomFilterAgg, BloomMightContain, Hashing}

/** Runtime filters: ship a compact summary of a join's build side to
  * the probe side so rows that cannot match are dropped BEFORE the
  * probe's shuffle — at 100 TB the probe shuffle is the dominant cost
  * of a selective semi join, and a 128 KB bloom broadcast routinely
  * eliminates 90%+ of it. (Spark's own runtime row-level filtering has
  * the same shape; this one is engine-portable — md5-based hashes, a
  * serializable bitset — and composes with any of our operators.)
  */
object RuntimeFilter {

  private def hashed(c: Column): Column = Hashing.md5Long(c.cast("string"))

  /** The build side's keys aggregated into one m-bit bloom (a 1-row,
    * 1-column DataFrame holding the serialized bitset). */
  def bloomOf(build: DataFrame, keyCol: String,
      numBits: Int = 1 << 20,
      numHashes: Int = BloomMightContain.DefaultNumHashes): DataFrame = {
    import org.apache.spark.sql.GraftSql
    val agg = GraftSql.column(
      BloomFilterAgg(GraftSql.expression(col("_bloom_h")), numBits,
        numHashes).toAggregateExpression())
    build.select(hashed(col(keyCol)).as("_bloom_h"))
      .agg(agg.as("bloom"))
  }

  /** The bitset of a bloom built over an arbitrary PRE-HASHED long
    * column — the lower-level entry for callers whose key is already a
    * well-mixed long (e.g. xxhash64 over a multi-column key, far
    * cheaper than md5 on a 40M-row probe side). Bounded driver
    * round-trip: numBits/8 bytes. */
  def bloomBytesOf(build: DataFrame, hash: Column,
      numBits: Int = 1 << 20,
      numHashes: Int = BloomMightContain.DefaultNumHashes): Array[Byte] = {
    import org.apache.spark.sql.GraftSql
    val agg = GraftSql.column(
      BloomFilterAgg(GraftSql.expression(hash), numBits,
        numHashes).toAggregateExpression())
    build.select(agg.as("bloom")).collect().head.getAs[Array[Byte]](0)
  }

  /** Membership predicate against a driver-materialized bitset, with
    * the caller's own hash column; the bitset is a LITERAL (see
    * bloomSemiJoin's plan note). */
  def mightContain(bloomBytes: Array[Byte], hash: Column,
      numHashes: Int = BloomMightContain.DefaultNumHashes): Column = {
    import org.apache.spark.sql.GraftSql
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    GraftSql.column(BloomMightContain(Literal(bloomBytes, BinaryType),
      GraftSql.expression(hash), numHashes))
  }

  /** Semi join with a bloom prefilter: exactly `probe LEFT SEMI JOIN
    * build` (the bloom admits false positives, never false negatives,
    * and the exact join removes the former), but the probe side is
    * filtered down BEFORE its shuffle.
    *
    * The filter is materialized to the driver (m/8 bytes — 128 KB at
    * the default m) and embedded as a LITERAL in the probe predicate —
    * the same bounded driver round-trip Spark's own runtime filters
    * (InSubquery / DPP) make. Carrying it as a per-row COLUMN through a
    * cross join instead costs a 128 KB `getBinary` copy PER PROBE ROW —
    * measured 25s where the literal form takes ~1s. */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      numBits: Int = 1 << 20,
      numHashes: Int = BloomMightContain.DefaultNumHashes): DataFrame = {
    import org.apache.spark.sql.GraftSql
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val bloomBytes = bloomOf(build, buildKey, numBits, numHashes)
      .collect().head.getAs[Array[Byte]](0)
    val mightContain = GraftSql.column(BloomMightContain(
      Literal(bloomBytes, BinaryType),
      GraftSql.expression(hashed(col(probeKey))), numHashes))
    probe.filter(mightContain)
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
  }
}
