package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Engine-portable cardinality sketching.
  *
  * `approx_count_distinct` (HLL++, q40) is the right built-in at 100 TB
  * but its sketch is Spark-internal — no other engine reproduces the
  * estimate, so differential testing stops at row counts. KMV
  * (k-minimum-values) built on the md5 hash family is the portable
  * alternative: the k smallest hashes of a set determine the estimate
  * (k−1)·2^60/h_k, any engine computes the identical value, and sketches
  * merge by taking the k smallest of a union (the same mergeability HLL
  * offers). Exact below k distinct values, ~k^-1/2 relative error above.
  */
object Sketches {

  /** Count-min sketch of a string column: depth×width long counters,
    * merged map-side (one aggregate, no shuffle of raw values), then a
    * BOUNDED driver collect — the same bounded-materialization shape as
    * the bloom bitset and IVF quantizer. The md5 hash runs in the
    * codegen'd projection below the aggregate (the q53 lesson). */
  def countMinSketch(items: DataFrame, valueCol: String, depth: Int,
      width: Int): Array[Long] = {
    import org.apache.spark.sql.GraftSql
    val hashCol = "_cm_h"
    val agg = GraftSql.column(
      graft.functions.CountMinAgg(
        GraftSql.expression(col(hashCol)), depth, width)
        .toAggregateExpression())
    items
      .select(Hashing.md5Long(col(valueCol).cast("string")).as(hashCol))
      .agg(agg.as("cm"))
      .head().getSeq[Long](0).toArray
  }

  /** Point-frequency estimate: min over rows of the addressed counter —
    * ≥ the true count always; ≤ true + e·N/width w.h.p. */
  def countMinEstimate(sketch: Array[Long], depth: Int, width: Int,
      value: String): Long = {
    val h = graft.functions.Md5Long60.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(value))
    (0 until depth).map(i =>
      sketch(i * width + graft.functions.CountMinAgg.bucket(h, i, width))).min
  }

  /** Grouped KMV distinct-count estimate — the scale path: a custom
    * TypedImperativeAggregate whose per-group state is the bounded
    * k-element sorted set (O(k) memory regardless of group size,
    * partial-merge by keeping the k smallest of a union — the same
    * mergeable-sketch shape as approx_count_distinct).
    *
    * The md5 hash runs in a SELECT below the groupBy — that projection
    * fuses into whole-stage codegen with the scan, so the
    * ObjectHashAggregate's interpreted per-row `child.eval` only reads
    * a long column (hashing inside the aggregate child was measured 4×
    * slower end-to-end: every row paid an interpreted cast+md5). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.GraftSql
    val hashCol = "_kmv_h"
    val agg = GraftSql.column(
      graft.functions.KmvDistinctAgg(
        GraftSql.expression(col(hashCol)), k)
        .toAggregateExpression())
    df.select(groupCols.map(col) :+
        Hashing.md5Long(col(valueCol).cast("string")).as(hashCol): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(agg.as("approx_distinct"))
  }

  /** Built-ins-only formulation (collects the full distinct hash set
    * per group) — the executable specification kmvDistinct is asserted
    * identical to in ScalaTest, and what the DuckDB oracle recomputes. */
  private[graft] def kmvDistinctSpec(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int): DataFrame = {
    val mins = slice(
      array_sort(collect_set(Hashing.md5Long(col(valueCol).cast("string")))),
      1, k)
    val estimate: Column => Column = m =>
      when(size(m) < k, size(m).cast("long"))
        .otherwise(floor(
          lit((k - 1).toDouble * math.pow(2.0, 60)) / element_at(m, k))
          .cast("long"))
    df.groupBy(groupCols.map(col): _*)
      .agg(mins.as("kmins"))
      .withColumn("approx_distinct", estimate(col("kmins")))
      .drop("kmins")
  }

  /** Grouped KMV SKETCHES (the sorted k-min hash arrays themselves,
    * column `kmins`) — bounded O(k) state per group like kmvDistinct,
    * but mergeable downstream: union two sketches by taking the k
    * smallest of their concatenation, estimate the intersection via
    * ρ·est(∪) (Beyer et al.'s KMV set-operation estimators). */
  def kmvMins(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.GraftSql
    val hashCol = "_kmv_h"
    val agg = GraftSql.column(
      graft.functions.KmvMinsAgg(
        GraftSql.expression(col(hashCol)), k)
        .toAggregateExpression())
    df.select(groupCols.map(col) :+
        Hashing.md5Long(col(valueCol).cast("string")).as(hashCol): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(agg.as("kmins"))
  }

  /** The KMV estimate from a k-min array column: exact size below k,
    * else (k−1)·2^60/h_k — shared by kmvDistinct's contract and the
    * q111 set-operation composition. */
  def kmvEstimate(m: Column, k: Int): Column =
    when(size(m) < k, size(m).cast("long"))
      .otherwise(floor(
        lit((k - 1).toDouble * math.pow(2.0, 60)) / element_at(m, k))
        .cast("long"))
}
