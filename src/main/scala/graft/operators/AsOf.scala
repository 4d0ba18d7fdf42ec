package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * expressed Spark-first by composition rather than a custom SparkPlan:
  * tag both sides, union, and take a running `last(..., ignoreNulls)`
  * of the right side over one (keys, time) sort. For each left row this
  * yields the LATEST right row with the same keys and
  * rightTs <= leftTs.
  *
  * Scale shape: ONE shuffle+sort on (keys, ts) — the same cost as a
  * window aggregation — versus the naive range-condition join, which
  * Spark plans as a broadcast-nested-loop/cartesian and which explodes
  * quadratically on hot keys. Equal timestamps resolve as `<=` (the
  * right row sorts before the left row at the same instant); ties among
  * right rows resolve to the highest tiebreak value. */
object AsOf {

  /** @param rightCols right-side columns to attach (prefixed output
    *                   columns keep their names)
    * @param rightTieBreak deterministic order among right rows sharing
    *                      (keys, ts); the LAST one wins */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      rightTieBreak: String): DataFrame = {
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(rightTieBreak).dataType))
    val lWithNulls = rightCols.foldLeft(l)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r0 = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(rightTieBreak))
    val rAligned = lWithNulls.columns.foldLeft(r0)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(lWithNulls.schema(c).dataType)))
      .select(lWithNulls.columns.map(col): _*)
    val unioned = lWithNulls.unionByName(rAligned)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct of all rightCols per right row, so every asof_ column
    // comes from the SAME (latest) right row — per-column last(...,
    // ignoreNulls) would silently mix fields from different right rows
    // whenever the latest row has a NULL in one attached column
    val withStruct = unioned.withColumn("_rs",
      last(when(col("_side") === 0, struct(rightCols.map(col): _*)),
        ignoreNulls = true).over(w))
    val withAsOf = rightCols.foldLeft(withStruct)((d, c) =>
      d.withColumn(s"asof_$c", col("_rs").getField(c)))
    withAsOf.filter(col("_side") === 1)
      .drop((rightCols :+ "_ts" :+ "_side" :+ "_tie" :+ "_rs"): _*)
  }
}
