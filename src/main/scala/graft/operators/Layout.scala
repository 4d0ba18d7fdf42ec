package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderValue

/** Data-layout operators: how rows are ARRANGED into files decides how
  * much a 100 TB scan can skip. Parquet keeps per-file (and per-row-
  * group) min/max for every column; a write clustered on the Z-curve
  * gives every file a narrow range in BOTH clustering dimensions, so
  * selective predicates on EITHER column prune most files — one
  * physical order serving two access paths (a plain sort serves one).
  */
object Layout {

  def zorder(a: Column, b: Column, bitsPerDim: Int = 16): Column =
    org.apache.spark.sql.GraftSql.column(ZOrderValue(
      org.apache.spark.sql.GraftSql.expression(a.cast("long")),
      org.apache.spark.sql.GraftSql.expression(b.cast("long")),
      bitsPerDim))

  /** Range-partition by Z-value and sort within partitions, then write
    * — each output file covers a contiguous Z-range, i.e. a small tile
    * in (a, b) space. `numFiles` bounds output file count (the same
    * file-size control as X2's repartition-before-partitionBy). */
  def zorderWrite(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int, bitsPerDim: Int = 16): Unit = {
    val z = zorder(col(colA), col(colB), bitsPerDim)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
