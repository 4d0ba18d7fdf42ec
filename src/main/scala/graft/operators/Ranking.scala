package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed order statistics — exact global/per-group ranks WITHOUT
  * a single-partition window. `Window.orderBy` with no (or a
  * low-cardinality) partitionBy funnels every row through one task; at
  * 100 TB that is the plan that does not finish. The scale-true shape
  * is the one Spark's own sort uses internally: range-partition on the
  * sort key (sampled bounds), sort within partitions, then assign
  * contiguous indices per partition with a per-partition offset
  * (`RDD.zipWithIndex` — one extra count job to size the offsets,
  * amortized over the full pass).
  *
  * The assigned index depends only on the TOTAL ORDER (the caller must
  * pass a tie-free key set), never on partition boundaries — so the
  * result is deterministic and parallelism-invariant even though the
  * range sampler's split points are not.
  *
  * Per-group ranks ride the same single sort: sort by (group, key...),
  * take the global index, and subtract each group's first index
  * (a groupBy-min — #groups rows — broadcast back). One total sort +
  * one broadcast join for every group's contiguous 1-based ranking;
  * compare one shuffle + one single-partition-per-group window.
  */
object Ranking {

  /** Appends `idxCol`: the 0-based position of each row in the total
    * order of `orderCols` (which must be tie-free). One range-partition
    * sort + the zipWithIndex count job. */
  def globalIndex(df: DataFrame, orderCols: Seq[String],
      idxCol: String = "gidx"): DataFrame = {
    val sorted = df.orderBy(orderCols.map(col): _*)
    val out = StructType(sorted.schema.fields :+
      StructField(idxCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Appends `rankCol` (contiguous, 1-based, per `groupCol`, ordered by
    * `orderCols` which must be tie-free within a group) and `sizeCol`
    * (the group's row count) via one (group, keys...) total sort plus a
    * broadcast of the per-group offsets. */
  def groupRanks(df: DataFrame, groupCol: String, orderCols: Seq[String],
      rankCol: String = "r", sizeCol: String = "ng"): DataFrame = {
    val g = globalIndex(df, groupCol +: orderCols, "_gr_idx")
    val offsets = g.groupBy(col(groupCol))
      .agg(min(col("_gr_idx")).as("_gr_off"),
        count(lit(1)).as(sizeCol))
    g.join(broadcast(offsets), Seq(groupCol))
      .withColumn(rankCol, col("_gr_idx") - col("_gr_off") + lit(1L))
      .drop("_gr_idx", "_gr_off")
  }
}
