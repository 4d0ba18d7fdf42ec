package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg

/** Exact top-k-by-frequency without a full-vocabulary shuffle.
  *
  * Phase 1: a Misra–Gries summary (capacity counters per partition,
  * merged map-side — no shuffle of raw items) yields a candidate set
  * guaranteed to contain every item with frequency > n/(capacity+1).
  * Phase 2: an exact recount restricted to the broadcast candidate set
  * — the shuffle carries O(capacity) distinct keys instead of the whole
  * vocabulary. Result is exactly the exact top-k whenever
  * capacity+1 > n/f_k (f_k = the k-th frequency), which holds by
  * construction for any corpus where the top k are actual heavy
  * hitters; choose capacity accordingly (k · headroom).
  */
object HeavyHitters {

  def topKByFrequency(items: DataFrame, itemCol: String, k: Int,
      capacity: Int = 256): DataFrame = {
    import org.apache.spark.sql.GraftSql
    val sketch = GraftSql.column(
      MisraGriesAgg(GraftSql.expression(col(itemCol)), capacity)
        .toAggregateExpression())
    val candidates = items.agg(sketch.as("mg"))
      .select(explode(map_keys(col("mg"))).as(itemCol))
    val w = Window.orderBy(col("freq").desc, col(itemCol).asc)
    items.join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(itemCol)
      .agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
