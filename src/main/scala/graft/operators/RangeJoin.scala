package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — |leftTs − rightTs| ≤ tolerance — expressed
  * as a bucketed equi-join: bucket = ts div tolerance, the right side
  * explodes into its bucket ±1, the join runs on (keys, bucket), and
  * the exact predicate filters the residue.
  *
  * Spark plans a raw |l−r| ≤ tol condition as a broadcast-nested-loop
  * (or cartesian) join — O(n·m) per key. Bucketing turns it into one
  * hash shuffle whose pair volume is bounded by per-bucket occupancy
  * (3× the right side's rows), which is the shape that survives 100 TB.
  * Matches are exact and unique: each right row's three buckets are
  * distinct, and a left row joins on its single bucket. */
object RangeJoin {

  /** `ltsCol`/`rtsCol` must have distinct names; `keys` are shared
    * column names (merged by the equi-join). */
  def withinInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
      ltsCol: String, rtsCol: String, toleranceUs: Long): DataFrame = {
    require(toleranceUs > 0, "tolerance must be positive")
    val lb = left.withColumn("_bucket",
      expr(s"unix_micros(`$ltsCol`) div $toleranceUs"))
    val rb = right
      .withColumn("_rb", expr(s"unix_micros(`$rtsCol`) div $toleranceUs"))
      .withColumn("_bucket",
        explode(array(col("_rb") - 1, col("_rb"), col("_rb") + 1)))
      .drop("_rb")
    lb.join(rb, keys :+ "_bucket")
      .where(abs(unix_micros(col(ltsCol)) - unix_micros(col(rtsCol)))
        <= toleranceUs)
      .drop("_bucket")
  }
}
