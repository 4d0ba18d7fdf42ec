package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-mitigation operators.
  *
  * Aggregations are already skew-safe in Spark (hash aggregates do
  * map-side partial aggregation; AQE splits skewed join partitions).
  * The one shape NEITHER rescues is a WINDOW over a hot key: window
  * functions require every row of a partition key in a single task, so
  * one key holding 1% of a 100 TB input turns into a 1 TB task that
  * spills or OOMs. These operators restore balance by salting.
  */
object Skew {

  /** Two-phase top-k per group for skewed keys.
    *
    * Phase 1 splits each key into `salt` subgroups (deterministic
    * hash-derived salt over `saltBy`), taking a LOCAL top-k per
    * (key, salt) window partition; phase 2 takes the global top-k over
    * the ≤ salt×k survivors of each key. Any global top-k row is a
    * top-k row of its subgroup, so the result is IDENTICAL to the
    * direct window — asserted in SkewSpec — while the biggest window
    * task shrinks by ~`salt`× and phase 2's input is k×salt rows per
    * key regardless of skew.
    *
    * The result ADDS an `rn` output column (the within-key rank); the
    * input must not already have one — silently clobbering caller data
    * is worse than failing. Internal working columns are generated
    * collision-free against the input schema.
    *
    * @param orderBy must be a TOTAL order (include a tiebreak column)
    *                for a deterministic result, same as any top-k
    * @param saltBy  columns whose hash spreads a key's rows across
    *                subgroups (any row-distinguishing columns work) */
  def saltedTopK(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
      k: Int, salt: Int, saltBy: Seq[String]): DataFrame = {
    require(!df.columns.contains("rn"),
      "saltedTopK adds an `rn` output column but the input already has " +
        "one — rename it first")
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !df.columns.contains(n)).get
    val saltCol = fresh("_salt")
    val rnCol = fresh("_rn")
    val salted = df.withColumn(saltCol,
      pmod(xxhash64(saltBy.map(col): _*), lit(salt.toLong)))
    val w1 = Window.partitionBy((keys.map(col) :+ col(saltCol)): _*)
      .orderBy(orderBy: _*)
    val local = salted.withColumn(rnCol, row_number().over(w1))
      .filter(col(rnCol) <= k).drop(rnCol, saltCol)
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    local.withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
  }
}
