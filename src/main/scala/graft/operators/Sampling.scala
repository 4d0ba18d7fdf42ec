package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling under a per-group budget.
  *
  * The LLM-pipeline shape: "take ~N tokens per language (or source, or
  * domain), reproducibly" — i.e. order each group by a deterministic
  * hash and keep documents until the running token total reaches the
  * budget. Hash order makes the sample stable across runs, engines and
  * backfills (the same property q63's hash split relies on).
  */
object Sampling {

  /** Keep each group's hash-ordered prefix whose cumulative `weightCol`
    * stays under `budget`. A doc is kept iff the cumulative weight of
    * all docs BEFORE it (hash order) is < budget, so the sample
    * overshoots by at most one document — the standard greedy-prefix
    * contract, total and deterministic. Adds `cum_` + weightCol = the
    * inclusive running total.
    *
    * Scale: the naive formulation is ONE window partitioned by group —
    * with a handful of groups (5 languages) over 100 TB, that is one
    * task per language holding the whole language. This implementation
    * is the two-phase prefix sum instead: `hashCol`'s 60-bit range is
    * cut into `buckets` ORDER-PRESERVING slices, local running sums run
    * per (group, bucket) — bounded tasks, ~corpus/buckets each — and
    * only the buckets×groups bucket TOTALS ride a tiny second window
    * before a broadcast join stitches exact global prefixes. Identical
    * output to the naive window (differential-tested in SamplingSpec),
    * but no task ever holds a whole group. */
  def budgetPrefix(df: DataFrame, groupCol: String, weightCol: String,
      hashCol: String, budget: Long, buckets: Int = 256): DataFrame = {
    require((1L << 60) % buckets == 0,
      s"buckets must divide 2^60 for exact order-preserving slices, got $buckets")
    val sliceWidth = (1L << 60) / buckets
    val bucket = (col(hashCol) / lit(sliceWidth)).cast("long")

    val bucketed = df.withColumn("_bucket", bucket)
    // phase 1: local running sums inside each (group, bucket) slice
    val wLocal = Window.partitionBy(col(groupCol), col("_bucket"))
      .orderBy(col(hashCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("_local_cum",
      sum(col(weightCol)).over(wLocal))
    // phase 2: per-group prefix over the bucket TOTALS (buckets×groups
    // rows — tiny), then broadcast back
    val wBucket = Window.partitionBy(col(groupCol)).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed
      .groupBy(col(groupCol), col("_bucket"))
      .agg(sum(col(weightCol)).as("_bucket_total"))
      .withColumn("_offset",
        coalesce(sum(col("_bucket_total")).over(wBucket), lit(0L)))
      .select(col(groupCol), col("_bucket"), col("_offset"))
    local.join(broadcast(offsets), Seq(groupCol, "_bucket"))
      .withColumn(s"cum_$weightCol", col("_offset") + col("_local_cum"))
      .filter(col(s"cum_$weightCol") - col(weightCol) < budget)
      .drop("_bucket", "_local_cum", "_offset")
  }

  /** Naive single-window formulation — the executable specification
    * budgetPrefix is asserted identical to (and what the DuckDB oracle
    * recomputes). One task per group: correct, but not the 100 TB
    * shape. */
  private[graft] def budgetPrefixSpec(df: DataFrame, groupCol: String,
      weightCol: String, hashCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(hashCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(s"cum_$weightCol", sum(col(weightCol)).over(w))
      .filter(col(s"cum_$weightCol") - col(weightCol) < budget)
  }

  /** Column helper: the deterministic per-doc hash used by the q68
    * sampler (portable md5-based 60-bit hash of the id rendered as a
    * string — any engine recomputes it). */
  def idHash(idCol: Column): Column =
    graft.functions.Hashing.md5Long(idCol.cast("string"))

  /** Weighted sampling without randomness: sequential Poisson /
    * priority sampling (Ohlsson; Duffield et al.) — each item gets
    * priority h/w (deterministic uniform hash over its weight) and the
    * k SMALLEST priorities per group are the sample, so heavier items
    * are proportionally likelier to be drawn yet the draw is exactly
    * reproducible across runs, engines and backfills. The ranking
    * division is one double op computed identically everywhere; ties
    * break on the id. One window shuffle per group — or compose with
    * the q68 bucketing for the bounded-task variant. Adds a `rank`
    * column; weight 0 → +Infinity priority → sampled last. */
  def prioritySample(df: DataFrame, groupCol: String, weightCol: String,
      idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy((idHash(col(idCol)).cast("double") /
        col(weightCol).cast("double")).asc, col(idCol).asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
