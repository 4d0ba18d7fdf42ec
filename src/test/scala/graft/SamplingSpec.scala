package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** The two-phase bounded-task budget sampler must be IDENTICAL to the
  * naive one-window-per-group specification. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i =>
      (i.toLong, s"g${rnd.nextInt(4)}", 1L + rnd.nextInt(50)))
      .toDF("id", "grp", "w")
      .withColumn("h", Sampling.idHash(col("id")))
      // file-backed so plans are realistic (LocalRelation folds away)
      .repartition(8)
  }

  test("budgetPrefix == naive window spec on seeded random data") {
    for (seed <- Seq(1, 7, 42); budget <- Seq(1L, 100L, 500L, 100000L)) {
      val df = fixture(400, seed)
      val fast = Sampling.budgetPrefix(df, "grp", "w", "h", budget,
        buckets = 16)
        .select("id", "grp", "w", "cum_w").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val spec = Sampling.budgetPrefixSpec(df, "grp", "w", "h", budget)
        .select("id", "grp", "w", "cum_w").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(fast === spec, s"seed=$seed budget=$budget")
      assert(fast.nonEmpty)
    }
  }

  test("prioritySample: deterministic under partitioning, respects k, " +
    "and a dominant weight is drawn") {
    val rnd = new scala.util.Random(9)
    val base = (1L to 200L).map(i =>
      (i, s"g${i % 3}", 1L + rnd.nextInt(20))) :+ ((999L, "g0", 1000000000L))
    val draws = for (parts <- Seq(1, 32)) yield {
      val df = base.toDF("id", "grp", "w").repartition(parts)
      Sampling.prioritySample(df, "grp", "w", "id", k = 5)
        .select("id", "grp", "rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    }
    assert(draws(0) === draws(1)) // partitioning-invariant
    val byGroup = draws(0).groupBy(_._2)
    assert(byGroup.keySet === Set("g0", "g1", "g2"))
    byGroup.values.foreach(g => assert(g.size === 5))
    // the 10^9-weight item has priority ~1e9x smaller than any other:
    // it must be in g0's sample
    assert(draws(0).exists(_._1 === 999L))
  }

  test("budgetPrefix: every group keeps at least its first doc, and " +
    "cumulative totals overshoot by at most one doc") {
    val df = fixture(200, 5)
    val out = Sampling.budgetPrefix(df, "grp", "w", "h", budget = 60L)
      .select("grp", "w", "cum_w").collect()
    val groups = df.select("grp").distinct().count()
    assert(out.map(_.getString(0)).distinct.length === groups)
    // cum - w < budget for every kept row (the keep rule itself)
    out.foreach(r => assert(r.getLong(2) - r.getLong(1) < 60L))
  }
}
