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
