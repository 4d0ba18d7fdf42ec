package graft

import java.nio.file.Files

/** Bucketing = the co-located-join lever at scale: two tables bucketed
  * into the same bucket count on the join key join WITHOUT any
  * Exchange — the shuffle that dominates large fact-fact joins
  * disappears at write time. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans with zero Exchange") {
    val d1 = Files.createTempDirectory("bkt1"); d1.toFile.deleteOnExit()
    val d2 = Files.createTempDirectory("bkt2"); d2.toFile.deleteOnExit()
    val events = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "events")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      events.select($"user_id", $"event_id", $"value")
        .write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", d1.resolve("t").toString)
        .saveAsTable("graft_bkt_events")
      events.groupBy($"user_id").count()
        .write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", d2.resolve("t").toString)
        .saveAsTable("graft_bkt_counts")

      val joined = spark.table("graft_bkt_events")
        .join(spark.table("graft_bkt_counts"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle
      assert(plan.contains("SelectedBucketsCount"), plan)
      assert(joined.count() === events.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_events")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_counts")
    }
  }
}
