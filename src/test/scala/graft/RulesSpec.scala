package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.NanosWatermarkPushdown

/** NanosWatermarkPushdown: the rewrite must be exactly boundary-
  * equivalent to the original predicate (strict-> watermark semantics
  * survive) and must land in the parquet PushedFilters. */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  private def installed(): Unit =
    if (!spark.experimental.extraOptimizations.contains(NanosWatermarkPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NanosWatermarkPushdown

  // T = 2024-01-15 00:00:00 UTC; nanos values straddling T
  private val tMicros = 1705276800000000L
  private def df = {
    installed()
    Seq(
      tMicros * 1000 - 1,    // just below T
      tMicros * 1000,        // exactly T (strict > must drop)
      tMicros * 1000 + 999,  // same µs as T after div (still == T)
      tMicros * 1000 + 1000  // first nanos in the next µs
    ).toDF("a").withColumn("ts", timestamp_micros(expr("a div 1000")))
  }

  private val t = lit(Timestamp.valueOf("2024-01-15 00:00:00"))

  test("> keeps only rows strictly past the watermark (boundary µs drops)") {
    assert(df.filter($"ts" > t).count() === 1)
    assert(df.filter($"ts" >= t).count() === 3)
    assert(df.filter($"ts" < t).count() === 1)
    assert(df.filter($"ts" <= t).count() === 3)
    // mirrored literal-first orientations
    assert(df.filter(t < $"ts").count() === 1)
    assert(df.filter(t >= $"ts").count() === 3)
  }

  test("rewritten predicate reaches the parquet PushedFilters") {
    installed()
    val dir = java.nio.file.Files.createTempDirectory("rules-parquet")
    dir.toFile.deleteOnExit()
    Seq(tMicros * 1000, tMicros * 1000 + 1000).toDF("a")
      .write.mode("overwrite").parquet(dir.toString)
    val scan = spark.read.parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("a div 1000")))
      .filter($"ts" > t)
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThan(a,1705276800000000999)"),
      s"expected pushed raw-long bound in:\n$physical")
    assert(scan.count() === 1)
  }

  test("rule is a no-op on non-matching shapes") {
    installed()
    // div by something other than 1000 must NOT be rewritten
    val other = Seq(5L).toDF("a")
      .withColumn("ts", timestamp_micros(expr("a div 500")))
      .filter($"ts" > t)
    assert(other.count() === 0) // evaluates, unrewritten, without error
  }
}
