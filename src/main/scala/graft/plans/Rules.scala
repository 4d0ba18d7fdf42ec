package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Custom optimizer rules (SparkSessionExtensions surface).
  *
  * NanosWatermarkPushdown: fixtures store TIMESTAMP(NANOS), which Spark
  * reads as a raw long that graft.sources.Tables normalizes with
  * `timestamp_micros(col div 1000)`. A watermark predicate on the
  * normalized column — `timestamp_micros(ts div 1000) > T` — is opaque
  * to parquet filter pushdown, so every incremental read rescans the
  * full table (the same pathology the reference's SAP path had with its
  * UDF-derived ref column, config.py:37). The rule rewrites such
  * comparisons into raw-long bounds that FileSourceStrategy can push
  * into the parquet footer:
  *
  *   micros(a div 1000) >  T  ⟺  a > 1000·T + 999
  *   micros(a div 1000) >= T  ⟺  a > 1000·T − 1
  *   micros(a div 1000) <  T  ⟺  a < 1000·T
  *   micros(a div 1000) <= T  ⟺  a < 1000·(T+1)
  *
  * The equivalences use truncating `div` on NON-NEGATIVE nanos; they
  * also hold for negative `a` when T ≥ 1 µs (both sides are then
  * unconditionally false/true in matching ways), so the rewrite guards
  * on T ≥ 1 — every real watermark is far past epoch.
  */
object NanosWatermarkPushdown extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(a div 1000) and yields `a`. */
  private object MicrosOfNanos {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide)
          if d.right == Literal(1000L, LongType) => Some(d.left)
      case _ => None
    }
  }

  /** Timestamp literal in microseconds, guarded to the safe range. */
  private object TsMicros {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType)
          if v >= 1L && v < Long.MaxValue / 1000 - 1 => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(MicrosOfNanos(a), TsMicros(t)) =>
        GreaterThan(a, Literal(1000L * t + 999L, LongType))
      case GreaterThanOrEqual(MicrosOfNanos(a), TsMicros(t)) =>
        GreaterThan(a, Literal(1000L * t - 1L, LongType))
      case LessThan(MicrosOfNanos(a), TsMicros(t)) =>
        LessThan(a, Literal(1000L * t, LongType))
      case LessThanOrEqual(MicrosOfNanos(a), TsMicros(t)) =>
        LessThan(a, Literal(1000L * (t + 1L), LongType))
      // mirrored literal-first orientations
      case LessThan(TsMicros(t), MicrosOfNanos(a)) =>
        GreaterThan(a, Literal(1000L * t + 999L, LongType))
      case LessThanOrEqual(TsMicros(t), MicrosOfNanos(a)) =>
        GreaterThan(a, Literal(1000L * t - 1L, LongType))
      case GreaterThan(TsMicros(t), MicrosOfNanos(a)) =>
        LessThan(a, Literal(1000L * t, LongType))
      case GreaterThanOrEqual(TsMicros(t), MicrosOfNanos(a)) =>
        LessThan(a, Literal(1000L * (t + 1L), LongType))
    }
}

/** `spark.sql.extensions`-style registration for deploy time:
  * `.config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")`.
  * (The fixture path also self-registers via
  * `spark.experimental.extraOptimizations` in graft.sources.Tables, so
  * harness sessions need no config.) */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => NanosWatermarkPushdown)
    graft.functions.GraftFunctions.all.foreach(extensions.injectFunction)
  }
}
