package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-sample-statistics scale probe (the ProbeGraph sibling for
  * q235/q236/q241): wall time AND actual shuffle-write record counts
  * of ksTwoSample and mannWhitneyU on replicated price/class frames —
  * checking the distinct-value aggregate plus the range-bucketed
  * prefix-sum pass stay shuffle-linear in the number of distinct
  * values (the only data-sized state the CDF family carries).
  *
  * Replication is deterministic and DISJOINT: replica r shifts every
  * cent value into its own 2^40-wide block (v + r·2^40), so the
  * pooled row count AND the distinct-value count both scale exactly
  * ×reps while each block's internal CDF structure is identical —
  * a super-linear wall or shuffle curve can only be the operator's
  * own aggregate/window shapes, never a change in data structure.
  *
  * Usage: runMain graft.ProbeStats [sfDir] [replicasCsv]
  */
object ProbeStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repsList = args.lift(1).getOrElse("1,5,25")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleRecs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleRecs.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })

    val base = graft.sources.Tables(spark, sfDir, "lineitem")
      .select((col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * lit(100))
        .cast("long").as("v"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .localCheckpoint(true)

    def frameOf(reps: Int): DataFrame = base
      .select(col("v"), col("y"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .select((col("v") + col("r").cast("long") * lit(1L << 40)).as("v"),
        col("y"))
      .localCheckpoint(true)

    def timed(f: => Long): (Double, Long, Long) = {
      Thread.sleep(300)
      val r0 = shuffleRecs.get()
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (sec, n, shuffleRecs.get() - r0)
    }

    for (reps <- repsList) {
      val df = frameOf(reps)
      val nRows = df.count()

      val (tKs, _, sKs) = timed {
        graft.operators.Stats.ksTwoSample(df, col("v"), col("y"))
          .collect().length.toLong
      }
      val (tMw, _, sMw) = timed {
        graft.operators.Stats.mannWhitneyU(df, col("v"), col("y"))
          .collect().length.toLong
      }

      println(f"""{"probe":"stats","reps":$reps,"n_rows":$nRows,""" +
        f""""ks_sec":$tKs%.2f,"ks_shuffle_rows":$sKs,""" +
        f""""mw_sec":$tMw%.2f,"mw_shuffle_rows":$sMw}""")
    }
    spark.stop()
  }
}
