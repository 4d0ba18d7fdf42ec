package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.ComplianceLog

/** LEDGER read paths under OBJECT-STORE RTT (r15 verdict item 3): the
  * ledger-scale probe's 10k/25k curves are local-syscall numbers; this
  * probe re-prices the same measurements with the [[LatencyLocalFs]]
  * shim charging every `listStatus` AND every `getFileStatus` (the S3
  * LIST/HEAD pair) a configurable RTT — and, because a wall under a
  * synthetic sleep is only as meaningful as the call pattern behind
  * it, it FIRST measures the metadata-call COUNTS per phase at zero
  * delay (an invariant of the code path), split driver/executor: a
  * serial driver-side RTT is the scale hazard, executor-side RTTs
  * amortize across task threads.
  *
  * Claims under test: the append's exists-check is ONE stat; the fold
  * pays ONE directory listing plus per-file opens that parallelize —
  * against the r15-fixed explicit-path index whose counterfactual is
  * nFiles serial driver stats; and whatever per-file metadata the
  * PARQUET READ path itself pays (footer opens stat; that cost class
  * is invisible on local disk) is measured, not guessed. Deletes and
  * creates are NOT RTT-modeled (object stores batch deletes), so the
  * record prices the read/metadata side only.
  *
  * Usage: runMain graft.ProbeLedgerRtt [nFiles] [statDelayMs]
  */
/** Shared ledger fixture for the scale probes: N one-row evidence
  * files synthesized by ONE partitioned write + renames — appending N
  * files through `ComplianceLog.append` would serialize N Spark jobs;
  * the resulting layout is exactly what N appends leave (one-row
  * parquet files named `takedown-lin-<id>.parquet`; batch_id is
  * duplicated out of the partition column so the data files keep
  * it). */
private[graft] object LedgerProbeFixture {
  def build(spark: SparkSession, ledger: String, nFiles: Int): Unit = {
    val lroot = new Path(ledger)
    val hfs = lroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(lroot, true)
    val scratch = new Path(s"${ledger}_scratch")
    hfs.delete(scratch, true)
    spark.range(nFiles.toLong)
      .select(lit("takedown").as("target"),
        lit("/t").as("table_path"), lit("lin").as("lineage"),
        col("id").as("batch_id"),
        (col("id") % 50 + 1).as("rows_deleted"),
        lit(1L).as("dirs_rewritten"),
        lit(0L).as("committed_at_ms"), col("id").as("bid"))
      .repartition(32, col("bid"))
      .write.mode("overwrite").partitionBy("bid")
      .parquet(scratch.toString)
    hfs.mkdirs(lroot)
    for (st <- hfs.listStatus(scratch)
        if st.getPath.getName.startsWith("bid=")) {
      val bid = st.getPath.getName.stripPrefix("bid=")
      val part = hfs.listStatus(st.getPath).map(_.getPath)
        .find(_.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(
          s"no part file under ${st.getPath}"))
      require(hfs.rename(part,
        new Path(lroot, s"takedown-lin-$bid.parquet")))
    }
    hfs.delete(scratch, true): Unit
  }
}

object ProbeLedgerRtt {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(10000)
    val delayMs = args.lift(1).map(_.toLong).getOrElse(10L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.hadoopConfiguration.set("fs.slowfs.impl",
      classOf[LatencyLocalFs].getName)

    val local = s"/tmp/graft_probe_ledger_rtt_$nFiles"
    val lroot = new Path(local)
    val hfs = lroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def buildFixture(): Unit =
      LedgerProbeFixture.build(spark, local, nFiles)

    val slow = s"slowfs:$local"
    val grid = spark.range(nFiles.toLong)
      .select(lit("takedown").as("target"), col("id").as("batch_id"))
      .localCheckpoint(true)

    /** Run one phase, returning (seconds, statCounts, listCounts). */
    def phase(body: => Unit): (Double, String, String) = {
      LatencyLocalFs.stats.reset(); LatencyLocalFs.lists.reset()
      val t0 = System.nanoTime()
      body
      ((System.nanoTime() - t0) / 1e9,
        LatencyLocalFs.stats.toString, LatencyLocalFs.lists.toString)
    }

    def run(tag: String, delay: Long): Unit = {
      buildFixture()
      System.setProperty("graft.slowfs.statDelayMs", delay.toString)
      System.setProperty("graft.slowfs.listDelayMs", delay.toString)
      try {
        val (sApp, stApp, liApp) = phase {
          require(ComplianceLog.append(spark, slow, "takedown", "/t",
            "lin", nFiles + 1L, 3L, 1L))
        }
        val (sRead, stRead, liRead) = phase {
          require(ComplianceLog.read(spark, slow).count() ==
            nFiles + 1L, "read lost rows")
        }
        val (sAudit, stAudit, liAudit) = phase {
          require(ComplianceLog.audit(spark, slow, grid)
            .where(col("recorded") === 0L).count() == 0L,
            "audit surfaced phantom gaps")
        }
        val (sFold, stFold, liFold) = phase {
          val (ff, fr) = ComplianceLog.compactBefore(spark, slow,
            nFiles - 64L)
          require(ff == nFiles - 64L && fr == nFiles - 64L,
            s"fold folded ($ff, $fr)")
        }
        val (sPost, stPost, liPost) = phase {
          require(ComplianceLog.read(spark, slow).count() ==
            nFiles + 1L, "post-fold read lost rows")
        }
        println(s"""{"probe":"ledger_rtt_$tag","files":$nFiles,""" +
          s""""delay_ms":$delay,""" +
          f""""append":{"sec":$sApp%.2f,"stats":$stApp,"lists":$liApp},""" +
          f""""read":{"sec":$sRead%.2f,"stats":$stRead,"lists":$liRead},""" +
          f""""audit":{"sec":$sAudit%.2f,"stats":$stAudit,"lists":$liAudit},""" +
          f""""fold":{"sec":$sFold%.2f,"stats":$stFold,"lists":$liFold},""" +
          f""""read_postfold":{"sec":$sPost%.2f,"stats":$stPost,"lists":$liPost},""" +
          """"note":"deletes/creates not RTT-modeled"}""")
      } finally {
        System.clearProperty("graft.slowfs.statDelayMs"): Unit
        System.clearProperty("graft.slowfs.listDelayMs"): Unit
      }
    }

    run("counts", 0L)   // call-pattern invariant, no sleep
    run("wall", delayMs) // the priced wall at the configured RTT
    hfs.delete(lroot, true)
    spark.stop()
  }
}
