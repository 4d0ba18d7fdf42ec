package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): for each named
  * registry query, dump `.explain("formatted")` to a file AND attribute
  * the query's wall time to Spark jobs/stages via a listener — job
  * count, per-stage task time, shuffle bytes/records — so a slow query
  * can be blamed on planning, job round-trips, or a specific exchange
  * instead of guessed at.
  *
  * Usage: ProbePlan <sfDir> <outDir> [q82,q305,...] [reps]
  * Writes <outDir>/<query>.txt (plan + job/stage profile). Never
  * touches the bench artifacts.
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/plans")
    val only = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val reps = args.lift(3).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    // job/stage profile of everything run since the last reset
    case class StageRec(id: Int, name: String, tasks: Int, taskTimeMs: Long,
      shufWriteB: Long, shufWriteRec: Long, shufReadB: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStarts.put(j.jobId, j.time): Unit
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStarts.remove(j.jobId)).getOrElse(j.time)
        jobs.add((j.jobId, j.time - t0)): Unit
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(StageRec(si.stageId, si.name.takeWhile(_ != '\n').take(90),
          si.numTasks, m.executorRunTime,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleWriteMetrics.recordsWritten,
          m.shuffleReadMetrics.totalBytesRead)): Unit
      }
    })

    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(sel => sel.exists(n.startsWith)) }
    // warm-up: file indexes + first-query session costs, as in Bench
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(n => graft.sources.Tables(spark, sfDir, n).limit(1).count())
    } catch { case _: Throwable => () }

    selected.foreach { case (name, fn) =>
      val sb = new StringBuilder
      // plan first (untimed)
      val df = fn(spark, sfDir)
      sb.append(s"== $name (sf=$sfDir) ==\n\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n\n== runtime profile ==\n")
      var best = Double.MaxValue
      var bestProfile = ""
      for (r <- 1 to reps) {
        stages.clear(); jobs.clear(); jobStarts.clear()
        spark.sparkContext.setJobDescription(s"$name rep$r")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // drain listener events before reading the queues (the bus is
        // private; a short sleep suffices for a profile report)
        Thread.sleep(150)
        if (sec < best) {
          best = sec
          val pb = new StringBuilder
          import scala.jdk.CollectionConverters._
          val js = jobs.asScala.toSeq.sortBy(_._1)
          pb.append(f"rep $r: wall ${sec}%.3f s, jobs ${js.size}, " +
            f"job-ms-sum ${js.map(_._2).sum}\n")
          val ss = stages.asScala.toSeq.sortBy(-_.taskTimeMs)
          pb.append("top stages by executor task-time:\n")
          ss.take(15).foreach { s =>
            pb.append(f"  stage ${s.id}%4d tasks ${s.tasks}%3d " +
              f"taskTime ${s.taskTimeMs}%6d ms " +
              f"shW ${s.shufWriteB / 1024}%7d KB/${s.shufWriteRec}%8d rec " +
              f"shR ${s.shufReadB / 1024}%7d KB  ${s.name}\n")
          }
          pb.append(f"stages total: ${ss.size}, " +
            f"taskTime sum ${ss.map(_.taskTimeMs).sum} ms, " +
            f"shuffle write ${ss.map(_.shufWriteB).sum / 1024} KB / " +
            f"${ss.map(_.shufWriteRec).sum} records\n")
          bestProfile = pb.toString
        }
      }
      sb.append(bestProfile)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"), sb.toString)
      println(f"$name%-40s best ${best}%.3f s  -> $outDir/$name.txt")
    }
    spark.stop()
  }
}
