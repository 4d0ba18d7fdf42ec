package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Standing optimization-round diagnosis harness (promoted r17 after
  * earning its keep across two rounds): Bench's exact loop (one timed
  * noop run per query, registry order) plus per-query attribution — GC
  * time delta, job count, executor task-time sum; add
  * -DgraftBenchDiagStages=true for a per-stage table and
  * -DgraftBenchDiagJobs=true for job-site counts — to attribute a
  * query's wall to driver actions vs executor stages vs GC before
  * touching it. Not part of the bench contract: never writes the bench
  * artifacts. Caveat from the r17 winnowing work: executor task-time
  * is task WALL, not CPU — a fresh query's first task wave blocks on
  * the codegen compile KeyLock, so 32-wide stages of a cold query
  * accrue large task-time with healthy wall; compare task-time only
  * between variants of the same stage width.
  */
object BenchDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("GRAFT_CACHE_COMPRESS", "true"))
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("GRAFT_BYPASS", "200"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.props.get("graftBenchOnly")
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_ONLY"))
      .map(_.split(",").map(_.trim).toSet)
    val clearState = sys.props.get("graftBenchDiagClear").exists(_ == "true")
    val taskTime = new java.util.concurrent.atomic.AtomicLong
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    case class StageRec(id: Int, tasks: Int, ms: Long, shWkb: Long,
      shWrec: Long, shRkb: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]
    val jobSites = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(): Unit
        jobSites.add(j.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name.takeWhile(_ != '\n').take(70)).getOrElse("?")): Unit
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        taskTime.addAndGet(m.executorRunTime): Unit
        stages.add(StageRec(si.stageId, si.numTasks, m.executorRunTime,
          m.shuffleWriteMetrics.bytesWritten / 1024,
          m.shuffleWriteMetrics.recordsWritten,
          m.shuffleReadMetrics.totalBytesRead / 1024)): Unit
      }
    })
    val showStages = sys.props.get("graftBenchDiagStages").exists(_ == "true")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(n => graft.sources.Tables(spark, sfDir, n).limit(1).count())
      SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).limit(1).count())
    } catch { case _: Throwable => () }
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(sel => sel.exists(n.startsWith)) }
    val showJobs = sys.props.get("graftBenchDiagJobs").exists(_ == "true")
    selected.foreach { case (name, fn) =>
      val gc0 = gcMs; taskTime.set(0); jobCount.set(0); stages.clear()
      jobSites.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(80) // listener drain
      println(f"$name%-32s wall $sec%7.2f  build $tBuild%6.2f  " +
        f"gc ${(gcMs - gc0) / 1000.0}%6.2f  jobs ${jobCount.get}%3d  " +
        f"taskTime ${taskTime.get / 1000.0}%8.1f s")
      if (showJobs) {
        import scala.jdk.CollectionConverters._
        jobSites.asScala.toSeq.groupBy(identity).toSeq
          .sortBy(-_._2.size).take(15).foreach { case (site, js) =>
            println(f"  job x${js.size}%3d  $site")
          }
      }
      if (showStages) {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(-_.ms).take(12).foreach { s =>
          println(f"  stage ${s.id}%4d tasks ${s.tasks}%3d " +
            f"ms ${s.ms}%7d  shW ${s.shWkb}%8d KB/${s.shWrec}%9d rec " +
            f"shR ${s.shRkb}%8d KB")
        }
      }
      if (clearState) {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
