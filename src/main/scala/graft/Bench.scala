package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry.queries entry against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A query that throws is recorded in "errors" (NOT as a fast success —
  * a broken query must never improve the bench total) and the run exits
  * nonzero so the driver sees the failure.
  */
object Bench {
  /** Single source for the bench timing contract. BenchBudgetSpec derives
    * its single-pass bound from these instead of keeping a drifting copy
    * (r8 verdict stretch item): registry growth changes run-1 cost, and
    * the allowable run-1 cost is what's left of the driver window after
    * sbt startup, the rerun budget, and straggler slack.
    */
  val DefaultRerunBudgetSec = 420
  /** Observed sbt + JVM + SparkSession spin-up before run 1 starts. */
  val SbtStartupSec = 120
  /** Round 6's driver bench ran 1109 s to completion — the window the
    * driver demonstrably allows. */
  val DriverWindowSec = 1109
  /** A heavy query admitted just under the rerun budget runs past it by
    * its own cost (budget gates starts, not completions). */
  val StragglerSlackSec = 100
  /** Max recorded single-pass suite cost that still fits the window. */
  def SinglePassBudgetSec: Double =
    (DriverWindowSec - SbtStartupSec - DefaultRerunBudgetSec - StragglerSlackSec).toDouble

  def main(args: Array[String]): Unit = {
    // Self-describing environment (r9 verdict item 3): r9's driver
    // record measured 501.7 s where same-code quiet runs measured
    // 238.0 s, and attributing that to a noisy neighbor took an
    // afternoon of forensics. Stamp the 1-minute system load BEFORE
    // any of our own work starts (pre-existing contention) and at the
    // end (dominated by our own 32-thread run — context, not a
    // cleanliness signal), so a contended record says so itself.
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    val cores = Runtime.getRuntime.availableProcessors
    // (steal, total) jiffies from /proc/stat's aggregate cpu line —
    // the r10c regen measured a UNIFORM ~15% suite inflation at
    // load_start 0.0: hypervisor-level contention is invisible to the
    // load average but shows up as steal time. -1 = not a Linux VM.
    def cpuJiffies(): (Long, Long) = try {
      val f = scala.io.Source.fromFile("/proc/stat")
      try {
        val parts = f.getLines().next().trim.split("\\s+").drop(1)
          .map(_.toLong)
        // first 8 fields only (user..steal): the kernel already folds
        // guest/guest_nice into user/nice, so summing all 10 would
        // double-count guest time and understate steal_pct
        (parts.lift(7).getOrElse(-1L), parts.take(8).sum)
      } finally f.close()
    } catch { case _: Throwable => (-1L, -1L) }
    val (stealStart, totalStart) = cpuJiffies()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: round 7's driver artifact was a 2000-char tail of
    // `WindowExec: No Partition Defined` WARN lines — the JSON line never
    // had a chance. Anything WARN-worthy in a bench run is either known
    // (bounded-domain windows, see PlanSpec) or shows up as an error.
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warm-up: session/codegen/file-index initialization is
    // JVM startup cost, not query cost — without it the first timed
    // query absorbs ~5s of one-time work. Warm EVERY table's file
    // index (Tables caches per (session, dir, name)), not just q01's,
    // so listing cost isn't billed to whichever query scans a table
    // first.
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(n => graft.sources.Tables(spark, sfDir, n).limit(1).count())
      SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).limit(1).count())
    } catch { case _: Throwable => () }
    // -DgraftBenchRuns=N (or SPARK_GRAFT_BENCH_RUNS): run the whole
    // suite N times and report the per-query MIN — single-run numbers
    // vary ±40% under host contention and have produced phantom
    // "regressions"; the min is the stable estimator of the query's
    // actual cost. Defaults to 3 so the driver's per-round bench is a
    // multi-run min. -DgraftBenchOnly=q52,q53 restricts to a subset
    // for local iteration (never set by the driver).
    val runs = sys.props.get("graftBenchRuns")
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_RUNS")).map(_.toInt).getOrElse(3)
    // Wall-clock budget for RERUNS (seconds). Run 1 always completes —
    // every query gets at least one timing — but runs 2..N only start a
    // query while elapsed wall < budget. Round 7's driver bench hit the
    // external timeout (rc=124, ~750s of 3 full runs at 292 queries);
    // the min-of-k estimator is a luxury the artifact can't die for.
    // 420s: run 1 is ~240s at the current registry, leaving ~180s of
    // rerun coverage. The budget gates query STARTS, not completions, so
    // a straggler admitted at 419s can push total wall past 420s by its
    // own cost (r08 driver wall was 846s with a contended run 1) — still
    // under the >1109s window r06 proved the driver allows.
    val rerunBudgetSec = sys.props.get("graftBenchBudget")
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_BUDGET")).map(_.toInt)
      .getOrElse(DefaultRerunBudgetSec)
    val benchT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
    val only = sys.props.get("graftBenchOnly")
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_ONLY"))
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(sel => sel.exists(n.startsWith)) }
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val runCounts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val errored = scala.collection.mutable.Set.empty[String]
    var budgetHit = false
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        timings(name) = timings.get(name).fold(sec)(math.min(_, sec))
        runCounts(name) = runCounts.getOrElse(name, 0) + 1
      } catch { case e: Throwable =>
        errors += s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
        errored += name
        timings.remove(name)
        runCounts.remove(name)
      }
    }
    // Run 1: registry order, always complete — every query gets a timing.
    selected.foreach { case (name, fn) => timeOne(name, fn) }
    // Reruns spend the remaining budget SLOWEST-FIRST (r8 verdict item 3):
    // contention noise is proportional to a query's cost, so the heavies
    // (q78/q182/q183/... ~105s of run-1 wall) are exactly the queries a
    // single contended sample misrepresents worst — the driver's r8 run
    // had q78 at 25.0s vs a 3.5s quiet min. Re-sorting by current min
    // each pass keeps the budget pointed at whatever still looks slow.
    var pass = 2
    while (pass <= runs && !budgetHit) {
      val order = selected.toSeq.filterNot(e => errored(e._1))
        .sortBy(e => -timings.getOrElse(e._1, 0.0))
      order.foreach { case (name, fn) =>
        if (elapsedSec < rerunBudgetSec) timeOne(name, fn)
        else budgetHit = true
      }
      pass += 1
    } // once the budget is hit, remaining passes can't run anything —
      // stop instead of re-walking the sorted list per pass
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map(jstr).mkString("[", ",", "]")
    val total = timings.values.sum
    val wall = BigDecimal(elapsedSec).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    // Measurement-honesty metadata (r8 verdict item 2): "runs":3 alone
    // can't distinguish a quiet min-of-3 from a contended single-sample
    // record where the rerun budget ran out after run 1. run_counts says
    // how many samples each min actually took; budget_hit says reruns
    // were cut short.
    val rcJson = runCounts.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val loadEnd = osBean.getSystemLoadAverage
    def l2(d: Double): String =
      BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val (stealEnd, totalEnd) = cpuJiffies()
    // share of this run's cpu jiffies stolen by the hypervisor
    val stealPct =
      if (stealStart < 0 || stealEnd < 0 || totalEnd <= totalStart) -1.0
      else 100.0 * (stealEnd - stealStart) / (totalEnd - totalStart)
    val envJson = s""""load_start":${l2(loadStart)},""" +
      s""""load_end":${l2(loadEnd)},"cores":$cores,""" +
      s""""steal_pct":${l2(stealPct)}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":${jstr(sfDir)},"n_ok":${timings.size},"runs":$runs,"budget_hit":$budgetHit,"run_counts":$rcJson,"wall":$wall,$envJson,"errors":$errJson}"""
    // Full-precision, full-name line goes to the file (whole regardless
    // of log buffering) and to stdout FIRST for human log readers.
    println(line)
    // Subset runs (-DgraftBenchOnly) never touch the default artifact:
    // BENCH_LAST.json is the committed full-registry record, and a
    // 1-query iteration run silently clobbering it has happened. An
    // explicit graftBenchOut still writes wherever it points. When the
    // record is not a quiet multi-sample — the rerun budget was hit
    // (driver runs under contention routinely are), or runs was forced
    // to 1 so every number is a single sample — route it to
    // BENCH_DRIVER.json so it can't overwrite the committed quiet
    // min-of-3 (the driver's r8 run clobbered BENCH_LAST.json with
    // exactly such numbers).
    val out = sys.props.get("graftBenchOut")
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
      .orElse(if (only.nonEmpty) None
        else if (budgetHit || runs < 2) Some("/root/repo/BENCH_DRIVER.json")
        else Some("/root/repo/BENCH_LAST.json"))
    out.foreach { p =>
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p), line + "\n")
      catch { case _: Throwable => () }
    }
    // The driver's bench artifact keeps only the LAST 2000 characters of
    // stdout (BENCH_r01..r05 all have tail_len<=2000, parsed:null — the
    // 5 KB full line never fit, so every round's artifact clipped
    // mid-map). Emit a compact line LAST, sized to fit that window
    // whole: qNN keys (the spec's own example uses "q1"), 2-decimal
    // seconds, dropping to 1 decimal if the line would exceed 1900
    // chars. Full names/precision live one line up and in BENCH_LAST.
    def compact(dec: Int, minimal: Boolean = false): String = {
      val cq = timings.map { case (k, v) =>
        val sk = k.takeWhile(_ != '_')
        val sv = BigDecimal(v).setScale(dec, BigDecimal.RoundingMode.HALF_UP)
          .underlying.stripTrailingZeros.toPlainString
        s"${jstr(sk)}:$sv"
      }.mkString("{", ",", "}")
      val tv = BigDecimal(total).setScale(1, BigDecimal.RoundingMode.HALF_UP)
      val tail = if (minimal) "" else
        s""","sf":${jstr(sfDir.split('/').last)},"runs":$runs,"budget_hit":$budgetHit,$envJson,"errors":$errJson"""
      s"""{"metric":"total","value":$tv,"unit":"sec","queries":$cq,"n_ok":${timings.size}$tail}"""
    }
    // four tiers: 2-decimal, 1-decimal, 1-decimal with the minimal
    // envelope, and finally a slowest-first truncated map with an
    // explicit "omitted" count — past ~185 queries no full per-query
    // map fits 2000 chars at 0.1s resolution, so the last tier keeps
    // the line PARSEABLE (total/n_ok always cover every query; the
    // full map lives in BENCH_LAST.json and the full-name line above).
    def compactTop(budget: Int): String = {
      val entries = timings.toSeq.sortBy(-_._2).map { case (k, v) =>
        val sv = BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)
          .underlying.stripTrailingZeros.toPlainString
        s"${jstr(k.takeWhile(_ != '_'))}:$sv"
      }
      val tv = BigDecimal(total).setScale(1, BigDecimal.RoundingMode.HALF_UP)
      def line(kept: Seq[String]): String =
        s"""{"metric":"total","value":$tv,"unit":"sec","queries":${kept.mkString("{", ",", "}")},"n_ok":${timings.size},"budget_hit":$budgetHit,"omitted":${entries.size - kept.size}}"""
      val kept = scala.collection.mutable.ArrayBuffer.empty[String]
      for (e <- entries if line(kept.toSeq :+ e).length <= budget) kept += e
      line(kept.toSeq)
    }
    // Budget 1700, not ~2000: the driver's artifact keeps the LAST 2000
    // chars of the sbt run's output, and sbt appends trailer lines after
    // our print ("[error] Nonzero exit code..." + "Total time" ≈ 170
    // chars on failure — exactly what clipped round 6's 1950-char line
    // mid-map). 300 chars of headroom keeps the line whole either way.
    val short = Seq(compact(2), compact(1), compact(1, minimal = true))
      .find(_.length <= 1700).getOrElse(compactTop(1700))
    println(short)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
