package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-budget regression guard (round-7 lesson, VERDICT item 6): the
  * driver's per-round bench killed round 7 at rc=124 because the
  * registry outgrew the external timeout and nothing local noticed.
  * This spec fails the build when:
  *  - BENCH_LAST.json (the committed full-registry bench record) does
  *    not cover every registry query — i.e. queries were added without
  *    re-running the full sf0.1 bench, so their cost is UNKNOWN; or
  *  - the recorded single-pass suite cost exceeds the budget that,
  *    together with sbt startup (~120 s) and the time-boxed rerun
  *    window (420 s, Bench.scala), still fits the >1109 s driver
  *    window round 6 proved exists.
  * Registry growth now has to pay its bench bill in the same commit.
  */
class BenchBudgetSpec extends AnyFunSuite {

  // Derived from the driver-window constants in Bench (single source,
  // r8 verdict stretch item) rather than a hardcoded copy that the next
  // 20 queries could silently outgrow.
  private val budgetSec = Bench.SinglePassBudgetSec

  private lazy val benchLast: String = {
    val p = java.nio.file.Paths.get("/root/repo/BENCH_LAST.json")
    assert(java.nio.file.Files.exists(p),
      "BENCH_LAST.json missing — run the full-registry Bench at sf0.1")
    java.nio.file.Files.readString(p)
  }

  private def field(name: String): String = {
    val m = s""""$name":\\s*([0-9.eE+-]+)""".r
      .findFirstMatchIn(benchLast)
    assert(m.nonEmpty, s"BENCH_LAST.json has no numeric field '$name'")
    m.get.group(1)
  }

  test("BENCH_LAST covers the whole registry (no unbenched queries)") {
    val nOk = field("n_ok").toInt
    val registry = Queries.all.size
    assert(nOk == registry,
      s"BENCH_LAST.json records $nOk queries but the registry has " +
        s"$registry — re-run the full sf0.1 bench after registry changes")
    val benched = """"(q\d+_[a-z0-9_]+)":""".r
      .findAllMatchIn(benchLast).map(_.group(1)).toSet
    val missing = Queries.all.keySet -- benched
    assert(missing.isEmpty, s"queries missing from BENCH_LAST: $missing")
  }

  test("single-pass suite cost fits the driver bench window") {
    val total = field("value").toDouble
    assert(total <= budgetSec,
      f"recorded suite cost $total%.1f s exceeds the $budgetSec%.0f s " +
        "single-pass budget — the driver bench will time out; speed up " +
        "the slowest queries or raise the budget with evidence")
  }

  test("committed bench has zero errored queries") {
    assert(benchLast.contains(""""errors":[]"""),
      "BENCH_LAST.json records query errors — fix them before shipping")
  }

  test("committed bench is a quiet full-rerun record, not budget-starved") {
    assert(benchLast.contains(""""budget_hit":false"""),
      "BENCH_LAST.json was written by a budget-starved (partly " +
        "single-sampled) run — regenerate it on a quiet host; " +
        "budget-hit runs belong in BENCH_DRIVER.json")
    // ... and every per-query min is a true multi-sample: a runs=1
    // record would carry budget_hit:false while still being the
    // single-sample artifact the no-clobber design exists to keep out
    val rcBlock = """"run_counts":\{([^}]*)\}""".r
      .findFirstMatchIn(benchLast)
    assert(rcBlock.nonEmpty, "BENCH_LAST.json has no run_counts map")
    val counts = """:(\d+)""".r.findAllMatchIn(rcBlock.get.group(1))
      .map(_.group(1).toInt).toSeq
    assert(counts.nonEmpty && counts.min >= 2,
      s"BENCH_LAST.json has single-sampled queries (min run count " +
        s"${counts.minOption.getOrElse(0)}) — regenerate quiet")
  }

  test("committed bench is self-describing about host contention and " +
    "was started on a quiet host") {
    // r9's driver record (501.7 s vs 238.0 s quiet, same code) took an
    // afternoon to attribute to a noisy neighbor; these fields make a
    // contended record self-evident. load_start is sampled before any
    // of our own work — a quiet record must start on a mostly-idle
    // host. load_end is our own 32-thread run's load (context only).
    val loadStart = field("load_start").toDouble
    val cores = field("cores").toInt
    field("load_end") // presence
    assert(loadStart >= 0, "load average unavailable on this platform?")
    assert(loadStart < cores / 4.0,
      f"BENCH_LAST.json was started at system load $loadStart%.2f on " +
        s"$cores cores — that is a contended window; regenerate the " +
        "quiet record when the host is idle (budget-starved/contended " +
        "runs belong in BENCH_DRIVER.json)")
  }

  /** The driver parses the LAST line of the sbt run's stdout tail with
    * json.loads. Eight rounds of BENCH_r0N had parsed:null; r08's root
    * cause was sbt's logger prefixing the forked JVM's stdout with
    * "[info] " (run/fork:=true routes through the logger by default) and
    * appending a "[success] Total time" trailer after the JSON line.
    * Running sbt-in-sbt here would deadlock on the project build lock,
    * so this guards the two build.sbt settings that make the raw JSON
    * the literal last stdout line; the end-to-end check (last line of
    * `sbt "runMain graft.Bench"` json-parses) was run manually and its
    * output recorded in SURVEY §8.
    */
  test("build.sbt keeps the forked run's stdout raw and trailer-free") {
    val sbt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/repo/build.sbt"))
    assert(sbt.contains("run / outputStrategy := Some(OutputStrategy.StdoutOutput)"),
      "build.sbt lost run/outputStrategy := StdoutOutput — sbt will " +
        "prefix the bench JSON line with '[info] ' and the driver's " +
        "json.loads will reject it (BENCH_r08 failure mode)")
    assert(sbt.contains("Global / showSuccess := false"),
      "build.sbt lost showSuccess := false — sbt will append a " +
        "'[success] Total time' trailer after the bench JSON line, so " +
        "it is no longer the last line of stdout")
  }
}
