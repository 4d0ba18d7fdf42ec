package graft

import java.nio.file.{Files, Path}

/** Robustness sweep: every registry query must tolerate an EMPTY
  * dataset — either by returning an empty (or zero-valued aggregate)
  * result or by failing fast with a clear IllegalArgumentException for
  * operators that genuinely need data (e.g. sampled quantizer seeds).
  * What is NOT acceptable is an incidental crash
  * (NoSuchElementException from head() on nothing, / by zero on a
  * 0-row count) — the classic difference between a library and a
  * script. The driver's gate never exercises this; real consumers do
  * on day one (first run against a not-yet-loaded table).
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty")
    dir.toFile.deleteOnExit()
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t0 =>
      graft.sources.Tables(spark, "/root/testdata/sf0.001", t0)
        .limit(0)
        .write.mode("overwrite")
        .parquet(dir.resolve(s"$t0.parquet").toString)
    }
    dir.toString
  }

  test("every registry query handles an empty dataset: empty/zero " +
    "result or a deliberate IllegalArgumentException — never an " +
    "incidental crash") {
    val outcomes = Queries.all.toSeq.map { case (name, fn) =>
      val outcome =
        try {
          fn(spark, emptyDir).collect()
          "ok"
        } catch {
          case _: IllegalArgumentException => "ok-fail-fast"
          case e: Throwable =>
            s"CRASH ${e.getClass.getSimpleName}: ${
              Option(e.getMessage).getOrElse("").linesIterator
                .take(1).mkString}"
        }
      (name, outcome)
    }
    val crashes = outcomes.filterNot(_._2.startsWith("ok"))
    assert(crashes.isEmpty,
      s"incidental empty-input crashes:\n${crashes.map(c =>
        s"  ${c._1}: ${c._2}").mkString("\n")}")
  }
}
