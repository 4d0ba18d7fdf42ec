package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query subset]
    val sfDir = args(0)
    val outDir = args(1)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // manifest + oracle SQL land BEFORE the query loop: the selection
    // is known upfront, and if the JVM dies mid-run the comparator can
    // still see which queries never produced output (a trailing-write
    // manifest would vanish with the crash and the sweep would fall
    // back to presence-based — the round-6 failure mode).
    val selected = SparkEntry.queries.keys
      .filter(n => only.isEmpty || only(n)).toSeq
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      selected.map(q).mkString("[", ",", "]"))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // A query that errors writes no parquet, so a presence-based compare
    // would silently shrink the ledger (round-6 lesson: 8 NTZ failures
    // read as fully green). Persist every failure as an artifact — and
    // re-write it after EVERY failure, so a later crash can't lose the
    // earlier errors — and shout the count so a regressed round can
    // never look clean.
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def writeErrors(): Unit = Files.writeString(
      Paths.get(s"$outDir/errors.json"),
      failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    writeErrors()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        writeErrors()
      }
    }
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size}/${SparkEntry.queries.size} queries FAILED: " +
          failed.keys.mkString(", "))
    spark.stop()
  }
}
