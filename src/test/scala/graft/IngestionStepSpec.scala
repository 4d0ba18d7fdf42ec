package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.SaveMode

import graft.config.{Settings, SystemConn, TableSettings}
import graft.operators.Ingestion
import graft.sources.ParquetSource

/** End-to-end contract of the incremental-ingestion core (reference
  * ingestion/ingestion.py:16-103): two consecutive runs with an injected
  * second batch — increment isolation, watermark advance, isEmpty
  * short-circuit, unpadded partition directory names. */
class IngestionStepSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private val settings = Settings(Map(
    "lims" -> SystemConn(dbms = "oracle", tableSettings = Map(
      "t1" -> TableSettings(
        refColumn = "ref",
        refFirstValue = "2024-01-01T00:00:00.000000Z")))))

  private def writeBatch(dir: Path, rows: Seq[(Long, Timestamp)]): Unit =
    rows.toDF("id", "ref").write.mode(SaveMode.Overwrite)
      .parquet(dir.toString)

  test("two-run incremental ingestion: isolation, advance, short-circuit") {
    val in = tmp("graft-in")
    val table = tmp("graft-table")
    val out = tmp("graft-out").resolve("data").toString

    // run 1: two rows past the initial watermark
    writeBatch(in, Seq(
      1L -> Timestamp.valueOf("2024-01-10 08:00:00"),
      2L -> Timestamp.valueOf("2024-01-12 09:30:00")))
    val r1 = Ingestion.ingestionStep(spark, "lims", "t1",
      ParquetSource(in.toString), table, out, settings,
      partitionColumns = Seq("YEAR", "MONTH"), counting = true)
    assert(r1.wrote && r1.rowCount.contains(2L))
    assert(r1.newSync.refLastValue === "2024-01-12T09:30:00.000000Z")
    assert(Files.exists(table.resolve("sync.json")))

    // partition layout: Hive-style with UNPADDED month (SURVEY §4.3)
    assert(Files.exists(java.nio.file.Paths.get(out, "YEAR=2024", "MONTH=1")))

    // run 2: one old row (== watermark -> dropped), one new row
    writeBatch(in, Seq(
      2L -> Timestamp.valueOf("2024-01-12 09:30:00"), // equal -> excluded
      3L -> Timestamp.valueOf("2024-01-20 10:00:00")))
    val r2 = Ingestion.ingestionStep(spark, "lims", "t1",
      ParquetSource(in.toString), table, out, settings,
      partitionColumns = Seq("YEAR", "MONTH"), counting = true)
    assert(r2.wrote && r2.rowCount.contains(1L))
    assert(r2.newSync.refLastValue === "2024-01-20T10:00:00.000000Z")

    // appended dataset = rows 1,2,3 exactly once each
    val all = spark.read.parquet(out).select("id")
      .as[Long].collect().sorted.toSeq
    assert(all === Seq(1L, 2L, 3L))

    // run 3: nothing new -> isEmpty short-circuit, sync unchanged
    val r3 = Ingestion.ingestionStep(spark, "lims", "t1",
      ParquetSource(in.toString), table, out, settings,
      partitionColumns = Seq("YEAR", "MONTH"))
    assert(!r3.wrote && r3.rowCount.isEmpty)
    assert(r3.newSync.refLastValue === "2024-01-20T10:00:00.000000Z")
  }

  test("sap system: ref column derived from split date/time strings") {
    val in = tmp("graft-sap-in")
    val table = tmp("graft-sap-table")
    val out = tmp("graft-sap-out").resolve("data").toString
    Seq((1L, "20240110", "080000"), (2L, "20231231", "235959"))
      .toDF("id", "budat", "cputm")
      .write.mode(SaveMode.Overwrite).parquet(in.toString)
    val sapSettings = Settings(Map(
      "sap-pru" -> SystemConn(dbms = "oracle", tableSettings = Map(
        "t1" -> TableSettings(
          refColumn = "ref_ts",
          refFirstValue = "2024-01-01T00:00:00.000000Z",
          dateColumn = Some("budat"), timeColumn = Some("cputm"))))))
    val r = Ingestion.ingestionStep(spark, "sap-pru", "t1",
      ParquetSource(in.toString), table, out, sapSettings,
      partitionColumns = Seq("YEAR", "MONTH"), counting = true)
    // only the 2024 row passes the watermark; 2023 row filtered
    assert(r.wrote && r.rowCount.contains(1L))
    assert(r.newSync.refLastValue === "2024-01-10T08:00:00.000000Z")
  }
}
