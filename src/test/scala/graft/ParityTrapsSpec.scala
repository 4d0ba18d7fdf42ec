package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.config.Formats
import graft.operators.Prep

/** SURVEY.md §4.3 semantic-parity traps, each pinned by a test. */
class ParityTrapsSpec extends SparkSpec {
  import spark.implicits._

  test("trap 1: partition strings are unpadded (month '4', not '04')") {
    val df = Seq(Timestamp.valueOf("2019-04-03 07:05:09")).toDF("ts")
      .select(
        Prep.yearString($"ts").as("y"),
        Prep.monthString($"ts").as("m"),
        Prep.isoWeekString($"ts").as("w"))
    assert(df.first() === Row("2019", "4", "14"))
  }

  test("trap 1b: ISO week year-boundary edges match isocalendar()") {
    // Python: date(1995,1,1).isocalendar()[1] == 52;
    //         date(2021,1,1) -> 53; date(2019,12,30) -> 1
    val df = Seq("1995-01-01", "2021-01-01", "2019-12-30")
      .toDF("d")
      .select(Prep.isoWeekString(to_date($"d")).as("w"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("52", "53", "1"))
  }

  test("trap 2: watermark boundary is strict > (equal timestamp drops)") {
    val wm = java.time.LocalDateTime.parse("2024-01-15T00:00:00")
    val df = Seq(
      Timestamp.valueOf("2024-01-14 23:59:59"),
      Timestamp.valueOf("2024-01-15 00:00:00"), // equal -> dropped forever
      Timestamp.valueOf("2024-01-15 00:00:01")
    ).toDF("ref")
    val out = Prep.watermarkFilter(df, "ref", wm).collect()
    assert(out.map(_.getTimestamp(0).toString).toSeq ===
      Seq("2024-01-15 00:00:01.0"))
  }

  test("trap 3: sha2 matches hexdigest (lowercase) and nulls propagate") {
    val df = Seq(Some("user@example.com"), None).toDF("e")
      .select(Prep.sha256Pii($"e").as("h"))
    val Array(h1, h2) = df.collect().map(r => Option(r.getString(0)))
    // hashlib.sha256('user@example.com'.encode()).hexdigest()
    assert(h1.contains(
      "b4c9a289323b21a01c3e940f150eb9b8c542587f1abfd8f0e1cc1ffc5e475514"))
    assert(h2.isEmpty)
  }

  test("trap 4: stringify of booleans is SQL 'true' (documented divergence)") {
    val df = Seq(true, false).toDF("b").select(Prep.stringify($"b").as("s"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("true", "false"))
  }

  test("trap 5: sync format round-trips with microseconds + literal Z") {
    val s = "2024-01-30T23:57:12.194062Z"
    val parsed = Formats.parseSyncTs(s)
    assert(parsed.getNano === 194062000)
    assert(Formats.formatSyncTs(parsed) === s)
  }

  test("F1: SAP timestamp reconstruction == positional slicing semantics") {
    val df = Seq(("20190403", "070509")).toDF("budat", "cputm")
      .select(Prep.sapTimestamp($"budat", $"cputm").as("ts"))
    assert(df.first().getTimestamp(0) ===
      Timestamp.valueOf("2019-04-03 07:05:09"))
  }

  test("trap 7: c1 prep fails when ref column is not in columns_to_import") {
    val settings = graft.config.TableSettings(
      refColumn = "SYSMODTIME", refFirstValue = "2024-01-01T00:00:00.000000Z",
      columnsToImport = Some(Seq("other")))
    val df = Seq(("x", Timestamp.valueOf("2024-01-16 00:00:00")))
      .toDF("other", "SYSMODTIME")
    val wm = java.time.LocalDateTime.parse("2024-01-15T00:00:00")
    intercept[Exception] {
      Prep.c1(settings, wm)(df).collect()
    }
  }
}
