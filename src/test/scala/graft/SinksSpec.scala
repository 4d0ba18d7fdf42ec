package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import graft.sinks.{Ddl, PartitionedSink}

/** Partitioned multi-format sink (reference write_partitioned parity:
  * csv header/no-quote/gzip, Hive layout, append increments) and the
  * catalog DDL helpers (CTAS / MSCK / DROP / CVAS). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): Path = {
    val d = Files.createTempDirectory(p); d.toFile.deleteOnExit(); d
  }

  private def sample = Seq(
    (1L, "a,with comma", "2024", "1"),
    (2L, "plain", "2024", "2"),
    (3L, "also plain", "2023", "12")
  ).toDF("id", "payload", "YEAR", "MONTH")

  test("parquet write: Hive layout with unpadded partition values") {
    val out = tmp("sink-parquet").resolve("t").toString
    PartitionedSink.write(sample, out, Seq("YEAR", "MONTH"))
    assert(Files.exists(java.nio.file.Paths.get(out, "YEAR=2024", "MONTH=1")))
    assert(Files.exists(java.nio.file.Paths.get(out, "YEAR=2023", "MONTH=12")))
    val back = spark.read.parquet(out)
    assert(back.count() === 3)
    // exactly one file per partition value (filesPerPartition default)
    val files = Files.walk(java.nio.file.Paths.get(out, "YEAR=2024", "MONTH=1"))
      .iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
    assert(files.size === 1)
  }

  test("sortedWrite: every output file is internally ordered by the " +
    "sort key (secondary sort), per hive partition") {
    val out = tmp("sink-sorted").resolve("t").toString
    val rnd = new scala.util.Random(3)
    val rows = (1 to 4000).map { i =>
      (s"cat${rnd.nextInt(3)}", rnd.nextInt(500).toLong, i.toLong)
    }.toDF("cat", "k", "v").repartition(8) // deliberately scrambled
    PartitionedSink.sortedWrite(rows, out, Seq("cat"), Seq("k", "v"))
    val files = Files.walk(java.nio.file.Paths.get(out))
      .iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toList
    assert(files.nonEmpty)
    files.foreach { f =>
      val vals = spark.read.parquet(f.toString)
        .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(vals.sameElements(vals.sorted),
        s"file $f not sorted by (k, v)")
    }
    // and the round-trip is lossless
    assert(spark.read.parquet(out).count() === 4000)
  }

  test("csv write: header, gzip, quoting disabled like the reference") {
    val out = tmp("sink-csv").resolve("t").toString
    PartitionedSink.write(sample, out, Seq("YEAR"), fileFormat = "csv")
    val partFiles = Files.walk(java.nio.file.Paths.get(out))
      .iterator().asScala.filter(_.toString.endsWith(".csv.gz")).toList
    assert(partFiles.nonEmpty) // gzip extension proves compression opt
    val lines = scala.io.Source.fromInputStream(
      new java.util.zip.GZIPInputStream(
        Files.newInputStream(partFiles.find(_.toString.contains("YEAR=2024")).get)))
      .getLines().toList
    assert(lines.head === "id,payload,MONTH") // header, partition col elided
    // quote='' semantics (PySpark empty quote = NUL): no '"' quoting;
    // the comma-bearing value is delimited with NUL bytes, matching the
    // reference's writer byte-for-byte
    assert(lines.exists(_.startsWith("1,\u0000a,with comma\u0000")))
    assert(!lines.exists(_.contains("\"")))
  }

  test("orc and json writes round-trip with the same Hive layout") {
    for (fmt <- Seq("orc", "json")) {
      val out = tmp(s"sink-$fmt").resolve("t").toString
      PartitionedSink.write(sample, out, Seq("YEAR"), fileFormat = fmt,
        compression = if (fmt == "json") "gzip" else "zlib")
      assert(Files.exists(java.nio.file.Paths.get(out, "YEAR=2024")), fmt)
      val back = spark.read.format(fmt).load(out)
      assert(back.count() === 3, fmt)
      assert(back.columns.toSet === Set("id", "payload", "YEAR", "MONTH"), fmt)
    }
  }

  test("append increments accumulate without clobbering") {
    val out = tmp("sink-append").resolve("t").toString
    PartitionedSink.appendIncrement(sample, out, Seq("YEAR"))
    PartitionedSink.appendIncrement(
      Seq((4L, "x", "2025", "3")).toDF("id", "payload", "YEAR", "MONTH"),
      out, Seq("YEAR"))
    assert(spark.read.parquet(out).count() === 4)
  }

  test("compact: many appended small files collapse to one per partition") {
    val out = tmp("sink-compact").resolve("t").toString
    (1 to 5).foreach { i =>
      PartitionedSink.appendIncrement(
        Seq((i.toLong, s"v$i", "2024", "1")).toDF("id", "payload", "YEAR", "MONTH"),
        out, Seq("YEAR"))
    }
    val before = Files.walk(java.nio.file.Paths.get(out, "YEAR=2024"))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    assert(before === 5)
    val compacted = tmp("sink-compact2").resolve("t").toString
    PartitionedSink.compact(spark, out, compacted, Seq("YEAR"))
    val after = Files.walk(java.nio.file.Paths.get(compacted, "YEAR=2024"))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    assert(after === 1)
    assert(spark.read.parquet(compacted).count() === 5)
  }

  test("DDL: CTAS + MSCK + CVAS view + DROP against the session catalog") {
    val loc = tmp("ddl-loc").resolve("t1").toString
    sample.createOrReplaceTempView("sink_src")
    val ctasSql = Ddl.ctas(spark, "default", "graft_ctas_t",
      "SELECT id, payload, YEAR, MONTH, '5' AS day FROM sink_src", loc,
      partitionColumns = Seq("YEAR"))
    assert(ctasSql.startsWith("CREATE TABLE default.graft_ctas_t"))
    assert(spark.table("default.graft_ctas_t").count() === 3)

    assert(Ddl.repairTable(spark, "default", "graft_ctas_t")
      .startsWith("MSCK REPAIR"))

    Ddl.cvasPartitionDate(spark, "default", "graft_ctas_t", "graft_v")
    val v = spark.table("graft_v")
      .selectExpr("cast(partition_date as string)").distinct()
      .collect().map(_.getString(0)).toSet
    // unpadded month/day parse: 2024-1-5 -> 2024-01-05
    assert(v === Set("2024-01-05", "2024-02-05", "2023-12-05"))

    spark.sql("DROP VIEW graft_v")
    assert(Ddl.drop(spark, "default", "graft_ctas_t")
      .startsWith("DROP TABLE IF EXISTS"))
    assert(!spark.catalog.tableExists("default.graft_ctas_t"))
  }
}
