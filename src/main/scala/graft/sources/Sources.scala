package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.SystemConn

/** Pluggable table sources. The reference reads only JDBC
  * (pyspark_ingestion/spark.py:119-133); the test harness reads parquet.
  * A `Source` yields a DataFrame lazily so Catalyst sees the whole plan
  * (scan → prep → filter) and can push predicates into the scan.
  */
trait Source {
  def read(spark: SparkSession): DataFrame
}

/** Parquet directory/table source (harness path). Column pruning and
  * predicate pushdown reach the parquet footer automatically. */
final case class ParquetSource(path: String) extends Source {
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** CSV file source — the offline equivalent of the reference's Excel
  * data-dictionary scan (bin/ingestion/parse-data-dictionary.py:22-24;
  * no Excel reader in a zero-egress container, so the dictionary is
  * expected as a CSV export). */
final case class CsvSource(path: String, header: Boolean = true)
    extends Source {
  def read(spark: SparkSession): DataFrame =
    spark.read.option("header", header.toString).csv(path)
}

/** JDBC table scan (reference: spark.py:119-133) with fetchsize tuning.
  *
  * At 100 TB scale a single-connection JDBC scan is the bottleneck the
  * reference worked around with `.repartition(32)` AFTER the scan
  * (ingestion/ingestion.py:44,53) — that still funnels every row through
  * one connection. We instead parallelize the scan itself with
  * partitionColumn/lowerBound/upperBound/numPartitions when a numeric
  * split column is known; the post-scan repartition becomes unnecessary.
  */
final case class JdbcSource(
    url: String,
    table: String,
    driver: String,
    fetchsize: String = "100000",
    partitioning: Option[JdbcPartitioning] = None) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .option("fetchsize", fetchsize)
    partitioning.fold(r) { p =>
      r.option("partitionColumn", p.column)
        .option("lowerBound", p.lower.toString)
        .option("upperBound", p.upper.toString)
        .option("numPartitions", p.numPartitions.toString)
    }.load()
  }
}

final case class JdbcPartitioning(column: String, lower: Long, upper: Long,
    numPartitions: Int)

/** XML source on Spark 4's built-in XML datasource (the spark-xml
  * package was merged into Spark proper): one row per `rowTag`
  * element, schema inferred or supplied. Feed-style sources (config
  * exports, legacy system dumps) arrive as XML more often than any
  * ingestion engine would like; reading through the native datasource
  * keeps the scan distributed (file-splittable per row-tag boundary)
  * and the plan declarative — schema inference can be skipped by
  * passing an explicit DDL string, which at scale avoids the extra
  * inference pass entirely. */
final case class XmlSource(path: String, rowTag: String,
    schemaDdl: Option[String] = None) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read.format("xml").option("rowTag", rowTag)
    schemaDdl.fold(r)(d => r.schema(d)).load(path)
  }
}

/** Raw-file directory source for multimodal ingest: each matching file
  * becomes one row (path, modificationTime, length, content BINARY) —
  * the entry point that turns a bucket of images/audio into the opaque
  * binary column the Multimodal operators consume. Spark's binaryFile
  * format lists and reads files in parallel across executors;
  * `maxBytesPerFile` guards the scan against a stray huge object (a
  * 100 TB media crawl always has one). Pruning on path/length happens
  * at the file index — a `length < x` or path-glob predicate skips
  * reads entirely. */
final case class BinaryDirSource(path: String, glob: String = "*",
    maxBytesPerFile: Long = 512L * 1024 * 1024) extends Source {
  def read(spark: SparkSession): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .filter(org.apache.spark.sql.functions.col("length") <= maxBytesPerFile)
}

/** Dialect-specific JDBC URL builders (reference: spark.py:78-116). */
object JdbcUrl {
  /** Oracle thin (spark.py:78-82). */
  def oracleThin(user: String, password: String, host: String, port: String,
      service: String): String =
    s"jdbc:oracle:thin:$user/$password@//$host:$port/$service"

  /** SQL Server (spark.py:107-116). */
  def sqlServer(user: String, password: String, server: String, port: String,
      database: String): String =
    s"jdbc:sqlserver://$server:$port;databaseName=$database;user=$user;password=$password"

  /** Dialect dispatch (spark.py:85-104, config.py:96-99). */
  def forSystem(c: SystemConn): String = c.dbms match {
    case "oracle" => oracleThin(c.user.getOrElse(""), c.password.getOrElse(""),
      c.host.getOrElse(""), c.port.getOrElse("1521"), c.service.getOrElse(""))
    case "sqlserver" => sqlServer(c.user.getOrElse(""), c.password.getOrElse(""),
      c.host.getOrElse(""), c.port.getOrElse("1433"), c.service.getOrElse(""))
    case other => throw new IllegalArgumentException(s"unknown dbms: $other")
  }
}

/** Convenience loader for the driver testdata layout
  * (`$dir/{name}.parquet`, TESTDATA.md).
  *
  * The driver writes `events.ts` as parquet TIMESTAMP(NANOS), which
  * Spark's vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]).
  * We read nanos as raw longs (legacy flag) and normalize to a
  * microsecond timestamp in the plan — `div 1000` floor-truncates
  * exactly like DuckDB's own nanos→micros read, so oracle comparisons
  * stay bit-identical. The schema guard keeps this a no-op if the
  * fixture is ever regenerated with micros precision. */
object Tables {
  import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** (table, column) pairs stored as TIMESTAMP(NANOS) in the fixtures. */
  private val nanoCols = Set(("events", "ts"))

  /** One logical-plan instance per (session, dir, table): building a
    * parquet DataFrame lists the directory and reads footers for the
    * schema, and a registry run touches the same handful of tables
    * 50+ times — per-query re-listing was ~1.5s of fixed overhead per
    * query at toy scale (at cluster scale, repeated driver-side object
    * -store listings are the same tax, larger). The cached value is a
    * lazy plan, not data.
    *
    * Lifecycle: the outer map holds its SparkSession keys WEAKLY and a
    * listener drops a session's entries when its context stops, so a
    * long-lived multi-session service doesn't accumulate dead sessions'
    * file indexes. NOTE the cache freezes the FILE LISTING per
    * (session, dir, table) — files appended to a table directory after
    * first access are invisible until [[invalidate]]. */
  private val cache = new java.util.WeakHashMap[
    SparkSession,
    java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  private def sessionCache(spark: SparkSession) = cache.synchronized {
    var m = cache.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
      cache.put(spark, m)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            cache.synchronized { cache.remove(spark) }
        })
    }
    m
  }

  /** Drop the cached plan (and its frozen file listing) for one table,
    * or for every table when `name` is None — for writers that append
    * to a directory a live session already read. */
  def invalidate(spark: SparkSession, dir: String,
      name: Option[String] = None): Unit = {
    val m = cache.synchronized(Option(cache.get(spark)))
    m.foreach { sc =>
      name match {
        case Some(n) => sc.remove((dir, n))
        case None =>
          sc.keySet.removeIf(k => k._1 == dir)
      }
    }
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Fixture timestamps are parquet timestamp[us] with isAdjustedToUTC
    // = false; by default Spark 3.4+ infers those as TIMESTAMP_NTZ,
    // which query code (unix_micros, bigint casts) rejects. Turning
    // inference off makes the SCAN produce session-TZ TIMESTAMP
    // directly — full predicate pushdown, no cast node — and the
    // session TZ is pinned to UTC so the micros are unchanged.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // watermark predicates on the derived micros column must still reach
    // the parquet footer — see graft.plans.NanosWatermarkPushdown
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.NanosWatermarkPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.NanosWatermarkPushdown
    }
    sessionCache(spark).computeIfAbsent((dir, name), _ => {
      val df = ParquetSource(s"$dir/$name.parquet").read(spark)
      df.schema.fields.foldLeft(df) { (d, f) =>
        if (f.dataType == LongType && nanoCols.contains((name, f.name)))
          d.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
        else if (f.dataType == TimestampNTZType)
          // Fixtures written as parquet timestamp[us] without a timezone
          // (isAdjustedToUTC=false) surface as TIMESTAMP_NTZ; query code
          // (unix_micros, casts to bigint) expects session-TZ TIMESTAMP.
          // The session TZ is pinned to UTC in Verify/Bench/tests, so the
          // cast is a pure type relabel — identical micros, DuckDB-parity.
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        else d
      }
    })
  }
}
