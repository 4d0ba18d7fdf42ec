package graft.operators

import java.time.LocalDateTime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.TableSettings

/** Per-source-system preparation pipelines — the reference's
  * `preparation_*_df` family (ingestion/config.py:14-92) re-expressed as
  * pure `DataFrame => DataFrame` functions built ONLY from native
  * Catalyst expressions. The reference used 6 row-at-a-time Python UDFs
  * (config.py:32,38,39,53,54,75,81,89,90) — each one below is the
  * codegen'd built-in equivalent, which keeps the whole prep inside
  * WholeStageCodegen and (crucially, at scale) keeps the watermark
  * predicate pushable into the scan.
  *
  * Semantic-parity traps encoded here (SURVEY.md §4.3):
  *  1. partition strings are UNPADDED ("4", not "04") → `cast("string")`
  *     of year/month/weekofyear, never date_format "MM";
  *  2. watermark boundary is strict `>` — equal-timestamp rows drop;
  *  3. sha256(null) → null (sha2 matches hexdigest casing: lowercase);
  *  4. weekofyear is ISO-8601, matching Python isocalendar()[1].
  */
object Prep {

  // ---- F1: SAP timestamp reconstruction (config.py:18-32) ----
  // date column `yyyyMMdd` + time column `HHmmss`, both strings, sliced
  // positionally by the reference's UDF; natively: parse the
  // concatenation in one shot.
  def sapTimestamp(dateCol: Column, timeCol: Column): Column =
    to_timestamp(concat(dateCol, timeCol), "yyyyMMddHHmmss")

  // ---- F2/F3/F4: unpadded partition strings (config.py:38-39,53-54,89-90) ----
  def yearString(ts: Column): Column = year(ts).cast("string")
  def monthString(ts: Column): Column = month(ts).cast("string")
  /** ISO-8601 week, unpadded — Python `isocalendar()[1]` ≡ Spark
    * `weekofyear` including the Jan-1-in-week-52/53 edge. */
  def isoWeekString(ts: Column): Column = weekofyear(ts).cast("string")

  // ---- F5: SHA-256 PII hashing (config.py:68-77) ----
  // hexdigest() is lowercase hex; sha2(_, 256) matches. Null → null.
  // The reference's UDF also nulls NON-string inputs; callers hashing a
  // non-string column must decide cast-vs-null at config level.
  def sha256Pii(c: Column): Column = sha2(c, 256)

  // ---- F6: stringify (config.py:81-85, misnamed to_int_udf) ----
  def stringify(c: Column): Column = c.cast("string")

  // ---- P1: drop rows that cannot be watermarked (ingestion.py:54) ----
  def dropNullRef(df: DataFrame, refColumn: String): DataFrame =
    df.filter(col(refColumn).isNotNull)

  // ---- P2: strict-> watermark predicate (config.py:37,52,88) ----
  def watermarkFilter(df: DataFrame, refColumn: String,
      lastValue: LocalDateTime): DataFrame =
    df.where(col(refColumn) > lit(java.sql.Timestamp.valueOf(lastValue)))

  // ---- P3: config-driven projection (config.py:63-66) ----
  def project(df: DataFrame, columnsToImport: Option[Seq[String]]): DataFrame =
    columnsToImport.fold(df)(cols => df.select(cols.map(col): _*))

  // ---- P5: column drop (config.py:40 — the reference keeps its
  // ref-column drop commented out; provided as an explicit operator so
  // a pipeline CAN shed derived columns before the sink) ----
  def dropColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  // ---------------------------------------------------------------------
  // System pipelines (config.py:95-105 dispatch). Each is
  // (TableSettings, watermark) => DataFrame => DataFrame so pipelines
  // compose and the dispatch map is data, not control flow.
  // ---------------------------------------------------------------------
  type Pipeline = (TableSettings, LocalDateTime) => DataFrame => DataFrame

  /** SAP (config.py:14-43): reconstruct ref timestamp from split
    * date/time string columns, then watermark, then YEAR/MONTH partition
    * strings. Because the ref column is derived, the watermark predicate
    * runs post-scan — but stays codegen'd (the reference shipped every
    * row through Python here, its worst plan). */
  val sap: Pipeline = (ts, wm) => df => {
    val withRef = df.withColumn(ts.refColumn,
      sapTimestamp(col(ts.dateColumn.get), col(ts.timeColumn.get)))
    watermarkFilter(withRef, ts.refColumn, wm)
      .withColumn("YEAR", yearString(col(ts.refColumn)))
      .withColumn("MONTH", monthString(col(ts.refColumn)))
  }

  /** LIMS (config.py:46-56): native timestamp ref column — watermark
    * pushes all the way into the scan — plus YEAR/MONTH from a separate
    * date column. */
  val lims: Pipeline = (ts, wm) => df => {
    val dateCol = ts.dateColumn.getOrElse(ts.refColumn)
    watermarkFilter(df, ts.refColumn, wm)
      .withColumn("YEAR", yearString(col(dateCol)))
      .withColumn("MONTH", monthString(col(dateCol)))
  }

  /** C1 (config.py:59-92): optional projection FIRST (the ref column must
    * be in columns_to_import or the plan fails — reference behavior,
    * mirrored); conditional PII hash / stringify only when the column
    * exists in the schema (plan-time branch, config.py:76-85); watermark;
    * ISO-week partition string. */
  val c1: Pipeline = (ts, wm) => df0 => {
    val df1 = project(df0, ts.columnsToImport)
    val df2 = if (df1.columns.contains("EMAIL__C"))
      df1.withColumn("EMAIL__C", sha256Pii(col("EMAIL__C"))) else df1
    val df3 = if (df2.columns.contains("IS_PRO__C"))
      df2.withColumn("IS_PRO__C", stringify(col("IS_PRO__C"))) else df2
    watermarkFilter(df3, ts.refColumn, wm)
      .withColumn("WEEK", isoWeekString(col(ts.refColumn)))
  }

  /** System → pipeline dispatch (config.py:100-104). */
  val bySystem: Map[String, Pipeline] = Map(
    "sap-pru" -> sap,
    "lims" -> lims,
    "c1" -> c1)
}
