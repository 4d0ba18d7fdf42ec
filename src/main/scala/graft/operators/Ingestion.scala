package graft.operators

import java.nio.file.Path
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.storage.StorageLevel

import graft.config.{Json, Settings, Sync}
import graft.sinks.PartitionedSink
import graft.sources.Source

/** The incremental-ingestion core — the Spark-first rewrite of the
  * reference's `ingestion_step` (ingestion/ingestion.py:16-103):
  *
  *   read sync → scan → isNotNull(ref) → prep (system pipeline) →
  *   persist → isEmpty? → [count] → append-write partitioned → max(ref) →
  *   advance sync.
  *
  * Differences that matter at 100 TB (all Spark-idiomatic, none
  * semantic):
  *   - no blanket `repartition(32)` after the scan (ingestion.py:53) —
  *     parallelism comes from the source itself (JDBC partitioned read /
  *     parquet splits); a blind round-robin shuffle of the full increment
  *     is pure cost;
  *   - `df.isEmpty` instead of `df.rdd.isEmpty()` (ingestion.py:73) —
  *     avoids RDD conversion and runs a LIMIT 1 plan;
  *   - the count/write/max actions reuse one MEMORY_AND_DISK persist,
  *     exactly the reference's 4-action cache contract (ingestion.py:68).
  */
object Ingestion {

  final case class StepResult(
      wrote: Boolean,
      rowCount: Option[Long],
      newSync: Sync)

  def ingestionStep(
      spark: SparkSession,
      system: String,
      tableName: String,
      source: Source,
      tablePath: Path,
      outputPath: String,
      settings: Settings,
      partitionColumns: Seq[String],
      counting: Boolean = false,
      fileFormat: String = "parquet"): StepResult = {

    // 1. watermark state (ingestion.py:32)
    val sync = Json.readSyncFile(tablePath, system, tableName, settings)
    val tableSettings = settings.table(system, tableName)

    // 2-5. scan → not-null ref → system prep with strict-> watermark
    val scanned = source.read(spark)
    val notNullable = system match {
      case "sap-pru" =>
        // SAP's ref column is derived inside the pipeline; the raw date
        // column is what must be non-null pre-prep.
        scanned.filter(col(tableSettings.dateColumn.get).isNotNull)
      case _ => Prep.dropNullRef(scanned, sync.refColumn)
    }
    val prepared = Prep.bySystem(system)(tableSettings, sync.lastValue)(notNullable)

    // 6. persist across the ≤4 actions below (ingestion.py:68)
    val cached = prepared.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // 7. emptiness probe short-circuits write + advance (ingestion.py:73-74)
      if (cached.isEmpty) {
        StepResult(wrote = false, rowCount = None, newSync = sync)
      } else {
        // 8. optional count (ingestion.py:75-77)
        val n = if (counting) Some(cached.count()) else None
        // 9. append-only incremental write (ingestion.py:80-85)
        PartitionedSink.appendIncrement(cached, outputPath, partitionColumns,
          fileFormat)
        // 10. advance watermark = global max of ref column
        // (ingestion.py:88-95), formatted µs+'Z'
        val maxTs = cached.agg(max(col(sync.refColumn))).first()
          .getAs[Timestamp](0)
        val newSync = sync.advanced(maxTs.toLocalDateTime)
        // 11. persist new sync next to the data (ingestion.py:96,161-164)
        Json.writeSyncFile(newSync, tablePath)
        StepResult(wrote = true, rowCount = n, newSync = newSync)
      }
    } finally cached.unpersist()
  }
}
