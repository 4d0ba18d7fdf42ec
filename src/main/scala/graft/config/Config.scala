package graft.config

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Configuration & watermark-state model of the engine.
  *
  * Mirrors the reference's nested-dict settings registry
  * (reference: ingestion/ingestion.py:35-43, constants.py:9-24) and the
  * per-table sync document (ingestion/ingestion.py:143-164) as typed
  * case classes with a JSON codec.
  */
object Formats {
  /** Exact watermark timestamp format of the reference
    * (constants.py:26): microsecond precision, literal 'Z'. */
  val SyncPattern = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
  val syncFormatter: DateTimeFormatter = DateTimeFormatter.ofPattern(SyncPattern)

  def parseSyncTs(s: String): LocalDateTime = LocalDateTime.parse(s, syncFormatter)
  def formatSyncTs(t: LocalDateTime): String = syncFormatter.format(t)
}

/** Per-table watermark state (reference: ingestion/ingestion.py:149-156). */
case class Sync(
    system: String,
    tableName: String,
    refColumn: String,
    refLastValue: String) {
  def lastValue: LocalDateTime = Formats.parseSyncTs(refLastValue)
  def advanced(newValue: LocalDateTime): Sync =
    copy(refLastValue = Formats.formatSyncTs(newValue))
}

/** Per-table ingestion settings (reference: constants.py:9-24,
  * FIXTURES.md §B). All fields optional except the watermark pair. */
case class TableSettings(
    refColumn: String,
    refFirstValue: String,
    dateColumn: Option[String] = None,
    timeColumn: Option[String] = None,
    fetchsize: Option[String] = None,
    columnsToImport: Option[Seq[String]] = None)

/** Per-source-system connection settings (reference:
  * ingestion/ingestion.py:35-43). */
case class SystemConn(
    dbms: String,
    driver: Option[String] = None,
    user: Option[String] = None,
    password: Option[String] = None,
    host: Option[String] = None,
    port: Option[String] = None,
    service: Option[String] = None,
    tableSettings: Map[String, TableSettings] = Map.empty)

case class Settings(connection: Map[String, SystemConn]) {
  def table(system: String, table: String): TableSettings =
    connection(system).tableSettings(table)
}

/** JSON codecs. The reference stores both documents as plain JSON on the
  * local filesystem next to the data (sync: ingestion.py:143-164;
  * settings decrypted at startup: bin/ingestion/batch-ingestion.py:58-60 —
  * the 3DES wrapper is out of data-plane scope, SURVEY.md §7.3). */
object Json {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  // The on-disk sync document nests under a "sync" key with snake_case
  // fields (ingestion/ingestion.py:149-156).
  def syncToJson(s: Sync): String = {
    val node = mapper.createObjectNode()
    val inner = node.putObject("sync")
    inner.put("system", s.system)
    inner.put("table_name", s.tableName)
    inner.put("ref_column", s.refColumn)
    inner.put("ref_last_value", s.refLastValue)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }

  def syncFromJson(json: String): Sync = {
    val n = mapper.readTree(json).get("sync")
    Sync(
      system = n.get("system").asText(),
      tableName = n.get("table_name").asText(),
      refColumn = n.get("ref_column").asText(),
      refLastValue = n.get("ref_last_value").asText())
  }

  /** Reads `{table_path}/sync.json` if present; otherwise initializes from
    * `ref_first_value` exactly like read_sync_file
    * (ingestion/ingestion.py:143-158). */
  def readSyncFile(tablePath: Path, system: String, tableName: String,
      settings: Settings): Sync = {
    val f = tablePath.resolve("sync.json")
    if (Files.exists(f)) syncFromJson(Files.readString(f))
    else {
      val ts = settings.table(system, tableName)
      Sync(system, tableName, ts.refColumn, ts.refFirstValue)
    }
  }

  /** Persists the advanced watermark (ingestion/ingestion.py:161-164). */
  def writeSyncFile(sync: Sync, tablePath: Path): Unit = {
    Files.createDirectories(tablePath)
    Files.writeString(tablePath.resolve("sync.json"), syncToJson(sync))
  }
}
