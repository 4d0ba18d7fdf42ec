package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Exactly-once evidence store for the admission gates' QUARANTINED
  * rows — closing the documented at-least-once bound on quarantine
  * delivery: the maintenance streams' `quarantine` callback runs under
  * plain foreachBatch semantics, so a batch replayed after a crash
  * between the callback and the checkpoint commit re-offers the same
  * over-budget rows, and a callback that pages a human or appends to
  * an unkeyed table double-counts them.
  *
  * Same discipline as [[ComplianceLog]], generalized from a one-row
  * evidence line to a caller-schema row set: each (lineage, batchId)
  * quarantine lands as ONE parquet file whose NAME is the idempotence
  * key — written to a dot-prefixed inflight dir (invisible to readers)
  * and RENAMED in, so a reader never sees a torn file and a crash
  * leaves only an ignorable `.inflight-*` dir ([[recover]] sweeps
  * them; the replaying stream re-attempts the append). The streams
  * check [[recorded]] BEFORE the callback and append: a replayed
  * recorded batch re-offers neither, while a crash between the
  * callback and the append re-offers BOTH on replay — the STORE is
  * exactly-once, the CALLBACK at-least-once (it can double-fire
  * across a crash, never be silently lost; ordering it after the
  * append would invert that into at-most-once, the wrong failure
  * mode for evidence).
  *
  * One store holds ONE stream's quarantines (the file schema is the
  * caller's batch schema — evidence rows carry the doc/vector columns
  * plus the gate's estimate column, which differ per gate family);
  * point each stream at its own directory. The first append PINS that
  * schema in a `_graft_schema.json` sidecar and every later append is
  * checked against it (names + types, nullability free): the realistic
  * hazard is not two streams sharing a store but ONE stream whose
  * evidence schema evolves across deployments — without the pin, the
  * old and new files coexist and [[compactBefore]]'s
  * union-by-inference could silently drop or null the columns only
  * one side has (r13 verdict item 3). Evolving the schema is a
  * deliberate act: fold the old store away (or start a new directory)
  * rather than mixing shapes under one inference. [[compactBefore]]
  * and [[read]] both use the pinned schema when present, so a fold
  * can never change what a reader sees. Scale shape: one tiny file
  * per quarantining micro-batch — incident volume, not data volume.
  * Old names fold away with [[compactBefore]] under
  * [[ComplianceLog]]'s caveat verbatim: the file name is the skip
  * state, so only batches beyond the writing stream's replay horizon
  * (`minBatchesToRetain` behind the newest) may ever be folded
  * together — the horizon is the explicit argument. */
object QuarantineStore {

  /** Schema pin sidecar name — underscore-prefixed so parquet readers
    * and the evidence-file name parser both ignore it. */
  private[sinks] val SchemaSidecar = "_graft_schema.json"

  /** The store's pinned schema, if any append has pinned one. */
  private def pinnedSchema(spark: SparkSession,
      root: Path): Option[StructType] =
    graft.config.Sidecar.readNode(spark, new Path(root, SchemaSidecar))
      .map(n => DataType.fromJson(
        graft.config.Sidecar.str(n, "schemaJson"))
        .asInstanceOf[StructType])

  private def writePin(spark: SparkSession, root: Path,
      schema: StructType): Unit = {
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(root)
    val node = graft.config.Sidecar.newNode()
    node.put("schemaJson", schema.json)
    graft.config.Sidecar.writeNode(spark,
      new Path(root, SchemaSidecar), node)
  }

  /** The schema that GOVERNS a store right now: the pin when present,
    * else — for a legacy pre-pin store — the shape its OWN existing
    * files carry (never an incoming batch's; r14 ADVICE: bootstrapping
    * the pin from the first post-upgrade batch would enshrine exactly
    * the evolved shape the pin exists to refuse, and read/fold under
    * it would silently null the legacy files' columns). None =
    * genuinely empty store, nothing to govern yet. */
  private def governingSchema(spark: SparkSession,
      root: Path): Option[StructType] =
    pinnedSchema(spark, root).orElse {
      if (!EvidenceCompaction.hasFinalFiles(spark, root)) None
      else Some(spark.read.parquet(root.toString).schema)
    }

  /** [[governingSchema]] + MIGRATE-ON-TOUCH for the WRITE paths
    * (append, fold): a legacy store's derived schema is persisted as
    * the pin so every later touch enforces it. [[read]] deliberately
    * does NOT call this — a read must stay a read (an auditor with
    * read-only credentials reads legacy stores too), and it is
    * deterministic without the persisted pin because the governing
    * schema derives from the same files it reads. Same
    * migrate-on-touch pattern as the legacy-lineage upgrade the index
    * families use. */
  private def ensurePin(spark: SparkSession,
      root: Path): Option[StructType] =
    pinnedSchema(spark, root).orElse {
      // legacy pre-pin store: derive from its own files and persist —
      // one sidecar read on the common already-pinned path (the old
      // shape re-read the sidecar just to decide whether to persist,
      // two extra metadata RTTs per quarantining micro-batch)
      if (!EvidenceCompaction.hasFinalFiles(spark, root)) None
      else {
        val derived = spark.read.parquet(root.toString).schema
        writePin(spark, root, derived)
        Some(derived)
      }
    }

  private def shape(s: StructType): Set[(String, DataType)] =
    s.fields.map(f => (f.name, f.dataType)).toSet

  /** First append into an empty store pins; every later append must
    * match (names + types; nullability and field order free — parquet
    * reads by name and checkpoint replays can flip nullability). A
    * legacy pre-pin store pins from its EXISTING files via
    * [[ensurePin]] before the batch is checked, so an evolved append
    * against legacy evidence refuses loudly instead of silently
    * enshrining the new shape. */
  private def pinOrCheck(spark: SparkSession, root: Path,
      schema: StructType): Unit =
    ensurePin(spark, root) match {
      case None => writePin(spark, root, schema)
      case Some(p) =>
        require(shape(p) == shape(schema),
          s"quarantine store $root is pinned to schema " +
            s"[${p.toDDL}] but this batch carries " +
            s"[${schema.toDDL}] — one store holds one stream's ONE " +
            "schema; an evolved gate writes to a fresh store (fold " +
            "the old one away with compactBefore), it does not mix " +
            "shapes under one inference")
    }

  /** Appends `rows` as the (lineage, batchId) quarantine evidence
    * unless that key is already recorded. Returns whether the file was
    * written (false = replay; the original evidence stands). Refuses
    * loudly — replay or not — if `rows`' schema does not match the
    * store's pinned one (see the class doc). */
  def append(spark: SparkSession, storePath: String, lineage: String,
      batchId: Long, rows: DataFrame): Boolean = {
    require(lineage.matches("[A-Za-z0-9._-]+") &&
      lineage != EvidenceCompaction.CompactedPrefix,
      s"quarantine lineage must be a plain non-reserved name, got " +
        s"'$lineage'")
    // negative ids mis-parse at the name's last '-' (see
    // ComplianceLog.append; r13 ADVICE)
    require(batchId >= 0,
      s"quarantine batch id must be >= 0, got $batchId")
    pinOrCheck(spark, new Path(storePath), rows.schema)
    if (recorded(spark, storePath, lineage, batchId)) return false
    // quarantines are incident-sized (the over-budget slice of one
    // micro-batch); one file per key keeps the rename the commit point
    EvidenceCompaction.writeCommitted(spark, new Path(storePath),
      s"$lineage-$batchId.parquet", rows)
    true
  }

  /** Whether (lineage, batchId) already has its evidence file — the
    * replay check the maintenance streams run BEFORE the quarantine
    * callback, so a replayed batch skips the callback and a crash
    * between callback and [[append]] re-offers both (callback
    * at-least-once, store exactly-once). */
  def recorded(spark: SparkSession, storePath: String, lineage: String,
      batchId: Long): Boolean = {
    val p = new Path(storePath, s"$lineage-$batchId.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Every quarantined row in the store, or None when nothing has ever
    * been quarantined. The schema is the GOVERNING one — the pin, or
    * for a legacy pre-pin store the shape of its own files
    * ([[governingSchema]]) — so a fold can never change what a reader
    * sees. A read stays a READ: it never persists the pin (read-only
    * credentials must be able to audit a legacy store); the first
    * WRITE-path touch migrates it. */
  def read(spark: SparkSession, storePath: String): Option[DataFrame] =
    if (!EvidenceCompaction.hasFinalFiles(spark, new Path(storePath)))
      None
    else {
      val gov = governingSchema(spark, new Path(storePath))
      Some(gov.fold(spark.read)(spark.read.schema)
        .parquet(storePath))
    }

  /** Folds every quarantine file with batch id < `horizonBatchId`
    * into one consolidated file — same engine, contract and
    * caller-owned horizon as
    * [[ComplianceLog.compactBefore]] ([[EvidenceCompaction]]); the
    * fold reads under the PINNED schema (r13 verdict item 3 —
    * inference over a store that somehow mixed shapes could silently
    * drop columns; a pre-pin legacy store is pinned from its own
    * files first, [[ensurePin]]). Single-writer is enforced on disk
    * via the store's cross-JVM fold lease (see
    * [[EvidenceCompaction]]); a concurrent fold/roll-forward in any
    * process refuses loudly. Returns (filesFolded, rowsFolded). */
  def compactBefore(spark: SparkSession, storePath: String,
      horizonBatchId: Long): (Long, Long) =
    EvidenceCompaction.compactBefore(spark, storePath, horizonBatchId,
      ensurePin(spark, new Path(storePath)))

  /** Rolls a crashed [[compactBefore]] forward (manifest-committed),
    * then sweeps crashed append `.inflight-*` dirs (a crash between
    * the parquet write and the rename). An append's evidence is NOT
    * lost: the stream that crashed replays its batch, finds no final
    * file, and re-appends. Returns the action log. */
  def recover(spark: SparkSession, storePath: String): Seq[String] =
    EvidenceCompaction.recover(spark, storePath) ++
      EvidenceCompaction.sweepInflights(spark, new Path(storePath))
}
