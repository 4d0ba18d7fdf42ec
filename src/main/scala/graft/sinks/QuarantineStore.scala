package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * them; the replaying stream re-attempts the append). A replayed
  * batch finds its file already present and SKIPS — the streams then
  * suppress the callback too, making quarantine evidence exactly-once
  * end to end when a store is configured.
  *
  * One store holds ONE stream's quarantines (the file schema is the
  * caller's batch schema — evidence rows carry the doc/vector columns
  * plus the gate's estimate column, which differ per gate family);
  * point each stream at its own directory. Scale shape: one tiny file
  * per quarantining micro-batch — incident volume, not data volume.
  * Old names fold away with [[compactBefore]] under
  * [[ComplianceLog]]'s caveat verbatim: the file name is the skip
  * state, so only batches beyond the writing stream's replay horizon
  * (`minBatchesToRetain` behind the newest) may ever be folded
  * together — the horizon is the explicit argument. */
object QuarantineStore {

  /** Appends `rows` as the (lineage, batchId) quarantine evidence
    * unless that key is already recorded. Returns whether the file was
    * written (false = replay; the original evidence stands). */
  def append(spark: SparkSession, storePath: String, lineage: String,
      batchId: Long, rows: DataFrame): Boolean = {
    require(lineage.matches("[A-Za-z0-9._-]+") &&
      lineage != EvidenceCompaction.CompactedPrefix,
      s"quarantine lineage must be a plain non-reserved name, got " +
        s"'$lineage'")
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val name = s"$lineage-$batchId.parquet"
    val dest = new Path(root, name)
    if (fs.exists(dest)) return false
    val inflight = new Path(root, s".inflight-$name")
    // quarantines are incident-sized (the over-budget slice of one
    // micro-batch); one file per key keeps the rename the commit point
    rows.coalesce(1).write.mode("overwrite").parquet(inflight.toString)
    val part = fs.listStatus(inflight).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"quarantine inflight write produced no part file: $inflight"))
    require(fs.rename(part, dest), s"quarantine append failed: $dest")
    fs.delete(inflight, true): Unit
    true
  }

  /** Every quarantined row in the store, or None when nothing has ever
    * been quarantined (the schema is the writing stream's — an empty
    * store has none to offer). */
  def read(spark: SparkSession, storePath: String): Option[DataFrame] = {
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasFiles = fs.exists(root) && fs.listStatus(root)
      .exists(st => !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
    if (!hasFiles) None else Some(spark.read.parquet(storePath))
  }

  /** Folds every quarantine file with batch id < `horizonBatchId`
    * into one consolidated file — same engine, contract and
    * caller-owned horizon as
    * [[ComplianceLog.compactBefore]] ([[EvidenceCompaction]]); the
    * schema is inferred from the store's own files (one stream, one
    * schema per store). Returns (filesFolded, rowsFolded). */
  def compactBefore(spark: SparkSession, storePath: String,
      horizonBatchId: Long): (Long, Long) =
    EvidenceCompaction.compactBefore(spark, storePath, horizonBatchId,
      None)

  /** Rolls a crashed [[compactBefore]] forward (manifest-committed),
    * then sweeps crashed append `.inflight-*` dirs (a crash between
    * the parquet write and the rename). An append's evidence is NOT
    * lost: the stream that crashed replays its batch, finds no final
    * file, and re-appends. Returns the action log. */
  def recover(spark: SparkSession, storePath: String): Seq[String] = {
    val folded = EvidenceCompaction.recover(spark, storePath)
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return folded
    val stale = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(".inflight-")).toSeq
    stale.foreach(p => fs.delete(p, true))
    folded ++ stale.map(_.getName)
  }
}
