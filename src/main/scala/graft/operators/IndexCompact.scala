package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

/** Compaction and deletion for the stored, `partitionBy`-laid-out index
  * families ([[Dedup.writeBucketIndex]]'s bpart layout and
  * [[Similarity.writeIvfPqIndex]]'s cell layout) — the lifecycle steps
  * after many appends.
  *
  * Every `appendTo*Index` batch adds its OWN parquet files to each
  * partition directory it touches, and the probes' I/O unit is files
  * under the pruned directories — so per-batch probe cost grows with
  * the number of appended batches (not corpus size) until a compaction
  * folds the fragments back to one file per directory. This is the
  * same small-files pathology every log-structured store compacts away,
  * and the same periodic-maintenance posture as the reference's ingest
  * loop (ref `ingestion/ingestion.py:32-96`: persist state each
  * increment, keep it consumable for the next).
  *
  * Mechanics: read the whole index once, re-cluster so each partition
  * value's rows land in exactly ONE task (→ one output file per
  * directory), write to a sibling temp dir, then swap each partition
  * directory into place with a per-directory FileSystem.rename. The
  * sidecar — the pinned banding/PQ model — is NOT touched: compaction
  * changes layout, never content or parameters. Not safe under
  * concurrent writers — and the per-directory swap is not atomic for
  * concurrent READERS either (a probe listing files mid-swap can see
  * a mix of old and new directories): run compaction AND deletion in
  * the same single-writer, no-reader maintenance window as the
  * appends themselves (probe-identity before/after is asserted in
  * DedupSimilaritySpec). A deployment that needs online maintenance
  * puts the index under a transactional table format (snapshot
  * isolation via manifests) — out of scope here by design; the
  * operators' read/rewrite shapes carry over unchanged.
  *
  * At 100 TB the one full read+write is the amortized cost ceiling —
  * run it when fragment count, not data size, dominates probe latency;
  * the swap itself is metadata-only renames.
  */
private[graft] object IndexCompact {

  /** Compact `indexPath` in place; `builder` names the write API for
    * the sidecar refusal message. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, indexPath: String,
      builder: String): (Long, Long) = {
    // sidecar refusal first: compacting a bare directory would happily
    // rewrite data nobody can probe correctly
    graft.config.Sidecar.read(spark, indexPath, builder)
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def partDirs(p: Path) = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
    def dataFiles(): Long = partDirs(root).map { d =>
      fs.listStatus(d.getPath).count { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.toLong
    }.sum

    val dirs = partDirs(root)
    if (dirs.isEmpty) return (0L, 0L)
    val partCol = dirs.head.getPath.getName.split("=")(0)
    val before = dataFiles()

    val tmp = new Path(root.getParent, root.getName + ".compact_tmp")
    fs.delete(tmp, true)
    // sibling temp dir: never read and write under the same root
    spark.read.parquet(indexPath)
      .repartition(dirs.size, col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    for (d <- partDirs(tmp)) {
      val dst = new Path(root, d.getPath.getName)
      fs.delete(dst, true)
      require(fs.rename(d.getPath, dst),
        s"compaction swap failed: ${d.getPath} -> $dst")
    }
    fs.delete(tmp, true)
    (before, dataFiles())
  }

  /** Deletes every index row whose `idColName` matches a value in
    * `deleteIds` (a single-column frame of ids) — the takedown/opt-out
    * step of the stored-index lifecycle (build → append → compact →
    * DELETE). Parquet files are immutable, so deletion is a rewrite —
    * but ONLY of the partition directories that actually hold a
    * matching row: one column-pruned scan of (partitionCol, idColName)
    * finds the touched directories (their count is bounded by the
    * layout's partition count — parts/nlist — a model-size driver
    * list), then the touched slice alone is re-read, anti-joined
    * against the delete set, and swapped back one directory at a time
    * via the same sibling-temp-dir rename dance as [[compact]].
    * Untouched directories — at 100 TB, almost all of them — are never
    * read for data, never rewritten. The rewrite also folds each
    * touched directory to one file (a free local compaction). A
    * directory whose rows are ALL deleted is removed outright.
    *
    * The sidecar is refused-checked but NOT modified here: banding
    * parameters are corpus-independent; model/count maintenance that
    * IS corpus-dependent (the ANN index's `count`) belongs to the
    * family wrapper ([[Similarity.deleteFromIvfPqIndex]]). Same
    * single-writer window as the other maintenance steps. Returns
    * (rowsDeleted, dirsRewritten). */
  def deleteMatching(spark: SparkSession, indexPath: String,
      builder: String, idColName: String,
      deleteIds: DataFrame): (Long, Long) = {
    graft.config.Sidecar.read(spark, indexPath, builder)
    deleteMatchingChecked(spark, indexPath, idColName, deleteIds)
  }

  /** Whether the index still has any partition directory — a
    * whole-corpus takedown ([[deleteMatching]] removing every dir) is
    * a VALID state the stored read paths must answer with empty
    * results, not hand to `spark.read.parquet` (which cannot infer a
    * schema from a sidecar-only directory). */
  private[operators] def hasPartDirs(spark: SparkSession,
      path: String): Boolean = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(root) && fs.listStatus(root).exists(st =>
      st.isDirectory && st.getPath.getName.contains("="))
  }

  /** As [[deleteMatching]] for a caller that has ALREADY read (and
    * thereby refusal-checked) the sidecar — the family wrappers need
    * sidecar fields anyway, and one parse per delete beats two. */
  private[operators] def deleteMatchingChecked(spark: SparkSession,
      indexPath: String, idColName: String,
      deleteIds: DataFrame): (Long, Long) = {
    require(deleteIds.columns.length == 1,
      s"deleteIds must be a single id column, got: " +
        deleteIds.columns.mkString(", "))
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partDirs(p: Path) = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
    val dirs = partDirs(root)
    if (dirs.isEmpty) return (0L, 0L)
    val partCol = dirs.head.getPath.getName.split("=")(0)
    // read twice below (touched scan + anti-join); checkpoint so a
    // recomputed delete-set expression can't diverge between the two
    val del = deleteIds.toDF("__graft_del_id").distinct()
      .localCheckpoint(false)
    // column-pruned scan: which directories hold a doomed row, and how
    // many — the ONLY corpus-scale read, two columns wide
    val touchedAgg = spark.read.parquet(indexPath)
      .select(col(partCol), col(idColName).as("__graft_id"))
      .join(del, col("__graft_id") === col("__graft_del_id"), "left_semi")
      .groupBy(col(partCol)).agg(count(lit(1)).as("n"))
      .collect() // ≤ partition-dir count rows (parts/nlist-bounded)
    if (touchedAgg.isEmpty) return (0L, 0L)
    val rowsDeleted = touchedAgg.map(_.getLong(1)).sum
    val touchedVals = touchedAgg.map(_.get(0)).toSeq
    // the swap below names directories as "$partCol=$v" — exact for
    // the numeric partition values both index families use (bpart,
    // cell); a string partition value can need Hive path escaping,
    // which this maintenance path deliberately does not implement
    require(touchedVals.forall(_.isInstanceOf[Number]),
      s"deleteMatching supports numeric partition values only; " +
        s"'$partCol' has ${touchedVals.head.getClass.getSimpleName}")
    val tmp = new Path(root.getParent, root.getName + ".delete_tmp")
    fs.delete(tmp, true)
    spark.read.parquet(indexPath)
      .where(col(partCol).isin(touchedVals: _*))
      .join(del, col(idColName) === col("__graft_del_id"), "left_anti")
      .repartition(touchedVals.size, col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    for (v <- touchedVals) {
      val name = s"$partCol=$v"
      val dst = new Path(root, name)
      fs.delete(dst, true) // fully-deleted partitions have no tmp dir
      val src = new Path(tmp, name)
      if (fs.exists(src))
        require(fs.rename(src, dst), s"delete swap failed: $src -> $dst")
    }
    fs.delete(tmp, true)
    (rowsDeleted, touchedVals.size.toLong)
  }
}
