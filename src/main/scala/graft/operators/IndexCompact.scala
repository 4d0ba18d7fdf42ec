package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Compaction for the stored, `partitionBy`-laid-out index families
  * ([[Dedup.writeBucketIndex]]'s bpart layout and
  * [[Similarity.writeIvfPqIndex]]'s cell layout) — the lifecycle step
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
  * concurrent writers; run it in the same single-writer maintenance
  * window as the appends themselves (probe-identity before/after is
  * asserted in DedupSimilaritySpec).
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
}
