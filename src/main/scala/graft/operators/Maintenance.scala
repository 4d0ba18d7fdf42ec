package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max => smax}

/** ONE-CALL maintenance window for any graft-maintained stored table —
  * the single entry point an ops cron calls (r11 stretch item 8),
  * composing only existing operators: family-aware crash recovery →
  * fragment check → compact if past threshold → health report.
  *
  * The family is detected from the `_graft_index.json` sidecar the
  * write APIs pin next to the data (`coarse` model ⇒ IVF-PQ serving
  * index, banding parameters ⇒ LSH bucket index, no sidecar ⇒ plain
  * partitioned corpus table), so the cron needs a PATH, not knowledge
  * of what lives there. Recovery is each family's own fsck
  * ([[Similarity.recoverIvfPqIndex]] — also repins the corpus count
  * after a crashed append; [[Dedup.recoverBucketIndex]];
  * [[graft.sinks.PartitionedSink.recoverTable]] — heals BOTH delete
  * protocols), all idempotent, so running the window against a healthy
  * table is safe and cheap.
  *
  * Compaction triggers on the max data-file count per leaf directory
  * (each append leaves ≥1 fragment per touched dir; probe wall decays
  * with fragment count — ProbeIncremental measures the curve) and runs
  * the family's manifest-committed recoverable swap. Plain corpus
  * tables are NOT compacted in place (their rewrite story is
  * [[graft.sinks.PartitionedSink.compact]], source → target, a
  * deployment decision about where the rewrite lands) — the report
  * still carries their fragment stats so the cron can alert.
  *
  * Scale shape: recovery and the fragment census are
  * directory-listing-bounded metadata; the balance histogram is a
  * partition-column-only footer aggregate (no data pages); only a
  * triggered compact reads data, and that is the job's purpose. */
object Maintenance {

  /** What one maintenance window found and did. `balanceMaxOverMean`
    * is the straggler ratio the partition-pruned probes inherit from
    * the heaviest leaf (q308's headline number); 1.0 is perfectly
    * balanced, NaN means an empty table. The `ttl*` fields carry the
    * retention sweep's evidence when a `ttl` predicate was passed
    * (zeros otherwise) — `ttlNullLeavesRetained` is the null-partition
    * report a cron alerts on (see
    * [[graft.sinks.PartitionedSink.dropPartitionsWhere]]). */
  final case class Report(
      family: String,
      recoveryActions: Seq[String],
      leafDirs: Long,
      dataFilesBefore: Long,
      maxFilesPerDir: Long,
      compacted: Boolean,
      dataFilesAfter: Long,
      balanceMaxOverMean: Double,
      ttlRowsDropped: Long = 0L,
      ttlDirsDropped: Long = 0L,
      ttlNullLeavesRetained: Long = 0L)

  private val IvfPq = "ivfpq"
  private val LshBucket = "lsh-bucket"
  private val Table = "table"

  /** Run one maintenance window against `path`: recover → retention
    * sweep (when a `ttl` predicate is passed — whole partition
    * directories whose VALUE satisfies it drop with zero rewrite,
    * nulls retained-and-reported per
    * [[graft.sinks.PartitionedSink.dropPartitionsWhere]]'s contract) →
    * compact if any leaf directory holds more than `maxFilesPerDir`
    * data files → report. With `ttl` this is the COMPLETE ops cron in
    * one call: heal, retain, defragment, measure. A `ttl` on a stored
    * INDEX is refused loudly — its partition key (`bpart`/`cell`) is
    * an internal hash, so a value-aligned sweep would age out index
    * shards, not data; index removal goes through the delete APIs.
    * Same single-writer/no-reader window as the operators it
    * composes. */
  def run(spark: SparkSession, path: String,
      maxFilesPerDir: Int = 4, ttl: Option[Column] = None): Report = {
    require(maxFilesPerDir >= 1,
      s"maxFilesPerDir must be >= 1, got $maxFilesPerDir")
    val family = detectFamily(spark, path)
    require(ttl.isEmpty || family == Table,
      s"Maintenance.run: a TTL predicate on a '$family' index would " +
        "age out shards by their internal partition key — retention " +
        "is a corpus-table policy; use the index delete APIs instead")
    val actions = family match {
      case IvfPq => Similarity.recoverIvfPqIndex(spark, path)
      case LshBucket => Dedup.recoverBucketIndex(spark, path)
      case Table => graft.sinks.PartitionedSink.recoverTable(spark, path)
    }
    val (ttlRows, ttlDirs, ttlNulls) = ttl match {
      case Some(p) =>
        graft.sinks.PartitionedSink.dropPartitionsWhere(spark, path, p)
      case None => (0L, 0L, 0L)
    }
    // census AFTER the sweep: the report describes the post-window tree
    val (partCols, leaves, before, maxPer) = fragmentCensus(spark, path)
    val shouldCompact = maxPer > maxFilesPerDir && family != Table
    val after =
      if (!shouldCompact) before
      else family match {
        case IvfPq => Similarity.compactIvfPqIndex(spark, path)._2
        case _ => Dedup.compactBucketIndex(spark, path)._2
      }
    // the balance denominator must be the CURRENT leaf count: the swap
    // manifest computes `remove` precisely because a compact is not
    // guaranteed to preserve every partition value (an emptied leaf is
    // dropped), so dividing by the pre-compaction census would silently
    // skew max/mean after any leaf-dropping compact (r12 ADVICE). The
    // recount is one listing per partition directory — the same
    // metadata class as the census itself, paid only when a compact ran.
    val leavesNow =
      if (shouldCompact) {
        val root = new Path(path)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        IndexCompact.leafParts(fs, root)._2.size.toLong
      } else leaves.size.toLong
    Report(family, actions, leavesNow, before, maxPer,
      shouldCompact, after, balance(spark, path, partCols, leavesNow),
      ttlRows, ttlDirs, ttlNulls)
  }

  /** Family detection from the sidecar's own fields — the model arrays
    * only the ANN writer pins, the banding integers only the LSH
    * writer pins; anything else (sidecar-less, or a sidecar pinning
    * neither — e.g. a corpus table that only records its id column) is
    * a plain table and must NEVER be compacted in place. */
  private def detectFamily(spark: SparkSession, path: String): String =
    graft.config.Sidecar.readNode(spark,
        new Path(path, graft.config.Sidecar.FileName)) match {
      case Some(n) if n.has("coarse") && n.has("codebooks") => IvfPq
      case Some(n) if n.has("bands") && n.has("parts") => LshBucket
      case _ => Table
    }

  /** (partition columns, leaf dirs, total data files, max files in one
    * leaf) — ONE tree walk, one listing per partition directory,
    * metadata only; threaded through so [[balance]] never re-walks. */
  private def fragmentCensus(spark: SparkSession,
      path: String): (Seq[String], Seq[String], Long, Long) = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (Nil, Nil, 0L, 0L)
    val (partCols, leaves) = IndexCompact.leafParts(fs, root)
    val perDir = leaves.map(rel =>
      IndexCompact.dataFileCount(fs, new Path(root, rel)))
    (partCols, leaves, perDir.sum,
      if (perDir.isEmpty) 0L else perDir.max)
  }

  /** Max/mean leaf row ratio from a partition-column-only aggregate —
    * q308's balance number without reading a data page. */
  private def balance(spark: SparkSession, path: String,
      partCols: Seq[String], leaves: Long): Double = {
    if (leaves == 0L) return Double.NaN
    val hist = spark.read.parquet(path)
      .groupBy(partCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(smax(col("n")).as("mx"), org.apache.spark.sql.functions
        .sum(col("n")).as("total"))
      .collect()(0)
    if (hist.isNullAt(0)) Double.NaN
    else hist.getLong(0).toDouble / (hist.getLong(1).toDouble / leaves)
  }
}
