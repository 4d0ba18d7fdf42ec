package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, lit, sum}

import graft.operators.Dedup
import graft.sinks.{ComplianceLog, PartitionedSink, QuarantineStore}
import graft.streaming.Streaming

/** The ops story's CAPSTONE (r15, r14 verdict item 5): one simulated
  * "compliance quarter" chaining every individually-proven piece —
  * four takedown streams (LSH index, SimHash index, two corpus
  * materializations) and a multi-table TTL cron all writing ONE
  * ledger, admission-gated ingestion quarantining into a pinned
  * store, crash injections at three DIFFERENT protocol stages (the
  * TTL sweep's manifest, the delete's swap manifest, the ledger
  * append's rename), evidence compaction over the replay horizon —
  * closed by one [[ComplianceLog.audit]] whose full grid must show
  * zero unexpected gaps and EXACT counts, verified against an
  * independent driver-side replay of every delete (the simulation is
  * the spec's own oracle: it never reads a callback or a ledger).
  *
  * The point of chaining rather than re-testing: the pieces interact
  * (a TTL sweep removes rows a later takedown would otherwise count;
  * a crashed sweep's recovery runs under the NEXT slot's window; the
  * crashed delete's evidence must survive into the same grid the
  * live deletes fill), and the grid is only exact if every seam
  * holds at once. */
class ComplianceQuarterSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(p: String): String = {
    val d = java.nio.file.Files.createTempDirectory(p)
    d.toFile.deleteOnExit(); d.toString
  }

  test("compliance quarter: 4 takedown streams + TTL cron + " +
    "quarantine + 3 crash stages + fold → one exact audit grid") {
    implicit val sqlCtx = spark.sqlContext
    val hfs = new Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"source")
      .localCheckpoint(true)
    def srcNum(s: String) = s.stripPrefix("src").toInt
    val docSrc = docs.select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> srcNum(r.getString(1))).toMap
    def batchIds(r: Int): Set[Long] = docSrc.keySet.filter(_ % 10 == r)
    val (b0, b1, b2) = (batchIds(2), batchIds(7), batchIds(4))

    // ---- independent replay (the spec's oracle): one survivor map
    // per corpus table; both tables see the same timeline so one map
    // serves both, with every count doubled at the grid.
    var surviving = docSrc
    def simTakedown(ids: Set[Long]): (Long, Long) = {
      val hit = surviving.view.filterKeys(ids).toMap
      surviving --= hit.keys
      (hit.size.toLong, hit.values.toSet.size.toLong)
    }
    def simTtl(maxExcl: Int): (Long, Long) = {
      val doomed = surviving.filter(_._2 < maxExcl)
      surviving --= doomed.keys
      (doomed.size.toLong, doomed.values.toSet.size.toLong)
    }

    // ---- fixtures: two corpus materializations, two index families,
    // one ledger, one quarantine store
    val ledger = tmpDir("cq-ledger")
    def mkCorpus(tag: String): String = {
      val t = tmpDir(s"cq-$tag")
      docs.repartition(col("source"))
        .write.mode("overwrite").partitionBy("source").parquet(t)
      t
    }
    val (primary, archive) = (mkCorpus("primary"), mkCorpus("archive"))
    // indexes are built WITHOUT the %10==9 slice — that slice is the
    // quarter's new-arrivals stream, quarantined then re-admitted below
    val indexed = docs.select($"doc_id", $"text")
      .where($"doc_id" % 10 =!= 9).localCheckpoint(true)
    val lshIdx = tmpDir("cq-lsh")
    Dedup.writeBucketIndex(indexed, lshIdx, "text", "doc_id",
      parts = 16)
    val shIdx = tmpDir("cq-simhash")
    Dedup.writeSimhashIndex(indexed, shIdx, "text", "doc_id",
      parts = 16)

    // ---- four takedown streams, one ledger
    val (cpLsh, cpSh, cpP, cpA) = (tmpDir("cq-cp-lsh"),
      tmpDir("cq-cp-sh"), tmpDir("cq-cp-p"), tmpDir("cq-cp-a"))
    // concurrent: four stream-execution threads report through this
    val calls =
      scala.collection.concurrent.TrieMap
        .empty[(String, Long), (Long, Long)]
    def track(tag: String)(r: Long, d: Long, id: Long): Unit =
      calls((tag, id)) = (r, d)
    val memLsh = MemoryStream[Long]; val memSh = MemoryStream[Long]
    val memP = MemoryStream[Long]; val memA = MemoryStream[Long]
    val qLsh = Streaming.takedownMaintenanceStream(
      memLsh.toDF().toDF("doc_id"), lshIdx, cpLsh,
      Some(ledger))(track("lsh"))
    val qSh = Streaming.simhashTakedownStream(
      memSh.toDF().toDF("doc_id"), shIdx, cpSh,
      Some(ledger))(track("sh"))
    val qP = Streaming.corpusTakedownStream(memP.toDF().toDF("doc_id"),
      primary, "doc_id", cpP, Some(ledger))(track("p"))
    val qA = Streaming.corpusTakedownStream(memA.toDF().toDF("doc_id"),
      archive, "doc_id", cpA, Some(ledger))(track("a"))
    val streams = Seq(qLsh, qSh, qP, qA)
    def sendAll(ids: Set[Long]): Unit = {
      val s = ids.toSeq
      memLsh.addData(s: _*); memSh.addData(s: _*)
      memP.addData(s: _*); memA.addData(s: _*)
      streams.foreach(_.processAllAvailable())
    }

    // ======== the quarter ========
    // week 0: takedown batch 0 lands everywhere
    sendAll(b0)
    val (tdRows0, tdDirs0) = simTakedown(b0)
    // week 1: TTL slot 1 ages out sources < 3 on both tables — src2's
    // directory is ALREADY gone (batch 0 emptied it), so the sweep
    // drops only src0/src1: the takedown→TTL interaction
    val pred1 = col("source").substr(4, 10).cast("int") < 3
    val slot1 = graft.operators.Maintenance.runAll(spark,
      Seq(primary, archive), maxFilesPerDir = 64, ttl = Some(pred1),
      evidence = Some((ledger, 1L))).toMap
    val (ttlRows1, ttlDirs1) = simTtl(3)
    assert(ttlDirs1 === 2L,
      "batch 0 must have emptied src2 before the sweep saw it")
    assert(slot1(primary).ttlRowsDropped === ttlRows1,
      "simulation and live slot-1 sweep must agree")
    // week 2: takedown batch 1
    sendAll(b1)
    val (tdRows1, tdDirs1) = simTakedown(b1)
    // CRASH STAGE A — slot 2's sweep on PRIMARY dies after its
    // _graft_ttl_sweep.json commit (counts measured, ledger line and
    // deletes lost). The next runAll of the SAME slot must complete
    // it with the ORIGINAL counts and surface the skip.
    val doomedSrcs = spark.read.parquet(primary)
      .select($"source").distinct().as[String].collect()
      .filter(s => srcNum(s) < 8).sorted
    val doomedA = spark.read.parquet(primary)
      .where(col("source").isin(doomedSrcs: _*))
    val (rowsA, dirsA) = (doomedA.count(), doomedSrcs.length.toLong)
    val linP = ComplianceLog.tableLineage(spark, primary)
    locally {
      val node = graft.config.Sidecar.newNode()
      node.put("ledger", ledger); node.put("target", "ttl-sweep")
      node.put("table", primary); node.put("lineage", linP)
      node.put("batch", 2L); node.put("rows", rowsA)
      node.put("dirs", dirsA)
      val arr = node.putArray("doomed")
      doomedSrcs.foreach(s => arr.add(s"source=$s"))
      graft.config.Sidecar.writeNode(spark,
        new Path(primary, "_graft_ttl_sweep.json"), node)
    }
    val pred2 = col("source").substr(4, 10).cast("int") < 8
    val slot2 = graft.operators.Maintenance.runAll(spark,
      Seq(primary, archive), maxFilesPerDir = 64, ttl = Some(pred2),
      evidence = Some((ledger, 2L)), parallelism = 2).toMap
    assert(!slot2(primary).ttlEvidenceRecorded,
      "recovery already recorded the crashed sweep's line — the " +
        "retried window must surface the skip")
    assert(slot2(archive).ttlEvidenceRecorded)
    val (ttlRows2, ttlDirs2) = simTtl(8)
    assert(rowsA === ttlRows2 && dirsA === ttlDirs2,
      "the crashed manifest's counts must equal the replay's")
    assert(ttlDirs2 === 4L,
      "batch 1 must have emptied src7 before slot 2 saw it")
    // CRASH STAGE B — a ledger append from 2h ago died between its
    // parquet write and the rename (epoch-stamped inflight); a live
    // writer's fresh inflight coexists. The next window's shared heal
    // must sweep exactly the stale one.
    val now = System.currentTimeMillis()
    val staleInf = new Path(ledger,
      s".inflight-ts${now - 2L * 3600 * 1000}-corpus-dead-9.parquet")
    val liveInf = new Path(ledger,
      s".inflight-ts$now-corpus-live-9.parquet")
    hfs.mkdirs(staleInf); hfs.mkdirs(liveInf)
    // CRASH STAGE C — batch 2's delete on the LSH index dies the
    // instant after its swap-manifest commit (evidence riding it),
    // before the ledger append and the renames: rebuild that exact
    // on-disk state, then let the restarted stream's replay heal it.
    val idxAll = spark.read.parquet(lshIdx).localCheckpoint(true)
    val b2Seq = b2.toSeq
    val doomedIdx = idxAll.where(col("doc_id").isin(b2Seq: _*))
      .localCheckpoint(true)
    val rowsC = doomedIdx.count()
    val touchedC = doomedIdx.select($"bpart".cast("int")).distinct()
      .as[Int].collect().sorted
    locally {
      val root = new Path(lshIdx)
      val tmp = new Path(root.getParent, root.getName + ".delete_tmp")
      val kept = idxAll
        .where(col("bpart").isin(touchedC.map(Int.box): _*) &&
          !col("doc_id").isin(b2Seq: _*))
        .localCheckpoint(true)
      kept.repartition(col("bpart"))
        .write.mode("overwrite").partitionBy("bpart")
        .parquet(tmp.toString)
      val keptParts = kept.select($"bpart".cast("int")).distinct()
        .as[Int].collect().toSet
      val m = graft.config.Sidecar.newNode()
      val rep = m.putArray("replace")
      touchedC.filter(keptParts).foreach(p => rep.add(s"bpart=$p"))
      val rem = m.putArray("remove")
      touchedC.filterNot(keptParts).foreach(p => rem.add(s"bpart=$p"))
      val ev = m.putObject("evidence")
      ev.put("v", 1)
      ev.put("ledger", ledger); ev.put("target", "lsh-index")
      ev.put("table", lshIdx)
      ev.put("lineage", Streaming.canonicalLineage(spark, cpLsh))
      ev.put("batch", 2L); ev.put("rows", rowsC)
      ev.put("dirs", touchedC.length.toLong)
      graft.config.Sidecar.writeNode(spark,
        new Path(tmp, graft.operators.IndexCompact.SwapManifest), m)
    }
    // week 3: batch 2 lands — the LSH stream's replay self-heals
    // stage C first (re-emitting the manifest's evidence), then finds
    // nothing left; the other three streams delete live
    sendAll(b2)
    val (tdRows2, tdDirs2) = simTakedown(b2)
    assert(tdRows2 < b2.size,
      "slot 2 must have aged out src4 before batch 2 hit it — the " +
        "TTL→takedown interaction")
    assert(calls(("lsh", 2L)) === ((0L, 0L)),
      "the replayed batch must find the rolled-forward index empty " +
        "of its ids")
    // week 4: TTL slot 3 — its window heal sweeps stage B's stale
    // inflight and spares the live one, and the slot FOLDS the
    // replay-passed ledger names in the same window (r16: the
    // ledgerFoldHorizon knob — the fold the scaladoc says to run "at
    // least quarterly", wired into the cron instead of hand-run; the
    // audit below reads the POST-fold ledger, so every exact-count
    // assert doubles as fold invariance against the replay)
    val pred3 = col("source").substr(4, 10).cast("int") < 12
    val slot3 = graft.operators.Maintenance.runAll(spark,
      Seq(primary, archive), maxFilesPerDir = 64, ttl = Some(pred3),
      evidence = Some((ledger, 3L)), ledgerFoldHorizon = Some(2L)).toMap
    val (ttlRows3, ttlDirs3) = simTtl(12)
    assert(!hfs.exists(staleInf), "stage B: stale inflight swept")
    assert(hfs.exists(liveInf), "stage B: live inflight spared")
    hfs.delete(liveInf, true)
    assert(hfs.exists(new Path(ledger, "compacted-1.parquet")),
      "slot 3's window must have folded the replay-passed names")
    // ---- admission-gated ingestion with quarantine: a batch the
    // gate rejects wholesale lands in the PINNED store exactly once,
    // then re-admits through the documented plain append
    val ingest = docs.select($"doc_id", $"text")
      .where($"doc_id" % 10 === 9).localCheckpoint(true)
    val nIngest = ingest.count()
    val store = tmpDir("cq-quarantine")
    val memQ = MemoryStream[(Long, String)]
    val cpQ = tmpDir("cq-cp-q")
    val qQ = Streaming.simhashMaintenanceStream(
      memQ.toDF().toDF("doc_id", "text"), "text", "doc_id", shIdx,
      cpQ, admitBudget = -1L, quarantineStore = Some(store)) {
      (_, _) => ()
    }
    memQ.addData(ingest.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
    qQ.processAllAvailable(); qQ.stop()
    val held = QuarantineStore.read(spark, store).get
    assert(held.count() === nIngest)
    assert(held.columns.contains("est_candidates"))
    Dedup.appendToSimhashIndex(spark, shIdx,
      held.select($"doc_id", $"text"), "text")
    assert(spark.read.parquet(shIdx)
      .where(col("doc_id") % 10 === 9).count() === nIngest * 4,
      "re-admitted docs must land their banded rows in the index")
    streams.foreach(_.stop())

    // ======== the audit: full grid, exact counts, zero surprises ====
    val grid = (
      Seq("lsh-index", "simhash-index")
        .flatMap(t => (0L to 2L).map((t, _))) ++
      (0L to 3L).map(("corpus", _)) ++
      (0L to 3L).map(("ttl-sweep", _))).toDF("target", "batch_id")
    def auditMap(): Map[(String, Long), (Long, Long, Long)] =
      ComplianceLog.audit(spark, ledger, grid).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val got = auditMap()
    // index cells: one lineage each; every batch doc sheds its 4 band
    // rows, TTL never touches an index — including the CRASHED batch,
    // whose line must carry the manifest's real counts
    for ((t, sizes) <- Seq("lsh-index" -> rowsC,
        "simhash-index" -> (b2.size * 4L))) {
      assert(got((t, 0L))._1 === 1L)
      assert(got((t, 0L))._2 === b0.size * 4L, s"$t batch 0")
      assert(got((t, 1L))._2 === b1.size * 4L, s"$t batch 1")
      assert(got((t, 2L))._2 === sizes, s"$t batch 2")
    }
    assert(rowsC === b2.size * 4L,
      "stage C's manifest counts equal the live delete's by replay")
    // corpus cells: TWO lineages (primary + archive) per cell — the
    // aggregate contract — with counts 2× the simulation's replay
    for ((b, (r, d)) <- Seq(0L -> ((tdRows0, tdDirs0)),
        1L -> ((tdRows1, tdDirs1)), 2L -> ((tdRows2, tdDirs2)))) {
      assert(got(("corpus", b)) === ((2L, 2L * r, 2L * d)),
        s"corpus batch $b")
      assert(calls(("p", b)) === ((r, d)),
        s"simulation must agree with the live corpus delete, batch $b")
    }
    // ttl cells: two lineages per slot; slot 2's primary line is the
    // CRASHED sweep's (stage A), completed with original counts
    assert(got(("ttl-sweep", 1L)) === ((2L, 2L * ttlRows1,
      2L * ttlDirs1)))
    assert(got(("ttl-sweep", 2L)) === ((2L, 2L * ttlRows2,
      2L * ttlDirs2)))
    assert(got(("ttl-sweep", 3L)) === ((2L, 2L * ttlRows3,
      2L * ttlDirs3)))
    // gap cells: the slots that never ran surface, they don't vanish
    assert(got(("corpus", 3L)) === ((0L, -1L, -1L)))
    assert(got(("ttl-sweep", 0L)) === ((0L, -1L, -1L)))
    // ======== chain re-fold at a later horizon: still invariant ====
    // (slot 3's in-window fold already consolidated ids < 2 — the
    // audit above read the post-fold ledger; this second fold folds
    // that consolidation itself plus the id-2 names into a new chain
    // head, the years-of-deployment shape)
    val totalPre = ComplianceLog.read(spark, ledger)
      .agg(count(lit(1)), sum($"rows_deleted")).collect()(0)
    val (ff, _) = ComplianceLog.compactBefore(spark, ledger, 3L)
    assert(ff > 2L, "the re-fold must fold the chain head + id-2 names")
    assert(auditMap() === got,
      "evidence compaction must never change what the audit reads")
    val totalPost = ComplianceLog.read(spark, ledger)
      .agg(count(lit(1)), sum($"rows_deleted")).collect()(0)
    assert(totalPre === totalPost)
  }
}
