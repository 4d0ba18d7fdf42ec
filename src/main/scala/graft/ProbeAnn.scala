package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** ANN scale probe (the round-4 LSH/CC probes' missing sibling): recall
  * and wall time of the two approximate kNN paths (sign-LSH q38, IVF
  * q42) against brute force (q37) on a 25×-replicated embedding corpus.
  *
  * Replication is deterministic: replica r of vector v gets id
  * v·25+r and a per-(replica, dim) perturbation of ±0.009 — a corpus
  * with heavy near-duplicate cluster structure (the realistic hard case
  * for bucketed ANN: clusters concentrate buckets) while every vector
  * stays distinct so top-k is unambiguous under the (cos desc, id asc)
  * tie-break both paths share.
  *
  * Candidate-set sizes are measured by running each ANN path with
  * k=MaxValue (the ranked output below the cut IS the candidate set),
  * so the collision-bound claim is observed, not asserted.
  *
  * Usage: runMain graft.ProbeAnn [sfDir] [replicas]
  */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, sfDir, "embeddings")
    if (args.lift(2).contains("drillonly")) {
      drill(spark, base); spark.stop(); return
    }
    val corpus = base
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .select((col("vec_id") * reps + col("r")).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          (x + ((col("r") * 31 + j) % 7 - 3).cast("float") * lit(0.003f))
            .cast("float")).as("embedding"))
      .localCheckpoint(true)
    val queries = corpus.filter(col("vec_id") % reps === 0 &&
      col("vec_id") < 20 * reps).localCheckpoint(true)
    val nC = corpus.count()
    val nQ = queries.count()
    println(s"[probe] corpus=$nC queries=$nQ reps=$reps")

    def timed(label: String)(df: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = df.localCheckpoint(true)
      println(f"[probe] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      out
    }

    val brute = timed("brute") {
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
    }
    val lsh = timed("lsh") {
      Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 64, 10,
        bits = 6, tables = 16)
    }
    val ivf = timed("ivf") {
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 10,
        nlist = 16, nprobe = 4)
    }
    // the q293 path: PQ-encode, ADC scan, exact re-rank on a shortlist
    // sized 5·k — recall measures how much the 12-bit code + 50-deep
    // shortlist loses vs the exact scan
    val adc = timed("pq-adc") {
      Similarity.pqAdcTopK(corpus, queries, "vec_id", "embedding",
        dim = 64, m = 4, kCodes = 8, rounds = 1, shortlist = 50, k = 10)
    }
    // SCAN-ONLY wall: the deployment shape — codebooks trained and the
    // corpus PQ-encoded ONCE (the stored index; untimed build below),
    // each query batch pays only LUTs + fused-ADC scan + re-rank. This
    // is the apples-to-apples comparison against brute (which has no
    // build): the monolithic pq-adc timing above re-trains and
    // re-encodes per call, which a real pipeline never does.
    val books = Similarity.pqTrain(corpus, "vec_id", "embedding",
      dim = 64, m = 4, kCodes = 8, rounds = 1)
    val encodedIdx = Similarity.pqEncode(corpus, "vec_id", "embedding",
      books).localCheckpoint(true) // eager: materialized before timing
    val adcScan = timed("adc-scan") {
      Similarity.pqAdcScan(encodedIdx, queries, "vec_id", "embedding",
        books, shortlist = 50, k = 10)
    }

    // the q295 composition: cell pruning × code scoring — recall can
    // only drop vs pq-adc (the probed cells bound the candidate set)
    val ivfpq = timed("ivf-pq") {
      Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
        dim = 64, m = 4, kCodes = 8, rounds = 1, nlist = 16, nprobe = 4,
        shortlist = 50, k = 10)
    }

    def recall(ann: DataFrame): Double =
      brute.select("query_id", "neighbor_id")
        .join(ann.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count().toDouble / (nQ * 10)
    println(f"[probe] recall@10 lsh=${recall(lsh)}%.3f " +
      f"ivf=${recall(ivf)}%.3f pq-adc=${recall(adc)}%.3f " +
      f"adc-scan=${recall(adcScan)}%.3f ivf-pq=${recall(ivfpq)}%.3f")

    // recall-vs-shortlist-depth curve (r8 verdict item 5): a FIXED
    // depth decays as the corpus grows; the scale-aware depth
    // (ivfPqShortlist — constant fraction of the candidate volume)
    // should hold recall at the 0.95 operating point while only the
    // exact re-rank gets deeper. Wall per depth shows that re-rank
    // cost directly.
    val derived = Similarity.ivfPqShortlist(nC, nlist = 16, nprobe = 4,
      k = 10)
    for (s <- Seq(50, derived, 2 * derived).distinct.sorted) {
      val d = timed(f"ivf-pq@$s") {
        Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
          dim = 64, m = 4, kCodes = 8, rounds = 1, nlist = 16, nprobe = 4,
          shortlist = s, k = 10)
      }
      val tag = if (s == derived) " (derived)" else ""
      println(f"[probe] recall@10 ivf-pq shortlist=$s$tag: ${recall(d)}%.3f")
    }

    // candidate-set sizes: k=MaxValue keeps every scored candidate
    val lshCands = Similarity.lshTopK(corpus, queries, "vec_id",
      "embedding", 64, Int.MaxValue, bits = 6, tables = 16).count()
    val ivfCands = Similarity.ivfTopK(corpus, queries, "vec_id",
      "embedding", Int.MaxValue, nlist = 16, nprobe = 4).count()
    println(s"[probe] candidates lsh=$lshCands " +
      s"(${lshCands / nQ}/query of $nC) ivf=$ivfCands " +
      s"(${ivfCands / nQ}/query, nprobe/nlist bound=${nC * 4 / 16})")

    // STORED serving index (r9 verdict item 1): the deployment shape —
    // writeIvfPqIndex once per corpus version (timed separately as the
    // build), ivfPqScanStored per query batch. Run this probe at
    // several `reps` to see the per-batch scan wall and the
    // scanned-file fraction track nprobe/nlist while the corpus grows.
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_probe_ivfpq").toString
    val tB = System.nanoTime()
    Similarity.writeIvfPqIndex(corpus, idxDir, "vec_id", "embedding",
      dim = 64, m = 4, kCodes = 8, rounds = 1, nlist = 16)
    println(f"[probe] stored-build ${(System.nanoTime() - tB) / 1e9}%.2fs")
    val stored = timed("stored-scan") {
      Similarity.ivfPqScanStored(spark, idxDir, queries, "vec_id",
        "embedding", nprobe = 4, k = 10)
    }
    println(f"[probe] recall@10 stored-scan=${recall(stored)}%.3f " +
      "(derived shortlist)")
    // file-level pruning: data files under the probed cell dirs vs the
    // whole index — the scan I/O a partition filter actually admits
    val cells = Similarity.storedProbedCells(spark, idxDir, queries,
      "embedding", nprobe = 4).toSet
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(idxDir), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val p = it.next().getPath.toString
        if (p.endsWith(".parquet")) b += p
      }
      b.result()
    }
    val touchedFiles =
      files.count(p => cells.exists(c => p.contains(s"/cell=$c/")))
    println(s"[probe] stored-index files=${files.size} " +
      s"scanned=$touchedFiles probedCells=${cells.size}/16")
    // a 20-query batch probes most cells by sheer union; a single
    // query shows the pruning bound itself: nprobe(=4)/nlist(=16) of
    // the files, whatever the corpus size
    val one = queries.limit(1)
    val oneCells = Similarity.storedProbedCells(spark, idxDir, one,
      "embedding", nprobe = 4).toSet
    val oneFiles =
      files.count(p => oneCells.exists(c => p.contains(s"/cell=$c/")))
    val oneScan = timed("stored-scan1") {
      Similarity.ivfPqScanStored(spark, idxDir, one, "vec_id",
        "embedding", nprobe = 4, k = 10)
    }
    println(s"[probe] single-query scan: files=${oneFiles}/" +
      s"${files.size} cells=${oneCells.size}/16 " +
      s"rows=${oneScan.count()}")

    // scan ADMISSION (r11 verdict item 5): the pre-scan volume gate —
    // per-query cell-size sums over the batch's probed cell dirs, a
    // zero-data-column footer count over ONLY those dirs. The wall
    // should stay near-flat as the corpus grows (metadata, not data);
    // the estimates themselves grow with the corpus, which is the
    // point — the gate sees the 100× scan coming before it runs.
    val admission = timed("admission") {
      Similarity.scanAdmission(spark, idxDir, queries, "vec_id",
        "embedding", nprobe = 4, budget = nC / 2)
    }
    val admStats = admission
      .agg(min(col("est_rows")), max(col("est_rows")),
        sum(when(!col("admit"), 1L).otherwise(0L)))
      .collect()(0)
    println(s"[probe] admission est_rows=[${admStats.getLong(0)}, " +
      s"${admStats.getLong(1)}] quarantined=${admStats.getLong(2)}/$nQ " +
      s"(budget=${nC / 2})")

    // hot-cell skew (r9 verdict item 4): the per-cell row histogram of
    // the stored index — the cell equi-join sends each cell to one
    // shuffle partition, so the max/mean ratio here IS the straggler
    // ratio a skewed corpus inflicts on the scan.
    val hist = spark.read.parquet(idxDir).groupBy("cell")
      .agg(count(lit(1)).as("n")).orderBy(col("n").desc)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val mean = hist.map(_._2).sum.toDouble / hist.length
    println(s"[probe] cell histogram (top 5): " +
      hist.take(5).map { case (c, n) => s"$c=$n" }.mkString(" ") +
      f" | mean=$mean%.0f max/mean=${hist.head._2 / mean}%.2f " +
      s"cells=${hist.length}")

    // index maintenance: appending a batch must cost ∝ |batch| (encode
    // under the frozen sidecar model + append into probed cell dirs) —
    // the ANN sibling of ProbeIncremental's bucket-index append curve.
    // The batch reuses the query vectors under fresh high ids.
    val annBatch = queries.select((col("vec_id") + lit(1L << 41))
      .as("vec_id"), col("embedding"))
    val tA = System.nanoTime()
    Similarity.appendToIvfPqIndex(spark, idxDir, annBatch, "vec_id",
      "embedding")
    println(f"[probe] stored-append ${(System.nanoTime() - tA) / 1e9}%.2fs " +
      s"(batch=$nQ)")

    // takedown: deleting a fixed batch rewrites only the cell dirs
    // that hold one of its vectors (each vector lives in exactly one
    // cell) — the removal sibling of the append curve. The only
    // corpus-scale work is the column-pruned (cell, id) scan; the
    // post-delete batch scan keeps its pruned wall.
    val doomedAnn = corpus.filter(col("vec_id") % 97 === 5)
      .select("vec_id")
    val tD = System.nanoTime()
    val (delRows, delDirs) =
      Similarity.deleteFromIvfPqIndex(spark, idxDir, doomedAnn)
    println(f"[probe] stored-delete ${(System.nanoTime() - tD) / 1e9}%.2fs " +
      s"(rows=$delRows dirs=$delDirs/16)")
    val postDel = timed("scan-post-del") {
      Similarity.ivfPqScanStored(spark, idxDir, queries, "vec_id",
        "embedding", nprobe = 4, k = 10)
    }
    println(s"[probe] post-delete scan rows=${postDel.count()} " +
      s"(deleted ids can no longer be neighbors)")

    // drift-triggered rebuild drill (r10 verdict stretch item 8):
    // q307's coarseDriftStats is the retrain TRIGGER; this exercises
    // the DECISION. Per round, append a progressively SHIFTED batch
    // (a real distribution move: a growing constant added to the first
    // 16 dims) to an index maintained under the FROZEN build-time
    // model, and report (a) the weighted mean drift the monitor sees,
    // (b) recall@10 of the stale maintained index for the NEW traffic
    // (the round's shifted vectors), and (c) recall@10 after a rebuild
    // (writeIvfPqIndex over build ∪ appended — retrained model), both
    // against a brute-force ground truth over the same grown corpus.
    // The expected shape — drift rises with the shift, stale recall
    // decays, rebuilt recall recovers — is the evidence the
    // drift-threshold rebuild policy stands on. The drill runs at BASE
    // scale (the shift, not the corpus size, is the variable) — pass
    // "nodrill" as arg 3 to skip it on replicated-corpus runs, or
    // "drillonly" to run just the drill.
    if (!args.lift(2).contains("nodrill")) drill(spark, base)
    new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(idxDir), true)
    spark.stop()
  }

  /** The drift-drill stage (see main): exercises the REBUILD DECISION
    * q307's drift monitor exists to gate. Per round, a growing slice of
    * the corpus is re-encoded as genuinely SHIFTED traffic (a constant
    * offset on the first 16 dims — a distribution move, appended under
    * the FROZEN build-time model), and the drill measures, for the
    * round's NEW traffic against brute-force truth over the grown
    * corpus: the monitor's appended-weighted mean drift, recall@10 of
    * the stale maintained index, of a SAME-capacity rebuild, and of a
    * CAPACITY-SCALED rebuild (nlist and kCodes doubled, nprobe kept at
    * the same probed fraction).
    *
    * Why three arms: five drill designs measured while building this
    * (constant shifts, decorrelated reversed traffic, tight new
    * clusters, isotropic raw vectors, tight+shallow shortlist) all
    * agree that the frozen ASSIGNMENT almost never scatters true
    * neighbors — argmax is deterministic, so close vectors co-assign
    * under any fixed model, and tight new clusters scan at recall
    * 1.000 stale. What actually decays as shifted mass grows is
    * quantization RESOLUTION spread over a wider support — which a
    * same-capacity retrain cannot recover (measured equal-or-worse
    * than stale) and a capacity-scaled rebuild can. The monitor's
    * drift is therefore a CAPACITY trigger, not a mere retrain
    * trigger: rebuild bigger, not just fresher. */
  private def drill(spark: SparkSession, base: DataFrame): Unit = {
    val drillBase = base.select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val drillIdx = java.nio.file.Files
      .createTempDirectory("graft_probe_drill").toString
    Similarity.writeIvfPqIndex(drillBase, drillIdx, "vec_id",
      "embedding", dim = 64, m = 8, kCodes = 32, rounds = 2, nlist = 16)
    val nBase = drillBase.count()
    var grown = drillBase
    var appendedAll: DataFrame = null
    for (round <- 1 to 4) {
      // shifted traffic: quarter r of the corpus re-encoded with a
      // constant +1.0 on the first 16 dims (vector components are
      // ~N(0, 0.125), so this is a large, realistic embedding-space
      // move — new encoder, new domain), under fresh high ids
      val batch = drillBase
        .filter(col("vec_id") % 4 === (round - 1) % 4)
        .select((col("vec_id") + lit(round.toLong << 41)).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            when(j < 16, x + lit(1.0f)).otherwise(x).cast("float"))
            .as("embedding"))
        .localCheckpoint(true)
      Similarity.appendToIvfPqIndex(spark, drillIdx, batch, "vec_id",
        "embedding")
      grown = grown.unionByName(batch).localCheckpoint(true)
      appendedAll = (if (appendedAll == null) batch
        else appendedAll.unionByName(batch)).localCheckpoint(true)
      // the monitor's number: appended-weighted mean per-cell drift
      val driftRow = Similarity.coarseDriftStats(drillBase, appendedAll,
          "vec_id", "embedding", nlist = 16, rounds = 2)
        .where(col("drift").isNotNull)
        .agg((sum(col("drift") * col("n_new")) / sum(col("n_new")))
          .as("d")).collect()(0)
      val drift = if (driftRow.isNullAt(0)) 0.0 else driftRow.getDouble(0)
      // new traffic = this round's shifted vectors (50 of them —
      // 500 recall samples/arm keeps the curve above the +-0.03 noise
      // a 20-query estimate showed)
      val newQ = batch.orderBy("vec_id").limit(50).localCheckpoint(true)
      val truth = Similarity.bruteForceTopK(grown, newQ, "vec_id",
        "embedding", 10).localCheckpoint(true)
      def recallOf(ann: DataFrame): Double =
        truth.select("query_id", "neighbor_id")
          .join(ann.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id")).count().toDouble /
          truth.count()
      val stale = recallOf(Similarity.ivfPqScanStored(spark, drillIdx,
        newQ, "vec_id", "embedding", nprobe = 8, k = 10,
        shortlist = 256))
      def rebuildArm(nlist: Int, nprobe: Int, kCodes: Int): Double = {
        val rbIdx = java.nio.file.Files
          .createTempDirectory("graft_probe_drill_rb").toString
        Similarity.writeIvfPqIndex(grown, rbIdx, "vec_id", "embedding",
          dim = 64, m = 8, kCodes = kCodes, rounds = 2, nlist = nlist)
        val r = recallOf(Similarity.ivfPqScanStored(spark, rbIdx, newQ,
          "vec_id", "embedding", nprobe = nprobe, k = 10,
          shortlist = 256))
        new org.apache.hadoop.fs.Path(rbIdx)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(rbIdx), true)
        r
      }
      val rebuiltSame = rebuildArm(nlist = 16, nprobe = 8, kCodes = 32)
      val rebuiltScaled = rebuildArm(nlist = 32, nprobe = 16, kCodes = 64)
      println(f"[probe] drill round=$round " +
        f"appended=${appendedAll.count()}/$nBase drift=$drift%.4f " +
        f"recall stale=$stale%.3f rebuilt-same=$rebuiltSame%.3f " +
        f"rebuilt-scaled=$rebuiltScaled%.3f (brute=1.000)")
    }
    new org.apache.hadoop.fs.Path(drillIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(drillIdx), true)
  }
}
