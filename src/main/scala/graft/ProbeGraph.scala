package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-family scale probe (the ProbeAnn/ProbeLm sibling for
  * q78/q82/q86): wall time AND actual shuffle-write record counts of
  * the degree-oriented triangle count, 10-round fixed-point PageRank,
  * and 3-round label propagation on replicated part co-occurrence
  * graphs — checking each op's shuffle volume grows edge-linearly and
  * its round count stays constant.
  *
  * Replication is deterministic and DISJOINT: replica r of vertex v
  * gets id v·reps+r, edges duplicated within each copy. Edge and
  * triangle counts scale exactly ×reps while every per-vertex degree —
  * and therefore the π-orientation, the peel/propagation structure,
  * and the iteration count — is identical per copy. That isolates the
  * scaling axis: a super-linear wall or shuffle curve can only be the
  * operator's own join/aggregate shapes, never a change in graph
  * structure.
  *
  * Shuffle rows come from a SparkListener summing
  * `shuffleWriteMetrics.recordsWritten` over completed stages during
  * each timed section (listener-bus delivery is async; each section
  * waits on a short settle sleep after its action returns).
  *
  * Usage: runMain graft.ProbeGraph [sfDir] [replicasCsv]
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repsList = args.lift(1).getOrElse("1,5,25")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleRecs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleRecs.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })

    val (e0, _, _) = Queries.partGraph(spark, sfDir)
    e0.count() // materialize the base graph outside any timed section

    // v·reps+r is a bijection per replica and order-preserving within
    // one (a<b stays a'<b'), so the a<b edge-list invariant holds
    def graphOf(reps: Int): DataFrame = e0
      .select(col("a"), col("b"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .select((col("a") * reps + col("r")).as("a"),
        (col("b") * reps + col("r")).as("b"))
      .localCheckpoint(true)

    def timed(f: => Long): (Double, Long, Long) = {
      Thread.sleep(300) // settle listener bus from previous section
      val r0 = shuffleRecs.get()
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (sec, n, shuffleRecs.get() - r0)
    }

    for (reps <- repsList) {
      val g = graphOf(reps)
      val nEdges = g.count()

      // q78 shape: orientation + wedge join + bloom-prefiltered close
      val (tTri, nTri, sTri) = timed {
        val (_, triangles) = Queries.orientedTriangles(g)
        triangles().collect().head.getLong(0)
      }

      // q82 shape: 10 fixed-point rounds over the doubled directed graph
      val (tPr, nPr, sPr) = timed {
        val edges = g.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(g.select(col("b").as("src"), col("a").as("dst")))
        val nodes = g.select(col("a").as("id"))
          .unionByName(g.select(col("b").as("id"))).distinct()
        graft.operators.Graph.pageRank(nodes, "id", edges, iters = 10)
          .count()
      }

      // q86 shape: 3 synchronous label-propagation rounds
      val (tLpa, nLpa, sLpa) = timed {
        graft.operators.Graph.labelPropagation(
          g.select(col("a").as("src"), col("b").as("dst")), iters = 3)
          .count()
      }

      // q237 shape: 2 HITS rounds — alternating-side joins against the
      // two pre-partitioned edge caches, one normalization per half-round
      val (tHits, nHits, sHits) = timed {
        graft.operators.Graph.hits(
          g.select(col("a").as("src"), col("b").as("dst")), iters = 2)
          .count()
      }

      // q179 shape: 4 frontier BFS rounds from every replica of the
      // lowest 100 base vertices (seed count scales with reps, like
      // the graph — per-copy structure identical)
      val seeds = g.select(col("a").as("id"))
        .unionByName(g.select(col("b").as("id")))
        .filter((col("id") / reps).cast("long") < 100).distinct()
        .localCheckpoint(true)
      val (tBfs, nBfs, sBfs) = timed {
        graft.operators.Graph.bfsRounds(
          g.select(col("a").as("id_a"), col("b").as("id_b")), seeds,
          rounds = 4, assumeDistinct = true).count()
      }

      // q183 shape: 4 weighted min-plus relaxations (unit weights —
      // the relax-join volume, not the weight values, is the axis)
      val (tBf, nBf, sBf) = timed {
        graft.operators.Graph.bellmanFordRounds(
          g.select(col("a").as("id_a"), col("b").as("id_b"),
            lit(1L).as("w")), seeds, rounds = 4).count()
      }

      println(f"""{"probe":"graph","reps":$reps,"n_edges":$nEdges,""" +
        f""""tri_sec":$tTri%.2f,"n_triangles":$nTri,"tri_shuffle_rows":$sTri,""" +
        f""""pr_sec":$tPr%.2f,"pr_nodes":$nPr,"pr_shuffle_rows":$sPr,""" +
        f""""lpa_sec":$tLpa%.2f,"lpa_nodes":$nLpa,"lpa_shuffle_rows":$sLpa,""" +
        f""""hits_sec":$tHits%.2f,"hits_nodes":$nHits,"hits_shuffle_rows":$sHits,""" +
        f""""bfs_sec":$tBfs%.2f,"bfs_nodes":$nBfs,"bfs_shuffle_rows":$sBfs,""" +
        f""""bf_sec":$tBf%.2f,"bf_nodes":$nBf,"bf_shuffle_rows":$sBf}""")
    }
    spark.stop()
  }
}
