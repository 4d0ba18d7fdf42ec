package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale probe for the exact similarity-join family (q182/q185's
  * `Dedup.similarityJoinPrefix` — the ProbeBlocking sibling): wall
  * time, candidate volume, and output pairs on replicated corpora,
  * checking the PPJoin prefix filter's claimed scale bound.
  *
  * Replicas get a SALTED token space (every token prefixed with the
  * replica id via one regexp_replace), which models how a larger crawl
  * actually grows: more documents AND proportionally more vocabulary,
  * with per-token posting lists staying bounded. Under that model the
  * document-frequency table, the prefix index, the candidate
  * equi-join, and the verified pair set should all grow LINEARLY in
  * replicas — same per-block structure, more blocks. (Replicating
  * WITHOUT salting instead grows every posting list reps-fold and the
  * true-duplicate pair set quadratically — a different question, about
  * duplicate pile-up, answered by ProbeLm's span worst case and the
  * q52 component probe.)
  *
  * Usage: runMain graft.ProbeSim [sfDir] [replicasCsv]
  */
object ProbeSim {
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

    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    for (reps <- repsList) {
      val corpus = docs
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(reps - 1))).as("r"))
        .select((col("doc_id") * reps + col("r")).as("doc_id"),
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("r"), col("r").cast("string"), lit("_$1")))
            .as("text"))
        .localCheckpoint(true)
      val nDocs = corpus.count()

      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.similarityJoinPrefix(
        corpus, "text", "doc_id", n = 2, tauNum = 3, tauDen = 5)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9

      println(f"""{"probe":"simjoin","reps":$reps,"n_docs":$nDocs,""" +
        f""""sec":$sec%.2f,"pairs":$pairs}""")
      corpus.unpersist()
    }
    spark.stop()
  }
}
