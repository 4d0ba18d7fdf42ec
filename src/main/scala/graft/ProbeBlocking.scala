package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale probe for the round-5 blocking/attribution family (the
  * ProbeLm sibling for q120/q122): wall time and output cardinality of
  * the blocked fuzzy match and the first-occurrence novelty aggregate
  * on replicated inputs — checking the claimed scale bounds hold:
  *
  *  - q120 fuzzy match: candidate pairs come only from equality blocks
  *    whose SIZE is fixed by the key granularity, so pairs and wall
  *    should grow ~linearly in replicas (more blocks, same block size).
  *    Replicas get fresh key digits, which is exactly how the block
  *    count grows in a real id space.
  *  - q122 novelty: replicas share almost all shingles, so every
  *    shingle's first-occurrence group grows reps-fold — the worst
  *    case for the min(doc_id) aggregate's key skew. Cost should track
  *    exploded-row volume (map-side combine), never pair volume.
  *
  * Usage: runMain graft.ProbeBlocking [sfDir] [replicasCsv]
  */
object ProbeBlocking {
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

    val cust = Tables(spark, sfDir, "customer").select(col("c_custkey"))
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    for (reps <- repsList) {
      // fresh 9-digit id space per replica — block count grows, block
      // size doesn't
      val names = cust
        .select(col("c_custkey"), explode(sequence(lit(0), lit(reps - 1)))
          .as("r"))
        .select(concat(lit("Customer#"),
          lpad((col("c_custkey") * reps + col("r")).cast("string"), 9, "0"))
          .as("name"))
        .withColumn("blk", substring(col("name"), 1, 16))
        .localCheckpoint(true)
      val nNames = names.count()

      val (tFuzzy, nPairs) = time {
        names.as("a").join(names.as("b"),
            col("a.blk") === col("b.blk") &&
              col("a.name") =!= col("b.name") &&
              levenshtein(col("a.name"), col("b.name"), 1) === 1)
          .count()
      }

      val corpus = docs
        .select(col("doc_id"), col("source"), col("text"),
          explode(sequence(lit(0), lit(reps - 1))).as("r"))
        .select((col("doc_id") * reps + col("r")).as("doc_id"),
          col("source"), col("text"))
        .localCheckpoint(true)
      val nDocs = corpus.count()

      val (tNov, nRows) = time {
        val sh = corpus.select(col("doc_id"),
          explode(array_distinct(
            graft.operators.Dedup.shingles(col("text"), 3))).as("sh"))
        val first = sh.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
        sh.join(first, Seq("sh"))
          .groupBy(col("doc_id"))
          .agg(count(when(col("first_doc") === col("doc_id"), 1))
            .as("n_novel"))
          .count()
      }

      println(f"""{"probe":"blocking","reps":$reps,""" +
        f""""n_names":$nNames,"fuzzy_sec":$tFuzzy%.2f,"pairs":$nPairs,""" +
        f""""n_docs":$nDocs,"novelty_sec":$tNov%.2f,"docs_out":$nRows}""")
      names.unpersist()
      corpus.unpersist()
    }
    spark.stop()
  }
}
