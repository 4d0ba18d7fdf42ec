package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** LM-pipeline scale probe (the ProbeAnn sibling for the q90/q92/q94
  * family): wall time of the bigram-LM scoring join, the sequence-
  * packing prefix sum, and the repeated-span aggregate on replicated
  * document corpora — checking each op's cost grows like its shuffle
  * volume, not worse.
  *
  * Replication is deterministic: replica r of doc d gets id d·reps+r
  * and a per-replica token prefix ("rtag<r>") so the corpus grows
  * linearly while the bigram/shingle vocabulary stays realistic
  * (replicas share almost all spans — the worst case for the span
  * aggregate's key skew, since every repeated span's group grows
  * reps-fold).
  *
  * Usage: runMain graft.ProbeLm [sfDir] [replicasCsv]
  */
object ProbeLm {
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

    val base = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))

    def corpusOf(reps: Int): DataFrame = base
      .select(col("doc_id"), col("lang"), col("text"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .select((col("doc_id") * reps + col("r")).as("doc_id"), col("lang"),
        concat(lit("rtag"), col("r").cast("string"), lit(" "), col("text"))
          .as("text"))
      .localCheckpoint(true)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    for (reps <- repsList) {
      val c = corpusOf(reps)
      val nDocs = c.count()

      // q90 shape: bigram model build + scoring join
      val (tLm, nLm) = time {
        val docs = c.select(col("doc_id"),
          graft.operators.TextAnalysis.tokens(col("text")).as("ts"))
          .filter(size(col("ts")) >= 2)
        val bi = docs.select(col("doc_id"),
            explode(transform(slice(col("ts"), lit(1), size(col("ts")) - 1),
              (u, i) => struct(u.as("u"),
                element_at(col("ts"), i + lit(2)).as("v")))).as("b"))
          .select(col("doc_id"), col("b.u").as("u"), col("b.v").as("v"))
        val cuv = bi.groupBy("u", "v").agg(count(lit(1)).as("c_uv"))
        bi.join(cuv, Seq("u", "v")).groupBy("doc_id")
          .agg(count(lit(1)).as("n")).count()
      }

      // q92 shape: per-language packing prefix sum
      val (tPack, nPack) = time {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        c.select(col("doc_id"), col("lang"),
            size(graft.operators.TextAnalysis.tokens(col("text")))
              .cast("long").as("n_tokens"))
          .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .count()
      }

      // q94 shape: repeated-span aggregate
      val (tSpan, nSpan) = time {
        c.select(col("doc_id"), explode(array_distinct(
            graft.operators.Dedup.shingles(col("text"), 8))).as("span"))
          .groupBy("span").agg(count(lit(1)).as("n_docs"))
          .filter(col("n_docs") >= 2).count()
      }

      println(f"""{"probe":"lm","reps":$reps,"n_docs":$nDocs,""" +
        f""""bigram_sec":$tLm%.2f,"bigram_docs":$nLm,""" +
        f""""pack_sec":$tPack%.2f,"pack_rows":$nPack,""" +
        f""""span_sec":$tSpan%.2f,"repeated_spans":$nSpan}""")
      c.unpersist()
    }
    spark.stop()
  }
}
