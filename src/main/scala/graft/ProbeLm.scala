package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** LM-pipeline scale probe (the ProbeAnn sibling for the
  * q90/q92/q94/q309 family): wall time of the bigram-LM scoring join,
  * the sequence-packing prefix sum, the repeated-span aggregate, and
  * the per-site boilerplate doc-frequency pass on replicated document
  * corpora — checking each op's cost grows like its shuffle volume,
  * not worse.
  *
  * Replication is deterministic: replica r of doc d gets id d·reps+r
  * and a per-replica token prefix ("rtag<r>") so the corpus grows
  * linearly while the bigram/shingle vocabulary stays realistic
  * (replicas share almost all spans — the worst case for the span
  * aggregate's key skew, since every repeated span's group grows
  * reps-fold). For the boilerplate stage each replica keeps its own
  * SOURCE label (source + "_r<r>") — a bigger crawl is more sites at
  * the same per-site size, which is what the ≥ 20 %-of-site doc-
  * frequency threshold must stay invariant under (replicating docs
  * under one site label would instead dilute every ratio to zero and
  * measure an empty index). The q309 footer injection rides along
  * (per-site "<src>_hdr cookie notice …" sentence), so every site
  * contributes a handful of guaranteed-boilerplate grams and the
  * stored set must grow ∝ sites, never ∝ docs².
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
      .select(col("doc_id"), col("lang"), col("source"), col("text"))

    def corpusOf(reps: Int): DataFrame = base
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .select((col("doc_id") * reps + col("r")).as("doc_id"), col("lang"),
        concat(col("source"), lit("_r"), col("r").cast("string"))
          .as("source"),
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

      // q309 shape: per-site boilerplate doc-frequency + ratio filter
      // + join-back. Timed end-to-end to the per-doc coverage report;
      // the boiler-set cardinality (the stored index a removal pass
      // ships) is counted outside the timer and must grow ∝ sites,
      // never ∝ docs² — a superlinear set would mean the ratio filter
      // stopped being collision-bound.
      import graft.operators.Dedup
      val pos = c.select(col("doc_id"), col("source"),
        explode(Dedup.shingles(concat(col("text"), lit(" "),
          col("source"), lit("_hdr cookie notice all rights reserved "),
          col("source"), lit("_end")), 2)).as("g"))
      val dfq = pos.select(col("source"), col("g"), col("doc_id"))
        .distinct()
        .groupBy("source", "g").agg(count(lit(1)).as("df"))
      val sz = c.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val boiler = dfq.join(sz, Seq("source"))
        .filter(col("df") * 5 >= col("n_docs") && col("df") >= 3)
        .select(col("source"), col("g"), lit(1L).as("is_b"))
      val (tBoil, nBoilDocs) = time {
        pos.join(boiler, Seq("source", "g"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_pos"),
            sum(coalesce(col("is_b"), lit(0L))).as("n_boiler"))
          .count()
      }
      val nBoilSet = boiler.count()

      println(f"""{"probe":"lm","reps":$reps,"n_docs":$nDocs,""" +
        f""""bigram_sec":$tLm%.2f,"bigram_docs":$nLm,""" +
        f""""pack_sec":$tPack%.2f,"pack_rows":$nPack,""" +
        f""""span_sec":$tSpan%.2f,"repeated_spans":$nSpan,""" +
        f""""boiler_sec":$tBoil%.2f,"boiler_docs":$nBoilDocs,""" +
        f""""boiler_set":$nBoilSet}""")
      c.unpersist()
    }
    spark.stop()
  }
}
