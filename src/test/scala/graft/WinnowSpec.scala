package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The native WinnowFingerprints kernel must select exactly the
  * fingerprint set of its proven-equal specification — the r16
  * explode-to-window-starts aggregate (itself oracle-proven equal to
  * the r15 sliding-min window): windows p ∈ [1, max(n−W+1, 1)],
  * wmin = min over the covered grams of c_i = h·shift + (shift−1−i),
  * fingerprint = wmin DIV shift. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4
  private val shift = 1048576L

  /** The aggregate formulation q220 shipped in r16, verbatim. */
  private def aggregateSpec(docs: org.apache.spark.sql.DataFrame) = {
    val hashed = docs
      .select(col("doc_id"), posexplode(col("hs")).as(Seq("i0", "h")))
      .select(col("doc_id"),
        (col("i0") + 1).cast("long").as("i"), col("h"))
      .withColumn("c",
        col("h") * lit(shift) + (lit(shift - 1) - col("i")))
    hashed
      .select(col("doc_id"), col("c"),
        explode(sequence(greatest(col("i") - lit(W - 1L), lit(1L)),
          col("i"))).as("p"))
      .groupBy(col("doc_id"), col("p"))
      .agg(min(col("c")).as("wmin"), count(lit(1)).as("wlen"))
      .filter(col("wlen") === lit(W.toLong) || col("p") === lit(1L))
      .select(col("doc_id"), expr(s"wmin DIV $shift").as("h"))
      .distinct()
  }

  private def kernel(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"),
      explode(Dedup.winnowFingerprints(col("hs"), W, shift)).as("h"))
      .distinct()

  test("WinnowFingerprints == explode-to-window-starts aggregate") {
    // deterministic pseudo-random gram hashes in the md5Mod range,
    // lengths sweeping the edge cases: shorter than W, exactly W,
    // W+1, long runs with repeated hash values (tie rule + adjacent
    // dedup), constant docs (every window has the same minimum)
    val rnd = new scala.util.Random(42)
    val docs = (1L to 60L).map { id =>
      val n =
        if (id <= 6) id.toInt // 1..6 grams: the short-doc rule
        else 7 + rnd.nextInt(200)
      val hs =
        if (id % 7 == 0) Array.fill(n)(12345L) // constant doc
        else if (id % 5 == 0)
          Array.fill(n)((rnd.nextInt(3) + 1).toLong) // heavy ties
        else Array.fill(n)(rnd.nextLong(1L << 30).abs)
      (id, hs)
    }.toDF("doc_id", "hs")

    val spec = aggregateSpec(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = kernel(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === spec)
  }

  test("WinnowFingerprints: null in null out, empty in empty out, codegen'd") {
    // file-backed scan so constant folding cannot bypass doGenCode
    // (the md5Long spec's trick)
    val dir = java.nio.file.Files.createTempDirectory("winnow-parquet")
    dir.toFile.deleteOnExit()
    Seq((1L, Some(Array(7L, 3L, 9L, 1L, 5L, 2L))),
      (2L, Some(Array.empty[Long])),
      (3L, Option.empty[Array[Long]]))
      .toDF("doc_id", "hs").write.mode("overwrite").parquet(dir.toString)
    val df = spark.read.parquet(dir.toString)
      .select(col("doc_id"),
        Dedup.winnowFingerprints(col("hs"), W, shift).as("fp"))
    assert(df.queryExecution.executedPlan.toString
      .contains("winnow_fingerprints"))
    val rows = df.orderBy("doc_id").collect()
    assert(rows(0).getSeq[Long](1).nonEmpty)
    assert(rows(1).getSeq[Long](1).isEmpty)
    assert(rows(2).isNullAt(1))
  }
}
