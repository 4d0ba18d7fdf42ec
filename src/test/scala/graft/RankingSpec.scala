package graft

import org.apache.spark.sql.functions._

import graft.operators.Ranking

/** Distributed order statistics: the index must be a permutation that
  * follows the total order, and per-group ranks must be contiguous and
  * 1-based — independent of partitioning (q190's verify at CPUS=3/32
  * re-proves that end-to-end against DuckDB's row_number). */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("globalIndex assigns the total-order permutation 0..N-1") {
    val df = (1 to 997).map(i => ((i * 7919) % 1000, i))
      .toDF("key", "id").repartition(13)
    val g = Ranking.globalIndex(df, Seq("key", "id"))
    val rows = g.select("key", "id", "gidx")
      .collect().sortBy(_.getLong(2))
    assert(rows.map(_.getLong(2)).toSeq === (0L until 997L))
    val keys = rows.map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(keys === keys.sorted) // index order IS the sort order
  }

  test("groupRanks are contiguous 1-based per group with exact sizes") {
    val df = (1 to 300).map(i => (s"g${i % 7}", (i * 31) % 100, i))
      .toDF("grp", "key", "id").repartition(11)
    val r = Ranking.groupRanks(df, "grp", Seq("key", "id"))
    val per = r.groupBy("grp").agg(
      count(lit(1)).as("n"), min("r").as("lo"), max("r").as("hi"),
      countDistinct("r").as("d"), max("ng").as("ng")).collect()
    assert(per.nonEmpty)
    per.foreach { row =>
      val n = row.getLong(1)
      assert(row.getLong(2) === 1L, row.toString)   // lo
      assert(row.getLong(3) === n, row.toString)    // hi == count
      assert(row.getLong(4) === n, row.toString)    // all distinct
      assert(row.getLong(5) === n, row.toString)    // ng column exact
    }
    // rank order matches key order within a group
    val g0 = r.filter(col("grp") === "g0")
      .orderBy("r").select("key", "id").collect()
      .map(x => (x.getInt(0), x.getInt(1))).toSeq
    assert(g0 === g0.sorted)
  }

  test("globalCumSum ≡ the naive single-partition window, including " +
    "negative keys, sparse buckets, and multiple weight columns") {
    val df = (1 to 500).map { i =>
      val k = ((i * 7919) % 997) - 498L // distinct, negative..positive
      (k, (i % 13) + 1L, (i % 7) - 3L)
    }.toDF("k", "w1", "w2").repartition(17)
    for (buckets <- Seq(4, 64, 1024)) { // fewer keys than buckets too
      val got = Ranking.globalCumSum(df, "k", Seq("w1", "w2"), buckets)
        .select("k", "cum_w1", "cum_w2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val keys = df.select("k", "w1", "w2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      var c1 = 0L; var c2 = 0L
      val want = keys.map { case (k, w1, w2) =>
        c1 += w1; c2 += w2; (k, c1, c2)
      }
      assert(got.toSeq === want.toSeq, s"buckets=$buckets")
    }
  }

  test("globalNtile ≡ the ntile window for every k and n, including " +
    "n < k, n = k, and remainder tiles") {
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(3, 5, 7, 100, 101, 104); k <- Seq(5, 10)) {
      val df = (1 to n).map(i => ((i * 7919) % 10007, i))
        .toDF("key", "id").repartition(7)
      val got = Ranking.globalNtile(df,
          Seq(col("key").desc, col("id").asc), k, "tile")
        .select("id", "tile").collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val want = df.withColumn("tile",
          ntile(k).over(Window.orderBy(col("key").desc, col("id").asc))
            .cast("long"))
        .select("id", "tile").collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      assert(got.toSeq === want.toSeq, s"n=$n k=$k")
    }
  }

  test("leadKey ≡ the unpartitioned lead window: bucket boundaries " +
    "stitch, the last row stays null, sparse buckets skip") {
    val keys = (1 to 400).map(i => (i * 7919L) % 100003L).distinct
    val df = keys.map(Tuple1(_)).toDF("k").repartition(13)
    for (buckets <- Seq(3, 64, 1024)) {
      val got = Ranking.leadKey(df, "k", "nxt", buckets)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).sortBy(_._1)
      val sorted = keys.sorted
      val want = sorted.zip(sorted.drop(1).map(Some(_)) :+ None)
      assert(got.toSeq === want, s"buckets=$buckets")
    }
  }
}
