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
}
