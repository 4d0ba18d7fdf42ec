package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("saltedTopK equals the direct window top-k exactly") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val order = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val direct = orders
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey")).orderBy(order: _*)))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val salted = Skew.saltedTopK(orders, Seq("o_custkey"), order,
      k = 3, salt = 8, saltBy = Seq("o_orderkey"))
      .select("o_custkey", "o_orderkey", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(salted === direct)
  }

  test("saltedTopK phase-1 window partitions on the salt (bounded tasks)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val p = Skew.saltedTopK(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3, salt = 8, saltBy = Seq("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(p.contains("_salt"), p) // the salted partitioning survives
    assert(p.split("Window").length >= 3, p) // two window phases
  }
}
