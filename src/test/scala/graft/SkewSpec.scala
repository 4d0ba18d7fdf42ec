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

  test("saltedTopK == direct window under heavy skew, duplicates, ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 90% of rows land on one hot key; values collide constantly so the
    // tiebreak column does real work
    val rows = (0 until 5000).map { i =>
      val key = if (rnd.nextInt(10) < 9) 0L else rnd.nextInt(50).toLong + 1
      (key, rnd.nextInt(7).toDouble, i.toLong)
    }
    val df = rows.toDF("k", "score", "uid")
    val order = Seq(col("score").desc, col("uid").asc)
    val direct = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(order: _*)))
      .filter(col("rn") <= 7)
      .select("k", "uid", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val salted = Skew.saltedTopK(df, Seq("k"), order, k = 7, salt = 16,
      saltBy = Seq("uid"))
      .select("k", "uid", "rn")
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

  test("AQE skew-join engages on a hot-key sort-merge join (the " +
    "runtime re-plan the 100 TB story leans on): the adaptive plan " +
    "marks the skewed side and the result matches the broadcast join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the thresholds so the toy hot key qualifies as skew
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows, 95% on one key — one shuffle partition dwarfs the rest
      val fact = spark.range(0, 200000)
        .select(when(col("id") % 20 =!= 0, lit(7L))
          .otherwise(col("id") % 97).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 97).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("dv"))
      val joined = fact.join(dim, Seq("k")).groupBy(col("dv"))
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      val rows = joined.collect() // materialize so AQE finalizes
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(4000))
      // correctness unchanged by the split: equal to the broadcast plan
      val expected = fact.join(broadcast(dim), Seq("k")).groupBy(col("dv"))
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
        .collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet ===
        expected.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toSet)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedTopK refuses an input `rn` column and dodges _salt/_rn " +
    "collisions instead of clobbering caller data") {
    import spark.implicits._
    val base = Seq((1L, 10L, 7L, 9L), (1L, 20L, 8L, 3L))
      .toDF("k", "uid", "_salt", "_rn")
    // working names present in the input: result is still correct and
    // the caller's columns survive untouched
    val out = Skew.saltedTopK(base, Seq("k"),
      Seq(col("uid").desc), k = 1, salt = 4, saltBy = Seq("uid"))
    val r = out.select("k", "uid", "_salt", "_rn", "rn").collect()
    assert(r.length === 1 && r.head.getLong(1) === 20L)
    assert(r.head.getLong(2) === 8L && r.head.getLong(3) === 3L)
    // an input `rn` would be clobbered by the output rank: refuse
    val withRn = base.withColumnRenamed("_rn", "rn")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedTopK(withRn, Seq("k"),
        Seq(col("uid").desc), k = 1, salt = 4, saltBy = Seq("uid"))
    }
    assert(e.getMessage.contains("rn"))
  }
}
