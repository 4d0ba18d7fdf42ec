package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Misra–Gries contract: the candidate set always contains every true
  * heavy hitter regardless of partitioning/merge order, and the
  * sketch+recount operator is exactly the exact top-k. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("count-min: estimates dominate true counts under every " +
    "partitioning, and the sketch is partition-invariant") {
    import graft.operators.Sketches
    val rnd = new scala.util.Random(7)
    val values = (1 to 8000).map(_ => s"v${rnd.nextInt(300)}")
    val exact = values.groupBy(identity).map { case (k, v) => k -> v.size }
    val (d, w) = (4, 512)
    val sketches = Seq(1, 4, 32).map { p =>
      Sketches.countMinSketch(values.toDF("x").repartition(p), "x", d, w)
    }
    // elementwise-add merge ⇒ the final counters are partition-invariant
    assert(sketches.forall(_.sameElements(sketches.head)))
    // one-sided guarantee: estimate ≥ truth for EVERY key; and the
    // total overcount respects the ε·N expectation within 3×
    val n = values.size
    exact.foreach { case (k, c) =>
      val est = Sketches.countMinEstimate(sketches.head, d, w, k)
      assert(est >= c, s"$k: est $est < exact $c")
      assert(est <= c + 3L * n / w, s"$k: est $est way over exact $c")
    }
    // unseen keys estimate at most the collision mass, never negative
    val ghost = Sketches.countMinEstimate(sketches.head, d, w, "never-seen")
    assert(ghost >= 0 && ghost <= 3L * n / w)
  }

  test("below capacity the summary is exact") {
    import org.apache.spark.sql.GraftSql
    val df = Seq.fill(5)("a").union(Seq.fill(3)("b")).union(Seq("c"))
      .toDF("x").repartition(4)
    val sketch = GraftSql.column(
      graft.functions.MisraGriesAgg(GraftSql.expression($"x"), 16)
        .toAggregateExpression())
    val m = df.agg(sketch.as("mg")).select($"mg").collect()
      .head.getMap[String, Long](0)
    assert(m === Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("heavy hitters survive trimming under every partitioning") {
    val rnd = new scala.util.Random(11)
    // 3 heavy items (~25% / 15% / 10% of n) in a sea of 2000 rare ones
    val rows = (1 to 12000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 25) "heavy1" else if (r < 40) "heavy2"
      else if (r < 50) "heavy3" else s"rare${rnd.nextInt(2000)}"
    }
    val n = rows.length
    val capacity = 64 // threshold n/(cap+1) ≈ 185 « heavy counts
    import org.apache.spark.sql.GraftSql
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("x").repartition(parts)
      val sketch = GraftSql.column(
        graft.functions.MisraGriesAgg(GraftSql.expression($"x"), capacity)
          .toAggregateExpression())
      val keys = df.agg(sketch.as("mg"))
        .select(explode(map_keys($"mg")).as("k")).as[String].collect().toSet
      assert(keys.size <= capacity)
      assert(Set("heavy1", "heavy2", "heavy3").subsetOf(keys),
        s"parts=$parts keys=${keys.take(10)}")
      val _ = n // documented threshold uses n
    }
  }

  test("topKByFrequency == exact groupBy top-k") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 8000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 30) s"hot${rnd.nextInt(5)}" else s"cold${rnd.nextInt(1500)}"
    }
    val df = rows.toDF("term").repartition(16)
    val viaSketch = HeavyHitters.topKByFrequency(df, "term", 5, 64)
      .select("term", "freq", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val exact = df.groupBy("term").agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"freq".desc, $"term".asc)))
      .filter($"rank" <= 5)
      .select("term", "freq", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(viaSketch.sortBy(_._3) === exact.sortBy(_._3))
  }
}
