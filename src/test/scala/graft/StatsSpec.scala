package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Stats}

/** Two-sample tests and HITS against independent in-memory references:
  * brute-force pair counting for Mann–Whitney, a direct sorted-merge
  * CDF walk for KS, and a replay of the exact fixed-point recurrence
  * for HITS — plus partitioning invariance (the statistics are
  * functions of exact integer counts, so they must be bit-identical
  * at any parallelism). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random-ish sample with ties across classes
  private val sample: Seq[(Long, Long)] = (1 to 400).map { i =>
    val v = ((i * 7919) % 89).toLong // heavy ties
    val y = if ((i * 31) % 3 == 0) 1L else 0L
    (v, y)
  }

  test("ksTwoSample equals the direct CDF-walk reference") {
    val df = sample.toDF("v", "y").repartition(13)
    val row = Stats.ksTwoSample(df, col("v"), col("y")).collect().head
    val a = sample.filter(_._2 == 1L).map(_._1).sorted
    val b = sample.filter(_._2 == 0L).map(_._1).sorted
    val values = sample.map(_._1).distinct.sorted
    val gaps = values.map { t =>
      val fa = a.count(_ <= t).toLong * b.size
      val fb = b.count(_ <= t).toLong * a.size
      (math.abs(fa - fb), t)
    }
    val dNum = gaps.map(_._1).max
    val vAt = gaps.filter(_._1 == dNum).map(_._2).min
    assert(row.getAs[Long]("n_a") === a.size.toLong)
    assert(row.getAs[Long]("n_b") === b.size.toLong)
    assert(row.getAs[Long]("v_at_max") === vAt)
    val want = dNum.toDouble / (a.size.toDouble * b.size.toDouble)
    assert(math.abs(row.getAs[Double]("ks_d") - want) < 1e-12)
  }

  test("mannWhitneyU equals brute-force pair counting and the " +
    "textbook z formula") {
    val df = sample.toDF("v", "y").repartition(7)
    val row = Stats.mannWhitneyU(df, col("v"), col("y")).collect().head
    val a = sample.filter(_._2 == 1L).map(_._1)
    val b = sample.filter(_._2 == 0L).map(_._1)
    // 2U = 2·#{a>b} + #{a==b} over all cross pairs
    val u2 = a.map(x => 2L * b.count(x > _) + b.count(x == _))
      .map(_.toLong).sum
    val na = a.size.toDouble; val nb = b.size.toDouble
    val n = na + nb
    val tie3 = sample.map(_._1).groupBy(identity).values
      .map(g => g.size.toLong)
      .map(t => t * t * t - t).sum.toDouble
    val cles = u2.toDouble / (2.0 * na * nb)
    val z = (u2.toDouble / 2.0 - na * nb / 2.0) /
      math.sqrt(na * nb / 12.0 * ((n + 1.0) - tie3 / (n * (n - 1.0))))
    assert(math.abs(row.getAs[Double]("cles") - cles) < 1e-9)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-9)
    // complement identity: U_A + U_B = nA·nB exactly (swap classes)
    val sw = sample.map { case (v, y) => (v, 1L - y) }
      .toDF("v", "y").repartition(7)
    val rowB = Stats.mannWhitneyU(sw, col("v"), col("y")).collect().head
    assert(math.abs(row.getAs[Double]("cles") +
      rowB.getAs[Double]("cles") - 1.0) < 1e-12)
  }

  test("two-sample stats are parallelism-invariant") {
    val base = sample.toDF("v", "y")
    val r1 = Stats.ksTwoSample(base.repartition(1), col("v"), col("y"))
      .collect().head
    val r32 = Stats.ksTwoSample(base.repartition(32), col("v"), col("y"))
      .collect().head
    assert(r1 === r32)
    val m1 = Stats.mannWhitneyU(base.repartition(1), col("v"), col("y"))
      .collect().head
    val m32 = Stats.mannWhitneyU(base.repartition(32), col("v"), col("y"))
      .collect().head
    assert(m1 === m32)
  }

  test("twoSampleSummary equals the three standalone operators " +
    "field-for-field (bit-identical doubles — same expression trees)") {
    val df = sample.toDF("v", "y").repartition(9)
    val s = Stats.twoSampleSummary(df, col("v"), col("y")).collect().head
    val ks = Stats.ksTwoSample(df, col("v"), col("y")).collect().head
    val mw = Stats.mannWhitneyU(df, col("v"), col("y")).collect().head
    assert(s.getAs[Long]("n_a") === ks.getAs[Long]("n_a"))
    assert(s.getAs[Long]("n_b") === ks.getAs[Long]("n_b"))
    assert(s.getAs[Long]("v_at_max") === ks.getAs[Long]("v_at_max"))
    assert(s.getAs[Double]("ks_d") === ks.getAs[Double]("ks_d"))
    assert(s.getAs[Double]("cles") === mw.getAs[Double]("cles"))
    assert(s.getAs[Double]("z") === mw.getAs[Double]("z"))
    // cvm against a direct sequential reference
    val a = sample.filter(_._2 == 1L).map(_._1)
    val b = sample.filter(_._2 == 0L).map(_._1)
    val byV = sample.groupBy(_._1).view.mapValues(_.size).toMap
    val cvmRef = sample.map(_._1).distinct.sorted.map { t =>
      val gap = a.count(_ <= t).toLong * b.size -
        b.count(_ <= t).toLong * a.size
      byV(t).toLong * gap * gap
    }.sum.toDouble / (a.size.toDouble * b.size.toDouble *
      (a.size + b.size).toDouble * (a.size + b.size).toDouble)
    assert(math.abs(s.getAs[Double]("cvm") - cvmRef) < 1e-12)
  }

  test("hits replays the exact fixed-point recurrence on a small graph") {
    // two hubs endorsing overlapping authority sets; hub 1 endorses
    // the popular authorities only
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (2L, 12L), (3L, 12L), (3L, 13L))
    val df = edges.toDF("src", "dst").repartition(5)
    val got = Graph.hits(df, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

    // in-memory replay of the identical integer arithmetic
    val S = Graph.Scale
    def norm(m: Map[Long, BigInt]): Map[Long, Long] = {
      val tot = m.values.sum.max(BigInt(1))
      m.map { case (k, v) => k -> (v * S / tot).toLong }
    }
    var h: Map[Long, Long] = edges.map(_._1).distinct.map(_ -> S).toMap
    var a: Map[Long, Long] = Map.empty
    for (_ <- 1 to 2) {
      a = norm(edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => BigInt(h(e._1))).sum })
      h = norm(edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => BigInt(a(e._2))).sum })
    }
    val ids = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val want = ids.map(id =>
      (id, a.getOrElse(id, 0L), h.getOrElse(id, 0L)))
    assert(got.toSeq === want)
    // popularity order: authorities 10/11 (2 hub endorsements) beat 12,
    // which beats 13
    val auth = got.map(t => t._1 -> t._2).toMap
    assert(auth(10L) === auth(11L))
    assert(auth(10L) > auth(12L))
    assert(auth(12L) > auth(13L))
  }

  test("hits conserves L1 mass up to integer-floor loss: normalized " +
    "scores sum to 2^30 within one unit per scored node") {
    val edges = (1 to 200).map(i =>
      ((i * 7919L) % 37, 100L + (i * 31L) % 23)).distinct
    val df = edges.toDF("src", "dst").repartition(7)
    val out = Graph.hits(df, iters = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val (authSum, hubSum) = (out.map(_._1).sum, out.map(_._2).sum)
    val nAuth = out.count(_._1 > 0)
    val nHub = out.count(_._2 > 0)
    // x·S DIV tot floors each node's share: total loss < #nodes units
    assert(authSum <= Graph.Scale && authSum > Graph.Scale - nAuth,
      s"authSum=$authSum nAuth=$nAuth")
    assert(hubSum <= Graph.Scale && hubSum > Graph.Scale - nHub,
      s"hubSum=$hubSum nHub=$nHub")
  }
}
