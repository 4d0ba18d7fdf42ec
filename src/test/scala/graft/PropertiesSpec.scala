package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.functions.{Bloom, Hashing, ZOrderValue}

/** Property tests driven by scalacheck generators (drawn manually — no
  * scalatestplus bridge offline): the portable-hash contract and the
  * Morton bijection hold for arbitrary inputs, not just fixtures. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      Seed(seed + i)))

  test("md5Long == builtin chain for arbitrary unicode strings") {
    val g = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.choose(0x20.toChar, 0x2FFF.toChar)).map(_.mkString),
      Gen.listOf(Gen.oneOf[String]("a", " ", "\t", "\n", "ß", "中",
        "🙂")) // surrogate-pair emoji as a string
        .map(_.mkString))
    val strs = (sample(g, 300, 7L) :+ "").distinct
    val df = strs.toDF("s").select(
      Hashing.md5Long($"s").as("native"),
      Hashing.md5LongBuiltin($"s").as("builtin"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("Morton interleave is a bijection on [0,2^16)^2") {
    def deinterleave(z: Long): (Long, Long) = {
      var (x, y) = (0L, 0L)
      for (i <- 0 until 16) {
        x |= ((z >>> (2 * i)) & 1L) << i
        y |= ((z >>> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    val g = Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L))
    val pts = sample(g, 500, 13L)
    pts.foreach { case (x, y) =>
      assert(deinterleave(ZOrderValue.interleave(x, y, 16)) === ((x, y)))
    }
    // distinct points → distinct z (injectivity on the sample)
    assert(pts.distinct.map { case (x, y) =>
      ZOrderValue.interleave(x, y, 16) }.distinct.size === pts.distinct.size)
  }

  test("bloom: arbitrary inserted strings are always contained") {
    val g = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val keys = sample(g, 400, 23L).distinct
    val numBits = 1 << 14
    val k = 5
    val bits = new Array[Long](numBits / 64)
    def hashOf(s: String): Long = {
      // mirror Hashing.md5Long on the driver
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    keys.foreach { s =>
      Bloom.bitPositions(hashOf(s), numBits, k)
        .foreach(b => bits(b >>> 6) |= 1L << (b & 63))
    }
    keys.foreach { s =>
      assert(Bloom.bitPositions(hashOf(s), numBits, k)
        .forall(b => (bits(b >>> 6) & (1L << (b & 63))) != 0L), s)
    }
  }

  test("skyline window formulation == brute-force dominance on " +
    "arbitrary points (dense ties)") {
    import org.apache.spark.sql.expressions.Window
    // small domains force heavy price AND size ties — the edge cases
    // of the q115 formulation
    val g = Gen.zip(Gen.choose(0, 15), Gen.choose(0, 15))
    val pts = sample(g, 300, 31L)
    val df = pts.toDF("price", "size")
    val best = df.groupBy(col("price"))
      .agg(max(col("size")).cast("long").as("size"))
    val w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    val frontier = best.withColumn("mx", max(col("size")).over(w))
      .filter(col("mx").isNull || col("size") > col("mx"))
      .select(col("price"), col("size"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    // brute force over DISTINCT points: kept ⟺ no other point weakly
    // dominates it (≤ price, ≥ size, strict somewhere)
    val distinct = pts.map { case (p, sz) => (p, sz.toLong) }.distinct
    val expected = distinct.filter { case (p, sz) =>
      !distinct.exists { case (op, osz) =>
        op <= p && osz >= sz && (op < p || osz > sz) }
    }.toSet
    assert(frontier === expected)
  }

  test("interval merge window formulation == sequential sweep on " +
    "arbitrary interval sets (touching + nested + duplicate starts)") {
    import org.apache.spark.sql.expressions.Window
    val horizon = 10L
    val g = Gen.zip(Gen.choose(1, 5), Gen.choose(0L, 200L))
    val ivs = sample(g, 400, 37L)
    val df = ivs.toDF("user_id", "st")
      .withColumn("en", col("st") + lit(horizon))
    val w = Window.partitionBy("user_id").orderBy("st")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val merged = df
      .withColumn("pme", max(col("en")).over(wPrev))
      .withColumn("ni", when(col("pme").isNull ||
        col("st") > col("pme"), 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("st")).as("s"), max(col("en")).as("e"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toList).toMap
    // sequential sweep reference, per user
    val expected = ivs.groupBy(_._1).view.mapValues { xs =>
      val sorted = xs.map(_._2).sorted
      val out = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long)]
      for (st <- sorted) {
        val en = st + horizon
        out.lastOption match {
          case Some((s, e, n)) if st <= e =>
            out(out.length - 1) = (s, math.max(e, en), n + 1)
          case _ => out += ((st, en, 1L))
        }
      }
      out.toList
    }.toMap
    assert(merged === expected)
  }
}
