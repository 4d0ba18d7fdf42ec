package graft

import java.sql.Timestamp

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("withinInterval: inclusive boundary, cross-bucket matches, no dups") {
    def ts(s: String) = Timestamp.valueOf(s)
    val a = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:09:59")) // near a 10-min bucket edge
    ).toDF("user_id", "id_a", "ts_a")
    val b = Seq(
      (1L, 20L, ts("2024-01-01 10:10:00")), // exactly 600s from id 10 -> in
      (1L, 21L, ts("2024-01-01 10:10:01")), // 601s from id 10 -> out; 2s from id 11
      (2L, 22L, ts("2024-01-01 10:00:00")) // different key -> never
    ).toDF("user_id", "id_b", "ts_b")
    val out = RangeJoin.withinInterval(a, b, Seq("user_id"),
      "ts_a", "ts_b", toleranceUs = 600000000L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((10L, 20L), (11L, 20L), (11L, 21L)))
    // and exactly once each (bucket explosion must not duplicate)
    val n = RangeJoin.withinInterval(a, b, Seq("user_id"),
      "ts_a", "ts_b", toleranceUs = 600000000L).count()
    assert(n === 3)
  }

  test("withinInterval == brute force on seeded random data") {
    val rnd = new scala.util.Random(11)
    def t(sec: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000L)
    val a = (0 until 200).map(i =>
      (rnd.nextInt(5).toLong, i.toLong, t(rnd.nextInt(7200))))
      .toDF("user_id", "id_a", "ts_a")
    val b = (0 until 200).map(i =>
      (rnd.nextInt(5).toLong, i.toLong, t(rnd.nextInt(7200))))
      .toDF("user_id", "id_b", "ts_b")
    val tol = 137000000L // 137s — deliberately not bucket-aligned
    val got = RangeJoin.withinInterval(a, b, Seq("user_id"),
      "ts_a", "ts_b", toleranceUs = tol)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val av = a.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val bv = b.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val expect = (for {
      (ka, ia, ta) <- av
      (kb, ib, tb) <- bv
      if ka == kb && math.abs(ta.getTime - tb.getTime) * 1000L <= tol
    } yield (ia, ib)).toSet
    assert(got === expect)
  }
}
