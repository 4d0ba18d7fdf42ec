package graft

import java.sql.Timestamp

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join: latest right row at or before the left timestamp") {
    val left = Seq(
      (1L, ts("2024-01-10 00:00:00"), 100L),
      (1L, ts("2024-01-20 00:00:00"), 101L),
      (2L, ts("2024-01-10 00:00:00"), 102L) // key with no right rows
    ).toDF("k", "lts", "lid")
    val right = Seq(
      (1L, ts("2024-01-05 00:00:00"), 7L, 5.0),
      (1L, ts("2024-01-10 00:00:00"), 8L, 6.0), // equal ts -> matches (<=)
      (1L, ts("2024-01-10 00:00:00"), 9L, 7.0), // tie -> highest tiebreak
      (1L, ts("2024-01-15 00:00:00"), 10L, 8.0)
    ).toDF("k", "rts", "rid", "rv")
    val out = AsOf.asOfJoin(left, right, Seq("k"), "lts", "rts",
      Seq("rid", "rv"), rightTieBreak = "rid")
      .orderBy("lid")
      .collect()
      .map(r => (r.getAs[Long]("lid"),
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("asof_rv")).map(_.toDouble)))
    assert(out.toSeq === Seq(
      (100L, Some(9L), Some(7.0)), // equal-ts rows included, tie -> rid 9
      (101L, Some(10L), Some(8.0)), // latest before 01-20
      (102L, None, None))) // no right rows for key 2
  }

  test("as-of join == brute force on seeded random data (incl. null attach col)") {
    val rnd = new scala.util.Random(7)
    def t(day: Int) = ts(f"2024-01-$day%02d 00:00:00")
    val left = (0 until 300).map(i =>
      (rnd.nextInt(8).toLong, t(rnd.nextInt(28) + 1), i.toLong))
      .toDF("k", "lts", "lid")
    // rv is sometimes NULL — the struct-attach semantics must still take
    // BOTH columns from the single latest row (a per-column last would
    // backfill rv from an older row)
    val right = (0 until 150).map { i =>
      val rv: java.lang.Double =
        if (rnd.nextInt(4) == 0) null else rnd.nextInt(100).toDouble
      (rnd.nextInt(8).toLong, t(rnd.nextInt(28) + 1), i.toLong, rv)
    }.toDF("k", "rts", "rid", "rv")

    val out = AsOf.asOfJoin(left, right, Seq("k"), "lts", "rts",
      Seq("rid", "rv"), rightTieBreak = "rid")
      .collect()
      .map(r => r.getAs[Long]("lid") ->
        (Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_rv")).map(_.toDouble)))
      .toMap

    val rightRows = right.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        Option(r.getAs[java.lang.Double](3)).map(_.toDouble)))
    left.collect().foreach { l =>
      val (k, lts, lid) = (l.getLong(0), l.getTimestamp(1), l.getLong(2))
      val best = rightRows
        .filter(r => r._1 == k && !r._2.after(lts))
        .sortBy(r => (r._2.getTime, r._3)).lastOption
      assert(out(lid) === (best.map(_._3), best.flatMap(_._4)),
        s"lid=$lid k=$k lts=$lts")
    }
  }
}
