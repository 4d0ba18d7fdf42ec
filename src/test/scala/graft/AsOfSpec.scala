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
}
