package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = Multimodal.withPayload(
    Seq((1L, "abcdef", "en"), (2L, "xy", "en"))
      .toDF("doc_id", "text", "lang"), "text", "doc_id")

  test("resizePayload truncates and zero-pads to the target size") {
    val out = Multimodal.resizePayload(payloads, "payload", 4)
      .orderBy("doc_id")
      .select(col("payload")).collect()
      .map(_.getAs[Array[Byte]](0))
    assert(out(0).toSeq === "abcd".getBytes("UTF-8").toSeq)
    assert(out(1).toSeq === ("xy".getBytes("UTF-8") ++ Array[Byte](0, 0)).toSeq)
  }

  test("extractFeatures: expression columns + decode-stub feature") {
    val row = Multimodal.extractFeatures(payloads, "doc_id")
      .orderBy("doc_id").collect()(0)
    assert(row.getAs[String]("media_type") === "text/plain")
    assert(row.getAs[Int]("byte_len") === 6)
    assert(row.getAs[String]("header_hex") === "61626364")
    assert(row.getAs[Double]("f_len") === 6.0)
    assert(row.getAs[Double]("f_first") === 97.0)
    assert(row.getAs[Double]("f_last") === 102.0)
    assert(row.getAs[Double]("f_mean") ===
      "abcdef".getBytes.map(_.toInt).sum.toDouble / 6)
  }

  test("frameSample emits no frames for an empty payload") {
    val empty = Multimodal.withPayload(
      Seq((1L, "", "en"), (2L, "abcd", "en")).toDF("doc_id", "text", "lang"),
      "text", "doc_id")
    val rows = Multimodal.frameSample(empty, "payload", "doc_id",
      frameSize = 4, maxFrames = 4).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("frameSample caps frames and fingerprints each slice") {
    val df = Multimodal.frameSample(payloads, "payload", "doc_id",
      frameSize = 4, maxFrames = 4).orderBy("doc_id", "frame_idx")
    val rows = df.collect()
    // doc 1: "abcdef" -> frames "abcd", "ef"; doc 2: "xy" -> one frame
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ===
      Seq((1L, 0, 4), (1L, 1, 2), (2L, 0, 2)))
  }
}
