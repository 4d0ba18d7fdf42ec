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

  test("decodeImage recovers the exact pixels generatePng encoded " +
    "(PNG is lossless) — and rejects non-image bytes") {
    for (id <- Seq(0L, 1L, 42L, 999999L)) {
      val Some(f) = Multimodal.decodeImage(Multimodal.generatePng(id))
      assert(f(0) === 8L && f(1) === 8L)
      // recompute the channel sums from the pixel formula directly
      val px = for (y <- 0 until 8; x <- 0 until 8) yield (
        (id * 31 + x * 7 + y * 13) % 256,
        (id * 17 + x * 11 + y * 3) % 256,
        (id * 5 + x * 19 + y * 29) % 256)
      assert(f(2) === px.map(_._1).sum, s"sum_r id=$id")
      assert(f(3) === px.map(_._2).sum, s"sum_g id=$id")
      assert(f(4) === px.map(_._3).sum, s"sum_b id=$id")
    }
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
  }

  test("decodeImage handles JPEG (lossy: dimensions exact, channel " +
    "sums within codec tolerance)") {
    val img = new java.awt.image.BufferedImage(16, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 16)
      img.setRGB(x, y, (128 << 16) | (64 << 8) | 200)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val Some(f) = Multimodal.decodeImage(baos.toByteArray)
    assert(f(0) === 16L && f(1) === 9L)
    val n = 16 * 9
    // flat-color JPEG decodes near the source values (chroma subsampling
    // shifts them slightly); ±6 per pixel is far beyond any codec drift
    assert(math.abs(f(2) - 128L * n) <= 6L * n, f.mkString(","))
    assert(math.abs(f(3) - 64L * n) <= 6L * n, f.mkString(","))
    assert(math.abs(f(4) - 200L * n) <= 6L * n, f.mkString(","))
  }

  test("imageFeatures: end-to-end DataFrame path over generated PNGs") {
    val df = Multimodal.imageFeatures(
      Multimodal.withGeneratedPng(
        Seq(3L, 7L).toDF("doc_id"), "doc_id"), "doc_id")
      .orderBy("doc_id").collect()
    assert(df.length === 2)
    df.foreach { r =>
      assert(r.getInt(1) === 8 && r.getInt(2) === 8)
      val expected = Multimodal.decodeImage(
        Multimodal.generatePng(r.getLong(0))).get
      assert(r.getLong(3) === expected(2))
      assert(r.getLong(4) === expected(3))
      assert(r.getLong(5) === expected(4))
    }
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
