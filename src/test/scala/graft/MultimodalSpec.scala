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

  test("aHash64: decoded-pixel hash equals the closed-form recompute; " +
    "JVM and DataFrame paths agree") {
    for (id <- Seq(1L, 42L, 999L)) {
      val (hi, lo) = Multimodal.aHash64(Multimodal.generatePng(id)).get
      // closed-form: gray(x,y) from the affine channels, bit = gray*64
      // > total (8x8 image: one pixel per grid cell), idx = y*8+x
      val grays = for (y <- 0 until 8; x <- 0 until 8) yield
        ((id * 31 + x * 7 + y * 13) % 256) +
          ((id * 17 + x * 11 + y * 3) % 256) +
          ((id * 5 + x * 19 + y * 29) % 256)
      val total = grays.sum
      var (ehi, elo) = (0L, 0L)
      for (idx <- 0 until 64 if grays(idx) * 64 > total)
        if (idx >= 32) ehi |= 1L << (idx - 32) else elo |= 1L << idx
      assert((hi, lo) === ((ehi, elo)), s"id=$id")
    }
    val df = Multimodal.withAHash(
      Multimodal.withGeneratedPng(Seq(42L).toDF("doc_id"), "doc_id")
        .select(col("doc_id"), col("payload")), "payload").collect()
    val (hi42, lo42) = Multimodal.aHash64(Multimodal.generatePng(42L)).get
    assert(df.head.getLong(1) === hi42 && df.head.getLong(2) === lo42)
  }

  test("dHash56: tone-curve (gamma) invariant where aHash flips — the " +
    "property that earns the gradient hash its place next to aHash") {
    // monotone NONLINEAR tone curve: pixel ORDER is preserved (every
    // dHash neighbor comparison survives) but cell-vs-global-mean
    // relations are not (a convex curve drags the mean toward the
    // dark mass, flipping mid-range aHash bits). A LINEAR shift would
    // leave both invariant — the mean shifts with the cells.
    // distinct values, mixed left/right gradients, with a mid-range
    // cluster (135/140/145) sitting just above the linear mean that a
    // convex curve drags below its mean — the engineered aHash flip
    val base = Seq(120, 10, 135, 125, 250, 130, 145, 140)
    def png(gamma: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val b = base(x)
        val c = math.min(255, if (gamma) (b * b) / 255 else b)
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val (d0, d1) = (Multimodal.dHash56(png(gamma = false)).get,
      Multimodal.dHash56(png(gamma = true)).get)
    assert(d0 === d1) // gradient structure identical under the curve
    val (a0, a1) = (Multimodal.aHash64(png(gamma = false)).get,
      Multimodal.aHash64(png(gamma = true)).get)
    assert(a0 !== a1) // mean-threshold bits move with the curve
    // degenerate payloads refuse cleanly
    assert(Multimodal.dHash56(null) === None)
    assert(Multimodal.dHash56(Array[Byte](1, 2, 3)) === None)
  }

  test("pHash64: AC bits invariant under a global brightness SHIFT " +
    "(every u>0 basis row sums to 0) and the whole hash under uniform " +
    "SCALING (signs scale through) — the frequency-domain guarantees") {
    def png(f: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        // clamped-free by construction: values stay in [0, 255]
        val c = f((x * 23 + y * 41 + (x * y) % 13) % 120)
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val (h0, l0) = Multimodal.pHash64(png(identity)).get
    // +100 brightness shift: only the DC bit (idx 0, in lo) may differ
    val (hS, lS) = Multimodal.pHash64(png(_ + 100)).get
    assert(hS === h0)
    assert((lS & ~1L) === (l0 & ~1L))
    // ×2 uniform scaling: every coefficient doubles — identical hash
    val (hM, lM) = Multimodal.pHash64(png(_ * 2)).get
    assert((hM, lM) === ((h0, l0)))
    // a structural change (transpose the gradient) must move AC bits
    val (hT, lT) = Multimodal.pHash64(png(v => 119 - v)).get
    assert((hT, lT) !== ((h0, l0)))
    // degenerate / non-divisible-by-8 payloads refuse cleanly
    assert(Multimodal.pHash64(null) === None)
    val img12 = new java.awt.image.BufferedImage(12, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos12 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img12, "png", baos12)
    assert(Multimodal.pHash64(baos12.toByteArray) === None)
  }

  test("imageNearDupPairs: a few-pixel perturbation pairs with its " +
    "original under the banded Hamming join; unrelated images don't " +
    "pair; the pair list is duplicate-free despite multi-band matches") {
    // perturbed = base image with one pixel forced to white: small
    // Hamming distance from base, far from unrelated ids
    def perturbed(id: Long): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.generatePng(id)))
      img.setRGB(0, 0, 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val rows = Seq(
      (1L, Multimodal.generatePng(7L)),
      (2L, perturbed(7L)),
      (3L, Multimodal.generatePng(1234L)),
      (4L, Multimodal.generatePng(1234L))) // exact dup: hamming 0
    val hashed = Multimodal.withAHash(
      rows.toDF("id", "payload"), "payload")
    val pairs = Multimodal.imageNearDupPairs(hashed, "id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 2L)), pairs.toSeq) // near dup found
    assert(pairSet.contains((3L, 4L)), pairs.toSeq) // exact dup, dist 0
    assert(pairs.count(p => p._1 == 3L && p._2 == 4L) === 1,
      "multi-band match must emit the pair once") // distinct() dedups
    assert(!pairSet.exists(p => Set(p._1, p._2) == Set(1L, 3L)), pairs.toSeq)
    val h0 = pairs.find(p => p._1 == 3L && p._2 == 4L).get._3
    assert(h0 === 0L)
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
