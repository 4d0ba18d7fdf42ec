package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Expr

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct.
  *
  * The Spark-side architecture is real and tested — schema, batched
  * per-partition processing, partition-count control. IMAGE decode is
  * REAL (JDK `javax.imageio`: PNG/JPEG/GIF/BMP readers ship in every
  * JRE — see [[decodeImage]]/[[imageFeatures]]); audio/video decode
  * remains STUBBED with a deterministic fake (those codecs are not in
  * this container). At deploy time `decodeStub` is the single function
  * to replace with a real audio/video decoder (or a
  * `mapInPandas`-style Arrow UDF on the PySpark side); everything
  * around it is production-shaped.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * collect); feature extraction is mapPartitions — one task per input
  * split, linear scale-out; metadata is a columnar struct so filters on
  * e.g. media_type prune without touching payload bytes.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("byte_len", IntegerType),
    StructField("header_hex", StringType),
    StructField("f_len", DoubleType),
    StructField("f_first", DoubleType),
    StructField("f_last", DoubleType),
    StructField("f_mean", DoubleType)))

  /** STUB (audio/video only — images decode for real via
    * [[decodeImage]]) — deterministic fake decode: real implementation
    * would wrap a codec (JavaCV / PIL-via-Arrow). Derives a stable
    * 4-dim "feature" from payload bytes so tests have something to
    * assert. Byte values are UNSIGNED (0-255) so the vector is
    * reproducible from the hex rendering of the payload by any
    * engine. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) Array(0.0, 0.0, 0.0, 0.0)
    else Array(
      payload.length.toDouble,
      (payload.head & 0xff).toDouble,
      (payload.last & 0xff).toDouble,
      payload.map(_.toInt & 0xff).sum.toDouble / payload.length)
  }

  // ------------------------------------------------------------------
  // Real image decode (JDK ImageIO — no external codec)
  // ------------------------------------------------------------------

  /** Deterministic 8×8 RGB test image for doc `id`, PNG-encoded. Each
    * channel is an affine-mod-256 function of (id, x, y) — deliberately
    * SQL-expressible so an independent engine can recompute the channel
    * sums the decoder must recover; PNG is lossless, so the
    * encode→decode round trip is exactly assertable, pixel for pixel. */
  def generatePng(id: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((id * 5 + x * 19 + y * 29) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** REAL image decode — replaces the stub seam for image payloads.
    * JDK ImageIO ships PNG/JPEG/GIF/BMP readers in every JRE, so this
    * needs no external codec and works offline. Emits
    * [width, height, sum_r, sum_g, sum_b]: integer channel SUMS rather
    * than float means — exact, engine-portable, and independent of
    * pixel visit order. None for null/empty/undecodable bytes. */
  def decodeImage(payload: Array[Byte]): Option[Array[Long]] = {
    if (payload == null || payload.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None // bytes no installed reader recognizes
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        Some(Array(w.toLong, h.toLong, sr, sg, sb))
      }
    } catch { case _: java.io.IOException => None }
  }

  /** Attach a generated PNG payload (media_type image/png) — the image
    * counterpart of [[withPayload]], feeding [[imageFeatures]]. */
  def withGeneratedPng(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) => generatePng(id))
    df.select(col(idCol),
      gen(col(idCol).cast("long")).as("payload"),
      struct(lit("image/png").as("media_type")).as("media_meta"))
  }

  /** Image feature extraction over a binary payload column via the REAL
    * ImageIO decode. Same plan shape as [[extractFeatures]]: one
    * projection stage, no shuffle; the single deterministic UDF call is
    * shared across the five output columns by projection-level
    * subexpression elimination; output is FLAT (ints + longs). */
  def imageFeatures(df: DataFrame, idCol: String): DataFrame = {
    val decode = udf((p: Array[Byte]) => decodeImage(p).orNull)
    val feat = decode(col("payload"))
    df.select(
      col(idCol).cast("long").as("doc_id"),
      element_at(feat, 1).cast("int").as("width"),
      element_at(feat, 2).cast("int").as("height"),
      element_at(feat, 3).as("sum_r"),
      element_at(feat, 4).as("sum_g"),
      element_at(feat, 5).as("sum_b"))
  }

  /** 64-bit average-hash (aHash) of an image payload — the classic
    * perceptual fingerprint behind image near-dup: partition the image
    * into an 8×8 grid, bit(cy,cx) = 1 iff the cell's mean gray exceeds
    * the global mean, bit index = cy·8+cx. All-integer and
    * division-free: gray = r+g+b per pixel (no luma weights — exact),
    * and the mean comparison is cross-multiplied
    * (cellSum·totalPixels > totalSum·cellPixels), so the hash is
    * bit-identical on any engine that can recover the pixels — which is
    * what lets q171's DuckDB oracle recompute it from the generated
    * images' closed-form channels without any codec. Returned as
    * (hi32, lo32) unsigned halves: both fit a positive BIGINT, where a
    * single signed 64-bit hash would overflow a portable SQL rebuild.
    * None for undecodable payloads. */
  def aHash64(payload: Array[Byte]): Option[(Long, Long)] = {
    if (payload == null || payload.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        if (w < 8 || h < 8) None
        else {
          val cellSum = Array.ofDim[Long](8, 8)
          val cellN = Array.ofDim[Long](8, 8)
          var totalSum = 0L
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val cx = x * 8 / w
              val rgb = img.getRGB(x, y)
              val gray = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                (rgb & 0xff)
              cellSum(cy)(cx) += gray
              cellN(cy)(cx) += 1
              totalSum += gray
              x += 1
            }
            y += 1
          }
          val totalN = w.toLong * h
          var (hi, lo) = (0L, 0L)
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 8) {
              if (cellSum(cy)(cx) * totalN > totalSum * cellN(cy)(cx)) {
                val idx = cy * 8 + cx
                if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
              }
              cx += 1
            }
            cy += 1
          }
          Some((hi, lo))
        }
      }
    } catch { case _: java.io.IOException => None }
  }

  /** Attach (ahash_hi, ahash_lo) columns from a binary image payload —
    * one UDF projection, no shuffle (the q64 decode pattern). */
  /** Difference hash (dHash) — the gradient sibling of [[aHash64]]:
    * bit (cy, cx) set iff cell (cy, cx) is brighter than its RIGHT
    * neighbor, 8 rows × 7 comparisons = 56 bits in one long.
    * Brightness compare is cross-multiplied exact integers
    * (sum·n' > sum'·n — no float means), so decode-then-hash equals
    * formula-then-hash bit-for-bit on lossless codecs (the q255
    * oracle). dHash survives global brightness shifts that flip
    * aHash bits — the standard pairing in image-dedup pipelines.
    * None for null/undecodable/too-small payloads. */
  def dHash56(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        if (w < 8 || h < 8) None
        else {
          val cellSum = Array.ofDim[Long](8, 8)
          val cellN = Array.ofDim[Long](8, 8)
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val cx = x * 8 / w
              val rgb = img.getRGB(x, y)
              cellSum(cy)(cx) += ((rgb >> 16) & 0xff) +
                ((rgb >> 8) & 0xff) + (rgb & 0xff)
              cellN(cy)(cx) += 1
              x += 1
            }
            y += 1
          }
          var bits = 0L
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 7) {
              if (cellSum(cy)(cx) * cellN(cy)(cx + 1) >
                cellSum(cy)(cx + 1) * cellN(cy)(cx))
                bits |= 1L << (cy * 7 + cx)
              cx += 1
            }
            cy += 1
          }
          Some(bits)
        }
      }
    } catch { case _: Throwable => None }
  }

  def withDHash(df: DataFrame, payloadCol: String): DataFrame = {
    val dh = udf((p: Array[Byte]) => dHash56(p))
    df.withColumn("dhash", dh(col(payloadCol))).drop(payloadCol)
  }

  def withAHash(df: DataFrame, payloadCol: String): DataFrame = {
    val ah = udf((p: Array[Byte]) => aHash64(p).orNull)
    val h = ah(col(payloadCol))
    df.withColumn("ahash_hi", h.getField("_1"))
      .withColumn("ahash_lo", h.getField("_2"))
      .drop(payloadCol)
  }

  /** Quantized 8-point DCT-II basis: B(u)(x) = round(cos(π(2x+1)u/16)
    * · 2¹⁴). PINNED integer constants — the q270 oracle replays these
    * verbatim, so the transform is exact integer arithmetic in both
    * engines (a float cos() is not correctly rounded and would not be
    * cross-engine stable). Every u>0 row sums to 0, which makes all
    * AC signs invariant under global brightness shifts (spec-proven). */
  val DctBasis: Array[Array[Long]] = Array(
    Array(16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L),
    Array(16069L, 13623L, 9102L, 3196L, -3196L, -9102L, -13623L, -16069L),
    Array(15137L, 6270L, -6270L, -15137L, -15137L, -6270L, 6270L, 15137L),
    Array(13623L, -3196L, -16069L, -9102L, 9102L, 16069L, 3196L, -13623L),
    Array(11585L, -11585L, -11585L, 11585L, 11585L, -11585L, -11585L,
      11585L),
    Array(9102L, -16069L, 3196L, 13623L, -13623L, -3196L, 16069L, -9102L),
    Array(6270L, -15137L, 15137L, -6270L, -6270L, 15137L, -15137L, 6270L),
    Array(3196L, -9102L, 13623L, -16069L, 16069L, -13623L, 9102L, -3196L))

  /** 64-bit DCT-SIGN perceptual hash — the pHash family member that
    * stays exact: bit (u,v) = 1 iff the 2-D DCT-II coefficient
    * D(u,v) = Σ B(u)(cy)·B(v)(cx)·gray(cy,cx) of the 8×8 cell-sum
    * image is positive, idx = u·8+v, returned as the aHash64
    * (hi32, lo32) unsigned split. Division-free: cells are SUMS, and
    * for w,h divisible by 8 all cells are equal-sized, so by DCT
    * linearity the sign pattern equals the mean image's (other
    * dimensions → None rather than a silently inexact hash). Signs
    * survive uniform brightness scaling (coefficients scale by k) and
    * — for the 63 AC bits — global brightness shifts (every u>0 basis
    * row sums to 0). Captures the frequency structure aHash's spatial
    * thresholding misses. */
  def pHash64(payload: Array[Byte]): Option[(Long, Long)] = {
    if (payload == null || payload.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        if (w < 8 || h < 8 || w % 8 != 0 || h % 8 != 0) None
        else {
          val cell = Array.ofDim[Long](8, 8)
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val cx = x * 8 / w
              val rgb = img.getRGB(x, y)
              cell(cy)(cx) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          var (hi, lo) = (0L, 0L)
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var d = 0L
              var cy = 0
              while (cy < 8) {
                var cx = 0
                while (cx < 8) {
                  d += DctBasis(u)(cy) * DctBasis(v)(cx) * cell(cy)(cx)
                  cx += 1
                }
                cy += 1
              }
              if (d > 0) {
                val idx = u * 8 + v
                if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
              }
              v += 1
            }
            u += 1
          }
          Some((hi, lo))
        }
      }
    } catch { case _: Throwable => None }
  }

  def withPHash(df: DataFrame, payloadCol: String): DataFrame = {
    val ph = udf((p: Array[Byte]) => pHash64(p).orNull)
    val h = ph(col(payloadCol))
    df.withColumn("phash_hi", h.getField("_1"))
      .withColumn("phash_lo", h.getField("_2"))
      .drop(payloadCol)
  }

  /** Image near-dup pairs by Hamming distance over aHash, WITHOUT the
    * all-pairs join: the 64-bit hash splits into four 16-bit bands
    * (the SimHash byte-band trick at image granularity); any pair
    * within Hamming ≤ 16/4·3 shares at least one intact band by
    * pigeonhole (and in practice ≤ maxHamming flips touch few bands),
    * so candidates come from a bucketed self-join on (band_idx,
    * band_value) and only candidates pay the exact
    * bit_count(xor) ≤ maxHamming verify. Input must carry
    * (idCol, ahash_hi, ahash_lo) — from [[withAHash]]. */
  def imageNearDupPairs(hashed: DataFrame, idCol: String,
      maxHamming: Int): DataFrame = {
    // posexplode gives the band index in place — no window, no shuffle
    // before the bucket join; integer div/mod only (Column./ is double
    // division — cast-truncate of positives is exact floor here)
    val bands = hashed.select(col(idCol).as("id"),
      col("ahash_hi"), col("ahash_lo"),
      posexplode(array(
        col("ahash_lo") % 65536,
        (col("ahash_lo") / 65536).cast("long"),
        col("ahash_hi") % 65536,
        (col("ahash_hi") / 65536).cast("long"))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val a = bands.select(col("id").as("id_a"),
      col("ahash_hi").as("hi_a"), col("ahash_lo").as("lo_a"),
      col("band_idx"), col("band_val"))
    val b = bands.select(col("id").as("id_b"),
      col("ahash_hi").as("hi_b"), col("ahash_lo").as("lo_b"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Attach a binary payload + metadata struct to a text table
    * (simulating ingest of raw media alongside documents). Pure
    * expressions — the payload is `encode(text)` here only because the
    * container has no real media; the column SHAPE is the contract. */
  def withPayload(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        length(col(textCol)).as("n_chars"),
        col("lang").as("lang")).as("media_meta"))

  /** Resize-shaped payload normalization: truncate or zero-pad the
    * binary payload to exactly `n` bytes — the plumbing contract of an
    * image-resize stage (fixed-size input to a batched decoder), with
    * the actual pixel resample living behind the decodeStub seam. Pure
    * expressions; rpad on binary pads with 0x00. */
  def resizePayload(df: DataFrame, payloadCol: String, n: Int): DataFrame =
    df.withColumn(payloadCol,
      rpad(substring(col(payloadCol), 1, n), n, Array[Byte](0)))

  /** Frame sampling: explode an opaque media payload into fixed-size
    * binary frames — the batch shape a video/audio pipeline feeds to a
    * per-frame decoder (which would plug into the decodeStub seam).
    * Pure expressions: `substr` slices the binary column per frame
    * index, capped at `maxFrames` (uniform head-sampling; a production
    * sampler would stride). One row per (doc, frame), md5-fingerprinted
    * so downstream frame-level dedup can run the exact-dedup operator
    * unchanged. No shuffle — the explode is pipelined into the scan. */
  def frameSample(df: DataFrame, payloadCol: String, idCol: String,
      frameSize: Int, maxFrames: Int): DataFrame = {
    // empty/null payloads yield NO frames: without the guard the upper
    // bound is least(maxFrames-1, -1) = -1 and sequence(0, -1) is the
    // DESCENDING array [0, -1] — two bogus frame rows
    val frames = Expr.let(col(payloadCol)) { p =>
      when(length(p) > 0,
        transform(
          sequence(lit(0),
            least(lit(maxFrames - 1),
              ceil(length(p).cast("double") / frameSize).cast("int") - 1)),
          i => substr(p, i * frameSize + 1, lit(frameSize))))
        .otherwise(array().cast("array<binary>"))
    }
    // fingerprint = md5 of the frame's HEX rendering (not the raw
    // bytes): byte-identical in any engine even where md5 is only
    // defined over strings, and still injective in the frame bytes
    df.select(col(idCol), posexplode(frames))
      .select(col(idCol), col("pos").as("frame_idx"),
        length(col("col")).as("frame_len"),
        md5(hex(col("col"))).as("frame_md5"))
  }

  /** Feature extraction over the payload column. Everything that is a
    * plain column function stays a Catalyst expression (codegen'd,
    * prunable): byte_len = length(payload), header_hex =
    * hex(substring(payload, 1, 4)). ONLY the decode itself — opaque
    * native-codec work by nature — crosses the row seam, as a single
    * Scala UDF; this keeps the whole operator one projection stage (no
    * shuffle, no join) with the narrowest possible non-codegen island.
    *
    * The 4-dim feature is emitted as FLAT double columns (f_len,
    * f_first, f_last, f_mean), not an array: flat schemas survive any
    * downstream comparator/row-sort, and the four `element_at`s over
    * the one deterministic UDF call collapse to a single evaluation
    * under projection-level subexpression elimination (ScalaUDF is
    * codegen-capable, so the projection stays one codegen stage). */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val decode = udf((payload: Array[Byte]) => decodeStub(payload))
    val feat = decode(col("payload"))
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col("media_meta.media_type").as("media_type"),
      coalesce(length(col("payload")), lit(0)).as("byte_len"),
      when(col("payload").isNull, lit(""))
        .otherwise(lower(hex(substring(col("payload"), 1, 4))))
        .as("header_hex"),
      element_at(feat, 1).as("f_len"),
      element_at(feat, 2).as("f_first"),
      element_at(feat, 3).as("f_last"),
      element_at(feat, 4).as("f_mean"))
  }
}
