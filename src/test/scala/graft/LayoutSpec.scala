package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrderValue
import graft.operators.Layout

/** Z-order layout: the interleave is bit-exact, and a zorderWrite
  * measurably clusters BOTH dimensions into narrow per-file ranges —
  * the property parquet min/max pruning feeds on. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: bit-exact against a naive per-bit reconstruction") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L),
      (0L, 65535L), (12345L, 54321L), (65535L, 65535L))
    for ((x, y) <- cases) {
      var expected = 0L
      for (i <- 0 until 16) {
        expected |= ((x >>> i) & 1L) << (2 * i)
        expected |= ((y >>> i) & 1L) << (2 * i + 1)
      }
      assert(ZOrderValue.interleave(x, y, 16) === expected, s"($x,$y)")
    }
    // x-bits land at even positions, y-bits at odd ones: flipping x's
    // bit 0 flips exactly z's bit 0; flipping y's bit 0 flips z's bit 1
    assert((ZOrderValue.interleave(4L, 7L, 16) ^
      ZOrderValue.interleave(5L, 7L, 16)) === 1L)
    assert((ZOrderValue.interleave(4L, 7L, 16) ^
      ZOrderValue.interleave(4L, 6L, 16)) === 2L)
  }

  test("zorderWrite: per-file ranges are narrow in BOTH dimensions vs " +
    "a random layout") {
    // full 128×128 grid (the fixture's key domains are too narrow at
    // sf0.001 to distinguish layouts)
    val grid = spark.range(128L * 128L)
      .select((col("id") % 128).as("x"), (col("id") / 128).as("y"))
    def fileRanges(path: String): (Double, Double) = {
      val row = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("x") - min("x")).as("rx"),
          (max("y") - min("y")).as("ry"))
        .agg(avg("rx"), avg("ry"))
        .collect().head
      (row.getDouble(0), row.getDouble(1))
    }
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val rDir = java.nio.file.Files.createTempDirectory("random").toString
    Layout.zorderWrite(grid, "x", "y", zDir, numFiles = 16)
    grid.repartition(16).write.mode("overwrite").parquet(rDir)
    val (zx, zy) = fileRanges(zDir)
    val (rx, ry) = fileRanges(rDir)
    // a random layout gives every file nearly the FULL range of both
    // columns (~127); 16 z-tiles of a 128×128 grid are 32×64 rectangles
    assert(zx <= rx * 0.6, s"x: z=$zx random=$rx")
    assert(zy <= ry * 0.6, s"y: z=$zy random=$ry")
    assert(rx > 120 && ry > 120, s"random baseline: $rx/$ry")
  }
}
