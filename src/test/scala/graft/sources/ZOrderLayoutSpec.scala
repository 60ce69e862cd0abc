package graft.sources

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZOrderLayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits, hand-computed") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(ZOrderLayout.zValue(col("a"), col("b")))
      .as[Long].collect().toSeq
    // a-bits at odd positions, b-bits at even: (1,0)->2, (0,1)->1,
    // (3,3)->15, (5,2)=(101,010)->0b100110=38
    assert(got == Seq(0L, 2L, 1L, 15L, 38L))
  }

  test("zValue rejects out-of-range input loudly") {
    val e = intercept[Exception] {
      Seq((1L << 25, 0L)).toDF("a", "b")
        .select(ZOrderLayout.zValue(col("a"), col("b"), bits = 21)).collect()
    }
    assert(e.getMessage.contains("out of [0, 2^21)"))
  }

  test("z-ordered layout gives tight per-file bounding boxes on BOTH dims") {
    // two independent uniform dims, 40k rows
    val df = (0 until 40000).map { i =>
      val r = new scala.util.Random(i)
      (r.nextInt(1024).toLong, r.nextInt(1024).toLong)
    }.toDF("x", "y")
    val nFiles = 16

    val zDir = Files.createTempDirectory("zorder").toString
    ZOrderLayout.writeZOrdered(df, "x", "y", zDir, numFiles = nFiles, bits = 10)
    // single-dim-sorted baseline: x is tight, y is table-wide
    val sDir = Files.createTempDirectory("xsort").toString
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sDir)

    def avgRanges(dir: String): (Double, Double) = {
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col("x")) - min(col("x"))).as("rx"),
          (max(col("y")) - min(col("y"))).as("ry"))
        .agg(avg(col("rx")), avg(col("ry")))
        .head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }
    val (zx, zy) = avgRanges(zDir)
    val (sx, sy) = avgRanges(sDir)
    // x-sorted: x ranges tiny, y ranges ~full domain (~1023)
    assert(sx < 200 && sy > 800, s"x-sorted baseline unexpected: sx=$sx sy=$sy")
    // z-ordered: BOTH dims' per-file ranges well under the domain — each
    // file covers a bounding box, so min/max stats prune on either dim
    assert(zx < 600 && zy < 600, s"z-order boxes not tight: zx=$zx zy=$zy")
    // and the layout still covers all rows exactly once
    assert(spark.read.parquet(zDir).count() == 40000)
  }
}
