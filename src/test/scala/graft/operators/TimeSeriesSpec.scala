package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  test("gapFillLocf: hand-computed grid, exact means, LOCF through gaps") {
    // key A: obs at buckets 0 (values 2, 4 → mean 3.0) and 30 (value 7);
    // buckets 10 and 20 are gaps carrying 3.0 forward.
    // key B: single obs at bucket 50 — a one-cell grid, nothing filled.
    val rows = Seq(
      ("A", 3L, 2.0), ("A", 7L, 4.0), ("A", 33L, 7.0),
      ("B", 55L, 9.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.gapFillLocf(rows, "k", "t", "v", stepUs = 10L)
      .orderBy("key", "bucket_us")
      .as[(String, Long, Long, Option[Double], Double, Boolean)].collect()
    assert(out.toSeq == Seq(
      ("A", 0L, 2L, Some(3.0), 3.0, false),
      ("A", 10L, 0L, None, 3.0, true),
      ("A", 20L, 0L, None, 3.0, true),
      ("A", 30L, 1L, Some(7.0), 7.0, false),
      ("B", 50L, 1L, Some(9.0), 9.0, false)))
  }

  test("gapFillLocf: empty input yields empty grid; zero step rejected") {
    val empty = Seq.empty[(String, Long, Double)].toDF("k", "t", "v")
    assert(TimeSeries.gapFillLocf(empty, "k", "t", "v", 10L).count() == 0)
    intercept[IllegalArgumentException] {
      TimeSeries.gapFillLocf(empty, "k", "t", "v", 0L)
    }
  }
}
