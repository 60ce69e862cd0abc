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

  test("scd2History: hand-computed intervals, ties, null states, n_events") {
    // user 1: a a b b a  → versions (a,2)(b,2)(a,1); last is current.
    // user 2: ties at t=10 break on the id column (id 1 'x' before id 2 'y');
    //         null attr then opens a third interval (null-safe transition).
    val rows = Seq(
      (1L, 10L, 1L, Some("a")), (1L, 20L, 2L, Some("a")),
      (1L, 30L, 3L, Some("b")), (1L, 40L, 4L, Some("b")),
      (1L, 50L, 5L, Some("a")),
      (2L, 10L, 1L, Some("x")), (2L, 10L, 2L, Some("y")),
      (2L, 20L, 3L, None)
    ).toDF("uid", "t", "id", "attr")
    val out = TimeSeries.scd2History(rows, "uid", "t", "id", "attr")
      .orderBy("uid", "version")
      .as[(Long, Int, Option[String], Long, Option[Long], Long, Boolean)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 1, Some("a"), 10L, Some(30L), 2L, false),
      (1L, 2, Some("b"), 30L, Some(50L), 2L, false),
      (1L, 3, Some("a"), 50L, None, 1L, true),
      (2L, 1, Some("x"), 10L, Some(10L), 1L, false),
      (2L, 2, Some("y"), 10L, Some(20L), 1L, false),
      (2L, 3, None, 20L, None, 1L, true)))
  }

  test("scd2History: single exchange — windows and filter ride one hash partitioning") {
    val rows = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b")).toDF("uid", "t", "id", "attr")
    val plan = TimeSeries.scd2History(rows, "uid", "t", "id", "attr")
      .queryExecution.executedPlan.toString
    assert("(?i)exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("gapFillLocf: empty input yields empty grid; zero step rejected") {
    val empty = Seq.empty[(String, Long, Double)].toDF("k", "t", "v")
    assert(TimeSeries.gapFillLocf(empty, "k", "t", "v", 10L).count() == 0)
    intercept[IllegalArgumentException] {
      TimeSeries.gapFillLocf(empty, "k", "t", "v", 0L)
    }
  }

  test("rolling z-score: hand-computed spike, cold-key nulls, no self-masking") {
    import spark.implicits._
    // key 1: nine 10.0s then a 20.0 spike. At the spike the trailing
    // window holds the nine 10s -> var = 0 -> null z (zero-variance
    // guard); with values 10,12 alternating the spike z is computable.
    val flat = (1 to 9).map(i => (1L, i.toLong, i.toLong, 10.0)) :+
      ((1L, 10L, 10L, 20.0))
    val gotFlat = TimeSeries.rollingZscore(
      flat.toDF("k", "t", "id", "v"), "k", "t", "id", "v", window = 24, minObs = 8)
      .as[(Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    assert(gotFlat(10L)._4.isEmpty, "zero-variance window must yield null z")
    // first rows are cold (n_window < minObs) -> null z and flag
    assert(gotFlat(3L)._3 == 2L && gotFlat(3L)._4.isEmpty && gotFlat(3L)._5.isEmpty)

    // alternating 9,11 for 10 rows then a 30 spike: mu=10, var=1,
    // z=(30-10)/1=20 -> anomalous; a following 10 is z=... within range
    val alt = (1 to 10).map(i =>
      (2L, i.toLong, i.toLong, if (i % 2 == 0) 11.0 else 9.0)) ++
      Seq((2L, 11L, 11L, 30.0), (2L, 12L, 12L, 10.0))
    val gotAlt = TimeSeries.rollingZscore(
      alt.toDF("k", "t", "id", "v"), "k", "t", "id", "v", window = 24, minObs = 8)
      .as[(Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    assert(gotAlt(11L)._4.contains(20.0) && gotAlt(11L)._5.contains(true))
    // the spike sits in row 12's window but does not flag the normal 10
    assert(gotAlt(12L)._5.contains(false))
  }

  test("rolling z-score: offset-heavy keys (|mean| >> stddev) stay exact") {
    import spark.implicits._
    // the catastrophic-cancellation regression: at offset 1e9 the raw
    // E[x²]−E[x]² double arithmetic has ulp ~128 at x² ≈ 1e18 and a true
    // variance of 1 is unrepresentable; the per-key first-value shift
    // keeps the double math at SPREAD magnitude, so z matches the
    // unshifted twin exactly (z is shift-invariant)
    val off = 1.0e9
    val alt = (1 to 10).map(i =>
      (2L, i.toLong, i.toLong, off + (if (i % 2 == 0) 11.0 else 9.0))) ++
      Seq((2L, 11L, 11L, off + 30.0), (2L, 12L, 12L, off + 10.0))
    val got = TimeSeries.rollingZscore(
      alt.toDF("k", "t", "id", "v"), "k", "t", "id", "v", window = 24, minObs = 8)
      .as[(Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(11L)._4.contains(20.0) && got(11L)._5.contains(true),
      s"offset spike lost: ${got(11L)}")
    assert(got(12L)._5.contains(false))
  }

  test("rolling z-score: a spread past DECIMAL(18,6) nulls, never biases (r13 ADVICE)") {
    import spark.implicits._
    // key holds +9e11 and -9e11 — each representable, their shifted
    // difference (1.8e12, 13 integer digits) overflows DECIMAL(18,6) to
    // NULL under the non-ANSI cast. Before the guard, SUM skipped the
    // NULL while n_window counted the row, silently biasing every
    // covering window's mean/variance; now any window containing an
    // overflowed value yields null z and flag (unknown, not normal).
    val rows = Seq((1L, 1L, 1L, 9.0e11), (1L, 2L, 2L, -9.0e11)) ++
      (3 to 12).map(i => (1L, i.toLong, i.toLong,
        9.0e11 + (if (i % 2 == 0) 11.0 else 9.0))) :+
      ((1L, 13L, 13L, 9.0e11 + 30.0))
    val got = TimeSeries.rollingZscore(
      rows.toDF("k", "t", "id", "v"), "k", "t", "id", "v",
      window = 24, minObs = 8)
      .as[(Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    // row 13's trailing window still covers the overflowed row 2 -> null
    assert(got(13L)._3 == 12L)
    assert(got(13L)._4.isEmpty && got(13L)._5.isEmpty,
      s"overflowed window must yield null, got ${got(13L)}")
    // sanity: without the overflowing row the same spike flags
    val clean = rows.filterNot(_._2 == 2L)
    val gotClean = TimeSeries.rollingZscore(
      clean.toDF("k", "t", "id", "v"), "k", "t", "id", "v",
      window = 24, minObs = 8)
      .as[(Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    assert(gotClean(13L)._4.nonEmpty && gotClean(13L)._5.contains(true),
      s"clean twin should flag: ${gotClean(13L)}")
  }
}
